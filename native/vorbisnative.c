/* Host-side native kernels for the TPU vorbis framework.
 *
 * Plain C, no Python.h — loaded via ctypes.  These replace the
 * per-symbol loops the reference runs in lib/bitwise.c (oggpack_write /
 * oggpack_read) and lib/codebook.c (vorbis_book_encode /
 * decode_packed_entry_number): at batched-TPU throughput the Python/
 * numpy fallbacks become the serial bottleneck (SURVEY.md §7 "hard
 * parts" item 4).
 *
 * Build: native/build.sh -> vorbis_tpu/native/_vorbisnative.so
 */

#include <stdint.h>
#include <string.h>

/* LSB-first bit packer.
 * values[i] (<=32 significant bits) appended with nbits[i] bits each.
 * out must have at least (sum(nbits)+7)/8 + 8 bytes, zeroed.
 * Returns total bit count. */
long vn_pack_bits(const uint64_t *values, const int32_t *nbits, long n,
                  uint8_t *out)
{
    uint64_t acc = 0;
    int accbits = 0;
    long obyte = 0;
    for (long i = 0; i < n; i++) {
        int nb = nbits[i];
        acc |= (values[i] & ((nb >= 64) ? ~0ULL : ((1ULL << nb) - 1)))
               << accbits;
        accbits += nb;
        while (accbits >= 8) {
            out[obyte++] = (uint8_t)acc;
            acc >>= 8;
            accbits -= 8;
        }
    }
    if (accbits)
        out[obyte] = (uint8_t)acc;
    return obyte * 8 + accbits;
}

/* LSB-first bit reader over a byte buffer; returns value or -1 past
 * end (mirrors oggpack_read EOP semantics). */
static inline int64_t rd_bits(const uint8_t *data, long nbits_total,
                              long *pos, int n)
{
    long p = *pos;
    if (p + n > nbits_total) {
        *pos = nbits_total;
        return -1;
    }
    long byte = p >> 3;
    int bit = p & 7;
    uint64_t acc = 0;
    int got = 0;
    int k = 0;
    while (got < bit + n) {
        acc |= (uint64_t)data[byte + k] << (8 * k);
        got += 8;
        k++;
    }
    *pos = p + n;
    return (int64_t)((acc >> bit) & ((n >= 64) ? ~0ULL : ((1ULL << n) - 1)));
}

/* Unpack n fixed-width fields (e.g. residue class words, lengths). */
long vn_read_fields(const uint8_t *data, long nbits_total, long *pos,
                    int width, int64_t *out, long n)
{
    for (long i = 0; i < n; i++) {
        out[i] = rd_bits(data, nbits_total, pos, width);
        if (out[i] < 0)
            return i;
    }
    return n;
}

/* Two-level Huffman decoder.
 *
 * t1: 1<<K entries.  t1[w] >= 0: (entry<<6)|codelen for codes with
 * len<=K whose low bits match w.  t1[w] == -1: invalid prefix.
 * t1[w] <= -2: escape to secondary table index (-t1[w]-2).
 *
 * sec_off[s]..sec_off[s+1] delimit secondary table s in sec_tab;
 * secondary tables are indexed by the NEXT K2 bits (t2[w2] =
 * (entry<<6)|codelen with codelen counted from the code start, or -1).
 *
 * Decodes up to count symbols into out; returns number decoded
 * (stops early on EOP or invalid code; *pos is then at nbits_total).
 */
long vn_huff_decode(const uint8_t *data, long nbits_total, long *pos,
                    const int32_t *t1, int K,
                    const int32_t *sec_tab, const int64_t *sec_off,
                    int K2, int64_t *out, long count)
{
    for (long i = 0; i < count; i++) {
        long p = *pos;
        /* look K bits, zero-padded past end like oggpack_look */
        long byte = p >> 3;
        int bit = p & 7;
        uint64_t acc = 0;
        long maxbyte = (nbits_total + 7) >> 3;
        for (int k = 0; k < 5; k++) {
            uint64_t b = (byte + k < maxbyte) ? data[byte + k] : 0;
            acc |= b << (8 * k);
        }
        uint64_t word = (acc >> bit) & ((1ULL << K) - 1);
        int32_t t = t1[word];
        int entry, len;
        if (t >= 0) {
            entry = t >> 6;
            len = t & 63;
        } else if (t <= -2) {
            long s = -(long)t - 2;
            uint64_t w2 = (acc >> (bit + K)) & ((1ULL << K2) - 1);
            const int32_t *t2 = sec_tab + sec_off[s];
            int32_t u = t2[w2];
            if (u < 0) {
                *pos = nbits_total;
                return i;
            }
            entry = u >> 6;
            len = u & 63;
        } else {
            *pos = nbits_total;
            return i;
        }
        if (p + len > nbits_total) {
            *pos = nbits_total;
            return i;
        }
        *pos = p + len;
        out[i] = entry;
    }
    return count;
}

/* Ogg page CRC: poly 0x04c11db7, non-reflected, init/xorout 0
 * (reference: libogg crc_lookup usage in ogg_page_checksum_set). */
long vn_ogg_crc(const uint8_t *data, long n, uint32_t crc)
{
    static uint32_t tbl[256];
    static int init = 0;
    if (!init) {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t r = i << 24;
            for (int j = 0; j < 8; j++)
                r = (r << 1) ^ ((r & 0x80000000U) ? 0x04c11db7U : 0);
            tbl[i] = r;
        }
        init = 1;
    }
    for (long i = 0; i < n; i++)
        crc = (crc << 8) ^ tbl[((crc >> 24) & 0xFF) ^ data[i]];
    return (long)crc;
}

/* Pack F packets in one call.  values/nbits are (F, C) row-major;
 * out receives the packed packets back to back at byte offsets
 * off[f] (caller-computed); returns total bytes written. */
long vn_pack_bits_multi(const uint64_t *values, const int32_t *nbits,
                        long F, long C, uint8_t *out,
                        const int64_t *off, int64_t *nbytes)
{
    long total = 0;
    for (long f = 0; f < F; f++) {
        long bits = vn_pack_bits(values + f * C, nbits + f * C, C,
                                 out + off[f]);
        nbytes[f] = (bits + 7) >> 3;
        total += nbytes[f];
    }
    return total;
}
