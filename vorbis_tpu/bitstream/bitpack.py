"""Vorbis bit-packing (the "oggpack" convention).

Vorbis I packs fields LSB-first: the first bit written becomes bit 0 of
byte 0, values are written least-significant-bit first, and multi-byte
values therefore read back in little-endian bit order.  (Reference
behavior: lib/bitwise.c in libogg; semantics normative in
doc/Vorbis_I_spec / section "Bitpacking convention".)

Two tiers live here:

* `BitReader` / `BitWriter` — simple, branchy, host-side readers used for
  header parsing and for the adaptive Huffman paths.  Clarity first.
* `pack_bits_array` — a vectorized numpy packer turning parallel
  (value, nbits) arrays into a byte stream in one shot.  This is the hot
  host-side op for the batched encoder (device emits (entry, codeword,
  length) arrays; the host needs to serialize millions of codes/sec).
"""

from __future__ import annotations

import numpy as np

_MASK = [(1 << i) - 1 for i in range(65)]


class EndOfPacket(Exception):
    """Raised when a read runs off the end of the packet.

    A truncated packet is a *normal* stop condition in Vorbis residue
    decode (reference: lib/res0.c "a truncated packet here just means
    'stop working'"), so callers catch this rather than treating it as
    a hard error.
    """


def ilog(v: int) -> int:
    """Number of bits needed to represent v (ilog(0)=0, ilog(1)=1, ilog(7)=3).

    Mirrors the codec's ilog/ilog2 convention used for field widths
    (reference: lib/sharedbook.c `_ilog`).
    """
    ret = 0
    while v > 0:
        ret += 1
        v >>= 1
    return ret


class BitReader:
    """LSB-first bit reader over a bytes-like packet."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data):
        # int view for speed; numpy frombuffer avoids a copy
        self.data = np.frombuffer(bytes(data), dtype=np.uint8)
        self.nbits = len(self.data) * 8
        self.pos = 0  # absolute bit position

    def bits_remaining(self) -> int:
        return self.nbits - self.pos

    def readbytes(self, n: int) -> bytes:
        """Read n whole bytes (8 bits each, LSB-first stream order)."""
        if self.pos & 7 == 0:
            byte = self.pos >> 3
            if self.pos + 8 * n > self.nbits:
                self.pos = self.nbits
                raise EndOfPacket
            out = self.data[byte:byte + n].tobytes()
            self.pos += 8 * n
            return out
        return bytes(self.read(8) for _ in range(n))

    def read(self, n: int) -> int:
        """Read n bits (0..64) LSB-first; raises EndOfPacket on overrun."""
        if n == 0:
            return 0
        pos = self.pos
        if pos + n > self.nbits:
            self.pos = self.nbits
            raise EndOfPacket
        byte = pos >> 3
        bit = pos & 7
        # gather enough bytes to cover n+7 bits
        nbytes = (bit + n + 7) >> 3
        acc = 0
        d = self.data
        for i in range(nbytes - 1, -1, -1):
            acc = (acc << 8) | int(d[byte + i])
        self.pos = pos + n
        return (acc >> bit) & _MASK[n]

    def read1(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise EndOfPacket
        self.pos = pos + 1
        return (int(self.data[pos >> 3]) >> (pos & 7)) & 1

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def look(self, n: int) -> int:
        """Peek up to n bits; bits past the end read as 0 (oggpack_look
        semantics needed by the treeless Huffman decoder's first-stage
        table, which over-reads near packet end)."""
        pos = self.pos
        byte = pos >> 3
        bit = pos & 7
        d = self.data
        acc = 0
        nbytes = (bit + n + 7) >> 3
        for i in range(nbytes - 1, -1, -1):
            b = int(d[byte + i]) if (byte + i) < len(d) else 0
            acc = (acc << 8) | b
        return (acc >> bit) & _MASK[n]

    def advance(self, n: int) -> None:
        self.pos += n

    def read_bytes(self, n: int) -> bytes:
        """Read n whole bytes (used for UTF-8 comment strings)."""
        out = bytearray()
        for _ in range(n):
            out.append(self.read(8))
        return bytes(out)


class BitWriter:
    """LSB-first bit writer producing a bytes packet."""

    __slots__ = ("_acc", "_accbits", "_bytes")

    def __init__(self):
        self._acc = 0
        self._accbits = 0
        self._bytes = bytearray()

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self._acc |= (value & _MASK[n]) << self._accbits
        self._accbits += n
        while self._accbits >= 8:
            self._bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._accbits -= 8

    @property
    def bitpos(self) -> int:
        """Bits written so far (the reference's oggpack_bits)."""
        return len(self._bytes) * 8 + self._accbits

    def write_bytes(self, data: bytes) -> None:
        for b in data:
            self.write(b, 8)

    def bit_length(self) -> int:
        return len(self._bytes) * 8 + self._accbits

    def getvalue(self) -> bytes:
        """Flush (zero-pad final partial byte) and return the packet."""
        out = bytearray(self._bytes)
        if self._accbits:
            out.append(self._acc & 0xFF)
        return bytes(out)


class FieldWriter:
    """BitWriter-compatible collector: records (value, nbits) fields
    and packs them in ONE native pass at getvalue() time
    (native/vorbisnative.c vn_pack_bits).  Drop-in for code that calls
    w.write(v, n) / book.encode(w, e); write_array() takes whole
    codeword vectors (the residue fast path's bulk emission)."""

    __slots__ = ("_vals", "_lens")

    def __init__(self):
        self._vals = []
        self._lens = []

    def write(self, value: int, n: int) -> None:
        if n:
            self._vals.append(value)
            self._lens.append(n)

    def write_array(self, values, nbits) -> None:
        values = np.asarray(values)
        nbits = np.asarray(nbits)
        self._vals.extend(values.tolist())
        self._lens.extend(nbits.tolist())

    def bit_length(self) -> int:
        return int(np.sum(self._lens, dtype=np.int64)) if self._lens \
            else 0

    def getvalue(self) -> bytes:
        if not self._vals:
            return b""
        data, _ = pack_bits_array(np.asarray(self._vals, np.uint64),
                                  np.asarray(self._lens, np.int64))
        return data


def pack_bits_array(values: np.ndarray, nbits: np.ndarray) -> tuple[bytes, int]:
    """Vectorized LSB-first packer.

    Given parallel int64 arrays of code values and their bit lengths
    (each <= 32), produce the packed byte stream and total bit count.
    This replaces the per-code `oggpack_write` loop of the reference
    encoder (lib/codebook.c vorbis_book_encode -> bitwise.c) with one
    numpy pass, which is what lets the host keep up with a TPU emitting
    millions of codes per second.

    Strategy: compute each code's absolute start bit via cumsum, expand
    every code into its (<=5) overlapping bytes with shifts, then
    scatter-OR with np.bitwise_or.at.
    """
    values = np.asarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int64)
    if values.size == 0:
        return b"", 0
    # native single-pass packer when available (native/vorbisnative.c)
    from ..native import pack_bits as _native_pack
    r = _native_pack(values, nbits)
    if r is not None:
        return r
    starts = np.zeros(len(nbits), dtype=np.int64)
    np.cumsum(nbits[:-1], out=starts[1:])
    total_bits = int(starts[-1] + nbits[-1])
    total_bytes = (total_bits + 7) >> 3
    # position within first byte
    bit_off = (starts & 7).astype(np.uint64)
    byte0 = (starts >> 3).astype(np.int64)
    # each (value << bit_off) spans up to ceil((32+7)/8)=5 bytes
    shifted = values << bit_off
    out = np.zeros(total_bytes + 8, dtype=np.uint8)
    for k in range(5):
        part = ((shifted >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
        np.bitwise_or.at(out, byte0 + k, part)
    return out[:total_bytes].tobytes(), total_bits
