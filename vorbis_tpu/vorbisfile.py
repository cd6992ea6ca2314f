"""vorbisfile-equivalent streaming/seek layer (reference:
lib/vorbisfile.c).

`OggVorbisFile` mirrors the `ov_*` API over the in-repo decoder:
chained/multiplexed stream discovery (_bisect_forward_serialno,
vorbisfile.c:474), per-link info/comment, pcm/time totals, streaming
float and int16 reads (ov_read_float vorbisfile.c:2271 / ov_read 2252),
raw/pcm/time seeking with packet-accurate positioning (ov_pcm_seek
vorbisfile.c:1680), and crosslap splicing (ov_crosslap 2413).

Differences from the reference by design:
- the source is a bytes buffer or seekable file object, so "bisection
  over the callback" becomes direct page-index bisection;
- halfrate decode is real half-size IMDCT like the reference
  (synthesis.c:166, block.c >>hs lapping); positions and totals remain
  in full-rate units, reads return half as many samples.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .bitstream.oggfile import OggStreamReader, parse_page
from .codec import headers as H
from .codec.decoder import Decoder, NotAudioPacket


class OVError(Exception):
    pass


@dataclass
class _Link:
    serialno: int
    pages: list                  # OggPage list, physical order
    vi: H.VorbisInfo = None
    vendor: str = ""
    comments: list = field(default_factory=list)
    pcm_start: int = 0           # absolute pcm offset of link start
    pcm_total: int = 0


def _packets_of_pages(pages, start_page=0):
    """Yield (packet, granulepos_or_None, eos, page_idx) from a page
    list, resuming cleanly mid-stream (continued packets at the start
    are dropped, like ogg_stream resync)."""
    partial = bytearray()
    have_partial = False
    for pidx in range(start_page, len(pages)):
        page = pages[pidx]
        segs = page.segments
        i = 0
        if page.continued and not have_partial:
            while i < len(segs) and len(segs[i]) == 255:
                i += 1
            if i < len(segs):
                i += 1
            partial = bytearray()
        cur = partial
        n_complete = sum(1 for s in segs[i:] if len(s) < 255)
        emitted = 0
        for j in range(i, len(segs)):
            cur += segs[j]
            if len(segs[j]) < 255:
                emitted += 1
                last = emitted == n_complete
                yield (bytes(cur), page.granulepos if last else None,
                       page.eos and last, pidx)
                cur = bytearray()
        partial = cur
        have_partial = len(partial) > 0 or (
            len(segs) > 0 and len(segs[-1]) == 255)


def _parse_comment(packet: bytes):
    """Minimal comment header parse -> (vendor, [comments])."""
    from .bitstream.bitpack import BitReader
    br = BitReader(packet)
    if br.read(8) != 3 or bytes(br.readbytes(6)) != b"vorbis":
        raise OVError("not a comment header")
    vlen = br.read(32)
    vendor = bytes(br.readbytes(vlen)).decode("utf-8", "replace")
    n = br.read(32)
    comments = []
    for _ in range(n):
        clen = br.read(32)
        comments.append(bytes(br.readbytes(clen)).decode("utf-8",
                                                         "replace"))
    return vendor, comments


class OggVorbisFile:
    """Pull-based decoder over a whole Ogg byte stream (ov_open +
    ov_read* + ov_*_seek family)."""

    def __init__(self, src):
        if hasattr(src, "read"):
            data = src.read()
        elif isinstance(src, (bytes, bytearray, memoryview)):
            data = bytes(src)
        else:
            with open(src, "rb") as f:
                data = f.read()
        self.data = data
        self.links: list[_Link] = []
        self._scan_chain()
        if not self.links:
            raise OVError("no Vorbis stream found (OV_ENOTVORBIS)")
        self._cur_link = 0
        self._decoder = None
        self._pkt_iter = None
        self._pcm_offset = 0      # absolute (cross-link) next sample
        self._pending = None      # (ch, k) decoded not yet returned
        self._open_link(0)

    # ---- chain discovery (reference: _bisect_forward_serialno) -------
    def _scan_chain(self):
        buf = self.data
        off = 0
        n = len(buf)
        pages = []
        while off < n:
            idx = buf.find(b"OggS", off)
            if idx < 0:
                break
            try:
                res = parse_page(buf, idx)
            except ValueError:
                off = idx + 1
                continue
            if res is None:
                off = idx + 1
                continue
            page, off = res
            pages.append(page)
        # split into chain segments at BOS boundaries; within a segment,
        # pick the serialno whose first packet is a Vorbis id header
        # (grouped/multiplexed streams carry several BOS pages)
        seg_start = 0
        i = 0
        links = []
        while i < len(pages):
            # collect the BOS group
            serials = []
            while i < len(pages) and pages[i].bos:
                serials.append(pages[i].serialno)
                i += 1
            if not serials:
                i += 1
                continue
            # advance to the next BOS group (next chain link)
            j = i
            while j < len(pages) and not pages[j].bos:
                j += 1
            seg_pages = pages[seg_start:j]
            link = self._identify_vorbis(seg_pages, serials)
            if link is not None:
                links.append(link)
            seg_start = j
            i = j
        self.links = links
        # totals per link from the last granulepos in the link
        acc = 0
        for lk in self.links:
            last_gp = 0
            first_gp = None
            audio_pages = [p for p in lk.pages
                           if p.granulepos is not None
                           and p.granulepos >= 0]
            for p in audio_pages:
                last_gp = p.granulepos
            lk.pcm_start = acc
            lk.pcm_total = last_gp
            acc += lk.pcm_total

    def _identify_vorbis(self, seg_pages, serials):
        for sn in serials:
            sp = [p for p in seg_pages if p.serialno == sn]
            try:
                pkts = []
                for pk, _, _, _ in _packets_of_pages(sp):
                    pkts.append(pk)
                    if len(pkts) == 3:
                        break
                if len(pkts) < 3:
                    continue
                vi = H.parse_headers(pkts)
                vendor, comments = _parse_comment(pkts[1])
                return _Link(serialno=sn, pages=sp, vi=vi, vendor=vendor,
                             comments=comments)
            except Exception:
                continue
        return None

    # ---- ov_info / ov_comment ----------------------------------------
    def info(self, link=-1) -> H.VorbisInfo:
        return self.links[self._cur_link if link < 0 else link].vi

    def comment(self, link=-1):
        lk = self.links[self._cur_link if link < 0 else link]
        return lk.vendor, lk.comments

    @property
    def nstreams(self):
        return len(self.links)

    @property
    def seekable(self):
        return True

    # ---- totals (ov_pcm_total / ov_time_total / ov_raw_total) --------
    def pcm_total(self, link=-1) -> int:
        if link < 0:
            return sum(lk.pcm_total for lk in self.links)
        return self.links[link].pcm_total

    def time_total(self, link=-1) -> float:
        if link < 0:
            return sum(lk.pcm_total / lk.vi.rate for lk in self.links)
        lk = self.links[link]
        return lk.pcm_total / lk.vi.rate

    def raw_total(self, link=-1) -> int:
        return len(self.data)

    # ---- decode state -------------------------------------------------
    def _open_link(self, link):
        lk = self.links[link]
        self._cur_link = link
        self._decoder = Decoder(lk.vi,
                                halfrate=bool(getattr(self, "_hs", 0)))
        it = _packets_of_pages(lk.pages)
        # consume the 3 header packets
        for _ in range(3):
            next(it)
        self._pkt_iter = it
        self._pending = None

    def _decode_next(self):
        """Decode packets until PCM appears; returns (ch, k) or None at
        end of link/chain (advancing links automatically)."""
        while True:
            try:
                pk, gp, eos, _ = next(self._pkt_iter)
            except StopIteration:
                if self._cur_link + 1 < len(self.links):
                    self._open_link(self._cur_link + 1)
                    continue
                return None
            try:
                out = self._decoder.decode_packet(pk, gp, eos)
            except NotAudioPacket:
                continue
            except Exception:
                continue  # hole: skip undecodable packet (OV_HOLE)
            if out is not None and out.shape[1]:
                return out

    # ---- reads ---------------------------------------------------------
    def read_float(self, nsamples: int) -> np.ndarray:
        """ov_read_float: up to nsamples per channel as float32
        (ch, k); k == 0 at EOF.  Like the reference, returns what is
        conveniently available, never crossing a link boundary."""
        if self._pcm_offset is None:
            self._establish_position()
        if self._pending is not None and self._pending.shape[1]:
            chunk = self._pending
        else:
            chunk = self._decode_next()
            if chunk is None:
                return np.zeros((self.info().channels, 0), np.float32)
        k = min(nsamples, chunk.shape[1])
        out, self._pending = chunk[:, :k], chunk[:, k:]
        if self._pending.shape[1] == 0:
            self._pending = None
        # positions stay in full-rate units under halfrate
        self._pcm_offset += k << getattr(self, "_hs", 0)
        return out

    def read(self, nsamples: int, word: int = 2, signed: bool = True,
             bigendian: bool = False) -> np.ndarray:
        """ov_read (vorbisfile.c:2252): integer PCM output.  word=2 ->
        int16 (+-32768 scale), word=1 -> 8-bit (+-128, offset 128 when
        unsigned); conversion mirrors vorbis_ftoi round-to-nearest +
        clamp (ov_read_filter's float->int).  Returns (ch, k) in the
        requested dtype/byte order."""
        f = self.read_float(nsamples)
        if word == 1:
            v = np.clip(np.rint(f.astype(np.float64) * 128.0),
                        -128, 127)
            if signed:
                return v.astype(np.int8)
            return (v + 128).astype(np.uint8)
        if word != 2:
            raise OVError("word size must be 1 or 2 (OV_EINVAL)")
        v = np.clip(np.rint(f.astype(np.float64) * 32768.0),
                    -32768, 32767)
        if not signed:
            v = v + 32768
            dt = ">u2" if bigendian else "<u2"
        else:
            dt = ">i2" if bigendian else "<i2"
        return v.astype(dt)

    def read_all_float(self) -> np.ndarray:
        """Decode everything from the current position.  When standing
        at the start of a link with no halfrate, the batched path
        amortizes the IMDCT across all packets (parse bits per packet,
        one vectorized transform per blocksize group, then the lapping
        walk)."""
        if self._pcm_offset is None:
            # a prior page-level seek left the position unresolved;
            # resolve it and drain sequentially from here (the batched
            # path would silently restart the link from sample 0)
            self._establish_position()
        if (self._pcm_offset == 0 and self._cur_link == 0
                and self._pending is None
                and not getattr(self, "_hs", 0)):
            return self._read_all_batched()
        out = []
        while True:
            c = self.read_float(1 << 20)
            if c.shape[1] == 0:
                break
            out.append(c)
        if not out:
            return np.zeros((self.info().channels, 0), np.float32)
        return np.concatenate(out, axis=1)

    def _read_all_batched(self) -> np.ndarray:
        from .ops.mdct import imdct
        out = []
        for li in range(self._cur_link, len(self.links)):
            self._open_link(li)
            link_pkts = [(pk, gp, eos)
                         for pk, gp, eos, _ in self._pkt_iter]
            # native whole-link fast drain (C packet parse + batched
            # synthesis, bit-exact); falls back to the per-packet path
            # for stream shapes it doesn't cover
            try:
                from .models.fastdec import (FastDecodeUnsupported,
                                             FastDecoder)
                fd = FastDecoder(self.links[li].vi)
                out.append(fd.decode_packets(link_pkts))
                continue
            except FastDecodeUnsupported:
                pass
            dec = self._decoder
            parsed = []            # (spec, W, gp, eos)
            for pk, gp, eos in link_pkts:
                try:
                    spec, W = dec.parse_packet(pk)
                except NotAudioPacket:
                    continue
                except Exception:
                    continue
                parsed.append([spec, W, gp, eos])
            # batch the IMDCT per blocksize group
            for W in (0, 1):
                idx = [k for k, p in enumerate(parsed) if p[1] == W]
                if not idx:
                    continue
                n = dec.bs[W]
                stack = np.stack([parsed[k][0] for k in idx])
                pcm = np.asarray(imdct(
                    stack.reshape(-1, n // 2), n)).reshape(
                        len(idx), -1, n)
                for j, k in enumerate(idx):
                    parsed[k][0] = pcm[j]
            for spec, W, gp, eos in parsed:
                got = dec.blockin(spec, W, gp, eos)
                if got is not None and got.shape[1]:
                    out.append(got)
        if not out:
            return np.zeros((self.info().channels, 0), np.float32)
        full = np.concatenate(out, axis=1)
        self._pcm_offset = self.pcm_total()
        self._pkt_iter = iter(())
        return full

    # ---- tells ---------------------------------------------------------
    def pcm_tell(self) -> int:
        if self._pcm_offset is None:
            self._establish_position()
        return self._pcm_offset

    def time_tell(self) -> float:
        lk = self.links[self._cur_link]
        rel = self._pcm_offset - lk.pcm_start
        t = sum(l.pcm_total / l.vi.rate
                for l in self.links[:self._cur_link])
        return t + rel / lk.vi.rate

    # ---- seeking --------------------------------------------------------
    def raw_seek(self, byte_off: int):
        """ov_raw_seek: position at the page spanning byte_off and
        resynchronize; pcm position derives from the next page's
        granulepos."""
        # find the link & page index by byte offset via page rescan
        target_link, target_page = 0, 0
        count = 0
        pos = 0
        for li, lk in enumerate(self.links):
            for pi, page in enumerate(lk.pages):
                blen = len(page.to_bytes())
                if pos + blen > byte_off:
                    target_link, target_page = li, pi
                    break
                pos += blen
            else:
                continue
            break
        lk = self.links[target_link]
        self._seek_to_page(target_link,
                           max(target_page, self._first_audio_page(lk)))

    @staticmethod
    def _first_audio_page(lk: _Link) -> int:
        """Index of the first page carrying audio: the page where the
        3rd header packet completes if audio segments follow it there,
        else the next page (reference ov_raw_seek restarts cleanly at
        the stream head rather than assuming a fixed header layout)."""
        done = 0
        for pidx, page in enumerate(lk.pages):
            for si, seg in enumerate(page.segments):
                if len(seg) < 255:
                    done += 1
                    if done == 3:
                        more = si + 1 < len(page.segments)
                        return pidx if more else pidx + 1
        return len(lk.pages)

    def _page_of_pcm(self, lk: _Link, pos: int) -> int:
        """Bisection over the link's pages by granulepos (reference:
        ov_pcm_seek_page interpolated bisection)."""
        pages = lk.pages
        lo, hi = 0, len(pages) - 1
        best = 0
        while lo <= hi:
            mid = (lo + hi) // 2
            gp = pages[mid].granulepos
            if gp is None or gp < 0:
                # skip non-audio page: scan forward for a granulepos
                k = mid
                while k <= hi and (pages[k].granulepos is None
                                   or pages[k].granulepos < 0):
                    k += 1
                if k > hi:
                    hi = mid - 1
                    continue
                mid, gp = k, pages[k].granulepos
            if gp < pos:
                best = mid
                lo = mid + 1
            else:
                hi = mid - 1
        return best

    def _seek_to_page(self, link: int, page_idx: int):
        self._cur_link = link
        lk = self.links[link]
        self._decoder = Decoder(lk.vi,
                                halfrate=bool(getattr(self, "_hs", 0)))
        it = _packets_of_pages(lk.pages)
        for _ in range(3):
            next(it)
        if page_idx > 0:
            it = _packets_of_pages(lk.pages, page_idx)
        self._pkt_iter = it
        self._pending = None
        # The exact pcm position after a mid-stream resync is unknown
        # until the next page-end granulepos arrives (reference:
        # ov_pcm_seek_page re-derives position from the first decoded
        # granulepos); _establish_position() resolves it lazily.
        self._pcm_offset = None

    def _establish_position(self):
        """Decode forward until the decoder learns its granulepos, then
        back-date the absolute offset of the buffered output."""
        if self._pcm_offset is not None:
            return
        lk = self.links[self._cur_link]
        chunks = []
        total = 0
        while self._decoder.granulepos == -1:
            c = self._decode_next()
            if c is None:
                self._pcm_offset = lk.pcm_start + lk.pcm_total
                return
            chunks.append(c)
            total += c.shape[1] << getattr(self, "_hs", 0)
        # one more guard: granulepos may have become known with PCM
        # still pending in `chunks`
        frontier = lk.pcm_start + self._decoder.granulepos
        self._pcm_offset = frontier - total
        if chunks:
            self._pending = np.concatenate(chunks, axis=1)

    def pcm_seek_page(self, pos: int):
        """ov_pcm_seek_page: land on the page boundary at or before
        pos (absolute sample position across links)."""
        if not 0 <= pos <= self.pcm_total():
            raise OVError("seek out of range (OV_EINVAL)")
        link = 0
        for li, lk in enumerate(self.links):
            if pos < lk.pcm_start + lk.pcm_total or li == len(
                    self.links) - 1:
                link = li
                break
        lk = self.links[link]
        rel = pos - lk.pcm_start
        pidx = self._page_of_pcm(lk, rel)
        self._seek_to_page(link, pidx)

    def pcm_seek(self, pos: int):
        """ov_pcm_seek: page seek then packet-accurate skip forward
        (reference: vorbisfile.c:1680)."""
        self.pcm_seek_page(pos)
        self._establish_position()
        # decode & discard until the absolute position reaches pos
        while self._pcm_offset < pos:
            if self._pending is not None and self._pending.shape[1]:
                chunk, self._pending = self._pending, None
            else:
                chunk = self._decode_next()
                if chunk is None:
                    break
            hs = getattr(self, "_hs", 0)
            k = chunk.shape[1] << hs
            if self._pcm_offset + k > pos:
                self._pending = chunk[:, (pos - self._pcm_offset) >> hs:]
                self._pcm_offset = pos
                return
            self._pcm_offset += k

    def time_seek(self, seconds: float):
        """ov_time_seek: map time to pcm across links then pcm_seek."""
        t = 0.0
        for lk in self.links:
            dur = lk.pcm_total / lk.vi.rate
            if seconds < t + dur:
                rel = int((seconds - t) * lk.vi.rate)
                return self.pcm_seek(lk.pcm_start + rel)
            t += dur
        return self.pcm_seek(self.pcm_total())

    # ---- crosslap -------------------------------------------------------
    def crosslap(self, other: "OggVorbisFile"):
        """ov_crosslap: window-splice this stream's lap tail into the
        start of `other` (both must share channel count).  Mirrors the
        reference's use of vorbis_synthesis_lapout: the tail half-window
        of self is added into other's first window-half samples."""
        vi1, vi2 = self.info(), other.info()
        if vi1.channels != vi2.channels:
            raise OVError("channel mismatch (OV_EINVAL)")
        tail = self._decoder.lapout() if self._decoder is not None else None
        if tail is None or tail.shape[1] == 0:
            return
        head = other.read_float(tail.shape[1])
        from .ops.window import hybrid_window
        n = 2 * tail.shape[1]
        w = hybrid_window(n, n, 1, 1, 1)[:n // 2]
        spliced = tail * w[::-1] + head * w[: head.shape[1]]
        other._pending = spliced.astype(np.float32)
        other._pcm_offset -= head.shape[1]

    def halfrate(self, flag: bool):
        """ov_halfrate (vorbisfile.c:1030): decode at half the sample
        rate via half-size IMDCT/windows.  pcm positions/totals remain
        in FULL-rate units (like the reference); reads simply return
        half as many samples per block."""
        if flag and min(lk.vi.blocksizes[0] for lk in self.links) <= 64:
            raise OVError("blocksize too small for halfrate (OV_EINVAL)")
        # reference ov_halfrate preserves the playback position across
        # the decoder reinit (vorbisfile.c:1030)
        pos = self.pcm_tell()
        self._hs = 1 if flag else 0
        self._open_link(self._cur_link)
        lk = self.links[self._cur_link]
        self._pcm_offset = lk.pcm_start
        if pos != lk.pcm_start:
            self.pcm_seek(pos)

    def halfrate_p(self) -> bool:
        return bool(getattr(self, "_hs", 0))


# convenience mirroring ov_fopen + full drain
def decode_file(src):
    """Decode an entire (possibly chained) stream: returns
    (pcm (ch, n) float32, OggVorbisFile)."""
    vf = OggVorbisFile(src)
    return vf.read_all_float(), vf
