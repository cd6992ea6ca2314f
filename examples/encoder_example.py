#!/usr/bin/env python
"""Canonical encode loop: WAV in, Ogg Vorbis out (reference:
examples/encoder_example.c).

Usage: python examples/encoder_example.py in.wav out.ogg [-q QUALITY]
           [--bitrate KBPS] [--lowpass KHZ]
"""

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vorbis_tpu.bitstream.oggfile import OggStreamWriter
from vorbis_tpu.codec.encoder import Encoder
from vorbis_tpu.models import encsetup


def read_wav(path):
    with wave.open(path, "rb") as w:
        ch = w.getnchannels()
        rate = w.getframerate()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 1:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32)
               - 128.0) / 128.0
    else:
        raise SystemExit(f"unsupported sample width {sw}")
    return pcm.reshape(-1, ch).T.copy(), rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("-q", "--quality", type=float, default=0.4,
                    help="VBR quality -0.1..1.0 (default 0.4)")
    ap.add_argument("--bitrate", type=int, default=0,
                    help="managed ABR kbps instead of VBR")
    ap.add_argument("--lowpass", type=float, default=0.0,
                    help="lowpass kHz (encode_ctl)")
    args = ap.parse_args()

    pcm, rate = read_wav(args.infile)
    if args.bitrate:
        b = encsetup.setup_managed_staged(pcm.shape[0], rate,
                                          args.bitrate * 1000,
                                          args.bitrate * 1000,
                                          args.bitrate * 1000)
    else:
        b = encsetup.setup_vbr_staged(pcm.shape[0], rate, args.quality)
    if args.lowpass:
        b.ctl_lowpass_set(args.lowpass)
    enc = Encoder(b.init())

    w = OggStreamWriter(serialno=int.from_bytes(os.urandom(2), "little"))
    h1, h2, h3 = enc.header_packets()
    w.packetin(h1, 0)
    w.flush()
    w.packetin(h2, 0)
    w.packetin(h3, 0)
    w.flush()
    enc.write(pcm)
    enc.end_of_stream()
    for pkt in enc.pump():
        w.packetin(pkt.data, pkt.granulepos, eos=pkt.eos)
        if pkt.granulepos >= 0:
            w.flush(eos=pkt.eos)
    w.flush()
    data = w.pageout_all()
    with open(args.outfile, "wb") as f:
        f.write(data)
    secs = pcm.shape[1] / rate
    kbps = len(data) * 8 / secs / 1000
    print(f"{args.outfile}: {len(data)} bytes, {secs:.2f}s, "
          f"{kbps:.1f} kbps")


if __name__ == "__main__":
    main()
