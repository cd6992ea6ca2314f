#!/usr/bin/env python
"""Canonical decode loop: Ogg Vorbis in, WAV out (reference:
examples/decoder_example.c).

Usage: python examples/decoder_example.py in.ogg out.wav
"""

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vorbis_tpu.vorbisfile import OggVorbisFile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("--halfrate", action="store_true")
    args = ap.parse_args()

    vf = OggVorbisFile(args.infile)
    vi = vf.info()
    if args.halfrate:
        vf.halfrate(True)
    pcm16 = []
    while True:
        chunk = vf.read(4096)
        if chunk.shape[1] == 0:
            break
        pcm16.append(chunk)
    pcm = (np.concatenate(pcm16, axis=1) if pcm16
           else np.zeros((vi.channels, 0), np.int16))
    rate = vi.rate >> (1 if args.halfrate else 0)
    with wave.open(args.outfile, "wb") as w:
        w.setnchannels(vi.channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.T.astype("<i2").tobytes())
    print(f"{args.outfile}: {pcm.shape[1]} samples x {vi.channels}ch "
          f"@ {rate} Hz")


if __name__ == "__main__":
    main()
