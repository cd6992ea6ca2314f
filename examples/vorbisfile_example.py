#!/usr/bin/env python
"""Simplest vorbisfile usage: decode to stdout-style sink (reference:
examples/vorbisfile_example.c).

Usage: python examples/vorbisfile_example.py file.ogg > out.raw
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vorbis_tpu.vorbisfile import OggVorbisFile


def main():
    vf = OggVorbisFile(sys.argv[1])
    vi = vf.info()
    vendor, comments = vf.comment()
    for c in comments:
        print(c, file=sys.stderr)
    print(f"\nBitstream is {vi.channels} channel, {vi.rate}Hz",
          file=sys.stderr)
    print(f"Encoded by: {vendor}\n", file=sys.stderr)
    out = sys.stdout.buffer
    while True:
        chunk = vf.read(4096)           # (ch, k) int16
        if chunk.shape[1] == 0:
            break
        out.write(chunk.T.astype("<i2").tobytes())  # interleaved s16le
    print("Done.", file=sys.stderr)


if __name__ == "__main__":
    main()
