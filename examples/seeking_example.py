#!/usr/bin/env python
"""Seek torture test: random sample-accurate seeks must match linear
decode (reference: examples/seeking_example.c).

Usage: python examples/seeking_example.py file.ogg [n_seeks]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vorbis_tpu.vorbisfile import OggVorbisFile


def main():
    path = sys.argv[1]
    n_seeks = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    vf = OggVorbisFile(path)
    total = vf.pcm_total()
    print(f"testing pcm page/sample seeking to random places in "
          f"{total} samples....")
    linear = vf.read_all_float()
    rng = np.random.RandomState(42)
    for i in range(n_seeks):
        pos = int(rng.randint(0, total))
        print(f"\t\tseeking to {pos}...", end=" ")
        vf.pcm_seek(pos)
        got = vf.read_float(512)
        want = linear[:, pos:pos + got.shape[1]]
        if np.array_equal(got, want):
            print("ok.")
        else:
            print("FAILED")
            sys.exit(1)
    # time seeks
    for i in range(n_seeks // 3):
        t = float(rng.uniform(0, vf.time_total()))
        vf.time_seek(t)
        got = vf.read_float(256)
        pos = int(t * vf.info().rate)
        want = linear[:, pos:pos + got.shape[1]]
        assert np.array_equal(got, want), f"time_seek({t}) FAILED"
    print("\nOK.\n")


if __name__ == "__main__":
    main()
