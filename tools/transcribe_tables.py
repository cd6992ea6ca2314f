#!/usr/bin/env python
"""One-time transcription of the reference's static numeric tables into
.npz data files.

These numbers ARE the codec (window shapes, dB lookup curves, trained
codebooks, psy tuning curves); they are format constants that must match
bit-for-bit for stream compatibility, so they are extracted as *data*
from the reference tree (/root/reference) and stored as binary .npz in
vorbis_tpu/data/.  No code is taken — only numeric literals.

Run:  python tools/transcribe_tables.py
"""

import os
import re
import sys

import numpy as np

REF = os.environ.get("VORBIS_REF", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "vorbis_tpu", "data")

FLOAT_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?F?")


def _floats(text):
    return [float(t.rstrip("F").rstrip("f")) for t in FLOAT_RE.findall(text)]


def _ints(text):
    return [int(t) for t in re.findall(r"-?\d+", text)]


def transcribe_windows():
    src = open(os.path.join(REF, "lib", "window.c")).read()
    out = {}
    for log2 in range(6, 14):
        n = 1 << log2
        half = n // 2
        m = re.search(
            r"static const float vwin%d\[%d\] = \{(.*?)\};" % (n, half),
            src, re.S)
        vals = np.array(_floats(m.group(1)), dtype=np.float32)
        assert vals.shape == (half,), (n, vals.shape)
        assert np.all(np.diff(vals.astype(np.float64)) >= 0)
        out[f"vwin{n}"] = vals
    np.savez_compressed(os.path.join(OUT, "windows.npz"), **out)
    print(f"windows.npz: {len(out)} window tables")


def transcribe_floor_tables():
    src = open(os.path.join(REF, "lib", "floor1.c")).read()
    m = re.search(r"FLOOR1_fromdB_LOOKUP\[256\]=\{(.*?)\};", src, re.S)
    vals = np.array(_floats(m.group(1)), dtype=np.float32)
    assert vals.shape == (256,) and vals[-1] == 1.0
    np.savez_compressed(os.path.join(OUT, "floor_tables.npz"),
                        fromdB_lookup=vals)
    print("floor_tables.npz: FLOOR1_fromdB_LOOKUP[256]")


def main():
    os.makedirs(OUT, exist_ok=True)
    transcribe_windows()
    transcribe_floor_tables()


if __name__ == "__main__":
    main()
