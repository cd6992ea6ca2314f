#!/usr/bin/env python
"""Show the logical links of a (possibly chained) Ogg Vorbis stream
(reference: examples/chaining_example.c).

Usage: python examples/chaining_example.py file.ogg
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vorbis_tpu.vorbisfile import OggVorbisFile


def main():
    vf = OggVorbisFile(sys.argv[1])
    if vf.seekable:
        print(f"Input bitstream contained {vf.nstreams} logical "
              "bitstream section(s).")
        print(f"Total bitstream playing time: "
              f"{vf.time_total():.3f} seconds\n")
    for i in range(vf.nstreams):
        vi = vf.info(i)
        vendor, comments = vf.comment(i)
        print(f"\tlogical bitstream section {i + 1} information:")
        print(f"\t\t{vi.rate}Hz {vi.channels} channels; "
              f"serial number={vf.links[i].serialno}")
        print(f"\t\tplay time: {vf.time_total(i):.3f}s")
        print(f"\t\tvendor: {vendor}")
        for c in comments:
            print(f"\t\t{c}")


if __name__ == "__main__":
    main()
