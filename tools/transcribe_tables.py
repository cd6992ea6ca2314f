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




# ---------------------------------------------------------------------------
# Generic C static-initializer transcription for modes/ and books/
# ---------------------------------------------------------------------------

import gzip
import json

_DECL_RE = re.compile(
    r"static\s+const\s+(?P<toks>[A-Za-z_][A-Za-z0-9_]*"
    r"(?:\s*(?:\*|const|[A-Za-z_][A-Za-z0-9_]*))*?)\s*"
    r"(?P<dims>(?:\[[^\]]*\])*)\s*=\s*",
    re.S)


def _strip_comments(src: str) -> str:
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.S)
    src = re.sub(r"//[^\n]*", " ", src)
    return src


def _parse_value(tok: str):
    tok = tok.strip()
    tok = re.sub(r"^\([A-Za-z_][A-Za-z0-9_ ]*\*+\s*\)\s*", "", tok)  # strip casts
    if not tok:
        return None
    if tok == "NULL":
        return None
    if tok.startswith("&"):
        return {"&": tok[1:].strip()}
    t = tok.rstrip("fFlL")
    try:
        if re.fullmatch(r"[-+]?0[xX][0-9a-fA-F]+", t):
            return int(t, 16)
        if re.fullmatch(r"[-+]?\d+", t):
            return int(t)
        return float(t)
    except ValueError:
        # the C sources contain a couple of constant-folded expressions
        # (e.g. a missing comma producing "-1. -1." == -2.0)
        if re.fullmatch(r"[-+0-9.eEfF\s]+", t):
            try:
                return eval(" ".join(t.replace("f", " ").replace("F", " ").split()))
            except SyntaxError:
                pass
        return {"&": tok}  # bare identifier = reference to another table


def _parse_init(src: str, pos: int):
    """Parse a balanced {...} initializer (or scalar) starting at pos.
    Returns (value, next_pos_after)."""
    while src[pos] in " \t\n\r":
        pos += 1
    if src[pos] != "{":
        m = re.match(r"[^,}\n;]+", src[pos:])
        return _parse_value(m.group(0)), pos + m.end()
    pos += 1
    items = []
    cur = ""
    while True:
        ch = src[pos]
        if ch == "{":
            val, pos = _parse_init(src, pos)
            items.append(val)
            cur = ""
            continue
        if ch == "}":
            if cur.strip():
                items.append(_parse_value(cur))
            return items, pos + 1
        if ch == ",":
            if cur.strip():
                items.append(_parse_value(cur))
            cur = ""
            pos += 1
            continue
        cur += ch
        pos += 1


def parse_c_tables(paths):
    """Parse all `static const T name[...] = {...};` declarations from
    the given C header files into {name: {"type", "dims", "value"}}."""
    ns = {}
    for path in paths:
        src = _strip_comments(open(path).read())
        for m in _DECL_RE.finditer(src):
            toks = m.group("toks")
            ptr = toks.count("*")
            words = [w for w in re.split(r"[\s*]+", toks)
                     if w and w != "const"]
            name = words[-1]
            typ = " ".join(words[:-1])
            val, _ = _parse_init(src, m.end())
            ns[name] = {
                "type": typ,
                "ptr": ptr,
                "dims": m.group("dims"),
                "value": val,
                "file": os.path.basename(path),
            }
    return ns


def transcribe_books_and_modes():
    book_files = []
    for sub in ("coupled", "uncoupled", "floor"):
        d = os.path.join(REF, "lib", "books", sub)
        book_files += [os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".h")]
    mode_files = [os.path.join(REF, "lib", "modes", f)
                  for f in sorted(os.listdir(os.path.join(REF, "lib", "modes")))
                  if f.endswith(".h")]
    # vorbisenc.c holds a few canonical tables (_mode_template,
    # _map_nominal, setup_list ordering)
    mode_files.append(os.path.join(REF, "lib", "vorbisenc.c"))
    ns = parse_c_tables(book_files + mode_files)

    # split static_codebook entries out into npz (big numeric payload)
    books = {}
    meta = {}
    scalars = {}
    for name, d in list(ns.items()):
        if d["type"] == "static_codebook" and d["ptr"] == 0:
            v = d["value"]
            # {dim, entries, lengthlist_ref, maptype, q_min, q_delta,
            #  q_quant, q_sequencep, quantlist_ref, allocedp}
            dim, entries = v[0], v[1]
            ll_ref = v[2]["&"] if isinstance(v[2], dict) else None
            maptype = v[3] if len(v) > 3 else 0
            q_min = v[4] if len(v) > 4 else 0
            q_delta = v[5] if len(v) > 5 else 0
            q_quant = v[6] if len(v) > 6 else 0
            q_seq = v[7] if len(v) > 7 else 0
            ql_ref = (v[8]["&"] if len(v) > 8 and isinstance(v[8], dict)
                      else None)
            ll = np.array(ns[ll_ref]["value"], dtype=np.int16) if ll_ref \
                else np.zeros(entries, np.int16)
            books[f"{name}.ll"] = ll
            if ql_ref:
                books[f"{name}.ql"] = np.array(ns[ql_ref]["value"],
                                               dtype=np.int64)
            meta[name] = [int(dim), int(entries), int(maptype),
                          int(q_min) & 0xFFFFFFFF, int(q_delta) & 0xFFFFFFFF,
                          int(q_quant), int(q_seq)]
            del ns[name]
        elif d["type"].endswith("char") or d["type"].endswith("long"):
            # raw length/quant lists are embedded with their books
            scalars[name] = True
    for name in list(ns):
        if name in scalars:
            del ns[name]

    np.savez_compressed(os.path.join(OUT, "books.npz"), **books)
    with gzip.open(os.path.join(OUT, "books_meta.json.gz"), "wt") as f:
        json.dump(meta, f)
    # everything else (modes namespace) as json
    slim = {k: {"type": v["type"], "ptr": v["ptr"], "value": v["value"]}
            for k, v in ns.items()}
    with gzip.open(os.path.join(OUT, "modes.json.gz"), "wt") as f:
        json.dump(slim, f)
    print(f"books.npz: {len(meta)} codebooks; modes.json.gz: {len(slim)} tables")




def transcribe_psy_tables():
    """Numeric psy tuning tables from lib/masking.h and lib/psy.c tops
    (ATH, empirical tone-mask curves, aoTuV presets)."""
    ns = parse_c_tables([os.path.join(REF, "lib", "masking.h"),
                         os.path.join(REF, "lib", "psy.c")])
    out = {}
    out["ATH"] = np.array(ns["ATH"]["value"], dtype=np.float32)
    tm = ns["tonemasks"]["value"]
    out["tonemasks"] = np.array(tm, dtype=np.float32)  # (17, 6, 56)
    assert out["tonemasks"].shape == (17, 6, 56)
    for nm in ("m3n32", "m3n44", "m3n48", "m3n32x2", "m3n44x2", "m3n48x2"):
        out[nm] = np.array(ns[nm]["value"], dtype=np.int32)
    out["ntfix_offset"] = np.array(ns["ntfix_offset"]["value"],
                                   dtype=np.float32)
    out["stn_compand"] = np.array(ns["stn_compand"]["value"],
                                  dtype=np.float32)
    out["freq_bfn128"] = np.array(ns["freq_bfn128"]["value"], dtype=np.int32)
    out["freq_bfn256"] = np.array(ns["freq_bfn256"]["value"], dtype=np.int32)
    out["stereo_threshholds"] = np.array(
        ns["stereo_threshholds"]["value"], dtype=np.float64)
    out["stereo_threshholds_X"] = np.array(
        ns["stereo_threshholds_X"]["value"], dtype=np.float64)
    ap = ns["set_aotuv_psy"]["value"]  # 12 x {endp, thres, min_nn_lp, tonefix}
    out["aotuv_preset"] = np.array(
        [[e[0], 0, e[2], e[3]] for e in ap], dtype=np.int32)
    out["aotuv_preset_thres"] = np.array([e[1] for e in ap],
                                         dtype=np.float32)
    np.savez_compressed(os.path.join(OUT, "psy_tables.npz"), **out)
    print(f"psy_tables.npz: ATH[{len(out['ATH'])}], tonemasks, presets")


def main():
    os.makedirs(OUT, exist_ok=True)
    transcribe_windows()
    transcribe_floor_tables()
    transcribe_books_and_modes()
    transcribe_psy_tables()


if __name__ == "__main__":
    main()
