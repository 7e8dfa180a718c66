"""proj / cct-style command-line text pipeline.

The reference's users drive coordinate operations through text-filter
binaries (`proj`, `cs2cs`, `cct` — SURVEY.md §3.2: whitespace-separated
columns in, transformed columns out).  This module is the engine's
equivalent, reading coordinate text (decimal or DMS via
sources/dms.py), running ONE vectorized transform over the whole
input, and printing the reference's default formats.

    python -m proj_ray.cli proj +proj=utm +zone=32 +ellps=WGS84 < pts.txt
    python -m proj_ray.cli proj -I +proj=utm ... < xy.txt
    python -m proj_ray.cli cct +proj=pipeline +step ... < xyzt.txt

`proj` reads lon lat [extra...] and writes x y [extra...];
`cct` reads x y [z [t]] and writes all four (cct semantics).
`--ray` streams through ray.data.read_text for inputs too large for
one array (one map_batches stage; requires an initialised Ray or
standalone auto-init).
"""

from __future__ import annotations

import argparse
import sys
from typing import List

import numpy as np


def _parse_columns(lines: List[str], max_cols: int):
    """Split text lines into up to max_cols coordinate columns (DMS or
    decimal) + per-line remainder strings."""
    from proj_ray.sources.dms import dms_to_degrees

    rows = []
    rest = []
    for ln in lines:
        toks = ln.split()
        rows.append(toks[:max_cols])
        rest.append(" ".join(toks[max_cols:]))
    ncol = max((len(r) for r in rows), default=0)
    cols = []
    for j in range(ncol):
        vals = [r[j] if len(r) > j else "" for r in rows]
        # decimal fast path; DMS fallback per column
        try:
            cols.append(np.array([float(v) if v else np.nan for v in vals]))
        except ValueError:
            cols.append(dms_to_degrees(vals))
    return cols, rest


def _run(defn: str, cols, inverse: bool, cct: bool):
    from proj_ray.pipeline import create_operation, transform_arrays

    p = create_operation(defn)
    x = cols[0] if len(cols) > 0 else np.zeros(0)
    y = cols[1] if len(cols) > 1 else np.zeros_like(x)
    z = cols[2] if len(cols) > 2 else None
    t = cols[3] if (cct and len(cols) > 3) else None
    return transform_arrays(p, x, y, z, t,
                            direction="inverse" if inverse else "forward")


def _cs2cs_defn(tokens: List[str]) -> str:
    """cs2cs-style CRS pair -> one pipeline definition.

    Accepts `+proj=... +to +proj=...` (the reference's syntax) or two
    `EPSG:NNNN` codes resolved through the engine's init shim
    (epsg_init.py)."""
    def expand(t: str) -> str:
        if t.upper().startswith("EPSG:"):
            return f"+init=epsg:{t.split(':', 1)[1]}"
        return t

    if "+to" in tokens:
        i = tokens.index("+to")
        src = " ".join(expand(t) for t in tokens[:i])
        dst = " ".join(expand(t) for t in tokens[i + 1:])
    elif len(tokens) == 2:
        src, dst = expand(tokens[0]), expand(tokens[1])
    else:
        raise SystemExit("cs2cs needs '+proj=... +to +proj=...' or two "
                         "EPSG:NNNN codes")
    return f"+proj=pipeline +step +inv {src} +step {dst}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="proj_ray.cli")
    ap.add_argument("mode", choices=["proj", "cct", "cs2cs"])
    ap.add_argument("-I", "--inverse", action="store_true")
    ap.add_argument("-d", "--decimals", type=int, default=None,
                    help="output decimals (proj default 2, cct default 4)")
    ap.add_argument("--ray", action="store_true",
                    help="stream the input through ray.data (large files)")
    ap.add_argument("defn", nargs="+",
                    help="+proj=... definition tokens [input file last]")
    args = ap.parse_args(argv)

    tokens = list(args.defn)
    infile = None
    if tokens and not tokens[-1].startswith(("+", "proj=", "step", "inv")) \
            and not tokens[-1].upper().startswith("EPSG:"):
        infile = tokens.pop()
    if args.mode == "cs2cs":
        defn = _cs2cs_defn(tokens)
        args.mode = "cct"  # cs2cs I/O is 3D/4D like cct
    else:
        defn = " ".join(tokens)
    dec = args.decimals if args.decimals is not None \
        else (4 if args.mode == "cct" else 2)
    cct = args.mode == "cct"
    max_cols = 4 if cct else 2

    if args.ray:
        return _main_ray(defn, infile, args.inverse, cct, dec)

    raw = (open(infile).read() if infile else sys.stdin.read())
    lines = [ln for ln in raw.splitlines() if ln.strip()
             and not ln.lstrip().startswith("#")]
    cols, rest = _parse_columns(lines, max_cols)
    if not cols:
        return 0
    c = _run(defn, cols, args.inverse, cct)
    out = sys.stdout
    for i in range(len(c.x)):
        if c.err[i] != 0:
            vals = ["*"] * (4 if cct else 2)
        elif cct:
            vals = [f"{v:.{dec}f}" for v in
                    (c.x[i], c.y[i], c.z[i], c.t[i])]
        else:
            vals = [f"{c.x[i]:.{dec}f}", f"{c.y[i]:.{dec}f}"]
        tail = f"\t{rest[i]}" if rest[i] else ""
        out.write("\t".join(vals) + tail + "\n")
    return 0


def _main_ray(defn: str, infile, inverse: bool, cct: bool,
              dec: int) -> int:
    """Streaming variant: ray.data.read_text -> one map_batches."""
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    if infile is None:
        print("--ray requires an input file", file=sys.stderr)
        return 2

    from proj_ray.pipeline import create_operation, transform_arrays

    p = create_operation(defn)
    max_cols = 4 if cct else 2

    def batch_fn(batch):
        import pyarrow as pa

        lines = [ln for ln in batch["text"].to_pylist()
                 if ln.strip() and not ln.lstrip().startswith("#")]
        cols, rest = _parse_columns(lines, max_cols)
        if not cols:
            return pa.table({"out": pa.array([], type=pa.string())})
        c = transform_arrays(p, cols[0],
                             cols[1] if len(cols) > 1 else
                             np.zeros_like(cols[0]),
                             cols[2] if len(cols) > 2 else None,
                             cols[3] if (cct and len(cols) > 3) else None,
                             direction="inverse" if inverse else "forward")
        out = []
        for i in range(len(c.x)):
            if c.err[i] != 0:
                vals = ["*"] * (4 if cct else 2)
            elif cct:
                vals = [f"{v:.{dec}f}" for v in
                        (c.x[i], c.y[i], c.z[i], c.t[i])]
            else:
                vals = [f"{c.x[i]:.{dec}f}", f"{c.y[i]:.{dec}f}"]
            tail = f"\t{rest[i]}" if rest[i] else ""
            out.append("\t".join(vals) + tail)
        return pa.table({"out": pa.array(out, type=pa.string())})

    ds = rd.read_text(infile).map_batches(batch_fn, batch_format="pyarrow")
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        for s in b.column("out").to_pylist():
            sys.stdout.write(s + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
