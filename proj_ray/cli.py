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


def _looks_like_crs_text(t: str) -> bool:
    """WKT (KEYWORD[...]) or PROJJSON ({...}) CRS text passed as one
    shell-quoted token."""
    import re

    return t.lstrip().startswith("{") or \
        bool(re.match(r"^[A-Za-z_]+\s*[\[\(]", t.strip()))


def _cs2cs_defn(tokens: List[str]) -> str:
    """cs2cs-style CRS pair -> one pipeline definition.

    Accepts `+proj=... +to +proj=...` (the reference's syntax), two
    `EPSG:NNNN` codes resolved through the engine's init shim
    (epsg_init.py), or WKT / PROJJSON CRS text (each as one
    shell-quoted argument) parsed by proj_ray.crs."""
    def expand(t: str) -> str:
        if t.upper().startswith("EPSG:"):
            return f"+init=epsg:{t.split(':', 1)[1]}"
        if _looks_like_crs_text(t):
            from proj_ray.crs import CRS

            return CRS.from_user_input(t).to_proj_string()
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


def _rtodms(deg: float, pos: str = "", neg: str = "") -> str:
    """Degrees -> the reference's DMS text (rtodms.cpp:45-95): 0.001"
    resolution, trailing zero-valued fraction/minute/second fields
    deleted, hemisphere suffix (pos/neg) or '-' prefix when unsigned."""
    import math

    prefix, suffix = "", ""
    r = deg
    if r < 0:
        r = -r
        if not pos:
            prefix = "-"
        else:
            suffix = neg
    else:
        suffix = pos
    total = math.floor(r * 3600000.0 + 0.5)  # milli-arcseconds
    sec = (total % 60000) / 1000.0
    rr = total // 60000
    mn = int(rr % 60)
    dg = int(rr // 60)
    if sec != 0.0:
        body = f"{dg}d{mn}'" + f"{sec:.3f}".rstrip("0").rstrip(".") + '"'
    elif mn:
        body = f"{dg}d{mn}'"
    else:
        body = f"{dg}d"
    return prefix + body + suffix


def _geod_setup(tokens: List[str]):
    """(Geodesic, to_meter, params) from +ellps/+a/+es/+units tokens
    (geod_set.cpp:12-51: ellipse via pj_ell_set, f = es/(1+sqrt(1-es)),
    linear-unit factor for the distance column)."""
    from proj_ray.functions.geodesic import Geodesic
    from proj_ray.ops.base import UNITS, Params, resolve_ellipsoid

    params = Params.parse(" ".join(tokens))
    ell = resolve_ellipsoid(params, default_ellps="WGS84")
    f = ell.es / (1.0 + np.sqrt(1.0 - ell.es))
    to_meter = 1.0
    if params.has("units"):
        name = params.s("units")
        if name not in UNITS:
            raise SystemExit(f"{name} unknown unit conversion id")
        to_meter = UNITS[name]
    return Geodesic(ell.a, f), to_meter, params


def _geod_fmt_ll(lat: float, lon: float, oform) -> List[str]:
    if oform:
        return [oform % lat, oform % lon]
    return [_rtodms(lat, "N", "S"), _rtodms(lon, "E", "W")]


def _geod_fmt_azi(azi: float, oform) -> str:
    return (oform % azi) if oform else _rtodms(azi)


def _adjlon(x: float) -> float:
    while x > 180.0:
        x -= 360.0
    while x < -180.0:
        x += 360.0
    return x


def _pf_dms(params, key: str) -> float:
    """Angular +param value: decimal degrees or DMS (the reference
    parses these with dmstor — 'r'-prefixed pj_param)."""
    from proj_ray.sources.dms import dms_to_degrees

    v = float(dms_to_degrees([params.s(key) or "0"])[0])
    if np.isnan(v):
        raise SystemExit(f"invalid angular value for +{key}")
    return v


def _geod_line_mode(g, params, to_meter, oform, out) -> int:
    """+lat_1/+lon_1 line & arc modes (geod.cpp:38-67 do_arc/do_geod,
    geod_set.cpp:53-75): intermediate points along a geodesic between
    two points, or along an arc of fixed distance from a point."""
    lat1 = _pf_dms(params, "lat_1")
    lon1 = _pf_dms(params, "lon_1")
    if params.has("lat_2"):
        lat2 = _pf_dms(params, "lat_2")
        lon2 = _pf_dms(params, "lon_2")
        s12, azi1, _ = g.inverse(lat1, lon1, lat2, lon2)
        s12, azi1 = float(s12), float(azi1)
    elif params.has("S"):
        s12 = params.f("S")
        azi1 = _pf_dms(params, "A")
        la, lo, _ = g.direct(lat1, lon1, azi1, s12)
        lat2, lon2 = float(la), float(lo)
    else:
        raise SystemExit("incomplete geodesic/arc info")

    n_alpha = int(params.f("n_A")) if params.has("n_A") else 0
    if n_alpha > 0:
        del_alpha = _pf_dms(params, "del_A") if params.has("del_A") else 0.0
        if del_alpha == 0.0:
            raise SystemExit("del azimuth == 0")
        out.write("\t".join(_geod_fmt_ll(lat2, lon2, oform)) + "\n")
        az = azi1
        for _ in range(n_alpha):
            az = _adjlon(az + del_alpha)
            la, lo, _ = g.direct(lat1, lon1, az, s12)
            out.write("\t".join(
                _geod_fmt_ll(float(la), float(lo), oform)) + "\n")
        return 0
    if params.has("del_S") and params.f("del_S") != 0.0:
        n_s = int(s12 / abs(params.f("del_S")) + 0.5)
    elif params.has("n_S"):
        n_s = int(params.f("n_S"))
    else:
        raise SystemExit("no interval divisor selected")
    if n_s <= 0:
        raise SystemExit("no interval divisor selected")
    out.write("\t".join(_geod_fmt_ll(lat1, lon1, oform)) + "\n")
    del_s = s12 / n_s
    ks = np.arange(1, n_s, dtype=np.float64) * del_s
    if len(ks):
        la, lo, _ = g.direct(lat1, lon1, azi1, ks)
        for i in range(len(ks)):
            out.write("\t".join(
                _geod_fmt_ll(float(la[i]), float(lo[i]), oform)) + "\n")
    out.write("\t".join(_geod_fmt_ll(lat2, lon2, oform)) + "\n")
    return 0


def _main_geod(args, tokens: List[str], infile) -> int:
    """geod text filter (geod.cpp:68-160 process()): forward reads
    'lat1 lon1 azi12 s12' -> 'lat2 lon2 azi21'; inverse (-I) reads
    'lat1 lon1 lat2 lon2' -> 'azi12 azi21 s12'; -a prints the full set.
    The whole input parses and transforms as ONE vectorized Karney
    call."""
    from proj_ray.sources.dms import dms_to_degrees

    g, to_meter, params = _geod_setup(tokens)
    fr_meter = 1.0 / to_meter
    oform = args.oform
    osform = args.osform
    out = sys.stdout

    if params.has("lat_1"):
        return _geod_line_mode(g, params, to_meter, oform, out)

    raw = (open(infile).read() if infile else sys.stdin.read())
    lines = [ln for ln in raw.splitlines() if ln.strip()]
    echo = [ln for ln in lines if ln.lstrip().startswith("#")]
    for ln in echo:
        out.write(ln + "\n")
    lines = [ln for ln in lines if not ln.lstrip().startswith("#")]
    if not lines:
        return 0
    cols, rest = _parse_columns_dms(lines, 4, dms_to_degrees)
    lat1, lon1 = cols[0], cols[1]
    if args.inverse:
        lat2, lon2 = cols[2], cols[3]
        s12, al12, azi2 = g.inverse(lat1, lon1, lat2, lon2)
        # back azimuth: +/-0 -> -/+180, +/-180 -> -/+0 (geod_interface
        # geod_inv; depends on abs(azi2) <= 180)
        al21 = np.copysign(azi2 + np.copysign(180.0, -azi2), -azi2)
    else:
        al12 = cols[2]
        s12 = cols[3] * to_meter
        lat2, lon2, azi2 = g.direct(lat1, lon1, al12, s12)
        al21 = azi2 + np.where(azi2 >= 0, -180.0, 180.0)
    if args.pos_azi:
        al12 = np.where(al12 < 0, al12 + 360.0, al12)
        al21 = np.where(al21 < 0, al21 + 360.0, al21)
    for i in range(len(lat1)):
        if args.fullout:
            vals = (_geod_fmt_ll(lat1[i], lon1[i], oform)
                    + _geod_fmt_ll(float(lat2[i]), float(lon2[i]), oform)
                    + [_geod_fmt_azi(float(al12[i]), oform),
                       _geod_fmt_azi(float(al21[i]), oform),
                       osform % (float(s12[i]) * fr_meter)])
        elif args.inverse:
            vals = [_geod_fmt_azi(float(al12[i]), oform),
                    _geod_fmt_azi(float(al21[i]), oform),
                    osform % (float(s12[i]) * fr_meter)]
        else:
            vals = (_geod_fmt_ll(float(lat2[i]), float(lon2[i]), oform)
                    + [_geod_fmt_azi(float(al21[i]), oform)])
        tail = f"\t{rest[i]}" if rest[i] else ""
        out.write("\t".join(vals) + tail + "\n")
    return 0


def _parse_columns_dms(lines: List[str], max_cols: int, dms):
    """geod's column split: every coordinate column goes through the
    DMS parser (geod input is DMS-or-decimal in all four columns)."""
    rows, rest = [], []
    for ln in lines:
        toks = ln.split()
        rows.append(toks[:max_cols])
        rest.append(" ".join(toks[max_cols:]))
    ncol = max((len(r) for r in rows), default=0)
    cols = []
    for j in range(ncol):
        vals = [r[j] if len(r) > j else "" for r in rows]
        cols.append(dms(vals))
    return cols, rest


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="proj_ray.cli")
    ap.add_argument("mode", choices=["proj", "cct", "cs2cs", "geod"])
    ap.add_argument("-I", "--inverse", action="store_true")
    ap.add_argument("-d", "--decimals", type=int, default=None,
                    help="output decimals (proj default 2, cct default 4)")
    ap.add_argument("-a", "--fullout", action="store_true",
                    help="geod: output full set of geodesic values")
    ap.add_argument("-p", "--pos-azi", dest="pos_azi", action="store_true",
                    help="geod: output azimuths as positive values")
    ap.add_argument("-f", "--oform", default=None,
                    help="geod: C format for decimal-degree output "
                         "(default DMS)")
    ap.add_argument("-F", "--osform", default="%.3f",
                    help="geod: C format for distance output")
    ap.add_argument("--ray", action="store_true",
                    help="stream the input through ray.data (large files)")
    ap.add_argument("-l", "--list", action="store_true",
                    help="list the registered operations and exit "
                         "(reference `proj -l`, proj.cpp)")
    ap.add_argument("defn", nargs="*",
                    help="+proj=... definition tokens [input file last]")
    # intermixed: flags may follow definition tokens (proj's own CLI
    # allows `+proj=... -I`); plain parse_args stops filling a "*"
    # positional at the first trailing flag
    args = ap.parse_intermixed_args(argv)

    if args.list:
        import inspect

        from proj_ray.ops import REGISTRY

        try:
            for name in sorted(REGISTRY):
                cls = REGISTRY[name]
                mod = inspect.getmodule(cls)
                doc = (mod.__doc__ or "").strip().splitlines()
                line = doc[0].rstrip() if doc else ""
                print(f"{name} : {line}")
        except BrokenPipeError:
            pass
        return 0
    if not args.defn:
        ap.error("definition tokens required (or -l to list operations)")

    tokens = list(args.defn)
    infile = None
    if tokens and not tokens[-1].startswith(("+", "proj=", "step", "inv")) \
            and not tokens[-1].upper().startswith("EPSG:") \
            and not _looks_like_crs_text(tokens[-1]):
        infile = tokens.pop()
    if args.mode == "geod":
        return _main_geod(args, tokens, infile)
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
