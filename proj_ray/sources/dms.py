"""Vectorized DMS text parsing — the column analogue of the
reference's dmstor (src/dmstor.cpp:26-150), for proj/cs2cs-style text
ingestion (SURVEY.md §2.1).

One RE2 `extract_regex` over the Arrow string column captures the
sign, up to three numeric fields with their unit markers (d/°, ', "),
an optional radian marker and an optional NSEW suffix; the numeric
assembly is pure NumPy.  Covers the dmstor grammar used in proj test
data: "45d30'30.5\"N", "45°30′", "-45.5", "0.5r", "12d30W"."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DMS_RE = (
    r"^\s*(?P<sign>[+-]?)"
    r"(?P<f1>\d+(?:\.\d*)?)(?P<u1>[dD\x{00b0}'\"rR]?)"
    r"\s*(?:(?P<f2>\d+(?:\.\d*)?)(?P<u2>['\"]?))?"
    r"\s*(?:(?P<f3>\d+(?:\.\d*)?)(?P<u3>\"?))?"
    r"\s*(?P<hemi>[NSEWnsew]?)\s*$"
)


def dms_to_degrees(arr) -> np.ndarray:
    """Parse a string column of DMS/decimal coordinates to degrees.

    Unparseable rows yield NaN (the caller decides whether that is an
    error).  Radian values ('r' suffix) are converted to degrees."""
    if isinstance(arr, (list, tuple)):
        arr = pa.array(arr, type=pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    st = pc.extract_regex(pc.fill_null(arr, ""), _DMS_RE)
    n = len(arr)
    out = np.full(n, np.nan)
    valid = st.is_valid().to_numpy(zero_copy_only=False)
    if not valid.any():
        return out

    def field(name):
        return np.asarray(st.field(name).to_pylist(), dtype=object)

    f1 = field("f1")
    u1 = field("u1")
    f2 = field("f2")
    u2 = field("u2")
    f3 = field("f3")
    sign_s = field("sign")
    hemi = field("hemi")

    idx = np.flatnonzero(valid)
    v1 = np.array([float(f1[i]) for i in idx])
    unit1 = np.array([u1[i] or "" for i in idx])
    v2 = np.array([float(f2[i]) if f2[i] else 0.0 for i in idx])
    unit2 = np.array([u2[i] or "" for i in idx])
    v3 = np.array([float(f3[i]) if f3[i] else 0.0 for i in idx])
    h = np.char.upper(np.array([hemi[i] or " " for i in idx]))
    neg = np.array([sign_s[i] == "-" for i in idx])

    is_rad = (unit1 == "r") | (unit1 == "R")
    # unit of the FIRST field decides its weight: plain/d/° = degrees,
    # ' = minutes, " = seconds (dmstor positional rules)
    w1 = np.where(is_rad, 1.0,
                  np.where(unit1 == "'", 1 / 60.0,
                           np.where(unit1 == '"', 1 / 3600.0, 1.0)))
    w2 = np.where(unit2 == '"', 1 / 3600.0, 1 / 60.0)
    val = v1 * w1 + v2 * w2 + v3 / 3600.0
    val = np.where(is_rad, np.degrees(val), val)
    val = np.where(neg, -val, val)
    val = np.where((h == "S") | (h == "W"), -val, val)
    out[idx] = val
    return out


def parse_dms_batch(batch: pa.Table, lon_col: str = "lon_txt",
                    lat_col: str = "lat_txt") -> pa.Table:
    """map_batches body: DMS text columns -> numeric lon/lat degrees."""
    cols = dict(zip(batch.column_names, batch.columns))
    cols["lon"] = pa.array(dms_to_degrees(batch.column(lon_col)))
    cols["lat"] = pa.array(dms_to_degrees(batch.column(lat_col)))
    return pa.table(cols)
