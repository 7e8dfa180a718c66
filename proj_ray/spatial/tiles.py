"""Web-Mercator (slippy) tile assignment.

Closed-form spherical Web Mercator (the same formulas as the webmerc
kernel, reference src/projections/merc.cpp:24-29,76-84) mapped to tile
indices at a zoom level.  Tie-break rule (FIXTURES.md F6): points exactly
on a tile edge assign to the tile with the greater index — which is what
floor() gives; indices clamp to [0, 2^z - 1].

SQL mirror in sql_tile_exprs() — the oracle computes identical integers
because the formula uses the same operation order.
"""

from __future__ import annotations

import numpy as np

WEBMERC_MAX_LAT = 85.05112877980659


def tile_xy(lon, lat, zoom: int):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.float64(1 << zoom)
    tx = np.floor((lon + 180.0) / 360.0 * n)
    lat_c = np.clip(lat, -WEBMERC_MAX_LAT, WEBMERC_MAX_LAT)
    latr = np.radians(lat_c)
    ty = np.floor((1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) / np.pi)
                  / 2.0 * n)
    tx = np.clip(tx, 0, n - 1).astype(np.int64)
    ty = np.clip(ty, 0, n - 1).astype(np.int64)
    return tx, ty


def tile_id(lon, lat, zoom: int):
    tx, ty = tile_xy(lon, lat, zoom)
    return (np.int64(zoom) << np.int64(58)) | (ty << np.int64(29)) | tx


def sql_tile_exprs(lon_expr: str, lat_expr: str, zoom: int):
    """(tile_x_sql, tile_y_sql) mirroring tile_xy bit-for-bit."""
    n = float(1 << zoom)
    nm1 = (1 << zoom) - 1
    tx = (f"CAST(LEAST(GREATEST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}),"
          f" 0), {nm1}) AS BIGINT)")
    latc = (f"LEAST(GREATEST({lat_expr}, {-WEBMERC_MAX_LAT!r}), "
            f"{WEBMERC_MAX_LAT!r})")
    latr = f"radians({latc})"
    ty = (f"CAST(LEAST(GREATEST(FLOOR((1.0 - ln(tan({latr}) + "
          f"1.0/cos({latr})) / pi()) / 2.0 * {n}), 0), {nm1}) AS BIGINT)")
    return tx, ty
