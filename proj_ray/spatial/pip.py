"""Point-in-polygon machinery + deterministic polygon/rect fixtures.

Polygons (FIXTURES.md F4): convex rings around seeded centers, 10%
continent-scale to force multi-cell replication.  The membership test is
a vectorized crossing-number test over (n_points, n_vertices) tiles —
the engine's generalization of the reference's point-in-triangle lookup
(src/transformations/tinshift_impl.hpp, src/quadtree.hpp:85-247), with
the cell-bucket index replacing the quadtree.

Rectangles (`make_rects` / `sql_rects_cte`) are the SQL-expressible
variant used for the DuckDB-oracle spatial-join queries.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from proj_ray.spatial.cells import grid_cell, grid_dims

M31 = 2147483647
A_LCG = 48271


def _lcg_stream(seed: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    x = (seed % M31) or 1
    for i in range(n):
        x = (A_LCG * x) % M31
        out[i] = x
    return out


def make_polygons(n_poly: int = 64, seed: int = 1234):
    """Deterministic convex polygons.

    Returns dict: polygon_id (list[str]), rings (list of (k,2) float64
    lon/lat arrays, closed CCW).
    """
    ids = []
    rings = []
    for p in range(n_poly):
        s = _lcg_stream(seed + 17 * p + 1, 8)
        nv = 5 + int(s[0] % 8)  # 5..12 vertices
        clon = (s[1] % 3400000) / 10000.0 - 170.0
        clat = (s[2] % 1500000) / 10000.0 - 75.0
        big = (s[3] % 10) == 0  # 10% continent-scale
        radius = (20.0 + (s[4] % 200000) / 10000.0) if big else \
            (0.05 + (s[4] % 49500) / 10000.0)
        phase = (s[5] % 62832) / 10000.0
        angles = phase + np.linspace(0, 2 * np.pi, nv, endpoint=False)
        rr = radius * (0.6 + 0.4 * ((s[6] % 1000) / 1000.0))
        lon = clon + rr * np.cos(angles)
        lat = np.clip(clat + rr * 0.7 * np.sin(angles), -89.9, 89.9)
        ring = np.column_stack([lon, lat])
        ids.append(f"poly-{p:06d}")
        rings.append(ring)
    return {"polygon_id": ids, "rings": rings}


def points_in_polygon(lon, lat, ring: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number test; boundary points count as inside
    on the lower/left edges (half-open rule, deterministic)."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    vx = ring[:, 0]
    vy = ring[:, 1]
    n = len(ring)
    inside = np.zeros(x.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi = vx[i], vy[i]
        xj, yj = vx[j], vy[j]
        cond = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside ^= cond
        j = i
    return inside


def polygon_covering_cells(ring: np.ndarray, res_deg: float) -> np.ndarray:
    """Grid cells overlapped by the ring's bbox (cheap, conservative)."""
    nx, ny = grid_dims(res_deg)
    lo_x = int(np.floor((ring[:, 0].min() + 180.0) / res_deg))
    hi_x = int(np.floor((ring[:, 0].max() + 180.0) / res_deg))
    lo_y = int(np.floor((ring[:, 1].min() + 90.0) / res_deg))
    hi_y = int(np.floor((ring[:, 1].max() + 90.0) / res_deg))
    lo_y = max(lo_y, 0)
    hi_y = min(hi_y, ny - 1)
    xs = np.arange(lo_x, hi_x + 1) % nx
    ys = np.arange(lo_y, hi_y + 1)
    gx, gy = np.meshgrid(xs, ys)
    return (gy.ravel() * nx + gx.ravel()).astype(np.int64)


class PolygonIndex:
    """Cell-bucketed polygon index: build once on the driver, broadcast
    via ray.put, probe vectorized inside map_batches workers."""

    def __init__(self, polygons: Dict, res_deg: float = 5.0):
        self.res_deg = res_deg
        self.polygon_id = list(polygons["polygon_id"])
        self.rings = [np.asarray(r, dtype=np.float64)
                      for r in polygons["rings"]]
        self.buckets: Dict[int, List[int]] = {}
        for pi, ring in enumerate(self.rings):
            for cell in polygon_covering_cells(ring, res_deg):
                self.buckets.setdefault(int(cell), []).append(pi)

    def query_batch(self, lon, lat):
        """Return (point_idx, poly_idx) match pairs for a coordinate batch."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        cells = grid_cell(lon, lat, self.res_deg)
        out_pts = []
        out_polys = []
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        groups = np.split(order, bounds)
        for grp in groups:
            if len(grp) == 0:
                continue
            cell = int(cells[grp[0]])
            cand = self.buckets.get(cell)
            if not cand:
                continue
            glon = lon[grp]
            glat = lat[grp]
            for pi in cand:
                hit = points_in_polygon(glon, glat, self.rings[pi])
                if hit.any():
                    sel = grp[hit]
                    out_pts.append(sel)
                    out_polys.append(np.full(len(sel), pi, dtype=np.int64))
        if not out_pts:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(out_pts), np.concatenate(out_polys)


# ---------------------------------------------------------------------------
# Rectangles: the SQL-checkable spatial-join side
# ---------------------------------------------------------------------------


def make_rects(n_rects: int = 64, seed: int = 7777):
    """Deterministic rectangles, exactly reproducible in SQL
    (sql_rects_cte).  Returns arrays rect_id, lon_min, lon_max, lat_min,
    lat_max."""
    r = np.arange(n_rects, dtype=np.int64)
    s1 = (A_LCG * ((seed + r * 4 + 1) % M31)) % M31
    s2 = (A_LCG * s1) % M31
    s3 = (A_LCG * s2) % M31
    s4 = (A_LCG * s3) % M31
    lon_min = (s1 % 3200000) / 10000.0 - 180.0
    lon_max = lon_min + 2.0 + (s2 % 200000) / 10000.0
    lat_min = (s3 % 1400000) / 10000.0 - 85.0
    lat_max = lat_min + 2.0 + (s4 % 150000) / 10000.0
    return {
        "rect_id": r,
        "lon_min": lon_min,
        "lon_max": lon_max,
        "lat_min": lat_min,
        "lat_max": lat_max,
    }


def sql_rects_cte(n_rects: int = 64, seed: int = 7777) -> str:
    """DuckDB CTE `rects` mirroring make_rects bit-for-bit."""
    return f"""
rr AS (
    SELECT r, (48271 * (({seed} + r * 4 + 1) % 2147483647)) % 2147483647 AS s1
    FROM (SELECT UNNEST(range(0, {n_rects})) AS r)
),
rr2 AS (SELECT *, (48271 * s1) % 2147483647 AS s2 FROM rr),
rr3 AS (SELECT *, (48271 * s2) % 2147483647 AS s3 FROM rr2),
rr4 AS (SELECT *, (48271 * s3) % 2147483647 AS s4 FROM rr3),
rects AS (
    SELECT r AS rect_id,
           (s1 % 3200000) / 10000.0 - 180.0 AS lon_min,
           (s1 % 3200000) / 10000.0 - 180.0 + 2.0 + (s2 % 200000) / 10000.0
               AS lon_max,
           (s3 % 1400000) / 10000.0 - 85.0 AS lat_min,
           (s3 % 1400000) / 10000.0 - 85.0 + 2.0 + (s4 % 150000) / 10000.0
               AS lat_max
    FROM rr4
)"""
