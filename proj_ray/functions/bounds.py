"""Bounding-box transformation — port of proj_trans_bounds
(reference src/4D_api.cpp:1480-1690) with its antimeridian and pole
handling (antimeridian_min/max, 4D_api.cpp:1267-1356;
contains_north/south_pole, :1362-1400).

The densified box edge ring is one vectorized transform_arrays call —
this is the tile-pruning primitive for the spatial pipelines
(SURVEY.md §2.0)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from proj_ray.ops.base import RADIANS, ProjError
from proj_ray.pipeline import create_operation, transform_arrays


def _find_prev(valid_idx_sorted, i, n):
    return (i - 1) % n


def _antimeridian_min(data: np.ndarray) -> float:
    n = len(data)
    positive_min = np.inf
    min_value = np.inf
    crossed = 0
    positive_meridian = False
    for i in range(n):
        if not np.isfinite(data[i]):
            continue
        prev = data[(i - 1) % n]
        if not np.isfinite(prev):
            # scan back to the previous finite entry (find_previous_index)
            j = (i - 2) % n
            while not np.isfinite(data[j]) and j != i:
                j = (j - 1) % n
            prev = data[j]
        delta = prev - data[i]
        if np.isfinite(delta) and delta >= 200:
            if crossed == 0:
                positive_min = min_value
            crossed += 1
            positive_meridian = False
        elif np.isfinite(delta) and delta <= -200:
            if crossed == 0:
                positive_min = data[i]
            crossed += 1
            positive_meridian = True
        if positive_meridian and data[i] < positive_min:
            positive_min = data[i]
        if data[i] < min_value:
            min_value = data[i]
    if crossed == 2:
        return positive_min
    if crossed == 4:
        return -180.0
    return min_value


def _antimeridian_max(data: np.ndarray) -> float:
    n = len(data)
    negative_max = -np.inf
    max_value = -np.inf
    crossed = 0
    negative_meridian = False
    for i in range(n):
        if not np.isfinite(data[i]):
            continue
        prev = data[(i - 1) % n]
        if not np.isfinite(prev):
            j = (i - 2) % n
            while not np.isfinite(data[j]) and j != i:
                j = (j - 1) % n
            prev = data[j]
        delta = prev - data[i]
        if np.isfinite(delta) and delta >= 200:
            if crossed == 0:
                negative_max = data[i]
            crossed += 1
            negative_meridian = True
        elif np.isfinite(delta) and delta <= -200:
            if crossed == 0:
                negative_max = max_value
            crossed += 1
            negative_meridian = False
        if negative_meridian and data[i] > negative_max:
            negative_max = data[i]
        if data[i] > max_value:
            max_value = data[i]
    if crossed == 2:
        return negative_max
    if crossed == 4:
        return 180.0
    return max_value


def trans_bounds(defn_or_pipeline, xmin: float, ymin: float, xmax: float,
                 ymax: float, densify_pts: int = 21,
                 direction: str = "forward") -> Tuple[float, float,
                                                      float, float]:
    """Transform a bounding box by densifying its edges (one linear
    ring), with antimeridian wrap detection on geographic outputs and
    whole-hemisphere expansion when a pole is inside the box."""
    p = create_operation(defn_or_pipeline) \
        if isinstance(defn_or_pipeline, str) else defn_or_pipeline
    if densify_pts < 0 or densify_pts > 10000:
        raise ProjError("trans_bounds: densify_pts must be in 0..10000")
    fwd = direction in ("forward", "fwd", "+")
    in_units = p.left if fwd else p.right
    out_units = p.right if fwd else p.left
    degree_input = in_units == RADIANS
    degree_output = out_units == RADIANS
    if degree_output and densify_pts < 2:
        raise ProjError("trans_bounds: densify_pts must be >= 2 for "
                        "geographic output")

    side = densify_pts + 1
    if degree_input and xmax < xmin:
        dx = (xmax - xmin + 360.0) / side   # antimeridian-spanning input
    else:
        dx = (xmax - xmin) / side
    if degree_input and ymax < ymin:
        raise ProjError("trans_bounds: latitude max < latitude min")
    dy = (ymax - ymin) / side

    i = np.arange(side, dtype=np.float64)
    # linear ring: xmin edge, ymin edge, xmax edge, ymax edge
    bx = np.concatenate([np.full(side, xmin), xmin + i * dx,
                         np.full(side, xmax), xmax - i * dx])
    by = np.concatenate([ymax - i * dy, np.full(side, ymin),
                         ymin + i * dy, np.full(side, ymax)])

    north_in = south_in = False
    if degree_output:
        # inverse-project the poles into the source frame
        for pole_lat, flag in ((90.0, "n"), (-90.0, "s")):
            c = transform_arrays(p, np.array([0.0]), np.array([pole_lat]),
                                 direction="inverse" if fwd else "forward")
            px, py = c.x[0], c.y[0]
            if np.isfinite(px) and xmin < px < xmax and ymin < py < ymax:
                if flag == "n":
                    north_in = True
                else:
                    south_in = True

    c = transform_arrays(p, bx, by,
                         direction="forward" if fwd else "inverse")
    ox = np.where(c.err == 0, c.x, np.nan)
    oy = np.where(c.err == 0, c.y, np.nan)
    with np.errstate(all="ignore"):
        if not degree_output:
            return (np.nanmin(ox), np.nanmin(oy),
                    np.nanmax(ox), np.nanmax(oy))
        if north_in:
            return (-180.0, float(np.nanmin(oy)), 180.0, 90.0)
        if south_in:
            return (-180.0, -90.0, 180.0, float(np.nanmax(oy)))
        return (float(_antimeridian_min(ox)), float(np.nanmin(oy)),
                float(_antimeridian_max(ox)), float(np.nanmax(oy)))
