"""Per-point alternative-operation selection — the vectorized analogue
of PROJ's candidate ladder (reference src/4D_api.cpp:217-345
pj_get_suggested_operation and :420-533 proj_trans retry loop).

A CRS-to-CRS transformation is a LIST of candidate operations, each
with an area of use, accuracy and priority flags.  Every point picks
the best candidate whose bbox contains it (best accuracy, then smallest
area, onshore preferred); points whose chosen operation fails (e.g.
outside the actual grid cells inside the bbox, like a point in the US
falling inside the Canadian ntv2 bbox) retry with the next candidate up
to twice; points matching no area fall back to the first candidate that
needs no grids; anything else errors with no-operation.

The whole ladder is a batch kernel: selection is vectorized bbox masks,
execution groups points per selected candidate, so a Ray Data
map_batches stage runs the ladder once per batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import RADIANS, ProjError
from proj_ray.pipeline import create_operation

ERR_NO_OPERATION = 2052  # PROJ_ERR_COORD_TRANSFM_NO_OPERATION

_GRID_PARAMS = ("grids=", "nadgrids=", "geoidgrids=", "xy_grids=",
                "z_grids=", "model=")


class Candidate:
    """One alternative operation (PJCoordOperation analogue)."""

    def __init__(self, defn: str,
                 bbox_src: Optional[Sequence[float]] = None,
                 bbox_dst: Optional[Sequence[float]] = None,
                 accuracy: float = -1.0,
                 offshore: bool = False,
                 priority: bool = False,
                 unknown_area: bool = False,
                 name: str = ""):
        self.defn = defn
        self.name = name or defn[:40]
        self.bbox_src = tuple(bbox_src or (-180.0, -90.0, 180.0, 90.0))
        self.bbox_dst = tuple(bbox_dst or self.bbox_src)
        self.accuracy = float(accuracy)
        self.offshore = bool(offshore)
        self.priority = bool(priority)
        self.unknown_area = bool(unknown_area)
        sx = self.bbox_src
        # antimeridian-crossing area of use (west > east, e.g. Fiji/NZ):
        # width wraps by +360 (4D_api.cpp:1714-1716: `if (w > e) e += 2*PI`)
        width = sx[2] - sx[0]
        if width < 0:
            width += 360.0
        self.pseudo_area = width * (sx[3] - sx[1])
        self.needs_grids = any(p in defn for p in _GRID_PARAMS)
        self._pipeline = None

    @property
    def pipeline(self):
        if self._pipeline is None:
            self._pipeline = create_operation(self.defn)
        return self._pipeline


def _normalize_lon(x: np.ndarray) -> np.ndarray:
    return np.mod(x + 180.0, 360.0) - 180.0


class AltOperation:
    """Pipeline-compatible object running the candidate ladder
    per point.  Input/output unit conventions come from the first
    candidate (all candidates must share CRS endpoints)."""

    def __init__(self, candidates: List[Candidate]):
        if not candidates:
            raise ProjError("opselect: empty candidate list")
        self.candidates = candidates
        p0 = candidates[0].pipeline
        self.left = p0.left
        self.right = p0.right

    # -- selection (pj_get_suggested_operation) -------------------------

    def _select(self, x, y, excluded, inverse: bool) -> np.ndarray:
        n = len(x)
        best = np.full(n, -1, dtype=np.int64)
        best_acc = np.full(n, np.inf)
        best_area = np.full(n, np.inf)
        best_unknown = np.zeros(n, dtype=bool)
        best_priority = np.zeros(n, dtype=bool)
        angular = (self.right if inverse else self.left) == RADIANS
        xn = _normalize_lon(x) if angular else x
        for i, alt in enumerate(self.candidates):
            bbox = alt.bbox_dst if inverse else alt.bbox_src
            if bbox[0] > bbox[2]:
                # antimeridian-crossing area of use: inside = west OR east
                # of the wrap (cf. 4D_api.cpp bbox registration, w>e case)
                def _lon_in(v):
                    return (v >= bbox[0]) | (v <= bbox[2])
            else:
                def _lon_in(v):
                    return (v >= bbox[0]) & (v <= bbox[2])
            inside = (y >= bbox[1]) & (y <= bbox[3]) \
                & (_lon_in(x) | (angular & _lon_in(xn)))
            ok = inside & (excluded[:, 0] != i) & (excluded[:, 1] != i)
            first = ok & (best < 0)
            better_acc = ok & (alt.accuracy >= 0) & (alt.accuracy < best_acc)
            smaller = ok & (alt.accuracy == best_acc) \
                & (alt.pseudo_area < best_area) \
                & ~(alt.unknown_area & ~best_unknown) \
                & ~best_priority
            replace = first | ((better_acc | smaller) & ~alt.offshore)
            best = np.where(replace, i, best)
            acc_val = alt.accuracy if alt.accuracy >= 0 else np.inf
            best_acc = np.where(replace, acc_val, best_acc)
            best_area = np.where(replace, alt.pseudo_area, best_area)
            best_unknown = np.where(replace, alt.unknown_area, best_unknown)
            best_priority = np.where(replace, alt.priority, best_priority)
        return best

    # -- execution ladder (proj_trans retry loop) ------------------------

    def _run(self, c: Coords, inverse: bool) -> Coords:
        n = len(c.x)
        angular_in = (self.right if inverse else self.left) == RADIANS
        x_sel = np.degrees(c.x) if angular_in else c.x
        y_sel = np.degrees(c.y) if angular_in else c.y
        out = Coords(np.full(n, np.nan), np.full(n, np.nan),
                     np.full(n, np.nan), c.t.copy())
        out.err = np.full(n, ERR_NO_OPERATION, dtype=c.err.dtype)
        done = np.zeros(n, dtype=bool)
        excluded = np.full((n, 2), -1, dtype=np.int64)

        for retry in range(3):
            todo = ~done
            if not np.any(todo):
                break
            sel = np.full(n, -1, dtype=np.int64)
            sel[todo] = self._select(x_sel[todo], y_sel[todo],
                                     excluded[todo], inverse)
            for ci in np.unique(sel[todo]):
                if ci < 0:
                    continue
                mask = todo & (sel == ci)
                sub = Coords(c.x[mask].copy(), c.y[mask].copy(),
                             c.z[mask].copy(), c.t[mask].copy())
                p = self.candidates[ci].pipeline
                sub = p.inv(sub) if inverse else p.fwd(sub)
                ok = (sub.err == 0) & np.isfinite(sub.x)
                idx = np.flatnonzero(mask)
                good = idx[ok]
                out.x[good] = sub.x[ok]
                out.y[good] = sub.y[ok]
                out.z[good] = sub.z[ok]
                out.t[good] = sub.t[ok]
                out.err[good] = 0
                done[good] = True
                if retry < 2:
                    excluded[idx[~ok], retry] = ci

        # fallback: first gridless candidate (4D_api.cpp:495-529)
        rest = ~done
        if np.any(rest):
            for alt in self.candidates:
                if alt.needs_grids:
                    continue
                sub = Coords(c.x[rest].copy(), c.y[rest].copy(),
                             c.z[rest].copy(), c.t[rest].copy())
                p = alt.pipeline
                sub = p.inv(sub) if inverse else p.fwd(sub)
                idx = np.flatnonzero(rest)
                out.x[idx] = sub.x
                out.y[idx] = sub.y
                out.z[idx] = sub.z
                out.t[idx] = sub.t
                out.err[idx] = sub.err
                done[idx] = True
                break
        return out

    def fwd(self, c: Coords) -> Coords:
        return self._run(c, False)

    def inv(self, c: Coords) -> Coords:
        return self._run(c, True)


def create_crs_pipeline(candidates: Sequence[Dict]) -> AltOperation:
    """Build an AltOperation from candidate dicts:
    {defn, bbox_src?, bbox_dst?, accuracy?, offshore?, priority?,
    unknown_area?, name?} — the engine-facing analogue of
    proj_create_crs_to_crs's alternative-operation list."""
    return AltOperation([Candidate(**c) for c in candidates])
