"""Grid-based datum shifts: hgridshift / vgridshift / deformation-style
generic gridshift (reference src/transformations/{hgridshift,vgridshift,
gridshift}.cpp; bilinear interpolation and iterative inverse per
src/grids.cpp:3314-3497).

No external grid files exist in this environment (the reference's
NTv2/.gtx readers pull real datum grids), so grids are deterministic
synthetic displacement fields (FIXTURES.md F5) specified inline:

    +grids=synth:<seed>,<west_deg>,<south_deg>,<res_deg>,<nx>,<ny>

or loaded from a local .npz with arrays `meta` = [west, south, res, nx,
ny] (degrees) and `values` float32[ny, nx, 2] (arcseconds dlam, dphi)
for hgridshift / float32[ny, nx] (meters) for vgridshift.

Semantics: forward ADDS the interpolated shift (lam+dl, phi+dp for
hgridshift; z-dh for vgridshift, matching the orthometric-from-geometric
direction of fwd_prepare, reference src/fwd.cpp:104-107); the inverse is
the reference's fixed-point iteration (MAX_ITERATIONS=10, TOL=1e-12,
grids.cpp:3388-3389).  Points outside the grid pass through unchanged
(the reference's errno-on-miss/`omit` handling reduces to passthrough
for our synthetic full-coverage use).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import RADIANS, Operation, Params, ProjError, register

ARCSEC_TO_RAD = m.DEG_TO_RAD / 3600.0
MAX_ITER = 10
TOL = 1e-12


class ShiftGrid:
    """A lon/lat-regular displacement grid with bilinear sampling.

    Loaded once per worker (the stateful part of the actor-pool stage);
    mirrors the deferred-open semantics of hgridshift.cpp:55-58.
    """

    def __init__(self, west, south, res, values):
        self.west = float(west)   # radians
        self.south = float(south)
        self.res = float(res)
        self.values = np.asarray(values, dtype=np.float64)  # (ny, nx, k)
        self.ny, self.nx = self.values.shape[:2]

    @staticmethod
    def synth(seed: int, west_deg: float, south_deg: float, res_deg: float,
              nx: int, ny: int, vertical: bool = False) -> "ShiftGrid":
        """Deterministic smooth displacement field, <= 2 arcsec / 2 m."""
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        ph1 = (seed % 97) / 97.0 * 2 * np.pi
        ph2 = (seed % 89) / 89.0 * 2 * np.pi
        a = 2.0 * np.sin(2 * np.pi * ii / nx + ph1) \
            * np.cos(2 * np.pi * jj / ny + ph2)
        b = 2.0 * np.cos(2 * np.pi * ii / (nx * 0.5 + 1) + ph2) \
            * np.sin(2 * np.pi * jj / (ny * 0.7 + 1) + ph1)
        if vertical:
            values = a[:, :, None]
        else:
            values = np.stack([a, b], axis=-1)
        return ShiftGrid(west_deg * m.DEG_TO_RAD, south_deg * m.DEG_TO_RAD,
                         res_deg * m.DEG_TO_RAD, values)

    def contains(self, lam, phi):
        return ((lam >= self.west)
                & (lam <= self.west + self.res * (self.nx - 1))
                & (phi >= self.south)
                & (phi <= self.south + self.res * (self.ny - 1)))

    def sample(self, lam, phi):
        """Bilinear interpolation; returns (n, k) shifts (zeros outside)."""
        fx = (np.asarray(lam) - self.west) / self.res
        fy = (np.asarray(phi) - self.south) / self.res
        inside = self.contains(lam, phi)
        fx = np.clip(fx, 0, self.nx - 1)
        fy = np.clip(fy, 0, self.ny - 1)
        ix = np.clip(np.floor(fx).astype(np.int64), 0, self.nx - 2)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, self.ny - 2)
        tx = fx - ix
        ty = fy - iy
        v00 = self.values[iy, ix]
        v10 = self.values[iy, ix + 1]
        v01 = self.values[iy + 1, ix]
        v11 = self.values[iy + 1, ix + 1]
        out = (v00 * ((1 - tx) * (1 - ty))[..., None]
               + v10 * (tx * (1 - ty))[..., None]
               + v01 * ((1 - tx) * ty)[..., None]
               + v11 * (tx * ty)[..., None])
        out[~inside] = 0.0
        return out


def load_grid(spec: str, vertical: bool = False) -> ShiftGrid:
    if spec.startswith("synth:"):
        parts = spec[6:].split(",")
        if len(parts) != 6:
            raise ProjError("gridshift: synth spec needs 6 fields")
        seed, west, south, res, nx, ny = parts
        return ShiftGrid.synth(int(seed), float(west), float(south),
                               float(res), int(nx), int(ny),
                               vertical=vertical)
    if spec.endswith(".npz"):
        import os

        if not os.path.exists(spec):
            raise ProjError(f"gridshift: grid file not found: {spec}")
        data = np.load(spec)
        west, south, res = (float(v) * m.DEG_TO_RAD for v in data["meta"][:3])
        values = data["values"]
        if values.ndim == 2:
            values = values[:, :, None]
        return ShiftGrid(west, south, res, values)
    raise ProjError(f"unknown or unsupported grid format: {spec!r} "
                    "(NTv2/GTX readers are out of scope; use synth:/npz)")


class _GridShiftBase(Operation):
    vertical = False

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS
        spec = params.s("grids")
        if not spec:
            raise ProjError("gridshift: +grids parameter missing")
        if not (spec.startswith("synth:") or spec.endswith(".npz")):
            raise ProjError(
                f"unknown or unsupported grid format: {spec!r} "
                "(NTv2/GTX readers are out of scope; use synth:/npz)")
        # deferred load: the grid opens on first use in each worker
        # (mirrors defer_grid_opening, hgridshift.cpp:55-58)
        self._spec = spec
        self._grid = None
        self.mult = params.f("multiplier", 1.0)

    @property
    def grid(self) -> ShiftGrid:
        if self._grid is None:
            self._grid = load_grid(self._spec, vertical=self.vertical)
        return self._grid

    def _apply(self, lam, phi, z, direction: int):
        g = self.grid
        if self.vertical:
            dz = g.sample(lam, phi)[:, 0] * self.mult
            return lam, phi, z - direction * dz
        if direction > 0:
            s = g.sample(lam, phi) * (ARCSEC_TO_RAD * self.mult)
            return lam + s[:, 0], phi + s[:, 1], z
        # inverse: fixed point x_{k+1} = target - shift(x_k)
        lam_t = lam
        phi_t = phi
        lam_c = lam.copy()
        phi_c = phi.copy()
        for _ in range(MAX_ITER):
            s = g.sample(lam_c, phi_c) * (ARCSEC_TO_RAD * self.mult)
            lam_n = lam_t - s[:, 0]
            phi_n = phi_t - s[:, 1]
            done = (np.abs(lam_n - lam_c) < TOL) \
                & (np.abs(phi_n - phi_c) < TOL)
            lam_c = lam_n
            phi_c = phi_n
            if np.all(done):
                break
        return lam_c, phi_c, z


@register
class HGridShift(_GridShiftBase):
    name = "hgridshift"
    vertical = False

    def _fwd(self, c: Coords) -> None:
        c.x, c.y, c.z = self._apply(c.x, c.y, c.z, +1)

    def _inv(self, c: Coords) -> None:
        c.x, c.y, c.z = self._apply(c.x, c.y, c.z, -1)


@register
class VGridShift(_GridShiftBase):
    name = "vgridshift"
    vertical = True

    def _fwd(self, c: Coords) -> None:
        c.x, c.y, c.z = self._apply(c.x, c.y, c.z, +1)

    def _inv(self, c: Coords) -> None:
        c.x, c.y, c.z = self._apply(c.x, c.y, c.z, -1)


@register
class GridShift(_GridShiftBase):
    """Generic multi-channel grid shift (reference gridshift.cpp):
    lam/lat/z shifts simultaneously from a 3-channel grid."""

    name = "gridshift"

    def setup(self, params: Params) -> None:
        super().setup(params)

    def _fwd(self, c: Coords) -> None:
        g = self.grid
        s = g.sample(c.x, c.y)
        k = s.shape[-1]
        if k >= 2:
            c.x = c.x + s[:, 0] * ARCSEC_TO_RAD
            c.y = c.y + s[:, 1] * ARCSEC_TO_RAD
        if k >= 3:
            c.z = c.z - s[:, 2]

    def _inv(self, c: Coords) -> None:
        g = self.grid
        lam_t, phi_t = c.x, c.y
        lam_c = lam_t.copy()
        phi_c = phi_t.copy()
        for _ in range(MAX_ITER):
            s = g.sample(lam_c, phi_c)
            lam_n = lam_t - s[:, 0] * ARCSEC_TO_RAD
            phi_n = phi_t - s[:, 1] * ARCSEC_TO_RAD
            done = (np.abs(lam_n - lam_c) < TOL) \
                & (np.abs(phi_n - phi_c) < TOL)
            lam_c = lam_n
            phi_c = phi_n
            if np.all(done):
                break
        s = g.sample(lam_c, phi_c)
        c.x = lam_c
        c.y = phi_c
        if s.shape[-1] >= 3:
            c.z = c.z + s[:, 2]
