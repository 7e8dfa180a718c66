"""Kinematic datum shift by a deformation/velocity model —
reference src/transformations/deformation.cpp:

    X_out = X_in + dt * DX  (cartesian in, cartesian out)

Velocities are looked up in ENU space (mm/yr) at the geodetic position
of the input and rotated to cartesian.  The historical two-grid form
(+xy_grids=<CTable2> +z_grids=<GTX>) is supported; the GeoTIFF
three-channel form is not available in this environment.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import (CARTESIAN, Operation, Params, ProjError,
                               register)
from proj_ray.ops.gridshift import (read_ctable2, read_gtx,
                                    resolve_grid_path)

TOL = 1e-8
MAX_ITER = 10


def _is_ctable2(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(11) == b"CTABLE V2.0"
    except OSError:
        return False


@register
class Deformation(Operation):
    name = "deformation"

    def setup(self, params: Params) -> None:
        self.left = CARTESIAN
        self.right = CARTESIAN
        has_xy = params.has("xy_grids")
        has_z = params.has("z_grids")
        has_g = params.has("grids")
        if not has_g and not (has_xy and has_z):
            raise ProjError("deformation: either +grids or (+xy_grids and "
                            "+z_grids) should be specified")
        if has_g:
            raise ProjError("unknown or unsupported grid format: "
                            "GeoTIFF deformation models are out of scope")
        xy_path = resolve_grid_path(params.s("xy_grids"))
        z_path = resolve_grid_path(params.s("z_grids"))
        # Format is detected by content, not filename: CTable2 carries a
        # "CTABLE V2.0" magic in its 160-byte header (grids.cpp
        # CTable2Grid::open); GTX has no magic, so any resolvable file is
        # attempted (grids.cpp GTXVerticalShiftGrid::open).
        if xy_path is None or not _is_ctable2(xy_path):
            raise ProjError("deformation: could not find requested "
                            "xy_grid(s)")
        if z_path is None:
            raise ProjError("deformation: could not find requested z_grid(s)")
        self.hgrid = read_ctable2(xy_path)
        self.vgrid = read_gtx(z_path)
        self.dt = params.f("dt") if params.has("dt") else None
        if params.has("t_obs"):
            raise ProjError("deformation: +t_obs is deprecated; use +dt")
        self.t_epoch = params.f("t_epoch") if params.has("t_epoch") else None
        if self.dt is None and self.t_epoch is None:
            raise ProjError("deformation: either +dt or +t_epoch needs "
                            "to be set")
        if self.dt is not None and self.t_epoch is not None:
            raise ProjError("deformation: +dt or +t_epoch are mutually "
                            "exclusive")

    def _dt(self, c: Coords):
        if self.dt is not None:
            return self.dt
        return c.t - self.t_epoch

    def _grid_shift(self, x, y, z):
        """Cartesian velocity shift (m/yr) at cartesian position
        (deformation.cpp pj_deformation_get_grid_shift)."""
        from proj_ray.ops.cart import cart_inv_core

        c = Coords(x.copy(), y.copy(), z.copy())
        cart_inv_core(self, c)  # XYZ -> lam/phi/h on self.ell
        lam, phi = c.x, c.y
        henu, ok_h = self.hgrid.interp(lam, phi)
        vu, ok_v = self.vgrid.interp(lam, phi)
        ok = ok_h & ok_v
        ve = henu[:, 0] / 1000.0  # mm/yr -> m/yr
        vn = henu[:, 1] / 1000.0
        vup = vu[:, 0] / 1000.0
        sp, cp = np.sin(phi), np.cos(phi)
        sl, cl = np.sin(lam), np.cos(lam)
        dx = -sp * cl * vn - sl * ve + cp * cl * vup
        dy = -sp * sl * vn + cl * ve + cp * sl * vup
        dz = cp * vn + sp * vup
        return dx, dy, dz, ok

    def _fwd(self, c: Coords) -> None:
        dt = self._dt(c)
        dx, dy, dz, ok = self._grid_shift(c.x, c.y, c.z)
        bad = ~ok
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, c.x + dt * dx)
        c.y = np.where(bad, np.nan, c.y + dt * dy)
        c.z = np.where(bad, np.nan, c.z + dt * dz)

    def _inv(self, c: Coords) -> None:
        # iterative reverse (deformation.cpp pj_deformation_reverse_shift)
        dt = self._dt(c)
        X, Y, Z = c.x, c.y, c.z
        dx, dy, dz, ok = self._grid_shift(X, Y, Z)
        z0 = dz.copy()
        ox = X - dt * dx
        oy = Y - dt * dy
        oz = Z + dt * dz
        bad = ~ok
        with np.errstate(all="ignore"):
            for _ in range(MAX_ITER):
                dx, dy, dz, ok_i = self._grid_shift(ox, oy, oz)
                bad = bad | ~ok_i
                difx = ox + dt * dx - X
                dify = oy + dt * dy - Y
                difz = oz - dt * dz - Z
                ox = np.where(bad, ox, ox + difx)
                oy = np.where(bad, oy, oy + dify)
                oz = np.where(bad, oz, oz + difz)
                if np.all(bad | (np.hypot(difx, dify) <= TOL)):
                    break
        oz = Z - dt * z0
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, ox)
        c.y = np.where(bad, np.nan, oy)
        c.z = np.where(bad, np.nan, oz)
