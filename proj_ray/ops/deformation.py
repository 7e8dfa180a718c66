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


def _load_velocity_grids(spec: str):
    """GTG 3-channel velocity grids (east/north/up, mm/yr) as ShiftGrids
    with channels reordered to (E, N, U) — deformation.cpp
    pj_deformation_get_grid_values channel/unit handling."""
    from proj_ray.ops.geotiff import TiffError, read_geotiff
    from proj_ray.ops.gridshift import ShiftGrid, sniff_grid_format

    grids = []
    for part in spec.split(","):
        part = part.strip().lstrip("@")
        if not part:
            continue
        path = resolve_grid_path(part)
        if path is None or sniff_grid_format(path) != "gtiff":
            raise ProjError("deformation: could not find requested grid(s)")
        try:
            gl = read_geotiff(path)
        except TiffError as exc:
            raise ProjError("deformation: could not open grid "
                            f"{part!r} ({exc})") from exc
        for g in gl:
            if g.spp < 3:
                raise ProjError("deformation: grid has not enough samples")
            i_e, i_n, i_u = 0, 1, 2
            for i in range(g.spp):
                d = g.description(i)
                if d == "east_velocity":
                    i_e = i
                elif d == "north_velocity":
                    i_n = i
                elif d == "up_velocity":
                    i_u = i
            unit = g.unit(i_e)
            if unit and unit != "millimetres per year":
                raise ProjError("deformation: only unit=millimetres per "
                                "year handled")
            vals = g.values[:, :, [i_e, i_n, i_u]]
            grids.append(ShiftGrid(g.west, g.south, g.res_x, g.res_y,
                                   vals, nodata=np.nan))
    if not grids:
        raise ProjError("deformation: could not find requested grid(s)")
    return grids


def _sample_velocity(grids, lam, phi):
    """(ve, vn, vu in mm/yr, found) from the first covering grid."""
    n = len(lam)
    out = np.zeros((n, 3))
    found = np.zeros(n, dtype=bool)
    for g in grids:
        vals, valid = g.interp(lam, phi)
        take = valid & ~found
        if np.any(take):
            out[take] = vals[take]
        found |= valid
        if found.all():
            break
    return out[:, 0], out[:, 1], out[:, 2], found


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
        self.tiff_grids = None
        self.hgrid = self.vgrid = None
        if has_g:
            # 3-channel GTG velocity model (east/north/up, mm/yr) —
            # deformation.cpp pj_deformation_get_grid_values
            self.tiff_grids = _load_velocity_grids(params.s("grids"))
        else:
            xy_path = resolve_grid_path(params.s("xy_grids"))
            z_path = resolve_grid_path(params.s("z_grids"))
            # Format is detected by content, not filename: CTable2
            # carries a "CTABLE V2.0" magic in its 160-byte header
            # (grids.cpp CTable2Grid::open); GTX has no magic, so any
            # resolvable file is attempted.
            if xy_path is None or not _is_ctable2(xy_path):
                raise ProjError("deformation: could not find requested "
                                "xy_grid(s)")
            if z_path is None:
                raise ProjError("deformation: could not find requested "
                                "z_grid(s)")
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
        if self.tiff_grids is not None:
            ve, vn, vup, ok = _sample_velocity(self.tiff_grids, lam, phi)
            ve, vn, vup = ve / 1000.0, vn / 1000.0, vup / 1000.0
        else:
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
