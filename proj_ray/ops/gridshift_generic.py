"""Generic grid shift (+proj=gridshift) over Geodetic TIFF Grids —
vectorized port of reference src/transformations/gridshift.cpp.

Grid TYPE metadata drives semantics (checkGridTypes, gridshift.cpp:125):
HORIZONTAL_OFFSET / GEOGRAPHIC_3D_OFFSET / ELLIPSOIDAL_HEIGHT_OFFSET /
VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL / VERTICAL_OFFSET_VERTICAL_TO_
VERTICAL.  Bilinear or biquadratic (NOAA qterp) interpolation, chosen
per +interpolation= or the grid's interpolation_method metadata;
channel roles from per-sample DESCRIPTION metadata with the reference's
defaults; lat/lon offsets are arc-seconds, easting/northing metres;
antimeridian inputs wrap into the grid extent; inverse is fixed-point
for bilinear and single-step for biquadratic (NCAT behavior,
gridshift.cpp:655-664); a second pass applies a separate vertical grid
when horizontal and vertical corrections live in different grids."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from proj_ray.core.coords import (Coords, ERR_NO_CONVERGENCE,
                                  ERR_OUTSIDE_DOMAIN)
from proj_ray.ops.base import (CARTESIAN, RADIANS, Operation, Params,
                               ProjError, register)
from proj_ray.ops.geotiff import GTiffGrid, TiffError, read_geotiff

ARCSEC_TO_RAD = np.pi / 180.0 / 3600.0
REL_TOL = 1e-5
MAX_ITER = 10
TOL = 1e-12

_KNOWN_TYPES = {
    "HORIZONTAL_OFFSET", "GEOGRAPHIC_3D_OFFSET",
    "ELLIPSOIDAL_HEIGHT_OFFSET", "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL",
    "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL",
}
_Z_DESCS = ("ellipsoidal_height_offset", "geoid_undulation",
            "hydroid_height", "vertical_offset")


def _gtype(g) -> str:
    """A grid's TYPE, inherited from its enclosing parent for subgrid
    IFDs that omit it (hierarchy semantics of insertIntoHierarchy)."""
    return g.item("TYPE") or getattr(g, "inherited_type", "")


class _GridChans:
    """Resolved channel roles + interpolation for one grid and one TYPE
    (gridshift.cpp GridInfo)."""

    def __init__(self, grid: GTiffGrid, type_: str, forced_interp: str,
                 skip_z: bool):
        idx_x = idx_y = idx_z = -1
        easting_northing = False
        proj = not grid.geographic
        for i in range(grid.spp):
            desc = grid.description(i)
            unit = grid.unit(i)
            if not proj and desc == "latitude_offset":
                idx_y = i
                if unit and unit != "arc-second":
                    raise ProjError("gridshift: only unit=arc-second handled")
            elif not proj and desc == "longitude_offset":
                idx_x = i
                if unit and unit != "arc-second":
                    raise ProjError("gridshift: only unit=arc-second handled")
            elif proj and desc == "easting_offset":
                easting_northing = True
                idx_x = i
                if unit and unit != "metre":
                    raise ProjError("gridshift: only unit=metre handled")
            elif proj and desc == "northing_offset":
                easting_northing = True
                idx_y = i
                if unit and unit != "metre":
                    raise ProjError("gridshift: only unit=metre handled")
            elif desc in _Z_DESCS:
                idx_z = i
                if unit and unit != "metre":
                    raise ProjError("gridshift: only unit=metre handled")
        if grid.spp >= 2 and idx_x < 0 and idx_y < 0 \
                and type_ == "HORIZONTAL_OFFSET":
            if proj:
                easting_northing = True
                idx_x, idx_y = 0, 1
            else:
                idx_x, idx_y = 1, 0  # lat first by GTG default
        if type_ in ("HORIZONTAL_OFFSET", "GEOGRAPHIC_3D_OFFSET") \
                and (idx_x < 0 or idx_y < 0):
            raise ProjError("gridshift: grid has not expected samples")
        if type_ in ("ELLIPSOIDAL_HEIGHT_OFFSET",
                     "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL",
                     "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL",
                     "GEOGRAPHIC_3D_OFFSET") and idx_z < 0:
            raise ProjError("gridshift: grid has not expected samples")
        interp = forced_interp or grid.item("interpolation_method") \
            or "bilinear"
        if interp not in ("bilinear", "biquadratic"):
            raise ProjError("gridshift: unsupported interpolation_method "
                            "in grid")
        self.idx_x = idx_x
        self.idx_y = idx_y
        self.idx_z = -1 if skip_z else idx_z
        self.easting_northing = easting_northing
        self.bilinear = (interp == "bilinear" or grid.nx < 3 or grid.ny < 3)


def _grid_interpolate(grid: GTiffGrid, ch: _GridChans, x, y):
    """Vectorized window interpolation.  Inputs are already wrapped into
    the grid extent.  Returns (sx, sy, sz, valid); sx/sy in radians for
    geographic offsets, metres for easting/northing; sz metres."""
    n = len(x)
    fx = (x - grid.west) / grid.res_x
    fy = (y - grid.south) / grid.res_y
    ix = np.floor(fx).astype(np.int64)
    iy = np.floor(fy).astype(np.int64)
    tx = fx - ix
    ty = fy - iy
    tol = 10 * REL_TOL
    valid = np.ones(n, dtype=bool)

    # edge clamps (gridshift.cpp:389-417)
    low_x = ix < 0
    fix_lo_x = low_x & (ix == -1) & (tx > 1 - tol)
    valid &= ~(low_x & ~fix_lo_x)
    ix = np.where(fix_lo_x, 0, ix)
    tx = np.where(fix_lo_x, 0.0, tx)
    hi_x = ix + 1 >= grid.nx
    fix_hi_x = hi_x & (ix + 1 == grid.nx) & (tx < tol)
    valid &= ~(hi_x & ~fix_hi_x)
    ix = np.where(fix_hi_x, grid.nx - 2, ix)
    tx = np.where(fix_hi_x, 1.0, tx)
    low_y = iy < 0
    fix_lo_y = low_y & (iy == -1) & (ty > 1 - tol)
    valid &= ~(low_y & ~fix_lo_y)
    iy = np.where(fix_lo_y, 0, iy)
    ty = np.where(fix_lo_y, 0.0, ty)
    hi_y = iy + 1 >= grid.ny
    fix_hi_y = hi_y & (iy + 1 == grid.ny) & (ty < tol)
    valid &= ~(hi_y & ~fix_hi_y)
    iy = np.where(fix_hi_y, grid.ny - 2, iy)
    ty = np.where(fix_hi_y, 1.0, ty)
    ix = np.clip(ix, 0, grid.nx - 2)
    iy = np.clip(iy, 0, grid.ny - 2)

    samples = [s for s in (ch.idx_x, ch.idx_y, ch.idx_z) if s >= 0]
    vals = grid.values

    def window(wx: int, wy: int):
        """Stacked (n, n_samples) values at (iy+wy, ix+wx)."""
        return vals[iy + wy, ix + wx][:, samples]

    if ch.bilinear:
        w00 = window(0, 0)
        w10 = window(1, 0)
        w01 = window(0, 1)
        w11 = window(1, 1)
        nod = (np.isnan(w00) | np.isnan(w10) | np.isnan(w01)
               | np.isnan(w11)).any(axis=1)
        valid &= ~nod
        m10 = tx * (1 - ty)
        m11 = tx * ty
        m01 = (1 - tx) * ty
        m00 = (1 - tx) * (1 - ty)
        res = (w00 * m00[:, None] + w10 * m10[:, None]
               + w01 * m01[:, None] + w11 * m11[:, None])
    else:
        # biquadratic: shift the 3x3 window before/after half pixel
        sh_x = ((tx <= 0.5) & (ix > 0)) | (ix + 2 == grid.nx)
        ix = np.where(sh_x, ix - 1, ix)
        tx = np.where(sh_x, tx + 1, tx)
        sh_y = ((ty <= 0.5) & (iy > 0)) | (iy + 2 == grid.ny)
        iy = np.where(sh_y, iy - 1, iy)
        ty = np.where(sh_y, ty + 1, ty)
        ix = np.clip(ix, 0, grid.nx - 3)
        iy = np.clip(iy, 0, grid.ny - 3)

        def qterp(t, f0, f1, f2):
            df0 = f1 - f0
            d2f0 = (f2 - f1) - df0
            return f0 + t[:, None] * df0 \
                + 0.5 * t[:, None] * (t[:, None] - 1.0) * d2f0

        rows = []
        nod = np.zeros(n, dtype=bool)
        for wy in range(3):
            f0 = window(0, wy)
            f1 = window(1, wy)
            f2 = window(2, wy)
            nod |= (np.isnan(f0) | np.isnan(f1)
                    | np.isnan(f2)).any(axis=1)
            rows.append(qterp(tx, f0, f1, f2))
        valid &= ~nod
        res = qterp(ty, rows[0], rows[1], rows[2])

    sx = np.zeros(n)
    sy = np.zeros(n)
    sz = np.zeros(n)
    j = 0
    for idx, out in ((ch.idx_x, "x"), (ch.idx_y, "y"), (ch.idx_z, "z")):
        if idx < 0:
            continue
        col = res[:, j]
        j += 1
        if out == "x":
            sx = col
        elif out == "y":
            sy = col
        else:
            sz = col
    if ch.idx_x >= 0 and ch.idx_y >= 0 and not ch.easting_northing:
        sx = sx * ARCSEC_TO_RAD
        sy = sy * ARCSEC_TO_RAD
    sx = np.where(valid, sx, 0.0)
    sy = np.where(valid, sy, 0.0)
    sz = np.where(valid, sz, 0.0)
    return sx, sy, sz, valid


def _normalize_x(grid: GTiffGrid, x):
    """Wrap geographic longitudes into the grid extent
    (gridshift.cpp normalizeX)."""
    if not grid.geographic:
        return x
    eps = (grid.res_x + grid.res_y) * REL_TOL
    x = np.asarray(x, dtype=np.float64).copy()
    x = np.where(x < grid.west - eps, x + 2 * np.pi, x)
    x = np.where(x > grid.east + eps, x - 2 * np.pi, x)
    return x


def _adjlon(x):
    return x - 2 * np.pi * np.round(x / (2 * np.pi))


@register
class GridShift(Operation):
    """Generic grid shift (reference transformations/gridshift.cpp)."""

    name = "gridshift"

    def setup(self, params: Params) -> None:
        spec = params.s("grids")
        if not spec:
            raise ProjError("gridshift: +grids parameter missing")
        self.interp = ""
        if params.has("interpolation"):
            v = params.s("interpolation")
            if v not in ("bilinear", "biquadratic"):
                raise ProjError(
                    "gridshift: unsupported value for +interpolation")
            self.interp = v
        self.skip_z = params.has("no_z_transform")

        from proj_ray.ops.gridshift import (load_generic_gridsets)

        self.gridsets = load_generic_gridsets(spec)
        self._classify()
        flags = {g.geographic for gs in self.gridsets for g in gs
                 if isinstance(g, GTiffGrid)}
        if len(flags) > 1:
            raise ProjError("gridshift: grids mix geographic and projected "
                            "coordinate conventions")
        geographic = flags.pop() if flags else True
        self.left = RADIANS if geographic else CARTESIAN
        self.right = self.left
        self._chans = {}

    def _classify(self) -> None:
        has = set()
        offset_x = offset_y = ""
        count = 0
        for gs in self.gridsets:
            for g in gs:
                count += 1
                if g is None:  # null grid sentinel
                    continue
                t = _gtype(g)
                if not t:
                    raise ProjError("gridshift: missing TYPE metadata item "
                                    "in grid(s)")
                if t not in _KNOWN_TYPES:
                    raise ProjError("gridshift: unhandled value for TYPE "
                                    "metadata item in grid(s)")
                has.add(t)
                if t == "HORIZONTAL_OFFSET":
                    offset_x = offset_x or g.item("constant_offset", 0)
                    offset_y = offset_y or g.item("constant_offset", 1)
        self.offset_x = self.offset_y = 0.0
        if offset_x or offset_y:
            if count > 1:
                raise ProjError("gridshift: only one grid with shift offset "
                                "supported")
            self.offset_x = float(offset_x or 0)
            self.offset_y = float(offset_y or 0)
        vert_kinds = [k for k in ("ELLIPSOIDAL_HEIGHT_OFFSET",
                                  "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL",
                                  "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL")
                      if k in has]
        if len(vert_kinds) > 1:
            raise ProjError("gridshift: unsupported mix of grid types")
        self.has_horizontal = "HORIZONTAL_OFFSET" in has
        self.main_is_geog3d = "GEOGRAPHIC_3D_OFFSET" in has
        if self.main_is_geog3d:
            self.main_type = "GEOGRAPHIC_3D_OFFSET"
        elif not self.has_horizontal:
            if not vert_kinds:
                raise ProjError("gridshift: no usable grid type")
            self.main_type = vert_kinds[0]
        else:
            self.main_type = "HORIZONTAL_OFFSET"
        self.aux_type = vert_kinds[0] \
            if (self.has_horizontal and vert_kinds) else ""

    # -- grid selection ----------------------------------------------------

    def _tops_of_type(self, type_: str):
        """Per-gridset top-level grids of the given TYPE, file order
        (GenericShiftGridSet::gridAt(type, ...))."""
        return [[g for g in gs if g is None or _gtype(g) == type_]
                for gs in self.gridsets]

    def _chan(self, grid: GTiffGrid, type_: str) -> _GridChans:
        key = (id(grid), type_)
        if key not in self._chans:
            self._chans[key] = _GridChans(grid, type_, self.interp,
                                          self.skip_z)
        return self._chans[key]

    def _select(self, setlist, x, y):
        """Per-point grid resolution mirroring the reference's
        hierarchy walk: gridsets in spec order; within one, top-level
        grids in file order, first containing grid wins and recursion
        descends to its first containing child (gridAt).  Returns
        (sel ids, grids list); id -1 = no grid, grids[i] may be None
        for the null grid."""
        n = len(x)
        sel = np.full(n, -1, dtype=np.int64)
        grids: List[Optional[GTiffGrid]] = []
        eps = 1e-11

        def resolve(g, idxs):
            remaining = idxs
            for ch in getattr(g, "children", []):
                if len(remaining) == 0:
                    return
                mask = ch.contains(x[remaining], y[remaining], eps)
                if np.any(mask):
                    resolve(ch, remaining[mask])
                    remaining = remaining[~mask]
            if len(remaining):
                grids.append(g)
                sel[remaining] = len(grids) - 1

        for tops in setlist:
            todo = np.flatnonzero(sel < 0)
            for g in tops:
                if len(todo) == 0:
                    break
                if g is None:
                    grids.append(None)
                    sel[todo] = len(grids) - 1
                    todo = todo[:0]
                    break
                mask = g.contains(x[todo], y[todo], eps)
                if np.any(mask):
                    resolve(g, todo[mask])
                    todo = todo[~mask]
            if not np.any(sel < 0):
                break
        return sel, grids

    # -- application -------------------------------------------------------

    def _apply_type(self, type_: str, vertical_only: bool, c: Coords,
                    fwd: bool, fallback_type: Optional[str] = None) -> None:
        x, y, z = c.x, c.y, c.z
        sel, grids = self._select(self._tops_of_type(type_), x, y)
        fsel = np.full(len(x), -1, dtype=np.int64)
        fgrids: List[Optional[GTiffGrid]] = []
        if fallback_type:
            miss = np.flatnonzero(sel < 0)
            if len(miss):
                fs, fgrids = self._select(self._tops_of_type(fallback_type),
                                          x[miss], y[miss])
                fsel[miss] = fs
        bad = (sel < 0) & (fsel < 0)
        noconv = np.zeros(len(x), dtype=bool)

        out_x = x.copy()
        out_y = y.copy()
        out_z = z.copy()
        for pool, plist, ptype in ((sel, grids, type_),
                                   (fsel, fgrids, fallback_type or "")):
            for gi in np.unique(pool):
                if gi < 0:
                    continue
                g = plist[gi]
                mask = pool == gi
                if g is None:  # null grid: identity
                    continue
                ch = self._chan(g, ptype)
                vo = vertical_only or (ptype != "HORIZONTAL_OFFSET"
                                       and ptype != "GEOGRAPHIC_3D_OFFSET")
                ox, oy, oz, ok, nc = self._apply_one(
                    g, ch, vo, x[mask], y[mask], z[mask], fwd)
                out_x[mask] = ox
                out_y[mask] = oy
                out_z[mask] = oz
                idx = np.flatnonzero(mask)
                bad[idx[~ok]] = True
                noconv[idx[nc]] = True
        c.set_error(bad & ~noconv, ERR_OUTSIDE_DOMAIN)
        c.set_error(noconv, ERR_NO_CONVERGENCE)
        bad |= noconv
        c.x = np.where(bad, np.nan, out_x)
        c.y = np.where(bad, np.nan, out_y)
        c.z = np.where(bad, np.nan, out_z)

    def _apply_one(self, g: GTiffGrid, ch: _GridChans, vertical_only: bool,
                   x, y, z, fwd: bool):
        nx = _normalize_x(g, x)
        sx, sy, sz, ok = _grid_interpolate(g, ch, nx, y)
        nc = np.zeros(len(x), dtype=bool)
        if fwd:
            return x + sx, y + sy, z + sz, ok, nc
        if vertical_only:
            return x, y, z - sz, ok, nc
        gx = nx - sx
        gy = y - sy
        if ch.bilinear:
            live = ok.copy()
            for _ in range(MAX_ITER):
                if not np.any(live):
                    break
                s2x, s2y, s2z, ok2 = _grid_interpolate(
                    g, ch, gx[live], gy[live])
                # points falling off the grid keep the first approximation
                # (gridshift.cpp:708-712)
                upd = ok2
                dx = gx[live] + s2x - nx[live]
                dy = gy[live] + s2y - y[live]
                gxl = gx[live]
                gyl = gy[live]
                gx[live] = np.where(upd, gxl - dx, gxl)
                gy[live] = np.where(upd, gyl - dy, gyl)
                done = (dx * dx + dy * dy <= TOL * TOL) | ~ok2
                idx = np.flatnonzero(live)[done]
                live[idx] = False
            # iteration exhaustion = PROJ_ERR_COORD_TRANSFM_NO_CONVERGENCE
            # (gridshift.cpp:699-707)
            nc = live & ok
            # z-shift resampled at the converged guess; an off-grid final
            # sample keeps the first approximation (gridshift.cpp:708-718) —
            # decided by the sample's validity mask, not isfinite (invalid
            # samples are zeroed, hence always finite)
            sz_final, okf = _grid_interpolate(g, ch, gx, gy)[2:4]
            sz = np.where(okf, sz_final, sz)
        if g.geographic:
            gx = _adjlon(gx)
        return gx, gy, z - sz, ok, nc

    def _run(self, c: Coords, fwd: bool) -> None:
        if not fwd:
            c.x = c.x - self.offset_x
            c.y = c.y - self.offset_y
        fallback = "HORIZONTAL_OFFSET" \
            if (self.main_is_geog3d and self.has_horizontal) else None
        vertical_only = not (self.main_is_geog3d or self.has_horizontal)
        self._apply_type(self.main_type, vertical_only, c, fwd,
                         fallback_type=fallback)
        if self.aux_type:
            # second pass: separate vertical grid (skip where the main
            # pass already applied a geographic 3D offset)
            if self.main_is_geog3d:
                handled = self._select(self._tops_of_type(self.main_type),
                                       c.x, c.y)[0] >= 0
            else:
                handled = np.zeros(len(c.x), dtype=bool)
            todo = ~handled & (c.err == 0)
            if np.any(todo):
                sub = Coords(c.x[todo], c.y[todo], c.z[todo], c.t[todo])
                self._apply_type(self.aux_type, True, sub, fwd)
                c.x[todo] = sub.x
                c.y[todo] = sub.y
                c.z[todo] = sub.z
                err = c.err.copy()
                err[np.flatnonzero(todo)[sub.err != 0]] = ERR_OUTSIDE_DOMAIN
                c.err = err
        if fwd:
            c.x = c.x + self.offset_x
            c.y = c.y + self.offset_y

    def _fwd(self, c: Coords) -> None:
        self._run(c, True)

    def _inv(self, c: Coords) -> None:
        self._run(c, False)


def _load_xyz_grids(spec: str):
    """GTG geocentric-translation grids as ShiftGrids with channels
    reordered to (dx, dy, dz) metres (xyzgridshift.cpp
    get_grid_values channel/unit handling)."""
    from proj_ray.ops.gridshift import (ShiftGrid, resolve_grid_path,
                                        sniff_grid_format)

    grids = []
    for part in spec.split(","):
        part = part.strip().lstrip("@")
        if not part:
            continue
        if part == "null":
            grids.append(ShiftGrid.null(3))
            continue
        path = resolve_grid_path(part)
        if path is None or sniff_grid_format(path) != "gtiff":
            raise ProjError("xyzgridshift: could not find required grid(s)")
        try:
            gl = read_geotiff(path)
        except TiffError as exc:
            raise ProjError("xyzgridshift: could not open grid "
                            f"{part!r} ({exc})") from exc
        for g in gl:
            if g.spp < 3:
                raise ProjError("xyzgridshift: grid has not enough samples")
            ix, iy, iz = 0, 1, 2
            for i in range(g.spp):
                d = g.description(i)
                if d == "x_translation":
                    ix = i
                elif d == "y_translation":
                    iy = i
                elif d == "z_translation":
                    iz = i
            unit = g.unit(ix)
            if unit and unit != "metre":
                raise ProjError("xyzgridshift: only unit=metre handled")
            vals = g.values[:, :, [ix, iy, iz]]
            grids.append(ShiftGrid(g.west, g.south, g.res_x, g.res_y,
                                   vals, nodata=np.nan))
    if not grids:
        raise ProjError("xyzgridshift: could not find required grid(s)")
    return grids


@register
class XYZGridShift(Operation):
    """Geocentric grid shift (reference
    transformations/xyzgridshift.cpp): cartesian in/out; per-point
    (dx, dy, dz) translations looked up at the geodetic position of the
    point in either the input CRS (direct) or the output CRS
    (iterative, +grid_ref=output_crs — the NTF->RGF93 convention)."""

    name = "xyzgridshift"

    def setup(self, params: Params) -> None:
        self.left = CARTESIAN
        self.right = CARTESIAN
        grid_ref = params.s("grid_ref", "input_crs")
        if grid_ref not in ("input_crs", "output_crs"):
            raise ProjError("xyzgridshift: unsupported value for grid_ref")
        self.ref_input = grid_ref == "input_crs"
        if not params.has("grids"):
            raise ProjError("xyzgridshift: +grids parameter missing")
        self.mult = params.f("multiplier", 1.0)
        self.grids = _load_xyz_grids(params.s("grids"))

    def _values(self, x, y, z):
        """(dx, dy, dz, found) at the geodetic position of XYZ."""
        from proj_ray.ops.cart import cart_inv_core

        c = Coords(x.copy(), y.copy(), z.copy())
        cart_inv_core(self, c)  # XYZ -> lam/phi/h on self.ell
        n = len(x)
        out = np.zeros((n, 3))
        found = np.zeros(n, dtype=bool)
        for g in self.grids:
            vals, valid = g.interp(c.x, c.y)
            take = valid & ~found
            if np.any(take):
                out[take] = vals[take]
            found |= valid
            if found.all():
                break
        return (out[:, 0] * self.mult, out[:, 1] * self.mult,
                out[:, 2] * self.mult, found)

    def _direct(self, c: Coords, factor: float) -> None:
        dx, dy, dz, ok = self._values(c.x, c.y, c.z)
        bad = ~ok
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, c.x + factor * dx)
        c.y = np.where(bad, np.nan, c.y + factor * dy)
        c.z = np.where(bad, np.nan, c.z + factor * dz)

    def _iterative(self, c: Coords, factor: float) -> None:
        x0, y0, z0 = c.x.copy(), c.y.copy(), c.z.copy()
        x, y, z = c.x.copy(), c.y.copy(), c.z.copy()
        bad = np.zeros(len(x), dtype=bool)
        for _ in range(10):
            dx, dy, dz, ok = self._values(x, y, z)
            bad |= ~ok
            dx *= factor
            dy *= factor
            dz *= factor
            err = ((x - x0) - dx) ** 2 + ((y - y0) - dy) ** 2 \
                + ((z - z0) - dz) ** 2
            x = x0 + dx
            y = y0 + dy
            z = z0 + dz
            if np.all(bad | (err < 1e-10)):
                break
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)
        c.z = np.where(bad, np.nan, z)

    def _fwd(self, c: Coords) -> None:
        if self.ref_input:
            self._direct(c, 1.0)
        else:
            self._iterative(c, 1.0)

    def _inv(self, c: Coords) -> None:
        if self.ref_input:
            self._iterative(c, -1.0)
        else:
            self._direct(c, -1.0)
