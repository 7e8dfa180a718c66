"""Multi-component time-dependent deformation model (+proj=defmodel) —
reference src/transformations/defmodel.cpp + defmodel_impl.hpp.

A JSON master file lists components, each with a spatial extent, a GTG
displacement grid (horizontal / vertical / 3d channels) and a time
function (constant, velocity, step, reverse_step, piecewise,
exponential).  At epoch t the total displacement is the sum over
components of timefactor(t) * bilinear(grid).  Horizontal offsets are
degrees (added directly), or metres applied by plain
easting/northing-to-angle conversion (DeltaEastingNorthingToLongLat) or
geocentrically; polar-capable grids use geocentric bilinear
interpolation (defmodel_impl.hpp GridEx::getBilinearGeocentric).  The
inverse is the reference's 10-step fixed point with edge clamping.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, List, Optional

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import (PROJECTED, RADIANS, Operation, Params,
                               ProjError, register)
from proj_ray.ops.geotiff import GTiffGrid, TiffError, read_geotiff

# geographic EPSG codes we recognize without an EPSG database (the
# reference asks proj_create; unknown strings default to geographic)
_GEOGRAPHIC_EPSG = {4326, 4269, 4258, 4267, 4283, 4759, 4019, 4959,
                    4979, 4937, 4617, 4167, 4171, 4151}

_MONTH_DAYS = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def iso8601_to_decimal_year(s: str) -> float:
    mt = re.match(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$", s)
    if not mt:
        raise ProjError(f"defmodel: invalid date-time {s!r}")
    year, month, day, hour, mi, sec = (int(g) for g in mt.groups())
    if year < 1582 or not (1 <= month <= 12) or not (1 <= day <= 31) \
            or hour >= 24 or mi >= 60 or sec >= 61:
        raise ProjError(f"defmodel: invalid date-time {s!r}")
    leap = (year % 4 == 0 and year % 100 != 0) or year % 400 == 0
    days = list(_MONTH_DAYS)
    if leap:
        days[1] = 29
    if day > days[month - 1]:
        raise ProjError(f"defmodel: invalid date-time {s!r}")
    day_in_year = day - 1 + sum(days[:month - 1])
    total = 86400.0 * (366 if leap else 365)
    return year + (day_in_year * 86400 + hour * 3600 + mi * 60 + sec) / total


def _make_time_function(tf: dict) -> Callable[[np.ndarray], np.ndarray]:
    """Vectorized time factor f(t) (defmodel_impl.hpp evaluateAt)."""
    typ = tf.get("type")
    par = tf.get("parameters", {})
    if typ == "constant":
        return lambda t: np.ones_like(t)
    if typ == "velocity":
        t0 = iso8601_to_decimal_year(par["reference_epoch"])
        return lambda t: t - t0
    if typ == "step":
        t0 = iso8601_to_decimal_year(par["step_epoch"])
        return lambda t: np.where(t < t0, 0.0, 1.0)
    if typ == "reverse_step":
        t0 = iso8601_to_decimal_year(par["step_epoch"])
        return lambda t: np.where(t < t0, -1.0, 0.0)
    if typ == "piecewise":
        before = par.get("before_first", "zero")
        after = par.get("after_last", "zero")
        pts = [(iso8601_to_decimal_year(p["epoch"]), float(p["scale_factor"]))
               for p in par.get("model", [])]

        def piecewise(t):
            t = np.asarray(t, dtype=np.float64)
            if not pts:
                return np.zeros_like(t)
            xs = np.array([p[0] for p in pts])
            fs = np.array([p[1] for p in pts])
            out = np.interp(t, xs, fs)  # linear inside, clamped outside
            if before == "zero":
                out = np.where(t < xs[0], 0.0, out)
            elif before != "constant" and len(pts) > 1:
                sl = (fs[1] - fs[0]) / (xs[1] - xs[0]) if xs[1] != xs[0] else 0
                out = np.where(t < xs[0], fs[0] + sl * (t - xs[0]), out)
            if after == "zero":
                out = np.where(t >= xs[-1], np.where(t == xs[-1], out, 0.0),
                               out)
                out = np.where(t > xs[-1], 0.0, out)
            elif after != "constant" and len(pts) > 1:
                sl = (fs[-1] - fs[-2]) / (xs[-1] - xs[-2]) \
                    if xs[-1] != xs[-2] else 0
                out = np.where(t > xs[-1], fs[-1] + sl * (t - xs[-1]), out)
            return out

        return piecewise
    if typ == "exponential":
        t0 = iso8601_to_decimal_year(par["reference_epoch"])
        t_end = par.get("end_epoch", "")
        t_end_v = iso8601_to_decimal_year(t_end) if t_end else None
        tau = float(par["relaxation_constant"])
        if tau <= 0:
            raise ProjError("defmodel: invalid relaxation_constant")
        f_before = float(par["before_scale_factor"])
        f_init = float(par["initial_scale_factor"])
        f_final = float(par["final_scale_factor"])

        def exponential(t):
            t = np.asarray(t, dtype=np.float64)
            te = np.minimum(t, t_end_v) if t_end_v is not None else t
            val = f_init + (f_final - f_init) * (1.0 - np.exp(-(te - t0)
                                                              / tau))
            return np.where(t < t0, f_before, val)

        return exponential
    raise ProjError(f"defmodel: unsupported time function {typ!r}")


class _Component:
    def __init__(self, comp: dict, geographic: bool):
        self.displacement = comp.get("displacement_type", "none")
        self.tf = _make_time_function(comp["time_function"])
        bbox = comp["extent"]["parameters"]["bbox"]
        mul = m.DEG_TO_RAD if geographic else 1.0
        self.minx, self.miny = bbox[0] * mul, bbox[1] * mul
        self.maxx, self.maxy = bbox[2] * mul, bbox[3] * mul
        sm = comp["spatial_model"]
        self.filename = sm["filename"]
        self.bilinear = sm.get("interpolation_method",
                               "bilinear") == "bilinear"
        self.grids: Optional[List[GTiffGrid]] = None

    def load(self):
        if self.grids is None:
            from proj_ray.ops.gridshift import resolve_grid_path

            path = resolve_grid_path(self.filename)
            if path is None:
                raise ProjError("defmodel: cannot open "
                                f"{self.filename!r}")
            try:
                self.grids = read_geotiff(path)
            except TiffError as exc:
                raise ProjError(f"defmodel: bad grid {self.filename!r} "
                                f"({exc})") from exc
        return self.grids

    def channels(self, grid: GTiffGrid, need_h: bool, need_z: bool):
        """(ix, iy, iz) sample indices per defmodel.cpp conventions."""
        sx, sy, sz = 0, 1, 2
        if grid.spp == 1:
            sz = 0
        found_any = found_x = found_y = found_z = False
        for i in range(grid.spp):
            d = grid.description(i)
            if d:
                found_any = True
            if d == "east_offset":
                sx, found_x = i, True
            elif d == "north_offset":
                sy, found_y = i, True
            elif d == "vertical_offset":
                sz, found_z = i, True
        if found_any:
            if need_h and not (found_x and found_y):
                raise ProjError("defmodel: grid lacks east/north_offset "
                                "channels")
            if need_z and not found_z and grid.spp > 1:
                raise ProjError("defmodel: grid lacks vertical_offset "
                                "channel")
        if need_h and grid.spp < 2:
            raise ProjError("defmodel: grid has not enough samples")
        if need_z and not need_h and grid.spp not in (1,) and grid.spp < 3 \
                and not found_z:
            raise ProjError("defmodel: grid has not enough samples")
        return sx, sy, sz


@register
class DefModel(Operation):
    name = "defmodel"

    def setup(self, params: Params) -> None:
        model = params.s("model")
        if not model:
            raise ProjError("defmodel: +model= should be specified")
        from proj_ray.ops.gridshift import resolve_grid_path

        path = model if os.path.exists(model) else resolve_grid_path(model)
        if path is None:
            raise ProjError(f"defmodel: cannot open {model!r}")
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError) as exc:
            raise ProjError(f"defmodel: invalid model file: {exc}") from exc
        if doc.get("file_type") != "deformation_model_master_file":
            raise ProjError("defmodel: not a deformation model master file")
        self.unit_degree = doc.get("horizontal_offset_unit") == "degree"
        self.addition = doc.get("horizontal_offset_method",
                                "addition") == "addition"
        self.geographic = self._is_geographic(doc.get("definition_crs", ""))
        if not self.geographic and self.unit_degree:
            raise ProjError("defmodel: projected definition_crs with "
                            "degree unit")
        if not self.geographic and not self.addition:
            raise ProjError("defmodel: projected definition_crs with "
                            "geocentric method")
        mul = m.DEG_TO_RAD if self.geographic else 1.0
        ext = doc["extent"]["parameters"]["bbox"]
        self.minx, self.miny = ext[0] * mul, ext[1] * mul
        self.maxx, self.maxy = ext[2] * mul, ext[3] * mul
        te = doc["time_extent"]
        self.t_first = iso8601_to_decimal_year(te["first"])
        self.t_last = iso8601_to_decimal_year(te["last"])
        self.components = [
            _Component(cdef, self.geographic)
            for cdef in doc.get("components", [])]
        for comp in self.components:
            if not self.geographic and not comp.bilinear:
                raise ProjError("defmodel: projected definition_crs with "
                                "geocentric_bilinear")
        self.left = RADIANS if self.geographic else PROJECTED
        self.right = self.left

    @staticmethod
    def _is_geographic(crs: str) -> bool:
        mt = re.match(r"EPSG:(\d+)$", crs.strip())
        if mt:
            return int(mt.group(1)) in _GEOGRAPHIC_EPSG
        if "longlat" in crs or "latlong" in crs:
            return True
        return True  # reference default when CRS can't be instantiated

    # ------------------------------------------------------------------

    def _forward(self, x, y, z, t, for_inverse: bool):
        """Vectorized Evaluator::forward.  Returns (x, y, z, ok)."""
        eps = 1e-10 if self.geographic else 1e-5
        x_in, y_in = x.copy(), y.copy()
        x = x.copy()
        y = y.copy()
        ok = np.ones(len(x), dtype=bool)
        if self.geographic:
            two_pi = 2 * np.pi
            x = np.where(x < self.minx - eps,
                         x + two_pi * np.ceil((self.minx - eps - x)
                                              / two_pi), x)
            x = np.where(x > self.maxx + eps,
                         x - two_pi * np.ceil((x - self.maxx - eps)
                                              / two_pi), x)
        margin = (m.DEG_TO_RAD * 0.1 if self.geographic else 10000.0) \
            if for_inverse else 0.0
        x, y, in_ok = _bbox_clamp(x, y, self.minx, self.miny, self.maxx,
                                  self.maxy, eps, margin)
        ok &= in_ok
        ok &= (t >= self.t_first) & (t <= self.t_last)

        dlam = np.zeros(len(x))
        dphi = np.zeros(len(x))
        de = np.zeros(len(x))
        dn = np.zeros(len(x))
        dz = np.zeros(len(x))

        for comp in self.components:
            if comp.displacement not in ("horizontal", "vertical", "3d"):
                continue
            xg = x.copy()
            yg = y.copy()
            cmargin = 0.0
            xg, yg, c_ok = _bbox_clamp(xg, yg, comp.minx, comp.miny,
                                       comp.maxx, comp.maxy, eps, cmargin,
                                       allow_margin=for_inverse)
            act = ok & c_ok
            if not np.any(act):
                continue
            xg = np.clip(xg, comp.minx, comp.maxx)
            yg = np.clip(yg, comp.miny, comp.maxy)
            tfac = comp.tf(t)
            act &= tfac != 0.0
            if not np.any(act):
                continue
            grids = comp.load()
            sel = _select_grid(grids, xg, yg)
            for gi in np.unique(sel):
                mask = act & (sel == gi)
                if gi < 0 or not np.any(mask):
                    continue
                grid = grids[gi]
                res = self._eval_grid(comp, grid, xg[mask], yg[mask],
                                      y[mask])
                if res is None:
                    ok &= ~mask
                    continue
                g_dx, g_dy, g_dz, g_ok = res
                bad_idx = np.flatnonzero(mask)[~g_ok]
                ok[bad_idx] = False
                f = tfac[mask]
                if comp.displacement == "vertical":
                    dz[mask] += f * g_dz
                elif self.unit_degree:
                    dlam[mask] += f * g_dx
                    dphi[mask] += f * g_dy
                    if comp.displacement == "3d":
                        dz[mask] += f * g_dz
                else:
                    de[mask] += f * g_dx
                    dn[mask] += f * g_dy
                    if comp.displacement == "3d":
                        dz[mask] += f * g_dz

        if self.unit_degree:
            x_out = x_in + dlam
            y_out = y_in + dphi
        elif self.addition and not self.geographic:
            x_out = x_in + de
            y_out = y_in + dn
        elif self.addition:
            cosphi = np.cos(y_in)
            one_minus_x = self.es * (1 - cosphi * cosphi)
            xx = 1 - one_minus_x
            sqrt_x = np.sqrt(xx)
            x_out = x_in + de * sqrt_x / (self.a * cosphi)
            y_out = y_in + dn * self.a * sqrt_x * xx / (self.b * self.b)
        else:
            # geocentric addition (defmodel_impl.hpp:1176-1210)
            from proj_ray.ops.cart import cart_fwd_core, cart_inv_core

            sinphi = np.sin(y_in)
            cosphi = np.cos(y_in)
            sinlam = np.sin(x_in)
            coslam = np.cos(x_in)
            dnsin = dn * sinphi
            d_x = -de * sinlam - dnsin * coslam
            d_y = de * coslam - dnsin * sinlam
            d_z = dn * cosphi
            cc = Coords(x_in.copy(), y_in.copy(), np.zeros(len(x_in)))
            cart_fwd_core(self, cc)
            cc.x = cc.x + d_x
            cc.y = cc.y + d_y
            cc.z = cc.z + d_z
            cart_inv_core(self, cc)
            x_out = cc.x
            y_out = cc.y
        return x_out, y_out, z + dz, ok

    def _eval_grid(self, comp: _Component, grid: GTiffGrid, xg, yg, phi):
        """Bilinear / geocentric-bilinear evaluation on one grid.
        Returns (dx, dy, dz, ok): degrees->rad or metres E/N in dx/dy,
        metres in dz."""
        eps = 1e-10 if self.geographic else 1e-5
        if grid.nx < 2 or grid.ny < 2:
            return None
        need_h = comp.displacement in ("horizontal", "3d")
        need_z = comp.displacement in ("vertical", "3d")
        try:
            sx, sy, sz = comp.channels(grid, need_h, need_z)
        except ProjError:
            return None
        if need_h:
            unit = grid.unit(sx)
            want = "degree" if self.unit_degree else "metre"
            if unit and unit != want:
                return None
        if need_z:
            unit_z = grid.unit(sz)
            if unit_z and unit_z != "metre":
                return None
        ix_d = (xg - grid.west) / grid.res_x
        iy_d = (yg - grid.south) / grid.res_y
        ok = ~((ix_d < -eps) | (iy_d < -eps)
               | (ix_d + 1 >= grid.nx + eps) | (iy_d + 1 >= grid.ny + eps))
        ix0 = np.minimum(ix_d.astype(np.int64), grid.nx - 2)
        iy0 = np.minimum(iy_d.astype(np.int64), grid.ny - 2)
        ix0 = np.clip(ix0, 0, grid.nx - 2)
        iy0 = np.clip(iy0, 0, grid.ny - 2)
        fx = ix_d - ix0
        fy = iy_d - iy0
        m00 = (1 - fx) * (1 - fy)
        m10 = fx * (1 - fy)
        m01 = (1 - fx) * fy
        m11 = fx * fy
        v = grid.values

        def corner(dxi, dyi, s):
            return v[iy0 + dyi, ix0 + dxi, s]

        dx = np.zeros(len(xg))
        dy = np.zeros(len(xg))
        dzv = np.zeros(len(xg))
        if need_z:
            z00 = corner(0, 0, sz)
            z10 = corner(1, 0, sz)
            z01 = corner(0, 1, sz)
            z11 = corner(1, 1, sz)
            dzv = z00 * m00 + z10 * m10 + z01 * m01 + z11 * m11
            ok &= np.isfinite(dzv)
        if need_h:
            e00, n00 = corner(0, 0, sx), corner(0, 0, sy)
            e10, n10 = corner(1, 0, sx), corner(1, 0, sy)
            e01, n01 = corner(0, 1, sx), corner(0, 1, sy)
            e11, n11 = corner(1, 1, sx), corner(1, 1, sy)
            if self.unit_degree:
                dx = (e00 * m00 + e10 * m10 + e01 * m01 + e11 * m11) \
                    * m.DEG_TO_RAD
                dy = (n00 * m00 + n10 * m10 + n01 * m01 + n11 * m11) \
                    * m.DEG_TO_RAD
            elif comp.bilinear:
                dx = e00 * m00 + e10 * m10 + e01 * m01 + e11 * m11
                dy = n00 * m00 + n10 * m10 + n01 * m01 + n11 * m11
            else:
                # geocentric bilinear: corners in a local frame whose
                # lam origin is the cell center (GridEx, impl.hpp:60-171)
                shx = np.sin(grid.res_x / 2)
                chx = np.cos(grid.res_x / 2)
                phi0 = grid.south + iy0 * grid.res_y
                sphi0 = np.sin(phi0)
                cphi0 = np.cos(phi0)
                sphi1 = np.sin(phi0 + grid.res_y)
                cphi1 = np.cos(phi0 + grid.res_y)

                def enu2xyz(dev, dnv, sphi, cphi, sl, cl):
                    dnsin = dnv * sphi
                    return (-dev * sl - dnsin * cl,
                            dev * cl - dnsin * sl,
                            dnv * cphi)

                x00, y00, z00g = enu2xyz(e00, n00, sphi0, cphi0, -shx, chx)
                x10, y10, z10g = enu2xyz(e10, n10, sphi0, cphi0, shx, chx)
                x01, y01, z01g = enu2xyz(e01, n01, sphi1, cphi1, -shx, chx)
                x11, y11, z11g = enu2xyz(e11, n11, sphi1, cphi1, shx, chx)
                gx = x00 * m00 + x10 * m10 + x01 * m01 + x11 * m11
                gy = y00 * m00 + y10 * m10 + y01 * m01 + y11 * m11
                gz = z00g * m00 + z10g * m10 + z01g * m01 + z11g * m11
                lam_rel = (fx - 0.5) * grid.res_x
                sl = np.sin(lam_rel)
                cl = np.cos(lam_rel)
                sphi = np.sin(phi)
                cphi = np.cos(phi)
                dx = -gx * sl + gy * cl
                dy = (-gx * cl - gy * sl) * sphi + gz * cphi
            ok &= np.isfinite(dx) & np.isfinite(dy)
        return dx, dy, dzv, ok

    # ------------------------------------------------------------------

    def _fwd(self, c: Coords) -> None:
        x, y, z, ok = self._forward(c.x, c.y, c.z, c.t, False)
        bad = ~ok
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)
        c.z = np.where(bad, np.nan, z)

    def _inv(self, c: Coords) -> None:
        # 10-iteration fixed point (Evaluator::inverse)
        x0, y0, z0 = c.x, c.y, c.z
        x, y, z = x0.copy(), y0.copy(), z0.copy()
        ok_all = np.ones(len(x), dtype=bool)
        for _ in range(10):
            xn, yn, zn, ok = self._forward(x, y, z, c.t, True)
            ok_all &= ok
            dx = xn - x0
            dy = yn - y0
            dzv = zn - z0
            x = x - np.where(ok, dx, 0.0)
            y = y - np.where(ok, dy, 0.0)
            z = z - np.where(ok, dzv, 0.0)
            if np.all(~ok_all | ((np.maximum(np.abs(dx), np.abs(dy))
                                  < 1e-12) & (np.abs(dzv) < 1e-3))):
                break
        bad = ~ok_all
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)
        c.z = np.where(bad, np.nan, z)


def _bbox_clamp(x, y, minx, miny, maxx, maxy, eps, margin,
                allow_margin: bool = True):
    """Vectorized bboxCheck (defmodel_impl.hpp:783-820): inside passes;
    for the inverse path points within `margin` of the box clamp to the
    edge."""
    inside = (x >= minx - eps) & (x <= maxx + eps) \
        & (y >= miny - eps) & (y <= maxy + eps)
    if margin <= 0 or not allow_margin:
        return x, y, inside
    x_ok = ((x >= minx - eps) & (x <= maxx + eps)) \
        | ((x > minx - margin) & (x < minx)) \
        | ((x < maxx + margin) & (x > maxx))
    y_ok = ((y >= miny - eps) & (y <= maxy + eps)) \
        | ((y > miny - margin) & (y < miny)) \
        | ((y < maxy + margin) & (y > maxy))
    ok = x_ok & y_ok
    x = np.clip(x, minx, maxx)
    y = np.clip(y, miny, maxy)
    return x, y, ok


def _select_grid(grids: List[GTiffGrid], x, y) -> np.ndarray:
    """First containing grid per point, children before parents by
    extent area (gridAt over the defmodel grid set)."""
    order = sorted(range(len(grids)), key=lambda i: grids[i].area)
    sel = np.full(len(x), -1, dtype=np.int64)
    for gi in order:
        todo = sel < 0
        if not np.any(todo):
            break
        inside = grids[gi].contains(x[todo], y[todo], 1e-11)
        sel[np.flatnonzero(todo)[inside]] = gi
    return sel
