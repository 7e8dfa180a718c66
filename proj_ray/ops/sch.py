"""Spherical Cross-track Height (SCH) radar coordinate system —
reference src/projections/sch.cpp (JPL/ISCE peg-point system).

Geodetic lam/phi/h -> geocentric XYZ on the ellipsoid, translate by the
peg offset, rotate into the peg-local frame, then read s (along-track),
c (cross-track), h off a sphere whose radius is the radius of curvature
in the heading direction at the peg (sch.cpp:130-188).  The op is
3D-only in the reference (fwd3d/inv3d); here z always rides along.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core.coords import Coords
from proj_ray.ops.base import Operation, Params, ProjError, register


class _Sphere:
    """Minimal op-like holder exposing the local sphere to the cart
    kernels (a, es, ra + full Ellipsoid under .ell)."""

    def __init__(self, r: float):
        from proj_ray.core.ellipsoid import Ellipsoid

        self.ell = Ellipsoid(r, 0.0)
        self.a = r
        self.es = 0.0
        self.e = 0.0
        self.ra = 1.0 / r
        self.b = r


@register
class SCH(Operation):
    name = "sch"

    def setup(self, params: Params) -> None:
        for p in ("plat_0", "plon_0", "phdg_0"):
            if not params.has(p):
                raise ProjError(f"sch: missing parameter {p}")
        self.plat = params.r("plat_0")
        self.plon = params.r("plon_0")
        self.phdg = params.r("phdg_0")
        self.h0 = params.f("h_0", 0.0)

        clt, slt = np.cos(self.plat), np.sin(self.plat)
        clo, slo = np.cos(self.plon), np.sin(self.plon)
        chdg, shdg = np.cos(self.phdg), np.sin(self.phdg)

        temp = np.sqrt(1.0 - self.es * slt * slt)
        reast = self.a / temp
        rnorth = self.a * (1.0 - self.es) / temp ** 3
        self.rcurv = self.h0 + (reast * rnorth) / (
            reast * chdg * chdg + rnorth * shdg * shdg)
        self.sphere = _Sphere(self.rcurv)

        # rows of the ECEF->local rotation (sch.cpp transMat)
        self.mat = np.array([
            [clt * clo, -shdg * slo - slt * clo * chdg,
             slo * chdg - slt * clo * shdg],
            [clt * slo, clo * shdg - slt * slo * chdg,
             -clo * chdg - slt * slo * shdg],
            [slt, clt * chdg, clt * shdg],
        ])

        # peg offset: cart(peg) - rcurv * peg direction
        from proj_ray.ops.cart import cart_fwd_core

        c = Coords(np.array([self.plon]), np.array([self.plat]),
                   np.array([self.h0]))
        cart_fwd_core(self, c)
        self.xyzoff = np.array([
            c.x[0] - self.rcurv * clt * clo,
            c.y[0] - self.rcurv * clt * slo,
            c.z[0] - self.rcurv * slt,
        ])

    def _fwd(self, c: Coords) -> None:
        from proj_ray.ops.cart import cart_fwd_core, cart_inv_core

        cart_fwd_core(self, c)
        x = c.x - self.xyzoff[0]
        y = c.y - self.xyzoff[1]
        z = c.z - self.xyzoff[2]
        m = self.mat
        # transpose rotation (sch.cpp sch_forward3d)
        lx = m[0, 0] * x + m[1, 0] * y + m[2, 0] * z
        ly = m[0, 1] * x + m[1, 1] * y + m[2, 1] * z
        lz = m[0, 2] * x + m[1, 2] * y + m[2, 2] * z
        loc = Coords(lx, ly, lz)
        cart_inv_core(self.sphere, loc)
        c.x = loc.x * (self.rcurv / self.a)
        c.y = loc.y * (self.rcurv / self.a)
        c.z = loc.z

    def _inv(self, c: Coords) -> None:
        from proj_ray.ops.cart import cart_fwd_core, cart_inv_core

        loc = Coords(c.x * (self.a / self.rcurv),
                     c.y * (self.a / self.rcurv), c.z)
        cart_fwd_core(self.sphere, loc)
        m = self.mat
        x = m[0, 0] * loc.x + m[0, 1] * loc.y + m[0, 2] * loc.z
        y = m[1, 0] * loc.x + m[1, 1] * loc.y + m[1, 2] * loc.z
        z = m[2, 0] * loc.x + m[2, 1] * loc.y + m[2, 2] * loc.z
        out = Coords(x + self.xyzoff[0], y + self.xyzoff[1],
                     z + self.xyzoff[2])
        cart_inv_core(self, out)
        c.x, c.y, c.z = out.x, out.y, out.z
