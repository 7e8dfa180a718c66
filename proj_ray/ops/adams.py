"""Adams/Guyou doubly-periodic conformal square family: guyou,
peirce_q, adams_hemi, adams_ws1, adams_ws2 —
reference src/projections/adams.cpp (elliptic integral of the first
kind via the ell_int_5 Chebyshev evaluation).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register
from proj_ray.ops.newton import generic_inverse_2d

TOL = 1e-9
RSQRT2 = 0.7071067811865475244008443620
SHD = 1.8540746773013719 * 2


def ell_int_5(phi):
    """Incomplete elliptic integral of the first kind with m=0.5
    (adams.cpp ell_int_5, Chebyshev series)."""
    C0 = 2.19174570831038
    C = (-8.58691003636495e-07, 2.02692115653689e-07, 3.12960480765314e-05,
         5.30394739921063e-05, -0.0012804644680613, -0.00575574836830288,
         0.0914203033408211)
    y = phi * (2.0 / np.pi)
    y = 2.0 * y * y - 1.0
    y2 = 2.0 * y
    d1 = 0.0
    d2 = 0.0
    for c in C:
        d1, d2 = y2 * d1 - d2 + c, d1
    return phi * (y * d1 - d2 + 0.5 * C0)


class _Adams(Operation):
    """Shared forward (adams.cpp adams_forward)."""

    pqshape = "diamond"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.scrollx = 0.0
        self.scrolly = 0.0
        if self.name == "peirce_q":
            shape = params.s("shape") or "diamond"
            if shape not in ("square", "diamond", "nhemisphere",
                             "shemisphere", "horizontal", "vertical"):
                raise ProjError("peirce_q: invalid value for shape")
            self.pqshape = shape
            if shape == "horizontal" and params.has("scrollx"):
                self.scrollx = params.f("scrollx")
                if abs(self.scrollx) > 1:
                    raise ProjError("peirce_q: |scrollx| should be <= 1")
            if shape == "vertical" and params.has("scrolly"):
                self.scrolly = params.f("scrolly")
                if abs(self.scrolly) > 1:
                    raise ProjError("peirce_q: |scrolly| should be <= 1")

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        name = self.name
        bad = np.zeros(lam.shape, dtype=bool)
        pole = np.zeros(lam.shape, dtype=bool)
        with np.errstate(all="ignore"):
            if name == "guyou":
                bad = (np.abs(lam) - TOL) > m.M_HALFPI
                pole = np.abs(np.abs(phi) - m.M_HALFPI) < TOL
                sl = np.sin(lam)
                sp = np.sin(phi)
                cp = np.cos(phi)
                a = m.aacos((cp * sl - sp) * RSQRT2)
                b = m.aacos((cp * sl + sp) * RSQRT2)
                sm = lam < 0.0
                sn = phi < 0.0
            elif name == "peirce_q":
                if self.pqshape == "nhemisphere":
                    bad = phi < -TOL
                elif self.pqshape == "shemisphere":
                    bad = phi > -TOL
                sl = np.sin(lam)
                cl = np.cos(lam)
                cp = np.cos(phi)
                a = m.aacos(cp * (sl + cl) * RSQRT2)
                b = m.aacos(cp * (sl - cl) * RSQRT2)
                sm = sl < 0.0
                sn = cl > 0.0
            elif name == "adams_hemi":
                sp = np.sin(phi)
                bad = (np.abs(lam) - TOL) > m.M_HALFPI
                av = np.cos(phi) * np.sin(lam)
                sm = (sp + av) < 0.0
                sn = (sp - av) < 0.0
                a = m.aacos(av)
                b = m.M_HALFPI - phi
            elif name == "adams_ws1":
                sp = np.tan(0.5 * phi)
                bv = np.cos(m.aasin(sp)) * np.sin(0.5 * lam)
                a = m.aacos((bv - sp) * RSQRT2)
                b = m.aacos((bv + sp) * RSQRT2)
                sm = lam < 0.0
                sn = phi < 0.0
            else:  # adams_ws2
                spp = np.tan(0.5 * phi)
                av = np.cos(m.aasin(spp)) * np.sin(0.5 * lam)
                sm = (spp + av) < 0.0
                sn = (spp - av) < 0.0
                b = m.aacos(spp)
                a = m.aacos(av)
            mm = m.aasin(np.sqrt(1.0 + np.minimum(0.0, np.cos(a + b))))
            mm = np.where(sm, -mm, mm)
            nn = m.aasin(np.sqrt(np.abs(1.0 - np.maximum(0.0,
                                                         np.cos(a - b)))))
            nn = np.where(sn, -nn, nn)
            x = ell_int_5(mm)
            y = ell_int_5(nn)
            if name == "peirce_q":
                if self.pqshape in ("square", "diamond"):
                    south = phi < 0.0
                    y = np.where(south & (lam < -0.75 * np.pi), SHD - y, y)
                    x = np.where(south & (lam >= -0.75 * np.pi)
                                 & (lam < -0.25 * np.pi), -SHD - x, x)
                    y = np.where(south & (lam >= -0.25 * np.pi)
                                 & (lam < 0.25 * np.pi), -SHD - y, y)
                    x = np.where(south & (lam >= 0.25 * np.pi)
                                 & (lam < 0.75 * np.pi), SHD - x, x)
                    y = np.where(south & (lam >= 0.75 * np.pi), SHD - y, y)
                if self.pqshape == "square":
                    x, y = RSQRT2 * (x - y), RSQRT2 * (x + y)
                if self.pqshape == "horizontal":
                    x = np.where(phi < 0.0, SHD - x, x)
                    x = x - SHD / 2
                    if self.scrollx != 0.0:
                        x = x + self.scrollx * SHD * 2
                        x = np.where(x >= SHD, x - 2 * SHD, x)
                        x = np.where(x < -SHD, x + 2 * SHD, x)
                if self.pqshape == "vertical":
                    y = np.where(phi < 0.0, SHD - y, y)
                    y = y - SHD / 2
                    if self.scrolly != 0.0:
                        y = y + self.scrolly * SHD * 2
                        y = np.where(y >= SHD, y - 2 * SHD, y)
                        y = np.where(y < -SHD, y + 2 * SHD, y)
            if name in ("adams_hemi", "adams_ws2"):
                x, y = RSQRT2 * (x - y), RSQRT2 * (x + y)
        if name == "guyou":
            x = np.where(pole, 0.0, x)
            y = np.where(pole, np.where(phi < 0, -1.85407, 1.85407), y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)


@register
class Guyou(_Adams):
    name = "guyou"


@register
class AdamsHemi(_Adams):
    name = "adams_hemi"


@register
class AdamsWs1(_Adams):
    name = "adams_ws1"


@register
class AdamsWs2(_Adams):
    name = "adams_ws2"

    def _inv(self, c: Coords) -> None:
        # rough seed, then generic 2-D Newton (adams.cpp adams_inverse)
        x, y = c.x, c.y
        phi0 = np.clip(y / 2.62181347, -1.0, 1.0) * m.M_HALFPI
        with np.errstate(all="ignore"):
            lam0 = np.where(
                np.abs(phi0) >= m.M_HALFPI, 0.0,
                np.clip(x / 2.62205760
                        / np.where(np.cos(phi0) == 0, 1, np.cos(phi0)),
                        -1.0, 1.0) * np.pi)
        lam, phi, done = generic_inverse_2d(self, x, y, lam0, phi0, 1e-10)
        if not done.all():
            # Near the poles the linear phi seed under-estimates badly
            # (the map has a sqrt cusp there) and the 2-D Newton cycles
            # between the clamp and an overshoot; retry from just inside
            # the pole, where the answer for large |y| lives.
            phi2 = np.copysign(m.M_HALFPI - 1e-6, y)
            lam2, p2, d2 = generic_inverse_2d(self, x, y, lam0, phi2, 1e-10)
            take = ~done & d2
            lam = np.where(take, lam2, lam)
            phi = np.where(take, p2, phi)
            done = done | d2
        c.set_error(~done, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(done, lam, np.nan)
        c.y = np.where(done, phi, np.nan)


@register
class PeirceQ(_Adams):
    name = "peirce_q"

    def _inv(self, c: Coords) -> None:
        if self.pqshape not in ("square", "diamond"):
            super()._inv(c)  # no inverse for other shapes
            return
        x, y = c.x, c.y
        lam0 = np.zeros_like(x)
        phi0 = np.zeros_like(x)
        if self.pqshape == "square":
            # heuristics from peirce_q_square_inverse (adams.cpp:272-305)
            conds = [
                (x == 0) & (y < 0),
                (x > 0) & (np.abs(y) < 1e-7),
                (x < 0) & (np.abs(y) < 1e-7),
                (np.abs(x) < 1e-7) & (y > 0),
                (x >= 0) & (y <= 0),
                (x >= 0) & (y >= 0),
                (x <= 0) & (y >= 0) & (np.abs(x) < np.abs(y)),
                (x <= 0) & (y >= 0),
            ]
            lams = [-np.pi / 4, np.pi / 4, -3 * np.pi / 4, 3 * np.pi / 4,
                    0.0, np.pi / 2, np.pi * 0.9, -np.pi * 0.9]
            lam0 = np.select(conds, lams, -np.pi / 2)
            phi0 = np.select(
                [(x == 0) & (y < 0) & (np.abs(y) < 2.622057580396),
                 (x < 0) & (np.abs(y) < 1e-7)],
                [np.pi / 4, np.pi / 2 / 2.622057574224 * x + np.pi / 2],
                0.0)
            origin = (x == 0) & (y == 0)
            phi0 = np.where(origin, m.M_HALFPI, phi0)
        else:
            # peirce_q_diamond_inverse (adams.cpp:307-342)
            conds = [
                (x >= 0) & (y <= 0),
                (x >= 0) & (y >= 0),
                (x <= 0) & (y >= 0),
            ]
            lam0 = np.select(conds, [np.pi / 4, 3 * np.pi / 4,
                                     -3 * np.pi / 4], -np.pi / 4)
            lam0 = np.where((x > 0) & (y == 0), np.pi / 2, lam0)
            origin = (x == 0) & (y == 0)
            lam0 = np.where(origin, 0.0, lam0)
            phi0 = np.where(origin, m.M_HALFPI, phi0)
            phi0 = np.where((x == 0) & (y < 0), np.pi / 4, phi0)
            lam0 = np.where((x == 0) & (y < 0), 0.0, lam0)
            far = (np.abs(x) > SHD / 2 + 1e-3) | (np.abs(y) > SHD / 2 + 1e-3)
            phi0 = np.where(far, -np.pi / 4, phi0)
        lam, phi, done = generic_inverse_2d(self, x, y, lam0, phi0, 1e-10)
        if self.pqshape == "square":
            lam = np.where((x == 0) & (y == 0), 0.0, lam)
            phi = np.where((x == 0) & (y == 0), m.M_HALFPI, phi)
            done = done | ((x == 0) & (y == 0))
        else:
            origin = (x == 0) & (y == 0)
            lam = np.where(origin, 0.0, lam)
            phi = np.where(origin, m.M_HALFPI, phi)
            done = done | origin
        c.set_error(~done, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(done, lam, np.nan)
        c.y = np.where(done, phi, np.nan)
