"""HEALPix and rHEALPix — reference src/projections/healpix.cpp.

The polar-cap reassembly (combine_caps) is re-expressed with per-row
rotation selection: the rotation index k = cn - pole maps to one of the
four quarter-turn matrices via k mod 4, applied with np.select.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register
from proj_ray.ops.laea import authlat, authset

EPS = 1e-15
FORTPI = m.M_FORTPI
HALFPI = m.M_HALFPI

_HEALPIX_VERTS = [
    (-np.pi - EPS, FORTPI), (-3 * FORTPI, HALFPI + EPS),
    (-HALFPI, FORTPI + EPS), (-FORTPI, HALFPI + EPS),
    (0.0, FORTPI + EPS), (FORTPI, HALFPI + EPS),
    (HALFPI, FORTPI + EPS), (3 * FORTPI, HALFPI + EPS),
    (np.pi + EPS, FORTPI), (np.pi + EPS, -FORTPI),
    (3 * FORTPI, -HALFPI - EPS), (HALFPI, -FORTPI - EPS),
    (FORTPI, -HALFPI - EPS), (0.0, -FORTPI - EPS),
    (-FORTPI, -HALFPI - EPS), (-HALFPI, -FORTPI - EPS),
    (-3 * FORTPI, -HALFPI - EPS), (-np.pi - EPS, -FORTPI),
    (-np.pi - EPS, FORTPI),
]


def _rhealpix_verts(ns: int, ss: int):
    return [
        (-np.pi - EPS, FORTPI + EPS),
        (-np.pi + ns * HALFPI - EPS, FORTPI + EPS),
        (-np.pi + ns * HALFPI - EPS, 3 * FORTPI + EPS),
        (-np.pi + (ns + 1.0) * HALFPI + EPS, 3 * FORTPI + EPS),
        (-np.pi + (ns + 1.0) * HALFPI + EPS, FORTPI + EPS),
        (np.pi + EPS, FORTPI + EPS),
        (np.pi + EPS, -FORTPI - EPS),
        (-np.pi + (ss + 1.0) * HALFPI + EPS, -FORTPI - EPS),
        (-np.pi + (ss + 1.0) * HALFPI + EPS, -3 * FORTPI - EPS),
        (-np.pi + ss * HALFPI - EPS, -3 * FORTPI - EPS),
        (-np.pi + ss * HALFPI - EPS, -FORTPI - EPS),
        (-np.pi - EPS, -FORTPI - EPS),
    ]


def _pnpoly(verts, x, y):
    """Vectorized crossing-number test matching healpix.cpp pnpoly."""
    inside = np.zeros(np.shape(x), dtype=bool)
    on_vertex = np.zeros_like(inside)
    for vx, vy in verts:
        on_vertex |= (x == vx) & (y == vy)
    p1x, p1y = verts[0]
    counter = np.zeros(np.shape(x), dtype=np.int64)
    for p2x, p2y in verts[1:]:
        if p1y != p2y:
            cond = ((y > min(p1y, p2y)) & (y <= max(p1y, p2y))
                    & (x <= max(p1x, p2x)))
            xinters = (y - p1y) * (p2x - p1x) / (p2y - p1y) + p1x
            hit = cond & ((p1x == p2x) | (x <= xinters))
            counter += hit.astype(np.int64)
        p1x, p1y = p2x, p2y
    inside = counter % 2 == 1
    return inside | on_vertex


def _healpix_sphere_fwd(lam, phi):
    phi0 = np.arcsin(2.0 / 3.0)
    polar = np.abs(phi) > phi0
    with np.errstate(all="ignore"):
        sigma = np.sqrt(np.maximum(3.0 * (1.0 - np.abs(np.sin(phi))), 0.0))
        cn = np.floor(2.0 * lam / np.pi + 2.0)
        cn = np.where(cn >= 4, 3.0, cn)
        lamc = -3 * FORTPI + HALFPI * cn
        x = np.where(polar, lamc + (lam - lamc) * sigma, lam)
        y = np.where(polar, np.sign(phi) * FORTPI * (2.0 - sigma),
                     3 * np.pi / 8 * np.sin(phi))
    return x, y


def _healpix_sphere_inv(x, y):
    equat = np.abs(y) <= FORTPI
    polar = (~equat) & (np.abs(y) < HALFPI)
    with np.errstate(all="ignore"):
        cn = np.floor(2.0 * x / np.pi + 2.0)
        cn = np.where(cn >= 4, 3.0, cn)
        xc = -3 * FORTPI + HALFPI * cn
        tau = 2.0 - 4.0 * np.abs(y) / np.pi
        lam = np.where(equat, x,
                       np.where(polar, xc + (x - xc) / np.where(tau == 0, 1, tau),
                                -np.pi))
        phi = np.where(
            equat, np.arcsin(np.clip(8.0 * y / (3.0 * np.pi), -1, 1)),
            np.where(polar,
                     np.sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0,
                                                    -1, 1)),
                     np.sign(y) * HALFPI))
    return lam, phi


def _apply_quarter_rot(sel, vx, vy):
    """Apply the quarter-turn matrix chosen per row by sel in {0,1,2,3}:
    0=identity, 1=R1 [[0,-1],[1,0]], 2=R2 [[-1,0],[0,-1]], 3=R3."""
    rx = np.select([sel == 1, sel == 2, sel == 3], [-vy, -vx, vy], vx)
    ry = np.select([sel == 1, sel == 2, sel == 3], [vx, -vy, -vx], vy)
    return rx, ry


def _combine_caps(x, y, ns, ss, inverse):
    """Vectorized combine_caps (healpix.cpp:337-393)."""
    north = y > FORTPI
    south = y < -FORTPI
    polar = north | south
    pole = np.where(north, ns, ss)
    if not inverse:
        c_y = np.where(north, HALFPI, -HALFPI)
        cn = np.select([x < -HALFPI, x < 0, x < HALFPI], [0, 1, 2], 3)
        c_x = np.select([cn == 0, cn == 1, cn == 2],
                        [-3 * FORTPI, -FORTPI, FORTPI], 3 * FORTPI)
        k = np.where(north, cn - pole, -(cn - pole))
        a_x = -3 * FORTPI + pole * HALFPI
    else:
        c_x = -3 * FORTPI + pole * HALFPI
        c_y = np.where(north, HALFPI, -HALFPI)
        xadj = x - pole * HALFPI
        cn_n = np.select(
            [(y >= -xadj - FORTPI - EPS) & (y < xadj + 5 * FORTPI - EPS),
             (y > -xadj - FORTPI + EPS) & (y >= xadj + 5 * FORTPI - EPS),
             (y <= -xadj - FORTPI + EPS) & (y > xadj + 5 * FORTPI + EPS)],
            [(ns + 1) % 4, (ns + 2) % 4, (ns + 3) % 4], ns)
        cn_s = np.select(
            [(y <= xadj + FORTPI + EPS) & (y > -xadj - 5 * FORTPI + EPS),
             (y < xadj + FORTPI - EPS) & (y <= -xadj - 5 * FORTPI + EPS),
             (y >= xadj + FORTPI - EPS) & (y < -xadj - 5 * FORTPI - EPS)],
            [(ss + 1) % 4, (ss + 2) % 4, (ss + 3) % 4], ss)
        cn = np.where(north, cn_n, cn_s)
        k = np.where(north, -(cn - pole), cn - pole)
        a_x = -3 * FORTPI + cn * HALFPI
    sel = np.mod(k, 4).astype(np.int64)
    rx, ry = _apply_quarter_rot(sel, x - c_x, y - c_y)
    out_x = np.where(polar, rx + a_x, x)
    out_y = np.where(polar, ry + np.where(north, HALFPI, -HALFPI), y)
    return out_x, out_y


class _HealpixBase(Operation):
    def _setup_auth(self) -> None:
        if self.es != 0.0:
            self.apa = authset(self.es)
            self.qp = float(m.qsfn(1.0, self.e, self.one_es))
            # switch to the authalic radius (healpix.cpp:527)
            self.a = self.a * float(np.sqrt(0.5 * self.qp))
            self.ra = 1.0 / self.a

    def _auth_fwd(self, phi):
        q = m.qsfn(np.sin(phi), self.e, self.one_es)
        ratio = np.clip(q / self.qp, -1.0, 1.0)
        return np.arcsin(ratio)

    def _auth_inv(self, beta):
        return authlat(beta, self.apa)


@register
class Healpix(_HealpixBase):
    name = "healpix"

    def setup(self, params: Params) -> None:
        self.rot_xy = params.f("rot_xy") * m.DEG_TO_RAD
        self._setup_auth()

    def _fwd(self, c: Coords) -> None:
        phi = c.y
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = _healpix_sphere_fwd(c.x, phi)
        ang = -self.rot_xy
        c.x = x * np.cos(ang) - y * np.sin(ang)
        c.y = y * np.cos(ang) + x * np.sin(ang)

    def _inv(self, c: Coords) -> None:
        ang = self.rot_xy
        x = c.x * np.cos(ang) - c.y * np.sin(ang)
        y = c.y * np.cos(ang) + c.x * np.sin(ang)
        bad = ~_pnpoly(_HEALPIX_VERTS, x, y)
        lam, phi = _healpix_sphere_inv(x, y)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Rhealpix(_HealpixBase):
    name = "rhealpix"

    def setup(self, params: Params) -> None:
        self.ns = params.i("north_square")
        self.ss = params.i("south_square")
        if not (0 <= self.ns <= 3):
            raise ProjError("rhealpix: north_square should be in [0,3]")
        if not (0 <= self.ss <= 3):
            raise ProjError("rhealpix: south_square should be in [0,3]")
        self.verts = _rhealpix_verts(self.ns, self.ss)
        self._setup_auth()

    def _fwd(self, c: Coords) -> None:
        phi = c.y
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = _healpix_sphere_fwd(c.x, phi)
        c.x, c.y = _combine_caps(x, y, self.ns, self.ss, False)

    def _inv(self, c: Coords) -> None:
        bad = ~_pnpoly(self.verts, c.x, c.y)
        x, y = _combine_caps(c.x, c.y, self.ns, self.ss, True)
        lam, phi = _healpix_sphere_inv(x, y)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)
