"""Albers Equal Area conic + Lambert Equal Area Conic
(reference src/projections/aea.cpp), with the vectorized phi1_ inverse
iteration (aea.cpp:46-68: 15 iters, tol 1e-10).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

EPS10 = 1e-10
TOL7 = 1e-7
N_ITER = 15
EPSILON = 1e-7
TOL = 1e-10


def phi1_inv(qs, Te, Tone_es):
    """Invert authalic q -> latitude (reference phi1_), vectorized with
    convergence masks; non-converged rows become NaN."""
    Phi = np.arcsin(np.clip(0.5 * qs, -1, 1))
    if Te < EPSILON:
        return Phi
    active = np.ones_like(Phi, dtype=bool)
    for _ in range(N_ITER + 1):
        if not np.any(active):
            break
        sinpi = np.sin(Phi)
        cospi = np.cos(Phi)
        con = Te * sinpi
        com = 1.0 - con * con
        with np.errstate(all="ignore"):
            dphi = (0.5 * com * com / cospi
                    * (qs / Tone_es - sinpi / com
                       + 0.5 / Te * np.log((1.0 - con) / (1.0 + con))))
        Phi = np.where(active, Phi + dphi, Phi)
        active &= np.abs(dphi) > TOL
    return np.where(active, np.nan, Phi)


@register
class Aea(Operation):
    name = "aea"

    def _read_lats(self, params: Params) -> None:
        self.phi1 = params.r("lat_1")
        self.phi2 = params.r("lat_2")

    def setup(self, params: Params) -> None:
        self._read_lats(params)
        if abs(self.phi1) > m.M_HALFPI or abs(self.phi2) > m.M_HALFPI:
            raise ProjError("|lat_1|,|lat_2| should be <= 90")
        if abs(self.phi1 + self.phi2) < EPS10:
            raise ProjError("|lat_1 + lat_2| should be > 0")
        sinphi = np.sin(self.phi1)
        cosphi = np.cos(self.phi1)
        self.n = float(sinphi)
        secant = abs(self.phi1 - self.phi2) >= EPS10
        self.ellips = self.es > 0.0
        if self.ellips:
            m1 = float(m.msfn(sinphi, cosphi, self.es))
            ml1 = float(m.qsfn(sinphi, self.e, self.one_es))
            if secant:
                sinphi2 = np.sin(self.phi2)
                cosphi2 = np.cos(self.phi2)
                m2 = float(m.msfn(sinphi2, cosphi2, self.es))
                ml2 = float(m.qsfn(sinphi2, self.e, self.one_es))
                if ml2 == ml1:
                    raise ProjError("aea: lat_1 == lat_2")
                self.n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
                if self.n == 0:
                    raise ProjError("invalid eccentricity")
            self.ec = 1.0 - 0.5 * self.one_es * np.log(
                (1.0 - self.e) / (1.0 + self.e)) / self.e
            self.c = m1 * m1 + self.n * ml1
            self.dd = 1.0 / self.n
            self.rho0 = self.dd * np.sqrt(
                self.c - self.n * float(
                    m.qsfn(np.sin(self.phi0), self.e, self.one_es)))
        else:
            if secant:
                self.n = 0.5 * (self.n + np.sin(self.phi2))
            self.n2 = self.n + self.n
            self.c = float(cosphi * cosphi + self.n2 * sinphi)
            self.dd = 1.0 / self.n
            self.rho0 = self.dd * np.sqrt(
                self.c - self.n2 * np.sin(self.phi0))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.ellips:
            rho = self.c - self.n * m.qsfn(np.sin(phi), self.e, self.one_es)
        else:
            rho = self.c - self.n2 * np.sin(phi)
        bad = rho < 0.0
        rho = self.dd * np.sqrt(np.where(bad, np.nan, rho))
        lamn = lam * self.n
        x = rho * np.sin(lamn)
        y = self.rho0 - rho * np.cos(lamn)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x = c.x.copy()
        y = self.rho0 - c.y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        center = rho == 0.0
        bad = np.zeros(len(c), dtype=bool)
        with np.errstate(all="ignore"):
            phi = rho / self.dd
            if self.ellips:
                phi = (self.c - phi * phi) / self.n
                interior = np.abs(self.ec - np.abs(phi)) > TOL7
                bad = interior & (np.abs(phi) > 2)
                it = phi1_inv(np.where(interior, phi, 0.0), self.e,
                              self.one_es)
                bad |= interior & np.isnan(it)
                phi = np.where(interior, it,
                               np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI))
            else:
                phi = (self.c - phi * phi) / self.n2
                phi = np.where(np.abs(phi) <= 1.0,
                               np.arcsin(np.clip(phi, -1, 1)),
                               np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI))
            lam = np.arctan2(x, y) / self.n
        pole = m.M_HALFPI if self.n > 0 else -m.M_HALFPI
        phi = np.where(center, pole, phi)
        lam = np.where(center, 0.0, lam)
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = lam, phi


@register
class Leac(Aea):
    name = "leac"

    def _read_lats(self, params: Params) -> None:
        self.phi2 = params.r("lat_1")
        self.phi1 = -m.M_HALFPI if params.b("south") else m.M_HALFPI
