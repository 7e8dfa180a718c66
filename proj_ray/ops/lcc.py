"""Lambert Conformal Conic, 1SP/2SP, ellipsoidal + spherical
(reference src/projections/lcc.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

EPS10 = 1e-10


@register
class Lcc(Operation):
    name = "lcc"

    def setup(self, params: Params) -> None:
        self.phi1 = params.r("lat_1")
        if params.has("lat_2"):
            self.phi2 = params.r("lat_2")
        else:
            self.phi2 = self.phi1
            if not params.has("lat_0"):
                self.phi0 = self.phi1
        if abs(self.phi1 + self.phi2) < EPS10:
            raise ProjError("|lat_1 + lat_2| should be > 0")
        sinphi = np.sin(self.phi1)
        cosphi = np.cos(self.phi1)
        self.n = float(sinphi)
        if abs(cosphi) < EPS10 or abs(self.phi1) >= m.M_HALFPI:
            raise ProjError("|lat_1| should be < 90")
        if abs(np.cos(self.phi2)) < EPS10 or abs(self.phi2) >= m.M_HALFPI:
            raise ProjError("|lat_2| should be < 90")
        secant = abs(self.phi1 - self.phi2) >= EPS10
        if self.es != 0.0:
            m1 = float(m.msfn(sinphi, cosphi, self.es))
            ml1 = float(m.tsfn(self.phi1, sinphi, self.e))
            if secant:
                sinphi2 = np.sin(self.phi2)
                self.n = float(np.log(
                    m1 / m.msfn(sinphi2, np.cos(self.phi2), self.es)))
                if self.n == 0:
                    raise ProjError("invalid eccentricity")
                ml2 = float(m.tsfn(self.phi2, sinphi2, self.e))
                denom = float(np.log(ml1 / ml2))
                if denom == 0:
                    raise ProjError("invalid eccentricity")
                self.n /= denom
            self.rho0 = m1 * ml1 ** (-self.n) / self.n
            self.c = self.rho0
            if abs(abs(self.phi0) - m.M_HALFPI) < EPS10:
                self.rho0 = 0.0
            else:
                self.rho0 *= float(
                    m.tsfn(self.phi0, np.sin(self.phi0), self.e)) ** self.n
        else:
            if secant:
                self.n = float(np.log(cosphi / np.cos(self.phi2)) / np.log(
                    np.tan(m.M_FORTPI + 0.5 * self.phi2)
                    / np.tan(m.M_FORTPI + 0.5 * self.phi1)))
            if self.n == 0:
                raise ProjError("|lat_1 + lat_2| should be > 0")
            self.c = float(
                cosphi * np.tan(m.M_FORTPI + 0.5 * self.phi1) ** self.n / self.n)
            if abs(abs(self.phi0) - m.M_HALFPI) < EPS10:
                self.rho0 = 0.0
            else:
                self.rho0 = self.c * float(
                    np.tan(m.M_FORTPI + 0.5 * self.phi0)) ** (-self.n)

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        at_pole = np.abs(np.abs(phi) - m.M_HALFPI) < EPS10
        bad = at_pole & (phi * self.n <= 0.0)
        if self.es != 0.0:
            rho = self.c * m.tsfn(phi, np.sin(phi), self.e) ** self.n
        else:
            rho = self.c * np.tan(m.M_FORTPI + 0.5 * phi) ** (-self.n)
        rho = np.where(at_pole, 0.0, rho)
        lamn = lam * self.n
        x = self.k0 * (rho * np.sin(lamn))
        y = self.k0 * (self.rho0 - rho * np.cos(lamn))
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x = c.x / self.k0
        y = c.y / self.k0
        y = self.rho0 - y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        nz = rho != 0.0
        if self.es != 0.0:
            with np.errstate(all="ignore"):
                phi = m.phi2((rho / self.c) ** (1.0 / self.n), self.e)
        else:
            with np.errstate(all="ignore"):
                phi = 2.0 * np.arctan((self.c / rho) ** (1.0 / self.n)) - m.M_HALFPI
        lam = np.arctan2(x, y) / self.n
        pole_phi = m.M_HALFPI if self.n > 0 else -m.M_HALFPI
        phi = np.where(nz, phi, pole_phi)
        lam = np.where(nz, lam, 0.0)
        c.set_error(np.isnan(phi) & nz, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = lam, phi
