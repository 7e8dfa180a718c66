"""Oblique Stereographic Alternative (reference
src/projections/sterea.cpp) built on the Gauss conformal sphere mappings
(src/gauss.cpp: pj_gauss_ini/pj_gauss/pj_inv_gauss, 20-iteration
fixed point at 1e-14).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

MAX_ITER = 20
DEL_TOL = 1e-14


class GaussSphere:
    """Gauss conformal sphere mapping (reference src/gauss.cpp)."""

    def __init__(self, e: float, phi0: float):
        es = e * e
        self.e = e
        sphi = np.sin(phi0)
        cphi2 = np.cos(phi0) ** 2
        self.rc = np.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
        self.C = np.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
        if self.C == 0:
            raise ProjError("gauss: invalid eccentricity")
        self.chi = np.arcsin(sphi / self.C)
        self.ratexp = 0.5 * self.C * e
        srat_val = self._srat(e * sphi, self.ratexp)
        if srat_val == 0:
            raise ProjError("gauss: invalid latitude")
        if 0.5 * phi0 + m.M_FORTPI < 1e-10:
            self.K = 1.0 / srat_val
        else:
            self.K = np.tan(0.5 * self.chi + m.M_FORTPI) / (
                np.tan(0.5 * phi0 + m.M_FORTPI) ** self.C * srat_val)

    @staticmethod
    def _srat(esinp, exp_):
        return ((1.0 - esinp) / (1.0 + esinp)) ** exp_

    def fwd(self, lam, phi):
        sphi = 2.0 * np.arctan(
            self.K * np.tan(0.5 * phi + m.M_FORTPI) ** self.C
            * self._srat(self.e * np.sin(phi), self.ratexp)) - m.M_HALFPI
        return self.C * lam, sphi

    def inv(self, slam, sphi):
        lam = slam / self.C
        num = (np.tan(0.5 * sphi + m.M_FORTPI) / self.K) ** (1.0 / self.C)
        z = np.asarray(sphi, dtype=np.float64).copy()
        out = z.copy()
        active = np.ones_like(z, dtype=bool)
        for _ in range(MAX_ITER):
            if not np.any(active):
                break
            z_new = 2.0 * np.arctan(
                num * self._srat(self.e * np.sin(z), -0.5 * self.e)) \
                - m.M_HALFPI
            out = np.where(active, z_new, out)
            conv = np.abs(z_new - z) < DEL_TOL
            z = np.where(active, z_new, z)
            active = active & ~conv
        return lam, out


@register
class Sterea(Operation):
    name = "sterea"

    def setup(self, params: Params) -> None:
        self.gauss = GaussSphere(self.e, self.phi0)
        self.phic0 = float(self.gauss.chi)
        self.sinc0 = float(np.sin(self.phic0))
        self.cosc0 = float(np.cos(self.phic0))
        self.R2 = 2.0 * float(self.gauss.rc)

    def _fwd(self, c: Coords) -> None:
        lam, phi = self.gauss.fwd(c.x, c.y)
        sinc = np.sin(phi)
        cosc = np.cos(phi)
        cosl = np.cos(lam)
        denom = 1.0 + self.sinc0 * sinc + self.cosc0 * cosc * cosl
        bad = denom == 0.0
        k = self.k0 * self.R2 / np.where(bad, np.nan, denom)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = k * cosc * np.sin(lam)
        c.y = k * (self.cosc0 * sinc - self.sinc0 * cosc * cosl)

    def _inv(self, c: Coords) -> None:
        x = c.x / self.k0
        y = c.y / self.k0
        rho = np.hypot(x, y)
        center = rho == 0.0
        cc = 2.0 * np.arctan2(rho, self.R2)
        sinc = np.sin(cc)
        cosc = np.cos(cc)
        safe = np.where(center, 1.0, rho)
        with np.errstate(all="ignore"):
            phi = np.arcsin(np.clip(
                cosc * self.sinc0 + y * sinc * self.cosc0 / safe, -1, 1))
            lam = np.arctan2(x * sinc,
                             rho * self.cosc0 * cosc - y * self.sinc0 * sinc)
        phi = np.where(center, self.phic0, phi)
        lam = np.where(center, 0.0, lam)
        lam, phi = self.gauss.inv(lam, phi)
        c.x, c.y = lam, phi
