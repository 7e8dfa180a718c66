"""Cassini-Soldner (reference src/projections/cass.cpp), including the
+hyperbolic variant and the generic-Newton-polished ellipsoidal inverse
(cass.cpp:81-84).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import Operation, Params, register
from proj_ray.ops.newton import generic_inverse_2d

C1 = 0.16666666666666666666
C2 = 0.00833333333333333333
C3 = 0.04166666666666666666
C4 = 0.33333333333333333333
C5 = 0.06666666666666666666


@register
class Cass(Operation):
    name = "cass"

    def setup(self, params: Params) -> None:
        if self.es == 0:
            self.sph = True
            return
        self.sph = False
        self.en = m.enfn(self.ell.n)
        self.m0 = float(m.mlfn(self.phi0, np.sin(self.phi0),
                               np.cos(self.phi0), self.en))
        self.hyperbolic = params.has("hyperbolic")

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.sph:
            c.x = np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1, 1))
            c.y = np.arctan2(np.tan(phi), np.cos(lam)) - self.phi0
            return
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        M = m.mlfn(phi, sinphi, cosphi, self.en)
        nu_sq = 1.0 / (1.0 - self.es * sinphi * sinphi)
        nu = np.sqrt(nu_sq)
        tanphi = np.tan(phi)
        T = tanphi * tanphi
        A = lam * cosphi
        C = self.es * cosphi * cosphi / (1 - self.es)
        A2 = A * A
        x = nu * A * (1.0 - A2 * T * (C1 + (8.0 - T + 8.0 * C) * A2 * C2))
        y = M - self.m0 + nu * tanphi * A2 * (0.5 + (5.0 - T + 6.0 * C)
                                              * A2 * C3)
        if self.hyperbolic:
            rho = nu_sq * (1.0 - self.es) * nu
            y = y - y * y * y / (6 * rho * nu)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        if self.sph:
            dd = y + self.phi0
            phi = np.arcsin(np.clip(np.sin(dd) * np.cos(x), -1, 1))
            lam = np.arctan2(np.tan(x), np.cos(dd))
            c.x, c.y = lam, phi
            return
        phi1 = m.inv_mlfn(self.m0 + y, self.en)
        tanphi1 = np.tan(phi1)
        T1 = tanphi1 * tanphi1
        sinphi1 = np.sin(phi1)
        nu1_sq = 1.0 / (1.0 - self.es * sinphi1 * sinphi1)
        nu1 = np.sqrt(nu1_sq)
        rho1 = nu1_sq * (1.0 - self.es) * nu1
        D = x / nu1
        D2 = D * D
        phi = phi1 - (nu1 * tanphi1 / rho1) * D2 * (
            0.5 - (1.0 + 3.0 * T1) * D2 * C3)
        lam = D * (1.0 + T1 * D2 * (-C4 + (1.0 + 3.0 * T1) * D2 * C5)) \
            / np.cos(phi1)
        # polish with the generic Newton inverse (cass.cpp:81-84)
        lam, phi, _ = generic_inverse_2d(self, x, y, lam, phi, 1e-12)
        c.x, c.y = lam, phi
