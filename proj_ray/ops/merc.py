"""Mercator and Web Mercator (reference src/projections/merc.cpp).

Ellipsoidal forward uses the isometric-latitude form
y = k0*(asinh(tan phi) - e*atanh(e sin phi)) (merc.cpp:11-20); inverse
goes through the GeographicLib tau'->tau Newton inversion
(merc.cpp:29-34, src/phi2.cpp).  webmerc = spherical formulas with k0=1
on the (ellipsoidal) WGS84 a (merc.cpp:76-84).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import Operation, Params, ProjError, register


@register
class Merc(Operation):
    name = "merc"

    def setup(self, params: Params) -> None:
        phits = None
        if params.has("lat_ts"):
            phits = abs(params.r("lat_ts"))
            if phits >= m.M_HALFPI:
                raise ProjError("|lat_ts| should be <= 90")
        if self.es != 0.0:
            if phits is not None:
                self.k0 = float(m.msfn(np.sin(phits), np.cos(phits), self.es))
            self._sph = False
        else:
            if phits is not None:
                self.k0 = float(np.cos(phits))
            self._sph = True

    def _fwd(self, c: Coords) -> None:
        k0 = self.k0
        if self._sph:
            c.x, c.y = k0 * c.x, k0 * np.arcsinh(np.tan(c.y))
        else:
            sphi = np.sin(c.y)
            cphi = np.cos(c.y)
            y = k0 * (np.arcsinh(sphi / cphi) - self.e * np.arctanh(self.e * sphi))
            c.x, c.y = k0 * c.x, y

    def _inv(self, c: Coords) -> None:
        k0 = self.k0
        if self._sph:
            c.x, c.y = c.x / k0, np.arctan(np.sinh(c.y / k0))
        else:
            phi = np.arctan(m.sinhpsi2tanphi(np.sinh(c.y / k0), self.e))
            c.x, c.y = c.x / k0, phi


@register
class WebMerc(Merc):
    name = "webmerc"

    def setup(self, params: Params) -> None:
        self.k0 = 1.0
        self._sph = True  # spherical formulas on the ellipsoid's a
