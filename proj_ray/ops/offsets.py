"""vertoffset: vertical offset + slope plane
(reference src/transformations/vertoffset.cpp; EPSG method 1046).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import RADIANS, Operation, Params, register

ARCSEC_TO_RAD = m.DEG_TO_RAD / 3600.0


@register
class VertOffset(Operation):
    name = "vertoffset"

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS
        self.slope_lon = params.f("slope_lon") * ARCSEC_TO_RAD
        self.slope_lat = params.f("slope_lat") * ARCSEC_TO_RAD
        self.zoff = params.f("dh")
        sinlat0 = np.sin(self.phi0)
        t = 1 - self.es * sinlat0 * sinlat0
        self.rho0 = self.a * (1 - self.es) / (t * np.sqrt(t))
        self.nu0 = self.a / np.sqrt(t)

    def _offset(self, lam, phi):
        return (self.zoff + self.slope_lat * self.rho0 * (phi - self.phi0)
                + self.slope_lon * self.nu0 * lam * np.cos(phi))

    def _fwd(self, c: Coords) -> None:
        # lam0 is re-added: only z changes (vertoffset.cpp:56-63)
        c.z = c.z + self._offset(c.x, c.y)
        c.x = c.x + self.lam0

    def _inv(self, c: Coords) -> None:
        c.x = c.x - self.lam0
        c.z = c.z - self._offset(c.x, c.y)
