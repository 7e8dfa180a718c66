"""Equidistant cylindrical / Plate Carrée (reference src/projections/eqc.cpp).

Always spherical: x = cos(lat_ts)*lam, y = phi - phi0.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core.coords import Coords
from proj_ray.ops.base import Operation, Params, ProjError, register


@register
class Eqc(Operation):
    name = "eqc"

    def setup(self, params: Params) -> None:
        self.rc = float(np.cos(params.r("lat_ts")))
        if self.rc <= 0:
            raise ProjError("|lat_ts| should be <= 90")
        self.es = 0.0  # forced spherical (eqc.cpp:50)

    def _fwd(self, c: Coords) -> None:
        c.x = self.rc * c.x
        c.y = c.y - self.phi0

    def _inv(self, c: Coords) -> None:
        c.x = c.x / self.rc
        c.y = c.y + self.phi0
