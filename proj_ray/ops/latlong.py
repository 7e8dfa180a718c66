"""Identity-style operations.

latlong/longlat/latlon/lonlat: geographic-CRS marker ops (reference
src/projections/latlong.cpp:34-75) — identity kernels with angular I/O.
noop: identity (src/conversions/noop.cpp).
set: overwrite selected components with constants (src/conversions/set.cpp).
geoc-style geodetic<->geocentric latitude is handled by the +geoc flag in
the framework (see base.Operation), and the `geoc` op mirrors
src/conversions/geoc.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core.coords import Coords
from proj_ray.ops.base import (
    DEGREES,
    RADIANS,
    WHATEVER,
    Operation,
    Params,
    register,
)


@register
class LatLong(Operation):
    name = "latlong"
    aliases = ("longlat", "latlon", "lonlat")

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS
        self.is_latlong = True

    def _fwd(self, c: Coords) -> None:
        pass

    def _inv(self, c: Coords) -> None:
        pass


@register
class Noop(Operation):
    name = "noop"

    def setup(self, params: Params) -> None:
        self.left = WHATEVER
        self.right = WHATEVER

    def _fwd(self, c: Coords) -> None:
        pass

    def _inv(self, c: Coords) -> None:
        pass


@register
class SetOp(Operation):
    """+proj=set +v_1=... +v_2=... +v_3=... +v_4=...: overwrite components
    with constants in both directions (reference src/conversions/set.cpp)."""

    name = "set"

    def setup(self, params: Params) -> None:
        self.left = WHATEVER
        self.right = WHATEVER
        self.v = [
            (params.f(f"v_{i}") if params.has(f"v_{i}") else None)
            for i in (1, 2, 3, 4)
        ]

    def _apply(self, c: Coords) -> None:
        arrs = (c.x, c.y, c.z, c.t)
        for val, arr in zip(self.v, arrs):
            if val is not None:
                arr[:] = val

    def _fwd(self, c: Coords) -> None:
        self._apply(c)

    def _inv(self, c: Coords) -> None:
        self._apply(c)


@register
class Geoc(Operation):
    """Geodetic <-> geocentric latitude (reference src/conversions/geoc.cpp)."""

    name = "geoc"

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS

    def _fwd(self, c: Coords) -> None:
        with np.errstate(all="ignore"):
            c.y = np.arctan(self.one_es * np.tan(c.y))

    def _inv(self, c: Coords) -> None:
        with np.errstate(all="ignore"):
            c.y = np.arctan(self.rone_es * np.tan(c.y))
