"""Affine transformation + geographic offset
(reference src/transformations/affine.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import RADIANS, WHATEVER, Operation, Params, \
    ProjError, register

ARCSEC_TO_RAD = m.DEG_TO_RAD / 3600.0


@register
class Affine(Operation):
    name = "affine"

    def setup(self, params: Params) -> None:
        self.left = WHATEVER
        self.right = WHATEVER
        self.xoff = params.f("xoff")
        self.yoff = params.f("yoff")
        self.zoff = params.f("zoff")
        self.toff = params.f("toff")
        F = np.eye(3)
        F[0, 0] = params.f("s11", 1.0)
        F[0, 1] = params.f("s12")
        F[0, 2] = params.f("s13")
        F[1, 0] = params.f("s21")
        F[1, 1] = params.f("s22", 1.0)
        F[1, 2] = params.f("s23")
        F[2, 0] = params.f("s31")
        F[2, 1] = params.f("s32")
        F[2, 2] = params.f("s33", 1.0)
        self.F = F
        self.tscale = params.f("tscale", 1.0)
        det = np.linalg.det(F)
        self.invertible = det != 0.0 and self.tscale != 0.0
        if self.invertible:
            self.R = np.linalg.inv(F)

    def _fwd(self, c: Coords) -> None:
        F = self.F
        x = self.xoff + F[0, 0] * c.x + F[0, 1] * c.y + F[0, 2] * c.z
        y = self.yoff + F[1, 0] * c.x + F[1, 1] * c.y + F[1, 2] * c.z
        z = self.zoff + F[2, 0] * c.x + F[2, 1] * c.y + F[2, 2] * c.z
        c.x, c.y, c.z = x, y, z
        c.t = self.toff + self.tscale * c.t

    def _inv(self, c: Coords) -> None:
        if not self.invertible:
            from proj_ray.core.coords import ERR_NO_INVERSE

            c.set_error(np.ones(len(c), dtype=bool), ERR_NO_INVERSE)
            return
        R = self.R
        x = c.x - self.xoff
        y = c.y - self.yoff
        z = c.z - self.zoff
        c.x = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
        c.y = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
        c.z = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
        c.t = (c.t - self.toff) / self.tscale


@register
class GeogOffset(Operation):
    """Constant geographic offset in arcseconds / meters
    (reference affine.cpp:227-249)."""

    name = "geogoffset"

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS
        self.dlon = params.f("dlon") * ARCSEC_TO_RAD
        self.dlat = params.f("dlat") * ARCSEC_TO_RAD
        self.dh = params.f("dh")

    def _fwd(self, c: Coords) -> None:
        c.x = c.x + self.dlon
        c.y = c.y + self.dlat
        c.z = c.z + self.dh

    def _inv(self, c: Coords) -> None:
        c.x = c.x - self.dlon
        c.y = c.y - self.dlat
        c.z = c.z - self.dh
