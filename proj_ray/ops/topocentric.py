"""Geocentric <-> topocentric ENU conversion
(reference src/conversions/topocentric.cpp; IOGP Pub 373-7-2).

Origin given either geocentrically (X_0,Y_0,Z_0) or geographically
(lon_0,lat_0,h_0); the other representation is derived through the cart
kernels on the op's ellipsoid.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core.coords import Coords
from proj_ray.ops.base import CARTESIAN, Operation, Params, ProjError, \
    register


@register
class Topocentric(Operation):
    name = "topocentric"

    def setup(self, params: Params) -> None:
        self.left = CARTESIAN
        self.right = CARTESIAN
        from proj_ray.ops.cart import cart_fwd_core, cart_inv_core

        hasX0 = params.has("X_0")
        hasY0 = params.has("Y_0")
        hasZ0 = params.has("Z_0")
        hasLon0 = params.has("lon_0")
        hasLat0 = params.has("lat_0")
        hash0 = params.has("h_0")
        if not hasX0 and not hasLon0:
            raise ProjError("topocentric: missing X_0 or lon_0")
        if (hasX0 or hasY0 or hasZ0) and (hasLon0 or hasLat0 or hash0):
            raise ProjError("topocentric: (X_0,Y_0,Z_0) and "
                            "(lon_0,lat_0,h_0) are mutually exclusive")
        if hasX0 and (not hasY0 or not hasZ0):
            raise ProjError("topocentric: missing Y_0 and/or Z_0")
        if hasLon0 and not hasLat0:
            raise ProjError("topocentric: missing lat_0")
        if hasX0:
            self.X0 = params.f("X_0")
            self.Y0 = params.f("Y_0")
            self.Z0 = params.f("Z_0")
            c = Coords(np.array([self.X0]), np.array([self.Y0]),
                       np.array([self.Z0]))
            cart_inv_core(self, c)
            lam0, phi0 = float(c.x[0]), float(c.y[0])
        else:
            lam0 = params.r("lon_0")
            phi0 = params.r("lat_0")
            h0 = params.f("h_0")
            c = Coords(np.array([lam0]), np.array([phi0]), np.array([h0]))
            cart_fwd_core(self, c)
            self.X0, self.Y0, self.Z0 = (float(c.x[0]), float(c.y[0]),
                                         float(c.z[0]))
        self.sinphi0 = float(np.sin(phi0))
        self.cosphi0 = float(np.cos(phi0))
        self.sinlam0 = float(np.sin(lam0))
        self.coslam0 = float(np.cos(lam0))
        # neutralize framework x_0/y_0 handling: this op's offsets are its
        # own origin, not false easting/northing
        self.x0 = self.y0 = self.z0 = 0.0

    def _fwd(self, c: Coords) -> None:
        dX = c.x - self.X0
        dY = c.y - self.Y0
        dZ = c.z - self.Z0
        c.x = -dX * self.sinlam0 + dY * self.coslam0
        c.y = (-dX * self.sinphi0 * self.coslam0
               - dY * self.sinphi0 * self.sinlam0 + dZ * self.cosphi0)
        c.z = (dX * self.cosphi0 * self.coslam0
               + dY * self.cosphi0 * self.sinlam0 + dZ * self.sinphi0)

    def _inv(self, c: Coords) -> None:
        x, y, z = c.x, c.y, c.z
        c.x = (self.X0 - x * self.sinlam0
               - y * self.sinphi0 * self.coslam0
               + z * self.cosphi0 * self.coslam0)
        c.y = (self.Y0 + x * self.coslam0
               - y * self.sinphi0 * self.sinlam0
               + z * self.cosphi0 * self.sinlam0)
        c.z = self.Z0 + y * self.cosphi0 + z * self.sinphi0
