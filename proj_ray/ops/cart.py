"""Geodetic <-> geocentric cartesian conversions.

`cart` (reference src/conversions/cart.cpp:139-239): forward is the
closed-form HM 5-27 formula; inverse is Bowring's method with the
reference's pole-safe branches (cart.cpp:186-236): normalized-to-unit-
ellipsoid arithmetic, x_phi<=0 clamp near the geocenter, and the
cosphi<1e-6 height branch using the geocentric radius.

`geocent` (src/conversions/geocent.cpp): 2D stub marking geocentric I/O —
the actual conversion runs in prepare/finalize via is_geocent.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import CARTESIAN, RADIANS, Operation, Params, register


def cart_fwd_core(op, c: Coords) -> None:
    """Geodetic (lam,phi,h radians/m) -> geocentric XYZ (meters), in place."""
    with np.errstate(all="ignore"):
        cosphi = np.cos(c.y)
        sinphi = np.sin(c.y)
        if op.es == 0:
            N = op.a
        else:
            N = op.a / np.sqrt(1 - op.es * sinphi * sinphi)
        x = (N + c.z) * cosphi * np.cos(c.x)
        y = (N + c.z) * cosphi * np.sin(c.x)
        z = (N * (1 - op.es) + c.z) * sinphi
    c.x, c.y, c.z = x, y, z


def cart_inv_core(op, c: Coords) -> None:
    """Geocentric XYZ -> geodetic, Bowring w/ reference pole-safe branches."""
    with np.errstate(all="ignore"):
        x_div_a = c.x * op.ra
        y_div_a = c.y * op.ra
        z_div_a = c.z * op.ra
        p_div_a = np.sqrt(x_div_a * x_div_a + y_div_a * y_div_a)
        b_div_a = 1 - op.ell.f
        p_b = p_div_a * b_div_a
        norm = np.sqrt(z_div_a * z_div_a + p_b * p_b)
        nz = norm != 0
        inv_norm = np.where(nz, 1.0 / np.where(nz, norm, 1.0), 0.0)
        cth = np.where(nz, p_b * inv_norm, 1.0)
        sth = np.where(nz, z_div_a * inv_norm, 0.0)
        y_phi = z_div_a + op.ell.e2s * b_div_a * sth * sth * sth
        x_phi = p_div_a - op.es * cth * cth * cth
        norm_phi = np.sqrt(y_phi * y_phi + x_phi * x_phi)
        npz = norm_phi != 0
        inv_np = np.where(npz, 1.0 / np.where(npz, norm_phi, 1.0), 0.0)
        cosphi = np.where(npz, x_phi * inv_np, 1.0)
        sinphi = np.where(npz, y_phi * inv_np, 0.0)
        phi = np.arctan(y_phi / np.where(x_phi == 0, np.nan, x_phi))
        # degenerate branch: x_phi <= 0 (very close to geocenter)
        deg = x_phi <= 0
        if np.any(deg):
            phi = np.where(deg, np.where(c.z >= 0, m.M_HALFPI, -m.M_HALFPI), phi)
            cosphi = np.where(deg, 0.0, cosphi)
            sinphi = np.where(deg, np.where(c.z >= 0, 1.0, -1.0), sinphi)
        lam = np.arctan2(y_div_a, x_div_a)
        # height
        polar = cosphi < 1e-6
        # geocentric radius (WP2 formulation, cart.cpp:119-137)
        c2 = cosphi * cosphi
        s2 = sinphi * sinphi
        ba2 = b_div_a * b_div_a
        ba2s2 = ba2 * s2
        r = op.a * np.sqrt((c2 + ba2 * ba2s2) / (c2 + ba2s2))
        if op.es == 0:
            N = np.full_like(phi, op.a)
        else:
            N = op.a / np.sqrt(1 - op.es * sinphi * sinphi)
        h_normal = op.a * p_div_a / np.where(polar, 1.0, cosphi) - N
        h_polar = np.abs(c.z) - r
        z_out = np.where(polar, h_polar, h_normal)
    c.x, c.y, c.z = lam, phi, z_out


@register
class Cart(Operation):
    name = "cart"
    _no_datum_helpers = True

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = CARTESIAN

    def _fwd(self, c: Coords) -> None:
        cart_fwd_core(self, c)

    def _inv(self, c: Coords) -> None:
        cart_inv_core(self, c)


@register
class Geocent(Operation):
    """Marker op: pipeline I/O is geocentric XYZ; conversion handled by
    prepare/finalize through is_geocent (reference geocent.cpp:33-61)."""

    name = "geocent"

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = CARTESIAN
        self.is_geocent = True
        self.x0 = 0.0
        self.y0 = 0.0

    def _fwd(self, c: Coords) -> None:
        pass  # x,y pass through; finalize applies cart fwd

    def _inv(self, c: Coords) -> None:
        pass
