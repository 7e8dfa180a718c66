"""Molodensky datum shift, standard + abridged
(reference src/transformations/molodensky.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import RADIANS, Operation, Params, ProjError, register


def _RN(a, es, phi):
    s = np.sin(phi)
    if es == 0:
        return np.full_like(np.asarray(phi, dtype=np.float64), a)
    return a / np.sqrt(1 - es * s * s)


def _RM(a, es, phi):
    phi = np.asarray(phi, dtype=np.float64)
    s = np.sin(phi)
    if es == 0:
        return np.full_like(phi, a)
    out = (a * (1 - es)) / (1 - es * s * s) ** 1.5
    out = np.where(phi == 0, a * (1 - es), out)
    out = np.where(np.abs(phi) == m.M_HALFPI, a / np.sqrt(1 - es), out)
    return out


@register
class Molodensky(Operation):
    name = "molodensky"

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS
        for key in ("dx", "dy", "dz", "da", "df"):
            if not params.has(key):
                raise ProjError(f"molodensky: missing {key}")
        self.dx = params.f("dx")
        self.dy = params.f("dy")
        self.dz = params.f("dz")
        self.da = params.f("da")
        self.df = params.f("df")
        self.abridged = params.b("abridged")

    def _deltas(self, lam, phi, z):
        slam = np.sin(lam)
        clam = np.cos(lam)
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        dx, dy, dz = self.dx, self.dy, self.dz
        da, df = self.da, self.df
        a, f, es = self.a, self.ell.f, self.es
        bad = np.zeros(np.shape(lam), dtype=bool)
        if self.abridged:
            adffda = a * df + f * da
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + adffda * np.sin(2 * phi))
            dphi = dphi / _RM(a, es, phi)
            dlam = -dx * slam + dy * clam
            denom = _RN(a, es, phi) * cphi
            bad |= denom == 0.0
            dlam = dlam / np.where(denom == 0, np.nan, denom)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi - da
                  + adffda * sphi * sphi)
        else:
            rho = _RM(a, es, phi)
            nu = _RN(a, es, phi)
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + (nu * es * sphi * cphi * da) / a
                    + sphi * cphi * (rho / (1 - f) + nu * (1 - f)) * df)
            denom1 = rho + z
            bad |= denom1 == 0.0
            dphi = dphi / np.where(denom1 == 0, np.nan, denom1)
            denom2 = (nu + z) * cphi
            bad |= denom2 == 0.0
            dlam = (-dx * slam + dy * clam) / np.where(denom2 == 0, np.nan,
                                                      denom2)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  - (a / nu) * da + nu * (1 - f) * sphi * sphi * df)
        return dlam, dphi, dh, bad

    def _fwd(self, c: Coords) -> None:
        dlam, dphi, dh, bad = self._deltas(c.x, c.y, c.z)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = c.x + dlam
        c.y = c.y + dphi
        c.z = c.z + dh

    def _inv(self, c: Coords) -> None:
        dlam, dphi, dh, bad = self._deltas(c.x, c.y, c.z)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = c.x - dlam
        c.y = c.y - dphi
        c.z = c.z - dh
