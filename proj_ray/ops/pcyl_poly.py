"""Polynomial pseudocylindricals: Hatano, Natural Earth I/II, Patterson —
reference src/projections/{hatano,natearth,natearth2,patterson}.cpp.
All are spherical-only (setup forces es=0).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, register


@register
class Hatano(Operation):
    """Hatano asymmetrical equal area (hatano.cpp)."""

    name = "hatano"
    CN, CS = 2.67595, 2.43763
    RCN, RCS = 0.37369906014686373063, 0.41023453108141924738
    FYCN, FYCS = 1.75859, 1.93052
    RYCN, RYCS = 0.56863737426006061674, 0.51799515156538134803
    FXC, RXC = 0.85, 1.17647058823529411764
    ONETOL = 1.000001

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        phi = c.y.copy()
        cval = np.sin(phi) * np.where(phi < 0.0, self.CS, self.CN)
        for _ in range(20):
            th1 = (phi + np.sin(phi) - cval) / (1.0 + np.cos(phi))
            phi = phi - th1
            if np.nanmax(np.abs(th1), initial=0.0) < 1e-7:
                break
        phi = phi * 0.5
        c.x = self.FXC * c.x * np.cos(phi)
        c.y = np.sin(phi) * np.where(phi < 0.0, self.FYCS, self.FYCN)

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        th = y * np.where(y < 0.0, self.RYCS, self.RYCN)
        bad = np.abs(th) > self.ONETOL
        th = np.where(np.abs(th) > 1.0,
                      np.copysign(m.M_HALFPI, th), np.arcsin(np.clip(th, -1, 1)))
        with np.errstate(all="ignore"):
            lam = self.RXC * x / np.cos(th)
        th = th + th
        phi = (th + np.sin(th)) * np.where(y < 0.0, self.RCS, self.RCN)
        bad = bad | (np.abs(phi) > self.ONETOL)
        phi = np.where(np.abs(phi) > 1.0,
                       np.copysign(m.M_HALFPI, phi),
                       np.arcsin(np.clip(phi, -1, 1)))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


def _newton_lat(y, B, C, max_y, eps=1e-11):
    """Shared Newton latitude recovery for the poly pseudocylindricals.
    B(yc) is y(phi), C(yc) its derivative.  Returns (phi, bad)."""
    y = np.clip(y, -max_y, max_y)
    yc = y.copy()
    done = np.zeros(y.shape, dtype=bool)
    for _ in range(100):
        tol = (B(yc) - y) / C(yc)
        yc = np.where(done, yc, yc - tol)
        done = done | (np.abs(tol) < eps)
        if done.all():
            break
    return yc, ~done


@register
class Natearth(Operation):
    """Natural Earth (natearth.cpp)."""

    name = "natearth"
    A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
    B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
    MAX_Y = 0.8707 * 0.52 * np.pi

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _xscale(self, p2):
        A = self.A
        return A[0] + p2 * (A[1] + p2 * (A[2] + p2 * p2 * p2 * (A[3] + p2 * A[4])))

    def _fwd(self, c: Coords) -> None:
        B = self.B
        p2 = c.y * c.y
        p4 = p2 * p2
        c.x = c.x * self._xscale(p2)
        c.y = c.y * (B[0] + p2 * (B[1] + p4 * (B[2] + B[3] * p2 + B[4] * p4)))

    def _inv(self, c: Coords) -> None:
        B = self.B
        C = (B[0], 3 * B[1], 7 * B[2], 9 * B[3], 11 * B[4])

        def f(yc):
            y2 = yc * yc
            y4 = y2 * y2
            return yc * (B[0] + y2 * (B[1] + y4 * (B[2] + B[3] * y2 + B[4] * y4)))

        def fder(yc):
            y2 = yc * yc
            y4 = y2 * y2
            return C[0] + y2 * (C[1] + y4 * (C[2] + C[3] * y2 + C[4] * y4))

        phi, bad = _newton_lat(c.y, f, fder, self.MAX_Y)
        lam = c.x / self._xscale(phi * phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Natearth2(Operation):
    """Natural Earth II (natearth2.cpp)."""

    name = "natearth2"
    A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
    B = (1.01183, -0.02625, 0.01926, -0.00396)
    MAX_Y = 0.84719 * 0.535117535153096 * np.pi

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _xscale(self, p2):
        A = self.A
        p4 = p2 * p2
        p6 = p2 * p4
        return A[0] + A[1] * p2 + p6 * p6 * (A[2] + A[3] * p2 + A[4] * p4
                                             + A[5] * p6)

    def _fwd(self, c: Coords) -> None:
        B = self.B
        p2 = c.y * c.y
        p4 = p2 * p2
        c.x = c.x * self._xscale(p2)
        c.y = c.y * (B[0] + p4 * p4 * (B[1] + B[2] * p2 + B[3] * p4))

    def _inv(self, c: Coords) -> None:
        B = self.B
        C = (B[0], 9 * B[1], 11 * B[2], 13 * B[3])

        def f(yc):
            y2 = yc * yc
            y4 = y2 * y2
            return yc * (B[0] + y4 * y4 * (B[1] + B[2] * y2 + B[3] * y4))

        def fder(yc):
            y2 = yc * yc
            y4 = y2 * y2
            return C[0] + y4 * y4 * (C[1] + C[2] * y2 + C[3] * y4)

        phi, bad = _newton_lat(c.y, f, fder, self.MAX_Y)
        lam = c.x / self._xscale(phi * phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Patterson(Operation):
    """Patterson cylindrical (patterson.cpp)."""

    name = "patterson"
    K = (1.0148, 0.23185, -0.14499, 0.02406)
    MAX_Y = 1.790857183

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        K = self.K
        p2 = c.y * c.y
        c.y = c.y * (K[0] + p2 * p2 * (K[1] + p2 * (K[2] + K[3] * p2)))

    def _inv(self, c: Coords) -> None:
        K = self.K
        C = (K[0], 5.0 * K[1], 7.0 * K[2], 9.0 * K[3])

        def f(yc):
            y2 = yc * yc
            return yc * (K[0] + y2 * y2 * (K[1] + y2 * (K[2] + K[3] * y2)))

        def fder(yc):
            y2 = yc * yc
            return C[0] + y2 * y2 * (C[1] + y2 * (C[2] + C[3] * y2))

        phi, bad = _newton_lat(c.y, f, fder, self.MAX_Y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.y = np.where(bad, np.nan, phi)
