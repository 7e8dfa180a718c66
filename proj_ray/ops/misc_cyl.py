"""Long-tail cylindrical / pseudocylindrical / misc spherical
projections (one class per reference src/projections file; all
closed-form or small fixed-iteration spherical maps).

Sources: gall.cpp, mill.cpp, cc.cpp, collg.cpp, comill.cpp, crast.cpp,
denoy.cpp, fahey.cpp, lask.cpp, larr.cpp, gins8.cpp, wag2.cpp, wag3.cpp,
wag7.cpp, nell.cpp, nell_h.cpp, boggs.cpp, loxim.cpp, mbt_fps.cpp,
mbtfpp.cpp, mbtfpq.cpp, urm5.cpp, urmfps.cpp, times.cpp, tobmerc.cpp,
wink1.cpp, wink2.cpp, tcc.cpp, tcea.cpp, putp2..putp6.cpp, sts.cpp,
fouc_s.cpp, sconics.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register
from proj_ray.ops.newton import generic_inverse_2d

EPS10 = 1e-10


class _Sph(Operation):
    """Base for forced-spherical projections."""

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self._setup2(params)

    def _setup2(self, params: Params) -> None:
        pass


@register
class Gall(_Sph):
    name = "gall"
    _XF = 0.70710678118654752440
    _YF = 1.70710678118654752440

    def _fwd(self, c: Coords) -> None:
        c.x = self._XF * c.x
        c.y = self._YF * np.tan(0.5 * c.y)

    def _inv(self, c: Coords) -> None:
        c.x = c.x / self._XF
        c.y = 2.0 * np.arctan(c.y / self._YF)


@register
class Mill(_Sph):
    name = "mill"

    def _fwd(self, c: Coords) -> None:
        c.y = np.log(np.tan(m.M_FORTPI + c.y * 0.4)) * 1.25

    def _inv(self, c: Coords) -> None:
        c.y = 2.5 * (np.arctan(np.exp(0.8 * c.y)) - m.M_FORTPI)


@register
class Cc(_Sph):
    name = "cc"

    def _fwd(self, c: Coords) -> None:
        bad = np.abs(np.abs(c.y) - m.M_HALFPI) <= EPS10
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.y = np.where(bad, np.nan, np.tan(c.y))
        c.x = np.where(bad, np.nan, c.x)

    def _inv(self, c: Coords) -> None:
        c.y = np.arctan(c.y)


@register
class Collg(_Sph):
    name = "collg"
    _FXC = 1.12837916709551257390
    _FYC = 1.77245385090551602729

    def _fwd(self, c: Coords) -> None:
        y = 1.0 - np.sin(c.y)
        y = np.sqrt(np.maximum(y, 0.0))
        c.x = self._FXC * c.x * y
        c.y = self._FYC * (1.0 - y)

    def _inv(self, c: Coords) -> None:
        phi = c.y / self._FYC - 1.0
        phi = 1.0 - phi * phi
        bad = np.abs(phi) > 1.0000001
        phi = np.where(np.abs(phi) < 1.0, np.arcsin(np.clip(phi, -1, 1)),
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI))
        lam = 1.0 - np.sin(phi)
        with np.errstate(all="ignore"):
            lam = np.where(lam <= 0.0, 0.0,
                           c.x / (self._FXC * np.sqrt(
                               np.maximum(lam, 1e-300))))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Comill(_Sph):
    name = "comill"
    _K1, _K2, _K3 = 0.9902, 0.1604, -0.03054
    _MAX_Y = 0.6000207669862655 * np.pi

    def _fwd(self, c: Coords) -> None:
        p2 = c.y * c.y
        c.y = c.y * (self._K1 + p2 * (self._K2 + self._K3 * p2))

    def _inv(self, c: Coords) -> None:
        y = np.clip(c.y, -self._MAX_Y, self._MAX_Y)
        yc = y.copy()
        active = np.ones(len(c), dtype=bool)
        for _ in range(100):
            if not np.any(active):
                break
            y2 = yc * yc
            f = (yc * (self._K1 + y2 * (self._K2 + self._K3 * y2))) - y
            fder = self._K1 + y2 * (3 * self._K2 + 5 * self._K3 * y2)
            tol = f / fder
            yc = np.where(active, yc - tol, yc)
            active &= ~(np.abs(tol) < 1e-11)
        c.y = yc


@register
class Crast(_Sph):
    name = "crast"
    _XM = 0.97720502380583984317
    _RXM = 1.02332670794648848847
    _YM = 3.06998012383946546542
    _RYM = 0.32573500793527994772

    def _fwd(self, c: Coords) -> None:
        phi = c.y / 3.0
        c.x = self._XM * c.x * (2.0 * np.cos(phi + phi) - 1.0)
        c.y = self._YM * np.sin(phi)

    def _inv(self, c: Coords) -> None:
        phi = 3.0 * np.arcsin(np.clip(c.y * self._RYM, -1, 1))
        c.x = c.x * self._RXM / (2.0 * np.cos((phi + phi) / 3.0) - 1.0)
        c.y = phi


@register
class Denoy(_Sph):
    name = "denoy"
    _C0, _C1, _C3 = 0.95, -1.0 / 12, 1.0 / 600
    _D1, _D5 = 0.9, 0.03

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        al = np.abs(lam)
        c.x = lam * np.cos(
            (self._C0 + al * (self._C1 + al * al * self._C3))
            * (phi * (self._D1 + self._D5 * phi ** 4)))
        c.y = phi


@register
class Fahey(_Sph):
    name = "fahey"

    def _fwd(self, c: Coords) -> None:
        t = np.tan(0.5 * c.y)
        c.y = 1.819152 * t
        c.x = 0.819152 * c.x * m.asqrt(1 - t * t)

    def _inv(self, c: Coords) -> None:
        y = c.y / 1.819152
        phi = 2.0 * np.arctan(y)
        y = 1.0 - y * y
        with np.errstate(all="ignore"):
            c.x = np.where(np.abs(y) < 1e-6, 0.0,
                           c.x / (0.819152 * np.sqrt(np.abs(y))))
        c.y = phi


@register
class Lask(_Sph):
    name = "lask"

    def _fwd(self, c: Coords) -> None:
        l2 = c.x * c.x
        p2 = c.y * c.y
        x = c.x * (0.975534 + p2 * (-0.119161 + l2 * -0.0143059
                                    + p2 * -0.0547009))
        y = c.y * (1.00384 + l2 * (0.0802894 + p2 * -0.02855
                                   + l2 * 0.000199025)
                   + p2 * (0.0998909 + p2 * -0.0491032))
        c.x, c.y = x, y


@register
class Larr(_Sph):
    name = "larr"

    def _fwd(self, c: Coords) -> None:
        x = 0.5 * c.x * (1.0 + np.sqrt(np.cos(c.y)))
        y = c.y / (np.cos(0.5 * c.y) * np.cos(c.x / 6.0))
        c.x, c.y = x, y


@register
class Gins8(_Sph):
    name = "gins8"

    def _fwd(self, c: Coords) -> None:
        t = c.y * c.y
        y = c.y * (1.0 + t / 12.0)
        x = c.x * (1.0 - 0.162388 * t)
        t = c.x * c.x
        x = x * (0.87 - 0.000952426 * t * t)
        c.x, c.y = x, y


@register
class Wag2(_Sph):
    name = "wag2"
    _C_x, _C_y = 0.92483, 1.38725
    _C_p1, _C_p2 = 0.88022, 0.88550

    def _fwd(self, c: Coords) -> None:
        phi = m.aasin(self._C_p1 * np.sin(self._C_p2 * c.y))
        c.x = self._C_x * c.x * np.cos(phi)
        c.y = self._C_y * phi

    def _inv(self, c: Coords) -> None:
        phi = c.y / self._C_y
        c.x = c.x / (self._C_x * np.cos(phi))
        c.y = m.aasin(np.sin(phi) / self._C_p1) / self._C_p2


@register
class Wag3(_Sph):
    name = "wag3"

    def _setup2(self, params: Params) -> None:
        ts = params.r("lat_ts")
        self.C_x = float(np.cos(ts) / np.cos(2.0 * ts / 3.0))

    def _fwd(self, c: Coords) -> None:
        c.x = self.C_x * c.x * np.cos(2.0 / 3.0 * c.y)

    def _inv(self, c: Coords) -> None:
        c.x = c.x / (self.C_x * np.cos(2.0 / 3.0 * c.y))


@register
class Wag7(_Sph):
    name = "wag7"

    def _fwd(self, c: Coords) -> None:
        y = 0.90630778703664996 * np.sin(c.y)
        theta = np.arcsin(np.clip(y, -1, 1))
        ct = np.cos(theta)
        lam = c.x / 3.0
        x = 2.66723 * ct * np.sin(lam)
        D = 1.0 / np.sqrt(0.5 * (1 + ct * np.cos(lam)))
        c.x = x * D
        c.y = y * 1.24104 * D


@register
class Nell(_Sph):
    name = "nell"

    def _fwd(self, c: Coords) -> None:
        k = 2.0 * np.sin(c.y)
        p2 = c.y * c.y
        phi = c.y * (1.00371 + p2 * (-0.0935382 + p2 * -0.011412))
        active = np.ones(len(c), dtype=bool)
        for _ in range(10):
            V = (phi + np.sin(phi) - k) / (1.0 + np.cos(phi))
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-7)
            if not np.any(active):
                break
        c.x = 0.5 * c.x * (1.0 + np.cos(phi))
        c.y = phi

    def _inv(self, c: Coords) -> None:
        lam = 2.0 * c.x / (1.0 + np.cos(c.y))
        phi = m.aasin(0.5 * (c.y + np.sin(c.y)))
        c.x, c.y = lam, phi


@register
class NellH(_Sph):
    name = "nell_h"

    def _fwd(self, c: Coords) -> None:
        x = 0.5 * c.x * (1.0 + np.cos(c.y))
        y = 2.0 * (c.y - np.tan(0.5 * c.y))
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        p = 0.5 * c.y
        phi = np.zeros_like(c.y)
        active = np.ones(len(c), dtype=bool)
        for _ in range(9):
            cc_ = np.cos(0.5 * phi)
            V = (phi - np.tan(phi / 2) - p) / (1.0 - 0.5 / (cc_ * cc_))
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-7)
            if not np.any(active):
                break
        lam = np.where(active, 2.0 * c.x,
                       2.0 * c.x / (1.0 + np.cos(phi)))
        phi = np.where(active,
                       np.where(p < 0, -m.M_HALFPI, m.M_HALFPI), phi)
        c.x, c.y = lam, phi


@register
class Boggs(_Sph):
    name = "boggs"
    _FXC, _FXC2, _FYC = 2.00276, 1.11072, 0.49931

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        theta = phi.copy()
        at_pole = np.abs(np.abs(phi) - m.M_HALFPI) < 1e-7
        k = np.sin(theta) * m.M_PI
        active = ~at_pole
        for _ in range(20):
            th1 = (theta + np.sin(theta) - k) / (1.0 + np.cos(theta))
            theta = np.where(active, theta - th1, theta)
            active &= ~(np.abs(th1) < 1e-7)
            if not np.any(active):
                break
        theta = theta * 0.5
        with np.errstate(all="ignore"):
            x = np.where(at_pole, 0.0,
                         self._FXC * lam / (1.0 / np.cos(phi)
                                            + self._FXC2 / np.cos(theta)))
        c.x = x
        c.y = self._FYC * (phi + np.sqrt(2.0) * np.sin(theta))


@register
class Loxim(_Sph):
    name = "loxim"
    _EPS = 1e-8

    def _setup2(self, params: Params) -> None:
        self.phi1 = params.r("lat_1")
        self.cosphi1 = float(np.cos(self.phi1))
        if self.cosphi1 < self._EPS:
            raise ProjError("|lat_1| should be < 90")
        self.tanphi1 = float(np.tan(m.M_FORTPI + 0.5 * self.phi1))

    def _fwd(self, c: Coords) -> None:
        y = c.y - self.phi1
        small = np.abs(y) < self._EPS
        xx = m.M_FORTPI + 0.5 * c.y
        deg = (np.abs(xx) < self._EPS) \
            | (np.abs(np.abs(xx) - m.M_HALFPI) < self._EPS)
        with np.errstate(all="ignore"):
            x = np.where(small, c.x * self.cosphi1,
                         np.where(deg, 0.0,
                                  c.x * y / np.log(np.tan(xx)
                                                   / self.tanphi1)))
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        phi = c.y + self.phi1
        small = np.abs(c.y) < self._EPS
        ll = m.M_FORTPI + 0.5 * phi
        deg = (np.abs(ll) < self._EPS) \
            | (np.abs(np.abs(ll) - m.M_HALFPI) < self._EPS)
        with np.errstate(all="ignore"):
            lam = np.where(small, c.x / self.cosphi1,
                           np.where(deg, 0.0,
                                    c.x * np.log(np.tan(ll) / self.tanphi1)
                                    / c.y))
        c.x, c.y = lam, phi


@register
class MbtFps(_Sph):
    name = "mbt_fps"
    _C1, _C2, _C3 = 0.45503, 1.36509, 1.41546
    _C_x, _C_y = 0.22248, 1.44492

    def _fwd(self, c: Coords) -> None:
        phi = c.y.copy()
        k = self._C3 * np.sin(phi)
        active = np.ones(len(c), dtype=bool)
        for _ in range(10):
            t = phi / self._C2
            V = (self._C1 * np.sin(t) + np.sin(phi) - k) \
                / (np.cos(t) / 3.0 + np.cos(phi))
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-7)
            if not np.any(active):
                break
        t = phi / self._C2
        c.x = self._C_x * c.x * (1.0 + 3.0 * np.cos(phi) / np.cos(t))
        c.y = self._C_y * np.sin(t)

    def _inv(self, c: Coords) -> None:
        t = m.aasin(c.y / self._C_y)
        phi = self._C2 * t
        c.x = c.x / (self._C_x * (1.0 + 3.0 * np.cos(phi) / np.cos(t)))
        c.y = m.aasin((self._C1 * np.sin(t) + np.sin(phi)) / self._C3)


@register
class Mbtfpp(_Sph):
    name = "mbtfpp"
    _CSy = 0.95257934441568037152
    _FXC = 0.92582009977255146156
    _FYC = 3.40168025708304504493

    def _fwd(self, c: Coords) -> None:
        phi = np.arcsin(np.clip(self._CSy * np.sin(c.y), -1, 1))
        c.x = self._FXC * c.x * (2.0 * np.cos(2.0 / 3 * phi) - 1.0)
        c.y = self._FYC * np.sin(phi / 3.0)

    def _inv(self, c: Coords) -> None:
        ONEEPS = 1.0000001
        phi = c.y / self._FYC
        bad = np.abs(phi) > ONEEPS
        phi = np.where(np.abs(phi) >= 1.0,
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        phi = phi * 3.0
        lam = c.x / (self._FXC * (2.0 * np.cos(2.0 / 3 * phi) - 1.0))
        phi = np.sin(phi) / self._CSy
        bad |= np.abs(phi) > ONEEPS
        phi = np.where(np.abs(phi) >= 1.0,
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Mbtfpq(_Sph):
    name = "mbtfpq"
    _C = 1.70710678118654752440
    _RC = 0.58578643762690495119
    _FYC = 1.87475828462269495505
    _RYC = 0.53340209679417701685
    _FXC = 0.31245971410378249250
    _RXC = 3.20041258076506210122

    def _fwd(self, c: Coords) -> None:
        phi = c.y.copy()
        k = self._C * np.sin(phi)
        active = np.ones(len(c), dtype=bool)
        for _ in range(20):
            th1 = (np.sin(0.5 * phi) + np.sin(phi) - k) \
                / (0.5 * np.cos(0.5 * phi) + np.cos(phi))
            phi = np.where(active, phi - th1, phi)
            active &= ~(np.abs(th1) < 1e-7)
            if not np.any(active):
                break
        c.x = self._FXC * c.x * (1.0 + 2.0 * np.cos(phi)
                                 / np.cos(0.5 * phi))
        c.y = self._FYC * np.sin(0.5 * phi)

    def _inv(self, c: Coords) -> None:
        ONETOL = 1.000001
        phi = self._RYC * c.y
        bad = np.abs(phi) > ONETOL
        over = (np.abs(phi) > 1.0) & ~bad
        t = np.where(over, np.where(phi < 0, -1.0, 1.0), phi)
        phi = np.where(over, np.where(phi < 0, -m.M_PI, m.M_PI),
                       2.0 * np.arcsin(np.clip(phi, -1, 1)))
        lam = self._RXC * c.x / (1.0 + 2.0 * np.cos(phi)
                                 / np.cos(0.5 * phi))
        phi = self._RC * (t + np.sin(phi))
        bad |= np.abs(phi) > ONETOL
        phi = np.where(np.abs(phi) > 1.0,
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Urm5(_Sph):
    name = "urm5"

    def _setup2(self, params: Params) -> None:
        if not params.has("n"):
            raise ProjError("urm5: missing n")
        self.n = params.f("n")
        if not (0.0 < self.n <= 1.0):
            raise ProjError("urm5: n should be in ]0,1]")
        self.q3 = params.f("q") / 3.0
        alpha = params.r("alpha")
        t = self.n * np.sin(alpha)
        denom = np.sqrt(1.0 - t * t)
        if denom == 0:
            raise ProjError("urm5: n*sin(|alpha|) should be < 1")
        self.m_ = float(np.cos(alpha) / denom)
        self.rmn = 1.0 / (self.m_ * self.n)

    def _fwd(self, c: Coords) -> None:
        phi = m.aasin(self.n * np.sin(c.y))
        t = phi * phi
        c.x = self.m_ * c.x * np.cos(phi)
        c.y = phi * (1.0 + t * self.q3) * self.rmn


class _Urmfps(_Sph):
    _C_x = 0.8773826753
    _Cy = 1.139753528477
    n: float

    def _fwd(self, c: Coords) -> None:
        phi = m.aasin(self.n * np.sin(c.y))
        c.x = self._C_x * c.x * np.cos(phi)
        c.y = (self._Cy / self.n) * phi

    def _inv(self, c: Coords) -> None:
        y = c.y / (self._Cy / self.n)
        phi = m.aasin(np.sin(y) / self.n)
        c.x = c.x / (self._C_x * np.cos(y))
        c.y = phi


@register
class Urmfps(_Urmfps):
    name = "urmfps"

    def _setup2(self, params: Params) -> None:
        if not params.has("n"):
            raise ProjError("urmfps: missing n")
        self.n = params.f("n")
        if not (0.0 < self.n <= 1.0):
            raise ProjError("urmfps: n should be in ]0,1]")


@register
class Wag1(_Urmfps):
    name = "wag1"

    def _setup2(self, params: Params) -> None:
        self.n = 0.8660254037844386467637231707


@register
class Times(_Sph):
    name = "times"

    def _fwd(self, c: Coords) -> None:
        T = np.tan(c.y / 2.0)
        S = np.sin(m.M_FORTPI * T)
        c.x = c.x * (0.74482 - 0.34588 * S * S)
        c.y = 1.70711 * T

    def _inv(self, c: Coords) -> None:
        T = c.y / 1.70711
        S = np.sin(m.M_FORTPI * T)
        c.x = c.x / (0.74482 - 0.34588 * S * S)
        c.y = 2 * np.arctan(T)


@register
class Tobmerc(Operation):
    name = "tobmerc"

    def setup(self, params: Params) -> None:
        pass  # keeps ellipsoid but formulas are spherical scaled by k0

    def _fwd(self, c: Coords) -> None:
        bad = np.abs(c.y) >= m.M_HALFPI
        cosphi = np.cos(c.y)
        x = self.k0 * c.x * cosphi * cosphi
        y = self.k0 * np.arcsinh(np.tan(c.y))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        phi = np.arctan(np.sinh(c.y / self.k0))
        cosphi = np.cos(phi)
        c.x = c.x / self.k0 / (cosphi * cosphi)
        c.y = phi


@register
class Wink1(_Sph):
    name = "wink1"

    def _setup2(self, params: Params) -> None:
        self.cosphi1 = float(np.cos(params.r("lat_ts")))

    def _fwd(self, c: Coords) -> None:
        c.x = 0.5 * c.x * (self.cosphi1 + np.cos(c.y))

    def _inv(self, c: Coords) -> None:
        c.x = 2.0 * c.x / (self.cosphi1 + np.cos(c.y))


@register
class Wink2(_Sph):
    name = "wink2"

    def _setup2(self, params: Params) -> None:
        self.cosphi1 = float(np.cos(params.r("lat_1")))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y.copy()
        ybase = phi * (2.0 / m.M_PI)
        k = m.M_PI * np.sin(phi)
        phi = phi * 1.8
        active = np.ones(len(c), dtype=bool)
        for _ in range(10):
            V = (phi + np.sin(phi) - k) / (1.0 + np.cos(phi))
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-7)
            if not np.any(active):
                break
        phi = np.where(active,
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI),
                       phi * 0.5)
        c.x = 0.5 * lam * (np.cos(phi) + self.cosphi1)
        c.y = m.M_FORTPI * (np.sin(phi) + ybase)

    def _inv(self, c: Coords) -> None:
        lam, phi, done = generic_inverse_2d(self, c.x, c.y, c.x.copy(),
                                            c.y.copy(), 1e-10)
        c.set_error(~done, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(done, lam, np.nan)
        c.y = np.where(done, phi, np.nan)


@register
class Tcc(_Sph):
    name = "tcc"

    def _fwd(self, c: Coords) -> None:
        b = np.cos(c.y) * np.sin(c.x)
        bt = 1.0 - b * b
        bad = bt < EPS10
        with np.errstate(all="ignore"):
            x = b / np.sqrt(np.where(bad, np.nan, bt))
        y = np.arctan2(np.tan(c.y), np.cos(c.x))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = x, np.where(bad, np.nan, y)


@register
class Tcea(_Sph):
    name = "tcea"

    def _fwd(self, c: Coords) -> None:
        x = np.cos(c.y) * np.sin(c.x) / self.k0
        y = self.k0 * (np.arctan2(np.tan(c.y), np.cos(c.x)) - self.phi0)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        y = c.y / self.k0 + self.phi0
        x = c.x * self.k0
        t = np.sqrt(np.maximum(1.0 - x * x, 0.0))
        c.y = np.arcsin(np.clip(t * np.sin(y), -1, 1))
        c.x = np.arctan2(x, t * np.cos(y))


@register
class Putp2(_Sph):
    name = "putp2"
    _C_x, _C_y, _C_p = 1.89490, 1.71848, 0.6141848493043784

    def _fwd(self, c: Coords) -> None:
        phi = c.y.copy()
        p = self._C_p * np.sin(phi)
        p2 = phi * phi
        phi = phi * (0.615709 + p2 * (0.00909953 + p2 * 0.0046292))
        active = np.ones(len(c), dtype=bool)
        for _ in range(10):
            co = np.cos(phi)
            s = np.sin(phi)
            V = (phi + s * (co - 1.0) - p) \
                / (1.0 + co * (co - 1.0) - s * s)
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-10)
            if not np.any(active):
                break
        phi = np.where(active,
                       np.where(phi < 0, -1.0471975511965977,
                                1.0471975511965977), phi)
        c.x = self._C_x * c.x * (np.cos(phi) - 0.5)
        c.y = self._C_y * np.sin(phi)

    def _inv(self, c: Coords) -> None:
        phi = m.aasin(c.y / self._C_y)
        co = np.cos(phi)
        c.x = c.x / (self._C_x * (co - 0.5))
        c.y = m.aasin((phi + np.sin(phi) * (co - 1.0)) / self._C_p)


class _Putp3Base(_Sph):
    A: float
    _C = 0.79788456

    def _fwd(self, c: Coords) -> None:
        c.x = self._C * c.x * (1.0 - self.A * c.y * c.y)
        c.y = self._C * c.y

    def _inv(self, c: Coords) -> None:
        phi = c.y / self._C
        c.x = c.x / (self._C * (1.0 - self.A * phi * phi))
        c.y = phi


@register
class Putp3(_Putp3Base):
    name = "putp3"

    def _setup2(self, params: Params) -> None:
        self.A = 4.0 * 0.1013211836


@register
class Putp3p(_Putp3Base):
    name = "putp3p"

    def _setup2(self, params: Params) -> None:
        self.A = 2.0 * 0.1013211836


class _Putp4pBase(_Sph):
    C_x: float
    C_y: float

    def _fwd(self, c: Coords) -> None:
        phi = m.aasin(0.883883476 * np.sin(c.y))
        x = self.C_x * c.x * np.cos(phi)
        phi = phi / 3.0
        c.x = x / np.cos(phi)
        c.y = self.C_y * np.sin(phi)

    def _inv(self, c: Coords) -> None:
        phi = m.aasin(c.y / self.C_y)
        lam = c.x * np.cos(phi) / self.C_x
        phi = phi * 3.0
        c.x = lam / np.cos(phi)
        c.y = m.aasin(1.13137085 * np.sin(phi))


@register
class Putp4p(_Putp4pBase):
    name = "putp4p"

    def _setup2(self, params: Params) -> None:
        self.C_x = 0.874038744
        self.C_y = 3.883251825


@register
class Weren(_Putp4pBase):
    name = "weren"

    def _setup2(self, params: Params) -> None:
        self.C_x = 1.0
        self.C_y = 4.442882938


class _Putp5Base(_Sph):
    A: float
    B: float
    _C = 1.01346
    _D = 1.2158542

    def _fwd(self, c: Coords) -> None:
        c.x = self._C * c.x * (self.A - self.B
                               * np.sqrt(1.0 + self._D * c.y * c.y))
        c.y = self._C * c.y

    def _inv(self, c: Coords) -> None:
        phi = c.y / self._C
        c.x = c.x / (self._C * (self.A - self.B
                                * np.sqrt(1.0 + self._D * phi * phi)))
        c.y = phi


@register
class Putp5(_Putp5Base):
    name = "putp5"

    def _setup2(self, params: Params) -> None:
        self.A, self.B = 2.0, 1.0


@register
class Putp5p(_Putp5Base):
    name = "putp5p"

    def _setup2(self, params: Params) -> None:
        self.A, self.B = 1.5, 0.5


class _Putp6Base(_Sph):
    C_x: float
    C_y: float
    A: float
    B: float
    D: float

    def _fwd(self, c: Coords) -> None:
        phi = c.y.copy()
        p = self.B * np.sin(phi)
        phi = phi * 1.10265779
        active = np.ones(len(c), dtype=bool)
        for _ in range(10):
            r = np.sqrt(1.0 + phi * phi)
            V = ((self.A - r) * phi - np.log(phi + r) - p) \
                / (self.A - 2.0 * r)
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-10)
            if not np.any(active):
                break
        phi = np.where(active,
                       np.where(p < 0, -1.732050807568877,
                                1.732050807568877), phi)
        r = np.sqrt(1.0 + phi * phi)
        c.x = self.C_x * c.x * (self.D - r)
        c.y = self.C_y * phi

    def _inv(self, c: Coords) -> None:
        phi = c.y / self.C_y
        r = np.sqrt(1.0 + phi * phi)
        c.x = c.x / (self.C_x * (self.D - r))
        c.y = m.aasin(((self.A - r) * phi - np.log(phi + r)) / self.B)


@register
class Putp6(_Putp6Base):
    name = "putp6"

    def _setup2(self, params: Params) -> None:
        self.C_x, self.C_y = 1.01346, 0.91910
        self.A, self.B, self.D = 4.0, 2.1471437182129378784, 2.0


@register
class Putp6p(_Putp6Base):
    name = "putp6p"

    def _setup2(self, params: Params) -> None:
        self.C_x, self.C_y = 0.44329, 0.80404
        self.A, self.B, self.D = 6.0, 5.61125, 3.0


# ---------------------------------------------------------------------------
# sts family (kav5, qua_aut, fouc, mbt_s) + fouc_s
# ---------------------------------------------------------------------------


class _Sts(_Sph):
    p: float
    q: float
    tan_mode: bool

    def _setup_sts(self, p, q, mode):
        self.C_x = q / p
        self.C_y = p
        self.C_p = 1 / q
        self.tan_mode = mode

    def _fwd(self, c: Coords) -> None:
        x = self.C_x * c.x * np.cos(c.y)
        y = self.C_y
        phi = c.y * self.C_p
        cphi = np.cos(phi)
        if self.tan_mode:
            x = x * cphi * cphi
            y = y * np.tan(phi)
        else:
            x = x / cphi
            y = y * np.sin(phi)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        y = c.y / self.C_y
        phi = np.arctan(y) if self.tan_mode else m.aasin(y)
        cphi = np.cos(phi)
        phi = phi / self.C_p
        lam = c.x / (self.C_x * np.cos(phi))
        if self.tan_mode:
            lam = lam / (cphi * cphi)
        else:
            lam = lam * cphi
        c.x, c.y = lam, phi


@register
class Fouc(_Sts):
    name = "fouc"

    def _setup2(self, params: Params) -> None:
        self._setup_sts(2.0, 2.0, True)


@register
class Kav5(_Sts):
    name = "kav5"

    def _setup2(self, params: Params) -> None:
        self._setup_sts(1.50488, 1.35439, False)


@register
class QuaAut(_Sts):
    name = "qua_aut"

    def _setup2(self, params: Params) -> None:
        self._setup_sts(2.0, 2.0, False)


@register
class MbtS(_Sts):
    name = "mbt_s"

    def _setup2(self, params: Params) -> None:
        self._setup_sts(1.48875, 1.36509, False)


@register
class FoucS(_Sph):
    name = "fouc_s"

    def _setup2(self, params: Params) -> None:
        self.n = params.f("n")
        if self.n < 0.0 or self.n > 1.0:
            raise ProjError("fouc_s: n should be in [0,1]")
        self.n1 = 1.0 - self.n

    def _fwd(self, c: Coords) -> None:
        t = np.cos(c.y)
        c.x = c.x * t / (self.n + self.n1 * t)
        c.y = self.n * c.y + self.n1 * np.sin(c.y)

    def _inv(self, c: Coords) -> None:
        if self.n != 0.0:
            phi = c.y.copy()
            active = np.ones(len(c), dtype=bool)
            for _ in range(10):
                V = (self.n * phi + self.n1 * np.sin(phi) - c.y) \
                    / (self.n + self.n1 * np.cos(phi))
                phi = np.where(active, phi - V, phi)
                active &= ~(np.abs(V) < 1e-7)
                if not np.any(active):
                    break
            phi = np.where(active,
                           np.where(c.y < 0, -m.M_HALFPI, m.M_HALFPI), phi)
        else:
            phi = m.aasin(c.y)
        V = np.cos(phi)
        c.x = c.x * (self.n + self.n1 * V) / V
        c.y = phi


# ---------------------------------------------------------------------------
# Simple conics (euler, murd1-3, pconic, tissot, vitk1)
# ---------------------------------------------------------------------------

EULER, MURD1, MURD2, MURD3, PCONIC, TISSOT, VITK1 = range(7)


class _SConic(_Sph):
    ctype: int

    def _setup2(self, params: Params) -> None:
        if not (params.has("lat_1") and params.has("lat_2")):
            raise ProjError("lat_1 and lat_2 must be specified")
        p1 = params.r("lat_1")
        p2 = params.r("lat_2")
        self.sig = 0.5 * (p2 + p1)
        del_ = 0.5 * (p2 - p1)
        if abs(del_) < 1e-10 or abs(self.sig) < 1e-10:
            raise ProjError("|lat_1 - lat_2| and |lat_1 + lat_2| "
                            "should be > 0")
        t = self.ctype
        sig, phi0 = self.sig, self.phi0
        if t == TISSOT:
            self.n = np.sin(sig)
            cs = np.cos(del_)
            self.rho_c = self.n / cs + cs / self.n
            self.rho_0 = np.sqrt((self.rho_c - 2 * np.sin(phi0)) / self.n)
        elif t == MURD1:
            self.rho_c = np.sin(del_) / (del_ * np.tan(sig)) + sig
            self.rho_0 = self.rho_c - phi0
            self.n = np.sin(sig)
        elif t == MURD2:
            cs = np.sqrt(np.cos(del_))
            self.rho_c = cs / np.tan(sig)
            self.rho_0 = self.rho_c + np.tan(sig - phi0)
            self.n = np.sin(sig) * cs
        elif t == MURD3:
            self.rho_c = del_ / (np.tan(sig) * np.tan(del_)) + sig
            self.rho_0 = self.rho_c - phi0
            self.n = np.sin(sig) * np.sin(del_) * np.tan(del_) \
                / (del_ * del_)
        elif t == EULER:
            self.n = np.sin(sig) * np.sin(del_) / del_
            del_ = del_ * 0.5
            self.rho_c = del_ / (np.tan(del_) * np.tan(sig)) + sig
            self.rho_0 = self.rho_c - phi0
        elif t == PCONIC:
            self.n = np.sin(sig)
            self.c2 = np.cos(del_)
            self.c1 = 1.0 / np.tan(sig)
            dd = phi0 - sig
            if abs(dd) - 1e-10 >= m.M_HALFPI:
                raise ProjError("|lat_0 - 0.5*(lat_1+lat_2)| should be < 90")
            self.rho_0 = self.c2 * (self.c1 - np.tan(dd))
        else:  # VITK1
            cs = np.tan(del_)
            self.n = cs * np.sin(sig) / del_
            self.rho_c = del_ / (cs * np.tan(sig)) + sig
            self.rho_0 = self.rho_c - phi0

    def _fwd(self, c: Coords) -> None:
        if self.ctype == MURD2:
            rho = self.rho_c + np.tan(self.sig - c.y)
        elif self.ctype == PCONIC:
            rho = self.c2 * (self.c1 - np.tan(c.y - self.sig))
        else:
            rho = self.rho_c - c.y
        lam = c.x * self.n
        c.x = rho * np.sin(lam)
        c.y = self.rho_0 - rho * np.cos(lam)

    def _inv(self, c: Coords) -> None:
        x = c.x.copy()
        y = self.rho_0 - c.y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        lam = np.arctan2(x, y) / self.n
        if self.ctype == PCONIC:
            phi = np.arctan(self.c1 - rho / self.c2) + self.sig
        elif self.ctype == MURD2:
            phi = self.sig - np.arctan(rho - self.rho_c)
        else:
            phi = self.rho_c - rho
        c.x, c.y = lam, phi


def _make_sconic(nm, t):
    cls = type(nm.capitalize(), (_SConic,), {"name": nm, "ctype": t})
    return register(cls)


Euler = _make_sconic("euler", EULER)
Murd1 = _make_sconic("murd1", MURD1)
Murd2 = _make_sconic("murd2", MURD2)
Murd3 = _make_sconic("murd3", MURD3)
Pconic = _make_sconic("pconic", PCONIC)
Tissot = _make_sconic("tissot", TISSOT)
Vitk1 = _make_sconic("vitk1", VITK1)
