"""Miscellaneous spherical projections: van der Grinten I-IV, Hammer,
Aitoff/Winkel Tripel, August, Bacon/Apian/Ortelius, Lagrange, Nicolosi,
Bertin 1953 (reference src/projections/{vandg,vandg2,vandg4,hammer,
aitoff,august,bacon,lagrng,nicol,bertin1953}.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

TOL = 1e-10
THIRD = 1.0 / 3
PISQ = np.pi * np.pi
TPISQ = 2 * PISQ
HPISQ = 0.5 * PISQ
TWO_D_PI = 2.0 / np.pi


class _Sph(Operation):
    def setup(self, params: Params) -> None:
        self.es = 0.0
        self._setup2(params)

    def _setup2(self, params: Params) -> None:
        pass


@register
class Vandg(_Sph):
    name = "vandg"

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        p2 = np.abs(phi / m.M_HALFPI)
        bad = (p2 - TOL) > 1.0
        p2 = np.minimum(p2, 1.0)
        flat = np.abs(phi) <= TOL
        merid = (np.abs(lam) <= TOL) | (np.abs(p2 - 1.0) < TOL)
        sign = np.where(self.over & (np.abs(lam) > np.pi), -1.0, 1.0)
        with np.errstate(all="ignore"):
            al = 0.5 * sign * np.abs(np.pi / lam - lam / np.pi)
            al2 = al * al
            g = np.sqrt(np.maximum(1.0 - p2 * p2, 0.0))
            g = g / (p2 + g - 1.0)
            g2 = g * g
            P2 = (g * (2.0 / p2 - 1.0)) ** 2
            xr = g - P2
            gg = P2 + al2
            x = np.pi * np.abs(
                al * xr + np.sqrt(np.maximum(al2 * xr * xr
                                             - gg * (g2 - P2), 0.0))) / gg
            x = np.where(lam < 0, -x, x)
            yq = np.abs(x / np.pi)
            yq = 1.0 - yq * (yq + 2.0 * al)
            ybad = yq < -TOL
            y = np.sqrt(np.maximum(yq, 0.0)) * np.where(phi < 0, -np.pi,
                                                        np.pi)
            y_m = np.pi * np.tan(0.5 * np.arcsin(np.clip(p2, -1, 1)))
            y_m = np.where(phi < 0, -y_m, y_m)
        x = np.where(flat, lam, np.where(merid, 0.0, x))
        y = np.where(flat, 0.0, np.where(merid, y_m, y))
        bad |= (~flat) & (~merid) & ybad
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        x2 = x * x
        ay = np.abs(y)
        flat = ay < TOL
        with np.errstate(all="ignore"):
            # flat (equator) branch
            t_f = x2 * x2 + TPISQ * (x2 + HPISQ)
            lam_f = np.where(np.abs(x) <= TOL, 0.0,
                             0.5 * (x2 - PISQ + np.sqrt(t_f)) / x)
            # general branch (Snyder 29-11..29-18)
            y2 = y * y
            r = x2 + y2
            r2 = r * r
            c1 = -np.pi * ay * (r + PISQ)
            c3 = r2 + m.M_TWOPI * (ay * r + np.pi
                                   * (y2 + np.pi * (ay + m.M_HALFPI)))
            c2 = c1 + PISQ * (r - 3.0 * y2)
            c0 = np.pi * ay
            c2 = c2 / c3
            al = c1 / c3 - THIRD * c2 * c2
            mm = 2.0 * np.sqrt(np.maximum(-THIRD * al, 0.0))
            d = (2.0 / 27) * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
            al_mul_m = al * mm
            bad = np.abs(al_mul_m) < 1e-16
            d = 3.0 * d / np.where(bad, np.nan, al_mul_m)
            t = np.abs(d)
            bad |= (t - TOL) > 1.0
            dd = np.where(t > 1.0, np.where(d > 0, 0.0, np.pi),
                          np.arccos(np.clip(d, -1, 1)))
            dd = np.where(r > PISQ, m.M_TWOPI - dd, dd)
            phi_g = np.pi * (mm * np.cos(dd * THIRD + 4 * np.pi / 3)
                             - THIRD * c2)
            phi_g = np.where(y < 0, -phi_g, phi_g)
            tt = r2 + TPISQ * (x2 - y2 + HPISQ)
            lam_g = np.where(np.abs(x) <= TOL, 0.0,
                             0.5 * (r - PISQ + np.where(tt <= 0, 0.0,
                                                        np.sqrt(
                                                            np.maximum(
                                                                tt, 0))))
                             / x)
        lam = np.where(flat, lam_f, lam_g)
        phi = np.where(flat, 0.0, phi_g)
        bad = bad & ~flat
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


class _Vandg2Base(_Sph):
    vdg3: bool

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        bt = np.abs(TWO_D_PI * phi)
        ct = np.sqrt(np.maximum(1.0 - bt * bt, 0.0))
        merid = np.abs(lam) < TOL
        with np.errstate(all="ignore"):
            at = 0.5 * np.abs(np.pi / lam - lam / np.pi)
            if self.vdg3:
                x1 = bt / (1.0 + ct)
                x = np.pi * (np.sqrt(at * at + 1.0 - x1 * x1) - at)
                y = np.pi * x1
            else:
                x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) \
                    / (1.0 + at * at * bt * bt)
                x = np.pi * x1
                y = np.pi * np.sqrt(np.maximum(
                    1.0 - x1 * (x1 + 2.0 * at) + TOL, 0.0))
            x = np.where(lam < 0, -x, x)
            y = np.where(phi < 0, -y, y)
            y_m = np.pi * np.where(phi < 0, -bt, bt) / (1.0 + ct)
        c.x = np.where(merid, 0.0, x)
        c.y = np.where(merid, y_m, y)


@register
class Vandg2(_Vandg2Base):
    name = "vandg2"
    vdg3 = False


@register
class Vandg3(_Vandg2Base):
    name = "vandg3"
    vdg3 = True


@register
class Vandg4(_Sph):
    name = "vandg4"

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        flat = np.abs(phi) < TOL
        merid = (np.abs(lam) < TOL) \
            | (np.abs(np.abs(phi) - m.M_HALFPI) < TOL)
        with np.errstate(all="ignore"):
            bt = np.abs(TWO_D_PI * phi)
            bt2 = bt * bt
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) \
                / (bt2 * (bt - 1.0))
            ct2 = ct * ct
            dt = TWO_D_PI * lam
            dt = dt + 1.0 / dt
            dt = np.sqrt(np.maximum(dt * dt - 4.0, 0.0))
            dt = np.where((np.abs(lam) - m.M_HALFPI) < 0.0, -dt, dt)
            dt2 = dt * dt
            x1 = (bt + ct) ** 2
            t = bt + 3.0 * ct
            ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
                bt2 * (t * t + 4.0 * ct2)
                + ct2 * (12.0 * bt * ct + 4.0 * ct2))
            x1v = (dt * (x1 + ct2 - 1.0)
                   + 2.0 * np.sqrt(np.maximum(ft, 0.0))) / (4.0 * x1 + dt2)
            x = m.M_HALFPI * x1v
            y = m.M_HALFPI * np.sqrt(np.maximum(
                1.0 + dt * np.abs(x1v) - x1v * x1v, 0.0))
            x = np.where(lam < 0, -x, x)
            y = np.where(phi < 0, -y, y)
        c.x = np.where(flat, lam, np.where(merid, 0.0, x))
        c.y = np.where(flat, 0.0, np.where(merid, phi, y))


@register
class Hammer(_Sph):
    name = "hammer"

    def _setup2(self, params: Params) -> None:
        if params.has("W"):
            self.w = abs(params.f("W"))
            if self.w <= 0:
                raise ProjError("W should be > 0")
        else:
            self.w = 0.5
        if params.has("M"):
            mm = abs(params.f("M"))
            if mm <= 0:
                raise ProjError("M should be > 0")
        else:
            mm = 1.0
        self.rm = 1.0 / mm
        self.m_ = mm / self.w

    def _fwd(self, c: Coords) -> None:
        cosphi = np.cos(c.y)
        lam = c.x * self.w
        denom = 1.0 + cosphi * np.cos(lam)
        bad = denom == 0.0
        d = np.sqrt(2.0 / np.where(bad, np.nan, denom))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = self.m_ * d * cosphi * np.sin(lam)
        c.y = self.rm * d * np.sin(c.y)

    def _inv(self, c: Coords) -> None:
        z = np.sqrt(np.maximum(
            1.0 - 0.25 * self.w * self.w * c.x * c.x
            - 0.25 * c.y * c.y, 0.0))
        bad = np.abs(2.0 * z * z - 1.0) < 1e-10
        with np.errstate(all="ignore"):
            lam = m.aatan2(self.w * c.x * z, 2.0 * z * z - 1) / self.w
            phi = m.aasin(z * c.y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


class _AitoffBase(_Sph):
    winkel: bool
    cosphi1 = 0.0

    def _fwd_xy(self, lam, phi):
        cc = 0.5 * lam
        d = np.arccos(np.clip(np.cos(phi) * np.cos(cc), -1, 1))
        with np.errstate(all="ignore"):
            yf = 1.0 / np.sin(d)
            x = 2.0 * d * np.cos(phi) * np.sin(cc) * yf
            y = yf * d * np.sin(phi)
        x = np.where(d == 0.0, 0.0, x)
        y = np.where(d == 0.0, 0.0, y)
        if self.winkel:
            x = (x + lam * self.cosphi1) * 0.5
            y = (y + phi) * 0.5
        return x, y

    def _fwd(self, c: Coords) -> None:
        c.x, c.y = self._fwd_xy(c.x, c.y)

    def _inv(self, c: Coords) -> None:
        # Newton-Raphson on the forward equations (aitoff.cpp:117-212),
        # vectorized; 10-iter inner x 20 rounds collapsed into one
        # masked loop with a final residual check.
        EPSILON = 1e-12
        x, y = c.x, c.y
        center = (np.abs(x) < EPSILON) & (np.abs(y) < EPSILON)
        phi = y.copy()
        lam = x.copy()
        bad = np.zeros(len(c), dtype=bool)
        active = ~center
        for _ in range(200):
            if not np.any(active):
                break
            with np.errstate(all="ignore"):
                sl = np.sin(lam * 0.5)
                cl = np.cos(lam * 0.5)
                sp = np.sin(phi)
                cp = np.cos(phi)
                D = cp * cl
                C = 1.0 - D * D
                denom = C ** 1.5
                zero = denom == 0
                D = np.arccos(np.clip(D, -1, 1)) / np.where(zero, np.nan,
                                                            denom)
                f1 = 2.0 * D * C * cp * sl
                f2 = D * C * sp
                f1p = 2.0 * (sl * cl * sp * cp / C - D * sp * sl)
                f1l = cp * cp * sl * sl / C + D * cp * cl * sp * sp
                f2p = sp * sp * cl / C + D * sl * sl * cp
                f2l = 0.5 * (sp * cp * sl / C - D * sp * cp * cp * sl * cl)
                if self.winkel:
                    f1 = 0.5 * (f1 + lam * self.cosphi1)
                    f2 = 0.5 * (f2 + phi)
                    f1p = f1p * 0.5
                    f1l = 0.5 * (f1l + self.cosphi1)
                    f2p = 0.5 * (f2p + 1.0)
                    f2l = f2l * 0.5
                f1 = f1 - x
                f2 = f2 - y
                dp_den = f1p * f2l - f2p * f1l
                dl = (f2 * f1p - f1 * f2p) / dp_den
                dp = (f1 * f2l - f2 * f1l) / dp_den
                dl = np.mod(dl + np.pi, 2 * np.pi) - np.pi
            bad |= active & zero
            phi = np.where(active & ~zero, phi - dp, phi)
            lam = np.where(active & ~zero, lam - dl, lam)
            conv = (np.abs(dp) <= EPSILON) & (np.abs(dl) <= EPSILON)
            active &= ~(conv | zero)
        # fold symmetric solutions back
        over = phi > m.M_HALFPI
        under = phi < -m.M_HALFPI
        phi = np.where(over, phi - 2 * (phi - m.M_HALFPI), phi)
        phi = np.where(under, phi - 2 * (phi + m.M_HALFPI), phi)
        if not self.winkel:
            pole = np.abs(np.abs(phi) - m.M_HALFPI) < EPSILON
            lam = np.where(pole, 0.0, lam)
        phi = np.where(center, 0.0, phi)
        lam = np.where(center, 0.0, lam)
        bad |= active
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Aitoff(_AitoffBase):
    name = "aitoff"
    winkel = False


@register
class Wintri(_AitoffBase):
    name = "wintri"
    winkel = True

    def _setup2(self, params: Params) -> None:
        if params.has("lat_1"):
            self.cosphi1 = float(np.cos(params.r("lat_1")))
            if self.cosphi1 == 0.0:
                raise ProjError("|lat_1| should be < 90")
        else:
            self.cosphi1 = 0.636619772367581343  # acos(2/pi)


@register
class August(_Sph):
    name = "august"

    def _fwd(self, c: Coords) -> None:
        M = 4.0 / 3
        t = np.tan(0.5 * c.y)
        c1 = np.sqrt(np.maximum(1.0 - t * t, 0.0))
        lam = c.x * 0.5
        cc = 1.0 + c1 * np.cos(lam)
        x1 = np.sin(lam) * c1 / cc
        y1 = t / cc
        x12 = x1 * x1
        y12 = y1 * y1
        c.x = M * x1 * (3.0 + x12 - 3.0 * y12)
        c.y = M * y1 * (3.0 + 3.0 * x12 - y12)


class _BaconBase(_Sph):
    bacn: bool
    ortl: bool
    _HLFPI2 = 2.46740110027233965467
    _EPS = 1e-10

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        y = m.M_HALFPI * np.sin(phi) if self.bacn else phi
        ax = np.abs(lam)
        small = ax < self._EPS
        with np.errstate(all="ignore"):
            if self.ortl:
                big = ax >= m.M_HALFPI
                x_big = np.sqrt(np.maximum(
                    self._HLFPI2 - phi * phi + self._EPS, 0.0)) \
                    + ax - m.M_HALFPI
            else:
                big = np.zeros(len(c), dtype=bool)
                x_big = np.zeros(len(c))
            f = 0.5 * (self._HLFPI2 / ax + ax)
            x_gen = ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))
            x = np.where(big, x_big, x_gen)
            x = np.where(lam < 0, -x, x)
        c.x = np.where(small, 0.0, x)
        c.y = y


@register
class Bacon(_BaconBase):
    name = "bacon"
    bacn = True
    ortl = False


@register
class Apian(_BaconBase):
    name = "apian"
    bacn = False
    ortl = False


@register
class Ortel(_BaconBase):
    name = "ortel"
    bacn = False
    ortl = True


@register
class Lagrng(_Sph):
    name = "lagrng"

    def _setup2(self, params: Params) -> None:
        self.w = params.f("W", 2.0) if params.has("W") else 2.0
        if self.w <= 0:
            raise ProjError("W should be > 0")
        self.hw = 0.5 * self.w
        self.rw = 1.0 / self.w
        self.hrw = 0.5 * self.rw
        sin_phi1 = np.sin(params.r("lat_1"))
        if abs(abs(sin_phi1) - 1.0) < TOL:
            raise ProjError("|lat_1| should be < 90")
        self.a1 = float(((1.0 - sin_phi1) / (1.0 + sin_phi1)) ** self.hrw)
        self.a2 = self.a1 * self.a1

    def _fwd(self, c: Coords) -> None:
        sin_phi = np.sin(c.y)
        pole = np.abs(np.abs(sin_phi) - 1) < TOL
        with np.errstate(all="ignore"):
            v = self.a1 * ((1.0 + sin_phi) / (1.0 - sin_phi)) ** self.hrw
            lam = c.x * self.rw
            cc = 0.5 * (v + 1.0 / v) + np.cos(lam)
            bad = (cc < TOL) & ~pole
            x = 2.0 * np.sin(lam) / cc
            y = (v - 1.0 / v) / cc
        x = np.where(pole, 0.0, x)
        y = np.where(pole, np.where(c.y < 0, -2.0, 2.0), y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        pole = np.abs(np.abs(y) - 2.0) < TOL
        with np.errstate(all="ignore"):
            x2 = x * x
            y2p = 2.0 + y
            y2m = 2.0 - y
            cc = y2p * y2m - x2
            bad = (np.abs(cc) < TOL) & ~pole
            phi = 2.0 * np.arctan(
                ((y2p * y2p + x2) / (self.a2 * (y2m * y2m + x2)))
                ** self.hw) - m.M_HALFPI
            lam = self.w * np.arctan2(4.0 * x, cc)
        phi = np.where(pole, np.where(y < 0, -m.M_HALFPI, m.M_HALFPI), phi)
        lam = np.where(pole, 0.0, lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Nicol(_Sph):
    name = "nicol"
    _EPS = 1e-10

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        e = self._EPS
        case1 = np.abs(lam) < e
        case2 = np.abs(phi) < e
        case3 = np.abs(np.abs(lam) - m.M_HALFPI) < e
        case4 = np.abs(np.abs(phi) - m.M_HALFPI) < e
        with np.errstate(all="ignore"):
            tb = m.M_HALFPI / lam - lam / m.M_HALFPI
            cc = phi / m.M_HALFPI
            sp = np.sin(phi)
            d = (1 - cc * cc) / (sp - cc)
            r2 = (tb / d) ** 2
            mm = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
            nn = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
            xg = np.cos(phi)
            xg = np.sqrt(mm * mm + xg * xg / (1.0 + r2))
            xg = m.M_HALFPI * (mm + np.where(lam < 0, -xg, xg))
            yg = np.sqrt(np.maximum(
                nn * nn - (sp * sp / r2 + d * sp - 1.0)
                / (1.0 + 1.0 / r2), 0.0))
            yg = m.M_HALFPI * (nn + np.where(phi < 0, yg, -yg))
        x = np.where(case1, 0.0,
                     np.where(case2, lam,
                              np.where(case3, lam * np.cos(phi),
                                       np.where(case4, 0.0, xg))))
        y = np.where(case1, phi,
                     np.where(case2, 0.0,
                              np.where(case3, m.M_HALFPI * np.sin(phi),
                                       np.where(case4, phi, yg))))
        c.x, c.y = x, y


@register
class Bertin1953(_Sph):
    name = "bertin1953"

    def _setup2(self, params: Params) -> None:
        self.phi0 = np.radians(-42.0)
        self.cos_dphi = float(np.cos(self.phi0))
        self.sin_dphi = float(np.sin(self.phi0))
        self.lam0 = 0.0

    def _fwd(self, c: Coords) -> None:
        fu = 1.4
        k = 12.0
        w = 1.68
        lam = c.x + np.radians(-16.5)
        phi = c.y
        cosphi = np.cos(phi)
        x = np.cos(lam) * cosphi
        y = np.sin(lam) * cosphi
        z = np.sin(phi)
        z0 = z * self.cos_dphi + x * self.sin_dphi
        lam = np.arctan2(y, x * self.cos_dphi - z * self.sin_dphi)
        phi = np.arcsin(np.clip(z0, -1, 1))
        lam = m.adjlon(lam)
        adj = lam + phi < -fu
        d = np.where(adj, (lam - phi + 1.6) * (lam + phi + fu) / 8.0, 0.0)
        lam = lam + d
        phi = phi - 0.8 * d * np.sin(phi + np.pi / 2.0)
        cosphi = np.cos(phi)
        d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
        x = w * d * cosphi * np.sin(lam / 2.0)
        y = d * np.sin(phi)
        d = (1.0 - np.cos(lam * phi)) / k
        x = np.where(y < 0, x * (1.0 + d), x)
        y = np.where(y > 0, y * (1.0 + d / 1.5 * x * x), y)
        c.x, c.y = x, y
