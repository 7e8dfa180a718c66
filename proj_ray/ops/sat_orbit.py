"""Space Oblique Mercator family: som, misrsom, lsat —
reference src/projections/som.cpp (Snyder & Linck, USGS-NMD).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

TOL = 1e-7
M_PI_HALFPI = 1.5 * np.pi
M_TWOPI_HALFPI = 2.5 * np.pi


class _SomBase(Operation):
    """Shared SOM kernel; subclasses set alf (inclination, rad), p22
    (days per revolution), lam0 (ascending longitude) and rlm in
    ``_config``."""

    def _config(self, params: Params) -> None:
        raise NotImplementedError

    def setup(self, params: Params) -> None:
        self._config(params)
        self.sa = float(np.sin(self.alf))
        self.ca = float(np.cos(self.alf))
        if abs(self.ca) < 1e-9:
            self.ca = 1e-9
        esc = self.es * self.ca * self.ca
        ess = self.es * self.sa * self.sa
        w = (1.0 - esc) * self.rone_es
        self.w = w * w - 1.0
        self.q = ess * self.rone_es
        self.t = ess * (2.0 - self.es) * self.rone_es * self.rone_es
        self.u = esc * self.rone_es
        self.xj = self.one_es ** 3
        self.rlm2 = self.rlm + 2 * np.pi
        self.a2 = self.a4 = self.b = self.c1 = self.c3 = 0.0
        self._seraz0(0.0, 1.0)
        lam = 9.0
        while lam <= 81.0001:
            self._seraz0(lam, 4.0)
            lam += 18.0
        lam = 18.0
        while lam <= 72.0001:
            self._seraz0(lam, 2.0)
            lam += 18.0
        self._seraz0(90.0, 1.0)
        self.a2 /= 30.0
        self.a4 /= 60.0
        self.b /= 30.0
        self.c1 /= 15.0
        self.c3 /= 45.0

    def _seraz0(self, lam: float, mult: float) -> None:
        """Simpson-rule accumulation of the series constants
        (som.cpp seraz0)."""
        lam *= m.DEG_TO_RAD
        sd = np.sin(lam)
        sdsq = sd * sd
        s = (self.p22 * self.sa * np.cos(lam)
             * np.sqrt((1.0 + self.t * sdsq)
                       / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq))))
        d1 = 1.0 + self.q * sdsq
        h = (np.sqrt((1.0 + self.q * sdsq) / (1.0 + self.w * sdsq))
             * ((1.0 + self.w * sdsq) / (d1 * d1) - self.p22 * self.ca))
        sq = np.sqrt(self.xj * self.xj + s * s)
        fc = mult * (h * self.xj - s * s) / sq
        self.b += fc
        self.a2 += fc * np.cos(lam + lam)
        self.a4 += fc * np.cos(lam * 4.0)
        fc = mult * s * (h + self.xj) / sq
        self.c1 += fc * np.cos(lam)
        self.c3 += fc * np.cos(lam * 3.0)

    def _s_of(self, lamdp):
        sd = np.sin(lamdp)
        sdsq = sd * sd
        return (self.p22 * self.sa * np.cos(lamdp)
                * np.sqrt((1.0 + self.t * sdsq)
                          / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq))))

    def _fwd(self, c: Coords) -> None:
        lam = c.x
        phi = np.clip(c.y, -m.M_HALFPI, m.M_HALFPI)
        tanphi = np.tan(phi)
        lampp = np.where(phi >= 0.0, m.M_HALFPI, M_PI_HALFPI)
        lamdp = np.zeros_like(lam)
        lamt = np.zeros_like(lam)
        fail = np.zeros(lam.shape, dtype=bool)
        settled = np.zeros(lam.shape, dtype=bool)
        with np.errstate(all="ignore"):
            for outer in range(3):  # outer branch-search (som.cpp:104-133)
                sav = lampp.copy()
                lamtp = lam + self.p22 * lampp
                cl = np.cos(lamtp)
                fac = np.where(cl < 0,
                               lampp + np.sin(lampp) * m.M_HALFPI,
                               lampp - np.sin(lampp) * m.M_HALFPI)
                conv = np.zeros(lam.shape, dtype=bool)
                for _ in range(51):
                    lamt_i = lam + self.p22 * sav
                    cc = np.cos(lamt_i)
                    lamt_i = np.where(np.abs(cc) < TOL, lamt_i - TOL, lamt_i)
                    xlam = (self.one_es * tanphi * self.sa
                            + np.sin(lamt_i) * self.ca) / cc
                    lamdp_i = np.arctan(xlam) + fac
                    newconv = np.abs(np.abs(sav) - np.abs(lamdp_i)) < TOL
                    upd = ~settled
                    lamdp = np.where(upd, lamdp_i, lamdp)
                    lamt = np.where(upd, lamt_i, lamt)
                    conv = conv | newconv
                    sav = np.where(conv, sav, lamdp_i)
                    if (conv | settled).all():
                        break
                fail = fail | (~conv & ~settled)
                in_range = (lamdp > self.rlm) & (lamdp < self.rlm2)
                settled = settled | in_range | fail
                if settled.all():
                    break
                lampp = np.where(~settled & (lamdp <= self.rlm),
                                 M_TWOPI_HALFPI, lampp)
                lampp = np.where(~settled & (lamdp >= self.rlm2),
                                 m.M_HALFPI, lampp)
            sp = np.sin(phi)
            phidp = m.aasin((self.one_es * self.ca * sp
                             - self.sa * np.cos(phi) * np.sin(lamt))
                            / np.sqrt(1.0 - self.es * sp * sp))
            tanph = np.log(np.tan(m.M_FORTPI + 0.5 * phidp))
            s = self._s_of(lamdp)
            d = np.sqrt(self.xj * self.xj + s * s)
            x = (self.b * lamdp + self.a2 * np.sin(2.0 * lamdp)
                 + self.a4 * np.sin(lamdp * 4.0) - tanph * s / d)
            y = (self.c1 * np.sin(lamdp) + self.c3 * np.sin(lamdp * 3.0)
                 + tanph * self.xj / d)
        c.set_error(fail, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(fail, np.nan, x)
        c.y = np.where(fail, np.nan, y)

    def _inv(self, c: Coords) -> None:
        X, Y = c.x, c.y
        with np.errstate(all="ignore"):
            lamdp = X / self.b
            s = self._s_of(lamdp)
            done = np.zeros(X.shape, dtype=bool)
            for _ in range(50):
                sav = lamdp
                s_i = self._s_of(lamdp)
                new = (X + Y * s_i / self.xj - self.a2 * np.sin(2.0 * lamdp)
                       - self.a4 * np.sin(lamdp * 4.0)
                       - s_i / self.xj * (self.c1 * np.sin(lamdp)
                                          + self.c3 * np.sin(lamdp * 3.0)))
                new = new / self.b
                lamdp = np.where(done, lamdp, new)
                s = np.where(done, s, s_i)
                done = done | (np.abs(lamdp - sav) < TOL)
                if done.all():
                    break
            sl = np.sin(lamdp)
            fac = np.exp(np.sqrt(1.0 + s * s / self.xj / self.xj)
                         * (Y - self.c1 * sl - self.c3 * np.sin(lamdp * 3.0)))
            phidp = 2.0 * (np.arctan(fac) - m.M_FORTPI)
            dd = sl * sl
            lamdp = np.where(np.abs(np.cos(lamdp)) < TOL, lamdp - TOL, lamdp)
            spp = np.sin(phidp)
            sppsq = spp * spp
            denom = 1.0 - sppsq * (1.0 + self.u)
            bad = denom == 0.0
            lamt = np.arctan(
                ((1.0 - sppsq * self.rone_es) * np.tan(lamdp) * self.ca
                 - spp * self.sa
                 * np.sqrt(np.maximum(
                     (1.0 + self.q * dd) * (1.0 - sppsq) - sppsq * self.u,
                     0.0))
                 / np.cos(lamdp)) / np.where(bad, 1.0, denom))
            sl_sign = np.where(lamt >= 0.0, 1.0, -1.0)
            scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
            lamt = lamt - m.M_HALFPI * (1.0 - scl) * sl_sign
            lam = lamt - self.p22 * lamdp
            if abs(self.sa) < TOL:
                phi = m.aasin(spp / np.sqrt(self.one_es * self.one_es
                                            + self.es * sppsq))
            else:
                phi = np.arctan((np.tan(lamdp) * np.cos(lamt)
                                 - self.ca * np.sin(lamt))
                                / (self.one_es * self.sa))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Som(_SomBase):
    name = "som"

    def _config(self, params: Params) -> None:
        self.lam0 = params.r("asc_lon")
        if not (-2 * np.pi <= self.lam0 <= 2 * np.pi):
            raise ProjError("som: asc_lon should be in [-2pi, 2pi]")
        self.alf = params.r("inc_angle")
        if not (0 <= self.alf <= np.pi):
            raise ProjError("som: inc_angle should be in [0, pi]")
        self.p22 = params.f("ps_rev")
        if self.p22 < 0:
            raise ProjError("som: ps_rev should be positive")
        self.rlm = 0.0


@register
class Misrsom(_SomBase):
    name = "misrsom"

    def _config(self, params: Params) -> None:
        path = params.i("path")
        if path <= 0 or path > 233:
            raise ProjError("misrsom: path should be in [1, 233]")
        self.lam0 = m.DEG_TO_RAD * 129.3056 - 2 * np.pi / 233.0 * path
        self.alf = 98.30382 * m.DEG_TO_RAD
        self.p22 = 98.88 / 1440.0
        self.rlm = 0.0


@register
class Lsat(_SomBase):
    name = "lsat"

    def _config(self, params: Params) -> None:
        land = params.i("lsat")
        if land <= 0 or land > 5:
            raise ProjError("lsat: lsat should be in [1, 5]")
        path = params.i("path")
        max_path = 251 if land <= 3 else 233
        if path <= 0 or path > max_path:
            raise ProjError(f"lsat: path should be in [1, {max_path}]")
        if land <= 3:
            self.lam0 = m.DEG_TO_RAD * 128.87 - 2 * np.pi / 251.0 * path
            self.p22 = 103.2669323
            self.alf = m.DEG_TO_RAD * 99.092
        else:
            self.lam0 = m.DEG_TO_RAD * 129.3 - 2 * np.pi / 233.0 * path
            self.p22 = 98.8841202
            self.alf = m.DEG_TO_RAD * 98.2
        self.p22 /= 1440.0
        self.rlm = np.pi * (1.0 / 248.0 + 0.5161290322580645)
