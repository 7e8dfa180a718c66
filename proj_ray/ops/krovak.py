"""Krovak / Modified Krovak (reference src/projections/krovak.cpp),
Two-Point Equidistant (tpeqd.cpp), Near-sided/Tilted perspective
(nsper.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

_UQ = 1.04216856380474
_S0 = 1.37008346281555
_MK = dict(X0=1089000.0, Y0=654000.0,
           C=[2.946529277E-02, 2.515965696E-02, 1.193845912E-07,
              -4.668270147E-07, 9.233980362E-12, 1.523735715E-12,
              1.696780024E-18, 4.408314235E-18, -8.331083518E-24,
              -3.689471323E-24])


def _mod_krovak_dxdy(Xr, Yr):
    C1, C2, C3, C4, C5, C6, C7, C8, C9, C10 = _MK["C"]
    Xr2 = Xr * Xr
    Yr2 = Yr * Yr
    Xr4 = Xr2 * Xr2
    Yr4 = Yr2 * Yr2
    dX = (C1 + C3 * Xr - C4 * Yr - 2 * C6 * Xr * Yr + C5 * (Xr2 - Yr2)
          + C7 * Xr * (Xr2 - 3 * Yr2) - C8 * Yr * (3 * Xr2 - Yr2)
          + 4 * C9 * Xr * Yr * (Xr2 - Yr2)
          + C10 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    dY = (C2 + C3 * Yr + C4 * Xr + 2 * C5 * Xr * Yr + C6 * (Xr2 - Yr2)
          + C8 * Xr * (Xr2 - 3 * Yr2) + C7 * Yr * (3 * Xr2 - Yr2)
          - 4 * C10 * Xr * Yr * (Xr2 - Yr2)
          + C9 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    return dX, dY


class _KrovakBase(Operation):
    modified = False

    def setup(self, params: Params) -> None:
        from proj_ray.core.ellipsoid import Ellipsoid

        # Krovak pins the Bessel ellipsoid (krovak.cpp:160-163).
        # NOTE bug-compatibility: the reference sets only a/es/e and does
        # NOT recompute the derived params (ra, one_es, ...), so the
        # CLASSIC inverse descaling still uses the USER ellipsoid's ra
        # while the forward scales by Bessel's a.  Keep self.ra as-is.
        bessel = Ellipsoid.from_a_es(6377397.155, 0.006674372230614)
        self.ell = bessel
        self.a = bessel.a
        self.es = bessel.es
        self.e = bessel.e
        if not params.has("lat_0"):
            self.phi0 = 0.863937979737193
        if not params.has("lon_0"):
            self.lam0 = 0.7417649320975901 - 0.308341501185665
        if not (params.has("k") or params.has("k_0")):
            self.k0 = 0.9999
        self.easting_northing = not params.b("czech")
        self.alpha = np.sqrt(1.0 + (self.es * np.cos(self.phi0) ** 4)
                             / (1.0 - self.es))
        u0 = np.arcsin(np.sin(self.phi0) / self.alpha)
        g = ((1.0 + self.e * np.sin(self.phi0))
             / (1.0 - self.e * np.sin(self.phi0))) \
            ** (self.alpha * self.e / 2.0)
        t0 = np.tan(self.phi0 / 2.0 + np.pi / 4)
        if t0 == 0:
            raise ProjError("krovak: lat_0 + PI/4 should differ from 0")
        self.k = float(np.tan(u0 / 2.0 + np.pi / 4) / t0 ** self.alpha * g)
        n0 = np.sqrt(1.0 - self.es) / (1.0 - self.es
                                       * np.sin(self.phi0) ** 2)
        self.n = float(np.sin(_S0))
        self.rho0 = float(self.k0 * n0 / np.tan(_S0))
        self.ad = m.M_HALFPI - _UQ

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        with np.errstate(all="ignore"):
            esin = self.e * np.sin(phi)
            gfi = ((1.0 + esin) / (1.0 - esin)) ** (self.alpha * self.e / 2)
            u = 2.0 * (np.arctan(
                self.k * np.tan(phi / 2.0 + np.pi / 4) ** self.alpha / gfi)
                - np.pi / 4)
            deltav = -lam * self.alpha
            s = np.arcsin(np.clip(
                np.cos(self.ad) * np.sin(u)
                + np.sin(self.ad) * np.cos(u) * np.cos(deltav), -1, 1))
            cos_s = np.cos(s)
            degen = cos_s < 1e-12
            d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav)
                                  / np.where(degen, 1.0, cos_s), -1, 1))
            eps = self.n * d
            rho = self.rho0 * np.tan(_S0 / 2.0 + np.pi / 4) ** self.n \
                / np.tan(s / 2.0 + np.pi / 4) ** self.n
            x = np.where(degen, 0.0, rho * np.cos(eps))
            y = np.where(degen, 0.0, rho * np.sin(eps))
        if self.modified:
            Xr = x * self.a - _MK["X0"]
            Yr = y * self.a - _MK["Y0"]
            dX, dY = _mod_krovak_dxdy(Xr, Yr)
            x = x - dX / self.a
            y = y - dY / self.a
        x, y = y, x  # swap: southing/westing -> output axes
        if self.easting_northing:
            x = -x - 2 * self.x0 / self.a
            y = -y - 2 * self.y0 / self.a
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        if self.easting_northing:
            y2 = -y - 2 * self.x0 / self.a
            x2 = -x - 2 * self.y0 / self.a
            x, y = x2, y2
        x, y = y, x
        if self.modified:
            Xr = x * self.a - _MK["X0"]
            Yr = y * self.a - _MK["Y0"]
            dX, dY = _mod_krovak_dxdy(Xr, Yr)
            x = x + dX / self.a
            y = y + dY / self.a
        with np.errstate(all="ignore"):
            rho = np.sqrt(x * x + y * y)
            eps = np.arctan2(y, x)
            d = eps / np.sin(_S0)
            s = np.where(
                rho == 0.0, m.M_HALFPI,
                2.0 * (np.arctan((self.rho0 / np.where(rho == 0, 1, rho))
                                 ** (1.0 / self.n)
                                 * np.tan(_S0 / 2.0 + np.pi / 4))
                       - np.pi / 4))
            u = np.arcsin(np.clip(
                np.cos(self.ad) * np.sin(s)
                - np.sin(self.ad) * np.cos(s) * np.cos(d), -1, 1))
            deltav = np.arcsin(np.clip(np.cos(s) * np.sin(d)
                                       / np.cos(u), -1, 1))
            lam = self.lam0 - deltav / self.alpha
            fi1 = u.copy()
            phi = u.copy()
            active = np.ones(len(c), dtype=bool)
            for _ in range(100):
                phi_n = 2.0 * (np.arctan(
                    self.k ** (-1.0 / self.alpha)
                    * np.tan(u / 2.0 + np.pi / 4) ** (1.0 / self.alpha)
                    * ((1.0 + self.e * np.sin(fi1))
                       / (1.0 - self.e * np.sin(fi1))) ** (self.e / 2.0))
                    - np.pi / 4)
                phi = np.where(active, phi_n, phi)
                conv = np.abs(fi1 - phi_n) < 1e-15
                fi1 = np.where(active, phi_n, fi1)
                active &= ~conv
                if not np.any(active):
                    break
        c.set_error(active, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(active, np.nan, lam - self.lam0)
        c.y = np.where(active, np.nan, phi)


@register
class Krovak(_KrovakBase):
    name = "krovak"
    modified = False


@register
class ModKrovak(_KrovakBase):
    name = "mod_krovak"
    modified = True


@register
class Tpeqd(Operation):
    name = "tpeqd"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        phi_1 = params.r("lat_1")
        lam_1 = params.r("lon_1")
        phi_2 = params.r("lat_2")
        lam_2 = params.r("lon_2")
        if phi_1 == phi_2 and lam_1 == lam_2:
            raise ProjError("tpeqd: the 2 points should be distinct")
        self.lam0 = float(m.adjlon(np.array([0.5 * (lam_1 + lam_2)]))[0])
        dlam2 = float(m.adjlon(np.array([lam_2 - lam_1]))[0])
        self.cp1 = np.cos(phi_1)
        self.cp2 = np.cos(phi_2)
        self.sp1 = np.sin(phi_1)
        self.sp2 = np.sin(phi_2)
        self.cs = self.cp1 * self.sp2
        self.sc = self.sp1 * self.cp2
        self.ccs = self.cp1 * self.cp2 * np.sin(dlam2)
        csc = self.cs - self.sc * np.cos(dlam2)
        z02 = np.arctan2(np.hypot(self.cp2 * np.sin(dlam2), csc),
                         self.sp1 * self.sp2
                         + self.cp1 * self.cp2 * np.cos(dlam2))
        if z02 == 0.0:
            raise ProjError("tpeqd: |lat_1|,|lat_2| should be < 90")
        self.hz0 = 0.5 * z02
        A12 = np.arctan2(self.cp2 * np.sin(dlam2), csc)
        pp = float(m.aasin(self.cp1 * np.sin(A12)))
        self.ca = np.cos(pp)
        self.sa = np.sin(pp)
        self.lp = float(m.adjlon(np.array([
            np.arctan2(self.cp1 * np.cos(A12), self.sp1) - self.hz0]))[0])
        self.dlam2 = dlam2 * 0.5
        self.lamc = m.M_HALFPI - np.arctan2(np.sin(A12) * self.sp1,
                                            np.cos(A12)) - self.dlam2
        self.thz0 = np.tan(self.hz0)
        self.rhshz0 = 0.5 / np.sin(self.hz0)
        self.r2z0 = 0.5 / z02
        self.z02 = z02 * z02

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        sp = np.sin(phi)
        cp = np.cos(phi)
        dl1 = lam + self.dlam2
        dl2 = lam - self.dlam2
        z1 = m.aacos(self.sp1 * sp + self.cp1 * cp * np.cos(dl1))
        z2 = m.aacos(self.sp2 * sp + self.cp2 * cp * np.cos(dl2))
        z1 = z1 * z1
        z2 = z2 * z2
        t = z1 - z2
        x = self.r2z0 * t
        t = self.z02 - t
        y = self.r2z0 * m.asqrt(4.0 * self.z02 * z2 - t * t)
        neg = (self.ccs * sp - cp * (self.cs * np.sin(dl1)
                                     - self.sc * np.sin(dl2))) < 0.0
        c.x = x
        c.y = np.where(neg, -y, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        cz1 = np.cos(np.hypot(y, x + self.hz0))
        cz2 = np.cos(np.hypot(y, x - self.hz0))
        s = cz1 + cz2
        d = cz1 - cz2
        lam = -np.arctan2(d, s * self.thz0)
        phi = m.aacos(np.hypot(self.thz0 * s, d) * self.rhshz0)
        phi = np.where(y < 0.0, -phi, phi)
        sp = np.sin(phi)
        cp = np.cos(phi)
        lam = lam - self.lp
        s = np.cos(lam)
        phi_out = m.aasin(self.sa * sp + self.ca * cp * s)
        lam_out = np.arctan2(cp * np.sin(lam),
                             self.sa * cp * s - self.ca * sp) + self.lamc
        c.x, c.y = lam_out, phi_out


class _NsperBase(Operation):
    tilt = False

    def _nsper_setup(self, params: Params) -> None:
        self.es = 0.0
        self.height = params.f("h")
        EPS10 = 1e-10
        if abs(abs(self.phi0) - m.M_HALFPI) < EPS10:
            self.mode = 1 if self.phi0 < 0 else 0  # S_POLE / N_POLE
        elif abs(self.phi0) < EPS10:
            self.mode = 2  # EQUIT
        else:
            self.mode = 3  # OBLIQ
            self.sinph0 = float(np.sin(self.phi0))
            self.cosph0 = float(np.cos(self.phi0))
        self.pn1 = self.height / self.a
        if self.pn1 <= 0 or self.pn1 > 1e10:
            raise ProjError("nsper: invalid value for h")
        self.p = 1.0 + self.pn1
        self.rp = 1.0 / self.p
        self.h = 1.0 / self.pn1
        self.pfact = (self.p + 1.0) * self.h

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == 3:
            yv = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == 2:
            yv = cosphi * coslam
        elif self.mode == 1:
            yv = -sinphi
        else:
            yv = sinphi
        bad = yv < self.rp
        yv = self.pn1 / (self.p - np.where(bad, np.nan, yv))
        x = yv * cosphi * np.sin(lam)
        if self.mode == 3:
            y = yv * (self.cosph0 * sinphi
                      - self.sinph0 * cosphi * coslam)
        elif self.mode == 2:
            y = yv * sinphi
        elif self.mode == 0:
            y = yv * cosphi * (-coslam)
        else:
            y = yv * cosphi * coslam
        if self.tilt:
            yt = y * self.cg + x * self.sg
            ba = 1.0 / (yt * self.sw * self.h + self.cw)
            x, y = (x * self.cg - y * self.sg) * self.cw * ba, yt * ba
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        EPS10 = 1e-10
        if self.tilt:
            yt = 1.0 / (self.pn1 - y * self.sw)
            bm = self.pn1 * x * yt
            bq = self.pn1 * y * self.cw * yt
            x = bm * self.cg + bq * self.sg
            y = bq * self.cg - bm * self.sg
        rh = np.hypot(x, y)
        center = np.abs(rh) <= EPS10
        with np.errstate(all="ignore"):
            sinz = 1.0 - rh * rh * self.pfact
            bad = (sinz < 0.0) & ~center
            sinz = (self.p - np.sqrt(np.maximum(sinz, 0.0))) \
                / (self.pn1 / np.where(rh == 0, 1, rh)
                   + np.where(rh == 0, 1, rh) / self.pn1)
            cosz = np.sqrt(np.maximum(1.0 - sinz * sinz, 0.0))
            safe_rh = np.where(rh == 0, 1.0, rh)
            if self.mode == 3:
                phi = np.arcsin(np.clip(
                    cosz * self.sinph0 + y * sinz * self.cosph0 / safe_rh,
                    -1, 1))
                yy = (cosz - self.sinph0 * np.sin(phi)) * rh
                xx = x * sinz * self.cosph0
            elif self.mode == 2:
                phi = np.arcsin(np.clip(y * sinz / safe_rh, -1, 1))
                yy = cosz * rh
                xx = x * sinz
            elif self.mode == 0:
                phi = np.arcsin(np.clip(cosz, -1, 1))
                yy = -y
                xx = x
            else:
                phi = -np.arcsin(np.clip(cosz, -1, 1))
                yy = y
                xx = x
            lam = np.arctan2(xx, yy)
        phi = np.where(center, self.phi0, phi)
        lam = np.where(center, 0.0, lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Nsper(_NsperBase):
    name = "nsper"
    tilt = False

    def setup(self, params: Params) -> None:
        self._nsper_setup(params)


@register
class Tpers(_NsperBase):
    name = "tpers"
    tilt = True

    def setup(self, params: Params) -> None:
        omega = params.r("tilt")
        gamma = params.r("azi")
        self.cg = float(np.cos(gamma))
        self.sg = float(np.sin(gamma))
        self.cw = float(np.cos(omega))
        self.sw = float(np.sin(omega))
        self._nsper_setup(params)
