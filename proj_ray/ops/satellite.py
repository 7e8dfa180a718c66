"""Satellite / special azimuthal family: geostationary view (geos),
Airy, oblique cylindrical equal area (ocea), central conic (ccon) —
reference src/projections/{geos,airy,ocea,ccon}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

EPS10 = 1e-10


@register
class Geos(Operation):
    name = "geos"

    def setup(self, params: Params) -> None:
        self.h = params.f("h")
        sweep = params.s("sweep")
        if sweep is None:
            self.flip_axis = False
        elif sweep in ("x", "y"):
            self.flip_axis = sweep == "x"
        else:
            raise ProjError("geos: sweep should be x or y")
        self.radius_g_1 = self.h / self.a
        if self.radius_g_1 <= 0 or self.radius_g_1 > 1e10:
            raise ProjError("geos: invalid h")
        self.radius_g = 1.0 + self.radius_g_1
        self.C = self.radius_g * self.radius_g - 1.0
        if self.es != 0.0:
            self.radius_p = np.sqrt(self.one_es)
            self.radius_p2 = self.one_es
            self.radius_p_inv2 = self.rone_es
        else:
            self.radius_p = self.radius_p2 = self.radius_p_inv2 = 1.0

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y.copy()
        with np.errstate(all="ignore"):
            if self.es != 0.0:
                phi = np.arctan(self.radius_p2 * np.tan(phi))
                r = self.radius_p / np.hypot(self.radius_p * np.cos(phi),
                                             np.sin(phi))
            else:
                r = 1.0
            Vx = r * np.cos(lam) * np.cos(phi)
            Vy = r * np.sin(lam) * np.cos(phi)
            Vz = r * np.sin(phi)
            bad = ((self.radius_g - Vx) * Vx - Vy * Vy
                   - Vz * Vz * self.radius_p_inv2) < 0.0
            tmp = self.radius_g - Vx
            if self.flip_axis:
                x = self.radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
                y = self.radius_g_1 * np.arctan(Vz / tmp)
            else:
                x = self.radius_g_1 * np.arctan(Vy / tmp)
                y = self.radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        with np.errstate(all="ignore"):
            Vx = -1.0
            if self.flip_axis:
                Vz = np.tan(y / self.radius_g_1)
                Vy = np.tan(x / self.radius_g_1) * np.hypot(1.0, Vz)
            else:
                Vy = np.tan(x / self.radius_g_1)
                Vz = np.tan(y / self.radius_g_1) * np.hypot(1.0, Vy)
            if self.es != 0.0:
                aa = Vz / self.radius_p
                aa = Vy * Vy + aa * aa + 1.0
            else:
                aa = Vy * Vy + Vz * Vz + 1.0
            b = 2 * self.radius_g * Vx
            det = b * b - 4 * aa * self.C
            bad = det < 0.0
            k = (-b - np.sqrt(np.maximum(det, 0.0))) / (2.0 * aa)
            Vxx = self.radius_g + k * Vx
            Vyy = Vy * k
            Vzz = Vz * k
            lam = np.arctan2(Vyy, Vxx)
            phi = np.arctan(Vzz * np.cos(lam) / Vxx)
            if self.es != 0.0:
                phi = np.arctan(self.radius_p_inv2 * np.tan(phi))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Airy(Operation):
    name = "airy"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        EPS = 1e-10
        self.no_cut = params.b("no_cut")
        beta = 0.5 * (m.M_HALFPI - params.r("lat_b"))
        if abs(beta) < EPS:
            self.Cb = -0.5
        else:
            Cb = 1.0 / np.tan(beta)
            self.Cb = float(Cb * Cb * np.log(np.cos(beta)))
        if abs(abs(self.phi0) - m.M_HALFPI) < EPS:
            if self.phi0 < 0:
                self.p_halfpi = -m.M_HALFPI
                self.mode = 1  # S_POLE
            else:
                self.p_halfpi = m.M_HALFPI
                self.mode = 0  # N_POLE
        elif abs(self.phi0) < EPS:
            self.mode = 2  # EQUIT
        else:
            self.mode = 3  # OBLIQ
            self.sinph0 = float(np.sin(self.phi0))
            self.cosph0 = float(np.cos(self.phi0))

    def _fwd(self, c: Coords) -> None:
        EPS = 1e-10
        lam, phi = c.x, c.y
        sinlam = np.sin(lam)
        coslam = np.cos(lam)
        with np.errstate(all="ignore"):
            if self.mode in (2, 3):
                sinphi = np.sin(phi)
                cosphi = np.cos(phi)
                cosz = cosphi * coslam
                if self.mode == 3:
                    cosz = self.sinph0 * sinphi + self.cosph0 * cosz
                if self.no_cut:
                    bad = np.zeros(len(c), dtype=bool)
                else:
                    bad = cosz < -EPS
                s = 1.0 - cosz
                t = 0.5 * (1.0 + cosz)
                bad = bad | (t == 0)
                Krho = np.where(np.abs(s) > EPS,
                                -np.log(np.where(t == 0, 1, t)) / s
                                - self.Cb / np.where(t == 0, 1, t),
                                0.5 - self.Cb)
                x = Krho * cosphi * sinlam
                if self.mode == 3:
                    y = Krho * (self.cosph0 * sinphi
                                - self.sinph0 * cosphi * coslam)
                else:
                    y = Krho * sinphi
            else:
                ph = np.abs(self.p_halfpi - phi)
                bad = np.zeros(len(c), dtype=bool)
                if not self.no_cut:
                    bad = (ph - EPS) > m.M_HALFPI
                ph = ph * 0.5
                big = ph > EPS
                t = np.tan(ph)
                Krho = -2.0 * (np.log(np.cos(ph))
                               / np.where(big, t, 1.0) + t * self.Cb)
                x = np.where(big, Krho * sinlam, 0.0)
                y = np.where(big, Krho * coslam, 0.0)
                if self.mode == 0:
                    y = -y
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)


@register
class Ocea(Operation):
    name = "ocea"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.rok = 1.0 / self.k0
        self.rtk = self.k0
        if params.has("alpha"):
            alpha = np.pi + params.r("alpha")
            lonz = params.r("lonc")
            lam_p = np.arctan2(-np.cos(alpha),
                               -np.sin(self.phi0) * np.sin(alpha)) + lonz
            phi_p = np.arcsin(np.cos(self.phi0) * np.sin(alpha))
        else:
            phi_1 = params.r("lat_1")
            phi_2 = params.r("lat_2")
            lam_1 = params.r("lon_1")
            lam_2 = params.r("lon_2")
            lam_p = np.arctan2(
                np.cos(phi_1) * np.sin(phi_2) * np.cos(lam_1)
                - np.sin(phi_1) * np.cos(phi_2) * np.cos(lam_2),
                np.sin(phi_1) * np.cos(phi_2) * np.sin(lam_2)
                - np.cos(phi_1) * np.sin(phi_2) * np.sin(lam_1))
            if lam_1 == -m.M_HALFPI:
                lam_p = -lam_p
            clm = np.cos(lam_p - lam_1)
            tp1 = np.tan(phi_1)
            if tp1 == 0.0:
                phi_p = -m.M_HALFPI if clm >= 0.0 else m.M_HALFPI
            else:
                phi_p = np.arctan(-clm / tp1)
        self.lam0 = float(lam_p + m.M_HALFPI)
        self.cosphi = float(np.cos(phi_p))
        self.sinphi = float(np.sin(phi_p))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        with np.errstate(all="ignore"):
            sy = np.sin(lam)
            t = np.cos(lam)
            x = np.arctan((np.tan(phi) * self.cosphi + self.sinphi * sy) / t)
            x = np.where(t < 0.0, x + np.pi, x)
            x = x * self.rtk
            y = self.rok * (self.sinphi * np.sin(phi)
                            - self.cosphi * np.cos(phi) * sy)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        y = c.y / self.rok
        x = c.x / self.rtk
        with np.errstate(all="ignore"):
            t = np.sqrt(np.maximum(1.0 - y * y, 0.0))
            s = np.sin(x)
            phi = np.arcsin(np.clip(y * self.sinphi + t * self.cosphi * s,
                                    -1, 1))
            lam = np.arctan2(t * self.sinphi * s - y * self.cosphi,
                             t * np.cos(x))
        c.x, c.y = lam, phi


@register
class Ccon(Operation):
    name = "ccon"

    def setup(self, params: Params) -> None:
        self.phi1 = params.r("lat_1")
        if abs(self.phi1) < EPS10:
            raise ProjError("ccon: |lat_1| should be > 0")
        self.sinphi1 = float(np.sin(self.phi1))
        self.cosphi1 = float(np.cos(self.phi1))
        self.ctgphi1 = self.cosphi1 / self.sinphi1

    def _fwd(self, c: Coords) -> None:
        r = self.ctgphi1 - np.tan(c.y - self.phi1)
        c.y = self.ctgphi1 - r * np.cos(c.x * self.sinphi1)
        c.x = r * np.sin(c.x * self.sinphi1)

    def _inv(self, c: Coords) -> None:
        y = self.ctgphi1 - c.y
        phi = self.phi1 - np.arctan(np.hypot(c.x, y) - self.ctgphi1)
        lam = np.arctan2(c.x, y) / self.sinphi1
        c.x, c.y = lam, phi
