"""Azimuthal Equidistant (reference src/projections/aeqd.cpp).

Spherical modes are closed-form; ellipsoidal oblique/equatorial modes
run the Karney geodesic solver on a unit-radius ellipsoid (the
reference embeds geod_init(&g, 1, f), aeqd.cpp:306); polar modes use the
meridional arc; +guam is the Guam elliptical approximation with its
3-step fixed-point inverse (aeqd.cpp:190-206).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.functions.geodesic import Geodesic
from proj_ray.ops.base import Operation, Params, register

EPS10 = 1e-10
TOL = 1e-14
N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


@register
class Aeqd(Operation):
    name = "aeqd"

    def setup(self, params: Params) -> None:
        self.g = Geodesic(1.0, self.ell.f)
        if abs(abs(self.phi0) - m.M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0 else N_POLE
            self.sinph0 = -1.0 if self.phi0 < 0 else 1.0
            self.cosph0 = 0.0
        elif abs(self.phi0) < EPS10:
            self.mode = EQUIT
            self.sinph0 = 0.0
            self.cosph0 = 1.0
        else:
            self.mode = OBLIQ
            self.sinph0 = float(np.sin(self.phi0))
            self.cosph0 = float(np.cos(self.phi0))
        self.guam = False
        if self.es != 0.0:
            self.en = m.enfn(self.ell.n)
            if params.b("guam"):
                self.guam = True
                self.M1 = float(m.mlfn(self.phi0, self.sinph0, self.cosph0,
                                       self.en))
            elif self.mode == N_POLE:
                self.Mp = float(m.mlfn(m.M_HALFPI, 1.0, 0.0, self.en))
            elif self.mode == S_POLE:
                self.Mp = float(m.mlfn(-m.M_HALFPI, -1.0, 0.0, self.en))

    # ------------------------------------------------------------------
    def _fwd(self, c: Coords) -> None:
        if self.es == 0.0:
            self._fwd_s(c)
        elif self.guam:
            self._fwd_guam(c)
        else:
            self._fwd_e(c)

    def _fwd_guam(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        t = 1.0 / np.sqrt(1.0 - self.es * sinphi * sinphi)
        x = lam * cosphi * t
        y = (m.mlfn(phi, sinphi, cosphi, self.en) - self.M1
             + 0.5 * lam * lam * cosphi * sinphi * t)
        c.x, c.y = x, y

    def _fwd_e(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.mode in (N_POLE, S_POLE):
            coslam = np.cos(lam)
            if self.mode == N_POLE:
                coslam = -coslam
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            rho = np.abs(self.Mp - m.mlfn(phi, sinphi, cosphi, self.en))
            c.x = rho * np.sin(lam)
            c.y = rho * coslam
        else:
            center = (np.abs(lam) < EPS10) & (np.abs(phi - self.phi0) < EPS10)
            s12, azi1, _ = self.g.inverse(
                np.degrees(self.phi0), 0.0, np.degrees(phi), np.degrees(lam))
            azi1 = np.radians(azi1)
            x = s12 * np.sin(azi1)
            y = s12 * np.cos(azi1)
            c.x = np.where(center, 0.0, x)
            c.y = np.where(center, 0.0, y)

    def _fwd_s(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        bad = np.zeros(len(c), dtype=bool)
        if self.mode in (EQUIT, OBLIQ):
            if self.mode == EQUIT:
                cosc = cosphi * coslam
            else:
                cosc = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
            near = np.abs(np.abs(cosc) - 1.0) < TOL
            bad = near & (cosc < 0)
            with np.errstate(all="ignore"):
                yv = np.arccos(np.clip(cosc, -1, 1))
                k = yv / np.sin(yv)
            k = np.where(near, 1.0, k)
            x = k * cosphi * sinlam
            if self.mode == EQUIT:
                y = k * sinphi
            else:
                y = k * (self.cosph0 * sinphi
                         - self.sinph0 * cosphi * coslam)
            # near-center rows: reference falls back to the geodesic
            # formulation (aeqd.cpp:141-146)
            sel = near & ~bad
            if np.any(sel):
                s12, azi1, _ = self.g.inverse(
                    np.degrees(self.phi0), 0.0,
                    np.degrees(phi[sel]), np.degrees(lam[sel]))
                az = np.radians(azi1)
                x[sel] = s12 * np.sin(az)
                y[sel] = s12 * np.cos(az)
        else:
            ph = phi
            cl = coslam
            if self.mode == N_POLE:
                ph = -phi
                cl = -coslam
            bad = np.abs(ph - m.M_HALFPI) < EPS10
            y = m.M_HALFPI + ph
            x = y * sinlam
            y = y * cl
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = x, y

    # ------------------------------------------------------------------
    def _inv(self, c: Coords) -> None:
        if self.es == 0.0:
            self._inv_s(c)
        elif self.guam:
            self._inv_guam(c)
        else:
            self._inv_e(c)

    def _inv_guam(self, c: Coords) -> None:
        x, y = c.x, c.y
        x2 = 0.5 * x * x
        phi = np.full_like(x, self.phi0)
        t = np.zeros_like(x)
        for _ in range(3):
            t = self.e * np.sin(phi)
            t = np.sqrt(1.0 - t * t)
            phi = m.inv_mlfn(self.M1 + y - x2 * np.tan(phi) * t, self.en)
        lam = x * t / np.cos(phi)
        c.x, c.y = lam, phi

    def _inv_e(self, c: Coords) -> None:
        x, y = c.x, c.y
        s12 = np.hypot(x, y)
        center = s12 < EPS10
        if self.mode in (OBLIQ, EQUIT):
            azi1 = np.degrees(np.arctan2(x, y))
            lat2, lon2, _ = self.g.direct(
                np.degrees(self.phi0), 0.0, azi1, s12)
            phi = np.radians(lat2)
            lam = np.radians(lon2)
        else:
            phi = m.inv_mlfn(
                self.Mp - s12 if self.mode == N_POLE else self.Mp + s12,
                self.en)
            lam = np.arctan2(x, -y if self.mode == N_POLE else y)
        c.x = np.where(center, 0.0, lam)
        c.y = np.where(center, self.phi0, phi)

    def _inv_s(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        c_rh = np.hypot(x, y)
        bad = c_rh - EPS10 > m.M_PI
        c_rh = np.minimum(c_rh, m.M_PI)
        center = c_rh < EPS10
        if self.mode in (OBLIQ, EQUIT):
            sinc = np.sin(c_rh)
            cosc = np.cos(c_rh)
            safe = np.where(c_rh == 0, 1.0, c_rh)
            with np.errstate(all="ignore"):
                if self.mode == EQUIT:
                    phi = m.aasin(y * sinc / safe)
                    x = x * sinc
                    yy = cosc * c_rh
                else:
                    phi = m.aasin(cosc * self.sinph0
                                  + y * sinc * self.cosph0 / safe)
                    yy = (cosc - self.sinph0 * np.sin(phi)) * c_rh
                    x = x * sinc * self.cosph0
            lam = np.where(yy == 0.0, 0.0, np.arctan2(x, yy))
        elif self.mode == N_POLE:
            phi = m.M_HALFPI - c_rh
            lam = np.arctan2(x, -y)
        else:
            phi = c_rh - m.M_HALFPI
            lam = np.arctan2(x, y)
        phi = np.where(center, self.phi0, phi)
        lam = np.where(center, 0.0, lam)
        phi = np.where(bad, np.nan, phi)
        lam = np.where(bad, np.nan, lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = lam, phi
