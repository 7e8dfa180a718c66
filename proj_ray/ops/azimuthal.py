"""Azimuthal family: orthographic, gnomonic, near-sided/tilted
perspective (reference src/projections/ortho.cpp, gnom.cpp, nsper.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

EPS10 = 1e-10
N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


def _mode_of(phi0: float):
    if abs(abs(phi0) - m.M_HALFPI) <= EPS10:
        return S_POLE if phi0 < 0 else N_POLE
    if abs(phi0) > EPS10:
        return OBLIQ
    return EQUIT


@register
class Ortho(Operation):
    name = "ortho"

    def setup(self, params: Params) -> None:
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        self.mode = _mode_of(self.phi0)
        if self.es != 0:
            self.nu0 = 1.0 / np.sqrt(1.0 - self.es * self.sinph0 ** 2)
            self.y_shift = self.es * self.nu0 * self.sinph0 * self.cosph0
            self.y_scale = 1.0 / np.sqrt(1.0 - self.es * self.cosph0 ** 2)

    # -- spherical ------------------------------------------------------
    def _fwd_s_arrays(self, lam, phi):
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        mode = self.mode
        if mode == EQUIT:
            bad = cosphi * coslam < -EPS10
            y = sinphi
        elif mode == OBLIQ:
            bad = (self.sinph0 * sinphi
                   + self.cosph0 * cosphi * coslam) < -EPS10
            y = self.cosph0 * sinphi - self.sinph0 * cosphi * coslam
        else:
            cl = -coslam if mode == N_POLE else coslam
            bad = np.abs(phi - self.phi0) - EPS10 > m.M_HALFPI
            y = cosphi * cl
        x = cosphi * np.sin(lam)
        return x, y, bad

    def _inv_s_arrays(self, x, y):
        rh = np.hypot(x, y)
        sinc = rh.copy()
        bad = (sinc - 1.0) > EPS10
        sinc = np.minimum(sinc, 1.0)
        cosc = np.sqrt(1.0 - sinc * sinc)
        center = np.abs(rh) <= EPS10
        mode = self.mode
        safe_rh = np.where(rh == 0, 1.0, rh)
        with np.errstate(all="ignore"):
            if mode == N_POLE:
                phi = np.arccos(sinc)
                lam = np.arctan2(x, -y)
            elif mode == S_POLE:
                phi = -np.arccos(sinc)
                lam = np.arctan2(x, y)
            else:
                if mode == EQUIT:
                    sphi = y * sinc / safe_rh
                    xx = x * sinc
                    yy = cosc * rh
                else:
                    sphi = cosc * self.sinph0 + y * sinc * self.cosph0 \
                        / safe_rh
                    yy = (cosc - self.sinph0 * sphi) * rh
                    xx = x * sinc * self.cosph0
                phi = np.where(np.abs(sphi) >= 1.0,
                               np.where(sphi < 0, -m.M_HALFPI, m.M_HALFPI),
                               np.arcsin(np.clip(sphi, -1, 1)))
                lam = np.where(
                    yy == 0.0,
                    np.where(xx == 0.0, 0.0,
                             np.where(xx < 0, -m.M_HALFPI, m.M_HALFPI)),
                    np.arctan2(xx, yy))
        phi = np.where(center, self.phi0, phi)
        lam = np.where(center, 0.0, lam)
        return lam, phi, bad

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.es == 0:
            x, y, bad = self._fwd_s_arrays(lam, phi)
        else:
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            bad = (self.sinph0 * sinphi
                   + self.cosph0 * cosphi * coslam) < -EPS10
            nu = 1.0 / np.sqrt(1.0 - self.es * sinphi * sinphi)
            x = nu * cosphi * sinlam
            y = nu * (sinphi * self.cosph0 - cosphi * self.sinph0 * coslam) \
                + self.es * (self.nu0 * self.sinph0 - nu * sinphi) \
                * self.cosph0
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        if self.es == 0:
            lam, phi, bad = self._inv_s_arrays(x, y)
            c.set_error(bad, ERR_OUTSIDE_DOMAIN)
            c.x = np.where(bad, np.nan, lam)
            c.y = np.where(bad, np.nan, phi)
            return
        mode = self.mode
        with np.errstate(all="ignore"):
            if mode in (N_POLE, S_POLE):
                rh2 = x * x + y * y
                bad = (rh2 - 1.0) > EPS10
                edge = rh2 >= 1.0 - 1e-15
                phi = np.where(
                    edge, 0.0,
                    np.arccos(np.sqrt(np.clip(
                        rh2 * self.one_es / (1 - self.es * rh2), 0, 1)))
                    * (1 if mode == N_POLE else -1))
                lam = np.arctan2(x, y * (-1 if mode == N_POLE else 1))
            elif mode == EQUIT:
                bad = x * x + (y * (self.a / self.ell.b)) ** 2 > 1 + 1e-11
                sinphi2 = np.where(
                    y == 0, 0.0,
                    1.0 / (((1 - self.es) / np.where(y == 0, 1, y)) ** 2
                           + self.es))
                pole = sinphi2 > 1 - 1e-11
                phi = np.arcsin(np.sqrt(np.clip(sinphi2, 0, 1))) \
                    * np.where(y > 0, 1, -1)
                sinlam = x * np.sqrt((1 - self.es * sinphi2)
                                     / np.where(sinphi2 >= 1, np.nan,
                                                1 - sinphi2))
                lam = np.where(np.abs(sinlam) - 1 > -1e-15,
                               m.M_HALFPI * np.where(x > 0, 1, -1),
                               np.arcsin(np.clip(sinlam, -1, 1)))
                phi = np.where(pole, m.M_HALFPI * np.where(y > 0, 1, -1),
                               phi)
                lam = np.where(pole, 0.0, lam)
            else:
                xr = x
                yr = (y - self.y_shift) / self.y_scale
                bad = xr * xr + yr * yr > 1 + 1e-11
                lam, phi, _ = self._inv_s_arrays(xr, yr)
                # Newton refinement (ortho.cpp:240-280)
                done = np.zeros_like(lam, dtype=bool)
                for _ in range(20):
                    cosphi = np.cos(phi)
                    sinphi = np.sin(phi)
                    coslam = np.cos(lam)
                    sinlam = np.sin(lam)
                    ome = 1.0 - self.es * sinphi * sinphi
                    nu = 1.0 / np.sqrt(ome)
                    xn = nu * cosphi * sinlam
                    yn = nu * (sinphi * self.cosph0
                               - cosphi * self.sinph0 * coslam) \
                        + self.es * (self.nu0 * self.sinph0 - nu * sinphi) \
                        * self.cosph0
                    rho = (1.0 - self.es) * nu / ome
                    J11 = -rho * sinphi * sinlam
                    J12 = nu * cosphi * coslam
                    J21 = rho * (cosphi * self.cosph0
                                 + sinphi * self.sinph0 * coslam)
                    J22 = nu * self.sinph0 * cosphi * sinlam
                    D = J11 * J22 - J12 * J21
                    dx = x - xn
                    dy = y - yn
                    dphi = np.where(done, 0.0, (J22 * dx - J12 * dy) / D)
                    dlam = np.where(done, 0.0, (-J21 * dx + J11 * dy) / D)
                    phi = phi + dphi
                    over = phi > m.M_PI / 2
                    under = phi < -m.M_PI / 2
                    phi = np.where(over, m.M_PI - phi, phi)
                    phi = np.where(under, -m.M_PI - phi, phi)
                    lam = np.where(over | under, m.adjlon(lam + m.M_PI), lam)
                    lam = lam + dlam
                    done |= (np.abs(dphi) < 1e-12) & (np.abs(dlam) < 1e-12)
                    if np.all(done | bad):
                        break
                bad |= ~done
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Gnom(Operation):
    """Gnomonic (reference src/projections/gnom.cpp).  Spherical closed
    form; the ellipsoidal variant projects along geodesics with
    rho = m12/M12 (gnom.cpp:118-185, Karney's generalized gnomonic)."""

    name = "gnom"

    def setup(self, params: Params) -> None:
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        self.mode = _mode_of(self.phi0)
        self.ell_mode = self.es != 0
        if self.ell_mode:
            from proj_ray.functions.geodesic import Geodesic

            # unit-radius geodesic: outputs scale by a in finalize
            self.geod = Geodesic(1.0, self.ell.f)
            self.es = 0.0

    def _fwd_ell(self, c: Coords) -> None:
        lat0 = self.phi0 * m.RAD_TO_DEG
        lat1 = c.y * m.RAD_TO_DEG
        lon1 = c.x * m.RAD_TO_DEG
        with np.errstate(all="ignore"):
            _, azi0, _, mm, M12, _ = self.geod.inverse(
                np.full_like(lat1, lat0), np.zeros_like(lon1), lat1, lon1,
                extra=True)
            bad = ~(M12 > 0)
            rho = mm / np.where(bad, 1.0, M12)
            azi0 = np.radians(azi0)
            c.set_error(bad, ERR_OUTSIDE_DOMAIN)
            c.x = np.where(bad, np.nan, rho * np.sin(azi0))
            c.y = np.where(bad, np.nan, rho * np.cos(azi0))

    def _inv_ell(self, c: Coords) -> None:
        # Newton solve along the geodesic line (gnom.cpp:139-185)
        eps_ = 0.01 * np.sqrt(np.finfo(float).eps)
        lat0 = self.phi0 * m.RAD_TO_DEG
        x, y = c.x, c.y
        with np.errstate(all="ignore"):
            azi0 = np.degrees(np.arctan2(x, y))
            rho = np.hypot(x, y)
            s = np.arctan(rho)
            little = rho <= 1
            rho = np.where(little, rho, 1.0 / rho)
            lat1 = np.zeros_like(x)
            lon1 = np.zeros_like(x)
            trip = np.zeros(x.shape, dtype=bool)
            final = np.zeros(x.shape, dtype=bool)
            for _ in range(10):
                latn, lonn, _, mm, M12 = self.geod.direct(
                    np.full_like(x, lat0), np.zeros_like(x), azi0, s,
                    extra=True)
                lat1 = np.where(final, lat1, latn)
                lon1 = np.where(final, lon1, lonn)
                final = final | trip
                if final.all():
                    break
                ds = np.where(little, (mm - rho * M12) * M12,
                              (rho * mm - M12) * mm)
                s = np.where(final, s, s - ds)
                trip = trip | ~(np.abs(ds) >= eps_)
        bad = ~trip
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, np.radians(lon1))
        c.y = np.where(bad, np.nan, np.radians(lat1))

    def _fwd(self, c: Coords) -> None:
        if self.ell_mode:
            self._fwd_ell(c)
            return
        lam, phi = c.x, c.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        mode = self.mode
        if mode == EQUIT:
            yd = cosphi * coslam
        elif mode == OBLIQ:
            yd = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif mode == S_POLE:
            yd = -sinphi
        else:
            yd = sinphi
        bad = yd <= EPS10
        yd = np.where(bad, np.nan, 1.0 / yd)
        x = yd * cosphi * np.sin(lam)
        if mode == EQUIT:
            y = yd * sinphi
        elif mode == OBLIQ:
            y = yd * (self.cosph0 * sinphi
                      - self.sinph0 * cosphi * coslam)
        elif mode == N_POLE:
            y = -yd * cosphi * coslam
        else:
            y = yd * cosphi * coslam
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        if self.ell_mode:
            self._inv_ell(c)
            return
        x, y = c.x.copy(), c.y.copy()
        rh = np.hypot(x, y)
        z = np.arctan(rh)
        sinz = np.sin(z)
        cosz = np.cos(z)
        safe_rh = np.where(rh == 0, 1.0, rh)
        center = np.abs(rh) <= EPS10
        mode = self.mode
        with np.errstate(all="ignore"):
            if mode == EQUIT:
                sphi = y * sinz / safe_rh
                yy = cosz * rh
                xx = x * sinz
            elif mode == OBLIQ:
                sphi = cosz * self.sinph0 + y * sinz * self.cosph0 / safe_rh
                phi_c = np.where(np.abs(sphi) >= 1.0,
                                 np.where(sphi > 0, m.M_HALFPI, -m.M_HALFPI),
                                 np.arcsin(np.clip(sphi, -1, 1)))
                yy = (cosz - self.sinph0 * np.sin(phi_c)) * rh
                xx = x * sinz * self.cosph0
            elif mode == N_POLE:
                sphi = np.cos(z)
                yy = -y
                xx = x
                phi_polar = m.M_HALFPI - z
            else:
                sphi = -np.cos(z)
                yy = y
                xx = x
                phi_polar = z - m.M_HALFPI
            if mode in (EQUIT, OBLIQ):
                phi = np.where(np.abs(sphi) >= 1.0,
                               np.where(sphi < 0, -m.M_HALFPI, m.M_HALFPI),
                               np.arcsin(np.clip(sphi, -1, 1)))
            else:
                phi = phi_polar
            lam = np.arctan2(xx, yy)
        phi = np.where(center, self.phi0, phi)
        lam = np.where(center, 0.0, lam)
        c.x, c.y = lam, phi
