"""Stereographic + UPS (reference src/projections/stere.cpp).

Polar / oblique / equatorial modes, spherical and ellipsoidal; the
ellipsoidal inverse is the reference's fixed-point iteration (NITER=8,
CONV=1e-10, stere.cpp:139-186) vectorized with convergence masks.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

EPS10 = 1e-10
TOL = 1e-8
NITER = 8
CONV = 1e-10

S_POLE, N_POLE, OBLIQ, EQUIT = 0, 1, 2, 3


def _ssfn(phit, sinphi, e):
    sinphi = sinphi * e
    return np.tan(0.5 * (m.M_HALFPI + phit)) * (
        (1.0 - sinphi) / (1.0 + sinphi)) ** (0.5 * e)


@register
class Stere(Operation):
    name = "stere"

    def _setup_stere(self) -> None:
        t = abs(self.phi0)
        if abs(t - m.M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0 else N_POLE
        else:
            self.mode = OBLIQ if t > EPS10 else EQUIT
        self.phits = abs(self.phits)
        e = self.e
        if self.es != 0.0:
            if self.mode in (N_POLE, S_POLE):
                if abs(self.phits - m.M_HALFPI) < EPS10:
                    self.akm1 = 2.0 * self.k0 / np.sqrt(
                        (1 + e) ** (1 + e) * (1 - e) ** (1 - e))
                else:
                    t = np.sin(self.phits)
                    self.akm1 = float(
                        np.cos(self.phits) / m.tsfn(self.phits, t, e))
                    t *= e
                    self.akm1 /= np.sqrt(1.0 - t * t)
            else:
                t = np.sin(self.phi0)
                X = 2.0 * np.arctan(_ssfn(self.phi0, t, e)) - m.M_HALFPI
                t *= e
                self.akm1 = float(2.0 * self.k0 * np.cos(self.phi0)
                                  / np.sqrt(1.0 - t * t))
                self.sinX1 = float(np.sin(X))
                self.cosX1 = float(np.cos(X))
        else:
            if self.mode == OBLIQ:
                self.sinX1 = float(np.sin(self.phi0))
                self.cosX1 = float(np.cos(self.phi0))
            if self.mode in (OBLIQ, EQUIT):
                self.akm1 = 2.0 * self.k0
            else:
                if abs(self.phits - m.M_HALFPI) >= EPS10:
                    self.akm1 = float(np.cos(self.phits)
                                      / np.tan(m.M_FORTPI - 0.5 * self.phits))
                else:
                    self.akm1 = 2.0 * self.k0

    def setup(self, params: Params) -> None:
        self.phits = params.r("lat_ts") if params.has("lat_ts") else m.M_HALFPI
        self._setup_stere()

    # ------------------------------------------------------------------
    def _fwd(self, c: Coords) -> None:
        if self.es != 0.0:
            self._fwd_e(c)
        else:
            self._fwd_s(c)

    def _fwd_e(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        mode = self.mode
        bad = np.zeros(len(c), dtype=bool)
        if mode in (OBLIQ, EQUIT):
            X = 2.0 * np.arctan(_ssfn(phi, sinphi, self.e)) - m.M_HALFPI
            sinX = np.sin(X)
            cosX = np.cos(X)
            if mode == OBLIQ:
                denom = self.cosX1 * (
                    1.0 + self.sinX1 * sinX + self.cosX1 * cosX * coslam)
                bad = denom == 0
                A = self.akm1 / np.where(bad, np.nan, denom)
                y = A * (self.cosX1 * sinX - self.sinX1 * cosX * coslam)
                x = A * cosX
            else:
                denom = 1.0 + cosX * coslam
                zero = denom == 0.0
                A = self.akm1 / np.where(zero, np.nan, denom)
                y = np.where(zero, np.inf, A * sinX)
                x = A * cosX
        else:
            if mode == S_POLE:
                phi = -phi
                coslam = -coslam
                sinphi = -sinphi
            x = np.where(np.abs(phi - m.M_HALFPI) < 1e-15, 0.0,
                         self.akm1 * m.tsfn(phi, sinphi, self.e))
            y = -x * coslam
        x = x * sinlam
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def _fwd_s(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        mode = self.mode
        if mode in (EQUIT, OBLIQ):
            if mode == EQUIT:
                y = 1.0 + cosphi * coslam
            else:
                y = 1.0 + self.sinX1 * sinphi + self.cosX1 * cosphi * coslam
            bad = y <= EPS10
            y = self.akm1 / np.where(bad, np.nan, y)
            x = y * cosphi * sinlam
            if mode == EQUIT:
                y = y * sinphi
            else:
                y = y * (self.cosX1 * sinphi - self.sinX1 * cosphi * coslam)
        else:
            if mode == N_POLE:
                coslam = -coslam
                phi = -phi
            bad = np.abs(phi - m.M_HALFPI) < TOL
            y = self.akm1 * np.tan(m.M_FORTPI + 0.5 * phi)
            x = sinlam * y
            y = y * coslam
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    # ------------------------------------------------------------------
    def _inv(self, c: Coords) -> None:
        if self.es != 0.0:
            self._inv_e(c)
        else:
            self._inv_s(c)

    def _inv_e(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        rho = np.hypot(x, y)
        mode = self.mode
        if mode in (OBLIQ, EQUIT):
            tp = 2.0 * np.arctan2(rho * self.cosX1, self.akm1)
            cosphi = np.cos(tp)
            sinphi = np.sin(tp)
            with np.errstate(all="ignore"):
                phi_l = np.where(
                    rho == 0.0,
                    np.arcsin(np.clip(cosphi * self.sinX1, -1, 1)),
                    np.arcsin(np.clip(
                        cosphi * self.sinX1 + y * sinphi * self.cosX1
                        / np.where(rho == 0, 1.0, rho), -1, 1)))
            tp = np.tan(0.5 * (m.M_HALFPI + phi_l))
            x = x * sinphi
            y = rho * self.cosX1 * cosphi - y * self.sinX1 * sinphi
            halfpi = m.M_HALFPI
            halfe = 0.5 * self.e
        else:
            if mode == N_POLE:
                y = -y
            tp = -rho / self.akm1
            phi_l = m.M_HALFPI - 2.0 * np.arctan(tp)
            halfpi = -m.M_HALFPI
            halfe = -0.5 * self.e
        phi = np.full_like(x, np.nan)
        done = np.zeros(len(c), dtype=bool)
        for _ in range(NITER):
            sinphi = self.e * np.sin(phi_l)
            phi_new = 2.0 * np.arctan(
                tp * ((1.0 + sinphi) / (1.0 - sinphi)) ** halfe) - halfpi
            conv = np.abs(phi_l - phi_new) < CONV
            newly = conv & ~done
            phi = np.where(newly, phi_new, phi)
            done |= conv
            phi_l = phi_new
        bad = ~done
        if mode == S_POLE:
            phi = -phi
        lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)

    def _inv_s(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        rh = np.hypot(x, y)
        cc = 2.0 * np.arctan(rh / self.akm1)
        sinc = np.sin(cc)
        cosc = np.cos(cc)
        mode = self.mode
        with np.errstate(all="ignore"):
            if mode == EQUIT:
                phi = np.where(np.abs(rh) <= EPS10, 0.0,
                               np.arcsin(np.clip(
                                   y * sinc / np.where(rh == 0, 1, rh), -1, 1)))
                lam = np.where((cosc != 0.0) | (x != 0.0),
                               np.arctan2(x * sinc, cosc * rh), 0.0)
            elif mode == OBLIQ:
                phi = np.where(
                    np.abs(rh) <= EPS10, self.phi0,
                    np.arcsin(np.clip(
                        cosc * self.sinX1
                        + y * sinc * self.cosX1 / np.where(rh == 0, 1, rh),
                        -1, 1)))
                ct = cosc - self.sinX1 * np.sin(phi)
                lam = np.where((ct != 0.0) | (x != 0.0),
                               np.arctan2(x * sinc * self.cosX1, ct * rh), 0.0)
            else:
                yy = -y if mode == N_POLE else y
                phi = np.where(np.abs(rh) <= EPS10, self.phi0,
                               np.arcsin(np.clip(
                                   -cosc if mode == S_POLE else cosc, -1, 1)))
                lam = np.where((x == 0.0) & (yy == 0.0), 0.0,
                               np.arctan2(x, yy))
        c.x, c.y = lam, phi


@register
class Ups(Stere):
    name = "ups"

    def setup(self, params: Params) -> None:
        self.phi0 = -m.M_HALFPI if params.b("south") else m.M_HALFPI
        if self.es == 0.0:
            raise ProjError("ups: only ellipsoidal formulation supported")
        self.k0 = 0.994
        self.x0 = 2000000.0
        self.y0 = 2000000.0
        self.phits = m.M_HALFPI
        self.lam0 = 0.0
        self._setup_stere()
