"""Lambert Azimuthal Equal Area (reference src/projections/laea.cpp),
plus the authalic-latitude series helpers (src/auth.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

EPS10 = 1e-10
N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3

# authalic latitude series (src/auth.cpp)
_P00 = 1.0 / 3
_P01 = 31.0 / 180
_P02 = 517.0 / 5040
_P10 = 23.0 / 360
_P11 = 251.0 / 3780
_P20 = 761.0 / 45360


def authset(es: float) -> np.ndarray:
    t = es * es
    apa = np.zeros(3)
    apa[0] = es * _P00 + t * _P01 + t * es * _P02
    apa[1] = t * _P10 + t * es * _P11
    apa[2] = t * es * _P20
    return apa


def authlat(beta, apa):
    t = beta + beta
    return beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t) \
        + apa[2] * np.sin(t + t + t)


@register
class Laea(Operation):
    name = "laea"

    def setup(self, params: Params) -> None:
        t = abs(self.phi0)
        if t > m.M_HALFPI + EPS10:
            raise ProjError("|lat_0| should be <= 90")
        if abs(t - m.M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0 else N_POLE
        elif abs(t) < EPS10:
            self.mode = EQUIT
        else:
            self.mode = OBLIQ
        if self.es != 0.0:
            self.qp = float(m.qsfn(1.0, self.e, self.one_es))
            self.mmf = 0.5 / (1.0 - self.es)
            self.apa = authset(self.es)
            if self.mode in (N_POLE, S_POLE):
                self.dd = 1.0
            elif self.mode == EQUIT:
                self.rq = np.sqrt(0.5 * self.qp)
                self.dd = 1.0 / self.rq
                self.xmf = 1.0
                self.ymf = 0.5 * self.qp
            else:
                self.rq = np.sqrt(0.5 * self.qp)
                sinphi = np.sin(self.phi0)
                self.sinb1 = float(m.qsfn(sinphi, self.e, self.one_es)) / self.qp
                self.cosb1 = np.sqrt(1.0 - self.sinb1 * self.sinb1)
                self.dd = np.cos(self.phi0) / (
                    np.sqrt(1.0 - self.es * sinphi * sinphi)
                    * self.rq * self.cosb1)
                self.xmf = self.rq * self.dd
                self.ymf = self.rq / self.dd
        else:
            if self.mode == OBLIQ:
                self.sinb1 = np.sin(self.phi0)
                self.cosb1 = np.cos(self.phi0)

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        mode = self.mode
        if self.es != 0.0:
            q = m.qsfn(sinphi, self.e, self.one_es)
            if mode in (OBLIQ, EQUIT):
                sinb = q / self.qp
                cosb2 = 1.0 - sinb * sinb
                cosb = np.where(cosb2 > 0, np.sqrt(np.maximum(cosb2, 0)), 0.0)
                if mode == OBLIQ:
                    b = 1.0 + self.sinb1 * sinb + self.cosb1 * cosb * coslam
                else:
                    b = 1.0 + cosb * coslam
                bad = np.abs(b) < EPS10
                b = np.sqrt(2.0 / np.where(bad, np.nan, b))
                if mode == OBLIQ:
                    y = self.ymf * b * (self.cosb1 * sinb
                                        - self.sinb1 * cosb * coslam)
                else:
                    y = b * sinb * self.ymf
                x = self.xmf * b * cosb * sinlam
            else:
                if mode == N_POLE:
                    b = m.M_HALFPI + phi
                    q = self.qp - q
                else:
                    b = phi - m.M_HALFPI
                    q = self.qp + q
                bad = np.abs(b) < EPS10
                ok = q >= 1e-15
                br = np.sqrt(np.where(ok, q, 0.0))
                x = np.where(ok, br * sinlam, 0.0)
                y = np.where(ok, coslam * (br if mode == S_POLE else -br), 0.0)
        else:
            cosphi = np.cos(phi)
            if mode in (EQUIT, OBLIQ):
                if mode == EQUIT:
                    y = 1.0 + cosphi * coslam
                else:
                    y = 1.0 + self.sinb1 * sinphi + self.cosb1 * cosphi * coslam
                bad = y <= EPS10
                y = np.sqrt(2.0 / np.where(bad, np.nan, y))
                x = y * cosphi * sinlam
                if mode == EQUIT:
                    y = y * sinphi
                else:
                    y = y * (self.cosb1 * sinphi
                             - self.sinb1 * cosphi * coslam)
            else:
                cl = -coslam if mode == N_POLE else coslam
                bad = np.abs(phi + self.phi0) < EPS10
                yy = m.M_FORTPI - phi * 0.5
                yy = 2.0 * (np.cos(yy) if mode == S_POLE else np.sin(yy))
                x = yy * sinlam
                y = yy * cl
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        mode = self.mode
        bad = np.zeros(len(c), dtype=bool)
        if self.es != 0.0:
            if mode in (EQUIT, OBLIQ):
                x = x / self.dd
                y = y * self.dd
                rho = np.hypot(x, y)
                center = rho < EPS10
                arg = 0.5 * rho / self.rq
                bad = arg > 1
                sCe = 2.0 * np.arcsin(np.clip(arg, -1, 1))
                cCe = np.cos(sCe)
                sCe = np.sin(sCe)
                x = x * sCe
                safe_rho = np.where(rho == 0, 1.0, rho)
                if mode == OBLIQ:
                    ab = cCe * self.sinb1 + y * sCe * self.cosb1 / safe_rho
                    y = rho * self.cosb1 * cCe - y * self.sinb1 * sCe
                else:
                    ab = y * sCe / safe_rho
                    y = rho * cCe
                lam = np.arctan2(x, y)
                phi = authlat(np.arcsin(np.clip(ab, -1, 1)), self.apa)
                lam = np.where(center, 0.0, lam)
                phi = np.where(center, self.phi0, phi)
            else:
                yy = -y if mode == N_POLE else y
                q = x * x + yy * yy
                center = q == 0.0
                ab = 1.0 - q / self.qp
                if mode == S_POLE:
                    ab = -ab
                lam = np.arctan2(x, yy)
                phi = authlat(np.arcsin(np.clip(ab, -1, 1)), self.apa)
                lam = np.where(center, 0.0, lam)
                phi = np.where(center, self.phi0, phi)
        else:
            rh = np.hypot(x, y)
            hp = rh * 0.5
            bad = hp > 1.0
            z = 2.0 * np.arcsin(np.clip(hp, -1, 1))
            sinz = np.sin(z)
            cosz = np.cos(z)
            safe_rh = np.where(rh == 0, 1.0, rh)
            with np.errstate(all="ignore"):
                if mode == EQUIT:
                    phi = np.where(np.abs(rh) <= EPS10, 0.0,
                                   np.arcsin(np.clip(y * sinz / safe_rh, -1, 1)))
                    x = x * sinz
                    y = cosz * rh
                elif mode == OBLIQ:
                    phi = np.where(
                        np.abs(rh) <= EPS10, self.phi0,
                        np.arcsin(np.clip(
                            cosz * self.sinb1
                            + y * sinz * self.cosb1 / safe_rh, -1, 1)))
                    x = x * sinz * self.cosb1
                    y = (cosz - np.sin(phi) * self.sinb1) * rh
                elif mode == N_POLE:
                    y = -y
                    phi = m.M_HALFPI - z
                else:
                    phi = z - m.M_HALFPI
            lam = np.where(
                (y == 0.0) & (mode in (EQUIT, OBLIQ)), 0.0, np.arctan2(x, y))
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = lam, phi
