"""Regional / historical grids: New Zealand Map Grid, Lambert Conformal
Conic Alternative, Gauss-Schreiber TM, Roussilhe Stereographic,
Rectangular Polyconic — reference
src/projections/{nzmg,lcca,gstmerc,rouss,rpoly}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register


@register
class Nzmg(Operation):
    """New Zealand Map Grid — sixth-order complex polynomial on the
    International ellipsoid (nzmg.cpp).  Earth parameters are fixed by the
    projection definition."""

    name = "nzmg"
    SEC5_TO_RAD = 0.4848136811095359935899141023
    RAD_TO_SEC5 = 2.062648062470963551564733573
    BF = np.array([0.7557853228 + 0.0j,
                   0.249204646 + 0.003371507j,
                   -0.001541739 + 0.041058560j,
                   -0.10162907 + 0.01727609j,
                   -0.26623489 - 0.36249218j,
                   -0.6870983 - 1.1651967j])
    TPSI = (0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
            0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
    TPHI = (1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
            -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)

    def setup(self, params: Params) -> None:
        self.a = 6378388.0
        self.ra = 1.0 / self.a
        self.lam0 = m.DEG_TO_RAD * 173.0
        self.phi0 = m.DEG_TO_RAD * -41.0
        self.x0 = 2510000.0
        self.y0 = 6023150.0

    @classmethod
    def _zpoly(cls, z):
        return m.zpoly1d(z, cls.BF)

    def _fwd(self, c: Coords) -> None:
        dphi = (c.y - self.phi0) * self.RAD_TO_SEC5
        psi = np.full_like(dphi, self.TPSI[-1])
        for coef in self.TPSI[-2::-1]:
            psi = coef + dphi * psi
        psi = psi * dphi
        z = psi + 1j * c.x
        f, _ = self._zpoly(z)
        c.x = f.imag
        c.y = f.real

    def _inv(self, c: Coords) -> None:
        target = c.y + 1j * c.x
        z = target.copy()
        done = np.zeros(z.shape, dtype=bool)
        for _ in range(20):
            f, fp = self._zpoly(z)
            with np.errstate(all="ignore"):
                dz = -(f - target) / fp
            z = np.where(done, z, z + dz)
            done = done | (np.abs(dz.real) + np.abs(dz.imag) <= 1e-10)
            if done.all():
                break
        bad = ~done
        phi = np.full_like(z.real, self.TPHI[-1])
        for coef in self.TPHI[-2::-1]:
            phi = coef + z.real * phi
        phi = self.phi0 + z.real * phi * self.SEC5_TO_RAD
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, z.imag)
        c.y = np.where(bad, np.nan, phi)


@register
class Lcca(Operation):
    """Lambert Conformal Conic Alternative (lcca.cpp) — truncated-cubic
    historical variant."""

    name = "lcca"

    def setup(self, params: Params) -> None:
        self.en = m.enfn(self.ell.n)
        if self.phi0 == 0.0:
            raise ProjError("lcca: lat_0 should be different from 0")
        self.l = float(np.sin(self.phi0))
        self.M0 = float(m.mlfn(self.phi0, self.l, np.cos(self.phi0), self.en))
        s2p0 = self.l * self.l
        R0 = 1.0 / (1.0 - self.es * s2p0)
        N0 = np.sqrt(R0)
        R0 *= self.one_es * N0
        tan0 = np.tan(self.phi0)
        self.r0 = float(N0 / tan0)
        self.C = float(1.0 / (6.0 * R0 * N0))

    @staticmethod
    def _fS(S, C):
        return S * (1.0 + S * S * C)

    @staticmethod
    def _fSp(S, C):
        return 1.0 + 3.0 * S * S * C

    def _fwd(self, c: Coords) -> None:
        S = m.mlfn(c.y, np.sin(c.y), np.cos(c.y), self.en) - self.M0
        r = self.r0 - self._fS(S, self.C)
        lml = c.x * self.l
        c.x = self.k0 * (r * np.sin(lml))
        c.y = self.k0 * (self.r0 - r * np.cos(lml))

    def _inv(self, c: Coords) -> None:
        x = c.x / self.k0
        y = c.y / self.k0
        theta = np.arctan2(x, self.r0 - y)
        dr = y - x * np.tan(0.5 * theta)
        lam = theta / self.l
        S = dr.copy()
        done = np.zeros(S.shape, dtype=bool)
        for _ in range(10):
            dif = (self._fS(S, self.C) - dr) / self._fSp(S, self.C)
            S = np.where(done, S, S - dif)
            done = done | (np.abs(dif) < 1e-12)
            if done.all():
                break
        bad = ~done
        phi = m.inv_mlfn(S + self.M0, self.en)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Gstmerc(Operation):
    """Gauss-Schreiber Transverse Mercator, aka Gauss-Laborde Reunion
    (gstmerc.cpp)."""

    name = "gstmerc"

    def setup(self, params: Params) -> None:
        sp0 = float(np.sin(self.phi0))
        cp0 = float(np.cos(self.phi0))
        self.n1 = float(np.sqrt(1.0 + self.es * cp0 ** 4 / (1.0 - self.es)))
        self.phic = float(np.arcsin(sp0 / self.n1))
        self.c = float(
            np.log(m.tsfn(-self.phic, -sp0 / self.n1, 0.0))
            - self.n1 * np.log(m.tsfn(-self.phi0, -sp0, self.e)))
        self.n2 = float(self.k0 * self.a * np.sqrt(1.0 - self.es)
                        / (1.0 - self.es * sp0 * sp0))
        self.XS = 0.0
        self.YS = -self.n2 * self.phic

    def _fwd(self, c: Coords) -> None:
        L = self.n1 * c.x
        sphi = np.sin(c.y)
        Ls = self.c + self.n1 * np.log(m.tsfn(-c.y, -sphi, self.e))
        sinLs1 = np.sin(L) / np.cosh(Ls)
        Ls1 = np.log(m.tsfn(-np.arcsin(sinLs1), -sinLs1, 0.0))
        c.x = (self.XS + self.n2 * Ls1) * self.ra
        c.y = (self.YS + self.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) * self.ra

    def _inv(self, c: Coords) -> None:
        xn = (c.x * self.a - self.XS) / self.n2
        yn = (c.y * self.a - self.YS) / self.n2
        L = np.arctan(np.sinh(xn) / np.cos(yn))
        sinC = np.sin(yn) / np.cosh(xn)
        LC = np.log(m.tsfn(-np.arcsin(sinC), -sinC, 0.0))
        c.x = L / self.n1
        c.y = -m.phi2(np.exp((LC - self.c) / self.n1), self.e)


@register
class Rouss(Operation):
    """Roussilhe Stereographic (rouss.cpp) — bivariate series in the
    geodesic meridional distance."""

    name = "rouss"

    def setup(self, params: Params) -> None:
        self.md = m.mdist_ini(self.es)
        sp0 = float(np.sin(self.phi0))
        self.s0 = float(m.mdist(self.phi0, sp0, np.cos(self.phi0), self.md))
        es2 = self.es * sp0 * sp0
        t = 1.0 - es2
        N0 = 1.0 / np.sqrt(t)
        R_R0_2 = t * t / self.one_es
        R_R0_4 = R_R0_2 * R_R0_2
        t = np.tan(self.phi0)
        t2 = t * t
        self.C1 = self.A1 = R_R0_2 / 4.0
        self.C2 = self.A2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
        self.A3 = R_R0_2 * t * (1.0 + 4.0 * t2) / (12.0 * N0)
        self.A4 = R_R0_4 / 24.0
        self.A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
        self.A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
        self.B1 = t / (2.0 * N0)
        self.B2 = R_R0_2 / 12.0
        self.B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
        self.B4 = R_R0_2 * t * (2.0 - t2) / (24.0 * N0)
        self.B5 = R_R0_2 * t * (5.0 + 4.0 * t2) / (8.0 * N0)
        self.B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
        self.B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
        self.B8 = R_R0_4 / 120.0
        self.C3 = R_R0_2 * t * (1.0 + t2) / (3.0 * N0)
        self.C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
        self.C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
        self.C6 = R_R0_4 / 16.0
        self.C7 = R_R0_4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
        self.C8 = R_R0_4 * t * (1.0 + t2 * 4.0) / (36.0 * N0)
        self.D1 = t / (2.0 * N0)
        self.D2 = R_R0_2 / 12.0
        self.D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
        self.D4 = R_R0_2 * t * (1.0 + t2) / (8.0 * N0)
        self.D5 = R_R0_2 * t * (1.0 + t2 * 2.0) / (4.0 * N0)
        self.D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
        self.D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
        self.D8 = R_R0_4 / 80.0
        self.D9 = R_R0_4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
        self.D10 = R_R0_4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
        self.D11 = R_R0_4 * t * (37.0 + t2 * 44.0) / (96.0 * N0)

    def _fwd(self, c: Coords) -> None:
        cp = np.cos(c.y)
        sp = np.sin(c.y)
        s = m.mdist(c.y, sp, cp, self.md) - self.s0
        s2 = s * s
        al = c.x * cp / np.sqrt(1.0 - self.es * sp * sp)
        al2 = al * al
        c.x = self.k0 * al * (1.0 + s2 * (self.A1 + s2 * self.A4)
                              - al2 * (self.A2 + s * self.A3 + s2 * self.A5
                                       + al2 * self.A6))
        c.y = self.k0 * (al2 * (self.B1 + al2 * self.B4)
                         + s * (1.0 + al2 * (self.B3 - al2 * self.B6)
                                + s2 * (self.B2 + s2 * self.B8)
                                + s * al2 * (self.B5 + s * self.B7)))

    def _inv(self, c: Coords) -> None:
        x = c.x / self.k0
        y = c.y / self.k0
        x2 = x * x
        y2 = y * y
        al = x * (1.0 - self.C1 * y2
                  + x2 * (self.C2 + self.C3 * y - self.C4 * x2
                          + self.C5 * y2 - self.C7 * x2 * y)
                  + y2 * (self.C6 * y2 - self.C8 * x2 * y))
        s = (self.s0 + y * (1.0 + y2 * (-self.D2 + self.D8 * y2))
             + x2 * (-self.D1
                     + y * (-self.D3 + y * (-self.D5
                                            + y * (-self.D7 + y * self.D11)))
                     + x2 * (self.D4 + y * (self.D6 + y * self.D10)
                             - x2 * self.D9)))
        phi, ok = m.inv_mdist(s, self.md)
        sp = np.sin(phi)
        lam = al * np.sqrt(1.0 - self.es * sp * sp) / np.cos(phi)
        bad = ~ok
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Rpoly(Operation):
    """Rectangular Polyconic (rpoly.cpp) — spherical, forward only."""

    name = "rpoly"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.phi1 = abs(params.r("lat_ts"))
        self.mode = self.phi1 > 1e-9
        if self.mode:
            self.fxb = 0.5 * float(np.sin(self.phi1))
            self.fxa = 0.5 / self.fxb

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.mode:
            fa = np.tan(lam * self.fxb) * self.fxa
        else:
            fa = 0.5 * lam
        small = np.abs(phi) < 1e-9
        with np.errstate(all="ignore"):
            cot = 1.0 / np.tan(phi)
            fa2 = 2.0 * np.arctan(fa * np.sin(phi))
            x = np.where(small, fa + fa, np.sin(fa2) * cot)
            y = np.where(small, -self.phi0,
                         phi - self.phi0 + (1.0 - np.cos(fa2)) * cot)
        c.x, c.y = x, y
