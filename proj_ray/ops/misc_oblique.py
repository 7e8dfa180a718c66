"""Oblated equal area, general oblique transformation, Goode homolosine,
CalCOFI line/station grid — reference
src/projections/{oea,ob_tran,goode,calcofi}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import (Operation, Params, ProjError, RADIANS,
                               WHATEVER, REGISTRY, register)


@register
class Oea(Operation):
    """Oblated equal area (oea.cpp)."""

    name = "oea"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.n = params.f("n")
        if self.n <= 0.0:
            raise ProjError("oea: n should be > 0")
        self.m = params.f("m")
        if self.m <= 0.0:
            raise ProjError("oea: m should be > 0")
        self.theta = params.r("theta")
        self.sp0 = float(np.sin(self.phi0))
        self.cp0 = float(np.cos(self.phi0))
        self.rn = 1.0 / self.n
        self.rm = 1.0 / self.m
        self.two_r_n = 2.0 * self.rn
        self.two_r_m = 2.0 * self.rm
        self.hm = 0.5 * self.m
        self.hn = 0.5 * self.n

    def _fwd(self, c: Coords) -> None:
        cp = np.cos(c.y)
        sp = np.sin(c.y)
        cl = np.cos(c.x)
        with np.errstate(all="ignore"):
            Az = m.aatan2(cp * np.sin(c.x),
                          self.cp0 * sp - self.sp0 * cp * cl) + self.theta
            shz = np.sin(0.5 * m.aacos(self.sp0 * sp + self.cp0 * cp * cl))
            M = m.aasin(shz * np.sin(Az))
            N = m.aasin(shz * np.cos(Az) * np.cos(M)
                        / np.cos(M * self.two_r_m))
            c.y = self.n * np.sin(N * self.two_r_n)
            c.x = (self.m * np.sin(M * self.two_r_m) * np.cos(N)
                   / np.cos(N * self.two_r_n))

    def _inv(self, c: Coords) -> None:
        with np.errstate(all="ignore"):
            N = self.hn * m.aasin(c.y * self.rn)
            M = self.hm * m.aasin(c.x * self.rm * np.cos(N * self.two_r_n)
                                  / np.cos(N))
            xp = 2.0 * np.sin(M)
            yp = 2.0 * np.sin(N) * np.cos(M * self.two_r_m) / np.cos(M)
            Az = m.aatan2(xp, yp) - self.theta
            cAz = np.cos(Az)
            z = 2.0 * m.aasin(0.5 * np.hypot(xp, yp))
            sz = np.sin(z)
            cz = np.cos(z)
            c.y = m.aasin(self.sp0 * cz + self.cp0 * sz * cAz)
            c.x = m.aatan2(sz * np.sin(Az),
                           self.cp0 * cz - self.sp0 * sz * cAz)


@register
class ObTran(Operation):
    """General oblique transformation (ob_tran.cpp): rotate the sphere to
    a new pole, then apply the linked projection's raw kernel (the
    reference calls link->fwd directly, bypassing the link's own
    prepare/finalize)."""

    name = "ob_tran"
    TOL = 1e-10

    def setup(self, params: Params) -> None:
        inner_name = params.s("o_proj")
        if not inner_name:
            raise ProjError("ob_tran: missing o_proj")
        if inner_name == "ob_tran":
            raise ProjError("ob_tran: endless recursion")
        cls = REGISTRY.get(inner_name)
        if cls is None:
            raise ProjError(f"unknown or unsupported projection {inner_name!r}")
        kv = dict(params.kv)
        kv.pop("proj", None)
        kv.pop("inv", None)
        kv.pop("o_proj", None)
        kv["proj"] = inner_name
        self.link = cls(Params(kv))
        if self.link.left != RADIANS:
            # the reference only links projections with 2-D LP kernels
            # (ob_tran.cpp:278-286: P->fwd stays null otherwise)
            raise ProjError("ob_tran: o_proj has no LP kernel")
        if params.has("o_alpha"):
            lamc = params.r("o_lon_c")
            phic = params.r("o_lat_c")
            alpha = params.r("o_alpha")
            if abs(abs(phic) - m.M_HALFPI) <= self.TOL:
                raise ProjError("ob_tran: |o_lat_c| should be < 90")
            self.lamp = float(lamc + np.arctan2(-np.cos(alpha),
                                                -np.sin(alpha) * np.sin(phic)))
            phip = float(np.arcsin(np.clip(np.cos(phic) * np.sin(alpha),
                                           -1, 1)))
        elif params.has("o_lat_p"):
            self.lamp = params.r("o_lon_p")
            phip = params.r("o_lat_p")
        else:
            lam1 = params.r("o_lon_1")
            phi1 = params.r("o_lat_1")
            lam2 = params.r("o_lon_2")
            phi2 = params.r("o_lat_2")
            if abs(phi1) > m.M_HALFPI - self.TOL:
                raise ProjError("ob_tran: |o_lat_1| should be < 90")
            if abs(phi2) > m.M_HALFPI - self.TOL:
                raise ProjError("ob_tran: |o_lat_2| should be < 90")
            if abs(phi1 - phi2) < self.TOL:
                raise ProjError("ob_tran: o_lat_1 should differ from o_lat_2")
            if abs(phi1) < self.TOL:
                raise ProjError("ob_tran: o_lat_1 should not be zero")
            self.lamp = float(np.arctan2(
                np.cos(phi1) * np.sin(phi2) * np.cos(lam1)
                - np.sin(phi1) * np.cos(phi2) * np.cos(lam2),
                np.sin(phi1) * np.cos(phi2) * np.sin(lam2)
                - np.cos(phi1) * np.sin(phi2) * np.sin(lam1)))
            phip = float(np.arctan(-np.cos(self.lamp - lam1) / np.tan(phi1)))
        self.oblique = abs(phip) > self.TOL
        if self.oblique:
            self.cphip = float(np.cos(phip))
            self.sphip = float(np.sin(phip))
        if self.link.right == RADIANS:
            self.right = WHATEVER

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        with np.errstate(all="ignore"):
            if self.oblique:
                # Snyder (5-8b) / (5-7)
                c.x = m.adjlon(
                    m.aatan2(cosphi * np.sin(lam),
                             self.sphip * cosphi * coslam
                             + self.cphip * sinphi) + self.lamp)
                c.y = m.aasin(self.sphip * sinphi
                              - self.cphip * cosphi * coslam)
            else:
                c.x = m.adjlon(m.aatan2(cosphi * np.sin(lam), sinphi)
                               + self.lamp)
                c.y = m.aasin(-cosphi * coslam)
        self.link._fwd(c)

    def _inv(self, c: Coords) -> None:
        self.link._inv(c)
        with np.errstate(all="ignore"):
            if self.oblique:
                lam = c.x - self.lamp
                coslam = np.cos(lam)
                sinphi = np.sin(c.y)
                cosphi = np.cos(c.y)
                c.y = m.aasin(self.sphip * sinphi
                              + self.cphip * cosphi * coslam)
                c.x = m.aatan2(cosphi * np.sin(lam),
                               self.sphip * cosphi * coslam
                               - self.cphip * sinphi)
            else:
                cosphi = np.cos(c.y)
                t = c.x - self.lamp
                c.x = m.aatan2(cosphi * np.sin(t), -np.sin(c.y))
                c.y = m.aasin(cosphi * np.cos(t))


@register
class Goode(Operation):
    """Goode homolosine (goode.cpp): sinusoidal inside |phi| <= 40°44',
    shifted Mollweide outside."""

    name = "goode"
    Y_COR = 0.05280
    PHI_LIM = 0.71093078197902358062

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.sinu = REGISTRY["sinu"](Params.parse("proj=sinu R=1"))
        self.moll = REGISTRY["moll"](Params.parse("proj=moll R=1"))

    def _run_both(self, c: Coords, inverse: bool, use_moll):
        cs = Coords(c.x.copy(), c.y.copy(), c.z.copy(), c.t.copy())
        cm = Coords(c.x.copy(), c.y.copy(), c.z.copy(), c.t.copy())
        if inverse:
            self.sinu._inv(cs)
            self.moll._inv(cm)
        else:
            self.sinu._fwd(cs)
            self.moll._fwd(cm)
        c.x = np.where(use_moll, cm.x, cs.x)
        c.y = np.where(use_moll, cm.y, cs.y)
        c.err = np.where(use_moll, cm.err, cs.err)

    def _fwd(self, c: Coords) -> None:
        phi = c.y
        use_moll = np.abs(phi) > self.PHI_LIM
        self._run_both(c, False, use_moll)
        c.y = np.where(use_moll,
                       c.y - np.where(phi >= 0.0, self.Y_COR, -self.Y_COR),
                       c.y)

    def _inv(self, c: Coords) -> None:
        y = c.y
        use_moll = np.abs(y) > self.PHI_LIM
        c.y = np.where(use_moll,
                       y + np.where(y >= 0.0, self.Y_COR, -self.Y_COR), y)
        self._run_both(c, True, use_moll)


@register
class Calcofi(Operation):
    """CalCOFI oceanographic line/station grid (calcofi.cpp)."""

    name = "calcofi"
    EPS10 = 1e-10
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80.0
    PT_O_STATION = 60.0
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882

    def setup(self, params: Params) -> None:
        # output is line/station numbers: suppress earth scaling, offsets
        # and longitude wrapping (calcofi.cpp:150-156)
        self.lam0 = 0.0
        self.a = 1.0
        self.ra = 1.0
        self.x0 = 0.0
        self.y0 = 0.0
        self.over = True

    def _merc_y(self, phi):
        if self.es != 0.0:
            return -np.log(m.tsfn(phi, np.sin(phi), self.e))
        return np.log(np.tan(m.M_FORTPI + 0.5 * phi))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        bad = np.abs(np.abs(phi) - m.M_HALFPI) <= self.EPS10
        with np.errstate(all="ignore"):
            y = self._merc_y(phi)
            oy = float(self._merc_y(np.float64(self.PT_O_PHI)))
            l1 = (y - oy) * np.tan(self.ROT)
            l2 = -lam - l1 + self.PT_O_LAMBDA
            ry = l2 * np.cos(self.ROT) * np.sin(self.ROT) + y
            if self.es != 0.0:
                ry = m.phi2(np.exp(-ry), self.e)
            else:
                ry = m.M_HALFPI - 2.0 * np.arctan(np.exp(-ry))
            x = (self.PT_O_LINE - m.RAD_TO_DEG * (ry - self.PT_O_PHI)
                 * 5.0 / np.cos(self.ROT))
            yy = (self.PT_O_STATION + m.RAD_TO_DEG * (ry - phi)
                  * 15.0 / np.sin(self.ROT))
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, yy)

    def _inv(self, c: Coords) -> None:
        with np.errstate(all="ignore"):
            ry = (self.PT_O_PHI - self.LINE_TO_RAD
                  * (c.x - self.PT_O_LINE) * np.cos(self.ROT))
            phi = (ry - self.STATION_TO_RAD
                   * (c.y - self.PT_O_STATION) * np.sin(self.ROT))
            oymctr = float(self._merc_y(np.float64(self.PT_O_PHI)))
            rymctr = self._merc_y(ry)
            xymctr = self._merc_y(phi)
            l1 = (xymctr - oymctr) * np.tan(self.ROT)
            l2 = (rymctr - xymctr) / (np.cos(self.ROT) * np.sin(self.ROT))
            c.x = self.PT_O_LAMBDA - (l1 + l2)
            c.y = phi
