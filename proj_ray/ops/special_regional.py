"""Laborde (Madagascar), Colombia Urban, Chamberlin Trimetric —
reference src/projections/{labrd,col_urban,chamb}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import Operation, Params, ProjError, register


@register
class Labrd(Operation):
    """Laborde oblique mercator for Madagascar (labrd.cpp)."""

    name = "labrd"

    def setup(self, params: Params) -> None:
        if self.phi0 == 0.0:
            raise ProjError("labrd: lat_0 should be different from 0")
        Az = params.r("azi")
        sinp = float(np.sin(self.phi0))
        t = 1.0 - self.es * sinp * sinp
        N = 1.0 / np.sqrt(t)
        R = self.one_es * N / t
        self.kRg = float(self.k0 * np.sqrt(N * R))
        self.p0s = float(np.arctan(np.sqrt(R / N) * np.tan(self.phi0)))
        self.A = sinp / float(np.sin(self.p0s))
        t = self.e * sinp
        self.C = float(
            0.5 * self.e * self.A * np.log((1.0 + t) / (1.0 - t))
            - self.A * np.log(np.tan(m.M_FORTPI + 0.5 * self.phi0))
            + np.log(np.tan(m.M_FORTPI + 0.5 * self.p0s)))
        t = Az + Az
        self.Cb = 1.0 / (12.0 * self.kRg * self.kRg)
        self.Ca = (1.0 - float(np.cos(t))) * self.Cb
        self.Cb *= float(np.sin(t))
        self.Cc = 3.0 * (self.Ca * self.Ca - self.Cb * self.Cb)
        self.Cd = 6.0 * self.Ca * self.Cb

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        with np.errstate(all="ignore"):
            V1 = self.A * np.log(np.tan(m.M_FORTPI + 0.5 * phi))
            t = self.e * np.sin(phi)
            V2 = 0.5 * self.e * self.A * np.log((1.0 + t) / (1.0 - t))
            ps = 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - m.M_FORTPI)
            I1 = ps - self.p0s
            cosps = np.cos(ps)
            cosps2 = cosps * cosps
            sinps = np.sin(ps)
            sinps2 = sinps * sinps
            I4 = self.A * cosps
            I2 = 0.5 * self.A * I4 * sinps
            I3 = I2 * self.A * self.A * (5.0 * cosps2 - sinps2) / 12.0
            I6 = I4 * self.A * self.A
            I5 = I6 * (cosps2 - sinps2) / 6.0
            I6 = I6 * (self.A * self.A
                       * (5.0 * cosps2 * cosps2
                          + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0)
            t = lam * lam
            x = self.kRg * lam * (I4 + t * (I5 + t * I6))
            y = self.kRg * (I1 + t * (I2 + t * I3))
            x2 = x * x
            y2 = y * y
            V1 = 3.0 * x * y2 - x * x2
            V2 = y * y2 - 3.0 * x2 * y
            c.x = x + self.Ca * V1 + self.Cb * V2
            c.y = y + self.Ca * V2 - self.Cb * V1

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        with np.errstate(all="ignore"):
            x2 = x * x
            y2 = y * y
            V1 = 3.0 * x * y2 - x * x2
            V2 = y * y2 - 3.0 * x2 * y
            V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
            V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
            x = x + (-self.Ca * V1 - self.Cb * V2 + self.Cc * V3
                     + self.Cd * V4)
            y = y + (self.Cb * V1 - self.Ca * V2 - self.Cd * V3
                     + self.Cc * V4)
            ps = self.p0s + y / self.kRg
            pe = ps + self.phi0 - self.p0s
            for _ in range(20):
                V1 = self.A * np.log(np.tan(m.M_FORTPI + 0.5 * pe))
                tpe = self.e * np.sin(pe)
                V2 = (0.5 * self.e * self.A
                      * np.log((1.0 + tpe) / (1.0 - tpe)))
                t = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + self.C))
                                - m.M_FORTPI)
                pe = pe + t
                if np.nanmax(np.abs(t), initial=0.0) < 1e-10:
                    break
            t = self.e * np.sin(pe)
            t = 1.0 - t * t
            Re = self.one_es / (t * np.sqrt(t))
            t = np.tan(ps)
            t2 = t * t
            s = self.kRg * self.kRg
            d = Re * self.k0 * self.kRg
            I7 = t / (2.0 * d)
            I8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
            d = np.cos(ps) * self.kRg * self.A
            I9 = 1.0 / d
            d = d * s
            I10 = (1.0 + 2.0 * t2) / (6.0 * d)
            I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
            x2 = x * x
            c.y = pe + x2 * (-I7 + I8 * x2)
            c.x = x * (I9 + x2 * (-I10 + x2 * I11))


@register
class ColUrban(Operation):
    """Colombia Urban (col_urban.cpp; IOGP Guidance Note 7-2)."""

    name = "col_urban"

    def setup(self, params: Params) -> None:
        h0_unscaled = params.f("h_0")
        self.h0 = h0_unscaled / self.a
        sinphi0 = float(np.sin(self.phi0))
        nu0 = 1.0 / np.sqrt(1.0 - self.es * sinphi0 * sinphi0)
        self.A = 1.0 + self.h0 / nu0
        self.rho0 = ((1.0 - self.es)
                     / (1.0 - self.es * sinphi0 * sinphi0) ** 1.5)
        self.B = float(np.tan(self.phi0)) / (2.0 * self.rho0 * nu0)
        self.C = 1.0 + self.h0
        self.D = self.rho0 * (1.0 + self.h0 / (1.0 - self.es))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1.0 - self.es * sinphi * sinphi)
        lnc = lam * nu * cosphi
        sinphi_m = np.sin(0.5 * (phi + self.phi0))
        rho_m = (1.0 - self.es) / (1.0 - self.es * sinphi_m * sinphi_m) ** 1.5
        G = 1.0 + self.h0 / rho_m
        c.x = self.A * lnc
        c.y = G * self.rho0 * ((phi - self.phi0) + self.B * lnc * lnc)

    def _inv(self, c: Coords) -> None:
        phi = (self.phi0 + c.y / self.D
               - self.B * (c.x / self.C) * (c.x / self.C))
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1.0 - self.es * sinphi * sinphi)
        c.x = c.x / (self.C * nu * np.cos(phi))
        c.y = phi


def _vect(dphi, c1, s1, c2, s2, dlam):
    """Distance/azimuth between points (chamb.cpp vect), vectorized."""
    cdl = np.cos(dlam)
    close = (np.abs(dphi) <= 1.0) & (np.abs(dlam) <= 1.0)
    dp = np.sin(0.5 * dphi)
    dl = np.sin(0.5 * dlam)
    r = np.where(close,
                 2.0 * m.aasin(np.sqrt(dp * dp + c1 * c2 * dl * dl)),
                 m.aacos(s1 * s2 + c1 * c2 * cdl))
    Az = np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl)
    tiny = np.abs(r) <= 1e-9
    return np.where(tiny, 0.0, r), np.where(tiny, 0.0, Az)


def _lc(b, c, a):
    return m.aacos(0.5 * (b * b + c * c - a * a) / (b * c))


@register
class Chamb(Operation):
    """Chamberlin trimetric (chamb.cpp) — spherical, forward only."""

    name = "chamb"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.cp = []
        for i in (1, 2, 3):
            phi = params.r(f"lat_{i}")
            lam = float(m.adjlon(params.r(f"lon_{i}") - self.lam0))
            self.cp.append({"phi": phi, "lam": lam,
                            "cosphi": float(np.cos(phi)),
                            "sinphi": float(np.sin(phi))})
        for i in range(3):
            j = (i + 1) % 3
            r, Az = _vect(np.float64(self.cp[j]["phi"] - self.cp[i]["phi"]),
                          self.cp[i]["cosphi"], self.cp[i]["sinphi"],
                          self.cp[j]["cosphi"], self.cp[j]["sinphi"],
                          np.float64(self.cp[j]["lam"] - self.cp[i]["lam"]))
            if float(r) == 0.0:
                raise ProjError("chamb: control points should be distinct")
            self.cp[i]["vr"] = float(r)
            self.cp[i]["vAz"] = float(Az)
        self.beta_0 = float(_lc(self.cp[0]["vr"], self.cp[2]["vr"],
                                self.cp[1]["vr"]))
        self.beta_1 = float(_lc(self.cp[0]["vr"], self.cp[1]["vr"],
                                self.cp[2]["vr"]))
        self.beta_2 = np.pi - self.beta_0
        py = self.cp[2]["vr"] * float(np.sin(self.beta_0))
        self.cp[0]["py"] = py
        self.cp[1]["py"] = py
        self.p_y = 2.0 * py
        self.cp[2]["py"] = 0.0
        self.cp[1]["px"] = 0.5 * self.cp[0]["vr"]
        self.cp[0]["px"] = -self.cp[1]["px"]
        self.cp[2]["px"] = (self.cp[0]["px"]
                            + self.cp[2]["vr"] * float(np.cos(self.beta_0)))
        self.p_x = self.cp[2]["px"]

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        vr = []
        vAz = []
        at_ctl = np.full(lam.shape, -1, dtype=np.int64)
        with np.errstate(all="ignore"):
            for i in range(3):
                r, Az = _vect(phi - self.cp[i]["phi"], self.cp[i]["cosphi"],
                              self.cp[i]["sinphi"], cosphi, sinphi,
                              lam - self.cp[i]["lam"])
                hit = (r == 0.0) & (at_ctl < 0)
                at_ctl = np.where(hit, i, at_ctl)
                vr.append(r)
                vAz.append(m.adjlon(Az - self.cp[i]["vAz"]))
            x = np.full_like(lam, self.p_x)
            y = np.full_like(lam, self.p_y)
            for i in range(3):
                j = (i + 1) % 3
                a = _lc(self.cp[i]["vr"], vr[i], vr[j])
                a = np.where(vAz[i] < 0.0, -a, a)
                if i == 0:
                    x = x + vr[i] * np.cos(a)
                    y = y - vr[i] * np.sin(a)
                elif i == 1:
                    a = self.beta_1 - a
                    x = x - vr[i] * np.cos(a)
                    y = y - vr[i] * np.sin(a)
                else:
                    a = self.beta_2 - a
                    x = x + vr[i] * np.cos(a)
                    y = y + vr[i] * np.sin(a)
            x = x / 3.0
            y = y / 3.0
        for i in range(3):
            sel = at_ctl == i
            x = np.where(sel, self.cp[i]["px"], x)
            y = np.where(sel, self.cp[i]["py"], y)
        c.x, c.y = x, y
