"""Oblique Mercator (Hotine) and Swiss Oblique Mercator
(reference src/projections/omerc.cpp, somerc.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

TOL = 1e-7
EPS = 1e-10


@register
class Omerc(Operation):
    name = "omerc"

    def setup(self, params: Params) -> None:
        Q = self
        Q.no_rot = params.b("no_rot")
        alp = params.has("alpha")
        gam = params.has("gamma")
        alpha_c = params.r("alpha")
        gamma = params.r("gamma")
        if alp or gam:
            lamc = params.r("lonc")
            no_off = params.b("no_off") or params.b("no_uoff")
        else:
            no_off = False
            lam1 = params.r("lon_1")
            phi1 = params.r("lat_1")
            lam2 = params.r("lon_2")
            phi2 = params.r("lat_2")
            if abs(phi1) > m.M_HALFPI - TOL or abs(phi2) > m.M_HALFPI - TOL:
                raise ProjError("|lat_1|,|lat_2| should be < 90")
            if abs(phi1 - phi2) <= TOL:
                raise ProjError("lat_1 should differ from lat_2")
            if abs(phi1) <= TOL:
                raise ProjError("lat_1 should differ from 0")
            if abs(abs(self.phi0) - m.M_HALFPI) <= TOL:
                raise ProjError("|lat_0| should be < 90")
        com = np.sqrt(self.one_es)
        if abs(self.phi0) > EPS:
            sinph0 = np.sin(self.phi0)
            cosph0 = np.cos(self.phi0)
            con = 1.0 - self.es * sinph0 * sinph0
            B = cosph0 * cosph0
            B = np.sqrt(1.0 + self.es * B * B / self.one_es)
            A = B * self.k0 * com / con
            D = B * com / (cosph0 * np.sqrt(con))
            F = D * D - 1.0
            if F <= 0:
                F = 0.0
            else:
                F = np.sqrt(F)
                if self.phi0 < 0:
                    F = -F
            F = F + D
            E = F * float(m.tsfn(self.phi0, sinph0, self.e)) ** B
        else:
            B = 1.0 / com
            A = self.k0
            E = D = F = 1.0
        self.B, self.A, self.E = float(B), float(A), float(E)
        if alp or gam:
            if alp:
                gamma0 = float(m.aasin(np.sin(alpha_c) / D))
                if not gam:
                    gamma = alpha_c
            else:
                gamma0 = gamma
                sa = D * np.sin(gamma0)
                if abs(sa) > 1.00000000000001:
                    raise ProjError("invalid gamma for given lat_0")
                alpha_c = float(m.aasin(sa))
            if abs(abs(self.phi0) - m.M_HALFPI) <= TOL:
                raise ProjError("|lat_0| should be < 90")
            self.lam0 = lamc - float(
                m.aasin(0.5 * (F - 1.0 / F) * np.tan(gamma0))) / self.B
        else:
            H = float(m.tsfn(phi1, np.sin(phi1), self.e)) ** B
            L = float(m.tsfn(phi2, np.sin(phi2), self.e)) ** B
            F = self.E / H
            p = (L - H) / (L + H)
            if p == 0:
                raise ProjError("invalid eccentricity")
            J = self.E * self.E
            J = (J - L * H) / (J + L * H)
            con = lam1 - lam2
            if con < -np.pi:
                lam2 -= m.M_TWOPI
            elif con > np.pi:
                lam2 += m.M_TWOPI
            self.lam0 = float(m.adjlon(np.array([
                0.5 * (lam1 + lam2)
                - np.arctan(J * np.tan(0.5 * B * (lam1 - lam2)) / p) / B]))[0])
            denom = F - 1.0 / F
            if denom == 0:
                raise ProjError("invalid eccentricity")
            gamma0 = float(np.arctan(2.0 * np.sin(
                B * float(m.adjlon(np.array([lam1 - self.lam0]))[0]))
                / denom))
            gamma = alpha_c = float(m.aasin(D * np.sin(gamma0)))
        self.singam = float(np.sin(gamma0))
        self.cosgam = float(np.cos(gamma0))
        self.sinrot = float(np.sin(gamma))
        self.cosrot = float(np.cos(gamma))
        self.rB = 1.0 / self.B
        self.ArB = self.A * self.rB
        self.BrA = 1.0 / self.ArB
        if no_off:
            self.u_0 = 0.0
        else:
            self.u_0 = abs(self.ArB * np.arctan(
                np.sqrt(max(D * D - 1.0, 0.0)) / np.cos(alpha_c)))
            if self.phi0 < 0:
                self.u_0 = -self.u_0
        F2 = 0.5 * gamma0
        self.v_pole_n = self.ArB * np.log(np.tan(m.M_FORTPI - F2))
        self.v_pole_s = self.ArB * np.log(np.tan(m.M_FORTPI + F2))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        polar = np.abs(np.abs(phi) - m.M_HALFPI) <= EPS
        with np.errstate(all="ignore"):
            W = self.E / m.tsfn(phi, np.sin(phi), self.e) ** self.B
            one_div_W = 1.0 / W
            S = 0.5 * (W - one_div_W)
            T = 0.5 * (W + one_div_W)
            V = np.sin(self.B * lam)
            U = (S * self.singam - V * self.cosgam) / T
            bad = (np.abs(np.abs(U) - 1.0) < EPS) & ~polar
            v = 0.5 * self.ArB * np.log((1.0 - U) / (1.0 + U))
            temp = np.cos(self.B * lam)
            u = np.where(np.abs(temp) < TOL, self.A * lam,
                         self.ArB * np.arctan2(
                             S * self.cosgam + V * self.singam, temp))
        v = np.where(polar, np.where(phi > 0, self.v_pole_n,
                                     self.v_pole_s), v)
        u = np.where(polar, self.ArB * phi, u)
        if self.no_rot:
            x, y = u, v
        else:
            u = u - self.u_0
            x = v * self.cosrot + u * self.sinrot
            y = u * self.cosrot - v * self.sinrot
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        if self.no_rot:
            v = c.y.copy()
            u = c.x.copy()
        else:
            v = c.x * self.cosrot - c.y * self.sinrot
            u = c.y * self.cosrot + c.x * self.sinrot + self.u_0
        with np.errstate(all="ignore"):
            Qp = np.exp(-self.BrA * v)
            bad = Qp == 0
            Sp = 0.5 * (Qp - 1.0 / Qp)
            Tp = 0.5 * (Qp + 1.0 / Qp)
            Vp = np.sin(self.BrA * u)
            Up = (Vp * self.cosgam + Sp * self.singam) / Tp
            pole = np.abs(np.abs(Up) - 1.0) < EPS
            t = self.E / np.sqrt((1.0 + Up) / (1.0 - Up))
            phi = m.phi2(t ** (1.0 / self.B), self.e)
            bad |= np.isnan(phi) & ~pole
            lam = -self.rB * np.arctan2(
                Sp * self.cosgam - Vp * self.singam,
                np.cos(self.BrA * u))
        phi = np.where(pole, np.where(Up < 0, -m.M_HALFPI, m.M_HALFPI), phi)
        lam = np.where(pole, 0.0, lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Somerc(Operation):
    name = "somerc"

    def setup(self, params: Params) -> None:
        self.hlf_e = 0.5 * self.e
        cp = np.cos(self.phi0)
        cp = cp * cp
        self.c = float(np.sqrt(1 + self.es * cp * cp * self.rone_es))
        sp = np.sin(self.phi0)
        self.sinp0 = float(sp / self.c)
        phip0 = float(m.aasin(self.sinp0))
        self.cosp0 = float(np.cos(phip0))
        sp = sp * self.e
        self.K = float(np.log(np.tan(m.M_FORTPI + 0.5 * phip0))
                       - self.c * (np.log(np.tan(m.M_FORTPI
                                                 + 0.5 * self.phi0))
                                   - self.hlf_e * np.log((1.0 + sp)
                                                         / (1.0 - sp))))
        self.kR = float(self.k0 * np.sqrt(self.one_es) / (1.0 - sp * sp))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        with np.errstate(all="ignore"):
            sp = self.e * np.sin(phi)
            phip = 2.0 * np.arctan(np.exp(
                self.c * (np.log(np.tan(m.M_FORTPI + 0.5 * phi))
                          - self.hlf_e * np.log((1.0 + sp) / (1.0 - sp)))
                + self.K)) - m.M_HALFPI
            lamp = self.c * lam
            cp = np.cos(phip)
            phipp = m.aasin(self.cosp0 * np.sin(phip)
                            - self.sinp0 * cp * np.cos(lamp))
            lampp = m.aasin(cp * np.sin(lamp) / np.cos(phipp))
            c.x = self.kR * lampp
            c.y = self.kR * np.log(np.tan(m.M_FORTPI + 0.5 * phipp))

    def _inv(self, c: Coords) -> None:
        with np.errstate(all="ignore"):
            phipp = 2.0 * (np.arctan(np.exp(c.y / self.kR)) - m.M_FORTPI)
            lampp = c.x / self.kR
            cp = np.cos(phipp)
            phip = m.aasin(self.cosp0 * np.sin(phipp)
                           + self.sinp0 * cp * np.cos(lampp))
            lamp = m.aasin(cp * np.sin(lampp) / np.cos(phip))
            con = (self.K - np.log(np.tan(m.M_FORTPI + 0.5 * phip))) / self.c
            active = np.ones(len(c), dtype=bool)
            for _ in range(6):
                esp = self.e * np.sin(phip)
                delp = (con + np.log(np.tan(m.M_FORTPI + 0.5 * phip))
                        - self.hlf_e * np.log((1.0 + esp) / (1.0 - esp))) \
                    * (1.0 - esp * esp) * np.cos(phip) * self.rone_es
                phip = np.where(active, phip - delp, phip)
                active &= ~(np.abs(delp) < EPS)
                if not np.any(active):
                    break
        bad = active
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lamp / self.c)
        c.y = np.where(bad, np.nan, phip)
