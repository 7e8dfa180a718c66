"""Equal-area cylindrical (cea), equidistant conic (eqdc), Bonne, and
American polyconic (poly) — reference src/projections/{cea,eqdc,bonne,
poly}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register
from proj_ray.ops.laea import authlat, authset

EPS10 = 1e-10


@register
class Cea(Operation):
    name = "cea"

    def setup(self, params: Params) -> None:
        t = 0.0
        if params.has("lat_ts"):
            t = params.r("lat_ts")
            self.k0 = float(np.cos(t))
            if self.k0 < 0:
                raise ProjError("|lat_ts| should be <= 90")
        if self.es != 0.0:
            st = np.sin(t)
            self.k0 /= np.sqrt(1.0 - self.es * st * st)
            self.apa = authset(self.es)
            self.qp = float(m.qsfn(1.0, self.e, self.one_es))

    def _fwd(self, c: Coords) -> None:
        if self.es != 0.0:
            y = 0.5 * m.qsfn(np.sin(c.y), self.e, self.one_es) / self.k0
        else:
            y = np.sin(c.y) / self.k0
        c.x = self.k0 * c.x
        c.y = y

    def _inv(self, c: Coords) -> None:
        if self.es != 0.0:
            phi = authlat(np.arcsin(np.clip(
                2.0 * c.y * self.k0 / self.qp, -1, 1)), self.apa)
            lam = c.x / self.k0
            c.x, c.y = lam, phi
            return
        y = c.y * self.k0
        t = np.abs(y)
        bad = t - EPS10 > 1.0
        phi = np.where(t >= 1.0,
                       np.where(y < 0, -m.M_HALFPI, m.M_HALFPI),
                       np.arcsin(np.clip(y, -1, 1)))
        lam = c.x / self.k0
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Eqdc(Operation):
    name = "eqdc"

    def setup(self, params: Params) -> None:
        self.phi1 = params.r("lat_1")
        self.phi2 = params.r("lat_2")
        if abs(self.phi1) > m.M_HALFPI or abs(self.phi2) > m.M_HALFPI:
            raise ProjError("|lat_1|,|lat_2| should be <= 90")
        if abs(self.phi1 + self.phi2) < EPS10:
            raise ProjError("|lat_1 + lat_2| should be > 0")
        self.en = m.enfn(self.ell.n)
        sinphi = np.sin(self.phi1)
        cosphi = np.cos(self.phi1)
        self.n = float(sinphi)
        secant = abs(self.phi1 - self.phi2) >= EPS10
        self.ellips = self.es > 0.0
        if self.ellips:
            m1 = float(m.msfn(sinphi, cosphi, self.es))
            ml1 = float(m.mlfn(self.phi1, sinphi, cosphi, self.en))
            if secant:
                sinphi2 = np.sin(self.phi2)
                cosphi2 = np.cos(self.phi2)
                ml2 = float(m.mlfn(self.phi2, sinphi2, cosphi2, self.en))
                if ml1 == ml2:
                    raise ProjError("eqdc: lat_1 == lat_2")
                self.n = (m1 - float(m.msfn(sinphi2, cosphi2, self.es))) \
                    / (ml2 - ml1)
                if self.n == 0:
                    raise ProjError("invalid eccentricity")
            self.c = ml1 + m1 / self.n
            self.rho0 = self.c - float(
                m.mlfn(self.phi0, np.sin(self.phi0), np.cos(self.phi0),
                       self.en))
        else:
            if secant:
                self.n = float((cosphi - np.cos(self.phi2))
                               / (self.phi2 - self.phi1))
            if self.n == 0:
                raise ProjError("lat_1 + lat_2 should be > 0")
            self.c = float(self.phi1 + np.cos(self.phi1) / self.n)
            self.rho0 = self.c - self.phi0

    def _fwd(self, c: Coords) -> None:
        if self.ellips:
            rho = self.c - m.mlfn(c.y, np.sin(c.y), np.cos(c.y), self.en)
        else:
            rho = self.c - c.y
        lamn = c.x * self.n
        c.x = rho * np.sin(lamn)
        c.y = self.rho0 - rho * np.cos(lamn)

    def _inv(self, c: Coords) -> None:
        x = c.x.copy()
        y = self.rho0 - c.y
        rho = np.hypot(x, y)
        if self.n < 0:
            rho = -rho
            x = -x
            y = -y
        center = rho == 0.0
        phi = self.c - rho
        if self.ellips:
            phi = m.inv_mlfn(phi, self.en)
        with np.errstate(all="ignore"):
            lam = np.arctan2(x, y) / self.n
        pole = m.M_HALFPI if self.n > 0 else -m.M_HALFPI
        c.x = np.where(center, 0.0, lam)
        c.y = np.where(center, pole, phi)


@register
class Bonne(Operation):
    """Bonne / Werner (reference src/projections/bonne.cpp)."""

    name = "bonne"

    def setup(self, params: Params) -> None:
        self.phi1 = params.r("lat_1")
        if abs(self.phi1) < EPS10:
            raise ProjError("|lat_1| should be > 0")
        if self.es != 0.0:
            self.en = m.enfn(self.ell.n)
            s1 = np.sin(self.phi1)
            c1 = np.cos(self.phi1)
            self.m1 = float(m.mlfn(self.phi1, s1, c1, self.en))
            self.am1 = float(c1 / (np.sqrt(1.0 - self.es * s1 * s1) * s1))
        else:
            if abs(self.phi1) + EPS10 >= m.M_HALFPI:
                self.cphi1 = 0.0
            else:
                self.cphi1 = float(1.0 / np.tan(self.phi1))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.es != 0.0:
            E = np.sin(phi)
            cphi = np.cos(phi)
            rh = self.am1 + self.m1 - m.mlfn(phi, E, cphi, self.en)
            zero = np.abs(rh) <= EPS10
            E = cphi * lam / (rh * np.sqrt(1.0 - self.es * E * E))
            x = np.where(zero, 0.0, rh * np.sin(E))
            y = np.where(zero, 0.0, self.am1 - rh * np.cos(E))
        else:
            rh = self.cphi1 + self.phi1 - phi
            zero = np.abs(rh) <= EPS10
            with np.errstate(all="ignore"):
                E = lam * np.cos(phi) / rh
            x = np.where(zero, 0.0, rh * np.sin(E))
            y = np.where(zero, 0.0, self.cphi1 - rh * np.cos(E))
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x = c.x.copy()
        with np.errstate(all="ignore"):
            if self.es != 0.0:
                y = self.am1 - c.y
                rh = np.copysign(np.hypot(x, y), self.phi1)
                phi = m.inv_mlfn(self.am1 + self.m1 - rh, self.en)
                abs_phi = np.abs(phi)
                bad = (abs_phi >= m.M_HALFPI) \
                    & (abs_phi - m.M_HALFPI > EPS10)
                pole = (abs_phi >= m.M_HALFPI) & ~bad
                sinphi = np.sin(phi)
                lm = rh * np.sqrt(1.0 - self.es * sinphi * sinphi) \
                    / np.cos(phi)
            else:
                y = self.cphi1 - c.y
                rh = np.copysign(np.hypot(x, y), self.phi1)
                phi = self.cphi1 + self.phi1 - rh
                abs_phi = np.abs(phi)
                bad = abs_phi > m.M_HALFPI
                pole = (m.M_HALFPI - abs_phi <= EPS10) & ~bad
                lm = rh / np.cos(phi)
            if self.phi1 > 0:
                lam = lm * np.arctan2(x, y)
            else:
                lam = lm * np.arctan2(-x, -y)
            lam = np.where(pole, 0.0, lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Poly(Operation):
    """American polyconic (reference src/projections/poly.cpp)."""

    name = "poly"

    def setup(self, params: Params) -> None:
        if self.es != 0.0:
            self.en = m.enfn(self.ell.n)
            self.ml0 = float(m.mlfn(self.phi0, np.sin(self.phi0),
                                    np.cos(self.phi0), self.en))
        else:
            self.ml0 = -self.phi0

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        tol = 1e-10
        zero = np.abs(phi) <= tol
        with np.errstate(all="ignore"):
            if self.es != 0.0:
                sp = np.sin(phi)
                cp = np.cos(phi)
                ms = np.where(np.abs(cp) > tol,
                              m.msfn(sp, cp, self.es) / sp, 0.0)
                E = lam * sp
                x = np.where(zero, lam, ms * np.sin(E))
                y = np.where(zero, -self.ml0,
                             m.mlfn(phi, sp, cp, self.en) - self.ml0
                             + ms * (1.0 - np.cos(E)))
            else:
                E = lam * np.sin(phi)
                cot = 1.0 / np.tan(phi)
                x = np.where(zero, lam, cot * np.sin(E))
                y = np.where(zero, self.ml0,
                             phi - self.phi0 + cot * (1.0 - np.cos(E)))
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x, y = c.x.copy(), c.y.copy()
        N_ITER = 10
        I_ITER = 20
        ITOL = 1e-12
        CONV = 1e-10
        if self.es != 0.0:
            yc = y + self.ml0
            flat = np.abs(yc) <= 1e-10
            with np.errstate(all="ignore"):
                # Newton iteration on phi (poly.cpp e_inverse)
                r = yc * yc + x * x
                phi = yc.copy()
                done = np.zeros_like(phi, dtype=bool)
                bad = np.zeros_like(phi, dtype=bool)
                for i in range(I_ITER):
                    sp = np.sin(phi)
                    cp = np.cos(phi)
                    s2ph = sp * cp
                    bad |= (np.abs(cp) < ITOL) & ~done
                    mlp = np.sqrt(1.0 - self.es * sp * sp)
                    c_ = sp * mlp / cp
                    ml = m.mlfn(phi, sp, cp, self.en)
                    mlb = ml * ml + r
                    mlp = self.one_es / (mlp * mlp * mlp)
                    dPhi = (ml + ml + c_ * mlb - 2.0 * yc * (c_ * ml + 1.0)) \
                        / (self.es * s2ph * (mlb - 2.0 * yc * ml) / c_
                           + 2.0 * (yc - ml) * (c_ * mlp - 1.0 / s2ph)
                           - mlp - mlp)
                    newdone = np.abs(dPhi) <= ITOL
                    phi = np.where(done, phi, phi + dPhi)  # += (poly.cpp)
                    done |= newdone
                    if np.all(done | bad):
                        break
                bad |= ~done
                c2 = np.sin(phi) * np.sqrt(
                    1.0 - self.es * np.sin(phi) ** 2) / np.cos(phi)
                lam = np.arcsin(np.clip(x * c2, -1, 1)) / np.sin(phi)
            phi = np.where(flat, 0.0, phi)
            lam = np.where(flat, x, lam)
            bad = bad & ~flat
        else:
            yc = self.phi0 + y
            flat = np.abs(yc) <= 1e-10
            with np.errstate(all="ignore"):
                B = x * x + yc * yc
                phi = yc.copy()
                bad = np.zeros_like(phi, dtype=bool)
                done = np.zeros_like(phi, dtype=bool)
                for i in range(N_ITER):
                    tp = np.tan(phi)
                    dphi = (yc * (phi * tp + 1.0) - phi
                            - 0.5 * (phi * phi + B) * tp) \
                        / ((phi - yc) / tp - 1.0)
                    phi = np.where(done, phi, phi - dphi)
                    done |= np.abs(dphi) <= CONV
                    if np.all(done):
                        break
                bad |= ~done
                lam = np.arcsin(np.clip(x * np.tan(phi), -1, 1)) \
                    / np.sin(phi)
            phi = np.where(flat, 0.0, phi)
            lam = np.where(flat, x, lam)
            bad = bad & ~flat
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)
