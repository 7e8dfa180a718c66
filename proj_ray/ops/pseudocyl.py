"""Pseudocylindrical projections (reference src/projections/
{moll,gn_sinu,eqearth,eck1..eck5,robin}.cpp).  All spherical-ish
per-point maps; iterative solves vectorized with convergence masks.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register
from proj_ray.ops.laea import authlat, authset


# ---------------------------------------------------------------------------
# Mollweide family
# ---------------------------------------------------------------------------


class _MollBase(Operation):
    C_x: float
    C_y: float
    C_p: float

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self._moll_setup(params)

    def _moll_setup(self, params: Params) -> None:
        raise NotImplementedError

    def _setup_from_p(self, p: float) -> None:
        p2 = p + p
        sp = np.sin(p)
        r = np.sqrt(m.M_TWOPI * sp / (p2 + np.sin(p2)))
        self.C_x = float(2.0 * r / m.M_PI)
        self.C_y = float(r / sp)
        self.C_p = float(p2 + np.sin(p2))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y.copy()
        k = self.C_p * np.sin(phi)
        active = np.ones(len(c), dtype=bool)
        for _ in range(30):
            V = (phi + np.sin(phi) - k) / (1.0 + np.cos(phi))
            phi = np.where(active, phi - V, phi)
            active &= ~(np.abs(V) < 1e-7)
            if not np.any(active):
                break
        phi = np.where(active,
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI),
                       phi * 0.5)
        c.x = self.C_x * lam * np.cos(phi)
        c.y = self.C_y * np.sin(phi)

    def _inv(self, c: Coords) -> None:
        with np.errstate(all="ignore"):
            phi = m.aasin(c.y / self.C_y)
            lam = c.x / (self.C_x * np.cos(phi))
            bad = ~(np.abs(lam) < m.M_PI)
            phi = phi + phi
            phi = m.aasin((phi + np.sin(phi)) / self.C_p)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Moll(_MollBase):
    name = "moll"

    def _moll_setup(self, params: Params) -> None:
        self._setup_from_p(m.M_HALFPI)


@register
class Wag4(_MollBase):
    name = "wag4"

    def _moll_setup(self, params: Params) -> None:
        self._setup_from_p(m.M_PI / 3.0)


@register
class Wag5(_MollBase):
    name = "wag5"

    def _moll_setup(self, params: Params) -> None:
        self.C_x = 0.90977
        self.C_y = 1.65014
        self.C_p = 3.00896


# ---------------------------------------------------------------------------
# Sinusoidal family
# ---------------------------------------------------------------------------


class _SinuBase(Operation):
    def _gn_setup(self) -> None:
        self.es = 0.0
        self.C_y = float(np.sqrt((self.m_ + 1.0) / self.n_))
        self.C_x = self.C_y / (self.m_ + 1.0)

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y.copy()
        if getattr(self, "ellipsoidal", False):
            s = np.sin(phi)
            co = np.cos(phi)
            c.y = m.mlfn(phi, s, co, self.en)
            c.x = lam * co / np.sqrt(1.0 - self.es * s * s)
            return
        bad = np.zeros(len(c), dtype=bool)
        if self.m_ == 0.0:
            phi = m.aasin(self.n_ * np.sin(phi)) if self.n_ != 1.0 else phi
        else:
            k = self.n_ * np.sin(phi)
            active = np.ones(len(c), dtype=bool)
            for _ in range(8):
                V = (self.m_ * phi + np.sin(phi) - k) \
                    / (self.m_ + np.cos(phi))
                phi = np.where(active, phi - V, phi)
                active &= ~(np.abs(V) < 1e-7)
                if not np.any(active):
                    break
            bad = active
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, self.C_x * lam * (self.m_ + np.cos(phi)))
        c.y = np.where(bad, np.nan, self.C_y * phi)

    def _inv(self, c: Coords) -> None:
        if getattr(self, "ellipsoidal", False):
            phi = m.inv_mlfn(c.y, self.en)
            s = np.abs(phi)
            with np.errstate(all="ignore"):
                sp = np.sin(phi)
                lam = np.where(
                    s < m.M_HALFPI,
                    c.x * np.sqrt(1.0 - self.es * sp * sp) / np.cos(phi),
                    0.0)
            bad = (s - 1e-10) >= m.M_HALFPI
            c.set_error(bad, ERR_OUTSIDE_DOMAIN)
            c.x = np.where(bad, np.nan, lam)
            c.y = np.where(bad, np.nan, phi)
            return
        y = c.y / self.C_y
        if self.m_ != 0.0:
            phi = m.aasin((self.m_ * y + np.sin(y)) / self.n_)
        else:
            phi = m.aasin(np.sin(y) / self.n_) if self.n_ != 1.0 else y
        with np.errstate(all="ignore"):
            lam = c.x / (self.C_x * (self.m_ + np.cos(y)))
        c.x, c.y = lam, phi


@register
class Sinu(_SinuBase):
    name = "sinu"

    def setup(self, params: Params) -> None:
        self.en = m.enfn(self.ell.n)
        if self.es != 0.0:
            self.ellipsoidal = True
        else:
            self.n_ = 1.0
            self.m_ = 0.0
            self._gn_setup()


@register
class GnSinu(_SinuBase):
    name = "gn_sinu"

    def setup(self, params: Params) -> None:
        if not (params.has("n") and params.has("m")):
            raise ProjError("gn_sinu: missing m or n")
        self.n_ = params.f("n")
        self.m_ = params.f("m")
        if not (self.n_ > 0 and self.m_ >= 0):
            raise ProjError("gn_sinu: invalid m or n")
        self._gn_setup()


@register
class Eck6(_SinuBase):
    name = "eck6"

    def setup(self, params: Params) -> None:
        self.m_ = 1.0
        self.n_ = 2.570796326794896619231321691
        self._gn_setup()


@register
class Mbtfps(_SinuBase):
    name = "mbtfps"

    def setup(self, params: Params) -> None:
        self.m_ = 0.5
        self.n_ = 1.785398163397448309615660845
        self._gn_setup()


# ---------------------------------------------------------------------------
# Equal Earth (Savric/Patterson/Jenny 2018)
# ---------------------------------------------------------------------------

_EE_A1 = 1.340264
_EE_A2 = -0.081106
_EE_A3 = 0.000893
_EE_A4 = 0.003796
_EE_M = np.sqrt(3.0) / 2.0
_EE_MAX_Y = 1.3173627591574


@register
class EqEarth(Operation):
    name = "eqearth"

    def setup(self, params: Params) -> None:
        self.rqda = 1.0
        if self.es != 0.0:
            self.apa = authset(self.es)
            self.qp = float(m.qsfn(1.0, self.e, self.one_es))
            self.rqda = float(np.sqrt(0.5 * self.qp))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        sbeta = np.sin(phi)
        if self.es != 0.0:
            sbeta = m.qsfn(sbeta, self.e, 1.0 - self.es) / self.qp
            sbeta = np.clip(sbeta, -1.0, 1.0)
        psi = np.arcsin(_EE_M * sbeta)
        psi2 = psi * psi
        psi6 = psi2 * psi2 * psi2
        x = lam * np.cos(psi) / (
            _EE_M * (_EE_A1 + 3 * _EE_A2 * psi2
                     + psi6 * (7 * _EE_A3 + 9 * _EE_A4 * psi2)))
        y = psi * (_EE_A1 + _EE_A2 * psi2 + psi6 * (_EE_A3 + _EE_A4 * psi2))
        c.x = x * self.rqda
        c.y = y * self.rqda

    def _inv(self, c: Coords) -> None:
        x = c.x / self.rqda
        y_raw = c.y / self.rqda
        y = np.clip(y_raw, -_EE_MAX_Y, _EE_MAX_Y)
        at_pole = np.abs(y_raw) >= _EE_MAX_Y  # clipped -> exact pole
        yc = y.copy()
        active = np.ones(len(c), dtype=bool)
        for _ in range(12):
            y2 = yc * yc
            y6 = y2 * y2 * y2
            f = yc * (_EE_A1 + _EE_A2 * y2
                      + y6 * (_EE_A3 + _EE_A4 * y2)) - y
            fder = _EE_A1 + 3 * _EE_A2 * y2 \
                + y6 * (7 * _EE_A3 + 9 * _EE_A4 * y2)
            tol = f / fder
            yc = np.where(active, yc - tol, yc)
            active &= ~(np.abs(tol) < 1e-11)
            if not np.any(active):
                break
        bad = active
        y2 = yc * yc
        y6 = y2 * y2 * y2
        with np.errstate(all="ignore"):
            lam = _EE_M * x * (_EE_A1 + 3 * _EE_A2 * y2
                               + y6 * (7 * _EE_A3 + 9 * _EE_A4 * y2)) \
                / np.cos(yc)
            phi = np.arcsin(np.clip(np.sin(yc) / _EE_M, -1, 1))
        if self.es != 0.0:
            phi = authlat(phi, self.apa)
        phi = np.where(at_pole, np.copysign(m.M_HALFPI, y_raw), phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


# ---------------------------------------------------------------------------
# Eckert I/II/III(family)/IV/V
# ---------------------------------------------------------------------------


@register
class Eck1(Operation):
    name = "eck1"
    _FC = 0.92131773192356127802
    _RP = 0.31830988618379067154

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        c.x = self._FC * c.x * (1.0 - self._RP * np.abs(c.y))
        c.y = self._FC * c.y

    def _inv(self, c: Coords) -> None:
        phi = c.y / self._FC
        c.x = c.x / (self._FC * (1.0 - self._RP * np.abs(phi)))
        c.y = phi


@register
class Eck2(Operation):
    name = "eck2"
    _FXC = 0.46065886596178063902
    _FYC = 1.44720250911653531871

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        yv = np.sqrt(4.0 - 3.0 * np.sin(np.abs(c.y)))
        x = self._FXC * c.x * yv
        y = self._FYC * (2.0 - yv)
        y = np.where(c.y < 0, -y, y)
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        ONEEPS = 1.0000001
        phi = 2.0 - np.abs(c.y) / self._FYC
        lam = c.x / (self._FXC * phi)
        phi = (4.0 - phi * phi) / 3.0
        bad = np.abs(phi) > ONEEPS
        phi = np.where(np.abs(phi) >= 1.0,
                       np.where(phi < 0, -m.M_HALFPI, m.M_HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        phi = np.where(c.y < 0, -phi, phi)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


class _Eck3Base(Operation):
    C_x: float
    C_y: float
    A: float
    B: float

    def _fwd(self, c: Coords) -> None:
        c.x = self.C_x * c.x * (self.A + m.asqrt(1.0 - self.B * c.y * c.y))
        c.y = self.C_y * c.y

    def _inv(self, c: Coords) -> None:
        phi = c.y / self.C_y
        denom = self.C_x * (self.A + m.asqrt(1.0 - self.B * phi * phi))
        with np.errstate(all="ignore"):
            lam = np.where(denom == 0, np.inf, c.x / denom)
        c.x, c.y = lam, phi


@register
class Eck3(_Eck3Base):
    name = "eck3"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.C_x = 0.42223820031577120149
        self.C_y = 0.84447640063154240298
        self.A = 1.0
        self.B = 0.4052847345693510857755


@register
class Kav7(_Eck3Base):
    name = "kav7"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.C_x = 0.8660254037844
        self.C_y = 1.0
        self.A = 0.0
        self.B = 0.30396355092701331433


@register
class Wag6(_Eck3Base):
    name = "wag6"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.C_x = 0.94745
        self.C_y = 0.94745
        self.A = 0.0
        self.B = 0.30396355092701331433


@register
class Putp1(_Eck3Base):
    name = "putp1"

    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.C_x = 1.89490
        self.C_y = 0.94745
        self.A = -0.5
        self.B = 0.30396355092701331433


@register
class Eck4(Operation):
    name = "eck4"
    _C_x = 0.42223820031577120149
    _C_y = 1.32650042817700232218
    _RC_y = 0.75386330736002178205
    _C_p = 3.57079632679489661922
    _RC_p = 0.28004957675577868795

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        p = self._C_p * np.sin(phi)
        V = phi * phi
        theta = phi * (0.895168 + V * (0.0218849 + V * 0.00826809))
        active = np.ones(len(c), dtype=bool)
        for _ in range(6):
            co = np.cos(theta)
            s = np.sin(theta)
            V = (theta + s * (co + 2.0) - p) \
                / (1.0 + co * (co + 2.0) - s * s)
            theta = np.where(active, theta - V, theta)
            active &= ~(np.abs(V) < 1e-7)
            if not np.any(active):
                break
        x = np.where(active, self._C_x * lam,
                     self._C_x * lam * (1.0 + np.cos(theta)))
        y = np.where(active,
                     np.where(theta < 0, -self._C_y, self._C_y),
                     self._C_y * np.sin(theta))
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        sin_theta = c.y * self._RC_y
        om = 1.0 - np.abs(sin_theta)
        polar = (om >= 0.0) & (om <= 1e-12)
        # beyond-pole input: aasin flags |v| > ONE_TOL (aasincos.cpp:11-22)
        over_pole = np.abs(sin_theta) > 1.00000000000001
        theta = m.aasin(sin_theta)
        cos_theta = np.cos(theta)
        with np.errstate(all="ignore"):
            lam = np.where(polar, c.x / self._C_x,
                           c.x / (self._C_x * (1.0 + cos_theta)))
            sin_phi = (theta + sin_theta * (cos_theta + 2.0)) * self._RC_p
            phi = np.where(polar,
                           np.where(sin_theta > 0, m.M_PI / 2, -m.M_PI / 2),
                           m.aasin(sin_phi))
        bad = over_pole.copy()
        if not self.over:
            d = np.abs(lam) - m.M_PI
            bad |= d > 1e-10
            lam = np.where((d > 0) & ~bad,
                           np.where(lam > 0, m.M_PI, -m.M_PI), lam)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class Eck5(Operation):
    name = "eck5"
    _XF = 0.44101277172455148219
    _RXF = 2.26750802723822639137
    _YF = 0.88202554344910296438
    _RYF = 1.13375401361911319568

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        c.x = self._XF * (1.0 + np.cos(c.y)) * c.x
        c.y = self._YF * c.y

    def _inv(self, c: Coords) -> None:
        phi = self._RYF * c.y
        c.x = self._RXF * c.x / (1.0 + np.cos(phi))
        c.y = phi


# ---------------------------------------------------------------------------
# Robinson (table interpolation; coefficients stored as float32 like the
# reference's `struct COEFS {float c0..c3}` for bit parity)
# ---------------------------------------------------------------------------

_ROBIN_X = np.array([
    [1.0, 2.2199e-17, -7.15515e-05, 3.1103e-06],
    [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
    [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
    [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
    [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
    [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
    [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
    [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
    [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
    [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
    [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
    [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
    [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
    [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
    [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
    [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
    [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
    [0.5722, -0.00906601, 0.000182, 6.24051e-06],
    [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
], dtype=np.float32).astype(np.float64)

_ROBIN_Y = np.array([
    [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
    [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
    [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
    [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
    [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
    [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
    [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
    [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
    [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
    [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
    [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
    [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
    [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
    [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
    [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
    [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
    [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
    [0.9761, 0.00616527, -0.000256, -4.2106e-06],
    [1.0, 0.00328947, -0.000319159, -4.2106e-06],
], dtype=np.float32).astype(np.float64)

_ROBIN_FXC = 0.8487
_ROBIN_FYC = 1.3523
_ROBIN_C1 = 11.45915590261646417544
_ROBIN_RC1 = 0.08726646259971647884
_NODES = 18


def _rv(tab, i, z):
    c0 = tab[i, 0]
    c1 = tab[i, 1]
    c2 = tab[i, 2]
    c3 = tab[i, 3]
    return c0 + z * (c1 + z * (c2 + z * c3))


def _rdv(tab, i, z):
    c1 = tab[i, 1]
    c2 = tab[i, 2]
    c3 = tab[i, 3]
    return c1 + 2 * z * c2 + z * z * 3.0 * c3


@register
class Robin(Operation):
    name = "robin"

    def setup(self, params: Params) -> None:
        self.es = 0.0

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        dphi = np.abs(phi)
        i = np.floor(dphi * _ROBIN_C1 + 1e-15).astype(np.int64)
        bad = np.isnan(phi)
        i = np.clip(np.where(bad, 0, i), 0, _NODES)
        dphi = m.RAD_TO_DEG * (dphi - _ROBIN_RC1 * i)
        x = _rv(_ROBIN_X, i, dphi) * _ROBIN_FXC * lam
        y = _rv(_ROBIN_Y, i, dphi) * _ROBIN_FYC
        y = np.where(phi < 0, -y, y)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    def _inv(self, c: Coords) -> None:
        ONEEPS = 1.000001
        x, yin = c.x, c.y
        lam = x / _ROBIN_FXC
        phi_t = np.abs(yin / _ROBIN_FYC)
        bad = phi_t > ONEEPS
        polar = (phi_t >= 1.0) & ~bad
        # general case: locate table interval on Y.c0
        yc0 = _ROBIN_Y[:, 0]
        i = np.clip(np.searchsorted(yc0, phi_t, side="right") - 1, 0,
                    _NODES - 1)
        T = i
        t = 5.0 * (phi_t - _ROBIN_Y[i, 0]) / (_ROBIN_Y[i + 1, 0]
                                              - _ROBIN_Y[i, 0])
        active = ~(polar | bad)
        act = active.copy()
        for _ in range(100):
            if not np.any(act):
                break
            with np.errstate(all="ignore"):
                t1 = (_rv(_ROBIN_Y, T, t) - phi_t) / _rdv(_ROBIN_Y, T, t)
            t = np.where(act, t - t1, t)
            act = act & ~(np.abs(t1) < 1e-10)
        phi = (5.0 * i + t) * m.DEG_TO_RAD
        phi = np.where(yin < 0, -phi, phi)
        with np.errstate(all="ignore"):
            lam_gen = lam / _rv(_ROBIN_X, T, t)
        lam_polar = lam / _ROBIN_X[_NODES, 0]
        out_lam = np.where(polar, lam_polar, lam_gen)
        out_phi = np.where(polar,
                           np.where(yin < 0, -m.M_HALFPI, m.M_HALFPI), phi)
        bad |= np.abs(out_lam) > m.M_PI
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, out_lam)
        c.y = np.where(bad, np.nan, out_phi)
