"""Transverse Mercator: approx (Evenden/Snyder), exact (Poder/Engsager),
auto, and UTM (reference src/projections/tmerc.cpp).

The exact algorithm is the 6th-order Gauss<->geographic series with
complex Clenshaw summation (tmerc.cpp:263-596; math from König & Weise
1951, coefficients per Engsager & Poder ICC2007).  The approx algorithm
is the classic Snyder 8-term series (tmerc.cpp:71-209).  `+algo=auto`
switches exact/approx at |lon - lon_0| > 3 deg (tmerc.cpp:598-615).
UTM presets: zone -> lon_0, k0=0.9996, x_0=500000, +south -> y_0=1e7
(tmerc.cpp:737-779).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

# default algorithm mirrors data/proj.ini:51 (tmerc_default_algo =
# poder_engsager)
_DEFAULT_ALGO = "poder_engsager"

_FC = [1.0, 0.5, 1.0 / 6, 1.0 / 12, 0.05, 1.0 / 30, 1.0 / 42, 1.0 / 56]
# FC1..FC8 as in tmerc.cpp:53-60 (literal decimal values)
FC1 = 1.0
FC2 = 0.5
FC3 = 0.16666666666666666666
FC4 = 0.08333333333333333333
FC5 = 0.05
FC6 = 0.03333333333333333333
FC7 = 0.02380952380952380952
FC8 = 0.01785714285714285714


class _ApproxState:
    """Evenden/Snyder setup (tmerc.cpp:228-243)."""

    def __init__(self, op: "Tmerc"):
        if op.es != 0.0:
            self.en = m.enfn(op.ell.n)
            self.ml0 = float(
                m.mlfn(op.phi0, np.sin(op.phi0), np.cos(op.phi0), self.en)
            )
            self.esp = op.es / (1.0 - op.es)
        else:
            self.esp = op.k0
            self.ml0 = 0.5 * self.esp
            self.en = None


class _ExactState:
    """Poder/Engsager setup (tmerc.cpp:487-596)."""

    def __init__(self, op: "Tmerc"):
        n = op.ell.n
        cgb = np.zeros(6)
        cbg = np.zeros(6)
        np_ = n
        cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (
            26 / 45.0 + n * (-2854 / 675.0))))))
        cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (
            32 / 45.0 + n * (4642 / 4725.0))))))
        np_ *= n
        cgb[1] = np_ * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (
            2704 / 315.0 + n * (2323 / 945.0)))))
        cbg[1] = np_ * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (
            904 / 315.0 + n * (-1522 / 945.0)))))
        np_ *= n
        cgb[2] = np_ * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (
            73814 / 2835.0))))
        cbg[2] = np_ * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (
            -12686 / 2835.0))))
        np_ *= n
        cgb[3] = np_ * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
        cbg[3] = np_ * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
        np_ *= n
        cgb[4] = np_ * (4174 / 315.0 + n * (-144838 / 6237.0))
        cbg[4] = np_ * (-734 / 315.0 + n * (109598 / 31185.0))
        np_ *= n
        cgb[5] = np_ * (601676 / 22275.0)
        cbg[5] = np_ * (444337 / 155925.0)
        self.cgb, self.cbg = cgb, cbg

        utg = np.zeros(6)
        gtu = np.zeros(6)
        np2 = n * n
        self.Qn = op.k0 / (1 + n) * (1 + np2 * (1 / 4.0 + np2 * (
            1 / 64.0 + np2 / 256.0)))
        utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (
            1 / 360.0 + n * (81 / 512.0 + n * (-96199 / 604800.0))))))
        gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (
            41 / 180.0 + n * (-127 / 288.0 + n * (7891 / 37800.0))))))
        utg[1] = np2 * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (
            -46 / 105.0 + n * (1118711 / 3870720.0)))))
        gtu[1] = np2 * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (
            281 / 630.0 + n * (-1983433 / 1935360.0)))))
        np3 = np2 * n
        utg[2] = np3 * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (
            -5569 / 90720.0))))
        gtu[2] = np3 * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 + n * (
            167603 / 181440.0))))
        np4 = np3 * n
        utg[3] = np4 * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0)))
        gtu[3] = np4 * (49561 / 161280.0 + n * (-179 / 168.0 + n * (
            6601661 / 7257600.0)))
        np5 = np4 * n
        utg[4] = np5 * (-4583 / 161280.0 + n * (108847 / 3991680.0))
        gtu[4] = np5 * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
        np6 = np5 * n
        utg[5] = np6 * (-20648693 / 638668800.0)
        gtu[5] = np6 * (212378941 / 319334400.0)
        self.utg, self.gtu = utg, gtu

        Z = m.gatg(cbg, op.phi0, np.cos(2 * op.phi0), np.sin(2 * op.phi0))
        self.Zb = -self.Qn * (Z + m.clens(gtu, 2 * Z))


def _approx_fwd(st: _ApproxState, op, c: Coords) -> None:
    lam, phi = c.x, c.y
    if op.es != 0.0:
        # |lon - lon_0| > 90 deg fails on the ellipsoidal path only
        # (tmerc.cpp:81-91; the spherical path handles over-range lon)
        out = (lam < -m.M_HALFPI) | (lam > m.M_HALFPI)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        t = t * t
        al = cosphi * lam
        als = al * al
        al = al / np.sqrt(1.0 - op.es * sinphi * sinphi)
        n_ = st.esp * cosphi * cosphi
        x = op.k0 * al * (FC1 + FC3 * als * (1.0 - t + n_ + FC5 * als * (
            5.0 + t * (t - 18.0) + n_ * (14.0 - 58.0 * t) + FC7 * als * (
                61.0 + t * (t * (179.0 - t) - 479.0)))))
        y = op.k0 * (m.mlfn(phi, sinphi, cosphi, st.en) - st.ml0 +
                     sinphi * al * lam * FC2 * (1.0 + FC4 * als * (
                         5.0 - t + n_ * (9.0 + 4.0 * n_) + FC6 * als * (
                             61.0 + t * (t - 58.0) + n_ * (270.0 - 330 * t) +
                             FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))))))
    else:
        # spherical (tmerc.cpp:117-153)
        out = np.zeros(len(c), dtype=bool)
        cosphi = np.cos(phi)
        b = cosphi * np.sin(lam)
        out |= np.abs(np.abs(b) - 1.0) <= 1e-10
        x = st.ml0 * np.log((1.0 + b) / (1.0 - b))
        yy = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
        absyy = np.abs(yy)
        acos_arg = np.clip(yy, -1.0, 1.0)
        y = np.arccos(acos_arg)
        y = np.where(absyy >= 1.0,
                     np.where(absyy - 1.0 > 1e-10, np.nan, 0.0), y)
        out |= np.isnan(y)
        y = np.where((cosphi == 1) & ((lam < -m.M_HALFPI) | (lam > m.M_HALFPI)),
                     m.M_PI, y)
        y = np.where(phi < 0, -y, y)
        y = st.esp * (y - op.phi0)
    x = np.where(out, np.nan, x)
    y = np.where(out, np.nan, y)
    c.set_error(out, ERR_OUTSIDE_DOMAIN)
    c.x, c.y = x, y


def _approx_inv(st: _ApproxState, op, c: Coords) -> None:
    x, y = c.x, c.y
    if op.es != 0.0:
        phi = m.inv_mlfn(st.ml0 + y / op.k0, st.en)
        pole = np.abs(phi) >= m.M_HALFPI
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        n_ = st.esp * cosphi * cosphi
        con = 1.0 - op.es * sinphi * sinphi
        d = x * np.sqrt(con) / op.k0
        con = con * t
        t = t * t
        ds = d * d
        phi_out = phi - (con * ds / (1.0 - op.es)) * FC2 * (1.0 - ds * FC4 * (
            5.0 + t * (3.0 - 9.0 * n_) + n_ * (1.0 - 4 * n_) - ds * FC6 * (
                61.0 + t * (90.0 - 252.0 * n_ + 45.0 * t) + 46.0 * n_ -
                ds * FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1575.0 * t))))))
        lam_out = d * (FC1 - ds * FC3 * (1.0 + 2.0 * t + n_ - ds * FC5 * (
            5.0 + t * (28.0 + 24.0 * t + 8.0 * n_) + 6.0 * n_ - ds * FC7 * (
                61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))))) / cosphi
        phi_out = np.where(pole, np.where(y < 0, -m.M_HALFPI, m.M_HALFPI), phi_out)
        lam_out = np.where(pole, 0.0, lam_out)
    else:
        # spherical inverse (tmerc.cpp:196-219)
        h = np.exp(x / st.esp)
        bad = h == 0
        g = 0.5 * (h - 1.0 / h)
        D = op.phi0 + y / st.esp
        hh = np.cos(D)
        phi_out = np.arcsin(np.clip(
            np.sqrt((1.0 - hh * hh) / (1.0 + g * g)), -1, 1))
        phi_out = np.copysign(phi_out, D)
        lam_out = np.where((g != 0.0) | (hh != 0.0), np.arctan2(g, hh), 0.0)
        phi_out = np.where(bad, np.nan, phi_out)
        lam_out = np.where(bad, np.nan, lam_out)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
    c.x, c.y = lam_out, phi_out


def _exact_fwd(st: _ExactState, op, c: Coords) -> None:
    lam, phi = c.x, c.y
    Cn = m.gatg(st.cbg, phi, np.cos(2 * phi), np.sin(2 * phi))
    sin_Cn = np.sin(Cn)
    cos_Cn = np.cos(Cn)
    sin_Ce = np.sin(lam)
    cos_Ce = np.cos(lam)
    cos_Cn_cos_Ce = cos_Cn * cos_Ce
    Cn = np.arctan2(sin_Cn, cos_Cn_cos_Ce)
    inv_denom_tan_Ce = 1.0 / np.hypot(sin_Cn, cos_Cn_cos_Ce)
    tan_Ce = sin_Ce * cos_Cn * inv_denom_tan_Ce
    Ce = np.arcsinh(tan_Ce)
    two_inv = 2 * inv_denom_tan_Ce
    two_inv_sq = two_inv * inv_denom_tan_Ce
    tmp_r = cos_Cn_cos_Ce * two_inv_sq
    sin_arg_r = sin_Cn * tmp_r
    cos_arg_r = cos_Cn_cos_Ce * tmp_r - 1
    sinh_arg_i = tan_Ce * two_inv
    cosh_arg_i = two_inv_sq - 1
    dCn, dCe = m.clenS(st.gtu, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
    Cn = Cn + dCn
    Ce = Ce + dCe
    out = ~(np.abs(Ce) <= 2.623395162778)
    y = np.where(out, np.nan, st.Qn * Cn + st.Zb)
    x = np.where(out, np.nan, st.Qn * Ce)
    c.set_error(out, ERR_OUTSIDE_DOMAIN)
    c.x, c.y = x, y


def _exact_inv(st: _ExactState, op, c: Coords) -> None:
    Cn = (c.y - st.Zb) / st.Qn
    Ce = c.x / st.Qn
    out = ~(np.abs(Ce) <= 2.623395162778)
    sin_arg_r = np.sin(2 * Cn)
    cos_arg_r = np.cos(2 * Cn)
    exp_2_Ce = np.exp(2 * Ce)
    half_inv = 0.5 / exp_2_Ce
    sinh_arg_i = 0.5 * exp_2_Ce - half_inv
    cosh_arg_i = 0.5 * exp_2_Ce + half_inv
    dCn, dCe = m.clenS(st.utg, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
    Cn = Cn + dCn
    Ce = Ce + dCe
    sin_Cn = np.sin(Cn)
    cos_Cn = np.cos(Cn)
    sinhCe = np.sinh(Ce)
    Ce = np.arctan2(sinhCe, cos_Cn)
    modulus_Ce = np.hypot(sinhCe, cos_Cn)
    Cn = np.arctan2(sin_Cn, modulus_Ce)
    tmp = 2 * modulus_Ce / (sinhCe * sinhCe + 1)
    sin_2_Cn = sin_Cn * tmp
    cos_2_Cn = tmp * modulus_Ce - 1.0
    phi = m.gatg(st.cgb, Cn, cos_2_Cn, sin_2_Cn)
    lam = Ce
    phi = np.where(out, np.nan, phi)
    lam = np.where(out, np.nan, lam)
    c.set_error(out, ERR_OUTSIDE_DOMAIN)
    c.x, c.y = lam, phi


@register
class Tmerc(Operation):
    name = "tmerc"

    def _choose_algo(self, params: Params) -> str:
        if params.b("approx"):
            return "evenden_snyder"
        algo = params.s("algo", _DEFAULT_ALGO)
        if algo not in ("evenden_snyder", "poder_engsager", "auto"):
            raise ProjError("unknown value for algo")
        if algo == "auto" and (
            self.es > 0.1 or self.phi0 != 0 or abs(self.k0 - 1) > 0.01
        ):
            algo = "poder_engsager"
        return algo

    def setup(self, params: Params) -> None:
        algo = self._choose_algo(params)
        if self.es == 0:
            algo = "evenden_snyder"
        self.algo = algo
        self.approx = (
            _ApproxState(self) if algo in ("evenden_snyder", "auto") else None
        )
        self.exact = (
            _ExactState(self) if algo in ("poder_engsager", "auto") else None
        )

    def _fwd(self, c: Coords) -> None:
        if self.algo == "evenden_snyder":
            _approx_fwd(self.approx, self, c)
        elif self.algo == "poder_engsager":
            _exact_fwd(self.exact, self, c)
        else:  # auto: split by |lam| > 3 deg (tmerc.cpp:600-605)
            use_exact = np.abs(c.x) > 3 * m.DEG_TO_RAD
            if not np.any(use_exact):
                _approx_fwd(self.approx, self, c)
            elif np.all(use_exact):
                _exact_fwd(self.exact, self, c)
            else:
                ca = Coords(c.x.copy(), c.y.copy(), c.z, c.t, c.err.copy())
                _approx_fwd(self.approx, self, ca)
                ce = Coords(c.x, c.y, c.z, c.t, c.err)
                _exact_fwd(self.exact, self, ce)
                c.x = np.where(use_exact, ce.x, ca.x)
                c.y = np.where(use_exact, ce.y, ca.y)
                c.err = np.where(use_exact, ce.err, ca.err)

    def _inv(self, c: Coords) -> None:
        if self.algo == "evenden_snyder":
            _approx_inv(self.approx, self, c)
        elif self.algo == "poder_engsager":
            _exact_inv(self.exact, self, c)
        else:  # auto frontier curve (tmerc.cpp:607-615)
            use_exact = np.abs(c.x) > 0.053 - 0.022 * c.y * c.y
            if not np.any(use_exact):
                _approx_inv(self.approx, self, c)
            elif np.all(use_exact):
                _exact_inv(self.exact, self, c)
            else:
                ca = Coords(c.x.copy(), c.y.copy(), c.z, c.t, c.err.copy())
                _approx_inv(self.approx, self, ca)
                ce = Coords(c.x, c.y, c.z, c.t, c.err)
                _exact_inv(self.exact, self, ce)
                c.x = np.where(use_exact, ce.x, ca.x)
                c.y = np.where(use_exact, ce.y, ca.y)
                c.err = np.where(use_exact, ce.err, ca.err)


@register
class Etmerc(Tmerc):
    name = "etmerc"

    def setup(self, params: Params) -> None:
        if self.es == 0.0:
            raise ProjError("etmerc requires a non-zero eccentricity")
        self.algo = "poder_engsager"
        self.approx = None
        self.exact = _ExactState(self)


@register
class Utm(Tmerc):
    name = "utm"

    def setup(self, params: Params) -> None:
        if self.es == 0.0:
            raise ProjError("utm requires a non-zero eccentricity")
        if self.lam0 < -1000.0 or self.lam0 > 1000.0:
            raise ProjError("invalid lon_0")
        self.y0 = 10000000.0 if params.b("south") else 0.0
        self.x0 = 500000.0
        if params.has("zone"):
            zone = params.i("zone")
            if 0 < zone <= 60:
                zone -= 1
            else:
                raise ProjError("invalid zone")
        else:
            zone = int(round(np.floor((float(m.adjlon(np.array([self.lam0]))[0])
                                       + m.M_PI) * 30.0 / m.M_PI)))
            zone = min(max(zone, 0), 59)
        self.lam0 = (zone + 0.5) * m.M_PI / 30.0 - m.M_PI
        self.zone = zone + 1
        self.k0 = 0.9996
        self.phi0 = 0.0
        if params.b("approx"):
            algo = "evenden_snyder"
        else:
            algo = self._choose_algo(params)
        self.algo = algo
        self.approx = (
            _ApproxState(self) if algo in ("evenden_snyder", "auto") else None
        )
        self.exact = (
            _ExactState(self) if algo in ("poder_engsager", "auto") else None
        )
