"""Modified-stereographic family: mil_os, lee_os, gs48, alsk, gs50 —
oblated stereographic base warped by a complex polynomial
(reference src/projections/mod_ster.cpp).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, register

EPSLN = 1e-12


class _ModSter(Operation):
    """Shared kernel; subclasses pin lam0/phi0/zcoeff (and possibly the
    Earth model) in ``_config`` before the common chi0 setup."""

    zcoeff: np.ndarray

    def _config(self, params: Params) -> None:
        raise NotImplementedError

    def setup(self, params: Params) -> None:
        self._config(params)
        if self.es != 0.0:
            esphi = self.e * np.sin(self.phi0)
            chio = 2.0 * np.arctan(
                np.tan((m.M_HALFPI + self.phi0) * 0.5)
                * ((1.0 - esphi) / (1.0 + esphi)) ** (self.e * 0.5)) \
                - m.M_HALFPI
        else:
            chio = self.phi0
        self.schio = float(np.sin(chio))
        self.cchio = float(np.cos(chio))

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        sinlon = np.sin(lam)
        coslon = np.cos(lam)
        with np.errstate(all="ignore"):
            esphi = self.e * np.sin(phi)
            chi = 2.0 * np.arctan(
                np.tan((m.M_HALFPI + phi) * 0.5)
                * ((1.0 - esphi) / (1.0 + esphi)) ** (self.e * 0.5)) \
                - m.M_HALFPI
            schi = np.sin(chi)
            cchi = np.cos(chi)
            denom = 1.0 + self.schio * schi + self.cchio * cchi * coslon
            bad = denom == 0.0
            s = 2.0 / np.where(bad, 1.0, denom)
            z = (s * cchi * sinlon
                 + 1j * s * (self.cchio * schi - self.schio * cchi * coslon))
            f, _ = m.zpoly1d(z, self.zcoeff)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, f.real)
        c.y = np.where(bad, np.nan, f.imag)

    def _inv(self, c: Coords) -> None:
        target = c.x + 1j * c.y
        z = target.copy()
        done = np.zeros(z.shape, dtype=bool)
        for _ in range(20):
            f, fp = m.zpoly1d(z, self.zcoeff)
            with np.errstate(all="ignore"):
                dz = -(f - target) / fp
            z = np.where(done, z, z + dz)
            done = done | (np.abs(dz.real) + np.abs(dz.imag) <= EPSLN)
            if done.all():
                break
        bad = ~done
        with np.errstate(all="ignore"):
            rh = np.hypot(z.real, z.imag)
            zz = 2.0 * np.arctan(0.5 * rh)
            sinz = np.sin(zz)
            cosz = np.cos(zz)
            origin = np.abs(rh) <= EPSLN
            chi = m.aasin(cosz * self.schio
                          + z.imag * sinz * self.cchio
                          / np.where(origin, 1.0, rh))
            phi = chi.copy()
            conv = np.zeros(phi.shape, dtype=bool)
            for _ in range(20):
                esphi = self.e * np.sin(phi)
                dphi = (2.0 * np.arctan(
                    np.tan((m.M_HALFPI + chi) * 0.5)
                    * ((1.0 + esphi) / (1.0 - esphi)) ** (self.e * 0.5))
                    - m.M_HALFPI - phi)
                phi = np.where(conv, phi, phi + dphi)
                conv = conv | (np.abs(dphi) <= EPSLN)
                if conv.all():
                    break
            bad = bad | ~conv
            lam = np.arctan2(z.real * sinz,
                             rh * self.cchio * cosz
                             - z.imag * self.schio * sinz)
        lam = np.where(origin, 0.0, lam)
        phi = np.where(origin, self.phi0, phi)
        bad = bad & ~origin
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, lam)
        c.y = np.where(bad, np.nan, phi)


@register
class MilOS(_ModSter):
    name = "mil_os"
    zcoeff = np.array([0.924500, 0.0, 0.019430], dtype=np.complex128)

    def _config(self, params: Params) -> None:
        self.lam0 = m.DEG_TO_RAD * 20.0
        self.phi0 = m.DEG_TO_RAD * 18.0
        self.es = 0.0
        self.e = 0.0


@register
class LeeOS(_ModSter):
    name = "lee_os"
    zcoeff = np.array([0.721316, 0.0, -0.0088162 - 0.00617325j],
                      dtype=np.complex128)

    def _config(self, params: Params) -> None:
        self.lam0 = m.DEG_TO_RAD * -165.0
        self.phi0 = m.DEG_TO_RAD * -10.0
        self.es = 0.0
        self.e = 0.0


@register
class Gs48(_ModSter):
    name = "gs48"
    zcoeff = np.array([0.98879, 0.0, -0.050909, 0.0, 0.075528],
                      dtype=np.complex128)

    def _config(self, params: Params) -> None:
        self.lam0 = m.DEG_TO_RAD * -96.0
        self.phi0 = m.DEG_TO_RAD * 39.0
        self.es = 0.0
        self.e = 0.0
        self.a = 6370997.0
        self.ra = 1.0 / self.a


_ALSK_E = np.array([
    0.9945303, 0.0052083 - 0.0027404j, 0.0072721 + 0.0048181j,
    -0.0151089 - 0.1932526j, 0.0642675 - 0.1381226j, 0.3582802 - 0.2884586j,
], dtype=np.complex128)
_ALSK_S = np.array([
    0.9972523, 0.0052513 - 0.0041175j, 0.0074606 + 0.0048125j,
    -0.0153783 - 0.1968253j, 0.0636871 - 0.1408027j, 0.3660976 - 0.2937382j,
], dtype=np.complex128)


@register
class Alsk(_ModSter):
    name = "alsk"

    def _config(self, params: Params) -> None:
        self.lam0 = m.DEG_TO_RAD * -152.0
        self.phi0 = m.DEG_TO_RAD * 64.0
        if self.es != 0.0:  # fixed Clarke 1866 ellipsoid
            self.zcoeff = _ALSK_E
            self.a = 6378206.4
            self.es = 0.00676866
            self.e = float(np.sqrt(self.es))
        else:  # fixed authalic sphere
            self.zcoeff = _ALSK_S
            self.a = 6370997.0
        self.ra = 1.0 / self.a


_GS50_E = np.array([
    0.9827497, 0.0210669 + 0.0053804j, -0.1031415 - 0.0571664j,
    -0.0323337 - 0.0322847j, 0.0502303 + 0.1211983j, 0.0251805 + 0.0895678j,
    -0.0012315 - 0.1416121j, 0.0072202 - 0.1317091j, -0.0194029 + 0.0759677j,
    -0.0210072 + 0.0834037j,
], dtype=np.complex128)
_GS50_S = np.array([
    0.9842990, 0.0211642 + 0.0037608j, -0.1036018 - 0.0575102j,
    -0.0329095 - 0.0320119j, 0.0499471 + 0.1223335j, 0.0260460 + 0.0899805j,
    0.0007388 - 0.1435792j, 0.0075848 - 0.1334108j, -0.0216473 + 0.0776645j,
    -0.0225161 + 0.0853673j,
], dtype=np.complex128)


@register
class Gs50(_ModSter):
    name = "gs50"

    def _config(self, params: Params) -> None:
        self.lam0 = m.DEG_TO_RAD * -120.0
        self.phi0 = m.DEG_TO_RAD * 45.0
        if self.es != 0.0:
            self.zcoeff = _GS50_E
            self.a = 6378206.4
            self.es = 0.00676866
            self.e = float(np.sqrt(self.es))
        else:
            self.zcoeff = _GS50_S
            self.a = 6370997.0
        self.ra = 1.0 / self.a
