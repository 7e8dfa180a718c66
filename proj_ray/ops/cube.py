"""Cube-face projections: S2 (reference src/projections/s2.cpp) and the
Quadrilateralized Spherical Cube (src/projections/qsc.cpp).

Both pick a cube face from (lat_0, lon_0); S2 offers linear / quadratic /
tangent UV<->ST transforms; QSC is the COBE-style equal-ish-area cube.
The [LK12] ellipsoid<->sphere latitude shift is applied for ellipsoids.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import PROJECTED, RADIANS, Operation, Params, \
    ProjError, register

FACE_FRONT, FACE_RIGHT, FACE_TOP, FACE_BACK, FACE_LEFT, FACE_BOTTOM = range(6)


def _st_to_uv(s, kind):
    if kind == "linear":
        return 2 * s - 1
    if kind == "quadratic":
        return np.where(s >= 0.5, (1 / 3.0) * (4 * s * s - 1),
                        (1 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))
    if kind == "tangent":
        t = np.tan(m.M_HALFPI * s - m.M_FORTPI)
        return t + (1.0 / float(1 << 53)) * t
    return s


def _uv_to_st(u, kind):
    if kind == "linear":
        return 0.5 * (u + 1)
    if kind == "quadratic":
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u),
                        1 - 0.5 * np.sqrt(1 - 3 * u))
    if kind == "tangent":
        a = np.arctan(u)
        return (2 * (1.0 / np.pi)) * (a + m.M_FORTPI)
    return u


def _valid_face_xyz_to_uv(face, x, y, z):
    if face == 0:
        return y / x, z / x
    if face == 1:
        return -x / y, z / y
    if face == 2:
        return -x / z, -y / z
    if face == 3:
        return z / x, y / x
    if face == 4:
        return z / y, -x / y
    return -y / z, -x / z


def _uv_to_sphere_xyz(face, u, v):
    major = 1 / np.sqrt(1 + u * u + v * v)
    m1 = u * major
    m2 = v * major
    if face == 0:
        return major, m1, m2
    if face == 1:
        return -m1, major, m2
    if face == 2:
        return -m1, -m2, major
    if face == 3:
        return -major, -m2, -m1
    if face == 4:
        return m2, -major, -m1
    return m2, m1, -major


def _face_from_center(phi0, lam0):
    if phi0 >= m.M_HALFPI - m.M_FORTPI / 2.0:
        return FACE_TOP
    if phi0 <= -(m.M_HALFPI - m.M_FORTPI / 2.0):
        return FACE_BOTTOM
    if abs(lam0) <= m.M_FORTPI:
        return FACE_FRONT
    if abs(lam0) <= m.M_HALFPI + m.M_FORTPI:
        return FACE_RIGHT if lam0 > 0 else FACE_LEFT
    return FACE_BACK


@register
class S2(Operation):
    name = "s2"

    def setup(self, params: Params) -> None:
        kind = params.s("UVtoST", "quadratic")
        if kind not in ("linear", "quadratic", "tangent", "none"):
            raise ProjError("s2: UVtoST should be linear, quadratic, "
                            "tangent, or none")
        self.kind = kind
        self.left = RADIANS
        self.right = PROJECTED
        # from_greenwich = -lam0 keeps absolute longitudes through
        # prepare (s2.cpp:447)
        self.from_greenwich = -self.lam0
        self.face = _face_from_center(self.phi0, self.lam0)
        self.one_minus_f = 1.0 - (self.a - self.ell.b) / self.a
        self.one_minus_f_sq = self.one_minus_f ** 2
        self.a_sq = self.a * self.a

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        if self.es != 0.0:
            lat = np.arctan(self.one_minus_f_sq * np.tan(phi))
        else:
            lat = phi
        coslat = np.cos(lat)
        x = coslat * np.cos(lam)
        y = coslat * np.sin(lam)
        z = np.sin(lat)
        with np.errstate(all="ignore"):
            u, v = _valid_face_xyz_to_uv(self.face, x, y, z)
            c.x = _uv_to_st(u, self.kind)
            c.y = _uv_to_st(v, self.kind)

    def _inv(self, c: Coords) -> None:
        u = _st_to_uv(c.x, self.kind)
        v = _st_to_uv(c.y, self.kind)
        q, r, s = _uv_to_sphere_xyz(self.face, u, v)
        phi = np.arccos(np.clip(-s, -1, 1)) - m.M_HALFPI
        lam = np.arctan2(r, q)
        if self.es != 0.0:
            with np.errstate(all="ignore"):
                invert = phi < 0.0
                tanphi = np.tan(phi)
                xa = self.ell.b / np.sqrt(tanphi * tanphi
                                          + self.one_minus_f_sq)
                phi = np.arctan(np.sqrt(np.maximum(self.a_sq - xa * xa, 0.0))
                                / (self.one_minus_f * xa))
                phi = np.where(invert, -phi, phi)
        c.x, c.y = lam, phi


def _shift_lon(lon, offset):
    s = lon + offset
    s = np.where(s < -np.pi, s + m.M_TWOPI, s)
    s = np.where(s > np.pi, s - m.M_TWOPI, s)
    return s


@register
class Qsc(Operation):
    name = "qsc"

    def setup(self, params: Params) -> None:
        self.face = _face_from_center(self.phi0, self.lam0)
        self.bb = self.a * np.sqrt(1.0 - self.es)
        self.one_minus_f = 1.0 - (self.a - self.bb) / self.a
        self.one_minus_f_sq = self.one_minus_f ** 2

    @staticmethod
    def _equat_theta_area(theta):
        """AREA selection + theta reduction on equatorial faces."""
        area = np.empty(theta.shape, dtype=np.int64)
        t = theta
        a0 = np.abs(t) <= m.M_FORTPI
        a1 = (t > m.M_FORTPI) & (t <= m.M_HALFPI + m.M_FORTPI)
        a2 = (t > m.M_HALFPI + m.M_FORTPI) | (t <= -(m.M_HALFPI
                                                     + m.M_FORTPI))
        a3 = ~(a0 | a1 | a2)
        area[a0] = 0
        area[a1] = 1
        area[a2] = 2
        area[a3] = 3
        out = np.where(a1, t - m.M_HALFPI,
                       np.where(a2, np.where(t >= 0, t - np.pi, t + np.pi),
                                np.where(a3, t + m.M_HALFPI, t)))
        return out, area

    def _fwd(self, c: Coords) -> None:
        lam, phi_in = c.x, c.y
        if self.es != 0.0:
            lat = np.arctan(self.one_minus_f_sq * np.tan(phi_in))
        else:
            lat = phi_in
        face = self.face
        with np.errstate(all="ignore"):
            if face == FACE_TOP or face == FACE_BOTTOM:
                lon = lam
                if face == FACE_TOP:
                    phi = m.M_HALFPI - lat
                    a0 = (lon >= m.M_FORTPI) & (lon <= m.M_HALFPI
                                                + m.M_FORTPI)
                    a1 = (lon > m.M_HALFPI + m.M_FORTPI) \
                        | (lon <= -(m.M_HALFPI + m.M_FORTPI))
                    a2 = (lon > -(m.M_HALFPI + m.M_FORTPI)) \
                        & (lon <= -m.M_FORTPI)
                    a3 = ~(a0 | a1 | a2)
                    theta = np.where(
                        a0, lon - m.M_HALFPI,
                        np.where(a1, np.where(lon > 0, lon - np.pi,
                                              lon + np.pi),
                                 np.where(a2, lon + m.M_HALFPI, lon)))
                else:
                    phi = m.M_HALFPI + lat
                    a0 = (lon >= m.M_FORTPI) & (lon <= m.M_HALFPI
                                                + m.M_FORTPI)
                    a1 = (lon < m.M_FORTPI) & (lon >= -m.M_FORTPI)
                    a2 = (lon < -m.M_FORTPI) \
                        & (lon >= -(m.M_HALFPI + m.M_FORTPI))
                    a3 = ~(a0 | a1 | a2)
                    theta = np.where(
                        a0, -lon + m.M_HALFPI,
                        np.where(a1, -lon,
                                 np.where(a2, -lon - m.M_HALFPI,
                                          np.where(lon > 0, -lon + np.pi,
                                                   -lon - np.pi))))
                area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
            else:
                lon = lam
                if face == FACE_RIGHT:
                    lon = _shift_lon(lon, +m.M_HALFPI)
                elif face == FACE_BACK:
                    lon = _shift_lon(lon, +np.pi)
                elif face == FACE_LEFT:
                    lon = _shift_lon(lon, -m.M_HALFPI)
                sinlat = np.sin(lat)
                coslat = np.cos(lat)
                sinlon = np.sin(lon)
                coslon = np.cos(lon)
                q = coslat * coslon
                r = coslat * sinlon
                s = sinlat
                if face == FACE_FRONT:
                    phi = np.arccos(np.clip(q, -1, 1))
                    th_raw = np.arctan2(s, r)
                elif face == FACE_RIGHT:
                    phi = np.arccos(np.clip(r, -1, 1))
                    th_raw = np.arctan2(s, -q)
                elif face == FACE_BACK:
                    phi = np.arccos(np.clip(-q, -1, 1))
                    th_raw = np.arctan2(s, -r)
                else:  # FACE_LEFT
                    phi = np.arccos(np.clip(-r, -1, 1))
                    th_raw = np.arctan2(s, q)
                theta, area = self._equat_theta_area(th_raw)
                theta = np.where(phi < 1e-10, 0.0, theta)
            mu = np.arctan((12.0 / np.pi) * (
                theta + np.arccos(np.clip(np.sin(theta)
                                          * np.cos(m.M_FORTPI), -1, 1))
                - m.M_HALFPI))
            t = np.sqrt(np.maximum(
                (1.0 - np.cos(phi)) / (np.cos(mu) ** 2)
                / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), 0.0))
            mu = mu + np.where(area == 1, m.M_HALFPI,
                               np.where(area == 2, np.pi,
                                        np.where(area == 3,
                                                 np.pi + m.M_HALFPI, 0.0)))
            c.x = t * np.cos(mu)
            c.y = t * np.sin(mu)

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        face = self.face
        with np.errstate(all="ignore"):
            nu = np.arctan(np.sqrt(x * x + y * y))
            mu = np.arctan2(y, x)
            a0 = (x >= 0.0) & (x >= np.abs(y))
            a1 = (y >= 0.0) & (y >= np.abs(x)) & ~a0
            a2 = (x < 0.0) & (-x >= np.abs(y)) & ~(a0 | a1)
            a3 = ~(a0 | a1 | a2)
            area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
            mu = np.where(a1, mu - m.M_HALFPI, mu)
            mu = np.where(a2, np.where(mu < 0, mu + np.pi, mu - np.pi), mu)
            mu = np.where(a3, mu + m.M_HALFPI, mu)
            t = (np.pi / 12.0) * np.tan(mu)
            tantheta = np.sin(t) / (np.cos(t) - 1.0 / np.sqrt(2.0))
            theta = np.arctan(tantheta)
            cosmu = np.cos(mu)
            tannu = np.tan(nu)
            cosphi = 1.0 - cosmu * cosmu * tannu * tannu * (
                1.0 - np.cos(np.arctan(1.0 / np.cos(theta))))
            cosphi = np.clip(cosphi, -1.0, 1.0)
            if face in (FACE_TOP, FACE_BOTTOM):
                phi = np.arccos(cosphi)
                if face == FACE_TOP:
                    lp_phi = m.M_HALFPI - phi
                    lp_lam = np.where(
                        area == 0, theta + m.M_HALFPI,
                        np.where(area == 1,
                                 np.where(theta < 0, theta + np.pi,
                                          theta - np.pi),
                                 np.where(area == 2, theta - m.M_HALFPI,
                                          theta)))
                else:
                    lp_phi = phi - m.M_HALFPI
                    lp_lam = np.where(
                        area == 0, -theta + m.M_HALFPI,
                        np.where(area == 1, -theta,
                                 np.where(area == 2, -theta - m.M_HALFPI,
                                          np.where(theta < 0,
                                                   -theta - np.pi,
                                                   -theta + np.pi))))
            else:
                q = cosphi
                tq = q * q
                s = np.where(tq >= 1.0, 0.0,
                             np.sqrt(np.maximum(1.0 - tq, 0))
                             * np.sin(theta))
                tq = tq + s * s
                r = np.where(tq >= 1.0, 0.0, np.sqrt(
                    np.maximum(1.0 - tq, 0)))
                # rotate into area
                r1 = np.where(a1, -s, np.where(a2, -r, np.where(a3, s, r)))
                s1 = np.where(a1, r, np.where(a2, -s, np.where(a3, -r, s)))
                r, s = r1, s1
                # rotate into face
                if face == FACE_RIGHT:
                    q, r = -r, q
                elif face == FACE_BACK:
                    q, r = -q, -r
                elif face == FACE_LEFT:
                    q, r = r, -q
                lp_phi = np.arccos(np.clip(-s, -1, 1)) - m.M_HALFPI
                lp_lam = np.arctan2(r, q)
                if face == FACE_RIGHT:
                    lp_lam = _shift_lon(lp_lam, -m.M_HALFPI)
                elif face == FACE_BACK:
                    lp_lam = _shift_lon(lp_lam, -np.pi)
                elif face == FACE_LEFT:
                    lp_lam = _shift_lon(lp_lam, +m.M_HALFPI)
            if self.es != 0.0:
                invert = lp_phi < 0.0
                tanphi = np.tan(lp_phi)
                xa = self.bb / np.sqrt(tanphi * tanphi
                                       + self.one_minus_f_sq)
                lp_phi = np.arctan(
                    np.sqrt(np.maximum(self.a * self.a - xa * xa, 0.0))
                    / (self.one_minus_f * xa))
                lp_phi = np.where(invert, -lp_phi, lp_phi)
        c.x, c.y = lp_lam, lp_phi
