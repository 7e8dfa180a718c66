"""Icosahedral Snyder Equal Area (reference src/projections/isea.cpp).

The plane-mode forward (the only mode the conformance corpus exercises
with value expectations) is vectorized: the 20-triangle search runs as a
fixed loop of masked candidate assignments.  The hex/di/dd grid-address
modes follow the reference's integer hex binning per row and reproduce
its integer-overflow failure for out-of-range resolutions.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, ProjError, register

DEG36 = 0.62831853071795864768
DEG72 = 1.25663706143591729537
DEG108 = 1.88495559215387594306
DEG120 = 2.09439510239319549229
DEG144 = 2.51327412287183459075
ISEA_SCALE = 0.8301572857837594396028083
V_LAT = 0.46364760899944494524
E_RAD = 0.91843818702186776133
F_RAD = 0.18871053072122403508
TABLE_G = 0.6615845383
TABLE_H = 0.1909830056
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LONG = 0.19634954084936207740
RPRIME = 0.91038328153090290025

_VERTEX = [(0.0, m.M_HALFPI), (np.pi, V_LAT), (-DEG108, V_LAT),
           (-DEG36, V_LAT), (DEG36, V_LAT), (DEG108, V_LAT),
           (-DEG144, -V_LAT), (-DEG72, -V_LAT), (0.0, -V_LAT),
           (DEG72, -V_LAT), (DEG144, -V_LAT), (0.0, -m.M_HALFPI)]
_TRI_V1 = [0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 2, 3, 4, 5, 1, 11, 11, 11,
           11, 11]
_CENTERS = [(0.0, 0.0), (-DEG144, E_RAD), (-DEG72, E_RAD), (0.0, E_RAD),
            (DEG72, E_RAD), (DEG144, E_RAD), (-DEG144, F_RAD),
            (-DEG72, F_RAD), (0.0, F_RAD), (DEG72, F_RAD), (DEG144, F_RAD),
            (-DEG108, -F_RAD), (-DEG36, -F_RAD), (DEG36, -F_RAD),
            (DEG108, -F_RAD), (np.pi, -F_RAD), (-DEG108, -E_RAD),
            (-DEG36, -E_RAD), (DEG36, -E_RAD), (DEG108, -E_RAD),
            (np.pi, -E_RAD)]

# Snyder constants for the icosahedron (isea.cpp constants[ICOSAHEDRON])
_G_DEG, _BIGG_DEG, _THETA_DEG = 37.37736814, 36.0, 30.0


def _az_adjustment(tri: int) -> float:
    vlon, vlat = _VERTEX[_TRI_V1[tri]]
    clon, clat = _CENTERS[tri]
    return float(np.arctan2(
        np.cos(vlat) * np.sin(vlon - clon),
        np.cos(clat) * np.sin(vlat)
        - np.sin(clat) * np.cos(vlat) * np.cos(vlon - clon)))


def _triangle_xy(tri: int):
    t = (tri - 1) % 20
    cx = TABLE_G * ((t % 5) - 2) * 2.0
    if t > 9:
        cx += TABLE_G
    cy = [5.0 * TABLE_H, TABLE_H, -TABLE_H, -5.0 * TABLE_H][t // 5]
    return cx * RPRIME, cy * RPRIME


def _snyder_forward(lon, lat):
    """Vectorized isea_snyder_forward (isea.cpp:283-405): returns
    (x, y, tri, ok)."""
    theta = np.radians(_THETA_DEG)
    g = np.radians(_G_DEG)
    G = np.radians(_BIGG_DEG)
    cot_theta = 1.0 / np.tan(theta)
    tan_g = np.tan(g)
    n = lon.shape[0]
    out_x = np.zeros(n)
    out_y = np.zeros(n)
    out_tri = np.zeros(n, dtype=np.int64)
    done = np.zeros(n, dtype=bool)
    sinlat = np.sin(lat)
    coslat = np.cos(lat)
    with np.errstate(all="ignore"):
        for i in range(1, 21):
            clon, clat = _CENTERS[i]
            z = np.arccos(np.clip(
                np.sin(clat) * sinlat
                + np.cos(clat) * coslat * np.cos(lon - clon), -1, 1))
            cand = ~done & (z <= g + 0.000005)
            if not cand.any():
                continue
            Az = np.arctan2(
                coslat * np.sin(lon - clon),
                np.cos(clat) * sinlat
                - np.sin(clat) * coslat * np.cos(lon - clon))
            Az = Az - _az_adjustment(i)
            Az = np.where(Az < 0.0, Az + 2 * np.pi, Az)
            k = np.zeros(n)
            Azr = Az.copy()
            for _ in range(3):
                over = Azr > DEG120 + 2.3e-16
                Azr = np.where(over, Azr - DEG120, Azr)
                k = np.where(over, k + 1, k)
            q = np.arctan2(tan_g, np.cos(Azr) + np.sin(Azr) * cot_theta)
            cand = cand & (z <= q + 0.000005)
            if not cand.any():
                continue
            H = np.arccos(np.clip(np.sin(Azr) * np.sin(G) * np.cos(g)
                                  - np.cos(Azr) * np.cos(G), -1, 1))
            Ag = Azr + G + H - np.pi
            Azp = np.arctan2(2.0 * Ag,
                             RPRIME * RPRIME * tan_g * tan_g
                             - 2.0 * Ag * cot_theta)
            dprime = RPRIME * tan_g / (np.cos(Azp) + np.sin(Azp) * cot_theta)
            f = dprime / (2.0 * RPRIME * np.sin(q / 2.0))
            rho = 2.0 * RPRIME * f * np.sin(z / 2.0)
            Azp = Azp + DEG120 * k
            out_x = np.where(cand, rho * np.sin(Azp), out_x)
            out_y = np.where(cand, rho * np.cos(Azp), out_y)
            out_tri = np.where(cand, i, out_tri)
            done = done | cand
            if done.all():
                break
    return out_x, out_y, out_tri, done


def _rotate(x, y, degrees):
    rad = -np.radians(degrees)
    return (x * np.cos(rad) + y * np.sin(rad),
            -x * np.sin(rad) + y * np.cos(rad))


def _hexbin2(width, x, y):
    """Scalar hex binning (isea.cpp:70-120); raises on overflow."""
    x = x / np.cos(np.radians(30.0))
    y = y - x / 2.0
    if width == 0:
        raise OverflowError
    x /= width
    y /= width
    z = -x - y
    rx, ry, rz = np.floor(x + 0.5), np.floor(y + 0.5), np.floor(z + 0.5)
    if (abs(rx + ry) > 2**31 - 1 or abs(rx + ry + rz) > 2**31 - 1):
        raise OverflowError
    ix, iy, iz = int(rx), int(ry), int(rz)
    s = ix + iy + iz
    if s:
        dx, dy, dz = abs(rx - x), abs(ry - y), abs(rz - z)
        if dx >= dy and dx >= dz:
            ix -= s
        elif dy >= dx and dy >= dz:
            iy -= s
        else:
            iz -= s
    # hex_xy on iso coords (both C branches equal floor((x+1)/2))
    hy = -iy - (ix + 1) // 2
    return ix, hy


@register
class Isea(Operation):
    name = "isea"

    def setup(self, params: Params) -> None:
        self.o_lat = ISEA_STD_LAT
        self.o_lon = ISEA_STD_LONG
        self.o_az = 0.0
        orient = params.s("orient")
        if orient == "pole":
            self.o_lat = m.M_HALFPI
            self.o_lon = 0.0
        elif orient not in (None, "isea"):
            raise ProjError("isea: orient must be isea or pole")
        if params.has("azi"):
            self.o_az = params.r("azi")
        if params.has("lon_0"):
            self.o_lon = params.r("lon_0")
            self.lam0 = 0.0  # consumed here, not by the generic prepare
        if params.has("lat_0"):
            self.o_lat = params.r("lat_0")
        mode = params.s("mode")
        if mode in (None, "plane"):
            self.mode = "plane"
        elif mode in ("di", "dd", "hex"):
            self.mode = mode
        else:
            raise ProjError("isea: mode must be plane, di, dd or hex")
        self.radius = ISEA_SCALE if params.b("rescale") else 1.0
        self.resolution = params.i("resolution", 4)
        self.aperture = params.i("aperture", 3)

    def _ctran(self, lon, lat):
        """isea_ctran: rotate to the grid's pole (isea.cpp:408-489)."""
        alpha = self.o_lat
        beta = self.o_lon + np.pi
        cos_p = np.cos(lat)
        sin_a = np.sin(alpha)
        sin_phip = (sin_a * np.sin(lat)
                    - np.cos(alpha) * cos_p * np.cos(lon - beta))
        lp_b = np.arctan2(
            cos_p * np.sin(lon - beta),
            sin_a * cos_p * np.cos(lon - beta) + np.cos(alpha) * np.sin(lat))
        lambdap = lp_b + beta
        lambdap = np.mod(lambdap + np.pi, 2 * np.pi) - np.pi
        lambdap = lambdap - (np.pi - self.o_az + (beta - np.pi)) + np.pi
        lambdap = np.mod(lambdap + np.pi, 2 * np.pi) - np.pi
        phip = np.arcsin(np.clip(sin_phip, -1, 1))
        return lambdap, phip

    def _fwd(self, c: Coords) -> None:
        lon, lat = self._ctran(c.x, c.y)
        x, y, tri, ok = _snyder_forward(lon, lat)
        x = x * self.radius
        y = y * self.radius
        if self.mode == "plane":
            for i in range(1, 21):
                sel = tri == i
                if not sel.any():
                    continue
                if ((i - 1) // 5) % 2 == 1:  # downward triangle
                    rx, ry = _rotate(x[sel], y[sel], 180.0)
                else:
                    rx, ry = x[sel], y[sel]
                cx, cy = _triangle_xy(i)
                x[sel] = rx + cx * self.radius
                y[sel] = ry + cy * self.radius
            bad = ~ok
        else:
            # grid-address modes: per-row integer hex binning
            x = x / self.radius * ISEA_SCALE + 0.5
            y = y / self.radius * ISEA_SCALE + 2.0 * 0.14433756729740644112
            bad = ~ok
            for j in range(len(x)):
                if bad[j]:
                    continue
                try:
                    x[j], y[j] = self._grid_address(int(tri[j]), x[j], y[j])
                except (OverflowError, ZeroDivisionError):
                    bad[j] = True
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x = np.where(bad, np.nan, x)
        c.y = np.where(bad, np.nan, y)

    # -- scalar grid-address machinery (isea.cpp:577-852) ---------------
    def _grid_address(self, tri, px, py):
        downtri = ((tri - 1) // 5) % 2 == 1
        quad = ((tri - 1) % 5) + ((tri - 1) // 10) * 5 + 1
        px, py = _rotate(px, py, 240.0 if downtri else 60.0)
        if downtri:
            px += 0.5
            py += 0.86602540378443864672
        if self.mode == "dd":
            return px, py
        quad, d, i = self._dddi(quad, px, py)
        if self.mode == "di":
            return d, i
        # hex: pack quad into x (isea.cpp isea_hex)
        if not (-(2**27) <= d <= 2**27):
            raise OverflowError
        return d * 16 + quad, i

    def _dddi(self, quad, px, py):
        ap, res = self.aperture, self.resolution
        if ap == 3 and res % 2 != 0:
            sidelength = (2.0 ** res + 1.0) / 2.0
            hexwidth = np.cos(np.pi / 6.0) / sidelength
            maxcoord = int(round(sidelength * 2.0))
            hx, hy = _hexbin2(hexwidth, px, py)
            iy = -hy - (hx + 1) // 2  # hex_iso
            iz = -hx - iy
            d = hx - iz
            i = hx + iy + iy
            if quad <= 5:
                if d == 0 and i == maxcoord:
                    quad, d, i = 0, 0, 0
                elif i == maxcoord:
                    quad = quad + 1 if quad != 5 else 1
                    i = maxcoord - d
                    d = 0
                elif d == maxcoord:
                    quad += 5
                    d = 0
            else:
                if i == 0 and d == maxcoord:
                    quad, d, i = 11, 0, 0
                elif d == maxcoord:
                    quad = quad + 1 if quad != 10 else 6
                    d = maxcoord - i
                    i = 0
                elif i == maxcoord:
                    quad = (quad - 4) % 5
                    i = 0
            return quad, d, i
        if ap > 0:
            sld = ap ** (res / 2.0)
            if abs(sld) > 2**31 - 1:
                raise OverflowError
            sidelength = int(round(sld))
        else:
            sidelength = res
        if sidelength == 0:
            raise ZeroDivisionError
        hexwidth = 1.0 / sidelength
        vx, vy = _rotate(px, py, -30.0)
        hx, hy = _hexbin2(hexwidth, vx, vy)
        iy = -hy - (hx + 1) // 2  # hex_iso
        iz = -hx - iy
        x, y, z = hx, iy, iz
        if quad <= 5:
            if x == 0 and z == -sidelength:
                quad, x, y, z = 0, 0, 0, 0
            elif z == -sidelength:
                quad = quad + 1 if quad != 5 else 1
                y = sidelength - x
                z = x - sidelength
                x = 0
            elif x == sidelength:
                quad += 5
                y = -z
                x = 0
        else:
            if z == 0 and x == sidelength:
                quad, x, y, z = 11, 0, 0, 0
            elif x == sidelength:
                quad = quad + 1 if quad != 10 else 6
                x = y + sidelength
                y = 0
                z = -x
            elif y == -sidelength:
                quad -= 4
                y = 0
                z = -x
        return quad, x, -z
