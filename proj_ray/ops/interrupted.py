"""Interrupted projections: Goode homolosine (igh), its oceanic view
(igh_o), and interrupted Mollweide land/ocean views (imoll, imoll_o) —
reference src/projections/{igh,igh_o,imoll,imoll_o}.cpp.

Each is a compilation of Mollweide/Sinusoidal sub-projections with
per-zone central meridians and offsets; zone assignment is vectorized
with masks and each sub-kernel runs once on its zone's subset.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import Operation, Params, register
from proj_ray.ops.pseudocyl import Moll, Sinu

D2R = m.DEG_TO_RAD
PHI_B = (40 + 44 / 60.0 + 11.8 / 3600.0) * D2R
EPSLN = 1e-10


def _mk_sub(kind: str):
    from proj_ray.ops.base import Params as P

    if kind == "moll":
        return Moll(P.parse("proj=moll R=1"))
    return Sinu(P.parse("proj=sinu R=1"))


class _SubZone:
    __slots__ = ("op", "lam0", "x0", "y0")

    def __init__(self, kind, lam0_deg, x0_deg, y0=0.0):
        self.op = _mk_sub(kind)
        self.lam0 = lam0_deg * D2R
        self.x0 = x0_deg * D2R
        self.y0 = y0

    def fwd_xy(self, lam, phi):
        c = Coords(lam - self.lam0, phi.copy())
        self.op._fwd(c)
        return c.x + self.x0, c.y + self.y0

    def inv_lp(self, x, y):
        c = Coords(x - self.x0, y - self.y0)
        self.op._inv(c)
        return c.x + self.lam0, c.y


class _Interrupted(Operation):
    def setup(self, params: Params) -> None:
        self.es = 0.0
        self.zones = self._make_zones()
        self._post_zone_setup()

    def _post_zone_setup(self) -> None:
        pass

    def _make_zones(self):
        raise NotImplementedError

    def _fwd_zone(self, lam, phi):
        raise NotImplementedError

    def _inv_zone(self, x, y):
        raise NotImplementedError

    def _ok_range(self, z, lam, phi):
        raise NotImplementedError

    def _fwd(self, c: Coords) -> None:
        lam, phi = c.x, c.y
        z = self._fwd_zone(lam, phi)
        x = np.empty_like(lam)
        y = np.empty_like(lam)
        for zi, zone in enumerate(self.zones, start=1):
            mask = z == zi
            if not np.any(mask):
                continue
            xm, ym = zone.fwd_xy(lam[mask], phi[mask])
            x[mask] = xm
            y[mask] = ym
        c.x, c.y = x, y

    def _inv(self, c: Coords) -> None:
        x, y = c.x, c.y
        z = self._inv_zone(x, y)
        lam = np.full_like(x, np.nan)
        phi = np.full_like(x, np.nan)
        bad = z == 0
        for zi, zone in enumerate(self.zones, start=1):
            mask = z == zi
            if not np.any(mask):
                continue
            lm, ph = zone.inv_lp(x[mask], y[mask])
            ok = self._ok_range(zi, lm, ph)
            lam[mask] = np.where(ok, lm, np.nan)
            phi[mask] = np.where(ok, ph, np.nan)
            sub_bad = np.zeros_like(bad)
            sub_bad[mask] = ~ok
            bad |= sub_bad
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        c.x, c.y = lam, phi


def _dy0(moll_zone, sinu_zone):
    """y offset making sinusoidal and Mollweide meet at phi boundary."""
    lp = np.array([PHI_B])
    _, y_moll = moll_zone.fwd_xy(np.array([moll_zone.lam0]), lp)
    _, y_sinu = sinu_zone.fwd_xy(np.array([sinu_zone.lam0]), lp)
    return float(y_sinu[0] - y_moll[0])


@register
class Igh(_Interrupted):
    name = "igh"

    def _make_zones(self):
        Z = _SubZone
        zones = [
            Z("moll", -100, -100), Z("moll", 30, 30),
            Z("sinu", -100, -100), Z("sinu", 30, 30),
            Z("sinu", -160, -160), Z("sinu", -60, -60),
            Z("sinu", 20, 20), Z("sinu", 140, 140),
            Z("moll", -160, -160), Z("moll", -60, -60),
            Z("moll", 20, 20), Z("moll", 140, 140),
        ]
        return zones

    def _post_zone_setup(self):
        dy0 = _dy0(self.zones[0], self.zones[2])
        self.dy0 = dy0
        self.zones[0].y0 = dy0
        self.zones[1].y0 = dy0
        for i in (8, 9, 10, 11):
            self.zones[i].y0 = -dy0

    def _fwd_zone(self, lam, phi):
        z = np.empty(lam.shape, dtype=np.int64)
        top = phi >= PHI_B
        mid = (phi >= 0) & ~top
        low = (phi >= -PHI_B) & (phi < 0)
        bot = phi < -PHI_B
        west = lam <= -40 * D2R
        z[top] = np.where(west[top], 1, 2)
        z[mid] = np.where(west[mid], 3, 4)
        for sel, base in ((low, 5), (bot, 9)):
            lz = np.select(
                [lam <= -100 * D2R, lam <= -20 * D2R, lam <= 80 * D2R],
                [base, base + 1, base + 2], base + 3)
            z[sel] = lz[sel]
        return z

    def _inv_zone(self, x, y):
        y90 = self.dy0 + np.sqrt(2.0)
        z = self._fwd_zone(x, y)  # same thresholds in projected space
        z = np.where((y > y90 + EPSLN) | (y < -y90 + EPSLN), 0, z)
        return z

    def _ok_range(self, z, lam, phi):
        d = D2R
        if z == 1:
            return ((lam >= -180 * d - EPSLN) & (lam <= -40 * d + EPSLN)) | \
                ((lam >= -40 * d - EPSLN) & (lam <= -10 * d + EPSLN)
                 & (phi >= 60 * d - EPSLN) & (phi <= 90 * d + EPSLN))
        if z == 2:
            return ((lam >= -40 * d - EPSLN) & (lam <= 180 * d + EPSLN)) | \
                ((lam >= -180 * d - EPSLN) & (lam <= -160 * d + EPSLN)
                 & (phi >= 50 * d - EPSLN) & (phi <= 90 * d + EPSLN)) | \
                ((lam >= -50 * d - EPSLN) & (lam <= -40 * d + EPSLN)
                 & (phi >= 60 * d - EPSLN) & (phi <= 90 * d + EPSLN))
        ranges = {
            3: (-180, -40), 4: (-40, 180), 5: (-180, -100), 6: (-100, -20),
            7: (-20, 80), 8: (80, 180), 9: (-180, -100), 10: (-100, -20),
            11: (-20, 80), 12: (80, 180),
        }
        lo, hi = ranges[z]
        return (lam >= lo * d - EPSLN) & (lam <= hi * d + EPSLN)


@register
class IghO(_Interrupted):
    name = "igh_o"

    def _make_zones(self):
        Z = _SubZone
        return [
            Z("moll", -140, -140), Z("moll", -10, -10), Z("moll", 130, 130),
            Z("sinu", -140, -140), Z("sinu", -10, -10), Z("sinu", 130, 130),
            Z("sinu", -110, -110), Z("sinu", 20, 20), Z("sinu", 150, 150),
            Z("moll", -110, -110), Z("moll", 20, 20), Z("moll", 150, 150),
        ]

    def _post_zone_setup(self):
        dy0 = _dy0(self.zones[0], self.zones[3])
        self.dy0 = dy0
        for i in (0, 1, 2):
            self.zones[i].y0 = dy0
        for i in (9, 10, 11):
            self.zones[i].y0 = -dy0

    def _fwd_zone(self, lam, phi):
        d = D2R
        z = np.empty(lam.shape, dtype=np.int64)
        top = phi >= PHI_B
        mid = (phi >= 0) & ~top
        low = (phi >= -PHI_B) & (phi < 0)
        bot = phi < -PHI_B
        zn = np.select([lam <= -90 * d, lam >= 60 * d], [0, 2], 1)
        zs = np.select([lam <= -60 * d, lam >= 90 * d], [0, 2], 1)
        z[top] = 1 + zn[top]
        z[mid] = 4 + zn[mid]
        z[low] = 7 + zs[low]
        z[bot] = 10 + zs[bot]
        return z

    def _inv_zone(self, x, y):
        y90 = self.dy0 + np.sqrt(2.0)
        z = self._fwd_zone(x, y)
        return np.where((y > y90 + EPSLN) | (y < -y90 + EPSLN), 0, z)

    def _ok_range(self, z, lam, phi):
        d = D2R
        if z == 1:
            return ((lam >= -180 * d - EPSLN) & (lam <= -90 * d + EPSLN)) | \
                ((lam >= 160 * d - EPSLN) & (lam <= 180 * d + EPSLN)
                 & (phi >= 50 * d - EPSLN) & (phi <= 90 * d + EPSLN))
        if z == 3:
            return ((lam >= 60 * d - EPSLN) & (lam <= 180 * d + EPSLN)) | \
                ((lam >= -180 * d - EPSLN) & (lam <= -160 * d + EPSLN)
                 & (phi >= 50 * d - EPSLN) & (phi <= 90 * d + EPSLN))
        if z == 11:
            return ((lam >= -60 * d - EPSLN) & (lam <= 90 * d + EPSLN)) | \
                ((lam >= 90 * d - EPSLN) & (lam <= 100 * d + EPSLN)
                 & (phi >= -90 * d - EPSLN) & (phi <= -40 * d + EPSLN))
        ranges = {
            2: (-90, 60), 4: (-180, -90), 5: (-90, 60), 6: (60, 180),
            7: (-180, -60), 8: (-60, 90), 9: (90, 180), 10: (-180, -60),
            12: (90, 180),
        }
        lo, hi = ranges[z]
        return (lam >= lo * d - EPSLN) & (lam <= hi * d + EPSLN)


class _IMollBase(_Interrupted):
    def _boundary(self, lam_deg, phi_eps):
        """x seam between zones: average of fwd x just left/right of it."""
        lam = np.array([lam_deg * D2R - EPSLN, lam_deg * D2R + EPSLN])
        phi = np.array([phi_eps, phi_eps])
        c = Coords(lam, phi)
        self._fwd(c)
        return float((c.x[0] + c.x[1]) / 2.0)

    def _match_zone(self, za, zb, lam_deg, phi_a, phi_b):
        """Adjust zone za's x0 so its seam x matches zone zb's
        (reference compute_zone_offset, imoll.cpp:211-224)."""
        a = self.zones[za - 1]
        b = self.zones[zb - 1]
        lam = lam_deg * D2R
        xa, _ = a.fwd_xy(np.array([lam]), np.array([phi_a]))
        xb, _ = b.fwd_xy(np.array([lam]), np.array([phi_b]))
        a.x0 += float(xb[0] - xa[0])


@register
class Imoll(_IMollBase):
    name = "imoll"

    def _make_zones(self):
        Z = _SubZone
        return [
            Z("moll", -100, -100), Z("moll", 30, 30),
            Z("moll", -160, -160), Z("moll", -60, -60),
            Z("moll", 20, 20), Z("moll", 140, 140),
        ]

    def _post_zone_setup(self):
        self._match_zone(3, 1, -160, -EPSLN, EPSLN)
        self._match_zone(2, 1, -40, EPSLN, EPSLN)
        self._match_zone(4, 1, -100, -EPSLN, EPSLN)
        self._match_zone(5, 2, -20, -EPSLN, EPSLN)
        self._match_zone(6, 2, 80, -EPSLN, EPSLN)
        self.b12 = self._boundary(-40, EPSLN)
        self.b34 = self._boundary(-100, -EPSLN)
        self.b45 = self._boundary(-20, -EPSLN)
        self.b56 = self._boundary(80, -EPSLN)

    def _fwd_zone(self, lam, phi):
        d = D2R
        z = np.empty(lam.shape, dtype=np.int64)
        north = phi >= 0
        z[north] = np.where(lam[north] <= -40 * d, 1, 2)
        zs = np.select([lam <= -100 * d, lam <= -20 * d, lam <= 80 * d],
                       [3, 4, 5], 6)
        z[~north] = zs[~north]
        return z

    def _inv_zone(self, x, y):
        y90 = np.sqrt(2.0)
        north = y >= 0
        z = np.empty(x.shape, dtype=np.int64)
        z[north] = np.where(x[north] <= self.b12, 1, 2)
        zs = np.select([x <= self.b34, x <= self.b45, x <= self.b56],
                       [3, 4, 5], 6)
        z[~north] = zs[~north]
        return np.where((y > y90 + EPSLN) | (y < -y90 + EPSLN), 0, z)

    def _ok_range(self, z, lam, phi):
        d = D2R
        ranges = {1: (-180, -40), 2: (-40, 180), 3: (-180, -100),
                  4: (-100, -20), 5: (-20, 80), 6: (80, 180)}
        lo, hi = ranges[z]
        in_lam = (lam >= lo * d - EPSLN) & (lam <= hi * d + EPSLN)
        if z <= 2:
            return in_lam & (phi >= -EPSLN)
        return in_lam & (phi <= EPSLN)


@register
class ImollO(_IMollBase):
    name = "imoll_o"

    def _make_zones(self):
        Z = _SubZone
        return [
            Z("moll", -140, -140), Z("moll", -10, -10), Z("moll", 130, 130),
            Z("moll", -110, -110), Z("moll", 20, 20), Z("moll", 150, 150),
        ]

    def _post_zone_setup(self):
        self._match_zone(2, 1, -90, EPSLN, EPSLN)
        self._match_zone(3, 2, 60, EPSLN, EPSLN)
        self._match_zone(4, 1, -180, -EPSLN, EPSLN)
        self._match_zone(5, 2, -60, -EPSLN, EPSLN)
        self._match_zone(6, 3, 90, -EPSLN, EPSLN)
        self.b12 = self._boundary(-90, EPSLN)
        self.b23 = self._boundary(60, EPSLN)
        self.b45 = self._boundary(-60, -EPSLN)
        self.b56 = self._boundary(90, -EPSLN)

    def _fwd_zone(self, lam, phi):
        d = D2R
        z = np.empty(lam.shape, dtype=np.int64)
        north = phi >= 0
        zn = np.select([lam <= -90 * d, lam >= 60 * d], [1, 3], 2)
        zs = np.select([lam <= -60 * d, lam >= 90 * d], [4, 6], 5)
        z[north] = zn[north]
        z[~north] = zs[~north]
        return z

    def _inv_zone(self, x, y):
        y90 = np.sqrt(2.0)
        north = y >= 0
        z = np.empty(x.shape, dtype=np.int64)
        zn = np.select([x <= self.b12, x >= self.b23], [1, 3], 2)
        zs = np.select([x <= self.b45, x >= self.b56], [4, 6], 5)
        z[north] = zn[north]
        z[~north] = zs[~north]
        return np.where((y > y90 + EPSLN) | (y < -y90 + EPSLN), 0, z)

    def _ok_range(self, z, lam, phi):
        d = D2R
        ranges = {1: (-180, -90), 2: (-90, 60), 3: (60, 180),
                  4: (-180, -60), 5: (-60, 90), 6: (90, 180)}
        lo, hi = ranges[z]
        in_lam = (lam >= lo * d - EPSLN) & (lam <= hi * d + EPSLN)
        if z <= 3:
            return in_lam & (phi >= -EPSLN)
        return in_lam & (phi <= EPSLN)
