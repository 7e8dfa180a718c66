"""Linear, angular and time unit conversion
(reference src/conversions/unitconvert.cpp).

Horizontal/vertical components scale by in/out factor ratios; time
conversions pivot through the modified Julian date (epoch 1858-11-16),
with decimalyear / gps_week / yyyymmdd unit functions vectorized (the
reference converts one value at a time, unitconvert.cpp:160-270).
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import (
    DEGREES,
    RADIANS,
    UNITS,
    WHATEVER,
    Operation,
    Params,
    ProjError,
    register,
)

ANGULAR_UNITS = {
    "rad": 1.0,
    "deg": m.DEG_TO_RAD,
    "grad": np.pi / 200.0,
}

_MONTH_DAYS = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
_MONTH_CUM = np.concatenate([[0], np.cumsum(_MONTH_DAYS)])  # days before month


def _is_leap(y):
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def _days_in_year(y):
    return np.where(_is_leap(y), 366, 365)


def _leap_count(y):
    """Number of leap years in [1, y]."""
    return y // 4 - y // 100 + y // 400


def _leaps_since_1859(ylast):
    """Leap years in [1859, ylast]; 0 when ylast < 1859."""
    return np.maximum(0, _leap_count(ylast) - _leap_count(np.int64(1858)))


def decimalyear_to_mjd(dy):
    dy = np.asarray(dy, dtype=np.float64)
    ok = (dy >= -10000) & (dy <= 10000)
    year = np.floor(np.where(ok, dy, 0)).astype(np.int64)
    frac = np.where(ok, dy, 0) - year
    mjd = (year - 1859) * 365.0 + 14 + 31
    mjd = mjd + frac * _days_in_year(year)
    mjd = mjd + _leaps_since_1859(year - 1)
    return np.where(ok, mjd, 0.0)


def _days_before_year(y):
    """mjd of Jan 1 of year y (y >= 1858): 45 + full years since 1859."""
    return 45.0 + (y - 1859) * 365.0 + _leaps_since_1859(y - 1)


def mjd_to_decimalyear(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    y = (1859 + np.floor((mjd - 45.0) / 365.2425)).astype(np.int64)
    y = np.maximum(y, 1858)
    for _ in range(3):  # guess correction, at most +/-1 expected
        y = np.where(_days_before_year(y + 1) <= mjd, y + 1, y)
        y = np.where((_days_before_year(y) > mjd) & (y > 1858), y - 1, y)
    return y + (mjd - _days_before_year(y)) / _days_in_year(y)


def yyyymmdd_to_mjd(v):
    v = np.asarray(v, dtype=np.float64)
    year = np.floor(v / 10000).astype(np.int64)
    month = np.floor((v - year * 10000) / 100).astype(np.int64)
    day = np.floor(v - year * 10000 - month * 100).astype(np.int64)
    month = np.clip(month, 1, 12)
    dayno = _MONTH_CUM[month - 1] + day
    dayno = dayno + np.where(_is_leap(year) & (month > 2), 1, 0)
    mjd = dayno.astype(np.float64) + (year - 1859) * 365.0
    mjd = mjd + _leaps_since_1859(year - 1) + 13 + 31
    return mjd


def mjd_to_yyyymmdd(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    date = np.round(mjd).astype(np.int64)
    y = (1859 + np.floor((date - 45.0) / 365.2425)).astype(np.int64)
    y = np.maximum(y, 1859)
    for _ in range(3):
        y = np.where(_days_before_year(y + 1) <= date, y + 1, y)
        y = np.where((_days_before_year(y) > date) & (y > 1859), y - 1, y)
    doy = date - _days_before_year(y).astype(np.int64)  # 0-based day of year
    leap = _is_leap(y)
    month = np.ones_like(y)
    date_iter = np.zeros_like(y)
    for mth in range(1, 13):
        dim = _MONTH_DAYS[mth - 1] + ((mth == 2) & leap)
        advance = date_iter + dim <= doy
        date_iter = np.where(advance, date_iter + dim, date_iter)
        month = np.where(advance, mth + 1, month)
    day = doy - date_iter + 1
    return y * 10000.0 + month * 100.0 + day


TIME_UNITS = {
    "mjd": (lambda t: np.asarray(t, dtype=np.float64),
            lambda t: np.asarray(t, dtype=np.float64)),
    "decimalyear": (decimalyear_to_mjd, mjd_to_decimalyear),
    "gps_week": (lambda t: 44244.0 + np.asarray(t) * 7.0,
                 lambda t: (np.asarray(t) - 44244.0) / 7.0),
    "yyyymmdd": (yyyymmdd_to_mjd, mjd_to_yyyymmdd),
}


def _factor(name):
    """Return (factor, kind) with kind in {'linear','angular',None}."""
    if name in UNITS:
        return UNITS[name], "linear"
    if name in ANGULAR_UNITS:
        return ANGULAR_UNITS[name], "angular"
    try:
        f = float(name)
    except ValueError:
        raise ProjError(f"unknown unit {name!r}") from None
    if f == 0.0 or not np.isfinite(1.0 / f):
        raise ProjError(f"invalid unit factor {name!r}")
    return f, None


@register
class UnitConvert(Operation):
    name = "unitconvert"
    skip_prepare = True  # reference sets skip_fwd/inv_prepare only

    def setup(self, params: Params) -> None:
        self.left = WHATEVER
        self.right = WHATEVER
        self.xy_factor = 1.0
        self.z_factor = 1.0
        self.t_in = None
        self.t_out = None
        kinds = {}
        for key in ("xy_in", "xy_out", "z_in", "z_out"):
            name = params.s(key)
            if name is None:
                continue
            f, kind = _factor(name)
            kinds[key] = kind
            if key == "xy_in":
                self.xy_factor = f
                if name == "rad":
                    self.left = RADIANS
                elif name == "deg":
                    self.left = DEGREES
            elif key == "xy_out":
                self.xy_factor /= f
                if name == "rad":
                    self.right = RADIANS
                elif name == "deg":
                    self.right = DEGREES
            elif key == "z_in":
                self.z_factor = f
            else:
                self.z_factor /= f
        for pair in (("xy_in", "xy_out"), ("z_in", "z_out")):
            k0, k1 = kinds.get(pair[0]), kinds.get(pair[1])
            if k0 is not None and k1 is not None and k0 != k1:
                raise ProjError(f"inconsistent unit type between {pair[0]} and {pair[1]}")
        tin = params.s("t_in")
        if tin is not None:
            if tin not in TIME_UNITS:
                raise ProjError("unknown t_in unit")
            self.t_in = TIME_UNITS[tin]
        tout = params.s("t_out")
        if tout is not None:
            if tout not in TIME_UNITS:
                raise ProjError("unknown t_out unit")
            self.t_out = TIME_UNITS[tout]

    def _fwd(self, c: Coords) -> None:
        c.x = c.x * self.xy_factor
        c.y = c.y * self.xy_factor
        c.z = c.z * self.z_factor
        if self.t_in is not None:
            c.t = self.t_in[0](c.t)
        if self.t_out is not None:
            c.t = self.t_out[1](c.t)

    def _inv(self, c: Coords) -> None:
        c.x = c.x / self.xy_factor
        c.y = c.y / self.xy_factor
        c.z = c.z / self.z_factor
        if self.t_out is not None:
            c.t = self.t_out[0](c.t)
        if self.t_in is not None:
            c.t = self.t_in[1](c.t)
