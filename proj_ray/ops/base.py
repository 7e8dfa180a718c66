"""Operation framework: parameters, I/O-unit typing, prepare/finalize.

This is the engine's analogue of the reference's PJ object and its
``pj_fwd`` / ``pj_inv`` wrappers:

* ``Params`` — the parsed ``+key=value`` list (reference ``paralist``,
  src/init.cpp:482-496) with the typed getters of ``pj_param``
  (src/pj_param.cpp): f=float, i=int, b=bool, s=string, r=angle-in-
  radians with DMS support (src/dmstor.cpp).
* ``Operation`` — one registered operation: setup-time constants,
  declared I/O units (the de-facto type system, src/proj_internal.h:
  192-198), and vectorized ``fwd``/``inv`` kernels over ``Coords``.
* ``apply_fwd`` / ``apply_inv`` — the full wrappers mirroring
  src/fwd.cpp:40-296 and src/inv.cpp:40-180: angular range checks,
  longitude wrapping, central-meridian offset, false easting/northing,
  unit scaling, axis swapping, error propagation.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Type

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import (
    Coords,
    ERR_INVALID_COORD,
    ERR_NO_INVERSE,
)
from proj_ray.core.ellipsoid import Ellipsoid, get_ellipsoid

# ---------------------------------------------------------------------------
# I/O unit tags (reference src/proj_internal.h:192-198)
# ---------------------------------------------------------------------------
WHATEVER = "whatever"
CLASSIC = "classic"  # plane coords in units of the semimajor axis
PROJECTED = "projected"
CARTESIAN = "cartesian"
RADIANS = "radians"
DEGREES = "degrees"


class ProjError(ValueError):
    """Raised at *setup* time for invalid operation definitions.

    Runtime (per-coordinate) failures never raise — they set NaN + err.
    """


# ---------------------------------------------------------------------------
# DMS parsing (reference src/dmstor.cpp)
# ---------------------------------------------------------------------------

_DMS_RE = re.compile(
    r"""^\s*(?P<sign>[+-])?
        (?:(?P<deg>\d+(?:\.\d*)?)(?:[dD°]))?
        (?:(?P<min>\d+(?:\.\d*)?)')?
        (?:(?P<sec>\d+(?:\.\d*)?)")?
        (?P<plain>[-+]?\d+(?:\.\d*)?(?:[eE][-+]?\d+)?)?
        (?P<rad>[rR])?
        (?P<hemi>[NSEWnsew])?\s*$""",
    re.VERBOSE,
)


def parse_angle_deg(s: str) -> float:
    """Parse a DMS or decimal angle string; returns DEGREES."""
    if isinstance(s, (int, float)):
        return float(s)
    mo = _DMS_RE.match(s)
    if not mo or (mo.group("deg") is None and mo.group("plain") is None):
        # plain float fallback
        return float(s)
    val = 0.0
    if mo.group("deg") is not None:
        val = float(mo.group("deg"))
        if mo.group("min"):
            val += float(mo.group("min")) / 60.0
        if mo.group("sec"):
            val += float(mo.group("sec")) / 3600.0
    else:
        val = float(mo.group("plain"))
        if mo.group("rad"):
            val = val * m.RAD_TO_DEG
    if mo.group("sign") == "-":
        val = -val
    if mo.group("hemi") in ("S", "s", "W", "w"):
        val = -val
    return val


class Params:
    """Parsed +key=value parameters with pj_param-style typed access."""

    def __init__(self, kv: Dict[str, str]):
        self.kv = dict(kv)
        self.used: set = set()

    @staticmethod
    def normalize(defn: str) -> str:
        """Glue 'key = value' and 'a, b' token splits back together and
        drop line-continuation backslashes (the reference's argument
        trimming, src/pj_strtod.cpp / pj_trim_argv, tolerates both)."""
        s = defn.replace("\\", " ").replace(";", " ")
        s = re.sub(r"\s*=\s*", "=", s)
        s = re.sub(r",\s+", ",", s)
        return s

    @staticmethod
    def parse(defn: str) -> "Params":
        kv: Dict[str, str] = {}
        for tok in Params.normalize(defn).split():
            tok = tok.lstrip("+")
            if not tok:
                continue
            if "=" in tok:
                k, v = tok.split("=", 1)
            else:
                k, v = tok, ""
            if k not in kv:  # first occurrence wins (paralist search order)
                kv[k] = v
        return Params(kv)

    def has(self, key: str) -> bool:
        return key in self.kv

    def s(self, key: str, default: Optional[str] = None) -> Optional[str]:
        self.used.add(key)
        return self.kv.get(key, default)

    def f(self, key: str, default: float = 0.0) -> float:
        self.used.add(key)
        v = self.kv.get(key)
        return default if v in (None, "") else float(v)

    def i(self, key: str, default: int = 0) -> int:
        self.used.add(key)
        v = self.kv.get(key)
        return default if v in (None, "") else int(float(v))

    def b(self, key: str) -> bool:
        """Boolean flag: present with empty value or a truthy value."""
        self.used.add(key)
        if key not in self.kv:
            return False
        v = self.kv[key]
        return v in ("", "1", "true", "True", "yes", "on") or v.startswith("T")

    def r(self, key: str, default: float = 0.0) -> float:
        """Angle parameter in RADIANS (accepts DMS)."""
        self.used.add(key)
        v = self.kv.get(key)
        if v in (None, ""):
            return default
        return parse_angle_deg(v) * m.DEG_TO_RAD

    def with_overrides(self, other: "Params") -> "Params":
        merged = dict(other.kv)
        merged.update(self.kv)  # self wins
        return Params(merged)


# ---------------------------------------------------------------------------
# Ellipsoid resolution (reference src/ell_set.cpp)
# ---------------------------------------------------------------------------


def resolve_ellipsoid(params: Params, default_ellps: str = "GRS80") -> Ellipsoid:
    """Mirror pj_ellipsoid (reference src/ell_set.cpp:100-135): R overrides
    all; ellps= provides base size+shape; explicit a overrides size;
    explicit shape keys (scanned rf,f,es,e,b) override shape; then
    spherification.  The GRS80 default mirrors
    append_default_ellipsoid_to_paralist (src/init.cpp:319-362)."""
    if params.has("R"):
        R = params.f("R")
        if R <= 0:
            raise ProjError("invalid value for major axis")
        return Ellipsoid.sphere(R)
    ell: Optional[Ellipsoid] = None
    if params.has("ellps"):
        ell = get_ellipsoid(params.s("ellps"))
    elif default_ellps and not params.has("a"):
        ell = get_ellipsoid(default_ellps)
    a = ell.a if ell is not None else 0.0
    if params.has("a"):
        a = params.f("a")
        if a <= 0 or not np.isfinite(a):
            raise ProjError("invalid value for major axis")
    if a == 0:
        raise ProjError("major axis not given")
    shape_key = next(
        (k for k in ("rf", "f", "es", "e", "b") if params.has(k)), None
    )
    if shape_key == "rf":
        rf = params.f("rf")
        if rf <= 0:
            raise ProjError("invalid value for rf")
        ell = Ellipsoid.from_a_rf(a, rf)
    elif shape_key == "f":
        f = params.f("f")
        if f < 0:
            raise ProjError("invalid value for f")
        ell = Ellipsoid.from_a_f(a, f) if f != 0 else Ellipsoid.sphere(a)
    elif shape_key == "es":
        es = params.f("es")
        if es < 0 or es >= 1:
            raise ProjError("invalid value for es")
        ell = Ellipsoid.from_a_es(a, es)
    elif shape_key == "e":
        e = params.f("e")
        if e < 0 or e >= 1:
            raise ProjError("invalid value for e")
        ell = Ellipsoid.from_a_e(a, e)
    elif shape_key == "b":
        b = params.f("b")
        if b <= 0:
            raise ProjError("invalid value for b")
        ell = Ellipsoid.from_a_b(a, b)
    elif ell is not None and ell.es != 0:
        if a != ell.a:  # user a with ellps shape
            ell = Ellipsoid(a, ell.es, f0=ell.f, e0=ell.e)
    else:
        ell = Ellipsoid.sphere(a)
    # spherification (reference ell_set.cpp:355-460)
    es = ell.es
    for key in ("R_A", "R_V", "R_a", "R_g", "R_h", "R_lat_a", "R_lat_g",
                "R_C"):
        if not params.has(key):
            continue
        if key == "R_A":
            a2 = ell.a * (1.0 - es * (1.0 / 6 + es * (17.0 / 360 + es * 67.0 / 3024)))
        elif key == "R_V":
            a2 = ell.a * (1.0 - es * (1.0 / 6 + es * (5.0 / 72 + es * 55.0 / 1296)))
        elif key == "R_a":
            a2 = 0.5 * (ell.a + ell.b)
        elif key == "R_g":
            a2 = float(np.sqrt(ell.a * ell.b))
        elif key == "R_h":
            if ell.a + ell.b == 0:
                raise ProjError("R_h: a + b == 0")
            a2 = 2 * ell.a * ell.b / (ell.a + ell.b)
        elif key in ("R_lat_a", "R_lat_g"):
            phi = params.r(key)
            if abs(phi) > m.M_HALFPI:
                raise ProjError("|R_lat_*| should be <= 90")
            t = 1 - es * np.sin(phi) ** 2
            if t == 0:
                raise ProjError("invalid eccentricity")
            if key == "R_lat_a":
                a2 = ell.a * (1.0 - es + t) / (2 * t * np.sqrt(t))
            else:
                a2 = ell.a * float(np.sqrt(1 - es)) / t
        else:
            # R_C: conformal sphere at phi0.  In the reference, ellipsoid
            # resolution (init.cpp:566) runs BEFORE lat_0 is parsed
            # (init.cpp:651), so P->phi0 is still 0 here and
            # R_C == a*sqrt(1-es) == b regardless of +lat_0
            # (behavior verified against builtins.gie:3892-3895).
            a2 = ell.a * float(np.sqrt(1 - es))
        if a2 <= 0:
            raise ProjError("invalid or missing major axis")
        return Ellipsoid.sphere(float(a2))
    return ell


# ---------------------------------------------------------------------------
# Linear units (reference src/units.cpp — standard published factors)
# ---------------------------------------------------------------------------

UNITS = {
    "km": 1000.0,
    "m": 1.0,
    "dm": 0.1,
    "cm": 0.01,
    "mm": 0.001,
    "kmi": 1852.0,
    "in": 0.0254,
    "ft": 0.3048,
    "yd": 0.9144,
    "mi": 1609.344,
    "fath": 1.8288,
    "ch": 20.1168,
    "link": 0.201168,
    "us-in": 1.0 / 39.37,
    "us-ft": 0.304800609601219,
    "us-yd": 0.914401828803658,
    "us-ch": 20.11684023368047,
    "us-mi": 1609.347218694437,
    "ind-yd": 0.91439523,
    "ind-ft": 0.30479841,
    "ind-ch": 20.11669506,
}


def _to_meter(params: Params, key_units: str, key_to_meter: str,
              default: Optional[float]) -> Optional[float]:
    name = params.s(key_units)
    if name is not None:
        if name not in UNITS:
            raise ProjError(f"invalid value for {key_units}: {name!r}")
        return UNITS[name]
    s = params.s(key_to_meter)
    if s is not None:
        if "/" in s:
            num, den = s.split("/", 1)
            d = float(den)
            if d == 0:
                raise ProjError("invalid to_meter denominator")
            return float(num) / d
        return float(s)
    return default


# prime meridians (reference src/datums.cpp pj_prime_meridians — published
# historical constants, value strings are DMS longitudes east of Greenwich)
PRIME_MERIDIANS = {
    "greenwich": "0dE",
    "lisbon": "9d07'54.862\"W",
    "paris": "2d20'14.025\"E",
    "bogota": "74d04'51.3\"W",
    "madrid": "3d41'16.58\"W",
    "rome": "12d27'8.4\"E",
    "bern": "7d26'22.5\"E",
    "jakarta": "106d48'27.79\"E",
    "ferro": "17d40'W",
    "brussels": "4d22'4.71\"E",
    "stockholm": "18d3'29.8\"E",
    "athens": "23d42'58.815\"E",
    "oslo": "10d43'22.5\"E",
}


# ---------------------------------------------------------------------------
# Operation base class
# ---------------------------------------------------------------------------


class Operation:
    """One coordinate operation: setup-time constants + batch kernels.

    Subclasses set ``name``, optionally override ``left``/``right`` I/O
    units in ``setup`` and implement ``_fwd`` and/or ``_inv`` mutating a
    ``Coords`` batch in place.  Defaults mirror the OPERATION macro
    (reference src/proj_internal.h:844-866): left=RADIANS, right=CLASSIC.
    """

    name: str = "?"
    skip_prepare = False
    skip_finalize = False
    _no_datum_helpers = False  # True for the helper ops themselves

    def __init__(self, params: Params, ell: Optional[Ellipsoid] = None):
        self.params = params
        self.ell = ell if ell is not None else resolve_ellipsoid(params)
        e = self.ell
        self.a, self.es, self.e = e.a, e.es, e.e
        self.one_es, self.rone_es = e.one_es, e.rone_es
        self.ra, self.b = e.ra, e.b
        self.left = RADIANS
        self.right = CLASSIC
        self.is_geocent = False
        self.geoc = False
        self.over = params.b("over")
        self.lam0 = params.r("lon_0")
        self.phi0 = params.r("lat_0")
        if abs(self.phi0) > m.M_HALFPI:
            raise ProjError("|lat_0| should be <= 90")
        self.x0 = params.f("x_0")
        self.y0 = params.f("y_0")
        self.z0 = params.f("z_0")
        self.t0 = params.f("t_0")
        if params.has("k_0"):
            self.k0 = params.f("k_0")
        elif params.has("k"):
            self.k0 = params.f("k")
        else:
            self.k0 = 1.0
        if self.k0 <= 0:
            raise ProjError("k/k_0 must be > 0")
        tm = _to_meter(params, "units", "to_meter", None)
        self.to_meter = 1.0 if tm is None else tm
        if self.to_meter <= 0:
            raise ProjError("to_meter must be > 0")
        self.fr_meter = 1.0 / self.to_meter
        vtm = _to_meter(params, "vunits", "vto_meter", None)
        self.vto_meter = self.to_meter if vtm is None else vtm
        self.vfr_meter = 1.0 / self.vto_meter
        # prime meridian
        pm = params.s("pm")
        if pm is None:
            self.from_greenwich = 0.0
        elif pm in PRIME_MERIDIANS:
            self.from_greenwich = parse_angle_deg(PRIME_MERIDIANS[pm]) * m.DEG_TO_RAD
        else:
            self.from_greenwich = parse_angle_deg(pm) * m.DEG_TO_RAD
        # axis order
        self.axis = params.s("axis", "enu")
        if len(self.axis) != 3 or any(c not in "ewnsud" for c in self.axis):
            raise ProjError("invalid axis")
        self.geoc = (self.es != 0.0) and params.b("geoc")
        # long wrap
        self.is_long_wrap_set = params.has("lon_wrap")
        self.long_wrap_center = params.r("lon_wrap")
        # classic +towgs84 datum shift: embedded cart/helmert helpers
        # applied in prepare/finalize (reference fwd.cpp:87-103,
        # inv.cpp:140-152; helper construction in init.cpp/datum_set)
        self._datum_helmert = None
        self._cart_local = None
        self._cart_wgs84 = None
        # +nadgrids / +geoidgrids datum helpers (reference fwd.cpp:87-91:
        # hgridshift INV takes priority over helmert in fwd_prepare;
        # vgridshift FWD follows; inv_finalize reverses both)
        self._datum_hgrid = None
        self._datum_vgrid = None
        ng = params.s("nadgrids")
        gg = params.s("geoidgrids")
        if ng and ng != "@null" and not self._no_datum_helpers:
            from proj_ray.ops.gridshift import HGridShift

            self._datum_hgrid = HGridShift(
                Params.parse(f"proj=hgridshift grids={ng}"))
        if gg and gg != "@null" and not self._no_datum_helpers:
            from proj_ray.ops.gridshift import VGridShift

            self._datum_vgrid = VGridShift(
                Params.parse(f"proj=vgridshift grids={gg}"))
        tw = params.s("towgs84")
        if tw is not None and not self._no_datum_helpers:
            # All-zero shifts on a WGS84/GRS80-sized ellipsoid mean "is
            # WGS84" (no-op); zeros on any OTHER ellipsoid still change
            # datum via the cart roundtrip (reference init.cpp:588-595)
            zeros = all(float(v) == 0.0 for v in tw.split(","))
            is_wgs84_like = (self.a == 6378137.0
                             and abs(self.es - 0.006694379990) < 5e-11)
            if not (zeros and is_wgs84_like):
                self._init_towgs84(tw)
        self.setup(params)

    def _init_towgs84(self, towgs84: str) -> None:
        from proj_ray.core.ellipsoid import WGS84

        from proj_ray.ops.cart import Cart
        from proj_ray.ops.helmert import Helmert

        self._datum_helmert = Helmert(
            Params.parse(f"proj=helmert towgs84={towgs84} "
                         f"convention=position_vector"))
        self._cart_local = Cart(Params.parse("proj=cart"), ell=self.ell)
        self._cart_wgs84 = Cart(Params.parse("proj=cart"), ell=WGS84)

    # -- subclass hooks ------------------------------------------------
    def setup(self, params: Params) -> None:  # pragma: no cover
        pass

    def _fwd(self, c: Coords) -> None:
        c.set_error(np.ones(len(c), dtype=bool), ERR_NO_INVERSE)

    def _inv(self, c: Coords) -> None:
        c.set_error(np.ones(len(c), dtype=bool), ERR_NO_INVERSE)

    @property
    def has_fwd(self) -> bool:
        return type(self)._fwd is not Operation._fwd

    @property
    def has_inv(self) -> bool:
        return type(self)._inv is not Operation._inv

    # -- axis swap embedded helper (reference fwd.cpp:173, inv.cpp:56) --
    def _apply_axis(self, c: Coords, forward: bool) -> None:
        axis = self.axis
        if axis == "enu":
            return
        if forward:
            # internal (e,n,u) -> external per axis spec
            internal = [c.x.copy(), c.y.copy(), c.z.copy()]
            out = []
            for ch in axis:
                src = {"e": internal[0], "w": -internal[0],
                       "n": internal[1], "s": -internal[1],
                       "u": internal[2], "d": -internal[2]}[ch]
                out.append(src)
            c.x, c.y, c.z = out
        else:
            # external per axis spec -> internal (e,n,u)
            ext = [c.x.copy(), c.y.copy(), c.z.copy()]
            res = {"e": None, "n": None, "u": None}
            for ch, v in zip(axis, ext):
                if ch == "e":
                    res["e"] = v
                elif ch == "w":
                    res["e"] = -v
                elif ch == "n":
                    res["n"] = v
                elif ch == "s":
                    res["n"] = -v
                elif ch == "u":
                    res["u"] = v
                elif ch == "d":
                    res["u"] = -v
            c.x = res["e"] if res["e"] is not None else c.x
            c.y = res["n"] if res["n"] is not None else c.y
            c.z = res["u"] if res["u"] is not None else c.z

    # ------------------------------------------------------------------
    # prepare / finalize, mirroring src/fwd.cpp:40-174, src/inv.cpp:40-160
    # ------------------------------------------------------------------
    def fwd_prepare(self, c: Coords) -> None:
        if self.left == RADIANS:
            bad = (np.abs(c.y) - m.M_HALFPI) > m.EPS_LAT
            bad |= (c.x > 10) | (c.x < -10)
            c.set_error(bad, ERR_INVALID_COORD)
            np.clip(c.y, -m.M_HALFPI, m.M_HALFPI, out=c.y)
            if self.geoc:
                self._geocentric_latitude(c, forward=False)
            if not self.over:
                c.x = m.adjlon(c.x)
            if self._datum_hgrid is not None:
                self._datum_hgrid._inv(c)  # WGS84 -> local via grid
            elif self._datum_helmert is not None:
                from proj_ray.ops.cart import cart_fwd_core, cart_inv_core

                cart_fwd_core(self._cart_wgs84, c)  # WGS84 angular -> XYZ
                self._datum_helmert._inv(c)  # step into local frame
                cart_inv_core(self._cart_local, c)  # XYZ -> local angular
            if self._datum_vgrid is not None:
                self._datum_vgrid._fwd(c)  # orthometric from geometric
            c.x = c.x - self.from_greenwich - self.lam0
            if not self.over:
                c.x = m.adjlon(c.x)

    def fwd_finalize(self, c: Coords) -> None:
        right = self.right
        if right == CARTESIAN:
            if self.is_geocent:
                from proj_ray.ops.cart import cart_fwd_core

                cart_fwd_core(self, c)
            c.x = c.x * self.fr_meter
            c.y = c.y * self.fr_meter
            c.z = c.z * self.fr_meter
        elif right in (CLASSIC, PROJECTED):
            if right == CLASSIC:
                c.x = c.x * self.a
                c.y = c.y * self.a
            c.x = self.fr_meter * (c.x + self.x0)
            c.y = self.fr_meter * (c.y + self.y0)
            c.z = self.vfr_meter * (c.z + self.z0)
        elif right == RADIANS:
            c.z = self.vfr_meter * (c.z + self.z0)
            if self.is_long_wrap_set:
                ok = ~np.isnan(c.x)
                wrapped = self.long_wrap_center + m.adjlon(
                    c.x - self.long_wrap_center
                )
                c.x = np.where(ok, wrapped, c.x)
        self._apply_axis(c, forward=True)
        # propagate kernel failures
        c.set_error(np.isnan(c.x) & (c.err == 0), ERR_INVALID_COORD)

    def inv_prepare(self, c: Coords) -> None:
        # NB: in the inverse direction, input units are self.right
        # (reference src/inv.cpp:35-36: INPUT_UNITS = P->right)
        self._apply_axis(c, forward=False)
        left = self.right
        if left == CARTESIAN:
            c.x = c.x * self.to_meter
            c.y = c.y * self.to_meter
            c.z = c.z * self.to_meter
            if self.is_geocent:
                from proj_ray.ops.cart import cart_inv_core

                cart_inv_core(self, c)
        elif left in (PROJECTED, CLASSIC):
            c.x = self.to_meter * c.x - self.x0
            c.y = self.to_meter * c.y - self.y0
            c.z = self.vto_meter * c.z - self.z0
            if left == CLASSIC:
                c.x = c.x * self.ra
                c.y = c.y * self.ra
        elif left == RADIANS:
            c.z = self.vto_meter * c.z - self.z0

    def inv_finalize(self, c: Coords) -> None:
        if self.left == RADIANS:
            c.x = c.x + self.from_greenwich + self.lam0
            if not self.over:
                c.x = m.adjlon(c.x)
            if self._datum_vgrid is not None:
                self._datum_vgrid._inv(c)  # geometric from orthometric
            if self._datum_hgrid is not None:
                self._datum_hgrid._fwd(c)  # local -> WGS84 via grid
            elif self._datum_helmert is not None:
                from proj_ray.ops.cart import cart_fwd_core, cart_inv_core

                cart_fwd_core(self._cart_local, c)  # local angular -> XYZ
                self._datum_helmert._fwd(c)  # step into WGS84 frame
                cart_inv_core(self._cart_wgs84, c)  # XYZ -> WGS84 angular
            if self.geoc:
                self._geocentric_latitude(c, forward=True)
        c.set_error(np.isnan(c.x) & (c.err == 0), ERR_INVALID_COORD)

    def _geocentric_latitude(self, c: Coords, forward: bool) -> None:
        """Geodetic <-> geocentric latitude (reference src/geocent.cpp /
        pj_geocentric_latitude in 4D_api.cpp)."""
        one_es = self.one_es
        with np.errstate(all="ignore"):
            if forward:  # geodetic -> geocentric
                c.y = np.arctan(one_es * np.tan(c.y))
            else:  # geocentric -> geodetic
                c.y = np.arctan(np.tan(c.y) / one_es)


# ---------------------------------------------------------------------------
# Full application wrappers (pj_fwd4d / pj_inv4d)
# ---------------------------------------------------------------------------


def _nan_in(c: Coords):
    return (np.isnan(c.x) | np.isnan(c.y) | np.isnan(c.z) | np.isnan(c.t))


def _poison_nans(c: Coords, mask) -> None:
    """NaN input propagates NaN on ALL components, without flagging an
    error (reference src/4D_api.cpp:540-546)."""
    if np.any(mask):
        c.x[mask] = np.nan
        c.y[mask] = np.nan
        c.z[mask] = np.nan
        c.t[mask] = np.nan


def apply_fwd(op: Operation, c: Coords) -> Coords:
    if not op.has_fwd:
        c.set_error(np.ones(len(c), dtype=bool), ERR_NO_INVERSE)
        return c
    nan_mask = _nan_in(c)
    if not op.skip_prepare:
        op.fwd_prepare(c)
    with np.errstate(all="ignore"):
        op._fwd(c)
    if not op.skip_finalize:
        op.fwd_finalize(c)
    else:
        c.set_error(np.isnan(c.x) & (c.err == 0) & ~nan_mask,
                    ERR_INVALID_COORD)
    _poison_nans(c, nan_mask)
    return c


def apply_inv(op: Operation, c: Coords) -> Coords:
    if not op.has_inv:
        c.set_error(np.ones(len(c), dtype=bool), ERR_NO_INVERSE)
        return c
    nan_mask = _nan_in(c)
    if not op.skip_prepare:
        op.inv_prepare(c)
    with np.errstate(all="ignore"):
        op._inv(c)
    if not op.skip_finalize:
        op.inv_finalize(c)
    else:
        c.set_error(np.isnan(c.x) & (c.err == 0) & ~nan_mask,
                    ERR_INVALID_COORD)
    _poison_nans(c, nan_mask)
    return c


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

REGISTRY: Dict[str, Type[Operation]] = {}


def register(cls: Type[Operation]) -> Type[Operation]:
    REGISTRY[cls.name] = cls
    for alias in getattr(cls, "aliases", ()):
        REGISTRY[alias] = cls
    return cls
