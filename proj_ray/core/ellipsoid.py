"""Ellipsoid model and registry.

Derived parameters mirror the reference's setup-time precomputation
(``pj_calc_ellipsoid_params``, reference src/ell_set.cpp:549-629): second
and third eccentricities via the angular eccentricity, flattenings, and
reciprocal axes — with the same precedence rules as ``ellps_shape``
(src/ell_set.cpp:243-335): parameters given explicitly (rf→f, b, e) are
kept, the rest derived.  The registry values are the standard published
geodetic ellipsoid constants (reference src/ellps.cpp:8-57; originally
GRS/WGS/IUGG publications — public-domain numeric constants).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


# name -> (a, {"rf": ...} or {"b": ...}) — standard published constants
_ELLPS_TABLE = {
    "MERIT": (6378137.0, {"rf": 298.257}),
    "SGS85": (6378136.0, {"rf": 298.257}),
    "GRS80": (6378137.0, {"rf": 298.257222101}),
    "IAU76": (6378140.0, {"rf": 298.257}),
    "airy": (6377563.396, {"rf": 299.3249646}),
    "APL4.9": (6378137.0, {"rf": 298.25}),
    "NWL9D": (6378145.0, {"rf": 298.25}),
    "mod_airy": (6377340.189, {"b": 6356034.446}),
    "andrae": (6377104.43, {"rf": 300.0}),
    "danish": (6377019.2563, {"rf": 300.0}),
    "aust_SA": (6378160.0, {"rf": 298.25}),
    "GRS67": (6378160.0, {"rf": 298.2471674270}),
    "GSK2011": (6378136.5, {"rf": 298.2564151}),
    "bessel": (6377397.155, {"rf": 299.1528128}),
    "bess_nam": (6377483.865, {"rf": 299.1528128}),
    "clrk66": (6378206.4, {"b": 6356583.8}),
    "clrk80": (6378249.145, {"rf": 293.4663}),
    "clrk80ign": (6378249.2, {"rf": 293.4660212936269}),
    "CPM": (6375738.7, {"rf": 334.29}),
    "delmbr": (6376428.0, {"rf": 311.5}),
    "engelis": (6378136.05, {"rf": 298.2566}),
    "evrst30": (6377276.345, {"rf": 300.8017}),
    "evrst48": (6377304.063, {"rf": 300.8017}),
    "evrst56": (6377301.243, {"rf": 300.8017}),
    "evrst69": (6377295.664, {"rf": 300.8017}),
    "evrstSS": (6377298.556, {"rf": 300.8017}),
    "fschr60": (6378166.0, {"rf": 298.3}),
    "fschr60m": (6378155.0, {"rf": 298.3}),
    "fschr68": (6378150.0, {"rf": 298.3}),
    "helmert": (6378200.0, {"rf": 298.3}),
    "hough": (6378270.0, {"rf": 297.0}),
    "intl": (6378388.0, {"rf": 297.0}),
    "krass": (6378245.0, {"rf": 298.3}),
    "kaula": (6378163.0, {"rf": 298.24}),
    "lerch": (6378139.0, {"rf": 298.257}),
    "mprts": (6397300.0, {"rf": 191.0}),
    "new_intl": (6378157.5, {"b": 6356772.2}),
    "plessis": (6376523.0, {"b": 6355863.0}),
    "PZ90": (6378136.0, {"rf": 298.25784}),
    "SEasia": (6378155.0, {"b": 6356773.3205}),
    "walbeck": (6376896.0, {"b": 6355834.8467}),
    "WGS60": (6378165.0, {"rf": 298.3}),
    "WGS66": (6378145.0, {"rf": 298.25}),
    "WGS72": (6378135.0, {"rf": 298.26}),
    "WGS84": (6378137.0, {"rf": 298.257223563}),
    "sphere": (6370997.0, {"b": 6370997.0}),
}


@dataclass(frozen=True, init=False)
class Ellipsoid:
    """Ellipsoid with the full set of precomputed ancillary parameters."""

    a: float
    es: float
    e: float
    b: float
    ra: float
    rb: float
    one_es: float
    rone_es: float
    f: float
    rf: float
    e2: float  # second eccentricity
    e2s: float
    e3: float  # third eccentricity
    e3s: float
    n: float  # third flattening

    def __init__(self, a: float, es: float, f0: float = 0.0, b0: float = 0.0,
                 e0: float = 0.0):
        """Mirror pj_calc_ellipsoid_params: f0/b0/e0 are values already
        fixed by the parameter that defined the ellipsoid (rf, b or e);
        zero means "derive"."""
        S = lambda k, v: object.__setattr__(self, k, v)
        S("a", a)
        S("es", es)
        e = e0 if e0 != 0.0 else math.sqrt(es)
        S("e", e)
        alpha = math.asin(e)  # angular eccentricity
        S("e2", math.tan(alpha))
        S("e2s", self.e2 * self.e2)
        sa = math.sin(alpha)
        e3 = sa / math.sqrt(2 - sa * sa) if alpha != 0 else 0.0
        S("e3", e3)
        S("e3s", e3 * e3)
        f = f0 if f0 != 0.0 else 1 - math.cos(alpha)
        if not (0.0 <= f < 1.0):
            raise ValueError("invalid eccentricity")
        S("f", f)
        S("rf", 1.0 / f if f != 0 else math.inf)
        S("n", math.tan(alpha / 2) ** 2)
        b = b0 if b0 != 0.0 else (1 - f) * a
        S("b", b)
        S("ra", 1.0 / a)
        S("rb", 1.0 / b)
        one_es = 1.0 - es
        if one_es == 0.0:
            raise ValueError("invalid eccentricity")
        S("one_es", one_es)
        S("rone_es", 1.0 / one_es)

    @property
    def is_sphere(self) -> bool:
        return self.es == 0.0

    @staticmethod
    def from_a_rf(a: float, rf: float) -> "Ellipsoid":
        f = 1.0 / rf
        return Ellipsoid(a=a, es=2 * f - f * f, f0=f)

    @staticmethod
    def from_a_b(a: float, b: float) -> "Ellipsoid":
        if a == b:
            return Ellipsoid(a=a, es=0.0)
        f = (a - b) / a
        return Ellipsoid(a=a, es=2 * f - f * f, f0=f, b0=b)

    @staticmethod
    def from_a_es(a: float, es: float) -> "Ellipsoid":
        return Ellipsoid(a=a, es=es)

    @staticmethod
    def from_a_e(a: float, e: float) -> "Ellipsoid":
        return Ellipsoid(a=a, es=e * e, e0=e)

    @staticmethod
    def from_a_f(a: float, f: float) -> "Ellipsoid":
        return Ellipsoid(a=a, es=2 * f - f * f, f0=f)

    @staticmethod
    def sphere(R: float) -> "Ellipsoid":
        return Ellipsoid(a=R, es=0.0)


def get_ellipsoid(name: str) -> Ellipsoid:
    try:
        a, rest = _ELLPS_TABLE[name]
    except KeyError:
        raise ValueError(f"unknown ellipsoid {name!r}") from None
    if "rf" in rest:
        return Ellipsoid.from_a_rf(a, rest["rf"])
    return Ellipsoid.from_a_b(a, rest["b"])


WGS84 = get_ellipsoid("WGS84")
GRS80 = get_ellipsoid("GRS80")
