"""Vectorized geodesic solvers (direct + inverse problems).

A from-scratch NumPy implementation of C. F. F. Karney, "Algorithms for
geodesics", J. Geodesy 87, 43-55 (2013), at 6th order in the expansion
parameters — the same published algorithm the reference embeds as
src/geodesic.c.  All series coefficients are the published constants
from the paper's appendix.

Every function takes/returns float64 ndarrays (degrees for angles,
meters for distances); iterative solves are fixed-iteration Newton loops
with per-row convergence masks and a vectorized bisection fallback.

Verified against the published test instances mirrored by the
reference's geodtest (src/tests/geodtest.c) in tests/test_geodesic.py.
"""

from __future__ import annotations

import numpy as np

_TINY = np.sqrt(np.finfo(float).tiny)
_TOL0 = np.finfo(float).eps
_TOL1 = 200 * _TOL0
_TOL2 = np.sqrt(_TOL0)
_TOLB = _TOL0 * _TOL2
_XTHRESH = 1000 * _TOL2
_MAXIT1 = 20
_MAXIT2 = _MAXIT1 + 1024 + 10


def _norm2(s, c):
    r = np.hypot(s, c)
    return s / r, c / r


def _rem360(x):
    """IEEE nearest remainder by 360 (ties to even), in [-180, 180]."""
    x = np.asarray(x, dtype=np.float64)
    return x - 360.0 * np.round(x / 360.0)


def _ang_normalize(x):
    """Reduce to [-180, 180] keeping the INPUT's sign on the +/-180
    boundary (reference geodesic.c AngNormalize) — a floor-mod loses
    sub-ulp magnitudes near 0 (mod(-1e-14, 360) -> 360 -> 0), which
    flips lonsign/transit decisions in the polygon-area bookkeeping."""
    y = _rem360(x)
    return np.where(np.abs(y) == 180.0, np.copysign(180.0, x), y)


def _sum_err(u, v):
    """Two-sum: s = fl(u+v) and the exact residual t = u+v-s."""
    s = u + v
    up = s - v
    vpp = s - up
    up = up - u
    vpp = vpp - v
    return s, -(up + vpp)


def _ang_diff(x, y):
    """Exact angle difference y - x in [-180, 180]: two-sum residuals
    decide the SIGN on the 0 / +/-180 boundaries (reference
    geodesic.c AngDiff — the 'Planimeter lon12 rounding bug' fix).  A
    plain normalized subtraction rounds AngDiff(180, 1e-14) to +180,
    flipping the geodesic direction choice and transit parity."""
    return _ang_diff_err(x, y)[0]


def _sincosd(x):
    """sin/cos of an angle in degrees, exact at quadrant boundaries
    and sign-preserving at zero (reference geodesic.c sincosdx): a
    floor-mod reduction turns sin(-1e-15 deg) into +0, which flips
    the alp12 branch in the polygon-area excess."""
    x = np.asarray(x, dtype=np.float64)
    q = np.round(x / 90.0)
    r = np.radians(x - 90.0 * q)
    s, c = np.sin(r), np.cos(r)
    qm = q.astype(np.int64) & 3
    sinx = np.choose(qm, [s, c, -s, -c])
    cosx = np.choose(qm, [c, -s, -c, s])
    sinx = np.where(sinx == 0, np.copysign(np.abs(sinx), x), sinx)
    return sinx + 0.0, cosx + 0.0


def _ang_round(x):
    """Round tiny angles (< 1/16 deg) to suppress below-(z*eps) dirt
    (reference geodesic.c AngRound)."""
    z = 1.0 / 16.0
    y = np.abs(x)
    w = z - y
    y = np.where(w > 0, z - w, y)
    return np.copysign(y, x)


def _sincosde(x, t):
    """sin/cos of (x + t) degrees where |t| is a sub-ulp residual of
    x: the quadrant comes from x, the residual perturbs the reduced
    argument (reference geodesic.c sincosde) — this is what lets a
    1e-14-degree longitude offset pick the correct near-antipodal
    geodesic mirror."""
    q = np.round(np.asarray(x, dtype=np.float64) / 90.0)
    r = x - 90.0 * q
    r = _ang_round(r + t)
    rr = np.radians(r)
    s, c = np.sin(rr), np.cos(rr)
    qm = q.astype(np.int64) & 3
    sinx = np.choose(qm, [s, c, -s, -c])
    cosx = np.choose(qm, [c, -s, -c, s])
    sinx = np.where(sinx == 0, np.copysign(sinx, x), sinx)
    return sinx + 0.0, cosx + 0.0


def _ang_diff_err(x, y):
    """(_ang_diff value, two-sum residual t) — geodesic.c AngDiff with
    its e output."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    d, t = _sum_err(_rem360(-x), _rem360(y))
    d, t = _sum_err(_rem360(d), t)
    boundary = (d == 0) | (np.abs(d) == 180.0)
    sign_src = np.where(t == 0, y - x, -t)
    d = np.where(boundary, np.copysign(np.abs(d), sign_src), d)
    return d, t


def _atan2d(y, x):
    return np.degrees(np.arctan2(y, x))


def _sin_cos_series(sinx, cosx, c: list):
    """Clenshaw sum of c[l]*sin(2l*x), l=1..K (c[0] unused)."""
    K = len(c) - 1
    ar = 2 * (cosx - sinx) * (cosx + sinx)
    y0 = 0.0
    y1 = 0.0
    k = K
    if k % 2 == 1:
        y0 = c[k] * np.ones_like(ar) if np.ndim(c[k]) == 0 else c[k]
        k -= 1
    while k > 0:
        y1 = ar * y0 - y1 + c[k]
        y0 = ar * y1 - y0 + c[k - 1]
        k -= 2
    return 2 * sinx * cosx * y0


# ---------------------------------------------------------------------------
# 6th-order series (published constants, Karney 2013 appendix)
# ---------------------------------------------------------------------------


def _A1m1f(eps):
    eps2 = eps * eps
    t = eps2 * (eps2 * (eps2 + 4) + 64) / 256
    return (t + eps) / (1 - eps)


def _C1f(eps):
    eps2 = eps * eps
    c = [None] * 7
    d = eps
    c[1] = d * ((6 - eps2) * eps2 - 16) / 32
    d = d * eps
    c[2] = d * ((64 - 9 * eps2) * eps2 - 128) / 2048
    d = d * eps
    c[3] = d * (9 * eps2 - 16) / 768
    d = d * eps
    c[4] = d * (3 * eps2 - 5) / 512
    d = d * eps
    c[5] = -7 * d / 1280
    d = d * eps
    c[6] = -7 * d / 2048
    return c


def _C1pf(eps):
    eps2 = eps * eps
    c = [None] * 7
    d = eps
    c[1] = d * (eps2 * (205 * eps2 - 432) + 768) / 1536
    d = d * eps
    c[2] = d * (eps2 * (4005 * eps2 - 4736) + 3840) / 12288
    d = d * eps
    c[3] = d * (116 - 225 * eps2) / 384
    d = d * eps
    c[4] = d * (2695 - 7173 * eps2) / 7680
    d = d * eps
    c[5] = 3467 * d / 7680
    d = d * eps
    c[6] = 38081 * d / 61440
    return c


def _A2m1f(eps):
    # A2/(1-eps) - 1 = -eps2*(11*eps2^2 + 28*eps2 + 192)/256
    eps2 = eps * eps
    t = -eps2 * (eps2 * (11 * eps2 + 28) + 192) / 256
    return (t - eps) / (1 + eps)


def _C2f(eps):
    eps2 = eps * eps
    c = [None] * 7
    d = eps
    c[1] = d * (eps2 * (eps2 + 2) + 16) / 32
    d = d * eps
    c[2] = d * (eps2 * (35 * eps2 + 64) + 384) / 2048
    d = d * eps
    c[3] = d * (15 * eps2 + 80) / 768
    d = d * eps
    c[4] = d * (7 * eps2 + 35) / 512
    d = d * eps
    c[5] = 63 * d / 1280
    d = d * eps
    c[6] = 77 * d / 2048
    return c


def _A3coeff(n):
    return [
        1.0,
        (n - 1) / 2.0,
        (n * (3 * n - 1) - 2) / 8.0,
        ((-n - 3) * n - 1) / 16.0,
        (-2 * n - 3) / 64.0,
        -3.0 / 128.0,
    ]


def _A3f(A3x, eps):
    v = 0.0
    for a in reversed(A3x):
        v = v * eps + a
    return v


def _C3coeff(n):
    return [
        [(1 - n) / 4.0, (1 - n * n) / 8.0, ((3 - n) * n + 3) / 64.0,
         (2 * n + 5) / 128.0, 3.0 / 128.0],
        [((n - 3) * n + 2) / 32.0, ((-3 * n - 2) * n + 3) / 64.0,
         (n + 3) / 128.0, 5.0 / 256.0],
        [(n * (5 * n - 9) + 5) / 192.0, (9 - 4 * n) / 384.0, 7.0 / 512.0],
        [(7 - 14 * n) / 512.0, 7.0 / 512.0],
        [21.0 / 2560.0],
    ]


def _C3f(C3x, eps):
    c = [None] * 6
    mult = 1.0
    for l in range(1, 6):
        mult = mult * eps
        v = 0.0
        for a in reversed(C3x[l - 1]):
            v = v * eps + a
        c[l] = mult * v
    return c


class Geodesic:
    """Ellipsoidal geodesic solver, vectorized over coordinate arrays."""

    def __init__(self, a: float = 6378137.0, f: float = 1 / 298.257223563):
        self.a = a
        self.f = f
        self.f1 = 1 - f
        self.e2 = f * (2 - f)
        self.ep2 = self.e2 / (self.f1 * self.f1)
        self.n = f / (2 - f)
        self.b = a * self.f1
        self.A3x = _A3coeff(self.n)
        self.C3x = _C3coeff(self.n)
        self.etol2 = 0.1 * _TOL2 / np.sqrt(
            max(0.001, abs(f)) * min(1.0, 1 - f / 2) / 2)
        self.C4x = _C4coeff(self.n)
        self.c2 = _geodesic_c2(self.a, self.b, self.e2)

    def _C4f(self, eps):
        """Per-row C4 cosine-series coefficients at eps (list of nC4
        arrays) — geodesic.c C4f."""
        c4 = []
        o = 0
        mult = np.ones_like(eps)
        for ell in range(_nC4):
            m = _nC4 - ell - 1
            v = np.zeros_like(eps)
            for j in range(m + 1):
                v = v * eps + self.C4x[o + j]
            c4.append(v * mult)
            o += m + 1
            mult = mult * eps
        return c4

    def _bet(self, lat):
        sbet, cbet = _sincosd(lat)
        sbet = sbet * self.f1
        sbet, cbet = _norm2(sbet, cbet)
        cbet = np.maximum(cbet, _TINY)
        return sbet, cbet

    # ------------------------------------------------------------------
    def direct(self, lat1, lon1, azi1, s12, extra=False):
        """Direct problem: (lat1, lon1, azi1, s12) -> (lat2, lon2, azi2);
        with extra=True also returns (m12, M12) — reduced length and
        geodesic scale (geod_genposition outputs)."""
        lat1, lon1, azi1, s12 = np.broadcast_arrays(
            *(np.asarray(v, dtype=np.float64)
              for v in (lat1, lon1, azi1, s12)))
        salp1, calp1 = _sincosd(_ang_normalize(azi1))
        sbet1, cbet1 = self._bet(np.clip(lat1, -90, 90))
        dn1 = np.sqrt(1 + self.ep2 * sbet1 * sbet1)

        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = np.where((sbet1 != 0) | (calp1 != 0),
                                 cbet1 * calp1, 1.0)
        ssig1, csig1 = _norm2(ssig1, csig1)

        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A1m1 = _A1m1f(eps)
        C1a = _C1f(eps)
        B11 = _sin_cos_series(ssig1, csig1, C1a)
        s = np.sin(B11)
        c = np.cos(B11)
        stau1 = ssig1 * c + csig1 * s
        ctau1 = csig1 * c - ssig1 * s
        C1pa = _C1pf(eps)

        tau12 = s12 / (self.b * (1 + A1m1))
        s = np.sin(tau12)
        c = np.cos(tau12)
        B12 = -_sin_cos_series(stau1 * c + ctau1 * s,
                               ctau1 * c - stau1 * s, C1pa)
        sig12 = tau12 - (B12 - B11)
        ssig12 = np.sin(sig12)
        csig12 = np.cos(sig12)
        ssig2 = ssig1 * csig12 + csig1 * ssig12
        csig2 = csig1 * csig12 - ssig1 * ssig12
        # one Newton correction of the series inversion (paper §5)
        B12 = _sin_cos_series(ssig2, csig2, C1a)
        serr = (1 + A1m1) * (sig12 + (B12 - B11)) - s12 / self.b
        sig12 = sig12 - serr / np.sqrt(1 + k2 * ssig2 * ssig2)
        ssig12 = np.sin(sig12)
        csig12 = np.cos(sig12)
        ssig2 = ssig1 * csig12 + csig1 * ssig12
        csig2 = csig1 * csig12 - ssig1 * ssig12

        sbet2 = calp0 * ssig2
        cbet2 = np.hypot(salp0, calp0 * csig2)
        cbet2 = np.where(cbet2 == 0, _TINY, cbet2)
        somg2 = salp0 * ssig2
        comg2 = csig2
        salp2 = salp0
        calp2 = calp0 * csig2

        omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1,
                           comg2 * comg1 + somg2 * somg1)
        C3a = _C3f(self.C3x, eps)
        B31 = _sin_cos_series(ssig1, csig1, C3a)
        B32 = _sin_cos_series(ssig2, csig2, C3a)
        A3c = -self.f * salp0 * _A3f(self.A3x, eps)
        lam12 = omg12 + A3c * (sig12 + (B32 - B31))
        lon12 = np.degrees(lam12)
        lon2 = _ang_normalize(_ang_normalize(lon1) + _ang_normalize(lon12))
        lat2 = _atan2d(sbet2, self.f1 * cbet2)
        azi2 = _atan2d(salp2, calp2)
        if not extra:
            return lat2, lon2, azi2
        dn2 = np.sqrt(1 + self.ep2 * sbet2 * sbet2)
        _, m12b, M12, _ = self._lengths(eps, sig12, ssig1, csig1, dn1,
                                        ssig2, csig2, dn2,
                                        cbet1=cbet1, cbet2=cbet2, scale=True)
        return lat2, lon2, azi2, m12b * self.b, M12

    # ------------------------------------------------------------------
    def _lengths(self, eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
                 cbet1=None, cbet2=None, scale=False):
        """Return (s12b, m12b) or with scale=True (s12b, m12b, M12, M21)
        — geodesic scale per Karney 2013 eq. 38 / geodesic.c Lengths."""
        A1m1 = _A1m1f(eps)
        A2m1 = _A2m1f(eps)
        C1a = _C1f(eps)
        C2a = _C2f(eps)
        B1d = (_sin_cos_series(ssig2, csig2, C1a)
               - _sin_cos_series(ssig1, csig1, C1a))
        B2d = (_sin_cos_series(ssig2, csig2, C2a)
               - _sin_cos_series(ssig1, csig1, C2a))
        m0x = A1m1 - A2m1
        J12 = m0x * sig12 + ((1 + A1m1) * B1d - (1 + A2m1) * B2d)
        m12b = (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                - csig1 * csig2 * J12)
        s12b = (1 + A1m1) * (sig12 + B1d)
        if not scale:
            return s12b, m12b
        csig12 = csig1 * csig2 + ssig1 * ssig2
        t = (self.ep2 * (cbet1 - cbet2) * (cbet1 + cbet2) / (dn1 + dn2))
        M12 = csig12 + (t * ssig2 - csig2 * J12) * ssig1 / dn1
        M21 = csig12 - (t * ssig1 - csig1 * J12) * ssig2 / dn2
        return s12b, m12b, M12, M21

    def _lambda12(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1,
                  diffp):
        calp1 = np.where((sbet1 == 0) & (calp1 == 0), -_TINY, calp1)
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)

        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = calp1 * cbet1
        ssig1, csig1 = _norm2(ssig1, csig1)

        salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
        inner = np.where(cbet1 < -sbet1,
                         (cbet2 - cbet1) * (cbet1 + cbet2),
                         (sbet1 - sbet2) * (sbet1 + sbet2))
        calp2 = np.where(
            (cbet2 != cbet1) | (np.abs(sbet2) != -sbet1),
            np.sqrt(np.maximum((calp1 * cbet1) ** 2 + inner, 0.0)) / cbet2,
            np.abs(calp1))
        ssig2 = sbet2
        somg2 = salp0 * sbet2
        csig2 = comg2 = calp2 * cbet2
        ssig2, csig2 = _norm2(ssig2, csig2)

        sig12 = np.arctan2(np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
                           csig1 * csig2 + ssig1 * ssig2)
        somg12 = np.maximum(comg1 * somg2 - somg1 * comg2, 0.0)
        comg12 = comg1 * comg2 + somg1 * somg2
        omg12 = np.arctan2(somg12, comg12)

        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        C3a = _C3f(self.C3x, eps)
        B312 = (_sin_cos_series(ssig2, csig2, C3a)
                - _sin_cos_series(ssig1, csig1, C3a))
        eta = -self.f * _A3f(self.A3x, eps) * salp0 * (sig12 + B312)
        lam12 = omg12 + eta

        dlam12 = None
        if diffp:
            with np.errstate(all="ignore"):
                _, m12b = self._lengths(eps, sig12, ssig1, csig1, dn1,
                                        ssig2, csig2, dn2)
                dlam12 = np.where(calp2 == 0,
                                  -2 * self.f1 * dn1 / sbet1,
                                  m12b / (calp2 * cbet2) * self.f1)
        return (sig12, salp2, calp2, ssig1, csig1, ssig2, csig2, eps,
                lam12, dlam12)

    @staticmethod
    def _astroid(x, y):
        """Positive root k of k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2."""
        p = x * x
        q = y * y
        r = (p + q - 1) / 6.0
        with np.errstate(all="ignore"):
            S = p * q / 4
            r2 = r * r
            r3 = r * r2
            disc = S * (S + 2 * r3)
            T3 = S + r3
            T3 = T3 + np.where(T3 < 0, -np.sqrt(np.maximum(disc, 0)),
                               np.sqrt(np.maximum(disc, 0)))
            T = np.cbrt(T3)
            u_pos = r + T + np.where(T != 0, r2 / np.where(T == 0, 1, T), 0.0)
            ang = np.arctan2(np.sqrt(np.maximum(-disc, 0)), -(S + r3))
            u_neg = r + 2 * r * np.cos(ang / 3)
            u = np.where(disc >= 0, u_pos, u_neg)
            v = np.sqrt(u * u + q)
            uv = np.where(u < 0, q / (v - u), u + v)
            w = (uv - q) / (2 * v)
            k = uv / (np.sqrt(uv + w * w) + w)
        trivial = (q == 0) & (r <= 0)
        return np.where(trivial, 0.0, k)

    def _inverse_start(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                       lam12, slam12, clam12):
        """Starting alp1; sig12>=0 flags an exact short-line solve."""
        f, f1, n = self.f, self.f1, self.n
        sbet12 = sbet2 * cbet1 - cbet2 * sbet1
        cbet12 = cbet2 * cbet1 + sbet2 * sbet1
        sbet12a = sbet2 * cbet1 + cbet2 * sbet1

        shortline = (cbet12 >= 0) & (sbet12 < 0.5) & (cbet2 * lam12 < 0.5)
        sbetm2 = (sbet1 + sbet2) ** 2
        sbetm2 = sbetm2 / (sbetm2 + (cbet1 + cbet2) ** 2)
        dnm = np.where(shortline, np.sqrt(1 + self.ep2 * sbetm2), 1.0)
        omg12 = lam12 / (f1 * dnm)
        # non-shortline branch uses the exact slam12/clam12 rather than
        # sin/cos(lam12) (geodesic.c:1256-1257, exact at lam12 = pi)
        somg12 = np.where(shortline, np.sin(omg12), slam12)
        comg12 = np.where(shortline, np.cos(omg12), clam12)

        salp1 = cbet2 * somg12
        # both np.where arms evaluate: guard the 1±comg12 denominators
        # (comg12 == ±1 at coincident longitudes / antipodal points)
        den_p = 1 + comg12
        den_m = 1 - comg12
        calp1 = np.where(
            comg12 >= 0,
            sbet12 + cbet2 * sbet1 * somg12 * somg12
            / np.where(den_p == 0, 1.0, den_p),
            sbet12a - cbet2 * sbet1 * somg12 * somg12
            / np.where(den_m == 0, 1.0, den_m))
        ssig12 = np.hypot(salp1, calp1)
        csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

        really_short = shortline & (ssig12 < self.etol2)
        sig12 = np.where(really_short, np.arctan2(ssig12, csig12), -1.0)

        need_astroid = (~really_short) & ~(
            (abs(n) > 0.1) | (csig12 >= 0)
            | (ssig12 >= 6 * abs(n) * np.pi * cbet1 * cbet1))
        if np.any(need_astroid):
            # near-antipodal: astroid starting guess (f >= 0 branch;
            # oblate ellipsoids only in this engine)
            k2 = sbet1 * sbet1 * self.ep2
            eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
            lamscale = f * cbet1 * _A3f(self.A3x, eps) * np.pi
            betscale = lamscale * cbet1
            lam12x = np.arctan2(-slam12, -clam12)
            with np.errstate(all="ignore"):
                x = lam12x / np.where(lamscale == 0, _TINY, lamscale)
                y = sbet12a / np.where(betscale == 0, _TINY, betscale)
            linear = (y > -_TOL1) & (x > -1 - _XTHRESH)
            salp1_lin = np.minimum(1.0, -x)
            calp1_lin = -np.sqrt(np.maximum(1 - salp1_lin * salp1_lin, 0.0))
            k = self._astroid(x, y)
            omg12a = lamscale * (-x * k / (1 + k))
            somg12a = np.sin(omg12a)
            comg12a = -np.cos(omg12a)
            salp1_ast = cbet2 * somg12a
            calp1_ast = sbet12a - cbet2 * sbet1 * somg12a * somg12a \
                / (1 - comg12a)
            salp1 = np.where(need_astroid,
                             np.where(linear, salp1_lin, salp1_ast), salp1)
            calp1 = np.where(need_astroid,
                             np.where(linear, calp1_lin, calp1_ast), calp1)

        ok = salp1 > 0
        salp1 = np.where(ok, salp1, 1.0)
        calp1 = np.where(ok, calp1, 0.0)
        salp1, calp1 = _norm2(salp1, calp1)
        return sig12, salp1, calp1, dnm

    def inverse(self, lat1, lon1, lat2, lon2, extra=False,
                area=False):
        """Inverse problem: returns (s12 meters, azi1 deg, azi2 deg);
        with extra=True also (m12, M12, M21) — reduced length and
        geodesic scales; with area=True the tuple gains S12, the
        geodesic-quadrilateral area (geod_geninverse's area output) —
        computed in the CANONICAL frame with the swap/lonsign/latsign
        fixups, where the boundary sign conventions pair correctly
        with the polygon transit bookkeeping (geodesic.c:955-1017)."""
        lat1, lon1, lat2, lon2 = np.broadcast_arrays(
            *(np.asarray(v, dtype=np.float64)
              for v in (lat1, lon1, lat2, lon2)))
        shape = lat1.shape
        lat1 = np.clip(lat1.ravel(), -90, 90).copy()
        lat2 = np.clip(lat2.ravel(), -90, 90).copy()
        lon1 = lon1.ravel()
        lon2 = lon2.ravel()
        nrows = lat1.size

        lon12, lon12s = _ang_diff_err(lon1, lon2)
        lonsign = np.where(np.signbit(lon12), -1.0, 1.0)
        lon12 = lon12 * lonsign
        lon12s = lon12s * lonsign
        swapp = np.abs(lat1) < np.abs(lat2)
        swsign = np.where(swapp, -1.0, 1.0)
        lonsign = lonsign * swsign  # reference flips lonsign on swap
        a1 = np.where(swapp, lat2, lat1)
        a2 = np.where(swapp, lat1, lat2)
        latsign = np.where(a1 < 0, 1.0, -1.0)
        a1 = a1 * latsign
        a2 = a2 * latsign
        # now a1 <= 0 and |a1| >= |a2|

        sbet1, cbet1 = self._bet(a1)
        sbet2, cbet2 = self._bet(a2)
        # tighten symmetry: equal |lat| -> identical |sbet|
        close = cbet1 < -sbet1
        sbet2 = np.where(close & (cbet2 == cbet1),
                         np.where(sbet2 < 0, sbet1, -sbet1), sbet2)
        cbet2 = np.where((~close) & (np.abs(sbet2) == -sbet1), cbet1, cbet2)
        dn1 = np.sqrt(1 + self.ep2 * sbet1 * sbet1)
        dn2 = np.sqrt(1 + self.ep2 * sbet2 * sbet2)

        lam12 = np.radians(lon12)
        slam12, clam12 = _sincosde(lon12, lon12s)

        s12 = np.full(nrows, np.nan)
        m12 = np.full(nrows, np.nan)
        M12 = np.full(nrows, np.nan)
        M21 = np.full(nrows, np.nan)
        salp1 = np.zeros(nrows)
        calp1 = np.zeros(nrows)
        salp2 = np.zeros(nrows)
        calp2 = np.zeros(nrows)
        done = np.zeros(nrows, dtype=bool)

        # meridional
        meridian = (a1 == -90) | (slam12 == 0)
        if np.any(meridian):
            mi = meridian
            ca1 = clam12[mi]
            sa1 = slam12[mi]  # head to target longitude
            # at the target we're heading north: salp2=0, calp2=1
            ssig1 = sbet1[mi]
            csig1 = ca1 * cbet1[mi]
            ssig2 = sbet2[mi]
            csig2 = cbet2[mi]
            sig12m = np.arctan2(
                np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
                csig1 * csig2 + ssig1 * ssig2)
            eps_m = np.full_like(sig12m, self.n)
            s12b, m12b, M12m, M21m = self._lengths(
                eps_m, sig12m, ssig1, csig1, dn1[mi], ssig2, csig2, dn2[mi],
                cbet1=cbet1[mi], cbet2=cbet2[mi], scale=True)
            valid = (sig12m < 1) | (m12b >= 0)
            s12[mi] = np.where(valid, s12b * self.b, np.nan)
            m12[mi] = np.where(valid, m12b * self.b, np.nan)
            M12[mi] = np.where(valid, M12m, np.nan)
            M21[mi] = np.where(valid, M21m, np.nan)
            salp1[mi] = sa1
            calp1[mi] = ca1
            salp2[mi] = 0.0
            calp2[mi] = 1.0
            done[mi] = valid

        # equatorial
        equat = (~done) & (sbet1 == 0) & (sbet2 == 0) \
            & (lam12 <= self.f1 * np.pi)
        if np.any(equat):
            ei = equat
            s12[ei] = self.a * lam12[ei]
            sig12e = lam12[ei] / self.f1
            m12[ei] = self.b * np.sin(sig12e)
            M12[ei] = np.cos(sig12e)
            M21[ei] = np.cos(sig12e)
            salp1[ei] = 1.0
            calp1[ei] = 0.0
            salp2[ei] = 1.0
            calp2[ei] = 0.0
            done[ei] = True

        # general
        gen = ~done
        if np.any(gen):
            g = np.flatnonzero(gen)
            sb1, cb1 = sbet1[g], cbet1[g]
            sb2, cb2 = sbet2[g], cbet2[g]
            d1, d2 = dn1[g], dn2[g]
            lm12 = lam12[g]
            sl12, cl12 = slam12[g], clam12[g]
            sig12g, sa1, ca1, dnm = self._inverse_start(
                sb1, cb1, d1, sb2, cb2, d2, lm12, sl12, cl12)
            short_exact = sig12g >= 0
            s12g = np.where(short_exact, self.b * dnm * sig12g, np.nan)
            with np.errstate(all="ignore"):
                m12g = np.where(short_exact,
                                self.b * dnm * dnm * np.sin(sig12g / dnm),
                                np.nan)
                Mg = np.where(short_exact, np.cos(sig12g / dnm), np.nan)
            M12g = Mg.copy()
            M21g = Mg.copy()
            sa2 = np.zeros_like(sa1)
            ca2 = np.zeros_like(ca1)

            active = ~short_exact
            salp1a = np.full_like(sa1, _TINY)
            calp1a = np.ones_like(ca1)
            salp1b = np.full_like(sa1, _TINY)
            calp1b = np.full_like(ca1, -1.0)
            tripn = np.zeros_like(active)
            tripb = np.zeros_like(active)
            eps_out = np.zeros_like(sa1)
            sig12n = np.zeros_like(sa1)
            ss1 = np.zeros_like(sa1)
            cs1 = np.ones_like(sa1)
            ss2 = np.zeros_like(sa1)
            cs2 = np.ones_like(sa1)
            for it in range(_MAXIT2):
                if not np.any(active):
                    break
                (sig12i, salp2i, calp2i, ssig1i, csig1i, ssig2i, csig2i,
                 epsi, lam12i, dlam12i) = self._lambda12(
                    sb1, cb1, d1, sb2, cb2, d2, sa1, ca1, True)
                v = lam12i - lm12
                conv = active & (tripb
                                 | ~(np.abs(v) >= np.where(tripn, 8, 1)
                                     * _TOL0))
                upd = active
                sig12n = np.where(upd, sig12i, sig12n)
                sa2 = np.where(upd, salp2i, sa2)
                ca2 = np.where(upd, calp2i, ca2)
                eps_out = np.where(upd, epsi, eps_out)
                ss1 = np.where(upd, ssig1i, ss1)
                cs1 = np.where(upd, csig1i, cs1)
                ss2 = np.where(upd, ssig2i, ss2)
                cs2 = np.where(upd, csig2i, cs2)
                active = active & ~conv
                if not np.any(active):
                    break
                with np.errstate(all="ignore"):
                    upd_b = active & (v > 0) & (
                        (it > _MAXIT1) | (ca1 / sa1 > calp1b / salp1b))
                    salp1b = np.where(upd_b, sa1, salp1b)
                    calp1b = np.where(upd_b, ca1, calp1b)
                    upd_a = active & (v < 0) & (
                        (it > _MAXIT1) | (ca1 / sa1 < calp1a / salp1a))
                    salp1a = np.where(upd_a, sa1, salp1a)
                    calp1a = np.where(upd_a, ca1, calp1a)
                if it < _MAXIT1:
                    with np.errstate(all="ignore"):
                        dalp1 = -v / dlam12i
                        sdalp1 = np.sin(dalp1)
                        cdalp1 = np.cos(dalp1)
                        nsalp1 = sa1 * cdalp1 + ca1 * sdalp1
                        newton_ok = active & (dlam12i > 0) & (nsalp1 > 0) \
                            & (np.abs(dalp1) < np.pi)
                        ca1 = np.where(newton_ok,
                                       ca1 * cdalp1 - sa1 * sdalp1, ca1)
                        sa1 = np.where(newton_ok, nsalp1, sa1)
                        sa1n, ca1n = _norm2(sa1, ca1)
                        sa1 = np.where(active, sa1n, sa1)
                        ca1 = np.where(active, ca1n, ca1)
                        tripn = np.where(newton_ok,
                                         np.abs(v) <= 16 * _TOL0, tripn)
                    bisect = active & ~newton_ok
                else:
                    bisect = active
                if np.any(bisect):
                    sm = (salp1a + salp1b) / 2
                    cm = (calp1a + calp1b) / 2
                    smn, cmn = _norm2(sm, cm)
                    sa1 = np.where(bisect, smn, sa1)
                    ca1 = np.where(bisect, cmn, ca1)
                    tripn = np.where(bisect, False, tripn)
                    tb = ((np.abs(salp1a - sa1) + (calp1a - ca1) < _TOLB)
                          | (np.abs(sa1 - salp1b) + (ca1 - calp1b) < _TOLB))
                    tripb = np.where(bisect, tb, tripb)
            newton_rows = ~short_exact
            if np.any(newton_rows):
                s12b, m12b, M12n, M21n = self._lengths(
                    eps_out, sig12n, ss1, cs1, d1, ss2, cs2, d2,
                    cbet1=cb1, cbet2=cb2, scale=True)
                s12g = np.where(newton_rows, s12b * self.b, s12g)
                m12g = np.where(newton_rows, m12b * self.b, m12g)
                M12g = np.where(newton_rows, M12n, M12g)
                M21g = np.where(newton_rows, M21n, M21g)
            if np.any(short_exact):
                res = self._lambda12(sb1, cb1, d1, sb2, cb2, d2, sa1, ca1,
                                     False)
                sa2 = np.where(short_exact, res[1], sa2)
                ca2 = np.where(short_exact, res[2], ca2)
            s12[g] = s12g
            m12[g] = m12g
            M12[g] = M12g
            M21[g] = M21g
            salp1[g] = sa1
            calp1[g] = ca1
            salp2[g] = sa2
            calp2[g] = ca2

        S12 = None
        if area:
            # geodesic-quadrilateral area per edge, in the CANONICAL
            # frame (salp/calp/sbet/cbet as of this point), then the
            # swapp*lonsign*latsign sign fixup — geodesic.c:955-1017.
            # The omg12-based short-edge excess variant is skipped
            # (pure roundoff trim; see polygon_area_perimeter).
            with np.errstate(all="ignore"):
                salp0 = salp1 * cbet1
                calp0 = np.hypot(calp1, salp1 * sbet1)
                ssig1, csig1 = _norm2(sbet1, calp1 * cbet1)
                ssig2, csig2 = _norm2(sbet2, calp2 * cbet2)
                k2 = calp0 * calp0 * self.ep2
                eps_a = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
                A4 = self.a * self.a * calp0 * salp0 * self.e2
                c4 = self._C4f(eps_a)
                B41 = _cos_series(ssig1, csig1, c4)
                B42 = _cos_series(ssig2, csig2, c4)
                integral = np.where((calp0 != 0) & (salp0 != 0),
                                    A4 * (B42 - B41), 0.0)
                salp12 = salp2 * calp1 - calp2 * salp1
                calp12 = calp2 * calp1 + salp2 * salp1
                degc = (salp12 == 0) & (calp12 < 0)
                salp12 = np.where(degc, _TINY * calp1, salp12)
                calp12 = np.where(degc, -1.0, calp12)
                alp12 = np.arctan2(salp12, calp12)
                S12 = (self.c2 * alp12 + integral) \
                    * swsign * lonsign * latsign
                S12 = S12 + 0.0

        # undo canonicalization (reference bookkeeping: swap azimuths on
        # point swap; salp *= swapp*lonsign, calp *= swapp*latsign)
        tM = M12.copy()
        M12 = np.where(swapp, M21, M12)
        M21 = np.where(swapp, tM, M21)
        t_s, t_c = salp1.copy(), calp1.copy()
        salp1 = np.where(swapp, salp2, salp1)
        calp1 = np.where(swapp, calp2, calp1)
        salp2 = np.where(swapp, t_s, salp2)
        calp2 = np.where(swapp, t_c, calp2)
        salp1 = salp1 * swsign * lonsign
        calp1 = calp1 * swsign * latsign
        salp2 = salp2 * swsign * lonsign
        calp2 = calp2 * swsign * latsign
        azi1 = _atan2d(salp1, calp1)
        azi2 = _atan2d(salp2, calp2)
        out = (s12.reshape(shape), azi1.reshape(shape),
               azi2.reshape(shape))
        if extra:
            out = out + (m12.reshape(shape), M12.reshape(shape),
                         M21.reshape(shape))
        if area:
            out = out + (S12.reshape(shape),)
        return out


_CACHE: dict = {}


def geodesic(a: float = 6378137.0, f: float = 1 / 298.257223563) -> Geodesic:
    key = (a, f)
    if key not in _CACHE:
        _CACHE[key] = Geodesic(a, f)
    return _CACHE[key]


def wgs84() -> Geodesic:
    return geodesic()


def geodesic_inverse(lat1, lon1, lat2, lon2, a=6378137.0,
                     f=1 / 298.257223563):
    return geodesic(a, f).inverse(lat1, lon1, lat2, lon2)


def geodesic_direct(lat1, lon1, azi1, s12, a=6378137.0, f=1 / 298.257223563):
    return geodesic(a, f).direct(lat1, lon1, azi1, s12)


# ---------------------------------------------------------------------------
# Geodesic polygon area (Karney 2013 §6; reference src/geodesic.c
# C4coeff:1693, SinCosSeries cos-form:1087, area assembly:960-1017,
# transit:1749, areareduceA:1861)
# ---------------------------------------------------------------------------

# C4 series: I4 integrand expansion to 6th order.  Flattened blocks of
# (numerator-polynomial-in-n coefficients ..., common denominator) for
# C4[l], eps^j — the published constant table (Karney 2013 eq. 65 /
# GeographicLib series supplement), laid out exactly as the reference's
# C4coeff so the block walk below mirrors its o/k loop.
_C4_COEFF = [
    # C4[0]: eps^5..eps^0, polynomial order 0..5 in n
    [97, 15015],
    [1088, 156, 45045],
    [-224, -4784, 1573, 45045],
    [-10656, 14144, -4576, -858, 45045],
    [64, 624, -4576, 6864, -3003, 15015],
    [100, 208, 572, 3432, -12012, 30030, 45045],
    # C4[1]: eps^5..eps^1
    [1, 9009],
    [-2944, 468, 135135],
    [5792, 1040, -1287, 135135],
    [5952, -11648, 9152, -2574, 135135],
    [-64, -624, 4576, -6864, 3003, 135135],
    # C4[2]: eps^5..eps^2
    [8, 10725],
    [1856, -936, 225225],
    [-8448, 4992, -1144, 225225],
    [-1440, 4160, -4576, 1716, 225225],
    # C4[3]: eps^5..eps^3
    [-136, 63063],
    [1024, -208, 105105],
    [3584, -3328, 1144, 315315],
    # C4[4]: eps^5..eps^4
    [-128, 135135],
    [-2560, 832, 405405],
    # C4[5]: eps^5
    [128, 99099],
]

_nC4 = 6


def _C4coeff(n: float) -> list:
    """C4x: per-(l, j) numeric coefficients at third flattening n."""
    out = []
    for block in _C4_COEFF:
        num, den = block[:-1], block[-1]
        v = 0.0
        for c in num:          # Horner in n, highest order first
            v = v * n + c
        out.append(v / den)
    return out


def _cos_series(sinx, cosx, c):
    """Clenshaw sum of c[l]*cos((2l+1)x), l=0..K-1 (the cos form of
    SinCosSeries, reference geodesic.c:1087-1108)."""
    K = len(c)
    ar = 2 * (cosx - sinx) * (cosx + sinx)
    k = K
    if k % 2 == 1:
        k -= 1
        y0 = c[k] * np.ones_like(ar)
    else:
        y0 = np.zeros_like(ar)
    y1 = np.zeros_like(ar)
    while k > 0:
        y1 = ar * y0 - y1 + c[k - 1]
        y0 = ar * y1 - y0 + c[k - 2]
        k -= 2
    return cosx * (y0 - y1)


def _transit(lon1, lon2):
    """+1/-1 per eastward/westward prime-antimeridian crossing
    (reference geodesic.c transit:1749-1760), vectorized."""
    lon12 = _ang_diff(lon1, lon2)
    l1 = _ang_normalize(lon1)
    l2 = _ang_normalize(lon2)
    east = (lon12 > 0) & (((l1 < 0) & (l2 >= 0)) | ((l1 > 0) & (l2 == 0)))
    west = (lon12 < 0) & (l1 >= 0) & (l2 < 0)
    return east.astype(np.int64) - west.astype(np.int64)


def _geodesic_c2(a: float, b: float, e2: float) -> float:
    """Authalic radius squared (reference geod_init:307-310)."""
    import math

    if e2 == 0:
        ratio = 1.0
    elif e2 > 0:
        ratio = math.atanh(math.sqrt(e2)) / math.sqrt(e2)
    else:
        ratio = math.atan(math.sqrt(-e2)) / math.sqrt(-e2)
    return (a * a + b * b * ratio) / 2


def polygon_area_perimeter(geod: "Geodesic", lats, lons):
    """Exact ellipsoidal polygon area + perimeter (the reference's
    geod_polygonarea): per edge, S12 = c2*(alp2-alp1) + A4*(B42-B41)
    with the C4 cosine series, accumulated with antimeridian-crossing
    bookkeeping and reduced to the counter-clockwise-positive
    representative in (-area0/2, area0/2].

    Returns (area_m2, perimeter_m).  Vectorized: ONE batched inverse
    solve over all edges.  The alp12 spherical-excess term uses the
    direct azimuth-difference form for every edge (the reference adds
    an omg12-based variant for short edges purely to trim roundoff;
    the absolute error of the direct form is ~c2*2^-52 ~ 0.01 m^2 per
    vertex, inside every published planimeter tolerance — verified
    against geodtest.c's pinned cases in tests/test_geodesic.py).
    """
    import math

    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    if len(lats) < 3:
        return 0.0, 0.0
    lat1 = lats
    lon1 = lons
    lat2 = np.roll(lats, -1)
    lon2 = np.roll(lons, -1)
    with np.errstate(invalid="ignore", divide="ignore"):
        s12, azi1, azi2, S12 = geod.inverse(lat1, lon1, lat2, lon2,
                                            area=True)
    perimeter = math.fsum(s12)
    area = math.fsum(S12)
    crossings = int(_transit(lon1, lon2).sum())

    area0 = 4 * math.pi * geod.c2
    area = math.remainder(area, area0)
    if crossings & 1:
        area += (area0 / 2) if area < 0 else (-area0 / 2)
    area = -area  # clockwise accumulation -> counter-clockwise positive
    if area > area0 / 2:
        area -= area0
    elif area <= -area0 / 2:
        area += area0
    return area, perimeter
