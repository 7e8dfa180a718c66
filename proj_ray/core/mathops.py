"""Vectorized shared math kernels.

NumPy re-expressions of the reference's scalar helper functions:
longitude wrap (src/adjlon.cpp:7-23), meridional arc via 6th-order
Clenshaw series in the third flattening (src/mlfn.cpp), isometric
latitude helpers ts/phi2 with Newton inversion of tau' -> tau
(src/tsfn.cpp, src/phi2.cpp: GeographicLib tauf algorithm, Karney 2011
eq. 7), authalic q (src/qsfn.cpp), clamped trig (src/aasincos.cpp), and
the real/complex Clenshaw summations used by the Poder/Engsager
transverse Mercator (src/projections/tmerc.cpp:263-325).

All functions accept and return float64 ndarrays (scalars broadcast) and
never raise on domain errors — callers detect NaN / sentinel outputs.
"""

from __future__ import annotations

import numpy as np

M_PI = np.pi
M_TWOPI = 2 * np.pi
M_HALFPI = np.pi / 2
M_FORTPI = np.pi / 4
DEG_TO_RAD = np.pi / 180.0
RAD_TO_DEG = 180.0 / np.pi
EPS_LAT = 1e-12  # PJ_EPS_LAT, reference src/proj_internal.h


def adjlon(lon: np.ndarray) -> np.ndarray:
    """Wrap longitude to +/-pi, with slight date-line overshoot allowed."""
    lon = np.asarray(lon, dtype=np.float64)
    need = np.abs(lon) >= M_PI + 1e-12
    if not np.any(need):
        return lon
    out = lon.copy()
    v = lon[need] + M_PI
    v -= M_TWOPI * np.floor(v / M_TWOPI)
    out[need] = v - M_PI
    return out


# ---------------------------------------------------------------------------
# Meridional arc (mlfn): 6th-order expansion in third flattening n
# ---------------------------------------------------------------------------

_LMAX = 6
# (2k-3)!!/(2k)!! squared, k=0..3 — quarter-meridian series in n^2
_COEFF_RAD = np.array([1.0, 1.0 / 4, 1.0 / 64, 1.0 / 256])
# phi -> mu coefficients (Karney, arXiv:2212.05818 Eq. A5, zero terms dropped)
_COEFF_MU_PHI = np.array([
    -3.0 / 2, 9.0 / 16, -3.0 / 32, 15.0 / 16,
    -15.0 / 32, 135.0 / 2048, -35.0 / 48, 105.0 / 256,
    315.0 / 512, -189.0 / 512, -693.0 / 1280, 1001.0 / 2048,
])
# mu -> phi coefficients (Eq. A6)
_COEFF_PHI_MU = np.array([
    3.0 / 2, -27.0 / 32, 269.0 / 512, 21.0 / 16,
    -55.0 / 32, 6759.0 / 4096, 151.0 / 96, -417.0 / 128,
    1097.0 / 512, -15543.0 / 2560, 8011.0 / 2560, 293393.0 / 61440,
])


def _polyval(x: float, p: np.ndarray) -> float:
    """Horner evaluation of sum(p[i] x^i) (ascending coefficients)."""
    y = 0.0
    for c in p[::-1]:
        y = y * x + c
    return y


def enfn(n: float) -> np.ndarray:
    """Precompute meridional-arc series coefficients for third flattening n.

    Returns a (2*6+1,) array: [scale, mu(phi) c1..c6, phi(mu) c1..c6].
    """
    n2 = n * n
    en = np.empty(2 * _LMAX + 1)
    en[0] = _polyval(n2, _COEFF_RAD[: _LMAX // 2 + 1]) / (1 + n)
    d = n
    o = 0
    for l in range(_LMAX):
        m = (_LMAX - l - 1) // 2
        en[l + 1] = d * _polyval(n2, _COEFF_MU_PHI[o : o + m + 1])
        en[l + 1 + _LMAX] = d * _polyval(n2, _COEFF_PHI_MU[o : o + m + 1])
        d *= n
        o += m + 1
    return en


def _clenshaw_sin_even(szeta, czeta, c: np.ndarray):
    """sum(c[k] * sin((2k+2) zeta)) by Clenshaw; szeta/czeta are arrays."""
    u0 = 0.0
    u1 = 0.0
    X = 2 * (czeta - szeta) * (czeta + szeta)  # 2 cos(2 zeta)
    for k in range(len(c) - 1, -1, -1):
        t = X * u0 - u1 + c[k]
        u1 = u0
        u0 = t
    return 2 * szeta * czeta * u0


def mlfn(phi, sphi, cphi, en: np.ndarray):
    return en[0] * (phi + _clenshaw_sin_even(sphi, cphi, en[1 : 1 + _LMAX]))


def inv_mlfn(mu, en: np.ndarray):
    mu = mu / en[0]
    return mu + _clenshaw_sin_even(np.sin(mu), np.cos(mu), en[1 + _LMAX :])


# ---------------------------------------------------------------------------
# Isometric-latitude helpers
# ---------------------------------------------------------------------------


def msfn(sinphi, cosphi, es):
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def tsfn(phi, sinphi, e):
    """ts = exp(-psi): reference tsfn.cpp formulation, stable at both poles."""
    cosphi = np.cos(phi)
    pos = sinphi > 0
    base = np.where(pos, cosphi / (1 + sinphi), (1 - sinphi) / cosphi)
    return np.exp(e * np.arctanh(e * sinphi)) * base


_ROOTEPS = np.sqrt(np.finfo(np.float64).eps)
_TAU_TOL = _ROOTEPS / 10
_TAU_MAX = 2 / _ROOTEPS


def sinhpsi2tanphi(taup, e):
    """Convert tau' = tan(chi) to tau = tan(phi) (GeographicLib tauf).

    Fixed 5-iteration Newton loop with per-row convergence masking; rows
    that fail to converge return NaN.
    """
    taup = np.asarray(taup, dtype=np.float64)
    e2m = 1.0 - e * e
    stol = _TAU_TOL * np.maximum(1.0, np.abs(taup))
    if e != 0.0:
        big = np.abs(taup) > 70
        tau = np.where(big, taup * np.exp(e * np.arctanh(e)), taup / e2m)
    else:
        tau = taup.copy()
    # rows beyond the large-arg threshold (or inf/nan) are exact already
    active = np.abs(tau) < _TAU_MAX
    converged = ~active
    for _ in range(5):
        if not np.any(active):
            break
        with np.errstate(all="ignore"):
            tau1 = np.sqrt(1 + tau * tau)
            sig = np.sinh(e * np.arctanh(e * tau / tau1))
            taupa = np.sqrt(1 + sig * sig) * tau - sig * tau1
            dtau = ((taup - taupa) * (1 + e2m * tau * tau)
                    / (e2m * tau1 * np.sqrt(1 + taupa * taupa)))
        tau = np.where(active, tau + dtau, tau)
        done = ~(np.abs(dtau) >= stol)  # backwards test: NaN counts as done
        converged |= active & done
        active &= ~done
    # non-converged rows -> NaN (reference raises errno instead)
    if np.any(active):
        tau = np.where(active, np.nan, tau)
    return tau


def phi2(ts, e):
    """Inverse isometric latitude: phi from ts = exp(-psi)."""
    return np.arctan(sinhpsi2tanphi((1.0 / ts - ts) / 2.0, e))


def qsfn(sinphi, e, one_es):
    """Authalic-latitude q (reference src/qsfn.cpp)."""
    if e >= 1.0e-7:
        con = e * sinphi
        div1 = 1.0 - con * con
        div2 = 1.0 + con
        with np.errstate(all="ignore"):
            out = one_es * (sinphi / div1 - (0.5 / e) * np.log((1.0 - con) / div2))
        return np.where((div1 == 0.0) | (div2 == 0.0), np.inf, out)
    return sinphi + sinphi


# ---------------------------------------------------------------------------
# Clamped trig (aasincos.cpp) — no error signalling; out-of-range clamps
# ---------------------------------------------------------------------------

_ONE_TOL = 1.00000000000001
_ATOL = 1e-50


def aasin(v):
    v = np.asarray(v, dtype=np.float64)
    clamped = np.clip(v, -1.0, 1.0)
    return np.arcsin(clamped)


def aacos(v):
    v = np.asarray(v, dtype=np.float64)
    clamped = np.clip(v, -1.0, 1.0)
    return np.arccos(clamped)


def asqrt(v):
    v = np.asarray(v, dtype=np.float64)
    return np.sqrt(np.maximum(v, 0.0))


def aatan2(n, d):
    n = np.asarray(n, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    out = np.arctan2(n, d)
    return np.where((np.abs(n) < _ATOL) & (np.abs(d) < _ATOL), 0.0, out)


# ---------------------------------------------------------------------------
# Clenshaw summations for the Poder/Engsager transverse Mercator
# (reference src/projections/tmerc.cpp:263-325)
# ---------------------------------------------------------------------------


def gatg(p: np.ndarray, B, cos_2B, sin_2B):
    """Gauss <-> geographic latitude trig-series via Clenshaw."""
    two_cos_2B = 2 * cos_2B
    h1 = p[-1]
    h2 = 0.0
    h = h1
    for c in p[-2::-1]:
        h = -h2 + two_cos_2B * h1 + c
        h2 = h1
        h1 = h
    return B + h * sin_2B


def clens(a: np.ndarray, arg_r):
    """Real Clenshaw summation sum(a[k] sin((2k+2) arg))-style (tmerc)."""
    cos_arg_r = np.cos(arg_r)
    r = 2 * cos_arg_r
    hr1 = 0.0
    hr = a[-1]
    for c in a[-2::-1]:
        hr2 = hr1
        hr1 = hr
        hr = -hr2 + r * hr1 + c
    return np.sin(arg_r) * hr


def clenS(a: np.ndarray, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i):
    """Complex Clenshaw summation; returns (R, I)."""
    r = 2 * cos_arg_r * cosh_arg_i
    i = -2 * sin_arg_r * sinh_arg_i
    hi1 = 0.0
    hr1 = 0.0
    hi = 0.0
    hr = a[-1]
    for c in a[-2::-1]:
        hr2 = hr1
        hi2 = hi1
        hr1 = hr
        hi1 = hi
        hr = -hr2 + r * hr1 - i * hi1 + c
        hi = -hi2 + i * hr1 + r * hi1
    r = sin_arg_r * cosh_arg_i
    i = cos_arg_r * sinh_arg_i
    R = r * hr - i * hi
    I = r * hi + i * hr
    return R, I


def mdist_ini(es: float):
    """Coefficients for the evaluation of the geodesic meridional distance
    (reference src/proj_mdist.cpp:18-63, proj_mdist_ini)."""
    MAX_ITER = 20
    E = [1.0]
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    Es = 1.0
    El = 1.0
    i = 1
    while i < MAX_ITER:
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        i += 1
        if Es == El:
            break
        El = Es
    nb = i - 1
    b = np.zeros(i)
    b[0] = run = 1.0 - Es
    numf = denf = 1.0
    numfi, denfi = 2.0, 3.0
    for j in range(1, i):
        run -= E[j]
        numf *= numfi
        denf *= denfi
        b[j] = run * numf / denf
        numfi += 2.0
        denfi += 2.0
    return {"nb": nb, "es": es, "E": Es, "b": b}


def mdist(phi, sphi, cphi, md):
    """Geodesic meridional distance (proj_mdist.cpp:64-77)."""
    b = md["b"]
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * md["E"] - md["es"] * sc / np.sqrt(1.0 - md["es"] * sphi2)
    s = b[md["nb"]]
    for j in range(md["nb"] - 1, -1, -1):
        s = b[j] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, md):
    """Inverse geodesic meridional distance via Newton iteration
    (proj_mdist.cpp:78-97).  Returns (phi, converged_mask)."""
    k = 1.0 / (1.0 - md["es"])
    phi = np.array(dist, dtype=np.float64, copy=True)
    done = np.zeros(np.shape(phi), dtype=bool)
    for _ in range(20):
        s = np.sin(phi)
        t = 1.0 - md["es"] * s * s
        step = (mdist(phi, s, np.cos(phi), md) - dist) * (t * np.sqrt(t)) * k
        phi = np.where(done, phi, phi - step)
        done = done | (np.abs(step) < 1e-14)
        if done.all():
            break
    return phi, done


def zpoly1d(z, C):
    """f(z) = z * sum C[i] z^i and df/dz, complex Horner
    (reference src/zpoly1.cpp pj_zpoly1/pj_zpolyd1)."""
    p = np.full_like(z, C[-1])
    dp = np.zeros_like(z)
    for coef in C[-2::-1]:
        dp = p + z * dp
        p = coef + z * p
    return z * p, p + z * dp
