"""Horner polynomial transformation (real 2D and complex), the Danish
KMS/Engsager-Poder style (reference src/transformations/horner.cpp).

Forward/inverse coefficient sets with false origins and a validity
range; when no inverse coefficients are given, the inverse is the
reference's Jacobian fixed-point iteration (horner.cpp:225-276 real,
:327-365 complex) vectorized with convergence masks.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core.coords import Coords, ERR_NO_CONVERGENCE, \
    ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import WHATEVER, Operation, Params, ProjError, register


def n_real(order: int) -> int:
    return (order + 1) * (order + 2) // 2


def n_complex(order: int) -> int:
    return 2 * order + 2


def real_horner_eval(order, cx, cy, e, n, order_offset=0):
    """Double real Horner evaluation (horner.cpp:112-140), vectorized.

    Returns (E, N)."""
    sz = n_real(order)
    ix = sz
    iy = sz
    iy -= 1
    N = np.full_like(np.asarray(e, dtype=np.float64), cy[iy])
    ix -= 1
    E = np.full_like(N, cx[ix])
    for r in range(order, order_offset, -1):
        iy -= 1
        u = np.full_like(N, cy[iy])
        ix -= 1
        v = np.full_like(N, cx[ix])
        for ccol in range(order, r - 1, -1):
            iy -= 1
            u = n * u + cy[iy]
            ix -= 1
            v = e * v + cx[ix]
        N = e * N + u
        E = n * E + v
    return E, N


def single_horner_eval(order, cx, x, order_offset=0):
    i = order + 1
    i -= 1
    u = np.full_like(np.asarray(x, dtype=np.float64), cx[i])
    for r in range(order, order_offset, -1):
        i -= 1
        u = x * u + cx[i]
    return u


def complex_horner_eval(order, c, e, n, order_offset=0):
    sz = n_complex(order)
    i = sz
    i -= 1
    E = np.full_like(np.asarray(e, dtype=np.float64), c[i])
    i -= 1
    N = np.full_like(E, c[i])
    stop = order_offset * 2
    while i > stop:
        i -= 1
        w = n * E + e * N + c[i]
        i -= 1
        N = n * N - e * E + c[i]
        E = w
    return E, N


@register
class Horner(Operation):
    name = "horner"

    def setup(self, params: Params) -> None:
        self.left = WHATEVER
        self.right = WHATEVER
        if not params.has("deg"):
            raise ProjError("horner: must specify polynomial degree (+deg=n)")
        self.order = params.i("deg")
        if self.order < 0 or self.order > 10000:
            raise ProjError("horner: unreasonable degree")
        self.complex_poly = params.has("fwd_c") or params.has("inv_c")

        def coefs(key, n):
            s = params.s(key)
            if s is None:
                return None
            vals = np.array([float(v) for v in s.split(",")[:n]])
            if len(vals) != n:
                raise ProjError(f"horner: need {n} coefs for {key}")
            return vals

        if self.complex_poly:
            n = n_complex(self.order)
            self.fwd_c = coefs("fwd_c", n)
            if self.fwd_c is None:
                raise ProjError("horner: missing fwd_c")
            self.inv_c = coefs("inv_c", n)
            self.has_inv_coefs = self.inv_c is not None \
                or params.has("inv_origin")
            self.uneg = params.has("uneg")
            self.vneg = params.has("vneg")
        else:
            n = n_real(self.order)
            self.fwd_u = coefs("fwd_u", n)
            self.fwd_v = coefs("fwd_v", n)
            if self.fwd_u is None or self.fwd_v is None:
                raise ProjError("horner: missing fwd_u/fwd_v")
            self.inv_u = coefs("inv_u", n)
            self.inv_v = coefs("inv_v", n)
            self.has_inv_coefs = (self.inv_u is not None
                                  or self.inv_v is not None
                                  or params.has("inv_origin"))
        fo = coefs("fwd_origin", 2)
        if fo is None:
            raise ProjError("horner: missing fwd_origin")
        self.fwd_origin = fo
        io = coefs("inv_origin", 2)
        if self.has_inv_coefs and io is None:
            raise ProjError("horner: missing inv_origin")
        self.inv_origin = io
        r = coefs("range", 1)
        self.range = float(r[0]) if r is not None else 500000.0
        t = coefs("inv_tolerance", 1)
        self.inv_tol = float(t[0]) if t is not None else 0.001

    def _range_check(self, c, e, n):
        bad = (np.abs(n) > self.range) | (np.abs(e) > self.range)
        c.set_error(bad, ERR_OUTSIDE_DOMAIN)
        return bad

    def _fwd(self, c: Coords) -> None:
        e = c.x - self.fwd_origin[0]
        n = c.y - self.fwd_origin[1]
        if self.complex_poly:
            if self.uneg:
                e = -e
            if self.vneg:
                n = -n
        bad = self._range_check(c, e, n)
        if self.complex_poly:
            E, N = complex_horner_eval(self.order, self.fwd_c, e, n)
        else:
            E, N = real_horner_eval(self.order, self.fwd_u, self.fwd_v, e, n)
        c.x = np.where(bad, np.nan, E)
        c.y = np.where(bad, np.nan, N)

    def _inv(self, c: Coords) -> None:
        if self.has_inv_coefs:
            e = c.x - self.inv_origin[0]
            n = c.y - self.inv_origin[1]
            if self.complex_poly:
                if self.uneg:
                    e = -e
                if self.vneg:
                    n = -n
            bad = self._range_check(c, e, n)
            if self.complex_poly:
                E, N = complex_horner_eval(self.order, self.inv_c, e, n)
            else:
                E, N = real_horner_eval(self.order, self.inv_u, self.inv_v,
                                        e, n)
            c.x = np.where(bad, np.nan, E)
            c.y = np.where(bad, np.nan, N)
            return
        # iterative inverse from forward coefficients
        e = c.x
        n = c.y
        bad = self._range_check(c, e, n)
        if self.complex_poly:
            dZr = n - self.fwd_c[0]
            dZi = e - self.fwd_c[1]
            w0r = np.zeros_like(e)
            w0i = np.zeros_like(e)
            conv = np.zeros_like(e, dtype=bool)
            for _ in range(32):
                E1, N1 = complex_horner_eval(self.order, self.fwd_c,
                                             w0i, w0r, 1)
                detr, deti = N1, E1
                denom = detr * detr + deti * deti
                with np.errstate(all="ignore"):
                    w1r = (dZr * detr + dZi * deti) / denom
                    w1i = (dZi * detr - dZr * deti) / denom
                newconv = (np.abs(w1r - w0r) < self.inv_tol) \
                    & (np.abs(w1i - w0i) < self.inv_tol)
                w0r = np.where(conv, w0r, w1r)
                w0i = np.where(conv, w0i, w1i)
                conv |= newconv
                if np.all(conv | bad):
                    break
            E = -w0i if self.uneg else w0i
            N = -w0r if self.vneg else w0r
            bad2 = ~conv
            c.set_error(bad2, ERR_NO_CONVERGENCE)
            bad = bad | bad2
            c.x = np.where(bad, np.nan, E + self.fwd_origin[0])
            c.y = np.where(bad, np.nan, N + self.fwd_origin[1])
        else:
            de = e - self.fwd_u[0]
            dn = n - self.fwd_v[0]
            x0 = np.zeros_like(e)
            y0 = np.zeros_like(e)
            conv = np.zeros_like(e, dtype=bool)
            for _ in range(32):
                Mb, Mc = real_horner_eval(self.order, self.fwd_u,
                                          self.fwd_v, x0, y0, 1)
                Ma = single_horner_eval(self.order, self.fwd_u, x0, 1)
                Md = single_horner_eval(self.order, self.fwd_v, y0, 1)
                with np.errstate(all="ignore"):
                    idet = 1.0 / (Ma * Md - Mb * Mc)
                    x = idet * (Md * de - Mb * dn)
                    y = idet * (Ma * dn - Mc * de)
                newconv = (np.abs(x - x0) < self.inv_tol) \
                    & (np.abs(y - y0) < self.inv_tol)
                x0 = np.where(conv, x0, x)
                y0 = np.where(conv, y0, y)
                conv |= newconv
                if np.all(conv | bad):
                    break
            bad2 = ~conv
            c.set_error(bad2, ERR_NO_CONVERGENCE)
            bad = bad | bad2
            c.x = np.where(bad, np.nan, x0 + self.fwd_origin[0])
            c.y = np.where(bad, np.nan, y0 + self.fwd_origin[1])
