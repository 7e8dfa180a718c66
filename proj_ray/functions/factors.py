"""Cartographic distortion factors — vectorized port of the
reference's pj_factors / pj_deriv (src/factors.cpp:15-114,
src/deriv.cpp:8-70).

Numerical central differences of the RAW projection kernel
(dimensionless plane coordinates in units of the semimajor axis) give
the partial derivatives; from them the meridian/parallel scales (h, k),
meridian convergence, areal scale, Tissot axes and maximum angular
distortion, with the es-dependent corrections of factors.cpp:80-90.
"""

from __future__ import annotations

from typing import Dict, Union

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import CLASSIC, RADIANS, ProjError
from proj_ray.pipeline import create_operation

DEFAULT_H = 1e-5  # radians (factors.cpp:10)


def _kernel_op(defn_or_pipeline):
    p = create_operation(defn_or_pipeline) \
        if isinstance(defn_or_pipeline, str) else defn_or_pipeline
    steps = getattr(p, "steps", None)
    if steps is None or len(steps) != 1:
        raise ProjError("factors: a single projection step is required")
    op = steps[0].op
    if op.left != RADIANS or op.right not in (CLASSIC,):
        raise ProjError("factors: operation is not an angular->plane "
                        "projection")
    return op


def factors(defn_or_pipeline, lon_deg, lat_deg,
            h: float = 0.0) -> Dict[str, np.ndarray]:
    """Distortion factors at each (lon, lat) in degrees.

    Returns dict of arrays: meridional_scale (h), parallel_scale (k),
    areal_scale (s), angular_distortion (omega), meridian_parallel_angle
    (thetap), meridian_convergence (conv), tissot_semimajor (a),
    tissot_semiminor (b), dx_dlam, dx_dphi, dy_dlam, dy_dphi.
    """
    op = _kernel_op(defn_or_pipeline)
    h = abs(h) or DEFAULT_H
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    bad = (np.abs(phi) - m.M_HALFPI) > 1e-12
    bad |= np.abs(lam) > 10.0
    # keep the stencil inside the pole (factors.cpp:61-63)
    phi = np.where(np.abs(phi) > m.M_HALFPI - h,
                   np.sign(phi) * (m.M_HALFPI - h), phi)
    lam = m.adjlon(lam - op.lam0)

    def ev(dl, dp):
        c = Coords(lam + dl, phi + dp)
        with np.errstate(all="ignore"):
            op._fwd(c)
        return c.x, c.y

    # pj_deriv 4-corner stencil (deriv.cpp:15-67)
    x1, y1 = ev(+h, +h)
    x2, y2 = ev(+h, -h)
    x3, y3 = ev(-h, -h)
    x4, y4 = ev(-h, +h)
    four_h = 4.0 * h
    x_l = (x1 + x2 - x3 - x4) / four_h
    y_p = (y1 - y2 - y3 + y4) / four_h
    x_p = (x1 - x2 - x3 + x4) / four_h
    y_l = (y1 + y2 - y3 - y4) / four_h
    bad |= ~(np.isfinite(x_l) & np.isfinite(y_p)
             & np.isfinite(x_p) & np.isfinite(y_l))

    cosphi = np.cos(phi)
    fh = np.hypot(x_p, y_p)
    fk = np.hypot(x_l, y_l) / cosphi
    if op.es != 0.0:
        t = np.sin(phi)
        t = 1.0 - op.es * t * t
        n = np.sqrt(t)
        fh = fh * (t * n / op.one_es)
        fk = fk * n
        r = t * t / op.one_es
    else:
        r = 1.0
    conv = -np.arctan2(x_p, y_p)
    s = (y_p * x_l - x_p * y_l) * r / cosphi
    with np.errstate(all="ignore"):
        thetap = np.arcsin(np.clip(s / (fh * fk), -1, 1))
        t = fk * fk + fh * fh
        a = np.sqrt(np.maximum(t + 2.0 * s, 0.0))
        t2 = t - 2.0 * s
        t2 = np.where(t2 > 0, np.sqrt(np.maximum(t2, 0.0)), 0.0)
        b = 0.5 * (a - t2)
        a = 0.5 * (a + t2)
        omega = 2.0 * np.arcsin(np.clip((a - b) / (a + b), -1, 1))
    nanify = lambda v: np.where(bad, np.nan, v)
    return {
        "meridional_scale": nanify(fh),
        "parallel_scale": nanify(fk),
        "areal_scale": nanify(s),
        "angular_distortion": nanify(omega),
        "meridian_parallel_angle": nanify(thetap),
        "meridian_convergence": nanify(conv),
        "tissot_semimajor": nanify(a),
        "tissot_semiminor": nanify(b),
        "dx_dlam": nanify(x_l),
        "dx_dphi": nanify(x_p),
        "dy_dlam": nanify(y_l),
        "dy_dphi": nanify(y_p),
    }
