"""Helmert similarity transforms and Molodensky-Badekas
(reference src/transformations/helmert.cpp).

3/6-parameter translation, 7-parameter rotation+scale (position_vector /
coordinate_frame conventions, small-angle default with +exact opt-in,
helmert.cpp:275-317), 4/8-parameter planar (+theta), and the kinematic
14-parameter form where parameters propagate linearly in time
(helmert.cpp:102-160).  The reference memoizes the rotation matrix per
observation epoch; here the matrix elements are computed as vectorized
expressions over the whole epoch column in one pass.
"""

from __future__ import annotations

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords
from proj_ray.ops.base import (
    CARTESIAN,
    PROJECTED,
    Operation,
    Params,
    ProjError,
    register,
)

ARCSEC_TO_RAD = m.DEG_TO_RAD / 3600.0


def _rot_matrix(o, p, k, exact: bool, position_vector: bool):
    """Build the 9 rotation-matrix entries (scalars or arrays)."""
    if exact:
        cf, sf = np.cos(o), np.sin(o)
        ct, st = np.cos(p), np.sin(p)
        cp, sp = np.cos(k), np.sin(k)
        R00 = ct * cp
        R01 = cf * sp + sf * st * cp
        R02 = sf * sp - cf * st * cp
        R10 = -ct * sp
        R11 = cf * cp - sf * st * sp
        R12 = sf * cp + cf * st * sp
        R20 = st
        R21 = -sf * ct
        R22 = cf * ct
    else:
        one = np.ones_like(np.asarray(o, dtype=np.float64)) \
            if np.ndim(o) else 1.0
        R00, R01, R02 = one, k, -p
        R10, R11, R12 = -k, one, o
        R20, R21, R22 = p, -o, one
    if position_vector:
        R01, R10 = R10, R01
        R02, R20 = R20, R02
        R12, R21 = R21, R12
    return (R00, R01, R02, R10, R11, R12, R20, R21, R22)


@register
class Helmert(Operation):
    name = "helmert"
    _no_datum_helpers = True

    def setup(self, params: Params) -> None:
        self.left = CARTESIAN
        self.right = CARTESIAN
        self.x_0_, self.y_0_, self.z_0_ = (
            params.f("x"), params.f("y"), params.f("z"))
        self.o_0 = params.f("rx") * ARCSEC_TO_RAD
        self.p_0 = params.f("ry") * ARCSEC_TO_RAD
        self.k_0 = params.f("rz") * ARCSEC_TO_RAD
        self.exact = params.b("exact")
        if params.b("transpose"):
            raise ProjError("helmert: 'transpose' is no longer valid; "
                            "use convention=")
        self.fourparam = params.has("theta")
        self.theta_0 = params.f("theta") * ARCSEC_TO_RAD
        self.scale_0 = 1.0 if self.fourparam else 0.0
        if params.has("towgs84"):
            vals = [float(v) for v in params.s("towgs84").split(",")]
            vals += [0.0] * (7 - len(vals))
            self.x_0_, self.y_0_, self.z_0_ = vals[0], vals[1], vals[2]
            self.o_0 = vals[3] * ARCSEC_TO_RAD
            self.p_0 = vals[4] * ARCSEC_TO_RAD
            self.k_0 = vals[5] * ARCSEC_TO_RAD
            self.scale_0 = vals[6]
        if params.has("s"):
            self.scale_0 = params.f("s")
            if self.scale_0 <= -1.0e6:
                raise ProjError("helmert: invalid value for s")
            if self.fourparam and self.scale_0 == 0.0:
                raise ProjError("helmert: invalid value for s")
        # rates
        self.dx = params.f("dx")
        self.dy = params.f("dy")
        self.dz = params.f("dz")
        self.do_ = params.f("drx") * ARCSEC_TO_RAD
        self.dp = params.f("dry") * ARCSEC_TO_RAD
        self.dk = params.f("drz") * ARCSEC_TO_RAD
        self.dtheta = params.f("dtheta") * ARCSEC_TO_RAD
        self.ds = params.f("ds")
        self.t_epoch = params.f("t_epoch")
        self.no_rotation = (
            self.o_0 == 0 and self.p_0 == 0 and self.k_0 == 0
            and self.do_ == 0 and self.dp == 0 and self.dk == 0
        )
        if not self.no_rotation:
            conv = params.s("convention")
            if conv is None:
                raise ProjError("helmert: missing 'convention' argument")
            if conv == "position_vector":
                self.is_position_vector = True
            elif conv == "coordinate_frame":
                self.is_position_vector = False
            else:
                raise ProjError("helmert: invalid convention")
            if params.has("towgs84") and not self.is_position_vector:
                raise ProjError("helmert: towgs84 requires position_vector")
        else:
            self.is_position_vector = params.s("convention") == "position_vector"
        self.kinematic = any(
            v != 0.0
            for v in (self.dx, self.dy, self.dz, self.do_, self.dp,
                      self.dk, self.ds, self.dtheta)
        )
        if params.has("theta"):
            self.left = PROJECTED
            self.right = PROJECTED
        self.refp = np.zeros(3)
        if not self.kinematic:
            self.R = _rot_matrix(self.o_0, self.p_0, self.k_0, self.exact,
                                 self.is_position_vector)

    # -- per-epoch parameters ------------------------------------------
    def _params_at(self, t):
        """Return (tx,ty,tz,o,p,k,scale,theta) — arrays if kinematic."""
        if not self.kinematic:
            return (self.x_0_, self.y_0_, self.z_0_, self.o_0, self.p_0,
                    self.k_0, self.scale_0, self.theta_0)
        tt = np.where(np.isnan(t), self.t_epoch, t)
        dt = tt - self.t_epoch
        return (
            self.x_0_ + self.dx * dt,
            self.y_0_ + self.dy * dt,
            self.z_0_ + self.dz * dt,
            self.o_0 + self.do_ * dt,
            self.p_0 + self.dp * dt,
            self.k_0 + self.dk * dt,
            self.scale_0 + self.ds * dt,
            self.theta_0 + self.dtheta * dt,
        )

    def _fwd(self, c: Coords) -> None:
        tx, ty, tz, o, p, k, sc, theta = self._params_at(c.t)
        if self.fourparam:
            cr = np.cos(theta) * sc
            sr = np.sin(theta) * sc
            x = cr * c.x + sr * c.y + tx
            y = -sr * c.x + cr * c.y + ty
            c.x, c.y = x, y
            return
        if self.no_rotation and np.all(np.asarray(sc) == 0):
            c.x = c.x + tx
            c.y = c.y + ty
            c.z = c.z + tz
            return
        scale = 1 + np.asarray(sc) * 1e-6
        if self.kinematic:
            R = _rot_matrix(o, p, k, self.exact, self.is_position_vector)
        else:
            R = self.R
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = R
        X = c.x - self.refp[0]
        Y = c.y - self.refp[1]
        Z = c.z - self.refp[2]
        c.x = scale * (R00 * X + R01 * Y + R02 * Z) + tx
        c.y = scale * (R10 * X + R11 * Y + R12 * Z) + ty
        c.z = scale * (R20 * X + R21 * Y + R22 * Z) + tz

    def _inv(self, c: Coords) -> None:
        tx, ty, tz, o, p, k, sc, theta = self._params_at(c.t)
        if self.fourparam:
            cr = np.cos(theta) / sc
            sr = np.sin(theta) / sc
            x = c.x - tx
            y = c.y - ty
            c.x = x * cr - y * sr
            c.y = x * sr + y * cr
            return
        if self.no_rotation and np.all(np.asarray(sc) == 0):
            c.x = c.x - tx
            c.y = c.y - ty
            c.z = c.z - tz
            return
        scale = 1 + np.asarray(sc) * 1e-6
        if self.kinematic:
            R = _rot_matrix(o, p, k, self.exact, self.is_position_vector)
        else:
            R = self.R
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = R
        X = (c.x - tx) / scale
        Y = (c.y - ty) / scale
        Z = (c.z - tz) / scale
        c.x = (R00 * X + R10 * Y + R20 * Z) + self.refp[0]
        c.y = (R01 * X + R11 * Y + R21 * Z) + self.refp[1]
        c.z = (R02 * X + R12 * Y + R22 * Z) + self.refp[2]


@register
class MoloBadekas(Helmert):
    """Molodensky-Badekas: Helmert about a reference point px,py,pz
    (reference helmert.cpp:700-760)."""

    name = "molobadekas"

    def setup(self, params: Params) -> None:
        super().setup(params)
        refp = np.array([params.f("px"), params.f("py"), params.f("pz")])
        self.refp = refp
        # reference incorporates refp into the translation terms
        self.x_0_ += refp[0]
        self.y_0_ += refp[1]
        self.z_0_ += refp[2]
