"""Coordinate batch model.

The reference's fundamental datum is a 4-double union processed one point
at a time (``PJ_COORD``, reference src/proj.h:315-330).  Here the
fundamental datum is a *batch*: four float64 NumPy arrays (zero-copy views
of Arrow columns) plus an int32 error-code array.  Errors are signalled
in-band: failing rows get NaN coordinates and a nonzero error code
(mirroring HUGE_VAL + errno, reference src/internal.cpp:65,
src/fwd.cpp:176-183); they never raise inside kernels.
"""

from __future__ import annotations

import numpy as np

# Error codes (values mirror the reference's PROJ_ERR_* families loosely;
# only distinctness matters for our tests)
ERR_NONE = 0
ERR_INVALID_COORD = 2049  # PROJ_ERR_COORD_TRANSFM_INVALID_COORD
ERR_OUTSIDE_DOMAIN = 2050  # PROJ_ERR_COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN
ERR_NO_INVERSE = 1  # operation has no inverse
ERR_NO_CONVERGENCE = 2051


class Coords:
    """A mutable batch of 4-D coordinates.

    Axis meaning depends on the operation's declared I/O units, exactly as
    in the reference: (lam, phi, z, t) radians for angular I/O,
    (x, y, z, t) for linear/cartesian I/O.
    """

    __slots__ = ("x", "y", "z", "t", "err")

    def __init__(self, x, y, z=None, t=None, err=None):
        self.x = np.ascontiguousarray(x, dtype=np.float64)
        self.y = np.ascontiguousarray(y, dtype=np.float64)
        n = len(self.x)
        self.z = (
            np.zeros(n) if z is None else np.ascontiguousarray(z, dtype=np.float64)
        )
        self.t = (
            np.zeros(n) if t is None else np.ascontiguousarray(t, dtype=np.float64)
        )
        self.err = (
            np.zeros(n, dtype=np.int32)
            if err is None
            else np.ascontiguousarray(err, dtype=np.int32)
        )

    def __len__(self) -> int:
        return len(self.x)

    def copy(self) -> "Coords":
        return Coords(
            self.x.copy(), self.y.copy(), self.z.copy(), self.t.copy(), self.err.copy()
        )

    def set_error(self, mask, code: int) -> None:
        """Mark rows as failed: record the code, poison the coordinates."""
        if mask is None or not np.any(mask):
            return
        new = mask & (self.err == ERR_NONE)
        self.err[new] = code
        self.x[mask] = np.nan
        self.y[mask] = np.nan
        self.z[mask] = np.nan

    def ok(self) -> np.ndarray:
        return self.err == ERR_NONE
