"""Axis order / sign conversion (reference src/conversions/axisswap.cpp).

+order=2,1 style index lists with optional '-' signs, or the classic
+axis=enu specification.  Prepare/finalize are skipped (axisswap exists
to bring raw coordinates into the internal ENU order).
"""

from __future__ import annotations

from proj_ray.core.coords import Coords
from proj_ray.ops.base import (
    RADIANS,
    WHATEVER,
    Operation,
    Params,
    ProjError,
    register,
)


@register
class AxisSwap(Operation):
    name = "axisswap"
    skip_prepare = True
    skip_finalize = True

    def setup(self, params: Params) -> None:
        has_order = params.has("order")
        has_axis = params.has("axis")
        if has_order == has_axis:
            raise ProjError("must provide EITHER 'order' OR 'axis'")
        axis = [4, 5, 6, 7]
        sign = [1, 1, 1, 1]
        if has_order:
            order = params.s("order")
            parts = order.split(",")
            if len(parts) > 4:
                raise ProjError("invalid order")
            n = 0
            for p in parts:
                p = p.strip()
                v = int(p)
                a = abs(v) - 1
                if a > 3:
                    raise ProjError(f"invalid axis {a}")
                axis[n] = a
                sign[n] = 1 if v > 0 else -1
                n += 1
        else:
            spec = params.s("axis")
            mapping = {"w": (0, -1), "e": (0, 1), "s": (1, -1),
                       "n": (1, 1), "d": (2, -1), "u": (2, 1)}
            for i, ch in enumerate(spec[:3]):
                if ch not in mapping:
                    raise ProjError(f"unknown axis {ch!r}")
                axis[i], sign[i] = mapping[ch]
            n = 3
        # duplicate check
        seen = [a for a in axis[:n]]
        if len(set(seen)) != len(seen):
            raise ProjError("duplicate axes specified")
        self.n = n
        self.ax = axis[:n]
        self.sg = sign[:n]
        if params.b("angularunits"):
            self.left = RADIANS
            self.right = RADIANS
        else:
            self.left = WHATEVER
            self.right = WHATEVER
        # neutralize framework axis handling (we ARE the axis op)
        self.axis = "enu"

    def _fwd(self, c: Coords) -> None:
        comps = [c.x, c.y, c.z, c.t]
        out = list(comps)
        for i in range(self.n):
            out[i] = comps[self.ax[i]] * self.sg[i]
        c.x, c.y, c.z, c.t = out

    def _inv(self, c: Coords) -> None:
        comps = [c.x, c.y, c.z, c.t]
        out = list(comps)
        for i in range(self.n):
            out[self.ax[i]] = comps[i] * self.sg[i]
        c.x, c.y, c.z, c.t = out
