"""push / pop: save/restore coordinate components on the pipeline stack
(reference src/pipeline.cpp:640-724).

The stacks live per pipeline *invocation* here (the reference keeps them
on the pipeline object; per-invocation is equivalent for well-formed
pipelines and makes batches trivially thread-safe).  In the vectorized
engine each stack slot holds a whole column.
"""

from __future__ import annotations

from proj_ray.core.coords import Coords
from proj_ray.ops.base import WHATEVER, Operation, Params, register


class _PushPopBase(Operation):
    def setup(self, params: Params) -> None:
        self.left = WHATEVER
        self.right = WHATEVER
        self.slots = [params.has(f"v_{i}") for i in (1, 2, 3, 4)]

    # the pipeline driver calls these with its stack
    def do_push(self, c: Coords, stack) -> None:
        comps = (c.x, c.y, c.z, c.t)
        for i, on in enumerate(self.slots):
            if on:
                stack[i].append(comps[i].copy())

    def do_pop(self, c: Coords, stack) -> None:
        comps = [c.x, c.y, c.z, c.t]
        for i, on in enumerate(self.slots):
            if on and stack[i]:
                comps[i] = stack[i].pop()
        c.x, c.y, c.z, c.t = comps


@register
class Push(_PushPopBase):
    name = "push"
    fwd_is_push = True


@register
class Pop(_PushPopBase):
    name = "pop"
    fwd_is_push = False
