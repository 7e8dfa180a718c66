"""Per-worker object cache for broadcast side inputs.

An actor pool guarantees once-per-actor setup but pays process spin-up
on EVERY query (1-2 s for a pool of two).  For side inputs that are
plain broadcast objects (query matrices, spatial indexes), a TASK pool
plus this cache gives the same once-per-worker fetch: Ray reuses worker
processes, `ray.get` of a shared ObjectRef is a zero-copy plasma read,
and the module-level dict keeps the deserialized object alive across
tasks in the same worker.  Entries are keyed by ObjectRef hex (stable
for the lifetime of the ref) and capped to avoid unbounded growth."""

from __future__ import annotations

_CACHE: dict = {}
_MAX_ENTRIES = 32


def get_broadcast(ref):
    """Deserialized value of an ObjectRef, cached per worker process."""
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _CACHE:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.clear()
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
