"""Size-derived shuffle partition counts.

Round-3 verdict finding #4: fixed `num_partitions=32` defaults on the
hash-partitioned operators cap usable parallelism AND per-task memory
at corpus/32 regardless of input size — each hash partition is one
task holding its whole slice.  This helper derives the count from the
input's byte size instead: one partition per `target_bytes` of input,
floored at the cluster's CPU count (so small inputs still use every
core) and capped only at a generous task-count bound (tasks queue —
more partitions than cores is fine and is exactly what 100 TB needs).

Lazy Datasets whose size Ray cannot know yet (post-map_batches) fall
back to `default`, so callers should pass the UPSTREAM dataset (the
parquet read, whose metadata carries sizes) when they can.
"""

from __future__ import annotations

import math

# One hash-partition task per this much input: big enough to amortize
# task overhead, small enough that a partition (plus its group-by
# working set) fits a worker heap comfortably.
TARGET_PARTITION_BYTES = 256 << 20

# Runaway backstop, far above any sane single-job fan-out.
MAX_PARTITIONS = 65536


def _cluster_cpus(default: int = 4) -> int:
    import ray

    try:
        return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        return default


def _safe_size_bytes(ds) -> int | None:
    """`Dataset.size_bytes()` EXECUTES lazy plans (measured: a bare
    map_batches runs end-to-end when asked its size), so only ask when
    the answer is metadata-free: a materialized dataset, or a plan
    that is still a pure read (parquet footer sizes)."""
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return ds.size_bytes()
    except Exception:
        pass
    try:
        from ray.data._internal.logical.operators.read_operator import \
            Read

        if isinstance(ds._plan._logical_plan.dag, Read):
            return ds.size_bytes()
    except Exception:
        pass
    return None


def dataset_size_bytes(*datasets) -> int | None:
    """Total known byte size of the given Datasets, or None when no
    execution-free estimate exists for any of them."""
    total = 0
    known = False
    for ds in datasets:
        if ds is None:
            continue
        sz = _safe_size_bytes(ds)
        if sz:
            total += int(sz)
            known = True
    return total if known else None


def derive_num_partitions(*datasets, size_bytes: int | None = None,
                          target_bytes: int = TARGET_PARTITION_BYTES,
                          default: int = 32,
                          cap: int = MAX_PARTITIONS) -> int:
    """clamp(size/target, cpus, cap) — scales UP with input size.

    `datasets` are inspected for known sizes when `size_bytes` is not
    given; unknown sizes fall back to max(default, cpus) so today's
    behavior is preserved for fully lazy inputs.
    """
    cpus = _cluster_cpus()
    floor = min(max(2, cpus), default) if default else max(2, cpus)
    if size_bytes is None:
        size_bytes = dataset_size_bytes(*datasets)
    if not size_bytes:
        return max(default, floor)
    derived = math.ceil(size_bytes / max(1, target_bytes))
    return int(min(cap, max(default, floor, derived)))
