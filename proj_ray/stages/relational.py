"""Relational equi-joins, Ray-Data-shaped.

broadcast_join: the small side is materialized ONCE into the object
store (`ray.put`) and every map task resolves its batch against the
per-worker cached copy with a vectorized searchsorted — the join never
shuffles the big side.  This is the right shape whenever one side fits
a worker's heap (dimension tables, lookup maps): at 100 TB the fact
stream flows through unmoved while nation/region/config tables ride
along as a few KB of plasma.

shuffle_join: the large-large case — both sides hash-partition on the
key (Ray's Dataset.join → per-partition Acero hash join).  This is an
all-to-all exchange of both inputs, so use it only when neither side
fits a worker (fact ⋈ fact); the partition count is sized to the
cluster because every partition pins an aggregator actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _join_partitions(cap: int = 16) -> int:
    """Each hash-join partition pins an aggregator actor: more
    partitions than cores deadlocks small clusters, too few
    under-parallelizes large ones."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus // 2))


def shuffle_join(left_ds, right_ds, on: str, right_on: str | None = None,
                 how: str = "inner", num_partitions: int | None = None):
    """Key-partitioned equi-join of two large Datasets.

    Both sides shuffle; rows co-locate by key hash and each partition
    joins locally.  At 100 TB this is the expensive path — prefer
    `broadcast_join` whenever one side is bounded.
    """
    nparts = num_partitions or _join_partitions()
    return left_ds.join(right_ds, join_type=how,
                        num_partitions=nparts,
                        on=(on,),
                        right_on=(right_on or on,))


def broadcast_join(big_ds, small_tbl: pa.Table, key: str,
                   right_key: str | None = None, how: str = "inner"):
    """Join a Dataset against a driver-resident small table on integer
    keys.  `how` is "inner" or "left" (left keeps unmatched big rows
    with nulls).  Small-side payload column names must not collide."""
    import ray

    right_key = right_key or key
    payload = [c for c in small_tbl.column_names if c != right_key]
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: unsupported how={how!r}")

    keys_np = small_tbl.column(right_key).to_numpy(zero_copy_only=False)
    order = np.argsort(keys_np)
    sorted_small = small_tbl.take(pa.array(order)).combine_chunks()
    small_ref = ray.put(sorted_small)

    def join_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from proj_ray.stages.worker_cache import get_broadcast

        small = get_broadcast(small_ref)
        sk = small.column(right_key).to_numpy(zero_copy_only=False)
        bk = t.column(key).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, bk)
        pos_c = np.minimum(pos, max(len(sk) - 1, 0))
        hit = (len(sk) > 0) & (sk[pos_c] == bk)
        cols = {c: t.column(c) for c in t.column_names}
        if how == "inner":
            mask = pa.array(hit)
            t2 = t.filter(mask)
            idx = pa.array(pos_c[hit])
            cols = {c: t2.column(c) for c in t2.column_names}
            for c in payload:
                cols[c] = pc.take(small.column(c), idx)
            return pa.table(cols)
        take = pa.array(np.where(hit, pos_c, 0).astype(np.int64),
                        type=pa.int64(), mask=~hit)
        for c in payload:
            cols[c] = pc.take(small.column(c), take)
        return pa.table(cols)

    return big_ds.map_batches(join_batch, batch_format="pyarrow")
