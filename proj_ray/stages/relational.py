"""Relational equi-joins, Ray-Data-shaped.

broadcast_join: the small side is materialized ONCE into the object
store (`ray.put`) and every map task resolves its batch against the
per-worker cached copy with a vectorized searchsorted — the join never
shuffles the big side.  This is the right shape whenever one side fits
a worker's heap (dimension tables, lookup maps): at 100 TB the fact
stream flows through unmoved while nation/region/config tables ride
along as a few KB of plasma.

For large-large equi-joins use the key-partitioned pattern
(`asof.asof_join` without the time axis, or Dataset.join); this module
deliberately covers only the broadcast case, which dominates real
pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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
