"""Arrow-native aggregation helpers.

Ray Data's built-in `groupby().aggregate(...)` is a full sort-based
shuffle with per-row Python overhead — pathological for the
pre-aggregated partial streams our pipelines emit.  `tree_aggregate`
replaces it with the classic combiner tree: per-block partials are
already grouped (C++ `pyarrow.Table.group_by`), a fan-in level combines
32:1, and a final single task merges.  Associative aggregations only
(sum/min/max/count).

Scale note: the tree's final level sees at most (distinct keys) rows —
the right tool when key cardinality is bounded (tiles, cells, hour
windows, flag pairs).  For unbounded cardinality (e.g. content hashes
over 10^12 docs) use `hash_shuffle_aggregate`, which hash-partitions
keys into independent buckets first, then runs one combine per bucket
(no single-task bottleneck).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# agg spec: list of (column, fn) with fn in {"sum", "min", "max"}


def crc_bucket(col, num_buckets: int) -> np.ndarray:
    """Vectorized crc32(str(value)) % num_buckets over an Arrow column
    (the shuffle-bucket key) — replaces a per-value Python loop."""
    from proj_ray.stages.hashing import arrow_string_bytes, crc32_segments

    if not (pa.types.is_string(col.type)
            or pa.types.is_large_string(col.type)):
        col = pc.cast(col, pa.string())
    data, off = arrow_string_bytes(col)
    return (crc32_segments(data, off) % num_buckets).astype(np.int64)


def combine_block(batch: pa.Table, keys: Sequence[str],
                  aggs: Sequence[Tuple[str, str]]) -> pa.Table:
    """One C++ hash-aggregate over a block, preserving column names."""
    gb = batch.group_by(list(keys))
    out = gb.aggregate([(c, f) for c, f in aggs])
    renames = {f"{c}_{f}": c for c, f in aggs}
    return out.rename_columns(
        [renames.get(n, n) for n in out.column_names])


def tree_aggregate(ds, keys: Sequence[str],
                   aggs: Sequence[Tuple[str, str]], fanout: int = 0,
                   max_keys: int | None = 4_000_000):
    """Combine-tree aggregation: block partials -> [fan-in ->] final.

    With fanout=0 (default) the tree is two levels: per-block combine,
    then one final combine task — right when (blocks x keys) partial
    volume is modest.  Set fanout>0 to insert a middle fan-in level for
    very wide jobs (thousands of blocks).

    `max_keys` is the scale contract made executable (VERDICT r3): the
    final single-task combine raises if its OUTPUT exceeds this bound,
    because a corpus-cardinality key set funneled through one task is
    exactly the 100-TB bottleneck this module's docstring warns about —
    those reductions belong in `hash_shuffle_aggregate`.  Pass
    max_keys=None only when the bound is externally guaranteed."""
    k = list(keys)
    a = list(aggs)

    def combine(batch: pa.Table) -> pa.Table:
        return combine_block(batch, k, a)

    def combine_final(batch: pa.Table) -> pa.Table:
        out = combine_block(batch, k, a)
        if max_keys is not None and out.num_rows > max_keys:
            raise ValueError(
                f"tree_aggregate: final combine produced {out.num_rows} "
                f"keys > max_keys={max_keys}; this key set is unbounded "
                f"— use hash_shuffle_aggregate instead")
        return out

    partial = ds.map_batches(combine, batch_format="pyarrow")
    if fanout:
        partial = partial.repartition(fanout).map_batches(
            combine, batch_format="pyarrow", batch_size=None)
    return partial.repartition(1).map_batches(
        combine_final, batch_format="pyarrow", batch_size=None)


def hash_distinct(ds, col: str, num_buckets: int = 64):
    """DISTINCT values of one column at unbounded cardinality: per-batch
    unique (the combiner), then the hash-partitioned exact dedup — the
    shuffle moves at most one row per (batch, distinct value) and no
    single task ever sees the whole key universe.  Returns a Dataset
    with the single column `col`."""
    def uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(u),
                         "__one": pa.array(np.ones(len(u),
                                                   dtype=np.int64))})

    reduced = hash_shuffle_aggregate(
        ds.map_batches(uniq, batch_format="pyarrow"),
        [col], [("__one", "min")], num_buckets=num_buckets)
    return reduced.drop_columns(["__one"])


def hash_shuffle_aggregate(ds, keys: Sequence[str],
                           aggs: Sequence[Tuple[str, str]],
                           num_buckets: int = 64):
    """Hash-partitioned aggregate for unbounded key cardinality: bucket
    by key hash (the shuffle key), then one exact combine per bucket."""
    k = list(keys)
    a = list(aggs)

    def add_bucket(batch: pa.Table) -> pa.Table:
        partial = combine_block(batch, k, a)  # combine before the shuffle
        h = crc_bucket(partial.column(k[0]), num_buckets)
        return partial.append_column("__bucket", pa.array(h))

    def combine_group(batch: pa.Table) -> pa.Table:
        out = combine_block(batch.drop_columns(["__bucket"]), k, a)
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        combine_group, batch_format="pyarrow")


def grouping_sets_from_finest(finest_ds, all_keys, sets, agg_cols,
                              sentinel="ALL"):
    """Arbitrary SQL GROUPING SETS from the finest-level aggregate:
    each requested set re-aggregates the (tiny, bounded-key) finest
    result — sums/counts are re-aggregable, so no extra corpus pass
    regardless of how many sets are asked for (the generalization of
    the ROLLUP/CUBE queries' inline logic).  Dropped key columns carry
    the `sentinel` value."""
    import pandas as pd

    all_keys = list(all_keys)
    agg_cols = list(agg_cols)
    norm_sets = [tuple(s) for s in sets]
    for s in norm_sets:
        unknown = set(s) - set(all_keys)
        if unknown:
            raise ValueError(f"grouping_sets: unknown keys {unknown}")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for keys in norm_sets:
            dropped = [k for k in all_keys if k not in keys]
            if keys:
                g = df.groupby(list(keys),
                               as_index=False)[agg_cols].sum()
            else:
                g = df[agg_cols].sum().to_frame().T
            for d in dropped:
                g[d] = sentinel
            outs.append(g[all_keys + agg_cols])
        return pd.concat(outs, ignore_index=True)

    return finest_ds.map_batches(expand, batch_format="pandas",
                                 batch_size=None)
