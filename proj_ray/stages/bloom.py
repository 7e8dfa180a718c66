"""Bloom-filter join pruning.

The 100-TB semi-join lever: when the build side's distinct-key table
is too wide to broadcast exactly but a BITMAP of it fits (m bits ~
10 bits/key for ~1% false positives), build the filter in one pass
(per-block bitmap partials OR-reduced), broadcast it, and drop
non-matching probe rows BEFORE the exact join shuffle.  No false
negatives, so the downstream exact join keeps the answer exact — the
bloom only shrinks what the shuffle moves (by the probe's
non-matching fraction).

Hashing: k indexes derived from one splitmix64 avalanche via the
Kirsch-Mitzenmacher double-hashing construction (h1 + i*h2), the
standard trick that keeps k probes as cheap as two hashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from proj_ray.stages.distinct import _hash64


def _indexes(vals: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for each value."""
    h = _hash64(vals.astype(np.int64).view(np.uint64))
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd -> full-period step
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)) \
        .astype(np.int64)


def bloom_build(ds, col: str, m_bits: int = 1 << 20, k: int = 5,
                fanout: int = 32):
    """One corpus pass -> a packed uint64 bitmap (m_bits/64 words).
    Per-block partials are bitmaps too and OR is associative, so one
    fan-in level (`repartition(fanout)`) pre-ORs them in parallel and
    the driver sees O(fanout) partials — not O(n_blocks), which at
    100 TB (~10^5-10^6 blocks) would push tens of GB through a serial
    driver loop (VERDICT r3 finding #3)."""
    import ray

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bmp = np.zeros(words, dtype=np.uint64)
        v = t.column(col).to_numpy(zero_copy_only=False)
        idx = _indexes(v, m_bits, k).ravel()
        np.bitwise_or.at(bmp, idx >> 6,
                         np.uint64(1) << (idx & 63).astype(np.uint64))
        return pa.table({"bmp": pa.array([bmp.tobytes()],
                                         type=pa.binary())})

    def or_rows(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for buf in t.column("bmp"):
            acc |= np.frombuffer(buf.as_buffer(), dtype=np.uint64)
        return pa.table({"bmp": pa.array([acc.tobytes()],
                                         type=pa.binary())})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .repartition(fanout)
             .map_batches(or_rows, batch_format="pyarrow",
                          batch_size=None)
             .take_all())
    out = np.zeros(words, dtype=np.uint64)
    for row in parts:
        out |= np.frombuffer(row["bmp"], dtype=np.uint64)
    return ray.put((out, m_bits, k))


def bloom_prune(ds, col: str, bloom_ref):
    """Keep rows whose key MIGHT be in the build side (superset of the
    true matches — follow with an exact join)."""
    def keep(t: pa.Table) -> pa.Table:
        from proj_ray.stages.worker_cache import get_broadcast

        bmp, m_bits, k = get_broadcast(bloom_ref)
        v = t.column(col).to_numpy(zero_copy_only=False)
        idx = _indexes(v, m_bits, k)
        bits = (bmp[idx >> 6] >> (idx & 63).astype(np.uint64)) \
            & np.uint64(1)
        return t.filter(pa.array(bits.all(axis=1)))

    return ds.map_batches(keep, batch_format="pyarrow")
