"""Deterministic hash-based sampling.

At corpus scale, sampling must be (a) a stateless per-row decision so
it parallelizes with zero coordination, (b) deterministic so re-runs,
resumed jobs and downstream audits see the same sample, and (c)
stratifiable so each slice (language, source, quality band) keeps its
own rate.  Random-number sampling satisfies none of these; keyed
hashing satisfies all three: keep a row iff
``hash(id, seed) < rate * 2**64``.

The hash is a Knuth multiplicative hash over the id with the seed
folded in: ``h = (id + seed) * PHI64  (mod 2**64)``.  Multiplicative
hashing with the golden-ratio constant spreads consecutive ids
uniformly (Knuth, TAOCP vol. 3 §6.4), and — deliberately — the whole
computation is plain modular arithmetic, so a SQL oracle can reproduce
it bit-for-bit with 128-bit integer math (DuckDB HUGEINT); see
``sql_hash_sample_pred``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# 2**64 / golden ratio, odd (Knuth's multiplicative constant)
PHI64 = np.uint64(0x9E3779B97F4A7C15)
_PHI64_INT = int(PHI64)
_TWO64 = 1 << 64


def hash_keep_mask(ids: np.ndarray, rate: float,
                   seed: int = 0) -> np.ndarray:
    """Boolean keep-mask: deterministic in (id, seed), P(keep) = rate
    for ids uniform mod 2**64.  Comparison stays in exact uint64.

    Threshold note (ADVICE r3): for rate in [1 - 2**-54, 1.0) the
    float64 product rate * 2**64 rounds UP to exactly 2**64, which
    overflows uint64 — and the DuckDB oracle's HUGEINT threshold then
    keeps every row.  Any rate whose float product reaches 2**64 is
    therefore keep-all, decided in Python int space before the cast."""
    rate = min(max(rate, 0.0), 1.0)
    h = (ids.astype(np.uint64) + np.uint64(seed)) * PHI64
    thresh = int(rate * float(_TWO64))
    if thresh >= _TWO64:
        return np.ones(len(h), dtype=bool)
    return h < np.uint64(thresh)


def hash_sample(ds, rate: float, id_col: str = "doc_id", seed: int = 0):
    """Keep each row with probability `rate`, decided by a
    deterministic hash of its id — stateless, order- and
    partitioning-independent, identical across re-runs."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(hash_keep_mask(ids, rate, seed)))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_hash_sample(ds, rates: dict, strat_col: str,
                           default_rate: float = 0.0,
                           id_col: str = "doc_id", seed: int = 0):
    """Per-stratum deterministic sampling: each row's keep-rate comes
    from `rates[row[strat_col]]` (else `default_rate`).  One stateless
    pass — the rate table rides into every task as a plain dict (tiny),
    the keep decision never leaves the batch."""
    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(t.column(strat_col)).combine_chunks()
        per_uniq = np.array(
            [float(rates.get(v.as_py(), default_rate))
             for v in enc.dictionary], dtype=np.float64)
        r = np.clip(per_uniq, 0.0, 1.0)[
            enc.indices.to_numpy(zero_copy_only=False)]
        h = (ids.astype(np.uint64) + np.uint64(seed)) * PHI64
        # same 2**64-rounding guard as hash_keep_mask: a float product
        # that reaches 2**64 would silently WRAP through .astype(uint64)
        prod = r * float(_TWO64)
        full = (r >= 1.0) | (prod >= float(_TWO64))
        thresh = np.where(full, 0.0, prod).astype(np.uint64)
        return t.filter(pa.array(full | (h < thresh)))

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_hash_sample_pred(rate, id_col: str = "doc_id",
                         seed: int = 0) -> str:
    """The DuckDB predicate computing the IDENTICAL keep decision:
    128-bit multiply, explicit mod 2**64, threshold compare.  `rate`
    may be a float or a SQL expression (e.g. a CASE over a stratum
    column)."""
    rate_expr = rate if isinstance(rate, str) else repr(float(rate))
    return (f"(({id_col}::HUGEINT + {seed}) * {_PHI64_INT}::HUGEINT)"
            f" % {_TWO64}::HUGEINT"
            f" < CAST(LEAST(GREATEST({rate_expr}, 0.0), 1.0)"
            f" * {float(_TWO64)!r} AS HUGEINT)")


def es_key(ids: np.ndarray, weights: np.ndarray,
           seed: int = 0) -> np.ndarray:
    """Efraimidis-Spirakis weighted-sampling key, log form:
    ln(u) / w with u = (hash(id, seed) + 0.5) / 2**64.  Taking the
    top-k rows by this key (descending) IS a weighted random sample
    without replacement with P proportional to w — and because u comes
    from the deterministic Knuth hash, the sample is re-run-stable and
    SQL-reproducible (see sql_es_key)."""
    h = (ids.astype(np.uint64) + np.uint64(seed)) * PHI64
    u = (h.astype(np.float64) + 0.5) / float(_TWO64)
    w = np.maximum(weights.astype(np.float64), 1.0)
    return np.log(u) / w


def sql_es_key(id_col: str = "doc_id", weight_col: str = "n_chars",
               seed: int = 0) -> str:
    """DuckDB expression computing the identical E-S key."""
    return (f"ln((CAST((({id_col}::HUGEINT + {seed})"
            f" * {_PHI64_INT}::HUGEINT) % {_TWO64}::HUGEINT AS DOUBLE)"
            f" + 0.5) / {float(_TWO64)!r})"
            f" / GREATEST({weight_col}::DOUBLE, 1.0)")


def weighted_sample(ds, k: int, weight_col: str,
                    id_col: str = "doc_id", seed: int = 0):
    """Deterministic weighted sample WITHOUT replacement of size k
    (P proportional to weight): attach the E-S key per batch, then the
    bounded-partial top-k combiner — every batch ships at most k rows,
    never the corpus."""
    from proj_ray.stages.windows import grouped_top_k

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        t = t.append_column("__es", pa.array(es_key(ids, w, seed)))
        return t.append_column(
            "__const", pa.array(np.zeros(len(t), dtype=np.int64)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    top = grouped_top_k(keyed, key="__const", score="__es", k=k,
                        descending=True, tiebreak=id_col,
                        num_partitions=1)
    return top.drop_columns(["__es", "__const"])


def hash_split(ds, fractions: dict, id_col: str = "doc_id",
               seed: int = 0, out_col: str = "split"):
    """Deterministic train/val/test split: each row's split label is a
    pure function of (id, seed), so the assignment is stable across
    re-runs, re-partitioning and cluster sizes — the property a
    resumable 100-TB preprocessing job needs.  `fractions` maps label
    -> fraction (must sum to <= 1; any remainder falls into the LAST
    label).  The uniform variate is the same Knuth multiplicative hash
    the samplers use; labels assign by cumulative threshold."""
    labels = list(fractions)
    if not labels:
        raise ValueError("hash_split: fractions required")
    fracs = np.array([fractions[b] for b in labels], dtype=np.float64)
    if (fracs < 0).any() or fracs.sum() > 1.0 + 1e-12:
        raise ValueError("hash_split: fractions must be >= 0, sum <= 1")
    cuts = np.cumsum(fracs)
    cuts[-1] = 1.0  # remainder folds into the last label
    # exact uint64 thresholds (same 2**64-rounding guard as
    # hash_keep_mask)
    thresh = np.array([min(int(c * float(_TWO64)), _TWO64 - 1)
                       for c in cuts], dtype=np.uint64)
    lab_arr = np.array(labels)

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) + np.uint64(seed)) * PHI64
        idx = np.searchsorted(thresh, h, side="right")
        idx = np.minimum(idx, len(labels) - 1)
        return t.append_column(out_col, pa.array(lab_arr[idx]))

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_hash_split_expr(fractions: dict, id_col: str = "doc_id",
                        seed: int = 0) -> str:
    """DuckDB CASE expression computing the IDENTICAL split label."""
    labels = list(fractions)
    fracs = np.cumsum([fractions[b] for b in labels])
    h = (f"(({id_col}::HUGEINT + {seed}) * {_PHI64_INT}::HUGEINT)"
         f" % {_TWO64}::HUGEINT")
    arms = []
    for lab, c in zip(labels[:-1], fracs[:-1]):
        t = min(int(float(c) * float(_TWO64)), _TWO64 - 1)
        arms.append(f"WHEN {h} < {t}::HUGEINT THEN '{lab}'")
    return ("CASE " + " ".join(arms)
            + f" ELSE '{labels[-1]}' END")


def stratified_weighted_sample(ds, k: int, strat_col: str,
                               weight_col: str, id_col: str = "doc_id",
                               seed: int = 0):
    """Deterministic weighted sample of k rows PER STRATUM (without
    replacement, P proportional to weight within the stratum): the
    same Efraimidis-Spirakis keys, finished by the per-key
    bounded-partial top-k combiner — each batch ships at most
    k rows per stratum it contains, never the corpus."""
    from proj_ray.stages.windows import grouped_top_k

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False)
        return t.append_column("__es",
                               pa.array(es_key(ids, w, seed)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    top = grouped_top_k(keyed, key=strat_col, score="__es", k=k,
                        descending=True, tiebreak=id_col)
    return top.drop_columns(["__es"])
