"""Deterministic hash sampling: stability, rate accuracy, stratification,
and exact agreement with the DuckDB HUGEINT oracle arithmetic."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from proj_ray.stages.sampling import (
    hash_keep_mask,
    sql_hash_sample_pred,
)


def test_mask_deterministic_and_rate():
    ids = np.arange(100_000, dtype=np.int64)
    m1 = hash_keep_mask(ids, 0.1, seed=3)
    m2 = hash_keep_mask(ids, 0.1, seed=3)
    assert (m1 == m2).all()
    assert abs(m1.mean() - 0.1) < 0.01
    # different seed -> different (mostly independent) sample
    m3 = hash_keep_mask(ids, 0.1, seed=4)
    assert (m1 != m3).any()
    # rate monotone: the 10% sample contains the 5% sample (same seed)
    m5 = hash_keep_mask(ids, 0.05, seed=3)
    assert (~m5 | m1).all()


def test_mask_edge_rates():
    ids = np.arange(1000, dtype=np.int64)
    assert hash_keep_mask(ids, 0.0).sum() == 0
    assert hash_keep_mask(ids, 1.0).all()
    assert hash_keep_mask(ids, 2.0).all()
    assert hash_keep_mask(ids, -1.0).sum() == 0


@pytest.mark.parametrize("rate,seed", [(0.1, 0), (0.37, 7), (0.999, 1)])
def test_mask_matches_duckdb_pred(rate, seed):
    ids = np.arange(5000, dtype=np.int64)
    mine = set(ids[hash_keep_mask(ids, rate, seed=seed)])
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids}))
    pred = sql_hash_sample_pred(rate, seed=seed)
    want = set(con.execute(
        f"SELECT doc_id FROM t WHERE {pred}").df()["doc_id"])
    assert mine == want


def test_hash_sample_dataset(ray_session):
    import ray.data as rd

    from proj_ray.stages.sampling import hash_sample

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2000), type=pa.int64()),
        "payload": [f"p{i}" for i in range(2000)],
    }))
    out = hash_sample(ds, 0.2, seed=5).to_pandas()
    ids = np.arange(2000, dtype=np.int64)
    want = ids[hash_keep_mask(ids, 0.2, seed=5)]
    assert sorted(out["doc_id"]) == sorted(want)
    assert set(out.columns) == {"doc_id", "payload"}


def test_stratified_sample(ray_session):
    import ray.data as rd

    from proj_ray.stages.sampling import stratified_hash_sample

    n = 3000
    langs = np.array(["en", "fr", "zh"])[np.arange(n) % 3]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array(langs),
    }))
    out = stratified_hash_sample(
        ds, rates={"en": 0.05, "fr": 1.0}, default_rate=0.5,
        strat_col="lang", seed=2).to_pandas()
    ids = np.arange(n, dtype=np.int64)
    for lang, rate in (("en", 0.05), ("fr", 1.0), ("zh", 0.5)):
        sel = langs == lang
        want = set(ids[sel][hash_keep_mask(ids[sel], rate, seed=2)])
        got = set(out.loc[out["lang"] == lang, "doc_id"])
        assert got == want, lang


def test_weighted_sample_partitioning_invariance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.stages.sampling import weighted_sample

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "w": rng.integers(1, 500, 2000).astype(np.int64),
    })
    a = weighted_sample(rd.from_pandas(df).repartition(2), k=25,
                        weight_col="w", seed=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = weighted_sample(
        rd.from_pandas(df.sample(frac=1, random_state=1))
        .repartition(17), k=25, weight_col="w", seed=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_weighted_sample_prefers_heavy_rows():
    """P(selection) tracks weight: rows with 100x weight must be
    selected far more often across seeds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.stages.sampling import weighted_sample

    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # first 20 rows carry 100x the weight of the rest
        "w": np.where(np.arange(n) < 20, 2000, 20).astype(np.int64),
    })
    heavy_hits = 0
    for seed in range(8):
        got = weighted_sample(rd.from_pandas(df), k=20,
                              weight_col="w", seed=seed).to_pandas()
        heavy_hits += int((got["doc_id"] < 20).sum())
    # heavy rows are 5% of the population but ~72% of the weight;
    # across 8 seeds x 20 picks they must dominate clearly
    assert heavy_hits >= 0.5 * 8 * 20


def test_hash_split_stable_and_proportional(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from proj_ray.stages.sampling import hash_split

    n = 20000
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(rd.from_arrow(t).repartition(6), fr,
                     seed=3).to_pandas()
    counts = out["split"].value_counts()
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01
    # stability: identical assignment on re-run and re-partitioning
    out2 = hash_split(rd.from_arrow(t).repartition(13), fr,
                      seed=3).to_pandas()
    m = out.sort_values("doc_id")["split"].to_numpy()
    m2 = out2.sort_values("doc_id")["split"].to_numpy()
    assert (m == m2).all()
    # different seed -> different assignment
    out3 = hash_split(rd.from_arrow(t), fr, seed=4).to_pandas()
    m3 = out3.sort_values("doc_id")["split"].to_numpy()
    assert (m != m3).any()
