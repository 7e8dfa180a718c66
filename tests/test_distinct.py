"""Exact and HyperLogLog distinct counting."""

import numpy as np
import pandas as pd


def _frame(n=20_000, keys=4, card=(50, 300, 2_000, 9_000), seed=21):
    rng = np.random.default_rng(seed)
    parts = []
    for k in range(keys):
        kn = n // keys
        parts.append(pd.DataFrame({
            "k": np.full(kn, k, dtype=np.int64),
            # distinct value universe of known size per key
            "v": rng.integers(0, card[k], kn).astype(np.int64)
            + k * 10_000_000,
        }))
    return pd.concat(parts, ignore_index=True)


def test_exact_distinct_matches_pandas():
    import ray.data as rd

    from proj_ray.stages.distinct import exact_distinct_count

    df = _frame()
    out = exact_distinct_count(rd.from_pandas(df), key="k", value="v",
                               num_buckets=8).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k")["v"].nunique()
    assert (out["n_distinct"].to_numpy()
            == want.sort_index().to_numpy()).all()


def test_hll_within_error_bound():
    import ray.data as rd

    from proj_ray.stages.distinct import approx_distinct

    df = _frame()
    p = 12
    out = approx_distinct(rd.from_pandas(df), key="k", value="v",
                          p=p).to_pandas().set_index("k")
    want = df.groupby("k")["v"].nunique()
    # 1.04/sqrt(m) standard error; allow 4 sigma
    tol = 4 * 1.04 / np.sqrt(1 << p)
    for k, exact in want.items():
        est = out.loc[k, "n_distinct_approx"]
        assert abs(est - exact) <= max(tol * exact, 3), \
            f"key {k}: est {est} vs exact {exact}"


def test_hll_merge_invariance_across_block_layouts():
    """The sketch must give the SAME answer no matter how the input is
    blocked (mergeability — the property that makes it distributable)."""
    import ray.data as rd

    from proj_ray.stages.distinct import approx_distinct

    df = _frame(n=8_000, seed=5)
    a = approx_distinct(rd.from_pandas(df).repartition(2),
                        key="k", value="v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    b = approx_distinct(rd.from_pandas(df.sample(frac=1, random_state=0))
                        .repartition(17),
                        key="k", value="v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
