"""Quantile operators: sketch error bound and exact keyed quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_approx_quantiles_error_bound(ray_session):
    import ray.data as rd

    from proj_ray.stages.quantiles import approx_quantiles

    rng = np.random.default_rng(5)
    v = np.concatenate([rng.normal(0, 1, 20_000),
                        rng.normal(50, 5, 5_000)])
    ds = rd.from_arrow(pa.table({"x": v})).materialize()
    bins = 2048
    got = approx_quantiles(ds, "x", [0.1, 0.5, 0.9, 0.99], bins=bins)
    cell = (v.max() - v.min()) / bins
    for q, val in got.items():
        exact = np.quantile(v, q)
        assert abs(val - exact) <= cell + 1e-12, (q, val, exact)


def test_approx_quantiles_constant_column(ray_session):
    import ray.data as rd

    from proj_ray.stages.quantiles import approx_quantiles

    ds = rd.from_arrow(pa.table({"x": np.full(100, 7.5)}))
    got = approx_quantiles(ds, "x", [0.5])
    assert got[0.5] == 7.5


def test_group_quantiles_matches_numpy(ray_session):
    import ray.data as rd

    from proj_ray.stages.quantiles import group_quantiles

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "k": np.array(["a", "b", "c"])[rng.integers(0, 3, 900)],
        "x": rng.normal(size=900) * 100,
    })
    out = group_quantiles(rd.from_pandas(df), key="k", col="x",
                          qs=[0.25, 0.5], out_names=["q25", "q50"],
                          round_to=None).to_pandas() \
        .set_index("k").sort_index()
    for g, sub in df.groupby("k"):
        assert out.loc[g, "q25"] == np.quantile(sub["x"], 0.25)
        assert out.loc[g, "q50"] == np.quantile(sub["x"], 0.5)
