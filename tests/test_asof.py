"""Distributed backward as-of join vs pandas merge_asof ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    return pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=True)


def _run(left, right, **kw):
    import ray.data as rd

    from proj_ray.stages.asof import asof_join

    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="user_id", time="ts", **kw).to_pandas()
    return out.sort_values(["event_id"]).reset_index(drop=True)


def _rand_frames(n_left=500, n_right=300, n_users=20, seed=11):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "event_id": np.arange(n_left, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n_left),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_left), unit="s"),
    })
    right = pd.DataFrame({
        "user_id": rng.integers(0, n_users, n_right),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_right), unit="s"),
        "pval": rng.normal(size=n_right),
    })
    # merge_asof needs unique (by, on) on the right for determinism
    right = right.drop_duplicates(["user_id", "ts"])
    return left, right


def test_asof_matches_pandas(ray_session):
    left, right = _rand_frames()
    got = _run(left, right, num_partitions=8)
    want = _reference(left, right).sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "ts", "pval"]],
        want[["event_id", "user_id", "ts", "pval"]])


def test_asof_exact_match_inclusive(ray_session):
    ts = pd.to_datetime([100, 200, 300], unit="s")
    left = pd.DataFrame({"event_id": np.array([1, 2, 3], dtype=np.int64),
                         "user_id": np.array([5, 5, 5], dtype=np.int64),
                         "ts": ts})
    right = pd.DataFrame({"user_id": np.array([5], dtype=np.int64),
                          "ts": pd.to_datetime([200], unit="s"),
                          "pval": [1.5]})
    got = _run(left, right)
    # t=100: no match; t=200: inclusive match; t=300: carries forward
    assert np.isnan(got.loc[got.event_id == 1, "pval"]).all()
    assert (got.loc[got.event_id == 2, "pval"] == 1.5).all()
    assert (got.loc[got.event_id == 3, "pval"] == 1.5).all()


def test_asof_no_cross_user_leak(ray_session):
    left = pd.DataFrame({"event_id": np.array([1], dtype=np.int64),
                         "user_id": np.array([2], dtype=np.int64),
                         "ts": pd.to_datetime([500], unit="s")})
    right = pd.DataFrame({"user_id": np.array([1], dtype=np.int64),
                          "ts": pd.to_datetime([100], unit="s"),
                          "pval": [9.0]})
    got = _run(left, right)
    assert np.isnan(got["pval"]).all()


def test_asof_column_clash_raises(ray_session):
    import ray.data as rd

    from proj_ray.stages.asof import asof_join

    left, right = _rand_frames(50, 30)
    right = right.rename(columns={"pval": "event_id"})
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  key="user_id", time="ts")


def test_asof_many_partitions_tiny_input(ray_session):
    """Driver-shape guard: partitions far above row count."""
    left, right = _rand_frames(20, 10, n_users=3)
    got = _run(left, right, num_partitions=64)
    want = _reference(left, right).sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "ts", "pval"]],
        want[["event_id", "user_id", "ts", "pval"]])
