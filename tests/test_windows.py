"""Sessionization and grouped top-k vs driver-side pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n=800, users=15, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n),
        "ts": pd.to_datetime(np.sort(rng.integers(0, 10**6, n)),
                             unit="s"),
        "value": rng.normal(size=n),
    })


def _ref_sessions(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"]).copy()
    new = (df.groupby("user_id")["ts"].diff()
           > pd.Timedelta(seconds=gap_s))
    new |= df.groupby("user_id").cumcount() == 0
    df["session_id"] = new.groupby(df["user_id"]).cumsum() - 1
    df["session_seq"] = df.groupby(["user_id", "session_id"]).cumcount()
    return df


def test_sessionize_matches_pandas(ray_session):
    import ray.data as rd

    from proj_ray.stages.windows import sessionize

    df = _events()
    out = sessionize(rd.from_pandas(df[["event_id", "user_id", "ts"]]),
                     key="user_id", time="ts", gap_s=900,
                     tiebreak="event_id", num_partitions=8).to_pandas()
    want = _ref_sessions(df, 900)
    merged = out.merge(
        want[["event_id", "session_id", "session_seq"]],
        on="event_id", suffixes=("", "_want"))
    assert (merged["session_id"] == merged["session_id_want"]).all()
    assert (merged["session_seq"] == merged["session_seq_want"]).all()


def test_sessionize_gap_boundary(ray_session):
    """Distance EXACTLY equal to the gap stays in-session (strictly
    greater starts a new one) — the `> INTERVAL` SQL semantics."""
    import ray.data as rd

    from proj_ray.stages.windows import sessionize

    df = pd.DataFrame({
        "event_id": np.arange(3, dtype=np.int64),
        "user_id": np.zeros(3, dtype=np.int64),
        "ts": pd.to_datetime([0, 100, 201], unit="s"),
    })
    out = sessionize(rd.from_pandas(df), key="user_id", time="ts",
                     gap_s=100, tiebreak="event_id").to_pandas() \
        .sort_values("event_id")
    assert out["session_id"].tolist() == [0, 0, 1]
    assert out["session_seq"].tolist() == [0, 1, 0]


def test_grouped_top_k(ray_session):
    import ray.data as rd

    from proj_ray.stages.windows import grouped_top_k

    df = _events(600, users=10, seed=9)
    out = grouped_top_k(
        rd.from_pandas(df[["event_id", "user_id", "value"]]),
        key="user_id", score="value", k=4, tiebreak="event_id",
        num_partitions=8).to_pandas()
    want = df.sort_values(["value", "event_id"],
                          ascending=[False, True]) \
        .groupby("user_id").head(4)
    assert sorted(out["event_id"]) == sorted(want["event_id"])


def test_grouped_top_k_fewer_than_k(ray_session):
    import ray.data as rd

    from proj_ray.stages.windows import grouped_top_k

    df = pd.DataFrame({
        "event_id": np.arange(2, dtype=np.int64),
        "user_id": np.array([1, 2], dtype=np.int64),
        "value": [0.5, 0.7],
    })
    out = grouped_top_k(rd.from_pandas(df), key="user_id",
                        score="value", k=10).to_pandas()
    assert sorted(out["event_id"]) == [0, 1]


def test_sliding_window_fanout_and_membership():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.stages.windows import assign_sliding_windows

    rng = np.random.default_rng(9)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 72 * 3600, 200), unit="s")
    df = pd.DataFrame({"eid": np.arange(200, dtype=np.int64), "ts": ts})
    out = assign_sliding_windows(rd.from_pandas(df), "ts",
                                 width_s=6 * 3600, hop_s=3600)
    got = out.to_pandas()
    # exact fan-out factor
    assert len(got) == 200 * 6
    assert got.groupby("eid").size().eq(6).all()
    # every emitted window actually contains its event
    w = got["window_start"]
    assert (w <= got["ts"]).all()
    assert (got["ts"] < w + pd.Timedelta(hours=6)).all()
    # window starts are hop-aligned
    us = w.to_numpy().astype("datetime64[us]").view("int64")
    assert (us % (3600 * 10**6) == 0).all()


def test_sliding_window_rejects_nonmultiple():
    import pytest as _pytest
    import ray.data as rd
    import pandas as pd

    from proj_ray.stages.windows import assign_sliding_windows

    ds = rd.from_pandas(pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"])}))
    with _pytest.raises(ValueError):
        assign_sliding_windows(ds, "ts", width_s=5000, hop_s=3600)


def test_keyed_lag_matches_pandas_shift():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.stages.windows import keyed_lag

    rng = np.random.default_rng(4)
    n = 500
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 12, n),
        "t": rng.integers(0, 10_000, n),
        "v": rng.normal(size=n),
    })
    out = keyed_lag(rd.from_pandas(df), key="k", time="t",
                    value_cols=["v"], tiebreak="rid")
    got = out.to_pandas().sort_values("rid").reset_index(drop=True)
    want = df.sort_values(["k", "t", "rid"])
    want = want.assign(v_lag=want.groupby("k")["v"].shift(1))
    want = want.sort_values("rid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["v_lag"], want["v_lag"],
                                   check_names=False)


def test_keyed_cumsum_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.stages.windows import keyed_cumsum

    rng = np.random.default_rng(8)
    n = 600
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 15, n),
        "t": rng.integers(0, 5_000, n),
        "v": rng.normal(size=n),
    })
    out = keyed_cumsum(rd.from_pandas(df), key="k", time="t",
                       value_cols=["v"], tiebreak="rid")
    got = out.to_pandas().sort_values("rid").reset_index(drop=True)
    want = df.sort_values(["k", "t", "rid"])
    want = want.assign(v_cum=want.groupby("k")["v"].cumsum())
    want = want.sort_values("rid").reset_index(drop=True)
    assert np.allclose(got["v_cum"], want["v_cum"], rtol=0, atol=1e-12)


def test_keyed_ntile_matches_sql_semantics():
    """NTILE bucket sizes differ by at most one, larger first; exact
    match against a reference implementing SQL's definition."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.stages.windows import keyed_ntile

    rng = np.random.default_rng(12)
    n = 700
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 9, n),
        "v": rng.normal(size=n),
    })
    out = keyed_ntile(rd.from_pandas(df), key="k", order_col="v",
                      n_tiles=4, tiebreak="rid").to_pandas() \
        .sort_values("rid").reset_index(drop=True)

    def ref_ntile(g):
        m = len(g)
        q, rem = divmod(m, 4)
        sizes = [q + 1] * rem + [q] * (4 - rem)
        buckets = np.repeat(np.arange(1, 5), sizes[:4])[:m]
        g = g.sort_values(["v", "rid"]).copy()
        g["want"] = buckets
        return g

    want = df.groupby("k", group_keys=False).apply(ref_ntile) \
        .sort_values("rid").reset_index(drop=True)
    assert (out["tile_no"].to_numpy() == want["want"].to_numpy()).all()
