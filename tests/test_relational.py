"""broadcast_join vs pandas merge ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _run(big: pd.DataFrame, small: pa.Table, how: str, **kw):
    import ray.data as rd

    from proj_ray.stages.relational import broadcast_join

    out = broadcast_join(rd.from_pandas(big), small, how=how, **kw)
    return out.to_pandas().sort_values("row_id").reset_index(drop=True)


def _frames(seed=7, n=400, n_keys=25):
    rng = np.random.default_rng(seed)
    big = pd.DataFrame({
        "row_id": np.arange(n, dtype=np.int64),
        # keys 0..n_keys+4: the top 5 have no small-side match
        "k": rng.integers(0, n_keys + 5, n),
        "v": rng.normal(size=n),
    })
    small = pa.table({
        "sk": pa.array(rng.permutation(n_keys).astype(np.int64)),
        "label": [f"g{i % 4}" for i in range(n_keys)],
    })
    return big, small


def test_inner_matches_pandas():
    big, small = _frames()
    got = _run(big, small, "inner", key="k", right_key="sk")
    want = big.merge(small.to_pandas(), left_on="k", right_on="sk")
    want = want.drop(columns=["sk"]).sort_values("row_id")
    want = want.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["row_id", "k", "v", "label"]],
        want[["row_id", "k", "v", "label"]])


def test_left_keeps_unmatched_with_nulls():
    big, small = _frames()
    got = _run(big, small, "left", key="k", right_key="sk")
    assert len(got) == len(big)
    unmatched = got[got["k"] >= 25]
    assert len(unmatched) > 0
    assert unmatched["label"].isna().all()
    matched = got[got["k"] < 25]
    want = big.merge(small.to_pandas(), left_on="k", right_on="sk")
    lut = dict(zip(want["k"], want["label"]))
    assert (matched["label"] == matched["k"].map(lut)).all()


def test_shuffle_join_matches_pandas():
    import ray.data as rd

    from proj_ray.stages.relational import shuffle_join

    big, small = _frames(seed=3, n=600, n_keys=40)
    right = small.to_pandas().rename(columns={"sk": "rk"})
    out = shuffle_join(rd.from_pandas(big), rd.from_pandas(right),
                       on="k", right_on="rk", num_partitions=5)
    got = out.to_pandas().sort_values("row_id").reset_index(drop=True)
    want = big.merge(right, left_on="k", right_on="rk") \
        .sort_values("row_id").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["row_id", "k", "v", "label"]],
        want[["row_id", "k", "v", "label"]])


def _interval_reference(big, iv):
    rows = []
    for _, r in big.iterrows():
        for _, w in iv.iterrows():
            if w["ws"] <= r["x"] <= w["we"]:
                rows.append({**r.to_dict(), "win_id": w["win_id"]})
    return pd.DataFrame(rows)


def test_interval_join_overlapping_matches_bruteforce():
    import ray.data as rd

    from proj_ray.stages.relational import interval_join

    rng = np.random.default_rng(5)
    big = pd.DataFrame({
        "row_id": np.arange(300, dtype=np.int64),
        "x": rng.integers(0, 1000, 300),
    })
    iv = pd.DataFrame({
        "win_id": np.arange(12, dtype=np.int64),
        "ws": np.arange(12, dtype=np.int64) * 80,
        "we": np.arange(12, dtype=np.int64) * 80 + 130,  # overlapping
    })
    out = interval_join(rd.from_pandas(big), pa.Table.from_pandas(iv),
                        on="x", start="ws", end="we")
    got = out.to_pandas().sort_values(["row_id", "win_id"]) \
        .reset_index(drop=True)
    want = _interval_reference(big, iv) \
        .sort_values(["row_id", "win_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[["row_id", "x", "win_id"]],
                                  want[["row_id", "x", "win_id"]])


def test_interval_join_inclusive_bounds_and_timestamps():
    import ray.data as rd

    from proj_ray.stages.relational import interval_join

    ts = pd.to_datetime(["2024-01-01", "2024-01-05", "2024-01-10",
                         "2024-02-01"])
    big = pd.DataFrame({"row_id": np.arange(4, dtype=np.int64),
                        "ts": ts})
    iv = pa.table({
        "win_id": pa.array([0], type=pa.int64()),
        "ws": pa.array([pd.Timestamp("2024-01-01")]),
        "we": pa.array([pd.Timestamp("2024-01-10")]),
    })
    out = interval_join(rd.from_pandas(big), iv,
                        on="ts", start="ws", end="we")
    got = out.to_pandas()
    # both endpoints inclusive, the February point excluded
    assert sorted(got["row_id"]) == [0, 1, 2]


def test_all_miss_batch_keeps_schema():
    """A batch with zero matches must emit the same schema/types as a
    hitting batch (the empty-batch bug class from VERDICT r2 item 3)."""
    import ray.data as rd

    from proj_ray.stages.relational import broadcast_join

    big = pd.DataFrame({"row_id": np.arange(5, dtype=np.int64),
                        "k": np.full(5, 999, dtype=np.int64)})
    small = pa.table({"sk": pa.array([1, 2], type=pa.int64()),
                      "label": ["a", "b"]})
    out = broadcast_join(rd.from_pandas(big), small,
                         key="k", right_key="sk", how="inner")
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")],
        promote_options="none") if out.count() else None
    schema = out.schema()
    assert out.count() == 0
    assert schema.names == ["row_id", "k", "label"]
    assert tbl is None


def test_semi_and_anti_partition_the_stream():
    import ray.data as rd

    from proj_ray.stages.relational import broadcast_join

    big, small = _frames(seed=13)
    semi = broadcast_join(rd.from_pandas(big), small, key="k",
                          right_key="sk", how="semi").to_pandas()
    anti = broadcast_join(rd.from_pandas(big), small, key="k",
                          right_key="sk", how="anti").to_pandas()
    # no payload columns attached, schema preserved
    assert list(semi.columns) == list(big.columns)
    assert list(anti.columns) == list(big.columns)
    # semi + anti = the whole stream, disjoint
    assert len(semi) + len(anti) == len(big)
    assert set(semi["row_id"]).isdisjoint(set(anti["row_id"]))
    member = set(small.to_pandas()["sk"])
    assert semi["k"].isin(member).all()
    assert (~anti["k"].isin(member)).all()


def test_anti_with_empty_small_side_keeps_everything():
    import ray.data as rd

    from proj_ray.stages.relational import broadcast_join

    big, _ = _frames(seed=2, n=50)
    empty = pa.table({"sk": pa.array([], type=pa.int64()),
                      "label": pa.array([], type=pa.string())})
    anti = broadcast_join(rd.from_pandas(big), empty, key="k",
                          right_key="sk", how="anti").to_pandas()
    assert len(anti) == len(big)


def test_set_ops_match_python_sets():
    import ray.data as rd

    from proj_ray.stages.relational import set_except, set_intersect

    rng = np.random.default_rng(23)
    a = pd.DataFrame({"k": rng.integers(0, 300, 800)})
    b = pd.DataFrame({"k": rng.integers(150, 450, 800)})
    dsa = rd.from_pandas(a).repartition(4)
    dsb = rd.from_pandas(b).repartition(3)
    inter = set(set_intersect(dsa, dsb, "k").to_pandas()["k"])
    exc = set(set_except(dsa, dsb, "k").to_pandas()["k"])
    sa, sb = set(a["k"]), set(b["k"])
    assert inter == sa & sb
    assert exc == sa - sb


def test_interval_join_property_random_layouts():
    """Property test: arbitrary (possibly nested/duplicate/point)
    intervals against brute force."""
    import ray.data as rd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from proj_ray.stages.relational import interval_join

    @settings(max_examples=15, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(
        ivs=st.lists(st.tuples(st.integers(-50, 50),
                               st.integers(0, 30)),
                     min_size=1, max_size=10),
        xs=st.lists(st.integers(-60, 90), min_size=1, max_size=40),
    )
    def check(ivs, xs):
        iv = pd.DataFrame({
            "win_id": np.arange(len(ivs), dtype=np.int64),
            "ws": np.array([s for s, _ in ivs], dtype=np.int64),
            "we": np.array([s + w for s, w in ivs], dtype=np.int64),
        })
        big = pd.DataFrame({
            "row_id": np.arange(len(xs), dtype=np.int64),
            "x": np.array(xs, dtype=np.int64),
        })
        got = interval_join(rd.from_pandas(big),
                            pa.Table.from_pandas(iv),
                            on="x", start="ws", end="we").to_pandas()
        want = {(r, w) for r, x in zip(big["row_id"], big["x"])
                for w, s, e in zip(iv["win_id"], iv["ws"], iv["we"])
                if s <= x <= e}
        if len(got) == 0:
            # Ray's to_pandas drops columns on a fully-empty Dataset
            assert want == set()
        else:
            assert set(zip(got["row_id"], got["win_id"])) == want
            assert len(got) == len(want)

    check()


def test_melt_inverts_wide_table():
    import ray.data as rd

    from proj_ray.stages.relational import melt

    wide = pd.DataFrame({
        "id": np.arange(4, dtype=np.int64),
        "a": [1.0, 2.0, 3.0, 4.0],
        "b": [10.0, 20.0, 30.0, 40.0],
    })
    out = melt(rd.from_pandas(wide), id_cols=["id"],
               value_cols=["a", "b"]).to_pandas()
    want = wide.melt(id_vars=["id"], value_vars=["a", "b"]) \
        .sort_values(["id", "variable"]).reset_index(drop=True)
    got = out.sort_values(["id", "variable"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "variable", "value"]],
                                  want[["id", "variable", "value"]])
