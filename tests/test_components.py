"""Connected components over near-dup pair graphs + the corpus filter.

Ground truth is a tiny driver-side union-find — the distributed
hash-min labeling must agree exactly on every graph shape that
exercises a different code path (empty, single pair, chains that need
multiple propagation rounds, dense cliques, many components,
non-contiguous ids)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _uf_components(pairs):
    """Reference union-find; returns {node: min-id-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(pairs, **kw):
    from proj_ray.stages.components import connected_components

    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"], dtype="int64")
    out = connected_components(df, **kw).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"], out["component"]))


GRAPHS = {
    "empty": [],
    "single": [(7, 3)],
    "chain": [(i, i + 1) for i in range(20)],  # diameter 20: many rounds
    "clique": [(i, j) for i in range(6) for j in range(i + 1, 6)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "sparse_ids": [(10**9, 5), (5, 10**6), (42, 10**9 + 7)],
    "self_loop": [(4, 4), (4, 9)],
}


# driver_limit=0 forces the distributed hash-min fixpoint; the default
# takes the exact driver union-find.  Both must agree with ground truth
# on every graph shape.
@pytest.mark.parametrize("limit", [0, 2_000_000],
                         ids=["distributed", "driver"])
@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_union_find(ray_session, name, limit):
    pairs = GRAPHS[name]
    got = _run_cc(pairs, num_buckets=4, driver_limit=limit)
    assert got == _uf_components(pairs)


@pytest.mark.parametrize("limit", [0, 2_000_000],
                         ids=["distributed", "driver"])
def test_cc_random_graph(ray_session, limit):
    rng = np.random.default_rng(17)
    pairs = [tuple(map(int, p)) for p in rng.integers(0, 400, (300, 2))]
    got = _run_cc(pairs, num_buckets=8, driver_limit=limit)
    assert got == _uf_components(pairs)


def test_cc_more_buckets_than_edges(ray_session):
    """The driver-shape regression class from round 2: partition count
    far above the row count must not change results or crash."""
    pairs = [(1, 2), (2, 3)]
    got = _run_cc(pairs, num_buckets=64, driver_limit=0)
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_dataset_input_both_paths(ray_session):
    """Dataset (not DataFrame) input: the size gate materializes and
    counts; both sides of the gate produce identical labels."""
    import ray.data as rd

    pairs = GRAPHS["two_components"]
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"], dtype="int64")
    from proj_ray.stages.components import connected_components

    for limit in (0, 10**6):
        out = connected_components(rd.from_pandas(df),
                                   driver_limit=limit).to_pandas()
        assert dict(zip(out["node"], out["component"])) \
            == _uf_components(pairs)


def test_near_dup_filter_keeps_representatives(ray_session):
    import ray.data as rd

    from proj_ray.stages.components import near_dup_filter

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10), type=pa.int64()),
        "text": [f"doc {i}" for i in range(10)],
    }))
    # clusters {1,2,3} and {7,9}; 0,4,5,6,8 isolated
    pairs = pd.DataFrame({"doc_a": [1, 2, 9], "doc_b": [2, 3, 7]},
                         dtype="int64")
    kept = near_dup_filter(docs, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 4, 5, 6, 7, 8]
    # surviving rows keep their full payload
    assert set(kept.columns) == {"doc_id", "text"}
    assert kept.set_index("doc_id").loc[7, "text"] == "doc 7"


def test_near_dup_filter_no_pairs(ray_session):
    import ray.data as rd

    from proj_ray.stages.components import near_dup_filter

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": [f"d{i}" for i in range(5)],
    }))
    pairs = pd.DataFrame({"doc_a": [], "doc_b": []}, dtype="int64")
    kept = near_dup_filter(docs, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2, 3, 4]
