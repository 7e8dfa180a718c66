"""Distributed k-means vs an identically-seeded driver-side Lloyd."""

import numpy as np
import pandas as pd


def _vectors(n=900, dim=8, seed=2):
    rng = np.random.default_rng(seed)
    # three separated blobs
    centers = rng.normal(scale=8.0, size=(3, dim))
    pts = centers[rng.integers(0, 3, n)] + rng.normal(size=(n, dim))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(pts.astype(np.float64)),
    }), pts


def _driver_lloyd(pts, seeds, iters):
    c = seeds.copy()
    inertia = np.inf
    counts = None
    for _ in range(iters):
        d2 = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cid = np.argmin(d2, axis=1)
        inertia = d2[np.arange(len(pts)), cid].sum()
        counts = np.bincount(cid, minlength=len(c))
        for j in range(len(c)):
            if counts[j]:
                c[j] = pts[cid == j].mean(axis=0)
    return c, counts, inertia


def test_distributed_kmeans_matches_driver_lloyd():
    import ray.data as rd

    from proj_ray.stages.cluster import distributed_kmeans, \
        seed_centroids

    df, pts = _vectors()
    ds = rd.from_pandas(df).repartition(5)
    k, iters = 4, 4
    seeds = seed_centroids(ds, "embedding", "vec_id", k)
    c_dist, n_dist, in_dist = distributed_kmeans(
        ds, "embedding", "vec_id", k=k, iters=iters)
    c_ref, n_ref, in_ref = _driver_lloyd(pts, seeds, iters)
    assert np.allclose(c_dist, c_ref, atol=1e-8)
    assert (n_dist == n_ref).all()
    assert abs(in_dist - in_ref) / in_ref < 1e-9


def test_kmeans_inertia_improves_with_rounds():
    import ray.data as rd

    from proj_ray.stages.cluster import distributed_kmeans

    df, _ = _vectors(seed=9)
    ds = rd.from_pandas(df).repartition(3)
    _, _, in1 = distributed_kmeans(ds, "embedding", "vec_id",
                                   k=4, iters=1)
    _, _, in5 = distributed_kmeans(ds, "embedding", "vec_id",
                                   k=4, iters=5)
    assert in5 <= in1 + 1e-9
