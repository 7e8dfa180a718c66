"""Approximate-nearest-neighbor search over an embedding column.

* `ann_brute_topk` — exact baseline: per-batch matmul against a
  broadcast query matrix + per-batch partial top-k (combiner), merged by
  one tiny groupby.  SQL-oracle-checkable via list_cosine_similarity.
* `ann_ivf_topk`   — IVF scale path: k-means-lite coarse centroids
  (deterministic seeding, few Lloyd iterations on a sample), vectors
  bucketed by nearest centroid (the shuffle key); queries probe only the
  nprobe nearest buckets.  Recall measured against the brute baseline in
  tests.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


class BruteANN:
    def __init__(self, qmat_ref, qids_ref, k: int):
        import ray

        self.q = ray.get(qmat_ref)  # (nq, d) normalized
        self.qids = ray.get(qids_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(np.vstack(batch["embedding"].to_numpy())
                         .astype(np.float64))
        sims = self.q @ emb.T  # (nq, batch)
        vids = batch["vec_id"].to_numpy()
        k = min(self.k, sims.shape[1])
        out = {"query_id": [], "vec_id": [], "cosine": []}
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for qi in range(len(self.qids)):
            sel = part[qi]
            out["query_id"].extend([self.qids[qi]] * k)
            out["vec_id"].extend(vids[sel])
            out["cosine"].extend(sims[qi, sel])
        return pd.DataFrame({
            "query_id": np.asarray(out["query_id"], dtype=np.int64),
            "vec_id": np.asarray(out["vec_id"], dtype=np.int64),
            "cosine": np.round(np.asarray(out["cosine"]), 9),
        })


def _merge_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["cosine", "vec_id"],
                      ascending=[False, True]).head(k).copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def _driver_merge(partial, k: int):
    import ray.data as rd

    df = partial.to_pandas()
    if len(df) == 0:
        return rd.from_pandas(df)
    merged = df.groupby("query_id", group_keys=False)[df.columns].apply(
        lambda g: _merge_topk(g, k)).reset_index(drop=True)
    return rd.from_pandas(merged)


def ann_brute_topk(emb_ds, queries: Dict, k: int = 5, concurrency: int = 2):
    """queries: {'query_id': int array, 'embedding': (nq, d) array}."""
    import ray

    qmat = _normalize(np.asarray(queries["embedding"], dtype=np.float64))
    qref = ray.put(qmat)
    iref = ray.put(np.asarray(queries["query_id"], dtype=np.int64))
    partial = emb_ds.map_batches(
        BruteANN, fn_constructor_args=(qref, iref, k),
        batch_format="pandas", batch_size=8192, concurrency=concurrency)
    return _driver_merge(partial, k)


def kmeans_lite(mat: np.ndarray, n_centroids: int, iters: int = 5,
                seed: int = 11) -> np.ndarray:
    """Deterministic k-means on normalized vectors (cosine/IP metric)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(mat), size=min(n_centroids, len(mat)),
                     replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IVFScorer:
    def __init__(self, qmat_ref, qids_ref, probe_ref, cent_ref, k: int):
        import ray

        self.q = ray.get(qmat_ref)
        self.qids = ray.get(qids_ref)
        self.probe = ray.get(probe_ref)  # (nq, nprobe) bucket ids
        self.cent = ray.get(cent_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(np.vstack(batch["embedding"].to_numpy())
                         .astype(np.float64))
        buckets = np.argmax(emb @ self.cent.T, axis=1)
        vids = batch["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(self.qids)):
            mask = np.isin(buckets, self.probe[qi])
            if not mask.any():
                continue
            sims = self.q[qi] @ emb[mask].T
            sel_ids = vids[mask]
            k = min(self.k, len(sims))
            part = np.argpartition(-sims, k - 1)[:k]
            out["query_id"].extend([self.qids[qi]] * k)
            out["vec_id"].extend(sel_ids[part])
            out["cosine"].extend(sims[part])
        return pd.DataFrame({
            "query_id": np.asarray(out["query_id"], dtype=np.int64),
            "vec_id": np.asarray(out["vec_id"], dtype=np.int64),
            "cosine": np.round(np.asarray(out["cosine"]), 9),
        })


def ann_ivf_topk(emb_ds, queries: Dict, k: int = 5, n_centroids: int = 16,
                 nprobe: int = 4, sample_fraction: float = 0.25,
                 concurrency: int = 2):
    import ray

    sample = emb_ds.random_sample(sample_fraction, seed=3).to_pandas()
    smat = _normalize(np.vstack(sample["embedding"].to_numpy())
                      .astype(np.float64))
    cent = kmeans_lite(smat, n_centroids)
    qmat = _normalize(np.asarray(queries["embedding"], dtype=np.float64))
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    refs = (ray.put(qmat),
            ray.put(np.asarray(queries["query_id"], dtype=np.int64)),
            ray.put(probe), ray.put(cent))
    partial = emb_ds.map_batches(
        IVFScorer, fn_constructor_args=(*refs, k),
        batch_format="pandas", batch_size=8192, concurrency=concurrency)
    return _driver_merge(partial, k)
