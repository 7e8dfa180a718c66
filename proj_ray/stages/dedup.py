"""Deduplication operators over the `documents` table.

All follow the scale pattern from the guide: vectorized per-batch
shingling/hashing inside map_batches, then ONE small groupby over
compact keys — never a shuffle of full documents.

* exact_dedup       — md5(text) hash-partition + per-group min(doc_id)
                      (SQL-oracle-checkable).
* minhash_lsh_pairs — shingle -> 64-perm MinHash -> banded LSH buckets
                      -> candidate pairs -> exact Jaccard verify.
* simhash64         — 64-bit SimHash over token hashes; near-dup pairs
                      by Hamming distance within LSH-rotated buckets.
* embedding_near_dup— cosine near-duplicates over the embeddings table
                      (block-matmul against a broadcast matrix).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_N_BANDS = 16  # 4 rows per band


def _perm_params(n_perm: int = _N_PERM, seed: int = 99):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def text_md5_batch(batch: pd.DataFrame) -> pd.DataFrame:
    batch["h"] = [hashlib.md5(t.encode()).hexdigest()
                  for t in batch["text"].fillna("")]
    return batch[["doc_id", "h"]]


def exact_dedup(docs_ds):
    """Exact dedup: keep the min doc_id per content hash.

    Content-hash cardinality is unbounded (one key per distinct doc), so
    this uses the hash-partitioned aggregate — per-block combine, then a
    shuffle into independent hash buckets, one exact combine each."""
    from proj_ray.stages.agg import hash_shuffle_aggregate

    hashed = docs_ds.map_batches(text_md5_batch, batch_format="pandas")
    return hash_shuffle_aggregate(hashed, ["h"], [("doc_id", "min")],
                                  num_buckets=32)


def shingle_hashes(text: str, n: int = 4) -> np.ndarray:
    """crc32 hashes of character n-gram shingles (stable)."""
    b = text.encode()
    if len(b) < n:
        return np.array([zlib.crc32(b)], dtype=np.int64)
    return np.unique(np.fromiter(
        (zlib.crc32(b[i:i + n]) for i in range(len(b) - n + 1)),
        dtype=np.int64, count=len(b) - n + 1))


def minhash_signature(text: str) -> np.ndarray:
    sh = shingle_hashes(text)
    # (a*x + b) mod p, min over shingles, one per permutation
    vals = (np.outer(_PERM_A, sh) + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Emit (band_id, band_hash, doc_id) rows (the LSH explode)."""
    rows_band = []
    rows_hash = []
    rows_doc = []
    rpb = _N_PERM // _N_BANDS
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        sig = minhash_signature(text)
        for band in range(_N_BANDS):
            h = hashlib.blake2b(
                sig[band * rpb:(band + 1) * rpb].tobytes(),
                digest_size=8).hexdigest()
            rows_band.append(band)
            rows_hash.append(h)
            rows_doc.append(doc_id)
    return pd.DataFrame({"band_id": rows_band, "band_hash": rows_hash,
                         "doc_id": rows_doc})


def minhash_lsh_pairs(docs_ds, jaccard_threshold: float = 0.8):
    """MinHash-LSH near-dup candidate pairs verified by exact Jaccard.

    Verification joins the pair doc texts via a broadcast dict — valid
    while candidate count is small relative to the corpus (LSH's
    purpose); at 100TB the verify stage becomes a second shuffle keyed
    by doc_id (same semantics).
    """
    import ray

    bands = docs_ds.map_batches(minhash_bands_batch, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        if not out:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    pairs = (bands.groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    pairs_df = pairs.to_pandas().drop_duplicates()
    if len(pairs_df) == 0:
        return pairs_df.assign(jaccard=[])
    texts = dict(zip(*[docs_ds.select_columns(["doc_id", "text"])
                       .to_pandas()[c] for c in ("doc_id", "text")]))
    jac = [
        _jaccard_texts(texts[a], texts[b])
        for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"])
    ]
    pairs_df = pairs_df.assign(jaccard=np.round(jac, 9))
    return pairs_df[pairs_df["jaccard"] >= jaccard_threshold] \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _jaccard_texts(a: str, b: str) -> float:
    sa = set(shingle_hashes(a).tolist())
    sb = set(shingle_hashes(b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash64_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over token crc32 hashes (vectorized bit counting)."""
    out = np.zeros(len(batch), dtype=np.uint64)
    for i, text in enumerate(batch["text"].fillna("")):
        toks = text.split()
        if not toks:
            continue
        hs = np.fromiter((zlib.crc32(t.encode()) for t in toks),
                         dtype=np.uint64, count=len(toks))
        hs = hs | (np.fromiter(
            (zlib.crc32(t.encode()[::-1]) for t in toks),
            dtype=np.uint64, count=len(toks)) << np.uint64(32))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
        counts = bits.sum(axis=0)
        vote = counts * 2 > len(toks)
        out[i] = np.sum(vote.astype(np.uint64)
                        << np.arange(64, dtype=np.uint64))
    batch["simhash"] = out.astype("uint64")
    return batch[["doc_id", "simhash"]]


def simhash_near_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Block-permutation LSH: 4 16-bit chunks as bucket keys; any pair
    within distance 3 shares at least one chunk."""
    sh = docs_ds.map_batches(simhash64_batch, batch_format="pandas")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, h in zip(batch["doc_id"], batch["simhash"]):
            for chunk in range(4):
                key = (int(h) >> (16 * chunk)) & 0xFFFF
                rows.append((chunk, key, doc_id, int(h)))
        return pd.DataFrame(rows, columns=["chunk", "key", "doc_id", "sh"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        recs = sorted(set(zip(g["doc_id"], g["sh"])))
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                d = bin(recs[i][1] ^ recs[j][1]).count("1")
                if d <= max_hamming:
                    out.append((recs[i][0], recs[j][0], d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    res = (sh.map_batches(explode, batch_format="pandas")
           .groupby(["chunk", "key"]).map_groups(pairs,
                                                 batch_format="pandas"))
    df = res.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class EmbeddingNearDup:
    """Actor-pool stage: cosine similarity of each batch against the
    broadcast (normalized) embedding matrix; emits pairs >= threshold."""

    def __init__(self, mat_ref, ids_ref, threshold: float):
        import ray

        self.mat = ray.get(mat_ref)
        self.ids = ray.get(ids_ref)
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.vstack(batch["embedding"].to_numpy())
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = emb @ self.mat.T  # (batch, all)
        out_a = []
        out_b = []
        out_s = []
        vids = batch["vec_id"].to_numpy()
        for i in range(len(vids)):
            hits = np.flatnonzero(sims[i] >= self.threshold)
            for j in hits:
                if self.ids[j] > vids[i]:  # each unordered pair once
                    out_a.append(vids[i])
                    out_b.append(self.ids[j])
                    out_s.append(sims[i, j])
        return pd.DataFrame({"vec_a": out_a, "vec_b": out_b,
                             "cosine": np.round(out_s, 9)})


def embedding_near_dup(emb_ds, threshold: float = 0.95, concurrency: int = 2):
    import ray

    df = emb_ds.to_pandas()
    mat = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(df["vec_id"].to_numpy())
    return emb_ds.map_batches(
        EmbeddingNearDup,
        fn_constructor_args=(mat_ref, ids_ref, threshold),
        batch_format="pandas",
        concurrency=concurrency,
    )
