"""Text-analysis stages for the flat `documents` table.

Vectorized map_batches bodies (pandas .str / pyarrow compute — no
Python-per-row loops); stateful pieces (compiled regexes, stopword sets)
live in an actor-pool callable class.  Each scorer has an exact DuckDB
mirror used by the driver's oracle (column names match).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[A-Za-z0-9_]+", re.ASCII)
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "on", "for", "with")


_STOP_RE = (r"\b(?:" + "|".join(STOPWORDS) + r")\b")


class TextScorer:
    """Actor-pool stage: quality scoring, token counting, stopword
    stats and a rolling-hash fingerprint per document.

    Fully vectorized over the Arrow batch: RE2 kernels
    (pc.count_substring_regex) for token/stopword counts and the
    NumPy rolling-hash kernel over the raw UTF-8 buffer
    (stages/hashing.py) for the fingerprint — no per-row Python."""

    def __init__(self):
        # patterns are plain strings for the C++ RE2 kernels; keeping
        # them on the instance preserves the actor-pool shape
        self.word_pat = _WORD_RE.pattern
        self.stop_pat = _STOP_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from proj_ray.stages.hashing import rolling_hash_batch

        text = pc.fill_null(batch.column("text"), "")
        lower = pc.utf8_lower(text)
        n_tok = pc.count_substring_regex(text, self.word_pat) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_char = pc.utf8_length(text).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_stop = pc.count_substring_regex(lower, self.stop_pat) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            stop_ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
            mean_len = np.where(n_tok > 0, n_char / n_tok, 0.0)
        quality = np.round(
            np.clip(mean_len / 10.0, 0, 1) * 0.5
            + np.clip(stop_ratio * 5.0, 0, 1) * 0.5, 9)
        cols = dict(zip(batch.column_names, batch.columns))
        cols["token_count"] = pa.array(n_tok)
        cols["char_count"] = pa.array(n_char)
        cols["stop_count"] = pa.array(n_stop)
        cols["stop_ratio"] = pa.array(stop_ratio)
        cols["quality_score"] = pa.array(quality)
        cols["fingerprint"] = pa.array(rolling_hash_batch(text))
        return pa.table(cols)


_SCORER = None


def text_scorer_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches wrapper around a process-cached TextScorer
    (task pools reuse worker processes, so the scorer builds once per
    worker without paying actor-pool startup on every query)."""
    global _SCORER
    if _SCORER is None:
        _SCORER = TextScorer()
    return _SCORER(batch)


def rolling_hash(s: str, base: int = 257, mod: int = 1 << 64) -> int:
    """Scalar reference of the vectorized fingerprint
    (hashing.rolling_hash_batch); kept for tests."""
    h = 0
    for ch in s.encode():
        h = (h * base + ch) % mod
    return h


def ngram_set(text: str, n: int = 3):
    """Character n-gram shingle set."""
    b = text.encode()
    return {b[i:i + n] for i in range(max(1, len(b) - n + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def lang_id_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic language ID from character-frequency profiles.

    Not a model — a deterministic n-gram/charclass scorer good enough to
    exercise the distributed plumbing; scored against the `lang` column
    in tests for sanity, not exactness."""
    text = batch["text"].fillna("").str.lower()

    markers = {
        "en": [" the ", " and ", " of "],
        "de": [" der ", " und ", " die "],
        "fr": [" le ", " la ", " et "],
        "es": [" el ", " los ", " que "],
        "zh": [],
    }
    scores = {}
    for lang, pats in markers.items():
        s = np.zeros(len(text))
        for p in pats:
            s = s + text.str.count(re.escape(p)).to_numpy()
        scores[lang] = s
    # zh marker: CJK characters
    cjk = text.str.count(r"[一-鿿]").to_numpy()
    scores["zh"] = cjk * 10.0
    mat = np.vstack([scores[lg] for lg in markers])
    langs = np.array(list(markers))
    best = langs[np.argmax(mat, axis=0)]
    best = np.where(mat.max(axis=0) == 0, "unknown", best)
    batch["lang_pred"] = best
    return batch


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", table A1 — published heuristics),
    adapted to whitespace-token documents:

      dup_token_frac  = 1 - distinct_tokens / n_tokens
      top2gram_count  = occurrences of the most frequent token 2-gram
      top2gram_frac   = top2gram_count / (n_tokens - 1)

    Fully vectorized: one Arrow split_pattern per batch, token hashes
    from the NumPy rolling-hash kernel over the flattened token
    column, then lexsort + run-length math for per-doc distinct and
    per-(doc, 2-gram) counts — no per-row Python."""
    import pyarrow.compute as pc

    from proj_ray.stages.hashing import rolling_hash_batch

    text = pc.fill_null(batch.column("text"), "")
    toks = pc.split_pattern(text, " ").combine_chunks()
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    off = toks.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(off)
    n_docs = len(batch)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    h = rolling_hash_batch(flat)

    # distinct tokens per doc: sort (doc, hash), count run starts
    n_distinct = np.zeros(n_docs, dtype=np.int64)
    if len(h):
        order = np.lexsort((h, doc_idx))
        ds_, hs = doc_idx[order], h[order]
        new = np.empty(len(h), dtype=bool)
        new[0] = True
        new[1:] = (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])
        np.add.at(n_distinct, ds_[new], 1)

    # 2-grams: adjacent token pairs within a doc
    top2 = np.zeros(n_docs, dtype=np.int64)
    if len(h) > 1:
        same = doc_idx[1:] == doc_idx[:-1]
        gd = doc_idx[:-1][same]
        PHI = np.uint64(0x9E3779B97F4A7C15)
        gh = (h[:-1][same] * PHI) ^ h[1:][same]
        if len(gh):
            order = np.lexsort((gh, gd))
            gds, ghs = gd[order], gh[order]
            new = np.empty(len(gh), dtype=bool)
            new[0] = True
            new[1:] = (gds[1:] != gds[:-1]) | (ghs[1:] != ghs[:-1])
            run_starts = np.flatnonzero(new)
            run_len = np.diff(np.append(run_starts, len(gh)))
            run_doc = gds[run_starts]
            doc_new = np.empty(len(run_doc), dtype=bool)
            doc_new[0] = True
            doc_new[1:] = run_doc[1:] != run_doc[:-1]
            doc_first = np.flatnonzero(doc_new)
            top2[run_doc[doc_first]] = np.maximum.reduceat(run_len,
                                                           doc_first)

    n_tok = counts.astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        dup_frac = np.where(n_tok > 0, 1.0 - n_distinct / n_tok, 0.0)
        top2_frac = np.where(n_tok > 1, top2 / (n_tok - 1), 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tok": pa.array(n_tok),
        "n_distinct": pa.array(n_distinct),
        "dup_token_frac": pa.array(np.round(dup_frac, 9)),
        "top2gram_count": pa.array(top2),
        "top2gram_frac": pa.array(np.round(top2_frac, 9)),
    })


def benchmark_ngram_set(texts, n: int = 3) -> np.ndarray:
    """Sorted unique token-n-gram hashes of a benchmark document list
    (driver-side: benchmarks are small by definition)."""
    from proj_ray.stages.hashing import rolling_hash_batch

    grams = []
    PHI = np.uint64(0x9E3779B97F4A7C15)
    for text in texts:
        toks = pa.array((text or "").split(" "))
        h = rolling_hash_batch(toks)
        if len(h) < n:
            continue
        g = h[: len(h) - n + 1].copy()
        for k in range(1, n):
            g = (g * PHI) ^ h[k: len(h) - n + 1 + k]
        grams.append(g)
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(grams))


def contamination_flags(ds, bench_ref, n: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id"):
    """Benchmark decontamination: flag every corpus document sharing
    at least one token n-gram with the broadcast benchmark set (the
    published pretraining-hygiene filter, e.g. GPT-3 appendix C /
    Gopher app. A: 'n-gram overlap with eval sets').

    One corpus pass: per batch, the document token stream hashes once
    (rolling-hash over the flattened token column), n-gram hashes form
    by shifted mixing, and membership resolves with one searchsorted
    against the per-worker cached benchmark set.  Output: (id,
    contaminated, n_hits)."""
    from proj_ray.stages.worker_cache import get_broadcast

    def flag(t: pa.Table) -> pa.Table:
        bench = get_broadcast(bench_ref)
        hits = contamination_hits_batch(t, bench, n, text_col)
        return pa.table({
            id_col: t.column(id_col),
            "contaminated": pa.array(hits > 0),
            "n_hits": pa.array(hits),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def contamination_hits_batch(t: pa.Table, bench: np.ndarray, n: int,
                             text_col: str = "text") -> np.ndarray:
    """Per-row benchmark n-gram hit counts (the batch core of
    contamination_flags; cross-document grams invalidated)."""
    import pyarrow.compute as pc

    from proj_ray.stages.hashing import rolling_hash_batch

    PHI = np.uint64(0x9E3779B97F4A7C15)
    text = pc.fill_null(t.column(text_col), "")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    off = toks.offsets.to_numpy(zero_copy_only=False)
    h = rolling_hash_batch(flat)
    n_docs = len(t)
    hits = np.zeros(n_docs, dtype=np.int64)
    if len(h) >= n and len(bench):
        # n-gram hashes at every position, then invalidate the ones
        # that straddle a document boundary
        m = len(h) - n + 1
        g = h[:m].copy()
        for k in range(1, n):
            g = (g * PHI) ^ h[k: m + k]
        pos = np.arange(m)
        doc_idx = np.searchsorted(off, pos, side="right") - 1
        in_doc = pos + n <= off[doc_idx + 1]
        p = np.searchsorted(bench, g)
        pc_ = np.minimum(p, len(bench) - 1)
        member = (bench[pc_] == g) & in_doc
        np.add.at(hits, doc_idx[member], 1)
    return hits


def unigram_logprob(ds, freq_ref, total_tokens: int,
                    text_col: str = "text", id_col: str = "doc_id",
                    alpha: float = 1.0, vocab_size: int | None = None):
    """Per-document mean unigram negative log-probability — the
    classic LM-score quality filter (documents far from the corpus
    distribution score high).  Token probabilities are Laplace-
    smoothed corpus frequencies: p(w) = (c(w) + alpha) /
    (total + alpha * V).  `freq_ref` broadcasts the (sorted token
    hashes, counts) table built by one corpus pass."""
    import pyarrow.compute as pc

    from proj_ray.stages.hashing import rolling_hash_batch
    from proj_ray.stages.worker_cache import get_broadcast

    def score(t: pa.Table) -> pa.Table:
        vocab, cnts = get_broadcast(freq_ref)
        counts, mean = unigram_nll_batch(t, vocab, cnts, total_tokens,
                                         alpha, vocab_size, text_col)
        return pa.table({
            id_col: t.column(id_col),
            "n_tok": pa.array(counts.astype(np.int64)),
            "mean_nll": pa.array(np.round(mean, 9)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_nll_batch(t: pa.Table, vocab: np.ndarray,
                      cnts: np.ndarray, total_tokens: int,
                      alpha: float = 1.0,
                      vocab_size: int | None = None,
                      text_col: str = "text"):
    """(token counts, mean negative log-prob) per row — the batch core
    of unigram_logprob."""
    import pyarrow.compute as pc

    from proj_ray.stages.hashing import rolling_hash_batch

    V = vocab_size if vocab_size is not None else len(vocab)
    denom = float(total_tokens) + alpha * V
    text = pc.fill_null(t.column(text_col), "")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    off = toks.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(off)
    h = rolling_hash_batch(flat)
    if len(h):
        p = np.searchsorted(vocab, h)
        pc_ = np.minimum(p, max(len(vocab) - 1, 0))
        c = np.where((len(vocab) > 0) & (vocab[pc_] == h),
                     cnts[pc_] if len(vocab) else 0, 0)
        nll = -np.log((c + alpha) / denom)
        doc_idx = np.repeat(np.arange(len(t)), counts)
        tot = np.bincount(doc_idx, weights=nll, minlength=len(t))
    else:
        tot = np.zeros(len(t))
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(counts > 0, tot / counts, 0.0)
    return counts, mean
