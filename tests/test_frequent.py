"""Heavy hitters: exact token counts and the Misra-Gries guarantee."""

import numpy as np
import pandas as pd


def _corpus(seed=17, n_docs=300):
    """Zipf-ish token stream with known counts."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(200)]
    probs = 1.0 / np.arange(1, 201)
    probs /= probs.sum()
    docs = []
    for _ in range(n_docs):
        toks = rng.choice(vocab, size=rng.integers(5, 40), p=probs)
        docs.append(" ".join(toks))
    return pd.DataFrame({"text": docs})


def _true_counts(df):
    s = df["text"].str.split(" ").explode()
    return s.value_counts()


def test_exact_frequent_matches_pandas():
    import ray.data as rd

    from proj_ray.stages.frequent import exact_frequent

    df = _corpus()
    truth = _true_counts(df)
    total = truth.sum()
    frac = 0.01
    got = exact_frequent(rd.from_pandas(df), text_col="text",
                         min_frac=frac).to_pandas() \
        .set_index("tok")["n_tok"].sort_index()
    want = truth[truth >= frac * total].sort_index()
    assert (got.index == want.index).all()
    assert (got.to_numpy() == want.to_numpy()).all()


def test_misra_gries_guarantee():
    """Every token with frequency > N/(k+1) survives, and estimates
    undercount by at most N/(k+1)."""
    import ray.data as rd

    from proj_ray.stages.frequent import misra_gries

    df = _corpus(seed=3)
    truth = _true_counts(df)
    n_total = truth.sum()
    k = 20
    out = misra_gries(rd.from_pandas(df).repartition(7),
                      text_col="text", k=k).to_pandas() \
        .set_index("tok")["est"]
    bound = n_total / (k + 1)
    heavy = truth[truth > bound]
    for tok, true_n in heavy.items():
        assert tok in out.index, f"heavy hitter {tok} dropped"
    for tok, est in out.items():
        true_n = truth.get(tok, 0)
        assert est <= true_n, f"{tok} overcounted: {est} > {true_n}"
        assert true_n - est <= bound + 1e-9


def test_tfidf_matches_sklearn_style_reference():
    import ray.data as rd

    from proj_ray.stages.frequent import tfidf_terms

    df = _corpus(seed=29, n_docs=120)
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    out = tfidf_terms(rd.from_pandas(df), id_col="doc_id",
                      text_col="text", min_tf=2).to_pandas()
    # driver-side reference
    toks = df.set_index("doc_id")["text"].str.split(" ").explode()
    tf = toks.groupby([toks.index, toks.values]).size()
    dfreq = toks.groupby(toks.values).apply(
        lambda s: s.index.nunique())
    n = len(df)
    for (doc, tok), tfv in tf.items():
        if tfv < 2:
            continue
        want = round(tfv * np.log(n / dfreq[tok]), 6)
        got = out[(out["doc_id"] == doc) & (out["tok"] == tok)]
        assert len(got) == 1
        assert abs(got["tfidf"].iloc[0] - want) < 1e-9
    assert (out["tf"] >= 2).all()


def test_count_min_bounds(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from proj_ray.stages.frequent import (count_min_build,
                                          count_min_query)

    # zipf-ish corpus with known counts
    rng = np.random.default_rng(2)
    vocab = [f"tok{i}" for i in range(500)]
    probs = 1.0 / np.arange(1, 501)
    probs /= probs.sum()
    docs = []
    true = {v: 0 for v in vocab}
    for _ in range(400):
        toks = rng.choice(vocab, size=50, p=probs)
        for tk in toks:
            true[tk] += 1
        docs.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(6)
    sketch, total = count_min_build(ds, "text", width=2048, depth=5)
    assert total == 400 * 50
    query = [f"tok{i}" for i in (0, 1, 5, 50, 499)]
    est = count_min_query(sketch, query)
    eps_n = np.e / 2048 * total
    for q, e in zip(query, est):
        assert e >= true[q]                 # never underestimates
        assert e <= true[q] + eps_n         # CM guarantee
    # top token is estimated tightly on this width
    assert est[0] <= true["tok0"] * 1.05 + 10
