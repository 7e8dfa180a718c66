"""Resumable corpus curation (VERDICT r4 ask #5): a run killed after N
shards must resume — recomputing ONLY the missing shards — to the
byte-identical summary of the one-shot pipeline."""

import numpy as np
import pandas as pd
import pytest


def _summary_df(tbl) -> pd.DataFrame:
    df = tbl.to_pandas() if hasattr(tbl, "to_pandas") else tbl
    return df.sort_values(["split", "lang"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def oneshot(ray_session):
    from proj_ray.pipelines.queries import q_corpus_curation

    return _summary_df(q_corpus_curation("/root/testdata/sf0.001"))


def test_resumable_matches_oneshot(ray_session, tmp_path, oneshot):
    from proj_ray.pipelines.curation import resumable_corpus_curation

    tbl, computed, skipped = resumable_corpus_curation(
        "/root/testdata/sf0.001", str(tmp_path / "ckpt"), n_shards=5)
    assert computed == 5 and skipped == 0
    got = _summary_df(tbl)
    pd.testing.assert_frame_equal(got, oneshot)


def test_kill_after_n_shards_resumes_identically(
        ray_session, tmp_path, oneshot):
    """A run that stops after 2 of 5 shards (max_shards_per_run — the
    checkpoint state is indistinguishable from a kill between shard
    groups) must resume by recomputing ONLY the 3 missing shards and
    still reproduce the one-shot summary."""
    import proj_ray.pipelines.curation as cur

    root = str(tmp_path / "ckpt2")
    with pytest.raises(cur.IncompleteRunError, match="3 of 5"):
        cur.resumable_corpus_curation("/root/testdata/sf0.001", root,
                                      n_shards=5, max_shards_per_run=2)

    # resume: the two finished shards must be skipped, the summary
    # must equal the one-shot pipeline's
    tbl, computed, skipped = cur.resumable_corpus_curation(
        "/root/testdata/sf0.001", root, n_shards=5)
    assert skipped == 2 and computed == 3
    pd.testing.assert_frame_equal(_summary_df(tbl), oneshot)


def test_second_run_skips_everything(ray_session, tmp_path, oneshot):
    from proj_ray.pipelines.curation import resumable_corpus_curation

    root = str(tmp_path / "ckpt3")
    resumable_corpus_curation("/root/testdata/sf0.001", root,
                              n_shards=3)
    tbl, computed, skipped = resumable_corpus_curation(
        "/root/testdata/sf0.001", root, n_shards=3)
    assert computed == 0 and skipped == 3
    pd.testing.assert_frame_equal(_summary_df(tbl), oneshot)


def test_config_change_invalidates(ray_session, tmp_path):
    """A different shard count is a different config hash — stale
    manifests must not mask a re-run."""
    from proj_ray.pipelines.curation import resumable_corpus_curation

    root = str(tmp_path / "ckpt4")
    resumable_corpus_curation("/root/testdata/sf0.001", root,
                              n_shards=2)
    _, computed, skipped = resumable_corpus_curation(
        "/root/testdata/sf0.001", root, n_shards=4)
    assert computed == 4 and skipped == 0
