"""Checkpoint/resume: partitioned writes, manifests, skip-on-resume,
and config-hash invalidation."""

import os

import pyarrow as pa
import pytest

from proj_ray.state.checkpoint import CheckpointWriter, run_partitioned


def make_table(pid: str) -> pa.Table:
    n = int(pid) + 1
    return pa.table({"x": list(range(n)), "part": [pid] * n})


def test_write_resume_skip(tmp_path):
    root = str(tmp_path / "out")
    parts = [str(i) for i in range(5)]
    calls = []

    def tracked(pid):
        calls.append(pid)
        return make_table(pid)

    w, computed, skipped = run_partitioned(parts, tracked, root,
                                           config={"v": 1})
    assert computed == 5 and skipped == 0
    # resume: nothing recomputed
    calls.clear()
    w, computed, skipped = run_partitioned(parts, tracked, root,
                                           config={"v": 1})
    assert computed == 0 and skipped == 5 and calls == []
    # config change invalidates
    w, computed, skipped = run_partitioned(parts, tracked, root,
                                           config={"v": 2})
    assert computed == 5
    # data integrity
    total = w.read_all()
    assert total.num_rows == sum(range(1, 6))
    assert len(w.manifests()) == 5


def test_partial_failure_resume(tmp_path):
    root = str(tmp_path / "out")
    parts = [str(i) for i in range(4)]

    def flaky(pid):
        if pid == "2":
            raise RuntimeError("boom")
        return make_table(pid)

    with pytest.raises(RuntimeError):
        run_partitioned(parts, flaky, root, config={"v": 1})
    w = CheckpointWriter(root, {"v": 1})
    assert w.pending(parts) == ["2", "3"]
    # no torn output for the failed partition
    assert not os.path.exists(os.path.join(root, "part=2"))
    w2, computed, skipped = run_partitioned(parts, make_table, root,
                                            config={"v": 1})
    assert computed == 2 and skipped == 2


def test_resumable_flagship_matches_oneshot_and_skips(tmp_path,
                                                      ray_session):
    import os

    import pandas as pd

    from proj_ray.pipelines.flagship import flagship, resumable_flagship

    root = str(tmp_path / "ckpt")
    n_docs, n_shards = 4000, 4

    tiles, computed, skipped = resumable_flagship(
        n_docs, n_shards, root, parallelism=2)
    assert (computed, skipped) == (4, 0)

    # the sharded, checkpointed answer equals the one-shot pipeline
    want = flagship(n_docs=n_docs, parallelism=4).to_pandas() \
        .sort_values("tile").reset_index(drop=True)
    got = tiles.to_pandas().sort_values("tile").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_exact=False, rtol=1e-12)

    # resume: nothing recomputes
    _, computed, skipped = resumable_flagship(
        n_docs, n_shards, root, parallelism=2)
    assert (computed, skipped) == (0, 4)

    # kill one shard's manifest -> exactly that shard recomputes and
    # the combined answer is unchanged
    victim = [f for f in os.listdir(root) if f.endswith(".json")][1]
    os.remove(os.path.join(root, victim))
    tiles2, computed, skipped = resumable_flagship(
        n_docs, n_shards, root, parallelism=2)
    assert (computed, skipped) == (1, 3)
    got2 = tiles2.to_pandas().sort_values("tile").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2[want.columns.tolist()], want, check_exact=False,
        rtol=1e-12)


def test_job_entrypoint_resume(tmp_path, ray_session, capsys):
    """python -m proj_ray.job flagship: fresh run computes all shards,
    re-submission skips them all (the ray-job-submit resume story)."""
    import json

    from proj_ray.job import main

    root = str(tmp_path / "jobckpt")
    assert main(["flagship", "--n-docs", "1500", "--shards", "3",
                 "--root", root, "--parallelism", "2"]) == 0
    first = json.loads(capsys.readouterr().out.strip())
    assert (first["shards_computed"], first["shards_skipped"]) == (3, 0)

    assert main(["flagship", "--n-docs", "1500", "--shards", "3",
                 "--root", root, "--parallelism", "2"]) == 0
    second = json.loads(capsys.readouterr().out.strip())
    assert (second["shards_computed"], second["shards_skipped"]) == (0, 3)
    assert second["tiles"] == first["tiles"]


def test_job_entrypoint_query_writes_parquet(tmp_path, ray_session,
                                             capsys):
    import json
    import os

    import pyarrow.parquet as pq

    from proj_ray.job import main

    out_dir = str(tmp_path / "out")
    assert main(["query", "--name", "lineitem_agg",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--output", out_dir]) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["rows"] == 6
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    total = sum(pq.ParquetFile(os.path.join(out_dir, f))
                .metadata.num_rows for f in files)
    assert total == 6
