"""Source/sink contract and DMS text ingestion."""

import numpy as np
import pytest

from proj_ray.sources.dms import dms_to_degrees, parse_dms_batch


def test_dms_to_degrees_grammar():
    cases = [
        ("45d30'30.5\"N", 45 + 30 / 60 + 30.5 / 3600),
        ("45d30'30.5\"S", -(45 + 30 / 60 + 30.5 / 3600)),
        ("122d25W", -(122 + 25 / 60)),
        ("12d30 15", 12 + 30 / 60 + 15 / 3600),
        ("-45.5", -45.5),
        ("0.5r", np.degrees(0.5)),
        ("30'", 0.5),
        ("45°30'", 45.5),
        ("garbage", np.nan),
        ("", np.nan),
    ]
    got = dms_to_degrees([c[0] for c in cases])
    for (s, want), g in zip(cases, got):
        if np.isnan(want):
            assert np.isnan(g), s
        else:
            assert g == pytest.approx(want, abs=1e-12), s


def test_parse_dms_batch_ray(ray_session, tmp_path):
    import pyarrow as pa
    import ray

    from proj_ray.sources.io import read_table, write_table

    ds = ray.data.from_arrow(pa.table({
        "lon_txt": ["122d25'W", "2d21'3\"E"],
        "lat_txt": ["37d46'30\"N", "48d51'24\"N"],
    }))
    out = ds.map_batches(parse_dms_batch, batch_format="pyarrow")
    write_table(out, str(tmp_path / "t"))
    back = read_table(str(tmp_path / "t"),
                      columns=["lon", "lat"]).to_pandas()
    assert len(back) == 2
    assert back["lon"].min() == pytest.approx(-(122 + 25 / 60))
    assert back["lat"].max() == pytest.approx(48 + 51 / 60 + 24 / 3600)


def test_lance_gate():
    from proj_ray.sources.io import _lance_available, read_table

    if not _lance_available():
        with pytest.raises(NotImplementedError):
            read_table("/tmp/nope", table_format="lance")
    with pytest.raises(ValueError):
        read_table("/tmp/nope", table_format="orc")


def test_pluggable_filesystem_and_format(ray_session, tmp_path):
    """The PROJ_FILE_API analogue: a registered scheme resolves to a
    filesystem factory and a registered format routes reads/writes."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from proj_ray.sources.io import (read_table, register_filesystem,
                                     register_table_format,
                                     resolve_path, write_table)

    # scheme -> SubTreeFileSystem rooted at tmp_path
    def factory():
        from pyarrow import fs

        return fs.SubTreeFileSystem(str(tmp_path), fs.LocalFileSystem())

    register_filesystem("vault", factory)
    fsys, p = resolve_path("vault://inner/table")
    assert fsys is not None and p == "inner/table"
    # unregistered schemes pass through for pyarrow's own handling
    assert resolve_path("s3://bucket/x") == (None, "s3://bucket/x")

    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    write_table(rd.from_arrow(tbl), "vault://t1")
    back = read_table("vault://t1", columns=["a"]).to_pandas()
    assert sorted(back["a"]) == [1, 2, 3] and list(back.columns) == ["a"]

    # a custom format: plain pyarrow parquet file reader/writer
    def reader(path, columns=None, filesystem=None, **kw):
        return rd.from_arrow(pq.read_table(path, columns=columns))

    def writer(ds, path, partition_cols=None, filesystem=None, **kw):
        pq.write_table(pa.concat_tables(
            b for b in ds.iter_batches(batch_format="pyarrow")), path)

    register_table_format("pqfile", reader, writer)
    write_table(rd.from_arrow(tbl), str(tmp_path / "one.pq"),
                table_format="pqfile")
    got = read_table(str(tmp_path / "one.pq"),
                     table_format="pqfile").to_pandas()
    assert len(got) == 3
