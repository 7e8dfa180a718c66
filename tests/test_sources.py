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
