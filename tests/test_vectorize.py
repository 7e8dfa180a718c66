"""raster_regions: 4-connectivity labeling semantics on known shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _run(tiles, weights=None, width=8):
    import ray.data as rd

    from proj_ray.spatial.vectorize import raster_regions

    tbl = {"tile": np.asarray(tiles, dtype=np.int64)}
    kw = {}
    if weights is not None:
        tbl["n"] = np.asarray(weights, dtype=np.int64)
        kw["weight_col"] = "n"
    out = raster_regions(rd.from_pandas(pd.DataFrame(tbl)),
                         tile_col="tile", width=width, **kw)
    return out.to_pandas().sort_values("region_id").reset_index(drop=True)


def _tid(tx, ty, width=8):
    return ty * width + tx


def test_l_shape_plus_isolated():
    # L-shape: (1,1),(1,2),(2,2) connected; (5,5) isolated
    tiles = [_tid(1, 1), _tid(1, 2), _tid(2, 2), _tid(5, 5)]
    got = _run(tiles)
    assert len(got) == 2
    l_region = got[got["region_id"] == _tid(1, 1)].iloc[0]
    assert l_region["n_cells"] == 3
    assert (l_region["min_tx"], l_region["max_tx"]) == (1, 2)
    assert (l_region["min_ty"], l_region["max_ty"]) == (1, 2)
    iso = got[got["region_id"] == _tid(5, 5)].iloc[0]
    assert iso["n_cells"] == 1


def test_diagonal_cells_are_separate_regions():
    tiles = [_tid(0, 0), _tid(1, 1)]
    got = _run(tiles)
    assert len(got) == 2


def test_row_edge_does_not_wrap():
    # (7, 0) and (0, 1): tile ids 7 and 8 are adjacent integers but
    # NOT raster neighbors at width=8
    tiles = [_tid(7, 0), _tid(0, 1)]
    got = _run(tiles)
    assert len(got) == 2


def test_weights_sum_per_region():
    tiles = [_tid(1, 1), _tid(2, 1), _tid(6, 6)]
    got = _run(tiles, weights=[10, 20, 5])
    by_id = got.set_index("region_id")
    assert by_id.loc[_tid(1, 1), "n_points"] == 30
    assert by_id.loc[_tid(6, 6), "n_points"] == 5
