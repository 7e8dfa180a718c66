"""Spatial core correctness: span extraction, PIP joins (broadcast vs
shuffle vs brute force, salted vs unsalted), rect join + tiles + cells +
kNN against DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from proj_ray.docs.synth import (
    make_doc_batch,
    span_layout,
    sql_coords_cte,
    doc_dataset,
)
from proj_ray.docs.spans import extract_coords_batch, verify_span_invariant
from proj_ray.spatial.cells import grid_cell, s2_cell, s2_parent, \
    sql_grid_cell_expr
from proj_ray.spatial.join import (
    broadcast_pip_join,
    detect_hot_cells,
    rect_join_batch,
    shuffle_pip_join,
)
from proj_ray.spatial.knn import (
    haversine_m,
    knn_brute,
    knn_cell_ring,
    make_queries,
)
from proj_ray.spatial.pip import make_polygons, make_rects, \
    points_in_polygon, sql_rects_cte
from proj_ray.spatial.tiles import sql_tile_exprs, tile_xy

N_DOCS = 2000
IDS = np.arange(N_DOCS, dtype=np.int64)


@pytest.fixture(scope="module")
def coords():
    lay = span_layout(IDS)
    mask = lay["kind_code"] == 1
    return {
        "doc_id": np.array([f"doc-{d:012d}" for d in lay["doc_idx"][mask]]),
        "offset": lay["offset"][mask],
        "lon": lay["lon"][mask],
        "lat": lay["lat"][mask],
    }


@pytest.fixture(scope="module")
def coords_ds(ray_session, coords):
    t = pa.table({
        "doc_id": coords["doc_id"],
        "offset": pa.array(coords["offset"], type=pa.int32()),
        "lon": coords["lon"],
        "lat": coords["lat"],
    })
    return rd.from_arrow(t)


def test_extract_matches_layout(coords):
    batch = make_doc_batch(IDS)
    flat = extract_coords_batch(batch)
    assert flat.num_rows == len(coords["lon"])
    assert np.array_equal(flat.column("lon").to_numpy(), coords["lon"])
    assert np.array_equal(flat.column("lat").to_numpy(), coords["lat"])
    assert flat.column("doc_id").to_pylist() == list(coords["doc_id"])


def test_span_invariant_roundtrip(ray_session):
    before = doc_dataset(500, parallelism=4)
    after = doc_dataset(500, parallelism=8)  # different partitioning
    assert verify_span_invariant(before, after)


def test_span_invariant_detects_mutation(ray_session):
    """A single mutated span text must flip the streaming checksum."""
    import pyarrow as pa

    before = doc_dataset(200, parallelism=4)

    def corrupt(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        texts = flat.field("text").to_pylist()
        texts[0] = texts[0] + "!"
        off = spans.offsets
        fixed = pa.StructArray.from_arrays(
            [flat.field("kind"), pa.array(texts),
             flat.field("media_ref"), flat.field("offset")],
            names=["kind", "text", "media_ref", "offset"])
        newspans = pa.ListArray.from_arrays(off, fixed)
        return t.set_column(t.schema.get_field_index("spans"), "spans",
                            newspans)

    after = doc_dataset(200, parallelism=4) \
        .map_batches(corrupt, batch_format="pyarrow")
    assert not verify_span_invariant(before, after)


def test_grid_cell_sql(coords):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM range(%d) t(doc_id)"
                % N_DOCS)
    expr = sql_grid_cell_expr("lon", "lat", 5.0)
    q = "WITH " + sql_coords_cte() + \
        f" SELECT doc_id, off, {expr} AS cell FROM coords ORDER BY doc_id, off"
    rows = con.execute(q).fetchnumpy()
    mine = grid_cell(coords["lon"], coords["lat"], 5.0)
    assert np.array_equal(rows["cell"], mine)


def test_s2_cell_hierarchy():
    lon = np.array([-122.42, 2.35, 139.69, 0.0, 179.99, -179.99])
    lat = np.array([37.77, 48.86, 35.69, -89.9, 0.0, 0.0])
    c8 = s2_cell(lon, lat, 8)
    c12 = s2_cell(lon, lat, 12)
    assert np.array_equal(s2_parent(c12, 12, 8), c8)
    # nearby points share a parent cell at coarse level
    c4a = s2_cell(np.array([10.0]), np.array([50.0]), 4)
    c4b = s2_cell(np.array([10.01]), np.array([50.01]), 4)
    assert c4a[0] == c4b[0]


def test_tiles_sql(coords):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM range(%d) t(doc_id)"
                % N_DOCS)
    for zoom in (2, 8, 12):
        txs, tys = sql_tile_exprs("lon", "lat", zoom)
        q = "WITH " + sql_coords_cte() + \
            f" SELECT {txs} AS tx, {tys} AS ty FROM coords ORDER BY doc_id, off"
        rows = con.execute(q).fetchnumpy()
        tx, ty = tile_xy(coords["lon"], coords["lat"], zoom)
        assert np.array_equal(rows["tx"], tx), f"zoom {zoom} tx"
        assert np.array_equal(rows["ty"], ty), f"zoom {zoom} ty"


def test_tile_edge_cases():
    tx, ty = tile_xy(np.array([-180.0, 180.0, 0.0]),
                     np.array([85.05112878, -85.05112878, 0.0]), 2)
    assert list(tx) == [0, 3, 2]
    assert list(ty) == [0, 3, 2]


def _brute_pip(coords, polygons):
    rows = set()
    for pi, ring in enumerate(polygons["rings"]):
        hit = points_in_polygon(coords["lon"], coords["lat"], ring)
        for i in np.flatnonzero(hit):
            rows.add((coords["doc_id"][i], int(coords["offset"][i]),
                      polygons["polygon_id"][pi]))
    return rows


def test_broadcast_pip_join_vs_brute(ray_session, coords_ds, coords):
    polys = make_polygons(48)
    out = broadcast_pip_join(coords_ds, polys).to_pandas()
    got = set(zip(out["doc_id"], out["offset"], out["polygon_id"]))
    want = _brute_pip(coords, polys)
    assert got == want
    assert len(want) > 50  # fixture actually exercises the join


def test_shuffle_pip_join_matches_broadcast(ray_session, coords_ds, coords):
    polys = make_polygons(48)
    want = _brute_pip(coords, polys)
    out = shuffle_pip_join(coords_ds, polys).to_pandas()
    got = set(zip(out["doc_id"], out["offset"], out["polygon_id"]))
    assert got == want
    # salted variant must produce identical rows
    salt = {int(c): 4 for c in
            np.unique(grid_cell(coords["lon"], coords["lat"], 5.0))[:5]}
    out2 = shuffle_pip_join(coords_ds, polys, salt=salt).to_pandas()
    got2 = set(zip(out2["doc_id"], out2["offset"], out2["polygon_id"]))
    assert got2 == want


def test_skew_detection(ray_session, coords_ds):
    hot = detect_hot_cells(coords_ds, sample_fraction=0.5, hot_factor=4.0)
    # the synthetic hotspots guarantee at least one hot cell
    assert len(hot) >= 1
    assert all(v >= 2 for v in hot.values())


def test_rect_join_vs_duckdb(coords):
    rects = make_rects(64)
    batch = pa.table({
        "doc_id": coords["doc_id"],
        "offset": pa.array(coords["offset"], type=pa.int32()),
        "lon": coords["lon"],
        "lat": coords["lat"],
    })
    out = rect_join_batch(batch, rects)
    got = set(zip(out.column("doc_id").to_pylist(),
                  out.column("off").to_pylist(),
                  out.column("rect_id").to_pylist()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM range(%d) t(doc_id)"
                % N_DOCS)
    q = ("WITH " + sql_coords_cte() + ", " + sql_rects_cte()
         + """ SELECT printf('doc-%012d', c.doc_id) AS doc_id, c.off,
                      r.rect_id
               FROM coords c JOIN rects r
                 ON c.lon >= r.lon_min AND c.lon < r.lon_max
                AND c.lat >= r.lat_min AND c.lat < r.lat_max""")
    want = set(map(tuple, con.execute(q).fetchall()))
    assert got == want
    assert len(want) > 50


def test_knn_brute_vs_cell_ring(ray_session, coords_ds, coords):
    queries = make_queries(20)
    brute = knn_brute(coords_ds, queries, k=5).to_pandas()
    ring = knn_cell_ring(coords_ds, queries, k=5, res_deg=5.0).to_pandas()
    b = brute.sort_values(["query_id", "rank"]).reset_index(drop=True)
    r = ring.sort_values(["query_id", "rank"]).reset_index(drop=True)
    # karney vs haversine metrics differ; compare ring against a direct
    # karney brute force instead
    brute_k = knn_brute(coords_ds, queries, k=5,
                        metric="karney").to_pandas()
    bk = brute_k.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(r) == len(bk)
    assert (r["doc_id"].values == bk["doc_id"].values).all()
    assert np.allclose(r["dist_m"].values, bk["dist_m"].values)
    assert len(b) == 20 * 5


def test_isea_hex_cells_equal_area_and_containment(ray_session):
    """Hex DGGS cells: every point within one circumradius of its cell
    center in the ISEA plane; occupancy flat across latitude bands
    (equal-area, unlike the lon/lat grid)."""
    import numpy as np

    from proj_ray.pipeline import transform_arrays
    from proj_ray.spatial.cells import (_HEX_BASE_M, _SQRT3, _isea,
                                        isea_hex_cell,
                                        isea_hex_center_plane)

    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 5000)
    lat = rng.uniform(-85, 85, 5000)
    res = 6
    cells = isea_hex_cell(lon, lat, resolution=res)
    cx, cy = isea_hex_center_plane(cells)
    c = transform_arrays(_isea(), lon, lat)
    size = _HEX_BASE_M / (_SQRT3 ** res)
    assert (np.hypot(c.x - cx, c.y - cy) <= size * 1.0000001).all()
    # determinism + hierarchy: coarser resolution has fewer cells
    assert (isea_hex_cell(lon, lat, resolution=res) == cells).all()
    coarse = isea_hex_cell(lon, lat, resolution=res - 2)
    assert len(np.unique(coarse)) < len(np.unique(cells))
    # equal-area: points-per-cell flat across latitude bands
    import collections
    rates = []
    for b in ((-85, -45), (-45, 0), (0, 45), (45, 85)):
        m = (lat >= b[0]) & (lat < b[1])
        cc = collections.Counter(cells[m])
        rates.append(np.mean(list(cc.values())))
    assert max(rates) / min(rates) < 1.4
