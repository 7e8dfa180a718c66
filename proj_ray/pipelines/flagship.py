"""The flagship end-to-end pipeline (BASELINE.json north_star):

interleaved doc table -> span/coordinate extraction -> CRS transform
(webmerc kernel) -> cell encoding -> spatial join (broadcast polygon
index; shuffle variant optional) -> raster-tile assignment ->
per-tile assembly with join-match counts.

Everything is ONE streaming Dataset pipeline: synthesis, extraction,
transform, cell/tile encoding and the join probe are fused map_batches
stages; the only all-to-all exchange is the final small groupby(tile)
over pre-aggregated partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from proj_ray.docs.spans import extract_coords_batch
from proj_ray.docs.synth import doc_dataset, doc_dataset_from_documents
from proj_ray.pipeline import create_operation, transform_arrays
from proj_ray.spatial.cells import grid_cell
from proj_ray.spatial.pip import PolygonIndex, make_polygons
from proj_ray.spatial.tiles import tile_xy


# worker-process-level state cache: stateless tasks reuse warm worker
# processes across datasets, so the index fetch + kernel setup happen
# once per worker instead of once per actor-pool spin-up
_WORKER_STATE: dict = {}


def _get_state(index_ref, zoom: int):
    import ray

    key = (getattr(index_ref, "hex", lambda: id(index_ref))(), zoom)
    st = _WORKER_STATE.get(key)
    if st is None:
        index = (ray.get(index_ref)
                 if not isinstance(index_ref, PolygonIndex) else index_ref)
        st = (index,
              create_operation("+proj=webmerc +ellps=WGS84"),
              create_operation("+proj=utm +zone=32 +ellps=WGS84"))
        _WORKER_STATE.clear()  # only ever one live config per worker
        _WORKER_STATE[key] = st
    return st


def transform_join_tile(batch: pa.Table, index_ref, zoom: int) -> pa.Table:
    """Fused stage: webmerc + exact transverse-mercator transforms +
    cell + tile + PIP probe, emitting per-tile partial aggregates
    (combiner before the shuffle)."""
    index, proj, utm = _get_state(index_ref, zoom)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    c = transform_arrays(proj, lon, lat)
    cu = transform_arrays(utm, lon, lat)  # Poder/Engsager series kernel
    ux = np.where(np.isfinite(cu.x), cu.x, 0.0)
    tx, ty = tile_xy(lon, lat, zoom)
    return _partials(index, zoom, lon, lat, c, tx, ty, ux)


class TransformJoinTile:
    """Actor-pool variant of the fused stage (kept for API parity with
    stateful stages that genuinely need per-actor setup)."""

    def __init__(self, index_ref, zoom: int = 8):
        import ray

        self.index: PolygonIndex = (
            ray.get(index_ref)
            if not isinstance(index_ref, PolygonIndex) else index_ref)
        self.zoom = zoom
        self.proj = create_operation("+proj=webmerc +ellps=WGS84")

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        c = transform_arrays(self.proj, lon, lat)
        tx, ty = tile_xy(lon, lat, self.zoom)
        return _partials(self.index, self.zoom, lon, lat, c, tx, ty,
                         np.zeros_like(lon))


def _partials(index, zoom, lon, lat, c, tx, ty, ux) -> pa.Table:
    tile = ty * (1 << zoom) + tx
    cell = grid_cell(lon, lat, 5.0)  # noqa: F841 — cell key available for
    # downstream salting decisions; computed here to keep the stage fused
    pts, polys = index.query_batch(lon, lat)
    joined = np.zeros(len(lon), dtype=np.int64)
    np.add.at(joined, pts, 1)
    # partial per-tile aggregate (combiner before the shuffle)
    order = np.argsort(tile, kind="stable")
    t_sorted = tile[order]
    uniq, starts = np.unique(t_sorted, return_index=True)
    n = np.diff(np.append(starts, len(t_sorted)))
    jsum = np.add.reduceat(joined[order], starts) if len(order) else \
        np.array([], dtype=np.int64)
    xsum = np.add.reduceat(c.x[order], starts) if len(order) else \
        np.array([])
    ysum = np.add.reduceat(c.y[order], starts) if len(order) else \
        np.array([])
    usum = np.add.reduceat(ux[order], starts) if len(order) else \
        np.array([])
    return pa.table({
        "tile": pa.array(uniq),
        "n_points": pa.array(n.astype(np.int64)),
        "n_joined": pa.array(jsum.astype(np.int64)),
        "x_sum": pa.array(xsum),
        "y_sum": pa.array(ysum),
        "utmx_sum": pa.array(usum),
    })


_TILE_AGGS = [("n_points", "sum"), ("n_joined", "sum"),
              ("x_sum", "sum"), ("y_sum", "sum"), ("utmx_sum", "sum")]


def _tile_partials(docs, zoom: int, n_polygons: int):
    """docs -> coord spans -> transform+join+tile partials (the fused
    stateless chain shared by the one-shot and resumable runners)."""
    import ray

    coords = docs.map_batches(extract_coords_batch, batch_format="pyarrow")
    index = PolygonIndex(make_polygons(n_polygons), 5.0)
    ref = ray.put(index)
    # stateless tasks (not an actor pool): worker processes stay warm
    # across runs and elastically fill every core
    return coords.map_batches(
        transform_join_tile,
        fn_kwargs={"index_ref": ref, "zoom": zoom},
        batch_format="pyarrow",
        batch_size=None,  # one task per block: keep every core busy
    )


def flagship(sf_dir: str = None, n_docs: int = None, zoom: int = 8,
             n_polygons: int = 64, concurrency: int = 4,
             parallelism: int = 32):
    """Run the flagship pipeline; returns the per-tile summary Dataset."""
    from proj_ray.stages.agg import tree_aggregate

    if n_docs is not None:
        docs = doc_dataset(n_docs, parallelism=parallelism)
    else:
        docs = doc_dataset_from_documents(sf_dir)
    # tile assembly: associative combine tree (tile cardinality is
    # bounded by 4^zoom, so the final merge is small)
    return tree_aggregate(_tile_partials(docs, zoom, n_polygons),
                          ["tile"], _TILE_AGGS)


def resumable_flagship(n_docs: int, n_shards: int, root: str,
                       zoom: int = 8, n_polygons: int = 64,
                       parallelism: int = 8):
    """The flagship as a resumable partitioned job: doc-id ranges are
    the partitions, each shard's bounded tile-partial table writes
    through the per-partition checkpoint (manifest = id-range lineage +
    row metrics), and a re-run computes ONLY shards without a valid
    manifest.  The final tile table re-aggregates the checkpointed
    partials — associative, so shard boundaries never change the
    answer.  Returns (tile_table, n_computed, n_skipped)."""
    import ray.data as rd

    from proj_ray.docs.synth import make_doc_batch
    from proj_ray.stages.agg import combine_block
    from proj_ray.state.checkpoint import run_partitioned

    bounds = np.linspace(0, n_docs, n_shards + 1).astype(np.int64)
    pids = [f"shard-{i:05d}" for i in range(n_shards)]

    def make_table(pid: str) -> pa.Table:
        i = int(pid.split("-")[1])
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        docs = rd.range(hi - lo, override_num_blocks=parallelism) \
            .map_batches(
                lambda b, lo=lo: make_doc_batch(
                    b["id"].to_numpy() + lo),
                batch_format="pyarrow", batch_size=65536)
        partials = _tile_partials(docs, zoom, n_polygons)
        shard = pa.concat_tables(
            [b for b in partials.iter_batches(batch_format="pyarrow")],
            promote_options="default")
        return combine_block(shard, ["tile"], _TILE_AGGS)

    def lineage(pid: str):
        i = int(pid.split("-")[1])
        return {"partition": pid,
                "doc_id_range": [int(bounds[i]), int(bounds[i + 1])]}

    writer, computed, skipped = run_partitioned(
        pids, make_table, root,
        config={"n_docs": n_docs, "n_shards": n_shards, "zoom": zoom,
                "n_polygons": n_polygons},
        lineage_fn=lineage)
    tiles = combine_block(writer.read_all(), ["tile"], _TILE_AGGS)
    return tiles, computed, skipped
