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


class TransformJoinTile:
    """Fused actor-pool stage: webmerc transform + cell + tile + PIP
    probe, emitting per-(tile, cell) partial aggregates."""

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
        tile = ty * (1 << self.zoom) + tx
        cell = grid_cell(lon, lat, 5.0)
        pts, polys = self.index.query_batch(lon, lat)
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
        return pa.table({
            "tile": pa.array(uniq),
            "n_points": pa.array(n.astype(np.int64)),
            "n_joined": pa.array(jsum.astype(np.int64)),
            "x_sum": pa.array(xsum),
            "y_sum": pa.array(ysum),
        })


def flagship(sf_dir: str = None, n_docs: int = None, zoom: int = 8,
             n_polygons: int = 64, concurrency: int = 4,
             parallelism: int = 32):
    """Run the flagship pipeline; returns the per-tile summary Dataset."""
    import ray
    from ray.data.aggregate import Sum

    if n_docs is not None:
        docs = doc_dataset(n_docs, parallelism=parallelism)
    else:
        docs = doc_dataset_from_documents(sf_dir)
    coords = docs.map_batches(extract_coords_batch, batch_format="pyarrow")
    index = PolygonIndex(make_polygons(n_polygons), 5.0)
    ref = ray.put(index)
    partials = coords.map_batches(
        TransformJoinTile,
        fn_constructor_args=(ref, zoom),
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=concurrency,
    )
    return partials.groupby("tile").aggregate(
        Sum("n_points", alias_name="n_points"),
        Sum("n_joined", alias_name="n_joined"),
        Sum("x_sum", alias_name="x_sum"),
        Sum("y_sum", alias_name="y_sum"),
    )
