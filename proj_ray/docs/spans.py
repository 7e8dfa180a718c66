"""Span handling for the interleaved document table.

`extract_coords_batch` explodes coord spans into flat Arrow rows
(doc_id, offset, lon, lat) with zero Python-per-row work in the hot path
(list flattening + numpy parse of the fixed "%.17g %.17g" layout).

The per-row invariant (BASELINE.json input_hint) is that the span
sequence — (kind, text, media_ref, order) — survives every engine run:
engines may only append derived columns or emit derived tables.
`span_fingerprint_batch` produces a per-doc hash of exactly that
sequence so the invariant can be asserted cheaply at any pipeline stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_coords_batch(batch: pa.Table) -> pa.Table:
    """Explode coord spans -> (doc_id, offset, lon, lat) rows."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    flat = spans.flatten()
    # doc index for every span row
    parent = pc.list_parent_indices(spans)
    kind = flat.field("kind")
    is_coord = pc.equal(kind, "coord")
    idx = pc.indices_nonzero(is_coord)
    coord_rows = flat.take(idx)
    coord_parent = parent.take(idx)
    texts = coord_rows.field("text")
    # "%.17g %.17g" -> two float64 columns (vectorized split + cast)
    parts = pc.split_pattern(texts, " ")
    pieces = parts.flatten()
    lonlat = pieces.cast(pa.float64())
    lon = lonlat.take(pa.array(np.arange(0, len(lonlat), 2)))
    lat = lonlat.take(pa.array(np.arange(1, len(lonlat), 2)))
    return pa.table({
        "doc_id": doc_ids.take(coord_parent),
        "offset": coord_rows.field("offset"),
        "lon": lon,
        "lat": lat,
    })


def span_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Per-doc fingerprint of the (kind, text, media_ref, offset) sequence."""
    import hashlib

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    flat = spans.flatten()
    joined = pc.binary_join_element_wise(
        flat.field("kind"), flat.field("text"), flat.field("media_ref"),
        pc.cast(flat.field("offset"), pa.string()), "\x1f")
    offsets = spans.offsets.to_numpy()
    vals = joined.to_pylist()
    fps = []
    for i in range(len(doc_ids)):
        h = hashlib.sha1()
        for s in vals[offsets[i]:offsets[i + 1]]:
            h.update(s.encode())
            h.update(b"\x1e")
        fps.append(h.hexdigest())
    return pa.table({"doc_id": doc_ids, "span_fp": pa.array(fps)})


def verify_span_invariant(before, after) -> bool:
    """Check per-row span-sequence equality between two doc datasets."""
    fb = before.map_batches(span_fingerprint_batch, batch_format="pyarrow")
    fa = after.map_batches(span_fingerprint_batch, batch_format="pyarrow")
    tb = fb.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ta = fa.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return bool((tb["doc_id"] == ta["doc_id"]).all()
                and (tb["span_fp"] == ta["span_fp"]).all())
