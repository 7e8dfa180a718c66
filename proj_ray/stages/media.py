"""Multimodal (image/audio/video) stages.

Media payloads are opaque `binary` columns with typed metadata.  The
actual codecs are NOT available in this environment, so the decode step
is a clearly-marked deterministic fake behind the same actor-pool
interface a real decoder would use — the Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested.

A production deployment swaps `FakeImageDecoder._decode` for a real
library call; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),  # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Derive a deterministic fake media table from media_ref strings."""
    refs = batch.column("media_ref").to_pylist()
    types = []
    payloads = []
    w = []
    h = []
    dur = []
    for r in refs:
        digest = hashlib.sha256(r.encode()).digest()
        kind = ["image", "audio", "video"][digest[0] % 3]
        types.append(kind)
        payloads.append(digest * (1 + digest[1] % 4))
        w.append(64 + digest[2] % 192 if kind != "audio" else 0)
        h.append(64 + digest[3] % 192 if kind != "audio" else 0)
        dur.append(1000 + digest[4] * 100 if kind != "image" else 0)
    return pa.table({
        "media_ref": batch.column("media_ref"),
        "media_type": pa.array(types),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(w, type=pa.int32()),
        "height": pa.array(h, type=pa.int32()),
        "duration_ms": pa.array(dur, type=pa.int32()),
    })


class FakeImageDecoder:
    """Actor-pool decode/feature stage.

    __init__ is where a real build would load the codec / model ONCE per
    actor; __call__ handles a batch.  The fake 'decode' derives a small
    deterministic feature vector from the payload bytes.
    """

    def __init__(self, feature_dim: int = 8):
        # REAL DECODER GOES HERE (PIL/ffmpeg/torchvision). Not available
        # in this environment — deterministic fake below.
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError(
            "real image decoding requires an imaging library not present "
            "in this environment; use _fake_features for the plumbing")

    def _fake_features(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha512(payload).digest()
        return np.frombuffer(d[:8 * self.feature_dim],
                             dtype=np.uint64).astype(np.float64) / 2**64

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self._fake_features(p) for p in batch["payload"]]
        batch = batch.drop(columns=["payload"])  # large blobs do not
        # travel past the decode stage — only compact features do
        batch["features"] = feats
        return batch


class FrameSampler:
    """Video frame-sampling stage (every `stride_ms`); emits one row per
    sampled frame with the frame timestamp — the fan-out pattern a real
    video pipeline uses (flat_map shape via map_batches)."""

    def __init__(self, stride_ms: int = 1000):
        self.stride_ms = stride_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vids = batch[batch["media_type"] == "video"]
        dur = vids["duration_ms"].to_numpy().astype(np.int64)
        counts = -(-np.maximum(dur, 0) // self.stride_ms)  # ceil
        total = int(counts.sum())
        refs = np.repeat(vids["media_ref"].to_numpy(), counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        ts = (np.arange(total, dtype=np.int64) - starts) * self.stride_ms
        return pd.DataFrame({"media_ref": refs, "frame_ts_ms": ts})


def media_pipeline(doc_ds, concurrency: int = 2):
    """documents -> media spans -> fake decode -> features (end-to-end
    plumbing used by tests and bench)."""
    import pyarrow.compute as pc

    def media_refs(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        mask = pc.equal(flat.field("kind"), "media")
        refs = flat.field("media_ref").filter(mask)
        return pa.table({"media_ref": refs})

    media = doc_ds.map_batches(media_refs, batch_format="pyarrow") \
        .map_batches(synth_media_batch, batch_format="pyarrow")
    return media.map_batches(
        FakeImageDecoder, batch_format="pandas", batch_size=1024,
        concurrency=concurrency)
