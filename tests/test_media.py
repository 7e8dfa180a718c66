"""Media-stage plumbing: frame sampling fan-out and the decode
pipeline's payload-drop contract."""

import numpy as np
import pandas as pd

from proj_ray.stages.media import FakeImageDecoder, FrameSampler


def test_frame_sampler_fanout():
    b = pd.DataFrame({
        "media_ref": ["a", "b", "c", "d"],
        "media_type": ["video", "image", "video", "video"],
        "duration_ms": [2500, 0, 1000, 0],
    })
    out = FrameSampler(stride_ms=1000)(b)
    # ceil(2500/1000)=3 frames for a, image skipped, 1 for c, 0 for d
    assert out["media_ref"].tolist() == ["a", "a", "a", "c"]
    assert out["frame_ts_ms"].tolist() == [0, 1000, 2000, 0]


def test_frame_sampler_empty():
    b = pd.DataFrame({"media_ref": [], "media_type": [],
                      "duration_ms": []})
    out = FrameSampler()(b)
    assert list(out.columns) == ["media_ref", "frame_ts_ms"]
    assert len(out) == 0


def test_decoder_drops_payload_keeps_features():
    dec = FakeImageDecoder(feature_dim=4)
    b = pd.DataFrame({
        "media_ref": ["x", "y"],
        "payload": [b"abc" * 30, b"def" * 30],
    })
    out = dec(b.copy())
    assert "payload" not in out.columns
    f = np.stack(out["features"].to_numpy())
    assert f.shape == (2, 4)
    # deterministic
    again = np.stack(dec(b.copy())["features"].to_numpy())
    assert (f == again).all()
