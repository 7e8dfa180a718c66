"""Round-3 ADVICE regressions: threshold-derived MinHash banding,
+t_final=now epoch semantics, and generic-gridshift setup guards."""

import numpy as np
import pytest

from proj_ray.ops.base import ProjError


def test_minhash_banding_tracks_threshold():
    """(n_bands, rows_per_band) places the S-curve midpoint
    (1/b)^(1/r) AT the requested Jaccard threshold (within the
    granularity of <=128 permutations), preferring sharper curves
    (more rows per band) among near-ties so sub-threshold noise is
    rejected hard."""
    from proj_ray.stages.dedup import _MAX_PERM, minhash_banding

    for t in (0.95, 0.9, 0.8, 0.7, 0.5, 0.3):
        b, r = minhash_banding(t)
        assert 2 <= b and 2 <= r and b * r <= _MAX_PERM
        midpoint = (1.0 / b) ** (1.0 / r)
        # midpoint lands at the threshold, not half-way down the curve
        assert abs(midpoint - t) <= 0.05, (t, b, r, midpoint)
    # the regression that motivated this: at t=0.7 the midpoint must
    # NOT collapse to 0.5 (16x4 over 64 perms), which promoted ~half
    # of all j~0.45 template-noise pairs to candidates
    b, r = minhash_banding(0.7)
    assert (1.0 / b) ** (1.0 / r) > 0.65


def test_now_decimal_year_zero_based_yday():
    """vgridshift.cpp:186-192 uses C's 0-based tm_yday; Python's is
    1-based, so Jan 1 must resolve to exactly <year>.0.  The value is
    cached so every call in a process agrees."""
    import time

    import proj_ray.ops.gridshift as gs

    saved = gs._NOW_DECIMAL_YEAR
    try:
        gs._NOW_DECIMAL_YEAR = 0.0
        v = gs._now_decimal_year()
        now = time.localtime()
        assert v == pytest.approx(now.tm_year + (now.tm_yday - 1) / 365.0)
        assert v == gs._now_decimal_year()  # cached
    finally:
        gs._NOW_DECIMAL_YEAR = saved


def _fake_grid(geographic: bool, gtype: str = "HORIZONTAL_OFFSET"):
    from proj_ray.ops.geotiff import GTiffGrid

    g = object.__new__(GTiffGrid)
    g.geographic = geographic
    g.ds_meta = {"TYPE": gtype}
    g.sample_meta = {0: {}, 1: {}}
    return g


def test_gridshift_mixed_convention_errors(monkeypatch):
    """A +grids spec mixing a projected and a geographic GTG must fail
    at setup instead of silently adopting whichever grid came last."""
    import proj_ray.ops.gridshift as gshift
    from proj_ray.pipeline import create_operation

    monkeypatch.setattr(
        gshift, "load_generic_gridsets",
        lambda spec: [[_fake_grid(True)], [_fake_grid(False)]])
    monkeypatch.setattr(gshift, "validate_grid_spec_shallow",
                        lambda spec: True)
    with pytest.raises(ProjError, match="mix geographic and projected"):
        create_operation("+proj=gridshift +grids=a.tif,b.tif")
