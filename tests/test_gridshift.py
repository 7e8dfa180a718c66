"""FIXTURES.md F5: synthetic hgridshift/vgridshift checks — bilinear
exactness at nodes, fixed-point inverse roundtrip <= 1e-12 rad."""

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.ops.gridshift import ARCSEC_TO_RAD, ShiftGrid
from proj_ray.pipeline import create_operation, transform_arrays

SPEC = "synth:42,-10,40,0.5,41,21"  # west=-10E..10E, south=40N..50N


def test_bilinear_at_nodes():
    g = ShiftGrid.synth(42, -10, 40, 0.5, 41, 21)
    # at grid nodes the interpolation must reproduce node values exactly
    lam = (-10 + 0.5 * np.arange(41)) * m.DEG_TO_RAD
    phi = (40 + 0.5 * 7) * m.DEG_TO_RAD
    s = g.sample(lam, np.full_like(lam, phi))
    assert np.allclose(s[:, 0], g.values[7, :, 0], atol=1e-9, rtol=0)
    assert np.allclose(s[:, 1], g.values[7, :, 1], atol=1e-9, rtol=0)


def test_hgridshift_roundtrip():
    p = create_operation(f"+proj=hgridshift +grids={SPEC} +ellps=GRS80")
    rng = np.random.default_rng(7)
    lon = rng.uniform(-9.9, 9.9, 500)
    lat = rng.uniform(40.1, 49.9, 500)
    c = transform_arrays(p, lon, lat)
    # shift magnitude sane (<= ~2.83 arcsec diag)
    assert np.max(np.abs(c.x - lon)) * 3600 <= 3.0
    assert np.any(np.abs(c.x - lon) > 0)
    ci = transform_arrays(p, c.x, c.y, direction="inverse")
    assert np.allclose(ci.x, lon, atol=1e-12 / m.DEG_TO_RAD * 1e-3)
    assert np.allclose(ci.y, lat, atol=1e-12 / m.DEG_TO_RAD * 1e-3)


def test_vgridshift_sign_and_roundtrip():
    p = create_operation(
        f"+proj=vgridshift +grids={SPEC} +ellps=GRS80")
    c = transform_arrays(p, [0.0], [45.0], [100.0])
    g = ShiftGrid.synth(42, -10, 40, 0.5, 41, 21, vertical=True)
    dz = g.sample(np.array([0.0]), np.array([45.0 * m.DEG_TO_RAD]))[0, 0]
    assert abs((100.0 - dz) - c.z[0]) < 1e-9
    ci = transform_arrays(p, c.x, c.y, c.z, direction="inverse")
    assert abs(ci.z[0] - 100.0) < 1e-9


def test_outside_grid_passthrough():
    p = create_operation(f"+proj=hgridshift +grids={SPEC} +ellps=GRS80")
    c = transform_arrays(p, [100.0], [0.0])
    assert abs(c.x[0] - 100.0) < 1e-12
    assert abs(c.y[0] - 0.0) < 1e-12


def test_pipeline_with_gridshift():
    defn = (f"+proj=pipeline +ellps=GRS80 "
            f"+step +proj=hgridshift +grids={SPEC} "
            f"+step +proj=utm +zone=31")
    p = create_operation(defn)
    c = transform_arrays(p, [3.0], [45.0])
    assert np.isfinite(c.x[0]) and c.err[0] == 0
    ci = transform_arrays(p, c.x, c.y, direction="inverse")
    assert abs(ci.x[0] - 3.0) < 1e-9
    assert abs(ci.y[0] - 45.0) < 1e-9
