"""Direct numeric checks of core kernels against reference-published
values (from the reference gie corpus and API docs), independent of the
gie-runner machinery."""

import numpy as np
import pytest

from proj_ray.core.coords import Coords
from proj_ray.pipeline import create_operation, transform_arrays


def xy(defn, lon, lat, direction="forward"):
    p = create_operation(defn)
    c = transform_arrays(p, [lon], [lat], direction=direction)
    return c.x[0], c.y[0]


def test_utm_gie_example():
    # reference src/apps/gie.cpp:24-26 example block
    x, y = xy("+proj=utm +zone=32 +ellps=GRS80", 12.0, 55.0)
    assert abs(x - 691875.632139661) < 1e-6
    assert abs(y - 6098907.825005012) < 1e-6


def test_utm_roundtrip():
    p = create_operation("+proj=utm +zone=32 +ellps=GRS80")
    lon = np.random.default_rng(1).uniform(6, 12, 1000)
    lat = np.random.default_rng(2).uniform(-80, 80, 1000)
    c = transform_arrays(p, lon, lat)
    c2 = transform_arrays(p, c.x, c.y, direction="inverse")
    assert np.allclose(c2.x, lon, atol=1e-10)
    assert np.allclose(c2.y, lat, atol=1e-10)


def test_webmerc_closed_form():
    # webmerc = spherical mercator on WGS84 a with k0=1 (merc.cpp:76-84)
    a = 6378137.0
    lon, lat = 2.0, 49.0
    x, y = xy("+proj=webmerc +ellps=WGS84", lon, lat)
    assert abs(x - a * np.radians(lon)) < 1e-9
    assert abs(y - a * np.arcsinh(np.tan(np.radians(lat)))) < 1e-9


def test_cart_roundtrip_with_height():
    p = create_operation("+proj=cart +ellps=GRS80")
    c = transform_arrays(p, [12.0], [55.0], [100.0])
    # geocentric radius sanity
    r = np.sqrt(c.x[0] ** 2 + c.y[0] ** 2 + c.z[0] ** 2)
    assert 6.3e6 < r < 6.4e6
    c2 = transform_arrays(p, c.x, c.y, c.z, direction="inverse")
    assert abs(c2.x[0] - 12.0) < 1e-12
    assert abs(c2.y[0] - 55.0) < 1e-12
    assert abs(c2.z[0] - 100.0) < 1e-8


def test_error_rows_do_not_poison_batch():
    p = create_operation("+proj=merc +ellps=GRS80")
    # row 1 has invalid latitude, others fine
    c = transform_arrays(p, [2.0, 2.0, 4.0], [49.0, 95.0, 30.0])
    assert c.err[0] == 0 and c.err[2] == 0
    assert c.err[1] != 0 and np.isnan(c.x[1])
    assert np.isfinite(c.x[0]) and np.isfinite(c.x[2])


def test_pipeline_push_pop_preserves_height():
    defn = ("+proj=pipeline +ellps=GRS80 "
            "+step +proj=push +v_3 "
            "+step +proj=cart "
            "+step +proj=helmert +x=10 +y=20 +z=30 "
            "+step +proj=cart +inv "
            "+step +proj=pop +v_3")
    p = create_operation(defn)
    c = transform_arrays(p, [12.0], [55.0], [100.0])
    assert abs(c.z[0] - 100.0) < 1e-12  # height restored by pop


def test_unitconvert_ft_to_m():
    x, y = xy("+proj=unitconvert +xy_in=ft +xy_out=m", 1.0, 2.0)
    assert abs(x - 0.3048) < 1e-15
    assert abs(y - 0.6096) < 1e-15
