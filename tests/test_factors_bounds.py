"""proj_factors / pj_deriv and proj_trans_bounds analogues
(factors.cpp, deriv.cpp, 4D_api.cpp:1267-1690)."""

import numpy as np
import pytest

from proj_ray.functions.bounds import trans_bounds
from proj_ray.functions.factors import factors

ES_WGS84 = 0.0066943799901413165


def test_factors_mercator_closed_form():
    f = factors("+proj=merc +ellps=WGS84", [12.0, 0.0], [55.0, 0.0])
    for i, lat in enumerate((55.0, 0.0)):
        want = np.sqrt(1 - ES_WGS84 * np.sin(np.radians(lat)) ** 2) \
            / np.cos(np.radians(lat))
        assert f["parallel_scale"][i] == pytest.approx(want, rel=1e-8)
        assert f["meridional_scale"][i] == pytest.approx(want, rel=1e-8)
    assert f["meridian_convergence"] == pytest.approx([0.0, 0.0], abs=1e-12)
    # conformal: zero angular distortion, s = k^2
    assert f["angular_distortion"] == pytest.approx([0, 0], abs=1e-6)
    assert f["areal_scale"][0] == pytest.approx(
        f["parallel_scale"][0] ** 2, rel=1e-7)


def test_factors_tmerc_scale_and_convergence():
    f = factors("+proj=tmerc +ellps=WGS84 +lon_0=9 +k_0=0.9996",
                [9.0], [45.0])
    assert f["parallel_scale"][0] == pytest.approx(0.9996, abs=1e-8)
    assert f["meridional_scale"][0] == pytest.approx(0.9996, abs=1e-8)
    f2 = factors("+proj=tmerc +ellps=WGS84 +lon_0=9 +k_0=0.9996",
                 [12.0], [45.0])
    approx = np.arctan(np.tan(np.radians(3.0)) * np.sin(np.radians(45.0)))
    assert f2["meridian_convergence"][0] == pytest.approx(approx, abs=3e-5)


def test_factors_equal_area():
    f = factors("+proj=cea +ellps=WGS84", [10.0], [30.0])
    assert f["areal_scale"][0] == pytest.approx(1.0, abs=1e-7)
    # Tissot a*b = s = 1 for equal-area
    assert (f["tissot_semimajor"][0] * f["tissot_semiminor"][0]
            == pytest.approx(1.0, abs=1e-6))


def test_factors_invalid_latitude_nan():
    f = factors("+proj=merc +ellps=WGS84", [0.0], [95.0])
    assert np.isnan(f["parallel_scale"][0])


def test_trans_bounds_projected_roundtrip():
    b = trans_bounds("+proj=utm +zone=31 +ellps=WGS84", 0.0, 40.0, 6.0, 50.0)
    b2 = trans_bounds("+proj=utm +zone=31 +ellps=WGS84", *b,
                      direction="inverse")
    assert b2[0] <= 0.0 and b2[2] >= 6.0
    assert b2[1] <= 40.0 and b2[3] >= 50.0
    # the envelope is tight-ish (within a degree of slack)
    assert b2[0] > -1.0 and b2[2] < 7.0


def test_trans_bounds_pole_in_box():
    b = trans_bounds("+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84",
                     -2e6, -2e6, 2e6, 2e6, direction="inverse")
    assert b[0] == -180.0 and b[2] == 180.0 and b[3] == 90.0


def test_trans_bounds_antimeridian_wrap():
    b = trans_bounds("+proj=merc +lon_0=180 +ellps=WGS84",
                     -1e6, 0, 1e6, 2e6, direction="inverse")
    assert b[0] > 170 and b[2] < -170  # wrapped window, not [-180, 180]


def test_trans_bounds_spanning_input():
    b = trans_bounds("+proj=merc +lon_0=180 +ellps=WGS84",
                     170.0, -10.0, -170.0, 10.0)
    assert b[0] < 0 < b[2]
