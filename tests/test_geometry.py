"""Distributed geometry measures (spatial/geometry.py)."""

import numpy as np
import pyarrow as pa
import pytest

from proj_ray.spatial.geometry import (
    R_AUTHALIC_WGS84,
    douglas_peucker_mask,
    shoelace_area_centroid,
    spherical_ring_area,
)


def test_shoelace_unit_square():
    # CCW unit square: area +1, centroid (0.5, 0.5)
    x = np.array([0.0, 1.0, 1.0, 0.0])
    y = np.array([0.0, 0.0, 1.0, 1.0])
    area, cx, cy = shoelace_area_centroid(
        x, y, np.array([0]), np.array([4]))
    assert area[0] == pytest.approx(1.0)
    assert cx[0] == pytest.approx(0.5)
    assert cy[0] == pytest.approx(0.5)
    # clockwise -> negative
    area2, _, _ = shoelace_area_centroid(
        x[::-1].copy(), y[::-1].copy(), np.array([0]), np.array([4]))
    assert area2[0] == pytest.approx(-1.0)


def test_shoelace_multi_ring_packed():
    # two rings back-to-back in one array: unit square + 2x1 triangle
    x = np.array([0.0, 1.0, 1.0, 0.0, 10.0, 12.0, 10.0])
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0])
    area, cx, cy = shoelace_area_centroid(
        x, y, np.array([0, 4]), np.array([4, 3]))
    np.testing.assert_allclose(area, [1.0, 1.0])
    np.testing.assert_allclose(cx, [0.5, 32.0 / 3.0])
    np.testing.assert_allclose(cy, [0.5, 1.0 / 3.0])


def test_spherical_area_parallel_wedge_exact():
    """Rectangle bounded by parallels/meridians: lon in [0,90],
    lat in [0,30].  Exact area = R^2 * dlon * (sin 30 - sin 0); the
    C-D trapezoid is EXACT along parallels (sin(lat) constant)."""
    lon = np.array([0.0, 90.0, 90.0, 0.0])
    lat = np.array([0.0, 0.0, 30.0, 30.0])
    a = spherical_ring_area(lon, lat, np.array([0]), np.array([4]),
                            radius=1.0)
    assert a[0] == pytest.approx((np.pi / 2) * 0.5, rel=1e-12)
    # clockwise -> negative
    a2 = spherical_ring_area(lon[::-1].copy(), lat[::-1].copy(),
                             np.array([0]), np.array([4]), radius=1.0)
    assert a2[0] == pytest.approx(-(np.pi / 2) * 0.5, rel=1e-12)


def test_spherical_area_small_square_matches_planar():
    """A 0.1-degree square at lat 45: area ~ cos(45) * planar."""
    d = 0.1
    lat0 = 45.0
    lon = np.array([0.0, d, d, 0.0])
    lat = np.array([lat0, lat0, lat0 + d, lat0 + d])
    a = spherical_ring_area(lon, lat, np.array([0]), np.array([4]),
                            radius=R_AUTHALIC_WGS84)
    rad = np.radians(d)
    expect = (R_AUTHALIC_WGS84 ** 2) * rad * (
        np.sin(np.radians(lat0 + d)) - np.sin(np.radians(lat0)))
    assert a[0] == pytest.approx(expect, rel=1e-12)


def test_spherical_area_antimeridian_wrap():
    """A wedge straddling the antimeridian (lon 170 -> -170) must
    integrate the short way round."""
    lon = np.array([170.0, -170.0, -170.0, 170.0])
    lat = np.array([0.0, 0.0, 10.0, 10.0])
    a = spherical_ring_area(lon, lat, np.array([0]), np.array([4]),
                            radius=1.0)
    expect = np.radians(20.0) * np.sin(np.radians(10.0))
    assert a[0] == pytest.approx(expect, rel=1e-12)


def _dp_brute(x, y, tol):
    """Textbook recursive Douglas-Peucker, independent of the
    stack implementation."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j - i < 2:
            return
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg2 = dx * dx + dy * dy
        best, bd = -1, tol * tol
        for k in range(i + 1, j):
            px, py = x[k] - x[i], y[k] - y[i]
            if seg2 == 0:
                d2 = px * px + py * py
            else:
                c = px * dy - py * dx
                d2 = c * c / seg2
            if d2 > bd:
                best, bd = k, d2
        if best >= 0:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return keep


def test_douglas_peucker_matches_brute_on_random_tracks():
    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(2, 60))
        x = np.cumsum(rng.normal(size=n))
        y = np.cumsum(rng.normal(size=n))
        for tol in (0.1, 0.5, 2.0):
            got = douglas_peucker_mask(x, y, tol)
            want = _dp_brute(x, y, tol)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"trial={trial} "
                                                  f"tol={tol}")


def test_douglas_peucker_colinear_collapses():
    x = np.linspace(0, 10, 50)
    y = np.zeros(50)
    keep = douglas_peucker_mask(x, y, 1e-9)
    assert keep[0] and keep[-1] and keep.sum() == 2


def test_polygon_area_centroid_dataset(ray_session):
    import ray.data as rd

    from proj_ray.spatial.geometry import (polygon_area_centroid,
                                           simplify_tracks)

    # 200 random CCW triangles sharded across blocks, shuffled row
    # order so the seq sort matters
    rng = np.random.default_rng(3)
    pid, seq, xs, ys, want = [], [], [], [], {}
    for p in range(200):
        cx, cy = rng.uniform(-50, 50, 2)
        r = rng.uniform(0.5, 3.0)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 3))
        x = cx + r * np.cos(ang)
        y = cy + r * np.sin(ang)
        area = 0.5 * abs(
            (x[1] - x[0]) * (y[2] - y[0]) - (x[2] - x[0]) * (y[1] - y[0]))
        want[p] = area
        for k in range(3):
            pid.append(p)
            seq.append(k)
            xs.append(x[k])
            ys.append(y[k])
    order = rng.permutation(len(pid))
    t = pa.table({"polygon_id": np.array(pid)[order],
                  "seq": np.array(seq, dtype=np.int64)[order],
                  "x": np.array(xs)[order], "y": np.array(ys)[order]})
    out = polygon_area_centroid(rd.from_arrow(t).repartition(7),
                                key="polygon_id").take_all()
    assert len(out) == 200
    for row in out:
        assert abs(row["area"]) == pytest.approx(
            want[row["polygon_id"]], rel=1e-9)
        assert row["area"] > 0  # sorted-angle rings are CCW
        assert row["n_vertices"] == 3

    # simplify_tracks end-to-end: a zigzag that collapses at high tol
    n = 40
    track = pa.table({
        "doc_id": np.ones(n, dtype=np.int64),
        "offset": np.arange(n, dtype=np.int64),
        "lon": np.linspace(0, 10, n),
        "lat": (np.arange(n) % 2) * 0.01,
    })
    kept = simplify_tracks(rd.from_arrow(track).repartition(3),
                           key="doc_id", seq="offset", x_col="lon",
                           y_col="lat", tol=1.0).take_all()
    assert len(kept) == 2  # endpoints only
    kept_lo = simplify_tracks(rd.from_arrow(track), key="doc_id",
                              seq="offset", x_col="lon", y_col="lat",
                              tol=1e-6).take_all()
    assert len(kept_lo) == n


def test_polygon_perimeter_known_square(ray_session):
    import ray.data as rd

    from proj_ray.spatial.geometry import polygon_perimeter
    from proj_ray.spatial.knn import haversine_m

    # 1-degree square at the equator: perimeter = 2 edges along
    # meridians + 2 along the equator, each ~111 km by haversine
    t = pa.table({
        "polygon_id": [1, 1, 1, 1],
        "seq": [0, 1, 2, 3],
        "lon": [0.0, 1.0, 1.0, 0.0],
        "lat": [0.0, 0.0, 1.0, 1.0],
    })
    rows = polygon_perimeter(rd.from_arrow(t), key="polygon_id",
                             seq="seq").take_all()
    d_eq = haversine_m(0.0, 0.0, 1.0, 0.0)
    d_me = haversine_m(0.0, 0.0, 0.0, 1.0)
    d_top = haversine_m(0.0, 1.0, 1.0, 1.0)
    want = d_eq + d_me + d_top + d_me
    assert rows[0]["perimeter_m"] == pytest.approx(want, rel=1e-12)


def test_radius_join_matches_brute(ray_session):
    import ray.data as rd

    from proj_ray.spatial.knn import haversine_m, radius_join

    rng = np.random.default_rng(9)
    n = 2000
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-75, 75, n)
    pts = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                    "offset": np.zeros(n, dtype=np.int64),
                    "lon": lon, "lat": lat})
    queries = {"query_id": np.arange(5, dtype=np.int64),
               "lon": np.array([0.0, 90.0, -120.0, 60.0, 10.0]),
               "lat": np.array([0.0, 45.0, -30.0, 70.0, -60.0])}
    R = 800_000.0
    got = radius_join(rd.from_arrow(pts).repartition(4), queries,
                      radius_m=R).to_pandas()
    # brute truth
    d = haversine_m(lon[:, None], lat[:, None],
                    queries["lon"][None, :], queries["lat"][None, :])
    rows, qs = np.nonzero(d <= R)
    want = set(zip(qs.tolist(), rows.tolist()))
    got_set = set(zip(got["query_id"].tolist(), got["doc_id"].tolist()))
    assert got_set == want and len(want) > 10


def test_geodesic_polygon_area_dataset(ray_session):
    """Dataset op vs the scalar driver AND the spherical twin."""
    import ray.data as rd

    from proj_ray.functions.geodesic import (geodesic,
                                             polygon_area_perimeter)
    from proj_ray.spatial.geometry import (geodesic_polygon_area,
                                           spherical_polygon_area)

    rng = np.random.default_rng(12)
    pid, seq, lons, lats = [], [], [], []
    rings = {}
    for p in range(40):
        clon, clat = rng.uniform(-150, 150), rng.uniform(-60, 60)
        r = rng.uniform(0.2, 3.0)
        nv = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        lon = clon + r * np.cos(ang)
        lat = clat + r * 0.7 * np.sin(ang)
        rings[p] = (lat, lon)
        pid.extend([p] * nv)
        seq.extend(range(nv))
        lons.extend(lon)
        lats.extend(lat)
    t = pa.table({"polygon_id": np.array(pid, dtype=np.int64),
                  "seq": np.array(seq, dtype=np.int64),
                  "lon": np.array(lons), "lat": np.array(lats)})
    ds = rd.from_arrow(t).repartition(5)
    got = {r["polygon_id"]: (r["area_m2"], r["perimeter_m"])
           for r in geodesic_polygon_area(ds).take_all()}
    g = geodesic()
    for p, (lat, lon) in rings.items():
        a, per = polygon_area_perimeter(g, lat, lon)
        assert got[p][0] == pytest.approx(a, rel=1e-12), p
        assert got[p][1] == pytest.approx(per, rel=1e-12), p
    # spherical twin cross-check on a DENSE ring (trapezoid error
    # vanishes with edge length; what remains is the ~0.3% flattening
    # effect of the authalic-sphere approximation)
    ang = np.linspace(0, 2 * np.pi, 144, endpoint=False)
    dense = pa.table({
        "polygon_id": np.zeros(144, dtype=np.int64),
        "seq": np.arange(144, dtype=np.int64),
        "lon": 12.0 + 2.0 * np.cos(ang),
        "lat": 47.0 + 1.4 * np.sin(ang),
    })
    exact = geodesic_polygon_area(rd.from_arrow(dense)).take_all()[0]
    sph = spherical_polygon_area(rd.from_arrow(dense)).take_all()[0]
    assert sph["area_m2"] == pytest.approx(abs(exact["area_m2"]),
                                           rel=5e-3)
