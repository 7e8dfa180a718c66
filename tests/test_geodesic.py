"""Geodesic solver checks against the published GeographicLib test set
(the instances the reference ships in src/tests/geodtest.c:43-124;
original source: Karney's geodesic test data, public)."""

import numpy as np
import pytest

from proj_ray.functions.geodesic import Geodesic, wgs84

# (lat1, lon1, azi1, lat2, lon2, azi2, s12) from geodtest.c testcases
CASES = [
    (35.60777, -139.44815, 111.098748429560326,
     -11.17491, -69.95921, 129.289270889708762, 8935244.5604818305),
    (55.52454, 106.05087, 22.020059880982801,
     77.03196, 197.18234, 109.112041110671519, 4105086.1713924406),
    (-21.97856, 142.59065, -32.44456876433189,
     41.84138, 98.56635, -41.84359951440466, 8394328.894657671),
    (-66.99028, 112.2363, 173.73491240878403,
     -12.70631, 285.90344, 2.512956620913668, 11150344.2312080241),
    (-17.42761, 173.34268, -159.033557661192928,
     -15.84784, 5.93557, -20.787484651536988, 16076603.1631180673),
    (32.84994, 48.28919, 150.492927788121982,
     -56.28556, 202.29132, 48.113449399816759, 16727068.9438164461),
    (6.96833, 52.74123, 92.581585386317712,
     -7.39675, 206.17291, 90.721692165923907, 17102477.2496958388),
    (-50.56724, -16.30485, -105.439679907590164,
     -33.56571, -94.97412, -47.348547835650331, 6455670.5118668696),
    (-58.93002, -8.90775, 140.965397902500679,
     -8.91104, 133.13503, 19.255429433416599, 11756066.0219864627),
    (-68.82867, -74.28391, 93.774347763114881,
     -50.63005, -8.36685, 34.65564085411343, 3956936.926063544),
    (-10.62672, -32.0898, -86.426713286747751,
     5.883, -134.31681, -80.473780971034875, 11470869.3864563009),
    (-21.76221, 166.90563, 29.319421206936428,
     48.72884, 213.97627, 43.508671946410168, 9098627.3986554915),
    (-19.79938, -174.47484, 71.167275780171533,
     -11.99349, -154.35109, 65.589099775199228, 2319004.8601169389),
    (-11.95887, -116.94513, 92.712619830452549,
     4.57352, 7.16501, 78.64960934409585, 13834722.5801401374),
    (-87.85331, 85.66836, -65.120313040242748,
     66.48646, 16.09921, -4.888658719272296, 17286615.3147144645),
    (1.74708, 128.32011, -101.584843631173858,
     -11.16617, 11.87109, -86.325793296437476, 12942901.1241347408),
    (-25.72959, -144.90758, -153.647468693117198,
     -57.70581, -269.17879, -48.343983158876487, 9413446.7452453107),
    (-41.22777, 122.32875, 14.285113402275739,
     -7.57291, 130.37946, 10.805303085187369, 3812686.035106021),
    (11.01307, 138.25278, 79.43682622782374,
     6.62726, 247.05981, 103.708090215522657, 11911190.819018408),
    (-29.47124, 95.14681, -163.779130441688382,
     -27.46601, -69.15955, -15.909335945554969, 13487015.8381145492),
]


def _cols(i):
    return np.array([c[i] for c in CASES])


def test_inverse_batch():
    g = wgs84()
    lat1, lon1, azi1 = _cols(0), _cols(1), _cols(2)
    lat2, lon2, azi2 = _cols(3), _cols(4), _cols(5)
    s12 = _cols(6)
    s, a1, a2 = g.inverse(lat1, lon1, lat2, lon2)
    assert np.allclose(s, s12, atol=1e-8, rtol=0)
    assert np.allclose(a1, azi1, atol=1e-12, rtol=0)
    assert np.allclose(a2, azi2, atol=1e-12, rtol=0)


def test_direct_batch():
    g = wgs84()
    lat1, lon1, azi1 = _cols(0), _cols(1), _cols(2)
    lat2, lon2, azi2 = _cols(3), _cols(4), _cols(5)
    s12 = _cols(6)
    la2, lo2, a2 = g.direct(lat1, lon1, azi1, s12)
    assert np.allclose(la2, lat2, atol=1e-12, rtol=0)
    assert np.allclose(lo2, ((lon2 + 180) % 360) - 180, atol=1e-12, rtol=0)
    assert np.allclose(a2, azi2, atol=1e-12, rtol=0)


def test_inverse_tiny_and_equator():
    g = wgs84()
    s, a1, a2 = g.inverse([0.0, 0.0], [0.0, 10.0], [0.0, 10.0],
                          [1e-6, 10.0 + 1e-6])
    assert s[0] == pytest.approx(0.11131949, abs=1e-4)
    # same point classes of input shouldn't blow up
    s0, _, _ = g.inverse(20.0, 30.0, 20.0, 30.0)
    assert abs(float(s0)) < 1e-6


def test_antipodal():
    g = wgs84()
    # Karney (2013) §5 worked example: azi1=25.67187286829, s12=19936288.579
    s, a1, a2 = g.inverse(0.0, 0.0, 0.5, 179.5)
    assert abs(float(s) - 19936288.579) < 0.01
    assert abs(float(a1) - 25.67187286829) < 1e-6


def test_sphere_great_circle():
    R = 6370997.0
    g = Geodesic(R, 0.0)
    s, a1, a2 = g.inverse(0.0, 0.0, 0.0, 90.0)
    assert abs(float(s) - R * np.pi / 2) < 1e-6
    s, a1, a2 = g.inverse(10.0, 20.0, 40.0, 20.0)
    assert abs(float(s) - R * np.radians(30.0)) < 1e-6


class TestPolygonArea:
    """Pinned against the reference's geodtest.c planimeter cases
    (Planimeter0/5/6/12/13/15 values)."""

    def _run(self, pts):
        import numpy as np

        from proj_ray.functions.geodesic import (geodesic,
                                                 polygon_area_perimeter)

        p = np.asarray(pts, dtype=float)
        return polygon_area_perimeter(geodesic(), p[:, 0], p[:, 1])

    def test_planimeter0_pole_encircling(self):
        area, per = self._run([[89, 0], [89, 90], [89, 180], [89, 270]])
        assert abs(per - 631819.8745) < 1e-4
        assert abs(area - 24952305678.0) < 1
        area, per = self._run([[-89, 0], [-89, 90], [-89, 180],
                               [-89, 270]])
        assert abs(per - 631819.8745) < 1e-4
        assert abs(area + 24952305678.0) < 1
        area, per = self._run([[0, -1], [-1, 0], [0, 1], [1, 0]])
        assert abs(per - 627598.2731) < 1e-3
        assert abs(area - 24619419146.0) < 1
        area, per = self._run([[90, 0], [0, 0], [0, 90]])
        assert abs(per - 30022685) < 1.5
        assert abs(area - 63758202715511.0) < 1

    def test_planimeter5_pole_crossing(self):
        area, per = self._run([[89, 0.1], [89, 90.1], [89, -179.9]])
        assert abs(per - 539297) < 1
        assert abs(area - 12476152838.5) < 1

    def test_planimeter6_hairline_slivers(self):
        for pts in ([[9, -0.00000000000001], [9, 180], [9, 0]],
                    [[9, 0.00000000000001], [9, 0], [9, 180]],
                    [[9, 0.00000000000001], [9, 180], [9, 0]],
                    [[9, -0.00000000000001], [9, 0], [9, 180]]):
            area, per = self._run(pts)
            assert abs(per - 36026861) < 1
            assert abs(area) < 1

    def test_planimeter12_arctic_circle_degenerate(self):
        area, per = self._run([[66.562222222, 0], [66.562222222, 180],
                               [66.562222222, 360]])
        assert abs(per - 10465729) < 1
        assert abs(area) < 1

    def test_planimeter13_double_pole_encircle(self):
        area, per = self._run([[89, -360], [89, -240], [89, -120],
                               [89, 0], [89, 120], [89, 240]])
        assert abs(per - 1160741) < 1
        assert abs(area - 32415230256.0) < 1

    def test_planimeter15_small_triangle(self):
        area, _ = self._run([[2, 1], [1, 2], [3, 3]])
        assert abs(area - 18454562325.45119) < 0.5
