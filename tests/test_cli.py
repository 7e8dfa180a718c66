"""proj/cct-style CLI (SURVEY.md §3.2 text-filter path)."""

import subprocess
import sys


def _run(args, stdin=""):
    return subprocess.run(
        [sys.executable, "-m", "proj_ray.cli", *args],
        input=stdin, capture_output=True, text=True, cwd="/root/repo")


def test_proj_forward_dms_and_errors():
    r = _run(["proj", "+proj=utm", "+zone=32", "+ellps=WGS84"],
             "9 45\n12d30'E 45d30'N\n# comment\n200 95\n")
    assert r.returncode == 0
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 3  # comment skipped
    x0, y0 = map(float, lines[0].split())
    assert abs(x0 - 500000.0) < 0.01  # central meridian easting
    assert lines[2].startswith("*")   # invalid latitude -> proj-style *


def test_cct_inverse_cart_reference_example():
    # the reference manual's cct example: cart inverse of an ECEF point
    r = _run(["cct", "-d", "4", "+proj=cart", "+ellps=GRS80", "-I"],
             "3541657.3778 948984.2343 5201383.5231 2020.5\n")
    vals = r.stdout.split()
    assert vals[0] == "15.0000" and vals[1] == "55.0000"
    assert vals[3] == "2020.5000"


def test_proj_roundtrip():
    r = _run(["proj", "+proj=merc", "+ellps=WGS84"], "12.5 55.5\n")
    x, y = map(float, r.stdout.split())
    r2 = _run(["proj", "-I", "-d", "7", "+proj=merc", "+ellps=WGS84"],
              f"{x} {y}\n")
    lon, lat = map(float, r2.stdout.split())
    assert abs(lon - 12.5) < 1e-6 and abs(lat - 55.5) < 1e-6


def test_cs2cs_epsg_pair():
    r = _run(["cs2cs", "EPSG:4326", "EPSG:25832"], "9 45 0\n")
    x, y = map(float, r.stdout.split()[:2])
    assert abs(x - 500000.0) < 0.01
    assert abs(y - 4982950.4) < 0.01


def test_cs2cs_plus_to_syntax():
    r = _run(["cs2cs", "+proj=longlat", "+datum=WGS84", "+to",
              "+proj=utm", "+zone=32", "+ellps=WGS84"], "9 45 0\n")
    x = float(r.stdout.split()[0])
    assert abs(x - 500000.0) < 0.01


def test_geod_forward_manual_example():
    # reference manual (docs/source/apps/geod.rst): Boston -> Portland
    # by azimuth and distance, clrk66 in US statute miles
    r = _run(["geod", "+ellps=clrk66", "+units=us-mi"],
             "42d15'N 71d07'W -66d31'50.141\" 2587.504\n")
    assert r.returncode == 0
    assert r.stdout.split() == [
        '45d31\'0.003"N', '123d40\'59.985"W', '75d39\'13.094"']


def test_geod_inverse_manual_example():
    r = _run(["geod", "-I", "+ellps=clrk66", "+units=us-mi"],
             "42d15'N 71d07'W 45d31'N 123d41'W\n")
    assert r.returncode == 0
    assert r.stdout.split() == [
        "-66d31'50.141\"", "75d39'13.083\"", "2587.504"]


def test_geod_fullout_decimal_and_posazi():
    r = _run(["geod", "-I", "-a", "-p", "-f", "%.6f", "+ellps=WGS84"],
             "40.0 -70.0 45.0 -120.0\n")
    vals = r.stdout.split()
    assert len(vals) == 7
    assert float(vals[0]) == 40.0 and float(vals[1]) == -70.0
    azi12, azi21 = float(vals[4]), float(vals[5])
    assert 0 <= azi12 < 360 and 0 <= azi21 < 360  # -p positive azimuths
    # distance sanity: ~4100 km for 50 deg of longitude at mid-latitudes
    assert 3.9e6 < float(vals[6]) < 4.4e6


def test_geod_line_mode_intermediate_points():
    # n_S=4 between two points: 5 output rows, first/last are the
    # endpoints (do_geod semantics)
    r = _run(["geod", "-f", "%.6f", "+ellps=WGS84", "+lat_1=40",
              "+lon_1=-70", "+lat_2=45", "+lon_2=-120", "+n_S=4"])
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 5
    first = [float(v) for v in lines[0].split()]
    last = [float(v) for v in lines[-1].split()]
    assert first == [40.0, -70.0]
    assert abs(last[0] - 45.0) < 1e-6 and abs(last[1] + 120.0) < 1e-6


WKT_UTM32 = ('PROJCS["WGS 84 / UTM zone 32N",GEOGCS["WGS 84",'
             'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
             '298.257223563]],PRIMEM["Greenwich",0],'
             'UNIT["degree",0.0174532925199433]],'
             'PROJECTION["Transverse_Mercator"],'
             'PARAMETER["latitude_of_origin",0],'
             'PARAMETER["central_meridian",9],'
             'PARAMETER["scale_factor",0.9996],'
             'PARAMETER["false_easting",500000],'
             'PARAMETER["false_northing",0],UNIT["metre",1]]')


def test_cs2cs_wkt_argument():
    # WKT CRS text as one shell token, paired with a proj string
    r = _run(["cs2cs", "+proj=longlat", "+ellps=WGS84", "+to",
              WKT_UTM32], "9 45 0\n")
    assert r.returncode == 0, r.stderr
    x, y = map(float, r.stdout.split()[:2])
    assert abs(x - 500000.0) < 0.01


def test_cs2cs_projjson_argument():
    import json

    pj = json.dumps({
        "type": "GeographicCRS", "name": "WGS 84",
        "datum": {"type": "GeodeticReferenceFrame",
                  "name": "World Geodetic System 1984",
                  "ellipsoid": {"name": "WGS 84",
                                "semi_major_axis": 6378137,
                                "inverse_flattening": 298.257223563}},
    })
    r = _run(["cs2cs", pj, WKT_UTM32], "9 45 0\n")
    assert r.returncode == 0, r.stderr
    x, _ = map(float, r.stdout.split()[:2])
    assert abs(x - 500000.0) < 0.01


def test_proj_list_operations():
    r = _run(["proj", "-l"])
    assert r.returncode == 0
    lines = r.stdout.strip().splitlines()
    assert len(lines) >= 180
    assert any(ln.startswith("tmerc : ") for ln in lines)
    assert any(ln.startswith("utm : ") for ln in lines)
