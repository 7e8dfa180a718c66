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
