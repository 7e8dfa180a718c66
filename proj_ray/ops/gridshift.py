"""Grid-based datum shifts: hgridshift / vgridshift / generic gridshift
(reference src/transformations/{hgridshift,vgridshift,gridshift}.cpp;
bilinear interpolation and iterative inverse per
src/grids.cpp:3314-3497).

Grid sources:

* ``synth:<seed>,<west_deg>,<south_deg>,<res_deg>,<nx>,<ny>`` —
  deterministic synthetic displacement field (FIXTURES.md F5) for tests
  and benchmarks with full coverage (points outside pass through).
* ``<name>.gsb`` — NTv2 horizontal shift grid (binary reader mirroring
  src/grids.cpp NTv2 parsing: arc-second shifts, longitude positive
  west, columns stored east-to-west).
* ``<name>.gtx`` — GTX vertical shift grid (big-endian header of four
  doubles + two int32, float32 undulations, nodata -88.8888).
* ``null`` — the reference's whole-world zero grid.
* ``<file>.npz`` — local numpy archive (legacy test format).

File names resolve against the reference's test data directory with the
same renames its CMake applies for the test suite
(data/CMakeLists.txt:100-101: egm96_15_downsampled.gtx -> egm96_15.gtx,
ntv2_0_downsampled.gsb -> ntv2_0.gsb).

Comma-separated lists try each grid in order per point (grids.cpp
grid-collection semantics); points covered by no grid (or interpolating
across nodata cells) raise the outside-grid error for file grids, and
pass through unchanged for synthetic grids.
"""

from __future__ import annotations

import os

import numpy as np

from proj_ray.core import mathops as m
from proj_ray.core.coords import Coords, ERR_OUTSIDE_DOMAIN
from proj_ray.ops.base import RADIANS, Operation, Params, ProjError, register

ARCSEC_TO_RAD = m.DEG_TO_RAD / 3600.0
MAX_ITER = 10
TOL = 1e-12
GTX_NODATA = float(np.float32(-88.8888))

_DATA_DIR = "/root/reference/data"
_RENAMES = {
    "egm96_15.gtx": "tests/egm96_15_downsampled.gtx",
    "ntv2_0.gsb": "tests/ntv2_0_downsampled.gsb",
}


def resolve_grid_path(name: str):
    cands = []
    if name in _RENAMES:
        cands.append(os.path.join(_DATA_DIR, _RENAMES[name]))
    cands.append(os.path.join(_DATA_DIR, name))
    cands.append(os.path.join(_DATA_DIR, "tests", name))
    if os.path.isabs(name):
        cands.insert(0, name)
    for c in cands:
        if os.path.exists(c):
            return c
    return None


class ShiftGrid:
    """A lon/lat-regular displacement grid with bilinear sampling.

    Loaded once per worker (the stateful part of the actor-pool stage);
    mirrors the deferred-open semantics of hgridshift.cpp:55-58.
    """

    def __init__(self, west, south, res_lon, res_lat, values, nodata=None):
        self.west = float(west)   # radians
        self.south = float(south)
        self.res_lon = float(res_lon)
        self.res_lat = float(res_lat)
        self.values = np.asarray(values, dtype=np.float64)  # (ny, nx, k)
        self.ny, self.nx = self.values.shape[:2]
        self.nodata = nodata

    @staticmethod
    def synth(seed: int, west_deg: float, south_deg: float, res_deg: float,
              nx: int, ny: int, vertical: bool = False) -> "ShiftGrid":
        """Deterministic smooth displacement field, <= 2 arcsec / 2 m."""
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        ph1 = (seed % 97) / 97.0 * 2 * np.pi
        ph2 = (seed % 89) / 89.0 * 2 * np.pi
        a = 2.0 * np.sin(2 * np.pi * ii / nx + ph1) \
            * np.cos(2 * np.pi * jj / ny + ph2)
        b = 2.0 * np.cos(2 * np.pi * ii / (nx * 0.5 + 1) + ph2) \
            * np.sin(2 * np.pi * jj / (ny * 0.7 + 1) + ph1)
        if vertical:
            values = a[:, :, None]
        else:
            values = np.stack([a, b], axis=-1)
        res = res_deg * m.DEG_TO_RAD
        return ShiftGrid(west_deg * m.DEG_TO_RAD, south_deg * m.DEG_TO_RAD,
                         res, res, values)

    @staticmethod
    def null(k: int) -> "ShiftGrid":
        """Whole-world zero grid (the reference's 'null' grid)."""
        return ShiftGrid(-np.pi, -m.M_HALFPI, 2 * np.pi, np.pi,
                         np.zeros((2, 2, k)))

    def _norm_lon(self, lam):
        """Wrap longitude into [west, west + 2pi) (grids.cpp extent
        normalization for grids crossing the antimeridian)."""
        lam = np.asarray(lam, dtype=np.float64)
        return lam - 2 * np.pi * np.floor((lam - self.west) / (2 * np.pi))

    @property
    def full_world_lon(self):
        return self.res_lon * self.nx >= 2 * np.pi - 1e-9

    def interp(self, lam, phi):
        """Bilinear interpolation mirroring read_vgrid_value
        (grids.cpp:3696-3793): full-world grids wrap the east column to
        column 0; cells with 1-3 nodata corners renormalize over the
        valid corners; all-nodata cells (or out-of-extent points) are
        invalid.  Returns (values (n,k), valid (n,))."""
        lam = self._norm_lon(lam)
        fx = (lam - self.west) / self.res_lon
        fy = (np.asarray(phi) - self.south) / self.res_lat
        eps = 1e-9
        if self.full_world_lon:
            inside_x = np.ones(np.shape(fx), dtype=bool)
            fx = np.mod(fx, self.nx)
            ix = np.floor(fx).astype(np.int64) % self.nx
            ix2 = (ix + 1) % self.nx
        else:
            inside_x = (fx >= -eps) & (fx <= self.nx - 1 + eps)
            fx = np.clip(fx, 0, self.nx - 1)
            ix = np.clip(np.floor(fx).astype(np.int64), 0, self.nx - 2)
            ix2 = ix + 1
        inside = inside_x & (fy >= -eps) & (fy <= self.ny - 1 + eps)
        fy = np.clip(fy, 0, self.ny - 1)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, self.ny - 2)
        tx = fx - ix
        ty = fy - iy
        corners = (self.values[iy, ix], self.values[iy, ix2],
                   self.values[iy + 1, ix], self.values[iy + 1, ix2])
        weights = ((1 - tx) * (1 - ty), tx * (1 - ty),
                   (1 - tx) * ty, tx * ty)
        if self.nodata is None:
            out = sum(v * w[..., None] for v, w in zip(corners, weights))
            valid = inside
        else:
            total_w = 0.0
            out = 0.0
            any_valid = np.zeros(np.shape(fx), dtype=bool)
            for v, w in zip(corners, weights):
                ok = ~(((v == self.nodata) | (np.abs(v) > 1e7))
                       .any(axis=-1))
                any_valid |= ok
                wv = np.where(ok, w, 0.0)
                total_w = total_w + wv
                out = out + v * wv[..., None]
            out = out / np.where(total_w == 0, 1.0, total_w)[..., None]
            valid = inside & any_valid
        out = np.where(valid[..., None], out, 0.0)
        return out, valid

    def sample(self, lam, phi):
        """Bilinear interpolation; (n, k) shifts, zeros outside."""
        return self.interp(lam, phi)[0]

    def contains(self, lam, phi):
        return self.interp(lam, phi)[1]


def read_gtx(path: str) -> ShiftGrid:
    """GTX vertical grid: 40-byte big-endian header (south, west, dlat,
    dlon doubles; nrows, ncols int32), float32 rows south to north."""
    with open(path, "rb") as f:
        raw = f.read()
    south, west, dlat, dlon = np.frombuffer(raw, dtype=">f8", count=4)
    nrows, ncols = np.frombuffer(raw, dtype=">i4", count=2, offset=32)
    vals = np.frombuffer(raw, dtype=">f4", count=int(nrows) * int(ncols),
                         offset=40).astype(np.float64)
    values = vals.reshape(int(nrows), int(ncols))[:, :, None]
    return ShiftGrid(west * m.DEG_TO_RAD, south * m.DEG_TO_RAD,
                     dlon * m.DEG_TO_RAD, dlat * m.DEG_TO_RAD,
                     values, nodata=GTX_NODATA)


def read_ntv2(path: str):
    """NTv2 .gsb horizontal grids: 16-byte records, auto-detected
    endianness, arc-second shifts with longitude positive WEST stored
    east-to-west (grids.cpp NTv2 parsing).  Returns a list of subgrids,
    finest resolution first."""
    with open(path, "rb") as f:
        raw = f.read()
    le = int.from_bytes(raw[8:12], "little") == 11
    i4 = "<i4" if le else ">i4"
    f8 = "<f8" if le else ">f8"
    f4 = "<f4" if le else ">f4"

    def ival(off):
        return int(np.frombuffer(raw, dtype=i4, count=1, offset=off + 8)[0])

    def dval(off):
        return float(np.frombuffer(raw, dtype=f8, count=1, offset=off + 8)[0])

    num_file = ival(2 * 16)
    off = 11 * 16
    grids = []
    for _ in range(max(num_file, 1)):
        s_lat = dval(off + 4 * 16)
        w_long = dval(off + 7 * 16)
        e_long = dval(off + 6 * 16)
        lat_inc = dval(off + 8 * 16)
        long_inc = dval(off + 9 * 16)
        gs_count = ival(off + 10 * 16)
        ncols = int(round((w_long - e_long) / long_inc)) + 1
        nrows = gs_count // ncols
        rec = np.frombuffer(raw, dtype=f4, count=gs_count * 4,
                            offset=off + 11 * 16).astype(np.float64)
        rec = rec.reshape(nrows, ncols, 4)
        # lat shift arcsec; lon shift positive west -> negate for east;
        # columns run east->west -> flip so index increases eastward
        dlat = rec[:, ::-1, 0]
        dlon = -rec[:, ::-1, 1]
        values = np.stack([dlon, dlat], axis=-1)
        grids.append(ShiftGrid(-(w_long / 3600.0) * m.DEG_TO_RAD,
                               (s_lat / 3600.0) * m.DEG_TO_RAD,
                               (long_inc / 3600.0) * m.DEG_TO_RAD,
                               (lat_inc / 3600.0) * m.DEG_TO_RAD,
                               values))
        off += 11 * 16 + gs_count * 16
    grids.sort(key=lambda g: g.res_lon)
    return grids


def load_grids(spec: str, vertical: bool = False):
    """Resolve a +grids= spec (possibly comma-separated) to a list of
    ShiftGrids plus a strictness flag (True = error outside coverage)."""
    if spec.startswith("synth:"):  # synth specs embed commas: no list
        fields = spec[6:].split(",")
        if len(fields) != 6:
            raise ProjError("gridshift: synth spec needs 6 fields")
        seed, west, south, res, nx, ny = fields
        return [ShiftGrid.synth(int(seed), float(west), float(south),
                                float(res), int(nx), int(ny),
                                vertical=vertical)], False
    grids = []
    strict = False
    for part in spec.split(","):
        part = part.strip()
        optional = part.startswith("@")
        if optional:
            part = part[1:]
        if not part:
            continue
        if part == "null":
            grids.append(ShiftGrid.null(1 if vertical else 2))
            continue
        if part.endswith(".npz"):
            if not os.path.exists(part):
                raise ProjError(f"gridshift: grid file not found: {part}")
            data = np.load(part)
            west, south, res = (float(v) * m.DEG_TO_RAD
                                for v in data["meta"][:3])
            values = data["values"]
            if values.ndim == 2:
                values = values[:, :, None]
            grids.append(ShiftGrid(west, south, res, res, values))
            continue
        path = resolve_grid_path(part)
        if path is None:
            if optional:
                continue
            raise ProjError(f"unknown or unsupported grid format: {part!r} "
                            "(grid file not found)")
        strict = True
        if path.endswith(".gtx"):
            grids.append(read_gtx(path))
        elif path.endswith(".gsb"):
            grids.extend(read_ntv2(path))
        else:
            raise ProjError(
                f"unknown or unsupported grid format: {part!r}")
    if not grids:
        raise ProjError(f"gridshift: no usable grid in {spec!r}")
    return grids, strict


def validate_grid_spec(spec: str) -> bool:
    """True if every part of the spec is loadable (used by
    create_operation to gate nadgrids=/geoidgrids=)."""
    if spec.startswith("synth:"):
        return True
    for part in spec.split(","):
        part = part.strip().lstrip("@")
        if not part or part == "null":
            continue
        if part.endswith(".npz"):
            if not os.path.exists(part):
                return False
            continue
        if part.endswith((".gtx", ".gsb")):
            if resolve_grid_path(part) is None:
                return False
            continue
        return False
    return True


class _GridList:
    """Per-point first-covering-grid sampler over an ordered grid list."""

    def __init__(self, grids, k):
        self.grids = grids
        self.k = k

    def sample(self, lam, phi):
        n = np.shape(lam)[0] if np.ndim(lam) else 1
        out = np.zeros((n, self.k))
        found = np.zeros(n, dtype=bool)
        for g in self.grids:
            vals, valid = g.interp(lam, phi)
            take = valid & ~found
            if np.any(take):
                kk = min(self.k, vals.shape[-1])
                out[take, :kk] = vals[take, :kk]
            found |= valid
            if found.all():
                break
        return out, found


class _GridShiftBase(Operation):
    vertical = False

    def setup(self, params: Params) -> None:
        self.left = RADIANS
        self.right = RADIANS
        spec = params.s("grids")
        if not spec:
            raise ProjError("gridshift: +grids parameter missing")
        # deferred load: the grid opens on first use in each worker
        # (mirrors defer_grid_opening, hgridshift.cpp:55-58)
        self._spec = spec
        self._glist = None
        self._strict = None
        self.mult = params.f("multiplier", 1.0)
        # vertical: historical forward ADDS multiplier*N with default
        # multiplier -1 (vgridshift.cpp:199-204)
        self.fm = params.f("multiplier", -1.0)
        # time bracket (vgridshift.cpp:176-199, hgridshift.cpp identical):
        # when both +t_epoch and +t_final are set (nonzero), the shift is
        # applied only where t < t_epoch and t_final > t_epoch.
        self.t_epoch = params.f("t_epoch", 0.0)
        self.t_final = 0.0
        if params.has("t_final"):
            raw = params.s("t_final", "")
            try:
                self.t_final = float(raw)
            except (TypeError, ValueError):
                if raw == "now":
                    import time

                    now = time.localtime()
                    # reference: 1900 + tm_year + tm_yday/365 (tm_year is
                    # years since 1900; Python's is the full year)
                    self.t_final = now.tm_year + now.tm_yday / 365.0
        # fail fast on unresolvable specs (reference errors at init too)
        if not validate_grid_spec(spec):
            raise ProjError(f"unknown or unsupported grid format: {spec!r} "
                            "(grid file not found)")

    @property
    def glist(self) -> _GridList:
        if self._glist is None:
            grids, strict = load_grids(self._spec, vertical=self.vertical)
            if isinstance(self, GridShift):
                k = max(g.values.shape[-1] for g in grids)
            else:
                k = 1 if self.vertical else 2
            self._glist = _GridList(grids, k)
            self._strict = strict
        return self._glist

    @property
    def grid(self) -> ShiftGrid:
        return self.glist.grids[0]

    def _miss(self, c: Coords, found) -> None:
        if self._strict:
            bad = ~found
            c.set_error(bad, ERR_OUTSIDE_DOMAIN)
            c.x = np.where(bad, np.nan, c.x)
            c.y = np.where(bad, np.nan, c.y)
            c.z = np.where(bad, np.nan, c.z)

    def _time_mask(self, c: Coords):
        """Per-point application mask for the +t_epoch/+t_final bracket
        (vgridshift.cpp:102-151): with both set, shift only points with
        t < t_epoch, and only if t_final > t_epoch."""
        if self.t_final == 0.0 or self.t_epoch == 0.0:
            return None
        if not (self.t_final > self.t_epoch):
            return np.zeros(c.x.shape, dtype=bool)
        return c.t < self.t_epoch

    def _apply(self, c: Coords, direction: int) -> None:
        mask = self._time_mask(c)
        if mask is not None:
            if not np.any(mask):
                return
            keep = c.copy()
            self._apply_all(c, direction)
            off = ~mask
            c.x = np.where(off, keep.x, c.x)
            c.y = np.where(off, keep.y, c.y)
            c.z = np.where(off, keep.z, c.z)
            c.err = np.where(off, keep.err, c.err).astype(keep.err.dtype)
            return
        self._apply_all(c, direction)

    def _apply_all(self, c: Coords, direction: int) -> None:
        gl = self.glist
        lam, phi, z = c.x, c.y, c.z
        if self.vertical:
            s, found = gl.sample(lam, phi)
            c.z = z + direction * s[:, 0] * self.fm
            self._miss(c, found)
            return
        if direction > 0:
            s, found = gl.sample(lam, phi)
            c.x = lam + s[:, 0] * (ARCSEC_TO_RAD * self.mult)
            c.y = phi + s[:, 1] * (ARCSEC_TO_RAD * self.mult)
            self._miss(c, found)
            return
        # inverse: fixed point x_{k+1} = target - shift(x_k)
        lam_c = lam.copy()
        phi_c = phi.copy()
        found = np.ones(lam.shape, dtype=bool)
        for _ in range(MAX_ITER):
            s, found = gl.sample(lam_c, phi_c)
            lam_n = lam - s[:, 0] * (ARCSEC_TO_RAD * self.mult)
            phi_n = phi - s[:, 1] * (ARCSEC_TO_RAD * self.mult)
            done = (np.abs(lam_n - lam_c) < TOL) \
                & (np.abs(phi_n - phi_c) < TOL)
            lam_c = lam_n
            phi_c = phi_n
            if np.all(done):
                break
        c.x = lam_c
        c.y = phi_c
        self._miss(c, found)


@register
class HGridShift(_GridShiftBase):
    name = "hgridshift"
    vertical = False

    def _fwd(self, c: Coords) -> None:
        self._apply(c, +1)

    def _inv(self, c: Coords) -> None:
        self._apply(c, -1)


@register
class VGridShift(_GridShiftBase):
    name = "vgridshift"
    vertical = True

    def _fwd(self, c: Coords) -> None:
        self._apply(c, +1)

    def _inv(self, c: Coords) -> None:
        self._apply(c, -1)


@register
class GridShift(_GridShiftBase):
    """Generic multi-channel grid shift (reference gridshift.cpp):
    lam/lat/z shifts simultaneously from a multi-channel grid."""

    name = "gridshift"

    def _fwd(self, c: Coords) -> None:
        gl = self.glist
        s, found = gl.sample(c.x, c.y)
        k = s.shape[-1]
        if k >= 2:
            c.x = c.x + s[:, 0] * ARCSEC_TO_RAD
            c.y = c.y + s[:, 1] * ARCSEC_TO_RAD
        if k >= 3:
            c.z = c.z - s[:, 2]
        self._miss(c, found)

    def _inv(self, c: Coords) -> None:
        gl = self.glist
        lam_t, phi_t = c.x, c.y
        lam_c = lam_t.copy()
        phi_c = phi_t.copy()
        found = np.ones(lam_t.shape, dtype=bool)
        for _ in range(MAX_ITER):
            s, found = gl.sample(lam_c, phi_c)
            lam_n = lam_t - s[:, 0] * ARCSEC_TO_RAD
            phi_n = phi_t - s[:, 1] * ARCSEC_TO_RAD
            done = (np.abs(lam_n - lam_c) < TOL) \
                & (np.abs(phi_n - phi_c) < TOL)
            lam_c = lam_n
            phi_c = phi_n
            if np.all(done):
                break
        s, found = gl.sample(lam_c, phi_c)
        c.x = lam_c
        c.y = phi_c
        if s.shape[-1] >= 3:
            c.z = c.z + s[:, 2]
        self._miss(c, found)


def read_ctable2(path: str) -> ShiftGrid:
    """CTable2 horizontal grid: 160-byte little-endian header with west,
    south, resX, resY doubles (radians) at offset 96 and width/height
    int32 at 128; float32 (longShift, latShift) pairs west-to-east,
    south-to-north, stored raw (grids.cpp CTable2Grid::open/valueAt —
    no NTv2 sign convention)."""
    with open(path, "rb") as f:
        raw = f.read()
    west, south, res_x, res_y = np.frombuffer(raw, dtype="<f8", count=4,
                                              offset=96)
    width, height = np.frombuffer(raw, dtype="<i4", count=2, offset=128)
    vals = np.frombuffer(raw, dtype="<f4", count=int(width) * int(height) * 2,
                         offset=160).astype(np.float64)
    values = vals.reshape(int(height), int(width), 2)
    return ShiftGrid(west, south, res_x, res_y, values)
