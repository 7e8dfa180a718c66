"""Minimal Geodetic TIFF Grid (GTG) reader — pure NumPy, no libtiff.

Implements the subset of TIFF 6.0 / BigTIFF that PROJ's grid catalog
uses (reference src/grids.cpp GTiffGrid/GTiffDataset, ~l.400-1350):

* classic (magic 42) and BigTIFF (43), either endianness
* strips and tiles, chunky (PlanarConfig=1) and separate (=2) layout
* compression: none (1) and DEFLATE (8/32946), with the horizontal (2)
  and floating-point (3) predictors
* sample types Int16/UInt16/Int32/UInt32/Float32/Float64 (8-bit and
  exotic types rejected, as the reference does)
* georeferencing via ModelPixelScale+ModelTiepoint or
  ModelTransformation; GeoKey RasterTypeGeoKey pixel-is-point vs
  pixel-is-area; bottom-up rasters; geographic vs projected CRS
* GDAL_METADATA XML (per-sample DESCRIPTION / UNITTYPE /
  positive_value / SCALE / OFFSET and dataset-level TYPE / grid_name /
  parent_grid_name / interpolation_method / constant_offset),
  GDAL_NODATA
* multiple IFDs: subgrids kept, overviews (SubfileType=1) skipped

Grids load fully into worker memory (PROJ block-caches instead —
grids.cpp:406; our grids are broadcast side inputs, read once per
worker, so a dense array is the right trade for map_batches kernels).
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from proj_ray.core import mathops as m

# TIFF data type -> (struct char, size)
_TYPE_INFO = {
    1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8), 13: ("I", 4), 16: ("Q", 8), 17: ("q", 8),
    18: ("Q", 8),
}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_W = 322
_TAG_TILE_H = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_BYTES = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_SUBFILE_TYPE = 254
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_TRANSFORM = 34264
_TAG_GEO_KEYS = 34735
_TAG_GDAL_METADATA = 42112
_TAG_GDAL_NODATA = 42113


class TiffError(Exception):
    pass


def _read_ifds(raw: bytes):
    """Parse every IFD into {tag: numpy array / bytes}."""
    if raw[:2] == b"II":
        e = "<"
    elif raw[:2] == b"MM":
        e = ">"
    else:
        raise TiffError("not a TIFF")
    magic = struct.unpack(e + "H", raw[2:4])[0]
    big = magic == 43
    if magic not in (42, 43):
        raise TiffError("bad TIFF magic")
    if big:
        off = struct.unpack(e + "Q", raw[8:16])[0]
        nfmt, nsize, esize, osize, ofmt = "Q", 8, 20, 8, "Q"
    else:
        off = struct.unpack(e + "I", raw[4:8])[0]
        nfmt, nsize, esize, osize, ofmt = "H", 2, 12, 4, "I"
    ifds = []
    while off:
        n = struct.unpack(e + nfmt, raw[off:off + nsize])[0]
        tags = {}
        base = off + nsize
        for i in range(n):
            ent = raw[base + i * esize: base + (i + 1) * esize]
            tag, typ = struct.unpack(e + "HH", ent[:4])
            if big:
                cnt = struct.unpack(e + "Q", ent[4:12])[0]
                inline = ent[12:20]
            else:
                cnt = struct.unpack(e + "I", ent[4:8])[0]
                inline = ent[8:12]
            if typ not in _TYPE_INFO:
                continue
            ch, sz = _TYPE_INFO[typ]
            total = sz * cnt
            if total <= osize:
                data = inline[:total]
            else:
                voff = struct.unpack(e + ofmt, inline[:osize])[0]
                data = raw[voff:voff + total]
            if typ == 2:  # ASCII
                tags[tag] = data.rstrip(b"\x00").decode("latin-1",
                                                        errors="replace")
            elif typ in (5, 10):  # rationals: ignore (unused here)
                tags[tag] = data
            else:
                tags[tag] = np.frombuffer(data, dtype=e + ch, count=cnt)
        ifds.append(tags)
        next_off = base + n * esize
        off = struct.unpack(e + ofmt, raw[next_off:next_off + osize])[0]
    return ifds, e


def _scalar(tags, tag, default=None):
    v = tags.get(tag)
    if v is None:
        return default
    return int(np.asarray(v).ravel()[0])


def _parse_gdal_metadata(xml: str) -> Tuple[Dict[str, str],
                                            Dict[int, Dict[str, str]]]:
    """GDAL_METADATA XML -> (dataset items, per-sample items)."""
    ds_items: Dict[str, str] = {}
    sample_items: Dict[int, Dict[str, str]] = {}
    for attrs, text in re.findall(r"<Item\b([^>]*)>(.*?)</Item>", xml,
                                  re.DOTALL):
        name = re.search(r'name="([^"]*)"', attrs)
        if not name:
            continue
        sample = re.search(r'sample="(\d+)"', attrs)
        text = text.strip()
        # minimal XML entity decode
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"),
                        ("&quot;", '"'), ("&#10;", "\n")):
            text = text.replace(ent, ch)
        if sample is None:
            ds_items[name.group(1)] = text
        else:
            sample_items.setdefault(int(sample.group(1)), {})[
                name.group(1)] = text
    return ds_items, sample_items


def _decode_fp_predictor(data: np.ndarray, width: int, nbytes: int,
                         stride_vals: int) -> np.ndarray:
    """TIFF predictor 3 (floating point): per row, bytes are stored as
    byte-planes with horizontal differencing; rebuild big-endian bytes
    per value (tif_predict.c fpAcc)."""
    rows = data.reshape(-1, stride_vals * nbytes)
    acc = np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)
    planes = acc.reshape(rows.shape[0], nbytes, stride_vals)
    # value i's big-endian bytes are planes[:, :, i]
    be = np.transpose(planes, (0, 2, 1))  # (rows, vals, nbytes)
    return np.ascontiguousarray(be)


def _dtype_for(fmt: int, bits: int, e: str) -> np.dtype:
    key = {(1, 16): "u2", (1, 32): "u4", (2, 16): "i2", (2, 32): "i4",
           (3, 32): "f4", (3, 64): "f8"}.get((fmt, bits))
    if key is None:
        raise TiffError(f"unsupported sample type fmt={fmt} bits={bits}")
    return np.dtype(e + key)


class GTiffGrid:
    """One IFD decoded to a dense (ny, nx, spp) float64 array with NaN
    nodata, plus GTG metadata.  Row 0 is SOUTH (bottom-up normalized)."""

    def __init__(self, tags, e: str, raw: bytes, name: str, ifd_index: int):
        self.name = name
        self.ifd_index = ifd_index
        width = _scalar(tags, _TAG_WIDTH)
        height = _scalar(tags, _TAG_HEIGHT)
        if not width or not height:
            raise TiffError("missing dimensions")
        spp = _scalar(tags, _TAG_SPP, 1)
        bits_arr = np.asarray(tags.get(_TAG_BITS, [32])).ravel()
        fmt_arr = np.asarray(tags.get(_TAG_SAMPLE_FORMAT, [1])).ravel()
        bits = int(bits_arr[0])
        fmt = int(fmt_arr[0])
        if len(set(bits_arr.tolist())) > 1 or len(set(fmt_arr.tolist())) > 1:
            raise TiffError("mixed sample types not supported")
        dtype = _dtype_for(fmt, bits, e)
        nbytes = dtype.itemsize
        comp = _scalar(tags, _TAG_COMPRESSION, 1)
        if comp not in (1, 8, 32946):
            raise TiffError(f"unsupported compression {comp}")
        pred = _scalar(tags, _TAG_PREDICTOR, 1)
        planar = _scalar(tags, _TAG_PLANAR, 1)
        self.subfile_type = _scalar(tags, _TAG_SUBFILE_TYPE, 0)

        arr = np.empty((height, width, spp), dtype=np.float64)
        tiled = _TAG_TILE_OFFSETS in tags

        def _decode_chunk(buf: bytes, n_vals_row: int, n_rows: int,
                          n_comp: int) -> np.ndarray:
            """One strip/tile -> (n_rows, n_vals_row*n_comp) float64."""
            if comp != 1:
                buf = zlib.decompress(buf)
            row_vals = n_vals_row * n_comp
            if pred == 3:
                b = np.frombuffer(buf, dtype=np.uint8,
                                  count=n_rows * row_vals * nbytes)
                be = _decode_fp_predictor(b, n_vals_row, nbytes, row_vals)
                vals = np.frombuffer(be.tobytes(),
                                     dtype=np.dtype(">" + dtype.str[1:]))
            else:
                vals = np.frombuffer(buf, dtype=dtype,
                                     count=n_rows * row_vals)
                if pred == 2:
                    v = vals.reshape(n_rows, n_vals_row, n_comp)
                    vals = np.cumsum(v, axis=1, dtype=v.dtype)
            return np.asarray(vals, dtype=np.float64) \
                .reshape(n_rows, row_vals)

        if tiled:
            tw = _scalar(tags, _TAG_TILE_W)
            th = _scalar(tags, _TAG_TILE_H)
            toffs = np.asarray(tags[_TAG_TILE_OFFSETS]).ravel()
            tbytes = np.asarray(tags[_TAG_TILE_BYTES]).ravel()
            tx = (width + tw - 1) // tw
            ty = (height + th - 1) // th
            per_plane = tx * ty
            n_planes = spp if planar == 2 else 1
            n_comp = 1 if planar == 2 else spp
            for p in range(n_planes):
                for t in range(per_plane):
                    i = p * per_plane + t
                    buf = raw[toffs[i]:toffs[i] + tbytes[i]]
                    chunk = _decode_chunk(buf, tw, th, n_comp)
                    r0 = (t // tx) * th
                    c0 = (t % tx) * tw
                    rows = min(th, height - r0)
                    cols = min(tw, width - c0)
                    block = chunk.reshape(th, tw, n_comp)
                    if planar == 2:
                        arr[r0:r0 + rows, c0:c0 + cols, p] = \
                            block[:rows, :cols, 0]
                    else:
                        arr[r0:r0 + rows, c0:c0 + cols, :] = \
                            block[:rows, :cols, :]
        else:
            rps = _scalar(tags, _TAG_ROWS_PER_STRIP, height)
            soffs = np.asarray(tags[_TAG_STRIP_OFFSETS]).ravel()
            sbytes = np.asarray(tags[_TAG_STRIP_BYTES]).ravel()
            per_plane = (height + rps - 1) // rps
            n_planes = spp if planar == 2 else 1
            n_comp = 1 if planar == 2 else spp
            for p in range(n_planes):
                for s in range(per_plane):
                    i = p * per_plane + s
                    r0 = s * rps
                    rows = min(rps, height - r0)
                    buf = raw[soffs[i]:soffs[i] + sbytes[i]]
                    chunk = _decode_chunk(buf, width, rows, n_comp)
                    block = chunk.reshape(rows, width, n_comp)
                    if planar == 2:
                        arr[r0:r0 + rows, :, p] = block[:, :, 0]
                    else:
                        arr[r0:r0 + rows, :, :] = block

        # ---- metadata ----
        meta_xml = tags.get(_TAG_GDAL_METADATA, "")
        self.ds_meta, self.sample_meta = _parse_gdal_metadata(meta_xml) \
            if meta_xml else ({}, {})
        nodata = tags.get(_TAG_GDAL_NODATA)
        self.nodata = float(nodata) if nodata not in (None, "") else None

        # per-sample scale/offset
        for s in range(spp):
            sm = self.sample_meta.get(s, {})
            scale = float(sm["SCALE"]) if "SCALE" in sm else 1.0
            offset = float(sm["OFFSET"]) if "OFFSET" in sm else 0.0
            if self.nodata is not None:
                # data may carry the float32-rounded image of the
                # ASCII nodata value: match either representation
                nd = (arr[:, :, s] == self.nodata) \
                    | (arr[:, :, s] == float(np.float32(self.nodata)))
            else:
                nd = None
            if scale != 1.0 or offset != 0.0:
                arr[:, :, s] = arr[:, :, s] * scale + offset
            if nd is not None:
                arr[:, :, s][nd] = np.nan

        # ---- georeferencing ----
        geo_keys = np.asarray(tags.get(_TAG_GEO_KEYS, [])).ravel()
        model_type = 2  # default geographic
        raster_type = 1  # default PixelIsArea
        for i in range(4, len(geo_keys), 4):
            kid, loc, cnt, val = geo_keys[i:i + 4]
            if kid == 1024:
                model_type = int(val)
            elif kid == 1025:
                raster_type = int(val)
        self.geographic = model_type != 1

        trans = tags.get(_TAG_TRANSFORM)
        if trans is not None and len(np.asarray(trans).ravel()) == 16:
            mtx = np.asarray(trans).ravel()
            if mtx[1] != 0 or mtx[4] != 0:
                raise TiffError("rotational geotransform unsupported")
            west = float(mtx[3])
            h_res = float(mtx[0])
            north = float(mtx[7])
            v_res = -float(mtx[5])
        else:
            scale_t = tags.get(_TAG_PIXEL_SCALE)
            tie = tags.get(_TAG_TIEPOINT)
            if scale_t is None or tie is None:
                raise TiffError("missing georeferencing")
            scale_t = np.asarray(scale_t).ravel()
            tie = np.asarray(tie).ravel()
            h_res = float(scale_t[0])
            v_res = float(scale_t[1])
            west = float(tie[3]) - float(tie[0]) * h_res
            north = float(tie[4]) + float(tie[1]) * v_res
        if raster_type == 1:  # PixelIsArea: values at cell centers
            west += 0.5 * h_res
            north -= 0.5 * v_res
        mul = m.DEG_TO_RAD if self.geographic else 1.0
        bottom_up = v_res < 0
        self.res_x = h_res * mul
        self.res_y = abs(v_res) * mul
        self.west = west * mul
        north_r = north * mul
        if bottom_up:
            # stored south-up already: north var actually holds south edge
            self.south = north_r
        else:
            self.south = north_r - self.res_y * (height - 1)
            arr = arr[::-1]  # normalize: row 0 = south
        self.values = np.ascontiguousarray(arr)
        self.ny, self.nx = height, width
        self.spp = spp

    # -- metadata helpers (grids.cpp metadataItem analogues) --

    def item(self, key: str, sample: int = -1) -> str:
        if sample < 0:
            return self.ds_meta.get(key, "")
        return self.sample_meta.get(sample, {}).get(key, "")

    def description(self, s: int) -> str:
        return self.item("DESCRIPTION", s)

    def unit(self, s: int) -> str:
        return self.item("UNITTYPE", s)

    @property
    def east(self) -> float:
        return self.west + self.res_x * (self.nx - 1)

    @property
    def north(self) -> float:
        return self.south + self.res_y * (self.ny - 1)

    @property
    def area(self) -> float:
        return (self.east - self.west) * (self.north - self.south)

    def contains(self, x, y, eps: float = 0.0):
        """Vectorized point-in-extent with geographic wrap
        (grids.cpp isPointInExtent)."""
        x = np.asarray(x, dtype=np.float64).copy()
        y = np.asarray(y, dtype=np.float64)
        ok_y = (y + eps >= self.south) & (y - eps <= self.north)
        if self.geographic:
            full = self.res_x * self.nx >= 2 * np.pi - 1e-9
            if full:
                return ok_y
            x = np.where(x + eps < self.west, x + 2 * np.pi, x)
            x = np.where(x - eps > self.east, x - 2 * np.pi, x)
        return ok_y & (x + eps >= self.west) & (x - eps <= self.east)


def read_geotiff(path: str) -> List[GTiffGrid]:
    """All non-overview IFDs of a GTG file, file order preserved."""
    with open(path, "rb") as f:
        raw = f.read()
    ifds, e = _read_ifds(raw)
    grids = []
    name = path.rsplit("/", 1)[-1]
    for idx, tags in enumerate(ifds):
        sub = _scalar(tags, _TAG_SUBFILE_TYPE, 0)
        if sub not in (0, 2):  # skip overviews etc. (grids.cpp:1533)
            if idx == 0:
                raise TiffError("invalid subfileType on first IFD")
            continue
        g = GTiffGrid(tags, e, raw, name, idx)
        grids.append(g)
    if not grids:
        raise TiffError("no usable IFD")
    return grids
