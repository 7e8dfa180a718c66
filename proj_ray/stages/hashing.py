"""Vectorized hashing kernels over Arrow string columns.

Everything here operates on the raw UTF-8 buffer of a
``pyarrow.StringArray`` (zero-copy via ``np.frombuffer``) so the hot
paths are pure NumPy — no per-row Python.  Used by the text-analysis
and dedup stages (SURVEY.md §2.9) where the reference work would be a
per-document loop.

* ``arrow_string_bytes``  — (bytes, offsets) view of a string column.
* ``crc32_windows``       — zlib-compatible CRC-32 of every n-byte
                            sliding window (vectorized table lookups).
* ``crc32_segments``      — zlib-compatible CRC-32 of variable-length
                            segments (masked position loop, vectorized
                            across segments).
* ``rolling_hash_batch``  — per-document polynomial fingerprint mod
                            2^64 (uint64 wraparound).
* ``doc_shingles``        — per-document character n-gram shingle
                            hashes + segment offsets (minhash input).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

_CRC_POLY = np.uint32(0xEDB88320)


def _make_crc_table() -> np.ndarray:
    c = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        c = np.where(c & 1, (c >> 1) ^ _CRC_POLY, c >> 1)
    return c


_CRC_TABLE = _make_crc_table()


def arrow_string_bytes(arr) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-copy (utf8 bytes, int64 offsets rebased to 0) of a string
    array/chunked array; nulls read as empty strings."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        odtype, osize = np.int64, 8
    else:
        odtype, osize = np.int32, 4
    n = len(arr)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odtype, count=n + 1,
                        offset=arr.offset * osize).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    start = off[0]
    return data[start:off[-1]], off - start


def crc32_windows(data: np.ndarray, n: int) -> np.ndarray:
    """CRC-32 of every contiguous n-byte window of `data` (len-n+1
    results), identical to zlib.crc32 on each window."""
    m = len(data) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint32)
    crc = np.full(m, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(n):
        b = data[j:j + m]
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ np.uint32(0xFFFFFFFF)


def crc32_segments(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """CRC-32 of each variable-length segment
    data[offsets[i]:offsets[i+1]] — vectorized across segments by
    looping over byte POSITION (bounded by the longest segment)."""
    lens = np.diff(offsets)
    n_seg = len(lens)
    crc = np.full(n_seg, 0xFFFFFFFF, dtype=np.uint32)
    max_len = int(lens.max()) if n_seg else 0
    starts = offsets[:-1]
    for j in range(max_len):
        alive = lens > j
        idx = starts[alive] + j
        b = data[idx]
        c = crc[alive]
        crc[alive] = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return crc ^ np.uint32(0xFFFFFFFF)


def rolling_hash_batch(arr, base: int = 257) -> np.ndarray:
    """Per-document polynomial fingerprint
    ``sum(byte_i * base^(L-1-i)) mod 2**64`` over the raw UTF-8 bytes —
    the vectorized replacement for a per-byte Python loop."""
    data, off = arrow_string_bytes(arr)
    n = len(off) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(data) == 0:
        return out
    lens = np.diff(off)
    max_len = int(lens.max())
    pows = np.ones(max_len, dtype=np.uint64)
    if max_len > 1:
        pows[1:] = np.uint64(base)
        np.cumprod(pows, out=pows)  # wraps mod 2^64 by design
    doc_end = np.repeat(off[1:], lens)
    pos = np.arange(len(data), dtype=np.int64)
    exp = doc_end - 1 - pos
    terms = data.astype(np.uint64) * pows[exp]
    nz = lens > 0
    if np.any(nz):
        out[nz] = np.add.reduceat(terms, off[:-1][nz])
    return out


def doc_shingles(arr, n: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Character n-gram shingle hashes for every document in a string
    column.

    Returns (hashes int64, seg_offsets int64) where document i's
    shingles are hashes[seg_offsets[i]:seg_offsets[i+1]].  Documents
    shorter than n bytes contribute the CRC of their whole text (one
    shingle), matching the scalar fallback; empty docs contribute the
    CRC of b'' so every doc has >= 1 shingle.  Shingles are NOT
    deduplicated (min-hash is insensitive to duplicates; use
    np.unique per segment for set semantics).
    """
    data, off = arrow_string_bytes(arr)
    n_docs = len(off) - 1
    lens = np.diff(off)
    n_sh = np.maximum(lens - n + 1, 1)
    seg = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=seg[1:])
    out = np.empty(seg[-1], dtype=np.int64)

    if len(data) >= n:
        win = crc32_windows(data, n)  # window starting at each byte pos
        # windows fully inside doc i start at off[i] .. off[i+1]-n
        long_docs = lens >= n
        if np.any(long_docs):
            widx = _ranges(off[:-1][long_docs], (lens - n + 1)[long_docs])
            out_idx = _ranges(seg[:-1][long_docs], n_sh[long_docs])
            out[out_idx] = win[widx].astype(np.int64)
    short = lens < n
    if np.any(short):
        sub_off = np.zeros(int(short.sum()) + 1, dtype=np.int64)
        np.cumsum(lens[short], out=sub_off[1:])
        sub_data = data[_ranges(off[:-1][short], lens[short])] \
            if sub_off[-1] else np.empty(0, dtype=np.uint8)
        out[seg[:-1][short]] = crc32_segments(sub_data, sub_off) \
            .astype(np.int64)
    return out, seg


def crc32_spans(data: np.ndarray, starts: np.ndarray,
                lens: np.ndarray, reverse: bool = False) -> np.ndarray:
    """CRC-32 of arbitrary (start, len) spans of `data` (spans may be
    non-contiguous / overlapping); with reverse=True hashes each span's
    bytes back-to-front."""
    n_seg = len(starts)
    crc = np.full(n_seg, 0xFFFFFFFF, dtype=np.uint32)
    max_len = int(lens.max()) if n_seg else 0
    for j in range(max_len):
        alive = lens > j
        if reverse:
            idx = starts[alive] + lens[alive] - 1 - j
        else:
            idx = starts[alive] + j
        b = data[idx]
        c = crc[alive]
        crc[alive] = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return crc ^ np.uint32(0xFFFFFFFF)


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) \
        + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def segment_sorted_unique(values: np.ndarray, seg: np.ndarray):
    """Sort + dedupe each segment values[seg[i]:seg[i+1]].

    Returns (unique_values, new_seg) with each segment sorted ascending
    and duplicates removed — vectorized set semantics per document."""
    n_seg = len(seg) - 1
    counts = np.diff(seg)
    doc_idx = np.repeat(np.arange(n_seg, dtype=np.int64), counts)
    order = np.lexsort((values, doc_idx))
    v = values[order]
    d = doc_idx[order]
    keep = np.ones(len(v), dtype=bool)
    if len(v) > 1:
        keep[1:] = (v[1:] != v[:-1]) | (d[1:] != d[:-1])
    v = v[keep]
    d = d[keep]
    new_counts = np.bincount(d, minlength=n_seg).astype(np.int64)
    new_seg = np.zeros(n_seg + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_seg[1:])
    return v, new_seg


def _ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate arange(start, start+count) for each (start, count) —
    the standard vectorized 'multi-range' trick."""
    if int(counts.sum()) == 0:
        return np.empty(0, dtype=np.int64)
    return np.repeat(starts, counts).astype(np.int64) \
        + _within_offsets(counts)


def _within_offsets(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for the given counts."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.arange(total, dtype=np.int64)
    seg_start = np.repeat(counts.cumsum() - counts, counts)
    return idx - seg_start
