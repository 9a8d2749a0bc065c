"""Geohash cell indexing — the engine's tile scheme, numpy-vectorized.

Bit-exact with reference ``src/Spatial4n/Util/GeohashUtils.cs``:
- base-32 alphabet 0-9 b-z minus a,i,l,o (:40-44), sorted
- encode: lon-first bit interleave, ``value > mid`` goes to the upper half
  (:90-144 — note strictly-greater, not >=)
- decode to bbox via inverse subdivision (:170-216)
- 32 sorted children per cell (:219-228); per-level cell sizes divide the
  world by 8,4 alternating (:252-279); max precision 24 (:65)

Golden vectors (tests/Spatial4n.Tests/Util/TestGeohashUtils.cs:32-40):
(42.6,-5.6)->'ezs42e44yx96', (57.64911,10.40744)->'u4pruydqqvj8'.

The encode loop runs 5*precision vectorized passes over the whole batch —
no per-row Python — and is the cell-encode UDF of the engine.
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.kernels.norm import norm_lat_deg, norm_lon_deg

# sorted geohash alphabet: 0-9 then b..z excluding a,i,l,o (GeohashUtils.cs:40-44)
BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
assert len(BASE32) == 32
_BASE32_BYTES = np.frombuffer(BASE32.encode("ascii"), dtype=np.uint8)
_CHAR_TO_INDEX = np.full(128, -1, dtype=np.int8)
for _i, _c in enumerate(BASE32):
    _CHAR_TO_INDEX[ord(_c)] = _i
    _CHAR_TO_INDEX[ord(_c.upper())] = _i

MAX_PRECISION = 24


def geohash_encode(lat, lon, precision: int = 12):
    """Vectorized geohash encode. Returns numpy array of ASCII bytes objects.

    GeohashUtils.EncodeLatLon (GeohashUtils.cs:90-144). Exact binary
    subdivision with the reference's strictly-greater-than-midpoint rule,
    so seam coordinates (0.0, etc.) land in the same cell as the reference.
    """
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat, lon = np.broadcast_arrays(lat, lon)
    n = lat.shape[0]
    lo_lon = np.full(n, -180.0)
    hi_lon = np.full(n, 180.0)
    lo_lat = np.full(n, -90.0)
    hi_lat = np.full(n, 90.0)
    chars = np.empty((n, precision), dtype=np.uint8)
    ch = np.zeros(n, dtype=np.int32)
    bit = 0
    pos = 0
    even = True
    for _ in range(precision * 5):
        if even:
            mid = (lo_lon + hi_lon) * 0.5
            upper = lon > mid
            lo_lon = np.where(upper, mid, lo_lon)
            hi_lon = np.where(upper, hi_lon, mid)
        else:
            mid = (lo_lat + hi_lat) * 0.5
            upper = lat > mid
            lo_lat = np.where(upper, mid, lo_lat)
            hi_lat = np.where(upper, hi_lat, mid)
        ch = (ch << 1) | upper.astype(np.int32)
        even = not even
        bit += 1
        if bit == 5:
            chars[:, pos] = _BASE32_BYTES[ch]
            pos += 1
            bit = 0
            ch = np.zeros(n, dtype=np.int32)
    # contiguous uint8 (n, p) -> one fixed-width bytes value per row
    out = np.ascontiguousarray(chars).view(f"S{precision}").reshape(n)
    return out


def geohash_encode_str(lat, lon, precision: int = 12):
    """Like geohash_encode but returns a list of python str."""
    return [b.decode("ascii") for b in geohash_encode(lat, lon, precision)]


def _hash_matrix(hashes) -> np.ndarray:
    """list/array of equal-length geohash strings -> (n, p) char-index matrix."""
    arr = np.asarray(hashes, dtype=bytes)
    if arr.dtype.kind != "S":
        arr = np.char.encode(arr.astype(str), "ascii")
    p = arr.dtype.itemsize
    mat = arr.view(np.uint8).reshape(len(arr), p)
    idx = _CHAR_TO_INDEX[mat]
    if (idx < 0).any():
        bad = np.argwhere(idx < 0)[0]
        raise ValueError(f"invalid geohash character in row {bad[0]}")
    return idx


def geohash_decode_bbox(hashes):
    """Vectorized decode to (min_x, max_x, min_y, max_y). GeohashUtils.cs:170-216."""
    idx = _hash_matrix(hashes)
    n, p = idx.shape
    min_x = np.full(n, -180.0)
    max_x = np.full(n, 180.0)
    min_y = np.full(n, -90.0)
    max_y = np.full(n, 90.0)
    even = True
    for i in range(p):
        cd = idx[:, i]
        for mask in (16, 8, 4, 2, 1):
            hit = (cd & mask) != 0
            if even:
                mid = (min_x + max_x) * 0.5
                min_x = np.where(hit, mid, min_x)
                max_x = np.where(hit, max_x, mid)
            else:
                mid = (min_y + max_y) * 0.5
                min_y = np.where(hit, mid, min_y)
                max_y = np.where(hit, max_y, mid)
            even = not even
    return min_x, max_x, min_y, max_y


def geohash_decode_center(hashes):
    """Decode to center (lon, lat). GeohashUtils.cs:153-164."""
    min_x, max_x, min_y, max_y = geohash_decode_bbox(hashes)
    return (min_x + max_x) * 0.5, (min_y + max_y) * 0.5


def geohash_sub_cells(base: str) -> list[str]:
    """The 32 sorted child cells. GeohashUtils.cs:219-228."""
    return [base + c for c in BASE32]


_LAT_HEIGHT = np.empty(MAX_PRECISION + 1)
_LON_WIDTH = np.empty(MAX_PRECISION + 1)
_LAT_HEIGHT[0] = 180.0
_LON_WIDTH[0] = 360.0
_even = False
for _lvl in range(1, MAX_PRECISION + 1):
    _LAT_HEIGHT[_lvl] = _LAT_HEIGHT[_lvl - 1] / (8.0 if _even else 4.0)
    _LON_WIDTH[_lvl] = _LON_WIDTH[_lvl - 1] / (4.0 if _even else 8.0)
    _even = not _even


def geohash_cell_sizes(hash_len: int) -> tuple[float, float]:
    """(lat_height, lon_width) of cells at a level. GeohashUtils.cs:230-233."""
    return float(_LAT_HEIGHT[hash_len]), float(_LON_WIDTH[hash_len])


def geohash_len_for_width_height(lon_err: float, lat_err: float) -> int:
    """Shortest hash length with cell strictly smaller than the given errors.

    GeohashUtils.cs:238-249.
    """
    for length in range(1, MAX_PRECISION):
        if _LAT_HEIGHT[length] < lat_err and _LON_WIDTH[length] < lon_err:
            return length
    return MAX_PRECISION


def geohash_neighbors(cell: str, include_self: bool = False) -> list[str]:
    """The ring of (up to) 8 neighboring cells at the same level.

    Engine-level helper (kNN ring expansion, SURVEY.md §2.9) — computed by
    stepping the decoded cell center by one cell size and re-encoding,
    which is exact because cell edges are binary fractions of the world.
    Pole-adjacent cells have fewer than 8 distinct neighbors.
    """
    level = len(cell)
    lat_h, lon_w = geohash_cell_sizes(level)
    (cx,), (cy,) = geohash_decode_center([cell])
    out: list[str] = []
    for dy in (-1, 0, 1):
        ny = cy + dy * lat_h
        if ny > 90.0 or ny < -90.0:
            continue
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0 and not include_self:
                continue
            nx = norm_lon_deg(cx + dx * lon_w)
            h = geohash_encode([ny], [nx], level)[0].decode("ascii")
            if h != cell or (include_self and h == cell):
                if h not in out:
                    out.append(h)
    return out
