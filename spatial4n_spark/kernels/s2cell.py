"""S2-style cube-face Hilbert cell index — the engine's second cell
backend, numpy-vectorized.

The north rule asks for an "H3/S2 index"; the reference's only grid is
geohash (``kernels/geohash.py``, bit-exact with
``src/Spatial4n/Util/GeohashUtils.cs:78-144``), which SURVEY §2.5 exposes
behind a generic ``cell_encode(lat, lon, level)`` surface.  This module is
the second backend behind that surface, built on the published S2 design
(cube-face projection + quadratic ST transform + Hilbert curve ordering —
s2geometry.io/devguide/s2cell_hierarchy):

- lat/lon -> unit vector via the engine-portable trig kernel
  (``kernels/ptrig.py``): every op is IEEE-754-determined and mirrored
  op-for-op in the DuckDB oracle SQL (``oracles_s2.py``), so cell ids are
  bit-identical across engines with no tie-boundary hazard.
- face 0..5 by dominant axis (+x,+y,+z,-x,-y,-z), (u,v) = ratios of the
  other two components over the dominant one (the gnomonic cube face).
- quadratic ST transform s = 0.5*sqrt(1+3u) (u>=0) / 1-0.5*sqrt(1-3u)
  (u<0) — the area-equalizing remap the S2 paper documents.
- (i,j) = floor(s,t * 2^level), then Hilbert-curve position via the
  standard 4-state (swap|invert) lookup-table walk, MSB-first.

Cell id layout (this engine's own, simpler than libs2's sentinel form):
``id = face << (2*level) | hilbert_pos`` with ``level`` carried by the
caller (exactly like geohash precision).  This gives the prefix property
the engine's partitioning relies on: ``parent(id) == id >> 2`` and the
four children of ``id`` are ``4*id .. 4*id+3`` — cell-prefix R-tree
partitioning and ring expansion work unchanged.

MAX_LEVEL = 29 keeps ``face << (2*level)`` inside a signed int64 (Spark
LongType / DuckDB BIGINT) with headroom.
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.kernels.ptrig import PI_2, pasin, patan2, pcos, psin

MAX_LEVEL = 29

DEG_TO_RAD = 0.017453292519943295  # pi/180, one literal, mirrored in SQL
RAD_TO_DEG = 57.29577951308232

# Hilbert curve lookup tables.  Orientation o in {0,1,2,3} is a bitmask
# (swap=1, invert=2).  ij = (i_bit << 1) | j_bit.  The canonical (o=0)
# sub-cell visit order is (0,0),(0,1),(1,1),(1,0); swapped / inverted
# orientations are the transpose / point-reflection of that order, and a
# child's orientation is the parent's XOR POS_TO_ORIENT[pos] (first child
# transposed, middle two unchanged, last child anti-transposed) — the
# standard U-curve recursion.  tests/test_s2cell.py proves continuity
# (consecutive positions are edge-adjacent cells) and bijectivity at
# several levels, which pins these tables up to curve reflection.
POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # o=0 canonical
        [0, 2, 3, 1],  # o=1 swap
        [3, 2, 0, 1],  # o=2 invert
        [3, 1, 0, 2],  # o=3 swap|invert
    ],
    dtype=np.int64,
)
# inverse per orientation: IJ_TO_POS[o][ij] = pos with POS_TO_IJ[o][pos] = ij
IJ_TO_POS = np.argsort(POS_TO_IJ, axis=1).astype(np.int64)
POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)

_IJ_TO_POS_FLAT = IJ_TO_POS.reshape(-1)  # index with o*4 + ij
_POS_TO_IJ_FLAT = POS_TO_IJ.reshape(-1)  # index with o*4 + pos


def _latlon_to_xyz(lat_deg, lon_deg):
    """Degrees -> (x, y, z) via the portable trig chain (op order is the
    SQL mirror's contract — do not reorder)."""
    la = np.asarray(lat_deg, dtype=np.float64) * DEG_TO_RAD
    lo = np.asarray(lon_deg, dtype=np.float64) * DEG_TO_RAD
    sla = psin(la)
    cla = psin(la + PI_2)
    slo = psin(lo)
    clo = psin(lo + PI_2)
    return cla * clo, cla * slo, sla


def xyz_to_face_uv(x, y, z):
    """Dominant-axis face 0..5 and gnomonic (u, v) on that face.

    Tie rule (|x| >= |y| >= |z| preferred in axis order) is part of the
    cross-engine contract and mirrored in the oracle CASE chain.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    x_dom = (ax >= ay) & (ax >= az)
    y_dom = ~x_dom & (ay >= az)
    z_dom = ~x_dom & ~y_dom
    face = np.where(
        x_dom,
        np.where(x >= 0.0, 0, 3),
        np.where(y_dom, np.where(y >= 0.0, 1, 4), np.where(z >= 0.0, 2, 5)),
    ).astype(np.int64)
    # avoid 0/0 on lanes not selected by the np.where
    sx = np.where(x == 0.0, 1.0, x)
    sy = np.where(y == 0.0, 1.0, y)
    sz = np.where(z == 0.0, 1.0, z)
    u = np.where(
        x_dom,
        np.where(x >= 0.0, y / sx, z / sx),
        np.where(
            y_dom,
            np.where(y >= 0.0, -x / sy, z / sy),
            np.where(z >= 0.0, -x / sz, -y / sz),
        ),
    )
    v = np.where(
        x_dom,
        np.where(x >= 0.0, z / sx, y / sx),
        np.where(
            y_dom,
            np.where(y >= 0.0, z / sy, -x / sy),
            np.where(z >= 0.0, -y / sz, x / sz),
        ),
    )
    return face, u, v


def face_uv_to_xyz(face, u, v):
    """Inverse of :func:`xyz_to_face_uv` up to positive scale (the
    returned vector is NOT normalized — direction is all the caller
    needs)."""
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [one, -u, -u, -one, v, -v],
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [u, one, -v, -v, -one, u],
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [v, v, one, -u, -u, -one],
    )
    return x, y, z


def uv_to_st(u):
    """Quadratic area-equalizing transform, [-1,1] -> [0,1]."""
    u = np.asarray(u, dtype=np.float64)
    # maximum(arg, 0) only silences the untaken np.where lane (its arg can
    # go negative); on the taken lane the arg is >= 1, so values — and the
    # lazily-evaluated SQL CASE mirror — are unchanged
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def st_to_uv(s):
    """Inverse quadratic transform, [0,1] -> [-1,1]."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


def hilbert_pos(face, i, j, level: int):
    """(face, i, j) -> position along the face's Hilbert curve, MSB-first
    table walk.  Initial orientation = face & 1 (odd faces transposed, the
    S2 convention that chains the curve across faces)."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    o = (np.asarray(face, dtype=np.int64) & 1).astype(np.int64)
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS_FLAT[o * 4 + ij]
        pos = (pos << 2) | p
        o = o ^ POS_TO_ORIENT[p]
    return pos


def hilbert_ij(face, pos, level: int):
    """Inverse of :func:`hilbert_pos`."""
    pos = np.asarray(pos, dtype=np.int64)
    o = (np.asarray(face, dtype=np.int64) & 1).astype(np.int64)
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ_FLAT[o * 4 + p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        o = o ^ POS_TO_ORIENT[p]
    return i, j


def s2_encode(lat, lon, level: int):
    """lat/lon degrees -> int64 S2-style cell id at ``level``.

    Vectorized end-to-end; ``level`` + 4 numpy passes over the batch, no
    per-row Python — the cell-encode UDF shape the north rule asks for.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = xyz_to_face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip(np.floor(uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip(np.floor(uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    return (face << (2 * level)) | hilbert_pos(face, i, j, level)


def s2_face(cell, level: int):
    return np.asarray(cell, dtype=np.int64) >> (2 * level)


def s2_parent(cell, levels_up: int = 1):
    """Prefix property: the ancestor ``levels_up`` levels coarser is a
    plain right shift (face bits ride along)."""
    return np.asarray(cell, dtype=np.int64) >> (2 * levels_up)


def s2_children(cell):
    cell = np.asarray(cell, dtype=np.int64)
    return np.stack([(cell << 2) | k for k in range(4)], axis=-1)


def s2_decode_center(cell, level: int):
    """Cell id -> (lat_deg, lon_deg) of the cell's ST-center."""
    cell = np.asarray(cell, dtype=np.int64)
    face = cell >> (2 * level)
    pos = cell & (((np.int64(1) << (2 * level)) - 1) if level else np.int64(0))
    i, j = hilbert_ij(face, pos, level)
    inv_n = 1.0 / float(np.int64(1) << level)
    s = (i.astype(np.float64) + 0.5) * inv_n
    t = (j.astype(np.float64) + 0.5) * inv_n
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    lat = pasin(z / np.sqrt(x * x + y * y + z * z))
    lon = patan2(y, x)
    return lat * RAD_TO_DEG, lon * RAD_TO_DEG


def s2_decode_st_bounds(cell, level: int):
    """Cell id -> (face, s_min, t_min, s_max, t_max) — the exact dyadic
    ST rectangle the cell covers (the analog of geohash decode-bbox)."""
    cell = np.asarray(cell, dtype=np.int64)
    face = cell >> (2 * level)
    pos = cell & (((np.int64(1) << (2 * level)) - 1) if level else np.int64(0))
    i, j = hilbert_ij(face, pos, level)
    inv_n = 1.0 / float(np.int64(1) << level)
    s0 = i.astype(np.float64) * inv_n
    t0 = j.astype(np.float64) * inv_n
    return face, s0, t0, s0 + inv_n, t0 + inv_n


def s2_neighbors(cell, level: int, include_self: bool = False):
    """Edge+corner neighbors of one cell (python-scalar helper, for ring
    expansion).  Out-of-face (i,j) offsets are resolved by extending the
    gnomonic plane past the cube edge (|u| > 1) and re-encoding the
    direction vector — the linear extension points into the adjacent
    face, so no face-adjacency tables are needed.  Corner cells yield the
    correct 3-or-more distinct set after dedup."""
    cell_arr = np.asarray([cell], dtype=np.int64)
    face = int(cell_arr[0] >> (2 * level))
    pos = int(cell_arr[0]) & ((1 << (2 * level)) - 1 if level else 0)
    i, j = hilbert_ij(np.array([face]), np.array([pos]), level)
    n = 1 << level
    inv_n = 1.0 / n
    offs = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1) if (di, dj) != (0, 0)]
    ii = np.array([int(i[0]) + di for di, _ in offs], dtype=np.float64)
    jj = np.array([int(j[0]) + dj for _, dj in offs], dtype=np.float64)
    s = (ii + 0.5) * inv_n
    t = (jj + 0.5) * inv_n
    # st_to_uv extended past [0,1]: the same quadratic branches produce
    # |u| > 1 which face_uv_to_xyz maps to a direction in the next face
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(np.full(len(offs), face, dtype=np.int64), u, v)
    nf, nu, nv = xyz_to_face_uv(x, y, z)
    ni = np.clip(np.floor(uv_to_st(nu) * n).astype(np.int64), 0, n - 1)
    nj = np.clip(np.floor(uv_to_st(nv) * n).astype(np.int64), 0, n - 1)
    ids = (nf << (2 * level)) | hilbert_pos(nf, ni, nj, level)
    out = set(int(c) for c in ids)
    if include_self:
        out.add(int(cell))
    else:
        out.discard(int(cell))
    return sorted(out)
