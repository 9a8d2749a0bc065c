"""S2 cell-cover planning: shape -> cube-face Hilbert cells (full / boundary).

The S2 twin of ``plans/cover.py`` (same contract: 'full' cells skip the
refinement UDF, 'boundary' cells get exact PIP refinement, conservative
ties always go to 'boundary' — join results are exact regardless of the
cover's tightness).  The BFS descends the 4-ary S2 cell tree from the six
face cells, classifying each cell against the query shape via the cell's
EXACT latitude/longitude bounding box, which is closed-form under the
gnomonic cube projection:

- equatorial faces (0,1,3,4): the direction vector is linear in (u,v)
  with the dominant axis fixed, so longitude depends on ONE uv
  coordinate only (lon = face_offset + atan(w)) and latitude is
  atan(b / sqrt(1 + a^2)) — monotone in b, with its only a-extremum at
  a = 0.  Extremes therefore sit at cell corners plus the a=0-clamped
  edge midcandidates.
- polar faces (2,5): lat = ±atan(1/r) with r the uv-distance from the
  face center — extremes from the rect's min/max distance to the origin;
  lon is the angular interval of the (reflected) uv-rect seen from the
  origin — extremes at corners, full [-180,180] if the rect contains the
  origin (the cell holds the pole).

Cells whose lon interval crosses the dateline (face 3 always straddles
lon=180; polar cells can) are split into two plain rect pieces and the
piece classifications are combined conservatively.

The bbox is padded outward by EPS before classification: the bbox is a
superset of the true (curved-boundary) cell region, so CONTAINS and
DISJOINT verdicts on the padded bbox remain sound for the cell, and the
pad absorbs the ~1e-15 deg difference between the planner's libm trig
and the point-side portable-trig encode (kernels/ptrig.py).
"""

from __future__ import annotations

import math

from spatial4n_spark.kernels.s2cell import s2_decode_st_bounds, st_to_uv
from spatial4n_spark.plans.cover import _classify_cells, _cover_key
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS

EPS = 1e-9
RAD2DEG = 180.0 / math.pi


def _lat_eq(a: float, b: float) -> float:
    """Equatorial-face latitude: atan(b / sqrt(1 + a^2)), degrees."""
    return math.atan2(b, math.sqrt(1.0 + a * a)) * RAD2DEG


def _eq_face_bbox(lon_off: float, a0: float, a1: float, b0: float, b1: float):
    """(lon piece(s), lat range) for an equatorial-face cell whose
    lon-driving coordinate spans [a0, a1] and lat-driving [b0, b1].
    ``lon_off`` is the face-center longitude; face 3 (off=180) wraps."""
    lo = lon_off + math.atan(a0) * RAD2DEG
    hi = lon_off + math.atan(a1) * RAD2DEG
    astar = min(max(0.0, a0), a1)  # the only interior lat extremum
    cands = [
        _lat_eq(a0, b0), _lat_eq(a0, b1), _lat_eq(a1, b0), _lat_eq(a1, b1),
        _lat_eq(astar, b0), _lat_eq(astar, b1),
    ]
    miny, maxy = min(cands), max(cands)
    if hi <= 180.0:
        return [(lo, hi)], miny, maxy
    if lo >= 180.0:
        return [(lo - 360.0, hi - 360.0)], miny, maxy
    return [(lo, 180.0), (-180.0, hi - 360.0)], miny, maxy


def _polar_face_bbox(south: bool, u0: float, u1: float, v0: float, v1: float):
    """(lon piece(s), lat range) for a polar-face cell."""
    # direction components seen from the pole axis:
    # face 2 (z+): (X, Y) = (-u, -v);  face 5 (z-): (X, Y) = (-v, u)
    if south:
        rx0, rx1, ry0, ry1 = -v1, -v0, u0, u1
    else:
        rx0, rx1, ry0, ry1 = -u1, -u0, -v1, -v0
    # normalize -0.0 -> +0.0: atan2(-0.0, x<0) is -180 while
    # atan2(+0.0, x<0) is +180, and -0.0 <= 0.0 confuses the seam test
    rx0, rx1, ry0, ry1 = rx0 + 0.0, rx1 + 0.0, ry0 + 0.0, ry1 + 0.0
    dx = 0.0 if rx0 <= 0.0 <= rx1 else min(abs(rx0), abs(rx1))
    dy = 0.0 if ry0 <= 0.0 <= ry1 else min(abs(ry0), abs(ry1))
    r_min = math.hypot(dx, dy)
    r_max = max(
        math.hypot(rx0, ry0), math.hypot(rx0, ry1),
        math.hypot(rx1, ry0), math.hypot(rx1, ry1),
    )
    if south:
        maxy = -math.atan2(1.0, r_max) * RAD2DEG
        miny = -90.0 if r_min == 0.0 else -math.atan2(1.0, r_min) * RAD2DEG
    else:
        miny = math.atan2(1.0, r_max) * RAD2DEG
        maxy = 90.0 if r_min == 0.0 else math.atan2(1.0, r_min) * RAD2DEG
    if r_min == 0.0:  # cell holds the pole: all longitudes
        return [(-180.0, 180.0)], miny, maxy
    corners = [
        math.atan2(ry0, rx0) * RAD2DEG, math.atan2(ry0, rx1) * RAD2DEG,
        math.atan2(ry1, rx0) * RAD2DEG, math.atan2(ry1, rx1) * RAD2DEG,
    ]
    # seam crossing: the rect meets the ray {Y=0, X<0}. Touching from
    # BELOW (ry1 == 0) counts — angles approach -180 as Y -> 0- while the
    # Y=0 corner itself evaluates to +180; touching from above does not
    # (the interval is continuous at +180 from Y > 0).
    if ry0 < 0.0 <= ry1 and rx1 < 0.0:
        pos = [c for c in corners if c > 0.0]
        neg = [c for c in corners if c <= 0.0]
        return [(min(pos), 180.0), (-180.0, max(neg))], miny, maxy
    return [(min(corners), max(corners))], miny, maxy


def s2_cell_bbox_pieces(cell: int, level: int):
    """Exact lat/lon bbox of one S2 cell as 1+ non-wrapping rect pieces
    [(min_x, max_x, min_y, max_y)], padded outward by EPS."""
    import numpy as np

    face_a, s0, t0, s1, t1 = s2_decode_st_bounds(np.array([cell]), level)
    u0, u1 = float(st_to_uv(s0)[0]), float(st_to_uv(s1)[0])
    v0, v1 = float(st_to_uv(t0)[0]), float(st_to_uv(t1)[0])
    return _bbox_pieces(int(face_a[0]), u0, u1, v0, v1)


def _bbox_pieces(face: int, u0: float, u1: float, v0: float, v1: float):
    """Padded bbox pieces from plain-float face/uv bounds (scalar math
    only — the cover BFS decodes whole frontiers vectorized and feeds
    floats here, so the per-cell cost is a few libm calls)."""
    if face == 0:
        pieces, miny, maxy = _eq_face_bbox(0.0, u0, u1, v0, v1)
    elif face == 1:
        pieces, miny, maxy = _eq_face_bbox(90.0, u0, u1, v0, v1)
    elif face == 3:
        # lon driven by v (lon = 180 + atan(v)); lat by -u
        pieces, miny, maxy = _eq_face_bbox(180.0, v0, v1, -u1, -u0)
    elif face == 4:
        pieces, miny, maxy = _eq_face_bbox(-90.0, v0, v1, -u1, -u0)
    else:
        pieces, miny, maxy = _polar_face_bbox(face == 5, u0, u1, v0, v1)
    miny = max(miny - EPS, -90.0)
    maxy = min(maxy + EPS, 90.0)
    out = [
        (max(lo - EPS, -180.0), min(hi + EPS, 180.0), miny, maxy)
        for lo, hi in pieces
    ]
    # lon -180 and +180 are the same meridian: a point at lon = -180 can
    # encode into a cell whose interval ends at +180 (and vice versa) —
    # mirror a degenerate strip across the seam so seam-adjacent cells
    # are never wrongly pruned against seam-touching shapes
    for lo, hi, y0, y1 in list(out):
        if hi >= 180.0 - EPS:
            out.append((-180.0, -180.0 + 2 * EPS, y0, y1))
        if lo <= -180.0 + EPS:
            out.append((180.0 - 2 * EPS, 180.0, y0, y1))
    return out


def _combine(piece_cls) -> int:
    """Conservative combination of per-piece classifications."""
    if all(c == DISJOINT for c in piece_cls):
        return DISJOINT
    if all(c == CONTAINS for c in piece_cls):
        return CONTAINS
    return INTERSECTS


_S2_COVER_CACHE: dict = {}
_S2_COVER_CACHE_MAX = 256


def cover_cells_s2(shape, level: int, geo: bool = True, max_cells: int = 4096):
    """4-ary BFS cover of a shape with level-``level`` S2 cells.

    Returns (full_cells, boundary_cells) as int lists — the same contract
    as plans.cover.cover_cells, with int64 ids instead of geohash strings.
    """
    import numpy as np

    # value-keyed for per-call-rebuilt Circle/Rect query shapes,
    # identity-keyed for parsed polygon layers — same semantics as the
    # geohash planner (the cached value pins identity-keyed shapes, so a
    # stale id-collision hit is impossible)
    key = ("s2",) + _cover_key(shape, level, geo, max_cells)
    hit = _S2_COVER_CACHE.get(key)
    if hit is not None:
        cached_shape, result = hit
        if cached_shape is shape or key[1][0] != "id":
            return result

    full: list[int] = []
    boundary: list[int] = []
    frontier: list[int] = list(range(6))  # the six face cells, level 0
    for depth in range(0, level + 1):
        if not frontier:
            break
        # ONE vectorized decode of the whole frontier, then scalar-float
        # piece construction, then one vectorized classification call
        cells_arr = np.asarray(frontier, dtype=np.int64)
        face_a, s0a, t0a, s1a, t1a = s2_decode_st_bounds(cells_arr, depth)
        u0a, u1a = st_to_uv(s0a), st_to_uv(s1a)
        v0a, v1a = st_to_uv(t0a), st_to_uv(t1a)
        piece_rects: list[tuple[float, float, float, float]] = []
        piece_owner: list[int] = []
        for idx in range(len(frontier)):
            for rect in _bbox_pieces(
                int(face_a[idx]), float(u0a[idx]), float(u1a[idx]),
                float(v0a[idx]), float(v1a[idx]),
            ):
                piece_rects.append(rect)
                piece_owner.append(idx)
        arr = np.asarray(piece_rects, dtype=np.float64)
        cls = _classify_cells(shape, (arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]), geo)
        per_cell: dict[int, list[int]] = {}
        for own, c in zip(piece_owner, cls):
            per_cell.setdefault(own, []).append(int(c))
        nxt: list[int] = []
        for idx, cell in enumerate(frontier):
            r = _combine(per_cell[idx])
            if r == DISJOINT:
                continue
            if r == CONTAINS:
                # expand to uniform join level: the 4^(level-depth) leaves.
                # Check the projected size BEFORE extending — a near-world
                # shape at a fine level would otherwise allocate the whole
                # 4^k expansion (GBs of ints) just to raise afterwards
                k = level - depth
                if len(full) + len(boundary) + (1 << (2 * k)) > max_cells:
                    raise ValueError(
                        f"s2 cell cover exceeds {max_cells} cells at level {level}"
                    )
                full.extend(range(cell << (2 * k), (cell + 1) << (2 * k)))
            elif depth == level:
                boundary.append(cell)
            else:
                nxt.extend((cell << 2) | q for q in range(4))
            if len(full) + len(boundary) > max_cells:
                raise ValueError(
                    f"s2 cell cover exceeds {max_cells} cells at level {level}"
                )
        frontier = nxt

    if len(_S2_COVER_CACHE) >= _S2_COVER_CACHE_MAX:
        _S2_COVER_CACHE.pop(next(iter(_S2_COVER_CACHE)))
    _S2_COVER_CACHE[key] = (shape, (full, boundary))
    return full, boundary


# ---------------------------------------------------------------------------
# batched circle covers: one vectorized BFS for a whole query batch
# ---------------------------------------------------------------------------

_EMPTY_LO, _EMPTY_HI = 1e9, -1e9  # sentinel lon piece that overlaps nothing


def _bbox_pieces_vec(face, u0, u1, v0, v1):
    """Vectorized twin of ``_bbox_pieces``: exact padded lat/lon bboxes
    for whole cell frontiers at once.  Returns
    ``(lo1, hi1, lo2, hi2, miny, maxy)`` — up to two non-wrapping lon
    pieces per cell (piece 2 is the sentinel-empty interval unless the
    cell straddles the dateline: face 3 always can; polar cells when the
    uv-rect crosses the seam ray).  Same formulas as the scalar builder
    (kept beside it, which remains the single-shape path), so the two
    agree to the last EPS; the seam mirror-strips the scalar path adds
    are NOT materialized here — callers must treat lon overlap modulo
    360 (test at shifts -360/0/+360), which subsumes them."""
    import numpy as np

    face = np.asarray(face, dtype=np.int64)
    n = len(face)
    lo1 = np.empty(n)
    hi1 = np.empty(n)
    lo2 = np.full(n, _EMPTY_LO)
    hi2 = np.full(n, _EMPTY_HI)
    miny = np.empty(n)
    maxy = np.empty(n)

    eq = face != 2
    eq &= face != 5
    if eq.any():
        f = face[eq]
        swap = f >= 3  # faces 3/4: lon driven by v, lat by -u
        a0 = np.where(swap, v0[eq], u0[eq])
        a1 = np.where(swap, v1[eq], u1[eq])
        b0 = np.where(swap, -u1[eq], v0[eq])
        b1 = np.where(swap, -u0[eq], v1[eq])
        off = np.choose(f, [0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lo = off + np.arctan(a0) * RAD2DEG
        hi = off + np.arctan(a1) * RAD2DEG
        astar = np.minimum(np.maximum(0.0, a0), a1)
        lat_c = lambda a, b: np.arctan2(b, np.sqrt(1.0 + a * a)) * RAD2DEG  # noqa: E731
        cands = np.stack(
            [lat_c(a0, b0), lat_c(a0, b1), lat_c(a1, b0),
             lat_c(a1, b1), lat_c(astar, b0), lat_c(astar, b1)]
        )
        my, My = cands.min(axis=0), cands.max(axis=0)
        # face-3 wrap: hi > 180 -> pieces (lo,180) + (-180,hi-360);
        # lo >= 180 -> single piece shifted by -360
        l1, h1 = lo.copy(), np.minimum(hi, 180.0)
        l2 = np.full(len(f), _EMPTY_LO)
        h2 = np.full(len(f), _EMPTY_HI)
        wrap = (hi > 180.0) & (lo < 180.0)
        l2[wrap], h2[wrap] = -180.0, hi[wrap] - 360.0
        allpast = lo >= 180.0
        l1[allpast], h1[allpast] = lo[allpast] - 360.0, hi[allpast] - 360.0
        lo1[eq], hi1[eq], lo2[eq], hi2[eq], miny[eq], maxy[eq] = l1, h1, l2, h2, my, My

    po = ~eq
    if po.any():
        south = face[po] == 5
        pu0, pu1, pv0, pv1 = u0[po], u1[po], v0[po], v1[po]
        rx0 = np.where(south, -pv1, -pu1) + 0.0
        rx1 = np.where(south, -pv0, -pu0) + 0.0
        ry0 = np.where(south, pu0, -pv1) + 0.0
        ry1 = np.where(south, pu1, -pv0) + 0.0
        dx = np.where((rx0 <= 0.0) & (0.0 <= rx1), 0.0, np.minimum(np.abs(rx0), np.abs(rx1)))
        dy = np.where((ry0 <= 0.0) & (0.0 <= ry1), 0.0, np.minimum(np.abs(ry0), np.abs(ry1)))
        r_min = np.hypot(dx, dy)
        r_max = np.maximum(
            np.maximum(np.hypot(rx0, ry0), np.hypot(rx0, ry1)),
            np.maximum(np.hypot(rx1, ry0), np.hypot(rx1, ry1)),
        )
        pole = r_min == 0.0
        lat_far = np.arctan2(1.0, r_max) * RAD2DEG
        with np.errstate(divide="ignore"):
            lat_near = np.where(pole, 90.0, np.arctan2(1.0, np.where(pole, 1.0, r_min)) * RAD2DEG)
        my = np.where(south, -lat_near, lat_far)
        My = np.where(south, -lat_far, lat_near)
        c00 = np.arctan2(ry0, rx0) * RAD2DEG
        c01 = np.arctan2(ry1, rx0) * RAD2DEG
        c10 = np.arctan2(ry0, rx1) * RAD2DEG
        c11 = np.arctan2(ry1, rx1) * RAD2DEG
        corners = np.stack([c00, c01, c10, c11])
        seam = (ry0 < 0.0) & (0.0 <= ry1) & (rx1 < 0.0)
        cmin, cmax = corners.min(axis=0), corners.max(axis=0)
        posmin = np.where(corners > 0.0, corners, np.inf).min(axis=0)
        negmax = np.where(corners <= 0.0, corners, -np.inf).max(axis=0)
        l1 = np.where(seam, posmin, cmin)
        h1 = np.where(seam, 180.0, cmax)
        l2 = np.where(seam, -180.0, _EMPTY_LO)
        h2 = np.where(seam, negmax, _EMPTY_HI)
        l1 = np.where(pole, -180.0, l1)
        h1 = np.where(pole, 180.0, h1)
        l2 = np.where(pole, _EMPTY_LO, l2)
        h2 = np.where(pole, _EMPTY_HI, h2)
        lo1[po], hi1[po], lo2[po], hi2[po], miny[po], maxy[po] = l1, h1, l2, h2, my, My

    pad2 = np.where(lo2 <= hi2, EPS, 0.0)  # don't un-empty the sentinel
    return (
        np.maximum(lo1 - EPS, -180.0), np.minimum(hi1 + EPS, 180.0),
        lo2 - pad2, hi2 + pad2,
        np.maximum(miny - EPS, -90.0), np.minimum(maxy + EPS, 90.0),
    )


def _lon_overlap(clo, chi, qlo, qhi, qwrap):
    """Closed-interval lon overlap modulo 360 of cell pieces against
    query intervals (``qlo > qhi`` i.e. ``qwrap`` = query wraps the
    dateline).  The +-360 shifts subsume the scalar planner's seam
    mirror-strips: a cell ending at +180 meets a query starting at -180
    through the +360 shift."""
    import numpy as np

    ov = (chi >= qlo) & (clo <= qhi)
    ov |= (chi >= qlo + 360.0) & (clo <= qhi + 360.0)
    ov |= (chi >= qlo - 360.0) & (clo <= qhi - 360.0)
    return np.where(qwrap, (chi >= qlo) | (clo <= qhi), ov)


def s2_circle_covers_batch(qlon, qlat, r_deg, level: int):
    """Level-``level`` S2 cell covers of MANY geo circles in one
    vectorized 4-ary BFS.  Returns ``(qidx, cells)`` — for each input
    circle ``qidx[i]``, cell ``cells[i]`` is part of its cover.

    The per-cell test is exact-cell-bbox x exact-circle-bbox
    intersection (``circle_bbox`` handles pole/dateline cases the same
    way the kernel gate queries do), so the result is a SUPERSET of the
    scalar planner's full+boundary set — sound wherever a cover is used
    as a candidate superset (kNN acceptance, radius prefilter) and
    ~4/pi looser at the boundary, in exchange for microseconds per
    query instead of the scalar BFS's tens of milliseconds (its
    per-piece Python relate calls dominate when thousands of queries
    each need a cover).  ``r_deg`` may be scalar or per-query."""
    import numpy as np

    from spatial4n_spark.kernels.circle import circle_bbox
    from spatial4n_spark.kernels.s2cell import s2_decode_st_bounds

    qlon = np.asarray(qlon, dtype=np.float64)
    qminx, qmaxx, qminy, qmaxy = circle_bbox(
        qlon, np.asarray(qlat, dtype=np.float64), r_deg
    )
    qwrapA = qminx > qmaxx

    qi = np.repeat(np.arange(len(qlon), dtype=np.int64), 6)
    cells = np.tile(np.arange(6, dtype=np.int64), len(qlon))
    for depth in range(0, level + 1):
        face, s0, t0, s1, t1 = s2_decode_st_bounds(cells, depth)
        lo1, hi1, lo2, hi2, cminy, cmaxy = _bbox_pieces_vec(
            face, st_to_uv(s0), st_to_uv(s1), st_to_uv(t0), st_to_uv(t1)
        )
        ql, qh, qw = qminx[qi], qmaxx[qi], qwrapA[qi]
        keep = (cmaxy >= qminy[qi]) & (cminy <= qmaxy[qi]) & (
            _lon_overlap(lo1, hi1, ql, qh, qw)
            | _lon_overlap(lo2, hi2, ql, qh, qw)
        )
        qi, cells = qi[keep], cells[keep]
        if depth == level:
            break
        qi = np.repeat(qi, 4)
        cells = ((cells << 2)[:, None] | np.arange(4, dtype=np.int64)).reshape(-1)
    return qi, cells
