"""H3 cell-cover planning: shape -> hex cells (full / boundary).

The hex twin of ``plans/cover.py`` / ``plans/s2cover.py`` (same contract:
'full' cells skip the refinement UDF, 'boundary' cells get exact PIP
refinement, conservative ties go to 'boundary' — join results are exact
regardless of the cover's tightness).

Hexagons cannot tile hexagons, so there is no quadtree to BFS-descend
(``kernels/h3cell.py`` docstring): the planner enumerates the candidate
hexes of the ONE uniform join level directly from the shape's bbox —
axial rows from the lat range, per-row column ranges from the lon range —
then classifies each hex by its tight bounding rect with the shared
vectorized classifier (``plans.cover._classify_cells``):

- hex bbox fully covered by the shape -> the hex is covered -> 'full'
  (every point encoding into the hex lies inside the hexagon, which lies
  inside its bbox);
- hex bbox disjoint from the shape    -> pruned (no encodable point of
  the hex can be in the shape);
- else boundary.

Dateline: points only ever encode with lon in [-180, 180] (the hex grid
is a plane over that strip, not a cylinder), so classification uses the
hex bbox CLIPPED to [-180, 180]; shapes that cross the seam arrive
either as wrapping bboxes (min_x > max_x) or unwrapped beyond ±180 and
are split into plain lon pages.  Because lon -180 and +180 name the same
meridian, seam-touching hexes additionally get a degenerate mirrored
strip on the far side (same rule as ``plans/s2cover.py``) and pages that
touch the seam enumerate a one-hex-wide page on the far side — so a
point at exactly lon = ±180 can never be wrongly pruned.

Enumeration cost is bbox-area / hex-area per shape: the planner guards
the projected candidate count BEFORE allocating (ValueError, same
contract the quadtree planners use for oversized covers), so a
too-fine level fails fast instead of materializing the world.
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.kernels.h3cell import (
    SQRT3,
    SQRT3_2,
    h3_from_qr,
    hex_size,
)
from spatial4n_spark.kernels.polygon import shape_bbox
from spatial4n_spark.plans.cover import _classify_cells, _cover_key
from spatial4n_spark.relation import CONTAINS, DISJOINT

EPS = 1e-9
# hard candidate-enumeration guard (candidates, not result cells): the
# classifier is vectorized so millions are *possible*, but a planner
# asked for that many hexes is using the wrong level
_MAX_CANDIDATES = 4_000_000


def _lon_pages(min_x: float, max_x: float) -> list[tuple[float, float]]:
    """Shape-bbox lon extent -> non-wrapping pages within [-180, 180]."""
    if max_x - min_x >= 360.0:
        return [(-180.0, 180.0)]
    # a bbox lying ENTIRELY beyond one seam (fully-unwrapped shape):
    # shift whole; partial overflows are split below
    if min_x > 180.0 and max_x > 180.0:
        min_x, max_x = min_x - 360.0, max_x - 360.0
    elif min_x < -180.0 and max_x < -180.0:
        min_x, max_x = min_x + 360.0, max_x + 360.0
    if min_x > max_x:  # dateline-crossing bbox form
        pages = [(min_x, 180.0), (-180.0, max_x)]
    elif max_x > 180.0:  # unwrapped east page
        pages = [(min_x, 180.0), (-180.0, max_x - 360.0)]
    elif min_x < -180.0:  # unwrapped west page
        pages = [(min_x + 360.0, 180.0), (-180.0, max_x)]
    else:
        pages = [(min_x, max_x)]
    # every page must be a forward interval inside the world — an
    # inverted page would turn the per-row column counts negative and
    # crash np.repeat with an opaque error far from the cause
    pages = [(max(lo, -180.0), min(hi, 180.0)) for lo, hi in pages]
    return [(lo, hi) for lo, hi in pages if lo <= hi]


_H3_COVER_CACHE: dict = {}
_H3_COVER_CACHE_MAX = 256


def cover_cells_h3(shape, level: int, geo: bool = True, max_cells: int = 4096):
    """Uniform-level hex cover of a shape. Returns (full_cells,
    boundary_cells) as int64-id lists — the same contract as
    plans.cover.cover_cells / plans.s2cover.cover_cells_s2."""
    key = ("h3",) + _cover_key(shape, level, geo, max_cells)
    hit = _H3_COVER_CACHE.get(key)
    if hit is not None:
        cached_shape, result = hit
        if cached_shape is shape or key[1][0] != "id":
            return result

    s = hex_size(level)
    hw = SQRT3_2 * s
    bb = shape_bbox(shape, geo)
    lat_lo = max(float(bb.min_y), -90.0)
    lat_hi = min(float(bb.max_y), 90.0)
    pages = _lon_pages(float(bb.min_x), float(bb.max_x))
    # seam-touching shapes: enumerate a one-hex-wide far-side page too,
    # so hexes holding lon = ±180 points are classified, never skipped
    for lo, hi in list(pages):
        if hi >= 180.0 - EPS and all(p[0] > -180.0 + EPS for p in pages):
            pages.append((-180.0, -180.0 + EPS))
        if lo <= -180.0 + EPS and all(p[1] < 180.0 - EPS for p in pages):
            pages.append((180.0 - EPS, 180.0))

    # axial rows: hex centers with clat = 1.5*r*s within ±s of the lat
    # range (±1 row of slack — extra candidates classify DISJOINT)
    r_lo = int(np.floor((lat_lo - s) / (1.5 * s))) - 1
    r_hi = int(np.ceil((lat_hi + s) / (1.5 * s))) + 1
    rs = np.arange(r_lo, r_hi + 1, dtype=np.int64)

    q_arr_parts = []
    r_arr_parts = []
    total = 0
    for lon_lo, lon_hi in pages:
        # per-row column range: clon = (SQRT3*q + SQRT3_2*r)*s within
        # ±hw of the page (±1 column of slack)
        q_lo = np.floor(((lon_lo - hw) / s - SQRT3_2 * rs) / SQRT3).astype(np.int64) - 1
        q_hi = np.ceil(((lon_hi + hw) / s - SQRT3_2 * rs) / SQRT3).astype(np.int64) + 1
        counts = q_hi - q_lo + 1
        total += int(counts.sum())
        if total > _MAX_CANDIDATES:
            raise ValueError(
                f"h3 cover enumeration exceeds {_MAX_CANDIDATES} candidate "
                f"hexes at level {level} — use a coarser level"
            )
        # vectorized "ragged arange": one arange over the total, offset
        # per row (np.repeat of row starts)
        starts = np.cumsum(np.concatenate(([0], counts[:-1])))
        flat = np.arange(int(counts.sum()), dtype=np.int64)
        q_arr_parts.append(flat - np.repeat(starts, counts) + np.repeat(q_lo, counts))
        r_arr_parts.append(np.repeat(rs, counts))

    q = np.concatenate(q_arr_parts)
    r = np.concatenate(r_arr_parts)
    if len(pages) > 1:  # overlapping pages can enumerate a hex twice
        qr = np.stack([q, r], axis=1)
        qr = np.unique(qr, axis=0)
        q, r = qr[:, 0], qr[:, 1]

    qd = q.astype(np.float64)
    rd = r.astype(np.float64)
    clon = (SQRT3 * qd + SQRT3_2 * rd) * s
    clat = (1.5 * rd) * s

    # classification pieces (clipped + seam mirrors), owner-indexed
    raw = (clon - hw, clon + hw, clat - s, clat + s)
    piece_min_x = [np.maximum(raw[0] - EPS, -180.0)]
    piece_max_x = [np.minimum(raw[1] + EPS, 180.0)]
    owners = [np.arange(len(q))]
    east = np.nonzero(raw[1] + EPS >= 180.0 - EPS)[0]
    west = np.nonzero(raw[0] - EPS <= -180.0 + EPS)[0]
    if len(east):
        piece_min_x.append(np.full(len(east), -180.0))
        piece_max_x.append(np.full(len(east), -180.0 + 2 * EPS))
        owners.append(east)
    if len(west):
        piece_min_x.append(np.full(len(west), 180.0 - 2 * EPS))
        piece_max_x.append(np.full(len(west), 180.0))
        owners.append(west)
    own = np.concatenate(owners)
    pmin_x = np.concatenate(piece_min_x)
    pmax_x = np.concatenate(piece_max_x)
    pmin_y = np.maximum((clat - s - EPS), -90.0)[own]
    pmax_y = np.minimum((clat + s + EPS), 90.0)[own]
    cls = _classify_cells(shape, (pmin_x, pmax_x, pmin_y, pmax_y), geo)

    # conservative per-hex combination across its pieces
    n = len(q)
    all_disjoint = np.ones(n, dtype=bool)
    all_contains = np.ones(n, dtype=bool)
    np.logical_and.at(all_disjoint, own, cls == DISJOINT)
    np.logical_and.at(all_contains, own, cls == CONTAINS)

    keep = ~all_disjoint
    if int(keep.sum()) > max_cells:
        raise ValueError(f"h3 cell cover exceeds {max_cells} cells at level {level}")
    cells = h3_from_qr(q[keep], r[keep], level)
    full_mask = all_contains[keep]
    full = [int(c) for c in cells[full_mask]]
    boundary = [int(c) for c in cells[~full_mask]]

    if len(_H3_COVER_CACHE) >= _H3_COVER_CACHE_MAX:
        _H3_COVER_CACHE.pop(next(iter(_H3_COVER_CACHE)))
    _H3_COVER_CACHE[key] = (shape, (full, boundary))
    return full, boundary
