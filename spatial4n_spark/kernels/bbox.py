"""Rectangle / interval relate kernels — dateline-aware, numpy-vectorized.

Semantics match reference ``src/Spatial4n/Shapes/Impl/RectangleImpl.cs``:
- a rect with minX > maxX crosses the dateline (:26-28, :140)
- Relate_Range (:257-275), RelateYRange (:277-280),
  RelateXRange with dateline unwrap + world-wrap short-circuits (:283-324)
- rect x rect with equal-edge tie-breaks (:231-254)
- rect contains point with dateline unwrap of the point (:190-228)
- empty shapes (NaN coords) relate DISJOINT to everything (:175-176)

These are the bbox-prefilter kernels of the distributed spatial join; they
also exist as native Catalyst column expressions in
``spatial4n_spark.functions`` for pushdown-eligible filtering.
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN


def _as_f8(*args):
    return tuple(np.asarray(a, dtype=np.float64) for a in args)


def relate_range(int_min, int_max, ext_min, ext_max):
    """1-D interval relate: how does [int_min,int_max] relate to [ext_min,ext_max].

    RectangleImpl.cs:257-275. Returns int8 relation array.
    CONTAINS means the *int* interval contains the *ext* interval.
    """
    int_min, int_max, ext_min, ext_max = _as_f8(int_min, int_max, ext_min, ext_max)
    shape = np.broadcast(int_min, int_max, ext_min, ext_max).shape
    out = np.full(shape, INTERSECTS, dtype=np.int8)
    disjoint = (ext_min > int_max) | (ext_max < int_min)
    contains = (ext_min >= int_min) & (ext_max <= int_max)
    within = (ext_min <= int_min) & (ext_max >= int_max)
    # order matters: disjoint first, then contains, then within (as the
    # reference's early returns)
    out = np.where(within & ~contains & ~disjoint, WITHIN, out)
    out = np.where(contains & ~disjoint, CONTAINS, out)
    out = np.where(disjoint, DISJOINT, out)
    nan = np.isnan(int_min) | np.isnan(int_max) | np.isnan(ext_min) | np.isnan(ext_max)
    out = np.where(nan, DISJOINT, out)
    return np.atleast_1d(out.astype(np.int8))


def relate_y_range(min_y, max_y, ext_min_y, ext_max_y):
    """RectangleImpl.cs:277-280."""
    return relate_range(min_y, max_y, ext_min_y, ext_max_y)


def relate_x_range(min_x, max_x, ext_min_x, ext_max_x, geo: bool = True):
    """X-interval relate with dateline unwrap + world-wrap short-circuits.

    RectangleImpl.cs:283-324. ``min_x > max_x`` encodes dateline crossing.
    """
    min_x, max_x, ext_min_x, ext_max_x = _as_f8(min_x, max_x, ext_min_x, ext_max_x)
    if not geo:
        return relate_range(min_x, max_x, ext_min_x, ext_max_x)

    shape = np.broadcast(min_x, max_x, ext_min_x, ext_max_x).shape
    min_x, max_x, ext_min_x, ext_max_x = (
        np.broadcast_to(a, shape).copy() for a in (min_x, max_x, ext_min_x, ext_max_x)
    )
    raw_w = max_x - min_x
    ext_raw_w = ext_max_x - ext_min_x
    world_int = raw_w == 360.0  # -> CONTAINS regardless
    world_ext = ext_raw_w == 360.0  # -> WITHIN (checked after world_int)

    # unwrap dateline: maxX := minX + (rawWidth + 360) when rawWidth < 0
    max_x = np.where(raw_w < 0, min_x + raw_w + 360.0, max_x)
    ext_max_x = np.where(ext_raw_w < 0, ext_min_x + ext_raw_w + 360.0, ext_max_x)

    # shift one interval +360 so the two potentially overlap
    shift_int = max_x < ext_min_x
    min_x = np.where(shift_int, min_x + 360.0, min_x)
    max_x = np.where(shift_int, max_x + 360.0, max_x)
    shift_ext = ~shift_int & (ext_max_x < min_x)
    ext_min_x = np.where(shift_ext, ext_min_x + 360.0, ext_min_x)
    ext_max_x = np.where(shift_ext, ext_max_x + 360.0, ext_max_x)

    out = relate_range(min_x, max_x, ext_min_x, ext_max_x)
    out = np.where(world_ext, WITHIN, out)
    out = np.where(world_int, CONTAINS, out)
    nan = np.isnan(min_x) | np.isnan(max_x) | np.isnan(ext_min_x) | np.isnan(ext_max_x)
    return np.atleast_1d(np.where(nan, DISJOINT, out).astype(np.int8))


def rect_relate_rect(
    a_min_x, a_max_x, a_min_y, a_max_y, b_min_x, b_max_x, b_min_y, b_max_y, geo: bool = True
):
    """rect A relate rect B, with equal-edge tie-breaks. RectangleImpl.cs:231-254."""
    a_min_x, a_max_x, a_min_y, a_max_y, b_min_x, b_max_x, b_min_y, b_max_y = _as_f8(
        a_min_x, a_max_x, a_min_y, a_max_y, b_min_x, b_max_x, b_min_y, b_max_y
    )
    y_rel = relate_y_range(a_min_y, a_max_y, b_min_y, b_max_y)
    x_rel = relate_x_range(a_min_x, a_max_x, b_min_x, b_max_x, geo=geo)
    shape = np.broadcast(x_rel, y_rel).shape
    out = np.full(shape, INTERSECTS, dtype=np.int8)
    # if one side's edges are equal, return the other side's relation
    eq_x = (a_min_x == b_min_x) & (a_max_x == b_max_x)
    eq_y = (a_min_y == b_min_y) & (a_max_y == b_max_y)
    out = np.where(eq_y, x_rel, out)
    out = np.where(eq_x, y_rel, out)
    out = np.where(x_rel == y_rel, x_rel, out)
    out = np.where((x_rel == DISJOINT) | (y_rel == DISJOINT), DISJOINT, out)
    return np.atleast_1d(out.astype(np.int8))


def rect_contains_point(min_x, max_x, min_y, max_y, px, py, geo: bool = True):
    """CONTAINS/DISJOINT of rect vs point with dateline unwrap of the point.

    RectangleImpl.cs:190-228. Returns bool array (True = CONTAINS).
    """
    min_x, max_x, min_y, max_y, px, py = _as_f8(min_x, max_x, min_y, max_y, px, py)
    y_ok = (py <= max_y) & (py >= min_y)
    if geo:
        raw_w = max_x - min_x
        max_xu = np.where(raw_w < 0, min_x + raw_w + 360.0, max_x)
        pxu = np.where(px < min_x, px + 360.0, np.where(px > max_xu, px - 360.0, px))
        x_ok = (pxu >= min_x) & (pxu <= max_xu)
    else:
        x_ok = (px >= min_x) & (px <= max_x)
    return np.atleast_1d(y_ok & x_ok)
