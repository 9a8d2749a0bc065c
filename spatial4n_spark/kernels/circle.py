"""Circle kernels: bbox generation (vectorized) and circle-rect relate.

The circle bbox kernel is the candidate-cell generator for distance joins
and kNN, so it is fully numpy-vectorized. The circle x rect relate is a
query-side operation (query circle vs. a bounded number of tiles/rects),
implemented as exact scalar logic matching the reference:

- bbox of a circle: ``DistanceUtils.CalcBoxByDistFromPtDEG``
  (src/Spatial4n/Distance/DistanceUtils.cs:328-443) — pole touch widens the
  lon span to 180 deg, pole crossing to 360 deg.
- euclidean relate: ``CircleImpl.Relate(IRectangle)`` + phase 2
  (src/Spatial4n/Shapes/Impl/CircleImpl.cs:144-247) — closest/farthest
  corner tests.
- geo relate: ``GeoCircle.RelateRectanglePhase2``
  (src/Spatial4n/Shapes/Impl/GeoCircle.cs:54-283) — inverse-circle trick for
  radius > 90 (with the ulp shrink, :60-77), pole-wrap algorithm
  (:181-242), corner counting (:247-283).
"""

from __future__ import annotations

import math

import numpy as np

from spatial4n_spark.kernels.bbox import rect_relate_rect, relate_x_range, relate_y_range
from spatial4n_spark.kernels.distance import DEG_TO_RAD, RAD_TO_DEG, distance_deg
from spatial4n_spark.kernels.norm import norm_lat_deg, norm_lon_deg
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN, intersects, inverse


def circle_delta_lon_deg(lat, dist_deg):
    """Half the lon-width of a circle's bbox. DistanceUtils.cs:400-412 (NaN->90)."""
    lat, dist_deg = np.asarray(lat, np.float64), np.asarray(dist_deg, np.float64)
    with np.errstate(invalid="ignore"):
        r = np.arcsin(np.sin(dist_deg * DEG_TO_RAD) / np.cos(lat * DEG_TO_RAD)) * RAD_TO_DEG
    r = np.where(np.isnan(r), 90.0, r)
    return np.where(dist_deg == 0.0, 0.0, r)


def circle_lat_horiz_axis_deg(lat, dist_deg):
    """Latitude of the circle's widest (left-right) axis. DistanceUtils.cs:421-443."""
    lat, dist_deg = np.asarray(lat, np.float64), np.asarray(dist_deg, np.float64)
    with np.errstate(invalid="ignore"):
        r = np.arcsin(np.sin(lat * DEG_TO_RAD) / np.cos(dist_deg * DEG_TO_RAD)) * RAD_TO_DEG
    r = np.where(np.isnan(r), np.where(lat > 0, 90.0, np.where(lat < 0, -90.0, lat)), r)
    r = np.where(lat + dist_deg >= 90.0, 90.0, r)
    r = np.where(lat - dist_deg <= -90.0, -90.0, r)
    return np.where(dist_deg == 0.0, lat, r)


def circle_bbox(lon, lat, dist_deg):
    """Bounding box of geo circles. Returns (min_x, max_x, min_y, max_y) arrays.

    DistanceUtils.CalcBoxByDistFromPtDEG (DistanceUtils.cs:328-394).
    min_x > max_x encodes dateline crossing.
    """
    lon, lat, dist_deg = (np.asarray(a, np.float64) for a in (lon, lat, dist_deg))
    shape = np.broadcast(lon, lat, dist_deg).shape
    lon, lat, dist_deg = (np.broadcast_to(a, shape).astype(np.float64) for a in (lon, lat, dist_deg))

    max_y = np.minimum(lat + dist_deg, 90.0)
    min_y = np.maximum(lat - dist_deg, -90.0)
    raw_max_y = lat + dist_deg
    raw_min_y = lat - dist_deg

    touches_pole = (raw_max_y >= 90.0) | (raw_min_y <= -90.0)
    passes_pole = (raw_max_y > 90.0) | (raw_min_y < -90.0)

    delta = circle_delta_lon_deg(lat, dist_deg)
    min_x = norm_lon_deg(lon - delta)
    max_x = norm_lon_deg(lon + delta)
    # touches a pole but doesn't pass it: lon span is 180 deg centered on lon
    half_min = norm_lon_deg(lon - 90.0)
    half_max = norm_lon_deg(lon + 90.0)
    min_x = np.where(touches_pole, np.where(passes_pole, -180.0, half_min), min_x)
    max_x = np.where(touches_pole, np.where(passes_pole, 180.0, half_max), max_x)

    whole = dist_deg >= 180.0
    min_x = np.where(whole, -180.0, min_x)
    max_x = np.where(whole, 180.0, max_x)
    min_y = np.where(whole, -90.0, min_y)
    max_y = np.where(whole, 90.0, max_y)

    zero = dist_deg == 0.0
    min_x = np.where(zero, lon, min_x)
    max_x = np.where(zero, lon, max_x)
    min_y = np.where(zero, lat, min_y)
    max_y = np.where(zero, lat, max_y)
    return min_x, max_x, min_y, max_y


# ---------------------------------------------------------------------------
# scalar circle x rect relate (query-side: query circle vs tiles/rects)
# ---------------------------------------------------------------------------


def _rect_width(min_x, max_x):
    w = max_x - min_x
    return w + 360.0 if w < 0 else w


def _crosses_dateline(min_x, max_x):
    return min_x > max_x


def _scalar_rel(arr):
    return np.int8(np.asarray(arr).reshape(-1)[0])


def _phase2_euclidean(cx, cy, r, x_axis, y_axis, rminx, rmaxx, rminy, rmaxy, bbox_sect, contains):
    """Closest/farthest-corner phase. CircleImpl.cs:164-247.

    ``contains(x, y)`` is the circle membership test (geo or cartesian);
    ``x_axis``/``y_axis`` are the circle's axis coordinates (GeoCircle
    overrides y_axis with the horizontal-axis latitude).
    """
    if x_axis < rminx:
        closest_x, farthest_x = rminx, rmaxx
    elif x_axis > rmaxx:
        closest_x, farthest_x = rmaxx, rminx
    else:
        closest_x = x_axis
        farthest_x = rmaxx if (rmaxx - x_axis > x_axis - rminx) else rminx

    if y_axis < rminy:
        closest_y, farthest_y = rminy, rmaxy
    elif y_axis > rmaxy:
        closest_y, farthest_y = rmaxy, rminy
    else:
        closest_y = y_axis
        farthest_y = rmaxy if (rmaxy - y_axis > y_axis - rminy) else rminy

    if x_axis != closest_x and y_axis != closest_y:
        if not contains(closest_x, closest_y):
            return DISJOINT

    if bbox_sect != CONTAINS:
        return INTERSECTS
    if not contains(farthest_x, farthest_y):
        return INTERSECTS
    if cy != y_axis:  # geodetic: check the other corner too (CircleImpl.cs:234-244)
        if y_axis == closest_y:
            other_y = rminy if farthest_y == rmaxy else rmaxy
            if not contains(farthest_x, other_y):
                return INTERSECTS
    return CONTAINS


def circle_relate_rect(cx, cy, r, rminx, rmaxx, rminy, rmaxy):
    """Euclidean circle x rect relate. CircleImpl.cs:144-247."""
    bminx, bmaxx, bminy, bmaxy = cx - r, cx + r, cy - r, cy + r
    bbox_sect = _scalar_rel(
        rect_relate_rect(bminx, bmaxx, bminy, bmaxy, rminx, rmaxx, rminy, rmaxy, geo=False)
    )
    if bbox_sect in (DISJOINT, WITHIN):
        return bbox_sect
    if bbox_sect == CONTAINS and (bminx, bmaxx, bminy, bmaxy) == (rminx, rmaxx, rminy, rmaxy):
        return WITHIN

    def contains(x, y):
        return math.hypot(x - cx, y - cy) <= r

    return _phase2_euclidean(cx, cy, r, cx, cy, rminx, rmaxx, rminy, rmaxy, bbox_sect, contains)


def _geo_contains_fn(cx, cy, r, calculator):
    def contains(x, y):
        return float(distance_deg(cx, cy, x, y, calculator)) <= r

    return contains


def _num_corners_intersect(contains, rminx, rmaxx, rminy, rmaxy):
    """0 = none, 1 = some, 4 = all. GeoCircle.cs:247-283."""
    b = contains(rminx, rminy)
    for x, y in ((rminx, rmaxy), (rmaxx, rminy), (rmaxx, rmaxy)):
        if contains(x, y) != b:
            return 1
    return 4 if b else 0


def _relate_rect_circle_wraps_pole(cx, cy, r, rminx, rmaxx, rminy, rmaxy, contains):
    """Circle wraps one pole (not both). GeoCircle.cs:181-242."""
    if r == 180.0:
        return CONTAINS

    y_top = cy + r
    if y_top > 90.0:
        y_top_overlap = y_top - 90.0
        if rminy >= 90.0 - y_top_overlap:
            return CONTAINS
    else:
        y_bot = cy - r
        if y_bot < -90.0:
            y_bot_overlap = -90.0 - y_bot
            if rmaxy <= -90.0 + y_bot_overlap:
                return CONTAINS

    if _rect_width(rminx, rmaxx) == 360.0:
        return INTERSECTS

    n = _num_corners_intersect(contains, rminx, rmaxx, rminy, rmaxy)
    front_x = cx
    if n == 4:
        back_x = front_x + 180.0 if front_x <= 0 else front_x - 180.0
        if intersects(_scalar_rel(relate_x_range(rminx, rmaxx, back_x, back_x))):
            return INTERSECTS
        return CONTAINS
    if n == 0:
        if intersects(_scalar_rel(relate_x_range(rminx, rmaxx, front_x, front_x))):
            return INTERSECTS
        return DISJOINT
    return INTERSECTS


def geo_circle_relate_rect(cx, cy, r, rminx, rmaxx, rminy, rmaxy, calculator: str = "haversine"):
    """Geo circle x rect relate — the reference's hardest kernel.

    GeoCircle.Relate via CircleImpl.Relate(IRectangle) bbox phase
    (CircleImpl.cs:144-161) then GeoCircle.RelateRectanglePhase2
    (GeoCircle.cs:116-179) with the inverse-circle trick (:54-84,:121-124).
    All coordinates in degrees; r in degrees [0, 180].
    """
    bminx, bmaxx, bminy, bmaxy = (float(v) for v in circle_bbox(cx, cy, r))
    bbox_sect = _scalar_rel(
        rect_relate_rect(bminx, bmaxx, bminy, bmaxy, rminx, rmaxx, rminy, rmaxy, geo=True)
    )
    if bbox_sect in (DISJOINT, WITHIN):
        return bbox_sect
    if bbox_sect == CONTAINS and (bminx, bmaxx, bminy, bmaxy) == (rminx, rmaxx, rminy, rmaxy):
        return WITHIN

    contains = _geo_contains_fn(cx, cy, r, calculator)

    # --- GeoCircle.Init (GeoCircle.cs:54-104) derived state ---
    if r > 90.0:
        back_dist = 180.0 - r
        if back_dist > 0:
            back_radius = 180.0 - r
            back_x = norm_lon_deg(cx + 180.0)
            back_y = norm_lat_deg(cy + 180.0)
            # ulp shrink to avoid accidental overlap (GeoCircle.cs:66-69)
            back_radius -= max(
                float(np.spacing(abs(back_y) + back_radius)),
                float(np.spacing(abs(back_x) + back_radius)),
            )
            return np.int8(
                inverse(geo_circle_relate_rect(back_x, back_y, back_radius, rminx, rmaxx, rminy, rmaxy, calculator))
            )
        # whole globe (r >= 180): falls through to the pole-wrap path below
        y_axis = cy
    else:
        y_axis = float(circle_lat_horiz_axis_deg(cy, r))
        y_axis = min(max(y_axis, bminy), bmaxy)  # clamp into bbox (GeoCircle.cs:88-101)

    if _rect_width(bminx, bmaxx) == 360.0:
        return _relate_rect_circle_wraps_pole(cx, cy, r, rminx, rmaxx, rminy, rmaxy, contains)

    if not _crosses_dateline(bminx, bmaxx) and not _crosses_dateline(rminx, rmaxx):
        return _phase2_euclidean(cx, cy, r, cx, y_axis, rminx, rmaxx, rminy, rmaxy, bbox_sect, contains)

    if _rect_width(rminx, rmaxx) == 360.0:
        return INTERSECTS

    n = _num_corners_intersect(contains, rminx, rmaxx, rminy, rmaxy)
    if n == 4:
        x_int = _scalar_rel(relate_x_range(rminx, rmaxx, bminx, bmaxx))
        if x_int == WITHIN:
            return CONTAINS
        return INTERSECTS
    if n > 0:
        return INTERSECTS

    # no corners inside: check whether one of the circle's axes crosses r
    if intersects(_scalar_rel(relate_y_range(rminy, rmaxy, y_axis, y_axis))) and intersects(
        _scalar_rel(relate_x_range(rminx, rmaxx, bminx, bmaxx))
    ):
        return INTERSECTS
    if intersects(_scalar_rel(relate_x_range(rminx, rmaxx, cx, cx))):
        y_top, y_bot = cy + r, cy - r
        if intersects(_scalar_rel(relate_y_range(rminy, rmaxy, y_bot, y_top))):
            return INTERSECTS
    return DISJOINT
