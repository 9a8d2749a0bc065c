"""Area + constructive (buffer/center) kernels, numpy-vectorized.

Reference formulas (areas in square degrees, sphere radius expressed in
degrees = 180/pi):

- geo rect area   pi/180 * R^2 * |sin lat1 - sin lat2| * width
                  (GeodesicSphereDistCalc.cs:73-84; width dateline-aware)
- geo circle area spherical cap 2*pi*R^2*(1 - sin(90 - r))
                  (GeodesicSphereDistCalc.cs:87-95)
- euclidean areas w*h / pi*r^2 / buffered-line 4*buf_primary*buf_perp
                  (RectangleImpl.cs:128-138, CircleImpl.cs:73-83,
                  BufferedLine.cs:247-250)
- polygon area    planar shoelace area scaled by (geo bbox area / planar
                  bbox area) — the filled-ratio estimate of
                  NtsGeometry.GetArea (NtsGeometry.cs:215-227)
- collection area sum of member areas clamped at the bbox area
                  (ShapeCollection.cs:230-242)
- rect buffer     pole-touch => world-wrap rect; else lat +/- d and
                  lon +/- deltaLon(closest-to-pole lat) with world-wrap
                  check (RectangleImpl.GetBuffered :83-124)
- rect center     midpoint, lon re-normalized when dateline-crossing
                  (RectangleImpl.cs:332-347)
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.kernels.circle import circle_delta_lon_deg
from spatial4n_spark.kernels.distance import DEG_TO_RAD, RAD_TO_DEG
from spatial4n_spark.kernels.norm import norm_lon_deg

RADIUS_DEG = RAD_TO_DEG  # sphere radius in degree units (180/pi)
WHOLE_WORLD_AREA_DEG2 = 4 * np.pi * RADIUS_DEG * RADIUS_DEG


def rect_width_deg(min_x, max_x):
    """Dateline-aware width (RectangleImpl.cs:144-157)."""
    min_x, max_x = (np.asarray(a, np.float64) for a in (min_x, max_x))
    w = max_x - min_x
    return np.where(w < 0, w + 360.0, w)


def rect_area(min_x, max_x, min_y, max_y, geo: bool = True):
    """Rect area; square degrees when geo, else w*h."""
    min_x, max_x, min_y, max_y = (
        np.asarray(a, np.float64) for a in (min_x, max_x, min_y, max_y)
    )
    w = rect_width_deg(min_x, max_x)
    if not geo:
        return w * (max_y - min_y)
    lat1 = min_y * DEG_TO_RAD
    lat2 = max_y * DEG_TO_RAD
    return (
        np.pi / 180.0 * RADIUS_DEG * RADIUS_DEG * np.abs(np.sin(lat1) - np.sin(lat2)) * w
    )


def circle_area(radius_deg, geo: bool = True):
    """Circle area; spherical cap when geo."""
    r = np.asarray(radius_deg, np.float64)
    if not geo:
        return np.pi * r * r
    lat = (90.0 - r) * DEG_TO_RAD
    return 2.0 * np.pi * RADIUS_DEG * RADIUS_DEG * (1.0 - np.sin(lat))


def buffered_line_area(buf_primary, buf_perp):
    """BufferedLine.GetArea (BufferedLine.cs:247-250)."""
    return np.asarray(buf_primary, np.float64) * np.asarray(buf_perp, np.float64) * 4.0


def polygon_area(shape, geo: bool = True) -> float:
    """Filled-ratio geo estimate: planar area x (geo bbox area / planar
    bbox area). NtsGeometry.GetArea (NtsGeometry.cs:215-227)."""
    from spatial4n_spark.kernels.polygon import (
        MultiPolygon,
        Polygon,
        ring_area_signed,
        shape_bbox,
        unwrap_dateline,
    )

    members = shape.polys if isinstance(shape, MultiPolygon) else [shape]
    planar = 0.0
    for m in members:
        planar += abs(ring_area_signed(unwrap_dateline(m.shell)))
        for h in m.holes:
            planar -= abs(ring_area_signed(unwrap_dateline(h)))
    if not geo:
        return planar
    bb = shape_bbox(shape, geo=True)
    bbox_planar = float(rect_width_deg(bb.min_x, bb.max_x) * (bb.max_y - bb.min_y))
    if bbox_planar == 0.0:
        return 0.0
    bbox_geo = float(rect_area(bb.min_x, bb.max_x, bb.min_y, bb.max_y, geo=True))
    return planar * (bbox_geo / bbox_planar)


def collection_area(member_areas, bbox_area):
    """Sum of member areas clamped at the bbox area (ShapeCollection
    .cs:230-242) — agg form: least(sum(area), bbox_area)."""
    return min(float(np.sum(member_areas)), float(bbox_area))


def rect_buffer(min_x, max_x, min_y, max_y, dist, geo: bool = True):
    """Buffered rect; vectorized. RectangleImpl.GetBuffered (:83-124).

    Returns (min_x, max_x, min_y, max_y) arrays; geo handles pole-touch
    world-wrap, longitude skew at the closest-to-pole latitude, and full
    world wrap; cartesian clamps to world bounds (here: unbounded plane,
    so plain +/- dist).
    """
    min_x, max_x, min_y, max_y, dist = (
        np.asarray(a, np.float64) for a in (min_x, max_x, min_y, max_y, dist)
    )
    shape = np.broadcast(min_x, max_x, min_y, max_y, dist).shape
    min_x, max_x, min_y, max_y, dist = (
        np.broadcast_to(a, shape).astype(np.float64)
        for a in (min_x, max_x, min_y, max_y, dist)
    )
    if not geo:
        return min_x - dist, max_x + dist, min_y - dist, max_y + dist

    # default branch: expand lon by deltaLon at 'closestToPoleY' — the
    # reference picks maxY whenever height > 0 (RectangleImpl.cs:102-104),
    # which under-expands rects in the southern hemisphere; mirrored
    # verbatim for parity (it is the reference's documented behavior)
    closest_pole_y = np.where(max_y - min_y > 0, max_y, min_y)
    lon_dist = circle_delta_lon_deg(closest_pole_y, dist)
    w = rect_width_deg(min_x, max_x)
    out_min_x = norm_lon_deg(min_x - lon_dist)
    out_max_x = norm_lon_deg(max_x + lon_dist)
    out_min_y = min_y - dist
    out_max_y = max_y + dist

    # full world wrap via lon expansion
    world = lon_dist * 2 + w >= 360.0
    out_min_x = np.where(world, -180.0, out_min_x)
    out_max_x = np.where(world, 180.0, out_max_x)

    # pole touch => world-wrap rect (checked first in the reference)
    north = max_y + dist >= 90.0
    south = min_y - dist <= -90.0
    out_min_x = np.where(north | south, -180.0, out_min_x)
    out_max_x = np.where(north | south, 180.0, out_max_x)
    out_min_y = np.where(north, np.maximum(-90.0, min_y - dist), out_min_y)
    out_max_y = np.where(north, 90.0, out_max_y)
    out_max_y = np.where(south & ~north, np.minimum(90.0, max_y + dist), out_max_y)
    out_min_y = np.where(south & ~north, -90.0, out_min_y)

    out_min_y = np.maximum(out_min_y, -90.0)
    out_max_y = np.minimum(out_max_y, 90.0)
    return out_min_x, out_max_x, out_min_y, out_max_y


def rect_center(min_x, max_x, min_y, max_y):
    """Rect midpoint; lon normalized when dateline-crossing
    (RectangleImpl.cs:332-347)."""
    min_x, max_x, min_y, max_y = (
        np.asarray(a, np.float64) for a in (min_x, max_x, min_y, max_y)
    )
    h = max_y - min_y
    w = rect_width_deg(min_x, max_x)
    cy = h / 2.0 + min_y
    cx = w / 2.0 + min_x
    cx = np.where(min_x > max_x, norm_lon_deg(cx), cx)
    return cx, cy
