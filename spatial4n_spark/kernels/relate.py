"""Shape x shape relate dispatcher — the reference's double-dispatch, in one place.

Mirrors the dispatch of RectangleImpl.cs:170-186, CircleImpl.cs:108-132,
NtsGeometry.cs:244-332, PointImpl.cs:75-85, ShapeCollection.cs:148-200:
unknown pairs delegate to relate(b, a).Transpose().

Used by tests and by the engine's WKT-pair relate UDF. The billion-row hot
paths (point-in-rect, point-in-circle, point-in-polygon) do NOT go through
this dispatcher — they use the dedicated vectorized kernels directly.
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.kernels.bbox import rect_contains_point, rect_relate_rect
from spatial4n_spark.kernels.circle import circle_relate_rect, geo_circle_relate_rect
from spatial4n_spark.kernels.distance import distance_deg
from spatial4n_spark.kernels.polygon import (
    Circle,
    GeometryCollection,
    LineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    Rect,
    _sample_points,
    _seg_relate,
    _segments_of,
    close_ring,
    points_covered,
    relate_polygon_circle,
    relate_polygon_polygon,
    relate_polygon_rect,
    shape_bbox,
)
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN, combine, transpose


def _line_segments(ls: LineString):
    c = np.asarray(ls.coords, dtype=np.float64)
    return [(c[i], c[i + 1]) for i in range(len(c) - 1)]


def _line_samples(ls: LineString):
    c = np.asarray(ls.coords, dtype=np.float64)
    if len(c) < 2:
        return c
    mids = (c[:-1] + c[1:]) * 0.5
    return np.vstack([c, mids])


def _point_on_line(px, py, ls: LineString) -> bool:
    for p1, p2 in _line_segments(ls):
        cross = (px - p1[0]) * (p2[1] - p1[1]) - (py - p1[1]) * (p2[0] - p1[0])
        if cross == 0 and min(p1[0], p2[0]) <= px <= max(p1[0], p2[0]) and min(p1[1], p2[1]) <= py <= max(p1[1], p2[1]):
            return True
    return False


def _relate_line_line(a: LineString, b: LineString):
    b_samples = _line_samples(b)
    b_on_a = all(_point_on_line(x, y, a) for x, y in b_samples)
    if b_on_a:
        return CONTAINS
    a_samples = _line_samples(a)
    a_on_b = all(_point_on_line(x, y, b) for x, y in a_samples)
    if a_on_b:
        return WITHIN
    for p1, p2 in _line_segments(a):
        for q1, q2 in _line_segments(b):
            t, proper = _seg_relate(p1, p2, q1, q2)
            if t or proper:
                return INTERSECTS
    return DISJOINT


def _relate_polygon_line(poly, ls: LineString):
    polys = poly.polys if isinstance(poly, MultiPolygon) else (poly,)
    # proper boundary crossing => INTERSECTS
    for p in polys:
        for p1, p2 in _segments_of(p):
            for q1, q2 in _line_segments(ls):
                _, proper = _seg_relate(p1, p2, q1, q2)
                if proper:
                    return INTERSECTS
    samples = _line_samples(ls)
    cov = points_covered(samples[:, 0], samples[:, 1], poly)
    if bool(np.all(cov)):
        return CONTAINS
    if bool(np.any(cov)):
        return INTERSECTS
    # touching without samples hitting: check any boundary contact
    for p in polys:
        for p1, p2 in _segments_of(p):
            for q1, q2 in _line_segments(ls):
                t, _ = _seg_relate(p1, p2, q1, q2)
                if t:
                    return INTERSECTS
    return DISJOINT


def _relate_circle_point(c: Circle, p: Point, calculator: str):
    calc = calculator if c.geo else "cartesian"
    d = float(distance_deg(c.x, c.y, p.x, p.y, calc))
    return CONTAINS if d <= c.radius else DISJOINT


def _relate_circle_circle(a: Circle, b: Circle, calculator: str):
    """Triangle inequality on center distance vs radii. CircleImpl.cs:260-275."""
    calc = calculator if a.geo else "cartesian"
    cross = float(distance_deg(a.x, a.y, b.x, b.y, calc))
    if cross > a.radius + b.radius:
        return DISJOINT
    if cross < a.radius and cross + b.radius <= a.radius:
        return CONTAINS
    if cross < b.radius and cross + a.radius <= b.radius:
        return WITHIN
    return INTERSECTS


def _relate_point_point(a: Point, b: Point):
    """Equal => INTERSECTS (not CONTAINS), else DISJOINT. PointImpl.cs:75-85."""
    if a.x == b.x and a.y == b.y:
        return INTERSECTS
    return DISJOINT


def relate(a, b, geo: bool = True, calculator: str = "haversine") -> np.int8:
    """4-valued relate of any two shapes. See module docstring."""
    # empty shapes relate DISJOINT to everything
    for s in (a, b):
        if isinstance(s, Point) and s.is_empty:
            return DISJOINT
        if isinstance(s, Rect) and np.isnan(s.min_x):
            return DISJOINT
        if isinstance(s, (Polygon,)) and len(s.shell) == 0:
            return DISJOINT
        if isinstance(s, MultiPolygon) and not s.polys:
            return DISJOINT
        if isinstance(s, GeometryCollection) and not s.shapes:
            return DISJOINT
        if isinstance(s, LineString) and len(s.coords) == 0:
            return DISJOINT
        if isinstance(s, MultiPoint) and len(s.coords) == 0:
            return DISJOINT

    if isinstance(a, GeometryCollection):
        rel = None
        for s in a.shapes:
            r = relate(s, b, geo, calculator)
            rel = r if rel is None else transpose(combine(transpose(rel), transpose(r)))
        return np.int8(rel)
    if isinstance(b, GeometryCollection):
        rel = None
        for s in b.shapes:
            r = relate(a, s, geo, calculator)
            rel = r if rel is None else combine(rel, r)
        return np.int8(rel)

    if isinstance(a, MultiPoint):
        rel = None
        for x, y in a.coords:
            r = relate(Point(x, y), b, geo, calculator)
            rel = r if rel is None else transpose(combine(transpose(rel), transpose(r)))
        return np.int8(rel)
    if isinstance(b, MultiPoint):
        return transpose(relate(b, a, geo, calculator))

    # LineString with buffer acts like an area shape; without buffer it's thin.
    if isinstance(a, Point):
        if isinstance(b, Point):
            return _relate_point_point(a, b)
        return transpose(relate(b, a, geo, calculator))

    if isinstance(a, Rect):
        if isinstance(b, Point):
            return CONTAINS if bool(rect_contains_point(a.min_x, a.max_x, a.min_y, a.max_y, b.x, b.y, geo)[0]) else DISJOINT
        if isinstance(b, Rect):
            return np.int8(
                rect_relate_rect(a.min_x, a.max_x, a.min_y, a.max_y, b.min_x, b.max_x, b.min_y, b.max_y, geo)[0]
            )
        if isinstance(b, LineString) and b.buffer == 0.0:
            # rect x thin line: relate the rect's page polygons (dateline
            # split) to the line and Combine — the transpose fallback would
            # recurse forever (neither branch owns the pair)
            from spatial4n_spark.kernels.polygon import rect_to_polygons
            from spatial4n_spark.relation import combine

            rel = None
            for page in rect_to_polygons(a):
                r = _relate_polygon_line(page, b)
                rel = r if rel is None else combine(rel, r)
            return np.int8(rel)
        return transpose(relate(b, a, geo, calculator))

    if isinstance(a, Circle):
        if isinstance(b, Point):
            return _relate_circle_point(a, b, calculator)
        if isinstance(b, Rect):
            if a.geo:
                return np.int8(geo_circle_relate_rect(a.x, a.y, a.radius, b.min_x, b.max_x, b.min_y, b.max_y, calculator))
            return np.int8(circle_relate_rect(a.x, a.y, a.radius, b.min_x, b.max_x, b.min_y, b.max_y))
        if isinstance(b, Circle):
            return _relate_circle_circle(a, b, calculator)
        return transpose(relate(b, a, geo, calculator))

    from spatial4n_spark.kernels.polybuf import BufferedPolygon

    if isinstance(a, BufferedPolygon):
        if isinstance(b, Point):
            return CONTAINS if bool(a.covers([b.x], [b.y])[0]) else DISJOINT
        if isinstance(b, Rect):
            return np.int8(a.relate_rect(b))
        if isinstance(b, Circle):
            return np.int8(a.relate_circle(b))
        if isinstance(b, (Polygon, MultiPolygon)):
            return np.int8(a.relate_polygon(b))
        raise TypeError(
            f"relate(BufferedPolygon, {type(b).__name__}) not supported — "
            "buffered polygons relate to points, rects, circles, and "
            "polygons; materialize an outline for the remaining pairs"
        )
    if isinstance(b, BufferedPolygon):
        return transpose(relate(b, a, geo, calculator))

    if isinstance(a, (Polygon, MultiPolygon)):
        # bbox gate (NtsGeometry.cs:268-269, :284-287)
        if isinstance(b, Point):
            bb = shape_bbox(a, geo)
            if not bool(rect_contains_point(bb.min_x, bb.max_x, bb.min_y, bb.max_y, b.x, b.y, geo)[0]):
                return DISJOINT
            return CONTAINS if bool(points_covered([b.x], [b.y], a, geo)[0]) else DISJOINT
        if isinstance(b, Rect):
            bb = shape_bbox(a, geo)
            bbox_r = np.int8(
                rect_relate_rect(bb.min_x, bb.max_x, bb.min_y, bb.max_y, b.min_x, b.max_x, b.min_y, b.max_y, geo)[0]
            )
            if bbox_r in (WITHIN, DISJOINT):
                return bbox_r
            return np.int8(relate_polygon_rect(a, b, geo))
        if isinstance(b, Circle):
            return np.int8(relate_polygon_circle(a, b, calculator, geo))
        if isinstance(b, (Polygon, MultiPolygon)):
            return np.int8(relate_polygon_polygon(a, b, geo))
        if isinstance(b, LineString):
            return np.int8(_relate_polygon_line(a, b))
        return transpose(relate(b, a, geo, calculator))

    if isinstance(a, LineString):
        if a.buffer > 0.0:
            # buffered polyline (BufferedLine/BufferedLineString semantics;
            # euclidean per BufferedLine.cs:28 — callers pre-expand the
            # buffer for geo skew)
            from spatial4n_spark.kernels.bufline import BufLineString

            bls = BufLineString(a.coords, a.buffer)
            if isinstance(b, Point):
                return CONTAINS if bool(bls.contains([b.x], [b.y])[0]) else DISJOINT
            if isinstance(b, Rect):
                return bls.relate_rect(b)
            raise TypeError(
                f"buffered line relate vs {type(b).__name__} not supported "
                "(reference BufferedLine.Relate supports point/rect only)"
            )
        if isinstance(b, Point):
            return CONTAINS if _point_on_line(b.x, b.y, a) else DISJOINT
        if isinstance(b, LineString):
            return _relate_line_line(a, b)
        if isinstance(b, (Circle,)):
            raise TypeError("line x circle relate not supported (no reference counterpart)")
        return transpose(relate(b, a, geo, calculator))

    raise TypeError(f"relate not implemented for {type(a).__name__} x {type(b).__name__}")
