"""BufferedPolygon (GetBuffered on polygons, NtsGeometry.cs:203-211) and
cartesian point-on-bearing (CartesianDistCalc.cs:80-107) vectors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spatial4n_spark.io import parse_wkt
from spatial4n_spark.kernels.distance import point_on_bearing_cartesian
from spatial4n_spark.kernels.polybuf import BufferedPolygon, buffer_polygon
from spatial4n_spark.kernels.polygon import (
    Polygon,
    Rect,
    points_covered,
    shape_bbox,
)
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS

# constructed directly: the WKT parser rect-collapses axis-aligned boxes,
# and a Rect buffers to a Rect (RectangleImpl path, tested separately)
SQUARE = Polygon(
    np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
)


def _brute_dist_to_poly(px, py, poly, samples=4000):
    """Min distance from a point to a densely sampled polygon boundary."""
    best = math.inf
    for ring in (poly.shell, *poly.holes):
        c = np.asarray(ring, dtype=np.float64)
        for i in range(len(c) - 1):
            t = np.linspace(0.0, 1.0, samples // max(len(c) - 1, 1))
            x = c[i, 0] + t * (c[i + 1, 0] - c[i, 0])
            y = c[i, 1] + t * (c[i + 1, 1] - c[i, 1])
            best = min(best, float(np.min(np.hypot(x - px, y - py))))
    return best


def test_buffer_zero_is_identity():
    assert buffer_polygon(SQUARE, 0.0) is SQUARE


def test_buffer_negative_rejected():
    with pytest.raises(ValueError):
        BufferedPolygon(SQUARE, -1.0)


def test_covers_matches_distance_predicate():
    """covers(x) == (x in P or dist(x, boundary) <= d) on a probe grid."""
    bp = buffer_polygon(SQUARE, 2.0)
    xs = np.linspace(-4.0, 14.0, 41)
    ys = np.linspace(-4.0, 14.0, 41)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    got = bp.covers(gx, gy)
    inside = points_covered(gx, gy, SQUARE, True)
    for i in range(len(gx)):
        want = bool(inside[i]) or _brute_dist_to_poly(gx[i], gy[i], SQUARE) <= 2.0 + 1e-9
        near_edge = abs(_brute_dist_to_poly(gx[i], gy[i], SQUARE) - 2.0) < 1e-6
        if not near_edge:
            assert bool(got[i]) == want, (gx[i], gy[i])


def test_holes_shrink():
    holed = parse_wkt(
        "POLYGON((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 15 5, 15 15, 5 15, 5 5))", True
    )
    bp = buffer_polygon(holed, 2.0)
    # hole center (10,10) is 5 deg from the hole ring: still a hole
    assert not bool(bp.covers([10.0], [10.0])[0])
    # a point 1 deg inside the hole is within 2 of the hole boundary: buffered in
    assert bool(bp.covers([6.0], [10.0])[0])
    # the unbuffered polygon covers neither
    assert not bool(points_covered([6.0], [10.0], holed, True)[0])


def test_dateline_buffer():
    fiji = parse_wkt(
        "MULTIPOLYGON(((177 -18, 180 -18, 180 -16, 177 -16, 177 -18)),"
        "((-180 -18, -178 -18, -178 -16, -180 -16, -180 -18)))",
        True,
    )
    bp = buffer_polygon(fiji, 1.0)
    # just west of -178 (outside core, within 1 deg of the ring)
    assert bool(bp.covers([-177.5], [-17.0])[0])
    assert bool(bp.covers([176.5], [-17.0])[0])
    assert not bool(bp.covers([174.0], [-17.0])[0])


def test_bbox_growth():
    bp = buffer_polygon(SQUARE, 2.0)
    bb = bp.bbox()
    core = shape_bbox(SQUARE, True)
    assert bb.min_y == core.min_y - 2.0 and bb.max_y == core.max_y + 2.0
    assert bb.min_x < core.min_x and bb.max_x > core.max_x
    assert shape_bbox(bp, True) == bb  # dispatch


def test_convex_area_formula():
    bp = buffer_polygon(SQUARE, 2.0)
    assert bp.area() == pytest.approx(100.0 + 40.0 * 2.0 + math.pi * 4.0)


def test_relate_rect_classifier():
    bp = buffer_polygon(SQUARE, 2.0)
    assert bp.relate_rect(Rect(2.0, 8.0, 2.0, 8.0)) == CONTAINS
    assert bp.relate_rect(Rect(50.0, 60.0, 50.0, 60.0)) == DISJOINT
    # straddles the buffered boundary -> refine-me
    assert bp.relate_rect(Rect(9.0, 13.0, 4.0, 6.0)) == INTERSECTS
    # covered only by the buffer ring (outside core): classifier must not
    # claim DISJOINT for it
    assert bp.relate_rect(Rect(10.5, 11.5, 4.0, 6.0)) in (INTERSECTS, CONTAINS)


def test_wkt_buffer_polygon_parses():
    # non-axis-aligned: stays a Polygon through the parser
    shape = parse_wkt("BUFFER(POLYGON((0 0, 10 0, 11 10, 0 10, 0 0)), 2)", True)
    assert isinstance(shape, BufferedPolygon)
    assert shape.buf == 2.0
    assert bool(shape.covers([-1.0], [5.0])[0])
    assert not bool(shape.covers([-3.0], [5.0])[0])
    # axis-aligned WKT polygon rect-collapses; its buffer is a Rect
    # (RectangleImpl.GetBuffered semantics)
    r = parse_wkt("BUFFER(POLYGON((0 0, 10 0, 10 10, 0 10, 0 0)), 2)", True)
    assert isinstance(r, Rect)
    assert r.min_y == -2.0 and r.max_y == 12.0


def test_relate_dispatch_point():
    from spatial4n_spark.kernels.relate import relate

    bp = buffer_polygon(SQUARE, 2.0)
    from spatial4n_spark.kernels.polygon import Point

    from spatial4n_spark.relation import WITHIN

    assert relate(bp, Point(-1.0, 5.0), True) == CONTAINS
    assert relate(Point(-1.0, 5.0), bp, True) == WITHIN  # transpose path
    assert relate(bp, Point(-5.0, 5.0), True) == DISJOINT


def test_cartesian_point_on_bearing_goldens():
    """CartesianDistCalc.cs:80-107: x + sin(b)*d, y + cos(b)*d; d=0 exact."""
    x, y = point_on_bearing_cartesian([0.0, 0.0, 0.0, 3.0], [0.0, 0.0, 0.0, 4.0],
                                      [5.0, 5.0, 0.0, 2.0], [90.0, 0.0, 45.0, 180.0])
    assert x[0] == pytest.approx(5.0) and y[0] == pytest.approx(0.0, abs=1e-12)
    assert x[1] == pytest.approx(0.0, abs=1e-12) and y[1] == pytest.approx(5.0)
    assert x[2] == 0.0 and y[2] == 0.0  # dist=0 shortcut is exact
    assert x[3] == pytest.approx(3.0, abs=1e-12) and y[3] == pytest.approx(2.0)


def test_relate_circle_exact_flat():
    """BufferedPolygon x Circle: exact in the buffer's flat metric."""
    from spatial4n_spark.kernels.polygon import Circle
    from spatial4n_spark.kernels.relate import relate
    from spatial4n_spark.relation import WITHIN

    bp = buffer_polygon(SQUARE, 2.0)  # buffer of [0,10]^2 by 2
    # circle fully inside the buffer: center (5,5), dist to P = 0, r=1 <= 2
    assert relate(bp, Circle(5.0, 5.0, 1.0, geo=False), True) == CONTAINS
    # center outside at (13,5): dist to P = 3 > buf; r=0.5 -> disjoint
    assert relate(bp, Circle(13.0, 5.0, 0.5, geo=False), True) == DISJOINT
    # grazing: dist 3, r 1.5 -> 3 <= 2+1.5 intersects
    assert relate(bp, Circle(13.0, 5.0, 1.5, geo=False), True) == INTERSECTS
    # huge circle containing the whole buffer: maxdist from (5,5) to a
    # vertex is sqrt(50)~7.07; + buf 2 = 9.07 <= r=10 -> WITHIN
    assert relate(bp, Circle(5.0, 5.0, 10.0, geo=False), True) == WITHIN
    # boundary-exact: center (14,5): d=4 = buf+r for r=2 -> not disjoint
    assert relate(bp, Circle(14.0, 5.0, 2.0, geo=False), True) == INTERSECTS


def test_relate_rect_within_requires_buffer_containment():
    """A rect containing only the CORE does not contain the buffer: the
    relate must not be WITHIN unless the rect covers the buffered bbox;
    and a rect lying wholly inside the band is CONTAINS even when it
    also contains the core (round-2 review finding + round-3 ADVICE)."""
    from spatial4n_spark.relation import WITHIN

    small_core = Polygon(
        np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]])
    )
    bp = buffer_polygon(small_core, 10.0)
    # rect [0,10]^2 contains the core AND sits wholly inside the band
    # (farthest corner (0,0) is sqrt(32)~5.66 <= 10 from the core), so
    # the buffer CONTAINS the rect
    assert bp.relate_rect(Rect(0.0, 10.0, 0.0, 10.0)) == CONTAINS
    # a rect covering the whole buffered bbox IS within-able
    bb = bp.bbox()
    big = Rect(bb.min_x - 1, bb.max_x + 1, max(bb.min_y - 1, -90.0), min(bb.max_y + 1, 90.0))
    assert bp.relate_rect(big) == WITHIN
    # rect contains the core, the band sticks out past the rect in y,
    # and the rect's far corners stick out past the band in x -> INTERSECTS
    bp2 = buffer_polygon(small_core, 5.0)
    assert bp2.relate_rect(Rect(0.0, 20.0, 3.0, 7.0)) == INTERSECTS


def test_open_polar_cap_ring_stays_flat():
    """An OPEN polar-cap ring (no explicit closing point) must not be
    page-shifted into a degenerate shell (round-2 review finding)."""
    open_cap = Polygon(
        np.array([[-180.0, 86.0], [-60.0, 86.0], [60.0, 86.0],
                  [180.0, 86.0], [180.0, 90.0], [-180.0, 90.0]])
    )
    assert bool(points_covered([0.0], [88.5], open_cap, True)[0])
    assert not bool(points_covered([0.0], [80.0], open_cap, True)[0])


def test_multipolygon_buffer_area_counts_components():
    """pi*d^2 arc term once per disjoint component."""
    from spatial4n_spark.kernels.polygon import MultiPolygon

    sq = lambda x0: Polygon(np.array(
        [[x0, 0.0], [x0 + 1, 0.0], [x0 + 1, 1.0], [x0, 1.0], [x0, 0.0]]))
    mp = MultiPolygon((sq(0.0), sq(50.0)))
    bp = buffer_polygon(mp, 2.0)
    want = 2 * (1.0 + 4.0 * 2.0) + 2 * math.pi * 4.0
    assert bp.area() == pytest.approx(want)


def test_relate_polygon_cases():
    """BufferedPolygon x Polygon: exact disjoint/containment distance
    logic, estimate-grade band containment (review of all 4 branches)."""
    from spatial4n_spark.kernels.relate import relate
    from spatial4n_spark.relation import WITHIN

    bp = buffer_polygon(SQUARE, 2.0)  # [0,10]^2 + 2

    tri_inside = Polygon(np.array([[2.0, 2.0], [4.0, 2.0], [3.0, 4.0], [2.0, 2.0]]))
    assert relate(bp, tri_inside, True) == CONTAINS  # core contains it

    tri_far = Polygon(np.array([[30.0, 30.0], [32.0, 30.0], [31.0, 32.0], [30.0, 30.0]]))
    assert relate(bp, tri_far, True) == DISJOINT  # gap >> buf

    # entirely inside the buffer band (outside the core): x in [10.5, 11.5]
    tri_band = Polygon(np.array([[10.5, 4.0], [11.5, 4.0], [11.0, 5.0], [10.5, 4.0]]))
    assert relate(bp, tri_band, True) == CONTAINS

    # straddles the outer buffer boundary: x in [11, 14]
    tri_cross = Polygon(np.array([[11.0, 4.0], [14.0, 4.0], [12.5, 6.0], [11.0, 4.0]]))
    assert relate(bp, tri_cross, True) == INTERSECTS

    # huge polygon containing the whole buffer -> WITHIN
    big = Polygon(np.array([[-20.0, -20.0], [30.0, -20.0], [30.0, 30.0],
                            [-20.0, 30.0], [-20.0, -20.0]]))
    assert relate(bp, big, True) == WITHIN
    # huge polygon with a hole overlapping the buffer bbox: NOT within
    # (hole sized/placed so the estimate-grade rect sampling sees it —
    # a pinhole hole evading every sample is a documented limitation of
    # the engine's sampling-based polygon relate, not of this dispatch)
    big_holed = Polygon(
        np.array([[-20.0, -20.0], [30.0, -20.0], [30.0, 30.0], [-20.0, 30.0], [-20.0, -20.0]]),
        (np.array([[11.0, 11.0], [13.0, 11.0], [13.0, 13.0], [11.0, 13.0], [11.0, 11.0]]),),
    )
    assert relate(bp, big_holed, True) == INTERSECTS


def test_relate_polygon_review_regressions():
    """Round-2 follow-up review: band CONTAINS for core-straddling b,
    dateline-hopping b sampling, empty-core grace."""
    from spatial4n_spark.kernels.relate import relate

    bp = buffer_polygon(SQUARE, 2.0)
    # b straddles the core edge but sits entirely inside the buffer
    straddle = Polygon(np.array([[9.0, 4.0], [11.0, 4.0], [10.0, 5.5], [9.0, 4.0]]))
    assert relate(bp, straddle, True) == CONTAINS
    # b contains the core and is contained by the buffer
    between = Polygon(np.array([[-1.0, -1.0], [11.0, -1.0], [11.0, 11.0],
                                [-1.0, 11.0], [-1.0, -1.0]]))
    assert relate(bp, between, True) == CONTAINS
    # dateline-hopping b far from P: raw-midpoint sampling would put a
    # bogus sample at lon 0 touching P — must be DISJOINT
    dl = Polygon(np.array([[179.0, 0.0], [-179.0, 0.0], [-179.0, 2.0],
                           [179.0, 2.0], [179.0, 0.0]]))
    assert relate(bp, dl, True) == DISJOINT
    # empty core: graceful DISJOINT, no crash
    empty_bp = BufferedPolygon(Polygon(np.empty((0, 2))), 1.0)
    assert empty_bp.relate_polygon(straddle) == DISJOINT
