"""Seeded randomized property tests — the reference's flagship technique
(tests/Spatial4n.Tests/Shapes/RectIntersectionTestHelper.cs:44-170,
RandomizedShapeTest.cs:201-206, Distance/TestDistances.cs:99-232),
with a fixed seed and integer-snapped coordinates to provoke edge cases
(RandomizedShapeTest.cs:45-49)."""

from __future__ import annotations

import numpy as np
import pytest

from spatial4n_spark.kernels.circle import circle_bbox
from spatial4n_spark.kernels.distance import deg_to_km, distance_deg, point_on_bearing_rad
from spatial4n_spark.kernels.distance import DEG_TO_RAD, RAD_TO_DEG
from spatial4n_spark.kernels.polygon import Circle, Point, Polygon, Rect
from spatial4n_spark.kernels.bbox import rect_contains_point
from spatial4n_spark.kernels.relate import relate
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN, transpose

RNG = np.random.RandomState(42)


def rand_rect() -> Rect:
    # even-integer snapping provokes equal-edge/boundary code paths
    cx = RNG.randint(-88, 89) * 2.0
    cy = RNG.randint(-43, 43) * 2.0
    w = RNG.randint(0, 40) * 2.0
    h = RNG.randint(0, 21) * 2.0
    min_x, max_x = cx - w / 2, cx + w / 2
    if max_x > 180:
        max_x -= 360  # dateline-crossing encoding
    return Rect(min_x, max_x, max(cy - h / 2, -90.0), min(cy + h / 2, 90.0))


def rand_circle() -> Circle:
    return Circle(
        RNG.randint(-90, 90) * 2.0, RNG.randint(-45, 45) * 2.0,
        float(RNG.randint(1, 90)), geo=True,
    )


def rect_sample_points(r: Rect, k: int = 24):
    """Uniform grid inside the rect (dateline-aware)."""
    w = r.max_x - r.min_x
    if w < 0:
        w += 360
    fx = np.linspace(0.02, 0.98, int(np.sqrt(k)))
    fy = np.linspace(0.02, 0.98, int(np.sqrt(k)))
    gx, gy = np.meshgrid(fx, fy)
    px = r.min_x + gx.ravel() * w
    px = np.where(px > 180.0, px - 360.0, px)
    py = r.min_y + gy.ravel() * (r.max_y - r.min_y)
    return px, py


def in_circle(c: Circle, px, py):
    return distance_deg(c.x, c.y, px, py, "haversine") <= c.radius


def test_circle_rect_relate_properties():
    """CONTAINS => all rect samples inside; DISJOINT => none; quotas per
    class ensure each branch is exercised (>= 20 hits each)."""
    counts = {CONTAINS: 0, WITHIN: 0, DISJOINT: 0, INTERSECTS: 0}
    trials = 0
    while min(counts[CONTAINS], counts[DISJOINT], counts[INTERSECTS]) < 20 and trials < 4000:
        trials += 1
        c, r = rand_circle(), rand_rect()
        if r.max_y - r.min_y == 0 or r.max_x == r.min_x:
            continue
        rel = int(relate(c, r, geo=True))
        counts[rel] = counts.get(rel, 0) + 1
        px, py = rect_sample_points(r)
        inside = in_circle(c, px, py)
        # tolerance: skip samples within 1e-7 deg of the boundary (the
        # reference forgives ambiguous edges via radius jiggle)
        dist = distance_deg(c.x, c.y, px, py, "haversine")
        solid = np.abs(dist - c.radius) > 1e-7
        if rel == CONTAINS:
            assert inside[solid].all(), (c, r)
        elif rel == DISJOINT:
            assert (~inside[solid]).all(), (c, r)
        elif rel == WITHIN:
            # circle inside rect: circle center + extremes inside rect
            assert bool(rect_contains_point(r.min_x, r.max_x, r.min_y, r.max_y, c.x, c.y)[0])
    assert counts[CONTAINS] >= 20 and counts[DISJOINT] >= 20 and counts[INTERSECTS] >= 20


def test_relate_symmetry_invariant():
    """relate(a, b) == transpose(relate(b, a)) for random shape pairs
    (RandomizedShapeTest.cs:201-206)."""
    shapes = []
    for _ in range(40):
        shapes.append(rand_rect())
        shapes.append(rand_circle())
        shapes.append(Point(RNG.randint(-90, 90) * 2.0, RNG.randint(-45, 45) * 2.0))
    tri = Polygon(np.array([[0.0, 0.0], [20.0, 0.0], [10.0, 14.0], [0.0, 0.0]]), ())
    shapes.append(tri)
    checked = 0
    for i in range(0, len(shapes) - 1, 2):
        a, b = shapes[i], shapes[i + 1]
        try:
            ab = int(relate(a, b, geo=True))
            ba = int(relate(b, a, geo=True))
        except TypeError:
            continue  # unsupported pairing (reference parity)
        assert ab == int(transpose(ba)), (a, b, ab, ba)
        checked += 1
    assert checked >= 30


def test_point_on_bearing_distance_roundtrip():
    """dist(start, point_on_bearing(start, d, b)) == d (TestDistances
    .cs:169-232; adaptive epsilon near the antipode)."""
    for _ in range(1000):
        lat = RNG.uniform(-89, 89)
        lon = RNG.uniform(-180, 180)
        d = RNG.uniform(0, 179)
        brg = RNG.uniform(0, 360)
        lat2, lon2 = point_on_bearing_rad(
            lat * DEG_TO_RAD, lon * DEG_TO_RAD, d * DEG_TO_RAD, brg * DEG_TO_RAD
        )
        back = float(
            distance_deg(lon, lat, float(lon2) * RAD_TO_DEG, float(lat2) * RAD_TO_DEG, "haversine")
        )
        eps = 1e-6 if d < 178 else 1e-3  # haversine degrades near antipodes
        assert back == pytest.approx(d, abs=eps)


def test_circle_bbox_contains_boundary_points():
    """The circle's bbox must contain every point on the circle boundary
    (bbox-from-distance property, TestDistances.cs:99-167)."""
    for _ in range(300):
        c = rand_circle()
        min_x, max_x, min_y, max_y = (float(v) for v in circle_bbox(c.x, c.y, c.radius))
        brgs = RNG.uniform(0, 2 * np.pi, 64)
        lat2, lon2 = point_on_bearing_rad(
            c.y * DEG_TO_RAD, c.x * DEG_TO_RAD, c.radius * DEG_TO_RAD, brgs
        )
        px = lon2 * RAD_TO_DEG
        py = lat2 * RAD_TO_DEG
        ok = rect_contains_point(min_x, max_x, min_y, max_y, px, py)
        # forgive boundary-grazing points by a whisker of float error
        grown = rect_contains_point(
            min_x - 1e-9, max_x + 1e-9, max(min_y - 1e-9, -90), min(max_y + 1e-9, 90), px, py
        )
        assert grown.all(), (c, px[~ok][:3], py[~ok][:3])
