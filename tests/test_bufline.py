"""Buffered-line kernel + corridor join tests: independent analytic
oracles (rotated-rectangle membership via coordinate rotation) and
brute-force sampling for rect relate."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spatial4n_spark.kernels.bufline import (
    BufLine,
    BufLineString,
    InfBufLine,
    calc_lon_degrees_at_lat,
    expand_buf_for_longitude_skew,
)
from spatial4n_spark.kernels.polygon import Rect
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS

RNG = np.random.RandomState(42)


def rotated_rect_contains(ax, ay, bx, by, buf, px, py):
    """Independent oracle: membership in the rotated rectangle around the
    segment, extended by buf past the endpoints (reference bufExtend)."""
    dx, dy = bx - ax, by - ay
    length = math.hypot(dx, dy)
    if length == 0:
        return (np.abs(px - ax) <= buf) & (np.abs(py - ay) <= buf)
    ux, uy = dx / length, dy / length  # unit along
    cx, cy = (ax + bx) / 2, (ay + by) / 2
    along = (px - cx) * ux + (py - cy) * uy
    perp = -(px - cx) * uy + (py - cy) * ux
    return (np.abs(along) <= length / 2 + buf) & (np.abs(perp) <= buf)


@pytest.mark.parametrize("seg", [
    (0.0, 0.0, 10.0, 0.0),     # horizontal
    (0.0, 0.0, 0.0, 10.0),     # vertical
    (0.0, 0.0, 10.0, 10.0),    # diagonal
    (-5.0, 3.0, 7.0, -11.0),   # generic
    (2.0, 2.0, 2.0, 2.0),      # degenerate point
])
def test_bufline_contains_matches_rotated_rect(seg):
    ax, ay, bx, by = seg
    buf = 1.5
    bl = BufLine(ax, ay, bx, by, buf)
    px = RNG.uniform(-20, 20, 4000)
    py = RNG.uniform(-20, 20, 4000)
    got = bl.contains(px, py)
    want = rotated_rect_contains(ax, ay, bx, by, buf, px, py)
    # exclude points within 1e-9 of the boundary (different but equally
    # valid FP paths may disagree exactly on it)
    margin = np.abs(bl.primary.distance_unbuffered(px, py) - buf) > 1e-9
    margin &= np.abs(bl.perp.distance_unbuffered(px, py) - bl.perp.buf) > 1e-9
    assert (got[margin] == want[margin]).all()


def test_infbufline_distance_analytic():
    line = InfBufLine(2.0, 1.0, 3.0, 0.5)  # y = 2x + 1 through (1,3)
    # distance from (0, 0) to y=2x+1: |0-0-1|/sqrt(5)
    assert float(line.distance_unbuffered(0.0, 0.0)) == pytest.approx(1 / math.sqrt(5))
    vert = InfBufLine(float("inf"), 4.0, 0.0, 0.5)
    assert float(vert.distance_unbuffered(6.5, 99.0)) == pytest.approx(2.5)


@pytest.mark.parametrize("seg,buf", [
    ((0.0, 0.0, 10.0, 4.0), 2.0),
    ((0.0, 0.0, 0.0, 8.0), 1.0),
    ((-3.0, -3.0, 5.0, 9.0), 2.5),
])
def test_bufline_relate_rect_vs_sampling(seg, buf):
    ax, ay, bx, by = seg
    bl = BufLine(ax, ay, bx, by, buf)
    rects = [
        Rect(x0, x0 + w, y0, y0 + h)
        for x0 in np.linspace(-12, 12, 7)
        for y0 in np.linspace(-12, 12, 7)
        for w, h in ((1.0, 1.0), (4.0, 2.5))
    ]
    for r in rects:
        rel = int(bl.relate_rect(r))
        gx, gy = np.meshgrid(np.linspace(r.min_x, r.max_x, 12), np.linspace(r.min_y, r.max_y, 12))
        inside = bl.contains(gx.ravel(), gy.ravel())
        if rel == DISJOINT:
            # interior samples must be outside (boundary-touch tolerance)
            d1 = bl.primary.distance_unbuffered(gx.ravel(), gy.ravel())
            d2 = bl.perp.distance_unbuffered(gx.ravel(), gy.ravel())
            strict = (d1 < buf - 1e-9) & (d2 < bl.perp.buf - 1e-9)
            assert not strict.any()
        elif rel == CONTAINS:
            assert inside.all()
        else:
            assert rel == INTERSECTS


def test_longitude_skew_expansion():
    # at the equator no expansion; at 60N lon degrees are ~2x wider
    assert expand_buf_for_longitude_skew(0.0, 0.0, 1.0) == pytest.approx(1.0, abs=1e-6)
    at60 = expand_buf_for_longitude_skew(60.0, 10.0, 1.0)
    assert 1.9 < at60 < 2.1
    assert calc_lon_degrees_at_lat(60.0, 1.0) == pytest.approx(at60)


def test_buflinestring_multi_segment():
    bls = BufLineString([(0, 0), (10, 0), (10, 10)], 1.0)
    assert len(bls.segments) == 2
    px = np.array([5.0, 10.5, 20.0, 10.0])
    py = np.array([0.5, 5.0, 20.0, -1.5])
    got = bls.contains(px, py)
    assert got.tolist() == [True, True, False, False]  # -1.5 is outside buf+extend? no: (10,-1) within end-extension
    # endpoint extension: (10, -0.9) is within the extended first segment
    assert bool(bls.contains([10.0], [-0.9])[0])


def test_corridor_join_vs_brute_force(spark):
    from spatial4n_spark.operators.corridor import corridor_join, _route_shapes
    from spatial4n_spark.suite import pts_orders

    routes = [
        ("r_diag", [(-30.0, -20.0), (0.0, 0.0), (40.0, 15.0)], 150.0),
        ("r_polar", [(-60.0, 70.0), (30.0, 70.0)], 100.0),
    ]
    pts = pts_orders(spark, "/root/testdata/sf0.001")
    got = {
        (r["o_orderkey"], r["route_id"])
        for r in corridor_join(pts, routes).collect()
    }
    pdf = pts.toPandas()
    shapes = _route_shapes(routes)
    want = set()
    for rid, shape in shapes.items():
        mask = shape.contains(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
        want |= {(int(k), rid) for k in pdf["o_orderkey"][mask]}
    assert got == want
    assert len(want) > 0
