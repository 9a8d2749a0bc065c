"""Polygon relate + WKT parser conformance tests.

Vectors from the reference suite (study-only):
- polygon relates: tests/Spatial4n.Tests/Shapes/NtsGeometryTest.cs:96-130
- WKT parse incl. failures: tests/Spatial4n.Tests/IO/WktShapeParserTest.cs:59-181
- Fiji/Russia dateline corpus: NtsGeometryTest.cs:224-268
"""

import numpy as np
import pytest

from spatial4n_spark.io import WktParseError, parse_wkt, to_wkt
from spatial4n_spark.kernels.polygon import (
    Circle,
    LineString,
    MultiPolygon,
    Point,
    Polygon,
    Rect,
    points_covered,
    shape_bbox,
    unwrap_dateline,
)
from spatial4n_spark.kernels.relate import relate
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN, transpose

BASE = "POLYGON((0 0, 10 0, 5 5, 0 0))"
POLY_I = "POLYGON((10 0, 20 0, 15 5, 10 0))"  # shares only point (10,0)
POLY_W = "POLYGON((0 0, 9 0, 5 5, 0 0))"  # within base
LINE_B = "LINESTRING(0 0, 10 0)"  # shared boundary line of base
LINE_I = "LINESTRING(10 0, 20 0)"  # shares only one point


# --- WKT parser conformance -------------------------------------------------
@pytest.mark.parametrize(
    "wkt,typ",
    [
        ("POINT (-45.3 8.04e1)", Point),
        ("POINT(-45.3 80.4)", Point),
        ("POINT ZM (100 90 -3 -4)", Point),  # dims dropped
        ("POINT EMPTY", Point),
        ("ENVELOPE (10, 30, 45, 25)", Rect),
        ("BUFFER(POINT(1 2), 3)", Circle),
        ("LINESTRING (0 0, 10 0, 10 10)", LineString),
        ("MULTIPOINT (1 2, 3 4)", type(parse_wkt("MULTIPOINT (1 2)"))),
        ("MULTIPOINT ((1 2), (3 4))", type(parse_wkt("MULTIPOINT (1 2)"))),
        (BASE, Polygon),
        ("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))", Polygon),
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))", MultiPolygon),
        ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))", object),
    ],
)
def test_wkt_parse_ok(wkt, typ):
    shape = parse_wkt(wkt)
    if typ is not object:
        assert isinstance(shape, typ), (wkt, type(shape))


@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (100, 90)",  # comma inside a coordinate
        "ENVELOPE (10 30 45 25)",  # missing required commas
        "POINT (1)",
        "POLYGON((0 0, 10 0))garbage",
        "NOTASHAPE (1 2)",
        "POINT",
    ],
)
def test_wkt_parse_fail(wkt):
    with pytest.raises(WktParseError):
        parse_wkt(wkt)


def test_envelope_arg_order():
    r = parse_wkt("ENVELOPE (10, 30, 45, 25)")
    assert (r.min_x, r.max_x, r.min_y, r.max_y) == (10, 30, 25, 45)


def test_point_values():
    p = parse_wkt("POINT (-45.3 8.04e1)")
    assert p.x == -45.3 and p.y == 80.4


def test_buffer_point_is_circle():
    c = parse_wkt("BUFFER(POINT(1 2), 3)")
    assert (c.x, c.y, c.radius) == (1, 2, 3)


def test_rect_collapse():
    # axis-aligned closed 5-point polygon collapses to a Rect
    s = parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert isinstance(s, Rect)
    assert (s.min_x, s.max_x, s.min_y, s.max_y) == (0, 10, 0, 10)
    # DatelineRule Width180: rect wider than 180 deg inverts to dateline-crossing
    s = parse_wkt("POLYGON((-170 0, 170 0, 170 10, -170 10, -170 0))")
    assert isinstance(s, Rect) and s.crosses_dateline
    assert (s.min_x, s.max_x) == (170, -170)


def test_make_rect_dateline_touch_normalization():
    # SpatialContext.MakeRectangle:266-291 — an edge at the seam is nudged
    r = parse_wkt("ENVELOPE (180, -170, 10, 0)")
    assert r.min_x == -180.0 and not r.crosses_dateline


def test_wkt_roundtrip():
    for wkt in [BASE, POLY_I, "ENVELOPE (10, 30, 45, 25)", "POINT (1 2)", "BUFFER(POINT(1 2), 3)"]:
        assert to_wkt(parse_wkt(to_wkt(parse_wkt(wkt)))) == to_wkt(parse_wkt(wkt))


# --- polygon relate vectors (NtsGeometryTest.cs:96-130) ----------------------
def test_polygon_relations():
    base = parse_wkt(BASE)
    poly_i = parse_wkt(POLY_I)
    poly_w = parse_wkt(POLY_W)
    point_b = Point(0, 0)
    line_b = parse_wkt(LINE_B)
    line_i = parse_wkt(LINE_I)

    assert relate(base, base) == CONTAINS  # preferred over EQUALS
    assert relate(base, poly_i) == INTERSECTS
    assert relate(base, poly_w) == CONTAINS
    assert relate(base, point_b) == CONTAINS  # boundary point is covered
    assert relate(base, line_b) == CONTAINS  # shared boundary line is covered
    assert relate(base, line_i) == INTERSECTS
    assert relate(line_b, line_b) == CONTAINS  # line contains itself
    assert relate(line_b, point_b) == CONTAINS


def test_polygon_relate_transpose_invariant():
    shapes = [parse_wkt(BASE), parse_wkt(POLY_I), parse_wkt(POLY_W), Point(0, 0),
              parse_wkt("ENVELOPE (0, 8, 4, -2)"), parse_wkt("BUFFER(POINT(5 2), 3)")]
    for a in shapes:
        for b in shapes:
            if a is b:
                continue  # equal shapes prefer CONTAINS in both directions
            assert relate(a, b) == transpose(relate(b, a)), (to_wkt(a), to_wkt(b))


def test_polygon_with_hole():
    poly = parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))")
    # force Polygon (rect-collapse doesn't apply: has hole)
    assert isinstance(poly, Polygon)
    cov = points_covered([5, 1, 2, 11], [5, 1, 2, 5], poly)
    assert list(cov) == [False, True, True, False]  # hole interior out, hole boundary in
    inner = parse_wkt("POLYGON((4 4, 6 4, 5 6, 4 4))")  # inside the hole
    assert relate(poly, inner) == DISJOINT
    spanning = parse_wkt("POLYGON((1 1, 9 1, 5 9, 1 1))")  # spans hole boundary
    assert relate(poly, spanning) == INTERSECTS


# --- dateline polygon behavior ----------------------------------------------
def test_dateline_shifted_polygon():
    # the reference's base test polygon shifted by 180 crosses the dateline
    from spatial4n_spark.kernels.norm import norm_lon_deg

    base = parse_wkt(BASE)
    shifted_coords = base.shell.copy()
    shifted_coords[:, 0] = [norm_lon_deg(x + 180.0) for x in shifted_coords[:, 0]]
    shifted = Polygon(shifted_coords)
    bb = shape_bbox(shifted)
    assert bb.crosses_dateline
    # interior points on the east page are covered
    assert bool(points_covered([-176.0], [2.0], shifted)[0])
    assert bool(points_covered([-179.0], [0.5], shifted)[0])
    # the seam vertex (shifted 0,0 -> 180,0) is on the boundary => covered,
    # and is equivalently reachable as -180
    assert bool(points_covered([180.0], [0.0], shifted)[0])
    assert bool(points_covered([-180.0], [0.0], shifted)[0])
    assert not bool(points_covered([0.0], [0.0], shifted)[0])


def test_fiji_style_bbox():
    # islands straddling +/-180: bbox must stay narrow and dateline-crossing
    west = parse_wkt("POLYGON((179 -17, 179.9 -17, 179.9 -16, 179 -16, 179 -17))")
    east = parse_wkt("POLYGON((-180 -17, -179.2 -17, -179.2 -16, -180 -16, -180 -17))")
    mp = MultiPolygon((Polygon(west.to_poly().shell) if hasattr(west, "to_poly") else _as_poly(west),
                       _as_poly(east)))
    bb = shape_bbox(mp)
    assert bb.crosses_dateline or bb.width < 5.0
    assert bb.width < 5.0, bb


def _as_poly(s):
    if isinstance(s, Polygon):
        return s
    if isinstance(s, Rect):
        return Polygon(np.array([
            [s.min_x, s.min_y], [s.max_x, s.min_y], [s.max_x, s.max_y], [s.min_x, s.max_y], [s.min_x, s.min_y],
        ]))
    raise TypeError


def test_unwrap_dateline():
    ring = np.array([[170.0, 0.0], [-170.0, 0.0], [-170.0, 10.0], [170.0, 10.0], [170.0, 0.0]])
    u = unwrap_dateline(ring)
    assert u[:, 0].max() - u[:, 0].min() == 20.0  # contiguous, not 340 wide


def test_russia_style_wide_bbox():
    # a contiguous shape from 20E eastward across the dateline to 172W:
    # the smart bbox is dateline-crossing with the true width (168), not a
    # naive 348-degree-wide non-crossing box
    ring = np.array([[20, 50], [100, 50], [179, 55], [-175, 60], [-172, 65], [20, 70], [20, 50]], dtype=float)
    bb = shape_bbox(Polygon(ring))
    assert bb.crosses_dateline
    assert abs(bb.width - (360 - (20 - -172))) < 1e-9  # 168 degrees


# ---------------------------------------------------------------------------
# validation / repair rules (NtsWktShapeParser.cs:~398-436)
# ---------------------------------------------------------------------------


class TestValidationRules:
    def _bowtie(self):
        from spatial4n_spark.io.wkt import _parse_polygon_body  # noqa: F401
        from spatial4n_spark.sources.polygons import BOWTIE_WKT
        from spatial4n_spark.io import parse_wkt

        # bowtie parses as a Polygon (covers-collapse doesn't apply)
        return parse_wkt(BOWTIE_WKT)

    def test_bowtie_detected_invalid(self):
        from spatial4n_spark.kernels.validate import polygon_is_valid
        from spatial4n_spark.io import parse_wkt

        assert not polygon_is_valid(self._bowtie())
        assert polygon_is_valid(parse_wkt("POLYGON((0 0, 10 0, 5 5, 0 0))"))

    def test_error_rule_raises(self):
        import pytest
        from spatial4n_spark.kernels.validate import InvalidShapeError, apply_validation_rule

        with pytest.raises(InvalidShapeError):
            apply_validation_rule(self._bowtie(), "error")
        # valid polygons pass through unchanged under every rule
        from spatial4n_spark.io import parse_wkt

        tri = parse_wkt("POLYGON((0 0, 10 0, 5 5, 0 0))")
        assert apply_validation_rule(tri, "error") is tri

    def test_convex_hull_repair(self):
        import numpy as np
        from spatial4n_spark.kernels.validate import apply_validation_rule, polygon_is_valid
        from spatial4n_spark.kernels.polygon import points_covered

        fixed = apply_validation_rule(self._bowtie(), "repair_convex_hull")
        assert polygon_is_valid(fixed)
        # hull of the bowtie is the square: center now covered
        assert bool(points_covered([5.0], [5.0], fixed)[0])
        assert bool(points_covered([9.0], [9.0], fixed)[0])

    def test_buffer0_repair_even_odd_lobes(self):
        from spatial4n_spark.kernels.validate import apply_validation_rule
        from spatial4n_spark.kernels.polygon import points_covered

        kept = apply_validation_rule(self._bowtie(), "repair_buffer0")
        # bowtie (0 0, 10 10, 10 0, 0 10): crossing at (5,5) with lobes to
        # the LEFT and RIGHT; the top/bottom wedges are outside (even-odd)
        import numpy as np

        px = np.array([1.0, 9.0, 5.0, 5.0])
        py = np.array([5.0, 5.0, 8.5, 1.5])
        got = points_covered(px, py, kept).tolist()
        assert got == [True, True, False, False]
