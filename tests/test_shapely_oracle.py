"""Third-opinion oracle: shapely (planar GEOS), beside DuckDB.

The hand-built relate/bbox kernels are pinned by the DuckDB oracle and
the reference's test vectors, but both pins were AUTHORED here — a
shared blind spot would pass both.  Shapely is an independent geometry
engine; where its planar model overlaps ours (euclidean, non-dateline,
non-geodesic shapes) the answers must agree exactly.

Shapely is NOT installed in this sandbox (the module skips, recorded as
such); in any environment that has it, these run as a live third
opinion.  Geodesic circles, dateline-crossing rects, and pole logic
have no shapely counterpart and are out of scope by construction.
"""

from __future__ import annotations

import pytest

shapely = pytest.importorskip("shapely")

from shapely import wkt as shapely_wkt  # noqa: E402

from spatial4n_spark.io.wkt import parse_wkt, to_wkt  # noqa: E402
from spatial4n_spark.kernels.polygon import (  # noqa: E402
    Polygon,
    Rect,
    shape_bbox,
)
from spatial4n_spark.kernels.relate import relate  # noqa: E402

# planar, dateline-free shapes from the gate corpus (standard WKT only —
# ENVELOPE/BUFFER are native extensions shapely's reader rejects)
_PLANAR_WKTS = [
    "POINT (1 2)",
    "LINESTRING (0 0, 10 0, 10 10)",
    "POLYGON ((0 0, 10 0, 11 10, 0 10, 0 0))",
    "POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0), (10 10, 20 10, 20 20, 10 20, 10 10))",
    "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((10 10, 15 10, 15 15, 10 15, 10 10)))",
    "GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))",
]


def test_bbox_agrees_with_shapely():
    for w in _PLANAR_WKTS:
        ours = shape_bbox(parse_wkt(w, False), False)
        theirs = shapely_wkt.loads(w).bounds  # (minx, miny, maxx, maxy)
        assert (ours.min_x, ours.min_y, ours.max_x, ours.max_y) == pytest.approx(
            theirs
        ), w


def test_polygon_relate_agrees_with_shapely():
    """Planar polygon x polygon/rect relate vs GEOS predicates.  Our
    relate maps to the reference's CONTAINS/WITHIN/INTERSECTS/DISJOINT
    lattice; GEOS covers/coveredby/intersects is the same lattice for
    areal geometries."""
    cases = [
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"),
        ("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
    ]
    from spatial4n_spark.relation import _NAMES

    for wa, wb in cases:
        ours = _NAMES[
            int(relate(parse_wkt(wa, False), parse_wkt(wb, False), False))
        ]
        a, b = shapely_wkt.loads(wa), shapely_wkt.loads(wb)
        if a.covers(b):
            want = "CONTAINS"
        elif b.covers(a):
            want = "WITHIN"
        elif a.intersects(b):
            want = "INTERSECTS"
        else:
            want = "DISJOINT"
        assert str(ours) == want, (wa, wb)


def test_wkt_roundtrip_agrees_with_shapely():
    """to_wkt output re-parses in shapely to an equal geometry."""
    for w in _PLANAR_WKTS:
        ours = to_wkt(parse_wkt(w, False))
        assert shapely_wkt.loads(ours).equals(shapely_wkt.loads(w)), w
