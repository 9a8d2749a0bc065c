"""The synthetic polygon join layer (FIXTURES.md §2, patterned on the
reference's test corpus — no external data).

Members:
- axis-aligned rect polygons over the hot clusters (rect-collapse path,
  NtsWktShapeParser.cs:141-164)
- the reference's base test polygon and its 180-shifted dateline twin
  (NtsGeometryTest.cs:48-62)
- the three relate-fixture triangles (NtsGeometryTest.cs:108-112)
- a Fiji-style dateline multipolygon (bbox width must stay < 5 deg,
  NtsGeometryTest.cs:251-268) and a Russia-style wide polygon
- a polygon with a hole
- a bow-tie invalid polygon (repair fixture, NtsWktShapeParser.cs:398-436)
"""

from __future__ import annotations

from spatial4n_spark.io import parse_wkt

POLYGON_LAYER: list[tuple[str, str, str]] = [
    # (poly_id, wkt, kind)
    ("paris_box", "POLYGON((2.0 48.6, 2.7 48.6, 2.7 49.1, 2.0 49.1, 2.0 48.6))", "rect"),
    ("tokyo_box", "POLYGON((139.4 35.4, 140.1 35.4, 140.1 36.0, 139.4 36.0, 139.4 35.4))", "rect"),
    ("base_poly", "POLYGON((-10 30, -40 40, -10 -20, 40 20, 0 0, -10 30))", "poly"),
    (
        "base_poly_dl",  # the base polygon shifted +180: crosses the dateline
        "POLYGON((170 30, 140 40, 170 -20, -140 20, 180 0, 170 30))",
        "dateline",
    ),
    ("tri_base", "POLYGON((0 0, 10 0, 5 5, 0 0))", "triangle"),
    ("tri_i", "POLYGON((10 0, 20 0, 15 5, 10 0))", "triangle"),
    ("tri_w", "POLYGON((0 0, 9 0, 5 5, 0 0))", "triangle"),
    (
        "fiji_style",
        "MULTIPOLYGON (((179 -17, 179.9 -17, 179.9 -16, 179 -16, 179 -17)), "
        "((-180 -17, -179.2 -17, -179.2 -16, -180 -16, -180 -17)))",
        "dateline",
    ),
    (
        "russia_style",
        "POLYGON((20 50, 100 50, 179 55, -175 60, -172 65, 20 70, 20 50))",
        "dateline",
    ),
    (
        "holed",
        "POLYGON((-60 -40, -20 -40, -20 -10, -60 -10, -60 -40), (-50 -35, -30 -35, -30 -20, -50 -20, -50 -35))",
        "hole",
    ),
    ("polar_cap", "POLYGON((-180 86, -60 86, 60 86, 180 86, 180 90, -180 90, -180 86))", "polar"),
]

# invalid fixture (kept out of the join layer; exercised by validation tests)
BOWTIE_WKT = "POLYGON((0 0, 10 10, 10 0, 0 10, 0 0))"


def polygon_layer() -> list[tuple[str, object, str]]:
    """[(poly_id, parsed shape, kind)] — parse once, driver-side."""
    return [(pid, parse_wkt(wkt), kind) for pid, wkt, kind in POLYGON_LAYER]


def polygon_layer_df(spark):
    return spark.createDataFrame(POLYGON_LAYER, "poly_id string, wkt string, kind string")
