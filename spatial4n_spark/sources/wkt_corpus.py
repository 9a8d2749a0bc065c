"""Pinned WKT codec corpus — the shape-IO gate fixture.

The corpus rows are the valid-parse cases of the reference's WKT parser
suite (tests/Spatial4n.Tests/IO/WktShapeParserTest.cs:59-181: trimmed /
case-indifferent / inner-space points, signed + scientific coords,
skipped ZM dims, EMPTY forms, both MULTIPOINT syntaxes, ENVELOPE comma
form, BUFFER on point and line, polygon holes, rect-collapse, dateline
polygon) plus the binary codec's byte-length (BinaryCodecTest.cs tag
layout, io/binary.py).

``WKT_CODEC_EXPECTED`` pins, per corpus row: the canonical re-written
WKT, the bbox (has_bbox=False and zeros for empty shapes — the gate
output avoids NULL doubles so engine hash comparison stays trivial), and
the binary-codec byte length. Values were produced by the engine kernels
and are re-validated against a live recompute by
tests/test_wkt_codec_gate.py — a kernel regression therefore fails both
the pytest and the (literal-VALUES-oracle) gate row.
"""

from __future__ import annotations

WKT_CORPUS = [
    ("pt", "POINT (100 90)"),
    ("pt_signs", "POINT (-45.3 +80.4 )"),
    ("pt_sci", "POINT (-45.3 8.04e1)"),
    ("pt_empty", "POINT EMPTY"),
    ("pt_dims", "POINT ZM ( 100 90 -3 -4)"),
    ("mpt_bare", "MULTIPOINT (10 40, 40 30, 20 20, 30 10)"),
    ("mpt_paren", "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))"),
    ("mpt_empty", "MULTIPOINT Z EMPTY"),
    ("env", " ENVELOPE ( 10 , 30 , 45 , 25 ) "),
    ("line", "LINESTRING (1 10, 2 20, 3 30)"),
    ("line_empty", "LINESTRING EMPTY"),
    ("mline", "MULTILINESTRING ((10 10, 20 20, 10 40),\n(40 40, 30 30, 40 20, 30 10))"),
    ("gc", "GEOMETRYCOLLECTION ( ENVELOPE(1,2,4,3), POINT(-1 -2)) "),
    ("gc_empty", "GEOMETRYCOLLECTION EMPTY"),
    ("gc_pt_empty", "GEOMETRYCOLLECTION ( POINT EMPTY )"),
    ("buf_pt", "BUFFER(POINT(1 2), 3)"),
    ("buf_line", "BUFFER(LINESTRING(0 0, 10 0), 2)"),
    ("poly", "POLYGON ((0 0, 10 0, 11 10, 0 10, 0 0))"),
    ("poly_hole", "POLYGON ((0 0, 12 0, 13 12, 0 12, 0 0), (3 3, 3 9, 9 9, 9 3, 3 3))"),
    ("poly_rect", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
    ("mpoly", "MULTIPOLYGON (((0 0, 4 0, 5 4, 0 4, 0 0)), ((10 10, 14 10, 15 14, 10 14, 10 10)))"),
    ("poly_dl", "POLYGON ((175 0, -175 0, -175 10, 175 10, 175 0))"),
]

# (wkt_id, norm_wkt, has_bbox, min_x, max_x, min_y, max_y, bin_len)
WKT_CODEC_EXPECTED = [
    ("pt", "POINT (100 90)", True, 100.0, 100.0, 90.0, 90.0, 17),
    ("pt_signs", "POINT (-45.3 80.4)", True, -45.3, -45.3, 80.4, 80.4, 17),
    ("pt_sci", "POINT (-45.3 80.4)", True, -45.3, -45.3, 80.4, 80.4, 17),
    ("pt_empty", "POINT EMPTY", False, 0.0, 0.0, 0.0, 0.0, 17),
    ("pt_dims", "POINT (100 90)", True, 100.0, 100.0, 90.0, 90.0, 17),
    ("mpt_bare", "MULTIPOINT (10 40, 40 30, 20 20, 30 10)", True, 10.0, 40.0, 10.0, 40.0, 74),
    ("mpt_paren", "MULTIPOINT (10 40, 40 30, 20 20, 30 10)", True, 10.0, 40.0, 10.0, 40.0, 74),
    ("mpt_empty", "MULTIPOINT EMPTY", False, 0.0, 0.0, 0.0, 0.0, 6),
    ("env", "ENVELOPE (10, 30, 45, 25)", True, 10.0, 30.0, 25.0, 45.0, 33),
    ("line", "LINESTRING (1 10, 2 20, 3 30)", True, 1.0, 3.0, 10.0, 30.0, 58),
    ("line_empty", "LINESTRING EMPTY", False, 0.0, 0.0, 0.0, 0.0, 10),
    (
        "mline",
        "GEOMETRYCOLLECTION (LINESTRING (10 10, 20 20, 10 40), "
        "LINESTRING (40 40, 30 30, 40 20, 30 10))",
        True, 10.0, 40.0, 10.0, 40.0, 138,
    ),
    ("gc", "GEOMETRYCOLLECTION (ENVELOPE (1, 2, 4, 3), POINT (-1 -2))", True, -1.0, 2.0, -2.0, 4.0, 56),
    ("gc_empty", "GEOMETRYCOLLECTION EMPTY", False, 0.0, 0.0, 0.0, 0.0, 6),
    ("gc_pt_empty", "GEOMETRYCOLLECTION (POINT EMPTY)", False, 0.0, 0.0, 0.0, 0.0, 23),
    ("buf_pt", "BUFFER(POINT(1 2), 3)", True, -2.0018303073637975, 4.0018303073637975, -1.0, 5.0, 25),
    ("buf_line", "BUFFER(LINESTRING (0 0, 10 0), 2)", True, -2.0, 12.0, -2.0, 2.0, -1),
    ("poly", "POLYGON ((0 0, 10 0, 11 10, 0 10, 0 0))", True, 0.0, 11.0, 0.0, 10.0, 94),
    (
        "poly_hole",
        "POLYGON ((0 0, 12 0, 13 12, 0 12, 0 0), (3 3, 3 9, 9 9, 9 3, 3 3))",
        True, 0.0, 13.0, 0.0, 12.0, 178,
    ),
    ("poly_rect", "ENVELOPE (0, 10, 10, 0)", True, 0.0, 10.0, 0.0, 10.0, 33),
    (
        "mpoly",
        "MULTIPOLYGON (((0 0, 4 0, 5 4, 0 4, 0 0)), ((10 10, 14 10, 15 14, 10 14, 10 10)))",
        True, 0.0, 15.0, 0.0, 14.0, 196,
    ),
    ("poly_dl", "ENVELOPE (175, -175, 10, 0)", True, 175.0, -175.0, 0.0, 10.0, 33),
]


def codec_row(wkt: str) -> tuple[str, bool, float, float, float, float, int]:
    """Live recompute of one expected row (parse -> rewrite -> bbox ->
    binary length) — shared by the gate query UDF and the pin validator."""
    import math

    from spatial4n_spark.io.binary import shape_to_bytes
    from spatial4n_spark.io.wkt import parse_wkt, to_wkt
    from spatial4n_spark.kernels.polygon import shape_bbox

    s = parse_wkt(wkt, True)
    bb = shape_bbox(s, True)
    has = not math.isnan(bb.min_x)
    try:
        # -1 pins the codec's fail-fast contract: shapes with no wire
        # representation (buffered lines) are REJECTED, not silently
        # canonicalized (reference BinaryCodec throws Unsupported shape)
        bin_len = len(shape_to_bytes(s, True))
    except ValueError:
        bin_len = -1
    return (
        to_wkt(s),
        has,
        float(bb.min_x) if has else 0.0,
        float(bb.max_x) if has else 0.0,
        float(bb.min_y) if has else 0.0,
        float(bb.max_y) if has else 0.0,
        bin_len,
    )
