"""Binary codec + legacy string format: byte-level layout checks against
the reference spec, round-trips, and relate-equivalence after round-trip."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spatial4n_spark.io import parse_wkt
from spatial4n_spark.io.binary import shape_from_bytes, shape_to_bytes
from spatial4n_spark.io.legacy import parse_lat_lon, parse_point, read_legacy, write_legacy
from spatial4n_spark.kernels.polygon import Circle, GeometryCollection, Point, Rect
from spatial4n_spark.kernels.relate import relate


def test_point_byte_layout():
    b = shape_to_bytes(Point(1.5, -2.25))
    # tag byte 1 + two little-endian float64 (BinaryCodec.cs:40-57, :220s)
    assert b[0] == 1 and len(b) == 17
    assert struct.unpack_from("<dd", b, 1) == (1.5, -2.25)


def test_rect_byte_layout_order():
    b = shape_to_bytes(Rect(-10.0, 20.0, -30.0, 40.0))
    assert b[0] == 2
    # write order minX, maxX, minY, maxY
    assert struct.unpack_from("<dddd", b, 1) == (-10.0, 20.0, -30.0, 40.0)


def test_circle_and_collection_roundtrip():
    c = Circle(5.0, -7.0, 3.25, geo=True)
    rt = shape_from_bytes(shape_to_bytes(c))
    assert (rt.x, rt.y, rt.radius) == (5.0, -7.0, 3.25)

    col = GeometryCollection((Point(1.0, 2.0), Rect(0.0, 1.0, 0.0, 1.0), c))
    b = shape_to_bytes(col)
    assert b[0] == 4 and b[1] == 0  # collection tag + member-type 0
    assert struct.unpack_from("<i", b, 2)[0] == 3
    rt = shape_from_bytes(b)
    assert len(rt.shapes) == 3 and isinstance(rt.shapes[1], Rect)


@pytest.mark.parametrize("wkt", [
    "POLYGON((-10 30, -40 40, -10 -20, 40 20, 0 0, -10 30))",
    "POLYGON((-60 -40, -20 -40, -20 -10, -60 -10, -60 -40), (-50 -35, -30 -35, -30 -20, -50 -20, -50 -35))",
    "MULTIPOLYGON (((179 -17, 179.9 -17, 179.9 -16, 179 -16, 179 -17)), ((-180 -17, -179.2 -17, -179.2 -16, -180 -16, -180 -17)))",
    "LINESTRING(0 0, 10 5, 20 -5)",
])
def test_geometry_wkb_roundtrip_preserves_relate(wkt):
    shape = parse_wkt(wkt)
    b = shape_to_bytes(shape)
    assert b[0] == 5 and b[1] == 1  # geometry tag + little-endian WKB marker
    rt = shape_from_bytes(b)
    probe = Rect(-15.0, 15.0, -15.0, 35.0)
    assert relate(shape, probe) == relate(rt, probe)
    # coordinates byte-identical
    def first_coords(s):
        if hasattr(s, "polys"):
            s = s.polys[0]
        return np.asarray(s.shell if hasattr(s, "shell") else s.coords)

    np.testing.assert_array_equal(first_coords(shape), first_coords(rt))


def test_float_precision_mode():
    b = shape_to_bytes(Point(1.5, 2.5), use_float=True)
    assert len(b) == 9  # tag + two float32
    rt = shape_from_bytes(b, use_float=True)
    assert (rt.x, rt.y) == (1.5, 2.5)


def test_trailing_bytes_rejected():
    b = shape_to_bytes(Point(0.0, 0.0)) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        shape_from_bytes(b)


# --- legacy format ----------------------------------------------------------


def test_legacy_roundtrip_vectors():
    # LegacyShapeReadWriterFormat.cs:46-111 formats
    assert write_legacy(Point(1.0, 2.0)) == "1.000000 2.000000"
    assert write_legacy(Rect(-10.0, 20.0, -5.0, 15.0)) == "-10.000000 -5.000000 20.000000 15.000000"
    assert write_legacy(Circle(3.0, 4.0, 5.0, geo=True)) == "Circle(3.000000 4.000000 d=5.000000)"

    p = read_legacy("1.5 2.5")
    assert (p.x, p.y) == (1.5, 2.5)
    r = read_legacy("-10 -5 20 15")
    assert (r.min_x, r.min_y, r.max_x, r.max_y) == (-10.0, -5.0, 20.0, 15.0)
    c = read_legacy("Circle(3 4 d=5)")
    assert (c.x, c.y, c.radius) == (3.0, 4.0, 5.0)
    assert read_legacy("CIRCLE(3 4 distance=5)").radius == 5.0


def test_legacy_lat_comma_lon_order():
    p = read_legacy("48.85,2.35")  # lat,lon -> x=lon
    assert (p.x, p.y) == (2.35, 48.85)
    c = read_legacy("Circle(48.85,2.35 d=1)")
    assert (c.x, c.y) == (2.35, 48.85)


def test_legacy_letter_prefix_returns_none():
    assert read_legacy("POINT(1 2)") is None  # caller may try WKT next


def test_parse_utils():
    assert (parse_point("1.5 2.5").x, parse_point("1.5,2.5").y) == (1.5, 2.5)
    assert parse_lat_lon("48.85, 2.35") == (48.85, 2.35)


def test_legacy_malformed_raise_invalid_shape():
    """Malformed legacy strings report InvalidShapeError, never bare
    ValueError/IndexError (LegacyShapeReadWriterFormat.cs error contract)."""
    from spatial4n_spark.io.wkt import InvalidShapeError

    for bad in [
        "1.5  2.5x",      # malformed number after empty-token drop
        "Circle()",        # no tokens
        "Circle(1.5)",     # center but no distance
        "Circle(1 2 d=x)", # bad distance
        "1 2 3",           # 3 numbers: neither point nor rect
    ]:
        with pytest.raises(InvalidShapeError):
            read_legacy(bad)
    # letter-prefix non-circle stays None (caller tries other parsers)
    assert read_legacy("abc,def") is None
    # double spaces between valid numbers are tolerated (empty tokens drop)
    p = read_legacy("1.5  2.5")
    assert (p.x, p.y) == (1.5, 2.5)
    with pytest.raises(InvalidShapeError):
        parse_point("1.5 abc")
    with pytest.raises(InvalidShapeError):
        parse_lat_lon("x,1")


def test_cover_cache_identity_pinning():
    """Identity-keyed cover-cache entries pin the shape object, so a hit is
    returned only for the very same live object (no id-reuse aliasing)."""
    from spatial4n_spark.plans import cover as C
    from spatial4n_spark.io import parse_wkt

    poly = parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    r1 = C.cover_cells(poly, level=2)
    key = C._cover_key(poly, 2, True, 4096)
    assert C._COVER_CACHE[key][0] is poly
    assert C.cover_cells(poly, level=2) == r1  # same object -> cache hit


def test_checkpoint_rejects_partition_id_column(spark, tmp_path):
    import pyspark.sql.functions as F
    from spatial4n_spark.checkpoint import SnapshotStore

    df = spark.range(3).withColumn("_partition_id", F.lit(7))
    store = SnapshotStore(str(tmp_path / "snap"))
    with pytest.raises(ValueError, match="_partition_id"):
        store.write(df, "stage", "fp")
