"""Parity tests for the two former inventory skips:

- NTS WKTReader-variant parser (NtsWktReaderShapeParser.cs:30-60):
  standard-WKT-only grammar, Z preserved, per-coordinate verification.
- p-norm VectorDistance (DistanceUtils.cs:123-179), incl. the
  reference's documented inf / signed-power quirks.
"""

import numpy as np
import pytest

from spatial4n_spark.io import InvalidShapeError, WktParseError, parse_wkt_reader
from spatial4n_spark.kernels.distance import vector_distance
from spatial4n_spark.kernels.polygon import (
    GeometryCollection,
    LineString,
    MultiPoint,
    Point,
    Polygon,
    Rect,
)


class TestNtsReaderVariant:
    def test_point_z_preserved(self):
        shape, z = parse_wkt_reader("POINT Z (10 20 30)")
        assert isinstance(shape, Point) and (shape.x, shape.y) == (10.0, 20.0)
        assert z is not None and z.tolist() == [30.0]

    def test_point_no_z(self):
        shape, z = parse_wkt_reader("POINT (10 20)")
        assert (shape.x, shape.y) == (10.0, 20.0) and z is None

    def test_linestring_z(self):
        shape, z = parse_wkt_reader("LINESTRING (0 0 5, 10 10 6, 20 0 7)")
        assert isinstance(shape, LineString)
        assert z.tolist() == [5.0, 6.0, 7.0]

    def test_polygon_rect_collapse_kept(self):
        # geom.IsRectangle -> MakeRectFromPoly (:92-95)
        shape, z = parse_wkt_reader("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        assert isinstance(shape, Rect)
        assert (shape.min_x, shape.max_x, shape.min_y, shape.max_y) == (0, 10, 0, 10)

    def test_polygon_z_by_ring(self):
        shape, z = parse_wkt_reader(
            "POLYGON ((0 0 1, 20 0 1, 20 10 1, 0 10 1, 0 0 1), (5 5 2, 6 5 2, 6 6 2, 5 5 2))"
        )
        # the hole blocks rect collapse, so the Polygon (and both z rings) survive
        assert isinstance(shape, Polygon)
        assert z[0].tolist() == [1.0] * 5 and z[1].tolist() == [2.0] * 4

    def test_envelope_and_buffer_rejected(self):
        # the NTS grammar has no Spatial4n CQL extensions (:33-34)
        with pytest.raises(WktParseError):
            parse_wkt_reader("ENVELOPE (10, 30, 40, 20)")
        with pytest.raises(WktParseError):
            parse_wkt_reader("BUFFER(POINT(0 0), 10)")

    def test_multipoint_z(self):
        shape, z = parse_wkt_reader("MULTIPOINT ((1 2 9), (3 4 8))")
        assert isinstance(shape, MultiPoint)
        assert z.tolist() == [9.0, 8.0]

    def test_geometrycollection_mixed_z(self):
        shape, z = parse_wkt_reader(
            "GEOMETRYCOLLECTION (POINT (1 2 7), LINESTRING (0 0, 1 1))"
        )
        assert isinstance(shape, GeometryCollection)
        assert z[0].tolist() == [7.0] and z[1] is None

    def test_bounds_verification(self):
        # VerifyX/VerifyY (CheckCoordinates :149-151)
        with pytest.raises(InvalidShapeError):
            parse_wkt_reader("POINT (181 0)")
        with pytest.raises(InvalidShapeError):
            parse_wkt_reader("POINT (0 91)")
        # non-geo context skips world-bounds checks
        shape, _ = parse_wkt_reader("POINT (500 400)", geo=False)
        assert (shape.x, shape.y) == (500.0, 400.0)

    def test_norm_wrap_longitude_is_inert_like_reference(self):
        # the reference's filter verifies the ORIGINAL x (Filter :129-151),
        # so out-of-range X throws even with wrap enabled, and in-range X
        # is NormLonDEG's identity fast path — the flag changes nothing
        with pytest.raises(InvalidShapeError):
            parse_wkt_reader("POINT (190 0)", norm_wrap_longitude=True)
        shape, _ = parse_wkt_reader("POINT (170 0)", norm_wrap_longitude=True)
        assert shape.x == 170.0

    def test_trailing_garbage_and_none(self):
        with pytest.raises(WktParseError):
            parse_wkt_reader("POINT (1 2) extra")
        with pytest.raises(TypeError):
            parse_wkt_reader(None)


class TestVectorDistance:
    A = np.array([1.0, 2.0, 3.0])
    B = np.array([4.0, 0.0, 3.0])

    def test_powers_0_1_2(self):
        assert vector_distance(self.A, self.B, 0) == 2.0
        assert vector_distance(self.A, self.B, 1) == 5.0
        assert vector_distance(self.A, self.B, 2) == pytest.approx(np.sqrt(13.0), abs=0)

    def test_infinity_quirk_parity(self):
        # reference folds max(v1[i], v2[i]) — diffs ignored (:166-170)
        assert vector_distance(self.A, self.B, float("inf")) == 4.0
        assert vector_distance(self.A, self.B, 2**31 - 1) == 4.0  # int.MaxValue path
        # corrected Chebyshev
        assert vector_distance(self.A, self.B, float("inf"), quirks=False) == 3.0

    def test_infinity_zero_floor_and_empty(self):
        # C# seeds the fold with result=0, so all-negative inputs floor at 0
        neg = vector_distance(np.array([-1.0, -2.0]), np.array([-3.0, -4.0]), float("inf"))
        assert neg == 0.0
        # and zero-length vectors return 0.0 (the loop never runs), like
        # the 0/1/2-power branches already do
        e = np.empty(0)
        for p in (0, 1.0, 2.0, float("inf"), 3.0):
            assert vector_distance(e, e, p) == 0.0

    def test_general_power_signed_quirk(self):
        # (-3)^3 + 2^3 + 0 = -19; (-19)^(1/3) = NaN in double math (:173-177)
        assert np.isnan(vector_distance(self.A, self.B, 3.0))
        assert vector_distance(self.A, self.B, 3.0, quirks=False) == pytest.approx(35.0 ** (1 / 3))

    def test_batch_and_shape_mismatch(self):
        out = vector_distance(np.stack([self.A, self.A]), np.stack([self.B, self.A]), 1)
        assert out.tolist() == [5.0, 0.0]
        with pytest.raises(ValueError):
            vector_distance(self.A, self.B[:2], 2)


def test_pnorm_udf_matches_kernel(spark):
    """pnorm_dist_udf over array<double> columns == the numpy kernel."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spatial4n_spark.functions.udfs import pnorm_dist_udf

    rng = np.random.default_rng(7)
    v1 = rng.normal(size=(64, 8)).round(3)
    v2 = rng.normal(size=(64, 8)).round(3)
    pdf = pd.DataFrame({"a": list(map(list, v1)), "b": list(map(list, v2))})
    df = spark.createDataFrame(pdf)
    for power, quirks in [(1.0, True), (2.0, True), (float("inf"), True), (3.0, False)]:
        got = (
            df.select(pnorm_dist_udf(power, quirks=quirks)("a", "b").alias("d"))
            .toPandas()["d"]
            .to_numpy()
        )
        want = vector_distance(v1, v2, power, quirks=quirks)
        assert np.allclose(got, want, equal_nan=True)


def test_pnorm_udf_null_and_empty_vectors(spark):
    """A NULL vector row yields NaN (not a batch-wide crash); zero-length
    vectors yield 0.0 with row alignment preserved."""
    import pandas as pd

    from spatial4n_spark.functions.udfs import pnorm_dist_udf

    pdf = pd.DataFrame(
        {"a": [[1.0, 2.0], None, [3.0, 4.0]], "b": [[1.0, 0.0], [5.0, 6.0], None]}
    )
    got = (
        spark.createDataFrame(pdf)
        .select(pnorm_dist_udf(2.0)("a", "b").alias("d"))
        .toPandas()["d"]
        .to_numpy()
    )
    assert got[0] == 2.0 and np.isnan(got[1]) and np.isnan(got[2])

    pdf0 = pd.DataFrame({"a": [[], [], []], "b": [[], [], []]})
    df0 = spark.createDataFrame(pdf0, schema="a array<double>, b array<double>")
    got0 = df0.select(pnorm_dist_udf(2.0)("a", "b").alias("d")).toPandas()["d"].to_numpy()
    assert got0.tolist() == [0.0, 0.0, 0.0]


def test_reader_variant_agrees_with_default_parser_on_corpus():
    """On every standard-WKT corpus entry the two parsers must produce the
    same shape (normalized WKT equality); the CQL-extension entries must be
    rejected by the reader variant (NtsWktReaderShapeParser.cs:33-34)."""
    from spatial4n_spark.io import parse_wkt, parse_wkt_reader, to_wkt
    from spatial4n_spark.sources.wkt_corpus import WKT_CORPUS

    for wkt_id, wkt in WKT_CORPUS:
        has_ext = "ENVELOPE" in wkt.upper() or "BUFFER" in wkt.upper()
        if has_ext:
            with pytest.raises(WktParseError):
                parse_wkt_reader(wkt)
            continue
        shape, _z = parse_wkt_reader(wkt)
        assert to_wkt(shape) == to_wkt(parse_wkt(wkt)), wkt_id
        if wkt_id == "pt_dims":
            assert _z.tolist() == [-3.0]
