"""SpatialEngine facade: scalar surface, SQL registration, operator
delegation — the reference-user migration path."""

from __future__ import annotations

import pytest

from spatial4n_spark.engine import SpatialEngine


@pytest.fixture(scope="module")
def engine(spark):
    return SpatialEngine(spark)


def test_scalar_surface(engine):
    rect = engine.read_wkt("ENVELOPE(-10, 10, 10, -10)")
    pt = engine.read_wkt("POINT(5 5)")
    assert engine.relate(rect, pt) == "CONTAINS"
    # golden distance vector (TestDistances.cs:45-55): (1,2)->(3,4) = 314.40338 km
    assert engine.distance_km(2.0, 1.0, 4.0, 3.0) == pytest.approx(314.40338, abs=2e-3)


def test_sql_registration(engine, spark):
    engine.register()
    row = spark.sql(
        "SELECT s4n_geohash(42.6d, -5.6d) AS gh, "
        "round(s4n_dist_km(2.0d, 1.0d, 4.0d, 3.0d), 3) AS d, "
        "s4n_relate_wkt('ENVELOPE(-10, 10, 10, -10)', 'POINT(5 5)') AS rel, "
        "s4n_s2_cell(42.6d, -5.6d) AS s2"
    ).collect()[0]
    assert row["gh"] == "ezs4"  # golden geohash prefix (TestGeohashUtils.cs:32-40)
    assert row["d"] == pytest.approx(314.403)
    assert row["rel"] == "CONTAINS"
    from spatial4n_spark.kernels.s2cell import s2_encode

    assert row["s2"] == int(s2_encode([42.6], [-5.6], engine.ctx.s2_cell_level)[0])


def test_layer_ingestion_and_join(engine, spark):
    layer_df = spark.createDataFrame(
        [("box", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")], "poly_id string, wkt string"
    )
    polys = engine.read_wkt_layer(layer_df)
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 50.0, 50.0)], "id long, lon double, lat double"
    )
    got = {(r["id"], r["poly_id"]) for r in engine.spatial_join(pts, polys).collect()}
    assert got == {(1, "box")}


def test_operator_delegation(engine, spark):
    pts = spark.createDataFrame(
        [(i, float(i % 30), float(i % 20)) for i in range(200)],
        "id long, lon double, lat double",
    )
    tiles = engine.tile_assign(pts, level=3)
    assert "cell" in tiles.columns and tiles.count() == 200
    knn = engine.knn(pts, [("q", 5.0, 5.0)], k=3, id_col="id")
    assert knn.count() == 3


def test_facade_buffer_dispatch(spark):
    """engine.buffer == Shape.GetBuffered dispatch across all shape types."""
    from spatial4n_spark.engine import SpatialEngine
    from spatial4n_spark.kernels.polybuf import BufferedPolygon
    from spatial4n_spark.kernels.polygon import Circle, LineString, Rect

    e = SpatialEngine(spark)
    c = e.buffer(e.read_wkt("POINT(10 20)"), 5.0)
    assert isinstance(c, Circle) and c.radius == 5.0
    c2 = e.buffer(c, 2.0)
    assert isinstance(c2, Circle) and c2.radius == 7.0
    r = e.buffer(e.read_wkt("ENVELOPE(0, 10, 10, 0)"), 1.0)
    assert isinstance(r, Rect) and r.min_y == -1.0
    ln = e.buffer(e.read_wkt("LINESTRING(0 0, 10 0)"), 2.0)
    assert isinstance(ln, LineString) and ln.buffer == 2.0
    bp = e.buffer(e.read_wkt("POLYGON((0 0, 10 0, 11 10, 0 10, 0 0))"), 2.0)
    assert isinstance(bp, BufferedPolygon)
    assert e.relate(bp, e.read_wkt("POINT(-1 5)")) == "CONTAINS"


def test_read_wkt_layer_caps_driver_collect(spark):
    """The broadcast-layer parse must refuse beyond-cap DataFrames
    instead of collecting them to the driver (route:
    spatial_join_points_polygons_df keeps the layer distributed)."""
    import pytest

    from spatial4n_spark.engine import SpatialEngine

    eng = SpatialEngine(spark)
    big = spark.range(30).selectExpr(
        "cast(id as string) as poly_id",
        "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))' as wkt",
    )
    with pytest.raises(ValueError, match="refuses to collect"):
        eng.read_wkt_layer(big, max_features=10)
    # under the cap it parses normally
    got = eng.read_wkt_layer(big.limit(5), max_features=10)
    assert len(got) == 5
