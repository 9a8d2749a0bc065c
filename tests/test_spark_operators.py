"""Engine-operator integration tests on local Spark.

Every operator result is cross-checked against a pure-numpy brute-force
evaluation of the same kernels (the reference's randomized-property-test
strategy, RectIntersectionTestHelper.cs:44-170, adapted to joins).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark.functions.native import haversine_km, rect_contains_point
from spatial4n_spark.functions.udfs import geohash_udf, relate_wkt_udf
from spatial4n_spark.kernels.distance import deg_to_km, distance_deg
from spatial4n_spark.kernels.geohash import geohash_encode_str
from spatial4n_spark.kernels.polygon import points_covered
from spatial4n_spark.operators import knn_join, radius_join, spatial_join_points_polygons, tile_stats
from spatial4n_spark.sources import images_df, polygon_layer
from spatial4n_spark.sources.images import synth_coords

N = 4000


@pytest.fixture(scope="module")
def points(spark):
    df = images_df(spark, N, with_bytes=False).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def coords():
    ids = np.arange(N, dtype=np.int64)
    lon, lat = synth_coords(ids)
    return ids, lon, lat


def test_generator_determinism(spark, points, coords):
    ids, lon, lat = coords
    rows = points.select("image_id", "lon", "lat").orderBy("image_id").collect()
    assert len(rows) == N
    np.testing.assert_allclose([r["lon"] for r in rows], lon, rtol=0, atol=0)
    np.testing.assert_allclose([r["lat"] for r in rows], lat, rtol=0, atol=0)


def test_native_haversine_matches_kernel(spark):
    rng = np.random.default_rng(11)
    data = [
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in zip(
            rng.uniform(-180, 180, 500), rng.uniform(-90, 90, 500),
            rng.uniform(-180, 180, 500), rng.uniform(-90, 90, 500),
        )
    ]
    df = spark.createDataFrame(data, "lon1 double, lat1 double, lon2 double, lat2 double")
    got = np.array(
        df.select(haversine_km("lon1", "lat1", "lon2", "lat2").alias("d")).collect()
    ).ravel()
    arr = np.array(data)
    want = deg_to_km(distance_deg(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], "haversine"))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_geohash_udf_matches_kernel(spark, points, coords):
    ids, lon, lat = coords
    rows = (
        points.select("image_id", geohash_udf(5)(F.col("lat"), F.col("lon")).alias("cell"))
        .orderBy("image_id")
        .collect()
    )
    want = geohash_encode_str(lat, lon, 5)
    assert [r["cell"] for r in rows] == want


def test_spatial_join_matches_bruteforce(spark, points, coords):
    ids, lon, lat = coords
    layer = [(pid, shape) for pid, shape, kind in polygon_layer()]
    out = spatial_join_points_polygons(points, layer, level=3)
    got = {(r["image_id"], r["poly_id"]) for r in out.select("image_id", "poly_id").collect()}

    want = set()
    for pid, shape in layer:
        cov = points_covered(lon, lat, shape, geo=True)
        for i in np.nonzero(cov)[0]:
            want.add((f"img{int(ids[i]):09d}", pid))
    assert got == want


def test_radius_join_matches_bruteforce(spark, points, coords):
    ids, lon, lat = coords
    queries = [
        ("paris", 2.35, 48.85, 50.0),
        ("dateline", 179.5, -10.0, 300.0),
        ("pole", 0.0, 89.0, 200.0),
    ]
    out = radius_join(points, queries, level=2)
    got = {(r["query_id"], r["image_id"]) for r in out.select("query_id", "image_id").collect()}
    want = set()
    for qid, qlon, qlat, rkm in queries:
        d = deg_to_km(distance_deg(qlon, qlat, lon, lat, "haversine"))
        for i in np.nonzero(d <= rkm)[0]:
            want.add((qid, f"img{int(ids[i]):09d}"))
    assert got == want


@pytest.mark.parametrize("index", ["geohash", "s2", "h3"])
def test_radius_join_df_equals_list_path(spark, points, index):
    """The DataFrame-native radius join (queries as rows, covers planned
    distributed in mapInPandas) must return exactly the list path's
    rows — incl. the dateline and pole circles — on every backend."""
    from spatial4n_spark.operators.distance_join import radius_join_df

    queries = [
        ("paris", 2.35, 48.85, 50.0),
        ("dateline", 179.5, -10.0, 300.0),
        ("pole", 0.0, 89.0, 200.0),
    ]
    want = sorted(
        map(
            tuple,
            radius_join(points, queries, level=2, index=index)
            .select("query_id", "image_id")
            .collect(),
        )
    )
    qdf = spark.createDataFrame(
        queries, "query_id string, qlon double, qlat double, radius_km double"
    )
    got = sorted(
        map(
            tuple,
            radius_join_df(points, qdf, level=2, index=index)
            .select("query_id", "image_id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0
    # non-broadcast path (the big-query-set plan) returns the same rows
    got_shuffle = sorted(
        map(
            tuple,
            radius_join_df(points, qdf, level=2, index=index, broadcast_cover=False)
            .select("query_id", "image_id")
            .collect(),
        )
    )
    assert got_shuffle == want


def test_knn_matches_bruteforce(spark, points, coords):
    ids, lon, lat = coords
    queries = [("q_paris", 2.35, 48.85), ("q_dl", 179.9, -5.0), ("q_sparse", -120.0, -55.0)]
    k = 7
    out = knn_join(points, queries, k=k, level=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["image_id"], r["dist_km"]))
    for qid, qlon, qlat in queries:
        d = np.asarray(deg_to_km(distance_deg(qlon, qlat, lon, lat, "haversine")))
        order = sorted(range(len(d)), key=lambda i: (d[i], f"img{int(ids[i]):09d}"))[:k]
        want_ids = [f"img{int(ids[i]):09d}" for i in order]
        got_ids = [img for _, img, _ in sorted(got[qid])]
        assert got_ids == want_ids, qid
        np.testing.assert_allclose(
            sorted(x[2] for x in got[qid]), sorted(d[i] for i in order), rtol=1e-9
        )


def test_spatial_join_df_layer_equals_broadcast_path(spark, points):
    """The partitioned-cover join (layer as a DataFrame, distributed cover
    + per-task parse-cache refinement) returns exactly the broadcast
    path's rows on the oracle-verified 11-shape layer."""
    from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons_df
    from spatial4n_spark.sources.polygons import POLYGON_LAYER
    from spatial4n_spark.suite import layer

    want = {
        (r["image_id"], r["poly_id"])
        for r in spatial_join_points_polygons(points, layer(), level=3)
        .select("image_id", "poly_id")
        .collect()
    }
    layer_df = spark.createDataFrame(
        [(pid, wkt) for pid, wkt, *_ in POLYGON_LAYER], "poly_id string, wkt string"
    )
    for index, lv in (("geohash", 3), ("s2", 6), ("h3", 5)):
        got_df = spatial_join_points_polygons_df(
            points, layer_df, level=lv, index=index
        )
        got = {
            (r["image_id"], r["poly_id"])
            for r in got_df.select("image_id", "poly_id").collect()
        }
        assert got == want, index


def test_spatial_join_df_layer_salted_equals_unsalted(spark, points):
    """Explicit salted repartitioning (the north rule's hot-cell defusal)
    changes only the shuffle key, never the rows: (cell, salt) join with
    a bucket-replicated cover returns exactly the unsalted rows — checked
    on a deliberately skewed workload (half the points stacked inside one
    Paris-cell polygon)."""
    from pyspark.sql import functions as F

    from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons_df
    from spatial4n_spark.sources.polygons import POLYGON_LAYER

    layer_df = spark.createDataFrame(
        [(pid, wkt) for pid, wkt, *_ in POLYGON_LAYER], "poly_id string, wkt string"
    )
    # hot-cell workload: clone the points and pin the clones into Paris
    hot = points.select(
        F.concat(F.lit("hot_"), F.col("image_id")).alias("image_id"),
        (F.lit(2.33) + F.col("lon") * 0).alias("lon"),
        (F.lit(48.86) + F.col("lat") * 0).alias("lat"),
    )
    skewed = points.select("image_id", "lon", "lat").unionAll(hot)
    want = {
        (r["image_id"], r["poly_id"])
        for r in spatial_join_points_polygons_df(skewed, layer_df, level=3)
        .select("image_id", "poly_id").collect()
    }
    got = {
        (r["image_id"], r["poly_id"])
        for r in spatial_join_points_polygons_df(
            skewed, layer_df, level=3, salt_buckets=8
        ).select("image_id", "poly_id").collect()
    }
    assert got == want and len(got) > 0


def test_spatial_join_df_layer_10k_features(spark, points, coords):
    """A 10^4-feature synthetic layer through the partitioned-cover path:
    results match an independent numpy evaluation, and the plan builds the
    cover with a distributed MapInPandas stage (the layer never crosses
    the driver as a collected shape dict)."""
    import numpy as np

    from spatial4n_spark.kernels.polygon import Polygon
    from spatial4n_spark.kernels.polygon import points_covered as pc
    from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons_df

    ids, lon, lat = coords
    rng = np.random.default_rng(42)
    feats = []
    # 9000 boxes (rect-collapse path) + 1500 triangles (polygon refine
    # path); every coordinate is pre-rounded and rendered via repr so the
    # WKT parse and the numpy check see bit-identical doubles
    bx = np.round(rng.uniform(-179, 178, 9000), 4)
    by = np.round(rng.uniform(-84, 83, 9000), 4)
    bx2, by2 = np.round(bx + 0.8, 4), np.round(by + 0.6, 4)
    for i in range(9000):
        x0, y0, x1, y1 = (float(v) for v in (bx[i], by[i], bx2[i], by2[i]))
        feats.append(
            (f"box{i:05d}",
             f"POLYGON (({x0!r} {y0!r}, {x1!r} {y0!r}, "
             f"{x1!r} {y1!r}, {x0!r} {y1!r}, {x0!r} {y0!r}))")
        )
    tx = np.round(rng.uniform(-179, 177, 1500), 4)
    ty = np.round(rng.uniform(-84, 82, 1500), 4)
    tx2, ty2 = np.round(tx + 1.2, 4), np.round(ty + 0.2, 4)
    tx3, ty3 = np.round(tx + 0.4, 4), np.round(ty + 1.1, 4)
    for i in range(1500):
        x0, y0 = float(tx[i]), float(ty[i])
        feats.append(
            (f"tri{i:05d}",
             f"POLYGON (({x0!r} {y0!r}, {float(tx2[i])!r} {float(ty2[i])!r}, "
             f"{float(tx3[i])!r} {float(ty3[i])!r}, {x0!r} {y0!r}))")
        )
    layer_df = spark.createDataFrame(feats, "poly_id string, wkt string").repartition(8)

    out = spatial_join_points_polygons_df(points, layer_df, level=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") >= 2  # distributed cover + refinement

    got = {(r["image_id"], r["poly_id"]) for r in out.select("image_id", "poly_id").collect()}

    want = set()
    inb = (lon[:, None] >= bx) & (lon[:, None] <= bx2) \
        & (lat[:, None] >= by) & (lat[:, None] <= by2)
    for pi, pj in zip(*np.nonzero(inb)):
        want.add((f"img{int(ids[pi]):09d}", f"box{pj:05d}"))
    for j in range(1500):
        tri = Polygon(np.array([
            [tx[j], ty[j]], [tx2[j], ty2[j]], [tx3[j], ty3[j]], [tx[j], ty[j]]]))
        cov = pc(lon, lat, tri, True)
        for pi in np.nonzero(cov)[0]:
            want.add((f"img{int(ids[pi]):09d}", f"tri{j:05d}"))
    assert got == want


def test_knn_join_df_equals_list_path(spark, points):
    """The DataFrame-native kNN (queries as a DataFrame, mapInPandas ring
    cells, acceptance via joins) returns exactly the driver-list path's
    rows — including a forced shuffle-join round (broadcast_cells=0) so
    the at-scale plan is the one verified."""
    from spatial4n_spark.operators import knn_join_df

    queries = [("q_paris", 2.35, 48.85), ("q_dl", 179.9, -5.0), ("q_sparse", -120.0, -55.0)]
    k = 7
    want = {
        (r["query_id"], r["image_id"], r["rank"])
        for r in knn_join(points, queries, k=k, level=3).collect()
    }
    q_df = spark.createDataFrame(queries, "query_id string, qlon double, qlat double")
    for bcast in (200_000, 0):
        got = {
            (r["query_id"], r["image_id"], r["rank"])
            for r in knn_join_df(
                points, q_df, k=k, level=3, broadcast_cells=bcast
            ).collect()
        }
        assert got == want, f"broadcast_cells={bcast}"
    # adaptive mode: per-query levels from the counts pyramid, same rows
    got = {
        (r["query_id"], r["image_id"], r["rank"])
        for r in knn_join_df(points, q_df, k=k, level=None).collect()
    }
    assert got == want, "adaptive levels"


def test_knn_join_cover_equals_ring_path(spark, points):
    """The backend-portable cover-based kNN (expanding circle covers per
    round, prefix-property coarse joins) returns exactly the ring path's
    rows on BOTH cell backends — including pole and dateline queries,
    which exercise the cover planner's piece splitting."""
    from spatial4n_spark.operators.knn import knn_join_cover

    queries = [
        ("q_paris", 2.35, 48.85),
        ("q_dl", 179.9, -5.0),
        ("q_sparse", -120.0, -55.0),
        ("q_pole", 10.0, 89.5),
    ]
    k = 7
    want = {
        (r["query_id"], r["image_id"], r["rank"])
        for r in knn_join(points, queries, k=k, level=3).collect()
    }
    # h3 has no prefix hierarchy: the coarse join column is a re-encode
    # at the cover level instead of an ancestor shift (_coarse_cell)
    for index, level in (("s2", 12), ("geohash", 5), ("h3", 7)):
        got = {
            (r["query_id"], r["image_id"], r["rank"])
            for r in knn_join_cover(
                points, queries, k=k, index=index, level=level
            ).collect()
        }
        assert got == want, index


def test_knn_join_cover_df_equals_list_path(spark, points):
    """The DataFrame-native cover kNN (covers planned DISTRIBUTED in a
    mapInPandas stage, acceptance as aggregate + anti-join) returns
    exactly the driver-list cover path's rows on both backends,
    including pole and dateline queries."""
    from spatial4n_spark.operators.knn import knn_join_cover, knn_join_cover_df

    queries = [
        ("q_paris", 2.35, 48.85),
        ("q_dl", 179.9, -5.0),
        ("q_sparse", -120.0, -55.0),
        ("q_pole", 10.0, 89.5),
    ]
    k = 7
    q_df = spark.createDataFrame(queries, "query_id string, qlon double, qlat double")
    for index, level in (("s2", 12), ("geohash", 5), ("h3", 7)):
        want = {
            (r["query_id"], r["image_id"], r["rank"])
            for r in knn_join_cover(
                points, queries, k=k, index=index, level=level
            ).collect()
        }
        got = {
            (r["query_id"], r["image_id"], r["rank"])
            for r in knn_join_cover_df(
                points, q_df, k=k, index=index, level=level
            ).collect()
        }
        assert got == want, index


def test_tile_stats_salted_equals_plain(spark, points):
    plain = {r["cell"]: (r["n"], r["avg_lon"], r["avg_lat"]) for r in tile_stats(points, level=3).collect()}
    salted = {r["cell"]: (r["n"], r["avg_lon"], r["avg_lat"]) for r in tile_stats(points, level=3, salt_buckets=8).collect()}
    assert plain.keys() == salted.keys()
    for cell in plain:
        assert plain[cell][0] == salted[cell][0]
        np.testing.assert_allclose(plain[cell][1:], salted[cell][1:], rtol=1e-9)
    # hot cell exists (paris cluster) — sanity that skew is actually present
    top = max(plain.values())[0] if plain else 0
    assert max(v[0] for v in plain.values()) > N * 0.05


def test_relate_wkt_udf_vectors(spark):
    rows = [
        ("POLYGON((0 0, 10 0, 5 5, 0 0))", "POLYGON((0 0, 9 0, 5 5, 0 0))", "CONTAINS"),
        ("POLYGON((0 0, 10 0, 5 5, 0 0))", "POLYGON((10 0, 20 0, 15 5, 10 0))", "INTERSECTS"),
        ("ENVELOPE (0, 10, 10, 0)", "POINT (5 5)", "CONTAINS"),
        ("BUFFER(POINT(0 -90), 30)", "ENVELOPE (-180, 180, -80, -90)", "CONTAINS"),
        ("ENVELOPE (175, -175, 10, -10)", "POINT (179 0)", "CONTAINS"),
        ("ENVELOPE (175, -175, 10, -10)", "POINT (0 0)", "DISJOINT"),
    ]
    df = spark.createDataFrame([(a, b) for a, b, _ in rows], "a string, b string")
    got = [r["rel"] for r in df.select(relate_wkt_udf()(F.col("a"), F.col("b")).alias("rel")).collect()]
    assert got == [e for _, _, e in rows]


def test_native_rect_contains_point_pushdown_shape(spark, points):
    # the bbox prefilter must be a native filter (no Python eval in the plan)
    filtered = points.where(rect_contains_point(F.lit(2.0), F.lit(2.7), F.lit(48.6), F.lit(49.1), F.col("lon"), F.col("lat")))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_salt_planner_detects_hot_clusters(spark):
    """The salt planner's sketch finds the deliberately hot Paris/Tokyo
    cells and sizes the bucket count from the hottest one; salted and
    unsalted aggregation agree exactly."""
    from spatial4n_spark.operators.tiles import tile_stats
    from spatial4n_spark.plans.salt import choose_salt_buckets, sketch_hot_cells
    from spatial4n_spark.sources.images import images_df

    imgs = images_df(spark, 20_000, with_bytes=False, partitions=8).cache()
    hot = sketch_hot_cells(imgs, level=4, top=3)
    # ~18% of rows cluster near Paris: the hottest cell dwarfs the uniform
    # background (world has ~thousands of occupied level-4 cells)
    assert hot[0][1] > 1000
    assert hot[0][0].startswith(("u09", "xn7"))  # Paris / Tokyo geohash cells

    buckets = choose_salt_buckets(imgs, level=4, target_rows_per_bucket=500)
    assert buckets > 1

    from pyspark.sql import functions as F

    withm = imgs.withColumn("pm", F.pmod("phash", F.lit(1000)))  # bounded: no ANSI overflow
    unsalted = tile_stats(withm, level=4, salt_buckets=1, sum_col="pm")
    salted = tile_stats(withm, level=4, salt_buckets=buckets, salt_col="phash", sum_col="pm")
    a = {(r["cell"], r["n"], r["sum_pm"]) for r in unsalted.collect()}
    b = {(r["cell"], r["n"], r["sum_pm"]) for r in salted.collect()}
    assert a == b

    # sampled sketch also lands on a hot cluster cell (scaled estimate).
    # The Paris cluster spans adjacent near-tied level-4 cells, so the
    # sampled argmax may be any of the full sketch's top cells.
    hot_s = sketch_hot_cells(imgs, level=4, sample_fraction=0.25, top=1)
    assert hot_s[0][0] in {c for c, _ in hot}
    assert hot_s[0][0].startswith(("u09", "xn7"))
    imgs.unpersist()


def test_group_bbox_dateline_smart(spark):
    """Fiji property (NtsGeometryTest.cs:251-268): a group straddling the
    dateline gets the SHORT crossing bbox, not a near-world-wide one."""
    from spatial4n_spark.operators.group_bbox import group_bbox

    rows = (
        [("fiji", 179.0 + i * 0.1, -17.0 + i * 0.05) for i in range(5)]
        + [("fiji", -179.8 + i * 0.1, -16.5 + i * 0.05) for i in range(5)]
        + [("eu", -10.0 + i, 40.0 + i * 0.5) for i in range(5)]
        + [("solo", 42.5, 7.25)]
    )
    df = spark.createDataFrame(rows, "grp string, lon double, lat double")
    out = {r["grp"]: r for r in group_bbox(df, "grp").collect()}

    fiji = out["fiji"]
    assert fiji["min_x"] > fiji["max_x"]  # crossing encoded
    width = fiji["max_x"] - fiji["min_x"] + 360.0
    assert width < 5.0  # the smart merge keeps it tight
    assert fiji["min_y"] == -17.0 and fiji["max_y"] == pytest.approx(-16.3)

    eu = out["eu"]
    assert eu["min_x"] == -10.0 and eu["max_x"] == -6.0  # plain bbox
    solo = out["solo"]
    assert solo["min_x"] == solo["max_x"] == 42.5


def test_knn_est_cells_anisotropic(spark):
    """The broadcast-decision estimate must carry the cos(lat) lon-ring
    growth the enumeration actually performs: a pole-adjacent query's
    estimate is many times the equator estimate for the same rings, and
    both upper-bound the rows _ring_cells_frame really emits."""
    from spatial4n_spark.operators.knn import _est_cells_expr, _ring_cells_frame

    level, rings = 4, 8
    df = spark.createDataFrame(
        [(0.0, rings, level), (89.5, rings, level)],
        "_qlat double, _rings int, _level int",
    )
    eq, pole = [
        r[0] for r in df.select(_est_cells_expr([level]).alias("c")).collect()
    ]
    assert pole > 20 * eq  # anisotropy reflected, not the isotropic square
    for qlat, est in ((0.0, eq), (89.5, pole)):
        n = len(_ring_cells_frame(np.array(["q"]), [10.0], [qlat], level, rings))
        assert n <= est  # estimate stays an upper bound on enumerated rows


def test_knn_covered_radius_expr_never_exceeds_enumeration(spark):
    """Acceptance soundness across the cap boundary: the JVM per-row
    covered-radius expression must never exceed the numpy twin computed
    with the UNslacked rx (what the block really enumerated) — including
    pole-adjacent rows where rings/cos lands at the full-wrap cap."""
    from spatial4n_spark.operators.knn import (
        _covered_radius_expr,
        _covered_radius_km,
    )

    level = 3
    rows = [
        (qlat, rings)
        for qlat in (0.0, 45.0, 75.0, 85.0, 88.0, 89.0, 89.9, -89.9)
        for rings in (1, 2, 4, 8, 16, 64, 256)
    ]
    df = spark.createDataFrame(rows, "_qlat double, _rings int")
    got = df.select(
        "_qlat",
        "_rings",
        _covered_radius_expr(F.col("_qlat"), F.col("_rings"), level).alias("r"),
    ).collect()
    for r in got:
        assert r["r"] <= _covered_radius_km(r["_qlat"], level, int(r["_rings"])) + 1e-9, (
            r["_qlat"],
            r["_rings"],
        )
    # pole queries must still reach a full-wrap (lat-band) radius once
    # rings/cos clears the cap — a cap clause that can never fire would
    # strand them at ~0 km and force every pole query to brute force
    pole = [r["r"] for r in got if r["_qlat"] == 89.9 and r["_rings"] == 256]
    assert pole and pole[0] > 1000.0


def test_spatial_join_polygons_equals_matrix(spark):
    """The cover-cell polygon pair join returns exactly the crossJoin
    relate matrix's non-disjoint pairs, and its candidate set is a strict
    subset of the cross product (the point of the operator)."""
    from spatial4n_spark.operators.spatial_join import spatial_join_polygons
    from spatial4n_spark.sources.polygons import POLYGON_LAYER
    from spatial4n_spark.sources.relate_expected import LAYER_RELATE_EXPECTED

    wkts = [(pid, wkt) for pid, wkt, _ in POLYGON_LAYER]
    got = {
        (r["id_a"], r["id_b"], r["rel"])
        for r in spatial_join_polygons(spark, wkts, wkts, level=3).collect()
    }
    want = {(a, b, r) for a, b, r in LAYER_RELATE_EXPECTED if r != "DISJOINT"}
    assert got == want

    # pruning: candidates (incl. disjoint bbox-touch pairs) < full 11x11
    cands = spatial_join_polygons(
        spark, wkts, wkts, level=3, keep_disjoint=True
    ).count()
    assert len(want) <= cands < len(wkts) ** 2


def test_spatial_join_polygons_df_equals_list_path(spark):
    """The DataFrame pair join (covers planned distributed, both layers
    stay off the driver) equals the list path on every backend."""
    from spatial4n_spark.operators.spatial_join import (
        spatial_join_polygons,
        spatial_join_polygons_df,
    )
    from spatial4n_spark.sources.polygons import POLYGON_LAYER

    wkts = [(pid, wkt) for pid, wkt, _ in POLYGON_LAYER]
    want = {
        (r["id_a"], r["id_b"], r["rel"])
        for r in spatial_join_polygons(spark, wkts, wkts, level=3).collect()
    }
    layer_df = spark.createDataFrame(wkts, "poly_id string, wkt string")
    for index, lv in (("geohash", 3), ("s2", 6), ("h3", 5)):
        got = {
            (r["id_a"], r["id_b"], r["rel"])
            for r in spatial_join_polygons_df(
                layer_df, layer_df, level=lv, index=index
            ).collect()
        }
        assert got == want, index


def test_tile_pyramid_levels_equal_direct(spark, points):
    """Every pyramid level — derived from the finest level's partials by
    parent truncation, never a rescan — is bit-equal to a direct
    aggregation at that level, for both exactly-nesting backends."""
    from spatial4n_spark.operators.tiles import tile_pyramid

    pts = points.withColumn("v", (F.col("phash") % 1000).cast("long"))
    for index, lo, hi in (("geohash", 1, 3), ("s2", 3, 6)):
        pyr = tile_pyramid(
            pts, level=hi, min_level=lo, sum_col="v",
            salt_buckets=4, salt_col="phash", index=index,
        )
        rows = pyr.collect()
        assert sorted({r["lvl"] for r in rows}) == list(range(lo, hi + 1))
        for L in range(lo, hi + 1):
            direct = {
                r["cell"]: (r["n"], r["sum_v"])
                for r in tile_stats(
                    pts, level=L, sum_col="v", index=index
                ).collect()
            }
            got = {
                r["cell"]: (r["n"], r["sum_v"]) for r in rows if r["lvl"] == L
            }
            assert got == direct, (index, L)


def test_tile_pyramid_count_only_and_h3_rejected(spark, points):
    from spatial4n_spark.operators.tiles import tile_pyramid

    pyr = tile_pyramid(points, level=3, min_level=2).collect()
    assert set(r["lvl"] for r in pyr) == {2, 3}
    # counts at every level sum to the input size (partition of the set)
    for L in (2, 3):
        assert sum(r["n"] for r in pyr if r["lvl"] == L) == N
    with pytest.raises(ValueError, match="nest"):
        tile_pyramid(points, level=5, index="h3")


def test_knn_join_routes_large_batches_to_df_plan(spark, points):
    """Above df_threshold the list entry point must delegate to the
    DF-native plan (no O(#queries) driver dict / isin literals) and
    return the identical exact result — the round-5 unification of the
    legacy list path."""
    queries = [("q_paris", 2.35, 48.85), ("q_dl", 179.9, -5.0),
               ("q_sparse", -120.0, -55.0), ("q_lon", -0.1, 51.5)]
    k = 5
    want = sorted(
        map(tuple, knn_join(points, queries, k=k, level=3).collect())
    )
    # df_threshold=1 forces every call through knn_join_df
    got = sorted(
        map(
            tuple,
            knn_join(points, queries, k=k, df_threshold=1).collect(),
        )
    )
    assert got == want
