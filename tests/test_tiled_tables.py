"""Tile-partitioned storage: result parity with brute force AND proof of
partition pruning in the physical plan (PartitionFilters reach the scan)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.io.tables import (
    PARTITION_COL,
    candidate_cells,
    read_tiled,
    tiled_radius_query,
    write_tiled,
)
from spatial4n_spark.operators.spatial_join import choose_join_level, spatial_join_points_polygons
from spatial4n_spark.operators.tiles import tile_assign
from spatial4n_spark.suite import layer, pts_orders


def test_tiled_radius_query_parity_and_pruning(spark, tmp_path):
    path = str(tmp_path / "tiled_pts")
    pts = pts_orders(spark, "/root/testdata/sf0.001")
    write_tiled(pts, path, level=2)

    # partition directories exist
    parts = [d for d in os.listdir(path) if d.startswith(f"{PARTITION_COL}=")]
    assert len(parts) > 50

    got = tiled_radius_query(spark, path, 2.3125, 48.875, 500.0, level=2)
    got_keys = {r["o_orderkey"] for r in got.collect()}

    brute = pts.where(
        haversine_km(F.col("lon"), F.col("lat"), F.lit(2.3125), F.lit(48.875)) <= F.lit(500.0)
    )
    want_keys = {r["o_orderkey"] for r in brute.collect()}
    assert got_keys == want_keys and len(want_keys) > 0

    # the plan prunes partitions: PartitionFilters mention the cell column
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and PARTITION_COL in plan
    # and the pruned scan reads far fewer partitions than exist
    from spatial4n_spark.kernels.polygon import Circle
    from spatial4n_spark.kernels.distance import km_to_deg

    cells = candidate_cells(Circle(2.3125, 48.875, float(km_to_deg(500.0)), geo=True), 2)
    assert len(cells) < len(parts) / 4


def test_auto_join_level_matches_fixed(spark):
    pts = pts_orders(spark, "/root/testdata/sf0.001")
    lvl = choose_join_level(layer())
    assert 2 <= lvl <= 4
    auto = spatial_join_points_polygons(pts, layer(), level=None)
    fixed = spatial_join_points_polygons(pts, layer(), level=3)
    a = {(r["o_orderkey"], r["poly_id"]) for r in auto.collect()}
    b = {(r["o_orderkey"], r["poly_id"]) for r in fixed.collect()}
    assert a == b


def test_bucketed_tables_join_and_agg_without_exchange(spark, tmp_path):
    """Co-located joins: two tables bucketed by the same cell column join
    and aggregate with ZERO shuffle Exchange — the storage-level answer
    to repeated cell-keyed joins at design scale."""
    import uuid

    from spatial4n_spark.io.tables import write_bucketed

    pts = pts_orders(spark, "/root/testdata/sf0.001")
    sfx = uuid.uuid4().hex[:8]
    ta, tb = f"bt_a_{sfx}", f"bt_b_{sfx}"
    try:
        write_bucketed(pts, ta, str(tmp_path / "a"), buckets=8, level=3)
        write_bucketed(
            pts.select("o_orderkey", "lon", "lat"),
            tb, str(tmp_path / "b"), buckets=8, level=3,
        )
        a, b = spark.table(ta), spark.table(tb)

        # the tiny test tables would auto-broadcast (also shuffle-free but
        # not the thing under test); force the big-big plan
        prior_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        joined = a.join(b.select("cell", F.col("o_orderkey").alias("rhs_key")), "cell")
        assert joined.count() > 0
        jplan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in jplan, jplan
        assert "Bucketed: true" in jplan and "SortMergeJoin" in jplan, jplan

        agg = a.groupBy("cell").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in aplan, aplan
        assert "Bucketed: true" in aplan, aplan
        # parity: bucketed agg == direct agg on the source
        want = dict(
            tile_assign(pts, 3).groupBy("cell").count().collect()
        )
        got = dict(agg.collect())
        assert got == {k: v for k, v in want.items()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_bcast)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_gate_bucketed_tile_stats_zero_exchange(spark, sf_dir):
    """The tile_stats_bucketed gate row must aggregate with ZERO
    Exchange (the bucketed layout's whole point) and match the salted
    two-phase tile_stats rows exactly."""
    from spatial4n_spark.operators.tiles import tile_stats
    from spatial4n_spark.suite import pts_lineitem, q_tile_stats_bucketed

    out = q_tile_stats_bucketed(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = sorted(map(tuple, out.collect()))
    want = sorted(
        map(
            tuple,
            tile_stats(
                pts_lineitem(spark, sf_dir), level=3, salt_buckets=8,
                salt_col="l_partkey", sum_col="l_linenumber",
            ).collect(),
        )
    )
    assert got == want
