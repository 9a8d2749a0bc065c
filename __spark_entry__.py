"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship point-in-polygon spatial join + tile
assignment; ``queries``/``oracle_sql`` expose the oracle-checked suite
(see ``spatial4n_spark/suite.py`` for why the results are designed to be
bit-identical between the Spark engine and the DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    PIP spatial join (broadcast cell-cover + native bbox prefilter + exact
    even-odd refinement) followed by geohash tile assignment.
    """
    from pyspark.sql import functions as F

    from spatial4n_spark.operators.tiles import tile_assign
    from spatial4n_spark.suite import layer, pts_orders
    from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons

    pts = pts_orders(spark, "/root/testdata/sf0.001")
    joined = spatial_join_points_polygons(pts, layer(), level=3)
    return tile_assign(joined, level=4).select(
        "o_orderkey", "poly_id", "cell", F.col("lon"), F.col("lat")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    """
    from spatial4n_spark.suite import SPATIAL_QUERIES
    from spatial4n_spark.suite_text import TEXT_QUERIES

    return {**SPATIAL_QUERIES, **TEXT_QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    from spatial4n_spark.suite import spatial_oracles
    from spatial4n_spark.suite_text import text_oracles

    return {**spatial_oracles(), **text_oracles()}
