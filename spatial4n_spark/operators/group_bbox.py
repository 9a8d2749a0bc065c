"""Grouped bounding-box aggregation with dateline-smart longitude merge.

The engine-level generalization of the reference's lon-range ExpandTo /
ShapeCollection bbox (Range.cs:194-217, ShapeCollection.cs:71-104,
order-insensitive per ShapeCollectionTest.cs:32-55): for each group of
points, the minimal covering bbox whose longitude interval is the
*shortest arc* containing every point — a group straddling the dateline
gets a min_x > max_x (crossing) bbox instead of a nearly-world-wide one
(the Fiji property: bbox width < 5 deg, NtsGeometryTest.cs:251-268).

Algorithm (distributed, two shuffles): sort longitudes within each group
(window lead), find the largest angular gap including the wrap-around
gap; the covering arc is the complement of that gap. Ties break on the
smallest arc-start longitude. Latitude is a plain min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_bbox(
    points: DataFrame,
    group_col: str,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-group (min_x, max_x, min_y, max_y) with shortest-arc longitude.

    min_x > max_x encodes a dateline-crossing bbox (the rect convention,
    RectangleImpl.cs:26-28). Groups where the largest gap is 0 (a single
    distinct longitude) degenerate to that longitude.
    """
    g = F.col(group_col)
    w = Window.partitionBy(g).orderBy(F.col(lon).asc())

    # distinct longitudes per group (duplicates create zero gaps anyway,
    # but deduping keeps the window small for hot groups)
    lons = points.select(group_col, lon).distinct()
    with_next = lons.withColumn("_next", F.lead(lon).over(w))
    first_last = lons.groupBy(group_col).agg(
        F.min(lon).alias("_first"), F.max(lon).alias("_last")
    )
    # interior gaps: next - lon; the wrap gap: first + 360 - last
    gaps = (
        with_next.where(F.col("_next").isNotNull())
        .select(
            g.alias(group_col),
            (F.col("_next") - F.col(lon)).alias("_gap"),
            F.col("_next").alias("_arc_start"),  # arc starts after the gap
            F.col(lon).alias("_arc_end"),
        )
        .unionByName(
            first_last.select(
                g.alias(group_col),
                (F.col("_first") + F.lit(360.0) - F.col("_last")).alias("_gap"),
                F.col("_first").alias("_arc_start"),
                F.col("_last").alias("_arc_end"),
            )
        )
    )
    # pick the largest gap; ties on the smallest arc-start (deterministic)
    pick = Window.partitionBy(group_col).orderBy(
        F.col("_gap").desc(), F.col("_arc_start").asc()
    )
    best = (
        gaps.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(group_col, F.col("_arc_start"), F.col("_arc_end"))
    )
    lats = points.groupBy(group_col).agg(
        F.min(lat).alias("min_y"), F.max(lat).alias("max_y")
    )
    return (
        best.join(lats, group_col)
        .select(
            group_col,
            F.col("_arc_start").alias("min_x"),
            F.col("_arc_end").alias("max_x"),
            "min_y",
            "max_y",
        )
    )
