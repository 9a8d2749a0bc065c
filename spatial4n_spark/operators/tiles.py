"""Tile assignment + skew-aware tile aggregation.

- ``tile_assign``: one vectorized geohash-encode pass -> cell column
  (plus the SQL-expressible integer cell id twin for oracle checks).
- ``tile_stats``: per-cell aggregates. Spark's hash aggregate already does
  map-side partial combine, so a hot cell receives at most one partial row
  per input partition; for extreme skew (a single cell dominating most
  partitions at 10^12 rows) ``salt_buckets > 1`` forces an explicit
  two-phase salted aggregation: groupBy(cell, phash % salt) partials,
  then groupBy(cell) finals — the classic hot-key defusal the north rule
  asks to be explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spatial4n_spark.cellindex import cell_backend
from spatial4n_spark.functions.native import cell_id_int


def tile_assign(
    points: DataFrame,
    level: int = 4,
    lon: str = "lon",
    lat: str = "lat",
    cell_col: str = "cell",
    int_cell: bool = False,
    index: str = "geohash",
) -> DataFrame:
    """``index`` picks the cell backend: "geohash" (string cells, the
    reference's grid) or "s2" (int64 cube-face Hilbert cells,
    ``kernels/s2cell.py``) — join/agg logic downstream is identical."""
    out = points.withColumn(
        cell_col, cell_backend(index).udf(level)(F.col(lat), F.col(lon))
    )
    if int_cell:
        out = out.withColumn(f"{cell_col}_id", cell_id_int(F.col(lon), F.col(lat), level))
    return out


def tile_stats(
    points: DataFrame,
    level: int = 4,
    lon: str = "lon",
    lat: str = "lat",
    salt_buckets: int = 1,
    salt_col: str = "phash",
    aggs: list | None = None,
    sum_col: str | None = None,
    index: str = "geohash",
) -> DataFrame:
    """Per-cell (count, mean lon/lat, ...) with optional explicit salting.

    ``sum_col`` switches to the exact-integer aggregate shape
    (n, sum_<col>) used by the oracle-checked entry queries — integer sums
    are order-insensitive so the two-phase salted plan is bit-reproducible.
    """
    df = tile_assign(points, level, lon, lat, index=index)
    if sum_col is not None:
        sum_alias = f"sum_{sum_col}"
        if salt_buckets <= 1:
            return df.groupBy("cell").agg(
                F.count(F.lit(1)).alias("n"), F.sum(sum_col).alias(sum_alias)
            )
        salted = df.withColumn("_salt", F.pmod(F.col(salt_col), F.lit(salt_buckets)))
        partial = salted.groupBy("cell", "_salt").agg(
            F.count(F.lit(1)).alias("_n"), F.sum(sum_col).alias("_s")
        )
        return partial.groupBy("cell").agg(
            F.sum("_n").alias("n"), F.sum("_s").alias(sum_alias)
        )
    aggs = aggs or [
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col(lon)).alias("avg_lon"),
        F.avg(F.col(lat)).alias("avg_lat"),
    ]
    if salt_buckets <= 1:
        return df.groupBy("cell").agg(*aggs)

    # explicit two-phase salted aggregation (sum/count decomposable)
    salted = df.withColumn("_salt", F.pmod(F.col(salt_col), F.lit(salt_buckets)))
    partial = salted.groupBy("cell", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(lon)).alias("_slon"),
        F.sum(F.col(lat)).alias("_slat"),
    )
    return partial.groupBy("cell").agg(
        F.sum("_n").alias("n"),
        (F.sum("_slon") / F.sum("_n")).alias("avg_lon"),
        (F.sum("_slat") / F.sum("_n")).alias("avg_lat"),
    )
