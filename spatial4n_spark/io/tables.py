"""Tile-partitioned table layout — storage-level spatial pruning.

The storage analog of the broadcast join's cell pruning (SURVEY.md §4.2
partition-pruning row): the fact table is written partitioned by a
coarse geohash cell, so any query that can name its candidate cells
(radius/bbox/polygon covers) reads only the matching partition
directories — Catalyst shows them as PartitionFilters and never lists
the rest. At 10^12 rows this is the difference between scanning the
world and scanning a city.

Layout: parquet under ``path/cell_p=<geohash>/...`` (Iceberg would make
this a hidden partition transform; the query API is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.kernels.distance import km_to_deg
from spatial4n_spark.kernels.polygon import Circle
from spatial4n_spark.operators.tiles import tile_assign
from spatial4n_spark.plans.cover import cover_cells

PARTITION_COL = "cell_p"


def write_tiled(
    df: DataFrame,
    path: str,
    level: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    mode: str = "overwrite",
) -> None:
    """Write a point table partitioned by its coarse geohash cell."""
    out = tile_assign(df, level, lon, lat, cell_col=PARTITION_COL)
    out.write.partitionBy(PARTITION_COL).mode(mode).parquet(path)


def read_tiled(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def candidate_cells(shape, level: int) -> list[str]:
    fulls, bounds = cover_cells(shape, level)
    return sorted(set(fulls) | set(bounds))


def tiled_radius_query(
    spark: SparkSession,
    path: str,
    qlon: float,
    qlat: float,
    radius_km: float,
    level: int = 2,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Radius query over a tiled table: candidate partitions from the
    circle's cell cover (partition pruning), then the exact native
    haversine predicate."""
    circle = Circle(qlon, qlat, float(km_to_deg(radius_km)), geo=True)
    cells = candidate_cells(circle, level)
    df = read_tiled(spark, path).where(F.col(PARTITION_COL).isin(cells))
    return df.where(
        haversine_km(F.col(lon), F.col(lat), F.lit(qlon), F.lit(qlat)) <= F.lit(radius_km)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 32,
    level: int = 4,
    lon: str = "lon",
    lat: str = "lat",
    cell_col: str = "cell",
    index: str = "geohash",
    mode: str = "overwrite",
) -> None:
    """Write a point table BUCKETED by its cell — the co-located-join
    layout (the directory-partitioned ``write_tiled`` prunes scans; this
    one removes the join/agg shuffle itself).

    ``bucketBy(B, cell) + sortBy(cell)`` records a HashPartitioning in
    the table metadata, so every later cell-keyed join between tables
    bucketed the same way — and every groupBy(cell) aggregation — reads
    pre-shuffled, pre-sorted buckets: ZERO Exchange on the bucketed
    side(s) (plan-asserted in tests/test_tiled_tables.py). At 10^12
    rows this converts each repeated spatial join from a full-table
    shuffle into a bucket-local merge, the same role Iceberg's
    bucket-transform hidden partitioning plays at design scale.

    Data files land under ``path``; the table entry lives in the
    session catalog (in-memory here, a metastore in production).
    """
    out = tile_assign(df, level, lon, lat, cell_col=cell_col, index=index)
    (
        out.write.bucketBy(buckets, cell_col)
        .sortBy(cell_col)
        .option("path", path)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )
