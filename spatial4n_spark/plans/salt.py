"""Skew planning: choose the salt factor from a cheap cell-count sketch.

SURVEY.md §4.2: "explicit salting of hot cells ... with salt factor
chosen from a cheap groupBy(cell).count() sketch". The sketch runs on a
sample (or the full table when small), finds the hottest cell, and picks
the bucket count that brings the hottest per-reducer slice under
``target_rows_per_bucket``:

    salt = clamp(ceil(hottest / target), 1, max_buckets)

A factor of 1 means the data isn't skewed enough to justify the extra
final-aggregation pass — salting costs a second shuffle stage, so it
must pay for itself.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from spatial4n_spark.operators.tiles import tile_assign


def sketch_hot_cells(
    points: DataFrame,
    level: int = 4,
    lon: str = "lon",
    lat: str = "lat",
    sample_fraction: float | None = None,
    top: int = 5,
) -> list[tuple[str, int]]:
    """[(cell, estimated_count)] for the ``top`` hottest cells."""
    df = points.sample(sample_fraction, seed=42) if sample_fraction else points
    counts = (
        tile_assign(df, level, lon, lat)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .limit(top)
        .collect()
    )
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    return [(r["cell"], int(r["n"] * scale)) for r in counts]


def choose_salt_buckets(
    points: DataFrame,
    level: int = 4,
    lon: str = "lon",
    lat: str = "lat",
    target_rows_per_bucket: int = 100_000,
    max_buckets: int = 64,
    sample_fraction: float | None = None,
) -> int:
    """Salt factor for tile_stats-style aggregations over this table."""
    hot = sketch_hot_cells(points, level, lon, lat, sample_fraction, top=1)
    if not hot:
        return 1
    hottest = hot[0][1]
    return max(1, min(max_buckets, math.ceil(hottest / target_rows_per_bucket)))
