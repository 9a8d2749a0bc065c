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


def tile_pyramid(
    points: DataFrame,
    level: int = 3,
    min_level: int = 1,
    lon: str = "lon",
    lat: str = "lat",
    salt_buckets: int = 1,
    salt_col: str = "phash",
    sum_col: str | None = None,
    index: str = "geohash",
) -> DataFrame:
    """Multi-resolution tile rollup — per-cell (n, sum) at EVERY level in
    ``[min_level, level]`` from ONE pass over the input.

    The input is scanned and aggregated once, at the finest level (via
    ``tile_stats``, salted two-phase when asked); every coarser level is
    then derived from those finest-level PARTIALS by parent-cell
    truncation — explode each finest cell into its ancestor chain and
    re-aggregate.  Cost at design scale: the input shuffle happens once;
    the rollup shuffles only ``n_cells × n_levels`` pre-aggregated rows
    (geometrically fewer than the input), vs. one full scan + shuffle
    per level for the naive per-level loop — the standard map-tile /
    raster-pyramid build (zoom z from z+1), here as one declarative
    plan Catalyst fuses end to end.

    Parent cells are pure JVM expressions (no UDF): geohash parent =
    character-prefix truncation (``substring``), S2 parent = Hilbert
    bit-shift (``shiftright(cell, 2*(child-parent))`` — see
    ``kernels.s2cell.s2_parent``).  H3 is rejected: aperture-7 hex
    children only approximately nest, so exact rollup does not exist.

    Integer sums are order-insensitive, so every level is bit-equal to
    a direct ``tile_stats`` at that level (pytest-pinned).

    Returns (lvl, cell, n[, sum_<sum_col>]) for all levels.
    """
    if index not in ("geohash", "s2"):
        raise ValueError(
            f"tile_pyramid needs exactly-nesting cells (geohash or s2); "
            f"h3 aperture-7 children only approximately nest, got {index!r}"
        )
    if not 0 <= min_level <= level:
        raise ValueError(f"need 0 <= min_level <= level, got {min_level}, {level}")
    # rollup is only exact for decomposable aggregates: (count, sum).
    # Without sum_col, restrict to counts — summing the default shape's
    # per-cell AVERAGES would weight every child cell equally, not every
    # row (the classic rollup bug).
    finest = tile_stats(
        points,
        level=level,
        lon=lon,
        lat=lat,
        # count-only rollups skip the explicit salt stage: map-side
        # partial combine already bounds a hot cell to one row per input
        # partition for plain counts (see tile_stats docstring)
        salt_buckets=salt_buckets if sum_col is not None else 1,
        salt_col=salt_col,
        sum_col=sum_col,
        index=index,
        aggs=None if sum_col is not None else [F.count(F.lit(1)).alias("n")],
    )
    val_cols = [c for c in finest.columns if c != "cell"]
    lvls = F.array(*[F.lit(int(x)) for x in range(min_level, level + 1)])
    if index == "geohash":
        parent = F.expr("substring(cell, 1, lvl)")
    else:
        parent = F.expr(f"shiftright(cell, ({int(level)} - lvl) * 2)")
    exploded = finest.select(
        F.explode(lvls).alias("lvl"), "*"
    ).select("lvl", parent.alias("cell"), *val_cols)
    return exploded.groupBy("lvl", "cell").agg(
        *[F.sum(c).alias(c) for c in val_cols]
    )
