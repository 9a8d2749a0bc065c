"""Structured-Streaming spatial operators.

The reference has no streaming surface (single-threaded library); these
are the engine-level stream twins of the batch operators, built on
Spark's native streaming machinery (SURVEY.md §2.9 "classic operators
use Spark built-ins"):

- ``streaming_tile_counts``: watermarked sliding-window per-cell event
  aggregation — the streaming form of tiles.tile_stats. The geohash
  cell-encode UDF runs unchanged on the stream (stateless, Arrow-
  vectorized); state is bounded by the watermark.
- ``streaming_radius_alerts``: stream-static broadcast join against
  query circles with the native haversine predicate — the streaming
  form of the radius join (no state at all).

Both keep the unbounded side shuffle-minimal: the only stateful shuffle
is the windowed groupBy on (window, cell), a bounded-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.functions.native import haversine_km

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def derive_coords(df: DataFrame, key: str = "event_id") -> DataFrame:
    """Deterministic dyadic-lattice coordinates from an integer key (same
    derivation family as suite.pts_orders)."""
    lon = (F.col(key) * F.lit(2371)) % F.lit(4096) * F.lit(45.0) / F.lit(512.0) - F.lit(180.0)
    lat = (F.col(key) * F.lit(1381)) % F.lit(2048) * F.lit(45.0) / F.lit(512.0) - F.lit(90.0)
    return df.withColumn("lon", lon).withColumn("lat", lat)


def events_as_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of events parquet files, with
    derived coordinates (the sandbox stand-in for a Kafka geotagged feed)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return derive_coords(raw)


def streaming_tile_counts(
    stream: DataFrame,
    level: int = 3,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    index: str = "geohash",
) -> DataFrame:
    """Watermarked windowed per-cell aggregation of a geotagged stream.

    Returns (window, cell, n, sum_value) — append-mode compatible: rows
    finalize when the watermark passes the window end.  ``index`` swaps
    the cell backend ("geohash" strings / "s2" int64 cube-face Hilbert
    cells) with identical windowing/agg logic, same as batch tile_stats.
    """
    from spatial4n_spark.cellindex import cell_backend

    encode = cell_backend(index).udf(level)
    cells = stream.withColumn("cell", encode(F.col(lat), F.col(lon)))
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        cells.withWatermark(ts, watermark)
        .groupBy(win.alias("window"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def streaming_tile_pyramid(
    stream: DataFrame,
    level: int = 3,
    min_level: int = 1,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    index: str = "geohash",
) -> DataFrame:
    """Watermarked windowed MULTI-RESOLUTION tile aggregation — the
    streaming twin of ``operators.tiles.tile_pyramid``.

    Every event is encoded once at the finest level and exploded into
    its ancestor chain BEFORE the aggregation, so all zoom levels come
    out of ONE stateful windowed groupBy on (window, lvl, cell) — no
    chained streaming aggregations (which Spark restricts), no second
    pass over the stream, and state stays bounded: windows within the
    watermark x cells at all levels (a geometric series dominated by
    the finest level).  Parent cells are the same pure JVM expressions
    as batch (geohash prefix, S2 bit-shift); H3 is rejected for the
    same exact-nesting reason.

    Returns (window, lvl, cell, n, sum_value), append-mode compatible.
    """
    from spatial4n_spark.cellindex import cell_backend

    if index not in ("geohash", "s2"):
        raise ValueError(
            f"streaming_tile_pyramid needs exactly-nesting cells "
            f"(geohash or s2), got {index!r}"
        )
    if not 0 <= min_level <= level:
        raise ValueError(f"need 0 <= min_level <= level, got {min_level}, {level}")
    encode = cell_backend(index).udf(level)
    cells = stream.withColumn("_fcell", encode(F.col(lat), F.col(lon)))
    lvls = F.array(*[F.lit(int(x)) for x in range(min_level, level + 1)])
    if index == "geohash":
        parent = F.expr("substring(_fcell, 1, lvl)")
    else:
        parent = F.expr(f"shiftright(_fcell, ({int(level)} - lvl) * 2)")
    exploded = cells.select(
        "*", F.explode(lvls).alias("lvl")
    ).withColumn("cell", parent)
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        exploded.withWatermark(ts, watermark)
        .groupBy(win.alias("window"), F.col("lvl"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def streaming_radius_alerts(
    stream: DataFrame,
    centers: list[tuple[str, float, float, float]],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Stream-static join: emit events within R km of any alert center.

    ``centers``: [(alert_id, lon, lat, radius_km)] — broadcast constant;
    completely stateless, so it runs in any output mode.
    """
    spark = stream.sparkSession
    c = spark.createDataFrame(
        centers, "alert_id string, c_lon double, c_lat double, r_km double"
    )
    joined = stream.crossJoin(F.broadcast(c))
    dist = haversine_km(F.col(lon), F.col(lat), F.col("c_lon"), F.col("c_lat"))
    return (
        joined.where(dist <= F.col("r_km"))
        .withColumn("dist_km", dist)
        .drop("c_lon", "c_lat", "r_km")
    )
