"""Structured-Streaming point-in-polygon join — the stream twin of the
flagship batch operator (north_rule: images "spatially joined to polygon
layers"; reference semantics: SpatialRelation covers over the same layer,
Spatial4n `Shapes/Shape.cs` Relate dispatch).

The batch join (operators.spatial_join) is STATELESS end-to-end — a
broadcast cell-cover equi-join with a bbox prefilter in the join
condition plus an Arrow-vectorized exact-PIP refine filter — so the
identical plan runs on an unbounded stream as a stream-static inner
join: no state store rows at all for the join itself (Spark only keeps
state for the optional windowed rollup).  That it IS the same function
(not a re-implementation) is the correctness story: stream==batch
equality is structural, and the pytest pins it.

- ``streaming_pip_join``: per-event polygon hits (append mode, no
  watermark needed — stateless).
- ``streaming_polygon_counts``: watermarked windowed per-polygon
  event rollup, the per-polygon twin of streaming_tile_counts; state is
  bounded by (windows in watermark) x |layer|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons


def streaming_pip_join(
    stream: DataFrame,
    polygons: list[tuple[str, object]],
    lon: str = "lon",
    lat: str = "lat",
    level: int = 3,
    geo: bool = True,
    index: str = "geohash",
) -> DataFrame:
    """Join a geotagged stream to the polygons covering each event.

    Emits the stream's columns + ``poly_id``.  Stateless (stream-static
    broadcast join + refine filter), so it runs in append mode with no
    watermark and adds zero state-store pressure; exactly the batch
    plan of ``spatial_join_points_polygons`` applied to an unbounded
    source.  ``index`` swaps the candidate cell scheme ("geohash"/"s2")
    with identical results, same as batch.
    """
    return spatial_join_points_polygons(
        stream, polygons, lon=lon, lat=lat, level=level, geo=geo, index=index
    )


def streaming_polygon_counts(
    stream: DataFrame,
    polygons: list[tuple[str, object]],
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    level: int = 3,
    index: str = "geohash",
) -> DataFrame:
    """Watermarked windowed per-polygon event rollup of a geotagged
    stream: (window, poly_id, n, sum_value).

    Append-mode compatible — rows finalize when the watermark passes the
    window end.  The only stateful shuffle is the windowed groupBy on
    (window, poly_id), a bounded-cardinality key (|layer| keys per
    window), so state stays flat no matter the stream rate.
    """
    hits = streaming_pip_join(
        stream, polygons, lon=lon, lat=lat, level=level, index=index
    )
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        hits.withWatermark(ts, watermark)
        .groupBy(win.alias("window"), F.col("poly_id"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
