"""Structured-Streaming throughput bench for the repo's streaming
surfaces, one pipeline per run (every one ends in a parquet sink +
checkpoint — the full state-store path, not just stateless stages):

- ``--pipeline image`` (default): streamed decode -> PSNR/caption gate
  -> chip -> watermarked windowed mosaic (streaming/image_stream.py).
- ``--pipeline dedup``: watermarked emit-once exact dedup of a document
  stream with ~30% planted duplicates
  (streaming/dedup_stream.streaming_distinct_docs —
  dropDuplicatesWithinWatermark, the bounded-state operator).
- ``--pipeline pip``: geotagged event stream -> stream-static PIP join
  against the suite's polygon layer -> watermarked windowed per-polygon
  rollup (streaming/pip_stream.streaming_polygon_counts).

Each prints ONE JSON line with micro-batch count and rows/sec. These
are the throughput numbers beside the stream==batch equality proofs in
tests/test_streaming.py and tests/test_dedup_stream.py.

Usage: python tools/stream_bench.py [--pipeline image|dedup|pip]
         [--rows 200000] [--files 16] [--cpus 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _run_available_now(agg, work: str, timeout_s: int = 1800):
    t0 = time.time()
    q = (
        agg.writeStream.format("parquet")
        .option("path", f"{work}/sink")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    dt = time.time() - t0
    batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
    return dt, batches


def bench_image(spark, args, work: str) -> dict:
    from pyspark.sql import functions as F

    from spatial4n_spark.sources.images import images_df
    from spatial4n_spark.streaming.image_stream import (
        images_as_stream,
        streaming_image_chips,
        streaming_image_mosaics,
    )

    src = f"{work}/src"
    base = images_df(spark, args.rows, with_bytes=True, partitions=args.files)
    with_ts = base.withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + (F.col("phash") % 7200).cast("int") * F.expr("INTERVAL 1 SECOND"),
    )
    with_ts.write.parquet(src)
    n_files = len(glob.glob(f"{src}/part-*.parquet"))

    # warm the Python workers/codegen on a small batch (cold JVM start
    # is process cost, not pipeline throughput)
    streaming_image_chips(spark.read.parquet(src).limit(2000)).count()

    stream = images_as_stream(spark, src, max_files_per_trigger=args.files_per_trigger)
    agg = streaming_image_mosaics(stream, level=4, window="1 hour", watermark="2 hours")
    dt, batches = _run_available_now(agg, work)
    return {
        "bench": "streaming image ingest (decode+gate+chip+windowed mosaic)",
        "source_files": n_files,
        "micro_batches": batches,
        "sec": round(dt, 2),
        "images_per_sec": round(args.rows / dt, 1),
    }


def bench_dedup(spark, args, work: str) -> dict:
    from pyspark.sql import functions as F

    from spatial4n_spark.streaming.dedup_stream import streaming_distinct_docs

    src = f"{work}/src"
    # ~30% planted duplicates: distinct payload space is 70% of rows;
    # event times spread over 2 hours so the watermark horizon is live
    n_distinct = max(1, int(args.rows * 0.7))
    docs = (
        spark.range(args.rows)
        .repartition(args.files)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("synthetic document payload "),
                (F.col("id") % n_distinct).cast("string"),
            ).alias("text"),
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + (F.col("id") % 7200).cast("int") * F.expr("INTERVAL 1 SECOND")
            ).alias("ts"),
        )
    )
    docs.write.parquet(src)
    n_files = len(glob.glob(f"{src}/part-*.parquet"))

    spark.read.parquet(src).limit(1000).count()  # warm

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", args.files_per_trigger)
        .parquet(src)
    )
    out = streaming_distinct_docs(stream, text="text", key="doc_id", ts="ts")
    dt, batches = _run_available_now(out, work)
    emitted = spark.read.parquet(f"{work}/sink").count()
    return {
        "bench": "streaming exact dedup (dropDuplicatesWithinWatermark)",
        "source_files": n_files,
        "micro_batches": batches,
        "sec": round(dt, 2),
        "docs_per_sec": round(args.rows / dt, 1),
        "rows_emitted": emitted,
    }


def bench_pip(spark, args, work: str) -> dict:
    from pyspark.sql import functions as F

    from spatial4n_spark.streaming.pip_stream import streaming_polygon_counts
    from spatial4n_spark.streaming.tile_stream import events_as_stream
    from spatial4n_spark.suite import layer

    src = f"{work}/src"
    events = (
        spark.range(args.rows)
        .repartition(args.files)
        .select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + (F.col("id") % 7200).cast("int") * F.expr("INTERVAL 1 SECOND")
            ).alias("ts"),
            (F.col("id") % 1000).alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    events.write.parquet(src)
    n_files = len(glob.glob(f"{src}/part-*.parquet"))

    spark.read.parquet(src).limit(1000).count()  # warm

    stream = events_as_stream(spark, src, max_files_per_trigger=args.files_per_trigger)
    agg = streaming_polygon_counts(
        stream, layer(), window="1 hour", watermark="2 hours", level=3
    )
    dt, batches = _run_available_now(agg, work)
    return {
        "bench": "streaming PIP join + windowed per-polygon rollup",
        "source_files": n_files,
        "micro_batches": batches,
        "sec": round(dt, 2),
        "events_per_sec": round(args.rows / dt, 1),
    }


def bench_pyramid(spark, args, work: str) -> dict:
    """Throughput of the streaming multi-resolution tile pyramid
    (streaming/tile_stream.streaming_tile_pyramid): geotagged event
    stream -> ONE stateful windowed groupBy emitting geohash levels
    1..3 (ancestors exploded before the aggregation)."""
    from pyspark.sql import functions as F

    from spatial4n_spark.streaming.tile_stream import (
        events_as_stream,
        streaming_tile_pyramid,
    )

    src = f"{work}/src"
    events = (
        spark.range(args.rows)
        .repartition(args.files)
        .select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + (F.col("id") % 7200).cast("int") * F.expr("INTERVAL 1 SECOND")
            ).alias("ts"),
            (F.col("id") % 1000).alias("user_id"),
            F.lit("view").alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    events.write.parquet(src)
    n_files = len(glob.glob(f"{src}/part-*.parquet"))
    spark.read.parquet(src).limit(1000).count()  # warm

    stream = events_as_stream(spark, src, max_files_per_trigger=args.files_per_trigger)
    agg = streaming_tile_pyramid(
        stream, level=3, min_level=1, window="1 hour", watermark="2 hours"
    )
    dt, batches = _run_available_now(agg, work)
    return {
        "bench": "streaming tile pyramid (3 zoom levels, one stateful agg)",
        "source_files": n_files,
        "micro_batches": batches,
        "sec": round(dt, 2),
        "events_per_sec": round(args.rows / dt, 1),
    }


def bench_table_source(spark, args, work: str) -> dict:
    """Throughput of the native clustered-table streaming SOURCE
    (streaming/clustered_source.py): a snapshot-versioned table built
    as seed + 3 append commits, streamed end-to-end (snapshot-id
    offsets -> per-file partitions -> Arrow batches) into a
    checkpointed parquet sink. Drained with processAllAvailable (the
    Python stream-reader API has no availableNow hook)."""
    from pyspark.sql import functions as F

    from spatial4n_spark.io.clustered import append_clustered, write_clustered
    from spatial4n_spark.streaming import read_clustered_stream

    df = (
        spark.range(args.rows)
        .withColumnRenamed("id", "pid")
        .withColumn(
            "lon", (F.pmod(F.xxhash64("pid"), F.lit(360000)) / 1000.0) - 180.0
        )
        .withColumn(
            "lat",
            (F.pmod(F.xxhash64("pid", F.lit(1)), F.lit(170000)) / 1000.0)
            - 85.0,
        )
    )
    path = f"{work}/tbl"
    write_clustered(
        df.where(F.col("pid") % 4 == 0), path, level=14, files=args.files
    )
    for i in (1, 2, 3):
        append_clustered(
            df.where(F.col("pid") % 4 == i),
            path,
            files=max(args.files // 4, 1),
        )

    t0 = time.time()
    q = (
        read_clustered_stream(spark, path)
        .writeStream.format("parquet")
        .option("path", f"{work}/sink")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    dt = time.time() - t0
    got = spark.read.parquet(f"{work}/sink").count()
    assert got == args.rows, f"streamed {got} of {args.rows} rows"
    return {
        "bench": "clustered-table streaming source (snapshot-id offsets)",
        "commits_streamed": 4,
        "sec": round(dt, 2),
        "rows_per_sec": round(args.rows / dt, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pipeline",
        choices=["image", "dedup", "pip", "table_source", "pyramid"],
        default="image",
    )
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("stream-bench")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.sql.adaptive.enabled", "false")  # streaming: static plans
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="streambench_")
    try:
        fn = {
            "image": bench_image,
            "dedup": bench_dedup,
            "pip": bench_pip,
            "table_source": bench_table_source,
            "pyramid": bench_pyramid,
        }[args.pipeline]
        rec = fn(spark, args, work)
        rec.update(
            {
                "rows": args.rows,
                "files_per_trigger": args.files_per_trigger,
                "cpus": args.cpus,
            }
        )
        print(json.dumps(rec))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
