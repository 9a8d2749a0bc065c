"""Streaming-maintained derived table (spark-submit entrypoint) — the
Structured-Streaming twin of ``jobs/incremental_pip.py``: the same
PIP-join result table kept in sync with a growing clustered source, but
consumed through the NATIVE table streaming source
(``streaming/clustered_source.py``) instead of the batch consumer loop.

    zip -r /tmp/spatial4n_spark.zip spatial4n_spark
    spark-submit --master 'local[8]' --py-files /tmp/spatial4n_spark.zip \
        jobs/streaming_pip.py --work /tmp/s4n_stream --append 50000

Each run:

  1. seeds the clustered source table if missing (snapshot 1);
  2. optionally APPENDS a fresh deterministic batch (--append N rows);
  3. opens ``spark.readStream.format("clustered-appends")`` on the
     source and drains everything available: per micro-batch, the
     broadcast PIP join runs on JUST the appended rows and the matches
     land in a batch-id-keyed result directory (a replayed batch
     overwrites its own output instead of duplicating — exactly-once on
     top of at-least-once redelivery);
  4. stops the stream and prints a one-line JSON summary.

Where the batch twin tracks its position in ``consumer_state.json``
(``Increment.commit``), here the position lives in SPARK'S OWN
streaming checkpoint: the source's snapshot-id offsets are committed to
``<work>/ckpt`` by the engine, so a re-run resumes exactly where the
last one stopped, and a kill at any point between the result write and
the offset commit re-delivers into the idempotent sink.  Derived-table
cost scales with the APPENDED rows, never the source size.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", type=str, default="/tmp/s4n_stream")
    ap.add_argument("--rows", type=int, default=100_000, help="seed rows")
    ap.add_argument("--append", type=int, default=0, help="append N rows this run")
    ap.add_argument("--master", type=str, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    b = SparkSession.builder.appName("spatial4n-streaming-pip")
    if args.master:
        b = b.master(args.master)
    spark = (
        b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.io.clustered import (
        CELL_COL,
        append_clustered,
        load_manifest,
        write_clustered,
    )
    from spatial4n_spark.operators.spatial_join import (
        spatial_join_points_polygons,
    )
    from spatial4n_spark.streaming import read_clustered_stream
    from spatial4n_spark.suite import layer

    source = os.path.join(args.work, "source")
    result = os.path.join(args.work, "result")
    ckpt = os.path.join(args.work, "ckpt")
    os.makedirs(args.work, exist_ok=True)

    def synth(n: int, seed: int):
        """Deterministic point batch; ``seed`` shifts keys and positions
        so every batch is distinct but reproducible (same generator as
        the batch twin)."""
        return (
            spark.range(n)
            .select(
                (F.col("id") + seed * 10_000_000).alias("pid"),
                ((F.col("id") * 37 + seed * 101) % 3600 / 10.0 - 180.0).alias("lon"),
                ((F.col("id") * 53 + seed * 7) % 1700 / 10.0 - 85.0).alias("lat"),
            )
        )

    if not os.path.exists(os.path.join(source, "_cluster_manifest.json")):
        write_clustered(synth(args.rows, 0), source, level=14, files=16)
    if args.append > 0:
        sid = int(load_manifest(source)["snapshot_id"])
        append_clustered(synth(args.append, sid), source, files=4)

    lyr = layer()
    batches: list[int] = []
    new_rows = 0

    def handle(batch_df, batch_id: int):
        nonlocal new_rows
        matched = spatial_join_points_polygons(
            batch_df.drop(CELL_COL), lyr, level=3, index="s2"
        ).select("pid", "poly_id")
        # replay-safe result append: output keyed by the micro-batch id
        # — a re-delivered batch overwrites its own directory
        part = os.path.join(result, f"batch_{int(batch_id):05d}")
        matched.write.mode("overwrite").parquet(part)
        new_rows += spark.read.parquet(part).count()
        batches.append(int(batch_id))

    q = (
        read_clustered_stream(spark, source)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    parts = sorted(glob.glob(os.path.join(result, "batch_*")))
    total = spark.read.parquet(*parts).count() if parts else 0
    print(
        json.dumps(
            {
                "source_snapshot": int(load_manifest(source)["snapshot_id"]),
                "batches_processed": batches,
                "new_result_rows": new_rows,
                "total_result_rows": total,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
