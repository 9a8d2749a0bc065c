"""Incrementally-maintained derived table (spark-submit entrypoint) —
the consumer half of the snapshot-checkpoint contract: a PIP-join
result table kept in sync with a growing clustered source by reading
ONLY the rows each run hasn't processed yet
(``io.clustered.next_increment``), never rescanning the source.

    zip -r /tmp/spatial4n_spark.zip spatial4n_spark
    spark-submit --master 'local[8]' --py-files /tmp/spatial4n_spark.zip \
        jobs/incremental_pip.py --work /tmp/s4n_inc --append 50000

Each run:

  1. seeds the clustered source table if missing (snapshot 1);
  2. optionally APPENDS a fresh deterministic batch (--append N rows,
     keyed off the current snapshot id — simulating upstream ingest);
  3. drains the consumer loop: for every unprocessed increment, runs
     the broadcast PIP join on JUST those rows, appends the matches to
     the derived result directory, then commits the consumer position
     (``Increment.commit`` — crash before the commit re-delivers the
     increment, and the result append is keyed by snapshot range so a
     replay overwrites its own output instead of duplicating it:
     exactly-once end to end);
  4. prints a one-line JSON summary (positions, rows processed, result
     total).

Re-running with --append 0 is a no-op (consumer caught up); crash/kill
at any point resumes correctly on the next run. Derived-table cost
scales with the INCREMENT, not the source size — the property that
keeps a 10^12-row table's downstream pipelines incremental.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", type=str, default="/tmp/s4n_inc")
    ap.add_argument("--rows", type=int, default=100_000, help="seed rows")
    ap.add_argument("--append", type=int, default=0, help="append N rows this run")
    ap.add_argument("--master", type=str, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    b = SparkSession.builder.appName("spatial4n-incremental-pip")
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
        next_increment,
        write_clustered,
    )
    from spatial4n_spark.operators.spatial_join import (
        spatial_join_points_polygons,
    )
    from spatial4n_spark.suite import layer

    source = os.path.join(args.work, "source")
    result = os.path.join(args.work, "result")
    state = os.path.join(args.work, "consumer_state.json")
    os.makedirs(args.work, exist_ok=True)

    def synth(n: int, seed: int):
        """Deterministic point batch; ``seed`` shifts keys and positions
        so every batch is distinct but reproducible."""
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

    drained = []
    new_rows = 0
    while (inc := next_increment(spark, source, state)) is not None:
        matched = spatial_join_points_polygons(
            inc.df.drop(CELL_COL), layer(), level=3, index="s2"
        ).select("pid", "poly_id")
        # replay-safe result append: output keyed by the increment's
        # snapshot range — a re-delivered increment overwrites its own
        # directory instead of duplicating rows (exactly-once)
        part = os.path.join(result, f"inc_{inc.from_snapshot}_{inc.to_snapshot}")
        matched.write.mode("overwrite").parquet(part)
        new_rows += spark.read.parquet(part).count()
        inc.commit()
        drained.append([inc.from_snapshot, inc.to_snapshot])

    parts = (
        [os.path.join(result, d) for d in sorted(os.listdir(result))]
        if os.path.isdir(result)
        else []
    )
    total = (
        spark.read.parquet(*parts).count() if parts else 0
    )
    print(
        json.dumps(
            {
                "source_snapshot": int(load_manifest(source)["snapshot_id"]),
                "increments_drained": drained,
                "new_result_rows": new_rows,
                "total_result_rows": total,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
