"""Streaming ingest into the Hilbert-range-clustered layout.

``foreachBatch`` + ``io.clustered.append_clustered``: every micro-batch
lands as fresh sorted files with TRUE per-file stats (queries over the
table stay exactly correct mid-ingest), and a periodic
``compact_clustered`` restores the one-sorted-run locality — the
log-structured ingest loop of an Iceberg-style table reproduced on
plain parquet.

Delivery semantics: foreachBatch replays a batch after a failure, so a
bare append sink is at-least-once. A batch-id ledger (`_BATCHES`) makes
the replay path idempotent for the common restart case: a batch id
already in the ledger is skipped. The ledger append is not atomic with
the data write — a crash in the window between them would duplicate one
batch on replay; a production table format closes that window with an
atomic metadata commit (the thing Iceberg snapshots actually buy).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

BATCH_LEDGER = "_BATCHES"


def _seen_batches(path: str) -> set[int]:
    try:
        with open(os.path.join(path, BATCH_LEDGER)) as f:
            return {int(x) for x in f.read().split() if x}
    except OSError:
        return set()


def stream_to_clustered(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    lon: str = "lon",
    lat: str = "lat",
    files_per_batch: int = 2,
):
    """Start an availableNow ingest of ``stream`` into the clustered
    table at ``path`` (which must already exist — create it with
    ``write_clustered``, possibly on an empty frame, so the manifest
    carries the cluster level). Returns the StreamingQuery."""
    from spatial4n_spark.io.clustered import append_clustered

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _seen_batches(path):
            return
        append_clustered(batch_df, path, lon=lon, lat=lat, files=files_per_batch)
        with open(os.path.join(path, BATCH_LEDGER), "a") as f:
            f.write(f"{batch_id}\n")

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
