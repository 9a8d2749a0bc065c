"""Structured-Streaming raster ingest: the stream twin of the fused
image pipeline (decode -> PSNR/caption gate -> chip -> per-cell mosaic)
over a stream of image rows (binary payload + metadata, the
BASELINE.json input_hint schema plus an event timestamp).

Design mirrors the batch operators exactly:
- the decode/gate/chip stage is the SAME Arrow chunk kernel
  (operators.raster._tile_chunk) run through ``mapInArrow`` — stateless,
  so Structured Streaming applies it per micro-batch with no state;
- the only stateful operator is the watermarked windowed groupBy on
  (window, cell) — bounded-cardinality keys, exact integer partial sums
  (order-independent, so stream results are bit-equal to batch);
- payload bytes never cross a second Arrow boundary and never enter the
  state store: only per-chip integer aggregates reach the shuffle.

At design scale the source is a Kafka/Iceberg-CDC feed of image rows;
here a file-source parquet stream stands in (same unbounded semantics).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.sources.images import IMAGES_SCHEMA

IMAGES_TS_SCHEMA = IMAGES_SCHEMA + ", ts timestamp"
CHIPS_TS_SCHEMA = (
    "image_id string, cell string, chip_row int, chip_col int, "
    "chip_w int, chip_h int, chip_sum long, chip_mean double, ts timestamp"
)


def images_as_stream(
    spark: SparkSession, images_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over parquet image files (payload + ts)."""
    return (
        spark.readStream.schema(IMAGES_TS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(images_dir)
    )


def streaming_image_chips(
    stream: DataFrame,
    level: int = 4,
    chip_px: int = 8,
    min_psnr_db: float | None = 40.0,
    chunk_rows: int = 1024,
) -> DataFrame:
    """Stateless decode -> gate -> chip of an image stream.

    Emits one row per chip with the image's event timestamp attached
    (chips inherit their image's ts for downstream windowing). Runs the
    batch Arrow kernel unchanged per micro-batch.
    """
    from spatial4n_spark.operators.raster import _tile_chunk

    from collections import Counter, defaultdict, deque

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                chunk = batch.slice(s, chunk_rows)
                chips = _tile_chunk(chunk, level, chip_px, False, min_psnr_db)
                # re-attach ts positionally: a replayed/duplicate stream
                # record shares its image_id, so a dict lookup would give
                # every copy the LAST row's ts (round-3 ADVICE fix).
                # Chips come out contiguous per input occurrence (size
                # groups preserve ascending input order within a group),
                # and duplicates of one id emit identical chip counts, so
                # each maximal run of an id covers run_len / chips-per-
                # occurrence occurrences, consumed from a per-id FIFO of
                # input-order timestamps.
                ids = chunk.column("image_id").to_pylist()
                out_ids = chips.column("image_id").to_pylist()
                queues = defaultdict(deque)
                for i, t in zip(ids, chunk.column("ts").to_pylist()):
                    queues[i].append(t)
                n_in, n_out = Counter(ids), Counter(out_ids)
                out_ts_vals = []
                j, n = 0, len(out_ids)
                while j < n:
                    iid = out_ids[j]
                    k = j
                    while k < n and out_ids[k] == iid:
                        k += 1
                    cpo = n_out[iid] // n_in[iid]  # chips per occurrence
                    for _ in range((k - j) // cpo):
                        out_ts_vals.extend([queues[iid].popleft()] * cpo)
                    j = k
                out_ts = pa.array(out_ts_vals, pa.timestamp("us"))
                cols = [chips.column(n) for n in chips.schema.names if n != "chip"]
                names = [n for n in chips.schema.names if n != "chip"]
                yield pa.RecordBatch.from_arrays(cols + [out_ts], names=names + ["ts"])

    return stream.mapInArrow(run, CHIPS_TS_SCHEMA)


def streaming_image_mosaics(
    stream: DataFrame,
    level: int = 4,
    chip_px: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-cell mosaic aggregation of an image stream.

    Returns (window, cell, n_chips, n_images, sum_px, sum_val) — all
    exact integer sums, so a finalized window is bit-equal to the batch
    mosaic over the same frames.
    """
    chips = streaming_image_chips(stream, level=level, chip_px=chip_px)
    return (
        chips.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("window"), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_chips"),
            F.sum(((F.col("chip_row") == 0) & (F.col("chip_col") == 0)).cast("long")).alias(
                "n_images"
            ),
            F.sum(F.col("chip_w") * F.col("chip_h")).alias("sum_px"),
            F.sum("chip_sum").alias("sum_val"),
        )
    )
