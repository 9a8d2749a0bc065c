"""Streaming exact deduplication of a document stream.

The training-data ingest loop's first filter: drop records whose content
hash was already seen. Two surfaces:

- ``streaming_distinct_docs`` — the emit-once stream: watermarked
  ``dropDuplicates`` on the content hash, so each distinct text passes
  exactly once and the dedup state is bounded by the watermark horizon
  (Spark evicts hash keys older than it; at the 10^12-row design scale
  unbounded exact-dedup state is the thing that kills the job, so the
  horizon IS the contract: a re-occurrence farther apart than the
  watermark is treated as new content — the same trade every
  log-structured dedup at this scale makes).
- ``streaming_dup_counts`` — the monitoring aggregate: watermarked
  per-window counts per content hash (n > 1 = duplicates inside the
  window), the streaming twin of text.exact_dedup's duplicate groups.

Both reuse the batch operator's hash (md5 of the text column) so
stream==batch equality is testable row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_distinct_docs(
    stream: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit each distinct content hash's FIRST record; state bounded by
    the watermark horizon.

    ``dropDuplicatesWithinWatermark`` is the operator whose state store
    actually EVICTS keys older than the watermark when the event-time
    column is not part of the key set (plain ``dropDuplicates`` on a
    non-time key keeps every key forever — unbounded state at ingest
    scale); its semantics are exactly the documented contract: a
    re-occurrence farther apart than the horizon counts as new content.
    """
    return (
        stream.withColumn("text_md5", F.md5(F.col(text)))
        .withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
        .select(key, "text_md5", ts)
    )


def streaming_dup_counts(
    stream: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window duplicate groups: (window, text_md5, n,
    min_<key>) — the streaming twin of text.exact_dedup."""
    return (
        stream.withColumn("text_md5", F.md5(F.col(text)))
        .withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"), F.col("text_md5"))
        .agg(F.count(F.lit(1)).alias("n"), F.min(key).alias(f"min_{key}"))
        .select(
            F.col("w.start").alias("window_start"),
            "text_md5",
            "n",
            f"min_{key}",
        )
    )
