"""Streaming exact dedup (streaming/dedup_stream.py): the streamed
result must equal the batch computation over the same frames."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from spatial4n_spark.streaming.dedup_stream import (
    streaming_distinct_docs,
    streaming_dup_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory, spark):
    """Documents plus a replayed slice (same texts, new doc_ids) so exact
    duplicates provably exist; ts derives from the TEXT hash (the same
    derive-in-both-engines pattern the tile streams use), so a
    duplicate's copies land in the same event-time window."""
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-000.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dup = docs.orderBy("doc_id").limit(30).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    dup.coalesce(1).write.mode("append").parquet(str(d))
    return str(d)


def _with_ts(df):
    return df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.hash(F.col("text")), F.lit(7200))
        ),
    )


def _run(df, tmp_base):
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_base}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return name


def test_streaming_distinct_docs_equals_batch(spark, docs_dir, tmp_path):
    batch = _with_ts(spark.read.parquet(docs_dir))
    stream = _with_ts(
        spark.readStream.schema(spark.read.parquet(docs_dir).schema).parquet(docs_dir)
    )
    out = streaming_distinct_docs(stream)
    name = _run(out, str(tmp_path))
    got = spark.sql(f"SELECT text_md5 FROM {name}").collect()
    got_hashes = sorted(r[0] for r in got)
    want_hashes = sorted(
        r[0]
        for r in batch.withColumn("text_md5", F.md5("text"))
        .select("text_md5")
        .distinct()
        .collect()
    )
    assert got_hashes == want_hashes  # one row per distinct content
    # the emitted doc for each hash is A real holder of that content
    pairs = {
        (r["text_md5"], r["doc_id"])
        for r in spark.sql(f"SELECT text_md5, doc_id FROM {name}").collect()
    }
    valid = {
        (r["text_md5"], r["doc_id"])
        for r in batch.withColumn("text_md5", F.md5("text"))
        .select("text_md5", "doc_id")
        .collect()
    }
    assert pairs <= valid


def test_streaming_dup_counts_equals_batch(spark, docs_dir, tmp_path):
    batch = _with_ts(spark.read.parquet(docs_dir))
    stream = _with_ts(
        spark.readStream.schema(spark.read.parquet(docs_dir).schema).parquet(docs_dir)
    )
    out = streaming_dup_counts(stream)
    # append mode only emits watermark-finalized windows (none close in a
    # single availableNow pass) — complete mode gives the exact comparison
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        map(
            tuple,
            spark.sql(
                f"SELECT window_start, text_md5, n, min_doc_id FROM {name}"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            batch.withColumn("text_md5", F.md5("text"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "text_md5")
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_doc_id"))
            .select(F.col("w.start").alias("window_start"), "text_md5", "n", "min_doc_id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0
    # the dedup signal is real: some group in some window has n > 1
    assert any(r[2] > 1 for r in got)
