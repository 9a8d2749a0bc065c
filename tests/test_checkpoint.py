"""Snapshot checkpoint/resume semantics: commit atomicity, resume skips
recompute, fingerprint invalidation, lineage/metrics capture."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from spatial4n_spark.checkpoint import SnapshotStore, fingerprint


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "ckpt"))


def test_resume_skips_recompute(spark, store):
    calls = []

    def compute():
        calls.append(1)
        return spark.range(100).withColumn("v", F.col("id") * 2)

    fp = fingerprint("stage_a", 100)
    out1 = store.resume_or_compute(spark, "stage_a", fp, compute, verbose=False)
    assert out1.count() == 100
    out2 = store.resume_or_compute(spark, "stage_a", fp, compute, verbose=False)
    assert out2.count() == 100
    assert len(calls) == 1  # second call resumed from the snapshot
    assert sorted(r["v"] for r in out2.collect()) == sorted(r["v"] for r in out1.collect())


def test_fingerprint_invalidation(spark, store):
    calls = []

    def compute_n(n):
        def _c():
            calls.append(n)
            return spark.range(n)
        return _c

    store.resume_or_compute(spark, "s", fingerprint("s", 10), compute_n(10), verbose=False)
    store.resume_or_compute(spark, "s", fingerprint("s", 20), compute_n(20), verbose=False)
    assert calls == [10, 20]  # different params -> different snapshot
    # both snapshots coexist; original still resumable
    out = store.resume_or_compute(spark, "s", fingerprint("s", 10), compute_n(10), verbose=False)
    assert out.count() == 10
    assert calls == [10, 20]


def test_torn_write_recomputes(spark, store):
    fp = fingerprint("t", 1)
    store.write(spark.range(50), "t", fp)
    # simulate a crash between data write and manifest commit
    os.remove(store.manifest_path("t", fp))
    assert not store.is_committed("t", fp)
    calls = []

    def compute():
        calls.append(1)
        return spark.range(50)

    out = store.resume_or_compute(spark, "t", fp, compute, verbose=False)
    assert calls == [1] and out.count() == 50
    assert store.is_committed("t", fp)


def test_lineage_metrics(spark, store):
    df = spark.range(0, 1000, 1, 7)
    fp = fingerprint("lin", 1000)
    store.write(df, "lin", fp)
    m = store.metrics(spark).toPandas()
    mine = m[(m["stage"] == "lin") & (m["snapshot"] == fp)]
    assert mine["n_rows"].sum() == 1000
    assert len(mine) == 7  # one lineage row per physical partition
    man = store.manifest("lin", fp)
    assert man["n_rows"] == 1000 and man["n_partitions"] == 7


def test_manifest_fingerprint_mismatch_not_committed(spark, store):
    fp = fingerprint("m", 1)
    store.write(spark.range(5), "m", fp)
    p = store.manifest_path("m", fp)
    man = json.load(open(p))
    man["fingerprint"] = "bogus"
    json.dump(man, open(p, "w"))
    assert not store.is_committed("m", fp)
