"""jobs/streaming_pip.py — the spark-submit streaming consumer job
(native clustered-appends source + foreachBatch PIP join), driven
in-process like its batch twin's test.

The consumer position lives in Spark's OWN streaming checkpoint (the
source's snapshot-id offsets), so runs resume where the last stopped;
a crash between the result write and the offset commit (simulated by
deleting the checkpoint's commit marker) re-delivers the batch into
the idempotent batch-id-keyed sink — exactly-once end to end.
"""

import importlib
import json
import os
import sys


def test_streaming_pip_job_resumes_and_is_exactly_once(
    spark, tmp_path, monkeypatch, capsys
):
    sys.path.insert(0, ".")
    job = importlib.import_module("jobs.streaming_pip")
    work = str(tmp_path / "w")

    def run(*extra):
        monkeypatch.setattr(
            sys, "argv", ["streaming_pip.py", "--work", work, "--rows", "20000"]
            + list(extra),
        )
        assert job.main() == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    # seed run: one micro-batch covering the initial write
    r1 = run()
    assert r1["source_snapshot"] == 1
    assert r1["batches_processed"] == [0]

    # append run: the restart resumes from the checkpointed offset and
    # processes ONLY the appended commit
    r2 = run("--append", "10000")
    assert r2["source_snapshot"] == 2
    assert r2["batches_processed"] == [1]
    assert r2["total_result_rows"] == r1["total_result_rows"] + r2["new_result_rows"]

    # caught up: a third run processes nothing and changes nothing
    r3 = run()
    assert r3["batches_processed"] == []
    assert r3["total_result_rows"] == r2["total_result_rows"]

    # crash window: offsets/1 committed but commits/1 lost — Spark
    # re-runs batch 1 on restart; the batch-id-keyed sink overwrites
    # its own output, so totals converge instead of doubling
    os.remove(os.path.join(work, "ckpt", "commits", "1"))
    crc = os.path.join(work, "ckpt", "commits", ".1.crc")
    if os.path.exists(crc):  # hadoop local-fs checksum shadow
        os.remove(crc)
    r4 = run()
    assert r4["batches_processed"] == [1]
    assert r4["total_result_rows"] == r2["total_result_rows"]

    # the derived table equals the batch join over the full source
    from spatial4n_spark.io.clustered import CELL_COL, _read_listed
    from spatial4n_spark.operators.spatial_join import (
        spatial_join_points_polygons,
    )
    from spatial4n_spark.suite import layer

    full = spatial_join_points_polygons(
        _read_listed(spark, os.path.join(work, "source")).drop(CELL_COL),
        layer(), level=3, index="s2",
    ).select("pid", "poly_id")
    got = spark.read.parquet(os.path.join(work, "result", "batch_*")).select(
        "pid", "poly_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))
