"""Hilbert-range-clustered storage (io/clustered.py): manifest file
pruning + pushed row-group ranges must change what is READ, never what
is RETURNED."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.io import clustered as C
from spatial4n_spark.kernels.polygon import Circle, Rect
from spatial4n_spark.kernels.s2cell import s2_encode, s2_parent
from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons
from spatial4n_spark.suite import RADIUS_CENTERS, layer, pts_orders


@pytest.fixture(scope="module")
def clustered(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clustered"))
    pts = pts_orders(spark, sf_dir)
    C.write_clustered(pts, path, level=14, files=16)
    return path, pts


def test_manifest_bounds_match_files(spark, clustered):
    path, _ = clustered
    man = C.load_manifest(path)
    assert man["level"] == 14 and man["cell_col"] == C.CELL_COL
    assert len(man["files"]) > 1  # multiple files or there is nothing to prune
    for e in man["files"]:
        got = (
            spark.read.parquet(os.path.join(path, e["file"]))
            .agg(
                F.min(C.CELL_COL).alias("lo"),
                F.max(C.CELL_COL).alias("hi"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        assert (got["lo"], got["hi"], got["n"]) == (e["min"], e["max"], e["rows"])
    # range clustering: file id ranges are disjoint (repartitionByRange)
    spans = sorted((e["min"], e["max"]) for e in man["files"])
    assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))


def test_clustered_radius_bit_equals_brute_and_prunes(spark, clustered):
    path, pts = clustered
    pruned_somewhere = False
    for qid, qlon, qlat, r in RADIUS_CENTERS:
        out, st = C.clustered_radius_query(spark, path, qlon, qlat, r, with_stats=True)
        got = sorted(row[0] for row in out.select("o_orderkey").collect())
        want = sorted(
            row[0]
            for row in pts.where(
                haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
                <= F.lit(r)
            )
            .select("o_orderkey")
            .collect()
        )
        assert got == want, qid
        assert st.files_kept <= st.files_total
        pruned_somewhere = pruned_somewhere or st.files_kept < st.files_total
        assert C.CELL_COL not in out.columns
    assert pruned_somewhere  # at least the city-scale circles must prune


def test_pip_join_over_pruned_candidates_bit_equal(spark, clustered):
    path, pts = clustered
    shapes = [s for _, s in layer()]
    cand, st = C.clustered_candidates(spark, path, shapes, with_stats=True)
    full = sorted(
        map(
            tuple,
            spatial_join_points_polygons(pts, layer(), level=3, index="s2")
            .select("o_orderkey", "poly_id")
            .collect(),
        )
    )
    via = sorted(
        map(
            tuple,
            spatial_join_points_polygons(cand, layer(), level=3, index="s2")
            .select("o_orderkey", "poly_id")
            .collect(),
        )
    )
    assert via == full and len(full) > 0
    assert st.files_kept <= st.files_total and st.rows_kept_files <= st.rows_total


def test_cover_ranges_sound_and_exact_without_coalescing():
    """Soundness: every point of the shape has its fine cell inside the
    ranges. Exactness (max_ranges=inf): fine-cell membership in ranges
    == ancestor membership in the cover cell set."""
    L = 14
    circle = Circle(2.3125, 48.875, 2.0, geo=True)
    ranges = C.cover_ranges(circle, L, max_ranges=10**9)
    lv = C._auto_cover_level(circle, L)
    from spatial4n_spark.cellindex import cell_backend

    fulls, bounds = cell_backend("s2").cover(circle, lv, geo=True)
    cells = {int(c) for c in list(fulls) + list(bounds)}

    rng = np.random.default_rng(7)
    lat = rng.uniform(48.875 - 2.5, 48.875 + 2.5, 4000)
    lon = rng.uniform(2.3125 - 3.5, 2.3125 + 3.5, 4000)
    fine = s2_encode(lat, lon, L)
    anc = s2_parent(fine, L - lv)
    lo = np.array([a for a, _ in ranges])
    hi = np.array([b for _, b in ranges])
    in_ranges = ((fine[:, None] >= lo[None, :]) & (fine[:, None] <= hi[None, :])).any(1)
    in_cover = np.isin(anc, np.fromiter(cells, dtype=np.int64))
    assert (in_ranges == in_cover).all()
    # soundness on points INSIDE the circle specifically
    inside = (lon - 2.3125) ** 2 + (lat - 48.875) ** 2 <= 2.0**2
    assert in_ranges[inside].all()


def test_cover_ranges_coalescing_only_widens():
    L = 14
    rect = Rect(-30.0, 40.0, -20.0, 35.0)
    exact = C.cover_ranges(rect, L, max_ranges=10**9)
    capped = C.cover_ranges(rect, L, max_ranges=4)
    assert len(capped) <= 4 <= len(exact)
    # every exact range is contained in some capped range
    for lo, hi in exact:
        assert any(clo <= lo and hi <= chi for clo, chi in capped)


def test_range_filter_pushed_to_parquet(spark, clustered):
    path, _ = clustered
    out = C.clustered_radius_query(spark, path, 2.3125, 48.875, 150.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the range disjunction on the cluster column reaches the scan
    assert C.CELL_COL in plan.split("PushedFilters")[1][:2000]


def test_append_keeps_exactness_compaction_restores_locality(
    spark, sf_dir, tmp_path
):
    """Appends must keep every query bit-correct immediately (per-file
    stats stay true); what they cost is locality (more files kept per
    query), which compaction restores."""
    path = str(tmp_path / "clu")
    pts = pts_orders(spark, sf_dir)
    base = pts.where(F.col("o_orderkey") % 4 == 0)
    C.write_clustered(base, path, level=14, files=8)

    # three out-of-order appended batches (worst case for locality:
    # each batch spans the whole world)
    for m in (1, 2, 3):
        C.append_clustered(pts.where(F.col("o_orderkey") % 4 == m), path, files=2)

    qlon, qlat, r = 2.3125, 48.875, 150.0
    want = sorted(
        row[0]
        for row in pts.where(
            haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
            <= F.lit(r)
        )
        .select("o_orderkey")
        .collect()
    )
    out_a, st_a = C.clustered_radius_query(spark, path, qlon, qlat, r, with_stats=True)
    got_a = sorted(row[0] for row in out_a.select("o_orderkey").collect())
    assert got_a == want  # correct right after appends
    man_a = C.load_manifest(path)
    assert sum(e["rows"] for e in man_a["files"]) == pts.count()

    C.compact_clustered(spark, path, files=8)
    out_c, st_c = C.clustered_radius_query(spark, path, qlon, qlat, r, with_stats=True)
    got_c = sorted(row[0] for row in out_c.select("o_orderkey").collect())
    assert got_c == want  # compaction changes layout, never results
    man_c = C.load_manifest(path)
    assert sum(e["rows"] for e in man_c["files"]) == pts.count()
    # locality restored: the compacted run keeps no more files than the
    # appended layout did, and its file ranges are disjoint again
    assert st_c.files_kept <= st_a.files_kept
    spans = sorted((e["min"], e["max"]) for e in man_c["files"])
    assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))
    # the appended layout genuinely overlapped (the thing compaction fixes)
    spans_a = sorted((e["min"], e["max"]) for e in man_a["files"])
    assert any(spans_a[i][1] >= spans_a[i + 1][0] for i in range(len(spans_a) - 1))


def test_stream_ingest_into_clustered_equals_batch(spark, sf_dir, tmp_path):
    """foreachBatch ingest (streaming/clustered_sink.py): after the
    availableNow run over multiple micro-batches, the clustered table
    holds exactly the input rows and answers radius queries identically
    to a batch filter; a second run of the same stream (fresh streaming
    checkpoint, same table) is deduped by the batch ledger."""
    from spatial4n_spark.streaming.clustered_sink import stream_to_clustered

    pts = pts_orders(spark, sf_dir)
    src = str(tmp_path / "src")
    # several input files -> several micro-batches via maxFilesPerTrigger
    pts.repartition(3).write.parquet(src)

    table = str(tmp_path / "table")
    C.write_clustered(pts.limit(0), table, level=14, files=1)

    stream = (
        spark.readStream.schema(pts.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_to_clustered(stream, table, str(tmp_path / "ckpt1"), files_per_batch=2)
    q.awaitTermination(300)

    man = C.load_manifest(table)
    assert sum(e["rows"] for e in man["files"]) == pts.count()
    qlon, qlat, r = 2.3125, 48.875, 150.0
    want = sorted(
        row[0]
        for row in pts.where(
            haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
            <= F.lit(r)
        )
        .select("o_orderkey")
        .collect()
    )
    got = sorted(
        row[0]
        for row in C.clustered_radius_query(spark, table, qlon, qlat, r)
        .select("o_orderkey")
        .collect()
    )
    assert got == want

    # REPLAY of the same stream (same checkpoint path whose progress was
    # lost — Spark re-delivers batches 0..n) must be deduped by the
    # (checkpoint, batch_id) ledger
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt1"))
    stream2 = (
        spark.readStream.schema(pts.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = stream_to_clustered(stream2, table, str(tmp_path / "ckpt1"), files_per_batch=2)
    q2.awaitTermination(300)
    man2 = C.load_manifest(table)
    assert sum(e["rows"] for e in man2["files"]) == pts.count()

    # a genuinely NEW stream (different checkpoint) into the same table
    # is new data and must append, not be swallowed by the ledger
    extra = str(tmp_path / "extra")
    # distinct keys, placed far from every query circle so the radius
    # assertions below stay valid
    pts.limit(50).select(
        (F.col("o_orderkey") + F.lit(10**9)).alias("o_orderkey"),
        F.lit(0.0).alias("lon"),
        F.lit(-89.0).alias("lat"),
    ).write.parquet(extra)
    stream3 = spark.readStream.schema(pts.schema).parquet(extra)
    q3 = stream_to_clustered(stream3, table, str(tmp_path / "ckpt3"), files_per_batch=1)
    q3.awaitTermination(300)
    man3 = C.load_manifest(table)
    assert sum(e["rows"] for e in man3["files"]) == pts.count() + 50

    # compaction of the ingested table keeps the same rows
    C.compact_clustered(spark, table, files=4)
    got_c = sorted(
        row[0]
        for row in C.clustered_radius_query(spark, table, qlon, qlat, r)
        .select("o_orderkey")
        .collect()
    )
    assert got_c == want


def test_clustered_knn_equals_ring_knn(spark, clustered):
    """clustered_knn (expanding cover-range probes over the layout) must
    return exactly what the ring-expansion kNN returns — incl. the pole
    and dateline queries, where the S2 cover pieces matter."""
    from spatial4n_spark.operators.knn import knn_join

    path, pts = clustered
    queries = [(qid, qlon, qlat) for qid, qlon, qlat, _ in RADIUS_CENTERS]
    want = sorted(
        map(
            tuple,
            knn_join(pts, queries, k=5, id_col="o_orderkey", level=3)
            .select("query_id", "o_orderkey", "rank")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            C.clustered_knn(spark, path, queries, k=5, id_col="o_orderkey")
            .select("query_id", "o_orderkey", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) == 4 * 5


def test_st_clustered_time_and_space_pruning(spark, sf_dir, tmp_path):
    """Spatio-temporal layout (io/st_clustered.py): day-partition +
    manifest pruning must compose — a 2-of-8-day Paris query keeps only
    matching days AND only spatially-relevant files, and returns exactly
    the brute-force rows."""
    from spatial4n_spark.io import st_clustered as ST

    pts = pts_orders(spark, sf_dir).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1704067200)  # 2024-01-01 00:00:00 UTC
            + (F.col("o_orderkey") % 8) * 86400
            + F.col("o_orderkey") % 977
        ).cast("timestamp_ntz"),
    )
    path = str(tmp_path / "st")
    ST.write_st_clustered(pts, path, level=14, files=32)
    man = ST.load_st_manifest(path)
    assert {e["day"] for e in man["files"]} == {
        f"2024-01-0{d}" for d in range(1, 9)
    }
    assert sum(e["rows"] for e in man["files"]) == pts.count()

    t0, t1 = "2024-01-02 00:00:00", "2024-01-03 23:59:59"
    qlon, qlat, r = 10.0, 88.0, 600.0  # the polar gate circle: dense enough at sf0.001
    out, st = ST.st_radius_query(spark, path, qlon, qlat, r, t0, t1, with_stats=True)
    got = sorted(row[0] for row in out.select("o_orderkey").collect())
    want = sorted(
        row[0]
        for row in pts.where(
            (F.col("ts") >= F.lit(t0))
            & (F.col("ts") <= F.lit(t1))
            & (
                haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
                <= F.lit(r)
            )
        )
        .select("o_orderkey")
        .collect()
    )
    assert got == want and len(want) > 0
    assert st.days_kept <= 2 < st.days_total  # time axis pruned
    # space axis pruned too: fewer files than the kept days contain
    day_files = [e for e in man["files"] if "2024-01-02" <= e["day"] <= "2024-01-03"]
    assert st.files_kept < len(day_files)
    # the cell-range disjunction reaches the parquet reader
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and C.CELL_COL in plan.split("PushedFilters")[1][:2000]

    # an out-of-range window prunes everything and returns empty
    empty, st0 = ST.st_radius_query(
        spark, path, qlon, qlat, r, "2030-01-01 00:00:00", "2030-01-02 00:00:00",
        with_stats=True,
    )
    assert st0.files_kept == 0 and empty.count() == 0


def test_stream_ingest_into_st_clustered(spark, sf_dir, tmp_path):
    """foreachBatch ingest into the spatio-temporal layout: after the
    availableNow run the table answers (window, circle) queries exactly;
    a replay of the same checkpoint is ledger-deduped."""
    from spatial4n_spark.io import st_clustered as ST
    from spatial4n_spark.streaming.clustered_sink import stream_to_st_clustered

    pts = pts_orders(spark, sf_dir).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1704067200)
            + (F.col("o_orderkey") % 2) * 86400
            + F.col("o_orderkey") % 977
        ).cast("timestamp_ntz"),
    )
    src = str(tmp_path / "src")
    pts.repartition(3).write.parquet(src)
    table = str(tmp_path / "table")
    ST.write_st_clustered(pts.limit(0), table, level=14, files=1)

    stream = (
        spark.readStream.schema(pts.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_to_st_clustered(stream, table, str(tmp_path / "ck"), files_per_batch=2)
    q.awaitTermination(300)
    man = ST.load_st_manifest(table)
    assert sum(e["rows"] for e in man["files"]) == pts.count()
    assert {e["day"] for e in man["files"]} == {"2024-01-01", "2024-01-02"}

    t0, t1 = "2024-01-02 00:00:00", "2024-01-02 23:59:59"
    qlon, qlat, r = 10.0, 88.0, 600.0
    got = sorted(
        row[0]
        for row in ST.st_radius_query(spark, table, qlon, qlat, r, t0, t1)
        .select("o_orderkey")
        .collect()
    )
    want = sorted(
        row[0]
        for row in pts.where(
            (F.col("ts") >= F.lit(t0))
            & (F.col("ts") <= F.lit(t1))
            & (
                haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
                <= F.lit(r)
            )
        )
        .select("o_orderkey")
        .collect()
    )
    assert got == want and len(want) > 0

    # replay with progress lost: same checkpoint path, ledger dedups
    import shutil

    shutil.rmtree(str(tmp_path / "ck"))
    stream2 = (
        spark.readStream.schema(pts.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = stream_to_st_clustered(stream2, table, str(tmp_path / "ck"), files_per_batch=2)
    q2.awaitTermination(300)
    man2 = ST.load_st_manifest(table)
    assert sum(e["rows"] for e in man2["files"]) == pts.count()


def test_st_append_and_per_day_compaction(spark, sf_dir, tmp_path):
    """ST lifecycle: appends keep every (window, circle) query exactly
    correct; compacting ONE day restores that day's locality and leaves
    the other days' files untouched."""
    from spatial4n_spark.io import st_clustered as ST

    pts = pts_orders(spark, sf_dir).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1704067200)
            + (F.col("o_orderkey") % 2) * 86400
            + F.col("o_orderkey") % 977
        ).cast("timestamp_ntz"),
    )
    path = str(tmp_path / "st")
    base = pts.where(F.col("o_orderkey") % 3 == 0)
    ST.write_st_clustered(base, path, level=14, files=8)
    for m in (1, 2):
        ST.append_st_clustered(pts.where(F.col("o_orderkey") % 3 == m), path, files=2)

    t0, t1 = "2024-01-02 00:00:00", "2024-01-02 23:59:59"
    qlon, qlat, r = 10.0, 88.0, 600.0

    def rows():
        out = ST.st_radius_query(spark, path, qlon, qlat, r, t0, t1)
        return sorted(row[0] for row in out.select("o_orderkey").collect())

    want = sorted(
        row[0]
        for row in pts.where(
            (F.col("ts") >= F.lit(t0))
            & (F.col("ts") <= F.lit(t1))
            & (
                haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
                <= F.lit(r)
            )
        )
        .select("o_orderkey")
        .collect()
    )
    assert rows() == want and len(want) > 0  # correct right after appends
    man_a = ST.load_st_manifest(path)
    day2_before = [e for e in man_a["files"] if e["day"] == "2024-01-02"]
    day1_before = [e for e in man_a["files"] if e["day"] == "2024-01-01"]
    assert sum(e["rows"] for e in man_a["files"]) == pts.count()

    ST.compact_st_clustered(spark, path, "2024-01-02", files=4)
    assert rows() == want  # compaction never changes results
    man_c = ST.load_st_manifest(path)
    day2_after = [e for e in man_c["files"] if e["day"] == "2024-01-02"]
    day1_after = [e for e in man_c["files"] if e["day"] == "2024-01-01"]
    assert sum(e["rows"] for e in man_c["files"]) == pts.count()
    assert len(day2_after) < len(day2_before)  # fragmentation removed
    # the compacted day is one disjoint sorted run again
    spans = sorted((e["min"], e["max"]) for e in day2_after)
    assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))
    # the untouched day's files are exactly as before
    assert sorted(e["file"] for e in day1_after) == sorted(
        e["file"] for e in day1_before
    )


def test_no_matching_files_returns_empty_with_schema(spark, clustered):
    path, pts = clustered
    df, st = C.read_pruned(spark, path, [(2**62, 2**62 + 1)])
    assert df.count() == 0 and st.files_kept == 0
    assert set(df.columns) == set(pts.columns) | {C.CELL_COL}
    df2, st2 = C.read_pruned(spark, path, [])
    assert df2.count() == 0 and st2.n_ranges == 0


def test_manifest_carries_schema_no_footer_read(spark, sf_dir, tmp_path):
    """The table schema rides in the manifest (Iceberg metadata
    analog): an empty-result read answers with the right columns from
    METADATA ALONE — proven by deleting every data file and still
    getting the schema — and a legacy (pre-schema) manifest falls back
    to the directory read."""
    import json as _json

    path = str(tmp_path / "schema_tbl")
    pts = pts_orders(spark, sf_dir).limit(100)
    C.write_clustered(pts, path, level=14, files=2)
    want = set(pts.columns) | {C.CELL_COL}
    assert C.load_manifest(path).get("schema")  # committed with the write

    # legacy manifests (no schema key) still answer via the fallback
    man_file = os.path.join(path, C.MANIFEST)
    with open(man_file) as f:
        man = _json.load(f)
    orig_schema = man.pop("schema")
    C._atomic_json_write(man_file, man)
    df, _ = C.read_pruned(spark, path, [])
    assert df.count() == 0 and set(df.columns) == want
    man["schema"] = orig_schema
    C._atomic_json_write(man_file, man)

    # metadata-only: no data file on disk, schema still correct
    for e in C.load_manifest(path)["files"]:
        os.remove(os.path.join(path, e["file"]))
    df, st = C.read_pruned(spark, path, [])
    assert df.count() == 0 and st.n_ranges == 0
    assert set(df.columns) == want


def test_writer_lock_and_overwrite_only(spark, sf_dir, tmp_path):
    """ADVICE round 3: manifest read-modify-write is single-writer
    (enforced by a lockfile, not just documented), the manifest commit
    is atomic (no .tmp residue), and the directory-listing manifest
    rebuild is overwrite-only on BOTH layouts."""
    path = str(tmp_path / "locked")
    pts = pts_orders(spark, sf_dir).limit(200)
    C.write_clustered(pts, path, level=14, files=2)

    # append under a held lock fails fast instead of racing; the lock
    # is a SIBLING of the table dir (overwrite wipes the dir, so an
    # in-dir lockfile would be deleted out from under its own holder)
    lock = C.lock_path(path)
    assert not lock.startswith(path + os.sep)
    with open(lock, "w") as f:
        f.write("other-writer")
    with pytest.raises(RuntimeError, match="locked by another writer"):
        C.append_clustered(pts.limit(10), path, files=1)
    os.remove(lock)

    # a successful append releases the lock and leaves no temp manifest
    C.append_clustered(pts.limit(10), path, files=1)
    assert not os.path.exists(lock)
    assert not any(n.endswith(".tmp") for n in os.listdir(path))
    assert sum(e["rows"] for e in C.load_manifest(path)["files"]) == 210

    # rebuild-from-listing is overwrite-only (would resurrect orphans)
    with pytest.raises(ValueError, match="overwrite-only"):
        C.write_clustered(pts, path, mode="append")


def test_st_requires_wallclock_ts(spark, sf_dir, tmp_path):
    """Day partitions derive/prune on wall-clock strings; a tz-aware
    TIMESTAMP ts would make the day boundary depend on the session
    timezone (writer vs reader skew drops boundary-day rows), so the
    writer rejects it up front."""
    from spatial4n_spark.io import st_clustered as ST

    pts = pts_orders(spark, sf_dir).limit(50).withColumn(
        "ts", F.timestamp_seconds(F.lit(1704067200))  # tz-aware TIMESTAMP
    )
    with pytest.raises(ValueError, match="timezone-independent"):
        ST.write_st_clustered(pts, str(tmp_path / "st_bad"), level=14, files=1)


def test_compaction_advice_lifecycle(spark, sf_dir, tmp_path):
    """Manifest-only advisor: quiet on a fresh table, flags range
    overlap after appends and delete tax after MOR deletes, and goes
    quiet again after the compaction it recommended."""
    from pyspark.sql import functions as F

    from spatial4n_spark.io import clustered as C
    from spatial4n_spark.suite import pts_orders

    path = str(tmp_path / "adv")
    pts = pts_orders(spark, sf_dir)
    C.write_clustered(pts, path, level=14, files=4)
    a = C.compaction_advice(path)
    assert a["should_compact"] is False
    assert a["overlap_factor"] < 2.0

    # each append layers a full-width sorted run: overlap grows ~1/append
    for _ in range(3):
        C.append_clustered(pts, path, files=2)
    a = C.compaction_advice(path)
    assert a["should_compact"] is True
    assert a["overlap_factor"] >= 2.0
    assert any("overlap" in r for r in a["reasons"])

    C.compact_clustered(spark, path, files=a["recommended_files"])
    a = C.compaction_advice(path)
    assert a["should_compact"] is False

    # MOR deletes: the delete tax crosses the threshold without any
    # range overlap
    C.delete_clustered(
        spark, path, F.col("o_orderkey") % 3 == 0, strategy="mor"
    )
    a = C.compaction_advice(path)
    assert a["delete_tax"] > 0.05
    assert a["should_compact"] is True
    assert any("MOR" in r for r in a["reasons"])
    C.compact_clustered(spark, path, files=4)
    a = C.compaction_advice(path)
    assert a["should_compact"] is False
    assert a["pending_delete_rows"] == 0
