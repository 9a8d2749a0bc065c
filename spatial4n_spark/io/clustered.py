"""Hilbert-range-clustered table layout — file-level spatial pruning
via an Iceberg-style stats manifest.

The third storage layout, completing the scan-pruning ladder:

- ``io.tables.write_tiled``  — directory partitions (PartitionFilters).
  Coarse: at 10^12 rows a useful cell level explodes into millions of
  tiny partition directories (the small-files problem).
- ``io.tables.write_bucketed`` — hash buckets (shuffle-free joins).
  Removes the join Exchange but prunes nothing: a hash bucket mixes
  the whole world.
- ``write_clustered`` (this module) — rows SORTED by their fine S2
  Hilbert cell id before the write, plus a per-file min/max stats
  manifest read at planning time.  The Hilbert curve is the point: it
  maps 2-D locality to 1-D id locality, so any spatial cover becomes a
  handful of CONTIGUOUS int64 id ranges (prefix property: a level-lv
  cell's level-L descendants are exactly ``[id << 2(L-lv),
  (id+1) << 2(L-lv))``).  Pruning then happens twice, from one sort:

  1. **file level** — the manifest (the Iceberg manifest-file analog:
     per-data-file column bounds) is intersected with the query ranges
     on the driver; files whose [min,max] misses every range are never
     listed in the scan.  This is what Iceberg calls scan planning with
     column stats, reproduced on plain parquet.
  2. **row-group level** — the residual ``cell BETWEEN lo AND hi``
     disjunction is pushed to the parquet reader (PushedFilters), so
     kept files still skip row groups outside the ranges — for free,
     because the sort made row-group min/max tight.

Range widening (``max_ranges`` coalescing) only ever ADDS candidate
ids; every consumer applies the exact geometric predicate afterwards,
so pruning can be arbitrarily coarse without affecting results.

Reference parity note: the reference has no storage layer — this is
engine-side design the north rule asks for (Iceberg tables, partition/
shuffle/skew handled explicitly); the geometry refined against is the
same Spatial4n kernel semantics as every other path
(SpatialRelation.cs, ShapeCollection.cs).
"""

from __future__ import annotations

import contextlib
import json
import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.cellindex import cell_backend
from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.kernels.distance import km_to_deg
from spatial4n_spark.kernels.polygon import Circle

CELL_COL = "cell_r"
MANIFEST = "_cluster_manifest.json"
LOCKFILE = "_cluster.lock"


@contextlib.contextmanager
def table_lock(path: str, lockfile: str = LOCKFILE):
    """Single-writer mutual exclusion for manifest read-modify-write.

    Appends and compactions update the manifest as read + extend +
    commit; two concurrent writers would race that sequence, one
    append's entries would vanish from the manifest, and the next
    compaction's sweep would then delete the unlisted (but real) data
    files. This lock makes the single-writer invariant ENFORCED, not
    just documented: O_CREAT|O_EXCL is atomic on POSIX local/NFS
    filesystems, so exactly one writer holds the table at a time and a
    concurrent writer fails fast with a clear error instead of
    corrupting the manifest. (The Iceberg analog is the catalog's
    atomic snapshot CAS; on object stores you'd swap this for a
    conditional-PUT or a DynamoDB/catalog lock — the invariant is the
    same.) A crash while holding the lock leaves the lockfile behind;
    the error message names it so an operator can verify no writer is
    alive and remove it.
    """
    lock = os.path.join(path, lockfile)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"clustered table at {path} is locked by another writer "
            f"({lock} exists); tables are single-writer — serialize "
            "appends/compactions, or remove the stale lockfile if its "
            "writer crashed"
        ) from None
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock)


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------


def write_clustered(
    df: DataFrame,
    path: str,
    level: int = 14,
    lon: str = "lon",
    lat: str = "lat",
    files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered by its level-``level`` S2 cell id.

    ``repartitionByRange`` gives each output file a disjoint id range
    (range partitioner on the sort key), ``sortWithinPartitions`` makes
    every parquet row group's min/max tight inside the file, and the
    manifest records the per-file bounds for driver-side pruning.
    ``files`` plays the role executor count * target file size plays at
    design scale; the layout is identical either way.

    Overwrite-only: the initial-write manifest is rebuilt from a full
    directory listing, which under append would resurrect
    crash-orphaned files (rows a retried append already re-delivered)
    into the manifest — ``append_clustered`` is the append path,
    extending the PRIOR manifest by exactly the new files.
    """
    if mode != "overwrite":
        raise ValueError("write_clustered is overwrite-only; use append_clustered")
    be = cell_backend("s2")  # int64 Hilbert ids with the prefix property
    out = df.withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
    (
        out.repartitionByRange(files, F.col(CELL_COL))
        .sortWithinPartitions(CELL_COL)
        .write.mode(mode)
        .parquet(path)
    )
    _write_manifest(path, level)


def _data_files(path: str) -> list[str]:
    return sorted(n for n in os.listdir(path) if n.endswith(".parquet"))


def _file_stats(path: str, names: list[str]) -> list[dict]:
    """Per-file [min,max] of the cell column from the parquet footers —
    the Iceberg manifest-entry analog."""
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(names):
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[CELL_COL]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:  # empty file part
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            continue  # file with no rows carries no bounds and never matches
        entries.append(
            {"file": name, "min": int(lo), "max": int(hi), "rows": md.num_rows}
        )
    return entries


def _write_manifest(path: str, level: int, entries: list[dict] | None = None) -> None:
    """Commit the manifest. The manifest is the table's source of truth:
    readers (and compaction) touch ONLY files it lists, so a data file
    not yet (or no longer) in the manifest is an invisible orphan, never
    a correctness hazard."""
    if entries is None:
        entries = _file_stats(path, _data_files(path))
    man = {"cell_col": CELL_COL, "index": "s2", "level": level, "files": entries}
    _atomic_json_write(os.path.join(path, MANIFEST), man)


def _atomic_json_write(target: str, obj: dict) -> None:
    """Genuinely atomic commit: write a temp file in the SAME directory
    (so the rename can't cross filesystems), fsync, then os.replace()
    over the target. A crash at any point leaves either the old
    manifest or the new one — never a truncated half-write, which a
    plain open('w') + dump would produce and which corrupts the table's
    source of truth for every reader and for compaction's sweep."""
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, target)


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def append_clustered(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    files: int = 4,
) -> None:
    """Append a batch (e.g. one streaming micro-batch) to a clustered
    table WITHOUT rewriting it — the Iceberg append analog.

    The new rows are sorted among themselves and land in fresh files;
    the manifest gains the new files' TRUE bounds, so queries stay
    exactly correct immediately. What degrades is locality: each
    appended file spans its batch's own id range, so over many appends
    a query range intersects more files (files_kept creeps up).
    ``compact_clustered`` restores the one-sorted-run layout; this
    split — cheap true-stats appends, a periodic rewrite for locality —
    is exactly how log-structured table formats behave at design scale.

    Crash ordering: data files land first, the manifest commit is the
    LAST step — a crash in between leaves unreferenced orphan files
    (swept by the next compaction), never a wrong manifest. The whole
    read-extend-commit sequence holds ``table_lock`` so a concurrent
    appender/compactor errors instead of racing the manifest.
    """
    with table_lock(path):
        man = load_manifest(path)
        level = int(man["level"])
        pre = set(_data_files(path))
        be = cell_backend("s2")
        out = df.withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
        (
            out.repartitionByRange(files, F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.mode("append")
            .parquet(path)
        )
        new = [n for n in _data_files(path) if n not in pre]
        _write_manifest(path, level, man["files"] + _file_stats(path, new))


def compact_clustered(
    spark: SparkSession,
    path: str,
    files: int = 16,
) -> None:
    """Rewrite the table as one globally range-clustered run (the
    Iceberg rewrite-data-files / sort-compaction analog), in place and
    crash-safe at every step:

    1. read ONLY the manifest-listed files, re-sort by the existing
       cell column (no re-encode), write the run as NEW files into the
       same directory (a crash here leaves orphans, not damage —
       readers never see unlisted files);
    2. commit the manifest pointing at the new files only (the atomic
       cut-over: one file write);
    3. sweep every data file the committed manifest does not list —
       the superseded run plus any orphans earlier crashes left.

    A query at any crash point returns exactly the same rows; the only
    recoverable waste is orphaned disk, reclaimed by the next
    compaction's sweep. Holds ``table_lock`` end to end (same
    single-writer invariant as append)."""
    with table_lock(path):
        man = load_manifest(path)
        level = int(man["level"])
        listed = [e["file"] for e in man["files"]]
        if listed:
            cur = spark.read.parquet(*[os.path.join(path, n) for n in listed])
            pre = set(_data_files(path))
            (
                cur.repartitionByRange(files, F.col(CELL_COL))
                .sortWithinPartitions(CELL_COL)
                .write.mode("append")
                .parquet(path)
            )
            new = [n for n in _data_files(path) if n not in pre]
            _write_manifest(path, level, _file_stats(path, new))
        keep = {e["file"] for e in load_manifest(path)["files"]}
        for n in _data_files(path):
            if n not in keep:
                os.remove(os.path.join(path, n))


# ---------------------------------------------------------------------------
# cover -> id ranges
# ---------------------------------------------------------------------------


def _merge_ranges(ranges) -> list[list[int]]:
    """Sort and coalesce adjacent/overlapping [lo, hi] id ranges."""
    merged: list[list[int]] = []
    for lo, hi in sorted(ranges):
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return merged


def cover_ranges(
    shape,
    cluster_level: int,
    cover_level: int | None = None,
    max_cells: int = 4096,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """The shape's S2 cover as coalesced id ranges at ``cluster_level``.

    A uniform-level cover (full + boundary cells alike — both are
    candidates) maps through the prefix property to one range per cell;
    Hilbert locality makes most of them adjacent, so coalescing
    typically collapses thousands of cells into a few dozen runs. If
    more than ``max_ranges`` runs survive, the SMALLEST inter-run gaps
    are swallowed first — widening (extra candidate ids), never
    narrowing, so exact refinement downstream is unaffected.
    """
    lv = cover_level if cover_level is not None else _auto_cover_level(shape, cluster_level)
    lv = max(0, min(int(lv), cluster_level))
    be = cell_backend("s2")
    while True:
        try:
            fulls, bounds = be.cover(shape, lv, geo=True, max_cells=max_cells)
            break
        except ValueError:
            # the cover planner signals over-resolution (max_cells
            # exceeded) with ValueError: the auto level over-resolved an
            # elongated shape (e.g. a thin full-longitude band) —
            # coarsen until the cover fits; coarser only widens
            # candidates, never drops them. Any other exception is a
            # real bug and propagates untouched.
            if lv == 0:
                raise
            lv -= 1
    cells = sorted({int(c) for c in list(fulls) + list(bounds)})
    if not cells:
        return []
    shift = 2 * (cluster_level - lv)
    return _coalesce_ranges(
        ((c << shift, ((c + 1) << shift) - 1) for c in cells), max_ranges
    )


def _coalesce_ranges(ranges, max_ranges: int) -> list[tuple[int, int]]:
    """Merge overlapping/adjacent runs, then swallow the SMALLEST
    inter-run gaps until at most ``max_ranges`` remain — widening
    (extra candidate ids), never narrowing."""
    merged = _merge_ranges(ranges)
    while len(merged) > max_ranges:
        gi = min(
            range(len(merged) - 1),
            key=lambda i: merged[i + 1][0] - merged[i][1],
        )
        merged[gi][1] = merged[gi + 1][1]
        del merged[gi + 1]
    return [(lo, hi) for lo, hi in merged]


def _auto_cover_level(shape, cluster_level: int) -> int:
    """Cover level sized so ~4 cells span the shape's bbox — fine enough
    to prune, coarse enough that the cover stays tiny."""
    try:
        from spatial4n_spark.kernels.polygon import shape_bbox

        b = shape_bbox(shape, geo=True)
        lon_extent = (b.max_x - b.min_x) % 360.0 if b.crosses_dateline else b.max_x - b.min_x
        lat_extent = b.max_y - b.min_y
        # near a pole the lon extent degenerates to 360 while the shape
        # stays compact — size by the lat extent there (the cover retry
        # loop coarsens if this over-resolves an elongated band)
        extent = lat_extent if lon_extent >= 180.0 else max(lon_extent, lat_extent)
    except Exception:
        extent = 360.0
    extent = max(float(extent), 1e-9)
    lv = int(math.ceil(math.log2(90.0 * 4.0 / extent))) if extent < 360.0 else 0
    return max(0, min(lv, cluster_level, 12))


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PruneStats:
    files_total: int
    files_kept: int
    rows_total: int
    rows_kept_files: int
    n_ranges: int


def read_pruned(
    spark: SparkSession, path: str, ranges: list[tuple[int, int]]
) -> tuple[DataFrame, PruneStats]:
    """Manifest-pruned scan: only files whose [min,max] intersects a
    query range are listed; the range disjunction is then applied as a
    pushed-down filter so kept files skip row groups too."""
    man = load_manifest(path)
    files = man["files"]
    keep = [
        e
        for e in files
        if any(not (hi < e["min"] or lo > e["max"]) for lo, hi in ranges)
    ]
    stats = PruneStats(
        files_total=len(files),
        files_kept=len(keep),
        rows_total=sum(e["rows"] for e in files),
        rows_kept_files=sum(e["rows"] for e in keep),
        n_ranges=len(ranges),
    )
    if not keep or not ranges:
        empty = spark.createDataFrame([], spark.read.parquet(path).schema)
        return empty, stats
    df = spark.read.parquet(*[os.path.join(path, e["file"]) for e in keep])
    cond = None
    for lo, hi in ranges:
        c = F.col(CELL_COL).between(F.lit(lo), F.lit(hi))
        cond = c if cond is None else (cond | c)
    return df.where(cond), stats


def clustered_radius_query(
    spark: SparkSession,
    path: str,
    qlon: float,
    qlat: float,
    radius_km: float,
    lon: str = "lon",
    lat: str = "lat",
    with_stats: bool = False,
):
    """Radius query over a clustered table: manifest file pruning +
    pushed row-group ranges, then the SAME exact haversine predicate as
    the unclustered radius join — the layout changes what is read,
    never what is returned."""
    man = load_manifest(path)
    circle = Circle(float(qlon), float(qlat), float(km_to_deg(radius_km)), geo=True)
    ranges = cover_ranges(circle, man["level"])
    df, stats = read_pruned(spark, path, ranges)
    out = df.where(
        haversine_km(F.col(lon), F.col(lat), F.lit(float(qlon)), F.lit(float(qlat)))
        <= F.lit(float(radius_km))
    ).drop(CELL_COL)
    return (out, stats) if with_stats else out


def _read_listed(spark: SparkSession, path: str) -> DataFrame:
    """All manifest-listed files (crash-orphans excluded) — the full-scan
    fallback surface."""
    man = load_manifest(path)
    files = [os.path.join(path, e["file"]) for e in man["files"]]
    if not files:
        return spark.createDataFrame([], spark.read.parquet(path).schema)
    return spark.read.parquet(*files)


def clustered_knn_df(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    query_id: str = "query_id",
    qlon: str = "qlon",
    qlat: str = "qlat",
    max_rounds: int = 10,
    target_cells_across: float = 8.0,
    broadcast_cells: int = 200_000,
    max_scan_ranges: int = 64,
) -> DataFrame:
    """Exact kNN over the clustered layout with the QUERY SET AS A
    DATAFRAME — the manifest-pruned twin of ``knn_join_cover_df``
    (operators/knn.py), replacing the old per-query driver loop whose
    one-job-per-query-per-round scheduling overhead dominated at large
    query counts regardless of cluster size.

    Every pending query shares the round radius R (r0 doubling on
    survival; density skew is handled by the exact acceptance check),
    so each round is a CONSTANT number of Spark jobs no matter how many
    queries are pending:

    1. circle covers planned DISTRIBUTED per query in ``mapInPandas``
       (one level-lv S2 cover per pending query — nothing per-query on
       the driver);
    2. the round's GLOBAL id-range set is folded executor-side from the
       distinct cover cells (prefix-property ranges, coalesced to at
       most ``max_scan_ranges`` runs) — the only thing collected is
       that bounded range list, which prunes manifest files driver-side
       (Iceberg-style scan planning) and is pushed as the row-group
       BETWEEN disjunction;
    3. candidates come from one equi-join of the pruned scan's
       prefix-shifted coarse cell against the covers (broadcast under a
       size bound, else shuffle-by-cell);
    4. acceptance (n >= k and k-th distance <= R — sound because the
       cover is a superset of ball(R)) is aggregate + anti-join.

    Per-query covers refine the global ranges, so pruning widens
    candidates but never results. Stragglers after ``max_rounds`` (or
    n_total < k) fall back to exact brute force over the listed files.
    Returns (query_id, <id_col>, dist_km, rank), ties on <id_col> —
    the same contract as operators.knn.knn_join."""
    from pyspark.sql import Window

    from spatial4n_spark.cellindex import cell_backend
    from spatial4n_spark.functions.native import haversine_km
    from spatial4n_spark.operators.knn import (
        _cover_level,
        _initial_cover_radius_km,
    )

    man = load_manifest(path)
    level = int(man["level"])
    n_total = sum(e["rows"] for e in man["files"])
    be = cell_backend("s2")
    r_km, r_cap = _initial_cover_radius_km(n_total, k)

    qid_type = queries.schema[query_id].dataType.simpleString()
    id_type = _read_listed(spark, path).schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_type}, {id_col} {id_type}, dist_km double, rank int"
    cover_schema = f"_pcell long, query_id {qid_type}, _qlon double, _qlat double"

    pending = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qlon).cast("double").alias("_qlon"),
        F.col(qlat).cast("double").alias("_qlat"),
    ).localCheckpoint(eager=False)
    n_pending = pending.count()

    accepted: list[DataFrame] = []
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col(id_col).asc()
    )

    def cover_gen(lv: int, r_deg: float):
        def gen(it):
            import numpy as np
            import pandas as pd

            from spatial4n_spark.cellindex import cell_backend as _cb
            from spatial4n_spark.kernels.polygon import Circle as _Circle

            be_w = _cb("s2")
            for pdf in it:
                if not len(pdf):
                    continue
                qx = pdf["_qlon"].to_numpy()
                qy = pdf["_qlat"].to_numpy()
                cells: list = []
                idx: list[int] = []
                for i in range(len(pdf)):
                    fulls, bounds = be_w.cover(
                        _Circle(float(qx[i]), float(qy[i]), r_deg, geo=True), lv
                    )
                    cs = fulls + bounds
                    cells.extend(cs)
                    idx.extend([i] * len(cs))
                yield pd.DataFrame(
                    {
                        "_pcell": np.asarray(cells, dtype=np.int64),
                        "query_id": pdf["query_id"].to_numpy()[idx],
                        "_qlon": qx[idx],
                        "_qlat": qy[idx],
                    }
                )

        return gen

    def merge_gen(shift: int, cap: int):
        """Fold the round's distinct cover cells into one coalesced
        global range list, executor-side — output is <= cap rows
        regardless of query count."""

        def gen(it):
            import numpy as np
            import pandas as pd

            parts = [pdf["_pcell"].to_numpy() for pdf in it if len(pdf)]
            if not parts:
                return
            cs = np.unique(np.concatenate(parts))
            merged = _coalesce_ranges(
                ((int(c) << shift, ((int(c) + 1) << shift) - 1) for c in cs), cap
            )
            yield pd.DataFrame(
                {
                    "lo": [m[0] for m in merged],
                    "hi": [m[1] for m in merged],
                }
            )

        return gen

    for _ in range(max_rounds):
        if n_pending == 0:
            break
        lv = _cover_level(be, r_km, level, target_cells_across)
        covers = pending.mapInPandas(
            cover_gen(lv, float(km_to_deg(r_km))), cover_schema
        ).localCheckpoint(eager=False)
        ranges = [
            (int(r["lo"]), int(r["hi"]))
            for r in covers.select("_pcell")
            .distinct()
            .coalesce(1)
            .mapInPandas(merge_gen(2 * (level - lv), max_scan_ranges), "lo long, hi long")
            .collect()
        ]
        cand_raw, _stats = read_pruned(spark, path, ranges)
        cov = covers
        if n_pending * target_cells_across**2 <= broadcast_cells:
            cov = F.broadcast(cov)
        cand = cand_raw.withColumn(
            "_pcell", F.shiftright(F.col(CELL_COL), 2 * (level - lv))
        ).join(cov, "_pcell")
        ranked = (
            cand.withColumn(
                "dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat")
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank")
            .localCheckpoint(eager=False)
        )
        summ = ranked.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("_n"), F.max("dist_km").alias("_dmax")
        )
        accepted_ids = summ.where(
            (F.col("_n") >= k) & (F.col("_dmax") <= F.lit(float(r_km)))
        ).select("query_id")
        accepted.append(
            ranked.join(F.broadcast(accepted_ids), "query_id").select(
                "query_id", id_col, "dist_km", "rank"
            )
        )
        pending = pending.join(
            F.broadcast(accepted_ids), "query_id", "left_anti"
        ).localCheckpoint(eager=False)
        n_pending = pending.count()
        r_km = min(r_km * 2.0, r_cap)

    if n_pending:
        # stragglers (sparse regions / n_total < k): exact brute force
        # over the listed files, broadcasting the smaller side
        p = _read_listed(spark, path).select(id_col, lon, lat)
        if n_total <= n_pending:
            fb_cand = pending.crossJoin(F.broadcast(p))
        else:
            fb_cand = p.crossJoin(F.broadcast(pending))
        fb = (
            fb_cand.withColumn(
                "dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat")
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank")
        )
        accepted.append(fb.localCheckpoint(eager=True))

    if not accepted:
        return spark.createDataFrame([], out_schema)
    out = accepted[0]
    for df in accepted[1:]:
        out = out.unionAll(df)
    return out


def clustered_knn(
    spark: SparkSession,
    path: str,
    queries: list[tuple],
    k: int,
    id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    max_rounds: int = 10,
):
    """Driver-list convenience surface over ``clustered_knn_df`` — the
    old per-query collect loop is gone; a list of (query_id, lon, lat)
    tuples becomes a query DataFrame and runs through the same
    constant-jobs-per-round plan a 10^5-query batch would use."""
    qdf = spark.createDataFrame(
        [(str(q), float(x), float(y)) for q, x, y in queries],
        "query_id string, qlon double, qlat double",
    )
    return clustered_knn_df(
        spark, path, qdf, k, id_col=id_col, lon=lon, lat=lat, max_rounds=max_rounds
    )


def clustered_candidates(
    spark: SparkSession,
    path: str,
    shapes: list,
    with_stats: bool = False,
):
    """Manifest-pruned candidate scan for a set of shapes (e.g. a polygon
    layer): one union-of-covers range set, one pruned scan. Callers run
    their exact join/refine on the result; pruning is conservative by
    construction."""
    man = load_manifest(path)
    all_ranges: list[tuple[int, int]] = []
    for s in shapes:
        all_ranges.extend(cover_ranges(s, man["level"]))
    ranges = [(lo, hi) for lo, hi in _merge_ranges(all_ranges)]
    df, stats = read_pruned(spark, path, ranges)
    out = df.drop(CELL_COL)
    return (out, stats) if with_stats else out
