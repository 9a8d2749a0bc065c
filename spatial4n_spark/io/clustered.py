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
    merged = _merge_ranges(
        (c << shift, ((c + 1) << shift) - 1) for c in cells
    )
    while len(merged) > max_ranges:
        # swallow the smallest gap between consecutive runs
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
    """Exact kNN over the clustered table (small-query-list surface,
    like knn_join's driver-list path): per round a query circle of
    radius R is covered, the cover's id ranges prune the scan (manifest
    files + pushed row groups), exact haversine ranks the candidates,
    and the answer is accepted when the k-th distance <= R — sound
    because cover_ranges is a superset of the ball(R) membership, so
    all true neighbors within R were candidates. Otherwise R doubles;
    the cap radius covers the globe, making the last round a (pruned)
    full scan.

    Returns (query_id, <id_col>, dist_km, rank), ties on <id_col> —
    the same contract as operators.knn.knn_join."""
    from pyspark.sql import Window

    from spatial4n_spark.functions.native import haversine_km
    from spatial4n_spark.operators.knn import _initial_cover_radius_km

    man = load_manifest(path)
    level = int(man["level"])
    n_total = sum(e["rows"] for e in man["files"])
    r0, r_cap = _initial_cover_radius_km(n_total, k)
    id_dt = spark.read.parquet(path).schema[id_col].dataType.simpleString()

    parts = []
    for qid, qlon, qlat in queries:
        r = r0
        for round_i in range(max_rounds):
            if round_i == max_rounds - 1:
                # last permitted round: probe at the cap radius (a
                # 180-degree circle covers the globe, so the pruned scan
                # degenerates to the full table and acceptance is
                # unconditional — the brute-force fallback the ring kNN
                # paths use, expressed through the same cover machinery).
                # Without this, a sparse-region query could exhaust its
                # rounds and silently emit the last cover's k best
                # instead of the true k nearest.
                r = r_cap
            circle = Circle(float(qlon), float(qlat), float(km_to_deg(r)), geo=True)
            ranges = cover_ranges(circle, level)
            cand, _ = read_pruned(spark, path, ranges)
            top = (
                cand.withColumn(
                    "dist_km",
                    haversine_km(
                        F.col(lon), F.col(lat), F.lit(float(qlon)), F.lit(float(qlat))
                    ),
                )
                .orderBy(F.col("dist_km").asc(), F.col(id_col).asc())
                .limit(k)
                .collect()
            )
            if (len(top) >= k and top[k - 1]["dist_km"] <= r) or r >= r_cap:
                break
            r = min(r * 2.0, r_cap)
        parts.extend(
            (str(qid), row[id_col], float(row["dist_km"]), i + 1)
            for i, row in enumerate(top)
        )
    out = spark.createDataFrame(
        parts, f"query_id string, {id_col} {id_dt}, dist_km double, rank int"
    )
    # rebuild rank deterministically (defensive: limit+collect preserved
    # the sort, but the window makes the contract explicit)
    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col(id_col).asc())
    return out.withColumn("rank", F.row_number().over(w))


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
