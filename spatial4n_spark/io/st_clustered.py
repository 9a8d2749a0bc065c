"""Spatio-temporal layout: time partitions x Hilbert spatial clustering.

The production shape of a 10^12-row geotagged event/image table: daily
partition DIRECTORIES (Iceberg's hidden day-transform partitioning —
pure directory pruning, no footer reads for the time axis) with rows
Hilbert-range-clustered WITHIN each day (io.clustered's sort + stats
manifest — file/row-group pruning for the spatial axis). A typical
"last week, around Paris" query then prunes along both axes before a
single data byte is read: days by name, files by manifest bounds, row
groups by the pushed cell ranges.

The manifest records (day, file, min_cell, max_cell, rows); the data
files land under ``path/_day=YYYY-MM-DD/``. Readers use basePath so the
day partition column stays available to the residual time filter (exact
timestamps still filter rows within boundary days).
"""

from __future__ import annotations

import json as _json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.cellindex import cell_backend
from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.io.clustered import (
    CELL_COL,
    Increment,
    _added_map,
    _consumer_position,
    _drop_ref_versioned,
    _expire_versioned,
    _file_stats,
    _files_df_from,
    _incremental_added,
    _load_refs,
    _merge_schemas,
    _load_versioned,
    _log_df,
    _referenced_in,
    _remove_orphans_versioned,
    _rollback_versioned,
    _set_ref_versioned,
    _snapshot_list,
    _versioned_commit,
    cover_ranges,
    table_lock,
)
from spatial4n_spark.kernels.distance import km_to_deg
from spatial4n_spark.kernels.polygon import Circle

DAY_COL = "_day"
MANIFEST = "_st_manifest.json"
SNAP_DIR = "_st_snapshots"


def write_st_clustered(
    df: DataFrame,
    path: str,
    level: int = 14,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by event day and range-clustered by the
    level-``level`` S2 cell id within each day.

    Overwrite-only: a directory-listing manifest rebuild under append
    would resurrect crash-orphaned files (rows a retried append already
    re-delivered) into the manifest — ``append_st_clustered`` is the
    append path, extending the PRIOR manifest by exactly the new files.
    """
    if mode != "overwrite":
        raise ValueError(
            "write_st_clustered is overwrite-only; use append_st_clustered"
        )
    _require_wallclock_ts(df, ts)
    be = cell_backend("s2")
    out = (
        df.withColumn(DAY_COL, F.date_format(F.col(ts), "yyyy-MM-dd"))
        .withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
    )
    (
        out.repartitionByRange(files, F.col(DAY_COL), F.col(CELL_COL))
        .sortWithinPartitions(DAY_COL, CELL_COL)
        .write.partitionBy(DAY_COL)
        .mode(mode)
        .parquet(path)
    )
    entries = _day_tagged_stats(path, _st_data_files(path))
    _commit_st_manifest(
        path, level, entries, schema_json=_st_file_schema_json(out)
    )


def load_st_manifest(
    path: str,
    snapshot_id: int | str | None = None,
    as_of: float | None = None,
) -> dict:
    """Current ST manifest, or — with ``snapshot_id`` — the immutable
    manifest of that snapshot (time travel); same semantics as the flat
    layout's ``load_manifest``, including ``as_of`` timestamp travel."""
    if as_of is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of, not both")
        from spatial4n_spark.io.clustered import _as_of_versioned

        snapshot_id = _as_of_versioned(path, as_of, MANIFEST, SNAP_DIR)
    return _load_versioned(path, snapshot_id, MANIFEST, SNAP_DIR)


def st_snapshots(path: str) -> list[dict]:
    """The ST table's snapshot log (lineage), oldest first."""
    return _snapshot_list(path, MANIFEST, SNAP_DIR)


def st_snapshot_log_df(spark: SparkSession, path: str) -> DataFrame:
    """The ST snapshot log as a DataFrame (lineage/metrics table)."""
    return _log_df(spark, st_snapshots(path))


def rollback_st_clustered(path: str, snapshot_id: int) -> dict:
    """Iceberg-style rollback of the ST table: commits the target
    snapshot's file list as NEW lineage (see the flat layout's
    ``rollback_clustered``)."""
    with table_lock(path, MANIFEST + ".lock"):
        return _rollback_versioned(path, snapshot_id, MANIFEST, SNAP_DIR)


def expire_st_snapshots(
    path: str, keep_last: int = 2, older_than: float | None = None
) -> dict:
    """Reclaim ST history: drop all but the newest ``keep_last``
    snapshots, then delete data files no retained snapshot references
    (see the flat layout's ``expire_snapshots``, incl. ``older_than``
    age-based retention)."""
    with table_lock(path, MANIFEST + ".lock"):
        return _expire_versioned(
            path, keep_last, MANIFEST, SNAP_DIR, _st_data_files(path),
            older_than=older_than,
        )


def _st_data_files(path: str) -> list[str]:
    """Relative paths of all day-partition data files."""
    rels = []
    for dname in sorted(os.listdir(path)):
        if not dname.startswith(f"{DAY_COL}="):
            continue
        for f in sorted(os.listdir(os.path.join(path, dname))):
            if f.endswith(".parquet"):
                rels.append(os.path.join(dname, f))
    return rels


def _commit_st_manifest(
    path: str,
    level: int,
    entries: list[dict],
    operation: str = "overwrite",
    schema_json: str | None = None,
    branch: str | None = None,
) -> dict:
    """Snapshot-versioned commit (shared machinery with the flat layout:
    immutable per-commit snapshot file first, atomic temp-file +
    os.replace manifest cut-over last).  ``schema_json`` is the FILE
    schema (without the day partition column); commits that don't pass
    one inherit the parent's."""
    return _versioned_commit(
        path, level, entries, operation, MANIFEST, SNAP_DIR,
        schema_json=schema_json, branch=branch,
    )


def _st_file_schema_json(out: DataFrame) -> str:
    """The schema of the DATA FILES: the written frame minus the day
    partition column (stored as a directory name, not in the files)."""
    from pyspark.sql.types import StructType

    return StructType(
        [f for f in out.schema.fields if f.name != DAY_COL]
    ).json()


def _require_wallclock_ts(df: DataFrame, ts: str) -> None:
    """Day partitions are derived with date_format and pruned with
    str(t0)[:10] — both WALL-CLOCK operations. For a tz-aware TIMESTAMP
    column date_format renders in the session timezone, so a reader in
    a different session timezone than the writer would silently drop
    boundary-day rows. Rather than let that happen, require a
    session-timezone-independent type: TIMESTAMP_NTZ, DATE, or string.
    Callers with instant timestamps pick the zone explicitly first,
    e.g. ``F.convert_timezone(F.lit('UTC'), ts).cast('timestamp_ntz')``.
    """
    from pyspark.sql.types import TimestampType

    if isinstance(df.schema[ts].dataType, TimestampType):
        raise ValueError(
            f"st_clustered requires a session-timezone-independent {ts!r} "
            "column (TIMESTAMP_NTZ, DATE, or string); got tz-aware "
            "TIMESTAMP, whose day boundary depends on the session "
            "timezone — convert explicitly, e.g. "
            "to_utc_timestamp(ts, <zone>).cast('timestamp_ntz')"
        )


def _day_of(rel: str) -> str:
    return rel.split("=", 1)[1].split(os.sep, 1)[0]


def _day_tagged_stats(path: str, rels: list[str]) -> list[dict]:
    """Manifest entries for the given relative files, tagged with their
    day partition (the one write/append/compact tail)."""
    entries = _file_stats(path, rels)
    for e in entries:
        e["day"] = _day_of(e["file"])
    return entries


def append_st_clustered(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    files: int = 4,
    branch: str | None = None,
) -> None:
    """Append a batch into the day-partitioned layout: new files land in
    their day directories with TRUE stats joining the manifest (data
    first, manifest commit last — same crash contract as the flat
    layout's append). Only the touched days' locality degrades;
    ``compact_st_clustered`` restores one day at a time. Holds
    ``table_lock`` so concurrent writers error instead of racing the
    manifest read-extend-commit."""
    _require_wallclock_ts(df, ts)
    with table_lock(path, MANIFEST + ".lock"):
        man = load_st_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        be = cell_backend("s2")
        out = (
            df.withColumn(DAY_COL, F.date_format(F.col(ts), "yyyy-MM-dd"))
            .withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
        )
        pre = set(_st_data_files(path))
        (
            out.repartitionByRange(files, F.col(DAY_COL), F.col(CELL_COL))
            .sortWithinPartitions(DAY_COL, CELL_COL)
            .write.partitionBy(DAY_COL)
            .mode("append")
            .parquet(path)
        )
        new = [r for r in _st_data_files(path) if r not in pre]
        from pyspark.sql.types import StructType

        old_schema = (
            StructType.fromJson(_json.loads(man["schema"]))
            if man.get("schema")
            else None
        )
        batch_schema = StructType(
            [f for f in out.schema.fields if f.name != DAY_COL]
        )
        schema_json = (
            _merge_schemas(old_schema, batch_schema)[0].json()
            if old_schema is not None
            else batch_schema.json()
        )
        _commit_st_manifest(
            path,
            level,
            man["files"] + _day_tagged_stats(path, new),
            operation="append",
            schema_json=schema_json,
            branch=branch,
        )


def compact_st_clustered(
    spark: SparkSession,
    path: str,
    day: str,
    files: int = 4,
) -> None:
    """Sort-compact ONE day partition (the realistic loop: only recently
    appended days fragment). Same crash-safe ordering as the flat
    layout: new sorted run appended into the day directory, manifest cut
    over in one write, then unlisted files in that directory swept.
    Holds ``table_lock`` end to end (single-writer invariant)."""
    with table_lock(path, MANIFEST + ".lock"):
        man = load_st_manifest(path)
        level = int(man["level"])
        mine = [e for e in man["files"] if e["day"] == day]
        others = [e for e in man["files"] if e["day"] != day]
        if mine:
            cur = spark.read.option("basePath", path).parquet(
                *[os.path.join(path, e["file"]) for e in mine]
            )
            pre = set(_st_data_files(path))
            (
                cur.repartitionByRange(files, F.col(CELL_COL))
                .sortWithinPartitions(CELL_COL)
                .write.partitionBy(DAY_COL)
                .mode("append")
                .parquet(path)
            )
            new = [r for r in _st_data_files(path) if r not in pre]
            _commit_st_manifest(
                path,
                level,
                others + _day_tagged_stats(path, new),
                operation="replace",
            )
        # sweep only files NO retained snapshot references (snapshot
        # isolation — the superseded run stays readable until
        # expire_st_snapshots); crash orphans are in no snapshot and go
        keep = _referenced_in(path, MANIFEST, SNAP_DIR)
        ddir = f"{DAY_COL}={day}"
        for rel in _st_data_files(path):
            if rel.startswith(ddir) and rel not in keep:
                os.remove(os.path.join(path, rel))


def delete_st_clustered(
    spark: SparkSession,
    path: str,
    predicate=None,
    t0=None,
    t1=None,
    shape=None,
    ts: str = "ts",
    branch: str | None = None,
) -> dict:
    """Row-level DELETE on the day-partitioned layout, copy-on-write
    with minimal rewrite — the two-axis twin of the flat layout's
    ``delete_clustered``: candidate files are pruned by the time
    window's DAY RANGE and by the ``shape``'s cell cover BEFORE any
    data is read, so deleting 'this region, these days' from a year of
    history touches only those days' overlapping files.

    The deleted set is the conjunction of whatever is given:
    ``predicate`` (a pyspark Column; NULL = row survives), the
    ``[t0, t1]`` timestamp window, and the shape's cell-cover
    restriction (a superset of the shape — pass the shape's exact
    predicate too for an exact spatial delete). At least one must be
    supplied. Same contract as the flat delete: per-file match counts
    pick the rewrite set, untouched manifest entries survive verbatim,
    one snapshot commit, superseded files stay until
    ``expire_st_snapshots``; zero matches commits nothing."""
    if predicate is None and t0 is None and shape is None:
        raise ValueError(
            "delete_st_clustered needs a predicate, a [t0, t1] window, "
            "or a shape — an unconditioned delete of the whole table "
            "should be an explicit overwrite instead"
        )
    with table_lock(path, MANIFEST + ".lock"):
        man = load_st_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        entries = man["files"]
        cand = entries
        if t0 is not None and t1 is not None:
            day_lo, day_hi = str(t0)[:10], str(t1)[:10]
            cand = [e for e in cand if day_lo <= e["day"] <= day_hi]
        rcond = None
        if shape is not None:
            ranges = cover_ranges(shape, level)
            cand = [
                e
                for e in cand
                if any(not (hi < e["min"] or lo > e["max"]) for lo, hi in ranges)
            ]
            for lo, hi in ranges:
                c = F.col(CELL_COL).between(F.lit(lo), F.lit(hi))
                rcond = c if rcond is None else (rcond | c)
            if rcond is None:
                rcond = F.lit(False)
        if not cand:
            return {
                "operation": "delete",
                "noop": True,
                "deleted_rows": 0,
                "snapshot_id": int(man["snapshot_id"]),
            }
        cdf = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, e["file"]) for e in cand]
        )
        cond = predicate if predicate is not None else F.lit(True)
        if t0 is not None and t1 is not None:
            ts_type = cdf.schema[ts].dataType
            cond = cond & (
                (F.col(ts) >= F.lit(t0).cast(ts_type))
                & (F.col(ts) <= F.lit(t1).cast(ts_type))
            )
        if rcond is not None:
            cond = cond & rcond
        cond = F.coalesce(cond.cast("boolean"), F.lit(False))
        # _src is the manifest-relative path (day dir + file), projected
        # DIRECTLY over the scan (input_file_name is per-source)
        parts = F.split(F.input_file_name(), "/")
        src = F.concat_ws(
            "/", F.element_at(parts, -2), F.element_at(parts, -1)
        )
        rows = (
            cdf.withColumn("_src", src)
            .where(cond)
            .groupBy("_src")
            .count()
            .collect()
        )
        hits = {r["_src"]: int(r["count"]) for r in rows}
        if not hits:
            return {
                "operation": "delete",
                "noop": True,
                "deleted_rows": 0,
                "snapshot_id": int(man["snapshot_id"]),
            }
        pre = set(_st_data_files(path))
        keepdf = (
            spark.read.option("basePath", path)
            .parquet(*[os.path.join(path, n) for n in hits])
            .where(~cond)
        )
        (
            keepdf.repartitionByRange(max(1, len(hits)), F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.partitionBy(DAY_COL)
            .mode("append")
            .parquet(path)
        )
        new = [r for r in _st_data_files(path) if r not in pre]
        untouched = [e for e in entries if e["file"] not in hits]
        return _versioned_commit(
            path,
            level,
            untouched + _day_tagged_stats(path, new),
            "delete",
            MANIFEST,
            SNAP_DIR,
            branch=branch,
            extra_summary={
                "deleted_rows": int(sum(hits.values())),
                "rewritten_files": len(hits),
                "untouched_files": len(untouched),
            },
        )


def upsert_st_clustered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    files: int = 4,
    branch: str | None = None,
) -> dict:
    """MERGE by key on the day-partitioned layout — the ST twin of the
    flat layout's ``upsert_clustered``, as ONE snapshot commit: current
    rows whose ``key`` appears in ``df`` are replaced by ``df``'s
    version (which may have moved in SPACE and/or TIME — new rows land
    in their new day directory and cell), other keys insert.

    The hit scan reads only the key column and is pruned by the
    manifest's per-column key stats when present (entries without
    stats are always scanned — sound on pre-stats tables); only
    matched files are rewritten, untouched manifest entries survive
    verbatim. NULL keys never match and insert as new rows."""
    _require_wallclock_ts(df, ts)
    from spatial4n_spark.io.clustered import _col_range_keep

    with table_lock(path, MANIFEST + ".lock"):
        man = load_st_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        entries = man["files"]
        keys = F.broadcast(df.select(key).distinct())
        row = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
        klo, khi = row["lo"], row["hi"]
        cand = (
            []
            if klo is None
            else [e for e in entries if _col_range_keep(e, key, klo, khi)]
        )
        touched: dict = {}
        if cand:
            parts = F.split(F.input_file_name(), "/")
            src = F.concat_ws(
                "/", F.element_at(parts, -2), F.element_at(parts, -1)
            )
            cdf = (
                spark.read.option("basePath", path)
                .parquet(*[os.path.join(path, e["file"]) for e in cand])
                .select(F.col(key), src.alias("_src"))
            )
            rows = (
                cdf.join(keys, on=key, how="left_semi")
                .groupBy("_src")
                .count()
                .collect()
            )
            touched = {r["_src"]: int(r["count"]) for r in rows}
        pre = set(_st_data_files(path))
        if touched:
            kdf = (
                spark.read.option("basePath", path)
                .parquet(*[os.path.join(path, n) for n in touched])
                .join(keys, on=key, how="left_anti")
            )
            (
                kdf.repartitionByRange(max(1, len(touched)), F.col(CELL_COL))
                .sortWithinPartitions(CELL_COL)
                .write.partitionBy(DAY_COL)
                .mode("append")
                .parquet(path)
            )
        mid = set(_st_data_files(path))
        be = cell_backend("s2")
        out = (
            df.withColumn(DAY_COL, F.date_format(F.col(ts), "yyyy-MM-dd"))
            .withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
        )
        (
            out.repartitionByRange(files, F.col(DAY_COL), F.col(CELL_COL))
            .sortWithinPartitions(DAY_COL, CELL_COL)
            .write.partitionBy(DAY_COL)
            .mode("append")
            .parquet(path)
        )
        post = _st_data_files(path)
        rewritten = _day_tagged_stats(path, sorted(mid - pre))
        inserted = _day_tagged_stats(path, [r for r in post if r not in mid])
        untouched = [e for e in entries if e["file"] not in touched]
        return _versioned_commit(
            path,
            level,
            untouched + rewritten + inserted,
            "upsert",
            MANIFEST,
            SNAP_DIR,
            branch=branch,
            extra_summary={
                "replaced_rows": int(sum(touched.values())),
                "incoming_rows": int(sum(e["rows"] for e in inserted)),
                "rewritten_files": len(touched),
                "untouched_files": len(untouched),
                "hit_scan_files": len(cand),
            },
        )


@dataclass(frozen=True)
class STPruneStats:
    files_total: int
    files_kept: int
    rows_total: int
    rows_kept_files: int
    days_total: int
    days_kept: int
    n_ranges: int


def read_st_pruned(
    spark: SparkSession,
    path: str,
    ranges: list[tuple[int, int]],
    day_lo: str,
    day_hi: str,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, STPruneStats]:
    """Both pruning axes at plan time: days by name (the directory-
    partition analog), files by manifest cell bounds; the residual cell
    disjunction is pushed to the parquet reader.  ``snapshot_id`` plans
    against that snapshot's manifest (time travel)."""
    man = load_st_manifest(path, snapshot_id)
    files = man["files"]
    keep = [
        e
        for e in files
        if day_lo <= e["day"] <= day_hi
        and any(not (hi < e["min"] or lo > e["max"]) for lo, hi in ranges)
    ]
    stats = STPruneStats(
        files_total=len(files),
        files_kept=len(keep),
        rows_total=sum(e["rows"] for e in files),
        rows_kept_files=sum(e["rows"] for e in keep),
        days_total=len({e["day"] for e in files}),
        days_kept=len({e["day"] for e in keep}),
        n_ranges=len(ranges),
    )
    if not keep or not ranges:
        # schema from ONE manifest-listed file (no full partition
        # discovery just to return zero rows); an entirely empty table
        # has no files to derive from — fall back to the full read then
        if files:
            schema = (
                spark.read.option("basePath", path)
                .parquet(os.path.join(path, files[0]["file"]))
                .schema
            )
        else:
            schema = spark.read.option("basePath", path).parquet(path).schema
        return spark.createDataFrame([], schema), stats
    df = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, e["file"]) for e in keep]
    )
    cond = None
    for lo, hi in ranges:
        c = F.col(CELL_COL).between(F.lit(lo), F.lit(hi))
        cond = c if cond is None else (cond | c)
    return df.where(cond), stats


def st_radius_query(
    spark: SparkSession,
    path: str,
    qlon: float,
    qlat: float,
    radius_km: float,
    t0,
    t1,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    with_stats: bool = False,
    snapshot_id: int | None = None,
):
    """'This circle, this time window': day + manifest + row-group
    pruning, then the exact timestamp and haversine predicates — layout
    changes what is read, never what is returned.  ``snapshot_id`` runs
    the query as of that snapshot (time travel)."""
    man = load_st_manifest(path, snapshot_id)
    circle = Circle(float(qlon), float(qlat), float(km_to_deg(radius_km)), geo=True)
    ranges = cover_ranges(circle, man["level"])
    day_lo, day_hi = str(t0)[:10], str(t1)[:10]
    df, stats = read_st_pruned(
        spark, path, ranges, day_lo, day_hi, snapshot_id=snapshot_id
    )
    ts_type = df.schema[ts].dataType
    lo, hi = F.lit(t0).cast(ts_type), F.lit(t1).cast(ts_type)
    out = (
        df.where((F.col(ts) >= lo) & (F.col(ts) <= hi))
        .where(
            haversine_km(F.col(lon), F.col(lat), F.lit(float(qlon)), F.lit(float(qlat)))
            <= F.lit(float(radius_km))
        )
        .drop(CELL_COL, DAY_COL)
    )
    return (out, stats) if with_stats else out


def st_incremental_scan(
    spark: SparkSession,
    path: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    snapshot_col: str | None = None,
) -> DataFrame:
    """Rows ADDED to the ST table over ``(from, to]`` — the
    spatio-temporal twin of ``clustered.incremental_scan`` (same
    operation semantics: append contributes, replace is skipped,
    row-replacing commits raise).  Files are read under ``basePath`` so
    the day partition column materializes on every row."""
    cur = load_st_manifest(path)
    to = int(cur["snapshot_id"]) if to_snapshot is None else int(to_snapshot)
    batches = _incremental_added(
        path, int(from_snapshot), to, MANIFEST, SNAP_DIR
    )
    parts = []
    for man, added in batches:
        df = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, n) for n in added]
        )
        if snapshot_col is not None:
            df = df.withColumn(
                snapshot_col, F.lit(int(man["snapshot_id"])).cast("long")
            )
        parts.append(df)
    if not parts:
        files = cur["files"] if to == int(cur["snapshot_id"]) else (
            load_st_manifest(path, to)["files"]
        )
        if files:
            schema = (
                spark.read.option("basePath", path)
                .parquet(os.path.join(path, files[0]["file"]))
                .schema
            )
        else:
            schema = spark.read.option("basePath", path).parquet(path).schema
        if snapshot_col is not None:
            from pyspark.sql.types import LongType, StructField, StructType

            schema = StructType(
                list(schema.fields) + [StructField(snapshot_col, LongType(), True)]
            )
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def st_next_increment(
    spark: SparkSession,
    path: str,
    state_path: str,
    snapshot_col: str | None = None,
) -> Increment | None:
    """Resumable-consumer step over the ST layout (see
    ``clustered.next_increment`` — same state file contract and
    at-least-once/commit-after-sink semantics)."""
    last = _consumer_position(state_path)
    cur = int(load_st_manifest(path)["snapshot_id"])
    if cur <= last:
        return None
    df = st_incremental_scan(spark, path, last, cur, snapshot_col=snapshot_col)
    return Increment(
        df=df, from_snapshot=last, to_snapshot=cur, state_path=state_path
    )


def st_files_df(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The ST table's file-level metadata (the Iceberg ``.files``
    metadata-table analog): one row per manifest entry with its day
    partition, row count, cell bounds, per-file lineage
    (``added_snapshot_id``), and per-column stats — answered from the
    manifest alone, time-traveling with ``snapshot_id``."""
    man = load_st_manifest(path, snapshot_id)
    added = _added_map(path, MANIFEST, SNAP_DIR, int(man.get("snapshot_id", 0)))
    return _files_df_from(spark, man, added)


def st_partitions_df(
    spark: SparkSession, path: str, snapshot_id: int | str | None = None
) -> DataFrame:
    """Per-PARTITION lineage + metrics — the Iceberg ``.partitions``
    metadata-table analog, rolled up over the layout's true partition
    axis (the day directory): file count, row count, the cell span the
    day's files cover, the snapshot that last changed the day
    (``last_updated_snapshot`` = max of its files' lineage ids), and
    the count of pending MOR delete files targeting the day.  Answered
    from the manifest alone; time-travels (id or tag name) like every
    other reader."""
    man = load_st_manifest(path, snapshot_id)
    added = _added_map(path, MANIFEST, SNAP_DIR, int(man.get("snapshot_id", 0)))
    del_targets: dict[str, int] = {}
    for d in man.get("deletes") or []:
        for t in d["targets"]:
            del_targets[t] = del_targets.get(t, 0) + 1
    days: dict[str, dict] = {}
    for e in man["files"]:
        day = e.get("day") or ""
        p = days.setdefault(
            day,
            {"n_files": 0, "n_rows": 0, "cell_min": None, "cell_max": None,
             "last_updated_snapshot": None, "n_pending_delete_files": 0},
        )
        p["n_files"] += 1
        p["n_rows"] += int(e["rows"])
        lo, hi = int(e["min"]), int(e["max"])
        p["cell_min"] = lo if p["cell_min"] is None else min(p["cell_min"], lo)
        p["cell_max"] = hi if p["cell_max"] is None else max(p["cell_max"], hi)
        sid = added.get(e["file"])
        if sid is not None:
            last = p["last_updated_snapshot"]
            p["last_updated_snapshot"] = sid if last is None else max(last, sid)
        p["n_pending_delete_files"] += del_targets.get(e["file"], 0)
    rows = [
        (day, p["n_files"], p["n_rows"], p["cell_min"], p["cell_max"],
         p["last_updated_snapshot"], p["n_pending_delete_files"])
        for day, p in sorted(days.items())
    ]
    return spark.createDataFrame(
        rows,
        "day string, n_files int, n_rows bigint, cell_min bigint, "
        "cell_max bigint, last_updated_snapshot int, "
        "n_pending_delete_files int",
    )


def create_st_tag(path: str, name: str, snapshot_id: int | None = None) -> int:
    """Tag an ST snapshot — see ``clustered.create_tag``.  The tag name
    is readable wherever ``snapshot_id`` is (``st_radius_query``,
    ``st_files_df``, …) and anchors the snapshot against
    ``expire_st_snapshots``."""
    return _set_ref_versioned(
        path, name, snapshot_id, MANIFEST, SNAP_DIR, MANIFEST + ".lock"
    )


def drop_st_tag(path: str, name: str) -> int:
    """Remove an ST tag; its snapshot becomes expirable again."""
    return _drop_ref_versioned(path, name, SNAP_DIR, MANIFEST + ".lock")


def create_st_branch(path: str, name: str, snapshot_id: int | None = None) -> int:
    """Writable branch on the ST table — the WAP staging surface (see
    ``clustered.create_branch``): ``branch=`` on append/delete/upsert
    commits against it, readers audit by name, and
    ``fast_forward_st_clustered`` publishes."""
    return _set_ref_versioned(
        path, name, snapshot_id, MANIFEST, SNAP_DIR, MANIFEST + ".lock",
        ref_type="branch",
    )


def drop_st_branch(path: str, name: str) -> int:
    """Remove an ST branch; unpublished commits become expirable."""
    from spatial4n_spark.io.clustered import _drop_branch_versioned

    return _drop_branch_versioned(path, name, SNAP_DIR, MANIFEST + ".lock")


def fast_forward_st_clustered(path: str, name: str) -> dict:
    """Publish an ST branch: atomic fast-forward of the main table to
    the branch head (see ``clustered.fast_forward_clustered``)."""
    from spatial4n_spark.io.clustered import _fast_forward_versioned

    return _fast_forward_versioned(
        path, name, MANIFEST, SNAP_DIR, MANIFEST + ".lock"
    )


def st_table_refs(path: str) -> dict[str, int]:
    """All named refs on the ST table: ``{name: snapshot_id}``."""
    return {
        k: int(v["snapshot_id"]) for k, v in _load_refs(path, SNAP_DIR).items()
    }


def st_refs_df(spark: SparkSession, path: str) -> DataFrame:
    """The ST table's refs as a DataFrame — the ``.refs``
    metadata-table analog (tags and branches; see ``clustered.refs_df``
    and ``create_st_branch``)."""
    rows = [
        (k, int(v["snapshot_id"]), v["type"])
        for k, v in sorted(_load_refs(path, SNAP_DIR).items())
    ]
    return spark.createDataFrame(
        rows, "name string, snapshot_id int, type string"
    )


def st_snapshot_as_of(path: str, ts: float) -> int:
    """Resolve a unix timestamp to the ST snapshot current at that time
    — see ``clustered.snapshot_as_of``."""
    from spatial4n_spark.io.clustered import _as_of_versioned

    return _as_of_versioned(path, ts, MANIFEST, SNAP_DIR)


def st_history_df(spark: SparkSession, path: str) -> DataFrame:
    """The ST table's ``.history`` metadata table — made-current events
    (see ``clustered.history_df``)."""
    from spatial4n_spark.io.clustered import _history_df, _history_rows

    return _history_df(spark, _history_rows(path, MANIFEST, SNAP_DIR))


def remove_orphan_st_files(path: str) -> dict:
    """Standalone crash-orphan sweep for the ST layout — see
    ``clustered.remove_orphan_files``; history is untouched."""
    with table_lock(path, MANIFEST + ".lock"):
        return _remove_orphans_versioned(
            path, MANIFEST, SNAP_DIR, _st_data_files(path)
        )
