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

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.cellindex import cell_backend
from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.io.clustered import (
    CELL_COL,
    _atomic_json_write,
    _file_stats,
    cover_ranges,
    table_lock,
)
from spatial4n_spark.kernels.distance import km_to_deg
from spatial4n_spark.kernels.polygon import Circle

DAY_COL = "_day"
MANIFEST = "_st_manifest.json"


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
    _commit_st_manifest(path, level, entries)


def load_st_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


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


def _commit_st_manifest(path: str, level: int, entries: list[dict]) -> None:
    man = {"cell_col": CELL_COL, "index": "s2", "level": level, "files": entries}
    # temp-file + os.replace: the commit really is atomic (a crash
    # leaves old manifest or new, never a truncated half-write)
    _atomic_json_write(os.path.join(path, MANIFEST), man)


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
        man = load_st_manifest(path)
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
        _commit_st_manifest(path, level, man["files"] + _day_tagged_stats(path, new))


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
            _commit_st_manifest(path, level, others + _day_tagged_stats(path, new))
        keep = {e["file"] for e in load_st_manifest(path)["files"]}
        ddir = f"{DAY_COL}={day}"
        for rel in _st_data_files(path):
            if rel.startswith(ddir) and rel not in keep:
                os.remove(os.path.join(path, rel))


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
) -> tuple[DataFrame, STPruneStats]:
    """Both pruning axes at plan time: days by name (the directory-
    partition analog), files by manifest cell bounds; the residual cell
    disjunction is pushed to the parquet reader."""
    man = load_st_manifest(path)
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
):
    """'This circle, this time window': day + manifest + row-group
    pruning, then the exact timestamp and haversine predicates — layout
    changes what is read, never what is returned."""
    man = load_st_manifest(path)
    circle = Circle(float(qlon), float(qlat), float(km_to_deg(radius_km)), geo=True)
    ranges = cover_ranges(circle, man["level"])
    day_lo, day_hi = str(t0)[:10], str(t1)[:10]
    df, stats = read_st_pruned(spark, path, ranges, day_lo, day_hi)
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
