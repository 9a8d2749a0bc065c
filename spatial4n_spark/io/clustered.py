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
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.cellindex import cell_backend
from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.kernels.distance import km_to_deg
from spatial4n_spark.kernels.polygon import Circle

CELL_COL = "cell_r"
MANIFEST = "_cluster_manifest.json"
LOCKFILE = "_cluster.lock"
SNAP_DIR = "_snapshots"
DELETE_DIR = "_deletes"
# a pending-delete set at or under this many positions rides a
# broadcast to the scan's anti-join; larger sets shuffle (both are one
# join — the threshold only picks the physical strategy)
BROADCAST_DELETE_ROWS = 2_000_000
_DFILE, _DPOS = "__s4n_file", "__s4n_pos"


def lock_path(path: str, lockfile: str = LOCKFILE) -> str:
    """Where ``table_lock`` puts its lockfile for a table directory —
    a SIBLING of the directory (``<path>.<lockfile>``), see
    ``table_lock`` for why."""
    return os.path.abspath(path).rstrip(os.sep) + "." + lockfile


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

    The lockfile is a SIBLING of the table directory
    (``<path>.<lockfile>``), not inside it: the overwrite writers
    (``write_clustered`` / ``write_st_clustered``) also hold this lock,
    and Spark's overwrite mode wipes the table directory — an in-dir
    lockfile would be deleted out from under its own holder, silently
    re-admitting concurrent writers mid-overwrite.
    """
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    lock = lock_path(path, lockfile)
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

    Holds ``table_lock`` across the rewrite + manifest commit, like
    every other writer: an unlocked overwrite racing a concurrent
    append would delete the appender's files mid-commit and leave a
    manifest referencing dead paths.
    """
    if mode != "overwrite":
        raise ValueError("write_clustered is overwrite-only; use append_clustered")
    be = cell_backend("s2")  # int64 Hilbert ids with the prefix property
    out = df.withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
    with table_lock(path):
        (
            out.repartitionByRange(files, F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.mode(mode)
            .parquet(path)
        )
        _write_manifest(path, level, schema_json=out.schema.json())


def _data_files(path: str) -> list[str]:
    return sorted(n for n in os.listdir(path) if n.endswith(".parquet"))


def _file_stats(path: str, names: list[str]) -> list[dict]:
    """Per-file [min,max] of the cell column from the parquet footers —
    the Iceberg manifest-entry analog."""
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(names):
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        # per-column [min,max] from the footers for every JSON-storable
        # leaf (the Iceberg column-stats analog): `min`/`max` stay the
        # CELL_COL bounds (the primary prune axis), `cols` carries the
        # rest for secondary pruning (e.g. key ranges in upsert)
        cols: dict = {}
        for idx, cname in enumerate(names):
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:  # empty file part
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None or not isinstance(lo, (int, float, str)):
                continue  # no stats, or a type JSON can't carry faithfully
            if isinstance(lo, float) and not (
                lo == lo and hi == hi  # NaN bounds are not bounds
            ):
                continue
            cols[cname] = [lo, hi]
        if CELL_COL not in cols:
            continue  # file with no rows carries no bounds and never matches
        clo, chi = cols.pop(CELL_COL)
        entries.append(
            {
                "file": name,
                "min": int(clo),
                "max": int(chi),
                "rows": md.num_rows,
                "cols": cols,
            }
        )
    return entries


def _col_range_keep(e: dict, col: str, lo, hi) -> bool:
    """May this manifest entry hold rows with ``col`` in [lo, hi]?
    Sound by construction: entries without stats for the column (legacy
    manifests, unsupported types) are always kept."""
    rng = e.get("cols", {}).get(col)
    if rng is None:
        return True
    return not (hi < rng[0] or lo > rng[1])


def _snap_file_in(path: str, snap_dir: str, snapshot_id: int) -> str:
    return os.path.join(path, snap_dir, f"snap-{int(snapshot_id):05d}.json")


def _snap_file(path: str, snapshot_id: int) -> str:
    return _snap_file_in(path, SNAP_DIR, snapshot_id)


def _versioned_commit(
    path: str,
    level: int,
    entries: list[dict],
    operation: str,
    manifest: str,
    snap_dir: str,
    extra_summary: dict | None = None,
    schema_json: str | None = None,
    inherit_schema: bool = True,
    deletes: list[dict] | None = None,
    branch: str | None = None,
) -> dict:
    """Snapshot-versioned manifest commit — the Iceberg snapshot analog,
    shared by the flat and spatio-temporal layouts (parameterized on
    their manifest/snapshot-dir names).

    The manifest is the table's source of truth: readers (and
    compaction's sweep) touch ONLY files it lists, so a data file not
    yet (or no longer) in the current manifest is invisible, never a
    correctness hazard.  Every commit additionally lands an IMMUTABLE
    copy of the new manifest under ``<snap_dir>/snap-<id>.json``, so the
    table carries its own lineage: ``load_manifest(path, snapshot_id=N)``
    time-travels any reader to state N, ``rollback_clustered`` restores
    it, and ``snapshots``/``snapshot_log_df`` expose the per-commit
    operation + file/row metrics (the Iceberg snapshot-log / metrics-
    table analog).

    Commit ordering (each step an atomic write):

    1. heal — if the CURRENT manifest has no snapshot file yet (legacy
       table, or a crash between steps 2 and 3 of ITS commit), write it,
       so history never loses the state being superseded;
    2. write the new snapshot file;
    3. ``os.replace`` the current-manifest pointer (the cut-over).

    A crash between 2 and 3 leaves a dangling snapshot at id N: the
    table still reads as its parent, and the NEXT commit reuses id N,
    overwriting the dangling file.  Until then sweeps retain the files
    it references — bounded waste, never damage.

    With ``branch`` set (the Iceberg branch-write / WAP-staging analog,
    see ``create_branch``), the commit's base is the BRANCH HEAD, step 3
    updates the branch ref instead of the current-manifest pointer, and
    the main table is untouched — staged state is invisible to every
    reader that doesn't name the branch until ``fast_forward_clustered``
    publishes it.  Snapshot ids are allocated globally (1 + the max over
    the main head and every branch head), so lineages interleaving in
    one ``<snap_dir>`` never collide; the dangling-reuse contract is
    preserved because a crashed commit's id is exactly the next global
    allocation until some commit lands.
    """
    main = None
    with contextlib.suppress(FileNotFoundError):
        main = _load_versioned(path, None, manifest, snap_dir)
    refs = _load_refs(path, snap_dir)
    if branch is not None:
        r = refs.get(branch)
        if r is None or r["type"] != "branch":
            kinds = {k: v["type"] for k, v in refs.items()}
            raise ValueError(
                f"cannot commit to {branch!r} on {path}: not a branch "
                f"(known refs: {kinds})"
            )
        cur = _load_versioned(path, int(r["snapshot_id"]), manifest, snap_dir)
    else:
        cur = main
    parent = int(cur.get("snapshot_id", 0)) if cur is not None else None
    os.makedirs(os.path.join(path, snap_dir), exist_ok=True)
    if main is not None:
        mid = int(main.get("snapshot_id", 0))
        if not os.path.exists(_snap_file_in(path, snap_dir, mid)):
            _atomic_json_write(_snap_file_in(path, snap_dir, mid), main)
    heads = [int(main.get("snapshot_id", 0))] if main is not None else [0]
    # every ref counts toward the allocation max, tags included: a tag
    # may legally pin a branch-lineage snapshot ABOVE all heads (it was
    # live when pinned), and after drop_branch that id must never be
    # reallocated — reuse would overwrite the tag-anchored snap-N.json
    # and silently repoint the tag at unrelated data.
    heads += [int(r2["snapshot_id"]) for r2 in refs.values()]
    sid = max([parent or 0] + heads) + 1
    prev_files = {e["file"] for e in cur["files"]} if cur is not None else set()
    new_files = {e["file"] for e in entries}
    # the table schema rides in the manifest (Iceberg metadata analog):
    # empty-result reads and all-zero-row tables need no data file on
    # disk to answer with the right columns. Commits that don't supply
    # one (append/compact) inherit the parent's; rollback restores the
    # TARGET snapshot's schema verbatim (inherit_schema=False), since
    # the current one may describe a later overwrite's shape.
    if schema_json is None and inherit_schema and cur is not None:
        schema_json = cur.get("schema")
    # pending merge-on-read delete files ride the manifest like data
    # files do.  Commits that don't pass a list inherit the parent's;
    # either way each entry's targets are PRUNED to files this commit
    # still lists — a rewritten/compacted file gets a new name, so its
    # pending deletes (already applied by the rewrite's delete-aware
    # scan) fall away here, and a full replace empties the list.
    if deletes is None and cur is not None:
        deletes = cur.get("deletes") or []
    pruned_dels = []
    for d in deletes or []:
        targets = [t for t in d["targets"] if t in new_files]
        if targets:
            pruned_dels.append({**d, "targets": targets})
    man = {
        "cell_col": CELL_COL,
        "index": "s2",
        "level": level,
        "schema": schema_json,
        "files": entries,
        "deletes": pruned_dels,
        "snapshot_id": sid,
        "parent_id": parent,
        "operation": operation,
        "committed_at": time.time(),
        "summary": {
            "n_files": len(entries),
            "n_rows": int(sum(e["rows"] for e in entries)),
            "added_files": len(new_files - prev_files),
            "removed_files": len(prev_files - new_files),
            "pending_delete_files": len(pruned_dels),
            "pending_delete_rows": int(
                sum(int(d["rows"]) for d in pruned_dels)
            ),
            **(extra_summary or {}),
        },
    }
    _atomic_json_write(_snap_file_in(path, snap_dir, sid), man)
    if branch is not None:
        # the branch's cut-over: advance the ref, never the manifest —
        # a crash before this line leaves a dangling snapshot exactly
        # like a crashed main commit (id reused next time)
        refs = _load_refs(path, snap_dir)
        refs[branch] = {"type": "branch", "snapshot_id": sid}
        _write_refs(path, snap_dir, refs)
    else:
        _atomic_json_write(os.path.join(path, manifest), man)
        _append_history(path, snap_dir, sid, operation, manifest=manifest)
    return man


HISTORY_FILE = "history.jsonl"


def _append_history(
    path: str, snap_dir: str, sid: int, event: str,
    manifest: str = MANIFEST,
) -> None:
    """One line per MADE-CURRENT event (the Iceberg ``.history`` table's
    unit): ordinary commits, rollbacks, and fast-forward publishes all
    change which snapshot the main table reads as, and this log records
    WHEN — distinct from each snapshot's own committed_at (a published
    branch head became current long after it was committed).  Appended
    under the caller's table lock, AFTER the manifest cut-over: a crash
    in between loses one history line, never table state (history_df
    backfills missing commits from the snapshot log).

    The FIRST append on a legacy table (predating the log) seeds the
    file from the existing snapshot chain — otherwise one post-upgrade
    commit would create a one-line log and the backfill path would
    never fire again, permanently hiding pre-upgrade history from the
    ``.history`` metadata table."""
    hist = os.path.join(path, snap_dir, HISTORY_FILE)
    seed: list[str] = []
    if not os.path.exists(hist):
        for m in _history_chain(path, manifest, snap_dir, None):
            msid = int(m.get("snapshot_id", 0))
            if msid == int(sid):
                continue  # the event being appended below
            seed.append(json.dumps({
                "made_current_at": m.get("committed_at"),
                "snapshot_id": msid,
                "event": m.get("operation", "overwrite"),
            }))
    line = json.dumps(
        {"made_current_at": time.time(), "snapshot_id": int(sid),
         "event": str(event)}
    )
    with open(hist, "a") as f:
        for s_ in seed:
            f.write(s_ + "\n")
        f.write(line + "\n")


def _history_rows(path: str, manifest: str, snap_dir: str) -> list[dict]:
    rows = []
    logged = True
    try:
        with open(os.path.join(path, snap_dir, HISTORY_FILE)) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    rows.append(json.loads(ln))
    except FileNotFoundError:
        logged = False
    if not logged:
        # legacy table (predates the log): synthesize made-current
        # events from the snapshot log — on a linear lineage each commit
        # became current when it was committed.  A table WITH a log is
        # never backfilled: a published branch's intermediate commits
        # are main history but were never individually current.
        for s_ in _snapshot_list(path, manifest, snap_dir):
            rows.append(
                {
                    "made_current_at": s_["committed_at"],
                    "snapshot_id": int(s_["snapshot_id"]),
                    "event": s_["operation"],
                }
            )
    rows.sort(key=lambda r: (r["made_current_at"] or 0, r["snapshot_id"]))
    chain = {
        int(m.get("snapshot_id", 0))
        for m in _history_chain(path, manifest, snap_dir, None)
    }
    for r in rows:
        r["is_current_ancestor"] = int(r["snapshot_id"]) in chain
    return rows


def _history_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [
            (
                float(r["made_current_at"]) if r["made_current_at"] else None,
                int(r["snapshot_id"]),
                str(r["event"]),
                bool(r["is_current_ancestor"]),
            )
            for r in rows
        ],
        "made_current_at double, snapshot_id int, event string, "
        "is_current_ancestor boolean",
    )


def history_df(spark: SparkSession, path: str) -> DataFrame:
    """The Iceberg ``.history`` metadata-table analog: every event that
    changed which snapshot the MAIN table reads as (commit, rollback,
    fast-forward publish), with when it became current and whether it is
    still reachable from the current state (false = expired out of the
    chain; note rollback here commits the target as NEW lineage, so a
    rolled-past commit remains an ancestor until expired — unlike
    Iceberg's pointer reset)."""
    return _history_df(spark, _history_rows(path, MANIFEST, SNAP_DIR))


def _write_manifest(
    path: str,
    level: int,
    entries: list[dict] | None = None,
    operation: str = "overwrite",
    extra_summary: dict | None = None,
    schema_json: str | None = None,
    deletes: list[dict] | None = None,
    branch: str | None = None,
) -> dict:
    """Flat-layout commit: see ``_versioned_commit``."""
    if entries is None:
        entries = _file_stats(path, _data_files(path))
    return _versioned_commit(
        path, level, entries, operation, MANIFEST, SNAP_DIR, extra_summary,
        schema_json=schema_json, deletes=deletes, branch=branch,
    )


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


# parsed-manifest cache: keyed by the manifest file's identity
# (path, mtime_ns, size) — os.replace() commits give every new manifest
# a fresh identity, so stale entries can't be served; bounded FIFO so a
# long-lived process scanning many tables can't grow without bound.
_MANIFEST_CACHE: dict = {}
_MANIFEST_CACHE_CAP = 64


def _load_versioned(
    path: str, snapshot_id: int | str | None, manifest: str, snap_dir: str
) -> dict:
    mpath = os.path.join(path, manifest)
    st = os.stat(mpath)  # FileNotFoundError propagates, as before
    ck = (os.path.abspath(mpath), st.st_mtime_ns, st.st_size)
    cur = _MANIFEST_CACHE.get(ck)
    if cur is None:
        with open(mpath) as f:
            cur = json.load(f)
        if len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_CAP:
            _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
        _MANIFEST_CACHE[ck] = cur
    if snapshot_id is None:
        return cur
    if isinstance(snapshot_id, str) and not snapshot_id.lstrip("-").isdigit():
        # a named ref (tag or branch): resolve to its pinned/head id
        refs = _load_refs(path, snap_dir)
        if snapshot_id not in refs:
            raise ValueError(
                f"unknown ref {snapshot_id!r} on {path}; "
                f"known refs: {sorted(refs)}"
            )
        snapshot_id = refs[snapshot_id]["snapshot_id"]
    sid = int(snapshot_id)
    if int(cur.get("snapshot_id", 0)) == sid:
        return cur
    try:
        with open(_snap_file_in(path, snap_dir, sid)) as f:
            return json.load(f)
    except FileNotFoundError:
        known = [
            s["snapshot_id"] for s in _snapshot_list(path, manifest, snap_dir)
        ]
        raise ValueError(
            f"snapshot {sid} of {path} does not exist or was expired; "
            f"available snapshots: {known}"
        ) from None


def load_manifest(
    path: str,
    snapshot_id: int | str | None = None,
    as_of: float | None = None,
) -> dict:
    """Current manifest, or — with ``snapshot_id`` — the immutable
    manifest of that snapshot (time travel).  A non-numeric string is
    resolved as a ref name — a tag's pinned snapshot or a branch's head
    (see ``create_tag`` / ``create_branch``); every reader that
    forwards ``snapshot_id`` here accepts any of these forms.
    ``as_of`` (a unix timestamp, exclusive with ``snapshot_id``) travels
    to the snapshot that was current AT that time — the Iceberg
    ``FOR SYSTEM_TIME AS OF`` analog (see ``snapshot_as_of``).
    Unknown/expired ids and unknown refs raise ValueError naming the
    surviving range."""
    if as_of is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of, not both")
        snapshot_id = _as_of_versioned(path, as_of, MANIFEST, SNAP_DIR)
    return _load_versioned(path, snapshot_id, MANIFEST, SNAP_DIR)


def _as_of_versioned(
    path: str, ts: float, manifest: str, snap_dir: str
) -> int:
    """The snapshot id that was the table's state at unix time ``ts``:
    the newest MAIN-history MADE-CURRENT event with ``made_current_at``
    ≤ ts (the Iceberg snapshot-log semantics).  Made-current time, not
    ``committed_at``: a branch commit staged at t1 and published by
    ``fast_forward_clustered`` at t2 was NOT the table's state in
    (t1, t2) — readers at that time saw the pre-publish main head —
    so resolving by commit time would rewrite observable history.
    ``_history_rows`` backfills made-current events from commit times
    for legacy tables that predate the history log (linear lineage:
    each commit became current when committed), so those keep the old
    behavior.  Raises if ts precedes the earliest retained state, or
    if the state current at ts has since been expired."""
    ts = float(ts)
    rows = _history_rows(path, manifest, snap_dir)
    best = None
    for r in rows:
        at = r.get("made_current_at")
        if at is not None and float(at) <= ts:
            best = r
    if best is None:
        lo = rows[0].get("made_current_at") if rows else None
        raise ValueError(
            f"no snapshot of {path} existed at {ts}: the earliest "
            f"recorded state "
            f"{rows[0].get('snapshot_id') if rows else '?'} became "
            f"current at {lo} (earlier history was expired or the "
            "table is younger than ts)"
        )
    sid = int(best["snapshot_id"])
    cur = _load_versioned(path, None, manifest, snap_dir)
    if sid != int(cur.get("snapshot_id", 0)) and not os.path.exists(
        _snap_file_in(path, snap_dir, sid)
    ):
        raise ValueError(
            f"the state of {path} at {ts} (snapshot {sid}) has been "
            "expired; only retained snapshots are time-travelable "
            "(same failure mode as Iceberg)"
        )
    return sid


def snapshot_as_of(path: str, ts: float) -> int:
    """Resolve a unix timestamp to the snapshot id current at that time
    (the Iceberg timestamp-travel analog).  Pass the result as
    ``snapshot_id=`` to any reader: ``clustered_radius_query(spark, t,
    ..., snapshot_id=snapshot_as_of(t, ts))`` — or use
    ``load_manifest(path, as_of=ts)`` directly."""
    return _as_of_versioned(path, ts, MANIFEST, SNAP_DIR)


def _history_chain(
    path: str,
    manifest: str,
    snap_dir: str,
    head: int | str | None = None,
) -> list[dict]:
    """The snapshot MANIFESTS reachable from ``head`` (default: the
    current manifest) by following parent pointers, oldest first.

    This walk — not an id scan — is what defines a lineage's history:
    with branches, snapshot ids from different lineages interleave in
    one ``<snap_dir>``, so "id ≤ head" would claim another branch's
    commits.  The walk stops where a parent's snapshot file is missing
    (expired history, or a legacy pre-snapshot manifest): lineage
    truncates where history does.  Dangling snapshots (a crashed
    commit's file, unreachable from any head) are excluded naturally.
    """
    cur = _load_versioned(path, head, manifest, snap_dir)
    out = [cur]
    seen = {int(cur.get("snapshot_id", 0))}
    parent = cur.get("parent_id")
    while parent is not None and int(parent) not in seen:
        try:
            with open(_snap_file_in(path, snap_dir, int(parent))) as f:
                m = json.load(f)
        except FileNotFoundError:
            break
        out.append(m)
        seen.add(int(parent))
        parent = m.get("parent_id")
    out.reverse()
    return out


def _snapshot_list(
    path: str, manifest: str, snap_dir: str, head: int | str | None = None
) -> list[dict]:
    mans = _history_chain(path, manifest, snap_dir, head)
    if head is None:
        # tag-anchored snapshots survive expire even when the chain
        # between them and the head was reclaimed (a gap the walk can't
        # cross) — they are still readable history, so list them.
        have = {int(m.get("snapshot_id", 0)) for m in mans}
        for r in _load_refs(path, snap_dir).values():
            sid = int(r["snapshot_id"])
            if r["type"] == "tag" and sid not in have:
                with contextlib.suppress(FileNotFoundError):
                    with open(_snap_file_in(path, snap_dir, sid)) as f:
                        mans.append(json.load(f))
                    have.add(sid)
    return sorted(
        (
            {
                "snapshot_id": int(m.get("snapshot_id", 0)),
                "parent_id": m.get("parent_id"),
                "operation": m.get("operation", "overwrite"),
                "committed_at": m.get("committed_at"),
                "summary": m.get("summary", {}),
            }
            for m in mans
        ),
        key=lambda s: s["snapshot_id"],
    )


def snapshots(path: str) -> list[dict]:
    """The table's snapshot log (lineage), oldest first: one dict per
    committed snapshot with id, parent, operation, commit time, and the
    file/row summary.  Dangling snapshots (a crash between the snapshot
    write and the manifest cut-over — ids above the current manifest's)
    are not part of table history and are excluded."""
    return _snapshot_list(path, MANIFEST, SNAP_DIR)


def _log_df(spark: SparkSession, snaps: list[dict]) -> DataFrame:
    rows = [
        (
            s["snapshot_id"],
            s["parent_id"],
            s["operation"],
            float(s["committed_at"]) if s["committed_at"] is not None else None,
            int(s["summary"].get("n_files", 0)),
            int(s["summary"].get("n_rows", 0)),
            int(s["summary"].get("added_files", 0)),
            int(s["summary"].get("removed_files", 0)),
        )
        for s in snaps
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id int, parent_id int, operation string, committed_at double, "
        "n_files int, n_rows bigint, added_files int, removed_files int",
    )


def snapshot_log_df(spark: SparkSession, path: str) -> DataFrame:
    """The snapshot log as a DataFrame — the queryable metrics/lineage
    table the north rule asks checkpointed pipelines to carry."""
    return _log_df(spark, snapshots(path))


# --- named refs (tags + branches) -------------------------------------
#
# The Iceberg refs analog, stored beside the snapshot files
# (``<snap_dir>/refs.json``, atomic commits under the table lock):
#
# - a TAG is a named, immutable pointer to a snapshot id.  Every reader
#   that takes ``snapshot_id`` also accepts a ref NAME (resolved in
#   ``_load_versioned``), and ``expire_snapshots`` retains tagged
#   snapshots — and the data files they reference — regardless of
#   ``keep_last``, so a tag is a retention anchor ("audit-2026Q3") as
#   well as a readable name.
# - a BRANCH is a named, WRITABLE head: ``append_clustered`` /
#   ``delete_clustered`` / ``upsert_clustered`` with ``branch=`` commit
#   against it (new snapshots whose parent chain forks from where the
#   branch was created) without moving the main table, readers audit it
#   by name (``snapshot_id="staging"``), and
#   ``fast_forward_clustered`` publishes it — the Iceberg
#   write-audit-publish (WAP) flow.  Lineages share one id sequence
#   (globally allocated in ``_versioned_commit``) and one directory;
#   expire retains every snapshot a branch can reach, so drop stale
#   branches to release history.  Merging diverged lineages is out of
#   scope (fast-forward requires main to be an ancestor of the branch
#   head); ``rollback_clustered`` covers the fork-back use case.

REFS_FILE = "refs.json"


def _refs_path(path: str, snap_dir: str) -> str:
    return os.path.join(path, snap_dir, REFS_FILE)


def _load_refs(path: str, snap_dir: str) -> dict[str, dict]:
    """Normalized refs: ``{name: {"type": "tag"|"branch", "snapshot_id": N}}``.
    Legacy files (round-4 tags were stored as plain ints) read as tags,
    so every existing table keeps working unmodified."""
    try:
        with open(_refs_path(path, snap_dir)) as f:
            raw = json.load(f)
    except FileNotFoundError:
        return {}
    out: dict[str, dict] = {}
    for k, v in raw.items():
        if isinstance(v, dict):
            out[k] = {
                "type": str(v.get("type", "tag")),
                "snapshot_id": int(v["snapshot_id"]),
            }
        else:
            out[k] = {"type": "tag", "snapshot_id": int(v)}
    return out


def _write_refs(path: str, snap_dir: str, refs: dict[str, dict]) -> None:
    """Atomic refs commit.  Tags serialize as plain ints (the legacy
    on-disk shape, so a round-4 reader of this table still resolves
    them); branches need the typed form."""
    os.makedirs(os.path.join(path, snap_dir), exist_ok=True)
    raw = {
        k: (v["snapshot_id"] if v["type"] == "tag" else v)
        for k, v in refs.items()
    }
    _atomic_json_write(_refs_path(path, snap_dir), raw)


def _live_ids(path: str, manifest: str, snap_dir: str) -> set[int]:
    """Every snapshot id that is readable history: the main chain, each
    branch's chain, and tag-pinned snapshots.  A dangling snapshot file
    (crashed commit, unreachable from any head) is NOT here — its id
    will be reused by the next commit, so nothing may pin it."""
    refs = _load_refs(path, snap_dir)
    ids = {
        s["snapshot_id"] for s in _snapshot_list(path, manifest, snap_dir)
    }
    for r in refs.values():
        if r["type"] == "branch":
            ids.update(
                int(m.get("snapshot_id", 0))
                for m in _history_chain(
                    path, manifest, snap_dir, int(r["snapshot_id"])
                )
            )
    return ids


def _set_ref_versioned(
    path: str,
    name: str,
    snapshot_id: int | None,
    manifest: str,
    snap_dir: str,
    lockfile: str,
    ref_type: str = "tag",
) -> int:
    name = str(name)
    if not name or name.lstrip("-").isdigit():
        raise ValueError(
            f"invalid ref name {name!r}: must be non-empty and not "
            "purely numeric (numeric strings read as snapshot ids)"
        )
    with table_lock(path, lockfile):
        cur = _load_versioned(path, None, manifest, snap_dir)
        cid = int(cur.get("snapshot_id", 0))
        if snapshot_id is None:
            snapshot_id = cid
        else:
            # must name an existing (retained, reachable) snapshot — a
            # dangling snapshot file from a crashed commit is not
            # history and its id will be reused by the next commit
            live = _live_ids(path, manifest, snap_dir)
            if int(snapshot_id) not in live:
                raise ValueError(
                    f"snapshot {int(snapshot_id)} of {path} does not exist "
                    f"(current is {cid}); available snapshots: "
                    f"{sorted(live)}"
                )
        refs = _load_refs(path, snap_dir)
        old = refs.get(name)
        if old is not None and old["type"] != ref_type:
            raise ValueError(
                f"ref {name!r} on {path} is a {old['type']}, not a "
                f"{ref_type}; drop it first to reuse the name"
            )
        if int(snapshot_id) == cid and not os.path.exists(
            _snap_file_in(path, snap_dir, cid)
        ):
            # pinning the head of a legacy (pre-snapshot) table: land
            # its snapshot file now so the ref survives the next commit
            os.makedirs(os.path.join(path, snap_dir), exist_ok=True)
            _atomic_json_write(_snap_file_in(path, snap_dir, cid), cur)
        refs[name] = {"type": ref_type, "snapshot_id": int(snapshot_id)}
        _write_refs(path, snap_dir, refs)
        return int(snapshot_id)


def _drop_ref_versioned(
    path: str, name: str, snap_dir: str, lockfile: str
) -> int:
    with table_lock(path, lockfile):
        refs = _load_refs(path, snap_dir)
        if name not in refs:
            raise ValueError(
                f"unknown ref {name!r} on {path}; known refs: {sorted(refs)}"
            )
        sid = int(refs.pop(name)["snapshot_id"])
        _write_refs(path, snap_dir, refs)
        return sid


def create_tag(path: str, name: str, snapshot_id: int | None = None) -> int:
    """Tag a snapshot (default: the current one) with ``name``.  The tag
    is readable everywhere ``snapshot_id`` is (``load_manifest(path,
    "name")``, every query surface) and anchors the snapshot — and the
    files it references — against ``expire_snapshots`` until dropped.
    Returns the pinned snapshot id."""
    return _set_ref_versioned(path, name, snapshot_id, MANIFEST, SNAP_DIR, LOCKFILE)


def drop_tag(path: str, name: str) -> int:
    """Remove a tag; its snapshot becomes expirable again.  Returns the
    snapshot id the tag pointed at."""
    return _drop_ref_versioned(path, name, SNAP_DIR, LOCKFILE)


def table_refs(path: str) -> dict[str, int]:
    """All named refs on the table: ``{name: snapshot_id}`` (a branch
    reports its current head; see ``refs_df`` for types)."""
    return {
        k: int(v["snapshot_id"]) for k, v in _load_refs(path, SNAP_DIR).items()
    }


def refs_df(spark: SparkSession, path: str) -> DataFrame:
    """The refs as a DataFrame — the Iceberg ``.refs`` metadata-table
    analog: tags (immutable pins) and branches (writable heads)."""
    rows = [
        (k, int(v["snapshot_id"]), v["type"])
        for k, v in sorted(_load_refs(path, SNAP_DIR).items())
    ]
    return spark.createDataFrame(
        rows, "name string, snapshot_id int, type string"
    )


def create_branch(path: str, name: str, snapshot_id: int | None = None) -> int:
    """Create a writable branch at ``snapshot_id`` (default: the current
    head) — the Iceberg branch / WAP-staging analog.  Commits with
    ``branch=name`` advance only this ref; readers audit the staged
    state with ``snapshot_id=name`` on any query surface; and
    ``fast_forward_clustered(path, name)`` publishes it to the main
    table.  While the branch exists, every snapshot it can reach — and
    the data files they list — survives ``expire_snapshots``.  Returns
    the snapshot id the branch starts at."""
    return _set_ref_versioned(
        path, name, snapshot_id, MANIFEST, SNAP_DIR, LOCKFILE,
        ref_type="branch",
    )


def drop_branch(path: str, name: str) -> int:
    """Remove a branch; its unpublished commits become dangling history
    (reclaimed by ``expire_snapshots``).  Returns the head it was at."""
    return _drop_branch_versioned(path, name, SNAP_DIR, LOCKFILE)


def _drop_branch_versioned(
    path: str, name: str, snap_dir: str, lockfile: str
) -> int:
    with table_lock(path, lockfile):
        refs = _load_refs(path, snap_dir)
        if refs.get(name, {}).get("type") == "tag":
            raise ValueError(f"ref {name!r} on {path} is a tag; use drop_tag")
    return _drop_ref_versioned(path, name, snap_dir, lockfile)


def fast_forward_clustered(path: str, name: str) -> dict:
    """Publish a branch: fast-forward the main table to the branch head
    (the Iceberg fast-forward / WAP publish analog).

    Requires the main head to be an ANCESTOR of the branch head — i.e.
    nothing was committed to main since the branch forked; otherwise the
    lineages diverged and this raises (merging is out of scope — rebase
    by re-staging on a fresh branch).  The publish itself is one atomic
    manifest cut-over to the branch head's already-committed snapshot:
    every staged commit becomes main history in one step, and readers
    switch from the pre-publish state to the published one atomically.
    The branch ref is left pointing at the (now published) head; drop it
    when done.  Returns ``{"published": head, "from": old_main_head}``.
    A no-op (branch head == main head) returns the same shape."""
    return _fast_forward_versioned(path, name, MANIFEST, SNAP_DIR, LOCKFILE)


def _fast_forward_versioned(
    path: str, name: str, manifest: str, snap_dir: str, lockfile: str
) -> dict:
    with table_lock(path, lockfile):
        refs = _load_refs(path, snap_dir)
        r = refs.get(name)
        if r is None or r["type"] != "branch":
            kinds = {k: v["type"] for k, v in refs.items()}
            raise ValueError(
                f"cannot fast-forward to {name!r} on {path}: not a "
                f"branch (known refs: {kinds})"
            )
        head = int(r["snapshot_id"])
        target = _load_versioned(path, head, manifest, snap_dir)
        main = _load_versioned(path, None, manifest, snap_dir)
        mid = int(main.get("snapshot_id", 0))
        if head == mid:
            return {"published": head, "from": mid}
        chain_ids = {
            int(m.get("snapshot_id", 0))
            for m in _history_chain(path, manifest, snap_dir, head)
        }
        if mid not in chain_ids:
            raise ValueError(
                f"cannot fast-forward {path} to branch {name!r} "
                f"(head {head}): main advanced to snapshot {mid}, which "
                "is not an ancestor of the branch head — the lineages "
                "diverged (re-stage on a fresh branch to publish)"
            )
        if not os.path.exists(_snap_file_in(path, snap_dir, mid)):
            _atomic_json_write(_snap_file_in(path, snap_dir, mid), main)
        _atomic_json_write(os.path.join(path, manifest), target)
        _append_history(
            path, snap_dir, head, f"fast-forward:{name}", manifest=manifest
        )
        return {"published": head, "from": mid}


def cherry_pick_clustered(path: str, snapshot_id: int | str) -> dict:
    """Re-apply ONE append-only commit from a diverged lineage onto the
    main head — the Iceberg cherry-pick analog, and the release valve
    for the one WAP flow ``fast_forward_clustered`` refuses (main
    advanced after the branch forked, so the lineages diverged).

    Only APPEND commits are eligible: the target snapshot must add data
    files relative to ITS OWN parent and remove none, and must
    introduce no new pending (merge-on-read) deletes — row-replacing
    operations (overwrite/compact/delete/upsert/rollback) depend on the
    exact file set they replaced, which main no longer has, so
    re-applying them would silently drop or resurrect rows; they raise
    instead.  The added files are committed onto main as a FRESH
    snapshot (new id, parent = main head, operation
    ``cherry-pick:<sid>``); the files themselves are shared, not
    copied (same directory, both lineages reference them).  Schemas
    merge under the add-column evolution rules.

    ``snapshot_id`` may be an id or a ref name (e.g. a diverged
    branch's head).  Returns the new main manifest."""
    with table_lock(path):
        target = _load_versioned(path, snapshot_id, MANIFEST, SNAP_DIR)
        sid = int(target.get("snapshot_id", 0))
        if target.get("parent_id") is None:
            raise ValueError(
                f"cannot cherry-pick snapshot {sid} of {path}: it has no "
                "parent (an initial overwrite is not an append)"
            )
        try:
            parent = _load_versioned(
                path, int(target["parent_id"]), MANIFEST, SNAP_DIR
            )
        except ValueError:
            raise ValueError(
                f"cannot cherry-pick snapshot {sid} of {path}: its parent "
                f"{target['parent_id']} was expired, so the commit's own "
                "added-file set can no longer be certified"
            )
        pfiles = {e["file"] for e in parent["files"]}
        tfiles = {e["file"] for e in target["files"]}
        removed = pfiles - tfiles
        if removed:
            raise ValueError(
                f"cannot cherry-pick snapshot {sid} of {path}: it removed "
                f"{len(removed)} file(s) relative to its parent — only "
                "append-only commits can be re-applied onto a diverged "
                "main (row-replacing ops depend on the replaced file set)"
            )
        pdel = {
            (d["file"], tuple(d["targets"])) for d in parent.get("deletes") or []
        }
        newdel = [
            d
            for d in target.get("deletes") or []
            if (d["file"], tuple(d["targets"])) not in pdel
        ]
        if newdel:
            raise ValueError(
                f"cannot cherry-pick snapshot {sid} of {path}: it "
                f"introduced {len(newdel)} pending delete file(s) — "
                "merge-on-read deletes are row-replacing"
            )
        added = [e for e in target["files"] if e["file"] not in pfiles]
        if not added:
            raise ValueError(
                f"cannot cherry-pick snapshot {sid} of {path}: it added "
                "no files (nothing to re-apply)"
            )
        main = _load_versioned(path, None, MANIFEST, SNAP_DIR)
        dup = {e["file"] for e in main["files"]} & {e["file"] for e in added}
        if dup:
            raise ValueError(
                f"cannot cherry-pick snapshot {sid} of {path}: main "
                f"already references {sorted(dup)[:3]} (was this commit "
                "already published or picked?)"
            )
        schema_json = None
        old_schema = _manifest_schema(main)
        t_schema = _manifest_schema(target)
        if old_schema is not None and t_schema is not None:
            merged, _ = _merge_schemas(old_schema, t_schema)
            schema_json = merged.json()
        return _write_manifest(
            path,
            int(main["level"]),
            main["files"] + added,
            operation=f"cherry-pick:{sid}",
            schema_json=schema_json,
            extra_summary={"cherry_picked_from": sid},
        )


def _added_map(
    path: str, manifest: str, snap_dir: str, upto: int | None = None
) -> dict[str, int]:
    """``file -> snapshot id that FIRST listed it`` — per-file lineage,
    walked oldest-first over the retained snapshot files (the Iceberg
    ``added_snapshot_id`` analog).  After ``expire_snapshots`` the walk
    starts at the earliest retained snapshot, so a file added before
    that reports the earliest snapshot that still references it —
    lineage truncates where history does, it never invents ids.

    ``upto`` names the lineage HEAD to walk from (a snapshot id or ref
    name) — the chain walk, not an id filter, keeps another branch's
    interleaved commits out of this lineage's answer."""
    added: dict[str, int] = {}
    for m in _history_chain(path, manifest, snap_dir, upto):
        sid = int(m.get("snapshot_id", 0))
        for e in m["files"]:
            added.setdefault(e["file"], sid)
    return added


def _remove_orphans_versioned(
    path: str, manifest: str, snap_dir: str, data_files: list[str]
) -> dict:
    ref = _referenced_in(path, manifest, snap_dir)
    removed = [n for n in data_files if n not in ref]
    for n in removed:
        os.remove(os.path.join(path, n))
    return {
        "removed_files": removed,
        "removed_delete_files": _sweep_delete_dir(path, manifest, snap_dir),
    }


def remove_orphan_files(path: str) -> dict:
    """Standalone maintenance sweep (the Iceberg remove-orphan-files
    analog): delete data files and MOR delete files that NO snapshot —
    current, historical, or dangling — references.  Such files are
    crash leftovers (a writer that died between its data write and its
    manifest commit, whose id was then reused); they are invisible to
    every reader, so unlike ``expire_snapshots`` this reclaims disk
    without touching readable history.  Safe against in-flight writers
    because every writer holds ``table_lock`` across its data write AND
    its commit, and this sweep takes the same lock."""
    with table_lock(path):
        return _remove_orphans_versioned(path, MANIFEST, SNAP_DIR, _data_files(path))


def _referenced_in(path: str, manifest: str, snap_dir: str) -> set[str]:
    """Every data file referenced by the current manifest or ANY
    snapshot file on disk (dangling ones included — retaining is always
    safe).  The sweep complement of this set is garbage: crash orphans
    and expired history."""
    ref = {e["file"] for e in _load_versioned(path, None, manifest, snap_dir)["files"]}
    sd = os.path.join(path, snap_dir)
    if os.path.isdir(sd):
        for n in os.listdir(sd):
            if n.startswith("snap-") and n.endswith(".json"):
                with open(os.path.join(sd, n)) as f:
                    ref.update(e["file"] for e in json.load(f)["files"])
    return ref


def _referenced_files(path: str) -> set[str]:
    return _referenced_in(path, MANIFEST, SNAP_DIR)


def _referenced_delete_files(path: str, manifest: str, snap_dir: str) -> set[str]:
    """Every MOR delete file referenced by the current manifest or any
    snapshot file on disk — the sweep-retention set for ``_deletes/``
    (mirrors ``_referenced_in`` for data files)."""
    cur = _load_versioned(path, None, manifest, snap_dir)
    ref = {d["file"] for d in (cur.get("deletes") or [])}
    sd = os.path.join(path, snap_dir)
    if os.path.isdir(sd):
        for n in os.listdir(sd):
            if n.startswith("snap-") and n.endswith(".json"):
                with open(os.path.join(sd, n)) as f:
                    ref.update(
                        d["file"] for d in (json.load(f).get("deletes") or [])
                    )
    return ref


def _sweep_delete_dir(path: str, manifest: str, snap_dir: str) -> list[str]:
    """Remove every MOR delete file under ``_deletes/`` that NO retained
    snapshot references (applied-and-expired history, or crash orphans
    from a delete that died before its commit)."""
    import shutil

    dd = os.path.join(path, DELETE_DIR)
    if not os.path.isdir(dd):
        return []
    ref = _referenced_delete_files(path, manifest, snap_dir)
    removed = []
    for n in os.listdir(dd):
        rel = os.path.join(DELETE_DIR, n)
        if rel not in ref:
            shutil.rmtree(os.path.join(dd, n), ignore_errors=True)
            removed.append(rel)
    return removed


def _rollback_versioned(
    path: str, snapshot_id: int, manifest: str, snap_dir: str
) -> dict:
    target = _load_versioned(path, snapshot_id, manifest, snap_dir)
    missing = [
        e["file"]
        for e in target["files"]
        if not os.path.exists(os.path.join(path, e["file"]))
    ] + [
        d["file"]
        for d in (target.get("deletes") or [])
        if not os.path.exists(os.path.join(path, d["file"]))
    ]
    if missing:
        raise ValueError(
            f"cannot roll back {path} to snapshot {snapshot_id}: "
            f"{len(missing)} data files were expired (first: {missing[0]})"
        )
    return _versioned_commit(
        path,
        int(target["level"]),
        target["files"],
        "rollback",
        manifest,
        snap_dir,
        extra_summary={"rolled_back_to": int(snapshot_id)},
        schema_json=target.get("schema"),
        inherit_schema=False,
        deletes=target.get("deletes") or [],
    )


def rollback_clustered(path: str, snapshot_id: int) -> dict:
    """Restore the table to ``snapshot_id`` — Iceberg-style rollback: a
    NEW snapshot whose file list is the target's, so the rollback itself
    is in the lineage and is itself revertible.  Requires the target's
    data files to still exist (i.e. not reclaimed by
    ``expire_snapshots``)."""
    with table_lock(path):
        return _rollback_versioned(path, snapshot_id, MANIFEST, SNAP_DIR)


def _expire_versioned(
    path: str,
    keep_last: int,
    manifest: str,
    snap_dir: str,
    data_files: list[str],
    older_than: float | None = None,
) -> dict:
    cur = _load_versioned(path, None, manifest, snap_dir)
    cid = int(cur.get("snapshot_id", 0))
    ids = [s["snapshot_id"] for s in _snapshot_list(path, manifest, snap_dir)]
    refs = _load_refs(path, snap_dir)
    # tagged snapshots are retention anchors: never expired (nor their
    # files swept) while the tag exists, regardless of keep_last; a
    # branch anchors its ENTIRE reachable chain (fast-forward must be
    # able to publish it) — drop stale branches to release history
    anchored = {
        int(r["snapshot_id"]) for r in refs.values() if r["type"] == "tag"
    }
    for r in refs.values():
        if r["type"] == "branch":
            anchored.update(
                int(m.get("snapshot_id", 0))
                for m in _history_chain(
                    path, manifest, snap_dir, int(r["snapshot_id"])
                )
            )
    retain = set(sorted(ids)[-max(int(keep_last), 1):]) | {cid} | anchored
    expired = []
    sd = os.path.join(path, snap_dir)
    on_disk = (
        [
            int(n[5:-5])
            for n in os.listdir(sd)
            if n.startswith("snap-") and n.endswith(".json")
        ]
        if os.path.isdir(sd)
        else []
    )
    # sweep over every snapshot FILE, not just main history: abandoned
    # branch commits (ref dropped) and dangling crashed commits are
    # unreachable history — this is the operation that reclaims them
    for sid in on_disk:
        if sid in retain:
            continue
        if older_than is not None:
            # age-based retention (the Iceberg older_than analog): a
            # snapshot committed at/after the horizon survives this
            # sweep even when keep_last would have dropped it
            try:
                with open(_snap_file_in(path, snap_dir, sid)) as f:
                    at = json.load(f).get("committed_at")
            except FileNotFoundError:
                continue
            if at is not None and float(at) >= float(older_than):
                continue
        with contextlib.suppress(FileNotFoundError):
            os.remove(_snap_file_in(path, snap_dir, sid))
        expired.append(sid)
    ref = _referenced_in(path, manifest, snap_dir)
    removed = [n for n in data_files if n not in ref]
    for n in removed:
        os.remove(os.path.join(path, n))
    removed += _sweep_delete_dir(path, manifest, snap_dir)
    return {"expired_snapshots": expired, "removed_files": removed}


def expire_snapshots(
    path: str, keep_last: int = 2, older_than: float | None = None
) -> dict:
    """Reclaim history: drop all but the newest ``keep_last`` snapshots
    (the current one is always retained), then delete every data file no
    retained snapshot references — the Iceberg expire-snapshots +
    orphan-cleanup analog, and the only operation that ever removes a
    file a previous snapshot could read.  ``older_than`` (unix time)
    additionally retains every snapshot committed at/after that horizon
    — the age-based retention contract (`expire_snapshots(older_than=
    now - 7*86400)` keeps a week of time travel regardless of commit
    volume); tags/branches anchor as always."""
    with table_lock(path):
        return _expire_versioned(
            path, keep_last, MANIFEST, SNAP_DIR, _data_files(path),
            older_than=older_than,
        )


def append_clustered(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    files: int = 4,
    branch: str | None = None,
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

    Add-column schema evolution: a batch may carry NEW columns (the
    commit's schema grows, pre-evolution files read as NULL in them —
    see ``_merge_schemas``) or OMIT existing ones (its rows read as
    NULL there); a same-name type change is an error.

    With ``branch=`` the append STAGES onto that branch (base = branch
    head, commit advances only the branch ref — the WAP write step);
    the main table and its readers are untouched until
    ``fast_forward_clustered`` publishes.
    """
    with table_lock(path):
        man = load_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        pre = set(_data_files(path))
        be = cell_backend("s2")
        out = df.withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
        old_schema = _manifest_schema(man)
        schema_json = None
        if old_schema is not None:
            merged, _ = _merge_schemas(old_schema, out.schema)
            schema_json = merged.json()
        (
            out.repartitionByRange(files, F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.mode("append")
            .parquet(path)
        )
        new = [n for n in _data_files(path) if n not in pre]
        _write_manifest(
            path,
            level,
            man["files"] + _file_stats(path, new),
            operation="append",
            schema_json=schema_json,
            branch=branch,
        )


def compact_clustered(
    spark: SparkSession,
    path: str,
    files: int = 16,
    level: int | None = None,
    lon: str = "lon",
    lat: str = "lat",
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
    3. sweep every data file NO retained snapshot references — crash
       orphans and already-expired history.  The superseded run itself
       stays on disk as long as a snapshot lists it (snapshot
       isolation: a reader that planned against the pre-compaction
       snapshot still finds its files); ``expire_snapshots`` is what
       reclaims that history.

    A query at any crash point returns exactly the same rows; the only
    recoverable waste is orphaned disk, reclaimed by the next sweep.
    Holds ``table_lock`` end to end (same single-writer invariant as
    append).

    Passing ``level`` RE-CLUSTERS the table at a new cell level — the
    Iceberg partition-spec-evolution analog, as one snapshot commit:
    the run is re-encoded from ``lon``/``lat`` at the new level and the
    manifest's level changes with the same cut-over, so every reader
    plans covers against the level of the snapshot it reads (a
    time-traveled query still prunes with the OLD level over the OLD
    files)."""
    with table_lock(path):
        man = load_manifest(path)
        cur_level = int(man["level"])
        new_level = cur_level if level is None else int(level)
        listed = [e["file"] for e in man["files"]]
        if listed:
            # manifest-schema read: compaction MATERIALIZES evolved
            # columns (pre-evolution files rewrite with explicit NULLs)
            # AND pending MOR deletes (the delete-aware scan drops their
            # rows; the rewritten files get new names, so the commit's
            # target pruning retires the delete entries — the Iceberg
            # rewrite-data-files contract)
            cur = _read_files(spark, path, man, listed)
            if new_level != cur_level:
                be = cell_backend("s2")
                cur = cur.drop(CELL_COL).withColumn(
                    CELL_COL, be.udf(new_level)(F.col(lat), F.col(lon))
                )
            pre = set(_data_files(path))
            (
                cur.repartitionByRange(files, F.col(CELL_COL))
                .sortWithinPartitions(CELL_COL)
                .write.mode("append")
                .parquet(path)
            )
            new = [n for n in _data_files(path) if n not in pre]
            _write_manifest(
                path, new_level, _file_stats(path, new), operation="replace"
            )
        elif new_level != cur_level:  # empty table: metadata-only change
            _write_manifest(path, new_level, [], operation="replace")
        keep = _referenced_files(path)
        for n in _data_files(path):
            if n not in keep:
                os.remove(os.path.join(path, n))
        _sweep_delete_dir(path, MANIFEST, SNAP_DIR)


def compaction_advice(
    path: str,
    overlap_threshold: float = 2.0,
    delete_tax_threshold: float = 0.05,
    small_file_fraction: float = 0.5,
    target_rows_per_file: int | None = None,
) -> dict:
    """Manifest-only compaction scheduler (no data file is opened):
    reads the same stats every scan plans with and answers WHETHER a
    ``compact_clustered`` is worth its rewrite cost, and at what file
    count — the small-file / delete-tax advisor for the periodic
    maintenance job log-structured tables need at scale.

    Three taxes, each measured from the manifest:

    - **overlap factor** — sum of per-file cell-range spans over the
      union span.  A freshly compacted table's ranges are disjoint
      (~1.0); each append layers another full-width run on top, so a
      range query must read ~overlap_factor files instead of the one
      the clustering promises.  Advise past ``overlap_threshold``.
    - **delete tax** — pending merge-on-read delete rows as a fraction
      of table rows: every scan pays an anti-join this size until a
      rewrite retires it (the measured MOR read-tax recovery is
      0.62 -> 0.21 s, BENCH.md).  Advise past ``delete_tax_threshold``.
    - **small files** — fraction of files under 1/4 of the mean file's
      rows: per-file scheduling and footer overhead dominates tiny
      files.  Advise past ``small_file_fraction``.

    Returns ``{should_compact, reasons, n_files, total_rows,
    overlap_factor, pending_delete_rows, delete_tax, small_files,
    recommended_files}`` — feed ``recommended_files`` straight to
    ``compact_clustered(spark, path, files=...)``."""
    man = load_manifest(path)
    entries = man["files"]
    n_files = len(entries)
    total_rows = int(sum(e["rows"] for e in entries))
    out = {
        "should_compact": False,
        "reasons": [],
        "n_files": n_files,
        "total_rows": total_rows,
        "overlap_factor": 1.0,
        "pending_delete_rows": 0,
        "delete_tax": 0.0,
        "small_files": 0,
        "recommended_files": max(n_files, 1),
    }
    if not entries:
        return out

    # overlap factor: per-file span mass over the union of the ranges
    # (the +1s make single-cell files count; ranges are int cell ids)
    ivals = sorted((int(e["min"]), int(e["max"])) for e in entries)
    mass = sum(hi - lo + 1 for lo, hi in ivals)
    union = 0
    cur_lo, cur_hi = ivals[0]
    for lo, hi in ivals[1:]:
        if lo > cur_hi:
            union += cur_hi - cur_lo + 1
            cur_lo, cur_hi = lo, hi
        else:
            cur_hi = max(cur_hi, hi)
    union += cur_hi - cur_lo + 1
    overlap = mass / max(union, 1)
    out["overlap_factor"] = round(overlap, 2)

    dels = man.get("deletes") or []
    del_rows = int(sum(int(d["rows"]) for d in dels))
    out["pending_delete_rows"] = del_rows
    out["delete_tax"] = round(del_rows / max(total_rows, 1), 4)

    mean_rows = total_rows / n_files
    small = sum(1 for e in entries if e["rows"] < mean_rows / 4)
    out["small_files"] = small

    if overlap >= overlap_threshold:
        out["reasons"].append(
            f"range overlap {overlap:.1f}x >= {overlap_threshold}: a "
            f"range query reads ~{overlap:.0f} files where a compacted "
            "run reads 1"
        )
    if out["delete_tax"] >= delete_tax_threshold:
        out["reasons"].append(
            f"pending MOR deletes are {out['delete_tax']:.1%} of rows "
            f">= {delete_tax_threshold:.0%}: every scan pays the "
            "anti-join until a rewrite retires them"
        )
    if n_files > 1 and small / n_files >= small_file_fraction:
        out["reasons"].append(
            f"{small}/{n_files} files are under a quarter of the mean "
            "file size: per-file overhead dominates"
        )
    out["should_compact"] = bool(out["reasons"])
    if target_rows_per_file:
        out["recommended_files"] = max(
            1, -(-total_rows // int(target_rows_per_file))
        )
    else:
        # keep the current parallelism, shedding the small-file excess
        out["recommended_files"] = max(1, n_files - small)
    return out


# ---------------------------------------------------------------------------
# row-level delete / upsert (copy-on-write)
# ---------------------------------------------------------------------------


def _per_file_hits(spark: SparkSession, path: str, names, cond, man) -> dict:
    """rows-matching-``cond`` count per data file — the decision input
    for minimal-rewrite: a file with zero matches is NEVER rewritten.
    Driver result is bounded by the file count, not the row count.
    Counts LIVE rows only (pending MOR deletes applied), so an already-
    deleted row never triggers a rewrite or re-deletes."""
    if not names:
        return {}
    cdf = _read_files(spark, path, man, names, keep_src="_src")
    rows = cdf.where(cond).groupBy("_src").count().collect()
    return {r["_src"]: int(r["count"]) for r in rows}


def _delete_scope(man: dict, predicate, shape):
    """The shared delete-planning step: the candidate manifest entries
    (manifest-pruned by the shape's cell cover when given) and the
    NULL-safe match condition (restricted to the cover's cell ranges,
    which loses nothing — the cover is a superset of the shape)."""
    entries = man["files"]
    cond = predicate
    cand = entries
    if shape is not None:
        level = int(man["level"])
        ranges = cover_ranges(shape, level)
        cand = [
            e
            for e in entries
            if any(not (hi < e["min"] or lo > e["max"]) for lo, hi in ranges)
        ]
        rcond = None
        for lo, hi in ranges:
            c = F.col(CELL_COL).between(F.lit(lo), F.lit(hi))
            rcond = c if rcond is None else (rcond | c)
        cond = (cond & rcond) if rcond is not None else F.lit(False)
    return cand, F.coalesce(cond.cast("boolean"), F.lit(False))


def delete_clustered(
    spark: SparkSession,
    path: str,
    predicate,
    shape=None,
    strategy: str = "cow",
    branch: str | None = None,
) -> dict:
    """Row-level DELETE on a clustered table — both Iceberg delete
    strategies:

    - ``strategy='cow'`` (copy-on-write, the default): rewrite ONLY the
      files holding matches, minus the matching rows — reads pay
      nothing afterwards; right when deletes are rare or large.
    - ``strategy='mor'`` (merge-on-read): write a POSITION-DELETE file
      — (data file, row position) pairs under ``_deletes/`` — and
      commit it in the manifest; no data file is rewritten, so the
      delete costs one pruned scan + a delete file proportional to the
      MATCHES, and every subsequent read applies the pending set as an
      anti-join at scan time (``_read_files``).  Right for frequent /
      small deletes on a huge table; ``compact_clustered`` materializes
      pending deletes and drops them (the rewrite-data-files contract).

    ``predicate`` is a pyspark Column; rows where it evaluates TRUE are
    deleted (NULL counts as no-match, i.e. the row survives — SQL
    DELETE semantics). ``shape`` optionally RESTRICTS the delete to the
    shape's cell cover and prunes the candidate files through the
    manifest, so a spatially-local delete never reads the rest of the
    table; because the cover is a superset of the shape, passing the
    shape's own exact predicate + the shape loses nothing.

    COW execution, all under ``table_lock``:

    1. count predicate matches PER FILE (one pruned scan; driver state
       bounded by the file count) — files with zero matches keep their
       manifest entries VERBATIM, bytes untouched on disk;
    2. rewrite only the touched files minus the matching rows (pending
       MOR deletes applied — a rewrite never resurrects), new files
       land beside the old (a crash here leaves orphans, never damage);
    3. one atomic snapshot-versioned manifest commit
       (operation='delete'). The superseded files stay on disk while
       any retained snapshot references them (snapshot isolation —
       time travel to the pre-delete snapshot still sees the rows);
       compaction's sweep / ``expire_snapshots`` reclaims them.

    MOR execution differs only in step 2: the matching (file, position)
    pairs are written as a delete file (crash-safe the same way — a
    delete file is invisible until the manifest lists it), and step 3
    commits the SAME data entries plus the new delete entry.

    Zero matches commits nothing (returns a no-op summary). Returns
    the committed manifest (or the no-op summary)."""
    if strategy not in ("cow", "mor"):
        raise ValueError(f"delete strategy must be 'cow' or 'mor', got {strategy!r}")
    with table_lock(path):
        man = load_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        entries = man["files"]
        cand, cond = _delete_scope(man, predicate, shape)
        if strategy == "mor":
            return _delete_mor(spark, path, man, cand, cond, branch=branch)
        hits = _per_file_hits(spark, path, [e["file"] for e in cand], cond, man)
        if not hits:
            return {
                "operation": "delete",
                "noop": True,
                "deleted_rows": 0,
                "snapshot_id": int(man["snapshot_id"]),
            }
        pre = set(_data_files(path))
        keepdf = _read_files(spark, path, man, sorted(hits)).where(~cond)
        (
            keepdf.repartitionByRange(max(1, len(hits)), F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.mode("append")
            .parquet(path)
        )
        new = [n for n in _data_files(path) if n not in pre]
        untouched = [e for e in entries if e["file"] not in hits]
        return _write_manifest(
            path,
            level,
            untouched + _file_stats(path, new),
            operation="delete",
            extra_summary={
                "strategy": "cow",
                "deleted_rows": int(sum(hits.values())),
                "rewritten_files": len(hits),
                "untouched_files": len(untouched),
            },
            branch=branch,
        )


def _delete_mor(
    spark: SparkSession, path: str, man: dict, cand, cond,
    branch: str | None = None,
) -> dict:
    """The merge-on-read arm of ``delete_clustered`` (holds the caller's
    lock): write the matching (file, position) pairs as a position-
    delete file, commit it in the manifest, rewrite nothing."""
    import uuid

    names = [e["file"] for e in cand]
    scan = _read_files(
        spark, path, man, names, keep_src=_DFILE, keep_pos=_DPOS
    )
    pairs = scan.where(cond).select(
        F.col(_DFILE).alias("_file"), F.col(_DPOS).alias("_pos")
    )
    # one pass over the matches: per-file counts (bounded by file
    # count) decide targets + summary; zero matches commits nothing
    per_file = pairs.groupBy("_file").count().collect()
    if not per_file:
        return {
            "operation": "delete",
            "noop": True,
            "deleted_rows": 0,
            "snapshot_id": int(man["snapshot_id"]),
        }
    targets = sorted(r["_file"] for r in per_file)
    n_rows = int(sum(r["count"] for r in per_file))
    rel = os.path.join(DELETE_DIR, f"del-{uuid.uuid4().hex[:16]}")
    (
        pairs.repartition(max(1, n_rows // 4_000_000 + 1), "_file")
        .sortWithinPartitions("_file", "_pos")
        .write.mode("error")
        .parquet(os.path.join(path, rel))
    )
    new_entry = {"file": rel, "rows": n_rows, "targets": targets}
    return _write_manifest(
        path,
        int(man["level"]),
        man["files"],
        operation="delete",
        deletes=(man.get("deletes") or []) + [new_entry],
        extra_summary={
            "strategy": "mor",
            "deleted_rows": n_rows,
            "rewritten_files": 0,
            "delete_file_targets": len(targets),
        },
        branch=branch,
    )


def upsert_clustered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    lon: str = "lon",
    lat: str = "lat",
    files: int = 4,
    strategy: str = "cow",
    branch: str | None = None,
) -> dict:
    """MERGE by key: every current row whose ``key`` appears in ``df``
    is replaced by ``df``'s version (which may have MOVED — new
    lat/lon lands in its new cell), and keys not present are inserted —
    Iceberg's MERGE analog, as ONE snapshot commit, in both write
    strategies:

    - ``strategy='cow'`` (default): per-file hit detection + rewrite of
      only the touched files. The key set is broadcast (left_semi for
      hit detection, left_anti for the rewrite), so hit detection reads
      only the key column of each file and only touched files are
      rewritten — untouched manifest entries survive verbatim, same
      minimal-rewrite contract as ``delete_clustered``.
    - ``strategy='mor'``: NO scan of the table at all — the batch's
      keys land as an EQUALITY-DELETE file (the Iceberg eq-delete
      analog) targeting the files whose manifest key stats could hold
      them, and the batch's rows append as ordinary data files; one
      commit. Cost is O(batch) regardless of table size — the
      streaming-CDC MERGE shape — paid back at read time (every scan of
      a target file anti-joins the key set, key-restricted to target
      files so the batch's own re-inserted rows survive) and retired by
      compaction.

    NULL keys never match (SQL join equality) and are inserted as new
    rows. Atomicity: data/delete files first, one manifest commit last;
    a crash mid-way leaves orphans, and a reader at any point sees
    either the whole merge or none of it."""
    if strategy not in ("cow", "mor"):
        raise ValueError(f"upsert strategy must be 'cow' or 'mor', got {strategy!r}")
    if strategy == "mor":
        return _upsert_mor(spark, df, path, key, lon, lat, files, branch=branch)
    with table_lock(path):
        man = load_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        entries = man["files"]
        keys = F.broadcast(df.select(key).distinct())
        # key-range file pruning (the manifest's per-column stats): only
        # files whose [min,max] of the KEY column intersects the batch's
        # key range can hold a match — on tables whose keys correlate
        # with layout (ingest order, region) the hit scan skips most
        # files; entries without key stats are always scanned (sound).
        row = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
        klo, khi = row["lo"], row["hi"]
        cand = (
            []  # an all-NULL key batch matches nothing (SQL equality)
            if klo is None
            else [e for e in entries if _col_range_keep(e, key, klo, khi)]
        )
        touched: dict = {}
        if cand:
            # hit detection over LIVE rows only (pending MOR deletes
            # applied): a deleted row's key must neither trigger a
            # rewrite nor resurrect through one
            cdf = _read_files(
                spark, path, man, [e["file"] for e in cand], keep_src="_src"
            ).select(F.col(key), F.col("_src"))
            rows = (
                cdf.join(keys, on=key, how="left_semi")
                .groupBy("_src")
                .count()
                .collect()
            )
            touched = {r["_src"]: int(r["count"]) for r in rows}
        pre = set(_data_files(path))
        if touched:
            kdf = _read_files(spark, path, man, sorted(touched)).join(
                keys, on=key, how="left_anti"
            )
            (
                kdf.repartitionByRange(max(1, len(touched)), F.col(CELL_COL))
                .sortWithinPartitions(CELL_COL)
                .write.mode("append")
                .parquet(path)
            )
        mid = set(_data_files(path))
        be = cell_backend("s2")
        out = df.withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
        old_schema = _manifest_schema(man)
        schema_json = None
        if old_schema is not None:  # same add-column evolution as append
            merged, _ = _merge_schemas(old_schema, out.schema)
            schema_json = merged.json()
        (
            out.repartitionByRange(files, F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.mode("append")
            .parquet(path)
        )
        post = _data_files(path)
        rewritten = _file_stats(path, [n for n in mid - pre])
        inserted = _file_stats(path, [n for n in post if n not in mid])
        untouched = [e for e in entries if e["file"] not in touched]
        return _write_manifest(
            path,
            level,
            untouched + rewritten + inserted,
            operation="upsert",
            schema_json=schema_json,
            extra_summary={
                "replaced_rows": int(sum(touched.values())),
                "incoming_rows": int(sum(e["rows"] for e in inserted)),
                "rewritten_files": len(touched),
                "untouched_files": len(untouched),
                "hit_scan_files": len(cand),
            },
            branch=branch,
        )


def _upsert_mor(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    lon: str,
    lat: str,
    files: int,
    branch: str | None = None,
) -> dict:
    """The merge-on-read arm of ``upsert_clustered``: equality-delete
    file (batch keys, distinct, NULLs dropped) + ordinary data append,
    one commit, zero reads of the table's data files."""
    import uuid

    import pyarrow.parquet as pq

    with table_lock(path):
        man = load_manifest(path, snapshot_id=branch)
        level = int(man["level"])
        entries = man["files"]
        # targets: every current file whose key-range stats could hold a
        # batch key (files without stats are targeted — sound); an
        # all-NULL key batch replaces nothing
        row = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
        targets = (
            []
            if row["lo"] is None
            else sorted(
                e["file"]
                for e in entries
                if _col_range_keep(e, key, row["lo"], row["hi"])
            )
        )
        deletes = man.get("deletes") or []
        n_keys = 0
        if targets:
            rel = os.path.join(DELETE_DIR, f"eq-{uuid.uuid4().hex[:16]}")
            full = os.path.join(path, rel)
            (
                df.select(F.col(key).alias("_key"))
                .where(F.col("_key").isNotNull())
                .distinct()
                .write.mode("error")
                .parquet(full)
            )
            n_keys = sum(  # row count from the written footers — no job
                pq.ParquetFile(os.path.join(full, f)).metadata.num_rows
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
            deletes = deletes + [
                {
                    "file": rel,
                    "rows": n_keys,
                    "targets": targets,
                    "kind": "eq",
                    "key": key,
                }
            ]
        be = cell_backend("s2")
        out = df.withColumn(CELL_COL, be.udf(level)(F.col(lat), F.col(lon)))
        old_schema = _manifest_schema(man)
        schema_json = None
        if old_schema is not None:  # same add-column evolution as append
            merged, _ = _merge_schemas(old_schema, out.schema)
            schema_json = merged.json()
        pre = set(_data_files(path))
        (
            out.repartitionByRange(files, F.col(CELL_COL))
            .sortWithinPartitions(CELL_COL)
            .write.mode("append")
            .parquet(path)
        )
        inserted = _file_stats(path, [n for n in _data_files(path) if n not in pre])
        return _write_manifest(
            path,
            level,
            entries + inserted,
            operation="upsert",
            schema_json=schema_json,
            deletes=deletes,
            extra_summary={
                "strategy": "mor",
                "incoming_rows": int(sum(e["rows"] for e in inserted)),
                "eq_delete_keys": n_keys,
                "eq_delete_targets": len(targets),
                "rewritten_files": 0,
            },
            branch=branch,
        )


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
    (extra candidate ids), never narrowing.

    Merging two runs never changes any other inter-run gap, so the
    greedy swallow-min loop is equivalent to one shot: keep the
    ``max_ranges - 1`` LARGEST gaps as the surviving breaks ((gap,
    index) lexsort reproduces the loop's first-minimal tie-break
    exactly).  That makes this O(n log n) vectorized instead of the
    former O(n^2) Python scan — the former dominated large-batch kNN
    planning, where a 10k-query round can fold >10^5 cover cells."""
    import numpy as np

    rs = ranges if isinstance(ranges, (list, tuple)) else list(ranges)
    if not len(rs):
        return []
    lo = np.fromiter((r[0] for r in rs), dtype=np.int64, count=len(rs))
    hi = np.fromiter((r[1] for r in rs), dtype=np.int64, count=len(rs))
    return _coalesce_ranges_np(lo, hi, max_ranges)


def _coalesce_ranges_np(lo, hi, max_ranges: int) -> list[tuple[int, int]]:
    """Vectorized core of ``_coalesce_ranges`` over int64 arrays."""
    import numpy as np

    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    cmax = np.maximum.accumulate(hi)
    new = np.empty(len(lo), dtype=bool)
    new[0] = True
    new[1:] = lo[1:] > cmax[:-1] + 1
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:] - 1, len(lo) - 1)
    mlo, mhi = lo[starts], cmax[ends]
    n = len(mlo)
    if n > max_ranges:
        gaps = mlo[1:] - mhi[:-1]
        k = max_ranges - 1
        gorder = np.lexsort((np.arange(len(gaps)), gaps))
        keep = (
            np.sort(gorder[len(gaps) - k:]) if k > 0
            else np.empty(0, dtype=np.int64)
        )
        s = np.concatenate(([0], keep + 1))
        e = np.concatenate((keep, [n - 1]))
        mlo, mhi = mlo[s], mhi[e]
    return [(int(a), int(b)) for a, b in zip(mlo, mhi)]


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
    spark: SparkSession,
    path: str,
    ranges: list[tuple[int, int]],
    snapshot_id: int | None = None,
) -> tuple[DataFrame, PruneStats]:
    """Manifest-pruned scan: only files whose [min,max] intersects a
    query range are listed; the range disjunction is then applied as a
    pushed-down filter so kept files skip row groups too.
    ``snapshot_id`` plans against that snapshot's manifest instead of
    the current one (time travel)."""
    man = load_manifest(path, snapshot_id)
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
        empty = spark.createDataFrame([], _table_schema(spark, path, man))
        return empty, stats
    df = _read_files(spark, path, man, [e["file"] for e in keep])
    cond = None
    for lo, hi in ranges:
        c = F.col(CELL_COL).between(F.lit(lo), F.lit(hi))
        cond = c if cond is None else (cond | c)
    return df.where(cond), stats


def clustered_scan(
    spark: SparkSession,
    path: str,
    col_ranges: dict | None = None,
    snapshot_id: int | None = None,
    with_stats: bool = False,
):
    """Metadata-pruned scan on ANY stats-carrying column: only files
    whose per-column [min,max] (manifest column stats) intersect every
    requested ``{col: (lo, hi)}`` range are listed, and the residual
    BETWEEN conjunction is pushed to the parquet reader so kept files
    skip row groups too. The cell column prunes through the same stats
    (its bounds are a manifest column like any other here). Files
    without stats for a column are always kept — sound on legacy
    manifests and unsupported types; the pushed predicate still makes
    the RESULT exact."""
    man = load_manifest(path, snapshot_id)
    col_ranges = dict(col_ranges or {})
    entries = man["files"]
    keep = []
    for e in entries:
        ok = True
        for col, (lo, hi) in col_ranges.items():
            if col == CELL_COL:
                if hi < e["min"] or lo > e["max"]:
                    ok = False
                    break
            elif not _col_range_keep(e, col, lo, hi):
                ok = False
                break
        if ok:
            keep.append(e)
    stats = PruneStats(
        files_total=len(entries),
        files_kept=len(keep),
        rows_total=sum(e["rows"] for e in entries),
        rows_kept_files=sum(e["rows"] for e in keep),
        n_ranges=len(col_ranges),
    )
    if not keep:
        out = spark.createDataFrame([], _table_schema(spark, path, man))
        return (out, stats) if with_stats else out
    df = _read_files(spark, path, man, [e["file"] for e in keep])
    for col, (lo, hi) in col_ranges.items():
        df = df.where(F.col(col).between(F.lit(lo), F.lit(hi)))
    return (df, stats) if with_stats else df


def clustered_radius_query(
    spark: SparkSession,
    path: str,
    qlon: float,
    qlat: float,
    radius_km: float,
    lon: str = "lon",
    lat: str = "lat",
    with_stats: bool = False,
    snapshot_id: int | None = None,
):
    """Radius query over a clustered table: manifest file pruning +
    pushed row-group ranges, then the SAME exact haversine predicate as
    the unclustered radius join — the layout changes what is read,
    never what is returned.  ``snapshot_id`` runs the query as of that
    snapshot (time travel)."""
    man = load_manifest(path, snapshot_id)
    circle = Circle(float(qlon), float(qlat), float(km_to_deg(radius_km)), geo=True)
    ranges = cover_ranges(circle, man["level"])
    df, stats = read_pruned(spark, path, ranges, snapshot_id=snapshot_id)
    out = df.where(
        haversine_km(F.col(lon), F.col(lat), F.lit(float(qlon)), F.lit(float(qlat)))
        <= F.lit(float(radius_km))
    ).drop(CELL_COL)
    return (out, stats) if with_stats else out


def _manifest_schema(man: dict):
    """The committed table schema, or None on a legacy manifest."""
    sj = man.get("schema")
    if not sj:
        return None
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(sj))


def _table_schema(spark: SparkSession, path: str, man: dict):
    """The table schema for empty-result reads: the manifest carries it
    (Iceberg metadata analog) so a zero-file table — or a query whose
    cover prunes every file — answers with the right columns without
    touching a single parquet footer. Legacy (pre-schema) manifests
    fall back to the directory read."""
    return _manifest_schema(man) or spark.read.parquet(path).schema


def _schema_reader(spark: SparkSession, man: dict):
    """A parquet reader pinned to the MANIFEST's schema (the Iceberg
    semantic: the table schema lives in metadata, not in whichever file
    happens to be read first). After an add-column append, files
    written before the column existed are read with NULLs in it — and a
    time-traveled read uses THAT snapshot's schema, so history keeps
    its original shape. Legacy manifests fall back to file inference."""
    schema = _manifest_schema(man)
    return spark.read.schema(schema) if schema is not None else spark.read


def _applicable_deletes(man: dict, names) -> list[dict]:
    """The snapshot's pending MOR delete files whose target set
    intersects the files being read — a scan that prunes to untouched
    files never pays the anti-join."""
    nm = set(names)
    return [d for d in man.get("deletes", []) if nm & set(d["targets"])]


def _read_files(
    spark: SparkSession,
    path: str,
    man: dict,
    names: list[str],
    keep_src: str | None = None,
    keep_pos: str | None = None,
) -> DataFrame:
    """THE data-file read: the listed files under the manifest's pinned
    schema, with the snapshot's pending merge-on-read delete files
    applied — an anti-join on (file, position), broadcast when the
    pending set is small (the Iceberg MOR read path: eager apply at
    scan, so every reader above this sees only live rows).  Positions
    come from the parquet reader's ``_metadata.row_index`` (stable under
    predicate pushdown), so a delete file written against a data file
    matches it at any later read regardless of filters.

    ``keep_src``/``keep_pos`` retain the source file name / in-file row
    position as named output columns — the inputs a MOR delete writer
    or a per-file hit counter needs (``input_file_name()`` is unreliable
    above a join, so callers take the columns from here instead)."""
    if not names:
        df = spark.createDataFrame([], _table_schema(spark, path, man))
        if keep_src is not None:
            df = df.withColumn(keep_src, F.lit(None).cast("string"))
        if keep_pos is not None:
            df = df.withColumn(keep_pos, F.lit(None).cast("long"))
        return df
    df = _schema_reader(spark, man).parquet(
        *[os.path.join(path, n) for n in names]
    )
    dels = _applicable_deletes(man, names)
    pos_dels = [d for d in dels if d.get("kind", "pos") == "pos"]
    eq_dels = [d for d in dels if d.get("kind") == "eq"]
    want_meta = dels or keep_src is not None or keep_pos is not None
    if want_meta:
        df = df.select(
            "*",
            F.col("_metadata.file_name").alias(_DFILE),
            F.col("_metadata.row_index").alias(_DPOS),
        )
    if pos_dels:
        ddf = spark.read.parquet(
            *[os.path.join(path, d["file"]) for d in pos_dels]
        ).select(F.col("_file").alias(_DFILE), F.col("_pos").alias(_DPOS))
        if sum(int(d["rows"]) for d in pos_dels) <= BROADCAST_DELETE_ROWS:
            ddf = F.broadcast(ddf)
        df = df.join(ddf, on=[_DFILE, _DPOS], how="left_anti")
    for d in eq_dels:
        # equality deletes kill BY KEY but only in their TARGET files
        # (files written before the delete's commit): a later re-insert
        # of the same key lands in a non-target file and must survive.
        # The target restriction rides as a residual condition on the
        # broadcast anti-join (the equi key keeps it a hash join); one
        # join per pending eq file — bounded, retired by compaction.
        kdf = spark.read.parquet(os.path.join(path, d["file"])).select(
            F.col("_key").alias("__s4n_key")
        )
        if int(d["rows"]) <= BROADCAST_DELETE_ROWS:
            kdf = F.broadcast(kdf)
        tgt = sorted(set(d["targets"]) & set(names))
        cond = (F.col(d["key"]) == F.col("__s4n_key")) & F.col(_DFILE).isin(tgt)
        df = df.join(kdf, cond, "left_anti")
    if want_meta:
        out_cols = [c for c in df.columns if c not in (_DFILE, _DPOS)]
        if keep_src is not None:
            df = df.withColumn(keep_src, F.col(_DFILE))
            out_cols.append(keep_src)
        if keep_pos is not None:
            df = df.withColumn(keep_pos, F.col(_DPOS))
            out_cols.append(keep_pos)
        df = df.select(*out_cols)
    return df


def _merge_schemas(old, new):
    """Add-column schema evolution (Iceberg analog): fields are matched
    BY NAME; new fields append to the end as nullable, fields the batch
    omits stay (nullable — its rows read as NULL), same-name fields
    must keep their exact type (no silent promotion — a type change is
    an error, not a coercion). Returns (merged, changed)."""
    from pyspark.sql.types import StructField, StructType

    new_by_name = {f.name: f for f in new.fields}
    fields, changed = [], False
    for f in old.fields:
        g = new_by_name.pop(f.name, None)
        if g is None:
            # batch omits this column: its rows read as NULL
            fields.append(StructField(f.name, f.dataType, True, f.metadata))
            changed = changed or not f.nullable
        elif g.dataType != f.dataType:
            raise ValueError(
                f"schema evolution supports adding columns, not changing "
                f"types: column {f.name!r} is {f.dataType.simpleString()} "
                f"in the table but {g.dataType.simpleString()} in the batch"
            )
        else:
            fields.append(
                StructField(
                    f.name, f.dataType, f.nullable or g.nullable, f.metadata
                )
            )
    for g in new.fields:  # preserve batch order for the added columns
        if g.name in new_by_name:
            # pre-evolution rows read as NULL in an added column
            fields.append(StructField(g.name, g.dataType, True, g.metadata))
            changed = True
    return StructType(fields), changed


def _read_listed(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """All manifest-listed files (crash-orphans excluded) — the full-scan
    fallback surface."""
    man = load_manifest(path, snapshot_id)
    return _read_files(spark, path, man, [e["file"] for e in man["files"]])


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
    debug: bool = False,
) -> DataFrame:
    """Exact kNN over the clustered layout with the QUERY SET AS A
    DATAFRAME — the manifest-pruned twin of ``knn_join_cover_df``
    (operators/knn.py), density-adaptive against the clustered-data
    trap (the same trap ``knn_join_df`` documents: one GLOBAL radius
    serves neither hot-cluster queries — which re-pull a whole city per
    query — nor ocean queries, which under a doubling global radius
    eventually drag continent-sized candidate sets through the join).

    Per query, per round:

    1. a counts PYRAMID (one cells-only aggregate over the manifest-
       listed scan — the cell column is the table's sort key, so this is
       a single pruned-column pass — rolled up coarse via the Hilbert
       prefix property) gives each query the finest pyramid level whose
       own cell already holds ~``thr_sel`` points; its first-round
       radius targets ~``thr`` candidates AT ITS LOCAL DENSITY, so
       dense-cluster queries search small circles and sparse queries
       search big ones, both pulling O(thr) candidates;
    2. circle covers are planned for the whole pending set in ONE
       vectorized BFS per active cover level
       (``plans.s2cover.s2_circle_covers_batch`` — bbox-superset of the
       exact cover, so acceptance stays exact) inside ``mapInPandas`` —
       nothing per-query on the driver;
    3. per active cover level, the cover cells fold into coalesced
       global id-range lists (bounded: <= ``max_scan_ranges`` per
       level) that prune manifest files driver-side and push the
       row-group BETWEEN disjunction — the Iceberg-style scan planning
       this layout exists for — and candidates come from one
       prefix-shifted equi-join per active level (broadcast under a
       size bound, else shuffle-by-cell);
    4. acceptance (n >= k and k-th distance <= that query's own radius
       — sound because the cover is a superset of ball(r_q)) is
       aggregate + anti-join; survivors double their radius.

    Every round is a CONSTANT number of Spark jobs no matter how many
    queries are pending.  Stragglers after ``max_rounds`` (or
    n_total < k) fall back to exact brute force over the listed files.
    Returns (query_id, <id_col>, dist_km, rank), ties on <id_col> —
    the same contract as operators.knn.knn_join."""
    import sys

    from pyspark.sql import Window

    from spatial4n_spark.kernels.distance import deg_to_km

    man = load_manifest(path)
    level = int(man["level"])
    n_total = sum(e["rows"] for e in man["files"])
    r_cap_km = float(deg_to_km(180.0))
    thr_sel = float(max(8, 2 * k))
    thr = float(max(32, 4 * k))

    qid_type = queries.schema[query_id].dataType.simpleString()
    id_type = _read_listed(spark, path).schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_type}, {id_col} {id_type}, dist_km double, rank int"
    cover_schema = (
        f"_lv int, _pcell long, query_id {qid_type}, "
        "_qlon double, _qlat double, _r double"
    )

    # --- counts pyramid: local density at a ladder of cell sizes -------
    max_p = min(level, 12)
    pyr = [lv for lv in range(max_p, 1, -2)][::-1][-5:]  # coarse -> fine, <= 5
    cnt = (
        _read_listed(spark, path)
        .select(F.shiftright(F.col(CELL_COL), 2 * (level - max_p)).alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
        .persist()
    )

    def _qcell_gen(it):
        import pandas as pd

        from spatial4n_spark.kernels.s2cell import s2_encode

        for pdf in it:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["_qc"] = s2_encode(
                pdf["_qlat"].to_numpy(), pdf["_qlon"].to_numpy(), max_p
            )
            yield pdf

    q0 = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qlon).cast("double").alias("_qlon"),
        F.col(qlat).cast("double").alias("_qlat"),
    )
    q0 = q0.mapInPandas(
        _qcell_gen,
        f"query_id {qid_type}, _qlon double, _qlat double, _qc long",
    )
    # the whole pyramid in ONE explode-aggregate over the cell counts
    # and ONE query-side join on the exploded (level, prefix-cell) keys,
    # pivoted back per query — a join per level costs a broadcast-build
    # job per level (see operators/knn.knn_join_df, same rework)
    pyrdf = (
        cnt.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(lv).alias("_plv"),
                            F.shiftright(
                                F.col("_c"), 2 * (max_p - lv)
                            ).alias("_pc"),
                        )
                        for lv in pyr
                    ]
                )
            ).alias("_k"),
            "_n",
        )
        .groupBy("_k._plv", "_k._pc")
        .agg(F.sum("_n").alias("_pn"))
    )
    keys = q0.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lv).alias("_plv"),
                        F.shiftright(F.col("_qc"), 2 * (max_p - lv)).alias(
                            "_pc"
                        ),
                    )
                    for lv in pyr
                ]
            )
        ).alias("_k"),
    ).select("query_id", "_k._plv", "_k._pc")
    hits = (
        keys.join(pyrdf, ["_plv", "_pc"], "left")
        .groupBy("query_id")
        .agg(
            *[
                F.max(F.when(F.col("_plv") == lv, F.col("_pn"))).alias(
                    f"_n{lv}"
                )
                for lv in pyr
            ]
        )
    )
    q0 = q0.join(hits, "query_id", "left")

    # finest pyramid level whose own cell holds ~thr_sel points; its
    # radius targets ~thr candidates at that cell's density.  Queries
    # with no such level (globally sparse neighborhoods) start at 1.5x
    # the coarsest pyramid cell and escalate by doubling.
    size_deg = {lv: 90.0 / float(1 << lv) for lv in pyr}
    lvl_expr = F.lit(pyr[0])
    sel_ok = F.lit(False)
    for lv in pyr:
        got = F.coalesce(F.col(f"_n{lv}"), F.lit(0)) >= F.lit(thr_sel)
        lvl_expr = F.when(got, F.lit(lv)).otherwise(lvl_expr)
        sel_ok = sel_ok | got
    nsel = F.lit(None).cast("long")
    for lv in pyr:
        nsel = F.when(F.col("_lvl") == lv, F.col(f"_n{lv}")).otherwise(nsel)
    size_expr = F.lit(None).cast("double")
    for lv in pyr:
        size_expr = F.when(F.col("_lvl") == lv, F.lit(size_deg[lv])).otherwise(size_expr)
    r_deg_expr = F.when(
        F.col("_sel"),
        size_expr
        * F.sqrt(
            F.lit(thr)
            / (F.lit(math.pi) * F.greatest(nsel, F.lit(1)).cast("double"))
        ),
    ).otherwise(F.lit(1.5 * size_deg[pyr[0]]))
    r_km_expr = F.least(
        F.greatest(
            r_deg_expr * F.lit(float(deg_to_km(1.0))),
            F.lit(float(deg_to_km(4.0 * 90.0 / float(1 << level)))),
        ),
        F.lit(r_cap_km),
    )
    pending = (
        q0.withColumn("_lvl", lvl_expr)
        .withColumn("_sel", sel_ok)
        .withColumn("_r", r_km_expr)
        .select("query_id", "_qlon", "_qlat", "_r")
        .localCheckpoint(eager=False)
    )
    n_pending = pending.count()

    accepted: list[DataFrame] = []
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col(id_col).asc()
    )

    def cover_gen(it):
        import numpy as np
        import pandas as pd

        from spatial4n_spark.kernels.distance import km_to_deg as _k2d
        from spatial4n_spark.plans.s2cover import s2_circle_covers_batch

        for pdf in it:
            if not len(pdf):
                continue
            qx = pdf["_qlon"].to_numpy()
            qy = pdf["_qlat"].to_numpy()
            r_km = pdf["_r"].to_numpy()
            r_deg = np.asarray(_k2d(r_km), dtype=np.float64)
            want = 2.0 * r_deg / target_cells_across
            lv_arr = np.clip(
                np.floor(np.log2(90.0 / np.maximum(want, 1e-12))), 1, level
            ).astype(np.int64)
            # quantize DOWN to even levels (coarser -> still a sound
            # superset): halves the distinct-level fan-out the round's
            # explode pays, for <= ~1.4x candidate-bbox growth
            lv_arr = np.minimum(lv_arr & ~np.int64(1), level)
            for u in np.unique(lv_arr):
                m = lv_arr == u
                qi, cells = s2_circle_covers_batch(qx[m], qy[m], r_deg[m], int(u))
                src = np.flatnonzero(m)[qi]
                yield pd.DataFrame(
                    {
                        "_lv": np.full(len(cells), int(u), dtype=np.int32),
                        "_pcell": cells,
                        "query_id": pdf["query_id"].to_numpy()[src],
                        "_qlon": qx[src],
                        "_qlat": qy[src],
                        "_r": r_km[src],
                    }
                )

    def merge_gen(it):
        """Fold cover cells into coalesced table-level ranges PER
        PARTITION (<= max_scan_ranges rows per active level each) — the
        driver then merges the bounded partials, so no single task ever
        funnels the whole distinct cell set."""
        import numpy as np
        import pandas as pd

        frames = [pdf for pdf in it if len(pdf)]
        if not frames:
            return
        allf = pd.concat(frames, ignore_index=True)
        for u in np.unique(allf["_lv"].to_numpy()):
            cs = np.unique(allf.loc[allf["_lv"] == u, "_pcell"].to_numpy())
            shift = 2 * (level - int(u))
            merged = _coalesce_ranges_np(
                cs << shift, ((cs + 1) << shift) - 1, max_scan_ranges
            )
            yield pd.DataFrame(
                {
                    "_lv": np.full(len(merged), int(u), dtype=np.int32),
                    "lo": [m[0] for m in merged],
                    "hi": [m[1] for m in merged],
                }
            )

    rounds = max_rounds if n_total >= k else 0
    for rnd in range(rounds):
        if n_pending == 0:
            break
        if rnd >= 1 and n_pending * n_total <= 50_000_000:
            # a handful of stragglers after the cover round: one
            # broadcast brute-force job beats a whole extra round of
            # cover/prune/join stages (bounded: <= 5e7 comparisons)
            break
        covers = pending.mapInPandas(cover_gen, cover_schema).localCheckpoint(
            eager=False
        )
        rng_rows = (
            covers.select("_lv", "_pcell")
            .distinct()
            .mapInPandas(merge_gen, "_lv int, lo long, hi long")
            .collect()
        )
        partials: dict[int, list[tuple[int, int]]] = {}
        for r in rng_rows:
            partials.setdefault(int(r["_lv"]), []).append((int(r["lo"]), int(r["hi"])))
        by_lv = {
            u: _coalesce_ranges(rs, max_scan_ranges) for u, rs in partials.items()
        }
        if debug:
            print(
                f"clustered_knn_df round {rnd}: pending={n_pending} "
                f"levels={sorted(by_lv)}",
                file=sys.stderr,
            )
        # ONE pruned scan (union of every level's ranges) and ONE join:
        # each scan row explodes into its (level, prefix-cell) pair per
        # ACTIVE level — all codegen — so the round costs one table read
        # and one shuffle/broadcast regardless of how many cover levels
        # this round's radius spread produced
        active = sorted(by_lv)
        ranges_all = _coalesce_ranges(
            (t for rs in by_lv.values() for t in rs), 2 * max_scan_ranges
        )
        scan_rnd, _stats = read_pruned(spark, path, ranges_all)
        pairs = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(u).cast("int").alias("_lv"),
                        F.shiftright(F.col(CELL_COL), 2 * (level - u)).alias(
                            "_pcell"
                        ),
                    )
                    for u in active
                ]
            )
        )
        cov = covers
        if n_pending * target_cells_across**2 <= broadcast_cells:
            cov = F.broadcast(cov)
        cand = (
            scan_rnd.withColumn("_p", pairs)
            .withColumn("_lv", F.col("_p._lv"))
            .withColumn("_pcell", F.col("_p._pcell"))
            .drop("_p")
            .join(cov, ["_lv", "_pcell"])
        )
        ranked = (
            cand.withColumn(
                "dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat")
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank", "_r")
            .localCheckpoint(eager=False)
        )
        summ = ranked.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("dist_km").alias("_dmax"),
            F.first("_r").alias("_rq"),
        )
        accepted_ids = summ.where(
            (F.col("_n") >= k) & (F.col("_dmax") <= F.col("_rq"))
        ).select("query_id")
        accepted.append(
            ranked.join(F.broadcast(accepted_ids), "query_id").select(
                "query_id", id_col, "dist_km", "rank"
            )
        )
        pending = (
            pending.join(F.broadcast(accepted_ids), "query_id", "left_anti")
            .withColumn("_r", F.least(F.col("_r") * 2.0, F.lit(r_cap_km)))
            .localCheckpoint(eager=False)
        )
        n_pending = pending.count()

    cnt.unpersist()
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
    snapshot_id: int | None = None,
):
    """Manifest-pruned candidate scan for a set of shapes (e.g. a polygon
    layer): one union-of-covers range set, one pruned scan. Callers run
    their exact join/refine on the result; pruning is conservative by
    construction."""
    man = load_manifest(path, snapshot_id)
    all_ranges: list[tuple[int, int]] = []
    for s in shapes:
        all_ranges.extend(cover_ranges(s, man["level"]))
    ranges = [(lo, hi) for lo, hi in _merge_ranges(all_ranges)]
    df, stats = read_pruned(spark, path, ranges, snapshot_id=snapshot_id)
    out = df.drop(CELL_COL)
    return (out, stats) if with_stats else out


# ---------------------------------------------------------------------------
# incremental (CDC-style) scans, resumable consumer, metadata tables
# ---------------------------------------------------------------------------


def _incremental_added(
    path: str,
    from_snapshot: int,
    to_snapshot: int,
    manifest: str,
    snap_dir: str,
) -> list[tuple[dict, list[str]]]:
    """Per-snapshot ADDED data files over ``(from, to]`` — the shared
    core of both layouts' incremental scans.  Walks the snapshot chain
    and diffs consecutive file lists; raises if the range crosses a
    commit whose row-level effect is not pure insertion, or if any
    snapshot in the range was expired (same failure mode as Iceberg:
    an incremental consumer that falls behind the retention window
    must re-bootstrap from a full scan)."""
    frm, to = int(from_snapshot), int(to_snapshot)
    if to < frm:
        raise ValueError(
            f"incremental scan of {path}: to_snapshot {to} precedes "
            f"from_snapshot {frm}"
        )
    # walk the lineage CHAIN ending at `to` (not an id range: with
    # branches, ids from different lineages interleave, and expired
    # history breaks the chain — both must fail loudly, not mis-diff)
    chain = _history_chain(path, manifest, snap_dir, to)
    ids = [int(m.get("snapshot_id", 0)) for m in chain]
    if frm > 0:
        if frm not in ids:
            raise ValueError(
                f"incremental scan of {path}: from_snapshot {frm} was "
                f"expired or is not an ancestor of {to}; reachable "
                f"snapshots: {ids} (re-bootstrap the consumer from a "
                "full scan)"
            )
        start = ids.index(frm)
        prev_files = {e["file"] for e in chain[start]["files"]}
        walk = chain[start + 1:]
    else:
        if chain and chain[0].get("parent_id") is not None:
            raise ValueError(
                f"incremental scan of {path}: history before snapshot "
                f"{ids[0]} was expired; reachable snapshots: {ids} "
                "(re-bootstrap the consumer from a full scan)"
            )
        prev_files = set()
        walk = chain
    out: list[tuple[dict, list[str]]] = []
    for man in walk:
        sid = int(man.get("snapshot_id", 0))
        op = man.get("operation", "overwrite")
        files = {e["file"] for e in man["files"]}
        if op == "append" or (op == "overwrite" and not prev_files):
            # an overwrite of an EMPTY table (the initial write) is
            # pure insertion; any other overwrite replaces rows
            added = sorted(files - prev_files)
            if added:
                out.append((man, added))
        elif op == "replace":
            pass  # compaction / re-cluster reorganizes existing rows
        else:
            raise ValueError(
                f"incremental scan of {path}: snapshot {sid} is a "
                f"{op!r} commit, whose row-level effect is not "
                "expressible as appended rows — scan ranges must not "
                "cross overwrite/delete/upsert/rollback commits "
                "(re-bootstrap the consumer from a full scan instead)"
            )
        prev_files = files
    return out


def incremental_scan(
    spark: SparkSession,
    path: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    snapshot_col: str | None = None,
) -> DataFrame:
    """Rows ADDED to the table over ``(from_snapshot, to_snapshot]`` —
    the Iceberg incremental-append-scan analog, and the read half of
    the resumable-pipeline contract (``next_increment``): a downstream
    consumer that remembers the last snapshot it processed reads
    exactly the new rows, never rescanning the table.  Cost scales
    with the increment (only the added files are listed in the scan),
    not with table size — the property that makes a 10^12-row table's
    derived pipelines incremental.

    Semantics (per commit operation, matching Iceberg's
    IncrementalAppendScan):

    - ``append`` commits contribute exactly their added files;
    - ``replace`` (compaction / re-cluster) contributes nothing — it
      reorganizes rows that already streamed past the consumer;
    - ``overwrite``/``delete``/``upsert``/``rollback`` RAISE: their
      row-level effect is not a set of inserted rows.  The one allowed
      overwrite is the initial write of an empty table
      (``from_snapshot=0`` on a fresh table), which is pure insertion.

    Each contributing batch is read with ITS OWN commit's schema and
    batches are aligned by name (add-column evolution mid-range yields
    NULLs for rows that predate the column); ``snapshot_col`` adds the
    committing snapshot id to every row (per-batch lineage)."""
    cur = load_manifest(path)
    to = int(cur["snapshot_id"]) if to_snapshot is None else int(to_snapshot)
    batches = _incremental_added(
        path, int(from_snapshot), to, MANIFEST, SNAP_DIR
    )
    parts = []
    for man, added in batches:
        df = _schema_reader(spark, man).parquet(
            *[os.path.join(path, n) for n in added]
        )
        if snapshot_col is not None:
            df = df.withColumn(
                snapshot_col, F.lit(int(man["snapshot_id"])).cast("long")
            )
        parts.append(df)
    if not parts:
        to_man = cur if to == int(cur["snapshot_id"]) else load_manifest(path, to)
        schema = _table_schema(spark, path, to_man)
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


@dataclass
class Increment:
    """One unprocessed increment of a clustered table, handed out by
    ``next_increment``.  ``commit()`` advances the consumer state to
    ``to_snapshot`` — call it AFTER the downstream sink has durably
    accepted ``df``.  A crash before commit re-delivers this same
    increment on the next call (at-least-once); pair with an
    idempotent / fingerprinted sink (``checkpoint.SnapshotStore``) for
    end-to-end exactly-once."""

    df: DataFrame
    from_snapshot: int
    to_snapshot: int
    state_path: str

    def commit(self) -> None:
        _atomic_json_write(
            self.state_path,
            {
                "snapshot_id": int(self.to_snapshot),
                "committed_at": time.time(),
            },
        )


def _consumer_position(state_path: str) -> int:
    try:
        with open(state_path) as f:
            return int(json.load(f)["snapshot_id"])
    except FileNotFoundError:
        return 0


def next_increment(
    spark: SparkSession,
    path: str,
    state_path: str,
    snapshot_col: str | None = None,
) -> Increment | None:
    """The resumable-consumer loop step (north_rule: "resumable from
    Iceberg snapshot checkpoints"): read the last-processed snapshot id
    from ``state_path`` (0 if absent — a fresh consumer), and return the
    unprocessed increment up to the table's CURRENT snapshot, or None
    when the consumer is caught up.  The caller processes
    ``increment.df``, lands the result durably, THEN calls
    ``increment.commit()`` — the state write is atomic, so the consumer
    resumes correctly from any crash point:

        while (inc := next_increment(spark, table, state)) is not None:
            sink(inc.df)      # idempotent sink => exactly-once
            inc.commit()
    """
    last = _consumer_position(state_path)
    cur = int(load_manifest(path)["snapshot_id"])
    if cur <= last:
        return None
    df = incremental_scan(spark, path, last, cur, snapshot_col=snapshot_col)
    return Increment(
        df=df, from_snapshot=last, to_snapshot=cur, state_path=state_path
    )


def _files_df_from(
    spark: SparkSession, man: dict, added: dict[str, int] | None = None
) -> DataFrame:
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("file", StringType(), False),
            StructField("day", StringType(), True),
            StructField("rows", LongType(), False),
            StructField("cell_min", LongType(), False),
            StructField("cell_max", LongType(), False),
            StructField("added_snapshot_id", IntegerType(), True),
            StructField("column_stats", StringType(), True),
        ]
    )
    added = added or {}
    rows = [
        (
            e["file"],
            e.get("day"),
            int(e["rows"]),
            int(e["min"]),
            int(e["max"]),
            added.get(e["file"]),
            json.dumps(e["cols"], sort_keys=True, default=str)
            if e.get("cols")
            else None,
        )
        for e in man["files"]
    ]
    return spark.createDataFrame(rows, schema)


def files_df(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The table's file-level metadata as a DataFrame — the Iceberg
    ``.files`` metadata-table analog: one row per manifest entry with
    its row count, primary cell bounds, per-column [min,max] stats
    (JSON), and the day partition where the layout has one (NULL on the
    flat layout).  Answered entirely from the manifest — no data file
    is opened — and time-travels with ``snapshot_id`` like every other
    reader.  Together with ``snapshot_log_df`` (the ``.snapshots`` /
    ``.history`` analog) this completes the metadata-table surface the
    north rule's "per-partition lineage and metrics tables" names.

    ``added_snapshot_id`` is the per-file lineage column — the snapshot
    that first listed the file (see ``_added_map``).  On this flat
    layout the range-clustered FILE is the partition unit, so this
    table doubles as the ``.partitions`` analog; the day-partitioned ST
    layout additionally rolls it up per day in ``st_partitions_df``."""
    man = load_manifest(path, snapshot_id)
    added = _added_map(path, MANIFEST, SNAP_DIR, int(man.get("snapshot_id", 0)))
    return _files_df_from(spark, man, added)


def delete_files_df(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The snapshot's PENDING merge-on-read delete files as a DataFrame
    — the Iceberg ``.delete_files`` metadata-table analog: one row per
    delete file with its kind ('pos' = position pairs, 'eq' = key
    values), the equality key column (NULL for position files), row
    count, and target-file count. Answered from the manifest alone;
    empty after compaction materializes the chain."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    man = load_manifest(path, snapshot_id)
    schema = StructType(
        [
            StructField("file", StringType(), False),
            StructField("kind", StringType(), False),
            StructField("key", StringType(), True),
            StructField("rows", LongType(), False),
            StructField("n_targets", IntegerType(), False),
        ]
    )
    rows = [
        (
            d["file"],
            d.get("kind", "pos"),
            d.get("key"),
            int(d["rows"]),
            len(d["targets"]),
        )
        for d in man.get("deletes") or []
    ]
    return spark.createDataFrame(rows, schema)
