"""Structured Streaming SOURCE over a snapshot-versioned clustered
table — the Iceberg streaming-read analog, as a native PySpark data
source (`pyspark.sql.datasource`, Spark 4's Python Data Source API):

    spark.dataSource.register(ClusteredAppendsSource)
    df = (spark.readStream.format("clustered-appends")
            .option("path", table_path).load())

Semantics (shared with ``io.clustered.incremental_scan`` — both ride
``_incremental_added``):

- **offsets are snapshot ids.**  ``latestOffset`` is the table's
  current snapshot; each micro-batch covers the snapshot range
  ``(start, end]`` and its partitions are exactly the data files those
  commits APPENDED — so a batch never re-reads table history, and the
  degree of parallelism is the number of new files.
- **exactly-once comes from Spark's own offset log.**  The source
  stores nothing: Spark checkpoints the snapshot-id offsets, replays
  the same range on recovery, and the range's file list is a pure
  function of the immutable snapshot manifests.
- **append commits contribute; replace (compaction / re-cluster)
  commits are skipped** (they reorganize existing rows); a commit whose
  row-level effect is not pure insertion (overwrite of a non-empty
  table, delete, upsert, rollback) FAILS the stream — an incremental
  consumer cannot express row replacement and must re-bootstrap from a
  full scan, exactly Iceberg's incremental-append contract.  Pending
  MOR deletes never apply to the streamed files: delete/upsert commits
  (the only producers of delete files) are rejected above, so every
  streamed file is read as committed.
- **schema is the manifest's** (per-snapshot, add-column evolution):
  files written before an evolution stream with the CURRENT schema,
  missing columns as nulls — the same contract the batch readers pin.

At design scale this is the change-data feed of a 100 TB table: the
driver touches only manifest metadata per trigger, executors read only
the appended files, and a consumer that falls behind the snapshot
retention window fails loudly (expired range) instead of silently
skipping data.

No rate limiting (``maxFilesPerTrigger``): the Python stream-reader API
has no bounded-``latestOffset`` hook in Spark 4.1; a trigger consumes
everything since the last one, like the batch consumer loop.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from spatial4n_spark.io import clustered as C
from spatial4n_spark.io import st_clustered as ST


def _layout_names(layout: str) -> tuple[str, str]:
    if layout == "flat":
        return C.MANIFEST, C.SNAP_DIR
    if layout == "st":
        return ST.MANIFEST, ST.SNAP_DIR
    raise ValueError(f"unknown layout {layout!r}: expected 'flat' or 'st'")


@dataclass
class _AppendedFile(InputPartition):
    """One appended data file of one commit — the unit of read
    parallelism.  Carries everything ``read`` needs (it runs stateless
    on an executor): the absolute file path and the stream's arrow
    schema as JSON-able Spark DDL."""

    file_path: str
    schema_json: str


class _ClusteredStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._layout = options.get("layout", "flat")
        self._manifest, self._snap_dir = _layout_names(self._layout)
        self._from = int(options.get("fromsnapshot", 0))
        self._schema_json = schema.json()

    def _current(self) -> int:
        man = C._load_versioned(
            self._path, None, self._manifest, self._snap_dir
        )
        return int(man.get("snapshot_id", 0))

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._from}

    def latestOffset(self) -> dict:
        return {"snapshot_id": self._current()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        frm, to = int(start["snapshot_id"]), int(end["snapshot_id"])
        if to <= frm:
            return []
        out: list[InputPartition] = []
        for _man, files in C._incremental_added(
            self._path, frm, to, self._manifest, self._snap_dir
        ):
            out.extend(
                _AppendedFile(
                    os.path.join(self._path, rel), self._schema_json
                )
                for rel in files
            )
        return out

    def read(self, partition: _AppendedFile):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(
            StructType.fromJson(json.loads(partition.schema_json))
        )
        tbl = pq.read_table(partition.file_path)
        cols = []
        for field in want:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                # pre-evolution file: the column reads NULL, as in the
                # batch readers' per-snapshot schema contract
                cols.append(pa.nulls(len(tbl), type=field.type))
        yield from pa.table(cols, schema=want).to_batches()

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the source of truth


class ClusteredAppendsSource(DataSource):
    """``spark.readStream.format("clustered-appends")`` — see module
    docstring.  Options: ``path`` (table dir, required), ``layout``
    ('flat' default | 'st'), ``fromSnapshot`` (exclusive start offset
    for a FRESH checkpoint; default 0 = the whole table, its initial
    write counting as the seed batch)."""

    @classmethod
    def name(cls) -> str:
        return "clustered-appends"

    def schema(self) -> StructType:
        path = self.options["path"]
        manifest, snap_dir = _layout_names(self.options.get("layout", "flat"))
        man = C._load_versioned(path, None, manifest, snap_dir)
        sj = man.get("schema")
        if not sj:
            raise ValueError(
                f"clustered-appends source on {path}: the manifest carries "
                "no schema (pre-schema-evolution table) — run any commit "
                "(e.g. an empty append) to upgrade it"
            )
        return StructType.fromJson(json.loads(sj))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _ClusteredStreamReader(schema, dict(self.options))


def read_clustered_stream(
    spark: SparkSession,
    path: str,
    layout: str = "flat",
    from_snapshot: int | None = None,
) -> DataFrame:
    """Convenience wrapper: register the source (idempotent) and open
    the stream."""
    spark.dataSource.register(ClusteredAppendsSource)
    r = (
        spark.readStream.format("clustered-appends")
        .option("path", path)
        .option("layout", layout)
    )
    if from_snapshot is not None:
        r = r.option("fromSnapshot", int(from_snapshot))
    return r.load()
