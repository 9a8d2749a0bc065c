"""Custom stateful streaming operator: per-user spatial sessionization.

``applyInPandasWithState`` (the engine's arbitrary-stateful-processing
surface — SURVEY.md §2.9 custom operators, path (b)): consecutive events
of a user belong to one session while gaps stay under ``gap_minutes``; a
longer gap closes the session and emits one row (user, start, end,
n_events, n_cells, first/last cell). Open sessions live in the state
store across micro-batches and survive restarts via the checkpoint.

State is one row per user (bounded by distinct users, not events); the
shuffle key is user_id (uniform).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spatial4n_spark.functions.udfs import geohash_udf

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, n_cells int, first_cell string, last_cell string"
)
STATE_SCHEMA = "start long, last long, n int, cells string, first_cell string"

_NS = 1_000_000_000  # pandas datetime64[ns] -> epoch nanoseconds


def _sessionize_fn(gap_minutes: float):
    gap_ns = int(gap_minutes * 60 * _NS)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts")
        ts_ns = pd.to_datetime(rows["ts"]).astype("int64").tolist()
        cells = rows["cell"].tolist()

        if state.exists:
            start, last, n, cell_csv, first_cell = state.get
            seen = cell_csv.split(",") if cell_csv else []
        else:
            start = last = None
            n = 0
            seen = []
            first_cell = None

        closed = []
        for t, c in zip(ts_ns, cells):
            if last is not None and t - last > gap_ns:
                closed.append((key[0], start, last, n, len(set(seen)), first_cell, seen[-1]))
                start, n, seen, first_cell = None, 0, [], None
            if start is None:
                start, first_cell = t, c
            last = t
            n += 1
            seen.append(c)

        state.update((start, last, n, ",".join(seen), first_cell))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in closed],
                    "session_start": pd.to_datetime([r[1] for r in closed], unit="ns"),
                    "session_end": pd.to_datetime([r[2] for r in closed], unit="ns"),
                    "n_events": [r[3] for r in closed],
                    "n_cells": [r[4] for r in closed],
                    "first_cell": [r[5] for r in closed],
                    "last_cell": [r[6] for r in closed],
                }
            )

    return fn


def spatial_sessions(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    level: int = 4,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Emit closed spatial sessions per user (one state row per user)."""
    cells = stream.withColumn("cell", geohash_udf(level)(F.col(lat), F.col(lon)))
    return cells.select("user_id", "ts", "cell").groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
