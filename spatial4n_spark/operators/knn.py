"""kNN: cell-ring candidate generation + exact-distance Window top-k.

SURVEY.md §2.9: for each query point, candidates come from its geohash
cell plus expanding neighbor rings; exact haversine ranks them with a
row_number window partitioned by query. Ring expansion repeats (driver
loop, bounded) for queries whose k-th neighbor distance exceeds the
guaranteed-covered radius — the correctness condition for cell-pruned kNN.

The window shuffle is keyed by query_id (bounded cardinality x k rows),
never by the points table, so the big side only streams through the
broadcast candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.functions.udfs import geohash_udf
from spatial4n_spark.kernels.distance import deg_to_km
from spatial4n_spark.kernels.geohash import (
    geohash_cell_sizes,
    geohash_encode_str,
)


def _ring_cells(qlon: float, qlat: float, level: int, rings: int) -> set[str]:
    """All cells within ``rings`` of the query's cell — enumerated as one
    vectorized (2r+1)^2 block (decode the center cell, offset the block's
    cell centers by integer cell sizes, re-encode), not a per-cell BFS:
    the BFS was the driver-side hot spot when sparse data forced large
    rings."""
    import numpy as np

    from spatial4n_spark.kernels.geohash import geohash_decode_bbox

    center = geohash_encode_str([qlat], [qlon], level)[0]
    if rings == 0:
        return {center}
    lat_h, lon_w = geohash_cell_sizes(level)
    mnx, mxx, mny, mxy = geohash_decode_bbox([center])
    cx = (float(mnx[0]) + float(mxx[0])) * 0.5
    cy = (float(mny[0]) + float(mxy[0])) * 0.5
    off = np.arange(-rings, rings + 1, dtype=np.float64)
    gx, gy = np.meshgrid(cx + off * lon_w, cy + off * lat_h)
    gx = gx.ravel()
    gy = gy.ravel()
    # wrap lon to [-180, 180); drop rows beyond the poles (no wrap in lat)
    gx = ((gx + 180.0) % 360.0) - 180.0
    keep = (gy > -90.0) & (gy < 90.0)
    return set(geohash_encode_str(gy[keep], gx[keep], level))


def _covered_radius_km(qlat: float, level: int, rings: int) -> float:
    """Conservative radius fully covered by `rings` rings around the query cell."""
    lat_h, lon_w = geohash_cell_sizes(level)
    import math

    # smallest distance from the query point to outside the ring block:
    # at least `rings` cells in latitude; longitude shrinks by cos(lat)
    lat_km = float(deg_to_km(rings * lat_h))
    lon_km = float(deg_to_km(rings * lon_w)) * max(math.cos(math.radians(abs(qlat) + rings * lat_h)), 0.0)
    return max(min(lat_km, lon_km), 0.0)


def knn_join(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "image_id",
    level: int = 3,
    max_rounds: int = 4,
    estimated_total: int | None = None,
) -> DataFrame:
    """``queries``: [(query_id, qlon, qlat)]. Returns (query_id, <id_col>, dist_km, rank).

    Exact kNN: after each round, a query's result is accepted only if its
    k-th distance is within the radius guaranteed covered by the rings it
    searched; otherwise the ring set doubles (bounded driver loop).
    Ties break on <id_col> for determinism.

    The initial ring count is pre-sized from a density estimate (rows /
    world cells at ``level``) so typical queries pass the acceptance
    check in round 1 instead of rescanning per expansion; pass
    ``estimated_total`` to skip the count job when the size is known.
    """
    spark = points.sparkSession
    id_type = points.schema[id_col].dataType.simpleString()
    out_schema = f"query_id string, {id_col} {id_type}, dist_km double, rank int"
    pts = points.withColumn("_cell", geohash_udf(level)(F.col(lat), F.col(lon)))
    pts = pts.select(id_col, lon, lat, "_cell")
    # the encoded points are re-scanned by every ring-expansion round (and
    # by the brute-force fallback): cache them across rounds — the iterative
    # reuse pattern, not a driver-side materialization
    pts = pts.persist()

    n_total = estimated_total if estimated_total is not None else pts.count()
    n_cells_world = 32 ** level
    density = max(n_total / n_cells_world, 1e-9)  # rows per cell (uniform est.)
    # cells needed for ~4x k candidates; ring r covers (2r+1)^2 cells
    import math

    cells_needed = 4.0 * k / density
    rings0 = max(1, math.ceil((math.sqrt(cells_needed) - 1) / 2))

    pending = {qid: (qlon, qlat) for qid, qlon, qlat in queries}
    rings = rings0
    accepted: list[DataFrame] = []
    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col(id_col).asc())

    # if the density-sized block already covers a big fraction of the
    # world's cells, ring pruning cannot help — go straight to the exact
    # brute-force fallback, which is cheap precisely when the table is
    # that sparse (ring search is the win on dense tables)
    rounds = max_rounds if (2 * rings0 + 1) ** 2 < n_cells_world // 4 else 0

    for _ in range(rounds):
        if not pending:
            break
        if (2 * rings + 1) ** 2 >= n_cells_world // 4:
            break  # doubled past the useful range: fall back
        rows = []
        for qid, (qlon, qlat) in pending.items():
            for c in _ring_cells(qlon, qlat, level, rings):
                rows.append((c, qid, qlon, qlat))
        cand_df = spark.createDataFrame(rows, "_cell string, query_id string, _qlon double, _qlat double")
        cand = pts.join(F.broadcast(cand_df), "_cell")
        ranked = (
            cand.withColumn("dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank")
        )
        # ONE Spark job per round: materialize the bounded top-k
        # (<= |pending| * k rows) and truncate lineage; the acceptance
        # summary and the accepted-rows filter below read the
        # materialized result, never re-running the join
        ranked = ranked.localCheckpoint(eager=True)
        summ = ranked.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("dist_km").alias("dmax")
        ).collect()
        info = {r["query_id"]: (r["n"], r["dmax"]) for r in summ}
        ok = [
            qid
            for qid, (qlon, qlat) in pending.items()
            if info.get(qid, (0, None))[0] >= k
            and info[qid][1] <= _covered_radius_km(qlat, level, rings)
        ]
        if ok:
            accepted.append(ranked.where(F.col("query_id").isin(ok)))
        ok_set = set(ok)
        pending = {qid: v for qid, v in pending.items() if qid not in ok_set}
        rings *= 2

    if pending:
        # final fallback: exact brute force for the stragglers (pole/sparse
        # regions) — still a broadcast join, no big-side shuffle
        rows = [(qid, qlon, qlat) for qid, (qlon, qlat) in pending.items()]
        q_df = spark.createDataFrame(rows, "query_id string, _qlon double, _qlat double")
        fb = (
            points.select(id_col, lon, lat)
            .crossJoin(F.broadcast(q_df))
            .withColumn("dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank")
        )
        accepted.append(fb.localCheckpoint(eager=True))

    pts.unpersist()
    if not accepted:
        return spark.createDataFrame([], out_schema)
    out = accepted[0]
    for df in accepted[1:]:
        out = out.unionAll(df)
    return out
