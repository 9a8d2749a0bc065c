"""kNN: cell-ring candidate generation + exact-distance Window top-k.

SURVEY.md §2.9: for each query point, candidates come from its geohash
cell plus expanding neighbor rings; exact haversine ranks them with a
row_number window partitioned by query. Ring expansion repeats (bounded
rounds) for queries whose k-th neighbor distance exceeds the
guaranteed-covered radius — the correctness condition for cell-pruned
kNN. Reference analog: the GetSubGeohashes ring expansion
(GeohashUtils.cs:219-228) run as a relational join.

Two surfaces over one engine (``knn_join_df``):
- ``knn_join_df(points, queries_df)`` — queries as a DataFrame. Ring
  cells are enumerated by a vectorized Arrow stage (``mapInPandas``),
  candidates come from an equi-join on the cell key (broadcast under a
  size bound, shuffle-by-cell above it), and acceptance/retry is pure
  DataFrame algebra (aggregate + anti-join) — nothing per-query ever
  crosses the driver, so a 10^6-query batch holds flat driver memory.
- ``knn_join(points, [(qid, lon, lat), ...])`` — the small-list
  convenience wrapper; delegates to the DataFrame path.

The top-k window shuffle is keyed by query_id (bounded candidates x k
rows), never by the points table.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from spatial4n_spark.functions.native import haversine_km
from spatial4n_spark.functions.udfs import geohash_udf
from spatial4n_spark.kernels.distance import deg_to_km
from spatial4n_spark.kernels.geohash import (
    geohash_cell_sizes,
    geohash_encode_str,
)


def _ring_cells_frame(qid, qlon, qlat, level: int, rings: int):
    """Vectorized ring-block enumeration for a batch of queries:
    decode each center cell, offset the (2r+1)^2 block by integer cell
    sizes, wrap lon / drop beyond-pole rows, re-encode, dedup per query.
    Returns a pandas frame (query_id, _qlon, _qlat, _cell)."""
    import pandas as pd

    from spatial4n_spark.kernels.geohash import geohash_decode_bbox

    qid = np.asarray(qid)
    qlon = np.asarray(qlon, dtype=np.float64)
    qlat = np.asarray(qlat, dtype=np.float64)
    centers = geohash_encode_str(qlat, qlon, level)
    if rings == 0:
        return pd.DataFrame(
            {"query_id": qid, "_qlon": qlon, "_qlat": qlat, "_cell": centers}
        )
    lat_h, lon_w = geohash_cell_sizes(level)
    mnx, mxx, mny, mxy = geohash_decode_bbox(centers)
    cx = (np.asarray(mnx) + np.asarray(mxx)) * 0.5
    cy = (np.asarray(mny) + np.asarray(mxy)) * 0.5
    off = np.arange(-rings, rings + 1, dtype=np.float64)
    ox, oy = np.meshgrid(off * lon_w, off * lat_h)
    ox, oy = ox.ravel(), oy.ravel()
    gx = ((cx[:, None] + ox[None, :] + 180.0) % 360.0) - 180.0
    gy = cy[:, None] + oy[None, :]
    ri, ci = np.nonzero((gy > -90.0) & (gy < 90.0))
    cells = geohash_encode_str(gy[ri, ci], gx[ri, ci], level)
    out = pd.DataFrame({"_row": ri, "_cell": cells}).drop_duplicates()
    rows = out["_row"].to_numpy()
    out["query_id"] = qid[rows]
    out["_qlon"] = qlon[rows]
    out["_qlat"] = qlat[rows]
    return out[["query_id", "_qlon", "_qlat", "_cell"]]


def _ring_cells(qlon: float, qlat: float, level: int, rings: int) -> set[str]:
    """All cells within ``rings`` of one query's cell (batch path, n=1)."""
    return set(
        _ring_cells_frame(np.array(["q"]), [qlon], [qlat], level, rings)["_cell"]
    )


def _covered_radius_km(qlat: float, level: int, rings: int) -> float:
    """Conservative radius fully covered by `rings` rings around the query cell."""
    lat_h, lon_w = geohash_cell_sizes(level)
    # smallest distance from the query point to outside the ring block:
    # at least `rings` cells in latitude; longitude shrinks by cos(lat)
    lat_km = float(deg_to_km(rings * lat_h))
    lon_km = float(deg_to_km(rings * lon_w)) * max(
        math.cos(math.radians(abs(qlat) + rings * lat_h)), 0.0
    )
    return max(min(lat_km, lon_km), 0.0)


def _covered_radius_col(qlat_col, level: int, rings: int):
    """Column twin of ``_covered_radius_km`` (same formula, JVM-side)."""
    lat_h, lon_w = geohash_cell_sizes(level)
    lat_km = float(deg_to_km(rings * lat_h))
    lon_flat = float(deg_to_km(rings * lon_w))
    cosf = F.greatest(
        F.cos(F.radians(F.abs(qlat_col) + F.lit(float(rings * lat_h)))), F.lit(0.0)
    )
    return F.greatest(F.least(F.lit(lat_km), F.lit(lon_flat) * cosf), F.lit(0.0))


def knn_join_df(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "image_id",
    query_id: str = "query_id",
    qlon: str = "qlon",
    qlat: str = "qlat",
    level: int = 3,
    max_rounds: int = 4,
    estimated_total: int | None = None,
    broadcast_cells: int = 200_000,
) -> DataFrame:
    """Exact kNN join, queries as a DataFrame. Returns
    (query_id, <id_col>, dist_km, rank); ties break on <id_col>.

    Per round: a ``mapInPandas`` stage expands every pending query into
    its ring-block cells; the cell equi-join against the encoded points
    yields candidates (broadcast when the cell table is provably small,
    else a shuffle join on the cell key — the 10^6-query plan); a
    query-partitioned window takes top-k; a per-query aggregate accepts
    queries whose k-th distance is inside the covered radius, and an
    anti-join carries the rest into the next round with doubled rings.
    The one heavy job per round is the materialized top-k
    (localCheckpoint, <= |pending| * k rows).
    """
    spark = points.sparkSession
    qid_type = queries.schema[query_id].dataType.simpleString()
    id_type = points.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_type}, {id_col} {id_type}, dist_km double, rank int"
    cells_schema = f"query_id {qid_type}, _qlon double, _qlat double, _cell string"

    pts = points.withColumn("_cell", geohash_udf(level)(F.col(lat), F.col(lon)))
    pts = pts.select(id_col, lon, lat, "_cell").persist()

    pending = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(qlon).cast("double").alias("_qlon"),
        F.col(qlat).cast("double").alias("_qlat"),
    ).localCheckpoint(eager=True)
    n_pending = pending.count()

    n_total = estimated_total if estimated_total is not None else pts.count()
    n_cells_world = 32**level
    density = max(n_total / n_cells_world, 1e-9)  # rows per cell (uniform est.)
    # cells needed for ~4x k candidates; ring r covers (2r+1)^2 cells
    cells_needed = 4.0 * k / density
    rings0 = max(1, math.ceil((math.sqrt(cells_needed) - 1) / 2))

    rings = rings0
    accepted: list[DataFrame] = []
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col(id_col).asc()
    )

    # if the density-sized block already covers a big fraction of the
    # world's cells, ring pruning cannot help — go straight to the exact
    # brute-force fallback, which is cheap precisely when the table is
    # that sparse (ring search is the win on dense tables)
    rounds = max_rounds if (2 * rings0 + 1) ** 2 < n_cells_world // 4 else 0

    def cells_gen(r: int):
        # closure factory: bind the ring count by value per round
        def gen(it):
            for pdf in it:
                if len(pdf):
                    yield _ring_cells_frame(
                        pdf["query_id"], pdf["_qlon"], pdf["_qlat"], level, r
                    )

        return gen

    for _ in range(rounds):
        if n_pending == 0:
            break
        if (2 * rings + 1) ** 2 >= n_cells_world // 4:
            break  # doubled past the useful range: fall back
        cells = pending.mapInPandas(cells_gen(rings), cells_schema)
        if n_pending * (2 * rings + 1) ** 2 <= broadcast_cells:
            cand = pts.join(F.broadcast(cells), "_cell")
        else:
            # the at-scale plan: both sides shuffle on the cell key (AQE
            # handles hot-cell skew); the points side never broadcasts
            cand = pts.join(cells, "_cell")
        ranked = (
            cand.withColumn(
                "dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat")
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank", "_qlat")
        )
        # ONE heavy Spark job per round: materialize the bounded top-k
        # (<= |pending| * k rows) and truncate lineage; acceptance and
        # the next round's anti-join read the materialized result
        ranked = ranked.localCheckpoint(eager=True)
        accepted_ids = (
            ranked.groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.max("dist_km").alias("_dmax"),
                F.first("_qlat").alias("_qlat"),
            )
            .where(
                (F.col("_n") >= k)
                & (F.col("_dmax") <= _covered_radius_col(F.col("_qlat"), level, rings))
            )
            .select("query_id")
        )
        accepted.append(
            ranked.join(F.broadcast(accepted_ids), "query_id").select(
                "query_id", id_col, "dist_km", "rank"
            )
        )
        pending = pending.join(
            F.broadcast(accepted_ids), "query_id", "left_anti"
        ).localCheckpoint(eager=True)
        n_pending = pending.count()
        rings *= 2

    if n_pending:
        # final fallback: exact brute force for the stragglers (pole/sparse
        # regions). Broadcast whichever side is smaller: a sparse points
        # table (the usual reason ring pruning failed) broadcasts against
        # a large query set; a small straggler set broadcasts against a
        # dense table — either way the shuffle is keyed by query_id only.
        p = points.select(id_col, lon, lat)
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

    pts.unpersist()
    if not accepted:
        return spark.createDataFrame([], out_schema)
    out = accepted[0]
    for df in accepted[1:]:
        out = out.unionAll(df)
    return out


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
    """``queries``: [(query_id, qlon, qlat)]. Returns (query_id, <id_col>,
    dist_km, rank); ties break on <id_col> for determinism.

    The driver-list fast path: for a bounded query set (dashboards, the
    gate's 4 centers) the ring cells compose driver-side and the
    acceptance summary collects (<= |queries| rows), so each round is ONE
    heavy Spark job — none of the bookkeeping joins the DataFrame path
    needs. Large query batches (10^5+) use ``knn_join_df``, which keeps
    every per-query structure distributed; a list this size should never
    exist driver-side in the first place.
    """
    spark = points.sparkSession
    pts = points.withColumn("_cell", geohash_udf(level)(F.col(lat), F.col(lon)))
    pts = pts.select(id_col, lon, lat, "_cell")
    # the encoded points are re-scanned by every ring-expansion round (and
    # by the brute-force fallback): cache them across rounds — the iterative
    # reuse pattern, not a driver-side materialization
    pts = pts.persist()

    n_total = estimated_total if estimated_total is not None else pts.count()
    n_cells_world = 32**level
    density = max(n_total / n_cells_world, 1e-9)  # rows per cell (uniform est.)
    # cells needed for ~4x k candidates; ring r covers (2r+1)^2 cells
    cells_needed = 4.0 * k / density
    rings0 = max(1, math.ceil((math.sqrt(cells_needed) - 1) / 2))

    pending = {qid: (qlon_v, qlat_v) for qid, qlon_v, qlat_v in queries}
    rings = rings0
    accepted: list[DataFrame] = []
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col(id_col).asc()
    )
    out_schema = (
        f"query_id string, {id_col} {points.schema[id_col].dataType.simpleString()},"
        " dist_km double, rank int"
    )

    rounds = max_rounds if (2 * rings0 + 1) ** 2 < n_cells_world // 4 else 0

    for _ in range(rounds):
        if not pending:
            break
        if (2 * rings + 1) ** 2 >= n_cells_world // 4:
            break  # doubled past the useful range: fall back
        qids = list(pending)
        cells_pd = _ring_cells_frame(
            qids,
            [pending[q][0] for q in qids],
            [pending[q][1] for q in qids],
            level,
            rings,
        )
        cand_df = spark.createDataFrame(
            cells_pd[["_cell", "query_id", "_qlon", "_qlat"]],
            "_cell string, query_id string, _qlon double, _qlat double",
        )
        cand = pts.join(F.broadcast(cand_df), "_cell")
        ranked = (
            cand.withColumn(
                "dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat")
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "dist_km", "rank")
        )
        # ONE Spark job per round: materialize the bounded top-k
        # (<= |pending| * k rows) and truncate lineage; the acceptance
        # summary and the accepted-rows filter below read the
        # materialized result, never re-running the join
        ranked = ranked.localCheckpoint(eager=True)
        summ = (
            ranked.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("dist_km").alias("dmax"))
            .collect()
        )
        info = {r["query_id"]: (r["n"], r["dmax"]) for r in summ}
        ok = [
            qid
            for qid, (_, qlat_v) in pending.items()
            if info.get(qid, (0, None))[0] >= k
            and info[qid][1] <= _covered_radius_km(qlat_v, level, rings)
        ]
        if ok:
            accepted.append(ranked.where(F.col("query_id").isin(ok)))
        ok_set = set(ok)
        pending = {qid: v for qid, v in pending.items() if qid not in ok_set}
        rings *= 2

    if pending:
        # final fallback: exact brute force for the stragglers (pole/sparse
        # regions) — still a broadcast join, no big-side shuffle
        rows = [(qid, a, b) for qid, (a, b) in pending.items()]
        q_df = spark.createDataFrame(rows, "query_id string, _qlon double, _qlat double")
        fb = (
            points.select(id_col, lon, lat)
            .crossJoin(F.broadcast(q_df))
            .withColumn(
                "dist_km", haversine_km(F.col(lon), F.col(lat), "_qlon", "_qlat")
            )
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
