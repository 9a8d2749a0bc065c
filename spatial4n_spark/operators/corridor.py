"""Corridor (trajectory) join: points within a buffered polyline.

The buffered-line analog of the PIP spatial join (SURVEY.md §2.2
buffered line x point): per route, build the BufferedLineString with the
reference's longitude-skew buffer expansion, cover it with geohash cells
(quadtree planner), broadcast the cover, then refine candidates with the
vectorized two-line containment kernel. The points side never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

from spatial4n_spark.functions.udfs import geohash_udf
from spatial4n_spark.kernels.bufline import BufLineString
from spatial4n_spark.kernels.distance import km_to_deg
from spatial4n_spark.plans.cover import cover_cells


def _route_shapes(routes) -> dict[str, BufLineString]:
    out = {}
    for route_id, coords, buf_km in routes:
        buf_deg = float(km_to_deg(buf_km))
        out[route_id] = BufLineString(coords, buf_deg, expand_geo_skew=True)
    return out


def corridor_contains_udf(shapes: dict[str, BufLineString]):
    """(lon, lat, route_id) -> inside-corridor boolean, batched per route."""

    @F.pandas_udf(BooleanType())
    def _contains(lon: pd.Series, lat: pd.Series, route_id: pd.Series) -> pd.Series:
        x = lon.to_numpy(np.float64)
        y = lat.to_numpy(np.float64)
        rid = route_id.to_numpy()
        out = np.zeros(len(x), dtype=bool)
        for r in pd.unique(rid):
            shape = shapes.get(r)
            if shape is None:
                continue
            mask = rid == r
            out[mask] = shape.contains(x[mask], y[mask])
        return pd.Series(out)

    return _contains


def corridor_join(
    points: DataFrame,
    routes: list[tuple[str, list, float]],
    lon: str = "lon",
    lat: str = "lat",
    level: int = 3,
) -> DataFrame:
    """``routes``: [(route_id, [(lon, lat), ...], buffer_km)].

    Returns the points' columns + ``route_id`` for points inside the
    buffered corridor.
    """
    spark = points.sparkSession
    shapes = _route_shapes(routes)
    rows = []
    for rid, shape in shapes.items():
        fulls, bounds = cover_cells(shape, level)
        for c in fulls:
            rows.append((c, rid, True))
        for c in bounds:
            rows.append((c, rid, False))
    cover_df = spark.createDataFrame(rows, "_cell string, route_id string, _full boolean")

    pts = points.withColumn("_cell", geohash_udf(level)(F.col(lat), F.col(lon)))
    cand = pts.join(F.broadcast(cover_df), "_cell")
    inside = corridor_contains_udf(shapes)
    out = cand.where(F.col("_full") | inside(F.col(lon), F.col(lat), F.col("route_id")))
    return out.drop("_cell", "_full")
