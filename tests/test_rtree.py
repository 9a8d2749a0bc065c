"""Broadcast STR R-tree PIP join (plans/rtree.py,
operators/spatial_join.py::spatial_join_points_polygons_rtree) — the
north star's literally-named candidate plan beside the cell-cover
equi-join.

Contract under test:
- the packed tree's batch query returns EXACTLY the brute-force bbox
  candidate set (property test over random boxes/points, plus the
  degenerate single-box/empty-layer shapes);
- dateline-wrapping bboxes are split into both pages and matched on
  either side, deduped per feature;
- the join's RESULTS equal the broadcast cover join on the same layer
  (plan-invariance), and its physical plan has no join and no shuffle.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark.kernels.polygon import Polygon, Rect
from spatial4n_spark.operators.spatial_join import (
    spatial_join_points_polygons,
    spatial_join_points_polygons_rtree,
)
from spatial4n_spark.plans.rtree import STRtree, layer_rtree
from spatial4n_spark.suite import layer, pts_orders


def _brute_pairs(boxes, xs, ys):
    want = set()
    for j in range(len(boxes)):
        hit = np.where(
            (xs >= boxes[j, 0])
            & (xs <= boxes[j, 1])
            & (ys >= boxes[j, 2])
            & (ys <= boxes[j, 3])
        )[0]
        want.update((int(i), j) for i in hit)
    return want


@pytest.mark.parametrize("n,seed", [(1, 0), (15, 1), (16, 2), (17, 3), (777, 4)])
def test_query_matches_brute_force(n, seed):
    rng = np.random.default_rng(seed)
    minx = rng.uniform(-180, 175, n)
    miny = rng.uniform(-85, 80, n)
    boxes = np.stack(
        [minx, minx + rng.uniform(0, 8, n), miny, miny + rng.uniform(0, 8, n)],
        axis=1,
    )
    t = STRtree(boxes, np.arange(n))
    xs = rng.uniform(-180, 180, 1500)
    ys = rng.uniform(-85, 85, 1500)
    pi, oi = t.query_batch(xs, ys)
    assert set(zip(pi.tolist(), oi.tolist())) == _brute_pairs(boxes, xs, ys)


def test_empty_tree_and_empty_batch():
    t = STRtree(np.empty((0, 4)), np.empty(0, dtype=np.int64))
    pi, oi = t.query_batch(np.array([1.0]), np.array([2.0]))
    assert len(pi) == 0 and len(oi) == 0
    t2 = STRtree(np.array([[0.0, 1.0, 0.0, 1.0]]), np.array([0]))
    pi, oi = t2.query_batch(np.empty(0), np.empty(0))
    assert len(pi) == 0


def test_dateline_wrap_splits_and_dedupes():
    # a rect crossing the dateline: 170..-170 (Rect.cs wrap semantics)
    tree, pids = layer_rtree([("w", Rect(170.0, -170.0, -10.0, 10.0))])
    xs = np.array([175.0, -175.0, 0.0, 180.0, -180.0])
    ys = np.zeros(5)
    pi, oi = tree.query_batch(xs, ys)
    pairs = sorted(zip(pi.tolist(), oi.tolist()))
    # both pages match, each point at most once; lon 0 misses
    assert pairs == [(0, 0), (1, 0), (3, 0), (4, 0)]
    assert pids == ["w"]


def test_join_equals_cover_join_and_plan_has_no_shuffle(spark, sf_dir):
    pts = pts_orders(spark, sf_dir)
    a = spatial_join_points_polygons(pts, layer(), level=3, index="s2").select(
        "o_orderkey", "poly_id"
    )
    b = spatial_join_points_polygons_rtree(pts, layer()).select(
        "o_orderkey", "poly_id"
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle
    assert "Join" not in plan  # no join operator at all


def test_join_covers_semantics_on_boundary(spark):
    # boundary points count as covered (NtsGeometry.cs:341-346 parity,
    # same kernel as every other PIP path)
    square = Polygon([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 0.0, 5.0), (3, 10.0, 10.0), (4, 10.5, 5.0)],
        "id long, lon double, lat double",
    )
    got = sorted(
        r["id"]
        for r in spatial_join_points_polygons_rtree(pts, [("sq", square)]).collect()
    )
    assert got == [1, 2, 3]
