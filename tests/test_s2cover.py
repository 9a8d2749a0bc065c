"""S2 cell-cover planner (plans/s2cover.py) and the S2-index PIP join.

Soundness contract (same as the geohash planner): covered points must
never be pruned, and 'full' cells must contain only covered points —
conservative ties go to 'boundary', which exact refinement resolves.
"""

from __future__ import annotations

import numpy as np
import pytest

from spatial4n_spark.kernels.s2cell import s2_encode
from spatial4n_spark.plans.cover import points_covered
from spatial4n_spark.plans.s2cover import cover_cells_s2, s2_cell_bbox_pieces
from spatial4n_spark.suite import layer


def _lattice(step: int = 8):
    xs = (np.arange(4096) * 45.0 / 512.0 - 180.0)[::step]
    ys = (np.arange(2048) * 45.0 / 512.0 - 90.0)[::step]
    gx, gy = np.meshgrid(xs, ys)
    return gx.ravel(), gy.ravel()


class TestCellBbox:
    @pytest.mark.parametrize("level", [0, 1, 2, 4, 8, 14])
    def test_point_in_own_cell_bbox(self, level):
        """Every point's lat/lon lies inside the bbox pieces of the cell
        it encodes to — including poles, the dateline seam (both signs),
        and cube-face boundaries."""
        rng = np.random.default_rng(level)
        lat = np.concatenate(
            [rng.uniform(-90, 90, 3000),
             [90.0, -90.0, 0.0, 0.0, 66.0, -66.0, 12.3, 12.3, 45.0, 35.3]]
        )
        lon = np.concatenate(
            [rng.uniform(-180, 180, 3000),
             [0.0, 0.0, 180.0, -180.0, 180.0, -180.0, -180.0, 180.0, 45.0, 44.9]]
        )
        cells = s2_encode(lat, lon, level)
        for k in range(len(lat)):
            pieces = s2_cell_bbox_pieces(int(cells[k]), level)
            assert any(
                p[0] <= lon[k] <= p[1] and p[2] <= lat[k] <= p[3] for p in pieces
            ), (level, lat[k], lon[k], pieces)

    def test_pieces_are_plain_rects(self):
        """No piece wraps (min <= max) and all stay inside the world."""
        rng = np.random.default_rng(3)
        lat = rng.uniform(-90, 90, 500)
        lon = rng.uniform(-180, 180, 500)
        for level in (1, 3, 6):
            for c in s2_encode(lat, lon, level):
                for x0, x1, y0, y1 in s2_cell_bbox_pieces(int(c), level):
                    assert -180.0 <= x0 <= x1 <= 180.0
                    assert -90.0 <= y0 <= y1 <= 90.0


class TestCover:
    @pytest.mark.parametrize("level", [3, 4])
    def test_cover_sound_for_layer(self, level):
        """For every layer shape: no covered lattice point is pruned, and
        no uncovered point lands in a 'full' cell."""
        gx, gy = _lattice(step=8)
        for pid, shape in layer():
            full, boundary = cover_cells_s2(shape, level)
            fset, aset = set(full), set(full) | set(boundary)
            cells = s2_encode(gy, gx, level)
            cov = points_covered(gx, gy, shape, True)
            in_full = np.fromiter((int(c) in fset for c in cells), bool, len(cells))
            in_any = np.fromiter((int(c) in aset for c in cells), bool, len(cells))
            assert not (cov & ~in_any).any(), f"{pid}: covered point pruned"
            assert not (in_full & ~cov).any(), f"{pid}: full cell has outside point"

    def test_uniform_level_and_disjoint(self):
        """Cover cells are at the uniform join level (face in 0..5 after
        the level shift) and full/boundary sets are disjoint."""
        for pid, shape in layer():
            full, boundary = cover_cells_s2(shape, 4)
            assert not (set(full) & set(boundary)), pid
            for c in list(full)[:50] + list(boundary)[:50]:
                assert 0 <= (c >> 8) <= 5, pid

    def test_cover_cache(self):
        shape = layer()[0][1]
        a = cover_cells_s2(shape, 3)
        b = cover_cells_s2(shape, 3)
        assert a is b  # memoized per (shape, level)

    def test_max_cells_cap(self):
        from spatial4n_spark.kernels.polygon import Rect

        with pytest.raises(ValueError, match="exceeds"):
            cover_cells_s2(Rect(-179.0, 179.0, -89.0, 89.0), 8, max_cells=16)


class TestSparkJoin:
    def test_s2_join_equals_geohash_join(self, spark, sf_dir):
        from spatial4n_spark.operators.spatial_join import (
            spatial_join_points_polygons,
        )
        from spatial4n_spark.suite import pts_orders

        pts = pts_orders(spark, sf_dir)
        a = spatial_join_points_polygons(pts, layer(), level=3)
        b = spatial_join_points_polygons(pts, layer(), level=3, index="s2")
        ka = {(r["o_orderkey"], r["poly_id"]) for r in a.collect()}
        kb = {(r["o_orderkey"], r["poly_id"]) for r in b.collect()}
        assert ka == kb and len(ka) > 0

    def test_unknown_index_raises(self, spark, sf_dir):
        from spatial4n_spark.operators.spatial_join import (
            spatial_join_points_polygons,
        )
        from spatial4n_spark.suite import pts_orders

        with pytest.raises(ValueError, match="backend"):
            spatial_join_points_polygons(
                pts_orders(spark, sf_dir), layer(), level=3, index="quadkey"
            )


class TestRadiusJoinS2:
    def test_s2_radius_equals_geohash(self, spark, sf_dir):
        from spatial4n_spark.operators.distance_join import radius_join
        from spatial4n_spark.suite import RADIUS_CENTERS, pts_orders

        pts = pts_orders(spark, sf_dir)
        a = radius_join(pts, RADIUS_CENTERS, level=3, with_distance=False)
        b = radius_join(pts, RADIUS_CENTERS, level=3, with_distance=False, index="s2")
        ka = {(r["query_id"], r["o_orderkey"]) for r in a.collect()}
        kb = {(r["query_id"], r["o_orderkey"]) for r in b.collect()}
        assert ka == kb and len(ka) > 0


def test_max_cells_cap_raises_before_expansion():
    """The projected-size check runs BEFORE a CONTAINS cell expands its
    4^(level-depth) leaves: a near-world rect at a fine level must raise
    immediately instead of first allocating the multi-GB expansion."""
    import time

    from spatial4n_spark.kernels.polygon import Rect

    t0 = time.time()
    with pytest.raises(ValueError, match="exceeds"):
        cover_cells_s2(Rect(-179.5, 179.5, -89.5, 89.5), 14, max_cells=4096)
    assert time.time() - t0 < 10.0


def test_geohash_cover_max_cells_raises_before_expansion():
    """Same pre-expansion guard for the geohash planner: a near-world
    rect at a fine level raises without materializing 32^k leaves."""
    import time

    from spatial4n_spark.kernels.polygon import Rect
    from spatial4n_spark.plans.cover import cover_cells

    t0 = time.time()
    with pytest.raises(ValueError, match="exceeds"):
        cover_cells(Rect(-179.5, 179.5, -89.5, 89.5), 8, max_cells=4096)
    assert time.time() - t0 < 10.0
