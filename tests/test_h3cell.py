"""H3-style hex cell backend: kernel properties, DuckDB oracle
bit-parity, cover soundness, and backend-swapped Spark operators
(kernels/h3cell.py, oracles_h3.py, plans/h3cover.py).

The reference's only grid is geohash (GeohashUtils.cs:78-144); the hex
backend is this engine's third cell index behind the same surface — the
north star's "H3/S2 cells via batched cell-encode UDFs", H3 half.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from spatial4n_spark.kernels.h3cell import (
    MAX_LEVEL,
    SQRT3_2,
    h3_cell_bbox,
    h3_decode_center,
    h3_encode,
    h3_from_qr,
    h3_level,
    h3_neighbors,
    h3_qr,
    hex_size,
)


def _rand_pts(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-90, 90, n), rng.uniform(-180, 180, n)


ADVERSARIAL_LAT = np.array(
    [0.0, 90.0, -90.0, 45.0, -45.0, 1e-15, -1e-15, 89.999999, 0.5, 22.5, -67.5]
)
ADVERSARIAL_LON = np.array(
    [0.0, 180.0, -180.0, 179.999999, -179.999999, 1e-15, -1e-15, 90.0, 45.0, -45.0, 135.0]
)


class TestKernel:
    @pytest.mark.parametrize("level", [0, 3, 7, 12, MAX_LEVEL])
    def test_qr_roundtrip_and_level(self, level):
        lat, lon = _rand_pts(20000)
        c = h3_encode(lat, lon, level)
        q, r = h3_qr(c)
        assert np.array_equal(h3_from_qr(q, r, level), c)
        assert np.all(h3_level(c) == level)

    @pytest.mark.parametrize("level", [0, 5, 12])
    def test_point_within_own_cell_bbox(self, level):
        lat, lon = _rand_pts(20000, seed=11)
        c = h3_encode(lat, lon, level)
        mnx, mxx, mny, mxy = h3_cell_bbox(c, level)
        eps = 1e-9
        assert np.all((lon >= mnx - eps) & (lon <= mxx + eps))
        assert np.all((lat >= mny - eps) & (lat <= mxy + eps))

    def test_voronoi_nearest_center(self):
        """Cube rounding assigns each point to the hex whose center is
        nearest on the (lon, lat) plane — checked against self + the 6
        edge neighbors."""
        level = 5
        lat, lon = _rand_pts(300, seed=13)
        c = h3_encode(lat, lon, level)
        for i in range(len(lat)):
            cands = np.asarray(
                h3_neighbors(int(c[i]), level, include_self=True), dtype=np.int64
            )
            ca, co = h3_decode_center(cands, level)
            d = (co - lon[i]) ** 2 + (ca - lat[i]) ** 2
            assert cands[np.argmin(d)] == c[i]

    def test_neighbors_are_six_at_unit_distance(self):
        level = 4
        cell = int(h3_encode(np.array([12.3]), np.array([45.6]), level)[0])
        nbrs = h3_neighbors(cell, level)
        assert len(nbrs) == 6
        ca0, co0 = h3_decode_center(np.array([cell]), level)
        ca, co = h3_decode_center(np.asarray(nbrs, dtype=np.int64), level)
        d = np.sqrt((co - co0[0]) ** 2 + (ca - ca0[0]) ** 2)
        # center-to-center distance of edge-adjacent pointy-top hexes is
        # sqrt(3) * s for all six
        s = hex_size(level)
        assert np.allclose(d, 2.0 * SQRT3_2 * s, rtol=1e-12)

    def test_level_bounds(self):
        with pytest.raises(ValueError):
            hex_size(-1)
        with pytest.raises(ValueError):
            hex_size(MAX_LEVEL + 1)


class TestOracleParity:
    @pytest.mark.parametrize("level", [0, 3, 7, 12, MAX_LEVEL])
    def test_encode_and_center_bit_exact(self, level):
        """Cell ids equal and decoded hex centers BIT-identical between
        numpy and the generated DuckDB SQL — the trig-free chain is
        IEEE-determined end to end (no pad, no tolerance)."""
        from spatial4n_spark.oracles_h3 import (
            h3_center_stages_sql,
            h3_encode_stages_sql,
        )

        lat, lon = _rand_pts(30000, seed=3)
        lat = np.concatenate([lat, ADVERSARIAL_LAT])
        lon = np.concatenate([lon, ADVERSARIAL_LON])
        con = duckdb.connect()
        con.register(
            "pts_src",
            pd.DataFrame({"i": np.arange(len(lat)), "lon": lon, "lat": lat}),
        )
        enc = h3_encode_stages_sql("pts", "i", level)
        ctr = h3_center_stages_sql("i", level)
        out = con.execute(
            f"WITH pts AS (SELECT i, lon, lat FROM pts_src){enc}{ctr} "
            "SELECT i, cell, clat, clon FROM h3c ORDER BY i"
        ).fetchnumpy()
        c_np = h3_encode(lat, lon, level)
        clat_np, clon_np = h3_decode_center(c_np, level)
        assert np.array_equal(np.asarray(out["cell"]), c_np)
        assert np.array_equal(
            np.asarray(out["clat"], dtype=np.float64).view(np.uint64),
            clat_np.view(np.uint64),
        )
        assert np.array_equal(
            np.asarray(out["clon"], dtype=np.float64).view(np.uint64),
            clon_np.view(np.uint64),
        )


class TestCover:
    def _shapes(self):
        from spatial4n_spark.io.wkt import parse_wkt
        from spatial4n_spark.kernels.polygon import Circle, Rect
        from spatial4n_spark.sources.polygons import POLYGON_LAYER

        shapes = [(pid, parse_wkt(w)) for pid, w, *_ in POLYGON_LAYER]
        shapes += [
            ("circle_eq", Circle(2.0, 48.0, 3.0, geo=True)),
            ("circle_pole", Circle(10.0, 88.0, 5.0, geo=True)),
            ("circle_dateline", Circle(179.5, -10.0, 2.0, geo=True)),
            ("rect_dateline", Rect(177.0, -175.0, -5.0, 5.0)),
        ]
        return shapes

    @pytest.mark.parametrize("level", [4, 6])
    def test_cover_sound_over_layer_and_queries(self, level):
        """No covered point is pruned (its hex is in full|boundary) and
        every point in a 'full' hex really is covered — over all 11 layer
        shapes plus pole/dateline circles and a dateline rect."""
        from spatial4n_spark.kernels.polygon import points_covered, shape_bbox
        from spatial4n_spark.plans.h3cover import cover_cells_h3

        rng = np.random.default_rng(11)
        for pid, shape in self._shapes():
            full, bound = cover_cells_h3(shape, level, True, max_cells=8192)
            cov = set(full) | set(bound)
            fset = set(full)
            bb = shape_bbox(shape, True)
            lat = rng.uniform(max(bb.min_y - 2, -90), min(bb.max_y + 2, 90), 2500)
            if bb.min_x <= bb.max_x:
                lon = rng.uniform(
                    max(bb.min_x - 2, -180), min(bb.max_x + 2, 180), 2500
                )
            else:
                lon = rng.uniform(-180, 180, 2500)
            inside = points_covered(lon, lat, shape, True)
            cells = h3_encode(lat, lon, level)
            for i in range(len(lat)):
                c = int(cells[i])
                if inside[i]:
                    assert c in cov, (pid, lon[i], lat[i])
                if c in fset:
                    assert inside[i], (pid, lon[i], lat[i])

    def test_seam_points_never_pruned(self):
        """Points at exactly lon = ±180 against seam-touching shapes."""
        from spatial4n_spark.kernels.polygon import Rect
        from spatial4n_spark.plans.h3cover import cover_cells_h3

        level = 5
        for shape in (Rect(175.0, 180.0, -5.0, 5.0), Rect(-180.0, -175.0, -5.0, 5.0)):
            full, bound = cover_cells_h3(shape, level, True)
            cov = set(full) | set(bound)
            for lon in (-180.0, 180.0):
                c = int(h3_encode(np.array([0.0]), np.array([lon]), level)[0])
                assert c in cov, (shape, lon)

    def test_candidate_guard_raises_fast(self):
        from spatial4n_spark.kernels.polygon import Rect
        from spatial4n_spark.plans.h3cover import cover_cells_h3

        with pytest.raises(ValueError, match="h3"):
            cover_cells_h3(Rect(-180.0, 180.0, -90.0, 90.0), 14, True)

    def test_no_prefix_hierarchy(self):
        from spatial4n_spark.cellindex import cell_backend

        be = cell_backend("h3")
        with pytest.raises(ValueError, match="hierarchy"):
            be.parent_col("cell", 7, 5)
        with pytest.raises(ValueError, match="hierarchy"):
            be.parent_kernel([1, 2], 7, 5)
        assert be.parent_kernel([1, 2], 7, 7) == [1, 2]


class TestSparkBackend:
    def test_tile_stats_backend_swap(self, spark, sf_dir):
        """tile_stats through the h3 backend == independent numpy
        recompute (the same pluggability pin the s2 backend has)."""
        from spatial4n_spark.operators.tiles import tile_stats
        from spatial4n_spark.suite import pts_lineitem

        pts = pts_lineitem(spark, sf_dir)
        got = (
            tile_stats(pts, level=5, salt_buckets=4, salt_col="l_partkey",
                       sum_col="l_linenumber", index="h3")
            .toPandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        pdf = pts.toPandas()
        cells = h3_encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 5)
        exp = (
            pdf.assign(cell=cells)
            .groupby("cell")
            .agg(n=("cell", "size"), sum_l_linenumber=("l_linenumber", "sum"))
            .reset_index()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        assert (got["cell"].to_numpy() == exp["cell"].to_numpy()).all()
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
        assert (
            got["sum_l_linenumber"].to_numpy() == exp["sum_l_linenumber"].to_numpy()
        ).all()

    def test_pip_join_h3_equals_geohash(self, spark, sf_dir):
        """Join results are index-invariant: h3 hex covers produce the
        same (orderkey, poly_id) row set as the geohash quadtree."""
        from spatial4n_spark.operators.spatial_join import (
            spatial_join_points_polygons,
        )
        from spatial4n_spark.suite import layer, pts_orders

        pts = pts_orders(spark, sf_dir)
        a = set(
            map(tuple, spatial_join_points_polygons(pts, layer(), level=3)
                .select("o_orderkey", "poly_id").collect())
        )
        b = set(
            map(tuple, spatial_join_points_polygons(pts, layer(), level=5, index="h3")
                .select("o_orderkey", "poly_id").collect())
        )
        assert a == b

    def test_radius_join_h3_equals_geohash(self, spark, sf_dir):
        from spatial4n_spark.operators.distance_join import radius_join
        from spatial4n_spark.suite import RADIUS_CENTERS, pts_orders

        pts = pts_orders(spark, sf_dir)
        a = set(
            map(tuple, radius_join(pts, RADIUS_CENTERS, level=3, with_distance=False)
                .select("query_id", "o_orderkey").collect())
        )
        b = set(
            map(tuple, radius_join(pts, RADIUS_CENTERS, level=5,
                                   with_distance=False, index="h3")
                .select("query_id", "o_orderkey").collect())
        )
        assert a == b
