"""S2-style cube-face Hilbert cell index (kernels/s2cell.py).

The Hilbert tables are pinned by curve PROPERTIES (bijection, unit-step
continuity, hierarchy), not by copied constants: any wrong table entry
breaks one of these at some level.  Cross-engine bit-parity of the
encode/decode chains is separately gated by the s2_cell_assign /
s2_tile_stats oracle entries (oracles_s2.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from spatial4n_spark.kernels.s2cell import (
    MAX_LEVEL,
    hilbert_ij,
    hilbert_pos,
    s2_children,
    s2_decode_center,
    s2_decode_st_bounds,
    s2_encode,
    s2_face,
    s2_neighbors,
    s2_parent,
    st_to_uv,
    uv_to_st,
)


def _rand_latlon(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-90, 90, n), rng.uniform(-180, 180, n)


class TestHilbert:
    @pytest.mark.parametrize("level", [1, 2, 3, 5])
    @pytest.mark.parametrize("face", [0, 1])
    def test_bijective_continuous(self, level, face):
        """The defining Hilbert properties: every (i,j) visited exactly
        once, and consecutive curve positions are edge-adjacent cells."""
        n = 4**level
        pos = np.arange(n, dtype=np.int64)
        i, j = hilbert_ij(np.full(n, face), pos, level)
        assert len(set(zip(i.tolist(), j.tolist()))) == n
        step = np.abs(np.diff(i)) + np.abs(np.diff(j))
        assert (step == 1).all()

    @pytest.mark.parametrize("level", [1, 4, 8])
    def test_inverse(self, level):
        for face in range(6):
            n = min(4**level, 1024)
            rng = np.random.default_rng(level * 7 + face)
            pos = rng.integers(0, 4**level, n).astype(np.int64)
            i, j = hilbert_ij(np.full(n, face), pos, level)
            assert (hilbert_pos(np.full(n, face), i, j, level) == pos).all()

    def test_hierarchy(self):
        """pos at level L-1 is pos at level L >> 2 (orientation chaining)."""
        level = 6
        n = 4**level
        pos = np.arange(n, dtype=np.int64)
        for face in (0, 3):
            i, j = hilbert_ij(np.full(n, face), pos, level)
            coarse = hilbert_pos(np.full(n, face), i >> 1, j >> 1, level - 1)
            assert (coarse == (pos >> 2)).all()


class TestTransforms:
    def test_st_uv_roundtrip(self):
        s = np.linspace(0.0, 1.0, 1001)
        back = uv_to_st(st_to_uv(s))
        assert np.allclose(back, s, atol=1e-15)

    def test_uv_st_range(self):
        u = np.linspace(-1.0, 1.0, 1001)
        s = uv_to_st(u)
        assert (s >= 0.0).all() and (s <= 1.0).all()
        assert (np.diff(s) > 0).all()  # strictly monotone


class TestEncode:
    def test_face_axes(self):
        """+x,+y,+z,-x,-y,-z axis points land on faces 0..5."""
        pts = [(0, 0, 0), (0, 90, 1), (90, 0, 2), (0, 180, 3), (0, -90, 4), (-90, 0, 5)]
        for lat, lon, face in pts:
            c = s2_encode(np.array([lat], float), np.array([lon], float), 10)
            assert int(s2_face(c, 10)[0]) == face, (lat, lon)

    def test_prefix_property(self):
        lat, lon = _rand_latlon(5000)
        prev = s2_encode(lat, lon, 0)
        for level in range(1, 16):
            cur = s2_encode(lat, lon, level)
            assert ((cur >> 2) == prev).all(), level
            prev = cur

    def test_parent_children(self):
        lat, lon = _rand_latlon(100, seed=3)
        c = s2_encode(lat, lon, 9)
        assert (s2_parent(c) == (c >> 2)).all()
        kids = s2_children(c)
        assert kids.shape == (100, 4)
        assert (s2_parent(kids.ravel()) == np.repeat(c, 4)).all()

    @pytest.mark.parametrize("level", [1, 6, 14, MAX_LEVEL])
    def test_center_roundtrip(self, level):
        """decode_center of a cell re-encodes to the same cell."""
        lat, lon = _rand_latlon(3000, seed=level)
        c = s2_encode(lat, lon, level)
        clat, clon = s2_decode_center(c, level)
        assert (s2_encode(clat, clon, level) == c).all()

    def test_point_inside_st_bounds(self, subtests=None):
        """The encoded cell's dyadic ST rectangle contains the point's
        own (s,t) — binning consistency."""
        from spatial4n_spark.kernels.s2cell import (
            _latlon_to_xyz,
            xyz_to_face_uv,
        )

        lat, lon = _rand_latlon(3000, seed=11)
        level = 10
        c = s2_encode(lat, lon, level)
        face, s0, t0, s1, t1 = s2_decode_st_bounds(c, level)
        x, y, z = _latlon_to_xyz(lat, lon)
        pf, pu, pv = xyz_to_face_uv(x, y, z)
        assert (pf == face).all()
        ps, pt = uv_to_st(pu), uv_to_st(pv)
        assert (ps >= s0 - 1e-12).all() and (ps <= s1 + 1e-12).all()
        assert (pt >= t0 - 1e-12).all() and (pt <= t1 + 1e-12).all()

    def test_cells_partition_points(self):
        """Two points in the same cell are close; distinct cells at a
        fine level separate a dense sample (sanity of locality)."""
        lat, lon = _rand_latlon(20000, seed=5)
        c = s2_encode(lat, lon, 18)
        # at level 18 cells are ~100m: random global points collide rarely
        assert len(np.unique(c)) > 19950

    def test_level_bounds(self):
        with pytest.raises(ValueError):
            s2_encode(np.array([0.0]), np.array([0.0]), MAX_LEVEL + 1)
        with pytest.raises(ValueError):
            s2_encode(np.array([0.0]), np.array([0.0]), -1)


class TestNeighbors:
    def test_interior_eight(self):
        c = int(s2_encode(np.array([20.0]), np.array([30.0]), 8)[0])
        nb = s2_neighbors(c, 8)
        assert len(nb) == 8 and c not in nb
        # all neighbors share the coarse parent region (same face, near ij)
        i0, j0 = hilbert_ij(
            np.array([c >> 16]), np.array([c & 0xFFFF]), 8
        )
        for m in nb:
            assert (m >> 16) == (c >> 16)
            im, jm = hilbert_ij(np.array([m >> 16]), np.array([m & 0xFFFF]), 8)
            assert abs(int(im[0] - i0[0])) <= 1 and abs(int(jm[0] - j0[0])) <= 1

    def test_edge_crosses_face(self):
        """A cell on the face-0/face-1 edge (lon=45) has neighbors on
        both faces."""
        c = int(s2_encode(np.array([0.0]), np.array([44.999]), 6)[0])
        faces = {m >> 12 for m in s2_neighbors(c, 6, include_self=True)}
        assert 0 in faces and 1 in faces

    def test_corner_cell(self):
        """Cube-corner cells have fewer than 8 distinct neighbors."""
        corner = int(hilbert_pos(np.array([0]), np.array([0]), np.array([0]), 8)[0])
        nb = s2_neighbors(corner, 8)
        assert 3 <= len(nb) < 8


class TestSparkBackend:
    def test_tile_stats_backend_swap(self, spark, sf_dir):
        """tile_stats through the s2 backend == independent numpy
        recompute; geohash path unchanged."""
        from spatial4n_spark.operators.tiles import tile_stats
        from spatial4n_spark.suite import pts_lineitem

        pts = pts_lineitem(spark, sf_dir)
        got = (
            tile_stats(pts, level=6, salt_buckets=4, salt_col="l_partkey",
                       sum_col="l_linenumber", index="s2")
            .toPandas()
            .sort_values("cell")
            .reset_index(drop=True)
        )
        pdf = pts.toPandas()
        cells = s2_encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 6)
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

    def test_unknown_backend_raises(self, spark, sf_dir):
        from spatial4n_spark.operators.tiles import tile_assign
        from spatial4n_spark.suite import pts_orders

        with pytest.raises(ValueError, match="backend"):
            tile_assign(pts_orders(spark, sf_dir), level=4, index="quadkey")
