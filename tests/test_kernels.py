"""Golden-vector tests for the numpy kernels.

Vectors extracted from the reference test suite (study-only):
- distances: tests/Spatial4n.Tests/Distance/TestDistances.cs:45-55
- norm tables: TestDistances.cs:234-293
- geohash: tests/Spatial4n.Tests/Util/TestGeohashUtils.cs:32-125
- circle x rect regressions: tests/Spatial4n.Tests/Shapes/TestShapesGeo.cs:139-207
"""

import numpy as np
import pytest

from spatial4n_spark.kernels import (
    EARTH_MEAN_RADIUS_KM,
    circle_bbox,
    deg_to_km,
    distance_deg,
    geo_circle_relate_rect,
    geohash_cell_sizes,
    geohash_decode_bbox,
    geohash_decode_center,
    geohash_encode,
    geohash_encode_str,
    geohash_len_for_width_height,
    geohash_neighbors,
    geohash_sub_cells,
    km_to_deg,
    norm_lat_deg,
    norm_lon_deg,
    rect_contains_point,
    rect_relate_rect,
    relate_x_range,
)
from spatial4n_spark.relation import (
    CONTAINS,
    DISJOINT,
    INTERSECTS,
    WITHIN,
    combine,
    inverse,
    rel_from_name,
    transpose,
)


# --- norm tables (TestDistances.cs:234-293) -------------------------------
@pytest.mark.parametrize(
    "inp,expected",
    [
        (-100, -80), (270, -90), (-270, 90), (90, 90), (-90, -90),
        (0, 0), (10, 10), (179, 179), (181, 179 * -1 + 358 - 358),  # fold below
    ][:7],
)
def test_norm_lat(inp, expected):
    assert norm_lat_deg(inp) == expected


def test_norm_lat_fold():
    # latitude folds over the pole: 91 -> 89, 181 -> -1, 269 -> -89
    assert norm_lat_deg(91) == 89
    assert norm_lat_deg(181) == -1
    assert norm_lat_deg(269) == -89
    assert norm_lat_deg(-91) == -89


@pytest.mark.parametrize(
    "inp,expected",
    [
        (-190, 170), (181, -179), (-180, -180), (180, 180), (0, 0),
        (-360, 0), (360, 0), (540, 180), (-540, -180),
    ],
)
def test_norm_lon(inp, expected):
    assert norm_lon_deg(inp) == expected


def test_norm_lon_seam_sign():
    # +180 preserved for positive inputs landing on the seam (DistanceUtils.cs:302-303)
    assert norm_lon_deg(180 + 360) == 180
    assert norm_lon_deg(-180 - 360) == -180


# --- distance goldens (TestDistances.cs:45-55) ----------------------------
def test_distance_goldens_haversine():
    # (lat=1,lon=2)->(lat=3,lon=4) = 314.40338 km, tol 1e-3 (movable-type oracle)
    d_km = float(deg_to_km(distance_deg(2, 1, 4, 3, "haversine")))
    assert abs(d_km - 314.40338) < 1e-3
    # (0,100)->(10,0) and (0,100)->(10,-160) are both ~11100 km
    for lon2 in (0, -160):
        d_km = float(deg_to_km(distance_deg(100, 0, lon2, 10)))
        assert abs(d_km - 11100) < 3


@pytest.mark.parametrize("calc", ["haversine", "lawofcosines", "vincenty"])
def test_calculators_agree(calc):
    rng = np.random.default_rng(42)
    lon1, lon2 = rng.uniform(-180, 180, 200), rng.uniform(-180, 180, 200)
    lat1, lat2 = rng.uniform(-90, 90, 200), rng.uniform(-90, 90, 200)
    ref = distance_deg(lon1, lat1, lon2, lat2, "vincenty")
    got = distance_deg(lon1, lat1, lon2, lat2, calc)
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_same_point_zero():
    assert float(distance_deg(12.3, 45.6, 12.3, 45.6)) == 0.0


def test_km_deg_roundtrip():
    assert abs(float(km_to_deg(deg_to_km(47.0))) - 47.0) < 1e-12
    # whole-circumference sanity
    assert abs(float(deg_to_km(360.0)) - 2 * np.pi * EARTH_MEAN_RADIUS_KM) < 1e-6


# --- relation algebra ------------------------------------------------------
def test_relation_algebra():
    assert transpose(CONTAINS) == WITHIN and transpose(WITHIN) == CONTAINS
    assert transpose(DISJOINT) == DISJOINT and transpose(INTERSECTS) == INTERSECTS
    assert combine(CONTAINS, CONTAINS) == CONTAINS
    assert combine(DISJOINT, CONTAINS) == CONTAINS
    assert combine(CONTAINS, DISJOINT) == CONTAINS
    assert combine(WITHIN, CONTAINS) == INTERSECTS
    assert combine(DISJOINT, DISJOINT) == DISJOINT
    assert inverse(DISJOINT) == CONTAINS and inverse(CONTAINS) == DISJOINT
    assert inverse(WITHIN) == INTERSECTS


# --- rect relate (TestShapesGeo.cs:78-101 style cases) ---------------------
def test_rect_contains_point_dateline():
    # rect(170 -> 180) contains point at -180 (seam identification)
    assert rect_contains_point(170, 180, -10, 10, -180, 0)
    # dateline-crossing rect minX>maxX
    assert rect_contains_point(175, -175, -10, 10, 179, 0)
    assert rect_contains_point(175, -175, -10, 10, -179, 0)
    assert not rect_contains_point(175, -175, -10, 10, 0, 0)
    assert not rect_contains_point(175, -175, -10, 10, 179, 20)


def test_relate_x_range_dateline():
    # rect(170,180) vs x-range(-180,-170): they touch at the seam
    assert relate_x_range(170, 180, -180, -170)[0] == INTERSECTS
    # world-wrap short circuits
    assert relate_x_range(-180, 180, 10, 20)[0] == CONTAINS
    assert relate_x_range(10, 20, -180, 180)[0] == WITHIN


def test_rect_relate_rect_basics():
    # containment
    assert rect_relate_rect(0, 10, 0, 10, 2, 8, 2, 8)[0] == CONTAINS
    assert rect_relate_rect(2, 8, 2, 8, 0, 10, 0, 10)[0] == WITHIN
    assert rect_relate_rect(0, 10, 0, 10, 20, 30, 0, 10)[0] == DISJOINT
    assert rect_relate_rect(0, 10, 0, 10, 5, 15, 5, 15)[0] == INTERSECTS
    # identical rects -> CONTAINS preferred
    assert rect_relate_rect(0, 10, 0, 10, 0, 10, 0, 10)[0] == CONTAINS
    # dateline-crossing vs contained piece
    assert rect_relate_rect(175, -175, -10, 10, 177, 179, -5, 5)[0] == CONTAINS
    assert rect_relate_rect(175, -175, -10, 10, -179, -176, -5, 5)[0] == CONTAINS
    # empty (NaN) is disjoint to everything
    assert rect_relate_rect(np.nan, np.nan, np.nan, np.nan, 0, 1, 0, 1)[0] == DISJOINT


def test_rect_relate_transpose_invariant():
    rng = np.random.default_rng(7)
    for _ in range(300):
        ax = np.sort(rng.integers(-180, 181, 2).astype(float))
        ay = np.sort(rng.integers(-90, 91, 2).astype(float))
        bx = np.sort(rng.integers(-180, 181, 2).astype(float))
        by = np.sort(rng.integers(-90, 91, 2).astype(float))
        ab = rect_relate_rect(ax[0], ax[1], ay[0], ay[1], bx[0], bx[1], by[0], by[1])[0]
        ba = rect_relate_rect(bx[0], bx[1], by[0], by[1], ax[0], ax[1], ay[0], ay[1])[0]
        assert ab == transpose(ba), (ax, ay, bx, by, ab, ba)


# --- circle bbox -----------------------------------------------------------
def test_circle_bbox_basic():
    min_x, max_x, min_y, max_y = circle_bbox(0.0, 0.0, 10.0)
    assert float(min_y) == -10.0 and float(max_y) == 10.0
    assert abs(float(min_x) + float(max_x)) < 1e-12  # symmetric
    assert float(max_x) > 10.0 - 1e-9  # slightly wider than radius off-equator? at equator == radius
    # touches pole -> 180-degree lon span
    min_x, max_x, min_y, max_y = circle_bbox(0.0, 88.0, 2.0)
    assert (float(min_x), float(max_x)) == (-90.0, 90.0)
    assert float(max_y) == 90.0
    # passes pole -> world-wide lon span
    min_x, max_x, _, _ = circle_bbox(0.0, 89.0, 2.0)
    assert (float(min_x), float(max_x)) == (-180.0, 180.0)
    # radius >= 180 -> whole world
    min_x, max_x, min_y, max_y = circle_bbox(12.0, 34.0, 180.0)
    assert (float(min_x), float(max_x), float(min_y), float(max_y)) == (-180.0, 180.0, -90.0, 90.0)


# --- the ~18 named geo circle x rect regression vectors --------------------
# (TestShapesGeo.cs:163-207; single source of truth shared with the
# circle_rect_relate gate entry)
from spatial4n_spark.sources.circle_rect_expected import GEO_CIRCLE_RECT_VECTORS


@pytest.mark.parametrize("name,circle,rect,expected", GEO_CIRCLE_RECT_VECTORS,
                         ids=[v[0] for v in GEO_CIRCLE_RECT_VECTORS])
def test_geo_circle_relate_rect_vectors(name, circle, rect, expected):
    cx, cy, r = circle
    got = geo_circle_relate_rect(cx, cy, r, *rect)
    assert got == rel_from_name(expected), f"{name}: got {got} want {expected}"


def test_circle_point_relate():
    # "edge rounding issue": circle(0, 66, r=156) CONTAINS point (0, -90)
    d = float(distance_deg(0, 66, 0, -90))
    # exact edge case: distance == radius up to float rounding; the reference
    # forgives ambiguous edges with a radius jiggle (AbstractTestShapes.cs:191-216)
    assert d <= 156.0 + 1e-9


# --- geohash goldens -------------------------------------------------------
def test_geohash_goldens():
    assert geohash_encode_str([42.6], [-5.6])[0] == "ezs42e44yx96"
    assert geohash_encode_str([57.64911], [10.40744])[0] == "u4pruydqqvj8"


def test_geohash_roundtrip():
    lon, lat = geohash_decode_center(["u173zq37x014"])
    assert abs(float(lat) - 52.3738007) < 1e-6
    assert abs(float(lon) - 4.8909347) < 1e-6
    # re-encode the center reproduces the hash
    assert geohash_encode_str([float(lat)], [float(lon)])[0] == "u173zq37x014"


def test_geohash_cell_sizes():
    lat_h, lon_w = geohash_cell_sizes(3)
    assert abs(lat_h - 1.40625) < 1e-9 and abs(lon_w - 1.40625) < 1e-9
    lat_h, lon_w = geohash_cell_sizes(4)
    assert abs(lat_h - 0.17578125) < 1e-6 and abs(lon_w - 0.3515625) < 1e-6


def test_geohash_len_lookup():
    assert geohash_len_for_width_height(1.0, 1.0) == 4


def test_geohash_children_and_bbox_nesting():
    subs = geohash_sub_cells("u4")
    assert len(subs) == 32 and subs == sorted(subs)
    pminx, pmaxx, pminy, pmaxy = (float(v[0]) for v in geohash_decode_bbox(["u4"]))
    for s in subs:
        minx, maxx, miny, maxy = (float(v[0]) for v in geohash_decode_bbox([s]))
        assert pminx <= minx <= maxx <= pmaxx
        assert pminy <= miny <= maxy <= pmaxy


def test_geohash_neighbors():
    n = geohash_neighbors("u4p")
    assert len(n) == 8 and "u4p" not in n
    # every neighbor center must be ~one cell step away
    lat_h, lon_w = geohash_cell_sizes(3)
    (cx,), (cy,) = geohash_decode_center(["u4p"])
    for h in n:
        (nx,), (ny,) = geohash_decode_center([h])
        assert abs(ny - cy) <= lat_h + 1e-9
    # dateline wrap: a cell on the -180 edge has neighbors on the +180 side
    west_cell = geohash_encode_str([0.1], [-179.99], 3)[0]
    ns = geohash_neighbors(west_cell)
    centers = [geohash_decode_center([h])[0][0] for h in ns]
    assert any(c > 170 for c in centers)


def test_geohash_vectorized_scale():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-90, 90, 100_000)
    lon = rng.uniform(-180, 180, 100_000)
    hashes = geohash_encode(lat, lon, 6)
    assert len(hashes) == 100_000
    # decode bbox of every hash contains its point
    minx, maxx, miny, maxy = geohash_decode_bbox(hashes)
    assert bool(np.all((lat >= miny - 1e-9) & (lat <= maxy + 1e-9)))
    assert bool(np.all((lon >= minx - 1e-9) & (lon <= maxx + 1e-9)))
