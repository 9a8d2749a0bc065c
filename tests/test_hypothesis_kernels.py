"""Hypothesis property tests over the scalar kernels — complements the
fixed-seed numpy property suite with shrinking counterexample search."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from spatial4n_spark.kernels.bbox import rect_contains_point, rect_relate_rect
from spatial4n_spark.kernels.geohash import (
    geohash_decode_bbox,
    geohash_encode_str,
)
from spatial4n_spark.kernels.norm import norm_lat_deg, norm_lon_deg
from spatial4n_spark.kernels.distance import distance_deg
from spatial4n_spark.relation import CONTAINS, DISJOINT, transpose

lats = st.floats(-90.0, 90.0, allow_nan=False)
lons = st.floats(-180.0, 180.0, allow_nan=False)
any_lon = st.floats(-1e4, 1e4, allow_nan=False)
any_lat = st.floats(-1e4, 1e4, allow_nan=False)


@settings(max_examples=300, deadline=None)
@given(any_lon)
def test_norm_lon_in_range_and_idempotent(v):
    w = float(norm_lon_deg(v))
    assert -180.0 <= w <= 180.0
    assert float(norm_lon_deg(w)) == w  # in-range values untouched


@settings(max_examples=300, deadline=None)
@given(any_lat)
def test_norm_lat_in_range_and_idempotent(v):
    w = float(norm_lat_deg(v))
    assert -90.0 <= w <= 90.0
    assert float(norm_lat_deg(w)) == w


@settings(max_examples=200, deadline=None)
@given(lats, lons)
def test_geohash_decode_contains_encoded_point(lat, lon):
    gh = geohash_encode_str([lat], [lon], 8)[0]
    min_x, max_x, min_y, max_y = (float(v[0]) for v in geohash_decode_bbox([gh]))
    # strict-> rule: the point lies in (min, max] per axis (or at world min)
    assert min_y <= lat <= max_y
    assert min_x <= lon <= max_x
    # prefix property: the level-4 prefix cell contains the level-8 cell
    p4 = geohash_encode_str([lat], [lon], 4)[0]
    assert gh.startswith(p4)


@settings(max_examples=200, deadline=None)
@given(lats, lons, lats, lons)
def test_distance_symmetry_and_identity(lat1, lon1, lat2, lon2):
    d_ab = float(distance_deg(lon1, lat1, lon2, lat2, "haversine"))
    d_ba = float(distance_deg(lon2, lat2, lon1, lat1, "haversine"))
    assert abs(d_ab - d_ba) < 1e-9
    assert float(distance_deg(lon1, lat1, lon1, lat1, "haversine")) == 0.0
    assert 0.0 <= d_ab <= 180.0 + 1e-9


coords = st.tuples(lons, lons, lats, lats)


def _rect(t):
    x1, x2, y1, y2 = t
    return min(x1, x2), max(x1, x2), min(y1, y2), max(y1, y2)


@settings(max_examples=200, deadline=None)
@given(coords, coords)
def test_rect_relate_transpose_involution(a, b):
    ax1, ax2, ay1, ay2 = _rect(a)
    bx1, bx2, by1, by2 = _rect(b)
    ab = int(rect_relate_rect(ax1, ax2, ay1, ay2, bx1, bx2, by1, by2)[0])
    ba = int(rect_relate_rect(bx1, bx2, by1, by2, ax1, ax2, ay1, ay2)[0])
    if (ax1, ax2, ay1, ay2) == (bx1, bx2, by1, by2):
        # equal shapes prefer CONTAINS in BOTH directions — the reference's
        # documented tie-break (SpatialRelation.cs:79), found by hypothesis
        assert ab == ba == CONTAINS
    else:
        assert ab == int(transpose(ba))


@settings(max_examples=200, deadline=None)
@given(coords, lons, lats)
def test_rect_contains_point_consistent_with_relate(r, px, py):
    x1, x2, y1, y2 = _rect(r)
    inside = bool(rect_contains_point(x1, x2, y1, y2, px, py)[0])
    # a rect CONTAINS the degenerate point-rect iff it contains the point
    rel = int(rect_relate_rect(x1, x2, y1, y2, px, px, py, py)[0])
    if inside:
        assert rel in (CONTAINS,)
    else:
        assert rel == DISJOINT
