"""Ellipsoidal Vincenty (kernels/geodesic.py) — anchored to geometric
facts of the WGS84 ellipsoid that are independent of this
implementation, plus structural invariants and the spherical
degeneration against the reference-parity great-circle kernel."""

import numpy as np
import pytest

from spatial4n_spark.kernels.distance import dist_haversine_rad
from spatial4n_spark.kernels.geodesic import (
    WGS84_A,
    WGS84_F,
    vincenty_inverse_m,
)


def _d(lat1, lon1, lat2, lon2, **kw):
    d, ok = vincenty_inverse_m(
        np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2]), **kw
    )
    return float(d[0]), bool(ok[0])


def test_equator_arc_is_exact():
    """The equator is a geodesic of circumference 2*pi*a — a quarter arc
    is a*pi/2 — matched to Vincenty's own ~0.5 mm accuracy class."""
    d, ok = _d(0.0, 0.0, 0.0, 90.0)
    assert ok
    assert d == pytest.approx(WGS84_A * np.pi / 2.0, abs=1e-3)


def test_quarter_meridian():
    """WGS84 quarter meridian (equator to pole) = 10,001,965.729 m."""
    d, ok = _d(0.0, 12.0, 90.0, 12.0)
    assert ok
    assert d == pytest.approx(10_001_965.729, abs=0.01)


def test_one_degree_latitude_at_equator():
    """1 deg of latitude spanning the equator ~ 110,574.3 m (the
    textbook minimum of the per-degree meridian arc)."""
    d, ok = _d(-0.5, 7.0, 0.5, 7.0)
    assert ok
    assert d == pytest.approx(110_574.3, abs=2.0)


def test_f_zero_degenerates_to_great_circle():
    rng = np.random.default_rng(5)
    lat1 = rng.uniform(-80, 80, 200)
    lon1 = rng.uniform(-180, 180, 200)
    lat2 = rng.uniform(-80, 80, 200)
    lon2 = rng.uniform(-180, 180, 200)
    d, ok = vincenty_inverse_m(lat1, lon1, lat2, lon2, f=0.0)
    assert ok.all()
    want = WGS84_A * dist_haversine_rad(
        np.radians(lat1), np.radians(lon1), np.radians(lat2), np.radians(lon2)
    )
    np.testing.assert_allclose(d, want, rtol=1e-9)


def test_sphere_vs_ellipsoid_bounded_by_flattening():
    """Ellipsoidal and spherical distances differ by at most ~f
    relatively (0.34%) — a bound, not an equality."""
    rng = np.random.default_rng(9)
    lat1 = rng.uniform(-80, 80, 500)
    lon1 = rng.uniform(-180, 180, 500)
    lat2 = rng.uniform(-80, 80, 500)
    lon2 = rng.uniform(-180, 180, 500)
    d, ok = vincenty_inverse_m(lat1, lon1, lat2, lon2)
    sphere = WGS84_A * dist_haversine_rad(
        np.radians(lat1), np.radians(lon1), np.radians(lat2), np.radians(lon2)
    )
    m = ok & (sphere > 1000.0)
    rel = np.abs(d[m] - sphere[m]) / sphere[m]
    assert rel.max() < 2 * WGS84_F


def test_symmetry_shift_invariance_and_zero():
    rng = np.random.default_rng(3)
    lat1 = rng.uniform(-85, 85, 300)
    lon1 = rng.uniform(-180, 180, 300)
    lat2 = rng.uniform(-85, 85, 300)
    lon2 = rng.uniform(-180, 180, 300)
    d1, ok1 = vincenty_inverse_m(lat1, lon1, lat2, lon2)
    d2, ok2 = vincenty_inverse_m(lat2, lon2, lat1, lon1)
    m = ok1 & ok2
    np.testing.assert_allclose(d1[m], d2[m], rtol=1e-9)
    # rotating both points around the axis changes nothing
    shift = ((lon1 + 77.0 + 180.0) % 360.0) - 180.0
    shift2 = ((lon2 + 77.0 + 180.0) % 360.0) - 180.0
    d3, ok3 = vincenty_inverse_m(lat1, shift, lat2, shift2)
    m = m & ok3
    np.testing.assert_allclose(d1[m], d3[m], rtol=1e-9)
    # coincident points
    d0, ok0 = vincenty_inverse_m(lat1, lon1, lat1, lon1)
    assert ok0.all() and (d0 == 0.0).all()


def test_near_antipodal_returns_nan_not_garbage():
    """Vincenty's documented failure mode: nearly antipodal pairs do not
    converge — those lanes must flag, never return a plausible wrong
    number."""
    d, ok = vincenty_inverse_m(
        np.array([0.0]), np.array([0.0]), np.array([0.5]), np.array([179.7])
    )
    if not ok[0]:
        assert np.isnan(d[0])
    else:
        # if it did converge, it must be close to half the circumference
        assert d[0] > 1.9e7
    # the exact antipode of a non-equatorial point
    d2, ok2 = vincenty_inverse_m(
        np.array([30.0]), np.array([10.0]), np.array([-30.0]), np.array([-170.0])
    )
    assert (not ok2[0] and np.isnan(d2[0])) or d2[0] > 1.9e7


def test_geodesic_udf_matches_kernel(spark):
    from pyspark.sql import functions as F

    from spatial4n_spark.functions.udfs import geodesic_m_udf

    rows = [(i, -60.0 + i * 7.3, -40.0 + i * 5.1, 20.0 - i * 3.7, 30.0 - i * 4.9)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "id long, lon1 double, lat1 double, lon2 double, lat2 double"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", geodesic_m_udf()(F.col("lon1"), F.col("lat1"),
                                   F.col("lon2"), F.col("lat2")).alias("m")
        ).collect()
    }
    arr = np.array(rows)
    want, ok = vincenty_inverse_m(arr[:, 2], arr[:, 1], arr[:, 4], arr[:, 3])
    assert ok.all()
    for i in range(20):
        assert got[i] == pytest.approx(float(want[i]), rel=1e-12)


def test_direct_roundtrip_closure():
    """direct(p, az, s) then inverse back must recover s to < 1 mm and
    the start point via the reverse leg — the standard closed-loop
    validation of a direct/inverse pair."""
    from spatial4n_spark.kernels.geodesic import vincenty_direct

    rng = np.random.default_rng(17)
    lat1 = rng.uniform(-70, 70, 300)
    lon1 = rng.uniform(-180, 180, 300)
    az = rng.uniform(0, 360, 300)
    s = rng.uniform(1.0, 5e6, 300)
    lat2, lon2 = vincenty_direct(lat1, lon1, az, s)
    assert (np.abs(lat2) <= 90.0).all() and (np.abs(lon2) <= 180.0).all()
    d, ok = vincenty_inverse_m(lat1, lon1, lat2, lon2)
    m = ok  # inverse may flag rare near-antipodal roundtrips
    assert m.mean() > 0.99
    np.testing.assert_allclose(d[m], s[m], atol=1e-3)


def test_direct_meridian_and_equator_anchors():
    from spatial4n_spark.kernels.geodesic import vincenty_direct

    # due north from the equator by a quarter meridian -> the pole
    lat2, _ = vincenty_direct(
        np.array([0.0]), np.array([30.0]), np.array([0.0]),
        np.array([10_001_965.729]),
    )
    assert lat2[0] == pytest.approx(90.0, abs=1e-7)
    # due east along the equator by a*pi/2 -> +90 degrees of longitude
    lat2, lon2 = vincenty_direct(
        np.array([0.0]), np.array([10.0]), np.array([90.0]),
        np.array([WGS84_A * np.pi / 2.0]),
    )
    assert lat2[0] == pytest.approx(0.0, abs=1e-9)
    assert lon2[0] == pytest.approx(100.0, abs=1e-7)
