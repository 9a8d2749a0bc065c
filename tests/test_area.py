"""Area + constructive-op kernels vs the reference's golden vectors
(TestDistances.cs:325-364 area identities) and analytic properties."""

from __future__ import annotations

import numpy as np
import pytest

from spatial4n_spark.kernels.area import (
    WHOLE_WORLD_AREA_DEG2,
    buffered_line_area,
    circle_area,
    polygon_area,
    rect_area,
    rect_buffer,
    rect_center,
    rect_width_deg,
)
from spatial4n_spark.io import parse_wkt


def test_whole_world_area():
    # TestDistances area identity: whole-earth rect = 4*pi*R^2 (deg^2)
    a = float(rect_area(-180.0, 180.0, -90.0, 90.0))
    assert a == pytest.approx(WHOLE_WORLD_AREA_DEG2, rel=1e-12)


def test_half_earth_circle():
    # circle with radius 90 covers half the sphere (TestDistances.cs:340s)
    assert float(circle_area(90.0)) == pytest.approx(WHOLE_WORLD_AREA_DEG2 / 2, rel=1e-12)
    # full-sphere circle r=180
    assert float(circle_area(180.0)) == pytest.approx(WHOLE_WORLD_AREA_DEG2, rel=1e-12)


def test_lat_symmetric_rects_equal_area():
    # rects mirrored across the equator have equal area
    a1 = float(rect_area(0.0, 30.0, 10.0, 40.0))
    a2 = float(rect_area(0.0, 30.0, -40.0, -10.0))
    assert a1 == pytest.approx(a2, rel=1e-12)
    # higher-latitude band of same degree size is smaller
    a3 = float(rect_area(0.0, 30.0, 50.0, 80.0))
    assert a3 < a1


def test_dateline_rect_area_and_width():
    assert float(rect_width_deg(170.0, -170.0)) == 20.0
    a_dl = float(rect_area(170.0, -170.0, -10.0, 10.0))
    a_n = float(rect_area(-10.0, 10.0, -10.0, 10.0))
    assert a_dl == pytest.approx(a_n, rel=1e-12)


def test_euclidean_areas():
    assert float(rect_area(0.0, 4.0, 0.0, 3.0, geo=False)) == 12.0
    assert float(circle_area(2.0, geo=False)) == pytest.approx(np.pi * 4)
    assert float(buffered_line_area(1.5, 4.0)) == 24.0


def test_polygon_area_scaling():
    # a polygon filling half its bbox: planar ratio preserved in the
    # geo estimate (NtsGeometry.cs:215-227 filled-ratio scaling)
    tri = parse_wkt("POLYGON((0 0, 10 0, 10 10, 0 0))")
    sq_area = float(rect_area(0.0, 10.0, 0.0, 10.0))
    assert polygon_area(tri) == pytest.approx(sq_area / 2, rel=1e-9)
    # holed polygon: hole area subtracted
    holed = parse_wkt(
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    )
    # force Polygon (rect-collapse avoided by the hole)
    assert polygon_area(holed) == pytest.approx(sq_area * (96.0 / 100.0), rel=1e-9)


def test_rect_buffer_pole_and_world_wrap():
    # pole touch -> world-wrap rect (RectangleImpl.cs:91-98)
    x1, x2, y1, y2 = (float(v) for v in rect_buffer(10.0, 20.0, 80.0, 85.0, 10.0))
    assert (x1, x2, y2) == (-180.0, 180.0, 90.0)
    assert y1 == pytest.approx(70.0)
    # south pole
    x1, x2, y1, y2 = (float(v) for v in rect_buffer(10.0, 20.0, -85.0, -80.0, 10.0))
    assert (x1, x2, y1) == (-180.0, 180.0, -90.0)
    # normal buffer keeps lat +/- d and expands lon by >= d
    x1, x2, y1, y2 = (float(v) for v in rect_buffer(0.0, 10.0, 40.0, 50.0, 2.0))
    assert y1 == 38.0 and y2 == 52.0
    assert x1 <= -2.0 and x2 >= 12.0  # lon expansion >= lat expansion
    # full wrap via wide lon expansion near pole (no pole touch)
    x1, x2, y1, y2 = (float(v) for v in rect_buffer(-170.0, 170.0, 85.0, 86.0, 3.0))
    assert (x1, x2) == (-180.0, 180.0)


def test_rect_center_dateline():
    cx, cy = rect_center(170.0, -170.0, -10.0, 30.0)
    assert float(cx) == pytest.approx(180.0)  # 170 + 20/2 = 180
    assert float(cy) == pytest.approx(10.0)
    cx, _ = rect_center(175.0, -175.0, 0.0, 1.0)
    # 175 + 10/2 = 180: NormLonDEG keeps in-range values untouched
    assert float(cx) == pytest.approx(180.0)
