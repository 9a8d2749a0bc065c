"""Engine-portable trig (kernels.ptrig): accuracy vs libm, and BIT
equality between the numpy kernels and the mirrored DuckDB SQL chains —
the property that lets gate outputs carry full unrounded doubles."""

from __future__ import annotations

import duckdb
import numpy as np

from spatial4n_spark.kernels.ptrig import (
    atan_fold_arg_sql,
    atan_poly_sql,
    atan_unfold_sql,
    atan_z1_sql,
    pasin,
    patan2,
    pcos,
    psin,
    psin_poly_sql,
    psin_reduce_sql,
)


def test_accuracy_vs_libm():
    rng = np.random.default_rng(7)
    x = np.concatenate(
        [rng.uniform(-12.0, 12.0, 50_000), [0.0, np.pi, -np.pi, np.pi / 2, 3 * np.pi]]
    )
    assert np.abs(psin(x) - np.sin(x)).max() < 1e-14
    assert np.abs(pcos(x) - np.cos(x)).max() < 1e-14
    y, x2 = rng.uniform(-3, 3, 50_000), rng.uniform(-3, 3, 50_000)
    assert np.abs(patan2(y, x2) - np.arctan2(y, x2)).max() < 1e-14
    s = np.concatenate([rng.uniform(-1, 1, 50_000), [-1.0, 1.0]])
    assert np.abs(pasin(s) - np.arcsin(s)).max() < 1e-13


def test_atan2_edges():
    assert float(patan2([0.0], [0.0])[0]) == 0.0
    assert float(patan2([1.0], [0.0])[0]) == np.pi / 2
    assert float(patan2([-1.0], [0.0])[0]) == -np.pi / 2
    # extreme ratio: the |q|>1 fold keeps q*q from overflowing
    assert float(patan2([1.0], [1e-300])[0]) == np.pi / 2
    assert abs(float(patan2([1.0], [-1e-300])[0]) - np.pi / 2) < 1e-15


def test_sql_psin_bit_equal():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT (i * 0.00173 - 17.0) AS x FROM "
        "(SELECT unnest(range(20000)) AS i)"
    )
    q = (
        f"SELECT x, {psin_poly_sql('w')} AS s FROM "
        f"(SELECT x, {psin_reduce_sql('x')} AS w FROM v)"
    )
    df = con.execute(q).df()
    assert np.array_equal(psin(df["x"].to_numpy()), df["s"].to_numpy())


def test_sql_atan2_bit_equal():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT (i * 0.0007 - 7.0) AS y, "
        "((i * 37 % 20000) * 0.0007 - 7.0) AS x FROM "
        "(SELECT unnest(range(20000)) AS i)"
    )
    from spatial4n_spark.kernels.ptrig import patan2_case_sql

    q = f"""
WITH p0 AS MATERIALIZED (SELECT y, x, y / (CASE WHEN x = 0e0 THEN 1e0 ELSE x END) AS q FROM v),
p1 AS MATERIALIZED (SELECT *, {atan_fold_arg_sql('q')} AS qq FROM p0),
p2 AS MATERIALIZED (SELECT *, {atan_z1_sql('qq')} AS z1 FROM p1),
p3 AS MATERIALIZED (SELECT *, {atan_z1_sql('z1')} AS z2 FROM p2),
p4 AS MATERIALIZED (SELECT *, {atan_z1_sql('z2')} AS z3 FROM p3),
p5 AS MATERIALIZED (SELECT *, {atan_poly_sql('z3')} AS a0 FROM p4),
p6 AS MATERIALIZED (SELECT *, {atan_unfold_sql('a0', 'q')} AS a FROM p5)
SELECT y, x, {patan2_case_sql('a', 'y', 'x')} AS at2 FROM p6"""
    df = con.execute(q).df()
    assert np.array_equal(
        patan2(df["y"].to_numpy(), df["x"].to_numpy()), df["at2"].to_numpy()
    )


def test_portable_point_on_bearing_close_to_libm():
    from spatial4n_spark.kernels.distance import (
        point_on_bearing_rad,
        point_on_bearing_rad_portable,
    )

    rng = np.random.default_rng(3)
    lat = rng.uniform(-1.5, 1.5, 20_000)
    lon = rng.uniform(-np.pi, np.pi, 20_000)
    d = rng.uniform(0.0, 3.0, 20_000)
    b = rng.uniform(0.0, 2 * np.pi, 20_000)
    la, lo = point_on_bearing_rad(lat, lon, d, b)
    pa, po = point_on_bearing_rad_portable(lat, lon, d, b)
    assert np.abs(la - pa).max() < 1e-12
    # lon wraps: compare circularly
    dl = np.abs(lo - po)
    assert np.minimum(dl, 2 * np.pi - dl).max() < 1e-12
