"""Image-oracle SQL parity locks (DuckDB only, no Spark): the splitmix64
emulation, u01 lattice, coordinate mixture, and geohash bisection mirror
must stay bit-equal to the numpy generator/kernels they recompute."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from spatial4n_spark import oracles as O
from spatial4n_spark.oracles_images import (
    _geohash_bisect_sql,
    _meta_cte,
    _mix64_sql,
    _u01,
)
from spatial4n_spark.kernels.geohash import geohash_encode_str
from spatial4n_spark.sources.images import _mix64, _u01 as np_u01, synth_coords


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    # a tiny stand-in events view: n_images = max(2 * count, 1000)
    c.execute("CREATE VIEW events AS SELECT * FROM range(1500)")
    return c


def test_mix64_sql_bit_parity(con):
    sql = _mix64_sql(
        "SELECT unnest(range(0, 4096)) AS i",
        ["i"],
        {"x": "CAST(i * 127267 + 99 AS UBIGINT)"},
    )
    got = (
        con.execute(f"SELECT x FROM ({sql}) ORDER BY i").fetchnumpy()["x"].astype(np.uint64)
    )
    ids = np.arange(4096, dtype=np.uint64)
    ref = _mix64(ids * np.uint64(127267) + np.uint64(99))
    assert np.array_equal(got, ref)


def test_u01_sql_bit_parity(con):
    sql = _mix64_sql(
        "SELECT unnest(range(0, 4096)) AS i",
        ["i"],
        {"k": "CAST(i * 1000003 + 231051 AS UBIGINT)"},  # salt 3
    )
    got = con.execute(f"SELECT {_u01('k')} AS u FROM ({sql}) ORDER BY i").fetchnumpy()["u"]
    assert np.array_equal(got, np_u01(np.arange(4096), 3))


def test_meta_cte_coords_bit_parity(con):
    df = con.execute(f"WITH {_meta_cte()} SELECT * FROM geo ORDER BY i").fetchdf()
    assert len(df) == 3000  # 2 * count(events)
    ids = np.arange(3000, dtype=np.int64)
    lon, lat = synth_coords(ids)
    assert np.array_equal(df["lon"].to_numpy(), lon)
    assert np.array_equal(df["lat"].to_numpy(), lat)
    w = (8 + (np_u01(ids, 4) * 4).astype(np.int32) * 8).astype(np.int64)
    assert np.array_equal(df["w"].to_numpy().astype(np.int64), w)


def test_geohash_bisect_sql_matches_kernel(con):
    """The chained-subquery bisection must equal kernels.geohash encode on
    ARBITRARY doubles (the closed-form ceil twin is lattice-only)."""
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180.0, 180.0, 2000)
    lat = rng.uniform(-90.0, 90.0, 2000)
    import pandas as pd

    con.register("pts", pd.DataFrame({"j": np.arange(2000), "lon": lon, "lat": lat}))
    bi = _geohash_bisect_sql("SELECT j, lon, lat FROM pts", ["j"], "lon", "lat", 4)
    packed = O.geohash_interleave_sql("ix", "iy", 4)
    cell = O.geohash_chars_sql("packed", 4)
    got = con.execute(
        f"WITH b AS ({bi}), p AS (SELECT j, {packed} AS packed FROM b) "
        f"SELECT {cell} AS cell FROM p ORDER BY j"
    ).fetchdf()["cell"].to_numpy()
    ref = np.array(geohash_encode_str(lat, lon, 4))
    assert np.array_equal(got, ref)
