"""DuckDB SQL mirror of the S2-style cell kernel (``kernels/s2cell.py``).

Same bit-parity doctrine as ``oracles.py`` / ``kernels/ptrig.py``: every
stage below is the SAME +,-,*,/,sqrt,floor,CASE,integer-bit-op sequence
the numpy kernel executes, staged through MATERIALIZED CTE columns (one
column per numpy local) so nothing re-expands.  Trig is the engine-
portable chain, so the produced cell ids — and the unrounded decoded
cell-center doubles — are bit-identical across numpy and DuckDB, with no
tie-boundary hazard at the i/j binning step.

The Hilbert walk is unrolled: one CTE per level, each folding two
16-branch literal CASEs (IJ_TO_POS and the orientation XOR, both
flattened from the kernel's tables at SQL-generation time — the tables
themselves are pinned by tests/test_s2cell.py's continuity/bijection
properties).
"""

from __future__ import annotations

from spatial4n_spark.kernels.ptrig import (
    PI_2,
    patan2_case_sql,
    patan2_pair_stages_sql,
    psin_poly_sql,
    psin_reduce_sql,
)
from spatial4n_spark.kernels.s2cell import (
    DEG_TO_RAD,
    IJ_TO_POS,
    POS_TO_ORIENT,
    RAD_TO_DEG,
)
from spatial4n_spark.oracles import dlit


def _pos_case(o: str, ij: str) -> str:
    """16-branch literal lookup: IJ_TO_POS[o][ij]."""
    sel = f"({o} * 4 + {ij})"
    whens = " ".join(
        f"WHEN {o4 * 4 + ij4} THEN {int(IJ_TO_POS[o4][ij4])}"
        for o4 in range(4)
        for ij4 in range(4)
    )
    return f"(CASE {sel} {whens} END)"


def _orient_case(o: str, ij: str) -> str:
    """16-branch literal lookup: o XOR POS_TO_ORIENT[IJ_TO_POS[o][ij]]."""
    sel = f"({o} * 4 + {ij})"
    whens = " ".join(
        f"WHEN {o4 * 4 + ij4} THEN {int(o4 ^ int(POS_TO_ORIENT[int(IJ_TO_POS[o4][ij4])]))}"
        for o4 in range(4)
        for ij4 in range(4)
    )
    return f"(CASE {sel} {whens} END)"


def s2_encode_stages_sql(cte: str, keep: str, level: int) -> str:
    """CTE chain ``{cte}(keep..., lon, lat)`` -> final CTE ``s2f`` with
    columns ``keep..., face, i, j, cell``.

    ``keep`` is a comma-joined list of passthrough columns.  Append the
    returned text after your points CTE (it starts with a comma).
    """
    half = dlit(PI_2)
    n = 1 << level
    nf = dlit(float(n))
    # face: np.where(x_dom, x>=0?0:3, np.where(y_dom, y>=0?1:4, z>=0?2:5))
    face = (
        "(CASE WHEN xdom THEN (CASE WHEN x >= 0e0 THEN 0 ELSE 3 END) "
        "WHEN ydom THEN (CASE WHEN y >= 0e0 THEN 1 ELSE 4 END) "
        "ELSE (CASE WHEN z >= 0e0 THEN 2 ELSE 5 END) END)"
    )
    u = (
        "(CASE WHEN xdom THEN (CASE WHEN x >= 0e0 THEN y / sx ELSE z / sx END) "
        "WHEN ydom THEN (CASE WHEN y >= 0e0 THEN -x / sy ELSE z / sy END) "
        "ELSE (CASE WHEN z >= 0e0 THEN -x / sz ELSE -y / sz END) END)"
    )
    v = (
        "(CASE WHEN xdom THEN (CASE WHEN x >= 0e0 THEN z / sx ELSE y / sx END) "
        "WHEN ydom THEN (CASE WHEN y >= 0e0 THEN z / sy ELSE -x / sy END) "
        "ELSE (CASE WHEN z >= 0e0 THEN -y / sz ELSE x / sz END) END)"
    )

    def st(col: str) -> str:
        return (
            f"(CASE WHEN {col} >= 0e0 THEN 5e-1 * sqrt(1e0 + 3e0 * {col}) "
            f"ELSE 1e0 - 5e-1 * sqrt(1e0 - 3e0 * {col}) END)"
        )

    def bin_ij(col: str) -> str:
        return (
            f"least(greatest(CAST(floor({col} * {nf}) AS BIGINT), 0), {n - 1})"
        )

    parts = [
        f""",
q0 AS MATERIALIZED (
  SELECT {keep}, lat * {dlit(DEG_TO_RAD)} AS la, lon * {dlit(DEG_TO_RAD)} AS lo FROM {cte}),
q1 AS MATERIALIZED (
  SELECT {keep}, {psin_reduce_sql('la')} AS w_sla, {psin_reduce_sql(f'(la + {half})')} AS w_cla,
         {psin_reduce_sql('lo')} AS w_slo, {psin_reduce_sql(f'(lo + {half})')} AS w_clo
  FROM q0),
q2 AS MATERIALIZED (
  SELECT {keep}, {psin_poly_sql('w_sla')} AS sla, {psin_poly_sql('w_cla')} AS cla,
         {psin_poly_sql('w_slo')} AS slo, {psin_poly_sql('w_clo')} AS clo
  FROM q1),
q3 AS MATERIALIZED (
  SELECT {keep}, cla * clo AS x, cla * slo AS y, sla AS z FROM q2),
q4 AS MATERIALIZED (
  SELECT {keep}, x, y, z,
         (abs(x) >= abs(y) AND abs(x) >= abs(z)) AS xdom,
         (NOT (abs(x) >= abs(y) AND abs(x) >= abs(z)) AND abs(y) >= abs(z)) AS ydom,
         (CASE WHEN x = 0e0 THEN 1e0 ELSE x END) AS sx,
         (CASE WHEN y = 0e0 THEN 1e0 ELSE y END) AS sy,
         (CASE WHEN z = 0e0 THEN 1e0 ELSE z END) AS sz
  FROM q3),
q5 AS MATERIALIZED (
  SELECT {keep}, {face} AS face, {u} AS u, {v} AS v FROM q4),
q6 AS MATERIALIZED (
  SELECT {keep}, face, {bin_ij(st('u'))} AS i, {bin_ij(st('v'))} AS j FROM q5),
h{level} AS MATERIALIZED (
  SELECT {keep}, face, i, j, (face & 1) AS o, CAST(0 AS BIGINT) AS pos FROM q6)"""
    ]
    for k in range(level - 1, -1, -1):
        ij = f"((((i >> {k}) & 1) << 1) | ((j >> {k}) & 1))"
        parts.append(
            f"""
h{k} AS MATERIALIZED (
  SELECT {keep}, face, i, j, {_orient_case('o', ij)} AS o,
         ((pos << 2) | {_pos_case('o', ij)}) AS pos FROM h{k + 1})"""
        )
    parts.append(
        f"""
s2f AS MATERIALIZED (
  SELECT {keep}, face, i, j,
         ((CAST(face AS BIGINT) << {2 * level}) | pos) AS cell FROM h0)"""
    )
    return ",".join(parts)


def s2_center_stages_sql(keep: str, level: int) -> str:
    """Continues after :func:`s2_encode_stages_sql` (reads CTE ``s2f``):
    decoded ST-center of each cell as UNROUNDED lat/lon degrees, final CTE
    ``s2c`` with columns ``keep..., face, cell, clat, clon``.

    The kernel decodes (i, j) back out of the Hilbert position; here the
    encode stages' own (i, j) are used directly — identical by the
    roundtrip property pinned in tests/test_s2cell.py, and it keeps the
    inverse walk out of SQL.  The patan2/pasin staging mirrors
    oracles.point_on_bearing_select_sql.
    """
    inv_n = dlit(1.0 / float(1 << level))
    uv = (
        lambda s: f"(CASE WHEN {s} >= 5e-1 THEN (4e0 * {s} * {s} - 1e0) / 3e0 "
        f"ELSE (1e0 - 4e0 * (1e0 - {s}) * (1e0 - {s})) / 3e0 END)"
    )

    def sel(cases: list[str]) -> str:
        whens = " ".join(f"WHEN {f} THEN {e}" for f, e in zip(range(6), cases))
        return f"(CASE face {whens} END)"

    x = sel(["1e0", "-cu", "-cu", "-1e0", "cv", "-cv"])
    y = sel(["cu", "1e0", "-cv", "-cv", "-1e0", "cu"])
    z = sel(["cv", "cv", "1e0", "-cu", "-cu", "-1e0"])
    return f"""
c0 AS MATERIALIZED (
  SELECT {keep}, face, cell,
         (CAST(i AS DOUBLE) + 5e-1) * {inv_n} AS s,
         (CAST(j AS DOUBLE) + 5e-1) * {inv_n} AS t
  FROM s2f),
c1 AS MATERIALIZED (
  SELECT {keep}, face, cell, {uv('s')} AS cu, {uv('t')} AS cv FROM c0),
c2 AS MATERIALIZED (
  SELECT {keep}, cell, {x} AS x, {y} AS y, {z} AS z FROM c1),
c3 AS MATERIALIZED (
  SELECT {keep}, cell, x, y, (z / sqrt(x * x + y * y + z * z)) AS zn FROM c2),
c4 AS MATERIALIZED (
  SELECT {keep}, cell, x, y, zn, sqrt(1e0 - zn * zn) AS axx FROM c3),
c5 AS MATERIALIZED (
  SELECT {keep}, cell, x, y, zn, axx,
         zn / (CASE WHEN axx = 0e0 THEN 1e0 ELSE axx END) AS qa,
         y / (CASE WHEN x = 0e0 THEN 1e0 ELSE x END) AS qb
  FROM c4),{patan2_pair_stages_sql('c', 'c5')},
s2c AS MATERIALIZED (
  SELECT {keep}, cell,
         ({patan2_case_sql('aa', 'zn', 'axx')} * {dlit(RAD_TO_DEG)}) AS clat,
         ({patan2_case_sql('ab', 'y', 'x')} * {dlit(RAD_TO_DEG)}) AS clon
  FROM c8b)"""
