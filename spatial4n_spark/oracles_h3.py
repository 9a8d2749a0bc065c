"""DuckDB SQL mirror of the H3-style hex cell kernel
(``kernels/h3cell.py``).

Same bit-parity doctrine as ``oracles_s2.py``: every stage is the SAME
+, -, *, /, floor, abs, CASE, integer-bit-op sequence the numpy kernel
executes, staged through MATERIALIZED CTE columns (one column per numpy
local).  The hex chain is far shorter than S2's — no trig at all — so
the produced cell ids and the unrounded decoded hex centers are
bit-identical across numpy and DuckDB by construction; the only shared
irrational constant is one sqrt(3) double literal.
"""

from __future__ import annotations

from spatial4n_spark.kernels.h3cell import (
    OFF,
    SQRT3,
    SQRT3_2,
    SQRT3_3,
    THIRD,
    TWO_THIRDS,
    hex_size,
)
from spatial4n_spark.oracles import dlit


def h3_encode_stages_sql(cte: str, keep: str, level: int) -> str:
    """CTE chain ``{cte}(keep..., lon, lat)`` -> final CTE ``h3f`` with
    columns ``keep..., q, r, cell``.

    ``keep`` is a comma-joined passthrough column list.  Append the
    returned text after your points CTE (it starts with a comma).
    """
    inv_s = dlit(1.0 / hex_size(level))
    parts = [
        f""",
g0 AS MATERIALIZED (
  SELECT {keep},
         ({dlit(SQRT3_3)} * lon - {dlit(THIRD)} * lat) * {inv_s} AS qf,
         ({dlit(TWO_THIRDS)} * lat) * {inv_s} AS rf
  FROM {cte}),
g1 AS MATERIALIZED (
  SELECT {keep}, qf, rf, -qf - rf AS sf FROM g0),
g2 AS MATERIALIZED (
  SELECT {keep}, qf, rf, sf,
         floor(qf + 5e-1) AS rq, floor(rf + 5e-1) AS rr, floor(sf + 5e-1) AS rs
  FROM g1),
g3 AS MATERIALIZED (
  SELECT {keep}, rq, rr, rs,
         abs(rq - qf) AS dq, abs(rr - rf) AS dr, abs(rs - sf) AS ds
  FROM g2),
g4 AS MATERIALIZED (
  SELECT {keep},
         CAST((CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END) AS BIGINT) AS q,
         CAST((CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds THEN -rq - rs ELSE rr END) AS BIGINT) AS r
  FROM g3),
h3f AS MATERIALIZED (
  SELECT {keep}, q, r,
         ((CAST({level} AS BIGINT) << 56) | ((q + {OFF}) << 28) | (r + {OFF})) AS cell
  FROM g4)"""
    ]
    return "".join(parts)


def h3_center_stages_sql(keep: str, level: int) -> str:
    """Continues after :func:`h3_encode_stages_sql` (reads CTE ``h3f``):
    the decoded hex center as UNROUNDED lat/lon degrees, final CTE
    ``h3c`` with columns ``keep..., cell, clat, clon``."""
    s = dlit(hex_size(level))
    return f""",
h3c AS MATERIALIZED (
  SELECT {keep}, cell,
         ((15e-1) * CAST(r AS DOUBLE)) * {s} AS clat,
         ({dlit(SQRT3)} * CAST(q AS DOUBLE) + {dlit(SQRT3_2)} * CAST(r AS DOUBLE)) * {s} AS clon
  FROM h3f)"""
