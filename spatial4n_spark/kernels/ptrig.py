"""Engine-portable trig: bit-identical sin/cos/asin/atan2 across
numpy and DuckDB.

Why: libm trig differs between engines by ~1 ulp, so any quantization of
a trig output (round(x, 4), geohash bucketing, ...) has tie boundaries
where the two engines land in different buckets — the round-3 sf1 sweep
caught exactly this in point_on_bearing (4 rows in 1.5M flipped a 1e-4
quantum). Following the repo's bit-parity doctrine (op-for-op SQL
mirroring, see oracles.py), these functions use ONLY operations with
IEEE-754-determined results (+ - * / sqrt floor comparisons) plus
literal coefficients, evaluated in the SAME order by the numpy kernels
and by the SQL emitted here — so both engines produce the SAME double
and no defensive rounding is needed at all.

Accuracy vs true values: |err| <~ 4e-15 (Taylor tails at the reduction
boundaries), far inside the reference's own test tolerances; the gate
compares the two engines to each other, where equality is exact.

Construction:
- sin: range-reduce x by k = floor(x/2pi + 1/2), r = x - k*2pi; fold r
  into [-pi/2, pi/2] (sin(pi - r) = sin r); odd Taylor/Horner to r^21.
- cos(x) = sin(x + pi/2).
- atan: three tan-half-angle reductions z -> z / (1 + sqrt(1 + z^2))
  (|z'''| <= tan(pi/16) ~ 0.199), odd Taylor/Horner to z^21, result * 8;
  quadrant logic with literal pi for atan2.
- asin(x) = atan2(x, sqrt(1 - x*x)).
"""

from __future__ import annotations

import math

import numpy as np

TWO_PI = 2.0 * math.pi
PI = math.pi
PI_2 = math.pi / 2.0
INV_2PI = 1.0 / (2.0 * math.pi)

# odd Taylor coefficients 1/(2m+1)! with alternating sign, for sin up to r^21
_SIN_C = [(-1.0) ** m / math.factorial(2 * m + 1) for m in range(11)]
# odd Taylor coefficients (-1)^m/(2m+1) for atan up to z^21
_ATAN_C = [(-1.0) ** m / (2 * m + 1) for m in range(11)]


def _dlit(v: float) -> str:
    from spatial4n_spark.oracles import dlit

    return dlit(v)


# ---------------------------------------------------------------------------
# numpy side
# ---------------------------------------------------------------------------


def _odd_horner(r: np.ndarray, coeffs: list[float]) -> np.ndarray:
    """r * (c0 + c1 s + c2 s^2 + ...) with s = r*r, Horner order."""
    s = r * r
    p = np.full_like(r, coeffs[-1])
    for c in coeffs[-2::-1]:
        p = p * s + c
    return r * p


def psin(x) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    k = np.floor(x * INV_2PI + 0.5)
    r = x - k * TWO_PI
    r = np.where(r > PI_2, PI - r, r)
    r = np.where(r < -PI_2, -PI - r, r)
    return _odd_horner(r, _SIN_C)


def pcos(x) -> np.ndarray:
    return psin(np.asarray(x, dtype=np.float64) + PI_2)


def _atan01(z: np.ndarray) -> np.ndarray:
    """atan for |z| <= 1 via three half-angle reductions + Taylor."""
    z1 = z / (1.0 + np.sqrt(1.0 + z * z))
    z2 = z1 / (1.0 + np.sqrt(1.0 + z1 * z1))
    z3 = z2 / (1.0 + np.sqrt(1.0 + z2 * z2))
    return 8.0 * _odd_horner(z3, _ATAN_C)


def patan2(y, x) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    safe_x = np.where(x == 0.0, 1.0, x)
    q = y / safe_x
    # |q| > 1 folds through atan(q) = sign(q)*pi/2 - atan(1/q): keeps the
    # reduction free of q*q overflow for extreme ratios and the Taylor
    # argument small
    inv = np.abs(q) > 1.0
    qq = np.where(inv, 1.0 / np.where(inv, q, 1.0), q)
    a0 = _atan01(qq)
    a = np.where(inv, np.where(q > 0.0, PI_2, -PI_2) - a0, a0)
    out = np.where(x > 0.0, a, 0.0)
    out = np.where((x < 0.0) & (y >= 0.0), a + PI, out)
    out = np.where((x < 0.0) & (y < 0.0), a - PI, out)
    out = np.where((x == 0.0) & (y > 0.0), PI_2, out)
    out = np.where((x == 0.0) & (y < 0.0), -PI_2, out)
    out = np.where((x == 0.0) & (y == 0.0), 0.0, out)
    return out


def pasin(x) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return patan2(x, np.sqrt(1.0 - x * x))


# ---------------------------------------------------------------------------
# SQL side — emit the IDENTICAL chains over a (materialized) column name.
# Each helper returns an expression string; feed it column REFERENCES
# (cheap to repeat), never whole subexpressions, and stage intermediates
# through AS MATERIALIZED CTEs exactly like the numpy locals above.
# ---------------------------------------------------------------------------


def _odd_horner_sql(r: str, coeffs: list[float]) -> str:
    s = f"({r} * {r})"
    p = _dlit(coeffs[-1])
    for c in coeffs[-2::-1]:
        p = f"({p} * {s} + {_dlit(c)})"
    return f"({r} * {p})"


def psin_reduce_sql(x: str) -> str:
    """Stage 1 of sin: the folded reduction r (materialize this)."""
    k = f"floor({x} * {_dlit(INV_2PI)} + 5e-1)"
    r = f"({x} - {k} * {_dlit(TWO_PI)})"
    return (
        f"(CASE WHEN {r} > {_dlit(PI_2)} THEN {_dlit(PI)} - {r} "
        f"WHEN {r} < {_dlit(-PI_2)} THEN {_dlit(-PI)} - {r} ELSE {r} END)"
    )


def psin_poly_sql(r: str) -> str:
    """Stage 2 of sin: the Horner polynomial over a materialized r."""
    return _odd_horner_sql(r, _SIN_C)


def atan_fold_arg_sql(q: str) -> str:
    """|q| <= 1 Taylor argument: 1/q when |q| > 1, else q (materialize)."""
    return f"(CASE WHEN abs({q}) > 1e0 THEN 1e0 / {q} ELSE {q} END)"


def atan_unfold_sql(a: str, q: str) -> str:
    """Undo the fold over a materialized reduced atan ``a`` = atan(arg)."""
    return (
        f"(CASE WHEN abs({q}) > 1e0 THEN "
        f"(CASE WHEN {q} > 0e0 THEN {_dlit(PI_2)} ELSE {_dlit(-PI_2)} END) - {a} "
        f"ELSE {a} END)"
    )


def atan_z1_sql(z: str) -> str:
    return f"({z} / (1e0 + sqrt(1e0 + {z} * {z})))"


def atan_poly_sql(z3: str) -> str:
    return f"(8e0 * {_odd_horner_sql(z3, _ATAN_C)})"


def patan2_case_sql(a: str, y: str, x: str) -> str:
    """Quadrant CASE over a materialized reduced atan ``a`` = atan(y/safe_x)."""
    return (
        f"(CASE WHEN {x} > 0e0 THEN {a} "
        f"WHEN {x} < 0e0 AND {y} >= 0e0 THEN {a} + {_dlit(PI)} "
        f"WHEN {x} < 0e0 AND {y} < 0e0 THEN {a} - {_dlit(PI)} "
        f"WHEN {y} > 0e0 THEN {_dlit(PI_2)} "
        f"WHEN {y} < 0e0 THEN {_dlit(-PI_2)} ELSE 0e0 END)"
    )


def patan2_pair_stages_sql(prefix: str, src: str) -> str:
    """The dual-quotient atan staging shared by every oracle that mirrors
    ``patan2`` on two arguments at once: reads columns ``qa``/``qb`` from
    CTE ``src`` and emits the fold -> 3x half-angle -> odd-Horner ->
    unfold chain as MATERIALIZED CTEs ``{prefix}5b .. {prefix}8b``, the
    last exposing ``aa``/``ab`` = atan(qa), atan(qb). The caller supplies
    its own quadrant CASE (:func:`patan2_case_sql`) on top — the y/x
    operands differ per call site. Keeping the staging HERE (one copy)
    is bit-parity-critical: two hand-maintained copies could drift and
    break a cross-engine gate only at sweep time."""
    return f"""
{prefix}5b AS MATERIALIZED (
  SELECT *, {atan_fold_arg_sql('qa')} AS qqa, {atan_fold_arg_sql('qb')} AS qqb FROM {src}),
{prefix}6 AS MATERIALIZED (
  SELECT *, {atan_z1_sql('qqa')} AS qa1, {atan_z1_sql('qqb')} AS qb1 FROM {prefix}5b),
{prefix}7 AS MATERIALIZED (
  SELECT *, {atan_z1_sql('qa1')} AS qa2, {atan_z1_sql('qb1')} AS qb2 FROM {prefix}6),
{prefix}7b AS MATERIALIZED (
  SELECT *, {atan_z1_sql('qa2')} AS qa3, {atan_z1_sql('qb2')} AS qb3 FROM {prefix}7),
{prefix}8 AS MATERIALIZED (
  SELECT *, {atan_poly_sql('qa3')} AS aa0, {atan_poly_sql('qb3')} AS ab0 FROM {prefix}7b),
{prefix}8b AS MATERIALIZED (
  SELECT *, {atan_unfold_sql('aa0', 'qa')} AS aa, {atan_unfold_sql('ab0', 'qb')} AS ab
  FROM {prefix}8)"""
