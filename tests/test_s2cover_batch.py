"""Batched S2 circle covers (plans/s2cover.s2_circle_covers_batch).

The batched planner's contract is SUPERSET-of-the-exact-planner: it
prunes by exact-cell-bbox x exact-circle-bbox intersection, which keeps
every cell the scalar BFS keeps (full or boundary) and at most a bbox
corner's worth more.  kNN acceptance over the clustered layout is sound
iff this superset property holds, so it is hammered here on the
adversarial set: dateline straddlers, pole wraps, cube-corner centers
(three faces meet — the extended-plane hard case), tiny and huge radii,
plus a random sweep.  Radii are paired with levels the way the kNN
caller pairs them (cover ~8 cells across) so cover sizes stay bounded.
"""

import numpy as np
import pytest

from spatial4n_spark.kernels.polygon import Circle
from spatial4n_spark.plans.s2cover import cover_cells_s2, s2_circle_covers_batch

CORNER = float(np.degrees(np.arctan(1 / np.sqrt(2))))

ADVERSARIAL = [
    (0.0, 0.0, 1.0),
    (179.9, 0.0, 2.0),
    (-179.95, 10.0, 1.0),
    (10.0, 89.5, 2.0),
    (-120.0, -89.0, 3.0),
    (45.0, CORNER, 1.5),
    (-135.0, -CORNER, 0.5),
    (0.0, 45.0, 0.01),
    (180.0, CORNER, 5.0),
    (45.0, 90.0, 1.0),
    (0.0, -90.0, 2.0),
    (90.0, 0.0, 10.0),
]


def _level_for(r_deg: float) -> int:
    """Pair radius with level the way the kNN caller does: ~8 cells
    across the diameter, clamped to [2, 11]."""
    want = 2.0 * r_deg / 8.0
    return int(np.clip(np.floor(np.log2(90.0 / max(want, 1e-12))), 2, 11))


def _batch_sets(cases, level):
    qi, cells = s2_circle_covers_batch(
        np.array([c[0] for c in cases]),
        np.array([c[1] for c in cases]),
        np.array([c[2] for c in cases]),
        level,
    )
    got: dict[int, set[int]] = {}
    for q, c in zip(qi, cells):
        got.setdefault(int(q), set()).add(int(c))
    return got


@pytest.mark.parametrize("level", [2, 4, 6])
def test_superset_of_exact_planner_adversarial(level):
    got = _batch_sets(ADVERSARIAL, level)
    for i, (x, y, r) in enumerate(ADVERSARIAL):
        full, bound = cover_cells_s2(
            Circle(x, y, r, geo=True), level, True, max_cells=500_000
        )
        exact = set(full) | set(bound)
        missing = exact - got.get(i, set())
        assert not missing, f"case {i} {(x, y, r)}: {len(missing)} cells missing"


def test_superset_random_sweep_radius_matched_levels():
    rng = np.random.default_rng(7)
    cases = [
        (float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)),
         float(10 ** rng.uniform(-2, 1.0)))
        for _ in range(60)
    ]
    by_level: dict[int, list[tuple[int, tuple]]] = {}
    for i, c in enumerate(cases):
        by_level.setdefault(_level_for(c[2]), []).append((i, c))
    for level, group in by_level.items():
        got = _batch_sets([c for _, c in group], level)
        for gi, (i, (x, y, r)) in enumerate(group):
            full, bound = cover_cells_s2(
                Circle(x, y, r, geo=True), level, True, max_cells=500_000
            )
            exact = set(full) | set(bound)
            g = got.get(gi, set())
            assert exact <= g, f"level {level} case {i}: not a superset"
            # tightness: bbox-vs-circle slack stays a small constant factor
            assert len(g) <= 4 * len(exact) + 16


def test_per_query_radii_mix_in_one_call():
    lons = np.array([0.0, 100.0, -170.0])
    lats = np.array([0.0, 45.0, -60.0])
    rs = np.array([0.5, 2.0, 8.0])
    got = _batch_sets(list(zip(lons, lats, rs)), 5)
    for i in range(3):
        full, bound = cover_cells_s2(
            Circle(float(lons[i]), float(lats[i]), float(rs[i]), geo=True),
            5, True, max_cells=500_000,
        )
        assert (set(full) | set(bound)) <= got[i]
