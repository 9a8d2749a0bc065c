"""The 4-valued spatial relation algebra.

Semantics per reference ``src/Spatial4n/Shapes/SpatialRelation.cs:34-154``:
enum values None=0, Within=1, Contains=2, Disjoint=3, Intersects=4.
CONTAINS/WITHIN are OGC COVERS/COVERED-BY — boundaries belong to the shape;
there is no TOUCHES/CROSSES/OVERLAPS/EQUALS (equal shapes prefer CONTAINS).

All helpers are numpy-vectorized over int8 arrays (scalars also work).
"""

from __future__ import annotations

import numpy as np

NONE = np.int8(0)
WITHIN = np.int8(1)
CONTAINS = np.int8(2)
DISJOINT = np.int8(3)
INTERSECTS = np.int8(4)

_NAMES = np.array(["NONE", "WITHIN", "CONTAINS", "DISJOINT", "INTERSECTS"])

# Lookup tables indexed by relation value 0..4.
# transpose: Contains<->Within, else identity (SpatialRelation.cs:95-103)
_TRANSPOSE = np.array([0, 2, 1, 3, 4], dtype=np.int8)
# inverse: DISJOINT->CONTAINS, CONTAINS->DISJOINT, WITHIN->INTERSECTS
# (SpatialRelation.cs:145-154; non-commutative, used by the inverse-circle trick)
_INVERSE = np.array([0, 4, 3, 2, 4], dtype=np.int8)


def rel_name(rel):
    """Human-readable name(s) of relation value(s)."""
    return _NAMES[np.asarray(rel, dtype=np.int8)]


def rel_from_name(name: str) -> np.int8:
    names = _NAMES.tolist()
    return np.int8(names.index(name))


def transpose(rel):
    return _TRANSPOSE[np.asarray(rel, dtype=np.int8)]


def inverse(rel):
    return _INVERSE[np.asarray(rel, dtype=np.int8)]


def intersects(rel):
    """True unless DISJOINT (or NONE). SpatialRelation.cs:131-134."""
    r = np.asarray(rel, dtype=np.int8)
    return (r != DISJOINT) & (r != NONE)


def combine(rel_a, rel_b):
    """Relation of one shape against the union of two others.

    SpatialRelation.cs:110-126: same=>same; {DISJOINT,CONTAINS} in any
    order => CONTAINS; anything else => INTERSECTS.
    """
    a = np.asarray(rel_a, dtype=np.int8)
    b = np.asarray(rel_b, dtype=np.int8)
    out = np.full(np.broadcast(a, b).shape, INTERSECTS, dtype=np.int8)
    same = a == b
    out = np.where(same, a, out)
    dc = ((a == DISJOINT) & (b == CONTAINS)) | ((a == CONTAINS) & (b == DISJOINT))
    out = np.where(dc, CONTAINS, out)
    if out.shape == ():
        return np.int8(out)
    return out
