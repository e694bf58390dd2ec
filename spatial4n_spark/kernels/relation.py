"""Spatial relation codes and their algebra, vectorized.

Semantics: Spatial4n.Core/Shapes/SpatialRelation.cs:34-154 (reference).
Codes match the reference enum exactly so verdicts can be compared
bit-for-bit: WITHIN=1, CONTAINS=2, DISJOINT=3, INTERSECTS=4.
CONTAINS/WITHIN are OGC COVERS/COVERED-BY (boundaries count as interior).
"""
from __future__ import annotations

import numpy as np

NONE = 0
WITHIN = 1
CONTAINS = 2
DISJOINT = 3
INTERSECTS = 4

NAMES = {NONE: "NONE", WITHIN: "WITHIN", CONTAINS: "CONTAINS",
         DISJOINT: "DISJOINT", INTERSECTS: "INTERSECTS"}

# Lookup tables indexed by relation code (0..4).
_TRANSPOSE = np.array([NONE, CONTAINS, WITHIN, DISJOINT, INTERSECTS], dtype=np.int8)
# Inverse(): DISJOINT->CONTAINS, CONTAINS->DISJOINT, WITHIN->INTERSECTS, else INTERSECTS
_INVERSE = np.array([INTERSECTS, INTERSECTS, DISJOINT, CONTAINS, INTERSECTS], dtype=np.int8)
_INVERSE[DISJOINT] = CONTAINS
_INVERSE[CONTAINS] = DISJOINT
_INVERSE[WITHIN] = INTERSECTS
_INVERSE[INTERSECTS] = INTERSECTS
_INVERSE[NONE] = INTERSECTS


def transpose(rel):
    """relate(a,b) -> relate(b,a). Reference SpatialRelation.cs:95-103."""
    return _TRANSPOSE[np.asarray(rel, dtype=np.int64)]


def inverse(rel):
    """Relation of the complement shape. Reference SpatialRelation.cs:145-154."""
    return _INVERSE[np.asarray(rel, dtype=np.int64)]


def intersects(rel):
    """Anything but DISJOINT. Reference SpatialRelation.cs:131-134."""
    return np.asarray(rel) != DISJOINT


def combine(rel, other):
    """Merge verdicts as if targets were combined into one collection.

    State machine per reference SpatialRelation.cs:110-126:
      X + X == X; DISJOINT + CONTAINS == CONTAINS; anything else INTERSECTS.
    """
    rel = np.asarray(rel, dtype=np.int8)
    other = np.asarray(other, dtype=np.int8)
    out = np.full(np.broadcast(rel, other).shape, INTERSECTS, dtype=np.int8)
    same = rel == other
    out = np.where(same, rel, out)
    dc = ((rel == DISJOINT) & (other == CONTAINS)) | ((rel == CONTAINS) & (other == DISJOINT))
    out = np.where(dc, CONTAINS, out)
    return out


def combine_reduce(rels: np.ndarray) -> int:
    """Fold combine() over a 1-D array of verdicts (for collection relate)."""
    acc = int(rels[0])
    for r in rels[1:]:
        acc = int(combine(acc, int(r)))
        if acc == INTERSECTS:
            break
    return acc
