"""Wedge relations (src/s2/s2wedge_relations.d): relationships between two
angles sharing a middle vertex — loop-relation primitives."""

from __future__ import annotations

from .predicates import ordered_ccw

WEDGE_EQUALS = "equals"
WEDGE_PROPERLY_CONTAINS = "properly_contains"
WEDGE_IS_PROPERLY_CONTAINED = "is_properly_contained"
WEDGE_PROPERLY_OVERLAPS = "properly_overlaps"
WEDGE_IS_DISJOINT = "is_disjoint"


def get_wedge_relation(a0, ab1, a2, b0, b2):
    """s2wedge_relations.d getWedgeRelation."""
    if a0 == b0 and a2 == b2:
        return WEDGE_EQUALS
    if ordered_ccw(a0, a2, b2, ab1):
        if ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return WEDGE_IS_PROPERLY_CONTAINED if a2 == b2 \
            else WEDGE_PROPERLY_OVERLAPS
    if ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return WEDGE_IS_DISJOINT if ordered_ccw(a0, b0, a2, ab1) \
        else WEDGE_PROPERLY_OVERLAPS


def wedge_contains(a0, ab1, a2, b0, b2):
    return ordered_ccw(a2, b2, b0, ab1) and ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2):
    return not (ordered_ccw(a0, b2, b0, ab1)
                and ordered_ccw(b0, a2, a0, ab1))
