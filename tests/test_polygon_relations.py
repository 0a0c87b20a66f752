"""The reference's S2PolygonTestBase.Relations table
(test/s2/s2polygon_test.d:612-707): contains / contained / intersects
over the near/far/south/cross/overlap fixture family, including the
`_full` whole-sphere polygon row (Polygon.full()).
"""

from __future__ import annotations

import pytest

from s2geometry_d_ray.core import polygon_ops as po
from s2geometry_d_ray.core.textformat import make_polygon

# Fixture loop strings, s2polygon_test.d:68-110.
NEAR0 = "-1:0, 0:1, 1:0, 0:-1;"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
NEAR2 = "-1:-2, -2:5, 5:-2;"
NEAR3 = "-2:-2, -3:6, 6:-3;"
NEAR_HEMI = "0:-90, -90:0, 0:90, 90:0;"

FAR0 = "0:179, 1:180, 0:-179, 2:-180;"
FAR1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178;"
FAR2 = "3:-178, 3:178, -1:179, -1:-179;"
FAR3 = "-3:-178, 4:-177, 4:177, -3:178, -2:179;"
FAR_HEMI = "0:-90, 60:90, -60:90;"

SOUTH0A = "-90:0, -89.99:0.01, -89.99:0;"
SOUTH0B = "-90:0, -89.99:0.03, -89.99:0.02;"
SOUTH0C = "-90:0, -89.99:0.05, -89.99:0.04;"
SOUTH1 = "-90:0, -89.9:0.1, -89.9:-0.1;"
SOUTH2 = "-90:0, -89.8:0.2, -89.8:-0.2;"
SOUTH_HEMI = "0:-180, 0:60, 0:-60;"

NEAR_FAR1 = ("-1:-9, -9:-9, -9:9, 9:9, 9:-9, 1:-9, "
             "1:-175, 9:-175, 9:175, -9:175, -9:-175, -1:-175;")
NEAR_FAR2 = ("-2:15, -2:170, -8:-175, 8:-175, "
             "2:170, 2:15, 8:-4, -8:-4;")

CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1;"
CROSS1_SIDE_HOLE = "-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5;"
CROSS2 = "1:-2, 1:-1, 1:1, 1:2, -1:2, -1:1, -1:-1, -1:-2;"
CROSS2_SIDE_HOLE = "0.5:-1.5, 0.5:-1.2, -0.5:-1.2, -0.5:-1.5;"
CROSS_CENTER_HOLE = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5;"

OVERLAP1 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0;"
OVERLAP1_SIDE_HOLE = "0.2:0.8, 0.8:0.8, 0.8:0.2, 0.2:0.2;"
OVERLAP2 = "1:1, 2:1, 3:1, 3:0, 2:0, 1:0;"
OVERLAP2_SIDE_HOLE = "2.2:0.8, 2.8:0.8, 2.8:0.2, 2.2:0.2;"
OVERLAP_CENTER_HOLE = "1.2:0.8, 1.8:0.8, 1.8:0.2, 1.2:0.2;"


def _p(*loop_strings):
    return make_polygon("".join(loop_strings))


FIX = {}


def _fixtures():
    if FIX:
        return FIX
    FIX.update({
        "empty": None,
        "full": make_polygon("full"),
        "near10": _p(NEAR0, NEAR1),
        "near30": _p(NEAR3, NEAR0),
        "near32": _p(NEAR2, NEAR3),
        "near3210": _p(NEAR0, NEAR2, NEAR3, NEAR1),
        "nearH3210": _p(NEAR0, NEAR2, NEAR3, NEAR_HEMI, NEAR1),
        "far10": _p(FAR0, FAR1),
        "far21": _p(FAR2, FAR1),
        "far321": _p(FAR2, FAR3, FAR1),
        "farH20": _p(FAR2, FAR_HEMI, FAR0),
        "farH3210": _p(FAR2, FAR_HEMI, FAR0, FAR1, FAR3),
        "south0ab": _p(SOUTH0A, SOUTH0B),
        "south2": _p(SOUTH2),
        "south210b": _p(SOUTH2, SOUTH0B, SOUTH1),
        "southH21": _p(SOUTH2, SOUTH_HEMI, SOUTH1),
        "southH20abc": _p(SOUTH2, SOUTH0B, SOUTH_HEMI, SOUTH0A, SOUTH0C),
        "nf1N10F2S10abc": _p(SOUTH0C, FAR2, NEAR1, NEAR_FAR1, NEAR0,
                             SOUTH1, SOUTH0B, SOUTH0A),
        "nf2N2F210S210ab": _p(FAR2, SOUTH0A, FAR1, SOUTH1, FAR0, SOUTH0B,
                              NEAR_FAR2, SOUTH2, NEAR2),
        "f32N0": _p(FAR2, NEAR0, FAR3),
        "n32S0b": _p(NEAR3, SOUTH0B, NEAR2),
        "cross1": _p(CROSS1),
        "cross1SideHole": _p(CROSS1, CROSS1_SIDE_HOLE),
        "cross1CenterHole": _p(CROSS1, CROSS_CENTER_HOLE),
        "cross2": _p(CROSS2),
        "cross2SideHole": _p(CROSS2, CROSS2_SIDE_HOLE),
        "cross2CenterHole": _p(CROSS2, CROSS_CENTER_HOLE),
        "overlap1": _p(OVERLAP1),
        "overlap1SideHole": _p(OVERLAP1, OVERLAP1_SIDE_HOLE),
        "overlap1CenterHole": _p(OVERLAP1, OVERLAP_CENTER_HOLE),
        "overlap2": _p(OVERLAP2),
        "overlap2SideHole": _p(OVERLAP2, OVERLAP2_SIDE_HOLE),
        "overlap2CenterHole": _p(OVERLAP2, OVERLAP_CENTER_HOLE),
    })
    return FIX


# (a, b, contains, contained, intersects) — s2polygon_test.d:638-707.
RELATIONS = [
    ("near10", "empty", True, False, False),
    ("near10", "near10", True, True, True),
    ("full", "near10", True, False, True),
    ("near10", "near30", False, True, True),
    ("near10", "near32", False, False, False),
    ("near10", "near3210", False, True, True),
    ("near10", "nearH3210", False, False, False),
    ("near30", "near32", True, False, True),
    ("near30", "near3210", True, False, True),
    ("near30", "nearH3210", False, False, True),
    ("near32", "near3210", False, True, True),
    ("near32", "nearH3210", False, False, False),
    ("near3210", "nearH3210", False, False, False),
    ("far10", "far21", False, False, False),
    ("far10", "far321", False, True, True),
    ("far10", "farH20", False, False, False),
    ("far10", "farH3210", False, False, False),
    ("far21", "far321", False, False, False),
    ("far21", "farH20", False, False, False),
    ("far21", "farH3210", False, True, True),
    ("far321", "farH20", False, False, True),
    ("far321", "farH3210", False, False, True),
    ("farH20", "farH3210", False, False, True),
    ("south0ab", "south2", False, True, True),
    ("south0ab", "south210b", False, False, True),
    ("south0ab", "southH21", False, True, True),
    ("south0ab", "southH20abc", False, True, True),
    ("south2", "south210b", True, False, True),
    ("south2", "southH21", False, False, True),
    ("south2", "southH20abc", False, False, True),
    ("south210b", "southH21", False, False, True),
    ("south210b", "southH20abc", False, False, True),
    ("southH21", "southH20abc", True, False, True),
    ("nf1N10F2S10abc", "nf2N2F210S210ab", False, False, True),
    ("nf1N10F2S10abc", "near32", True, False, True),
    ("nf1N10F2S10abc", "far21", False, False, False),
    ("nf1N10F2S10abc", "south0ab", False, False, False),
    ("nf1N10F2S10abc", "f32N0", True, False, True),
    ("nf2N2F210S210ab", "near10", False, False, False),
    ("nf2N2F210S210ab", "far10", True, False, True),
    ("nf2N2F210S210ab", "south210b", True, False, True),
    ("nf2N2F210S210ab", "south0ab", True, False, True),
    ("nf2N2F210S210ab", "n32S0b", True, False, True),
    ("cross1", "cross2", False, False, True),
    ("cross1SideHole", "cross2", False, False, True),
    ("cross1CenterHole", "cross2", False, False, True),
    ("cross1", "cross2SideHole", False, False, True),
    ("cross1", "cross2CenterHole", False, False, True),
    ("cross1SideHole", "cross2SideHole", False, False, True),
    ("cross1CenterHole", "cross2SideHole", False, False, True),
    ("cross1SideHole", "cross2CenterHole", False, False, True),
    ("cross1CenterHole", "cross2CenterHole", False, False, True),
    ("overlap1", "overlap2", False, False, True),
    ("overlap1SideHole", "overlap2", False, False, True),
    ("overlap1CenterHole", "overlap2", False, False, True),
    ("overlap1", "overlap2SideHole", False, False, True),
    ("overlap1", "overlap2CenterHole", False, False, True),
    ("overlap1SideHole", "overlap2SideHole", False, False, True),
    ("overlap1CenterHole", "overlap2SideHole", False, False, True),
    ("overlap1SideHole", "overlap2CenterHole", False, False, True),
    ("overlap1CenterHole", "overlap2CenterHole", False, False, True),
]


@pytest.mark.parametrize(
    "an,bn,contains,contained,intersects", RELATIONS,
    ids=[f"{a}-vs-{b}" for a, b, *_ in RELATIONS])
def test_relation(an, bn, contains, contained, intersects):
    f = _fixtures()
    a, b = f[an], f[bn]
    assert po.contains_polygon(a, b) == contains, "contains"
    assert po.contains_polygon(b, a) == contained, "contained"
    assert po.intersects_polygon(a, b) == intersects, "intersects"


def test_full_polygon_basics():
    """s2polygon_test.d:712-718: the full polygon is non-empty, full,
    contains itself and the empty polygon, and has area 4*pi."""
    import math
    full = make_polygon("full")
    assert not full.is_empty()
    assert full.is_full
    assert po.contains_polygon(full, None)
    assert po.contains_polygon(full, full)
    assert not po.intersects_polygon(full, None)
    assert abs(po.polygon_area(full) - 4 * math.pi) < 1e-14
    near10 = _fixtures()["near10"]
    assert po.polygon_area(po.boolean_union(full, near10)) \
        == 4 * math.pi
    inter = po.boolean_intersection(full, near10)
    assert abs(po.polygon_area(inter) - po.polygon_area(near10)) < 1e-14
    assert po.boolean_difference(near10, full) is None
    # points anywhere are inside
    import numpy as np
    pts = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    assert full.contains_points(pts).all()
