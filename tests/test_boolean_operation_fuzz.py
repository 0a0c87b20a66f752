"""Randomized conservation laws for the mixed-dimension boolean
operation: for generic crossing quads (no snap function, exact
intersection points), every boundary sub-edge of A lands in exactly one
of UNION (outside B) or INTERSECTION (inside B), so total boundary arc
length is conserved:

    len(U.dim2) + len(I.dim2) == len(dA) + len(dB)
    len(A-B.dim2) + len(B-A.dim2) == same total (difference reverses
    the carved edges but preserves their length)

This stresses the crossing/split/classification path on 40 random
configurations."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.boolean_operation import (
    BooleanOptions, DIFFERENCE, INTERSECTION, UNION,
    boolean_operation_edges)


def _pt(lat, lon):
    x, y, z = coords.latlng_to_xyz(float(lat), float(lon))
    return (float(x), float(y), float(z))


def _quad(lat0, lon0, dlat, dlon):
    loop = [_pt(lat0, lon0), _pt(lat0, lon0 + dlon),
            _pt(lat0 + dlat, lon0 + dlon), _pt(lat0 + dlat, lon0)]
    return [[loop]]  # one polygon consisting of one loop


def _arc_len(edges):
    total = 0.0
    for p, q in edges:
        if p == q:
            continue
        total += math.atan2(float(np.linalg.norm(np.cross(p, q))),
                            float(np.dot(p, q)))
    return total


def _boundary_len(index):
    return _arc_len([(lp[i], lp[(i + 1) % len(lp)])
                     for loops in index["polygons"] for lp in loops
                     for i in range(len(lp))])


@pytest.mark.parametrize("seed", range(40))
def test_union_intersection_length_conservation(seed):
    rng = np.random.default_rng(1000 + seed)
    lat0 = rng.uniform(-50, 40)
    lon0 = rng.uniform(-150, 140)
    a = {"points": [], "polylines": [],
         "polygons": _quad(lat0, lon0,
                           rng.uniform(3, 8), rng.uniform(3, 8))}
    # Offset B so the boundaries cross generically (overlapping corner).
    b = {"points": [], "polylines": [],
         "polygons": _quad(lat0 + rng.uniform(1, 2.5),
                           lon0 + rng.uniform(1, 2.5),
                           rng.uniform(3, 8), rng.uniform(3, 8))}
    options = BooleanOptions()
    total = _boundary_len(a) + _boundary_len(b)

    union = boolean_operation_edges(UNION, a, b, options)
    inter = boolean_operation_edges(INTERSECTION, a, b, options)
    assert _arc_len(union[2]) + _arc_len(inter[2]) == pytest.approx(
        total, rel=1e-12)

    diff_ab = boolean_operation_edges(DIFFERENCE, a, b, options)
    diff_ba = boolean_operation_edges(DIFFERENCE, b, a, options)
    assert _arc_len(diff_ab[2]) + _arc_len(diff_ba[2]) == pytest.approx(
        total, rel=1e-12)
