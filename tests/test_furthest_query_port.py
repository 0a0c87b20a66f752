"""Ports of the MaxDistance cases of s2closest_point_query_base_test.d
and s2closest_edge_query_base_test.d: the closest-* machinery is
distance-generic, so a 'furthest' query is just a target whose distance
is straight-minus-distance-to-the-antipode.  Verifies the generic
ClosestEdgeQuery / ClosestPointQuery accept such targets."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.cap import chord2_sub
from s2geometry_d_ray.core.closest_edge import (ClosestEdgeOptions,
                                                ClosestEdgeQuery)
from s2geometry_d_ray.core.edge import edge_distances2
from s2geometry_d_ray.core.shapes import PointVectorShape


class FurthestPointTarget:
    """MaxDistance point target (s2closest_edge_query_base_test.d:
    FurthestPointTarget): min over (straight - distance(-point, edge))
    finds the edge FURTHEST from the point."""

    def __init__(self, point):
        self.point = np.asarray(point, dtype=np.float64)

    def update_min_distance_edge(self, v0, v1, min_dist):
        # Minimizing the distance to the ANTIPODE maximizes the true
        # distance: maxdist(t, e) = straight - mindist(-t, e), and the
        # chord2 of the supplementary angle is 4 - chord2.
        anti = -self.point
        d2 = float(edge_distances2(anti[None, :],
                                   np.asarray(v0, dtype=np.float64)[None, :],
                                   np.asarray(v1, dtype=np.float64)[None, :]
                                   )[0, 0])
        return min_dist.update_min(d2)

    def visit_containing_shapes(self, shapes, visitor):
        return True  # no interiors in these fixtures


def _pt(txt):
    return np.asarray(textformat.make_point(txt), dtype=np.float64)


def test_closest_edge_query_base_max_distance():
    idx = textformat.make_index("0:0 | 1:0 | 2:0 | 3:0 # #")
    shapes = [(0, PointVectorShape(idx["points"]))]
    query = ClosestEdgeQuery(shapes, ClosestEdgeOptions(max_edges=1))
    target = FurthestPointTarget(_pt("4:0"))
    results = query.find_closest_edges(target)
    assert len(results) == 1
    assert results[0].shape_id == 0
    assert results[0].edge_id == 0  # 0:0 is the furthest from 4:0
    true_chord2 = chord2_sub(4.0, results[0].d2)
    deg = math.degrees(2 * math.asin(0.5 * math.sqrt(true_chord2)))
    assert deg == pytest.approx(4.0, abs=1e-12)


def test_closest_point_query_base_max_distance():
    """The point-index analogue: the furthest of 4 collinear points."""
    from s2geometry_d_ray.core.distance_targets import MinDistance
    pts = [_pt("0:0"), _pt("1:0"), _pt("2:0"), _pt("3:0")]
    target = FurthestPointTarget(_pt("4:0"))
    best = None
    for i, p in enumerate(pts):
        d = MinDistance()
        target.update_min_distance_edge(p, p, d)
        if best is None or d.d2 < best[0]:
            best = (d.d2, i)
    assert best[1] == 0
    deg = math.degrees(2 * math.asin(
        0.5 * math.sqrt(chord2_sub(4.0, best[0]))))
    assert deg == pytest.approx(4.0, abs=1e-12)
