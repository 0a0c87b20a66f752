"""S2ClosestEdgeQuery over generic shape collections
(src/s2/s2closest_edge_query.d:34-470).

Finds the closest edges of a mixed-dimension shape collection to a
target (point / edge / cell / another shape collection), with the
reference's options: max_edges, max_distance, max_error,
include_interiors (shape interiors count as distance zero, reported
with edge_id == -1), plus the three distance predicates, where
is_conservative_distance_less_or_equal expands the limit by the
S1ChordAngle error bound (s2edge_distances.d:138-163) so that true
distances slightly below the representable chord distance still pass.

This generic form evaluates edges directly (the collections it serves —
query targets, broadcast polygon sides — are small); the batched
best-first search over the bucket index lives in
shapeindex.PolygonShapeIndex.closest_edge."""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from .distance_targets import MinDistance

INF2 = float("inf")
_DBL_EPS = 2.220446049250313e-16


class ClosestEdgeResult(NamedTuple):
    d2: float
    shape_id: int
    edge_id: int  # -1 for an interior result


def s2point_constructor_max_error(length2):
    """S1ChordAngle.getS2PointConstructorMaxError (s1chord_angle.d:434)."""
    return 4.5 * _DBL_EPS * length2 + 16 * _DBL_EPS * _DBL_EPS


def update_min_distance_max_error(length2):
    """getUpdateMinDistanceMaxError (s2edge_distances.d:138-163)."""
    return max(_interior_distance_max_error(length2),
               s2point_constructor_max_error(length2))


def _interior_distance_max_error(length2):
    if length2 >= 2.0:  # >= 90 degrees
        return 0.0
    b = min(1.0, 0.5 * length2)
    a = math.sqrt(b * (2 - b))
    return ((2.5 + 2 * math.sqrt(3.0) + 8.5 * a) * a
            + (2 + 2 * math.sqrt(3.0) / 3 + 6.5 * (1 - b)) * b
            + (23 + 16 / math.sqrt(3.0)) * _DBL_EPS) * _DBL_EPS


class ClosestEdgeOptions:
    def __init__(self, max_edges=1, max_distance2=INF2, max_error_rad=0.0,
                 include_interiors=False):
        self.max_edges = max_edges
        self.max_distance2 = max_distance2
        self.max_error_rad = max_error_rad
        self.include_interiors = include_interiors


class ClosestEdgeQuery:
    """shapes: list of (shape_id, shape) with the core.shapes protocol."""

    def __init__(self, shapes, options=None):
        self.shapes = list(shapes)
        self.options = options or ClosestEdgeOptions()

    def _collect(self, target, max_distance2, max_edges,
                 include_interiors):
        results = []
        for sid, shape in self.shapes:
            for e in range(shape.num_edges()):
                v0, v1 = shape.edge(e)
                d = MinDistance()
                target.update_min_distance_edge(
                    np.asarray(v0, dtype=np.float64),
                    np.asarray(v1, dtype=np.float64), d)
                if d.d2 <= max_distance2:
                    results.append(ClosestEdgeResult(d.d2, sid, e))
        if include_interiors:
            interior_ids = []

            def visit(sid, _pt):
                interior_ids.append(sid)
                return True

            target.visit_containing_shapes(self.shapes, visit)
            for sid in sorted(set(interior_ids)):
                results.append(ClosestEdgeResult(0.0, sid, -1))
        results.sort(key=lambda r: (r.d2, r.shape_id, r.edge_id))
        return results[:max_edges]

    def find_closest_edges(self, target):
        o = self.options
        return self._collect(target, o.max_distance2, o.max_edges,
                             o.include_interiors)

    def find_closest_edge(self, target):
        o = self.options
        res = self._collect(target, o.max_distance2, 1,
                            o.include_interiors)
        return res[0] if res else ClosestEdgeResult(INF2, -1, -1)

    def get_distance2(self, target):
        return self.find_closest_edge(target).d2

    def is_distance_less(self, target, limit2):
        return self.get_distance2(target) < limit2

    def is_distance_less_or_equal(self, target, limit2):
        return self.get_distance2(target) <= limit2

    def is_conservative_distance_less_or_equal(self, target, limit2):
        """True when the distance might be <= limit within the chord-angle
        representation error (setConservativeMaxDistance,
        s2closest_edge_query.d:160-170)."""
        expanded = math.nextafter(
            limit2 + update_min_distance_max_error(limit2), 10.0)
        return self.get_distance2(target) <= expanded

    def project(self, point, result: ClosestEdgeResult):
        """Closest point on the result edge to the given point
        (s2closest_edge_query.d getEdge + project)."""
        from .edge import project as project_edge
        if result.edge_id < 0:
            return np.asarray(point, dtype=np.float64)
        shape = dict(self.shapes)[result.shape_id]
        v0, v1 = shape.edge(result.edge_id)
        if np.array_equal(v0, v1):
            return np.asarray(v0, dtype=np.float64)
        return project_edge(np.asarray(point, dtype=np.float64),
                            np.asarray(v0, dtype=np.float64),
                            np.asarray(v1, dtype=np.float64))
