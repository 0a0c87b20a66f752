"""S2MinDistanceTarget family (src/s2/s2min_distance_targets.d:46-343).

Targets abstract "the thing we measure distance to" for closest-point /
closest-edge queries: a point, an edge, an S2Cell, or a whole shape
collection.  Each supports update_min_distance against a point, an edge,
or a cell — returning True only when the distance strictly decreased
(the reference's UpdateMinDistanceWhenEqual contract) — plus a cap bound
and visit_containing_shapes (used to find shapes whose interior contains
the target, for distance-zero short-circuiting).

Distances are squared chord lengths, like the rest of `core`.
"""

from __future__ import annotations

import math

import numpy as np

from .cell import Cell
from .edge import (edge_distances2, edge_pair_min_distance2)

INF2 = float("inf")


class MinDistance:
    """Mutable min-distance accumulator (S2MinDistance): update_min
    returns True only on strict improvement."""

    def __init__(self, d2=INF2):
        self.d2 = float(d2)

    def update_min(self, d2):
        if d2 < self.d2:
            self.d2 = float(d2)
            return True
        return False


def _unit(p):
    v = np.asarray(p, dtype=np.float64)
    return v / np.linalg.norm(v)


class PointTarget:
    """S2MinDistancePointTarget (s2min_distance_targets.d:97-134)."""

    def __init__(self, point):
        self.point = np.asarray(point, dtype=np.float64)

    def cap_bound(self):
        from .cap import Cap
        return Cap(tuple(self.point), 0.0)

    def update_min_distance_point(self, p, min_dist):
        d2 = float(((self.point - np.asarray(p)) ** 2).sum())
        return min_dist.update_min(min(4.0, d2))

    def update_min_distance_edge(self, v0, v1, min_dist):
        d2 = float(edge_distances2(self.point[None, :],
                                   np.asarray(v0, dtype=np.float64)[None, :],
                                   np.asarray(v1, dtype=np.float64)[None, :]
                                   )[0, 0])
        return min_dist.update_min(d2)

    def update_min_distance_cell(self, cell: Cell, min_dist):
        return min_dist.update_min(cell.get_distance2(tuple(self.point)))

    def visit_containing_shapes(self, shapes, visitor):
        """shapes: iterable of (shape_id, shape) with the core.shapes
        protocol; calls visitor(shape_id, target_point) for each dim-2
        shape containing the point; stops early on False."""
        from .shapes import contains_brute_force
        for sid, shape in shapes:
            if shape.dimension() == 2 and contains_brute_force(
                    shape, self.point):
                if not visitor(sid, self.point):
                    return False
        return True


class EdgeTarget:
    """S2MinDistanceEdgeTarget (s2min_distance_targets.d:136-182)."""

    def __init__(self, a, b):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)

    def cap_bound(self):
        from .cap import Cap
        # radius = half the edge length, numerically stable
        d2 = float(((self.a - self.b) ** 2).sum())
        r2 = (0.5 * d2) / (1 + math.sqrt(max(0.0, 1 - 0.25 * d2)))
        return Cap(tuple(_unit(self.a + self.b)), r2)

    def update_min_distance_point(self, p, min_dist):
        d2 = float(edge_distances2(np.asarray(p, dtype=np.float64)[None, :],
                                   self.a[None, :], self.b[None, :])[0, 0])
        return min_dist.update_min(d2)

    def update_min_distance_edge(self, v0, v1, min_dist):
        d2 = edge_pair_min_distance2(self.a, self.b, v0, v1)
        return min_dist.update_min(float(d2))

    def update_min_distance_cell(self, cell: Cell, min_dist):
        return min_dist.update_min(
            cell.get_distance2_to_edge(tuple(self.a), tuple(self.b)))

    def visit_containing_shapes(self, shapes, visitor):
        # Test the edge midpoint so AB and BA yield identical results
        # (s2min_distance_targets.d:167-175).
        return PointTarget(_unit(self.a + self.b)).visit_containing_shapes(
            shapes, visitor)


class CellTarget:
    """S2MinDistanceCellTarget (s2min_distance_targets.d:184-263)."""

    def __init__(self, cell: Cell):
        self.cell = cell

    def cap_bound(self):
        return self.cell.cap_bound()

    def update_min_distance_point(self, p, min_dist):
        return min_dist.update_min(self.cell.get_distance2(
            tuple(np.asarray(p, dtype=np.float64))))

    def update_min_distance_edge(self, v0, v1, min_dist):
        return min_dist.update_min(
            self.cell.get_distance2_to_edge(
                tuple(np.asarray(v0, dtype=np.float64)),
                tuple(np.asarray(v1, dtype=np.float64))))

    def update_min_distance_cell(self, cell: Cell, min_dist):
        return min_dist.update_min(self.cell.get_distance2_to_cell(cell))

    def visit_containing_shapes(self, shapes, visitor):
        # The simple approach of the reference (s2min_distance_targets.d
        # :225-247): use the cell center (a cell contained by a shape has
        # its center contained; larger cells fall back to intersection
        # at the first index cell, approximated here by the center too).
        return PointTarget(np.asarray(self.cell.center())
                           ).visit_containing_shapes(shapes, visitor)


class ShapeIndexTarget:
    """S2MinDistanceShapeIndexTarget (s2min_distance_targets.d:265-343):
    distance to the nearest of a collection of shapes, computed by brute
    force over the collection's edges + point containment (the reference
    uses an S2ClosestEdgeQuery; collections here are small targets)."""

    def __init__(self, shapes):
        """shapes: list of (shape_id, shape) with the core.shapes
        protocol (PointVectorShape / LaxPolylineShape / LaxPolygonShape)."""
        self.shapes = list(shapes)
        self.include_interiors = True

    def _edges(self):
        for sid, shape in self.shapes:
            for e in range(shape.num_edges()):
                yield shape.edge(e)

    def _contains(self, p):
        from .shapes import contains_brute_force
        if not self.include_interiors:
            return False
        return any(shape.dimension() == 2
                   and contains_brute_force(shape, p)
                   for _, shape in self.shapes)

    def update_min_distance_point(self, p, min_dist):
        p = np.asarray(p, dtype=np.float64)
        if self._contains(p):
            return min_dist.update_min(0.0)
        best = INF2
        for (v0, v1) in self._edges():
            a = np.asarray(v0, dtype=np.float64)
            b = np.asarray(v1, dtype=np.float64)
            if np.array_equal(a, b):
                best = min(best, float(((p - a) ** 2).sum()))
            else:
                best = min(best, float(edge_distances2(
                    p[None, :], a[None, :], b[None, :])[0, 0]))
        return min_dist.update_min(best)

    def update_min_distance_edge(self, v0, v1, min_dist):
        v0 = np.asarray(v0, dtype=np.float64)
        v1 = np.asarray(v1, dtype=np.float64)
        if self._contains(v0) or self._contains(v1):
            return min_dist.update_min(0.0)
        best = INF2
        for (a, b) in self._edges():
            a = np.asarray(a, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            if np.array_equal(a, b):
                best = min(best, float(edge_distances2(
                    a[None, :], v0[None, :], v1[None, :])[0, 0]))
            else:
                best = min(best, float(edge_pair_min_distance2(
                    a, b, v0, v1)))
        return min_dist.update_min(best)

    def update_min_distance_cell(self, cell: Cell, min_dist):
        best = INF2
        for (a, b) in self._edges():
            a = tuple(np.asarray(a, dtype=np.float64))
            b = tuple(np.asarray(b, dtype=np.float64))
            if a == b:
                best = min(best, cell.get_distance2(a))
            else:
                best = min(best, cell.get_distance2_to_edge(a, b))
        if self._contains(np.asarray(cell.center())):
            best = 0.0
        return min_dist.update_min(best)

    def visit_containing_shapes(self, shapes, visitor):
        """Visit shapes of `shapes` containing ANY connected component of
        the target (one representative point per component,
        s2min_distance_targets.d:289-306)."""
        from .shapes import get_reference_point
        for _, tshape in self.shapes:
            if tshape.dimension() == 0:
                reps = [np.asarray(tshape.edge(i)[0])
                        for i in range(tshape.num_edges())]
            elif tshape.dimension() == 1:
                reps = [np.asarray(tshape.chain_ref(i))
                        if hasattr(tshape, "chain_ref") else
                        np.asarray(tshape.edge(0)[0])
                        for i in range(1)]
            else:
                ref, contained = get_reference_point(tshape)
                if not contained and tshape.num_edges() == 0:
                    continue  # empty polygon: intersects nothing
                reps = [np.asarray(ref)] if tshape.num_edges() == 0 else [
                    np.asarray(tshape.edge(0)[0])]
            ok = True
            for rep in reps:
                ok = PointTarget(rep).visit_containing_shapes(shapes,
                                                              visitor)
                if not ok:
                    return False
        return True
