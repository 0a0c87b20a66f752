"""S2ContainsPointQuery over the core.shapes protocol
(src/s2/s2contains_point_query.d:36-208).

The query answers point containment for a collection of shapes under an
S2VertexModel (OPEN / SEMI_OPEN / CLOSED), finds the shapes containing a
point, and enumerates edges incident to a vertex.  The reference walks
the shape index cell containing the point and counts crossings from the
cell center; this re-expression counts crossings from each shape's
reference point directly (collections here are small broadcast sides —
the batch pipelines use the vectorized PolygonShapeIndex instead)."""

from __future__ import annotations

import numpy as np

from .boolean_operation import CLOSED, OPEN, SEMI_OPEN  # model names
from .predicates import edge_or_vertex_crossing
from .shapes import get_reference_point


def _pt(v):
    return tuple(float(c) for c in v)


def _shape_boundary_kind(shape, p):
    """'vertex' | 'edge' | None against one shape's edges."""
    from .boolean_operation import _on_edge_interior
    kind = None
    for e in range(shape.num_edges()):
        a, b = shape.edge(e)
        a, b = _pt(a), _pt(b)
        if a == p or b == p:
            return "vertex"
        if _on_edge_interior(p, a, b):
            kind = "edge"
    return kind


def _semi_open_contains(shape, p):
    """Crossing parity from the shape's reference point (the SEMI_OPEN
    vertex model, s2contains_point_query.d:50-66)."""
    ref, contained = get_reference_point(shape)
    ref = _pt(ref)
    if ref == p:
        return contained
    inside = contained
    for e in range(shape.num_edges()):
        a, b = shape.edge(e)
        a, b = _pt(a), _pt(b)
        if a == b:
            continue
        if edge_or_vertex_crossing(ref, p, a, b):
            inside = not inside
    return inside


class ContainsPointQuery:
    """shapes: list of (shape_id, shape) with the core.shapes protocol."""

    def __init__(self, shapes, vertex_model=SEMI_OPEN):
        self.shapes = list(shapes)
        self.vertex_model = vertex_model

    def shape_contains(self, shape, point):
        p = _pt(point)
        if shape.dimension() != 2:
            # Points and polylines contain their vertices only under the
            # CLOSED model (s2contains_point_query.d:252-271).
            if self.vertex_model != CLOSED:
                return False
            return any(_pt(shape.edge(e)[0]) == p
                       or _pt(shape.edge(e)[1]) == p
                       for e in range(shape.num_edges()))
        model = self.vertex_model
        boundary = _shape_boundary_kind(shape, p)
        if model == OPEN:
            return boundary is None and _semi_open_contains(shape, p)
        if model == CLOSED:
            return boundary is not None or _semi_open_contains(shape, p)
        if boundary == "edge":
            return True
        return _semi_open_contains(shape, p)

    def contains(self, point):
        return any(self.shape_contains(s, point) for _, s in self.shapes)

    def get_containing_shapes(self, point):
        return [sid for sid, s in self.shapes
                if self.shape_contains(s, point)]

    def visit_incident_edges(self, point, visitor):
        """visitor((shape_id, edge_id), (a, b)) -> bool; edges whose
        endpoint equals the point, in (shape_id, edge_id) order."""
        p = _pt(point)
        for sid, shape in self.shapes:
            for e in range(shape.num_edges()):
                a, b = shape.edge(e)
                if _pt(a) == p or _pt(b) == p:
                    if not visitor((sid, e), (a, b)):
                        return False
        return True
