"""S2ContainsVertexQuery — does a polygon contain one of its own
vertices, given the edges incident to that vertex
(src/s2/s2contains_vertex_query.d:41-73).

Semi-open boundary model: if several polygons tile the region around a
vertex, exactly one contains it.  Result: +1 contained, -1 not
contained, 0 if the incident edges are all matched sibling pairs (the
answer is then not locally determined)."""

from __future__ import annotations

from .predicates import ordered_ccw, ortho


class ContainsVertexQuery:
    def __init__(self, target):
        self._target = tuple(float(v) for v in target)
        self._edge_map: dict[tuple, int] = {}

    def add_edge(self, v, direction):
        """direction: +1 outgoing (target -> v), -1 incoming,
        0 degenerate."""
        key = tuple(float(x) for x in v)
        self._edge_map[key] = self._edge_map.get(key, 0) + direction

    def contains_sign(self):
        """+1 contained / -1 not / 0 all-matched-siblings — picks the
        sign of the unmatched edge immediately clockwise from
        ortho(target)."""
        reference_dir = ortho(self._target)
        best = (reference_dir, 0)
        for point, direction in self._edge_map.items():
            assert abs(direction) <= 1
            if direction == 0:
                continue  # matched sibling pair
            if ordered_ccw(reference_dir, best[0], point, self._target):
                best = (point, direction)
        return best[1]
