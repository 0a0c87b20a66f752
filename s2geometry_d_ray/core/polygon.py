"""S2Polygon: loop hierarchy (shells at even depth, holes at odd depth) with
xor-of-parities containment (src/s2/s2polygon.d:1551-1575) and the region
interface used by the coverer (s2polygon.d:1541-1549)."""

from __future__ import annotations

import numpy as np

from .loop import Loop
from .rect import LatLngRect


class Polygon:
    """loops: list[Loop]; containment = xor over all loops' parities, which
    matches the reference for nested shell/hole hierarchies."""

    __slots__ = ("loops", "bound", "is_full")

    def __init__(self, loops):
        assert loops
        self.loops = list(loops)
        self.is_full = False
        b = LatLngRect.empty()
        for lp in self.loops:
            # Holes don't extend the bound, but unioning them is harmless
            # and conservative.
            b = b.union(lp.bound)
        self.bound = b

    @classmethod
    def full(cls):
        """The whole-sphere polygon (s2polygon.d: one S2Loop.full()):
        contains every point, area 4*pi, no boundary edges."""
        p = cls.__new__(cls)
        p.loops = []
        p.is_full = True
        p.bound = LatLngRect.full()
        return p

    def is_empty(self):
        return not self.loops and not self.is_full

    @classmethod
    def init_nested(cls, loops):
        """S2Polygon.initNested semantics (s2polygon.d): assign each
        loop a depth equal to the number of loops properly containing
        it (via containsNested — boundaries must not cross) and order
        the loops in preorder of the nesting tree (parents before
        children, subtrees contiguous)."""
        loops = list(loops)
        n = len(loops)
        if n == 0:
            p = cls.__new__(cls)
            p.loops = []
            p.is_full = False
            p.bound = LatLngRect.empty()
            return p
        if n == 1:
            loops[0].depth = 0
            return cls(loops)
        contains = [[False] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                if i != j and loops[i].contains_nested(loops[j]):
                    contains[i][j] = True
        depth = [sum(contains[j][i] for j in range(n)) for i in range(n)]
        parent = [None] * n
        for i in range(n):
            best = None
            for j in range(n):
                if contains[j][i] and (best is None
                                       or depth[j] > depth[best]):
                    best = j
            parent[i] = best
        children: dict = {}
        roots = []
        for i in range(n):
            if parent[i] is None:
                roots.append(i)
            else:
                children.setdefault(parent[i], []).append(i)
        ordered = []

        def visit(i):
            loops[i].depth = depth[i]
            ordered.append(loops[i])
            for c in children.get(i, []):
                visit(c)

        for r in roots:
            visit(r)
        return cls(ordered)

    @classmethod
    def from_rings_latlng(cls, rings):
        """rings: list of (lats_deg, lons_deg) arrays; ring 0 = shell,
        subsequent rings = holes (depth 1)."""
        loops = []
        for d, (lats, lons) in enumerate(rings):
            loops.append(Loop.from_latlng_degrees(lats, lons,
                                                  depth=0 if d == 0 else 1))
        return cls(loops)

    def contains_points(self, points):
        """Vectorized exact PIP: xor of loop parities (s2polygon.d:1551-1575).

        points: (m, 3) unit vectors -> bool (m,).
        """
        p = np.asarray(points, dtype=np.float64)
        if self.is_full:
            return np.ones(len(p), dtype=bool)
        inside = np.zeros(len(p), dtype=bool)
        for lp in self.loops:
            inside ^= lp.contains_points(p)
        return inside

    def contains_point(self, p):
        return bool(self.contains_points(np.asarray(p)[None, :])[0])

    # -- region interface (coverer) -------------------------------------
    def may_intersect_cell(self, cell):
        if not self.bound.may_intersect_cell(cell):
            return False
        if self.contains_point(cell.center()):
            return True
        for lp in self.loops:
            if cell.contains_point(tuple(lp.vertices[0])):
                return True
            if lp._edges_cross_cell(cell):
                return True
        return False

    def contains_cell(self, cell):
        if not self.contains_point(cell.center()):
            return False
        for lp in self.loops:
            if cell.contains_point(tuple(lp.vertices[0])):
                return False
            if lp._edges_cross_cell(cell):
                return False
        return True

    def get_cap_bound(self):
        return self.bound.get_cap_bound()

    def num_vertices(self):
        return sum(len(lp.vertices) for lp in self.loops)
