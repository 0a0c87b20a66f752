"""Lax shapes + shape utilities — reimplements:

  - S2LaxPolygonShape   (src/s2/s2lax_polygon_shape.d:77-210): closed
    loops with degeneracies allowed (degenerate edges, sibling pairs,
    1-/2-vertex loops, the 0-vertex "full" loop); interior on the left.
  - S2LaxPolylineShape  (src/s2/s2lax_polyline_shape.d): open chain.
  - get_reference_point (src/s2/shapeutil/get_reference_point.d):
    unbalanced-vertex search via ContainsVertexQuery; all-balanced
    shapes are empty unless they contain an empty (full) loop.
  - contains_brute_force (src/s2/shapeutil/contains_brute_force.d):
    crossing parity from the reference point.

Shape protocol: num_edges(), edge(e) -> (v0, v1), dimension(),
num_chains(), chain(i) -> (start, length)."""

from __future__ import annotations

import numpy as np

from .contains_vertex import ContainsVertexQuery
from .predicates import ORIGIN, edge_or_vertex_crossing


class LaxPolylineShape:
    """Open polyline: n vertices, n-1 edges, dimension 1."""

    def __init__(self, vertices):
        self.vertices = np.asarray(vertices, dtype=np.float64) \
            if len(vertices) else np.empty((0, 3))

    def num_vertices(self):
        return len(self.vertices)

    def num_edges(self):
        return max(0, len(self.vertices) - 1)

    def edge(self, e):
        return self.vertices[e], self.vertices[e + 1]

    def dimension(self):
        return 1

    def num_chains(self):
        return min(1, self.num_edges())

    def chain(self, i):
        assert i == 0
        return (0, self.num_edges())


class LaxPolygonShape:
    """Closed loops, interior on the left, degeneracies allowed.

    loops: list of (k,3) arrays; k==0 is the FULL loop; k==1 defines a
    single degenerate edge; k==2 defines a sibling edge pair."""

    def __init__(self, loops):
        self.loops = [np.asarray(lp, dtype=np.float64).reshape(-1, 3)
                      for lp in loops]
        self._starts = []
        start = 0
        for lp in self.loops:
            self._starts.append(start)
            start += len(lp)
        self._total = start

    @classmethod
    def from_polygon(cls, polygon):
        return cls([lp.vertices for lp in polygon.loops])

    def num_loops(self):
        return len(self.loops)

    def num_vertices(self):
        return self._total

    def num_loop_vertices(self, i):
        return len(self.loops[i])

    def loop_vertex(self, i, j):
        return self.loops[i][j]

    def num_edges(self):
        return self._total

    def edge(self, e):
        # locate the loop containing flat edge index e
        k = int(np.searchsorted(self._starts, e, side="right")) - 1
        lp = self.loops[k]
        j = e - self._starts[k]
        return lp[j], lp[(j + 1) % len(lp)]

    def chain_edge(self, i, j):
        lp = self.loops[i]
        return lp[j], lp[(j + 1) % len(lp)]

    def dimension(self):
        return 2

    def has_interior(self):
        return True

    def num_chains(self):
        return len(self.loops)

    def chain(self, i):
        return (self._starts[i], len(self.loops[i]))


def _reference_point_at_vertex(shape, vtest):
    """(found, contained): s2shapeutil get_reference_point.d:104-128."""
    q = ContainsVertexQuery(vtest)
    vt = tuple(float(v) for v in vtest)
    for e in range(shape.num_edges()):
        v0, v1 = shape.edge(e)
        if tuple(float(x) for x in v0) == vt:
            q.add_edge(v1, +1)
        if tuple(float(x) for x in v1) == vt:
            q.add_edge(v0, -1)
    s = q.contains_sign()
    if s == 0:
        return False, False
    return True, s > 0


def get_reference_point(shape):
    """(point, contained) for interior-on-left closed shapes
    (get_reference_point.d:48-96).  Shapes may override via a
    reference_point() method (the lax loop shapes treat a zero-vertex
    loop as empty rather than full)."""
    if hasattr(shape, "reference_point"):
        return shape.reference_point()
    return _generic_reference_point(shape)


def _generic_reference_point(shape):
    origin = np.asarray(ORIGIN)
    if shape.num_edges() == 0:
        # full iff the shape contains any (empty) loop
        return origin, shape.num_chains() > 0
    v0 = shape.edge(0)[0]
    found, contained = _reference_point_at_vertex(shape, v0)
    if found:
        return v0, contained
    # find an unmatched edge by sorting edges against reversed edges
    n = shape.num_edges()
    edges = []
    rev = []
    for e in range(n):
        a, b = shape.edge(e)
        ta = tuple(float(v) for v in a)
        tb = tuple(float(v) for v in b)
        edges.append((ta, tb))
        rev.append((tb, ta))
    edges.sort()
    rev.sort()
    for i in range(n):
        if edges[i] < rev[i]:
            found, contained = _reference_point_at_vertex(
                shape, np.array(edges[i][0]))
            assert found
            return np.array(edges[i][0]), contained
        if rev[i] < edges[i]:
            found, contained = _reference_point_at_vertex(
                shape, np.array(rev[i][0]))
            assert found
            return np.array(rev[i][0]), contained
    # all edges matched: empty unless some loop is the full loop
    for i in range(shape.num_chains()):
        if shape.chain(i)[1] == 0:
            return origin, True
    return origin, False


def contains_brute_force(shape, focus):
    """Point containment by crossing parity from the reference point
    (contains_brute_force.d)."""
    if shape.dimension() < 2:
        return False
    ref_pt, contained = get_reference_point(shape)
    tf = tuple(float(v) for v in focus)
    tr = tuple(float(v) for v in ref_pt)
    if tr == tf:
        return contained
    inside = contained
    for e in range(shape.num_edges()):
        a, b = shape.edge(e)
        if edge_or_vertex_crossing(tr, tf, tuple(float(v) for v in a),
                                   tuple(float(v) for v in b)):
            inside = not inside
    return inside


class PointVectorShape:
    """A set of points: each point is a degenerate edge; dimension 0
    (src/s2/s2point_vector_shape.d)."""

    def __init__(self, points):
        self.points = np.asarray(points, dtype=np.float64) \
            if len(points) else np.empty((0, 3))

    def num_edges(self):
        return len(self.points)

    def edge(self, e):
        return self.points[e], self.points[e]

    def dimension(self):
        return 0

    def num_chains(self):
        return len(self.points)

    def chain(self, i):
        return (i, 1)


class EdgeVectorShape:
    """An arbitrary collection of independent edges; dimension 1
    (src/s2/s2edge_vector_shape.d)."""

    def __init__(self, edges=()):
        self.edges = [(np.asarray(a, dtype=np.float64),
                       np.asarray(b, dtype=np.float64))
                      for a, b in edges]

    def add(self, a, b):
        self.edges.append((np.asarray(a, dtype=np.float64),
                           np.asarray(b, dtype=np.float64)))

    def num_edges(self):
        return len(self.edges)

    def edge(self, e):
        return self.edges[e]

    def dimension(self):
        return 1

    def num_chains(self):
        return len(self.edges)

    def chain(self, i):
        return (i, 1)


class LaxLoopShape(LaxPolygonShape):
    """A single closed loop, interior on the left
    (src/s2/s2lax_loop_shape.d)."""

    def __init__(self, vertices):
        super().__init__([vertices] if len(vertices) else [])


class LaxClosedPolylineShape(LaxLoopShape):
    """Like LaxLoopShape but with no interior: a closed polyline,
    dimension 1 (s2lax_loop_shape.d S2LaxClosedPolylineShape)."""

    def dimension(self):
        return 1

    def has_interior(self):
        return False


class VertexIdLaxLoopShape:
    """A closed loop defined by vertex ids into a shared vertex array
    (s2lax_loop_shape.d S2VertexIdLaxLoopShape); interior on the left,
    always dimension 2 (even when empty)."""

    def __init__(self, vertex_ids, vertex_array):
        self.vertex_ids = list(vertex_ids)
        self.vertex_array = (np.asarray(vertex_array, dtype=np.float64)
                             if vertex_array is not None
                             and len(vertex_array)
                             else np.empty((0, 3)))

    def num_vertices(self):
        return len(self.vertex_ids)

    def vertex(self, i):
        return self.vertex_array[self.vertex_ids[i]]

    def num_edges(self):
        return len(self.vertex_ids)

    def edge(self, e):
        n = len(self.vertex_ids)
        return (self.vertex(e), self.vertex((e + 1) % n))

    def dimension(self):
        return 2

    def has_interior(self):
        return True

    def num_chains(self):
        return 1

    def chain(self, i):
        return (0, len(self.vertex_ids))

    def reference_point(self):
        # A loop with no vertices is empty, not full
        # (s2lax_loop_shape.d:256-259).
        if not self.vertex_ids:
            return np.asarray(ORIGIN), False
        return _generic_reference_point(self)


class ShapeCollectionRegion:
    """S2ShapeIndexRegion over a generic shape collection
    (src/s2/s2shape_index_region.d:69-316).

    The reference walks its quadtree index cells; this reformulation
    uses one "index cell" per shape (the common-ancestor cell of the
    shape's vertex leaves) and then applies the reference's
    getCellUnionBound range algorithm: one shrunk cell per intersected
    face, or per child of the spanning cell when a single face is
    spanned.  contains/mayIntersect(cell) are answered exactly with the
    UVW-space cell-edge distance kernels."""

    def __init__(self, shapes):
        self.shapes = [s for _, s in shapes] if shapes and isinstance(
            shapes[0], tuple) else list(shapes)

    def _index_cells(self):
        from . import cellid as ci
        ids = []
        for shape in self.shapes:
            leaves = []
            for e in range(shape.num_edges()):
                for v in shape.edge(e):
                    p = np.asarray(v, dtype=np.float64)
                    leaves.append(int(ci.cellid_from_xyz(
                        np.array([p[0]]), np.array([p[1]]),
                        np.array([p[2]]))[0]))
            if not leaves:
                continue
            cell = leaves[0]
            for leaf in leaves[1:]:
                lvl = ci.common_ancestor_level(np.uint64(cell),
                                               np.uint64(leaf))
                if lvl is None or lvl < 0:
                    cell = None
                    break
                cell = ci.parent_scalar(leaf, int(lvl))
            ids.append(cell)  # None = spans multiple faces
        return sorted(int(i) for i in ids if i is not None)

    def get_cell_union_bound(self):
        from . import cellid as ci
        cells = self._index_cells()
        if not cells:
            return []
        first, last = cells[0], cells[-1]
        out = []
        if first != last:
            lvl = ci.common_ancestor_level(np.uint64(first),
                                           np.uint64(last))
            level = (int(lvl) if lvl is not None and lvl >= 0 else -1) + 1
            # One shrunk cell per level-`level` cell intersected.
            groups = {}
            for c in cells:
                groups.setdefault(ci.parent_scalar(c, level), []).append(c)
            for _, members in sorted(groups.items()):
                lo, hi = members[0], members[-1]
                lvl2 = ci.common_ancestor_level(np.uint64(lo),
                                                np.uint64(hi))
                out.append(ci.parent_scalar(hi, int(lvl2)))
        else:
            out.append(first)
        return out

    def get_cap_bound(self):
        """S2CellUnion.getCapBound over the covering
        (s2cell_union.d: area-weighted centroid + addCap)."""
        from . import cellid as ci
        from .cap import Cap
        from .cell import Cell
        cells = self.get_cell_union_bound()
        if not cells:
            return Cap((1.0, 0.0, 0.0), -1.0)
        centroid = np.zeros(3)
        for c in cells:
            cell = Cell(np.uint64(c))
            area = cell.average_area()
            x, y, z = ci.to_xyz(np.array([c], dtype=np.uint64))
            centroid += area * np.array([float(x[0]), float(y[0]),
                                         float(z[0])])
        n = np.linalg.norm(centroid)
        center = tuple(centroid / n) if n > 0 else (1.0, 0.0, 0.0)
        cap = Cap(center, -1.0)
        for c in cells:
            cap.add_cap(Cell(np.uint64(c)).cap_bound())
        return cap

    def get_rect_bound(self):
        from .cell import Cell
        from .rect import LatLngRect
        bound = LatLngRect.empty()
        for c in self.get_cell_union_bound():
            bound = bound.union(Cell(np.uint64(c)).get_rect_bound())
        return bound

    def _shape_relation(self, shape, cell):
        """(contains_center, touches): touches = some edge at distance
        zero from the cell (crossing, inside, or boundary contact)."""
        center = np.asarray(cell.center())
        contains_center = shape.dimension() == 2 and contains_brute_force(
            shape, center)
        touches = False
        for e in range(shape.num_edges()):
            a, b = shape.edge(e)
            a = tuple(float(x) for x in a)
            b = tuple(float(x) for x in b)
            d2 = cell.get_distance2(a) if a == b \
                else cell.get_distance2_to_edge(a, b)
            if d2 == 0.0:
                touches = True
                break
        return contains_center, touches

    def contains_cell(self, cell):
        for shape in self.shapes:
            contains_center, touches = self._shape_relation(shape, cell)
            if contains_center and not touches:
                return True
        return False

    def may_intersect_cell(self, cell):
        return any(c or t for c, t in
                   (self._shape_relation(s, cell) for s in self.shapes))


class ShapeIndexRegion:
    """Region adapter over a PolygonShapeIndex so an indexed polygon can
    feed the coverer directly (src/s2/s2shape_index_region.d role)."""

    def __init__(self, index):
        self.index = index

    def contains_cell(self, cell):
        return self.index.polygon.contains_cell(cell)

    def may_intersect_cell(self, cell):
        return self.index.polygon.may_intersect_cell(cell)

    def get_cap_bound(self):
        return self.index.polygon.get_cap_bound()

    def contains_point(self, p):
        return bool(self.index.contains_points(
            np.asarray(p, dtype=np.float64)[None, :])[0])
