"""Boolean operations over polygons, Ray-Data-first.

The reference implements exact boundary-constructing boolean ops via
S2Builder snap rounding (src/s2/s2boolean_operation.d:228-270,
s2polygon.d:766-905). This engine provides the equivalent QUERY
capabilities in three forms:

1. Exact point classification (`contains_point_bool`): membership of any
   point in UNION / INTERSECTION / DIFFERENCE / SYMMETRIC_DIFFERENCE of
   two polygons, by combining the exact PIP parities — the join pipeline
   can classify pages against arbitrary boolean expressions with the
   reference's exact semantics, without constructing the result boundary.

2. Covering algebra (`covering_union` etc.): the boolean result as an S2
   cell union at a configurable level (raster form) — normalized cell
   unions support exact union/intersection/difference
   (s2cell_union.d:430-498), and this is the representation the
   tiling/join stages consume anyway.

3. Raster -> vector (`cell_union_border_rings`): boundary rings of a cell
   union (initializeToCellUnionBorder direction, s2polygon.d:1294+):
   dissolve shared edges on the (face, si, ti) integer grid and stitch
   the remainder into closed rings.
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import cellunion as cu

UNION = "union"
INTERSECTION = "intersection"
DIFFERENCE = "difference"
SYMMETRIC_DIFFERENCE = "symmetric_difference"

_OPS = {
    UNION: lambda a, b: a | b,
    INTERSECTION: lambda a, b: a & b,
    DIFFERENCE: lambda a, b: a & ~b,
    SYMMETRIC_DIFFERENCE: lambda a, b: a ^ b,
}


def contains_points_bool(op, poly_a, poly_b, points):
    """Exact membership of points in the boolean combination (vectorized:
    two PIP passes + a boolean combine)."""
    pts = np.asarray(points, dtype=np.float64)
    in_a = poly_a.contains_points(pts)
    in_b = poly_b.contains_points(pts)
    return _OPS[op](in_a, in_b)


def covering_for(poly, min_level=10, max_level=16, max_cells=64):
    from .coverer import RegionCoverer
    return RegionCoverer(max_cells=max_cells, min_level=min_level,
                         max_level=max_level).get_covering(poly)


def covering_union(cov_a, cov_b):
    return cu.union(cov_a, cov_b)


def covering_intersection(cov_a, cov_b):
    return cu.intersect(np.sort(np.asarray(cov_a, dtype=np.uint64)),
                        np.sort(np.asarray(cov_b, dtype=np.uint64)))


def covering_difference(cov_a, cov_b):
    return cu.difference(cov_a, cov_b)


def covering_symmetric_difference(cov_a, cov_b):
    return cu.union(cu.difference(cov_a, cov_b),
                    cu.difference(cov_b, cov_a))


def boolean_covering(op, poly_a, poly_b, level=14, max_cells=256):
    """Cell-union form of the boolean result at a fixed level: exact on
    the cell raster (interior coverings would under-approximate; this
    uses exterior coverings so the result covers the true region)."""
    ca = cu.denormalize(covering_for(poly_a, min_level=level,
                                     max_level=level,
                                     max_cells=max_cells), level)
    cb = cu.denormalize(covering_for(poly_b, min_level=level,
                                     max_level=level,
                                     max_cells=max_cells), level)
    fn = {UNION: covering_union, INTERSECTION: covering_intersection,
          DIFFERENCE: covering_difference,
          SYMMETRIC_DIFFERENCE: covering_symmetric_difference}[op]
    return fn(np.sort(ca), np.sort(cb))


def overlap_fractions(poly_a, poly_b, level=14, max_cells=256):
    """(area(a ∩ b)/area(a), area(a ∩ b)/area(b)) on the cell raster —
    the getOverlapFractions capability (s2polygon.d:600-624), approximated
    at the given level (error shrinks as 4^-level)."""
    from . import cellunion as cu2
    ca = cu.denormalize(covering_for(poly_a, min_level=level,
                                     max_level=level,
                                     max_cells=max_cells), level)
    cb = cu.denormalize(covering_for(poly_b, min_level=level,
                                     max_level=level,
                                     max_cells=max_cells), level)
    it = covering_intersection(np.sort(ca), np.sort(cb))
    na = cu2.leaf_cells_covered(ca)
    nb = cu2.leaf_cells_covered(cb)
    ni = cu2.leaf_cells_covered(it)
    return (ni / na if na else 0.0, ni / nb if nb else 0.0)


def cell_union_border_rings(ids, level=None):
    """Boundary rings of a cell union as lists of (face, si, ti) integer
    corners stitched on the leaf grid. Cells are denormalized to a single
    level first; cross-face unions return one ring per face component.

    Returns list of (n, 3) xyz ring arrays (CCW around the union)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if len(ids) == 0:
        return []
    if level is None:
        level = int(ci.level(ids).max())
    cells = cu.denormalize(cu.normalize(ids), level)
    # Each cell contributes 4 directed edges (CCW) between its corners in
    # (face, i, j) leaf space; shared (undirected) edges cancel.
    face, i, j = ci.to_face_ij(cells)
    size = 1 << (ci.MAX_LEVEL - level)
    i0 = (i & -size)
    j0 = (j & -size)
    edge_count: dict = {}
    for f, a, b in zip(face.tolist(), i0.tolist(), j0.tolist()):
        corners = [(f, a, b), (f, a + size, b), (f, a + size, b + size),
                   (f, a, b + size)]
        for k in range(4):
            u, v = corners[k], corners[(k + 1) % 4]
            key = (u, v) if u <= v else (v, u)
            rec = edge_count.get(key)
            if rec is None:
                edge_count[key] = [(u, v), 1]
            else:
                rec[1] += 1
    # Directed boundary edges: those appearing once.
    nxt = {}
    for (key, (uv, count)) in edge_count.items():
        if count == 1:
            nxt[uv[0]] = uv[1]
    rings = []
    while nxt:
        start, cur = next(iter(nxt.items()))
        ring = [start]
        key = start
        while True:
            cur = nxt.pop(key, None)
            if cur is None or cur == start:
                break
            ring.append(cur)
            key = cur
        if len(ring) >= 4:
            rings.append(ring)
    # Convert integer corners to xyz.
    from . import coords
    out = []
    for ring in rings:
        f = np.array([c[0] for c in ring])
        si = 2 * np.array([c[1] for c in ring], dtype=np.uint64)
        ti = 2 * np.array([c[2] for c in ring], dtype=np.uint64)
        x, y, z = coords.face_si_ti_to_xyz(f, si, ti)
        x, y, z = coords.normalize_xyz(x, y, z)
        out.append(np.stack([x, y, z], axis=1))
    return out


def overlap_fractions_exact(poly_a, poly_b):
    """(area(a ∩ b)/area(a), area(a ∩ b)/area(b)) from the CONSTRUCTED
    intersection polygon — exact getOverlapFractions semantics
    (s2polygon.d:600-624), replacing r1's cell-raster approximation."""
    from .polygon_ops import boolean_intersection, polygon_area
    inter = boolean_intersection(poly_a, poly_b)
    ai = polygon_area(inter)
    aa = polygon_area(poly_a)
    ab = polygon_area(poly_b)
    return (ai / aa if aa > 0 else 0.0, ai / ab if ab > 0 else 0.0)
