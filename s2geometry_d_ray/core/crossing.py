"""Crossing-edge queries over polygon shape indexes.

Reimplements the query semantics of:
  - S2CrossingEdgeQuery (src/s2/s2crossing_edge_query.d:78-150): which
    edges of an indexed shape are crossed by a query edge AB; brute force
    below MAX_BRUTE_FORCE_EDGES=27 (:50-52).
  - shapeutil.visitCrossingEdgePairs (src/s2/shapeutil/
    visit_crossing_edge_pairs.d:54-334): all crossing edge pairs between
    two indexes, by co-partitioning their index cells.

Candidates come from the shape-index buckets whose cells intersect the
query edge (conservative superset); verification uses the robust
crossing_sign predicate."""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from .cap import Cap
from .coverer import RegionCoverer
from .predicates import crossing_sign

MAX_BRUTE_FORCE_EDGES = 27  # s2crossing_edge_query.d:50-52


def _edge_candidate_ids(index, a, b):
    """Edge ids of `index` whose bucket cells may intersect edge AB.

    Every populated LEVEL of the multi-level bucket index is searched
    (long-edge rule: edges live at the finest level that fits their
    length, so a query must union across levels; the anchor-only search
    missed long coarse edges — exposed by the perturbed-cube fixtures,
    test/s2/s2crossing_edge_query_test.d:178-216)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mid = a + b
    nm = np.linalg.norm(mid)
    mid = a if nm == 0 else mid / nm
    # Half-angle via the chord (2*arcsin form): precise at tiny angles
    # where arccos(dot) loses ~sqrt(eps) absolutely.
    half = float(np.arcsin(min(1.0, 0.5 * np.linalg.norm(a - b))))
    if nm == 0 or half >= np.pi / 2 - 1e-12:
        # Antipodal (or near-antipodal) endpoints: the geodesic plane is
        # ill-determined and the midpoint fallback does not bound the
        # edge — make the query unprunable (same rule as
        # shapeindex._closest_bucket_table).
        half = np.pi
    cap = Cap.from_center_angle(tuple(mid), min(np.pi, half * 1.001 + 1e-12))
    cov = RegionCoverer(max_cells=8).get_covering(cap)
    cov_min = ci.range_min(cov)
    cov_max = ci.range_max(cov)
    out = []
    for lvl in getattr(index, "levels", [index.level]):
        cells = index.cells_by_level[lvl]
        if not len(cells):
            continue
        offsets = index.offsets_by_level[lvl]
        eids = index.edge_ids_by_level[lvl]
        # Bucket cells intersecting any covering cell (range overlap on
        # the sorted bucket array).
        lo = np.searchsorted(cells, cov_min)
        hi = np.searchsorted(cells, cov_max, side="right")
        for s, e in zip(lo.tolist(), hi.tolist()):
            for k in range(s, e):
                out.append(eids[offsets[k]:offsets[k + 1]])
        # A covering cell may also be CONTAINED in a coarser bucket cell.
        # The ancestor's id (its range midpoint) can sort on EITHER side
        # of the covering cell's id, so probe both neighbors of the
        # insertion point.
        pos = np.searchsorted(cells, cov)
        for p0, c in zip(pos.tolist(), cov.tolist()):
            for p in (p0 - 1, p0):
                if 0 <= p < len(cells) and bool(ci.contains(
                        np.uint64(cells[p]), np.uint64(c))):
                    out.append(eids[offsets[p]:offsets[p + 1]])
    if not out:
        return np.empty(0, dtype=np.int64)
    cand = np.unique(np.concatenate(out))
    # Bounding-cap prune (safe: edges that cross or touch have
    # min-distance 0, so their caps must intersect — triangle
    # inequality).  Vectorized over candidates; keeps the candidate
    # count within the reference's filtering-quality bound
    # (s2crossing_edge_query_test.d:174-177).
    chord = np.linalg.norm(index.edge_mid[cand] - mid, axis=1)
    ang = 2 * np.arcsin(np.minimum(1.0, 0.5 * chord))
    keep = ang <= half + index.edge_half_ang[cand] + 1e-9
    return cand[keep]


def crossing_edges(index, a, b, brute_force=None):
    """Edge ids of the indexed polygon properly crossed by edge AB
    (crossing_sign > 0); shared-vertex touches excluded, matching
    CrossingType::INTERIOR."""
    n = index.n_edges
    if brute_force is None:
        brute_force = n <= MAX_BRUTE_FORCE_EDGES
    cand = np.arange(n) if brute_force else _edge_candidate_ids(index, a, b)
    at = tuple(np.asarray(a, dtype=np.float64))
    bt = tuple(np.asarray(b, dtype=np.float64))
    out = []
    for e in cand.tolist():
        if crossing_sign(at, bt, tuple(index.edge_a[e]),
                         tuple(index.edge_b[e])) > 0:
            out.append(e)
    return np.array(out, dtype=np.int64)


def get_candidates(index, a, b):
    """Sorted candidate edge ids for query edge AB, falling back to all
    edges below the brute-force cutover (s2crossing_edge_query.d:50-52
    — but candidate-set tests always take the indexed path)."""
    return _edge_candidate_ids(index, a, b)


def get_crossings(index, a, b, crossing_type="ALL", brute_force=None):
    """Edge ids crossed by AB: CrossingType.ALL includes shared-vertex
    touches (crossing_sign >= 0), INTERIOR only proper crossings
    (s2crossing_edge_query.d getCrossings semantics)."""
    n = index.n_edges
    if brute_force is None:
        brute_force = n <= MAX_BRUTE_FORCE_EDGES
    cand = np.arange(n) if brute_force else _edge_candidate_ids(index, a, b)
    lo = 0 if crossing_type == "ALL" else 1
    at = tuple(np.asarray(a, dtype=np.float64))
    bt = tuple(np.asarray(b, dtype=np.float64))
    out = []
    for e in cand.tolist():
        if crossing_sign(at, bt, tuple(index.edge_a[e]),
                         tuple(index.edge_b[e])) >= lo:
            out.append(e)
    return np.array(sorted(out), dtype=np.int64)


def crossing_edge_pairs(index_a, index_b):
    """All (edge_of_a, edge_of_b) interior-crossing pairs between two
    indexed polygons, via bucket-cell co-partitioning."""
    pairs = set()
    # For each bucket cell of A, find B's bucket cells whose ranges
    # overlap, and test the edge lists pairwise.
    b_min = ci.range_min(index_b.cells)
    b_max = ci.range_max(index_b.cells)
    for k, cell in enumerate(index_a.cells.tolist()):
        cmin = int(ci.range_min(np.uint64(cell)))
        cmax = int(ci.range_max(np.uint64(cell)))
        lo = int(np.searchsorted(b_max, cmin))
        hi = int(np.searchsorted(b_min, cmax, side="right"))
        if lo >= hi:
            continue
        ea = index_a.edge_ids[index_a.offsets[k]:index_a.offsets[k + 1]]
        for kb in range(lo, hi):
            eb = index_b.edge_ids[index_b.offsets[kb]:
                                  index_b.offsets[kb + 1]]
            for i in ea.tolist():
                ai = tuple(index_a.edge_a[i])
                bi = tuple(index_a.edge_b[i])
                for j in eb.tolist():
                    if (i, j) in pairs:
                        continue
                    if crossing_sign(ai, bi, tuple(index_b.edge_a[j]),
                                     tuple(index_b.edge_b[j])) > 0:
                        pairs.add((i, j))
    return sorted(pairs)


def crossing_edge_pairs_within(edges, crossing_type="ALL"):
    """All crossing pairs (i, j), i < j, WITHIN one edge collection —
    the shapeutil.visitCrossingEdgePairs single-index form
    (visit_crossing_edge_pairs.d:54-120).  CrossingType ALL includes
    shared-vertex touches (crossingSign >= 0); INTERIOR only proper
    crossings.  Brute force below the reference threshold, else bucket
    co-location: each edge is registered on its endpoint parents at a
    level coarse enough for the 3x3 neighbor-ring guarantee."""
    min_sign = 0 if crossing_type == "ALL" else 1
    pts = [(tuple(np.asarray(a, dtype=np.float64)),
            tuple(np.asarray(b, dtype=np.float64))) for a, b in edges]
    n = len(pts)

    def check(i, j):
        return crossing_sign(pts[i][0], pts[i][1],
                             pts[j][0], pts[j][1]) >= min_sign

    if n <= MAX_BRUTE_FORCE_EDGES:
        return [(i, j) for i in range(n) for j in range(i + 1, n)
                if check(i, j)]

    from .metrics import MIN_WIDTH
    arr_a = np.array([p[0] for p in pts])
    arr_b = np.array([p[1] for p in pts])
    chord = np.linalg.norm(arr_a - arr_b, axis=1)
    ang = 2 * np.arcsin(np.minimum(1.0, 0.5 * chord))
    max_ang = float(ang.max()) if n else 0.0
    level = max(0, min(22, MIN_WIDTH.get_level_for_min_value(
        max(1e-12, max_ang) * 1.001)))
    la = ci.parent(ci.cellid_from_xyz(arr_a[:, 0], arr_a[:, 1],
                                      arr_a[:, 2]), level)
    lb = ci.parent(ci.cellid_from_xyz(arr_b[:, 0], arr_b[:, 1],
                                      arr_b[:, 2]), level)
    buckets: dict[int, list] = {}
    for i in range(n):
        cells = {int(la[i]), int(lb[i])}
        if level == 0:
            cells.update((f << 61) | (1 << 60) for f in range(6))
        else:
            for c in (la[i], lb[i]):
                cells.update(int(v) for v in
                             ci.all_neighbors(np.uint64(c), level))
        for c in cells:
            buckets.setdefault(c, []).append(i)
    pairs = set()
    for ids in buckets.values():
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                i, j = ids[x], ids[y]
                if i > j:
                    i, j = j, i
                if (i, j) not in pairs and check(i, j):
                    pairs.add((i, j))
    return sorted(pairs)


def polygons_boundaries_cross(index_a, index_b):
    """True if the two polygon boundaries properly cross anywhere."""
    b_min = ci.range_min(index_b.cells)
    b_max = ci.range_max(index_b.cells)
    for k, cell in enumerate(index_a.cells.tolist()):
        cmin = int(ci.range_min(np.uint64(cell)))
        cmax = int(ci.range_max(np.uint64(cell)))
        lo = int(np.searchsorted(b_max, cmin))
        hi = int(np.searchsorted(b_min, cmax, side="right"))
        if lo >= hi:
            continue
        ea = index_a.edge_ids[index_a.offsets[k]:index_a.offsets[k + 1]]
        for kb in range(lo, hi):
            eb = index_b.edge_ids[index_b.offsets[kb]:
                                  index_b.offsets[kb + 1]]
            for i in ea.tolist():
                ai = tuple(index_a.edge_a[i])
                bi = tuple(index_a.edge_b[i])
                for j in eb.tolist():
                    if crossing_sign(ai, bi, tuple(index_b.edge_a[j]),
                                     tuple(index_b.edge_b[j])) > 0:
                        return True
    return False
