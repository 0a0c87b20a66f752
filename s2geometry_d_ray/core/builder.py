"""S2Builder-lite: snap-rounded assembly of polygons/polylines from
edge soup — the core semantics of ``src/s2/s2builder.d:62-229`` with the
snap functions of ``src/s2/builder/util/snap_functions.d`` and the
polygon/polyline layers of ``src/s2/builder/util/s2polygon_layer.d`` /
``s2polyline_layer.d``.

Covered guarantees (tested in tests/test_builder.py against ported
reference cases):
  - vertices move at most snap_radius during snapping;
  - vertices closer than snap_radius merge (identity snapping picks a
    greedy maximal subset of input vertices as sites);
  - snapping to discrete point sets: S2CellId centers at a level, or
    E5/E6/E7-style integer lat/lng;
  - split_crossing_edges: edge crossings become shared vertices
    (robust get_intersection);
  - degenerate edges collapse; layers assemble Graph edges into
    Polygon (leftmost-turn ring walk) or Polyline (input order).

Also covered:
  - undirected edges (``s2builder.d:180`` EdgeType.UNDIRECTED): each
    input edge contributes both directions to the graph (sibling
    pairs, ``s2builder.d:1669-1680``); the polyline layer stitches
    chains allowing reversal;
  - simplify_edge_chains (``s2builder.d:446-450`` + EdgeChainSimplifier
    ``s2builder.d:2158-2560``): maximal chains through interior vertices
    (InteriorVertexMatcher multiplicity rules) are simplified with the
    ported S2PolylineSimplifier under the snap-radius tolerance with
    target/avoid discs, monotone-distance and max-edge-deviation
    guards; multi-traversal chains merge with per-traversal input-id
    assignment (mergeChain); forced vertices never move or vanish;
    a conservative post-check reverts any chain whose simplified edges
    would cross another chain;
  - forceVertex (``s2builder.d:783``), idempotency detection
    (snappingNeeded), and addExtraSites / getSeparationSite
    (``s2builder.d:1251-1401``): snapped edges keep
    min_edge_vertex_separation from non-incident sites and stay within
    max_edge_deviation of their input edge, adding separation sites on
    the input edge where needed."""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ci
from . import coords
from .edge_crossings import get_intersection
from .predicates import crossing_sign


class IdentitySnapFunction:
    """Sites are a greedy maximal subset of input vertices separated by
    at least snap_radius (snap_functions.d:44-109)."""

    def __init__(self, snap_radius_rad=0.0):
        self.snap_radius = float(snap_radius_rad)
        # snap_functions.d:80-90: edges end up separated from
        # non-incident vertices by at least half the vertex separation
        self.min_edge_vertex_separation = 0.5 * self.snap_radius

    def snap_point(self, p):
        return np.asarray(p, dtype=np.float64)

    discrete = False


_SNAP_DBL_EPS = 2.220446049250313e-16


class IntLatLngSnapFunction:
    """Snap to (lat, lng) rounded at 10^-exponent degrees
    (snap_functions.d IntLatLngSnapFunction)."""

    MIN_EXPONENT = 0
    MAX_EXPONENT = 10

    @staticmethod
    def min_snap_radius_for_exponent(exponent):
        """~(10^-exp / sqrt(2)) degrees plus the (9 sqrt2 + 1.5) eps
        conversion error (snap_functions.d:440-458)."""
        power = 10.0 ** exponent
        return (math.radians(math.sqrt(0.5) / power)
                + (9 * math.sqrt(2.0) + 1.5) * _SNAP_DBL_EPS)

    @classmethod
    def exponent_for_max_snap_radius(cls, snap_radius_rad):
        """Inverse of min_snap_radius_for_exponent, clamped
        (snap_functions.d:472-485)."""
        r = snap_radius_rad - (9 * math.sqrt(2.0) + 1.5) * _SNAP_DBL_EPS
        r = max(r, 1e-30)
        exponent = math.log10(math.sqrt(0.5) / math.degrees(r))
        return max(cls.MIN_EXPONENT,
                   min(cls.MAX_EXPONENT,
                       math.ceil(exponent - 2 * _SNAP_DBL_EPS)))

    def __init__(self, exponent):
        self.exponent = int(exponent)
        scale = 10.0 ** self.exponent
        # max snap movement: half-diagonal of a grid cell
        self.snap_radius = math.radians(1.0 / scale) * (0.5 * math.sqrt(2)
                                                        ) * 1.05
        # snap_functions.d: worst-case ratio for grid snap functions
        self.min_edge_vertex_separation = 0.219 * self.snap_radius

    def snap_point(self, p):
        p = np.asarray(p, dtype=np.float64)
        lat, lng = coords.xyz_to_latlng(p[0], p[1], p[2])
        scale = 10.0 ** self.exponent
        lat = np.round(float(lat) * scale) / scale
        lng = np.round(float(lng) * scale) / scale
        x, y, z = coords.latlng_to_xyz(lat, lng)
        v = np.array([float(x), float(y), float(z)])
        return v / np.linalg.norm(v)

    discrete = True


class CellIdSnapFunction:
    """Snap to S2 cell centers at a fixed level
    (snap_functions.d S2CellIdSnapFunction)."""

    def __init__(self, level):
        self.level = int(level)
        from .metrics import MAX_DIAG
        self.snap_radius = 0.5 * MAX_DIAG.get_value(self.level) * 1.05
        # snap_functions.d: S2CellIdSnapFunction worst case (0.219 r)
        self.min_edge_vertex_separation = 0.219 * self.snap_radius

    @staticmethod
    def min_snap_radius_for_level(level):
        """Upper bound on the snap movement at the level, including the
        ~4 eps S2Point<->cell-center conversion error
        (snap_functions.d:190-198)."""
        from .metrics import MAX_DIAG
        return 0.5 * MAX_DIAG.get_value(level) + 4 * _SNAP_DBL_EPS

    @staticmethod
    def level_for_max_snap_radius(radius_rad):
        """Inverse of min_snap_radius_for_level
        (snap_functions.d:213-217)."""
        from .metrics import MAX_DIAG
        return MAX_DIAG.get_level_for_max_value(
            2 * (radius_rad - 4 * _SNAP_DBL_EPS))

    def snap_point(self, p):
        p = np.asarray(p, dtype=np.float64)
        leaf = ci.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0]
        cell = ci.parent(np.uint64(leaf), self.level)
        from .cell import Cell
        return np.asarray(Cell(int(cell)).center())

    discrete = True


class Graph:
    """Snapped result: vertices (n,3) + directed edges (m,2 vertex ids)
    + input_edge_ids[m] (which input edge each output edge came from,
    in order; splits share the input id)."""

    def __init__(self, vertices, edges, input_edge_ids):
        self.vertices = np.asarray(vertices, dtype=np.float64) \
            if len(vertices) else np.empty((0, 3))
        self.edges = list(edges)
        self.input_edge_ids = list(input_edge_ids)


def process_graph_options(g: Graph, degenerate_edges="keep",
                          duplicate_edges="keep", sibling_pairs="keep"):
    """GraphOptions edge post-processing (s2builder.d:1943-2029).

    degenerate_edges: 'discard' drops every a->a edge; 'discard_excess'
    drops a->a edges only at vertices that also have non-degenerate
    incident edges (collapsed loops survive as one point); 'keep'.
    duplicate_edges: 'merge' collapses identical directed edges and
    unions their input-edge ids; 'keep'.
    sibling_pairs: 'discard' removes matched (a,b)/(b,a) pairs
    (multiplicity-aware; degenerate edges have no sibling);
    'discard_excess' keeps one pair if the result would otherwise be
    empty; 'require' raises if any non-degenerate edge lacks a sibling;
    'create' adds missing reverse edges with an empty id set; 'keep'.
    Per the reference, any discarding option merges the ids of
    duplicate edges first so the choice of survivor is immaterial."""
    edges = list(g.edges)
    ids = [i if isinstance(i, list) else [i] for i in g.input_edge_ids]

    def is_degen(e):
        return e[0] == e[1]

    # -- degenerate edges ---------------------------------------------
    if degenerate_edges == "discard":
        kept = [(e, i) for e, i in zip(edges, ids) if not is_degen(e)]
        edges, ids = [e for e, _ in kept], [i for _, i in kept]
    elif degenerate_edges == "discard_excess":
        non_degen_vertices = {v for e in edges if not is_degen(e)
                              for v in e}
        kept = [(e, i) for e, i in zip(edges, ids)
                if not is_degen(e) or e[0] not in non_degen_vertices]
        edges, ids = [e for e, _ in kept], [i for _, i in kept]

    discarding = (sibling_pairs in ("discard", "discard_excess")
                  or duplicate_edges == "merge")
    if discarding:
        # union duplicate-edge ids (reference: labels merge even when
        # all copies are kept)
        merged: dict = {}
        for e, i in zip(edges, ids):
            merged.setdefault(e, []).extend(i)
        if duplicate_edges == "merge":
            edges = list(merged.keys())
            ids = [sorted(set(merged[e])) for e in edges]
        else:
            ids = [sorted(set(merged[e])) for e in edges]

    # -- sibling pairs ------------------------------------------------
    if sibling_pairs in ("discard", "discard_excess"):
        from collections import Counter
        cnt = Counter(e for e in edges if not is_degen(e))
        remove = {}
        for e in list(cnt):
            sib = (e[1], e[0])
            if e < sib and cnt.get(sib, 0):
                k = min(cnt[e], cnt[sib])
                remove[e] = k
                remove[sib] = k
        out_e, out_i = [], []
        taken: dict = {}
        for e, i in zip(edges, ids):
            if not is_degen(e) and taken.get(e, 0) < remove.get(e, 0):
                taken[e] = taken.get(e, 0) + 1
                continue
            out_e.append(e)
            out_i.append(i)
        if sibling_pairs == "discard_excess" and not out_e and edges:
            e = edges[0]
            sib = (e[1], e[0])
            out_e = [e, sib]
            out_i = [ids[0], ids[edges.index(sib)]
                     if sib in edges else ids[0]]
        edges, ids = out_e, out_i
    elif sibling_pairs == "require":
        from collections import Counter
        cnt = Counter(e for e in edges if not is_degen(e))
        for e in cnt:
            if cnt[(e[1], e[0])] < cnt[e] and (e[1], e[0]) != e:
                if cnt.get((e[1], e[0]), 0) < cnt[e]:
                    raise ValueError(f"edge {e} has no sibling "
                                     "(SiblingPairs.REQUIRE)")
    elif sibling_pairs == "create":
        from collections import Counter
        cnt = Counter(e for e in edges if not is_degen(e))
        for e, k in list(cnt.items()):
            sib = (e[1], e[0])
            missing = k - cnt.get(sib, 0)
            for _ in range(max(0, missing)):
                edges.append(sib)
                ids.append([])  # created edges carry no input ids
            if missing > 0:
                cnt[sib] = cnt.get(sib, 0) + missing

    return Graph(g.vertices, edges, ids)


def process_edges(edges, input_id_set_ids, lexicon, edge_type="directed",
                  degenerate_edges="keep", duplicate_edges="keep",
                  sibling_pairs="keep"):
    """Faithful Graph.processEdges port (builder/graph.d:1174-1446
    EdgeProcessor): merge-join over the out-sorted and in-sorted edge
    arrays, handling every (EdgeType x DegenerateEdges x DuplicateEdges
    x SiblingPairs) combination, including the undirected-to-directed
    halving under REQUIRE/CREATE and the merge-labels rule for any
    discarding option.

    edges: [(u, v)] integer vertex pairs; input_id_set_ids: parallel
    IdSetLexicon set ids.  Returns (new_edges, new_input_id_set_ids,
    new_edge_type, error) where error is None or
    'missing_sibling' (BUILDER_MISSING_EXPECTED_SIBLING_EDGES)."""
    n = len(edges)
    new_edge_type = ("directed" if sibling_pairs in ("require", "create")
                     else edge_type)
    if n == 0:
        return [], [], new_edge_type, None

    def rev(e):
        return (e[1], e[0])

    out_order = sorted(range(n), key=lambda i: (edges[i], i))
    in_order = sorted(range(n), key=lambda i: (rev(edges[i]), i))
    new_edges, new_ids = [], []
    error = None

    def add(k, e, sid):
        for _ in range(k):
            new_edges.append(e)
            new_ids.append(sid)

    def copy_edges(b, e_):
        for i in range(b, e_):
            new_edges.append(edges[out_order[i]])
            new_ids.append(input_id_set_ids[out_order[i]])

    def merge_ids(b, e_):
        if e_ - b == 1:
            return input_id_set_ids[out_order[b]]
        tmp = []
        for i in range(b, e_):
            tmp.extend(lexicon.id_set(input_id_set_ids[out_order[i]]))
        return lexicon.add(tmp)

    out_id = in_id = 0
    while True:
        oe = edges[out_order[out_id]] if out_id < n else None
        ie = rev(edges[in_order[in_id]]) if in_id < n else None
        if oe is None and ie is None:
            break
        edge = min(x for x in (oe, ie) if x is not None)
        out_begin, in_begin = out_id, in_id
        while out_id < n and edges[out_order[out_id]] == edge:
            out_id += 1
        while in_id < n and rev(edges[in_order[in_id]]) == edge:
            in_id += 1
        n_out = out_id - out_begin
        n_in = in_id - in_begin
        if edge[0] == edge[1]:
            if degenerate_edges == "discard":
                continue
            if degenerate_edges == "discard_excess" and (
                    (out_begin > 0
                     and edges[out_order[out_begin - 1]][0] == edge[0])
                    or (out_id < n
                        and edges[out_order[out_id]][0] == edge[0])
                    or (in_begin > 0
                        and edges[in_order[in_begin - 1]][1] == edge[0])
                    or (in_id < n
                        and edges[in_order[in_id]][1] == edge[0])):
                continue  # non-degenerate incident edges exist
            if edge_type == "undirected" and sibling_pairs in ("require",
                                                               "create"):
                add(1 if duplicate_edges == "merge" else n_out // 2,
                    edge, merge_ids(out_begin, out_id))
            elif duplicate_edges == "merge":
                add(2 if edge_type == "undirected" else 1,
                    edge, merge_ids(out_begin, out_id))
            elif sibling_pairs in ("discard", "discard_excess"):
                add(n_out, edge, merge_ids(out_begin, out_id))
            else:
                copy_edges(out_begin, out_id)
        elif sibling_pairs == "keep":
            if n_out > 1 and duplicate_edges == "merge":
                add(1, edge, merge_ids(out_begin, out_id))
            else:
                copy_edges(out_begin, out_id)
        elif sibling_pairs == "discard":
            if edge_type == "directed":
                if n_out <= n_in:
                    continue
                add(1 if duplicate_edges == "merge" else n_out - n_in,
                    edge, merge_ids(out_begin, out_id))
            else:
                if (n_out & 1) == 0:
                    continue
                add(1, edge, merge_ids(out_begin, out_id))
        elif sibling_pairs == "discard_excess":
            if edge_type == "directed":
                if n_out < n_in:
                    continue
                add(1 if duplicate_edges == "merge"
                    else max(1, n_out - n_in),
                    edge, merge_ids(out_begin, out_id))
            else:
                add(1 if (n_out & 1) else 2, edge,
                    merge_ids(out_begin, out_id))
        else:  # require / create
            if (sibling_pairs == "require" and error is None
                    and (n_out != n_in if edge_type == "directed"
                         else (n_out & 1) != 0)):
                error = "missing_sibling"
            if duplicate_edges == "merge":
                add(1, edge, merge_ids(out_begin, out_id))
            elif edge_type == "undirected":
                add((n_out + 1) // 2, edge, merge_ids(out_begin, out_id))
            else:
                copy_edges(out_begin, out_id)
                if n_in > n_out:
                    add(n_in - n_out, edge, lexicon.add(()))
    return new_edges, new_ids, new_edge_type, error


NO_INPUT_EDGE_ID = 1 << 60  # sorts last (graph.d:394 NO_INPUT_EDGE_ID)


def get_polylines(edges, input_edge_ids, edge_type="directed",
                  polyline_type="path"):
    """Graph.getPolylines port (builder/graph.d PolylineBuilder):
    assembles the graph edges into maximal polylines.  'path' breaks at
    any vertex that cannot be in a polyline interior (degree rules per
    edge type); 'walk' allows repeated vertices and splices loops back
    into the walk (Eulerian-style), preferring the smallest input edge
    id at each step for idempotency.

    edges: [(u, v)] vertex-index pairs (undirected graphs must contain
    sibling pairs); input_edge_ids: parallel lists of input ids (empty
    for reverse siblings).  Returns a list of edge chains, each chain a
    list of (u, v) pairs in walk order."""
    n = len(edges)
    if n == 0:
        return []
    # Graph invariant: edges sorted lexicographically (stable w.r.t. ids).
    order = sorted(range(n), key=lambda e: (edges[e], e))
    edges_s = [edges[i] for i in order]
    ids_s = [list(input_edge_ids[i]) for i in order]
    min_ids = [min(s) if s else NO_INPUT_EDGE_ID for s in ids_s]
    directed = edge_type == "directed"

    def rev(e):
        return (e[1], e[0])

    sibling = None
    if not directed:
        # getSiblingMap: in-sorted permutation, degenerate pairs rewired
        sibling = sorted(range(n), key=lambda e: (rev(edges_s[e]), e))
        e = 0
        while e < n:
            u, v = edges_s[e]
            if u == v:
                sibling[e] = e + 1
                sibling[e + 1] = e
                e += 2
            else:
                e += 1

    out_map: dict = {}
    in_map: dict = {}
    for e, (u, v) in enumerate(edges_s):
        out_map.setdefault(u, []).append(e)
        in_map.setdefault(v, []).append(e)

    def out_degree(v):
        return len(out_map.get(v, ()))

    def in_degree(v):
        return len(in_map.get(v, ()))

    def is_interior(v):
        if directed:
            return in_degree(v) == 1 and out_degree(v) == 1
        return out_degree(v) == 2

    def excess_degree(v):
        return (out_degree(v) - in_degree(v)) if directed \
            else out_degree(v) % 2

    input_order = sorted(range(n), key=lambda e: (min_ids[e], e))
    used = [False] * n
    state = {"left": n // (1 if directed else 2)}
    excess_used: dict = {}

    def build_path(e):
        chain = []
        start = edges_s[e][0]
        while True:
            chain.append(e)
            used[e] = True
            if not directed:
                used[sibling[e]] = True
            state["left"] -= 1
            v = edges_s[e][1]
            if not is_interior(v) or v == start:
                break
            if directed:
                e = out_map[v][0]
            else:
                e = next(e2 for e2 in out_map[v] if not used[e2])
        return chain

    def build_walk(v):
        chain = []
        while True:
            best_edge = None
            best_out_id = NO_INPUT_EDGE_ID + 1
            for e in out_map.get(v, ()):
                if used[e] or min_ids[e] >= best_out_id:
                    continue
                best_out_id = min_ids[e]
                best_edge = e
            if best_edge is None:
                return chain
            # For idempotency, stop early if best_edge might continue a
            # different incoming edge.
            excess = excess_degree(v) - excess_used.get(v, 0)
            if (excess < 0) if directed else (excess % 2 == 1):
                if any(not used[e] and min_ids[e] <= best_out_id
                       for e in in_map.get(v, ())):
                    return chain
            chain.append(best_edge)
            used[best_edge] = True
            if not directed:
                used[sibling[best_edge]] = True
            state["left"] -= 1
            v = edges_s[best_edge][1]

    def maximize_walk(chain):
        i = 0
        while i <= len(chain):
            v = edges_s[chain[i]][0] if i == 0 else edges_s[chain[i - 1]][1]
            for e in out_map.get(v, ()):
                if not used[e]:
                    loop = build_walk(v)
                    chain[i:i] = loop
                    break
            i += 1
        return chain

    def canonicalize_loop_order(loop):
        if not loop:
            return loop
        pos = 0
        saw_gap = False
        for i in range(1, len(loop)):
            cmp = min_ids[loop[i]] - min_ids[loop[pos]]
            if cmp < 0:
                saw_gap = True
            elif cmp > 0 or not saw_gap:
                pos = i
                saw_gap = False
        pos += 1
        if pos == len(loop):
            pos = 0
        return loop[pos:] + loop[:pos]

    polylines = []
    if polyline_type == "path":
        for e in input_order:
            if not used[e] and not is_interior(edges_s[e][0]):
                polylines.append(build_path(e))
        for e in input_order:
            if state["left"] <= 0:
                break
            if used[e]:
                continue
            polylines.append(canonicalize_loop_order(build_path(e)))
    else:  # walk
        for e in input_order:
            if used[e]:
                continue
            v = edges_s[e][0]
            excess = excess_degree(v)
            if excess <= 0:
                continue
            excess -= excess_used.get(v, 0)
            if (excess <= 0) if directed else (excess % 2 == 0):
                continue
            excess_used[v] = excess_used.get(v, 0) + 1
            walk = build_walk(v)
            polylines.append(walk)
            end_v = edges_s[walk[-1]][1]
            excess_used[end_v] = excess_used.get(end_v, 0) - 1
        if state["left"] > 0:
            for chain in polylines:
                maximize_walk(chain)
        for i, e in enumerate(input_order):
            if state["left"] <= 0:
                break
            if used[e]:
                continue
            v = edges_s[e][0]
            eid = min_ids[e]
            excess = 0
            for e2 in input_order[i:]:
                if min_ids[e2] != eid:
                    break
                if used[e2]:
                    continue
                if edges_s[e2][0] == v:
                    excess += 1
                if edges_s[e2][1] == v:
                    excess -= 1
            if excess == 1 or edges_s[e][1] == v:
                walk = build_walk(v)
                maximize_walk(walk)
                polylines.append(walk)
    polylines.sort(key=lambda c: min_ids[c[0]])
    return [[edges_s[e] for e in chain] for chain in polylines]


def _simplifier_chain_walk(pts, tolerance_rad, avoid_pts):
    """Greedy maximal-edge walk over a chain using the ported
    PolylineSimplifier (the s2builder.d simplify pattern): every
    original vertex is a TARGET disc; vertices of OTHER chains near
    each traversed edge become AVOID discs with the side bit from
    orderedCCW (s2polyline_simplifier.d avoidDisc docstring recipe),
    so the simplified chain preserves topology with respect to them.
    Returns kept indices (always includes 0 and n-1)."""
    from .edge import edge_distances2, radians_to_chord2
    from .polyline_simplifier import PolylineSimplifier
    from .predicates import ordered_ccw
    n = len(pts)
    if n <= 2:
        return list(range(n))
    # IdentitySnapFunction guarantees (snap_functions.d:80-90 +
    # s2builder.d:564-566): avoid-candidates are sites within
    # max_edge_deviation (1.1 r) + min_edge_vertex_separation (0.5 r)
    # of the traversed edge; each is avoided by 0.5 r.
    avoid_rad = 0.5 * tolerance_rad
    lim2 = float(radians_to_chord2(1.6 * tolerance_rad))
    # avoidSites guards (s2builder.d:2455-2470): the distance from the
    # chain start must grow monotonically (no geometric simplification
    # of backtracking chains), and a simplified edge may not grow past
    # min_edge_length_to_split (its midpoint could then deviate more
    # than max_edge_deviation from the input edges).
    s_ratio = math.sin(tolerance_rad) / math.sin(1.1 * tolerance_rad) \
        if tolerance_rad > 0 else 1.0
    min_split = 2.0 * math.acos(min(1.0, s_ratio))
    min_split2 = float(radians_to_chord2(min(math.pi * 0.99, min_split)))
    s = PolylineSimplifier()
    out = [0]
    s.initialize(pts[0])
    anchor = 0

    def add_avoids(a_idx, c_idx, d_idx):
        if len(avoid_pts) == 0:
            return
        d2 = edge_distances2(avoid_pts, pts[c_idx][None, :],
                             pts[d_idx][None, :])[:, 0]
        near = np.flatnonzero(d2 <= lim2)
        if len(near) == 0:
            return
        A = pts[a_idx]
        ac = float(((A - pts[c_idx]) ** 2).sum())
        ad = float(((A - pts[d_idx]) ** 2).sum())
        for k in near.tolist():
            X = avoid_pts[k]
            ax = float(((A - X) ** 2).sum())
            if ax <= ac or ax >= ad:
                continue  # already considered / not yet relevant
            left = ordered_ccw(tuple(A), tuple(pts[d_idx]), tuple(X),
                               tuple(pts[c_idx]))
            s.avoid_disc(X, avoid_rad, bool(left))

    for i in range(1, n):
        r1c = float(((pts[anchor] - pts[i - 1]) ** 2).sum())
        r2c = float(((pts[anchor] - pts[i]) ** 2).sum())
        ok = (i - 1 == anchor) or (r2c >= r1c and r2c < min_split2)
        add_avoids(anchor, i - 1, i)
        if not ok or not s.extend(pts[i]):
            out.append(i - 1)
            anchor = i - 1
            s.initialize(pts[i - 1])
            add_avoids(anchor, i - 1, i)
        s.target_disc(pts[i], tolerance_rad)
    if out[-1] != n - 1:
        out.append(n - 1)
    return out


def simplify_graph(g: Graph, tolerance_rad: float,
                   forced_ids: frozenset = frozenset()) -> Graph:
    """simplify_edge_chains (s2builder.d:446-450 + EdgeChainSimplifier
    s2builder.d:2158-2560): collapse chains of interior vertices using
    the ported S2PolylineSimplifier at the snap-radius tolerance —
    every removed vertex is a target disc of the surviving edge, and
    vertices of other chains near the path are avoid discs with side
    bits, so topology wrt them is preserved.

    Interior vertices follow the reference's InteriorVertexMatcher: not
    forced, indegree == outdegree, adjacent to exactly two vertices
    with equal edge multiplicities toward each.  A chain traversed M
    times forward and N times backward merges into M+N copies of each
    simplified edge, each carrying the input-edge ids of one traversal
    (mergeChain semantics) — this is what makes backtracking polylines
    simplify parametrically.  Output edges are ordered by minimum input
    id, matching the reference layers' input-order reassembly.

    A conservative POST-check additionally reverts any chain whose
    simplified edges would cross another chain's edges."""
    from collections import Counter, defaultdict

    m = len(g.edges)
    if m == 0:
        return g

    def flat(i):
        return list(i) if isinstance(i, list) else [i]

    # Degenerate (v, v) edges pass through unchanged and do not count
    # toward degrees (the reference outputs them separately,
    # s2builder.d:2223-2228).
    out_deg = Counter()
    in_deg = Counter()
    adj = defaultdict(Counter)           # v -> neighbor -> #edges (both dirs)
    by_pair = defaultdict(list)          # (u, v) -> [edge idx]
    degen = []
    for idx, (u, v) in enumerate(g.edges):
        if u == v:
            degen.append(idx)
            continue
        out_deg[u] += 1
        in_deg[v] += 1
        adj[u][v] += 1
        adj[v][u] += 1
        by_pair[(u, v)].append(idx)

    def interior(v):
        if v in forced_ids:
            return False
        if out_deg[v] == 0 or out_deg[v] != in_deg[v]:
            return False
        nb = adj[v]
        if len(nb) != 2:
            return False
        c1, c2 = nb.values()
        return c1 == c2

    def follow(vprev, v):
        for nxt in adj[v]:
            if nxt != vprev:
                return nxt
        return vprev

    used = [False] * m
    for idx in degen:
        used[idx] = True
    chains = []   # (vertex_seq, spans); spans[k] = (fwd_idx_list, bwd_idx_list)

    def walk(e0):
        u0, v0 = g.edges[e0]
        seq = [u0, v0]
        while interior(seq[-1]) and seq[-1] != seq[0]:
            seq.append(follow(seq[-2], seq[-1]))
        spans = []
        for a, b in zip(seq[:-1], seq[1:]):
            fwd = sorted(by_pair.get((a, b), []),
                         key=lambda i: min(flat(g.input_edge_ids[i])))
            bwd = sorted(by_pair.get((b, a), []),
                         key=lambda i: min(flat(g.input_edge_ids[i])))
            for i in fwd:
                used[i] = True
            for i in bwd:
                used[i] = True
            spans.append((fwd, bwd))
        chains.append((seq, spans))

    for e0 in range(m):
        if not used[e0] and not interior(g.edges[e0][0]):
            walk(e0)
    for e0 in range(m):   # remaining pure cycles: anchor arbitrarily
        if not used[e0]:
            walk(e0)

    chain_vertex_sets = [set(seq) for seq, _ in chains]
    all_vertices_used = set()
    for cs in chain_vertex_sets:
        all_vertices_used |= cs

    def original_edges(seq, spans):
        out = []
        for (a, b), (fwd, bwd) in zip(zip(seq[:-1], seq[1:]), spans):
            for i in fwd:
                out.append(((a, b), flat(g.input_edge_ids[i])))
            for i in bwd:
                out.append(((b, a), flat(g.input_edge_ids[i])))
        return out

    simplified = []   # per chain: (list[(edge, ids)], changed)
    for ci_, (seq, spans) in enumerate(chains):
        M = len(spans[0][0])
        N = len(spans[0][1])
        uniform = all(len(f) == M and len(b) == N for f, b in spans)
        pts = g.vertices[np.array(seq)]
        other_ids = sorted(all_vertices_used - chain_vertex_sets[ci_])
        avoid_pts = g.vertices[np.array(other_ids)] if other_ids \
            else np.empty((0, 3))
        keep = _simplifier_chain_walk(pts, tolerance_rad, avoid_pts)
        if len(keep) == len(seq) or not uniform:
            simplified.append((original_edges(seq, spans), False))
            continue
        out = []
        for ka, kb in zip(keep[:-1], keep[1:]):
            span_slice = spans[ka:kb]
            for t in range(M):
                ids: list = []
                for fwd, _ in span_slice:
                    ids.extend(flat(g.input_edge_ids[fwd[t]]))
                out.append(((seq[ka], seq[kb]), sorted(set(ids))))
            for t in range(N):
                ids = []
                for _, bwd in span_slice:
                    ids.extend(flat(g.input_edge_ids[bwd[t]]))
                out.append(((seq[kb], seq[ka]), sorted(set(ids))))
        simplified.append((out, True))

    # conservative new-crossing check between different chains
    for k, (edges_k, changed) in enumerate(simplified):
        if not changed:
            continue
        bad = False
        for (u1, v1), _ in edges_k:
            a1, b1 = g.vertices[u1], g.vertices[v1]
            for k2, (edges_o, _) in enumerate(simplified):
                if k2 == k:
                    continue
                for (u2, v2), _ in edges_o:
                    if len({u1, v1, u2, v2}) < 4:
                        continue
                    if crossing_sign(tuple(a1), tuple(b1),
                                     tuple(g.vertices[u2]),
                                     tuple(g.vertices[v2])) > 0:
                        bad = True
                        break
                if bad:
                    break
            if bad:
                break
        if bad:   # revert this chain to its unsimplified form
            seq, spans = chains[k]
            simplified[k] = (original_edges(seq, spans), False)

    records = []
    for edges_k, _ in simplified:
        records.extend(edges_k)
    for idx in degen:   # degenerate edges pass through
        records.append((g.edges[idx], flat(g.input_edge_ids[idx])))
    # reference layers reassemble by input order: sort by min input id
    records.sort(key=lambda rec: min(rec[1]) if rec[1] else -1)
    return Graph(g.vertices, [e for e, _ in records],
                 [i for _, i in records])


def _coverage_endpoint(p, x, y, n, r):
    """s2builder.d getCoverageEndpoint: intersect edge XY (normal n)
    with the disc of radius r around P; return the intersection point
    further along XY toward Y."""
    n2 = float(n @ n)
    n_dp = float(n @ p)
    n_xp = np.cross(n, p)
    n_xp_xn = n2 * p - n_dp * n
    sin2_r = math.sin(r) ** 2
    om = math.sqrt(max(0.0, 1.0 - sin2_r)) * n_xp_xn
    mr2 = sin2_r * n2 - n_dp * n_dp
    mr = math.sqrt(max(0.0, mr2)) * n_xp
    out = om + mr
    return out / np.linalg.norm(out)


def _separation_site(snap, site_to_avoid, v0, v1, x, y, r):
    """s2builder.d getSeparationSite: a new site on the input edge XY,
    clamped into the coverage gap between chain sites v0 and v1."""
    n = np.cross(x, y)
    w = site_to_avoid - (float(site_to_avoid @ n) / float(n @ n)) * n
    new_site = w / np.linalg.norm(w)
    gap_min = _coverage_endpoint(v0, x, y, n, r)
    gap_max = _coverage_endpoint(v1, y, x, -n, r)
    xy_dir = y - x
    if float((new_site - gap_min) @ xy_dir) < 0:
        new_site = gap_min
    elif float((gap_max - new_site) @ xy_dir) < 0:
        new_site = gap_max
    return snap.snap_point(new_site)


def _snap_edge_chain(x, y, u_site, v_site, site_arr, r):
    """s2builder.d:1438-1520 snapEdge: route the snapped edge through
    every site whose r-clipped Voronoi region intersects the input edge
    (x, y) — the min-edge-vertex-separation machinery.  Candidates are
    sites within r of the edge ordered by projection along it; the
    chain is pruned with getVoronoiSiteExclusion and, for triples, the
    edgeCircumcenterSign test, exactly as the reference."""
    from .distance_predicates import (FIRST, SECOND, compare_edge_distance,
                                      edge_circumcenter_sign,
                                      get_voronoi_site_exclusion)
    from .edge import edge_distances2, radians_to_chord2
    from .predicates import sign
    if len(site_arr) == 0 or r <= 0:
        return [u_site, v_site]
    r2 = float(radians_to_chord2(r))
    d2 = edge_distances2(site_arr, x[None, :], y[None, :])[:, 0]
    cand = np.flatnonzero(d2 <= r2)
    if len(cand) == 0:
        return [u_site, v_site]
    # order by distance from the edge start (s2builder.d
    # sortSitesByDistance(x, site_ids)) — getVoronoiSiteExclusion
    # requires the earlier chain site to be closer to x
    t = ((site_arr[cand] - x[None, :]) ** 2).sum(axis=1)
    cand = cand[np.argsort(t, kind="stable")].tolist()
    max_adj2 = float(radians_to_chord2(min(math.pi, 2 * r)) ) + 4e-16
    chain: list[int] = []
    for ci in cand:
        if compare_edge_distance(site_arr[ci], x, y, r2) > 0:
            continue
        c = site_arr[ci]
        add_c = True
        while chain:
            b = site_arr[chain[-1]]
            bc2 = float(((b - c) ** 2).sum())
            if bc2 >= max_adj2:
                break
            try:
                res = get_voronoi_site_exclusion(b, c, x, y, r2)
            except Exception:
                break
            if res == FIRST:
                chain.pop()
                continue
            if res == SECOND:
                add_c = False
                break
            if len(chain) < 2:
                break
            a = site_arr[chain[-2]]
            ac2 = float(((a - c) ** 2).sum())
            if ac2 >= max_adj2:
                break
            xyb = sign(tuple(x), tuple(y), tuple(b))
            if sign(tuple(a), tuple(b), tuple(c)) == xyb:
                break
            if edge_circumcenter_sign(x, y, a, b, c) != xyb:
                break
            chain.pop()
        if add_c:
            chain.append(ci)
    if not chain:
        return [u_site, v_site]
    # endpoints' own sites anchor the chain
    if chain[0] != u_site:
        chain.insert(0, u_site)
    if chain[-1] != v_site:
        chain.append(v_site)
    out = [chain[0]]
    for s_ in chain[1:]:
        if s_ != out[-1]:
            out.append(s_)
    return out


class Builder:
    def __init__(self, snap_function=None, split_crossing_edges=False,
                 edge_type="directed", simplify_edge_chains=False,
                 idempotent=True):
        self.snap = snap_function or IdentitySnapFunction(0.0)
        self.split_crossing_edges = split_crossing_edges
        self.edge_type = edge_type
        self.simplify_edge_chains = simplify_edge_chains
        self.idempotent = idempotent
        self._edges: list[tuple[np.ndarray, np.ndarray]] = []
        self._forced: list[np.ndarray] = []

    def force_vertex(self, p):
        """s2builder.d:783-785 forceVertex: the point becomes a site
        verbatim (never snapped, never merged, never simplified away).
        No minimum-separation guarantees apply to forced sites."""
        self._forced.append(np.asarray(p, dtype=np.float64))

    def _snapping_needed(self, snapped):
        """Idempotency detection (s2builder.d snappingNeeded): snapping
        can be skipped when the input could already be the output of a
        previous snap — every vertex at its own snap site, all vertex
        pairs >= min_vertex_separation (= snap_radius), and no vertex
        within min_edge_vertex_separation (= snap_radius / 2) of a
        non-incident edge."""
        from .edge import edge_distances2, radians_to_chord2
        r = self.snap.snap_radius
        if r <= 0:
            return False
        pts = []
        for a, b in snapped:
            pts.append(a)
            pts.append(b)
        arr = np.unique(np.stack(pts), axis=0)
        for p in arr:
            if float(((self.snap.snap_point(p) - p) ** 2).sum()) > 1e-30:
                return True  # vertex not at a valid snap location
        sep2 = float(radians_to_chord2(r))
        d2 = ((arr[:, None, :] - arr[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(d2, 4.0)
        if float(d2.min()) < sep2:
            return True
        ev2 = float(radians_to_chord2(0.5 * r))
        for a, b in snapped:
            d = edge_distances2(arr, a[None, :], b[None, :])[:, 0]
            for k in np.flatnonzero(d < ev2).tolist():
                p = arr[k]
                if float(((p - a) ** 2).sum()) > 1e-30 \
                        and float(((p - b) ** 2).sum()) > 1e-30:
                    return True
        return False

    # -- extra sites (s2builder.d addExtraSites) -----------------------
    def _add_extra_sites(self, raw, snapped, site_arr, num_forced, r):
        """For each input edge, re-snap and check the chain; add a
        separation site when a snapped edge deviates too far from the
        input edge or passes too close to a non-forced site, then
        re-snap all affected earlier edges (the reference's queue).
        Chains and deviation checks run against the RAW input edges;
        only endpoint-site lookup uses the snapped endpoints."""
        from .edge import edge_distances2, radians_to_chord2
        max_dev = 1.1 * r
        sep = getattr(self.snap, "min_edge_vertex_separation", 0.5 * r)
        query2 = float(radians_to_chord2(min(math.pi, max_dev + sep)))
        ax = np.stack([a for a, _ in raw])
        ay = np.stack([b for _, b in raw])
        guard = 8 * len(raw) + 64   # runaway backstop
        for max_e in range(len(raw)):
            queue = [max_e]
            while queue and guard > 0:
                guard -= 1
                e = queue.pop()
                x, y = raw[e]
                sa, sb = snapped[e]
                u = int(np.argmin(((site_arr - sa) ** 2).sum(axis=1)))
                v = int(np.argmin(((site_arr - sb) ** 2).sum(axis=1)))
                chain = _snap_edge_chain(x, y, u, v, site_arr, r)
                new_site = self._find_extra_site(x, y, chain, site_arr,
                                                 num_forced, r)
                if new_site is None:
                    continue
                site_arr = np.vstack([site_arr, new_site[None, :]])
                d2 = edge_distances2(new_site[None, :], ax, ay)[0]
                for e2 in np.flatnonzero(d2 <= query2).tolist():
                    if e2 <= max_e:
                        queue.append(e2)
        return site_arr

    def _find_extra_site(self, x, y, chain, site_arr, num_forced, r):
        """s2builder.d maybeAddExtraSites: walk the edge's candidate
        sites in parallel with the snapped chain; return a new
        separation site or None."""
        from .distance_predicates import compare_edge_distance
        from .edge import (edge_distances2, is_edge_b_near_edge_a,
                           project, radians_to_chord2)
        max_dev = 1.1 * r
        sep = getattr(self.snap, "min_edge_vertex_separation", 0.5 * r)
        query2 = float(radians_to_chord2(min(math.pi, max_dev + sep)))
        sep2 = float(radians_to_chord2(sep))
        s_ratio = math.sin(r) / math.sin(max_dev)
        min_split = 2.0 * math.acos(min(1.0, s_ratio))
        min_split2 = float(radians_to_chord2(min(math.pi, min_split)))
        d2e = edge_distances2(site_arr, x[None, :], y[None, :])[:, 0]
        cand = np.flatnonzero(d2e <= query2)
        t = ((site_arr[cand] - x[None, :]) ** 2).sum(axis=1)
        cand = cand[np.argsort(t, kind="stable")].tolist()
        i = 0
        for sid in cand:
            if i < len(chain) and sid == chain[i]:
                i += 1
                if i == len(chain):
                    break
                v0 = site_arr[chain[i - 1]]
                v1 = site_arr[chain[i]]
                if float(((v0 - v1) ** 2).sum()) < min_split2:
                    continue
                if not is_edge_b_near_edge_a(x, y, v0, v1, max_dev):
                    mid = project(v0, x, y) + project(v1, x, y)
                    mid = mid / np.linalg.norm(mid)
                    return _separation_site(self.snap, mid, v0, v1,
                                            x, y, r)
            elif i > 0 and i < len(chain) and sid >= num_forced:
                v0 = site_arr[chain[i - 1]]
                v1 = site_arr[chain[i]]
                if compare_edge_distance(site_arr[sid], v0, v1,
                                         sep2) < 0:
                    return _separation_site(self.snap, site_arr[sid],
                                            v0, v1, x, y, r)
        return None

    # -- input ---------------------------------------------------------
    def add_edge(self, a, b):
        self._edges.append((np.asarray(a, dtype=np.float64),
                            np.asarray(b, dtype=np.float64)))

    def add_polyline(self, vertices):
        v = np.asarray(vertices, dtype=np.float64)
        for k in range(len(v) - 1):
            self.add_edge(v[k], v[k + 1])

    def add_loop(self, vertices):
        v = np.asarray(vertices, dtype=np.float64)
        for k in range(len(v)):
            self.add_edge(v[k], v[(k + 1) % len(v)])

    def add_polygon(self, polygon):
        for lp in polygon.loops:
            self.add_loop(lp.vertices)

    # -- build ---------------------------------------------------------
    def _split_crossings(self):
        """Insert a shared vertex at every interior edge crossing
        (s2builder.d split_crossing_edges)."""
        splits: dict[int, list] = {}
        e = self._edges
        for i in range(len(e)):
            for j in range(i + 1, len(e)):
                if crossing_sign(tuple(e[i][0]), tuple(e[i][1]),
                                 tuple(e[j][0]), tuple(e[j][1])) > 0:
                    x = get_intersection(e[i][0], e[i][1],
                                         e[j][0], e[j][1])
                    splits.setdefault(i, []).append(x)
                    splits.setdefault(j, []).append(x)
        if not splits:
            return
        out = []
        ids = []
        for i, (a, b) in enumerate(e):
            pts = splits.get(i, [])
            if pts:
                d = b - a
                order = np.argsort([float((p - a) @ d) for p in pts],
                                   kind="stable")
                pts = [pts[k] for k in order]
            chain = [a] + pts + [b]
            for u, v in zip(chain[:-1], chain[1:]):
                out.append((u, v))
                ids.append(i)
        self._edges = out
        self._input_ids_after_split = ids

    def build_graph(self) -> Graph:
        input_ids = list(range(len(self._edges)))
        if self.split_crossing_edges:
            self._split_crossings()
            input_ids = getattr(self, "_input_ids_after_split", input_ids)
        # 0. idempotency (s2builder.d setIdempotent): if the raw input
        #    already satisfies the snap function's guarantees, pass it
        #    through unchanged — no vertex moves, no merging, no edge
        #    routing.
        raw = [(np.asarray(a, dtype=np.float64),
                np.asarray(b, dtype=np.float64)) for a, b in self._edges]
        skip_snapping = (self.idempotent and raw and not self._forced
                         and not self._snapping_needed(raw))
        # forced sites first (addForcedSites: sort + dedup; their ids
        # are 0..num_forced-1 and isInterior() keeps them verbatim)
        forced: list[np.ndarray] = []
        for p in self._forced:
            if not any(float(((q - p) ** 2).sum()) <= 1e-30
                       for q in forced):
                forced.append(p)
        # 1. snap every endpoint with the snap function
        if skip_snapping:
            snapped = raw
        else:
            snapped = [(self.snap.snap_point(a), self.snap.snap_point(b))
                       for a, b in self._edges]
        # 2. site selection: greedy maximal subset separated by at
        #    least snap_radius, processed in S2CellId order (the
        #    reference visits candidate sites in cell-id order,
        #    s2builder.d chooseAllVerticesAsSites/snap order — this is
        #    what yields the ~1.33r average site spacing its tests
        #    assert), then nearest-site assignment for every endpoint.
        r = self.snap.snap_radius
        pts = []
        for a, b in snapped:
            pts.append(a)
            pts.append(b)
        verts: list[np.ndarray] = list(forced)
        if pts:
            arr = np.stack(pts)
            uniq = np.unique(arr, axis=0)
            cids = ci.cellid_from_xyz(uniq[:, 0], uniq[:, 1], uniq[:, 2])
            order = np.argsort(cids, kind="stable")
            chord2_max = (2 * math.sin(min(math.pi / 2, r / 2))) ** 2 \
                if r > 0 and not skip_snapping else 0.0
            for k in order.tolist():
                p = uniq[k]
                ok = True
                for s in verts:
                    d = s - p
                    if float(d @ d) <= chord2_max:
                        ok = False
                        break
                if ok:
                    verts.append(p)
        site_arr = np.stack(verts) if verts else np.empty((0, 3))

        def site_for(p):
            d2 = ((site_arr - p) ** 2).sum(axis=1)
            return int(np.argmin(d2))

        # addExtraSites (s2builder.d:1251-1348): guarantee that snapped
        # edges stay within max_edge_deviation of their input edge and
        # at least min_edge_vertex_separation from non-incident sites,
        # by inserting "separation sites" on the input edge where needed.
        if (not skip_snapping and r > 0 and len(site_arr) >= 2
                and len(raw) > 0):
            site_arr = self._add_extra_sites(raw, snapped, site_arr,
                                             len(forced), r)
            verts = [site_arr[k] for k in range(len(site_arr))]

        edges = []
        out_ids = []
        r = self.snap.snap_radius
        for (ra, rb), (a, b), iid in zip(raw, snapped, input_ids):
            u, v = site_for(a), site_for(b)
            # min-edge-vertex-separation: route the edge through every
            # site whose clipped Voronoi region it crosses.  snapEdge
            # operates on the RAW input edge (s2builder.d:1447-1448
            # uses _inputVertices), not the snapped endpoints.
            chain = _snap_edge_chain(ra, rb, u, v, site_arr, r) \
                if r > 0 and len(site_arr) > 2 and not skip_snapping \
                else [u, v]
            for cu, cv in zip(chain[:-1], chain[1:]):
                edges.append((cu, cv))
                out_ids.append(iid)
            if len(chain) == 1:  # fully degenerate after snapping
                edges.append((chain[0], chain[0]))
                out_ids.append(iid)
        g = Graph(verts, edges, out_ids)
        g.num_forced = len(forced)
        if self.simplify_edge_chains and self.snap.snap_radius > 0:
            g = simplify_graph(g, self.snap.snap_radius,
                               forced_ids=frozenset(range(len(forced))))
            g.num_forced = len(forced)
        if self.edge_type == "undirected":
            # sibling pairs (s2builder.d:1669-1680): undirected input is
            # represented as both directions with the same input ids.
            # Siblings are added AFTER simplification so undirected
            # chains simplify exactly like their directed counterparts
            # (the reference's InteriorVertexMatcher handles the
            # combined multiplicities; emitting the reverse of each
            # simplified edge is the single-layer equivalent).
            n = len(g.edges)
            for k in range(n):
                u, v = g.edges[k]
                g.edges.append((v, u))
                g.input_edge_ids.append(g.input_edge_ids[k])
        return g

    def build_polygon(self):
        """Assemble a Polygon from the snapped directed edges
        (s2polygon_layer.d semantics; degenerate edges dropped)."""
        from .polygon_ops import _assemble, _dedup_directed, _rings_to_polygon

        class _Snap:
            pass
        g = self.build_graph()
        holder = _Snap()
        holder.points = [g.vertices[k] for k in range(len(g.vertices))]
        if self.edge_type == "undirected":
            # s2polygon_layer.d with EdgeType.UNDIRECTED: both directions
            # of every edge are present; the leftmost-turn walk then
            # traverses each FACE of the subdivision once, and the
            # interior-on-left (positive-area) faces are the polygon
            # rings (the complement face comes out clockwise and is
            # dropped).  Parity containment makes this correct for
            # nested rings too (a hole's CCW face xors against its
            # shell).
            from .measures import loop_signed_area
            kept = [(u, v) for (u, v) in g.edges if u != v]
            rings = [r for r in _assemble(kept, holder)
                     if loop_signed_area(r) > 0]
        else:
            # s2polygon_layer.d GraphOptions: degenerate edges discarded
            # and matched sibling pairs cancel (collapsed strips/seams
            # vanish)
            kept = _dedup_directed([(u, v) for (u, v) in g.edges
                                    if u != v])
            rings = _assemble(kept, holder)
        return _rings_to_polygon(rings)

    def build_polygon_into_index(self, index_set):
        """IndexedS2PolygonLayer (s2polygon_layer.d:291-318): build the
        polygon through the ordinary layer pipeline and, when the
        result is non-empty, register it with the mutable shape-index
        set.  Returns (polygon, shape_id) — shape_id is None when the
        polygon came out empty (the reference skips the index add)."""
        polygon = self.build_polygon()
        if polygon is None or not polygon.loops:
            return polygon, None
        return polygon, index_set.add(polygon)

    def build_polyline(self):
        """Assemble one polyline following input-edge order
        (s2polyline_layer.d), degenerate snapped edges dropped.  With
        undirected edges each sibling pair is consumed once, in
        whichever direction extends the current chain."""
        g = self.build_graph()
        undirected = self.edge_type == "undirected"
        chain: list[int] = []
        used_ids: set = set()
        for (u, v), iid in zip(g.edges, g.input_edge_ids):
            if u == v:
                continue
            if undirected:
                # sibling pairs share their input id(s): use each
                # undirected edge once, in the direction that extends
                # the chain
                key = tuple(sorted(iid)) if isinstance(iid, list) else iid
                if key in used_ids:
                    continue
                used_ids.add(key)
            if not chain:
                chain = [u, v]
            elif chain[-1] == u:
                chain.append(v)
            elif undirected and chain[-1] == v:
                chain.append(u)
            else:
                chain.extend([u, v])
        return np.array([g.vertices[k] for k in chain]) \
            if chain else np.empty((0, 3))

    def build_polyline_vector(self):
        """Assemble MULTIPLE polylines (s2polyline_vector_layer.d:49):
        edges are walked in input order; a new polyline starts whenever
        the next edge does not continue the current chain.  Returns a
        list of (n, 3) vertex arrays."""
        g = self.build_graph()
        undirected = self.edge_type == "undirected"
        out: list[np.ndarray] = []
        chain: list[int] = []
        used_ids: set = set()
        for (u, v), iid in zip(g.edges, g.input_edge_ids):
            if u == v:
                continue
            if undirected:
                key = tuple(sorted(iid)) if isinstance(iid, list) else iid
                if key in used_ids:
                    continue
                used_ids.add(key)
            if not chain:
                chain = [u, v]
            elif chain[-1] == u:
                chain.append(v)
            elif undirected and chain[-1] == v:
                chain.append(u)
            else:
                out.append(np.array([g.vertices[k] for k in chain]))
                chain = [u, v]
        if chain:
            out.append(np.array([g.vertices[k] for k in chain]))
        return out
