"""Graph loop/component extraction (src/s2/builder/graph.d:702-1130):
getLeftTurnMap, getDirectedLoops, getDirectedComponents and
getUndirectedComponents — the machinery that turns a builder graph's
directed edges into polygon loops by always taking the next edge
clockwise around each vertex ("left turns"), peeling off loops at
repeated vertices (SIMPLE) or edges (CIRCUIT), and splitting undirected
graphs into the two complementary orientations.

Graphs are (vertices, edges, input_edge_ids): vertices an (n,3) array,
edges [(u, v)] vertex-index pairs, input_edge_ids parallel lists."""

from __future__ import annotations

import numpy as np

from .predicates import ordered_ccw

NO_INPUT_EDGE_ID = 1 << 60


class GraphLoopError(ValueError):
    pass


def _sorted_graph(edges, input_edge_ids):
    order = sorted(range(len(edges)), key=lambda e: (edges[e], e))
    edges_s = [edges[i] for i in order]
    ids_s = [list(input_edge_ids[i]) for i in order]
    min_ids = [min(s) if s else NO_INPUT_EDGE_ID for s in ids_s]
    return edges_s, ids_s, min_ids


def _in_edge_ids(edges_s):
    return sorted(range(len(edges_s)),
                  key=lambda e: ((edges_s[e][1], edges_s[e][0]), e))


def _make_sibling_map(edges_s, in_ids, edge_type):
    """graph.d:224-249 makeSiblingMap: the in-sorted permutation IS the
    sibling map; for UNDIRECTED graphs, degenerate edges are grouped in
    adjacent pairs so each is the other's sibling (a DIRECTED degenerate
    edge is its own sibling)."""
    sibling = list(in_ids)
    if edge_type == "directed":
        return sibling
    n = len(edges_s)
    e = 0
    while e < n:
        u, v = edges_s[e]
        if u == v:
            sibling[e] = e + 1
            sibling[e + 1] = e
            e += 2
        else:
            e += 1
    return sibling


def get_left_turn_map(vertices, edges_s, in_ids):
    """For each edge, the next edge in a left-turning walk
    (graph.d getLeftTurnMap): at each vertex the incident edges are
    sorted clockwise and each incoming edge maps to the immediately
    following outgoing edge; degenerate edges map to themselves.
    Raises GraphLoopError when indegree != outdegree somewhere."""
    n = len(edges_s)
    ltm = [-1] * n
    if n == 0:
        return ltm
    vertices = np.asarray(vertices, dtype=np.float64)

    def rev(e):
        return (e[1], e[0])

    sentinel = (len(vertices), len(vertices))
    out_id = in_id = 0
    out_edge = edges_s[0]
    in_edge = edges_s[in_ids[0]]
    error = False
    min_edge = min(out_edge, rev(in_edge))
    while min_edge != sentinel:
        v0 = min_edge[0]
        v0_edges = []  # (incoming, index, endpoint, rank)
        while min_edge[0] == v0 and min_edge != sentinel:
            v1 = min_edge[1]
            out_begin, in_begin = out_id, in_id
            while out_edge == min_edge:
                out_id += 1
                out_edge = sentinel if out_id == n else edges_s[out_id]
            while rev(in_edge) == min_edge:
                in_id += 1
                in_edge = sentinel if in_id == n else edges_s[in_ids[in_id]]
            if v0 != v1:
                # addVertexEdges (graph.d:1703-1721): interleave so as to
                # create as many two-edge loops as possible.
                rank = 0
                ob, oe_, ib, ie_ = out_begin, out_id, in_begin, in_id
                while ie_ - ib > oe_ - ob:
                    ie_ -= 1
                    v0_edges.append((True, ie_, v1, rank))
                    rank += 1
                while ie_ > ib:
                    v0_edges.append((False, ob, v1, rank))
                    ob += 1
                    rank += 1
                    ie_ -= 1
                    v0_edges.append((True, ie_, v1, rank))
                    rank += 1
                while oe_ > ob:
                    v0_edges.append((False, ob, v1, rank))
                    ob += 1
                    rank += 1
            else:
                # Each degenerate edge becomes its own loop.  (With the
                # sibling-symmetry precondition, in positions == edge
                # ids here.)
                for p in range(in_begin, in_id):
                    ltm[p] = p
            min_edge = min(out_edge, rev(in_edge))
        if not v0_edges:
            continue

        # Sort clockwise around v0.
        min_endpoint = v0_edges[0][2]
        import functools

        def cw(a, b):
            if a[2] == b[2]:
                return -1 if a[3] < b[3] else 1
            if a[2] == min_endpoint:
                return -1
            if b[2] == min_endpoint:
                return 1
            return 1 if ordered_ccw(tuple(vertices[a[2]]),
                                    tuple(vertices[b[2]]),
                                    tuple(vertices[min_endpoint]),
                                    tuple(vertices[v0])) else -1

        v0_edges.sort(key=functools.cmp_to_key(cw))

        e_in, e_out = [], []
        for incoming, index, _, _ in v0_edges:
            if incoming:
                e_in.append(in_ids[index])
            elif e_in:
                ltm[e_in.pop()] = index
            else:
                e_out.append(index)
        e_out.reverse()
        while e_out and e_in:
            ltm[e_in.pop()] = e_out.pop()
        if e_in:
            error = True
    if error:
        raise GraphLoopError(
            "Given edges do not form loops (indegree != outdegree)")
    return ltm


def _canonicalize_loop_order(min_ids, loop):
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


def get_directed_loops(vertices, edges, input_edge_ids, loop_type="simple"):
    """graph.d getDirectedLoops: left-turn walks; SIMPLE peels a loop at
    every repeated vertex, CIRCUIT at repeated edges.  Returns loops as
    lists of (u, v) edges."""
    edges_s, _, min_ids = _sorted_graph(edges, input_edge_ids)
    in_ids = _in_edge_ids(edges_s)
    ltm = get_left_turn_map(vertices, edges_s, in_ids)
    n = len(edges_s)
    path_index = {} if loop_type == "simple" else None
    loops = []
    path = []
    for start in range(n):
        if ltm[start] < 0:
            continue
        e = start
        while ltm[e] >= 0:
            path.append(e)
            nxt = ltm[e]
            ltm[e] = -1
            if loop_type == "simple":
                path_index[edges_s[e][0]] = len(path) - 1
                loop_start = path_index.get(edges_s[e][1], -1)
                if loop_start >= 0:
                    loop = path[loop_start:]
                    del path[loop_start:]
                    for e2 in loop:
                        path_index.pop(edges_s[e2][0], None)
                    loops.append(_canonicalize_loop_order(min_ids, loop))
            e = nxt
        if loop_type != "simple":
            loops.append(_canonicalize_loop_order(min_ids, path))
            path = []
        else:
            assert not path
    loops.sort(key=lambda lp: min_ids[lp[0]])
    return [[edges_s[e] for e in lp] for lp in loops]


def get_directed_components(vertices, edges, input_edge_ids,
                            degenerate_boundaries="keep"):
    """graph.d getDirectedComponents: groups left-turn loops into
    connected components via the sibling frontier (requires sibling
    symmetry, e.g. SiblingPairs CREATE/REQUIRE).  Only the KEEP
    degenerate-boundaries path is implemented (the DISCARD peel is used
    by S2PolygonLayer, which this engine replaces with its own
    assembly)."""
    assert degenerate_boundaries == "keep"
    edges_s, _, min_ids = _sorted_graph(edges, input_edge_ids)
    in_ids = _in_edge_ids(edges_s)
    ltm = get_left_turn_map(vertices, edges_s, in_ids)
    sibling = _make_sibling_map(edges_s, in_ids, "directed")
    n = len(edges_s)
    components = []
    for min_start in range(n):
        if ltm[min_start] < 0:
            continue
        component = []
        frontier = [min_start]
        while frontier:
            start = frontier.pop()
            if ltm[start] < 0:
                continue
            path = []
            e = start
            while ltm[e] >= 0:
                path.append(e)
                nxt = ltm[e]
                ltm[e] = -1
                if ltm[sibling[e]] >= 0:
                    frontier.append(sibling[e])
                e = nxt
            component.append(_canonicalize_loop_order(min_ids, path))
        component.sort(key=lambda lp: min_ids[lp[0]])
        components.append(component)
    components.sort(key=lambda c: min_ids[c[0][0]])
    return [[[edges_s[e] for e in lp] for lp in comp]
            for comp in components]


def get_undirected_components(vertices, edges, input_edge_ids,
                              loop_type="circuit"):
    """graph.d getUndirectedComponents: like the directed form but each
    sibling goes to the OPPOSITE complement (slot), yielding the two
    orientations of each component."""
    edges_s, _, min_ids = _sorted_graph(edges, input_edge_ids)
    in_ids = _in_edge_ids(edges_s)
    ltm = get_left_turn_map(vertices, edges_s, in_ids)
    sibling = _make_sibling_map(edges_s, in_ids, "undirected")
    n = len(edges_s)

    def mark_used(slot):
        return -1 - slot

    path_index = {} if loop_type == "simple" else None
    components = []
    for min_start in range(n):
        if ltm[min_start] < 0:
            continue
        component = [[], []]
        frontier = [(min_start, 0)]
        while frontier:
            start, slot = frontier.pop()
            if ltm[start] < 0:
                continue
            path = []
            e = start
            while ltm[e] >= 0:
                path.append(e)
                nxt = ltm[e]
                ltm[e] = mark_used(slot)
                sib = sibling[e]
                if ltm[sib] >= 0:
                    frontier.append((sib, 1 - slot))
                elif ltm[sib] != mark_used(1 - slot):
                    raise GraphLoopError(
                        "Given undirected edges do not form loops")
                if loop_type == "simple":
                    path_index[edges_s[e][0]] = len(path) - 1
                    loop_start = path_index.get(edges_s[e][1], -1)
                    if loop_start >= 0:
                        loop = path[loop_start:]
                        del path[loop_start:]
                        for e2 in loop:
                            path_index.pop(edges_s[e2][0], None)
                        component[slot].append(
                            _canonicalize_loop_order(min_ids, loop))
                e = nxt
            if loop_type != "simple":
                component[slot].append(
                    _canonicalize_loop_order(min_ids, path))
            else:
                assert not path
        for s in (0, 1):
            component[s].sort(key=lambda lp: min_ids[lp[0]])
        if min_ids[component[0][0][0]] > min_ids[component[1][0][0]]:
            component[0], component[1] = component[1], component[0]
        components.append(component)
    components.sort(key=lambda c: min_ids[c[0][0][0]])
    return [[[[edges_s[e] for e in lp] for lp in comp]
             for comp in pair] for pair in components]
