"""Mixed-dimension S2BooleanOperation (src/s2/s2boolean_operation.d:66-229).

Computes UNION / INTERSECTION / DIFFERENCE / SYMMETRIC_DIFFERENCE between
two regions, each a collection of points (dim 0), polylines (dim 1) and
lax polygons (dim 2), under the reference's PolygonModel / PolylineModel
boundary semantics (OPEN / SEMI_OPEN / CLOSED) and with the dimension
rules of the reference header:

  - UNION: the higher-dimensional shape wins (a polyline absorbed by a
    closed polygon disappears; same-dimension duplicates are multisets).
  - INTERSECTION: the lower-dimensional shape wins (a polygon meeting a
    point at a vertex under CLOSED yields just the point).
  - DIFFERENCE: subtracting lower-dimensional geometry has no effect.

Rather than the reference's GraphEdgeClipper over an S2Builder graph
(s2boolean_operation.d:230-2555), the re-expression here works directly
on directed edge multisets: input edges are split at region-boundary
crossings, each sub-edge is classified against the other region (interior
parity / shared forward edge / shared reverse edge), kept per op rules,
and the surviving edges are then "welded" S2Builder-style: every output
vertex and every proper crossing between two OUTPUT edges becomes a site,
and output edges are split at the sites lying in their interior.  Snap
rounding (e.g. IntLatLngSnapFunction) is applied to the final vertices;
edges that become degenerate after snapping are kept, matching
`test/s2/s2boolean_operation_test.d` PolygonEdgesDegenerateAfterSnapping.

Limitation vs the reference: collinear partial edge overlaps must be
vertex-aligned (the reference merges near-coincident vertices via snap
rounding first); all overlap handling here is whole-edge.  This machinery
is geometry construction for small broadcast-side inputs, not a per-row
batch kernel.
"""

from __future__ import annotations

import math

import numpy as np

from .predicates import crossing_sign, edge_or_vertex_crossing, sign
from .edge_crossings import get_intersection
from . import textformat

OPEN = "OPEN"
SEMI_OPEN = "SEMI_OPEN"
CLOSED = "CLOSED"

UNION = "UNION"
INTERSECTION = "INTERSECTION"
DIFFERENCE = "DIFFERENCE"
SYMMETRIC_DIFFERENCE = "SYMMETRIC_DIFFERENCE"


class BooleanOptions:
    """Subset of S2BooleanOperation.Options used by the reference tests
    (polygon/polyline models + snap function)."""

    def __init__(self, polygon_model=SEMI_OPEN, polyline_model=CLOSED,
                 snap_function=None, polyline_loops_have_boundaries=True):
        self.polygon_model = polygon_model
        self.polyline_model = polyline_model
        self.snap_function = snap_function
        self.polyline_loops_have_boundaries = polyline_loops_have_boundaries


def _pt(v):
    return (float(v[0]), float(v[1]), float(v[2]))


def make_lax_index(text):
    """makeIndexOrDie preserving loop orientation and degeneracies:
    polygons become lists of raw loops (no normalization), unlike
    textformat.make_index which builds validated Polygons."""
    sections = text.split("#")
    assert len(sections) == 3, "expected 'points # polylines # polygons'"
    pts_txt, lines_txt, polys_txt = sections
    pts = []
    for chunk in (t for t in pts_txt.split("|") if t.strip()):
        pts.extend(_pt(p) for p in textformat.parse_points(chunk))
    polylines = [[_pt(p) for p in textformat.parse_points(chunk)]
                 for chunk in lines_txt.split("|") if chunk.strip()]
    polygons = []
    for chunk in (t for t in polys_txt.split("|") if t.strip()):
        loops = [[_pt(p) for p in textformat.parse_points(lp)]
                 for lp in chunk.split(";") if lp.strip()]
        polygons.append(loops)
    return {"points": pts, "polylines": polylines, "polygons": polygons}


def index_edges_by_dim(index):
    """Directed edge multisets per dimension, the comparison form used by
    the reference test's IndexMatchingLayer (points are (v, v))."""
    out = {0: [], 1: [], 2: []}
    for p in index["points"]:
        out[0].append((p, p))
    for line in index["polylines"]:
        for i in range(len(line) - 1):
            out[1].append((line[i], line[i + 1]))
    for loops in index["polygons"]:
        for lp in loops:
            n = len(lp)
            for i in range(n):
                out[2].append((lp[i], lp[(i + 1) % n]))
    return out


# ---------------------------------------------------------------------------
# point classification helpers


def _on_edge_interior(p, a, b):
    """p lies strictly inside arc AB (arcs < 180 deg)."""
    if p == a or p == b or a == b:
        return False
    if sign(a, b, p) != 0:
        return False
    pa = np.subtract(p, a)
    ba = np.subtract(b, a)
    pb = np.subtract(p, b)
    ab = np.subtract(a, b)
    return float(pa @ ba) > 0.0 and float(pb @ ab) > 0.0


def _loops_parity_contains(p, all_loops):
    """Strict-interior style crossing-parity containment (the SEMI_OPEN
    vertex rule of s2contains_point_query.d): parity of
    edgeOrVertexCrossing along ref->p over all non-degenerate loop
    edges, seeded by the lax reference point."""
    from .shapes import LaxPolygonShape, get_reference_point
    loops = [lp for lp in all_loops if len(lp) >= 3]
    degen = [lp for lp in all_loops if len(lp) < 3]
    if not loops:
        return False
    shape = LaxPolygonShape(loops + degen)
    ref, contained = get_reference_point(shape)
    ref = _pt(ref)
    if ref == p:
        return contained
    inside = contained
    for lp in loops:
        n = len(lp)
        for i in range(n):
            a, b = lp[i], lp[(i + 1) % n]
            if a == b:
                continue
            if edge_or_vertex_crossing(ref, p, a, b):
                inside = not inside
    return inside


def _polygon_boundary_kind(p, polygons):
    """'vertex' | 'edge' | None for p against all loops of all polygons."""
    kind = None
    for loops in polygons:
        for lp in loops:
            n = len(lp)
            for i in range(n):
                if lp[i] == p:
                    return "vertex"
                if _on_edge_interior(p, lp[i], lp[(i + 1) % n]):
                    kind = "edge"
    return kind


def point_in_polygons(p, polygons, model):
    """Point containment in the union of the polygons per PolygonModel."""
    if not polygons:
        return False
    all_loops = [lp for loops in polygons for lp in loops]
    boundary = _polygon_boundary_kind(p, polygons)
    if model == OPEN:
        return boundary is None and _loops_parity_contains(p, all_loops)
    if model == CLOSED:
        return boundary is not None or _loops_parity_contains(p, all_loops)
    # SEMI_OPEN: edges are contained; vertices follow crossing parity.
    if boundary == "edge":
        return True
    return _loops_parity_contains(p, all_loops)


def _polyline_vertex_set(line, model, loops_have_boundaries=True):
    """The set of vertex POINTS a single polyline contains under the
    model (s2boolean_operation.d:112-127; degenerate semi-open polylines
    contain nothing because the sole vertex is also the last)."""
    n = len(line)
    pts = set(line)
    is_loop = n > 2 and line[0] == line[-1]
    if model == CLOSED or (is_loop and not loops_have_boundaries):
        return pts
    if model == SEMI_OPEN:
        return set(line[:-1]) - {line[-1]}
    # OPEN
    return set(line[1:-1]) - {line[0], line[-1]}


def point_in_polylines(p, polylines, model, loops_have_boundaries=True):
    for line in polylines:
        if p in _polyline_vertex_set(line, model, loops_have_boundaries):
            return True
        for i in range(len(line) - 1):
            if _on_edge_interior(p, line[i], line[i + 1]):
                return True
    return False


# ---------------------------------------------------------------------------
# edge bookkeeping


class _Edge:
    __slots__ = ("side", "dim", "shape", "a", "b", "eid", "incidences")

    def __init__(self, side, dim, shape, a, b, eid):
        self.side = side
        self.dim = dim
        self.shape = shape      # polyline index / polygon index
        self.a = a
        self.b = b
        self.eid = eid
        # (t, point, kind, partner_eid); kind in {"cross", "vertex"}
        self.incidences = []

    def param(self, x):
        """Monotone position of x along arc a->b."""
        if x == self.a:
            return 0.0
        if x == self.b:
            return 1.0
        d = max(-1.0, min(1.0, float(np.dot(self.a, x))))
        full = max(-1.0, min(1.0, float(np.dot(self.a, self.b))))
        ang = math.acos(d)
        total = math.acos(full)
        return ang / total if total > 0 else 0.0


def _collect_edges(index, side):
    edges = []
    for li, line in enumerate(index["polylines"]):
        for i in range(len(line) - 1):
            edges.append(_Edge(side, 1, li, line[i], line[i + 1],
                               ("L", side, li, i)))
    for pi, loops in enumerate(index["polygons"]):
        for lj, lp in enumerate(loops):
            n = len(lp)
            for i in range(n):
                edges.append(_Edge(side, 2, pi, lp[i], lp[(i + 1) % n],
                                   ("P", side, pi, lj, i)))
    return edges


def _record_incidences(edges_a, edges_b, points_a, points_b):
    """Proper crossings + vertex-on-edge touches across ALL edge pairs
    (both sides, including same-side self-crossings, which matter for
    the final welding pass)."""
    all_edges = edges_a + edges_b
    crossings = []   # (point, eid1, eid2)
    for i in range(len(all_edges)):
        e = all_edges[i]
        if e.a == e.b:
            continue
        for j in range(i + 1, len(all_edges)):
            f = all_edges[j]
            if f.a == f.b:
                continue
            if crossing_sign(e.a, e.b, f.a, f.b) > 0:
                x = _pt(get_intersection(e.a, e.b, f.a, f.b))
                e.incidences.append((e.param(x), x, "cross", f.eid))
                f.incidences.append((f.param(x), x, "cross", e.eid))
                crossings.append((x, e.eid, f.eid))
        # vertex-on-edge touches (any vertex of the whole problem)
    vertex_pool = set()
    for e in all_edges:
        vertex_pool.add(e.a)
        vertex_pool.add(e.b)
    vertex_pool.update(points_a)
    vertex_pool.update(points_b)
    for e in all_edges:
        if e.a == e.b:
            continue
        for v in vertex_pool:
            if _on_edge_interior(v, e.a, e.b):
                e.incidences.append((e.param(v), v, "vertex", None))
    for e in all_edges:
        e.incidences.sort(key=lambda t: t[0])
    return all_edges, crossings


def _edge_key(e):
    return (e.a, e.b)


def _segments(e, other_polygon_eids):
    """Split edge e at proper crossings with the OTHER side's polygon
    edges (the only points where region membership changes).  Returns
    [(t0, t1, a, b)]."""
    if e.a == e.b:
        return [(0.0, 1.0, e.a, e.b)]
    cuts = sorted((t, x) for (t, x, kind, peid) in e.incidences
                  if kind == "cross" and peid in other_polygon_eids)
    pts = [(0.0, e.a)]
    for t, x in cuts:
        if x != pts[-1][1]:
            pts.append((t, x))
    if e.b == pts[-1][1] and len(pts) > 1:
        pts.pop()
    pts.append((1.0, e.b))
    return [(pts[k][0], pts[k + 1][0], pts[k][1], pts[k + 1][1])
            for k in range(len(pts) - 1)]


def _midpoint(a, b):
    m = np.add(a, b)
    n = float(np.linalg.norm(m))
    if n == 0:
        return a
    return _pt(m / n)


class _HalfResult:
    """Kept output arcs + stubs for one side of one op."""

    def __init__(self):
        self.arcs = []    # (edge, t0, t1, a, b, reversed)
        self.stubs = []   # (dim, v)
        self.points = []  # kept dim-0 points


def _shared_lookup(edges):
    fwd = {}
    for e in edges:
        fwd.setdefault((e.a, e.b), []).append(e)
    return fwd


def _classify_segment(seg, e, y_poly_fwd, y_line_fwd, y_all_loops):
    """-> ('fwd'|'rev'|'line'|'in'|'out')  vs the other region."""
    t0, t1, a, b = seg
    key_f = (a, b)
    key_r = (b, a)
    # whole-edge shared detection (overlaps are vertex-aligned)
    if key_f in y_poly_fwd:
        return "fwd"
    if key_r in y_poly_fwd:
        return "rev"
    if key_f in y_line_fwd or key_r in y_line_fwd:
        return "line"
    mid = a if a == b else _midpoint(a, b)
    if y_all_loops and _loops_parity_contains(mid, y_all_loops):
        return "in"
    return "out"


def _merge_keep_runs(e, segs, kept_flags):
    runs = []
    cur = None
    for seg, keep in zip(segs, kept_flags):
        if keep:
            if cur is None:
                cur = [seg[0], seg[1], seg[2], seg[3]]
            else:
                cur[1] = seg[1]
                cur[3] = seg[3]
        else:
            if cur is not None:
                runs.append(tuple(cur))
                cur = None
    if cur is not None:
        runs.append(tuple(cur))
    return [(e, r[0], r[1], r[2], r[3], False) for r in runs]


def _half_op(op, x_index, y_index, x_edges, y_edges, options, side):
    """Process X's geometry against region Y for one op.  `side` is 0
    for the first region (used to dedupe shared forward polygon edges)."""
    res = _HalfResult()
    pg_model = options.polygon_model
    pl_model = options.polyline_model
    lhb = options.polyline_loops_have_boundaries

    y_polygons = y_index["polygons"]
    y_all_loops = [lp for loops in y_polygons for lp in loops]
    y_poly_edges = [e for e in y_edges if e.dim == 2]
    y_line_edges = [e for e in y_edges if e.dim == 1]
    y_poly_fwd = _shared_lookup(y_poly_edges)
    y_line_fwd = _shared_lookup(y_line_edges)
    y_poly_eids = {e.eid for e in y_poly_edges}
    y_line_eids = {e.eid for e in y_line_edges}

    # ---- dim 0 -----------------------------------------------------------
    for p in x_index["points"]:
        in_hi = (point_in_polylines(p, y_index["polylines"], pl_model, lhb)
                 or point_in_polygons(p, y_polygons, pg_model))
        in_same = p in set(y_index["points"])
        if op == UNION:
            keep = not in_hi
        elif op == INTERSECTION:
            keep = in_hi or in_same
        else:  # DIFFERENCE
            keep = not (in_hi or in_same)
        if keep:
            res.points.append(p)

    # ---- dim 1 -----------------------------------------------------------
    x_line_edges = [e for e in x_edges if e.dim == 1]
    by_line = {}
    for e in x_line_edges:
        by_line.setdefault(e.shape, []).append(e)
    kept_endpoints_per_line = {}
    for li, line in enumerate(x_index["polylines"]):
        kept_eps = set()
        for e in by_line.get(li, []):
            segs = _segments(e, y_poly_eids)
            flags = []
            for seg in segs:
                cls = _classify_segment(seg, e, y_poly_fwd, y_line_fwd,
                                        y_all_loops)
                absorbed_by_poly = (
                    cls == "in"
                    or (cls == "fwd" and pg_model in (SEMI_OPEN, CLOSED))
                    or (cls == "rev" and pg_model == CLOSED))
                if op == UNION:
                    keep = not absorbed_by_poly
                elif op == INTERSECTION:
                    keep = absorbed_by_poly or cls == "line"
                else:  # DIFFERENCE
                    keep = not absorbed_by_poly and cls != "line"
                flags.append(keep)
            for arc in _merge_keep_runs(e, segs, flags):
                res.arcs.append(arc)
                kept_eps.add(arc[3])
                kept_eps.add(arc[4])
            if op == INTERSECTION:
                # A proper crossing between two polyline edges is a
                # 0-dimensional intersection, emitted as a degenerate
                # edge from each side (s2boolean_operation_test.d
                # PolylineEdgePolylineEdgeCrossing); PolylineModel is
                # irrelevant because edge interiors are always contained.
                for (t, x, kind, peid) in e.incidences:
                    if kind == "cross" and peid in y_line_eids:
                        res.stubs.append((1, x))
        kept_endpoints_per_line[li] = kept_eps

    for li, line in enumerate(x_index["polylines"]):
        own = _polyline_vertex_set(line, pl_model, lhb)
        kept_eps = kept_endpoints_per_line[li]
        for v in dict.fromkeys(line):  # distinct, input order
            if v not in own or v in kept_eps:
                continue
            if op == UNION:
                emit = not point_in_polygons(v, y_polygons, pg_model)
            elif op == INTERSECTION:
                emit = (point_in_polygons(v, y_polygons, pg_model)
                        or point_in_polylines(v, y_index["polylines"],
                                              pl_model, lhb))
            else:  # DIFFERENCE
                emit = not (point_in_polygons(v, y_polygons, pg_model)
                            or point_in_polylines(v, y_index["polylines"],
                                                  pl_model, lhb))
            if emit:
                res.stubs.append((1, v))

    # ---- dim 2 -----------------------------------------------------------
    x_poly_edges = [e for e in x_edges if e.dim == 2]
    for e in x_poly_edges:
        segs = _segments(e, y_poly_eids)
        flags = []
        for seg in segs:
            cls = _classify_segment(seg, e, y_poly_fwd, {}, y_all_loops)
            if op == UNION:
                keep = (cls == "out"
                        or (cls == "fwd" and side == 0)
                        or (cls == "rev" and pg_model == OPEN))
            elif op == INTERSECTION:
                keep = (cls == "in"
                        or (cls == "fwd" and side == 0)
                        or (cls == "rev" and pg_model == CLOSED))
            else:  # DIFFERENCE (minuend side)
                keep = cls in ("out", "rev")
            flags.append(keep)
        res.arcs.extend(_merge_keep_runs(e, segs, flags))
    return res


def _difference_reversed(x_index, y_index, x_edges, y_edges, options):
    """The subtrahend's contribution to a difference: its dim-2 edge
    portions strictly interior to the minuend, reversed (they become the
    new boundary of the carved-out hole)."""
    res = _HalfResult()
    y_all_loops = [lp for loops in y_index["polygons"] for lp in loops]
    y_poly_edges = [e for e in y_edges if e.dim == 2]
    y_poly_fwd = _shared_lookup(y_poly_edges)
    y_poly_eids = {e.eid for e in y_poly_edges}
    for e in (e for e in x_edges if e.dim == 2):
        segs = _segments(e, y_poly_eids)
        flags = [_classify_segment(seg, e, y_poly_fwd, {},
                                   y_all_loops) == "in" for seg in segs]
        for arc in _merge_keep_runs(e, segs, flags):
            res.arcs.append((arc[0], arc[1], arc[2], arc[3], arc[4], True))
    return res


def _closed_intersection_stubs(a_index, b_index, halves):
    """CLOSED-model polygon/polygon vertex intersections: one degenerate
    dim-2 edge per distinct shared boundary vertex with no kept dim-2
    edge incident (s2boolean_operation_test.d PolygonVertexClosedPolygonVertex)."""
    va = {v for loops in a_index["polygons"] for lp in loops for v in lp}
    vb = {v for loops in b_index["polygons"] for lp in loops for v in lp}
    kept2 = set()
    for h in halves:
        for (e, t0, t1, a, b, rev) in h.arcs:
            if e.dim == 2:
                kept2.add(a)
                kept2.add(b)
    return [(2, v) for v in sorted(va & vb) if v not in kept2]


def _weld_and_snap(halves, all_edges, options):
    """S2Builder-style final pass: sites = output vertices + proper
    crossings between two OUTPUT arcs; split every output arc at interior
    sites, then snap."""
    arcs = []
    for h in halves:
        arcs.extend(h.arcs)
    # coverage map: eid -> list of (t0, t1)
    cover = {}
    for (e, t0, t1, a, b, rev) in arcs:
        cover.setdefault(e.eid, []).append((t0, t1))

    def covered(eid, t):
        return any(t0 - 1e-12 <= t <= t1 + 1e-12
                   for (t0, t1) in cover.get(eid, ()))

    sites = set()
    for (e, t0, t1, a, b, rev) in arcs:
        sites.add(a)
        sites.add(b)
    for h in halves:
        for (dim, v) in h.stubs:
            sites.add(v)
        for p in h.points:
            sites.add(p)
    # crossings where both partner arcs survive
    by_eid = {e.eid: e for e in all_edges}
    for e in all_edges:
        for (t, x, kind, peid) in e.incidences:
            if kind == "cross" and covered(e.eid, t):
                if covered(peid, by_eid[peid].param(x)):
                    sites.add(x)

    snap = options.snap_function
    snapped = {}

    def snap_pt(v):
        if v not in snapped:
            snapped[v] = _pt(snap.snap_point(v)) if snap is not None else v
        return snapped[v]

    out = {0: [], 1: [], 2: []}
    for h in halves:
        for p in h.points:
            out[0].append((snap_pt(p), snap_pt(p)))
        for (dim, v) in h.stubs:
            out[dim].append((snap_pt(v), snap_pt(v)))
    for (e, t0, t1, a, b, rev) in arcs:
        splits = []
        for (t, x, kind, peid) in e.incidences:
            if t0 + 1e-12 < t < t1 - 1e-12 and x in sites and x != a \
                    and x != b:
                splits.append((t, x))
        splits.sort(key=lambda s: s[0])
        chain = [snap_pt(v) for v in
                 [a] + [x for (_, x) in splits] + [b]]
        # merge consecutive identical snapped vertices; an arc that
        # collapses entirely stays as ONE degenerate edge (snapped
        # degeneracies are preserved, s2boolean_operation_test.d
        # PolygonEdgesDegenerateAfterSnapping)
        dedup = [chain[0]]
        for v in chain[1:]:
            if v != dedup[-1]:
                dedup.append(v)
        if len(dedup) == 1:
            dedup = [chain[0], chain[0]]
        pairs = [(dedup[k], dedup[k + 1]) for k in range(len(dedup) - 1)]
        if rev:
            pairs = [(q, p) for (p, q) in reversed(pairs)]
        out[e.dim].extend(pairs)
    return out


def boolean_operation_edges(op, a_index, b_index, options=None):
    """-> {0: [(p,q)...], 1: [...], 2: [...]} directed edge multisets,
    the exact comparison form of the reference test suite."""
    options = options or BooleanOptions()
    a_edges = _collect_edges(a_index, 0)
    b_edges = _collect_edges(b_index, 1)
    all_edges, _ = _record_incidences(a_edges, b_edges,
                                      a_index["points"], b_index["points"])

    if op == SYMMETRIC_DIFFERENCE:
        halves = [
            _half_op(DIFFERENCE, a_index, b_index, a_edges, b_edges,
                     options, 0),
            _difference_reversed(b_index, a_index, b_edges, a_edges,
                                 options),
            _half_op(DIFFERENCE, b_index, a_index, b_edges, a_edges,
                     options, 0),
            _difference_reversed(a_index, b_index, a_edges, b_edges,
                                 options),
        ]
    elif op == DIFFERENCE:
        halves = [
            _half_op(op, a_index, b_index, a_edges, b_edges, options, 0),
            _difference_reversed(b_index, a_index, b_edges, a_edges,
                                 options),
        ]
    else:
        ha = _half_op(op, a_index, b_index, a_edges, b_edges, options, 0)
        hb = _half_op(op, b_index, a_index, b_edges, a_edges, options, 1)
        halves = [ha, hb]

    stubs2 = []
    if op == INTERSECTION and options.polygon_model == CLOSED:
        stubs2 = _closed_intersection_stubs(a_index, b_index, halves)
    if stubs2:
        extra = _HalfResult()
        extra.stubs = stubs2
        halves.append(extra)

    return _weld_and_snap(halves, all_edges, options)


def is_empty(op, a_index, b_index, options=None):
    out = boolean_operation_edges(op, a_index, b_index, options)
    return not (out[0] or out[1] or out[2])
