"""Boundary-constructing boolean operations on S2 polygons — an
"S2Builder-lite" reimplementation of the semantics of
``src/s2/s2polygon.d:766-905`` (initializeToIntersection / Union /
Difference) and ``src/s2/s2boolean_operation.d:228-270``, built on the
robust primitives this repo already has:

  - crossing_sign            (core/predicates.py; s2edge_crossings.d:75)
  - get_intersection         (core/edge_crossings.py; :352-419)
  - parity point-in-polygon  (core/loop.py / core/polygon.py)

Pipeline per operation (the classic crossing-clip construction):
  1. orient every ring interior-on-left (shells CCW, holes CW),
  2. find all A-edge x B-edge crossings (vectorized triage + robust
     confirm) and compute robust intersection points,
  3. split edges at crossings, snap-merging vertices within
     SNAP_RADIUS (replacing S2Builder's snap rounding, adequate for
     the merge radius INTERSECTION_MERGE_RADIUS guarantees),
  4. classify each sub-edge by its midpoint against the other polygon
     and keep/reverse per the operation's rule (shared boundary
     sub-edges handled by directed-key matching),
  5. assemble loops by walking the directed graph (leftmost-turn rule
     at junction vertices), dropping degenerate slivers.

Unlike the reference this does not build a full S2Builder Graph/Layer
stack; it targets the reference test identities (A∪B ⊇ A, A∩B ⊆ A,
area inclusion-exclusion) and the Bug1..Bug3 degenerate regressions.
At dataset scale these ops run per-row inside map_batches (each row a
small polygon pair), so the scalar assembly here is not a hot path.
"""

from __future__ import annotations

import math

import numpy as np

from .edge_crossings import INTERSECTION_MERGE_RADIUS, get_intersection
from .loop import Loop
from .measures import loop_signed_area
from .polygon import Polygon
from .predicates import MAX_DET_ERROR, crossing_sign

SNAP_RADIUS = max(1e-13, 4 * INTERSECTION_MERGE_RADIUS)


class _SnapMap:
    """Merges points within SNAP_RADIUS into canonical representatives
    (grid-bucket hash, 27-neighborhood probe)."""

    def __init__(self, radius=SNAP_RADIUS):
        self.r = radius
        self.cell = 2.0 * radius
        self.buckets: dict[tuple, list[int]] = {}
        self.points: list[np.ndarray] = []

    def _key(self, p):
        return (int(math.floor(p[0] / self.cell)),
                int(math.floor(p[1] / self.cell)),
                int(math.floor(p[2] / self.cell)))

    def snap(self, p) -> int:
        p = np.asarray(p, dtype=np.float64)
        kx, ky, kz = self._key(p)
        r2 = self.r * self.r
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                for dz in (0, -1, 1):
                    for idx in self.buckets.get((kx + dx, ky + dy, kz + dz),
                                                ()):
                        d = self.points[idx] - p
                        if float(d @ d) <= r2:
                            return idx
        idx = len(self.points)
        self.points.append(p)
        self.buckets.setdefault((kx, ky, kz), []).append(idx)
        return idx


def _oriented_rings(poly: Polygon):
    """Rings as (n,3) arrays directed interior-on-left: shells (even
    depth) CCW (signed area > 0), holes (odd depth) CW."""
    rings = []
    for lp in poly.loops:
        v = lp.vertices
        s = loop_signed_area(v)
        if abs(s) >= 2.0 * math.pi - 1e-9:
            # Half-sphere ring: the area sign does not indicate which
            # side is enclosed — trust the stored orientation (Loop
            # convention: interior on the left; fixture hemispheres are
            # always shells, constructed rings arrive region-on-left).
            rings.append(np.asarray(v, dtype=np.float64))
            continue
        want_ccw = (lp.depth % 2) == 0
        if (s < 0) == want_ccw:
            v = v[::-1]
        rings.append(np.asarray(v, dtype=np.float64))
    return rings


def _edges_of(rings):
    """Flat arrays (a0, a1) of directed ring edges."""
    starts = []
    ends = []
    for v in rings:
        starts.append(v)
        ends.append(np.roll(v, -1, axis=0))
    return np.concatenate(starts), np.concatenate(ends)


def _crossing_pairs(a0, a1, b0, b1):
    """Indices (i, j) of properly-crossing edge pairs: vectorized
    4-sign triage prefilter, robust scalar confirmation."""
    na = np.cross(a0, a1)                      # (nA,3)
    nb = np.cross(b0, b1)                      # (nB,3)
    s_b0 = na @ b0.T                           # (nA,nB) sign(a0,a1,b0)
    s_b1 = na @ b1.T
    s_a0 = (nb @ a0.T).T
    s_a1 = (nb @ a1.T).T
    e = MAX_DET_ERROR
    # clearly no crossing: both endpoints of one edge strictly on the
    # same side of the other edge's great circle
    no = (((s_b0 > e) & (s_b1 > e)) | ((s_b0 < -e) & (s_b1 < -e))
          | ((s_a0 > e) & (s_a1 > e)) | ((s_a0 < -e) & (s_a1 < -e)))
    cand = np.nonzero(~no)
    out = []
    for i, j in zip(cand[0].tolist(), cand[1].tolist()):
        if crossing_sign(tuple(a0[i]), tuple(a1[i]),
                         tuple(b0[j]), tuple(b1[j])) > 0:
            out.append((i, j))
    return out


def _split_edges(e0, e1, cross_pts, snap: _SnapMap):
    """Subdivide each directed edge at its crossing points (ordered along
    the edge); returns list of (u, v) snapped-vertex-id sub-edges with
    degenerate (u == v) pieces dropped."""
    sub = []
    for k in range(len(e0)):
        a, b = e0[k], e1[k]
        pts = cross_pts.get(k, [])
        if pts:
            d = b - a
            t = np.array([float((np.asarray(p) - a) @ d) for p in pts])
            pts = [pts[i] for i in np.argsort(t, kind="stable")]
        chain = [a] + list(pts) + [b]
        ids = [snap.snap(p) for p in chain]
        for u, v in zip(ids[:-1], ids[1:]):
            if u != v:
                sub.append((u, v))
    return sub


def _midpoint(p, q):
    m = p + q
    n = np.linalg.norm(m)
    if n < 1e-300:
        return p
    return m / n


def _classify(sub, snap, other: Polygon):
    """For each sub-edge, True if its midpoint is inside `other`."""
    if not sub:
        return np.zeros(0, dtype=bool)
    mids = np.stack([_midpoint(snap.points[u], snap.points[v])
                     for u, v in sub])
    return other.contains_points(mids)


def _assemble(edges, snap):
    """Walk directed sub-edges into closed rings (leftmost-turn at
    junctions).  Unclosable chains (degenerate slivers) are dropped,
    mirroring S2Builder's discard of sliver loops."""
    out_map: dict[int, list[int]] = {}
    for idx, (u, v) in enumerate(edges):
        out_map.setdefault(u, []).append(idx)
    used = [False] * len(edges)
    rings = []
    for start_idx in range(len(edges)):
        if used[start_idx]:
            continue
        chain = [start_idx]
        used[start_idx] = True
        u0 = edges[start_idx][0]
        cur = edges[start_idx][1]
        prev = edges[start_idx][0]
        ok = True
        while cur != u0:
            cands = [i for i in out_map.get(cur, []) if not used[i]]
            # drop immediate backtracks unless forced
            fwd = [i for i in cands if edges[i][1] != prev] or cands
            if not fwd:
                ok = False
                break
            if len(fwd) == 1:
                nxt = fwd[0]
            else:
                # leftmost turn: maximize CCW turn angle from incoming
                pin = snap.points[prev]
                pc = snap.points[cur]
                nrm = np.cross(pin, pc)

                def turn(i):
                    po = snap.points[edges[i][1]]
                    s = float(nrm @ po)               # left(+) / right(-)
                    c = float((po - pc) @ (pc - pin))
                    return math.atan2(s, c)
                nxt = max(fwd, key=turn)
            used[nxt] = True
            chain.append(nxt)
            prev = cur
            cur = edges[nxt][1]
            if len(chain) > len(edges):
                ok = False
                break
        if ok and len(chain) >= 3:
            rings.append(np.stack([snap.points[edges[i][0]]
                                   for i in chain]))
    return rings


def _rings_to_polygon(rings):
    """Interior-on-left rings -> repo Polygon (parity containment makes
    depth bookkeeping unnecessary; CW rings are holes by area sign).

    Sliver rings whose mean width (|area| / perimeter) is below the
    snap radius are discarded — the reference's vertex_merge_radius
    collapses such needles during snapping (s2polygon.d:747,
    s2polygon_test.d 'incredibly thin triangle' case)."""
    loops = []
    for v in rings:
        if len(v) < 3:
            continue
        area = loop_signed_area(v)
        nxt = np.roll(v, -1, axis=0)
        d = np.linalg.norm(nxt - v, axis=1)
        perimeter = float((2.0 * np.arcsin(
            np.minimum(1.0, 0.5 * d))).sum())
        if abs(area) < SNAP_RADIUS * max(perimeter, 1e-30):
            continue
        depth = 0 if area >= 0 else 1
        loops.append(Loop(v, depth=depth))
    if not loops:
        return None
    return Polygon(loops)


def _dedup_directed(sub):
    """Collapse exact duplicate directed sub-edges, and remove
    matched opposite-direction pairs (degenerate zero-width seams)."""
    from collections import Counter
    cnt = Counter(sub)
    out = []
    for (u, v), n in cnt.items():
        n_op = cnt.get((v, u), 0)
        keep = n - min(n, n_op)
        if keep == 0 and n > 0 and n == n_op and (u < v):
            pass  # fully cancelled seam
        out.extend([(u, v)] * keep)
    return out


def _vertex_on_edge_splits(e0, e1, verts, cross, snap_r=SNAP_RADIUS):
    """Add split points where a vertex of the OTHER polygon lies on an
    edge's interior (within snap_r): T-junction / hanging-node handling.
    Without this, unions of tile-wise pieces whose shared borders are
    subdivided differently (e.g. a level-6 cell bordering two level-7
    cells) leave uncancelled seam edges and drop area — S2Builder
    resolves the same case by snapping edges through nearby sites."""
    from .edge import edge_distances2
    if len(verts) == 0 or len(e0) == 0:
        return False
    d2 = edge_distances2(verts, e0, e1)
    lim = (2.0 * math.sin(min(math.pi / 2, snap_r / 2))) ** 2
    vi, ei = np.nonzero(d2 <= lim)
    added = False
    for v_idx, k in zip(vi.tolist(), ei.tolist()):
        p = verts[v_idx]
        if float(((p - e0[k]) ** 2).sum()) <= lim \
                or float(((p - e1[k]) ** 2).sum()) <= lim:
            continue  # endpoint coincidence, not a T-junction
        cross.setdefault(k, []).append(np.asarray(p, dtype=np.float64))
        added = True
    return added


def _shares_vertices(a0, b0):
    """True if any vertex of a coincides with a vertex of b under
    snap-radius merging.  Polygons that touch at shared vertices (or
    shared edges) can overlap without any PROPER edge crossing — the
    fast containment path is unsound for them."""
    snap = _SnapMap()
    na = {snap.snap(p) for p in a0}
    return any(snap.snap(p) in na for p in b0)


def _compare_loops(a: Loop, b: Loop) -> int:
    """Deterministic loop order for the invert() tiebreak
    (s2polygon.d:2209-2230 compareLoops semantics: vertex count first,
    then a canonical vertex walk — simplified here to lexicographic
    vertex comparison, which is equally deterministic and only engaged
    when two depth-0 loops have bit-identical turning angles)."""
    if len(a.vertices) != len(b.vertices):
        return len(a.vertices) - len(b.vertices)
    av = a.vertices.ravel().tolist()
    bv = b.vertices.ravel().tolist()
    return (av > bv) - (av < bv)


def initialize_to_complement(a: Polygon) -> Polygon:
    """S2Polygon.initializeToComplement (s2polygon.d:1069-1135):
    inverting the largest-area depth-0 loop (smallest turning angle)
    inverts the polygon; its former descendants lose one depth, all
    other loops gain one and become descendants of the inverted loop."""
    if getattr(a, "is_full", False):
        return Polygon.init_nested([])           # ~full = empty
    if a.is_empty():
        return Polygon.full()
    loops = [lp.clone() for lp in a.loops]
    best = 0
    best_angle = None
    for i in range(1, len(loops)):
        if loops[i].depth == 0:
            if best_angle is None:
                best_angle = loops[best].get_turning_angle()
            ang = loops[i].get_turning_angle()
            if ang < best_angle or (ang == best_angle and
                                    _compare_loops(loops[i],
                                                   loops[best]) < 0):
                best, best_angle = i, ang
    last_best = best
    while (last_best + 1 < len(loops)
           and loops[last_best + 1].depth > loops[best].depth):
        last_best += 1
    loops[best].invert()
    new_loops = [loops[best]]
    for i in range(len(loops)):
        if i < best or i > last_best:
            loops[i].depth += 1
            new_loops.append(loops[i])
    for i in range(best + 1, last_best + 1):
        loops[i].depth -= 1
        new_loops.append(loops[i])
    return Polygon(new_loops)


def boolean_op(op: str, a: Polygon, b: Polygon):
    """op in {'union','intersection','difference'}; returns a Polygon or
    None (empty result).  Semantics follow s2polygon.d:766-905."""
    assert op in ("union", "intersection", "difference")
    # Whole-sphere operands (s2polygon.d: the full polygon): identity /
    # absorbing element.  difference(full, x) routes through
    # initialize_to_complement.
    if getattr(a, "is_full", False) or getattr(b, "is_full", False):
        if op == "union":
            return Polygon.full()
        if op == "intersection":
            return b if getattr(a, "is_full", False) else a
        if getattr(b, "is_full", False):      # difference: a \ full = 0
            return None
        out = initialize_to_complement(b)     # full \ x = ~x
        return None if out.is_empty() else out
    ra = _oriented_rings(a)
    rb = _oriented_rings(b)
    a0, a1 = _edges_of(ra)
    b0, b1 = _edges_of(rb)
    pairs = _crossing_pairs(a0, a1, b0, b1)

    if not pairs and (_shares_vertices(a0, b0)
                      or _vertex_on_edge_splits(a0, a1, b0, {})
                      or _vertex_on_edge_splits(b0, b1, a0, {})):
        # Adjacent/touching polygons (shared vertices or edges, no
        # proper crossings — e.g. two triangles sharing an edge, or the
        # reference's cross/overlap fixtures that meet only at shared
        # vertices): the fast containment path below cannot see the
        # overlap; fall through to the split/classify/assemble path,
        # whose reversed-seam pre-cancellation handles shared edges.
        pairs = []
        force_main = True
    else:
        force_main = False

    if not pairs and not force_main:
        # no proper crossings: decide by containment of representatives
        a_in_b = b.contains_point(tuple(a0[0]))
        b_in_a = a.contains_point(tuple(b0[0]))
        if op == "union":
            if a_in_b:
                return b
            if b_in_a:
                return a
            return Polygon(list(a.loops) + list(b.loops))
        if op == "intersection":
            if a_in_b:
                return a
            if b_in_a:
                return b
            return None
        # difference
        if a_in_b:
            return None
        if b_in_a:
            # b's rings become holes of a (parity containment)
            return Polygon(list(a.loops)
                           + [Loop(v, depth=1) for v in rb])
        return a

    snap = _SnapMap()
    cross_a: dict[int, list] = {}
    cross_b: dict[int, list] = {}
    for i, j in pairs:
        x = get_intersection(a0[i], a1[i], b0[j], b1[j])
        cross_a.setdefault(i, []).append(x)
        cross_b.setdefault(j, []).append(x)
    # T-junctions: split edges at the other polygon's on-edge vertices
    _vertex_on_edge_splits(a0, a1, b0, cross_a)
    _vertex_on_edge_splits(b0, b1, a0, cross_b)
    sub_a = _split_edges(a0, a1, cross_a, snap)
    sub_b = _split_edges(b0, b1, cross_b, snap)

    if op in ("union", "intersection"):
        # Pre-cancel matched reversed-shared sub-edges (adjacency
        # seams): their midpoints lie ON the other boundary, so
        # midpoint classification is arbitrary and could keep exactly
        # one of the pair, leaving a dangling seam in the assembly.
        # A seam bounds neither the union nor the intersection.
        from collections import Counter
        ca = Counter(sub_a)
        cb = Counter(sub_b)
        for e in list(ca):
            rev = (e[1], e[0])
            k = min(ca[e], cb.get(rev, 0))
            if k:
                ca[e] -= k
                cb[rev] -= k
        sub_a = list(ca.elements())
        sub_b = list(cb.elements())

    in_b = _classify(sub_a, snap, b)
    in_a = _classify(sub_b, snap, a)

    set_b = set(sub_b)
    set_b_rev = set((v, u) for u, v in sub_b)
    kept: list[tuple[int, int]] = []
    if op == "union":
        for e, inside in zip(sub_a, in_b):
            if not inside or e in set_b:
                kept.append(e)
        set_a = set(sub_a)
        for e, inside in zip(sub_b, in_a):
            if not inside and e not in set_a:
                kept.append(e)
    elif op == "intersection":
        for e, inside in zip(sub_a, in_b):
            if inside or e in set_b:
                kept.append(e)
        set_a = set(sub_a)
        for e, inside in zip(sub_b, in_a):
            if inside and e not in set_a:
                kept.append(e)
    else:  # difference: A \ B
        for e, inside in zip(sub_a, in_b):
            if not inside and e not in set_b:
                kept.append(e)
            elif e in set_b_rev:
                kept.append(e)
        for (u, v), inside in zip(sub_b, in_a):
            if inside and (v, u) not in set(sub_a):
                kept.append((v, u))

    kept = _dedup_directed(kept)
    rings = _assemble(kept, snap)
    result = _rings_to_polygon(rings)
    if result is None and op != "intersection":
        # Degenerate inputs (sliver loops below the snap radius — the
        # reference Bug1..Bug3 class): no assemblable boundary survives.
        # Union/difference of non-empty inputs must stay non-empty; fall
        # back to the containment-based combination (exact for the
        # sliver cases, where the crossings were all snap-artifacts).
        a_in_b = b.contains_point(tuple(a0[0]))
        b_in_a = a.contains_point(tuple(b0[0]))
        if op == "union":
            if a_in_b:
                return b
            if b_in_a:
                return a
            return Polygon(list(a.loops) + list(b.loops))
        if a_in_b:  # difference
            return None
        return a
    return result


def _maybe_snap(result, snap_function):
    if result is None or snap_function is None:
        return result
    return initialize_to_snapped(result, snap_function=snap_function)


def boolean_union(a, b, snap_function=None):
    """s2polygon.d initializeToUnion (optional snap function applied to
    the constructed boundary, e.g. IntLatLngSnapFunction(0) for E0)."""
    return _maybe_snap(boolean_op("union", a, b), snap_function)


def boolean_intersection(a, b, snap_function=None):
    """s2polygon.d initializeToIntersection(+SnapFunction)."""
    return _maybe_snap(boolean_op("intersection", a, b), snap_function)


def boolean_difference(a, b, snap_function=None):
    """s2polygon.d initializeToDifference(+SnapFunction)."""
    return _maybe_snap(boolean_op("difference", a, b), snap_function)


def boolean_symmetric_difference(a, b):
    """s2polygon.d initializeToSymmetricDifference, by composition:
    (A \\ B) union (B \\ A)."""
    ab = boolean_difference(a, b)
    ba = boolean_difference(b, a)
    if ab is None:
        return ba
    if ba is None:
        return ab
    return boolean_union(ab, ba)


def destructive_union(polygons):
    """n-way union (s2polygon.d destructiveUnion semantics): repeatedly
    merge the two smallest polygons (by vertex count) — the reference's
    priority-queue strategy, which keeps intermediate results small.
    Returns a Polygon or None (empty input)."""
    import heapq
    heap = []
    for k, p in enumerate(polygons):
        if p is not None:
            n = sum(len(lp.vertices) for lp in p.loops)
            heapq.heappush(heap, (n, k, p))
    if not heap:
        return None
    serial = len(heap)
    while len(heap) > 1:
        _, _, a = heapq.heappop(heap)
        _, _, b = heapq.heappop(heap)
        u = boolean_union(a, b)
        if u is None:
            continue
        n = sum(len(lp.vertices) for lp in u.loops)
        heapq.heappush(heap, (n, serial, u))
        serial += 1
    return heap[0][2] if heap else None


def _polygon_perimeter(poly) -> float:
    total = 0.0
    for lp in poly.loops:
        v = lp.vertices
        nxt = np.roll(v, -1, axis=0)
        d = np.linalg.norm(nxt - v, axis=1)
        total += float((2.0 * np.arcsin(np.minimum(1.0, 0.5 * d))).sum())
    return total


def _area_tol(a, b) -> float:
    """Area uncertainty of a constructed boolean result: snap noise
    sweeps at most ~snap_radius along every boundary edge, so the
    tolerance scales with total perimeter — tight enough to resolve
    the reference's 2.7e-12 sr pole triangles, loose enough for
    hemisphere-scale fixtures whose perimeter-driven noise is ~1e-12."""
    per = _polygon_perimeter(a) + _polygon_perimeter(b)
    return max(1e-14, 4.0 * SNAP_RADIUS * per)


def contains_polygon(a, b) -> bool:
    """a ⊇ b (s2polygon.d contains(S2Polygon)): evaluated through the
    constructed intersection — a contains b iff area(a ∩ b) == area(b)
    up to the snap tolerance.  None means the empty polygon."""
    if b is None:
        return True
    if a is None:
        return False
    if getattr(a, "is_full", False):
        return True
    if getattr(b, "is_full", False):
        return False
    area_b = polygon_area(b)
    inter = boolean_intersection(a, b)
    area_i = polygon_area(inter) if inter is not None else 0.0
    return area_i >= area_b - _area_tol(a, b)


def intersects_polygon(a, b) -> bool:
    """Interiors of a and b intersect (s2polygon.d intersects)."""
    if a is None or b is None:
        return False
    if getattr(a, "is_full", False) or getattr(b, "is_full", False):
        return True
    inter = boolean_intersection(a, b)
    return inter is not None and polygon_area(inter) > _area_tol(a, b)


def polygon_area(poly) -> float:
    """Steradian area of a parity polygon: (sum of the rings' LEFT-side
    areas) mod 4*pi.  The left-area of an interior-on-left ring is
    s if s >= 0 else s + 4*pi; the mod identity holds for any xor
    composition (shell+hole doughnut: A + (4*pi - h) ≡ A - h), and
    unlike a raw signed sum it is correct for hemisphere rings whose
    fan integral returns s = -2*pi for a +2*pi left interior."""
    if poly is None:
        return 0.0
    if getattr(poly, "is_full", False):
        return 4.0 * math.pi
    total = 0.0
    for v in _oriented_rings(poly):
        s = loop_signed_area(v)
        total += s if s >= 0 else s + 4.0 * math.pi
    r = math.fmod(total, 4.0 * math.pi)
    if r < 0:
        r += 4.0 * math.pi
    if r > 4.0 * math.pi - 1e-9:
        r = 0.0
    return float(r)


def initialize_to_snapped(polygon, snap_function=None, snap_level=None):
    """Snap-rounded copy of a polygon (s2polygon.d initializeToSnapped):
    runs the boundary through the S2Builder-lite pipeline with the given
    snap function (or CellIdSnapFunction at snap_level)."""
    from .builder import Builder, CellIdSnapFunction, IdentitySnapFunction
    if snap_function is None:
        snap_function = CellIdSnapFunction(snap_level) \
            if snap_level is not None else IdentitySnapFunction(0.0)
    b = Builder(snap_function)
    b.add_polygon(polygon)
    return b.build_polygon()


def initialize_to_simplified(polygon, tolerance_rad):
    """Simplified copy (s2polygon.d initializeToSimplified shape):
    per-ring spherical Douglas-Peucker, then reassembly through the
    builder so degenerate rings drop out."""
    import numpy as np

    from .builder import Builder, IdentitySnapFunction
    from .snap import simplify_polyline
    b = Builder(IdentitySnapFunction(0.0))
    for lp in polygon.loops:
        v = lp.vertices
        closed = np.concatenate([v, v[:1]])
        keep_idx = simplify_polyline(closed, tolerance_rad)  # indices
        ring = closed[keep_idx][:-1]
        if len(ring) >= 3:
            b.add_loop(ring)
    return b.build_polygon()


def _clip_polyline(polygon, vertices, keep_inside):
    """Split a polyline at polygon-boundary crossings and keep the
    pieces whose midpoints are inside (keep_inside) or outside the
    polygon — s2polygon.d:1206-1254 intersectWithPolyline /
    subtractFromPolyline semantics (snap-free form: crossings are
    robust get_intersection points).  Returns a list of (n,3) arrays."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) < 2:
        return []
    rings = _oriented_rings(polygon)
    b0, b1 = _edges_of(rings)
    out = []
    cur: list[np.ndarray] = [v[0]]
    for k in range(len(v) - 1):
        a, c = v[k], v[k + 1]
        # crossing points of segment (a, c) with all polygon edges
        pairs = _crossing_pairs(a[None, :], c[None, :], b0, b1)
        pts = [get_intersection(a, c, b0[j], b1[j]) for (_, j) in pairs]
        if pts:
            d = c - a
            order = np.argsort([float((p - a) @ d) for p in pts],
                               kind="stable")
            pts = [pts[i] for i in order]
        chain = [a] + pts + [c]
        for u, w in zip(chain[:-1], chain[1:]):
            inside = bool(polygon.contains_point(tuple(_midpoint(u, w))))
            if inside == keep_inside:
                if not np.array_equal(cur[-1], u):
                    if len(cur) >= 2:
                        out.append(np.stack(cur))
                    cur = [u]
                cur.append(w)
            else:
                if len(cur) >= 2:
                    out.append(np.stack(cur))
                cur = [w]
    if len(cur) >= 2:
        out.append(np.stack(cur))
    return out


def intersect_with_polyline(polygon, vertices):
    """Pieces of the polyline inside the polygon
    (s2polygon.d intersectWithPolyline)."""
    return _clip_polyline(polygon, vertices, keep_inside=True)


def subtract_from_polyline(polygon, vertices):
    """Pieces of the polyline outside the polygon
    (s2polygon.d subtractFromPolyline)."""
    return _clip_polyline(polygon, vertices, keep_inside=False)


def _cell_edge_incidence_mask(cell, p, tolerance_uv):
    """s2polygon.d:2279-2293 getCellEdgeIncidenceMask: which of the
    cell's four uv edges the point lies on, to within tolerance_uv.
    Bit i corresponds to S2Cell.edge(i): 1=v_lo, 2=u_hi, 4=v_hi,
    8=u_lo.  Returns 0 when p projects outside the cell's face."""
    from .coords import valid_face_xyz_to_uv
    comp = (float(p[0]), float(p[1]), float(p[2]))[cell.face % 3]
    if (comp <= 0) if cell.face < 3 else (comp >= 0):
        return 0
    u, v = valid_face_xyz_to_uv(cell.face, float(p[0]), float(p[1]),
                                float(p[2]))
    mask = 0
    if abs(v - cell.v_lo) <= tolerance_uv:
        mask |= 1
    if abs(u - cell.u_hi) <= tolerance_uv:
        mask |= 2
    if abs(v - cell.v_hi) <= tolerance_uv:
        mask |= 4
    if abs(u - cell.u_lo) <= tolerance_uv:
        mask |= 8
    return mask


def _extract_chain_polyline(g, lo, hi):
    """Recover one interior chain's snapped+simplified polyline from
    the builder graph by its input-edge id range [lo, hi) — the
    equivalent of the reference's one-S2PolylineLayer-per-chain
    bookkeeping (s2polygon.d:2150-2155: each interior polyline is in
    its own layer to keep edges in sequence)."""
    ents = []
    for (u, v), ids in zip(g.edges, g.input_edge_ids):
        fl = ids if isinstance(ids, list) else [ids]
        fl = [i for i in fl if lo <= i < hi]
        if fl:
            ents.append((min(fl), u, v))
    if not ents:
        return None
    # stable: equal-id edges (one routed input edge -> several graph
    # edges) keep their graph order, which follows the walk order
    ents.sort(key=lambda t: t[0])
    seq = [ents[0][1]]
    for _, u, v in ents:
        if v != seq[-1]:
            seq.append(v)
    if len(seq) < 2:
        return None
    return g.vertices[np.array(seq)]


def simplify_edges_in_cell(polygon, cell, tolerance_uv, snap_radius_rad):
    """s2polygon.d:2146-2198 simplifyEdgesInCell: split each loop into
    boundary edges (both endpoints on the cell's uv boundary — passed
    through unchanged, endpoints forced) and maximal interior chains
    (simplified by the builder at snap_radius; endpoints that touch
    the cell boundary are forced so they keep connecting to boundary
    edges).  Returns a list of (n,3) polylines."""
    from .builder import Builder, IdentitySnapFunction
    b = Builder(IdentitySnapFunction(snap_radius_rad),
                simplify_edge_chains=True)
    boundary = []
    chains = []
    n_edges = 0
    for ring in _oriented_rings(polygon):
        v = np.asarray(ring, dtype=np.float64)
        n = len(v)
        masks = [_cell_edge_incidence_mask(cell, v[k], tolerance_uv)
                 for k in range(n)]
        in_interior = False
        lo = None
        for j in range(n):
            a, c = v[j], v[(j + 1) % n]
            m0, m1 = masks[j], masks[(j + 1) % n]
            if m0 & m1:
                # boundary edge: unchanged, vertices pinned
                if in_interior:
                    chains.append((lo, n_edges))
                    in_interior = False
                b.force_vertex(c)
                boundary.append(np.stack([a, c]))
            else:
                if not in_interior:
                    lo = n_edges
                    in_interior = True
                b.add_edge(a, c)
                n_edges += 1
                if m1:
                    b.force_vertex(c)
                    chains.append((lo, n_edges))
                    in_interior = False
        if in_interior:
            chains.append((lo, n_edges))
    g = b.build_graph()
    out = list(boundary)
    for lo, hi in chains:
        pl = _extract_chain_polyline(g, lo, hi)
        if pl is not None:
            out.append(pl)
    return out


def initialize_to_simplified_in_cell(polygon, cell, snap_radius_rad,
                                     boundary_tolerance_rad=1e-15):
    """s2polygon.d:993-1060 initializeToSimplifiedInCell: simplify a
    polygon that was previously clipped to `cell`, preserving edges and
    vertices on the cell boundary so that per-cell results from a tiled
    decomposition still line up exactly along shared cell borders.

    Two passes: (1) simplify only the interior edge chains with
    forced endpoints on the cell boundary; (2) reassemble all
    polylines at INTERSECTION_ERROR snap radius (sibling seams cancel,
    degenerate strips vanish)."""
    from .builder import Builder, IdentitySnapFunction
    from .edge_crossings import INTERSECTION_ERROR
    tolerance_uv = math.sqrt(6.0) * float(boundary_tolerance_rad)
    polylines = simplify_edges_in_cell(polygon, cell, tolerance_uv,
                                       snap_radius_rad)
    b = Builder(IdentitySnapFunction(INTERSECTION_ERROR), idempotent=False)
    for pl in polylines:
        b.add_polyline(pl)
    return b.build_polygon()
