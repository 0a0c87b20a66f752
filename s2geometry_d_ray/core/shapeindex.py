"""Static polygon shape index: cell -> edge bucket + contains_center.

Plays the role of the reference's MutableS2ShapeIndex
(src/s2/mutable_s2shape_index.d:133-155; ~10 edges per cell,
contains_center tracked per cell) for the point-in-polygon fast path
(s2contains_point_query.d:147-203): locate the query point's index cell,
then count crossings of the segment (cell center -> point) against only
that cell's edges, XOR the cell's contains_center flag.

Correctness relies on two facts:
  - S2 cells are geodesically convex (intersection of 4 half-spaces), so
    the segment from the cell center to a point in the cell stays inside
    the cell; any edge it crosses is in the cell's (superset) bucket.
  - An edge indexed at level L is shorter than the minimum cell width at
    L; such an edge can only touch cells within the 3x3 neighborhoods of
    its endpoints' level-L cells, which is how buckets are built
    (conservative superset, then distance-pruned).

LONG-EDGE RULE (mutable_s2shape_index.d:64-75): the anchor level is
chosen from edge DENSITY alone; each edge is then bucketed at the finest
level (<= anchor) whose min-width exceeds its own length.  One
continent-length edge therefore lands in a handful of coarse cells
instead of forcing the whole index coarse: a query unions the buckets of
the point's ancestor cell at every populated level, so fine fractal
detail keeps fine buckets regardless of outliers.

Points whose anchor-level cell holds no fine edges but may see coarse
edges get their parity base (anchor-center containment) computed lazily,
batched per unique anchor cell.  Build cost is one vectorized full PIP
over the bucket cell centers.
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from .cell import Cell
from .metrics import MIN_WIDTH
from .predicates import MAX_DET_ERROR, edge_or_vertex_crossing

MAX_EDGES_PER_CELL = 10  # default of the reference (mutable_s2shape_index.d:43)


class PolygonShapeIndex:
    """Immutable multi-level edge-bucket index over all loops of one
    polygon (long-edge rule: see module docstring)."""

    __slots__ = ("polygon", "level", "levels", "cells_by_level",
                 "offsets_by_level", "edge_ids_by_level", "cells",
                 "offsets", "edge_ids", "centers", "contains_center",
                 "edge_a", "edge_b", "edge_n", "n_edges",
                 "edge_mid", "edge_half_ang", "_last_edges_evaluated",
                 "_bucket_tab")

    def __init__(self, polygon, max_edges_per_cell=MAX_EDGES_PER_CELL):
        self.polygon = polygon
        # Flatten all loop edges into parallel arrays.
        a_list, b_list, n_list = [], [], []
        for lp in polygon.loops:
            a_list.append(lp.vertices)
            b_list.append(lp._next)
            n_list.append(lp._edge_normals)
        self.edge_a = np.concatenate(a_list)
        self.edge_b = np.concatenate(b_list)
        self.edge_n = np.concatenate(n_list)
        self.n_edges = len(self.edge_a)
        _build_edge_buckets(self, max_edges_per_cell)
        if len(self.cells):
            # ci.to_xyz is bit-identical to Cell.center() per cell
            # (same si/ti-midpoint + normalize chain), vectorized.
            self.centers = np.stack(ci.to_xyz(self.cells), axis=1)
            # Exact containment of every anchor bucket-cell center (one
            # vectorized full PIP — the InteriorTracker equivalent).
            self.contains_center = polygon.contains_points(self.centers)
        else:
            self.centers = np.empty((0, 3))
            self.contains_center = np.zeros(0, dtype=bool)


    def _bucket_union(self, anchor_cell):
        """Union of edge ids from every populated level's bucket of the
        given anchor-level cell's ancestor chain."""
        out = []
        for lvl in self.levels:
            cells = self.cells_by_level[lvl]
            if not len(cells):
                continue
            c = ci.parent(np.uint64(anchor_cell), lvl) \
                if lvl < self.level else np.uint64(anchor_cell)
            k = int(np.searchsorted(cells, c))
            if k < len(cells) and cells[k] == c:
                offs = self.offsets_by_level[lvl]
                out.append(self.edge_ids_by_level[lvl][offs[k]:offs[k + 1]])
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(out))

    # ------------------------------------------------------------------
    def contains_points(self, points, leaf_cells=None):
        """Exact PIP via the index; identical results to
        polygon.contains_points (the brute path)."""
        pts = np.asarray(points, dtype=np.float64)
        m = len(pts)
        if m == 0:
            return np.zeros(0, dtype=bool)
        if leaf_cells is None:
            leaf_cells = ci.cellid_from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
        lcell = ci.parent(np.asarray(leaf_cells, dtype=np.uint64),
                          self.level)
        out = np.zeros(m, dtype=bool)
        # Group points by anchor cell.
        order = np.argsort(lcell, kind="stable")
        sc = lcell[order]
        starts = np.nonzero(np.concatenate([[True], sc[1:] != sc[:-1]]))[0]
        ends = np.append(starts[1:], m)
        uniq = sc[starts]
        # Parity bases: precomputed for anchor bucket cells, lazily
        # batch-computed for anchors only coarse (long) edges touch.
        base = np.zeros(len(uniq), dtype=bool)
        if len(self.cells):
            pos = np.minimum(np.searchsorted(self.cells, uniq),
                             len(self.cells) - 1)
            known = self.cells[pos] == uniq
            base[known] = self.contains_center[pos[known]]
        else:
            known = np.zeros(len(uniq), dtype=bool)
        centers = np.empty((len(uniq), 3))
        if known.any():
            centers[known] = self.centers[pos[known]]
        unknown = ~known
        if unknown.any():
            # ci.to_xyz == Cell.center() bit-for-bit, vectorized.
            centers[unknown] = np.stack(ci.to_xyz(uniq[unknown]), axis=1)
            base[unknown] = self.polygon.contains_points(centers[unknown])
        for k, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
            rows = order[s:e]
            eids = self._bucket_union(uniq[k])
            out[rows] = self._parity(pts[rows], centers[k], bool(base[k]),
                                     eids)
        return out

    def boundary_distance2_brute(self, points, chunk=8192):
        """Min squared chord distance from each point to the polygon
        boundary, brute-vectorized over all edges (conformance baseline
        and the fast path for small polygons)."""
        from .edge import edge_distances2
        pts = np.asarray(points, dtype=np.float64)
        out = np.empty(len(pts))
        for s in range(0, len(pts), chunk):
            out[s:s + chunk] = edge_distances2(
                pts[s:s + chunk], self.edge_a, self.edge_b).min(axis=1)
        return out

    # Below this edge count brute force wins (reference
    # s2closest_edge_query.d MAX_BRUTE_FORCE_INDEX_SIZE ballpark).
    MAX_BRUTE_FORCE_EDGES = 96

    def boundary_distance2(self, points, chunk=8192):
        """Min squared chord distance from each point to the polygon
        boundary — best-first search over the implicit cell tree above
        the per-level bucket arrays (the S2ClosestEdgeQuery algorithm,
        s2closest_edge_query_base.d:380-750): subtrees whose cells are
        farther than the current best are pruned, giving query time
        sublinear in edge count."""
        pts = np.asarray(points, dtype=np.float64)
        if self.n_edges <= self.MAX_BRUTE_FORCE_EDGES or not self.levels:
            return self.boundary_distance2_brute(pts, chunk)
        out = np.empty(len(pts))
        for i in range(len(pts)):
            out[i] = self._closest_edge_one(pts[i])[0]
        return out

    def closest_edge(self, p):
        """(distance2, edge_id) of the boundary edge closest to p."""
        if self.n_edges <= self.MAX_BRUTE_FORCE_EDGES or not self.levels:
            from .edge import edge_distances2
            d2 = edge_distances2(np.asarray(p, dtype=np.float64)[None, :],
                                 self.edge_a, self.edge_b)[0]
            k = int(d2.argmin())
            return float(d2[k]), k
        return self._closest_edge_one(np.asarray(p, dtype=np.float64))

    def _subtree_has_cells(self, node, node_level):
        """Any bucket cell (at any level > node_level) inside node?"""
        lo = ci.range_min(np.uint64(node))
        hi = ci.range_max(np.uint64(node))
        for lvl in self.levels:
            if lvl <= node_level:
                continue
            cells = self.cells_by_level[lvl]
            if not len(cells):
                continue
            s = int(np.searchsorted(cells, lo))
            if s < len(cells) and cells[s] <= hi:
                return True
        return False

    def _closest_bucket_table(self):
        """Lazy flat bucket table for the vectorized closest-edge
        search: one bounding cap per NON-EMPTY bucket across all index
        levels (center = normalized mean of member edge midpoints,
        radius = max over members of angle-to-center + edge half-angle
        — every point of every member edge lies inside the cap), plus
        [start, end) slices into one flat member-edge-id array.
        Duplicated membership (an edge sits in its own cell AND its
        neighbors') only costs redundant evaluation, never correctness."""
        tab = getattr(self, "_bucket_tab", None)
        if tab is not None:
            return tab
        centers, radii, starts, counts, flat = [], [], [], [], []
        pos = 0
        # Antipodal (degenerate-cap) edges have no finite midpoint cap;
        # force their buckets unprunable.
        half_eff = np.where(self.edge_half_ang >= np.pi / 2 - 1e-12,
                            np.pi, self.edge_half_ang)
        for lvl in self.levels:
            offs = self.offsets_by_level[lvl]
            eids = self.edge_ids_by_level[lvl]
            if not len(eids):
                continue
            cnt = np.diff(offs)
            keep = np.nonzero(cnt > 0)[0]
            mids = self.edge_mid[eids]
            sums = np.add.reduceat(mids, offs[keep])
            c = sums / np.maximum(np.linalg.norm(sums, axis=1,
                                                 keepdims=True), 1e-300)
            dots = (mids * np.repeat(c, cnt[keep], axis=0)).sum(axis=1)
            val = np.arccos(np.clip(dots, -1.0, 1.0)) + half_eff[eids]
            rmax = np.maximum.reduceat(val, offs[keep])
            centers.append(c)
            radii.append(rmax)
            starts.append(pos + offs[keep])
            counts.append(cnt[keep])
            flat.append(eids)
            pos += len(eids)
        if not centers:
            e3 = np.empty(0, np.int64)
            tab = (np.empty((0, 3)), np.empty(0), e3, e3, e3,
                   np.empty((0, 3)), np.empty(0), e3, e3, e3)
            self._bucket_tab = tab
            return tab
        st = np.concatenate(starts)
        ct = np.concatenate(counts)
        C = np.concatenate(centers)
        R = np.concatenate(radii)
        nb = len(R)
        # Super-cap level: runs of Hilbert-adjacent buckets (sorted by
        # center leaf cell id, so runs are spatially coherent), capped
        # at ~1024 supers; the query prunes point x super densely and
        # only expands surviving supers to member buckets.  With
        # nb <= 1024 each bucket is its own super (identity level).
        if nb <= 1024:
            sup = (C, R, np.arange(nb, dtype=np.int64),
                   np.arange(1, nb + 1, dtype=np.int64),
                   np.arange(nb, dtype=np.int64))
        else:
            order = np.argsort(ci.cellid_from_xyz(C[:, 0], C[:, 1],
                                                  C[:, 2]))
            g = int(np.ceil(nb / 1024))
            bnd = np.arange(0, nb, g, dtype=np.int64)
            cs = C[order]
            sums = np.add.reduceat(cs, bnd)
            sc = sums / np.maximum(np.linalg.norm(sums, axis=1,
                                                  keepdims=True), 1e-300)
            run = np.minimum(np.arange(nb) // g, len(bnd) - 1)
            dots = (cs * sc[run]).sum(axis=1)
            val = np.arccos(np.clip(dots, -1.0, 1.0)) + R[order]
            sr = np.maximum.reduceat(val, bnd)
            sup = (sc, sr, bnd,
                   np.append(bnd[1:], nb).astype(np.int64),
                   order.astype(np.int64))
        tab = (C, R, st, st + ct, np.concatenate(flat)) + sup
        self._bucket_tab = tab
        return tab

    def closest_edge_batch(self, pts):
        """Fully-vectorized exact closest edge for a batch of query
        points — no per-point traversal (the r2 heap loop ran ~1k
        pts/s/core; this runs millions).  Exactness argument: every
        edge belongs to at least one bucket; a bucket's cap gives the
        lower bound d(p, any member edge) >= angle(p, center) - radius,
        so any bucket whose chord-squared lower bound is >= the current
        achieved upper bound can be skipped without changing the min.
        Stages: (1) seed upper bound from each point's nearest bucket
        center (grouped per bucket, one edge_distances2 call each);
        (2) evaluate surviving (point, bucket) pairs bucket-by-bucket
        in ascending lower-bound order, re-filtering against the
        tightening best.  edge_distances2 is bit-identical on subsets
        (fixed-order reduction), so results equal brute force exactly;
        returns (d2, edge_id) with edge_id achieving d2 (tie edge
        unspecified, as in the heap search).
        Semantics: s2closest_edge_query_base.d:380-750 (distance), with
        the cap-pruning playing the role of the cell-distance queue."""
        from .edge import edge_distances2, edge_distances2_pairwise
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        n = len(pts)
        if self.n_edges == 0:
            # Empty index: match the indexed path's graceful no-result
            # (argmin over a (n, 0) matrix would raise).
            return np.full(n, np.inf), np.full(n, -1, dtype=np.int64)
        if self.n_edges <= self.MAX_BRUTE_FORCE_EDGES or not self.levels:
            # Chunk by PAIR budget: edge_distances2 is memory-bound and
            # ~3x faster when its (chunk, n_edges) planes stay in cache.
            step = max(64, 262144 // max(1, self.n_edges))
            if n > step:
                outs = [self.closest_edge_batch(pts[i:i + step])
                        for i in range(0, n, step)]
                return (np.concatenate([o[0] for o in outs]),
                        np.concatenate([o[1] for o in outs]))
            d2 = edge_distances2(pts, self.edge_a, self.edge_b)
            ids = d2.argmin(axis=1)
            return d2[np.arange(n), ids], ids.astype(np.int64)
        tab = self._closest_bucket_table()
        centers, radii, starts, ends, flat = tab[:5]
        sup_centers, sup_radii, sup_starts, sup_ends, sup_members = tab[5:]
        nb = len(radii)
        if not nb:
            return np.full(n, np.inf), np.full(n, -1, dtype=np.int64)
        nsup = len(sup_radii)
        step = max(256, min(8192, 262144 // nsup))  # (chunk, nsup) cached
        if n > step:
            outs = [self.closest_edge_batch(pts[i:i + step])
                    for i in range(0, n, step)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        SLACK = 1e-9  # absorbs cap/trig rounding: never over-prune

        # Level 1: dense point x super-cap bounds.  For each (p, cap):
        #   upper bound  angle(p, nearest edge in cap) <= ang + radius
        #     (valid because the cap CONTAINS at least one whole edge),
        #   lower bound  >= ang - radius.
        # ub_d2 = min over caps of chord^2(ang + radius); a cap survives
        # iff its lower bound can beat ub, i.e. cosang > cos(ub_ang +
        # radius + slack) — built from 1-D trig + one outer combination
        # (cos(a+b) expansion), never arccos over the full matrix.
        best = np.full(n, np.inf)
        best_id = np.full(n, -1, dtype=np.int64)

        def expand(pt, grp_starts, grp_ends, members):
            """(point, group) pairs -> flat (point, member) pairs."""
            cnt = grp_ends - grp_starts
            total = int(cnt.sum())
            base = np.repeat(grp_starts, cnt)
            local = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt,
                                                 cnt)
            return np.repeat(pt, cnt), members[base + local]

        def eval_edges(pt_b, bk_b):
            """(point, bucket) pairs -> evaluate member edges with one
            pairwise kernel call + unsorted segment-min scatter."""
            pt_e, e_pairs = expand(pt_b, starts[bk_b], ends[bk_b], flat)
            if len(pt_e):
                d = edge_distances2_pairwise(
                    pts[pt_e], self.edge_a[e_pairs],
                    self.edge_b[e_pairs])
                np.minimum.at(best, pt_e, d)
                ach = d == best[pt_e]
                best_id[pt_e[ach]] = e_pairs[ach]

        cosang = pts @ sup_centers.T                    # (n, nsup)
        sin_ = np.sqrt(np.maximum(0.0, 1.0 - cosang * cosang))
        cosr = np.cos(sup_radii)
        sinr = np.sin(sup_radii)
        cos_ub = cosang * cosr[None, :] - sin_ * sinr[None, :]
        # ang + radius may exceed pi, where the cos identity no longer
        # bounds the (<= pi) true angle: clamp those entries to cos(pi).
        np.copyto(cos_ub, -1.0, where=cosang <= -cosr[None, :])
        ub_d2 = 2.0 - 2.0 * cos_ub.max(axis=1)          # (n,)
        identity = nsup == nb  # each bucket is its own super
        seed = None
        if identity:
            # Tighten ub to an EVALUATED (edge-achieved) distance from
            # each point's nearest bucket — much tighter than the cap
            # bound, so far fewer candidates survive below.
            seed = cosang.argmax(axis=1)
            eval_edges(np.arange(n), seed)
            np.minimum(ub_d2, best, out=ub_d2)
        ub_ang = 2.0 * np.arcsin(
            np.minimum(1.0, 0.5 * np.sqrt(ub_d2))) + SLACK
        thr = (np.cos(ub_ang)[:, None] * cosr[None, :]
               - np.sin(ub_ang)[:, None] * sinr[None, :])
        mask = cosang > thr
        mask |= (ub_ang[:, None] + sup_radii[None, :]) >= np.pi
        if seed is not None:
            mask[np.arange(n), seed] = False
        pt_s, sp_s = np.nonzero(mask)

        if identity:
            pt_b, bk_b = pt_s, sp_s
            cosb = cosang[pt_s, sp_s]
        else:
            # Level 2: expand surviving supers to member buckets,
            # pairwise bucket-cap bounds tighten ub (minimum.at).
            pt_b, bk_b = expand(pt_s, sup_starts[sp_s], sup_ends[sp_s],
                                sup_members)
            cb = centers[bk_b]
            p = pts[pt_b]
            cosb = (p[:, 0] * cb[:, 0] + p[:, 1] * cb[:, 1]) \
                + p[:, 2] * cb[:, 2]
        ang_b = np.arccos(np.clip(cosb, -1.0, 1.0))
        if not identity:
            ub_b = 4.0 * np.sin(0.5 * np.minimum(
                ang_b + radii[bk_b], np.pi)) ** 2
            np.minimum.at(ub_d2, pt_b, ub_b)
        lb_b = np.maximum(ang_b - radii[bk_b] - SLACK, 0.0)
        keep = 4.0 * np.sin(0.5 * lb_b) ** 2 <= ub_d2[pt_b]

        # Level 3: evaluate surviving buckets' edges.  Exact: the bucket
        # holding the true argmin edge has lb <= true d2 <= ub, so it
        # survived every filter above.
        eval_edges(pt_b[keep], bk_b[keep])
        return best, best_id

    def _closest_edge_one(self, p, best=np.inf, best_id=-1):
        """Best-first traversal for one query point; returns
        (best_d2, best_edge_id).  An achievable (edge-backed) upper
        bound may be passed in to warm-start the pruning.  Stats:
        self._last_edges_evaluated."""
        import heapq
        from .edge import edge_distances2
        evaluated = 0
        heap = []
        for f in range(6):
            face = np.uint64((f << 61) | (1 << 60))
            cell = Cell(int(face))
            heapq.heappush(heap, (float(cell.distance2_to_point(p)), 0,
                                  int(face)))
        slack = 1e-12  # last-ulp ties: don't prune an equal-distance edge
        while heap:
            d2, lvl, node = heapq.heappop(heap)
            if d2 > best * (1 + slack):
                break
            # evaluate this node's own bucket (if it is one at level lvl)
            if lvl in self.cells_by_level:
                cells = self.cells_by_level[lvl]
                if len(cells):
                    k = int(np.searchsorted(cells, np.uint64(node)))
                    if k < len(cells) and cells[k] == np.uint64(node):
                        offs = self.offsets_by_level[lvl]
                        eids = self.edge_ids_by_level[lvl][
                            offs[k]:offs[k + 1]]
                        if len(eids):
                            ed2 = edge_distances2(
                                p[None, :], self.edge_a[eids],
                                self.edge_b[eids])[0]
                            evaluated += len(eids)
                            j = int(ed2.argmin())
                            if float(ed2[j]) < best:
                                best = float(ed2[j])
                                best_id = int(eids[j])
            # descend
            if lvl < self.level and self._subtree_has_cells(node, lvl):
                kids = [int(ci.child(np.uint64(node), k))
                        for k in range(4)]
                for child in kids:
                    cc = Cell(int(child))
                    cd2 = float(cc.distance2_to_point(p))
                    if cd2 <= best * (1 + slack):
                        heapq.heappush(heap, (cd2, lvl + 1, int(child)))
        self._last_edges_evaluated = evaluated
        return best, best_id

    def _parity(self, p, c0, base, eids):
        """base (= contains(c0)) XOR crossings((c0 -> p), edges)."""
        if len(eids) == 0:
            return np.full(len(p), base, dtype=bool)
        A = self.edge_a[eids]
        B = self.edge_b[eids]
        N = self.edge_n[eids]
        # signs for segment (c0, p) vs edges (A, B):
        cross_cp = np.cross(np.broadcast_to(c0, p.shape), p)   # (m,3)
        s1 = cross_cp @ A.T                                    # s(c0,p,A)
        s2 = cross_cp @ B.T                                    # s(c0,p,B)
        s3 = p @ N.T                                           # s(A,B,p)
        s4 = N @ c0                                            # s(A,B,c0)
        err = MAX_DET_ERROR
        s4m = np.broadcast_to(s4, s3.shape)
        uncertain = ((np.abs(s1) <= err) | (np.abs(s2) <= err)
                     | (np.abs(s3) <= err) | (np.abs(s4m) <= err))
        pos1 = s1 > 0
        crossing = ((pos1 == (s2 < 0)) & (pos1 == (s3 > 0))
                    & (pos1 == (s4m < 0)) & ~uncertain)
        counts = crossing.sum(axis=1)
        if uncertain.any():
            rows, cols = np.nonzero(uncertain)
            c0t = tuple(c0)
            for r, c in zip(rows.tolist(), cols.tolist()):
                if edge_or_vertex_crossing(c0t, tuple(p[r]),
                                           tuple(A[c]), tuple(B[c])):
                    counts[r] += 1
        return ((counts & 1).astype(bool)) ^ base


# Vertex models for contains_point_model (s2contains_point_query.d:50):
# OPEN (no shape contains its vertices), SEMI_OPEN (default parity),
# CLOSED (all shapes contain their vertices).
VERTEX_MODELS = ("open", "semi_open", "closed")


def _contains_point_model_impl(index, p, model):
    from .predicates import crossing_sign, vertex_crossing
    pt = tuple(float(v) for v in p)
    pts = np.asarray(p, dtype=np.float64)[None, :]
    leaf = ci.cellid_from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
    anchor = ci.parent(leaf, index.level)[0]
    eids = index._bucket_union(anchor)
    # parity base = containment of the anchor cell center (cell centers
    # are never polygon vertices for non-degenerate inputs)
    k = int(np.searchsorted(index.cells, anchor)) if len(index.cells) \
        else 0
    if len(index.cells) and k < len(index.cells) \
            and index.cells[k] == anchor:
        center = index.centers[k]
        inside = bool(index.contains_center[k])
    else:
        center = np.asarray(Cell(int(anchor)).center())
        inside = bool(index.polygon.contains_points(center[None, :])[0])
    ct = tuple(float(v) for v in center)
    for eid in eids.tolist():
        v0 = tuple(index.edge_a[eid])
        v1 = tuple(index.edge_b[eid])
        sign = crossing_sign(ct, pt, v0, v1)
        if sign < 0:
            continue
        if sign == 0:
            # For the OPEN and CLOSED models, check whether p is a vertex
            if model != "semi_open" and (v0 == pt or v1 == pt):
                return model == "closed"
            sign = 1 if vertex_crossing(ct, pt, v0, v1) else 0
        inside ^= bool(sign)
    return inside


def _contains_point_model(self, p, model="semi_open"):
    """Point containment under a vertex model
    (s2contains_point_query.d:248-278 shapeContains): OPEN / SEMI_OPEN /
    CLOSED control whether the polygon contains its own vertices."""
    assert model in VERTEX_MODELS
    return _contains_point_model_impl(self, p, model)


PolygonShapeIndex.contains_point_model = _contains_point_model


class EdgeVectorIndex:
    """Bucket index over a raw edge collection — the
    S2EdgeVectorShape-in-a-MutableS2ShapeIndex analogue used by the
    crossing-edge query conformance fixtures
    (test/s2/s2crossing_edge_query_test.d:96-105 checkAllCrossings).
    Shares the exact multi-level long-edge-rule build with
    PolygonShapeIndex; has no interior state (edge collections have no
    interior)."""

    __slots__ = ("level", "levels", "cells_by_level", "offsets_by_level",
                 "edge_ids_by_level", "cells", "offsets", "edge_ids",
                 "edge_a", "edge_b", "n_edges", "edge_mid", "edge_half_ang",
                 "_last_edges_evaluated", "_bucket_tab")

    def __init__(self, edge_a, edge_b, max_edges_per_cell=MAX_EDGES_PER_CELL):
        self.edge_a = np.atleast_2d(np.asarray(edge_a, dtype=np.float64))
        self.edge_b = np.atleast_2d(np.asarray(edge_b, dtype=np.float64))
        self.n_edges = len(self.edge_a)
        _build_edge_buckets(self, max_edges_per_cell)


# Closest-edge search is shared verbatim with the polygon index: the
# best-first traversal reads only the bucket arrays + edge arrays, which
# both classes build through _build_edge_buckets.
EdgeVectorIndex.MAX_BRUTE_FORCE_EDGES = PolygonShapeIndex.MAX_BRUTE_FORCE_EDGES
EdgeVectorIndex.closest_edge = PolygonShapeIndex.closest_edge
EdgeVectorIndex.closest_edge_batch = PolygonShapeIndex.closest_edge_batch
EdgeVectorIndex._closest_bucket_table = \
    PolygonShapeIndex._closest_bucket_table
EdgeVectorIndex.boundary_distance2 = PolygonShapeIndex.boundary_distance2
EdgeVectorIndex.boundary_distance2_brute = \
    PolygonShapeIndex.boundary_distance2_brute
EdgeVectorIndex._closest_edge_one = PolygonShapeIndex._closest_edge_one
EdgeVectorIndex._subtree_has_cells = PolygonShapeIndex._subtree_has_cells


def _cell_cap_radius2(cells):
    """Vectorized Cell.cap_bound().radius2: max squared chord from the
    cell center to its 4 (normalized) uv-rect corner vertices
    (s2cell.d:482-498 semantics)."""
    from . import coords
    cid = np.asarray(cells, dtype=np.uint64)
    if not len(cid):
        return np.empty(0)
    lvl = ci.level(cid)
    face, i, j = ci.to_face_ij(cid)
    size = (np.int64(1) << (np.int64(ci.MAX_LEVEL) - lvl)).astype(
        np.int64)
    i0 = i & -size
    j0 = j & -size
    scale = 1.0 / coords.LIMIT_IJ
    u_lo = coords.st_to_uv(scale * i0)
    u_hi = coords.st_to_uv(scale * (i0 + size))
    v_lo = coords.st_to_uv(scale * j0)
    v_hi = coords.st_to_uv(scale * (j0 + size))
    cx, cy, cz = ci.to_xyz(cid)
    r2 = np.zeros(len(cid))
    for u, v in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        x, y, z = coords.face_uv_to_xyz(face, u, v)
        n = np.sqrt((x * x + y * y) + z * z)
        dx, dy, dz = cx - x / n, cy - y / n, cz - z / n
        np.maximum(r2, (dx * dx + dy * dy) + dz * dz, out=r2)
    return r2


def _build_edge_buckets(self, max_edges_per_cell):
    """Shared bucket construction over self.edge_a/edge_b (see the
    module docstring for the level rules).  Sets level, levels,
    *_by_level maps, and the anchor-level views cells/offsets/edge_ids."""
    # Anchor level from edge DENSITY alone (long-edge rule: outlier
    # edge lengths must not coarsen the whole index,
    # mutable_s2shape_index.d:64-75).
    chord = np.linalg.norm(self.edge_a - self.edge_b, axis=1)
    ang = 2 * np.arcsin(np.minimum(1.0, 0.5 * chord))
    e_med = float(np.median(ang)) if self.n_edges else 1e-6
    l_density = MIN_WIDTH.get_level_for_max_value(
        max(1e-12, max_edges_per_cell * e_med))
    self.level = int(np.clip(l_density, 4, 22))  # anchor level

    # Per-edge level: finest level <= anchor whose min cell width
    # exceeds the edge length (keeps the 3x3 superset guarantee).
    # Vectorized get_level_for_min_value: frexp exponent - 1 == ilogb,
    # identical to the scalar Metric method per element.
    v = ang * 1.001
    with np.errstate(divide="ignore", over="ignore"):
        le = np.frexp(MIN_WIDTH.deriv
                      / np.where(v <= 0, np.inf, v))[1] - 1
    le = np.where(v <= 0, 30, np.clip(le, 0, 30))
    edge_level = np.minimum(self.level, le).astype(np.int64)

    from .edge import edge_distances2_pairwise
    la_leaf = ci.cellid_from_xyz(self.edge_a[:, 0], self.edge_a[:, 1],
                                 self.edge_a[:, 2])
    lb_leaf = ci.cellid_from_xyz(self.edge_b[:, 0], self.edge_b[:, 1],
                                 self.edge_b[:, 2])

    self.levels = sorted(set(edge_level.tolist()))
    self.cells_by_level = {}
    self.offsets_by_level = {}
    self.edge_ids_by_level = {}
    anchor_cells = None
    anchor_eids = None
    anchor_offsets = None
    for lvl in self.levels:
        sel = np.nonzero(edge_level == lvl)[0]
        la = ci.parent(la_leaf[sel], lvl)
        lb = ci.parent(lb_leaf[sel], lvl)
        # Candidate (cell, edge) pairs as flat columns: each edge maps
        # to its endpoints' cells plus their 8-rings (the 3x3 superset
        # guarantee).  Rings are computed once per UNIQUE parent cell
        # (the only remaining scalar loop — #occupied cells, not
        # #edges); everything else is array work.
        if lvl == 0:
            # an edge can span beyond the 3x3 guarantee at the face
            # level; bucket it on every face (6 cells)
            faces = np.array([(f << 61) | (1 << 60) for f in range(6)],
                             dtype=np.uint64)
            cols = np.concatenate(
                [la[:, None], lb[:, None],
                 np.broadcast_to(faces, (len(sel), 6))], axis=1)
        else:
            uniq = np.unique(np.concatenate([la, lb]))
            ring_tab = ci.all_neighbors_ring(uniq, lvl)
            cols = np.concatenate(
                [la[:, None], lb[:, None],
                 ring_tab[np.searchsorted(uniq, la)],
                 ring_tab[np.searchsorted(uniq, lb)]], axis=1)
        ncol = cols.shape[1]
        pair_cell = cols.ravel()
        pair_eid = np.repeat(sel, ncol)
        order = np.lexsort((pair_eid, pair_cell))
        pair_cell = pair_cell[order]
        pair_eid = pair_eid[order]
        dup = np.zeros(len(pair_cell), dtype=bool)
        dup[1:] = (pair_cell[1:] == pair_cell[:-1]) \
            & (pair_eid[1:] == pair_eid[:-1])
        pair_cell = pair_cell[~dup]
        pair_eid = pair_eid[~dup]
        # Prune: center-to-edge distance within the PER-CELL cap radius
        # (max chord from center to the 4 vertices, vectorized — the
        # same Cell.cap_bound().radius2 value as the scalar build) x
        # the same 4x slack as before.
        cells_u = np.unique(pair_cell)
        centers_u = np.stack(ci.to_xyz(cells_u), axis=1)
        cidx = np.searchsorted(cells_u, pair_cell)
        thr = 4.0 * _cell_cap_radius2(cells_u)[cidx] + 1e-12
        keepp = np.empty(len(pair_eid), dtype=bool)
        for i0 in range(0, len(pair_eid), 1 << 19):  # cache-sized chunks
            sl = slice(i0, i0 + (1 << 19))
            keepp[sl] = edge_distances2_pairwise(
                centers_u[cidx[sl]], self.edge_a[pair_eid[sl]],
                self.edge_b[pair_eid[sl]]) <= thr[sl]
        pair_cell = pair_cell[keepp]
        pair_eid = pair_eid[keepp]
        cells_k, counts = np.unique(pair_cell, return_counts=True)
        offs = np.zeros(len(cells_k) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        self.cells_by_level[lvl] = cells_k
        self.offsets_by_level[lvl] = offs
        self.edge_ids_by_level[lvl] = pair_eid.astype(np.int64)
        if lvl == self.level:
            anchor_cells = cells_k
            anchor_eids = self.edge_ids_by_level[lvl]
            anchor_offsets = offs

    # Anchor-level views (kept under the historical names: the
    # crossing/knn queries consume .cells/.offsets/.edge_ids).
    if anchor_cells is None:
        anchor_cells = np.empty(0, dtype=np.uint64)
        anchor_eids = np.empty(0, dtype=np.int64)
        anchor_offsets = np.array([0], dtype=np.int64)
    self.cells = anchor_cells
    self.edge_ids = anchor_eids
    self.offsets = anchor_offsets

    # Per-edge bounding caps (midpoint + half-angle) for the candidate
    # prune in crossing queries: two edges can cross or touch only if
    # their caps intersect (triangle inequality on the sphere).
    mid = self.edge_a + self.edge_b
    nm = np.linalg.norm(mid, axis=1)
    degen = nm < 1e-300  # antipodal endpoints: no bounding cap exists
    safe = np.where(degen[:, None], self.edge_a, mid)
    self.edge_mid = safe / np.linalg.norm(safe, axis=1, keepdims=True)
    half = np.arcsin(np.minimum(
        1.0, 0.5 * np.linalg.norm(self.edge_a - self.edge_b, axis=1)))
    # pi (unprunable), not pi/2: the midpoint fallback direction is
    # arbitrary for antipodal endpoints, so a hemisphere cap does not
    # bound the edge (ADVICE r3; matches _closest_bucket_table).
    self.edge_half_ang = np.where(degen, np.pi, half)
