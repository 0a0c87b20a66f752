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
  - The index level L is chosen so every edge is shorter than the minimum
    cell width at L; such an edge can only touch cells within the 3x3
    neighborhoods of its endpoints' cells, which is how buckets are built
    (conservative superset, then distance-pruned).

Points whose level-L cell holds no edges fall back to the full-edge brute
PIP (rare: only interior/exterior cells inside the boundary covering).
Build cost is one vectorized full PIP over the bucket cell centers.
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from .cell import Cell
from .metrics import MIN_WIDTH
from .predicates import MAX_DET_ERROR, edge_or_vertex_crossing

MAX_EDGES_PER_CELL = 10  # default of the reference (mutable_s2shape_index.d:43)


class PolygonShapeIndex:
    """Immutable edge-bucket index over all loops of one polygon."""

    __slots__ = ("polygon", "level", "cells", "offsets", "edge_ids",
                 "centers", "contains_center", "edge_a", "edge_b",
                 "edge_n", "n_edges")

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

        # Pick the index level: edges must be shorter than MIN_WIDTH(L)
        # (superset guarantee) and we aim for ~max_edges_per_cell.
        chord = np.linalg.norm(self.edge_a - self.edge_b, axis=1)
        e_max = float(chord.max())
        e_avg = float(chord.mean()) if self.n_edges else 1e-6
        ang_max = 2 * np.arcsin(min(1.0, 0.5 * e_max))
        ang_avg = 2 * np.arcsin(min(1.0, 0.5 * e_avg))
        l_edge = MIN_WIDTH.get_level_for_min_value(ang_max * 1.001)
        l_density = MIN_WIDTH.get_level_for_max_value(
            max(1e-12, max_edges_per_cell * ang_avg))
        self.level = int(np.clip(min(l_edge, max(l_density, 4)), 4, 22))

        # Bucket assembly: endpoint cells + 3x3 rings, distance-pruned.
        la = ci.parent(ci.cellid_from_xyz(self.edge_a[:, 0],
                                          self.edge_a[:, 1],
                                          self.edge_a[:, 2]), self.level)
        lb = ci.parent(ci.cellid_from_xyz(self.edge_b[:, 0],
                                          self.edge_b[:, 1],
                                          self.edge_b[:, 2]), self.level)
        cand_cells: dict[int, set] = {}

        ring_cache: dict[int, np.ndarray] = {}

        def ring(cell):
            r = ring_cache.get(int(cell))
            if r is None:
                r = ci.all_neighbors(np.uint64(cell), self.level)
                ring_cache[int(cell)] = r
            return r

        for i in range(self.n_edges):
            cells = {int(la[i]), int(lb[i])}
            for c in (la[i], lb[i]):
                cells.update(int(v) for v in ring(c))
            for c in cells:
                cand_cells.setdefault(c, set()).add(i)

        # Distance prune: drop (cell, edge) pairs where the cell's cap is
        # farther from the edge's midpoint cap than their radii allow.
        from .edge import edge_distances2
        cells_sorted = np.array(sorted(cand_cells), dtype=np.uint64)
        offsets = [0]
        edge_ids = []
        centers = np.empty((len(cells_sorted), 3))
        for k, c in enumerate(cells_sorted.tolist()):
            cell = Cell(c)
            centers[k] = cell.center()
            ids = np.array(sorted(cand_cells[c]), dtype=np.int64)
            # prune: min distance from cell center to the edge must be
            # within the cell's circumradius (cap radius) + slack.
            cap = cell.cap_bound()
            d2 = edge_distances2(centers[k][None, :],
                                 self.edge_a[ids], self.edge_b[ids])[0]
            keep = d2 <= cap.radius2 * 4.0 + 1e-12
            ids = ids[keep]
            edge_ids.append(ids)
            offsets.append(offsets[-1] + len(ids))
        nonempty = np.array([len(e) > 0 for e in edge_ids], dtype=bool)
        self.cells = cells_sorted[nonempty]
        self.centers = centers[nonempty]
        self.edge_ids = np.concatenate([e for e, ok in
                                        zip(edge_ids, nonempty) if ok]) \
            if nonempty.any() else np.empty(0, dtype=np.int64)
        offs = [0]
        for e, ok in zip(edge_ids, nonempty):
            if ok:
                offs.append(offs[-1] + len(e))
        self.offsets = np.array(offs, dtype=np.int64)
        # Exact containment of every bucket-cell center (one vectorized
        # full PIP — the InteriorTracker equivalent, done eagerly).
        if len(self.cells):
            self.contains_center = polygon.contains_points(self.centers)
        else:
            self.contains_center = np.zeros(0, dtype=bool)

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
        if len(self.cells) == 0:
            return self.polygon.contains_points(pts)
        pos = np.searchsorted(self.cells, lcell)
        posc = np.minimum(pos, len(self.cells) - 1)
        hit = self.cells[posc] == lcell
        miss = ~hit
        if miss.any():
            out[miss] = self.polygon.contains_points(pts[miss])
        if not hit.any():
            return out
        # Group hit points by bucket, vectorize per bucket.
        hit_idx = np.nonzero(hit)[0]
        order = np.argsort(posc[hit_idx], kind="stable")
        hit_idx = hit_idx[order]
        buckets = posc[hit_idx]
        starts = np.nonzero(np.diff(buckets, prepend=-1))[0]
        ends = np.append(starts[1:], len(buckets))
        for s, e in zip(starts.tolist(), ends.tolist()):
            b = int(buckets[s])
            rows = hit_idx[s:e]
            eids = self.edge_ids[self.offsets[b]:self.offsets[b + 1]]
            inside = self._parity(pts[rows], b, eids)
            out[rows] = inside
        return out

    def boundary_distance2(self, points, chunk=8192):
        """Min squared chord distance from each point to the polygon
        boundary (the S2ClosestEdgeQuery capability, brute-vectorized
        over all edges in chunks to bound temporaries)."""
        from .edge import edge_distances2
        pts = np.asarray(points, dtype=np.float64)
        out = np.empty(len(pts))
        for s in range(0, len(pts), chunk):
            out[s:s + chunk] = edge_distances2(
                pts[s:s + chunk], self.edge_a, self.edge_b).min(axis=1)
        return out

    def _parity(self, p, bucket, eids):
        """contains_center(bucket) XOR crossings((center -> p), edges)."""
        c0 = self.centers[bucket]
        base = self.contains_center[bucket]
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
