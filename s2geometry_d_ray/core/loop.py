"""S2Loop: simple closed spherical polygon ring with vectorized
point-in-polygon via crossing parity from the fixed origin.

Reimplements the containment semantics of ``src/s2/s2loop.d``:
  - origin_inside bootstrap (s2loop.d:1382-1433 initOriginAndBound)
  - bruteForceContains crossing parity (s2loop.d:1485-1497), vectorized:
    two matmuls per (points x edges) batch + scalar exact fallback on the
    rare uncertain entries (triage |det| <= MAX_DET_ERROR)
  - conservative lat/lng rect bound with edge latitude extrema
    (s2latlng_rect_bounder.d semantics)
  - cell relations used by the coverer (contains/may_intersect S2Cell),
    conservative in the covering-safe direction.
"""

from __future__ import annotations

import math

import numpy as np

from . import coords
from .predicates import (MAX_DET_ERROR, ORIGIN, edge_or_vertex_crossing,
                         ordered_ccw, ortho)
from .rect import S1Interval, LatLngRect


class Loop:
    """vertices: (n, 3) float64 unit vectors, CCW order = interior on left."""

    __slots__ = ("vertices", "origin_inside", "bound", "_edge_normals",
                 "_normal_dot_origin", "depth", "_next", "_vT_ext", "_nT")

    def __init__(self, vertices, depth=0):
        v = np.asarray(vertices, dtype=np.float64)
        assert v.ndim == 2 and v.shape[1] == 3 and len(v) >= 3
        # normalize defensively
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        self.vertices = v
        self.depth = depth
        # Edge normals N_i = v_i x v_{i+1} (wrapping), precomputed for the
        # vectorized PIP matmuls.
        nxt = np.roll(v, -1, axis=0)
        self._next = nxt
        self._edge_normals = np.cross(v, nxt)
        self._normal_dot_origin = self._edge_normals @ np.asarray(ORIGIN)
        # Contiguous transposed copies so the per-batch matmuls are pure
        # GEMM with zero reshuffling; _vT_ext has v[0] appended so that
        # s(a,b,v_i) and s(a,b,v_{i+1}) are adjacent column VIEWS.
        self._vT_ext = np.ascontiguousarray(
            np.concatenate([v, v[:1]], axis=0).T)
        self._nT = np.ascontiguousarray(self._edge_normals.T)
        self.origin_inside = self._init_origin_inside()
        self.bound = self._compute_bound()

    @classmethod
    def from_latlng_degrees(cls, lat_deg, lon_deg, depth=0):
        x, y, z = coords.latlng_to_xyz(np.asarray(lat_deg, dtype=np.float64),
                                       np.asarray(lon_deg, dtype=np.float64))
        return cls(np.stack([x, y, z], axis=1), depth=depth)

    @classmethod
    def make_regular(cls, center_lat_deg, center_lon_deg, radius_rad, n,
                     depth=0):
        """Regular n-gon around a center (s2loop.d:952-964 makeRegularLoop)."""
        cx, cy, cz = (float(a) for a in coords.latlng_to_xyz(
            center_lat_deg, center_lon_deg))
        z = np.array([cx, cy, cz])
        # Build an orthonormal frame at the center.
        xaxis = np.array(ortho(tuple(z)))
        yaxis = np.cross(z, xaxis)
        r = radius_rad
        angles = 2.0 * math.pi * np.arange(n) / n
        pts = (math.sin(r) * (np.cos(angles)[:, None] * xaxis
                              + np.sin(angles)[:, None] * yaxis)
               + math.cos(r) * z)
        return cls(pts, depth=depth)

    # ------------------------------------------------------------------
    def _init_origin_inside(self):
        """s2loop.d:1382-1433: test vertex 1 geometrically, then reconcile
        with the parity count from origin (computed as if origin outside)."""
        v = self.vertices
        v1_inside = ordered_ccw(ortho(tuple(v[1])), tuple(v[0]), tuple(v[2]),
                                tuple(v[1]))
        contains_v1 = bool(self._contains_counting(
            v[1][None, :], assume_origin_inside=False)[0])
        return v1_inside != contains_v1

    def _contains_counting(self, points, assume_origin_inside=None):
        """Crossing parity of edges (ORIGIN -> p) vs loop edges, vectorized.

        points: (m, 3). Returns bool (m,).
        """
        v = self.vertices
        p = np.asarray(points, dtype=np.float64)
        ox, oy, oz = ORIGIN
        px, py, pz = p[:, 0], p[:, 1], p[:, 2]
        # cross_op = ORIGIN x p, written out (np.cross has high overhead)
        cross_op = np.empty_like(p)
        cross_op[:, 0] = oy * pz - oz * py
        cross_op[:, 1] = oz * px - ox * pz
        cross_op[:, 2] = ox * py - oy * px
        # s_abc[m,i] = sign(O, p_m, v_i); s_abd uses v_{i+1} — adjacent
        # column views of the extended matmul output.
        m_ov = cross_op @ self._vT_ext                       # (m, nv+1)
        s_abc = m_ov[:, :-1]
        s_abd = m_ov[:, 1:]
        s_cdb = p @ self._nT                                 # sign(C,D,p)
        s_cda = np.broadcast_to(self._normal_dot_origin, s_cdb.shape)

        err = MAX_DET_ERROR
        uncertain = ((np.abs(s_abc) <= err) | (np.abs(s_abd) <= err)
                     | (np.abs(s_cdb) <= err) | (np.abs(s_cda) <= err))
        # crossing iff sign(abc) == -sign(abd) == sign(cdb) == -sign(cda)
        pos = (s_abc > 0)
        crossing = ((pos == (s_abd < 0)) & (pos == (s_cdb > 0))
                    & (pos == (s_cda < 0)) & ~uncertain)
        counts = crossing.sum(axis=1)

        if uncertain.any():
            rows, cols = np.nonzero(uncertain)
            nxt = self._next
            for r, c in zip(rows.tolist(), cols.tolist()):
                pt = tuple(p[r])
                if edge_or_vertex_crossing(ORIGIN, pt, tuple(v[c]),
                                           tuple(nxt[c])):
                    counts[r] += 1
        inside = self.origin_inside if assume_origin_inside is None \
            else assume_origin_inside
        return (counts & 1).astype(bool) ^ inside

    def contains_points(self, points):
        """Vectorized PIP; points (m,3) -> bool (m,)."""
        return self._contains_counting(points)

    def contains_point(self, p):
        return bool(self.contains_points(np.asarray(p)[None, :])[0])

    # ------------------------------------------------------------------
    def _compute_bound(self):
        """Conservative rect bound with edge latitude extrema
        (s2latlng_rect_bounder.d:44+)."""
        v = self.vertices
        nxt = np.roll(v, -1, axis=0)
        lat = np.arctan2(v[:, 2], np.hypot(v[:, 0], v[:, 1]))
        lng = np.arctan2(v[:, 1], v[:, 0])
        lat_lo = float(lat.min())
        lat_hi = float(lat.max())
        # Latitude extrema interior to an edge: the great circle through
        # (a,b) with normal n attains max |lat| where the circle is tangent
        # to a parallel; include it when that point lies on the edge arc.
        n = self._edge_normals
        nz = n[:, 2]
        nn2 = (n * n).sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            # Point of max z on the great circle: m = z_hat*|n|^2 - n*nz
            mx = -n[:, 0] * nz
            my = -n[:, 1] * nz
            mz = nn2 - nz * nz
        for sign_ in (1.0, -1.0):
            px, py, pz = sign_ * mx, sign_ * my, sign_ * mz
            norm = np.sqrt(px * px + py * py + pz * pz)
            ok = norm > 0
            px, py, pz = px[ok] / norm[ok], py[ok] / norm[ok], pz[ok] / norm[ok]
            a, b, nn = v[ok], nxt[ok], n[ok]
            # On-arc test: (a x p).n > 0 and (p x b).n > 0
            ap = np.cross(a, np.stack([px, py, pz], axis=1))
            pb = np.cross(np.stack([px, py, pz], axis=1), b)
            on_arc = ((ap * nn).sum(axis=1) > 0) & ((pb * nn).sum(axis=1) > 0)
            if on_arc.any():
                ex_lat = np.arctan2(pz[on_arc],
                                    np.hypot(px[on_arc], py[on_arc]))
                lat_lo = min(lat_lo, float(ex_lat.min()))
                lat_hi = max(lat_hi, float(ex_lat.max()))
        # Longitude: union of per-edge shortest-arc intervals (valid for
        # edges spanning < pi of longitude, as in the reference bounder).
        lng_int = S1Interval.from_point(float(lng[0]))
        for k in range(len(v)):
            e = S1Interval.from_point_pair(float(lng[k]),
                                           float(lng[(k + 1) % len(v)]))
            lng_int = lng_int.union(e)
        rect = LatLngRect(lat_lo, lat_hi, lng_int)
        # Error margin (bounder uses 2*DBL_EPSILON-scale; be conservative).
        return rect.expanded(1e-12, 1e-12)

    # -- cell relations for the coverer --------------------------------
    def _edges_cross_cell(self, cell):
        """Any loop edge crosses any of the 4 cell boundary edges.

        Vectorized triage with conservative treatment of uncertainty
        (uncertain => treated as crossing; safe for coverings).
        """
        v = self.vertices
        nxt = self._next
        n = self._edge_normals
        cv = np.asarray(cell.vertices())  # (4,3)
        cn = np.cross(cv, cv[[1, 2, 3, 0]])  # cell edge normals (4,3)
        for k in range(4):
            c0, c1, nk = cv[k], cv[(k + 1) & 3], cn[k]
            s1 = v @ nk          # sign(C,D,A_i)
            s2 = nxt @ nk        # sign(C,D,B_i)
            s3 = n @ c0          # sign(A_i,B_i,C)
            s4 = n @ c1          # sign(A_i,B_i,D)
            err = MAX_DET_ERROR
            maybe = ~(((s1 > err) & (s2 > err)) | ((s1 < -err) & (s2 < -err))
                      | ((s3 > err) & (s4 > err))
                      | ((s3 < -err) & (s4 < -err)))
            if maybe.any():
                idx = np.nonzero(maybe)[0]
                pa = tuple(c0)
                pb = tuple(c1)
                for i in idx.tolist():
                    if edge_or_vertex_crossing(tuple(v[i]), tuple(nxt[i]),
                                               pa, pb):
                        return True
        return False

    def may_intersect_cell(self, cell):
        if not self.bound.may_intersect_cell(cell):
            return False
        if cell.contains_point(tuple(self.vertices[0])):
            return True
        if self.contains_point(cell.center()):
            return True
        return self._edges_cross_cell(cell)

    def contains_cell(self, cell):
        if not self.contains_point(cell.center()):
            return False
        if cell.contains_point(tuple(self.vertices[0])):
            return False
        return not self._edges_cross_cell(cell)

    def get_cap_bound(self):
        from .cap import Cap
        return self.bound.get_cap_bound() if not self.bound.is_empty() \
            else Cap.empty()

    def num_vertices(self):
        return len(self.vertices)
