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
from .predicates import (MAX_DET_ERROR, ORIGIN, crossing_sign,
                         edge_or_vertex_crossing, ordered_ccw, ortho)
from .rect import (S1Interval, LatLngRect, RectBounder,
                   expand_for_subregions)

# Single-vertex sentinel chains for the empty / full loops
# (s2loop.d:1373-1380 emptyVertex/fullVertex).
EMPTY_VERTEX = (0.0, 0.0, 1.0)
FULL_VERTEX = (0.0, 0.0, -1.0)


class Loop:
    """vertices: (n, 3) float64 unit vectors, CCW order = interior on left.

    A single-vertex loop is the empty loop (vertex (0,0,1)) or the full
    loop (vertex (0,0,-1)), as in the reference (s2loop.d:150-158)."""

    __slots__ = ("vertices", "origin_inside", "bound", "subregion_bound",
                 "_edge_normals", "_normal_dot_origin", "depth", "_next",
                 "_vT_ext", "_nT")

    def __init__(self, vertices, depth=0):
        v = np.asarray(vertices, dtype=np.float64)
        if v.ndim == 1:
            v = v[None, :]
        assert v.ndim == 2 and v.shape[1] == 3 and (len(v) >= 3
                                                    or len(v) == 1)
        # Normalize ONLY meaningfully off-unit rows. The reference stores
        # vertices verbatim; renormalizing an already-unit vector changes
        # its low bits, which flips exact-arithmetic orientations of
        # nearly-degenerate triangles relative to the caller's own sign
        # computations on the same points.
        norms2 = np.einsum("ij,ij->i", v, v)
        off = np.abs(norms2 - 1.0) > 1.2e-14
        if off.any():
            v = v.copy()
            v[off] /= np.sqrt(norms2[off])[:, None]
        self.vertices = v
        self.depth = depth
        if len(v) == 1:
            # Empty or full loop (s2loop.d initOriginAndBound for n < 3:
            # origin_inside = vertex(0).z < 0).
            self._next = v
            self._edge_normals = np.zeros((0, 3))
            self._normal_dot_origin = np.zeros(0)
            self._vT_ext = np.ascontiguousarray(
                np.concatenate([v, v[:1]], axis=0).T)
            self._nT = np.zeros((3, 0))
            self.origin_inside = bool(v[0][2] < 0)
            self.bound = LatLngRect.full() if self.origin_inside \
                else LatLngRect.empty()
            self.subregion_bound = self.bound
            return
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
        self.subregion_bound = expand_for_subregions(self.bound)

    @classmethod
    def empty(cls):
        return cls(np.array([EMPTY_VERTEX]))

    @classmethod
    def full(cls):
        return cls(np.array([FULL_VERTEX]))

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
        if len(self.vertices) == 1:
            m = np.asarray(points).shape[0]
            return np.full(m, self.origin_inside, dtype=bool)
        return self._contains_counting(points)

    def contains_point(self, p):
        return bool(self.contains_points(np.asarray(p)[None, :])[0])

    # ------------------------------------------------------------------
    def _compute_bound(self):
        """Loop rect bound: RectBounder over the closed vertex chain, then
        pole-containment adjustments (s2loop.d initBound)."""
        bounder = RectBounder()
        v = self.vertices
        for i in range(len(v)):
            bounder.add_point((v[i, 0], v[i, 1], v[i, 2]))
        bounder.add_point((v[0, 0], v[0, 1], v[0, 2]))  # close the chain
        b = bounder.get_bound()
        if self.contains_point((0.0, 0.0, 1.0)):
            b = LatLngRect(b.lat_lo, 0.5 * math.pi, S1Interval.full())
        # If the loop contains the south pole then either the longitude
        # range is full (it wraps the sphere) or it also contains the north
        # pole (handled above).
        if b.lng.is_full() and self.contains_point((0.0, 0.0, -1.0)):
            b = LatLngRect(-0.5 * math.pi, b.lat_hi, b.lng)
        return b

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

    # ------------------------------------------------------------------
    # Loop identity / orientation (s2loop.d:378-421, 560-610)
    # ------------------------------------------------------------------
    def vertex(self, i):
        """Vertex with wraparound, valid for i in [0, 2n)
        (s2loop.d vertex())."""
        n = len(self.vertices)
        return tuple(self.vertices[i if i < n else i - n])

    def is_empty_or_full(self):
        return len(self.vertices) == 1

    def is_empty(self):
        return self.is_empty_or_full() and not self.origin_inside

    def is_full(self):
        return self.is_empty_or_full() and self.origin_inside

    def contains_origin(self):
        return self.origin_inside

    def clone(self):
        return Loop(self.vertices.copy(), self.depth)

    def invert(self):
        """Reverse vertex order, complementing the region
        (s2loop.d:405-421). Rebuilds all derived state in place."""
        if self.is_empty_or_full():
            new_v = np.array([FULL_VERTEX if self.is_empty()
                              else EMPTY_VERTEX])
        else:
            new_v = self.vertices[::-1].copy()
        self.__init__(new_v, self.depth)

    def get_turning_angle(self):
        """Sum of turning angles: canonical vertex order + Kahan summation
        so rotation is exact and reversal exactly negates (s2loop.d:560-593).
        """
        from .measures import turn_angle
        if self.is_empty_or_full():
            return -2.0 * math.pi if self.contains_origin() \
                else 2.0 * math.pi
        n = len(self.vertices)
        if n < 3:
            return 0.0
        i, direction = self._canonical_first_vertex()
        total = turn_angle(self.vertex((i + n - direction) % n),
                           self.vertex(i), self.vertex((i + direction) % n))
        compensation = 0.0
        remaining = n
        while remaining > 1:
            remaining -= 1
            i += direction
            ang = turn_angle(self.vertex(i - direction), self.vertex(i),
                             self.vertex(i + direction))
            old_total = total
            ang += compensation
            total += ang
            compensation = (old_total - total) + ang
        return direction * (total + compensation)

    def get_turning_angle_max_error(self):
        """9.73 eps per vertex (s2loop.d:600-610)."""
        return 9.73 * 2.220446049250313e-16 * len(self.vertices)

    def _canonical_first_vertex(self):
        """(first, dir) so that the vertex sequence (first, first+dir, ...)
        does not depend on loop rotation/direction (s2loop.d:1640-1656)."""
        first = 0
        n = len(self.vertices)
        for i in range(1, n):
            if self.vertex(i) < self.vertex(first):
                first = i
        if self.vertex(first + 1) < self.vertex(first + n - 1):
            return first, 1
        return first + n, -1

    def is_normalized(self):
        """Area at most 2*pi, consistent with sign() for degenerate loops
        (s2loop.d:378-388)."""
        if self.bound.lng.get_length() < math.pi:
            return True
        return self.get_turning_angle() >= -self.get_turning_angle_max_error()

    def normalize(self):
        if not self.is_normalized():
            self.invert()

    def get_area(self):
        """Area of the interior in [0, 4pi]: signed surface integral with
        orientation disambiguation near 0 / 4pi (s2loop.d:428-525)."""
        from .measures import loop_signed_area
        if self.is_empty_or_full():
            return 4.0 * math.pi if self.contains_origin() else 0.0
        area = loop_signed_area(self.vertices)
        max_error = self.get_turning_angle_max_error()
        if area < 0:
            area += 4.0 * math.pi
        area = max(0.0, min(4.0 * math.pi, area))
        if area < max_error and not self.is_normalized():
            return 4.0 * math.pi
        if area > (4.0 * math.pi - max_error) and self.is_normalized():
            return 0.0
        return area

    def get_centroid(self):
        """True centroid times area (not normalized; s2loop.d:542-548)."""
        from .measures import loop_centroid
        if self.is_empty_or_full():
            return np.zeros(3)
        return loop_centroid(self.vertices)

    def find_vertex(self, p):
        """Index in [1..n] of vertex equal to p, or -1 (s2loop.d:1661)."""
        n = len(self.vertices)
        for i in range(1, n + 1):
            if self.vertex(i) == tuple(p):
                return i
        return -1

    # ------------------------------------------------------------------
    # Loop-loop relations (s2loop.d:664-742, 1160-1254, 1698-1740)
    # ------------------------------------------------------------------
    def contains_loop(self, b):
        """True if this loop's region is a superset of b's
        (s2loop.d:664-708)."""
        if not self.subregion_bound.contains_rect(b.bound):
            return False
        if self.is_empty_or_full() or b.is_empty_or_full():
            return self.is_full() or b.is_empty()
        relation = _ContainsRelation()
        if _has_crossing_relation(self, b, relation):
            return False
        if relation.found_shared_vertex:
            return True
        if not self.contains_point(b.vertex(0)):
            return False
        # (A union B) == sphere => A does not contain B.
        if ((b.subregion_bound.contains_rect(self.bound)
             or b.bound.union(self.bound).is_full())
                and b.contains_point(self.vertex(0))):
            return False
        return True

    def intersects_loop(self, b):
        """True if the regions intersect (s2loop.d:714-742)."""
        if not self.bound.intersects_rect(b.bound):
            return False
        relation = _IntersectsRelation()
        if _has_crossing_relation(self, b, relation):
            return True
        if relation.found_shared_vertex:
            return False
        if (self.subregion_bound.contains_rect(b.bound)
                or self.bound.union(b.bound).is_full()):
            if self.contains_point(b.vertex(0)):
                return True
        if b.subregion_bound.contains_rect(self.bound):
            if b.contains_point(self.vertex(0)):
                return True
        return False

    def contains_nested(self, b):
        """Containment assuming the boundaries do not cross and there are
        no shared edges (s2loop.d:1160-1181)."""
        from .wedge import wedge_contains
        if not self.subregion_bound.contains_rect(b.bound):
            return False
        if self.is_empty_or_full() or b.num_vertices() < 2:
            return self.is_full() or b.is_empty()
        m = self.find_vertex(b.vertex(1))
        if m < 0:
            return self.contains_point(b.vertex(1))
        return wedge_contains(self.vertex(m - 1), self.vertex(m),
                              self.vertex(m + 1), b.vertex(0), b.vertex(2))

    def compare_boundary(self, b):
        """+1 if this contains b's boundary, -1 if it excludes it, 0 if the
        boundaries cross; shared edges contained iff reversed == b.is_hole
        (s2loop.d:1200-1223)."""
        assert not self.is_empty() and not b.is_empty()
        if not self.bound.intersects_rect(b.bound):
            return -1
        if self.is_full():
            return 1
        if b.is_full():
            return -1
        relation = _CompareBoundaryRelation(b.is_hole())
        if _has_crossing_relation(self, b, relation):
            return 0
        if relation.found_shared_vertex:
            return 1 if relation.contains_edge else -1
        return 1 if self.contains_point(b.vertex(0)) else -1

    def contains_non_crossing_boundary(self, b, reverse_b):
        """Given non-crossing boundaries, does this contain b's boundary
        (s2loop.d:1235-1254)."""
        if not self.bound.intersects_rect(b.bound):
            return False
        if self.is_full():
            return True
        if b.is_full():
            return False
        m = self.find_vertex(b.vertex(0))
        if m < 0:
            return self.contains_point(b.vertex(0))
        return _wedge_contains_semiwedge(
            self.vertex(m - 1), self.vertex(m), self.vertex(m + 1),
            b.vertex(1), reverse_b)

    def is_hole(self):
        return (self.depth & 1) != 0

    # ------------------------------------------------------------------
    # Boundary comparisons (s2loop.d:748-831, 2278-2324)
    # ------------------------------------------------------------------
    def equals(self, b):
        if len(self.vertices) != len(b.vertices):
            return False
        return all(self.vertex(i) == b.vertex(i)
                   for i in range(len(self.vertices)))

    def boundary_equals(self, b):
        """Same vertices in the same cyclic order (s2loop.d:762-779)."""
        n = len(self.vertices)
        if n != len(b.vertices):
            return False
        if self.is_empty_or_full():
            return self.is_empty() == b.is_empty()
        b0 = b.vertex(0)
        for offset in range(n):
            if self.vertex(offset) == b0:
                return all(self.vertex(i + offset) == b.vertex(i)
                           for i in range(n))
        return False

    def boundary_approx_equals(self, b, max_error_rad=1e-15):
        """Same cyclic order with per-vertex perturbations
        (s2loop.d:787-809)."""
        n = len(self.vertices)
        if n != len(b.vertices):
            return False
        if self.is_empty_or_full():
            return self.is_empty() == b.is_empty()
        b0 = b.vertex(0)
        for offset in range(n):
            if _approx_eq_pt(self.vertex(offset), b0, max_error_rad):
                if all(_approx_eq_pt(self.vertex(i + offset), b.vertex(i),
                                     max_error_rad) for i in range(n)):
                    return True
        return False

    def boundary_near(self, b, max_error_rad=1e-15):
        """Boundaries within max_error along their entire lengths
        (s2loop.d:821-831)."""
        if self.is_empty_or_full() or b.is_empty_or_full():
            return ((self.is_empty() and b.is_empty())
                    or (self.is_full() and b.is_full()))
        for a_offset in range(len(self.vertices)):
            if _match_boundaries(self, b, a_offset, max_error_rad):
                return True
        return False

    # ------------------------------------------------------------------
    # Distance / projection (s2loop.d:616-658; brute over edges, which is
    # the right shape for the small per-loop geometry handled here — the
    # dataset-scale boundary-distance path lives in core/shapeindex.py)
    # ------------------------------------------------------------------
    def get_distance_to_boundary_rad(self, x):
        from .edge import chord2_to_radians, edge_distances2
        if self.is_empty_or_full():
            return math.inf
        d2 = edge_distances2(np.asarray(x, dtype=np.float64)[None, :],
                             self.vertices, self._next)
        return chord2_to_radians(float(d2.min()))

    def get_distance_rad(self, x):
        if self.is_empty():
            return math.inf
        if self.contains_point(x):
            return 0.0
        return self.get_distance_to_boundary_rad(x)

    def project_to_boundary(self, x):
        from .edge import edge_distances2, project
        if self.is_empty_or_full():
            return tuple(x)
        d2 = edge_distances2(np.asarray(x, dtype=np.float64)[None, :],
                             self.vertices, self._next)[0]
        j = int(np.argmin(d2))
        return tuple(project(x, tuple(self.vertices[j]),
                             tuple(self._next[j])))

    def project_point(self, x):
        if self.contains_point(x):
            return tuple(x)
        return self.project_to_boundary(x)

    # ------------------------------------------------------------------
    # Validation (s2loop.d findValidationError, abridged to the checks the
    # reference performs: vertex count, unit length, degenerate edges,
    # duplicate vertices, adjacent antipodal vertices, edge crossings)
    # ------------------------------------------------------------------
    def find_validation_error(self):
        if self.is_empty_or_full():
            return None
        v = self.vertices
        n = len(v)
        if n < 3:
            return "loops must have at least 3 vertices"
        seen = {}
        for i in range(n):
            t = tuple(v[i])
            if t in seen:
                return "duplicate vertex at %d and %d" % (seen[t], i)
            seen[t] = i
        for i in range(n):
            a, b = self.vertex(i), self.vertex(i + 1)
            if a == b:
                return "degenerate edge at %d" % i
            if a == (-b[0], -b[1], -b[2]):
                return "adjacent antipodal vertices at %d" % i
        # Self-intersection: any properly-crossing edge pair.
        pairs = _proper_crossings(v, self._next, v, self._next)
        for i, j in pairs:
            if i != j:  # (i == j is the edge against itself: impossible)
                return "edges %d and %d cross" % (i, j)
        return None

    def is_valid(self):
        return self.find_validation_error() is None

    # ------------------------------------------------------------------
    @classmethod
    def make_regular_frame(cls, frame, radius_rad, n):
        """Regular loop around the frame's z axis, first vertex toward +x
        (s2loop.d:964-979 makeRegularLoop)."""
        z = math.cos(radius_rad)
        r = math.sin(radius_rad)
        step = 2.0 * math.pi / n
        pts = []
        for i in range(n):
            ang = i * step
            p = np.array([r * math.cos(ang), r * math.sin(ang), z])
            q = coords.from_frame(frame, p)
            pts.append(q / np.linalg.norm(q))
        return cls(np.asarray(pts))

    @classmethod
    def make_regular_xyz(cls, center_xyz, radius_rad, n):
        """makeRegularLoop(center, radius, n) (s2loop.d:952-956)."""
        return cls.make_regular_frame(coords.get_frame(center_xyz),
                                      radius_rad, n)


# ---------------------------------------------------------------------------
# Loop relations: crossing detection + shared-vertex wedge processing
# (s2loop.d:1698-1982). The index-walking LoopCrosser is replaced by a
# vectorized all-pairs triage prefilter (the loops handled through this
# API are small-side geometry; the dataset-scale crossing path is
# core/crossing.py), with identical crossing/wedge semantics.
# ---------------------------------------------------------------------------

class _ContainsRelation:
    """A.contains(B) wedge rule (s2loop.d:1798-1830)."""

    found_shared_vertex = False

    def wedges_cross(self, a0, ab1, a2, b0, b2):
        from .wedge import wedge_contains
        self.found_shared_vertex = True
        return not wedge_contains(a0, ab1, a2, b0, b2)


class _IntersectsRelation:
    """A.intersects(B) wedge rule (s2loop.d:1833-1865)."""

    found_shared_vertex = False

    def wedges_cross(self, a0, ab1, a2, b0, b2):
        from .wedge import wedge_intersects
        self.found_shared_vertex = True
        return wedge_intersects(a0, ab1, a2, b0, b2)


class _CompareBoundaryRelation:
    """A.compareBoundary(B) wedge rule (s2loop.d:1882-1940)."""

    def __init__(self, reverse_b):
        self.reverse_b = reverse_b
        self.found_shared_vertex = False
        self.contains_edge = False
        self.excludes_edge = False

    def wedges_cross(self, a0, ab1, a2, b0, b2):
        self.found_shared_vertex = True
        if _wedge_contains_semiwedge(a0, ab1, a2, b2, self.reverse_b):
            self.contains_edge = True
        else:
            self.excludes_edge = True
        return self.contains_edge and self.excludes_edge


def _wedge_contains_semiwedge(a0, ab1, a2, b2, reverse_b):
    """Wedge (a0, ab1, a2) contains the open set of rays immediately CCW
    (CW if reverse_b) from edge (ab1, b2) (s2loop.d:1871-1879)."""
    if b2 == a0 or b2 == a2:
        return (b2 == a0) == reverse_b
    return ordered_ccw(a0, a2, b2, ab1)


def _proper_crossings(a0, a1, b0, b1):
    """(i, j) pairs of properly-crossing edges: vectorized 4-sign triage
    prefilter + robust scalar confirmation (crossing_sign > 0)."""
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    na = np.cross(a0, a1)
    nb = np.cross(b0, b1)
    s_b0 = na @ b0.T
    s_b1 = na @ b1.T
    s_a0 = (nb @ a0.T).T
    s_a1 = (nb @ a1.T).T
    e = MAX_DET_ERROR
    no = (((s_b0 > e) & (s_b1 > e)) | ((s_b0 < -e) & (s_b1 < -e))
          | ((s_a0 > e) & (s_a1 > e)) | ((s_a0 < -e) & (s_a1 < -e)))
    out = []
    for i, j in zip(*(idx.tolist() for idx in np.nonzero(~no))):
        if crossing_sign(tuple(a0[i]), tuple(a1[i]),
                         tuple(b0[j]), tuple(b1[j])) > 0:
            out.append((i, j))
    return out


def _has_crossing_relation(a, b, relation):
    """True if the boundaries cross, or a shared-vertex wedge pair is
    equivalent to a crossing per the relation (s2loop.d:1698-1740
    semantics; every shared vertex is processed exactly once, as the
    reference's a.vertex(i+1) == b.vertex(j+1) convention)."""
    if a.is_empty_or_full() or b.is_empty_or_full():
        return False  # no edges in either index (s2loop.d:1698-1740)
    if _proper_crossings(a.vertices, a._next, b.vertices, b._next):
        return True
    # Shared vertices: map each B vertex to its index.
    bmap = {}
    nb = len(b.vertices)
    for j in range(nb):
        bmap[b.vertex(j)] = j
    n = len(a.vertices)
    for i in range(n):
        ab1 = a.vertex(i + 1)
        j1 = bmap.get(ab1)
        if j1 is None:
            continue
        j = (j1 - 1) % nb
        if relation.wedges_cross(a.vertex(i), ab1, a.vertex(i + 2),
                                 b.vertex(j), b.vertex(j + 2)):
            return True
    return False


def _approx_eq_pt(p, q, max_error_rad):
    """Angle(p, q) <= max_error (s2pointutil approxEquals)."""
    cr = np.cross(p, q)
    ang = math.atan2(float(np.linalg.norm(cr)),
                     float(np.dot(p, q)))
    return ang <= max_error_rad


def _match_boundaries(a, b, a_offset, max_error_rad):
    """Backtracking two-pointer walk around both loops
    (s2loop.d:2278-2324 matchBoundaries)."""
    from .edge import chord2_to_radians, edge_distances2

    def dist(x, e0, e1):
        d2 = edge_distances2(np.asarray(x, dtype=np.float64)[None, :],
                             np.asarray(e0, dtype=np.float64)[None, :],
                             np.asarray(e1, dtype=np.float64)[None, :])
        return chord2_to_radians(float(d2[0, 0]))

    na, nb = len(a.vertices), len(b.vertices)
    pending = [(0, 0)]
    done = set()
    while pending:
        i, j = pending.pop()
        if i == na and j == nb:
            return True
        done.add((i, j))
        io = i + a_offset
        if io >= na:
            io -= na
        if (i < na and (i + 1, j) not in done
                and dist(a.vertex(io + 1), b.vertex(j),
                         b.vertex(j + 1)) <= max_error_rad):
            pending.append((i + 1, j))
        if (j < nb and (i, j + 1) not in done
                and dist(b.vertex(j + 1), a.vertex(io),
                         a.vertex(io + 1)) <= max_error_rad):
            pending.append((i, j + 1))
    return False
