"""Scalar S2Cell: decoded cell geometry used by the coverer and region
predicates. Reimplements ``src/s2/s2cell.d`` (uv bounds, vertices, edge
normals, closed point containment, cap/rect bounds).

Hot path for the coverer: everything here is plain-Python scalar math
(no numpy per-call overhead); vertices are computed lazily and cached."""

from __future__ import annotations

import math

from . import cellid as ci
from .coords import LIMIT_IJ, face_uv_to_xyz_scalar
from .predicates import DBL_EPSILON

# Inward-facing edge normals (s2coords.d:294-318 GetUNorm/GetVNorm).


def _get_u_norm(face, u):
    return ((u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
            (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u))[face]


def _get_v_norm(face, v):
    return ((-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
            (v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v))[face]


def _st_to_uv(s):
    """Scalar quadratic projection (s2coords.d:433-440)."""
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


class Cell:
    """Decoded cell: face, level, uv rect (s2cell.d:46-110)."""

    __slots__ = ("id", "face", "level", "u_lo", "u_hi", "v_lo", "v_hi",
                 "_verts")

    def __init__(self, cell_id):
        cid = int(cell_id)
        self.id = cid
        face, i, j = ci.to_face_ij_scalar(cid)
        self.face = face
        self.level = ci.level_scalar(cid)
        size = 1 << (ci.MAX_LEVEL - self.level)
        i0 = i & -size
        j0 = j & -size
        scale = 1.0 / LIMIT_IJ
        self.u_lo = _st_to_uv(scale * i0)
        self.u_hi = _st_to_uv(scale * (i0 + size))
        self.v_lo = _st_to_uv(scale * j0)
        self.v_hi = _st_to_uv(scale * (j0 + size))
        self._verts = None

    def vertex_raw(self, k):
        """CCW corner k of the uv rect projected to xyz (s2cell.d:152-154)."""
        u = (self.u_lo, self.u_hi, self.u_hi, self.u_lo)[k & 3]
        v = (self.v_lo, self.v_lo, self.v_hi, self.v_hi)[k & 3]
        return face_uv_to_xyz_scalar(self.face, u, v)

    def vertex(self, k):
        return self.vertices()[k & 3]

    def vertices(self):
        if self._verts is None:
            out = []
            for k in range(4):
                x, y, z = self.vertex_raw(k)
                n = math.sqrt(x * x + y * y + z * z)
                out.append((x / n, y / n, z / n))
            self._verts = out
        return self._verts

    def edge_raw(self, k):
        """Inward-facing normal of edge k->k+1 (s2cell.d:166-173)."""
        k &= 3
        if k == 0:
            return _get_v_norm(self.face, self.v_lo)      # bottom
        if k == 1:
            return _get_u_norm(self.face, self.u_hi)      # right
        if k == 2:
            n = _get_v_norm(self.face, self.v_hi)         # top
            return (-n[0], -n[1], -n[2])
        n = _get_u_norm(self.face, self.u_lo)             # left
        return (-n[0], -n[1], -n[2])

    def get_rect_bound(self):
        """Tight lat/lng bound (s2cell.d getRectBound): for level > 0 the
        extremes are attained at diagonally opposite vertex pairs; level-0
        face cells use the precomputed table."""
        from .rect import LatLngRect, S1Interval
        eps = 2.220446049250313e-16
        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            # z-components of the u/v axes per face (s2coords GetUAxis /
            # GetVAxis): nonzero means latitude varies along that axis.
            u_axis_z = (0, 0, 0, -1, -1, 0)[self.face]
            v_axis_z = (1, 1, 0, 0, 0, 0)[self.face]
            i = int(u < 0) if u_axis_z == 0 else int(u > 0)
            j = int(v < 0) if v_axis_z == 0 else int(v > 0)

            def lat_of(ii, jj):
                x, y, z = face_uv_to_xyz_scalar(
                    self.face, (self.u_lo, self.u_hi)[ii],
                    (self.v_lo, self.v_hi)[jj])
                return math.atan2(z, math.hypot(x, y))

            def lng_of(ii, jj):
                x, y, _ = face_uv_to_xyz_scalar(
                    self.face, (self.u_lo, self.u_hi)[ii],
                    (self.v_lo, self.v_hi)[jj])
                return math.atan2(y, x)

            lat_a = lat_of(i, j)
            lat_b = lat_of(1 - i, 1 - j)
            lng = S1Interval.from_point_pair(lng_of(i, 1 - j),
                                             lng_of(1 - i, j))
            rect = LatLngRect(min(lat_a, lat_b), max(lat_a, lat_b), lng)
            return rect.expanded_latlng(2 * eps, 2 * eps).polar_closure()
        pole_min_lat = math.asin(math.sqrt(1.0 / 3)) - 0.5 * eps
        q = 0.25 * math.pi
        if self.face == 0:
            bound = LatLngRect(-q, q, S1Interval(-q, q))
        elif self.face == 1:
            bound = LatLngRect(-q, q, S1Interval(q, 3 * q))
        elif self.face == 2:
            bound = LatLngRect(pole_min_lat, 2 * q, S1Interval.full())
        elif self.face == 3:
            bound = LatLngRect(-q, q, S1Interval(3 * q, -3 * q))
        elif self.face == 4:
            bound = LatLngRect(-q, q, S1Interval(-3 * q, -q))
        else:
            bound = LatLngRect(-2 * q, -pole_min_lat, S1Interval.full())
        return bound.expanded_latlng(eps, 0.0)

    @staticmethod
    def average_area_at(level):
        """Average cell area at a level (s2cell.d:237-239)."""
        from .metrics import AVG_AREA
        return AVG_AREA.get_value(int(level))

    def average_area(self):
        return Cell.average_area_at(self.level)

    def approx_area(self):
        """Approximate area: flat quad area corrected by the spherical
        cap projection ratio 2 / (1 + sqrt(1 - r^2)) (s2cell.d:256-274);
        within 3% everywhere, 0.1% at level >= 5."""
        import math as _math

        import numpy as np
        if self.level < 2:
            return self.average_area()
        v = [np.asarray(self.vertex(k)) for k in range(4)]
        flat_area = 0.5 * float(np.linalg.norm(
            np.cross(v[2] - v[0], v[3] - v[1])))
        return flat_area * 2.0 / (1.0 + _math.sqrt(
            1.0 - min(flat_area / _math.pi, 1.0)))

    def exact_area(self):
        """Exact area as the sum of two stable triangle areas
        (s2cell.d:282-292)."""
        import numpy as np

        from .measures import triangle_area
        v = [np.asarray(self.vertex(k)) for k in range(4)]
        return float(triangle_area(v[0], v[1], v[2])
                     + triangle_area(v[0], v[2], v[3]))

    def center(self):
        """Cell center via the (si,ti) midpoint — the reference
        definition (s2cell.d getCenter == id.toPoint == getCenterSiTi);
        note this is the ST-space midpoint, which differs from the
        UV-rect midpoint at coarse levels."""
        import numpy as np

        from . import coords as _coords
        size = 1 << (ci.MAX_LEVEL - self.level)
        face, i, j = ci.to_face_ij_scalar(self.id)
        si = 2 * (i & -size) + size
        ti = 2 * (j & -size) + size
        x, y, z = _coords.face_si_ti_to_xyz(face, np.float64(si),
                                            np.float64(ti))
        x, y, z = float(x), float(y), float(z)
        n = math.sqrt(x * x + y * y + z * z)
        return (x / n, y / n, z / n)

    def contains_point(self, p):
        """Closed-cell containment with the DBL_EPSILON uv expansion
        (s2cell.d:613-629)."""
        face = self.face
        axis = face % 3
        comp = p[axis]
        if face < 3:
            if comp <= 0:
                return False
        elif comp >= 0:
            return False
        # Scalar valid_face_xyz_to_uv (s2coords.d:193-206).
        x, y, z = p[0], p[1], p[2]
        if face == 0:
            u, v = y / x, z / x
        elif face == 1:
            u, v = -x / y, z / y
        elif face == 2:
            u, v = -x / z, -y / z
        elif face == 3:
            u, v = z / x, y / x
        elif face == 4:
            u, v = z / y, -x / y
        else:
            u, v = -y / z, -x / z
        eps = DBL_EPSILON
        return (self.u_lo - eps <= u <= self.u_hi + eps and
                self.v_lo - eps <= v <= self.v_hi + eps)

    def cap_bound(self):
        """Bounding cap from the uv center (s2cell.d:482-498)."""
        from .cap import Cap
        cap = Cap.from_point(self.center())
        for v in self.vertices():
            cap.add_point(v)
        return cap

    def children(self):
        return [Cell(ci.child_scalar(self.id, pos)) for pos in range(4)]

    def contains_cell(self, other):
        lsb = ci.lsb_scalar(self.id)
        return self.id - (lsb - 1) <= int(other.id) <= self.id + (lsb - 1)

    def may_intersect_cell(self, other):
        a, b = self.id, int(other.id)
        la, lb = ci.lsb_scalar(a), ci.lsb_scalar(b)
        return b - (lb - 1) <= a + (la - 1) and b + (lb - 1) >= a - (la - 1)

    def get_cap_bound(self):
        return self.cap_bound()

    def distance2_to_point(self, p):
        """Squared chord distance from the cell to a point: 0 when
        contained, else min distance to the 4 boundary edges
        (s2cell.d:299-360 getDistance semantics)."""
        if self.contains_point(p):
            return 0.0
        import numpy as np
        from .edge import edge_distances2
        v = np.asarray(self.vertices())
        nxt = v[[1, 2, 3, 0]]
        return float(edge_distances2(np.asarray(p, dtype=float)[None, :],
                                     v, nxt).min())

    # -- faithful UVW-space distance methods (s2cell.d:301-449,669-812) ----
    def _vertex_chord_dist2(self, target_uvw, i, j):
        """Chord2 from target (in UVW space) to vertex (u_i, v_j, 1)
        normalized (s2cell.d vertexChordDist)."""
        u = (self.u_lo, self.u_hi)[i]
        v = (self.v_lo, self.v_hi)[j]
        n = math.sqrt(u * u + v * v + 1.0)
        dx = target_uvw[0] - u / n
        dy = target_uvw[1] - v / n
        dz = target_uvw[2] - 1.0 / n
        return min(4.0, dx * dx + dy * dy + dz * dz)

    def _u_edge_is_closest(self, p, v_end):
        """P closer to the interior of the lower/upper edge than to its
        endpoints (s2cell.d UEdgeIsClosest)."""
        u0, u1 = self.u_lo, self.u_hi
        v = (self.v_lo, self.v_hi)[v_end]
        dir0 = (v * v + 1, -u0 * v, -u0)
        dir1 = (v * v + 1, -u1 * v, -u1)
        return (p[0] * dir0[0] + p[1] * dir0[1] + p[2] * dir0[2] > 0
                and p[0] * dir1[0] + p[1] * dir1[1] + p[2] * dir1[2] < 0)

    def _v_edge_is_closest(self, p, u_end):
        """s2cell.d VEdgeIsClosest."""
        v0, v1 = self.v_lo, self.v_hi
        u = (self.u_lo, self.u_hi)[u_end]
        dir0 = (-u * v0, u * u + 1, -v0)
        dir1 = (-u * v1, u * u + 1, -v1)
        return (p[0] * dir0[0] + p[1] * dir0[1] + p[2] * dir0[2] > 0
                and p[0] * dir1[0] + p[1] * dir1[1] + p[2] * dir1[2] < 0)

    @staticmethod
    def _edge_distance2(dir_ij, uv):
        """Chord2 from P to a u/v-edge given the dot product with the edge
        normal (s2cell.d edgeDistance)."""
        pq2 = (dir_ij * dir_ij) / (1 + uv * uv)
        qr = 1 - math.sqrt(max(0.0, 1.0 - pq2))
        return min(4.0, pq2 + qr * qr)

    def _distance_internal2(self, target_xyz, to_interior):
        """getDistanceInternal: all work in this face's UVW coordinates
        (s2cell.d:703-760)."""
        from .edge_clipping import face_xyz_to_uvw
        t = face_xyz_to_uvw(self.face, target_xyz)
        t = (float(t[0]), float(t[1]), float(t[2]))
        dir00 = t[0] - t[2] * self.u_lo
        dir01 = t[0] - t[2] * self.u_hi
        dir10 = t[1] - t[2] * self.v_lo
        dir11 = t[1] - t[2] * self.v_hi
        inside = True
        if dir00 < 0:
            inside = False
            if self._v_edge_is_closest(t, 0):
                return self._edge_distance2(-dir00, self.u_lo)
        if dir01 > 0:
            inside = False
            if self._v_edge_is_closest(t, 1):
                return self._edge_distance2(dir01, self.u_hi)
        if dir10 < 0:
            inside = False
            if self._u_edge_is_closest(t, 0):
                return self._edge_distance2(-dir10, self.v_lo)
        if dir11 > 0:
            inside = False
            if self._u_edge_is_closest(t, 1):
                return self._edge_distance2(dir11, self.v_hi)
        if inside:
            if to_interior:
                return 0.0
            return min(self._edge_distance2(-dir00, self.u_lo),
                       self._edge_distance2(dir01, self.u_hi),
                       self._edge_distance2(-dir10, self.v_lo),
                       self._edge_distance2(dir11, self.v_hi))
        return min(self._vertex_chord_dist2(t, 0, 0),
                   self._vertex_chord_dist2(t, 1, 0),
                   self._vertex_chord_dist2(t, 0, 1),
                   self._vertex_chord_dist2(t, 1, 1))

    def get_distance2(self, target):
        """Chord2 to the cell interior (s2cell.d:301-303)."""
        return self._distance_internal2(target, True)

    def get_boundary_distance2(self, target):
        """Chord2 to the cell boundary (s2cell.d:306-308)."""
        return self._distance_internal2(target, False)

    def get_max_distance2(self, target):
        """Max chord2 from the cell to the point (s2cell.d:311-326)."""
        from .cap import chord2_sub
        from .edge_clipping import face_xyz_to_uvw
        t = face_xyz_to_uvw(self.face, target)
        t = (float(t[0]), float(t[1]), float(t[2]))
        max_dist = max(self._vertex_chord_dist2(t, 0, 0),
                       self._vertex_chord_dist2(t, 1, 0),
                       self._vertex_chord_dist2(t, 0, 1),
                       self._vertex_chord_dist2(t, 1, 1))
        if max_dist <= 2.0:  # right angle
            return max_dist
        anti = (-target[0], -target[1], -target[2])
        return chord2_sub(4.0, self.get_distance2(anti))

    def get_distance2_to_edge(self, a, b):
        """Min chord2 from the cell to edge AB; 0 if AB intersects the
        cell interior (s2cell.d:331-372)."""
        from .edge import edge_distances2
        import numpy as np
        min_dist = min(self.get_distance2(a), self.get_distance2(b))
        if min_dist == 0.0:
            return 0.0
        from .edge_crosser import EdgeCrosser
        v = [self.vertex(k) for k in range(4)]
        crosser = EdgeCrosser(tuple(a), tuple(b), v[3])
        for i in range(4):
            if crosser.crossing_sign(v[i]) >= 0:
                return 0.0
        va = np.asarray(v)
        ab_a = np.asarray(a, dtype=np.float64)[None, :]
        ab_b = np.asarray(b, dtype=np.float64)[None, :]
        d = float(edge_distances2(va, ab_a, ab_b).min())
        return min(min_dist, d)

    def get_max_distance2_to_edge(self, a, b):
        """Max chord2 from the cell to edge AB (s2cell.d:377-387)."""
        from .cap import chord2_sub
        max_dist = max(self.get_max_distance2(a), self.get_max_distance2(b))
        if max_dist <= 2.0:
            return max_dist
        na = (-a[0], -a[1], -a[2])
        nb = (-b[0], -b[1], -b[2])
        return chord2_sub(4.0, self.get_distance2_to_edge(na, nb))

    def _uv_intersects(self, other):
        return (self.u_lo <= other.u_hi and other.u_lo <= self.u_hi
                and self.v_lo <= other.v_hi and other.v_lo <= self.v_hi)

    def get_distance2_to_cell(self, target):
        """Min chord2 between two cells; 0 when they touch
        (s2cell.d:391-419)."""
        import numpy as np
        from .edge import edge_distances2
        if self.face == target.face and self._uv_intersects(target):
            return 0.0
        va = np.asarray(self.vertices())
        vb = np.asarray(target.vertices())
        d1 = edge_distances2(va, vb, vb[[1, 2, 3, 0]]).min()
        d2 = edge_distances2(vb, va, va[[1, 2, 3, 0]]).min()
        return float(min(d1, d2))

    def get_max_distance2_to_cell(self, target):
        """Max chord2 between two cells; 4 (straight) when the antipodal
        target touches this cell (s2cell.d:422-449)."""
        import numpy as np
        from .edge import max_distance2
        opposite_face = target.face - 3 if target.face >= 3 \
            else target.face + 3
        # The antipodal UV is the transpose of the original UV on the
        # opposite face (s2cell.d oppositeUV).
        if self.face == opposite_face:
            if (self.u_lo <= target.v_hi and target.v_lo <= self.u_hi
                    and self.v_lo <= target.u_hi
                    and target.u_lo <= self.v_hi):
                return 4.0
        va = [self.vertex(k) for k in range(4)]
        vb = [target.vertex(k) for k in range(4)]
        max_dist = -1.0
        for i in range(4):
            for j in range(4):
                max_dist = max(
                    max_dist,
                    max_distance2(va[i], vb[j], vb[(j + 1) & 3]),
                    max_distance2(vb[i], va[j], va[(j + 1) & 3]))
        return max_dist


def _expand_endpoint(u, max_v, sin_dist):
    """Shift the line u=const just enough that its distance to the edge
    (u,v0)-(u,v1) equals the given distance (s2cell_id.d:267-274)."""
    import math
    sin_u_shift = sin_dist * math.sqrt((1 + u * u + max_v * max_v)
                                       / (1 + u * u))
    cos_u_shift = math.sqrt(1 - sin_u_shift * sin_u_shift)
    return ((cos_u_shift * u + sin_u_shift)
            / (cos_u_shift - sin_u_shift * u))


def expanded_by_distance_uv(u_lo, u_hi, v_lo, v_hi, distance_rad):
    """Expand a (u,v)-rect on a face so it contains all points within
    `distance_rad` of the original rect (s2cell_id.d:243-258
    expandedByDistanceUV).  Negative distances shrink the rect; returns
    (u_lo', u_hi', v_lo', v_hi') which may be inverted (empty) when
    shrunk away."""
    import math
    max_u = max(abs(u_lo), abs(u_hi))
    max_v = max(abs(v_lo), abs(v_hi))
    sin_dist = math.sin(distance_rad)
    return (_expand_endpoint(u_lo, max_v, -sin_dist),
            _expand_endpoint(u_hi, max_v, sin_dist),
            _expand_endpoint(v_lo, max_u, -sin_dist),
            _expand_endpoint(v_hi, max_u, sin_dist))


def _cell_boundary_edges(cell):
    import numpy as np
    v = np.asarray(cell.vertices())
    return v, v[[1, 2, 3, 0]]


def cell_distance2(a, b):
    """Squared chord distance between two cells (s2cell.d getDistance
    (S2Cell) semantics): 0 when they touch/overlap, else the min
    distance between their boundaries (vertex-to-edge both ways)."""
    import numpy as np

    from .edge import edge_distances2
    if a.contains_cell(b) or b.contains_cell(a) \
            or a.may_intersect_cell(b):
        return 0.0
    va, na = _cell_boundary_edges(a)
    vb, nb = _cell_boundary_edges(b)
    d1 = edge_distances2(va, vb, nb).min()
    d2 = edge_distances2(vb, va, na).min()
    return float(min(d1, d2))
