"""S2Polyline: open vertex chain (src/s2/s2polyline.d:99-560).

Implements the query/processing subset: length, centroid, interpolate /
un-interpolate, project (closest point + next-vertex), is_on_right,
intersects(other), and a conservative rect bound. Vectorized where the
hot path benefits (projection over many query points)."""

from __future__ import annotations

import math

import numpy as np

from .edge import edge_distances2, interpolate_at_distance
from .predicates import crossing_sign, sign
from .loop import Loop


class Polyline:
    __slots__ = ("vertices",)

    def __init__(self, vertices=()):
        v = np.asarray(vertices, dtype=np.float64)
        if v.size == 0:
            v = np.empty((0, 3))
        assert v.ndim == 2 and v.shape[1] == 3
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        self.vertices = v / np.where(norms == 0, 1.0, norms)

    @classmethod
    def from_latlng_degrees(cls, lat_deg, lon_deg):
        from . import coords
        x, y, z = coords.latlng_to_xyz(np.asarray(lat_deg, np.float64),
                                       np.asarray(lon_deg, np.float64))
        return cls(np.stack([x, y, z], axis=1))

    def num_vertices(self):
        return len(self.vertices)

    def _edge_angles(self):
        """Per-edge arc angles via atan2(|a x b|, a.b) — the S1Angle form,
        accurate for short edges where arccos(dot) loses ~1e-8."""
        v = self.vertices
        if len(v) < 2:
            return np.empty(0)
        a, b = v[:-1], v[1:]
        cr = np.cross(a, b)
        return np.arctan2(np.linalg.norm(cr, axis=1),
                          (a * b).sum(axis=1))

    def get_length(self):
        """Total arc length in radians (s2polyline.d:200-210)."""
        return float(self._edge_angles().sum())

    def get_centroid(self):
        """Length-weighted centroid (not normalized): per edge
        sqrt(sin2/cos2) * (a+b), whose errors cancel exactly around a
        closed great circle (s2polyline.d getCentroid)."""
        v = self.vertices
        if len(v) < 2:
            return np.zeros(3)
        vsum = v[:-1] + v[1:]
        vdiff = v[:-1] - v[1:]
        cos2 = (vsum * vsum).sum(axis=1)
        sin2 = (vdiff * vdiff).sum(axis=1)
        return (np.sqrt(sin2 / cos2)[:, None] * vsum).sum(axis=0)

    def interpolate(self, fraction):
        """Point at the given fraction of total length
        (s2polyline.d:242-245: getSuffix without the index)."""
        return self.get_suffix_point(fraction)[0]

    def project(self, x):
        """(closest point, next_vertex) with next_vertex in [1, n]
        (s2polyline.d project: min_index + 1 only on an exact end-vertex
        hit)."""
        x = np.asarray(x, dtype=np.float64)
        if len(self.vertices) == 1:
            return self.vertices[0].copy(), 1
        a = self.vertices[:-1]
        b = self.vertices[1:]
        d2 = edge_distances2(x[None, :], a, b)[0]
        k = int(np.argmin(d2))
        from .edge import project as project_edge
        p = project_edge(x, a[k], b[k])
        min_index = k + 1
        nxt = min_index + (1 if np.array_equal(p, b[k]) else 0)
        return p, nxt

    def is_on_right(self, x):
        """True if x is on the right of the polyline
        (s2polyline.d isOnRight: orderedCCW at interior vertices)."""
        from .predicates import ordered_ccw
        x = np.asarray(x, dtype=np.float64)
        p, nxt = self.project(x)
        n = len(self.vertices)
        v = self.vertices
        if np.array_equal(p, v[nxt - 1]) and 1 < nxt < n:
            if np.array_equal(x, v[nxt - 1]):
                return False  # polyline vertices are not on the RHS
            return ordered_ccw(tuple(v[nxt - 2]), tuple(x), tuple(v[nxt]),
                               tuple(v[nxt - 1]))
        if nxt == n:
            nxt -= 1
        return sign(tuple(x), tuple(v[nxt]), tuple(v[nxt - 1])) > 0

    def reverse(self):
        """In-place vertex order reversal (s2polyline.d:436)."""
        self.vertices = self.vertices[::-1].copy()

    def get_suffix_point(self, fraction):
        """(interpolated point, next_vertex) with next_vertex in [1, n]
        (s2polyline.d getSuffix:265-296); fraction >= 1 yields the last
        vertex with next_vertex == n."""
        n = len(self.vertices)
        assert n > 0
        if fraction <= 0:
            return self.vertices[0].copy(), 1
        target = fraction * self.get_length()
        angles = self._edge_angles()
        for i, ang in enumerate(angles):
            if target < ang:
                result = interpolate_at_distance(target, self.vertices[i],
                                                 self.vertices[i + 1])
                nxt = (i + 2 if np.array_equal(result, self.vertices[i + 1])
                       else i + 1)
                return result, nxt
            target -= ang
        return self.vertices[-1].copy(), n

    def un_interpolate(self, point, next_vertex):
        """Inverse of get_suffix_point, clamped to [0, 1]
        (s2polyline.d:307-330)."""
        n = len(self.vertices)
        if n < 2:
            return 0.0
        angles = self._edge_angles()
        length_sum = float(angles[:next_vertex - 1].sum())
        p = np.asarray(point, dtype=np.float64)
        a = self.vertices[next_vertex - 1]
        length_to_point = length_sum + math.atan2(
            float(np.linalg.norm(np.cross(a, p))), float(np.dot(a, p)))
        total = float(angles.sum())
        return min(1.0, length_to_point / total) if total > 0 else 0.0

    def may_intersect_cell(self, cell):
        """Conservative cell intersection (s2polyline.d:667-693)."""
        n = len(self.vertices)
        if n == 0:
            return False
        for v in self.vertices:
            if cell.contains_point(tuple(v)):
                return True
        cv = [cell.vertex(k) for k in range(4)]
        for j in range(4):
            a, b = cv[j], cv[(j + 1) & 3]
            for i in range(1, n):
                if crossing_sign(tuple(a), tuple(b),
                                 tuple(self.vertices[i - 1]),
                                 tuple(self.vertices[i])) >= 0:
                    return True
        return False

    def approx_equals(self, other, max_error_rad=1e-15):
        """Same vertex count, pairwise within max_error
        (s2polyline.d approxEquals)."""
        if len(self.vertices) != len(other.vertices):
            return False
        for a, b in zip(self.vertices, other.vertices):
            d = math.atan2(float(np.linalg.norm(np.cross(a, b))),
                           float(np.dot(a, b)))
            if d > max_error_rad:
                return False
        return True

    def subsample_vertices(self, tolerance_rad):
        """Greedy parametric simplification preserving backtracking
        (s2polyline.d:470-483 + findEndVertex:847-925): indices of the
        kept vertices."""
        n = len(self.vertices)
        if n == 0:
            return []
        indices = [0]
        tol = max(float(tolerance_rad), 0.0)
        index = 0
        while index + 1 < n:
            next_index = self._find_end_vertex(tol, index)
            if not np.array_equal(self.vertices[next_index],
                                  self.vertices[index]):
                indices.append(next_index)
            index = next_index
        return indices

    def _find_end_vertex(self, tolerance, index):
        """Maximal end index whose segment stays within tolerance of all
        interior vertices IN ORDER (the pie-wedge scan)."""
        from . import coords
        from .rect import S1Interval
        frame = np.asarray(coords.get_frame(self.vertices[index]))
        origin = self.vertices[index]
        current_wedge = S1Interval.full()
        last_distance = 0.0
        n = len(self.vertices)
        index += 1
        while index < n:
            candidate = self.vertices[index]
            distance = math.acos(float(np.clip(np.dot(origin, candidate),
                                               -1, 1)))
            # No new edges longer than 90 degrees.
            if distance > math.pi / 2 and last_distance > 0:
                break
            # Non-decreasing order along the ray outside the initial disc.
            if distance < last_distance and last_distance > tolerance:
                break
            last_distance = distance
            if distance <= tolerance:
                index += 1
                continue
            direction = coords.to_frame(frame, candidate)
            center = math.atan2(float(direction[1]), float(direction[0]))
            if not current_wedge.contains(center):
                break
            half_angle = math.asin(min(1.0, math.sin(tolerance)
                                       / math.sin(distance)))
            target = S1Interval.from_point(center).expanded(half_angle)
            current_wedge = current_wedge.intersection(target)
            index += 1
        return index - 1

    @staticmethod
    def _next_distinct(vertices, index):
        initial = vertices[index]
        index += 1
        while index < len(vertices) and np.array_equal(vertices[index],
                                                       initial):
            index += 1
        return index

    def nearly_covers(self, covered: "Polyline", max_error_rad):
        """Directed covering with backtracking preserved: DFS over
        (i, j, i_in_progress) search states (s2polyline.d:528-627)."""
        from .edge import is_edge_b_near_edge_a
        from .edge import project as project_edge
        va, vb = self.vertices, covered.vertices
        if len(vb) == 0:
            return True
        if len(va) == 0:
            return False

        def ang(u, v):
            return math.atan2(float(np.linalg.norm(np.cross(u, v))),
                              float(np.dot(u, v)))

        pending = []
        i = 0
        next_i = self._next_distinct(va, 0)
        while next_i < len(va):
            next_next_i = self._next_distinct(va, next_i)
            closest = project_edge(vb[0], va[i], va[next_i])
            if ((next_next_i == len(va)
                 or not np.array_equal(closest, va[next_i]))
                    and ang(closest, vb[0]) <= max_error_rad):
                pending.append((i, 0, True))
            i, next_i = next_i, next_next_i

        done = set()
        while pending:
            state = pending.pop()
            if state in done:
                continue
            done.add(state)
            si, sj, i_in_progress = state
            next_i = self._next_distinct(va, si)
            next_j = self._next_distinct(vb, sj)
            if next_j == len(vb):
                return True
            if next_i == len(va):
                continue
            if i_in_progress:
                j_begin = vb[sj]
                i_begin = project_edge(j_begin, va[si], va[next_i])
            else:
                i_begin = va[si]
                j_begin = project_edge(i_begin, vb[sj], vb[next_j])
            if is_edge_b_near_edge_a(j_begin, vb[next_j], i_begin,
                                     va[next_i], max_error_rad):
                pending.append((next_i, sj, False))
            if is_edge_b_near_edge_a(i_begin, va[next_i], j_begin,
                                     vb[next_j], max_error_rad):
                pending.append((si, next_j, True))
        return False

    def intersects(self, other: "Polyline"):
        """True if any edges cross (s2polyline.d:242-260)."""
        va = self.vertices
        vb = other.vertices
        for i in range(len(va) - 1):
            for j in range(len(vb) - 1):
                if crossing_sign(tuple(va[i]), tuple(va[i + 1]),
                                 tuple(vb[j]), tuple(vb[j + 1])) >= 0:
                    return True
        return False

    def get_rect_bound(self):
        """Conservative rect bound over the chain (s2polyline.d:689-696)."""
        from .rect import RectBounder
        bounder = RectBounder()
        for v in self.vertices:
            bounder.add_point(v)
        return bounder.get_bound()

    def get_suffix(self, fraction):
        """Vertices from interpolate(fraction) to the end."""
        if fraction >= 1.0:
            return Polyline(self.vertices[-1:])
        if fraction <= 0.0:
            return Polyline(self.vertices)
        target = fraction * self.get_length()
        angles = self._edge_angles()
        for i, ang in enumerate(angles):
            if target <= ang:
                p = interpolate_at_distance(target, self.vertices[i],
                                            self.vertices[i + 1])
                return Polyline(np.concatenate([[p],
                                                self.vertices[i + 1:]]))
            target -= ang
        return Polyline(self.vertices[-1:])
