"""S2Cap: spherical disc region (center + squared-chord radius).

Reimplements the region predicates of ``src/s2/s2cap.d`` needed by the
coverer and radius queries: point/cell containment, cell intersection,
complement, expansion by an angle. Distances are squared chord lengths
(S1ChordAngle semantics, s2/s1chord_angle.d:44-57)."""

from __future__ import annotations

import math

import numpy as np


def chord2_from_angle(radians):
    """S1ChordAngle.fromRadians: length2 = (2*sin(min(pi,a)/2))^2."""
    if radians < 0:
        return -1.0
    return min(4.0, 4.0 * math.sin(0.5 * min(math.pi, radians)) ** 2)


def angle_from_chord2(length2):
    if length2 < 0:
        return -1.0
    return 2.0 * math.asin(0.5 * math.sqrt(min(4.0, length2)))


def chord2_between(a, b):
    d0 = a[0] - b[0]
    d1 = a[1] - b[1]
    d2 = a[2] - b[2]
    return min(4.0, d0 * d0 + d1 * d1 + d2 * d2)


class Cap:
    """center: unit xyz tuple; radius2: squared chord length in [-1, 4]."""

    __slots__ = ("center", "radius2")

    def __init__(self, center, radius2):
        self.center = tuple(float(c) for c in center)
        self.radius2 = float(radius2)

    # -- constructors --------------------------------------------------
    @classmethod
    def from_point(cls, p):
        return cls(p, 0.0)

    @classmethod
    def from_center_angle(cls, center, radians):
        return cls(center, chord2_from_angle(radians))

    @classmethod
    def from_latlng_radius(cls, lat_deg, lon_deg, radius_rad):
        from . import coords
        x, y, z = coords.latlng_to_xyz(lat_deg, lon_deg)
        return cls((float(x), float(y), float(z)),
                   chord2_from_angle(radius_rad))

    @classmethod
    def empty(cls):
        return cls((1.0, 0.0, 0.0), -1.0)

    @classmethod
    def full(cls):
        return cls((1.0, 0.0, 0.0), 4.0)

    # -- basic state ---------------------------------------------------
    def is_empty(self):
        return self.radius2 < 0

    def is_full(self):
        return self.radius2 >= 4.0

    def height(self):
        """height = radius2 / 2 (s2cap.d: h = r^2/2 identity)."""
        return 0.5 * self.radius2

    def radius_radians(self):
        return angle_from_chord2(self.radius2)

    def complement(self):
        """s2cap.d complement: full->empty, empty->full, else mirror."""
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        c = self.center
        return Cap((-c[0], -c[1], -c[2]), 4.0 - self.radius2)

    # -- point ops -----------------------------------------------------
    def contains_point(self, p):
        return chord2_between(self.center, p) <= self.radius2

    def contains_points_batch(self, x, y, z):
        cx, cy, cz = self.center
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        return d2 <= self.radius2

    def add_point(self, p):
        """Grow to include p (s2cap.d:355-375)."""
        if self.is_empty():
            self.center = tuple(p)
            self.radius2 = 0.0
        else:
            self.radius2 = max(self.radius2, chord2_between(self.center, p))

    def expanded(self, radians):
        """Radius grown by an angle (s2cap.d expanded)."""
        if self.is_empty():
            return Cap.empty()
        return Cap(self.center,
                   chord2_from_angle(self.radius_radians() + radians))

    def intersects_cap(self, other):
        if self.is_empty() or other.is_empty():
            return False
        ra = self.radius_radians()
        rb = other.radius_radians()
        d = angle_from_chord2(chord2_between(self.center, other.center))
        return ra + rb >= d

    # -- cell ops (s2cap.d:81-127,514-539) -----------------------------
    def _intersects_cell(self, cell, vertices):
        """Cap intersects cell at a non-vertex point (s2cap.d:81-127)."""
        if self.radius2 >= 2.0:  # >= right angle: complement convex
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self.radius2 * (1.0 - 0.25 * self.radius2)  # sin^2(r)
        for k in range(4):
            edge = cell.edge_raw(k)
            dot = (self.center[0] * edge[0] + self.center[1] * edge[1]
                   + self.center[2] * edge[2])
            if dot > 0:
                continue
            en2 = edge[0] ** 2 + edge[1] ** 2 + edge[2] ** 2
            if dot * dot > sin2_angle * en2:
                return False
            # The great circle through the edge intersects the cap: check the
            # point of closest approach lies between the edge endpoints
            # (s2cap.d:122-127).
            dirv = np.cross(edge, self.center)
            if (np.dot(dirv, vertices[k]) < 0
                    and np.dot(dirv, vertices[(k + 1) & 3]) > 0):
                return True
        return False

    def contains_cell(self, cell):
        vertices = [cell.vertex(k) for k in range(4)]
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects_cell(cell, vertices)

    def may_intersect_cell(self, cell):
        vertices = [cell.vertex(k) for k in range(4)]
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects_cell(cell, vertices)

    def get_cap_bound(self):
        return Cap(self.center, self.radius2)
