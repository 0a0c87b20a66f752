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


def chord2_add(a2, b2):
    """S1ChordAngle operator+ in squared-chord space: one sqrt instead of
    trig (s1chord_angle.d:270-301)."""
    if b2 == 0.0:
        return a2
    if a2 == 0.0:
        return b2
    if a2 + b2 >= 4.0:
        return 4.0
    x = a2 * (1.0 - 0.25 * b2)
    y = b2 * (1.0 - 0.25 * a2)
    return min(4.0, x + y + 2.0 * math.sqrt(x * y))


def chord2_sub(a2, b2):
    """S1ChordAngle operator- (s1chord_angle.d:303-320)."""
    if b2 == 0.0:
        return a2
    if a2 <= b2:
        return 0.0
    x = a2 * (1.0 - 0.25 * b2)
    y = b2 * (1.0 - 0.25 * a2)
    return max(0.0, x + y - 2.0 * math.sqrt(x * y))


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
    def from_center_height(cls, center, height):
        """chord2 = 2 * height (s2cap.d:184-186)."""
        return cls(center, min(4.0, 2.0 * height))

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
        """Radius grown by an angle via chord-angle addition
        (s2cap.d:387-395)."""
        if self.is_empty():
            return Cap.empty()
        return Cap(self.center,
                   chord2_add(self.radius2, chord2_from_angle(radians)))

    def intersects_cap(self, other):
        """radius_a + radius_b >= distance(centers) in chord space
        (s2cap.d:318-323)."""
        if self.is_empty() or other.is_empty():
            return False
        return chord2_add(self.radius2, other.radius2) \
            >= chord2_between(self.center, other.center)

    def contains_cap(self, other):
        """Set containment: every cap contains the empty cap
        (s2cap.d:309-314)."""
        if self.is_full() or other.is_empty():
            return True
        return self.radius2 >= chord2_add(
            chord2_between(self.center, other.center), other.radius2)

    def interior_intersects(self, other):
        """Interior of this cap intersects other (s2cap.d:330-336)."""
        if self.radius2 <= 0.0 or other.is_empty():
            return False
        return chord2_add(self.radius2, other.radius2) \
            > chord2_between(self.center, other.center)

    def interior_contains(self, p):
        """Strict interior point containment (s2cap.d:343-348)."""
        return self.is_full() or chord2_between(self.center, p) < self.radius2

    def add_cap(self, other):
        """Grow to include the other cap (s2cap.d:373-383)."""
        if self.is_empty():
            self.center = tuple(other.center)
            self.radius2 = other.radius2
        else:
            dist = chord2_add(chord2_between(self.center, other.center),
                              other.radius2)
            # Round up to guarantee actual containment.
            dist = max(0.0, min(4.0, dist + 2.220446049250313e-16 * dist))
            self.radius2 = max(self.radius2, dist)

    def unite(self, other):
        """Smallest cap enclosing both (s2cap.d:398-419)."""
        if self.radius2 < other.radius2:
            return other.unite(self)
        if self.is_full() or other.is_empty():
            return Cap(self.center, self.radius2)
        this_radius = self.radius_radians()
        other_radius = other.radius_radians()
        distance = angle_from_chord2(chord2_between(self.center,
                                                    other.center))
        if this_radius >= distance + other_radius:
            return Cap(self.center, self.radius2)
        from .edge import interpolate_at_distance
        result_radius = 0.5 * (distance + this_radius + other_radius)
        result_center = interpolate_at_distance(
            0.5 * (distance - this_radius + other_radius),
            self.center, other.center)
        return Cap.from_center_angle(tuple(result_center), result_radius)

    def get_area(self):
        """2*pi*height (s2cap.d:235-237)."""
        return 2.0 * math.pi * max(0.0, self.height())

    def get_centroid(self):
        """True centroid times area; on the center ray (s2cap.d:254-267)."""
        if self.is_empty():
            return np.zeros(3)
        r = 1.0 - 0.5 * self.height()
        return r * self.get_area() * np.asarray(self.center)

    def is_valid(self):
        c = self.center
        n2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]
        return abs(n2 - 1.0) <= 5 * 2.220446049250313e-16 \
            and self.radius2 <= 4.0

    def approx_equals(self, other, max_error_rad=1e-14):
        """Center within max_error (angle) and radius2 within max_error
        (s2cap.d:601-611)."""
        e = max_error_rad
        ang = angle_from_chord2(chord2_between(self.center, other.center))
        return ((ang <= e and abs(self.radius2 - other.radius2) <= e)
                or (self.is_empty() and other.radius2 <= e)
                or (other.is_empty() and self.radius2 <= e)
                or (self.is_full() and other.radius2 >= 2 - e)
                or (other.is_full() and self.radius2 >= 2 - e))

    def get_rect_bound(self):
        """Tight lat/lng rect around the cap (s2cap.d:435-483)."""
        from .rect import LatLngRect, S1Interval
        if self.is_empty():
            return LatLngRect.empty()
        cx, cy, cz = self.center
        center_lat = math.atan2(cz, math.hypot(cx, cy))
        center_lng = math.atan2(cy, cx)
        cap_angle = self.radius_radians()
        all_longitudes = False
        lat_lo = center_lat - cap_angle
        if lat_lo <= -0.5 * math.pi:
            lat_lo = -0.5 * math.pi
            all_longitudes = True
        lat_hi = center_lat + cap_angle
        if lat_hi >= 0.5 * math.pi:
            lat_hi = 0.5 * math.pi
            all_longitudes = True
        lng = S1Interval.full()
        if not all_longitudes:
            # Law of sines: sin(half-width in lng) = sin(radius)/cos(lat).
            sin_a = math.sqrt(self.radius2 * (1.0 - 0.25 * self.radius2))
            sin_c = math.cos(center_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng = S1Interval(
                    math.remainder(center_lng - angle_a, 2 * math.pi),
                    math.remainder(center_lng + angle_a, 2 * math.pi))
        return LatLngRect(lat_lo, lat_hi, lng)

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
