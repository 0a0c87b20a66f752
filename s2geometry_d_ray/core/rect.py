"""S2LatLngRect: lat interval x lng interval (lng may wrap).

Reimplements the subset of ``src/s2/s2latlng_rect.d`` used as a region
(point/cell predicates, expansion, union) plus the conservative edge-aware
rect bounder of ``src/s2/s2latlng_rect_bounder.d`` used for loop bounds.
Angles are radians internally; constructors take degrees for convenience."""

from __future__ import annotations

import math

import numpy as np

_PI = math.pi
_HALF_PI = 0.5 * math.pi


class S1Interval:
    """Interval on the circle [-pi, pi], possibly inverted (wrapping)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi

    @classmethod
    def empty(cls):
        return cls(_PI, -_PI)

    @classmethod
    def full(cls):
        return cls(-_PI, _PI)

    @classmethod
    def from_point(cls, p):
        if p == -_PI:
            p = _PI
        return cls(p, p)

    @classmethod
    def from_point_pair(cls, p1, p2):
        """Minimal interval containing both points (shorter arc)."""
        if p1 == -_PI:
            p1 = _PI
        if p2 == -_PI:
            p2 = _PI
        if _positive_distance(p1, p2) <= _PI:
            return cls(p1, p2)
        return cls(p2, p1)

    def is_empty(self):
        return self.lo == _PI and self.hi == -_PI

    def is_full(self):
        return self.lo == -_PI and self.hi == _PI

    def is_inverted(self):
        return self.lo > self.hi

    def contains(self, p):
        if p == -_PI:
            p = _PI
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def interior_contains(self, p):
        if p == -_PI:
            p = _PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def union(self, other):
        if other.is_empty():
            return S1Interval(self.lo, self.hi)
        if self.is_empty():
            return S1Interval(other.lo, other.hi)
        if self.contains(other.lo) and self.contains(other.hi):
            if self.contains_interval(other):
                return S1Interval(self.lo, self.hi)
            return S1Interval.full()
        if self.contains(other.lo):
            return S1Interval(self.lo, other.hi)
        if self.contains(other.hi):
            return S1Interval(other.lo, self.hi)
        if self.is_empty() or other.contains(self.lo):
            return S1Interval(other.lo, other.hi)
        # Disjoint: choose the smaller union.
        if _positive_distance(other.hi, self.lo) < \
                _positive_distance(self.hi, other.lo):
            return S1Interval(other.lo, self.hi)
        return S1Interval(self.lo, other.hi)

    def contains_interval(self, other):
        if self.is_inverted():
            if other.is_inverted():
                return other.lo >= self.lo and other.hi <= self.hi
            return (other.lo >= self.lo or other.hi <= self.hi) and \
                not self.is_empty()
        if other.is_inverted():
            return self.is_full() or other.is_empty()
        return other.lo >= self.lo and other.hi <= self.hi

    def intersects(self, other):
        if self.is_empty() or other.is_empty():
            return False
        if self.is_inverted():
            return other.is_inverted() or other.lo <= self.hi or \
                other.hi >= self.lo
        if other.is_inverted():
            return other.lo <= self.hi or other.hi >= self.lo
        return other.lo <= self.hi and other.hi >= self.lo

    def expanded(self, margin):
        """Expand (margin > 0) or shrink (margin < 0) both endpoints
        (s1interval.d Expanded, both signs)."""
        if margin >= 0:
            if self.is_empty():
                return S1Interval(self.lo, self.hi)
            if margin == 0:
                return S1Interval(self.lo, self.hi)
            if self.get_length() + 2 * margin + 2e-15 >= 2 * _PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return S1Interval(self.lo, self.hi)
            if self.get_length() + 2 * margin - 2e-15 <= 0:
                return S1Interval.empty()
        lo = math.remainder(self.lo - margin, 2 * _PI)
        hi = math.remainder(self.hi + margin, 2 * _PI)
        if lo <= -_PI:
            lo = _PI
        return S1Interval(lo, hi)

    def intersection(self, other):
        """Intersection of circle intervals (s1interval.d Intersection;
        for two disjoint results the EMPTY interval is returned)."""
        if other.is_empty():
            return S1Interval.empty()
        if self.contains(other.lo):
            if self.contains(other.hi):
                # Either one contains the other, or the union covers
                # the circle; return the shorter candidate.
                if other.get_length() < self.get_length():
                    return S1Interval(other.lo, other.hi)
                return S1Interval(self.lo, self.hi)
            return S1Interval(other.lo, self.hi)
        if self.contains(other.hi):
            return S1Interval(self.lo, other.hi)
        if other.contains(self.lo):
            return S1Interval(self.lo, self.hi)
        return S1Interval.empty()

    def get_length(self):
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * _PI
        return length if length > 0 else -1.0


def _positive_distance(a, b):
    d = b - a
    if d >= 0:
        return d
    return (b + _PI) - (a - _PI)


class LatLngRect:
    """lat in [lat_lo, lat_hi] (radians), lng an S1Interval."""

    __slots__ = ("lat_lo", "lat_hi", "lng")

    def __init__(self, lat_lo, lat_hi, lng: S1Interval):
        self.lat_lo = lat_lo
        self.lat_hi = lat_hi
        self.lng = lng

    @classmethod
    def empty(cls):
        return cls(1.0, -1.0, S1Interval.empty())

    @classmethod
    def full(cls):
        return cls(-_HALF_PI, _HALF_PI, S1Interval.full())

    @classmethod
    def from_degrees(cls, lat_lo, lng_lo, lat_hi, lng_hi):
        return cls(math.radians(lat_lo), math.radians(lat_hi),
                   S1Interval(math.radians(lng_lo), math.radians(lng_hi)))

    @classmethod
    def from_point(cls, lat, lng):
        return cls(lat, lat, S1Interval.from_point(lng))

    def is_empty(self):
        return self.lat_lo > self.lat_hi

    def is_full(self):
        return (self.lat_lo == -_HALF_PI and self.lat_hi == _HALF_PI
                and self.lng.is_full())

    def contains_latlng(self, lat, lng):
        return (self.lat_lo <= lat <= self.lat_hi
                and self.lng.contains(lng))

    def contains_point(self, p):
        lat = math.atan2(p[2], math.hypot(p[0], p[1]))
        lng = math.atan2(p[1], p[0])
        return self.contains_latlng(lat, lng)

    def contains_batch(self, lat_rad, lon_rad):
        """Vectorized point containment for bbox prefilters."""
        lat_ok = (lat_rad >= self.lat_lo) & (lat_rad <= self.lat_hi)
        if self.lng.is_inverted():
            lng_ok = (lon_rad >= self.lng.lo) | (lon_rad <= self.lng.hi)
        else:
            lng_ok = (lon_rad >= self.lng.lo) & (lon_rad <= self.lng.hi)
        return lat_ok & lng_ok

    def union(self, other):
        if other.is_empty():
            return LatLngRect(self.lat_lo, self.lat_hi, self.lng)
        if self.is_empty():
            return LatLngRect(other.lat_lo, other.lat_hi, other.lng)
        return LatLngRect(min(self.lat_lo, other.lat_lo),
                          max(self.lat_hi, other.lat_hi),
                          self.lng.union(other.lng))

    def add_point(self, lat, lng):
        if self.is_empty():
            return LatLngRect(lat, lat, S1Interval.from_point(lng))
        return self.union(LatLngRect.from_point(lat, lng))

    def expanded(self, lat_margin, lng_margin):
        lat_lo = max(-_HALF_PI, self.lat_lo - lat_margin)
        lat_hi = min(_HALF_PI, self.lat_hi + lat_margin)
        return LatLngRect(lat_lo, lat_hi, self.lng.expanded(lng_margin))

    def intersects_rect(self, other):
        if self.is_empty() or other.is_empty():
            return False
        return (self.lat_lo <= other.lat_hi and other.lat_lo <= self.lat_hi
                and self.lng.intersects(other.lng))

    def contains_rect(self, other):
        if other.is_empty():
            return True
        return (self.lat_lo <= other.lat_lo and self.lat_hi >= other.lat_hi
                and self.lng.contains_interval(other.lng))

    # -- region interface for the coverer -------------------------------
    def get_cap_bound(self):
        from .cap import Cap, chord2_from_angle
        if self.is_empty():
            return Cap.empty()
        # Bounding cap from the mid lat/lng; conservative (s2latlng_rect.d).
        if self.is_full():
            return Cap.full()
        lat_c = 0.5 * (self.lat_lo + self.lat_hi)
        if self.lng.is_inverted() or self.lng.is_full():
            # Use a pole cap.
            if self.lat_hi + self.lat_lo >= 0:
                return Cap((0.0, 0.0, 1.0),
                           chord2_from_angle(_HALF_PI - self.lat_lo))
            return Cap((0.0, 0.0, -1.0),
                       chord2_from_angle(_HALF_PI + self.lat_hi))
        lng_c = 0.5 * (self.lng.lo + self.lng.hi)
        x = math.cos(lat_c) * math.cos(lng_c)
        y = math.cos(lat_c) * math.sin(lng_c)
        z = math.sin(lat_c)
        cap = Cap.from_point((x, y, z))
        for la in (self.lat_lo, self.lat_hi):
            for ln in (self.lng.lo, self.lng.hi):
                cap.add_point((math.cos(la) * math.cos(ln),
                               math.cos(la) * math.sin(ln), math.sin(la)))
        # Expand slightly: rect edges (parallels) bulge poleward of the
        # chord between corners.
        return cap.expanded(1e-8) if not cap.is_empty() else cap

    def _cell_rect(self, cell):
        lats = []
        lngs = []
        for k in range(4):
            p = cell.vertex(k)
            lats.append(math.atan2(p[2], math.hypot(p[0], p[1])))
            lngs.append(math.atan2(p[1], p[0]))
        r = LatLngRect.from_point(lats[0], lngs[0])
        for k in range(1, 4):
            r = r.add_point(lats[k], lngs[k])
        # Conservative expansion for edge bulge between vertices.
        return r.expanded(2e-3 / (1 << cell.level), 2e-3 / (1 << cell.level))

    def contains_cell(self, cell):
        """Conservative: False negatives allowed for interior coverings."""
        for k in range(4):
            if not self.contains_point(cell.vertex(k)):
                return False
        # Vertices inside an upright rect are sufficient only if the cell
        # edges stay inside; use the conservative cell rect.
        return self.contains_rect(self._cell_rect(cell))

    def may_intersect_cell(self, cell):
        if self.is_empty():
            return False
        return self.intersects_rect(self._cell_rect(cell))
