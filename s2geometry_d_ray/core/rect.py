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
    """Interval on the circle [-pi, pi], possibly inverted (wrapping).

    Full port of ``src/s2/s1interval.d``: the constructor normalizes a
    -pi endpoint to pi (unless the other endpoint is pi), matching the
    reference's representation invariant."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi, _checked=False):
        if not _checked:
            # Both conditions test the ORIGINAL arguments (s1interval.d:88-99
            # reads the constructor parameters, not the updated bounds), so
            # [-pi, -pi] normalizes to [pi, pi].
            new_lo, new_hi = lo, hi
            if lo == -_PI and hi != _PI:
                new_lo = _PI
            if hi == -_PI and lo != _PI:
                new_hi = _PI
            lo, hi = new_lo, new_hi
        self.lo = lo
        self.hi = hi

    @classmethod
    def empty(cls):
        return cls(_PI, -_PI, _checked=True)

    @classmethod
    def full(cls):
        return cls(-_PI, _PI, _checked=True)

    @classmethod
    def from_point(cls, p):
        if p == -_PI:
            p = _PI
        return cls(p, p, _checked=True)

    @classmethod
    def from_point_pair(cls, p1, p2):
        """Minimal interval containing both points (shorter arc)."""
        if p1 == -_PI:
            p1 = _PI
        if p2 == -_PI:
            p2 = _PI
        if _positive_distance(p1, p2) <= _PI:
            return cls(p1, p2, _checked=True)
        return cls(p2, p1, _checked=True)

    def is_valid(self):
        return (abs(self.lo) <= _PI and abs(self.hi) <= _PI
                and not (self.lo == -_PI and self.hi != _PI)
                and not (self.hi == -_PI and self.lo != _PI))

    def is_empty(self):
        return self.lo == _PI and self.hi == -_PI

    def is_full(self):
        return self.lo == -_PI and self.hi == _PI

    def is_inverted(self):
        return self.lo > self.hi

    def __eq__(self, other):
        return self.lo == other.lo and self.hi == other.hi

    def __hash__(self):
        return hash((self.lo, self.hi))

    def get_center(self):
        """Midpoint; arbitrary for empty/full (s1interval.d:191-198)."""
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        return center + _PI if center <= 0 else center - _PI

    def get_complement_center(self):
        """Midpoint of the complement; antipode for singletons
        (s1interval.d:227-233)."""
        if self.lo != self.hi:
            return self.complement().get_center()
        return self.hi + _PI if self.hi <= 0 else self.hi - _PI

    def complement(self):
        """Complement of the interior (s1interval.d:217-222)."""
        if self.lo == self.hi:
            return S1Interval.full()  # singleton
        return S1Interval(self.hi, self.lo, _checked=True)

    def fast_contains(self, p):
        """Closed containment without -pi normalization
        (s1interval.d:60-66)."""
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, p):
        if p == -_PI:
            p = _PI
        return self.fast_contains(p)

    def interior_contains(self, p):
        if p == -_PI:
            p = _PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, other):
        """s1interval.d:266-280."""
        if self.is_inverted():
            if other.is_inverted():
                return other.lo >= self.lo and other.hi <= self.hi
            return (other.lo >= self.lo or other.hi <= self.hi) and \
                not self.is_empty()
        if other.is_inverted():
            return self.is_full() or other.is_empty()
        return other.lo >= self.lo and other.hi <= self.hi

    def interior_contains_interval(self, other):
        """s1interval.d:286-298."""
        if self.is_inverted():
            if not other.is_inverted():
                return other.lo > self.lo or other.hi < self.hi
            return (other.lo > self.lo and other.hi < self.hi) \
                or other.is_empty()
        if other.is_inverted():
            return self.is_full() or other.is_empty()
        return (other.lo > self.lo and other.hi < self.hi) or self.is_full()

    def intersects(self, other):
        if self.is_empty() or other.is_empty():
            return False
        if self.is_inverted():
            return other.is_inverted() or other.lo <= self.hi or \
                other.hi >= self.lo
        if other.is_inverted():
            return other.lo <= self.hi or other.hi >= self.lo
        return other.lo <= self.hi and other.hi >= self.lo

    def interior_intersects(self, other):
        """s1interval.d:321-333."""
        if self.is_empty() or other.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return other.is_inverted() or other.lo < self.hi \
                or other.hi > self.lo
        if other.is_inverted():
            return other.lo < self.hi or other.hi > self.lo
        return (other.lo < self.hi and other.hi > self.lo) or self.is_full()

    def union(self, other):
        """Smallest interval containing both (s1interval.d unite)."""
        if other.is_empty():
            return S1Interval(self.lo, self.hi, _checked=True)
        if self.fast_contains(other.lo):
            if self.fast_contains(other.hi):
                if self.contains_interval(other):
                    return S1Interval(self.lo, self.hi, _checked=True)
                return S1Interval.full()
            return S1Interval(self.lo, other.hi, _checked=True)
        if self.fast_contains(other.hi):
            return S1Interval(other.lo, self.hi, _checked=True)
        if self.is_empty() or other.fast_contains(self.lo):
            return S1Interval(other.lo, other.hi, _checked=True)
        # Disjoint: choose the smaller union.
        if _positive_distance(other.hi, self.lo) < \
                _positive_distance(self.hi, other.lo):
            return S1Interval(other.lo, self.hi, _checked=True)
        return S1Interval(self.lo, other.hi, _checked=True)

    def add_point(self, p):
        """Minimal expansion to contain p; returns a new interval
        (s1interval.d addPoint)."""
        if p == -_PI:
            p = _PI
        if self.fast_contains(p):
            return S1Interval(self.lo, self.hi, _checked=True)
        if self.is_empty():
            return S1Interval.from_point(p)
        if _positive_distance(p, self.lo) < _positive_distance(self.hi, p):
            return S1Interval(p, self.hi, _checked=True)
        return S1Interval(self.lo, p, _checked=True)

    def project(self, p):
        """Closest point in the (non-empty) interval to p
        (s1interval.d project)."""
        if p == -_PI:
            p = _PI
        if self.fast_contains(p):
            return p
        dlo = _positive_distance(p, self.lo)
        dhi = _positive_distance(self.hi, p)
        return self.lo if dlo < dhi else self.hi

    def approx_equals(self, other, max_error=1e-15):
        """s1interval.d approxEquals: empty matches short intervals, full
        matches nearly-full, endpoints within max_error without
        inverting."""
        if self.is_empty():
            return other.get_length() <= 2 * max_error
        if other.is_empty():
            return self.get_length() <= 2 * max_error
        if self.is_full():
            return other.get_length() >= 2 * (_PI - max_error)
        if other.is_full():
            return self.get_length() >= 2 * (_PI - max_error)
        return (abs(math.remainder(other.lo - self.lo, 2 * _PI)) <= max_error
                and abs(math.remainder(other.hi - self.hi, 2 * _PI))
                <= max_error
                and abs(self.get_length() - other.get_length())
                <= 2 * max_error)

    def get_directed_hausdorff_distance(self, other):
        """max over p in self of the distance to other
        (s1interval.d getDirectedHausdorffDistance)."""
        if other.contains_interval(self):
            return 0.0
        if other.is_empty():
            return _PI
        y_complement_center = other.get_complement_center()
        if self.contains(y_complement_center):
            return _positive_distance(other.hi, y_complement_center)
        hi_hi = _positive_distance(other.hi, self.hi) \
            if S1Interval(other.hi, y_complement_center).contains(self.hi) \
            else 0.0
        lo_lo = _positive_distance(self.lo, other.lo) \
            if S1Interval(y_complement_center, other.lo).contains(self.lo) \
            else 0.0
        return max(hi_hi, lo_lo)

    def expanded(self, margin):
        """Expand (margin > 0) or shrink (margin < 0) both endpoints
        (s1interval.d expanded, both signs, reference fullness/emptiness
        thresholds of 2*DBL_EPSILON)."""
        eps2 = 2 * 2.220446049250313e-16
        if margin >= 0:
            if self.is_empty():
                return S1Interval(self.lo, self.hi, _checked=True)
            if self.get_length() + 2 * margin + eps2 >= 2 * _PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return S1Interval(self.lo, self.hi, _checked=True)
            if self.get_length() + 2 * margin - eps2 <= 0:
                return S1Interval.empty()
        lo = math.remainder(self.lo - margin, 2 * _PI)
        hi = math.remainder(self.hi + margin, 2 * _PI)
        if lo <= -_PI:
            lo = _PI
        return S1Interval(lo, hi)

    def intersection(self, other):
        """Intersection of circle intervals (s1interval.d intersection; if
        the intersection is two disjoint arcs, the SMALLER one is
        returned)."""
        if other.is_empty():
            return S1Interval.empty()
        if self.fast_contains(other.lo):
            if self.fast_contains(other.hi):
                # Either this contains other, or the region boundaries
                # cross: return the shorter candidate.
                if other.get_length() < self.get_length():
                    return S1Interval(other.lo, other.hi, _checked=True)
                return S1Interval(self.lo, self.hi, _checked=True)
            return S1Interval(other.lo, self.hi, _checked=True)
        if self.fast_contains(other.hi):
            return S1Interval(self.lo, other.hi, _checked=True)
        if other.fast_contains(self.lo):
            return S1Interval(self.lo, self.hi, _checked=True)
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
        """Minimal expansion to include the point (s2latlng_rect.d:443-448
        via per-interval addPoint)."""
        if self.is_empty():
            return LatLngRect(lat, lat, S1Interval.from_point(lng))
        return LatLngRect(min(self.lat_lo, lat), max(self.lat_hi, lat),
                          self.lng.add_point(lng))

    def expanded(self, lat_margin, lng_margin):
        """Expand (or shrink, for negative margins) each interval; an
        interval that becomes empty empties the rect; latitude is clamped
        to [-pi/2, pi/2] (s2latlng_rect.d:474-479)."""
        if self.is_empty():
            return LatLngRect.empty()
        lat_lo = self.lat_lo - lat_margin
        lat_hi = self.lat_hi + lat_margin
        lng = self.lng.expanded(lng_margin)
        if lat_lo > lat_hi or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(max(-_HALF_PI, lat_lo), min(_HALF_PI, lat_hi),
                          lng)

    # Alias used by Cell.get_rect_bound for clarity.
    expanded_latlng = expanded

    def intersects_rect(self, other):
        if self.is_empty() or other.is_empty():
            return False
        return (self.lat_lo <= other.lat_hi and other.lat_lo <= self.lat_hi
                and self.lng.intersects(other.lng))

    def polar_closure(self):
        """If the rect touches a pole, expand lng to full
        (s2latlng_rect.d polarClosure)."""
        if self.lat_lo == -_HALF_PI or self.lat_hi == _HALF_PI:
            return LatLngRect(self.lat_lo, self.lat_hi, S1Interval.full())
        return LatLngRect(self.lat_lo, self.lat_hi, self.lng)

    def approx_equals(self, other, lat_err=1e-15, lng_err=None):
        """Per-interval approximate equality (s2latlng_rect.d approxEquals;
        R1Interval/S1Interval semantics: an empty interval matches any
        interval of length <= 2*max_error)."""
        if lng_err is None:
            lng_err = lat_err
        # R1 latitude interval.
        a_emp, b_emp = self.is_empty(), other.is_empty()
        if a_emp or b_emp:
            if a_emp and b_emp:
                lat_ok = True
            elif a_emp:
                lat_ok = (other.lat_hi - other.lat_lo) <= 2 * lat_err
            else:
                lat_ok = (self.lat_hi - self.lat_lo) <= 2 * lat_err
        else:
            lat_ok = (abs(self.lat_lo - other.lat_lo) <= lat_err
                      and abs(self.lat_hi - other.lat_hi) <= lat_err)
        # S1 longitude interval.
        a, b = self.lng, other.lng
        if a.is_empty():
            lng_ok = b.get_length() <= 2 * lng_err
        elif b.is_empty():
            lng_ok = a.get_length() <= 2 * lng_err
        else:
            lng_ok = (abs(math.remainder(b.lo - a.lo, 2 * _PI)) <= lng_err
                      and abs(math.remainder(b.hi - a.hi, 2 * _PI)) <= lng_err
                      and abs(a.get_length() - b.get_length()) <= 2 * lng_err)
        return lat_ok and lng_ok

    def contains_rect(self, other):
        if other.is_empty():
            return True
        return (self.lat_lo <= other.lat_lo and self.lat_hi >= other.lat_hi
                and self.lng.contains_interval(other.lng))

    # -- region interface for the coverer -------------------------------
    def get_cap_bound(self):
        """Smaller of a pole-axis cap and a mid-vertex cap
        (s2latlng_rect.d:755-787)."""
        from .cap import Cap
        if self.is_empty():
            return Cap.empty()
        if self.lat_lo + self.lat_hi < 0:
            pole_z, pole_angle = -1.0, _HALF_PI + self.lat_hi
        else:
            pole_z, pole_angle = 1.0, _HALF_PI - self.lat_lo
        pole_cap = Cap.from_center_angle((0.0, 0.0, pole_z), pole_angle)
        lng_span = self.lng.hi - self.lng.lo
        if math.remainder(lng_span, 2 * _PI) >= 0 and lng_span < 2 * _PI:
            lat_c, lng_c = self.get_center()
            mid_cap = Cap.from_point(_latlng_to_xyz(lat_c, lng_c))
            for k in range(4):
                mid_cap.add_point(_latlng_to_xyz(*self.get_vertex(k)))
            if mid_cap.height() < pole_cap.height():
                return mid_cap
        return pole_cap

    def _cell_rect(self, cell):
        """The cell's tight rect bound (retained name; now delegates to the
        faithful S2Cell.getRectBound port)."""
        return cell.get_rect_bound()

    def contains_cell(self, cell):
        """Exact: a rect contains a cell iff it contains the cell's tight
        rect bound (s2latlng_rect.d:800-811)."""
        return self.contains_rect(cell.get_rect_bound())

    def may_intersect_cell(self, cell):
        """Cheap, NOT exact (s2latlng_rect.d:819-822); see
        intersects_cell for the exact test."""
        if self.is_empty():
            return False
        return self.intersects_rect(cell.get_rect_bound())

    # -- full reference API (s2latlng_rect.d) ---------------------------
    @classmethod
    def from_point_pair(cls, lat1, lng1, lat2, lng2):
        """Minimal rect containing both points (s2latlng_rect.d:131-142)."""
        return cls(min(lat1, lat2), max(lat1, lat2),
                   S1Interval.from_point_pair(lng1, lng2))

    @classmethod
    def from_center_size(cls, center_lat, center_lng, size_lat, size_lng):
        """Rect of the given size centered at the point, lat clamped
        (s2latlng_rect.d:104-115)."""
        return cls.from_point(center_lat, center_lng).expanded(
            0.5 * size_lat, 0.5 * size_lng)

    def is_valid(self):
        return (abs(self.lat_lo) <= _HALF_PI and abs(self.lat_hi) <= _HALF_PI
                and self.lng.is_valid()
                and (self.lat_lo > self.lat_hi) == self.lng.is_empty())

    def is_point(self):
        return self.lat_lo == self.lat_hi and self.lng.lo == self.lng.hi

    def is_inverted(self):
        return self.lng.is_inverted()

    def __eq__(self, other):
        return (self.lat_lo == other.lat_lo and self.lat_hi == other.lat_hi
                and self.lng == other.lng)

    def __hash__(self):
        return hash((self.lat_lo, self.lat_hi, self.lng.lo, self.lng.hi))

    def get_vertex(self, k):
        """(lat, lng) of vertex k in CCW order: lower-left, lower-right,
        upper-right, upper-left (s2latlng_rect.d:227-232)."""
        i = (k >> 1) & 1
        lat = (self.lat_lo, self.lat_hi)[i]
        lng = (self.lng.lo, self.lng.hi)[i ^ (k & 1)]
        return (lat, lng)

    def get_center(self):
        """(lat, lng) center in latlng space (s2latlng_rect.d:236-238)."""
        return (0.5 * (self.lat_lo + self.lat_hi), self.lng.get_center())

    def get_size(self):
        """(lat_length, lng_length); negative if empty
        (s2latlng_rect.d:242-244)."""
        lat_len = self.lat_hi - self.lat_lo
        return (lat_len if lat_len >= 0 else -1.0, self.lng.get_length())

    def area(self):
        """Surface area on the unit sphere (s2latlng_rect.d:247-252)."""
        if self.is_empty():
            return 0.0
        return self.lng.get_length() * (math.sin(self.lat_hi)
                                        - math.sin(self.lat_lo))

    def get_centroid(self):
        """True centroid times area (s2latlng_rect.d:268-316)."""
        import numpy as np
        if self.is_empty():
            return np.zeros(3)
        z1, z2 = math.sin(self.lat_lo), math.sin(self.lat_hi)
        r1, r2 = math.cos(self.lat_lo), math.cos(self.lat_hi)
        alpha = 0.5 * self.lng.get_length()
        r = math.sin(alpha) * (r2 * z2 - r1 * z1
                               + (self.lat_hi - self.lat_lo))
        lng = self.lng.get_center()
        z = alpha * (z2 + z1) * (z2 - z1)  # scaled by the area
        return np.array([r * math.cos(lng), r * math.sin(lng), z])

    def interior_contains_latlng(self, lat, lng):
        return (self.lat_lo < lat < self.lat_hi
                and self.lng.interior_contains(lng))

    def interior_contains_point(self, p):
        lat = math.atan2(p[2], math.hypot(p[0], p[1]))
        lng = math.atan2(p[1], p[0])
        return self.interior_contains_latlng(lat, lng)

    def interior_contains_rect(self, other):
        """s2latlng_rect.d:350-352 (via R1/S1 interiorContains)."""
        # R1 interior contains.
        if other.is_empty():
            lat_ok = True
        else:
            lat_ok = ((other.lat_lo > self.lat_lo
                       and other.lat_hi < self.lat_hi)
                      or (self.lat_lo == -_HALF_PI
                          and self.lat_hi == _HALF_PI
                          and not self.is_empty()
                          and other.lat_lo >= self.lat_lo
                          and other.lat_hi <= self.lat_hi))
        return lat_ok and self.lng.interior_contains_interval(other.lng)

    def interior_intersects(self, other):
        """s2latlng_rect.d:412-415 (via R1/S1 interiorIntersects)."""
        lat_ok = (not self.is_empty() and not other.is_empty()
                  and other.lat_lo < self.lat_hi
                  and self.lat_lo < other.lat_hi)
        return lat_ok and self.lng.interior_intersects(other.lng)

    def unite(self, other):
        return self.union(other)

    def intersection(self, other):
        """s2latlng_rect.d:507-515."""
        lat_lo = max(self.lat_lo, other.lat_lo)
        lat_hi = min(self.lat_hi, other.lat_hi)
        lng = self.lng.intersection(other.lng)
        if lat_lo > lat_hi or lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat_lo, lat_hi, lng)

    def boundary_intersects(self, v0, v1):
        """True if the boundary intersects geodesic edge (v0, v1)
        (s2latlng_rect.d:419-432)."""
        if self.is_empty():
            return False
        if not self.lng.is_full():
            if intersects_lng_edge(v0, v1, self.lat_lo, self.lat_hi,
                                   self.lng.lo):
                return True
            if intersects_lng_edge(v0, v1, self.lat_lo, self.lat_hi,
                                   self.lng.hi):
                return True
        if self.lat_lo != -_HALF_PI and intersects_lat_edge(
                v0, v1, self.lat_lo, self.lng):
            return True
        if self.lat_hi != _HALF_PI and intersects_lat_edge(
                v0, v1, self.lat_hi, self.lng):
            return True
        return False

    def intersects_cell(self, cell):
        """Exact rect-cell intersection (s2latlng_rect.d:362-408)."""
        if self.is_empty():
            return False
        if self.contains_point(cell.center()):
            return True
        lat_c, lng_c = self.get_center()
        if cell.contains_point(_latlng_to_xyz(lat_c, lng_c)):
            return True
        if not self.intersects_rect(cell.get_rect_bound()):
            return False
        cell_v = []
        cell_ll = []
        for i in range(4):
            v = cell.vertex(i)
            ll = (math.atan2(v[2], math.hypot(v[0], v[1])),
                  math.atan2(v[1], v[0]))
            cell_v.append(v)
            cell_ll.append(ll)
            if self.contains_latlng(*ll):
                return True
            if cell.contains_point(_latlng_to_xyz(*self.get_vertex(i))):
                return True
        for i in range(4):
            edge_lng = S1Interval.from_point_pair(
                cell_ll[i][1], cell_ll[(i + 1) & 3][1])
            if not self.lng.intersects(edge_lng):
                continue
            a = cell_v[i]
            b = cell_v[(i + 1) & 3]
            if edge_lng.contains(self.lng.lo):
                if intersects_lng_edge(a, b, self.lat_lo, self.lat_hi,
                                       self.lng.lo):
                    return True
            if edge_lng.contains(self.lng.hi):
                if intersects_lng_edge(a, b, self.lat_lo, self.lat_hi,
                                       self.lng.hi):
                    return True
            if intersects_lat_edge(a, b, self.lat_lo, self.lng):
                return True
            if intersects_lat_edge(a, b, self.lat_hi, self.lng):
                return True
        return False

    def expanded_by_distance(self, distance_rad):
        """Expand/shrink by a DISTANCE on the sphere
        (s2latlng_rect.d:555-601)."""
        if distance_rad >= 0:
            from .cap import Cap
            r = LatLngRect(self.lat_lo, self.lat_hi, self.lng)
            for k in range(4):
                cap = Cap.from_center_angle(
                    _latlng_to_xyz(*self.get_vertex(k)), distance_rad)
                r = r.union(cap.get_rect_bound())
            return r
        # Shrink: latitude interval contracts unless it reaches a pole with
        # full longitude (no boundary there).
        lat_lo = self.lat_lo if (self.lat_lo <= -_HALF_PI
                                 and self.lng.is_full()) \
            else self.lat_lo - distance_rad
        lat_hi = self.lat_hi if (self.lat_hi >= _HALF_PI
                                 and self.lng.is_full()) \
            else self.lat_hi + distance_rad
        if lat_lo > lat_hi:
            return LatLngRect.empty()
        max_abs_lat = max(-lat_lo, lat_hi)
        sin_a = math.sin(-distance_rad)
        sin_c = math.cos(max_abs_lat)
        max_lng_margin = math.asin(sin_a / sin_c) if sin_a < sin_c \
            else _HALF_PI
        lng = self.lng.expanded(-max_lng_margin)
        if lng.is_empty():
            return LatLngRect.empty()
        return LatLngRect(lat_lo, lat_hi, lng)

    def get_distance_latlng(self, lat, lng):
        """Min distance (radians) from a point to the rect
        (s2latlng_rect.d:668-694)."""
        assert not self.is_empty()
        if self.lng.contains(lng):
            return max(0.0, max(lat - self.lat_hi, self.lat_lo - lat))
        interval = S1Interval(self.lng.hi, self.lng.get_complement_center())
        a_lng = self.lng.hi if interval.contains(lng) else self.lng.lo
        lo = _latlng_to_xyz(self.lat_lo, a_lng)
        hi = _latlng_to_xyz(self.lat_hi, a_lng)
        return _edge_distance_rad(_latlng_to_xyz(lat, lng), lo, hi)

    def get_distance_rect(self, other):
        """Min distance (radians) between two non-empty rects
        (s2latlng_rect.d:605-663)."""
        assert not self.is_empty() and not other.is_empty()
        a, b = self, other
        if a.lng.intersects(b.lng):
            if a.lat_lo <= b.lat_hi and b.lat_lo <= a.lat_hi:
                return 0.0
            if a.lat_lo > b.lat_hi:
                lo, hi = b.lat_hi, a.lat_lo
            else:
                lo, hi = a.lat_hi, b.lat_lo
            return hi - lo
        lo_hi = S1Interval.from_point_pair(a.lng.lo, b.lng.hi)
        hi_lo = S1Interval.from_point_pair(a.lng.hi, b.lng.lo)
        if lo_hi.get_length() < hi_lo.get_length():
            a_lng, b_lng = a.lng.lo, b.lng.hi
        else:
            a_lng, b_lng = a.lng.hi, b.lng.lo
        a_lo = _latlng_to_xyz(a.lat_lo, a_lng)
        a_hi = _latlng_to_xyz(a.lat_hi, a_lng)
        b_lo = _latlng_to_xyz(b.lat_lo, b_lng)
        b_hi = _latlng_to_xyz(b.lat_hi, b_lng)
        return min(_edge_distance_rad(a_lo, b_lo, b_hi),
                   _edge_distance_rad(a_hi, b_lo, b_hi),
                   _edge_distance_rad(b_lo, a_lo, a_hi),
                   _edge_distance_rad(b_hi, a_lo, a_hi))

    def get_hausdorff_distance(self, other):
        """s2latlng_rect.d:702-706."""
        return max(self.get_directed_hausdorff_distance(other),
                   other.get_directed_hausdorff_distance(self))

    def get_directed_hausdorff_distance(self, other):
        """h(A,B) = max_{p in A} min_{q in B} d(p,q), radians
        (s2latlng_rect.d:708-719)."""
        if self.is_empty():
            return 0.0
        if other.is_empty():
            return _PI
        lng_distance = self.lng.get_directed_hausdorff_distance(other.lng)
        assert lng_distance >= 0
        return _directed_hausdorff_lat(lng_distance,
                                       (self.lat_lo, self.lat_hi),
                                       (other.lat_lo, other.lat_hi))


# Maximum error of the rect bounder, for tests (s2latlng_rect_bounder.d
# maxErrorForTests: 10*eps lat, 1*eps lng).
_DBL_EPS = 2.220446049250313e-16
BOUNDER_MAX_ERROR = (10 * _DBL_EPS, 1 * _DBL_EPS)


def expand_for_subregions(bound: LatLngRect) -> LatLngRect:
    """Expand a loop bound so that if A.contains(B) then
    expand_for_subregions(A.bound).contains(B.bound)
    (s2latlng_rect_bounder.d:258-366 expandForSubregions, including the
    nearly-antipodal-points escape to Full)."""
    if bound.is_empty():
        return LatLngRect(bound.lat_lo, bound.lat_hi, bound.lng)
    # Distance between the bound and its reflection through the origin:
    # if it may contain nearly-antipodal points (within 4.309*eps), a
    # subregion edge bound can snap to Full.
    lng_gap = max(0.0, _PI - bound.lng.get_length() - 2.5 * _DBL_EPS)
    min_abs_lat = max(bound.lat_lo, -bound.lat_hi)
    lat_gap1 = _HALF_PI + bound.lat_lo
    lat_gap2 = _HALF_PI - bound.lat_hi
    if min_abs_lat >= 0:
        if 2 * min_abs_lat + lng_gap < 1.354e-15:
            return LatLngRect.full()
    elif lng_gap >= _HALF_PI:
        if lat_gap1 + lat_gap2 < 1.687e-15:
            return LatLngRect.full()
    else:
        if max(lat_gap1, lat_gap2) * lng_gap < 1.765e-15:
            return LatLngRect.full()
    lat_expansion = 9 * _DBL_EPS
    lng_expansion = _PI if lng_gap <= 0 else 0.0
    return bound.expanded(lat_expansion, lng_expansion).polar_closure()


class RectBounder:
    """Faithful port of S2LatLngRectBounder (s2latlng_rect_bounder.d:44-240):
    computes a conservative LatLngRect bound for an edge chain, including
    edge-interior latitude extrema with the reference's exact error terms
    (3.84eps normal error, 3eps max-lat pad, 2eps final expansion,
    latitude-change budget for short edges)."""

    __slots__ = ("_bound", "_a", "_a_lat", "_a_lng")

    def __init__(self):
        self._bound = LatLngRect.empty()
        self._a = None

    def add_point(self, b):
        bx, by, bz = float(b[0]), float(b[1]), float(b[2])
        b_lat = math.atan2(bz, math.hypot(bx, by))
        b_lng = math.atan2(by, bx)
        if self._bound.is_empty():
            self._bound = self._bound.add_point(b_lat, b_lng)
        else:
            ax, ay, az = self._a
            # N = (A-B) x (A+B) = 2*(A x B), computed this way for accuracy
            # when A ~ B (s2latlng_rect_bounder.d:61).
            ux, uy, uz = ax - bx, ay - by, az - bz
            vx, vy, vz = ax + bx, ay + by, az + bz
            nx = uy * vz - uz * vy
            ny = uz * vx - ux * vz
            nz = ux * vy - uy * vx
            n_norm = math.sqrt(nx * nx + ny * ny + nz * nz)
            if n_norm < 1.91346e-15:
                # Nearly identical or nearly antipodal (within 4.309 eps).
                if ax * bx + ay * by + az * bz < 0:
                    self._bound = LatLngRect.full()
                else:
                    self._bound = self._bound.union(LatLngRect(
                        min(self._a_lat, b_lat), max(self._a_lat, b_lat),
                        S1Interval.from_point_pair(self._a_lng, b_lng)))
            else:
                lng_ab = S1Interval.from_point_pair(self._a_lng, b_lng)
                if lng_ab.get_length() >= _PI - 2 * _DBL_EPS:
                    lng_ab = S1Interval.full()
                lat_lo = min(self._a_lat, b_lat)
                lat_hi = max(self._a_lat, b_lat)
                # M = N x z_hat; sign of M.A / M.B tells whether the edge
                # crosses the plane of min/max latitude.
                mx, my = ny, -nx  # (N x (0,0,1)) = (ny, -nx, 0)
                m_a = mx * ax + my * ay
                m_b = mx * bx + my * by
                m_error = 6.06638e-16 * n_norm + 6.83174e-31
                if (m_a * m_b < 0 or abs(m_a) <= m_error
                        or abs(m_b) <= m_error):
                    max_lat = min(
                        math.atan2(math.sqrt(nx * nx + ny * ny), abs(nz))
                        + 3 * _DBL_EPS, _HALF_PI)
                    lat_budget = 2 * math.asin(
                        min(1.0, 0.5 * math.sqrt(ux * ux + uy * uy + uz * uz)
                            * math.sin(max_lat)))
                    max_delta = 0.5 * (lat_budget - (lat_hi - lat_lo)) \
                        + _DBL_EPS
                    if m_a <= m_error and m_b >= -m_error:
                        lat_hi = min(max_lat, lat_hi + max_delta)
                    if m_b <= m_error and m_a >= -m_error:
                        lat_lo = max(-max_lat, lat_lo - max_delta)
                self._bound = self._bound.union(
                    LatLngRect(lat_lo, lat_hi, lng_ab))
        self._a = (bx, by, bz)
        self._a_lat = b_lat
        self._a_lng = b_lng

    def get_bound(self):
        """Expand by 2eps latitude (rounded-inward compensation) and take
        the polar closure (s2latlng_rect_bounder.d:215-240)."""
        return self._bound.expanded(2 * _DBL_EPS, 0.0).polar_closure()


# ---------------------------------------------------------------------------
# LatLngRect geometric helpers (s2latlng_rect.d:870-1071)
# ---------------------------------------------------------------------------

def _latlng_to_xyz(lat, lng):
    cos_lat = math.cos(lat)
    return (cos_lat * math.cos(lng), cos_lat * math.sin(lng), math.sin(lat))


def _edge_distance_rad(x, a, b):
    """Min angular distance from point x to edge (a, b), radians."""
    from .edge import chord2_to_radians, edge_distances2
    d2 = edge_distances2(np.asarray(x, dtype=np.float64)[None, :],
                         np.asarray(a, dtype=np.float64)[None, :],
                         np.asarray(b, dtype=np.float64)[None, :])
    return chord2_to_radians(float(d2[0, 0]))


def intersects_lng_edge(a, b, lat_lo, lat_hi, lng):
    """Edge AB crosses the given edge of constant longitude (a geodesic)
    (s2latlng_rect.d:870-879)."""
    from .predicates import crossing_sign
    return crossing_sign(tuple(a), tuple(b), _latlng_to_xyz(lat_lo, lng),
                         _latlng_to_xyz(lat_hi, lng)) > 0


def intersects_lat_edge(a, b, lat, lng: S1Interval):
    """Edge AB crosses the given edge of constant latitude (a curve, so 0,
    1 or 2 intersections) (s2latlng_rect.d:885-938)."""
    from .edge_clipping import robust_cross_prod
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    z = np.asarray(robust_cross_prod(a, b), dtype=np.float64)
    z = z / np.linalg.norm(z)
    if z[2] < 0:
        z = -z
    y = np.asarray(robust_cross_prod(z, np.array([0.0, 0.0, 1.0])),
                   dtype=np.float64)
    y = y / np.linalg.norm(y)
    x = np.cross(y, z)
    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x[2]:
        return False  # The great circle does not reach this latitude.
    cos_theta = sin_lat / x[2]
    sin_theta = math.sqrt(1 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)
    ab_theta = S1Interval.from_point_pair(
        math.atan2(float(a @ y), float(a @ x)),
        math.atan2(float(b @ y), float(b @ x)))
    if ab_theta.contains(theta):
        isect = x * cos_theta + y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    if ab_theta.contains(-theta):
        isect = x * cos_theta - y * sin_theta
        if lng.contains(math.atan2(isect[1], isect[0])):
            return True
    return False


def _r1_directed_hausdorff(a_lo, a_hi, b_lo, b_hi):
    """R1Interval directed Hausdorff distance (r1interval.d)."""
    if a_lo > a_hi:
        return 0.0
    if b_lo > b_hi:
        return math.inf
    return max(0.0, max(a_hi - b_hi, b_lo - a_lo))


def _get_bisector_intersection(b_lat, b_lng):
    """Intersection of longitude 0 with the bisector of a longitudinal edge
    at longitude b_lng spanning latitudes b_lat (s2latlng_rect.d:1058-1071).
    """
    from .edge_clipping import robust_cross_prod
    b_lng = abs(b_lng)
    lat_center = 0.5 * (b_lat[0] + b_lat[1])
    if lat_center >= 0:
        ortho_bisector = _latlng_to_xyz(lat_center - _HALF_PI, b_lng)
    else:
        ortho_bisector = _latlng_to_xyz(-lat_center - _HALF_PI, b_lng - _PI)
    ortho_lng = np.array([0.0, -1.0, 0.0])
    return np.asarray(robust_cross_prod(ortho_lng,
                                        np.asarray(ortho_bisector)),
                      dtype=np.float64)


def _get_interior_max_distance(a_lat, b):
    """Max distance from point b to the longitude-0 segment spanning a_lat,
    when the max occurs in the segment interior; else -1
    (s2latlng_rect.d:1037-1051)."""
    if a_lat[0] > a_lat[1] or b[0] >= 0:
        return -1.0
    ip = np.array([-b[0], 0.0, -b[2]])
    ip = ip / np.linalg.norm(ip)
    ip_lat = math.atan2(ip[2], math.hypot(ip[0], ip[1]))
    if a_lat[0] < ip_lat < a_lat[1]:
        d = np.asarray(b, dtype=np.float64) - ip
        return 2.0 * math.asin(0.5 * min(2.0, math.sqrt(float(d @ d))))
    return -1.0


def _directed_hausdorff_lat(lng_diff, a_lat, b_lat):
    """Directed Hausdorff distance between two longitudinal edges with
    longitude difference lng_diff (s2latlng_rect.d:951-1030)."""
    assert 0 <= lng_diff <= _PI
    if lng_diff == 0:
        return _r1_directed_hausdorff(a_lat[0], a_lat[1],
                                      b_lat[0], b_lat[1])
    b_lng = lng_diff
    b_lo = _latlng_to_xyz(b_lat[0], b_lng)
    b_hi = _latlng_to_xyz(b_lat[1], b_lng)
    a_lo = _latlng_to_xyz(a_lat[0], 0.0)
    a_hi = _latlng_to_xyz(a_lat[1], 0.0)
    max_distance = max(_edge_distance_rad(a_lo, b_lo, b_hi),
                       _edge_distance_rad(a_hi, b_lo, b_hi))
    if lng_diff <= _HALF_PI:
        # Case A2: both edges cross the equator.
        if a_lat[0] <= 0 <= a_lat[1] and b_lat[0] <= 0 <= b_lat[1]:
            max_distance = max(max_distance, lng_diff)
    else:
        # Case B2: intersection of edge a with the bisector E3.
        p = _get_bisector_intersection(b_lat, b_lng)
        p = p / np.linalg.norm(p)
        p_lat = math.atan2(p[2], math.hypot(p[0], p[1]))
        if a_lat[0] <= p_lat <= a_lat[1]:
            d = p - np.asarray(b_lo)
            max_distance = max(max_distance, 2.0 * math.asin(
                0.5 * min(2.0, math.sqrt(float(d @ d)))))
        # Case B3: interior maxima below/above the bisector intersection.
        if p_lat > a_lat[0]:
            max_distance = max(max_distance, _get_interior_max_distance(
                (a_lat[0], min(p_lat, a_lat[1])), np.asarray(b_lo)))
        if p_lat < a_lat[1]:
            max_distance = max(max_distance, _get_interior_max_distance(
                (max(p_lat, a_lat[0]), a_lat[1]), np.asarray(b_hi)))
    return max_distance
