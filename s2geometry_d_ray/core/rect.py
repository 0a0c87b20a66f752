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
