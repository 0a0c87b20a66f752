"""S2PolylineSimplifier (src/s2/s2polyline_simplifier.d:67-262, full
port): computes a maximal output edge from a source vertex that
intersects a sequence of target discs and avoids a sequence of
avoidance discs, by maintaining a wrapping interval of acceptable
BEARINGS (angles in the tangent frame at the source).

This is the constraint engine behind S2Builder's simplify_edge_chains
topology guarantees; the conservative error padding in get_semiwidth
makes both targeting and avoidance exact-safe."""

from __future__ import annotations

import math

import numpy as np

from .rect import S1Interval

_DBL_ERR = 0.5 * np.finfo(np.float64).eps


class PolylineSimplifier:
    def __init__(self):
        self._src = None
        self._x_dir = None
        self._y_dir = None
        self._window = S1Interval.empty()

    def initialize(self, src):
        """Start a new simplified edge at src (unit vector)."""
        src = np.asarray(src, dtype=np.float64)
        self._src = src
        self._window = S1Interval.full()
        # Unnormalized tangent-space basis (s2polyline_simplifier.d:76-103)
        tmp = np.abs(src)
        i = (0 if tmp[0] < tmp[2] else 2) if tmp[0] < tmp[1] \
            else (1 if tmp[1] < tmp[2] else 2)
        j = 0 if i == 2 else i + 1
        k = 2 if i == 0 else i - 1
        y = np.zeros(3)
        y[j] = src[k]
        y[k] = -src[j]
        x = np.zeros(3)
        x[i] = src[j] * src[j] + src[k] * src[k]
        x[j] = -src[j] * src[i]
        x[k] = -src[k] * src[i]
        self._x_dir = x
        self._y_dir = y

    @property
    def src(self):
        return self._src

    def _get_angle(self, p):
        p = np.asarray(p, dtype=np.float64)
        return math.atan2(float(p @ self._y_dir), float(p @ self._x_dir))

    def _get_semiwidth(self, p, r2, round_direction):
        """Half-width of the bearing interval subtended by the disc of
        chord^2 radius r2 at p, padded conservatively in the given
        rounding direction (s2polyline_simplifier.d:178-260)."""
        p = np.asarray(p, dtype=np.float64)
        d = self._src - p
        a2 = float(d @ d)
        a2 -= 64.0 * _DBL_ERR * _DBL_ERR * round_direction
        if a2 <= r2:
            return math.pi  # disc contains src
        sin2_r = r2 * (1.0 - 0.25 * r2)
        sin2_a = a2 * (1.0 - 0.25 * a2)
        semiwidth = math.asin(math.sqrt(sin2_r / sin2_a))
        error = (2 * 10 + 4) * _DBL_ERR + 17 * _DBL_ERR * semiwidth
        return semiwidth + round_direction * error

    def extend(self, dst) -> bool:
        """True if (src, dst) satisfies all constraints so far; edges
        longer than 90 degrees are not supported."""
        dst = np.asarray(dst, dtype=np.float64)
        d = self._src - dst
        if float(d @ d) > 2.0:  # chord^2 of 90 degrees
            return False
        return self._window.contains(self._get_angle(dst))

    def target_disc(self, p, radius_rad) -> bool:
        """Require the output edge to pass through the disc."""
        r2 = min(4.0, (2.0 * math.sin(min(math.pi, radius_rad) / 2)) ** 2)
        semiwidth = self._get_semiwidth(p, r2, -1)
        if semiwidth >= math.pi:
            return True
        if semiwidth < 0:
            self._window = S1Interval.empty()
            return False
        center = self._get_angle(p)
        target = S1Interval.from_point(center).expanded(semiwidth)
        self._window = self._window.intersection(target)
        return not self._window.is_empty()

    def avoid_disc(self, p, radius_rad, disc_on_left) -> bool:
        """Require the output edge to avoid the disc, passing on the
        given side (preserves topology wrt nearby points)."""
        r2 = min(4.0, (2.0 * math.sin(min(math.pi, radius_rad) / 2)) ** 2)
        semiwidth = self._get_semiwidth(p, r2, +1)
        if semiwidth >= math.pi:
            self._window = S1Interval.empty()
            return False
        center = self._get_angle(p)
        opposite = center - math.pi if center > 0 else center + math.pi
        target = S1Interval(opposite, center) if disc_on_left \
            else S1Interval(center, opposite)
        self._window = self._window.intersection(
            target.expanded(-semiwidth))
        return not self._window.is_empty()
