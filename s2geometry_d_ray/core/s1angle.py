"""S1Angle and S1ChordAngle value types (src/s2/s1angle.d,
src/s2/s1chord_angle.d).

The batch kernels in `core` work on raw radians / squared-chord floats;
these wrappers provide the reference's user-facing API — exact 180° <->
π conversion, E5/E6/E7 fixed-point forms, and the chord-angle algebra
(one-sqrt addition, successor/predecessor ulp stepping, plusError,
trig without conversion to angles)."""

from __future__ import annotations

import math
from functools import total_ordering

import numpy as np

_DBL_EPS = 2.220446049250313e-16
MAX_LENGTH2 = 4.0


@total_ordering
class S1Angle:
    __slots__ = ("_radians",)

    def __init__(self, x=None, y=None):
        if x is None:
            self._radians = 0.0
        elif y is None:
            self._radians = float(x)
        else:
            # angle between two points (or latlng pairs given as radians)
            a = np.asarray(x, dtype=np.float64)
            b = np.asarray(y, dtype=np.float64)
            self._radians = math.atan2(
                float(np.linalg.norm(np.cross(a, b))), float(np.dot(a, b)))

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_radians(cls, radians):
        return cls(float(radians))

    @classmethod
    def from_degrees(cls, degrees):
        return cls(float(degrees) * (math.pi / 180))

    @classmethod
    def from_e5(cls, e5):
        return cls.from_degrees(1e-5 * e5)

    @classmethod
    def from_e6(cls, e6):
        return cls.from_degrees(1e-6 * e6)

    @classmethod
    def from_e7(cls, e7):
        return cls.from_degrees(1e-7 * e7)

    @classmethod
    def from_unsigned_e6(cls, e6):
        return cls.from_e6(np.uint32(e6).astype(np.int32))

    @classmethod
    def from_unsigned_e7(cls, e7):
        return cls.from_e7(np.uint32(e7).astype(np.int32))

    @classmethod
    def zero(cls):
        return cls(0.0)

    @classmethod
    def infinity(cls):
        return cls(float("inf"))

    # -- accessors ------------------------------------------------------
    def radians(self):
        return self._radians

    def degrees(self):
        return self._radians * (180 / math.pi)

    def e5(self):
        return round(self.degrees() * 1e5)

    def e6(self):
        return round(self.degrees() * 1e6)

    def e7(self):
        return round(self.degrees() * 1e7)

    # -- algebra --------------------------------------------------------
    def abs(self):
        return S1Angle(abs(self._radians))

    def __neg__(self):
        return S1Angle(-self._radians)

    def __add__(self, other):
        return S1Angle(self._radians + other._radians)

    def __sub__(self, other):
        return S1Angle(self._radians - other._radians)

    def __mul__(self, k):
        return S1Angle(self._radians * k)

    __rmul__ = __mul__

    def __truediv__(self, k):
        if isinstance(k, S1Angle):
            return self._radians / k._radians
        return S1Angle(self._radians / k)

    def normalized(self):
        """Equivalent angle in (-180, 180] degrees (s1angle.d:195-204)."""
        r = math.remainder(self._radians, 2 * math.pi)
        if r <= -math.pi:
            r = math.pi
        return S1Angle(r)

    def __eq__(self, other):
        return isinstance(other, S1Angle) and self._radians == other._radians

    def __lt__(self, other):
        return self._radians < other._radians

    def __hash__(self):
        return hash(self._radians)

    def __repr__(self):
        return f"{self.degrees():.7f}"


@total_ordering
class S1ChordAngle:
    __slots__ = ("_length2",)

    def __init__(self, x=None, y=None):
        if x is None:
            self._length2 = 0.0
        elif y is not None:
            d = np.asarray(x, dtype=np.float64) - np.asarray(
                y, dtype=np.float64)
            self._length2 = min(MAX_LENGTH2, float(np.dot(d, d)))
        elif isinstance(x, S1Angle):
            if x.radians() < 0:
                self._length2 = -1.0
            elif x == S1Angle.infinity():
                self._length2 = float("inf")
            else:
                s = 2.0 * math.sin(0.5 * min(math.pi, x.radians()))
                self._length2 = s * s
        else:
            self._length2 = float(x)

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_length2(cls, length2):
        return cls(min(MAX_LENGTH2, float(length2)))

    @classmethod
    def from_radians(cls, radians):
        return cls(S1Angle.from_radians(radians))

    @classmethod
    def from_degrees(cls, degrees):
        return cls(S1Angle.from_degrees(degrees))

    @classmethod
    def zero(cls):
        return cls(0.0)

    @classmethod
    def right(cls):
        return cls(2.0)

    @classmethod
    def straight(cls):
        return cls(4.0)

    @classmethod
    def infinity(cls):
        return cls(float("inf"))

    @classmethod
    def negative(cls):
        return cls(-1.0)

    # -- accessors ------------------------------------------------------
    def length2(self):
        return self._length2

    def to_s1angle(self):
        if self.is_negative():
            return S1Angle.from_radians(-1)
        if self.is_infinity():
            return S1Angle.infinity()
        return S1Angle.from_radians(
            2 * math.asin(0.5 * math.sqrt(self._length2)))

    def radians(self):
        return self.to_s1angle().radians()

    def degrees(self):
        return self.to_s1angle().degrees()

    # -- predicates -----------------------------------------------------
    def is_zero(self):
        return self._length2 == 0

    def is_negative(self):
        return self._length2 < 0

    def is_infinity(self):
        return self._length2 == float("inf")

    def is_special(self):
        return self.is_negative() or self.is_infinity()

    # -- ulp stepping ---------------------------------------------------
    def successor(self):
        """Smallest representable angle larger than this one
        (s1chord_angle.d:381-389)."""
        if self._length2 >= MAX_LENGTH2:
            return S1ChordAngle.infinity()
        if self._length2 < 0.0:
            return S1ChordAngle.zero()
        return S1ChordAngle(math.nextafter(self._length2, 10.0))

    def predecessor(self):
        if self._length2 <= 0.0:
            return S1ChordAngle.negative()
        if self._length2 > MAX_LENGTH2:
            return S1ChordAngle.straight()
        return S1ChordAngle(math.nextafter(self._length2, -10.0))

    def plus_error(self, error):
        if self.is_special():
            return self
        return S1ChordAngle(max(0.0, min(MAX_LENGTH2,
                                         self._length2 + error)))

    def get_s2point_constructor_max_error(self):
        from .closest_edge import s2point_constructor_max_error
        return s2point_constructor_max_error(self._length2)

    def get_s1angle_constructor_max_error(self):
        return _DBL_EPS * self._length2

    # -- algebra (one sqrt, s1chord_angle.d:270-320) --------------------
    def __add__(self, other):
        a2, b2 = self._length2, other._length2
        if b2 == 0:
            return S1ChordAngle(a2)
        if a2 + b2 >= MAX_LENGTH2:
            return S1ChordAngle.straight()
        x = a2 * (1 - 0.25 * b2)
        y = b2 * (1 - 0.25 * a2)
        return S1ChordAngle(min(MAX_LENGTH2, x + y + 2 * math.sqrt(x * y)))

    def __sub__(self, other):
        a2, b2 = self._length2, other._length2
        if b2 == 0:
            return S1ChordAngle(a2)
        if a2 <= b2:
            return S1ChordAngle.zero()
        x = a2 * (1 - 0.25 * b2)
        y = b2 * (1 - 0.25 * a2)
        return S1ChordAngle(max(0.0, x + y - 2 * math.sqrt(x * y)))

    # -- trig without angle conversion ----------------------------------
    def sin2(self):
        return self._length2 * (1 - 0.25 * self._length2)

    def sin(self):
        return math.sqrt(self.sin2())

    def cos(self):
        return 1 - 0.5 * self._length2

    def tan(self):
        s, c = self.sin(), self.cos()
        if c == 0:
            return float("inf") if s > 0 else float("-inf")
        return s / c

    def __eq__(self, other):
        return isinstance(other, S1ChordAngle) \
            and self._length2 == other._length2

    def __lt__(self, other):
        return self._length2 < other._length2

    def __hash__(self):
        return hash(self._length2)

    def __repr__(self):
        return f"S1ChordAngle({self._length2!r})"
