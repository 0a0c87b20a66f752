"""Ports of test/s2/s1angle_test.d and test/s2/s1chord_angle_test.d:
exact 180-degree <-> pi conversions, E5/E6/E7 forms, normalization and
arithmetic; chord-angle constructors, special values, ulp stepping, the
one-sqrt algebra, exact trig at 90/180, plusError, and the
S2PointConstructorMaxError sweep against the exact predicate."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core.distance_predicates import compare_distance
from s2geometry_d_ray.core.edge import interpolate_at_distance
from s2geometry_d_ray.core.s1angle import S1Angle, S1ChordAngle

EPS = 1e-4


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


# ---------------------------------------------------------------------------
# S1Angle


def test_default_constructor_and_zero():
    assert S1Angle().radians() == 0
    assert S1Angle.from_radians(0) == S1Angle.zero()


def test_infinity():
    assert S1Angle.from_radians(1e30) < S1Angle.infinity()
    assert -S1Angle.infinity() < S1Angle.zero()
    assert S1Angle.infinity() == S1Angle.infinity()


def test_pi_radians_exactly_180_degrees():
    assert S1Angle.from_radians(math.pi).radians() == math.pi
    assert S1Angle.from_radians(math.pi).degrees() == 180.0
    assert S1Angle.from_degrees(180).radians() == math.pi
    assert S1Angle.from_degrees(180).degrees() == 180.0
    assert S1Angle.from_radians(math.pi / 2).degrees() == 90.0
    assert S1Angle.from_radians(-math.pi / 2).degrees() == -90.0
    assert S1Angle.from_degrees(-45).radians() == -math.pi / 4


def test_e5_e6_e7_representations():
    assert S1Angle.from_degrees(-45).radians() == pytest.approx(
        S1Angle.from_e5(-4500000).radians(), abs=EPS)
    assert S1Angle.from_degrees(-60).radians() == pytest.approx(
        S1Angle.from_e6(-60000000).radians(), abs=EPS)
    assert S1Angle.from_degrees(75).radians() == pytest.approx(
        S1Angle.from_e7(750000000).radians(), abs=EPS)
    assert S1Angle.from_degrees(-172.56123).e5() == -17256123
    assert S1Angle.from_degrees(12.345678).e6() == 12345678
    assert S1Angle.from_degrees(-12.3456789).e7() == -123456789


def test_unsigned_e6_e7():
    assert S1Angle.from_degrees(60).radians() == pytest.approx(
        S1Angle.from_unsigned_e6(60000000).radians(), abs=EPS)
    assert S1Angle.from_degrees(-60).radians() == pytest.approx(
        S1Angle.from_unsigned_e6(np.uint32(-60000000 & 0xFFFFFFFF)
                                 ).radians(), abs=EPS)
    assert S1Angle.from_degrees(75).radians() == pytest.approx(
        S1Angle.from_unsigned_e7(750000000).radians(), abs=EPS)


def test_normalized():
    assert S1Angle.from_degrees(360.0).normalized().degrees() == \
        pytest.approx(0.0, abs=EPS)
    assert S1Angle.from_degrees(-180.0).normalized().degrees() == \
        pytest.approx(180.0, abs=EPS)
    assert S1Angle.from_degrees(180.0).normalized().degrees() == \
        pytest.approx(180.0, abs=EPS)
    assert S1Angle.from_degrees(540.0).normalized().degrees() == \
        pytest.approx(180.0, abs=EPS)
    assert S1Angle.from_degrees(-270.0).normalized().degrees() == \
        pytest.approx(90.0, abs=EPS)


def test_arithmetic_operations():
    assert S1Angle.from_radians(-0.3).abs().radians() == pytest.approx(
        0.3, abs=EPS)
    assert (-S1Angle.from_radians(0.1)).radians() == pytest.approx(
        -0.1, abs=EPS)
    assert (S1Angle.from_radians(0.1)
            + S1Angle.from_radians(0.3)).radians() == pytest.approx(
        0.4, abs=EPS)
    assert (S1Angle.from_radians(0.1)
            - S1Angle.from_radians(0.3)).radians() == pytest.approx(
        -0.2, abs=EPS)
    assert (2 * S1Angle.from_radians(0.3)).radians() == pytest.approx(
        0.6, abs=EPS)
    assert (S1Angle.from_radians(0.3) * 2).radians() == pytest.approx(
        0.6, abs=EPS)
    assert (S1Angle.from_radians(0.3) / 2).radians() == pytest.approx(
        0.15, abs=EPS)
    assert S1Angle.from_radians(0.3) / S1Angle.from_radians(0.6) == \
        pytest.approx(0.5, abs=EPS)


def test_constructors_that_measure_angles():
    assert S1Angle((1, 0, 0), (0, 0, 2)).radians() == pytest.approx(
        math.pi / 2, abs=EPS)
    assert S1Angle((1, 0, 0), (1, 0, 0)).radians() == pytest.approx(
        0.0, abs=EPS)


def test_degrees_vs_e6():
    for i in range(180):
        assert S1Angle.from_degrees(i) == S1Angle.from_e6(1000000 * i)


# ---------------------------------------------------------------------------
# S1ChordAngle


def test_chord_default_constructor():
    assert S1ChordAngle() == S1ChordAngle.zero()


def test_chord_two_point_constructor():
    rng = np.random.default_rng(61)
    for _ in range(50):
        z = _unit(rng.normal(size=3))
        from s2geometry_d_ray.core import coords
        frame = np.asarray(coords.get_frame(z))
        x, y = frame[:, 0], frame[:, 1]
        assert S1ChordAngle(z, z).to_s1angle() == S1Angle.zero()
        assert S1ChordAngle(-z, z).radians() == pytest.approx(
            math.pi, abs=1e-7)
        assert S1ChordAngle(x, z).radians() == pytest.approx(
            math.pi / 2, abs=EPS)
        w = _unit(y + z)
        assert S1ChordAngle(w, z).radians() == pytest.approx(
            math.pi / 4, abs=EPS)


def test_chord_from_length2():
    assert S1ChordAngle.from_length2(0).degrees() == pytest.approx(
        0, abs=EPS)
    assert S1ChordAngle.from_length2(1).degrees() == pytest.approx(
        60, abs=EPS)
    assert S1ChordAngle.from_length2(2).degrees() == pytest.approx(
        90, abs=EPS)
    assert S1ChordAngle.from_length2(4).degrees() == pytest.approx(
        180, abs=EPS)
    assert S1ChordAngle.from_length2(5).degrees() == pytest.approx(
        180, abs=EPS)


def test_chord_special_values():
    assert S1ChordAngle.zero().to_s1angle() == S1Angle.zero()
    assert S1ChordAngle.right().degrees() == pytest.approx(90, abs=EPS)
    assert S1ChordAngle.straight().to_s1angle() == S1Angle.from_degrees(180)
    assert S1ChordAngle.straight() < S1ChordAngle.infinity()
    assert S1ChordAngle.infinity() == S1ChordAngle.infinity()
    assert S1ChordAngle.infinity().to_s1angle() == S1Angle.infinity()
    assert S1ChordAngle.negative() < S1ChordAngle.zero()
    assert S1ChordAngle.negative() == S1ChordAngle.negative()
    assert S1ChordAngle.negative().to_s1angle() < S1Angle.zero()


def test_chord_predicates():
    assert S1ChordAngle.zero().is_zero()
    assert not S1ChordAngle.zero().is_negative()
    assert not S1ChordAngle.zero().is_special()
    assert not S1ChordAngle.straight().is_special()
    assert S1ChordAngle.negative().is_negative()
    assert S1ChordAngle.negative().is_special()
    assert S1ChordAngle.infinity().is_infinity()
    assert S1ChordAngle.infinity().is_special()


def test_chord_to_from_s1angle():
    assert S1ChordAngle(S1Angle.zero()).radians() == 0
    assert S1ChordAngle(S1Angle.from_radians(math.pi)).length2() == 4
    assert S1ChordAngle(S1Angle.from_radians(math.pi)).radians() == math.pi
    assert S1ChordAngle(S1Angle.infinity()).to_s1angle() == \
        S1Angle.infinity()
    assert S1ChordAngle(S1Angle.from_radians(-1)).radians() < 0
    assert S1ChordAngle(S1Angle.from_radians(1.0)).radians() == 1.0


def test_chord_successor():
    assert S1ChordAngle.negative().successor() == S1ChordAngle.zero()
    assert S1ChordAngle.straight().successor() == S1ChordAngle.infinity()
    assert S1ChordAngle.infinity().successor() == S1ChordAngle.infinity()
    x = S1ChordAngle.negative()
    for _ in range(10):
        assert x < x.successor()
        x = x.successor()


def test_chord_predecessor():
    assert S1ChordAngle.infinity().predecessor() == S1ChordAngle.straight()
    assert S1ChordAngle.zero().predecessor() == S1ChordAngle.negative()
    assert S1ChordAngle.negative().predecessor() == S1ChordAngle.negative()
    x = S1ChordAngle.infinity()
    for _ in range(10):
        assert x > x.predecessor()
        x = x.predecessor()


def test_chord_arithmetic():
    zero = S1ChordAngle.zero()
    d30 = S1ChordAngle.from_degrees(30)
    d60 = S1ChordAngle.from_degrees(60)
    d90 = S1ChordAngle.from_degrees(90)
    d120 = S1ChordAngle.from_degrees(120)
    d180 = S1ChordAngle.straight()
    assert (zero + zero).degrees() == 0
    assert (zero - zero).degrees() == 0
    assert (d60 - d60).degrees() == 0
    assert (d180 - d180).degrees() == 0
    assert (zero - d60).degrees() == 0
    assert (d30 - d90).degrees() == 0
    assert (d60 + zero).degrees() == pytest.approx(60, abs=EPS)
    assert (d60 - zero).degrees() == pytest.approx(60, abs=EPS)
    assert (zero + d60).degrees() == pytest.approx(60, abs=EPS)
    assert (d30 + d60).degrees() == pytest.approx(90, abs=EPS)
    assert (d60 + d30).degrees() == pytest.approx(90, abs=EPS)
    assert (d90 - d30).degrees() == pytest.approx(60, abs=EPS)
    assert (d90 - d60).degrees() == pytest.approx(30, abs=EPS)
    assert (d180 + zero).degrees() == pytest.approx(180, abs=EPS)
    assert (d180 - zero).degrees() == pytest.approx(180, abs=EPS)
    assert (d90 + d90).degrees() == pytest.approx(180, abs=EPS)
    assert (d120 + d90).degrees() == pytest.approx(180, abs=EPS)
    assert (d120 + d120).degrees() == pytest.approx(180, abs=EPS)
    assert (d30 + d180).degrees() == pytest.approx(180, abs=EPS)
    assert (d180 + d180).degrees() == pytest.approx(180, abs=EPS)


def test_chord_trigonometry():
    iters = 20
    for i in range(iters + 1):
        rads = math.pi * i / iters
        angle = S1ChordAngle(S1Angle.from_radians(rads))
        assert math.sin(rads) == pytest.approx(angle.sin(), abs=1e-15)
        assert math.cos(rads) == pytest.approx(angle.cos(), abs=1e-15)
        assert math.atan(math.tan(rads)) == pytest.approx(
            math.atan(angle.tan()), abs=1e-15)
    angle90 = S1ChordAngle.from_length2(2)
    angle180 = S1ChordAngle.from_length2(4)
    assert angle90.sin() == 1
    assert angle90.cos() == 0
    assert angle90.tan() == float("inf")
    assert angle180.sin() == 0
    assert angle180.cos() == -1
    assert angle180.tan() == 0


def test_chord_plus_error():
    assert S1ChordAngle.negative().plus_error(5) == S1ChordAngle.negative()
    assert S1ChordAngle.infinity().plus_error(-5) == \
        S1ChordAngle.infinity()
    assert S1ChordAngle.straight().plus_error(5) == S1ChordAngle.straight()
    assert S1ChordAngle.zero().plus_error(-5) == S1ChordAngle.zero()
    assert S1ChordAngle.from_length2(1).plus_error(0.25) == \
        S1ChordAngle.from_length2(1.25)
    assert S1ChordAngle.from_length2(1).plus_error(-0.25) == \
        S1ChordAngle.from_length2(0.75)


def test_chord_s2point_constructor_max_error():
    """Reduced sweep (2000 of 100k) of the error-bound contract against
    the exact compare_distance predicate."""
    rng = np.random.default_rng(67)
    for _ in range(2000):
        x = _unit(rng.normal(size=3))
        y = _unit(rng.normal(size=3))
        if rng.integers(0, 10) == 0:
            r = 1e-15 * rng.random()
            y = np.asarray(interpolate_at_distance(r, x, y))
            if rng.integers(0, 2) == 0:
                y = -y
        dist = S1ChordAngle(x, y)
        error = dist.get_s2point_constructor_max_error()
        assert compare_distance(tuple(x), tuple(y),
                                dist.plus_error(error).length2()) <= 0
        assert compare_distance(tuple(x), tuple(y),
                                dist.plus_error(-error).length2()) >= 0
