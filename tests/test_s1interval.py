"""Port of the reference S1Interval suite (test/s2/s1interval_test.d):
constructors, predicates, center/length/complement, the full 100+-row
interval-ops table, add_point, project, expansion, approx-equals, and
directed Hausdorff distance."""

import math

import pytest

from s2geometry_d_ray.core.rect import S1Interval

PI = math.pi
PI_2 = 0.5 * math.pi

empty = S1Interval.empty()
full = S1Interval.full()
zero = S1Interval(0, 0)
pi2 = S1Interval(PI_2, PI_2)
pi = S1Interval(PI, PI)
mipi = S1Interval(-PI, -PI)  # Normalized to [pi, pi].
mipi2 = S1Interval(-PI_2, -PI_2)
quad1 = S1Interval(0, PI_2)
quad2 = S1Interval(PI_2, -PI)
quad3 = S1Interval(PI, -PI_2)
quad4 = S1Interval(-PI_2, 0)
quad12 = S1Interval(0, -PI)
quad23 = S1Interval(PI_2, -PI_2)
quad34 = S1Interval(-PI, 0)
quad41 = S1Interval(-PI_2, PI_2)
quad123 = S1Interval(0, -PI_2)
quad234 = S1Interval(PI_2, 0)
quad341 = S1Interval(PI, PI_2)
quad412 = S1Interval(-PI_2, -PI)
mid12 = S1Interval(PI_2 - 0.01, PI_2 + 0.02)
mid23 = S1Interval(PI - 0.01, -PI + 0.02)
mid34 = S1Interval(-PI_2 - 0.01, -PI_2 + 0.02)
mid41 = S1Interval(-0.01, 0.02)


def test_constructors_and_accessors():
    """s1interval_test.d:69-92."""
    assert quad12.lo == 0 and quad12.hi == PI
    assert quad34.lo == PI and quad34.hi == 0
    assert pi.lo == PI and pi.hi == PI
    # [-pi, -pi] normalizes to [pi, pi].
    assert mipi.lo == PI and mipi.hi == PI
    assert quad23.lo == PI_2 and quad23.hi == -PI_2
    assert empty.is_valid() and empty.is_empty()


def test_simple_predicates():
    """s1interval_test.d:94-105."""
    assert zero.is_valid() and not zero.is_empty() and not zero.is_full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_full()
    assert empty.is_inverted()
    assert full.is_valid() and not full.is_empty() and full.is_full()
    assert not quad12.is_empty() and not quad12.is_full() \
        and not quad12.is_inverted()
    assert not quad23.is_empty() and not quad23.is_full() \
        and quad23.is_inverted()
    assert pi.is_valid() and not pi.is_empty() and not pi.is_inverted()
    assert mipi.is_valid() and not mipi.is_empty() \
        and not mipi.is_inverted()


def test_almost_empty_or_full():
    """Rounding must not collapse to empty/full (s1interval_test.d:107-117).
    """
    almost_pi = PI - 2 * 2.220446049250313e-16
    assert not S1Interval(-almost_pi, PI).is_full()
    assert not S1Interval(-PI, almost_pi).is_full()
    assert not S1Interval(PI, -almost_pi).is_empty()
    assert not S1Interval(almost_pi, -PI).is_empty()


def test_get_center():
    """s1interval_test.d:119-129."""
    assert quad12.get_center() == PI_2
    assert S1Interval(3.1, 2.9).get_center() == pytest.approx(3.0 - PI,
                                                              abs=1e-4)
    assert S1Interval(-2.9, -3.1).get_center() == pytest.approx(PI - 3.0,
                                                                abs=1e-4)
    assert S1Interval(2.1, -2.1).get_center() == pytest.approx(PI, abs=1e-4)
    assert pi.get_center() == PI
    assert mipi.get_center() == PI
    assert abs(quad23.get_center()) == PI
    assert quad123.get_center() == pytest.approx(0.75 * PI, abs=1e-4)


def test_get_length():
    """s1interval_test.d:131-140."""
    assert quad12.get_length() == PI
    assert pi.get_length() == 0
    assert mipi.get_length() == 0
    assert quad123.get_length() == pytest.approx(1.5 * PI, abs=1e-4)
    assert abs(quad23.get_length()) == PI
    assert full.get_length() == 2 * PI
    assert empty.get_length() < 0


def test_complement():
    """s1interval_test.d:142-152."""
    assert empty.complement().is_full()
    assert full.complement().is_empty()
    assert pi.complement().is_full()
    assert mipi.complement().is_full()
    assert zero.complement().is_full()
    assert quad12.complement().approx_equals(quad34)
    assert quad34.complement().approx_equals(quad12)
    assert quad123.complement().approx_equals(quad4)


def test_contains_point():
    """s1interval_test.d:154-179."""
    assert not empty.contains(0) and not empty.contains(PI) \
        and not empty.contains(-PI)
    assert not empty.interior_contains(PI) \
        and not empty.interior_contains(-PI)
    assert full.contains(0) and full.contains(PI) and full.contains(-PI)
    assert full.interior_contains(PI) and full.interior_contains(-PI)
    assert quad12.contains(0) and quad12.contains(PI) \
        and quad12.contains(-PI)
    assert quad12.interior_contains(PI_2) \
        and not quad12.interior_contains(0)
    assert not quad12.interior_contains(PI) \
        and not quad12.interior_contains(-PI)
    assert quad23.contains(PI_2) and quad23.contains(-PI_2)
    assert quad23.contains(PI) and quad23.contains(-PI)
    assert not quad23.contains(0)
    assert not quad23.interior_contains(PI_2) \
        and not quad23.interior_contains(-PI_2)
    assert quad23.interior_contains(PI) and quad23.interior_contains(-PI)
    assert not quad23.interior_contains(0)
    assert pi.contains(PI) and pi.contains(-PI) and not pi.contains(0)
    assert not pi.interior_contains(PI) and not pi.interior_contains(-PI)
    assert mipi.contains(PI) and mipi.contains(-PI) and not mipi.contains(0)
    assert not mipi.interior_contains(PI) \
        and not mipi.interior_contains(-PI)
    assert zero.contains(0) and not zero.interior_contains(0)


def _check_interval_ops(x, y, expected_relation, expected_union,
                        expected_intersection):
    """testIntervalOps (s1interval_test.d:181-209)."""
    assert x.contains_interval(y) == (expected_relation[0] == "T")
    assert x.interior_contains_interval(y) == (expected_relation[1] == "T")
    assert x.intersects(y) == (expected_relation[2] == "T")
    assert x.interior_intersects(y) == (expected_relation[3] == "T")
    assert x.union(y) == expected_union
    assert x.intersection(y) == expected_intersection
    assert x.contains_interval(y) == (x.union(y) == x)
    assert x.intersects(y) == (not x.intersection(y).is_empty())
    if y.lo == y.hi:
        assert x.add_point(y.lo) == expected_union


def test_interval_ops():
    """The full relation table (s1interval_test.d:211-328)."""
    t = _check_interval_ops
    t(empty, empty, "TTFF", empty, empty)
    t(empty, full, "FFFF", full, empty)
    t(empty, zero, "FFFF", zero, empty)
    t(empty, pi, "FFFF", pi, empty)
    t(empty, mipi, "FFFF", mipi, empty)

    t(full, empty, "TTFF", full, empty)
    t(full, full, "TTTT", full, full)
    t(full, zero, "TTTT", full, zero)
    t(full, pi, "TTTT", full, pi)
    t(full, mipi, "TTTT", full, mipi)
    t(full, quad12, "TTTT", full, quad12)
    t(full, quad23, "TTTT", full, quad23)

    t(zero, empty, "TTFF", zero, empty)
    t(zero, full, "FFTF", full, zero)
    t(zero, zero, "TFTF", zero, zero)
    t(zero, pi, "FFFF", S1Interval(0, PI), empty)
    t(zero, pi2, "FFFF", quad1, empty)
    t(zero, mipi, "FFFF", quad12, empty)
    t(zero, mipi2, "FFFF", quad4, empty)
    t(zero, quad12, "FFTF", quad12, zero)
    t(zero, quad23, "FFFF", quad123, empty)

    t(pi2, empty, "TTFF", pi2, empty)
    t(pi2, full, "FFTF", full, pi2)
    t(pi2, zero, "FFFF", quad1, empty)
    t(pi2, pi, "FFFF", S1Interval(PI_2, PI), empty)
    t(pi2, pi2, "TFTF", pi2, pi2)
    t(pi2, mipi, "FFFF", quad2, empty)
    t(pi2, mipi2, "FFFF", quad23, empty)
    t(pi2, quad12, "FFTF", quad12, pi2)
    t(pi2, quad23, "FFTF", quad23, pi2)

    t(pi, empty, "TTFF", pi, empty)
    t(pi, full, "FFTF", full, pi)
    t(pi, zero, "FFFF", S1Interval(PI, 0), empty)
    t(pi, pi, "TFTF", pi, pi)
    t(pi, pi2, "FFFF", S1Interval(PI_2, PI), empty)
    t(pi, mipi, "TFTF", pi, pi)
    t(pi, mipi2, "FFFF", quad3, empty)
    t(pi, quad12, "FFTF", S1Interval(0, PI), pi)
    t(pi, quad23, "FFTF", quad23, pi)

    t(mipi, empty, "TTFF", mipi, empty)
    t(mipi, full, "FFTF", full, mipi)
    t(mipi, zero, "FFFF", quad34, empty)
    t(mipi, pi, "TFTF", mipi, mipi)
    t(mipi, pi2, "FFFF", quad2, empty)
    t(mipi, mipi, "TFTF", mipi, mipi)
    t(mipi, mipi2, "FFFF", S1Interval(-PI, -PI_2), empty)
    t(mipi, quad12, "FFTF", quad12, mipi)
    t(mipi, quad23, "FFTF", quad23, mipi)

    t(quad12, empty, "TTFF", quad12, empty)
    t(quad12, full, "FFTT", full, quad12)
    t(quad12, zero, "TFTF", quad12, zero)
    t(quad12, pi, "TFTF", quad12, pi)
    t(quad12, mipi, "TFTF", quad12, mipi)
    t(quad12, quad12, "TFTT", quad12, quad12)
    t(quad12, quad23, "FFTT", quad123, quad2)
    t(quad12, quad34, "FFTF", full, quad12)

    t(quad23, empty, "TTFF", quad23, empty)
    t(quad23, full, "FFTT", full, quad23)
    t(quad23, zero, "FFFF", quad234, empty)
    t(quad23, pi, "TTTT", quad23, pi)
    t(quad23, mipi, "TTTT", quad23, mipi)
    t(quad23, quad12, "FFTT", quad123, quad2)
    t(quad23, quad23, "TFTT", quad23, quad23)
    t(quad23, quad34, "FFTT", quad234, S1Interval(-PI, -PI_2))

    t(quad1, quad23, "FFTF", quad123, S1Interval(PI_2, PI_2))
    t(quad2, quad3, "FFTF", quad23, mipi)
    t(quad3, quad2, "FFTF", quad23, pi)
    t(quad2, pi, "TFTF", quad2, pi)
    t(quad2, mipi, "TFTF", quad2, mipi)
    t(quad3, pi, "TFTF", quad3, pi)
    t(quad3, mipi, "TFTF", quad3, mipi)

    t(quad12, mid12, "TTTT", quad12, mid12)
    t(mid12, quad12, "FFTT", quad12, mid12)

    quad12eps = S1Interval(quad12.lo, mid23.hi)
    quad2hi = S1Interval(mid23.lo, quad12.hi)
    t(quad12, mid23, "FFTT", quad12eps, quad2hi)
    t(mid23, quad12, "FFTT", quad12eps, quad2hi)

    quad412eps = S1Interval(mid34.lo, quad12.hi)
    t(quad12, mid34, "FFFF", quad412eps, empty)
    t(mid34, quad12, "FFFF", quad412eps, empty)

    quadeps12 = S1Interval(mid41.lo, quad12.hi)
    quad1lo = S1Interval(quad12.lo, mid41.hi)
    t(quad12, mid41, "FFTT", quadeps12, quad1lo)
    t(mid41, quad12, "FFTT", quadeps12, quad1lo)

    quad2lo = S1Interval(quad23.lo, mid12.hi)
    quad3hi = S1Interval(mid34.lo, quad23.hi)
    quadeps23 = S1Interval(mid12.lo, quad23.hi)
    quad23eps = S1Interval(quad23.lo, mid34.hi)
    quadeps123 = S1Interval(mid41.lo, quad23.hi)
    t(quad23, mid12, "FFTT", quadeps23, quad2lo)
    t(mid12, quad23, "FFTT", quadeps23, quad2lo)
    t(quad23, mid23, "TTTT", quad23, mid23)
    t(mid23, quad23, "FFTT", quad23, mid23)
    t(quad23, mid34, "FFTT", quad23eps, quad3hi)
    t(mid34, quad23, "FFTT", quad23eps, quad3hi)
    t(quad23, mid41, "FFFF", quadeps123, empty)
    t(mid41, quad23, "FFFF", quadeps123, empty)


def test_add_point():
    """s1interval_test.d:330-354."""
    assert empty.add_point(0) == zero
    assert empty.add_point(PI) == pi
    assert empty.add_point(-PI) == mipi
    assert empty.add_point(PI).add_point(-PI) == pi
    assert empty.add_point(-PI).add_point(PI) == mipi
    assert empty.add_point(mid12.lo).add_point(mid12.hi) == mid12
    assert empty.add_point(mid23.lo).add_point(mid23.hi) == mid23
    assert quad1.add_point(-0.9 * PI).add_point(-PI_2) == quad123
    assert full.add_point(0).is_full()
    assert full.add_point(PI).is_full()
    assert full.add_point(-PI).is_full()


def test_project():
    """s1interval_test.d:356-372."""
    r = S1Interval(-PI, -PI)
    assert r.project(-PI) == PI
    assert r.project(0) == PI
    r = S1Interval(0, PI)
    assert r.project(0.1) == 0.1
    assert r.project(-PI_2 + 1e-15) == 0.0
    assert r.project(-PI_2 - 1e-15) == PI
    r = S1Interval(PI - 0.1, -PI + 0.1)
    assert r.project(PI) == PI
    assert r.project(1e-15) == PI - 0.1
    assert r.project(-1e-15) == -PI + 0.1
    assert S1Interval.full().project(0) == 0.0
    assert S1Interval.full().project(PI) == PI
    assert S1Interval.full().project(-PI) == PI


def test_from_point_pair():
    """s1interval_test.d:374-380."""
    assert S1Interval.from_point_pair(-PI, PI) == pi
    assert S1Interval.from_point_pair(PI, -PI) == pi
    assert S1Interval.from_point_pair(mid34.hi, mid34.lo) == mid34
    assert S1Interval.from_point_pair(mid23.lo, mid23.hi) == mid23


def test_expanded():
    """s1interval_test.d:382-400."""
    assert empty.expanded(1) == empty
    assert full.expanded(1) == full
    assert zero.expanded(1) == S1Interval(-1, 1)
    assert mipi.expanded(0.01) == S1Interval(PI - 0.01, -PI + 0.01)
    assert pi.expanded(27) == full
    assert pi.expanded(PI_2).approx_equals(quad23)
    assert pi2.expanded(PI_2) == quad12
    assert mipi2.expanded(PI_2) == quad34

    assert empty.expanded(-1) == empty
    assert full.expanded(-1) == full
    assert quad123.expanded(-27) == empty
    assert quad234.expanded(-27) == empty
    assert quad123.expanded(-PI_2) == quad2
    assert quad341.expanded(-PI_2).approx_equals(quad4)
    assert quad412.expanded(-PI_2) == quad1


def test_approx_equals():
    """s1interval_test.d:402-459."""
    k_lo = 3 * 2.220446049250313e-16  # < default max_error
    k_hi = 6 * 2.220446049250313e-16  # > default max_error

    assert empty.approx_equals(empty)
    assert zero.approx_equals(empty) and empty.approx_equals(zero)
    assert pi.approx_equals(empty) and empty.approx_equals(pi)
    assert mipi.approx_equals(empty) and empty.approx_equals(mipi)
    assert not empty.approx_equals(full)
    assert empty.approx_equals(S1Interval(1, 1 + 2 * k_lo))
    assert not empty.approx_equals(S1Interval(1, 1 + 2 * k_hi))
    assert S1Interval(PI - k_lo, -PI + k_lo).approx_equals(empty)

    assert full.approx_equals(full)
    assert not full.approx_equals(empty)
    assert not full.approx_equals(zero)
    assert not full.approx_equals(pi)
    assert full.approx_equals(S1Interval(k_lo, -k_lo))
    assert not full.approx_equals(S1Interval(2 * k_hi, 0))
    assert S1Interval(-PI + k_lo, PI - k_lo).approx_equals(full)
    assert not S1Interval(-PI, PI - 2 * k_hi).approx_equals(full)

    assert pi.approx_equals(pi) and mipi.approx_equals(pi)
    assert pi.approx_equals(S1Interval(PI - k_lo, PI - k_lo))
    assert not pi.approx_equals(S1Interval(PI - k_hi, PI - k_hi))
    assert pi.approx_equals(S1Interval(PI - k_lo, -PI + k_lo))
    assert not pi.approx_equals(S1Interval(PI - k_hi, -PI))
    assert not zero.approx_equals(pi)
    assert pi.union(mid12).union(zero).approx_equals(quad12)
    assert quad2.intersection(quad3).approx_equals(pi)
    assert quad3.intersection(quad2).approx_equals(pi)

    # Nearly-same endpoints but in opposite order (inverted intervals).
    assert not S1Interval(0, k_lo).approx_equals(S1Interval(k_lo, 0))
    assert not S1Interval(PI - 0.5 * k_lo, -PI + 0.5 * k_lo).approx_equals(
        S1Interval(-PI + 0.5 * k_lo, PI - 0.5 * k_lo))

    assert S1Interval(1 - k_lo, 2 + k_lo).approx_equals(S1Interval(1, 2))
    assert S1Interval(1 + k_lo, 2 - k_lo).approx_equals(S1Interval(1, 2))
    assert S1Interval(2 - k_lo, 1 + k_lo).approx_equals(S1Interval(2, 1))
    assert S1Interval(2 + k_lo, 1 - k_lo).approx_equals(S1Interval(2, 1))
    assert not S1Interval(1 - k_hi, 2 + k_lo).approx_equals(S1Interval(1, 2))
    assert not S1Interval(1 + k_hi, 2 - k_lo).approx_equals(S1Interval(1, 2))
    assert not S1Interval(2 - k_hi, 1 + k_lo).approx_equals(S1Interval(2, 1))
    assert not S1Interval(2 + k_hi, 1 - k_lo).approx_equals(S1Interval(2, 1))
    assert not S1Interval(1 - k_lo, 2 + k_hi).approx_equals(S1Interval(1, 2))
    assert not S1Interval(1 + k_lo, 2 - k_hi).approx_equals(S1Interval(1, 2))
    assert not S1Interval(2 - k_lo, 1 + k_hi).approx_equals(S1Interval(2, 1))
    assert not S1Interval(2 + k_lo, 1 - k_hi).approx_equals(S1Interval(2, 1))


def test_get_directed_hausdorff_distance():
    """s1interval_test.d:461-475."""
    assert empty.get_directed_hausdorff_distance(empty) == \
        pytest.approx(0.0, abs=1e-4)
    assert empty.get_directed_hausdorff_distance(mid12) == \
        pytest.approx(0.0, abs=1e-4)
    assert mid12.get_directed_hausdorff_distance(empty) == \
        pytest.approx(PI, abs=1e-4)
    assert quad12.get_directed_hausdorff_distance(quad123) == 0.0
    interval = S1Interval(3.0, -3.0)  # complement center is 0
    assert S1Interval(-0.1, 0.2).get_directed_hausdorff_distance(
        interval) == pytest.approx(3.0, abs=1e-4)
    assert S1Interval(0.1, 0.2).get_directed_hausdorff_distance(
        interval) == pytest.approx(3.0 - 0.1, abs=1e-4)
    assert S1Interval(-0.2, -0.1).get_directed_hausdorff_distance(
        interval) == pytest.approx(3.0 - 0.1, abs=1e-4)
