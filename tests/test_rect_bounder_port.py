"""Port of test/s2/s2latlng_rect_bounder_test.d: vertex/interior latitude
extrema, random max-latitude accuracy, nearly-identical/antipodal point
pairs (including the full-sphere antipodal guarantee), and the full
ExpandForSubregions nearly-antipodal criteria table."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core.edge import interpolate_at_distance
from s2geometry_d_ray.core.edge_clipping import robust_cross_prod
from s2geometry_d_ray.core.rect import (BOUNDER_MAX_ERROR, LatLngRect,
                                        RectBounder, S1Interval,
                                        expand_for_subregions)

PI_2 = math.pi / 2
PI_4 = math.pi / 4
DBL_EPS = 2.220446049250313e-16
LAT_ERR, LNG_ERR = BOUNDER_MAX_ERROR
DOUBLE_ERR = 1e-15


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def get_edge_bound(a, b):
    bounder = RectBounder()
    bounder.add_point(np.asarray(a, dtype=np.float64))
    bounder.add_point(np.asarray(b, dtype=np.float64))
    return bounder.get_bound()


def get_edge_bound6(x1, y1, z1, x2, y2, z2):
    return get_edge_bound(_unit((x1, y1, z1)), _unit((x2, y2, z2)))


def test_max_latitude_simple():
    cube_lat = math.asin(1 / math.sqrt(3.0))
    expected = LatLngRect(-cube_lat, cube_lat, S1Interval(-PI_4, PI_4))
    assert get_edge_bound6(1, 1, 1, 1, -1, -1).approx_equals(
        expected, LAT_ERR, LNG_ERR)
    assert get_edge_bound6(1, -1, 1, 1, 1, -1).approx_equals(
        expected, LAT_ERR, LNG_ERR)

    # Min/max latitude in the edge interior: result lands mid-error-band.
    assert get_edge_bound6(1, 1, 1, 1, -1, 1).lat_hi == pytest.approx(
        PI_4 + 0.5 * LAT_ERR, abs=DOUBLE_ERR)
    assert get_edge_bound6(1, -1, 1, 1, 1, 1).lat_hi == pytest.approx(
        PI_4 + 0.5 * LAT_ERR, abs=DOUBLE_ERR)
    assert get_edge_bound6(1, -1, -1, -1, -1, -1).lat_lo == pytest.approx(
        -PI_4 - 0.5 * LAT_ERR, abs=DOUBLE_ERR)
    assert get_edge_bound6(-1, 1, -1, -1, -1, -1).lat_lo == pytest.approx(
        -PI_4 - 0.5 * LAT_ERR, abs=DOUBLE_ERR)

    # Edges through the poles.
    assert get_edge_bound6(.3, .4, 1, -.3, -.4, 1).lat_hi == \
        pytest.approx(PI_2, abs=DOUBLE_ERR)
    assert get_edge_bound6(.3, .4, -1, -.3, -.4, -1).lat_lo == \
        pytest.approx(-PI_2, abs=DOUBLE_ERR)


def test_max_latitude_random():
    rng = np.random.default_rng(19)
    for _ in range(100):
        u = rng.normal(size=3)
        u[2] = DBL_EPS * 1e-6 * (1e12 ** rng.random())
        u = _unit(u)
        v = _unit(robust_cross_prod(np.array([0.0, 0.0, 1.0]), u))
        w = _unit(robust_cross_prod(u, v))

        a = _unit(u - rng.random() * v)
        b = _unit(u + rng.random() * v)
        ab_bound = get_edge_bound(a, b)
        u_lat = math.atan2(u[2], math.hypot(u[0], u[1]))
        assert ab_bound.lat_hi == pytest.approx(u_lat, abs=LAT_ERR)

        c = _unit(w - rng.random() * v)
        d = _unit(w + rng.random() * v)
        cd_bound = get_edge_bound(c, d)
        w_lat = math.atan2(w[2], math.hypot(w[0], w[1]))
        assert cd_bound.lat_hi == pytest.approx(w_lat, abs=LAT_ERR)


def _is_unit_length(p):
    return abs(float(np.dot(p, p)) - 1) <= 5 * DBL_EPS


def _perturb_a_towards_b(a, b, rng):
    choice = rng.random()
    if choice < 0.1:
        return a
    if choice < 0.3:
        while True:
            b2 = (2 - np.linalg.norm(a)
                  + 5 * (rng.random() - 0.5) * DBL_EPS) * np.asarray(a)
            if not np.array_equal(b2, a) and _is_unit_length(b2):
                return b2
    if choice < 0.5:
        return np.asarray(interpolate_at_distance(1e-300, a, b))
    distance = DBL_EPS * 1e-5 * (1e6 ** rng.random())
    return np.asarray(interpolate_at_distance(distance, a, b))


def test_nearly_identical_or_antipodal_points():
    rng = np.random.default_rng(31)

    def random_point():
        return _unit(rng.normal(size=3))

    def random_pole():
        return np.array([0.0, 0.0, 1.0 if rng.integers(0, 2) else -1.0])

    def point_near_pole():
        return _perturb_a_towards_b(random_pole(), random_point(), rng)

    def point_near_equator():
        return _perturb_a_towards_b(
            _unit((rng.random(), rng.random(), 0)), random_pole(), rng)

    for _ in range(1000):
        case = rng.integers(0, 5)
        if case == 0:
            a = random_point()
            b = _perturb_a_towards_b(a, point_near_pole(), rng)
        elif case == 1:
            a = point_near_equator()
            b = _perturb_a_towards_b(a, point_near_equator(), rng)
        elif case == 2:
            a = point_near_pole()
            b = _perturb_a_towards_b(a, random_point(), rng)
        elif case == 3:
            a = point_near_equator()
            b = _perturb_a_towards_b(a, random_point(), rng)
        else:
            a = random_point()
            b = _perturb_a_towards_b(a, random_point(), rng)

        def latlng(p):
            return (math.atan2(p[2], math.hypot(p[0], p[1])),
                    math.atan2(p[1], p[0]))

        la, lo = latlng(a)
        lb, lb2 = latlng(b)
        expected = LatLngRect.from_point_pair(la, lo, lb, lb2)
        bound = get_edge_bound(a, b)
        assert bound.contains_rect(expected)
        assert expected.expanded(LAT_ERR, LNG_ERR).polar_closure() \
            .contains_rect(bound)

        if np.linalg.norm(np.cross(np.asarray(a) - b,
                                   np.asarray(a) + b)) <= 6.110 * DBL_EPS:
            full = get_edge_bound(a, -np.asarray(b))
            assert full.is_full()


def _subregion_bound(x_lat, x_lng, y_lat, y_lng):
    inp = LatLngRect.from_point_pair(x_lat, x_lng, y_lat, y_lng)
    out = expand_for_subregions(inp)
    assert out.contains_rect(inp)
    if not (inp.lat_lo == -PI_2 and inp.lat_hi == PI_2):
        pass
    return out


def test_expand_for_subregions():
    # Bounds that almost straddle the equator and span ~180 deg longitude.
    assert _subregion_bound(3e-16, 0, 1e-14, math.pi).is_full()
    assert not _subregion_bound(9e-16, 0, 1e-14, math.pi).is_full()
    assert _subregion_bound(1e-16, 7e-16, 1e-14, math.pi).is_full()
    assert not _subregion_bound(3e-16, 14e-16, 1e-14, math.pi).is_full()
    assert _subregion_bound(1e-100, 14e-16, 1e-14, math.pi).is_full()
    assert not _subregion_bound(1e-100, 22e-16, 1e-14, math.pi).is_full()

    # <=90 deg longitude, almost 180 deg latitude.
    assert _subregion_bound(-PI_2, -1e-15, PI_2 - 7e-16, 0).is_full()
    assert not _subregion_bound(-PI_2, -1e-15, PI_2 - 30e-16, 0).is_full()
    assert _subregion_bound(-PI_2 + 4e-16, 0, PI_2 - 2e-16, 1e-7).is_full()
    assert not _subregion_bound(-PI_2 + 30e-16, 0, PI_2, 1e-7).is_full()
    assert _subregion_bound(-PI_2 + 4e-16, 0, PI_2 - 4e-16, PI_2).is_full()
    assert not _subregion_bound(-PI_2, 0, PI_2 - 30e-16, PI_2).is_full()

    # Straddling the equator, >90 deg longitude (corner-to-opposite-edge).
    assert _subregion_bound(-PI_2, 0, PI_2 - 1e-8, math.pi - 1e-7).is_full()
    assert not _subregion_bound(-PI_2, 0, PI_2 - 1e-7,
                                math.pi - 1e-7).is_full()
    assert _subregion_bound(-PI_2 + 1e-12, -math.pi + 1e-4, PI_2,
                            0).is_full()
    assert _subregion_bound(-PI_2 + 1e-11, -math.pi + 1e-4, PI_2,
                            0).is_full()

    # ~180 degrees apart in latitude but not nearly-antipodal.
    assert _subregion_bound(1.5, -PI_2, 1.5, PI_2 - 2e-16).approx_equals(
        LatLngRect(1.5, 1.5, S1Interval.full()), LAT_ERR, LNG_ERR)
    assert _subregion_bound(1.5, -PI_2, 1.5, PI_2 - 7e-16).approx_equals(
        LatLngRect(1.5, 1.5, S1Interval(-PI_2, PI_2 - 7e-16)),
        LAT_ERR, LNG_ERR)

    # Full and empty bounds.
    assert expand_for_subregions(LatLngRect.full()).is_full()
    assert expand_for_subregions(LatLngRect.empty()).is_empty()

    # Expansion to include a pole.
    assert _subregion_bound(-PI_2 + 1e-15, 0, -PI_2 + 1e-15,
                            0).approx_equals(
        LatLngRect(-PI_2, -PI_2 + 1e-15, S1Interval.full()),
        LAT_ERR, LNG_ERR)
    assert _subregion_bound(PI_2 - 1e-15, 0, PI_2 - 1e-15, 0).approx_equals(
        LatLngRect(PI_2 - 1e-15, PI_2, S1Interval.full()),
        LAT_ERR, LNG_ERR)
