"""getIntersection conformance — port of the reference
test/s2/s2edge_crossings_test.d "IntersectionError" unittest (edges
crossing at slopes 1e-15..1e15, lengths 1e-15..1, barely-crossing
endpoints), against the exact-arithmetic expected point."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import edge_crossings as ec
from s2geometry_d_ray.core.predicates import crossing_sign

DBL_EPS = float(np.finfo(np.float64).eps)
GET_DISTANCE_ABS_ERROR = 3 * DBL_EPS


def _angle(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cross = np.linalg.norm(np.cross(x, y))
    dot = float(x @ y)
    return math.atan2(cross, dot)


def _plane_dist(x, a, b):
    """Exact distance from x to the great circle through (a, b) — a lower
    bound on the edge distance that is free of the float cancellation a
    naive chord-distance evaluation suffers at the 1e-14 scale."""
    from fractions import Fraction
    af = tuple(Fraction(float(v)) for v in a)
    bf = tuple(Fraction(float(v)) for v in b)
    xf = tuple(Fraction(float(v)) for v in x)
    n = (af[1] * bf[2] - af[2] * bf[1],
         af[2] * bf[0] - af[0] * bf[2],
         af[0] * bf[1] - af[1] * bf[0])
    dot = sum(p * q for p, q in zip(xf, n))
    n2 = sum(v * v for v in n)
    x2 = sum(v * v for v in xf)
    sin_d = math.sqrt(float(dot * dot / (n2 * x2)))
    return math.asin(min(1.0, sin_d))


def _random_frame(rng):
    z = rng.normal(size=3)
    z /= np.linalg.norm(z)
    x = np.cross(z, rng.normal(size=3))
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return z, x, y


def test_intersection_error():
    rng = np.random.default_rng(12345)
    max_point_dist = 0.0
    max_edge_dist = 0.0
    n_done = 0
    while n_done < 1000:
        p, d1, d2 = _random_frame(rng)
        slope = 1e-15 * math.pow(1e30, rng.random())
        d2 = d1 + slope * d2
        d2 /= np.linalg.norm(d2)
        ab_len = math.pow(1e-15, rng.random())
        cd_len = math.pow(1e-15, rng.random())
        a_fr = math.pow(1e-5, rng.random())
        if rng.random() < 0.5:
            a_fr = 1 - a_fr
        c_fr = math.pow(1e-5, rng.random())
        if rng.random() < 0.5:
            c_fr = 1 - c_fr
        a = p - a_fr * ab_len * d1
        a /= np.linalg.norm(a)
        b = p + (1 - a_fr) * ab_len * d1
        b /= np.linalg.norm(b)
        c = p - c_fr * cd_len * d2
        c /= np.linalg.norm(c)
        d = p + (1 - c_fr) * cd_len * d2
        d /= np.linalg.norm(d)
        if crossing_sign(tuple(a), tuple(b), tuple(c), tuple(d)) <= 0:
            continue
        n_done += 1

        expected = ec._exact(a, b, c, d)
        if float(expected @ ((a + b) + (c + d))) < 0:
            expected = -expected

        actual = ec.get_intersection(a, b, c, d)
        dist_ab = _plane_dist(actual, a, b)
        dist_cd = _plane_dist(actual, c, d)
        assert dist_ab <= ec.INTERSECTION_ERROR + GET_DISTANCE_ABS_ERROR
        assert dist_cd <= ec.INTERSECTION_ERROR + GET_DISTANCE_ABS_ERROR
        max_edge_dist = max(max_edge_dist, dist_ab, dist_cd)
        point_dist = _angle(expected, actual)
        assert point_dist <= ec.INTERSECTION_ERROR
        max_point_dist = max(max_point_dist, point_dist)
    assert max_point_dist <= ec.INTERSECTION_ERROR


def test_invariance_under_swap_and_reversal():
    rng = np.random.default_rng(7)
    for _ in range(50):
        p, d1, d2 = _random_frame(rng)
        d2 = d1 + 0.5 * d2
        d2 /= np.linalg.norm(d2)
        a = p - 1e-3 * d1
        b = p + 1e-3 * d1
        c = p - 1e-3 * d2
        d = p + 1e-3 * d2
        for v in (a, b, c, d):
            v /= np.linalg.norm(v)
        if crossing_sign(tuple(a), tuple(b), tuple(c), tuple(d)) <= 0:
            continue
        x = ec.get_intersection(a, b, c, d)
        # GI(b,a,c,d) == GI(a,b,d,c) == GI(a,b,c,d); GI(c,d,a,b) == same
        assert np.array_equal(x, ec.get_intersection(b, a, c, d))
        assert np.array_equal(x, ec.get_intersection(a, b, d, c))
        assert np.array_equal(x, ec.get_intersection(c, d, a, b))


def test_exact_collinear_returns_shared_interior_endpoint():
    # Two exactly-collinear overlapping edges along the equator: the
    # exact path returns the lexicographically smallest endpoint interior
    # to the other edge (s2edge_crossings.d:462-481).
    def ll(lng):
        return np.array([math.cos(math.radians(lng)),
                         math.sin(math.radians(lng)), 0.0])
    a0, a1 = ll(0), ll(10)
    b0, b1 = ll(5), ll(15)
    x = ec._exact(a0, a1, b0, b1)
    assert min(tuple(a1), tuple(b0)) == pytest.approx(tuple(x))
