"""Exact distance predicates — ported from the reference
test/s2/s2predicates_test.d CompareDistances/CompareDistance/
CompareEdgeDistance Coverage + Consistency tests."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import distance_predicates as dp

EPS = float(np.finfo(np.float64).eps)


def n(p):
    v = np.asarray(p, dtype=np.float64)
    nv = np.linalg.norm(v)
    return v / nv if abs(nv - 1.0) > 4 * EPS else v


def chord2(radians):
    """S1ChordAngle.fromRadians(r).length2()."""
    return min(4.0, (2.0 * math.sin(0.5 * min(math.pi, radians))) ** 2)


RIGHT = 2.0  # S1ChordAngle.right().length2()


def check_compare_distances(x, a, b, expected):
    x, a, b = n(x), n(a), n(b)
    assert dp.compare_distances(x, a, b) == expected
    assert dp.compare_distances(x, b, a) == -expected


def test_compare_distances_coverage_sin2():
    check_compare_distances((1, 1, 1), (1, 1 - 1e-15, 1),
                            (1, 1, 1 + 2e-15), -1)
    check_compare_distances((1, 1, 0), (1, 1 - 1e-15, 1e-21),
                            (1, 1 - 1e-15, 0), 1)
    check_compare_distances((2, 0, 0), (2, -1, 0), (2, 1, 1e-8), -1)
    check_compare_distances((2, 0, 0), (2, -1, 0), (2, 1, 1e-100), -1)
    check_compare_distances((1, 0, 0), (1, -1, 0), (1, 1, 0), 1)
    check_compare_distances((1, 0, 0), (1, 0, 0), (1, 0, 0), 0)


def test_compare_distances_coverage_cos():
    check_compare_distances((1, 1, 1), (1, -1, 0), (-1, 1, 3e-15), 1)
    check_compare_distances((1, 0, 0), (1, 1e-30, 0), (-1, 1e-40, 0), -1)
    check_compare_distances((1, 1, 1), (1, -1, 0), (-1, 1, 3e-18), 1)
    check_compare_distances((1, 1, 1), (1, -1, 0), (-1, 1, 1e-100), 1)
    check_compare_distances((1, 1, 1), (1, -1, 0), (-1, 1, 0), -1)
    check_compare_distances((1, 1, 1), (1, -1, 0), (1, -1, 0), 0)


def test_compare_distances_coverage_minus_sin2():
    check_compare_distances((1, 1, 0), (-1, -1 + 1e-15, 0),
                            (-1, -1, 0), -1)
    check_compare_distances((-1, -1, 0), (1, 1 - 1e-15, 0),
                            (1, 1 - 1e-15, 1e-21), 1)
    check_compare_distances((-1, -1, 0), (2, 1, 0), (2, 1, 1e-8), 1)


def check_compare_distance(x, y, r2, expected):
    x, y = n(x), n(y)
    assert dp.compare_distance(x, y, r2) == expected


def test_compare_distance_coverage():
    check_compare_distance((1, 1, 1), (1, 1 - 1e-15, 1),
                           chord2(1e-15), -1)
    check_compare_distance((1, 0, 0), (1, 1, 0),
                           chord2(math.pi / 4), -1)
    check_compare_distance((1, 1e-40, 0), (1 + EPS, 1e-40, 0),
                           chord2(0.9 * EPS * 1e-40), 1)
    check_compare_distance((1, 1e-40, 0), (1 + EPS, 1e-40, 0),
                           chord2(1.1 * EPS * 1e-40), -1)
    check_compare_distance((1, 0, 0), (1 + EPS, 0, 0), 0.0, 0)
    check_compare_distance((1, 0, 0), (1, 1e-8, 0), chord2(1e-7), -1)
    check_compare_distance((1, 0, 0), (-1, 1e-8, 0),
                           chord2(math.pi - 1e-7), 1)
    check_compare_distance((1, 1, 0), (1, -1 - 2 * EPS, 0), RIGHT, 1)
    check_compare_distance((1, 1, 0), (1, -1 - EPS, 0), RIGHT, 1)
    check_compare_distance((1, 1, 0), (1, -1, 1e-30), RIGHT, 0)
    # The angle between these two points is exactly 60 degrees.
    check_compare_distance((1, 1, 0), (0, 1, 1), 1.0, 0)


def check_compare_edge_distance(x, a0, a1, r2, expected):
    x, a0, a1 = n(x), n(a0), n(a1)
    assert dp.compare_edge_distance(x, a0, a1, r2) == expected


def test_compare_edge_distance_coverage():
    # TriageCompareLineSin2Distance
    check_compare_edge_distance((1, 1e-10, 1e-15), (1, 0, 0), (0, 1, 0),
                                chord2(1e-15 + EPS), -1)
    check_compare_edge_distance((1, 1, 1e-15), (1, 0, 0), (0, 1, 0),
                                chord2(1e-15 + EPS), -1)
    check_compare_edge_distance((1, 1, 1e-40), (1, 0, 0), (0, 1, 0),
                                chord2(1e-40), -1)
    check_compare_edge_distance((1, 1, 0), (1, 0, 0), (0, 1, 0), 0.0, 0)
    # TriageCompareLineCos2Distance
    check_compare_edge_distance((1e-15, 0, 1), (1, 0, 0), (0, 1, 0),
                                chord2(math.pi / 2 - 1e-15 - 5 * EPS), 1)
    check_compare_edge_distance((1e-15, 0, 1), (1, 0, 0), (0, 1, 0),
                                chord2(math.pi / 2 - 1e-15 - EPS), 1)
    check_compare_edge_distance((1e-40, 0, 1), (1, 0, 0), (0, 1, 0),
                                RIGHT, -1)
    check_compare_edge_distance((0, 0, 1), (1, 0, 0), (0, 1, 0),
                                RIGHT, 0)
    # Closest point is an edge endpoint.
    check_compare_edge_distance((1e-15, -1, 0), (1, 0, 0), (1, 1, 0),
                                RIGHT, -1)
    check_compare_edge_distance((1e-18, -1, 0), (1, 0, 0), (1, 1, 0),
                                RIGHT, -1)
    check_compare_edge_distance((1e-100, -1, 0), (1, 0, 0), (1, 1, 0),
                                RIGHT, -1)
    check_compare_edge_distance((0, -1, 0), (1, 0, 0), (1, 1, 0),
                                RIGHT, 0)


def _interpolate_at_distance(r, x, d):
    """Point at angular distance r from x toward direction d (tangent)."""
    t = d - float(d @ x) * x
    t /= np.linalg.norm(t)
    return math.cos(r) * x + math.sin(r) * t


def test_compare_distances_consistency_random():
    """Tiers must agree whenever each is decisive (the reference
    Consistency test shape, fewer iterations)."""
    rng = np.random.default_rng(99)
    for _ in range(300):
        x = n(rng.normal(size=3))
        d = n(rng.normal(size=3))
        r = (math.pi / 2) * math.pow(1e-30, rng.random())
        if rng.random() < 0.5:
            r = math.pi / 2 - r
        if rng.random() < 0.5:
            r = math.pi / 2 + r
        a = _interpolate_at_distance(r, x, d)
        b = _interpolate_at_distance(r, x, -d)
        dbl = dp._triage_compare_cos_distances(x, a, b, np.float64)
        exact = dp._exact_compare_distances(x, a, b)
        full = dp.compare_distances(x, a, b)
        if dbl != 0:
            assert dbl == exact == full
        elif exact != 0:
            assert exact == full
        else:
            assert full == dp._symbolic_compare_distances(x, a, b)
        # transitive antisymmetry
        assert dp.compare_distances(x, b, a) == -full


def test_compare_edge_distance_consistency_random():
    rng = np.random.default_rng(123)
    for _ in range(200):
        a0 = n(rng.normal(size=3))
        d = n(rng.normal(size=3))
        a1 = _interpolate_at_distance(rng.random() * 2.0, a0, d)
        x = n(rng.normal(size=3))
        r2 = chord2(rng.random() * math.pi * 0.49)
        dbl = dp._triage_compare_edge_distance(x, a0, a1, r2, np.float64)
        full = dp.compare_edge_distance(x, a0, a1, r2)
        if dbl != 0:
            assert dbl == full
        exact = dp._exact_compare_edge_distance(x, a0, a1, r2)
        assert exact == full or full == dbl


def check_circumcenter_sign(x0, x1, a, b, c, expected):
    x0, x1, a, b, c = n(x0), n(x1), n(a), n(b), n(c)
    assert dp.edge_circumcenter_sign(x0, x1, a, b, c) == expected
    # Invariances: reversing edge X negates; rotating A,B,C preserves.
    assert dp.edge_circumcenter_sign(x1, x0, a, b, c) == -expected
    assert dp.edge_circumcenter_sign(x0, x1, b, c, a) == expected
    assert dp.edge_circumcenter_sign(x0, x1, c, a, b) == expected


def test_edge_circumcenter_sign_coverage():
    """Ported from s2predicates_test.d EdgeCircumcenterSign.Coverage."""
    check_circumcenter_sign((1, 0, 0), (1, 1, 0),
                            (0, 0, 1), (1, 0, 1), (0, 1, 1), 1)
    check_circumcenter_sign((1, 0, 0), (1, 1, 0),
                            (0, 0, -1), (1, 0, -1), (0, 1, -1), -1)
    check_circumcenter_sign((1, -1, 0), (1, 1, 0),
                            (1, -1e-5, 1), (1, 1e-5, -1),
                            (1, 1 - 1e-5, 1e-5), -1)
    check_circumcenter_sign((1, -1, 0), (1, 1, 0),
                            (1, -1e-5, 1), (1, 1e-5, -1),
                            (1, 1 - 1e-9, 1e-5), -1)
    check_circumcenter_sign((1, -1, 0), (1, 1, 0),
                            (1, -1e-5, 1), (1, 1e-5, -1),
                            (1, 1 - 1e-15, 1e-5), -1)
    check_circumcenter_sign((1, -1, 0), (1, 1, 0),
                            (1, -1e-5, 1), (1, 1e-5, -1),
                            (1, 1, 1e-5), 1)
    # second symbolic perturbation
    check_circumcenter_sign((1, -1, 0), (1, 1, 0),
                            (0, -1, 0), (0, 0, -1), (0, 0, 1), -1)
    # third symbolic perturbation
    check_circumcenter_sign((0, -1, 1), (0, 1, 1),
                            (0, 1, 0), (0, -1, 0), (1, 0, 0), -1)


def check_voronoi(a, b, x0, x1, r2, expected):
    a, b, x0, x1 = n(a), n(b), n(x0), n(x1)
    # preconditions of the reference method
    assert dp.compare_distances(x0, a, b) < 0
    assert dp.compare_edge_distance(a, x0, x1, r2) <= 0
    assert dp.compare_edge_distance(b, x0, x1, r2) <= 0
    got = dp.get_voronoi_site_exclusion(a, b, x0, x1, r2)
    assert got == expected
    # Swapping sites AND the edge direction swaps FIRST <-> SECOND —
    # valid only when the swapped call's precondition holds (B closer
    # to X1), matching the reference test harness.
    if dp.compare_distances(x1, b, a) < 0:
        swapped = {"first": "second", "second": "first",
                   "neither": "neither"}[expected]
        assert dp.get_voronoi_site_exclusion(b, a, x1, x0, r2) == swapped


def test_voronoi_site_exclusion_coverage():
    """Ported from s2predicates_test.d VoronoiSiteExclusion.Coverage."""
    # Both sites closest to edge endpoint X0 / X1.
    check_voronoi((1, -1e-5, 0), (1, -2e-5, 0), (1, 0, 0), (1, 1, 0),
                  chord2(1e-3), "second")
    check_voronoi((1, 1, 1e-30), (1, 1, -1e-20), (1, 0, 0), (1, 1, 0),
                  chord2(1e-10), "second")
    # Neither site excluded.
    check_voronoi((1, -1e-10, 1e-5), (1, 1e-10, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1e-4), "neither")
    check_voronoi((1, -1e-10, 1e-5), (1, 1e-10, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1e-5), "neither")
    check_voronoi((1, -1e-17, 1e-5), (1, 1e-17, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1e-4), "neither")
    check_voronoi((1, -1e-20, 1e-5), (1, 1e-20, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1e-5), "neither")
    # First site excluded.
    check_voronoi((1, -1e-6, 1.0049999999e-5), (1, 0, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1.005e-5), "first")
    check_voronoi((1, -1.00105e-6, 1.0049999999e-5), (1, 0, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1.005e-5), "first")
    check_voronoi((1, -1e-6, 1.005e-5), (1, 0, -1e-5),
                  (1, -1, 0), (1, 1, 0), chord2(1.005e-5), "first")
    check_voronoi((1, -1e-31, 1.005e-30), (1, 0, -1e-30),
                  (1, -1, 0), (1, 1, 0), chord2(1.005e-30), "first")
    # Symbolic-perturbation cases (sites exactly 60 deg from the edge
    # midpoint; S1ChordAngle.fromLength2(1)).
    check_voronoi((0, 1, 1), (1, 0, 1), (0, 1, 1), (1, 0, -1),
                  1.0, "neither")
    check_voronoi((0, 1, 1), (-1, 0, 1), (0, 1, 1), (-1, 0, -1),
                  1.0, "second")
