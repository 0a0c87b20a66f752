"""Ported S2PolylineSimplifier tests
(test/s2/s2polyline_simplifier_test.d) plus a randomized precision
sweep mirroring the reference's Precision test structure."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.polyline_simplifier import PolylineSimplifier
from s2geometry_d_ray.core.textformat import make_point, parse_points


def check_simplify(src, dst, target, avoid, disc_on_left,
                   radius_degrees, expected):
    r = math.radians(radius_degrees)
    s = PolylineSimplifier()
    s.initialize(make_point(src))
    for p in parse_points(target):
        s.target_disc(p, r)
    for p, left in zip(parse_points(avoid), disc_on_left):
        s.avoid_disc(p, r, left)
    assert s.extend(make_point(dst)) == expected, \
        f"src={src} dst={dst} target={target} avoid={avoid}"


def test_reuse():
    # s2polyline_simplifier_test.d Reuse
    s = PolylineSimplifier()
    r = math.radians(10.0)
    s.initialize(np.array([1.0, 0.0, 0.0]))
    def n(v):
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)
    assert s.target_disc(n([1, 1, 0]), r)
    assert s.target_disc(n([1, 1, 0.1]), r)
    assert not s.extend(n([1, 1, 0.4]))


def test_no_constraints():
    check_simplify("0:1", "0:1", "", "", [], 0, True)
    check_simplify("0:1", "1:0", "", "", [], 0, True)
    # longer than 90 degrees: not supported
    check_simplify("0:0", "0:91", "", "", [], 0, False)


def test_target_one_point():
    check_simplify("0:0", "0:2", "0:1", "", [], 1e-10, True)
    check_simplify("0:0", "0:2", "1:1", "", [], 0.9, False)
    # target disc containing the source / destination vertex
    check_simplify("0:0", "0:2", "0:0.1", "", [], 1.0, True)
    check_simplify("0:0", "0:2", "0:2.1", "", [], 1.0, True)


def test_avoid_one_point():
    check_simplify("0:0", "0:2", "", "0:1", [True], 1e-10, False)
    check_simplify("0:0", "0:2", "", "1:1", [True], 0.9, True)
    # middle point on the left, but required on the right
    check_simplify("0:0", "0:2", "", "1:1", [False], 1e-10, False)


def test_target_and_avoid():
    check_simplify("0:0", "10:10", "2:3, 4:3, 7:8",
                   "4:2, 7:5, 7:9", [True, True, False], 1.0, True)
    # one targeted point 1.4 degrees away
    check_simplify("0:0", "10:10", "2:3, 4:6, 7:8",
                   "4:2, 7:5, 7:9", [True, True, False], 1.0, False)
    # one avoided point only 0.7 degrees away
    check_simplify("0:0", "10:10", "2:3, 4:3, 7:8",
                   "4:2, 6:5, 7:9", [True, True, False], 1.0, False)


def test_precision_sweep():
    """Reference Precision test structure: discs barely touching /
    missing a random edge; one deliberately infeasible disc must make
    extend() fail, none must make it fail spuriously."""
    from s2geometry_d_ray.core.edge import interpolate_at_distance
    from s2geometry_d_ray.core.edge_clipping import robust_cross_prod

    k_max_error = 25 * np.finfo(np.float64).eps
    s = PolylineSimplifier()
    failures = []
    for it in range(300):
        rng = np.random.default_rng(it + 1)

        def rand_pt():
            v = rng.normal(size=3)
            return v / np.linalg.norm(v)

        src = rand_pt()
        s.initialize(src)
        dst = interpolate_at_distance(rng.uniform(0, 1), src, rand_pt())
        nvec = np.asarray(robust_cross_prod(src, dst), dtype=np.float64)
        nvec = nvec / np.linalg.norm(nvec)
        k_discs = 5
        bad_disc = int(rng.integers(0, 2 * k_discs)) - k_discs
        for i in range(k_discs):
            f = rng.uniform(0, 1)
            a = (1 - f) * src + f * dst
            a = a / np.linalg.norm(a)
            r = rng.uniform(0, 1)
            on_left = bool(rng.integers(0, 2))
            x = interpolate_at_distance(r, a, nvec if on_left else -nvec)
            avoid = bool(rng.integers(0, 2))
            grow = (avoid == (i == bad_disc))
            radius = r + k_max_error if grow else max(0.0, r - k_max_error)
            if avoid:
                s.avoid_disc(x, radius, on_left)
            else:
                s.target_disc(x, radius)
        if s.extend(dst) != (bad_disc < 0):
            failures.append(it)
    assert not failures, f"precision failures at iters {failures}"
