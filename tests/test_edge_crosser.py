"""Port of the reference S2EdgeCrosser suite
(test/s2/s2edge_crosser_test.d:35-266) against core.edge_crosser.EdgeCrosser
and the stateless predicates it must agree with."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core.edge_crosser import EdgeCrosser
from s2geometry_d_ray.core.edge import interpolate
from s2geometry_d_ray.core.predicates import (
    ORIGIN,
    crossing_sign,
    edge_or_vertex_crossing,
)

MIN_NORMAL = float(np.finfo(np.float64).tiny)


def _norm(p):
    n = math.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])
    return (p[0] / n, p[1] / n, p[2] / n)


def _is_unit_length(p):
    n2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2]
    return abs(n2 - 1.0) <= 5 * 2.220446049250313e-16


def check_crossing(a, b, c, d, robust, edge_or_vertex):
    """testCrossing (s2edge_crosser_test.d:65-108)."""
    if a == c or a == d or b == c or b == d:
        robust = 0
    assert crossing_sign(a, b, c, d) == robust

    crosser = EdgeCrosser(a, b, c)
    assert crosser.crossing_sign(d) == robust
    assert crosser.crossing_sign(c) == robust
    assert crosser.crossing_sign(d, c) == robust
    assert crosser.crossing_sign(c, d) == robust

    assert edge_or_vertex_crossing(a, b, c, d) == edge_or_vertex
    crosser.restart_at(c)
    assert crosser.edge_or_vertex_crossing(d) == edge_or_vertex
    assert crosser.edge_or_vertex_crossing(c) == edge_or_vertex
    assert crosser.edge_or_vertex_crossing(d, c) == edge_or_vertex
    assert crosser.edge_or_vertex_crossing(c, d) == edge_or_vertex

    # The crosser must be re-usable.
    crosser.init(c, d)
    crosser.restart_at(a)
    assert crosser.crossing_sign(b) == robust
    assert crosser.crossing_sign(a) == robust


def check_crossings(a, b, c, d, robust, edge_or_vertex):
    """testCrossings (s2edge_crosser_test.d:110-125)."""
    a, b, c, d = _norm(a), _norm(b), _norm(c), _norm(d)
    check_crossing(a, b, c, d, robust, edge_or_vertex)
    check_crossing(b, a, c, d, robust, edge_or_vertex)
    check_crossing(a, b, d, c, robust, edge_or_vertex)
    check_crossing(b, a, d, c, robust, edge_or_vertex)
    check_crossing(a, a, c, d, -1, False)
    check_crossing(a, b, c, c, -1, False)
    check_crossing(a, a, c, c, -1, False)
    check_crossing(a, b, a, b, 0, True)
    check_crossing(c, d, a, b, robust, edge_or_vertex != (robust == 0))


def test_invalid_default_points():
    """Zero points must not crash (s2edge_crosser_test.d:49-55)."""
    p = (0.0, 0.0, 0.0)
    with np.errstate(all="ignore"):
        crosser = EdgeCrosser(p, p)
        assert crosser.crossing_sign(p, p) == 0
        crosser = EdgeCrosser(p, p)
        assert crosser.edge_or_vertex_crossing(p, p) is False


def test_invalid_nan_points():
    """NaN points must not crash (s2edge_crosser_test.d:57-63)."""
    nan = float("nan")
    p = (nan, nan, nan)
    with np.errstate(all="ignore"):
        crosser = EdgeCrosser(p, p)
        assert crosser.crossing_sign(p, p) == -1
        crosser = EdgeCrosser(p, p)
        assert crosser.edge_or_vertex_crossing(p, p) is False


def test_crossings():
    """The 12 fixture cases (s2edge_crosser_test.d:127-197)."""
    na = math.nextafter
    # Two regular edges that cross.
    check_crossings((1, 2, 1), (1, -3, 0.5), (1, -0.5, -3), (0.1, 0.5, 3),
                    1, True)
    # Two regular edges that intersect at antipodal points.
    check_crossings((1, 2, 1), (1, -3, 0.5), (-1, 0.5, 3), (-0.1, -0.5, -3),
                    -1, False)
    # Two edges on the same great circle starting at antipodal points.
    check_crossings((0, 0, -1), (0, 1, 0), (0, 0, 1), (0, 1, 1), -1, False)
    # Two edges that cross where one vertex is S2::Origin().
    check_crossings((1, 0, 0), ORIGIN, (1, -0.1, 1), (1, 1, -0.1), 1, True)
    # Antipodal intersection with one vertex at Origin().
    check_crossings((1, 0, 0), ORIGIN, (-1, 0.1, -1), (-1, -1, 0.1),
                    -1, False)
    # Two edges sharing an endpoint; CD further CCW around (2,3,4) than AB.
    check_crossings((2, 3, 4), (-1, 2, 5), (7, -2, 3), (2, 3, 4), 0, False)
    # Barely crossing near the middle of one edge.
    check_crossings((1, 1, 1), (1, na(1.0, 0.0), -1), (11, -12, -1),
                    (10, 10, 1), 1, True)
    # Separated by ~1e-15.
    check_crossings((1, 1, 1), (1, na(1.0, 2.0), -1), (1, -1, 0), (1, 1, 0),
                    -1, False)
    # Barely crossing near the end of both edges (requires exact arithmetic).
    check_crossings((0, 0, 1), (2, -MIN_NORMAL, 1), (1, -1, 1),
                    (MIN_NORMAL, 0, 1), 1, True)
    # Separated by ~1e-640.
    check_crossings((0, 0, 1), (2, MIN_NORMAL, 1), (1, -1, 1),
                    (MIN_NORMAL, 0, 1), -1, False)
    # Barely crossing near the middle; >2000-bit exact determinants.
    check_crossings((1, -MIN_NORMAL, -MIN_NORMAL),
                    (MIN_NORMAL, 1, MIN_NORMAL), (1, -1, MIN_NORMAL),
                    (1, 1, 0), 1, True)
    # Separated by ~1e-640.
    check_crossings((1, MIN_NORMAL, -MIN_NORMAL),
                    (-MIN_NORMAL, 1, MIN_NORMAL), (1, -1, MIN_NORMAL),
                    (1, 1, 0), -1, False)


def test_collinear_edges_that_dont_touch():
    """s2edge_crosser_test.d:199-213."""
    rng = np.random.default_rng(20260817)
    for _ in range(500):
        a = tuple(_norm(rng.normal(size=3)))
        d = tuple(_norm(rng.normal(size=3)))
        b = tuple(interpolate(0.05, a, d))
        c = tuple(interpolate(0.95, a, d))
        assert crossing_sign(a, b, c, d) < 0
        crosser = EdgeCrosser(a, b, c)
        assert crosser.crossing_sign(d) < 0
        assert crosser.crossing_sign(c) < 0


def test_coincident_zero_length_edges_that_dont_touch():
    """Exactly-proportional vertices never intersect
    (s2edge_crosser_test.d:215-266)."""
    rng = np.random.default_rng(7)
    iters = 0
    while iters < 1000:
        # Every component zero or a power of 2 (identical mantissas).
        p = np.array([2.0 ** -int(rng.integers(0, 11))
                      if rng.integers(0, 4) else 0.0 for _ in range(3)])
        n = float(np.sqrt((p * p).sum()))
        if n == 0.0:
            continue
        p = tuple(p / n)
        a = tuple((1 - 3e-16) * v for v in p)
        b = tuple((1 - 1e-16) * v for v in p)
        c = p
        d = tuple((1 + 2e-16) * v for v in p)
        if not (_is_unit_length(a) and _is_unit_length(d)):
            continue
        iters += 1
        assert crossing_sign(a, b, c, d) < 0
        crosser = EdgeCrosser(a, b, c)
        assert crosser.crossing_sign(d) < 0
        assert crosser.crossing_sign(c) < 0
