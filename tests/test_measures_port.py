"""Port of test/s2/s2measures_test.d (angle/turnAngle and the full area
accuracy sweep incl. Girard robustness on 1e-15 triangles) and
test/s2/s2centroids_test.d (TrueCentroid on near-planar triangles)."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.measures import (angle, girard_area,
                                            triangle_area, true_centroid,
                                            turn_angle)

DBL_ERR = 1e-4
PZ = (0.0, 0.0, 1.0)
P000 = (1.0, 0.0, 0.0)
P045 = tuple(np.array([1.0, 1.0, 0.0]) / math.sqrt(2))
P090 = (0.0, 1.0, 0.0)
P180 = (-1.0, 0.0, 0.0)


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    return tuple(v / np.linalg.norm(v))


def test_angle_methods():
    assert angle(P000, PZ, P045) == pytest.approx(math.pi / 4, abs=DBL_ERR)
    assert turn_angle(P000, PZ, P045) == pytest.approx(
        -3 * math.pi / 4, abs=DBL_ERR)
    assert angle(P045, PZ, P180) == pytest.approx(3 * math.pi / 4,
                                                  abs=DBL_ERR)
    assert turn_angle(P045, PZ, P180) == pytest.approx(-math.pi / 4,
                                                       abs=DBL_ERR)
    assert angle(P000, PZ, P180) == pytest.approx(math.pi, abs=DBL_ERR)
    assert turn_angle(P000, PZ, P180) == pytest.approx(0, abs=DBL_ERR)
    assert angle(PZ, P000, P045) == pytest.approx(math.pi / 2, abs=DBL_ERR)
    assert turn_angle(PZ, P000, P045) == pytest.approx(math.pi / 2,
                                                       abs=DBL_ERR)
    assert angle(PZ, P000, PZ) == pytest.approx(0, abs=DBL_ERR)
    assert abs(turn_angle(PZ, P000, PZ)) == pytest.approx(math.pi,
                                                          abs=DBL_ERR)


def test_area_methods():
    assert triangle_area(P000, P090, PZ) == pytest.approx(math.pi / 2,
                                                          abs=DBL_ERR)
    assert triangle_area(P045, PZ, P180) == pytest.approx(
        3 * math.pi / 4, abs=DBL_ERR)

    # Good RELATIVE accuracy for very small areas.
    eps = 1e-10
    pepsx = _norm((eps, 0, 1))
    pepsy = _norm((0, eps, 1))
    expected1 = 0.5 * eps * eps
    assert triangle_area(pepsx, pepsy, PZ) == pytest.approx(
        expected1, abs=1e-14 * expected1)

    # Degenerate triangles.
    pr = _norm((0.257, -0.5723, 0.112))
    pq = _norm((-0.747, 0.401, 0.2235))
    assert triangle_area(pr, pr, pr) == 0.0
    assert triangle_area(pr, pq, pr) == pytest.approx(0, abs=1e-15)
    assert triangle_area(P000, P045, P090) == 0.0

    # Girard robustness on 1e-15 perturbation triangles: only passes
    # when girardArea uses robustCrossProd (s2measures_test.d:84-97).
    rng = np.random.default_rng(11)
    max_girard = 0.0
    for _ in range(2000):
        p0 = _norm(rng.normal(size=3))
        d1 = _norm(rng.normal(size=3))
        d2 = _norm(rng.normal(size=3))
        p1 = _norm(np.asarray(p0) + 1e-15 * np.asarray(d1))
        p2 = _norm(np.asarray(p0) + 1e-15 * np.asarray(d2))
        assert triangle_area(p0, p1, p2) <= 0.7e-30
        max_girard = max(max_girard, girard_area(p0, p1, p2))
    assert max_girard <= 1e-14

    # Very long and skinny triangle (Mathematica reference value).
    p045eps = _norm((1, 1, eps))
    expected2 = 5.8578643762690495119753e-11
    assert triangle_area(P000, p045eps, P090) == pytest.approx(
        expected2, abs=1e-9 * expected2)

    # Triangles with near-180 degree edges that sum to a quarter-sphere.
    eps2 = 1e-14
    p000eps2 = _norm((1, 0.1 * eps2, eps2))
    quarter1 = (triangle_area(p000eps2, P000, P045)
                + triangle_area(p000eps2, P045, P180)
                + triangle_area(p000eps2, P180, PZ)
                + triangle_area(p000eps2, PZ, P000))
    assert quarter1 == pytest.approx(math.pi, abs=DBL_ERR)

    p045eps2 = _norm((1, 1, eps2))
    quarter2 = (triangle_area(p045eps2, P000, P045)
                + triangle_area(p045eps2, P045, P180)
                + triangle_area(p045eps2, P180, PZ)
                + triangle_area(p045eps2, PZ, P000))
    assert quarter2 == pytest.approx(math.pi, abs=DBL_ERR)

    # Hemisphere via four triangles with one near-180 and one
    # near-degenerate edge (2e-15 absolute tolerance).
    for _ in range(100):
        lng = 2 * math.pi * rng.random()

        def ll(lat_rad, lng_rad):
            x, y, z = coords.latlng_to_xyz(math.degrees(lat_rad),
                                           math.degrees(lng_rad))
            return _norm((float(x), float(y), float(z)))

        p0 = ll(1e-20, lng)
        p1 = ll(0, lng)
        p2 = ll(0, lng + rng.random())
        p3 = ll(0, lng + math.pi)
        p4 = ll(0, lng + 5.0)
        hemi = (triangle_area(p0, p1, p2) + triangle_area(p0, p2, p3)
                + triangle_area(p0, p3, p4) + triangle_area(p0, p4, p1))
        assert hemi == pytest.approx(2 * math.pi, abs=2e-15)


def test_true_centroid():
    """s2centroids_test.d: centroid of a near-planar triangle is at the
    intersection of its medians."""
    rng = np.random.default_rng(5)
    for _ in range(100):
        p = _norm(rng.normal(size=3))
        frame = np.asarray(coords.get_frame(np.asarray(p)))
        x, y = frame[:, 0], frame[:, 1]
        d = 1e-4 * (1e-4 ** rng.random())
        p0 = _norm(np.asarray(p) - d * x)
        p1 = _norm(np.asarray(p) + d * x)
        p2 = _norm(np.asarray(p) + 3 * d * y)
        centroid = _norm(true_centroid(p0, p1, p2))
        expected = _norm(np.asarray(p) + d * y)
        ang = math.atan2(
            float(np.linalg.norm(np.cross(centroid, expected))),
            float(np.dot(centroid, expected)))
        assert ang <= 2e-8
