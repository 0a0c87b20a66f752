"""Port of test/s2/s2pointutil_test.d: frame roundtrips and the Rotate
sweep (log-uniform distances from the axis, including near-antipodal,
with the position-error -> rotation-error conversion)."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.edge import interpolate_at_distance
from s2geometry_d_ray.core.measures import turn_angle

DBL_ERR = 1e-4


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_frames():
    z = _unit((0.2, 0.5, -3.3))
    m = np.asarray(coords.get_frame(z))
    assert np.allclose(m[:, 2], z, atol=1e-14)
    assert abs(np.linalg.norm(m[:, 0]) - 1) < 1e-14
    assert abs(np.linalg.norm(m[:, 1]) - 1) < 1e-14
    assert np.linalg.det(m) == pytest.approx(1.0, abs=DBL_ERR)

    for k, unit in enumerate(np.eye(3)):
        assert np.allclose(coords.to_frame(m, m[:, k]), unit, atol=1e-14)
        assert np.allclose(coords.from_frame(m, unit), m[:, k], atol=1e-14)


def _check_rotate(p, axis, angle):
    result = np.asarray(coords.rotate(p, axis, angle))
    assert abs(np.linalg.norm(result) - 1) < 1e-14

    def ang(u, v):
        return math.atan2(float(np.linalg.norm(np.cross(u, v))),
                          float(np.dot(u, v)))

    k_max_position_error = 1e-15
    assert abs(ang(result, axis) - ang(p, axis)) <= 3e-15

    axis_distance = float(np.linalg.norm(np.cross(p, axis)))
    if axis_distance < k_max_position_error:
        max_rotation_error = 2 * math.pi
    else:
        max_rotation_error = math.asin(
            min(1.0, k_max_position_error / axis_distance))
    actual_rotation = turn_angle(tuple(p), tuple(axis),
                                 tuple(result)) + math.pi
    rotation_error = math.remainder(angle - actual_rotation, 2 * math.pi)
    assert abs(rotation_error) <= max(max_rotation_error, 3e-15)


def test_rotate():
    rng = np.random.default_rng(23)
    for _ in range(500):
        axis = _unit(rng.normal(size=3))
        target = _unit(rng.normal(size=3))
        distance = math.pi * (1e-15 ** rng.random())
        if rng.integers(0, 5) == 0:
            distance = math.pi - distance
        p = np.asarray(interpolate_at_distance(distance, axis, target))
        angle = 2 * math.pi * (1e-15 ** rng.random())
        if rng.integers(0, 3) == 0:
            angle = -angle
        if rng.integers(0, 10) == 0:
            angle = 0.0
        _check_rotate(p, axis, angle)
