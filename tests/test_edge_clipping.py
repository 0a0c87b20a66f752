"""Edge clipping conformance — ported from the reference
test/s2/s2edge_clipping_test.d (FaceClipping + EdgeClipping)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core import edge_clipping as ecl
from s2geometry_d_ray.core.rect import S1Interval

ERR = ecl.FACE_CLIP_ERROR_RADIANS


def _fuv2xyz(face, uv):
    return np.array(coords.face_uv_to_xyz_scalar(face, float(uv[0]),
                                                 float(uv[1])))


def _angle(x, y):
    return math.atan2(np.linalg.norm(np.cross(x, y)), float(x @ y))


def check_face_clipping(a_raw, b_raw, rng):
    a = np.asarray(a_raw, dtype=np.float64)
    a = a / np.linalg.norm(a)
    b = np.asarray(b_raw, dtype=np.float64)
    b = b / np.linalg.norm(b)
    if np.array_equal(a, -b):
        return

    segments = ecl.get_face_segments(a, b)
    n = len(segments)
    assert n >= 1

    # First and last vertices approximately equal A and B.
    assert _angle(a, _fuv2xyz(segments[0][0], segments[0][1])) <= ERR
    assert _angle(b, _fuv2xyz(segments[-1][0], segments[-1][2])) <= ERR

    norm = ecl.robust_cross_prod(a, b)
    norm = norm / np.linalg.norm(norm)
    a_tangent = np.cross(norm, a)
    b_tangent = np.cross(b, norm)
    for i, (face, sa, sb) in enumerate(segments):
        # Vertices may not protrude outside the biunit square.
        assert abs(sa[0]) <= 1 and abs(sa[1]) <= 1
        assert abs(sb[0]) <= 1 and abs(sb[1]) <= 1
        if i == 0:
            continue
        pface, _, pb = segments[i - 1]
        # Adjacent-face representations correspond to the same point.
        assert pface != face
        assert np.array_equal(_fuv2xyz(pface, pb), _fuv2xyz(face, sa))
        # Interior vertices lie in the AB plane, within the AB wedge.
        p = _fuv2xyz(face, sa)
        p = p / np.linalg.norm(p)
        assert abs(float(p @ norm)) <= ERR
        assert float(p @ a_tangent) >= -ERR
        assert float(p @ b_tangent) >= -ERR

    # ClipToPaddedFace: union of per-face angle intervals along the
    # great circle must cover the original edge's interval.
    padding = 0.0 if rng.random() < 0.1 \
        else 1e-10 * math.pow(1e-5, rng.random())
    x_axis, y_axis = a, a_tangent
    expected = S1Interval(0, _angle(a, b))
    max_angles = expected.expanded(ERR)
    actual = None
    for face in range(6):
        res = ecl.clip_to_padded_face(a, b, face, padding)
        if res is None:
            continue
        a_uv, b_uv = res
        a_clip = _fuv2xyz(face, a_uv)
        a_clip = a_clip / np.linalg.norm(a_clip)
        b_clip = _fuv2xyz(face, b_uv)
        b_clip = b_clip / np.linalg.norm(b_clip)
        assert abs(float(a_clip @ norm)) <= ERR
        assert abs(float(b_clip @ norm)) <= ERR
        if _angle(a_clip, a) > ERR:
            assert max(abs(a_uv[0]), abs(a_uv[1])) == pytest.approx(
                1 + padding, abs=1e-12)
        if _angle(b_clip, b) > ERR:
            assert max(abs(b_uv[0]), abs(b_uv[1])) == pytest.approx(
                1 + padding, abs=1e-12)
        a_ang = math.atan2(float(a_clip @ y_axis), float(a_clip @ x_axis))
        b_ang = math.atan2(float(b_clip @ y_axis), float(b_clip @ x_axis))
        face_angles = S1Interval.from_point_pair(a_ang, b_ang)
        assert max_angles.contains_interval(face_angles)
        actual = face_angles if actual is None else actual.union(
            face_angles)
    assert actual is not None
    assert actual.expanded(ERR).contains_interval(expected)


def test_face_clipping_simple_cases():
    rng = np.random.default_rng(0)
    cases = [
        ((1, -0.5, -0.5), (1, 0.5, 0.5)),     # one face
        ((1, 0, 0), (0, 1, 0)),               # crosses one cube edge
        ((0.75, 0, -1), (0.75, 0, 1)),        # two opposite edges
        ((1, 0, 0.75), (0, 1, 0.75)),         # two adjacent edges
        ((1, 0.9, 0.95), (-1, 0.95, 0.9)),    # four faces
    ]
    for a, b in cases:
        check_face_clipping(a, b, rng)
        check_face_clipping(b, a, rng)


def _perturbed_corner_or_midpoint(p, q, rng):
    a = (rng.integers(0, 3) - 1) * p + (rng.integers(0, 3) - 1) * q
    r = rng.normal(size=3)
    r = r / np.linalg.norm(r)
    if rng.random() < 0.1:
        a = a + math.pow(1e-300, rng.random()) * r
    elif rng.random() < 0.5:
        a = a + 4 * np.finfo(np.float64).eps * r
    else:
        a = a + 1e-10 * math.pow(1e-15, rng.random()) * r
    if float(a @ a) < np.finfo(np.float64).tiny:
        return _perturbed_corner_or_midpoint(p, q, rng)
    return a


def test_face_clipping_hard_cases():
    """Edges nearly following the 12 cube edges (reference kIters=1000;
    300 here)."""
    rng = np.random.default_rng(99)
    corners = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    for _ in range(300):
        face = int(rng.integers(0, 6))
        i = int(rng.integers(0, 4))
        j = (i + 1) & 3
        p = _fuv2xyz(face, corners[i])
        q = _fuv2xyz(face, corners[j])
        a = _perturbed_corner_or_midpoint(p, q, rng)
        b = _perturbed_corner_or_midpoint(p, q, rng)
        check_face_clipping(a, b, rng)


def check_point_on_boundary(p, a, clip):
    (x0, x1), (y0, y1) = clip
    assert x0 <= p[0] <= x1 and y0 <= p[1] <= y1
    if not np.array_equal(p, a):
        assert p[0] in (x0, x1) or p[1] in (y0, y1)


def test_edge_clipping_random():
    """clip_edge endpoints stay on the clip boundary, fractions are
    ordered, and intersects_rect agrees (reference testClipEdge)."""
    rng = np.random.default_rng(5)
    kerr = ecl.EDGE_CLIP_ERROR_UV_DIST + ecl.INTERSECTS_RECT_ERROR_UV_DIST
    for _ in range(500):
        a = rng.uniform(-1, 1, 2)
        b = rng.uniform(-1, 1, 2)
        lo = rng.uniform(-1, 1, 2)
        hi = rng.uniform(-1, 1, 2)
        clip = [sorted([lo[0], hi[0]]), sorted([lo[1], hi[1]])]
        res = ecl.clip_edge(a, b, clip)
        if res is None:
            assert not ecl.intersects_rect(a, b, [
                [clip[0][0] + kerr, clip[0][1] - kerr],
                [clip[1][0] + kerr, clip[1][1] - kerr]]) \
                or clip[0][0] + kerr > clip[0][1] - kerr \
                or clip[1][0] + kerr > clip[1][1] - kerr
            continue
        a_c, b_c = res
        check_point_on_boundary(a_c, a, clip)
        check_point_on_boundary(b_c, b, clip)
        if not np.array_equal(a, b):
            d = (b - a) / np.linalg.norm(b - a)
            orth = np.array([-d[1], d[0]])
            # clipped points lie on the line AB
            assert abs(float((a_c - a) @ orth)) <= kerr
            assert abs(float((b_c - a) @ orth)) <= kerr
            # and in order along it
            ta = float((a_c - a) @ d)
            tb = float((b_c - a) @ d)
            assert ta <= tb + kerr


def test_interpolate_double_exact_endpoints():
    assert ecl.interpolate_double(3.0, 3.0, 7.0, -1.0, 5.0) == -1.0
    assert ecl.interpolate_double(7.0, 3.0, 7.0, -1.0, 5.0) == 5.0
    mid = ecl.interpolate_double(5.0, 3.0, 7.0, -1.0, 5.0)
    assert mid == pytest.approx(2.0, abs=1e-12)
