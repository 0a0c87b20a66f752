"""Port of test/s2/s2coords_test.d: Hilbert traversal-order table
identities, ST/UV inverses, face frame right-handedness and curve
continuity, XYZtoFaceSiTi cell-center detection, and the UV norm / UVW
axis / UVW face tables."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.coords import (FACE_UVW_AXES, IJ_TO_POS,
                                          INVERT_MASK, POS_TO_IJ,
                                          SWAP_MASK, get_face, get_norm,
                                          get_u_axis, get_u_norm,
                                          get_uvw_axis, get_uvw_face,
                                          get_v_axis, get_v_norm,
                                          st_to_uv, uv_to_st,
                                          xyz_to_face_si_ti)
from s2geometry_d_ray.core.edge_clipping import face_xyz_to_uvw

MAX_LEVEL = 30


def _swap_axes(ij):
    return ((ij >> 1) & 1) + ((ij & 1) << 1)


def _invert_bits(ij):
    return ij ^ 3


def _face_uv_to_xyz(face, u, v):
    x, y, z = coords.face_uv_to_xyz_scalar(face, u, v)
    return np.array([float(x), float(y), float(z)])


def test_traversal_order():
    for r in range(4):
        for i in range(4):
            assert IJ_TO_POS[r][i] == IJ_TO_POS[r ^ SWAP_MASK][_swap_axes(i)]
            assert POS_TO_IJ[r][i] == _swap_axes(
                POS_TO_IJ[r ^ SWAP_MASK][i])
            assert IJ_TO_POS[r][i] == \
                IJ_TO_POS[r ^ INVERT_MASK][_invert_bits(i)]
            assert POS_TO_IJ[r][i] == _invert_bits(
                POS_TO_IJ[r ^ INVERT_MASK][i])
            assert IJ_TO_POS[r][POS_TO_IJ[r][i]] == i
            assert POS_TO_IJ[r][IJ_TO_POS[r][i]] == i


def test_st_uv_conversions():
    for s in (0.0, 0.5, 1.0):
        assert float(st_to_uv(s)) == 2 * s - 1
    for u in (-1.0, 0.0, 1.0):
        assert float(uv_to_st(u)) == 0.5 * (u + 1)
    xs = np.arange(0, 1.0001, 0.0001)
    assert np.allclose(uv_to_st(st_to_uv(xs)), xs, atol=1e-15)
    assert np.allclose(st_to_uv(uv_to_st(2 * xs - 1)), 2 * xs - 1,
                       atol=1e-15)


def test_face_uv_to_xyz():
    total = np.zeros(3)
    for face in range(6):
        center = _face_uv_to_xyz(face, 0, 0)
        assert np.array_equal(get_norm(face), center)
        assert abs(center[np.argmax(np.abs(center))]) == 1
        total += np.abs(center)
    assert np.array_equal(total, [2, 2, 2])

    for face in range(6):
        assert float(np.dot(np.cross(get_u_axis(face), get_v_axis(face)),
                            _face_uv_to_xyz(face, 0, 0))) == 1

    # Hilbert curve continuity across faces.
    for face in range(6):
        sign = -1.0 if (face & SWAP_MASK) else 1.0
        assert np.array_equal(_face_uv_to_xyz(face, sign, -sign),
                              _face_uv_to_xyz((face + 1) % 6, -1, -1))


def test_face_xyz_to_uvw():
    for face in range(6):
        assert np.array_equal(face_xyz_to_uvw(face, np.zeros(3)),
                              np.zeros(3))
        assert np.array_equal(face_xyz_to_uvw(face, get_u_axis(face)),
                              [1, 0, 0])
        assert np.array_equal(face_xyz_to_uvw(face, -get_u_axis(face)),
                              [-1, 0, 0])
        assert np.array_equal(face_xyz_to_uvw(face, get_v_axis(face)),
                              [0, 1, 0])
        assert np.array_equal(face_xyz_to_uvw(face, -get_v_axis(face)),
                              [0, -1, 0])
        assert np.array_equal(face_xyz_to_uvw(face, get_norm(face)),
                              [0, 0, 1])
        assert np.array_equal(face_xyz_to_uvw(face, -get_norm(face)),
                              [0, 0, -1])


def test_xyz_to_face_si_ti():
    rng = np.random.default_rng(53)
    for level in range(0, MAX_LEVEL + 1, 3):
        for _ in range(40):
            p = rng.normal(size=3)
            p /= np.linalg.norm(p)
            leaf = int(ci.cellid_from_xyz(np.array([p[0]]),
                                          np.array([p[1]]),
                                          np.array([p[2]]))[0])
            cid = ci.parent_scalar(leaf, level)
            center = ci.to_xyz(np.array([cid], dtype=np.uint64))
            cp = (float(center[0][0]), float(center[1][0]),
                  float(center[2][0]))
            actual_level, face, si, ti = xyz_to_face_si_ti(cp)
            assert actual_level == level
            leaf2 = int(ci.from_face_ij_scalar(face, si // 2, ti // 2)) \
                & ((1 << 64) - 1)
            actual_id = ci.parent_scalar(leaf2, level)
            assert actual_id == cid

            # A point near but not equal to the center: level == -1 but
            # the same (face, si, ti).
            moved = np.asarray(cp) + 1e-13
            moved_level, f2, si2, ti2 = xyz_to_face_si_ti(tuple(moved))
            assert moved_level == -1
            assert (f2, si2, ti2) == (face, si, ti)


def test_uv_norms():
    for face in range(6):
        for x in np.arange(-1, 1.0001, 1 / 32.0):
            un = np.cross(_face_uv_to_xyz(face, x, -1),
                          _face_uv_to_xyz(face, x, 1))
            ang = math.atan2(
                float(np.linalg.norm(np.cross(un, get_u_norm(face, x)))),
                float(np.dot(un, get_u_norm(face, x))))
            assert ang == pytest.approx(0, abs=1e-4)
            vn = np.cross(_face_uv_to_xyz(face, -1, x),
                          _face_uv_to_xyz(face, 1, x))
            ang = math.atan2(
                float(np.linalg.norm(np.cross(vn, get_v_norm(face, x)))),
                float(np.dot(vn, get_v_norm(face, x))))
            assert ang == pytest.approx(0, abs=1e-4)


def test_uvw_axis():
    for face in range(6):
        assert np.array_equal(
            _face_uv_to_xyz(face, 1, 0) - _face_uv_to_xyz(face, 0, 0),
            get_u_axis(face))
        assert np.array_equal(
            _face_uv_to_xyz(face, 0, 1) - _face_uv_to_xyz(face, 0, 0),
            get_v_axis(face))
        assert np.array_equal(_face_uv_to_xyz(face, 0, 0), get_norm(face))
        assert float(np.dot(np.cross(get_u_axis(face), get_v_axis(face)),
                            get_norm(face))) == 1
        assert np.array_equal(get_u_axis(face), get_uvw_axis(face, 0))
        assert np.array_equal(get_v_axis(face), get_uvw_axis(face, 1))
        assert np.array_equal(get_norm(face), get_uvw_axis(face, 2))


def test_uvw_face():
    for face in range(6):
        for axis in range(3):
            neg = -get_uvw_axis(face, axis)
            pos = get_uvw_axis(face, axis)
            assert int(get_face(neg[0], neg[1], neg[2])) == \
                get_uvw_face(face, axis, 0)
            assert int(get_face(pos[0], pos[1], pos[2])) == \
                get_uvw_face(face, axis, 1)
