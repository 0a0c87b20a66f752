"""Edge clipping to cube faces and (u,v) rectangles — reimplements
``src/s2/s2edge_clipping.d``:

  get_face_segments(a, b)            (:68-120)  edge -> per-face (u,v)
                                                 segments, continuous
  clip_to_padded_face(a, b, f, pad)  (:199-245) clip to [-R,R]^2, R=1+pad
  clip_to_face(a, b, f)              (:193-195)
  intersects_rect(a, b, rect)        (:270-286)
  clip_edge(a, b, clip)              (:309-321)
  clip_edge_bound(a, b, clip, bound) (:344-375) exact-monotone interval
                                                 clipping
  interpolate_double                 (:399-410)

plus robust_cross_prod (s2pointutil.d robustCrossProd with an exact
Fraction fallback).  (u,v) rects are [[u_lo,u_hi],[v_lo,v_hi]] lists;
points are 2-element numpy arrays.

These are the geometric prerequisites of the reference's S2PaddedCell
index build; this repo's shape index uses endpoint-neighborhood buckets
instead (core/shapeindex.py), so here the clipping API stands alone with
its reference conformance tests."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

DBL_EPS = float(np.finfo(np.float64).eps)
FACE_CLIP_ERROR_RADIANS = 3.0 * DBL_EPS
FACE_CLIP_ERROR_UV_DIST = 9.0 * DBL_EPS
FACE_CLIP_ERROR_UV_COORD = 9.0 * math.sqrt(0.5) * DBL_EPS
INTERSECTS_RECT_ERROR_UV_DIST = 3 * math.sqrt(2.0) * DBL_EPS
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPS
EDGE_CLIP_ERROR_UV_DIST = 2.25 * DBL_EPS

# FACE_UVW_FACES[face][axis][direction] (s2coords.d:548-560)
_FACE_UVW_FACES = [
    [[4, 1], [5, 2], [3, 0]],
    [[0, 3], [5, 2], [4, 1]],
    [[0, 3], [1, 4], [5, 2]],
    [[2, 5], [1, 4], [0, 3]],
    [[2, 5], [3, 0], [1, 4]],
    [[4, 1], [3, 0], [2, 5]],
]


def get_uvw_face(face, axis, direction):
    """Adjacent face along the given (u=0, v=1, w=2) axis
    (s2coords.d:341-351)."""
    return _FACE_UVW_FACES[face][axis][direction]


def face_xyz_to_uvw(face, p):
    """Express p in the (u,v,w) axes of the face (s2coords.d:213-224)."""
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    if face == 0:
        return np.array([y, z, x])
    if face == 1:
        return np.array([-x, z, y])
    if face == 2:
        return np.array([-x, -y, z])
    if face == 3:
        return np.array([-z, -y, -x])
    if face == 4:
        return np.array([-z, x, -y])
    return np.array([y, x, -z])


def robust_cross_prod(a, b):
    """Nonzero vector orthogonal to both a and b, well-defined even for
    nearly (anti)parallel inputs (s2pointutil.d robustCrossProd):
    (b+a) x (b-a) is stable; exact Fraction cross as fallback; ortho(a)
    for identical points."""
    from .predicates import ortho
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x = np.cross(b + a, b - a)
    if x.any():
        return x
    af = tuple(Fraction(float(v)) for v in a)
    bf = tuple(Fraction(float(v)) for v in b)
    xf = (af[1] * bf[2] - af[2] * bf[1],
          af[2] * bf[0] - af[0] * bf[2],
          af[0] * bf[1] - af[1] * bf[0])
    if any(v != 0 for v in xf):
        m = max(abs(v) for v in xf)
        return np.array([float(v / m) for v in xf])
    return np.array(ortho(tuple(a)))


def _sum_equals(u, v, w):
    """u + v == w exactly (s2edge_clipping.d:539-541)."""
    return (u + v == w) and (u == w - v) and (v == w - u)


def _intersects_face(n):
    """|Nu| + |Nv| >= |Nw| evaluated exactly (:545-557)."""
    u, v, w = abs(float(n[0])), abs(float(n[1])), abs(float(n[2]))
    return (v >= w - u) and (u >= w - v)


def _intersects_opposite_edges(n):
    """||Nu| - |Nv|| >= |Nw| evaluated exactly (:562-573)."""
    u, v, w = abs(float(n[0])), abs(float(n[1])), abs(float(n[2]))
    if abs(u - v) != w:
        return abs(u - v) >= w
    return (u - w >= v) if u >= v else (v - w >= u)


def _get_exit_axis(n):
    """0 if the line exits through u=+-1, 1 for v=+-1 (:460-477)."""
    if _intersects_opposite_edges(n):
        return 1 if abs(float(n[0])) >= abs(float(n[1])) else 0
    neg = (math.copysign(1, n[0]) < 0) ^ (math.copysign(1, n[1]) < 0) \
        ^ (math.copysign(1, n[2]) < 0)
    return 0 if neg else 1


def _get_exit_point(n, axis):
    """(u,v) where the line exits the face (:482-490)."""
    if axis == 0:
        u = 1.0 if n[1] > 0 else -1.0
        return np.array([u, (-u * n[0] - n[2]) / n[1]])
    v = 1.0 if n[0] < 0 else -1.0
    return np.array([(-v * n[1] - n[2]) / n[0], v])


def _get_next_face(face, exit_uv, axis, n, target_face):
    """:497-515."""
    if (abs(float(exit_uv[1 - axis])) == 1
            and get_uvw_face(face, 1 - axis,
                             int(exit_uv[1 - axis] > 0)) == target_face
            and _sum_equals(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])):
        return target_face
    return get_uvw_face(face, axis, int(exit_uv[axis] > 0))


def _xyz_to_face_uv(p):
    from . import coords
    f = int(coords.get_face(float(p[0]), float(p[1]), float(p[2])))
    u, v = coords.valid_face_xyz_to_uv(f, float(p[0]), float(p[1]), float(p[2]))
    return f, np.array([u, v])


def _move_origin_to_valid_face(face, a, ab, a_uv):
    """:423-453."""
    from . import coords
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(float(a_uv[0])), abs(float(a_uv[1]))) <= max_safe:
        return face, a_uv
    n = face_xyz_to_uvw(face, ab)
    if _intersects_face(n):
        exit_xyz = np.array(coords.face_uv_to_xyz_scalar(
            face, *_get_exit_point(n, _get_exit_axis(n))))
        abn = np.asarray(ab) / np.linalg.norm(ab)
        a_tangent = np.cross(abn, a)
        if float((exit_xyz - a) @ a_tangent) >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv
    if abs(float(a_uv[0])) >= abs(float(a_uv[1])):
        face = get_uvw_face(face, 0, int(a_uv[0] > 0))
    else:
        face = get_uvw_face(face, 1, int(a_uv[1] > 0))
    u, v = coords.valid_face_xyz_to_uv(face, float(a[0]), float(a[1]), float(a[2]))
    return face, np.array([np.clip(u, -1.0, 1.0), np.clip(v, -1.0, 1.0)])


def get_face_segments(a, b):
    """Subdivide edge AB at cube-face boundaries: list of
    (face, a_uv, b_uv), continuous from A to B (:68-120)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a_face, a_uv = _xyz_to_face_uv(a)
    b_face, b_uv = _xyz_to_face_uv(b)
    if a_face == b_face:
        return [(a_face, a_uv, b_uv)]
    ab = robust_cross_prod(a, b)
    a_face, a_uv = _move_origin_to_valid_face(a_face, a, ab, a_uv)
    b_face, b_uv = _move_origin_to_valid_face(b_face, b, -ab, b_uv)
    from . import coords
    segments = []
    face = a_face
    seg_a = a_uv
    while face != b_face:
        n = face_xyz_to_uvw(face, ab)
        exit_axis = _get_exit_axis(n)
        seg_b = _get_exit_point(n, exit_axis)
        segments.append((face, seg_a, seg_b))
        exit_xyz = np.array(coords.face_uv_to_xyz_scalar(face, seg_b[0],
                                                         seg_b[1]))
        face = _get_next_face(face, seg_b, exit_axis, n, b_face)
        exit_uvw = face_xyz_to_uvw(face, exit_xyz)
        seg_a = np.array([exit_uvw[0], exit_uvw[1]])
    segments.append((face, seg_a, b_uv))
    return segments


def _clip_destination(a, b, scaled_n, a_tangent, b_tangent, scale_uv):
    """(score, uv) for one endpoint (:133-185)."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if b[2] > 0:
        uv = np.array([b[0] / b[2], b[1] / b[2]])
        if max(abs(uv[0]), abs(uv[1])) <= max_safe:
            return 0, uv
    uv = scale_uv * _get_exit_point(scaled_n, _get_exit_axis(scaled_n))
    p = np.array([uv[0], uv[1], 1.0])
    score = 0
    if float((p - a) @ a_tangent) < 0:
        score = 2  # B' on wrong side of A
    elif float((p - b) @ b_tangent) < 0:
        score = 1  # B' on wrong side of B
    if score > 0:
        if b[2] <= 0:
            score = 3
        else:
            uv = np.array([b[0] / b[2], b[1] / b[2]])
    return score, uv


def clip_to_padded_face(a_xyz, b_xyz, face, padding=0.0):
    """Clip AB to [-R,R]x[-R,R] on the face, R = 1 + padding.  Returns
    (a_uv, b_uv) or None if AB misses the face (:199-245)."""
    from . import coords
    a_xyz = np.asarray(a_xyz, dtype=np.float64)
    b_xyz = np.asarray(b_xyz, dtype=np.float64)
    fa = int(coords.get_face(*(float(v) for v in a_xyz)))
    fb = int(coords.get_face(*(float(v) for v in b_xyz)))
    if fa == face and fb == face:
        au, av = coords.valid_face_xyz_to_uv(face, *(float(v) for v in a_xyz))
        bu, bv = coords.valid_face_xyz_to_uv(face, *(float(v) for v in b_xyz))
        return np.array([au, av]), np.array([bu, bv])
    n = face_xyz_to_uvw(face, robust_cross_prod(a_xyz, b_xyz))
    a = face_xyz_to_uvw(face, a_xyz)
    b = face_xyz_to_uvw(face, b_xyz)
    scale_uv = 1 + padding
    scaled_n = np.array([scale_uv * n[0], scale_uv * n[1], n[2]])
    if not _intersects_face(scaled_n):
        return None
    if max(abs(n[0]), abs(n[1]), abs(n[2])) < math.ldexp(1.0, -511):
        n = n * math.ldexp(1.0, 563)
    n = n / np.linalg.norm(n)
    a_tangent = np.cross(n, a)
    b_tangent = np.cross(b, n)
    a_score, a_uv = _clip_destination(b, a, -scaled_n, b_tangent,
                                      a_tangent, scale_uv)
    b_score, b_uv = _clip_destination(a, b, scaled_n, a_tangent,
                                      b_tangent, scale_uv)
    if a_score + b_score >= 3:
        return None
    return a_uv, b_uv


def clip_to_face(a, b, face):
    """:193-195."""
    return clip_to_padded_face(a, b, face, 0.0)


def intersects_rect(a, b, rect):
    """Does 2D segment AB intersect the closed rect
    [[x_lo,x_hi],[y_lo,y_hi]]? (:270-286)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    (rx0, rx1), (ry0, ry1) = rect
    bx0, bx1 = min(a[0], b[0]), max(a[0], b[0])
    by0, by1 = min(a[1], b[1]), max(a[1], b[1])
    if bx0 > rx1 or bx1 < rx0 or by0 > ry1 or by1 < ry0:
        return False
    d = b - a
    n = np.array([-d[1], d[0]])
    i = 1 if n[0] >= 0 else 0
    j = 1 if n[1] >= 0 else 0

    def vert(ii, jj):
        return np.array([rx1 if ii else rx0, ry1 if jj else ry0])
    mx = float(n @ (vert(i, j) - a))
    mn = float(n @ (vert(1 - i, 1 - j) - a))
    return mx >= 0 and mn <= 0


def interpolate_double(x, a, b, a1, b1):
    """Transfer the linear combination x of (a,b) onto (a1,b1), exact at
    the endpoints (:399-410)."""
    assert a != b
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * (x - a) / (b - a)
    return b1 + (a1 - b1) * (x - b) / (a - b)


def _update_endpoint(bound, end, value):
    """:288-297 (bound is a 2-list interval, mutated)."""
    if end == 0:
        if bound[1] < value:
            return False
        if bound[0] < value:
            bound[0] = value
    else:
        if bound[0] > value:
            return False
        if bound[1] > value:
            bound[1] = value
    return True


def _clip_bound_axis(a0, b0, bound0, a1, b1, bound1, diag, clip0):
    """:359-375."""
    if bound0[0] < clip0[0]:
        if bound0[1] < clip0[0]:
            return False
        bound0[0] = clip0[0]
        if not _update_endpoint(bound1, diag,
                                interpolate_double(clip0[0], a0, b0,
                                                   a1, b1)):
            return False
    if bound0[1] > clip0[1]:
        if bound0[0] > clip0[1]:
            return False
        bound0[1] = clip0[1]
        if not _update_endpoint(bound1, 1 - diag,
                                interpolate_double(clip0[1], a0, b0,
                                                   a1, b1)):
            return False
    return True


def clip_edge_bound(a, b, clip, bound):
    """Tighten `bound` (2x2 nested lists, mutated) to AB ∩ clip; False
    if empty (:344-352)."""
    diag = int((a[0] > b[0]) != (a[1] > b[1]))
    return (_clip_bound_axis(a[0], b[0], bound[0], a[1], b[1], bound[1],
                             diag, clip[0])
            and _clip_bound_axis(a[1], b[1], bound[1], a[0], b[0],
                                 bound[0], diag, clip[1]))


def get_clipped_edge_bound(a, b, clip):
    """Bounding rect of AB ∩ clip, or None (:326-330)."""
    bound = [[min(a[0], b[0]), max(a[0], b[0])],
             [min(a[1], b[1]), max(a[1], b[1])]]
    if clip_edge_bound(a, b, clip, bound):
        return bound
    return None


def clip_edge(a, b, clip):
    """Clipped endpoints of AB ∩ clip, or None (:309-321)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    bound = get_clipped_edge_bound(a, b, clip)
    if bound is None:
        return None
    ai = int(a[0] > b[0])
    aj = int(a[1] > b[1])

    def vert(bd, ii, jj):
        return np.array([bd[0][ii], bd[1][jj]])
    return vert(bound, ai, aj), vert(bound, 1 - ai, 1 - aj)
