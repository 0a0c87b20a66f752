"""Vectorized S2 coordinate transforms (cube-face / st / uv / ij / si-ti).

Semantics follow the reference s2geometry-d module ``src/s2/s2coords.d``:
  - quadratic projection (the compiled default, s2coords.d:402,433-448)
  - STtoIJ clamps lround(LIMIT_IJ*s - 0.5) into [0, LIMIT_IJ-1]
    (s2coords.d:135-138); lround rounds half away from zero, which differs
    from numpy's rint (half-even) — emulated explicitly below.
  - face selection by largest absolute component with z>y>x tie-break
    (s2coords.d:230-246, util/math/vector.d largestAbsComponent).

All functions are vectorized over numpy arrays and also accept scalars.
"""

from __future__ import annotations

import math

import numpy as np

MAX_LEVEL = 30
LIMIT_IJ = 1 << MAX_LEVEL  # valid leaf-cell ij range is [0, LIMIT_IJ-1]
MAX_SI_TI = np.uint64(1) << np.uint64(MAX_LEVEL + 1)

# Hilbert curve orientation masks / tables (s2coords.d:466-512).
SWAP_MASK = 0x01
INVERT_MASK = 0x02

IJ_TO_POS = np.array(
    [[0, 1, 3, 2],
     [0, 3, 1, 2],
     [2, 3, 1, 0],
     [2, 1, 3, 0]], dtype=np.int64)

POS_TO_IJ = np.array(
    [[0, 1, 3, 2],
     [0, 2, 3, 1],
     [3, 2, 0, 1],
     [3, 1, 0, 2]], dtype=np.int64)

POS_TO_ORIENTATION = np.array(
    [SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.int64)


# Per-face (u, v) numerator axis and sign for valid_face_xyz_to_uv
# (s2coords.d:193-206): face k divides by the major axis (k % 3).
_U_AXIS = np.array([1, 0, 0, 2, 2, 1], dtype=np.int64)
_U_SIGN = np.array([1.0, -1.0, -1.0, 1.0, 1.0, -1.0])
_V_AXIS = np.array([2, 2, 1, 1, 0, 0], dtype=np.int64)
_V_SIGN = np.array([1.0, 1.0, -1.0, 1.0, -1.0, -1.0])


def lround(x):
    """C lround: round half away from zero (vs numpy half-even)."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def st_to_uv(s):
    """Quadratic projection, s2coords.d:433-440."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def uv_to_st(u):
    """Inverse quadratic projection, s2coords.d:444-448."""
    u = np.asarray(u, dtype=np.float64)
    # np.sqrt of a negative intermediate never occurs: |u|<=1 in valid range,
    # but clamp for safety against tiny float excursions.
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, pos, neg)


def st_to_ij(s):
    """s2coords.d:135-138 — clamped lround to leaf grid."""
    v = lround(np.float64(LIMIT_IJ) * np.asarray(s, dtype=np.float64) - 0.5)
    return np.clip(v, 0, LIMIT_IJ - 1).astype(np.int64)


def ij_to_st_min(i):
    """Minimum s/t value of leaf cell i (s2coords.d:124-130)."""
    return (1.0 / LIMIT_IJ) * np.asarray(i, dtype=np.float64)


def st_to_si_ti(s):
    """s2coords.d:150-153."""
    return lround(np.asarray(s, dtype=np.float64) * np.float64(MAX_SI_TI)).astype(np.uint64)


def si_ti_to_st(si):
    return (1.0 / np.float64(MAX_SI_TI)) * np.asarray(si, dtype=np.float64)


def get_face(x, y, z):
    """Face containing direction (x,y,z): largest |component|, sign-adjusted.

    Tie-break matches the reference's largestAbsComponent: z beats y beats x.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay,
                    np.where(ax > az, 0, 2),
                    np.where(ay > az, 1, 2))
    comp = np.choose(face, [x, y, z])
    return np.where(comp < 0, face + 3, face).astype(np.int64)


def valid_face_xyz_to_uv(face, x, y, z):
    """(face, xyz) -> (u, v); face must be valid for the point.

    s2coords.d:193-206 six-way switch, vectorized with np.select.
    """
    face = np.asarray(face)
    if face.ndim == 0:
        face = face[None]
        x = np.asarray(x, dtype=np.float64)[None]
        y = np.asarray(y, dtype=np.float64)[None]
        z = np.asarray(z, dtype=np.float64)[None]
        u, v = valid_face_xyz_to_uv(face, x, y, z)
        return u[0], v[0]
    # One reciprocal of the major component + sign/axis table gathers —
    # equivalent to the 6-way switch but ~6x cheaper than np.select.
    p = np.empty((3, len(face)), dtype=np.float64)
    p[0], p[1], p[2] = x, y, z
    n = len(face)
    flat = p.reshape(-1)
    ar = np.arange(n)
    inv = 1.0 / flat[(face % 3) * n + ar]
    u = _U_SIGN[face] * flat[_U_AXIS[face] * n + ar] * inv
    v = _V_SIGN[face] * flat[_V_AXIS[face] * n + ar] * inv
    return u, v


def xyz_to_face_uv(x, y, z):
    """Direction vector -> (face, u, v). s2coords.d:250-255."""
    face = get_face(x, y, z)
    u, v = valid_face_xyz_to_uv(face, x, y, z)
    return face, u, v


def face_uv_to_xyz_scalar(face, u, v):
    """Scalar fast path (plain Python, ~50x cheaper than 1-element numpy)."""
    u = float(u)
    v = float(v)
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def face_uv_to_xyz(face, u, v):
    """(face,u,v) -> direction vector (not unit length). s2coords.d:157-166."""
    if np.ndim(face) == 0 and np.ndim(u) == 0:
        return face_uv_to_xyz_scalar(int(face), u, v)
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    conds = [face == k for k in range(6)]
    x = np.select(conds, [one, -u, -u, -one, v, v])
    y = np.select(conds, [u, one, -v, -v, -one, u])
    z = np.select(conds, [v, v, one, -u, -u, -one])
    return x, y, z


def face_si_ti_to_xyz(face, si, ti):
    """s2coords.d:284-289."""
    u = st_to_uv(si_ti_to_st(si))
    v = st_to_uv(si_ti_to_st(ti))
    return face_uv_to_xyz(face, u, v)


# Per-face (u, v, w) axes and the neighboring face across each axis
# (s2coords.d:515-556 FACE_UVW_AXES / FACE_UVW_FACES).
FACE_UVW_AXES = np.array([
    [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
    [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
    [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
    [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
    [[0, 0, -1], [1, 0, 0], [0, -1, 0]],
    [[0, 1, 0], [1, 0, 0], [0, 0, -1]],
], dtype=np.float64)

FACE_UVW_FACES = np.array([
    [[4, 1], [5, 2], [3, 0]],
    [[0, 3], [5, 2], [4, 1]],
    [[0, 3], [1, 4], [5, 2]],
    [[2, 5], [1, 4], [0, 3]],
    [[2, 5], [3, 0], [1, 4]],
    [[4, 1], [3, 0], [2, 5]],
])


def get_uvw_axis(face, axis):
    """Unit u-, v- or w-axis of a face (s2coords.d:330-337)."""
    return FACE_UVW_AXES[face][axis].copy()


def get_u_axis(face):
    return get_uvw_axis(face, 0)


def get_v_axis(face):
    return get_uvw_axis(face, 1)


def get_norm(face):
    return get_uvw_axis(face, 2)


def get_uvw_face(face, axis, direction):
    """Neighboring face in the given direction of the given axis
    (s2coords.d:343-350)."""
    return int(FACE_UVW_FACES[face][axis][direction])


def get_u_norm(face, u):
    """Right-handed normal for an edge along +v at the given u
    (s2coords.d:294-303)."""
    return np.array([
        (u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
        (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u)][face])


def get_v_norm(face, v):
    """Right-handed normal for an edge along +u at the given v
    (s2coords.d:309-318)."""
    return np.array([
        (-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
        (v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v)][face])


def xyz_to_face_si_ti(p):
    """(level, face, si, ti): level == -1 unless p is EXACTLY a cell
    center (s2coords.d:257-280)."""
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    face, u, v = xyz_to_face_uv(x, y, z)
    si = int(st_to_si_ti(uv_to_st(u)))
    ti = int(st_to_si_ti(uv_to_st(v)))
    max_si_ti = int(MAX_SI_TI)

    def bsf(n):
        return (n & -n).bit_length() - 1

    level = MAX_LEVEL - bsf(si | max_si_ti)
    if level < 0 or level != MAX_LEVEL - bsf(ti | max_si_ti):
        return -1, face, si, ti
    cx, cy, cz = (float(a) for a in face_si_ti_to_xyz(face, si, ti))
    n = math.sqrt(cx * cx + cy * cy + cz * cz)
    if (x, y, z) == (cx / n, cy / n, cz / n):
        return level, face, si, ti
    return -1, face, si, ti


def latlng_to_xyz(lat_deg, lon_deg):
    """Degrees lat/lng -> unit direction vector (s2latlng.d:156-162)."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    clat = np.cos(lat)
    return clat * np.cos(lon), clat * np.sin(lon), np.sin(lat)


def xyz_to_latlng(x, y, z):
    """Unit direction vector -> degrees lat/lng (s2latlng.d:88-99)."""
    lat = np.arctan2(z, np.sqrt(x * x + y * y))
    lon = np.arctan2(y, x)
    return np.rad2deg(lat), np.rad2deg(lon)


def normalize_xyz(x, y, z):
    n = np.sqrt(x * x + y * y + z * z)
    n = np.where(n == 0, 1.0, n)
    return x / n, y / n, z / n


# ---------------------------------------------------------------------------
# Point utilities (s2pointutil.d:36-199): orthonormal frames and rotation.
# ---------------------------------------------------------------------------

def get_frame(z_axis):
    """Right-handed orthonormal frame with the given z axis
    (s2pointutil.d getFrame): columns (x, y, z) with y = ortho(z) and
    x = y x z, matching the reference's deterministic construction."""
    from .predicates import ortho
    z = np.asarray(z_axis, dtype=np.float64)
    z = z / np.linalg.norm(z)
    y = np.asarray(ortho(tuple(z)), dtype=np.float64)
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=1)


def to_frame(frame, p):
    """World -> frame coordinates (s2pointutil.d toFrame)."""
    return np.asarray(frame, dtype=np.float64).T \
        @ np.asarray(p, dtype=np.float64)


def from_frame(frame, q):
    """Frame -> world coordinates (s2pointutil.d fromFrame)."""
    return np.asarray(frame, dtype=np.float64) \
        @ np.asarray(q, dtype=np.float64)


def rotate(p, axis, angle_rad):
    """Rotate p around the (unit) axis by angle (Rodrigues,
    s2pointutil.d rotate)."""
    p = np.asarray(p, dtype=np.float64)
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return (p * c + np.cross(a, p) * s + a * float(a @ p) * (1.0 - c))
