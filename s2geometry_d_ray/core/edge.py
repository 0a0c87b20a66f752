"""Edge distance kernels (src/s2/s2edge_distances.d), vectorized.

Distances are squared chord lengths (S1ChordAngle length2). The interior-
distance test replicates alwaysUpdateMinInteriorDistance
(s2edge_distances.d:404-474): planar-acuteness prefilter, XQ^2 lower
bound, exact wedge test, then XR^2 = XQ^2 + QR^2.
"""

from __future__ import annotations

import numpy as np


def _norm2(v, axis=-1):
    return (v * v).sum(axis=axis)


def edge_distances2(x, a, b):
    """Squared chord distance from each point x[i] to each edge (a[j], b[j]).

    x: (m,3); a, b: (n,3) -> (m, n) float64. Matches updateMinDistance
    semantics (vertex vs interior case)."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    xa2 = _norm2(x[:, None, :] - a[None, :, :])      # (m,n)
    xb2 = _norm2(x[:, None, :] - b[None, :, :])
    ab2 = _norm2(a - b)                               # (n,)
    vertex_d2 = np.minimum(xa2, xb2)
    # Interior case prefilter: max < min + ab^2 (planar acuteness).
    maybe_interior = np.maximum(xa2, xb2) < vertex_d2 + ab2[None, :]
    c = np.cross(a, b)                                # (n,3)
    c2 = _norm2(c)                                    # (n,)
    x_dot_c = x @ c.T                                 # (m,n)
    # Wedge test: a.(c x x) >= 0 or b.(c x x) <= 0 -> vertex case.
    cx = np.cross(c[None, :, :], x[:, None, :])       # (m,n,3)
    a_cx = (a[None, :, :] * cx).sum(axis=2)
    b_cx = (b[None, :, :] * cx).sum(axis=2)
    interior = maybe_interior & (a_cx < 0) & (b_cx > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        qr = 1.0 - np.sqrt(_norm2(cx) / np.where(c2 == 0, 1.0, c2)[None, :])
        int_d2 = (x_dot_c ** 2) / np.where(c2 == 0, 1.0, c2)[None, :] \
            + qr * qr
    return np.where(interior, np.minimum(int_d2, vertex_d2), vertex_d2)


def point_to_loop_distance2(points, loop_vertices):
    """Min squared chord distance from each point to a closed ring."""
    v = np.asarray(loop_vertices, dtype=np.float64)
    nxt = np.roll(v, -1, axis=0)
    return edge_distances2(points, v, nxt).min(axis=1)


def project(x, a, b):
    """Closest point to x on edge AB (s2edge_distances.d:183-208)."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.cross(a, b)
    c2 = _norm2(c)
    if c2 == 0:
        return a.copy()
    p = x - (np.dot(x, c) / c2) * c
    # On-edge test via sign of the two wedge triples.
    if np.dot(np.cross(c, a), p) > 0 and np.dot(np.cross(p, b), c) > 0:
        return p / np.linalg.norm(p)
    return a.copy() if _norm2(x - a) <= _norm2(x - b) else b.copy()


def interpolate(t, a, b):
    """Point at fraction t along the geodesic AB (s2edge_distances.d:226)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if t == 0:
        return a.copy()
    if t == 1:
        return b.copy()
    ab = np.arccos(np.clip(np.dot(a, b), -1, 1))
    return interpolate_at_distance(t * ab, a, b)


def interpolate_at_distance(ax_rad, a, b):
    """Point at angular distance ax from A towards B
    (s2edge_distances.d:235-260)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    # Unit tangent at A towards B.
    n = np.cross(a, b)
    t = np.cross(n, a)
    tn = np.linalg.norm(t)
    if tn == 0:
        return a.copy()
    t = t / tn
    out = np.cos(ax_rad) * a + np.sin(ax_rad) * t
    return out / np.linalg.norm(out)


def chord2_to_radians(d2):
    return 2.0 * np.arcsin(0.5 * np.sqrt(np.clip(d2, 0.0, 4.0)))


def radians_to_chord2(rad):
    s = np.sin(0.5 * np.minimum(np.pi, rad))
    return np.minimum(4.0, 4.0 * s * s)
