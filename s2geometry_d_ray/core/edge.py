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
    # Everything below is written COMPONENTWISE over (m, n) planes: no
    # (m, n, 3) temporaries (1/3 the memory traffic of the broadcast
    # form and no generic np.cross machinery — ~5x on big batches), no
    # BLAS dgemm (which rounds the k=3 reduction shape-dependently, so
    # an index evaluating an edge SUBSET would disagree with the full
    # matrix — and with the sequential x0*c0 + x1*c1 + x2*c2 chain the
    # DuckDB oracles replay — in the last ulp).  Each 3-term reduction
    # is the fixed (t0+t1)+t2 order, identical to the pairwise sum the
    # previous broadcast form produced: results are bit-identical, and
    # shape-independent.
    x0, x1, x2 = (x[:, k][:, None] for k in range(3))   # (m,1)
    a0, a1, a2 = (a[:, k][None, :] for k in range(3))   # (1,n)
    b0, b1, b2 = (b[:, k][None, :] for k in range(3))
    d0, d1, d2_ = x0 - a0, x1 - a1, x2 - a2
    xa2 = (d0 * d0 + d1 * d1) + d2_ * d2_               # (m,n)
    d0, d1, d2_ = x0 - b0, x1 - b1, x2 - b2
    xb2 = (d0 * d0 + d1 * d1) + d2_ * d2_
    e0, e1, e2 = a0 - b0, a1 - b1, a2 - b2
    ab2 = (e0 * e0 + e1 * e1) + e2 * e2                 # (1,n)
    vertex_d2 = np.minimum(xa2, xb2)
    # Interior case prefilter: max < min + ab^2 (planar acuteness).
    maybe_interior = np.maximum(xa2, xb2) < vertex_d2 + ab2
    # Stable cross product (b+a)x(b-a) = 2 a x b, matching robustCrossProd's
    # leading term (s2edge_crossings.d); the 2x scale cancels in every
    # ratio below while avoiding catastrophic cancellation for short edges.
    s0, s1, s2 = b0 + a0, b1 + a1, b2 + a2              # (1,n)
    t0, t1, t2 = b0 - a0, b1 - a1, b2 - a2
    c0 = s1 * t2 - s2 * t1
    c1 = s2 * t0 - s0 * t2
    c2v = s0 * t1 - s1 * t0
    c2 = (c0 * c0 + c1 * c1) + c2v * c2v                # (1,n)
    x_dot_c = (x0 * c0 + x1 * c1) + x2 * c2v            # (m,n)
    # Wedge test: a.(c x x) >= 0 or b.(c x x) <= 0 -> vertex case.
    cx0 = c1 * x2 - c2v * x1                            # (m,n)
    cx1 = c2v * x0 - c0 * x2
    cx2 = c0 * x1 - c1 * x0
    a_cx = (a0 * cx0 + a1 * cx1) + a2 * cx2
    b_cx = (b0 * cx0 + b1 * cx1) + b2 * cx2
    interior = maybe_interior & (a_cx < 0) & (b_cx > 0)
    cx_n2 = (cx0 * cx0 + cx1 * cx1) + cx2 * cx2
    with np.errstate(divide="ignore", invalid="ignore"):
        c2_safe = np.where(c2 == 0, 1.0, c2)
        qr = 1.0 - np.sqrt(cx_n2 / c2_safe)
        int_d2 = (x_dot_c ** 2) / c2_safe + qr * qr
    return np.where(interior, np.minimum(int_d2, vertex_d2), vertex_d2)


def edge_distances2_pairwise(x, a, b):
    """Row-wise variant of edge_distances2: x, a, b are (k, 3) and row i
    is evaluated against row i only -> (k,).  The componentwise
    expressions are IDENTICAL to edge_distances2's (same fixed
    (t0+t1)+t2 reduction order), so each output is bit-identical to the
    corresponding matrix entry — flat gathered (point, edge) pair lists
    can mix freely with matrix evaluations."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    x0, x1, x2 = x[:, 0], x[:, 1], x[:, 2]
    a0, a1, a2 = a[:, 0], a[:, 1], a[:, 2]
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    d0, d1, d2_ = x0 - a0, x1 - a1, x2 - a2
    xa2 = (d0 * d0 + d1 * d1) + d2_ * d2_
    d0, d1, d2_ = x0 - b0, x1 - b1, x2 - b2
    xb2 = (d0 * d0 + d1 * d1) + d2_ * d2_
    e0, e1, e2 = a0 - b0, a1 - b1, a2 - b2
    ab2 = (e0 * e0 + e1 * e1) + e2 * e2
    vertex_d2 = np.minimum(xa2, xb2)
    maybe_interior = np.maximum(xa2, xb2) < vertex_d2 + ab2
    s0, s1, s2 = b0 + a0, b1 + a1, b2 + a2
    t0, t1, t2 = b0 - a0, b1 - a1, b2 - a2
    c0 = s1 * t2 - s2 * t1
    c1 = s2 * t0 - s0 * t2
    c2v = s0 * t1 - s1 * t0
    c2 = (c0 * c0 + c1 * c1) + c2v * c2v
    x_dot_c = (x0 * c0 + x1 * c1) + x2 * c2v
    cx0 = c1 * x2 - c2v * x1
    cx1 = c2v * x0 - c0 * x2
    cx2 = c0 * x1 - c1 * x0
    a_cx = (a0 * cx0 + a1 * cx1) + a2 * cx2
    b_cx = (b0 * cx0 + b1 * cx1) + b2 * cx2
    interior = maybe_interior & (a_cx < 0) & (b_cx > 0)
    cx_n2 = (cx0 * cx0 + cx1 * cx1) + cx2 * cx2
    with np.errstate(divide="ignore", invalid="ignore"):
        c2_safe = np.where(c2 == 0, 1.0, c2)
        qr = 1.0 - np.sqrt(cx_n2 / c2_safe)
        int_d2 = (x_dot_c ** 2) / c2_safe + qr * qr
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


def max_distance2(x, a, b):
    """Max chord^2 distance from x to edge ab (s2edge_distances.d:106-118):
    max over endpoints, unless beyond a right angle — then the interior
    of the REFLECTED edge is closest to -x and max = straight - min."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d2 = max(float(((x - a) ** 2).sum()), float(((x - b) ** 2).sum()))
    if d2 > 2.0:  # beyond 90 degrees
        m2 = float(edge_distances2((-x)[None, :], a[None, :],
                                   b[None, :])[0, 0])
        d2 = 4.0 - m2
    return d2


def edge_pair_min_distance2(a0, a1, b0, b1):
    """Min chord^2 distance between edges (s2edge_distances.d:265-284):
    0 on crossing, else an endpoint of one edge achieves it."""
    from .predicates import crossing_sign
    if crossing_sign(tuple(a0), tuple(a1), tuple(b0), tuple(b1)) > 0:
        return 0.0
    A = np.stack([a0, a1]).astype(np.float64)
    B = np.stack([b0, b1]).astype(np.float64)
    d_ab = edge_distances2(A, np.asarray(b0)[None, :],
                           np.asarray(b1)[None, :]).min()
    d_ba = edge_distances2(B, np.asarray(a0)[None, :],
                           np.asarray(a1)[None, :]).min()
    return float(min(d_ab, d_ba))


def edge_pair_max_distance2(a0, a1, b0, b1):
    """Max chord^2 distance between edges: 4 (pi) if one edge crosses
    the other's antipodal reflection, else attained at an endpoint
    (s2edge_distances.d UpdateEdgePairMaxDistance semantics)."""
    from .predicates import crossing_sign
    nb0 = -np.asarray(b0, dtype=np.float64)
    nb1 = -np.asarray(b1, dtype=np.float64)
    if crossing_sign(tuple(a0), tuple(a1), tuple(nb0), tuple(nb1)) > 0:
        return 4.0
    return max(max_distance2(a0, b0, b1), max_distance2(a1, b0, b1),
               max_distance2(b0, a0, a1), max_distance2(b1, a0, a1))


def is_edge_b_near_edge_a(a0, a1, b0, b1, tolerance_rad):
    """True iff every point of edge B is within tolerance of edge A
    (s2edge_distances.d:304-384, full port: endpoint projections, the
    plane angle shortcut, the antiparallel special case, and the
    furthest-point-on-circ(B) wedge test)."""
    import math

    from .edge_clipping import robust_cross_prod
    from .predicates import sign
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    a_ortho = np.asarray(robust_cross_prod(a0, a1), dtype=np.float64)
    a_ortho = a_ortho / np.linalg.norm(a_ortho)
    near_b0 = project(b0, a0, a1)
    near_b1 = project(b1, a0, a1)
    if sign(tuple(a_ortho), tuple(near_b0), tuple(near_b1)) < 0:
        a_ortho = -a_ortho

    def angle(p, q):
        return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                          float(p @ q))

    if angle(b0, near_b0) > tolerance_rad \
            or angle(b1, near_b1) > tolerance_rad:
        return False
    b_ortho = np.asarray(robust_cross_prod(b0, b1), dtype=np.float64)
    b_ortho = b_ortho / np.linalg.norm(b_ortho)
    planar_angle = angle(a_ortho, b_ortho)
    if planar_angle <= tolerance_rad:
        return True
    if planar_angle >= math.pi - 0.01:
        return ((angle(b0, a0) < angle(b0, a1))
                == (angle(b1, a0) < angle(b1, a1)))
    furthest = a_ortho - float(a_ortho @ b_ortho) * b_ortho
    furthest = furthest / np.linalg.norm(furthest)
    finv = -furthest
    def on_b(p):
        return (sign(tuple(b_ortho), tuple(b0), tuple(p)) > 0
                and sign(tuple(p), tuple(b1), tuple(b_ortho)) > 0)
    return not (on_b(furthest) or on_b(finv))
