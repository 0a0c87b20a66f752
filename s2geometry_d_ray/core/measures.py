"""Spherical measures: triangle angle/area, loop area and centroid.

Reimplements src/s2/s2measures.d:37-161 (angle, turnAngle, girardArea,
area via the l'Huilier-stable formula) and the loop aggregates of
s2loop.d:428-540 (area via signed triangle sum from vertex 0, normalized
to [0, 4pi]) / s2centroids.d:60-69 (trueCentroid)."""

from __future__ import annotations

import math

import numpy as np


def angle(a, b, c):
    """Interior angle ABC at vertex b (s2measures.d:37-47)."""
    ab = np.cross(a, b)
    cb = np.cross(c, b)
    num = np.linalg.norm(np.cross(ab, cb))
    den = np.dot(ab, cb)
    return math.atan2(num, den)


def turn_angle(a, b, c):
    """Exterior (turning) angle at b (s2measures.d:56-70)."""
    from .predicates import sign
    ang = angle(a, b, c)
    turn = math.pi - ang
    return turn if sign(tuple(a), tuple(b), tuple(c)) > 0 else -turn


def girard_area(a, b, c):
    """Triangle area by Girard's formula (s2measures.d:147-157).
    robustCrossProd is required for accuracy when two input points are
    very close together (the reference's 1e-15-perturbation sweep)."""
    from .edge_clipping import robust_cross_prod
    ab = robust_cross_prod(np.asarray(a, dtype=np.float64),
                           np.asarray(b, dtype=np.float64))
    bc = robust_cross_prod(np.asarray(b, dtype=np.float64),
                           np.asarray(c, dtype=np.float64))
    ac = robust_cross_prod(np.asarray(a, dtype=np.float64),
                           np.asarray(c, dtype=np.float64))
    if np.linalg.norm(ab) == 0 or np.linalg.norm(bc) == 0 or \
            np.linalg.norm(ac) == 0:
        return 0.0

    def ang(u, v):
        return math.atan2(np.linalg.norm(np.cross(u, v)), np.dot(u, v))

    return max(0.0, ang(ab, ac) - ang(ab, bc) + ang(bc, ac))


def triangle_area(a, b, c):
    """Stable triangle area (l'Huilier, s2measures.d:74-105)."""
    sa = math.atan2(np.linalg.norm(np.cross(b, c)), np.dot(b, c))
    sb = math.atan2(np.linalg.norm(np.cross(c, a)), np.dot(c, a))
    sc = math.atan2(np.linalg.norm(np.cross(a, b)), np.dot(a, b))
    s = 0.5 * (sa + sb + sc)
    if s >= 3e-4:
        s2 = s * s
        dmin = s - max(sa, max(sb, sc))
        if dmin < 1e-2 * s * s2 * s2:
            area = girard_area(a, b, c)
            if dmin < s * (0.1 * area):
                return area
    t = math.tan(0.5 * s) * math.tan(0.5 * (s - sa)) * \
        math.tan(0.5 * (s - sb)) * math.tan(0.5 * (s - sc))
    return 4.0 * math.atan(math.sqrt(max(0.0, t)))


def signed_triangle_area(a, b, c):
    from .predicates import sign
    return sign(tuple(a), tuple(b), tuple(c)) * triangle_area(a, b, c)


# Edges longer than this are numerically unstable inside the triangle fan
# (s2loop.d:891: S1ChordAngle.fromRadians(PI - 1e-5)); compared as squared
# chord lengths.
_MAX_STABLE_CHORD2 = (2.0 * math.sin(0.5 * (math.pi - 1e-5))) ** 2


def get_surface_integral(vertices, f_tri, zero=0.0):
    """Oriented surface integral over the loop interior (s2loop.d:859-945).

    Sums ``f_tri`` over a fan of oriented triangles from a moving origin:
    whenever the leading fan edge would approach 180 degrees (numerically
    unstable), the origin is relocated (to robustCrossProd(v0, vi) or back
    to v0) and compensating triangles are added so the total signed
    coverage of every point is unchanged."""
    from .edge_clipping import robust_cross_prod
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    total = zero

    def chord2(x, y):
        d = x - y
        return float(d @ d)

    origin = v[0]
    origin_is_v0 = True
    for i in range(1, n - 1):
        if chord2(v[i + 1], origin) > _MAX_STABLE_CHORD2:
            # About to create an unstable edge: move the fan origin.
            old_origin = origin
            if origin_is_v0:
                # robustCrossProd(v0, vi) is well-separated from v0, vi,
                # and vi+1.
                x = np.asarray(robust_cross_prod(v[0], v[i]), dtype=np.float64)
                origin = x / np.linalg.norm(x)
                origin_is_v0 = False
            elif chord2(v[i], v[0]) < _MAX_STABLE_CHORD2:
                # All edges of (origin, v0, vi) are stable: revert to v0.
                origin = v[0]
                origin_is_v0 = True
            else:
                # (origin, vi+1) and (v0, vi) are antipodal pairs; v0 x origin
                # is approximately perpendicular to all four points.
                origin = np.cross(v[0], old_origin)
                origin_is_v0 = False
                total = total + f_tri(v[0], old_origin, origin)
            total = total + f_tri(old_origin, v[i], origin)
        total = total + f_tri(origin, v[i], v[i + 1])
    if not origin_is_v0:
        total = total + f_tri(origin, v[n - 1], v[0])
    return total


def loop_signed_area(vertices):
    """Oriented integral of signed triangle areas (s2loop.d:497
    getSurfaceIntegral(signedArea)); positive = CCW interior."""
    if len(vertices) < 3:
        return 0.0
    return get_surface_integral(vertices, signed_triangle_area, 0.0)


def loop_area(vertices):
    """Area of the CCW interior, in [0, 4pi] (s2loop.d:428-540)."""
    area = loop_signed_area(vertices)
    if area < 0:
        area += 4.0 * math.pi
    return min(max(area, 0.0), 4.0 * math.pi)


def polygon_area(loops):
    """Shells add, holes subtract (xor-of-parities area)."""
    total = 0.0
    for lp in loops:
        a = loop_area(lp.vertices)
        total += -a if (lp.depth % 2) else a
    return max(0.0, total)


def true_centroid(a, b, c):
    """Signed 'true' centroid of spherical triangle ABC, scaled by its area
    (s2centroids.d trueCentroid: angle/sin ratios + row-subtracted Cramer
    solve; antisymmetric under orientation reversal)."""
    def _ang(u, v):
        return math.atan2(np.linalg.norm(np.cross(u, v)), float(np.dot(u, v)))

    angle_a = _ang(b, c)
    angle_b = _ang(c, a)
    angle_c = _ang(a, b)
    ra = 1.0 if angle_a == 0.0 else angle_a / math.sin(angle_a)
    rb = 1.0 if angle_b == 0.0 else angle_b / math.sin(angle_b)
    rc = 1.0 if angle_c == 0.0 else angle_c / math.sin(angle_c)
    # Subtract row A from B and C to reduce cancellation for small triangles.
    x = np.array([a[0], b[0] - a[0], c[0] - a[0]])
    y = np.array([a[1], b[1] - a[1], c[1] - a[1]])
    z = np.array([a[2], b[2] - a[2], c[2] - a[2]])
    r = np.array([ra, rb - ra, rc - ra])
    return 0.5 * np.array([float(np.dot(np.cross(y, z), r)),
                           float(np.dot(np.cross(z, x), r)),
                           float(np.dot(np.cross(x, y), r))])


# Backwards-compatible alias (previous formulation required an external
# orientation sign; the reference form is naturally signed).
triangle_true_centroid = true_centroid


def loop_centroid(vertices):
    """True centroid of the loop interior times loop area, not normalized
    (s2loop.d:542-548 getSurfaceIntegral(trueCentroid))."""
    if len(vertices) < 3:
        return np.zeros(3)
    return get_surface_integral(vertices, true_centroid, np.zeros(3))
