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
    """Triangle area by Girard's formula (s2measures.d:108-125)."""
    ab = np.cross(a, b)
    bc = np.cross(b, c)
    ac = np.cross(a, c)
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


def loop_signed_area(vertices):
    """Sum of signed triangle areas from vertex 0 (s2loop.d:428-470
    getSurfaceIntegral shape); positive = CCW interior."""
    v = np.asarray(vertices, dtype=np.float64)
    total = 0.0
    origin = v[0]
    for i in range(1, len(v) - 1):
        total += signed_triangle_area(origin, v[i], v[i + 1])
    return total


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


def triangle_true_centroid(a, b, c):
    """Non-normalized 'true' centroid of a spherical triangle
    (s2centroids.d:60-96)."""
    angle_a = math.atan2(np.linalg.norm(np.cross(b, c)), np.dot(b, c))
    del angle_a
    # Integral formula (s2centroids.d): centroid = sum over edges of
    # (cross products scaled by the opposite angle) / 2. We use the exact
    # expression from the reference.
    ra = np.linalg.norm(np.cross(b, c))
    rb = np.linalg.norm(np.cross(c, a))
    rc = np.linalg.norm(np.cross(a, b))
    angle_bc = math.atan2(ra, np.dot(b, c))
    angle_ca = math.atan2(rb, np.dot(c, a))
    angle_ab = math.atan2(rc, np.dot(a, b))
    x = np.array([a[0], b[0], c[0]])
    y = np.array([a[1], b[1], c[1]])
    z = np.array([a[2], b[2], c[2]])
    r = np.array([angle_bc / ra if ra else 0.0,
                  angle_ca / rb if rb else 0.0,
                  angle_ab / rc if rc else 0.0])
    out = np.empty(3)
    out[0] = 0.5 * np.dot(np.cross(y, z), r)
    out[1] = 0.5 * np.dot(np.cross(z, x), r)
    out[2] = 0.5 * np.dot(np.cross(x, y), r)
    return out


def loop_centroid(vertices):
    """True centroid of the loop interior (not normalized)."""
    v = np.asarray(vertices, dtype=np.float64)
    origin = v[0]
    total = np.zeros(3)
    from .predicates import sign
    for i in range(1, len(v) - 1):
        s = sign(tuple(origin), tuple(v[i]), tuple(v[i + 1]))
        total += s * triangle_true_centroid(origin, v[i], v[i + 1])
    return total
