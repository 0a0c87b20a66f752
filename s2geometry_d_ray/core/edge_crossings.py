"""Robust edge intersection: the stable -> long-double -> exact chain of
the reference ``src/s2/s2edge_crossings.d:352-419`` (getIntersection).

Given two crossing edges AB and CD, returns an intersection point within
INTERSECTION_ERROR (= 8 * DBL_ERR radians) of the true intersection, with
the reference's invariances: GI(b,a,c,d) == GI(a,b,d,c) == GI(a,b,c,d)
and GI(c,d,a,b) == GI(a,b,c,d).

The three precision tiers mirror the reference exactly:
  - stable double        (s2edge_crossings.d:178-299)
  - stable long double   (s2edge_crossings.d:301-312; x86 80-bit
                          np.longdouble here)
  - exact                (s2edge_crossings.d:442-483; Fraction arithmetic
                          replacing ExactFloat)
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from .predicates import ordered_ccw

DBL_ERR = float(np.finfo(np.float64).eps) / 2          # 2^-53
INTERSECTION_ERROR = 8 * DBL_ERR                       # radians
INTERSECTION_MERGE_RADIUS = 2 * INTERSECTION_ERROR     # s2edge_crossings.d:436


def _rounding_epsilon(dtype):
    return float(np.finfo(dtype).eps) / 2


def _compare_edges(a0, a1, b0, b1):
    """(a0,a1) < (b0,b1) under the reversal-invariant total order
    (s2edge_crossings.d:158-168)."""
    pa0, pa1 = (a0, a1) if tuple(a0) < tuple(a1) else (a1, a0)
    pb0, pb1 = (b0, b1) if tuple(b0) < tuple(b1) else (b1, b0)
    ta0, tb0, tb1 = tuple(pa0), tuple(pb0), tuple(pb1)
    return ta0 < tb0 or (ta0 == tb0 and tb0 < tb1)


def _get_projection(x, a_norm, a_norm_len, a0, a1, t_err):
    """Signed distance of x to the plane of (a0,a1), with error bound
    (s2edge_crossings.d:206-242)."""
    x0 = x - a0
    x1 = x - a1
    x0_dist2 = float(x0 @ x0)
    x1_dist2 = float(x1 @ x1)
    if x0_dist2 < x1_dist2 or (x0_dist2 == x1_dist2
                               and tuple(x0) < tuple(x1)):
        dist = math.sqrt(x0_dist2)
        result = x0 @ a_norm
    else:
        dist = math.sqrt(x1_dist2)
        result = x1 @ a_norm
    error = (((3.5 + 2 * math.sqrt(3.0)) * a_norm_len
              + 32 * math.sqrt(3.0) * DBL_ERR) * dist
             + 1.5 * abs(float(result))) * t_err
    return result, error


def _stable_sorted(a0, a1, b0, b1, dtype):
    """Projection + interpolation intersection; edges pre-sorted so
    (a0,a1) is longer (s2edge_crossings.d:248-299).  Returns a unit
    np.ndarray or None if the error bound is exceeded."""
    t_err = _rounding_epsilon(dtype)
    a_norm = np.cross(a0 - a1, a0 + a1)
    a_norm_len = math.sqrt(float(a_norm @ a_norm))
    d = b1 - b0
    b_len = math.sqrt(float(d @ d))
    b0_dist, b0_error = _get_projection(b0, a_norm, a_norm_len, a0, a1,
                                        t_err)
    b1_dist, b1_error = _get_projection(b1, a_norm, a_norm_len, a0, a1,
                                        t_err)
    dist_sum = abs(float(b0_dist - b1_dist))
    error_sum = b0_error + b1_error
    if dist_sum <= error_sum:
        return None
    x = b0_dist * b1 - b1_dist * b0
    error = (b_len * abs(float(b0_dist * b1_error - b1_dist * b0_error))
             / (dist_sum - error_sum) + 2 * t_err * dist_sum)
    x_len = math.sqrt(float(x @ x))
    if error > (INTERSECTION_ERROR - t_err) * x_len:
        return None
    return x / dtype(x_len)


def _stable(a0, a1, b0, b1, dtype):
    """Sort edges longest-first (deterministically) then project
    (s2edge_crossings.d:178-197)."""
    a0 = np.asarray(a0, dtype=dtype)
    a1 = np.asarray(a1, dtype=dtype)
    b0 = np.asarray(b0, dtype=dtype)
    b1 = np.asarray(b1, dtype=dtype)
    da = a1 - a0
    db = b1 - b0
    a_len2 = float(da @ da)
    b_len2 = float(db @ db)
    if a_len2 < b_len2 or (a_len2 == b_len2
                           and _compare_edges(a0, a1, b0, b1)):
        return _stable_sorted(b0, b1, a0, a1, dtype)
    return _stable_sorted(a0, a1, b0, b1, dtype)


def _frac(p):
    return (Fraction(float(p[0])), Fraction(float(p[1])),
            Fraction(float(p[2])))


def _fcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _point_from_exact(xf):
    """Fraction 3-vector -> unit double vector, scaling first if the
    direct conversion would underflow (s2edge_crossings.d:485-504)."""
    x = np.array([float(v) for v in xf], dtype=np.float64)
    n2 = float(x @ x)
    if n2 > 0:
        return x / math.sqrt(n2)
    # scale so the largest component is around 2^0
    exps = []
    for v in xf:
        if v != 0:
            exps.append(v.numerator.bit_length()
                        - v.denominator.bit_length())
    if not exps:
        return np.zeros(3)
    scale = Fraction(2) ** (-max(exps))
    x = np.array([float(v * scale) for v in xf], dtype=np.float64)
    n2 = float(x @ x)
    if n2 == 0:
        return np.zeros(3)
    return x / math.sqrt(n2)


def _exact(a0, a1, b0, b1):
    """Exact-arithmetic intersection (s2edge_crossings.d:442-483)."""
    a0f, a1f, b0f, b1f = _frac(a0), _frac(a1), _frac(b0), _frac(b1)
    a_norm_xf = _fcross(a0f, a1f)
    b_norm_xf = _fcross(b0f, b1f)
    x_xf = _fcross(a_norm_xf, b_norm_xf)
    x = _point_from_exact(x_xf)
    if not x.any():
        # exactly collinear: of the two endpoints interior to the other
        # edge, return the lexicographically smallest
        best = None
        a_norm = _point_from_exact(a_norm_xf)
        b_norm = _point_from_exact(b_norm_xf)
        an = tuple(a_norm)
        bn = tuple(b_norm)
        for p, lo, hi, nrm in ((a0, b0, b1, bn), (a1, b0, b1, bn),
                               (b0, a0, a1, an), (b1, a0, a1, an)):
            tp = tuple(float(v) for v in p)
            if ordered_ccw(tuple(lo), tp, tuple(hi), nrm):
                if best is None or tp < best:
                    best = tp
        x = np.array(best if best is not None else a0, dtype=np.float64)
    return x


def get_intersection(a0, a1, b0, b1):
    """Intersection point of crossing edges AB and CD
    (s2edge_crossings.d:352-419): stable double, then 80-bit long
    double, then exact; sign-corrected to the near side of the sphere."""
    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    result = _stable(a0, a1, b0, b1, np.float64)
    if result is None and np.finfo(np.longdouble).eps < np.finfo(
            np.float64).eps:
        r = _stable(a0, a1, b0, b1, np.longdouble)
        if r is not None:
            result = np.asarray(r, dtype=np.float64)
    if result is None:
        result = _exact(a0, a1, b0, b1)
    result = np.asarray(result, dtype=np.float64)
    if float(result @ ((a0 + a1) + (b0 + b1))) < 0:
        result = -result
    return result
