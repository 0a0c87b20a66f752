"""Robust geometric predicates: the triage -> stable -> exact -> symbolic
sign chain of the reference ``src/s2/s2predicates.d``, plus edge-crossing
predicates from ``src/s2/s2edge_crossings.d`` / ``s2edge_crosser.d``.

Scalar entry points operate on 3-tuples of floats; vectorized triage helpers
operate on numpy arrays and leave uncertain entries (|det| within the error
bound) for the scalar exact path. Exact arithmetic uses ``fractions.Fraction``
(doubles convert exactly), replacing the reference's ExactFloat
(src/s2/util/math/exactfloat.d).

Error constants replicated:
  MAX_DET_ERROR        = 1.8274 * DBL_EPSILON   (s2predicates.d:1475)
  DET_ERROR_MULTIPLIER = 3.2321 * DBL_EPSILON   (s2predicates.d:131)
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = float(np.finfo(np.float64).eps)  # 2.220446049250313e-16
MAX_DET_ERROR = 1.8274 * DBL_EPSILON
DET_ERROR_MULTIPLIER = 3.2321 * DBL_EPSILON

# Fixed reference point for loop parity tests (s2pointutil.d:36-54).
ORIGIN = (-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _norm2(a):
    return a[0] * a[0] + a[1] * a[1] + a[2] * a[2]


def triage_sign(a, b, c, a_cross_b=None):
    """Fast sign with certified error bound (s2predicates.d:1454-1490)."""
    if a_cross_b is None:
        a_cross_b = _cross(a, b)
    det = _dot(a_cross_b, c)
    if det > MAX_DET_ERROR:
        return 1
    if det < -MAX_DET_ERROR:
        return -1
    return 0


def stable_sign(a, b, c):
    """Numerically stable sign via longest-edge permutation
    (s2predicates.d:113-148)."""
    ab = _sub(b, a)
    bc = _sub(c, b)
    ca = _sub(a, c)
    ab2, bc2, ca2 = _norm2(ab), _norm2(bc), _norm2(ca)
    if ab2 >= bc2 and ab2 >= ca2:
        det = -_dot(_cross(ca, bc), c)
        max_error = DET_ERROR_MULTIPLIER * np.sqrt(ca2 * bc2)
    elif bc2 >= ca2:
        det = -_dot(_cross(ab, ca), a)
        max_error = DET_ERROR_MULTIPLIER * np.sqrt(ab2 * ca2)
    else:
        det = -_dot(_cross(bc, ab), b)
        max_error = DET_ERROR_MULTIPLIER * np.sqrt(bc2 * ab2)
    if abs(det) <= max_error:
        return 0
    return 1 if det > 0 else -1


def _symbolically_perturbed_sign(a, b, c, b_cross_c):
    """Simulation-of-Simplicity tie-break (s2predicates.d:177-283).

    Inputs are Fraction 3-tuples with a < b < c lexicographically.
    """
    def sgn(x):
        return (x > 0) - (x < 0)

    for val in (b_cross_c[2], b_cross_c[1], b_cross_c[0]):
        s = sgn(val)
        if s:
            return s
    s = sgn(c[0] * a[1] - c[1] * a[0])          # db[2]
    if s:
        return s
    s = sgn(c[0])                                # db[2]*da[1]
    if s:
        return s
    s = -sgn(c[1])                               # db[2]*da[0]
    if s:
        return s
    s = sgn(c[2] * a[0] - c[0] * a[2])           # db[1]
    if s:
        return s
    s = sgn(c[2])                                # db[1]*da[0]
    if s:
        return s
    s = sgn(a[0] * b[1] - a[1] * b[0])           # dc[2]
    if s:
        return s
    s = -sgn(b[0])                               # dc[2]*da[1]
    if s:
        return s
    s = sgn(b[1])                                # dc[2]*da[0]
    if s:
        return s
    s = sgn(a[0])                                # dc[2]*db[1]
    if s:
        return s
    return 1                                     # dc[2]*db[1]*da[0]


def exact_sign(a, b, c, perturb=True):
    """Exact determinant sign with optional symbolic perturbation
    (s2predicates.d:1542-1589)."""
    perm_sign = 1
    pa, pb, pc = a, b, c
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    if pb > pc:
        pb, pc = pc, pb
        perm_sign = -perm_sign
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    xa = tuple(Fraction(v) for v in pa)
    xb = tuple(Fraction(v) for v in pb)
    xc = tuple(Fraction(v) for v in pc)
    xb_cross_xc = _cross(xb, xc)
    det = _dot(xa, xb_cross_xc)
    det_sign = (det > 0) - (det < 0)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(xa, xb, xc, xb_cross_xc)
    return perm_sign * det_sign


def expensive_sign(a, b, c, perturb=True):
    """s2predicates.d:1511-1536.

    Equality is component-wise (not tuple ==) so that NaN inputs behave as
    IEEE doubles do in the reference: NaN != NaN, hence a NaN triangle is
    not treated as degenerate here (it resolves to -1 via stable_sign)."""
    if ((a[0] == b[0] and a[1] == b[1] and a[2] == b[2])
            or (b[0] == c[0] and b[1] == c[1] and b[2] == c[2])
            or (c[0] == a[0] and c[1] == a[1] and c[2] == a[2])):
        return 0
    s = stable_sign(a, b, c)
    if s != 0:
        return s
    return exact_sign(a, b, c, perturb)


def sign(a, b, c, a_cross_b=None):
    """Robust orientation of the triangle (a, b, c): always nonzero for
    distinct points (s2predicates.d:93-98)."""
    s = triage_sign(a, b, c, a_cross_b)
    if s != 0:
        return s
    return expensive_sign(a, b, c)


def ortho(a):
    """Deterministic unit vector orthogonal to a (s2pointutil.d:81-95)."""
    ax = [abs(v) for v in a]
    lac = 2 if ax[2] >= ax[0] and ax[2] >= ax[1] else (
        1 if ax[1] >= ax[0] else 0)
    k = lac - 1
    if k < 0:
        k = 2
    temp = [0.012, 0.0053, 0.00457]
    temp[k] = 1.0
    c = _cross(a, tuple(temp))
    n = np.sqrt(_norm2(c))
    return (c[0] / n, c[1] / n, c[2] / n)


def ordered_ccw(a, b, c, o):
    """True if edges OA, OB, OC occur in CCW order sweeping around O
    (s2predicates.d:283-299)."""
    total = 0
    if sign(b, o, a) >= 0:
        total += 1
    if sign(c, o, b) >= 0:
        total += 1
    if sign(a, o, c) > 0:
        total += 1
    return total >= 2


def vertex_crossing(a, b, c, d):
    """Shared-vertex crossing parity rule (s2edge_crossings.d:105-133)."""
    if a == b or c == d:
        return False
    if a == c:
        return (b == d) or ordered_ccw(ortho(a), d, b, a)
    if b == d:
        return ordered_ccw(ortho(b), c, a, b)
    if a == d:
        return (b == c) or ordered_ccw(ortho(a), c, b, a)
    if b == c:
        return ordered_ccw(ortho(b), d, a, b)
    return False


def crossing_sign(a, b, c, d):
    """+1 if AB crosses CD at an interior point, 0 if any vertex is shared,
    -1 otherwise (s2edge_crossings.d:75-78 via s2edge_crosser.d:197-325)."""
    a_cross_b = _cross(a, b)
    acb = -triage_sign(a, b, c, a_cross_b)
    bda = triage_sign(a, b, d, a_cross_b)
    if acb == -bda and bda != 0:
        return -1
    # Shared / degenerate vertices.
    if a == c or a == d or b == c or b == d:
        return 0
    if a == b or c == d:
        return -1
    if acb == 0:
        acb = -expensive_sign(a, b, c)
    if bda == 0:
        bda = expensive_sign(a, b, d)
    if bda != acb:
        return -1
    c_cross_d = _cross(c, d)
    cbd = -sign(c, d, b, c_cross_d)
    if cbd != acb:
        return -1
    dac = sign(c, d, a, c_cross_d)
    return 1 if dac == acb else -1


def edge_or_vertex_crossing(a, b, c, d):
    """Crossing function whose parity implements point-in-polygon
    (s2edge_crossings.d:143-152)."""
    crossing = crossing_sign(a, b, c, d)
    if crossing < 0:
        return False
    if crossing > 0:
        return True
    return vertex_crossing(a, b, c, d)


# ---------------------------------------------------------------------------
# Vectorized triage helpers. Certain entries resolve via the fast path;
# callers re-run uncertain entries through the scalar chain above.
# ---------------------------------------------------------------------------

def triage_sign_batch(dets):
    """Map determinant values to {-1, 0, +1} with 0 = uncertain."""
    return np.where(dets > MAX_DET_ERROR, 1,
                    np.where(dets < -MAX_DET_ERROR, -1, 0)).astype(np.int8)


def crossing_mask_batch(s_abc, s_abd, s_cdb, s_cda):
    """Vectorized interior-crossing decision from the four triage signs.

    Derived from s2edge_crosser.d:197-325: AB crosses CD interiorly iff
    s(a,b,c) == -s(a,b,d) == s(c,d,b) == -s(c,d,a) != 0.
    Returns (crossing_mask, uncertain_mask); uncertain entries (any triage
    sign 0) must be resolved with the scalar exact path.
    """
    uncertain = (s_abc == 0) | (s_abd == 0) | (s_cdb == 0) | (s_cda == 0)
    crossing = (~uncertain & (s_abc == -s_abd) & (s_abc == s_cdb)
                & (s_abc == -s_cda))
    return crossing, uncertain
