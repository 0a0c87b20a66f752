"""Exact distance-comparison predicates — the triage (double) ->
long-double -> exact chain of the reference ``src/s2/s2predicates.d``:

  compare_distances(x, a, b)            (s2predicates.d:309-349)
  compare_distance(x, y, r2)            (s2predicates.d:397-425)
  compare_edge_distance(x, a0, a1, r2)  (s2predicates.d:646-668)
  compare_edge_directions(a0,a1,b0,b1)  (s2predicates.d:688-712)

Distances compare as though all points were reprojected exactly onto
the unit sphere; compare_distances uses symbolic perturbations so the
result is nonzero whenever a != b (self-consistent kNN tie-breaks).
ExactFloat is replaced by fractions.Fraction (doubles convert exactly);
the "real" (80-bit long double) tier uses np.longdouble where the
platform provides it.  Distance limits r2 are SQUARED CHORD lengths
(S1ChordAngle.length2() in the reference)."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

DBL_ERR = float(np.finfo(np.float64).eps) / 2
_HAVE_LD = np.finfo(np.longdouble).eps < np.finfo(np.float64).eps
LD_ERR = float(np.finfo(np.longdouble).eps) / 2 if _HAVE_LD else DBL_ERR
_SQRT3 = math.sqrt(3.0)
DEGREES_45_CHORD2 = 2.0 - math.sqrt(2.0)  # S1ChordAngle(45deg).length2()


def _err(dtype):
    return float(np.finfo(dtype).eps) / 2


def _v(p, dtype):
    return np.asarray(p, dtype=dtype)


def _frac(p):
    return (Fraction(float(p[0])), Fraction(float(p[1])),
            Fraction(float(p[2])))


def _fdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _fcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _fsign(x):
    return (x > 0) - (x < 0)


# -- cos / sin^2 distance measurements with error bounds ---------------

def _get_cos_distance(x, y, dtype):
    """(cos(XY), max error) — s2predicates.d:1654-1669."""
    t_err = _err(dtype)
    if dtype is np.float64:
        c = float(x @ y)
        return c, 9.5 * DBL_ERR * abs(c) + 1.5 * DBL_ERR
    c = float((x @ y) / np.sqrt((x @ x) * (y @ y)))
    return c, 7 * t_err * abs(c) + 1.5 * t_err


def _get_sin2_distance(x, y, dtype):
    """(sin^2(XY), max error) — s2predicates.d:1675-1703."""
    t_err = _err(dtype)
    n = np.cross(x - y, x + y)
    if dtype is np.float64:
        d2 = 0.25 * float(n @ n)
        error = ((21 + 4 * _SQRT3) * DBL_ERR * d2
                 + 32 * _SQRT3 * DBL_ERR * DBL_ERR * math.sqrt(d2)
                 + 768 * DBL_ERR ** 4)
        return d2, error
    d2 = 0.25 * float((n @ n) / ((x @ x) * (y @ y)))
    error = ((13 + 4 * _SQRT3) * t_err * d2
             + 32 * _SQRT3 * DBL_ERR * t_err * math.sqrt(d2)
             + 768 * DBL_ERR * DBL_ERR * t_err * t_err)
    return d2, error


# -- compare_distances(x, a, b) ----------------------------------------

def _triage_compare_cos_distances(x, a, b, dtype):
    cos_ax, e_ax = _get_cos_distance(a, x, dtype)
    cos_bx, e_bx = _get_cos_distance(b, x, dtype)
    diff, error = cos_ax - cos_bx, e_ax + e_bx
    return -1 if diff > error else (1 if diff < -error else 0)


def _triage_compare_sin2_distances(x, a, b, dtype):
    s_ax, e_ax = _get_sin2_distance(a, x, dtype)
    s_bx, e_bx = _get_sin2_distance(b, x, dtype)
    diff, error = s_ax - s_bx, e_ax + e_bx
    return 1 if diff > error else (-1 if diff < -error else 0)


def _exact_compare_distances(x, a, b):
    """s2predicates.d:1611-1626 (Fraction arithmetic)."""
    xf, af, bf = _frac(x), _frac(a), _frac(b)
    cos_ax = _fdot(xf, af)
    cos_bx = _fdot(xf, bf)
    a_sign, b_sign = _fsign(cos_ax), _fsign(cos_bx)
    if a_sign != b_sign:
        return -1 if a_sign > b_sign else 1
    cmp = (cos_bx * cos_bx * _fdot(af, af)
           - cos_ax * cos_ax * _fdot(bf, bf))
    return a_sign * _fsign(cmp)


def _symbolic_compare_distances(x, a, b):
    """Pedestal perturbation: if a < b then AX > BX
    (s2predicates.d:1631-1650)."""
    ta, tb = tuple(float(v) for v in a), tuple(float(v) for v in b)
    return 1 if ta < tb else (-1 if ta > tb else 0)


def compare_distances(x, a, b):
    """-1/0/+1 as AX </==/> BX; nonzero whenever a != b
    (s2predicates.d:309-349)."""
    x64, a64, b64 = (_v(p, np.float64) for p in (x, a, b))
    s = _triage_compare_cos_distances(x64, a64, b64, np.float64)
    if s != 0:
        return s
    if tuple(a64) == tuple(b64):
        return 0
    cos_ax = float(a64 @ x64)
    if cos_ax > math.sqrt(0.5):
        s = _triage_compare_sin2_distances(x64, a64, b64, np.float64)
        if s == 0 and _HAVE_LD:
            s = _triage_compare_sin2_distances(
                _v(x, np.longdouble), _v(a, np.longdouble),
                _v(b, np.longdouble), np.longdouble)
    elif cos_ax < -math.sqrt(0.5):
        s = -_triage_compare_sin2_distances(x64, a64, b64, np.float64)
        if s == 0 and _HAVE_LD:
            s = -_triage_compare_sin2_distances(
                _v(x, np.longdouble), _v(a, np.longdouble),
                _v(b, np.longdouble), np.longdouble)
    elif _HAVE_LD:
        s = _triage_compare_cos_distances(
            _v(x, np.longdouble), _v(a, np.longdouble),
            _v(b, np.longdouble), np.longdouble)
    if s != 0:
        return s
    s = _exact_compare_distances(x64, a64, b64)
    if s != 0:
        return s
    return _symbolic_compare_distances(x64, a64, b64)


# -- compare_distance(x, y, r2) ----------------------------------------

def _triage_compare_cos_distance(x, y, r2, dtype):
    t_err = _err(dtype)
    cos_xy, cos_xy_error = _get_cos_distance(x, y, dtype)
    cos_r = 1 - 0.5 * r2
    cos_r_error = 2 * t_err * cos_r
    diff = cos_xy - cos_r
    error = cos_xy_error + cos_r_error
    return -1 if diff > error else (1 if diff < -error else 0)


def _triage_compare_sin2_distance(x, y, r2, dtype):
    t_err = _err(dtype)
    sin2_xy, sin2_xy_error = _get_sin2_distance(x, y, dtype)
    sin2_r = r2 * (1 - 0.25 * r2)
    sin2_r_error = 3 * t_err * sin2_r
    diff = sin2_xy - sin2_r
    error = sin2_xy_error + sin2_r_error
    return 1 if diff > error else (-1 if diff < -error else 0)


def _exact_compare_distance(x, y, r2):
    """s2predicates.d:376-391."""
    xf, yf = _frac(x), _frac(y)
    r2f = Fraction(float(r2))
    cos_xy = _fdot(xf, yf)
    cos_r = Fraction(1) - Fraction(1, 2) * r2f
    xy_sign, r_sign = _fsign(cos_xy), _fsign(cos_r)
    if xy_sign != r_sign:
        return -1 if xy_sign > r_sign else 1
    cmp = (cos_r * cos_r * _fdot(xf, xf) * _fdot(yf, yf)
           - cos_xy * cos_xy)
    return xy_sign * _fsign(cmp)


def compare_distance(x, y, r2):
    """-1/0/+1 as XY </==/> the distance limit with squared chord
    length r2 (s2predicates.d:397-425)."""
    x64, y64 = _v(x, np.float64), _v(y, np.float64)
    s = _triage_compare_cos_distance(x64, y64, float(r2), np.float64)
    if s != 0:
        return s
    if r2 < DEGREES_45_CHORD2:
        s = _triage_compare_sin2_distance(x64, y64, float(r2),
                                          np.float64)
        if s == 0 and _HAVE_LD:
            s = _triage_compare_sin2_distance(
                _v(x, np.longdouble), _v(y, np.longdouble),
                np.longdouble(r2), np.longdouble)
    elif _HAVE_LD:
        s = _triage_compare_cos_distance(
            _v(x, np.longdouble), _v(y, np.longdouble),
            np.longdouble(r2), np.longdouble)
    if s != 0:
        return s
    return _exact_compare_distance(x64, y64, float(r2))


# -- compare_edge_distance(x, a0, a1, r2) ------------------------------

def _get_closest_vertex(x, a0, a1):
    a0x2 = float((a0 - x) @ (a0 - x))
    a1x2 = float((a1 - x) @ (a1 - x))
    if a0x2 < a1x2 or (a0x2 == a1x2 and tuple(a0) < tuple(a1)):
        return a0, a0x2
    return a1, a1x2


def _triage_compare_line_sin2_distance(x, a0, a1, r2, n, n1, n2, dtype):
    t_err = _err(dtype)
    if r2 >= 2.0:
        return -1
    n2sin2_r = n2 * r2 * (1 - 0.25 * r2)
    n2sin2_r_error = 6 * t_err * n2sin2_r
    cv, ax2 = _get_closest_vertex(x, a0, a1)
    x_dn = float((x - cv) @ n)
    x_dn2 = x_dn * x_dn
    c1 = (((3.5 + 2 * _SQRT3) * n1 + 32 * _SQRT3 * DBL_ERR)
          * t_err * math.sqrt(ax2))
    x_dn2_error = 4 * t_err * x_dn2 + (2 * abs(x_dn) + c1) * c1
    if t_err < DBL_ERR:
        n2sin2_r *= float(x @ x)
        n2sin2_r_error += 4 * t_err * n2sin2_r
    else:
        n2sin2_r_error += 8 * DBL_ERR * n2sin2_r
    diff = x_dn2 - n2sin2_r
    error = x_dn2_error + n2sin2_r_error
    return 1 if diff > error else (-1 if diff < -error else 0)


def _triage_compare_line_cos2_distance(x, a0, a1, r2, n, n1, n2, dtype):
    t_err = _err(dtype)
    if r2 >= 2.0:
        return -1
    cos_r = 1 - 0.5 * r2
    n2cos2_r = n2 * cos_r * cos_r
    n2cos2_r_error = 7 * t_err * n2cos2_r
    m = np.cross(x, n)
    m2 = float(m @ m)
    m1 = math.sqrt(m2)
    m1_error = ((1 + 8 / _SQRT3) * n1 + 32 * _SQRT3 * DBL_ERR) * t_err
    m2_error = 3 * t_err * m2 + (2 * m1 + m1_error) * m1_error
    if t_err < DBL_ERR:
        n2cos2_r *= float(x @ x)
        n2cos2_r_error += 4 * t_err * n2cos2_r
    else:
        n2cos2_r_error += 8 * DBL_ERR * n2cos2_r
    diff = m2 - n2cos2_r
    error = m2_error + n2cos2_r_error
    return -1 if diff > error else (1 if diff < -error else 0)


def _triage_compare_line_distance(x, a0, a1, r2, n, n1, n2, dtype):
    if r2 < DEGREES_45_CHORD2:
        return _triage_compare_line_sin2_distance(x, a0, a1, r2, n, n1,
                                                  n2, dtype)
    return _triage_compare_line_cos2_distance(x, a0, a1, r2, n, n1, n2,
                                              dtype)


def _triage_compare_distance(x, y, r2, dtype):
    s = _triage_compare_cos_distance(x, y, r2, dtype)
    if s == 0 and r2 < DEGREES_45_CHORD2:
        s = _triage_compare_sin2_distance(x, y, r2, dtype)
    return s


def _triage_compare_edge_distance(x, a0, a1, r2, dtype):
    """s2predicates.d:549-590."""
    t_err = _err(dtype)
    n = np.cross(a0 - a1, a0 + a1)
    m = np.cross(n, x)
    a0_dir = a0 - x
    a1_dir = a1 - x
    a0_sign = float(a0_dir @ m)
    a1_sign = float(a1_dir @ m)
    n2 = float(n @ n)
    n1 = math.sqrt(n2)
    n1_error = ((3.5 + 8 / _SQRT3) * n1 + 32 * _SQRT3 * DBL_ERR) * t_err
    a0_sign_error = n1_error * math.sqrt(float(a0_dir @ a0_dir))
    a1_sign_error = n1_error * math.sqrt(float(a1_dir @ a1_dir))
    if abs(a0_sign) < a0_sign_error or abs(a1_sign) < a1_sign_error:
        vertex_sign = min(_triage_compare_distance(x, a0, r2, dtype),
                          _triage_compare_distance(x, a1, r2, dtype))
        line_sign = _triage_compare_line_distance(x, a0, a1, r2, n, n1,
                                                  n2, dtype)
        return line_sign if vertex_sign == line_sign else 0
    if a0_sign >= 0 or a1_sign <= 0:
        return min(_triage_compare_distance(x, a0, r2, dtype),
                   _triage_compare_distance(x, a1, r2, dtype))
    return _triage_compare_line_distance(x, a0, a1, r2, n, n1, n2, dtype)


def _exact_compare_line_distance(x, a0, a1, r2):
    """s2predicates.d:593-607."""
    if r2 >= 2.0:
        return -1
    xf, a0f, a1f = _frac(x), _frac(a0), _frac(a1)
    n = _fcross(a0f, a1f)
    sin_d = _fdot(xf, n)
    r2f = Fraction(float(r2))
    sin2_r = r2f * (1 - Fraction(1, 4) * r2f)
    cmp = sin_d * sin_d - sin2_r * _fdot(xf, xf) * _fdot(n, n)
    return _fsign(cmp)


def _triage_compare_edge_directions(a0, a1, b0, b1, dtype):
    t_err = _err(dtype)
    na = np.cross(a0 - a1, a0 + a1)
    nb = np.cross(b0 - b1, b0 + b1)
    na_len = math.sqrt(float(na @ na))
    nb_len = math.sqrt(float(nb @ nb))
    cos_ab = float(na @ nb)
    cos_ab_error = ((5 + 4 * _SQRT3) * na_len * nb_len
                    + 32 * _SQRT3 * DBL_ERR * (na_len + nb_len)) * t_err
    return 1 if cos_ab > cos_ab_error else (
        -1 if cos_ab < -cos_ab_error else 0)


def _exact_compare_edge_directions(a0, a1, b0, b1):
    na = _fcross(_frac(a0), _frac(a1))
    nb = _fcross(_frac(b0), _frac(b1))
    return _fsign(_fdot(na, nb))


def compare_edge_directions(a0, a1, b0, b1):
    """Sign of dot(normal(A), normal(B)) — exact
    (s2predicates.d:688-712)."""
    a064, a164, b064, b164 = (_v(p, np.float64)
                              for p in (a0, a1, b0, b1))
    s = _triage_compare_edge_directions(a064, a164, b064, b164,
                                        np.float64)
    if s != 0:
        return s
    if tuple(a064) == tuple(a164) or tuple(b064) == tuple(b164):
        return 0
    if _HAVE_LD:
        s = _triage_compare_edge_directions(
            _v(a0, np.longdouble), _v(a1, np.longdouble),
            _v(b0, np.longdouble), _v(b1, np.longdouble), np.longdouble)
        if s != 0:
            return s
    return _exact_compare_edge_directions(a064, a164, b064, b164)


def _exact_compare_edge_distance(x, a0, a1, r2):
    """s2predicates.d:609-630."""
    if (compare_edge_directions(a0, a1, a0, x) > 0
            and compare_edge_directions(a0, a1, x, a1) > 0):
        return _exact_compare_line_distance(x, a0, a1, r2)
    return min(compare_distance(x, a0, r2), compare_distance(x, a1, r2))


def compare_edge_distance(x, a0, a1, r2):
    """-1/0/+1 as dist(X, edge A) </==/> limit with squared chord
    length r2 (s2predicates.d:646-668).
    REQUIRES: a0 and a1 are not antipodal."""
    x64, a064, a164 = (_v(p, np.float64) for p in (x, a0, a1))
    s = _triage_compare_edge_distance(x64, a064, a164, float(r2),
                                      np.float64)
    if s != 0:
        return s
    if tuple(a064) == tuple(a164):
        return compare_distance(x, a0, r2)
    if _HAVE_LD:
        s = _triage_compare_edge_distance(
            _v(x, np.longdouble), _v(a0, np.longdouble),
            _v(a1, np.longdouble), np.longdouble(r2), np.longdouble)
        if s != 0:
            return s
    return _exact_compare_edge_distance(x64, a064, a164, float(r2))


# -- edge_circumcenter_sign(x0, x1, a, b, c) ---------------------------

def _get_circumcenter(a, b, c, dtype):
    """(Z, error): circumcenter of CCW triangle ABC (negated if ABC is
    CW) — s2predicates.d:718-746."""
    t_err = _err(dtype)
    ab_diff, ab_sum = a - b, a + b
    bc_diff, bc_sum = b - c, b + c
    nab = np.cross(ab_diff, ab_sum)
    nab_len = math.sqrt(float(nab @ nab))
    ab_len = math.sqrt(float(ab_diff @ ab_diff))
    nbc = np.cross(bc_diff, bc_sum)
    nbc_len = math.sqrt(float(nbc @ nbc))
    bc_len = math.sqrt(float(bc_diff @ bc_diff))
    mab = np.cross(nab, ab_sum)
    mbc = np.cross(nbc, bc_sum)
    error = (((16 + 24 * _SQRT3) * t_err
              + 8 * DBL_ERR * (ab_len + bc_len)) * nab_len * nbc_len
             + 128 * _SQRT3 * DBL_ERR * t_err * (nab_len + nbc_len)
             + 3 * 4096 * DBL_ERR * DBL_ERR * t_err * t_err)
    return np.cross(mab, mbc), error


def _triage_edge_circumcenter_sign(x0, x1, a, b, c, abc_sign, dtype):
    """s2predicates.d:748-768."""
    t_err = _err(dtype)
    z, z_error = _get_circumcenter(a, b, c, dtype)
    nx = np.cross(x0 - x1, x0 + x1)
    result = abc_sign * float(nx @ z)
    z_len = math.sqrt(float(z @ z))
    nx_len = math.sqrt(float(nx @ nx))
    nx_error = ((1 + 2 * _SQRT3) * nx_len
                + 32 * _SQRT3 * DBL_ERR) * t_err
    result_error = ((3 * t_err * nx_len + nx_error) * z_len
                    + z_error * nx_len)
    return 1 if result > result_error else (
        -1 if result < -result_error else 0)


def _exact_edge_circumcenter_sign(x0, x1, a, b, c, abc_sign):
    """Degree-20 exact polynomial predicate (s2predicates.d:770-876)."""
    x0f, x1f = _frac(x0), _frac(x1)
    af, bf, cf = _frac(a), _frac(b), _frac(c)
    nxf = _fcross(x0f, x1f)
    if nxf == (0, 0, 0):
        return 0  # degenerate edge X (proportional endpoints)
    dab = _fdot(nxf, _fcross(af, bf))
    dbc = _fdot(nxf, _fcross(bf, cf))
    dca = _fdot(nxf, _fcross(cf, af))
    abc2 = _fdot(af, af) * (dbc * dbc)
    bca2 = _fdot(bf, bf) * (dca * dca)
    cab2 = _fdot(cf, cf) * (dab * dab)
    lhs3_sgn = _fsign(dab)
    rhs3_sgn = -_fsign(dbc)
    lhs2_sgn = max(-1, min(1, lhs3_sgn - rhs3_sgn))
    if lhs2_sgn == 0 and lhs3_sgn != 0:
        lhs2_sgn = _fsign(cab2 - abc2) * lhs3_sgn
    rhs2_sgn = -_fsign(dca)
    result = max(-1, min(1, lhs2_sgn - rhs2_sgn))
    if result == 0 and lhs2_sgn != 0:
        lhs4_sgn = _fsign(dab) * _fsign(dbc)
        rhs4 = bca2 - cab2 - abc2
        result = max(-1, min(1, lhs4_sgn - _fsign(rhs4)))
        if result == 0 and lhs4_sgn != 0:
            result = _fsign(4 * abc2 * cab2 - rhs4 * rhs4) * lhs4_sgn
        result *= lhs2_sgn
    return abc_sign * result


def _unperturbed_sign(a, b, c):
    """Sign without symbolic perturbation (s2predicates.d:885-889)."""
    from .predicates import expensive_sign, triage_sign
    ta, tb, tc = (tuple(float(v) for v in p) for p in (a, b, c))
    s = triage_sign(ta, tb, tc)
    if s == 0:
        s = expensive_sign(ta, tb, tc, perturb=False)
    return s


def _symbolic_edge_circumcenter_sign(x0, x1, a, b, c):
    """s2predicates.d:898-965: pedestal perturbation toward the
    lexicographically smallest triangle vertex."""
    ta, tb, tc = (tuple(float(v) for v in p) for p in (a, b, c))
    if ta == tb or tb == tc or tc == ta:
        return 0
    pa, pb, pc = sorted([ta, tb, tc])
    s = _unperturbed_sign(x0, x1, pa)
    if s != 0:
        return s
    s = _unperturbed_sign(x0, x1, pb)
    if s != 0:
        return s
    return _unperturbed_sign(x0, x1, pc)


def edge_circumcenter_sign(x0, x1, a, b, c):
    """Sign(X0, X1, Z) where Z is the circumcenter of triangle ABC —
    which side of edge X the center of the circle through A, B, C lies
    on (s2predicates.d:1389-1411).  Zero only for degenerate inputs."""
    from .predicates import sign as _robust_sign
    abc_sign = _robust_sign(tuple(float(v) for v in a),
                            tuple(float(v) for v in b),
                            tuple(float(v) for v in c))
    x064, x164 = _v(x0, np.float64), _v(x1, np.float64)
    a64, b64, c64 = (_v(p, np.float64) for p in (a, b, c))
    s = _triage_edge_circumcenter_sign(x064, x164, a64, b64, c64,
                                       abc_sign, np.float64)
    if s != 0:
        return s
    if _HAVE_LD:
        s = _triage_edge_circumcenter_sign(
            _v(x0, np.longdouble), _v(x1, np.longdouble),
            _v(a, np.longdouble), _v(b, np.longdouble),
            _v(c, np.longdouble), abc_sign, np.longdouble)
        if s != 0:
            return s
    s = _exact_edge_circumcenter_sign(x064, x164, a64, b64, c64,
                                      abc_sign)
    if s != 0:
        return s
    return _symbolic_edge_circumcenter_sign(x064, x164, a64, b64, c64)


# -- get_voronoi_site_exclusion(a, b, x0, x1, r2) ----------------------

FIRST, SECOND, NEITHER, UNCERTAIN = "first", "second", "neither", \
    "uncertain"


def _triage_voronoi_site_exclusion(a, b, x0, x1, r2, dtype):
    """s2predicates.d:969-1157: does the r-disc-clipped Voronoi region
    of site A (or B) miss edge X entirely?"""
    t_err = _err(dtype)
    n = np.cross(x0 - x1, x0 + x1)               # 2 * x0 x x1
    n2 = float(n @ n)
    n1 = math.sqrt(n2)
    dn_error = ((3.5 + 2 * _SQRT3) * n1 + 32 * _SQRT3 * DBL_ERR) * t_err
    cos_r = 1 - 0.5 * r2
    sin2_r = r2 * (1 - 0.25 * r2)
    n2sin2_r = n2 * sin2_r

    cv, ax2 = _get_closest_vertex(a, x0, x1)
    a_dn = float((a - cv) @ n)
    a_dn2 = a_dn * a_dn
    a_dn_error = dn_error * math.sqrt(ax2)
    ra2 = n2sin2_r - a_dn2
    ra2_error = ((8 * DBL_ERR + 4 * t_err) * a_dn2
                 + (2 * abs(a_dn) + a_dn_error) * a_dn_error
                 + 6 * t_err * n2sin2_r)
    min_ra2 = ra2 - ra2_error
    if min_ra2 < 0:
        return UNCERTAIN
    ra = math.sqrt(ra2)
    ra_error = 1.5 * t_err * ra + 0.5 * ra2_error / math.sqrt(min_ra2)

    cv, bx2 = _get_closest_vertex(b, x0, x1)
    b_dn = float((b - cv) @ n)
    b_dn2 = b_dn * b_dn
    b_dn_error = dn_error * math.sqrt(bx2)
    rb2 = n2sin2_r - b_dn2
    rb2_error = ((8 * DBL_ERR + 4 * t_err) * b_dn2
                 + (2 * abs(b_dn) + b_dn_error) * b_dn_error
                 + 6 * t_err * n2sin2_r)
    min_rb2 = rb2 - rb2_error
    if min_rb2 < 0:
        return UNCERTAIN
    rb = math.sqrt(rb2)
    rb_error = 1.5 * t_err * rb + 0.5 * rb2_error / math.sqrt(min_rb2)

    lhs3 = cos_r * (rb - ra)
    abs_lhs3 = abs(lhs3)
    lhs3_error = cos_r * (ra_error + rb_error) + 3 * t_err * abs_lhs3

    axb = np.cross(a - b, a + b)                 # 2 * a x b
    axb1 = math.sqrt(float(axb @ axb))
    sin_d = 0.5 * float(axb @ n)
    sin_d_error = ((4 * DBL_ERR + (2.5 + 2 * _SQRT3) * t_err) * axb1 * n1
                   + 16 * _SQRT3 * DBL_ERR * t_err * (axb1 + n1))

    result = abs_lhs3 - sin_d
    result_error = lhs3_error + sin_d_error
    if result < -result_error:
        return NEITHER

    cos_d = float(a @ b) * n2 - a_dn * b_dn
    cos_d_error = (((8 * DBL_ERR + 5 * t_err) * abs(a_dn) + a_dn_error)
                   * abs(b_dn) + (abs(a_dn) + a_dn_error) * b_dn_error
                   + (8 * DBL_ERR + 8 * t_err) * n2)
    if cos_d <= -cos_d_error:
        return NEITHER
    if cos_d < cos_d_error:
        return UNCERTAIN

    if sin_d < -sin_d_error:
        r90 = 2.0
        ca = -1 if lhs3 < -lhs3_error \
            else _triage_compare_cos_distance(a, x0, r90, dtype)
        cb = -1 if lhs3 > lhs3_error \
            else _triage_compare_cos_distance(b, x1, r90, dtype)
        if ca < 0 and cb < 0:
            return NEITHER
        if ca <= 0 and cb <= 0:
            return UNCERTAIN
        if abs_lhs3 <= lhs3_error:
            return UNCERTAIN
    elif sin_d <= sin_d_error:
        return UNCERTAIN
    if result <= result_error:
        return UNCERTAIN
    return FIRST if lhs3 > 0 else SECOND


def _exact_voronoi_site_exclusion(a, b, x0, x1, r2):
    """s2predicates.d:1159-1271 (Fraction arithmetic + symbolic
    tie-break)."""
    af, bf = _frac(a), _frac(b)
    x0f, x1f = _frac(x0), _frac(x1)
    r2f = Fraction(float(r2))
    n = _fcross(x0f, x1f)
    n2 = _fdot(n, n)
    a_dn = _fdot(af, n)
    b_dn = _fdot(bf, n)
    cos_d = _fdot(af, bf) * n2 - a_dn * b_dn
    if _fsign(cos_d) < 0:
        return NEITHER
    a2 = _fdot(af, af)
    b2 = _fdot(bf, bf)
    n2sin2_r = r2f * (1 - Fraction(1, 4) * r2f) * n2
    sa2 = b2 * (n2sin2_r * a2 - a_dn * a_dn)
    sb2 = a2 * (n2sin2_r * b2 - b_dn * b_dn)
    lhs2_sgn = _fsign(sb2 - sa2)
    rhs2 = _fdot(_fcross(af, bf), n)
    rhs2_sgn = _fsign(rhs2)
    if rhs2_sgn < 0:
        r90 = 2.0
        ca = -1 if lhs2_sgn < 0 else _exact_compare_distance(a, x0, r90)
        cb = -1 if lhs2_sgn > 0 else _exact_compare_distance(b, x1, r90)
        if ca <= 0 and cb <= 0:
            return NEITHER
        return FIRST if ca == 1 else SECOND
    if lhs2_sgn == 0:
        return NEITHER
    cos_r = 1 - Fraction(1, 2) * r2f
    cos2_r = cos_r * cos_r
    lhs3 = cos2_r * (sa2 + sb2) - rhs2 * rhs2
    if _fsign(lhs3) < 0:
        return NEITHER
    lhs4 = lhs3 * lhs3
    rhs4 = 4 * cos2_r * cos2_r * sa2 * sb2
    result = _fsign(lhs4 - rhs4)
    if result < 0:
        return NEITHER
    if result == 0:
        # shared coverage endpoint at distance exactly r: symbolic
        # perturbation (A closer to equidistant points iff A > B)
        ta = tuple(float(v) for v in a)
        tb = tuple(float(v) for v in b)
        if (lhs2_sgn > 0) == (ta > tb):
            return NEITHER
    return FIRST if lhs2_sgn > 0 else SECOND


def get_voronoi_site_exclusion(a, b, x0, x1, r2):
    """Given sites A, B within distance r of edge X with
    compare_distances(x0, a, b) < 0: which site's r-clipped Voronoi
    region misses edge X entirely (s2predicates.d:1305-1340)?
    Returns 'first' / 'second' / 'neither'."""
    a64, b64 = _v(a, np.float64), _v(b, np.float64)
    x064, x164 = _v(x0, np.float64), _v(x1, np.float64)
    if compare_distances(x164, a64, b64) < 0:
        return SECOND  # site A closer to every point on X
    res = _triage_voronoi_site_exclusion(a64, b64, x064, x164,
                                         float(r2), np.float64)
    if res != UNCERTAIN:
        return res
    if _HAVE_LD:
        res = _triage_voronoi_site_exclusion(
            _v(a, np.longdouble), _v(b, np.longdouble),
            _v(x0, np.longdouble), _v(x1, np.longdouble),
            np.longdouble(r2), np.longdouble)
        if res != UNCERTAIN:
            return res
    return _exact_voronoi_site_exclusion(a64, b64, x064, x164, float(r2))
