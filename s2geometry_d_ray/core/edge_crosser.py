"""Stateful edge-chain crossing tester: port of S2EdgeCrosser /
S2CopyingEdgeCrosser (``src/s2/s2edge_crosser.d:53-440``).

The batch pipelines use the vectorized triage-mask formulation in
``predicates.crossing_mask_batch`` (SURVEY's recommended mapping); this class
is the scalar chain form for callers that walk an edge chain point by point
(loop construction, text-format validation, conformance tests). Points are
plain 3-tuples of floats; because Python tuples are values, the "copying"
variant of the reference is the only behavior (there is no pointer-identity
fast path — ``crossing_sign(c, d)`` compares C by value like
S2CopyingEdgeCrosser, s2edge_crosser.d:393-398).
"""

from __future__ import annotations

import math

from .edge_clipping import robust_cross_prod
from .predicates import (
    _cross,
    _dot,
    expensive_sign,
    sign,
    triage_sign,
    vertex_crossing,
)

# Tangent separation error bound (s2edge_crosser.d:283).
_K_ERROR = (1.5 + 1.0 / math.sqrt(3.0)) * 2.220446049250313e-16


def _pt_eq(p, q):
    """Component-wise ==, matching the reference's IEEE semantics.

    Python's tuple equality short-circuits on element identity, which makes
    two references to the same NaN tuple compare equal; the reference's
    S2Point operator== is plain double comparison where NaN != NaN.
    """
    return p[0] == q[0] and p[1] == q[1] and p[2] == q[2]


class EdgeCrosser:
    """Tests a chain of edges for intersection with a fixed edge AB.

    Mirrors S2EdgeCrosser's state machine: the orientation of triangle ACB
    is carried between calls so that testing edge (C, D) after (B_prev, C)
    costs one triage sign in the common case (s2edge_crosser.d:197-218).
    """

    def __init__(self, a, b, c=None):
        self.init(a, b)
        if c is not None:
            self.restart_at(c)

    def init(self, a, b):
        """initialize() (s2edge_crosser.d:84-90)."""
        self._a = a
        self._b = b
        self._a_cross_b = _cross(a, b)
        self._have_tangents = False
        self._a_tangent = None
        self._b_tangent = None
        self._c = None
        self._acb = 0

    @property
    def a(self):
        return self._a

    @property
    def b(self):
        return self._b

    @property
    def c(self):
        """Last vertex of the current edge chain (s2edge_crosser.d:245-248)."""
        return self._c

    def restart_at(self, c):
        """Call when the chain jumps to a new place (s2edge_crosser.d:183-187)."""
        self._c = c
        self._acb = -triage_sign(self._a, self._b, c, self._a_cross_b)

    def crossing_sign(self, c, d=None):
        """+1 interior crossing / 0 shared vertex / -1 otherwise.

        One argument continues the chain from the previous vertex
        (s2edge_crosser.d:197-218); two arguments restart at C first if it
        differs from the current chain vertex (s2edge_crosser.d:121-126).
        """
        if d is None:
            d = c
        elif self._c is None or not _pt_eq(c, self._c):
            self.restart_at(c)
        bda = triage_sign(self._a, self._b, d, self._a_cross_b)
        if self._acb == -bda and bda != 0:
            # Common case: C and D on opposite sides of great circle AB.
            self._c = d
            self._acb = -bda
            return -1
        return self._crossing_sign_internal(d, bda)

    def edge_or_vertex_crossing(self, c, d=None):
        """Crossing extended with the shared-vertex parity rule
        (s2edge_crosser.d:227-238)."""
        if d is None:
            d = c
        elif self._c is None or not _pt_eq(c, self._c):
            self.restart_at(c)
        c_prev = self._c  # clobbered by crossing_sign
        crossing = self.crossing_sign(d)
        if crossing < 0:
            return False
        if crossing > 0:
            return True
        return vertex_crossing(self._a, self._b, c_prev, d)

    # -- slow path (s2edge_crosser.d:252-325) --------------------------------

    def _crossing_sign_internal(self, d, bda):
        # Save D as the next chain vertex C; the next triangle ACB is the
        # opposite of the (possibly exact-resolved) current triangle BDA.
        result = self._crossing_sign_internal2(d, bda)
        self._c = d
        self._acb = -self._bda_final
        return result

    def _crossing_sign_internal2(self, d, bda):
        self._bda_final = bda
        a, b, c = self._a, self._b, self._c
        # Outward tangents at A and B: if AB and CD are on opposite sides of
        # a plane through one tangent, no intersection (common for finely
        # sampled curves / cell-union boundaries).
        if not self._have_tangents:
            norm = robust_cross_prod(a, b)
            n = math.sqrt(_dot(norm, norm))
            if n > 0:
                norm = (norm[0] / n, norm[1] / n, norm[2] / n)
            self._a_tangent = _cross(a, norm)
            self._b_tangent = _cross(norm, b)
            self._have_tangents = True
        at, bt = self._a_tangent, self._b_tangent
        if ((_dot(c, at) > _K_ERROR and _dot(d, at) > _K_ERROR)
                or (_dot(c, bt) > _K_ERROR and _dot(d, bt) > _K_ERROR)):
            return -1
        # Shared vertices from different edges.
        if (_pt_eq(a, c) or _pt_eq(a, d) or _pt_eq(b, c)
                or _pt_eq(b, d)):
            return 0
        # Degenerate input edges.
        if _pt_eq(a, b) or _pt_eq(c, d):
            return -1
        acb = self._acb
        if acb == 0:
            acb = -expensive_sign(a, b, c)
            self._acb = acb
        if bda == 0:
            bda = expensive_sign(a, b, d)
        self._bda_final = bda
        if bda != acb:
            return -1
        c_cross_d = _cross(c, d)
        cbd = -sign(c, d, b, c_cross_d)
        if cbd != acb:
            return -1
        dac = sign(c, d, a, c_cross_d)
        return 1 if dac == acb else -1
