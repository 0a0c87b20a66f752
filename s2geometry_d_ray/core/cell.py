"""Scalar S2Cell: decoded cell geometry used by the coverer and region
predicates. Reimplements ``src/s2/s2cell.d`` (uv bounds, vertices, edge
normals, closed point containment, cap/rect bounds)."""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import coords
from .predicates import DBL_EPSILON

# Inward-facing edge normals (s2coords.d:294-318 GetUNorm/GetVNorm).


def _get_u_norm(face, u):
    return [( u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
            (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u)][face]


def _get_v_norm(face, v):
    return [(-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
            ( v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v)][face]


class Cell:
    """Decoded cell: face, level, uv rect; 48-byte equivalent of s2cell.d:46."""

    __slots__ = ("id", "face", "level", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, cell_id):
        cid = np.uint64(cell_id)
        self.id = cid
        face, i, j = ci.to_face_ij(np.uint64([cid]))
        self.face = int(face[0])
        self.level = int(ci.level(np.uint64([cid]))[0])
        size = 1 << (ci.MAX_LEVEL - self.level)
        i0 = int(i[0]) & -size
        j0 = int(j[0]) & -size
        self.u_lo = float(coords.st_to_uv(coords.ij_to_st_min(i0)))
        self.u_hi = float(coords.st_to_uv(coords.ij_to_st_min(i0 + size)))
        self.v_lo = float(coords.st_to_uv(coords.ij_to_st_min(j0)))
        self.v_hi = float(coords.st_to_uv(coords.ij_to_st_min(j0 + size)))

    def vertex_raw(self, k):
        """CCW corner k of the uv rect projected to xyz (s2cell.d:152-154)."""
        u = (self.u_lo, self.u_hi, self.u_hi, self.u_lo)[k & 3]
        v = (self.v_lo, self.v_lo, self.v_hi, self.v_hi)[k & 3]
        x, y, z = coords.face_uv_to_xyz(self.face, u, v)
        return (float(x), float(y), float(z))

    def vertex(self, k):
        x, y, z = self.vertex_raw(k)
        n = np.sqrt(x * x + y * y + z * z)
        return (x / n, y / n, z / n)

    def vertices(self):
        return [self.vertex(k) for k in range(4)]

    def edge_raw(self, k):
        """Inward-facing normal of edge k->k+1 (s2cell.d:166-173)."""
        k &= 3
        if k == 0:
            return _get_v_norm(self.face, self.v_lo)      # bottom
        if k == 1:
            return _get_u_norm(self.face, self.u_hi)      # right
        if k == 2:
            n = _get_v_norm(self.face, self.v_hi)         # top
            return (-n[0], -n[1], -n[2])
        n = _get_u_norm(self.face, self.u_lo)             # left
        return (-n[0], -n[1], -n[2])

    def center(self):
        u = 0.5 * (self.u_lo + self.u_hi)
        v = 0.5 * (self.v_lo + self.v_hi)
        x, y, z = coords.face_uv_to_xyz(self.face, u, v)
        n = np.sqrt(x * x + y * y + z * z)
        return (float(x / n), float(y / n), float(z / n))

    def contains_point(self, p):
        """Closed-cell containment with the DBL_EPSILON uv expansion
        (s2cell.d:613-629)."""
        face_axis = self.face % 3
        comp = p[face_axis]
        if self.face < 3:
            if comp <= 0:
                return False
        elif comp >= 0:
            return False
        u, v = coords.valid_face_xyz_to_uv(self.face, p[0], p[1], p[2])
        eps = DBL_EPSILON
        return (self.u_lo - eps <= u <= self.u_hi + eps and
                self.v_lo - eps <= v <= self.v_hi + eps)

    def cap_bound(self):
        """Bounding cap from the uv center (s2cell.d:482-498)."""
        from .cap import Cap
        center = self.center()
        cap = Cap.from_point(center)
        for k in range(4):
            cap.add_point(self.vertex(k))
        return cap

    def children(self):
        out = []
        for pos in range(4):
            out.append(Cell(ci.child(np.uint64([self.id]), pos)[0]))
        return out

    def contains_cell(self, other):
        return bool(ci.contains(np.uint64([self.id]), np.uint64([other.id]))[0])

    def may_intersect_cell(self, other):
        return bool(ci.intersects(np.uint64([self.id]),
                                  np.uint64([other.id]))[0])
