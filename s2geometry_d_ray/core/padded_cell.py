"""S2PaddedCell — an S2 cell whose (u,v)-range is expanded by a padding,
optimized for recursive edge-clipping algorithms
(src/s2/s2padded_cell.d:36-241).

Used together with core/edge_clipping.py: clip edges against bound() /
middle() while recursing through children in Hilbert order
(get_child_ij), with shrink_to_fit() skipping single-child prefixes."""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ci
from . import coords
from .coords import (INVERT_MASK, MAX_LEVEL, POS_TO_IJ,
                     POS_TO_ORIENTATION, SWAP_MASK)

# IJ_TO_POS[orientation][2*i+j] — inverse of POS_TO_IJ per orientation
IJ_TO_POS = []
for _o in range(4):
    inv = [0] * 4
    for _pos in range(4):
        inv[int(POS_TO_IJ[_o][_pos])] = _pos
    IJ_TO_POS.append(inv)


def _size_ij(level):
    return 1 << (MAX_LEVEL - level)


class PaddedCell:
    __slots__ = ("id", "padding", "bound", "_middle", "ij_lo",
                 "orientation", "level")

    def __init__(self, cell_id, padding, _child_of=None, _i=0, _j=0):
        if _child_of is not None:
            self._init_child(_child_of, _i, _j)
            return
        self.id = np.uint64(cell_id)
        self.padding = float(padding)
        self._middle = None
        level = ci.level_scalar(int(self.id))
        self.level = level
        if level == 0:
            limit = 1.0 + padding
            self.bound = [[-limit, limit], [-limit, limit]]
            self._middle = [[-padding, padding], [-padding, padding]]
            self.ij_lo = [0, 0]
            self.orientation = int(self.id >> np.uint64(61)) & 1
        else:
            face, i, j, orient = ci.to_face_ij(self.id,
                                               return_orientation=True)
            self.orientation = int(orient)
            size = _size_ij(level)
            i0 = int(i) & -size
            j0 = int(j) & -size
            self.ij_lo = [i0, j0]
            scale = 1.0 / (1 << MAX_LEVEL)
            self.bound = [
                [coords.st_to_uv(scale * i0) - padding,
                 coords.st_to_uv(scale * (i0 + size)) + padding],
                [coords.st_to_uv(scale * j0) - padding,
                 coords.st_to_uv(scale * (j0 + size)) + padding]]

    def _init_child(self, parent, i, j):
        """Child with (i,j) in {0,1}^2 (increasing u/v)
        (s2padded_cell.d:65-83)."""
        self.padding = parent.padding
        self.bound = [list(parent.bound[0]), list(parent.bound[1])]
        self.level = parent.level + 1
        self._middle = None
        pos = IJ_TO_POS[parent.orientation][2 * i + j]
        self.id = ci.child(parent.id, pos)
        size = _size_ij(self.level)
        self.ij_lo = [parent.ij_lo[0] + i * size,
                      parent.ij_lo[1] + j * size]
        self.orientation = parent.orientation \
            ^ int(POS_TO_ORIENTATION[pos])
        middle = parent.middle()
        self.bound[0][1 - i] = middle[0][1 - i]
        self.bound[1][1 - j] = middle[1][1 - j]

    @classmethod
    def child(cls, parent, i, j):
        return cls(0, 0.0, _child_of=parent, _i=i, _j=j)

    def middle(self):
        """The (u,v) rect belonging to all four children (:108-119)."""
        if self._middle is None:
            size = _size_ij(self.level)
            u = coords.st_to_uv(coords.si_ti_to_st(
                np.float64(2 * self.ij_lo[0] + size)))
            v = coords.st_to_uv(coords.si_ti_to_st(
                np.float64(2 * self.ij_lo[1] + size)))
            self._middle = [[u - self.padding, u + self.padding],
                            [v - self.padding, v + self.padding]]
        return self._middle

    def get_child_ij(self, pos):
        """(i, j) of the child at Hilbert traversal position (:124-128)."""
        ij = int(POS_TO_IJ[self.orientation][pos])
        return ij >> 1, ij & 1

    def shrink_to_fit(self, rect):
        """Smallest cell containing all descendants whose bounds
        intersect rect (:143-183)."""
        size = _size_ij(self.level)
        if self.level == 0:
            if (rect[0][0] <= 0 <= rect[0][1]) \
                    or (rect[1][0] <= 0 <= rect[1][1]):
                return self.id
        else:
            u = coords.st_to_uv(coords.si_ti_to_st(
                np.float64(2 * self.ij_lo[0] + size)))
            v = coords.st_to_uv(coords.si_ti_to_st(
                np.float64(2 * self.ij_lo[1] + size)))
            if (rect[0][0] <= u <= rect[0][1]) \
                    or (rect[1][0] <= v <= rect[1][1]):
                return self.id
        eps = float(np.finfo(np.float64).eps)
        pad = self.padding + 1.5 * eps
        padded = [[rect[0][0] - pad, rect[0][1] + pad],
                  [rect[1][0] - pad, rect[1][1] + pad]]
        ij_min = [0, 0]
        ij_xor = [0, 0]
        for d in range(2):
            lo = int(coords.st_to_ij(coords.uv_to_st(padded[d][0])))
            hi = int(coords.st_to_ij(coords.uv_to_st(padded[d][1])))
            ij_min[d] = max(self.ij_lo[d], lo)
            ij_max = min(self.ij_lo[d] + size - 1, hi)
            ij_xor[d] = ij_min[d] ^ ij_max
        level_msb = ((ij_xor[0] | ij_xor[1]) << 1) + 1
        level = MAX_LEVEL - int(math.floor(math.log2(level_msb)))
        if level <= self.level:
            return self.id
        face = int(self.id >> np.uint64(61))
        leaf = ci.from_face_ij(np.int64([face]), np.int64([ij_min[0]]),
                               np.int64([ij_min[1]]))[0]
        return ci.parent(np.uint64(leaf), level)

    def get_center(self):
        size = _size_ij(self.level)
        face = int(self.id >> np.uint64(61))
        p = np.array(coords.face_si_ti_to_xyz(
            face, np.float64(2 * self.ij_lo[0] + size),
            np.float64(2 * self.ij_lo[1] + size)), dtype=np.float64)
        return p / np.linalg.norm(p)

    def get_entry_vertex(self):
        """Vertex where the space-filling curve enters (:194-205)."""
        i, j = self.ij_lo
        if self.orientation & INVERT_MASK:
            size = _size_ij(self.level)
            i += size
            j += size
        face = int(self.id >> np.uint64(61))
        p = np.array(coords.face_si_ti_to_xyz(
            face, np.float64(2 * i), np.float64(2 * j)), dtype=np.float64)
        return p / np.linalg.norm(p)

    def get_exit_vertex(self):
        """Vertex where the space-filling curve exits (:208-220)."""
        i, j = self.ij_lo
        size = _size_ij(self.level)
        if self.orientation == 0 \
                or self.orientation == SWAP_MASK + INVERT_MASK:
            i += size
        else:
            j += size
        face = int(self.id >> np.uint64(61))
        p = np.array(coords.face_si_ti_to_xyz(
            face, np.float64(2 * i), np.float64(2 * j)), dtype=np.float64)
        return p / np.linalg.norm(p)
