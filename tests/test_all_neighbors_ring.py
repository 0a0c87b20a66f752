"""Vectorized all_neighbors_ring == scalar all_neighbors (as SETS,
duplicates allowed in the vector form) — including the adversarial
face-corner cells where only 7 distinct neighbors exist."""

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci


def _corner_cells(lvl):
    """Cells touching every cube-face corner at this level."""
    size = 1 << (ci.MAX_LEVEL - lvl)
    out = []
    for face in range(6):
        for i in (0, ci.MAX_SIZE - size):
            for j in (0, ci.MAX_SIZE - size):
                leaf = ci.from_face_ij(np.int64(face),
                                       np.int64([i]), np.int64([j]))
                out.append(int(ci.parent(leaf, lvl)[0]))
    return np.array(sorted(set(out)), dtype=np.uint64)


@pytest.mark.parametrize("lvl", [1, 2, 4, 8, 15, 22])
def test_ring_matches_scalar_random_and_corners(lvl):
    rng = np.random.default_rng(lvl)
    p = rng.normal(size=(60, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    cells = np.unique(ci.parent(
        ci.cellid_from_xyz(p[:, 0], p[:, 1], p[:, 2]), lvl))
    cells = np.unique(np.concatenate([cells, _corner_cells(lvl)]))
    ring = ci.all_neighbors_ring(cells, lvl)
    for k, c in enumerate(cells.tolist()):
        want = set(ci.all_neighbors(np.uint64(c), lvl).tolist())
        got = set(ring[k].tolist())
        assert got == want, (lvl, hex(c))
