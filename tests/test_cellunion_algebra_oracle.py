"""Cell-union set algebra vs the atom-set model (the geo_cell_union_ops
oracle's premise): for unions built from same-level atoms,
union/intersect/difference must equal the canonical normalized form of
the corresponding atom-set UNION/INTERSECT/EXCEPT — in particular the
intersect sweep's output must already be canonical (s2cell_union.d
claims the result is normalized when both inputs are)."""

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import cellunion as cu


def _atoms(cells, level):
    """Expand a normalized union (levels <= level) to its atom set."""
    return set(cu.denormalize(cells, level).tolist())


def _rand_union(rng, level, n):
    """Random distinct atoms at `level` (biased into few faces so
    sibling fusion actually happens)."""
    face = rng.integers(0, 2)
    leaf = ci.cellid_from_latlng(
        rng.uniform(-60, 60, n), rng.uniform(face * 60, face * 60 + 90, n))
    return np.unique(ci.parent(leaf, level))


@pytest.mark.parametrize("level", [2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_algebra_matches_atom_sets(level, seed):
    rng = np.random.default_rng(seed)
    n = 4 ** level * 3
    a = cu.normalize(_rand_union(rng, level, n))
    b = cu.normalize(_rand_union(rng, level, n))
    sa, sb = _atoms(a, level), _atoms(b, level)
    for op, got, want in (
            ("union", cu.union(a, b), sa | sb),
            ("intersect", cu.intersect(a, b), sa & sb),
            ("difference", cu.difference(a, b), sa - sb)):
        want_cells = cu.normalize(np.array(sorted(want),
                                           dtype=np.uint64)) \
            if want else np.array([], dtype=np.uint64)
        assert got.tolist() == sorted(want_cells.tolist()), op
        # output is canonical: re-normalizing is a no-op
        assert cu.normalize(got).tolist() == sorted(got.tolist()), op


def test_intersect_output_is_normalized_nested_levels():
    # A holds a fused parent, B holds exactly its four children plus a
    # stray sibling-set -> intersect emits b-cells; must stay canonical.
    base = ci.cellid_from_latlng(np.array([10.0]), np.array([10.0]))
    p = ci.parent(base, 5)[0]
    kids = np.array([ci.child(np.uint64([p]), k)[0] for k in range(4)],
                    dtype=np.uint64)
    a = cu.normalize(np.uint64([p]))
    b = cu.normalize(kids)  # fuses back to p
    got = cu.intersect(a, b)
    assert got.tolist() == [int(p)]
    # and with B NOT fully covering: 3 children only
    b3 = np.sort(kids[:3])
    got3 = cu.intersect(a, b3)
    assert got3.tolist() == sorted(b3.tolist())
    assert cu.normalize(got3).tolist() == sorted(b3.tolist())
