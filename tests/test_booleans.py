"""Boolean-operation semantics: point classification satisfies the
algebraic identities the reference tests assert (A∪B ⊇ A, A∩B ⊆ A,
A\\B ∩ B = ∅, xor = union minus intersection — s2polygon_test.d
Relations/Operations), and covering algebra / border stitching round-trip."""

from __future__ import annotations

import numpy as np

from s2geometry_d_ray.core import booleans as bo
from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import cellunion as cu
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon

RNG = np.random.default_rng(4)


def _two_overlapping():
    a = Polygon([Loop.make_regular(10.0, 20.0, 0.02, 64)])
    b = Polygon([Loop.make_regular(10.0, 20.018, 0.02, 64)])
    return a, b


def _sample_points(n=4000):
    from tests.test_geometry import sample_in_cap
    from s2geometry_d_ray.core import coords
    cx, cy, cz = coords.latlng_to_xyz(10.0, 20.009)
    return sample_in_cap(np.array([float(cx), float(cy), float(cz)]),
                         0.06, n, RNG)


def test_boolean_point_identities():
    a, b = _two_overlapping()
    pts = _sample_points()
    in_a = a.contains_points(pts)
    in_b = b.contains_points(pts)
    un = bo.contains_points_bool(bo.UNION, a, b, pts)
    it = bo.contains_points_bool(bo.INTERSECTION, a, b, pts)
    df = bo.contains_points_bool(bo.DIFFERENCE, a, b, pts)
    xr = bo.contains_points_bool(bo.SYMMETRIC_DIFFERENCE, a, b, pts)
    assert (un >= in_a).all() and (un >= in_b).all()        # A∪B ⊇ A,B
    assert (it <= in_a).all() and (it <= in_b).all()        # A∩B ⊆ A,B
    assert not (df & in_b).any()                            # (A\B)∩B = ∅
    assert (xr == (un & ~it)).all()                         # xor identity
    assert it.any() and df.any() and (un & ~in_a).any()     # non-trivial


def test_boolean_covering_algebra():
    a, b = _two_overlapping()
    level = 13
    un = bo.boolean_covering(bo.UNION, a, b, level=level)
    it = bo.boolean_covering(bo.INTERSECTION, a, b, level=level)
    df = bo.boolean_covering(bo.DIFFERENCE, a, b, level=level)
    assert len(un) and len(it) and len(df)
    # Raster identities on leaf counts: |A∪B| = |A| + |B| - |A∩B|.
    ca = cu.denormalize(bo.covering_for(a, min_level=level,
                                        max_level=level, max_cells=256),
                        level)
    cb = cu.denormalize(bo.covering_for(b, min_level=level,
                                        max_level=level, max_cells=256),
                        level)
    n = cu.leaf_cells_covered
    assert n(un) == n(np.sort(ca)) + n(np.sort(cb)) - n(it)
    assert n(df) == n(np.sort(ca)) - n(it)
    # Intersection cells lie inside both coverings.
    assert cu.contains_ids(np.sort(ca), it).all()
    assert cu.contains_ids(np.sort(cb), it).all()


def test_cell_union_border_rings():
    # A 2x2 block of sibling cells -> border is the parent's boundary:
    # one ring of 8 corner points (4 corners + 4 edge midpoints).
    leaf = ci.cellid_from_latlng(np.float64([5.0]), np.float64([5.0]))[0]
    parent = ci.parent(np.uint64([leaf]), 10)[0]
    kids = np.array([ci.child(np.uint64([parent]), k)[0]
                     for k in range(4)], dtype=np.uint64)
    rings = bo.cell_union_border_rings(kids)
    assert len(rings) == 1
    assert len(rings[0]) == 8
    # Every ring vertex must be a corner of the parent cell grid; the ring
    # must enclose the parent's center.
    from s2geometry_d_ray.core.cell import Cell
    center = Cell(int(parent)).center()
    ring_loop = Loop(rings[0])
    assert ring_loop.contains_point(center) or \
        Loop(rings[0][::-1]).contains_point(center)
    # An L-shape (3 cells) -> one ring with 8 segments as well.
    rings3 = bo.cell_union_border_rings(kids[:3])
    assert len(rings3) == 1
