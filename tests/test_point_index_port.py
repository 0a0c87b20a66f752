"""Port of test/s2/s2point_index_test.d: contents verification for 1000
random points and the full iterator-method sweep (prev at begin, seek
into skipped leaf-cell ranges, prev/next/seek consistency)."""

from collections import Counter

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import cellunion
from s2geometry_d_ray.core.knn import PointIndex, PointIndexIterator

MAX_LEVEL = 30
BEGIN_LEAF = int(ci.from_face_ij_scalar(0, 0, 0)) & ~1 | 1  # first leaf


def _first_leaf():
    # S2CellId.begin(MAX_LEVEL): face 0, position 0, leaf level
    return (0 << 61) | 1


def _check_iterator_methods(index):
    it = PointIndexIterator(index)
    assert not it.prev()
    it.finish()
    assert it.done()

    prev_cellid = None
    min_cellid = _first_leaf()
    it.begin()
    k = 0
    while not it.done():
        k += 1
        cellid = it.id()
        p = it.point()
        leaf = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                      np.array([p[2]]))[0])
        assert cellid == leaf

        it2 = PointIndexIterator(index)
        if cellid == prev_cellid:
            it2.seek(cellid)

        # Seeking to any empty leaf cell between the previous entry and
        # this one lands on this entry.
        if min_cellid < cellid and k % 20 == 0:
            skipped = cellunion.from_begin_end(min_cellid, ci.range_min(
                np.uint64(cellid)))
            for skipped_id in np.asarray(skipped, dtype=np.uint64)[:50]:
                it2.seek(int(skipped_id))
                assert not it2.done() and it2.id() == cellid
        if prev_cellid is not None:
            it2 = it.copy()
            assert it2.prev()
            assert it2.id() == prev_cellid
            it2.next()
            assert it2.id() == cellid
            it2.seek(prev_cellid)
            assert it2.id() == prev_cellid
        prev_cellid = cellid
        min_cellid = int(ci.range_max(np.uint64(cellid))) + 1
        it.next()


def test_no_points():
    index = PointIndex(np.empty(0), np.empty(0), np.empty(0))
    _check_iterator_methods(index)


def test_random_points():
    rng = np.random.default_rng(29)
    pts = rng.normal(size=(1000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    data = rng.integers(0, 100, size=1000)
    index = PointIndex(pts[:, 0], pts[:, 1], pts[:, 2], data)

    # Contents: every (point, data) pair present exactly once.
    expected = Counter(
        (round(x, 15), round(y, 15), round(z, 15), int(d))
        for (x, y, z), d in zip(pts, data))
    actual = Counter()
    it = PointIndexIterator(index)
    while not it.done():
        p = it.point()
        actual[(round(p[0], 15), round(p[1], 15), round(p[2], 15),
                it.data())] += 1
        it.next()
    assert actual == expected

    _check_iterator_methods(index)
