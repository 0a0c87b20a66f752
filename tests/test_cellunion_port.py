"""Port of the reference S2CellUnion suite (test/s2/s2cell_union_test.d):
validity/normalization, the randomized Normalize harness exercising
contains/intersects/union/intersection/difference identities, fromMinMax /
fromBeginEnd range tiling, leafCellsCovered, and the cap-covering Expand
sweep."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import cellunion as cu
from s2geometry_d_ray.core.cap import Cap
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.coverer import RegionCoverer
from s2geometry_d_ray.core.edge import chord2_to_radians, edge_distances2
from s2geometry_d_ray.core.metrics import AVG_AREA, MAX_DIAG, MIN_WIDTH

MAX_LEVEL = 30


def _face(f):
    return np.uint64((f << 61) | (1 << 60))


def _leaf_from_point(x, y, z):
    return int(ci.cellid_from_xyz(np.array([float(x)]), np.array([float(y)]),
                                  np.array([float(z)]))[0])


def test_validity_and_normalization_flags():
    """s2cell_union_test.d:54-96."""
    assert cu.is_valid(np.array([], dtype=np.uint64))
    lid = _leaf_from_point(1, 0, 0)
    assert not cu.is_valid(np.array([lid, lid], dtype=np.uint64))
    pid = ci.parent_scalar(lid, 10)
    assert not cu.is_valid(np.array(
        [pid, int(ci.prev_id(np.uint64(pid)))], dtype=np.uint64))
    assert not cu.is_valid(np.array([0], dtype=np.uint64))  # none()
    children = np.array([ci.child_scalar(pid, k) for k in range(4)],
                        dtype=np.uint64)
    assert cu.is_valid(children)
    assert not cu.is_normalized(children)
    assert cu.is_normalized(cu.normalize(children))
    assert list(cu.normalize(children)) == [pid]


def _add_cells(cid, selected, input_ids, expected, rng):
    """addCells (s2cell_union_test.d:98-164)."""
    if cid is None:
        for face in range(6):
            _add_cells(int(_face(face)), False, input_ids, expected, rng)
        return
    level = ci.level_scalar(cid)
    if level == MAX_LEVEL:
        assert selected
        input_ids.append(cid)
        return
    if not selected and rng.integers(0, MAX_LEVEL - level) == 0:
        expected.append(cid)
        selected = True
    added = False
    if selected and rng.integers(0, 6) != 0:
        input_ids.append(cid)
        added = True
    num_children = 0
    for pos in range(4):
        child = ci.child_scalar(cid, pos)
        if rng.integers(0, 12 if selected else 4) == 0 and num_children < 3:
            _add_cells(child, selected, input_ids, expected, rng)
            num_children += 1
        if selected and not added:
            _add_cells(child, selected, input_ids, expected, rng)


def test_normalize_randomized():
    """The randomized Normalize harness with the set-operation identities
    (s2cell_union_test.d:166-282; 500 of the reference's 2000 iterations).
    """
    rng = np.random.default_rng(20260817)
    for _ in range(500):
        input_ids, expected = [], []
        _add_cells(None, False, input_ids, expected, rng)
        expected = sorted(expected)
        union = cu.normalize(np.array(input_ids, dtype=np.uint64))
        assert list(union) == expected

        # Cap bound covers every cell.
        cap = Cap.empty()
        for cid in union:
            cap.add_cap(Cell(cid).get_cap_bound())
        for cid in union:
            assert cap.contains_cell(Cell(cid))

        # contains / intersects per input id.
        arr = union
        for iid in input_ids:
            u = np.uint64(iid)
            assert cu.contains_ids(arr, np.array([iid], dtype=np.uint64))[0]
            assert cu.intersects_ids(arr,
                                     np.array([iid], dtype=np.uint64))[0]
            if ci.level_scalar(iid) > 0:
                par = ci.parent_scalar(iid, ci.level_scalar(iid) - 1)
                assert cu.intersects_ids(
                    arr, np.array([par], dtype=np.uint64))[0]
                if ci.level_scalar(iid) > 1:
                    par2 = ci.parent_scalar(iid, ci.level_scalar(iid) - 2)
                    par0 = ci.parent_scalar(iid, 0)
                    assert cu.intersects_ids(
                        arr, np.array([par2], dtype=np.uint64))[0]
                    assert cu.intersects_ids(
                        arr, np.array([par0], dtype=np.uint64))[0]
            if ci.level_scalar(iid) < MAX_LEVEL:
                cb = int(ci.child_begin(u, ci.level_scalar(iid) + 1))
                ce = int(ci.prev_id(ci.child_end(u,
                                                 ci.level_scalar(iid) + 1)))
                leaf = int(ci.child_begin(u, MAX_LEVEL))
                for q in (cb, ce, leaf):
                    assert cu.contains_ids(
                        arr, np.array([q], dtype=np.uint64))[0]
        for eid in expected:
            if ci.level_scalar(eid) > 0:
                par = ci.parent_scalar(eid, ci.level_scalar(eid) - 1)
                par0 = ci.parent_scalar(eid, 0)
                assert not cu.contains_ids(
                    arr, np.array([par], dtype=np.uint64))[0]
                assert not cu.contains_ids(
                    arr, np.array([par0], dtype=np.uint64))[0]

        # Set-operation identities over random subsets.
        x, y, x_or_y = [], [], []
        for iid in input_ids:
            in_x = rng.integers(0, 2) == 0
            in_y = rng.integers(0, 2) == 0
            if in_x:
                x.append(iid)
            if in_y:
                y.append(iid)
            if in_x or in_y:
                x_or_y.append(iid)
        xcells = cu.normalize(np.array(x, dtype=np.uint64))
        ycells = cu.normalize(np.array(y, dtype=np.uint64))
        x_or_y_expected = cu.normalize(np.array(x_or_y, dtype=np.uint64))
        x_or_y_cells = cu.union(xcells, ycells)
        assert list(x_or_y_cells) == list(x_or_y_expected)

        x_and_y_cells = cu.intersect(xcells, ycells)
        x_minus_y = cu.difference(xcells, ycells)
        y_minus_x = cu.difference(ycells, xcells)
        assert cu.contains_ids(xcells, x_minus_y).all() \
            if len(x_minus_y) else True
        assert not (cu.intersects_ids(ycells, x_minus_y).any()
                    if len(x_minus_y) and len(ycells) else False)
        assert cu.contains_ids(ycells, y_minus_x).all() \
            if len(y_minus_x) else True
        assert not (cu.intersects_ids(xcells, y_minus_x).any()
                    if len(y_minus_x) and len(xcells) else False)
        if len(x_minus_y) and len(y_minus_x):
            assert not cu.intersects_ids(cu.normalize(x_minus_y),
                                         y_minus_x).any()
        diff_int_union = cu.union(cu.union(x_minus_y, y_minus_x),
                                  x_and_y_cells)
        assert list(diff_int_union) == list(x_or_y_cells)

        # contains/intersects vs a brute-force check over fresh cells.
        test_ids, dummy = [], []
        _add_cells(None, False, test_ids, dummy, rng)
        for tid in test_ids:
            contains = False
            intersects = False
            for eid in expected:
                if ci.contains(np.array([eid], dtype=np.uint64),
                               np.array([tid], dtype=np.uint64))[0]:
                    contains = True
                if ci.intersects(np.array([eid], dtype=np.uint64),
                                 np.array([tid], dtype=np.uint64))[0]:
                    intersects = True
            assert bool(cu.contains_ids(
                arr, np.array([tid], dtype=np.uint64))[0]) == contains
            assert bool(cu.intersects_ids(
                arr, np.array([tid], dtype=np.uint64))[0]) == intersects


def _check_from_min_max(min_id, max_id):
    """s2cell_union_test.d:390-401."""
    ids = cu.from_min_max(min_id, max_id)
    assert len(ids) > 0
    assert int(ci.range_min(ids[0])) == int(min_id)
    assert int(ci.range_max(ids[-1])) == int(max_id)
    for i in range(1, len(ids)):
        assert int(ci.range_min(ids[i])) == \
            int(ci.next_id(ci.range_max(ids[i - 1])))
    assert cu.is_normalized(ids)


def test_from_min_max():
    """s2cell_union_test.d:403-422."""
    face0 = _face(0)
    _check_from_min_max(int(ci.range_min(face0)), int(ci.range_min(face0)))
    _check_from_min_max(int(ci.range_min(face0)), int(ci.range_max(face0)))
    face5 = _face(5)
    _check_from_min_max(int(ci.range_min(face5)), int(ci.range_max(face5)))
    _check_from_min_max(int(ci.range_max(face5)), int(ci.range_max(face5)))
    rng = np.random.default_rng(5)
    for _ in range(100):
        p = rng.normal(size=(2, 3))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        x = _leaf_from_point(*p[0])
        y = _leaf_from_point(*p[1])
        if x > y:
            x, y = y, x
        _check_from_min_max(x, y)


def test_from_begin_end():
    """s2cell_union_test.d:424-448."""
    id_begin = int(ci.range_min(_face(0)))
    assert len(cu.from_begin_end(id_begin, id_begin)) == 0
    id_end = int(ci.next_id(ci.range_max(_face(5))))
    assert len(cu.from_begin_end(id_end, id_end)) == 0
    ids = cu.from_begin_end(id_begin, id_end)
    assert len(ids) == 6
    assert all(ci.level_scalar(int(i)) == 0 for i in ids)


def test_empty_union():
    """s2cell_union_test.d:450-494 (functional-API form)."""
    empty = np.array([], dtype=np.uint64)
    face1 = np.array([_face(1)], dtype=np.uint64)
    assert len(cu.normalize(empty)) == 0
    assert len(cu.denormalize(empty, 0, 2)) == 0
    assert not cu.contains_ids(empty, face1)[0]
    assert not (cu.intersects_ids(empty, face1)[0] if len(empty) else False)
    assert len(cu.union(empty, empty)) == 0
    assert len(cu.intersect(empty, face1)) == 0
    assert len(cu.difference(empty, empty)) == 0
    assert len(cu.expand_radius(empty, 1.0, 20)) == 0
    assert len(cu.expand_level(empty, 10)) == 0


def test_leaf_cells_covered():
    """s2cell_union_test.d:538-572."""
    assert cu.leaf_cells_covered(np.array([], dtype=np.uint64)) == 0
    ids = [int(ci.child_begin(_face(0), MAX_LEVEL))]
    assert cu.leaf_cells_covered(
        cu.normalize(np.array(ids, dtype=np.uint64))) == 1
    ids.append(int(_face(0)))
    union = cu.normalize(np.array(ids, dtype=np.uint64))
    assert cu.leaf_cells_covered(union) == 1 << 60
    union = cu.expand_level(union, 0)
    assert cu.leaf_cells_covered(union) == 5 << 60
    union = cu.expand_level(union, 0)
    assert cu.leaf_cells_covered(union) == 6 << 60

    ids += [int(ci.child_begin(_face(1), 1)),
            int(ci.child_begin(_face(2), 2)),
            int(ci.prev_id(ci.child_end(_face(2), 2))),
            int(ci.child_begin(_face(3), 14)),
            int(ci.child_begin(_face(4), 27)),
            int(ci.prev_id(ci.child_end(_face(4), 15))),
            int(ci.child_begin(_face(5), 30))]
    union = cu.normalize(np.array(ids, dtype=np.uint64))
    expected = (1 + (1 << 6) + (1 << 30) + (1 << 32) + (2 << 56)
                + (1 << 58) + (1 << 60))
    assert cu.leaf_cells_covered(union) == expected


def _covering_radius(ids, axis):
    """Max geodesic distance from axis to the covering
    (s2cell_union_test.d:286-311)."""
    axis = np.asarray(axis, dtype=np.float64)

    def angle(p):
        # atan2(|p x axis|, p . axis): accurate for tiny angles, unlike
        # acos(dot) (the reference's S2Point.angle).
        return math.atan2(float(np.linalg.norm(np.cross(p, axis))),
                          float(p @ axis))

    max_dist = 0.0
    for cid in ids:
        cell = Cell(cid)
        for j in range(4):
            a = np.asarray(cell.vertex(j))
            b = np.asarray(cell.vertex((j + 1) & 3))
            if angle(a) > math.pi / 2 or angle(b) > math.pi / 2:
                d2 = edge_distances2((-axis)[None, :], a[None, :],
                                     b[None, :])
                dist = math.pi - chord2_to_radians(float(d2[0, 0]))
            else:
                dist = angle(a)
            max_dist = max(max_dist, dist)
    return max_dist


def test_expand():
    """Cap coverings expanded by random radii still cover the expanded cap
    (s2cell_union_test.d:313-361; 200 of the reference's 1000 iterations).
    """
    rng = np.random.default_rng(29)
    for _ in range(200):
        # Random cap with area log-uniform between the min and full sphere.
        min_area = AVG_AREA.get_value(MAX_LEVEL)
        cap_area = min_area * math.exp(
            rng.random() * math.log(4 * math.pi / min_area))
        center = rng.normal(size=3)
        center /= np.linalg.norm(center)
        cap = Cap.from_center_height(tuple(center),
                                     cap_area / (2 * math.pi))
        expanded_cap = Cap.from_center_height(
            tuple(center), min(2.0, (100.0 ** rng.random())
                               * cap.height()))
        radius = expanded_cap.radius_radians() - cap.radius_radians()
        max_level_diff = int(rng.integers(0, 8))

        coverer = RegionCoverer(max_cells=1 + int(rng.integers(
            0, 2 ** int(rng.integers(0, 11)))))
        covering = np.asarray(coverer.get_covering(cap), dtype=np.uint64)
        # Valid covering: cells cover the cap.
        for cid in covering:
            assert cap.may_intersect_cell(Cell(cid))
        covering_radius = _covering_radius(covering, center)

        min_level = min(ci.level_scalar(int(c)) for c in covering)
        expand_level = min(min_level + max_level_diff,
                           MIN_WIDTH.get_level_for_min_value(radius))

        expanded = cu.expand_radius(covering, radius, max_level_diff)
        expanded_covering_radius = _covering_radius(
            np.asarray(expanded, dtype=np.uint64), center)
        # The covering radius can grow by at most two cell diagonals.
        assert expanded_covering_radius - covering_radius <= \
            2 * MAX_DIAG.get_value(expand_level)
