"""Port of the reference S2Cell suite (test/s2/s2cell_test.d): face-cell
topology, the recursive Subdivide sweep with the full metric-bound checks,
cell-vs-loop rect bounds, near-edge containment consistency, and the
point/edge/cell distance methods verified against brute force."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords, metrics
from s2geometry_d_ray.core.cap import Cap, chord2_sub
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.edge import (edge_distances2, interpolate,
                                        max_distance2)
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.predicates import crossing_sign
from s2geometry_d_ray.core.rect import BOUNDER_MAX_ERROR

MAX_LEVEL = 30
DBL_EPS = 2.220446049250313e-16


def _face_cell(face):
    return Cell(np.uint64((face << 61) | (1 << 60)))


def _angle(p, q):
    return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                      float(np.dot(p, q)))


def _chord2_to_rad(c2):
    return 2.0 * math.asin(0.5 * math.sqrt(min(4.0, max(0.0, c2))))


def _random_cell_id(rng, level=None):
    p = rng.normal(size=3)
    p /= np.linalg.norm(p)
    leaf = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                  np.array([p[2]]))[0])
    if level is None:
        level = int(rng.integers(0, MAX_LEVEL + 1))
    return ci.parent_scalar(leaf, level)


def _random_point(rng):
    p = rng.normal(size=3)
    return p / np.linalg.norm(p)


def _sample_point_in_cap(cap, rng):
    """Uniform sample within a cap (S2Testing.samplePoint)."""
    z = np.asarray(cap.center, dtype=np.float64)
    x = np.asarray(coords.get_frame(z))
    h = max(0.0, cap.height())
    cos_theta = 1 - h * rng.random()
    sin_theta = math.sqrt(max(0.0, 1 - cos_theta * cos_theta))
    phi = 2 * math.pi * rng.random()
    q = np.array([sin_theta * math.cos(phi), sin_theta * math.sin(phi),
                  cos_theta])
    p = x @ q
    return p / np.linalg.norm(p)


def test_faces():
    """s2cell_test.d:50-80."""
    edge_counts = {}
    vertex_counts = {}
    for face in range(6):
        cell = _face_cell(face)
        assert cell.face == face
        assert cell.level == 0
        _, _, _, orientation = ci.to_face_ij(
            np.uint64([cell.id]), return_orientation=True)
        assert int(orientation[0]) == (face & 1)  # SWAP_MASK alternation
        for k in range(4):
            er = cell.edge_raw(k)
            vr = cell.vertex_raw(k)
            edge_counts[tuple(round(c, 14) for c in er)] = \
                edge_counts.get(tuple(round(c, 14) for c in er), 0) + 1
            vertex_counts[tuple(round(c, 14) for c in vr)] = \
                vertex_counts.get(tuple(round(c, 14) for c in vr), 0) + 1
            assert float(np.dot(vr, er)) == pytest.approx(0.0, abs=1e-12)
            assert float(np.dot(cell.vertex_raw((k + 1) & 3), er)) == \
                pytest.approx(0.0, abs=1e-12)
            cr = np.cross(cell.vertex_raw(k), cell.vertex_raw((k + 1) & 3))
            cr = cr / np.linalg.norm(cr)
            en = np.asarray(er) / np.linalg.norm(er)
            assert float(np.dot(cr, en)) == pytest.approx(1.0, abs=1e-12)
    assert all(c == 2 for c in edge_counts.values())
    assert all(c == 3 for c in vertex_counts.values())


class _LevelStats:
    def __init__(self):
        self.count = 0.0
        self.min_area, self.max_area, self.avg_area = 100.0, 0.0, 0.0
        self.min_width, self.max_width, self.avg_width = 100.0, 0.0, 0.0
        self.min_edge, self.max_edge, self.avg_edge = 100.0, 0.0, 0.0
        self.max_edge_aspect = 0.0
        self.min_diag, self.max_diag, self.avg_diag = 100.0, 0.0, 0.0
        self.max_diag_aspect = 0.0
        self.min_angle_span, self.max_angle_span = 100.0, 0.0
        self.avg_angle_span = 0.0
        self.min_approx_ratio, self.max_approx_ratio = 100.0, 0.0


def _gather_stats(cell, level_stats):
    """s2cell_test.d:93-140."""
    s = level_stats[cell.level]
    exact_area = cell.exact_area()
    approx_area = cell.approx_area()
    min_edge = min_width = min_diag = min_angle_span = 100.0
    max_edge = max_width = max_diag = max_angle_span = 0.0
    avg_edge = 0.0
    for i in range(4):
        edge = _angle(cell.vertex_raw(i), cell.vertex_raw((i + 1) & 3))
        min_edge, max_edge = min(edge, min_edge), max(edge, max_edge)
        avg_edge += 0.25 * edge
        mid = np.asarray(cell.vertex_raw(i)) \
            + np.asarray(cell.vertex_raw((i + 1) & 3))
        width = 0.5 * math.pi - _angle(mid, cell.edge_raw((i + 2) & 3))
        min_width, max_width = min(width, min_width), max(width, max_width)
        if i < 2:
            diag = _angle(cell.vertex_raw(i), cell.vertex_raw((i + 2) & 3))
            min_diag, max_diag = min(diag, min_diag), max(diag, max_diag)
            span = _angle(cell.edge_raw(i),
                          tuple(-c for c in cell.edge_raw((i + 2) & 3)))
            min_angle_span = min(span, min_angle_span)
            max_angle_span = max(span, max_angle_span)
    s.count += 1
    s.min_area = min(exact_area, s.min_area)
    s.max_area = max(exact_area, s.max_area)
    s.avg_area += exact_area
    s.min_width = min(min_width, s.min_width)
    s.max_width = max(max_width, s.max_width)
    s.avg_width += 0.5 * (min_width + max_width)
    s.min_edge = min(min_edge, s.min_edge)
    s.max_edge = max(max_edge, s.max_edge)
    s.avg_edge += avg_edge
    s.max_edge_aspect = max(max_edge / min_edge, s.max_edge_aspect)
    s.min_diag = min(min_diag, s.min_diag)
    s.max_diag = max(max_diag, s.max_diag)
    s.avg_diag += 0.5 * (min_diag + max_diag)
    s.max_diag_aspect = max(max_diag / min_diag, s.max_diag_aspect)
    s.min_angle_span = min(min_angle_span, s.min_angle_span)
    s.max_angle_span = max(max_angle_span, s.max_angle_span)
    s.avg_angle_span += 0.5 * (min_angle_span + max_angle_span)
    ratio = approx_area / exact_area
    s.min_approx_ratio = min(ratio, s.min_approx_ratio)
    s.max_approx_ratio = max(ratio, s.max_approx_ratio)


def _test_subdivide(cell, level_stats, rng):
    """s2cell_test.d:142-263 (random subsampling below level 5)."""
    _gather_stats(cell, level_stats)
    if cell.level == MAX_LEVEL:
        return
    children = cell.children()
    child_id = int(ci.child_begin(np.uint64(cell.id),
                                  cell.level + 1))
    exact_area = approx_area = average_area = 0.0
    k_max_size_uv = 0.3964182625366691
    special_uv = [(DBL_EPS, DBL_EPS), (DBL_EPS, 1.0), (1.0, 1.0),
                  (k_max_size_uv, k_max_size_uv), (DBL_EPS, k_max_size_uv)]
    for i in range(4):
        child = children[i]
        exact_area += child.exact_area()
        approx_area += child.approx_area()
        average_area += child.average_area()
        assert child.id == child_id
        x, y, z = ci.to_xyz(np.uint64([child_id]))
        assert _angle(child.center(),
                      (float(x[0]), float(y[0]), float(z[0]))) < 1e-15
        direct = Cell(np.uint64(child_id))
        assert direct.face == child.face
        assert direct.level == child.level
        for k in range(4):
            assert tuple(direct.vertex_raw(k)) == tuple(child.vertex_raw(k))
            assert tuple(direct.edge_raw(k)) == tuple(child.edge_raw(k))

        # Containment relations.
        assert cell.contains_cell(child)
        assert cell.may_intersect_cell(child)
        assert not child.contains_cell(cell)
        assert cell.contains_point(child.center())
        for j in range(4):
            assert cell.contains_point(child.vertex_raw(j))
            if j != i:
                assert not child.contains_point(children[j].center())
                assert not child.may_intersect_cell(children[j])

        # Cap and rect bounds.
        parent_cap = cell.get_cap_bound()
        parent_rect = cell.get_rect_bound()
        if cell.contains_point((0.0, 0.0, 1.0)) \
                or cell.contains_point((0.0, 0.0, -1.0)):
            assert parent_rect.lng.is_full()
        child_cap = child.get_cap_bound()
        child_rect = child.get_rect_bound()
        assert child_cap.contains_point(child.center())
        assert child_rect.contains_point(child.center())
        assert parent_cap.contains_point(child.center())
        assert parent_rect.contains_point(child.center())
        for j in range(4):
            v = child.vertex(j)
            assert child_cap.contains_point(v)
            assert child_rect.contains_point(v)
            assert child_rect.contains_point(child.vertex_raw(j))
            assert parent_cap.contains_point(v)
            assert parent_rect.contains_point(v)
            assert parent_rect.contains_point(child.vertex_raw(j))
            if j != i:
                # Bounds should exclude >= 2 vertices of adjacent cells.
                cap_count = sum(
                    1 for k in range(4)
                    if child_cap.contains_point(children[j].vertex(k)))
                rect_count = sum(
                    1 for k in range(4)
                    if child_rect.contains_point(children[j].vertex_raw(k)))
                assert cap_count <= 2
                if child_rect.lat_lo > -0.5 * math.pi \
                        and child_rect.lat_hi < 0.5 * math.pi:
                    assert rect_count <= 2

        force = any(child.u_lo <= uv[0] <= child.u_hi
                    and child.v_lo <= uv[1] <= child.v_hi
                    for uv in special_uv)
        if force or cell.level < 5 or rng.integers(0, 5) == 0:
            _test_subdivide(child, level_stats, rng)
        child_id = int(ci.next_id(np.uint64(child_id)))

    # Child areas sum to the parent area.
    assert abs(math.log(exact_area / cell.exact_area())) <= \
        abs(math.log(1 + 1e-6))
    assert abs(math.log(approx_area / cell.approx_area())) <= \
        abs(math.log(1.03))
    assert abs(math.log(average_area / cell.average_area())) <= \
        abs(math.log(1 + 1e-15))


def _check_min_max_avg(level, count, abs_error, min_value, max_value,
                       avg_value, min_metric, max_metric, avg_metric):
    """s2cell_test.d:265-305."""
    tolerance = (max_metric.get_value(level) - min_metric.get_value(level)) \
        / math.sqrt(min(count, 0.5 * float(1 << level)))
    if tolerance == 0:
        tolerance = abs_error
    assert min_metric.get_value(level) <= min_value + abs_error
    assert min_metric.get_value(level) > min_value - tolerance
    assert max_metric.get_value(level) <= max_value + tolerance
    assert max_metric.get_value(level) > max_value - abs_error
    assert avg_metric.get_value(level) == pytest.approx(avg_value,
                                                        abs=10 * tolerance)


def test_subdivide():
    """The recursive subdivide sweep + metric bounds
    (s2cell_test.d:307-380; faces 0, 3, 5 as in the reference)."""
    rng = np.random.default_rng(20260817)
    level_stats = [_LevelStats() for _ in range(MAX_LEVEL + 1)]
    for face in (0, 3, 5):
        _test_subdivide(_face_cell(face), level_stats, rng)
    m = metrics
    for lvl in range(MAX_LEVEL + 1):
        s = level_stats[lvl]
        if s.count == 0:
            continue
        s.avg_area /= s.count
        s.avg_width /= s.count
        s.avg_edge /= s.count
        s.avg_diag /= s.count
        s.avg_angle_span /= s.count
        _check_min_max_avg(lvl, s.count, 1e-15 * s.min_width, s.min_area,
                           s.max_area, s.avg_area, m.MIN_AREA, m.MAX_AREA,
                           m.AVG_AREA)
        _check_min_max_avg(lvl, s.count, 1e-15, s.min_width, s.max_width,
                           s.avg_width, m.MIN_WIDTH, m.MAX_WIDTH,
                           m.AVG_WIDTH)
        _check_min_max_avg(lvl, s.count, 1e-15, s.min_edge, s.max_edge,
                           s.avg_edge, m.MIN_EDGE, m.MAX_EDGE, m.AVG_EDGE)
        _check_min_max_avg(lvl, s.count, 1e-15, s.min_diag, s.max_diag,
                           s.avg_diag, m.MIN_DIAG, m.MAX_DIAG, m.AVG_DIAG)
        _check_min_max_avg(lvl, s.count, 1e-15, s.min_angle_span,
                           s.max_angle_span, s.avg_angle_span,
                           m.MIN_ANGLE_SPAN, m.MAX_ANGLE_SPAN,
                           m.AVG_ANGLE_SPAN)
        assert s.max_edge_aspect <= m.MAX_EDGE_ASPECT + 1e-15 * (1 << lvl)
        assert s.max_diag_aspect <= m.MAX_DIAG_ASPECT + 1e-15 * (1 << lvl)


def test_cell_vs_loop_rect_bound():
    """Cell and loop bounds contain each other within max errors
    (s2cell_test.d:417-443; 300 of 1000 iterations)."""
    cell_err_lat, cell_err_lng = 2 * DBL_EPS, 4 * DBL_EPS
    loop_err_lat, loop_err_lng = BOUNDER_MAX_ERROR
    rng = np.random.default_rng(3)
    for _ in range(300):
        cell = Cell(np.uint64(_random_cell_id(rng)))
        loop = Loop(np.array([cell.vertex(k) for k in range(4)]))
        cell_bound = cell.get_rect_bound()
        loop_bound = loop.bound
        assert loop_bound.expanded(cell_err_lat, cell_err_lng) \
            .contains_rect(cell_bound)
        assert cell_bound.expanded(loop_err_lat, loop_err_lng) \
            .contains_rect(loop_bound)


def test_rect_bound_is_large_enough():
    """Points nearly on a cell edge: contained => bound contains latlng
    (s2cell_test.d:445-461; 300 of 1000 iterations)."""
    rng = np.random.default_rng(5)
    iters = 0
    while iters < 300:
        cell = Cell(np.uint64(_random_cell_id(rng)))
        i = int(rng.integers(0, 4))
        v1 = cell.vertex(i)
        v2 = _sample_point_in_cap(
            Cap.from_center_angle(cell.vertex((i + 1) & 3), 1e-15), rng)
        p = interpolate(rng.random(), v1, tuple(v2))
        if Loop(np.array([cell.vertex(k) for k in range(4)])) \
                .contains_point(tuple(p)):
            assert cell.get_rect_bound().contains_point(tuple(p))
            iters += 1


def test_consistent_with_cellid_from_point():
    """S2Cell(S2CellId(p)).contains(p) for near-edge points
    (s2cell_test.d:463-476; 300 of 1000 iterations)."""
    rng = np.random.default_rng(7)
    for _ in range(300):
        cell = Cell(np.uint64(_random_cell_id(rng)))
        i = int(rng.integers(0, 4))
        v1 = cell.vertex(i)
        v2 = _sample_point_in_cap(
            Cap.from_center_angle(cell.vertex((i + 1) & 3), 1e-15), rng)
        p = np.asarray(interpolate(rng.random(), v1, tuple(v2)))
        cid = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                     np.array([p[2]]))[0])
        assert Cell(np.uint64(cid)).contains_point(tuple(p))


def test_ambiguous_contains_point():
    """s2cell_test.d:478-495."""
    x, y, z = coords.latlng_to_xyz(-2.0, 90.0)
    p = (float(x), float(y), float(z))
    cid = ci.parent_scalar(int(ci.cellid_from_xyz(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0]), 1)
    assert Cell(np.uint64(cid)).contains_point(p)


def _brute_min_dist2(cell, target):
    v = np.asarray([cell.vertex(k) for k in range(4)])
    return float(edge_distances2(np.asarray(target)[None, :], v,
                                 v[[1, 2, 3, 0]]).min())


def _brute_max_dist2(cell, target):
    if cell.contains_point(tuple(-np.asarray(target))):
        return 4.0
    md = -1.0
    for i in range(4):
        md = max(md, max_distance2(target, cell.vertex(i),
                                   cell.vertex((i + 1) & 3)))
    return md


def test_get_distance_to_point():
    """Faithful UVW distances vs brute force (s2cell_test.d:516-541;
    500 of 1000 iterations)."""
    rng = np.random.default_rng(11)
    for _ in range(500):
        cell = Cell(np.uint64(_random_cell_id(rng)))
        target = tuple(_random_point(rng))
        expected_boundary = _chord2_to_rad(_brute_min_dist2(cell, target))
        expected_interior = 0.0 if cell.contains_point(target) \
            else expected_boundary
        expected_max = _chord2_to_rad(_brute_max_dist2(cell, target))
        actual_boundary = _chord2_to_rad(cell.get_boundary_distance2(target))
        actual_interior = _chord2_to_rad(cell.get_distance2(target))
        actual_max = _chord2_to_rad(cell.get_max_distance2(target))
        assert actual_boundary == pytest.approx(expected_boundary,
                                                abs=1e-12)
        assert actual_interior == pytest.approx(expected_interior,
                                                abs=1e-12)
        assert actual_max == pytest.approx(expected_max, abs=1e-12)
        if expected_boundary <= math.pi / 3:
            assert actual_boundary == pytest.approx(expected_boundary,
                                                    abs=1e-15)
            assert actual_interior == pytest.approx(expected_interior,
                                                    abs=1e-15)
        if expected_max <= math.pi / 3:
            assert actual_max == pytest.approx(expected_max, abs=1e-15)


def _choose_edge_near_cell(cell, rng):
    """s2cell_test.d:543-563."""
    cap = cell.get_cap_bound()
    if rng.integers(0, 5) == 0:
        a = _random_point(rng)
    else:
        a = _sample_point_in_cap(
            Cap.from_center_angle(cap.center,
                                  1.5 * cap.radius_radians()), rng)
    max_length = min(100.0 * (1e-4 ** rng.random())
                     * cap.radius_radians(), 0.5 * math.pi)
    b = _sample_point_in_cap(Cap.from_center_angle(tuple(a), max_length),
                             rng)
    if rng.integers(0, 20) == 0:
        a, b = -a, -b
    return tuple(a), tuple(b)


def _brute_edge_min_dist2(cell, a, b):
    """s2cell_test.d:565-583."""
    if cell.contains_point(a) or cell.contains_point(b):
        return 0.0
    min_d2 = math.inf
    for i in range(4):
        v0 = cell.vertex(i)
        v1 = cell.vertex((i + 1) & 3)
        if crossing_sign(a, b, v0, v1) >= 0:
            return 0.0
        va = np.asarray(v0)[None, :]
        vb = np.asarray(v1)[None, :]
        min_d2 = min(min_d2,
                     float(edge_distances2(np.asarray(a)[None, :], va,
                                           vb)[0, 0]),
                     float(edge_distances2(np.asarray(b)[None, :], va,
                                           vb)[0, 0]),
                     float(edge_distances2(np.asarray(v0)[None, :],
                                           np.asarray(a)[None, :],
                                           np.asarray(b)[None, :])[0, 0]))
    return min_d2


def _brute_edge_max_dist2(cell, a, b):
    """s2cell_test.d:585-604."""
    na = tuple(-np.asarray(a))
    nb = tuple(-np.asarray(b))
    if cell.contains_point(na) or cell.contains_point(nb):
        return 4.0
    max_d2 = -1.0
    for i in range(4):
        v0 = cell.vertex(i)
        v1 = cell.vertex((i + 1) & 3)
        if crossing_sign(na, nb, v0, v1) >= 0:
            return 4.0
        max_d2 = max(max_d2, max_distance2(a, v0, v1),
                     max_distance2(b, v0, v1), max_distance2(v0, a, b))
    return max_d2


def test_get_distance_to_edge():
    """s2cell_test.d:606-633 (400 of 1000 iterations)."""
    rng = np.random.default_rng(13)
    for _ in range(400):
        cell = Cell(np.uint64(_random_cell_id(rng)))
        a, b = _choose_edge_near_cell(cell, rng)
        expected_min = _chord2_to_rad(_brute_edge_min_dist2(cell, a, b))
        expected_max = _chord2_to_rad(_brute_edge_max_dist2(cell, a, b))
        actual_min = _chord2_to_rad(cell.get_distance2_to_edge(a, b))
        actual_max = _chord2_to_rad(cell.get_max_distance2_to_edge(a, b))
        if expected_min > math.pi / 2:
            assert actual_min == pytest.approx(expected_min, abs=3e-8)
        elif expected_min <= math.pi / 3:
            assert actual_min == pytest.approx(expected_min, abs=1e-15)
        else:
            assert actual_min == pytest.approx(expected_min, abs=1e-12)
        assert actual_max == pytest.approx(expected_max, abs=1e-12)
        if expected_max <= math.pi / 3:
            assert actual_max == pytest.approx(expected_max, abs=1e-15)


def test_get_max_distance_to_edge():
    """Antipodal edge crossing the cell (s2cell_test.d:635-647)."""
    fid = ci.parent_scalar((0 << 61) | 1, 20)
    cell = Cell(np.uint64(fid))
    a = tuple(-np.asarray(interpolate(2.0, cell.center(), cell.vertex(0))))
    b = tuple(-np.asarray(interpolate(2.0, cell.center(), cell.vertex(2))))
    actual = cell.get_max_distance2_to_edge(a, b)
    expected = _brute_edge_max_dist2(cell, a, b)
    assert _chord2_to_rad(expected) == pytest.approx(math.pi, abs=1e-7)
    assert _chord2_to_rad(actual) == pytest.approx(math.pi, abs=1e-7)


def test_get_max_distance_to_cell_antipodal():
    """s2cell_test.d:649-655."""
    x, y, z = coords.latlng_to_xyz(0.0, 0.0)
    p = (float(x), float(y), float(z))
    cid = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                 np.array([p[2]]))[0])
    anti = tuple(-np.asarray(p))
    anti_cid = int(ci.cellid_from_xyz(np.array([anti[0]]),
                                      np.array([anti[1]]),
                                      np.array([anti[2]]))[0])
    assert Cell(np.uint64(cid)).get_max_distance2_to_cell(
        Cell(np.uint64(anti_cid))) == 4.0


def test_get_max_distance_to_cell():
    """straight - min_dist(antipodal cell) == max_dist(cell)
    (s2cell_test.d:657-668; 300 of 1000 iterations)."""
    rng = np.random.default_rng(17)
    for _ in range(300):
        cell = Cell(np.uint64(_random_cell_id(rng)))
        test_cell = Cell(np.uint64(_random_cell_id(rng)))
        c = np.asarray(test_cell.center())
        anti = -c
        anti_leaf = int(ci.cellid_from_xyz(np.array([anti[0]]),
                                           np.array([anti[1]]),
                                           np.array([anti[2]]))[0])
        anti_cell = Cell(np.uint64(ci.parent_scalar(anti_leaf,
                                                    test_cell.level)))
        dist_from_min = chord2_sub(
            4.0, cell.get_distance2_to_cell(anti_cell))
        dist_from_max = cell.get_max_distance2_to_cell(test_cell)
        assert _chord2_to_rad(dist_from_min) == pytest.approx(
            _chord2_to_rad(dist_from_max), abs=1e-8)
