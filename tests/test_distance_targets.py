"""Port of test/s2/s2min_distance_targets_test.d (the reference's active
cases: strict-improvement UpdateMinDistance semantics for point / edge /
cell targets) plus the C++-origin VisitContainingShapes cases that the D
port leaves as TODOs, adapted to the core.shapes protocol."""

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.distance_targets import (
    CellTarget, EdgeTarget, MinDistance, PointTarget, ShapeIndexTarget)
from s2geometry_d_ray.core.shapes import (LaxPolygonShape,
                                          LaxPolylineShape,
                                          PointVectorShape)


def _pt(txt):
    return np.asarray(textformat.make_point(txt), dtype=np.float64)


def _cell_at(txt):
    p = _pt(txt)
    leaf = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                  np.array([p[2]]))[0])
    return Cell(np.uint64(leaf))


def test_point_target_update_min_distance_to_edge_when_equal():
    target = PointTarget(_pt("1:0"))
    dist = MinDistance()
    e0, e1 = _pt("0:-1"), _pt("0:1")
    assert target.update_min_distance_edge(e0, e1, dist)
    assert not target.update_min_distance_edge(e0, e1, dist)


def test_point_target_update_min_distance_to_cell_when_equal():
    target = PointTarget(_pt("1:0"))
    dist = MinDistance()
    cell = _cell_at("0:0")
    assert target.update_min_distance_cell(cell, dist)
    assert not target.update_min_distance_cell(cell, dist)


def test_edge_target_update_min_distance_to_edge_when_equal():
    target = EdgeTarget(_pt("1:0"), _pt("1:1"))
    dist = MinDistance()
    e0, e1 = _pt("0:-1"), _pt("0:1")
    assert target.update_min_distance_edge(e0, e1, dist)
    assert not target.update_min_distance_edge(e0, e1, dist)


def test_edge_target_update_min_distance_to_cell_when_equal():
    target = EdgeTarget(_pt("1:0"), _pt("1:1"))
    dist = MinDistance()
    cell = _cell_at("0:0")
    assert target.update_min_distance_cell(cell, dist)
    assert not target.update_min_distance_cell(cell, dist)


def test_cell_target_update_min_distance_to_edge_when_equal():
    target = CellTarget(_cell_at("0:1"))
    dist = MinDistance()
    e0, e1 = _pt("0:-1"), _pt("0:1")
    assert target.update_min_distance_edge(e0, e1, dist)
    assert not target.update_min_distance_edge(e0, e1, dist)


def test_cell_target_update_min_distance_to_cell_when_equal():
    target = CellTarget(_cell_at("0:1"))
    dist = MinDistance()
    cell = _cell_at("0:0")
    assert target.update_min_distance_cell(cell, dist)
    assert not target.update_min_distance_cell(cell, dist)


def _shapes_for(index_text):
    """Shape list with the C++ test's shape-id numbering: one
    PointVectorShape for all points, one LaxPolylineShape per polyline,
    one LaxPolygonShape per polygon."""
    idx = textformat.make_index(index_text)
    shapes = []
    sid = 0
    if len(idx["points"]):
        shapes.append((sid, PointVectorShape(idx["points"])))
        sid += 1
    for line in idx["polylines"]:
        shapes.append((sid, LaxPolylineShape(line)))
        sid += 1
    for poly in idx["polygons"]:
        shapes.append((sid, LaxPolygonShape.from_polygon(poly)))
        sid += 1
    return shapes


def _containing_shapes(target, shapes, max_shapes):
    ids = set()

    def visit(sid, _pt):
        ids.add(sid)
        return len(ids) < max_shapes

    target.visit_containing_shapes(shapes, visit)
    return sorted(ids)


INDEX_TEXT = "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | 0:0, 0:4, 4:0"


def test_point_target_visit_containing_shapes():
    shapes = _shapes_for(INDEX_TEXT)
    target = PointTarget(_pt("1:1"))
    assert _containing_shapes(target, shapes, 1) == [2]
    assert _containing_shapes(target, shapes, 5) == [2, 4]


def test_edge_target_visit_containing_shapes():
    shapes = _shapes_for(INDEX_TEXT)
    target = EdgeTarget(_pt("1:2"), _pt("2:1"))
    assert _containing_shapes(target, shapes, 1) == [2]
    assert _containing_shapes(target, shapes, 5) == [2, 4]


def test_cell_target_visit_containing_shapes():
    shapes = _shapes_for(
        "1:1 # 1:1, 2:2 # 0:0, 0:3, 3:0 | 6:6, 6:9, 9:6 | -1:-1, -1:5, 5:-1")
    target1 = CellTarget(_cell_at("1:1"))
    assert _containing_shapes(target1, shapes, 1) == [2]
    assert _containing_shapes(target1, shapes, 5) == [2, 4]


def test_shape_index_target_distances_match_brute_force():
    """ShapeIndexTarget distance == min over per-shape targets."""
    rng = np.random.default_rng(7)
    shapes = _shapes_for(INDEX_TEXT)
    target = ShapeIndexTarget(shapes)
    for _ in range(25):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        d = MinDistance()
        target.update_min_distance_point(v, d)
        # brute force over edges + interiors
        brute = MinDistance()
        for sid, shape in shapes:
            for e in range(shape.num_edges()):
                a, b = shape.edge(e)
                EdgeTarget(a, b).update_min_distance_point(v, brute)
        from s2geometry_d_ray.core.shapes import contains_brute_force
        if any(s.dimension() == 2 and contains_brute_force(s, v)
               for _, s in shapes):
            brute.update_min(0.0)
        assert d.d2 == pytest.approx(brute.d2, abs=1e-15)


def test_edge_target_cap_bound_covers_edge():
    a, b = _pt("10:10"), _pt("12:14")
    cap = EdgeTarget(a, b).cap_bound()
    from s2geometry_d_ray.core.cap import Cap
    assert isinstance(cap, Cap)
    for p in (a, b):
        d2 = float(((np.asarray(cap.center) - p) ** 2).sum())
        assert d2 <= cap.radius2 + 1e-15
