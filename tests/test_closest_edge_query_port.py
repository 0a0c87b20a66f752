"""Port of test/s2/s2closest_edge_query_test.d (the reference's active
cases): empty indexes, options handling, distance-equal-to-limit
predicate semantics, the conservative chord-angle error test, interior
results, and empty/full polygon targets."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.closest_edge import (ClosestEdgeOptions,
                                                ClosestEdgeQuery, INF2)
from s2geometry_d_ray.core.distance_predicates import compare_distance
from s2geometry_d_ray.core.distance_targets import (PointTarget,
                                                    ShapeIndexTarget)
from s2geometry_d_ray.core.edge import interpolate_at_distance, \
    radians_to_chord2
from s2geometry_d_ray.core.shapes import (LaxPolygonShape,
                                          LaxPolylineShape,
                                          PointVectorShape)

DEG = math.pi / 180.0


def _pt(txt):
    return np.asarray(textformat.make_point(txt), dtype=np.float64)


def _chord2(a, b):
    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    return min(4.0, float(np.dot(d, d)))


def _shapes_for(index_text):
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


EMPTY_POLYGON = [(0, LaxPolygonShape([]))]       # no loops: empty
FULL_POLYGON = [(0, LaxPolygonShape([[]]))]      # one 0-vertex loop: full


def test_no_edges():
    query = ClosestEdgeQuery([])
    target = PointTarget(np.array([1.0, 0, 0]))
    edge = query.find_closest_edge(target)
    assert edge.d2 == INF2
    assert edge.edge_id == -1
    assert edge.shape_id == -1
    assert query.get_distance2(target) == INF2


def test_options_not_modified():
    options = ClosestEdgeOptions(max_edges=3,
                                 max_distance2=radians_to_chord2(3 * DEG),
                                 max_error_rad=0.001 * DEG)
    shapes = _shapes_for("1:1 | 1:2 | 1:3 # #")
    query = ClosestEdgeQuery(shapes, options)
    target = PointTarget(_pt("2:2"))
    assert query.find_closest_edge(target).edge_id == 1
    d2 = query.get_distance2(target)
    dist_deg = math.degrees(2 * math.asin(0.5 * math.sqrt(d2)))
    assert dist_deg == pytest.approx(1.0, abs=1e-4)
    assert query.is_distance_less(target, radians_to_chord2(1.5 * DEG))
    assert query.options.max_edges == 3
    assert query.options.max_distance2 == radians_to_chord2(3 * DEG)
    assert query.options.max_error_rad == 0.001 * DEG


def test_distance_equal_to_limit():
    p0, p1 = _pt("23:12"), _pt("47:11")
    shapes = [(0, PointVectorShape([p0]))]
    query = ClosestEdgeQuery(shapes)

    target0 = PointTarget(p0)
    assert not query.is_distance_less(target0, 0.0)
    assert query.is_distance_less_or_equal(target0, 0.0)
    assert query.is_conservative_distance_less_or_equal(target0, 0.0)

    target1 = PointTarget(p1)
    dist1 = _chord2(p0, p1)
    assert not query.is_distance_less(target1, dist1)
    assert query.is_distance_less_or_equal(target1, dist1)
    assert query.is_conservative_distance_less_or_equal(target1, dist1)


def test_true_distance_less_than_chord_angle_distance():
    """The chord2 distance is ~4 ulps greater than the true distance for
    this worst-case pair; the conservative predicate must still accept."""
    p0 = np.array([0.78516762584829192, -0.50200400690845970,
                   -0.36263449417782678])
    p1 = np.array([0.78563011732429433, -0.50187655940493503,
                   -0.36180828883938054])
    dist2 = _chord2(p0, p1)
    limit = dist2
    for _ in range(4):
        limit = math.nextafter(limit, 0.0)
    assert compare_distance(tuple(p0), tuple(p1), limit) < 0

    query = ClosestEdgeQuery([(0, PointVectorShape([p0]))])
    target1 = PointTarget(p1)
    assert not query.is_distance_less(target1, limit)
    assert not query.is_distance_less_or_equal(target1, limit)
    assert query.is_conservative_distance_less_or_equal(target1, limit)


def test_reuse_of_query():
    shapes = _shapes_for("2:2 # #")
    query = ClosestEdgeQuery(shapes, ClosestEdgeOptions(
        max_edges=10, max_error_rad=1 * DEG))
    target_shapes = _shapes_for("# # 0:0, 0:5, 5:5, 5:0")
    target = ShapeIndexTarget(target_shapes)
    results1 = query.find_closest_edges(target)
    results2 = query.find_closest_edges(target)
    assert len(results1) == len(results2)


def test_target_point_inside_indexed_polygon():
    shapes = _shapes_for("# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    options = ClosestEdgeOptions(max_edges=10,
                                 max_distance2=radians_to_chord2(1 * DEG),
                                 include_interiors=True)
    query = ClosestEdgeQuery(shapes, options)
    target = PointTarget(_pt("2:12"))
    results = query.find_closest_edges(target)
    assert len(results) == 1
    assert results[0].d2 == 0.0
    assert results[0].shape_id == 1
    assert results[0].edge_id == -1


def test_target_point_outside_indexed_polygon():
    shapes = _shapes_for("# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    options = ClosestEdgeOptions(max_edges=10,
                                 max_distance2=radians_to_chord2(1 * DEG),
                                 include_interiors=True)
    query = ClosestEdgeQuery(shapes, options)
    target = PointTarget(_pt("2:2"))
    assert query.find_closest_edges(target) == []


def test_target_polygon_containing_indexed_points():
    shapes = _shapes_for("2:2 | 3:3 | 1:11 | 3:13 # #")
    query = ClosestEdgeQuery(shapes, ClosestEdgeOptions(
        max_edges=10, max_distance2=radians_to_chord2(1 * DEG)))
    target_shapes = _shapes_for(
        "# 0:0, 0:5, 5:5, 5:0 # 0:10, 0:15, 5:15, 5:10")
    target = ShapeIndexTarget(target_shapes)
    target.include_interiors = True
    results = query.find_closest_edges(target)
    assert len(results) == 2
    assert results[0].d2 == 0.0
    assert results[0].shape_id == 0
    assert results[0].edge_id == 2  # 1:11
    assert results[1].d2 == 0.0
    assert results[1].shape_id == 0
    assert results[1].edge_id == 3  # 3:13


def test_empty_polygon_target():
    point_shapes = _shapes_for("1:1 # #")
    target = ShapeIndexTarget(EMPTY_POLYGON)
    target.include_interiors = True
    for shapes in (EMPTY_POLYGON, point_shapes, FULL_POLYGON):
        query = ClosestEdgeQuery(shapes, ClosestEdgeOptions(
            include_interiors=True))
        assert query.get_distance2(target) == INF2


def test_full_lax_polygon_target():
    point_shapes = _shapes_for("1:1 # #")
    target = ShapeIndexTarget(FULL_POLYGON)
    target.include_interiors = True

    empty_query = ClosestEdgeQuery(EMPTY_POLYGON,
                                   ClosestEdgeOptions(include_interiors=True))
    assert empty_query.get_distance2(target) == INF2

    point_query = ClosestEdgeQuery(point_shapes,
                                   ClosestEdgeOptions(include_interiors=True))
    assert point_query.get_distance2(target) == 0.0

    full_query = ClosestEdgeQuery(FULL_POLYGON,
                                  ClosestEdgeOptions(include_interiors=True))
    assert full_query.get_distance2(target) == 0.0


def test_is_conservative_distance_less_or_equal_sweep():
    """1000-iteration sweep (s2closest_edge_query_test.d:259-289): when
    the exact predicate says dist(x,y) <= r, the conservative chord test
    must agree; count the cases where the plain test would fail."""
    rng = np.random.default_rng(47)
    num_tested = 0
    num_conservative_needed = 0
    for _ in range(1000):
        x = rng.normal(size=3)
        x /= np.linalg.norm(x)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        r = math.pi * (1e-30 ** rng.random())
        y = np.asarray(interpolate_at_distance(r, x, d))
        limit = radians_to_chord2(r)
        if compare_distance(tuple(x), tuple(y), limit) <= 0:
            query = ClosestEdgeQuery([(0, PointVectorShape([x]))])
            target = PointTarget(y)
            assert query.is_conservative_distance_less_or_equal(target,
                                                                limit)
            num_tested += 1
            if not query.is_distance_less(target, limit):
                num_conservative_needed += 1
    assert 300 <= num_tested <= 700
    assert num_conservative_needed >= 10


def test_project():
    shapes = _shapes_for("# 0:0, 0:10 #")
    query = ClosestEdgeQuery(shapes, ClosestEdgeOptions(max_edges=1))
    p = _pt("1:5")
    res = query.find_closest_edge(PointTarget(p))
    proj = query.project(p, res)
    d = math.degrees(math.atan2(
        float(np.linalg.norm(np.cross(proj, _pt("0:5")))),
        float(np.dot(proj, _pt("0:5")))))
    assert d == pytest.approx(0.0, abs=1e-6)
