"""Ports of the small shape suites: test/s2/s2point_vector_shape_test.d,
s2edge_vector_shape_test.d, and s2lax_loop_shape_test.d (empty /
non-empty lax loops, closed polylines without interior, vertex-id loops
including the inverted loop containing the origin)."""

import numpy as np

from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.predicates import ORIGIN
from s2geometry_d_ray.core.shapes import (EdgeVectorShape,
                                          LaxClosedPolylineShape,
                                          LaxLoopShape, PointVectorShape,
                                          VertexIdLaxLoopShape,
                                          contains_brute_force,
                                          get_reference_point)


def _random_points(n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3))
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def test_point_vector_shape_construction_and_access():
    pts = _random_points(100, 41)
    shape = PointVectorShape(pts)
    assert shape.num_edges() == 100
    assert shape.num_chains() == 100
    assert shape.dimension() == 0
    for i in range(100):
        assert shape.chain(i) == (i, 1)
        v0, v1 = shape.edge(i)
        assert np.array_equal(v0, pts[i])
        assert np.array_equal(v1, pts[i])


def test_edge_vector_shape_edge_access():
    pts = _random_points(200, 43)
    shape = EdgeVectorShape()
    for i in range(100):
        shape.add(pts[2 * i], pts[2 * i + 1])
    assert shape.num_edges() == 100
    assert shape.num_chains() == 100
    assert shape.dimension() == 1
    for i in range(100):
        assert shape.chain(i) == (i, 1)
        v0, v1 = shape.edge(i)
        assert np.array_equal(v0, pts[2 * i])
        assert np.array_equal(v1, pts[2 * i + 1])


def test_edge_vector_shape_singleton_constructor():
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    shape = EdgeVectorShape([(a, b)])
    assert shape.num_edges() == 1
    assert shape.num_chains() == 1
    v0, v1 = shape.edge(0)
    assert np.array_equal(v0, a)
    assert np.array_equal(v1, b)


def test_lax_loop_shape_empty_loop():
    shape = LaxLoopShape([])
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 2
    assert get_reference_point(shape)[1] is False


def test_lax_loop_shape_non_empty_loop():
    vertices = textformat.parse_points("0:0, 0:1, 1:1, 1:0")
    shape = LaxLoopShape(vertices)
    n = len(vertices)
    assert shape.num_vertices() == n
    assert shape.num_edges() == n
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, n)
    for i in range(n):
        v0, v1 = shape.edge(i)
        assert np.allclose(v0, vertices[i], atol=0)
        assert np.allclose(v1, vertices[(i + 1) % n], atol=0)
    assert shape.dimension() == 2
    assert shape.has_interior()
    assert get_reference_point(shape)[1] is False


def test_lax_closed_polyline_shape_no_interior():
    vertices = textformat.parse_points("0:0, 0:1, 1:1, 1:0")
    shape = LaxClosedPolylineShape(vertices)
    assert shape.dimension() == 1
    assert not shape.has_interior()
    assert contains_brute_force(shape, ORIGIN) is False


def test_vertex_id_lax_loop_shape_empty_loop():
    shape = VertexIdLaxLoopShape([], None)
    assert shape.num_edges() == 0
    assert shape.num_vertices() == 0
    assert shape.num_chains() == 1
    assert shape.dimension() == 2
    assert shape.has_interior()
    assert get_reference_point(shape)[1] is False


def test_vertex_id_lax_loop_shape_inverted_loop():
    vertex_array = textformat.parse_points("0:0, 0:1, 1:1, 1:0")
    vertex_ids = [0, 3, 2, 1]  # inverted
    shape = VertexIdLaxLoopShape(vertex_ids, vertex_array)
    assert shape.num_edges() == 4
    assert shape.num_vertices() == 4
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, 4)
    assert np.allclose(shape.vertex(0), vertex_array[0], atol=0)
    assert np.allclose(shape.vertex(1), vertex_array[3], atol=0)
    assert np.allclose(shape.vertex(2), vertex_array[2], atol=0)
    assert np.allclose(shape.vertex(3), vertex_array[1], atol=0)
    assert shape.dimension() == 2
    assert shape.has_interior()
    assert contains_brute_force(shape, ORIGIN) is True
