"""Lax shapes — ported from test/s2/s2lax_polygon_shape_test.d and
s2lax_polyline_shape_test.d."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.predicates import ORIGIN
from s2geometry_d_ray.core.shapes import (LaxPolygonShape,
                                          LaxPolylineShape,
                                          contains_brute_force,
                                          get_reference_point)


def pts(*latlngs):
    out = []
    for lat, lng in latlngs:
        x, y, z = coords.latlng_to_xyz(lat, lng)
        v = np.array([float(x), float(y), float(z)])
        out.append(v / np.linalg.norm(v))
    return np.array(out) if out else np.empty((0, 3))


def test_empty_polygon():
    shape = LaxPolygonShape([])
    assert shape.num_loops() == 0
    assert shape.num_vertices() == 0
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0
    assert shape.dimension() == 2
    assert get_reference_point(shape)[1] is False


def test_full_polygon():
    shape = LaxPolygonShape([np.empty((0, 3))])
    assert shape.num_loops() == 1
    assert shape.num_vertices() == 0
    assert shape.num_edges() == 0
    assert shape.num_chains() == 1
    assert get_reference_point(shape)[1] is True


def test_single_vertex_polygon():
    loops = [pts((0, 0))]
    shape = LaxPolygonShape(loops)
    assert shape.num_loops() == 1
    assert shape.num_vertices() == 1
    assert shape.num_edges() == 1
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, 1)
    v0, v1 = shape.edge(0)
    assert np.array_equal(v0, loops[0][0])
    assert np.array_equal(v1, loops[0][0])
    assert get_reference_point(shape)[1] is False


def test_single_loop_polygon():
    vertices = pts((0, 0), (0, 1), (1, 1), (1, 0))
    shape = LaxPolygonShape([vertices])
    assert shape.num_loops() == 1
    assert shape.num_vertices() == len(vertices)
    assert shape.num_loop_vertices(0) == len(vertices)
    assert shape.num_edges() == len(vertices)
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, len(vertices))
    for i in range(len(vertices)):
        assert np.array_equal(shape.loop_vertex(0, i), vertices[i])
        v0, v1 = shape.edge(i)
        assert np.array_equal(v0, vertices[i])
        assert np.array_equal(v1, vertices[(i + 1) % len(vertices)])
        c0, c1 = shape.chain_edge(0, i)
        assert np.array_equal(v0, c0) and np.array_equal(v1, c1)
    assert contains_brute_force(shape, np.asarray(ORIGIN)) is False


def test_multi_loop_polygon():
    loops = [pts((0, 0), (0, 3), (3, 3)),     # CCW shell
             pts((1, 1), (2, 2), (1, 2))]     # CW hole
    shape = LaxPolygonShape(loops)
    assert shape.num_loops() == 2
    assert shape.num_chains() == 2
    nv = 0
    for i, lp in enumerate(loops):
        assert shape.num_loop_vertices(i) == len(lp)
        assert shape.chain(i) == (nv, len(lp))
        for j in range(len(lp)):
            assert np.array_equal(shape.loop_vertex(i, j), lp[j])
            v0, v1 = shape.edge(nv + j)
            assert np.array_equal(v0, lp[j])
            assert np.array_equal(v1, lp[(j + 1) % len(lp)])
        nv += len(lp)
    assert shape.num_vertices() == nv
    assert shape.num_edges() == nv
    assert contains_brute_force(shape, np.asarray(ORIGIN)) is False


def test_degenerate_loops():
    loops = [pts((1, 1), (1, 2), (2, 2), (1, 2), (1, 3), (1, 2), (1, 1)),
             pts((0, 0), (0, 3), (0, 6), (0, 9), (0, 6), (0, 3), (0, 0)),
             pts((5, 5), (6, 6))]
    shape = LaxPolygonShape(loops)
    assert get_reference_point(shape)[1] is False


def test_inverted_loops():
    loops = [pts((1, 2), (1, 1), (2, 2)),
             pts((3, 4), (3, 3), (4, 4))]
    shape = LaxPolygonShape(loops)
    assert contains_brute_force(shape, np.asarray(ORIGIN)) is True


def test_compare_to_s2loop():
    """s2lax_polygon_shape_test.d:202+: lax-shape containment must agree
    with S2Loop containment for sample points."""
    rng = np.random.default_rng(8)
    for trial in range(5):
        n = int(rng.integers(4, 12))
        loop = Loop.make_regular(float(rng.uniform(-50, 50)),
                                 float(rng.uniform(-150, 150)),
                                 math.radians(float(rng.uniform(1, 20))),
                                 n)
        shape = LaxPolygonShape([loop.vertices])
        for _ in range(40):
            p = rng.normal(size=3)
            p = p / np.linalg.norm(p)
            assert contains_brute_force(shape, p) \
                == loop.contains_point(tuple(p))


def test_lax_polyline():
    v = pts((0, 0), (0, 1), (1, 1))
    shape = LaxPolylineShape(v)
    assert shape.num_vertices() == 3
    assert shape.num_edges() == 2
    assert shape.dimension() == 1
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, 2)
    v0, v1 = shape.edge(1)
    assert np.array_equal(v0, v[1]) and np.array_equal(v1, v[2])
    assert contains_brute_force(shape, np.asarray(ORIGIN)) is False
    empty = LaxPolylineShape([])
    assert empty.num_edges() == 0 and empty.num_chains() == 0


def test_point_vector_shape():
    from s2geometry_d_ray.core.shapes import PointVectorShape
    p = pts((0, 0), (5, 5))
    s = PointVectorShape(p)
    assert s.num_edges() == 2 and s.dimension() == 0
    v0, v1 = s.edge(1)
    assert np.array_equal(v0, p[1]) and np.array_equal(v1, p[1])
    assert s.num_chains() == 2 and s.chain(1) == (1, 1)


def test_edge_vector_shape():
    from s2geometry_d_ray.core.shapes import EdgeVectorShape
    p = pts((0, 0), (0, 1), (1, 1), (2, 2))
    s = EdgeVectorShape([(p[0], p[1])])
    s.add(p[2], p[3])
    assert s.num_edges() == 2 and s.dimension() == 1
    v0, v1 = s.edge(1)
    assert np.array_equal(v0, p[2]) and np.array_equal(v1, p[3])


def test_lax_loop_shape_matches_loop():
    from s2geometry_d_ray.core.shapes import LaxLoopShape
    v = pts((0, 0), (0, 4), (4, 4), (4, 0))
    s = LaxLoopShape(v)
    assert s.num_loops() == 1 and s.num_edges() == 4
    inside = pts((2, 2))[0]
    assert contains_brute_force(s, inside)
    assert not contains_brute_force(s, pts((10, 10))[0])


def test_shape_index_region_feeds_coverer():
    import math

    from s2geometry_d_ray.core.coverer import RegionCoverer
    from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
    from s2geometry_d_ray.core.shapes import ShapeIndexRegion
    from s2geometry_d_ray.core.loop import Loop
    from s2geometry_d_ray.core.polygon import Polygon
    poly = Polygon([Loop.make_regular(10, 20, math.radians(3.0), 16)])
    region = ShapeIndexRegion(PolygonShapeIndex(poly))
    cov = RegionCoverer(max_cells=8).get_covering(region)
    ref = RegionCoverer(max_cells=8).get_covering(poly)
    assert [int(c) for c in cov] == [int(c) for c in ref]
    inside = pts((10, 20))[0]
    assert region.contains_point(inside)


def test_many_loop_polygon():
    """100 loops of 0/1/2 vertices: chain starts, loop-vertex accessors
    and edge wraparound all consistent (s2lax_polygon_shape_test.d:140)."""
    from s2geometry_d_ray.core.loop import Loop
    loops = []
    for i in range(100):
        x, y, z = coords.latlng_to_xyz(0.0, float(i))
        center = np.array([float(x), float(y), float(z)])
        k = i % 3
        if k == 0:
            loops.append(np.empty((0, 3)))
        else:
            ring = Loop.make_regular_xyz(center, np.radians(0.1),
                                         max(3, k))
            loops.append(np.asarray(ring.vertices)[:k])
    shape = LaxPolygonShape([lp for lp in loops])
    assert shape.num_loops() == len(loops)
    assert shape.num_chains() == len(loops)
    num_vertices = 0
    for i, lp in enumerate(loops):
        assert shape.num_loop_vertices(i) == len(lp)
        assert shape.chain(i) == (num_vertices, len(lp))
        for j in range(len(lp)):
            assert np.array_equal(shape.loop_vertex(i, j), lp[j])
            v0, v1 = shape.edge(num_vertices + j)
            assert np.array_equal(v0, lp[j])
            assert np.array_equal(v1, lp[(j + 1) % len(lp)])
        num_vertices += len(lp)
    assert shape.num_vertices() == num_vertices
    assert shape.num_edges() == num_vertices
