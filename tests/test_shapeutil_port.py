"""Ports of test/s2/shapeutil/contains_brute_force_test.d and
get_reference_point_test.d — including the C++-origin degenerate /
inverted / partially-degenerate loop cases the D port leaves disabled
(the Hilbert-walk chain with an embedded triangular loop)."""

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.predicates import ORIGIN
from s2geometry_d_ray.core.shapes import (LaxPolygonShape,
                                          LaxPolylineShape,
                                          contains_brute_force,
                                          get_reference_point)


def test_contains_brute_force_no_interior():
    # A polyline that almost entirely encloses the point 0:0.
    polyline = LaxPolylineShape(
        textformat.parse_points("0:0, 0:1, 1:-1, -1:-1, -89:1"))
    assert contains_brute_force(
        polyline, np.asarray(textformat.make_point("0:0"))) is False


def test_contains_brute_force_contains_reference_point():
    polygon = LaxPolygonShape(
        [textformat.parse_points("0:0, 0:1, 1:-1, -1:-1, -89:1")])
    ref, contained = get_reference_point(polygon)
    assert contains_brute_force(polygon, np.asarray(ref)) == contained


def test_contains_brute_force_consistent_with_loop():
    loop = Loop.make_regular_xyz(
        np.asarray(textformat.make_point("89:-179")),
        np.radians(10.0), 100)
    shape = LaxPolygonShape([np.asarray(loop.vertices)])
    for v in loop.vertices:
        assert contains_brute_force(shape, np.asarray(v)) == \
            loop.contains_point(tuple(v))


def test_get_reference_point_empty_polygon():
    shape = LaxPolygonShape([])
    assert get_reference_point(shape)[1] is False


def test_get_reference_point_full_polygon():
    shape = LaxPolygonShape([[]])  # one zero-vertex loop = full
    assert get_reference_point(shape)[1] is True


def test_get_reference_point_degenerate_loops():
    loops = [
        textformat.parse_points("1:1, 1:2, 2:2, 1:2, 1:3, 1:2, 1:1"),
        textformat.parse_points("0:0, 0:3, 0:6, 0:9, 0:6, 0:3, 0:0"),
        textformat.parse_points("5:5, 6:6"),
    ]
    shape = LaxPolygonShape(loops)
    assert get_reference_point(shape)[1] is False


def test_get_reference_point_inverted_loops():
    loops = [
        textformat.parse_points("1:2, 1:1, 2:2"),
        textformat.parse_points("3:4, 3:3, 4:4"),
    ]
    shape = LaxPolygonShape(loops)
    assert contains_brute_force(shape, np.asarray(ORIGIN)) is True


def test_get_reference_point_partially_degenerate_loops():
    """Hilbert-walk edge chain, a small triangular loop spliced in at a
    random position, then the chain retraced backwards so that every
    edge EXCEPT the triangle is matched by its reverse
    (get_reference_point_test.d:62-100, 20 of 100 iterations)."""
    rng = np.random.default_rng(71)
    num_vertices = 100
    for _ in range(20):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        leaf = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                      np.array([p[2]]))[0])
        start = np.uint64(ci.parent_scalar(leaf, 29))
        loop_steps = int(rng.integers(0, num_vertices - 2)) + 1

        def center(cid):
            x, y, z = ci.to_xyz(np.array([cid], dtype=np.uint64))
            v = np.array([float(x[0]), float(y[0]), float(z[0])])
            return v / np.linalg.norm(v)

        chain = []
        triangle = []
        cellid = start
        for k in range(num_vertices):
            if k == loop_steps:
                for c in range(3):
                    triangle.append(center(ci.child(cellid, c)))
                chain.extend(triangle)
                chain.append(center(ci.child(cellid, 0)))
            else:
                chain.append(center(cellid))
            cellid = np.uint64(ci.next_wrap(cellid))
        for k in range(num_vertices, 0, -1):
            cellid = np.uint64(ci.prev_wrap(cellid))
            if k - 1 == loop_steps:
                chain.append(center(ci.child(cellid, 0)))
            else:
                chain.append(center(cellid))
        shape = LaxPolygonShape([np.asarray(chain)])
        tri_loop = Loop(np.asarray(triangle))
        ref, contained = get_reference_point(shape)
        assert tri_loop.contains_point(tuple(np.asarray(ref))) == contained
