"""Port of test/s2/s2polyline_test.d: interpolation / projection /
is-on-right semantics, intersections, subsampling (parametric, not just
geometric), approx-equality, codec roundtrip, the shape adapter, and the
full S2PolylineCovering (nearlyCovers) table."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords, textformat
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.polyline import Polyline
from s2geometry_d_ray.core.serialization import (decode_polyline,
                                                 encode_polyline)
from s2geometry_d_ray.core.shapes import LaxPolylineShape

DEG = math.pi / 180.0


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _ll(lat, lng):
    x, y, z = coords.latlng_to_xyz(lat, lng)
    return _unit((float(x), float(y), float(z)))


def _approx(p, q, tol=1e-14):
    return float(np.dot(_unit(p), _unit(q))) >= math.cos(tol)


def make_polyline(text):
    if not text.strip():
        return Polyline()
    return textformat.make_polyline(text)


def test_basic():
    empty_line = Polyline()
    assert empty_line.get_rect_bound().is_empty()
    empty_line.reverse()
    assert empty_line.num_vertices() == 0

    semi_equator = Polyline([_ll(0, 0), _ll(0, 90), _ll(0, 180)])
    assert _approx(semi_equator.interpolate(0.5), (0, 1, 0), 1e-7)
    semi_equator.reverse()
    assert np.allclose(semi_equator.vertices[2], (1, 0, 0), atol=1e-15)


def test_get_length_and_centroid():
    rng = np.random.default_rng(37)
    for _ in range(50):
        z = _unit(rng.normal(size=3))
        frame = np.asarray(coords.get_frame(z))
        x, y = frame[:, 0], frame[:, 1]
        vertices = []
        theta = 0.0
        while theta < 2 * math.pi:
            p = math.cos(theta) * x + math.sin(theta) * y
            if not vertices or not np.array_equal(p, vertices[-1]):
                vertices.append(p)
            theta += rng.random() ** 10
        vertices.append(vertices[0])
        line = Polyline(vertices)
        assert abs(line.get_length() - 2 * math.pi) <= 2e-14
        assert np.linalg.norm(line.get_centroid()) <= 2e-14


def test_may_intersect():
    line = Polyline([_unit((1, -1.1, 0.8)), _unit((1, -0.8, 1.1))])
    for face in range(6):
        cell = Cell(np.uint64((face << 61) | (1 << 60)))
        assert line.may_intersect_cell(cell) == ((face & 1) == 0)


def test_interpolate():
    vertices = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                _unit((0, 1, 1)), np.array([0, 0, 1.0])]
    line = Polyline(vertices)
    assert np.array_equal(line.interpolate(-0.1), vertices[0])
    assert _approx(line.interpolate(0.1),
                   _unit((1, math.tan(0.2 * math.pi / 2), 0)), 1e-7)
    assert _approx(line.interpolate(0.25), _unit((1, 1, 0)), 1e-7)
    assert np.array_equal(line.interpolate(0.5), vertices[1])
    assert _approx(line.interpolate(0.75), vertices[2], 1e-7)

    p, next_vertex = line.get_suffix_point(-0.1)
    assert np.array_equal(p, vertices[0])
    assert next_vertex == 1
    p, next_vertex = line.get_suffix_point(0.75)
    assert _approx(p, vertices[2], 1e-7)
    assert next_vertex == 3
    p, next_vertex = line.get_suffix_point(1.1)
    assert np.array_equal(p, vertices[3])
    assert next_vertex == 4

    # Fraction so close to 1 the interpolated point equals the last vertex.
    vs = [_unit((1, 1, 1)), _unit((1, 1, 1 + 1e-15)),
          _unit((1, 1, 1 + 2e-15))]
    short_line = Polyline(vs)
    p, next_vertex = short_line.get_suffix_point(1.0 - 2e-16)
    assert np.array_equal(p, vs[2])
    assert next_vertex == 3


def test_un_interpolate():
    point_line = Polyline([np.array([1.0, 0, 0])])
    assert point_line.un_interpolate(np.array([0, 1.0, 0]), 1) == \
        pytest.approx(0.0, abs=1e-15)

    vertices = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                _unit((0, 1, 1)), np.array([0, 0, 1.0])]
    line = Polyline(vertices)
    for fraction, expected in ((-0.1, 0.0), (0.0, 0.0), (0.5, 0.5),
                               (0.75, 0.75), (1.1, 1.0)):
        p, next_vertex = line.get_suffix_point(fraction)
        assert line.un_interpolate(p, next_vertex) == pytest.approx(
            expected, abs=1e-14)

    assert line.un_interpolate(np.array([0, 1.0, 0]), 4) == pytest.approx(
        1.0, abs=1e-15)


def test_project():
    line = Polyline([_ll(0, 0), _ll(0, 1), _ll(0, 2), _ll(1, 2)])
    cases = [((0.5, -0.5), (0, 0), 1), ((0.5, 0.5), (0, 0.5), 1),
             ((0.5, 1), (0, 1), 2), ((-0.5, 2.5), (0, 2), 3),
             ((2, 2), (1, 2), 4)]
    for (qlat, qlng), (elat, elng), expected_next in cases:
        p, next_vertex = line.project(_ll(qlat, qlng))
        assert _approx(p, _ll(elat, elng), 1e-7)
        assert next_vertex == expected_next


def test_is_on_right():
    line = Polyline([_ll(0, 0), _ll(0, 1), _ll(0, 2), _ll(1, 2)])
    assert line.is_on_right(_ll(-0.5, 0.5))
    assert not line.is_on_right(_ll(0.5, -0.5))
    assert not line.is_on_right(_ll(0.5, 0.5))
    assert not line.is_on_right(_ll(0.5, 1))
    assert line.is_on_right(_ll(-0.5, 2.5))
    assert line.is_on_right(_ll(1.5, 2.5))

    line2 = Polyline([_ll(0, 0), _ll(0, 1), _ll(-1, 0)])
    assert not line2.is_on_right(_ll(-0.5, 5))
    assert not line2.is_on_right(_ll(5.5, 5))


def test_intersects_empty_and_point():
    line1 = make_polyline("1:1, 4:4")
    assert not Polyline().intersects(line1)
    assert not line1.intersects(make_polyline("1:1"))


def test_intersects():
    line1 = make_polyline("1:1, 4:4")
    assert line1.intersects(make_polyline("1:2, 2:1"))
    assert not line1.intersects(make_polyline("1:2, 2:3"))
    assert line1.intersects(make_polyline("1:2, 2:3, 4:3"))


def test_intersects_at_vertex():
    line1 = make_polyline("1:1, 4:4, 4:6")
    assert line1.intersects(make_polyline("1:1, 1:2"))
    assert line1.intersects(make_polyline("5:1, 4:4, 2:2"))


def test_intersects_vertex_on_edge():
    h_lr = make_polyline("0:1, 0:3")
    v_bt = make_polyline("-1:2, 0:2, 1:2")
    h_rl = make_polyline("0:3, 0:1")
    v_tb = make_polyline("1:2, 0:2, -1:2")
    assert h_lr.intersects(v_bt)
    assert h_lr.intersects(v_tb)
    assert h_rl.intersects(v_bt)
    assert h_rl.intersects(v_tb)


def check_subsample(poly_str, tolerance_deg, expected_str):
    polyline = make_polyline(poly_str)
    indices = polyline.subsample_vertices(tolerance_deg * DEG)
    expected = ([int(t) for t in expected_str.split(",")]
                if expected_str else [])
    assert indices == expected, (poly_str, tolerance_deg, indices)


def test_subsample_vertices_trivial_inputs():
    check_subsample("", 1.0, "")
    check_subsample("0:1", 1.0, "0")
    check_subsample("10:10, 11:11", 5.0, "0,1")
    check_subsample("-1:0, 0:0, 1:0", 1e-15, "0,2")
    check_subsample("-1:0, 0:0, 1:1", 0.0, "0,1,2")
    check_subsample("-1:0, 0:0, 1:1", -1.0, "0,1,2")
    check_subsample("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, "0,4")
    check_subsample("0:1, 0:1, 0:1, 0:2", 0.0, "0,3")


def test_subsample_vertices_simple_example():
    poly_str = "0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4"
    check_subsample(poly_str, 3.0, "0,9")
    check_subsample(poly_str, 2.0, "0,6,9")
    check_subsample(poly_str, 0.9, "0,2,6,9")
    check_subsample(poly_str, 0.4, "0,1,2,3,4,6,9")
    check_subsample(poly_str, 0, "0,1,2,3,4,5,6,7,8,9")


def test_subsample_vertices_guarantees():
    check_subsample("10:10, 12:12, 10:10", 5.0, "0")
    check_subsample("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4")
    check_subsample(
        "90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0",
        5.0, "0,2,4,5,6,7")
    check_subsample("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4")
    check_subsample("10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0,
                    "0,2,3,5")
    check_subsample("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4")


def test_approx_equals():
    def equals(a_str, b_str, max_error_deg):
        return make_polyline(a_str).approx_equals(
            make_polyline(b_str), max_error_deg * DEG)

    assert equals("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2", 0.5)
    assert not equals("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2", 0.01)
    assert not equals("0:0, 0:10, 0:20", "0:0, 0:20", 0.1)
    assert not equals("0:0, 5:5, 0:10", "5:5, 0:10, 0:0", 0.1)


def test_encode_decode():
    polyline = make_polyline("0:0, 0:10, 10:20, 20:30")
    decoded = decode_polyline(encode_polyline(polyline))
    assert decoded.approx_equals(polyline, 0.0)


def test_polyline_shape_basic():
    polyline = make_polyline("0:0, 1:0, 1:1, 2:1")
    shape = LaxPolylineShape(polyline.vertices)
    assert shape.num_edges() == 3
    assert shape.num_chains() == 1
    assert shape.chain(0) == (0, 3)
    v0, v1 = shape.edge(2)
    assert _approx(v0, _ll(1, 1), 1e-14)
    assert _approx(v1, _ll(2, 1), 1e-14)
    assert shape.dimension() == 1


def test_polyline_shape_empty():
    shape = LaxPolylineShape([])
    assert shape.num_edges() == 0
    assert shape.num_chains() == 0


def check_nearly_covers(a_str, b_str, max_error_deg, expect_b_covers_a,
                        expect_a_covers_b):
    a = make_polyline(a_str)
    b = make_polyline(b_str)
    err = max_error_deg * DEG
    assert b.nearly_covers(a, err) == expect_b_covers_a
    assert a.nearly_covers(b, err) == expect_a_covers_b


def test_covering_polyline_overlaps_self():
    pline = "1:1, 2:2, -1:10"
    check_nearly_covers(pline, pline, 1e-10, True, True)


def test_covering_does_not_overlap_reverse():
    check_nearly_covers("1:1, 2:2, -1:10", "-1:10, 2:2, 1:1", 1e-10,
                        False, False)


def test_covering_overlaps_equivalent():
    check_nearly_covers("1:1, 2:1", "1:1, 1.5:1, 2:1", 1e-10, True, True)


def test_covering_short_covered_by_long():
    check_nearly_covers("-5:1, 10:1, 10:5, 5:10", "9:1, 9.9995:1, 10.0005:5",
                        1e-3, False, True)


def test_covering_partial_overlap_only():
    check_nearly_covers("-5:1, 10:1", "0:1, 20:1", 1.0, False, False)


def test_covering_short_backtracking():
    t1 = "0:0, 0:2, 0:1, 0:4, 0:5"
    t2 = "0:0, 0:2, 0:4, 0:3, 0:5"
    check_nearly_covers(t1, t2, 1.5, True, True)
    check_nearly_covers(t1, t2, 0.5, False, False)


def test_covering_long_backtracking():
    check_nearly_covers("5:1, -5:1", "1:1, 3:1", 1.0, False, False)
    check_nearly_covers("5:1, -5:1", "1:1, 3:1", 2.5, False, True)


def test_covering_resilient_to_duplicate_points():
    check_nearly_covers("0:1, 0:2, 0:2, 0:3", "0:1, 0:1, 0:1, 0:3",
                        1e-10, True, True)


def test_covering_two_potential_starting_points():
    check_nearly_covers("0:11, 0:0, 0:9, 0:20", "0:10, 0:15", 1.5,
                        False, True)


def test_covering_straight_and_wiggly_cover_each_other():
    check_nearly_covers(
        "40:1, 20:1",
        "39.9:0.9, 40:1.1, 30:1.15, 29:0.95, 28:1.1, 27:1.15, "
        "26:1.05, 25:0.85, 24:1.1, 23:0.9, 20:0.99",
        0.2, True, True)


def test_covering_match_starts_at_last_vertex():
    check_nearly_covers("0:0, 0:2", "0:2, 0:3", 1.5, False, True)


def test_covering_match_starts_at_duplicated_last_vertex():
    check_nearly_covers("0:0, 0:2, 0:2, 0:2", "0:2, 0:3", 1.5, False, True)


def test_covering_empty_polylines():
    check_nearly_covers("0:1, 0:2", "", 0.0, False, True)
    check_nearly_covers("", "", 0.0, True, True)
