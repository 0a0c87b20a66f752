"""Port of the reference S2BooleanOperation suite
(test/s2/s2boolean_operation_test.d:194-927): mixed-dimension boolean
operations under every PolygonModel / PolylineModel, degeneracy
preservation, vertex/edge overlap semantics, snap-rounded crossings, and
the IndexMatchingLayer comparison (directed edge multisets per dim)."""

from collections import Counter

import pytest

from s2geometry_d_ray.core.boolean_operation import (
    BooleanOptions, CLOSED, DIFFERENCE, INTERSECTION, OPEN, SEMI_OPEN,
    SYMMETRIC_DIFFERENCE, UNION, boolean_operation_edges,
    index_edges_by_dim, is_empty, make_lax_index)
from s2geometry_d_ray.core.builder import IntLatLngSnapFunction


def _round_pt(p):
    return tuple(round(c, 12) for c in p)


def _canon(edges):
    return Counter((_round_pt(a), _round_pt(b)) for (a, b) in edges)


def expect_result(op, options, a_str, b_str, expected_str):
    a = make_lax_index(a_str)
    b = make_lax_index(b_str)
    expected = index_edges_by_dim(make_lax_index(expected_str))
    actual = boolean_operation_edges(op, a, b, options)
    for dim in (0, 1, 2):
        assert _canon(actual[dim]) == _canon(expected[dim]), (
            f"{op} dim {dim}:\n actual   {sorted(_canon(actual[dim]))}\n"
            f" expected {sorted(_canon(expected[dim]))}")
    want_empty = not any(expected[d] for d in (0, 1, 2))
    assert is_empty(op, a, b, options) == want_empty


def round_to_e(exp):
    return BooleanOptions(snap_function=IntLatLngSnapFunction(exp))


def test_degenerate_polylines():
    a = "# 0:0, 0:0 #"
    b = "# #"
    for model in (OPEN, SEMI_OPEN, CLOSED):
        options = BooleanOptions(polyline_model=model)
        expect_result(UNION, options, a, b, a)


def test_degenerate_polygons():
    a = "# # 0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 3:3; 6:6; 7:7, 8:8"
    b = "# #"
    for model in (OPEN, SEMI_OPEN, CLOSED):
        options = BooleanOptions(polygon_model=model)
        expect_result(UNION, options, a, b, a)


def test_point_point():
    options = BooleanOptions()
    a = "0:0 | 1:0 # #"
    b = "0:0 | 2:0 # #"
    expect_result(UNION, options, a, b, "0:0 | 0:0 | 1:0 | 2:0 # #")
    expect_result(INTERSECTION, options, a, b, "0:0 | 0:0 # #")
    expect_result(DIFFERENCE, options, a, b, "1:0 # #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b, "1:0 | 2:0 # #")


def test_point_open_polyline():
    options = BooleanOptions(polyline_model=OPEN)
    a = "0:0 | 1:0 | 2:0 | 3:0 # #"
    b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 #"
    expect_result(UNION, options, a, b,
                  "0:0 | 2:0 | 3:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 #")
    expect_result(INTERSECTION, options, a, b, "1:0 # #")
    expect_result(DIFFERENCE, options, a, b, "0:0 | 2:0 | 3:0 # #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "0:0 | 2:0 | 3:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 #")


def test_point_semi_open_polyline():
    options = BooleanOptions(polyline_model=SEMI_OPEN)
    a = "0:0 | 1:0 | 2:0 | 3:0 # #"
    b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 #"
    expect_result(UNION, options, a, b,
                  "2:0 | 3:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 #")
    expect_result(INTERSECTION, options, a, b, "0:0 | 1:0 # #")
    expect_result(DIFFERENCE, options, a, b, "2:0 | 3:0 # #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "2:0 | 3:0 # 0:0, 1:0, 2:0 | 3:0, 3:0 #")


def test_point_closed_polyline():
    options = BooleanOptions(polyline_model=CLOSED)
    a = "0:0 | 1:0 | 2:0 | 3:0 # #"
    b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 #"
    expect_result(UNION, options, a, b, "# 0:0, 1:0, 2:0 | 3:0, 3:0 #")
    expect_result(INTERSECTION, options, a, b, "0:0 | 1:0 | 2:0 | 3:0 # #")
    expect_result(DIFFERENCE, options, a, b, "# #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:0, 1:0, 2:0 | 3:0, 3:0 #")


def test_point_polygon_interior():
    options = BooleanOptions()  # PolygonModel is irrelevant
    a = "1:1 | 4:4 # #"
    b = "# # 0:0, 0:3, 3:0"
    expect_result(UNION, options, a, b, "4:4 # # 0:0, 0:3, 3:0")
    expect_result(INTERSECTION, options, a, b, "1:1 # #")
    expect_result(DIFFERENCE, options, a, b, "4:4 # #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "4:4 # # 0:0, 0:3, 3:0")


def test_point_open_polygon_vertex():
    options = BooleanOptions(polygon_model=OPEN)
    a = "0:1 | 1:0 # #"
    b = "# # 0:0, 0:1, 1:0"
    expect_result(UNION, options, a, b, "0:1 | 1:0 # # 0:0, 0:1, 1:0")
    expect_result(INTERSECTION, options, a, b, "# #")
    expect_result(DIFFERENCE, options, a, b, "0:1 | 1:0 # #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "0:1 | 1:0 # # 0:0, 0:1, 1:0")


def test_point_semi_open_polygon_vertex():
    from s2geometry_d_ray.core import textformat
    polygon = textformat.make_polygon("0:0, 0:1, 1:0")
    assert polygon.contains_point(textformat.make_point("0:1"))
    assert not polygon.contains_point(textformat.make_point("1:0"))
    options = BooleanOptions(polygon_model=SEMI_OPEN)
    a = "0:1 | 1:0 # #"
    b = "# # 0:0, 0:1, 1:0"
    expect_result(UNION, options, a, b, "1:0 # # 0:0, 0:1, 1:0")
    expect_result(INTERSECTION, options, a, b, "0:1 # #")
    expect_result(DIFFERENCE, options, a, b, "1:0 # #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "1:0 # # 0:0, 0:1, 1:0")


def test_point_closed_polygon_vertex():
    options = BooleanOptions(polygon_model=CLOSED)
    a = "0:1 | 1:0 # #"
    b = "# # 0:0, 0:1, 1:0"
    expect_result(UNION, options, a, b, "# # 0:0, 0:1, 1:0")
    expect_result(INTERSECTION, options, a, b, "0:1 | 1:0 # #")
    expect_result(DIFFERENCE, options, a, b, "# #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:1, 1:0")


def test_polyline_vertex_open_polyline_vertex():
    options = BooleanOptions(polyline_model=OPEN)
    a = "# 0:0, 0:1, 0:2 #"
    b = "# 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 #"
    expect_result(UNION, options, a, b,
                  "# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 "
                  "| -1:2, 0:2 #")
    expect_result(INTERSECTION, options, a, b, "# 0:1, 0:1 | 0:1, 0:1 #")
    expect_result(DIFFERENCE, options, a, b, "# 0:0, 0:1, 0:2 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 "
                  "| -1:2, 0:2 #")


def test_polyline_vertex_semi_open_polyline_vertex():
    options = BooleanOptions(polyline_model=SEMI_OPEN)
    a = "# 0:0, 0:1, 0:2 #"
    b = "# 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 #"
    expect_result(UNION, options, a, b,
                  "# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 "
                  "| -1:2, 0:2 #")
    expect_result(INTERSECTION, options, a, b,
                  "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 #")
    expect_result(DIFFERENCE, options, a, b, "# 0:0, 0:1, 0:2 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 "
                  "| -1:2, 0:2 #")


def test_polyline_vertex_closed_polyline_vertex():
    options = BooleanOptions(polyline_model=CLOSED)
    a = "# 0:0, 0:1, 0:2 #"
    b = "# 0:0, 1:0 | -1:1, 0:1, 1:1 | -1:2, 0:2 #"
    expect_result(UNION, options, a, b,
                  "# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 "
                  "| -1:2, 0:2 #")
    expect_result(INTERSECTION, options, a, b,
                  "# 0:0, 0:0 | 0:0, 0:0 | 0:1, 0:1 | 0:1, 0:1 "
                  "| 0:2, 0:2 | 0:2, 0:2 #")
    expect_result(DIFFERENCE, options, a, b, "# 0:0, 0:1, 0:2 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:0, 0:1, 0:2 | 0:0, 1:0 | -1:1, 0:1, 1:1 "
                  "| -1:2, 0:2 #")


K_VERTEX_TEST_POLYGON = \
    "0:0, 0:1, 0:2, 0:3, 0:4, 0:5, 5:5, 5:4, 5:3, 5:2, 5:1, 5:0"


def test_semi_open_polygon_vertices_contained():
    from s2geometry_d_ray.core import textformat
    polygon = textformat.make_polygon(K_VERTEX_TEST_POLYGON)
    for txt in ("0:1", "0:2", "0:3", "0:4"):
        assert polygon.contains_point(textformat.make_point(txt))
    for txt in ("5:1", "5:2", "5:3", "5:4"):
        assert not polygon.contains_point(textformat.make_point(txt))


VERTEX_POLYLINES_A = ("# 1:1, 0:1 | 0:2, 1:2 | -1:3, 0:3 | 0:4, -1:4 "
                      "| 6:1, 5:1 | 5:2, 6:2 | 4:3, 5:3 | 5:4, 4:4 #")


def test_polyline_vertex_open_polygon_vertex():
    options = BooleanOptions(polygon_model=OPEN)
    a = VERTEX_POLYLINES_A
    b = "# # " + K_VERTEX_TEST_POLYGON
    difference = ("# 0:1, 0:1 | 0:2, 0:2 | -1:3, 0:3 | 0:4, -1:4"
                  "| 6:1, 5:1 | 5:2, 6:2 | 5:3, 5:3 | 5:4, 5:4 #")
    expect_result(UNION, options, a, b, difference + K_VERTEX_TEST_POLYGON)
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 0:1 | 0:2, 1:2 | 4:3, 5:3 | 5:4, 4:4 #")
    expect_result(DIFFERENCE, options, a, b, difference)
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  difference + K_VERTEX_TEST_POLYGON)


def test_polyline_vertex_open_polygon_closed_polyline_vertex():
    suffix = ("-2:0, 0:1 | -2:1, 0:2 | -2:2, 0:3 | -2:3, 0:4 | "
              "7:0, 5:1 | 7:1, 5:2 | 7:2, 5:3 | 7:3, 5:4 # "
              + K_VERTEX_TEST_POLYGON)
    options = BooleanOptions(polygon_model=OPEN)
    a = VERTEX_POLYLINES_A
    b = "# " + suffix
    prefix = "# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2"
    expect_result(UNION, options, a, b,
                  prefix + " | 0:1, 0:1 | 0:2, 0:2 | 5:3, 5:3 "
                  "| 5:4, 5:4 | " + suffix)
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4"
                  "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4"
                  "| 0:1, 0:1 | 0:2, 0:2 | 0:3, 0:3 | 0:4, 0:4"
                  "| 5:1, 5:1 | 5:2, 5:2 | 5:3, 5:3 | 5:4, 5:4 #")
    expect_result(DIFFERENCE, options, a, b, prefix + " #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  prefix + " | " + suffix)


def test_polyline_vertex_semi_open_polygon_vertex():
    options = BooleanOptions(polygon_model=SEMI_OPEN)
    a = VERTEX_POLYLINES_A
    b = "# # " + K_VERTEX_TEST_POLYGON
    difference = ("# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 "
                  "| 5:3, 5:3 | 5:4, 5:4 #")
    expect_result(UNION, options, a, b, difference + K_VERTEX_TEST_POLYGON)
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4 "
                  "| 4:3, 5:3 | 5:4, 4:4 #")
    expect_result(DIFFERENCE, options, a, b, difference)
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  difference + K_VERTEX_TEST_POLYGON)


def test_polyline_vertex_closed_polygon_vertex():
    options = BooleanOptions(polygon_model=CLOSED)
    a = VERTEX_POLYLINES_A
    b = "# # " + K_VERTEX_TEST_POLYGON
    difference = "# -1:3, 0:3 | 0:4, -1:4 | 6:1, 5:1 | 5:2, 6:2 #"
    expect_result(UNION, options, a, b, difference + K_VERTEX_TEST_POLYGON)
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 0:1 | 0:2, 1:2 | 0:3, 0:3 | 0:4, 0:4"
                  "| 5:1, 5:1 | 5:2, 5:2 | 4:3, 5:3 | 5:4, 4:4 #")
    expect_result(DIFFERENCE, options, a, b, difference)
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  difference + K_VERTEX_TEST_POLYGON)


def test_polyline_edge_polyline_edge_crossing():
    options = round_to_e(1)
    a = "# 0:0, 2:2 #"
    b = "# 2:0, 0:2 #"
    expect_result(UNION, options, a, b,
                  "# 0:0, 1:1, 2:2 | 2:0, 1:1, 0:2 #")
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 1:1 | 1:1, 1:1 #")
    expect_result(DIFFERENCE, options, a, b, "# 0:0, 2:2 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:0, 1:1, 2:2 | 2:0, 1:1, 0:2 #")


def test_polyline_edge_polyline_edge_overlap():
    # PolylineModel does not affect this: even degenerate polyline edges
    # intersect themselves.
    options = BooleanOptions(polygon_model=OPEN)
    a = "# 0:0, 1:0, 2:0, 2:5 | 3:0, 3:0 | 6:0, 5:0, 4:0 #"
    b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0 #"
    expect_result(UNION, options, a, b,
                  "# 0:0, 1:0, 2:0, 2:5 | 0:0, 1:0, 2:0 | 3:0, 3:0 "
                  "| 3:0, 3:0 | 6:0, 5:0, 4:0 | 4:0, 5:0 #")
    expect_result(INTERSECTION, options, a, b,
                  "# 0:0, 1:0, 2:0 | 0:0, 1:0, 2:0 | 3:0, 3:0 "
                  "| 3:0, 3:0 | 5:0, 4:0 | 4:0, 5:0 #")
    expect_result(DIFFERENCE, options, a, b, "# 2:0, 2:5 | 6:0, 5:0 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 2:0, 2:5 | 6:0, 5:0 #")


def test_polyline_edge_open_polygon_edge_overlap():
    options = BooleanOptions(polygon_model=OPEN)
    a = "# 1:1, 1:3, 3:3 | 3:3, 1:3 # "
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect_result(UNION, options, a, b,
                  "# 1:1, 1:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")
    expect_result(INTERSECTION, options, a, b, "# #")
    expect_result(DIFFERENCE, options, a, b,
                  "# 1:1, 1:3, 3:3 | 3:3, 1:3 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 1:1, 1:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")


def test_polyline_edge_semi_open_polygon_edge_overlap():
    from s2geometry_d_ray.core import textformat
    polygon = textformat.make_polygon("1:1, 1:3, 3:3, 3:1")
    assert not polygon.contains_point(textformat.make_point("1:1"))
    assert polygon.contains_point(textformat.make_point("1:3"))
    assert not polygon.contains_point(textformat.make_point("3:3"))
    assert not polygon.contains_point(textformat.make_point("3:1"))
    options = BooleanOptions(polygon_model=SEMI_OPEN)
    a = "# 1:1, 1:3, 3:3 | 3:3, 1:3 # "
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect_result(UNION, options, a, b,
                  "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")
    expect_result(INTERSECTION, options, a, b,
                  "# 1:3, 1:3 | 1:1, 1:3, 3:3 #")
    expect_result(DIFFERENCE, options, a, b,
                  "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 1:1, 1:1 | 3:3, 3:3 | 3:3, 1:3 # 1:1, 1:3, 3:3, 3:1")


def test_polyline_edge_closed_polygon_edge_overlap():
    options = BooleanOptions(polygon_model=CLOSED)
    a = "# 1:1, 1:3, 3:3 | 3:3, 1:3 # "
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect_result(UNION, options, a, b, "# # 1:1, 1:3, 3:3, 3:1")
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 1:3, 3:3 | 3:3, 1:3 #")
    expect_result(DIFFERENCE, options, a, b, "# #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 1:1, 1:3, 3:3, 3:1")


def test_polygon_vertex_matching():
    options = BooleanOptions(polyline_model=CLOSED, polygon_model=CLOSED)
    a = "# 0:0, 1:1 # "
    b = "# # 0:0, 1:1"
    expect_result(UNION, options, a, b, "# # 0:0, 1:1")


def test_polyline_edge_polygon_interior():
    options = BooleanOptions()  # PolygonModel is irrelevant
    a = "# 1:1, 2:2 | 3:3, 3:3 | 6:6, 7:7 | 8:8, 8:8 # "
    b = "# # 0:0, 0:5, 5:5, 5:0"
    expect_result(UNION, options, a, b,
                  "# 6:6, 7:7 | 8:8, 8:8 # 0:0, 0:5, 5:5, 5:0")
    expect_result(INTERSECTION, options, a, b,
                  "# 1:1, 2:2 | 3:3, 3:3 #")
    expect_result(DIFFERENCE, options, a, b, "# 6:6, 7:7 | 8:8, 8:8 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 6:6, 7:7 | 8:8, 8:8 # 0:0, 0:5, 5:5, 5:0")


@pytest.mark.parametrize("model", [OPEN, SEMI_OPEN, CLOSED])
def test_polygon_vertex_polygon_vertex(model):
    options = BooleanOptions(polygon_model=model)
    a = "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5"
    b = "# # 0:0, 5:3, 5:2"
    expect_result(UNION, options, a, b,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5, 0:0, 5:3, 5:2")
    expect_result(INTERSECTION, options, a, b,
                  "# # 0:0" if model == CLOSED else "# #")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5")
    if model == CLOSED:
        expect_result(DIFFERENCE, options, b, a, "# # 0:0, 5:3, 5:2")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5, 0:0, 5:3, 5:2")


def test_polygon_edge_polygon_edge_crossing():
    options = round_to_e(2)
    a = "# # 0:0, 0:2, 2:2, 2:0"
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect_result(UNION, options, a, b,
                  "# # 0:0, 0:2, 1:2, 1:3, 3:3, 3:1, 2:1, 2:0")
    expect_result(INTERSECTION, options, a, b,
                  "# # 1:1, 1:2, 2:2, 2:1")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:0")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:0; "
                  "1:2, 1:3, 3:3, 3:1, 2:1, 2:2")


def test_polygon_edge_open_polygon_edge_overlap():
    options = BooleanOptions(polygon_model=OPEN)
    a = "# # 0:0, 0:4, 2:4, 2:0"
    b = "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4"
    expect_result(UNION, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0; 0:4, 1:5, 2:4")
    expect_result(INTERSECTION, options, a, b, "# # 0:0, 1:1, 2:0")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4")


def test_polygon_edge_semi_open_polygon_edge_overlap():
    options = BooleanOptions(polygon_model=SEMI_OPEN)
    a = "# # 0:0, 0:4, 2:4, 2:0"
    b = "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4"
    expect_result(UNION, options, a, b, "# # 0:0, 0:4, 1:5, 2:4, 2:0")
    expect_result(INTERSECTION, options, a, b, "# # 0:0, 1:1, 2:0")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4")


def test_polygon_edge_closed_polygon_edge_overlap():
    options = BooleanOptions(polygon_model=CLOSED)
    a = "# # 0:0, 0:4, 2:4, 2:0"
    b = "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4"
    expect_result(UNION, options, a, b, "# # 0:0, 0:4, 1:5, 2:4, 2:0")
    expect_result(INTERSECTION, options, a, b,
                  "# # 0:0, 1:1, 2:0; 0:4, 2:4")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 2:4, 2:0, 1:1; 0:4, 1:5, 2:4")


def test_polygon_polygon_interior():
    options = BooleanOptions()  # PolygonModel is irrelevant
    a = "# # 0:0, 0:4, 4:4, 4:0"
    b = "# # 1:1, 1:2, 2:2, 2:1; 5:5, 5:6, 6:6, 6:5"
    expect_result(UNION, options, a, b,
                  "# # 0:0, 0:4, 4:4, 4:0; 5:5, 5:6, 6:6, 6:5")
    expect_result(INTERSECTION, options, a, b,
                  "# # 1:1, 1:2, 2:2, 2:1")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 4:4, 4:0; 2:1, 2:2, 1:2, 1:1")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:4, 4:4, 4:0; 2:1, 2:2, 1:2, 1:1; "
                  "5:5, 5:6, 6:6, 6:5")


def test_polygon_edges_degenerate_after_snapping():
    options = round_to_e(0)
    a = "# # 0:-1, 0:1, 0.1:1, 0.1:-1"
    b = "# # -1:0.1, 1:0.1, 1:0, -1:0"
    expect_result(UNION, options, a, b,
                  "# # 0:-1, 0:-1, 0:0, 0:1, 0:1, 0:0 | "
                  "-1:0, -1:0, 0:0, 1:0, 1:0, 0:0")
    expect_result(INTERSECTION, options, a, b, "# # 0:0, 0:0, 0:0, 0:0")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:-1, 0:-1, 0:0, 0:1, 0:1, 0:0 | 0:0, 0:0")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:-1, 0:-1, 0:0, 0:1, 0:1, 0:0 | "
                  "-1:0, -1:0, 0:0, 1:0, 1:0, 0:0 | 0:0, 0:0, 0:0, 0:0")


def test_three_overlapping_bars():
    options = round_to_e(2)
    a = "# # 0:0, 0:2, 3:2, 3:0; 0:3, 0:5, 3:5, 3:3"
    b = "# # 1:1, 1:4, 2:4, 2:1"
    expect_result(UNION, options, a, b,
                  "# # 0:0, 0:2, 1:2, 1:3, 0:3, 0:5, 3:5, 3:3, 2:3, "
                  "2:2, 3:2, 3:0")
    expect_result(INTERSECTION, options, a, b,
                  "# # 1:1, 1:2, 2:2, 2:1; 1:3, 1:4, 2:4, 2:3")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0; "
                  "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0; "
                  "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3; "
                  "1:2, 1:3, 2:3, 2:2")


def test_four_overlapping_bars():
    options = round_to_e(2)
    a = "# # 1:88, 1:93, 2:93, 2:88; -1:88, -1:93, 0:93, 0:88"
    b = "# # -2:89, -2:90, 3:90, 3:89; -2:91, -2:92, 3:92, 3:91"
    expect_result(UNION, options, a, b,
                  "# # -1:88, -1:89, -2:89, -2:90, -1:90, -1:91, -2:91, "
                  "-2:92, -1:92, -1:93, 0:93, 0:92, 1:92, 1:93, 2:93, "
                  "2:92, 3:92, 3:91, 2:91, 2:90, 3:90, 3:89, 2:89, 2:88, "
                  "1:88, 1:89, 0:89, 0:88; 0:90, 1:90, 1:91, 0:91")
    expect_result(INTERSECTION, options, a, b,
                  "# # 1:89, 1:90, 2:90, 2:89; 1:91, 1:92, 2:92, 2:91; "
                  "-1:89, -1:90, 0:90, 0:89; -1:91, -1:92, 0:92, 0:91")
    expect_result(DIFFERENCE, options, a, b,
                  "# # 1:88, 1:89, 2:89, 2:88; 1:90, 1:91, 2:91, 2:90; "
                  "1:92, 1:93, 2:93, 2:92; -1:88, -1:89, 0:89, 0:88; "
                  "-1:90, -1:91, 0:91, 0:90; -1:92, -1:93, 0:93, 0:92")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # 1:88, 1:89, 2:89, 2:88; -1:88, -1:89, 0:89, 0:88; "
                  "1:90, 1:91, 2:91, 2:90; -1:90, -1:91, 0:91, 0:90; "
                  "1:92, 1:93, 2:93, 2:92; -1:92, -1:93, 0:93, 0:92; "
                  "-2:89, -2:90, -1:90, -1:89; -2:91, -2:92, -1:92, -1:91; "
                  "0:89, 0:90, 1:90, 1:89; 0:91, 0:92, 1:92, 1:91; "
                  "2:89, 2:90, 3:90, 3:89; 2:91, 2:92, 3:92, 3:91")


def test_overlapping_doughnuts():
    options = round_to_e(1)
    a = ("# # -1:-93, -1:-89, 3:-89, 3:-93; "
         "0:-92, 2:-92, 2:-90, 0:-90")
    b = ("# # -3:-91, -3:-87, 1:-87, 1:-91; "
         "-2:-90, 0:-90, 0:-88, -2:-88")
    expect_result(UNION, options, a, b,
                  "# # -1:-93, -1:-91, -3:-91, -3:-87, 1:-87, 1:-89, "
                  "3:-89, 3:-93; "
                  "0:-92, 2:-92, 2:-90, 1:-90, 1:-91, 0:-91; "
                  "-2:-90, -1:-90, -1:-89, 0:-89, 0:-88, -2:-88")
    expect_result(INTERSECTION, options, a, b,
                  "# # -1:-91, -1:-90, 0:-90, 0:-91; "
                  "0:-90, 0:-89, 1:-89, 1:-90")
    expect_result(DIFFERENCE, options, a, b,
                  "# # -1:-93, -1:-91, 0:-91, 0:-92, 2:-92, "
                  "2:-90, 1:-90, 1:-89, 3:-89, 3:-93; "
                  "-1:-90, -1:-89, 0:-89, 0:-90")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# # -1:-93, -1:-91, 0:-91, 0:-92, 2:-92, "
                  "2:-90, 1:-90, 1:-89, 3:-89, 3:-93; "
                  "-3:-91, -3:-87, 1:-87, 1:-89, 0:-89, 0:-88, -2:-88, "
                  "-2:-90, -1:-90, -1:-91; "
                  "-1:-90, -1:-89, 0:-89, 0:-90; "
                  "1:-91, 0:-91, 0:-90, 1:-90")


def test_polyline_entering_rectangle():
    options = round_to_e(1)
    a = "# 0:0, 2:2 #"
    b = "# # 1:1, 1:3, 3:3, 3:1"
    expect_result(UNION, options, a, b,
                  "# 0:0, 1:1 # 1:1, 1:3, 3:3, 3:1")
    expect_result(INTERSECTION, options, a, b, "# 1:1, 2:2 #")
    expect_result(DIFFERENCE, options, a, b, "# 0:0, 1:1 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:0, 1:1 # 1:1, 1:3, 3:3, 3:1")


def test_polyline_crossing_rectangle_twice():
    options = round_to_e(1)
    a = "# 0:-5, 0:5, 5:0, -5:0 #"
    b = "# # 1:1, 1:-1, -1:-1, -1:1"
    expect_result(UNION, options, a, b,
                  "# 0:-5, 0:-1 | 0:1, 0:5, 5:0, 1:0 | -1:0, -5:0 "
                  "# 1:1, 1:0, 1:-1, 0:-1, -1:-1, -1:0, -1:1, 0:1")
    expect_result(INTERSECTION, options, a, b,
                  "# 0:-1, 0:0, 0:1 | 1:0, 0:0, -1:0 #")
    expect_result(DIFFERENCE, options, a, b,
                  "# 0:-5, 0:-1 | 0:1, 0:5, 5:0, 1:0 | -1:0, -5:0 #")
    expect_result(SYMMETRIC_DIFFERENCE, options, a, b,
                  "# 0:-5, 0:-1 | 0:1, 0:5, 5:0, 1:0 | -1:0, -5:0 "
                  "# 1:1, 1:0, 1:-1, 0:-1, -1:-1, -1:0, -1:1, 0:1")
