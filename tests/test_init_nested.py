"""Polygon.init_nested (S2Polygon.initNested semantics): loop depths =
number of properly-containing loops, preorder output (parents before
children), exercised on the reference layer fixtures (nested squares,
the ComplexNesting arrangement, loops touching at a common point)."""

import numpy as np

from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon


def _loops(text):
    return [Loop(np.asarray(textformat.parse_points(chunk)))
            for chunk in text.split(";") if chunk.strip()]


def _depths_by_first_vertex(poly):
    return {textformat.to_string_latlngs(lp.vertices[:1]): lp.depth
            for lp in poly.loops}


def test_three_loops_nested_pair():
    poly = Polygon.init_nested(_loops(
        "0:1, 1:1, 0:0; 3:3, 3:6, 6:6, 6:3; 4:4, 4:5, 5:5, 5:4"))
    d = _depths_by_first_vertex(poly)
    assert d["0:1"] == 0
    assert d["3:3"] == 0
    assert d["4:4"] == 1
    # Preorder: the inner square directly follows its parent.
    order = [textformat.to_string_latlngs(lp.vertices[:1])
             for lp in poly.loops]
    assert order.index("4:4") == order.index("3:3") + 1


def test_complex_nesting_depths():
    """The ComplexNesting fixture (s2polygon_layer_test.d:213-231):
    depth of each loop equals the count of loops properly containing
    it, verified independently via contains_nested."""
    loops = _loops(
        "47:15, 47:5, 5:5, 5:15; "
        "35:12, 35:7, 27:7, 27:12; "
        "1:50, 50:50, 50:1, 1:1; "
        "42:22, 10:22, 10:25, 42:25; "
        "47:30, 47:17, 5:17, 5:30; "
        "7:27, 45:27, 45:20, 7:20; "
        "37:7, 37:12, 45:12, 45:7; "
        "47:47, 47:32, 5:32, 5:47; "
        "50:60, 50:55, 1:55, 1:60; "
        "25:7, 17:7, 17:12, 25:12; "
        "7:7, 7:12, 15:12, 15:7")
    poly = Polygon.init_nested(list(loops))
    # Independent depth oracle.
    expect = {}
    for i, li in enumerate(loops):
        expect[id(li)] = sum(1 for j, lj in enumerate(loops)
                             if i != j and lj.contains_nested(li))
    for lp in poly.loops:
        assert lp.depth == expect[id(lp)]
    # Parents precede children.
    for k, lp in enumerate(poly.loops):
        if lp.depth > 0:
            assert any(prev.depth == lp.depth - 1
                       and prev.contains_nested(lp)
                       for prev in poly.loops[:k])


def test_touching_loops_nest():
    poly = Polygon.init_nested(_loops(
        "0:0, 0:10, 10:10, 10:0; "
        "0:0, 1:9, 9:9, 9:1; "
        "0:0, 2:8, 8:8, 8:2"))
    depths = sorted(lp.depth for lp in poly.loops)
    assert depths == [0, 1, 2]


def test_empty_and_single():
    assert Polygon.init_nested([]).is_empty()
    single = Polygon.init_nested(_loops("0:0, 0:1, 1:1"))
    assert len(single.loops) == 1 and single.loops[0].depth == 0
