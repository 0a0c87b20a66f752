"""initializeToComplement port (s2polygon.d:1069-1135) — structural
invert bookkeeping plus the pointwise identities from the reference's
checkComplements family (test/s2/s2polygon_test.d:345-612), evaluated
with the exact PIP instead of the constructing boolean ops where the
identity is pointwise by definition."""

from __future__ import annotations

import numpy as np

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon
from s2geometry_d_ray.core.polygon_ops import (boolean_op, boolean_union,
                                               initialize_to_complement)


def _grid_points(n=60):
    lat = np.linspace(-85, 85, n)
    lon = np.linspace(-179, 179, n)
    la, lo = np.meshgrid(lat, lon)
    x, y, z = coords.latlng_to_xyz(la.ravel(), lo.ravel())
    return np.stack([x, y, z], axis=1)


def _shell(clat, clon, r, nv=24, depth=0):
    return Loop.make_regular(clat, clon, r, nv, depth=depth)


def _fixtures():
    single = Polygon([_shell(10, 20, 0.2)])
    with_hole = Polygon([_shell(-30, 50, 0.3),
                         _shell(-30, 50, 0.12, depth=1)])
    two_shells = Polygon.init_nested([_shell(40, -120, 0.15),
                                      _shell(-50, 100, 0.2)])
    nested3 = Polygon.init_nested([_shell(0, 0, 0.4),
                                   _shell(0, 0, 0.25),
                                   _shell(0, 0, 0.1)])
    return {"single": single, "with_hole": with_hole,
            "two_shells": two_shells, "nested3": nested3}


def test_complement_pointwise_negation():
    pts = _grid_points()
    for name, poly in _fixtures().items():
        comp = initialize_to_complement(poly)
        got = comp.contains_points(pts)
        want = ~poly.contains_points(pts)
        assert (got == want).all(), name


def test_double_complement_is_identity():
    for name, poly in _fixtures().items():
        back = initialize_to_complement(initialize_to_complement(poly))
        assert len(back.loops) == len(poly.loops), name
        pts = _grid_points(40)
        assert (back.contains_points(pts)
                == poly.contains_points(pts)).all(), name
        assert [lp.depth for lp in back.loops] \
            == [lp.depth for lp in poly.loops], name


def test_double_complement_exact_structure_single_and_hole():
    """For preorder inputs the double complement restores the exact
    loop order, depths, and vertex arrays."""
    for name in ("single", "with_hole"):
        poly = _fixtures()[name]
        back = initialize_to_complement(initialize_to_complement(poly))
        for lp0, lp1 in zip(poly.loops, back.loops):
            assert lp0.depth == lp1.depth
            assert np.array_equal(lp0.vertices, lp1.vertices), name


def test_complement_depth_bookkeeping_shell_hole():
    poly = _fixtures()["with_hole"]
    comp = initialize_to_complement(poly)
    # Inverted shell first at depth 0; the former hole becomes a
    # sibling shell at depth 0 (s2polygon.d:1123-1129).
    assert [lp.depth for lp in comp.loops] == [0, 0]
    assert np.array_equal(comp.loops[0].vertices,
                          poly.loops[0].vertices[::-1])


def test_complement_empty_full():
    assert initialize_to_complement(Polygon.full()).is_empty()
    assert initialize_to_complement(Polygon.init_nested([])).is_full


def test_difference_from_full_is_complement():
    poly = _fixtures()["with_hole"]
    out = boolean_op("difference", Polygon.full(), poly)
    pts = _grid_points()
    assert (out.contains_points(pts)
            == ~poly.contains_points(pts)).all()


def test_demorgan_on_constructed_union():
    """~(A u B) == ~A n ~B pointwise, with the union CONSTRUCTED by the
    boolean machinery and its complement taken structurally."""
    a = Polygon([_shell(10, 20, 0.15, nv=32)])
    b = Polygon([_shell(10, 26, 0.18, nv=32)])
    u = boolean_union(a, b)
    comp_u = initialize_to_complement(u)
    pts = _grid_points()
    got = comp_u.contains_points(pts)
    want = ~a.contains_points(pts) & ~b.contains_points(pts)
    assert (got == want).all()


def test_complement_two_top_level_shells_tiebreak_deterministic():
    poly = _fixtures()["two_shells"]
    c1 = initialize_to_complement(poly)
    c2 = initialize_to_complement(poly)
    assert [lp.depth for lp in c1.loops] == [lp.depth for lp in c2.loops]
    for l1, l2 in zip(c1.loops, c2.loops):
        assert np.array_equal(l1.vertices, l2.vertices)
