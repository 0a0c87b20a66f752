"""Port of the reference S2Cap suite (test/s2/s2cap_test.d) against
core.cap.Cap: basic/complement/containment identities, rect bounds, cell
relations across all faces, expansion, centroid, and unite."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core import metrics
from s2geometry_d_ray.core.cap import Cap, chord2_from_angle
from s2geometry_d_ray.core.cell import Cell

EPS = 1e-15
DBL_EPS = 2.220446049250313e-16


def _ll(lat_deg, lng_deg):
    x, y, z = coords.latlng_to_xyz(float(lat_deg), float(lng_deg))
    return (float(x), float(y), float(z))


def _norm(p):
    n = math.sqrt(p[0] ** 2 + p[1] ** 2 + p[2] ** 2)
    return (p[0] / n, p[1] / n, p[2] / n)


def _face_cell(face):
    return np.uint64((face << 61) | (1 << 60))


def test_basic():
    """s2cap_test.d:48-158."""
    empty, full = Cap.empty(), Cap.full()
    assert empty.is_valid() and empty.is_empty()
    assert empty.complement().is_full()
    assert full.is_valid() and full.is_full()
    assert full.complement().is_empty()
    assert full.height() == 2
    assert full.radius_radians() == pytest.approx(math.pi, abs=1e-4)

    # Out-of-range angle arguments.
    assert Cap.from_center_angle((1, 0, 0), -20).is_empty()
    assert Cap.from_center_angle((1, 0, 0), 5).is_full()

    # Containment / intersection of empty and full.
    assert empty.contains_cap(empty)
    assert full.contains_cap(empty)
    assert full.contains_cap(full)
    assert not empty.interior_intersects(empty)
    assert full.interior_intersects(full)
    assert not full.interior_intersects(empty)

    # Singleton caps.
    xaxis = Cap.from_point((1.0, 0.0, 0.0))
    assert xaxis.contains_point((1, 0, 0))
    assert not xaxis.contains_point(_norm((1, 1e-20, 0)))
    assert xaxis.radius_radians() == 0.0
    yaxis = Cap.from_point((0.0, 1.0, 0.0))
    assert not yaxis.contains_point(xaxis.center)
    assert xaxis.height() == 0.0

    # Complement of a singleton is full; complement of THAT is empty.
    xcomp = xaxis.complement()
    assert xcomp.is_valid() and xcomp.is_full()
    assert xcomp.contains_point(xaxis.center)
    assert xcomp.complement().is_valid()
    assert xcomp.complement().is_empty()
    assert not xcomp.complement().contains_point(xaxis.center)

    # Tiny caps represented accurately.
    tiny_rad = 1e-10
    tiny = Cap.from_center_angle(_norm((1, 2, 3)), tiny_rad)
    tangent = _norm(np.cross(tiny.center, (3, 2, 1)))
    p_in = tuple(np.asarray(tiny.center) + 0.99 * tiny_rad
                 * np.asarray(tangent))
    p_out = tuple(np.asarray(tiny.center) + 1.01 * tiny_rad
                  * np.asarray(tangent))
    assert tiny.contains_point(p_in)
    assert not tiny.contains_point(p_out)

    # Hemispherical cap.
    hemi = Cap.from_center_height(_norm((1, 0, 1)), 1.0)
    assert tuple(-np.asarray(hemi.center)) == hemi.complement().center
    assert hemi.complement().height() == 1
    assert hemi.contains_point((1, 0, 0))
    assert not hemi.complement().contains_point((1, 0, 0))
    assert hemi.contains_point(_norm((1, 0, -(1 - EPS))))
    assert not hemi.interior_contains(_norm((1, 0, -(1 + EPS))))

    # Concave cap with explicit error accounting (s2cap_test.d:122-136).
    center = _ll(80, 10)
    radius2 = chord2_from_angle(math.radians(150))
    max_error = (4.5 * DBL_EPS * radius2 + 16 * DBL_EPS * DBL_EPS
                 + DBL_EPS * radius2 + 3 * DBL_EPS)
    concave = Cap(center, radius2)
    concave_min = Cap(center, max(0.0, radius2 - max_error))
    concave_max = Cap(center, min(4.0, radius2 + max_error))
    assert concave_max.contains_point(_ll(-70, 10))
    assert not concave_min.contains_point(_ll(-70, 10))
    assert concave_max.contains_point(_ll(-50, -170))
    assert not concave_min.contains_point(_ll(-50, -170))

    # Cap containment.
    assert not empty.contains_cap(xaxis)
    assert not empty.interior_intersects(xaxis)
    assert full.contains_cap(xaxis)
    assert full.interior_intersects(xaxis)
    assert not xaxis.contains_cap(full)
    assert not xaxis.interior_intersects(full)
    assert xaxis.contains_cap(xaxis)
    assert not xaxis.interior_intersects(xaxis)
    assert xaxis.contains_cap(empty)
    assert not xaxis.interior_intersects(empty)
    assert hemi.contains_cap(tiny)
    assert hemi.contains_cap(
        Cap.from_center_angle((1.0, 0.0, 0.0), math.pi / 4 - EPS))
    assert not hemi.contains_cap(
        Cap.from_center_angle((1.0, 0.0, 0.0), math.pi / 4 + EPS))
    assert concave.contains_cap(hemi)
    assert concave.interior_intersects(hemi.complement())
    assert not concave.contains_cap(
        Cap.from_center_height(tuple(-np.asarray(concave.center)), 0.1))


def test_get_rect_bound():
    """s2cap_test.d:160-207."""
    assert Cap.empty().get_rect_bound().is_empty()
    assert Cap.full().get_rect_bound().is_full()
    deg_eps = 1e-13

    # Cap that includes the south pole.
    rect = Cap.from_center_angle(_ll(-45, 57),
                                 math.radians(50)).get_rect_bound()
    assert math.degrees(rect.lat_lo) == pytest.approx(-90, abs=deg_eps)
    assert math.degrees(rect.lat_hi) == pytest.approx(5, abs=deg_eps)
    assert rect.lng.is_full()

    # Cap tangent to the north pole.
    rect = Cap.from_center_angle(_norm((1, 0, 1)),
                                 math.pi / 4 + 1e-15).get_rect_bound()
    assert rect.lat_lo == pytest.approx(0, abs=EPS)
    assert rect.lat_hi == pytest.approx(math.pi / 2, abs=EPS)
    assert rect.lng.is_full()

    rect = Cap.from_center_angle(_norm((1, 0, 1)), math.radians(
        45 + 2e-14)).get_rect_bound()
    assert math.degrees(rect.lat_lo) == pytest.approx(0, abs=deg_eps)
    assert math.degrees(rect.lat_hi) == pytest.approx(90, abs=deg_eps)
    assert rect.lng.is_full()

    # The eastern hemisphere.
    rect = Cap.from_center_angle((0.0, 1.0, 0.0),
                                 math.pi / 2 + 2e-16).get_rect_bound()
    assert math.degrees(rect.lat_lo) == pytest.approx(-90, abs=deg_eps)
    assert math.degrees(rect.lat_hi) == pytest.approx(90, abs=deg_eps)
    assert rect.lng.is_full()

    # A cap centered on the equator.
    rect = Cap.from_center_angle(_ll(0, 50),
                                 math.radians(20)).get_rect_bound()
    assert math.degrees(rect.lat_lo) == pytest.approx(-20, abs=deg_eps)
    assert math.degrees(rect.lat_hi) == pytest.approx(20, abs=deg_eps)
    assert math.degrees(rect.lng.lo) == pytest.approx(30, abs=deg_eps)
    assert math.degrees(rect.lng.hi) == pytest.approx(70, abs=deg_eps)

    # A cap centered on the north pole.
    rect = Cap.from_center_angle(_ll(90, 123),
                                 math.radians(10)).get_rect_bound()
    assert math.degrees(rect.lat_lo) == pytest.approx(80, abs=deg_eps)
    assert math.degrees(rect.lat_hi) == pytest.approx(90, abs=deg_eps)
    assert rect.lng.is_full()


def test_s2cell_methods():
    """Cap-vs-cell relations across all faces (s2cap_test.d:209-275)."""
    face_radius = math.atan(math.sqrt(2.0))
    for face in range(6):
        root_cell = Cell(_face_cell(face))
        # Leaf cell at the midpoint of the v=1 edge.
        p = coords.face_uv_to_xyz_scalar(face, 0.0, 1 - EPS) \
            if hasattr(coords, "face_uv_to_xyz_scalar") else None
        if p is None:
            x, y, z = coords.face_uv_to_xyz(face, np.array([0.0]),
                                            np.array([1 - EPS]))
            p = (float(x[0]), float(y[0]), float(z[0]))
        p = _norm(p)
        edge_cell = Cell(np.uint64(ci.cellid_from_xyz(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0]))
        # Leaf cell at the u=1, v=1 corner.
        x, y, z = coords.face_uv_to_xyz(face, np.array([1 - EPS]),
                                        np.array([1 - EPS]))
        q = _norm((float(x[0]), float(y[0]), float(z[0])))
        corner_cell = Cell(np.uint64(ci.cellid_from_xyz(
            np.array([q[0]]), np.array([q[1]]), np.array([q[2]]))[0]))

        assert Cap.full().contains_cell(root_cell)
        assert not Cap.empty().may_intersect_cell(root_cell)

        # Bounding caps of Hilbert-adjacent leaf cells near the corner.
        first = int(corner_cell.id) - 3 * 2
        last = int(corner_cell.id) + 4 * 2
        cid = first
        while cid < last:
            cell = Cell(np.uint64(cid))
            assert cell.get_cap_bound().contains_cell(corner_cell) == \
                (cid == int(corner_cell.id))
            assert cell.get_cap_bound().may_intersect_cell(corner_cell) == \
                (ci.parent_scalar(cid, 29) == ci.parent_scalar(
                    int(corner_cell.id), 29))
            cid += 2

        anti_face = (face + 3) % 6
        for cap_face in range(6):
            # Face normal of cap_face.
            x, y, z = coords.face_uv_to_xyz(cap_face, np.array([0.0]),
                                            np.array([0.0]))
            center = _norm((float(x[0]), float(y[0]), float(z[0])))
            covering = Cap.from_center_angle(center, face_radius + EPS)
            assert covering.contains_cell(root_cell) == (cap_face == face)
            assert covering.may_intersect_cell(root_cell) == \
                (cap_face != anti_face)
            edge_dot = float(np.dot(center, edge_cell.center()))
            assert covering.contains_cell(edge_cell) == (edge_dot > 0.1)
            assert covering.may_intersect_cell(edge_cell) == \
                covering.contains_cell(edge_cell)
            assert covering.contains_cell(corner_cell) == (cap_face == face)
            assert covering.may_intersect_cell(corner_cell) == \
                (float(np.dot(center, corner_cell.center())) > 0)

            bulging = Cap.from_center_angle(center, math.pi / 4 + EPS)
            assert not bulging.contains_cell(root_cell)
            assert bulging.may_intersect_cell(root_cell) == \
                (cap_face != anti_face)
            assert bulging.contains_cell(edge_cell) == (cap_face == face)
            assert bulging.may_intersect_cell(edge_cell) == (edge_dot > 0.1)
            assert not bulging.contains_cell(corner_cell)
            assert not bulging.may_intersect_cell(corner_cell)

            singleton = Cap.from_center_angle(center, 0.0)
            assert singleton.may_intersect_cell(root_cell) == \
                (cap_face == face)
            assert not singleton.may_intersect_cell(edge_cell)
            assert not singleton.may_intersect_cell(corner_cell)


def test_get_cell_union_bound_level1_radius():
    """A cap the width of a level-1 cell needs only 3 face cells
    (s2cap_test.d:277-286)."""
    from s2geometry_d_ray.core.coverer import _cap_cell_union_bound
    cap = Cap.from_center_angle(_norm((1, 1, 1)),
                                metrics.MIN_WIDTH.get_value(1))
    covering = _cap_cell_union_bound(cap)
    assert len(covering) == 3


def test_expanded():
    """s2cap_test.d:288-298."""
    assert Cap.empty().expanded(2.0).is_empty()
    assert Cap.full().expanded(2.0).is_full()
    cap50 = Cap.from_center_angle((1.0, 0.0, 0.0), math.radians(50))
    cap51 = Cap.from_center_angle((1.0, 0.0, 0.0), math.radians(51))
    assert cap50.expanded(0.0).approx_equals(cap50)
    assert cap50.expanded(math.radians(1)).approx_equals(cap51)
    assert not cap50.expanded(math.radians(129.99)).is_full()
    assert cap50.expanded(math.radians(130.01)).is_full()


def test_get_centroid():
    """s2cap_test.d:300-315."""
    assert np.allclose(Cap.empty().get_centroid(), 0.0)
    assert np.linalg.norm(Cap.full().get_centroid()) <= 1e-15
    rng = np.random.default_rng(3)
    for _ in range(100):
        center = rng.normal(size=3)
        center /= np.linalg.norm(center)
        height = rng.uniform(0.0, 2.0)
        cap = Cap.from_center_height(tuple(center), height)
        centroid = cap.get_centroid()
        expected = center * (1.0 - height / 2.0) * cap.get_area()
        assert np.linalg.norm(expected - centroid) <= 1e-15


def test_unite():
    """s2cap_test.d:317-364."""
    a = Cap.from_center_angle(_ll(50, 10), math.radians(0.2))
    b = Cap.from_center_angle(_ll(50, 10), math.radians(0.3))
    assert b.contains_cap(a)
    u = a.unite(b)
    assert u.center == b.center and u.radius2 == b.radius2
    assert a.unite(Cap.full()).is_full()
    u = a.unite(Cap.empty())
    assert u.center == a.center and u.radius2 == a.radius2

    c = Cap.from_center_angle(_ll(51, 11), math.radians(1.5))
    assert c.contains_cap(a)
    assert a.unite(c).center == c.center
    assert a.unite(c).radius2 == c.radius2

    d = Cap.from_center_angle(_ll(51, 11), math.radians(0.1))
    assert not d.contains_cap(a)
    assert not d.intersects_cap(a)
    assert a.unite(d).approx_equals(d.unite(a))
    ud = a.unite(d)
    lat = math.degrees(math.atan2(ud.center[2], math.hypot(ud.center[0],
                                                           ud.center[1])))
    lng = math.degrees(math.atan2(ud.center[1], ud.center[0]))
    assert lat == pytest.approx(50.4588, abs=0.001)
    assert lng == pytest.approx(10.4525, abs=0.001)
    assert math.degrees(ud.radius_radians()) == pytest.approx(0.7425,
                                                              abs=0.001)

    e = Cap.from_center_angle(_ll(50.3, 10.3), math.radians(0.2))
    assert not e.contains_cap(a)
    assert e.intersects_cap(a)
    assert a.unite(e).approx_equals(e.unite(a))
    ue = a.unite(e)
    lat = math.degrees(math.atan2(ue.center[2], math.hypot(ue.center[0],
                                                           ue.center[1])))
    lng = math.degrees(math.atan2(ue.center[1], ue.center[0]))
    assert lat == pytest.approx(50.1500, abs=0.001)
    assert lng == pytest.approx(10.1495, abs=0.001)
    assert math.degrees(ue.radius_radians()) == pytest.approx(0.3781,
                                                              abs=0.001)

    f = Cap.from_center_angle((0.0, 0.0, 1.0), math.radians(150))
    g = Cap.from_center_angle((0.0, 1.0, 0.0), math.radians(150))
    assert f.unite(g).is_full()

    hemi = Cap.from_center_height((0.0, 0.0, 1.0), 1.0)
    assert hemi.unite(hemi.complement()).is_full()
