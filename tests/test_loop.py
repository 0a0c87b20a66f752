"""Port of the reference S2Loop suite (test/s2/s2loop_test.d) against
core.loop.Loop: rect bounds, area/centroid/turning-angle, normalization,
point containment, the full loop-relation fixture table, cell-loop
relations, boundary comparisons, distance methods, and regular loops."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.edge import interpolate
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.predicates import ORIGIN, crossing_sign, sign
from s2geometry_d_ray.core.rect import BOUNDER_MAX_ERROR, LatLngRect
from s2geometry_d_ray.core.textformat import make_loop, make_point

RECT_ERR_LAT, RECT_ERR_LNG = BOUNDER_MAX_ERROR


def _ll(lat_deg, lng_deg):
    x, y, z = coords.latlng_to_xyz(float(lat_deg), float(lng_deg))
    return (float(x), float(y), float(z))


def _angle(p, q):
    return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                      float(np.dot(p, q)))


def _lat_deg(p):
    return math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))


def _lng_deg(p):
    return math.degrees(math.atan2(p[1], p[0]))


def _rotate(loop):
    """New loop starting at vertex 1 (s2loop_test.d:267-274)."""
    v = np.concatenate([loop.vertices[1:], loop.vertices[:1]])
    return Loop(v, loop.depth)


@pytest.fixture(scope="module")
def t():
    """The S2LoopTestBase fixture loops (s2loop_test.d:55-208)."""
    class T:
        pass

    f = T()
    f.all_loops = []

    def add(loop_or_str):
        lp = make_loop(loop_or_str) if isinstance(loop_or_str, str) \
            else loop_or_str
        f.all_loops.append(lp)
        return lp

    f.empty = add(Loop.empty())
    f.full = add(Loop.full())
    f.north_hemi = add("0:-180, 0:-90, 0:0, 0:90")
    f.north_hemi3 = add("0:-180, 0:-60, 0:60")
    f.south_hemi = add("0:90, 0:0, 0:-90, 0:-180")
    f.west_hemi = add("0:-180, -90:0, 0:0, 90:0")
    f.east_hemi = add("90:0, 0:0, -90:0, 0:-180")
    f.near_hemi = add("0:-90, -90:0, 0:90, 90:0")
    f.far_hemi = add("90:0, 0:90, -90:0, 0:-90")
    f.candy_cane = add("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
    f.small_ne_cw = add("35:20, 45:20, 40:25")
    f.arctic_80 = add("80:-150, 80:-30, 80:90")
    f.antarctic_80 = add("-80:120, -80:0, -80:-120")
    f.line_triangle = add("0:1, 0:2, 0:3")
    f.skinny_chevron = add("0:0, -1e-320:80, 0:1e-320, 1e-320:80")
    f.loop_a = add("0:178, -1:180, 0:-179, 1:-180")
    f.loop_b = add("0:179, -1:180, 0:-178, 1:-180")
    f.a_intersect_b = add("0:179, -1:180, 0:-179, 1:-180")
    f.a_union_b = add("0:178, -1:180, 0:-178, 1:-180")
    f.a_minus_b = add("0:178, -1:180, 0:179, 1:-180")
    f.b_minus_a = add("0:-179, -1:180, 0:-178, 1:-180")
    f.loop_c = add("0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180")
    f.loop_d = add("0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180")
    f.loop_e = add("0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30")
    f.loop_f = add("0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34")
    f.loop_g = add("0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, "
                   "0:41, 0:44, 30:44, 30:30")
    f.loop_h = add("0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, "
                   "0:41, 0:44, 30:44, 30:30")
    f.loop_i = add("10:34, 0:34, -10:34, -10:36, 0:36, 10:36")
    snapped = []
    for s in ("0:178", "-1:180", "0:-179", "1:-180"):
        cid = np.array([ci.cellid_from_xyz(
            *np.array(make_point(s))[:, None])[0]], dtype=np.uint64)
        x, y, z = ci.to_xyz(cid)
        snapped.append((float(x[0]), float(y[0]), float(z[0])))
    f.snapped_loop_a = Loop(np.array(snapped))
    return f


def test_get_rect_bound(t):
    """s2loop_test.d:237-265."""
    assert t.empty.bound.is_empty()
    assert t.full.bound.is_full()
    assert t.candy_cane.bound.lng.is_full()
    assert math.degrees(t.candy_cane.bound.lat_lo) < -20
    assert math.degrees(t.candy_cane.bound.lat_hi) > 10
    assert t.small_ne_cw.bound.is_full()
    arctic = LatLngRect.from_degrees(80, -180, 90, 180)
    antarctic = LatLngRect.from_degrees(-90, -180, -80, 180)
    assert t.arctic_80.bound.approx_equals(arctic, RECT_ERR_LAT,
                                           RECT_ERR_LNG)
    assert t.antarctic_80.bound.approx_equals(antarctic, RECT_ERR_LAT,
                                              RECT_ERR_LNG)

    # The complement of arctic_80: the highest latitude of each edge is
    # attained at its midpoint.
    inv = t.arctic_80.clone()
    inv.invert()
    mid = 0.5 * (np.asarray(inv.vertex(0)) + np.asarray(inv.vertex(1)))
    mid_lat = math.atan2(mid[2], math.hypot(mid[0], mid[1]))
    assert abs(inv.bound.lat_hi - mid_lat) <= RECT_ERR_LAT

    assert t.south_hemi.bound.lng.is_full()
    assert abs(t.south_hemi.bound.lat_lo - (-0.5 * math.pi)) <= RECT_ERR_LAT
    assert abs(t.south_hemi.bound.lat_hi - 0.0) <= RECT_ERR_LAT


def test_area_consistent_with_turning_angle(t):
    """Gauss-Bonnet: area == 2*pi - turning angle (s2loop_test.d:276-291)."""
    for loop in t.all_loops:
        area = loop.get_area()
        gauss = 2 * math.pi - loop.get_turning_angle()
        assert abs(area - gauss) <= 1e-9


def test_get_area_consistent_with_sign():
    """Degenerate equator loops: area ~0 if CCW, ~4pi if CW
    (s2loop_test.d:293-321)."""
    rng = np.random.default_rng(20260817)
    for _ in range(50):
        num_vertices = 3 + int(rng.integers(0, 4))
        while True:
            pts = [_ll(0.0, math.degrees(rng.random() * 0.5 * math.pi))
                   for _ in range(num_vertices)]
            loop = Loop(np.array(pts))
            if loop.is_valid():
                break
        ccw = loop.is_normalized()
        assert loop.get_area() == pytest.approx(
            0.0 if ccw else 4 * math.pi, abs=2e-8)
        assert loop.contains_point((0.0, 0.0, 1.0)) == (not ccw)


def test_get_area_and_centroid(t):
    """s2loop_test.d:328-376."""
    assert t.empty.get_area() == 0.0
    assert t.full.get_area() == 4 * math.pi
    assert np.allclose(t.empty.get_centroid(), 0.0)
    assert np.allclose(t.full.get_centroid(), 0.0)
    assert t.north_hemi.get_area() == pytest.approx(2 * math.pi, abs=1e-12)
    assert 2 * math.pi - 1e-12 <= t.east_hemi.get_area() \
        <= 2 * math.pi + 1e-12

    # Random spherical caps approximated by dense boundary vertices.
    rng = np.random.default_rng(7)
    k_max_dist = 1e-6
    for _ in range(30):
        # Random orthonormal frame.
        m = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(m) < 0:
            m[:, 2] = -m[:, 2]
        x, y, z = m[:, 0], m[:, 1], m[:, 2]
        height = 2 * rng.random()
        phi = math.asin(1 - height)
        max_dtheta = 2 * math.acos(
            math.tan(abs(phi)) / math.tan(abs(phi) + k_max_dist))
        max_dtheta = min(math.pi, max_dtheta)
        pts = []
        theta = 0.0
        while theta < 2 * math.pi:
            pts.append(math.cos(theta) * math.cos(phi) * x
                       + math.sin(theta) * math.cos(phi) * y
                       + math.sin(phi) * z)
            theta += rng.random() * max_dtheta
        loop = Loop(np.array(pts))
        area = loop.get_area()
        centroid = loop.get_centroid()
        expected_area = 2 * math.pi * height
        assert abs(area - expected_area) <= 2 * math.pi * k_max_dist
        expected_centroid = expected_area * (1 - 0.5 * height) * z
        assert np.linalg.norm(centroid - expected_centroid) <= 2 * k_max_dist


def _check_turning_angle_invariants(loop):
    """Rotation keeps the angle identical; reversal negates it exactly
    (s2loop_test.d:380-390)."""
    expected = loop.get_turning_angle()
    copy = loop.clone()
    for _ in range(len(loop.vertices)):
        copy.invert()
        assert copy.get_turning_angle() == -expected
        copy.invert()
        copy = _rotate(copy)
        assert copy.get_turning_angle() == expected


def test_get_turning_angle(t):
    """s2loop_test.d:392-445."""
    assert t.empty.get_turning_angle() == 2 * math.pi
    assert t.full.get_turning_angle() == -2 * math.pi
    assert t.north_hemi3.get_turning_angle() == pytest.approx(0, abs=1e-15)
    _check_turning_angle_invariants(t.north_hemi3)
    assert t.west_hemi.get_turning_angle() == pytest.approx(0, abs=1e-15)
    _check_turning_angle_invariants(t.west_hemi)
    _check_turning_angle_invariants(t.candy_cane)
    assert t.line_triangle.get_turning_angle() == pytest.approx(
        2 * math.pi, abs=1e-12)
    _check_turning_angle_invariants(t.line_triangle)
    assert t.skinny_chevron.get_turning_angle() == pytest.approx(
        2 * math.pi, abs=1e-12)
    _check_turning_angle_invariants(t.skinny_chevron)

    # Narrow spiral: error must stay linear in the number of vertices.
    arm_points = 10000
    arm_radius = 0.01
    vertices = [None] * (2 * arm_points)
    vertices[arm_points] = np.array([0.0, 0.0, 1.0])
    for i in range(arm_points):
        ang = (2 * math.pi / 3) * i
        x, y = math.cos(ang), math.sin(ang)
        r1 = i * arm_radius / arm_points
        r2 = (i + 1.5) * arm_radius / arm_points
        v1 = np.array([r1 * x, r1 * y, 1.0])
        v2 = np.array([r2 * x, r2 * y, 1.0])
        vertices[arm_points - i - 1] = v1 / np.linalg.norm(v1)
        vertices[arm_points + i] = v2 / np.linalg.norm(v2)
    spiral = Loop(np.array(vertices))
    assert abs(spiral.get_turning_angle() - (2 * math.pi - spiral.get_area())
               ) <= 0.01 * spiral.get_turning_angle_max_error()


def _check_normalize_and_contains(loop):
    """s2loop_test.d:449-461."""
    p = make_point("40:40")
    flip = loop.clone()
    flip.invert()
    assert loop.is_normalized() ^ loop.contains_point(p)
    assert flip.is_normalized() ^ flip.contains_point(p)
    assert loop.is_normalized() ^ flip.is_normalized()
    flip.normalize()
    assert not flip.contains_point(p)


def test_normalized_compatible_with_contains(t):
    _check_normalize_and_contains(t.line_triangle)
    _check_normalize_and_contains(t.skinny_chevron)


def test_contains(t):
    """s2loop_test.d:470-525."""
    assert not t.empty.contains_point((0.0, 0.0, 1.0))
    assert t.full.contains_point((0.0, 0.0, -1.0))
    assert t.candy_cane.contains_point(_ll(5, 71))

    north = t.north_hemi.clone()
    south = t.south_hemi.clone()
    west = t.west_hemi.clone()
    east = t.east_hemi.clone()
    for _ in range(4):
        assert north.contains_point((0, 0, 1))
        assert not north.contains_point((0, 0, -1))
        assert not south.contains_point((0, 0, 1))
        assert south.contains_point((0, 0, -1))
        assert not west.contains_point((0, 1, 0))
        assert west.contains_point((0, -1, 0))
        assert east.contains_point((0, 1, 0))
        assert not east.contains_point((0, -1, 0))
        north, south = _rotate(north), _rotate(south)
        west, east = _rotate(west), _rotate(east)

    # Each cell vertex is contained by exactly one of the adjacent cells.
    for level in range(3):
        loops = []
        points = set()
        face0 = np.uint64((0 << 61) | (1 << 60))
        face5 = np.uint64((5 << 61) | (1 << 60))
        cid = int(ci.child_begin(face0, level))
        end = int(ci.child_end(face5, level))
        while cid != end:
            cell = Cell(np.uint64(cid))
            points.add(tuple(cell.center()))
            verts = []
            for k in range(4):
                verts.append(cell.vertex(k))
                points.add(tuple(cell.vertex(k)))
            loops.append(Loop(np.array(verts)))
            cid = int(ci.next_id(np.uint64(cid)))
        for point in points:
            count = sum(1 for lp in loops if lp.contains_point(point))
            assert count == 1


def test_contains_matches_crossing_sign():
    """Bound tightness regression (s2loop_test.d:527-594)."""
    cell_id = ci.parent_scalar(
        int(ci.cellid_from_xyz(np.array([1.0]), np.array([1.0]),
                               np.array([1.0]))[0]), 21)
    children = Cell(np.uint64(cell_id)).children()
    points = []
    for i in range(4):
        c = np.asarray(children[i].center(), dtype=np.float64)
        points.append(tuple(c / np.linalg.norm(c)))
    loop = Loop(np.array(points))
    grandchild = Cell(np.uint64(ci.child_scalar(
        ci.child_scalar(cell_id, 0), 2)))
    a0 = grandchild.vertex(0)
    assert tuple(points[0]) != tuple(a0)
    assert crossing_sign(a0, ORIGIN, loop.vertex(0), loop.vertex(1)) == -1
    assert crossing_sign(a0, ORIGIN, loop.vertex(1), loop.vertex(2)) == 1
    assert crossing_sign(a0, ORIGIN, loop.vertex(2), loop.vertex(3)) == -1
    assert crossing_sign(a0, ORIGIN, loop.vertex(3), loop.vertex(4)) == -1
    assert not loop.contains_point(ORIGIN)
    assert loop.contains_point(a0)
    assert loop.bound.contains_point(a0)


# ---------------------------------------------------------------------------
# Loop relation identities (s2loop_test.d:596-845)
# ---------------------------------------------------------------------------

CONTAINS, CONTAINED, DISJOINT, COVERS = 0x1, 0x2, 0x4, 0x8


def _check_one_nested_pair(a, b):
    assert a.contains_loop(b)
    assert a.boundary_equals(b) == b.contains_loop(a)
    assert a.intersects_loop(b) == (not b.is_empty())
    assert b.intersects_loop(a) == (not b.is_empty())


def _check_one_disjoint_pair(a, b):
    assert not a.intersects_loop(b)
    assert not b.intersects_loop(a)
    assert b.is_empty() == a.contains_loop(b)
    assert a.is_empty() == b.contains_loop(a)


def _check_one_covering_pair(a, b):
    assert a.is_full() == a.contains_loop(b)
    assert b.is_full() == b.contains_loop(a)
    a1 = a.clone()
    a1.invert()
    complementary = a1.boundary_equals(b)
    assert a.intersects_loop(b) == (not complementary)
    assert b.intersects_loop(a) == (not complementary)


def _check_one_overlapping_pair(a, b):
    assert not a.contains_loop(b)
    assert not b.contains_loop(a)
    assert a.intersects_loop(b)
    assert b.intersects_loop(a)


def _inverted(x):
    y = x.clone()
    y.invert()
    return y


def _check_nested_pair(a, b):
    _check_one_nested_pair(a, b)
    _check_one_nested_pair(_inverted(b), _inverted(a))
    _check_one_disjoint_pair(_inverted(a), b)
    _check_one_covering_pair(a, _inverted(b))


def _check_disjoint_pair(a, b):
    _check_nested_pair(_inverted(a), b)


def _check_covering_pair(a, b):
    _check_nested_pair(a, _inverted(b))


def _check_overlapping_pair(a, b):
    a1, b1 = _inverted(a), _inverted(b)
    _check_one_overlapping_pair(a, b)
    _check_one_overlapping_pair(a1, b1)
    _check_one_overlapping_pair(a1, b)
    _check_one_overlapping_pair(a, b1)


def _check_relation(a, b, flags, shared_edge):
    """s2loop_test.d:684-727."""
    if flags & CONTAINS:
        _check_nested_pair(a, b)
    if flags & CONTAINED:
        _check_nested_pair(b, a)
    if flags & COVERS:
        _check_covering_pair(a, b)
    if flags & DISJOINT:
        _check_disjoint_pair(a, b)
    elif not (flags & (CONTAINS | CONTAINED | COVERS)):
        _check_overlapping_pair(a, b)
    if not shared_edge and (flags & (CONTAINS | CONTAINED | DISJOINT)):
        assert a.contains_loop(b) == a.contains_nested(b)
    comparison = 0
    if (flags & CONTAINS) or ((flags & COVERS) and not shared_edge):
        comparison = 1
    if (flags & DISJOINT) or ((flags & CONTAINED) and not shared_edge):
        comparison = -1
    if not a.is_empty() and not b.is_empty():
        assert a.compare_boundary(b) == comparison


def test_loop_relations(t):
    """The fixture relation table (s2loop_test.d:729-823)."""
    cr = _check_relation
    cr(t.full, t.full, CONTAINS | CONTAINED | COVERS, True)
    cr(t.full, t.north_hemi, CONTAINS | COVERS, False)
    cr(t.full, t.empty, CONTAINS | DISJOINT | COVERS, False)
    cr(t.north_hemi, t.full, CONTAINED | COVERS, False)
    cr(t.north_hemi, t.empty, CONTAINS | DISJOINT, False)
    cr(t.empty, t.full, CONTAINED | DISJOINT | COVERS, False)
    cr(t.empty, t.north_hemi, CONTAINED | DISJOINT, False)
    cr(t.empty, t.empty, CONTAINS | CONTAINED | DISJOINT, False)

    cr(t.north_hemi, t.north_hemi, CONTAINS | CONTAINED, True)
    cr(t.north_hemi, t.south_hemi, DISJOINT | COVERS, True)
    cr(t.north_hemi, t.east_hemi, 0, False)
    cr(t.north_hemi, t.arctic_80, CONTAINS, False)
    cr(t.north_hemi, t.antarctic_80, DISJOINT, False)
    cr(t.north_hemi, t.candy_cane, 0, False)

    cr(t.north_hemi3, t.north_hemi3, CONTAINS | CONTAINED, True)
    cr(t.north_hemi3, t.east_hemi, 0, False)
    cr(t.north_hemi3, t.arctic_80, CONTAINS, False)
    cr(t.north_hemi3, t.antarctic_80, DISJOINT, False)
    cr(t.north_hemi3, t.candy_cane, 0, False)

    cr(t.south_hemi, t.north_hemi, DISJOINT | COVERS, True)
    cr(t.south_hemi, t.south_hemi, CONTAINS | CONTAINED, True)
    cr(t.south_hemi, t.far_hemi, 0, False)
    cr(t.south_hemi, t.arctic_80, DISJOINT, False)
    cr(t.south_hemi, t.antarctic_80, CONTAINS, False)
    cr(t.south_hemi, t.candy_cane, 0, False)

    cr(t.candy_cane, t.north_hemi, 0, False)
    cr(t.candy_cane, t.south_hemi, 0, False)
    cr(t.candy_cane, t.arctic_80, DISJOINT, False)
    cr(t.candy_cane, t.antarctic_80, DISJOINT, False)
    cr(t.candy_cane, t.candy_cane, CONTAINS | CONTAINED, True)

    cr(t.near_hemi, t.west_hemi, 0, False)

    cr(t.small_ne_cw, t.south_hemi, CONTAINS, False)
    cr(t.small_ne_cw, t.west_hemi, CONTAINS, False)
    cr(t.small_ne_cw, t.north_hemi, COVERS, False)
    cr(t.small_ne_cw, t.east_hemi, COVERS, False)

    cr(t.loop_a, t.loop_a, CONTAINS | CONTAINED, True)
    cr(t.loop_a, t.loop_b, 0, False)
    cr(t.loop_a, t.a_intersect_b, CONTAINS, True)
    cr(t.loop_a, t.a_union_b, CONTAINED, True)
    cr(t.loop_a, t.a_minus_b, CONTAINS, True)
    cr(t.loop_a, t.b_minus_a, DISJOINT, True)

    cr(t.loop_b, t.loop_a, 0, False)
    cr(t.loop_b, t.loop_b, CONTAINS | CONTAINED, True)
    cr(t.loop_b, t.a_intersect_b, CONTAINS, True)
    cr(t.loop_b, t.a_union_b, CONTAINED, True)
    cr(t.loop_b, t.a_minus_b, DISJOINT, True)
    cr(t.loop_b, t.b_minus_a, CONTAINS, True)

    cr(t.a_intersect_b, t.loop_a, CONTAINED, True)
    cr(t.a_intersect_b, t.loop_b, CONTAINED, True)
    cr(t.a_intersect_b, t.a_intersect_b, CONTAINS | CONTAINED, True)
    cr(t.a_intersect_b, t.a_union_b, CONTAINED, False)
    cr(t.a_intersect_b, t.a_minus_b, DISJOINT, True)
    cr(t.a_intersect_b, t.b_minus_a, DISJOINT, True)

    cr(t.a_union_b, t.loop_a, CONTAINS, True)
    cr(t.a_union_b, t.loop_b, CONTAINS, True)
    cr(t.a_union_b, t.a_intersect_b, CONTAINS, False)
    cr(t.a_union_b, t.a_union_b, CONTAINS | CONTAINED, True)
    cr(t.a_union_b, t.a_minus_b, CONTAINS, True)
    cr(t.a_union_b, t.b_minus_a, CONTAINS, True)

    cr(t.a_minus_b, t.loop_a, CONTAINED, True)
    cr(t.a_minus_b, t.loop_b, DISJOINT, True)
    cr(t.a_minus_b, t.a_intersect_b, DISJOINT, True)
    cr(t.a_minus_b, t.a_union_b, CONTAINED, True)
    cr(t.a_minus_b, t.a_minus_b, CONTAINS | CONTAINED, True)
    cr(t.a_minus_b, t.b_minus_a, DISJOINT, False)

    cr(t.b_minus_a, t.loop_a, DISJOINT, True)
    cr(t.b_minus_a, t.loop_b, CONTAINED, True)
    cr(t.b_minus_a, t.a_intersect_b, DISJOINT, True)
    cr(t.b_minus_a, t.a_union_b, CONTAINED, True)
    cr(t.b_minus_a, t.a_minus_b, DISJOINT, False)
    cr(t.b_minus_a, t.b_minus_a, CONTAINS | CONTAINED, True)


def test_loop_relations_pieces_sticking_out_and_in(t):
    """s2loop_test.d:827-845."""
    cr = _check_relation
    cr(t.loop_a, t.loop_c, 0, True)
    cr(t.loop_c, t.loop_a, 0, True)
    cr(t.loop_a, t.loop_d, CONTAINED, True)
    cr(t.loop_d, t.loop_a, CONTAINS, True)
    cr(t.loop_e, t.loop_f, DISJOINT, True)
    cr(t.loop_e, t.loop_g, CONTAINS, True)
    cr(t.loop_e, t.loop_h, 0, True)
    cr(t.loop_e, t.loop_i, 0, False)
    cr(t.loop_f, t.loop_g, DISJOINT, True)
    cr(t.loop_f, t.loop_h, 0, True)
    cr(t.loop_f, t.loop_i, 0, False)
    cr(t.loop_g, t.loop_h, CONTAINED, True)
    cr(t.loop_h, t.loop_g, CONTAINS, True)
    cr(t.loop_g, t.loop_i, DISJOINT, True)
    cr(t.loop_h, t.loop_i, CONTAINS, True)


def _make_cell_loop(begin, end):
    """CCW loop bounding the union of cell ids in [begin, end)
    (s2loop_test.d:847-883)."""
    edges = {}
    cid = int(begin)
    while cid != int(end):
        cell = Cell(np.uint64(cid))
        for k in range(4):
            a = tuple(cell.vertex(k))
            b = tuple(cell.vertex((k + 1) & 3))
            if edges.get(b, {}).get(a):
                del edges[b][a]
                if not edges[b]:
                    del edges[b]
            else:
                edges.setdefault(a, {})[b] = True
        cid = int(ci.next_id(np.uint64(cid)))
    vertices = []
    p = next(iter(edges))
    while edges:
        assert len(edges[p]) == 1
        nxt = next(iter(edges[p]))
        vertices.append(p)
        del edges[p]
        p = nxt
    return Loop(np.array(vertices))


def test_loop_relations2():
    """Adjacent cell-range loops: containment/intersection by id range
    (s2loop_test.d:885-913)."""
    rng = np.random.default_rng(20260817)

    def skewed6():
        return int(rng.integers(0, 2 ** int(rng.integers(0, 7))))

    iters = 0
    while iters < 300:
        cid = int(rng.integers(0, 2 ** 63)) * 2 + 1  # random odd 64-bit
        begin = np.uint64(cid)
        if not ci.is_valid(begin):
            continue
        begin = np.uint64(ci.parent_scalar(int(begin),
                                           int(rng.integers(0, 30))))
        a_begin = int(ci.advance(begin, skewed6()))
        a_end = int(ci.advance(np.uint64(a_begin), skewed6() + 1))
        b_begin = int(ci.advance(begin, skewed6()))
        b_end = int(ci.advance(np.uint64(b_begin), skewed6() + 1))
        if not (ci.is_valid(np.uint64(a_end))
                and ci.is_valid(np.uint64(b_end))
                and a_begin < a_end and b_begin < b_end):
            continue
        iters += 1
        a = _make_cell_loop(a_begin, a_end)
        b = _make_cell_loop(b_begin, b_end)
        contained = a_begin <= b_begin and b_end <= a_end
        intersects = a_begin < b_end and b_begin < a_end
        assert a.contains_loop(b) == contained
        assert a.intersects_loop(b) == intersects


def test_bounds_for_loop_containment():
    """Subregion-bound expansion is necessary and sufficient
    (s2loop_test.d:915-948)."""
    rng = np.random.default_rng(11)
    iters = 0
    while iters < 300:
        b = rng.normal(size=3) + np.array([0, 0, 1.0])
        b /= np.linalg.norm(b)
        v = np.cross(b, [0.0, 0.0, 1.0])
        v /= np.linalg.norm(v)
        a = np.asarray(interpolate(rng.random(), tuple(-v), tuple(b)))
        c = np.asarray(interpolate(rng.random(), tuple(b), tuple(v)))
        if sign(tuple(a), tuple(b), tuple(c)) < 0:
            continue
        d = np.array([b[0], b[1], 0.0])
        d /= np.linalg.norm(d)
        outer = Loop(np.array([c, d, a, b]))
        inner = Loop(np.array([c, d, a]))
        if outer.bound.contains_rect(inner.bound):
            continue
        iters += 1
        assert outer.contains_loop(inner)


def _check_near(a_str, b_str, max_error_rad, expected):
    a, b = make_loop(a_str), make_loop(b_str)
    assert a.boundary_near(b, max_error_rad) == expected
    assert b.boundary_near(a, max_error_rad) == expected


def test_boundary_near():
    """s2loop_test.d:1007-1033."""
    degree = math.radians(1)
    _check_near("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2",
                0.5 * degree, True)
    _check_near("0:0, 0:3, 0:7, 0:10, 3:7, 5:5",
                "0:0, 0:10, 2:8, 5:5, 4:4, 3:3, 1:1", 1e-3, True)
    _check_near("0:0, 0:2, 2:2, 2:0", "0:0, 1.9999:1, 0:2, 2:2, 2:0",
                0.5 * degree, False)
    t1 = ("0.1:0, 0.1:1, 0.1:2, 0.1:3, 0.1:4, 1:4, 2:4, 3:4, "
          "2:4.1, 1:4.1, 2:4.2, 3:4.2, 4:4.2, 5:4.2")
    t2 = ("0:0, 0:1, 0:2, 0:3, 0.1:2, 0.1:1, 0.2:2, 0.2:3, "
          "0.2:4, 1:4.1, 2:4, 3:4, 4:4, 5:4")
    _check_near(t1, t2, 1.5 * degree, True)
    _check_near(t1, t2, 0.5 * degree, False)


def _check_empty_full_conversions(loop):
    """Snap to cell centers / latlng at several levels
    (s2loop_test.d:1075-1101)."""
    for level in (30, 1, 0):
        assert loop.is_empty_or_full()
        cid = ci.parent_scalar(int(ci.cellid_from_xyz(
            *(np.array([c]) for c in loop.vertex(0)))[0]), level)
        x, y, z = ci.to_xyz(np.array([cid], dtype=np.uint64))
        loop2 = Loop(np.array([[float(x[0]), float(y[0]), float(z[0])]]))
        assert loop.boundary_equals(loop2)
        assert loop.boundary_approx_equals(loop2)
        assert loop.boundary_near(loop2)
    # LatLng roundtrip.
    lat = math.atan2(loop.vertex(0)[2],
                     math.hypot(loop.vertex(0)[0], loop.vertex(0)[1]))
    lng = math.atan2(loop.vertex(0)[1], loop.vertex(0)[0])
    p = _ll(math.degrees(lat), math.degrees(lng))
    loop2 = Loop(np.array([p]))
    assert loop.boundary_equals(loop2)


def test_empty_full_lossy_conversions():
    _check_empty_full_conversions(Loop.empty())
    _check_empty_full_conversions(Loop.full())


def test_s2cell_constructor_and_contains():
    """Cell-derived loops behave like vertex loops; cell bounds are more
    conservative (s2loop_test.d:1189-1204)."""
    lat, lng = 40565459e-6, -74645276e-6
    cid = int(ci.cellid_from_latlng(np.array([lat]), np.array([lng]))[0])
    cell = Cell(np.uint64(cid))
    cell_as_loop = Loop(np.array([cell.vertex(k) for k in range(4)]))
    loop_copy = Loop(cell_as_loop.vertices.copy())
    assert loop_copy.contains_loop(cell_as_loop)
    assert cell_as_loop.contains_loop(loop_copy)
    # Cell bounds are more conservative than loop bounds.
    cell_bound = cell.get_cap_bound()
    del cell_bound  # our Cell exposes the rect via rect._cell_rect
    from s2geometry_d_ray.core.rect import LatLngRect as _R
    cell_rect = _R.empty()._cell_rect(cell)
    assert not loop_copy.bound.contains_rect(cell_rect)


def _check_distance_methods(loop, x, boundary_x):
    """s2loop_test.d:1263-1284."""
    k_max_error = 1e-15
    if boundary_x is None:
        boundary_x = x
    assert _angle(boundary_x, loop.project_to_boundary(x)) <= k_max_error
    if loop.is_empty_or_full():
        assert loop.get_distance_to_boundary_rad(x) == math.inf
    else:
        assert math.degrees(_angle(x, boundary_x)) == pytest.approx(
            math.degrees(loop.get_distance_to_boundary_rad(x)),
            abs=math.degrees(k_max_error))
    if loop.contains_point(x):
        assert loop.get_distance_rad(x) == 0.0
        assert loop.project_point(x) == tuple(x)
    else:
        assert loop.get_distance_to_boundary_rad(x) == \
            loop.get_distance_rad(x)
        assert loop.project_to_boundary(x) == loop.project_point(x)


def test_distance_methods():
    """s2loop_test.d:1286-1314."""
    _check_distance_methods(Loop.empty(), (0.0, 1.0, 0.0), None)
    _check_distance_methods(Loop.full(), (0.0, 1.0, 0.0), None)
    square = make_loop("-1:-1, -1:1, 1:1, 1:-1")
    assert square.is_normalized()
    _check_distance_methods(square, _ll(1, -1), None)
    _check_distance_methods(square, _ll(0.5, 1), None)
    _check_distance_methods(square, _ll(0, 0.5), _ll(0, 1))
    _check_distance_methods(square, _ll(0, -2), _ll(0, -1))
    _check_distance_methods(square, _ll(3, 4), _ll(1, 1))


def test_make_regular_loop():
    """Exact construction parity (s2loop_test.d:1316-1356)."""
    center = _ll(80, 135)
    radius = math.radians(20)
    loop = Loop.make_regular_xyz(center, radius, 4)
    assert len(loop.vertices) == 4
    p0, p1, p2, p3 = (loop.vertex(i) for i in range(4))
    for p in (p0, p1, p2, p3):
        assert math.degrees(_angle(center, p)) == pytest.approx(20.0,
                                                                abs=1e-9)
    p0, p1, p2, p3 = (np.asarray(p) for p in (p0, p1, p2, p3))

    def vec_angle(u, v):
        return math.atan2(np.linalg.norm(np.cross(u, v)), float(u @ v))

    for a, b, c in ((p1 - p0, p3 - p0, None), (p2 - p1, p0 - p1, None),
                    (p3 - p2, p1 - p2, None), (p0 - p3, p2 - p3, None)):
        assert vec_angle(a, b) == pytest.approx(math.pi / 2, abs=1e-9)
    for a, b in ((p0, p1), (p1, p2), (p2, p3), (p3, p0)):
        assert math.degrees(_angle(a, b)) == pytest.approx(
            27.990890717782829, abs=1e-9)
    assert _lat_deg(p0) == pytest.approx(62.162880741097204, abs=1e-9)
    assert _lng_deg(p0) == pytest.approx(103.11051028343407, abs=1e-9)
    assert _lat_deg(p1) == pytest.approx(61.955157772928345, abs=1e-9)
    assert _lng_deg(p1) == pytest.approx(165.25681963683536, abs=1e-9)
    assert _lat_deg(p2) == pytest.approx(75.139812547718478, abs=1e-9)
    assert _lng_deg(p2) == pytest.approx(-119.13042521187423, abs=1e-9)
    assert _lat_deg(p3) == pytest.approx(75.524190079054392, abs=1e-9)
    assert _lng_deg(p3) == pytest.approx(26.392175948257943, abs=1e-9)
