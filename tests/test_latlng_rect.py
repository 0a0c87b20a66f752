"""Port of the reference S2LatLngRect suite (test/s2/s2latlng_rect_test.d):
accessors, interval ops, boundary intersection, expansion (both signs and
by-distance), cap bounds, exact cell ops, area/centroid, and the
distance + directed-Hausdorff machinery verified against brute force."""

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core.cap import Cap
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.edge import chord2_to_radians, edge_distances2
from s2geometry_d_ray.core.predicates import sign
from s2geometry_d_ray.core.rect import LatLngRect, S1Interval

PI = math.pi
PI_2 = 0.5 * math.pi
DOUBLE_ERR = 1e-4


def _norm_latlng(lat_deg, lng_deg):
    """S2LatLng.normalized semantics: clamp lat, wrap lng."""
    lat = max(-PI_2, min(PI_2, math.radians(lat_deg)))
    lng = math.remainder(math.radians(lng_deg), 2 * PI)
    return lat, lng


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    """rectFromDegrees (s2latlng_rect_test.d:45-54)."""
    lo = _norm_latlng(lat_lo, lng_lo)
    hi = _norm_latlng(lat_hi, lng_hi)
    return LatLngRect(lo[0], hi[0], S1Interval(lo[1], hi[1]))


def point_rect_deg(lat, lng):
    la, ln = _norm_latlng(lat, lng)
    return LatLngRect.from_point(la, ln)


def _xyz(lat, lng):
    return (math.cos(lat) * math.cos(lng), math.cos(lat) * math.sin(lng),
            math.sin(lat))


def _xyz_deg(lat_deg, lng_deg):
    return _xyz(math.radians(lat_deg), math.radians(lng_deg))


def _latlng_of(p):
    return (math.atan2(p[2], math.hypot(p[0], p[1])),
            math.atan2(p[1], p[0]))


def _pt_edge_dist(x, a, b):
    d2 = edge_distances2(np.asarray(x, dtype=np.float64)[None, :],
                         np.asarray(a, dtype=np.float64)[None, :],
                         np.asarray(b, dtype=np.float64)[None, :])
    return chord2_to_radians(float(d2[0, 0]))


def _cell_from_face_pos_level(face, pos, level):
    fid = (face << 61) | (pos | 1)
    return Cell(np.uint64(ci.parent_scalar(fid, level)))


def test_empty_and_full():
    """s2latlng_rect_test.d:56-73."""
    empty, full = LatLngRect.empty(), LatLngRect.full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_point()
    assert full.is_valid() and full.is_full() and not full.is_point()


def test_accessors():
    """s2latlng_rect_test.d:75-85."""
    d1 = rect_deg(-90, 0, -45, 180)
    assert math.degrees(d1.lat_lo) == pytest.approx(-90, abs=DOUBLE_ERR)
    assert math.degrees(d1.lat_hi) == pytest.approx(-45, abs=DOUBLE_ERR)
    assert math.degrees(d1.lng.lo) == pytest.approx(0, abs=DOUBLE_ERR)
    assert math.degrees(d1.lng.hi) == pytest.approx(180, abs=DOUBLE_ERR)
    assert d1.lng == S1Interval(0, PI)


def test_approx_equals():
    """s2latlng_rect_test.d:87-114."""
    assert LatLngRect.empty().approx_equals(rect_deg(1, 5, 1, 5))
    assert rect_deg(1, 5, 1, 5).approx_equals(LatLngRect.empty())
    assert not rect_deg(1, 5, 1, 5).approx_equals(rect_deg(2, 7, 2, 7))
    e = math.radians(1.001)
    assert rect_deg(10, 10, 20, 20).approx_equals(rect_deg(11, 11, 19, 19),
                                                  e, e)
    e = math.radians(0.999)
    assert not rect_deg(10, 10, 20, 20).approx_equals(
        rect_deg(11, 11, 19, 19), e, e)
    assert rect_deg(0, 10, 20, 30).approx_equals(
        rect_deg(-1, 8, 21, 32), math.radians(1.001), math.radians(2.001))
    assert not rect_deg(0, 10, 20, 30).approx_equals(
        rect_deg(-1, 8, 21, 32), math.radians(0.999), math.radians(1.999))


def test_from_center_size():
    """s2latlng_rect_test.d:116-130."""
    assert LatLngRect.from_center_size(
        math.radians(80), math.radians(170), math.radians(40),
        math.radians(60)).approx_equals(rect_deg(60, 140, 90, -160))
    assert LatLngRect.from_center_size(
        math.radians(10), math.radians(40), math.radians(210),
        math.radians(400)).is_full()
    assert LatLngRect.from_center_size(
        math.radians(-90), math.radians(180), math.radians(20),
        math.radians(50)).approx_equals(rect_deg(-90, 155, -80, -155))


def test_from_point():
    """s2latlng_rect_test.d:132-137."""
    r = point_rect_deg(23, 47)
    assert r == rect_deg(23, 47, 23, 47)
    assert r.is_point()


def test_from_point_pair():
    """s2latlng_rect_test.d:139-147."""
    assert LatLngRect.from_point_pair(
        math.radians(-35), math.radians(-140), math.radians(15),
        math.radians(155)) == rect_deg(-35, 155, 15, -140)
    assert LatLngRect.from_point_pair(
        math.radians(25), math.radians(-70), math.radians(-90),
        math.radians(80)) == rect_deg(-90, -70, 25, 80)


def test_get_center_size():
    """s2latlng_rect_test.d:149-156."""
    r1 = LatLngRect(0, PI_2, S1Interval(-PI, 0))
    assert r1.get_center() == (0.25 * PI, -PI_2)
    assert r1.get_size() == (PI_2, PI)
    assert LatLngRect.empty().get_size()[0] < 0
    assert LatLngRect.empty().get_size()[1] < 0


def test_get_vertex():
    """s2latlng_rect_test.d:158-183."""
    r1 = LatLngRect(0, PI_2, S1Interval(-PI, 0))
    assert r1.get_vertex(0) == (0, PI)
    assert r1.get_vertex(1) == (0, 0)
    assert r1.get_vertex(2) == (PI_2, 0)
    assert r1.get_vertex(3) == (PI_2, PI)
    # CCW order.
    for i in range(4):
        lat = 0.25 * PI * (i - 2)
        lng = PI_2 * (i - 2) + 0.2
        r = LatLngRect(lat, lat + 0.25 * PI, S1Interval(
            math.remainder(lng, 2 * PI),
            math.remainder(lng + PI_2, 2 * PI)))
        for k in range(4):
            assert sign(_xyz(*r.get_vertex((k - 1) & 3)),
                        _xyz(*r.get_vertex(k)),
                        _xyz(*r.get_vertex((k + 1) & 3))) == 1


def test_contains():
    """s2latlng_rect_test.d:185-202."""
    eq_m180 = (0.0, -PI)
    north_pole = (PI_2, 0.0)
    r1 = LatLngRect(0.0, PI_2, S1Interval.from_point_pair(-PI, 0.0))
    assert r1.contains_latlng(math.radians(30), math.radians(-45))
    assert r1.interior_contains_latlng(math.radians(30), math.radians(-45))
    assert not r1.contains_latlng(math.radians(30), math.radians(45))
    assert not r1.interior_contains_latlng(math.radians(30),
                                           math.radians(45))
    assert r1.contains_latlng(*eq_m180)
    assert not r1.interior_contains_latlng(*eq_m180)
    assert r1.contains_latlng(*north_pole)
    assert not r1.interior_contains_latlng(*north_pole)
    assert r1.contains_point((0.5, -0.3, 0.1))
    assert not r1.contains_point((0.5, 0.2, 0.1))


def _check_interval_ops(x, y, expected_relation, expected_union,
                        expected_intersection):
    """s2latlng_rect_test.d:204-230."""
    assert x.contains_rect(y) == (expected_relation[0] == "T")
    assert x.interior_contains_rect(y) == (expected_relation[1] == "T")
    assert x.intersects_rect(y) == (expected_relation[2] == "T")
    assert x.interior_intersects(y) == (expected_relation[3] == "T")
    assert x.contains_rect(y) == (x.unite(y) == x)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty())
    assert x.unite(y) == expected_union
    assert x.intersection(y) == expected_intersection
    if y.get_size() == (0.0, 0.0):
        assert x.add_point(y.lat_lo, y.lng.lo) == expected_union


def test_interval_ops():
    """s2latlng_rect_test.d:232-280."""
    r1 = rect_deg(0, -180, 90, 0)
    r1_mid = rect_deg(45, -90, 45, -90)
    _check_interval_ops(r1, r1_mid, "TTTT", r1, r1_mid)
    req_m180 = rect_deg(0, -180, 0, -180)
    _check_interval_ops(r1, req_m180, "TFTF", r1, req_m180)
    rnorth_pole = rect_deg(90, 0, 90, 0)
    _check_interval_ops(r1, rnorth_pole, "TFTF", r1, rnorth_pole)
    _check_interval_ops(r1, rect_deg(-10, -1, 1, 20), "FFTT",
                        rect_deg(-10, 180, 90, 20), rect_deg(0, -1, 1, 0))
    _check_interval_ops(r1, rect_deg(-10, -1, 0, 20), "FFTF",
                        rect_deg(-10, 180, 90, 20), rect_deg(0, -1, 0, 0))
    _check_interval_ops(r1, rect_deg(-10, 0, 1, 20), "FFTF",
                        rect_deg(-10, 180, 90, 20), rect_deg(0, 0, 1, 0))
    _check_interval_ops(rect_deg(-15, -160, -15, -150),
                        rect_deg(20, 145, 25, 155), "FFFF",
                        rect_deg(-15, 145, 25, -150), LatLngRect.empty())
    _check_interval_ops(rect_deg(70, -10, 90, -140),
                        rect_deg(60, 175, 80, 5), "FFTT",
                        rect_deg(60, -180, 90, 180),
                        rect_deg(70, 175, 80, 5))
    _check_interval_ops(rect_deg(12, 30, 60, 60), rect_deg(0, 0, 30, 18),
                        "FFFF", rect_deg(0, 0, 60, 60), LatLngRect.empty())
    _check_interval_ops(rect_deg(0, 0, 18, 42), rect_deg(30, 12, 42, 60),
                        "FFFF", rect_deg(0, 0, 42, 60), LatLngRect.empty())


def test_boundary_intersects():
    """s2latlng_rect_test.d:282-347."""
    # Empty and full rects have no boundary effect at their corners.
    rect = LatLngRect.empty()
    lo = _xyz(rect.lat_lo, rect.lng.lo)
    hi = _xyz(rect.lat_hi, rect.lng.hi)
    assert not rect.boundary_intersects(lo, lo)
    assert not rect.boundary_intersects(lo, hi)
    rect = LatLngRect.full()
    lo = _xyz(rect.lat_lo, rect.lng.lo)
    hi = _xyz(rect.lat_hi, rect.lng.hi)
    assert not rect.boundary_intersects(lo, lo)
    assert not rect.boundary_intersects(lo, hi)

    # Spherical lune: only two non-degenerate sides.
    rect = rect_deg(-90, 100, 90, 120)
    assert not rect.boundary_intersects(_xyz_deg(60, 60), _xyz_deg(90, 60))
    assert not rect.boundary_intersects(_xyz_deg(-60, 110),
                                        _xyz_deg(60, 110))
    assert rect.boundary_intersects(_xyz_deg(-60, 95), _xyz_deg(60, 110))
    assert rect.boundary_intersects(_xyz_deg(60, 115), _xyz_deg(80, 125))

    # North hemisphere: one non-degenerate side.
    rect = rect_deg(0, -180, 90, 180)
    assert not rect.boundary_intersects(_xyz_deg(60, -180),
                                        _xyz_deg(90, -180))
    assert not rect.boundary_intersects(_xyz_deg(60, -170),
                                        _xyz_deg(60, 170))
    assert rect.boundary_intersects(_xyz_deg(-10, -180),
                                    _xyz_deg(10, -180))

    # South hemisphere.
    rect = rect_deg(-90, -180, 0, 180)
    assert not rect.boundary_intersects(_xyz_deg(-90, -180),
                                        _xyz_deg(-60, -180))
    assert not rect.boundary_intersects(_xyz_deg(-60, -170),
                                        _xyz_deg(-60, 170))
    assert rect.boundary_intersects(_xyz_deg(-10, -180),
                                    _xyz_deg(10, -180))

    # Rect crossing the anti-meridian.
    rect = rect_deg(20, 170, 40, -170)
    assert rect.contains_point(_xyz_deg(30, 180))
    assert rect.boundary_intersects(_xyz_deg(25, 160), _xyz_deg(25, 180))
    assert rect.boundary_intersects(_xyz_deg(25, -160), _xyz_deg(25, -180))
    assert rect.boundary_intersects(_xyz_deg(15, 175), _xyz_deg(30, 175))
    assert rect.boundary_intersects(_xyz_deg(45, 175), _xyz_deg(30, 175))
    assert not rect.boundary_intersects(_xyz_deg(25, -20), _xyz_deg(25, 0))
    assert not rect.boundary_intersects(_xyz_deg(25, 20), _xyz_deg(25, 0))
    assert not rect.boundary_intersects(_xyz_deg(15, -5), _xyz_deg(30, -5))
    assert not rect.boundary_intersects(_xyz_deg(45, -5), _xyz_deg(30, -5))


def test_add_point():
    """s2latlng_rect_test.d:349-359."""
    p = LatLngRect.empty()
    p = p.add_point(0.0, 0.0)
    assert p.is_point()
    p = p.add_point(0.0, -PI_2)
    assert not p.is_point()
    p = p.add_point(0.25 * PI, -PI)
    p = p.add_point(*_latlng_of((0.0, 0.0, 1.0)))
    assert p == rect_deg(0, -180, 90, 0)


def test_expanded():
    """s2latlng_rect_test.d:361-423."""
    def exp(r, lat_deg, lng_deg):
        return r.expanded(math.radians(lat_deg), math.radians(lng_deg))

    assert exp(rect_deg(70, 150, 80, 170), 20, 30).approx_equals(
        rect_deg(50, 120, 90, -160))
    assert exp(LatLngRect.empty(), 20, 30).is_empty()
    assert exp(LatLngRect.full(), 500, 500).is_full()
    assert exp(rect_deg(-90, 170, 10, 20), 30, 80).approx_equals(
        rect_deg(-90, -180, 40, 180))
    # Negative margins.
    assert exp(rect_deg(10, -50, 60, 70), -10, -10).approx_equals(
        rect_deg(20, -40, 50, 60))
    assert exp(rect_deg(-20, -180, 20, 180), -10, -10).approx_equals(
        rect_deg(-10, -180, 10, 180))
    assert exp(rect_deg(-20, -180, 20, 180), -30, -30).is_empty()
    assert exp(rect_deg(-90, 10, 90, 11), -10, -10).is_empty()
    assert exp(rect_deg(-90, 10, 90, 100), -10, -10).approx_equals(
        rect_deg(-80, 20, 80, 90))
    assert exp(LatLngRect.empty(), -50, -500).is_empty()
    assert exp(LatLngRect.full(), -50, -50).approx_equals(
        rect_deg(-40, -180, 40, 180))
    # Mixed margins.
    assert exp(rect_deg(10, -50, 60, 70), -10, 30).approx_equals(
        rect_deg(20, -80, 50, 100))
    assert exp(rect_deg(-20, -180, 20, 180), 10, -500).approx_equals(
        rect_deg(-30, -180, 30, 180))
    assert exp(rect_deg(-90, -180, 80, 180), -30, 500).approx_equals(
        rect_deg(-60, -180, 50, 180))
    assert exp(rect_deg(-80, -100, 80, 150), 30, -50).approx_equals(
        rect_deg(-90, -50, 90, 100))
    assert exp(rect_deg(0, -180, 50, 180), -30, 500).is_empty()
    assert exp(rect_deg(-80, 10, 70, 20), 30, -200).is_empty()
    assert exp(LatLngRect.empty(), 100, -100).is_empty()
    assert exp(LatLngRect.full(), 100, -100).is_full()


def test_polar_closure():
    """s2latlng_rect_test.d:425-435."""
    assert rect_deg(-89, 0, 89, 1) == rect_deg(-89, 0, 89, 1).polar_closure()
    assert rect_deg(-90, -30, -45, 100).polar_closure() == \
        rect_deg(-90, -180, -45, 180)
    assert rect_deg(89, 145, 90, 146).polar_closure() == \
        rect_deg(89, -180, 90, 180)
    assert rect_deg(-90, -145, 90, -144).polar_closure() == \
        LatLngRect.full()


def test_expanded_by_distance():
    """s2latlng_rect_test.d:437-528."""
    d = math.radians
    assert rect_deg(0, 170, 0, -170).expanded_by_distance(d(15)) \
        .approx_equals(rect_deg(-15, 155, 15, -155))
    assert rect_deg(60, 150, 80, 10).expanded_by_distance(d(15)) \
        .approx_equals(rect_deg(45, -180, 90, 180))
    # Round-trips.
    for r in (rect_deg(0, 0, 30, 90), rect_deg(-30, -90, 0, 0)):
        assert r.expanded_by_distance(d(5)).expanded_by_distance(
            -d(5)).approx_equals(r)
    # Negative distance with poles / full longitudes / empty results.
    assert rect_deg(0, -90, 90, 180).expanded_by_distance(-d(5)) \
        .approx_equals(rect_deg(5, 0, 85, 90))
    assert rect_deg(0, -180, 90, 180).expanded_by_distance(-d(5)) \
        .approx_equals(rect_deg(5, -180, 90, 180))
    assert rect_deg(-90, -90, 0, 180).expanded_by_distance(-d(5)) \
        .approx_equals(rect_deg(-85, 0, -5, 90))
    assert rect_deg(-90, -180, 0, 180).expanded_by_distance(-d(5)) \
        .approx_equals(rect_deg(-90, -180, -5, 180))
    assert rect_deg(0, -180, 30, 180).expanded_by_distance(-d(5)) \
        .approx_equals(rect_deg(5, -180, 25, 180))
    assert rect_deg(0, 0, 9.9, 90).expanded_by_distance(-d(5)).is_empty()
    assert rect_deg(0, 0, 30, 11).expanded_by_distance(-d(5)).is_empty()


def test_get_cap_bound():
    """s2latlng_rect_test.d:530-549."""
    assert rect_deg(-45, -45, 45, 45).get_cap_bound().approx_equals(
        Cap.from_center_height((1.0, 0.0, 0.0), 0.5))
    assert rect_deg(88, -80, 89, 80).get_cap_bound().approx_equals(
        Cap.from_center_angle((0.0, 0.0, 1.0), math.radians(2)))
    assert rect_deg(-30, -150, -10, 50).get_cap_bound().approx_equals(
        Cap.from_center_angle((0.0, 0.0, -1.0), math.radians(80)))


def _check_cell_ops(r, cell, level):
    """0=no intersection 1=may_intersect 2=intersects 3=vertex containment
    4=contains (s2latlng_rect_test.d:551-566)."""
    vertex_contained = False
    for i in range(4):
        vr = cell.vertex_raw(i)
        if r.contains_point(vr):
            vertex_contained = True
        if not r.is_empty() and cell.contains_point(
                _xyz(*r.get_vertex(i))):
            vertex_contained = True
    assert r.may_intersect_cell(cell) == (level >= 1)
    assert r.intersects_cell(cell) == (level >= 2)
    assert vertex_contained == (level >= 3)
    assert r.contains_cell(cell) == (level >= 4)


def test_cell_ops():
    """s2latlng_rect_test.d:568-622."""
    _check_cell_ops(LatLngRect.empty(),
                    _cell_from_face_pos_level(3, 0, 0), 0)
    _check_cell_ops(LatLngRect.full(),
                    _cell_from_face_pos_level(2, 0, 0), 4)
    _check_cell_ops(LatLngRect.full(),
                    _cell_from_face_pos_level(5, 0, 25), 4)

    r4 = rect_deg(-45.1, -45.1, 0.1, 0.1)
    _check_cell_ops(r4, _cell_from_face_pos_level(0, 0, 0), 3)
    _check_cell_ops(r4, _cell_from_face_pos_level(0, 0, 1), 4)
    _check_cell_ops(r4, _cell_from_face_pos_level(1, 0, 1), 0)

    r5 = rect_deg(-10, -45, 10, 0)
    _check_cell_ops(r5, _cell_from_face_pos_level(0, 0, 0), 3)
    _check_cell_ops(r5, _cell_from_face_pos_level(0, 0, 1), 3)
    _check_cell_ops(r5, _cell_from_face_pos_level(1, 0, 1), 0)

    _check_cell_ops(rect_deg(4, 4, 4, 4),
                    _cell_from_face_pos_level(0, 0, 0), 3)
    _check_cell_ops(rect_deg(41, -87, 42, -79),
                    _cell_from_face_pos_level(2, 0, 0), 1)
    _check_cell_ops(rect_deg(-41, 160, -40, -160),
                    _cell_from_face_pos_level(5, 0, 0), 1)

    # Leaf cell at the top-right corner of face 0.
    p = np.array([1 + 1e-12, 1.0, 1.0])
    p /= np.linalg.norm(p)
    cell0tr = Cell(np.uint64(ci.cellid_from_xyz(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0]))
    v0_lat, v0_lng = _latlng_of(cell0tr.vertex_raw(0))
    _check_cell_ops(rect_deg(math.degrees(v0_lat) - 1e-8,
                             math.degrees(v0_lng) - 1e-8,
                             math.degrees(v0_lat) - 2e-10,
                             math.degrees(v0_lng) + 1e-10), cell0tr, 1)

    _check_cell_ops(rect_deg(-37, -70, -36, -20),
                    _cell_from_face_pos_level(5, 0, 0), 2)

    cell202 = _cell_from_face_pos_level(2, 0, 2)
    bound202 = cell202.get_rect_bound()
    _check_cell_ops(rect_deg(math.degrees(bound202.lat_lo) + 3,
                             math.degrees(bound202.lng.lo) + 3,
                             math.degrees(bound202.lat_hi) - 3,
                             math.degrees(bound202.lng.hi) - 3), cell202, 2)


def test_area():
    """s2latlng_rect_test.d:634-638."""
    assert LatLngRect.empty().area() == 0.0
    assert LatLngRect.full().area() == pytest.approx(4 * PI, abs=DOUBLE_ERR)
    assert rect_deg(0, 0, 90, 90).area() == pytest.approx(PI_2,
                                                          abs=DOUBLE_ERR)


def _centroid_splitting(r, splits_left, rng):
    """s2latlng_rect_test.d:642-661."""
    if rng.integers(0, 2):
        lat = rng.uniform(r.lat_lo, r.lat_hi)
        child0 = LatLngRect(r.lat_lo, lat, r.lng)
        child1 = LatLngRect(lat, r.lat_hi, r.lng)
    else:
        assert r.lng.lo <= r.lng.hi
        lng = rng.uniform(r.lng.lo, r.lng.hi)
        child0 = LatLngRect(r.lat_lo, r.lat_hi, S1Interval(r.lng.lo, lng))
        child1 = LatLngRect(r.lat_lo, r.lat_hi, S1Interval(lng, r.lng.hi))
    assert np.linalg.norm(r.get_centroid() - child0.get_centroid()
                          - child1.get_centroid()) <= 2e-15
    if splits_left > 0:
        _centroid_splitting(child0, splits_left - 1, rng)
        _centroid_splitting(child1, splits_left - 1, rng)


def test_get_centroid():
    """s2latlng_rect_test.d:663-703."""
    rng = np.random.default_rng(13)
    assert np.allclose(LatLngRect.empty().get_centroid(), 0.0)
    assert np.linalg.norm(LatLngRect.full().get_centroid()) <= 1e-15

    # Full longitude range.
    for _ in range(100):
        lat1 = rng.uniform(-PI_2, PI_2)
        lat2 = rng.uniform(-PI_2, PI_2)
        r = LatLngRect(min(lat1, lat2), max(lat1, lat2), S1Interval.full())
        centroid = r.get_centroid()
        assert 0.5 * (math.sin(lat1) + math.sin(lat2)) * r.area() == \
            pytest.approx(centroid[2], abs=1e-14)
        assert math.hypot(centroid[0], centroid[1]) <= 1e-15

    # Full latitude range.
    for _ in range(100):
        lng1 = rng.uniform(-PI, PI)
        lng2 = rng.uniform(-PI, PI)
        r = LatLngRect(-PI_2, PI_2, S1Interval.from_point_pair(lng1, lng2))
        centroid = r.get_centroid()
        assert abs(centroid[2]) <= 1e-15
        assert r.lng.get_center() == pytest.approx(
            math.atan2(centroid[1], centroid[0]), abs=1e-15)
        alpha = 0.5 * r.lng.get_length()
        assert 0.25 * PI * math.sin(alpha) / alpha * r.area() == \
            pytest.approx(math.hypot(centroid[0], centroid[1]), abs=1e-15)

    _centroid_splitting(LatLngRect(-PI_2, PI_2, S1Interval(-3.14, 3.14)),
                        10, rng)


# -- distance machinery vs brute force (s2latlng_rect_test.d:705-945) --------

def _dist_to_lat_edge(x_lat, x_lng, lat, interval):
    """getDistance helper (s2latlng_rect_test.d:707-719)."""
    if interval.contains(x_lng):
        return abs(x_lat - lat)
    p = _xyz(x_lat, x_lng)
    return min(math.acos(max(-1.0, min(1.0, float(np.dot(
        p, _xyz(lat, interval.lo)))))),
        math.acos(max(-1.0, min(1.0, float(np.dot(
            p, _xyz(lat, interval.hi)))))))


def _brute_force_distance(a, b):
    """s2latlng_rect_test.d:721-767."""
    if a.intersects_rect(b):
        return 0.0
    pnt_a = [(a.lat_lo, a.lng.lo), (a.lat_lo, a.lng.hi),
             (a.lat_hi, a.lng.hi), (a.lat_hi, a.lng.lo)]
    pnt_b = [(b.lat_lo, b.lng.lo), (b.lat_lo, b.lng.hi),
             (b.lat_hi, b.lng.hi), (b.lat_hi, b.lng.lo)]
    lat_a = (a.lat_lo, a.lat_hi)
    lat_b = (b.lat_lo, b.lat_hi)
    lng_edge_a = [(_xyz(*pnt_a[0]), _xyz(*pnt_a[3])),
                  (_xyz(*pnt_a[1]), _xyz(*pnt_a[2]))]
    lng_edge_b = [(_xyz(*pnt_b[0]), _xyz(*pnt_b[3])),
                  (_xyz(*pnt_b[1]), _xyz(*pnt_b[2]))]
    min_distance = PI
    for i in range(4):
        ca, cb = pnt_a[i], pnt_b[i]
        for j in range(2):
            a_to_lat = _dist_to_lat_edge(ca[0], ca[1], lat_b[j], b.lng)
            b_to_lat = _dist_to_lat_edge(cb[0], cb[1], lat_a[j], a.lng)
            a_to_lng = _pt_edge_dist(_xyz(*ca), *lng_edge_b[j])
            b_to_lng = _pt_edge_dist(_xyz(*cb), *lng_edge_a[j])
            min_distance = min(min_distance, a_to_lat, b_to_lat, a_to_lng,
                               b_to_lng)
    return min_distance


def _brute_force_rect_point_distance(a, lat, lng):
    """s2latlng_rect_test.d:769-786."""
    if a.contains_latlng(lat, lng):
        return 0.0
    return min(
        _dist_to_lat_edge(lat, lng, a.lat_lo, a.lng),
        _dist_to_lat_edge(lat, lng, a.lat_hi, a.lng),
        _pt_edge_dist(_xyz(lat, lng), _xyz(a.lat_lo, a.lng.lo),
                      _xyz(a.lat_hi, a.lng.lo)),
        _pt_edge_dist(_xyz(lat, lng), _xyz(a.lat_lo, a.lng.hi),
                      _xyz(a.lat_hi, a.lng.hi)))


def _verify_distance(a, b):
    assert abs(_brute_force_distance(a, b) - a.get_distance_rect(b)) <= 1e-10


def _verify_rect_point_distance(a, lat, lng):
    d1 = _brute_force_rect_point_distance(a, lat, lng)
    d2 = a.get_distance_latlng(lat, lng)
    assert abs(d1 - d2) <= 1e-10


def test_get_distance_overlapping():
    """s2latlng_rect_test.d:811-826."""
    a = rect_deg(0, 0, 2, 2)
    b = point_rect_deg(0, 0)
    assert a.get_distance_rect(a) == 0.0
    assert a.get_distance_rect(b) == 0.0
    assert b.get_distance_rect(b) == 0.0
    assert a.get_distance_latlng(0.0, 0.0) == 0.0
    for other in ((0, 1, 2, 3), (0, 2, 2, 4), (1, 0, 3, 2), (2, 0, 4, 2),
                  (1, 1, 3, 3), (2, 2, 4, 4)):
        assert a.get_distance_rect(rect_deg(*other)) == 0.0


def test_get_distance_rect_vs_point():
    """s2latlng_rect_test.d:828-875."""
    a = rect_deg(-1, -1, 2, 1)
    for pr in ((-2, -1), (1, 2)):
        _verify_distance(a, point_rect_deg(*pr))
        _verify_distance(point_rect_deg(*pr), a)
        _verify_rect_point_distance(a, *_norm_latlng(*pr))
    b = rect_deg(86, 0, 88, 2)
    for pr in ((87, 3), (87, -1), (89, 1), (89, 181), (85, 1), (85, 181),
               (90, 0)):
        _verify_distance(b, point_rect_deg(*pr))
        _verify_distance(point_rect_deg(*pr), b)
        _verify_rect_point_distance(b, *_norm_latlng(*pr))
    c = rect_deg(88, 0, 90, 2)
    for pr in ((89, 3), (89, 90), (89, 181)):
        _verify_distance(c, point_rect_deg(*pr))
        _verify_distance(point_rect_deg(*pr), c)


def test_get_distance_rect_vs_rect():
    """s2latlng_rect_test.d:877-892."""
    a = rect_deg(-1, -1, 2, 1)
    _verify_distance(a, rect_deg(0, 2, 1, 3))
    _verify_distance(a, rect_deg(-2, -3, -1, -2))
    b = rect_deg(-87, 0, -85, 3)
    for other in ((-89, 1, -88, 2), (-84, 1, -83, 2), (-88, 90, -86, 91),
                  (-84, -91, -83, -90), (-90, 181, -89, 182),
                  (-84, 181, -83, 182)):
        _verify_distance(b, rect_deg(*other))


def _random_latlng(rng):
    p = rng.normal(size=3)
    p /= np.linalg.norm(p)
    return _latlng_of(p)


def test_get_distance_random_pairs():
    """s2latlng_rect_test.d:894-908 (2000 of the reference's 10000 random
    pairs; the brute-force comparator is identical)."""
    rng = np.random.default_rng(17)
    for _ in range(2000):
        a1, a2 = _random_latlng(rng), _random_latlng(rng)
        b1, b2 = _random_latlng(rng), _random_latlng(rng)
        a = LatLngRect.from_point_pair(a1[0], a1[1], a2[0], a2[1])
        b = LatLngRect.from_point_pair(b1[0], b1[1], b2[0], b2[1])
        _verify_distance(a, b)
        c = _random_latlng(rng)
        _verify_rect_point_distance(a, *c)
        _verify_rect_point_distance(b, *c)


def _verify_directed_hausdorff(a, b):
    """Sampled lower/upper check (s2latlng_rect_test.d:914-945)."""
    hausdorff = a.get_directed_hausdorff_distance(b)
    resolution = 0.1
    max_distance = 0.0
    a_lat_len = max(0.0, a.lat_hi - a.lat_lo)
    sample_lat = int(a_lat_len / resolution) + 1
    sample_lng = int(a.lng.get_length() / resolution) + 1
    delta_lat = a_lat_len / sample_lat
    delta_lng = a.lng.get_length() / sample_lng
    lng = a.lng.lo
    for _ in range(sample_lng + 1):
        lat = a.lat_lo
        for _ in range(sample_lat + 1):
            lat_n = max(-PI_2, min(PI_2, lat))
            lng_n = math.remainder(lng, 2 * PI)
            d = b.get_distance_latlng(lat_n, lng_n)
            max_distance = max(max_distance, d)
            lat += delta_lat
        lng += delta_lng
    assert max_distance <= hausdorff + 1e-10
    assert max_distance >= hausdorff - resolution


def test_directed_hausdorff_random_pairs():
    """s2latlng_rect_test.d:947-969 (150 of the reference's 1000 random
    pairs, each verified in 4 complement combinations)."""
    rng = np.random.default_rng(19)
    for _ in range(150):
        a1, a2 = _random_latlng(rng), _random_latlng(rng)
        b1, b2 = _random_latlng(rng), _random_latlng(rng)
        a = LatLngRect.from_point_pair(a1[0], a1[1], a2[0], a2[1])
        b = LatLngRect.from_point_pair(b1[0], b1[1], b2[0], b2[1])
        a2r = LatLngRect(a.lat_lo, a.lat_hi, a.lng.complement())
        b2r = LatLngRect(b.lat_lo, b.lat_hi, b.lng.complement())
        _verify_directed_hausdorff(a, b)
        _verify_directed_hausdorff(a, b2r)
        _verify_directed_hausdorff(a2r, b)
        _verify_directed_hausdorff(a2r, b2r)


def test_directed_hausdorff_contained():
    """s2latlng_rect_test.d:971-983."""
    a = rect_deg(-10, 20, -5, 90)
    for other in ((-10, 20, -5, 90), (-10, 19, -5, 91), (-11, 20, -4, 90),
                  (-11, 19, -4, 91)):
        assert a.get_directed_hausdorff_distance(rect_deg(*other)) == 0.0


def test_directed_hausdorff_point_to_rect():
    """s2latlng_rect_test.d:985-1009."""
    a1 = point_rect_deg(5, 8)
    a2 = point_rect_deg(90, 10)
    for other in ((-85, -50, -80, 10), (4, -10, 80, 10), (70, 170, 80,
                                                          -170)):
        b = rect_deg(*other)
        assert a1.get_directed_hausdorff_distance(b) == pytest.approx(
            a1.get_distance_rect(b), abs=DOUBLE_ERR)
        assert a2.get_directed_hausdorff_distance(b) == pytest.approx(
            a2.get_distance_rect(b), abs=DOUBLE_ERR)


def test_directed_hausdorff_rect_to_point():
    """s2latlng_rect_test.d:1011-1020."""
    a = rect_deg(1, -8, 10, 20)
    for pr in ((5, 8), (-6, -100), (-90, -20), (90, 0)):
        _verify_directed_hausdorff(a, point_rect_deg(*pr))


def test_directed_hausdorff_rect_to_rect_near_pole():
    """s2latlng_rect_test.d:1022-1032."""
    a = rect_deg(-87, 0, -85, 3)
    for other in ((-89, 1, -88, 2), (-84, 1, -83, 2), (-88, 90, -86, 91),
                  (-84, -91, -83, -90), (-90, 181, -89, 182),
                  (-84, 181, -83, 182)):
        _verify_directed_hausdorff(a, rect_deg(*other))


def test_directed_hausdorff_degenerate_cases():
    """s2latlng_rect_test.d:1034-1067."""
    _verify_directed_hausdorff(rect_deg(0, 10, 90, 20),
                               rect_deg(-4, -10, 4, 0))
    _verify_directed_hausdorff(rect_deg(-4, -10, 4, 0),
                               rect_deg(0, 10, 90, 20))
    a = rect_deg(-50, -10, 50, 10)
    b = rect_deg(30, -10, 60, 10)
    _verify_directed_hausdorff(a, b)
    c = LatLngRect(a.lat_lo, a.lat_hi, a.lng.complement())
    _verify_directed_hausdorff(c, b)
    _verify_directed_hausdorff(rect_deg(10, 170, 30, 180),
                               rect_deg(-50, -10, 50, 10))
    _verify_directed_hausdorff(rect_deg(10, -180, 30, -170),
                               rect_deg(-50, -10, 50, 10))
    _verify_directed_hausdorff(rect_deg(-30, 170, 30, 180),
                               rect_deg(-10, -90, 10, 90))
    _verify_directed_hausdorff(rect_deg(-30, -180, 30, -170),
                               rect_deg(-10, -90, 10, 90))
    _verify_directed_hausdorff(rect_deg(-20, 105, 20, 110),
                               rect_deg(-30, 5, 30, 15))
    _verify_directed_hausdorff(rect_deg(-20, 95, 20, 105),
                               rect_deg(-30, 5, 30, 15))
