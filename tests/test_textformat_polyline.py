"""Text-format DSL parsing + polyline ops, using reference-style fixture
strings (src/s2/s2text_format.d grammar)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core import textformat as tf
from s2geometry_d_ray.core.polyline import Polyline


def test_parse_points_and_roundtrip():
    pts = tf.parse_points("10:20, -30:40.5, 0:0")
    assert pts.shape == (3, 3)
    lat, lon = coords.xyz_to_latlng(pts[0, 0], pts[0, 1], pts[0, 2])
    assert abs(float(lat) - 10) < 1e-12 and abs(float(lon) - 20) < 1e-12
    s = tf.to_string_latlngs(pts)
    again = tf.parse_points(s)
    assert np.allclose(pts, again, atol=1e-14)


def test_make_polygon_with_hole_contains():
    # Shell 10x10 degrees with a 2x2 hole (reference-style fixture).
    poly = tf.make_polygon("0:0, 0:10, 10:10, 10:0; 4:4, 6:4, 6:6, 4:6")
    inside = tf.make_point("2:2")
    in_hole = tf.make_point("5:5")
    outside = tf.make_point("-5:5")
    assert poly.contains_point(inside)
    assert not poly.contains_point(in_hole)
    assert not poly.contains_point(outside)


def test_make_latlng_rect():
    r = tf.make_latlng_rect("-10:-20, 10:20")
    assert r.contains_latlng(0.0, 0.0)
    assert not r.contains_latlng(math.radians(15), 0.0)


def test_polyline_length_interpolate_project():
    pl = tf.make_polyline("0:0, 0:90")
    assert abs(pl.get_length() - math.pi / 2) < 1e-12
    mid = pl.interpolate(0.5)
    lat, lon = coords.xyz_to_latlng(*mid)
    assert abs(float(lat)) < 1e-9 and abs(float(lon) - 45) < 1e-9
    # Projection of an off-line point.
    x = np.array(coords.latlng_to_xyz(10.0, 30.0), dtype=np.float64)
    p, nxt = pl.project(x)
    plat, plon = coords.xyz_to_latlng(*p)
    assert abs(float(plat)) < 1e-9
    assert abs(float(plon) - 30.0) < 1e-6
    assert nxt == 1
    # is_on_right: heading east along the equator, south is right.
    south = np.array(coords.latlng_to_xyz(-5.0, 45.0), dtype=np.float64)
    north = np.array(coords.latlng_to_xyz(5.0, 45.0), dtype=np.float64)
    assert pl.is_on_right(south)
    assert not pl.is_on_right(north)


def test_polyline_intersects():
    a = tf.make_polyline("0:-10, 0:10")
    b = tf.make_polyline("-10:0, 10:0")
    c = tf.make_polyline("5:20, 10:30")
    assert a.intersects(b)
    assert not a.intersects(c)


def test_polyline_suffix_centroid():
    pl = tf.make_polyline("0:0, 0:45, 0:90")
    suf = pl.get_suffix(0.5)
    assert abs(suf.get_length() - math.pi / 4) < 1e-9
    cen = pl.get_centroid()
    lat, lon = coords.xyz_to_latlng(*(cen / np.linalg.norm(cen)))
    assert abs(float(lat)) < 1e-9 and abs(float(lon) - 45) < 1e-9


def test_wedge_relations():
    from s2geometry_d_ray.core.wedge import (WEDGE_EQUALS,
                                             WEDGE_IS_DISJOINT,
                                             WEDGE_PROPERLY_CONTAINS,
                                             get_wedge_relation,
                                             wedge_contains,
                                             wedge_intersects)

    def p(lat, lon):
        x, y, z = coords.latlng_to_xyz(float(lat), float(lon))
        return (float(x), float(y), float(z))

    hub = p(0, 0)
    # Wedge = rays CW from x1x0 to x1x2 (left side of the chain): with
    # a0 east and a2 north, wedge A is the 270-degree region; wedge B
    # (b0 NE-low .. b2 NE-high) is wider still and contains A.
    a0, a2 = p(0, 10), p(10, 0)
    b0, b2 = p(2, 8), p(8, 2)
    assert get_wedge_relation(a0, hub, a2, b0, b2) == \
        "is_properly_contained"
    assert get_wedge_relation(b0, hub, b2, a0, a2) == \
        WEDGE_PROPERLY_CONTAINS  # symmetric consistency
    assert wedge_contains(b0, hub, b2, a0, a2)
    assert wedge_intersects(a0, hub, a2, b0, b2)
    assert get_wedge_relation(a0, hub, a2, a0, a2) == WEDGE_EQUALS
    # Disjoint: the narrow NE wedge (a2..a0 reversed) vs the narrow SW
    # wedge — non-overlapping angle ranges around the hub.
    n0, n2 = p(10, 0), p(0, 10)    # CW from north to east = 90-deg NE
    s0, s2 = p(-10, 0), p(0, -10)  # CW from south to west = 90-deg SW
    assert get_wedge_relation(n0, hub, n2, s0, s2) == WEDGE_IS_DISJOINT
    assert not wedge_intersects(n0, hub, n2, s0, s2)
    del WEDGE_IS_DISJOINT


def test_make_index_roundtrip():
    """s2text_format.d:346-361 makeIndex grammar + writer roundtrip."""
    from s2geometry_d_ray.core.textformat import make_index, to_string_index
    idx = make_index("0:0 | 1:0 # 4:4, 4:6 | 5:5, 6:6 # 0:0, 0:3, 3:0")
    assert idx["points"].shape == (2, 3)
    assert len(idx["polylines"]) == 2
    assert len(idx["polygons"]) == 1
    s = to_string_index(idx)
    idx2 = make_index(s)
    assert idx2["points"].shape == (2, 3)
    assert len(idx2["polylines"]) == 2
    assert len(idx2["polygons"]) == 1
    import numpy as np
    assert np.allclose(idx2["points"], idx["points"])
    # empty sections parse
    e = make_index(" # # ")
    assert len(e["points"]) == 0 and not e["polylines"] \
        and not e["polygons"]


def test_point_util_frames_and_rotate():
    """s2pointutil.d getFrame/toFrame/fromFrame/rotate invariants."""
    import math

    import numpy as np
    from s2geometry_d_ray.core import coords
    rng = np.random.default_rng(9)
    for _ in range(20):
        z = rng.normal(size=3)
        z /= np.linalg.norm(z)
        f = coords.get_frame(z)
        # orthonormal, right-handed, z column = z
        assert np.allclose(f.T @ f, np.eye(3), atol=1e-12)
        assert np.linalg.det(f) > 0.99
        assert np.allclose(f[:, 2], z)
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        q = coords.to_frame(f, p)
        assert np.allclose(coords.from_frame(f, q), p, atol=1e-14)
        # rotate: preserves norm and angle-to-axis; 2pi is identity
        axis = rng.normal(size=3)
        r = coords.rotate(p, axis, 1.234)
        assert abs(np.linalg.norm(r) - 1.0) < 1e-12
        a = axis / np.linalg.norm(axis)
        assert abs(float(a @ r) - float(a @ p)) < 1e-12
        assert np.allclose(coords.rotate(p, axis, 2 * math.pi), p,
                           atol=1e-12)


def test_builder_polyline_vector_layer():
    """s2polyline_vector_layer.d: disjoint chains come out as separate
    polylines in input order."""
    import numpy as np
    from s2geometry_d_ray.core import builder as bu
    from s2geometry_d_ray.core import coords

    def ll(lat, lng):
        x, y, z = coords.latlng_to_xyz(float(lat), float(lng))
        v = np.array([float(x), float(y), float(z)])
        return v / np.linalg.norm(v)

    b = bu.Builder(bu.IdentitySnapFunction(0.0))
    b.add_polyline(np.stack([ll(0, 0), ll(0, 1), ll(0, 2)]))
    b.add_polyline(np.stack([ll(5, 0), ll(5, 1)]))
    out = b.build_polyline_vector()
    assert len(out) == 2
    assert len(out[0]) == 3 and len(out[1]) == 2
    assert np.allclose(out[1][0], ll(5, 0))
