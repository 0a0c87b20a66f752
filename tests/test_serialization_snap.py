"""Codec roundtrips, lexicons, snap functions, simplification, overlap."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import serialization as ser
from s2geometry_d_ray.core import snap
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon


def test_cell_union_codec_roundtrip():
    leaf = ci.cellid_from_latlng(np.float64([1.0, 2.0, 3.0]),
                                 np.float64([4.0, 5.0, 6.0]))
    ids = ci.parent(leaf, 12)
    blob = ser.encode_cell_union(ids)
    back = ser.decode_cell_union(blob)
    assert (back == ids).all()


def test_polygon_codec_roundtrip():
    shell = Loop.make_regular(10.0, 20.0, 0.02, 48)
    hole = Loop.make_regular(10.0, 20.0, 0.008, 32, depth=1)
    poly = Polygon([shell, hole])
    back = ser.decode_polygon(ser.encode_polygon(poly))
    assert len(back.loops) == 2
    assert back.loops[1].depth == 1
    for a, b in zip(poly.loops, back.loops):
        assert np.array_equal(a.vertices, b.vertices)
    # Containment decisions identical (lossless codec).
    pts = np.random.default_rng(0).normal(size=(200, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    assert (poly.contains_points(pts) == back.contains_points(pts)).all()


def test_point_compression_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(100, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    blob = ser.encode_point_compressed(v[:, 0], v[:, 1], v[:, 2], level=20)
    x, y, z = ser.decode_point_compressed(blob)
    # Error bounded by half the level-20 cell diagonal.
    from s2geometry_d_ray.core.metrics import MAX_DIAG
    chord = np.sqrt((v[:, 0] - x) ** 2 + (v[:, 1] - y) ** 2
                    + (v[:, 2] - z) ** 2)
    ang = 2 * np.arcsin(np.clip(chord / 2, 0, 1))
    assert (ang <= 0.5 * MAX_DIAG.get_value(20) * 1.001).all()
    # Exact for points that are already cell centers.
    cx, cy, cz = ci.to_xyz(ci.parent(ci.cellid_from_xyz(
        v[:, 0], v[:, 1], v[:, 2]), 20))
    blob2 = ser.encode_point_compressed(cx, cy, cz, level=20)
    x2, y2, z2 = ser.decode_point_compressed(blob2)
    assert np.allclose(np.stack([x2, y2, z2], 1),
                       np.stack([cx, cy, cz], 1), atol=0)


def test_lexicons():
    lex = ser.ValueLexicon()
    assert lex.add("a") == 0 and lex.add("b") == 1 and lex.add("a") == 0
    assert lex.value(1) == "b"
    ids = ser.IdSetLexicon()
    s1 = ids.add([5])
    assert s1 == 5  # singleton inline
    s2 = ids.add([3, 1, 2])
    assert s2 < 0
    assert ids.id_set(s2) == (1, 2, 3)
    assert ids.add([2, 1, 3]) == s2  # dedup


def test_snap_functions():
    lat, lon = snap.snap_latlng_to_exponent(
        np.float64([12.3456789, -0.00000049]),
        np.float64([-170.9999995, 1.0]), 6)
    assert lat[0] == 12.345679 and lon[1] == 1.0
    assert lon[0] == -171.0  # half away from zero
    # Cell-center snap: snapped points re-encode to the same cell.
    slat, slon = snap.snap_to_cell_centers(
        np.float64([10.0, 20.0]), np.float64([30.0, 40.0]), 12)
    orig = ci.parent(ci.cellid_from_latlng(
        np.float64([10.0, 20.0]), np.float64([30.0, 40.0])), 12)
    snapped = ci.parent(ci.cellid_from_latlng(slat, slon), 12)
    assert (orig == snapped).all()


def test_simplify_polyline():
    # Dense samples along a geodesic collapse to the endpoints.
    from s2geometry_d_ray.core import coords
    t = np.linspace(0, 1, 100)
    lat = np.zeros_like(t)
    lon = 90.0 * t
    x, y, z = coords.latlng_to_xyz(lat, lon)
    v = np.stack([x, y, z], axis=1)
    kept = snap.simplify_polyline(v, 1e-6)
    assert len(kept) == 2 and kept[0] == 0 and kept[-1] == 99
    # A right-angle path keeps its corner.
    lat2 = np.concatenate([np.zeros(50), np.linspace(0, 45, 50)])
    lon2 = np.concatenate([np.linspace(0, 45, 50), np.full(50, 45.0)])
    x, y, z = coords.latlng_to_xyz(lat2, lon2)
    v2 = np.stack([x, y, z], axis=1)
    kept2 = snap.simplify_polyline(v2, 1e-4)
    assert len(kept2) >= 3
