"""Compressed polygon codec goldens — the byte sizes stated in the
reference's commented-out compressed-encode tests
(test/s2/s2polygon_test.d:2059-2118) plus exact-roundtrip checks."""

from __future__ import annotations

import numpy as np

import s2geometry_d_ray.core.serialization as ser
from s2geometry_d_ray.core.polygon_ops import initialize_to_snapped
from s2geometry_d_ray.core.textformat import make_polygon


def _snapped_fixture():
    poly = make_polygon("0:0, 0:2, 2:0; 0:0, 0:-2, -2:-2, -2:0")
    return initialize_to_snapped(poly, snap_level=30)


def test_compressed_empty_polygon_requires_3_bytes():
    blob = ser.encode_polygon_compressed(None)
    assert len(blob) == 3  # 1 version + 1 level + 1 num_loops
    assert ser.decode_polygon_compressed(blob) is None


def test_compressed_encoded_polygon_requires_69_bytes():
    snapped = _snapped_fixture()
    assert [len(lp.vertices) for lp in snapped.loops] == [3, 4]
    blob = ser.encode_polygon_compressed(snapped)
    # 1 version + 1 level + 1 num_loops + 2 loops x 5 overhead
    # + 7 vertices x 8 bytes (the reference golden).
    assert len(blob) == 1 + 1 + 1 + 2 * 5 + 7 * 8


def test_compressed_roundtrip_exact_for_snapped():
    snapped = _snapped_fixture()
    dec = ser.decode_polygon_compressed(
        ser.encode_polygon_compressed(snapped))
    assert len(dec.loops) == len(snapped.loops)
    for a, b in zip(snapped.loops, dec.loops):
        # Snapped vertices are exact cell centers: decode reproduces
        # them bit-for-bit ("without any loss of precision").
        assert np.array_equal(a.vertices, b.vertices)
        assert a.depth == b.depth


def test_compressed_roundtrip_with_hole_and_offcenter():
    # One snapped shell + one UNSNAPPED hole: the hole's vertices take
    # the off-center exact-point path (24 raw bytes each).
    from s2geometry_d_ray.core.loop import Loop
    from s2geometry_d_ray.core.polygon import Polygon
    shell = initialize_to_snapped(
        make_polygon("0:0, 0:4, 4:4, 4:0"), snap_level=30).loops[0]
    hole_src = Loop.make_regular(2.0, 2.0, 0.01, 8)
    hole = Loop(hole_src.vertices[::-1], depth=1)
    poly = Polygon([shell, hole])
    blob = ser.encode_polygon_compressed(poly)
    dec = ser.decode_polygon_compressed(blob)
    for a, b in zip(poly.loops, dec.loops):
        assert np.array_equal(a.vertices, b.vertices)
        assert a.depth == b.depth


def test_auto_heuristic_picks_compressed_for_snapped():
    snapped = _snapped_fixture()
    blob = ser.encode_polygon_auto(snapped)
    assert blob[0] == ser._COMPRESSED_VERSION
    dec = ser.decode_polygon_auto(blob)
    for a, b in zip(snapped.loops, dec.loops):
        assert np.array_equal(a.vertices, b.vertices)


def test_auto_heuristic_picks_lossless_for_raw():
    # A raw 48-gon has no snapped vertices: 26 bytes/vertex compressed
    # estimate loses to 24 lossless.
    from s2geometry_d_ray.core.loop import Loop
    from s2geometry_d_ray.core.polygon import Polygon
    poly = Polygon([Loop.make_regular(10.0, 20.0, 0.1, 48)])
    blob = ser.encode_polygon_auto(poly)
    assert blob[0] == ser._LOSSLESS_VERSION
    dec = ser.decode_polygon_auto(blob)
    assert np.array_equal(dec.loops[0].vertices, poly.loops[0].vertices)


def test_bound_encoded_above_64_vertices():
    from s2geometry_d_ray.core.loop import Loop
    from s2geometry_d_ray.core.polygon import Polygon
    big = initialize_to_snapped(
        Polygon([Loop.make_regular(5.0, 5.0, 0.2, 80)]), snap_level=30)
    blob = ser.encode_polygon_compressed(big)
    dec = ser.decode_polygon_compressed(blob)
    for a, b in zip(big.loops, dec.loops):
        assert np.array_equal(a.vertices, b.vertices)


def test_nth_derivative_coder_roundtrip():
    rng = np.random.default_rng(9)
    vals = rng.integers(-2**31, 2**31, 200).tolist()
    for order in (1, 2, 3):
        enc = ser._NthDerivativeCoder(order)
        dec = ser._NthDerivativeCoder(order)
        assert [dec.decode(enc.encode(v)) for v in vals] == vals


def test_interleave_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(100):
        a = int(rng.integers(0, 2**32))
        b = int(rng.integers(0, 2**32))
        assert ser._deinterleave32(ser._interleave32(a, b)) == (a, b)
