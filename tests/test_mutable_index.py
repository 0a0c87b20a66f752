"""MutableShapeIndexSet conformance: indexed == brute after every
mutation in an add/remove sequence (the mutable_s2shape_index.d:404-466
batching contract), plus incrementality — applying an update must not
rebuild the surviving shapes' sub-indexes."""

from __future__ import annotations

import numpy as np

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.mutable_index import MutableShapeIndexSet
from s2geometry_d_ray.core.polygon import Polygon


def _poly(seed):
    rng = np.random.default_rng(seed)
    clat = rng.uniform(-60, 60)
    clon = rng.uniform(-170, 170)
    r = rng.uniform(0.05, 0.4)
    shell = Loop.make_regular(clat, clon, r, 8 + int(seed) % 24)
    if seed % 3 == 0:
        hole = Loop.make_regular(clat, clon, r * 0.4, 12, depth=1)
        return Polygon([shell, hole])
    return Polygon([shell])


def _points(n=2000, seed=99):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = np.rad2deg(np.arcsin(rng.uniform(-1, 1, n)))
    x, y, z = coords.latlng_to_xyz(lat, lon)
    return np.stack([x, y, z], axis=1)


def _brute(shapes, pts):
    out = [[] for _ in range(len(pts))]
    for sid in sorted(shapes):
        inside = shapes[sid].contains_points(pts)
        for i in np.nonzero(inside)[0]:
            out[int(i)].append(sid)
    return out


def test_mutations_conform_to_brute_force():
    idx = MutableShapeIndexSet()
    live = {}
    pts = _points()
    rng = np.random.default_rng(5)
    sids = []
    for step in range(30):
        if sids and rng.random() < 0.35:
            victim = sids.pop(rng.integers(len(sids)))
            idx.remove(victim)
            del live[victim]
        else:
            poly = _poly(step)
            sid = idx.add(poly)
            live[sid] = poly
            sids.append(sid)
        # sometimes batch several mutations before querying
        if rng.random() < 0.3 and step != 29:
            continue
        got = idx.containing_shapes(pts)
        want = _brute(live, pts)
        for g, w in zip(got, want):
            assert g.tolist() == w


def test_apply_is_incremental():
    """Adding/removing shape B must not rebuild shape A's sub-index."""
    idx = MutableShapeIndexSet()
    a = idx.add(_poly(1))
    idx.containing_shapes(_points(10))          # apply
    sub_a = idx._subindex[a]
    b = idx.add(_poly(2))
    idx.containing_shapes(_points(10))          # apply the addition
    assert idx._subindex[a] is sub_a            # untouched object
    idx.remove(b)
    idx.containing_shapes(_points(10))
    assert idx._subindex[a] is sub_a
    assert b not in idx._subindex


def test_mutations_are_queued_until_first_query():
    idx = MutableShapeIndexSet()
    sid = idx.add(_poly(4))
    assert sid in idx._pending_add and not idx._subindex
    # remove-before-apply cancels the queued addition outright
    idx.remove(sid)
    assert not idx._pending_add
    got = idx.containing_shapes(_points(5))
    assert all(len(g) == 0 for g in got)


def test_len_counts_pending_and_applied():
    idx = MutableShapeIndexSet()
    a = idx.add(_poly(1))
    assert len(idx) == 1
    idx.containing_shapes(_points(5))
    idx.add(_poly(2))
    assert len(idx) == 2
    idx.remove(a)
    assert len(idx) == 1


def test_indexed_polygon_layer():
    """IndexedS2PolygonLayer (s2polygon_layer.d:291-318): the builder's
    layer output lands in the mutable index set; empty results skip the
    add."""
    from s2geometry_d_ray.core.builder import Builder

    idx = MutableShapeIndexSet()
    b = Builder()
    loop = Loop.make_regular(10.0, 20.0, 0.2, 16)
    b.add_loop(loop.vertices)
    poly, sid = b.build_polygon_into_index(idx)
    assert sid is not None and len(idx) == 1
    # The indexed shape answers containment exactly as the polygon.
    pts = _points(500, seed=3)
    got = idx.contains_points_any(pts)
    want = np.array([len(s) > 0 for s in _brute({sid: poly}, pts)])
    assert np.array_equal(got, want)

    # An empty build (two opposite directed edges cancel as a sibling
    # pair) must NOT be added.
    b2 = Builder()
    a = np.asarray(coords.latlng_to_xyz(0.0, 0.0), dtype=np.float64)
    c = np.asarray(coords.latlng_to_xyz(0.0, 1.0), dtype=np.float64)
    b2.add_edge(a, c)
    b2.add_edge(c, a)
    poly2, sid2 = b2.build_polygon_into_index(idx)
    assert sid2 is None and len(idx) == 1
