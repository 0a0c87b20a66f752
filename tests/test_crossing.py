"""Crossing-edge query conformance: indexed results equal brute force."""

from __future__ import annotations

import numpy as np

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.crossing import (crossing_edge_pairs,
                                            crossing_edges,
                                            polygons_boundaries_cross)
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon
from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex


def _index(lat, lon, radius, n):
    return PolygonShapeIndex(Polygon([Loop.make_regular(lat, lon,
                                                        radius, n)]))


def test_crossing_edges_indexed_equals_brute():
    idx = _index(10.0, 20.0, 0.02, 256)
    rng = np.random.default_rng(9)
    for _ in range(25):
        # Random chords near the ring: endpoints inside/outside mixes.
        la = 10.0 + rng.uniform(-2.5, 2.5)
        lo = 20.0 + rng.uniform(-2.5, 2.5)
        lb = 10.0 + rng.uniform(-2.5, 2.5)
        lb2 = 20.0 + rng.uniform(-2.5, 2.5)
        a = np.array(coords.latlng_to_xyz(la, lo), dtype=np.float64)
        b = np.array(coords.latlng_to_xyz(lb, lb2), dtype=np.float64)
        fast = crossing_edges(idx, a, b, brute_force=False)
        brute = crossing_edges(idx, a, b, brute_force=True)
        assert (fast == brute).all(), (la, lo, lb, lb2)


def test_crossing_edges_through_ring():
    idx = _index(0.0, 0.0, 0.01, 64)
    # A chord straight through the ring crosses exactly 2 edges.
    a = np.array(coords.latlng_to_xyz(0.0, -2.0), dtype=np.float64)
    b = np.array(coords.latlng_to_xyz(0.0, 2.0), dtype=np.float64)
    hits = crossing_edges(idx, a, b)
    assert len(hits) == 2
    # A far-away edge crosses nothing.
    c = np.array(coords.latlng_to_xyz(45.0, 45.0), dtype=np.float64)
    d = np.array(coords.latlng_to_xyz(46.0, 46.0), dtype=np.float64)
    assert len(crossing_edges(idx, c, d)) == 0


def test_crossing_edge_pairs_overlapping_rings():
    ia = _index(0.0, 0.0, 0.01, 48)
    ib = _index(0.0, 2.0, 0.01, 48)   # disjoint (3.5 radii apart)
    assert not polygons_boundaries_cross(ia, ib)
    ic = _index(0.0, 0.45, 0.01, 48)  # overlapping ring
    assert polygons_boundaries_cross(ia, ic)
    pairs = crossing_edge_pairs(ia, ic)
    assert len(pairs) >= 2  # two boundary intersection points minimum
    # Every reported pair really crosses (spot re-verified by brute).
    from s2geometry_d_ray.core.predicates import crossing_sign
    for i, j in pairs:
        assert crossing_sign(tuple(ia.edge_a[i]), tuple(ia.edge_b[i]),
                             tuple(ic.edge_a[j]),
                             tuple(ic.edge_b[j])) > 0
    # Completeness vs full brute-force pairwise scan.
    brute_pairs = []
    for i in range(ia.n_edges):
        for j in range(ic.n_edges):
            if crossing_sign(tuple(ia.edge_a[i]), tuple(ia.edge_b[i]),
                             tuple(ic.edge_a[j]),
                             tuple(ic.edge_b[j])) > 0:
                brute_pairs.append((i, j))
    assert pairs == sorted(brute_pairs)
