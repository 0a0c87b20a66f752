"""Crossing-join stage conformance: the indexed candidate path of
stages/crossing_join.py must report exactly the pairs brute force does
(every edge tested with the exact predicate), on the nation-chain
fixture and on randomized segments (s2crossing_edge_query.d
getCrossings INTERIOR semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.crossing import crossing_edges
from s2geometry_d_ray.core.shapeindex import EdgeVectorIndex
from s2geometry_d_ray.pipelines.geo_queries import _nation_chains


@pytest.fixture(scope="module")
def chain_index():
    a, b, nation, edge_j = _nation_chains(np.arange(25))
    return EdgeVectorIndex(a, b), nation, edge_j


def _seg(k):
    clat = ((k * 3571) % 16000) / 100.0 - 80.0
    clon = ((k * 6689) % 35000) / 100.0 - 175.0
    ax, ay, az = coords.latlng_to_xyz(clat - 1.0, clon - 1.3)
    bx, by, bz = coords.latlng_to_xyz(clat + 1.0, clon + 1.3)
    return np.array([ax, ay, az]), np.array([bx, by, bz])


def test_indexed_equals_brute_on_fixture_segments(chain_index):
    index, _, _ = chain_index
    hits = 0
    for k in range(1, 400):
        a, b = _seg(np.int64(k))
        got = crossing_edges(index, a, b, brute_force=False)
        want = crossing_edges(index, a, b, brute_force=True)
        assert np.array_equal(np.sort(got), np.sort(want)), k
        hits += len(want)
    assert hits > 0  # the fixture range actually exercises crossings


def test_indexed_equals_brute_on_random_great_segments(chain_index):
    index, _, _ = chain_index
    rng = np.random.default_rng(11)
    hits = 0
    for _ in range(200):
        v = rng.normal(size=(2, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        got = crossing_edges(index, v[0], v[1], brute_force=False)
        want = crossing_edges(index, v[0], v[1], brute_force=True)
        assert np.array_equal(np.sort(got), np.sort(want))
        hits += len(want)
    assert hits > 0


def test_stage_labels_match_edge_ids(chain_index):
    # The (nation, edge_j) labels the stage emits must be the fixture's
    # own edge order: edge id e belongs to nation e // 7, local j e % 7.
    _, nation, edge_j = chain_index
    assert np.array_equal(nation, np.repeat(np.arange(25), 7))
    assert np.array_equal(edge_j, np.tile(np.arange(7), 25))
