"""Port of test/s2/shapeutil/visit_crossing_edge_pairs_test.d: within-
index crossing pairs on an empty index and on the 10x10 meridian/
parallel edge grid, for both ALL and INTERIOR crossing types, compared
against the O(n^2) brute force."""

import numpy as np

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.crossing import crossing_edge_pairs_within
from s2geometry_d_ray.core.predicates import crossing_sign


def _ll(lat, lng):
    x, y, z = coords.latlng_to_xyz(float(lat), float(lng))
    return np.array([float(x), float(y), float(z)])


def _brute(edges, crossing_type):
    min_sign = 0 if crossing_type == "ALL" else 1
    out = []
    for i in range(len(edges)):
        for j in range(i + 1, len(edges)):
            if crossing_sign(tuple(edges[i][0]), tuple(edges[i][1]),
                             tuple(edges[j][0]), tuple(edges[j][1])) \
                    >= min_sign:
                out.append((i, j))
    return out


def test_no_intersections():
    assert crossing_edge_pairs_within([], "ALL") == []
    assert crossing_edge_pairs_within([], "INTERIOR") == []


def test_edge_grid():
    grid = 10
    edges = []
    for i in range(grid + 1):
        edges.append((_ll(0, i), _ll(grid, i)))
        edges.append((_ll(i, 0), _ll(i, grid)))
    for crossing_type in ("ALL", "INTERIOR"):
        actual = crossing_edge_pairs_within(edges, crossing_type)
        assert actual == _brute(edges, crossing_type), crossing_type
    # Sanity: the grid produces on the order of (grid+1)^2 pairs (the
    # "parallels" are geodesics, so the extreme rows don't all cross).
    assert len(crossing_edge_pairs_within(edges, "ALL")) >= 100


def test_edge_grid_bucketed_path():
    """A 20x20 grid (42 edges) exceeds the brute-force threshold and
    exercises the bucket co-location path."""
    grid = 20
    edges = []
    for i in range(grid + 1):
        edges.append((_ll(0, i), _ll(grid, i)))
        edges.append((_ll(i, 0), _ll(i, grid)))
    assert len(edges) > 27
    for crossing_type in ("ALL", "INTERIOR"):
        actual = crossing_edge_pairs_within(edges, crossing_type)
        assert actual == _brute(edges, crossing_type), crossing_type
