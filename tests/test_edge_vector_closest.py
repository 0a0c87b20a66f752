"""EdgeVectorIndex closest-edge search: batch == scalar == brute, the
warm-start pruning, the shared-vertex tie case, and shape-independence
of the edge_distances2 kernel (the SQL oracle replays it per-edge, so
subset evaluation must be bit-identical to the full matrix)."""

import numpy as np

from s2geometry_d_ray.core.edge import edge_distances2
from s2geometry_d_ray.core.shapeindex import EdgeVectorIndex


def _random_edges(n, seed, spread=0.01):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = a + spread * rng.normal(size=(n, 3))
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return a, b


def _random_points(m, seed):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(m, 3))
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def test_kernel_subset_bit_identity():
    a, b = _random_edges(300, 1)
    pts = _random_points(50, 2)
    full = edge_distances2(pts, a, b)
    rng = np.random.default_rng(3)
    for k in (1, 7, 64):
        sub = rng.choice(300, k, replace=False)
        assert (edge_distances2(pts, a[sub], b[sub])
                == full[:, sub]).all()


def test_batch_equals_brute_indexed_path():
    a, b = _random_edges(400, 4)
    idx = EdgeVectorIndex(a, b)
    assert idx.n_edges > idx.MAX_BRUTE_FORCE_EDGES  # indexed path
    pts = _random_points(200, 5)
    brute = edge_distances2(pts, a, b).min(axis=1)
    d2, eid = idx.closest_edge_batch(pts)
    assert (d2 == brute).all()
    # reported edge achieves the reported distance
    rep = edge_distances2(pts, a[eid], b[eid])
    assert (rep[np.arange(len(pts)), np.arange(len(pts))] == d2).all()


def test_batch_equals_scalar():
    a, b = _random_edges(250, 6)
    idx = EdgeVectorIndex(a, b)
    pts = _random_points(60, 7)
    d2, _ = idx.closest_edge_batch(pts)
    for i in range(len(pts)):
        sd2, _sid = idx.closest_edge(pts[i])
        assert sd2 == d2[i]


def test_warm_start_does_not_prune_optimum():
    # A deliberately BAD (too large) warm bound must not change results;
    # a perfect (achieved) bound must be kept as-is.
    a, b = _random_edges(300, 8)
    idx = EdgeVectorIndex(a, b)
    pts = _random_points(40, 9)
    brute = edge_distances2(pts, a, b).min(axis=1)
    for i in range(len(pts)):
        d2, _ = idx._closest_edge_one(pts[i], best=4.0, best_id=-2)
        assert d2 == brute[i]
        d2w, _ = idx._closest_edge_one(pts[i], best=float(brute[i]),
                                       best_id=0)
        assert d2w == brute[i]


def test_shared_vertex_tie():
    # Probe "behind" the middle vertex of a 2-edge chain: both incident
    # edges hit the vertex case at the SAME vertex -> exact float tie;
    # the search must return that d2 regardless of which edge wins.
    from s2geometry_d_ray.core import coords

    lat = np.array([0.0, 0.0, 0.0])
    lon = np.array([0.0, 10.0, 20.0])
    x, y, z = coords.latlng_to_xyz(lat, lon)
    v = np.stack([x, y, z], axis=1)
    a, b = v[:-1], v[1:]
    px, py, pz = coords.latlng_to_xyz(np.array([5.0]), np.array([10.0]))
    p = np.stack([px, py, pz], axis=1)
    d2 = edge_distances2(p, a, b)[0]
    assert d2[0] == d2[1]  # exact tie through the shared vertex
    idx = EdgeVectorIndex(a, b)
    got, _ = idx.closest_edge_batch(p)
    assert got[0] == d2[0]


def test_polyline_chain_fixture_matches_sql_shape():
    # The geo_closest_edge fixture (25 chains x 7 edges) goes through
    # the indexed path and agrees with brute force everywhere.
    from s2geometry_d_ray.core import coords

    keys = np.arange(25, dtype=np.int64)
    j = np.arange(8, dtype=np.float64)
    la = ((keys * 37) % 100 - 50.0)[:, None]
    lo = ((keys * 73) % 280 - 140.0)[:, None]
    vlat = la + 0.55 * j[None, :] + np.where(j[None, :] % 2 == 1,
                                             1.5, 0.0)
    vlon = lo + 1.1 * j[None, :]
    x, y, z = coords.latlng_to_xyz(vlat.ravel(), vlon.ravel())
    v = np.stack([x, y, z], axis=1).reshape(25, 8, 3)
    a = v[:, :-1, :].reshape(-1, 3)
    b = v[:, 1:, :].reshape(-1, 3)
    idx = EdgeVectorIndex(a, b)
    assert idx.n_edges == 175 and idx.n_edges > idx.MAX_BRUTE_FORCE_EDGES
    pts = _random_points(300, 11)
    brute = edge_distances2(pts, a, b).min(axis=1)
    d2, _ = idx.closest_edge_batch(pts)
    assert (d2 == brute).all()


def test_furthest_identity_matches_brute_max():
    # max over edge points x of |p-x|^2 == 4 - min |-p-x|^2 (unit
    # vectors), and the indexed antipode path equals a dense sampled
    # brute-force maximum to sampling tolerance.
    from s2geometry_d_ray.core import coords

    a, b = _random_edges(300, 21)
    idx = EdgeVectorIndex(a, b)
    pts = _random_points(40, 22)
    d2c, _ = idx.closest_edge_batch(-pts)
    furthest = 4.0 - d2c
    # identity side: exact equality against the brute antipode min
    brute_min = edge_distances2(-pts, a, b).min(axis=1)
    assert (furthest == 4.0 - brute_min).all()
    # semantics side: sampled max over edge points (coarse check)
    t = np.linspace(0.0, 1.0, 33)[None, :, None]
    samples = a[:, None, :] * (1 - t) + b[:, None, :] * t
    samples /= np.linalg.norm(samples, axis=2, keepdims=True)
    flat = samples.reshape(-1, 3)
    d2s = ((pts[:, None, :] - flat[None, :, :]) ** 2).sum(axis=2)
    sampled_max = d2s.max(axis=1)
    assert (furthest >= sampled_max - 1e-9).all()
    assert (furthest <= sampled_max + 1e-3).all()  # sampling gap
