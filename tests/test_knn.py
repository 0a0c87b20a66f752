"""S2ClosestPointQueryTest-style kNN conformance: brute-force and pruned
paths must return identical (distance, data)-ordered results across
circle / fractal / grid point layouts (reference
test/s2/s2closest_point_query_test.d:67-243), plus duplicate-point and
option (max_distance, region, max_points) behavior."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cap import Cap, chord2_from_angle
from s2geometry_d_ray.core.knn import ClosestPointQuery, PointIndex
from s2geometry_d_ray.core.rect import LatLngRect
from s2geometry_d_ray.core.loop import Loop

RNG = np.random.default_rng(1)
KM_RAD = 10.0 / 6371.01  # kmToAngle(10), test file :128


def _frame(center):
    z = np.asarray(center) / np.linalg.norm(center)
    x = np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 else np.array([0, 1.0, 0])
    x = x - z * (x @ z)
    x /= np.linalg.norm(x)
    return x, np.cross(z, x), z


def circle_points(center, radius, n):
    """Regular points on a circle (near-worst-case equidistance, :76-92)."""
    x, y, z = _frame(center)
    th = 2 * math.pi * np.arange(n) / n
    pts = math.sin(radius) * (np.cos(th)[:, None] * x
                              + np.sin(th)[:, None] * y) \
        + math.cos(radius) * z
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def grid_points(center, radius, n):
    """sqrt(n) x sqrt(n) tangent grid covering the cap (:109-125)."""
    x, y, z = _frame(center)
    k = int(math.sqrt(n))
    sp = 2 * radius / k
    u, v = np.meshgrid(np.arange(k), np.arange(k))
    du = (u.ravel() - (k - 1) / 2) * sp
    dv = (v.ravel() - (k - 1) / 2) * sp
    pts = du[:, None] * x + dv[:, None] * y + z
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def fractal_points(center, radius, n):
    """Fractal-loop vertices (dimension ~1.5, :94-107) — approximated by
    the synthetic fractal ring factory."""
    from s2geometry_d_ray.sources.polygons import _fractal_loop
    lat, lon = coords.xyz_to_latlng(*center)
    rng = np.random.default_rng(3)
    la, lo = _fractal_loop(rng, float(lat), float(lon), radius, level=4)
    x, y, z = coords.latlng_to_xyz(la[:n], lo[:n])
    return np.stack([x, y, z], axis=1)


LAYOUTS = {"circle": circle_points, "grid": grid_points,
           "fractal": fractal_points}


def _rand_center(rng):
    v = rng.normal(size=3)
    return v / np.linalg.norm(v)


@pytest.mark.parametrize("layout", sorted(LAYOUTS))
def test_brute_vs_pruned_equivalence(layout):
    rng = np.random.default_rng(11)
    for trial in range(4):
        center = _rand_center(rng)
        pts = LAYOUTS[layout](center, 0.5 * KM_RAD, 400)
        idx = PointIndex(pts[:, 0], pts[:, 1], pts[:, 2])
        for q in range(12):
            # queries sampled inside 2x the cap (:198-223)
            off = rng.normal(size=3) * KM_RAD
            t = center + off
            t = t / np.linalg.norm(t)
            k = int(rng.integers(1, 20))
            maxd = None
            if rng.random() < 0.5:
                maxd = chord2_from_angle(KM_RAD * rng.random())
            brute = ClosestPointQuery(idx, max_points=k,
                                      max_distance_chord2=maxd,
                                      use_brute_force=True)
            fast = ClosestPointQuery(idx, max_points=k,
                                     max_distance_chord2=maxd)
            bd, bi = brute.find_closest_points(t)
            fd, fi = fast.find_closest_points(t)
            assert (bi == fi).all(), (layout, trial, q)
            assert np.allclose(bd, fd, atol=0)


def test_many_duplicate_points():
    # ManyDuplicatePoints (:54-65): duplicates preserved, all returned.
    pts = np.tile(np.array([[1.0, 0.0, 0.0]]), (50, 1))
    idx = PointIndex(pts[:, 0], pts[:, 1], pts[:, 2])
    q = ClosestPointQuery(idx, max_points=100)
    d2, data = q.find_closest_points((1.0, 0.0, 0.0))
    assert len(data) == 50
    assert (np.sort(data) == np.arange(50)).all()
    assert (d2 == 0).all()


def test_result_ordering_distance_then_data():
    pts = circle_points(np.array([0, 0, 1.0]), 0.01, 16)  # equidistant
    idx = PointIndex(pts[:, 0], pts[:, 1], pts[:, 2])
    q = ClosestPointQuery(idx, max_points=16, use_brute_force=True)
    d2, data = q.find_closest_points((0.0, 0.0, 1.0))
    # Results strictly ordered by (distance, data) — Result.opCmp.
    pairs = list(zip(d2.tolist(), data.tolist()))
    assert pairs == sorted(pairs)
    assert len(pairs) == 16


def test_region_option():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    idx = PointIndex(v[:, 0], v[:, 1], v[:, 2])
    rect = LatLngRect.from_degrees(-30, -60, 30, 60)
    q = ClosestPointQuery(idx, max_points=10, region=rect)
    d2, data = q.find_closest_points((1.0, 0.0, 0.0))
    assert len(data) > 0
    for did in data:
        p = idx.points[np.nonzero(idx.data == did)[0][0]]
        assert rect.contains_point(tuple(p))
    # Same as brute with the region.
    qb = ClosestPointQuery(idx, max_points=10, region=rect,
                           use_brute_force=True)
    bd, bi = qb.find_closest_points((1.0, 0.0, 0.0))
    assert (bi == data).all()


def test_edge_distance_vs_arc():
    from s2geometry_d_ray.core.edge import (chord2_to_radians,
                                            edge_distances2)
    # Distance from a pole point to the equator segment [0,90]deg lon.
    a = np.array([[1.0, 0, 0]])
    b = np.array([[0, 1.0, 0]])
    x = np.array([[0, 0, 1.0]])       # north pole: 90deg from the edge
    d2 = edge_distances2(x, a, b)
    assert abs(chord2_to_radians(d2[0, 0]) - math.pi / 2) < 1e-12
    # A point past endpoint A: closest is the vertex.
    x2 = coords.latlng_to_xyz(0.0, -10.0)
    d2b = edge_distances2(np.array([x2]), a, b)
    assert abs(chord2_to_radians(d2b[0, 0]) - math.radians(10)) < 1e-12
    # Interior closest point.
    x3 = coords.latlng_to_xyz(5.0, 45.0)
    d2c = edge_distances2(np.array([x3]), a, b)
    assert abs(chord2_to_radians(d2c[0, 0]) - math.radians(5)) < 1e-9


def test_measures_loop_area():
    from s2geometry_d_ray.core.measures import loop_area, polygon_area
    # A small regular loop's area approximates the planar circle area.
    r = 0.02
    loop = Loop.make_regular(15.0, 30.0, r, 256)
    area = loop_area(loop.vertices)
    expect = math.pi * r * r
    assert abs(area - expect) / expect < 0.01
    # Hemisphere loop (equator, CCW around north pole): area = 2*pi.
    th = np.linspace(0, 2 * math.pi, 64, endpoint=False)
    eq = np.stack([np.cos(th), np.sin(th), np.zeros_like(th)], axis=1)
    hemi = loop_area(eq)
    assert abs(hemi - 2 * math.pi) < 1e-6
    # Polygon with hole: shell minus hole.
    from s2geometry_d_ray.core.polygon import Polygon
    shell = Loop.make_regular(15.0, 30.0, 0.02, 128)
    hole = Loop.make_regular(15.0, 30.0, 0.01, 128, depth=1)
    pa = polygon_area([shell, hole])
    expect2 = math.pi * (0.02 ** 2 - 0.01 ** 2)
    assert abs(pa - expect2) / expect2 < 0.01


def test_project_interpolate():
    from s2geometry_d_ray.core.edge import interpolate, project
    a = np.array([1.0, 0, 0])
    b = np.array([0, 1.0, 0])
    mid = interpolate(0.5, a, b)
    assert np.allclose(mid, np.array([1, 1, 0]) / math.sqrt(2))
    x = coords.latlng_to_xyz(10.0, 45.0)
    p = project(np.array(x), a, b)
    # Projection of a 45-lon point onto the equator edge is (45, lat 0).
    plat, plon = coords.xyz_to_latlng(*p)
    assert abs(float(plat)) < 1e-9
    assert abs(float(plon) - 45.0) < 1e-9


def test_polygon_boundary_distance():
    from s2geometry_d_ray.core.edge import chord2_to_radians
    from s2geometry_d_ray.core.polygon import Polygon
    from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
    loop = Loop.make_regular(0.0, 0.0, 0.01, 4096)
    idx = PolygonShapeIndex(Polygon([loop]))
    # Distance from the center to a dense regular ring ~= the radius.
    center = np.array(coords.latlng_to_xyz(0.0, 0.0), dtype=np.float64)
    outside = np.array(coords.latlng_to_xyz(0.0, 2.0), dtype=np.float64)
    d2 = idx.boundary_distance2(np.stack([center, outside]))
    assert abs(chord2_to_radians(d2[0]) - 0.01) < 1e-5
    assert abs(chord2_to_radians(d2[1]) - (math.radians(2.0) - 0.01)) < 1e-4


class TestBestFirstClosestEdge:
    """s2closest_edge_query_base.d:380-750: best-first over the index
    must equal brute force and evaluate far fewer edges."""

    def _big_polygon(self, n=4000):
        import numpy as np
        from s2geometry_d_ray.core.loop import Loop
        from s2geometry_d_ray.core.polygon import Polygon
        import math
        return Polygon([Loop.make_regular(37.0, -15.0, math.radians(20.0),
                                          n)])

    def test_matches_brute(self):
        import numpy as np
        from s2geometry_d_ray.core import coords
        from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
        idx = PolygonShapeIndex(self._big_polygon())
        assert idx.n_edges > idx.MAX_BRUTE_FORCE_EDGES
        rng = np.random.default_rng(11)
        lats = 37.0 + 45.0 * rng.uniform(-1, 1, 200)
        lons = -15.0 + 60.0 * rng.uniform(-1, 1, 200)
        x, y, z = coords.latlng_to_xyz(np.clip(lats, -89.9, 89.9), lons)
        pts = np.stack([x, y, z], axis=1)
        fast = idx.boundary_distance2(pts)
        brute = idx.boundary_distance2_brute(pts)
        assert np.allclose(fast, brute, rtol=1e-12, atol=0)

    def test_sublinear_edge_evaluations(self):
        import numpy as np
        from s2geometry_d_ray.core import coords
        from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
        idx = PolygonShapeIndex(self._big_polygon())
        # near-boundary query: tight pruning, tiny candidate annulus
        x, y, z = coords.latlng_to_xyz(56.0, -15.0)
        d2, eid = idx.closest_edge(np.array([x, y, z]))
        assert 0 <= eid < idx.n_edges
        assert idx._last_edges_evaluated < idx.n_edges / 10
        # far interior query: many near-ties, still strictly sublinear
        x, y, z = coords.latlng_to_xyz(40.0, -10.0)
        idx.closest_edge(np.array([x, y, z]))
        assert idx._last_edges_evaluated < idx.n_edges / 2


class TestDistanceTargets:
    """s2min_distance_targets.d: point/edge/cell targets give the same
    results via the pruned query as via brute force."""

    def _index(self, n=2000, seed=13):
        import numpy as np
        from s2geometry_d_ray.core.knn import PointIndex
        rng = np.random.default_rng(seed)
        pts = rng.normal(size=(n, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        return PointIndex(pts[:, 0], pts[:, 1], pts[:, 2])

    def test_edge_and_cell_targets_match_brute(self):
        import numpy as np
        from s2geometry_d_ray.core import cellid as ci
        from s2geometry_d_ray.core.cell import Cell
        from s2geometry_d_ray.core.knn import (CellTarget,
                                               ClosestPointQuery,
                                               EdgeTarget, PointTarget)
        idx = self._index()
        rng = np.random.default_rng(7)
        for _ in range(20):
            a = rng.normal(size=3); a /= np.linalg.norm(a)
            b = a + 0.05 * rng.normal(size=3); b /= np.linalg.norm(b)
            leaf = ci.cellid_from_xyz(a[0:1], a[1:2], a[2:3])[0]
            cell = Cell(int(ci.parent(np.uint64(leaf), 6)))
            for target in (PointTarget(a), EdgeTarget(a, b),
                           CellTarget(cell)):
                fast = ClosestPointQuery(idx, max_points=4) \
                    .find_closest_points_to_target(target)
                brute = ClosestPointQuery(idx, max_points=4,
                                          use_brute_force=True) \
                    .find_closest_points_to_target(target)
                assert fast[1].tolist() == brute[1].tolist()
                assert np.allclose(fast[0], brute[0], rtol=1e-12)

    def test_point_target_matches_point_api(self):
        import numpy as np
        from s2geometry_d_ray.core.knn import (ClosestPointQuery,
                                               PointTarget)
        idx = self._index()
        rng = np.random.default_rng(9)
        p = rng.normal(size=3); p /= np.linalg.norm(p)
        q = ClosestPointQuery(idx, max_points=5)
        d2a, ida = q.find_closest_points(p)
        d2b, idb = q.find_closest_points_to_target(PointTarget(p))
        assert ida.tolist() == idb.tolist()
        assert np.allclose(d2a, d2b)


def test_batch_equals_scalar_path():
    """find_closest_points_batch returns exactly the scalar per-query
    results (same pruning guarantee, vectorized mechanism) across index
    sizes spanning the brute cutover, k > n, and max_distance."""
    import numpy as np
    from s2geometry_d_ray.core.knn import ClosestPointQuery, PointIndex
    rng = np.random.default_rng(20260817)

    def rand_pts(n):
        v = rng.normal(size=(n, 3))
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    for n, m, k, maxd in [(1500, 120, 5, None), (1500, 120, 4, 0.02),
                          (120, 40, 3, None), (200, 60, 300, None)]:
        pts = rand_pts(n)
        ids = rng.permutation(n).astype(np.int64)
        idx = PointIndex(pts[:, 0], pts[:, 1], pts[:, 2], ids)
        q = ClosestPointQuery(idx, max_points=k, max_distance_chord2=maxd)
        tg = rand_pts(m)
        bq, bd, bdata, br = q.find_closest_points_batch(tg)
        for qi in range(m):
            d2, data = q.find_closest_points(tuple(tg[qi]))
            sel = bq == qi
            assert np.array_equal(bdata[sel], data), (n, m, k, maxd, qi)
            assert np.array_equal(bd[sel], d2), (n, m, k, maxd, qi)
            assert np.array_equal(br[sel],
                                  np.arange(1, sel.sum() + 1)), (qi,)
