"""Round-4 surfaces: CellUnionRegion, flood-fill covering oracle
semantics, simplified-in-cell pointwise guard soundness, flat-pair
mutable-index queries, antipodal crossing prune, empty closest-edge
index."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cellunion import CellUnionRegion


def _run_cells(lat, lon, atom_level=14, run_len=40):
    leaf = ci.cellid_from_latlng(np.float64([lat]), np.float64([lon]))[0]
    start = int(ci.parent(np.uint64([leaf]), atom_level)[0])
    two_mk = 2 << (2 * (30 - atom_level))
    return [c for c in (start + two_mk * t for t in range(run_len))
            if c < (6 << 61)]


class TestCellUnionRegion:
    def test_exact_intersect_and_contain(self):
        cells = np.uint64(_run_cells(37.0, -3.0))
        r = CellUnionRegion(cells)
        # member cell: contained and intersecting
        assert r.contains_cell(cells[5])
        assert r.may_intersect_cell(cells[5])
        # its parent intersects but is not contained
        par = ci.parent(cells[5:6], 12)[0]
        assert r.may_intersect_cell(par)
        assert not r.contains_cell(par)
        # a child is contained
        ch = ci.child_begin(cells[5:6], 16)[0]
        assert r.may_intersect_cell(ch)
        assert r.contains_cell(ch)
        # a far-away cell neither intersects nor is contained
        far = ci.cellid_from_latlng(np.float64([-37.0]),
                                    np.float64([177.0]))[0]
        far12 = ci.parent(np.uint64([far]), 12)[0]
        assert not r.may_intersect_cell(far12)
        assert not r.contains_cell(far12)

    def test_cap_bound_contains_members(self):
        from s2geometry_d_ray.core.cell import Cell
        cells = np.uint64(_run_cells(10.0, 20.0))
        cap = CellUnionRegion(cells).get_cap_bound()
        for c in cells[::7].tolist():
            ctr = Cell(int(c)).center()
            d = np.linalg.norm(np.asarray(ctr) - np.asarray(cap.center))
            assert 2 * np.arcsin(min(1.0, 0.5 * d)) \
                <= cap.radius_radians() + 1e-12


class TestSimpleCoveringOracleSemantics:
    """The geo_covering_tokens contract: flood fill at level L over a
    Hilbert-contiguous level-K run returns EXACTLY the distinct level-L
    ancestors (connectivity via curve adjacency + exact range
    predicate)."""

    @pytest.mark.parametrize("lat,lon", [(37.0, -3.0), (-80.0, 150.0),
                                         (0.01, 0.01), (45.0, 179.9)])
    def test_flood_fill_equals_ancestors(self, lat, lon):
        from s2geometry_d_ray.core.coverer import get_simple_covering
        cells = _run_cells(lat, lon)
        region = CellUnionRegion(np.uint64(cells))
        x, y, z = coords.latlng_to_xyz(np.float64([lat]),
                                       np.float64([lon]))
        cov = get_simple_covering(region, (x[0], y[0], z[0]), 12)
        expect = np.unique(ci.parent(np.uint64(cells), 12))
        assert np.array_equal(np.sort(np.asarray(cov, np.uint64)), expect)

    def test_consecutive_same_level_cells_are_edge_adjacent(self):
        rng = np.random.default_rng(3)
        lat = rng.uniform(-89, 89, 300)
        lon = rng.uniform(-180, 180, 300)
        cells = np.unique(ci.parent(ci.cellid_from_latlng(lat, lon), 14))
        two_mk = np.uint64(2 << (2 * (30 - 14)))
        nxt = cells + two_mk
        ok = nxt < (np.uint64(6) << np.uint64(61))
        for c, n in zip(cells[ok].tolist(), nxt[ok].tolist()):
            assert np.uint64(n) in ci.edge_neighbors(np.uint64([c]))[0]


class TestSimplifyInCellPointwise:
    def test_guarded_membership_matches_analytic(self):
        """For guarded points, membership in the CONSTRUCTED simplified
        tile equals analytic membership in disc-intersect-cell — the
        exact claim the SQL oracle replays."""
        from s2geometry_d_ray.pipelines.geo_queries import \
            _simplify_in_cell_tiles
        tiles = _simplify_in_cell_tiles([3])
        rec = tiles[3]
        dn = rec["disc_normals"]
        rng = np.random.default_rng(11)
        lat = rng.uniform(-89, 89, 80000)
        lon = rng.uniform(-180, 180, 80000)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        pts = np.stack([x, y, z], axis=1)
        leaf = ci.cellid_from_latlng(lat, lon)
        checked = 0
        for t in rec["tiles"]:
            sel = np.nonzero((leaf >= np.uint64(t["cmin"]))
                             & (leaf <= np.uint64(t["cmax"])))[0]
            if not len(sel):
                continue
            px, py, pz = x[sel], y[sel], z[sel]
            cn = t["cell_normals"]
            cd = np.stack([cn[q, 0] * px + cn[q, 1] * py + cn[q, 2] * pz
                           for q in range(4)])
            dd = np.stack([dn[q, 0] * px + dn[q, 1] * py + dn[q, 2] * pz
                           for q in range(len(dn))])
            g = t["sin_guard"]
            guard = (np.min(np.abs(cd), axis=0) > g) \
                & (np.min(np.abs(dd), axis=0) > g)
            if not guard.any():
                continue
            cand = sel[guard]
            analytic = np.min(dd, axis=0)[guard] > 0
            got = np.zeros(len(cand), dtype=bool) if t["simp"] is None \
                else t["simp"].contains_points(pts[cand])
            assert np.array_equal(got, analytic)
            checked += len(cand)
        assert checked > 50  # non-vacuous

    def test_tiles_really_simplify(self):
        from s2geometry_d_ray.pipelines.geo_queries import \
            _simplify_in_cell_tiles
        tiles = _simplify_in_cell_tiles([0, 7])
        assert any(t["simp"] is not None for r in tiles.values()
                   for t in r["tiles"])


class TestMutableIndexPairs:
    def test_pairs_match_listing(self):
        from s2geometry_d_ray.core.mutable_index import MutableShapeIndexSet
        from s2geometry_d_ray.core.loop import Loop
        from s2geometry_d_ray.core.polygon import Polygon
        mset = MutableShapeIndexSet()
        for k in range(6):
            mset.add(Polygon([Loop.make_regular(10.0 * k - 20.0,
                                                15.0 * k - 40.0,
                                                0.3, 16)]))
        rng = np.random.default_rng(5)
        lat = rng.uniform(-60, 60, 500)
        lon = rng.uniform(-90, 90, 500)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        p = np.stack([x, y, z], axis=1)
        pt, sid = mset.containing_pairs(p)
        # lexsorted flat pairs
        assert np.all(np.diff(pt) >= 0)
        lists = mset.containing_shapes(p)
        flat_pt = np.concatenate([np.full(len(h), i, np.int64)
                                  for i, h in enumerate(lists)]) \
            if any(len(h) for h in lists) else np.empty(0, np.int64)
        flat_sid = np.concatenate([h for h in lists]) \
            if any(len(h) for h in lists) else np.empty(0, np.int64)
        assert np.array_equal(pt, flat_pt)
        assert np.array_equal(sid, flat_sid)
        any_hits = mset.contains_points_any(p)
        assert np.array_equal(any_hits,
                              np.array([len(h) > 0 for h in lists]))


class TestAdviceFixes:
    def test_closest_edge_batch_empty_index(self):
        from s2geometry_d_ray.core.shapeindex import EdgeVectorIndex
        idx = EdgeVectorIndex(np.empty((0, 3)), np.empty((0, 3)))
        d2, eid = idx.closest_edge_batch(np.array([[1.0, 0.0, 0.0]]))
        assert np.isinf(d2[0]) and eid[0] == -1

    def test_antipodal_edge_half_angle_unprunable(self):
        from s2geometry_d_ray.core.shapeindex import EdgeVectorIndex
        a = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        b = np.array([[-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        idx = EdgeVectorIndex(a, b)
        assert idx.edge_half_ang[0] == np.pi          # antipodal
        assert idx.edge_half_ang[1] < np.pi / 2 + 1e-12

    def test_next_prev_wrap_no_warning(self):
        last = (np.uint64(6) << np.uint64(61)) - np.uint64(1)
        first = np.uint64(1)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            n = ci.next_wrap(last)
            p = ci.prev_wrap(first)
        assert int(n) == 1
        assert int(p) == int(last)


class TestSessionBuckets:
    def test_more_than_64_buckets_populate(self, ray_session, sf_dir):
        """ADVICE r3: a fixed 6-bit shift capped the sessionizer at 64
        populated buckets; the shift now derives from n_buckets.  The
        result must also be bucket-count-invariant (sessions are
        per-user; any bucketing that keeps a user whole is correct)."""
        from s2geometry_d_ray.pipelines.relational import events_sessions
        a = events_sessions(sf_dir, n_buckets=64)
        b = events_sessions(sf_dir, n_buckets=200)
        import pandas as pd
        pa_ = a.sort_values(list(a.columns)).reset_index(drop=True)
        pb_ = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(pa_, pb_)
