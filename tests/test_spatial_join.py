"""Spatial join correctness: engine join rows vs a brute-force oracle
(every valid page point x every polygon, exact PIP), per FIXTURES.md §6."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

from s2geometry_d_ray.core import coords
from s2geometry_d_ray.sources.pages import pages_table
from s2geometry_d_ray.sources.polygons import make_polygons
from s2geometry_d_ray.stages.geocode import geocode_and_encode, drop_misses
from s2geometry_d_ray.stages.join import JoinRefine, build_polygon_index

N_PAGES = 2000
N_POLYS = 21

_CACHE = {}


def _prepared():
    if "prep" not in _CACHE:
        pages = pages_table(N_PAGES)
        pages = pages.select(["url", "text", "lang"])
        enc = drop_misses(geocode_and_encode(pages))
        polys = make_polygons(N_POLYS)
        _CACHE["prep"] = (enc, polys)
    return _CACHE["prep"]


def _index():
    if "index" not in _CACHE:
        _CACHE["index"] = build_polygon_index(_prepared()[1])
    return _CACHE["index"]


def test_geocode_parse_rates():
    pages = pages_table(2000)
    enc = geocode_and_encode(pages.select(["url", "text", "lang"]))
    n_null = pc.sum(pc.cast(pc.is_null(enc["lat"]), "int64")).as_py()
    # ~6% miss rate (5% no-coord + 1% malformed)
    assert 0.02 < n_null / 2000 < 0.12
    # Valid rows: re-derive lat/lon from the text generator's formula and
    # compare the parsed values representationally.
    lat = enc["lat"].to_numpy(zero_copy_only=False)
    ok = ~np.isnan(lat)
    assert (np.abs(lat[ok]) <= 90).all()


def test_join_matches_bruteforce_oracle():
    enc, polys = _prepared()
    index = _index()
    join = JoinRefine(index)(enc)

    engine = set()
    for u, p, c in zip(join["url"].to_pylist(),
                       join["polygon_id"].to_pylist(),
                       join["contained"].to_pylist()):
        if c:
            engine.add((u, p))

    lat = enc["lat"].to_numpy(zero_copy_only=False)
    lon = enc["lon"].to_numpy(zero_copy_only=False)
    urls = enc["url"].to_pylist()
    x, y, z = coords.latlng_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    oracle = set()
    for rec in polys:
        poly = rec["polygon"]
        lat_r = np.deg2rad(lat)
        lon_r = np.deg2rad(lon)
        pre = poly.bound.expanded(1e-6, 1e-6).contains_batch(lat_r, lon_r)
        if not pre.any():
            continue
        idx = np.nonzero(pre)[0]
        inside = poly.contains_points(pts[idx])
        for i, ok in zip(idx.tolist(), inside.tolist()):
            if ok:
                oracle.add((urls[i], rec["polygon_id"]))

    assert engine == oracle, (
        f"engine-only={list(engine - oracle)[:5]} "
        f"oracle-only={list(oracle - engine)[:5]}")
    assert len(oracle) > 0  # the test is vacuous if nothing matches


def test_interior_shortcut_agrees_with_exact():
    enc, polys = _prepared()
    index = _index()
    fast = JoinRefine(index, exact=True)(enc)
    # Re-run with the interior shortcut disabled: strip interior flags so
    # every candidate goes through exact PIP.
    index_no_int = build_polygon_index(polys)
    for lv in index_no_int["levels"].values():
        lv["flags"] = np.zeros_like(lv["flags"])
    slow = JoinRefine(index_no_int, exact=True)(enc)

    def key(t):
        return sorted(zip(t["url"].to_pylist(), t["polygon_id"].to_pylist(),
                          t["contained"].to_pylist()))

    assert key(fast) == key(slow)


def test_join_row_schema():
    enc, polys = _prepared()
    index = _index()
    join = JoinRefine(index)(enc)
    assert [f.name for f in join.schema] == ["url", "polygon_id", "cell_id",
                                             "contained"]
    assert str(join.schema.field("cell_id").type) == "uint64"


def test_pip_join_polygons_convex_ccw_with_margin():
    """geo_pip_join oracle safety: every loop is CCW (interior on the
    positive side of each edge normal) and strictly convex, and the
    minimum |edge_normal . point| margin over the sf0.001 point grid is
    orders of magnitude above float64 noise — so the SQL hemisphere test
    and the engine's crossing-parity PIP cannot disagree."""
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.geo_queries import _pip_polygons

    polys = _pip_polygons()
    margins = []
    did = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    lat = ((did * 7919) % 18000) / 100.0 - 90.0
    lon = ((did * 104729) % 36000) / 100.0 - 180.0
    x, y, z = coords.latlng_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    for rec in polys:
        v = rec["polygon"].loops[0].vertices
        nrm = np.cross(v, np.roll(v, -1, axis=0))
        # CCW: the loop's own vertices (other than the edge endpoints)
        # are strictly on the positive side of every edge.
        dots_v = nrm @ v.T                      # (edge k, vertex i)
        nv = len(v)
        for k in range(nv):
            keep = np.ones(nv, dtype=bool)
            keep[k] = keep[(k + 1) % nv] = False
            assert dots_v[k, keep].min() > 0, rec["polygon_id"]
        margins.append(np.abs(pts @ nrm.T).min())
    assert min(margins) > 1e-9, min(margins)


def test_spatial_join_oracle_fixture_convex_with_margin():
    """geo_spatial_join oracle safety: the _sj_polygons fixture is
    convex/CCW, the engine's exact PIP agrees with the SQL hemisphere
    determinant on every parsed page point, and the minimum margin is
    far above float64 noise."""
    import pyarrow.compute as pc

    from s2geometry_d_ray.pipelines.geo_queries import _sj_polygons
    from s2geometry_d_ray.stages.geocode import parse_latlon

    t = pages_table(5000)
    p = parse_latlon(t)
    ok = pc.is_valid(p["lat"])
    lat = pc.filter(p["lat"], ok).to_numpy(zero_copy_only=False)
    lon = pc.filter(p["lon"], ok).to_numpy(zero_copy_only=False)
    x, y, z = coords.latlng_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    min_margin = np.inf
    n_inside = 0
    for rec in _sj_polygons():
        v = rec["polygon"].loops[0].vertices
        nrm = np.cross(v, np.roll(v, -1, axis=0))
        dots_v = nrm @ v.T
        nv = len(v)
        for k in range(nv):
            keep = np.ones(nv, dtype=bool)
            keep[k] = keep[(k + 1) % nv] = False
            assert dots_v[k, keep].min() > 0, rec["polygon_id"]
        m = (pts @ nrm.T).min(axis=1)
        inside_sql = m > 0
        inside_eng = rec["polygon"].contains_points(pts)
        assert (inside_sql == inside_eng).all(), rec["polygon_id"]
        n_inside += int(inside_eng.sum())
        min_margin = min(min_margin, float(np.abs(m).min()))
    assert n_inside > 500          # the join is non-trivial
    assert min_margin > 1e-9, min_margin


def test_pages_lat_formula_matches_sql_replayable_form():
    """The uniform-lat branch must stay on the atan2+sqrt form (numpy
    arcsin and DuckDB asin differ in the last ulp) — guards the
    geo_spatial_join oracle's bit-exactness."""
    from s2geometry_d_ray.sources.pages import _mix64, _unit, latlon_for_rows

    rid = np.arange(1000, dtype=np.uint64)
    lat, _ = latlon_for_rows(rid, seed=42)
    h2 = _mix64(rid ^ np.uint64(43))
    h4 = _mix64(rid ^ np.uint64(45))
    cold = (h4 % np.uint64(100)) >= 30
    z = _unit(h2, -1.0, 1.0)
    expect = np.rad2deg(np.arctan2(z, np.sqrt(1.0 - z * z)))
    expect = np.clip(expect, -89.999, 89.999)
    assert np.array_equal(lat[cold], expect[cold])
