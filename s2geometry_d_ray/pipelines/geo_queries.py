"""Geo query family over sf_dir tables.

To make spatial results oracle-checkable in DuckDB (which has no S2), the
point set is derived DETERMINISTICALLY from documents.doc_id with integer
arithmetic reproduced verbatim in the oracle SQL:

    lat = ((doc_id * 7919)   % 18000) / 100.0 - 90.0
    lon = ((doc_id * 104729) % 36000) / 100.0 - 180.0

Integer-derived doubles are bit-identical across numpy and DuckDB, so
filters/joins/grid tiles hash-match exactly. S2-specific operators
(cell encode, coverings, tile tokens) have no SQL equivalent and are
registered without an oracle (rows-only check) but are PIP/invariant
tested in tests/."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core import cellid as ci

GEO_LAT_EXPR = "((doc_id * 7919) % 18000) / 100.0 - 90.0"
GEO_LON_EXPR = "((doc_id * 104729) % 36000) / 100.0 - 180.0"


def _docs(sf_dir, columns=("doc_id",)):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


def _add_latlon(batch: pa.Table) -> pa.Table:
    did = batch["doc_id"].to_numpy(zero_copy_only=False)
    lat = ((did * 7919) % 18000) / 100.0 - 90.0
    lon = ((did * 104729) % 36000) / 100.0 - 180.0
    batch = batch.append_column("lat", pa.array(lat, pa.float64()))
    return batch.append_column("lon", pa.array(lon, pa.float64()))


def geo_points(sf_dir):
    """(doc_id, lat, lon) — the deterministic point table."""
    return _docs(sf_dir).map_batches(_add_latlon, batch_format="pyarrow",
                                     zero_copy_batch=True)


def geo_bbox_filter(sf_dir):
    """Points inside lat [20,60] x lon [-10,40] (vectorized bbox filter)."""
    def filt(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(batch["lat"], 20.0),
                    pc.less_equal(batch["lat"], 60.0)),
            pc.and_(pc.greater_equal(batch["lon"], -10.0),
                    pc.less_equal(batch["lon"], 40.0)))
        return batch.filter(m)
    return geo_points(sf_dir).map_batches(filt, batch_format="pyarrow",
                                          zero_copy_batch=True)


# Deterministic per-nation rects (reproduced in SQL):
#   lat_lo = (n_nationkey * 37) % 120 - 60,  lat_hi = lat_lo + 15
#   lon_lo = (n_nationkey * 73) % 300 - 150, lon_hi = lon_lo + 30
def geo_rect_join(sf_dir):
    """Point-in-rect join: (doc_id, rect_id) for every point inside a
    nation-derived rect. The rect side is broadcast (small dim table)."""
    import ray.data as rd
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    keys = nat["n_nationkey"].to_numpy()
    lat_lo = (keys * 37) % 120 - 60.0
    lon_lo = (keys * 73) % 300 - 150.0
    rects = np.stack([keys.astype(np.float64), lat_lo, lat_lo + 15.0,
                      lon_lo, lon_lo + 30.0], axis=1)

    def join(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        hit = ((lat[:, None] >= rects[None, :, 1])
               & (lat[:, None] <= rects[None, :, 2])
               & (lon[:, None] >= rects[None, :, 3])
               & (lon[:, None] <= rects[None, :, 4]))
        rows, cols = np.nonzero(hit)
        return pa.table({
            "doc_id": pa.array(did[rows], pa.int64()),
            "rect_id": pa.array(rects[cols, 0].astype(np.int64), pa.int64()),
        })

    return geo_points(sf_dir).map_batches(join, batch_format="pyarrow",
                                          zero_copy_batch=True)


def geo_grid_tile_count(sf_dir):
    """Pages per 5-degree grid tile, pre-aggregated inside map_batches."""
    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        ty = np.floor(lat / 5.0).astype(np.int64)
        tx = np.floor(lon / 5.0).astype(np.int64)
        # Offset both to non-negative before packing (ty in [-18,18),
        # tx in [-36,36)) so the unpack round-trips negatives.
        key = (ty + 100) * 1000 + (tx + 500)
        u, c = np.unique(key, return_counts=True)
        return pa.table({"tile_y": pa.array(u // 1000 - 100, pa.int64()),
                         "tile_x": pa.array(u % 1000 - 500, pa.int64()),
                         "partial": pa.array(c, pa.int64())})

    from ray.data.aggregate import Sum
    out = geo_points(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["tile_y", "tile_x"]).aggregate(
            Sum("partial", alias_name="n_points"))
    return out


def geo_cell_encode(sf_dir):
    """S2 leaf cell + level-12 ancestor + token per point.  Oracle-checked:
    the FULL geocode chain (trig -> face/uv -> quadratic st -> ij ->
    Hilbert curve) is reproduced bit-exactly in DuckDB SQL by
    _cell_encode_sql() below (recursive CTE over the 30 bit levels)."""
    def enc(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        leaf = ci.cellid_from_latlng(lat, lon)
        l12 = ci.parent(leaf, 12)
        # uint64 -> int64 view: ids < 2^63 (face <= 5), lossless
        return pa.table({
            "doc_id": batch["doc_id"],
            "cell_id": pa.array(leaf.astype(np.int64), pa.int64()),
            "cell_l12": pa.array(l12.astype(np.int64), pa.int64()),
            "token": pa.array(ci.to_token(leaf), pa.string()),
        })
    return geo_points(sf_dir).map_batches(enc, batch_format="pyarrow",
                                          zero_copy_batch=True)


def geo_parent_tokens(sf_dir):
    """Ancestor cell tokens at levels 4/8/16 per point (parent() +
    toToken at multiple levels — the hierarchical tiling key family).
    Oracle-checked via the Hilbert recursive CTE + HUGEINT parent
    arithmetic + rtrim'd hex tokens."""
    def enc(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        leaf = ci.cellid_from_latlng(lat, lon)
        return pa.table({
            "doc_id": batch["doc_id"],
            "token_l4": pa.array(ci.to_token(ci.parent(leaf, 4)),
                                 pa.string()),
            "token_l8": pa.array(ci.to_token(ci.parent(leaf, 8)),
                                 pa.string()),
            "token_l16": pa.array(ci.to_token(ci.parent(leaf, 16)),
                                  pa.string()),
        })
    return geo_points(sf_dir).map_batches(enc, batch_format="pyarrow",
                                          zero_copy_batch=True)


def geo_common_ancestor(sf_dir, bucket_keys=4096):
    """Common-ancestor level between each document's leaf cell and the
    NEXT document's (doc_id + 1) leaf cell — drives
    S2CellId.getCommonAncestorLevel (s2cell_id.d:708-719) as a
    distributed key-successor self-join.

    Ray shape: rows are range-bucketed by doc_id // bucket_keys; a row
    whose doc_id opens its bucket (doc_id % bucket_keys == 0) is ALSO
    forwarded to the previous bucket (flat boundary duplication, the
    LSH-boundary pattern), so every (k, k+1) pair materializes in
    exactly one bucket — no global sort, no driver hop.  Oracle: the
    Hilbert-CTE leaf cells joined on doc_id + 1, ancestor level as the
    max level with equal HUGEINT parents (provably the xor-msb rule)."""
    def enc(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        leaf = ci.cellid_from_latlng(lat, lon).astype(np.int64)
        b = did // bucket_keys
        t = pa.table({"doc_id": pa.array(did, pa.int64()),
                      "cell_id": pa.array(leaf, pa.int64()),
                      "bucket": pa.array(b, pa.int64())})
        # doc_id 0 has no predecessor: forwarding it would create an
        # empty bucket -1 group (and a schema warning on its empty block)
        edge = (did % bucket_keys == 0) & (did > 0)
        if edge.any():
            t = pa.concat_tables([t, pa.table({
                "doc_id": pa.array(did[edge], pa.int64()),
                "cell_id": pa.array(leaf[edge], pa.int64()),
                "bucket": pa.array(b[edge] - 1, pa.int64())})])
        return t

    def pairs(g):
        import pandas as pd
        g = g.sort_values("doc_id")
        did = g["doc_id"].to_numpy()
        cid = g["cell_id"].to_numpy().astype(np.int64).view(np.uint64)
        m = did[1:] == did[:-1] + 1
        lvl = ci.common_ancestor_level(cid[:-1][m], cid[1:][m])
        return pd.DataFrame({
            "doc_id": did[:-1][m].astype(np.int64),
            "ancestor_level": np.asarray(lvl, dtype=np.int64)})

    out = geo_points(sf_dir).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("bucket").map_groups(pairs, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def geo_cell_union_ops(sf_dir):
    """S2CellUnion set algebra (normalize / unite / intersect /
    difference, s2cell_union.d:743-874) over dataset-derived unions:
    each document contributes its level-2 ancestor cell ("atom") to
    group doc_id % 4; for each pair (0,1), (2,3) the engine computes
    union / intersection / difference of the two NORMALIZED unions and
    emits (pair_id, op, token, level) per output cell.

    Ray shape: the atom extraction + dedup is distributed (vectorized
    parent arithmetic per batch, partial per-batch distinct, then a
    groupby distinct on the tiny (group, cell) table); the set algebra
    itself runs on the normalized unions — a few hundred cells, the
    small side by construction.

    ORACLE-CHECKED: cell unions built from same-level atoms are in
    bijection with their atom SETS, and the normalized form is the
    canonical bottom-up sibling fusion of that set.  The SQL therefore
    replays union/intersect/difference as set algebra on the atom sets
    (UNION / INTERSECT / EXCEPT) and re-derives the canonical form with
    pure HUGEINT ancestor arithmetic: a level-l cell is output iff all
    4^(2-l) of its atoms are present and its parent is not full.  A
    hash match proves the engine's sweep/recursion algorithms produce
    exactly the reference's canonical normalized output."""
    import pandas as pd
    from ..core import cellunion as cu

    ATOM_LEVEL = 2

    def prep(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lat = ((did * 7919) % 18000) / 100.0 - 90.0
        lon = ((did * 104729) % 36000) / 100.0 - 180.0
        leaf = ci.cellid_from_latlng(lat, lon)
        cell = ci.parent(leaf, ATOM_LEVEL).view(np.int64)
        g = (did % 4).astype(np.int64)
        order = np.lexsort((cell, g))
        gs, cs = g[order], cell[order]
        keep = np.ones(len(gs), dtype=bool)
        keep[1:] = (gs[1:] != gs[:-1]) | (cs[1:] != cs[:-1])
        return pa.table({"g": pa.array(gs[keep], pa.int64()),
                         "cell": pa.array(cs[keep], pa.int64())})

    distinct = (geo_points(sf_dir)
                .map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby(["g", "cell"]).count()
                .to_pandas())
    rows = []
    by_g = {int(g): grp["cell"].to_numpy().view(np.uint64)
            for g, grp in distinct.groupby("g")}
    for p in (0, 1):
        a = cu.normalize(by_g.get(2 * p, np.array([], dtype=np.uint64)))
        b = cu.normalize(by_g.get(2 * p + 1,
                                  np.array([], dtype=np.uint64)))
        for op, cells in (("union", cu.union(a, b)),
                          ("intersect", cu.intersect(a, b)),
                          ("difference", cu.difference(a, b))):
            if not len(cells):
                continue
            toks = ci.to_token(cells)
            lvls = ci.level(cells)
            for t, lv in zip(toks.tolist(), lvls.tolist()):
                rows.append((p, op, str(t), int(lv)))
    return pd.DataFrame(rows, columns=["pair_id", "op", "token",
                                       "level"])


def geo_knn(sf_dir, k=5):
    """Exact kNN: for 20 query points (derived from customer keys < 20),
    the k nearest document points by squared chord distance; the identical
    formula is reproduced in SQL via cos/sin/radians and ROW_NUMBER.

    Ray plan: broadcast the tiny query matrix, ONE matmul per batch for
    partial top-k, final merge on a tiny table (no corpus shuffle)."""
    import pandas as pd
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).to_pandas()
    qkeys = np.sort(cust["c_custkey"].to_numpy())
    qkeys = qkeys[qkeys < 20]
    qlat = np.deg2rad(((qkeys * 3571) % 18000) / 100.0 - 90.0)
    qlon = np.deg2rad(((qkeys * 6689) % 36000) / 100.0 - 180.0)
    qx = np.cos(qlat) * np.cos(qlon)
    qy = np.cos(qlat) * np.sin(qlon)
    qz = np.sin(qlat)
    qm = np.stack([qx, qy, qz], axis=1)

    def partial(batch: pa.Table) -> pa.Table:
        lat = np.deg2rad(batch["lat"].to_numpy(zero_copy_only=False))
        lon = np.deg2rad(batch["lon"].to_numpy(zero_copy_only=False))
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        px = np.cos(lat) * np.cos(lon)
        py = np.cos(lat) * np.sin(lon)
        pz = np.sin(lat)
        # squared chord distance, same expansion as the SQL oracle
        d2 = ((qm[:, 0:1] - px[None, :]) ** 2
              + (qm[:, 1:2] - py[None, :]) ** 2
              + (qm[:, 2:3] - pz[None, :]) ** 2)
        kk = min(k, d2.shape[1])
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        out_q, out_d, out_s = [], [], []
        for qi in range(d2.shape[0]):
            out_q.extend([int(qkeys[qi])] * kk)
            out_d.extend(did[part[qi]].tolist())
            out_s.extend(d2[qi, part[qi]].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "d2": pa.array(out_s, pa.float64())})

    parts = geo_points(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    parts.sort_values(["query_id", "d2", "doc_id"],
                      ascending=[True, True, True], inplace=True)
    top = parts.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "doc_id", "rank"]].reset_index(drop=True)


def _sj_polygons(n=40):
    """Deterministic CONVEX regular loops for the flagship join oracle:
    5 hot-cap city polygons (skewed side — they catch the 30% clustered
    pages) + 35 lattice-positioned polygons with radii 0.004-0.02 rad
    (S2 levels 10-16 coverings, the north-star tiling band).  Convexity
    makes the exact engine PIP SQL-checkable via the all-edge-hemisphere
    determinant test (same argument as _pip_polygons)."""
    from ..core.loop import Loop
    from ..core.polygon import Polygon
    from ..sources.pages import HOT_CAPS
    out = []
    for pid in range(n):
        if pid < len(HOT_CAPS):
            clat, clon = float(HOT_CAPS[pid][0]), float(HOT_CAPS[pid][1])
            radius = 0.0035 + 0.0002 * pid
        else:
            clat = float((pid * 47) % 120) - 60.0 + 0.005
            clon = float((pid * 97) % 344) - 172.0 + 0.005
            radius = 0.004 + 0.004 * (pid % 5)
        loop = Loop.make_regular(clat, clon, radius, _PIP_NVS[pid % 6])
        out.append({"polygon_id": pid, "polygon": Polygon([loop])})
    return out


def geo_spatial_join(sf_dir):
    """The flagship S2 spatial join — REAL pages source (splitmix64
    generator -> "%.6f" coordinate text -> regex parse), REAL machinery
    (RegionCoverer coverings -> broadcast multi-level cell index ->
    searchsorted candidates -> interior short-circuit -> shape-index
    exact PIP, pipelines/spatial_join.py) — over deterministic convex
    polygons.  ORACLE-CHECKED end to end: _spatial_join_sql() replays
    the page generator bit-for-bit in DuckDB (splitmix64 via HUGEINT
    mod-2^64 arithmetic, the uniform/hot-cap mixture, np.rint
    half-to-even micro-degree formatting, and the strtod parse as
    micro/1e6) and decides containment with the convex hemisphere
    determinant over edge-normal literals.  Min |margin| over all
    (point, polygon) pairs is 1.7e-7 at 50k pages — eleven orders above
    the double noise floor (verified in tests/test_spatial_join.py)."""
    from ..sources.pages import pages_dataset
    from .spatial_join import spatial_join
    n_docs = _docs(sf_dir).count()
    pages = pages_dataset(max(2000, 10 * n_docs))
    polys = _sj_polygons()
    joined = spatial_join(pages, polys)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["contained"])
        return pa.table({"url": batch["url"],
                         "polygon_id": batch["polygon_id"]})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


_PIP_NVS = (8, 12, 16, 24, 32, 48)


def _pip_polygons(n=24):
    """Deterministic CONVEX regular loops (no RNG) so the exact-PIP join
    is SQL-checkable: a point is inside a convex loop smaller than a
    hemisphere iff it lies in every edge's interior hemisphere, i.e.
    min over edges of (v_i x v_{i+1}) . p > 0 — mathematically equal to
    the engine's crossing-parity PIP (s2loop.d:1382-1433 semantics)."""
    from ..core.loop import Loop
    from ..core.polygon import Polygon
    out = []
    for pid in range(n):
        clat = float((pid * 47) % 120) - 60.0 + 0.005
        clon = float((pid * 97) % 344) - 172.0 + 0.005
        radius = 0.05 + 0.025 * (pid % 5)
        loop = Loop.make_regular(clat, clon, radius, _PIP_NVS[pid % 6])
        out.append({"polygon_id": pid, "polygon": Polygon([loop])})
    return out


def _edges_values(polys):
    """(polygon_id, nx, ny, nz) VALUES literals: the edge-normal vectors
    v_i x v_{i+1} of each (convex, single-loop) polygon, full-precision
    repr (17 significant digits round-trips float64 exactly)."""
    rows = []
    for rec in polys:
        v = rec["polygon"].loops[0].vertices
        nrm = np.cross(v, np.roll(v, -1, axis=0))
        for k in range(len(v)):
            rows.append("(%d,%s,%s,%s)" % (rec["polygon_id"],
                        repr(nrm[k, 0]), repr(nrm[k, 1]), repr(nrm[k, 2])))
    return ",".join(rows)


def _pip_edges_values():
    return _edges_values(_pip_polygons())


def geo_pip_join(sf_dir):
    """Exact point-in-polygon join through the REAL flagship machinery —
    RegionCoverer coverings -> multi-level cell index (broadcast once via
    ray.put) -> per-level searchsorted candidate lookup -> shape-index
    exact PIP refinement (stages/join.py) — over the deterministic doc
    points and convex regular loops.  ORACLE-CHECKED: the SQL replays the
    identical trig chain for the points (proven bit-exact in geo_knn) and
    decides containment by the all-edge-hemisphere determinant test with
    the loop edge normals embedded as float64 literals.  Agreement is
    exact: both sides consume bit-identical point vectors and the minimum
    |normal . p| margin over this data is ~1e-6 (verified in tests), nine
    orders above the 1e-16 arithmetic noise floor."""
    import ray

    from ..stages.geocode import encode_cells
    from ..stages.join import build_polygon_index, make_join_refine_fn

    polys = _pip_polygons()
    from ..state.broadcast import broadcast
    index = build_polygon_index(polys, min_level=2, max_level=12)
    ref = broadcast(index)
    levels = tuple(range(2, 13))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "url", pc.cast(batch["doc_id"], pa.string()))
        return encode_cells(batch, levels=levels, with_token=False)

    refine = make_join_refine_fn(ref)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["contained"])
        return pa.table({
            "doc_id": pc.cast(batch["url"], pa.int64()),
            "polygon_id": batch["polygon_id"],
        })

    return (geo_points(sf_dir)
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(refine, batch_format="pyarrow")
            .map_batches(finish, batch_format="pyarrow"))


def geo_complement(sf_dir):
    """initializeToComplement (s2polygon.d:1069-1135) driven end to end:
    the complements of 8 convex fixture polygons (largest depth-0 loop
    inverted, core/polygon_ops.py:310) are classified against the doc
    point stream through the SAME broadcast multi-level covering index
    + shape-index exact PIP machinery as geo_pip_join.  Near-full-
    sphere regions are the adversarial case for that machinery: the
    exterior covering spans every face and the interior covering
    short-circuits almost every candidate, so this query exercises
    inverted-loop coverings, inverted-loop parity PIP (origin-inside
    bookkeeping), and the interior fast path at once.

    ORACLE-CHECKED: a fixture point lies in ~A iff it lies OUTSIDE the
    convex loop A, i.e. min over edges of (v_i x v_{i+1}) . p < 0 —
    the exact negation of geo_pip_join's SQL (same edge-normal
    literals, flipped inequality; min |margin| ~1e-6 over this data,
    ten orders above float noise, so the sign is unambiguous)."""
    import ray

    from ..core.polygon_ops import initialize_to_complement
    from ..stages.geocode import encode_cells
    from ..stages.join import build_polygon_index, make_join_refine_fn

    comps = [{"polygon_id": rec["polygon_id"],
              "polygon": initialize_to_complement(rec["polygon"])}
             for rec in _pip_polygons(8)]
    from ..state.broadcast import broadcast
    index = build_polygon_index(comps, min_level=2, max_level=12)
    ref = broadcast(index)
    levels = tuple(range(2, 13))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "url", pc.cast(batch["doc_id"], pa.string()))
        return encode_cells(batch, levels=levels, with_token=False)

    refine = make_join_refine_fn(ref)

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch["contained"])
        return pa.table({
            "doc_id": pc.cast(batch["url"], pa.int64()),
            "polygon_id": batch["polygon_id"],
        })

    return (geo_points(sf_dir)
            .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(refine, batch_format="pyarrow")
            .map_batches(finish, batch_format="pyarrow"))


def geo_mutable_pip(sf_dir):
    """The incremental MutableShapeIndexSet contract
    (mutable_s2shape_index.d:404-466 queued updates, :856-906 batched
    lazy apply) driven through a dataset query: 16 polygons are added
    and applied, then a mutation script runs (remove every 4th shape,
    add 4 new ones) and the doc stream is classified against the
    CURRENT set.  The post-mutation adds ship to the workers still
    QUEUED — each worker's first batch triggers the batched apply, so
    the lazy-apply path itself runs inside the map workers, and
    pre-existing sub-indexes are reused untouched (asserted in
    tests/test_mutable_index.py).

    ORACLE-CHECKED: the surviving shape set is known analytically, so
    the SQL is the convex hemisphere membership test of geo_pip_join
    over exactly those polygons' edge-normal literals; agreement proves
    the mutation bookkeeping (remove-before-apply, id assignment,
    sub-index reuse) changes nothing about containment semantics."""
    import ray

    from ..core.mutable_index import MutableShapeIndexSet

    polys = _pip_polygons(20)
    mset = MutableShapeIndexSet()
    sids = [mset.add(rec["polygon"]) for rec in polys[:16]]
    # Force one batched apply so the later mutations exercise the
    # incremental path (existing sub-indexes must survive them).
    mset.contains_points_any(np.array([[1.0, 0.0, 0.0]]))
    for sid in sids[1::4]:
        mset.remove(sid)
    for rec in polys[16:]:
        mset.add(rec["polygon"])
    from ..state.broadcast import broadcast, fetch
    ref = broadcast(mset)  # adds still pending: workers run the lazy apply

    class MutablePip:
        def __init__(self, mset_ref):
            self.mset = fetch(mset_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..core import coords
            did = batch["doc_id"].to_numpy(zero_copy_only=False)
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            lon = batch["lon"].to_numpy(zero_copy_only=False)
            x, y, z = coords.latlng_to_xyz(lat, lon)
            # Flat (point_idx, shape_id) pairs — no per-point loop
            # (the stages/join.py counts+repeat flatten).
            pt, sid = self.mset.containing_pairs(np.stack([x, y, z], 1))
            return pa.table({
                "doc_id": pa.array(did[pt].astype(np.int64), pa.int64()),
                "shape_id": pa.array(sid, pa.int64()),
            })

    from ..stages.stateful import stateful_map_batches
    return stateful_map_batches(
        geo_points(sf_dir), MutablePip, (ref,),
        batch_format="pyarrow", num_cpus=1)


def geo_covering_tokens(sf_dir, n_regions=32, run_len=40,
                        atom_level=14, cover_level=12):
    """getSimpleCovering flood fill (s2region_coverer.d:315-346) as a
    Dataset pipeline, ORACLE-CHECKED end to end.

    Region r (one per document r < n_regions) is the Hilbert-contiguous
    run of `run_len` level-14 cells starting at the level-14 ancestor
    of doc r's point — an S2CellUnion region (core/cellunion.py
    CellUnionRegion), whose mayIntersect(S2Cell) is the EXACT range-
    overlap test with zero conservative slack.  Two facts make the
    flood fill SQL-replayable: (1) consecutive same-level cells on the
    S2 Hilbert curve are edge-adjacent (verified across all five face
    transitions), so the run — and hence the set of its level-12
    ancestors — is edge-connected and the fill must return EXACTLY the
    distinct ancestors; (2) ancestor ids are pure HUGEINT arithmetic
    over the geo_cell_encode leaf CTE.  Any traversal bug (missed
    neighbor, bad wrap, broken dedup) under- or over-produces rows and
    breaks the hash.  getCovering's heap-ordered refinement remains
    rows-only by necessity and is pinned by pytest determinism/
    containment/canonicalization invariants (tests/test_coverer*.py)."""
    from ..core import coords
    from ..core.cellunion import CellUnionRegion
    from ..core.coverer import get_simple_covering

    two_mk = 2 << (2 * (30 - atom_level))
    end_id = 6 << 61

    def covers(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        leaf = ci.cellid_from_latlng(lat, lon)
        start = ci.parent(np.atleast_1d(leaf), atom_level)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        out_d, out_t = [], []
        # Per-REGION loop (regions are the dimension side; the point
        # table never enters this query).
        for r in range(len(did)):
            s0 = int(start[r])
            cells = [s0 + two_mk * t for t in range(run_len)]
            region = CellUnionRegion(
                np.array([c for c in cells if c < end_id], np.uint64))
            cov = get_simple_covering(
                region, (x[r], y[r], z[r]), cover_level)
            toks = ci.to_token(np.asarray(cov, dtype=np.uint64))
            out_d.extend([int(did[r])] * len(toks))
            out_t.extend(str(t) for t in toks)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "token": pa.array(out_t, pa.string())})

    seeds = geo_points(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], n_regions)),
        batch_format="pyarrow", zero_copy_batch=True)
    return seeds.map_batches(covers, batch_format="pyarrow")


def s2_knn(sf_dir, k=5):
    """The same kNN result as geo_knn but computed through the
    PARTITIONED S2 index path (SURVEY.md §3.4): the corpus stays a
    Dataset, each block builds its own PointIndex inside the task and
    answers the broadcast queries with the cell-pruned best-first
    search, and a groupby(query_id) merge reduces the tiny
    (queries x k x blocks) partial table — no driver materialization of
    the index side.  Shares geo_knn's SQL oracle, proving the indexed,
    partitioned path matches the brute/SQL definition exactly."""
    import ray.data as rd

    from ..stages.knn import knn_partitioned

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).to_pandas()
    qk = np.sort(cust["c_custkey"].to_numpy())
    qk = qk[qk < 20]
    corpus = geo_points(sf_dir).repartition(4)
    out = knn_partitioned(
        corpus, qk,
        ((qk * 3571) % 18000) / 100.0 - 90.0,
        ((qk * 6689) % 36000) / 100.0 - 180.0, k=k).to_pandas()
    out = out.rename(columns={"neighbor_id": "doc_id"})
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return out[["query_id", "doc_id", "rank"]]


def geo_polyline_ops(sf_dir):
    """Polyline length/interpolate over nation-derived 3-vertex chains.
    Oracle-checked: edge arc-angles, the half-length edge pick, and the
    tangent-frame slerp of interpolate_at_distance (core/edge.py:82) are
    replayed as IEEE-identical SQL in _polyline_ops_sql()."""
    import pandas as pd
    import ray.data as rd
    from ..core.polyline import Polyline
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    rows = []
    for key in nat["n_nationkey"].tolist():
        lat0 = (key * 37) % 120 - 60.0
        lon0 = (key * 73) % 300 - 150.0
        lats = [lat0, lat0 + 1.0, lat0 + 1.0]
        lons = [lon0, lon0, lon0 + 1.0]
        pl = Polyline.from_latlng_degrees(lats, lons)
        mid = pl.interpolate(0.5)
        from . import geo_queries  # noqa: F401  (self-import guard)
        from ..core import coords
        mlat, mlon = coords.xyz_to_latlng(*mid)
        rows.append((key, round(pl.get_length(), 12),
                     round(float(mlat), 9), round(float(mlon), 9)))
    return pd.DataFrame(rows, columns=["n_nationkey", "length_rad",
                                       "mid_lat", "mid_lon"])


def _union_fixtures(keys):
    """Per-nation pairs of overlapping convex 48-gon discs (A at the
    nation lattice point, B shifted +4 deg lon).  Radii 0.10-0.13 rad so
    each union catches a meaningful slice of the doc-point grid."""
    from ..core.loop import Loop
    from ..core.polygon import Polygon
    out = {}
    for key in keys:
        la = (key * 37) % 110 - 55.0
        lo = (key * 73) % 300 - 150.0
        ra = 0.10 + 0.01 * (key % 4)
        a = Polygon([Loop.make_regular(la, lo, ra, 48)])
        b = Polygon([Loop.make_regular(la, lo + 4.0, 0.12, 48)])
        out[int(key)] = (a, b)
    return out


def _nation_keys(sf_dir):
    import ray.data as rd
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    return sorted(int(k) for k in nat["n_nationkey"].tolist())


def geo_boolean_union(sf_dir):
    """Pointwise proof of the boolean-union CONSTRUCTION: per nation the
    union boundary polygon is built by core/polygon_ops.boolean_union
    (the S2Builder-lite path: exact edge intersections + ring assembly),
    then every doc point is classified against the CONSTRUCTED polygon
    with the exact crossing-parity PIP.  ORACLE-CHECKED: the SQL decides
    `in_A OR in_B` via the convex hemisphere determinants of the two
    input discs — agreement over every (point, nation) pair proves the
    constructed boundary partitions the sphere exactly like the set
    union of its inputs (min |edge margin| 1.3e-6, six orders above
    noise; verified in tests/test_polygon_operations.py)."""
    import ray

    from ..core import coords
    from ..core.polygon_ops import boolean_union
    keys = _nation_keys(sf_dir)
    fx = _union_fixtures(keys)
    unions = {k: boolean_union(a, b) for k, (a, b) in fx.items()}
    from ..state.broadcast import broadcast, fetch
    ref = broadcast(unions)

    class Classify:
        def __init__(self, unions_ref):
            self.unions = fetch(unions_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            lon = batch["lon"].to_numpy(zero_copy_only=False)
            did = batch["doc_id"].to_numpy(zero_copy_only=False)
            x, y, z = coords.latlng_to_xyz(lat, lon)
            pts = np.stack([x, y, z], axis=1)
            out_k, out_d = [], []
            for k, u in self.unions.items():
                ins = u.contains_points(pts)
                hit = np.nonzero(ins)[0]
                out_k.append(np.full(len(hit), k, dtype=np.int64))
                out_d.append(did[hit])
            return pa.table({
                "n_nationkey": pa.array(np.concatenate(out_k), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            })

    from ..stages.stateful import stateful_map_batches
    return stateful_map_batches(
        geo_points(sf_dir), Classify, (ref,),
        batch_format="pyarrow", zero_copy_batch=True)


def geo_union_boundary(sf_dir):
    """The constructed union boundaries themselves: one row per ring
    vertex per nation, as micro-degree integers.  ORACLE-CHECKED by
    decision-chain replay: the SQL predicts the vertex multiset from the
    input-disc vertex literals alone — A-vertices outside B (hemisphere
    test), B-vertices outside A, plus normalize(cross(nA, nB)) for every
    strictly-crossing edge pair — and rounds identically (micro-tie
    distance >= 2.7e-5 micro-units over the 25 fixtures vs ~1e-7 formula
    tolerance, so both sides round the same way)."""
    import pandas as pd
    from ..core import coords
    from ..core.polygon_ops import boolean_union
    keys = _nation_keys(sf_dir)
    fx = _union_fixtures(keys)
    rows = []
    for k, (a, b) in fx.items():
        u = boolean_union(a, b)
        for lp in u.loops:
            la, lo = coords.xyz_to_latlng(lp.vertices[:, 0],
                                          lp.vertices[:, 1],
                                          lp.vertices[:, 2])
            lat_e6 = np.rint(np.asarray(la) * 1e6).astype(np.int64)
            lon_e6 = np.rint(np.asarray(lo) * 1e6).astype(np.int64)
            for vi in range(len(lat_e6)):
                rows.append((k, int(lat_e6[vi]), int(lon_e6[vi])))
    return pd.DataFrame(rows, columns=["n_nationkey", "lat_e6", "lon_e6"])


def geo_snap_e6(sf_dir):
    """IntLatLngSnapFunction at E6: fixed-point micro-degree snapping,
    exactly reproducible in SQL (ROUND is half-away on both sides)."""
    def kernel(batch: pa.Table) -> pa.Table:
        from ..core.coords import lround
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "lat_e6": pa.array(lround(lat * 1e6).astype(np.int64),
                               pa.int64()),
            "lon_e6": pa.array(lround(lon * 1e6).astype(np.int64),
                               pa.int64()),
        })
    return geo_points(sf_dir).map_batches(kernel, batch_format="pyarrow",
                                          zero_copy_batch=True)


def geo_simplify(sf_dir):
    """Polyline simplification counts per nation chain.  ORACLE-CHECKED:
    _simplify_sql() replays the whole Douglas-Peucker recursion in
    DuckDB — the bit-exact edge_distances2 chain for every (lo, k, hi)
    triple plus a recursive CTE over the split intervals with an
    anti-join argmax — so n_kept is derived independently from the
    vertex literals."""
    import pandas as pd
    import ray.data as rd
    from ..core import coords
    from ..core.snap import simplify_polyline
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    rows = []
    for key in nat["n_nationkey"].tolist():
        lat0 = (key * 37) % 120 - 60.0
        lon0 = (key * 73) % 300 - 150.0
        t = np.linspace(0, 1, 64)
        lat = lat0 + 2.0 * t + 0.05 * np.sin(8 * np.pi * t)
        lon = lon0 + 2.0 * t
        x, y, z = coords.latlng_to_xyz(lat, lon)
        v = np.stack([x, y, z], axis=1)
        kept = simplify_polyline(v, 1e-4)
        rows.append((key, 64, len(kept)))
    return pd.DataFrame(rows, columns=["n_nationkey", "n_in", "n_kept"])


_SIMP_TILES_CACHE: dict = {}


def _simplify_in_cell_tiles(keys):
    """Build the per-nation simplified-in-cell tile set (the dimension
    side): disc k (= _union_fixtures disc A, a convex 48-gon) is
    covered, clipped to each covering cell, and simplified in-cell at
    tol = 0.05 * MAX_DIAG(cell level).  Returns per-nation tiles with
    the UNIT edge normals of the disc and of each cell, plus
    sin(1.5*tol) guard literals — everything both the engine classifier
    and the SQL oracle reason from."""
    from ..core.cell import Cell
    from ..core.coverer import RegionCoverer
    from ..core.loop import Loop
    from ..core.metrics import MAX_DIAG
    from ..core.polygon import Polygon
    from ..core.polygon_ops import (boolean_intersection,
                                    initialize_to_simplified_in_cell)
    import math
    keys = [int(k) for k in keys]
    cached = _SIMP_TILES_CACHE.get(tuple(keys))
    if cached is not None:
        return cached  # the build runs the full clip+simplify pipeline
    rc = RegionCoverer(max_cells=16, min_level=4, max_level=8)
    fixtures = _union_fixtures(keys)
    out = {}
    for k in keys:
        disc = fixtures[k][0]
        v = disc.loops[0].vertices
        dn = np.cross(v, np.roll(v, -1, axis=0))
        dn = dn / np.linalg.norm(dn, axis=1, keepdims=True)
        tiles = []
        for c in rc.get_covering(disc).tolist():
            cell = Cell(int(c))
            cv = np.stack([np.asarray(cell.vertex(q)) for q in range(4)])
            cn = np.cross(cv, np.roll(cv, -1, axis=0))
            cn = cn / np.linalg.norm(cn, axis=1, keepdims=True)
            cellpoly = Polygon([Loop(cv)])
            clipped = boolean_intersection(disc, cellpoly)
            if clipped is None:
                continue
            tol = 0.05 * MAX_DIAG.get_value(cell.level)
            simp = initialize_to_simplified_in_cell(clipped, cell, tol)
            tiles.append({
                "cell_id": int(c),
                "token": str(ci.to_token(np.uint64([c]))[0]),
                "cmin": int(ci.range_min(np.uint64(c))),
                "cmax": int(ci.range_max(np.uint64(c))),
                "cell_normals": cn,
                "sin_guard": math.sin(1.5 * tol),
                "simp": simp,
            })
        out[int(k)] = {"disc_normals": dn, "tiles": tiles}
    _SIMP_TILES_CACHE[tuple(keys)] = out
    return out


def geo_simplify_in_cell(sf_dir):
    """Tiled per-cell simplification (s2polygon.d:960-992 use-case:
    "geometry-processing pipelines that intersect polygons with a
    collection of S2Cells and then process those cells in parallel"):
    cover each fixture disc, clip it to every covering cell, simplify
    each tile with initialize_to_simplified_in_cell (cell-boundary
    vertices pinned), then classify the doc-point stream against the
    CONSTRUCTED tiles with the exact crossing-parity PIP.

    ORACLE-CHECKED pointwise (the geo_boolean_union margin-guard
    precedent): simplification moves the clipped boundary by at most
    tol, and the clipped boundary is a subset of (disc boundary) union
    (cell boundary) — so for any point farther than 1.5*tol from BOTH
    (the guard), membership in the simplified tile must equal the
    ANALYTIC membership in disc-intersect-cell, which SQL decides from
    literals alone: leaf cid within the cell's [range_min, range_max]
    (pure HUGEINT; bit-identical via the geo_cell_encode CTE) and
    hemisphere determinants of the disc's 48 unit edge normals.  The
    guard is the same min|dot| > sin(1.5*tol) expression on both sides
    (distance-to-great-circle underestimates distance-to-boundary for
    convex regions, so exclusion is conservative), with identical
    normal/sin literals shipped to SQL.  Any simplification bug that
    moves the boundary past tol, drops a tile, or breaks PIP parity
    flips a guarded row and breaks the hash.  The n_in/n_out vertex
    decision chain itself stays pinned by the ported reference tests
    (tests/test_polygon_operations.py)."""
    from ..core import coords
    from ..state.broadcast import broadcast, fetch

    keys = _nation_keys(sf_dir)
    ref = broadcast(_simplify_in_cell_tiles(keys))

    class ClassifyTiles:
        def __init__(self, tiles_ref):
            self.nations = fetch(tiles_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            did = batch["doc_id"].to_numpy(zero_copy_only=False)
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            lon = batch["lon"].to_numpy(zero_copy_only=False)
            x, y, z = coords.latlng_to_xyz(lat, lon)
            pts = np.stack([x, y, z], axis=1)
            leaf = ci.cellid_from_latlng(lat, lon)
            out_k, out_d, out_t = [], [], []
            for k, rec in self.nations.items():
                dn = rec["disc_normals"]
                for tile in rec["tiles"]:
                    sel = np.nonzero(
                        (leaf >= np.uint64(tile["cmin"]))
                        & (leaf <= np.uint64(tile["cmax"])))[0]
                    if not len(sel):
                        continue
                    px, py, pz = x[sel], y[sel], z[sel]
                    # Same 3-term dot association as the SQL replay.
                    cn = tile["cell_normals"]
                    cd = np.stack([cn[q, 0] * px + cn[q, 1] * py
                                   + cn[q, 2] * pz for q in range(4)])
                    dd = np.stack([dn[q, 0] * px + dn[q, 1] * py
                                   + dn[q, 2] * pz
                                   for q in range(len(dn))])
                    g = tile["sin_guard"]
                    guard = (np.min(np.abs(cd), axis=0) > g) \
                        & (np.min(np.abs(dd), axis=0) > g)
                    if not guard.any():
                        continue
                    cand = sel[guard]
                    simp = tile["simp"]
                    if simp is None:
                        continue
                    ins = simp.contains_points(pts[cand])
                    hit = cand[ins]
                    out_k.append(np.full(len(hit), int(k), np.int64))
                    out_d.append(did[hit].astype(np.int64))
                    out_t.extend([tile["token"]] * len(hit))
            if not out_k:
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "token": pa.array([], pa.string())})
            return pa.table({
                "n_nationkey": pa.array(np.concatenate(out_k), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "token": pa.array(out_t, pa.string()),
            })

    from ..stages.stateful import stateful_map_batches
    return stateful_map_batches(
        geo_points(sf_dir), ClassifyTiles, (ref,),
        batch_format="pyarrow", zero_copy_batch=True, num_cpus=1)


def geo_radius_join(sf_dir, radius_km=800.0):
    """Radius query: all (query, point) pairs within radius_km, squared
    chord distance, exactly reproduced in SQL (the distance-join /
    S2ClosestEdgeQuery-with-max-distance capability)."""
    import ray.data as rd
    earth_km = 6371.01
    rad = radius_km / earth_km
    import math
    limit2 = min(4.0, 4.0 * math.sin(0.5 * rad) ** 2)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).to_pandas()
    qkeys = np.sort(cust["c_custkey"].to_numpy())
    qkeys = qkeys[qkeys < 20]
    qlat = np.deg2rad(((qkeys * 3571) % 18000) / 100.0 - 90.0)
    qlon = np.deg2rad(((qkeys * 6689) % 36000) / 100.0 - 180.0)
    qm = np.stack([np.cos(qlat) * np.cos(qlon),
                   np.cos(qlat) * np.sin(qlon), np.sin(qlat)], axis=1)

    def within(batch: pa.Table) -> pa.Table:
        lat = np.deg2rad(batch["lat"].to_numpy(zero_copy_only=False))
        lon = np.deg2rad(batch["lon"].to_numpy(zero_copy_only=False))
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        px = np.cos(lat) * np.cos(lon)
        py = np.cos(lat) * np.sin(lon)
        pz = np.sin(lat)
        d2 = ((qm[:, 0:1] - px[None, :]) ** 2
              + (qm[:, 1:2] - py[None, :]) ** 2
              + (qm[:, 2:3] - pz[None, :]) ** 2)
        qi, pi = np.nonzero(d2 <= limit2)
        return pa.table({
            "query_id": pa.array(qkeys[qi], pa.int64()),
            "doc_id": pa.array(did[pi], pa.int64()),
        })

    return geo_points(sf_dir).map_batches(within, batch_format="pyarrow",
                                          zero_copy_batch=True)


def geo_boolean_mixed(sf_dir):
    """Mixed-dimension S2BooleanOperation over nation-derived fixtures:
    per nation a square polygon, a polyline that coincides with one of
    its boundary edges (forward for even keys, reversed for odd), one
    interior point and one exterior point, evaluated under the polygon
    model selected by key % 3.  Emits the INTERSECTION / UNION
    non-degenerate dim-1 edge counts, the kept point count, and the kept
    intersection arc length — all of which follow the reference's
    shared-edge model rules (core/boolean_operation.py, validated
    against the full s2boolean_operation_test port), replayed as CASE
    logic + the atan2 arc-length chain in SQL."""
    import math

    import pandas as pd
    import ray.data as rd
    from ..core import coords
    from ..core.boolean_operation import (BooleanOptions, CLOSED,
                                          INTERSECTION, OPEN, SEMI_OPEN,
                                          UNION, boolean_operation_edges)
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    models = [OPEN, SEMI_OPEN, CLOSED]

    def pt(lat, lon):
        x, y, z = coords.latlng_to_xyz(float(lat), float(lon))
        return (float(x), float(y), float(z))

    rows = []
    for key in nat["n_nationkey"].tolist():
        la = (key * 37) % 116 - 58.0
        lo = (key * 73) % 296 - 148.0
        v0, v1, v2, v3 = (pt(la, lo), pt(la, lo + 2),
                          pt(la + 2, lo + 2), pt(la + 2, lo))
        line = [v0, v1] if key % 2 == 0 else [v1, v0]
        a = {"points": [pt(la + 1.0, lo + 1.0), pt(la - 1.0, lo - 1.0)],
             "polylines": [line], "polygons": []}
        b = {"points": [], "polylines": [],
             "polygons": [[[v0, v1, v2, v3]]]}
        options = BooleanOptions(polygon_model=models[key % 3])
        inter = boolean_operation_edges(INTERSECTION, a, b, options)
        union = boolean_operation_edges(UNION, a, b, options)

        def real_edges(edges):
            return [(p, q) for (p, q) in edges if p != q]

        arc = 0.0
        for p, q in real_edges(inter[1]):
            import numpy as np
            pq = np.cross(p, q)
            arc += math.atan2(float(np.linalg.norm(pq)),
                              float(np.dot(p, q)))
        rows.append((key, len(inter[0]), len(real_edges(inter[1])),
                     len(real_edges(union[1])), len(union[2]),
                     round(arc, 12)))
    return pd.DataFrame(rows, columns=[
        "n_nationkey", "n_inter_points", "n_inter_line_edges",
        "n_union_line_edges", "n_union_poly_edges", "inter_len_rad"])


def geo_nested_depths(sf_dir):
    """Polygon.init_nested over per-nation loop arrangements: 2 + key%3
    concentric squares around a nation-derived center plus one disjoint
    square, fed to the nesting-tree builder in largest-first order.
    Emits the loop count, the preorder depth sequence, and depth
    aggregates — all pure functions of key%3 once the nesting tree is
    correct (the SQL oracle replays them as CASE arithmetic)."""
    import pandas as pd
    import ray.data as rd
    from ..core.loop import Loop
    from ..core.polygon import Polygon
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    rows = []
    for key in nat["n_nationkey"].tolist():
        la = (key * 37) % 100 - 50.0
        lo = (key * 73) % 280 - 140.0
        k = 2 + key % 3

        def square(clat, clon, half):
            lats = [clat - half, clat - half, clat + half, clat + half]
            lons = [clon - half, clon + half, clon + half, clon - half]
            return Loop.from_latlng_degrees(lats, lons)

        loops = [square(la, lo, 4.0 - i) for i in range(k)]
        loops.append(square(la + 20.0, lo + 20.0, 1.0))
        poly = Polygon.init_nested(loops)
        depths = [lp.depth for lp in poly.loops]
        rows.append((key, len(depths), ",".join(str(d) for d in depths),
                     sum(depths), max(depths)))
    return pd.DataFrame(rows, columns=["n_nationkey", "n_loops",
                                       "depth_seq", "sum_depth",
                                       "max_depth"])


def geo_edge_distance(sf_dir):
    """Point-to-geodesic-edge squared chord distances through the exact
    edge_distances2 kernel (core/edge.py:18-48): per nation one edge
    A=(la,lo)->B=(la+3,lo+4) and three probe points chosen to hit the
    interior case, the vertex-A case, and the vertex-B case.  The SQL
    oracle replays the whole chain — stable cross product
    (b+a)x(b-a), planar-acuteness prefilter, wedge sign tests, and
    XQ^2 + QR^2 — double for double."""
    import pandas as pd
    import ray.data as rd
    from ..core import coords
    from ..core.edge import edge_distances2
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()

    def pt(lat, lon):
        x, y, z = coords.latlng_to_xyz(float(lat), float(lon))
        return np.array([float(x), float(y), float(z)])

    rows = []
    for key in nat["n_nationkey"].tolist():
        la = (key * 37) % 100 - 50.0
        lo = (key * 73) % 280 - 140.0
        a = pt(la, lo)
        b = pt(la + 3.0, lo + 4.0)
        probes = [(0, pt(la + 2.0, lo + 2.0)),    # interior case
                  (1, pt(la - 2.0, lo - 2.0)),    # vertex-A case
                  (2, pt(la + 5.0, lo + 6.0))]    # vertex-B case
        for pid, x in probes:
            d2 = float(edge_distances2(x[None, :], a[None, :],
                                       b[None, :])[0, 0])
            rows.append((key, pid, round(d2, 12)))
    return pd.DataFrame(rows, columns=["n_nationkey", "probe_id", "d2"])


def _nation_chains(keys):
    """Deterministic 8-vertex zig-zag chain per nation key (7 edges):
    vlat_j = base_lat + 0.55*j + (1.5 if j odd), vlon_j = base_lon +
    1.1*j — every float op replayed verbatim in the SQL oracles.
    Returns (A, B, nation, edge_j) parallel edge arrays."""
    from ..core import coords
    keys = np.asarray(keys, dtype=np.int64)
    j = np.arange(8, dtype=np.float64)
    la = ((keys * 37) % 100 - 50.0)[:, None]
    lo = ((keys * 73) % 280 - 140.0)[:, None]
    vlat = la + 0.55 * j[None, :] + np.where(j[None, :] % 2 == 1,
                                             1.5, 0.0)
    vlon = lo + 1.1 * j[None, :]
    x, y, z = coords.latlng_to_xyz(vlat.ravel(), vlon.ravel())
    v = np.stack([x, y, z], axis=1).reshape(len(keys), 8, 3)
    nation = np.repeat(keys, 7)
    edge_j = np.tile(np.arange(7, dtype=np.int64), len(keys))
    return (v[:, :-1, :].reshape(-1, 3), v[:, 1:, :].reshape(-1, 3),
            nation, edge_j)


def geo_closest_edge(sf_dir):
    """S2ClosestEdgeQuery at dataset scale: squared chord distance from
    every document point to the nearest edge of a 175-edge zig-zag
    polyline collection (25 nation chains x 7 edges — above the
    brute-force cutoff, so every probe runs the INDEXED best-first
    search over the EdgeVectorIndex bucket tree,
    s2closest_edge_query_base.d:380-750 semantics via
    core/shapeindex.py closest_edge_batch).

    Ray shape: edges broadcast once via ray.put; each map worker builds
    its index once in __init__ (stages/stateful.py); batches answered
    with the vectorized candidate + warm-started traversal
    (stages/closest_edge.py).

    ORACLE-CHECKED: the SQL replays the full edge_distances2 chain
    (stable (b+a)x(b-a) cross product, acuteness prefilter, wedge
    signs, XQ^2 + QR^2) per (doc, edge) and takes MIN over edges —
    brute force in SQL vs best-first pruning in the engine, so the
    hash match proves the index prunes nothing it shouldn't.  Only d2
    is emitted (not the argmin edge id): chain edges share vertices,
    so vertex-case probes produce EXACT float ties between adjacent
    edges and any id output would be tie-order-dependent."""
    from ..stages.closest_edge import (ClosestEdgeDistance,
                                       broadcast_edges)
    import ray.data as rd
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    A, B, _nation, _ej = _nation_chains(nat["n_nationkey"].to_numpy())
    ref = broadcast_edges(A, B)
    from ..stages.stateful import stateful_map_batches
    return stateful_map_batches(
        geo_points(sf_dir), ClosestEdgeDistance, (ref,),
        batch_format="pyarrow", num_cpus=1)


def geo_furthest_edge(sf_dir):
    """S2FurthestEdgeQuery at dataset scale (s2furthest_edge_query.d;
    MaxDistance targets s2max_distance_targets.d): squared chord
    distance from every document point to the FARTHEST point of the
    same 175-edge chain collection as geo_closest_edge.  The engine
    computes it through the exact antipode identity |p-x|^2 =
    4 - |-p-x|^2 (stages/closest_edge.py furthest=True), so the
    indexed closest-edge machinery answers max-distance queries with
    antipodal query points — a bucket-access pattern the closest query
    never produces.

    ORACLE-CHECKED: the SQL evaluates the identical edge_distances2
    chain at the negated point coordinates (sign flips are exact) and
    emits 4 - MIN — bit-identical by construction, and the hash match
    proves the index also never over-prunes under the antipodal
    distribution."""
    from ..stages.closest_edge import (ClosestEdgeDistance,
                                       broadcast_edges)
    import ray.data as rd
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    A, B, _nation, _ej = _nation_chains(nat["n_nationkey"].to_numpy())
    ref = broadcast_edges(A, B)
    from ..stages.stateful import stateful_map_batches
    return stateful_map_batches(
        geo_points(sf_dir), ClosestEdgeDistance,
        ckwargs={"edges_ref": ref, "furthest": True},
        batch_format="pyarrow", num_cpus=1)


def geo_crossing_pairs(sf_dir):
    """S2CrossingEdgeQuery as a join: every (customer segment, chain
    edge) pair that PROPERLY crosses (CrossingType INTERIOR,
    s2crossing_edge_query.d:243-263; exact predicate chain
    s2edge_crosser.d:197-325).  The chain side is the same 175-edge
    nation fixture as geo_closest_edge; the query side is one segment
    per customer (broadcast index, Dataset stream of queries —
    stages/crossing_join.py).

    ORACLE-CHECKED: proper crossing is pure sign algebra — with
    p=(AxB).C, q=(AxB).D, r=(CxD).B, t=(CxD).A the reference condition
    acb==bda==cbd==dac reduces to p*q < 0 AND r*t < 0 AND q*t > 0 —
    replayed per pair in SQL with float determinants.  The engine runs
    the exact triage->expensive chain; fixtures are verified to sit
    far from every sign boundary (min |det| >= 4.4e-9 over all 2.6M
    (segment, edge) pairs at sf0.1 — about 10^6 x the ~1e-15 float
    triple-product error bound), so float and exact signs provably
    agree."""
    import ray.data as rd
    from ..stages.closest_edge import broadcast
    from ..stages.crossing_join import CrossingPairs
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey"]).to_pandas()
    A, B, nation, edge_j = _nation_chains(nat["n_nationkey"].to_numpy())
    ref = broadcast({"a": A, "b": B, "nation": nation,
                     "edge_j": edge_j})
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    from ..stages.stateful import stateful_map_batches
    return stateful_map_batches(
        cust, CrossingPairs, (ref,),
        batch_format="pyarrow", num_cpus=1)


QUERIES = {
    "geo_points": geo_points,
    "geo_boolean_mixed": geo_boolean_mixed,
    "geo_nested_depths": geo_nested_depths,
    "geo_edge_distance": geo_edge_distance,
    "geo_closest_edge": geo_closest_edge,
    "geo_furthest_edge": geo_furthest_edge,
    "geo_crossing_pairs": geo_crossing_pairs,
    "geo_cell_union_ops": geo_cell_union_ops,
    "geo_bbox_filter": geo_bbox_filter,
    "geo_rect_join": geo_rect_join,
    "geo_grid_tile_count": geo_grid_tile_count,
    "geo_cell_encode": geo_cell_encode,
    "geo_parent_tokens": geo_parent_tokens,
    "geo_common_ancestor": geo_common_ancestor,
    "geo_knn": geo_knn,
    "s2_knn": s2_knn,
    "geo_spatial_join": geo_spatial_join,
    "geo_pip_join": geo_pip_join,
    "geo_complement": geo_complement,
    "geo_mutable_pip": geo_mutable_pip,
    "geo_covering_tokens": geo_covering_tokens,
    "geo_polyline_ops": geo_polyline_ops,
    "geo_boolean_union": geo_boolean_union,
    "geo_union_boundary": geo_union_boundary,
    "geo_snap_e6": geo_snap_e6,
    "geo_simplify": geo_simplify,
    "geo_simplify_in_cell": geo_simplify_in_cell,
    "geo_radius_join": geo_radius_join,
}

_PTS = (f"SELECT doc_id, {GEO_LAT_EXPR} AS lat, {GEO_LON_EXPR} AS lon "
        "FROM documents")

ORACLE = {
    "geo_points": _PTS,
    "geo_bbox_filter": (
        f"SELECT * FROM ({_PTS}) WHERE lat BETWEEN 20 AND 60 "
        "AND lon BETWEEN -10 AND 40"),
    "geo_rect_join": (
        f"WITH pts AS ({_PTS}), rects AS ("
        "SELECT n_nationkey AS rect_id, "
        "(n_nationkey * 37) % 120 - 60.0 AS lat_lo, "
        "(n_nationkey * 37) % 120 - 45.0 AS lat_hi, "
        "(n_nationkey * 73) % 300 - 150.0 AS lon_lo, "
        "(n_nationkey * 73) % 300 - 120.0 AS lon_hi FROM nation) "
        "SELECT pts.doc_id, rects.rect_id FROM pts, rects "
        "WHERE pts.lat >= rects.lat_lo AND pts.lat <= rects.lat_hi "
        "AND pts.lon >= rects.lon_lo AND pts.lon <= rects.lon_hi"),
    "geo_grid_tile_count": (
        f"SELECT CAST(floor(lat / 5.0) AS BIGINT) AS tile_y, "
        "CAST(floor(lon / 5.0) AS BIGINT) AS tile_x, "
        f"COUNT(*) AS n_points FROM ({_PTS}) GROUP BY tile_y, tile_x"),
    "geo_knn": (
        "WITH pts AS (SELECT doc_id, "
        f"radians({GEO_LAT_EXPR}) AS lat, radians({GEO_LON_EXPR}) AS lon "
        "FROM documents), "
        "q AS (SELECT c_custkey AS query_id, "
        "radians(((c_custkey * 3571) % 18000) / 100.0 - 90.0) AS qlat, "
        "radians(((c_custkey * 6689) % 36000) / 100.0 - 180.0) AS qlon "
        "FROM customer WHERE c_custkey < 20), "
        "d AS (SELECT q.query_id, pts.doc_id, "
        "(cos(qlat)*cos(qlon) - cos(lat)*cos(lon)) * "
        "(cos(qlat)*cos(qlon) - cos(lat)*cos(lon)) + "
        "(cos(qlat)*sin(qlon) - cos(lat)*sin(lon)) * "
        "(cos(qlat)*sin(qlon) - cos(lat)*sin(lon)) + "
        "(sin(qlat) - sin(lat)) * (sin(qlat) - sin(lat)) AS d2 "
        "FROM q, pts), "
        "r AS (SELECT query_id, doc_id, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY d2, doc_id) AS rank FROM d) "
        "SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank FROM r "
        "WHERE rank <= 5"),
}

# The indexed kNN path must produce the identical result set.
ORACLE["s2_knn"] = ORACLE["geo_knn"]

# Exact-PIP join: convex-loop hemisphere test over literal edge normals;
# the point trig chain is the geo_knn-proven bit-exact replay.
ORACLE["geo_pip_join"] = f"""
WITH pts AS (
  SELECT doc_id,
    cos(radians(lat)) * cos(radians(lon)) AS px,
    cos(radians(lat)) * sin(radians(lon)) AS py,
    sin(radians(lat)) AS pz
  FROM (SELECT doc_id, {GEO_LAT_EXPR} AS lat, {GEO_LON_EXPR} AS lon
        FROM documents)
), edges(polygon_id, nx, ny, nz) AS (VALUES {_pip_edges_values()})
SELECT p.doc_id AS doc_id, CAST(e.polygon_id AS BIGINT) AS polygon_id
FROM pts p, edges e
GROUP BY 1, 2
HAVING min(e.nx * p.px + e.ny * p.py + e.nz * p.pz) > 0
"""

# Complement membership: the exact negation of geo_pip_join's convex
# hemisphere test over the same 8 fixture polygons' edge-normal
# literals — p in ~A iff some edge hemisphere excludes p.
ORACLE["geo_complement"] = f"""
WITH pts AS (
  SELECT doc_id,
    cos(radians(lat)) * cos(radians(lon)) AS px,
    cos(radians(lat)) * sin(radians(lon)) AS py,
    sin(radians(lat)) AS pz
  FROM (SELECT doc_id, {GEO_LAT_EXPR} AS lat, {GEO_LON_EXPR} AS lon
        FROM documents)
), edges(polygon_id, nx, ny, nz) AS (VALUES {_edges_values(_pip_polygons(8))})
SELECT p.doc_id AS doc_id, CAST(e.polygon_id AS BIGINT) AS polygon_id
FROM pts p, edges e
GROUP BY 1, 2
HAVING min(e.nx * p.px + e.ny * p.py + e.nz * p.pz) < 0
"""

# Mutable-index membership: hemisphere test over the analytically-known
# post-mutation shape set (adds 0..15, remove ids 1,5,9,13, add 16..19
# — ids equal fixture pids by add order).
_MUTABLE_SURVIVORS = [p for p in range(20) if not (p < 16 and p % 4 == 1)]
ORACLE["geo_mutable_pip"] = f"""
WITH pts AS (
  SELECT doc_id,
    cos(radians(lat)) * cos(radians(lon)) AS px,
    cos(radians(lat)) * sin(radians(lon)) AS py,
    sin(radians(lat)) AS pz
  FROM (SELECT doc_id, {GEO_LAT_EXPR} AS lat, {GEO_LON_EXPR} AS lon
        FROM documents)
), edges(shape_id, nx, ny, nz) AS (VALUES {_edges_values(
    [r for r in _pip_polygons(20)
     if r["polygon_id"] in set(_MUTABLE_SURVIVORS)])})
SELECT p.doc_id AS doc_id, CAST(e.shape_id AS BIGINT) AS shape_id
FROM pts p, edges e
GROUP BY 1, 2
HAVING min(e.nx * p.px + e.ny * p.py + e.nz * p.pz) > 0
"""

# Mixed boolean operation: the kept/absorbed decisions follow the
# polygon-model shared-edge rules (forward edges absorbed under
# SEMI_OPEN/CLOSED, reversed only under CLOSED); the kept arc length
# replays the atan2(|cross|, dot) chain bit-identically.
ORACLE["geo_boolean_mixed"] = r"""
WITH base AS (
  SELECT n_nationkey,
    CAST((n_nationkey * 37) % 116 - 58.0 AS DOUBLE) AS la,
    CAST((n_nationkey * 73) % 296 - 148.0 AS DOUBLE) AS lo,
    n_nationkey % 2 AS par, n_nationkey % 3 AS model
  FROM nation
), v AS (
  SELECT *,
    cos(radians(la))*cos(radians(lo)) AS ax,
    cos(radians(la))*sin(radians(lo)) AS ay,
    sin(radians(la)) AS az,
    cos(radians(la))*cos(radians(lo+2.0)) AS bx,
    cos(radians(la))*sin(radians(lo+2.0)) AS by,
    sin(radians(la)) AS bz
  FROM base
), keepx AS (
  SELECT *,
    CASE WHEN (par = 0 AND model <> 0) OR (par = 1 AND model = 2)
         THEN 1 ELSE 0 END AS kept
  FROM v
)
SELECT n_nationkey,
  CAST(1 AS BIGINT) AS n_inter_points,
  CAST(kept AS BIGINT) AS n_inter_line_edges,
  CAST(1 - kept AS BIGINT) AS n_union_line_edges,
  CAST(4 AS BIGINT) AS n_union_poly_edges,
  ROUND(CASE WHEN kept = 1
    THEN atan2(sqrt((ay*bz - az*by)*(ay*bz - az*by)
        + (az*bx - ax*bz)*(az*bx - ax*bz)
        + (ax*by - ay*bx)*(ax*by - ay*bx)), ax*bx + ay*by + az*bz)
    ELSE 0.0 END, 12) AS inter_len_rad
FROM keepx
"""

# Nested-depth query: with a correct nesting tree, every output column
# is a pure function of key % 3 (k concentric squares -> depths 0..k-1
# in preorder, then the disjoint square at depth 0).
ORACLE["geo_nested_depths"] = r"""
SELECT n_nationkey,
  CAST(3 + n_nationkey % 3 AS BIGINT) AS n_loops,
  CASE n_nationkey % 3
    WHEN 0 THEN '0,1,0'
    WHEN 1 THEN '0,1,2,0'
    ELSE '0,1,2,3,0' END AS depth_seq,
  CAST(CASE n_nationkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 6 END
       AS BIGINT) AS sum_depth,
  CAST(1 + n_nationkey % 3 AS BIGINT) AS max_depth
FROM nation
"""

# Edge-distance oracle: the full updateMinDistance chain in SQL.
# Component order of the cross products and the x^2+y^2+z^2 sum order
# match numpy's exactly; the wedge tests and the interior/vertex pick
# become CASE expressions.
ORACLE["geo_edge_distance"] = r"""
WITH base AS (
  SELECT n_nationkey,
    CAST((n_nationkey * 37) % 100 - 50.0 AS DOUBLE) AS la,
    CAST((n_nationkey * 73) % 280 - 140.0 AS DOUBLE) AS lo
  FROM nation
), probes AS (
  SELECT b.*, p.probe_id,
    CASE p.probe_id WHEN 0 THEN la + 2.0 WHEN 1 THEN la - 2.0
                    ELSE la + 5.0 END AS plat,
    CASE p.probe_id WHEN 0 THEN lo + 2.0 WHEN 1 THEN lo - 2.0
                    ELSE lo + 6.0 END AS plon
  FROM base b, (SELECT 0 AS probe_id UNION ALL SELECT 1
                UNION ALL SELECT 2) p
), v AS (
  SELECT n_nationkey, probe_id,
    cos(radians(plat))*cos(radians(plon)) AS xx,
    cos(radians(plat))*sin(radians(plon)) AS xy,
    sin(radians(plat)) AS xz,
    cos(radians(la))*cos(radians(lo)) AS ax,
    cos(radians(la))*sin(radians(lo)) AS ay,
    sin(radians(la)) AS az,
    cos(radians(la+3.0))*cos(radians(lo+4.0)) AS bx,
    cos(radians(la+3.0))*sin(radians(lo+4.0)) AS by,
    sin(radians(la+3.0)) AS bz
  FROM probes
), d AS (
  SELECT *,
    (xx-ax)*(xx-ax) + (xy-ay)*(xy-ay) + (xz-az)*(xz-az) AS xa2,
    (xx-bx)*(xx-bx) + (xy-by)*(xy-by) + (xz-bz)*(xz-bz) AS xb2,
    (ax-bx)*(ax-bx) + (ay-by)*(ay-by) + (az-bz)*(az-bz) AS ab2,
    (ay+by)*(bz-az) - (az+bz)*(by-ay) AS cx_,
    (az+bz)*(bx-ax) - (ax+bx)*(bz-az) AS cy_,
    (ax+bx)*(by-ay) - (ay+by)*(bx-ax) AS cz_
  FROM v
), e AS (
  SELECT *,
    least(xa2, xb2) AS vertex_d2,
    greatest(xa2, xb2) < least(xa2, xb2) + ab2 AS maybe_interior,
    cx_*cx_ + cy_*cy_ + cz_*cz_ AS c2,
    xx*cx_ + xy*cy_ + xz*cz_ AS x_dot_c,
    cy_*xz - cz_*xy AS cxx_,
    cz_*xx - cx_*xz AS cxy_,
    cx_*xy - cy_*xx AS cxz_
  FROM d
), f AS (
  SELECT *,
    ax*cxx_ + ay*cxy_ + az*cxz_ AS a_cx,
    bx*cxx_ + by*cxy_ + bz*cxz_ AS b_cx,
    1.0 - sqrt((cxx_*cxx_ + cxy_*cxy_ + cxz_*cxz_) / c2) AS qr
  FROM e
)
SELECT n_nationkey, CAST(probe_id AS BIGINT) AS probe_id,
  ROUND(CASE WHEN maybe_interior AND a_cx < 0 AND b_cx > 0
    THEN least((x_dot_c * x_dot_c) / c2 + qr * qr, vertex_d2)
    ELSE vertex_d2 END, 12) AS d2
FROM f
"""

# closest edge: brute-force MIN in SQL over the same bit-exact
# edge_distances2 chain as geo_edge_distance, vs best-first pruning in
# the engine.  Every non-integer literal is CAST AS DOUBLE (bare
# literals parse as DECIMAL and break IEEE identity).  The furthest
# variant evaluates the SAME chain at the ANTIPODE (component sign
# flips are exact) and emits 4 - MIN (the chord identity
# |p-x|^2 = 4 - |-p-x|^2; see stages/closest_edge.py).
def _closest_edge_sql(furthest=False):
    sign = "-" if furthest else ""
    final = ("ROUND(4 - MIN(d2e), 12)" if furthest
             else "ROUND(MIN(d2e), 12)")
    return f"""
WITH verts AS (
  SELECT n_nationkey, j,
    CAST((n_nationkey * 37) % 100 - 50.0 AS DOUBLE)
      + CAST(0.55 AS DOUBLE) * j
      + CASE WHEN j % 2 = 1 THEN CAST(1.5 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END AS vlat,
    CAST((n_nationkey * 73) % 280 - 140.0 AS DOUBLE)
      + CAST(1.1 AS DOUBLE) * j AS vlon
  FROM nation, (SELECT CAST(range AS BIGINT) AS j FROM range(8)) t
), vxyz AS (
  SELECT n_nationkey, j,
    cos(radians(vlat))*cos(radians(vlon)) AS vx,
    cos(radians(vlat))*sin(radians(vlon)) AS vy,
    sin(radians(vlat)) AS vz
  FROM verts
), edges AS (
  SELECT a.n_nationkey, a.j AS eid,
    a.vx AS ax, a.vy AS ay, a.vz AS az,
    b.vx AS bx, b.vy AS by, b.vz AS bz
  FROM vxyz a JOIN vxyz b
    ON a.n_nationkey = b.n_nationkey AND b.j = a.j + 1
), pts AS (
  SELECT doc_id,
    {sign}(cos(radians(plat))*cos(radians(plon))) AS xx,
    {sign}(cos(radians(plat))*sin(radians(plon))) AS xy,
    {sign}(sin(radians(plat))) AS xz
  FROM (SELECT doc_id, {GEO_LAT_EXPR} AS plat, {GEO_LON_EXPR} AS plon
        FROM documents) raw
), d AS (
  SELECT doc_id,
    (xx-ax)*(xx-ax) + (xy-ay)*(xy-ay) + (xz-az)*(xz-az) AS xa2,
    (xx-bx)*(xx-bx) + (xy-by)*(xy-by) + (xz-bz)*(xz-bz) AS xb2,
    (ax-bx)*(ax-bx) + (ay-by)*(ay-by) + (az-bz)*(az-bz) AS ab2,
    (ay+by)*(bz-az) - (az+bz)*(by-ay) AS cx_,
    (az+bz)*(bx-ax) - (ax+bx)*(bz-az) AS cy_,
    (ax+bx)*(by-ay) - (ay+by)*(bx-ax) AS cz_,
    xx, xy, xz, ax, ay, az, bx, by, bz
  FROM pts, edges
), e AS (
  SELECT *,
    least(xa2, xb2) AS vertex_d2,
    greatest(xa2, xb2) < least(xa2, xb2) + ab2 AS maybe_interior,
    cx_*cx_ + cy_*cy_ + cz_*cz_ AS c2,
    xx*cx_ + xy*cy_ + xz*cz_ AS x_dot_c,
    cy_*xz - cz_*xy AS cxx_,
    cz_*xx - cx_*xz AS cxy_,
    cx_*xy - cy_*xx AS cxz_
  FROM d
), f AS (
  SELECT *,
    ax*cxx_ + ay*cxy_ + az*cxz_ AS a_cx,
    bx*cxx_ + by*cxy_ + bz*cxz_ AS b_cx,
    CAST(1.0 AS DOUBLE)
      - sqrt((cxx_*cxx_ + cxy_*cxy_ + cxz_*cxz_) / c2) AS qr
  FROM e
), per AS (
  SELECT doc_id,
    CASE WHEN maybe_interior AND a_cx < 0 AND b_cx > 0
      THEN least((x_dot_c * x_dot_c) / c2 + qr * qr, vertex_d2)
      ELSE vertex_d2 END AS d2e
  FROM f
)
SELECT doc_id, {final} AS d2 FROM per GROUP BY doc_id
"""


ORACLE["geo_closest_edge"] = _closest_edge_sql()
ORACLE["geo_furthest_edge"] = _closest_edge_sql(furthest=True)

# crossing pairs: proper (interior) crossing as float sign algebra —
# p=(AxB).C, q=(AxB).D, r=(CxD).B, t=(CxD).A; crossing_sign > 0 iff
# p*q < 0 AND r*t < 0 AND q*t > 0 (validated against the exact
# predicate on 20k random quadruples; fixture determinants sit >=4.4e-9
# from zero so float signs match the engine's exact chain).  Output is
# pure integers, so no float-identity discipline is needed here.
ORACLE["geo_crossing_pairs"] = """
WITH verts AS (
  SELECT n_nationkey, j,
    CAST((n_nationkey * 37) % 100 - 50.0 AS DOUBLE)
      + CAST(0.55 AS DOUBLE) * j
      + CASE WHEN j % 2 = 1 THEN CAST(1.5 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END AS vlat,
    CAST((n_nationkey * 73) % 280 - 140.0 AS DOUBLE)
      + CAST(1.1 AS DOUBLE) * j AS vlon
  FROM nation, (SELECT CAST(range AS BIGINT) AS j FROM range(8)) t
), vxyz AS (
  SELECT n_nationkey, j,
    cos(radians(vlat))*cos(radians(vlon)) AS vx,
    cos(radians(vlat))*sin(radians(vlon)) AS vy,
    sin(radians(vlat)) AS vz
  FROM verts
), edges AS (
  SELECT a.n_nationkey, a.j AS edge_j,
    a.vx AS ex, a.vy AS ey, a.vz AS ez,
    b.vx AS fx, b.vy AS fy, b.vz AS fz
  FROM vxyz a JOIN vxyz b
    ON a.n_nationkey = b.n_nationkey AND b.j = a.j + 1
), segs AS (
  SELECT c_custkey,
    CAST((c_custkey * 3571) % 16000 AS DOUBLE) / 100.0 - 80.0 AS clat,
    CAST((c_custkey * 6689) % 35000 AS DOUBLE) / 100.0 - 175.0 AS clon
  FROM customer
), segxyz AS (
  SELECT c_custkey,
    cos(radians(clat - 1.0))*cos(radians(clon - 1.3)) AS ax,
    cos(radians(clat - 1.0))*sin(radians(clon - 1.3)) AS ay,
    sin(radians(clat - 1.0)) AS az,
    cos(radians(clat + 1.0))*cos(radians(clon + 1.3)) AS bx,
    cos(radians(clat + 1.0))*sin(radians(clon + 1.3)) AS by,
    sin(radians(clat + 1.0)) AS bz
  FROM segs
), dets AS (
  SELECT s.c_custkey, e.n_nationkey, e.edge_j,
    (s.ay*s.bz - s.az*s.by)*e.ex + (s.az*s.bx - s.ax*s.bz)*e.ey
      + (s.ax*s.by - s.ay*s.bx)*e.ez AS p,
    (s.ay*s.bz - s.az*s.by)*e.fx + (s.az*s.bx - s.ax*s.bz)*e.fy
      + (s.ax*s.by - s.ay*s.bx)*e.fz AS q,
    (e.ey*e.fz - e.ez*e.fy)*s.bx + (e.ez*e.fx - e.ex*e.fz)*s.by
      + (e.ex*e.fy - e.ey*e.fx)*s.bz AS r,
    (e.ey*e.fz - e.ez*e.fy)*s.ax + (e.ez*e.fx - e.ex*e.fz)*s.ay
      + (e.ex*e.fy - e.ey*e.fx)*s.az AS t
  FROM segxyz s, edges e
)
SELECT c_custkey, n_nationkey, edge_j
FROM dets WHERE p*q < 0 AND r*t < 0 AND q*t > 0
"""

# radius join: same chord-distance formula as geo_knn's oracle.
import math as _math
_R = 800.0 / 6371.01
_LIMIT2 = repr(min(4.0, 4.0 * _math.sin(0.5 * _R) ** 2))
ORACLE["geo_radius_join"] = (
    "WITH pts AS (SELECT doc_id, "
    f"radians({GEO_LAT_EXPR}) AS lat, radians({GEO_LON_EXPR}) AS lon "
    "FROM documents), "
    "q AS (SELECT c_custkey AS query_id, "
    "radians(((c_custkey * 3571) % 18000) / 100.0 - 90.0) AS qlat, "
    "radians(((c_custkey * 6689) % 36000) / 100.0 - 180.0) AS qlon "
    "FROM customer WHERE c_custkey < 20) "
    "SELECT q.query_id, pts.doc_id FROM q, pts WHERE "
    "(cos(qlat)*cos(qlon) - cos(lat)*cos(lon)) * "
    "(cos(qlat)*cos(qlon) - cos(lat)*cos(lon)) + "
    "(cos(qlat)*sin(qlon) - cos(lat)*sin(lon)) * "
    "(cos(qlat)*sin(qlon) - cos(lat)*sin(lon)) + "
    "(sin(qlat) - sin(lat)) * (sin(qlat) - sin(lat)) <= " + _LIMIT2)

def _pages_points_cte(n_expr, seed=42):
    """WITH-clause body replaying sources/pages.py bit-for-bit in DuckDB:
    splitmix64 (HUGEINT mod-2^64 multiply split into 32-bit halves,
    UBIGINT xor/shift), the 70/30 uniform-sphere / hot-cap mixture
    (atan2+sqrt uniform lat — chosen over asin, which differs from
    numpy's in the last ulp), np.rint half-to-even micro-degree
    formatting of the "%.6f" coordinate text, and the parse-back as
    micro/1e6 (a correctly-rounded division of exact operands equals
    the strtod of the decimal string).  Yields `pagepts(url, plat,
    plon)` — one row per well-formed page (kind > 5), matching
    parse_latlon + drop_misses.  Every float literal is CAST AS DOUBLE:
    bare literals parse as DECIMAL in DuckDB and break IEEE identity."""
    from ..sources.pages import HOT_CAPS
    M64 = "18446744073709551616"

    def lit(x):
        return f"CAST({repr(float(x))} AS DOUBLE)"

    def mulmod(x, c):
        return (f"CAST((((CAST({x} AS HUGEINT) % 4294967296) * {c}) "
                f"% {M64} + (((CAST({x} AS HUGEINT) // 4294967296) * {c})"
                f" % 4294967296) * 4294967296) % {M64} AS UBIGINT)")

    def rint(x):
        # np.rint: round half to EVEN (exact for |x| < 2^52).
        return (f"(CASE WHEN {x} - floor({x}) > 0.5 THEN floor({x}) + 1.0 "
                f"WHEN {x} - floor({x}) < 0.5 THEN floor({x}) "
                f"WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 THEN floor({x}) "
                f"ELSE floor({x}) + 1.0 END)")

    RAD2DEG = lit(180.0 / np.pi)
    TWO_PI = lit(2 * np.pi)
    M64F = f"CAST({M64} AS DOUBLE)"
    caps = []
    for i in range(len(HOT_CAPS)):
        clat, clon, cr = (float(v) for v in HOT_CAPS[i])
        denom = float(np.maximum(0.1, np.cos(np.deg2rad(np.float64(clat)))))
        caps.append((lit(clat), lit(clon), lit(cr), lit(denom)))

    def case5(j):
        arms = " ".join(f"WHEN {k} THEN {caps[k][j]}" for k in range(5))
        return f"(CASE cap {arms} END)"

    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    hashes = [("h1", seed), ("h2", seed + 1), ("h3", seed + 2),
              ("h4", seed + 3), ("h5", seed + 4)]
    s1 = ",\n  ".join(
        f"CAST((CAST(CAST(xor(rid, CAST({s} AS UBIGINT)) AS UBIGINT) "
        f"AS HUGEINT) + 11400714819323198485) % {M64} AS UBIGINT) AS {t}a"
        for t, s in hashes)
    s2 = ",\n  ".join(f"{mulmod(f'xor({t}a, {t}a >> 30)', C1)} AS {t}b"
                      for t, _ in hashes)
    s3 = ",\n  ".join(f"{mulmod(f'xor({t}b, {t}b >> 27)', C2)} AS {t}c"
                      for t, _ in hashes)
    s4 = ",\n  ".join(f"xor({t}c, {t}c >> 31) AS {t}" for t, _ in hashes)
    return f"""
rids AS (SELECT CAST(range AS UBIGINT) AS rid FROM range({n_expr})),
mx1 AS (SELECT rid, {s1} FROM rids),
mx2 AS (SELECT rid, {s2} FROM mx1),
mx3 AS (SELECT rid, {s3} FROM mx2),
hsh AS (SELECT rid, {s4} FROM mx3),
gen AS (
 SELECT rid,
   {lit(-180.0)} + {lit(360.0)} * (CAST(h1 AS DOUBLE) / {M64F}) AS u_lon,
   {lit(-1.0)} + {lit(2.0)} * (CAST(h2 AS DOUBLE) / {M64F}) AS zz,
   CAST(h1 % 5 AS INTEGER) AS cap,
   CAST(h2 AS DOUBLE) / {M64F} AS q2,
   {lit(0.0)} + {TWO_PI} * (CAST(h3 AS DOUBLE) / {M64F}) AS theta,
   (h4 % 100) < 30 AS is_hot,
   CAST(h5 % 100 AS INTEGER) AS kind
 FROM hsh),
mixed AS (
 SELECT rid, kind,
   CASE WHEN is_hot
        THEN {case5(0)} + (({case5(2)} * sqrt(q2)) * {RAD2DEG}) * cos(theta)
        ELSE atan2(zz, sqrt({lit(1.0)} - zz * zz)) * {RAD2DEG} END AS lat0,
   CASE WHEN is_hot
        THEN {case5(1)} + (({case5(2)} * sqrt(q2)) * {RAD2DEG})
             * sin(theta) / {case5(3)}
        ELSE u_lon END AS lon0
 FROM gen),
pclip AS (
 SELECT rid, kind,
   greatest({lit(-89.999)}, least({lit(89.999)}, lat0)) AS lat1,
   ((lon0 + {lit(180.0)}) - {lit(360.0)}
    * floor((lon0 + {lit(180.0)}) / {lit(360.0)})) - {lit(180.0)} AS lon1
 FROM mixed),
micro AS (
 SELECT rid,
   CAST({rint(f"(lat1 * {lit(1e6)})")} AS BIGINT) AS lat_u,
   CAST({rint(f"(lon1 * {lit(1e6)})")} AS BIGINT) AS lon_u
 FROM pclip WHERE kind > 5),
pagepts AS (
 SELECT 'https://host' || CAST(rid % 1000 AS VARCHAR) || '.example/'
        || CAST(rid AS VARCHAR) AS url,
   CAST(lat_u AS DOUBLE) / {lit(1e6)} AS plat,
   CAST(lon_u AS DOUBLE) / {lit(1e6)} AS plon
 FROM micro)"""


def _spatial_join_sql():
    """Flagship oracle: the replayed page points against the convex
    _sj_polygons hemisphere test (edge normals as float64 literals).
    The rid series 0..max(2000, 10*n_docs)-1 is built as a UNION of a
    constant range with documents row numbers x 10 because DuckDB's
    range() only takes constant arguments."""
    rid_cte = """
rids AS (
  SELECT CAST(range AS UBIGINT) AS rid FROM range(2000)
  UNION
  SELECT CAST(10 * (d.rn - 1) + t.k AS UBIGINT)
  FROM (SELECT row_number() OVER () AS rn FROM documents) d,
       (SELECT range AS k FROM range(10)) t
)"""
    body = _pages_points_cte("__UNUSED__")
    head, rest = body.split("),", 1)
    assert "rids AS" in head
    return f"""
WITH {rid_cte},{rest},
pxyz AS (
 SELECT url,
   cos(radians(plat)) * cos(radians(plon)) AS px,
   cos(radians(plat)) * sin(radians(plon)) AS py,
   sin(radians(plat)) AS pz
 FROM pagepts),
edges(polygon_id, nx, ny, nz) AS (VALUES {_edges_values(_sj_polygons())})
SELECT p.url AS url, CAST(e.polygon_id AS BIGINT) AS polygon_id
FROM pxyz p, edges e
GROUP BY 1, 2
HAVING min(e.nx * p.px + e.ny * p.py + e.nz * p.pz) > 0
"""


ORACLE["geo_spatial_join"] = _spatial_join_sql()


def _simplify_verts_values():
    """(nkey, vidx, vx, vy, vz) literals: the 64-vertex sinusoidal nation
    chains geo_simplify feeds to the Douglas-Peucker simplifier."""
    from ..core import coords
    rows = []
    for key in range(25):
        lat0 = (key * 37) % 120 - 60.0
        lon0 = (key * 73) % 300 - 150.0
        t = np.linspace(0, 1, 64)
        lat = lat0 + 2.0 * t + 0.05 * np.sin(8 * np.pi * t)
        lon = lon0 + 2.0 * t
        x, y, z = coords.latlng_to_xyz(lat, lon)
        for i in range(64):
            rows.append(
                "(%d,%d,CAST(%s AS DOUBLE),CAST(%s AS DOUBLE),"
                "CAST(%s AS DOUBLE))" % (key, i, repr(float(x[i])),
                                         repr(float(y[i])),
                                         repr(float(z[i]))))
    return ",".join(rows)


def _simplify_sql():
    """geo_simplify oracle: full Douglas-Peucker replay in DuckDB.

    d2all precomputes the exact edge_distances2 chain (the bit-exact
    geo_edge_distance chain: stable (b+a)x(b-a) cross product,
    planar-acuteness prefilter, wedge sign tests, XQ^2 + QR^2) for every
    (lo < k < hi) triple; a recursive CTE then replays the splitting —
    per interval the argmax-k vertex (NOT EXISTS anti-join; first index
    wins ties like np.argmax) splits the interval iff its d2 exceeds
    tol2.  Kept-vertex count = distinct interval endpoints.  Decisions
    are deterministic because both sides compute identical doubles
    (min |d2 - tol2| decision margin 1.1e-11 >> 0 on identical bits)."""
    from ..core.edge import radians_to_chord2
    tol2 = repr(float(radians_to_chord2(1e-4)))
    return f"""
WITH RECURSIVE verts(nkey, vidx, vx, vy, vz) AS
  (VALUES {_simplify_verts_values()}),
tri AS (
  SELECT l.nkey, l.vidx AS lo, h.vidx AS hi, m.vidx AS k,
    m.vx AS xx, m.vy AS xy, m.vz AS xz,
    l.vx AS ax, l.vy AS ay, l.vz AS az,
    h.vx AS bx, h.vy AS by, h.vz AS bz
  FROM verts l
  JOIN nation n ON n.n_nationkey = l.nkey
  JOIN verts h ON h.nkey = l.nkey AND h.vidx > l.vidx + 1
  JOIN verts m ON m.nkey = l.nkey AND m.vidx > l.vidx AND m.vidx < h.vidx
),
d AS (
  SELECT nkey, lo, hi, k,
    (xx-ax)*(xx-ax) + (xy-ay)*(xy-ay) + (xz-az)*(xz-az) AS xa2,
    (xx-bx)*(xx-bx) + (xy-by)*(xy-by) + (xz-bz)*(xz-bz) AS xb2,
    (ax-bx)*(ax-bx) + (ay-by)*(ay-by) + (az-bz)*(az-bz) AS ab2,
    (ay+by)*(bz-az) - (az+bz)*(by-ay) AS cx_,
    (az+bz)*(bx-ax) - (ax+bx)*(bz-az) AS cy_,
    (ax+bx)*(by-ay) - (ay+by)*(bx-ax) AS cz_,
    xx, xy, xz, ax, ay, az, bx, by, bz
  FROM tri
),
e AS (
  SELECT *, least(xa2, xb2) AS vertex_d2,
    greatest(xa2, xb2) < least(xa2, xb2) + ab2 AS maybe_interior,
    cx_*cx_ + cy_*cy_ + cz_*cz_ AS c2,
    xx*cx_ + xy*cy_ + xz*cz_ AS x_dot_c,
    cy_*xz - cz_*xy AS cxx_,
    cz_*xx - cx_*xz AS cxy_,
    cx_*xy - cy_*xx AS cxz_
  FROM d
),
f AS (
  SELECT nkey, lo, hi, k, vertex_d2, maybe_interior, c2, x_dot_c,
    ax*cxx_ + ay*cxy_ + az*cxz_ AS a_cx,
    bx*cxx_ + by*cxy_ + bz*cxz_ AS b_cx,
    1.0 - sqrt((cxx_*cxx_ + cxy_*cxy_ + cxz_*cxz_) / c2) AS qr
  FROM e
),
d2all AS (
  SELECT nkey, lo, hi, k,
    CASE WHEN maybe_interior AND a_cx < 0 AND b_cx > 0
      THEN least((x_dot_c * x_dot_c) / c2 + qr * qr, vertex_d2)
      ELSE vertex_d2 END AS d2
  FROM f
),
splits(nkey, lo, hi) AS (
  SELECT DISTINCT nkey, 0, 63 FROM tri
  UNION ALL
  SELECT s.nkey, u.newlo, u.newhi
  FROM splits s
  JOIN d2all d ON d.nkey = s.nkey AND d.lo = s.lo AND d.hi = s.hi
  CROSS JOIN LATERAL (VALUES (s.lo, d.k), (d.k, s.hi)) AS u(newlo, newhi)
  WHERE d.d2 > CAST({tol2} AS DOUBLE)
    AND NOT EXISTS (SELECT 1 FROM d2all q
        WHERE q.nkey = s.nkey AND q.lo = s.lo AND q.hi = s.hi
          AND (q.d2 > d.d2 OR (q.d2 = d.d2 AND q.k < d.k)))
)
SELECT nkey AS n_nationkey, CAST(64 AS BIGINT) AS n_in,
  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_kept
FROM (SELECT nkey, lo AS v FROM splits UNION SELECT nkey, hi FROM splits)
GROUP BY 1
"""


ORACLE["geo_simplify"] = _simplify_sql()


def _rint_sql(x):
    """np.rint (round half to even) as a CASE chain; exact for |x|<2^52."""
    return (f"(CASE WHEN {x} - floor({x}) > 0.5 THEN floor({x}) + 1.0 "
            f"WHEN {x} - floor({x}) < 0.5 THEN floor({x}) "
            f"WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 THEN floor({x}) "
            f"ELSE floor({x}) + 1.0 END)")


def _union_edges_values():
    """(nkey, disc, nx, ny, nz) edge-normal literals for the per-nation
    union fixture discs (disc 0 = A, 1 = B)."""
    rows = []
    for k, (a, b) in _union_fixtures(range(25)).items():
        for disc, poly in ((0, a), (1, b)):
            v = poly.loops[0].vertices
            nrm = np.cross(v, np.roll(v, -1, axis=0))
            for i in range(len(v)):
                rows.append("(%d,%d,%s,%s,%s)" % (k, disc,
                            repr(nrm[i, 0]), repr(nrm[i, 1]),
                            repr(nrm[i, 2])))
    return ",".join(rows)


def _union_verts_values():
    """(nkey, disc, vidx, vx, vy, vz) vertex literals for the fixture
    discs — the raw INPUT geometry the boundary oracle reasons from."""
    rows = []
    for k, (a, b) in _union_fixtures(range(25)).items():
        for disc, poly in ((0, a), (1, b)):
            v = poly.loops[0].vertices
            for i in range(len(v)):
                # CAST AS DOUBLE: bare literals parse as DECIMAL and a
                # DECIMAL*DECIMAL cross product overflows scale 38.
                rows.append(
                    "(%d,%d,%d,CAST(%s AS DOUBLE),CAST(%s AS DOUBLE),"
                    "CAST(%s AS DOUBLE))" % (k, disc, i,
                    repr(v[i, 0]), repr(v[i, 1]), repr(v[i, 2])))
    return ",".join(rows)


# Union classification: a point is in the constructed union boundary
# polygon iff it is inside disc A or disc B — decided in SQL by the
# convex hemisphere determinant per disc.
ORACLE["geo_boolean_union"] = f"""
WITH pts AS (
  SELECT doc_id,
    cos(radians(lat)) * cos(radians(lon)) AS px,
    cos(radians(lat)) * sin(radians(lon)) AS py,
    sin(radians(lat)) AS pz
  FROM (SELECT doc_id, {GEO_LAT_EXPR} AS lat, {GEO_LON_EXPR} AS lon
        FROM documents)
), edges(nkey, disc, nx, ny, nz) AS (VALUES {_union_edges_values()}),
hemi AS (
  SELECT p.doc_id, e.nkey, e.disc,
         min(e.nx * p.px + e.ny * p.py + e.nz * p.pz) > 0 AS ins
  FROM pts p, edges e
  JOIN nation n ON n.n_nationkey = e.nkey
  GROUP BY 1, 2, 3
)
SELECT CAST(nkey AS BIGINT) AS n_nationkey, doc_id
FROM hemi GROUP BY 1, 2 HAVING bool_or(ins)
"""

# Union boundary: predict the vertex multiset from the input discs —
# kept original vertices (outside the other disc) plus one intersection
# point per strictly-crossing edge pair, computed as the sign-adjusted
# cross product of the two edge normals.  lat/lon via scale-invariant
# atan2 forms, micro-rounded half-to-even exactly like the engine.
ORACLE["geo_union_boundary"] = f"""
WITH verts(nkey, disc, vidx, vx, vy, vz) AS (VALUES {_union_verts_values()}),
edges AS (
  SELECT a.nkey, a.disc, a.vidx,
    a.vx AS ax, a.vy AS ay, a.vz AS az,
    b.vx AS bx, b.vy AS by, b.vz AS bz,
    a.vy * b.vz - a.vz * b.vy AS nx,
    a.vz * b.vx - a.vx * b.vz AS ny,
    a.vx * b.vy - a.vy * b.vx AS nz
  FROM verts a
  JOIN verts b ON b.nkey = a.nkey AND b.disc = a.disc
              AND b.vidx = (a.vidx + 1) % 48
  JOIN nation n ON n.n_nationkey = a.nkey
),
kept AS (
  SELECT v.nkey, v.vx AS x, v.vy AS y, v.vz AS z
  FROM verts v
  JOIN edges e ON e.nkey = v.nkey AND e.disc = 1 - v.disc
  GROUP BY v.nkey, v.disc, v.vidx, v.vx, v.vy, v.vz
  HAVING NOT (min(e.nx * v.vx + e.ny * v.vy + e.nz * v.vz) > 0)
),
cross_pairs AS (
  SELECT ea.nkey,
    ea.ny * eb.nz - ea.nz * eb.ny AS cx,
    ea.nz * eb.nx - ea.nx * eb.nz AS cy,
    ea.nx * eb.ny - ea.ny * eb.nx AS cz,
    ea.ax + ea.bx AS mx, ea.ay + ea.by AS my, ea.az + ea.bz AS mz
  FROM edges ea
  JOIN edges eb ON eb.nkey = ea.nkey AND ea.disc = 0 AND eb.disc = 1
  WHERE (eb.nx * ea.ax + eb.ny * ea.ay + eb.nz * ea.az)
      * (eb.nx * ea.bx + eb.ny * ea.by + eb.nz * ea.bz) < 0
    AND (ea.nx * eb.ax + ea.ny * eb.ay + ea.nz * eb.az)
      * (ea.nx * eb.bx + ea.ny * eb.by + ea.nz * eb.bz) < 0
),
crossings AS (
  SELECT nkey,
    CASE WHEN cx * mx + cy * my + cz * mz < 0 THEN -cx ELSE cx END AS x,
    CASE WHEN cx * mx + cy * my + cz * mz < 0 THEN -cy ELSE cy END AS y,
    CASE WHEN cx * mx + cy * my + cz * mz < 0 THEN -cz ELSE cz END AS z
  FROM cross_pairs
),
allv AS (
  SELECT * FROM kept UNION ALL SELECT * FROM crossings
)
SELECT CAST(nkey AS BIGINT) AS n_nationkey,
  CAST({_rint_sql("(degrees(atan2(z, sqrt(x*x + y*y))) * 1000000.0)")}
       AS BIGINT) AS lat_e6,
  CAST({_rint_sql("(degrees(atan2(y, x)) * 1000000.0)")}
       AS BIGINT) AS lon_e6
FROM allv
"""

ORACLE["geo_snap_e6"] = (
    f"SELECT doc_id, CAST(ROUND(({GEO_LAT_EXPR}) * 1000000) AS BIGINT) "
    f"AS lat_e6, CAST(ROUND(({GEO_LON_EXPR}) * 1000000) AS BIGINT) "
    "AS lon_e6 FROM documents")


def _cell_encode_sql() -> str:
    """Full S2 leaf-cell geocode (latlng -> xyz -> face/uv -> quadratic st
    -> ij -> Hilbert curve) as ONE DuckDB query — the SQL oracle for
    geo_cell_encode, bit-identical to core/cellid.cellid_from_latlng.

    The Hilbert walk is a recursive CTE over the 30 (i, j) bit levels
    (MSB first), carrying the orientation state through the IJ_TO_POS /
    POS_TO_ORIENTATION tables (s2coords.d:466-512) inlined as CASE arms.
    Float stages replicate the kernel's exact op order (multiply by
    reciprocal of the major axis, sqrt-based inverse quadratic, lround
    via floor(x+0.5) under the [0, 2^30-1] clamp) so every double is
    IEEE-identical between numpy and DuckDB."""
    from ..core.coords import IJ_TO_POS, POS_TO_ORIENTATION
    ij2pos = "CASE o*4 + ((i >> k) & 1) * 2 + ((j >> k) & 1) " + " ".join(
        f"WHEN {o * 4 + ij} THEN {int(IJ_TO_POS[o][ij])}"
        for o in range(4) for ij in range(4)) + " END"
    # POS_TO_ORIENTATION = [1, 0, 0, 3]: orientation ^= table[pos]
    assert POS_TO_ORIENTATION.tolist() == [1, 0, 0, 3]
    newo = "CASE pos4v WHEN 0 THEN xor(o,1) WHEN 3 THEN xor(o,3) ELSE o END"
    i64 = ("CAST(CASE WHEN {v} >= 9223372036854775808 "
           "THEN {v} - 18446744073709551616 ELSE {v} END AS BIGINT)")
    return f"""
WITH RECURSIVE pts AS (
  SELECT doc_id, radians({GEO_LAT_EXPR}) AS lat,
         radians({GEO_LON_EXPR}) AS lon FROM documents
), xyz AS (
  SELECT doc_id, cos(lat)*cos(lon) AS x, cos(lat)*sin(lon) AS y,
         sin(lat) AS z FROM pts
), fc AS (
  SELECT doc_id, x, y, z,
    CASE WHEN abs(x) > abs(y)
         THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
         ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END AS f0
  FROM xyz
), fc2 AS (
  SELECT doc_id, x, y, z,
    CASE WHEN (CASE f0 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
         THEN f0 + 3 ELSE f0 END AS face FROM fc
), uv AS (
  SELECT doc_id, face,
    (CASE face WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 WHEN 2 THEN -1.0
               WHEN 3 THEN 1.0 WHEN 4 THEN 1.0 ELSE -1.0 END)
    * (CASE (CASE face WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 0
                       WHEN 3 THEN 2 WHEN 4 THEN 2 ELSE 1 END)
        WHEN 0 THEN x WHEN 1 THEN y ELSE z END)
    * (1.0 / (CASE face % 3 WHEN 0 THEN x WHEN 1 THEN y ELSE z END)) AS u,
    (CASE face WHEN 0 THEN 1.0 WHEN 1 THEN 1.0 WHEN 2 THEN -1.0
               WHEN 3 THEN 1.0 WHEN 4 THEN -1.0 ELSE -1.0 END)
    * (CASE (CASE face WHEN 0 THEN 2 WHEN 1 THEN 2 WHEN 2 THEN 1
                       WHEN 3 THEN 1 WHEN 4 THEN 0 ELSE 0 END)
        WHEN 0 THEN x WHEN 1 THEN y ELSE z END)
    * (1.0 / (CASE face % 3 WHEN 0 THEN x WHEN 1 THEN y ELSE z END)) AS v
  FROM fc2
), st AS (
  SELECT doc_id, face,
    CASE WHEN u >= 0 THEN 0.5 * sqrt(greatest(1.0 + 3.0*u, 0.0))
         ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0*u, 0.0)) END AS s,
    CASE WHEN v >= 0 THEN 0.5 * sqrt(greatest(1.0 + 3.0*v, 0.0))
         ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0*v, 0.0)) END AS t
  FROM uv
), ij AS (
  SELECT doc_id, face,
    CAST(greatest(0, least(1073741823,
         floor(1073741824.0 * s - 0.5 + 0.5))) AS BIGINT) AS i,
    CAST(greatest(0, least(1073741823,
         floor(1073741824.0 * t - 0.5 + 0.5))) AS BIGINT) AS j
  FROM st
), hil AS (
  SELECT doc_id, face, i, j, 29 AS k, face % 2 AS o,
         CAST(0 AS HUGEINT) AS pos FROM ij
  UNION ALL
  SELECT doc_id, face, i, j, k - 1, {newo} AS o, pos * 4 + pos4v AS pos
  FROM (SELECT doc_id, face, i, j, k, o, pos, {ij2pos} AS pos4v
        FROM hil WHERE k >= 0)
), fin AS (
  SELECT doc_id,
         CAST(face AS HUGEINT) * 2305843009213693952 + pos * 2 + 1 AS cid
  FROM hil WHERE k = -1
)
"""


def _cell_encode_tail() -> str:
    i64 = ("CAST(CASE WHEN {v} >= 9223372036854775808 "
           "THEN {v} - 18446744073709551616 ELSE {v} END AS BIGINT)")
    return f"""
SELECT doc_id, {i64.format(v='cid')} AS cell_id,
  {i64.format(v='cl12')} AS cell_l12,
  lower(lpad(to_hex(CAST(cid AS UBIGINT)), 16, '0')) AS token
FROM (SELECT doc_id, cid,
        cid - (cid % 137438953472) + 68719476736 AS cl12 FROM fin)
"""


def _parent_token_expr(level: int) -> str:
    """parent(leaf, level) as a lowercase token with trailing zeros
    stripped (cellid.to_token semantics): parent = cid - cid % (2*m)
    + m with m = 2^(2*(30-level))."""
    m = 1 << (2 * (30 - level))
    return ("rtrim(lower(lpad(to_hex(CAST("
            f"cid - (cid % {2 * m}) + {m} AS UBIGINT)), 16, '0')), '0')")


ORACLE["geo_cell_encode"] = _cell_encode_sql() + _cell_encode_tail()

# Common-ancestor level of successive doc_ids: leaf cells from the same
# Hilbert CTE joined on doc_id + 1; level = MAX L whose HUGEINT parents
# (cid - cid % 2m + m, m = 4^(30-L)) are equal, COALESCE(-1) when even
# the face cells (L = 0) differ.  Equal-parent-at-L <=> msb(a xor b) <=
# 2*(30-L), so MAX L == 30 - ceil(msb/2) — exactly the kernel's xor rule
# (core/cellid.py:441, s2cell_id.d:708-719).
_ANCESTOR_LVL_VALUES = ", ".join(
    f"({lv}, {1 << (2 * (30 - lv))})" for lv in range(31))
ORACLE["geo_common_ancestor"] = _cell_encode_sql() + f"""
, lv(lvl, m) AS (VALUES {_ANCESTOR_LVL_VALUES}),
pairs AS (
  SELECT a.doc_id AS doc_id, a.cid AS ca, b.cid AS cb
  FROM fin a JOIN fin b ON b.doc_id = a.doc_id + 1
),
anc AS (
  SELECT p.doc_id, MAX(lv.lvl) AS lvl FROM pairs p JOIN lv
    ON (p.ca - (p.ca % (2 * lv.m)) + lv.m)
     = (p.cb - (p.cb % (2 * lv.m)) + lv.m)
  GROUP BY p.doc_id)
SELECT p.doc_id, CAST(COALESCE(a.lvl, -1) AS BIGINT) AS ancestor_level
FROM pairs p LEFT JOIN anc a USING (doc_id)
"""

# Ancestor tokens at several levels: the same Hilbert CTE, parent() as
# pure HUGEINT arithmetic, to_token's trailing-zero strip via rtrim.
ORACLE["geo_parent_tokens"] = _cell_encode_sql() + f"""
SELECT doc_id,
  {_parent_token_expr(4)} AS token_l4,
  {_parent_token_expr(8)} AS token_l8,
  {_parent_token_expr(16)} AS token_l16
FROM fin
"""


def _covering_tokens_sql(n_regions=32, run_len=40, atom_level=14,
                         cover_level=12) -> str:
    """geo_covering_tokens oracle: the flood-fill result over a
    Hilbert-contiguous level-14 run is EXACTLY the distinct level-12
    ancestors of the run cells (see geo_covering_tokens docstring for
    the connectivity + exact-predicate argument) — pure HUGEINT
    parent/advance arithmetic over the leaf-geocode CTE."""
    mk = 1 << (2 * (30 - atom_level))
    ml = 1 << (2 * (30 - cover_level))
    return _cell_encode_sql() + f""",
runs AS (
  SELECT doc_id, cid - (cid % {2 * mk}) + {mk} + t.t * {2 * mk} AS c
  FROM fin, range({run_len}) AS t(t)
  WHERE doc_id < {n_regions}
), parents AS (
  SELECT DISTINCT doc_id, c - (c % {2 * ml}) + {ml} AS p
  FROM runs WHERE c < CAST('{6 * 2 ** 61}' AS HUGEINT)
)
SELECT doc_id,
  rtrim(lower(lpad(to_hex(CAST(p AS UBIGINT)), 16, '0')), '0') AS token
FROM parents
"""


ORACLE["geo_covering_tokens"] = _covering_tokens_sql()


def _simplify_in_cell_sql() -> str:
    """geo_simplify_in_cell oracle: guarded pointwise membership in
    disc-intersect-cell from literals alone (see the query docstring
    for the tol/guard soundness argument).  Cell membership is HUGEINT
    range containment over the geo_cell_encode leaf CTE; disc
    membership is the convex hemisphere-determinant min; both guards
    are the identical min|unit-normal dot| > sin(1.5*tol) expression
    with normals and sin literals shipped from the fixture builder."""
    tiles = _simplify_in_cell_tiles(range(25))
    cells_rows, cedge_rows, dedge_rows = [], [], []
    D = "CAST(%s AS DOUBLE)"
    for k, rec in tiles.items():
        dn = rec["disc_normals"]
        for q in range(len(dn)):
            dedge_rows.append("(%d,%s,%s,%s)" % (
                k, D % repr(dn[q, 0]), D % repr(dn[q, 1]),
                D % repr(dn[q, 2])))
        for t in rec["tiles"]:
            cells_rows.append(
                "(%d,'%s',CAST('%d' AS HUGEINT),CAST('%d' AS HUGEINT),%s)"
                % (k, t["token"], t["cmin"], t["cmax"],
                   D % repr(t["sin_guard"])))
            cn = t["cell_normals"]
            for q in range(4):
                cedge_rows.append("(%d,'%s',%s,%s,%s)" % (
                    k, t["token"], D % repr(cn[q, 0]),
                    D % repr(cn[q, 1]), D % repr(cn[q, 2])))
    return _cell_encode_sql() + f""",
cells(nkey, token, cmin, cmax, sing) AS (VALUES {",".join(cells_rows)}),
cedges(nkey, token, nx, ny, nz) AS (VALUES {",".join(cedge_rows)}),
dedges(nkey, nx, ny, nz) AS (VALUES {",".join(dedge_rows)}),
pc AS (
  SELECT f.doc_id, f.cid, x.x AS px, x.y AS py, x.z AS pz
  FROM fin f JOIN xyz x ON x.doc_id = f.doc_id
),
incell AS (
  SELECT p.doc_id, c.nkey, c.token, c.sing, p.px, p.py, p.pz
  FROM pc p
  JOIN cells c ON p.cid >= c.cmin AND p.cid <= c.cmax
  JOIN nation n ON n.n_nationkey = c.nkey
),
cguard AS (
  SELECT i.doc_id, i.nkey, i.token, i.sing, i.px, i.py, i.pz
  FROM incell i JOIN cedges e ON e.nkey = i.nkey AND e.token = i.token
  GROUP BY i.doc_id, i.nkey, i.token, i.sing, i.px, i.py, i.pz
  HAVING min(abs(e.nx * i.px + e.ny * i.py + e.nz * i.pz)) > i.sing
)
SELECT CAST(g.nkey AS BIGINT) AS n_nationkey, g.doc_id, g.token
FROM cguard g JOIN dedges d ON d.nkey = g.nkey
GROUP BY g.nkey, g.doc_id, g.token, g.sing
HAVING min(d.nx * g.px + d.ny * g.py + d.nz * g.pz) > 0
   AND min(abs(d.nx * g.px + d.ny * g.py + d.nz * g.pz)) > g.sing
"""


# Lazy: building this oracle runs the full tile pipeline (covering +
# clip + simplify per tile); resolving at import time would tax every
# pytest/bench session.  __ray_entry__.oracle_sql() calls it.
ORACLE["geo_simplify_in_cell"] = _simplify_in_cell_sql

def _union_ops_sql() -> str:
    """Canonical-normalized cell-union algebra as pure set + HUGEINT
    ancestor arithmetic (see geo_cell_union_ops docstring): atom sets
    combined with UNION / INTERSECT / EXCEPT, then bottom-up sibling
    fusion replayed as 'all 4^(2-l) atoms present and parent not
    full'."""
    m = {lv: 1 << (2 * (30 - lv)) for lv in (0, 1, 2)}

    def anc(col, lv):
        return f"({col} - ({col} % {2 * m[lv]}) + {m[lv]})"

    tok = ("rtrim(lower(lpad(to_hex(CAST(cell AS UBIGINT)), 16, '0')), "
           "'0')")
    return _cell_encode_sql() + f""",
atoms0 AS (
  SELECT DISTINCT CAST(doc_id % 4 AS BIGINT) AS g, {anc('cid', 2)} AS c
  FROM fin
), ga AS (
  SELECT g // 2 AS p, c FROM atoms0 WHERE g % 2 = 0
), gb AS (
  SELECT g // 2 AS p, c FROM atoms0 WHERE g % 2 = 1
), au AS (
  SELECT DISTINCT p, c FROM (SELECT p, c FROM ga
                             UNION ALL SELECT p, c FROM gb) uu
), ai AS (
  -- set INTERSECT/EXCEPT are not allowed inside a WITH RECURSIVE
  -- list (the Hilbert CTE above), so spell them as (anti-)joins
  SELECT ga.p, ga.c FROM ga JOIN gb ON gb.p = ga.p AND gb.c = ga.c
), ad AS (
  SELECT ga.p, ga.c FROM ga WHERE NOT EXISTS (
    SELECT 1 FROM gb WHERE gb.p = ga.p AND gb.c = ga.c)
), atoms AS (
  SELECT p, 'union' AS op, c FROM au
  UNION ALL SELECT p, 'intersect' AS op, c FROM ai
  UNION ALL SELECT p, 'difference' AS op, c FROM ad
), f1 AS (
  SELECT op, p, {anc('c', 1)} AS a1, COUNT(*) AS n
  FROM atoms GROUP BY 1, 2, 3
), f0 AS (
  SELECT op, p, {anc('a1', 0)} AS a0, SUM(n) AS n
  FROM f1 GROUP BY 1, 2, 3
), outc AS (
  SELECT a.op, a.p, a.c AS cell, 2 AS lvl
  FROM atoms a JOIN f1 ON f1.op = a.op AND f1.p = a.p
       AND f1.a1 = {anc('a.c', 1)}
  WHERE f1.n < 4
  UNION ALL
  SELECT f1.op, f1.p, f1.a1 AS cell, 1 AS lvl
  FROM f1 JOIN f0 ON f0.op = f1.op AND f0.p = f1.p
       AND f0.a0 = {anc('f1.a1', 0)}
  WHERE f1.n = 4 AND f0.n < 16
  UNION ALL
  SELECT op, p, a0 AS cell, 0 AS lvl FROM f0 WHERE n = 16
)
SELECT CAST(p AS BIGINT) AS pair_id, op, {tok} AS token,
       CAST(lvl AS BIGINT) AS level
FROM outc
"""


ORACLE["geo_cell_union_ops"] = _union_ops_sql()

# Polyline length + midpoint interpolation replayed in SQL: per-edge
# arc angles (acos of clipped dots), target = half total length, edge
# pick by running angle, then the exact tangent-frame slerp
# out = cos(d)*A + sin(d)*normalize(cross(cross(A,B), A)) of
# interpolate_at_distance — every double IEEE-identical to the kernel.
ORACLE["geo_polyline_ops"] = r"""
WITH base AS (
  SELECT n_nationkey,
         CAST((n_nationkey * 37) % 120 - 60.0 AS DOUBLE) AS lat0,
         CAST((n_nationkey * 73) % 300 - 150.0 AS DOUBLE) AS lon0
  FROM nation
), v AS (
  SELECT n_nationkey,
    cos(radians(lat0))*cos(radians(lon0)) AS axx,
    cos(radians(lat0))*sin(radians(lon0)) AS axy,
    sin(radians(lat0)) AS axz,
    cos(radians(lat0+1.0))*cos(radians(lon0)) AS bxx,
    cos(radians(lat0+1.0))*sin(radians(lon0)) AS bxy,
    sin(radians(lat0+1.0)) AS bxz,
    cos(radians(lat0+1.0))*cos(radians(lon0+1.0)) AS cxx,
    cos(radians(lat0+1.0))*sin(radians(lon0+1.0)) AS cxy,
    sin(radians(lat0+1.0)) AS cxz
  FROM base
), ang AS (
  -- atan2(|a x b|, a.b), the S1Angle form used by Polyline._edge_angles
  SELECT *,
    atan2(sqrt((axy*bxz - axz*bxy)*(axy*bxz - axz*bxy)
             + (axz*bxx - axx*bxz)*(axz*bxx - axx*bxz)
             + (axx*bxy - axy*bxx)*(axx*bxy - axy*bxx)),
          axx*bxx + axy*bxy + axz*bxz) AS ang1,
    atan2(sqrt((bxy*cxz - bxz*cxy)*(bxy*cxz - bxz*cxy)
             + (bxz*cxx - bxx*cxz)*(bxz*cxx - bxx*cxz)
             + (bxx*cxy - bxy*cxx)*(bxx*cxy - bxy*cxx)),
          bxx*cxx + bxy*cxy + bxz*cxz) AS ang2
  FROM v
), pick AS (
  SELECT *,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN 0.5*(ang1+ang2)
         ELSE 0.5*(ang1+ang2) - ang1 END AS d,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN axx ELSE bxx END AS pax,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN axy ELSE bxy END AS pay,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN axz ELSE bxz END AS paz,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN bxx ELSE cxx END AS pbx,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN bxy ELSE cxy END AS pby,
    CASE WHEN 0.5*(ang1+ang2) < ang1 THEN bxz ELSE cxz END AS pbz
  FROM ang
), crossn AS (
  SELECT *, pay*pbz - paz*pby AS nx, paz*pbx - pax*pbz AS ny,
            pax*pby - pay*pbx AS nz FROM pick
), tang AS (
  SELECT *, ny*paz - nz*pay AS tx, nz*pax - nx*paz AS ty,
            nx*pay - ny*pax AS tz FROM crossn
), tnorm AS (
  SELECT *, sqrt(tx*tx + ty*ty + tz*tz) AS tn FROM tang
), outp AS (
  SELECT *,
    cos(d)*pax + sin(d)*(tx/tn) AS ox,
    cos(d)*pay + sin(d)*(ty/tn) AS oy,
    cos(d)*paz + sin(d)*(tz/tn) AS oz
  FROM tnorm
), fin AS (
  SELECT n_nationkey, ang1 + ang2 AS length_rad,
    ox / sqrt(ox*ox + oy*oy + oz*oz) AS fx,
    oy / sqrt(ox*ox + oy*oy + oz*oz) AS fy,
    oz / sqrt(ox*ox + oy*oy + oz*oz) AS fz
  FROM outp
)
SELECT n_nationkey,
  ROUND(length_rad, 12) AS length_rad,
  ROUND(degrees(atan2(fz, sqrt(fx*fx + fy*fy))), 9) AS mid_lat,
  ROUND(degrees(atan2(fy, fx)), 9) AS mid_lon
FROM fin
"""
