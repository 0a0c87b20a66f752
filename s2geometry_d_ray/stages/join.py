"""The cell-prefix-range hash join between pages and polygons.

Polygon prep (small dimension side, SURVEY.md §4 'broadcast small side'):
  each polygon -> exterior covering + interior covering at levels 10-16
  (RegionCoverer, max_cells=8), flattened into per-level sorted uint64
  arrays -> one ray.put broadcast blob read zero-copy by every actor.

Page side: an actor pool (`JoinRefine`) looks up each page's level-k
ancestor in the per-level covering index (np.searchsorted), short-circuits
interior-covering hits to contained=true (no exact test, matching
s2region_coverer.d:262-268 interior-covering semantics), and runs the
vectorized exact PIP (xor of loop parities, s2polygon.d:1551-1575) for
boundary-cell candidates only.

This replaces an all-to-all shuffle join: the polygon side is broadcast,
the page side streams. The shuffle variant for a LARGE polygon side lives
in pipelines/spatial_join.py (explode + groupby on the cell key, salted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import cellid as ci
from ..core import coords
from ..core.coverer import RegionCoverer
from ..state.broadcast import fetch

JOIN_LEVELS = tuple(range(10, 17))


def _cover_one(rec, min_level, max_level, max_cells, interior_max_cells,
               with_shape_index=True):
    """Covering + interior flags + shape index for one polygon."""
    from ..core import cellunion as cu
    rc = RegionCoverer(max_cells=max_cells, min_level=min_level,
                       max_level=max_level)
    rci = RegionCoverer(max_cells=interior_max_cells, min_level=min_level,
                        max_level=max_level)
    pid = rec["polygon_id"]
    poly = rec["polygon"]
    cov = rc.get_covering(poly)
    # Exterior covering cells fully inside the interior covering can
    # short-circuit the exact PIP (s2region_coverer.d:262-268 semantics).
    int_arr = np.sort(rci.get_interior_covering(poly))
    if len(int_arr):
        flags = cu.contains_ids(int_arr, cov)
    else:
        flags = np.zeros(len(cov), dtype=bool)
    rows = [(int(c), pid, bool(f)) for c, f in zip(cov.tolist(),
                                                   flags.tolist())]
    geom = poly
    if with_shape_index:
        from ..core.shapeindex import PolygonShapeIndex
        geom = PolygonShapeIndex(poly)
    return rows, geom


def build_polygon_index(polygons, min_level=10, max_level=16, max_cells=8,
                        interior_max_cells=32):
    """polygons: list of {'polygon_id': int, 'polygon': Polygon}.

    Covering computation fans out over Ray tasks when a session is live
    (the polygon table is a dimension table, but per-polygon coverings are
    independent CPU work); falls back to serial for pure-python tests.

    Returns a picklable index dict:
      level -> dict(ucells=sorted uint64[], start/end offsets into
                    pids[], interior flags[])
      plus 'polygons': {polygon_id: Polygon} for the exact refinement.
    """
    rows = []  # (cell, polygon_id, is_interior)
    geoms = {}  # polygon_id -> PolygonShapeIndex (or Polygon)
    use_ray = False
    try:
        import ray
        use_ray = ray.is_initialized() and len(polygons) >= 8
    except Exception:
        pass
    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def cover_chunk(all_polys, ids):
            out_rows = []
            out_geoms = {}
            for k in ids:
                rec = all_polys[k]
                r, g = _cover_one(rec, min_level, max_level, max_cells,
                                  interior_max_cells)
                out_rows.extend(r)
                out_geoms[rec["polygon_id"]] = g
            return out_rows, out_geoms

        # Fine-grained tasks (a few polygons each) so a handful of
        # high-vertex-count polygons can't straggle one worker; the
        # polygon list ships ONCE via ray.put, tasks get index lists.
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 4)) - 1)
        n_chunks = min(len(polygons), 4 * ncpu)
        polys_ref = ray.put(polygons)
        futs = [cover_chunk.remote(polys_ref,
                                   list(range(i, len(polygons), n_chunks)))
                for i in range(n_chunks)]
        for part_rows, part_geoms in ray.get(futs):
            rows.extend(part_rows)
            geoms.update(part_geoms)
    else:
        for rec in polygons:
            r, g = _cover_one(rec, min_level, max_level, max_cells,
                              interior_max_cells)
            rows.extend(r)
            geoms[rec["polygon_id"]] = g
    by_level = {}
    for lvl in range(min_level, max_level + 1):
        lv_rows = [(c, p, f) for (c, p, f) in rows
                   if int(ci.level(np.uint64(c))) == lvl]
        if not lv_rows:
            continue
        lv_rows.sort()
        cells = np.array([r[0] for r in lv_rows], dtype=np.uint64)
        pids = np.array([r[1] for r in lv_rows], dtype=np.int64)
        flags = np.array([r[2] for r in lv_rows], dtype=bool)
        # Unique cells with ranges (a cell can belong to several polygons).
        ucells, starts = np.unique(cells, return_index=True)
        ends = np.append(starts[1:], len(cells))
        by_level[lvl] = {"ucells": ucells, "starts": starts, "ends": ends,
                         "pids": pids, "flags": flags}
    return {"levels": by_level,
            "polygons": geoms,
            "min_level": min_level, "max_level": max_level}


# Per-worker-process cache for broadcast indexes: stateless map_batches
# tasks run on the already-warm shared worker pool (no actor-pool spin-up);
# each worker pays one plasma fetch + deserialize, then reuses the object.
_INDEX_CACHE: dict = {}


def make_join_refine_fn(index_ref, exact=True):
    """Stateless-task variant of JoinRefine: same kernel, but the index is
    fetched once per worker process via a module-level cache. Preferred
    when the per-batch work is small relative to actor startup."""
    def fn(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cache_get_or_build
        key = (index_ref.hex() if hasattr(index_ref, "hex")
               else id(index_ref), exact)
        return cache_get_or_build(
            _INDEX_CACHE, key, lambda: JoinRefine(index_ref, exact))(batch)
    return fn


class JoinRefine:
    """Actor-pool stage: pages batch in -> join rows out.

    __init__ runs once per actor (index fetch from the object store);
    __call__ is the per-batch vectorized kernel. Use with
    ds.map_batches(JoinRefine, fn_constructor_args=(ref,),
                   batch_format=\"pyarrow\", concurrency=N)."""

    def __init__(self, index_ref, exact=True):
        self.index = fetch(index_ref)
        self.exact = exact

    def __call__(self, batch: pa.Table) -> pa.Table:
        lvls = self.index["levels"]
        urls = batch["url"]
        leaf_all = batch["cell_id"].to_numpy(zero_copy_only=False)
        out_url = []
        out_pid = []
        out_cell = []
        out_interior = []
        out_rowidx = []
        for lvl, idx in lvls.items():
            name = f"cell_l{lvl}"
            if name in batch.column_names:
                col = batch[name].to_numpy(zero_copy_only=False)
            else:
                # Derive the ancestor from the leaf on the fly: 3 ALU
                # ops/row beats hauling one more uint64 column through
                # the pipe (parent(0) would be a VALID id, so re-mask
                # the miss sentinel).
                col = ci.parent(leaf_all, lvl)
                col[leaf_all == 0] = 0
            pos = np.searchsorted(idx["ucells"], col)
            pos_c = np.minimum(pos, len(idx["ucells"]) - 1)
            hit = (idx["ucells"][pos_c] == col) & (col != 0)
            if not hit.any():
                continue
            hit_rows = np.nonzero(hit)[0]
            s = idx["starts"][pos[hit_rows]]
            e = idx["ends"][pos[hit_rows]]
            counts = e - s
            total = int(counts.sum())
            # Flattened [s_i, e_i) ranges without a Python loop.
            base = np.repeat(s, counts)
            local = np.arange(total) - np.repeat(
                np.cumsum(counts) - counts, counts)
            k = base + local
            out_rowidx.append(np.repeat(hit_rows, counts))
            out_pid.append(idx["pids"][k])
            out_interior.append(idx["flags"][k])
        if not out_rowidx:
            return pa.table({
                "url": pa.array([], pa.string()),
                "polygon_id": pa.array([], pa.int64()),
                "cell_id": pa.array([], pa.uint64()),
                "contained": pa.array([], pa.bool_()),
            })
        rowidx = np.concatenate(out_rowidx).astype(np.int64)
        pid = np.concatenate(out_pid).astype(np.int64)
        interior = np.concatenate(out_interior).astype(bool)
        cell_leaf = leaf_all[rowidx]

        contained = interior.copy()
        if self.exact:
            need = ~interior
            if need.any():
                lat = batch["lat"].to_numpy(zero_copy_only=False)[rowidx]
                lon = batch["lon"].to_numpy(zero_copy_only=False)[rowidx]
                x, y, z = coords.latlng_to_xyz(lat, lon)
                pts = np.stack([x, y, z], axis=1)
                # Group boundary candidates by polygon -> one vectorized
                # PIP call per polygon present in the batch. Geometry
                # objects are PolygonShapeIndex (cell->edge buckets) so
                # each point tests ~10 edges, not the whole ring.
                for p in np.unique(pid[need]).tolist():
                    sel = need & (pid == p)
                    geom = self.index["polygons"][p]
                    if hasattr(geom, "edge_ids"):  # shape index path
                        contained[sel] = geom.contains_points(
                            pts[sel], leaf_cells=cell_leaf[sel])
                    else:
                        contained[sel] = geom.contains_points(pts[sel])
        out_url = urls.take(pa.array(rowidx))
        return pa.table({
            "url": out_url,
            "polygon_id": pa.array(pid, pa.int64()),
            "cell_id": pa.array(cell_leaf, pa.uint64()),
            "contained": pa.array(contained, pa.bool_()),
        })
