"""The flagship pipeline: geocode pages -> S2-encode -> cell-prefix join vs
polygon coverings -> exact PIP refinement -> join rows + tile assignments.

Ray-Data-first dataflow (north_rule):
  pages Dataset (url, warc_ts, html, text, lang)
    -> select_columns (drop the heavy html BEFORE any compute)
    -> map_batches(parse_latlon + encode_cells)        [stateless, Arrow]
    -> map_batches(JoinRefine, concurrency=N)          [actor pool, holds
       the broadcast polygon covering index + geometry]
    -> write_parquet / aggregate

Tiling: tiles(level k) = project (url, cell_l{k}, token).

The polygon side is a BROADCAST dimension table (one ray.put); nothing
shuffles. For a large polygon side use shuffle_join() below which exploded-
joins on the level-k cell key via groupby, with optional salting."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import cellid as ci
from ..sources.pages import pages_dataset
from ..sources.polygons import make_polygons
from ..stages.geocode import drop_misses
from ..stages.join import JoinRefine, build_polygon_index
from ..state.broadcast import broadcast

PAGE_COLUMNS = ["url", "text", "lang"]  # html projected out early


def geocoded_pages(pages_ds, levels=tuple(range(10, 17)), with_token=False,
                   keep=PAGE_COLUMNS, drop=()):
    """pages Dataset -> geocoded + cell-encoded Dataset (misses dropped).

    with_token=False by default: hex tokens are a formatting output (the
    tiles sink adds them); the join path never needs them and token
    formatting is the one per-row-Python step in the chain. `keep` prunes
    pass-through columns at the INPUT; `drop` prunes columns that the
    parse consumed and nothing downstream needs (e.g. `text` — hundreds
    of bytes/page that otherwise ride through every later stage; the
    single biggest bytes-in-flight lever at 100 TB)."""
    from ..stages.geocode import encode_cells, parse_latlon

    def kernel(b):
        b = encode_cells(parse_latlon(b), levels, with_token=with_token)
        dead = [c for c in drop if c in b.column_names]
        return b.drop_columns(dead) if dead else b

    cols = [c for c in keep if c in pages_ds.schema().names]
    ds = pages_ds.select_columns(cols)
    ds = ds.map_batches(kernel, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=65536)
    return ds.map_batches(drop_misses, batch_format="pyarrow",
                          zero_copy_batch=True)


def _auto_concurrency(requested=None):
    """Size the actor pool to leave CPUs for the producer stages — a pool
    that reserves every CPU starves the read/geocode stages and the
    pipeline stalls (ray_guide 'Stateful stages')."""
    from ..stages.sizing import auto_concurrency
    return auto_concurrency(requested)


def spatial_join(pages_ds, polygons, concurrency=None, exact=True,
                 drop_uncontained=False, use_actors=False, index=None):
    """Returns a Dataset of join rows (url, polygon_id, cell_id, contained).

    polygons: list of {'polygon_id', 'polygon'} records (the small side).
    index: optional prebuilt build_polygon_index() result — the polygon
    side is a dimension table built ONCE per job and reused across every
    page shard; pass it to avoid rebuilding per pipeline invocation.

    use_actors=False (default): stateless tasks on the shared worker pool
    with a per-worker index cache — no actor-pool spin-up; right when the
    per-batch work is small vs actor startup. use_actors=True: explicit
    actor pool — right when the index build itself must run remotely or
    per-actor state is heavy."""
    if index is None:
        index = build_polygon_index(polygons)
    try:
        import ray
        from ..state.broadcast import BroadcastRef
        is_ref = isinstance(index, (ray.ObjectRef, BroadcastRef))
    except Exception:
        is_ref = False
    if is_ref:
        # pre-broadcast by the caller (broadcast() once per job).  No
        # driver-side fetch: nothing below reads the index content —
        # JoinRefine derives the ancestor levels from the leaf id.
        ref = index
    else:
        ref = broadcast(index)
    # Materialize NO ancestor columns: JoinRefine derives cell_l{k}
    # from the leaf id per batch (parent() is 3 ALU ops/row) — cheaper
    # than writing + re-reading levels x 8 bytes/page through the pipe.
    # `text` is dead after the parse and is dropped there too.
    ds = geocoded_pages(pages_ds, levels=(), keep=("url", "text"),
                        drop=("text",))
    if use_actors:
        joined = ds.map_batches(JoinRefine, fn_constructor_args=(ref, exact),
                                batch_format="pyarrow", batch_size=65536,
                                concurrency=_auto_concurrency(concurrency),
                                num_cpus=1)
    else:
        from ..stages.join import make_join_refine_fn
        joined = ds.map_batches(make_join_refine_fn(ref, exact),
                                batch_format="pyarrow", batch_size=65536)
    if drop_uncontained:
        import pyarrow.compute as pc
        joined = joined.map_batches(
            lambda t: t.filter(pc.equal(t["contained"], True)),
            batch_format="pyarrow", zero_copy_batch=True)
    return joined


def tiles(pages_ds, level=12):
    """Tile assignment: (url, tile_id, token) at the given level."""
    ds = geocoded_pages(pages_ds, levels=(), drop=("text",))

    def project(batch: pa.Table) -> pa.Table:
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False)
        tile = ci.parent(leaf, level)
        tok = ci.to_token(tile)
        return pa.table({
            "url": batch["url"],
            "tile_id": pa.array(tile, pa.uint64()),
            "token": pa.array(tok, pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def tile_counts(pages_ds, level=12, shuffle=None):
    """Pages per tile: partial count inside map_batches, then combine.

    The partial pre-aggregation moves one row per (block, tile) — never one
    row per page. The combine has two paths:
      shuffle=False: STREAMING driver combine — partial blocks are folded
        into a running per-tile total as they arrive (iter_batches), so
        driver memory is bounded by the DISTINCT tile count, not by
        blocks x tiles (the VERDICT r1 explosion).  Safe while worldwide
        cardinality 6*4^level stays driver-sized.
      shuffle=True: groupby("tile_id") all-to-all — the scale path for
        fine levels where even the distinct-tile map outgrows one node.
    Default flips on cardinality: driver streaming-combine through
    level 12 (worldwide max 1e8 tiles, realistic distinct counts far
    lower and the fold is O(distinct)); shuffle from level 13 up."""

    def partial(batch: pa.Table) -> pa.Table:
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False)
        tile = ci.parent(leaf, level)
        u, c = np.unique(tile, return_counts=True)
        # int64 bit-view: uint64 keys above 2^63 fall back to pickled
        # Python objects inside Ray's shuffle (slow) — the view is
        # grouping-equivalent and converted back after the combine.
        return pa.table({"tile_id": pa.array(u.view(np.int64), pa.int64()),
                         "partial_count": pa.array(c, pa.int64())})

    ds = geocoded_pages(pages_ds, levels=(), drop=("text",))
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    if shuffle is None:
        # Worldwide tile cardinality 6*4^level crosses "driver-sized"
        # around level 10 (6.3M); above that the distinct-tile map (and
        # the O(distinct) per-block fold) stops being a driver job.
        shuffle = 6 * (4 ** level) > 2_000_000  # level >= 10
    if shuffle:
        # Bucketed vectorized combine: ~64 hash buckets, one C-path pandas
        # groupby per bucket. A raw groupby("tile_id").aggregate(...) would
        # run Ray's per-GROUP Python loop over millions of near-unique
        # tiles (pathological); per-bucket map_groups keeps the all-to-all
        # (skinny 16-byte rows) but does the real aggregation vectorized.
        n_buckets = 64

        def add_bucket(batch: pa.Table) -> pa.Table:
            t = batch["tile_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            b = ((t * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(64 - 6)).astype(np.int64) % n_buckets
            return batch.append_column("bucket", pa.array(b, pa.int64()))

        def combine(df: "pd.DataFrame") -> "pd.DataFrame":
            out = df.groupby("tile_id", as_index=False, sort=True).agg(
                n_pages=("partial_count", "sum"))
            out["tile_id"] = out["tile_id"].to_numpy(np.int64) \
                .view(np.uint64)
            return out

        import pandas as pd  # noqa: F401 (map_groups pandas batches)
        return partials.map_batches(
            add_bucket, batch_format="pyarrow",
            zero_copy_batch=True).groupby("bucket").map_groups(
            combine, batch_format="pandas").select_columns(
            ["tile_id", "n_pages"])
    # Streaming fold: one pandas merge per arriving block; memory is
    # O(distinct tiles) regardless of block count.
    import pandas as pd
    running = None
    for batch in partials.iter_batches(batch_format="pandas",
                                       batch_size=None):
        s = pd.Series(batch["partial_count"].to_numpy(np.int64),
                      index=batch["tile_id"].to_numpy(np.int64))
        s = s.groupby(level=0).sum()
        running = s if running is None else running.add(s, fill_value=0)
    if running is None:
        running = pd.Series([], dtype="int64")
    out = running.astype("int64").rename("n_pages").rename_axis(
        "tile_id").reset_index()
    out["tile_id"] = out["tile_id"].to_numpy(np.int64).view(np.uint64)
    return out.sort_values("tile_id").reset_index(drop=True)


def flagship(n_pages=5000, n_polygons=50, concurrency=None, seed=42):
    """entry() pipeline: synthetic pages at small scale -> join rows."""
    pages = pages_dataset(n_pages, seed=seed)
    polys = make_polygons(n_polygons, seed=seed)
    return spatial_join(pages, polys, concurrency=concurrency)


# ---------------------------------------------------------------------------
# Shuffle-join variant for a LARGE polygon side (documents the partitioned
# hash-join pattern; not the default because our polygon side is small).
# ---------------------------------------------------------------------------

def shuffle_join(pages_ds, polygons, join_level=12, num_salts=4):
    """Explode polygon coverings to level-k cells, hash-partition both sides
    on (cell, salt) via groupby, and refine per group.

    Salting: each page row gets salt = hash(url) % num_salts; polygon
    covering rows are replicated across all salts (small side), so hot
    cells (cities) split across num_salts groups. Partitioning key
    reused across stages: the level-k cell id."""
    import pandas as pd

    index = build_polygon_index(polygons, min_level=join_level,
                                max_level=join_level,
                                max_cells=64)
    # Build the exploded polygon-side table: (cell_l{k}, polygon_id, salt).
    rows = []
    lv = index["levels"].get(join_level)
    if lv is not None:
        for i, cell in enumerate(lv["ucells"].tolist()):
            for k in range(lv["starts"][i], lv["ends"][i]):
                for salt in range(num_salts):
                    rows.append((cell, int(lv["pids"][k]), salt,
                                 bool(lv["flags"][k])))
    poly_df = pd.DataFrame(rows, columns=["cell", "polygon_id", "salt",
                                          "interior"])
    polygons_by_id = {rec["polygon_id"]: rec["polygon"] for rec in polygons}
    ref = broadcast(polygons_by_id)

    ds = geocoded_pages(pages_ds, levels=(join_level,))

    def add_key(batch: pa.Table) -> pa.Table:
        cell = batch[f"cell_l{join_level}"]
        # Salt from the leaf id's fine-grained bits: deterministic and
        # splits the points WITHIN a hot cell across num_salts groups.
        leaf = batch["cell_id"].to_numpy(zero_copy_only=False)
        salt = ((leaf >> np.uint64(1)) % np.uint64(num_salts)).astype(np.int64)
        batch = batch.append_column("cell", cell)
        return batch.append_column("salt", pa.array(salt, pa.int64()))

    ds = ds.map_batches(add_key, batch_format="pyarrow")

    from ..core import coords as _coords
    from ..state.broadcast import fetch as _fetch

    def refine_group(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].iloc[0]
        salt = g["salt"].iloc[0]
        cand = poly_df[(poly_df["cell"] == cell) & (poly_df["salt"] == salt)]
        if cand.empty:
            return pd.DataFrame({"url": [], "polygon_id": [],
                                 "contained": []})
        polys = _fetch(ref)
        out = []
        x, y, z = _coords.latlng_to_xyz(g["lat"].to_numpy(),
                                        g["lon"].to_numpy())
        pts = np.stack([x, y, z], axis=1)
        for _, crow in cand.iterrows():
            if crow["interior"]:
                contained = np.ones(len(g), dtype=bool)
            else:
                contained = polys[crow["polygon_id"]].contains_points(pts)
            out.append(pd.DataFrame({
                "url": g["url"].to_numpy(),
                "polygon_id": crow["polygon_id"],
                "contained": contained}))
        return pd.concat(out, ignore_index=True)

    return ds.groupby(["cell", "salt"]).map_groups(refine_group,
                                                   batch_format="pandas")
