"""kNN stateful stage: each map worker holds a PointIndex built once
from a broadcast point table (stages/stateful.py task pattern); batches
of query points map to top-k neighbor rows.

Cross-partition kNN at scale (SURVEY.md §3.4): per-partition top-k inside
the workers, then a global per-query merge — the final merge input is only
(queries x k x partitions) rows, a tiny table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.knn import ClosestPointQuery, PointIndex
from ..state.broadcast import broadcast, fetch


def build_point_index_from_latlng(lat_deg, lon_deg, data_ids=None):
    return PointIndex.from_latlng(lat_deg, lon_deg, data_ids)


class KnnActor:
    """__init__ once per worker: fetch the broadcast index.
    __call__ per batch: queries (query_id, lat, lon [, max_points,
    max_distance]) -> rows (query_id, neighbor_id, distance2, rank)."""

    def __init__(self, index_ref, k=5, max_distance_chord2=None,
                 use_brute_force=False):
        self.index = fetch(index_ref)
        self.k = k
        self.max_distance2 = max_distance_chord2
        self.brute = use_brute_force

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core import coords
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        qid = batch["query_id"].to_numpy(zero_copy_only=False)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        q = ClosestPointQuery(self.index, max_points=self.k,
                              max_distance_chord2=self.max_distance2,
                              use_brute_force=self.brute)
        # One vectorized call over the whole batch (identical results
        # to the per-query scalar search; ~27x queries/sec).
        qi, d2, data, rank = q.find_closest_points_batch(
            np.stack([x, y, z], axis=1))
        return pa.table({
            "query_id": pa.array(qid[qi].astype(np.int64), pa.int64()),
            "neighbor_id": pa.array(data, pa.int64()),
            "distance2": pa.array(d2, pa.float64()),
            "rank": pa.array(rank, pa.int64()),
        })


class PartitionKnn:
    """Partitioned-corpus kNN stage (SURVEY.md §3.4, the Common-Crawl
    shape where the CORPUS is the index side): each task builds a
    PointIndex over ONE corpus block and answers every broadcast query
    against it with the cell-pruned best-first search, emitting
    per-(query, partition) top-k partial rows.  No driver
    materialization of the corpus anywhere."""

    def __init__(self, queries_ref, k=5):
        from ..state.broadcast import fetch
        q = fetch(queries_ref)
        self.qid = np.asarray(q["query_id"], dtype=np.int64)
        self.qxyz = np.asarray(q["xyz"], dtype=np.float64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        index = PointIndex.from_latlng(lat, lon, ids)
        q = ClosestPointQuery(index, max_points=self.k)
        qi, d2, data, _rank = q.find_closest_points_batch(self.qxyz)
        return pa.table({
            "query_id": pa.array(self.qid[qi], pa.int64()),
            "neighbor_id": pa.array(data, pa.int64()),
            "distance2": pa.array(d2, pa.float64()),
        })


def knn_partitioned(corpus_ds, query_ids, query_lat, query_lon, k=5,
                    concurrency=None):
    """corpus_ds: Dataset with (doc_id, lat, lon) — the BIG side, never
    materialized on the driver.  Per-block PointIndex + partial top-k
    inside tasks, then a groupby(query_id) merge over the tiny
    (queries x k x blocks) partial table."""
    import pandas as pd
    import ray

    from ..core import coords
    x, y, z = coords.latlng_to_xyz(np.asarray(query_lat, np.float64),
                                   np.asarray(query_lon, np.float64))
    from ..state.broadcast import broadcast
    from .stateful import stateful_map_batches
    qref = broadcast({"query_id": np.asarray(query_ids, np.int64),
                      "xyz": np.stack([x, y, z], axis=1)})
    parts = stateful_map_batches(
        corpus_ds, PartitionKnn, (qref, k),
        batch_format="pyarrow", batch_size=None, num_cpus=1,
        concurrency=concurrency)

    # groupby(query_id) final merge: top-k with (d2, id) tiebreak.
    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["distance2", "neighbor_id"]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return parts.groupby("query_id").map_groups(topk,
                                                batch_format="pandas")


def knn_pipeline(points_table, queries_ds, k=5, concurrency=None):
    """points_table: dict with lat/lon/ids arrays (the index side, built
    once on the driver and broadcast); queries_ds: Dataset of
    (query_id, lat, lon)."""
    index = PointIndex.from_latlng(points_table["lat"], points_table["lon"],
                                   points_table.get("ids"))
    from .stateful import stateful_map_batches
    ref = broadcast(index)
    return stateful_map_batches(
        queries_ds, KnnActor, (ref, k),
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency, num_cpus=1)
