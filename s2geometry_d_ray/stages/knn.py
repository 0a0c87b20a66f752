"""kNN actor-pool stage: each actor holds a PointIndex built once from a
broadcast point table; batches of query points map to top-k neighbor rows.

Cross-partition kNN at scale (SURVEY.md §3.4): per-partition top-k inside
the actors, then a global per-query merge — the final merge input is only
(queries x k x partitions) rows, a tiny table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.knn import ClosestPointQuery, PointIndex
from ..state.broadcast import broadcast, fetch


def build_point_index_from_latlng(lat_deg, lon_deg, data_ids=None):
    return PointIndex.from_latlng(lat_deg, lon_deg, data_ids)


class KnnActor:
    """__init__ once per actor: fetch the broadcast index.
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
        out_q, out_n, out_d, out_r = [], [], [], []
        q = ClosestPointQuery(self.index, max_points=self.k,
                              max_distance_chord2=self.max_distance2,
                              use_brute_force=self.brute)
        for i in range(len(qid)):
            d2, data = q.find_closest_points((x[i], y[i], z[i]))
            out_q.extend([int(qid[i])] * len(data))
            out_n.extend(data.tolist())
            out_d.extend(d2.tolist())
            out_r.extend(range(1, len(data) + 1))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "distance2": pa.array(out_d, pa.float64()),
            "rank": pa.array(out_r, pa.int64()),
        })


def knn_pipeline(points_table, queries_ds, k=5, concurrency=2):
    """points_table: dict with lat/lon/ids arrays (the index side, built
    once on the driver and broadcast); queries_ds: Dataset of
    (query_id, lat, lon)."""
    index = PointIndex.from_latlng(points_table["lat"], points_table["lon"],
                                   points_table.get("ids"))
    ref = broadcast(index)
    return queries_ds.map_batches(
        KnnActor, fn_constructor_args=(ref, k),
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency, num_cpus=1)
