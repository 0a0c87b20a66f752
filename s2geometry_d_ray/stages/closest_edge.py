"""Closest-edge stateful stage: distance from a point stream to a
broadcast edge collection through the indexed best-first search.

The S2ClosestEdgeQuery shape at dataset scale (SURVEY.md §3.4 pattern):
the edge collection is the small side — broadcast ONCE via ray.put —
and every map worker builds its EdgeVectorIndex in __init__ (once per
worker via stages/stateful.py, not per batch).  Each batch is answered with
EdgeVectorIndex.closest_edge_batch (core/shapeindex.py): a vectorized
bucket-candidate pass for an achievable upper bound, then the exact
best-first traversal warm-started at that bound
(s2closest_edge_query_base.d:380-750 semantics, batched).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.broadcast import broadcast, fetch


def broadcast_edges(edge_a, edge_b):
    """ray.put the edge arrays once; returns the object ref."""
    return broadcast({
        "a": np.asarray(edge_a, dtype=np.float64),
        "b": np.asarray(edge_b, dtype=np.float64),
    })


class ClosestEdgeDistance:
    """__init__ once per worker: fetch broadcast edges, build the bucket
    index.  __call__ per batch: (doc_id, lat, lon) -> (doc_id, d2)
    where d2 is the squared chord distance to the nearest edge,
    rounded to 12 decimals half-AWAY from zero (DuckDB ROUND semantics;
    d2 >= 0 so floor(x*1e12 + 0.5)/1e12 is exactly that).

    furthest=True computes the FURTHEST-edge distance
    (S2FurthestEdgeQuery semantics, s2furthest_edge_query.d) through
    the exact antipode identity: |p-x|^2 + |-p-x|^2 = 2|p|^2 + 2|x|^2
    = 4 for unit vectors, so max over edge points x of |p-x|^2 =
    4 - min over x of |-p-x|^2 — the same indexed closest-edge search
    run at the antipode (negation and the 4-minus are single exact /
    correctly-rounded float ops, so the replayed SQL stays
    bit-identical)."""

    def __init__(self, edges_ref, round_digits=12, furthest=False):
        from ..core.shapeindex import EdgeVectorIndex
        e = fetch(edges_ref)
        self.index = EdgeVectorIndex(e["a"], e["b"])
        self.scale = 10.0 ** round_digits
        self.furthest = furthest

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core import coords
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        p = np.stack([x, y, z], axis=1)
        if self.furthest:
            d2, _eid = self.index.closest_edge_batch(-p)
            d2 = 4.0 - d2
        else:
            d2, _eid = self.index.closest_edge_batch(p)
        return pa.table({
            "doc_id": pa.array(did.astype(np.int64), pa.int64()),
            "d2": pa.array(np.floor(d2 * self.scale + 0.5) / self.scale,
                           pa.float64()),
        })
