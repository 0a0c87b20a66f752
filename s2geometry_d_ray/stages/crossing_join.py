"""Crossing-edge join stage: which broadcast chain edges does each
query segment properly cross (S2CrossingEdgeQuery, CrossingType
INTERIOR, s2crossing_edge_query.d getCrossings semantics).

Ray shape: the chain-edge collection is broadcast once; each actor
builds its EdgeVectorIndex in __init__ and per batch runs the
candidate-bucket lookup + exact crossing_sign chain per query edge —
candidates are a handful of edges, so the exact predicate only runs on
the short list the index returns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.broadcast import fetch


class CrossingPairs:
    """__init__ once per actor: build the index over broadcast edges
    (with per-edge (n_nationkey, edge_j) labels).  __call__ per batch:
    customer keys -> (c_custkey, n_nationkey, edge_j) per properly
    crossed edge."""

    def __init__(self, edges_ref):
        from ..core.shapeindex import EdgeVectorIndex
        e = fetch(edges_ref)
        self.index = EdgeVectorIndex(e["a"], e["b"])
        self.nation = np.asarray(e["nation"], dtype=np.int64)
        self.edge_j = np.asarray(e["edge_j"], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core import coords
        from ..core.crossing import crossing_edges
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        clat = ((k * 3571) % 16000) / 100.0 - 80.0
        clon = ((k * 6689) % 35000) / 100.0 - 175.0
        ax, ay, az = coords.latlng_to_xyz(clat - 1.0, clon - 1.3)
        bx, by, bz = coords.latlng_to_xyz(clat + 1.0, clon + 1.3)
        A = np.stack([ax, ay, az], axis=1)
        B = np.stack([bx, by, bz], axis=1)
        ck, cn, cj = [], [], []
        for i in range(len(k)):
            eids = crossing_edges(self.index, A[i], B[i],
                                  brute_force=False)
            if len(eids):
                ck.append(np.full(len(eids), k[i], dtype=np.int64))
                cn.append(self.nation[eids])
                cj.append(self.edge_j[eids])
        if not ck:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "n_nationkey": pa.array([], pa.int64()),
                             "edge_j": pa.array([], pa.int64())})
        return pa.table({
            "c_custkey": pa.array(np.concatenate(ck), pa.int64()),
            "n_nationkey": pa.array(np.concatenate(cn), pa.int64()),
            "edge_j": pa.array(np.concatenate(cj), pa.int64()),
        })
