"""Similarity search over an embedding column (list<float>).

- BruteForceTopK: actor-pool stage; the query matrix is broadcast once
  (ray.put) and each batch does ONE numpy matmul against it -> per-batch
  partial top-k; a final tiny sort/limit merges partials. Scales as
  map_batches over the corpus with no shuffle of the corpus itself.
- LSH bucketed variant: random-hyperplane signatures -> groupby bucket ->
  exact rerank within buckets (the scale path when the query side is big).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.broadcast import fetch


def _stack_embeddings(col):
    """Arrow list<float> column -> (n, d) float32 matrix, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(col)
    return flat.reshape(n, -1)


def normalize_rows(m):
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Per-batch partial top-k cosine candidates.

    queries_ref: broadcast (q, d) float32 matrix (L2-normalized) +
    parallel int64 query ids. Emits (query_id, vec_id, score) rows for the
    per-batch top-k; final global top-k = groupby(query_id) -> sort ->
    limit on a tiny table."""

    def __init__(self, queries_ref, k=5, exclude_self=True):
        q = fetch(queries_ref)
        self.qids = q["query_ids"]
        self.qmat = normalize_rows(q["matrix"].astype(np.float32))
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = normalize_rows(_stack_embeddings(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.qmat @ vecs.T                     # (q, n) one GEMM
        if self.exclude_self:
            mask = self.qids[:, None] == ids[None, :]
            sims = np.where(mask, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            cols = part[qi]
            out_q.extend([int(self.qids[qi])] * len(cols))
            out_v.extend(ids[cols].tolist())
            out_s.extend(sims[qi, cols].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def ann_topk(embeddings_ds, query_ids, k=5, concurrency=2):
    """Full pipeline: broadcast queries -> partial top-k per batch ->
    global top-k per query (tiny final sort). Returns a pandas DataFrame
    (query_id, vec_id, rank) with rank 1..k by (score desc, vec_id asc)."""
    import pandas as pd

    from ..state.broadcast import broadcast

    import pyarrow.compute as pc
    qarr = pa.array(sorted(int(v) for v in query_ids), pa.int64())
    qtbl = embeddings_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=qarr)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    qmat = np.stack([np.asarray(v, dtype=np.float32)
                     for v in qtbl["embedding"]])
    order = np.argsort(qtbl["vec_id"].to_numpy())
    ref = broadcast({"query_ids": qtbl["vec_id"].to_numpy()[order],
                     "matrix": qmat[order]})
    partials = embeddings_ds.map_batches(
        BruteForceTopK, fn_constructor_args=(ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency,
        num_cpus=1).to_pandas()
    partials.sort_values(["query_id", "score", "vec_id"],
                         ascending=[True, False, True], inplace=True)
    top = partials.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank"]].reset_index(drop=True)


class HyperplaneLSH:
    """Random-hyperplane signature stage: vec -> bucket id (int64).

    groupby('bucket') then exact rerank inside buckets = the scale path
    for embedding near-dup detection."""

    def __init__(self, dim, n_planes=16, seed=11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _stack_embeddings(batch["embedding"])
        proj = vecs @ self.planes > 0
        weights = (1 << np.arange(proj.shape[1], dtype=np.int64))
        bucket = (proj.astype(np.int64) * weights[None, :]).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def embedding_near_dups(embeddings_ds, threshold=0.95, n_planes=12,
                        concurrency=2):
    """Embedding-cosine near-dup pairs via LSH buckets + exact rerank.

    Returns pandas (vec_id_a, vec_id_b, score) with vec_id_a < vec_id_b
    and cosine >= threshold. Pairs are only compared within a bucket, so
    recall < 1 by design (document the tradeoff); exact verification
    removes false positives."""
    import pandas as pd
    first = embeddings_ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])

    ds = embeddings_ds.map_batches(
        HyperplaneLSH, fn_constructor_args=(dim, n_planes),
        batch_format="pyarrow", batch_size=8192, concurrency=concurrency)

    def rerank(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [],
                                 "score": []})
        m = normalize_rows(np.stack([np.asarray(v, dtype=np.float32)
                                     for v in group["embedding"]]))
        ids = group["vec_id"].to_numpy()
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        sel = sims[ii, jj] >= threshold
        a = np.minimum(ids[ii[sel]], ids[jj[sel]])
        b = np.maximum(ids[ii[sel]], ids[jj[sel]])
        return pd.DataFrame({"vec_id_a": a, "vec_id_b": b,
                             "score": np.round(sims[ii[sel], jj[sel]], 6)})

    return ds.groupby("bucket").map_groups(rerank, batch_format="pandas")
