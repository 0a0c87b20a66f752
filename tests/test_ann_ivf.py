"""IVF ANN: full probing is exact (== brute force); partial probing
trades recall for pruning."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
class TestIVF:
    def _emb(self, sf_dir):
        import ray.data as rd
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def test_full_probe_matches_brute(self, sf_dir):
        from s2geometry_d_ray.stages.ann import ann_topk, ivf_topk
        brute = ann_topk(self._emb(sf_dir), query_ids=range(10), k=5)
        ivf = ivf_topk(self._emb(sf_dir), query_ids=range(10), k=5,
                       n_lists=8, nprobe=8)
        assert brute.values.tolist() == ivf.values.tolist()

    def test_partial_probe_recall(self, sf_dir):
        from s2geometry_d_ray.stages.ann import ann_topk, ivf_topk
        brute = ann_topk(self._emb(sf_dir), query_ids=range(10), k=5)
        ivf = ivf_topk(self._emb(sf_dir), query_ids=range(10), k=5,
                       n_lists=8, nprobe=3)
        bset = set(map(tuple, brute[["query_id", "vec_id"]].values))
        iset = set(map(tuple, ivf[["query_id", "vec_id"]].values))
        recall = len(bset & iset) / len(bset)
        # random embeddings are a worst case for IVF; still demand
        # meaningful recall at nprobe/n_lists = 3/8
        assert recall >= 0.3
        assert len(ivf) <= len(brute)


@pytest.mark.usefixtures("ray_session")
class TestIntLSHNearDups:
    """IntHyperplaneLSH near-dups: precision 1 (pairs are exact-cosine
    verified) and buckets are an exact, replayable computation."""

    def test_lsh_pairs_subset_of_exact(self, sf_dir):
        import ray.data as rd
        from s2geometry_d_ray.stages.ann import (
            _stack_embeddings, embedding_near_dups)

        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
        got = embedding_near_dups(ds, threshold=0.4, n_planes=4).to_pandas()

        tbl = ds.to_pandas()
        m = np.stack([np.asarray(v, dtype=np.float32)
                      for v in tbl["embedding"]]).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ids = tbl["vec_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        sel = sims[ii, jj] >= 0.4
        exact = set(zip(np.minimum(ids[ii[sel]], ids[jj[sel]]),
                        np.maximum(ids[ii[sel]], ids[jj[sel]])))
        lsh = set(zip(got["vec_id_a"], got["vec_id_b"]))
        assert lsh <= exact          # no false positives
        assert len(lsh) > 0          # finds something at this threshold

    def test_int_buckets_deterministic(self, sf_dir):
        import pyarrow.parquet as pq
        from s2geometry_d_ray.stages.ann import IntHyperplaneLSH

        batch = pq.read_table(f"{sf_dir}/embeddings.parquet")
        dim = len(batch["embedding"][0])
        a = IntHyperplaneLSH(dim, 4)(batch)["bucket"].to_numpy()
        b = IntHyperplaneLSH(dim, 4)(batch)["bucket"].to_numpy()
        assert (a == b).all()
        assert set(np.unique(a)) <= set(range(16))
