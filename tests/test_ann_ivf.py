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
