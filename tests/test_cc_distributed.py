"""Distributed connected-components fallback (_cc_label_propagation):
must match driver union-find (and therefore the recursive-CTE oracle)
on real near-dup pairs and on adversarial synthetic graphs, including
a long chain that needs many propagation rounds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from s2geometry_d_ray.pipelines.training_data import (
    _cc_clusters, _cc_label_propagation, _cc_union_find,
    near_dup_pairs_exact)


def _assert_same(pairs, max_rounds=64):
    want = _cc_union_find(pairs).sort_values("doc_id").reset_index(
        drop=True)
    got = _cc_label_propagation(pairs, max_rounds=max_rounds)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_union_find_on_real_pairs(sf_dir):
    pairs = near_dup_pairs_exact(sf_dir)
    assert len(pairs) > 0
    _assert_same(pairs)


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_chain_and_forest():
    # chain 0-1-2-...-19 (worst-case diameter), two triangles, isolated
    # pair, non-contiguous ids
    chain = [(i, i + 1) for i in range(19)]
    extra = [(100, 103), (103, 107), (100, 107), (200, 201),
             (300, 999), (999, 301), (301, 300)]
    pairs = pd.DataFrame(
        {"doc_a": [a for a, _ in chain + extra],
         "doc_b": [b for _, b in chain + extra]}).astype("int64")
    _assert_same(pairs)


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_random_graph():
    rng = np.random.default_rng(13)
    a = rng.integers(0, 400, 600)
    b = rng.integers(0, 400, 600)
    keep = a != b
    pairs = pd.DataFrame({
        "doc_a": np.minimum(a[keep], b[keep]).astype("int64"),
        "doc_b": np.maximum(a[keep], b[keep]).astype("int64"),
    }).drop_duplicates()
    _assert_same(pairs)


@pytest.mark.usefixtures("ray_session")
def test_cc_clusters_threshold_forces_distributed_path(sf_dir):
    pairs = near_dup_pairs_exact(sf_dir)
    # driver_max=0 forces the distributed path through the public
    # dispatcher; identical output to the default driver path.
    got = _cc_clusters(pairs, driver_max=0)
    want = _cc_clusters(pairs).sort_values("doc_id").reset_index(
        drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want)


def test_label_propagation_empty_and_negative():
    out = _cc_label_propagation(pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64")}))
    assert len(out) == 0 and list(out.columns) == ["doc_id", "cluster_id"]
    with pytest.raises(ValueError):
        _cc_label_propagation(pd.DataFrame(
            {"doc_a": [-1], "doc_b": [2]}).astype("int64"))
