"""The two distributed exact-verify plans must agree pair-for-pair.

minhash_lsh_pairs verifies LSH candidates through
_verify_pairs_distributed (one-shuffle pair-join); for exotic id
ranges it falls back to _exact_jaccard_pairs(cand=...) (restricted
bucketed inverted index).  A divergence between the two would make the
fallback silently change results, so pin their equivalence on the real
documents table and a candidate set that includes BELOW-threshold
pairs (rejection must agree too)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_verify_paths_agree(sf_dir):
    from s2geometry_d_ray.pipelines import training_data as T
    from s2geometry_d_ray.stages import text as tx

    bands = T._docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.minhash_bands_fn(), batch_format="pyarrow", batch_size=8192)
    cand = T._lsh_candidate_pairs(bands)
    assert not cand.empty, "sf tables are seeded with near-dups"

    # Add sure-to-fail candidates (arbitrary distinct doc pairs) so the
    # equality also covers rejection, not just acceptance.
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    ids = sorted(docs["doc_id"].tolist())[:12]
    extra = pd.DataFrame({
        "doc_a": [min(a, b) for a, b in zip(ids[:6], ids[6:])],
        "doc_b": [max(a, b) for a, b in zip(ids[:6], ids[6:])]})
    cand_all = pd.concat(
        [cand[["doc_a", "doc_b"]], extra], ignore_index=True) \
        .drop_duplicates().reset_index(drop=True)

    main = T._verify_pairs_distributed(sf_dir, cand_all,
                                       threshold_bps=5000)
    fallback = T._exact_jaccard_pairs(sf_dir, threshold_bps=5000,
                                      cand=cand_all)

    for df in (main, fallback):
        df.reset_index(drop=True, inplace=True)
    pd.testing.assert_frame_equal(
        main.astype("int64"), fallback.astype("int64"))
    # and both reject the manufactured non-dup pairs
    kept = set(zip(main["doc_a"], main["doc_b"]))
    lsh_only = set(zip(cand["doc_a"], cand["doc_b"]))
    assert kept <= lsh_only
