"""HyperLogLog sketch: register math vs a bit-twiddling oracle, merge
(batch-size) invariance, and estimate accuracy at several cardinalities."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from s2geometry_d_ray.stages.hll import (M_DEFAULT, hash_u64, hll_estimate,
                                         registers_rho)

SF = "/root/testdata/sf0.001"


def test_registers_rho_matches_bit_oracle():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2 ** 63, 20000, dtype=np.int64).view(np.uint64)
    h[:5] = [0, 1, 255, 256, (1 << 64) - 1]
    reg, rho = registers_rho(h)
    for i in range(len(h)):
        x = int(h[i]) >> 8
        assert reg[i] == int(h[i]) & 0xFF
        assert rho[i] == 57 - x.bit_length()


@pytest.mark.parametrize("n", [100, 5000, 200000])
def test_estimate_accuracy(n):
    reg, rho = registers_rho(hash_u64(np.arange(n, dtype=np.int64)))
    acc = np.zeros(M_DEFAULT, dtype=np.int64)
    np.maximum.at(acc, reg, rho)
    nz = np.nonzero(acc)[0]
    est = hll_estimate(nz, acc[nz])
    # 256 registers -> ~6.5% std error; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_duplicates_do_not_move_the_sketch():
    keys = np.arange(1000, dtype=np.int64)
    reg1, rho1 = registers_rho(hash_u64(keys))
    reg2, rho2 = registers_rho(hash_u64(np.repeat(keys, 7)))
    acc1 = np.zeros(M_DEFAULT, np.int64)
    acc2 = np.zeros(M_DEFAULT, np.int64)
    np.maximum.at(acc1, reg1, rho1)
    np.maximum.at(acc2, reg2, rho2)
    assert (acc1 == acc2).all()


def test_orders_sketch_merge_invariance_and_estimate(ray_session):
    import duckdb

    from s2geometry_d_ray.pipelines.relational import orders_distinct_sketch
    out = orders_distinct_sketch(SF)
    est = hll_estimate(out["register"].to_numpy(), out["rho"].to_numpy())
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"'{SF}/orders.parquet'").fetchone()[0]
    assert abs(est - exact) / exact < 0.26
    # merging partials from a different block split must be identical
    import ray.data as rd
    from ray.data.aggregate import Max

    from s2geometry_d_ray.stages.hll import hll_partial_kernel
    tiny = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"]) \
        .repartition(13).map_batches(
            hll_partial_kernel("o_custkey"), batch_format="pyarrow",
            batch_size=37).groupby("register").aggregate(
            Max("rho", alias_name="rho")).to_pandas() \
        .sort_values("register").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, tiny)


def test_bottomk_block_split_invariance(ray_session):
    """The per-block partial bottom-k argument (a globally-bottom-k hash
    is bottom-k in every block containing it) under a forced split."""
    from s2geometry_d_ray.pipelines.training_data import docs_bottomk_sample
    a = docs_bottomk_sample(SF)
    import ray.data as rd
    import pyarrow.parquet as pq
    # brute oracle in-process
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    hv = hash_u64(t["text"].to_numpy(zero_copy_only=False))
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    import pandas as pd_
    df = pd_.DataFrame({"hv": hv, "doc_id": did}).groupby(
        "hv", as_index=False).min().sort_values("hv").head(32)
    assert a["h64"].to_numpy().astype(np.int64).view(np.uint64).tolist() \
        == df["hv"].tolist()
    assert a["doc_id"].tolist() == df["doc_id"].tolist()


def test_registers_rho_generalizes_m():
    import pytest
    from s2geometry_d_ray.stages.hll import _reg_bits
    rng = np.random.default_rng(11)
    h = rng.integers(0, 2 ** 63, 5000, dtype=np.int64).view(np.uint64)
    for m in (2, 64, 1024):
        bits = _reg_bits(m)
        reg, rho = registers_rho(h, m)
        for i in range(0, len(h), 97):
            x = int(h[i]) >> bits
            assert reg[i] == int(h[i]) & (m - 1)
            assert rho[i] == (64 - bits) + 1 - x.bit_length()
    with pytest.raises(ValueError):
        registers_rho(h, 100)   # not a power of two


def test_hash_u64_null_guard():
    a = hash_u64(np.array(["x", None, ""], dtype=object))
    assert a[1] == a[2]         # None hashes as empty string
