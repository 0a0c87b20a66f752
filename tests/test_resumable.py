"""Checkpoint-resume: a second run skips completed partitions and the
combined output equals a single-shot run."""

from __future__ import annotations

import json
import os
import shutil

import pytest


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_completed(tmp_path):
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.resumable import run_resumable_join
    from s2geometry_d_ray.sources.polygons import make_polygons
    from s2geometry_d_ray.state import lineage

    out = str(tmp_path / "join_out")
    polys = make_polygons(6, seed=42)
    written, skipped, manifest = run_resumable_join(
        out, n_pages=3000, polygons=polys, shard_rows=1000)
    assert len(written) == 3 and skipped == []
    assert manifest["n_partitions"] == 3

    # Simulate a failure: delete one partition, rerun.
    shutil.rmtree(os.path.join(out, "part-00001"))
    written2, skipped2, manifest2 = run_resumable_join(
        out, n_pages=3000, polygons=polys, shard_rows=1000)
    assert [r["partition_id"] for r in written2] == [1]
    assert skipped2 == [0, 2]
    assert manifest2["n_partitions"] == 3

    # Lineage records carry fingerprints + metrics.
    with open(lineage.lineage_path(out, 1)) as fh:
        rec = json.load(fh)
    assert rec["input_fingerprint"] == lineage.input_fingerprint(
        {"kind": "synthetic_pages", "seed": 42, "row_range": [1000, 2000]})
    assert rec["metrics"]["rows_in"] == 1000

    # Combined output equals a fresh single-shot run.  Partitions are
    # directories of worker-written parquet files (streamed, not routed
    # through the driver).
    total = 0
    for i in range(3):
        pdir = os.path.join(out, f"part-{i:05d}")
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert files
        total += sum(pq.read_table(os.path.join(pdir, f)).num_rows
                     for f in files)
    out2 = str(tmp_path / "oneshot")
    w3, _, m3 = run_resumable_join(out2, n_pages=3000, polygons=polys,
                                   shard_rows=3000)
    assert m3["total_rows"] == total
