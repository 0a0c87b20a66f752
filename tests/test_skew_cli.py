"""Hot-cell detection + salting, and the job CLI smoke test."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_hot_cell_detection_and_salting():
    from s2geometry_d_ray.pipelines.spatial_join import geocoded_pages
    from s2geometry_d_ray.sources.pages import pages_dataset
    from s2geometry_d_ray.stages.skew import detect_hot_cells, salt_for_keys

    # Detect at level 10 where each synthetic city cap concentrates into
    # a handful of cells (level-12 cells are finer than the cap radius).
    ds = geocoded_pages(pages_dataset(20000), levels=(10,))
    hot, counts = detect_hot_cells(ds, level=10, hot_fraction=0.004)
    # The synthetic skew mixture puts ~30% of pages into 5 city caps:
    # those caps' level-12 cells must be detected as hot.
    assert len(hot) >= 3
    hot_share = counts.set_index("cell").loc[hot, "n"].sum() / \
        counts["n"].sum()
    assert hot_share > 0.10

    # Salting: hot keys spread across salts, cold keys stay at salt 0.
    sample = ds.take_batch(8192, batch_format="pyarrow")
    cells = sample["cell_l10"].to_numpy(zero_copy_only=False)
    leafs = sample["cell_id"].to_numpy(zero_copy_only=False)
    salt = salt_for_keys(cells, leafs, hot, num_salts=8)
    pos = np.searchsorted(hot, cells)
    posc = np.minimum(pos, len(hot) - 1)
    hot_mask = hot[posc] == cells
    assert (salt[~hot_mask] == 0).all()
    if hot_mask.sum() > 100:
        # hot rows use >1 distinct salt (they actually spread)
        assert len(np.unique(salt[hot_mask])) >= 4


def test_cli_resumable(tmp_path):
    import json
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "scripts/run_join.py", "--n-pages", "2000",
         "--n-polygons", "6", "--out", str(tmp_path / "out"),
         "--shard-rows", "1000", "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["mode"] == "resumable"
    assert rec["partitions_written"] == [0, 1]
    # Second run: everything skipped.
    out2 = subprocess.run(
        [sys.executable, "scripts/run_join.py", "--n-pages", "2000",
         "--n-polygons", "6", "--out", str(tmp_path / "out"),
         "--shard-rows", "1000", "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    rec2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert rec2["partitions_written"] == []
    assert rec2["partitions_skipped"] == [0, 1]
