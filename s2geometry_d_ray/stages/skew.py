"""Hot-key (skewed cell) detection for salted repartitioning.

SURVEY.md §4: persistent hot cells (cities) need salting; transient
imbalance is absorbed by streaming backpressure. This stage implements
the cheap detection pre-pass: per-block partial counts of the join key ->
tiny combine -> keys above a frequency threshold.

The detected hot set is broadcast; the shuffle join then splits hot keys
into `num_salts` sub-keys (pages side: salt from leaf-id bits; polygon
side: replicated across salts)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def detect_hot_cells(encoded_pages_ds, level=12, hot_fraction=0.001,
                     sample_fraction=None):
    """Returns (hot_cells_sorted, counts_df). A cell is hot when it holds
    more than hot_fraction of all pages. Optionally subsample blocks for
    a sketch-style estimate (at 100 TB a 1% sample suffices because hot
    cells are, by definition, massively over-represented)."""
    col = f"cell_l{level}"

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch[col].to_numpy(zero_copy_only=False)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u, pa.uint64()),
                         "n": pa.array(c, pa.int64())})

    ds = encoded_pages_ds
    if sample_fraction:
        ds = ds.random_sample(sample_fraction, seed=7)
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    counts = parts.groupby("cell", as_index=False)["n"].sum()
    total = counts["n"].sum()
    hot = counts.loc[counts["n"] > hot_fraction * total, "cell"]
    return np.sort(hot.to_numpy(dtype=np.uint64)), counts


def salt_for_keys(cell_col, leaf_col, hot_cells_sorted, num_salts=8):
    """Vectorized salt assignment: hot cells get a leaf-bit salt in
    [0, num_salts); cold cells salt 0 (no replication cost)."""
    cells = np.asarray(cell_col, dtype=np.uint64)
    leafs = np.asarray(leaf_col, dtype=np.uint64)
    pos = np.searchsorted(hot_cells_sorted, cells)
    posc = np.minimum(pos, max(0, len(hot_cells_sorted) - 1))
    is_hot = len(hot_cells_sorted) > 0 and True
    hot_mask = (hot_cells_sorted[posc] == cells) if is_hot else \
        np.zeros(len(cells), dtype=bool)
    salt = np.where(hot_mask,
                    ((leafs >> np.uint64(1))
                     % np.uint64(num_salts)).astype(np.int64),
                    0)
    return salt
