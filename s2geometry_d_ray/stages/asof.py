"""As-of join: match each LEFT row to the most recent RIGHT row at or
before it, per key — the event-alignment join a training-data pipeline
needs for feature backfill (no s2geometry-d analogue; semantics follow
the standard ASOF JOIN made deterministic: at equal timestamps the
right row is visible to the left row, and ties among right rows break
by the highest sequence number).

Scale shape (ray_guide "bucketed shuffle"): both sides are hash-bucketed
by key, ONE groupby(bucket) shuffle colocates the full history of every
key, and one vectorized multi-key merge per bucket does the matching
(lexsort + maximum.accumulate — no per-key Python loop, no driver hop).
Partitioning assumption: a bucket holds ALL rows of each of its keys
(guaranteed by the groupby); bucket count bounds the largest single
merge, so size n_buckets to cluster parallelism, and salt a pathological
hot key by splitting its RIGHT history into epochs if one user ever
outgrows a worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_hash_bucket(batch: pa.Table, key: str, n_buckets: int) -> pa.Table:
    """Append an int64 `bucket` column = multiplicative hash of `key`,
    shared by every bucketed stage so join sides colocate.  The mixed
    64-bit hash is reduced with a plain modulo: uniform for ANY
    n_buckets (a top-bits-then-mod fold skews non-power-of-two counts
    up to 2x), bias ~ n_buckets/2^64."""
    k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64) \
        .view(np.uint64)
    with np.errstate(over="ignore"):
        h = k * np.uint64(0x9E3779B97F4A7C15)
    b = (h % np.uint64(n_buckets)).astype(np.int64)
    return batch.append_column("bucket", pa.array(b, pa.int64()))


def most_recent_right_at_or_before(key, ts, is_left, seq):
    """Vectorized as-of matcher over one colocated bucket.

    Sorts rows by (key, ts, is_left, seq) — right rows (is_left == 0)
    sort BEFORE left rows at equal ts, so "at or before" includes equal
    timestamps, and among equal-ts right rows the largest seq wins.

    Returns (order, match): `order` is the sort permutation; `match[p]`
    is, for each sorted position p, the sorted position of the most
    recent right row at or before p with the SAME key, or -1.

    The trick: a global maximum.accumulate over right positions is
    key-safe because the sort is key-major — if the latest right row
    at or before p belongs to an earlier key, the current key has no
    right row yet, and the key-equality check rejects it.
    """
    key = np.asarray(key)
    is_left = np.asarray(is_left)
    n = len(key)
    order = np.lexsort((np.asarray(seq), is_left, np.asarray(ts), key))
    k_s = key[order]
    right_s = is_left[order] == 0
    idx = np.arange(n, dtype=np.int64)
    last_right = np.maximum.accumulate(np.where(right_s, idx, -1))
    valid = (last_right >= 0) & (k_s[np.maximum(last_right, 0)] == k_s)
    return order, np.where(valid, last_right, -1)
