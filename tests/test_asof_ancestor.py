"""As-of join kernel + common-ancestor pair query: tie rules, key
isolation, and bucket-boundary invariance (the answers must not depend
on bucket sizing — that's the whole point of the boundary forwarding)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from s2geometry_d_ray.stages.asof import most_recent_right_at_or_before

SF = "/root/testdata/sf0.001"


def _match_pairs(key, ts, is_left, seq):
    key = np.asarray(key)
    ts = np.asarray(ts)
    is_left = np.asarray(is_left)
    seq = np.asarray(seq)
    order, match = most_recent_right_at_or_before(key, ts, is_left, seq)
    lm = (is_left[order] == 1) & (match >= 0)
    return dict(zip(seq[order[lm]].tolist(),
                    seq[order[match[lm]]].tolist()))


def test_asof_basic_most_recent():
    # key 1: rights at ts 1 (seq 10) and 5 (seq 11); lefts at ts 3, 7.
    got = _match_pairs(
        key=[1, 1, 1, 1], ts=[1, 5, 3, 7],
        is_left=[0, 0, 1, 1], seq=[10, 11, 20, 21])
    assert got == {20: 10, 21: 11}


def test_asof_equal_ts_right_visible_max_seq_wins():
    # Two rights share the left's exact ts: both visible, max seq wins.
    got = _match_pairs(
        key=[7, 7, 7], ts=[4, 4, 4],
        is_left=[0, 0, 1], seq=[1, 2, 50])
    assert got == {50: 2}


def test_asof_no_right_before_and_key_isolation():
    # key 1's left precedes its only right (no match); key 2's right
    # must never leak to key 1 even though it is earlier in time.
    got = _match_pairs(
        key=[2, 1, 1], ts=[0, 2, 3],
        is_left=[0, 1, 0], seq=[5, 20, 6])
    assert got == {}


def test_asof_unsorted_input_and_multiple_keys():
    rng = np.random.default_rng(7)
    n = 500
    key = rng.integers(0, 9, n)
    ts = rng.integers(0, 40, n)
    is_left = rng.integers(0, 2, n)
    seq = rng.permutation(n)
    got = _match_pairs(key, ts, is_left, seq)
    # brute-force oracle
    want = {}
    for i in range(n):
        if is_left[i] != 1:
            continue
        best = None
        for j in range(n):
            if is_left[j] == 0 and key[j] == key[i] and ts[j] <= ts[i]:
                if best is None or (ts[j], seq[j]) > (ts[best], seq[best]):
                    best = j
        if best is not None:
            want[int(seq[i])] = int(seq[best])
    assert got == want


def test_events_asof_bucket_invariance(ray_session):
    from s2geometry_d_ray.pipelines.relational import events_asof
    a = events_asof(SF, n_buckets=3)
    b = events_asof(SF, n_buckets=64)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_common_ancestor_bucket_boundary_invariance(ray_session):
    from s2geometry_d_ray.pipelines.geo_queries import geo_common_ancestor
    # bucket_keys=7 forces many cross-bucket (k, k+1) pairs through the
    # boundary-forwarding path; results must match the big-bucket run.
    a = geo_common_ancestor(SF, bucket_keys=7)
    b = geo_common_ancestor(SF, bucket_keys=100000)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert a["ancestor_level"].between(-1, 30).all()
