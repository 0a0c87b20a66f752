"""Multimodal plumbing kernels: stub decode determinism, resize plan
integer math, frame-sample row expansion.  Pure-kernel tests (no Ray);
the end-to-end actor chains are covered by test_queries_oracle.py via
multimodal_decode_demo / multimodal_resize_plan / multimodal_frame_plan."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from s2geometry_d_ray.stages.multimodal import (ImageDecode, Resize,
                                                frame_sample_plan)


def test_decode_stub_deterministic():
    dec = ImageDecode()
    t = pa.table({"payload": pa.array([b"abc", None, b"xyz"], pa.binary())})
    out = dec(t)
    assert out["decode_ok"].to_pylist() == [True, False, True]
    h = hashlib.md5(b"abc").digest()
    assert out["width"][0].as_py() == 64 + h[0] % 192
    assert out["height"][0].as_py() == 64 + h[1] % 192
    assert out["channels"].to_pylist() == [3, 0, 3]


def test_resize_plan_exact_math():
    r = Resize(max_side=128)
    w = np.array([64, 255, 200, 100, 128], np.int32)
    h = np.array([64, 100, 240, 250, 128], np.int32)
    ow, oh = r.plan(w, h)
    # identity when inside the box
    assert (ow[0], oh[0]) == (64, 64)
    assert (ow[4], oh[4]) == (128, 128)
    # longest side clamps to max_side, other side floors
    assert (ow[1], oh[1]) == (128, (100 * 128) // 255)
    assert (ow[2], oh[2]) == ((200 * 128) // 240, 128)
    assert (ow[3], oh[3]) == ((100 * 128) // 250, 128)
    assert ow.dtype == np.int32 and oh.dtype == np.int32


def test_resize_plan_never_zero_never_upscales():
    rng = np.random.default_rng(7)
    w = rng.integers(1, 4096, 1000).astype(np.int64)
    h = rng.integers(1, 4096, 1000).astype(np.int64)
    ow, oh = Resize(max_side=128).plan(w, h)
    assert (ow >= 1).all() and (oh >= 1).all()
    assert (ow <= w).all() and (oh <= h).all()
    assert (np.maximum(ow, oh) <= 128).all()


def test_resize_call_appends_columns():
    t = pa.table({"width": pa.array([300], pa.int32()),
                  "height": pa.array([150], pa.int32())})
    out = Resize(max_side=128)(t)
    assert out["out_width"][0].as_py() == 128
    assert out["out_height"][0].as_py() == (150 * 128) // 300


def test_frame_sample_plan_expansion():
    t = pa.table({"payload_id": pa.array([10, 11, 12], pa.int64()),
                  "n_frames": pa.array([5, 10, 35], pa.int64())})
    out = frame_sample_plan(t, every_n=10)
    # counts: max(1, n // 10) -> 1, 1, 3
    assert out["payload_id"].to_pylist() == [10, 11, 12, 12, 12]
    assert out["frame_index"].to_pylist() == [0, 0, 0, 10, 20]
