"""Multimodal columns: opaque `binary` payloads + typed metadata.

The image/audio codecs are NOT available in this environment, so the
decode kernels are STUBBED behind ``_HAVE_PIL``-style gates with a
deterministic fake decoder; the Ray-side plumbing — schema, actor-pool
signature, batch sizing, output layout — is real and tested.

Pattern (ray_guide 'Stateful stages'): decode/feature stages are callable
classes (one codec/model init per actor), with SMALL batch_size because
each row carries a large binary payload."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


class ImageDecode:
    """binary -> (width, height, n_channels, ok). Stub decodes
    deterministically from the payload hash when PIL is missing."""

    def __init__(self, max_pixels=64_000_000):
        self.max_pixels = max_pixels

    def _fake_decode(self, payload: bytes):
        # md5 digest bytes 0/1 == DuckDB md5_number_upper(payload) low
        # bytes (LE), so the stub's output is SQL-oracle-checkable.
        h = hashlib.md5(payload).digest()
        w = 64 + h[0] % 192
        hh = 64 + h[1] % 192
        return w, hh, 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = batch["payload"]
        n = len(col)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        c = np.zeros(n, dtype=np.int32)
        ok = pc.is_valid(col).combine_chunks().to_numpy(
            zero_copy_only=False)
        if _HAVE_PIL and ok.any():  # pragma: no cover
            raise NotImplementedError(
                "real decode path requires PIL; container ships none")
        # Null handling and the gather stay in Arrow; only the valid
        # payloads cross into Python (per-payload md5 is inherently
        # per-row).
        idxs = np.flatnonzero(ok)
        for i, p in zip(idxs.tolist(),
                        pc.drop_null(col).to_pylist()):
            w[i], h[i], c[i] = self._fake_decode(p)
        batch = batch.append_column("width", pa.array(w, pa.int32()))
        batch = batch.append_column("height", pa.array(h, pa.int32()))
        batch = batch.append_column("channels", pa.array(c, pa.int32()))
        return batch.append_column("decode_ok", pa.array(ok, pa.bool_()))


def _mix64(x):
    """splitmix64 finalizer (vectorized, uint64)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class FeatureExtract:
    """(decoded meta) -> fixed-size feature vector (list<float>).

    Deterministic fake: blake2b payload seed -> counter-mode splitmix64
    uniforms -> Box-Muller normals, ONE vectorized (n, dim) computation
    per batch (no per-row RNG construction — a real model swap inherits
    the batch shape).  Only the per-payload blake2b digest is a Python
    loop (hashing bytes is inherently per-row)."""

    def __init__(self, dim=32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = batch["payload"]
        n = len(col)
        ok = pc.is_valid(col).combine_chunks().to_numpy(
            zero_copy_only=False)
        seeds = np.zeros(n, dtype=np.uint64)
        idxs = np.flatnonzero(ok)
        for i, p in zip(idxs.tolist(), pc.drop_null(col).to_pylist()):
            seeds[i] = int.from_bytes(
                hashlib.blake2b(p, digest_size=8).digest(), "little")
        # Counter-based normals: two uniforms per feature from
        # mix64(seed * dim_stride + counter), Box-Muller to N(0, 1).
        d = self.dim
        with np.errstate(over="ignore"):
            ctr = (seeds[:, None] * np.uint64(2654435761)
                   + np.arange(2 * d, dtype=np.uint64)[None, :])
            bits = _mix64(ctr)
        u = (bits >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
        u1 = np.maximum(u[:, :d], 2.0 ** -53)
        u2 = u[:, d:]
        feats = (np.sqrt(-2.0 * np.log(u1))
                 * np.cos(2.0 * np.pi * u2)).astype(np.float32)
        feats[~ok] = 0.0
        flat = pa.array(feats.ravel(), pa.float32())
        offsets = pa.array(
            np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32())
        return batch.append_column(
            "features", pa.ListArray.from_arrays(offsets, flat))


class Resize:
    """(width, height) -> aspect-preserving fit-in-box output dims plus
    the (stubbed) pixel resample.

    The dimension plan is EXACT integer arithmetic — the longest side is
    clamped to ``max_side`` and the other side scales by
    ``floor(side * max_side / longest)`` (never upscales, never emits 0)
    — so the plan is SQL-replayable and oracle-checked end to end.  The
    pixel resample itself needs PIL and is stubbed like ImageDecode."""

    def __init__(self, max_side=128):
        self.max_side = max_side

    def plan(self, w: np.ndarray, h: np.ndarray):
        w = w.astype(np.int64)
        h = h.astype(np.int64)
        m = np.maximum(np.maximum(w, h), 1)
        need = m > self.max_side
        out_w = np.where(need, np.maximum(1, (w * self.max_side) // m), w)
        out_h = np.where(need, np.maximum(1, (h * self.max_side) // m), h)
        return out_w.astype(np.int32), out_h.astype(np.int32)

    def resample(self, payload: bytes, out_w: int, out_h: int) -> bytes:
        """Actual pixel resample — needs a codec either way (ADVICE r4:
        the dimension PLAN must not be gated on PIL; only this method,
        which would emit pixels, is)."""
        raise NotImplementedError(
            "pixel resample requires an image codec; only the dimension "
            "plan is implemented in this container"
            + (" (PIL present but decode stage is stubbed)"
               if _HAVE_PIL else ""))

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        out_w, out_h = self.plan(w, h)
        batch = batch.append_column("out_width",
                                    pa.array(out_w, pa.int32()))
        return batch.append_column("out_height",
                                   pa.array(out_h, pa.int32()))


def frame_sample_plan(batch: pa.Table, every_n=10) -> pa.Table:
    """Video frame-sampling plan: emits (payload_id, frame_index) rows.
    The actual frame extraction is the stubbed decode; the flat-map row
    expansion and schema are the real plumbing."""
    n_frames = batch["n_frames"].to_numpy(zero_copy_only=False)
    ids = batch["payload_id"].to_numpy(zero_copy_only=False)
    counts = np.maximum(1, n_frames // every_n)
    out_id = np.repeat(ids, counts)
    local = np.arange(int(counts.sum())) - np.repeat(
        np.cumsum(counts) - counts, counts)
    frame_idx = (local * every_n).astype(np.int64)
    return pa.table({
        "payload_id": pa.array(out_id, pa.int64()),
        "frame_index": pa.array(frame_idx, pa.int64()),
    })
