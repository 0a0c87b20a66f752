"""Text-analysis kernels for the training-data pipeline family:
token counting, quality scoring, language-ID (n-gram heuristic), document
fingerprinting (rolling hash), exact-dup hashing, MinHash/SimHash sketches.

All are vectorized map_batches kernels (Arrow/pandas in, Arrow out); the
MinHash stage is a callable class (actor pool) holding the permutation
seeds — stateful setup once per actor."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_MERSENNE = (1 << 61) - 1


def md5_hash_column(batch: pa.Table, col="text", out="text_md5") -> pa.Table:
    """Exact-dup content hash (hex md5, matches DuckDB md5())."""
    vals = batch[col].to_pylist()
    hs = [hashlib.md5(("" if v is None else v).encode("utf-8")).hexdigest()
          for v in vals]
    return batch.append_column(out, pa.array(hs, pa.string()))


def token_count(batch: pa.Table, col="text") -> pa.Table:
    """Whitespace token count, matching DuckDB
    array_length(regexp_split_to_array(trim(text), '\\s+'))."""
    import pyarrow.compute as pc
    trimmed = pc.utf8_trim_whitespace(batch[col])
    parts = pc.split_pattern_regex(trimmed, r"\s+")
    n = pc.list_value_length(parts)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def quality_scores(batch: pa.Table, col="text") -> pa.Table:
    """Length / alpha-ratio / mean-token-length quality heuristics."""
    import pyarrow.compute as pc
    text = batch[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    alpha = pc.utf8_length(pc.replace_substring_regex(text, r"[^a-z]", ""))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.round(
            alpha.to_numpy(zero_copy_only=False).astype(np.float64)
            / np.maximum(1, n_chars.to_numpy(zero_copy_only=False)), 4)
    batch = batch.append_column("n_chars_text", n_chars)
    return batch.append_column("alpha_ratio", pa.array(ratio, pa.float64()))


# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately simple and deterministic.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "a", "to", "in", "is"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un"},
    "es": {"el", "los", "las", "es", "una"},
    "zh": set(),
}


def langid_heuristic(batch: pa.Table, col="text") -> pa.Table:
    """Pick the language whose marker-set hit count is highest (ties ->
    lexicographically first); 'und' when nothing matches."""
    texts = batch[col].to_pylist()
    out = []
    for t in texts:
        toks = set((t or "").lower().split())
        best = ("und", 0)
        for lang in sorted(_LANG_MARKERS):
            hits = len(toks & _LANG_MARKERS[lang])
            if hits > best[1]:
                best = (lang, hits)
        out.append(best[0])
    return batch.append_column("lang_pred", pa.array(out, pa.string()))


def _hash_tokens_batch(texts, n=3):
    """Per-doc sets of hashed n-gram (word) shingles as uint64 arrays."""
    out = []
    for t in texts:
        toks = (t or "").split()
        if len(toks) < n:
            out.append(np.array([], dtype=np.uint64))
            continue
        sh = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        h = np.array([int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in set(sh)], dtype=np.uint64)
        out.append(np.sort(h))
    return out


def rolling_fingerprint(batch: pa.Table, col="text", window=8) -> pa.Table:
    """Document fingerprint: min rolling polynomial hash over byte windows
    (winnowing-style min-sampling, deterministic)."""
    texts = batch[col].to_pylist()
    base = 257
    mod = _MERSENNE
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        if len(b) < window:
            out[i] = _U64(len(b))
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        # rolling hash via cumulative powers (vectorized)
        pw = pow(base, window - 1, mod)
        h = 0
        best = mod
        for k in range(len(arr)):
            h = (h * base + int(arr[k])) % mod
            if k >= window:
                h = (h - int(arr[k - window]) * pw * base) % mod
            if k >= window - 1:
                best = min(best, h)
        out[i] = _U64(best)
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature + LSH band keys.

    __init__ (once per actor): derive the permutation parameters from a
    seed. __call__: texts batch -> rows (doc_id, band, band_hash) for the
    LSH groupby. num_hashes=H split into bands of rows_per_band."""

    def __init__(self, num_hashes=64, rows_per_band=4, shingle=3, seed=7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_hashes,
                              dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_hashes,
                              dtype=np.int64).astype(np.uint64)
        self.num_hashes = num_hashes
        self.rows_per_band = rows_per_band
        self.shingle = shingle

    def signature(self, shingle_hashes):
        """min over shingles of (a*x + b) in wrapping uint64 arithmetic —
        a multiply-shift hash family, fully vectorized (one (H,S) outer
        product per doc). Empty doc -> all-max sentinel signature."""
        if len(shingle_hashes) == 0:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max,
                           dtype=np.uint64)
        x = shingle_hashes[None, :]                       # (1, S)
        hv = self.a[:, None] * x + self.b[:, None]        # (H, S), mod 2^64
        return hv.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        shingles = _hash_tokens_batch(texts, self.shingle)
        n_bands = self.num_hashes // self.rows_per_band
        out_id, out_band, out_hash = [], [], []
        for did, sh in zip(ids.tolist(), shingles):
            sig = self.signature(sh)
            for band in range(n_bands):
                seg = sig[band * self.rows_per_band:
                          (band + 1) * self.rows_per_band]
                bh = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
                out_id.append(did)
                out_band.append(band)
                out_hash.append(int.from_bytes(bh, "little"))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(np.array(out_hash, dtype=np.uint64),
                                  pa.uint64()),
        })


def simhash64(batch: pa.Table, col="text") -> pa.Table:
    """64-bit SimHash over word-unigram hashes."""
    texts = batch[col].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        # Hash every token once, then vectorize the bit tally.
        hs = np.array([int.from_bytes(hashlib.blake2b(
            tok.encode(), digest_size=8).digest(), "little")
            for tok in toks], dtype=np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        val = 0
        for k in np.nonzero(acc > 0)[0].tolist():
            val |= 1 << k
        out[i] = _U64(val)
    return batch.append_column("simhash", pa.array(out, pa.uint64()))


def jaccard(a_hashes, b_hashes):
    """Exact Jaccard of two sorted uint64 shingle-hash sets."""
    if len(a_hashes) == 0 and len(b_hashes) == 0:
        return 1.0
    inter = len(np.intersect1d(a_hashes, b_hashes, assume_unique=True))
    union = len(a_hashes) + len(b_hashes) - inter
    return inter / union if union else 0.0
