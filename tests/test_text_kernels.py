"""Regression: the vectorized text kernels (stages/text.py) must be
bit-identical to the straightforward scalar definitions they replaced
(r1 implementations, inlined here as references)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from s2geometry_d_ray.stages import text as tx

_MERSENNE = (1 << 61) - 1

CASES = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "a",
    "short",
    "der die das und ist ein morgen",
    "le la les et est un bonjour",
    "x" * 200,
    "tok " * 50,
    "\tmixed\nwhitespace\r\n  everywhere ",
    "ünïcödé tökens ünïcödé tökens the the the",
    "ab",
    "exactly8",
    "exactly8b",
    "the end is empty",
    "",
    "",
]


def _scalar_fingerprint(texts, window=8):
    base, mod = 257, _MERSENNE
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        if len(b) < window:
            out[i] = np.uint64(len(b))
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        pw = pow(base, window - 1, mod)
        h, best = 0, mod
        for k in range(len(arr)):
            h = (h * base + int(arr[k])) % mod
            if k >= window:
                h = (h - int(arr[k - window]) * pw * base) % mod
            if k >= window - 1:
                best = min(best, h)
        out[i] = np.uint64(best)
    return out


def _scalar_simhash(texts):
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        hs = np.array([int.from_bytes(
            hashlib.md5(tok.encode()).digest()[8:16], "little")
            for tok in toks], dtype=np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        val = 0
        for k in np.nonzero(acc > 0)[0].tolist():
            val |= 1 << k
        out[i] = np.uint64(val)
    return out


def _scalar_langid(texts):
    out = []
    for t in texts:
        toks = set((t or "").lower().split())
        best = ("und", 0)
        for lang in sorted(tx._LANG_MARKERS):
            hits = len(toks & tx._LANG_MARKERS[lang])
            if hits > best[1]:
                best = (lang, hits)
        out.append(best[0])
    return out


def _scalar_shingle_hashes(texts, n=3):
    out = []
    for t in texts:
        toks = (t or "").split()
        if len(toks) < n:
            out.append(np.array([], dtype=np.uint64))
            continue
        sh = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        h = np.array([int.from_bytes(
            hashlib.md5(s.encode()).digest()[8:16], "little")
            for s in set(sh)], dtype=np.uint64)
        out.append(np.sort(h))
    return out


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _random_texts(seed, n=64):
    rng = np.random.default_rng(seed)
    words = ["the", "und", "le", "fox", "data", "ray", "xyz", "alpha",
             "beta", "über", "zz"]
    out = []
    for _ in range(n):
        k = int(rng.integers(0, 30))
        out.append(" ".join(rng.choice(words, size=k).tolist()))
    out[rng.integers(0, n)] = ""  # guarantee empties in random spots
    out[-1] = ""                  # trailing empty doc (reduceat edge)
    return out


@pytest.mark.parametrize("texts", [CASES, _random_texts(1), _random_texts(2)])
def test_rolling_fingerprint_matches_scalar(texts):
    got = tx.rolling_fingerprint(_batch(texts))["fingerprint"] \
        .to_numpy(zero_copy_only=False)
    want = _scalar_fingerprint(texts)
    assert (got == want).all()


@pytest.mark.parametrize("texts", [CASES, _random_texts(3), _random_texts(4)])
def test_simhash_matches_scalar(texts):
    got = tx.simhash64(_batch(texts))["simhash"] \
        .to_numpy(zero_copy_only=False)
    want = _scalar_simhash(texts)
    assert (got == want).all()


@pytest.mark.parametrize("texts", [CASES, _random_texts(5)])
def test_langid_matches_scalar(texts):
    got = tx.langid_heuristic(_batch(texts))["lang_pred"].to_pylist()
    assert got == _scalar_langid(texts)


@pytest.mark.parametrize("texts", [CASES, _random_texts(6)])
def test_shingle_hashes_match_scalar(texts):
    got = tx._hash_tokens_batch(texts)
    want = _scalar_shingle_hashes(texts)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g == w).all()


def test_minhash_signature_batch_matches_per_doc():
    texts = CASES + _random_texts(7)
    mh = tx.MinHasher()
    shingles = tx._hash_tokens_batch(texts, mh.shingle)
    batch_sig = mh._signatures_batch(shingles)
    for i, sh in enumerate(shingles):
        assert (batch_sig[i] == mh.signature(sh)).all()


def test_minhash_bands_bucket_identical_docs_together():
    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "the quick brown fox jumps over the lazy dog " * 3,
             "completely different content with many unique words here"]
    out = tx.MinHasher()(_batch(texts)).to_pandas()
    a = out[out.doc_id == 0].sort_values("band")["band_hash"].to_numpy()
    b = out[out.doc_id == 1].sort_values("band")["band_hash"].to_numpy()
    c = out[out.doc_id == 2].sort_values("band")["band_hash"].to_numpy()
    assert (a == b).all()
    assert (a != c).any()


def test_extract_text_byte_identity_pages_source():
    """input_hint invariant: extracting text from the source's html
    binary must be byte-identical to the source text column."""
    from s2geometry_d_ray.sources.pages import pages_table
    t = pages_table(2000)
    got = tx.extract_text(t.select(["url", "html"]))
    assert got["text"].to_pylist() == t["text"].to_pylist()
    assert "html" not in got.column_names


def test_extract_text_unicode_and_empty():
    texts = ["", "héllo wörld ☃", "a" * 5000, "<body> nested </body>"]
    h = pa.array([(tx.HTML_PREFIX + s + tx.HTML_SUFFIX).encode()
                  for s in texts], pa.binary())
    got = tx.extract_text(pa.table({"html": h}))
    assert got["text"].to_pylist() == texts
