"""Property-based tests (hypothesis) for the pure-math core: cell-id
algebra roundtrips, coordinate transforms, tokens, and the vectorized
text kernels vs their scalar definitions.  No Ray needed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords

lat_s = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_s = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
level_s = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s)
def test_cellid_token_roundtrip(lat, lon):
    cid = ci.cellid_from_latlng(np.array([lat]), np.array([lon]))
    tok = ci.to_token(cid)
    back = ci.from_token(tok)
    assert back[0] == cid[0]


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, level_s)
def test_parent_contains_leaf(lat, lon, level):
    leaf = ci.cellid_from_latlng(np.array([lat]), np.array([lon]))
    p = ci.parent(leaf, level)
    assert ci.range_min(p)[0] <= leaf[0] <= ci.range_max(p)[0]
    assert ci.level(p)[0] == level
    # parent is idempotent at its own level and monotone up the tree
    assert ci.parent(p, level)[0] == p[0]
    if level > 0:
        gp = ci.parent(leaf, level - 1)
        assert ci.parent(p, level - 1)[0] == gp[0]


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s)
def test_face_ij_roundtrip(lat, lon):
    x, y, z = coords.latlng_to_xyz(np.array([lat]), np.array([lon]))
    face, u, v = coords.xyz_to_face_uv(x, y, z)
    i = coords.st_to_ij(coords.uv_to_st(u))
    j = coords.st_to_ij(coords.uv_to_st(v))
    cid = ci.from_face_ij(face, i, j)
    f2, i2, j2 = ci.to_face_ij(cid)
    assert f2[0] == face[0] and i2[0] == i[0] and j2[0] == j[0]


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False))
def test_st_uv_roundtrip(u):
    s = coords.uv_to_st(np.array([u]))
    u2 = coords.st_to_uv(s)
    assert abs(u2[0] - u) <= 1e-15


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s)
def test_cell_center_within_cell(lat, lon):
    leaf = ci.cellid_from_latlng(np.array([lat]), np.array([lon]))
    x, y, z = ci.to_xyz(leaf)
    back = ci.cellid_from_xyz(x, y, z)
    assert back[0] == leaf[0]


text_s = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60),
    min_size=1, max_size=6)


@settings(max_examples=50, deadline=None)
@given(text_s)
def test_simhash_vectorized_matches_scalar(texts):
    import hashlib

    from s2geometry_d_ray.stages import text as tx
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = tx.simhash64(batch)["simhash"].to_numpy(zero_copy_only=False)
    for k, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert got[k] == 0
            continue
        hs = np.array([int.from_bytes(
            hashlib.md5(tok.encode()).digest()[8:16], "little")
            for tok in toks], dtype=np.uint64)
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) \
            & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        val = 0
        for b in np.nonzero(acc > 0)[0].tolist():
            val |= 1 << b
        assert got[k] == np.uint64(val)


@settings(max_examples=50, deadline=None)
@given(text_s)
def test_token_count_matches_python_split(texts):
    from s2geometry_d_ray.stages import text as tx
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = tx.token_count(batch)["n_tokens"].to_numpy(zero_copy_only=False)
    for k, t in enumerate(texts):
        # token_count mirrors DuckDB regexp_split_to_array(trim(x)),
        # which yields [''] (count 1) for whitespace-only strings —
        # same as len(x.split()) except the empty case
        want = max(1, len(t.split())) if t.strip() == "" else len(t.split())
        assert got[k] == want
