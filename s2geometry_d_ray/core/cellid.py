"""Vectorized S2CellId operations over numpy uint64 arrays.

Reimplements the cell-id algebra of the reference ``src/s2/s2cell_id.d``
(64-bit id = 3 face bits + 61-bit Hilbert position; level encoded by the
lowest set bit) as batch numpy kernels. The 1024-entry Hilbert lookup
tables are built once at module import (s2cell_id.d:1140-1237); every Ray
worker process pays this once.

Key entry points:
  cellid_from_latlng(lat_deg, lon_deg) -> uint64[n]      (s2cell_id.d:110-121)
  cellid_from_xyz(x, y, z)             -> uint64[n]
  from_face_ij(face, i, j)             -> uint64[n]      (s2cell_id.d:995-1025)
  to_face_ij(id)                       -> (face, i, j)   (s2cell_id.d:1034-1084)
  level / parent / child_begin ...                        (s2cell_id.d:345-549)
  range_min / range_max / contains / intersects           (s2cell_id.d:434-459)
  to_token / from_token                                   (s2cell_id.d:749-797)
  to_xyz / to_latlng (cell centers)                       (s2cell_id.d:282-313)
  edge_neighbors / vertex_neighbors / all_neighbors       (s2cell_id.d:872-986)
"""

from __future__ import annotations

import binascii

import numpy as np

from . import coords
from .coords import (INVERT_MASK, LIMIT_IJ, MAX_LEVEL, POS_TO_IJ,
                     POS_TO_ORIENTATION, SWAP_MASK)

FACE_BITS = 3
NUM_FACES = 6
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL
LOOKUP_BITS = 4

_U64 = np.uint64
_ONE = _U64(1)

# ---------------------------------------------------------------------------
# Hilbert lookup tables (s2cell_id.d:1207-1237), built once per process.
# A 10-bit key "iiiijjjjoo" maps to "ppppppppoo" (LOOKUP_POS) and back
# (LOOKUP_IJ).
# ---------------------------------------------------------------------------


def _build_lookup_tables():
    size = 1 << (2 * LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.uint64)
    lookup_ij = np.zeros(size, dtype=np.uint64)

    def rec(level, i, j, orig_orientation, pos, orientation):
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for k in range(4):
            rec(level, i + (int(r[k]) >> 1), j + (int(r[k]) & 1),
                orig_orientation, pos + k,
                orientation ^ int(POS_TO_ORIENTATION[k]))

    for o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        rec(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()
# Python-list copies for the scalar fast paths (no numpy overhead).
_LOOKUP_POS_L = LOOKUP_POS.tolist()
_LOOKUP_IJ_L = LOOKUP_IJ.tolist()


def _build_lookup_pos8():
    """8-bit encode table composed from two 4-bit LOOKUP_POS rounds,
    vectorized over all 2^18 states: key (i8 << 10) | (j8 << 2) | o ->
    (pos16 << 2) | o'.  Halves the gather rounds in from_face_ij (4
    instead of 8) for the hot geocode path; 2 MiB, L2/L3 resident."""
    s = np.arange(1 << (2 * 8 + 2), dtype=np.uint64)
    i8 = (s >> np.uint64(10)) & np.uint64(255)
    j8 = (s >> np.uint64(2)) & np.uint64(255)
    o = s & np.uint64(3)
    b1 = LOOKUP_POS[((i8 >> np.uint64(4)) << np.uint64(6))
                    + ((j8 >> np.uint64(4)) << np.uint64(2)) + o]
    b2 = LOOKUP_POS[((i8 & np.uint64(15)) << np.uint64(6))
                    + ((j8 & np.uint64(15)) << np.uint64(2))
                    + (b1 & np.uint64(3))]
    pos = ((b1 >> np.uint64(2)) << np.uint64(8)) | (b2 >> np.uint64(2))
    return (pos << np.uint64(2)) | (b2 & np.uint64(3))


LOOKUP_POS8 = _build_lookup_pos8()


# ---------------------------------------------------------------------------
# Scalar fast paths (plain Python ints) for object-heavy callers like the
# coverer's Cell class — ~50x cheaper than 1-element numpy arrays.
# ---------------------------------------------------------------------------

def to_face_ij_scalar(cell_id):
    """Scalar id -> (face, i, j)."""
    cid = int(cell_id)
    face = cid >> POS_BITS
    bits = face & SWAP_MASK
    i = j = 0
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits += ((cid >> (k * 2 * LOOKUP_BITS + 1))
                 & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ_L[bits]
        i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
        bits &= (SWAP_MASK | INVERT_MASK)
    return face, i, j


def from_face_ij_scalar(face, i, j):
    # Force plain Python ints: a numpy int64 `face` would propagate into
    # `n * 2 + 1` and overflow at face >= 4 (the last RuntimeWarning the
    # r4 errstate sweep missed — batch paths are wrapped, this scalar
    # path must simply never be numpy).
    face, i, j = int(face), int(i), int(j)
    n = face << (POS_BITS - 1)
    bits = face & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS_L[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= (SWAP_MASK | INVERT_MASK)
    return n * 2 + 1


def level_scalar(cell_id):
    cid = int(cell_id)
    return MAX_LEVEL - ((cid & -cid).bit_length() - 1) // 2


def lsb_scalar(cell_id):
    cid = int(cell_id)
    return cid & -cid


def parent_scalar(cell_id, lvl):
    cid = int(cell_id)
    new_lsb = 1 << (2 * (MAX_LEVEL - lvl))
    return (cid & -new_lsb) | new_lsb


def child_scalar(cell_id, pos):
    cid = int(cell_id)
    new_lsb = (cid & -cid) >> 2
    return cid + (2 * pos - 3) * new_lsb


def _st_to_ij_scalar(s):
    v = LIMIT_IJ * s - 0.5
    r = int(v + 0.5) if v >= 0 else -int(-v + 0.5)
    return min(LIMIT_IJ - 1, max(0, r))


def _from_face_ij_wrap_scalar(face, i, j):
    """Scalar fromFaceIJWrap (s2cell_id.d:1163-1194)."""
    import math
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    limit = math.nextafter(1.0, 2.0)
    u = max(-limit, min(limit, scale * (2 * (i - MAX_SIZE // 2) + 1)))
    v = max(-limit, min(limit, scale * (2 * (j - MAX_SIZE // 2) + 1)))
    x, y, z = coords.face_uv_to_xyz_scalar(face, u, v)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        nface = 0 if ax > az else 2
    else:
        nface = 1 if ay > az else 2
    comp = (x, y, z)[nface]
    if comp < 0:
        nface += 3
    if nface == 0:
        nu, nv = y / x, z / x
    elif nface == 1:
        nu, nv = -x / y, z / y
    elif nface == 2:
        nu, nv = -x / z, -y / z
    elif nface == 3:
        nu, nv = z / x, y / x
    elif nface == 4:
        nu, nv = z / y, -x / y
    else:
        nu, nv = -y / z, -x / z
    return from_face_ij_scalar(nface, _st_to_ij_scalar(0.5 * (nu + 1.0)),
                               _st_to_ij_scalar(0.5 * (nv + 1.0)))


def _from_face_ij_same_scalar(face, i, j, same_face):
    if same_face and 0 <= i < MAX_SIZE and 0 <= j < MAX_SIZE:
        return from_face_ij_scalar(face, i, j)
    return _from_face_ij_wrap_scalar(face, i, j)


# ---------------------------------------------------------------------------
# Encode: (face, i, j) -> leaf id, and the full latlng/xyz geocode kernel.
# ---------------------------------------------------------------------------

def from_face_ij(face, i, j):
    """Leaf cell id from cube face and 30-bit (i, j). s2cell_id.d:995-1025.

    Fully vectorized: 4 rounds of 8-bit table gathers over the whole
    batch (LOOKUP_POS8 composes two 4-bit Hilbert steps, halving the
    gather rounds of the classic 4-bit form)."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << _U64(POS_BITS - 1)
    bits = face & _U64(SWAP_MASK)
    mask = _U64(255)
    for k in (3, 2, 1, 0):
        ks = _U64(k * 8)
        bits = bits + (((i >> ks) & mask) << _U64(10))
        bits = bits + (((j >> ks) & mask) << _U64(2))
        bits = LOOKUP_POS8[bits]
        n = n | ((bits >> _U64(2)) << _U64(k * 16))
        bits = bits & _U64(SWAP_MASK | INVERT_MASK)
    return n * _U64(2) + _ONE


def to_face_ij(cell_id, return_orientation=False):
    """Inverse: id -> (face, i, j[, orientation]). s2cell_id.d:1034-1084."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    face = (cid >> _U64(POS_BITS)).astype(np.uint64)
    bits = face & _U64(SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits = bits + ((cid >> _U64(k * 2 * LOOKUP_BITS + 1))
                       & _U64((1 << (2 * nbits)) - 1)) * _U64(4)
        bits = LOOKUP_IJ[bits]
        i = i + ((bits >> _U64(LOOKUP_BITS + 2)) << _U64(k * LOOKUP_BITS))
        j = j + (((bits >> _U64(2)) & _U64((1 << LOOKUP_BITS) - 1))
                 << _U64(k * LOOKUP_BITS))
        bits = bits & _U64(SWAP_MASK | INVERT_MASK)
    if return_orientation:
        # s2cell_id.d:1050-1059: flip SWAP_MASK when lsb is at an odd
        # "00"-pair distance from the leaf bit.
        adj = (lsb(cid) & _U64(0x1111111111111110)) != 0
        orientation = np.where(adj, bits ^ _U64(SWAP_MASK), bits)
        return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64), \
            orientation.astype(np.int64)
    return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64)


def cellid_from_xyz(x, y, z):
    """Direction vectors -> leaf cell ids (s2cell_id.d:110-116)."""
    face, u, v = coords.xyz_to_face_uv(np.asarray(x, dtype=np.float64),
                                       np.asarray(y, dtype=np.float64),
                                       np.asarray(z, dtype=np.float64))
    i = coords.st_to_ij(coords.uv_to_st(u))
    j = coords.st_to_ij(coords.uv_to_st(v))
    return from_face_ij(face, i, j)


def cellid_from_latlng(lat_deg, lon_deg):
    """Degrees lat/lon -> leaf cell ids — THE geocode kernel."""
    x, y, z = coords.latlng_to_xyz(lat_deg, lon_deg)
    return cellid_from_xyz(x, y, z)


# ---------------------------------------------------------------------------
# Level / lsb algebra (s2cell_id.d:345-549).
# ---------------------------------------------------------------------------

def lsb(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    with np.errstate(over="ignore"):  # ~0 + 1 wraps (cid == 0 sentinel)
        return cid & (~cid + _ONE)


def lsb_for_level(level):
    level = np.asarray(level, dtype=np.uint64)
    return _ONE << (_U64(2) * (_U64(MAX_LEVEL) - level))


def level(cell_id):
    """level = MAX_LEVEL - trailing_zeros(id)/2 (s2cell_id.d:345-360)."""
    lb = lsb(cell_id)
    # Powers of two up to 2^60 are exactly representable in float64.
    tz = np.log2(lb.astype(np.float64)).astype(np.int64)
    return (MAX_LEVEL - (tz >> 1)).astype(np.int64)


def is_leaf(cell_id):
    return (np.asarray(cell_id, dtype=np.uint64) & _ONE) != 0


def is_valid(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    face_ok = (cid >> _U64(POS_BITS)) < _U64(NUM_FACES)
    lsb_ok = (lsb(cid) & _U64(0x1555555555555555)) != 0
    return face_ok & lsb_ok


def parent(cell_id, lvl):
    """Ancestor at the given level (s2cell_id.d:474-482)."""
    new_lsb = lsb_for_level(lvl)
    cid = np.asarray(cell_id, dtype=np.uint64)
    return (cid & (~(new_lsb - _ONE))) | new_lsb


def child_begin(cell_id, lvl):
    """First descendant id at the given level (s2cell_id.d:515-535)."""
    new_lsb = lsb_for_level(lvl)
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid - lsb(cid) + new_lsb


def child_end(cell_id, lvl):
    new_lsb = lsb_for_level(lvl)
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid + lsb(cid) + new_lsb


def child(cell_id, pos):
    """pos-th child (0..3) one level down (s2cell_id.d:493-505)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = (lsb(cid) >> _U64(2)).astype(np.int64)
    off = (2 * np.asarray(pos, dtype=np.int64) - 3) * new_lsb
    return cid + off.astype(np.uint64)  # negative offsets wrap correctly


def range_min(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid - (lsb(cid) - _ONE)


def range_max(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    return cid + (lsb(cid) - _ONE)


def contains(a, b):
    """True where cell a contains cell b (s2cell_id.d:448-453)."""
    b = np.asarray(b, dtype=np.uint64)
    return (b >= range_min(a)) & (b <= range_max(a))


def intersects(a, b):
    """True where cells overlap (one contains the other)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return (range_min(b) <= range_max(a)) & (range_max(b) >= range_min(a))


def next_id(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is intended
        return cid + (lsb(cid) << _ONE)


def prev_id(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is intended
        return cid - (lsb(cid) << _ONE)


def advance(cell_id, steps):
    """Advance along the Hilbert curve at this cell's level, clamped to
    the [begin, end) range of all six faces (s2cell_id.d:602-630)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    steps = np.asarray(steps, dtype=np.int64)
    step_shift = np.log2(lsb(cid).astype(np.float64)).astype(np.int64) + 1
    # Clamp: min steps to begin, max steps to end.
    min_steps = -(cid >> step_shift.astype(np.uint64)).astype(np.int64)
    max_steps = (((np.uint64(6) << np.uint64(POS_BITS)) - cid)
                 >> step_shift.astype(np.uint64)).astype(np.int64)
    steps = np.clip(steps, min_steps, max_steps)
    # uint64 modular shift: int64 would overflow for coarse levels
    # (shift up to 61); the clamped result always fits mod 2^64.
    off = steps.astype(np.uint64) << step_shift.astype(np.uint64)
    return cid + off


def next_wrap(cell_id):
    """next() with wraparound from the last cell to the first
    (s2cell_id.d:568-586)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    n = next_id(cid)
    wrap = n >= (np.uint64(6) << np.uint64(POS_BITS))
    with np.errstate(over="ignore"):  # mod-2^64 wrap is intended
        return np.where(wrap, n - (np.uint64(6) << np.uint64(POS_BITS)), n)


def prev_wrap(cell_id):
    cid = np.asarray(cell_id, dtype=np.uint64)
    p = prev_id(cid)
    # prev of the first cell underflows past face 0.
    wrap = p >= (np.uint64(6) << np.uint64(POS_BITS))  # unsigned underflow
    with np.errstate(over="ignore"):  # mod-2^64 wrap is intended
        return np.where(wrap, p + (np.uint64(6) << np.uint64(POS_BITS)), p)


def distance_from_begin(cell_id):
    """Number of same-level steps from childBegin(face 0, level)
    (s2cell_id.d:640-656)."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    step_shift = np.log2(lsb(cid).astype(np.float64)).astype(np.uint64) \
        + np.uint64(1)
    return (cid >> step_shift).astype(np.int64)


def maximum_tile(cell_id, limit):
    """Largest cell with same range_min() not extending past limit
    (s2cell_id.d:673-700). Scalar loop — used on partition boundaries only."""
    cid = int(np.uint64(cell_id))
    lim = int(np.uint64(limit))
    start = int(range_min(np.uint64(cid)))
    if start >= lim:
        return np.uint64(lim)
    if int(range_max(np.uint64(cid))) >= lim:
        # The cell is too large: shrink until it fits.
        while int(range_max(np.uint64(cid))) >= lim:
            cid = int(child(np.uint64(cid), 0))
        return np.uint64(cid)
    # Grow while the parent fits entirely before the limit.
    while int(level(np.uint64(cid))) > 0:
        par = int(parent(np.uint64(cid), int(level(np.uint64(cid))) - 1))
        if int(range_min(np.uint64(par))) != start or \
                int(range_max(np.uint64(par))) >= lim:
            break
        cid = par
    return np.uint64(cid)


def common_ancestor_level(a, b):
    """Max level at which parents are equal, or -1 (s2cell_id.d:708-719)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    bits = a ^ b
    bits = np.maximum(bits, lsb(a))
    bits = np.maximum(bits, lsb(b))
    msb = np.floor(np.log2(bits.astype(np.float64))).astype(np.int64)
    # Guard against float rounding at exact powers of two near 2^63.
    msb = np.where((np.uint64(1) << msb.astype(np.uint64)) > bits, msb - 1, msb)
    lvl = MAX_LEVEL - ((msb + 1) >> 1)
    return np.where((a >> _U64(POS_BITS)) != (b >> _U64(POS_BITS)),
                    np.int64(-1), lvl)


# ---------------------------------------------------------------------------
# Decode: id -> center (si, ti) -> xyz / latlng (s2cell_id.d:163-171,282-313).
# ---------------------------------------------------------------------------

def get_center_si_ti(cell_id):
    """Center of the cell in (face, si, ti). s2cell_id.d:282-302."""
    face, i, j = to_face_ij(cell_id)
    # delta trick: leaf -> 1; else 2 if (i+j) has the same parity as the
    # level, giving the true cell center on the si/ti grid.
    cid = np.asarray(cell_id, dtype=np.uint64)
    leaf = (cid & _ONE) != 0
    same_parity = ((i ^ (cid >> _U64(2)).astype(np.int64)) & 1) != 0
    delta = np.where(leaf, 1, np.where(same_parity, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    return face, si.astype(np.uint64), ti.astype(np.uint64)


def to_xyz(cell_id):
    """Cell center as unit xyz."""
    face, si, ti = get_center_si_ti(cell_id)
    x, y, z = coords.face_si_ti_to_xyz(face, si, ti)
    return coords.normalize_xyz(x, y, z)


def to_latlng(cell_id):
    """Cell center as (lat_deg, lon_deg)."""
    x, y, z = to_xyz(cell_id)
    return coords.xyz_to_latlng(x, y, z)


# ---------------------------------------------------------------------------
# Tokens (s2cell_id.d:749-797).
# ---------------------------------------------------------------------------

def to_token(cell_id):
    """Hex token, trailing zeros stripped; 'X' for id 0. Returns object array.

    Bulk-hexlifies the whole batch then slices per row (C-speed ops).
    """
    cid = np.ascontiguousarray(np.asarray(cell_id, dtype=np.uint64))
    flat = cid.reshape(-1)
    h = binascii.hexlify(flat.astype(">u8").tobytes()).decode("ascii")
    out = [h[k:k + 16].rstrip("0") or "X" for k in range(0, len(h), 16)]
    return np.array(out, dtype=object).reshape(cid.shape)


def from_token(tokens):
    """Inverse of to_token."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for idx, t in enumerate(tokens):
        if t == "X" or t == "x" or len(t) > 16 or len(t) == 0:
            out[idx] = 0
        else:
            out[idx] = np.uint64(int(t + "0" * (16 - len(t)), 16))
    return out


# ---------------------------------------------------------------------------
# Neighbors (s2cell_id.d:872-986). Vectorized via fromFaceIJ with wrap.
# ---------------------------------------------------------------------------

def _from_face_ij_wrap(face, i, j):
    """fromFaceIJWrap (s2cell_id.d:1163-1194), vectorized."""
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)
    u = np.clip(scale * (2.0 * (i - MAX_SIZE // 2) + 1.0), -limit, limit)
    v = np.clip(scale * (2.0 * (j - MAX_SIZE // 2) + 1.0), -limit, limit)
    x, y, z = coords.face_uv_to_xyz(face, u, v)
    nface, nu, nv = coords.xyz_to_face_uv(x, y, z)
    return from_face_ij(nface,
                        coords.st_to_ij(0.5 * (nu + 1.0)),
                        coords.st_to_ij(0.5 * (nv + 1.0)))


def _from_face_ij_same(face, i, j, same_face):
    inside = same_face & (i >= 0) & (i < MAX_SIZE) & (j >= 0) & (j < MAX_SIZE)
    res_in = from_face_ij(face, np.clip(i, 0, MAX_SIZE - 1),
                          np.clip(j, 0, MAX_SIZE - 1))
    res_out = _from_face_ij_wrap(face, i, j)
    return np.where(inside, res_in, res_out)


def edge_neighbors(cell_id):
    """4 edge neighbors at the same level (s2cell_id.d:872-894).

    Returns uint64 array of shape (n, 4).
    """
    cid = np.asarray(cell_id, dtype=np.uint64).reshape(-1)
    lvl = level(cid)
    size = (np.int64(1) << (MAX_LEVEL - lvl)).astype(np.int64)
    face, i, j = to_face_ij(cid)
    out = np.empty((len(cid), 4), dtype=np.uint64)
    # down, right, up, left (same order as the reference)
    for idx, (di, dj) in enumerate([(0, -1), (1, 0), (0, 1), (-1, 0)]):
        ni = i + di * size
        nj = j + dj * size
        same = (ni >= 0) & (ni < MAX_SIZE) & (nj >= 0) & (nj < MAX_SIZE)
        leaf = _from_face_ij_same(face, ni, nj, same)
        out[:, idx] = parent(leaf, lvl)
    return out


def all_neighbors_ring(cell_id, lvl):
    """Vectorized same-level 8-ring: the exact probe set of
    all_neighbors with nbr_level == own level (origin-snapped i/j,
    +-size offsets, identical same-face wrap), returned as (n, 8)
    uint64 WITH possible duplicates at face corners — callers dedup.
    Equivalence with the scalar all_neighbors is pinned by test."""
    cid = np.asarray(cell_id, dtype=np.uint64).reshape(-1)
    size = np.int64(1 << (MAX_LEVEL - lvl))
    face, i, j = to_face_ij(cid)
    i = i & -size
    j = j & -size
    out = np.empty((len(cid), 8), dtype=np.uint64)
    combos = ((-1, -1), (-1, 0), (-1, 1), (0, -1),
              (0, 1), (1, -1), (1, 0), (1, 1))
    for idx, (di, dj) in enumerate(combos):
        ni = i + di * size
        nj = j + dj * size
        same = (ni >= 0) & (ni < MAX_SIZE) & (nj >= 0) & (nj < MAX_SIZE)
        leaf = _from_face_ij_same(face, ni, nj, same)
        out[:, idx] = parent(leaf, lvl)
    return out


def all_neighbors(cell_id, nbr_level=None):
    """All neighbors at nbr_level (>= own level): the ring of 8 for
    equal level (s2cell_id.d:939-986). Scalar fast path (plain ints)."""
    cid = int(cell_id)
    own = level_scalar(cid)
    if nbr_level is None:
        nbr_level = own
    assert nbr_level >= own
    face, i, j = to_face_ij_scalar(cid)
    size = 1 << (MAX_LEVEL - own)
    i &= -size
    j &= -size
    nbr_size = 1 << (MAX_LEVEL - nbr_level)
    out = set()
    k = -nbr_size
    while True:
        if k < 0:
            j_same = (j + k >= 0)
        elif k >= size:
            j_same = (j + k < MAX_SIZE)
        else:
            j_same = True
            # North and south neighbors.
            for jj, same in ((j - nbr_size, j - nbr_size >= 0),
                             (j + size, j + size < MAX_SIZE)):
                leaf = _from_face_ij_same_scalar(face, i + k, jj, same)
                out.add(parent_scalar(leaf, nbr_level))
        # East and west neighbors.
        for ii, same in ((i - nbr_size, i - nbr_size >= 0 and j_same),
                         (i + size, i + size < MAX_SIZE and j_same)):
            leaf = _from_face_ij_same_scalar(face, ii, j + k, same)
            out.add(parent_scalar(leaf, nbr_level))
        if k >= size:
            break
        k += nbr_size
        if k > size:
            k = size
    return np.array(sorted(out), dtype=np.uint64)


def vertex_neighbors(cell_id, lvl):
    """Neighbors at a strictly COARSER level (lvl < level(cell_id)) touching
    the vertex closest to this cell (s2cell_id.d:900-934). Scalar helper."""
    cid = int(cell_id)
    face, i, j = to_face_ij_scalar(cid)
    halfsize = 1 << (MAX_LEVEL - lvl - 1)
    size = halfsize << 1
    if i & halfsize:
        ioffset, isame = size, (i + size < MAX_SIZE)
    else:
        ioffset, isame = -size, (i - size >= 0)
    if j & halfsize:
        joffset, jsame = size, (j + size < MAX_SIZE)
    else:
        joffset, jsame = -size, (j - size >= 0)
    out = [parent_scalar(cid, lvl)]
    pairs = [(i + ioffset, j, isame), (i, j + joffset, jsame)]
    if isame or jsame:  # the diagonal exists except at a cube-face corner
        pairs.append((i + ioffset, j + joffset, isame and jsame))
    for ii, jj, same in pairs:
        leaf = _from_face_ij_same_scalar(face, ii, jj, same)
        out.append(parent_scalar(leaf, lvl))
    return np.array(out, dtype=np.uint64)


def from_debug_string(s):
    """Parse the reference debug format "face/child-positions"
    (s2cell_id.d fromDebugString): "1/" -> face cell 1, "1/23" ->
    grandchild 3 of child 2.  Returns 0 (the invalid sentinel) on
    malformed input."""
    if not isinstance(s, str) or len(s) < 2 or s[1] != "/":
        return np.uint64(0)
    if s[0] not in "012345":
        return np.uint64(0)
    cid = np.uint64((int(s[0]) << 61) | (1 << 60))
    for ch in s[2:]:
        if ch not in "0123":
            return np.uint64(0)
        cid = child(cid, int(ch))
    return np.uint64(cid)


def to_debug_string(cell_id):
    """Inverse of from_debug_string."""
    cid = int(cell_id)
    if not bool(is_valid(np.uint64(cid))):
        return "Invalid: %x" % cid
    lvl = level_scalar(cid)
    face = cid >> 61
    out = [str(face), "/"]
    for lv in range(1, lvl + 1):
        p = int(parent_scalar(cid, lv))
        pp = int(parent_scalar(cid, lv - 1))
        for k in range(4):
            if int(child_scalar(pp, k)) == p:
                out.append(str(k))
                break
    return "".join(out)
