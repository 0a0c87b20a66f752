"""Binary codecs for geometry values (the Encoder/Decoder role of
src/s2/util/coding/coder.d + the encode()/decode() methods of
S2CellUnion (s2cell_union.d:702-732) and S2Polygon (s2polygon.d:
1577-1600, lossless form)).

Format (little-endian, versioned):
  cell union:  u8 version=1 | u32 count | count * u64 ids
  polygon:     u8 version=1 | u32 n_loops |
               per loop: u32 depth | u32 n_vertices | n*3 float64 xyz
Parquet/Arrow remain the table-level formats; these codecs are for
compact blob columns and object-store broadcast."""

from __future__ import annotations

import struct

import numpy as np


def encode_cell_union(ids) -> bytes:
    ids = np.asarray(ids, dtype="<u8")
    return struct.pack("<BI", 1, len(ids)) + ids.tobytes()


def decode_cell_union(blob: bytes):
    ver, count = struct.unpack_from("<BI", blob, 0)
    assert ver == 1
    return np.frombuffer(blob, dtype="<u8", count=count, offset=5).copy()


def encode_polygon(poly) -> bytes:
    parts = [struct.pack("<BI", 1, len(poly.loops))]
    for lp in poly.loops:
        v = np.ascontiguousarray(lp.vertices, dtype="<f8")
        parts.append(struct.pack("<II", lp.depth, len(v)))
        parts.append(v.tobytes())
    return b"".join(parts)


def decode_polygon(blob: bytes):
    from .loop import Loop
    from .polygon import Polygon
    ver, n_loops = struct.unpack_from("<BI", blob, 0)
    assert ver == 1
    off = 5
    loops = []
    for _ in range(n_loops):
        depth, n_vertices = struct.unpack_from("<II", blob, off)
        off += 8
        v = np.frombuffer(blob, dtype="<f8", count=3 * n_vertices,
                          offset=off).reshape(n_vertices, 3).copy()
        off += 24 * n_vertices
        loops.append(Loop(v, depth=depth))
    return Polygon(loops)


def encode_polyline(polyline) -> bytes:
    """Lossless polyline codec (s2polyline.d encode: version + vertices).
    Format: u8 version=1 | u32 n_vertices | n*3 float64 xyz."""
    v = np.ascontiguousarray(polyline.vertices, dtype="<f8")
    return struct.pack("<BI", 1, len(v)) + v.tobytes()


def decode_polyline(blob: bytes):
    from .polyline import Polyline
    ver, n = struct.unpack_from("<BI", blob, 0)
    assert ver == 1
    v = np.frombuffer(blob, dtype="<f8", count=3 * n,
                      offset=5).reshape(n, 3).copy()
    return Polyline(v)


def encode_point_compressed(x, y, z, level=30):
    """S2XYZFaceSiTi-style compression (s2point_compression.d:55): snap
    each point to the cell center at `level` and store (face, si, ti)
    packed — 4 + 4 bytes per point at level<=15, 9 here for simplicity.
    Lossy at the given level (exact when points are cell centers)."""
    from . import cellid as ci
    from . import coords
    leaf = ci.cellid_from_xyz(np.asarray(x, np.float64),
                              np.asarray(y, np.float64),
                              np.asarray(z, np.float64))
    cells = ci.parent(leaf, level)
    face, si, ti = ci.get_center_si_ti(cells)
    out = np.empty((len(face), 3), dtype="<u4")
    out[:, 0] = face
    out[:, 1] = si
    out[:, 2] = ti
    return struct.pack("<BIB", 1, len(face), level) + out.tobytes()


def decode_point_compressed(blob: bytes):
    from . import coords
    ver, count, level = struct.unpack_from("<BIB", blob, 0)
    assert ver == 1
    arr = np.frombuffer(blob, dtype="<u4", count=3 * count,
                        offset=6).reshape(count, 3)
    x, y, z = coords.face_si_ti_to_xyz(arr[:, 0].astype(np.int64),
                                       arr[:, 1].astype(np.uint64),
                                       arr[:, 2].astype(np.uint64))
    return coords.normalize_xyz(x, y, z)


class ValueLexicon:
    """Dedup dictionary value -> int32 id (src/s2/value_lexicon.d:47)."""

    def __init__(self):
        self._ids = {}
        self._values = []

    def add(self, value):
        vid = self._ids.get(value)
        if vid is None:
            vid = len(self._values)
            self._ids[value] = vid
            self._values.append(value)
        return vid

    def value(self, vid):
        return self._values[vid]

    def clear(self):
        self._ids.clear()
        self._values.clear()

    def __len__(self):
        return len(self._values)


class SequenceLexicon:
    """Dedup dictionary sequence -> int32 id (src/s2/sequence_lexicon.d);
    unlike ValueLexicon the elements keep their order and multiplicity."""

    def __init__(self, original=None):
        self._ids = dict(original._ids) if original is not None else {}
        self._seqs = list(original._seqs) if original is not None else []

    def add(self, seq):
        key = tuple(seq)
        sid = self._ids.get(key)
        if sid is None:
            sid = len(self._seqs)
            self._ids[key] = sid
            self._seqs.append(key)
        return sid

    def sequence(self, sid):
        return list(self._seqs[sid])

    def size(self):
        return len(self._seqs)

    def clear(self):
        self._ids.clear()
        self._seqs.clear()


class IdSetLexicon:
    """Dedup dictionary for SETS of ids (src/s2/id_set_lexicon.d:71):
    singletons encode inline as non-negative ids; multi-sets get
    ~index ids; the empty set has a reserved id, mirroring the
    reference's encoding trick."""

    EMPTY_SET_ID = -(2 ** 31)

    def __init__(self):
        self._sets = ValueLexicon()

    def add(self, ids):
        ids = sorted(set(int(v) for v in ids))
        if not ids:
            return self.EMPTY_SET_ID
        if len(ids) == 1:
            return ids[0]
        return ~self._sets.add(tuple(ids))

    def add_singleton(self, single_id):
        return int(single_id)

    def id_set(self, set_id):
        if set_id == self.EMPTY_SET_ID:
            return ()
        if set_id >= 0:
            return (set_id,)
        return self._sets.value(~set_id)

    def clear(self):
        self._sets.clear()
