"""S2CellUnion operations over sorted numpy uint64 arrays.

Reimplements ``src/s2/s2cell_union.d``: normalize (sort, drop contained,
collapse 4 siblings -> parent), denormalize to fixed levels, expand by
level / radius, set ops (intersect / union / difference), containment
lookups via searchsorted, and area/leaf-count measures."""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from .metrics import MAX_DIAG, MIN_WIDTH

_U64 = np.uint64


def normalize(ids):
    """Sort, dedup, drop cells contained in others, merge complete sibling
    quadruples into parents (s2cell_union.d:743-767)."""
    ids = np.unique(np.asarray(ids, dtype=np.uint64))
    if len(ids) == 0:
        return ids

    def are_siblings(a, b, c, d):
        # XOR of four siblings is zero; exact check via the masked prefix
        # (s2cell_union.d:183-199).
        if (a ^ b ^ c) != d:
            return False
        mask = (int(ci.lsb(_U64(d))) << 1)
        mask = ~(mask + (mask << 1)) & ((1 << 64) - 1)
        dm = d & mask
        return ((a & mask) == dm and (b & mask) == dm and (c & mask) == dm
                and int(ci.level(_U64(d))) > 0)

    out = []
    for cid in ids.tolist():
        # Drop if contained by the last output cell.
        if out and bool(ci.contains(_U64(out[-1]), _U64(cid))):
            continue
        # Discard previous cells contained by this one (can't happen for
        # sorted input unless ranges nest in id order; keep for safety).
        while out and bool(ci.contains(_U64(cid), _U64(out[-1]))):
            out.pop()
        # Collapse complete sibling quadruples into the parent.
        while len(out) >= 3 and are_siblings(out[-3], out[-2], out[-1], cid):
            del out[-3:]
            cid = int(ci.parent(_U64(cid), int(ci.level(_U64(cid))) - 1))
        out.append(cid)
    return np.array(out, dtype=np.uint64)


def denormalize(ids, min_level, level_mod=1):
    """Expand cells so every output level satisfies
    level >= min_level and (level - min_level) % level_mod == 0
    (s2cell_union.d:772-800). Flat-map: one cell -> 4^k children."""
    out = []
    for cid in np.asarray(ids, dtype=np.uint64).tolist():
        cid = _U64(cid)
        lvl = int(ci.level(cid))
        new_level = max(min_level, lvl)
        if level_mod > 1:
            new_level += (level_mod - (new_level - min_level) % level_mod) \
                % level_mod
        new_level = min(new_level, ci.MAX_LEVEL)
        if new_level == lvl:
            out.append(np.uint64([cid]))
        else:
            begin = int(ci.child_begin(cid, new_level))
            end = int(ci.child_end(cid, new_level))
            step = int(ci.lsb_for_level(new_level)) * 2
            out.append(np.arange(begin, end, step, dtype=np.uint64))
    if not out:
        return np.array([], dtype=np.uint64)
    return np.concatenate(out)


def expand_level(ids, expand_level):
    """Add all neighbors at expand_level along each cell's boundary, then
    renormalize (s2cell_union.d:516-535). Cells FINER than expand_level
    are replaced by their parent at expand_level (enlarging the union),
    matching the reference — this guarantees the added ring is at least
    one expand_level cell wide everywhere."""
    orig = np.asarray(ids, dtype=np.uint64)
    out = []
    for cid in orig.tolist():
        cid = _U64(cid)
        lvl = int(ci.level(cid))
        if lvl > expand_level:
            cid = ci.parent(cid, expand_level)
            lvl = expand_level
        out.append(np.uint64([cid]))
        if lvl == expand_level:
            out.append(ci.all_neighbors(cid, expand_level))
        else:
            # Coarser cell: ring of expand_level neighbors along its
            # boundary (appendAllNeighbors semantics; denormalizing the
            # whole cell is equivalent after normalize, interior subcells'
            # neighbors are all contained).
            for sub in denormalize(np.uint64([cid]), expand_level).tolist():
                out.append(ci.all_neighbors(_U64(sub), expand_level))
    if not out:
        return normalize(orig)
    return normalize(np.concatenate(out))


def expand_radius(ids, radius_rad, max_level_diff=3):
    """Buffer a covering by a distance (s2cell_union.d:538-560)."""
    ids = np.asarray(ids, dtype=np.uint64)
    min_level = ci.MAX_LEVEL
    for cid in ids.tolist():
        min_level = min(min_level, int(ci.level(_U64(cid))))
    level = MIN_WIDTH.get_level_for_min_value(radius_rad)
    if level == 0 and radius_rad > MIN_WIDTH.get_value(0):
        # Wider than a face cell: expand twice (s2cell_union.d:549-553).
        ids = expand_level(ids, 0)
    return expand_level(ids, min(min_level + max_level_diff, level))


def contains_ids(union_ids, query_ids):
    """Vectorized: for each query cell, is it contained in the union?
    (binary search over sorted range_min, s2cell_union.d:375-400)."""
    u = np.sort(np.asarray(union_ids, dtype=np.uint64))
    q = np.asarray(query_ids, dtype=np.uint64)
    if len(u) == 0:
        return np.zeros(len(q), dtype=bool)
    # Candidate = first union cell with id >= query id, and its predecessor.
    idx = np.searchsorted(u, q, side="left")
    ok = np.zeros(len(q), dtype=bool)
    has_next = idx < len(u)
    nxt = np.where(has_next, u[np.minimum(idx, len(u) - 1)], 0)
    ok |= has_next & ci.contains(nxt, q)
    has_prev = idx > 0
    prv = u[np.maximum(idx - 1, 0)]
    ok |= has_prev & ci.contains(prv, q)
    return ok


def intersects_ids(union_ids, query_ids):
    """Vectorized intersection test against a sorted union."""
    u = np.sort(np.asarray(union_ids, dtype=np.uint64))
    q = np.asarray(query_ids, dtype=np.uint64)
    if len(u) == 0:
        return np.zeros(len(q), dtype=bool)
    qmin = ci.range_min(q)
    qmax = ci.range_max(q)
    umax = ci.range_max(u)
    # A union cell intersects q iff its range overlaps [qmin, qmax].
    idx = np.searchsorted(umax, qmin, side="left")
    has = idx < len(u)
    cand = u[np.minimum(idx, len(u) - 1)]
    return has & (ci.range_min(cand) <= qmax)


def intersect(a, b):
    """Exact intersection of two normalized unions (two-pointer sweep,
    s2cell_union.d:813-874)."""
    a = np.sort(np.asarray(a, dtype=np.uint64))
    b = np.sort(np.asarray(b, dtype=np.uint64))
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        ai, bj = _U64(a[i]), _U64(b[j])
        ai_min, ai_max = ci.range_min(ai), ci.range_max(ai)
        bj_min, bj_max = ci.range_min(bj), ci.range_max(bj)
        if ai_min > bj_max:
            j += 1
        elif bj_min > ai_max:
            i += 1
        elif ai_min >= bj_min and ai_max <= bj_max:
            out.append(ai)
            i += 1
        elif bj_min >= ai_min and bj_max <= ai_max:
            out.append(bj)
            j += 1
        else:  # disjoint ranges handled above; equal overlap impossible
            if ai_max < bj_max:
                i += 1
            else:
                j += 1
    return np.array(out, dtype=np.uint64)


def union(a, b):
    return normalize(np.concatenate([np.asarray(a, dtype=np.uint64),
                                     np.asarray(b, dtype=np.uint64)]))


def difference(a, b):
    """a \\ b by recursive subdivision (s2cell_union.d:469-498)."""
    b = np.sort(np.asarray(b, dtype=np.uint64))
    out = []

    def add_difference(cid):
        if not intersects_ids(b, np.uint64([cid]))[0]:
            out.append(_U64(cid))
        elif not contains_ids(b, np.uint64([cid]))[0]:
            lvl = int(ci.level(_U64(cid)))
            for pos in range(4):
                add_difference(ci.child(np.uint64([cid]), pos)[0])
            del lvl

    for cid in np.sort(np.asarray(a, dtype=np.uint64)).tolist():
        add_difference(cid)
    return normalize(np.array(out, dtype=np.uint64)) if out else \
        np.array([], dtype=np.uint64)


def leaf_cells_covered(ids):
    """Total leaf cells covered (s2cell_union.d:566-575)."""
    # Leaves under a cell at level l = 4^(30-l), which equals lsb(id).
    lb = ci.lsb(np.asarray(ids, dtype=np.uint64))
    return int(sum(int(v) for v in lb))


def average_based_area(ids):
    """AVG_AREA-based area approximation (s2cell_union.d:580-585)."""
    from .metrics import AVG_AREA
    return AVG_AREA.get_value(ci.MAX_LEVEL) * leaf_cells_covered(ids)


def _are_siblings(a, b, c, d):
    """Four ids form a complete sibling quadruple (s2cell_union.d:183-199:
    XOR of the first three equals the fourth, common masked prefix)."""
    if (a ^ b ^ c) != d:
        return False
    mask = (int(ci.lsb(_U64(d))) << 1)
    mask = ~(mask + (mask << 1)) & ((1 << 64) - 1)
    dm = d & mask
    return ((a & mask) == dm and (b & mask) == dm and (c & mask) == dm
            and int(ci.level(_U64(d))) > 0)


def is_normalized(ids):
    """Sorted, non-overlapping, and no four cells mergeable into a parent
    (s2cell_union.d isNormalized)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if len(ids) <= 1:
        return True
    if not (ids[:-1] < ids[1:]).all():
        return False
    if ci.contains(ids[:-1], ids[1:]).any():
        return False
    lst = [int(v) for v in ids]
    for i in range(3, len(lst)):
        if _are_siblings(lst[i - 3], lst[i - 2], lst[i - 1], lst[i]):
            return False
    return True


def is_valid(ids):
    """Valid cell ids in sorted order with no containment
    (s2cell_union.d isValid)."""
    ids = np.asarray(ids, dtype=np.uint64)
    if len(ids) == 0:
        return True
    if not all(ci.is_valid(i) for i in ids):
        return False
    if len(ids) == 1:
        return True
    if not (ids[:-1] < ids[1:]).all():
        return False
    return not ci.contains(ids[:-1], ids[1:]).any()


def from_begin_end(begin, end):
    """Minimal normalized union covering leaf range [begin, end)
    (s2cell_union.d fromBeginEnd via maximumTile)."""
    out = []
    cid = int(begin)
    end = int(end)
    while cid < end:
        tile = int(ci.maximum_tile(np.uint64(cid), np.uint64(end)))
        out.append(tile)
        # Advance to the leaf AFTER this tile's range (rangeMax().next(),
        # which steps by 2 — even ids are not valid cell ids).
        cid = int(ci.next_id(ci.range_max(np.uint64(tile))))
    # The output is already normalized (maximumTile produces maximal,
    # disjoint, sorted cells).
    return np.asarray(out, dtype=np.uint64)


def from_min_max(min_id, max_id):
    """Minimal normalized union covering leaf range [min_id, max_id]
    (s2cell_union.d fromMinMax)."""
    return from_begin_end(min_id, int(ci.next_id(np.uint64(max_id))))


class CellUnionRegion:
    """S2CellUnion as an S2Region (s2cell_union.d:430-470: contains/
    mayIntersect(S2Cell) + getCapBound): the EXACT region protocol —
    unlike polygon mayIntersect, the range-overlap test has no
    conservative false positives, which is what makes flood-fill
    coverings of a cell union SQL-oracle-replayable."""

    def __init__(self, ids):
        self.ids = np.sort(np.asarray(ids, dtype=np.uint64))

    def may_intersect_cell(self, cell):
        cid = np.uint64(cell.id if hasattr(cell, "id") else cell)
        return bool(intersects_ids(self.ids, np.array([cid]))[0])

    def contains_cell(self, cell):
        cid = np.uint64(cell.id if hasattr(cell, "id") else cell)
        return bool(contains_ids(self.ids, np.array([cid]))[0])

    def get_cap_bound(self):
        from .cap import Cap
        from . import coords
        if len(self.ids) == 0:
            return Cap.empty()
        # Conservative: centroid axis, max angle to member-cell cap
        # bounds (s2cell_union.d getCapBound shape).
        from .cell import Cell
        caps = [Cell(int(c)).get_cap_bound() for c in self.ids.tolist()]
        ctr = np.sum([np.asarray(c.center) for c in caps], axis=0)
        n = np.linalg.norm(ctr)
        ctr = np.array([1.0, 0.0, 0.0]) if n == 0 else ctr / n
        ang = 0.0
        for c in caps:
            d = np.linalg.norm(np.asarray(c.center) - ctr)
            ang = max(ang, 2 * np.arcsin(min(1.0, 0.5 * d))
                      + c.radius_radians())
        return Cap.from_center_angle(tuple(ctr), min(np.pi, ang))
