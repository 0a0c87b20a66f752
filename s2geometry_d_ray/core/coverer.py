"""S2RegionCoverer: deterministic best-first cell covering of a region.

Reimplements the covering algorithm of ``src/s2/s2region_coverer.d``:
  - candidate creation / terminal rules       (:520-547 newCandidate)
  - expansion and sibling-merge optimization  (:556-622 addCandidate)
  - priority = -(((level << 2*mod) + num_children) << 2*mod) + terminals
               (:589-594), deterministic tie-break by insertion order
  - best-first loop with max_cells budget     (:640-712)
  - fast covering seed from the cap bound     (:299-302, s2cap.d
    getCellUnionBound via vertex neighbors)
  - canonicalization via cellunion.normalize + denormalize

Regions must provide: may_intersect_cell(Cell), contains_cell(Cell),
get_cap_bound() -> Cap. Cap, LatLngRect, Loop, Polygon and Cell qualify.
"""

from __future__ import annotations

import heapq

import numpy as np

from . import cellid as ci
from . import cellunion as cu
from .cap import Cap
from .cell import Cell
from .metrics import MIN_WIDTH

_FACE_IDS = [np.uint64((f << 61) | (1 << 60)) for f in range(6)]


def _cap_cell_union_bound(cap: Cap):
    """S2Cap.getCellUnionBound: <=4 vertex neighbors at the cap scale, or the
    6 face cells for large caps."""
    if cap.is_empty():
        return []
    if cap.is_full() or cap.radius2 >= 2.0:
        return list(_FACE_IDS)
    level = MIN_WIDTH.get_level_for_min_value(cap.radius_radians()) - 1
    if level < 0:
        return list(_FACE_IDS)
    x, y, z = cap.center
    center_id = ci.cellid_from_xyz(np.float64([x]), np.float64([y]),
                                   np.float64([z]))[0]
    return list(ci.vertex_neighbors(center_id, level))


def flood_fill(region, start_cell_id, max_cells=100000):
    """All edge-connected cells at start's level intersecting the region
    (s2region_coverer.d:325-346). Arbitrary order -> returned sorted."""
    start = int(start_cell_id)
    lvl = ci.level_scalar(start)
    seen = {start}
    frontier = [start]
    out = []
    while frontier and len(out) < max_cells:
        cid = frontier.pop()
        if not region.may_intersect_cell(Cell(cid)):
            continue
        out.append(cid)
        for nbr in ci.edge_neighbors(np.uint64([cid]))[0].tolist():
            nbr = ci.parent_scalar(int(nbr), lvl)
            if nbr not in seen:
                seen.add(nbr)
                frontier.append(nbr)
    return np.array(sorted(out), dtype=np.uint64)


def get_simple_covering(region, start_point_xyz, level):
    """Fixed-level covering by flood fill from the cell containing the
    start point (s2region_coverer.d:315-318)."""
    x, y, z = start_point_xyz
    leaf = ci.cellid_from_xyz(np.float64([x]), np.float64([y]),
                              np.float64([z]))[0]
    return flood_fill(region, int(ci.parent(np.uint64([leaf]), level)[0]))


class CovererOptions:
    def __init__(self, max_cells=8, min_level=0, max_level=ci.MAX_LEVEL,
                 level_mod=1):
        assert 0 <= min_level <= max_level <= ci.MAX_LEVEL
        assert 1 <= level_mod <= 3
        self.max_cells = max_cells
        self.min_level = min_level
        self.max_level = max_level
        self.level_mod = level_mod

    def true_max_level(self):
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) \
            % self.level_mod


class RegionCoverer:
    def __init__(self, max_cells=8, min_level=0, max_level=ci.MAX_LEVEL,
                 level_mod=1):
        self.options = CovererOptions(max_cells, min_level, max_level,
                                      level_mod)

    # -- public API ----------------------------------------------------
    def get_covering(self, region):
        """Exterior covering: cells whose union covers the region."""
        return self._get_covering_internal(region, interior=False)

    def get_interior_covering(self, region):
        """Cells entirely contained in the region (auto-accept for joins)."""
        return self._get_covering_internal(region, interior=True)

    def get_fast_covering(self, region):
        cells = _cap_cell_union_bound(region.get_cap_bound())
        cells = self._adjust_cell_levels(cells)
        return np.array(sorted(int(c) for c in cells), dtype=np.uint64)

    # -- internals -----------------------------------------------------
    def _max_children_shift(self):
        return 2 * self.options.level_mod

    def _adjust_level(self, level):
        o = self.options
        if o.level_mod > 1 and level > o.min_level:
            level -= (level - o.min_level) % o.level_mod
        return level

    def _adjust_cell_levels(self, cells):
        o = self.options
        out = []
        for cid in sorted(int(c) for c in cells):
            cid = np.uint64(cid)
            level = int(ci.level(cid))
            new_level = self._adjust_level(min(level, o.max_level))
            if new_level != level:
                cid = ci.parent(cid, new_level)
            if out and bool(ci.contains(np.uint64(out[-1]), cid)):
                continue
            while out and bool(ci.contains(cid, np.uint64(out[-1]))):
                out.pop()
            out.append(cid)
        return out

    def _new_candidate(self, cell, region, interior):
        """(cell, is_terminal) or None (s2region_coverer.d:520-547)."""
        if not region.may_intersect_cell(cell):
            return None
        is_terminal = False
        o = self.options
        if cell.level >= o.min_level:
            if interior:
                if region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + o.level_mod > o.max_level:
                    return None
            else:
                if cell.level + o.level_mod > o.max_level or \
                        region.contains_cell(cell):
                    is_terminal = True
        return [cell, is_terminal, []]  # children filled by expand

    def _expand_children(self, candidate, cell, num_levels, region, interior):
        """(s2region_coverer.d:625-650): collect candidate children
        num_levels below, counting terminals."""
        num_levels -= 1
        num_terminals = 0
        for child_cell in cell.children():
            if num_levels > 0:
                if region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        candidate, child_cell, num_levels, region, interior)
                continue
            child = self._new_candidate(child_cell, region, interior)
            if child is not None:
                candidate[2].append(child)
                if child[1]:
                    num_terminals += 1
        return num_terminals

    def _get_covering_internal(self, region, interior):
        o = self.options
        pq = []  # (priority, seq, candidate) — seq = deterministic tiebreak
        result = []
        seq = [0]

        def add_candidate(candidate):
            if candidate is None:
                return
            cell, is_terminal, _ = candidate
            if is_terminal:
                result.append(cell.id)
                return
            num_levels = 1 if cell.level < o.min_level else o.level_mod
            num_terminals = self._expand_children(candidate, cell, num_levels,
                                                  region, interior)
            num_children = len(candidate[2])
            if num_children != 0 and not interior and \
                    num_terminals == 1 << self._max_children_shift() and \
                    cell.level >= o.min_level:
                # All children terminal: emit the parent instead.
                candidate[1] = True
                add_candidate(candidate)
            else:
                shift = self._max_children_shift()
                priority = -((((cell.level << shift) + num_children) << shift)
                             + num_terminals)
                heapq.heappush(pq, (priority, seq[0], candidate))
                seq[0] += 1

        # Initial candidates: fast covering of the cap bound (:652-664).
        for cid in self.get_fast_covering(region):
            add_candidate(self._new_candidate(Cell(cid), region, interior))

        while pq and (not interior or len(result) < o.max_cells):
            _, _, candidate = heapq.heappop(pq)
            cell, _, children = candidate
            # (s2region_coverer.d:678-699)
            if interior or cell.level < o.min_level or len(children) == 1 \
                    or len(result) + len(pq) + len(children) <= o.max_cells:
                for child in children:
                    if not interior or len(result) < o.max_cells:
                        add_candidate(child)
            else:
                candidate[1] = True
                candidate[2] = []
                result.append(cell.id)

        ids = cu.normalize(np.array([int(r) for r in result],
                                    dtype=np.uint64))
        if o.min_level > 0 or o.level_mod > 1:
            ids = cu.denormalize(ids, o.min_level, o.level_mod)
        return ids


class CellUnionRegion:
    """Region adapter over a normalized cell-id array so a covering can
    itself be re-covered (s2region_coverer.d:465-468 getCovering over an
    S2CellUnion; used by canonicalizeCovering's large-excess path)."""

    def __init__(self, ids):
        self.ids = np.asarray(ids, dtype=np.uint64)

    def may_intersect_cell(self, cell):
        return bool(cu.intersects_ids(self.ids,
                                      np.uint64([cell.id]))[0])

    def contains_cell(self, cell):
        return bool(cu.contains_ids(self.ids, np.uint64([cell.id]))[0])

    def get_cap_bound(self):
        if not len(self.ids):
            return Cap.empty()
        centers = np.stack([Cell(int(c)).center() for c in self.ids])
        m = centers.mean(axis=0)
        m = m / np.linalg.norm(m)
        d = 1.0 - centers @ m
        ang = float(np.arccos(np.clip(1.0 - d.max(), -1, 1)))
        # pad by the max cell circumradius
        pad = max(Cell(int(c)).cap_bound().radius_radians()
                  for c in self.ids.tolist())
        return Cap.from_center_angle(tuple(m), ang + pad + 1e-12)


def _is_canonical(options: CovererOptions, covering) -> bool:
    """s2region_coverer.d:364-414 isCanonical."""
    ids = [int(c) for c in covering]
    min_level = options.min_level
    max_level = options.true_max_level()
    level_mod = options.level_mod
    too_many = len(ids) > options.max_cells
    same_parent_count = 1
    prev = None
    for cid in ids:
        if not ci.is_valid(np.uint64(cid)):
            return False
        level = ci.level_scalar(cid)
        if level < min_level or level > max_level:
            return False
        if level_mod > 1 and (level - min_level) % level_mod != 0:
            return False
        if prev is not None:
            if int(ci.range_max(np.uint64(prev))) >= \
                    int(ci.range_min(np.uint64(cid))):
                return False
            if too_many and ci.common_ancestor_level(
                    np.uint64(prev), np.uint64(cid)) >= min_level:
                return False
            plevel = level - level_mod
            if (plevel < min_level or level != ci.level_scalar(prev)
                    or int(ci.parent_scalar(cid, plevel))
                    != int(ci.parent_scalar(prev, plevel))):
                same_parent_count = 1
            else:
                same_parent_count += 1
                if same_parent_count == (1 << (2 * level_mod)):
                    return False
        prev = cid
    return True


def _replace_cells_with_ancestor(ids, ancestor):
    """Drop every cell contained by `ancestor`, insert `ancestor`
    (s2region_coverer.d replaceCellsWithAncestor)."""
    lo = int(ci.range_min(np.uint64(ancestor)))
    hi = int(ci.range_max(np.uint64(ancestor)))
    out = [c for c in ids if not (lo <= int(ci.range_min(np.uint64(c)))
                                  and int(ci.range_max(np.uint64(c)))
                                  <= hi)]
    out.append(int(ancestor))
    out.sort()
    return out


def _contains_all_children(ids, parent, level_mod):
    """All (4 ** level_mod) descendants of `parent` at the next
    level-mod step are present."""
    child_level = ci.level_scalar(int(parent)) + level_mod
    ids_set = set(ids)
    c = int(ci.child_begin(np.uint64(parent), child_level))
    end = int(ci.child_end(np.uint64(parent), child_level))
    while c != end:
        if c not in ids_set:
            return False
        c = int(ci.next_id(np.uint64(c)))
    return True


def is_canonical(covering, max_cells=8, min_level=0,
                 max_level=ci.MAX_LEVEL, level_mod=1):
    """Module-level convenience: does `covering` conform to the given
    coverer options? (s2region_coverer.d:364-414)."""
    return _is_canonical(CovererOptions(max_cells, min_level, max_level,
                                        level_mod), covering)


def canonicalize_covering(covering, max_cells=8, min_level=0,
                          max_level=ci.MAX_LEVEL, level_mod=1):
    """Repair an arbitrary cell-id list (unsorted / overlapping / wrong
    levels) into a canonical covering (s2region_coverer.d:421-497).
    Returns a sorted uint64 array satisfying is_canonical()."""
    opts = CovererOptions(max_cells, min_level, max_level, level_mod)
    ids = [int(c) for c in covering]

    # Replace too-deep / level_mod-violating cells with ancestors.
    if opts.max_level < ci.MAX_LEVEL or opts.level_mod > 1:
        adj = []
        for cid in ids:
            level = ci.level_scalar(cid)
            new_level = min(level, opts.max_level)
            new_level -= (new_level - opts.min_level) % opts.level_mod \
                if new_level >= opts.min_level else 0
            if new_level < level:
                cid = int(ci.parent_scalar(cid, max(new_level,
                                                    opts.min_level)))
            adj.append(cid)
        ids = adj

    ids = [int(c) for c in cu.normalize(np.array(sorted(ids),
                                                 dtype=np.uint64))]
    if opts.min_level > 0 or opts.level_mod > 1:
        ids = [int(c) for c in cu.denormalize(
            np.array(ids, dtype=np.uint64), opts.min_level,
            opts.level_mod)]

    excess = len(ids) - opts.max_cells
    if excess <= 0 or _is_canonical(opts, ids):
        return np.array(ids, dtype=np.uint64)

    if excess * len(ids) > 10000:
        coverer = RegionCoverer(max_cells=max_cells, min_level=min_level,
                                max_level=max_level, level_mod=level_mod)
        return coverer.get_covering(
            CellUnionRegion(np.array(ids, dtype=np.uint64)))

    while len(ids) > opts.max_cells:
        best_index, best_level = -1, -1
        for i in range(len(ids) - 1):
            level = ci.common_ancestor_level(np.uint64(ids[i]),
                                             np.uint64(ids[i + 1]))
            if level < 0:
                continue
            level -= (level - opts.min_level) % opts.level_mod \
                if level >= opts.min_level else 0
            if level > best_level:
                best_level, best_index = level, i
        if best_level < opts.min_level or best_index < 0:
            break
        anc = int(ci.parent_scalar(ids[best_index], best_level))
        ids = _replace_cells_with_ancestor(ids, anc)
        while best_level > opts.min_level:
            best_level -= opts.level_mod
            anc = int(ci.parent_scalar(anc, best_level))
            if not _contains_all_children(ids, anc, opts.level_mod):
                break
            ids = _replace_cells_with_ancestor(ids, anc)
    return np.array(ids, dtype=np.uint64)
