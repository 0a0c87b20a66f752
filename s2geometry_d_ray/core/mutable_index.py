"""Incremental multi-shape index: add/remove with batched lazy apply.

Plays the role of MutableS2ShapeIndex's mutation contract
(src/s2/mutable_s2shape_index.d:404-466 — updates are queued and applied
in a batch on first use; :856-906 applyUpdatesThreadSafe): `add` and
`remove` are O(1) queue operations; the first query after a mutation
applies ALL pending updates at once.

Incrementality reformed for the bucket-index design (SURVEY.md §3.3):
each shape owns an immutable PolygonShapeIndex built exactly once when
its addition is applied — adding or removing shape B never touches
shape A's buckets (the reference's per-cell clipped-shape lists achieve
the same by splicing shapes out of shared cells; per-shape sub-indexes
are the natural equivalent when shapes arrive and leave whole).  The
cross-shape candidate structure (a lat/lng bound prefilter) is rebuilt
per apply from cached per-shape bounds — array work proportional to the
number of shapes, no geometry recomputation.
"""

from __future__ import annotations

import numpy as np

from .shapeindex import PolygonShapeIndex


class MutableShapeIndexSet:
    """A mutable set of polygons with lazily-applied updates and
    index-accelerated multi-shape containment queries."""

    def __init__(self):
        self._subindex = {}          # shape_id -> PolygonShapeIndex
        self._pending_add = {}       # shape_id -> Polygon
        self._pending_remove = set()
        self._next_id = 0
        self._bounds = None          # (ids, lat_lo, lat_hi, lng arrays)
        self._fresh = False

    # -- mutations (O(1): queue only) -----------------------------------
    def add(self, polygon) -> int:
        sid = self._next_id
        self._next_id += 1
        self._pending_add[sid] = polygon
        self._fresh = False
        return sid

    def remove(self, shape_id) -> None:
        if shape_id in self._pending_add:
            del self._pending_add[shape_id]
        else:
            self._pending_remove.add(shape_id)
        self._fresh = False

    def __len__(self):
        return len(self._subindex) + len(self._pending_add) \
            - len(self._pending_remove & set(self._subindex))

    # -- batched lazy apply ---------------------------------------------
    def _apply_updates(self):
        """First query after a mutation lands here; everything queued is
        applied in one batch (mutable_s2shape_index.d:404-466)."""
        if self._fresh:
            return
        for sid in self._pending_remove:
            self._subindex.pop(sid, None)
        self._pending_remove.clear()
        for sid, poly in self._pending_add.items():
            # The only geometry work: index the NEW shape.  Existing
            # sub-indexes are reused untouched (asserted in tests).
            self._subindex[sid] = PolygonShapeIndex(poly)
        self._pending_add.clear()
        ids = np.array(sorted(self._subindex), dtype=np.int64)
        lat_lo = np.empty(len(ids))
        lat_hi = np.empty(len(ids))
        for k, sid in enumerate(ids.tolist()):
            b = self._subindex[sid].polygon.bound
            lat_lo[k] = b.lat_lo
            lat_hi[k] = b.lat_hi
        self._bounds = (ids, lat_lo, lat_hi)
        self._fresh = True

    # -- queries ----------------------------------------------------------
    def containing_pairs(self, points):
        """points: (m, 3) unit vectors -> flat (point_idx, shape_id)
        int64 arrays, lexsorted by (point_idx, shape_id).  This is the
        vectorized primitive (per-shape bound prefilter, then the
        shape's own bucket index on the surviving subset); consumers
        build tables with counts+repeat, never a per-point loop."""
        self._apply_updates()
        p = np.atleast_2d(np.asarray(points, dtype=np.float64))
        lat = np.degrees(np.arctan2(p[:, 2], np.hypot(p[:, 0], p[:, 1])))
        out_pt, out_sid = [], []
        ids, lat_lo, lat_hi = self._bounds if self._bounds is not None \
            else (np.empty(0, np.int64), None, None)
        for k, sid in enumerate(ids.tolist()):
            eps = 1e-9
            mask = (lat >= np.rad2deg(lat_lo[k]) - eps) \
                & (lat <= np.rad2deg(lat_hi[k]) + eps)
            if not mask.any():
                continue
            sel = np.nonzero(mask)[0]
            inside = self._subindex[sid].contains_points(p[sel])
            hit = sel[inside]
            out_pt.append(hit)
            out_sid.append(np.full(len(hit), sid, dtype=np.int64))
        if not out_pt:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        pt = np.concatenate(out_pt).astype(np.int64)
        sid = np.concatenate(out_sid)
        order = np.lexsort((sid, pt))
        return pt[order], sid[order]

    def containing_shapes(self, points):
        """points: (m, 3) unit vectors -> list[np.ndarray of shape ids]
        (sorted) containing each point (compat wrapper over
        containing_pairs)."""
        p = np.atleast_2d(np.asarray(points, dtype=np.float64))
        if len(p) == 0:
            return []  # np.split on an empty split list yields [sid]
        pt, sid = self.containing_pairs(p)
        counts = np.bincount(pt, minlength=len(p))
        splits = np.cumsum(counts)[:-1]
        return [a.astype(np.int64) for a in np.split(sid, splits)]

    def contains_points_any(self, points):
        """bool (m,): is each point inside at least one shape."""
        p = np.atleast_2d(np.asarray(points, dtype=np.float64))
        pt, _sid = self.containing_pairs(p)
        return np.bincount(pt, minlength=len(p)) > 0
