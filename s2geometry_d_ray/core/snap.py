"""Snap functions (src/s2/builder/util/snap_functions.d:44-126) and
polyline simplification (src/s2/s2polyline_simplifier.d /
s2polyline.d subsampleVertices semantics), vectorized.

Snap functions are per-vertex maps -> trivially vectorizable columns:
  - IntLatLngSnapFunction: round lat/lng to E5/E6/E7 fixed point
  - S2CellIdSnapFunction: snap to the containing cell center at a level
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import coords
from .edge import edge_distances2, radians_to_chord2


def snap_latlng_to_exponent(lat_deg, lon_deg, exponent=6):
    """IntLatLngSnapFunction: fixed-point round at 10^-exponent degrees.
    Round-half-away (C lround), matching S1Angle E5/E6/E7 constructors."""
    scale = 10.0 ** exponent
    lat = coords.lround(np.asarray(lat_deg, np.float64) * scale) / scale
    lon = coords.lround(np.asarray(lon_deg, np.float64) * scale) / scale
    return lat, lon


def snap_to_cell_centers(lat_deg, lon_deg, level):
    """S2CellIdSnapFunction: each point -> its containing cell's center."""
    leaf = ci.cellid_from_latlng(np.asarray(lat_deg, np.float64),
                                 np.asarray(lon_deg, np.float64))
    cells = ci.parent(leaf, level)
    return ci.to_latlng(cells)


def simplify_polyline(vertices, tolerance_rad):
    """Douglas-Peucker on the sphere: keep endpoints, recursively keep the
    farthest vertex whose distance to the chord exceeds the tolerance.
    Returns the kept-vertex index array (always includes 0 and n-1)."""
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    if n <= 2:
        return np.arange(n)
    tol2 = radians_to_chord2(tolerance_rad)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        mid = v[lo + 1:hi]
        d2 = edge_distances2(mid, v[lo][None, :], v[hi][None, :])[:, 0]
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            idx = lo + 1 + k
            keep[idx] = True
            stack.append((lo, idx))
            stack.append((idx, hi))
    return np.nonzero(keep)[0]
