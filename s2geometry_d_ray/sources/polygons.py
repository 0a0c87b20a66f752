"""Deterministic synthetic `polygons` dimension table.

Mirrors the reference test geometry factories (FIXTURES.md §2):
regular loops (s2loop.d:952-964 makeRegularLoop), Koch-fractal loops
(test/s2/s2testing.d:83-160 Fractal), and concentric shell/hole nests
(test/s2/s2testing.d:402-419 concentricLoopsPolygon). Vertex counts span
the 32-vertex brute-force PIP cutover (s2loop.d:1089).

The polygon table is the SMALL side of the spatial join: generated on the
driver, broadcast via ray.put to every actor.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.loop import Loop
from ..core.polygon import Polygon


def _fractal_loop(rng, center_lat, center_lon, radius_rad, level=3,
                  dim=1.2):
    """Koch-like fractal ring: recursively displace edge midpoints."""
    n0 = 8
    angles = 2 * math.pi * np.arange(n0) / n0
    r = np.full(n0, 1.0)
    for _ in range(level):
        m = len(r)
        new_r = np.empty(2 * m)
        new_angles = np.empty(2 * m)
        bump = rng.uniform(-0.25, 0.25, m) * (dim - 1.0)
        new_r[0::2] = r
        new_angles[0::2] = angles
        new_r[1::2] = 0.5 * (r + np.roll(r, -1)) * (1.0 + bump)
        mid = angles + 0.5 * ((np.roll(angles, -1) - angles) % (2 * math.pi))
        new_angles[1::2] = mid
        r, angles = new_r, new_angles
    # CCW orientation (interior on the left): E -> N -> W -> S.
    lat = center_lat + np.rad2deg(radius_rad) * r * np.sin(angles)
    lon = center_lon + np.rad2deg(radius_rad) * r * np.cos(angles) / \
        max(0.1, math.cos(math.radians(center_lat)))
    return lat, lon


def make_polygons(n_polygons=100, seed=42):
    """Returns a list of dicts: polygon_id, rings (list of (lats, lons)),
    and the Polygon geometry object."""
    rng = np.random.default_rng(seed)
    out = []
    vertex_counts = [8, 16, 32, 33, 64, 128, 512]
    for pid in range(n_polygons):
        kind = pid % 3
        # Bias polygon centers toward the hot caps so the join has matches.
        from .pages import HOT_CAPS
        if pid % 2 == 0:
            c = HOT_CAPS[pid % len(HOT_CAPS)]
            clat = float(c[0]) + rng.uniform(-0.05, 0.05)
            clon = float(c[1]) + rng.uniform(-0.05, 0.05)
            radius = rng.uniform(0.0005, 0.004)
        else:
            clat = rng.uniform(-60, 60)
            clon = rng.uniform(-180, 180)
            radius = rng.uniform(0.001, 0.02)
        if kind == 0:
            nv = int(vertex_counts[pid % len(vertex_counts)])
            loop = Loop.make_regular(clat, clon, radius, nv)
            rings = [(loop.vertices, None)]
            poly = Polygon([loop])
        elif kind == 1:
            lat, lon = _fractal_loop(rng, clat, clon, radius,
                                     level=2 + pid % 2)
            loop = Loop.from_latlng_degrees(lat, lon)
            poly = Polygon([loop])
        else:
            shell = Loop.make_regular(clat, clon, radius, 48)
            hole = Loop.make_regular(clat, clon, radius * 0.4, 32, depth=1)
            poly = Polygon([shell, hole])
        out.append({"polygon_id": pid, "polygon": poly})
    return out
