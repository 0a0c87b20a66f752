"""Port of the deterministic cases of
test/s2/builder/util/snap_functions_test.d: level/exponent <-> snap
radius inverses with their exact error-term bookkeeping, and snap-point
idempotency (cell centers at every level; on-grid E5/E6/E7 lat/lng
points, including the not-a-lower-exponent check)."""

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.builder import (CellIdSnapFunction,
                                           IntLatLngSnapFunction)

MAX_LEVEL = 30


def test_cellid_level_to_from_snap_radius():
    for level in range(MAX_LEVEL + 1):
        radius = CellIdSnapFunction.min_snap_radius_for_level(level)
        assert CellIdSnapFunction.level_for_max_snap_radius(radius) == level
        assert CellIdSnapFunction.level_for_max_snap_radius(
            0.999 * radius) == min(level + 1, MAX_LEVEL)
    assert CellIdSnapFunction.level_for_max_snap_radius(5.0) == 0
    assert CellIdSnapFunction.level_for_max_snap_radius(1e-30) == MAX_LEVEL


def test_cellid_snap_point_idempotent():
    rng = np.random.default_rng(73)
    for _ in range(40):
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        leaf = int(ci.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]),
                                      np.array([p[2]]))[0])
        for level in range(0, MAX_LEVEL + 1, 2):
            from s2geometry_d_ray.core.cell import Cell
            cid = ci.parent_scalar(leaf, level)
            center = np.asarray(Cell(np.uint64(cid)).center())
            f = CellIdSnapFunction(level)
            assert np.array_equal(f.snap_point(center), center)


def test_intlatlng_exponent_to_from_snap_radius():
    for exponent in range(IntLatLngSnapFunction.MIN_EXPONENT,
                          IntLatLngSnapFunction.MAX_EXPONENT + 1):
        radius = IntLatLngSnapFunction.min_snap_radius_for_exponent(
            exponent)
        assert IntLatLngSnapFunction.exponent_for_max_snap_radius(
            radius) == exponent
        assert IntLatLngSnapFunction.exponent_for_max_snap_radius(
            0.999 * radius) == min(exponent + 1,
                                   IntLatLngSnapFunction.MAX_EXPONENT)
    assert IntLatLngSnapFunction.exponent_for_max_snap_radius(5.0) == \
        IntLatLngSnapFunction.MIN_EXPONENT
    assert IntLatLngSnapFunction.exponent_for_max_snap_radius(1e-30) == \
        IntLatLngSnapFunction.MAX_EXPONENT


def test_intlatlng_snap_point_idempotent():
    """Points already on the 10^-e grid (constructed with the snap
    function's own n/scale convention) are fixed points; a finer-grid
    point is NOT a fixed point of a coarser snap."""
    rng = np.random.default_rng(79)
    for _ in range(200):
        lat = rng.uniform(-89.9, 89.9)
        lng = rng.uniform(-179.9, 179.9)
        for exp in (5, 6, 7):
            scale = 10.0 ** exp
            glat = np.round(lat * scale) / scale
            glng = np.round(lng * scale) / scale
            x, y, z = coords.latlng_to_xyz(glat, glng)
            p = np.array([float(x), float(y), float(z)])
            p /= np.linalg.norm(p)
            f = IntLatLngSnapFunction(exp)
            assert np.array_equal(f.snap_point(p), p), (exp, glat, glng)

        # E7 point just off the E6 grid is moved by the E6 snap.
        e6lat = round(lat * 1e6)
        e6lng = round(lng * 1e6)
        scale7 = 1e7
        glat7 = (10 * e6lat + 1) / scale7
        glng7 = (10 * e6lng + 1) / scale7
        x, y, z = coords.latlng_to_xyz(glat7, glng7)
        p7not6 = np.array([float(x), float(y), float(z)])
        p7not6 /= np.linalg.norm(p7not6)
        assert not np.array_equal(
            IntLatLngSnapFunction(6).snap_point(p7not6), p7not6)
