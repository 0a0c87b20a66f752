"""S2PaddedCell — ported from test/s2/s2padded_cell_test.d
(S2CellMethods / GetEntryExitVertices / ShrinkToFit)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.padded_cell import PaddedCell


def random_cell_id(rng, max_level=None):
    level = int(rng.integers(0, ci.MAX_LEVEL + 1)) \
        if max_level is None else max_level
    face = int(rng.integers(0, 6))
    cid = np.uint64((face << 61) | (1 << 60))
    for _ in range(level):
        cid = ci.child(cid, int(rng.integers(0, 4)))
    return cid


def compare_cell_to_padded(cell, pcell, padding):
    assert int(cell.id) == int(pcell.id)
    assert cell.level == pcell.level
    assert padding == pcell.padding
    assert pcell.bound[0][0] == pytest.approx(cell.u_lo - padding,
                                              abs=0)
    assert pcell.bound[0][1] == pytest.approx(cell.u_hi + padding,
                                              abs=0)
    assert pcell.bound[1][0] == pytest.approx(cell.v_lo - padding,
                                              abs=0)
    assert pcell.bound[1][1] == pytest.approx(cell.v_hi + padding,
                                              abs=0)
    assert np.allclose(pcell.get_center(), np.asarray(cell.center()),
                       rtol=0, atol=1e-15)


def test_s2cell_methods():
    rng = np.random.default_rng(3)
    for _ in range(300):
        cid = random_cell_id(rng)
        padding = math.pow(1e-15, rng.random())
        cell = Cell(int(cid))
        pcell = PaddedCell(cid, padding)
        compare_cell_to_padded(cell, pcell, padding)
        if ci.level_scalar(int(cid)) < ci.MAX_LEVEL:
            for pos in range(4):
                i, j = pcell.get_child_ij(pos)
                child = PaddedCell.child(pcell, i, j)
                ccell = Cell(int(ci.child(cid, pos)))
                compare_cell_to_padded(ccell, child, padding)


def test_entry_exit_vertices():
    rng = np.random.default_rng(4)
    for _ in range(300):
        cid = random_cell_id(rng)
        # entry/exit do not depend on padding
        assert np.array_equal(PaddedCell(cid, 0).get_entry_vertex(),
                              PaddedCell(cid, 0.5).get_entry_vertex())
        assert np.array_equal(PaddedCell(cid, 0).get_exit_vertex(),
                              PaddedCell(cid, 0.5).get_exit_vertex())
        # exit(cell) == entry(next cell along the curve, wrapping)
        assert np.array_equal(
            PaddedCell(cid, 0).get_exit_vertex(),
            PaddedCell(ci.next_wrap(np.uint64(cid)),
                       0).get_entry_vertex())
        if ci.level_scalar(int(cid)) < ci.MAX_LEVEL:
            assert np.array_equal(
                PaddedCell(cid, 0).get_entry_vertex(),
                PaddedCell(ci.child(cid, 0), 0).get_entry_vertex())
            assert np.array_equal(
                PaddedCell(cid, 0).get_exit_vertex(),
                PaddedCell(ci.child(cid, 3), 0).get_exit_vertex())


def test_shrink_to_fit():
    rng = np.random.default_rng(5)
    for _ in range(300):
        result = random_cell_id(rng)
        rcell = Cell(int(result))
        size_u = rcell.u_hi - rcell.u_lo
        size_v = rcell.v_hi - rcell.v_lo
        max_padding = 0.5 * min(size_u, size_v)
        padding = max_padding * rng.random()
        mr = [[rcell.u_lo + padding, rcell.u_hi - padding],
              [rcell.v_lo + padding, rcell.v_hi - padding]]

        def sample(lo, hi):
            return float(rng.uniform(lo, hi))
        a = [sample(*mr[0]), sample(*mr[1])]
        b = [sample(*mr[0]), sample(*mr[1])]
        lvl = ci.level_scalar(int(result))
        if lvl < ci.MAX_LEVEL:
            axis = int(rng.integers(0, 2))
            center = 0.5 * ((rcell.u_lo + rcell.u_hi) if axis == 0
                            else (rcell.v_lo + rcell.v_hi))
            # center in UV is st-midpoint, not uv-midpoint; recompute:
            pc = PaddedCell(result, 0.0)
            center = pc.middle()[axis][0]  # padding 0 -> degenerate
            shared_lo = max(center - padding, mr[axis][0])
            shared_hi = min(center + padding, mr[axis][1])
            mid = sample(shared_lo, shared_hi)
            a[axis] = sample(mr[axis][0], mid)
            b[axis] = sample(mid, mr[axis][1])
        rect = [[min(a[0], b[0]), max(a[0], b[0])],
                [min(a[1], b[1]), max(a[1], b[1])]]
        anc_level = int(rng.integers(0, lvl + 1))
        initial = ci.parent_scalar(int(result), anc_level)
        got = PaddedCell(np.uint64(initial), padding).shrink_to_fit(rect)
        assert int(got) == int(result)
