"""Port of test/s2/s2shape_index_region_test.d: cap/rect bounds derived
from the cell-union bound, the per-face / per-child shrunk covering
algorithm, and exact contains/mayIntersect(cell) for padded-cell
fixtures."""

import math

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.edge_clipping import (
    FACE_CLIP_ERROR_UV_COORD, INTERSECTS_RECT_ERROR_UV_DIST)
from s2geometry_d_ray.core.shapes import LaxLoopShape, ShapeCollectionRegion

K_PADDING = 2 * (FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST)


def _cid(debug):
    return int(ci.from_debug_string(debug))


def _padded_cell_shape(cid, padding_uv):
    cell = Cell(np.uint64(cid))
    u_lo, u_hi = cell.u_lo - padding_uv, cell.u_hi + padding_uv
    v_lo, v_hi = cell.v_lo - padding_uv, cell.v_hi + padding_uv
    verts = []
    for u, v in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        x, y, z = coords.face_uv_to_xyz_scalar(cell.face, u, v)
        p = np.array([float(x), float(y), float(z)])
        verts.append(p / np.linalg.norm(p))
    return LaxLoopShape(verts)


DEEP_ID = "3/0123012301230123012301230123"


def test_get_cap_bound():
    cid = _cid(DEEP_ID)
    region = ShapeCollectionRegion([_padded_cell_shape(cid, -K_PADDING)])
    cell_bound = Cell(np.uint64(cid)).cap_bound()
    index_bound = region.get_cap_bound()
    assert index_bound.contains_cap(cell_bound)
    r_index = math.asin(0.5 * math.sqrt(min(4.0, max(0.0,
                                                     index_bound.radius2))))
    r_cell = math.asin(0.5 * math.sqrt(min(4.0, max(0.0,
                                                    cell_bound.radius2))))
    assert r_index <= 1.00001 * r_cell


def test_get_rect_bound():
    cid = _cid(DEEP_ID)
    region = ShapeCollectionRegion([_padded_cell_shape(cid, -K_PADDING)])
    cell_bound = Cell(np.uint64(cid)).get_rect_bound()
    index_bound = region.get_rect_bound()
    assert index_bound.lat_lo == cell_bound.lat_lo
    assert index_bound.lat_hi == cell_bound.lat_hi
    assert index_bound.lng.lo == cell_bound.lng.lo
    assert index_bound.lng.hi == cell_bound.lng.hi


def test_get_cell_union_bound_multiple_faces():
    ids = [_cid("3/00123"), _cid("2/11200013")]
    region = ShapeCollectionRegion(
        [_padded_cell_shape(c, -K_PADDING) for c in ids])
    covering = region.get_cell_union_bound()
    assert covering == sorted(ids)


def test_get_cell_union_bound_one_face():
    input_ids = [
        _cid("5/010"), _cid("5/0211030"),
        _cid("5/110230123"), _cid("5/11023021133"),
        _cid("5/311020003003030303"), _cid("5/311020023")]
    expected = [_cid("5/0"), _cid("5/110230"), _cid("5/3110200")]
    shapes = []
    for c in input_ids:
        for _ in range(3):
            shapes.append(_padded_cell_shape(c, -K_PADDING))
    region = ShapeCollectionRegion(shapes)
    assert region.get_cell_union_bound() == sorted(expected)


def test_contains_cell_multiple_shapes():
    cid = _cid(DEEP_ID)
    cell = Cell(np.uint64(cid))
    region = ShapeCollectionRegion([_padded_cell_shape(cid, -K_PADDING)])
    assert not region.contains_cell(cell)

    region = ShapeCollectionRegion([_padded_cell_shape(cid, -K_PADDING),
                                    _padded_cell_shape(cid, K_PADDING)])
    assert region.contains_cell(cell)
    # All 4 children (level+1 cells inside cid) are also contained.
    lsb = int(np.uint64(cid) & (~np.uint64(cid) + np.uint64(1)))
    child_lsb = lsb >> 2
    base = int(np.uint64(cid)) - lsb + child_lsb
    for k in range(4):
        assert region.contains_cell(Cell(np.uint64(base
                                                   + 2 * k * child_lsb)))


def test_intersects_shrunken_cell():
    cid = _cid(DEEP_ID)
    target = Cell(np.uint64(cid))
    region = ShapeCollectionRegion([_padded_cell_shape(cid, -K_PADDING)])
    assert region.may_intersect_cell(target)
    level = int(ci.level(np.array([cid], dtype=np.uint64))[0])
    for nbr in ci.all_neighbors(np.uint64(cid), level):
        assert not region.may_intersect_cell(Cell(np.uint64(nbr)))


def test_intersects_exact_cell():
    cid = _cid(DEEP_ID)
    region = ShapeCollectionRegion([_padded_cell_shape(cid, 0.0)])
    level = int(ci.level(np.array([cid], dtype=np.uint64))[0])
    ids = [cid] + [int(n) for n in ci.all_neighbors(np.uint64(cid), level)]
    for c in ids:
        assert region.may_intersect_cell(Cell(np.uint64(c)))
