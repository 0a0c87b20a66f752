"""InitToSimplifiedInCell tests ported from
test/s2/s2polygon_test.d:2664-2792: cell-clipped simplification must
preserve vertices/edges on the cell boundary (so tiled per-cell results
still line up), simplify interior detail, and remove strips/gaps
narrower than the snap radius.

Boundary comparisons use vertex+midpoint -> boundary distance (the
reference's boundaryNear tolerates extra collinear vertices on the
boundary, e.g. the merged NarrowGap rectangle keeps the old corner
sites on its bottom/top edges)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import polygon_ops as po
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.coords import face_uv_to_xyz_scalar
from s2geometry_d_ray.core.edge import edge_distances2
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon
from s2geometry_d_ray.core.textformat import make_polygon, parse_latlngs


def make_cell_polygon(cell, strs):
    """s2polygon_test.d:2672-2690 makeCellPolygon: loops given as u:v
    fractions of the cell's uv bound ('0:0, 1:0, 1:1, 0:1' is CCW)."""
    loops = []
    for s in strs:
        pts = []
        for (u, v) in parse_latlngs(s):
            uu = cell.u_lo * (1 - u) + cell.u_hi * u
            vv = cell.v_lo * (1 - v) + cell.v_hi * v
            p = np.array(face_uv_to_xyz_scalar(cell.face, uu, vv))
            pts.append(p / np.linalg.norm(p))
        loops.append(Loop(np.array(pts)))
    return Polygon(loops)


def _cell(token):
    return Cell(int(ci.from_token([token])[0]))


def _angle(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.arccos(np.clip(a @ b, -1.0, 1.0)))


def _boundary_arrays(poly):
    a = np.concatenate([lp.vertices for lp in poly.loops])
    b = np.concatenate([np.roll(lp.vertices, -1, axis=0)
                        for lp in poly.loops])
    return a, b


def _probe_points(poly):
    pts = [np.concatenate([lp.vertices for lp in poly.loops])]
    for lp in poly.loops:
        mid = lp.vertices + np.roll(lp.vertices, -1, axis=0)
        pts.append(mid / np.linalg.norm(mid, axis=1, keepdims=True))
    return np.concatenate(pts)


def boundary_near(pa, pb, tol_rad=1e-12):
    """Every vertex and edge midpoint of each polygon lies within
    tol of the other polygon's boundary."""
    if pa is None or pb is None:
        return pa is None and pb is None
    for p, q in ((pa, pb), (pb, pa)):
        a, b = _boundary_arrays(q)
        d2 = edge_distances2(_probe_points(p), a, b).min(axis=1)
        if float(np.sqrt(d2.max())) > tol_rad:
            return False
    return True


def _num_vertices(poly):
    return sum(len(lp.vertices) for lp in poly.loops)


def test_points_on_cell_boundary_kept():
    cell = _cell("89c25c")
    poly = make_cell_polygon(cell, ["0.1:0, 0.2:0, 0.2:0.5"])
    tol = _angle(poly.loops[0].vertices[0], poly.loops[0].vertices[1]) * 1.1
    # Plain initializeToSimplified collapses the triangle entirely...
    assert po.initialize_to_simplified(poly, tol) is None
    # ...but the in-cell variant pins the two cell-boundary vertices.
    sic = po.initialize_to_simplified_in_cell(poly, cell, tol)
    assert sic is not None
    assert _num_vertices(sic) == 3
    assert boundary_near(sic, poly)


def test_points_inside_cell_simplified():
    cell = _cell("89c25c")
    poly = make_cell_polygon(
        cell, ["0.3:0, 0.4:0, 0.4:0.5, 0.4:0.8, 0.2:0.8"])
    tol = _angle(poly.loops[0].vertices[0], poly.loops[0].vertices[1]) * 1.1
    sic = po.initialize_to_simplified_in_cell(poly, cell, tol)
    assert sic is not None
    assert _num_vertices(sic) == 4
    assert boundary_near(sic, poly)


def test_cell_corner_kept():
    cell = _cell("00001")
    poly = make_cell_polygon(cell, ["1:0, 1:0.05, 0.99:0"])
    tol = 0.02 * _angle(cell.vertex(0), cell.vertex(1))
    sic = po.initialize_to_simplified_in_cell(poly, cell, tol)
    assert sic is not None
    assert boundary_near(sic, poly)


def test_narrow_strip_removed():
    cell = _cell("00001")
    poly = make_cell_polygon(cell, ["0.9:0, 0.91:0, 0.91:1, 0.9:1"])
    tol = 0.02 * _angle(cell.vertex(0), cell.vertex(1))
    assert po.initialize_to_simplified_in_cell(poly, cell, tol) is None


def test_narrow_gap_removed():
    cell = _cell("00001")
    poly = make_cell_polygon(
        cell, ["0.7:0, 0.75:0, 0.75:1, 0.7:1",
               "0.76:0, 0.8:0, 0.8:1, 0.76:1"])
    expected = make_cell_polygon(cell, ["0.7:0, 0.8:0, 0.8:1, 0.7:1"])
    tol = 0.02 * _angle(cell.vertex(0), cell.vertex(1))
    sic = po.initialize_to_simplified_in_cell(poly, cell, tol)
    assert sic is not None
    assert len(sic.loops) == 1
    assert boundary_near(sic, expected)


def test_closely_spaced_edge_vertices_kept():
    cell = _cell("00001")
    poly = make_cell_polygon(
        cell, ["0:0.303, 0:0.302, 0:0.301, 0:0.3, 0.1:0.3, 0.1:0.4"])
    tol = 0.02 * _angle(cell.vertex(0), cell.vertex(1))
    sic = po.initialize_to_simplified_in_cell(poly, cell, tol)
    assert sic is not None
    assert _num_vertices(sic) == 6
    assert boundary_near(sic, poly)


def test_polyline_assembly_bug():
    cell = _cell("5701")
    poly = make_polygon(
        "55.8699252:-163.9412145, "      # SW corner of 5701
        "54.7672352:-166.7579678, "      # NE corner of 5701
        "54.7109214:-164.6376338, "      # forced vertex on edge 4
        "54.7140193:-164.6398404, "
        "54.7113202:-164.6374015")       # forced vertex on edge 4
    tol = 2.138358e-05                   # 136m
    max_dist = 2.821947e-09              # 18mm boundary tolerance
    sic = po.initialize_to_simplified_in_cell(poly, cell, tol, max_dist)
    assert sic is not None


def test_interior_edges_snapped_to_boundary():
    poly = make_polygon(
        "37.8011672:-122.3247322, 37.8011648:-122.3247399, "
        "37.8011647:-122.3247403, 37.8011646:-122.3247408, "
        "37.8011645:-122.3247411, 37.8011633:-122.3247449, "
        "37.8011621:-122.3247334")
    cell = Cell(int(ci.from_debug_string("4/001013300")))
    snap_radius = 1.0 / 6371010.0        # metersToAngle(1.0)
    from s2geometry_d_ray.core.metrics import MAX_WIDTH
    boundary_tolerance = (0.5 * MAX_WIDTH.get_value(29)
                          + math.radians(1e-7 / math.sqrt(2)))
    sic = po.initialize_to_simplified_in_cell(
        poly, cell, snap_radius, boundary_tolerance)
    # The result must be a valid polygon (no crossing edges, rings
    # with >= 3 vertices); emptiness is acceptable only if the tiny
    # sliver collapses entirely.
    if sic is not None:
        for lp in sic.loops:
            assert len(lp.vertices) >= 3


def test_tiled_decomposition_boundary_pinning():
    """The tiled-pipeline guarantee (s2polygon.d:966-971): after
    clipping a polygon to a cell and simplifying in-cell, every output
    vertex on the cell's uv boundary is an UNMOVED input vertex — so
    two neighbouring tiles keep identical shared-border chains."""
    from s2geometry_d_ray.core.coverer import RegionCoverer
    from s2geometry_d_ray.core.metrics import MAX_DIAG
    from s2geometry_d_ray.core.polygon_ops import (
        _cell_edge_incidence_mask, boolean_intersection)
    from s2geometry_d_ray.sources.polygons import make_polygons

    checked = 0
    for rec in make_polygons(6):
        poly = rec["polygon"]
        rc = RegionCoverer(max_cells=6, min_level=8, max_level=12)
        for cid in rc.get_covering(poly).tolist()[:4]:
            cell = Cell(int(cid))
            cellpoly = Polygon(
                [Loop(np.stack([np.asarray(cell.vertex(k))
                                for k in range(4)]))])
            clipped = boolean_intersection(poly, cellpoly)
            if clipped is None:
                continue
            tol = 0.05 * MAX_DIAG.get_value(cell.level)
            simp = po.initialize_to_simplified_in_cell(clipped, cell, tol)
            if simp is None:
                continue
            tol_uv = 1e-12
            in_bnd = [v for lp in clipped.loops for v in lp.vertices
                      if _cell_edge_incidence_mask(cell, v, tol_uv)]
            for lp in simp.loops:
                for v in lp.vertices:
                    if not _cell_edge_incidence_mask(cell, v, tol_uv):
                        continue
                    d = min(float(((np.asarray(w) - v) ** 2).sum())
                            for w in in_bnd) if in_bnd else 1.0
                    assert d < 1e-24, \
                        "boundary vertex moved during in-cell simplify"
                    checked += 1
    assert checked > 0
