"""Port of the adversarial crossing-edge-query candidate fixtures.

Reference: test/s2/s2crossing_edge_query_test.d:54-295 — the
PerturbedCubeEdges / PerturbedCubeFaceAxes / CapEdgesNearCubeVertex /
DegenerateEdgeOnCellVertex / CollinearEdgesOnCellBoundaries /
PolylineCrossings cases.  These are the cases the reference pins
because they defeat naive cell bucketing: edges exactly on cube-face
boundaries, on child-cell axes, degenerate edges on cell vertices, and
collinear overlapping edges on cell edges.

checkAllCrossings (reference :96-178) is ported in full: for every
edge of the collection used as a query edge, the indexed candidate set
must contain every edge with crossing_sign >= 0, get_crossings(ALL)
must equal exactly the sign>=0 set, get_crossings(INTERIOR) the
sign>0 set, and the total candidate count must stay within a small
multiple of the "nearby pair" count (candidate-filtering quality).

Iteration counts are reduced from the reference (10->4, 5->3,
1000->250, 100->25 and every-level->every-3rd-level) to keep the
pure-Python predicate cost reasonable; the geometry of each case is
identical.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core import coords
from s2geometry_d_ray.core.cap import Cap
from s2geometry_d_ray.core.cell import Cell
from s2geometry_d_ray.core.crossing import get_candidates, get_crossings
from s2geometry_d_ray.core.edge import (chord2_to_radians, edge_distances2,
                                        interpolate_at_distance)
from s2geometry_d_ray.core.metrics import MAX_DIAG
from s2geometry_d_ray.core.predicates import crossing_sign
from s2geometry_d_ray.core.shapeindex import EdgeVectorIndex

MAX_CELL_LEVEL = 30


def _perturb_at_distance(rng, dist_rad, a0, b0):
    """perturbAtDistance (reference :54-63): interpolate, then with
    probability 1/2 nudge every coordinate one ulp in a random
    direction and renormalize."""
    x = np.asarray(interpolate_at_distance(dist_rad, a0, b0),
                   dtype=np.float64)
    if rng.integers(2) == 0:
        x = np.array([math.nextafter(float(v),
                                     1.0 if rng.integers(2) == 0 else -1.0)
                      for v in x])
        x = x / np.linalg.norm(x)
    return x


def _perturbed_sub_edges(rng, a0, b0, count):
    """getPerturbedSubEdges (reference :65-80): sub-edge lengths
    distributed exponentially over 15 orders of magnitude, endpoints
    perturbed off the line."""
    a0 = np.asarray(a0, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    a0 = a0 / np.linalg.norm(a0)
    b0 = b0 / np.linalg.norm(b0)
    length0 = float(np.arccos(np.clip(np.dot(a0, b0), -1, 1)))
    edges = []
    for _ in range(count):
        length = length0 * (1e-15 ** rng.random())
        offset = (length0 - length) * rng.random()
        edges.append((_perturb_at_distance(rng, offset, a0, b0),
                      _perturb_at_distance(rng, offset + length, a0, b0)))
    return edges


def _sample_cap_point(rng, cap):
    """Uniform sample inside a cap (angle parametrization)."""
    z_axis = np.asarray(cap.center, dtype=np.float64)
    frame = coords.get_frame(z_axis)
    h = chord2_to_radians(cap.radius2)
    # uniform in solid angle: cos(theta) uniform on [cos h, 1]
    cos_t = 1.0 - rng.random() * (1.0 - math.cos(h))
    sin_t = math.sqrt(max(0.0, 1.0 - cos_t * cos_t))
    phi = rng.random() * 2 * math.pi
    q = np.array([sin_t * math.cos(phi), sin_t * math.sin(phi), cos_t])
    return np.asarray(coords.from_frame(frame, q), dtype=np.float64)


def _cap_edges(rng, center_cap, max_length_rad, count):
    """getCapEdges (reference :82-95)."""
    edges = []
    for _ in range(count):
        center = _sample_cap_point(rng, center_cap)
        edge_cap = Cap.from_center_angle(tuple(center), 0.5 * max_length_rad)
        p1 = _sample_cap_point(rng, edge_cap)
        p2 = 2 * float(np.dot(p1, center)) * center - p1
        p2 = p2 / np.linalg.norm(p2)
        edges.append((p1, p2))
    return edges


def _point_edge_distance_rad(x, a, b):
    d2 = edge_distances2(np.asarray(x, dtype=np.float64)[None, :],
                         np.asarray(a, dtype=np.float64)[None, :],
                         np.asarray(b, dtype=np.float64)[None, :])
    return chord2_to_radians(float(d2[0, 0]))


def check_all_crossings(edges, max_candidate_ratio=3.0):
    """checkAllCrossings (reference :96-178), against EdgeVectorIndex
    with max_edges_per_cell=1 (forced subdivision, reference :101-103)."""
    ea = np.array([e[0] for e in edges], dtype=np.float64)
    eb = np.array([e[1] for e in edges], dtype=np.float64)
    index = EdgeVectorIndex(ea, eb, max_edges_per_cell=1)
    n = index.n_edges
    k_max_dist = MAX_DIAG.get_value(MAX_CELL_LEVEL)
    num_candidates = 0
    num_nearby_pairs = 0
    for a, b in edges:
        cand = get_candidates(index, a, b)
        assert (np.diff(cand) > 0).all()  # sorted, unique
        assert len(cand) > 0  # the query edge itself is in the index
        assert cand[0] >= 0 and cand[-1] < n
        num_candidates += len(cand)
        cand_set = set(cand.tolist())
        at, bt = tuple(a), tuple(b)
        expected_all = []
        expected_interior = []
        missing = []
        for j in range(n):
            ct, dt = tuple(ea[j]), tuple(eb[j])
            sign = crossing_sign(at, bt, ct, dt)
            if sign >= 0:
                expected_all.append(j)
                if sign > 0:
                    expected_interior.append(j)
                num_nearby_pairs += 1
                if j not in cand_set:
                    missing.append(j)
            else:
                if (_point_edge_distance_rad(a, ct, dt) < k_max_dist or
                        _point_edge_distance_rad(b, ct, dt) < k_max_dist or
                        _point_edge_distance_rad(ct, at, bt) < k_max_dist or
                        _point_edge_distance_rad(dt, at, bt) < k_max_dist):
                    num_nearby_pairs += 1
        assert not missing, f"candidates missing true crossings: {missing}"
        got_all = get_crossings(index, a, b, "ALL", brute_force=False)
        assert got_all.tolist() == expected_all
        got_int = get_crossings(index, a, b, "INTERIOR", brute_force=False)
        assert got_int.tolist() == expected_interior
    # Candidate-filtering quality bound (reference :174-177).
    assert num_candidates <= max_candidate_ratio * max(1, num_nearby_pairs), (
        num_candidates, num_nearby_pairs)


def test_perturbed_cube_edges():
    """Edges in the plane of an S2 cube edge: on the boundary between
    faces, through cube vertices, or along a 45-degree face diagonal
    (reference :180-201 — fails without cell-boundary padding)."""
    rng = np.random.default_rng(20260817)
    for _ in range(4):
        face = int(rng.integers(6))
        scale = 1e-15 ** rng.random()
        u = 2 * int(rng.integers(2)) - 1
        v = 2 * int(rng.integers(2)) - 1
        a0 = np.asarray(
            coords.face_uv_to_xyz_scalar(face, scale * u, scale * v),
            dtype=np.float64)
        b0 = a0 - 2 * np.asarray(coords.get_norm(face), dtype=np.float64)
        edges = _perturbed_sub_edges(rng, a0, b0, 30)
        check_all_crossings(edges)


def test_perturbed_cube_face_axes():
    """Edges in the plane of a cube-face axis: one coordinate is zero,
    so they lie on the boundary between the face's immediate child
    cells (reference :203-218)."""
    rng = np.random.default_rng(7)
    for _ in range(3):
        face = int(rng.integers(6))
        scale = 1e-15 ** rng.random()
        axis = np.asarray(coords.get_uvw_axis(face, int(rng.integers(2))),
                          dtype=np.float64)
        norm = np.asarray(coords.get_norm(face), dtype=np.float64)
        a0 = scale * axis + norm
        b0 = scale * axis - norm
        edges = _perturbed_sub_edges(rng, a0, b0, 30)
        check_all_crossings(edges)


def test_cap_edges_near_cube_vertex():
    """Random edge soup near the cube vertex where the Hilbert curve
    starts and ends (reference :220-229; 1000 edges -> 250 here)."""
    rng = np.random.default_rng(13)
    center = np.array([-1.0, -1.0, 1.0])
    center = center / np.linalg.norm(center)
    cap = Cap.from_center_angle(tuple(center), 1e-3)
    edges = _cap_edges(rng, cap, 1e-4, 250)
    check_all_crossings(edges)


def test_degenerate_edge_on_cell_vertex_is_its_own_candidate():
    """A zero-length edge sitting exactly on a cell vertex must appear
    in its own candidate set (reference :231-238)."""
    rng = np.random.default_rng(99)
    for _ in range(25):
        face = int(rng.integers(6))
        pos = int(rng.integers(0, 2 ** 60))
        level = int(rng.integers(0, 31))
        cid = ci.parent(np.uint64((face << 61) | (2 * pos + 1)), level)
        cell = Cell(int(cid))
        v = np.asarray(cell.vertex(0), dtype=np.float64)
        check_all_crossings([(v, v)], max_candidate_ratio=10.0)


@pytest.mark.parametrize("level", list(range(0, 31, 3)))
def test_collinear_edges_on_cell_boundaries(level):
    """All-pairs overlapping collinear edges along one cell edge
    (reference :240-254): every pair shares a line, so every edge must
    be every other edge's candidate."""
    rng = np.random.default_rng(1000 + level)
    k_intervals = 8
    face = int(rng.integers(6))
    pos = int(rng.integers(0, 2 ** 60))
    cid = ci.parent(np.uint64((face << 61) | (2 * pos + 1)), level)
    cell = Cell(int(cid))
    k = int(rng.integers(4))
    p1 = np.asarray(cell.vertex_raw(k), dtype=np.float64)
    p2 = np.asarray(cell.vertex_raw((k + 1) % 4), dtype=np.float64)
    delta = (p2 - p1) / k_intervals
    edges = []
    for i in range(k_intervals + 1):
        for j in range(i):
            va = p1 + i * delta
            vb = p1 + j * delta
            edges.append((va / np.linalg.norm(va), vb / np.linalg.norm(vb)))
    # Collinear soup: nearly every pair is "nearby", ratio bound is moot
    # but kept loose for the tiny-cell levels where candidates
    # legitimately blanket the bucket.
    check_all_crossings(edges, max_candidate_ratio=6.0)


def test_polyline_crossings():
    """The header-file example (reference :256-295): three zig-zag
    polylines near the equator, queried with two chords — one through
    the zig-zags, one far away.  One EdgeVectorIndex per polyline
    stands in for the multi-shape index + EdgeMap."""
    def polyline(pts):
        xyz = np.array([coords.latlng_to_xyz(la, lo) for la, lo in pts])
        return xyz[:-1], xyz[1:]

    lines = [
        polyline([(0, 0), (2, 1), (0, 2), (2, 3), (0, 4), (2, 5), (0, 6)]),
        polyline([(1, 0), (3, 1), (1, 2), (3, 3), (1, 4), (3, 5), (1, 6)]),
        polyline([(2, 0), (4, 1), (2, 2), (4, 3), (2, 4), (4, 5), (2, 6)]),
    ]
    indexes = [EdgeVectorIndex(a, b, max_edges_per_cell=1) for a, b in lines]

    def check(a0, a1):
        a0 = np.asarray(coords.latlng_to_xyz(*a0), dtype=np.float64)
        a1 = np.asarray(coords.latlng_to_xyz(*a1), dtype=np.float64)
        total = 0
        for (ea, eb), idx in zip(lines, indexes):
            got = get_crossings(idx, a0, a1, "ALL", brute_force=False)
            expected = [e for e in range(len(ea))
                        if crossing_sign(tuple(a0), tuple(a1),
                                         tuple(ea[e]), tuple(eb[e])) >= 0]
            assert got.tolist() == expected
            total += len(got)
        return total

    assert check((1, 0), (1, 4)) > 0     # crosses the zig-zags
    assert check((5, 5), (6, 6)) == 0    # far away: no crossings
