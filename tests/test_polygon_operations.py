"""The reference's S2PolygonTestBase.Operations table
(test/s2/s2polygon_test.d:721-880): five lat-lng fixture pairs with the
expected boundary of a&b, a|b, a\\b and a^b, compared with the same
1e-4 rad tolerance (the expected intersections were computed in lat-lng
space, the engine computes geodesics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import polygon_ops as po
from s2geometry_d_ray.core.textformat import make_polygon

MAX_ERROR = 1e-4  # radians, s2polygon_test.d:729


def _poly(text):
    return make_polygon(text) if text.strip() else None


def _rings(poly):
    if poly is None:
        return []
    return [lp.vertices for lp in poly.loops]


def _ring_matches(r1, r2, tol):
    """Cyclic match: same vertex count and some rotation (either
    direction) puts every vertex within tol."""
    if len(r1) != len(r2):
        return False
    n = len(r1)
    for r2d in (r2, r2[::-1]):
        for shift in range(n):
            rot = np.roll(r2d, shift, axis=0)
            d = np.linalg.norm(r1 - rot, axis=1)
            ang = 2 * np.arcsin(np.minimum(1.0, 0.5 * d))
            if ang.max() <= tol:
                return True
    return False


def _boundary_near(pa, pb, tol=MAX_ERROR):
    ra, rb = _rings(pa), _rings(pb)
    if len(ra) != len(rb):
        return False
    used = [False] * len(rb)
    for r1 in ra:
        hit = False
        for k, r2 in enumerate(rb):
            if not used[k] and _ring_matches(r1, r2, tol):
                used[k] = True
                hit = True
                break
        if not hit:
            return False
    return True


# (a, b, a_and_b, a_or_b, a_minus_b, a_xor_b) — s2polygon_test.d:721-828
CASES = [
    # Two triangles that share an edge.
    (
        "4:2, 3:1, 3:3;",
        "3:1, 2:2, 3:3;",
        "",
        "4:2, 3:1, 2:2, 3:3;",
        "4:2, 3:1, 3:3;",
        "4:2, 3:1, 2:2, 3:3;",
    ),
    # Two vertical bars and a horizontal bar connecting them.
    (
        "0:0, 0:2, 3:2, 3:0;   0:3, 0:5, 3:5, 3:3;",
        "1:1, 1:4, 2:4, 2:1;",
        "1:1, 1:2, 2:2, 2:1;   1:3, 1:4, 2:4, 2:3;",
        "0:0, 0:2, 1:2, 1:3, 0:3, 0:5, 3:5, 3:3, 2:3, 2:2, 3:2, 3:0;",
        "0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0;   "
        "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3;",
        "0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0;   "
        "0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3;   "
        "1:2, 1:3, 2:3, 2:2",
    ),
    # Two vertical bars and two horizontal bars.
    (
        "1:88, 1:93, 2:93, 2:88;   -1:88, -1:93, 0:93, 0:88;",
        "-2:89, -2:90, 3:90, 3:89;   -2:91, -2:92, 3:92, 3:91;",
        "1:89, 1:90, 2:90, 2:89;   1:91, 1:92, 2:92, 2:91;   "
        "-1:89, -1:90, 0:90, 0:89;   -1:91, -1:92, 0:92, 0:91;",
        "-1:88, -1:89, -2:89, -2:90, -1:90, -1:91, -2:91, -2:92, -1:92, "
        "-1:93, 0:93, 0:92, 1:92, 1:93, 2:93, 2:92, 3:92, 3:91, 2:91, "
        "2:90, 3:90, 3:89, 2:89, 2:88, 1:88, 1:89, 0:89, 0:88;   "
        "0:90, 0:91, 1:91, 1:90;",
        "1:88, 1:89, 2:89, 2:88;   1:90, 1:91, 2:91, 2:90;   "
        "1:92, 1:93, 2:93, 2:92;   -1:88, -1:89, 0:89, 0:88;   "
        "-1:90, -1:91, 0:91, 0:90;   -1:92, -1:93, 0:93, 0:92;",
        "1:88, 1:89, 2:89, 2:88;   -1:88, -1:89, 0:89, 0:88;   "
        "1:90, 1:91, 2:91, 2:90;   -1:90, -1:91, 0:91, 0:90;   "
        "1:92, 1:93, 2:93, 2:92;   -1:92, -1:93, 0:93, 0:92;   "
        "-2:89, -2:90, -1:90, -1:89;   -2:91, -2:92, -1:92, -1:91;   "
        "0:89, 0:90, 1:90, 1:89;   0:91, 0:92, 1:92, 1:91;   "
        "2:89, 2:90, 3:90, 3:89;   2:91, 2:92, 3:92, 3:91;",
    ),
    # Two interlocking square doughnuts.
    (
        "-1:-93, -1:-89, 3:-89, 3:-93;   0:-92, 0:-90, 2:-90, 2:-92;",
        "-3:-91, -3:-87, 1:-87, 1:-91;   -2:-90, -2:-88, 0:-88, 0:-90;",
        "-1:-91, -1:-90, 0:-90, 0:-91;   0:-90, 0:-89, 1:-89, 1:-90;",
        "-1:-93, -1:-91, -3:-91, -3:-87, 1:-87, 1:-89, 3:-89, 3:-93;   "
        "0:-92, 0:-91, 1:-91, 1:-90, 2:-90, 2:-92;   "
        "-2:-90, -2:-88, 0:-88, 0:-89, -1:-89, -1:-90;",
        "-1:-93, -1:-91, 0:-91, 0:-92, 2:-92, 2:-90, "
        "1:-90, 1:-89, 3:-89, 3:-93;   "
        "-1:-90, -1:-89, 0:-89, 0:-90;",
        "-1:-93, -1:-91, 0:-91, 0:-92, 2:-92, 2:-90, "
        "1:-90, 1:-89, 3:-89, 3:-93;   "
        "-3:-91, -3:-87, 1:-87, 1:-89, 0:-89, 0:-88, "
        "-2:-88, -2:-90, -1:-90, -1:-91;   "
        "-1:-90, -1:-89, 0:-89, 0:-90;   "
        "1:-91, 0:-91, 0:-90, 1:-90;",
    ),
    # An incredibly thin triangle intersecting a square, such that the
    # two intersection points of the triangle with the square are
    # identical: the exterior needle collapses under the vertex merge
    # radius and only the square (with one extra vertex) survives.
    (
        "10:44, 10:46, 12:46, 12:44;",
        "11:45, 89:45.00000000000001, 90:45;",
        "",
        "10:44, 10:46, 12:46, 12:45.001774937, 12:44;",
        "10:44, 10:46, 12:46, 12:45.001774937, 12:44;",
        "10:44, 10:46, 12:46, 12:45.001774937, 12:44;",
    ),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_operations_case(case_idx):
    a_txt, b_txt, and_txt, or_txt, minus_txt, xor_txt = CASES[case_idx]
    a = _poly(a_txt)
    b = _poly(b_txt)

    got_and = po.boolean_intersection(a, b)
    assert _boundary_near(got_and, _poly(and_txt)), \
        f"case {case_idx} a&b mismatch"
    got_or = po.boolean_union(a, b)
    assert _boundary_near(got_or, _poly(or_txt)), \
        f"case {case_idx} a|b mismatch"
    got_minus = po.boolean_difference(a, b)
    assert _boundary_near(got_minus, _poly(minus_txt)), \
        f"case {case_idx} a-b mismatch"
    got_xor = po.boolean_symmetric_difference(a, b)
    assert _boundary_near(got_xor, _poly(xor_txt)), \
        f"case {case_idx} a^b mismatch"


def test_intersection_snap_function():
    """s2polygon_test.d:881 IntersectionSnapFunction: the intersection
    point snaps to integer lat/lng (E0)."""
    from s2geometry_d_ray.core.builder import IntLatLngSnapFunction
    a = make_polygon("0:0, 0:10, 1:10, 1:0")
    b = make_polygon("0:0, 0:10, 3:0")
    got = po.boolean_intersection(a, b,
                                  snap_function=IntLatLngSnapFunction(0))
    exp = make_polygon("0:0, 0:10, 1:7, 1:0")
    assert _boundary_near(got, exp, tol=1e-12)


def test_destructive_union():
    """s2polygon.d destructiveUnion: n-way union via smallest-first
    merging equals chained pairwise unions (area + pointwise checks)."""
    import numpy as np
    from s2geometry_d_ray.core import coords
    polys = [make_polygon(t) for t in (
        "0:0, 0:2, 2:2, 2:0", "1:1, 1:3, 3:3, 3:1", "2:2, 2:4, 4:4, 4:2",
        "10:10, 10:11, 11:11, 11:10")]
    got = po.destructive_union(polys)
    chained = polys[0]
    for p in polys[1:]:
        chained = po.boolean_union(chained, p)
    assert abs(po.polygon_area(got) - po.polygon_area(chained)) < 1e-12
    rng = np.random.default_rng(5)
    lat = rng.uniform(-1, 12, 400)
    lon = rng.uniform(-1, 12, 400)
    x, y, z = coords.latlng_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    assert (got.contains_points(pts) == chained.contains_points(pts)).all()
    assert po.destructive_union([]) is None
    assert po.destructive_union([None, polys[0]]) is polys[0]


@pytest.mark.parametrize("fixture_text", [
    # annulus with hole (near10) and the cross bar
    "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1; -1:0, 0:1, 1:0, 0:-1;",
    "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1;",
])
def test_splitting(fixture_text):
    """s2polygon_test.d:1733-1818 Splitting: cover the polygon with a
    MIXED-LEVEL cell covering, intersect with each cell window, union
    the pieces back, and require the original region (area to 1e-10,
    pointwise equality on a sample).  Exercises T-junction seams: a
    coarse cell bordering two finer cells subdivides the shared border
    differently, which the boolean machinery must re-split."""
    import numpy as np
    from s2geometry_d_ray.core import cellid as ci, coords
    from s2geometry_d_ray.core.cell import Cell
    from s2geometry_d_ray.core.coverer import RegionCoverer
    from s2geometry_d_ray.core.loop import Loop
    from s2geometry_d_ray.core.polygon import Polygon

    poly = make_polygon(fixture_text)
    rc = RegionCoverer(max_cells=32, min_level=2, max_level=10)
    cells = np.asarray(rc.get_covering(poly), dtype=np.uint64)
    assert len(set(ci.level(cells).tolist())) > 1  # mixed levels
    pieces = []
    for cid in cells.tolist():
        c = Cell(int(cid))
        window = Polygon([Loop(np.stack(
            [np.asarray(c.vertex(k)) for k in range(4)]), depth=0)])
        p = po.boolean_intersection(poly, window)
        if p is not None:
            pieces.append(p)
    re = po.destructive_union(pieces)
    assert re is not None
    assert abs(po.polygon_area(re) - po.polygon_area(poly)) < 1e-10
    rng = np.random.default_rng(11)
    lat = rng.uniform(-5, 5, 800)
    lon = rng.uniform(-5, 5, 800)
    x, y, z = coords.latlng_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)
    assert (poly.contains_points(pts) == re.contains_points(pts)).all()


def test_polyline_clip():
    """s2polygon.d intersectWithPolyline / subtractFromPolyline: a line
    crossing a square splits at the boundary; inside+outside pieces
    partition the line; fully-inside and fully-outside lines pass
    through whole."""
    import numpy as np
    from s2geometry_d_ray.core import coords
    from s2geometry_d_ray.core.polyline import Polyline

    def line(pairs):
        lat = [p[0] for p in pairs]
        lon = [p[1] for p in pairs]
        x, y, z = coords.latlng_to_xyz(np.array(lat, float),
                                       np.array(lon, float))
        return np.stack([x, y, z], axis=1)

    square = make_polygon("0:0, 0:10, 10:10, 10:0")
    # crosses in and out once
    l1 = line([(5, -5), (5, 15)])
    ins = po.intersect_with_polyline(square, l1)
    outs = po.subtract_from_polyline(square, l1)
    assert len(ins) == 1 and len(outs) == 2
    total = sum(Polyline(p).get_length() for p in ins + outs)
    assert abs(total - Polyline(l1).get_length()) < 1e-9
    # inside piece spans lng 0..10 at lat 5
    la, lo = coords.xyz_to_latlng(ins[0][:, 0], ins[0][:, 1], ins[0][:, 2])
    assert abs(lo.min() - 0) < 1e-6 and abs(lo.max() - 10) < 1e-6
    # fully inside / fully outside
    assert len(po.intersect_with_polyline(square, line([(2, 2), (3, 3)]))) == 1
    assert len(po.subtract_from_polyline(square, line([(2, 2), (3, 3)]))) == 0
    assert len(po.intersect_with_polyline(square, line([(20, 20), (21, 21)]))) == 0


def test_boolean_fuzz_identities():
    """Randomized sweep: for random convex-ish polygon pairs the
    constructed ops must satisfy inclusion-exclusion on areas, nesting
    (A∩B ⊆ A ⊆ A∪B), and disjointness of A∖B with B — 50 seeds of
    varied overlap geometry."""
    import numpy as np
    from s2geometry_d_ray.core import coords
    from s2geometry_d_ray.core.loop import Loop
    from s2geometry_d_ray.core.polygon import Polygon

    def rand_poly(rng, clat, clon, rdeg, n):
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rdeg * rng.uniform(0.6, 1.0, n)
        lat = clat + r * np.sin(ang)
        lon = clon + r * np.cos(ang)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        return Polygon([Loop(np.stack([x, y, z], axis=1), depth=0)])

    bad = []
    for seed in range(50):
        rng = np.random.default_rng(seed)
        a = rand_poly(rng, 10.0, 20.0, 3.0, rng.integers(4, 12))
        off = rng.uniform(0, 4.0)
        b = rand_poly(rng, 10.0 + off * 0.7, 20.0 + off * 0.7, 3.0,
                      rng.integers(4, 12))
        area_a, area_b = po.polygon_area(a), po.polygon_area(b)
        i = po.boolean_intersection(a, b)
        u = po.boolean_union(a, b)
        d = po.boolean_difference(a, b)
        ai = po.polygon_area(i) if i else 0.0
        au = po.polygon_area(u) if u else 0.0
        ad = po.polygon_area(d) if d else 0.0
        ok = (abs((ai + au) - (area_a + area_b)) < 1e-9
              and abs(ad - (area_a - ai)) < 1e-9
              and ai <= area_a + 1e-12 and ai <= area_b + 1e-12
              and au >= max(area_a, area_b) - 1e-12)
        # pointwise spot check
        rng2 = np.random.default_rng(1000 + seed)
        lat = rng2.uniform(4, 18, 200)
        lon = rng2.uniform(14, 28, 200)
        x, y, z = coords.latlng_to_xyz(lat, lon)
        pts = np.stack([x, y, z], axis=1)
        in_a = a.contains_points(pts)
        in_b = b.contains_points(pts)
        in_u = u.contains_points(pts) if u else np.zeros(len(pts), bool)
        in_i = i.contains_points(pts) if i else np.zeros(len(pts), bool)
        # allow snap-width boundary effects: no more than 1 of 200 points
        ok = ok and ((in_u != (in_a | in_b)).sum() <= 1) \
            and ((in_i != (in_a & in_b)).sum() <= 1)
        if not ok:
            bad.append(seed)
    assert not bad, f"identity violations at seeds {bad}"


def test_union_oracle_fixture_margins_and_vertex_prediction():
    """geo_boolean_union / geo_union_boundary oracle safety: for every
    per-nation fixture the constructed union (a) classifies the doc
    point grid exactly like `in_A OR in_B` with comfortable hemisphere
    margins, and (b) its boundary vertex multiset equals the predicted
    kept-vertices + edge-pair intersections, micro-rounded, with tie
    distances far above the intersection-formula tolerance."""
    import pyarrow.parquet as pq

    from s2geometry_d_ray.core import coords
    from s2geometry_d_ray.core.polygon_ops import boolean_union
    from s2geometry_d_ray.pipelines.geo_queries import _union_fixtures

    did = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    lat = ((did * 7919) % 18000) / 100.0 - 90.0
    lon = ((did * 104729) % 36000) / 100.0 - 180.0
    x, y, z = coords.latlng_to_xyz(lat, lon)
    pts = np.stack([x, y, z], axis=1)

    def micro_set(vs):
        la, lo = coords.xyz_to_latlng(vs[:, 0], vs[:, 1], vs[:, 2])
        return sorted(zip(
            np.rint(np.asarray(la) * 1e6).astype(np.int64).tolist(),
            np.rint(np.asarray(lo) * 1e6).astype(np.int64).tolist()))

    min_margin = np.inf
    min_tie = np.inf
    for key, (a, b) in _union_fixtures(range(25)).items():
        u = boolean_union(a, b)
        in_u = u.contains_points(pts)
        ins = []
        for poly in (a, b):
            v = poly.loops[0].vertices
            nrm = np.cross(v, np.roll(v, -1, axis=0))
            m = (pts @ nrm.T).min(axis=1)
            ins.append(m > 0)
            min_margin = min(min_margin, float(np.abs(m).min()))
        assert ((ins[0] | ins[1]) == in_u).all(), key

        va, vb = a.loops[0].vertices, b.loops[0].vertices
        na = np.cross(va, np.roll(va, -1, axis=0))
        nb = np.cross(vb, np.roll(vb, -1, axis=0))
        kept = [va[(va @ nb.T).min(axis=1) <= 0],
                vb[(vb @ na.T).min(axis=1) <= 0]]
        va1 = np.roll(va, -1, axis=0)
        vb1 = np.roll(vb, -1, axis=0)
        crossings = []
        for i in range(len(va)):
            for j in range(len(vb)):
                if ((nb[j] @ va[i]) * (nb[j] @ va1[i]) < 0
                        and (na[i] @ vb[j]) * (na[i] @ vb1[j]) < 0):
                    xpt = np.cross(na[i], nb[j])
                    if xpt @ (va[i] + va1[i]) < 0:
                        xpt = -xpt
                    crossings.append(xpt / np.linalg.norm(xpt))
        pred = np.concatenate(kept + [np.array(crossings)])
        eng = np.concatenate([lp.vertices for lp in u.loops])
        assert micro_set(pred) == micro_set(eng), key
        la, lo = coords.xyz_to_latlng(eng[:, 0], eng[:, 1], eng[:, 2])
        for deg in (np.asarray(la), np.asarray(lo)):
            d = np.abs(np.mod(deg * 1e6, 1.0) - 0.5)
            min_tie = min(min_tie, float(d.min()))
    assert min_margin > 1e-9, min_margin
    assert min_tie > 1e-6, min_tie
