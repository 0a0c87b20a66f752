"""Boundary-constructing boolean ops — the reference
test/s2/s2polygon_test.d Operations identities (A∪B ⊇ A, A∩B ⊆ A,
A∖B disjoint from B, area inclusion–exclusion) plus the Bug1..Bug3
degenerate-input regressions."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_d_ray.core import polygon_ops as po
from s2geometry_d_ray.core.edge import point_to_loop_distance2
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.polygon import Polygon


def circle(lat, lng, radius_deg, n=24):
    return Polygon([Loop.make_regular(lat, lng, math.radians(radius_deg),
                                      n)])


def _sample_sphere(rng, n=3000):
    p = rng.normal(size=(n, 3))
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def _far_from_boundaries(pts, polys, min_dist=1e-4):
    keep = np.ones(len(pts), dtype=bool)
    for poly in polys:
        if poly is None:
            continue
        for lp in poly.loops:
            d2 = point_to_loop_distance2(pts, lp.vertices)
            keep &= d2 > min_dist * min_dist
    return pts[keep]


def _contains(poly, pts):
    if poly is None:
        return np.zeros(len(pts), dtype=bool)
    return poly.contains_points(pts)


CASES = [
    (circle(10, 20, 5), circle(12, 23, 5)),      # overlapping
    (circle(0, 0, 10), circle(0, 0, 3)),         # nested
    (circle(0, 0, 4), circle(0, 40, 4)),         # disjoint
    (circle(-30, 100, 8, n=37), circle(-33, 104, 6, n=13)),
    (circle(89, 0, 3), circle(89, 180, 3)),      # pole overlap
]


@pytest.mark.parametrize("a,b", CASES)
def test_pointwise_semantics(a, b):
    rng = np.random.default_rng(42)
    pts = _sample_sphere(rng, 4000)
    u = po.boolean_union(a, b)
    i = po.boolean_intersection(a, b)
    d = po.boolean_difference(a, b)
    pts = _far_from_boundaries(pts, [a, b, u, i, d])
    in_a = _contains(a, pts)
    in_b = _contains(b, pts)
    assert (_contains(u, pts) == (in_a | in_b)).all()
    assert (_contains(i, pts) == (in_a & in_b)).all()
    assert (_contains(d, pts) == (in_a & ~in_b)).all()


@pytest.mark.parametrize("a,b", CASES)
def test_area_inclusion_exclusion(a, b):
    u = po.boolean_union(a, b)
    i = po.boolean_intersection(a, b)
    area = po.polygon_area
    assert area(u) == pytest.approx(area(a) + area(b) - area(i),
                                    abs=1e-9)


def test_difference_with_hole_structure():
    a, b = circle(0, 0, 10), circle(0, 0, 3)
    d = po.boolean_difference(a, b)
    area = po.polygon_area
    assert area(d) == pytest.approx(area(a) - area(b), abs=1e-12)
    assert not d.contains_point(tuple(
        Loop.make_regular(0, 0, 1e-9, 4).vertices[0]))  # center is a hole


def _poly_from_xyz(rings):
    return Polygon([Loop(np.array(r), depth=0) for r in rings])


def test_bug1_union_nonempty():
    # s2polygon_test.d:938-967 — degenerate near-duplicate vertices;
    # union must not come out empty (and must not crash).
    a = _poly_from_xyz([[
        (-0.10531193335759943, -0.80522214810955617, 0.58354664670985534),
        (-0.10531194840431297, -0.80522215192439039, 0.58354663873039425),
        (-0.10531192794033867, -0.80522217497559767, 0.58354661061568747),
        (-0.10531191284235047, -0.80522217121852058, 0.58354661852470402),
    ]])
    b = _poly_from_xyz([[
        (-0.10531174240075937, -0.80522236320875284, 0.58354638436119843),
        (-0.1053119128423491, -0.80522217121852213, 0.58354661852470235),
        (-0.10531192039134209, -0.80522217309706012, 0.58354661457019508),
        (-0.10531191288915481, -0.80522217116640804, 0.5835466185881667),
        (-0.10531191288915592, -0.8052221711664066, 0.58354661858816803),
        (-0.10531192039151964, -0.80522217309710431, 0.58354661457010204),
        (-0.10531192794033779, -0.80522217497559878, 0.58354661061568636),
        (-0.1053117575499668, -0.80522236690813498, 0.58354637652254981),
    ]])
    c = po.boolean_union(a, b)
    assert c is not None


def test_bug2_union_nonempty():
    # s2polygon_test.d:969-994
    a = _poly_from_xyz([[
        (-0.10531509129297913, -0.80522364830417889, 0.58354455577108031),
        (-0.10531509629945978, -0.80522364957414426, 0.58354455311915864),
        (-0.10531509966721426, -0.80522365042868862, 0.58354455133446099),
        (-0.10531510799180135, -0.80522365254037387, 0.58354454692398085),
        (-0.10531511443393944, -0.80522365417479299, 0.58354454350976109),
        (-0.10531511895999796, -0.80522365532331502, 0.58354454111109513),
        (-0.10531512704330558, -0.80522365737526981, 0.58354453682648866),
        (-0.10531513088871190, -0.80522365835155175, 0.58354453478875398),
        (-0.10531514536764745, -0.80522366202669110, 0.58354452711625995),
    ]])
    b = _poly_from_xyz([[
        (-0.10531349558843868, -0.80522324216536346, 0.58354540485461063),
        (-0.10531514536764656, -0.80522366202669376, 0.58354452711625712),
        (-0.10531513088871145, -0.80522365835155264, 0.58354453478875287),
        (-0.10531512704330582, -0.80522365737527040, 0.58354453682648844),
        (-0.10531511895999760, -0.80522365532331569, 0.58354454111109440),
        (-0.10531511443393974, -0.80522365417479219, 0.58354454350976153),
        (-0.10531510799180122, -0.80522365254037498, 0.58354454692397999),
        (-0.10531509966721426, -0.80522365042868873, 0.58354455133446099),
        (-0.10531509629945929, -0.80522364957414448, 0.58354455311915897),
        (-0.10531509129297921, -0.80522364830417922, 0.58354455577107976),
        (-0.10531509029837372, -0.80522364805202314, 0.58354455629802676),
        (-0.10531348596844702, -0.80522323972595053, 0.58354540999599035),
    ]])
    c = po.boolean_union(a, b)
    assert c is not None


def test_bug3_union_nonempty():
    # s2polygon_test.d:996-1037 — two near-identical 12-gons (differences
    # ~4e-15, below the snap radius); union must not come out empty.
    a = _poly_from_xyz([[
        (-0.10703494861068318, -0.80542232562508131, 0.58295659972299307),
        (-0.10703494998722708, -0.80542232255642865, 0.58295660370995028),
        (-0.10703495367938694, -0.80542232008675829, 0.58295660644418046),
        (-0.10703495869785147, -0.80542231887781635, 0.58295660719304865),
        (-0.10703496369792719, -0.80542231925353791, 0.58295660575589636),
        (-0.10703496733984781, -0.80542232111324863, 0.58295660251780734),
        (-0.10703496864776367, -0.80542232395864055, 0.58295659834642488),
        (-0.10703496727121976, -0.80542232702729322, 0.58295659435946767),
        (-0.10703496357905991, -0.80542232949696357, 0.5829565916252375),
        (-0.10703495856059538, -0.80542233070590552, 0.58295659087636931),
        (-0.10703495356051966, -0.80542233033018396, 0.58295659231352159),
        (-0.10703494991859903, -0.80542232847047324, 0.58295659555161061),
    ]])
    b = _poly_from_xyz([[
        (-0.10703494861068762, -0.80542232562508098, 0.58295659972299274),
        (-0.10703494998723152, -0.80542232255642832, 0.58295660370994995),
        (-0.10703495367939138, -0.80542232008675796, 0.58295660644418013),
        (-0.10703495869785591, -0.80542231887781601, 0.58295660719304832),
        (-0.10703496369793163, -0.80542231925353758, 0.58295660575589603),
        (-0.10703496733985225, -0.8054223211132483, 0.58295660251780701),
        (-0.10703496864776811, -0.80542232395864022, 0.58295659834642455),
        (-0.1070349672712242, -0.80542232702729288, 0.58295659435946734),
        (-0.10703496357906438, -0.80542232949696346, 0.58295659162523727),
        (-0.10703495856059982, -0.80542233070590519, 0.58295659087636897),
        (-0.1070349535605241, -0.80542233033018362, 0.58295659231352126),
        (-0.10703494991860348, -0.8054223284704729, 0.58295659555161028),
    ]])
    c = po.boolean_union(a, b)
    assert c is not None


def test_overlap_fractions_exact_matches_raster():
    """Exact overlap fractions agree with the cell-raster approximation
    to raster precision, and hit exact endpoints for nested/disjoint."""
    from s2geometry_d_ray.core.booleans import (overlap_fractions,
                                                overlap_fractions_exact)
    a, b = circle(10, 20, 5), circle(12, 23, 5)
    fa_e, fb_e = overlap_fractions_exact(a, b)
    fa_r, fb_r = overlap_fractions(a, b, level=12)
    assert fa_e == pytest.approx(fa_r, abs=0.05)
    assert fb_e == pytest.approx(fb_r, abs=0.05)
    # nested: inner fully covered
    big, small = circle(0, 0, 10), circle(0, 0, 3)
    fa, fb = overlap_fractions_exact(small, big)
    assert fa == pytest.approx(1.0, abs=1e-9)
    assert 0 < fb < 0.2
    # disjoint
    fa, fb = overlap_fractions_exact(circle(0, 0, 4), circle(0, 40, 4))
    assert fa == 0.0 and fb == 0.0


def test_initialize_to_snapped_and_simplified():
    from s2geometry_d_ray.core.polygon_ops import (initialize_to_simplified,
                                                   initialize_to_snapped)
    a = circle(10, 20, 5, n=64)
    s = initialize_to_snapped(a, snap_level=10)
    assert s is not None
    # snapped vertices are cell centers at level 10
    import numpy as np
    from s2geometry_d_ray.core import cellid as ci
    from s2geometry_d_ray.core.cell import Cell
    for v in s.loops[0].vertices:
        leaf = ci.cellid_from_xyz(v[0:1], v[1:2], v[2:3])[0]
        c = np.asarray(Cell(int(ci.parent(np.uint64(leaf), 10))).center())
        assert np.allclose(v, c, rtol=0, atol=1e-15)
    simp = initialize_to_simplified(a, 2e-3)
    assert simp is not None
    assert len(simp.loops[0].vertices) < 64
    # area approximately preserved
    from s2geometry_d_ray.core.polygon_ops import polygon_area
    assert polygon_area(simp) == pytest.approx(polygon_area(a), rel=0.1)


def test_cell_to_cell_distance():
    import math

    import numpy as np
    from s2geometry_d_ray.core import cellid as ci
    from s2geometry_d_ray.core import coords
    from s2geometry_d_ray.core.cell import Cell, cell_distance2

    def cell_at(lat, lng, level):
        x, y, z = coords.latlng_to_xyz(lat, lng)
        leaf = ci.cellid_from_xyz(np.float64([x]), np.float64([y]),
                                  np.float64([z]))[0]
        return Cell(int(ci.parent(np.uint64(leaf), level)))

    a = cell_at(10, 20, 8)
    assert cell_distance2(a, a) == 0.0
    # neighbor cells touch
    nbrs = ci.edge_neighbors(np.uint64([a.id]))[0]
    assert cell_distance2(a, Cell(int(nbrs[0]))) == 0.0
    # far cell: distance close to the center separation minus radii
    b = cell_at(10, 60, 8)
    d = 2 * math.asin(0.5 * math.sqrt(cell_distance2(a, b)))
    sep = math.radians(60 - 20) * math.cos(math.radians(10))
    assert 0.5 * sep < d < sep


def test_bug4_union_nonempty():
    # s2polygon_test.d:1039-1076 — multi-loop input whose loop 1 edge 1
    # crosses edge 3; union must not come out empty.
    a = _poly_from_xyz([[
        (-0.10667065556339718, -0.80657502337947207, 0.58142764201754193),
        (-0.10667064691895933, -0.80657502457251051, 0.58142764194845853),
        (-0.10667064691930939, -0.80657502457246333, 0.58142764194845975),
        (-0.10667065556339746, -0.80657502337947395, 0.5814276420175396),
        (-0.10667077559567185, -0.80657589269604968, 0.58142641405029793),
        (-0.10667077059539463, -0.80657589232162286, 0.58142641548708696),
        (-0.10667063827452879, -0.80657502576554818, 0.58142764187937435),
        (-0.10667063169531328, -0.80657498170361974, 0.58142770421053058),
        (-0.10667064898418178, -0.8065749793175444, 0.58142770434869739),
    ], [
        (-0.10667064691897719, -0.80657502457250896, 0.58142764194845697),
        (-0.10667063827452879, -0.80657502576554818, 0.58142764187937435),
        (-0.10667064691861985, -0.80657502457255736, 0.58142764194845586),
    ]])
    b = _poly_from_xyz([[
        (-0.10667064691896312, -0.80657502457251107, 0.58142764194845697),
        (-0.10667064691896297, -0.80657502457251007, 0.58142764194845853),
        (-0.10667064033974753, -0.80657498051058207, 0.58142770427961399),
        (-0.10667064076268165, -0.80657498045444342, 0.58142770427989865),
        (-0.10667051785242875, -0.80657409963649807, 0.58142894872603923),
        (-0.1066707756642685, -0.80657588679775971, 0.58142642222003538),
    ]])
    c = po.boolean_union(a, b)
    assert c is not None


def test_bug5_union_nonempty():
    # s2polygon_test.d:1078-1111 — loop 0 edge 8 crosses loop 1 edge 0.
    a = _poly_from_xyz([[
        (-0.10574444273627338, -0.80816264611829447, 0.57938868667714882),
        (-0.10574444845633162, -0.80816268110163325, 0.57938863683652475),
        (-0.10574444825833453, -0.80816268112970524, 0.57938863683350494),
        (-0.10574444253827629, -0.80816264614636646, 0.57938868667412902),
        (-0.10574408792844124, -0.80816047738475361, 0.57939177648757634),
        (-0.10574408812643833, -0.80816047735668162, 0.57939177649059592),
    ]])
    b = _poly_from_xyz([[
        (-0.1057440881264381, -0.80816047735668017, 0.57939177649059825),
        (-0.10574408802743954, -0.80816047737071606, 0.57939177648908835),
        (-0.10574408812649677, -0.8081604773570521, 0.57939177649006868),
        (-0.10574408812649701, -0.80816047735705354, 0.57939177649006646),
        (-0.10574408802703171, -0.80816047737077379, 0.57939177648908202),
        (-0.10574408792844098, -0.80816047738475194, 0.57939177648757834),
        (-0.10574408792838257, -0.80816047738438168, 0.5793917764881058),
        (-0.1057440879283823, -0.80816047738438002, 0.57939177648810791),
        (-0.10574407993470979, -0.80816042849578984, 0.57939184613891748),
        (-0.10574408013270691, -0.80816042846771807, 0.57939184614193739),
    ]])
    c = po.boolean_union(a, b)
    assert c is not None


def test_bug6_union_nonempty():
    # s2polygon_test.d:1113-1146 — loop 0 edge 0 crosses loop 1 edge 4.
    a = _poly_from_xyz([[
        (-0.10618849949725141, -0.80552159562437586, 0.58297423747304822),
        (-0.10618849959636036, -0.80552159561106063, 0.58297423747339361),
        (-0.10618849949722192, -0.80552159562415893, 0.5829742374733532),
        (-0.10618834540082922, -0.80552043435619214, 0.58297587011440333),
        (-0.10618834559910612, -0.80552043432999554, 0.58297587011448437),
        (-0.10618849969546933, -0.80552159559774539, 0.58297423747373922),
        (-0.10618849969546955, -0.80552159559774716, 0.582974237473737),
        (-0.10618849969549882, -0.80552159559796233, 0.58297423747343424),
        (-0.10618849959710704, -0.80552159561096182, 0.58297423747339394),
        (-0.10618849949725161, -0.80552159562437742, 0.58297423747304589),
    ]])
    b = _poly_from_xyz([[
        (-0.10618856154870562, -0.80552206324314812, 0.58297358004005528),
        (-0.10618849949722212, -0.80552159562416048, 0.58297423747335086),
        (-0.10618849969549901, -0.80552159559796388, 0.58297423747343191),
        (-0.10618856174698249, -0.8055220632169513, 0.58297358004013622),
        (-0.10618857104277038, -0.80552213326985989, 0.58297348155149287),
        (-0.10618857084449349, -0.80552213329605649, 0.58297348155141182),
    ]])
    c = po.boolean_union(a, b)
    assert c is not None
