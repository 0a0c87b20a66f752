"""Port of test/s2/s2contains_point_query_test.d: the three vertex
models over a mixed index, GetContainingShapes against S2Loop.contains,
and VisitIncidentEdges."""

import numpy as np

from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.boolean_operation import CLOSED, OPEN, SEMI_OPEN
from s2geometry_d_ray.core.contains_point import ContainsPointQuery
from s2geometry_d_ray.core.loop import Loop
from s2geometry_d_ray.core.shapes import (LaxPolygonShape,
                                          LaxPolylineShape,
                                          PointVectorShape)

INDEX_TEXT = "0:0 # 0:1, 0:2 # 0:5, 0:7, 2:6"


def _shapes_for(index_text):
    idx = textformat.make_index(index_text)
    shapes = []
    sid = 0
    if len(idx["points"]):
        shapes.append((sid, PointVectorShape(idx["points"])))
        sid += 1
    for line in idx["polylines"]:
        shapes.append((sid, LaxPolylineShape(line)))
        sid += 1
    for poly in idx["polygons"]:
        shapes.append((sid, LaxPolygonShape.from_polygon(poly)))
        sid += 1
    return shapes


def _pt(txt):
    return textformat.make_point(txt)


def test_vertex_model_open():
    shapes = _shapes_for(INDEX_TEXT)
    q = ContainsPointQuery(shapes, OPEN)
    for txt in ("0:0", "0:1", "0:2", "0:5", "0:7", "2:6", "10:10"):
        assert not q.contains(_pt(txt)), txt
    assert q.contains(_pt("1:6"))
    assert not q.shape_contains(shapes[1][1], _pt("1:6"))
    assert q.shape_contains(shapes[2][1], _pt("1:6"))
    assert not q.shape_contains(shapes[2][1], _pt("0:5"))
    assert not q.shape_contains(shapes[2][1], _pt("0:7"))


def test_vertex_model_semi_open():
    shapes = _shapes_for(INDEX_TEXT)
    q = ContainsPointQuery(shapes, SEMI_OPEN)
    for txt in ("0:0", "0:1", "0:2", "0:5", "2:6", "10:10"):
        assert not q.contains(_pt(txt)), txt
    assert q.contains(_pt("0:7"))  # contained vertex
    assert q.contains(_pt("1:6"))
    assert not q.shape_contains(shapes[1][1], _pt("1:6"))
    assert q.shape_contains(shapes[2][1], _pt("1:6"))
    assert not q.shape_contains(shapes[2][1], _pt("0:5"))
    assert q.shape_contains(shapes[2][1], _pt("0:7"))


def test_vertex_model_closed():
    shapes = _shapes_for(INDEX_TEXT)
    q = ContainsPointQuery(shapes, CLOSED)
    for txt in ("0:0", "0:1", "0:2", "0:5", "0:7", "2:6", "1:6"):
        assert q.contains(_pt(txt)), txt
    assert not q.contains(_pt("10:10"))
    assert not q.shape_contains(shapes[1][1], _pt("1:6"))
    assert q.shape_contains(shapes[2][1], _pt("1:6"))
    assert q.shape_contains(shapes[2][1], _pt("0:5"))
    assert q.shape_contains(shapes[2][1], _pt("0:7"))


def _sample_in_cap(center, radius_rad, rng):
    from s2geometry_d_ray.core import coords
    z = np.asarray(center, dtype=np.float64)
    x = np.asarray(coords.get_frame(z))
    import math
    h = 1 - math.cos(radius_rad)
    cos_theta = 1 - h * rng.random()
    sin_theta = math.sqrt(max(0.0, 1 - cos_theta * cos_theta))
    phi = 2 * math.pi * rng.random()
    d = (math.cos(phi) * sin_theta * x[0] + math.sin(phi) * sin_theta * x[1]
         + cos_theta * z)
    return d / np.linalg.norm(d)


def test_get_containing_shapes():
    """Query agrees with S2Loop.contains (SEMI_OPEN default) for random
    regular loops (s2contains_point_query_test.d:104-131, reduced)."""
    rng = np.random.default_rng(3)
    max_radius = 10.0 / 6371.0  # ~10 km
    center = rng.normal(size=3)
    center /= np.linalg.norm(center)
    loops = []
    for _ in range(30):
        c = _sample_in_cap(center, max_radius, rng)
        loops.append(Loop.make_regular_xyz(c, rng.random() * max_radius, 10))
    shapes = [(i, LaxPolygonShape([np.asarray(lp.vertices)]))
              for i, lp in enumerate(loops)]
    q = ContainsPointQuery(shapes)
    for _ in range(30):
        p = _sample_in_cap(center, max_radius, rng)
        expected = [i for i, lp in enumerate(loops)
                    if lp.contains_point(tuple(p))]
        for i, lp in enumerate(loops):
            assert q.shape_contains(shapes[i][1], p) == \
                lp.contains_point(tuple(p))
        assert q.get_containing_shapes(p) == expected


def test_visit_incident_edges():
    shapes = _shapes_for("0:0 | 1:1 # 1:1, 1:2 # 1:2, 1:3, 2:2")
    q = ContainsPointQuery(shapes)

    def incident(p_txt):
        ids = []
        q.visit_incident_edges(_pt(p_txt),
                               lambda eid, edge: (ids.append(eid), True)[1])
        return ids

    assert incident("0:0") == [(0, 0)]
    assert incident("1:1") == [(0, 1), (1, 0)]
    assert incident("1:2") == [(1, 0), (2, 0), (2, 2)]
    assert incident("1:3") == [(2, 0), (2, 1)]
    assert incident("2:2") == [(2, 1), (2, 2)]
