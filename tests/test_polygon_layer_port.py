"""Port of test/s2/builder/util/s2polygon_layer_test.d (structural
cases): loops assembled from builder edges, holes merged with shells via
sibling cancellation and left-turn walks (TrianglePyramid's 9-triangle
pyramid -> 6 positive triangles), complex nesting, and the
touching-loop stress cases.  Loops are compared as multisets of
rotation-normalized vertex chains (the reference compares the
InitNested string form; loop depth assignment is the polygon's
concern, not the layer's)."""

import numpy as np
import pytest

from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.builder import process_edges
from s2geometry_d_ray.core.graph_loops import (GraphLoopError,
                                               get_directed_loops,
                                               get_undirected_components)
from s2geometry_d_ray.core.serialization import IdSetLexicon


def _canon_loop(pts):
    pts = tuple(pts)
    best = min(range(len(pts)), key=lambda k: pts[k:] + pts[:k])
    return pts[best:] + pts[:best]


class _LayerHarness:
    """The faithful S2PolygonLayer pipeline (s2polygon_layer.d:153-196):
    processEdges(DISCARD degenerate, KEEP duplicates, DISCARD siblings)
    then getDirectedLoops(SIMPLE) (or getUndirectedComponents)."""

    def __init__(self, edge_type="directed"):
        self.edge_type = edge_type
        self.vmap = {}
        self.vertices = []
        self.edges = []
        self.ids = []
        self.next_id = 0

    def _vid(self, txt):
        if txt not in self.vmap:
            self.vmap[txt] = len(self.vertices)
            self.vertices.append(np.asarray(textformat.make_point(txt),
                                            dtype=np.float64))
            self._names = None
        return self.vmap[txt]

    def _add_chain(self, pts, closed):
        vs = [self._vid(p) for p in pts]
        if closed:
            vs.append(vs[0])
        for k in range(len(vs) - 1):
            self.edges.append((vs[k], vs[k + 1]))
            self.ids.append([self.next_id])
            self.next_id += 1
            if self.edge_type == "undirected":
                self.edges.append((vs[k + 1], vs[k]))
                self.ids.append([])

    def add_loop(self, text):
        self._add_chain([t.strip() for t in text.split(",")], True)

    def add_polyline(self, text):
        self._add_chain([t.strip() for t in text.split(",")], False)

    def loops(self):
        lex = IdSetLexicon()
        sids = [lex.add(i) for i in self.ids]
        edges, out_sids, _, error = process_edges(
            self.edges, sids, lex, self.edge_type,
            degenerate_edges="discard", duplicate_edges="keep",
            sibling_pairs="discard")
        assert error is None
        ids = [list(lex.id_set(s)) for s in out_sids]
        vertices = np.asarray(self.vertices)
        names = {v: k for k, v in self.vmap.items()}
        if self.edge_type == "directed":
            edge_loops = get_directed_loops(vertices, edges, ids, "simple")
        else:
            comps = get_undirected_components(vertices, edges, ids,
                                              "simple")
            edge_loops = [lp for comp in comps for lp in comp[0]]
        return sorted(
            _canon_loop([names[e[0]] for e in lp]) for lp in edge_loops)


def _run(inputs, edge_type="directed"):
    h = _LayerHarness(edge_type)
    for s in inputs:
        for chunk in s.split(";"):
            if chunk.strip():
                h.add_loop(chunk)
    return h.loops()


def _expect(expected_str):
    return sorted(
        _canon_loop([t.strip() for t in chunk.split(",")])
        for chunk in expected_str.split(";") if chunk.strip())


def check(inputs, expected_str):
    assert _run(inputs, "directed") == _expect(expected_str)


def check_unchanged(input_str):
    check([input_str], input_str)


def test_no_loops():
    check_unchanged("")


def test_small_loop():
    check_unchanged("0:0, 0:1, 1:1")


def test_three_loops():
    check_unchanged("0:1, 1:1, 0:0; "
                    "3:3, 3:6, 6:6, 6:3; "
                    "4:4, 4:5, 5:5, 5:4")


def test_partial_loop_fails():
    h = _LayerHarness("directed")
    h.add_polyline("0:1, 2:3, 4:5")
    with pytest.raises(GraphLoopError):
        h.loops()


def test_three_loops_undirected():
    h = _LayerHarness("undirected")
    for chunk in ("0:1, 1:1, 0:0", "3:3, 3:6, 6:6, 6:3",
                  "4:4, 4:5, 5:5, 5:4"):
        h.add_loop(chunk)
    assert h.loops() == _expect("0:1, 1:1, 0:0; "
                                "3:3, 3:6, 6:6, 6:3; "
                                "4:4, 4:5, 5:5, 5:4")


def test_three_loops_into_one():
    check([
        "10:0, 0:0, 0:10, 5:10, 10:10, 10:5",
        "0:10, 0:15, 5:15, 5:10",
        "10:10, 5:10, 5:5, 10:5"],
        "10:5, 10:0, 0:0, 0:10, 0:15, 5:15, 5:10, 5:5")


def test_triangle_pyramid():
    check([
        "0:0, 0:2, 0:4, 0:6, 1:5, 2:4, 3:3, 2:2, 1:1",
        "0:2, 1:1, 1:3",
        "0:4, 1:3, 1:5",
        "1:3, 2:2, 2:4"],
        "0:4, 0:6, 1:5; 2:4, 3:3, 2:2; 2:2, 1:1, 1:3; "
        "1:1, 0:0, 0:2; 1:3, 0:2, 0:4; 1:3, 1:5, 2:4")


def test_complex_nesting():
    check_unchanged(
        "47:15, 47:5, 5:5, 5:15; "
        "35:12, 35:7, 27:7, 27:12; "
        "1:50, 50:50, 50:1, 1:1; "
        "42:22, 10:22, 10:25, 42:25; "
        "47:30, 47:17, 5:17, 5:30; "
        "7:27, 45:27, 45:20, 7:20; "
        "37:7, 37:12, 45:12, 45:7; "
        "47:47, 47:32, 5:32, 5:47; "
        "50:60, 50:55, 1:55, 1:60; "
        "25:7, 17:7, 17:12, 25:12; "
        "7:7, 7:12, 15:12, 15:7")


def test_five_loops_touching_at_one_common_point():
    check_unchanged("0:0, 0:10, 10:10, 10:0; "
                    "0:0, 1:9, 9:9, 9:1; "
                    "0:0, 2:8, 8:8, 8:2; "
                    "0:0, 3:7, 7:7, 7:3; "
                    "0:0, 4:6, 6:6, 6:4")


def test_four_nested_diamonds_touching_at_two_points_per_pair():
    check([
        "0:10, -10:0, 0:-10, 10:0",
        "0:-20, -10:0, 0:20, 10:0",
        "0:-10, -5:0, 0:10, 5:0",
        "0:5, -5:0, 0:-5, 5:0"],
        "10:0, 0:10, -10:0, 0:20; "
        "0:-20, -10:0, 0:-10, 10:0; "
        "5:0, 0:-10, -5:0, 0:-5; "
        "0:5, -5:0, 0:10, 5:0")


def test_seven_diamonds_touching_at_one_point_per_pair():
    check_unchanged("0:-70, -70:0, 0:70, 70:0; "
                    "0:-70, -60:0, 0:60, 60:0; "
                    "0:-50, -60:0, 0:50, 50:0; "
                    "0:-40, -40:0, 0:50, 40:0; "
                    "0:-30, -30:0, 0:30, 40:0; "
                    "0:-20, -20:0, 0:30, 20:0; "
                    "0:-10, -20:0, 0:10, 10:0")
