"""Port of the GetDirectedLoops / GetDirectedComponents /
GetUndirectedComponents degenerate-edge cases from
test/s2/builder/graph_test.d (:52-122), fed through the faithful
processEdges + left-turn-map machinery."""

import numpy as np

from s2geometry_d_ray.core import textformat
from s2geometry_d_ray.core.builder import process_edges
from s2geometry_d_ray.core.graph_loops import (get_directed_components,
                                               get_directed_loops,
                                               get_undirected_components)
from s2geometry_d_ray.core.serialization import IdSetLexicon


class _GraphBuilder:
    def __init__(self):
        self.vmap = {}
        self.vertices = []
        self.edges = []
        self.ids = []
        self.next_id = 0

    def vid(self, txt):
        if txt not in self.vmap:
            self.vmap[txt] = len(self.vertices)
            self.vertices.append(
                np.asarray(textformat.make_point(txt), dtype=np.float64))
        return self.vmap[txt]

    def add_polyline(self, text, undirected=False):
        pts = [t.strip() for t in text.split(",")]
        vs = [self.vid(p) for p in pts]
        for k in range(len(vs) - 1):
            self.edges.append((vs[k], vs[k + 1]))
            self.ids.append([self.next_id])
            if undirected:
                self.edges.append((vs[k + 1], vs[k]))
                self.ids.append([])
            self.next_id += 1

    def processed(self, **kw):
        lex = IdSetLexicon()
        sids = [lex.add(i) for i in self.ids]
        out_edges, out_sids, _, error = process_edges(
            self.edges, sids, lex, **kw)
        assert error is None
        out_ids = [list(lex.id_set(s)) for s in out_sids]
        return np.asarray(self.vertices), out_edges, out_ids


def test_get_directed_loops_degenerate_edges():
    gb = _GraphBuilder()
    gb.add_polyline("1:1, 1:1")
    gb.add_polyline("0:0, 0:2, 2:2, 2:0, 0:0")
    gb.add_polyline("0:3, 3:3, 0:3")
    vertices, edges, ids = gb.processed(
        edge_type="directed", degenerate_edges="discard_excess",
        duplicate_edges="keep", sibling_pairs="keep")
    loops = get_directed_loops(vertices, edges, ids, "simple")
    assert len(loops) == 3
    assert len(loops[0]) == 1
    assert len(loops[1]) == 4
    assert len(loops[2]) == 2


def test_get_directed_components_degenerate_edges():
    gb = _GraphBuilder()
    gb.add_polyline("1:1, 1:1")
    gb.add_polyline("0:0, 0:2, 2:2, 2:0, 0:0")
    vertices, edges, ids = gb.processed(
        edge_type="directed", degenerate_edges="discard_excess",
        duplicate_edges="merge", sibling_pairs="create")
    components = get_directed_components(vertices, edges, ids, "keep")
    assert len(components) == 2
    assert len(components[0]) == 1
    assert len(components[0][0]) == 1
    assert len(components[1]) == 2
    assert len(components[1][0]) == 4
    assert len(components[1][1]) == 4


def test_get_undirected_components_degenerate_edges():
    gb = _GraphBuilder()
    gb.add_polyline("1:1, 1:1", undirected=True)
    gb.add_polyline("0:0, 0:2, 2:2, 2:0, 0:0", undirected=True)
    vertices, edges, ids = gb.processed(
        edge_type="undirected", degenerate_edges="discard_excess",
        duplicate_edges="keep", sibling_pairs="discard_excess")
    components = get_undirected_components(vertices, edges, ids, "circuit")
    assert len(components) == 2
    assert len(components[0][0]) == 1
    assert len(components[0][0][0]) == 1
    assert len(components[0][1]) == 1
    assert len(components[0][1][0]) == 1
    assert len(components[1][0]) == 1
    assert len(components[1][0][0]) == 4
    assert len(components[1][1]) == 1
    assert len(components[1][1][0]) == 4
