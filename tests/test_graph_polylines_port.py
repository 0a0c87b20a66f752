"""Port of GetPolylines.UndirectedDegeneratePaths / Walks from
test/s2/builder/graph_test.d (:124-158): degenerate edges mixed with a
chain whose every vertex also carries a degenerate edge, assembled as
PATHs (break at non-interior vertices) and WALKs (loops spliced in)."""

from s2geometry_d_ray.core.builder import get_polylines


def _undirected_graph(input_polylines):
    """Vertices by first occurrence; each input edge becomes the forward
    edge with its input id plus an unlabeled reverse sibling (the
    builder's undirected representation with KEEP options)."""
    vmap = {}

    def vid(name):
        if name not in vmap:
            vmap[name] = len(vmap)
        return vmap[name]

    edges, ids = [], []
    next_id = 0
    for line in input_polylines:
        vs = [vid(p) for p in line]
        for k in range(len(vs) - 1):
            edges.append((vs[k], vs[k + 1]))
            ids.append([next_id])
            edges.append((vs[k + 1], vs[k]))
            ids.append([])
            next_id += 1
    return edges, ids


INPUT = [
    ["1:1", "1:1"],
    ["0:0", "0:0", "0:1", "0:1", "0:2", "0:2"],
    ["1:1", "1:1"],
]


def test_undirected_degenerate_paths():
    edges, ids = _undirected_graph(INPUT)
    polylines = get_polylines(edges, ids, "undirected", "path")
    assert len(polylines) == 7


def test_undirected_degenerate_walks():
    edges, ids = _undirected_graph(INPUT)
    polylines = get_polylines(edges, ids, "undirected", "walk")
    assert len(polylines) == 2
    assert len(polylines[0]) == 2
    assert len(polylines[1]) == 5


def test_directed_simple_chain_path():
    # A directed chain stays one polyline; a branch splits it.
    edges = [(0, 1), (1, 2), (2, 3)]
    ids = [[0], [1], [2]]
    polylines = get_polylines(edges, ids, "directed", "path")
    assert polylines == [[(0, 1), (1, 2), (2, 3)]]

    edges = [(0, 1), (1, 2), (1, 3)]
    ids = [[0], [1], [2]]
    polylines = get_polylines(edges, ids, "directed", "path")
    assert sorted(len(p) for p in polylines) == [1, 1, 1]


def test_directed_loop_walk():
    # A figure-eight: two loops sharing a vertex assemble into ONE walk.
    edges = [(0, 1), (1, 0), (0, 2), (2, 0)]
    ids = [[0], [1], [2], [3]]
    polylines = get_polylines(edges, ids, "directed", "walk")
    assert len(polylines) == 1
    assert len(polylines[0]) == 4
