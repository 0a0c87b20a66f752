"""Port of the ProcessEdges cases of test/s2/builder/graph_test.d
(:191-443): every DegenerateEdges x DuplicateEdges x SiblingPairs x
EdgeType combination the reference exercises, with exact output edge
sequences and merged input-id sets."""

import pytest

from s2geometry_d_ray.core.builder import process_edges
from s2geometry_d_ray.core.serialization import IdSetLexicon


def check(input_edges, expected, edge_type="directed",
          degenerate_edges="keep", duplicate_edges="keep",
          sibling_pairs="keep", expect_error=None,
          expect_edge_type=None):
    """input_edges / expected: [(u, v)] or [(u, v, [input_ids])]."""
    lex = IdSetLexicon()
    edges, ids = [], []
    for e in input_edges:
        edges.append((e[0], e[1]))
        ids.append(lex.add(e[2] if len(e) > 2 else ()))
    out_edges, out_ids, new_type, error = process_edges(
        edges, ids, lex, edge_type, degenerate_edges, duplicate_edges,
        sibling_pairs)
    assert error == expect_error
    exp_edges = [(e[0], e[1]) for e in expected]
    exp_ids = [tuple(e[2]) if len(e) > 2 else () for e in expected]
    assert out_edges == exp_edges
    assert [tuple(lex.id_set(s)) for s in out_ids] == exp_ids
    if expect_edge_type is not None:
        assert new_type == expect_edge_type


def test_discard_degenerate_edges():
    check([(0, 0), (0, 0)], [], degenerate_edges="discard")


def test_keep_duplicate_degenerate_edges():
    check([(0, 0), (0, 0)], [(0, 0), (0, 0)])


def test_merge_duplicate_degenerate_edges():
    check([(0, 0, [1]), (0, 0, [2])], [(0, 0, [1, 2])],
          duplicate_edges="merge")


def test_merge_undirected_duplicate_degenerate_edges():
    check([(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
          [(0, 0, [1, 2]), (0, 0, [1, 2])],
          edge_type="undirected", duplicate_edges="merge")


def test_converted_undirected_degenerate_edges():
    check([(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
          [(0, 0, [1, 2]), (0, 0, [1, 2])],
          edge_type="undirected", sibling_pairs="require",
          expect_edge_type="directed")


def test_merge_converted_undirected_duplicate_degenerate_edges():
    check([(0, 0, [1]), (0, 0), (0, 0), (0, 0, [2])],
          [(0, 0, [1, 2])],
          edge_type="undirected", duplicate_edges="merge",
          sibling_pairs="require", expect_edge_type="directed")


def test_discard_excess_connected_degenerate_edges():
    kw = dict(degenerate_edges="discard_excess")
    check([(0, 0), (0, 1)], [(0, 1)], **kw)
    check([(0, 0), (1, 0)], [(1, 0)], **kw)
    check([(0, 1), (1, 1)], [(0, 1)], **kw)
    check([(1, 0), (1, 1)], [(1, 0)], **kw)


def test_discard_excess_isolated_degenerate_edges():
    check([(0, 0, [1]), (0, 0, [2])], [(0, 0, [1]), (0, 0, [2])],
          degenerate_edges="discard_excess")


def test_discard_excess_undirected_isolated_degenerate_edges():
    check([(0, 0, [1]), (0, 0), (0, 0, [2]), (0, 0)],
          [(0, 0, [1]), (0, 0), (0, 0, [2]), (0, 0)],
          edge_type="undirected", degenerate_edges="discard_excess")


def test_discard_excess_converted_undirected_isolated_degenerate_edges():
    check([(0, 0, [1]), (0, 0, [2]), (0, 0, [3]), (0, 0)],
          [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])],
          edge_type="undirected", degenerate_edges="discard_excess",
          sibling_pairs="require", expect_edge_type="directed")


def test_sibling_pairs_discard_merges_degenerate_edge_labels():
    for sp in ("discard", "discard_excess"):
        check([(0, 0, [1]), (0, 0, [2]), (0, 0, [3])],
              [(0, 0, [1, 2, 3]), (0, 0, [1, 2, 3]), (0, 0, [1, 2, 3])],
              sibling_pairs=sp)


def test_keep_sibling_pairs():
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)],
          degenerate_edges="discard")


def test_merge_duplicate_sibling_pairs():
    check([(0, 1), (0, 1), (1, 0)], [(0, 1), (1, 0)],
          degenerate_edges="discard", duplicate_edges="merge")


def test_discard_sibling_pairs():
    kw = dict(degenerate_edges="discard", sibling_pairs="discard")
    check([(0, 1), (1, 0)], [], **kw)
    check([(0, 1), (0, 1), (1, 0), (1, 0)], [], **kw)
    check([(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)], **kw)
    check([(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)], **kw)


def test_discard_sibling_pairs_merge_duplicates():
    kw = dict(degenerate_edges="discard", duplicate_edges="merge",
              sibling_pairs="discard")
    check([(0, 1), (0, 1), (1, 0), (1, 0)], [], **kw)
    check([(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)], **kw)
    check([(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)], **kw)


def test_discard_undirected_sibling_pairs():
    kw = dict(edge_type="undirected", degenerate_edges="discard",
              sibling_pairs="discard")
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1), (1, 0), (1, 0)], [], **kw)
    check([(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
          [(0, 1), (1, 0)], **kw)


def test_discard_excess_sibling_pairs():
    kw = dict(degenerate_edges="discard", sibling_pairs="discard_excess")
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1), (0, 1)], **kw)
    check([(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0), (1, 0)], **kw)


def test_discard_excess_sibling_pairs_merge_duplicates():
    kw = dict(degenerate_edges="discard", duplicate_edges="merge",
              sibling_pairs="discard_excess")
    check([(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1), (0, 1), (1, 0)], [(0, 1)], **kw)
    check([(0, 1), (1, 0), (1, 0), (1, 0)], [(1, 0)], **kw)


def test_discard_excess_undirected_sibling_pairs():
    kw = dict(edge_type="undirected", degenerate_edges="discard",
              sibling_pairs="discard_excess")
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1), (1, 0), (1, 0)],
          [(0, 1), (0, 1), (1, 0), (1, 0)], **kw)
    check([(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
          [(0, 1), (1, 0)], **kw)


def test_create_sibling_pairs():
    kw = dict(degenerate_edges="discard", sibling_pairs="create")
    check([(0, 1)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1)], [(0, 1), (0, 1), (1, 0), (1, 0)], **kw)


def test_require_sibling_pairs():
    kw = dict(degenerate_edges="discard", sibling_pairs="require")
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)], **kw)
    check([(0, 1)], [(0, 1), (1, 0)], expect_error="missing_sibling",
          **kw)


def test_create_undirected_sibling_pairs():
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)],
          degenerate_edges="discard", sibling_pairs="create",
          expect_edge_type="directed")
    check([(0, 1), (0, 1), (1, 0), (1, 0)], [(0, 1), (1, 0)],
          edge_type="undirected", degenerate_edges="discard",
          sibling_pairs="create", expect_edge_type="directed")
    check([(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
          [(0, 1), (0, 1), (1, 0), (1, 0)],
          edge_type="undirected", degenerate_edges="discard",
          sibling_pairs="create", expect_edge_type="directed")


def test_create_sibling_pairs_merge_duplicates():
    kw = dict(degenerate_edges="discard", duplicate_edges="merge",
              sibling_pairs="create")
    check([(0, 1)], [(0, 1), (1, 0)], **kw)
    check([(0, 1), (0, 1)], [(0, 1), (1, 0)], **kw)


def test_create_undirected_sibling_pairs_merge_duplicates():
    check([(0, 1), (1, 0)], [(0, 1), (1, 0)],
          degenerate_edges="discard", duplicate_edges="merge",
          sibling_pairs="create", expect_edge_type="directed")
    check([(0, 1), (0, 1), (0, 1), (1, 0), (1, 0), (1, 0)],
          [(0, 1), (1, 0)],
          edge_type="undirected", degenerate_edges="discard",
          duplicate_edges="merge", sibling_pairs="create",
          expect_edge_type="directed")
