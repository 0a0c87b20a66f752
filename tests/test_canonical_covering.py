"""isCanonical / canonicalizeCovering — ported from the reference
test/s2/s2region_coverer_test.d:306-455 corner cases."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_d_ray.core import cellid as ci
from s2geometry_d_ray.core.coverer import (canonicalize_covering,
                                           is_canonical)


def cells(*strs):
    return [int(ci.from_debug_string(s)) for s in strs]


def check_canonicalize(input_strs, expected_strs, **opts):
    actual = cells(*input_strs)
    expected = cells(*expected_strs)
    assert not is_canonical(actual, **opts)
    out = canonicalize_covering(actual, **opts)
    assert is_canonical(out, **opts)
    assert [int(c) for c in out] == sorted(expected)


def test_invalid_cell_id():
    assert is_canonical(cells("1/"))
    assert not is_canonical([0])


def test_unsorted():
    assert is_canonical(cells("1/1", "1/3"))
    assert not is_canonical(cells("1/3", "1/1"))


def test_overlapping():
    assert is_canonical(cells("1/2", "1/33"))
    assert not is_canonical(cells("1/3", "1/33"))


def test_min_level():
    assert is_canonical(cells("1/31"), min_level=2)
    assert not is_canonical(cells("1/3"), min_level=2)


def test_max_level():
    assert is_canonical(cells("1/31"), max_level=2)
    assert not is_canonical(cells("1/312"), max_level=2)


def test_level_mod():
    assert is_canonical(cells("1/31"), level_mod=2)
    assert not is_canonical(cells("1/312"), level_mod=2)


def test_max_cells():
    assert is_canonical(cells("1/1", "1/3"), max_cells=2)
    assert not is_canonical(cells("1/1", "1/3", "2/"), max_cells=2)
    assert is_canonical(cells("1/123", "2/1", "3/0122"), max_cells=2)


def test_normalized():
    assert is_canonical(cells("1/01", "1/02", "1/03", "1/10", "1/11"))
    assert not is_canonical(cells("1/00", "1/01", "1/02", "1/03", "1/10"))
    assert is_canonical(cells("0/22", "1/01", "1/02", "1/03", "1/10"))
    assert not is_canonical(cells("0/22", "1/00", "1/01", "1/02", "1/03"))
    assert is_canonical(cells(
        "1/1101", "1/1102", "1/1103", "1/1110",
        "1/1111", "1/1112", "1/1113", "1/1120",
        "1/1121", "1/1122", "1/1123", "1/1130",
        "1/1131", "1/1132", "1/1133", "1/1200"),
        max_cells=20, level_mod=2)
    assert not is_canonical(cells(
        "1/1100", "1/1101", "1/1102", "1/1103",
        "1/1110", "1/1111", "1/1112", "1/1113",
        "1/1120", "1/1121", "1/1122", "1/1123",
        "1/1130", "1/1131", "1/1132", "1/1133"),
        max_cells=20, level_mod=2)


def test_canonicalize_unsorted_duplicate_cells():
    check_canonicalize(
        ["1/200", "1/13122", "1/20", "1/131", "1/13100"],
        ["1/131", "1/20"])


def test_canonicalize_max_level_exceeded():
    check_canonicalize(
        ["0/3001", "0/3002", "4/012301230123"],
        ["0/30", "4/01"], max_level=2)


def test_canonicalize_wrong_level_mod():
    check_canonicalize(
        ["0/0", "1/11", "2/222", "3/3333"],
        ["0/0", "1/1", "2/2", "3/3333"], min_level=1, level_mod=3)


def test_canonicalize_replaced_by_parent():
    check_canonicalize(
        ["0/00", "0/01", "0/02", "0/03", "0/10", "0/11", "0/12", "0/13",
         "0/20", "0/21", "0/22", "0/23", "0/30", "0/31", "0/32", "0/33"],
        ["0/"], level_mod=2)


def test_canonicalize_denormalized_cell_union():
    check_canonicalize(
        ["0/", "1/130", "1/131", "1/132", "1/133"],
        ["0/0", "0/1", "0/2", "0/3", "1/130", "1/131", "1/132", "1/133"],
        min_level=1, level_mod=2)


def test_canonicalize_max_cells_merges_smallest():
    check_canonicalize(
        ["0/", "1/0", "1/1", "2/01300", "2/0131313"],
        ["0/", "1/", "2/013"], max_cells=3)


def test_canonicalize_max_cells_merges_repeatedly():
    check_canonicalize(
        ["0/0121", "0/0123", "1/0", "1/1", "1/2", "1/30", "1/32", "1/33",
         "1/311", "1/312", "1/313", "1/3100", "1/3101", "1/3103",
         "1/31021", "1/31023"],
        ["0/0121", "0/0123", "1/"], max_cells=8)


def test_debug_string_roundtrip():
    for s in ["0/", "5/3210", "1/000", "3/13"]:
        assert ci.to_debug_string(ci.from_debug_string(s)) == s
