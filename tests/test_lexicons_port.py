"""Ports of test/s2/value_lexicon_test.d, sequence_lexicon_test.d and
id_set_lexicon_test.d (dedup ids, clear semantics, the singleton /
~index / empty-set encoding, float bit-equality)."""

from s2geometry_d_ray.core.serialization import (IdSetLexicon,
                                                 SequenceLexicon,
                                                 ValueLexicon)


def test_value_lexicon_duplicate_values():
    lex = ValueLexicon()
    assert lex.add(5) == 0
    assert lex.add(0) == 1
    assert lex.add(0) == 1
    assert lex.add(-3) == 2
    assert lex.add(5) == 0
    assert lex.add(0) == 1
    assert lex.add(0x7FFFFFFFFFFFFFFF) == 3
    assert lex.add(-0x8000000000000000) == 4
    assert lex.add(0x7FFFFFFFFFFFFFFF) == 3
    assert lex.add(-0x8000000000000000) == 4
    assert len(lex) == 5
    assert lex.value(0) == 5
    assert lex.value(1) == 0
    assert lex.value(2) == -3
    assert lex.value(3) == 0x7FFFFFFFFFFFFFFF
    assert lex.value(4) == -0x8000000000000000


def test_value_lexicon_clear():
    lex = ValueLexicon()
    assert lex.add(1) == 0
    assert lex.add(2) == 1
    assert lex.add(1) == 0
    lex.clear()
    assert lex.add(2) == 0
    assert lex.add(1) == 1
    assert lex.add(2) == 0


def test_value_lexicon_float_equality():
    """0.0 and -0.0 compare equal as values even though their bit
    patterns differ (value_lexicon_test.d FloatEquality)."""
    lex = ValueLexicon()
    a = (1.0, 0.0, 0.0)
    b = (1.0, -0.0, 0.0)
    c = (1.0, 0.0, -0.0)
    assert lex.add(a) == 0
    assert lex.add(b) == 0
    assert lex.add(c) == 0
    assert len(lex) == 1


def test_sequence_lexicon_int64():
    lex = SequenceLexicon()
    assert lex.add([]) == 0
    assert lex.add([5]) == 1
    assert lex.add([]) == 0
    assert lex.add([5, 5]) == 2
    assert lex.add([5, 0, -3]) == 3
    assert lex.add([5]) == 1
    assert lex.add([0x7FFFFFFFFFFFFFFF]) == 4
    assert lex.add([5, 0, -3]) == 3
    assert lex.add([]) == 0
    assert lex.size() == 5
    assert lex.sequence(0) == []
    assert lex.sequence(1) == [5]
    assert lex.sequence(2) == [5, 5]
    assert lex.sequence(3) == [5, 0, -3]
    assert lex.sequence(4) == [0x7FFFFFFFFFFFFFFF]


def test_sequence_lexicon_clear():
    lex = SequenceLexicon()
    assert lex.add([1]) == 0
    assert lex.add([2]) == 1
    lex.clear()
    assert lex.add([2]) == 0
    assert lex.add([1]) == 1


def test_sequence_lexicon_copy_constructor():
    original = SequenceLexicon()
    assert original.add([1, 2]) == 0
    lex = SequenceLexicon(original)
    assert lex.add([3, 4]) == 1
    assert lex.sequence(0) == [1, 2]
    assert lex.sequence(1) == [3, 4]


def test_id_set_lexicon_empty_set():
    lex = IdSetLexicon()
    assert lex.id_set(lex.add([])) == ()


def test_id_set_lexicon_singleton_sets():
    lex = IdSetLexicon()
    m = 2 ** 31 - 1
    assert lex.add([5]) == 5
    assert lex.add([0]) == 0
    assert lex.add_singleton(1) == 1
    assert lex.add([m]) == m
    assert lex.id_set(0) == (0,)
    assert lex.id_set(1) == (1,)
    assert lex.id_set(5) == (5,)
    assert lex.id_set(m) == (m,)


def test_id_set_lexicon_sets_are_sorted():
    lex = IdSetLexicon()
    assert lex.add([2, 5]) == ~0
    assert lex.add([3, 2, 5]) == ~1
    assert lex.add([5, 2]) == ~0
    assert lex.add([5, 3, 2, 5]) == ~1
    assert lex.id_set(~0) == (2, 5)
    assert lex.id_set(~1) == (2, 3, 5)


def test_id_set_lexicon_clear():
    lex = IdSetLexicon()
    assert lex.add([1, 2]) == ~0
    assert lex.add([3, 4]) == ~1
    lex.clear()
    assert lex.add([3, 4]) == ~0
    assert lex.add([1, 2]) == ~1
