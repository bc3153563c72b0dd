"""CRC-32/64, exhash, simhash parity vs the reference implementations."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from spacetime_crawler4_spark.functions.crc import crc32, crc64, crc64_batch
from spacetime_crawler4_spark.functions.exhash import exhash
from spacetime_crawler4_spark.functions.simhash import (
    hamming32,
    simhash32,
    simhash32_str,
)


def test_crc_check_values():
    # reference test/test_crc32.py:6-17 and test/test_crc64.py:6-15
    assert crc32(b"123456789") == 0xCBF43926
    assert crc64(b"123456789") == 0x995DC9BBDF1939FA
    assert crc32(b"") == 0
    assert crc64(b"") == 0


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_crc_differential(ref, data):
    assert crc32(data) == ref.crc32(data)
    assert crc64(data) == ref.crc64(data)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(max_size=32), max_size=40))
def test_crc64_batch(ref, items):
    got = crc64_batch(items)
    assert got.dtype == np.uint64
    assert [int(x) for x in got] == [ref.crc64(b) for b in items]


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_exhash_differential(ref, content):
    assert exhash(content) == ref.exhash(content, len(content))


_word = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=12
)
_wordcounts = st.dictionaries(_word, st.integers(min_value=1, max_value=50), max_size=30)


@settings(max_examples=150, deadline=None)
@given(_wordcounts)
def test_simhash_differential(ref, wc):
    expected_str = ref.simhash(wc)
    assert simhash32_str(wc) == expected_str
    assert simhash32(wc) == int(expected_str, 2)


@settings(max_examples=100, deadline=None)
@given(_wordcounts, _wordcounts)
def test_hamming_and_threshold(ref, wc1, wc2):
    s1, s2 = ref.simhash(wc1), ref.simhash(wc2)
    d = ref.hamming_distance(s1, s2)
    assert hamming32(int(s1, 2), int(s2, 2)) == d
    assert (d <= 5) == ref.compare_fingerprints(s1, s2)
