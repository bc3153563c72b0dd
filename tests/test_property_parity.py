"""Property-based differential parity: our pure kernels vs the actual
reference implementations (imported from /root/reference) on randomized
inputs — tokenizer, URL hash/normalize, depth recurrence, crc64, simhash,
exhash. Golden vectors prove the known cases; hypothesis hunts the edges
(unicode categories, group-symbol runs, dot runs, odd URLs)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from spacetime_crawler4_spark.functions.crc import crc64
from spacetime_crawler4_spark.functions.exhash import exhash
from spacetime_crawler4_spark.functions.simhash import simhash32_str
from spacetime_crawler4_spark.functions.tokenizer import tokenize, word_count
from spacetime_crawler4_spark.functions.urls import get_urlhash, normalize_url, rel_dirdepth

# text rich in tokenizer edge characters: group symbols, dots, unicode
_token_alphabet = st.sampled_from(
    list(string.ascii_letters + string.digits)
    + list("-./_~.'\"!?,;:()[]{}<>@#$%^&*+=|\\ \t\n")
    + list("日本語русскийλπ½²é—…")
)
_texts = st.text(alphabet=_token_alphabet, max_size=300)

_url_path_chars = st.sampled_from(list(string.ascii_lowercase + string.digits + "/-._~%?&=#;"))
_urls = st.builds(
    lambda host, path: f"http://{host}.test/{path}",
    st.sampled_from(["a", "www.b", "deep.sub.c"]),
    st.text(alphabet=_url_path_chars, max_size=60),
)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tokenizer_matches_reference(ref, text):
    assert tokenize(text) == ref.tokenize(text)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_word_count_and_simhash_match_reference(ref, text):
    toks = tokenize(text)
    counts = word_count(toks)
    assert counts == ref.word_count(toks)
    if counts:
        assert simhash32_str(counts) == ref.simhash(counts)


@settings(max_examples=300, deadline=None)
@given(_urls)
def test_urlhash_and_normalize_match_reference(ref, url):
    assert normalize_url(url) == ref.normalize(url)
    assert get_urlhash(url) == ref.get_urlhash(url)


@settings(max_examples=300, deadline=None)
@given(_urls, _urls)
def test_rel_dirdepth_matches_reference(ref, child, parent):
    assert rel_dirdepth(child, parent) == ref.compute_rel_dirdepth(child, parent)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_crc64_and_exhash_match_reference(ref, data):
    assert crc64(data) == ref.crc64(data)
    assert exhash(data) == ref.exhash(data, len(data))
