"""Tokenizer parity: golden vector + differential fuzz vs the reference."""

import hypothesis.strategies as st
from hypothesis import given, settings

from spacetime_crawler4_spark.functions.tokenizer import tokenize, word_count
from spacetime_crawler4_spark.functions.textnorm import (
    STOPWORDS_SET,
    is_contraction,
    is_stopword,
)

# the golden input/output pair from reference test/test_tokenize.py:23-51
GOLDEN_TEXT = """abc. def. ghi. jkl. m~no pqr.student
i can't handle this Probably? un+likely	TAB	TAB2	TAB3..........//
EDGE CASE !? !?? 最悪qq //.com/test??????????????@@ @@ tew@
~abc~def~ghijkl.vwx,yz
eeeeeeeeeeeeeeerrrrrrrrrror no pavor key_word_python_file _abc -v-wy ...cxd.... rt.a.
``  ``cv` -v.w~x/yz             :-) ._. -w- ||||		|-w-._.:-)|:-D
    		    \x00\x01\x1f<-nonprintables->\x02\x7f\x10\x21;;;-3-:$3.025\x21 あああああ 日本語...русский./de|.*eeee
groß pastry.,[]\r\n200 TEST Test TEsT._./~~~TeSt 『Fate/stay night』（フェイト ステイナイト）は、TYPE-MOON開発による日本のコンピューターゲーム。
《Fate/stay night》（日语：フェイト/ステイナイト，中文：命運／停駐之夜、命運守護夜、命运之夜）是由TYPE-MOON於2004年1月30日發售的PC平台十八禁文字冒險遊戲，
也是TYPE-MOON商業化後初次亮相的作品 >_<"''foobar"'"']]]....,,;||:) abc@gmail.com"""

GOLDEN_TOKENS = [
    "abc", "def", "ghi", "jkl", "m~no", "pqr.student",
    "handle", "probably", "un", "likely", "tab", "tab2",
    "tab3", "edge", "case", "最悪qq", "//.com/test", "tew",
    "~abc~def~ghijkl.vwx", "yz", "eeeeeeeeeeeeeeerrrrrrrrrror",
    "pavor", "key_word_python_file", "_abc", "-v-wy", "cxd", "rt.a",
    "cv", "-v.w~x/yz", "-w-", "-w-._", "-d", "-nonprintables-",
    "-3-", "3.025", "あああああ", "日本語", "русский./de", "eeee",
    "groß", "pastry", "200", "test", "test", "test._./~~~test",
    "fate/stay", "night", "フェイト", "ステイナイト", "は",
    "type-moon開発による日本のコンピューターゲーム",
    "fate/stay", "night", "日语", "フェイト/ステイナイト",
    "中文", "命運", "停駐之夜", "命運守護夜", "命运之夜",
    "是由type-moon於2004年1月30日發售的pc平台十八禁文字冒險遊戲",
    "也是type-moon商業化後初次亮相的作品", "foobar", "abc", "gmail.com",
]


def test_golden_vector():
    assert tokenize(GOLDEN_TEXT) == GOLDEN_TOKENS


def test_stopword_and_contraction_sets():
    assert len(STOPWORDS_SET) == 174
    assert is_stopword("the") and is_stopword("can't")
    assert not is_stopword("spark")
    assert is_contraction("won't") and is_contraction("y'all")
    # generic suffix patterns (-n't etc.)
    assert is_contraction("shouldn't've") or is_contraction("zzzn't")


def test_word_count():
    assert word_count(["a", "b", "a"]) == {"a": 2, "b": 1}


# free-text fuzz: printable + CJK + punctuation + symbols
_alphabet = st.sampled_from(
    list("abcXYZ019 .-/_~!?@#$%^&*()[]{}|\\'\"`\t\n;:,<>+=")
    + list("日本語あいフェ語русскийß最")
)
_text = st.text(alphabet=_alphabet, max_size=300)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_differential_vs_reference(ref, text):
    assert tokenize(text) == ref.tokenize(text)


@settings(max_examples=100, deadline=None)
@given(_text)
def test_word_count_differential(ref, text):
    toks = tokenize(text)
    assert word_count(toks) == ref.word_count(toks)
