"""Query parser/classifier tests (reference dispatch semantics,
/root/reference/search/retrieval/retrieval_execution/retrieval_execution.py:53-94)."""

from __future__ import annotations

from rayindex.config import AnalyzerConfig
from rayindex.query import (
    BooleanQuery,
    ProximityQuery,
    TermsQuery,
    classify,
    parse_query,
    separate_mix,
)

REF = AnalyzerConfig(mode="reference")


def test_classify():
    assert classify("#3(open,file)") == "proximity"
    assert classify("a AND b") == "boolean"
    assert classify('"two words"') == "phrase"
    assert classify("plain words") == "term"
    # boolean wins over phrase when both present (reference order :63-70)
    assert classify('"x y" AND z') == "boolean"


def test_proximity_parse():
    q = parse_query("#3(Opening,files)", REF)
    assert isinstance(q, ProximityQuery)
    assert q.k == 3
    # stemmed but NOT stopword-filtered (preprocessing.py:57-63)
    assert q.terms == ["open", "file"]
    q2 = parse_query("#15(the,of)", REF)
    assert q2.terms == ["the", "of"]  # stopwords survive here


def test_plain_parse_full_chain():
    q = parse_query("The Running foxes", REF)
    assert isinstance(q, TermsQuery)
    # 'The' is a stopword → empty sublist preserved at parse, dropped later
    assert q.parts == [[], ["run"], ["fox"]]


def test_phrase_parse():
    q = parse_query('"open the file" handle', REF)
    assert isinstance(q, TermsQuery)
    # quoted phrase first, then residual singles (retrieval_execution.py:85-93)
    assert q.parts == [["open", "file"], ["handl"]]


def test_boolean_parse():
    q = parse_query("apple AND (banana OR cherry)", REF)
    assert isinstance(q, BooleanQuery)
    assert q.operators == ["AND", "OR"]
    assert q.terms == [["appl"], ["banana"], ["cherri"]]
    assert q.paren_positions == [1]


def test_boolean_phrase_operand():
    q = parse_query('"global lock" AND NOT flush', REF)
    assert q.terms == [["global", "lock"], ["flush"]]
    assert q.operators == ["AND", "NOT"]


def test_boolean_clean_term_strips_digits():
    # clean_term removes non-alpha incl. digits (preprocessing.py:127-130)
    q = parse_query("abc123 AND def45", REF)
    assert q.terms == [["abc"], ["def"]]


def test_separate_mix():
    singles, phrases = separate_mix([["a"], ["b", "c"], [], ["d"]])
    assert singles == ["a", "d"]
    assert phrases == [["b", "c"]]
