"""Tests for the analysis chain (tokenize → casefold → stopword → stem).

Mirrors the reference semantics at
/root/reference/indexing/index_builder/helpers.py:49-58 (chain) and :29
(regex class), including the quirky ``[¢£€\\w]+`` currency characters.
"""

from __future__ import annotations

import numpy as np
import pytest

from rayindex import analysis, porter
from rayindex.config import AnalyzerConfig

REF = AnalyzerConfig(mode="reference")
ASCII = AnalyzerConfig(mode="ascii")
CODE = AnalyzerConfig(mode="code")


def test_reference_chain():
    # "the" is a stopword, "Running" stems to "run", "foxes" to "fox"
    assert analysis.tokenize_text("The quick Running foxes", REF) == ["quick", "run", "fox"]


def test_reference_currency_class():
    # ¢£€ are part of the token class (helpers.py:29)
    toks = analysis.tokenize_text("price £100 and €5", REF)
    assert "£100" in toks and "€5" in toks


def test_reference_stopwords_removed_before_stem():
    # positions are over the POST-filter stream (index_build.py:26-38 operates
    # on the preprocessed list)
    counts, gdoc, terms, tfs, pos = analysis.tokenize_docs_grouped(["the cat sat"], REF)
    assert counts[0] == 2  # "the" removed
    by_term = dict(zip(terms.tolist(), tfs.tolist()))
    assert by_term == {"cat": 1, "sat": 1}
    assert sorted(pos.tolist()) == [1, 2]


def test_ascii_mode_matches_sql_semantics():
    # exactly regexp_extract_all(lower(text), '[a-z0-9_]+')
    assert analysis.tokenize_text("Hello, World_2!\nfoo-bar", ASCII) == [
        "hello",
        "world_2",
        "foo",
        "bar",
    ]


def test_code_mode_subtokens():
    toks = analysis.tokenize_text("getFooBar snake_case", CODE)
    assert "getfoobar" in toks and "get" in toks and "foo" in toks and "bar" in toks
    assert "snake_case" in toks and "snake" in toks and "case" in toks


def test_grouped_positions_1based_ascending():
    counts, gdoc, terms, tfs, pos = analysis.tokenize_docs_grouped(["a b a c", "b b"], ASCII)
    assert counts.tolist() == [4, 2]
    groups = {}
    p = 0
    for d, t, tf in zip(gdoc.tolist(), terms.tolist(), tfs.tolist()):
        groups[(d, t)] = pos[p : p + tf].tolist()
        p += tf
    assert groups == {(0, "a"): [1, 3], (0, "b"): [2], (0, "c"): [4], (1, "b"): [1, 2]}


def test_grouped_empty_and_null_docs():
    counts, gdoc, terms, tfs, pos = analysis.tokenize_docs_grouped(["", None, "x"], ASCII)
    assert counts.tolist() == [0, 0, 1]
    assert gdoc.tolist() == [2]
    assert terms.tolist() == ["x"]


def test_grouped_matches_scalar_path():
    texts = ["def foo(): return Bar", "class Baz microservice's", "£5 the end"]
    counts, gdoc, terms, tfs, pos = analysis.tokenize_docs_grouped(texts, REF)
    for i, text in enumerate(texts):
        toks = analysis.tokenize_text(text, REF)
        assert counts[i] == len(toks)
        # rebuild (term -> positions) from grouped output
        got = {}
        p = 0
        for d, t, tf in zip(gdoc.tolist(), terms.tolist(), tfs.tolist()):
            if d == i:
                got[t] = pos[p : p + tf].tolist()
            p += tf
        want = {}
        for j, t in enumerate(toks, start=1):
            want.setdefault(t, []).append(j)
        assert got == want


def test_grouped_arrow_fast_path_matches_python_path():
    """The all-ASCII Arrow fast path (RE2 split + dictionary encode) must be
    token-for-token identical to the Python regex path, for every mode,
    across edge shapes: empty docs, nulls, separators at edges,
    separator-only docs, underscores/digits, camelCase."""
    import pyarrow as pa

    from rayindex.config import AnalyzerConfig

    texts = ["def foo(): return Bar", "--ab--cd-", "", None, "---",
             "a_b 9 X", "snake_case camelCase URLParser2 __dunder__",
             "the and of stopwords relational caresses ponies"]
    for mode in ("reference", "ascii", "code"):
        cfg = AnalyzerConfig(mode=mode)
        want = analysis.tokenize_docs_grouped(list(texts), cfg)
        for typ in (pa.string(), pa.large_string()):
            arr = pa.array(texts, typ)
            assert analysis._raw_tokens_arrow(arr, cfg) is not None
            got = analysis.tokenize_docs_grouped(arr, cfg)
            for g, w in zip(got, want):
                assert g.tolist() == w.tolist(), (mode, typ)


def test_grouped_arrow_currency_rows_take_fast_path():
    """reference mode: rows whose only non-ASCII chars are ¢£€ (the bench
    corpus shape — currency signs are IN the reference token class) must
    ENGAGE the fast path and match the Python engine token-for-token,
    including tokens containing/starting with the currency chars."""
    import pyarrow as pa

    from rayindex.config import AnalyzerConfig

    texts = ["plain ascii row", "£5 and ¢99p cost€uro", "€€€", "a¢b £_x",
             "", None]
    cfg = AnalyzerConfig(mode="reference")
    arr = pa.array(texts)
    assert analysis._raw_tokens_arrow(arr, cfg) is not None
    got = analysis.tokenize_docs_grouped(arr, cfg)
    want = analysis.tokenize_docs_grouped(list(texts), cfg)
    for g, w in zip(got, want):
        assert g.tolist() == w.tolist()


def test_grouped_arrow_non_ascii_gating():
    """General unicode (é is word-char for Python \\w, not for the RE2
    class) must reject the fast path in reference/ascii mode — and the
    fallback must equal list input.  code mode never needs the gate: its
    token class is pure ASCII, so é is a separator in both engines."""
    import pyarrow as pa

    from rayindex.config import AnalyzerConfig

    texts = ["plain ascii row", "£5 and ¢99 café", "naïve_id splitCamelCase"]
    for mode in ("reference", "ascii", "code"):
        cfg = AnalyzerConfig(mode=mode)
        arr = pa.array(texts)
        fast = analysis._raw_tokens_arrow(arr, cfg)
        assert (fast is not None) == (mode == "code")
        got = analysis.tokenize_docs_grouped(arr, cfg)
        want = analysis.tokenize_docs_grouped(texts, cfg)
        for g, w in zip(got, want):
            assert g.tolist() == w.tolist()


def test_stem_cache_consistency():
    analysis._STEM_CACHE.clear()
    a = analysis.stem_cached("relational")
    b = analysis.stem_cached("relational")
    assert a == b == porter.stem("relational")
    # the cache keys on mode: both modes retrievable without cross-talk
    assert analysis.stem_cached("enjoy", "nltk") == "enjoy"
    assert analysis.stem_cached("enjoy", "original") == "enjoi"


@pytest.mark.parametrize(
    "word,expected",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("cats", "cat"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("conflated", "conflat"),
        ("troubled", "troubl"),
        ("sized", "size"),
        ("hopping", "hop"),
        ("tanned", "tan"),
        ("falling", "fall"),
        ("hissing", "hiss"),
        ("fizzed", "fizz"),
        ("failing", "fail"),
        ("filing", "file"),
        ("happy", "happi"),
        ("sky", "sky"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("rational", "ration"),
        ("valenci", "valenc"),
        ("digitizer", "digit"),
        ("triplicate", "triplic"),
        ("formative", "form"),
        ("formalize", "formal"),
        ("electriciti", "electr"),
        ("hopeful", "hope"),
        ("goodness", "good"),
        ("revival", "reviv"),
        ("allowance", "allow"),
        ("inference", "infer"),
        ("airliner", "airlin"),
        ("adjustment", "adjust"),
        ("dependent", "depend"),
        ("adoption", "adopt"),
        ("activate", "activ"),
        ("probate", "probat"),
        ("rate", "rate"),
        ("cease", "ceas"),
        ("controll", "control"),
        ("roll", "roll"),
    ],
)
def test_porter_vectors(word, expected):
    # vectors from the published algorithm description (Porter 1980 examples)
    assert porter.stem(word) == expected


@pytest.mark.parametrize(
    "word,nltk_out,orig_out",
    [
        # irregular-forms pool
        ("sky", "sky", "sky"),
        ("skies", "sky", "ski"),
        ("dying", "die", "dy"),
        ("lying", "lie", "ly"),
        ("tying", "tie", "ty"),
        ("news", "news", "new"),
        ("innings", "inning", "in"),
        ("proceed", "proceed", "proce"),
        ("exceed", "exceed", "exce"),
        ("succeed", "succeed", "succe"),
        # dies/died handling: len-4 ies/ied -> ie; longer -> i
        ("dies", "die", "di"),
        ("ties", "tie", "ti"),
        ("flies", "fli", "fli"),
        ("died", "die", "di"),
        ("spied", "spi", "spi"),
        # step 1c: y->i only after a NON-INITIAL consonant
        ("happy", "happi", "happi"),
        ("enjoy", "enjoy", "enjoi"),
        ("say", "say", "sai"),
        ("spy", "spi", "spy"),
        ("fly", "fli", "fly"),
        ("try", "tri", "try"),
        ("by", "by", "by"),
        # step 2 extensions: fulli -> ful (after 1c), logi -> log
        ("carefully", "care", "carefulli"),
        ("geology", "geolog", "geologi"),
        ("archaeology", "archaeolog", "archaeologi"),
        # bli -> ble (vs original abli -> able): same end result on -ably words
        ("conformably", "conform", "conform"),
    ],
)
def test_porter_nltk_extension_vectors(word, nltk_out, orig_out):
    """The documented NLTK_EXTENSIONS departures (the reference stems with
    nltk's default-mode PorterStemmer, helpers.py:46) vs the 1980 rules."""
    assert porter.stem(word, "nltk") == nltk_out
    assert porter.stem(word, "original") == orig_out
