"""Spell correction (M15/J5 re-expression) and index upload (S10)."""

from __future__ import annotations

import json
import os

import pytest

from rayindex.spell import SpellChecker


@pytest.fixture()
def checker():
    freq = {"merge": 100, "marge": 2, "window": 80, "scan": 60,
            "stream": 40, "scans": 10, "batch": 30}
    aliases = {"ACME": "acme rocket corp", "BRK": "berkshire hathaway"}
    return SpellChecker(freq, aliases=aliases, protected={"ytm"})


def test_known_term_untouched(checker):
    assert checker.correction("merge") == "merge"


def test_edit1_correction_prefers_frequency(checker):
    # 'merge' is edit-1 from both 'merge' (100) and 'marge' (2)
    assert checker.correction("mergge") == "merge"
    assert checker.correction("scann") == "scan"


def test_edit2_fallback(checker):
    assert checker.correction("mergee" + "x") == "merge"  # two edits away


def test_unknown_far_term_passes_through(checker):
    assert checker.correction("zzzzqqqq") == "zzzzqqqq"


def test_alias_expansion_and_protection(checker):
    # ticker-style alias expands (reference nyse Symbol -> Name)
    assert checker.correction("ACME") == "acme rocket corp"
    # words inside alias expansions are protected from correction
    assert checker.correction("berkshire") == "berkshire"
    # explicit protected set (finance abbreviation analog)
    assert checker.correction("ytm") == "ytm"


def test_correct_query_reports_change(checker):
    q, changed = checker.correct_query("mergge window")
    assert q == "merge window" and changed
    q, changed = checker.correct_query("merge window")
    assert q == "merge window" and not changed
    # operators / phrase / proximity syntax pass through
    q, _ = checker.correct_query('"merge window" AND scann')
    assert q == '"merge window" AND scan'
    q, _ = checker.correct_query("#3(merge,window) OR NOT batch")
    assert q == "#3(merge,window) OR NOT batch"


def test_ties_break_deterministically():
    c = SpellChecker({"aa": 5, "ab": 5})
    # 'ac' is edit-1 from both; equal freq -> lexicographically smallest
    assert c.correction("ac") == "aa"


def test_from_index_uses_corpus_vocabulary(tiny_reader):
    c = SpellChecker.from_index(tiny_reader)
    assert c.correction("def") == "def"
    # a misspelled corpus term corrects to an in-vocabulary term
    assert c.correction("retturn") == "return"


def test_upload_roundtrip_and_ranged_serving(ray_session, tiny_build, tiny_reader,
                                             tmp_path):
    from rayindex.searcher import IndexReader
    from rayindex.upload import upload_index, verify_upload

    dest = "file://" + str(tmp_path / "remote_idx")
    manifest = upload_index(tiny_build["out"], dest)
    assert any(k.endswith(".bin") for k in manifest)
    assert any(k.endswith(".dict.parquet") for k in manifest)
    assert verify_upload(dest)
    with open(os.path.join(str(tmp_path / "remote_idx"), "manifest.json")) as f:
        assert json.load(f) == manifest
    # the uploaded tree serves identically via byte-range reads
    r2 = IndexReader(dest)
    for q in ("def", "def return", '"hello world"', "NOT def"):
        assert tiny_reader.search(q, k=10) == r2.search(q, k=10)
