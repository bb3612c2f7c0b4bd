"""Rerank hook tests (reference F9 semantics with injected today)."""

from __future__ import annotations

import datetime as dt

import pytest

from rayindex.rerank import RECENCY_WEIGHTS, rerank_results


def test_title_match_multiplies_per_word():
    results = [(1, 1.0), (2, 1.0)]
    meta = {1: {"path": "foo bar foo"}, 2: {"path": "baz"}}
    out = rerank_results(results, meta, {"foo"})
    # doc 1: two 'foo' title words -> 1.1^2; stacks like the reference loop
    assert dict(out)[1] == pytest.approx(1.1 ** 2)
    assert dict(out)[2] == 1.0
    assert out[0][0] == 1


def test_recency_weighting_and_window():
    today = dt.date(2026, 1, 1)
    meta = {
        1: {"path": "", "pub": dt.date(2026, 1, 1)},    # 0 days -> 1.40
        2: {"path": "", "pub": dt.date(2025, 10, 4)},   # 89 days -> in window
        3: {"path": "", "pub": dt.date(2024, 1, 1)},    # old -> untouched
        4: {"path": "", "pub": dt.date(2026, 2, 1)},    # future -> untouched
    }
    results = [(1, 1.0), (2, 1.0), (3, 1.0), (4, 1.0)]
    out = dict(rerank_results(results, meta, set(), today=today, date_field="pub"))
    assert out[1] == pytest.approx(float(RECENCY_WEIGHTS[0]))
    assert out[2] == pytest.approx(float(RECENCY_WEIGHTS[89]))
    assert out[3] == 1.0
    assert out[4] == 1.0


def test_deterministic_given_today():
    meta = {1: {"path": "x", "pub": dt.date(2026, 1, 1)}}
    a = rerank_results([(1, 2.0)], meta, {"x"}, today=dt.date(2026, 1, 5), date_field="pub")
    b = rerank_results([(1, 2.0)], meta, {"x"}, today=dt.date(2026, 1, 5), date_field="pub")
    assert a == b


def test_resort_and_tiebreak():
    meta = {1: {"path": ""}, 2: {"path": "hit"}}
    out = rerank_results([(1, 1.0), (2, 1.0)], meta, {"hit"})
    assert [d for d, _ in out] == [2, 1]
    # ties -> doc_id asc
    out2 = rerank_results([(2, 1.0), (1, 1.0)], {1: {}, 2: {}}, set())
    assert [d for d, _ in out2] == [1, 2]
