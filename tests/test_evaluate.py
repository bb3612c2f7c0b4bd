"""compare_rankings: per-query same-position + overlap counts (reference
compare_results.py semantics) over ranked result tables."""

from __future__ import annotations

import pyarrow as pa


def _tbl(rows):
    q, r, d = zip(*rows)
    return pa.table({"query_id": pa.array(q, pa.int64()),
                     "rank": pa.array(r, pa.int32()),
                     "doc_id": pa.array(d, pa.int64())})


def test_compare_rankings_counts(ray_session):
    from rayindex.evaluate import compare_rankings

    a = _tbl([(0, 1, 10), (0, 2, 11), (0, 3, 12),
              (1, 1, 20), (1, 2, 21),
              (2, 1, 30)])
    b = _tbl([(0, 1, 10), (0, 2, 12), (0, 3, 11),   # same @1, overlap 3
              (1, 1, 99), (1, 2, 21),               # same @2, overlap 1
              (3, 1, 77)])                          # only in b
    got = {r["query_id"]: (r["same_position_count"], r["overlap_count"])
           for r in compare_rankings(a, b).take_all()}
    assert got == {0: (1, 3), 1: (1, 1), 2: (0, 0), 3: (0, 0)}


def test_compare_rankings_unequal_lengths(ray_session):
    from rayindex.evaluate import compare_rankings

    a = _tbl([(0, 1, 5), (0, 2, 6), (0, 3, 7)])
    b = _tbl([(0, 1, 5)])
    [row] = compare_rankings(a, b).take_all()
    assert (row["same_position_count"], row["overlap_count"]) == (1, 1)


def test_compare_rankings_dataset_inputs(ray_session):
    import ray.data

    from rayindex.evaluate import compare_rankings

    a = _tbl([(0, 1, 10), (0, 2, 11)])
    b = _tbl([(0, 1, 10), (0, 2, 12)])
    got = compare_rankings(ray.data.from_arrow(a),
                           ray.data.from_arrow(b)).take_all()
    assert got == [{"query_id": 0, "same_position_count": 1,
                    "overlap_count": 1}]
