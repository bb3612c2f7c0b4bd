"""Driver-contract smoke: entry() runs; a sample of queries() entries match
their oracle_sql() through DuckDB at sf0.001 (the full matrix runs via
tools/check_oracle.py and the driver itself at sf0.01)."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_entry_runs(entrymod):
    res = entrymod.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    df = res.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}


def test_queries_have_oracle_coverage(entrymod):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 15
    assert set(sqls).issubset(set(qs))
    # the majority of entries must carry a SQL oracle (strong gate)
    assert len(sqls) >= 12


@pytest.mark.parametrize("name", ["term_stats", "postings_probe", "bm25_topk",
                                  "exact_dedup", "events_window"])
def test_sampled_oracle_parity(entrymod, con, name):
    import pyarrow as pa
    import ray.data

    got = entrymod.queries()[name](SF)
    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    want = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
