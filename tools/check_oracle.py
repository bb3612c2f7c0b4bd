"""Local simulation of the driver's correctness gate: runs each queries()
entry and its oracle_sql() side by side on one sf dir, compares row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[FAIL] {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.perf_counter() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows, {el:.1f}s")
            continue
        want = canon(con.execute(sqls[name]).fetchdf())
        ctx = f"{name} ({len(got)} vs {len(want)} rows, {el:.1f}s)"
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {ctx}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {ctx}: row count")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
            value_equal = True
        except AssertionError:
            value_equal = False
        if not value_equal:
            neq = (got != want).any(axis=1)
            print(f"[FAIL] {ctx}: {int(neq.sum())} differing rows")
            print("  got:  ", got[neq].head(3).to_dict("records"))
            print("  want: ", want[neq].head(3).to_dict("records"))
            failures += 1
            continue
        print(f"[ok] {ctx}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
