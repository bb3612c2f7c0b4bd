"""Distinct-count operators: exact grouped COUNT(DISTINCT), the HLL
register pipeline (vs a single-pass reference and vs its DuckDB oracle
twin), sketch mergeability, and the estimate's accuracy gate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _events_table(n: int = 4000, n_users: int = 700, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_type": pa.array(rng.choice(["click", "view", "buy"], n)),
        "user_id": pa.array(rng.integers(1, n_users + 1, n, dtype=np.int64)),
    })


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data

    t = _events_table()
    return ray.data.from_arrow(t), t


def test_distinct_per_group_matches_duckdb(events_ds):
    import duckdb

    from rayindex.datapipe.sketch import distinct_per_group

    ds, t = events_ds
    got = (distinct_per_group(ds, "event_type", "user_id")
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute(
        "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct "
        "FROM events GROUP BY event_type ORDER BY event_type").df()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n_distinct"].tolist() == exp["n_distinct"].tolist()
    assert str(got["n_distinct"].dtype) == "int64"


def test_distinct_count_scalar(events_ds):
    from rayindex.datapipe.sketch import distinct_count

    ds, t = events_ds
    assert distinct_count(ds, "user_id") == len(set(t["user_id"].to_pylist()))


def _reference_registers(vals: np.ndarray, p: int) -> np.ndarray:
    """Single-pass scalar-Python HLL — the executable spec."""
    from rayindex.datapipe.sampling import fnv1a_u64
    from rayindex.datapipe.sketch import mix64

    width = 64 - p
    regs = np.zeros(1 << p, np.int64)
    for h in mix64(fnv1a_u64(vals.astype(np.int64))):
        h = int(h)
        b = h >> width
        w = h & ((1 << width) - 1)
        rho = width - w.bit_length() + 1
        if rho > regs[b]:
            regs[b] = rho
    return regs


def test_hll_registers_match_reference(events_ds):
    from rayindex.datapipe.sketch import hll_register_table

    ds, t = events_ds
    got = (hll_register_table(ds, "user_id", p=12)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    regs = _reference_registers(
        t["user_id"].to_numpy(zero_copy_only=False), 12)
    nz = np.flatnonzero(regs)
    assert got["bucket"].tolist() == nz.tolist()
    assert got["rho"].tolist() == regs[nz].tolist()


def test_hll_merge_is_elementwise_max(ray_session):
    """Registers of A ∪ B == elementwise max of A's and B's registers —
    the property that makes per-shard sketches mergeable."""
    import ray.data

    from rayindex.datapipe.sketch import hll_register_table

    a = _events_table(n=1500, n_users=400, seed=1)
    b = _events_table(n=1500, n_users=400, seed=2)

    def regs_of(tbl) -> np.ndarray:
        out = hll_register_table(
            ray.data.from_arrow(tbl), "user_id", p=10).to_pandas()
        r = np.zeros(1 << 10, np.int64)
        r[out["bucket"].to_numpy()] = out["rho"].to_numpy()
        return r

    merged = np.maximum(regs_of(a), regs_of(b))
    union = regs_of(pa.concat_tables([a, b]))
    assert (merged == union).all()


def test_hll_estimate_accuracy(ray_session):
    """Relative error within ~3 sigma of the regime's theoretical bound
    (linear counting ~1.1% sigma at this occupancy; harmonic-mean HLL
    1.04/sqrt(4096) ~ 1.6%): both regimes gated at 5%."""
    import ray.data

    from rayindex.datapipe.sketch import hll_distinct

    small = _events_table(n=4000, n_users=700, seed=7)
    exact = len(set(small["user_id"].to_pylist()))
    est = hll_distinct(ray.data.from_arrow(small), "user_id", p=12)
    assert abs(est - exact) / exact < 0.05

    rng = np.random.default_rng(42)
    big = pa.table({"user_id": pa.array(
        rng.integers(1, 40_001, 120_000, dtype=np.int64))})
    exact = len(set(big["user_id"].to_pylist()))
    est = hll_distinct(ray.data.from_arrow(big), "user_id", p=12)
    assert abs(est - exact) / exact < 0.05


def test_cms_overestimates_never_under(events_ds):
    """CMS guarantee: est >= true count for every key, and est bounded
    by true + eps*N (eps = e/width) for most keys — gated loosely."""
    from rayindex.datapipe.sketch import cms_cell_table, cms_estimate

    ds, t = events_ds
    cells = _collect_pa(cms_cell_table(ds, "user_id", depth=4, width=512))
    vals = t["user_id"].to_numpy(zero_copy_only=False)
    keys, true = np.unique(vals, return_counts=True)
    est = cms_estimate(cells, keys, depth=4, width=512)
    assert (est >= true).all()
    n_total = vals.size
    assert (est - true <= np.e / 512 * n_total * 3).all()


def test_cms_merge_is_sum(ray_session):
    """CMS cells of A ∪ B == cellwise sum — the mergeability property."""
    import ray.data

    from rayindex.datapipe.sketch import cms_cell_table

    a = _events_table(n=1200, n_users=300, seed=3)
    b = _events_table(n=1300, n_users=300, seed=4)

    def grid_of(tbl) -> np.ndarray:
        cells = _collect_pa(cms_cell_table(
            ray.data.from_arrow(tbl), "user_id", depth=4, width=256))
        g = np.zeros((4, 256), np.int64)
        g[cells["depth"].to_numpy(), cells["cell"].to_numpy()] = \
            cells["cnt"].to_numpy()
        return g

    assert (grid_of(a) + grid_of(b) == grid_of(pa.concat_tables([a, b]))).all()


def test_cms_oracle_twin(events_ds):
    import duckdb

    import __ray_entry__ as entrymod
    from rayindex.datapipe.sketch import cms_cell_table

    ds, t = events_ds
    got = (cms_cell_table(ds, "user_id", depth=4, width=512)
           .to_pandas().sort_values(["depth", "cell"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    sql = entrymod.oracle_sql()["cms_sketch"]
    exp = con.execute(f"SELECT * FROM ({sql}) ORDER BY depth, cell").df()
    assert got["depth"].tolist() == exp["depth"].tolist()
    assert got["cell"].tolist() == exp["cell"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_hash_chain_twin_boundaries():
    """numpy vs DuckDB equality of the full fnv→mix64→double-hash probe
    chain at integer boundaries (powers of two, int64 max, 0) and seeded
    random keys — one round-trip, no Ray.  Guards the _mulmod64_sql
    half-word decomposition and the smear/bit_count bit-length against
    overflow/ulp drift anywhere in the domain."""
    import duckdb

    import __ray_entry__ as entrymod
    from rayindex.datapipe.bloom import probe_positions
    from rayindex.datapipe.sampling import fnv1a_u64
    from rayindex.datapipe.sketch import mix64

    rng = np.random.default_rng(99)
    keys = np.unique(np.concatenate([
        np.array([0, 1, 2, (1 << 31) - 1, 1 << 31, 1 << 32,
                  (1 << 52) - 1, 1 << 52, (1 << 52) + 1,
                  (1 << 63) - 1], np.int64),
        rng.integers(0, 1 << 62, 1000).astype(np.int64)]))
    h_np = mix64(fnv1a_u64(keys)).tolist()
    pos_np = probe_positions(keys, k=3, m_bits=1 << 12)

    con = duckdb.connect()
    con.register("v0", pa.table({"v": pa.array(keys)}))
    fnv = entrymod._fnv64_id_sql("v")
    sql = f"""
        WITH h0 AS (SELECT v, {fnv} AS h FROM v0),
        {entrymod._mix64_sql_ctes('m', 'h0', cols='v')},
        g0 AS (SELECT v, h AS h1,
                      xor(h, CAST(11400714819323198485 AS UBIGINT)) AS h
               FROM m5),
        {entrymod._mix64_sql_ctes('n', 'g0', cols='v, h1')},
        fin AS (SELECT v, h1, h | CAST(1 AS UBIGINT) AS h2 FROM n5)
        SELECT v, h1,
               CAST(((CAST(h1 AS HUGEINT) + r.i * CAST(h2 AS HUGEINT))
                     % 18446744073709551616) AS UBIGINT) & 4095 AS p, r.i
        FROM fin, range(3) r(i) ORDER BY v, r.i
    """
    rows = con.execute(sql).fetchall()
    got_h1 = [int(r[1]) for r in rows[::3]]
    assert got_h1 == h_np
    got_pos = np.array([int(r[2]) for r in rows]).reshape(-1, 3)
    assert (got_pos == pos_np).all()


def _collect_pa(ds) -> "pa.Table":
    import pandas as pd  # noqa: F401

    df = ds.to_pandas()
    return pa.Table.from_pandas(df, preserve_index=False)


def test_hll_oracle_twin(events_ds):
    """The shipped DuckDB oracle reproduces the pipeline's register table
    bit-for-bit on a synthetic events table (catches SQL drift before the
    driver does)."""
    import duckdb

    import __ray_entry__ as entrymod
    from rayindex.datapipe.sketch import hll_register_table

    ds, t = events_ds
    got = (hll_register_table(ds, "user_id", p=12)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    sql = entrymod.oracle_sql()["hll_sketch"]
    exp = con.execute(f"SELECT * FROM ({sql}) ORDER BY bucket").df()
    assert got["bucket"].tolist() == exp["bucket"].tolist()
    assert got["rho"].tolist() == exp["rho"].tolist()
