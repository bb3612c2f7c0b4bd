"""Bloom-filter blocklist filtering: no false negatives ever, false
positives deterministic, and the shipped DuckDB oracle reproduces the
pipeline's surviving row set bit-for-bit."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _events_table(n: int = 3000, n_users: int = 500, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "event_type": pa.array(rng.choice(["click", "view", "error"], n,
                                          p=[0.55, 0.4, 0.05])),
        "user_id": pa.array(rng.integers(1, n_users + 1, n, dtype=np.int64)),
        "value": pa.array(rng.uniform(0.0, 500.0, n)),
    })


def test_no_false_negatives():
    from rayindex.datapipe.bloom import bloom_build, bloom_contains

    keys = np.arange(100, 600, dtype=np.int64)
    bits = bloom_build(pa.table({"k": pa.array(keys)}), "k",
                       m_bits=1 << 12, k=3)
    assert bloom_contains(bits, keys, k=3).all()


def test_false_positives_deterministic_and_bounded():
    from rayindex.datapipe.bloom import bloom_build, bloom_contains

    keys = np.arange(1, 201, dtype=np.int64)          # 200 members
    probe = np.arange(10_000, 30_000, dtype=np.int64)  # non-members
    bits = bloom_build(pa.table({"k": pa.array(keys)}), "k",
                       m_bits=1 << 10, k=3)
    fp1 = bloom_contains(bits, probe, k=3)
    fp2 = bloom_contains(bits, probe, k=3)
    assert (fp1 == fp2).all()
    rate = fp1.mean()
    # fill = 1-e^(-600/1024) ~ 0.44 -> expected fp ~ 0.087; generous band
    assert 0.0 < rate < 0.2


def test_bloom_filter_pipeline_matches_exact_plus_fp(ray_session):
    """anti=True drops EVERY true member; survivors = non-members minus
    the deterministic false positives (cross-checked via bloom_contains)."""
    import ray.data

    from rayindex.datapipe.bloom import bloom_build, bloom_contains, bloom_filter

    t = _events_table()
    block = t.filter(pa.compute.equal(t["event_type"], "error"))
    big = ray.data.from_arrow(t)
    small = ray.data.from_arrow(block.select(["user_id"]))
    out = bloom_filter(big, small, big_col="user_id",
                       m_bits=1 << 12, k=3).to_pandas()
    blocked = set(block["user_id"].to_pylist())
    assert not (out["user_id"].isin(blocked)).any()
    bits = bloom_build(block.select(["user_id"]), "user_id",
                       m_bits=1 << 12, k=3)
    member = bloom_contains(
        bits, t["user_id"].to_numpy(zero_copy_only=False), k=3)
    exp_ids = t["event_id"].to_numpy(zero_copy_only=False)[~member]
    assert sorted(out["event_id"].tolist()) == sorted(exp_ids.tolist())


def test_bloom_oracle_twin(ray_session):
    """The shipped DuckDB oracle reproduces the pipeline's surviving rows
    exactly — including which false positives were dropped."""
    import duckdb

    import __ray_entry__ as entrymod
    from rayindex.datapipe.bloom import bloom_filter

    t = _events_table()
    import ray.data

    big = ray.data.from_arrow(t.select(["event_id", "user_id"]))

    def small_filter(tb: pa.Table) -> pa.Table:
        keep = pa.compute.and_(pa.compute.equal(tb["event_type"], "error"),
                               pa.compute.greater(tb["value"], 200.0))
        return tb.filter(keep).select(["user_id"])

    small = ray.data.from_arrow(t).map_batches(
        small_filter, batch_format="pyarrow")
    got = (bloom_filter(big, small, big_col="user_id",
                        m_bits=1 << 12, k=3)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    sql = entrymod.oracle_sql()["bloom_filter_events"]
    exp = con.execute(f"SELECT * FROM ({sql}) ORDER BY event_id").df()
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert len(got) < t.num_rows  # something was actually dropped
