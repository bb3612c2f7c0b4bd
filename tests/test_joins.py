"""Tests for the distributed join operators (asof / interval / semi /
anti) and the round-3 window/text additions (hopping window, BPE token
counts) — each checked against an independent pandas/numpy reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def event_frames():
    rng = np.random.default_rng(42)
    n_l, n_r = 400, 150
    left = pd.DataFrame({
        "user_id": rng.integers(0, 8, n_l),
        "event_id": np.arange(n_l, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 2, n_l), unit="s"),
    })
    right = pd.DataFrame({
        "user_id": rng.integers(0, 8, n_r),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 2, n_r), unit="s"),
        "value": rng.normal(size=n_r).round(3),
    })
    # unique (key, ts) on the right is the documented asof precondition
    right = right.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    return left, right


def _asof_reference(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """pandas merge_asof per key (inner: drop unmatched)."""
    l = left.sort_values("ts").reset_index(drop=True)
    r = right.sort_values("ts").reset_index(drop=True)
    m = pd.merge_asof(l, r, on="ts", by="user_id", direction="backward")
    m = m.dropna(subset=["value"])
    return pd.DataFrame({
        "user_id": m.user_id.to_numpy(np.int64),
        "event_id": m.event_id.to_numpy(np.int64),
        "left_ts": m.ts.astype("int64").to_numpy() // 1000,
    }).sort_values(["user_id", "event_id"]).reset_index(drop=True)


def test_asof_join_matches_merge_asof(ray_session, event_frames):
    import ray.data

    from rayindex.datapipe.joins import asof_join

    left, right = event_frames
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key_col="user_id", left_ts_col="ts", right_ts_col="ts",
        left_cols=("event_id",), right_cols=("value",),
    ).to_pandas()
    ref = _asof_reference(left, right)
    got = out[["user_id", "event_id", "left_ts"]].sort_values(
        ["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    # matched values and timestamps agree with a direct per-row scan
    r = right.assign(rts=right.ts.astype("int64") // 1000)
    for row in out.sample(n=min(25, len(out)), random_state=0).itertuples():
        cand = r[(r.user_id == row.user_id) & (r.rts <= row.left_ts)]
        best = cand.loc[cand.rts.idxmax()]
        assert row.right_ts == best.rts
        assert abs(row.value - best.value) < 1e-9
    # int64 payloads survive the null-union round trip (no float widening)
    assert out.event_id.dtype == np.int64


def test_asof_join_tolerance_and_empty(ray_session, event_frames):
    import ray.data

    from rayindex.datapipe.joins import asof_join

    left, right = event_frames
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key_col="user_id", left_ts_col="ts", right_ts_col="ts",
        left_cols=("event_id",), right_cols=("value",),
        tolerance_us=3600 * 1_000_000,
    ).to_pandas()
    assert (out.left_ts - out.right_ts <= 3600 * 1_000_000).all()
    # keys present on only one side yield no rows, not errors
    lone = pd.DataFrame({"user_id": [99], "event_id": [0],
                         "ts": [pd.Timestamp("2024-01-01")]})
    empty = asof_join(
        ray.data.from_pandas(lone), ray.data.from_pandas(right[:0]),
        key_col="user_id", left_ts_col="ts", right_ts_col="ts",
        left_cols=("event_id",), right_cols=("value",),
    ).to_pandas()
    assert len(empty) == 0


def test_interval_join_matches_bruteforce(ray_session, event_frames):
    import ray.data

    from rayindex.datapipe.joins import interval_join

    left, right = event_frames
    right = right.assign(click_id=np.arange(len(right), dtype=np.int64))
    lo, hi = -7200 * 1_000_000, 0  # right in [left_ts - 2h, left_ts]
    out = interval_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key_col="user_id", left_ts_col="ts", right_ts_col="ts",
        lo_us=lo, hi_us=hi, left_id_col="event_id",
        right_id_col="click_id", num_partitions=4,
    ).to_pandas()
    l = left.assign(lts=left.ts.astype("int64") // 1000)
    r = right.assign(rts=right.ts.astype("int64") // 1000)
    brute = l.merge(r, on="user_id")
    brute = brute[(brute.rts >= brute.lts + lo) & (brute.rts <= brute.lts + hi)]
    ref = set(zip(brute.event_id, brute.click_id))
    got = set(zip(out.event_id, out.click_id))
    assert got == ref
    assert len(out) == len(ref)  # no duplicate pairs from the 2x explode


def test_semi_and_anti_join_partition(ray_session):
    import ray.data

    from rayindex.datapipe.joins import anti_join, semi_join

    big = pa.table({"k": pa.array(np.arange(1000) % 37, pa.int64()),
                    "v": pa.array(np.arange(1000), pa.int64())})
    small = pa.table({"k": pa.array([0, 5, 11, 36], pa.int64())})
    keep = semi_join(ray.data.from_arrow(big), small, "k").to_pandas()
    drop = anti_join(ray.data.from_arrow(big), small, "k").to_pandas()
    assert set(keep.k) == {0, 5, 11, 36}
    assert set(drop.k) == set(range(37)) - {0, 5, 11, 36}
    assert len(keep) + len(drop) == 1000
    # small side may itself be a Dataset
    keep2 = semi_join(ray.data.from_arrow(big),
                      ray.data.from_arrow(small), "k").to_pandas()
    assert sorted(keep2.v) == sorted(keep.v)


def test_broadcast_join_enrich(ray_session):
    import ray.data

    from rayindex.datapipe.joins import broadcast_join

    big = pa.table({"k": pa.array(np.arange(200) % 7, pa.int64()),
                    "v": pa.array(np.arange(200), pa.int64())})
    dim = pa.table({"dk": pa.array([0, 2, 4, 6], pa.int64()),
                    "name": pa.array(["a", "b", "c", "d"])})
    out = broadcast_join(ray.data.from_arrow(big), dim, "k", "dk",
                         ("name",)).to_pandas()
    assert set(out.k) == {0, 2, 4, 6}
    assert (out.name == out.k.map({0: "a", 2: "b", 4: "c", 6: "d"})).all()
    assert len(out) == len(big.to_pandas().query("k in (0, 2, 4, 6)"))
    dup = pa.table({"dk": pa.array([1, 1], pa.int64()),
                    "name": pa.array(["x", "y"])})
    with pytest.raises(ValueError):
        broadcast_join(ray.data.from_arrow(big), dup, "k", "dk",
                       ("name",)).to_pandas()


def test_hopping_window_matches_pandas(ray_session):
    import ray.data

    from rayindex.datapipe.windows import hopping_window

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 4, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "value": rng.normal(size=n),
    })
    out = hopping_window(ray.data.from_pandas(df), window_s=3600,
                         hop_s=900).to_pandas()
    # reference: explode each event into the 4 windows that contain it
    sec = df.ts.astype("int64") // 10**9
    base = sec // 900
    rows = []
    for j in range(4):
        rows.append(pd.DataFrame({
            "user_id": df.user_id, "window_start": (base - j) * 900,
            "value": df.value}))
    ref = (pd.concat(rows).groupby(["user_id", "window_start"])
           .agg(n_events=("value", "size"), sum_value=("value", "sum"))
           .reset_index())
    merged = out.merge(ref, on=["user_id", "window_start"],
                       suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    assert (merged.n_events == merged.n_events_ref).all()
    assert np.allclose(merged.sum_value, merged.sum_value_ref)
    with pytest.raises(ValueError):
        hopping_window(ray.data.from_pandas(df), window_s=3600, hop_s=700)


def test_token_count_bpe(ray_session):
    import re

    from rayindex.datapipe.text import BPE_PATTERN, token_count_bpe_batch

    texts = ["Hello world, it's 2024!", "", "a1b2 c3", "   spaces   only   ",
             "don't stop-me now... 42x"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = token_count_bpe_batch(t)
    ref = [len(re.findall(BPE_PATTERN, s)) for s in texts]
    assert out["n_bpe_tokens"].to_pylist() == ref
    assert ref[0] == len(["Hello", " world", ",", " it", "'s", " 2024", "!"])
