"""Tests for the training-data pipeline operators (dedup, ANN, text
analysis, windows, multimodal plumbing)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    rows = {
        "doc_id": list(range(1, 9)),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",   # exact dup of 1
            "the quick brown fox jumps over a lazy cat today",  # near dup
            "completely different content about databases and queries",
            "der hund ist nicht mit der katze und das ist gut",
            "le chat est un animal et les chiens pour la vie",
            "numbers 123 and 456 mixed with text",
            "",
        ],
    }
    return ray.data.from_arrow(pa.table(rows)), rows


def test_exact_dedup(docs_ds):
    from rayindex.datapipe.dedup import exact_dedup

    ds, rows = docs_ds
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # docs 1 and 2 collapse; everything else unique
    assert out[out.doc_id == 1].n_dups.iloc[0] == 2
    assert 2 not in out.doc_id.tolist()
    assert len(out) == 7


def test_minhash_candidates_finds_near_dup(docs_ds):
    from rayindex.datapipe.dedup import exact_jaccard, minhash_candidates

    ds, rows = docs_ds
    pairs = minhash_candidates(ds, num_perm=64, bands=32, shingle_k=3).to_pandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (1, 2) in got  # identical docs always collide
    # est_jaccard for the identical pair is 1.0
    row = pairs[(pairs.doc_a == 1) & (pairs.doc_b == 2)]
    assert row.est_jaccard.iloc[0] == 1.0
    # exact verification kernel agrees
    assert exact_jaccard(rows["text"][0], rows["text"][1], 3) == 1.0
    assert 0.3 < exact_jaccard(rows["text"][0], rows["text"][2], 3) < 1.0


def test_verify_candidates(docs_ds):
    from rayindex.datapipe.dedup import minhash_candidates, verify_candidates

    ds, rows = docs_ds
    pairs = minhash_candidates(ds, num_perm=64, bands=32, shingle_k=3)
    out = verify_candidates(ds, pairs, shingle_k=3, min_jaccard=0.9).to_pandas()
    got = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in got  # exact dups verify at jaccard 1.0
    assert out[(out.doc_a == 1) & (out.doc_b == 2)].jaccard.iloc[0] == 1.0
    # near-dup (1,3) has jaccard < 0.9 → filtered by the threshold
    assert (1, 3) not in got
    # empty candidate list → empty result with schema
    empty = verify_candidates(ds, out.iloc[0:0], shingle_k=3)
    assert empty.count() == 0
    assert empty.schema().names == ["doc_a", "doc_b", "jaccard"]


def test_simhash_properties(docs_ds, ray_session):
    from rayindex.datapipe.dedup import hamming64, simhash_batch

    ds, rows = docs_ds
    out = ds.map_batches(simhash_batch, batch_format="pyarrow").to_pandas()
    sig = dict(zip(out.doc_id, out.simhash))
    assert sig[1] == sig[2]  # identical text -> identical simhash
    assert hamming64(int(sig[1]), int(sig[3])) < hamming64(int(sig[1]), int(sig[4]))
    assert sig[8] == 0  # empty text


def test_simhash_pairs_exact_vs_bruteforce(docs_ds):
    """Banded SimHash pairs must equal brute-force all-pairs hamming <= t
    exactly (pigeonhole guarantees candidate completeness; the in-group
    popcount filter guarantees precision)."""
    from rayindex.datapipe.dedup import hamming64, simhash_batch, simhash_pairs

    ds, _ = docs_ds
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow").to_pandas()
    sig = dict(zip(sigs.doc_id, sigs.simhash))
    for t in (0, 3, 10):
        want = {
            (a, b, hamming64(int(sig[a]), int(sig[b])))
            for a in sig for b in sig if a < b
            and hamming64(int(sig[a]), int(sig[b])) <= t
        }
        got_df = simhash_pairs(ds, max_hamming=t).to_pandas()
        got = set(zip(got_df.doc_a, got_df.doc_b, got_df.hamming))
        assert got == want, f"t={t}"
        assert got_df.duplicated(["doc_a", "doc_b"]).sum() == 0


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session):
    """Prefix-filtered AllPairs join must equal brute-force all-pairs
    exact Jaccard at every threshold — the prefix filter may only prune
    pairs that provably cannot reach the threshold."""
    import ray.data

    from rayindex.datapipe.dedup import exact_jaccard, ngram_jaccard_pairs

    # a corpus with a spread of overlap levels: jittered copies of a few
    # base sentences at varying edit fractions, plus unrelated docs
    rng = np.random.default_rng(3)
    words = [f"w{i:02d}" for i in range(40)]
    texts = []
    for b in range(6):
        base = list(rng.choice(words, size=20))
        texts.append(" ".join(base))
        for frac in (0.05, 0.2, 0.5):
            mut = list(base)
            for j in rng.choice(20, size=max(1, int(frac * 20)), replace=False):
                mut[j] = str(rng.choice(words))
            texts.append(" ".join(mut))
    texts += ["", "xyz"]  # empty / too-short shingle edge cases
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    for t in (0.3, 0.6, 0.9):
        want = {}
        for a in ids:
            for b in ids:
                if a < b and texts[a] and texts[b]:
                    j = exact_jaccard(texts[a], texts[b], 4)
                    if j >= t:
                        want[(a, b)] = j
        got_df = ngram_jaccard_pairs(ds, min_jaccard=t, shingle_k=4).to_pandas()
        got = dict(zip(zip(got_df.doc_a, got_df.doc_b), got_df.jaccard))
        assert got.keys() == want.keys(), f"t={t}"
        for k, v in want.items():
            assert got[k] == pytest.approx(v), f"t={t} pair={k}"
        assert got_df.duplicated(["doc_a", "doc_b"]).sum() == 0


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    n, d = 120, 16
    base = rng.standard_normal((n, d))
    # plant near-dup pairs: rows 100.. are jittered copies of rows 0..19
    base[100:] = base[:20] + 0.05 * rng.standard_normal((20, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in base], pa.list_(pa.float64())),
    })
    return ray.data.from_arrow(tbl).repartition(5), base


def _brute_pairs(base, threshold):
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = m @ m.T
    out = set()
    n = len(base)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out.add((i, j))
    return out


def test_cosine_neardup_exact_block_pairs(vec_ds):
    """Distributed block-pair tiling must equal the in-memory all-pairs
    result exactly — every pair once, correct orientation, no driver-side
    matrix materialization."""
    from rayindex.datapipe.ann import cosine_neardup

    ds, base = vec_ds
    got_df = cosine_neardup(ds, threshold=0.9, dtype=np.float64).to_pandas()
    got = set(zip(got_df.id_a, got_df.id_b))
    assert got == _brute_pairs(base, 0.9)
    assert (got_df.id_a < got_df.id_b).all()
    assert got_df.duplicated(["id_a", "id_b"]).sum() == 0


def test_cosine_neardup_lsh_recall(vec_ds):
    """Hyperplane-LSH candidates: perfect precision (every emitted pair is
    a true >= threshold pair) and high recall on planted near-dups."""
    from rayindex.datapipe.ann import cosine_neardup_lsh

    ds, base = vec_ds
    want = _brute_pairs(base, 0.9)
    got_df = cosine_neardup_lsh(ds, threshold=0.9, nbits=16, bands=8,
                                dtype=np.float64).to_pandas()
    got = set(zip(got_df.id_a, got_df.id_b))
    assert got <= want  # precision 1.0 by construction
    assert len(got) >= 0.8 * len(want), (len(got), len(want))


def test_media_real_decoders(ray_session):
    """Pure-numpy PPM/WAV codecs: round-trips, block-mean resize, frame
    RMS, and the real-backend actor pipeline end to end."""
    import ray.data

    from rayindex.datapipe.media import (MediaDecoder, decode_features,
                                         decode_ppm, decode_wav, encode_ppm,
                                         encode_wav, frame_rms,
                                         resize_block_mean, resize_ppm_batch)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header comments tolerated
    with_comment = b"P6\n# thumb\n64 48\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)
    # constant image resizes to the same constant
    flat = np.full((40, 40, 3), 77, np.uint8)
    assert (resize_block_mean(flat, 4, 4) == 77).all()

    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    sine = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    wav = encode_wav(rate, sine.reshape(-1, 1))
    r2, s2 = decode_wav(wav)
    assert r2 == rate and np.array_equal(s2.ravel(), sine)
    rms = frame_rms(s2, 8)
    assert np.allclose(rms, 0.5 / np.sqrt(2), atol=0.01)  # sine RMS = A/√2

    # real-backend actor pipeline over mixed image/audio payloads
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_ppm(img), wav], pa.large_binary()),
    })
    ds = ray.data.from_arrow(tbl)
    out = decode_features(ds, backend="real", feature_dim=16,
                          concurrency=2, batch_size=1).to_pandas()
    feats = {r.doc_id: np.asarray(r.feature) for r in out.itertuples()}
    assert feats[1].shape == (16,) and 0.0 <= feats[1].max() <= 1.0
    assert np.allclose(feats[2], 0.5 / np.sqrt(2), atol=0.01)

    # thumbnail stage emits valid PPM at the target grid (image rows only)
    import pyarrow.compute as pc

    img_only = ray.data.from_arrow(tbl.filter(pc.equal(tbl["doc_id"], 1)))
    tdf = img_only.map_batches(resize_ppm_batch,
                               fn_kwargs={"out_h": 8, "out_w": 8},
                               batch_format="pyarrow").to_pandas()
    assert tdf.height.iloc[0] == 8 and tdf.width.iloc[0] == 8
    assert decode_ppm(tdf.payload.iloc[0]).shape == (8, 8, 3)

    # unsupported container → clear error
    dec = MediaDecoder(backend="real")
    with pytest.raises(ValueError, match="unsupported media container"):
        dec._decode_real(b"\x89PNG....")


def test_langid(docs_ds):
    from rayindex.datapipe.text import langid_batch

    ds, _ = docs_ds
    out = ds.map_batches(langid_batch, batch_format="pyarrow").to_pandas()
    lang = dict(zip(out.doc_id, out.lang_pred))
    assert lang[1] == "en"
    assert lang[5] == "de"
    assert lang[6] == "fr"
    assert lang[8] == "und"


def test_token_count_and_quality(docs_ds):
    from rayindex.datapipe.text import quality_batch, token_count_batch

    ds, rows = docs_ds
    tc = ds.map_batches(token_count_batch, batch_format="pyarrow").to_pandas()
    got = dict(zip(tc.doc_id, tc.n_tokens))
    assert got[1] == 9
    assert got[8] == 0
    q = ds.map_batches(quality_batch, batch_format="pyarrow").to_pandas()
    r1 = q[q.doc_id == 1].iloc[0]
    assert r1.n_tokens == 9
    assert r1.stopword_ratio == pytest.approx(2 / 9)  # 'the' twice
    assert q[q.doc_id == 7].digit_count.iloc[0] == 6


def test_repetition_matches_bruteforce(ray_session):
    """Gopher repetition signals vs a per-doc Python reference (Counter +
    boolean coverage array) on handcrafted repetitive docs."""
    import re
    from collections import Counter

    from rayindex.datapipe.text import repetition_batch

    docs = [
        "hello world\nhello world\nfoo bar\n\n  \n",
        "a b a b a b a b c",
        "one two three four five one two three four five six",
        "",
        "x",
        "line1\n line1 \nline1\t\nother",
        "repeat me repeat me repeat me repeat me done",
        "no repeats here at all whatsoever today",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = repetition_batch(t).to_pandas().set_index("doc_id")
    for i, txt in enumerate(docs):
        lines = [ln.strip(" \t\r") for ln in txt.split("\n")]
        lines = [ln for ln in lines if ln]
        c = Counter(lines)
        dup = [ln for ln in lines if c[ln] >= 2]
        toks = re.findall(r"[a-z0-9_]+", txt.lower())
        tt = sum(map(len, toks))
        g2 = Counter(tuple(toks[j:j + 2]) for j in range(len(toks) - 1))
        top2 = max([n * (len(a) + len(b)) for (a, b), n in g2.items()
                    if n >= 2], default=0)
        g5 = Counter(tuple(toks[j:j + 5]) for j in range(len(toks) - 4))
        cov = np.zeros(len(toks), bool)
        for j in range(len(toks) - 4):
            if g5[tuple(toks[j:j + 5])] >= 2:
                cov[j:j + 5] = True
        covc = sum(len(tk) for j, tk in enumerate(toks) if cov[j])
        r = got.loc[i]
        assert r.n_lines == len(lines)
        assert r.dup_line_frac == pytest.approx(
            len(dup) / len(lines) if lines else 0.0)
        assert r.dup_line_char_frac == pytest.approx(
            sum(map(len, dup)) / sum(map(len, lines)) if lines else 0.0)
        assert r.top_2gram_char_frac == pytest.approx(
            top2 / tt if tt else 0.0)
        assert r.dup_5gram_char_frac == pytest.approx(
            covc / tt if tt else 0.0)


def test_fingerprint_deterministic(docs_ds):
    from rayindex.datapipe.text import fingerprint_batch

    ds, _ = docs_ds
    a = ds.map_batches(fingerprint_batch, batch_format="pyarrow").to_pandas()
    b = ds.map_batches(fingerprint_batch, batch_format="pyarrow").to_pandas()
    assert a.sort_values("doc_id").fingerprint.tolist() == \
        b.sort_values("doc_id").fingerprint.tolist()
    fp = dict(zip(a.doc_id, a.fingerprint))
    assert fp[1] == fp[2] and fp[1] != fp[4]


def test_tfidf_topk_matches_bruteforce(ray_session):
    """Distributed df + map-only scoring vs a Counter reference with the
    sklearn smooth-idf convention and (score desc, term asc) ties."""
    import math
    import re
    from collections import Counter

    import ray.data

    from rayindex.datapipe.keywords import tfidf_topk

    docs = ["the cat sat on the mat", "the dog ate my homework homework",
            "cat dog cat dog", "", "unique singleton words here"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(2)
    out = tfidf_topk(ds, k=3).to_pandas()
    toks = [re.findall(r"[a-z0-9_]+", d.lower()) for d in docs]
    N = len(docs)
    df = Counter(w for tk in toks for w in set(tk))
    for i, tk in enumerate(toks):
        tf = Counter(tk)
        scored = sorted(
            ((c * (math.log((N + 1) / (df[w] + 1)) + 1), w)
             for w, c in tf.items()),
            key=lambda p: (-p[0], p[1]))[:3]
        got = out[out.doc_id == i].sort_values("rank")
        assert got.term.tolist() == [w for _, w in scored]
        assert np.allclose(got.score.to_numpy(),
                           [s for s, _ in scored], atol=1e-12)
    assert (out[out.doc_id == 3].shape[0]) == 0  # empty doc: no rows


def _kw_corpus():
    import ray.data
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(60)]
    docs = [" ".join(rng.choice(words, size=int(rng.integers(0, 30))))
            for _ in range(120)]
    docs += ["", "solo", "tie tie alpha beta", "alpha beta tie tie"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    return ray.data.from_arrow(t).repartition(3)


def test_tfidf_bucketed_path_bitwise_matches_broadcast(ray_session):
    """The scale path (distributed df join + bucketed per-doc top-k;
    VERDICT r4 item 1) produces BITWISE identical rows to the broadcast
    path — same doubles, same tie ranks — for min_df=1 and with
    pruning, and the vocab_cap auto-route picks it."""
    import pandas as pd

    from rayindex.datapipe.keywords import tfidf_topk

    ds = _kw_corpus()
    for min_df in (1, 3):
        a = (tfidf_topk(ds, k=4, min_df=min_df, path="broadcast")
             .to_pandas().sort_values(["doc_id", "rank"])
             .reset_index(drop=True))
        b = (tfidf_topk(ds, k=4, min_df=min_df, path="bucketed")
             .to_pandas().sort_values(["doc_id", "rank"])
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)
    c = (tfidf_topk(ds, k=4, vocab_cap=5)  # 60+ terms > 5 -> bucketed
         .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
    a1 = (tfidf_topk(ds, k=4, path="broadcast")
          .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a1, c[a1.columns], check_exact=True)


def test_lm_xent_bucketed_path_matches_broadcast(ray_session):
    """lm_xent's bucketed scale path (pair-row joins + groupby(id) sum)
    agrees with the broadcast model to float tolerance AND at the
    driver's micro-unit rounding, including under min_count pruning."""
    from rayindex.datapipe.lm import lm_xent

    ds = _kw_corpus()
    for mc in (1, 2):
        a = (lm_xent(ds, alpha=0.1, min_count=mc, path="broadcast")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (lm_xent(ds, alpha=0.1, min_count=mc, path="bucketed")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.doc_id.tolist() == b.doc_id.tolist()
        assert a.n_bigrams.tolist() == b.n_bigrams.tolist()
        assert np.allclose(a.xent.to_numpy(), b.xent.to_numpy(),
                           rtol=0, atol=1e-9)
        mu = np.floor(a.xent.to_numpy() * 1e6 + 0.5)
        mb = np.floor(b.xent.to_numpy() * 1e6 + 0.5)
        assert (mu == mb).all()
    c = (lm_xent(ds, alpha=0.1, table_cap=3)  # tiny cap -> bucketed
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    a1 = (lm_xent(ds, alpha=0.1, path="broadcast")
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert np.allclose(a1.xent.to_numpy(), c.xent.to_numpy(), atol=1e-9)


def test_perplexity_buckets_ccnet_semantics(ray_session):
    """CCNet bucketing: every doc labeled, buckets ordered by
    cross-entropy (head = lowest), cuts at exact tercile ranks of the
    micro scores, ties at a cut land in the lower bucket."""
    from rayindex.datapipe.lm import lm_xent, perplexity_buckets

    ds = _kw_corpus()
    out = (perplexity_buckets(ds, n_buckets=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 124 and set(out.bucket) <= {0, 1, 2}
    # ordering: max micro score in bucket b <= min in bucket b+1
    for b in (0, 1):
        lo = out[out.bucket == b].xent_micro
        hi = out[out.bucket == b + 1].xent_micro
        if len(lo) and len(hi):
            assert lo.max() <= hi.min()
    # bucket sizes: the <= cut rule puts AT LEAST ceil(n/3) in bucket 0
    n = len(out)
    assert (out.bucket == 0).sum() >= -(-n // 3)
    # agreement with the raw scorer at micro precision
    raw = (lm_xent(ds).to_pandas().sort_values("doc_id")
           .reset_index(drop=True))
    mu = np.floor(raw.xent.to_numpy() * 1e6 + 0.5).astype(np.int64)
    assert (mu == out.xent_micro.to_numpy()).all()
    # ties at a cut value share the lower bucket
    cut0 = out[out.bucket == 0].xent_micro.max()
    assert (out[out.xent_micro == cut0].bucket == 0).all()


def test_bucketed_paths_never_materialize_to_driver(ray_session,
                                                    monkeypatch):
    """High-vocab scale contract: with the bucketed path forced, NO
    Dataset is ever pandas-materialized on the driver — to_pandas is
    patched to raise, and both operators still stream to completion
    (the broadcast helpers are patched too, proving they're not
    consulted)."""
    import ray.data

    import rayindex.datapipe.keywords as kw
    import rayindex.datapipe.lm as lm

    def boom(*a, **k):
        raise AssertionError("driver materialization on the scale path")

    ds = _kw_corpus()
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    monkeypatch.setattr(kw, "document_frequencies", boom)
    monkeypatch.setattr(lm, "bigram_model", boom)
    out = kw.tfidf_topk(ds, k=3, path="bucketed")
    n = sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow"))
    assert n > 0
    out2 = lm.lm_xent(ds, path="bucketed")
    n2 = sum(b.num_rows for b in out2.iter_batches(batch_format="pyarrow"))
    assert n2 == 124  # one row per doc, empties included


def test_decontaminate_flags_overlap(ray_session):
    """Docs sharing a 5-gram with the benchmark slice are flagged; a
    shuffled-token doc with the same vocabulary is not."""
    import ray.data

    from rayindex.datapipe.spans import benchmark_gram_set, decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        bench_text,                                     # benchmark itself
        "prefix words alpha beta gamma delta epsilon then more",  # overlap
        "zeta epsilon delta gamma beta alpha theta eta",  # reversed: clean
        "totally unrelated content with different words entirely",
        "short",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(2)
    grams = benchmark_gram_set(ds.filter(lambda r: r["doc_id"] == 0), n=5)
    assert grams.size == 4  # 8 tokens -> 4 distinct 5-grams
    out = decontaminate(ds, grams, n=5).to_pandas().set_index("doc_id")
    assert out.loc[0].contaminated == 1 and out.loc[0].n_matched == 4
    assert out.loc[1].contaminated == 1 and out.loc[1].n_matched == 1
    assert out.loc[2].contaminated == 0
    assert out.loc[3].contaminated == 0
    assert out.loc[4].n_grams == 0 and out.loc[4].contaminated == 0


def test_top_bigrams(ray_session):
    import ray.data

    from rayindex.datapipe.lm import top_bigrams

    docs = ["a b a b a b", "a b c d", "c d c d"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(2)
    out = top_bigrams(ds, n=3).to_pandas()
    assert list(map(tuple, out.to_records(index=False))) == [
        ("a", "b", 4), ("c", "d", 3), ("b", "a", 2)]


def test_chunk_documents_windows(ray_session):
    """Sliding-window chunking: boundary math, full token coverage,
    overlap, and text reconstruction against a per-doc reference."""
    import re

    import ray.data

    from rayindex.datapipe.pack import chunk_documents

    docs = ["", "one two three",
            " ".join(f"w{i}" for i in range(10)),
            " ".join(f"t{i}" for i in range(23))]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(2)
    out = chunk_documents(ds, window=8, stride=5).to_pandas() \
        .sort_values(["doc_id", "chunk_id"])
    assert 0 not in out.doc_id.tolist()  # empty doc emits nothing
    for i, txt in enumerate(docs):
        toks = re.findall(r"[a-z0-9_]+", txt.lower())
        got = out[out.doc_id == i]
        n = len(toks)
        if n == 0:
            assert got.empty
            continue
        jmax = (n - 8 + 4) // 5 if n > 8 else 0
        assert got.chunk_id.tolist() == list(range(jmax + 1))
        covered = set()
        for _, r in got.iterrows():
            s, ln = int(r.start_tok), int(r.n_tokens)
            assert ln == min(8, n - s) and ln > 0
            assert r.chunk_text == " ".join(toks[s:s + ln])
            covered |= set(range(s, s + ln))
        assert covered == set(range(n))  # every token in >= 1 chunk


def test_repetition_property_random_docs():
    """Property test: repetition_batch == the Counter/coverage reference
    on randomly generated repetitive docs (no Ray needed — pure batch
    kernel)."""
    import re
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rayindex.datapipe.text import repetition_batch

    words = ["aa", "bb", "cc", "dd", "lorem", "x1"]
    doc_strategy = st.lists(
        st.sampled_from(words + ["\n"]), min_size=0, max_size=60) \
        .map(lambda ws: " ".join(ws))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc_strategy, min_size=1, max_size=6))
    def check(docs):
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)})
        got = repetition_batch(t).to_pandas()
        for i, txt in enumerate(docs):
            lines = [ln.strip(" \t\r") for ln in txt.split("\n")]
            lines = [ln for ln in lines if ln]
            c = Counter(lines)
            dup = [ln for ln in lines if c[ln] >= 2]
            toks = re.findall(r"[a-z0-9_]+", txt.lower())
            tt = sum(map(len, toks))
            g2 = Counter(tuple(toks[j:j + 2])
                         for j in range(len(toks) - 1))
            top2 = max([n * (len(a) + len(b)) for (a, b), n in g2.items()
                        if n >= 2], default=0)
            g5 = Counter(tuple(toks[j:j + 5])
                         for j in range(len(toks) - 4))
            cov = np.zeros(len(toks), bool)
            for j in range(len(toks) - 4):
                if g5[tuple(toks[j:j + 5])] >= 2:
                    cov[j:j + 5] = True
            covc = sum(len(tk) for j, tk in enumerate(toks) if cov[j])
            r = got.iloc[i]
            assert r.n_lines == len(lines)
            assert r.dup_line_frac == pytest.approx(
                len(dup) / len(lines) if lines else 0.0)
            assert r.top_2gram_char_frac == pytest.approx(
                top2 / tt if tt else 0.0)
            assert r.dup_5gram_char_frac == pytest.approx(
                covc / tt if tt else 0.0)

    check()


def test_curate_pipeline_gates(ray_session):
    """Each gate of the composed curation chain fires on its designed
    victim; duplicates collapse to the lowest id."""
    import ray.data

    from rayindex.datapipe.curate import benchmark_gram_set, curate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        bench_text,                                      # 0: bench slice
        "clean document with plenty of distinct words inside",   # 1 keep
        "tiny doc",                                      # 2: < 5 tokens
        "spam spam spam spam spam spam spam spam only",  # 3: top-2gram
        "same line\nsame line\nsame line\nother words here",  # 4: dup lines
        "prefix alpha beta gamma delta epsilon suffix words",  # 5: contam
        "clean document with plenty of distinct words inside",   # 6 dup of 1
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(2)
    grams = benchmark_gram_set(ds.filter(lambda r: r["doc_id"] == 0), n=5)
    out = curate(ds, grams, min_tokens=5, max_dup_line_frac=0.30,
                 max_top2_frac=0.25, decontam_n=5).to_pandas()
    assert sorted(out.doc_id.tolist()) == [1]  # everything else gated
    assert int(out.n_dups.iloc[0]) == 2        # doc 6 collapsed into 1
    assert int(out.n_tokens.iloc[0]) == 8


def test_bigram_lm_xent_matches_bruteforce(ray_session):
    """Distributed bigram-LM train + map-only scoring vs a Counter-based
    reference (add-alpha smoothing, context-count denominators)."""
    import math
    import re
    from collections import Counter

    import ray.data

    from rayindex.datapipe.lm import bigram_model, score_xent

    docs = ["the cat sat on the mat", "the cat ate the rat",
            "dogs chase the cat", "x", "", "cat cat cat cat"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t).repartition(3)
    ref_toks = [re.findall(r"[a-z0-9_]+", d.lower()) for d in docs]
    bc = Counter((a, b) for tk in ref_toks for a, b in zip(tk, tk[1:]))
    ctx = Counter()
    for (a, _), c in bc.items():
        ctx[a] += c
    V = len({w for p in bc for w in p})
    alpha = 0.1
    mref, vm = bigram_model(ds)
    assert vm == V
    out = score_xent(ds, mref, alpha=alpha).to_pandas().set_index("doc_id")
    for i, tk in enumerate(ref_toks):
        pairs = list(zip(tk, tk[1:]))
        h = -sum(math.log((bc[p] + alpha) / (ctx[p[0]] + alpha * V))
                 for p in pairs) / len(pairs) if pairs else 0.0
        assert out.loc[i].n_bigrams == len(pairs)
        assert out.loc[i].xent == pytest.approx(h, abs=1e-12)
    # pruning drops hapax bigrams but keeps V and context mass
    mref2, v2 = bigram_model(ds, min_count=2)
    assert v2 == V
    out2 = score_xent(ds, mref2, alpha=alpha).to_pandas() \
        .set_index("doc_id")
    # "cat cat cat cat": c(cat,cat)=3 survives pruning -> score unchanged
    assert out2.loc[5].xent == pytest.approx(out.loc[5].xent)
    # doc 2's bigrams are all hapax -> pruned to c=0 -> strictly worse
    assert out2.loc[2].xent > out.loc[2].xent


def test_kmeans_recovers_blobs(ray_session):
    """Distributed Lloyd's recovers well-separated blobs (purity 1.0),
    inertia history is non-increasing, and the full run matches a local
    numpy Lloyd reference started from the same init."""
    import ray.data

    from rayindex.datapipe.ann import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(11)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]],
                       np.float64)
    labels = rng.integers(0, 3, 300)
    vecs = centers[labels] + rng.normal(scale=0.3, size=(300, 4))
    t = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(7)
    seeds = np.stack([vecs[labels == b][0] for b in range(3)])
    cents, info = kmeans_fit(ds, k=3, n_iter=20, init=seeds,
                             metric="l2", dtype=np.float64)
    assert info["converged"]
    hist = info["inertia"]
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:]))
    out = kmeans_assign(ds, cents, metric="l2").to_pandas() \
        .sort_values("vec_id")
    # purity: every true blob maps to exactly one learned cluster
    for b in range(3):
        assert out.cluster[labels == b].nunique() == 1
    assert out.cluster.nunique() == 3
    # parity with a driver-side numpy Lloyd from the same init
    c = seeds.copy()
    for _ in range(info["n_iter"]):
        d2 = ((vecs * vecs).sum(1, keepdims=True) - 2 * vecs @ c.T
              + (c * c).sum(1))
        a = d2.argmin(1)
        for j in range(3):
            if (a == j).any():
                c[j] = vecs[a == j].mean(0)
    d2 = ((vecs * vecs).sum(1, keepdims=True) - 2 * vecs @ c.T
          + (c * c).sum(1))
    assert np.array_equal(out.cluster.to_numpy(), d2.argmin(1))


def test_kmeans_cosine_spherical(ray_session):
    import ray.data

    from rayindex.datapipe.ann import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(5)
    dirs = np.array([[1, 0, 0], [0, 1, 0]], np.float64)
    labels = rng.integers(0, 2, 120)
    vecs = dirs[labels] * rng.uniform(0.5, 5.0, (120, 1)) \
        + rng.normal(scale=0.05, size=(120, 3))
    t = pa.table({"vec_id": pa.array(np.arange(120, dtype=np.int64)),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(4)
    cents, info = kmeans_fit(ds, k=2, n_iter=15, init="first",
                             metric="cosine")
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    out = kmeans_assign(ds, cents, metric="cosine").to_pandas() \
        .sort_values("vec_id")
    for b in range(2):
        assert out.cluster[labels == b].nunique() == 1
    assert (out.dist.to_numpy() < 0.05).all()  # tight angular clusters


def test_pq_adc_recall(ray_session):
    """PQ train → encode → ADC top-k: decent recall vs exact L2 on
    clustered vectors, deterministic across runs, 1-byte-per-subspace
    codes."""
    import ray.data

    from rayindex.datapipe.ann import knn_pq, pq_encode, pq_train

    rng = np.random.default_rng(21)
    centers = rng.normal(scale=5.0, size=(6, 16))
    labels = rng.integers(0, 6, 400)
    vecs = centers[labels] + rng.normal(scale=0.4, size=(400, 16))
    t = pa.table({"vec_id": pa.array(np.arange(400, dtype=np.int64)),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(5)
    books = pq_train(ds, m=8, k=32, n_iter=12, seed=3)
    assert books.shape == (8, 32, 2)
    codes = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert all(len(c) == 8 for c in codes.pq_codes)
    codes_ds = ray.data.from_pandas(codes).repartition(5)
    queries = vecs[:5]
    got = knn_pq(codes_ds, queries, books, k=10).to_pandas()
    # exact L2 reference
    recalls = []
    for qi in range(5):
        d = ((vecs - queries[qi]) ** 2).sum(1)
        exact = set(np.lexsort((np.arange(400), d))[:10].tolist())
        approx = set(got[got.query_id == qi].vec_id.tolist())
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.6, recalls
    # coarse correctness: every ADC top-10 member is from the query's blob
    for qi in range(5):
        hit_labels = labels[got[got.query_id == qi].vec_id.to_numpy()]
        assert (hit_labels == labels[qi]).all()
    # self-match: each query's own vector lands in its top-10
    for qi in range(5):
        assert qi in got[got.query_id == qi].vec_id.tolist()
    # determinism: same seed -> identical codebooks
    books2 = pq_train(ds, m=8, k=32, n_iter=12, seed=3)
    assert np.array_equal(books, books2)


def test_knn_brute_matches_numpy(ray_session):
    import ray.data

    from rayindex.datapipe.ann import knn_brute

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    ids = np.arange(200, dtype=np.int64)
    t = pa.table({"vec_id": ids, "embedding": pa.array([v.tolist() for v in vecs],
                                                       pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    queries = vecs[:3]
    out = knn_brute(ds, queries, k=5).to_pandas()
    # reference: plain numpy
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = qn @ vn.T
    for qi in range(3):
        order = np.lexsort((ids, -sims[qi]))[:5]
        got = out[out.query_id == qi].sort_values("rank")
        assert got.vec_id.tolist() == ids[order].tolist()
        assert np.allclose(got.cos_sim.to_numpy(), sims[qi][order], atol=1e-6)
        assert got.vec_id.iloc[0] == qi  # self-match first


def test_knn_ivf_high_recall(ray_session):
    import ray.data

    from rayindex.datapipe.ann import knn_brute, knn_ivf

    rng = np.random.default_rng(5)
    # clustered data so IVF recall is high
    centers = rng.normal(size=(4, 16)).astype(np.float32) * 5
    vecs = np.concatenate([
        centers[i] + rng.normal(size=(50, 16)).astype(np.float32) for i in range(4)
    ])
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({"vec_id": ids, "embedding": pa.array([v.tolist() for v in vecs],
                                                       pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    queries = vecs[:4]
    exact = knn_brute(ds, queries, k=5).to_pandas()
    approx = knn_ivf(ds, queries, k=5, n_centroids=4, nprobe=2).to_pandas()
    recall = 0
    for qi in range(4):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recall += len(e & a) / 5
    assert recall / 4 >= 0.8


def test_semdedup_planted_duplicates(ray_session):
    """SemDeDup (Abbas et al. 2023): planted near-identical vectors
    collapse to the lowest-id representative, distinct vectors keep,
    components never cross clusters' pair scope, and a threshold no
    pair can reach keeps everything."""
    import ray.data

    from rayindex.datapipe.ann import semdedup

    rng = np.random.default_rng(23)
    centers = rng.normal(scale=8.0, size=(3, 16))
    base = np.concatenate([
        centers[i] + rng.normal(scale=0.5, size=(30, 16))
        for i in range(3)])
    # plant: ids 90/91/92 duplicate id 0 (tiny jitter); 93 duplicates 40
    dup = np.stack([base[0] + 1e-4, base[0] - 1e-4, base[0] + 2e-4,
                    base[40] + 1e-4])
    vecs = np.concatenate([base, dup])
    t = pa.table({"vec_id": pa.array(np.arange(len(vecs),
                                               dtype=np.int64)),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(4)
    out = semdedup(ds, k=3, threshold=0.9999, n_iter=4, init="first") \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 94
    for v in (90, 91, 92):
        assert out.loc[v, "comp"] == 0 and out.loc[v, "keep"] == 0
    assert out.loc[93, "comp"] == 40 and out.loc[93, "keep"] == 0
    assert out.loc[0, "keep"] == 1 and out.loc[40, "keep"] == 1
    # everyone else is their own component
    others = out[~out.vec_id.isin([0, 40, 90, 91, 92, 93])]
    assert (others.comp == others.vec_id).all() and (others.keep == 1).all()
    # unreachable threshold: nothing dedups (empty pair graph path)
    out2 = semdedup(ds, k=3, threshold=1.1, n_iter=1, init="first") \
        .to_pandas()
    assert (out2.keep == 1).all() and (out2.comp == out2.vec_id).all()


def test_ivfpq_composed_recall(ray_session):
    """IVF-PQ composition (VERDICT r4 item 5 — Jégou 2011's actual
    system): coarse k-means routing + residual PQ codebooks + per-list
    ADC.  On clustered blobs: high recall vs exact L2, every hit from
    the query's own blob, self-match in top-k, deterministic training,
    and nprobe=1 returns only same-list candidates."""
    import ray.data

    from rayindex.datapipe.ann import ivfpq_encode, ivfpq_train, knn_ivfpq

    rng = np.random.default_rng(17)
    centers = rng.normal(scale=6.0, size=(5, 16))
    labels = np.repeat(np.arange(5), 80)
    vecs = centers[labels] + rng.normal(scale=0.4, size=(400, 16))
    t = pa.table({"vec_id": pa.array(np.arange(400, dtype=np.int64)),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t).repartition(5)
    coarse, books = ivfpq_train(ds, n_centroids=5, m=8, k=32,
                                n_iter=10, seed=3)
    assert coarse.shape == (5, 16) and books.shape == (8, 32, 2)
    enc = ivfpq_encode(ds, coarse, books).materialize()
    assert set(enc.schema().names) == {"vec_id", "list_id", "pq_codes"}
    queries = vecs[:5]
    got = knn_ivfpq(enc, queries, coarse, books, k=10, nprobe=2) \
        .to_pandas()
    recalls = []
    for qi in range(5):
        d = ((vecs - queries[qi]) ** 2).sum(1)
        exact = set(np.lexsort((np.arange(400), d))[:10].tolist())
        mine = got[got.query_id == qi]
        recalls.append(len(exact & set(mine.vec_id.tolist())) / 10)
        assert (labels[mine.vec_id.to_numpy()] == labels[qi]).all()
        assert qi in mine.vec_id.tolist()  # self-match
    assert np.mean(recalls) >= 0.6, recalls
    # nprobe=1: every candidate comes from the query's own coarse list
    encdf = enc.to_pandas().set_index("vec_id")
    got1 = knn_ivfpq(enc, queries, coarse, books, k=10, nprobe=1) \
        .to_pandas()
    for qi in range(5):
        lists = encdf.loc[got1[got1.query_id == qi].vec_id,
                          "list_id"].nunique()
        assert lists == 1
    # determinism
    coarse2, books2 = ivfpq_train(ds, n_centroids=5, m=8, k=32,
                                  n_iter=10, seed=3)
    assert np.array_equal(coarse, coarse2)
    assert np.array_equal(books, books2)


def test_tumbling_window_matches_pandas(ray_session):
    import ray.data

    from rayindex.datapipe.windows import tumbling_window

    rng = np.random.default_rng(11)
    n = 500
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400 * 3, n), unit="s")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 5, n),
        "ts": ts,
        "value": rng.normal(size=n),
    })
    ds = ray.data.from_pandas(df)
    out = tumbling_window(ds, window_s=3600).to_pandas()
    # pandas reference: ns → s → hour-aligned window start
    df["window_start"] = df.ts.astype("int64") // 10**9 // 3600 * 3600
    ref = df.groupby(["user_id", "window_start"]).agg(
        n_events=("value", "size"), sum_value=("value", "sum"),
        min_value=("value", "min"), max_value=("value", "max")).reset_index()
    merged = out.merge(ref, on=["user_id", "window_start"], suffixes=("", "_ref"))
    assert len(merged) == len(ref) == len(out)
    assert (merged.n_events == merged.n_events_ref).all()
    assert np.allclose(merged.sum_value, merged.sum_value_ref)


def test_sessionize(ray_session):
    import ray.data

    from rayindex.datapipe.windows import sessionize

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:10:00",  # session 1
            "2024-01-01 02:00:00",                         # session 2 (gap>30m)
            "2024-01-01 00:00:00",
        ]),
    })
    out = sessionize(ray.data.from_pandas(df), gap_s=1800).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_start")
    assert len(u1) == 2
    assert u1.n_events.tolist() == [2, 1]
    assert len(out[out.user_id == 2]) == 1


def test_media_decode_fake_backend(ray_session):
    import ray.data

    from rayindex.datapipe.media import MediaDecoder, attach_media_meta, decode_features

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"\x00\x01binary!", b""], pa.binary()),
    })
    ds = ray.data.from_arrow(t)
    meta = ds.map_batches(attach_media_meta, batch_format="pyarrow").to_pandas()
    assert meta.n_bytes.tolist() == [9, 0]
    feats = decode_features(ds, backend="fake", feature_dim=8, concurrency=1).to_pandas()
    assert all(len(f) == 8 for f in feats.feature)
    # deterministic across calls
    feats2 = decode_features(ds, backend="fake", feature_dim=8, concurrency=1).to_pandas()
    assert [list(f) for f in feats.feature] == [list(f) for f in feats2.feature]
    # real backend rejects unknown containers with a clear error
    dec = MediaDecoder(backend="real")
    with pytest.raises(ValueError, match="unsupported media container"):
        dec(t)


def test_parse_date_filter_drops_invalid():
    from rayindex.datapipe.text import parse_date_filter

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "date_str": pa.array(["20240115", "notadate", "19991231", ""], pa.string()),
    })
    out = parse_date_filter(t)
    assert out["doc_id"].to_pylist() == [1, 3]
    # 2024-01-15 and 1999-12-31 as epoch days
    import datetime as dt

    exp = [(dt.date(2024, 1, 15) - dt.date(1970, 1, 1)).days,
           (dt.date(1999, 12, 31) - dt.date(1970, 1, 1)).days]
    assert out["epoch_day"].to_pylist() == exp
    assert "date_str" not in out.column_names


def test_html_unescape_roundtrip_and_nesting():
    from rayindex.datapipe.text import html_escape_batch, html_unescape_batch

    texts = ['a < b & c > d', 'say "hi" & \'bye\'', 'plain', '&amp;lt; stays &lt;']
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    # escape then unescape is the identity, even for entity-looking input
    rt = html_unescape_batch(html_escape_batch(t))
    assert rt["text"].to_pylist() == texts
    # decode order: &amp;lt; is the LITERAL "&lt;", not "<"
    u = html_unescape_batch(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["&amp;lt;x&gt; &quot;q&quot; &#39;s&#39;"], pa.string()),
    }))
    assert u["text"].to_pylist() == ['&lt;x> "q" \'s\'']


def test_connected_components_min_label(ray_session):
    import ray.data

    from rayindex.datapipe.clusters import connected_components

    # path 1-2-3-4 (diameter 3), clique {10,11,12}, self-loop 20-20,
    # duplicate + reversed edges — all must resolve to component minima
    pairs = pa.table({"doc_a": pa.array([2, 1, 3, 11, 10, 12, 20, 3, 4], pa.int64()),
                      "doc_b": pa.array([1, 2, 4, 10, 11, 10, 20, 2, 3], pa.int64())})
    cc = connected_components(pairs).to_pandas()
    got = dict(zip(cc["node"], cc["comp"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}
    # empty pair graph -> empty dataset with stable schema
    empty = connected_components(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    assert empty.count() == 0
    assert empty.schema().names == ["node", "comp"]


def test_dedup_keep_canonical(ray_session):
    import ray.data

    from rayindex.datapipe.clusters import dedup_keep_canonical

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 10, 11, 12], pa.int64()),
        "text": pa.array([str(i) for i in range(8)], pa.string())}))
    pairs = pa.table({"doc_a": pa.array([2, 3, 4, 11, 12], pa.int64()),
                      "doc_b": pa.array([1, 2, 3, 10, 10], pa.int64())})
    kept = sorted(dedup_keep_canonical(docs, pairs).to_pandas()["doc_id"])
    # component {1,2,3,4} keeps 1; {10,11,12} keeps 10; 5 untouched
    assert kept == [1, 5, 10]
    # no pairs -> identity
    nop = dedup_keep_canonical(docs, pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    assert sorted(nop.to_pandas()["doc_id"]) == [1, 2, 3, 4, 5, 10, 11, 12]


def test_hash_sampling_deterministic(ray_session):
    import numpy as np
    import ray.data

    from rayindex.datapipe.sampling import fnv1a_u64, hash_sample, stratified_sample

    ids = np.arange(4000, dtype=np.int64)
    langs = np.array(["en", "zh", "fr", "de"])[ids % 4]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "lang": pa.array(langs)}))

    s1 = sorted(hash_sample(docs, 0.25).to_pandas()["doc_id"])
    s2 = sorted(hash_sample(docs, 0.25).to_pandas()["doc_id"])
    assert s1 == s2  # pure function of the row
    # rate accuracy: FNV is uniform; 4000 draws at p=.25 stay within 5 sigma
    assert abs(len(s1) - 1000) < 5 * (4000 * 0.25 * 0.75) ** 0.5
    # exact rule
    keep = fnv1a_u64(ids) % np.uint64(1_000_000) < np.uint64(250_000)
    assert s1 == sorted(ids[keep].tolist())
    # rate 0 / 1 edge cases
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 4000

    st = stratified_sample(docs, {"en": 0.0, "zh": 1.0}, "lang",
                           default_rate=0.5).to_pandas()
    assert (st["lang"] != "en").all()
    assert (st["lang"] == "zh").sum() == 1000
    got_fr = set(st[st["lang"] == "fr"]["doc_id"])
    exp_fr = {i for i in ids[langs == "fr"]
              if fnv1a_u64(np.array([i]))[0] % 1_000_000 < 500_000}
    assert got_fr == exp_fr


def test_redact_pii_and_normalize():
    from rayindex.datapipe.text import normalize_text_batch, redact_pii_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail a@b.co or x.y+z@sub.example.org, call +44 20-7946 0958",
            "server at 10.0.0.1 port 80; not-an-ip 999.999.999.999.9",
            "no pii here",
        ]),
    })
    out = redact_pii_batch(t)["text"].to_pylist()
    assert out[0] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert "<IP>" in out[1] and out[2] == "no pii here"

    # NFC: decomposed A+ring composes; case folds; whitespace collapses
    dec_a_ring = "Å"
    t2 = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([f"  {dec_a_ring}ngström\tUnit  ", "PLAIN ascii\n\n x"]),
    })
    got = normalize_text_batch(t2)["text"].to_pylist()
    assert got == ["ångström unit", "plain ascii x"]


def test_top_k_per_group(ray_session):
    import ray.data

    from rayindex.datapipe.select import top_k_per_group

    rng = np.random.default_rng(5)
    n = 500
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, n)]
    vals = rng.integers(0, 50, n)  # many ties
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "lang": pa.array(langs),
                  "n_chars": pa.array(vals.astype(np.int64))})
    # spread over partitions so the partial/final combiner is exercised
    ds = ray.data.from_arrow(t).repartition(7)
    got = (top_k_per_group(ds, "lang", "n_chars", k=4).to_pandas()
           .sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True]).reset_index(drop=True))
    df = t.to_pandas()
    want = (df.sort_values(["lang", "n_chars", "doc_id"],
                           ascending=[True, False, True])
              .groupby("lang", sort=False).head(4)
              .sort_values(["lang", "n_chars", "doc_id"],
                           ascending=[True, False, True])
              .reset_index(drop=True)[["lang", "doc_id", "n_chars"]])
    assert got[["lang", "doc_id", "n_chars"]].equals(want)

def test_value_quantiles_matches_numpy_rule(ray_session):
    import ray.data

    from rayindex.datapipe.stats import value_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, 2000).astype(np.int64)  # heavy ties
    t = pa.table({"n_chars": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(9)
    qs = (0.0, 0.1, 0.5, 0.9, 0.999, 1.0)
    got = value_quantiles(ds, "n_chars", qs)
    s = np.sort(vals)
    want = [int(s[max(int(np.ceil(q * len(s))) - 1, 0)]) for q in qs]
    assert got["value"].tolist() == want
    assert got["q"].tolist() == list(qs)


def test_value_quantiles_empty(ray_session):
    import ray.data

    from rayindex.datapipe.stats import value_quantiles

    t = pa.table({"n_chars": pa.array([], pa.int64())})
    ds = ray.data.from_arrow(t)
    got = value_quantiles(ds, "n_chars", (0.5,))
    assert len(got) == 0


def test_float_quantiles_continuous_exact(ray_session):
    """Continuous (float) domain: the iterative histogram-narrowing path
    must reproduce quantile_disc BIT-exactly — including a heavy-tie
    point mass, NaNs (excluded), and tail quantiles."""
    import ray.data

    from rayindex.datapipe.stats import float_quantiles, value_quantiles

    rng = np.random.default_rng(23)
    vals = np.concatenate([rng.normal(0.0, 1.0, 4000),
                           rng.exponential(3.0, 4000),
                           np.full(1000, 2.5),            # point mass
                           np.full(50, np.nan)])
    rng.shuffle(vals)
    t = pa.table({"value": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(7)
    qs = (0.001, 0.25, 0.5, 0.75, 0.999)
    s = np.sort(vals[~np.isnan(vals)])
    want = [float(s[max(int(np.ceil(q * s.size)) - 1, 0)]) for q in qs]

    got = float_quantiles(ds, "value", qs, bins=64)  # small bins: force
    assert got["value"].tolist() == want             # narrowing to work
    # the dispatcher routes float columns here automatically
    got2 = value_quantiles(ds, "value", qs)
    assert got2["value"].tolist() == want


def test_value_quantiles_high_cardinality_routes_bounded(ray_session):
    """An int column whose distinct count exceeds distinct_cap must NOT
    materialize the distinct-value histogram on the driver — it routes
    through the narrowing path (driver rows ≤ nq × bins) and stays
    exact."""
    import ray.data

    from rayindex.datapipe.stats import value_quantiles

    rng = np.random.default_rng(29)
    vals = rng.integers(0, 2**40, 5000).astype(np.int64)
    t = pa.table({"v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(5)
    qs = (0.1, 0.5, 0.9)
    got = value_quantiles(ds, "v", qs, distinct_cap=100)
    s = np.sort(vals)
    want = [int(s[max(int(np.ceil(q * s.size)) - 1, 0)]) for q in qs]
    assert got["value"].tolist() == want
    assert str(got["value"].dtype) == "int64"


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def _pack_oracle(ids, counts, L):
    """Per-doc span cut over the concatenated stream, straight-line."""
    rows = []
    base = 0
    for d, n in zip(ids, counts):
        for c in range(base // L, (base + n - 1) // L + 1) if n else []:
            s = max(c * L - base, 0)
            e = min((c + 1) * L - base, n)
            rows.append((c, d, s, e - s))
        base += n
    return sorted(rows)


def test_pack_sequences_spans(ray_session):
    import ray.data

    from rayindex.datapipe.pack import pack_sequences

    # token counts: 5, 0 (empty doc), 3, 4 (exact boundary), 10 (spans 3)
    texts = ["a b c d e", "", "x y z", "p q r s",
             " ".join(f"t{i}" for i in range(10))]
    ids = [3, 7, 9, 12, 20]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = sorted(
        (r["chunk_id"], r["doc_id"], r["tok_start"], r["tok_len"])
        for r in pack_sequences(ds, 4, range_docs=8).take_all())
    assert got == _pack_oracle(ids, [5, 0, 3, 4, 10], 4)
    # every chunk but the last is exactly full
    per_chunk = {}
    for c, _, _, ln in got:
        per_chunk[c] = per_chunk.get(c, 0) + ln
    last = max(per_chunk)
    assert all(v == 4 for c, v in per_chunk.items() if c != last)


def test_pack_sequences_multirange_prefix_sum(ray_session):
    """Ids straddling many prefix-sum ranges still produce the single
    global concatenation order."""
    import ray.data

    from rayindex.datapipe.pack import pack_sequences

    rng = np.random.RandomState(5)
    counts = rng.randint(0, 9, size=40)
    ids = (np.arange(40) * 3 + 1).tolist()  # spread across range_docs=16
    texts = [" ".join(f"w{j}" for j in range(c)) for c in counts]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = sorted(
        (r["chunk_id"], r["doc_id"], r["tok_start"], r["tok_len"])
        for r in pack_sequences(ds, 16, range_docs=16).take_all())
    assert got == _pack_oracle(ids, counts.tolist(), 16)


def test_winnow_guarantee_shared_run_shares_fingerprint(ray_session):
    """Winnowing's detection guarantee (Schleimer et al. 2003): two docs
    sharing a token run of length >= window + k - 1 share at least one
    selected fingerprint; and the picks are position-consistent (the
    same text yields the same (relative pos, fp) set)."""
    import ray.data

    from rayindex.datapipe.spans import winnow_fingerprints

    k, w = 4, 4
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(50)]
    shared = " ".join(rng.choice(vocab, size=w + k - 1))  # minimal run
    pre = " ".join(rng.choice(vocab, size=13))
    post = " ".join(rng.choice(vocab, size=9))
    docs = {
        1: f"{pre} {shared} {post}",
        2: f"{shared}",                       # the run alone
        3: " ".join(rng.choice(vocab, size=30)),  # unrelated
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    rows = winnow_fingerprints(ds, k=k, window=w).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"

    # determinism / position-consistency: identical text, identical picks
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array([docs[1]], pa.string())}))
    again = {(r["pos"], r["fp"])
             for r in winnow_fingerprints(ds2, k=k, window=w).take_all()}
    first = {(r["pos"], r["fp"]) for r in rows if r["doc_id"] == 1}
    assert again == first


def test_winnow_short_and_empty_docs(ray_session):
    import ray.data

    from rayindex.datapipe.spans import winnow_fingerprints

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", "", None, "a b c d e"], pa.string()),
    }))
    rows = winnow_fingerprints(ds, k=4, window=4).take_all()
    # only doc 4 has >= k tokens; 5 tokens -> 2 grams -> m <= w -> 1 pick
    assert [r["doc_id"] for r in rows] == [4]
    assert rows[0]["pos"] in (1, 2)


def test_span_attribution_pairs_and_boilerplate_cap(ray_session):
    """span_attribution (VERDICT r4 item 6): docs sharing a passage
    >= window+k-1 tokens emit a (doc_a, doc_b, n_shared_fps) pair;
    unrelated docs never pair; and a fingerprint present in more than
    max_docs_per_fp docs (boilerplate) is excluded from attribution."""
    import ray.data

    from rayindex.datapipe.spans import span_attribution

    k, w = 4, 4
    rng = np.random.RandomState(11)
    vocab = [f"tok{i}" for i in range(60)]
    shared = " ".join(rng.choice(vocab, size=2 * (w + k - 1)))
    boiler = " ".join(rng.choice(vocab, size=w + k - 1))
    docs = {
        1: f"{shared} " + " ".join(rng.choice(vocab, size=10)),
        2: f"{shared} " + " ".join(rng.choice(vocab, size=12)),
        3: " ".join(rng.choice(vocab, size=30)),  # unrelated
    }
    # docs 10..19 all carry the boilerplate passage (hot fingerprint)
    for i in range(10, 20):
        docs[i] = f"{boiler} " + " ".join(rng.choice(vocab, size=8))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())})) \
        .repartition(3)
    out = span_attribution(ds, k=k, window=w, max_docs_per_fp=64) \
        .to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (1, 2) in pairs
    n12 = int(out[(out.doc_a == 1) & (out.doc_b == 2)]
              .n_shared_fps.iloc[0])
    assert n12 >= 1
    assert not any(3 in p for p in pairs)
    assert (out.doc_a < out.doc_b).all()
    # boilerplate docs pair with each other under the default cap...
    assert (10, 11) in pairs
    # ...but a cap below the boilerplate fan-out removes those pairs
    # without touching the 1-2 attribution
    capped = span_attribution(ds, k=k, window=w, max_docs_per_fp=5) \
        .to_pandas()
    cp = set(zip(capped.doc_a, capped.doc_b))
    assert (1, 2) in cp and (10, 11) not in cp


def test_cdc_chunks_shift_invariance_and_coverage(ray_session):
    """Content-defined chunking: chunks tile each doc's token stream
    exactly; a shifted copy (prefix inserted) shares every chunk hash
    of the original except near the insertion point — the property
    fixed-width blocking lacks; short and empty docs behave."""
    import ray.data

    from rayindex.datapipe.spans import cdc_chunks

    rng = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(300)]
    body = " ".join(rng.choice(vocab, size=600))
    prefix = " ".join(rng.choice(vocab, size=37))
    docs = {1: body, 2: f"{prefix} {body}", 3: "a b", 4: "", 5: None}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())})) \
        .repartition(2)
    out = cdc_chunks(ds, k=4, mask_bits=4).to_pandas()
    # coverage: chunks tile the stream (starts/lengths are contiguous)
    for did, grp in out.groupby("doc_id"):
        g = grp.sort_values("chunk_idx")
        assert g.chunk_idx.tolist() == list(range(len(g)))
        nxt = g.start_tok.to_numpy() + g.n_tokens.to_numpy()
        assert (nxt[:-1] == g.start_tok.to_numpy()[1:]).all()
        assert g.start_tok.iloc[0] == 1
    # short doc: one chunk of 2 tokens; empty/None docs: no rows
    assert out[out.doc_id == 3].n_tokens.tolist() == [2]
    assert not ((out.doc_id == 4) | (out.doc_id == 5)).any()
    # shift invariance: the original's chunk hash multiset is almost
    # entirely contained in the shifted copy's
    h1 = out[out.doc_id == 1].chunk_hash.tolist()
    h2 = set(out[out.doc_id == 2].chunk_hash.tolist())
    shared = sum(1 for h in h1 if h in h2)
    assert shared >= len(h1) - 2 and len(h1) >= 10
    # determinism across runs
    again = cdc_chunks(ds, k=4, mask_bits=4).to_pandas()
    a = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert a.chunk_hash.tolist() == b.chunk_hash.tolist()


def test_duplicate_span_stats_counts_cross_doc_only(ray_session):
    """n_dup_fps counts fingerprints shared with OTHER docs; a doc's
    internally-repeated passage alone does not mark it duplicated."""
    import ray.data

    from rayindex.datapipe.spans import duplicate_span_stats

    run = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens = w+k-1
    docs = {
        1: f"{run} filler one two three",
        2: f"other words here then {run}",
        3: f"{run} middle bit {run}",           # self-repeat + cross
        4: "totally unrelated content stream of tokens",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    st = {r["doc_id"]: r
          for r in duplicate_span_stats(ds, k=4, window=4).take_all()}
    assert st[1]["n_dup_fps"] > 0
    assert st[2]["n_dup_fps"] > 0
    assert st[3]["n_dup_fps"] > 0
    assert st[4]["n_dup_fps"] == 0
    for r in st.values():
        assert 0 < r["n_fps"] and 0 <= r["n_dup_fps"] <= r["n_fps"]


def test_dedup_substrings_cuts_shared_runs_only(ray_session):
    import ray.data

    from rayindex.datapipe.spans import dedup_substrings

    docs = {
        1: "alpha beta gamma delta epsilon unique one two",
        2: "prefix words alpha beta gamma delta epsilon suffix",
        3: "all original content nothing shared here at all",
        4: "xx",                     # shorter than k: kept verbatim
        5: "",                       # empty: row with '' / 0
        6: "r1 r2 r3 r4 r5 mid r1 r2 r3 r4 r5",  # self-repeat cut too
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = {r["doc_id"]: r for r in dedup_substrings(ds, k=5).take_all()}
    assert len(out) == len(docs)  # every doc gets a row
    assert out[1]["clean_text"] == "unique one two"
    assert out[2]["clean_text"] == "prefix words suffix"
    assert out[3]["clean_text"] == docs[3] and out[3]["n_kept"] == 8
    assert out[4] == {"doc_id": 4, "clean_text": "xx", "n_kept": 1}
    assert out[5] == {"doc_id": 5, "clean_text": "", "n_kept": 0}
    assert out[6]["clean_text"] == "mid"


def test_hash_tokens_flat_matches_scalar_path():
    """The vectorized column hasher must be bit-identical to the
    per-token scalar path (findall + hash_token) on arbitrary input —
    unicode, empties, nulls, punctuation-only, repeated vocab."""
    import random
    import string

    import pyarrow as pa

    from rayindex.datapipe.text import _ASCII, hash_token, hash_tokens_flat

    rng = random.Random(11)
    alphabet = string.ascii_letters + "0123456789_ .,;!?-éλ中"
    texts = ["".join(rng.choices(alphabet, k=rng.randint(0, 120)))
             for _ in range(200)]
    texts += ["", "   ", "___", "!!!", None, "Mixed CASE tok_1 tok_1"]
    flat, offs = hash_tokens_flat(pa.array(texts, pa.string()))
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        toks = _ASCII.findall(t.lower()) if t else []
        want = [int(hash_token(x)) for x in toks]
        got = [int(x) for x in flat[offs[i]:offs[i + 1]]]
        assert want == got, f"doc {i}"


def test_dataset_split_deterministic_disjoint(ray_session):
    import ray.data

    from rayindex.datapipe.sampling import dataset_split, fnv1a_u64

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = dataset_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas().sort_values("doc_id")
    # exhaustive + deterministic re-run
    assert len(out) == 2000
    out2 = dataset_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas().sort_values("doc_id")
    assert out.split.tolist() == out2.split.tolist()
    # matches the scalar rule
    h = fnv1a_u64(np.arange(2000, dtype=np.int64)) % np.uint64(1_000_000)
    exp = np.where(h < 800000, "train", np.where(h < 900000, "val", "test"))
    assert out.split.tolist() == exp.tolist()
    # rough proportions
    frac = out.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    with pytest.raises(ValueError):
        dataset_split(ds, {"a": 0.5, "b": 0.4})
