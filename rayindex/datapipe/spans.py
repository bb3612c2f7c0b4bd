"""Winnowing fingerprints + duplicated-passage statistics.

Whole-document near-dup (MinHash / SimHash / n-gram Jaccard,
datapipe/dedup.py) misses PARTIAL duplication — a license header, a
README pasted into a thousand repos, one copied function — which is
what actually poisons training data at the passage level (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better").
The classic substring-fingerprint algorithm is winnowing (Schleimer,
Wilkerson, Aiken, SIGMOD 2003 — the MOSS fingerprint): hash every
k-token gram (Karp-Rabin over FNV-1a token hashes), slide a w-gram
window, keep each window's minimum gram hash (leftmost on ties).
Guarantee: any duplicated token run of length ≥ w+k-1 tokens shares at
least one selected fingerprint between the copies; selected density is
~2/(w+1) per token, so downstream exchanges carry O(tokens/w)
(doc_id, pos, fp) rows — never text.

Scale shape: extraction is a stateless ``map_batches`` pass (numpy
sliding-window argmin per doc); duplicate detection is ONE
``groupby(fp)`` over the fingerprint rows; the per-doc duplication
profile is ONE ``groupby(doc_id)`` over the tagged rows.  No driver
state; a hot fingerprint (the license header) is one uint64 group whose
rows are (id, count) pairs, not documents.

Bit-reproducible in SQL: token hashes are FNV-1a (the ``th`` CTE twin
in __ray_entry__), gram hashes Karp-Rabin base 1000003 mod 2**64, the
window pick is the leftmost minimum — see oracle_sql()'s
winnow_fingerprints / winnow_dup_stats.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayindex.datapipe.text import _ASCII, gram_hashes, hash_tokens_flat



def winnow_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 4,
                 window: int = 4) -> pa.Table:
    """Per-doc winnowing picks as (id, pos, fp) rows; ``pos`` is the
    1-based gram index (token index of the gram's first token).  Docs
    with fewer than k tokens emit no rows."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    flat, offs = hash_tokens_flat(batch[text_col])
    out_id, out_pos, out_fp = [], [], []
    np_err = np.seterr(over="ignore")  # uint64 wraparound IS the hash ring
    for di, did in enumerate(ids):
        hs = flat[offs[di]:offs[di + 1]]
        if hs.size < k:
            continue
        g = gram_hashes(hs, k)
        if g.size <= window:
            pos = np.asarray([int(np.argmin(g))])
        else:
            win = np.lib.stride_tricks.sliding_window_view(g, window)
            pos = np.unique(np.arange(win.shape[0]) + win.argmin(axis=1))
        out_id.append(np.full(pos.size, did, ids.dtype))
        out_pos.append(pos + 1)
        out_fp.append(g[pos])
    np.seterr(**np_err)
    cat = (lambda parts, dt: np.concatenate(parts) if parts
           else np.empty(0, dt))
    return pa.table({
        id_col: pa.array(cat(out_id, ids.dtype)),
        "pos": pa.array(cat(out_pos, np.int64).astype(np.int64)),
        "fp": pa.array(cat(out_fp, np.uint64)),
    })


def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 4, window: int = 4):
    """Dataset of winnowing fingerprints (id_col, pos, fp)."""
    return ds.map_batches(
        lambda b: winnow_batch(b, text_col, id_col, k, window),
        batch_format="pyarrow", zero_copy_batch=True)


def duplicate_span_stats(ds, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 4,
                         window: int = 4, num_buckets: int = 64):
    """Per-doc duplicated-passage profile: (id_col, n_fps, n_dup_fps)
    where n_dup_fps counts this doc's fingerprints that also occur in at
    least one OTHER doc.  n_dup_fps/n_fps is the doc's copied-content
    fraction — the passage-level filter signal whole-doc near-dup can't
    produce.  Two bucketed groupby exchanges over O(tokens/window) rows
    — grouping is by ``hash % num_buckets``, NOT by raw fingerprint/doc,
    so the reducer runs ``num_buckets`` vectorized pandas kernels
    instead of one Python call per distinct fingerprint (a million-group
    map_groups at corpus scale); every occurrence of one fingerprint
    still lands in one bucket, so counts are exact.  Docs with < k
    tokens (no grams) emit no row."""
    import pandas as pd

    fps = winnow_fingerprints(ds, text_col, id_col, k, window)

    def add_fb(t: pa.Table) -> pa.Table:
        b = t["fp"].to_numpy(zero_copy_only=False) % np.uint64(num_buckets)
        return t.append_column("b", pa.array(b.astype(np.int64)))

    def tag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "fp" not in g.columns:  # empty sort partition
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "dup": pd.Series([], dtype="bool")})
        # all rows of many fingerprints: distinct-doc count per fp,
        # vectorized (C groupby), then flag each occurrence
        nd = g.groupby("fp")[id_col].transform("nunique")
        return pd.DataFrame({id_col: g[id_col],
                             "dup": (nd > 1).to_numpy()})

    def add_db(t: pa.Table) -> pa.Table:
        b = (t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
             % num_buckets)
        return t.append_column("b", pa.array(b))

    def prof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or id_col not in g.columns:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n_fps": pd.Series([], dtype="int64"),
                                 "n_dup_fps": pd.Series([], dtype="int64")})
        out = (g.groupby(id_col, sort=False)
                .agg(n_fps=("dup", "size"), n_dup_fps=("dup", "sum"))
                .reset_index())
        out["n_fps"] = out["n_fps"].astype(np.int64)
        out["n_dup_fps"] = out["n_dup_fps"].astype(np.int64)
        return out

    return (fps.map_batches(add_fb, batch_format="pyarrow")
               .groupby("b").map_groups(tag_bucket, batch_format="pandas")
               .map_batches(add_db, batch_format="pyarrow")
               .groupby("b").map_groups(prof_bucket, batch_format="pandas"))


def span_attribution(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 4, window: int = 4,
                     max_docs_per_fp: int = 64, num_buckets: int = 64,
                     pair_buckets: int = 64):
    """WHO copied WHOM: the cross-document attribution view of the
    winnowing profile — a Dataset of ``(doc_a, doc_b, n_shared_fps)``
    rows (doc_a < doc_b) counting the DISTINCT winnowing fingerprints
    the two docs share.  Each shared fingerprint certifies a shared
    k-token run, and the winnowing guarantee means any duplicated
    passage of ≥ window+k−1 tokens contributes at least one — so
    ``n_shared_fps`` is the passage-overlap mass
    :func:`duplicate_span_stats` aggregates away (Lee et al. 2022's
    audit question, per pair instead of per doc).

    Scale shape: two bucketed exchanges over O(tokens/window)
    fingerprint rows — ``groupby(fp % num_buckets)`` emits per-fp doc
    pairs, ``groupby(pair-hash % pair_buckets)`` sums them; documents
    never shuffle.  Fingerprints in more than ``max_docs_per_fp`` docs
    (boilerplate: license headers, generated preambles) are EXCLUDED —
    the cap bounds the per-fp pair fan-out to cap², making the
    worst-case exchange O(fps × cap) instead of all-pairs; raise it
    only with a reason.  The cap is part of the operator contract and
    reproduced by the SQL twin (``HAVING count(*) <= cap``)."""
    import pandas as pd

    fps = winnow_fingerprints(ds, text_col, id_col, k, window)

    def add_fb(t: pa.Table) -> pa.Table:
        b = t["fp"].to_numpy(zero_copy_only=False) % np.uint64(num_buckets)
        return t.append_column("b", pa.array(b.astype(np.int64)))

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        if g.empty or "fp" not in g.columns:
            return empty
        df = g[[id_col, "fp"]].drop_duplicates()
        cnt = df.groupby("fp")[id_col].transform("size")
        df = df[(cnt >= 2) & (cnt <= max_docs_per_fp)]
        if df.empty:
            return empty
        a_out, b_out = [], []
        # Python loop over DUPLICATED fingerprints only (the rare case);
        # singleton fps — the bulk — were dropped vectorized above
        for _, grp in df.groupby("fp", sort=False):
            ids = np.sort(grp[id_col].to_numpy(np.int64))
            ii, jj = np.triu_indices(ids.size, k=1)
            a_out.append(ids[ii])
            b_out.append(ids[jj])
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out)})

    pairs = (fps.map_batches(add_fb, batch_format="pyarrow")
             .groupby("b").map_groups(pairs_bucket, batch_format="pandas"))

    def add_pk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        pk = (t["doc_a"].to_numpy(zero_copy_only=False) * 1000003
              + t["doc_b"].to_numpy(zero_copy_only=False)) % pair_buckets
        return t.append_column("pk", pa.array(pk.astype(np.int64)))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "doc_a" not in g.columns:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "n_shared_fps": pd.Series([], dtype="int64")})
        out = (g.groupby(["doc_a", "doc_b"], sort=False)
               .size().rename("n_shared_fps").reset_index())
        out["n_shared_fps"] = out["n_shared_fps"].astype(np.int64)
        return out

    return (pairs.map_batches(add_pk, batch_format="pyarrow")
            .groupby("pk").map_groups(count_bucket, batch_format="pandas"))


def _all_grams_batch(batch: pa.Table, text_col: str, id_col: str,
                     k: int) -> pa.Table:
    """(id, pos, g) for EVERY k-gram (the exact pass; winnowing is the
    sampled candidate pass)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    flat, offs = hash_tokens_flat(batch[text_col])
    out_id, out_pos, out_g = [], [], []
    np_err = np.seterr(over="ignore")
    for di, did in enumerate(ids):
        hs = flat[offs[di]:offs[di + 1]]
        if hs.size < k:
            continue
        g = gram_hashes(hs, k)
        out_id.append(np.full(g.size, did, ids.dtype))
        out_pos.append(np.arange(1, g.size + 1, dtype=np.int64))
        out_g.append(g)
    np.seterr(**np_err)
    cat = (lambda parts, dt: np.concatenate(parts) if parts
           else np.empty(0, dt))
    return pa.table({
        id_col: pa.array(cat(out_id, ids.dtype)),
        "pos": pa.array(cat(out_pos, np.int64)),
        "g": pa.array(cat(out_g, np.uint64)),
    })


def dedup_substrings(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 5):
    """EXACT duplicated-substring removal (Lee et al. 2022 semantics,
    token granularity): cut every token covered by a k-gram that occurs
    more than once in the whole corpus (cross-doc or repeated within one
    doc), keep the rest.  Returns (id_col, clean_text, n_kept) for EVERY
    input doc — ``clean_text`` is the space-joined kept tokens of the
    lowercased ``[a-z0-9_]+`` token stream (the same normalization every
    fingerprint op here uses), ``''`` when nothing survives.

    Scale shape: one groupby(g) over O(tokens) (id, pos, g) rows finds
    duplicated grams (a hot gram — the license line — is one uint64
    group of small rows); the cut positions co-group with the texts via
    union + groupby(id) (Ray-native distributed join), so full documents
    shuffle exactly once.  At extreme scale run
    :func:`duplicate_span_stats` first and restrict this exact pass to
    docs with a nonzero copied-content fraction (winnowing guarantees
    any duplicated run of >= window+k-1 tokens is flagged)."""
    import pandas as pd

    grams = ds.map_batches(
        lambda b: _all_grams_batch(b, text_col, id_col, k),
        batch_format="pyarrow", zero_copy_batch=True)

    num_buckets = 64

    def add_gb(t: pa.Table) -> pa.Table:
        b = t["g"].to_numpy(zero_copy_only=False) % np.uint64(num_buckets)
        return t.append_column("b", pa.array(b.astype(np.int64)))

    def emit_dup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of many grams: occurrences of repeated grams, found by
        # one vectorized transform — not one Python call per distinct gram
        if g.empty or "g" not in g.columns:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        n = g.groupby("g")["pos"].transform("size")
        return g.loc[n > 1, [id_col, "pos"]]

    dup_pos = (grams.map_batches(add_gb, batch_format="pyarrow")
                    .groupby("b")
                    .map_groups(emit_dup_bucket, batch_format="pandas"))

    # co-group cut positions with the texts: tag, union, groupby(id).
    def tag_text(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "pos": pa.nulls(b.num_rows, pa.int64()),
            text_col: b[text_col],
        })

    def tag_pos(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "pos": b["pos"].cast(pa.int64()),
            text_col: pa.nulls(b.num_rows, pa.string()),
        })

    def add_ib(t: pa.Table) -> pa.Table:
        b = (t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
             % num_buckets)
        return t.append_column("b", pa.array(b))

    merged = (ds.select_columns([id_col, text_col])
                .map_batches(tag_text, batch_format="pyarrow")
                .union(dup_pos.map_batches(tag_pos, batch_format="pyarrow"))
                .map_batches(add_ib, batch_format="pyarrow"))

    def cut_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket = many docs' text rows + cut positions; the string
        # work is inherently per doc, but the group-call overhead
        # amortizes over the bucket
        if g.empty or id_col not in g.columns:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "clean_text": pd.Series([], dtype="object"),
                                 "n_kept": pd.Series([], dtype="int64")})
        texts = g[g[text_col].notna() | g["pos"].isna()]
        pos_rows = g[g["pos"].notna()]
        pos_by_doc = {did: grp["pos"].to_numpy(np.float64).astype(np.int64)
                      for did, grp in pos_rows.groupby(id_col, sort=False)}
        ids_out, clean_out, n_out = [], [], []
        for did, t in zip(texts[id_col], texts[text_col]):
            toks = _ASCII.findall(t.lower()) if isinstance(t, str) and t \
                else []
            covered = np.zeros(len(toks), bool)
            for p in pos_by_doc.get(did, ()):
                covered[p - 1:p - 1 + k] = True
            kept = [tok for tok, c in zip(toks, covered) if not c]
            ids_out.append(did)
            clean_out.append(" ".join(kept))
            n_out.append(len(kept))
        return pd.DataFrame({
            id_col: ids_out,
            "clean_text": pd.array(clean_out, dtype="object"),
            "n_kept": np.asarray(n_out, np.int64),
        })

    return merged.groupby("b").map_groups(cut_bucket, batch_format="pandas")


_CDC_B = np.uint64(1000003)
_CDC_BINV = np.uint64(pow(1000003, -1, 1 << 64))  # odd base: invertible


def cdc_chunks(ds, k: int = 4, mask_bits: int = 6,
               text_col: str = "text", id_col: str = "doc_id"):
    """Content-defined chunking (the Rabin-fingerprint boundary rule of
    LBFS, Muthitacharoen et al. 2001, at token granularity): cut after
    any k-token window whose Karp-Rabin gram hash has ``mask_bits`` low
    zero bits — expected chunk length 2^mask_bits tokens.  Because
    boundaries depend on CONTENT, an insertion only re-cuts the
    neighboring chunks, so ``groupby(chunk_hash)`` dedup finds shared
    spans across shifted copies where fixed-width blocks cannot — the
    incremental-storage dedup shape, complementing winnowing (sampled
    fingerprints) and ``dedup_substrings`` (exact removal).

    Map-only, shuffle-free; per-doc chunk hashes are computed
    VECTORIZED via a weighted-prefix Karp-Rabin (hash of span [s,e) =
    ``(P[e] − P[s]) · B⁻¹^(n−e)`` over the B-power-weighted prefix sums
    — uint64 wraparound arithmetic, B odd so B⁻¹ exists mod 2^64), and
    every hash matches the corpus-wide Horner convention bit-for-bit
    (SQL twin: ``list_reduce`` over ``list_slice``).  Docs with < k
    tokens form one chunk; empty docs emit no rows.  Returns
    ``(id, chunk_idx int32, start_tok int64 1-based, n_tokens,
    chunk_hash uint64)``."""
    mask = np.uint64((1 << mask_bits) - 1)
    zero = np.uint64(0)

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        flat, offs = hash_tokens_flat(batch[text_col])
        o_id, o_ci, o_st, o_nt, o_h = [], [], [], [], []
        np_err = np.seterr(over="ignore")  # wraparound IS the hash ring
        for di, did in enumerate(ids):
            hs = flat[offs[di]:offs[di + 1]]
            n = hs.size
            if n == 0:
                continue
            if n >= k:
                g = gram_hashes(hs, k)
                j = np.flatnonzero((g & mask) == zero)
                ends = (j + k)[(j + k) < n]
            else:
                ends = np.empty(0, np.int64)
            ends = np.append(ends, n).astype(np.int64)
            starts = np.concatenate(([0], ends[:-1])).astype(np.int64)
            pw = np.ones(n, np.uint64)
            if n > 1:
                pw[:-1] = np.cumprod(
                    np.full(n - 1, _CDC_B, np.uint64))[::-1]
            pref = np.zeros(n + 1, np.uint64)
            pref[1:] = np.cumsum(hs * pw)
            ipw = np.ones(n + 1, np.uint64)
            ipw[1:] = np.cumprod(np.full(n, _CDC_BINV, np.uint64))
            h = (pref[ends] - pref[starts]) * ipw[n - ends]
            o_id.append(np.full(ends.size, did, ids.dtype))
            o_ci.append(np.arange(ends.size, dtype=np.int32))
            o_st.append(starts + 1)
            o_nt.append(ends - starts)
            o_h.append(h)
        np.seterr(**np_err)
        cat = (lambda parts, dt: np.concatenate(parts) if parts
               else np.empty(0, dt))
        return pa.table({
            id_col: pa.array(cat(o_id, ids.dtype)),
            "chunk_idx": pa.array(cat(o_ci, np.int32)),
            "start_tok": pa.array(cat(o_st, np.int64).astype(np.int64)),
            "n_tokens": pa.array(cat(o_nt, np.int64).astype(np.int64)),
            "chunk_hash": pa.array(cat(o_h, np.uint64)),
        })

    return ds.map_batches(chunks, batch_format="pyarrow",
                          zero_copy_batch=True)


def benchmark_gram_set(bench_ds, text_col: str = "text", n: int = 13):
    """Distinct n-gram hash set of a benchmark corpus as a sorted uint64
    array.  Benchmark/eval sets are small (MBs even for full eval
    suites), so per-batch distinct hashes are collected to the driver
    and deduped once — the TRAINING corpus never materializes anything.
    Gram hashes are Karp-Rabin over FNV-1a token hashes, the corpus-wide
    convention (bit-reproducible in SQL via the ``th`` CTE twin)."""
    def grams(batch: pa.Table) -> pa.Table:
        flat, offs = hash_tokens_flat(batch[text_col])
        out = []
        np_err = np.seterr(over="ignore")
        for di in range(len(offs) - 1):
            hs = flat[offs[di]:offs[di + 1]]
            if hs.size >= n:
                out.append(gram_hashes(hs, n))
        np.seterr(**np_err)
        u = np.unique(np.concatenate(out)) if out \
            else np.empty(0, np.uint64)
        return pa.table({"g": pa.array(u)})

    parts = bench_ds.map_batches(grams, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.asarray([r["g"] for r in parts], np.uint64))


def overlap_counts(batch: pa.Table, bench_grams: np.ndarray, n: int,
                   text_col: str) -> "tuple[np.ndarray, np.ndarray]":
    """Per-row (n_distinct_grams, n_matched_grams) against a sorted
    bench-gram array — the one shared overlap kernel behind
    :func:`decontaminate` and ``curate._overlap_flags`` (same FNV-1a +
    Karp-Rabin convention, same searchsorted probe)."""
    flat, offs = hash_tokens_flat(batch[text_col])
    nrows = batch.num_rows
    ng = np.zeros(nrows, np.int64)
    nm = np.zeros(nrows, np.int64)
    np_err = np.seterr(over="ignore")
    for di in range(nrows):
        hs = flat[offs[di]:offs[di + 1]]
        if hs.size < n:
            continue
        ug = np.unique(gram_hashes(hs, n))
        ng[di] = ug.size
        if bench_grams.size:
            pos = np.minimum(np.searchsorted(bench_grams, ug),
                             bench_grams.size - 1)
            nm[di] = int((bench_grams[pos] == ug).sum())
    np.seterr(**np_err)
    return ng, nm


def decontaminate(ds, bench_grams: np.ndarray, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id"):
    """GPT-3-style benchmark decontamination (Brown et al. 2020 App. C;
    also The Pile / Llama): flag every training document sharing any
    token ``n``-gram with the benchmark set.  ``bench_grams`` is the
    sorted hash set from :func:`benchmark_gram_set`, shipped ONCE via
    ``ray.put`` and probed per batch with ``np.searchsorted`` — the
    scoring pass is map-only, no shuffle, nothing scales with corpus
    size.  Returns (id, n_grams, n_matched, contaminated) where
    ``n_grams``/``n_matched`` count DISTINCT grams per doc."""
    import ray

    ref = ray.put(np.ascontiguousarray(bench_grams, np.uint64))

    def score(batch: pa.Table) -> pa.Table:
        bg = ray.get(ref)
        ng, nm = overlap_counts(batch, bg, n, text_col)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pa.array(ng),
            "n_matched": pa.array(nm),
            "contaminated": pa.array((nm > 0).astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
