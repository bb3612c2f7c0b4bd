"""End-to-end training-data curation: the canonical filter chain
(quality gate → repetition gate → benchmark decontamination → exact
dedup) composed the way it should run at 100 TB.

Shape: every per-doc signal (token count, Gopher repetition, eval-set
n-gram overlap) is computed in ONE shared ``map_batches`` pass — the
component operators are all map-only, so chaining them costs zero joins
and zero extra scans of the corpus — followed by the single shuffle the
pipeline fundamentally needs: the exact-dedup ``groupby`` over content
hashes, which ships (hash, id, n_tokens) triples only.  Text never
leaves the scoring task.

The gates follow the published recipes (Rae et al. 2021 §A1.1 for the
repetition thresholds; Brown et al. 2020 App. C for decontamination;
Lee et al. 2022 for dedup-after-filter ordering).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from .spans import benchmark_gram_set  # noqa: F401  (re-export for callers)
from .text import repetition_batch, token_count_batch


def curate(ds, bench_grams: np.ndarray, *, min_tokens: int = 5,
           max_dup_line_frac: float = 0.30, max_top2_frac: float = 0.25,
           decontam_n: int = 5, text_col: str = "text",
           id_col: str = "doc_id"):
    """Surviving documents after the full curation chain, as a Dataset of
    ``(id, n_tokens, n_dups)`` — one row per distinct surviving text,
    keeping the lowest id; ``n_dups`` counts how many surviving
    duplicates collapsed into it.  Gates (all inclusive "keep" sides):
    ``n_tokens >= min_tokens``, ``dup_line_frac <= max_dup_line_frac``,
    ``top_2gram_char_frac <= max_top2_frac``, and zero shared
    ``decontam_n``-grams with ``bench_grams`` (from
    :func:`benchmark_gram_set`)."""
    from ray.data.aggregate import Count, Min

    ref = ray.put(np.ascontiguousarray(bench_grams, np.uint64))

    def score_and_gate(batch: pa.Table) -> pa.Table:
        tc = token_count_batch(batch, text_col, id_col)
        rep = repetition_batch(batch, text_col, id_col)
        n_tok = tc["n_tokens"].to_numpy()
        keep = ((n_tok >= min_tokens)
                & (rep["dup_line_frac"].to_numpy() <= max_dup_line_frac)
                & (rep["top_2gram_char_frac"].to_numpy()
                   <= max_top2_frac))
        # decontamination on the survivors only (the expensive signal)
        sub = batch.filter(pa.array(keep))
        if sub.num_rows:
            bg = ray.get(ref)
            dec = _overlap_flags(sub, bg, decontam_n, text_col)
            sub = sub.filter(pa.array(~dec))
            n_tok = n_tok[keep][~dec]
        else:
            n_tok = n_tok[:0]
        hs = [hashlib.sha256((x or "").encode()).hexdigest()
              for x in sub[text_col].to_pylist()]
        return pa.table({
            id_col: sub[id_col],
            "h": pa.array(hs, pa.string()),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
        })

    return (ds.map_batches(score_and_gate, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("h")
            .aggregate(Min(id_col, alias_name=id_col),
                       Min("n_tokens", alias_name="n_tokens"),
                       Count(alias_name="n_dups"))
            .select_columns([id_col, "n_tokens", "n_dups"]))


def _overlap_flags(batch: pa.Table, bench_grams: np.ndarray, n: int,
                   text_col: str) -> np.ndarray:
    """Boolean per-row flags: doc shares ≥1 token n-gram with the bench
    set (same hashing convention as spans.decontaminate)."""
    from .text import gram_hashes, hash_tokens_flat

    flat, offs = hash_tokens_flat(batch[text_col])
    out = np.zeros(batch.num_rows, bool)
    np_err = np.seterr(over="ignore")
    for di in range(batch.num_rows):
        hs = flat[offs[di]:offs[di + 1]]
        if hs.size < n or not bench_grams.size:
            continue
        ug = np.unique(gram_hashes(hs, n))
        pos = np.minimum(np.searchsorted(bench_grams, ug),
                         bench_grams.size - 1)
        out[di] = bool((bench_grams[pos] == ug).any())
    np.seterr(**np_err)
    return out
