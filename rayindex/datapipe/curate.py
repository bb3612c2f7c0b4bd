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


def curate_corpus(input_path: str, out_dir: str, bench_path: str | None,
                  *, min_tokens: int = 5, max_dup_line_frac: float = 0.30,
                  max_top2_frac: float = 0.25, decontam_n: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_partitions: int = 16,
                  overwrite: bool = False) -> dict:
    """The operable end-to-end curation job behind ``python -m
    rayindex.datapipe.curate``: read a documents parquet, run the full
    :func:`curate` chain, attach the surviving TEXT back by a
    distributed hash join on the id (survivor metadata is (id, hash)
    rows — the corpus text moves exactly once, into the join), and land
    it in :func:`rayindex.io.write_partitioned`'s resumable
    key-partitioned sink.  A killed run resumes by re-running the same
    command: finished partitions (atomic data-then-manifest writes)
    are skipped, only the missing tail rewrites, and partition files
    are id-sorted so a resumed run is byte-comparable to a clean one.
    Writes ``_MANIFEST.json`` (gates + totals) last — its presence
    marks a complete run.  Returns the manifest dict."""
    import json
    import os

    import ray.data

    from rayindex.datapipe.keywords import _join_partitions
    from rayindex.datapipe.spans import benchmark_gram_set
    from rayindex.io import write_partitioned

    ds = ray.data.read_parquet(input_path, columns=[id_col, text_col])
    if bench_path:
        grams = benchmark_gram_set(
            ray.data.read_parquet(bench_path, columns=[text_col]),
            text_col=text_col, n=decontam_n)
    else:
        grams = np.empty(0, np.uint64)
    survivors = curate(ds, grams, min_tokens=min_tokens,
                       max_dup_line_frac=max_dup_line_frac,
                       max_top2_frac=max_top2_frac,
                       decontam_n=decontam_n, text_col=text_col,
                       id_col=id_col)
    joined = survivors.join(ds, join_type="inner",
                            num_partitions=_join_partitions(None),
                            on=(id_col,))
    res = write_partitioned(joined, out_dir, by=id_col,
                            num_partitions=num_partitions,
                            overwrite=overwrite, sort_cols=(id_col,))
    manifest = {
        "input": input_path,
        "bench": bench_path,
        "gates": {"min_tokens": min_tokens,
                  "max_dup_line_frac": max_dup_line_frac,
                  "max_top2_frac": max_top2_frac,
                  "decontam_n": decontam_n},
        "num_partitions": num_partitions,
        "survivor_rows": res["rows"],
        "partitions_written": res["written"],
        "partitions_skipped": res["skipped"],
    }
    tmp = os.path.join(out_dir, "_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_MANIFEST.json"))
    return manifest


def main(argv=None) -> int:
    """``python -m rayindex.datapipe.curate IN OUT [--bench B] [...]``"""
    import argparse
    import json

    import ray

    p = argparse.ArgumentParser(
        prog="rayindex.datapipe.curate",
        description="Resumable end-to-end training-data curation: "
                    "quality/repetition gates, benchmark "
                    "decontamination, exact dedup, partitioned sink.")
    p.add_argument("input", help="documents parquet (doc_id, text)")
    p.add_argument("out_dir", help="output directory (partitioned sink)")
    p.add_argument("--bench", default=None,
                   help="benchmark parquet for decontamination")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-dup-line-frac", type=float, default=0.30)
    p.add_argument("--max-top2-frac", type=float, default=0.25)
    p.add_argument("--decontam-n", type=int, default=5)
    p.add_argument("--num-partitions", type=int, default=16)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--overwrite", action="store_true")
    a = p.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    manifest = curate_corpus(
        a.input, a.out_dir, a.bench, min_tokens=a.min_tokens,
        max_dup_line_frac=a.max_dup_line_frac,
        max_top2_frac=a.max_top2_frac, decontam_n=a.decontam_n,
        id_col=a.id_col, text_col=a.text_col,
        num_partitions=a.num_partitions, overwrite=a.overwrite)
    print(json.dumps(manifest, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":  # pragma: no cover — subprocess entry
    import sys

    # Dispatch through the canonically-named module, NOT this __main__
    # alias: Ray workers unpickle the curate() closures by module
    # reference, and functions owned by __main__ lose their globals
    # (NameError: _overlap_flags) on the worker side.
    from rayindex.datapipe import curate as _mod

    sys.exit(_mod.main(sys.argv[1:]))


def _overlap_flags(batch: pa.Table, bench_grams: np.ndarray, n: int,
                   text_col: str) -> np.ndarray:
    """Boolean per-row flags: doc shares ≥1 token n-gram with the bench
    set — thin wrapper over the shared :func:`spans.overlap_counts`
    kernel so the two call sites can't drift."""
    from .spans import overlap_counts

    _, nm = overlap_counts(batch, bench_grams, n, text_col)
    return nm > 0
