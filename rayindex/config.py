"""Configuration dataclasses for the build and query pipelines.

The reference engine has no config surface beyond hardcoded constants
(BM25 k=1.5 at /root/reference/search/retrieval/retrieval_models/bm25_model/bm25_model.py:23,
LM mu=1303 g=0.2 at /root/reference/search/retrieval/retrieval_execution/retrieval_execution.py:168,
segment flush every 60k docs at /root/reference/indexing/index_builder/index_build.py:189).
Here every knob is explicit.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class AnalyzerConfig:
    """Tokenization pipeline config.

    mode:
      - ``reference``: regex ``[¢£€\\w]+`` findall, casefold, English stopword
        removal, Porter stem — the reference's document pipeline
        (/root/reference/indexing/index_builder/helpers.py:49-58).
      - ``ascii``: ``[a-z0-9_]+`` over lowercased text, no stopwords, no
        stemming — exactly expressible in DuckDB SQL (regexp_extract_all),
        used for the driver's SQL-oracle parity gate.
      - ``code``: like ``ascii`` but also splits snake_case/camelCase
        identifiers into sub-tokens (keeps the original too).
    """

    mode: str = "reference"
    min_token_len: int = 1
    max_token_len: int = 64
    # "glasgow": the 570-word Glasgow IR list the reference actually loads
    # (englishST.txt); "snowball": the Snowball project list
    stopwords: str = "glasgow"
    # "nltk": Porter + the NLTK_EXTENSIONS departures — what the reference's
    # nltk PorterStemmer actually runs (helpers.py:46); "original": the
    # unmodified 1980 cascade
    stemmer: str = "nltk"

    def fingerprint(self) -> str:
        return hashlib.sha256(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:16]


@dataclass(frozen=True)
class BuildConfig:
    """Index build pipeline config.

    doc_range_size: postings are sharded by contiguous doc_id range
    (``range_id = doc_id // doc_range_size``) *before* the groupby-term
    shuffle.  This is the skew strategy: a hot term ("def", "return")
    never lands on a single reducer — each (term, range) group encodes
    independently and the full posting list is the concatenation of its
    ranges in range order (ascending doc_id is preserved by construction).
    Replaces the reference's single giant in-memory dict + manual 60k-doc
    segment flush (/root/reference/indexing/index_builder/index_build.py:188-197).
    """

    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    num_shards: int = 16  # 0 = auto (~100k docs/shard, resolved at build)
    doc_range_size: int = 1 << 17  # 131072 docs per posting range
    block_size: int = 128          # target postings per coalesced block
    fine_block_docs: int = 128     # doc-range granularity of fine blocks:
    # block metadata is aggregated per (term, doc_id // fine_block_docs) —
    # a pure metadata merge at every stage (no posting decode); smaller =
    # tighter WAND bounds for dense terms, more metadata rows shuffled
    keep_positions: bool = True    # positional index (phrase/proximity support)
    tokenize_batch_size: int = 256
    max_content_bytes: int = 8 << 20  # drop pathological rows (ref: title/url>=1000 filter)
    verify_sha256: bool = True     # ingest invariant: per-row sha256(content) vs source
    # cap on concurrent shard-merge tasks — a memory-bandwidth annotation,
    # not a parallelism setting: shard splicing is DRAM-bound, and past ~8
    # concurrent splicers per node the same merge work burns ~2x the CPU
    # time (memory-stall cycles) for equal wall (measured on the 32-core
    # bench host: utime 9.2 s at 8 vs 21.8 s at 32 concurrent, wall flat).
    # Each merge task reserves num_cpus = max(1, cluster_cpus /
    # max_concurrent_merges); on a multi-node cluster set this to 8 × nodes
    # (the bound is per-node DRAM, which Ray's logical CPUs can't express).
    max_concurrent_merges: int = 8
    # memory-size estimator (reference A9: the 60k-doc segment flush,
    # index_build.py:188-197, is a heap-size proxy): a tokenize task
    # spools its pending chunk tables when EITHER the row count or the
    # measured Arrow byte size crosses its cap — rows alone misjudge
    # heap when documents (and so position lists) are large.  Flush
    # cadence never changes final index bytes (the merge is
    # batching-invariant by the determinism gate).
    spool_flush_rows: int = 1 << 20
    spool_flush_bytes: int = 256 << 20
    # spool consolidation: with G > 0, groups of G completed spool files
    # are repackaged into ONE shard-ordered spool by parallel tasks
    # (record batches copied verbatim — the merge is batching-invariant,
    # so the index bytes are unchanged) BEFORE being fed to the merger
    # actors.  Bounds merge-stage file opens at O(actors × spools / G):
    # at 10^9 docs the spool count is O(ingest tasks), and without
    # consolidation every merger opens every spool.  0 = off (right for
    # single-node corpora where spool count ≈ task count ≈ CPUs × 4).
    spool_consolidate_group: int = 0
    spool_consolidate_bytes: int = 512 << 20  # per-group source-byte cap

    def fingerprint(self) -> str:
        d = asdict(self)
        # execution-only knobs (scheduling hints) don't change artifacts
        d.pop("max_concurrent_merges", None)
        d.pop("spool_flush_rows", None)
        d.pop("spool_flush_bytes", None)
        d.pop("spool_consolidate_group", None)
        d.pop("spool_consolidate_bytes", None)
        return hashlib.sha256(json.dumps(d, sort_keys=True).encode()).hexdigest()[:16]


@dataclass(frozen=True)
class SearchConfig:
    """Query-side config.

    scorer:
      - ``bm25``: standard BM25 (k1=1.2, b=0.75) — the engine default per
        BASELINE.json.
      - ``reference``: the reference's nonstandard BM25 variant
        ``idf=ln(1+(N-df+0.5)/(df+0.5)); w=idf*tf/(k*d+tf+0.5)`` with k=1.5
        and the intersection→union candidate fallback
        (/root/reference/.../bm25_model.py:19-55,190-269) for rank-identity.
    """

    scorer: str = "bm25"
    k1: float = 1.2
    b: float = 0.75
    ref_k: float = 1.5
    top_k: int = 100           # reference result cap (helpers.py:135)
    boolean_cap: int = 500     # boolean result cap (boolean_retrieval.py:36)
    candidate_relax: int = 100  # <100 docs → intersection falls back toward union
    # "taat" (vectorized term-at-a-time) | "bmw" (block-max WAND) |
    # "auto" (per-query routing from dict metadata: block-bound dispersion
    # × doc-axis coverage — scoring.auto_prefers_bmw)
    algorithm: str = "taat"
    lm_mu: float = 1303.0
    lm_g: float = 0.2
