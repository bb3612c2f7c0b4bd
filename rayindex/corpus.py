"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Produces the Parquet input shape mandated by BASELINE.json:
``(repo, path, commit, lang, content)``.  Every file's content is a pure
function of ``(seed, repo, path)`` via a stable sha256-derived RNG stream, so
the corpus is byte-identical regardless of generation order or parallelism —
the property the determinism tests (build at num_cpus 1 vs 4 vs 8) rely on.

The content mixes:
- a ~5k-term Zipf identifier vocabulary plus hot code keywords
  (``def/return/import/self/class/...``) to exercise term skew,
- English stopwords and mixed-case prose in comments/docstrings (exercising
  the reference analysis chain: casefold -> stopword -> Porter stem,
  /root/reference/indexing/index_builder/helpers.py:49-58),
- repeated multi-word phrases (phrase/proximity retrieval tests),
- digits and the ``¢£€`` characters the reference tokenizer classes
  (/root/reference/indexing/index_builder/helpers.py:29).

The 5-row hello-world micro fixture mirrors the reference's smoke corpus
(/root/reference/indexing/data/article_data/5_article_test.tsv).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from rayindex import schema

SEED = 7

_LANGS = ["py", "js", "go", "java", "rs", "md"]
_EXT = {"py": "py", "js": "js", "go": "go", "java": "java", "rs": "rs", "md": "md"}

HOT_KEYWORDS = [
    "def", "return", "import", "self", "class", "if", "else", "for", "while",
    "none", "true", "false", "function", "var", "let", "const", "public",
    "static", "void", "fn", "struct", "impl",
]

PHRASES = [
    "open the file handle",
    "acquire global lock",
    "release global lock",
    "parse query string",
    "flush write buffer",
    "retry failed request",
]

_PROSE = (
    "This Module implements the main processing Loop and it should be "
    "called before any worker has been started because the Runner depends "
    "on those settings being available during initialization"
).split()

_CURRENCY = ["£100", "€5", "¢99", "£7", "€42"]


def _vocab(n_terms: int = 5000) -> list[str]:
    syl = ["al", "be", "cor", "dex", "el", "fur", "gam", "hex", "ilo", "jun",
           "kap", "lor", "mer", "nov", "oct", "pix", "quo", "rix", "sol", "tor",
           "ulf", "vex", "wix", "xen", "yod", "zet"]
    out = []
    i = 0
    while len(out) < n_terms:
        a = syl[i % 26]
        b = syl[(i // 26) % 26]
        c = syl[(i // 676) % 26]
        out.append(f"{a}{b}{c}{i % 10}")
        i += 1
    return out


_VOCAB = _vocab()


def _file_rng(seed: int, repo: str, path: str) -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{repo}:{path}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def _gen_content(rng: np.random.Generator, lang: str) -> str:
    n_lines = int(rng.integers(10, 401))
    # Zipf ranks into the identifier vocab; a=1.3 gives a heavy head
    zipf_idx = np.minimum(rng.zipf(1.3, size=n_lines * 6) - 1, len(_VOCAB) - 1)
    ids = [_VOCAB[i] for i in zipf_idx]
    lines = []
    p = 0
    for li in range(n_lines):
        roll = rng.random()
        a, b, c = ids[p], ids[p + 1], ids[p + 2]
        p += 3
        if roll < 0.25:
            kw = HOT_KEYWORDS[int(rng.integers(0, len(HOT_KEYWORDS)))]
            lines.append(f"{kw} {a}({b}, {c}):")
        elif roll < 0.45:
            lines.append(f"    {a} = {b}.{c}({int(rng.integers(0, 1000))})")
        elif roll < 0.60:
            kw2 = HOT_KEYWORDS[int(rng.integers(0, len(HOT_KEYWORDS)))]
            lines.append(f"    {kw2} {a} + {int(rng.integers(0, 100))}")
        elif roll < 0.72:
            words = [
                _PROSE[int(j)] for j in rng.integers(0, len(_PROSE), size=int(rng.integers(4, 10)))
            ]
            lines.append("# " + " ".join(words))
        elif roll < 0.82:
            ph = PHRASES[int(rng.integers(0, len(PHRASES)))]
            lines.append(f"    # {ph} then {a}")
        elif roll < 0.90:
            camel = a.capitalize() + b.capitalize()
            lines.append(f"class {camel}_{c}:")
        else:
            cur = _CURRENCY[int(rng.integers(0, len(_CURRENCY)))]
            lines.append(f"    # price {cur} for {a}")
    return "\n".join(lines)


def file_plan(n_files: int, n_repos: int, seed: int = SEED) -> list[tuple[str, str, str]]:
    """Deterministic (repo, path, lang) list; Zipf-ish file counts per repo."""
    weights = 1.0 / np.arange(1, n_repos + 1) ** 0.7
    counts = np.maximum(1, np.round(weights / weights.sum() * n_files)).astype(np.int64)
    # fix rounding so the total is exact
    diff = n_files - int(counts.sum())
    counts[0] += diff
    plan = []
    for r in range(n_repos):
        repo = f"org{r % 7}/proj{r}"
        for f in range(int(counts[r])):
            h = int.from_bytes(
                hashlib.sha256(f"{seed}:lang:{repo}:{f}".encode()).digest()[:4], "big"
            )
            lang = _LANGS[h % len(_LANGS)]
            path = f"src/pkg{f % 13}/mod_{f}.{_EXT[lang]}"
            plan.append((repo, path, lang))
    # Emit in (repo, path) string order — the layout of a real repo-grouped
    # crawl dump.  A sorted source lets ingest take the shuffle-free direct
    # write path (build._write_units_direct); unsorted sources still work
    # through the range-partition exchange.
    plan.sort(key=lambda t: (t[0], t[1]))
    return plan


def make_rows(plan: list[tuple[str, str, str]], seed: int = SEED) -> pa.Table:
    """Generate corpus rows for a slice of the file plan (order-independent)."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    for repo, path, lang in plan:
        rng = _file_rng(seed, repo, path)
        repos.append(repo)
        paths.append(path)
        commits.append(hashlib.sha1(f"{repo}:{path}".encode()).hexdigest())
        langs.append(lang)
        contents.append(_gen_content(rng, lang))
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        },
        schema=schema.DOCUMENTS,
    )


def tiny_corpus(seed: int = SEED) -> pa.Table:
    """24 files, 3 repos — unit/oracle rank-identity fixtures (one block)."""
    return make_rows(file_plan(24, 3, seed), seed)


def small_corpus(seed: int = SEED) -> pa.Table:
    """2,000 files, 20 repos — e2e / resume / parallelism-determinism tests."""
    return make_rows(file_plan(2000, 20, seed), seed)


def hello_corpus() -> pa.Table:
    """5-row micro fixture mirroring the reference smoke TSV
    (/root/reference/indexing/data/article_data/5_article_test.tsv)."""
    rows = [
        ("org0/hello", "a.md", "md", "Hello world"),
        ("org0/hello", "b.md", "md", "Hello germany"),
        ("org0/hello", "c.md", "md", "Hello france the world says hello"),
        ("org0/hello", "d.md", "md", "Goodbye cruel world"),
        ("org0/hello", "e.md", "md", "hello Hello HELLO"),
    ]
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([hashlib.sha1(f"{r[0]}:{r[1]}".encode()).hexdigest() for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "content": pa.array([r[3] for r in rows], pa.large_string()),
        },
        schema=schema.DOCUMENTS,
    )


def write_corpus_parquet(out_path: str, n_files: int, n_repos: int, seed: int = SEED) -> None:
    """Driver-side writer for test fixtures (small corpora only)."""
    import pyarrow.parquet as pq

    pq.write_table(make_rows(file_plan(n_files, n_repos, seed), seed), out_path)


def corpus_dataset(n_files: int, n_repos: int, seed: int = SEED, parallelism: int = -1):
    """Distributed generation as a Ray Data pipeline (bench-scale corpora).

    The file plan is tiny (3 strings per file); content generation — the
    expensive part — runs inside map_batches tasks, each file derived only
    from its (seed, repo, path) key, so any partitioning yields the same
    corpus.
    """
    import ray.data

    plan = file_plan(n_files, n_repos, seed)
    items = [{"repo": r, "path": p, "lang": l} for r, p, l in plan]
    ds = ray.data.from_items(items, override_num_blocks=parallelism if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        rows = list(
            zip(
                batch["repo"].to_pylist(),
                batch["path"].to_pylist(),
                batch["lang"].to_pylist(),
            )
        )
        return make_rows(rows, seed)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=256)


def fixed_queries() -> pa.Table:
    """The fixed query set (FIXTURES.md §2): ~60 deterministic queries over
    the synthetic vocabulary — term / phrase / boolean / proximity kinds,
    including hot, mid, rare and OOV terms and tie-inducing single-term
    queries."""
    q: list[tuple[str, str, int]] = []
    hot = ["def", "return", "import", "class"]
    mid = [_VOCAB[i] for i in (0, 1, 2, 5, 9, 20, 40)]
    rare = [_VOCAB[i] for i in (900, 1500, 2500, 4000)]
    oov = ["zzzznotaterm", "qqqqmissing"]
    # 30 term queries
    for t in hot:
        q.append((t, "term", 10))
    for t in mid:
        q.append((t, "term", 10))
    for t in rare:
        q.append((t, "term", 10))
    for t in oov:
        q.append((t, "term", 10))
    q.append(("def return", "term", 10))
    q.append(("import " + mid[0], "term", 10))
    q.append((mid[1] + " " + mid[2] + " " + rare[0], "term", 10))
    q.append((hot[0] + " " + oov[0], "term", 10))
    q.append(("processing loop worker", "term", 100))
    q.append(("main module runner", "term", 100))
    q.append(("price £100", "term", 10))
    q.append(("settings available initialization", "term", 10))
    q.append((mid[3] + " " + mid[4], "term", 10))
    q.append((" ".join(mid[:4]), "term", 10))
    q.append(("started before called", "term", 10))
    # 10 phrase queries
    for ph in PHRASES:
        q.append((f'"{ph}"', "phrase", 10))
    q.append(('"global lock"', "phrase", 10))
    q.append(('"the file handle"', "phrase", 10))
    q.append(('"processing loop"', "phrase", 10))
    q.append(('"no such phrase here"', "phrase", 10))
    # 15 boolean queries
    b = [
        f"{hot[0]} AND {mid[0]}",
        f"{mid[0]} OR {mid[1]}",
        f"NOT {hot[0]}",
        f"{hot[1]} AND NOT {mid[2]}",
        f"({mid[0]} OR {mid[1]}) AND {hot[0]}",
        f"{mid[3]} AND ({mid[4]} OR {rare[0]})",
        f'"{PHRASES[0]}" AND {hot[0]}',
        f"{oov[0]} AND {hot[0]}",
        f"{oov[0]} OR {mid[0]}",
        f"{hot[0]} AND {hot[1]}",
        f"{hot[0]} OR {hot[1]}",
        f"NOT {oov[0]}",
        f"{mid[5]} AND {mid[6]} AND {hot[2]}",
        f"({rare[1]} OR {rare[2]}) AND NOT {mid[0]}",
        f'"{PHRASES[1]}" OR "{PHRASES[2]}"',
        # in-vocab phrase operand + only-OOV single operand: the boolean doc
        # set must survive with 0.0 scores (oracle.py:204,217), not vanish
        f'"{PHRASES[0]}" OR {oov[0]}',
        f'"{PHRASES[0]}" AND NOT {oov[1]}',
    ]
    for s in b:
        q.append((s, "boolean", 100))
    # 5 proximity queries
    for s in [
        "#3(open,file)",
        "#1(global,lock)",
        f"#5({mid[0]},{mid[1]})",
        "#2(parse,query)",
        f"#4({hot[0]},{oov[0]})",
    ]:
        q.append((s, "proximity", 100))
    return pa.table(
        {
            "query_id": pa.array(range(len(q)), pa.int64()),
            "query": pa.array([x[0] for x in q], pa.string()),
            "kind": pa.array([x[1] for x in q], pa.string()),
            "k": pa.array([x[2] for x in q], pa.int32()),
        },
        schema=schema.QUERIES,
    )
