"""Summarize a scaling-campaign JSONL (BENCH/scaling_runs_r3.jsonl) into
per-shape statistics with the honesty filter applied.

A strong-scaling sample is *clean* iff cpu_work_ratio (cpu-seconds big
leg / small leg) is within [0.90, 1.15]: both legs did the same work and
neither ate a co-tenant storm.  Outside that band the efficiency number
measures WHICH leg was robbed, not how the pipeline scales.  For weak
mode (4x corpus on the big leg) the ideal ratio is 4.0; clean band
[3.6, 4.6].

Usage: python tools/scaling_summary.py [path.jsonl] [--markdown] [--rev PREFIX...]

--markdown prints the clean-pair rows as the BASELINE.md table body
(one row per clean sample, best first).  --rev restricts to samples
whose recorded git revision is one of the given prefixes (samples
predating the rev field never match an explicit --rev filter).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def clean_band(mode: str) -> tuple[float, float]:
    return (3.6, 4.6) if mode == "weak" else (0.90, 1.15)


def load_groups(path: str, revs: list[str] | None = None) -> dict:
    groups: dict[tuple, list[dict]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("error") or "mode" not in r:
                continue  # failed pair (bench crashed): no legs to census
            if revs is not None and not any(
                    str(r.get("rev", "")).startswith(p) for p in revs):
                continue
            groups[(r["mode"], tuple(r["levels"]), tuple(r["n_files"]))].append(r)
    return groups


def markdown(path: str, revs: list[str] | None = None) -> str:
    rows_out = ["| mode | levels | corpus | eff. | cpu work ratio | "
                "effective-core scaling | files/s big leg | rev |",
                "|---|---|---|---|---|---|---|---|"]
    for key, rows in sorted(load_groups(path, revs).items()):
        mode, levels, n_files = key
        lo_b, hi_b = clean_band(mode)
        clean = [r for r in rows
                 if r.get("cpu_work_ratio") and lo_b <= r["cpu_work_ratio"] <= hi_b]
        for r in sorted(clean, key=lambda r: -r["scaling_efficiency"]):
            fps = r.get(f"files_per_sec_{levels[1]}cpu")
            rows_out.append(
                f"| {mode} | {levels[0]} → {levels[1]} | "
                f"{n_files[0]//1000}k/{n_files[1]//1000}k | "
                f"**{r['scaling_efficiency']:.3f}** | {r['cpu_work_ratio']:.3f} | "
                f"{r.get('effective_core_scaling', '')} | "
                f"{fps:,.0f} | {r.get('rev') or '—'} |")
    return "\n".join(rows_out)


def summarize(path: str, revs: list[str] | None = None) -> dict:
    groups = load_groups(path, revs)
    out = {}
    for key, rows in sorted(groups.items()):
        mode, levels, n_files = key
        lo_b, hi_b = clean_band(mode)
        clean = [r for r in rows
                 if r.get("cpu_work_ratio") and lo_b <= r["cpu_work_ratio"] <= hi_b]
        effs = sorted(r["scaling_efficiency"] for r in clean)
        out[f"{mode} {levels[0]}->{levels[1]} files={n_files[0]}/{n_files[1]}"] = {
            "samples": len(rows),
            "clean": len(clean),
            "clean_eff": effs,
            "best_clean_eff": effs[-1] if effs else None,
            "median_clean_eff": effs[len(effs) // 2] if effs else None,
            "best_any_eff": max(r["scaling_efficiency"] for r in rows),
        }
    return out


def census_markdown(path: str, revs: list[str] | None = None) -> str:
    """Median-first per-shape census table (the BASELINE.md headline
    shape: the clean-pair MEDIAN is the statistic, the best is context)."""
    out = ["| shape | corpus | samples | clean | clean median | clean best |",
           "|---|---|---|---|---|---|"]
    for key, stats in summarize(path, revs).items():
        mode, lv, files = key.split(" ")
        n0, n1 = files.split("=")[1].split("/")
        med = stats["median_clean_eff"]
        best = stats["best_clean_eff"]
        out.append(
            f"| {mode} {lv.replace('->', ' → ')} | "
            f"{int(n0)//1000}k/{int(n1)//1000}k | {stats['samples']} | "
            f"{stats['clean']} | "
            f"{'**%.3f**' % med if med is not None else '—'} | "
            f"{'%.3f' % best if best is not None else '—'} |")
    return "\n".join(out)


def write_census(path: str, target: str, marker: str,
                 revs: list[str] | None = None) -> None:
    """Replace everything after ``marker`` in ``target`` with the
    regenerated census table (idempotent: re-running overwrites the
    previous generated block)."""
    src = open(target).read()
    i = src.index(marker) + len(marker)
    body = ("\n\n" + census_markdown(path, revs) +
            "\n\nEvery clean pair individually "
            "(`tools/scaling_summary.py --markdown`):\n\n" +
            markdown(path, revs) + "\n")
    with open(target, "w") as f:
        f.write(src[:i] + body)


if __name__ == "__main__":
    args = sys.argv[1:]
    revs = None
    if "--rev" in args:
        i = args.index("--rev")
        revs = [a for a in args[i + 1:] if not a.startswith("--")]
        args = args[:i] + [a for a in args[i + 1:] if a.startswith("--")]
    md = "--markdown" in args
    write = "--write" in args
    args = [a for a in args if a not in ("--markdown", "--write")]
    path = args[0] if args else "BENCH/scaling_runs_r3.jsonl"
    if write:
        write_census(path, "BENCH/BASELINE.md", "<!-- ROUND4_CENSUS -->",
                     revs)
        print("census written to BENCH/BASELINE.md")
    elif md:
        print(markdown(path, revs))
    else:
        print(json.dumps(summarize(path, revs), indent=2))
