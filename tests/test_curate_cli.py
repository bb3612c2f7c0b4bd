"""Kill/resume test for the curate-at-scale CLI (VERDICT r4 item 7):
``python -m rayindex.datapipe.curate`` must survive a SIGKILL at any
point and, re-run with the same command, converge to output identical to
an uninterrupted run — finished partitions skip, the missing tail
rewrites, and ``_MANIFEST.json`` only exists for complete runs."""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _make_corpus(path: str, n: int = 300) -> None:
    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(n):
        if i % 7 == 0 and i > 0:   # exact duplicates -> dedup collapses
            texts.append(texts[i - 1])
        elif i % 11 == 0:          # too short -> gated out
            texts.append("tiny doc")
        else:
            texts.append(" ".join(rng.choice(vocab, size=20 + i % 15)))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), path)


def _run_cli(src: str, out: str, env: dict, extra=()) -> str:
    res = subprocess.run(
        [sys.executable, "-m", "rayindex.datapipe.curate", src, out,
         "--num-partitions", "6", *extra],
        env=env, cwd="/root/repo", capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout.strip().splitlines()[-1]


def _partition_contents(out: str) -> dict:
    files = {}
    for f in sorted(glob.glob(os.path.join(out, "part-*.parquet"))):
        df = pq.read_table(f).to_pandas()
        files[os.path.basename(f)] = df.to_csv(index=False)
    return files


def test_curate_cli_kill_then_resume(tmp_path):
    src = str(tmp_path / "docs.parquet")
    _make_corpus(src)
    env = dict(os.environ, RAY_ADDRESS="", PYTHONPATH="/root/repo")

    # clean reference run
    clean_out = str(tmp_path / "clean")
    line = _run_cli(src, clean_out, env)
    clean_manifest = json.loads(line)
    assert clean_manifest["partitions_written"] == 6
    assert os.path.exists(os.path.join(clean_out, "_MANIFEST.json"))
    clean = _partition_contents(clean_out)
    assert clean and sum(c.count("\n") - 1 for c in clean.values()) \
        == clean_manifest["survivor_rows"]

    # interrupted run: SIGKILL the process group once the output dir
    # exists (mid-pipeline; the sink may be anywhere in its write tail)
    kill_out = str(tmp_path / "killed")
    proc = subprocess.Popen(
        [sys.executable, "-m", "rayindex.datapipe.curate", src, kill_out,
         "--num-partitions", "6"],
        env=env, cwd="/root/repo", start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.isdir(kill_out):
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    if proc.poll() is None:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait()

    # resume with the SAME command: skips whatever finished, completes
    resumed = json.loads(_run_cli(src, kill_out, env))
    assert os.path.exists(os.path.join(kill_out, "_MANIFEST.json"))
    assert resumed["survivor_rows"] == clean_manifest["survivor_rows"]
    assert _partition_contents(kill_out) == clean

    # targeted resume: lose one partition's manifest -> exactly that
    # partition rewrites, everything else untouched, output identical
    victims = sorted(glob.glob(os.path.join(kill_out, "part-*.done.json")))
    os.unlink(victims[0])
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(kill_out, "part-*.parquet"))}
    third = json.loads(_run_cli(src, kill_out, env))
    assert third["partitions_written"] == 1
    assert third["partitions_skipped"] == 5
    victim_parquet = victims[0].replace(".done.json", ".parquet")
    for f, m in mtimes.items():
        if f == victim_parquet:
            assert os.path.getmtime(f) > m
        else:
            assert os.path.getmtime(f) == m
    assert _partition_contents(kill_out) == clean
