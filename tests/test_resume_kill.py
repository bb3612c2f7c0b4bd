"""Kill-mid-build resume test (SURVEY §5.2 item 4): a build process killed
partway through must resume from its checkpoints and produce artifacts
byte-identical to an uninterrupted build."""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq

_BUILD_SCRIPT = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from rayindex.build import build_index
from rayindex.config import BuildConfig
build_index(sys.argv[1], sys.argv[2],
            BuildConfig(num_shards=4, tokenize_batch_size=32))
ray.shutdown()
"""


def _artifacts(out: str) -> dict[str, bytes]:
    files = {}
    for f in sorted(glob.glob(os.path.join(out, "shards", "*.bin"))):
        files[os.path.basename(f)] = open(f, "rb").read()
    for f in sorted(glob.glob(os.path.join(out, "shards", "*.dict.parquet"))):
        files[os.path.basename(f)] = pq.read_table(f).to_pandas().to_csv().encode()
    return files


def test_kill_mid_build_then_resume(ray_session, tmp_path):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    src = tmp_path / "src"
    src.mkdir()
    tbl = corpus.make_rows(corpus.file_plan(120, 4))
    pq.write_table(tbl, str(src / "docs.parquet"))

    # clean reference build (in-session)
    clean_out = str(tmp_path / "clean")
    build_index(str(src), clean_out, BuildConfig(num_shards=4, tokenize_batch_size=32))
    clean = _artifacts(clean_out)
    assert clean

    # interrupted build: subprocess, SIGKILLed once the first checkpoint
    # marker exists (mid-pipeline — later stages haven't finished)
    kill_out = str(tmp_path / "killed")
    env = dict(os.environ, RAY_ADDRESS="")
    # new session so the SIGKILL can take the whole Ray process tree
    # (raylet/gcs children would otherwise leak and eat CPU)
    proc = subprocess.Popen([sys.executable, "-c", _BUILD_SCRIPT, str(src), kill_out],
                            env=env, cwd="/root/repo", start_new_session=True,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    marker = os.path.join(kill_out, "doc_store.done.json")
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.exists(marker):
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    if proc.poll() is None:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait()
    assert os.path.exists(marker), "build never reached the first checkpoint"
    # the build must NOT have completed
    assert not os.path.exists(os.path.join(kill_out, "finalize.done.json"))

    # resume in-session: completed stages skip, the rest re-run
    res = build_index(str(src), kill_out, BuildConfig(num_shards=4, tokenize_batch_size=32))
    assert res.stages["doc_store"]["skipped"]
    assert os.path.exists(os.path.join(kill_out, "finalize.done.json"))
    assert _artifacts(kill_out) == clean
