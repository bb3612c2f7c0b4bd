"""Per-stage / per-shard checkpointing with lineage and build metrics.

The reference's only "checkpoints" are its 60k-doc segment spill files
(/root/reference/indexing/index_builder/index_build.py:188-197) — the builder
cannot resume mid-file and the post-processing steps (merge/hash/convert) are
separately-run manual scripts.  Here every build stage writes its output
under ``out_dir/<stage>/`` and records a ``<stage>.done.json`` marker that
carries the stage *fingerprint* (hash of config + input lineage) and metrics;
a resumed build skips any stage whose marker matches and rebuilds any stage
whose fingerprint changed.  The final shard-write stage additionally skips
individual completed shards (per-partition resume): each shard directory has
its own manifest keyed by the same fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any


def fingerprint_of(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


@dataclass
class StageResult:
    name: str
    skipped: bool
    wall_s: float
    metrics: dict[str, Any] = field(default_factory=dict)


class BuildCheckpoint:
    """Tracks stage completion under one output directory."""

    def __init__(self, out_dir: str, fingerprint: str):
        self.out_dir = out_dir
        self.fingerprint = fingerprint
        os.makedirs(out_dir, exist_ok=True)

    # -- stage markers ------------------------------------------------------

    def _marker(self, stage: str) -> str:
        return os.path.join(self.out_dir, f"{stage}.done.json")

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def is_done(self, stage: str) -> bool:
        try:
            with open(self._marker(stage)) as f:
                return json.load(f).get("fingerprint") == self.fingerprint
        except (OSError, json.JSONDecodeError):
            return False

    def stage_metrics(self, stage: str) -> dict[str, Any]:
        try:
            with open(self._marker(stage)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def begin(self, stage: str, clear: bool = True) -> str:
        """Prepare a stage directory for (re)execution.  ``clear=True``
        wipes a stale half-written dir (stages whose writers aren't
        per-file idempotent); ``clear=False`` keeps existing files so
        per-partition manifests inside the stage can skip completed work
        (the shard-write stage)."""
        d = self.stage_dir(stage)
        if clear and not self.is_done(stage) and os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        return d

    def mark_done(self, stage: str, metrics: dict[str, Any] | None = None) -> None:
        payload = {
            "stage": stage,
            "fingerprint": self.fingerprint,
            "completed_at": time.time(),
            "metrics": metrics or {},
        }
        tmp = self._marker(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, self._marker(stage))

    def run_stage(self, stage: str, fn, clear: bool = True) -> StageResult:
        """Run ``fn(stage_dir) -> metrics_dict`` unless already complete.

        With ``RAYINDEX_STAGE_CPU=1``, per-stage aggregate Ray-process
        (utime, stime) deltas are recorded — the diagnostic for telling
        co-tenant degradation (wall stretches, cpu flat) from real extra
        work or page-fault tax (stime grows) on this shared host."""
        if self.is_done(stage):
            return StageResult(stage, skipped=True, wall_s=0.0,
                               metrics=self.stage_metrics(stage).get("metrics", {}))
        d = self.begin(stage, clear=clear)
        track_cpu = os.environ.get("RAYINDEX_STAGE_CPU") == "1"
        mon = CpuMonitor().__enter__() if track_cpu else None
        t0 = time.perf_counter()
        metrics = fn(d) or {}
        wall = time.perf_counter() - t0
        metrics["wall_s"] = round(wall, 3)
        if mon is not None:
            mon.__exit__()
            u, s = mon.totals()
            metrics["utime_s"] = round(u, 2)
            metrics["stime_s"] = round(s, 2)
        self.mark_done(stage, metrics)
        return StageResult(stage, skipped=False, wall_s=wall, metrics=metrics)

    # -- per-shard manifests (per-partition resume inside the write stage) --

    @staticmethod
    def shard_manifest_path(shard_dir: str, shard_id: int) -> str:
        return os.path.join(shard_dir, f"shard_{shard_id:05d}.manifest.json")

    @staticmethod
    def shard_is_done(shard_dir: str, shard_id: int, fingerprint: str) -> bool:
        try:
            with open(BuildCheckpoint.shard_manifest_path(shard_dir, shard_id)) as f:
                return json.load(f).get("fingerprint") == fingerprint
        except (OSError, json.JSONDecodeError):
            return False

    @staticmethod
    def write_shard_manifest(shard_dir: str, shard_id: int, fingerprint: str,
                             metrics: dict[str, Any]) -> None:
        path = BuildCheckpoint.shard_manifest_path(shard_dir, shard_id)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"shard": shard_id, "fingerprint": fingerprint, **metrics}, f,
                      indent=1, sort_keys=True)
        os.replace(tmp, path)

    # -- top-level build manifest ------------------------------------------

    def write_build_manifest(self, payload: dict[str, Any]) -> None:
        path = os.path.join(self.out_dir, "build.manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": self.fingerprint, **payload}, f, indent=1, sort_keys=True)
        os.replace(tmp, path)


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


class CpuMonitor:
    """Window (utime, stime) accounting over local Ray processes that
    SURVIVES worker death.

    Snapshot-delta accounting (sum live processes at t0 and t1, subtract)
    goes NEGATIVE whenever Ray kills idle workers inside the window: a
    killed worker's jiffies vanish from /proc, and the raylet's
    cutime/cstime never accrues them (measured: 8 killed Burner actors
    carrying 22.7 cpu-s → raylet cutime stays 0.0 — the raylet reaps
    children without wait()-style CPU accounting).  This monitor samples
    /proc every ``interval`` seconds and charges each (pid, starttime)
    key last_seen − first_seen, so a worker that dies mid-window keeps
    every jiffy it burned up to its final sample (loss bound: interval ×
    cores; pid reuse can't cross-charge because starttime differs)."""

    def __init__(self, interval: float = 0.25):
        import threading

        self._interval = interval
        self._first: dict[str, tuple[float, float]] = {}
        self._last: dict[str, tuple[float, float]] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _sample() -> dict[str, tuple[float, float]]:
        import glob as _g

        hz = os.sysconf("SC_CLK_TCK")
        me = str(os.getpid())
        out: dict[str, tuple[float, float]] = {}
        for stat in _g.glob("/proc/[0-9]*/stat"):
            pid = stat.split("/")[2]
            try:
                raw = open(stat).read()
                # comm survives zombie state (cmdline is empty there)
                comm = raw[raw.index("(") + 1:raw.rindex(") ")]
                if not (pid == me or comm.startswith("ray")):
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read()
                    if not (b"ray::" in cmd or b"raylet" in cmd
                            or b"ray/" in cmd):
                        continue
                parts = raw.rsplit(") ", 1)[1].split()
                key = f"{pid}:{parts[19]}"  # starttime disambiguates reuse
                out[key] = (int(parts[11]) / hz, int(parts[12]) / hz)
            except Exception:
                continue
        return out

    def _absorb(self, s: dict[str, tuple[float, float]]) -> None:
        for k, v in s.items():
            if k not in self._first:
                self._first[k] = v
            self._last[k] = v

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            self._absorb(self._sample())

    def __enter__(self) -> "CpuMonitor":
        self._absorb(self._sample())
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._absorb(self._sample())

    def totals(self) -> tuple[float, float]:
        """(utime, stime) burned inside the window."""
        u = s = 0.0
        for k, (lu, ls) in self._last.items():
            fu, fs = self._first[k]
            u += lu - fu
            s += ls - fs
        return u, s
