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
        if track_cpu:
            u0, s0 = _ray_cpu_split()
        t0 = time.perf_counter()
        metrics = fn(d) or {}
        wall = time.perf_counter() - t0
        metrics["wall_s"] = round(wall, 3)
        if track_cpu:
            u1, s1 = _ray_cpu_split()
            metrics["utime_s"] = round(u1 - u0, 2)
            metrics["stime_s"] = round(s1 - s0, 2)
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


def _ray_cpu_split() -> tuple[float, float]:
    """(utime, stime) summed over this process and live local Ray
    processes — see bench._ray_cpu_split for the methodology notes."""
    import glob as _g

    hz = os.sysconf("SC_CLK_TCK")
    me = str(os.getpid())
    utime = stime = 0.0
    for stat in _g.glob("/proc/[0-9]*/stat"):
        pid = stat.split("/")[2]
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if not (pid == me or b"ray::" in cmd or b"raylet" in cmd
                    or b"ray/" in cmd):
                continue
            parts = open(stat).read().rsplit(") ", 1)[1].split()
            utime += int(parts[11]) / hz
            stime += int(parts[12]) / hz
            if b"raylet" in cmd:
                # reaped worker jiffies migrate to the raylet's cutime/
                # cstime — without these, dying idle workers make deltas
                # NEGATIVE (their own counters vanish from /proc)
                utime += int(parts[13]) / hz
                stime += int(parts[14]) / hz
        except Exception:
            continue
    return utime, stime
