"""direct_write round-trips: alignment boundaries, multi-buffer streams,
generator input, and overwrite-shrink behavior."""

from __future__ import annotations

import os

import numpy as np
import pytest

from rayindex.io import _STAGE_BYTES, direct_write


@pytest.mark.parametrize("size", [
    0, 1, 100, 4095, 4096, 4097, 65536,
    _STAGE_BYTES - 1, _STAGE_BYTES, _STAGE_BYTES + 1,
    _STAGE_BYTES + 4096, 2 * _STAGE_BYTES + 123,
])
def test_direct_write_roundtrip_sizes(tmp_path, size):
    rng = np.random.default_rng(size or 1)
    data = rng.integers(0, 255, size, dtype=np.uint8).tobytes()
    p = str(tmp_path / f"f{size}.bin")
    direct_write(p, [data])
    assert open(p, "rb").read() == data


def test_direct_write_many_small_buffers(tmp_path):
    rng = np.random.default_rng(7)
    bufs = [rng.integers(0, 255, int(n), dtype=np.uint8).tobytes()
            for n in rng.integers(0, 5000, 200)]
    p = str(tmp_path / "multi.bin")
    direct_write(p, bufs)  # list: reusable for any fallback
    assert open(p, "rb").read() == b"".join(bufs)


def test_direct_write_generator_of_memoryviews(tmp_path):
    base = np.arange(300000, dtype=np.uint8)
    mv = memoryview(base)

    def stream():
        for lo in range(0, len(base), 7777):
            yield mv[lo:lo + 7777]

    p = str(tmp_path / "gen.bin")
    direct_write(p, stream())
    assert open(p, "rb").read() == base.tobytes()


def test_direct_write_overwrite_shrinks(tmp_path):
    p = str(tmp_path / "shrink.bin")
    direct_write(p, [b"x" * 100000])
    direct_write(p, [b"y" * 5000])
    got = open(p, "rb").read()
    assert got == b"y" * 5000  # O_TRUNC + tail truncate leave no residue


def test_async_writer_roundtrip_and_rename(tmp_path):
    from rayindex.io import AsyncFileWriter

    rng = np.random.default_rng(11)
    aw = AsyncFileWriter()
    want = {}
    for i in range(8):
        data = rng.integers(0, 255, 300000 + i * 9973, dtype=np.uint8).tobytes()
        tmp = str(tmp_path / f".f{i}.tmp")
        final = str(tmp_path / f"f{i}.bin")
        aw.submit(tmp, [data], final)
        want[final] = data
    aw.close()
    for final, data in want.items():
        assert open(final, "rb").read() == data
        assert not os.path.exists(final.replace("f", ".f", 1) + "")


def test_async_writer_error_propagates(tmp_path):
    from rayindex.io import AsyncFileWriter

    aw = AsyncFileWriter()
    aw.submit(str(tmp_path / "no_dir" / "x.tmp"), [b"abc"],
              str(tmp_path / "no_dir" / "x.bin"))
    with pytest.raises(OSError):
        aw.close()


def test_async_writer_concurrent_with_main_thread_writes(tmp_path):
    # the stage buffer is thread-local: main-thread direct_write must not
    # race the background writer's staging
    from rayindex.io import AsyncFileWriter

    rng = np.random.default_rng(13)
    aw = AsyncFileWriter()
    datas = [rng.integers(0, 255, 2_000_000, dtype=np.uint8).tobytes()
             for _ in range(4)]
    for i, d in enumerate(datas):
        aw.submit(str(tmp_path / f".a{i}"), [d], str(tmp_path / f"a{i}"))
        direct_write(str(tmp_path / f"m{i}"), [d])
    aw.close()
    for i, d in enumerate(datas):
        assert open(str(tmp_path / f"a{i}"), "rb").read() == d
        assert open(str(tmp_path / f"m{i}"), "rb").read() == d


def test_read_parquet_clean_strips_pandas_metadata(tmp_path, ray_session):
    # pandas-written parquet carries schema metadata that makes
    # hash(pa.Schema) raise; the clean reader must yield a hashable,
    # metadata-free schema with identical data (single file, file list,
    # directory, and column-pruned forms).
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayindex.io import read_parquet_clean

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                       "c": [0.5, 1.5, 2.5]})
    p = str(tmp_path / "t.parquet")
    df.to_parquet(p)  # pandas writer -> b"pandas" schema metadata
    raw = pq.read_schema(p)
    with pytest.raises(TypeError):
        hash(raw)  # precondition: the dirty schema really is unhashable

    ds = read_parquet_clean(p)
    assert hash(ds.schema().base_schema) is not None
    assert ds.schema().base_schema.metadata is None
    assert ds.count() == 3

    pruned = read_parquet_clean([p], columns=["a", "c"])
    sch = pruned.schema().base_schema
    assert sch.names == ["a", "c"]
    assert sch.metadata is None
    got = pruned.to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == [1, 2, 3]
    assert got["c"].tolist() == [0.5, 1.5, 2.5]

    # directory form resolves the schema from the first part
    d = tmp_path / "parts"
    d.mkdir()
    df.to_parquet(str(d / "p0.parquet"))
    df.to_parquet(str(d / "p1.parquet"))
    dds = read_parquet_clean(str(d), columns=["b"])
    assert dds.count() == 6
    assert dds.schema().base_schema.metadata is None


def test_write_partitioned_resume(ray_session, tmp_path):
    """Key-partitioned resumable sink: equal keys co-locate, a second run
    skips every finished partition, and deleting one manifest rewrites
    exactly that partition."""
    import glob
    import json as _json
    import os
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from rayindex.io import write_partitioned

    t = pa.table({
        "user": pa.array([f"u{i % 7}" for i in range(100)]),
        "v": pa.array(range(100), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "sink")
    r1 = write_partitioned(ds, out, by="user", num_partitions=5)
    assert r1["skipped"] == 0 and r1["rows"] == 100
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert files and len(files) == r1["written"]
    # co-location + routing: every row sits in its crc32 partition
    for f in files:
        pid = int(os.path.basename(f)[5:10])
        got = pq.read_table(f)
        for u in set(got["user"].to_pylist()):
            assert zlib.crc32(str(u).encode()) % 5 == pid
    # manifests agree with data
    total = 0
    for f in files:
        with open(f.replace(".parquet", ".done.json")) as fh:
            total += _json.load(fh)["rows"]
    assert total == 100
    # resume: everything skips, data files untouched
    mtimes = {f: os.path.getmtime(f) for f in files}
    r2 = write_partitioned(ds, out, by="user", num_partitions=5)
    assert r2["written"] == 0 and r2["skipped"] == len(files)
    # skipped partitions report MANIFEST rows, not this run's input rows
    assert r2["rows"] == 100 and r2["rows_written"] == 0
    assert r2["rows_seen"] == 100
    assert {f: os.path.getmtime(f) for f in files} == mtimes
    # delete one manifest -> exactly that partition rewrites
    victim = files[0]
    os.unlink(victim.replace(".parquet", ".done.json"))
    r3 = write_partitioned(ds, out, by="user", num_partitions=5)
    assert r3["written"] == 1 and r3["skipped"] == len(files) - 1
    assert os.path.getmtime(victim) > mtimes[victim]
    for f in files[1:]:
        assert os.path.getmtime(f) == mtimes[f]
    # overwrite clears and rewrites all
    r4 = write_partitioned(ds, out, by="user", num_partitions=5,
                           overwrite=True)
    assert r4["written"] == len(files) and r4["skipped"] == 0
