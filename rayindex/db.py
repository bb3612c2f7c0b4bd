"""DB metadata sink — reference S6–S8 and T6, re-expressed Ray-Data-first.

The reference populates a Postgres article-metadata table one row at a
time: a string-interpolated INSERT with a commit per row and a fixed
900 s sleep-then-drop on failure (reference
indexing/database_population/db_updater.py:4-14), over a psycopg2
connection built from an ini file (db_connection.py:5-23), with an
interactive ``DELETE FROM {table}`` truncator (db_nuke.py:1-35) and
reconnect-on-failure connection state inside the builder
(indexing/index_builder/index_build.py:128,170-175).

Here the sink is an actor-pool ``map_batches`` stage:

* each actor opens ONE DBAPI connection in ``__init__`` (T6) and reuses
  it for its lifetime;
* each ``__call__`` writes a whole Arrow batch with a single
  parameterized ``executemany`` and one commit — batched,
  injection-safe (values travel as DBAPI parameters; identifiers are
  validated against ``[A-Za-z_][A-Za-z0-9_]*``), and idempotent under
  Ray task retries (upsert keyed on the primary key), unlike the
  reference's per-row commit + interpolated SQL;
* transient failures reconnect with bounded exponential backoff instead
  of the reference's fixed 900 s sleep-and-drop.

The sink is DBAPI-agnostic: pass any zero-arg ``connect_fn``.  The
sandbox stand-in is stdlib ``sqlite3`` (WAL journal + busy_timeout so a
``concurrency>1`` actor pool interleaves writers on one file); on a
real cluster pass e.g. ``functools.partial(psycopg2.connect, dsn)`` and
``paramstyle="format"`` — only the DBAPI surface is used.  At 100 TB
the DB holds *metadata* (id, lang, source, sizes), never content: the
stage streams, each batch is one round trip, and the DB's own write
throughput — not Ray — is the scaling limit, which is why the doc store
itself is Parquet (SURVEY §1.3) and this sink is the optional side
table the reference's serving layer expects.
"""

from __future__ import annotations

import re
import time
from typing import Callable, Sequence

import pyarrow as pa

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def sqlite_connect(path: str):
    """DBAPI connection to a SQLite file tuned for multi-process writers
    (the sandbox stand-in for the reference's psycopg2 connector,
    db_connection.py:5-23): WAL journal so readers never block the
    writer, and a 30 s busy timeout so concurrent actor-pool writers
    queue on the file lock instead of failing."""
    import sqlite3

    conn = sqlite3.connect(path, timeout=30.0)
    conn.execute("PRAGMA journal_mode=WAL")
    conn.execute("PRAGMA busy_timeout=30000")
    return conn


def sqlite_connect_fn(path: str) -> Callable[[], object]:
    """Picklable zero-arg connect_fn for ``MetadataSink`` actors."""
    from functools import partial

    return partial(sqlite_connect, path)


_ARROW_TO_SQL = [
    (pa.types.is_integer, "BIGINT"),
    (pa.types.is_floating, "DOUBLE PRECISION"),
    (pa.types.is_boolean, "BOOLEAN"),
    (pa.types.is_binary, "BLOB"),
    (pa.types.is_large_binary, "BLOB"),
]


def _sql_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_SQL:
        if pred(t):
            return name
    return "TEXT"


def create_table_sql(table: str, schema: pa.Schema, primary_key: str) -> str:
    """``CREATE TABLE IF NOT EXISTS`` DDL derived from an Arrow schema
    (portable column types; identifiers validated)."""
    _check_ident(table)
    cols = []
    for f in schema:
        pk = " PRIMARY KEY" if f.name == primary_key else ""
        cols.append(f"{_check_ident(f.name)} {_sql_type(f.type)}{pk}")
    return f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)})"


def truncate_table(connect_fn: Callable[[], object], table: str, *,
                   force: bool = False, missing_ok: bool = False) -> int:
    """``DELETE FROM {table}`` (reference db_nuke.py:1-35).  The
    reference prompts interactively; a batch pipeline cannot, so the
    destructive step requires an explicit ``force=True``.  Returns the
    number of rows deleted (0 when the table is absent and
    ``missing_ok``)."""
    _check_ident(table)
    if not force:
        raise ValueError(
            f"refusing to empty {table!r} without force=True "
            "(the reference's interactive confirmation)")
    conn = connect_fn()
    try:
        cur = conn.cursor()
        try:
            cur.execute(f"DELETE FROM {table}")
        except Exception:
            if missing_ok:
                return 0
            raise
        n = cur.rowcount
        conn.commit()
        return n if n is not None and n >= 0 else 0
    finally:
        conn.close()


def read_table(connect_fn: Callable[[], object], table: str,
               columns: Sequence[str]) -> pa.Table:
    """Read ``columns`` back as an Arrow table (round-trip verification
    helper; result fits in memory by the metadata-only contract)."""
    _check_ident(table)
    cols = ", ".join(_check_ident(c) for c in columns)
    conn = connect_fn()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT {cols} FROM {table}")
        rows = cur.fetchall()
    finally:
        conn.close()
    arrays = [pa.array([r[i] for r in rows]) for i in range(len(columns))]
    return pa.table(dict(zip(columns, arrays)))


class MetadataSink:
    """Actor-pool ``map_batches`` stage that upserts each Arrow batch
    into a DBAPI table (reference S6, db_updater.py:4-14, batched).

    Use::

        ds.map_batches(MetadataSink, batch_format="pyarrow",
                       concurrency=N, batch_size=B,
                       fn_constructor_kwargs=dict(
                           connect_fn=sqlite_connect_fn(path),
                           table="doc_metadata",
                           columns=["doc_id", "lang", "source"]))

    Emits one ``{rows_written}`` row per batch so the stage streams and
    the pipeline's consumer can ``sum("rows_written")``.
    """

    def __init__(self, connect_fn: Callable[[], object], table: str,
                 columns: Sequence[str], primary_key: str = "doc_id",
                 paramstyle: str = "qmark", create_from: pa.Schema | None = None,
                 max_retries: int = 5, backoff_s: float = 0.1):
        self._connect_fn = connect_fn
        self._table = _check_ident(table)
        self._columns = [_check_ident(c) for c in columns]
        self._pk = _check_ident(primary_key)
        self._max_retries = max_retries
        self._backoff_s = backoff_s
        ph = {"qmark": "?", "format": "%s"}[paramstyle]
        placeholders = ", ".join([ph] * len(self._columns))
        collist = ", ".join(self._columns)
        updates = ", ".join(f"{c} = excluded.{c}"
                            for c in self._columns if c != self._pk)
        # ON CONFLICT upsert: valid SQLite (>=3.24) and Postgres; keyed on
        # the primary key so Ray task retries are idempotent
        self._sql = (f"INSERT INTO {self._table} ({collist}) "
                     f"VALUES ({placeholders}) "
                     f"ON CONFLICT({self._pk}) DO UPDATE SET {updates}")
        self._ddl = (create_table_sql(self._table, create_from, self._pk)
                     if create_from is not None else None)
        self._conn = None
        self._connect()

    def _connect(self) -> None:
        self._conn = self._connect_fn()
        if self._ddl is not None:
            try:
                self._conn.cursor().execute(self._ddl)
                self._conn.commit()
            except Exception:
                # racing actor created it first
                self._conn.rollback()

    def _reconnect(self) -> None:
        try:
            if self._conn is not None:
                self._conn.close()
        except Exception:
            pass
        self._connect()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = list(zip(*(batch.column(c).to_pylist() for c in self._columns)))
        delay = self._backoff_s
        for attempt in range(self._max_retries + 1):
            try:
                cur = self._conn.cursor()
                cur.executemany(self._sql, rows)
                self._conn.commit()
                break
            except Exception:
                # bounded exponential backoff + reconnect (vs the
                # reference's fixed 900 s sleep and silent row drop)
                if attempt == self._max_retries:
                    raise
                try:
                    self._conn.rollback()
                except Exception:
                    pass
                time.sleep(delay)
                delay = min(delay * 2, 5.0)
                self._reconnect()
        return pa.table({"rows_written": pa.array([len(rows)], pa.int64())})

    def __del__(self):
        try:
            if self._conn is not None:
                self._conn.close()
        except Exception:
            pass
