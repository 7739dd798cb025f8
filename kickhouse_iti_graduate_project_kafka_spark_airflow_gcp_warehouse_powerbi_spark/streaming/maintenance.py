"""Incremental warehouse maintenance — the ClickHouse-MV replacement (ST8).

The reference's materialized views transform **each insert block** into the
dw star schema (ClickHouse DDL 229-439); joins in MVs fire only on inserts
to the *left* table (SURVEY.md §3.2 'hard parts'). The Spark-native
equivalent is ``foreachBatch``: every micro-batch runs the same DataFrame
transform the batch backfill uses — one transform function, two drivers —
and appends to a partitioned silver table.

Latest-state reads go through operators/latest.py views, never the raw
append table (mirrors README.md:475-477).

Sinks are partitioned parquet with **exactly-once effective semantics**
(Delta is not in this container): every micro-batch lands in its own
``_batch_id=<n>`` partition via dynamic-partition overwrite, so a
failed-then-retried batch REPLACES its partition instead of
double-appending — the same effective idempotence as the reference's
ClickPipes per-block inserts. Readers go through ``read_silver``, which
drops the bookkeeping column.

**Reader atomicity (commit manifest).** Dynamic overwrite alone is
idempotent but not atomic-with-readers: a reader concurrent with an
in-flight batch write could glimpse a partial ``_batch_id`` partition.
So each batch is COMMITTED only after its data write finishes: the
committed set lives in ONE swap-atomic manifest file
(``<table>/_commits/manifest.json``) updated by write-temp + sync +
atomic rename, and ``read_silver`` filters to committed batch ids (a
partition-pruning ``isin`` on the 8-byte batch column — the driver holds
one int per batch, nothing else). The ``_``-prefixed directory is
invisible to parquet discovery, like ``_spark_metadata``. Readers see
either the old committed set or the new one, never a torn state, and the
single file means one read (no listing) on every storage backend.

**Retry window: closed.** The historical gap — a crash between manifest
update and checkpoint commit causing the retried batch to REWRITE an
already-visible partition — is closed by making the manifest the single
source of truth of batch completion: ``write_batch_idempotent`` treats an
already-committed batch id as a finished write and SKIPS the data write
entirely (the partition's contents were final the instant its manifest
entry landed; the retry only needs the checkpoint to advance). This is
the same txn-id dedup Delta's idempotent writes use. No snapshot
isolation is required because committed partitions are never rewritten.

**Stream identity (txn app id).** Skipping by bare batch id alone would
be unsafe across stream *restarts with a reset checkpoint*: batch ids
restart at 0, so every early batch of the new stream would be silently
dropped while its checkpoint advanced — permanent data loss. The manifest
therefore records a ``run_id`` (Delta's ``txnAppId`` analogue): the
streaming query id persisted in the checkpoint's ``metadata`` file, which
is stable across restarts of the same stream and REGENERATED when the
checkpoint is reset. A committed batch id is skipped only when the
manifest's run_id matches the writer's; a mismatch FAILS LOUDLY with
instructions (drop/backfill the table, or pass a matching
``txn_app_id``) instead of dropping data. Manifests written before this
field existed (run_id null) keep the old skip behavior, as does a writer
that supplies no id — documented legacy compatibility.

**Storage routing.** Manifest I/O goes through one of two equivalent
backends picked by path scheme:

- schemeless local paths → driver ``os`` I/O: write-temp + ``fsync`` +
  ``os.replace`` + directory fsync (rename survives power loss);
- any URI (``file:``, ``hdfs://``, ``s3a://``, ``gs://``, ...) → the
  Hadoop ``FileSystem`` API via ``spark._jvm``: write-temp + ``hsync``
  (``hflush`` fallback) + ``FileContext.rename(..., Rename.OVERWRITE)``,
  the same atomic-swap protocol HDFS guarantees and Delta's HDFSLogStore
  relies on. ``file:`` URIs exercise this path in tests through Hadoop's
  LocalFileSystem. On stores without atomic rename (raw S3A without a
  consistent-rename layer) the single-small-object PUT that the rename
  degrades into is still a whole-object swap on today's strongly
  consistent S3; for anything weaker, front the path with a rename-atomic
  layer as Delta requires. A ``file:`` URI with no active SparkSession
  falls back to the (identical-FS) local backend so driver-side tools can
  read manifests without a JVM.
"""

from __future__ import annotations

import json
import os
import posixpath
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: bookkeeping partition column carrying foreachBatch's batchId
BATCH_COL = "_batch_id"

#: per-table directory of committed-batch markers
COMMITS_DIR = "_commits"


#: the single swap-atomic manifest file enumerating committed batch ids
MANIFEST = "manifest.json"


# ---------------------------------------------------------------------------
# storage backends — one protocol, two implementations
# ---------------------------------------------------------------------------


class _LocalManifestIO:
    """Driver-local ``os`` I/O for schemeless paths: the strongest local
    durability story (fsync file + fsync directory entry)."""

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def read_text(self, p: str) -> str | None:
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return f.read()

    def list_names(self, d: str) -> list[str]:
        return os.listdir(d)

    def write_swap(self, d: str, name: str, text: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(d, name))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        # a Hadoop LocalFileSystem writer may have left a checksum sibling
        # (.<name>.crc); replacing the data file without it would make the
        # next Hadoop-backend read fail ChecksumException on a healthy
        # manifest. A MISSING crc is fine (verification is skipped), a
        # stale one is not — drop it.
        crc = os.path.join(d, f".{name}.crc")
        if os.path.exists(crc):
            os.unlink(crc)
        dfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def rmtree(self, p: str) -> None:
        import shutil

        shutil.rmtree(p, ignore_errors=True)

    def write_exclusive(self, d: str, name: str, text: str) -> bool:
        """Create ``d/name`` with ``text`` iff it does not exist — the
        optimistic-concurrency commit primitive (two writers racing on the
        same version file: exactly one wins). Implemented as write-temp +
        fsync + ``os.link`` (an atomic create-exclusive that publishes the
        FULL content — a reader can never observe a torn file, unlike
        O_EXCL + incremental writes). Returns False when the loser should
        re-read state and retry."""
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, os.path.join(d, name))
            except FileExistsError:
                return False
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            return True
        finally:
            os.unlink(tmp)

    def mtime(self, p: str) -> float:
        return os.path.getmtime(p)

    def du(self, p: str) -> tuple[int, int]:
        """(bytes, files) under a path — the system.parts size probe."""
        total = files = 0
        if os.path.isfile(p):
            return os.path.getsize(p), 1
        for root, _dirs, names in os.walk(p):
            for n in names:
                fp = os.path.join(root, n)
                if os.path.isfile(fp):
                    total += os.path.getsize(fp)
                    files += 1
        return total, files

    def delete(self, p: str) -> None:
        """Remove a file OR a directory tree (``rmtree`` silently no-ops
        on plain files under ``ignore_errors``)."""
        if os.path.isdir(p):
            self.rmtree(p)
        elif os.path.exists(p):
            os.unlink(p)


class _HadoopManifestIO:
    """Hadoop ``FileSystem`` I/O for URI paths, driven over py4j from the
    active SparkSession's JVM. The swap uses ``FileContext.rename`` with
    ``Options.Rename.OVERWRITE`` — the API whose atomicity HDFS
    guarantees (plain ``FileSystem.rename`` refuses an existing
    destination, and delete-then-rename would open a no-manifest window
    in which readers see an empty committed set)."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._gw = spark.sparkContext._gateway

    def _jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._jpath(p).getFileSystem(self._conf)

    def isdir(self, p: str) -> bool:
        fs = self._fs(p)
        jp = self._jpath(p)
        return bool(fs.exists(jp)) and bool(fs.getFileStatus(jp).isDirectory())

    def mkdirs(self, p: str) -> None:
        self._fs(p).mkdirs(self._jpath(p))

    def read_text(self, p: str) -> str | None:
        fs = self._fs(p)
        jp = self._jpath(p)
        if not fs.exists(jp):
            return None
        ins = fs.open(jp)
        try:
            # JDK InputStream.readAllBytes: the byte[] comes back by value
            # as Python bytes (py4j copies byte arrays across the bridge,
            # so filling a JVM-side buffer via readFully would not be
            # visible here)
            return bytes(ins.readAllBytes()).decode("utf-8")
        finally:
            ins.close()

    def list_names(self, d: str) -> list[str]:
        return [s.getPath().getName() for s in self._fs(d).listStatus(self._jpath(d))]

    def write_swap(self, d: str, name: str, text: str) -> None:
        tmp = f"{d.rstrip('/')}/.{name}.{uuid.uuid4().hex}.tmp"
        fs = self._fs(d)
        try:
            out = fs.create(self._jpath(tmp), True)
            try:
                out.write(bytearray(text.encode("utf-8")))
                try:
                    out.hsync()  # durable on HDFS; LocalFileSystem flushes
                except Exception:
                    out.hflush()
            finally:
                out.close()
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._jvm.java.net.URI(d), self._conf
            )
            rename_cls = getattr(self._jvm, "org.apache.hadoop.fs.Options$Rename")
            opts = self._gw.new_array(rename_cls, 1)
            opts[0] = rename_cls.OVERWRITE
            fc.rename(self._jpath(tmp), self._jpath(f"{d.rstrip('/')}/{name}"), opts)
        except Exception:
            # mirror the local backend: never leave temp litter behind a
            # failed swap (retrying streams would accumulate it forever)
            try:
                fs.delete(self._jpath(tmp), False)
            except Exception:
                pass
            raise

    def rmtree(self, p: str) -> None:
        fs = self._fs(p)
        jp = self._jpath(p)
        if fs.exists(jp):
            fs.delete(jp, True)

    def write_exclusive(self, d: str, name: str, text: str) -> bool:
        """Create-if-absent commit primitive: write-temp + plain
        ``FileSystem.rename``, which REFUSES an existing destination (the
        exact opposite of ``write_swap``'s Rename.OVERWRITE) — on HDFS an
        atomic namespace operation, so exactly one of two racing committers
        wins and the loser's temp is cleaned up. Returns False to signal
        retry-with-next-version."""
        base = d.rstrip("/")
        tmp = f"{base}/.{name}.{uuid.uuid4().hex}.tmp"
        fs = self._fs(d)
        dst = self._jpath(f"{base}/{name}")
        try:
            if fs.exists(dst):
                return False
            out = fs.create(self._jpath(tmp), True)
            try:
                out.write(bytearray(text.encode("utf-8")))
                try:
                    out.hsync()
                except Exception:
                    out.hflush()
            finally:
                out.close()
            ok = bool(fs.rename(self._jpath(tmp), dst))
            if not ok:
                fs.delete(self._jpath(tmp), False)
            return ok
        except Exception:
            try:
                fs.delete(self._jpath(tmp), False)
            except Exception:
                pass
            raise

    def mtime(self, p: str) -> float:
        return self._fs(p).getFileStatus(self._jpath(p)).getModificationTime() / 1000.0

    def du(self, p: str) -> tuple[int, int]:
        """(bytes, files) under a path — one ``getContentSummary`` RPC."""
        cs = self._fs(p).getContentSummary(self._jpath(p))
        return int(cs.getLength()), int(cs.getFileCount())

    def delete(self, p: str) -> None:
        """File-or-directory delete (``FileSystem.delete`` handles both)."""
        self.rmtree(p)


def _hadoop_io(spark: SparkSession) -> _HadoopManifestIO:
    """Factory, separate so tests can monkeypatch a fake backend to prove
    the routing of non-local schemes without an object store in the box."""
    return _HadoopManifestIO(spark)


def _io_for(target_path: str):
    """Pick the manifest backend for ``target_path`` and normalize the
    path the backend should use. Fails CLOSED: a remote URI with no active
    SparkSession raises rather than silently skipping the visibility
    protocol."""
    if "://" not in target_path and not target_path.startswith("file:"):
        return _LocalManifestIO(), target_path
    spark = SparkSession.getActiveSession()
    if spark is not None:
        return _hadoop_io(spark), target_path
    if target_path.startswith("file:"):
        # same filesystem, same protocol — allow driver-side tools without
        # a JVM to read local manifests
        local = target_path[len("file:"):] or "/"
        return _LocalManifestIO(), local
    raise RuntimeError(
        f"commit-manifest I/O for remote path {target_path!r} needs an "
        "active SparkSession (Hadoop FileSystem access); refusing to fail "
        "open without the visibility protocol."
    )


def _join(io, base: str, *parts: str) -> str:
    if isinstance(io, _LocalManifestIO):
        return os.path.join(base, *parts)
    return posixpath.join(base.rstrip("/"), *parts)


# ---------------------------------------------------------------------------
# manifest protocol
# ---------------------------------------------------------------------------


def _read_manifest(io, d: str) -> tuple[set[int], str | None]:
    """(committed ids, run_id) from the manifest file, ids merged with any
    legacy per-batch ``<id>.json`` markers (pre-manifest tables migrate on
    their next commit)."""
    ids: set[int] = set()
    run_id: str | None = None
    text = io.read_text(_join(io, d, MANIFEST))
    if text is not None:
        try:
            doc = json.loads(text)
            if not isinstance(doc, dict):
                raise ValueError("manifest JSON is not an object")
            ids.update(int(b) for b in doc.get("batch_ids", []))
            run_id = doc.get("run_id")
        except (json.JSONDecodeError, ValueError, TypeError):
            # a torn manifest is impossible via atomic rename; treat garbage
            # as corruption and fail loudly rather than un-commit batches
            raise RuntimeError(f"corrupt commit manifest: {_join(io, d, MANIFEST)}")
    for name in io.list_names(d):
        if name.endswith(".json") and name != MANIFEST:
            try:
                ids.add(int(name[: -len(".json")]))
            except ValueError:
                continue
    return ids, run_id


def record_commit(target_path: str, batch_id: int, run_id: str | None = None) -> None:
    """Mark ``batch_id`` committed: rewrite the single manifest file with
    the full committed set via write-temp + sync + atomic rename-overwrite.
    Readers either see the old committed set or the new one — never a torn
    state. Single-writer per table (one streaming query owns a silver
    table), so the read-modify-write needs no lock.

    ``run_id`` stamps the stream identity that owns this batch sequence
    (see module docstring); a non-null manifest run_id that differs from a
    non-null ``run_id`` raises — two streams must not interleave commits
    into one table."""
    io, path = _io_for(target_path)
    d = _join(io, path, COMMITS_DIR)
    io.mkdirs(d)
    ids, existing_run = _read_manifest(io, d)
    if run_id is not None and existing_run is not None and run_id != existing_run:
        raise RuntimeError(
            f"silver table {target_path!r} is owned by stream run "
            f"{existing_run!r} but writer {run_id!r} tried to commit; "
            "drop/backfill the table or reuse the original checkpoint."
        )
    ids.add(int(batch_id))
    doc = {"version": 2, "batch_ids": sorted(ids), "run_id": run_id or existing_run}
    io.write_swap(d, MANIFEST, json.dumps(doc))


def committed_batches(target_path: str) -> list[int] | None:
    """Committed batch ids, or None when the table has no manifest (a
    batch-backfilled table without ``_batch_id`` bookkeeping)."""
    io, path = _io_for(target_path)
    d = _join(io, path, COMMITS_DIR)
    if not io.isdir(d):
        return None
    return sorted(_read_manifest(io, d)[0])


def manifest_run_id(target_path: str) -> str | None:
    """The stream identity recorded in the table's manifest (None for a
    legacy manifest or a table with no manifest)."""
    io, path = _io_for(target_path)
    d = _join(io, path, COMMITS_DIR)
    if not io.isdir(d):
        return None
    return _read_manifest(io, d)[1]


def write_batch_idempotent(
    out: DataFrame,
    batch_id: int,
    target_path: str,
    partition_cols: tuple[str, ...] = (),
    txn_app_id: str | None = None,
) -> None:
    """Write one micro-batch's output under ``_batch_id=<batch_id>`` using
    dynamic-partition overwrite: only the partitions present in this batch
    are replaced, so re-running a batch id (Spark's at-least-once retry)
    yields byte-identical silver state instead of duplicates. Business
    partition columns nest UNDER the batch partition, so month-pruned reads
    still prune (parquet partition discovery handles both levels).

    An ALREADY-COMMITTED batch id from the SAME stream identity is a
    completed write being retried (crash landed between manifest update
    and checkpoint commit): the data write is SKIPPED so the visible
    partition is never rewritten — this closes the marker-vs-checkpoint
    retry window. A committed batch id from a DIFFERENT stream identity
    (checkpoint reset → batch ids restart at 0) raises instead of
    silently dropping the new stream's data; with no identity on either
    side (legacy manifests / ad-hoc callers) the skip keeps the historical
    semantics — resetting a checkpoint then REQUIRES dropping the table
    manifest (``backfill`` does)."""
    io, path = _io_for(target_path)
    d = _join(io, path, COMMITS_DIR)
    if io.isdir(d):
        committed, existing_run = _read_manifest(io, d)
        if int(batch_id) in committed:
            if (
                txn_app_id is not None
                and existing_run is not None
                and txn_app_id != existing_run
            ):
                raise RuntimeError(
                    f"batch {batch_id} of stream {txn_app_id!r} collides with "
                    f"a batch committed by stream {existing_run!r} in "
                    f"{target_path!r} — the checkpoint was reset against an "
                    "existing silver table. Backfill (drops the manifest) or "
                    "point the stream at a fresh table; skipping would "
                    "silently lose this batch."
                )
            return
    (
        out.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL, *partition_cols)
        .parquet(target_path)
    )
    record_commit(target_path, batch_id, run_id=txn_app_id)  # ONLY after the data write


def read_silver(spark: SparkSession, target_path: str) -> DataFrame:
    """Read a silver table, hiding the ``_batch_id`` bookkeeping partition
    and — when a commit manifest exists — restricting to committed batches
    so concurrent in-flight writes are invisible (whole-batch reads)."""
    df = spark.read.parquet(target_path)
    commits = committed_batches(target_path)
    if commits is not None and BATCH_COL in df.columns:
        df = df.filter(F.col(BATCH_COL).isin(commits))
    return df.drop(BATCH_COL)


def _checkpoint_query_id(checkpoint: str) -> str | None:
    """The streaming query id Spark persists at ``<checkpoint>/metadata``
    on first start — stable across restarts of the same stream, freshly
    generated when the checkpoint is reset. This is the natural
    ``txn_app_id``: it changes exactly when batch-id sequences restart.

    Returns None ONLY when the metadata file does not exist (query not
    started / ad-hoc caller). Read or parse failures PROPAGATE: swallowing
    them would silently downgrade the collision guard to legacy skip
    semantics — the exact data-loss mode the run_id exists to prevent."""
    io, path = _io_for(checkpoint)
    text = io.read_text(_join(io, path, "metadata"))
    if text is None:
        return None
    try:
        qid = json.loads(text).get("id")
    except (json.JSONDecodeError, AttributeError) as e:
        raise RuntimeError(
            f"unreadable streaming checkpoint metadata at {checkpoint!r}: {e}"
        ) from None
    return str(qid) if qid else None


def foreach_batch_transform(
    stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_path: str,
    checkpoint: str,
    partition_cols: tuple[str, ...] = (),
    trigger: str = "5 seconds",
    static_joins: dict[str, DataFrame] | None = None,
    txn_app_id: str | None = None,
) -> StreamingQuery:
    """Maintain a silver table: per micro-batch, apply ``transform`` (the
    same function the batch backfill calls) and write idempotently to
    ``target_path`` (see ``write_batch_idempotent``).

    ``txn_app_id`` defaults to the checkpoint's persisted streaming query
    id, so a reset checkpoint (new id, batch ids restart at 0) fails
    loudly against a table committed by the previous stream instead of
    silently dropping batches.

    ``static_joins`` documents the left-driven trigger semantics of the
    reference MVs (J1-J3): the joined parent is a *static snapshot* read
    per batch — inserts to the parent alone do not retrigger child rows,
    exactly like ClickHouse MV joins (DDL 369-414).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        app_id = txn_app_id if txn_app_id is not None else _checkpoint_query_id(checkpoint)
        write_batch_idempotent(
            transform(batch_df), batch_id, target_path, partition_cols, txn_app_id=app_id
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def backfill(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    target_path: str,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """One-time seed of a silver table from existing bronze rows — the
    INSERT...SELECT backfill path (reference: DDL 474-613), sharing the
    exact transform function with the streaming maintenance."""
    # resolve the manifest backend BEFORE the data write: an unreachable
    # manifest path could not be dropped below, which would fail open —
    # raise up front instead of leaving a half-done overwrite
    io, path = _io_for(target_path)
    writer = transform(source).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target_path)
    # a full overwrite invalidates any previous batch bookkeeping; drop a
    # stale manifest so read_silver doesn't filter the reseeded table away
    d = _join(io, path, COMMITS_DIR)
    if io.isdir(d):
        io.rmtree(d)
