"""Custom Python data source for queue-style ingestion (SURVEY §2.1
S4–S7: the "custom Python data source" path for RabbitMQ/SQS/Redis/NATS
when no first-party Spark connector exists).

``JsonlQueueDataSource`` implements the PySpark 4 DataSource API over a
drained-queue directory: a consumer daemon appends complete ``*.jsonl``
files (one JSON message per line) and the source streams them with real
offset tracking — ``{"last": "<filename>"}`` over the lexicographically
sorted file list, one InputPartition per new file, committed through the
checkpoint like any Spark source. This is the same pull-model bridge as
the ``staging_path`` file stream, but demonstrates the full custom-
connector seam: a socket/AMQP/SDK consumer replaces ``_read_file`` in
``read()`` and everything else (offsets, partitions, recovery) stays.

Register once per session, then::

    spark.readStream.format("jsonl_queue")
         .option("path", staging_dir).option("schema", ddl).load()
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _list_files(path: str) -> list[str]:
    try:
        return sorted(
            f for f in os.listdir(path) if f.endswith(".jsonl") and not f.startswith(".")
        )
    except FileNotFoundError:
        return []


def _read_file(path: str, schema: StructType):
    names = [f.name for f in schema.fields]
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            yield tuple(obj.get(n) for n in names)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _offset_cut(files: list[str], off: dict) -> int:
    """Index of the first file NOT covered by ``off``.

    Offsets are ``{"last": "<filename>"}`` — the lexicographically
    greatest published file at snapshot time.  Filename offsets stay
    correct when the listing shifts (a count offset silently re-reads
    or skips rows if any file sorts before an already-counted one).
    Legacy ``{"count": N}`` checkpoints from older runs still resolve.
    """
    if "last" in off:
        last = off["last"]
        if not last:
            return 0
        import bisect

        return bisect.bisect_right(files, last)
    return off.get("count", 0)


class JsonlQueueStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.schema = schema

    def initialOffset(self) -> dict:  # noqa: N802
        return {"last": ""}

    def latestOffset(self) -> dict:  # noqa: N802
        files = _list_files(self.path)
        return {"last": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        files = _list_files(self.path)
        lo, hi = _offset_cut(files, start), _offset_cut(files, end)
        return [_FilePartition(os.path.join(self.path, f)) for f in files[lo:hi]]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path, self.schema)

    def commit(self, end: dict) -> None:
        # the queue analog would ack messages up to `end` here
        pass


class JsonlQueueBatchReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.schema = schema

    def partitions(self):
        return [_FilePartition(os.path.join(self.path, f))
                for f in _list_files(self.path)]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path, self.schema)


class _WroteFile(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class JsonlQueueWriter(DataSourceWriter):
    """Batch writer half of the connector (the PySpark 4 DataSource
    writer API): each partition streams its rows to a DOT-PREFIXED
    temp jsonl in the queue directory (invisible to the reader's
    listing) and reports it in the commit message; ``commit`` renames
    every temp into place atomically, ``abort`` deletes them — so a
    failed job publishes nothing and a committed one publishes every
    partition exactly once. This is the producer seam: a real queue
    producer replaces the file append with an SDK publish and the
    commit with flush/acks."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _WroteFile:
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(self.path, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _WroteFile(tmp, n)

    def commit(self, messages) -> None:
        # Per-job unique names: a second append job to the same queue
        # dir must never rename over an earlier job's committed
        # batches (fixed batch-{i} names silently lost data). time_ns
        # makes names monotonic across SEQUENTIAL jobs, so the
        # reader's filename offset covers each new commit; the uuid
        # breaks ties if two drivers commit in the same nanosecond.
        # CONCURRENT commits remain single-reader-unsafe: the stamp is
        # taken at commit start, not atomically with the renames, so a
        # stalled committer can publish a name that sorts BEFORE an
        # offset the reader already snapshotted and be skipped. Run
        # one appender per queue dir (or one dir per producer) when a
        # streaming reader is attached — same single-writer contract
        # as the upsert sink.
        import time
        import uuid

        job = f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}"
        for i, m in enumerate(messages):
            final = m.tmp_path.rsplit("/", 1)[0] + f"/batch-{job}-{i:05d}.jsonl"
            os.rename(m.tmp_path, final)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlQueueDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_queue"

    def schema(self):
        s = self.options.get("schema")
        if not s:
            raise ValueError("jsonl_queue requires .option('schema', '<DDL>')")
        return s

    def reader(self, schema: StructType) -> JsonlQueueBatchReader:
        return JsonlQueueBatchReader(self.options["path"], schema)

    def streamReader(self, schema: StructType) -> JsonlQueueStreamReader:  # noqa: N802
        return JsonlQueueStreamReader(self.options["path"], schema)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlQueueWriter:
        if overwrite:
            raise ValueError("jsonl_queue is append-only (a queue has no overwrite)")
        return JsonlQueueWriter(self.options["path"])


def register(spark) -> None:
    """Idempotent session registration."""
    from etl_router_spark.io import ensure_worker_imports

    # the DataSource class is pickled by reference: executor Python
    # workers must be able to import this package
    ensure_worker_imports(spark)
    spark.dataSource.register(JsonlQueueDataSource)
