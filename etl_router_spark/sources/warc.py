"""WARC / WET archive source — the CommonCrawl ingestion path for the
LLM-training-data pipeline (public spec: ISO 28500 / WARC 1.0-1.1;
CommonCrawl publishes extracted text as ``*.warc.wet.gz``).

The reference engine has no web-archive connector (its file source,
types.rs:143-162, stops at json/csv/parquet/avro/orc/text); this module
is part of the beyond-reference training-data operator set, alongside
``functions/dedup.py`` and ``functions/text.py`` which consume the
records it produces.

Scale design (the 100 TB case IS CommonCrawl: one crawl is ~90k WET
files x ~150 MB gz):

- **One InputPartition per archive file.** WET files are independently
  parseable units of roughly uniform size, so file-granular partitioning
  gives ~90k well-balanced tasks on a 1000-executor cluster with zero
  coordination. No shuffle is introduced by the read.
- **Streaming record parser.** Each task holds ONE record in memory at
  a time (header dict + Content-Length payload bytes), never the file:
  a 150 MB member-gzipped archive parses in O(record) memory.
- **Member-per-record gzip.** CommonCrawl compresses each record as its
  own gzip member; Python's ``gzip`` transparently reads concatenated
  members, so the same code path handles whole-file gzip and
  member-per-record layout.
- **Record-type predicate applied in the parser** (before row
  materialization): WET ``warcinfo`` preambles and WARC
  ``request``/``metadata`` records are dropped inside the task, so only
  wanted rows cross the Python->Arrow boundary.

Register via ``read_source(spark, {"source_type": "warc", ...})`` or
directly::

    spark.read.format("warc").option("path", dir_or_file).load()

Options: ``path`` (directory, single file, or glob), ``record_types``
(comma list, default ``conversion,response,resource``), ``min_length``
(drop payloads shorter than N bytes, default 0).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: Output schema — fixed, like Spark's built-in binaryFile source.
WARC_SCHEMA = (
    "url STRING, warc_date STRING, record_id STRING, record_type STRING, "
    "content_type STRING, content_length BIGINT, payload STRING"
)

_DEFAULT_TYPES = ("conversion", "response", "resource")


def _open_archive(path: str):
    """Binary stream over a WET/WARC file; gzip (incl. concatenated
    members, the CommonCrawl layout) is detected by extension."""
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _read_headers(fh) -> dict[str, str] | None:
    """Parse one record's header block: the ``WARC/x.y`` version line
    then ``Name: value`` lines up to the blank separator. Returns None
    at EOF. Tolerates LF-only line endings and blank padding between
    records (the spec mandates two CRLFs after each payload)."""
    # skip inter-record blank lines to the version line
    while True:
        line = fh.readline()
        if not line:
            return None
        stripped = line.strip()
        if stripped:
            break
    if not stripped.startswith(b"WARC/"):
        raise ValueError(
            f"malformed WARC record: expected version line, got {stripped[:40]!r}"
        )
    headers: dict[str, str] = {"_version": stripped.decode("ascii", "replace")}
    while True:
        line = fh.readline()
        if not line:
            raise ValueError("malformed WARC record: EOF inside header block")
        stripped = line.strip()
        if not stripped:
            return headers
        if b":" in stripped:
            k, v = stripped.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        # header continuation lines (rare) are ignored rather than fatal


def parse_warc_stream(fh, record_types=None, min_length: int = 0):
    """Generator of record dicts from a binary WARC/WET stream.

    Streaming: memory is one record's headers + payload, independent of
    archive size. ``record_types`` filters on the ``WARC-Type`` header
    before payload decode; ``min_length`` drops short payloads (the
    usual WET noise floor).
    """
    wanted = None if record_types is None else {t.lower() for t in record_types}
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        payload = fh.read(length)
        if len(payload) != length:
            raise ValueError(
                f"malformed WARC record: payload truncated ({len(payload)}/{length} bytes)"
            )
        rtype = headers.get("warc-type", "").lower()
        if (wanted is not None and rtype not in wanted) or length < min_length:
            continue
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "record_type": rtype,
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload.decode("utf-8", "replace"),
        }


def write_wet(path: str, records, gzip_members: bool = False) -> int:
    """Write spec-conformant WET bytes — the fixture/staging twin of the
    reader (and a usable exporter: each record its own gzip member when
    ``gzip_members``, byte-compatible with the CommonCrawl layout).

    ``records``: iterable of dicts with ``url``/``payload`` and optional
    ``warc_date``/``record_id``/``record_type``/``content_type``.
    Returns the record count.
    """
    n = 0
    raw = open(path, "wb")
    try:
        for rec in records:
            payload = rec["payload"]
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            head = [
                b"WARC/1.0",
                b"WARC-Type: " + rec.get("record_type", "conversion").encode(),
                b"WARC-Target-URI: " + rec["url"].encode(),
                b"WARC-Date: " + rec.get("warc_date", "2024-01-01T00:00:00Z").encode(),
                b"WARC-Record-ID: <urn:uuid:" + rec.get(
                    "record_id", f"fixture-{n:08d}").encode() + b">",
                b"Content-Type: " + rec.get("content_type", "text/plain").encode(),
                b"Content-Length: " + str(len(payload)).encode(),
            ]
            body = b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
            if gzip_members:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(body)
                raw.write(buf.getvalue())
            else:
                raw.write(body)
            n += 1
    finally:
        raw.close()
    return n


def _list_archives(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".")
            and (".warc" in f or ".wet" in f or f.endswith(".gz"))
        )
    if any(c in path for c in "*?["):
        return sorted(_glob.glob(path))
    return [path]


class _ArchivePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires .option('path', ...)")
        types = options.get("record_types")
        self.record_types = (
            tuple(t.strip() for t in types.split(",") if t.strip())
            if types
            else _DEFAULT_TYPES
        )
        self.min_length = int(options.get("min_length", "0"))

    def partitions(self):
        files = _list_archives(self.path)
        if not files:
            raise ValueError(f"warc source: no archive files under {self.path!r}")
        return [_ArchivePartition(p) for p in files]

    def read(self, partition: _ArchivePartition):
        with _open_archive(partition.path) as fh:
            for rec in parse_warc_stream(fh, self.record_types, self.min_length):
                yield (
                    rec["url"],
                    rec["warc_date"],
                    rec["record_id"],
                    rec["record_type"],
                    rec["content_type"],
                    rec["content_length"],
                    rec["payload"],
                )


class _WroteArchive(WriterCommitMessage):
    def __init__(self, tmp_path: str, records: int):
        self.tmp_path = tmp_path
        self.records = records


class WarcWriter(DataSourceWriter):
    """Corpus EXPORT half: each partition streams its rows into one WET
    archive (member-per-record gzip by default — the CommonCrawl
    layout, so any member boundary is a resume point for downstream
    readers). Same atomic publish protocol as the jsonl_queue writer:
    dot-prefixed temps, commit renames every partition's archive into
    place, abort deletes them — a failed job publishes nothing.

    Partition-parallel and streaming (one record in memory per task),
    so exporting a 100 TB curated corpus is bounded by codec speed per
    core, not by any coordination. Rows need ``url`` + ``payload``
    columns (names configurable via ``url_field`` / ``payload_field``;
    extra columns are ignored so a curated frame can be exported
    as-is).
    """

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires .option('path', ...)")
        self.url_field = options.get("url_field", "url")
        self.payload_field = options.get("payload_field", "payload")
        self.gzip = (options.get("gzip", "true") or "true").lower() != "false"
        names = [f.name for f in schema.fields]
        for need in (self.url_field, self.payload_field):
            if need not in names:
                raise ValueError(
                    f"warc sink: column {need!r} not in input schema {names} "
                    "(set url_field/payload_field options)"
                )

    def write(self, iterator) -> _WroteArchive:
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        ext = ".warc.wet.gz" if self.gzip else ".warc.wet"
        tmp = os.path.join(self.path, f".part-{pid:05d}-{uuid.uuid4().hex}{ext}.tmp")
        n = write_wet(
            tmp,
            ({"url": row[self.url_field], "payload": row[self.payload_field] or ""}
             for row in iterator),
            gzip_members=self.gzip,
        )
        return _WroteArchive(tmp, n)

    def commit(self, messages) -> None:
        for i, m in enumerate(messages):
            d, base = os.path.split(m.tmp_path)
            final = os.path.join(d, base[1:-4])  # strip dot prefix + .tmp
            os.rename(m.tmp_path, final)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcBatchReader:
        return WarcBatchReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcWriter:
        if overwrite:
            raise ValueError(
                "warc sink is append-only (archives are immutable); "
                "write to a fresh directory per export"
            )
        return WarcWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent session registration (same seam as python_queue)."""
    from etl_router_spark.io import ensure_worker_imports

    ensure_worker_imports(spark)
    spark.dataSource.register(WarcDataSource)
