"""Minimal Kafka wire-protocol codec, producer client, and hermetic
localhost broker — the S1 Kafka source's wire-level gate
(``conveyor-etl-dsl/src/types.rs:164-188``), completing the connector
family's hermetic-protocol coverage (NATS/Pulsar/AMQP/gRPC already
speak their real protocols).

Everything here is public protocol, from the Apache Kafka protocol
guide (kafka.apache.org/protocol):

- request/response framing: int32 size prefix + request header v1
  (api_key, api_version, correlation_id, client_id),
- ApiVersions v0 (key 18), Metadata v0 (key 3), Produce v3 (key 0),
  Fetch v4 (key 1),
- the magic-2 ("v2") RecordBatch on-disk/wire format: zigzag-varint
  record fields, per-record headers, and a CRC32C (Castagnoli,
  RFC 3720 §B.4) integrity check over the post-CRC batch bytes —
  verified by the broker on Produce AND re-verified by the consumer
  on Fetch, so corruption fails loudly in either direction.

The broker assigns per-partition offsets in arrival order and retains
produced batches in an in-memory log; the gate's consumer Fetches
them back over the wire and appends JSON-lines to a staging dir via
atomic rename, which ``source_type: kafka`` + ``staging_path`` reads
into Spark's Kafka wire schema for the ``from_kafka`` envelope path
(``model/envelope.py``) — a full produce→consume roundtrip with no
shortcut around the protocol.

Scale note: this broker exists so the Kafka PATH (option mapping,
envelope promotion, offset bookkeeping) is correctness-gated without a
JVM broker; production reads go through Spark's kafka connector
(``sources/registry.py:_read_kafka``) on a real cluster.
"""

from __future__ import annotations

import socket
import struct
import threading

from etl_router_spark.netio import recv_exact

# --- CRC32C (Castagnoli), reflected poly 0x82F63B78 ------------------

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --- primitives ------------------------------------------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def enc_varint(n: int) -> bytes:
    """Zigzag varint (Kafka record-level integer encoding)."""
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if shift > 63:  # 64-bit varint = at most 10 continuation bytes
            raise ValueError("varint exceeds 64 bits (malformed input)")
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(n), i
        shift += 7


def enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    raw = s.encode()
    return struct.pack(">h", len(raw)) + raw


def dec_str(buf: bytes, i: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", buf, i)
    i += 2
    if n < 0:
        return None, i
    return buf[i:i + n].decode(), i + n


# --- magic-2 RecordBatch ---------------------------------------------

def _enc_record(offset_delta: int, ts_delta: int, key: bytes | None,
                value: bytes | None,
                headers: list[tuple[str, bytes]]) -> bytes:
    body = bytearray(b"\x00")  # attributes (unused)
    body += enc_varint(ts_delta)
    body += enc_varint(offset_delta)
    for blob in (key, value):
        if blob is None:
            body += enc_varint(-1)
        else:
            body += enc_varint(len(blob)) + blob
    body += enc_varint(len(headers))
    for hk, hv in headers:
        raw = hk.encode()
        body += enc_varint(len(raw)) + raw
        if hv is None:
            body += enc_varint(-1)
        else:
            body += enc_varint(len(hv)) + hv
    return enc_varint(len(body)) + bytes(body)


def build_record_batch(
    base_offset: int,
    records: list[tuple[int, bytes | None, bytes | None, list[tuple[str, bytes]]]],
) -> bytes:
    """records = [(timestamp_ms, key, value, headers)] -> wire batch.

    Layout per the protocol guide: baseOffset(i64) batchLength(i32)
    partitionLeaderEpoch(i32) magic(i8=2) crc(u32, CRC32C over every
    byte AFTER the crc field) attributes(i16) lastOffsetDelta(i32)
    baseTimestamp(i64) maxTimestamp(i64) producerId(i64) producerEpoch
    (i16) baseSequence(i32) numRecords(i32) records.
    """
    base_ts = min(r[0] for r in records)
    max_ts = max(r[0] for r in records)
    recs = b"".join(
        _enc_record(i, ts - base_ts, k, v, h)
        for i, (ts, k, v, h) in enumerate(records)
    )
    after_crc = (
        struct.pack(">hiqqqhii", 0, len(records) - 1, base_ts, max_ts,
                    -1, -1, -1, len(records))
        + recs
    )
    crc = crc32c(after_crc)
    body = struct.pack(">ibI", -1, 2, crc) + after_crc  # epoch, magic, crc
    return struct.pack(">qi", base_offset, len(body)) + body


def parse_record_batch(buf: bytes) -> tuple[int, list[dict]]:
    """-> (base_offset, [{timestamp, key, value, headers}]); raises on
    bad magic, CRC mismatch, or a compression codec we don't speak."""
    base_offset, batch_len = struct.unpack_from(">qi", buf, 0)
    body = buf[12:12 + batch_len]
    _epoch, magic, crc = struct.unpack_from(">ibI", body, 0)
    if magic != 2:
        raise ValueError(f"unsupported record batch magic {magic}")
    after_crc = body[9:]
    if crc32c(after_crc) != crc:
        raise ValueError("record batch CRC32C mismatch")
    (attributes, _last_delta, base_ts, _max_ts, _pid, _pepoch, _bseq,
     n_records) = struct.unpack_from(">hiqqqhii", after_crc, 0)
    if attributes & 0x7:
        raise ValueError("compressed batches not supported by this broker")
    i = 40  # size of the fixed post-CRC header above
    out = []
    for _ in range(n_records):
        rec_len, i = dec_varint(after_crc, i)
        end = i + rec_len
        i += 1  # record attributes
        ts_delta, i = dec_varint(after_crc, i)
        _off_delta, i = dec_varint(after_crc, i)
        klen, i = dec_varint(after_crc, i)
        key = None if klen < 0 else after_crc[i:i + klen]
        i += max(klen, 0)
        vlen, i = dec_varint(after_crc, i)
        value = None if vlen < 0 else after_crc[i:i + vlen]
        i += max(vlen, 0)
        n_headers, i = dec_varint(after_crc, i)
        headers = []
        for _ in range(n_headers):
            hklen, i = dec_varint(after_crc, i)
            hk = after_crc[i:i + hklen].decode()
            i += hklen
            hvlen, i = dec_varint(after_crc, i)
            hv = None if hvlen < 0 else after_crc[i:i + hvlen]
            i += max(hvlen, 0)
            headers.append((hk, hv))
        assert i == end, "record length mismatch"
        out.append({"timestamp": base_ts + ts_delta, "key": key,
                    "value": value, "headers": headers})
    return base_offset, out


# --- framing ---------------------------------------------------------

_recv_exact = recv_exact


def read_frame(conn: socket.socket) -> bytes:
    (size,) = struct.unpack(">i", _recv_exact(conn, 4))
    return _recv_exact(conn, size)


def send_frame(conn: socket.socket, payload: bytes) -> None:
    conn.sendall(struct.pack(">i", len(payload)) + payload)


def request(api_key: int, api_version: int, correlation_id: int,
            client_id: str, body: bytes) -> bytes:
    return (struct.pack(">hhi", api_key, api_version, correlation_id)
            + enc_str(client_id) + body)


# --- hermetic broker -------------------------------------------------

API_PRODUCE, API_FETCH, API_METADATA, API_VERSIONS = 0, 1, 3, 18


class KafkaWireBroker:
    """Single-node broker: ApiVersions v0, Metadata v0, Produce v3,
    Fetch v4 — enough for a full produce→consume roundtrip over the
    wire.

    Produced batches are retained in an in-memory log (base offsets
    rewritten to their assigned positions, CRC untouched — baseOffset
    is outside the checksum), so a consumer can Fetch them back.
    ``on_record(topic, partition, offset, ts_ms, key, value, headers)``
    optionally fires once per decoded record at produce time.
    """

    def __init__(self, on_record=None, topics: dict[str, int] | None = None):
        self.on_record = on_record
        self.topics = topics or {}  # name -> partition count
        self._offsets: dict[tuple[str, int], int] = {}
        # per-partition retained log: [(base_offset, batch_bytes)]
        self._log: dict[tuple[str, int], list[tuple[int, bytes]]] = {}
        self._lock = threading.Lock()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self) -> None:
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        try:
            while True:
                req = read_frame(conn)
                api_key, api_version, corr = struct.unpack_from(">hhi", req, 0)
                _client, i = dec_str(req, 8)
                body = req[i:]
                if api_key == API_VERSIONS:
                    apis = [(API_PRODUCE, 3), (API_FETCH, 4),
                            (API_METADATA, 0), (API_VERSIONS, 0)]
                    resp = struct.pack(">hi", 0, len(apis)) + b"".join(
                        struct.pack(">hhh", k, 0, v) for k, v in apis
                    )
                elif api_key == API_METADATA:
                    resp = self._metadata(body)
                elif api_key == API_PRODUCE:
                    resp = self._produce(body)
                elif api_key == API_FETCH:
                    resp = self._fetch(body)
                else:
                    raise ValueError(f"unsupported api_key {api_key}")
                send_frame(conn, struct.pack(">i", corr) + resp)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def _metadata(self, body: bytes) -> bytes:
        (n,) = struct.unpack_from(">i", body, 0)
        i = 4
        wanted = []
        for _ in range(max(n, 0)):
            t, i = dec_str(body, i)
            wanted.append(t)
        if n <= 0:
            wanted = list(self.topics)
        out = struct.pack(">i", 1)  # one broker: us
        out += struct.pack(">i", 0) + enc_str("127.0.0.1") + struct.pack(
            ">i", self.port)
        out += struct.pack(">i", len(wanted))
        for t in wanted:
            n_parts = self.topics.get(t)
            if n_parts is None:
                out += struct.pack(">h", 3) + enc_str(t) + struct.pack(">i", 0)
                continue
            out += struct.pack(">h", 0) + enc_str(t)
            out += struct.pack(">i", n_parts)
            for p in range(n_parts):
                # err=0, partition=p, leader=broker 0, replicas_count=1
                out += struct.pack(">hiii", 0, p, 0, 1)
                out += struct.pack(">i", 0)  # the sole replica's id (broker 0)
                out += struct.pack(">i", 0)  # isr_count=0 (empty isr array)
        return out

    def _produce(self, body: bytes) -> bytes:
        _txn, i = dec_str(body, i=0)
        _acks, _timeout = struct.unpack_from(">hi", body, i)
        i += 6
        (n_topics,) = struct.unpack_from(">i", body, i)
        i += 4
        resp_topics = b""
        for _ in range(n_topics):
            topic, i = dec_str(body, i)
            (n_parts,) = struct.unpack_from(">i", body, i)
            i += 4
            part_resps = b""
            for _ in range(n_parts):
                (partition,) = struct.unpack_from(">i", body, i)
                i += 4
                (set_len,) = struct.unpack_from(">i", body, i)
                i += 4
                record_set = body[i:i + set_len]
                i += set_len
                _base, records = parse_record_batch(record_set)
                with self._lock:
                    first = self._offsets.get((topic, partition), 0)
                    self._offsets[(topic, partition)] = first + len(records)
                    # retain for Fetch with the assigned base offset
                    # stamped in (bytes 0-7; not covered by the CRC)
                    self._log.setdefault((topic, partition), []).append(
                        (first, struct.pack(">q", first) + record_set[8:]))
                if self.on_record is not None:
                    for j, rec in enumerate(records):
                        self.on_record(topic, partition, first + j,
                                       rec["timestamp"], rec["key"],
                                       rec["value"], rec["headers"])
                # partition, error_code=0, base_offset, log_append_time
                part_resps += struct.pack(">ihqq", partition, 0, first, -1)
            resp_topics += enc_str(topic) + struct.pack(">i", n_parts) + part_resps
        return (struct.pack(">i", n_topics) + resp_topics
                + struct.pack(">i", 0))  # throttle_time_ms

    def _fetch(self, body: bytes) -> bytes:
        # Fetch v4: replica_id i32, max_wait i32, min_bytes i32,
        # max_bytes i32, isolation_level i8, [topics: name,
        # [partitions: partition i32, fetch_offset i64, max_bytes i32]]
        i = 4 + 4 + 4 + 4 + 1
        (n_topics,) = struct.unpack_from(">i", body, i)
        i += 4
        resp_topics = b""
        for _ in range(n_topics):
            topic, i = dec_str(body, i)
            (n_parts,) = struct.unpack_from(">i", body, i)
            i += 4
            part_resps = b""
            for _ in range(n_parts):
                partition, fetch_offset = struct.unpack_from(">iq", body, i)
                i += 12 + 4  # + partition_max_bytes (honored trivially)
                with self._lock:
                    hw = self._offsets.get((topic, partition), 0)
                    batches = [
                        raw for base, raw
                        in self._log.get((topic, partition), [])
                        if base >= fetch_offset
                    ]
                record_set = b"".join(batches)
                # partition, error=0, high_watermark,
                # last_stable_offset, aborted_txns (empty), records
                part_resps += struct.pack(">ihqq", partition, 0, hw, hw)
                part_resps += struct.pack(">i", 0)  # no aborted txns
                part_resps += struct.pack(">i", len(record_set)) + record_set
            resp_topics += enc_str(topic) + struct.pack(">i", n_parts) + part_resps
        return struct.pack(">i", 0) + struct.pack(">i", n_topics) + resp_topics

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class KafkaWireClient:
    """Shared connection plumbing: ApiVersions handshake + Metadata
    discovery over one socket, sequential correlated calls."""

    def __init__(self, host: str, port: int, client_id: str = "etl-gate"):
        self.client_id = client_id
        self._corr = 0
        self.sock = socket.create_connection((host, port), timeout=10)

    def _call(self, api_key: int, api_version: int, body: bytes) -> bytes:
        self._corr += 1
        send_frame(self.sock, request(api_key, api_version, self._corr,
                                      self.client_id, body))
        resp = read_frame(self.sock)
        (corr,) = struct.unpack_from(">i", resp, 0)
        assert corr == self._corr, "correlation id mismatch"
        return resp[4:]

    def api_versions(self) -> dict[int, tuple[int, int]]:
        resp = self._call(API_VERSIONS, 0, b"")
        err, n = struct.unpack_from(">hi", resp, 0)
        assert err == 0
        out = {}
        for j in range(n):
            k, lo, hi = struct.unpack_from(">hhh", resp, 6 + 6 * j)
            out[k] = (lo, hi)
        return out

    def metadata(self, topic: str) -> list[int]:
        """-> partition ids for ``topic`` (leader checks elided: one
        broker)."""
        resp = self._call(API_METADATA, 0,
                          struct.pack(">i", 1) + enc_str(topic))
        (n_brokers,) = struct.unpack_from(">i", resp, 0)
        i = 4
        for _ in range(n_brokers):
            i += 4
            _host, i = dec_str(resp, i)
            i += 4
        (n_topics,) = struct.unpack_from(">i", resp, i)
        i += 4
        parts: list[int] = []
        for _ in range(n_topics):
            (terr,) = struct.unpack_from(">h", resp, i)
            i += 2
            t, i = dec_str(resp, i)
            (n_parts,) = struct.unpack_from(">i", resp, i)
            i += 4
            for _ in range(n_parts):
                perr, pid, _leader, _n_rep = struct.unpack_from(">hiii", resp, i)
                i += 14
                (n_rep,) = struct.unpack_from(">i", resp, i - 4)
                i += 4 * n_rep
                (n_isr,) = struct.unpack_from(">i", resp, i)
                i += 4 + 4 * n_isr
                if t == topic and perr == 0:
                    parts.append(pid)
            assert terr == 0, f"topic error {terr}"
        return sorted(parts)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class KafkaWireProducer(KafkaWireClient):
    """Minimal producer: Produce v3 with acks=-1."""

    def produce(self, topic: str, partition: int,
                records: list[tuple[int, bytes | None, bytes | None,
                                    list[tuple[str, bytes]]]]) -> int:
        """-> broker-assigned base offset for the batch."""
        batch = build_record_batch(0, records)
        body = (enc_str(None) + struct.pack(">hi", -1, 30000)
                + struct.pack(">i", 1) + enc_str(topic)
                + struct.pack(">i", 1) + struct.pack(">i", partition)
                + struct.pack(">i", len(batch)) + batch)
        resp = self._call(API_PRODUCE, 3, body)
        (n_topics,) = struct.unpack_from(">i", resp, 0)
        assert n_topics == 1
        _t, i = dec_str(resp, 4)
        (n_parts,) = struct.unpack_from(">i", resp, i)
        i += 4
        part, err, base_offset, _lat = struct.unpack_from(">ihqq", resp, i)
        assert part == partition and err == 0, f"produce error {err}"
        return base_offset


class KafkaWireConsumer(KafkaWireClient):
    """Minimal consumer: Fetch v4 from an explicit offset.

    Simplification vs a real log: the hermetic broker returns only
    batches whose BASE offset is >= fetch_offset (batch-granular log
    with no mid-batch addressing) — exact for a from-zero drain, which
    is what the staging gate does.
    """

    def fetch(self, topic: str, partition: int, offset: int = 0
              ) -> tuple[int, list[dict]]:
        """-> (high_watermark, records[{offset, timestamp, key, value,
        headers}]) for everything at/after ``offset``."""
        body = (
            struct.pack(">iiii", -1, 500, 1, 1 << 24) + b"\x00"  # READ_UNCOMMITTED
            + struct.pack(">i", 1) + enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, 1 << 24)
        )
        resp = self._call(API_FETCH, 4, body)
        i = 4  # throttle_time_ms
        (n_topics,) = struct.unpack_from(">i", resp, i)
        i += 4
        assert n_topics == 1
        _t, i = dec_str(resp, i)
        (n_parts,) = struct.unpack_from(">i", resp, i)
        i += 4
        assert n_parts == 1
        part, err, hw, _lso = struct.unpack_from(">ihqq", resp, i)
        i += 22
        assert part == partition and err == 0, f"fetch error {err}"
        (n_aborted,) = struct.unpack_from(">i", resp, i)
        # aborted-txn entry = producer_id i64 + first_offset i64 = 16B
        i += 4 + 16 * max(n_aborted, 0)
        (set_len,) = struct.unpack_from(">i", resp, i)
        i += 4
        record_set = resp[i:i + set_len]
        out: list[dict] = []
        j = 0
        while j < len(record_set):
            (_base, batch_len) = struct.unpack_from(">qi", record_set, j)
            batch = record_set[j:j + 12 + batch_len]
            j += 12 + batch_len
            base, records = parse_record_batch(batch)  # CRC re-verified
            for k, rec in enumerate(records):
                out.append({"offset": base + k, **rec})
        return hw, out
