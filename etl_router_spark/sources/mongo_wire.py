"""Minimal MongoDB wire-protocol codec, client, and hermetic server —
the S15 MongoDB source's wire-level gate
(``conveyor-etl-dsl/src/types.rs:366-374``), built the same way as the
Kafka/Pulsar/NATS/AMQP gates: the public protocol, from scratch, over
a localhost socket.

Everything here is public specification:

- BSON (bsonspec.org): the scalar subset a typed pipeline carries —
  double 0x01, string 0x02, document 0x03, array 0x04, bool 0x08,
  null 0x0A, int32 0x10, int64 0x12 — with the int32-length +
  elements + NUL document framing,
- the MongoDB wire protocol's OP_MSG (opCode 2013: standard message
  header, flagBits, kind-0 body section), which carries every modern
  command,
- the command surface a source connector actually exercises:
  ``hello``/``isMaster`` handshake, ``insert``, ``find`` with a
  filter subset (equality, ``$gt/$gte/$lt/$lte``, ``$in``, ``$mod``)
  + single-key sort + ``batchSize``, and ``getMore`` cursor paging.

The gate inserts fixture documents over the wire, reads them back
through a server-side filter with real cursor paging, drains to
staging jsonl, and re-enters Spark via ``source_type: mongodb`` +
``staging_path`` — so S15 moves from option-contract-only to a
value-checked produce→query→consume wire roundtrip. Production reads
still use the mongo-spark connector on clusters that carry the jar.
"""

from __future__ import annotations

import socket
import struct
import threading

from etl_router_spark.netio import recv_exact

# --- BSON (scalar subset) --------------------------------------------


def _enc_elem(name: str, v) -> bytes:
    key = name.encode() + b"\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode()
        return b"\x02" + key + struct.pack("<i", len(raw) + 1) + raw + b"\x00"
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    if v is None:
        return b"\x0a" + key
    if isinstance(v, dict):
        return b"\x03" + key + bson_encode(v)
    if isinstance(v, (list, tuple)):
        as_doc = {str(i): x for i, x in enumerate(v)}
        return b"\x04" + key + bson_encode(as_doc)
    raise TypeError(f"unsupported BSON value type: {type(v)!r}")


def bson_encode(doc: dict) -> bytes:
    body = b"".join(_enc_elem(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_elem(buf: bytes, i: int):
    t = buf[i]
    i += 1
    end = buf.index(b"\x00", i)
    name = buf[i:end].decode()
    i = end + 1
    if t == 0x01:
        return name, struct.unpack_from("<d", buf, i)[0], i + 8
    if t == 0x02:
        (n,) = struct.unpack_from("<i", buf, i)
        return name, buf[i + 4:i + 4 + n - 1].decode(), i + 4 + n
    if t in (0x03, 0x04):
        (n,) = struct.unpack_from("<i", buf, i)
        inner = bson_decode(buf[i:i + n])
        if t == 0x04:
            inner = [inner[str(j)] for j in range(len(inner))]
        return name, inner, i + n
    if t == 0x08:
        return name, buf[i] == 1, i + 1
    if t == 0x0A:
        return name, None, i
    if t == 0x10:
        return name, struct.unpack_from("<i", buf, i)[0], i + 4
    if t == 0x12:
        return name, struct.unpack_from("<q", buf, i)[0], i + 8
    raise ValueError(f"unsupported BSON type 0x{t:02x} for field {name!r}")


def bson_decode(buf: bytes) -> dict:
    (total,) = struct.unpack_from("<i", buf, 0)
    out: dict = {}
    i = 4
    while i < total - 1:
        name, value, i = _dec_elem(buf, i)
        out[name] = value
    return out


# --- OP_MSG framing --------------------------------------------------

OP_MSG = 2013


_recv_exact = recv_exact


def send_msg(conn: socket.socket, request_id: int, response_to: int,
             doc: dict) -> None:
    body = struct.pack("<I", 0) + b"\x00" + bson_encode(doc)  # flags, kind 0
    header = struct.pack("<iiii", 16 + len(body), request_id, response_to,
                         OP_MSG)
    conn.sendall(header + body)


def read_msg(conn: socket.socket) -> tuple[int, dict]:
    """-> (request_id, body document)."""
    length, request_id, _resp_to, op = struct.unpack("<iiii",
                                                     _recv_exact(conn, 16))
    payload = _recv_exact(conn, length - 16)
    if op != OP_MSG:
        raise ValueError(f"unsupported opCode {op} (only OP_MSG spoken)")
    # flagBits(4) + section kind byte; checksum not requested
    if payload[4] != 0:
        raise ValueError("only kind-0 body sections supported")
    return request_id, bson_decode(payload[5:])


# --- filter evaluation (the connector-relevant subset) ----------------

_OPS = {
    "$gt": lambda a, b: a is not None and a > b,
    "$gte": lambda a, b: a is not None and a >= b,
    "$lt": lambda a, b: a is not None and a < b,
    "$lte": lambda a, b: a is not None and a <= b,
    "$in": lambda a, b: a in b,
    "$mod": lambda a, b: a is not None and a % b[0] == b[1],
}


def match(doc: dict, flt: dict) -> bool:
    for field, cond in (flt or {}).items():
        got = doc.get(field)
        if isinstance(cond, dict):
            for op, arg in cond.items():
                fn = _OPS.get(op)
                if fn is None:
                    raise ValueError(f"unsupported filter operator {op!r}")
                if not fn(got, arg):
                    return False
        elif got != cond:
            return False
    return True


# --- hermetic server -------------------------------------------------


class MongoWireServer:
    """Single-node mongod stand-in: hello/isMaster, insert, find (+
    filter subset, single-key sort, batchSize), getMore cursors."""

    def __init__(self):
        self._data: dict[tuple[str, str], list[dict]] = {}
        self._cursors: dict[int, list[dict]] = {}  # id -> remaining docs
        self._next_cursor = 1000
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
                req_id, cmd = read_msg(conn)
                try:
                    reply = self._dispatch(cmd)
                except Exception as exc:  # noqa: BLE001 - surface as ok:0
                    # a command error must come back as an error reply,
                    # not a dead connection
                    reply = {"ok": 0.0, "errmsg": repr(exc), "code": 2}
                send_msg(conn, req_id + 1, req_id, reply)
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            conn.close()

    def _dispatch(self, cmd: dict) -> dict:
        name = next(iter(cmd))
        if name in ("hello", "isMaster", "ismaster"):
            return {"ok": 1.0, "isWritablePrimary": True,
                    "maxWireVersion": 17, "minWireVersion": 0,
                    "maxBsonObjectSize": 16 * 1024 * 1024}
        db = cmd.get("$db", "test")
        if name == "insert":
            docs = cmd.get("documents", [])
            with self._lock:
                self._data.setdefault((db, cmd["insert"]), []).extend(docs)
            return {"ok": 1.0, "n": len(docs)}
        if name == "find":
            coll = cmd["find"]
            with self._lock:
                rows = [d for d in self._data.get((db, coll), [])
                        if match(d, cmd.get("filter"))]
            for field, direction in (cmd.get("sort") or {}).items():
                # null/missing sorts lowest (MongoDB's ordering) and a
                # missing field must not TypeError against typed values
                rows.sort(
                    key=lambda d: (d.get(field) is not None, d.get(field)),
                    reverse=direction < 0,
                )
            return self._page(rows, f"{db}.{coll}",
                              int(cmd.get("batchSize", 101)), first=True)
        if name == "getMore":
            with self._lock:
                rows = self._cursors.pop(cmd["getMore"], [])
            ns = f"{db}.{cmd['collection']}"
            return self._page(rows, ns, int(cmd.get("batchSize", 101)),
                              first=False)
        return {"ok": 0.0, "errmsg": f"no such command: {name!r}",
                "code": 59}

    def _page(self, rows: list[dict], ns: str, batch_size: int,
              first: bool) -> dict:
        batch, rest = rows[:batch_size], rows[batch_size:]
        if rest:
            with self._lock:
                cid = self._next_cursor
                self._next_cursor += 1
                self._cursors[cid] = rest
        else:
            cid = 0
        key = "firstBatch" if first else "nextBatch"
        return {"ok": 1.0,
                "cursor": {"id": cid, "ns": ns, key: batch}}

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class MongoWireClient:
    """One connection, sequential correlated commands."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port), timeout=10)
        self._req = 0

    def command(self, doc: dict) -> dict:
        self._req += 1
        send_msg(self.sock, self._req, 0, doc)
        _rid, resp = read_msg(self.sock)
        if resp.get("ok") != 1.0:
            raise RuntimeError(f"command failed: {resp!r}")
        return resp

    def hello(self) -> dict:
        return self.command({"hello": 1, "$db": "admin"})

    def insert(self, db: str, coll: str, docs: list[dict]) -> int:
        return int(self.command(
            {"insert": coll, "$db": db, "documents": list(docs)})["n"])

    def find_all(self, db: str, coll: str, flt: dict | None = None,
                 sort: dict | None = None, batch_size: int = 101
                 ) -> list[dict]:
        cmd: dict = {"find": coll, "$db": db, "batchSize": batch_size}
        if flt:
            cmd["filter"] = flt
        if sort:
            cmd["sort"] = sort
        resp = self.command(cmd)["cursor"]
        out = list(resp["firstBatch"])
        while resp["id"]:
            resp = self.command({
                "getMore": resp["id"], "collection": coll, "$db": db,
                "batchSize": batch_size,
            })["cursor"]
            out.extend(resp["nextBatch"])
        return out

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
