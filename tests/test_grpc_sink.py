"""gRPC sink wire tests: retry/backoff against a failing endpoint and
delivery-guarantee behavior (types.rs:703-759 retry config)."""

from __future__ import annotations

import threading

import pytest


def _receiver(fail_first=0):
    from etl_router_spark.sinks.grpc_client import GrpcLinesReceiver

    lock = threading.Lock()
    received: list[bytes] = []

    def on_payload(data: bytes) -> None:
        with lock:
            received.append(data)

    rx = GrpcLinesReceiver(on_payload, b"/conveyor.etl.Ingest/Push",
                           fail_first=fail_first)
    return rx, received


def _df(spark):
    return spark.createDataFrame(
        [(i, f"u{i}") for i in range(40)], "id int, name string"
    ).coalesce(1)


def test_sink_retries_through_transient_unavailable(spark):
    from etl_router_spark.sinks.registry import write_sink

    rx, received = _receiver(fail_first=2)
    try:
        write_sink(_df(spark), {
            "sink_type": "grpc", "endpoint": f"127.0.0.1:{rx.port}",
            "batch_size": 1000,
            "retry": {"max_retries": 3, "initial_backoff_ms": 5},
        })
        # 2 UNAVAILABLE rejections + 1 success = 3 calls, 1 delivery
        assert rx.calls == 3
        assert len(received) == 1
        assert received[0].count(b"\n") == 39  # all 40 rows in the batch
    finally:
        rx.close()


def test_sink_exhausted_retries_fail_the_task(spark):
    from py4j.protocol import Py4JJavaError

    from etl_router_spark.sinks.registry import write_sink

    rx, received = _receiver(fail_first=100)
    try:
        with pytest.raises(Py4JJavaError):
            write_sink(_df(spark), {
                "sink_type": "grpc", "endpoint": f"127.0.0.1:{rx.port}",
                "batch_size": 1000,
                "retry": {"max_retries": 1, "initial_backoff_ms": 5},
            })
        assert not received  # nothing delivered
    finally:
        rx.close()


def test_client_unary_calls_share_connection(spark):
    from etl_router_spark.sinks.grpc_client import GrpcLinesClient

    rx, received = _receiver()
    try:
        cli = GrpcLinesClient("127.0.0.1", rx.port, "/conveyor.etl.Ingest/Push")
        cli.call(b"one")
        cli.call(b"two")  # stream 3 on the same connection
        cli.close()
        assert received == [b"one", b"two"]
        assert cli.next_stream == 5
    finally:
        rx.close()


def test_large_payload_respects_flow_control():
    """A call far beyond the 65535-byte initial window completes
    against the hermetic receiver (which replenishes via
    WINDOW_UPDATE) and arrives byte-identical — the old client would
    have blasted past the peer's advertised window."""
    from etl_router_spark.sinks.grpc_client import GrpcLinesClient

    rx, received = _receiver()
    try:
        big = b"x" * 300_000
        cli = GrpcLinesClient("127.0.0.1", rx.port, "/conveyor.etl.Ingest/Push")
        cli.call(big)
        cli.call(b"after")  # connection window stays coherent across calls
        cli.close()
        assert received == [big, b"after"]
    finally:
        rx.close()


def test_client_stalls_at_window_until_update():
    """Deadlock-avoidance proof: against a server that withholds
    WINDOW_UPDATE, the client sends EXACTLY the advertised 65535 bytes
    of DATA and then blocks reading frames; the moment the server
    grants more window the remainder flows. This is the §5.2 send-side
    enforcement the old implementation documented but did not have."""
    import socket
    import struct
    import time

    from etl_router_spark.netio import recv_exact
    from etl_router_spark.sinks.grpc_client import (
        H2_PREFACE, GrpcLinesClient, h2_frame, hpack_literal,
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    state = {"before_update": 0, "total": 0, "err": None}
    done = threading.Event()

    def read_frame(conn):
        hdr = recv_exact(conn, 9)
        size = struct.unpack(">I", b"\x00" + hdr[:3])[0]
        stream = struct.unpack(">I", hdr[5:9])[0] & 0x7FFFFFFF
        return hdr[3], hdr[4], stream, recv_exact(conn, size)

    def serve():
        try:
            conn, _ = srv.accept()
            conn.settimeout(5)
            assert recv_exact(conn, len(H2_PREFACE)) == H2_PREFACE
            conn.sendall(h2_frame(4, 0, 0, b""))  # empty SETTINGS
            data_stream = None
            # phase 1: read until the client exhausts the 65535 window;
            # it must then go quiet (timeout on our read = it blocked)
            conn.settimeout(0.8)
            while True:
                try:
                    ftype, flags, stream, payload = read_frame(conn)
                except socket.timeout:
                    break  # client stalled — correct behavior
                if ftype == 0:
                    state["before_update"] += len(payload)
                    data_stream = stream
                if state["before_update"] > 65535:
                    break  # overran the window — fail below
            assert state["before_update"] == 65535, state["before_update"]
            state["total"] = state["before_update"]
            # phase 2: grant more window; the remainder must arrive
            conn.settimeout(5)
            inc = struct.pack(">I", 1 << 20)
            conn.sendall(h2_frame(8, 0, 0, inc))
            conn.sendall(h2_frame(8, 0, data_stream, inc))
            end = False
            while not end:
                ftype, flags, stream, payload = read_frame(conn)
                if ftype == 0:
                    state["total"] += len(payload)
                    end = bool(flags & 1)
            conn.sendall(h2_frame(1, 0x4, data_stream,
                                  hpack_literal(b":status", b"200")))
            conn.sendall(h2_frame(1, 0x5, data_stream,
                                  hpack_literal(b"grpc-status", b"0")))
            time.sleep(0.1)
            conn.close()
        except Exception as exc:  # surfaces in the main thread's assert
            state["err"] = exc
        finally:
            done.set()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    payload = b"y" * 200_000
    cli = GrpcLinesClient("127.0.0.1", port, "/svc/M", timeout_s=10.0)
    cli.call(payload)
    cli.close()
    srv.close()
    assert done.wait(10) and state["err"] is None, state["err"]
    # 65535 before the grant, full gRPC frame (5B prefix + protobuf
    # wrapping + payload) in total
    assert state["before_update"] == 65535
    assert state["total"] > 200_000
