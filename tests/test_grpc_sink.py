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
