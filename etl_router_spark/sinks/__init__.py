"""Sink connectors and the DLQ side-output writer."""

from etl_router_spark.sinks.registry import write_sink  # noqa: F401
from etl_router_spark.sinks.dlq import to_dlq, DLQ_COLUMNS  # noqa: F401
