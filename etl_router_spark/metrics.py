"""Metrics: streaming progress -> the reference's Prometheus names.

The reference exports router counters via Prometheus
(``conveyor-etl-metrics/README.md``); we map Structured Streaming's
progress events onto the same metric names so dashboards carry over:

- ``conveyor_router_records_received_total``  <- numInputRows
- ``conveyor_router_records_delivered_total`` <- sink numOutputRows
- ``conveyor_router_checkpoints_saved_total`` <- completed batches
- ``conveyor_router_backpressure_events_total`` <- trigger backlogs
  (inputRowsPerSecond > processedRowsPerSecond)

Attach with ``spark.streams.addListener(MetricsListener())``; scrape
``MetricsListener.render_prometheus()`` or read ``counters`` directly.
"""

from __future__ import annotations

import threading
from collections import defaultdict

try:  # streaming listener base (present in pyspark>=3.4)
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


class MetricsListener(StreamingQueryListener):
    """Counts per (metric, pipeline=queryName) with Prometheus rendering."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))

    # -- StreamingQueryListener hooks ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or str(p.id)
        with self._lock:
            self.counters["conveyor_router_records_received_total"][name] += p.numInputRows or 0
            sink_rows = getattr(p.sink, "numOutputRows", None)
            if sink_rows and sink_rows > 0:
                self.counters["conveyor_router_records_delivered_total"][name] += sink_rows
            self.counters["conveyor_router_checkpoints_saved_total"][name] += 1
            in_rate = p.inputRowsPerSecond or 0.0
            out_rate = p.processedRowsPerSecond or 0.0
            if in_rate > out_rate > 0:
                self.counters["conveyor_router_backpressure_events_total"][name] += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- export --------------------------------------------------------
    def render_prometheus(self) -> str:
        lines: list[str] = []
        with self._lock:
            for metric in sorted(self.counters):
                lines.append(f"# TYPE {metric} counter")
                for label, value in sorted(self.counters[metric].items()):
                    lines.append(f'{metric}{{pipeline="{label}"}} {value:g}')
        return "\n".join(lines)
