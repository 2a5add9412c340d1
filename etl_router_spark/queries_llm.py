"""Correctness-gate queries for the large-scale data-pipeline operators
(dedup / similarity / text analysis / multimodal). Batch 2 — filled in
alongside ``etl_router_spark.queries``."""

from __future__ import annotations

from etl_router_spark.queries import query  # noqa: F401
