"""Source connectors: source_type -> Spark reader."""

from etl_router_spark.sources.registry import read_source, SOURCE_REGISTRY  # noqa: F401
