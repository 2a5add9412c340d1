"""etl_router_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL control plane (``alexchoi0/etl-router``, a Rust/gRPC/Raft
pipeline router), re-expressed Spark-first:

- declarative YAML pipeline manifests (both reference dialects) compile to
  DataFrame / Structured Streaming plans (``etl_router_spark.compile``);
- every declared transform of the reference DSL
  (``crates/conveyor-etl-dsl/src/types.rs:389-697``) is a real Spark
  DataFrame operation;
- sources/sinks map onto Spark readers/writers
  (``etl_router_spark.sources`` / ``.sinks``);
- the routing-engine semantics (conditional edges, broadcast routing,
  DLQ side-outputs, watermarks) become Catalyst-optimizable plans;
- plus first-class large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) in
  ``etl_router_spark.functions``.

Catalyst provides predicate pushdown / column pruning / join selection;
this package only adds what Spark does not: the manifest front-end, the
condition->Column compiler with the reference's two-valued null semantics,
the shared-prefix multi-sink optimizer, and the data-pipeline operator
library.
"""

from etl_router_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
