"""The canonical record envelope (SURVEY §1.5; ``proto/common.proto:15-23``).

The reference's fundamental unit is a schema-light envelope record:
id fields + record_type + key + opaque payload + string metadata map +
event/ingestion times. Our engine's fast path is **typed columns**
(payload fields promoted to top-level, columnar, prunable); the envelope
exists as a real schema for wire-compatible ingestion (Kafka topics
carrying envelope JSON), with promote/demote helpers so pipelines can
enter and leave envelope form at the edges and stay columnar in the
middle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# common.proto:8-23 — RecordId flattened, payload kept as JSON string
ENVELOPE_SCHEMA = T.StructType([
    T.StructField("source_id", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("sequence_number", T.LongType()),
    T.StructField("idempotency_key", T.StringType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("key", T.BinaryType()),
    T.StructField("payload", T.StringType()),          # JSON body
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    T.StructField("event_time", T.TimestampType()),
    T.StructField("ingestion_time", T.TimestampType()),
])

ENVELOPE_COLUMNS = tuple(f.name for f in ENVELOPE_SCHEMA.fields)


def wrap(
    df: DataFrame,
    record_type: str,
    source_id: str = "",
    key_field: str | None = None,
    event_time_field: str | None = None,
    metadata_fields: list[str] | None = None,
    idempotency_field: str | None = None,
) -> DataFrame:
    """Typed rows -> envelope records.

    Payload = all columns serialized to JSON; ``metadata_fields`` are
    additionally copied into the string map (predicate surface);
    sequence_number is per-partition monotonic (RecordId semantics).

    ``partition`` / ``sequence_number`` derive from the PHYSICAL
    layout at wrap time: the per-partition-monotonic contract always
    holds, but the concrete values are not stable across runs or
    session configs (AQE partition coalescing — including on cached
    upstream frames — re-draws the layout). Key rows by
    ``idempotency_key`` / ``key``, never by these two fields.
    """
    data_cols = list(df.columns)
    meta = metadata_fields or []
    m = (
        F.map_from_arrays(
            F.array(*[F.lit(f) for f in meta]),
            F.array(*[F.col(f).cast("string") for f in meta]),
        )
        if meta
        else F.lit(None).cast(ENVELOPE_SCHEMA["metadata"].dataType)
    )
    return df.select(
        F.lit(source_id).alias("source_id"),
        F.spark_partition_id().alias("partition"),
        (F.monotonically_increasing_id() % F.lit(2 ** 40)).alias("sequence_number"),
        (F.col(idempotency_field).cast("string") if idempotency_field
         else F.sha2(F.to_json(F.struct(*data_cols)), 256)).alias("idempotency_key"),
        F.lit(record_type).alias("record_type"),
        (F.col(key_field).cast("string").cast("binary") if key_field
         else F.lit(None).cast("binary")).alias("key"),
        F.to_json(F.struct(*data_cols)).alias("payload"),
        m.alias("metadata"),
        (F.col(event_time_field) if event_time_field
         else F.current_timestamp()).alias("event_time"),
        F.current_timestamp().alias("ingestion_time"),
    )


def promote(df: DataFrame, payload_schema: T.StructType | str,
            keep_envelope: bool = True) -> DataFrame:
    """Envelope -> typed columns (the §7.1 typed-payload fast path).

    ``from_json`` parses the payload once; fields become top-level
    columns Catalyst can prune and push down. ``keep_envelope`` retains
    the reserved columns (record_type, metadata, event_time, ...) next
    to the data columns; payload itself is dropped either way.
    """
    parsed = df.withColumn("__p", F.from_json("payload", payload_schema))
    data = [F.col(f"__p.{f}").alias(f) for f in parsed.select("__p.*").columns]
    if keep_envelope:
        env = [F.col(c) for c in df.columns if c != "payload"]
        return parsed.select(*env, *data)
    return parsed.select(*data)


def demote(df: DataFrame, data_fields: list[str]) -> DataFrame:
    """Typed columns -> envelope form (re-serialize the payload)."""
    env = [c for c in df.columns if c in ENVELOPE_COLUMNS and c != "payload"]
    return df.select(
        *env, F.to_json(F.struct(*data_fields)).alias("payload")
    ).select(*[c for c in ENVELOPE_COLUMNS if c in env or c == "payload"])


def from_kafka(df: DataFrame, record_type: str | None = None,
               source_id: str | None = None) -> DataFrame:
    """Kafka wire shape -> envelope records.

    Input is the Kafka source's fixed schema (key/value binary, topic,
    partition, offset, timestamp, headers). Mapping mirrors how the
    reference fills RecordId from the consumer position
    (``common.proto:8-13``): offset -> sequence_number,
    topic:partition:offset -> idempotency_key (exactly the replay-safe
    dedup key), headers -> the string metadata map, Kafka timestamp ->
    event_time. Compose with ``promote(...)`` to reach typed columns.
    """
    has_headers = "headers" in df.columns
    meta = (
        F.map_from_entries(
            F.transform("headers", lambda h: F.struct(
                h["key"].alias("key"), h["value"].cast("string").alias("value")))
        )
        if has_headers
        else F.lit(None).cast(ENVELOPE_SCHEMA["metadata"].dataType)
    )
    return df.select(
        (F.lit(source_id) if source_id is not None else F.col("topic")).alias("source_id"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("sequence_number"),
        F.concat_ws(":", "topic", "partition", "offset").alias("idempotency_key"),
        (F.lit(record_type) if record_type is not None else F.col("topic")).alias("record_type"),
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("string").alias("payload"),
        meta.alias("metadata"),
        F.col("timestamp").alias("event_time"),
        F.current_timestamp().alias("ingestion_time"),
    )
