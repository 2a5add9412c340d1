"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's stateful transforms that Spark's built-in operators
can't express (rate limiting with admitted-count state,
``types.rs:585-601``) become Arrow-batched grouped-state functions:
state lives in the executor's state store keyed by group, rows flow
through pandas — the Spark analog of the reference's external
``TransformService.ProcessStream`` shape (``proto/transform.proto``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout


def streaming_ratelimit(
    df: DataFrame,
    key_fields: list[str],
    max_rate: int,
    window_duration: str = "1 hour",
    ts_field: str = "event_time",
    on_exceed: str = "drop",
    tiebreak_fields: list[str] | None = None,
    tag_field: str = "rate_limited",
) -> DataFrame:
    """Admit at most ``max_rate`` rows per (key, tumbling window).

    State = rows admitted so far per group; groups are
    ``(key_fields..., window(ts))`` so state is naturally scoped to a
    window and bounded by (#keys x #active windows). Within a batch,
    rows are admitted in (ts, tiebreak) order for determinism.

    on_exceed: ``drop`` removes excess rows, ``tag`` marks them.
    ``delay`` is source-side pacing (maxOffsetsPerTrigger /
    maxFilesPerTrigger), not a row-level operation (SURVEY §7.4).
    """
    if on_exceed not in ("drop", "tag"):
        raise ValueError(f"streaming ratelimit supports drop|tag, got {on_exceed!r}")
    from etl_router_spark.model.parser import duration_to_interval

    sort_cols = [ts_field, *(tiebreak_fields or [])]
    out_fields = list(df.schema.fields)
    if on_exceed == "tag":
        out_fields = out_fields + [T.StructField(tag_field, T.BooleanType())]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("admitted", T.LongType())])

    out_cols = [f.name for f in out_fields]

    def limit_group(key, pdfs, state):
        (admitted,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
            n = len(pdf)
            if on_exceed == "drop":
                take = max(0, max_rate - admitted)
                out = pdf.iloc[:take]
            else:
                flags = pd.Series(range(admitted, admitted + n), index=pdf.index) >= max_rate
                out = pdf.assign(**{tag_field: flags})
            admitted += n
            if len(out):
                yield out[out_cols]
        state.update((admitted,))

    # the window must be a materialized column — grouping expressions
    # are not resolvable inside FlatMapGroupsInPandasWithState
    windowed = df.withColumn(
        "__window", F.window(F.col(ts_field), duration_to_interval(window_duration))
    )
    grouped = windowed.groupBy(*key_fields, "__window")
    return grouped.applyInPandasWithState(
        limit_group, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
