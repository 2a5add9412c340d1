"""Embedding-column preprocessing operators: L2 normalization and
symmetric int8 quantization.

The two transforms every embedding pipeline runs before ANN indexing /
shipping vectors to a feature store: normalize so cosine == dot
product (what `similarity.py` assumes for its GEMM kernels), and
quantize to int8 to cut storage and shuffle volume 4x.

Everything is built-in higher-order Column functions (``transform`` /
``aggregate``) — JVM-side, zero Python in the hot path, no shuffle:
both operators are pure per-row maps that scale embarrassingly.

All arithmetic is double precision in a deterministic fold order
(IEEE-exact across engines), so the gates' DuckDB oracles match
value-for-value without tolerance windows.

Reference scope note: the reference engine has no vector operators
(`conveyor-etl-dsl/src/types.rs:389-408` is the full transform set);
this is part of the training-data surface built on top of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm2(vec: Column) -> Column:
    """Sum of squares in double, sequential left-to-right fold (the
    order DuckDB's ``list_reduce`` uses — IEEE-identical results)."""
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def l2_normalize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_norm",
    norm_col: str = "l2_norm",
) -> DataFrame:
    """Scale each vector to unit L2 norm (zero vectors pass through
    unchanged rather than dividing by zero). Adds ``norm_col`` with the
    pre-normalization norm. Per-row map — no shuffle."""
    vec = F.col(vec_col)
    norm = F.sqrt(_norm2(vec))
    unit = F.when(norm == 0.0, vec.cast("array<double>")).otherwise(
        F.transform(vec, lambda x: x.cast("double") / norm)
    )
    return df.withColumn(norm_col, norm).withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = floor(x_i / scale + 0.5)`` (round-half-up, engine-portable
    — unlike ``round``, whose half-way rule differs across engines).
    Zero vectors quantize to all-zero with scale 0. Dequantize with
    ``q_i * scale``. Per-row map — no shuffle; int8 range is exact by
    construction (|x| <= max|x| => |q| <= 127)."""
    vec = F.col(vec_col)
    max_abs = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = max_abs / F.lit(127.0)
    q = F.when(scale == 0.0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(vec, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"))
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    out_col: str = "embedding_deq",
) -> DataFrame:
    """Inverse of :func:`quantize_int8`: ``x_i ~= q_i * scale``."""
    scale = F.col(scale_col)
    return df.withColumn(
        out_col, F.transform(F.col(q_col), lambda q: q.cast("double") * scale)
    )


def mean_pool(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "embedding_mean",
    component_round: int | None = None,
) -> DataFrame:
    """Mean-pool vectors per group — the standard chunk->document (or
    document->domain-centroid) embedding aggregation.

    Plan: posexplode to (group, position, value), ONE aggregation
    keyed on (group, position) with map-side partial sums, then the
    per-group re-collect orders components by position — vectors
    re-assemble exactly, no assumption that all rows of a group land
    on one task and no vector-width-sized state in any single
    aggregation buffer. ``component_round`` rounds each component
    (cross-engine FP determinism for oracle checks).

    At 100 TB this is THE safe formulation: the (group, position)
    key space is |groups| * dim, each cell a running (sum, count) —
    skew-free even when one group holds millions of chunks.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("__pos", "__v")
    )
    per_pos = exploded.groupBy(group_col, "__pos").agg(
        F.avg("__v").alias("__mean")
    )
    if component_round is not None:
        per_pos = per_pos.withColumn("__mean", F.round("__mean", component_round))
    return (
        per_pos.groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__mean"))),
                lambda x: x["__mean"],
            ).alias(out_col),
            F.count("*").alias("__dim"),
        )
        .drop("__dim")
    )
