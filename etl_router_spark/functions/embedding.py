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

    # scale bound once per row (r15, the shingles() trap): captured as
    # an EXPRESSION in the per-element lambda, the interpreter re-ran
    # the max|x| aggregate once per component — O(dim^2) per vector
    def _q(s: Column) -> Column:
        return F.when(s == F.lit(0.0), F.transform(vec, lambda x: F.lit(0))).otherwise(
            F.transform(vec, lambda x: F.floor(x.cast("double") / s + F.lit(0.5)).cast("int"))
        )

    q = F.transform(F.array(scale), _q)[0]
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


def pca_train(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    center: bool = True,
) -> dict:
    """Train a PCA projection over an embedding column; returns
    ``{"mean", "components" (k x d), "explained_variance"}`` as plain
    Python lists for ``pca_project``.

    Plan (the only scale-safe PCA formulation for tall-skinny data):
    one Arrow-batched pass computes per-partition partials
    ``(n, sum, X^T X)`` — d + d^2 doubles per PARTITION, never per row
    — which reduce DISTRIBUTED via a (position, value) explode +
    groupBy-sum, so the driver receives exactly d^2 + d scalars plus a
    count regardless of corpus size. The d x d eigendecomposition then
    runs driver-side (d is embedding width, ~10^2 — the same
    metadata-class scalar traffic as IVF centroid training in
    ``similarity.py``). Eigenvector sign is fixed (largest-|.|
    coordinate positive) so retraining is deterministic.

    Like ``train_ivf_centroids``, training is pytest-verified by
    invariants (orthonormality, variance ordering, projection variance
    == eigenvalue); the projection itself is oracle-gated with pinned
    components (``embedding_pca_project``).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pca_train: empty input")
    d = len(first[0])
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    parts = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, g array<double>").persist()
    try:
        n_total = parts.agg(F.sum("n")).collect()[0][0] or 0
        if n_total < 2:
            raise ValueError("pca_train needs at least 2 vectors")
        # element-wise reduction stays distributed; the driver only
        # collects the d + d^2 reduced cells
        s_rows = (parts.select(F.posexplode("s").alias("pos", "v"))
                  .groupBy("pos").agg(F.sum("v").alias("v")).collect())
        g_rows = (parts.select(F.posexplode("g").alias("pos", "v"))
                  .groupBy("pos").agg(F.sum("v").alias("v")).collect())
    finally:
        parts.unpersist()
    s = np.zeros(d)
    for r in s_rows:
        s[r["pos"]] = r["v"]
    g = np.zeros(d * d)
    for r in g_rows:
        g[r["pos"]] = r["v"]
    g = g.reshape(d, d)
    mean = s / n_total if center else np.zeros(d)
    cov = (g - n_total * np.outer(mean, mean)) / (n_total - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    components = []
    variance = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:  # deterministic sign
            v = -v
        components.append(v.tolist())
        variance.append(float(max(evals[idx], 0.0)))
    return {"mean": mean.tolist(), "components": components,
            "explained_variance": variance}


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float] | None = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto ``components`` (k x d): per output dim
    one ``zip_with`` product + sequential ``aggregate`` fold — pure
    JVM higher-order functions, zero Python, no shuffle, and the
    left-to-right fold order is IEEE-reproducible cross-engine (same
    discipline as ``l2_normalize``)."""
    vec = F.col(vec_col)
    if mean is not None:
        marr = F.array(*[F.lit(float(m)) for m in mean])
        src = F.zip_with(vec, marr, lambda x, m: x.cast("double") - m)
    else:
        src = F.transform(vec, lambda x: x.cast("double"))

    # the (centered) double vector is bound once per row (r15): as a
    # captured expression each of the k component dots re-centered the
    # whole vector — k*d extra subtractions/casts per row; per-element
    # arithmetic and fold order are unchanged, so values are identical
    def _outs(v: Column) -> Column:
        return F.array(*[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(c)) for c in comp]),
                           lambda x, c: x * c),
                F.lit(0.0), lambda a, x: a + x)
            for comp in components
        ])

    return df.withColumn(out_col, F.transform(F.array(src), _outs)[0])
