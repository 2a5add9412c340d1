"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the layout a 100 TB multimodal training pipeline uses so that
Spark shuffles bytes without interpreting them and prunes metadata
columns independently of payloads.

The Spark-side machinery here (schemas, batch iteration via
``mapInPandas``, Arrow transfer, partition discipline) is real and
tested. The *decoders* (JPEG decode, audio resample, video frame
sampling) need native libs not present in this container, so the decode
step is stubbed: ``decoder="fake"`` produces deterministic
pseudo-features derived from the bytes (testable end-to-end), while
``decoder="real"`` raises NotImplementedError at the exact seam where
PIL/torchaudio/pyav would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),        # jpeg|png|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_digest", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture: derive a deterministic binary payload + metadata
    struct from a text column (the container has no real media files)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.select(F.col(id_col), payload.alias("media"), meta.alias("media_meta"))


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic pseudo-embedding: bytes of sha256 scaled to [0,1)."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 256.0 for i in range(n)]


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: str = "fake",
    feature_dim: int = 8,
    batch_size: int = 256,
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    Arrow streams ``batch_size``-row pandas batches through Python —
    the payload bytes stay off the JVM heap per-batch; partition count
    (not driver memory) bounds parallelism. This is the designated
    slow path: everything around it (filtering, metadata pruning,
    joins) happens before so only surviving rows pay the Python tax.
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # seam for PIL.Image.open / torchaudio.load / av.open —
                # native decoders are not available in this container
                raise NotImplementedError(
                    "real media decoding requires PIL/torchaudio/pyav; "
                    "install them on the cluster image and implement here"
                )
            out = pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[media_col].map(len).astype("int64"),
                "content_digest": pdf[media_col].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "feature": pdf[media_col].map(lambda b: _fake_features(bytes(b), feature_dim)),
            })
            yield out

    narrowed = df.select(id_col, media_col)  # column-prune before Python
    return narrowed.mapInPandas(process, schema=FEATURE_SCHEMA)
