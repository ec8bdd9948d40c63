"""Multimodal column plumbing (SURVEY.md §2.7).

Images/audio/video are opaque `binary` columns with typed metadata structs.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partition sizing — is real and tested; the actual media decoding is stubbed
(the container ships no image/audio libraries) behind deterministic fakes /
NotImplementedError, clearly marked below.

At 100 TB the pattern is: keep blobs in their own parquet column (column
pruning means metadata-only queries never read them), process with
mapInPandas (Arrow-batched, bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch), and never collect blobs to
the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image / audio / video
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),  # md5 hex
    ]
)

FEATURE_DIM = 8

_FEATURES_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a blob+metadata table from documents (deterministic fake media:
    the utf-8 bytes of the text stand in for an encoded image).

    Pure builtins: encode -> binary, md5, octet length — so this step has an
    exact DuckDB oracle even though real decode is stubbed.
    """
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        blob.alias("blob"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "image")
            .when(F.col(id_col) % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("content_hash"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> object:
    """STUB — real image decoding needs PIL/opencv, not in this container."""
    raise NotImplementedError("image decode requires an imaging library (PIL/cv2)")


def _fake_feature(blob: bytes) -> list[float]:
    """Deterministic fake 'decoded feature': strided byte sums / length.
    Stands in for a real decode->resize->embed step; numpy-vectorized over
    the blob so the Python-side cost is O(rows) calls, not O(bytes) loops.

    Rounding is floor(x*1e6 + 0.5)/1e6 — NOT Python round() — because
    banker's rounding differs from DuckDB's half-away round(); this exact
    floor form is mirrored in the oracle SQL, making the feature values
    bit-identical cross-engine."""
    import math

    import numpy as np

    if blob is None or len(blob) == 0:
        return [0.0] * FEATURE_DIM
    a = np.frombuffer(blob, dtype=np.uint8)
    n = len(a)
    pad = (-n) % FEATURE_DIM
    sums = np.pad(a, (0, pad)).reshape(-1, FEATURE_DIM).sum(axis=0, dtype=np.int64)
    return [math.floor((int(s) / n) * 1e6 + 0.5) / 1e6 for s in sums.tolist()]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over blob batches (Arrow transfer).

    The real pipeline would decode / frame-sample / resize here; the stub
    keeps the exact same batch shape and output schema.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [_fake_feature(b) for b in pdf["blob"]],
                }
            )

    return media.mapInPandas(batches, schema=_FEATURES_OUT_SCHEMA)


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — reads zero blob bytes thanks to column pruning
    (verify with .explain: ReadSchema excludes `blob`)."""
    return (
        media.select("doc_id", "meta.media_type", "meta.n_bytes")
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )
