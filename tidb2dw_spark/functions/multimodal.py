"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode kernels* are
deterministic fakes behind ``FAKE_DECODERS`` (clearly marked; swap in
PIL/librosa/av in production).  Everything Spark-side is real and tested:
the typed schema, Arrow-batched ``mapInPandas`` plumbing, batch shapes,
and the partitioning story.

Scale notes: media blobs dominate row size, so ops repartition by a
row-count target (not bytes-default splits) before ``mapInPandas`` to
bound executor memory per Arrow batch; feature outputs drop the blob
column as early as possible (project-away before any shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata accompanying every media blob
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpg|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_image_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector (stands in for a real CNN/CLIP
    encoder; real decode would raise NotImplementedError without codecs)."""
    if blob is None:
        return None
    acc = [0] * dim
    for i, byte in enumerate(blob):
        acc[i % dim] = (acc[i % dim] + byte) % 255
    return [float(x) / 255.0 for x in acc]


FAKE_DECODERS = {"image": _fake_image_features}


def real_decode(blob: bytes, media_type: str):
    """The production decode kernel — requires codec libraries that are not
    in this container."""
    raise NotImplementedError(
        f"no codec for {media_type}: install PIL/librosa/av and register in FAKE_DECODERS"
    )


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: derive a deterministic binary 'media' column + typed
    metadata from a text column (UTF-8 bytes stand in for real blobs)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.octet_length(blob).cast("int").alias("width"),
        F.lit(1).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", blob).withColumn("media_meta", meta)


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    dim: int = 8,
    rows_per_batch: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media via mapInPandas.

    The iterator signature processes one Arrow batch at a time, so peak
    executor memory is bounded by rows_per_batch × blob size regardless of
    partition size."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = FAKE_DECODERS["image"]
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(lambda b: 0 if b is None else len(b)),
                    "mean_byte": blobs.map(
                        lambda b: None if not b else sum(b) / len(b)
                    ),
                    "feature": blobs.map(lambda b: decoder(b, dim)),
                }
            )

    # rows_per_batch maps to spark.sql.execution.arrow.maxRecordsPerBatch;
    # set session-wide since mapInPandas has no per-op knob
    return pruned.mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)
