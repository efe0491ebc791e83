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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize plumbing: blob in → blob out with updated dimensions.

    The fake kernel truncates/pads the byte stream to ``target_w*target_h``
    deterministically (a real kernel would decode, resample with PIL/cv2 and
    re-encode — see :func:`real_decode`).  Blob-in/blob-out keeps the operator
    composable: output feeds :func:`extract_image_features` unchanged."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))
    n = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def kernel(b):
            if b is None:
                return None
            b = bytes(b)
            return b[:n] if len(b) >= n else b + b"\x00" * (n - len(b))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": pdf["media"].map(kernel),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return pruned.mapInPandas(resize, schema=RESIZED_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), False),
        T.StructField("energy", T.ArrayType(T.DoubleType()), True),
    ]
)


def extract_audio_features(
    df: DataFrame,
    window_bytes: int = 256,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Windowed-energy audio features (fake kernel: mean |byte| per fixed
    window — a real one would decode PCM and compute RMS/mel frames)."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def kernel(b):
            if b is None:
                return None
            b = bytes(b)
            return [
                sum(b[i : i + window_bytes]) / max(len(b[i : i + window_bytes]), 1)
                for i in range(0, len(b), window_bytes)
            ]

        for pdf in batches:
            energies = pdf["media"].map(kernel)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_windows": energies.map(lambda e: 0 if e is None else len(e)),
                    "energy": energies,
                }
            )

    return pruned.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame,
    num_frames: int = 4,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """1→N frame sampling: each video blob fans out to *num_frames* rows.

    mapInPandas (not a UDF) because the operator changes cardinality; the
    fake kernel slices the byte stream into equal-offset chunks where a real
    one would seek keyframes with PyAV.  Blob column is projected away from
    everything except the frame output, so the N× row fan-out never
    multiplies non-media payload through a shuffle."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if blob is None:
                    continue
                blob = bytes(blob)
                step = max(len(blob) // num_frames, 1)
                for k in range(num_frames):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(blob[k * step : (k + 1) * step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return pruned.mapInPandas(sample, schema=VIDEO_FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)

_PHASH_BITS = 63  # stays positive in a signed 64-bit long in every engine


def _phash63(blob) -> int | None:
    """Blockhash perceptual hash of a byte stream: 63 block sums (byte
    positions mod 64), bit b set iff block b's sum exceeds the mean
    (64·block > total) — pure integer math, reproducible anywhere."""
    if blob is None:
        return None
    b = bytes(blob)
    total = sum(b)
    blocks = [0] * 64
    for i, v in enumerate(b):
        blocks[i % 64] += v
    h = 0
    for blk in range(_PHASH_BITS):
        if 64 * blocks[blk] > total:
            h |= 1 << blk
    return h


def image_phash(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Per-image perceptual hash over the binary column via mapInPandas
    (a real deployment swaps :func:`_phash63` for a decode + DCT/blockhash
    kernel; the Spark plumbing — blob pruning, Arrow batching, 63-bit
    integer output — is identical).  Feeds :func:`phash_dup_pairs`."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "phash": pdf["media"].map(_phash63)}
            )

    return pruned.mapInPandas(extract, schema=PHASH_SCHEMA)


def phash_dup_pairs(phashes: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance.

    Candidate generation bands the 63-bit hash into 8 byte blocks — two
    hashes within Hamming ≤ 7 MUST share an intact block (pigeonhole), so
    for ``max_hamming ≤ 7`` banding + exact verify is EXACT, not
    approximate.  Scale shape mirrors dedup.simhash_dup_pairs: the
    self-join shuffles 8 small (block, key) rows per image — never blobs —
    and verification is one xor+popcount per candidate."""
    assert max_hamming <= 7, "8-block pigeonhole only exact to hamming 7"
    blocked = phashes.select(
        F.col("doc_id").alias("id"),
        "phash",
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftright(F.col("phash"), b * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bk"),
    ).select("id", "phash", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    l, r = blocked.alias("l"), blocked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.phash").alias("ph_a"),
            F.col("r.phash").alias("ph_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
