"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Real containers (netpbm PPM/PGM, 24-bit BMP, zlib-deflate PNG, RIFF/PCM
WAV) decode for REAL via the pure-Python codecs in :mod:`.codecs` —
genuine header parsing, CRC checks, inflate + scanline unfiltering, row
padding, chunk walking — so decode → feature → resize is exact end-to-end
and carries integer-exact SQL oracles.  Entropy-coded formats
(jpeg/mp3/mp4) would need codec libraries the container lacks; those stay
behind ``FAKE_DECODERS`` for the legacy ``format='fake'`` blobs and
:func:`real_decode` raises for them explicitly.  Everything Spark-side
is real and tested either way: the typed schema, Arrow-batched
``mapInPandas`` plumbing, batch shapes, and the partitioning story.

Scale notes: media blobs dominate row size, so ops repartition by a
row-count target (not bytes-default splits) before ``mapInPandas`` to
bound executor memory per Arrow batch; feature outputs drop the blob
column as early as possible (project-away before any shuffle).
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

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
    """Decode a genuine media blob.  Uncompressed containers decode here
    and now (netpbm/BMP images, PCM WAV audio); compressed formats raise —
    install PIL/librosa/av in production and extend the dispatch."""
    fmt = codecs.sniff_format(blob)
    if media_type == "image" and fmt in ("ppm", "pgm", "bmp", "png"):
        return codecs.decode_image(blob)
    if media_type == "audio" and fmt == "wav":
        return codecs.decode_wav(blob)
    raise NotImplementedError(
        f"no codec for {media_type} blob with magic format {fmt!r}: "
        "jpeg/mp3/mp4 containers need PIL/librosa/av"
    )


# fixture geometry for fmt='ppm': fixed-height RGB strip, width grows with
# the payload so every text byte lands in exactly one channel slot
PPM_FIXTURE_H = 4
# fixture WAV: mono 16-bit 8 kHz
WAV_FIXTURE_RATE = 8000

_WAV_STATIC_FMT = (
    b"WAVEfmt "
    + _struct.pack("<I", 16)
    + _struct.pack("<HHIIHH", 1, 1, WAV_FIXTURE_RATE, WAV_FIXTURE_RATE * 2, 2, 16)
)


def attach_png_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fixture builder for REAL PNG blobs: the text bytes become the pixel
    payload of a genuine zlib-deflated, CRC'd, filter-0 PNG (same
    width-ceil(len/12) × 4 RGB geometry as the ``fmt='ppm'`` fixture, so
    the decode-feature oracle is byte-for-byte the same channel-sum
    math).  Deflate has no JVM SQL expression, so this builder runs as a
    mapInPandas stage — unlike the PPM/WAV fixtures it cannot stay
    JVM-side, which is fine: blob construction is harness plumbing, and
    the thing under test is the DECODER (inflate + unfilter + CRC walk in
    codecs.decode_png)."""
    import numpy as np

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def kernel(text):
            if text is None:
                return None
            b = text.encode("utf-8")
            w = max(1, (len(b) + 11) // 12)
            payload = b + b"\x00" * (w * PPM_FIXTURE_H * 3 - len(b))
            arr = np.frombuffer(payload, dtype=np.uint8).reshape(
                PPM_FIXTURE_H, w, 3
            )
            return codecs.encode_png(arr)

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": pdf["text"].map(kernel)}
            )

    return pruned.mapInPandas(build, schema=out_schema)


def attach_gzip_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Fixture builder: gzip-compress the text column into a binary blob
    (the compressed-text-column pattern — e.g. stored HTML/WARC payloads).
    Python-side like the PNG fixture: deflate has no JVM SQL expression."""
    import gzip

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def kernel(text):
            if text is None:
                return None
            # mtime=0 keeps the gzip member byte-deterministic
            return gzip.compress(text.encode("utf-8"), compresslevel=level, mtime=0)

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": pdf["text"].map(kernel)}
            )

    return pruned.mapInPandas(build, schema=out_schema)


def decompress_text(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """REAL decompression of a gzip/zlib text blob column → (doc_id, text).

    Sniffs the two container framings (gzip magic 1f 8b vs a bare zlib
    header) and inflates with stdlib zlib; anything else raises loudly
    rather than passing bytes through.  Output is a plain string column,
    so every downstream text operator (tokens, quality, dedup) composes
    unchanged — decompression is a narrow map, no shuffle at any scale."""
    import gzip
    import zlib as _zlib

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )

    def inflate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def kernel(b):
            if b is None:
                return None
            b = bytes(b)
            if b[:2] == b"\x1f\x8b":
                return gzip.decompress(b).decode("utf-8")
            if len(b) >= 2 and b[0] == 0x78:
                return _zlib.decompress(b).decode("utf-8")
            raise ValueError(
                f"unrecognized compressed-text framing (magic {b[:2]!r})"
            )

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "text": pdf["media"].map(kernel)}
            )

    return pruned.mapInPandas(inflate, schema=out_schema)


def _le_hex(col, nbytes: int):
    """Little-endian fixed-width hex rendering of an integer column —
    feeds ``unhex`` to splice variable header fields (RIFF/data sizes)
    into binary literals, all JVM-side."""
    return F.concat(
        *[
            F.format_string("%02x", F.shiftright(col, 8 * i).bitwiseAND(F.lit(255)))
            for i in range(nbytes)
        ]
    )


def attach_media(df: DataFrame, text_col: str = "text", fmt: str = "fake") -> DataFrame:
    """Test harness: derive a binary 'media' column + typed metadata from a
    text column.

    ``fmt='fake'`` (legacy): raw UTF-8 bytes stand in for a blob.
    ``fmt='ppm'``: a REAL binary P6 image — ``P6\\n<w> 4\\n255\\n`` header +
    the text bytes zero-padded to ``w*4*3`` (w = ceil(len/12)), built
    entirely JVM-side (format_string + binary rpad/concat), so the blobs
    parse with any PPM reader and the decoded pixel channels are exact
    functions of the text bytes (→ SQL oracle).
    ``fmt='wav'``: a REAL RIFF/PCM WAV — canonical 44-byte header with
    little-endian size fields spliced via unhex, mono 16-bit 8 kHz, data =
    the text bytes truncated to even length (→ int16 LE samples).
    """
    blob = F.encode(F.col(text_col), "UTF-8")
    if fmt == "fake":
        media = blob
        meta_fmt, mtype = "fake", "image"
        width = F.octet_length(blob).cast("int")
        height = F.lit(1).cast("int")
        rate = F.lit(None).cast("int")
    elif fmt == "ppm":
        w = F.greatest(
            F.lit(1), F.floor((F.octet_length(blob) + 11) / 12).cast("int")
        )
        header = F.encode(
            F.format_string("P6\n%d %d\n255\n", w, F.lit(PPM_FIXTURE_H)), "UTF-8"
        )
        padded = F.expr(
            f"rpad(encode({text_col}, 'UTF-8'), "
            f"greatest(1, cast(floor((octet_length(encode({text_col}, 'UTF-8')) + 11) / 12) as int)) * 12, "
            "X'00')"
        )
        media = F.concat(header, padded)
        meta_fmt, mtype = "ppm", "image"
        width = w
        height = F.lit(PPM_FIXTURE_H).cast("int")
        rate = F.lit(None).cast("int")
    elif fmt == "wav":
        dsize = (F.floor(F.octet_length(blob) / 2) * 2).cast("int")
        payload = F.expr(
            f"substring(encode({text_col}, 'UTF-8'), 1, "
            f"cast(floor(octet_length(encode({text_col}, 'UTF-8')) / 2) * 2 as int))"
        )
        media = F.concat(
            F.lit(b"RIFF"),
            F.unhex(_le_hex(dsize + (4 + len(_WAV_STATIC_FMT) + 8), 4)),
            F.lit(_WAV_STATIC_FMT),
            F.lit(b"data"),
            F.unhex(_le_hex(dsize, 4)),
            payload,
        )
        meta_fmt, mtype = "wav", "audio"
        width = F.lit(None).cast("int")
        height = F.lit(None).cast("int")
        rate = F.lit(WAV_FIXTURE_RATE).cast("int")
    else:
        raise ValueError(f"unknown attach_media fmt {fmt!r}")
    meta = F.struct(
        F.lit(mtype).alias("media_type"),
        F.lit(meta_fmt).alias("format"),
        width.alias("width"),
        height.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        rate.alias("sample_rate"),
    )
    return df.withColumn("media", media).withColumn("media_meta", meta)


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


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL image decode → per-channel integer statistics.

    The kernel parses the actual container (netpbm header tokens + raster,
    or BMP chunk layout via :mod:`.codecs`) — no stand-ins — and emits
    integer channel sums, so the result is bit-exact across engines and the
    driver oracle recomputes it from first principles.  Blob column is
    pruned to (id, media) before the Arrow exchange; output carries no
    blob, so nothing downstream shuffles media bytes."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if blob is None:
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                arr = codecs.decode_image(blob)
                h, w = arr.shape[:2]
                sums = arr.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (doc_id, w, h, w * h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels", "sum_r", "sum_g", "sum_b",
                ],
            )

    return pruned.mapInPandas(extract, schema=DECODED_IMAGE_SCHEMA)


def resize_decoded_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL resize: decode the container, nearest-neighbour resample with
    exact integer index math (out[y][x] = in[y*h//th][x*w//tw]), re-encode
    as binary P6.  Blob-in/blob-out: output feeds
    :func:`decode_image_features` (or any PPM consumer) unchanged."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def kernel(b):
            if b is None:
                return None
            arr = codecs.resize_nearest(codecs.decode_image(b), target_w, target_h)
            return codecs.encode_ppm(arr)

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


WAV_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("energy_sq", T.LongType(), True),
    ]
)


def wav_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL WAV decode → total signal energy (sum of squared int16
    samples, exact in int64: n·32768² needs ~2^31 samples per file to
    overflow).  The kernel walks actual RIFF chunks — sample rate comes
    from the parsed fmt chunk, not metadata."""
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if blob is None:
                    rows.append((doc_id, None, None, None))
                    continue
                rate, samples = codecs.decode_wav(blob)
                s = samples.astype(np.int64)
                rows.append((doc_id, rate, int(s.size), int((s * s).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "energy_sq"]
            )

    return pruned.mapInPandas(extract, schema=WAV_ENERGY_SCHEMA)


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
