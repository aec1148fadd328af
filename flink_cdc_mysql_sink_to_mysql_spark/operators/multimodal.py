"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages. The container has no image/audio libraries, so
the *decode* step is stubbed (NotImplementedError gate + a deterministic
fake), while everything Spark-side — schema, partitioning, UDF
signature, batch shape — is real and tested.

Scale design: media bytes never leave the executor that read them until
an explicit shuffle is asked for; feature extraction is a narrow
mapInPandas stage (Arrow zero-copy into Python, hashlib/C-speed work,
one output row per input row). Frame sampling multi-emits rows from the
same narrow stage. Metadata-only queries prune the binary column at the
scan (columnar formats make the blob column free if unreferenced).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_BYTES = 16  # one "video frame" = 16 bytes of the fake media blob

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Deterministic fake media over the documents table.

    bytes = unhex(repeat(md5(text), 1 + doc_id % 4)) → 16/32/48/64 bytes;
    metadata derived arithmetically from doc_id. Pure Column exprs — the
    synthesis itself is engine-portable (same SQL runs in DuckDB).
    """
    m = (1 + F.col("doc_id") % 4).cast("int")
    media = F.unhex(F.repeat(F.md5(F.col("text")), m))
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        (F.lit(16) * m).cast("int").alias("width"),
        (F.lit(8) * m).cast("int").alias("height"),
        m.alias("n_frames"),
    )


MEDIA_SQL = """
    SELECT doc_id,
           unhex(repeat(md5(text), CAST(1 + doc_id % 4 AS INTEGER))) AS media,
           (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
           CAST(16 * (1 + doc_id % 4) AS INTEGER) AS width,
           CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height,
           CAST(1 + doc_id % 4 AS INTEGER) AS n_frames
    FROM {rel}
"""


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha256", StringType()),
        StructField("head_hex", StringType()),
    ]
)


def media_features(media: DataFrame) -> DataFrame:
    """Feature extraction over media blobs via Arrow-batched mapInPandas.

    The Python stage sees pandas batches of raw bytes (Arrow zero-copy);
    per-blob work is hashlib (C speed). Content hash is sha256 over the
    blob's lowercase-hex rendering (DuckDB cannot hash BLOBs, so the
    oracle hashes the identical hex string — same information, exact
    cross-language parity of the bytes pipeline).
    """
    src = media.select("doc_id", "media_type", "media")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "sha256": blobs.map(
                        lambda b: hashlib.sha256(
                            bytes(b).hex().encode()
                        ).hexdigest()
                    ),
                    "head_hex": blobs.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return src.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def media_features_sql(rel: str) -> str:
    # the media blob is unhex(hexstr); all features re-derived from hexstr
    hexstr = "repeat(md5(text), CAST(1 + doc_id % 4 AS INTEGER))"
    return f"""
    SELECT doc_id,
           (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
           CAST(length({hexstr}) / 2 AS INTEGER) AS n_bytes,
           sha256({hexstr}) AS sha256,
           substr({hexstr}, 1, 16) AS head_hex
    FROM {rel}
    """


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha256", StringType()),
    ]
)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Sample every Nth 16-byte "frame" of video blobs (multi-emit
    mapInPandas: 0..n_frames output rows per input row)."""
    src = media.where(F.col("media_type") == "video").select(
        "doc_id", "media"
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(blob)
                for f in range(0, len(raw) // FRAME_BYTES, every):
                    frame = raw[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(f)
                    hashes.append(
                        hashlib.sha256(frame.hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha256": pd.Series(hashes, dtype="object"),
                }
            )

    return src.mapInPandas(_frames, schema=FRAME_SCHEMA)


def frame_sample_sql(rel: str, every: int = 2) -> str:
    hexstr = "repeat(md5(text), CAST(1 + doc_id % 4 AS INTEGER))"
    return f"""
    WITH m AS (
      SELECT doc_id, {hexstr} AS hx, CAST(1 + doc_id % 4 AS INTEGER) AS n_frames
      FROM {rel}
      WHERE (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] = 'video'
    ),
    f AS (
      SELECT doc_id, hx,
             unnest(list_transform(range(0, n_frames, {every}), x -> x)) AS frame_idx
      FROM m
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           sha256(substr(hx, 1 + frame_idx * {FRAME_BYTES * 2}, {FRAME_BYTES * 2}))
             AS frame_sha256
    FROM f
    """


def decode_fake_sql(rel: str) -> str:
    """Oracle for the fake-decode path: mean byte value re-derived from
    the blob's hex string with exact integer arithmetic."""
    hexstr = "repeat(md5(text), CAST(1 + doc_id % 4 AS INTEGER))"
    byte_i = (
        "(strpos('0123456789abcdef', substr(hx, 2*i - 1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)"
    )
    return f"""
    WITH m AS (
      SELECT doc_id, {hexstr} AS hx,
             CAST(16 * (1 + doc_id % 4) AS INTEGER) AS width,
             CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
      FROM {rel}
      WHERE (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] = 'image'
    )
    SELECT doc_id, width, height,
           CAST(floor(
             CAST(list_reduce(list_transform(range(1, length(hx) // 2 + 1),
                                             i -> {byte_i}), (a, b) -> a + b)
                  AS DOUBLE) / (length(hx) // 2)
           ) AS INTEGER) AS mean_byte
    FROM m
    """


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode stage.

    Real decode needs an imaging library that is NOT in this container —
    the real path is explicitly gated. With ``fake=True`` a deterministic
    stand-in runs through the identical mapInPandas plumbing (schema,
    Arrow batch shape, partition behavior), returning per-image stats
    derived from the raw bytes. Swap `_fake_decode` for a PIL/libvips
    call on a real cluster; nothing else changes.
    """
    src = media.where(F.col("media_type") == "image").select(
        "doc_id", "width", "height", "media"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_byte", IntegerType()),
        ]
    )

    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/libvips) not "
            "present in this container; call with fake=True for the "
            "deterministic plumbing-test path"
        )

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "mean_byte": pdf["media"]
                    .map(lambda b: sum(bytes(b)) // len(bytes(b)))
                    .astype("int32"),
                }
            )

    return src.mapInPandas(_fake_decode, schema=schema)
