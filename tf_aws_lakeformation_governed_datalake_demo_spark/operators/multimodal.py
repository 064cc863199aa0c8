"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as `binary` columns with a typed
metadata struct, processed by Arrow-batched pandas functions via
``mapInPandas`` — the Spark-idiomatic shape for per-item media work at
100 TB (each task decodes its partition's batches; nothing ever
collects to the driver).

The decode step itself is a clearly-marked STUB (no image/audio libs in
this container): ``decode_image_stub`` derives deterministic fake
dimensions from the payload bytes, so the Spark-side contract — schema,
batch iteration, partitioning, UDF signature — is real and tested while
the pixel math is not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, source: string>"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "n_frames long, checksum string"
)


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    the text (a stand-in for image bytes), typed metadata attached."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (mapInPandas body). A real pipeline swaps the body for
    PIL/ffmpeg calls; everything around it (Arrow batches in, typed rows
    out) is the production shape.
    """
    import hashlib

    for pdf in batches:
        n = pdf["payload"].map(len)
        # Deterministic fake dimensions derived from payload size — NOT a
        # real decode. Raises for unknown media types like a decoder would.
        if not pdf["media_type"].isin(["image", "audio", "video"]).all():
            raise NotImplementedError("unknown media type in batch")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n.astype("int64"),
                "width": (n % 640 + 16).astype("int64"),
                "height": (n % 480 + 16).astype("int64"),
                "n_frames": (n % 24 + 1).astype("int64"),
                "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


@query(
    "multimodal_decode",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS BIGINT) AS height,
           CAST(octet_length(encode(text)) % 24 + 1 AS BIGINT) AS n_frames,
           md5(text) AS checksum
    FROM documents
    """,
    "Multimodal plumbing: binary payload column + typed metadata -> "
    "mapInPandas decode (STUBBED pixel math, real Spark plumbing). The "
    "deterministic stub is mirrored in SQL for the oracle.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_frame(spark, sf_dir).mapInPandas(decode_image_stub, DECODED_SCHEMA)


@query(
    "multimodal_frame_sample",
    """
    SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no
    FROM (SELECT doc_id,
                 octet_length(encode(text)) % 24 + 1 AS n_frames
          FROM documents WHERE doc_id % 3 = 2) v,
         LATERAL (SELECT unnest(range(0, CAST(n_frames AS BIGINT), 4))
                  AS frame_no) f
    """,
    "Frame sampling plumbing: per-media-type partitions, every k-th "
    "'frame' index materialized as (doc_id, frame_no) — the explode shape "
    "a video pipeline uses before per-frame feature extraction. The stub "
    "decode is deterministic, so the whole pipeline is oracle-checkable.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # media_type is derivable pre-decode, so filter BEFORE mapInPandas:
    # only video payloads cross the Arrow/Python boundary (~1/3 of bytes).
    # Round-1 ADVICE: decoding everything then filtering wasted 2/3 of the
    # Python traffic at scale.
    video = media_frame(spark, sf_dir).filter(F.col("media_type") == "video")
    decoded = video.mapInPandas(decode_image_stub, DECODED_SCHEMA)
    return (
        decoded
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))).alias("frame_no"),
        )
    )
