"""Multimodal column plumbing (SURVEY §2 C12).

Media payloads are opaque `binary` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas UDFs
over ``mapInPandas``. The actual image/audio decode is STUBBED (decoder
libraries are not in this environment): ``decode_stub=True`` computes
deterministic fake features from the bytes, ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/torchaudio/ffmpeg) would
plug in. Everything Spark-side — schema, partitioning, Arrow batch
shape, UDF signature — is real and tested.

Scale notes: media bytes travel in the `binary` column only until the
feature projection, then get dropped; `mapInPandas` streams
Arrow batches so executor memory is bounded by batch size
(`spark.sql.execution.arrow.maxRecordsPerBatch`), not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, width int, height int,"
    " checksum string, mean_byte double"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: documents' text bytes standing in for
    encoded media, with typed metadata columns."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("doc_id") % 24 + 1).cast("int").alias("n_frames"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media payloads."""

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg; "
                    "install and replace this branch"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len),
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Deterministic frame sampling for video rows: emit one row per
    sampled frame index — pure Spark (sequence + explode), no UDF."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 oracle-gated surface: metadata + byte stats of the media table
    (the part expressible in SQL; the Pandas-UDF path is pytest-covered)."""
    media = media_table(spark, sf_dir)
    frames = (
        frame_sample(media)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sampled_frames"))
    )
    return (
        media.join(frames, "doc_id", "left")
        .select(
            "doc_id",
            "media_type",
            F.length("payload").alias("byte_len"),
            "width",
            "height",
            "n_frames",
            F.coalesce("n_sampled_frames", F.lit(0)).alias("n_sampled_frames"),
        )
        .orderBy("doc_id")
    )


MULTIMODAL_META_SQL = """
WITH media AS (
  SELECT doc_id,
         encode(text) AS payload,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(n_chars % 640 + 1 AS INT) AS width,
         CAST(n_chars % 480 + 1 AS INT) AS height,
         CAST(doc_id % 24 + 1 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, media_type,
       octet_length(payload) AS byte_len,
       width, height, n_frames,
       CASE WHEN media_type = 'video'
            THEN CAST(ceil(n_frames / 4.0) AS BIGINT) ELSE 0 END AS n_sampled_frames
FROM media
ORDER BY doc_id
"""


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int,"
    " out_width int, out_height int, scale double, resized_checksum string"
)


def resize_media(
    media: DataFrame, max_w: int = 224, max_h: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched aspect-preserving resize (STUBBED decode).

    Computes the real output geometry (fit-within box, never upscale)
    and a deterministic checksum standing in for resized bytes; with a
    real decoder the same UDF body would call PIL/ffmpeg and emit the
    resized payload instead. Geometry math is exact integers, so this
    stub is fully testable.
    """

    def _resize(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires PIL/ffmpeg; install and replace this branch"
                )
            scale = (max_w / pdf["width"]).combine(max_h / pdf["height"], min).clip(upper=1.0)
            out_w = (pdf["width"] * scale).apply(lambda x: max(int(x), 1))
            out_h = (pdf["height"] * scale).apply(lambda x: max(int(x), 1))
            checksum = [
                hashlib.md5(bytes(p) + f":{w}x{h}".encode()).hexdigest()
                for p, w, h in zip(pdf["payload"], out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "scale": scale.round(6),
                    "resized_checksum": checksum,
                }
            )

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)
