"""Multimodal column plumbing (SURVEY §2 C12, C32).

Media payloads are opaque `binary` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas UDFs
over ``mapInPandas``. Two tiers:

- the byte-stats tier (``media_table`` + ``extract_features``): payloads
  are raw text bytes standing in for media; features are byte statistics
  (the original stub surface, kept for the metadata oracle);
- the REAL tier (``media_table_encoded`` + ``decode_features`` +
  ``resize_images``): payloads are genuine 24-bit BMP images, RIFF/WAVE
  PCM audio, and a length-prefixed raw-video container, encoded AND
  decoded by the pure-numpy/stdlib codecs in ``codecs.py`` — header
  validation, row padding, frame seeking and all. No external decoder
  library is needed for these formats, so nothing is stubbed; decoded
  pixel/sample statistics are oracle-gated (``multimodal_decode``)
  because the generative formulas are closed-form SQL.

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


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched byte-statistics extraction over raw media payloads
    (the metadata tier; real container decode is ``decode_features``)."""

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
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
    media: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """Arrow-batched aspect-preserving resize GEOMETRY over the metadata
    tier (fit-within box, never upscale; exact integer math). The
    pixel-level resize over real encoded images is ``resize_images``.
    """

    def _resize(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
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


# ===================================================================
# REAL tier: genuine BMP / WAV / raw-video payloads, encoded and
# decoded by greenplum_cdc_spark.operators.codecs (no external libs).
# ===================================================================
#
# Generative formulas (deterministic AND closed-form SQL, which is what
# makes the DECODED statistics oracle-checkable):
#   image  : w = n_chars%64+16, h = n_chars%48+12,
#            RGB row-major pixel i = (doc_id + i) % 256
#   audio  : 8 kHz 16-bit mono PCM, n = n_chars*16 samples,
#            sample i = (doc_id*7 + i*13) % 4096 - 2048
#   video  : n_frames = doc_id%24+1 frames of 8x6 BMP,
#            frame f pixel i = (doc_id + 3*f + i) % 256;
#            frame_sample keeps every 4th frame.

VID_W, VID_H = 8, 6
VID_PIX = VID_W * VID_H * 3
AUDIO_RATE = 8000
FRAME_EVERY_K = 4

ENCODED_SCHEMA = "doc_id bigint, media_type string, payload binary"

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int,"
    " sample_rate int, n_frames int, n_sampled int, n_values bigint,"
    " sum_value bigint, mean_value double, max_value int, payload_bytes bigint"
)


def media_table_encoded(
    spark: SparkSession, sf_dir: str, only_kind: str | None = None
) -> DataFrame:
    """Encode each document into a REAL media payload (BMP / WAV / RVID)
    inside an Arrow-batched ``mapInPandas`` — the binary ingest path a
    production pipeline would run at the edge. ``only_kind`` prunes the
    input BEFORE encoding (kind is doc_id mod 3 — a pushed-down integer
    predicate), so single-modality consumers don't pay for the other
    two codecs."""

    def _encode(batches):
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            out_ids, out_types, out_payloads = [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                n_chars = int(n_chars)
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "image":
                    w, h = n_chars % 64 + 16, n_chars % 48 + 12
                    pix = ((doc_id + np.arange(h * w * 3)) % 256).astype(np.uint8)
                    payload = codecs.encode_bmp(pix.reshape(h, w, 3))
                elif kind == "audio":
                    n = n_chars * 16
                    samples = (doc_id * 7 + np.arange(n) * 13) % 4096 - 2048
                    payload = codecs.encode_wav(samples.astype(np.int16), AUDIO_RATE)
                else:
                    n_frames = doc_id % 24 + 1
                    frames = []
                    for f in range(n_frames):
                        pix = ((doc_id + 3 * f + np.arange(VID_PIX)) % 256).astype(
                            np.uint8
                        )
                        frames.append(codecs.encode_bmp(pix.reshape(VID_H, VID_W, 3)))
                    payload = codecs.encode_rawvideo(frames)
                out_ids.append(doc_id)
                out_types.append(kind)
                out_payloads.append(payload)
            yield pd.DataFrame(
                {"doc_id": out_ids, "media_type": out_types, "payload": out_payloads}
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    if only_kind is not None:
        kind_idx = ("image", "audio", "video").index(only_kind)
        docs = docs.filter(F.col("doc_id") % 3 == kind_idx)
    return docs.mapInPandas(_encode, schema=ENCODED_SCHEMA)


def decode_features(media: DataFrame) -> DataFrame:
    """REAL decode of encoded payloads: parse BMP headers (padding,
    bottom-up rows), read WAV via RIFF parsing, seek the video container
    via length prefixes and decode every 4th frame. All statistics come
    from the DECODED arrays — nothing is read from metadata columns."""

    def _decode(batches):
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload)
                if kind == "image":
                    pix = codecs.decode_bmp(data)
                    h, w, _ = pix.shape
                    vals = pix.astype(np.int64).ravel()
                    rows.append(
                        (int(doc_id), kind, w, h, 0, 1, 1, vals.size,
                         int(vals.sum()), int(vals.max()), len(data))
                    )
                elif kind == "audio":
                    rate, samples = codecs.decode_wav(data)
                    vals = samples.astype(np.int64)
                    rows.append(
                        (int(doc_id), kind, 0, 0, rate, 0, 0, vals.size,
                         int(vals.sum()), int(vals.max()), len(data))
                    )
                else:
                    n_frames = codecs.rawvideo_frame_count(data)
                    sampled = codecs.sample_rawvideo(data, FRAME_EVERY_K)
                    vals = np.concatenate(
                        [codecs.decode_bmp(fb).astype(np.int64).ravel()
                         for _, fb in sampled]
                    )
                    h, w, _ = codecs.decode_bmp(sampled[0][1]).shape
                    rows.append(
                        (int(doc_id), kind, w, h, 0, n_frames, len(sampled),
                         vals.size, int(vals.sum()), int(vals.max()), len(data))
                    )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "width", "height", "sample_rate",
                         "n_frames", "n_sampled", "n_values", "sum_value",
                         "max_value", "payload_bytes"],
            )
            # exact-integer sum / count division is bit-identical on both
            # engines (sums are far below 2^53)
            out.insert(9, "mean_value", out["sum_value"] / out["n_values"])
            yield out

    return media.mapInPandas(_decode, schema=DECODE_SCHEMA)


def resize_images(media: DataFrame, max_w: int = 32, max_h: int = 32) -> DataFrame:
    """REAL image resize: decode BMP -> nearest-neighbor resample ->
    re-encode BMP. Returns decoded-from-reencoded dimensions plus pixel
    stats of the resized array, proving the round trip."""

    def _resize(batches):
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                pix = codecs.decode_bmp(bytes(payload))
                h, w, _ = pix.shape
                scale = min(max_w / w, max_h / h, 1.0)
                out_w, out_h = max(int(w * scale), 1), max(int(h * scale), 1)
                resized = codecs.resize_nearest(pix, out_w, out_h)
                reencoded = codecs.encode_bmp(resized)
                rt = codecs.decode_bmp(reencoded)  # round trip must hold
                vals = rt.astype(np.int64).ravel()
                rows.append(
                    (int(doc_id), w, h, out_w, out_h, int(vals.sum()),
                     len(reencoded))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width", "out_height",
                         "resized_sum", "resized_bytes"],
            )

    return media.mapInPandas(
        _resize,
        schema="doc_id bigint, width int, height int, out_width int,"
        " out_height int, resized_sum bigint, resized_bytes bigint",
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C32 oracle-gated surface: encode -> REAL decode -> statistics.

    Every output column is computed from decoded bytes on the Spark
    side; the oracle recomputes the same values from the closed-form
    generative formulas with generate_series — so a header-math bug,
    padding bug, or sampling bug on either side breaks the hash.
    """
    return decode_features(media_table_encoded(spark, sf_dir)).orderBy("doc_id")


MULTIMODAL_DECODE_SQL = """
WITH docs AS (SELECT doc_id, n_chars FROM documents),
img_idx AS (
  SELECT doc_id, w, h,
         unnest(generate_series(0, w * h * 3 - 1)) AS i
  FROM (SELECT doc_id,
               CAST(n_chars % 64 + 16 AS INT) AS w,
               CAST(n_chars % 48 + 12 AS INT) AS h
        FROM docs WHERE doc_id % 3 = 0)
),
img AS (
  SELECT doc_id, w, h,
         SUM((doc_id + i) % 256) AS sum_value,
         COUNT(*) AS n_values,
         MAX((doc_id + i) % 256) AS max_value
  FROM img_idx
  GROUP BY doc_id, w, h
),
aud_idx AS (
  SELECT doc_id, unnest(generate_series(0, n_chars * 16 - 1)) AS i
  FROM docs WHERE doc_id % 3 = 1
),
aud AS (
  SELECT doc_id,
         SUM((doc_id * 7 + i * 13) % 4096 - 2048) AS sum_value,
         COUNT(*) AS n_values,
         MAX((doc_id * 7 + i * 13) % 4096 - 2048) AS max_value
  FROM aud_idx
  GROUP BY doc_id
),
vid_idx AS (
  SELECT doc_id, n_frames, fi, unnest(generate_series(0, 143)) AS i
  FROM (SELECT doc_id,
               CAST(doc_id % 24 + 1 AS INT) AS n_frames,
               unnest(generate_series(0, doc_id % 24, 4)) AS fi
        FROM docs WHERE doc_id % 3 = 2)
),
vid AS (
  SELECT doc_id, n_frames,
         COUNT(DISTINCT fi) AS n_sampled,
         SUM((doc_id + 3 * fi + i) % 256) AS sum_value,
         COUNT(*) AS n_values,
         MAX((doc_id + 3 * fi + i) % 256) AS max_value
  FROM vid_idx
  GROUP BY doc_id, n_frames
)
SELECT doc_id, 'image' AS media_type, w AS width, h AS height,
       0 AS sample_rate, 1 AS n_frames, 1 AS n_sampled,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(sum_value AS BIGINT) AS sum_value,
       CAST(sum_value AS DOUBLE) / n_values AS mean_value,
       CAST(max_value AS INT) AS max_value,
       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS BIGINT) AS payload_bytes
FROM img
UNION ALL
SELECT doc_id, 'audio', 0, 0, 8000, 0, 0,
       CAST(n_values AS BIGINT), CAST(sum_value AS BIGINT),
       CAST(sum_value AS DOUBLE) / n_values,
       CAST(max_value AS INT),
       CAST(44 + 2 * n_values AS BIGINT)
FROM aud
UNION ALL
SELECT doc_id, 'video', 8, 6, 0, n_frames, CAST(n_sampled AS INT),
       CAST(n_values AS BIGINT), CAST(sum_value AS BIGINT),
       CAST(sum_value AS DOUBLE) / n_values,
       CAST(max_value AS INT),
       CAST(8 + n_frames * (4 + 54 + 144) AS BIGINT)
FROM vid
ORDER BY doc_id
"""


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C56: exact dedup over ENCODED media binaries — the multimodal
    twin of C1: hash the payload BYTES (md5 over the real BMP/WAV/RVID
    container, not the source text) and keep one copy per binary.

    Payload generation is seeded from the text content hash, so two
    documents carry byte-identical media exactly when their texts are
    equal — which is what lets the DuckDB oracle state the semantic
    result (groups by md5(text), media kind from the seed mod 3 — 16 ≡
    1 mod 3 makes that a hex-digit-sum both engines compute the same
    way) while Spark actually routes real bytes through the codec and
    hashes them in an Arrow batch. At 100 TB this is the dedup pass a
    multimodal corpus runs on its binary columns: one map-side
    encode+hash, one hash-groupBy shuffle — payload size never touches
    the shuffle (only the 32-char digest does).
    """
    import hashlib

    def _encode(batches):
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            ids, kinds, digests = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hx = hashlib.md5(text.encode()).hexdigest()
                seed = int(hx[:8], 16)  # kind selector (SQL twin: hex digit sum % 3)
                # full-entropy content stream: a 64-bit-seeded PRNG so
                # DISTINCT texts give distinct payloads (a modular
                # pixel pattern collapses onto seed mod 256 and merges
                # unrelated docs — caught by the gate's group count)
                rng = np.random.default_rng(int(hx[:16], 16))
                kind = ("image", "audio", "video")[seed % 3]
                if kind == "image":
                    w, h = seed % 64 + 16, seed % 48 + 12
                    pix = rng.integers(0, 256, h * w * 3, dtype=np.uint8)
                    payload = codecs.encode_bmp(pix.reshape(h, w, 3))
                elif kind == "audio":
                    n = seed % 500 + 100
                    samples = rng.integers(-2048, 2048, n, dtype=np.int16)
                    payload = codecs.encode_wav(samples, AUDIO_RATE)
                else:
                    n_frames = seed % 8 + 1
                    frames = []
                    for f in range(n_frames):
                        pix = rng.integers(0, 256, VID_PIX, dtype=np.uint8)
                        frames.append(codecs.encode_bmp(pix.reshape(VID_H, VID_W, 3)))
                    payload = codecs.encode_rawvideo(frames)
                ids.append(int(doc_id))
                kinds.append(kind)
                digests.append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": kinds, "payload_md5": digests}
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hashed = docs.mapInPandas(
        _encode, schema="doc_id bigint, media_type string, payload_md5 string"
    )
    return (
        hashed.groupBy("payload_md5", "media_type")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .select("media_type", "keeper_doc_id", "n_copies")
        .orderBy("keeper_doc_id")
    )


MEDIA_DEDUP_SQL = """
WITH h AS (
  SELECT doc_id, md5(text) AS th FROM documents
),
seeded AS (
  SELECT doc_id, th,
         (strpos('0123456789abcdef', substr(th, 1, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 2, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 3, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 4, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 5, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 6, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 7, 1)) - 1
          + strpos('0123456789abcdef', substr(th, 8, 1)) - 1) % 3 AS kind_idx
  FROM h
)
SELECT CASE kind_idx WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM seeded
GROUP BY th, kind_idx
ORDER BY keeper_doc_id
"""


# --- C75: perceptual hash (dHash) over REAL decoded images -------------

_PH_W, _PH_H = 9, 8  # dHash sample grid: 9 columns x 8 rows -> 64 bits


def media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C75: perceptual difference-hash (dHash) computed from REAL
    decoded BMP bytes — the near-dup fingerprint for image dedup.

    The image corpus is encoded to genuine 24-bit BMPs (C12/C32 path),
    then `mapInPandas` DECODES the actual bytes (header validation,
    padding, bottom-up rows) and computes the classic dHash: grayscale
    (integer channel SUM — no division, no float), nearest-neighbor
    9x8 downsample (the same (i*src) // dst grid as codecs.
    resize_nearest), one bit per horizontally adjacent comparison.
    64 bits are emitted as two 32-bit halves (phash_hi/phash_lo) so
    the BIGINT stays positive in both engines, plus the popcount.

    The oracle recomputes the hash from the closed-form generative
    pixel formula with generate_series — so a decode bug ANYWHERE
    (stride math, BGR order, row flip, grid rounding) breaks the hash
    match. At 100 TB this is one Arrow-batched map pass over the
    binary column; only (doc_id, 2x32-bit ints) shuffle.

    Reference parity: the curation twin of C56's exact media dedup —
    exact digest catches identical bytes, dHash catches re-encodes and
    resizes (Manku-style near-dup, image modality).
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    media = media_table_encoded(spark, sf_dir, only_kind="image")

    def _phash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                pix = codecs.decode_bmp(bytes(payload))
                h, w, _ = pix.shape
                gray = pix.astype(np.int64).sum(axis=2)  # (h, w)
                yi = (np.arange(_PH_H) * h) // _PH_H
                xi = (np.arange(_PH_W) * w) // _PH_W
                g = gray[yi][:, xi]  # (8, 9)
                bits = (g[:, :-1] > g[:, 1:]).astype(np.int64)  # (8, 8)
                ks = np.arange(64).reshape(_PH_H, _PH_W - 1)
                # clip shift counts BEFORE shifting: np.where evaluates
                # both branches, and 1 << (ks - 32) with ks < 32 is a
                # negative-count shift (C-level UB in numpy) even though
                # the mask discards it.  Clipped counts stay in [0, 31].
                lo = int(
                    (bits * np.where(ks < 32, 1 << np.clip(ks, 0, 31), 0))
                    .sum()
                )
                hi = int(
                    (
                        bits
                        * np.where(
                            ks >= 32, 1 << np.clip(ks - 32, 0, 31), 0
                        )
                    ).sum()
                )
                out.append(
                    (int(doc_id), w, h, hi, lo, int(bits.sum()))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "w", "h", "phash_hi", "phash_lo", "n_set_bits",
                ],
            )

    schema = (
        "doc_id bigint, w int, h int, phash_hi bigint, phash_lo bigint, "
        "n_set_bits int"
    )
    return media.mapInPandas(_phash, schema=schema).orderBy("doc_id")


MEDIA_PHASH_SQL = f"""
WITH imgs AS (
  SELECT doc_id,
         CAST(n_chars % 64 + 16 AS INT) AS w,
         CAST(n_chars % 48 + 12 AS INT) AS h
  FROM documents WHERE doc_id % 3 = 0
),
grid AS (
  SELECT doc_id, w, h, yy, xx,
         (yy * h) // {_PH_H} AS yi,
         (xx * w) // {_PH_W} AS xi
  FROM imgs,
       (SELECT unnest(generate_series(0, {_PH_H - 1})) AS yy),
       (SELECT unnest(generate_series(0, {_PH_W - 1})) AS xx)
),
gray AS (
  SELECT doc_id, w, h, yy, xx,
         ((doc_id + (yi * w + xi) * 3) % 256)
       + ((doc_id + (yi * w + xi) * 3 + 1) % 256)
       + ((doc_id + (yi * w + xi) * 3 + 2) % 256) AS g
  FROM grid
),
bits AS (
  SELECT doc_id, w, h, yy, xx,
         CASE WHEN g > LEAD(g) OVER (
           PARTITION BY doc_id, yy ORDER BY xx) THEN 1 ELSE 0 END AS bit
  FROM gray
  QUALIFY xx < {_PH_W - 1}
)
SELECT doc_id, w, h,
       CAST(SUM(CASE WHEN yy * 8 + xx >= 32
                     THEN bit * (1::BIGINT << (yy * 8 + xx - 32))
                     ELSE 0 END) AS BIGINT) AS phash_hi,
       CAST(SUM(CASE WHEN yy * 8 + xx < 32
                     THEN bit * (1::BIGINT << (yy * 8 + xx))
                     ELSE 0 END) AS BIGINT) AS phash_lo,
       CAST(SUM(bit) AS INT) AS n_set_bits
FROM bits
GROUP BY doc_id, w, h
ORDER BY doc_id
"""


_AF_FRAME = 256  # samples per analysis frame (stated)
_AF_LOUD_T = 1_400_000 * _AF_FRAME  # frame sum-of-squares loudness floor

AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, n_frames bigint, zero_crossings bigint,"
    " total_energy bigint, mean_abs bigint, loud_frames bigint"
)


def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C111 (round-8 addition): audio feature extraction over REAL
    RIFF/WAVE bytes — the mapInPandas stage a speech-data pipeline
    runs before any model sees a waveform: per audio doc the sample
    count, 256-sample frame count (final partial frame included),
    zero-crossing count (sign-change rule stated below), total energy
    (sum of squared samples — exact BIGINT), mean |sample| (floor),
    and the count of LOUD frames (frame sum-of-squares >= the stated
    floor — the voice-activity-detection primitive). Every statistic
    is computed from DECODED PCM arrays in numpy, nothing from
    metadata; the payloads are genuine WAV files parsed by RIFF
    (codecs.py). The oracle re-derives the identical integers from the
    closed-form generative signal s_i = (doc_id*7 + 13*i) mod 4096 -
    2048 via an unnested index range — both engines state the same
    integer recurrence, the multimodal_decode discipline.

    Zero crossing: i in [1, n) where (s[i-1] < 0) != (s[i] < 0).

    Plan: kind pruning happens BEFORE encoding (doc_id%3 pushdown);
    encode and analyze are two Arrow-batched map stages with bytes
    dropped at the feature projection; the only shuffle is the final
    orderBy. At 100 TB this is the embarrassingly-parallel shape —
    executor memory bounded by Arrow batch size, not partition size.
    """
    enc = media_table_encoded(spark, sf_dir, only_kind="audio")

    def _features(batches):
        import numpy as np
        import pandas as pd

        from . import codecs

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, s = codecs.decode_wav(bytes(payload))
                s = s.astype(np.int64)
                n = len(s)
                neg = s < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                energy = int(np.sum(s * s))
                mean_abs = int(np.sum(np.abs(s)) // n) if n else 0
                n_frames = (n + _AF_FRAME - 1) // _AF_FRAME
                loud = 0
                for f in range(n_frames):
                    fr = s[f * _AF_FRAME : (f + 1) * _AF_FRAME]
                    if int(np.sum(fr * fr)) >= _AF_LOUD_T:
                        loud += 1
                rows.append(
                    (int(doc_id), n, n_frames, zc, energy, mean_abs, loud)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_frames", "zero_crossings",
                    "total_energy", "mean_abs", "loud_frames",
                ],
            )

    return (
        enc.mapInPandas(_features, schema=AUDIO_FEATURES_SCHEMA)
        .orderBy("doc_id")
    )


MEDIA_AUDIO_FEATURES_SQL = f"""
WITH audio_docs AS (
  SELECT doc_id, n_chars * 16 AS n
  FROM documents WHERE doc_id % 3 = 1
),
samples AS (
  SELECT doc_id, n, unnest(range(0, n)) AS i
  FROM audio_docs
),
vals AS (
  SELECT doc_id, n, i,
         (doc_id * 7 + 13 * i) % 4096 - 2048 AS s,
         i // {_AF_FRAME} AS frame
  FROM samples
),
frames AS (
  SELECT doc_id, frame, SUM(s * s) AS fe
  FROM vals GROUP BY doc_id, frame
),
per_doc AS (
  SELECT v.doc_id,
         MAX(v.n) AS n_samples,
         SUM(CASE WHEN v.i > 0 AND
               ((((v.doc_id * 7 + 13 * (v.i - 1)) % 4096 - 2048) < 0)
                <> (v.s < 0)) THEN 1 ELSE 0 END) AS zero_crossings,
         SUM(v.s * v.s) AS total_energy,
         SUM(ABS(v.s)) // MAX(v.n) AS mean_abs
  FROM vals v GROUP BY v.doc_id
),
loud AS (
  SELECT doc_id, COUNT(*) AS n_frames,
         SUM(CASE WHEN fe >= {_AF_LOUD_T} THEN 1 ELSE 0 END) AS loud_frames
  FROM frames GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(p.n_samples AS BIGINT) AS n_samples,
       CAST(l.n_frames AS BIGINT) AS n_frames,
       CAST(p.zero_crossings AS BIGINT) AS zero_crossings,
       CAST(p.total_energy AS BIGINT) AS total_energy,
       CAST(p.mean_abs AS BIGINT) AS mean_abs,
       CAST(l.loud_frames AS BIGINT) AS loud_frames
FROM per_doc p JOIN loud l USING (doc_id)
ORDER BY p.doc_id
"""


_PH_MAX_HAMMING = 3  # Manku near-dup radius; pigeonhole blocks = 4 x 16 bit


def media_phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C113 (round-8 addition): perceptual near-duplicate IMAGE pairs —
    C55's pigeonhole search applied to the dHash domain over REAL
    decoded BMP bytes: two images are near-dups when their 64-bit
    dHashes (C75, computed from actual pixel decode in mapInPandas)
    differ in <= {d} bits, and any such pair agrees exactly on one of
    4 16-bit blocks — so candidates come from equi-joins on
    (block_idx, block_value), never an all-pairs Hamming scan, and
    verification is two xor+bit_count ops per candidate. Emits every
    verified ordered pair with its exact Hamming distance.

    Output honesty: the generative image corpus is DENSE in near-dups
    (~4.5% of all pairs at sf0.01 — doc_id enters the pixel formula
    mod 256, so the hash space saturates), which makes the op
    output-bound at scale like the radius joins (B23/B64 discipline):
    the JOIN stays block-bucketed; the answer itself grows with the
    true pair count, and the 100x probe reads accordingly.

    Oracle: DuckDB re-derives the dHash from the closed-form
    generative pixel formula (the C75 discipline — any decode bug
    breaks the match) and states the SAME 4-block equi-join + Hamming
    verify, so neither engine ever enumerates all pairs.
    """.format(d=_PH_MAX_HAMMING)
    fp = media_phash(spark, sf_dir).select(
        "doc_id",
        "phash_hi",
        "phash_lo",
        F.expr("phash_lo % 65536").alias("blk0"),
        F.expr("phash_lo div 65536").alias("blk1"),
        F.expr("phash_hi % 65536").alias("blk2"),
        F.expr("phash_hi div 65536").alias("blk3"),
    )
    from .dedup import _swap_persist

    fp = _swap_persist("media_phash_fp", fp)
    unpiv = fp.select(
        "doc_id",
        F.expr(
            "stack(4, 0, blk0, 1, blk1, 2, blk2, 3, blk3) AS (blk_idx, blk_val)"
        ),
    )
    cand = (
        unpiv.alias("a")
        .join(
            unpiv.alias("b"),
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash_hi").alias("hi_a"),
        F.col("phash_lo").alias("lo_a"),
    )
    fb = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash_hi").alias("hi_b"),
        F.col("phash_lo").alias("lo_b"),
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming",
            F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"),
        )
        .filter(F.col("hamming") <= _PH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


MEDIA_PHASH_NEAR_PAIRS_SQL = f"""
WITH imgs AS (
  SELECT doc_id,
         CAST(n_chars % 64 + 16 AS INT) AS w,
         CAST(n_chars % 48 + 12 AS INT) AS h
  FROM documents WHERE doc_id % 3 = 0
),
grid AS (
  SELECT doc_id, w, h, yy, xx,
         (yy * h) // {_PH_H} AS yi,
         (xx * w) // {_PH_W} AS xi
  FROM imgs,
       (SELECT unnest(generate_series(0, {_PH_H - 1})) AS yy),
       (SELECT unnest(generate_series(0, {_PH_W - 1})) AS xx)
),
gray AS (
  SELECT doc_id, yy, xx,
         ((doc_id + (yi * w + xi) * 3) % 256)
       + ((doc_id + (yi * w + xi) * 3 + 1) % 256)
       + ((doc_id + (yi * w + xi) * 3 + 2) % 256) AS g
  FROM grid
),
bits AS (
  SELECT doc_id, yy, xx,
         CASE WHEN g > LEAD(g) OVER (
           PARTITION BY doc_id, yy ORDER BY xx) THEN 1 ELSE 0 END AS bit
  FROM gray
  QUALIFY xx < {_PH_W - 1}
),
fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN yy * 8 + xx >= 32
                       THEN bit * (1::BIGINT << (yy * 8 + xx - 32))
                       ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN yy * 8 + xx < 32
                       THEN bit * (1::BIGINT << (yy * 8 + xx))
                       ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY doc_id
),
blocks AS (
  SELECT doc_id, blk_idx,
         CASE blk_idx WHEN 0 THEN lo % 65536
                      WHEN 1 THEN lo // 65536
                      WHEN 2 THEN hi % 65536
                      ELSE hi // 65536 END AS blk_val
  FROM fp, (SELECT unnest(generate_series(0, 3)) AS blk_idx)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a
  JOIN blocks b ON a.blk_idx = b.blk_idx AND a.blk_val = b.blk_val
              AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo))
            AS INT) AS hamming
FROM cand c
JOIN fp fa ON fa.doc_id = c.doc_a
JOIN fp fb ON fb.doc_id = c.doc_b
WHERE bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo))
      <= {_PH_MAX_HAMMING}
ORDER BY c.doc_a, c.doc_b
"""
