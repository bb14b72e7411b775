"""Custom stateful streaming operators (`applyInPandasWithState`).

The built-in streaming aggregations cover windowed counts (pipeline.py);
anything with per-key custom state — cross-batch exact dedup, per-key
rate limits, session carry-over — needs the arbitrary-state API. The
canonical training-data case implemented here: a streaming corpus where
a document hash must be emitted ONCE ever, across micro-batches, no
matter how the stream is partitioned into batches.

State lives per hash-key group in Spark's state store (RocksDB/HDFS on a
cluster), so the seen-set shards horizontally with the key space —
nothing global, nothing driver-side; at 100 TB of stream history the
state is |distinct hashes| spread over executors, with optional timeout
eviction for bounded retention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("text_hash", StringType()),
        StructField("first_doc_id", LongType()),
        StructField("n_new_in_batch", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the hash group only the FIRST time it is ever seen."""
    if state.exists:
        return  # already emitted in a previous batch — drop silently
    first_id = None
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        batch_min = int(pdf["doc_id"].min())
        first_id = batch_min if first_id is None else min(first_id, batch_min)
    state.update((1,))
    yield pd.DataFrame(
        {"text_hash": [key[0]], "first_doc_id": [first_id], "n_new_in_batch": [n]}
    )


def stream_dedup_exact(docs_stream: DataFrame) -> DataFrame:
    """Cross-batch exact dedup of a streaming document feed.

    Input stream needs (doc_id, text); output is one row per NEW distinct
    text hash with the first doc id that carried it. Replays and
    duplicates in later batches emit nothing.
    """
    hashed = docs_stream.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.md5("text").alias("text_hash")
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_dedup(
    spark: SparkSession, input_path: str, checkpoint: str, out_path: str
) -> DataFrame:
    """Drive stream_dedup_exact over a JSON file drop (availableNow) and
    return ALL emissions accumulated in the parquet sink so far.

    foreachBatch + append parquet is checkpoint-recoverable, so repeated
    invocations resume the SAME query: state survives, replayed hashes
    stay suppressed — the property the test asserts.
    """
    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).json(input_path)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_path)

    q = (
        stream_dedup_exact(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(out_path)
    except Exception:  # no emissions yet
        return spark.createDataFrame([], _OUT_SCHEMA)


def stream_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18 oracle surface: the stateful streaming dedup drained over the
    documents table in one availableNow pass — emissions must equal the
    batch exact-dedup (hash, first doc id, copy count)."""
    import os
    import shutil
    import tempfile

    from ..io import load_table

    base = tempfile.mkdtemp(prefix="stream_dedup_")
    in_dir, ckpt, out = (os.path.join(base, d) for d in ("in", "ckpt", "out"))
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        docs.coalesce(1).write.mode("overwrite").json(in_dir)
        res = run_stream_dedup(spark, in_dir, ckpt, out)
        ordered = res.select(
            "text_hash", "first_doc_id", F.col("n_new_in_batch").alias("n_copies")
        ).orderBy("first_doc_id")
        rows = ordered.collect()
        return spark.createDataFrame(rows, ordered.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


STREAM_DEDUP_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS first_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY first_doc_id
"""
