"""Pluggable message-bus stream source — the `rabbitmq.go` consumer slot.

The reference reads Maxwell JSON from RabbitMQ inside a Greenplum
external web table (maxwell_gpdb.sql:5-11, rabbitmq.go:95-186), i.e. the
bus is a swappable transport in front of a fixed line-oriented protocol.
Here the transport is a Structured Streaming source behind one factory:
every variant yields the same single-column `line` frame, so the whole
downstream pipeline (parse → merge → watermark) is transport-agnostic —
exactly how the reference's SQL never knows RabbitMQ exists.

Supported kinds:
- ``text``   — file drop directory (used by tests and the local demo;
               also the replay path for the parquet archive).
- ``socket`` — TCP line source (Spark's built-in socket source; the
               closest local analog of a broker subscription).
- ``kafka``  — the production path on a real cluster. Requires the
               spark-sql-kafka package on the classpath; config keys
               mirror rabbitmq.go's env-driven setup (run_maxwell.py).
- ``rate``   — synthetic throughput source for load tests.

rabbitmq.go:39 sanitization (`[\\t\\r\\n]+` → ' ') is NOT done here —
`parse_maxwell` applies it so every transport gets it uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def read_bus_stream(spark: SparkSession, kind: str, **opts: str) -> DataFrame:
    """Return a streaming DataFrame with exactly one `line` string column.

    opts per kind:
      text:   path (required)
      socket: host, port
      kafka:  bootstrap_servers, topic, starting_offsets (default earliest)
      rate:   rows_per_second
    """
    kind = kind.lower()
    if kind == "text":
        return (
            spark.readStream.format("text")
            .load(opts["path"])
            .withColumnRenamed("value", "line")
        )
    if kind == "socket":
        return (
            spark.readStream.format("socket")
            .option("host", opts.get("host", "localhost"))
            .option("port", opts.get("port", "9999"))
            .load()
            .withColumnRenamed("value", "line")
        )
    if kind == "kafka":
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", opts["bootstrap_servers"])
            .option("subscribe", opts["topic"])
            .option("startingOffsets", opts.get("starting_offsets", "earliest"))
            .load()
            .select(F.col("value").cast("string").alias("line"))
        )
    if kind == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", opts.get("rows_per_second", "1000"))
            .load()
            .select(F.col("value").cast("string").alias("line"))
        )
    raise ValueError(f"unknown bus kind: {kind!r}")
