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
- ``rabbitmq`` — the reference's LITERAL transport (rabbitmq.go):
               a pure-stdlib AMQP 0-9-1 consumer (sources/amqp.py)
               drains the queue into a spool directory with the Go
               consumer's idle-timeout batch framing + deferred
               multiple-ack, and the stream is the text source over
               the spool. Raises ConnectionError when no broker is
               reachable (tests print the skip reason).
- ``rabbitmq-double`` — file-backed stream reshaped through the AMQP
               delivery record shape and decoded by the SAME `body` →
               `line` projection as real deliveries (the broker-less
               CI path, mirroring kafka-double).
- ``rate``   — synthetic throughput source for load tests.

rabbitmq.go:39 sanitization (`[\\t\\r\\n]+` → ' ') is NOT done here —
`parse_maxwell` applies it so every transport gets it uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def _kafka_to_lines(records: DataFrame, keep: tuple = ()) -> DataFrame:
    """Kafka record frame (binary key/value + topic/partition/offset) →
    the uniform one-column `line` protocol (+ ``keep`` metadata columns
    — offset/partition — passed through untouched, mirroring
    ``parse_maxwell``'s keep contract).

    Shared by the real kafka source, the test double, and the
    segment-replay path (kafka_wire.py) so the decode path the tests
    exercise IS the production path. Framing mirrors the reference
    consumer (rabbitmq.go:95-186): each record is one complete Maxwell
    envelope (no cross-record reassembly), offsets are committed by the
    streaming checkpoint AFTER the batch lands — the same ack-at-end
    contract as the Go consumer's deferred channel.Ack.
    """
    return records.select(
        *[F.col(c) for c in keep],
        F.col("value").cast("string").alias("line"),
    )


def kafka_record_double(
    stream: DataFrame, topic: str = "maxwell", partition: int = 0
) -> DataFrame:
    """Reshape any single-string-column stream into the EXACT column set
    the Kafka source emits (binary key/value, topic, partition, offset,
    timestamp, timestampType) — a test double for clusters without the
    kafka package on the classpath. Offsets are not globally ordered
    here (file source has no broker log); downstream must not rely on
    them, matching real multi-partition Kafka semantics.
    """
    src_col = stream.columns[0]
    return stream.select(
        F.lit(None).cast("binary").alias("key"),
        F.col(src_col).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.lit(partition).cast("int").alias("partition"),
        F.lit(-1).cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def _amqp_to_lines(records: DataFrame) -> DataFrame:
    """AMQP delivery frame (binary body + exchange/routing-key/tag
    metadata) → the uniform one-column `line` protocol.

    Shared by the real rabbitmq spool path's record view and the test
    double, mirroring `_kafka_to_lines`: each delivery body is one
    complete Maxwell envelope (rabbitmq.go:181 prints one body per
    line), acks are deferred to after the batch lands (the consumer's
    multiple-ack — sources/amqp.py `drain`).
    """
    return records.select(F.col("body").cast("string").alias("line"))


def amqp_delivery_double(
    stream: DataFrame,
    exchange: str = "test-exchange",
    routing_key: str = "test-key",
    consumer_tag: str = "simple-consumer",
) -> DataFrame:
    """Reshape any single-string-column stream into the AMQP delivery
    record shape (amqp.Delivery's fields: body, consumer_tag,
    delivery_tag, redelivered, exchange, routing_key) — a test double
    for broker-less environments, mirroring `kafka_record_double`.
    Delivery tags are not globally ordered here (no broker channel);
    downstream must not rely on them, matching redelivery semantics.
    """
    src_col = stream.columns[0]
    return stream.select(
        F.col(src_col).cast("binary").alias("body"),
        F.lit(consumer_tag).alias("consumer_tag"),
        F.lit(-1).cast("long").alias("delivery_tag"),
        F.lit(False).alias("redelivered"),
        F.lit(exchange).alias("exchange"),
        F.lit(routing_key).alias("routing_key"),
    )


def read_bus_stream(spark: SparkSession, kind: str, **opts: str) -> DataFrame:
    """Return a streaming DataFrame with exactly one `line` string column.

    opts per kind:
      text:         path (required)
      socket:       host, port
      kafka:        bootstrap_servers, topic, starting_offsets (default earliest)
      kafka-double: path (required), topic — file-backed stream reshaped
                    through the Kafka record schema and decoded by the
                    SAME projection as the real kafka source (CI path
                    for kafka-shaped pipelines in broker-less sandboxes)
      rabbitmq:     spool (required; batch landing dir), host, port,
                    exchange, exchange_type, queue, binding_key,
                    consumer_tag, idle_timeout, retries, retry_delay —
                    one reference-consumer drain cycle
                    (connect/declare/consume/spool/ack) runs eagerly,
                    then the stream tails the spool. retries > 0
                    reconnects after a mid-batch connection loss and
                    drains the redelivered batch (at-least-once spool;
                    downstream dedup absorbs the overlap).
                    ConnectionError when no broker answers.
      rabbitmq-double: path (required), exchange, routing_key —
                    file-backed stream reshaped through the AMQP
                    delivery shape, decoded by the same projection as
                    real deliveries
      rate:         rows_per_second
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
        return _kafka_to_lines(
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", opts["bootstrap_servers"])
            .option("subscribe", opts["topic"])
            .option("startingOffsets", opts.get("starting_offsets", "earliest"))
            .load()
        )
    if kind == "kafka-double":
        raw = spark.readStream.format("text").load(opts["path"])
        return _kafka_to_lines(
            kafka_record_double(raw, topic=opts.get("topic", "maxwell"))
        )
    if kind == "rabbitmq":
        from . import amqp

        spool = opts["spool"]
        amqp.consume_to_spool(
            spool,
            host=opts.get("host", "localhost"),
            port=int(opts.get("port", "5672")),
            exchange=opts.get("exchange", "test-exchange"),
            exchange_type=opts.get("exchange_type", "direct"),
            queue=opts.get("queue", "test-queue"),
            binding_key=opts.get("binding_key", "test-key"),
            consumer_tag=opts.get("consumer_tag", "simple-consumer"),
            idle_timeout=float(opts.get("idle_timeout", "0.1")),
            retries=int(opts.get("retries", "0")),
            retry_delay=float(opts.get("retry_delay", "0.2")),
        )
        return (
            spark.readStream.format("text")
            .load(spool)
            .withColumnRenamed("value", "line")
        )
    if kind == "rabbitmq-double":
        raw = spark.readStream.format("text").load(opts["path"])
        return _amqp_to_lines(
            amqp_delivery_double(
                raw,
                exchange=opts.get("exchange", "test-exchange"),
                routing_key=opts.get("routing_key", "test-key"),
            )
        )
    if kind == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", opts.get("rows_per_second", "1000"))
            .load()
            .select(F.col("value").cast("string").alias("line"))
        )
    raise ValueError(f"unknown bus kind: {kind!r}")
