from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from greenplum_cdc_spark.streaming.pipeline import (
    CDCPipeline,
    ReplicaStore,
    stream_windowed_counts,
)

BATCH1 = [
    '{"database":"music","table":"album","type":"insert","ts":1700000001,"xid":1,"data":{"id":"1","title":"First"}}',
    '{"database":"music","table":"album","type":"insert","ts":1700000002,"xid":2,"data":{"id":"2","title":"Second"}}',
    '{"database":"music","table":"album","type":"update","ts":1700000003,"xid":3,"data":{"id":"1","title":"First v2"},"old":{"title":"First"}}',
]
BATCH2 = [
    '{"database":"music","table":"album","type":"delete","ts":1700000004,"xid":4,"data":{"id":"2","title":"Second"}}',
    '{"database":"music","table":"album","type":"insert","ts":1700000005,"xid":5,"data":{"id":"3","title":"Third"}}',
]


def _write_lines(path: str, name: str, lines):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_kafka_double_bus_matches_text_bus(spark, tmp_path):
    """The kafka-shaped factory path (binary value -> line) must decode
    to the same parsed events as the plain text transport, including the
    rabbitmq.go:39 sanitization applied downstream in parse_maxwell."""
    from greenplum_cdc_spark.sources.bus import read_bus_stream
    from greenplum_cdc_spark.sources.maxwell import parse_maxwell

    dirty = BATCH1 + [
        # literal tab BYTE in the payload (invalid JSON per spec) — the
        # rabbitmq.go:39 sanitize collapses it to a space so the parse
        # succeeds; a JSON \t ESCAPE would instead survive untouched
        '{"database":"music","table":"album","type":"insert","ts":1700000009,'
        '"xid":9,"data":{"id":"9","title":"Tab\there"}}'
    ]
    inbox = str(tmp_path / "inbox")
    _write_lines(inbox, "b1.json", dirty)

    results = {}
    for kind, opts in (
        ("text", {"path": inbox}),
        ("kafka-double", {"path": inbox, "topic": "maxwell"}),
    ):
        out = []
        stream = read_bus_stream(spark, kind, **opts)
        assert stream.columns == ["line"]  # uniform bus protocol
        q = (
            parse_maxwell(stream)
            .writeStream.foreachBatch(
                lambda b, _id, acc=out: acc.extend(
                    b.select("op", "ts", "xid", "data").collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{kind}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results[kind] = sorted((r["xid"], r["op"], r["data"]["title"]) for r in out)

    assert results["text"] == results["kafka-double"]
    assert len(results["text"]) == 4
    by_xid = dict((x, t) for x, _, t in results["text"])
    assert by_xid[9] == "Tab here"  # sanitize collapsed the tab


def test_kafka_record_double_schema(spark):
    """The double reshapes to the exact Kafka source column set."""
    from greenplum_cdc_spark.sources.bus import kafka_record_double

    df = kafka_record_double(spark.createDataFrame([("x",)], "line string"))
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[
        "value"
    ] == "binary"


def test_pipeline_end_to_end(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    pipe = CDCPipeline(
        spark,
        replica_path=str(tmp_path / "replica"),
        archive_path=str(tmp_path / "archive"),
    )

    _write_lines(inbox, "b1.json", BATCH1)
    pipe.run_available(inbox, str(tmp_path / "ckpt1"))
    state = {r["pk"]: r["data"]["title"] for r in pipe.store.read().collect()}
    assert state == {1: "First v2", 2: "Second"}

    # second poll cycle: new file lands, same inbox, fresh checkpoint dir
    # is NOT used — the stream must only pick up the delta
    _write_lines(inbox, "b2.json", BATCH2)
    pipe.run_available(inbox, str(tmp_path / "ckpt1"))
    state = {r["pk"]: r["data"]["title"] for r in pipe.store.read().collect()}
    assert state == {1: "First v2", 3: "Third"}

    wm = pipe.watermark().collect()[0]
    assert wm["n_rows"] == 2
    assert wm["high_watermark_ts"].year == 2023

    # archive got every event, date-partitioned
    archived = spark.read.parquet(str(tmp_path / "archive"))
    assert archived.count() == 5
    assert "event_date" in archived.columns


def test_replica_store_versioning(spark, tmp_path):
    store = ReplicaStore(spark, str(tmp_path / "rep"))
    assert store.read() is None
    df = spark.createDataFrame([(1, "a")], "pk bigint, v string")
    assert store.commit(df) == 1
    assert store.commit(df.withColumn("v", F.lit("b"))) == 2
    assert store.current_version() == 2
    assert store.read().collect()[0]["v"] == "b"


@pytest.mark.slow
def test_stream_windowed_counts_matches_batch(spark, sf_dir):
    out = stream_windowed_counts(spark, sf_dir)
    got = {(r["hour_start"], r["event_type"]): r["n_events"] for r in out.collect()}
    from greenplum_cdc_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    exp = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_stream_cdc_pipeline_query_matches_snapshot(spark, sf_dir):
    """A10 e2e equals the batch latest-wins snapshot of the same feed."""
    from greenplum_cdc_spark.plans import cdc_queries
    from greenplum_cdc_spark.streaming import pipeline as sp

    e2e = sp.stream_cdc_pipeline(spark, sf_dir).collect()
    snap = cdc_queries.cdc_snapshot_latest(spark, sf_dir).collect()
    assert [r["pk"] for r in e2e] == [r["pk"] for r in snap]
    assert [r["last_seq"] for r in e2e] == [r["last_seq"] for r in snap]


def test_bus_source_text_kind(spark, tmp_path):
    """The transport factory yields the uniform one-column `line` frame."""
    from greenplum_cdc_spark.sources.bus import read_bus_stream

    p = tmp_path / "in"
    p.mkdir()
    (p / "a.txt").write_text('{"database":"d","table":"t","type":"insert"}\n')
    stream = read_bus_stream(spark, "text", path=str(p))
    assert stream.isStreaming and stream.columns == ["line"]

    import pytest

    with pytest.raises(ValueError):
        read_bus_stream(spark, "carrier-pigeon")


def test_fanout_pipeline_sinks_identical(spark, tmp_path):
    """Reference TODO: fan-out to a second sink — both replicas equal."""
    import json

    from greenplum_cdc_spark.streaming.pipeline import FanoutCDCPipeline

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    lines = [
        {"database": "d", "table": "t", "type": "insert", "ts": 1700000000,
         "xid": i, "data": {"id": str(i % 3), "v": str(i)}}
        for i in range(9)
    ] + [
        {"database": "d", "table": "t", "type": "delete", "ts": 1700000900,
         "xid": 99, "data": {"id": "1"}}
    ]
    (in_dir / "feed.json").write_text("\n".join(json.dumps(x) for x in lines))

    pipe = FanoutCDCPipeline(
        spark,
        [str(tmp_path / "rep_a"), str(tmp_path / "rep_b")],
        key_cols=("pk",),
    )
    pipe.run_available(str(in_dir), str(tmp_path / "ckpt"))

    a = sorted(pipe.stores[0].read().select("pk", "seq").collect())
    b = sorted(pipe.stores[1].read().select("pk", "seq").collect())
    assert a == b
    assert [r["pk"] for r in a] == [0, 2]  # pk=1 deleted last


def test_pipeline_pk_change_and_watermark(spark, tmp_path):
    """A Maxwell update that changes the PK moves the row (old key
    deleted), and the maxwell_ts-analog watermark is persisted."""
    import json
    import os

    from greenplum_cdc_spark.streaming.pipeline import CDCPipeline

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    lines = [
        {"database": "d", "table": "t", "type": "insert", "ts": 1700000000,
         "xid": 1, "data": {"id": "1", "v": "a"}},
        {"database": "d", "table": "t", "type": "update", "ts": 1700000100,
         "xid": 2, "data": {"id": "2", "v": "a"}, "old": {"id": "1"}},
    ]
    (in_dir / "feed.json").write_text("\n".join(json.dumps(x) for x in lines))

    pipe = CDCPipeline(spark, str(tmp_path / "rep"), key_cols=("pk",))
    pipe.run_available(str(in_dir), str(tmp_path / "ckpt"))
    pks = [r["pk"] for r in pipe.store.read().select("pk").collect()]
    assert pks == [2]

    wm_path = os.path.join(str(tmp_path / "rep"), "_watermark")
    wm = spark.read.parquet(wm_path).collect()
    assert len(wm) == 1 and wm[0]["n_applied"] == 1


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: a hash emits once EVER, across batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from greenplum_cdc_spark.streaming.stateful import run_stream_dedup

    in_dir = tmp_path / "docs"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def _drop(name, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            str(in_dir / name),
        )

    # batch 1: two distinct texts, one duplicated within the batch
    _drop("b1.parquet", [(1, "alpha"), (2, "beta"), (3, "alpha")])
    rows1 = {r["first_doc_id"]: r for r in run_stream_dedup(spark, str(in_dir), ckpt, out).collect()}
    assert set(rows1) == {1, 2}
    assert rows1[1]["n_new_in_batch"] == 2  # in-batch duplicate folded

    # batch 2: replay of alpha + one new text -> only the new one emits
    _drop("b2.parquet", [(4, "alpha"), (5, "gamma")])
    rows2 = {r["first_doc_id"]: r for r in run_stream_dedup(spark, str(in_dir), ckpt, out).collect()}
    assert set(rows2) == {1, 2, 5}  # alpha replay suppressed by state


def test_stream_sessionize_matches_batch_minus_open(spark, sf_dir):
    """Closed sessions from the stateful stream == batch sessionization
    minus each user's final (still-open) session — across 3 micro-batches,
    so sessions spanning batch boundaries must be stitched via state."""
    from greenplum_cdc_spark.operators import timeseries
    from greenplum_cdc_spark.streaming import stateful

    streamed = {
        (r["user_id"], r["sess_idx"], r["session_start"], r["session_end"], r["n_events"])
        for r in stateful.stream_sessionize_query(spark, sf_dir).collect()
    }
    batch = timeseries.events_sessionize(spark, sf_dir).collect()
    last = {}
    for r in batch:
        last[r["user_id"]] = max(last.get(r["user_id"], 0), r["session_idx"])
    expected = {
        (r["user_id"], r["session_idx"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch
        if r["session_idx"] < last[r["user_id"]]
    }
    assert streamed == expected


def test_stream_interval_join_bounds(spark, sf_dir):
    from greenplum_cdc_spark.streaming.pipeline import stream_interval_join

    rows = stream_interval_join(spark, sf_dir).collect()
    two_hours_us = 2 * 3600 * 1_000_000
    for r in rows:
        assert 0 < r["gap_us"] <= two_hours_us


def test_stream_interval_join_matches_batch(spark, sf_dir):
    import pyspark.sql.functions as F

    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.streaming.pipeline import stream_interval_join

    got = {
        (r["view_event_id"], r["click_event_id"])
        for r in stream_interval_join(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("ve"), F.col("ts").alias("vt")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("ce"), F.col("ts").alias("ct")
    )
    want = {
        (r["ve"], r["ce"])
        for r in v.join(c, "u")
        .filter(
            (F.col("ct") > F.col("vt"))
            & (F.unix_micros("ct") - F.unix_micros("vt") <= 2 * 3600 * 1_000_000)
        )
        .collect()
    }
    assert got == want


def test_stream_late_data_drops_and_double_counts(spark, sf_dir):
    """Late echoes below the eviction horizon vanish; echoes of live
    windows double-count; every emitted window is closed (below the
    final watermark) and unique."""
    from greenplum_cdc_spark.streaming.pipeline import stream_late_data

    rows = stream_late_data(spark, sf_dir).collect()
    assert rows
    keys = [(r["hour_start"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys)), "append mode must emit each window once"


def test_stream_dedup_watermark_suppresses_replays(spark, sf_dir):
    import pyspark.sql.functions as F

    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.streaming.stateful import stream_dedup_watermark

    out = stream_dedup_watermark(spark, sf_dir)
    n_out = out.count()
    n_src = load_table(spark, sf_dir, "events").count()
    assert n_out == n_src
    assert out.select(F.countDistinct("event_id")).first()[0] == n_src


def test_socket_transport_end_to_end(spark, tmp_path):
    """A REAL network transport through the production path: a local TCP
    server plays the broker (the rabbitmq.go consumer slot), Spark's
    socket source subscribes via `read_bus_stream('socket')`, and the
    live stream runs through the REAL `parse_maxwell` — the closest a
    no-external-network sandbox gets to the reference's RabbitMQ
    subscription, and the first test that exercises the bus factory's
    network kind against actual bytes on a wire."""
    import json
    import socket
    import threading
    import time

    from greenplum_cdc_spark.sources.bus import read_bus_stream
    from greenplum_cdc_spark.sources.maxwell import parse_maxwell

    envelopes = [
        json.dumps(
            {
                "database": "appdb",
                "table": "events",
                "type": "insert" if i % 2 == 0 else "delete",
                "ts": 1700000000 + i,
                "xid": 1000 + i,
                "data": {"user_id": i, "value": float(i), "event_type": "page"},
            }
        )
        for i in range(6)
    ]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)
    done = threading.Event()

    def serve():
        conn, _ = server.accept()
        try:
            conn.sendall(("\n".join(envelopes) + "\n").encode())
            done.wait(timeout=90)  # keep the wire open until the test read it all
        finally:
            conn.close()
            server.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = read_bus_stream(spark, "socket", host="127.0.0.1", port=str(port))
    parsed = parse_maxwell(stream)
    got: list = []

    def sink(batch, _bid):
        got.extend(batch.collect())

    q = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(got) < len(envelopes):
            time.sleep(0.5)
    finally:
        done.set()
        q.stop()
    assert len(got) == len(envelopes)
    by_xid = {r["xid"]: r for r in got}
    assert sorted(by_xid) == [1000 + i for i in range(6)]
    for i in range(6):
        r = by_xid[1000 + i]
        assert r["op"] == ("insert" if i % 2 == 0 else "delete")
        assert r["database_name"] == "appdb" and r["table_name"] == "events"
