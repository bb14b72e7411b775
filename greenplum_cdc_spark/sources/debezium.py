"""Debezium CDC envelope source.

The reference's transport consumes Maxwell envelopes from RabbitMQ
(rabbitmq.go:24-186); the de-facto public successor of that wire format
is Debezium's change-event envelope (debezium.io, Kafka Connect):

    {"before": null | {row image},
     "after":  {row image} | null,
     "source": {"version": ..., "connector": "postgresql",
                "name": ..., "ts_ms": ..., "db": ..., "schema": ...,
                "table": ..., "lsn": ..., "txId": ...},
     "op": "c" | "u" | "d" | "r",
     "ts_ms": ...}

Structural differences from Maxwell this adapter absorbs so the ENTIRE
downstream (archive, snapshot/apply, watermark, replica stores) is
reused untouched — the same plug-the-parser contract as the wal2json
adapter (sources/wal2json.py):

- the op vocabulary is single letters: ``c``(reate)/``r``(ead, initial
  snapshot) map onto ``insert``, ``u`` onto ``update``, ``d`` onto
  ``delete``;
- deletes carry the row image in ``before`` (``after`` is null) — the
  inverse of Maxwell's `data`/`old` split;
- commit metadata lives in the nested ``source`` struct (``lsn`` is the
  total order within the source's WAL, ``txId`` the transaction,
  ``ts_ms`` the commit clock at ms precision).

Spark-first notes: one ``from_json`` against a declared schema into a
named struct column (exactly one JSON decode — see parse_maxwell's
measured 3x note), ``before``/``after`` as map<string,string> deferring
typing to the SchemaRegistry like the other adapters; everything is a
map-side projection, no shuffle, so the parse scales with input splits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .maxwell import sanitize_line

DEBEZIUM_SCHEMA = (
    "before map<string,string>, after map<string,string>,"
    " source struct<version string, connector string, name string,"
    " ts_ms bigint, db string, schema string, table string,"
    " lsn bigint, txId bigint>,"
    " op string, ts_ms bigint"
)

# Debezium op letters -> the op vocabulary process_events() understands
# (cdc_plpgsql_functions.sql:125-225). `r` is the initial-snapshot read:
# semantically an insert for apply purposes.
_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def op_to_dml(op_code):
    """Single-letter Debezium op -> insert/update/delete (else NULL)."""
    expr = None
    for code, dml in _OP_MAP.items():
        expr = (F if expr is None else expr).when(
            op_code == code, F.lit(dml)
        )
    return expr


def parse_debezium(
    raw: DataFrame, line_col: str = "line", keep: tuple = ()
) -> DataFrame:
    """Raw Debezium JSON lines → the SAME typed CDC frame the Maxwell
    and wal2json parsers produce (ts, database_name, table_name, op,
    xid, data, old, sql, event_json) plus the Debezium-specific
    ``op_code`` and ``lsn``:

    - ``data`` = the surviving row image (``after``, or ``before`` for
      deletes — matching Maxwell's delete carrying the old row in
      `data`), ``old`` = ``before`` for updates;
    - ``xid`` = source.txId, ``ts`` = source.ts_ms (commit clock);
    - malformed lines yield NULL op and are quarantined downstream,
      the SEGMENT REJECT LIMIT analog.
    """
    parsed = raw.select(
        *[F.col(c) for c in keep],
        F.from_json(sanitize_line(F.col(line_col)), DEBEZIUM_SCHEMA).alias(
            "_j"
        ),
        F.col(line_col).alias("event_json"),
    )
    op_code = F.col("_j.op")
    return parsed.select(
        *[F.col(c) for c in keep],
        F.timestamp_millis(F.col("_j.source.ts_ms")).alias("ts"),
        F.col("_j.source.db").alias("database_name"),
        F.col("_j.source.table").alias("table_name"),
        op_to_dml(op_code).alias("op"),
        op_code.alias("op_code"),
        F.col("_j.source.lsn").alias("lsn"),
        F.col("_j.source.txId").alias("xid"),
        F.when(op_code == "d", F.col("_j.before"))
        .otherwise(F.col("_j.after"))
        .alias("data"),
        F.when(op_code == "u", F.col("_j.before")).alias("old"),
        F.lit(None).cast("string").alias("sql"),
        "event_json",
    )
