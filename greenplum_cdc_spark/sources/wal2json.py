"""Postgres logical-decoding (wal2json) CDC envelope source.

Reference TODO #1 (/root/reference/README.md:155) asks for a Postgres
``wal2json`` source next to the Maxwell feed. wal2json (format
version 1) emits ONE JSON document per transaction::

    {"xid": 7, "timestamp": "...", "change": [
        {"kind": "insert", "schema": "public", "table": "t",
         "columnnames": [...], "columntypes": [...],
         "columnvalues": [...]},
        {"kind": "delete", "schema": "public", "table": "t",
         "oldkeys": {"keynames": [...], "keytypes": [...],
                     "keyvalues": [...]}}]}

whereas Maxwell emits one document per row change. The adapter maps the
transaction envelope onto the SAME typed CDC frame ``parse_maxwell``
produces (ts, database_name, table_name, op, xid, data, old, sql,
event_json, + change_idx for intra-transaction order), so the ENTIRE
downstream — archive, snapshot/apply merge, watermark, replica stores —
is reused untouched. That reuse is the point of the TODO: a Postgres
deployment swaps the parser, not the pipeline.

Spark-first notes: one ``from_json`` against a declared schema (a
single whole-stage-codegen projection — mixed-type ``columnvalues``
coerce to string at parse, typing happens later against the
SchemaRegistry exactly as with Maxwell), then ONE ``posexplode`` to
fan the transaction's change array into row-level events. Both are
map-side; the adapter adds no shuffle, so it scales with input splits
like the Maxwell path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .maxwell import sanitize_line

# wal2json format-version-1 transaction envelope. `columnvalues` /
# `keyvalues` are heterogeneous JSON arrays (numbers, strings, bools);
# array<string> coerces every scalar to its raw text, matching how the
# Maxwell map<string,string> payload defers typing to the registry.
WAL2JSON_SCHEMA = (
    "xid bigint, timestamp string, change array<struct<"
    "kind string, schema string, table string,"
    " columnnames array<string>, columntypes array<string>,"
    " columnvalues array<string>,"
    " oldkeys struct<keynames array<string>, keytypes array<string>,"
    " keyvalues array<string>>>>"
)

# wal2json kinds → the op vocabulary process_events() understands
# (cdc_plpgsql_functions.sql:125-225). insert/update/delete map 1:1;
# 'truncate'/'message' pass through lowercased and are filtered by the
# DML_OPS check downstream, same as Maxwell's bootstrap-* ops.


def parse_wal2json(
    raw: DataFrame,
    line_col: str = "line",
    database: str = "appdb",
    keep: tuple = (),
) -> DataFrame:
    """Raw wal2json transaction lines → the typed CDC event frame.

    Output columns are a superset of ``parse_maxwell``'s (same names,
    same types) plus ``change_idx`` — the change's position inside its
    transaction, the intra-txn replay order wal2json guarantees (WAL
    order). Downstream consumers that order by (ts, xid) alone under
    Maxwell order by (ts, xid, change_idx) here.

    - ``op``: lowercased ``kind`` (insert/update/delete).
    - ``data``: columnnames→columnvalues as map<string,string>; NULL
      for deletes (wal2json carries only ``oldkeys`` there).
    - ``old``: oldkeys.keynames→keyvalues; the replica key for deletes
      and the pre-image key for PK-changing updates.
    - ``database_name``: a constant — a wal2json slot is scoped to one
      database, the name lives in the connection, not the envelope.
    - ``sql``: NULL (logical decoding never emits DDL; Maxwell does).
    - malformed lines: NULL envelope → NULL op, quarantined downstream
      exactly like the Maxwell path (SEGMENT REJECT LIMIT analog).
    """
    parsed = raw.select(
        *[F.col(c) for c in keep],
        F.from_json(
            sanitize_line(F.col(line_col)), WAL2JSON_SCHEMA
        ).alias("_j"),
        F.col(line_col).alias("event_json"),
    )
    # posexplode_outer keeps malformed/empty-txn lines as NULL-op rows
    # for the quarantine filter rather than silently dropping them
    exploded = parsed.select(
        *[F.col(c) for c in keep],
        "event_json",
        F.to_timestamp(F.col("_j.timestamp")).alias("ts"),
        F.col("_j.xid").alias("xid"),
        F.posexplode_outer(F.col("_j.change")).alias("change_idx", "_c"),
    )
    return exploded.select(
        *[F.col(c) for c in keep],
        "ts",
        F.lit(database).alias("database_name"),
        F.col("_c.table").alias("table_name"),
        F.lower(F.col("_c.kind")).alias("op"),
        "xid",
        "change_idx",
        F.map_from_arrays(
            F.col("_c.columnnames"), F.col("_c.columnvalues")
        ).alias("data"),
        F.map_from_arrays(
            F.col("_c.oldkeys.keynames"), F.col("_c.oldkeys.keyvalues")
        ).alias("old"),
        F.lit(None).cast("string").alias("sql"),
        "event_json",
    )


# --- wal2json format version 2 -----------------------------------------

# v2 emits ONE JSON document per CHANGE (not per transaction), tagged
# with `action`: B/C transaction markers and I/U/D changes; with the
# include-xids + include-timestamp plugin options every change record
# carries its transaction id and commit timestamp, which is what makes
# a stateless per-line parse possible (the deployment mode this adapter
# targets). Columns arrive as name/type/value structs instead of the
# v1 parallel arrays.
WAL2JSON_V2_SCHEMA = (
    "action string, xid bigint, timestamp string,"
    " schema string, table string,"
    " columns array<struct<name string, type string, value string>>,"
    " identity array<struct<name string, type string, value string>>"
)

_V2_OPS = {"I": "insert", "U": "update", "D": "delete"}


def parse_wal2json_v2(
    raw: DataFrame,
    line_col: str = "line",
    database: str = "appdb",
    keep: tuple = (),
    offset_col: str | None = None,
    single_change_txns: bool = False,
) -> DataFrame:
    """wal2json format-v2 lines → the same typed CDC frame as
    ``parse_wal2json`` (and therefore ``parse_maxwell``): ts,
    database_name, table_name, op, xid, change_idx, data, old, sql,
    event_json.

    - B/C transaction markers and malformed lines surface as NULL-op
      rows for the downstream quarantine filter (B/C are bookkeeping,
      not data — same stance as Maxwell's bootstrap-* ops).
    - ``data``: columns[].name → columns[].value (map); ``old``:
      identity[] the same way (the replica identity on U/D).
    - ``change_idx``: v2's intra-transaction order is LINE order, which
      a stateless per-line parse cannot recover on its own — a
      multi-change transaction touching the same key would tie on
      (ts, xid, change_idx) and the latest-wins merge would pick a
      nondeterministic winner (the v1 parser's ``posexplode`` position
      never has this problem).  So the caller MUST either

      * pass ``offset_col``: a monotonically increasing per-line
        sequence already on ``raw`` (the bus/file byte offset, Kafka
        offset, or a line number) — it becomes ``change_idx``; or
      * assert ``single_change_txns=True``: every transaction in this
        feed carries at most one change (e.g. autocommit workloads),
        so (ts, xid) is already total and ``change_idx`` is 0.

      Neither → ``ValueError``, loudly, rather than a silent
      order-dependent merge.
    """
    if offset_col is None and not single_change_txns:
        raise ValueError(
            "parse_wal2json_v2: multi-change transactions need a line"
            " sequence to order intra-transaction changes; pass"
            " offset_col=<monotone per-line column> (bus offset / line"
            " number), or single_change_txns=True if every transaction"
            " in this feed has at most one change"
        )
    op_map = F.create_map(
        *[F.lit(x) for kv in _V2_OPS.items() for x in kv]
    )
    carry = list(keep)
    if offset_col is not None and offset_col not in carry:
        carry.append(offset_col)
    parsed = raw.select(
        *[F.col(c) for c in carry],
        F.from_json(
            sanitize_line(F.col(line_col)), WAL2JSON_V2_SCHEMA
        ).alias("_j"),
        F.col(line_col).alias("event_json"),
    )
    return parsed.select(
        *[F.col(c) for c in keep],
        F.to_timestamp(F.col("_j.timestamp")).alias("ts"),
        F.lit(database).alias("database_name"),
        F.col("_j.table").alias("table_name"),
        op_map[F.col("_j.action")].alias("op"),
        F.col("_j.xid").alias("xid"),
        (
            F.col(offset_col).cast("long")
            if offset_col is not None
            else F.lit(0).cast("long")
        ).alias("change_idx"),
        F.map_from_arrays(
            F.col("_j.columns.name"), F.col("_j.columns.value")
        ).alias("data"),
        F.map_from_arrays(
            F.col("_j.identity.name"), F.col("_j.identity.value")
        ).alias("old"),
        F.lit(None).cast("string").alias("sql"),
        "event_json",
    )
