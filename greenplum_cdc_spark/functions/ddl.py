"""MySQL → Spark SQL DDL dialect translation.

Re-expresses `translate_sql` and `add_schema_name`
(cdc_plpgsql_functions.sql:8-57) against Spark SQL's dialect instead of
Greenplum's. Pure string functions — applied driver-side to the (tiny)
DDL event stream, never in a row hot path.
"""

from __future__ import annotations

import re

# Reference type map (cdc_plpgsql_functions.sql:30-35,52-53), retargeted
# at Spark SQL type names.
TYPE_MAP = {
    "DOUBLE": "DOUBLE",  # Greenplum needed FLOAT8; Spark has DOUBLE natively
    "DATETIME": "TIMESTAMP",
    "LONGBLOB": "BINARY",
    "LONGTEXT": "STRING",
    "TINYINT(1)": "SMALLINT",
}

_DDL_HEAD = re.compile(
    r"((?:CREATE|DROP|ALTER)\s+TABLE(?:\s+IF\s+(?:NOT\s+)?EXISTS)?)\s+(\w+(?:\.\w+)?)",
    re.IGNORECASE,
)
_ENGINE = re.compile(r"\bENGINE\s*=\s*\S+", re.IGNORECASE)
_TYPES = re.compile(
    # \b anchors so type names embedded in identifiers (a column named
    # `created_datetime`) are never rewritten; TINYINT(1) needs no
    # trailing \b — it ends at the literal ')'.
    r"\b(TINYINT\(1\)|"
    + "|".join(k + r"\b" for k in TYPE_MAP if k != "TINYINT(1)")
    + r")",
    re.IGNORECASE,
)


def translate_sql(sql: str | None) -> str | None:
    """MySQL DDL → Spark-SQL DDL (cdc_plpgsql_functions.sql:21-57).

    Same three rewrites as the reference: strip ``ENGINE=...``, strip
    backtick quoting, map MySQL-only types. Unlike the reference we do
    NOT uppercase the whole statement (that would mangle quoted string
    defaults); matching is case-insensitive instead, and replacement
    types are emitted uppercase.
    """
    if sql is None:
        return None
    sql = _ENGINE.sub("", sql)
    sql = sql.replace("`", "")
    return _TYPES.sub(lambda m: TYPE_MAP[m.group(1).upper()], sql)


def add_schema_name(schema: str | None, sql: str | None) -> str | None:
    """Qualify the object of CREATE/DROP/ALTER TABLE with its database —
    `add_schema_name` (cdc_plpgsql_functions.sql:8-18).

    Unlike the reference (which qualifies unconditionally), an
    already-qualified name is left untouched, so replaying a translated
    statement is idempotent — the apply path replays batches after
    failures, and double-qualification would corrupt the DDL.
    """
    if sql is None or schema is None:
        return None

    def _repl(m: re.Match) -> str:
        name = m.group(2)
        if "." in name:  # already qualified — replay-safe no-op
            return m.group(0)
        return f"{m.group(1)} {schema}.{name}"

    return _DDL_HEAD.sub(_repl, sql, count=1)


def ddl_for_event(op: str, database: str, sql: str | None) -> str | None:
    """Dispatch a DDL event to the statement process_events() would run
    (cdc_plpgsql_functions.sql:196-222), in Spark SQL dialect.

    DATABASE-CREATE/DROP → CREATE/DROP DATABASE (Greenplum used schemas);
    TABLE-* → translated + schema-qualified statement.
    """
    op = op.lower()
    if op == "database-create":
        return f"CREATE DATABASE IF NOT EXISTS {database}"
    if op == "database-drop":
        return f"DROP DATABASE IF EXISTS {database} CASCADE"
    if op in ("table-create", "table-alter", "table-drop"):
        return add_schema_name(database, translate_sql(sql))
    return None
