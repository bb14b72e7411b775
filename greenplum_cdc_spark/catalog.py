"""Schema registry — the information_schema lookups of the reference.

`process_events()` consults `get_type(schema, table, col)` and
`get_pk_cols(schema, table)` (cdc_plpgsql_functions.sql:62-99) for every
event row. A driver-side dict registry gives the same answers once, is
broadcast implicitly with the closure, and never touches a catalog in
the hot path — at 100 TB a per-row catalog RPC is a non-starter.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_SPARK_TYPES = {
    "BIGINT": T.LongType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "SMALLINT": T.ShortType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT8": T.DoubleType(),
    "TEXT": T.StringType(),
    "STRING": T.StringType(),
    "VARCHAR": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
    "BINARY": T.BinaryType(),
    "BYTEA": T.BinaryType(),
    "BOOLEAN": T.BooleanType(),
    "DECIMAL": T.DecimalType(18, 4),
}


@dataclass
class TableSpec:
    """One replicated table: column types + primary key."""

    database: str
    table: str
    columns: dict[str, str]  # col -> SQL type name (upper)
    pk_cols: tuple[str, ...]

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.table}"

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c, _SPARK_TYPES.get(t.upper(), T.StringType()), True)
                for c, t in self.columns.items()
            ]
        )


@dataclass
class SchemaRegistry:
    """get_type / get_pk_cols equivalents (cdc_plpgsql_functions.sql:62-99)."""

    tables: dict[str, TableSpec] = field(default_factory=dict)

    def register(self, spec: TableSpec) -> None:
        self.tables[spec.qualified] = spec

    def drop(self, database: str, table: str | None = None) -> None:
        """TABLE-DROP / DATABASE-DROP bookkeeping
        (cdc_plpgsql_functions.sql:200-222)."""
        if table is not None:
            self.tables.pop(f"{database}.{table}", None)
        else:
            for k in [k for k in self.tables if k.startswith(database + ".")]:
                self.tables.pop(k)

    def get_type(self, database: str, table: str, col: str) -> str | None:
        spec = self.tables.get(f"{database}.{table}")
        return spec.columns.get(col) if spec else None

    def get_pk_cols(self, database: str, table: str) -> tuple[str, ...]:
        spec = self.tables.get(f"{database}.{table}")
        return spec.pk_cols if spec else ()

    def has_pk(self, database: str, table: str) -> bool:
        """process_events aborts UPDATEs on PK-less tables
        (cdc_plpgsql_functions.sql:156-161)."""
        return bool(self.get_pk_cols(database, table))
