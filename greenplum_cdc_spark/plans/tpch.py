"""OLAP query layer — the Greenplum side of the reference.

The reference replicates MySQL into Greenplum precisely so queries like
these can run (README.md "Abstract": MySQL "not [optimized for] complex,
analytical queries or very large data sets ... Greenplum ... providing
that long-term, deep analytical platform").

Scale notes (SURVEY.md §6):
- dims (region/nation/customer/supplier/part) are broadcast — at 100 TB
  the fact tables shuffle only when the aggregation key demands it;
- every query filters/projects before joining so the parquet scan shows
  PushedFilters + a pruned ReadSchema;
- money aggregates are summed as DECIMAL (exact, order-insensitive) and
  cast to DOUBLE at the end, so results are bit-identical across engines
  and across partition orderings — at 1000 executors a double-sum would
  be run-to-run nondeterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table

# Exact-money / rate types. Widths are deliberately small so that the
# triple product price*(1-disc)*(1+tax) stays within DECIMAL(38) in BOTH
# Spark and DuckDB — overflow would trigger engine-specific precision
# loss and break bit-identical results.
_DEC = "decimal(12,4)"
_RATE = "decimal(6,4)"


def _money(col):
    return F.col(col).cast(_DEC)


def _rate(col):
    return F.col(col).cast(_RATE)


def _dsum(expr, alias):
    """Exact decimal sum surfaced as double (deterministic both engines).

    The sum is exact decimal math (order-insensitive); rounding to scale 4
    BEFORE the double cast keeps the scaled integer below 2^53, where the
    decimal->double conversion is exact in every engine (DuckDB's
    int128-scale-12 cast is not correctly rounded).
    """
    return F.round(F.sum(expr), 4).cast("double").alias(alias)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (SURVEY §2 B1)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _money("l_extendedprice") * (F.lit(1).cast(_RATE) - _rate("l_discount"))
    charge = disc_price * (F.lit(1).cast(_RATE) + _rate("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_money("l_quantity"), "sum_qty"),
            _dsum(_money("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            F.round(F.sum(_money("l_quantity")).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.round(F.sum(_money("l_extendedprice")).cast("double") / F.count("*"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: unshipped-order revenue by order (SURVEY §2 B2).

    customer is a dim → broadcast; orders⋈lineitem shuffles on o_orderkey
    only. Filters sit directly on the scans (pushdown).
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = _money("l_extendedprice") * (F.lit(1).cast(_RATE) - _rate("l_discount"))
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )
    return out


Q3_SQL = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation for one region (SURVEY §2 B3).

    Star join: all four dims broadcast; the only shuffle is the final
    groupBy(n_name). The customer-nation = supplier-nation equality is
    the TPC-H "local supplier" constraint.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _money("l_extendedprice") * (F.lit(1).cast(_RATE) - _rate("l_discount"))
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )
    return out


Q5_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: lost revenue from returned items (SURVEY §2 B4)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _money("l_extendedprice") * (F.lit(1).cast(_RATE) - _rate("l_discount"))
    out = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
    return out


Q10_SQL = """
SELECT
  c_custkey,
  c_name,
  c_acctbal,
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority via window rank (B5)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    out = (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .filter(F.col("rank_in_priority") <= 3)
        .select("o_orderpriority", "rank_in_priority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rank_in_priority")
    )
    return out


TOPK_SQL = """
SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice
FROM (
  SELECT
    o_orderpriority,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_priority,
    o_orderkey,
    o_totalprice
  FROM orders
) t
WHERE rank_in_priority <= 3
ORDER BY o_orderpriority, rank_in_priority
"""


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag, linestatus) multi-level aggregate (B8)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_money("l_quantity"), "sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )
    return out


GROUPING_SETS_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props — the Maxwell-payload
    analog of `events->>'...'` in cdc_periodic_load.sql:5-9 (B10)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
    return out


JSON_EXTRACT_SQL = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""
