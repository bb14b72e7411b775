"""Time-series operators over the replicated event stream (SURVEY §2
B6/B7/B9) — the analytics Greenplum's ts-RANGE-partitioned archive
(maxwell_gpdb.sql:25-31) exists to serve.

Scale notes: every operator here shuffles exactly once on the entity
key (or the time bucket), then works sort-locally within partitions —
the pattern that holds at 100 TB because each key's history is
processed by one task without driver involvement. Hot keys: salt the
entity key upstream or rely on AQE skew splitting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: hourly rollup (time_bucket analog) with exact value sums."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
            .cast("double")
            .alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket_ts")
    )


TIME_ROLLUP_SQL = """
SELECT
  date_trunc('hour', ts) AS bucket_ts,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE) AS sum_value,
  MAX(value) AS max_value
FROM events
GROUP BY date_trunc('hour', ts)
ORDER BY bucket_ts
"""

_GAP_MINUTES = 30


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: gap-based sessionization (30-min inactivity closes a session).

    lag → gap flag → running sum = session index: two window passes over
    ONE shuffle on user_id (both windows share the partitioning).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > _GAP_MINUTES * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = (
        ev.withColumn("is_new", new_session)
        .withColumn("session_idx", F.sum("is_new").over(w))
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_idx")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT
    user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_GAP_MINUTES} * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: as-of join — each event matched to the user's most recent
    order at event time.

    Spark lacks a native ASOF JOIN; the scalable composition is the
    union-staircase: union both sides keyed and time-ordered, then
    `last(..., ignorenulls)` carries the latest order forward onto each
    event row. One shuffle on the key, sort-local within partitions —
    no range cross-join blowup at 100 TB. (DuckDB's native ASOF JOIN is
    the oracle.)

    Event times are remapped into the orders era (deterministically from
    event_id) so the staircase actually steps; orders are pre-deduped to
    one row per (custkey, orderdate) to make the match unique.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("k"),
        F.expr(
            "timestampadd(DAY, CAST(event_id % 2500 AS INT), TIMESTAMP '1995-01-01 00:00:00')"
        ).alias("at_ts"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("matched_orderkey"))
    )
    o_side = orders.select(
        "k",
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("at_ts"),
        F.lit(1).alias("is_order"),
        F.col("o_orderdate").alias("ord_date"),
        "matched_orderkey",
    )
    e_side = ev.select(
        "k",
        F.col("at_ts").alias("t"),
        "event_id",
        "at_ts",
        F.lit(0).alias("is_order"),
        F.lit(None).cast("timestamp").alias("ord_date"),
        F.lit(None).cast("bigint").alias("matched_orderkey"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o_side.unionByName(e_side)
        .withColumn("m_key", F.last("matched_orderkey", ignorenulls=True).over(w))
        .withColumn("m_date", F.last("ord_date", ignorenulls=True).over(w))
        .filter(F.col("is_order") == 0)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "at_ts",
            F.col("m_date").alias("matched_orderdate"),
            F.col("m_key").alias("matched_orderkey"),
        )
        .orderBy("event_id")
    )


ASOF_SQL = """
WITH ev AS (
  SELECT event_id, user_id AS k,
         TIMESTAMP '1995-01-01 00:00:00' + (event_id % 2500) * INTERVAL 1 DAY AS at_ts
  FROM events
),
ord AS (
  SELECT o_custkey AS k, o_orderdate, MAX(o_orderkey) AS matched_orderkey
  FROM orders
  GROUP BY o_custkey, o_orderdate
)
SELECT
  ev.event_id,
  ev.k AS user_id,
  ev.at_ts,
  ord.o_orderdate AS matched_orderdate,
  ord.matched_orderkey
FROM ev
ASOF LEFT JOIN ord
  ON ev.k = ord.k AND ev.at_ts >= ord.o_orderdate
ORDER BY ev.event_id
"""


def asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B97 (round-7 addition): NEAREST-neighbor temporal join — each
    event matched to the closest order in time, searching BOTH
    directions (pandas merge_asof(direction='nearest') / kdb+ aj
    nearest semantics), ties broken toward the earlier (backward)
    match. B9's as-of join is last-before only; sensor/fill-style
    enrichment ("which price quote belongs to this trade?") needs the
    closer of the two neighbors, which neither an asof nor a range
    join expresses.

    Plan: ONE union-staircase shuffle on the key carries BOTH
    directions — last(ignorenulls) over a RUNNING frame on the
    ascending sort (backward neighbor) and over a running frame on the
    reversed sort (forward neighbor): one exchange, two sorts, both
    frames streaming O(1) per row (see the inline note on why the
    one-sort unbounded-following form is quadratic); no range
    cross-join, no per-row search. The winner is exact integer-micros
    distance arithmetic (no ROUND(double)), backward on ties. At
    100 TB this is the same single-shuffle bound as B9.

    Oracle: DuckDB runs the backward and forward halves as two native
    ASOF joins (>= and <=) and applies the same integer CASE.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("k"),
        F.expr(
            "timestampadd(DAY, CAST(event_id % 2500 AS INT), TIMESTAMP '1995-01-01 00:00:00')"
        ).alias("at_ts"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("okey"))
    )
    o_side = orders.select(
        "k",
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(1).alias("is_order"),
        F.col("o_orderdate").alias("odate"),
        "okey",
    )
    e_side = ev.select(
        "k",
        F.col("at_ts").alias("t"),
        "event_id",
        F.lit(0).alias("is_order"),
        F.lit(None).cast("timestamp").alias("odate"),
        F.lit(None).cast("bigint").alias("okey"),
    )
    # Both directions as RUNNING (unboundedPreceding -> currentRow)
    # frames: backward on the ascending sort, forward on the REVERSED
    # sort. A currentRow -> unboundedFollowing frame would give the
    # forward neighbor in one sort, but Spark's
    # UnboundedFollowingWindowFunctionFrame RESCANS current-to-end for
    # EVERY row — O(partition^2), measured 206x wall at the 100x probe
    # (the round-7 found-and-fixed); the reversed running frame
    # streams in O(1) per row at the cost of a second sort over the
    # same exchange. Same-instant semantics: orders sort before
    # same-t events ascending (zero-distance BACKWARD match) and after
    # them in the reversed scan (excluded from the forward frame) —
    # harmless, the zero-distance backward match wins every tie by
    # construction.
    wb = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("k")
        .orderBy(F.col("t").desc(), F.col("is_order").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = (
        o_side.unionByName(e_side)
        .withColumn("b_key", F.last("okey", ignorenulls=True).over(wb))
        .withColumn("b_date", F.last("odate", ignorenulls=True).over(wb))
        .withColumn("f_key", F.last("okey", ignorenulls=True).over(wf))
        .withColumn("f_date", F.last("odate", ignorenulls=True).over(wf))
        .filter(F.col("is_order") == 0)
    )
    b_dist = F.expr("unix_micros(at_ts) - unix_micros(CAST(b_date AS TIMESTAMP))")
    f_dist = F.expr("unix_micros(CAST(f_date AS TIMESTAMP)) - unix_micros(at_ts)")
    pick_backward = F.col("f_date").isNull() | (
        F.col("b_date").isNotNull() & (b_dist <= f_dist)
    )
    return (
        both.withColumnRenamed("t", "at_ts")
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "at_ts",
            F.when(F.col("b_date").isNull() & F.col("f_date").isNull(), F.lit(None))
            .when(pick_backward, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
            F.when(pick_backward, F.col("b_date"))
            .otherwise(F.col("f_date"))
            .alias("nearest_orderdate"),
            F.when(pick_backward, F.col("b_key"))
            .otherwise(F.col("f_key"))
            .alias("nearest_orderkey"),
            F.when(pick_backward, b_dist).otherwise(f_dist).alias("dist_us"),
        )
        .orderBy("event_id")
    )


ASOF_NEAREST_SQL = """
WITH ev AS (
  SELECT event_id, user_id AS k,
         TIMESTAMP '1995-01-01 00:00:00' + (event_id % 2500) * INTERVAL 1 DAY AS at_ts
  FROM events
),
ord AS (
  SELECT o_custkey AS k, o_orderdate, MAX(o_orderkey) AS okey
  FROM orders
  GROUP BY o_custkey, o_orderdate
),
back AS (
  SELECT ev.event_id, ord.o_orderdate AS b_date, ord.okey AS b_key
  FROM ev ASOF LEFT JOIN ord
    ON ev.k = ord.k AND ev.at_ts >= CAST(ord.o_orderdate AS TIMESTAMP)
),
fwd AS (
  SELECT ev.event_id, ord.o_orderdate AS f_date, ord.okey AS f_key
  FROM ev ASOF LEFT JOIN ord
    ON ev.k = ord.k AND ev.at_ts <= CAST(ord.o_orderdate AS TIMESTAMP)
)
SELECT ev.event_id,
       ev.k AS user_id,
       ev.at_ts,
       CASE
         WHEN b.b_date IS NULL AND f.f_date IS NULL THEN NULL
         WHEN f.f_date IS NULL OR (b.b_date IS NOT NULL
              AND epoch_us(ev.at_ts) - epoch_us(CAST(b.b_date AS TIMESTAMP))
               <= epoch_us(CAST(f.f_date AS TIMESTAMP)) - epoch_us(ev.at_ts))
           THEN 'backward'
         ELSE 'forward'
       END AS direction,
       CASE
         WHEN f.f_date IS NULL OR (b.b_date IS NOT NULL
              AND epoch_us(ev.at_ts) - epoch_us(CAST(b.b_date AS TIMESTAMP))
               <= epoch_us(CAST(f.f_date AS TIMESTAMP)) - epoch_us(ev.at_ts))
           THEN b.b_date ELSE f.f_date
       END AS nearest_orderdate,
       CASE
         WHEN f.f_date IS NULL OR (b.b_date IS NOT NULL
              AND epoch_us(ev.at_ts) - epoch_us(CAST(b.b_date AS TIMESTAMP))
               <= epoch_us(CAST(f.f_date AS TIMESTAMP)) - epoch_us(ev.at_ts))
           THEN b.b_key ELSE f.f_key
       END AS nearest_orderkey,
       CASE
         WHEN f.f_date IS NULL OR (b.b_date IS NOT NULL
              AND epoch_us(ev.at_ts) - epoch_us(CAST(b.b_date AS TIMESTAMP))
               <= epoch_us(CAST(f.f_date AS TIMESTAMP)) - epoch_us(ev.at_ts))
           THEN epoch_us(ev.at_ts) - epoch_us(CAST(b.b_date AS TIMESTAMP))
         ELSE epoch_us(CAST(f.f_date AS TIMESTAMP)) - epoch_us(ev.at_ts)
       END AS dist_us
FROM ev
LEFT JOIN back b ON ev.event_id = b.event_id
LEFT JOIN fwd f ON ev.event_id = f.event_id
ORDER BY ev.event_id
"""


def running_total_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: per-user running value total over the event stream.

    One shuffle on user_id; the prefix sum is DECIMAL (order-insensitive,
    exact) so results are identical at any partition count.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.sum(F.col("value").cast("decimal(12,2)")).over(wsum), 4)
            .cast("double")
            .alias("running_value"),
            F.row_number().over(w).alias("running_n"),
        )
        .orderBy("user_id", "event_id")
    )


RUNNING_TOTAL_SQL = """
SELECT user_id, ts, event_id,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 4) AS DOUBLE) AS running_value,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS running_n
FROM events
ORDER BY user_id, event_id
"""


def moving_avg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: daily value rollup + 7-day trailing moving average.

    Two-level plan: the wide shuffle happens at day grain (tiny), then
    the trailing window runs over the day-grain frame — the pattern that
    keeps moving averages cheap no matter how large the raw stream is.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("dsum"),
        F.count("*").alias("n_events"),
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    # the moving average is a scaled-integer floor division over exact
    # cents (dsum is DECIMAL(12,2), x100 is exact; values non-negative)
    # — NOT ROUND(double, 4), the op the engines disagree on at
    # shortest-repr .5 boundaries (SURVEY §5 / r4 verdict #2).
    # x10000 scale = cents x100, i.e. 4 implied decimals of the
    # original unit.
    return (
        daily.select(
            "day",
            "n_events",
            F.round("dsum", 4).cast("double").alias("day_value"),
            (F.col("dsum") * 100).cast("bigint").alias("dcents"),
        )
        .select(
            "day",
            "n_events",
            "day_value",
            (F.sum("dcents").over(w7) * 100)
            .cast("bigint")
            .alias("sum_7d_x100"),
            F.count("*").over(w7).alias("n_days_7d"),
        )
        .select(
            "day",
            "n_events",
            "day_value",
            F.expr("sum_7d_x100 div n_days_7d").alias("moving_avg_7d_x10k"),
        )
        .orderBy("day")
    )


MOVING_AVG_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(value AS DECIMAL(12,2))) AS dsum,
         COUNT(*) AS n_events
  FROM events
  GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)
)
SELECT day, n_events,
       CAST(ROUND(dsum, 4) AS DOUBLE) AS day_value,
       CAST((CAST(SUM(CAST(dsum * 100 AS BIGINT)) OVER w7 AS BIGINT) * 100)
            // (COUNT(*) OVER w7) AS BIGINT) AS moving_avg_7d_x10k
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: exact interpolated percentiles per event type.

    Greenplum's percentile_cont analog. Exact percentile needs a per-group
    sort; at 100 TB swap in approx_percentile (t-digest, mergeable
    map-side) — kept exact here because the oracle demands exactness.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: fixed-width value histogram (width_bucket analog).

    Integer bucketing is exact and order-insensitive — safe at any
    parallelism, unlike float-boundary schemes.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50.0).cast("int")
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("bucket")
    )


EVENTS_HISTOGRAM_SQL = """
SELECT CAST(floor(value / 50.0) AS INT) AS bucket,
       COUNT(*) AS n_events,
       ROUND(MIN(value), 2) AS min_value,
       ROUND(MAX(value), 2) AS max_value
FROM events
GROUP BY CAST(floor(value / 50.0) AS INT)
ORDER BY bucket
"""


def corr_value_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: correlation / covariance between the event value and the
    JSON-extracted props field, per event type (Greenplum stats aggs).

    Exact integer-moment formulation (r5 rewrite of the r1 version):
    the double builtins corr()/covar_samp()/stddev_samp() + ROUND are
    the one class Spark and DuckDB disagree on at shortest-repr .5
    boundaries (SURVEY §5), so the stats are re-derived from exact
    BIGINT moments — value in cents (2-decimal source, x100 exact),
    props.k an integer 0..99:

      cnum = n·Σxy − Σx·Σy           (covariance numerator, cents·k)
      vxn  = n·Σx² − (Σx)²           (n²·variance of x, cents²)
      vyn  = n·Σy² − (Σy)²           (n²·variance of y, k²)

      covar_vk_x100  = cnum ÷ (n(n−1))   [sign-decomposed trunc-div]
      var_value_x10k = vxn ÷ (n(n−1))    [= variance·10⁴, ≥ 0]
      corr_sq_ppm    = cnum²·10⁶ ÷ (vxn·vyn), corr_sign ∈ {−1,0,1}

    corr² needs 128-bit intermediates (cnum² ≈ 10³⁰ at sf0.1): Spark
    computes it in DECIMAL(38,0), DuckDB in HUGEINT — both exact, both
    truncating a non-negative quotient, so bit-identical. One map-side
    partial-agg shuffle on event_type; everything downstream is
    per-group scalar arithmetic. At 100 TB the moments are mergeable
    partial sums (the same plan shape as any SUM)."""
    ev = load_table(spark, sf_dir, "events")
    moms = (
        ev.select(
            "event_type",
            F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("xc"),
            F.get_json_object("props", "$.k").cast("bigint").alias("yk"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("xc").alias("sx"),
            F.sum("yk").alias("sy"),
            F.sum(F.expr("xc * yk")).alias("sxy"),
            F.sum(F.expr("xc * xc")).alias("sx2"),
            F.sum(F.expr("yk * yk")).alias("sy2"),
        )
    )
    return (
        moms.select(
            "event_type",
            "n",
            F.expr("n * sxy - sx * sy").alias("cnum"),
            F.expr("n * sx2 - sx * sx").alias("vxn"),
            F.expr("n * sy2 - sy * sy").alias("vyn"),
        )
        .select(
            "event_type",
            "n",
            # sign-decomposed so both engines truncate identically
            F.expr(
                "CASE WHEN n <= 1 THEN NULL "
                "WHEN cnum >= 0 THEN cnum div (n * (n - 1)) "
                "ELSE -((-cnum) div (n * (n - 1))) END"
            ).alias("covar_vk_x100"),
            F.expr(
                "CASE WHEN n <= 1 THEN NULL "
                "ELSE vxn div (n * (n - 1)) END"
            ).alias("var_value_x10k"),
            F.expr(
                "CASE WHEN vxn > 0 AND vyn > 0 THEN CAST("
                "(CAST(cnum AS DECIMAL(38,0)) * CAST(cnum AS DECIMAL(38,0))"
                " * 1000000) div "
                "(CAST(vxn AS DECIMAL(38,0)) * CAST(vyn AS DECIMAL(38,0)))"
                " AS BIGINT) END"
            ).alias("corr_sq_ppm"),
            F.expr(
                "CASE WHEN cnum > 0 THEN 1 WHEN cnum < 0 THEN -1 "
                "ELSE 0 END"
            ).alias("corr_sign"),
        )
        .orderBy("event_type")
    )


CORR_VALUE_SQL = """
WITH moms AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(xc) AS sx, SUM(yk) AS sy,
         SUM(xc * yk) AS sxy, SUM(xc * xc) AS sx2, SUM(yk * yk) AS sy2
  FROM (
    SELECT event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS xc,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS yk
    FROM events
  )
  GROUP BY event_type
),
nums AS (
  SELECT event_type, n,
         n * sxy - sx * sy AS cnum,
         n * sx2 - sx * sx AS vxn,
         n * sy2 - sy * sy AS vyn
  FROM moms
)
SELECT event_type, n,
       CAST(CASE WHEN n <= 1 THEN NULL
            WHEN cnum >= 0 THEN cnum // (n * (n - 1))
            ELSE -((-cnum) // (n * (n - 1))) END AS BIGINT) AS covar_vk_x100,
       CAST(CASE WHEN n <= 1 THEN NULL
            ELSE vxn // (n * (n - 1)) END AS BIGINT) AS var_value_x10k,
       CAST(CASE WHEN vxn > 0 AND vyn > 0 THEN
            (CAST(cnum AS HUGEINT) * CAST(cnum AS HUGEINT) * 1000000)
            // (CAST(vxn AS HUGEINT) * CAST(vyn AS HUGEINT))
            END AS BIGINT) AS corr_sq_ppm,
       CAST(CASE WHEN cnum > 0 THEN 1 WHEN cnum < 0 THEN -1
            ELSE 0 END AS INT) AS corr_sign
FROM nums
ORDER BY event_type
"""


def events_pivot_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: hour-of-day x event-type count crosstab via pivot.

    Spark's pivot runs as one grouped agg with a known column list (we
    pass the values explicitly — never let pivot scan for distinct
    values at 100 TB).
    """
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .groupBy("hour_of_day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("hour_of_day")
    )


EVENTS_PIVOT_SQL = """
SELECT CAST(hour(ts) AS INT) AS hour_of_day,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0) AS BIGINT) AS click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END), 0) AS BIGINT) AS error,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) AS purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END), 0) AS BIGINT) AS signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 0) AS BIGINT) AS view
FROM events
GROUP BY CAST(hour(ts) AS INT)
ORDER BY hour_of_day
"""


_N_SALTS = 8


def salted_hot_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: two-phase salted aggregation for skewed keys.

    The skew pattern from SURVEY §6 made concrete: phase 1 aggregates on
    (key, salt) so a hot key's rows spread over _N_SALTS reducers, phase
    2 combines the partials on the key alone — the second shuffle moves
    only |keys| x _N_SALTS rows, not the raw stream. Sums are DECIMAL,
    so the result is EXACTLY the direct single-phase aggregate; the
    oracle states the direct aggregate, proving salting changes the
    execution plan, never the answer.
    """
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", (F.col("event_id") % _N_SALTS).cast("int"))
        .groupBy("user_id", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("pv"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv"), 4).cast("double").alias("sum_value"),
        )
        .orderBy("user_id")
    )


SALTED_ROLLUP_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: weekly-cohort retention triangle.

    Users grouped by first-seen week; for each (cohort, weeks-since)
    offset, how many cohort members were active. Two aggregations and a
    broadcast of the (tiny) per-user cohort map — the workhorse product
    query a replica warehouse exists to answer.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts")
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = ev.select("user_id", wk.alias("active_week")).distinct()
    return (
        active.join(first, "user_id")
        .withColumn(
            "weeks_since",
            F.expr("CAST(datediff(active_week, cohort_week) div 7 AS INT)"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(date_diff('day', cohort_week, active_week) // 7 AS INT) AS weeks_since,
       COUNT(DISTINCT a.user_id) AS n_active
FROM active a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY cohort_week, weeks_since
ORDER BY cohort_week, weeks_since
"""


def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: ordered conversion funnel view -> click -> purchase.

    Per-user earliest time of each stage; a stage counts only if it
    happens AFTER the previous one. One conditional aggregation per
    stage over one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    stage_min = {
        s: F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in ("view", "click", "purchase")
    }
    per_user = ev.groupBy("user_id").agg(*stage_min.values())
    reached_click = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(reached_click, 1).otherwise(0)).alias("n_view_click"),
        F.sum(F.when(reached_purchase, 1).otherwise(0)).alias("n_full_funnel"),
    )


FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
            THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM per_user
"""


def active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: DAU + 7-day rolling distinct users (WAU) + stickiness.

    Exact rolling COUNT(DISTINCT) cannot ride a window frame, so each
    (day, user) activity row is fanned out to the 7 window-end days it
    participates in (explode of a 7-date sequence — map-side, x7 rows)
    and distinct-counted per window end. One shuffle for the per-day
    distinct, one for the windowed distinct; both keyed by date so the
    100 TB layout partitions by the same column the archive already
    uses. (The approx swap-in at extreme scale is HLL sketch union per
    day, but exact is the contract here.)
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        du.select(
            F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("wday"),
            "user_id",
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .select(
            "day",
            "dau",
            "wau_7d",
            # scaled-integer floor division (counts are non-negative),
            # NOT ROUND(double, 6) — the one op the engines disagree on
            # at shortest-repr .5 boundaries (SURVEY §5 / r4 verdict #2)
            F.expr("(dau * 1000000) div wau_7d").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


ACTIVE_USERS_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (
  SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day
),
fan AS (
  SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS wday,
         user_id
  FROM du
),
wau AS (
  SELECT wday, COUNT(DISTINCT user_id) AS wau_7d FROM fan GROUP BY wday
)
SELECT dau.day, dau.dau, wau.wau_7d,
       CAST((dau.dau * 1000000) // wau.wau_7d AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau ON dau.day = wau.wday
ORDER BY dau.day
"""


def range_frame_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: trailing-interval context via a RANGE window frame — for
    each error event, how many same-user events (and how much value)
    landed in the preceding 10 minutes.

    This is the interval-join semantic executed WITHOUT a join: a RANGE
    BETWEEN frame over unix-microsecond ordering does the [ts-10m, ts)
    lookback sort-locally within each user partition — one shuffle on
    user_id, no self-join blowup, no candidate explosion. At 100 TB
    this is the difference between a window pass and an O(events x
    avg-events-per-10m) join. RANGE (not ROWS) also makes duplicate
    timestamps deterministic: peers by ordering VALUE share a frame.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-600_000_000, -1)  # [ts - 10 min, ts)
    )
    return (
        ev.withColumn("n_prior_10m", F.count("*").over(w))
        .withColumn(
            "sum_value_10m",
            F.coalesce(
                F.sum(F.col("value").cast("decimal(12,2)")).over(w),
                F.lit(0).cast("decimal(22,2)"),
            )
            .cast("double"),
        )
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "n_prior_10m", "sum_value_10m")
        .orderBy("event_id")
    )


RANGE_FRAME_SQL = """
WITH win AS (
  SELECT event_id, user_id, ts, event_type,
         COUNT(*) OVER w AS n_prior_10m,
         CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2))) OVER w, 0) AS DOUBLE)
           AS sum_value_10m
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts, n_prior_10m, sum_value_10m
FROM win WHERE event_type = 'error'
ORDER BY event_id
"""


GAP_FILL_SPARSE_MOD = 500  # user_id % 500 == 7 → ~0.2% of events, so the daily
GAP_FILL_SPARSE_REM = 7   # series has real gaps to fill at every sf


def time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: calendar gap-fill + LOCF over a sparse daily series.

    The hypertable/timescale `time_bucket_gapfill(..., locf(...))`
    analog: per event type, materialize EVERY day between that type's
    first and last activity (sequence + explode — map-side, no
    driver loop), left-join the observed daily sums, and carry the
    last observation forward with last_value(IGNORE NULLS). `filled`
    marks synthesized rows. One shuffle (the daily groupBy); the
    calendar explode adds days-per-type rows, independent of event
    count — at 100 TB the series table stays tiny even when the
    event scan is huge.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") % GAP_FILL_SPARSE_MOD) == GAP_FILL_SPARSE_REM
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("day_value")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        calendar.join(daily, ["event_type", "day"], "left")
        .withColumn("filled", F.col("day_value").isNull())
        .withColumn(
            "day_value", F.last("day_value", ignorenulls=True).over(w)
        )
        .orderBy("event_type", "day")
    )


TIME_GAP_FILL_SQL = f"""
WITH sparse AS (
  SELECT * FROM events
  WHERE user_id % {GAP_FILL_SPARSE_MOD} = {GAP_FILL_SPARSE_REM}
),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS day_value
  FROM sparse GROUP BY event_type, CAST(ts AS DATE)
),
spans AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY event_type
),
calendar AS (
  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT c.event_type, c.day,
       last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY c.event_type ORDER BY c.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value,
       d.day_value IS NULL AS filled
FROM calendar c LEFT JOIN daily d USING (event_type, day)
ORDER BY c.event_type, c.day
"""


def event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43: per-user inter-arrival gaps -> per-event-type gap profile.

    lag() within the user partition produces each event's gap to the
    user's previous event (any type); the profile then groups by the
    CURRENT event's type. Gaps are integer microseconds, so sums are
    exact; the average is a FLOOR division at 4-dp scale ((sum·10⁴) div
    n, then /10⁴ — exact in double, < 2⁵³) because ROUND(double) is the
    one op the engines disagree on at shortest-repr .5 boundaries
    (Spark rounds the exact binary value, DuckDB the decimal repr —
    surfaced by the sf0.001 gate). One shuffle on user_id, one on
    event_type.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    gaps = (
        ev.withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            (
                F.expr("(sum(gap_us) * 10000) div count(*)").cast("double") / 10000
            ).alias("avg_gap_us"),
        )
        .orderBy("event_type")
    )


EVENT_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       MIN(gap_us) AS min_gap_us,
       MAX(gap_us) AS max_gap_us,
       CAST((SUM(gap_us) * 10000) // COUNT(*) AS DOUBLE) / 10000 AS avg_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


ZSCORE_CUT = 3.0


def zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44: population z-score outliers per event type.

    Mean and variance come from DECIMAL sums (sum v, sum v², count), so
    they are exact integers-in-decimal regardless of partitioning —
    never stddev_pop over doubles, whose accumulation order varies with
    the physical plan. The variance/z arithmetic then runs in doubles
    from those exact inputs with the same expression on both engines.
    Two passes over the grouped stats, zero extra shuffles: stats join
    back by broadcast (one row per type).
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "dv", F.col("value").cast("decimal(12,2)")
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("dv").cast("double").alias("s1"),
        F.sum(F.col("dv") * F.col("dv")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) >= ZSCORE_CUT)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    )


ZSCORE_ANOMALY_SQL = f"""
WITH ev AS (
  SELECT event_id, event_type, value, CAST(value AS DECIMAL(12,2)) AS dv
  FROM events
),
stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(dv) AS DOUBLE) AS s1,
         CAST(SUM(dv * dv) AS DOUBLE) AS s2
  FROM ev GROUP BY event_type
),
scored AS (
  SELECT e.event_id, e.event_type, e.value,
         ROUND((e.value - s.s1 / s.n)
               / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 4) AS z
  FROM ev e JOIN stats s USING (event_type)
)
SELECT event_id, event_type, value, z
FROM scored WHERE abs(z) >= {ZSCORE_CUT}
ORDER BY event_id
"""


def ohlc_candlestick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45: hourly OHLC (open/high/low/close) bars per event type.

    The hypertable financial-rollup idiom (TimescaleDB `candlestick_agg`,
    Greenplum first_value/last_value over the ts partition): open/close
    are the first/last value in the bucket under the total order
    (ts, event_id); high/low are plain min/max.

    One shuffle: the window partitions by (event_type, bucket) and the
    groupBy reuses the same keys, so Catalyst shares the exchange. At
    100 TB the bucket key bounds partition width (an hour of one type),
    and the window is sort-local within it — no driver involvement, no
    second shuffle. first_value/last_value over a full frame avoids a
    separate argmin/argmax join.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket_ts", F.date_trunc("hour", "ts")
    )
    w = Window.partitionBy("event_type", "bucket_ts").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.withColumn("open", F.first("value").over(full))
        .withColumn("close", F.last("value").over(full))
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.first("open").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.first("close").alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .orderBy("event_type", "bucket_ts")
    )


OHLC_SQL = """
WITH t AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts, ts, event_id, value,
         first_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
         last_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
  FROM events
)
SELECT event_type, bucket_ts,
       MIN(open) AS open, MAX(value) AS high, MIN(value) AS low,
       MIN(close) AS close, COUNT(*) AS n_ticks
FROM t
GROUP BY event_type, bucket_ts
ORDER BY event_type, bucket_ts
"""


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: per-user time-weighted average value (LOCF weighting).

    TimescaleDB `time_weight('LOCF', ...)` analog over irregular
    samples: each observation holds until the next one, so
    twa = Σ value_i · (t_{i+1} − t_i) / (t_last − t_first). Durations
    are integer microseconds and the weighted sum accumulates in
    DECIMAL (value at 2 dp × bigint µs fits decimal(38,2)), so the
    result is partitioning-order-exact; the single double division
    happens once per user at the end. One shuffle on user_id (lead
    window), then the groupBy reuses the same exchange. Users with a
    single sample have no held interval and are excluded (span = 0).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt_us = F.unix_micros(F.lead("ts").over(w))
    cur_us = F.unix_micros(F.col("ts"))
    return (
        ev.withColumn("dur_us", nxt_us - cur_us)
        .filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_us").alias("span_us"),
            F.round(
                (
                    F.sum(F.col("value").cast("decimal(12,2)") * F.col("dur_us"))
                    / F.sum("dur_us")
                ).cast("double"),
                6,
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_AVG_SQL = """
WITH t AS (
  SELECT user_id, value,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dur_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2)) * dur_us) / SUM(dur_us)
                  AS DOUBLE), 6) AS twa_value
FROM t
WHERE dur_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


_OVERLAP_DAYS = 7
_DAY_OFFSET = 3000  # shift TPC-H-era day numbers positive before binning


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49: interval-overlap join via bin bucketing — events landing in
    each order's 7-day fulfillment window, WITHOUT a theta join.

    Spark has no native band/interval join: a raw `ON day BETWEEN a AND
    a+6` condition becomes BroadcastNestedLoopJoin (O(n·m) — the 100 TB
    killer). The scale idiom: bucket time into bins the width of the
    interval; a 7-day window overlaps at most TWO 7-day bins, so each
    order explodes to ≤2 (key, bin) rows, the join is a plain equi-join
    on (key, bin) — hash-partitioned, AQE-skew-splittable — and the
    exact BETWEEN predicate filters the ≤2× candidates. Candidate count
    is linear in orders, never |orders|×|events|.

    Event times reuse B9's deterministic remap into the orders era
    (day = event_id % 2500 from 1995-01-01); key = user_id ≡ custkey,
    as in the as-of join. The oracle states the plain theta join —
    DuckDB's IEJoin evaluates it exactly.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        "event_id",
        (F.col("event_id") % 2500).cast("bigint").alias("day_e"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("day_o"),
    )
    ev_binned = ev.withColumn(
        "bin", F.expr(f"(day_e + {_DAY_OFFSET}) div {_OVERLAP_DAYS}")
    )
    o_binned = orders.withColumn(
        "bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"(day_o + {_DAY_OFFSET}) div {_OVERLAP_DAYS}"),
                    F.expr(
                        f"(day_o + {_OVERLAP_DAYS - 1} + {_DAY_OFFSET}) div {_OVERLAP_DAYS}"
                    ),
                )
            )
        ),
    )
    return (
        o_binned.join(ev_binned, ["k", "bin"])
        .filter(
            (F.col("day_e") >= F.col("day_o"))
            & (F.col("day_e") < F.col("day_o") + _OVERLAP_DAYS)
        )
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
        .orderBy("o_orderkey")
    )


INTERVAL_OVERLAP_SQL = f"""
WITH ev AS (
  SELECT user_id AS k, event_id, event_id % 2500 AS day_e FROM events
),
ord AS (
  SELECT o_custkey AS k, o_orderkey,
         datediff('day', DATE '1995-01-01', o_orderdate) AS day_o
  FROM orders
)
SELECT o_orderkey,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id
FROM ord JOIN ev USING (k)
WHERE day_e >= day_o AND day_e < day_o + {_OVERLAP_DAYS}
GROUP BY o_orderkey
ORDER BY o_orderkey
"""


def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52: the full ranking-window surface in one partition pass —
    rank, dense_rank, percent_rank, cume_dist, ntile(4), lag/lead.

    One shuffle on event_type; every function shares the identical
    window (ORDER BY value DESC, event_id — unique, so ties cannot make
    rank/percent_rank engine-dependent). percent_rank and cume_dist
    need the whole partition before the row_number filter cuts to the
    top 5 per type, which is why the filter sits ABOVE the window
    projection — Catalyst cannot (and must not) push it down.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    wp = Window.partitionBy("event_type")
    # percent_rank / cume_dist re-derived as scaled-integer floor
    # divisions from rank + partition count — ROUND(double, 6) on the
    # built-ins is the one op the engines disagree on at shortest-repr
    # .5 boundaries (SURVEY §5).  The order key is unique (event_id
    # tiebreak), so rank == row_number and cume_dist == rnk / n exactly.
    ranked = ev.select(
        "event_type",
        "event_id",
        "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.count("*").over(wp).alias("n_part"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    ).select(
        "event_type",
        "event_id",
        "value",
        "rnk",
        "drnk",
        "n_part",
        F.expr(
            "CASE WHEN n_part > 1 "
            "THEN ((rnk - 1) * 1000000) div (n_part - 1) ELSE 0 END"
        ).alias("pct_rank_ppm"),
        F.expr("(rnk * 1000000) div n_part").alias("cume_ppm"),
        "quartile",
        "prev_value",
        "next_value",
    )
    return (
        ranked.filter(F.col("rnk") <= 5)
        .orderBy("event_type", "rnk")
    )


WINDOW_RANK_SQL = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_part,
         NTILE(4) OVER w AS quartile,
         LAG(value) OVER w AS prev_value,
         LEAD(value) OVER w AS next_value
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
)
SELECT event_type, event_id, value, rnk, drnk, n_part,
       CAST(CASE WHEN n_part > 1
            THEN ((rnk - 1) * 1000000) // (n_part - 1) ELSE 0 END AS BIGINT)
         AS pct_rank_ppm,
       CAST((rnk * 1000000) // n_part AS BIGINT) AS cume_ppm,
       quartile, prev_value, next_value
FROM ranked WHERE rnk <= 5
ORDER BY event_type, rnk
"""


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53: wide → long unpivot (melt), proven as pivot's exact inverse.

    Builds the hour × event-type crosstab (B30's pivot, explicit value
    list — never a distinct-scan at 100 TB), then melts it back with
    `stack`, dropping the NULL cells pivot synthesized for absent
    combinations. The oracle states the plain (hour, type) group-by:
    the hash match proves unpivot(pivot(x)) ≡ x — the round-trip
    contract a metrics store relies on. Both steps are single-shuffle
    grouped aggregations; stack is a map-side generator (no shuffle).
    """
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .groupBy("hour_of_day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    stack_expr = "stack({n}, {args}) as (event_type, n_events)".format(
        n=len(types), args=", ".join(f"'{t}', `{t}`" for t in types)
    )
    return (
        wide.select("hour_of_day", F.expr(stack_expr))
        .filter(F.col("n_events").isNotNull())
        .orderBy("hour_of_day", "event_type")
    )


UNPIVOT_METRICS_SQL = """
SELECT hour(ts) AS hour_of_day, event_type, COUNT(*) AS n_events
FROM events
GROUP BY hour(ts), event_type
ORDER BY hour_of_day, event_type
"""


_DEBOUNCE_US = 5_000_000  # 5 s


def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53: per-(user, type) event throttle — drop rapid-fire repeats.

    Telemetry streams double-report (retries, UI chatter); the standard
    cleanup keeps an event only if the PREVIOUS event of the same
    (user_id, event_type) is more than 5 s older (lag-throttle: the gap
    is measured to the previous raw event, which makes the verdict a
    pure window function — one shuffle on the composite key, no
    iterative chain state, deterministic at any partition count).

    Output keeps every row with its gap and verdict so downstream can
    audit what was dropped — the filter is `WHERE kept`.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_us", gap)
        .withColumn(
            "kept", F.col("gap_us").isNull() | (F.col("gap_us") > _DEBOUNCE_US)
        )
        .select("event_id", "user_id", "event_type", "ts", "gap_us", "kept")
        .orderBy("event_id")
    )


EVENT_DEBOUNCE_SQL = f"""
WITH lagged AS (
  SELECT event_id, user_id, event_type, ts,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_id, user_id, event_type, ts, gap_us,
       (gap_us IS NULL OR gap_us > {_DEBOUNCE_US}) AS kept
FROM lagged
ORDER BY event_id
"""


def skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54: partition-skew diagnostics for a shuffle key — the report a
    100 TB operator consults BEFORE picking salted vs plain aggregation.

    Per-key row counts for events.user_id rolled into one profile row:
    key count, total rows, max/p50/p90/p99 per-key counts (exact
    rank-based order statistics — `ceil(q*n)`-th smallest via
    row_number, no interpolation so both engines agree bit-for-bit),
    the hottest key's share in basis points (integer rational math) and
    the max/median skew ratio in centi-units. The two-stage shape
    (groupBy key, then tiny aggregate) is itself skew-immune: stage 1
    map-side combines, stage 2 sees |keys| rows, not |rows|.

    The rank window over per-key counts is global — exact order
    statistics require it, and |keys| is the REDUCED cardinality. At
    extreme key counts (billions) swap the exact ranks for
    approx_percentile over the count column (one mergeable-sketch
    pass); the report schema is unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("cnt", "user_id")
    ranked = per_key.withColumn("rk", F.row_number().over(w))
    n = per_key.count()

    def _at(q: float):
        import math

        pos = max(1, math.ceil(q * n))
        return F.max(F.when(F.col("rk") == pos, F.col("cnt")))

    # integer floor division on BOTH sides (Spark double-division +
    # bigint cast TRUNCATES while DuckDB's CAST(double AS BIGINT)
    # ROUNDS — `div` / `//` sidestep the mismatch class entirely, same
    # idiom as zorder_layout/event_interarrival)
    agg = ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        _at(0.50).alias("p50_cnt"),
        _at(0.90).alias("p90_cnt"),
        _at(0.99).alias("p99_cnt"),
    )
    return agg.select(
        "*",
        F.expr("(max_cnt * 10000) div total_rows").alias("top_share_bp"),
        F.expr("(max_cnt * 100) div p50_cnt").alias("skew_ratio_c"),
    )


def _skew_sql() -> str:
    return """
WITH per_key AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM per_key
)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS total_rows,
       MAX(cnt) AS max_cnt,
       MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN cnt END) AS p50_cnt,
       MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.90 * n) AS BIGINT)) THEN cnt END) AS p90_cnt,
       MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN cnt END) AS p99_cnt,
       CAST((MAX(cnt) * 10000) // SUM(cnt) AS BIGINT) AS top_share_bp,
       CAST((MAX(cnt) * 100) // MAX(CASE WHEN rk = GREATEST(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN cnt END) AS BIGINT) AS skew_ratio_c
FROM ranked
"""


SKEW_DIAGNOSTICS_SQL = _skew_sql()


def period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B60: month-over-month revenue growth — the BI staple (lag over a
    monthly rollup; delta exact DECIMAL, growth ratio a deterministic
    IEEE division of exact decimals rounded to 6 dp).

    Two window-free shuffles collapse to one: the monthly groupBy and
    the lag window share the month ordering, so Catalyst plans one
    exchange on the (tiny) month key. At 100 TB the rollup output is
    |months| rows — the window stage is trivially small; all the cost
    is the map-side partial aggregation of the fact scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    # growth ratio via scaled-integer floor division (cent-exact BIGINTs,
    # `div` / `//` on both engines) — ROUND(double, 6) disagrees between
    # Spark and DuckDB at shortest-repr .5 boundaries, floor-div of
    # integers cannot. BIGINT cents * 1e6 holds to ~9e16 cents/month;
    # widen through DECIMAL(38,0) beyond that.
    return (
        monthly.withColumn("prev_revenue", prev)
        .withColumn("rev_c", (F.col("revenue") * 100).cast("bigint"))
        .withColumn("prev_c", (F.col("prev_revenue") * 100).cast("bigint"))
        .select(
            "month",
            F.col("revenue").cast("double").alias("revenue"),
            F.col("prev_revenue").cast("double").alias("prev_revenue"),
            (F.col("revenue") - F.col("prev_revenue")).cast("double").alias("delta"),
            (F.expr("(rev_c * 1000000) div prev_c") / F.lit(1_000_000.0))
            .cast("double")
            .alias("growth_ratio"),
        )
        .orderBy("month")
    )


PERIOD_OVER_PERIOD_SQL = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT month, revenue, lag(revenue) OVER (ORDER BY month) AS prev_revenue
  FROM monthly
)
SELECT month,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(prev_revenue AS DOUBLE) AS prev_revenue,
       CAST(revenue - prev_revenue AS DOUBLE) AS delta,
       CAST((CAST(revenue * 100 AS BIGINT) * 1000000)
            // CAST(prev_revenue * 100 AS BIGINT) AS DOUBLE) / 1000000
         AS growth_ratio
FROM lagged
ORDER BY month
"""


_PATTERN_WINDOW_US = 1_800_000_000  # 30 min


def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B61: sequential pattern matching (MATCH_RECOGNIZE-lite) — for
    every `view` event, the user's first `purchase` within the next 30
    minutes, with conversion latency.

    One shuffle on user_id; the "pattern" is a conditional MIN over a
    RANGE frame on the µs timeline ((1 following, 30min following]) —
    no self-join, no per-user candidate blowup, deterministic at any
    partition count. The general k-step pattern chains the same frame
    per step (each step's match ts feeds the next step's range start).
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(1, _PATTERN_WINDOW_US)
    )
    next_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts_us"))
    ).over(w)
    return (
        ev.withColumn("ts_us", us)
        .withColumn("purchase_us", next_purchase)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_event_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
            F.timestamp_micros(F.col("purchase_us")).alias("purchase_ts"),
            F.col("purchase_us").isNotNull().alias("converted"),
            (F.col("purchase_us") - F.col("ts_us")).alias("latency_us"),
        )
        .orderBy("view_event_id")
    )


EVENT_PATTERN_SQL = f"""
WITH stamped AS (
  SELECT *, epoch_us(ts) AS ts_us FROM events
),
matched AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER (
           PARTITION BY user_id ORDER BY ts_us
           RANGE BETWEEN 1 FOLLOWING AND {_PATTERN_WINDOW_US} FOLLOWING
         ) AS purchase_us
  FROM stamped
)
SELECT event_id AS view_event_id, user_id, ts AS view_ts,
       make_timestamp(purchase_us) AS purchase_ts,
       purchase_us IS NOT NULL AS converted,
       purchase_us - ts_us AS latency_us
FROM matched
WHERE event_type = 'view'
ORDER BY view_event_id
"""


_JOIN_SALT = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B67: salted JOIN for skewed keys — the join-side twin of B32's
    salted aggregation, output exact-equal to the plain join (the
    oracle states the plain form).

    The hot-key join problem: joining a fact on a key whose few hot
    values own most rows sends whole keys to single tasks. The salt
    fix replicates the DIM side R times (dim is small — replication is
    cheap) keyed by (key, salt), while each fact row picks ONE
    deterministic salt (event_id % R) — so every fact row still joins
    exactly once, but a hot key's rows spread over R tasks. AQE's
    skew-join split handles moderate skew automatically; explicit
    salting is the portable form that also works mid-pipeline where
    AQE cannot re-split (e.g. before a stateful op).

    Here: per-user event facts joined to a per-user profile dim, salted
    with R=8; output is a per-user join aggregate so the row set is
    compact and the exact-equality contract is visible.
    """
    ev = load_table(spark, sf_dir, "events")
    profile = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_seen"),
            F.count("*").alias("lifetime_events"),
        )
    )
    salted_dim = profile.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_JOIN_SALT - 1)))
    )
    salted_fact = ev.withColumn("salt", (F.col("event_id") % _JOIN_SALT))
    joined = salted_fact.join(salted_dim, ["user_id", "salt"])
    return (
        joined.groupBy("user_id", "first_seen", "lifetime_events")
        .agg(
            F.count("*").alias("n_joined"),
            F.sum(
                (F.col("ts") > F.col("first_seen")).cast("bigint")
            ).alias("n_after_first"),
        )
        .orderBy("user_id")
    )


SALTED_SKEW_JOIN_SQL = """
WITH profile AS (
  SELECT user_id, MIN(ts) AS first_seen, COUNT(*) AS lifetime_events
  FROM events GROUP BY user_id
)
SELECT e.user_id, p.first_seen, p.lifetime_events,
       COUNT(*) AS n_joined,
       CAST(SUM(CASE WHEN e.ts > p.first_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_after_first
FROM events e
JOIN profile p ON e.user_id = p.user_id
GROUP BY e.user_id, p.first_seen, p.lifetime_events
ORDER BY e.user_id
"""


_APPROX_PCT_QPCTS = (50, 90, 99)


def _approx_percentile_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic frame for C51: per target percentile, the GK-sketch
    estimate next to the exact rank-based value plus the absolute
    error (pytest pins the tight n/accuracy rank bound on this frame;
    the gate entry below hashes only the engine-independent
    projection)."""
    ev = load_table(spark, sf_dir, "events")
    import math

    from .stats import _global_row_number

    # the exact truth side ranks DISTRIBUTED (the same range-bucket
    # construction as equi_depth_histogram) — no single-partition window
    # even for the evaluation harness
    ranked, n = _global_row_number(
        ev.select("value", "event_id"), "value", ["event_id"], out="rk"
    )
    qs = [qp / 100 for qp in _APPROX_PCT_QPCTS]
    exact_pos = {q: max(1, math.ceil(q * n)) for q in qs}
    exact = ranked.filter(
        F.col("rk").isin(*exact_pos.values())
    ).select("rk", F.col("value").alias("exact_value"))
    approx = ev.agg(
        F.percentile_approx("value", qs, 10000).alias("ap")
    ).select(
        F.posexplode("ap").alias("idx", "approx_value")
    ).withColumn(
        "q", F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("idx") + 1)
    ).withColumn(
        "rk",
        F.element_at(
            F.array(*[F.lit(r) for r in exact_pos.values()]), F.col("idx") + 1
        ),
    )
    return (
        approx.join(exact, "rk")
        .select(
            "q",
            "approx_value",
            "exact_value",
            F.abs(F.col("approx_value") - F.col("exact_value")).alias("abs_err"),
        )
        .orderBy("q")
    )


def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C51: the PRODUCTION percentile path — approx_percentile
    (Greenwald-Khanna sketch, one mergeable pass, no global sort) —
    value-gated via the in-bounds verdict idiom (VERDICT r8 item 5,
    the KMV/B56 pattern).

    The sketch VALUE is engine-private (Spark runs GK, DuckDB runs a
    t-digest; their estimates differ), so the gated row carries what
    IS engine-independent: the exact rank-based percentile (ties
    broken by event_id — a unique total order both engines state) and
    an integer verdict each engine computes over ITS OWN sketch
    against the SAME verbatim rank bound — the estimate's value-rank
    bracket [rank_lo+1, rank_hi] must come within n div 100 rows of
    the target rank ceil(qpct·n/100). Spark's GK at accuracy=10000
    guarantees rank error ≤ n/10000 (100× inside the gate bound);
    DuckDB's t-digest sits far inside 1% rank error at these shapes.
    A broken sketch flips its engine's verdict to 0 and the hash
    mismatches. The tight n/accuracy check on the raw estimate stays
    pytest-pinned via ``_approx_percentile_frame``.

    This is the swap-in named by B27/B56/B63 for the exact
    global-sort constructions at 100 TB: one mergeable pass, no
    global sort; the verdict side adds one conditional rollup over a
    broadcast 3-row estimate table.
    """
    ev = load_table(spark, sf_dir, "events")

    from .stats import _global_row_number

    ranked, n = _global_row_number(
        ev.select("value", "event_id"), "value", ["event_id"], out="rk"
    )
    bound = n // 100
    targets = {qp: max(1, (qp * n + 99) // 100) for qp in _APPROX_PCT_QPCTS}
    tgt = spark.createDataFrame(
        [(qp, targets[qp]) for qp in _APPROX_PCT_QPCTS], "qpct int, rk long"
    )
    exact = ranked.join(F.broadcast(tgt), "rk").select(
        "qpct", F.col("rk").alias("target_rk"), F.col("value").alias("exact_value")
    )
    qs = [qp / 100 for qp in _APPROX_PCT_QPCTS]
    approx = (
        ev.agg(F.percentile_approx("value", qs, 10000).alias("ap"))
        .select(F.posexplode("ap").alias("idx", "av"))
        .withColumn(
            "qpct",
            F.element_at(
                F.array(*[F.lit(qp) for qp in _APPROX_PCT_QPCTS]),
                F.col("idx") + 1,
            ),
        )
        .select("qpct", "av")
    )
    # value-rank bracket of each engine's own estimate: one conditional
    # rollup over events × (3-row broadcast) — no global sort
    ranks = (
        ev.select("value")
        .crossJoin(F.broadcast(approx))
        .groupBy("qpct")
        .agg(
            F.sum((F.col("value") <= F.col("av")).cast("long")).alias("rank_hi"),
            F.sum((F.col("value") < F.col("av")).cast("long")).alias("rank_lo"),
        )
    )
    return (
        exact.join(ranks, "qpct")
        .select(
            "qpct",
            "exact_value",
            (
                (F.col("rank_hi") + F.lit(bound) >= F.col("target_rk"))
                & (F.col("rank_lo") + 1 <= F.col("target_rk") + F.lit(bound))
            )
            .cast("int")
            .alias("within_1pct_rank"),
        )
        .orderBy("qpct")
    )


APPROX_PERCENTILE_SKETCH_SQL = """
WITH nn AS (SELECT COUNT(*) AS n FROM events),
ranked AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk
  FROM events
),
q AS (SELECT * FROM (VALUES (50), (90), (99)) t(qpct)),
tgt AS (
  SELECT q.qpct,
         GREATEST(1, (q.qpct * nn.n + 99) // 100) AS target_rk,
         nn.n // 100 AS bound
  FROM q, nn
),
a AS (
  SELECT 50 AS qpct, approx_quantile(value, 0.50) AS av FROM events
  UNION ALL SELECT 90, approx_quantile(value, 0.90) FROM events
  UNION ALL SELECT 99, approx_quantile(value, 0.99) FROM events
),
r AS (
  SELECT a.qpct,
         SUM(CASE WHEN e.value <= a.av THEN 1 ELSE 0 END) AS rank_hi,
         SUM(CASE WHEN e.value < a.av THEN 1 ELSE 0 END) AS rank_lo
  FROM a, events e GROUP BY a.qpct
)
SELECT t.qpct,
       x.value AS exact_value,
       CAST(CASE WHEN r.rank_hi + t.bound >= t.target_rk
                  AND r.rank_lo + 1 <= t.target_rk + t.bound
                 THEN 1 ELSE 0 END AS INT) AS within_1pct_rank
FROM tgt t
JOIN ranked x ON x.rk = t.target_rk
JOIN r ON r.qpct = t.qpct
ORDER BY t.qpct
"""


_ISLAND_MIN_RUN = 3


def event_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B69: gaps-and-islands — maximal runs of consecutive same-type
    events per user (the downtime-window / streak primitive: "every
    stretch of >= 3 straight errors with its start/end").

    The classic two-row_number trick: rn over the user's full sequence
    minus rn over the user's per-type sequence is constant exactly
    within a maximal same-type run, so ONE extra window turns runs into
    group keys — no self-join, no iteration; both windows share the
    user_id shuffle. Runs shorter than the threshold are pruned after
    the rollup (they still cost only their own rows).
    """
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_type)
    )
    return (
        runs.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count("*").alias("run_len"),
            F.min("event_id").alias("first_event_id"),
        )
        .filter(F.col("run_len") >= _ISLAND_MIN_RUN)
        .select(
            "user_id", "event_type", "run_start", "run_end", "run_len", "first_event_id"
        )
        .orderBy("user_id", "run_start", "first_event_id")
    )


EVENT_ISLANDS_SQL = f"""
WITH runs AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
  FROM events
)
SELECT user_id, event_type,
       MIN(ts) AS run_start, MAX(ts) AS run_end,
       COUNT(*) AS run_len,
       MIN(event_id) AS first_event_id
FROM runs
GROUP BY user_id, event_type, grp
HAVING COUNT(*) >= {_ISLAND_MIN_RUN}
ORDER BY user_id, run_start, first_event_id
"""


TOPK_OTHERS_K = 5


def topk_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B70: top-K groups + an OTHER bucket — the BI presentation staple
    (every dashboard's "top 5 nations by revenue, rest lumped").

    Rank the nation rollup, relabel ranks > K to 'OTHER', re-aggregate:
    the second aggregate runs over |groups| rows so the fact table is
    touched once. Revenue stays DECIMAL through both aggregations
    (re-aggregating already-rounded doubles would double-round) and the
    share is an exact scaled-integer division off the total.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("n_name"))
    labeled = rev.withColumn(
        "bucket",
        F.when(F.row_number().over(w) <= TOPK_OTHERS_K, F.col("n_name")).otherwise(
            F.lit("OTHER")
        ),
    )
    total = rev.agg(F.sum("revenue").alias("total_revenue"))
    return (
        labeled.groupBy("bucket")
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("revenue").alias("rev"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_nations",
            F.col("rev").cast("double").alias("revenue"),
            # integer-cents floor division: decimal `div` semantics
            # differ off-by-one between engines at scale boundaries
            F.expr(
                "(CAST(rev * 100 AS BIGINT) * 1000000)"
                " div CAST(total_revenue * 100 AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.desc("revenue"), "bucket")
    )


TOPK_OTHERS_SQL = f"""
WITH rev AS (
  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
),
labeled AS (
  SELECT *,
         CASE WHEN ROW_NUMBER() OVER (ORDER BY revenue DESC, n_name ASC) <= {TOPK_OTHERS_K}
              THEN n_name ELSE 'OTHER' END AS bucket
  FROM rev
),
total AS (SELECT SUM(revenue) AS total_revenue FROM rev)
SELECT bucket,
       COUNT(*) AS n_nations,
       CAST(SUM(revenue) AS DOUBLE) AS revenue,
       (CAST(SUM(revenue) * 100 AS BIGINT) * 1000000)
         // CAST(total_revenue * 100 AS BIGINT) AS share_ppm
FROM labeled, total
GROUP BY bucket, total_revenue
ORDER BY revenue DESC, bucket
"""


QNORM_TAIL = 0.99


def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B75: per-group quantile (ECDF) normalization — the feature
    transform that maps a raw metric onto its within-group percentile,
    reported for the extreme tail (>= {QNORM_TAIL}).

    percent_rank over the unique total order (value, event_id) within
    each event_type: ties cannot occur, so rank == row_number and the
    score is the single IEEE division (rank-1)/(n-1) — bit-identical
    across engines with no rounding fudge.

    Scale shape: a per-group window funnels each of the ~5 event types
    through ONE task (the few-huge-groups cliff). Because only the tail
    is emitted, the executed plan is the same two-phase top-K as
    top_percent_per_group: every input partition keeps its LOCAL top
    K_g rows per group, where K_g (from one 5-row count aggregate,
    inlined) over-covers the tail — a provable superset since no
    partition contributes more than K_g tail rows. The exact DESCENDING
    rank over the <= K_g*P survivors converts back to the ascending
    rank (rk_asc = n_g - rk_desc + 1), so the emitted pct_rank is
    bit-identical to the full-group window the oracle states.
    """
    import math

    ev = load_table(spark, sf_dir, "events")
    counts = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    # the collect→CASE-literal plan is only valid for a tiny, bounded
    # group domain (5 event types); fail loudly on a wide domain rather
    # than silently building a huge CASE on the driver (r4 verdict #2)
    if len(counts) > 64:
        raise ValueError(
            f"quantile_normalize: {len(counts)} distinct group keys; "
            "the inlined CASE-literal count table is bounded at 64 — "
            "broadcast-join the count aggregate instead for wide domains"
        )
    n_arms, k_arms = [], []
    for et, n in sorted(counts.items()):
        # tail rows have rk_asc >= TAIL*(n-1)+1; +1 pads the floor
        k = n - math.floor(QNORM_TAIL * (n - 1)) + 1
        n_arms.append(f"WHEN event_type = '{et}' THEN CAST({n} AS BIGINT)")
        k_arms.append(f"WHEN event_type = '{et}' THEN CAST({k} AS BIGINT)")
    n_group = F.expr("CASE " + " ".join(n_arms) + " END")
    k_group = F.expr("CASE " + " ".join(k_arms) + " END")
    w_local = Window.partitionBy("event_type", "_pid").orderBy(
        F.desc("value"), F.desc("event_id")
    )
    pruned = (
        ev.withColumn("_pid", F.spark_partition_id())
        .withColumn("_k", k_group)
        .withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= F.col("_k"))
        .drop("_pid", "_k", "_lrk")
    )
    w_desc = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.desc("event_id")
    )
    return (
        pruned.withColumn("_n", n_group)
        .withColumn("_rkd", F.row_number().over(w_desc))
        .withColumn(
            "pct_rank",
            (F.col("_n") - F.col("_rkd")) / (F.col("_n") - F.lit(1)),
        )
        .filter(F.col("pct_rank") >= QNORM_TAIL)
        .select("event_id", "event_type", "value", "pct_rank")
        .orderBy("event_type", "event_id")
    )


QUANTILE_NORMALIZE_SQL = f"""
SELECT event_id, event_type, value, pct_rank
FROM (
  SELECT event_id, event_type, value,
         percent_rank() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS pct_rank
  FROM events
)
WHERE pct_rank >= {QNORM_TAIL}
ORDER BY event_type, event_id
"""


# --- B79: marketing attribution ----------------------------------------

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


def attribution_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B79: last-touch revenue attribution — every purchase credits its
    value to the user's most recent view/click in the preceding 7 days
    ('none' when no touch qualifies), rolled up per touch channel.

    The touch is found with ONE conditional MAX over a µs RANGE frame
    (no purchases x touches self-join): the frame [ts-7d, ts] sees only
    the same user's earlier events, and the argmax is encoded as a
    scalar key ts_us*8 + channel_code so 'which channel was latest'
    survives the MAX (same-µs ties resolve to the higher code —
    deterministic in both engines; epoch-µs * 8 stays far inside
    BIGINT). One shuffle on user_id, then a tiny channel rollup;
    revenue sums are DECIMAL. At 100 TB the frame is bounded by a
    user's 7-day event count — the same state bound the streaming
    interval join (B47) relies on.

    Oracle: identical RANGE-frame SQL in DuckDB.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ATTR_WINDOW_US, 0)
    )
    touch_key = F.max(
        F.when(F.col("event_type") == "view", F.col("ts_us") * 8 + 1).when(
            F.col("event_type") == "click", F.col("ts_us") * 8 + 2
        )
    ).over(w)
    return (
        ev.withColumn("ts_us", us)
        .withColumn("touch_key", touch_key)
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "touch_channel",
            F.when(F.col("touch_key").isNull(), "none")
            .when(F.col("touch_key") % 8 == 1, "view")
            .otherwise("click"),
        )
        .groupBy("touch_channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 4)
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("touch_channel")
    )


ATTRIBUTION_SQL = f"""
WITH stamped AS (
  SELECT *, epoch_us(ts) AS ts_us FROM events
),
touched AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'view' THEN ts_us * 8 + 1
                  WHEN event_type = 'click' THEN ts_us * 8 + 2 END) OVER (
           PARTITION BY user_id ORDER BY ts_us
           RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING AND CURRENT ROW
         ) AS touch_key
  FROM stamped
)
SELECT CASE WHEN touch_key IS NULL THEN 'none'
            WHEN touch_key % 8 = 1 THEN 'view'
            ELSE 'click' END AS touch_channel,
       COUNT(*) AS n_purchases,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 4) AS DOUBLE) AS attributed_value
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1
ORDER BY 1
"""


# --- B84: Markov transition matrix -------------------------------------


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B84: user-journey transition matrix — P(next event type | current
    event type) as exact integer basis points, from per-user event
    sequences.

    One lag pipeline: lead(event_type) over (user_id ORDER BY ts,
    event_id) — the unique (ts, event_id) order makes peer order
    engine-independent — then a 5x5-ish rollup. Terminal events (no
    successor) transition to 'END' so every row of the matrix sums to
    ~10000 bp (floor-division slack), which the pytest asserts. One
    shuffle on user_id, then a |types|^2 aggregate; the probability
    denominator is a window over the tiny aggregated frame.

    The journey-analysis staple (what follows a view?) and the
    verification twin of funnel/pattern ops (B36/B61): their ordered
    steps are this matrix's heavy cells.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .select(
            F.col("event_type").alias("from_type"),
            F.coalesce(F.col("next_type"), F.lit("END")).alias("to_type"),
        )
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_tot = Window.partitionBy("from_type")
    return (
        trans.withColumn("row_total", F.sum("n").over(w_tot))
        .withColumn("prob_bp", F.expr("(n * 10000) div row_total"))
        .select("from_type", "to_type", "n", "row_total", "prob_bp")
        .orderBy("from_type", "to_type")
    )


MARKOV_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         COALESCE(LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id), 'END') AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
       CAST((n * 10000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_bp
FROM trans
ORDER BY from_type, to_type
"""


# --- B87: period-over-period top movers --------------------------------

TOP_MOVERS_N = 5


def top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B87: week-over-week top movers — the biggest gainers and
    decliners by (event_type, week) revenue, with integer-bp deltas.

    The drill-down BI staple on top of B60's growth series: rank every
    (type, week) pair by its signed bp change vs the prior week and
    keep the top/bottom {TOP_MOVERS_N}. Exact DECIMAL weekly sums; the
    delta is integer cents so the ranking key is engine-exact, and the
    bp change uses cross-multiplied integer floor division against the
    prior week (sign handled by separate gainer/decliner rankings over
    positive/negative deltas — no signed floor-division divergence).
    One shuffle (week rollup), a lag window over the tiny (type, week)
    frame, and two TakeOrdered top-Ns.
    """
    ev = load_table(spark, sf_dir, "events")
    monthly = (
        ev.groupBy(
            F.col("event_type"),
            F.date_trunc("week", F.col("ts")).alias("period"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("period")
    deltas = (
        monthly.withColumn("prev_cents", F.lag("cents").over(w))
        .filter(F.col("prev_cents").isNotNull() & (F.col("prev_cents") != 0))
        .withColumn("delta_cents", F.col("cents") - F.col("prev_cents"))
        .withColumn(
            "abs_change_bp",
            F.expr("(abs(delta_cents) * 10000) div abs(prev_cents)"),
        )
    )
    gain = (
        deltas.filter(F.col("delta_cents") >= 0)
        .withColumn("direction", F.lit("gain"))
        .orderBy(F.desc("abs_change_bp"), "event_type", "period")
        .limit(TOP_MOVERS_N)
    )
    drop = (
        deltas.filter(F.col("delta_cents") < 0)
        .withColumn("direction", F.lit("drop"))
        .orderBy(F.desc("abs_change_bp"), "event_type", "period")
        .limit(TOP_MOVERS_N)
    )
    return (
        gain.unionAll(drop)
        .select(
            "direction",
            "event_type",
            F.col("period").cast("date").alias("period"),
            "cents",
            "prev_cents",
            "delta_cents",
            "abs_change_bp",
        )
        .orderBy("direction", F.desc("abs_change_bp"), "event_type", "period")
    )


TOP_MOVERS_SQL = f"""
WITH monthly AS (
  SELECT event_type, date_trunc('week', ts) AS period,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, period
),
deltas AS (
  SELECT *, cents - prev_cents AS delta_cents,
         CAST((ABS(cents - prev_cents) * 10000) // ABS(prev_cents) AS BIGINT)
           AS abs_change_bp
  FROM (
    SELECT *, LAG(cents) OVER (PARTITION BY event_type ORDER BY period)
                AS prev_cents
    FROM monthly
  )
  WHERE prev_cents IS NOT NULL AND prev_cents <> 0
),
gain AS (
  SELECT 'gain' AS direction, event_type, period, cents, prev_cents,
         delta_cents, abs_change_bp
  FROM deltas WHERE delta_cents >= 0
  ORDER BY abs_change_bp DESC, event_type, period
  LIMIT {TOP_MOVERS_N}
),
drop_ AS (
  SELECT 'drop' AS direction, event_type, period, cents, prev_cents,
         delta_cents, abs_change_bp
  FROM deltas WHERE delta_cents < 0
  ORDER BY abs_change_bp DESC, event_type, period
  LIMIT {TOP_MOVERS_N}
)
SELECT direction, event_type, CAST(period AS DATE) AS period,
       cents, prev_cents, delta_cents, abs_change_bp
FROM (SELECT * FROM gain UNION ALL SELECT * FROM drop_)
ORDER BY direction, abs_change_bp DESC, event_type, period
"""


# --- B90: grid-bucketed spatial self-join ------------------------------

_GEO_SPACE = 1_000_000  # micro-degree coordinate space per axis
_GEO_RADIUS = 10_000    # pair radius (1% of the axis)


def _geo_coord(prefix: str, col):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 7
            ),
            16,
            10,
        ).cast("bigint")
        % _GEO_SPACE
    )


def geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B90: radius self-join via grid bucketing — all customer pairs
    within distance d, with candidate generation that is an EQUI-join
    on grid cells, never a cross join (the 2-D sibling of B49's
    interval bins).

    Coordinates are deterministic micro-unit integers (content-hash of
    the key — engine-identical, no floats anywhere). Cell size == the
    radius, so a qualifying pair's cells differ by at most 1 per axis:
    the left side enumerates its 3x3 neighbor cells (explode of 9
    literal offsets), the right side keeps its own cell, and the join
    is a plain equi-join on the cell id + exact integer dist² filter.
    Each pair is produced exactly once (one neighbor offset matches
    the right cell; key_a < key_b halves the space). Candidates scale
    with local density x N — the geohash-join shape every spatial
    engine lowers to at 100 TB.

    Oracle: the O(N²) direct filter — small at gate scale, provably
    the same semantics the bucketing must reproduce.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        _geo_coord("gx:", F.col("c_custkey")).alias("x"),
        _geo_coord("gy:", F.col("c_custkey")).alias("y"),
    )
    d = _GEO_RADIUS
    pts = cust.withColumn("cx", F.expr(f"x div {d}")).withColumn(
        "cy", F.expr(f"y div {d}")
    )
    offsets = F.expr(
        "explode(array("
        + ", ".join(f"struct({dx} AS dx, {dy} AS dy)" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        + "))"
    )
    left = pts.select(
        F.col("k").alias("key_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "key_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("k").alias("key_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn(
            "dist2_u",
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")),
        )
        .filter(F.col("dist2_u") <= d * d)
        .select("key_a", "key_b", "dist2_u")
        .orderBy("key_a", "key_b")
    )


def _geo_coord_sql(prefix: str, col: str) -> str:
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{prefix}' || CAST({col} AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    )
    return f"(({terms}) % {_GEO_SPACE})"


GEO_GRID_JOIN_SQL = f"""
WITH pts AS (
  SELECT c_custkey AS k,
         {_geo_coord_sql('gx:', 'c_custkey')} AS x,
         {_geo_coord_sql('gy:', 'c_custkey')} AS y
  FROM customer
)
SELECT a.k AS key_a, b.k AS key_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         AS dist2_u
FROM pts a JOIN pts b ON a.k < b.k
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_GEO_RADIUS * _GEO_RADIUS}
ORDER BY key_a, key_b
"""


# --- B91: CUSUM changepoint detection ----------------------------------


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B91: CUSUM changepoint detection over the daily revenue series —
    where did the level shift?

    Classic mean-shift CUSUM with the division-free integer form:
    S_t = Σ_{i<=t} (n·x_i − total) (x in exact cents; n = series
    length) is n times the usual cumulative deviation from the mean,
    so argmax |S_t| — the changepoint estimate — is unchanged and every
    intermediate is a BIGINT (order-insensitive, engine-exact; no
    mean rounding anywhere). The raw series aggregates from orders
    (one shuffle); the running sum is a window over the |days|-row
    daily frame, which is CONSTANT-size in data volume — more data
    fattens the days, it doesn't lengthen the window.

    Output: the daily series with S_t and the changepoint flag
    (ties → earliest day, stated identically in both engines).
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).alias(
                "cents"
            )
        )
    )
    totals = daily.agg(
        F.count("*").alias("n"), F.sum("cents").alias("total")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        daily.crossJoin(F.broadcast(totals))
        .withColumn("dev", F.col("n") * F.col("cents") - F.col("total"))
        .withColumn("s_t", F.sum("dev").over(w))
    )
    best = scored.agg(F.max(F.abs(F.col("s_t"))).alias("peak"))
    first_peak = (
        scored.crossJoin(F.broadcast(best))
        .filter(F.abs(F.col("s_t")) == F.col("peak"))
        .agg(F.min("d").alias("cp_day"))
    )
    return (
        scored.crossJoin(F.broadcast(first_peak))
        .select(
            "d",
            "cents",
            "s_t",
            (F.col("d") == F.col("cp_day")).cast("int").alias("is_changepoint"),
        )
        .orderBy("d")
    )


CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY d
),
tot AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total FROM daily),
scored AS (
  SELECT d, cents,
         CAST(SUM(n * cents - total) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS s_t
  FROM daily, tot
),
best AS (SELECT MAX(ABS(s_t)) AS peak FROM scored),
cp AS (SELECT MIN(d) AS cp_day FROM scored, best WHERE ABS(s_t) = peak)
SELECT d, cents, s_t, CAST(d = (SELECT cp_day FROM cp) AS INT) AS is_changepoint
FROM scored
ORDER BY d
"""


# --- B101 (round-8 addition): seasonal decomposition --------------------

_SEAS_P = 7  # weekly period: centered MA width and seasonal slot count


def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B101 (round-8 addition): classical seasonal decomposition of the
    per-event-type daily revenue series — the trend/seasonal split
    every capacity/anomaly dashboard draws: trend = centered 7-day
    moving average, seasonal index = mean detrended value per weekday.
    All INTEGER-exact by working at 7x scale: with a full 7-row
    centered window, detrended_x7 = 7*day_cents - rolling_sum_cents is
    an integer, and the weekday seasonal index is its floor-div mean —
    no double division anywhere, so the oracle hashes bit-for-bit.

    Plan: one scan -> per-(type, day) rollup; the centered MA is a
    BOUNDED two-sided ROWS frame (-3, +3) partitioned by event_type —
    bounded frames are O(1)/row (the banned class is growing unbounded-
    FOLLOWING frames); rows lacking the full window (series edges) are
    excluded by the frame COUNT, exactly as the textbook method drops
    the first/last half-window. One more groupBy lands the weekday
    index. Day gaps (none in this corpus's daily cadence, but possible
    upstream) make the frame span 7 OBSERVATIONS rather than 7
    calendar days — deterministic in both engines and stated here.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_SEAS_P // 2), _SEAS_P // 2)
    )
    detr = (
        daily.withColumn("win_n", F.count("*").over(w))
        .withColumn("win_sum", F.sum("cents").over(w))
        .filter(F.col("win_n") == _SEAS_P)
        .select(
            "event_type",
            (F.dayofweek("day") - 1).alias("weekday"),  # Sunday = 0
            (F.col("cents") * _SEAS_P - F.col("win_sum")).alias("d7"),
        )
    )
    return (
        detr.groupBy("event_type", "weekday")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("d7").alias("sum_detrended_x7"),
        )
        .select(
            "event_type",
            "weekday",
            "n_days",
            "sum_detrended_x7",
            F.expr("sum_detrended_x7 div n_days").alias("seasonal_x7_cents"),
        )
        .orderBy("event_type", "weekday")
    )


SEASONAL_DECOMPOSE_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         SUM(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
),
win AS (
  SELECT event_type, day, cents,
         COUNT(*) OVER w AS win_n,
         SUM(cents) OVER w AS win_sum
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_SEAS_P // 2} PRECEDING
                        AND {_SEAS_P // 2} FOLLOWING)
),
detr AS (
  SELECT event_type, dayofweek(day) AS weekday,
         cents * {_SEAS_P} - win_sum AS d7
  FROM win WHERE win_n = {_SEAS_P}
)
SELECT event_type, CAST(weekday AS INT) AS weekday,
       COUNT(*) AS n_days,
       CAST(SUM(d7) AS BIGINT) AS sum_detrended_x7,
       CAST(SUM(d7) // COUNT(*) AS BIGINT) AS seasonal_x7_cents
FROM detr
GROUP BY event_type, weekday
ORDER BY event_type, weekday
"""


_ACF_MAX_LAG = 7


def count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B106 (round-8 addition): autocorrelation of the daily event-count
    series at lags 1..{L} — the seasonality detector that tells a
    capacity planner WHICH period matters before B101 decomposes it
    (a weekly cycle shows as a lag-7 peak). Per (event_type, lag):
    overlapping-pair count and Pearson r in ppm. The day grid is
    GAP-FILLED (a silent day is a 0-count observation, not a missing
    row — lagging over existing rows would silently splice across
    gaps and fabricate correlation). All five sufficient statistics
    (sum x, sum y, sum xy, sum x^2, sum y^2) are exact BIGINT sums of
    integer counts — no order-dependent double accumulation; only the
    final r touches doubles (sqrt is correctly rounded in both
    engines), floored to ppm. Zero-variance windows report NULL.

    Plan: day index = integer division of epoch-micros (no date-type
    round trips), one (type, day) rollup, per-type min/max day rolled
    into a spine via sequence+explode, counts left-joined (zeros
    filled), the {L} lags joined as (type, day+lag) equi-joins on the
    SAME gap-filled relation, one final (type, lag) rollup. Shuffle
    width is days x types — the rollup compresses the feed first.
    """.format(L=_ACF_MAX_LAG)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("c"))
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "event_type", F.explode(F.expr("sequence(d0, d1)")).alias("day")
    )
    grid = (
        spine.join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("c", F.lit(0)).alias("c"))
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    x = grid.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("day") + F.col("lag")).alias("jday"),
        F.col("c").alias("xc"),
    )
    y = grid.select(
        "event_type", F.col("day").alias("jday"), F.col("c").alias("yc")
    )
    pairs = x.join(y, ["event_type", "jday"])
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("xc").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("xc") * F.col("yc")).alias("sxy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
    )
    r_expr = (
        "CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0 "
        "THEN CAST(floor(CAST(n_pairs * sxy - sx * sy AS DOUBLE) * 1000000.0 "
        "/ (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) "
        "* sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))) AS BIGINT) "
        "ELSE NULL END"
    )
    return (
        stats.select(
            "event_type", "lag", "n_pairs", F.expr(r_expr).alias("r_ppm")
        )
        .orderBy("event_type", "lag")
    )


COUNT_AUTOCORR_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events
),
daily AS (
  SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY event_type, day
),
spine AS (
  SELECT event_type, unnest(range(d0, d1 + 1)) AS day
  FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY event_type)
),
grid AS (
  SELECT s.event_type, s.day, COALESCE(d.c, 0) AS c
  FROM spine s LEFT JOIN daily d
    ON d.event_type = s.event_type AND d.day = s.day
),
pairs AS (
  SELECT x.event_type, l.lag, x.c AS xc, y.c AS yc
  FROM grid x
  CROSS JOIN (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag) l
  JOIN grid y ON y.event_type = x.event_type AND y.day = x.day + l.lag
),
stats AS (
  SELECT event_type, lag, COUNT(*) AS n_pairs,
         SUM(xc) AS sx, SUM(yc) AS sy, SUM(xc * yc) AS sxy,
         SUM(xc * xc) AS sxx, SUM(yc * yc) AS syy
  FROM pairs GROUP BY event_type, lag
)
SELECT event_type, CAST(lag AS INTEGER) AS lag,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
            THEN CAST(FLOOR(CAST(n_pairs * sxy - sx * sy AS DOUBLE) * 1000000.0
                   / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))))
                 AS BIGINT)
            ELSE NULL END AS r_ppm
FROM stats
ORDER BY event_type, lag
"""


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B110 (round-8 addition): conversion-latency readout for the B36
    funnel — the OTHER half of funnel analysis: not how many users
    convert, but how long each step takes (the number an SLA or a
    remarketing window is set from). Per transition (view->click,
    click->purchase, counting only B36-ordered conversions from each
    user's EARLIEST stage times): converter count, exact nearest-rank
    median and p90 of the step latency in whole seconds, and the mean
    (integer-micros sum under truncating division). No float
    percentile interpolation — the cutoffs are selected order
    statistics, the same ceil-rank discipline as B105.

    Plan: one user_id rollup builds the three earliest-stage times
    (B36's exact shape), latencies are map-side, one per-transition
    sort window ranks them (two transition partitions), cutoff rows
    collapse via conditional aggregation. The feed shuffles once; the
    window input is converters, not events.
    """
    ev = load_table(spark, sf_dir, "events")
    stage_min = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in ("view", "click", "purchase")
    ]
    per_user = ev.groupBy("user_id").agg(*stage_min)
    reached_click = F.col("t_view").isNotNull() & (
        F.col("t_click") > F.col("t_view")
    )
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    d1 = per_user.filter(reached_click).select(
        F.lit("view->click").alias("transition"),
        (F.unix_micros("t_click") - F.unix_micros("t_view")).alias("d_us"),
    )
    d2 = per_user.filter(reached_purchase).select(
        F.lit("click->purchase").alias("transition"),
        (F.unix_micros("t_purchase") - F.unix_micros("t_click")).alias("d_us"),
    )
    deltas = d1.unionByName(d2)
    w = Window.partitionBy("transition").orderBy("d_us")
    w_n = Window.partitionBy("transition")
    ranked = deltas.select(
        "transition", "d_us",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    return (
        ranked.groupBy("transition")
        .agg(
            F.count("*").alias("n_converters"),
            F.min(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("d_us"))
            ).alias("p50_us"),
            F.min(
                F.when(F.col("rn") == F.expr("(n * 9 + 9) div 10"), F.col("d_us"))
            ).alias("p90_us"),
            F.expr("sum(d_us) div count(*)").alias("mean_us"),
        )
        .select(
            "transition", "n_converters",
            F.expr("p50_us div 1000000").alias("p50_s"),
            F.expr("p90_us div 1000000").alias("p90_s"),
            F.expr("mean_us div 1000000").alias("mean_s"),
        )
        .orderBy("transition")
    )


FUNNEL_TIME_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
deltas AS (
  SELECT 'view->click' AS transition,
         epoch_us(t_click) - epoch_us(t_view) AS d_us
  FROM per_user
  WHERE t_view IS NOT NULL AND t_click > t_view
  UNION ALL
  SELECT 'click->purchase' AS transition,
         epoch_us(t_purchase) - epoch_us(t_click) AS d_us
  FROM per_user
  WHERE t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
),
ranked AS (
  SELECT transition, d_us,
         ROW_NUMBER() OVER (PARTITION BY transition ORDER BY d_us) AS rn,
         COUNT(*) OVER (PARTITION BY transition) AS n
  FROM deltas
)
SELECT transition,
       CAST(COUNT(*) AS BIGINT) AS n_converters,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN d_us END)
              // 1000000 AS BIGINT) AS p50_s,
       CAST(MIN(CASE WHEN rn = (n * 9 + 9) // 10 THEN d_us END)
              // 1000000 AS BIGINT) AS p90_s,
       CAST(SUM(d_us) // COUNT(*) // 1000000 AS BIGINT) AS mean_s
FROM ranked
GROUP BY transition
ORDER BY transition
"""


_PATH_TOPK = 20  # trigram paths reported


def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B121 (round-8 addition): top in-session event paths — the Sankey
    /user-flow readout product analytics builds from the session model:
    within each B7 session (30-min gap rule, same lag->flag->running-sum
    construction over ONE user_id exchange) every consecutive
    3-step event-type path (step1 -> step2 -> step3 over the (ts,
    event_id) order) is counted corpus-wide; the top {k} paths by
    count (full deterministic tiebreak on the three steps) are
    reported with the count, the share of all trigram instances in
    basis points, and the count of distinct users who walked the
    path. B46's Markov matrix is the 1-step marginal of this; paths
    of length 3 are where flow analysis starts to show intent, and
    where the pair matrix provably loses information.

    Plan: the session windows reuse the single user_id sort shuffle;
    the two leads ride the same (user, session) partition order;
    one (s1,s2,s3) rollup (map-side combined) plus a distinct-user
    count; top-k via a bounded TakeOrdered-style global sort over the
    |event_type|^3-bounded path table — never over instances. Total
    instance scalar is a 1-row broadcast.
    """.format(k=_PATH_TOPK)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > _GAP_MINUTES * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.withColumn("is_new", new_session).withColumn(
        "session_idx", F.sum("is_new").over(w)
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    tri = (
        sess.withColumn("s2", F.lead("event_type", 1).over(ws))
        .withColumn("s3", F.lead("event_type", 2).over(ws))
        .filter(F.col("s3").isNotNull())
        .select(
            F.col("event_type").alias("step1"),
            F.col("s2").alias("step2"),
            F.col("s3").alias("step3"),
            "user_id",
        )
    )
    counts = tri.groupBy("step1", "step2", "step3").agg(
        F.count("*").alias("n_instances"),
        F.countDistinct("user_id").alias("n_users"),
    )
    total = tri.agg(F.count("*").alias("total_instances"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "step1", "step2", "step3", "n_instances", "n_users",
            F.expr("n_instances * 10000 div total_instances").alias(
                "share_bp"
            ),
        )
        .orderBy(
            F.desc("n_instances"), "step1", "step2", "step3"
        )
        .limit(_PATH_TOPK)
    )


SESSION_PATH_TRIGRAMS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
              > {_GAP_MINUTES} * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
tri AS (
  SELECT event_type AS step1,
         LEAD(event_type, 1) OVER ws AS step2,
         LEAD(event_type, 2) OVER ws AS step3,
         user_id
  FROM numbered
  WINDOW ws AS (PARTITION BY user_id, session_idx ORDER BY ts, event_id)
  QUALIFY LEAD(event_type, 2) OVER ws IS NOT NULL
),
counts AS (
  SELECT step1, step2, step3,
         COUNT(*) AS n_instances,
         COUNT(DISTINCT user_id) AS n_users
  FROM tri GROUP BY step1, step2, step3
)
SELECT step1, step2, step3,
       CAST(n_instances AS BIGINT) AS n_instances,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_instances * 10000 // (SELECT COUNT(*) FROM tri) AS BIGINT)
         AS share_bp
FROM counts
ORDER BY n_instances DESC, step1, step2, step3
LIMIT {_PATH_TOPK}
"""


def concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B124 (round-8 addition): peak concurrent sessions per day — the
    capacity number (license seats, connection pools, autoscaling
    floors) that neither the backlog series (B123 counts open ORDERS
    by day) nor any rollup gives, because concurrency is an interval
    sweep-line property: over B7's sessions (same gap rule), each
    session contributes +1 at its start and -1 after its end; the
    day's peak is the maximum of the running sum. Inclusive-overlap
    tie rule (a session starting at instant t overlaps one ending at
    t): all +1 deltas at a timestamp order before the -1s — the daily
    MAX is invariant to any further order among equal deltas, so the
    statement is engine-exact without a unique tiebreak.

    Cross-midnight sessions are handled by carry-in, not a global
    sweep: each session explodes to the days it touches (bounded by
    session length — the 30-min gap rule bounds sessions by activity
    span), a day's carry_in counts sessions that started earlier and
    are still open at midnight, and the within-day sweep runs in a
    per-DAY partition window (hot days are one partition — at extreme
    scale the day key gains an hour-grain pre-sweep, the standard
    two-level sweep; stated, not built). Emits per day: sessions
    touching the day, carry-in at midnight, and the concurrency peak.
    """
    DAY_US = 86_400_000_000
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > _GAP_MINUTES * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = (
        ev.withColumn("is_new", new_session)
        .withColumn("session_idx", F.sum("is_new").over(w))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_us"),
            F.max(F.unix_micros("ts")).alias("e_us"),
        )
    )
    from ..operators.dedup import _swap_persist

    sessions = _swap_persist("conc_sessions", sessions)
    touch = sessions.select(
        "s_us", "e_us",
        F.explode(
            F.expr(f"sequence(s_us div {DAY_US}, e_us div {DAY_US})")
        ).alias("day"),
    )
    carry = touch.filter(
        F.expr(f"s_us div {DAY_US} < day")
    ).groupBy("day").agg(F.count("*").alias("carry_in"))
    touching = touch.groupBy("day").agg(F.count("*").alias("n_sessions"))
    deltas = sessions.select(
        F.expr(f"s_us div {DAY_US}").alias("day"),
        F.col("s_us").alias("at_us"),
        F.lit(1).alias("delta"),
    ).unionByName(
        sessions.select(
            F.expr(f"e_us div {DAY_US}").alias("day"),
            F.col("e_us").alias("at_us"),
            F.lit(-1).alias("delta"),
        )
    )
    ws = (
        Window.partitionBy("day")
        .orderBy("at_us", F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # within-day running sum counts only sessions that STARTED that day
    # (a cross-midnight session's -1 lands on its end day, where its +1
    # is the carry_in, so the sum stays consistent: peak = carry_in +
    # max(running) when any within-day activity exists
    within = (
        deltas.withColumn("run", F.sum("delta").over(ws))
        .groupBy("day")
        .agg(F.max("run").alias("max_run"))
    )
    return (
        touching.join(carry, "day", "left")
        .join(within, "day", "left")
        .select(
            "day",
            "n_sessions",
            F.coalesce("carry_in", F.lit(0)).alias("carry_in"),
            (
                F.coalesce("carry_in", F.lit(0))
                + F.greatest(F.coalesce("max_run", F.lit(0)), F.lit(0))
            ).alias("peak_concurrency"),
        )
        .orderBy("day")
    )


CONCURRENT_SESSIONS_PEAK_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
              > {_GAP_MINUTES} * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
sessions AS (
  SELECT user_id, session_idx,
         MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
  FROM numbered GROUP BY user_id, session_idx
),
touch AS (
  SELECT s_us, e_us, day
  FROM sessions,
       UNNEST(generate_series(s_us // 86400000000, e_us // 86400000000))
         AS t(day)
),
carry AS (
  SELECT day, COUNT(*) AS carry_in FROM touch
  WHERE s_us // 86400000000 < day GROUP BY day
),
touching AS (SELECT day, COUNT(*) AS n_sessions FROM touch GROUP BY day),
deltas AS (
  SELECT s_us // 86400000000 AS day, s_us AS at_us, 1 AS delta FROM sessions
  UNION ALL
  SELECT e_us // 86400000000 AS day, e_us AS at_us, -1 AS delta FROM sessions
),
within AS (
  SELECT day, MAX(run) AS max_run
  FROM (
    SELECT day, SUM(delta) OVER (PARTITION BY day
                                 ORDER BY at_us, delta DESC
                                 ROWS UNBOUNDED PRECEDING) AS run
    FROM deltas
  ) GROUP BY day
)
SELECT t.day,
       CAST(t.n_sessions AS BIGINT) AS n_sessions,
       CAST(COALESCE(c.carry_in, 0) AS BIGINT) AS carry_in,
       CAST(COALESCE(c.carry_in, 0)
            + GREATEST(COALESCE(w.max_run, 0), 0) AS BIGINT)
         AS peak_concurrency
FROM touching t
LEFT JOIN carry c ON c.day = t.day
LEFT JOIN within w ON w.day = t.day
ORDER BY t.day
"""


_EWMA_K = 16  # truncation depth; dyadic alpha = 1/2
_EWMA_WSUM = 2 ** _EWMA_K - 1  # sum_{i=1..K} 2^(K-i) = 65535


def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B128 (round-8 addition): EWMA control chart over the per-type
    daily revenue series — the third classic of the anomaly-screen
    trio (B21 z-score flags level outliers, B61 CUSUM flags small
    persistent shifts; the EWMA chart is the standard middle ground:
    a geometrically-forgetting baseline that flags TODAY vs the
    recent past, Roberts 1959 / NIST e-handbook 6.3.2.4).

    Exactness: the classic chart is the recursion s_t = alpha*x_t +
    (1-alpha)*s_{t-1} on doubles — order-dependent and engine-unsafe.
    With dyadic alpha = 1/2 truncated at K = 16 observations the
    prediction-form baseline is the EXACT integer numerator
    num_t = sum_{i=1..16} x_(t-i) * 2^(16-i) over the exact weight
    sum 65535 (the truncated tail is 2^-16 ~ 15 ppm, STATED, not
    drifting): sixteen lag() terms. Flags are integer
    cross-multiplications — spike iff x*65535 > 2*num, dip iff
    2*x*65535 < num — and the deviation is floor-div basis points;
    no doubles anywhere. int64 bound, stated precisely: the widest
    product is deviation_bp's (cents*65535 - num) * 10^4, so the
    chart requires max daily cents <= 2^63 / (65535 * 10^4)
    ~= 1.4e13 (~$140B/day/type) — 10^4 beyond the num bound the
    flag terms need; past it Spark would wrap while DuckDB errors,
    so the bound is part of the operator's contract. Rows without the full 16-day
    history report NULL baseline and no flag (the chart's burn-in,
    stated) — row_number over the same sort, zero extra shuffles.

    Plan: one (type, day) rollup (map-side combined, the only
    data-proportional shuffle — the series is calendar-bounded after
    it), then ONE sort window per type partition carrying all 16
    O(1)/row lags + row_number; output |types| x |days| rows.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    for i in range(1, _EWMA_K + 1):
        term = F.coalesce(F.lag("cents", i).over(w), F.lit(0)) * F.lit(
            2 ** (_EWMA_K - i)
        )
        num = term if num is None else num + term
    out = daily.select(
        "event_type",
        "day",
        "cents",
        num.alias("num"),
        F.row_number().over(w).alias("rn"),
    )
    full = F.col("rn") > _EWMA_K
    return out.select(
        "event_type",
        "day",
        "cents",
        F.when(full, F.expr(f"num * 1000 div {_EWMA_WSUM}"))
        .alias("ewma_cents_milli"),
        F.when(
            full & (F.col("num") > 0),
            F.expr(f"(cents * {_EWMA_WSUM} - num) * 10000 div num"),
        ).alias("deviation_bp"),
        F.when(
            full, (F.col("cents") * _EWMA_WSUM > 2 * F.col("num")).cast("int")
        ).otherwise(F.lit(None).cast("int")).alias("spike_flag"),
        F.when(
            full, (2 * F.col("cents") * _EWMA_WSUM < F.col("num")).cast("int")
        ).otherwise(F.lit(None).cast("int")).alias("dip_flag"),
    ).orderBy("event_type", "day")


def _ewma_sql() -> str:
    terms = " + ".join(
        f"COALESCE(LAG(cents, {i}) OVER w, 0) * {2 ** (_EWMA_K - i)}"
        for i in range(1, _EWMA_K + 1)
    )
    return f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, cents,
         {terms} AS num,
         ROW_NUMBER() OVER w AS rn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day, CAST(cents AS BIGINT) AS cents,
       CASE WHEN rn > {_EWMA_K}
            THEN CAST(num * 1000 // {_EWMA_WSUM} AS BIGINT) END
         AS ewma_cents_milli,
       CASE WHEN rn > {_EWMA_K} AND num > 0
            THEN CAST((cents * {_EWMA_WSUM} - num) * 10000 // num AS BIGINT)
       END AS deviation_bp,
       CASE WHEN rn > {_EWMA_K}
            THEN CAST(CASE WHEN cents * {_EWMA_WSUM} > 2 * num
                           THEN 1 ELSE 0 END AS INT) END AS spike_flag,
       CASE WHEN rn > {_EWMA_K}
            THEN CAST(CASE WHEN 2 * cents * {_EWMA_WSUM} < num
                           THEN 1 ELSE 0 END AS INT) END AS dip_flag
FROM lagged
ORDER BY event_type, day
"""


EWMA_CONTROL_SQL = _ewma_sql()


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B133 (round-8 addition): Theil-Sen robust trend of the per-type
    daily revenue series — the median of all pairwise slopes (Theil
    1950 / Sen 1968), the robust complement to B20's OLS trend_slope:
    a single corrupted day moves OLS arbitrarily but moves the median
    slope not at all (29% breakdown point). The pair enumeration is
    the textbook O(days^2) — legitimate here and at ANY corpus size
    because the series is CALENDAR-bounded after the daily rollup
    (10^3-10^4 rows forever, the B123 argument); the data-proportional
    work is only the rollup itself.

    Exactness: slopes are rationals dy/dx whose exact median would
    need a cross-multiplication comparator no SQL ORDER BY states, so
    the op medians the STATED scaled-integer slope dy * 1000 div dx
    (milli-cents/day, truncating division in both engines) — a
    deterministic, engine-exact statement of the estimator at fixed
    resolution. Median = the B105 ceil-rank order statistic over
    (slope, day pair) — a unique total order, no interpolation. The
    OLS slope over the same series rides along (exact BIGINT
    sufficient statistics, doubles only in the final stated
    expression) so the readout shows robust-vs-classical side by
    side.

    Plan: one (type, day) rollup (the only feed-wide shuffle), a
    type-co-partitioned self-join of the bounded series (equi on
    type, day1 < day2), one per-type sort window for the ceil-rank
    median. Output |types| rows.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.expr("CAST(unix_micros(date_trunc('day', ts))"
                   " div 86400000000 AS BIGINT)").alias("d"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("cents").alias("c2")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            "d1",
            "d2",
            F.expr("(c2 - c1) * 1000 div (d2 - d1)").alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_pairs"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        F.col("n_pairs"),
        F.col("slope").alias("theil_sen_slope_milli"),
    )
    ols_stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("d") * F.col("cents")).alias("sxy"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
    )
    ols = ("((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))")
    return (
        med.join(
            ols_stats.select(
                "event_type",
                F.col("n").alias("n_days"),
                F.expr(f"CAST(floor(1000 * {ols}) AS BIGINT)").alias(
                    "ols_slope_milli"
                ),
            ),
            "event_type",
        )
        .select(
            "event_type", "n_days", "n_pairs",
            "theil_sen_slope_milli", "ols_slope_milli",
        )
        .orderBy("event_type")
    )


def _theil_sen_sql() -> str:
    ols = ("((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))")
    return f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
         SUM(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.d AS d1, b.d AS d2,
         (b.cents - a.cents) * 1000 // (b.d - a.d) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
),
med AS (
  SELECT event_type, n_pairs, slope AS theil_sen_slope_milli
  FROM ranked WHERE rn = (n_pairs + 1) // 2
),
ols AS (
  SELECT event_type, COUNT(*) AS n, SUM(d) AS sx, SUM(cents) AS sy,
         SUM(d * cents) AS sxy, SUM(d * d) AS sxx
  FROM daily GROUP BY event_type
)
SELECT m.event_type,
       CAST(o.n AS BIGINT) AS n_days,
       CAST(m.n_pairs AS BIGINT) AS n_pairs,
       CAST(m.theil_sen_slope_milli AS BIGINT) AS theil_sen_slope_milli,
       CAST(floor(1000 * {ols}) AS BIGINT) AS ols_slope_milli
FROM med m JOIN ols o ON o.event_type = m.event_type
ORDER BY m.event_type
"""


THEIL_SEN_SQL = _theil_sen_sql()


def wape_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B134 (round-8 addition): forecast backtest over the per-type
    daily revenue series — the evaluation loop a demand-planning
    stack runs BEFORE trusting any model: score the two standard
    baselines every real forecast must beat, naive (tomorrow =
    today) and seasonal-naive (tomorrow = same weekday last week,
    the M-competition yardstick), by WAPE and bias. A model that
    cannot beat seasonal-naive is noise — this op is the gate that
    says so.

    Exactness: all errors are exact integer cents (|actual -
    forecast|, signed bias); WAPE = sum|err| * 10000 div sum(actual)
    and bias likewise — floor division, no doubles anywhere. Scoring
    window: only days where the lag exists (burn-in excluded by the
    lag's NULL, stated); both methods score the SAME day set per
    type only when their burn-ins coincide — they don't (1 vs 7) —
    so each method row carries its own n_days_scored and the
    comparison column is WAPE, which normalizes per-method.

    Plan: one (type, day) rollup (map-side, the only feed-wide
    shuffle — the series is calendar-bounded after it), ONE sort
    window per type carrying both O(1)/row lags, a |types| x 2
    rollup. Output 2 rows per type.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cents",
        F.lag("cents", 1).over(w).alias("f_naive"),
        F.lag("cents", 7).over(w).alias("f_snaive"),
    )
    scored = None
    for method, col in (("naive", "f_naive"), ("seasonal_naive", "f_snaive")):
        part = lagged.filter(F.col(col).isNotNull()).select(
            "event_type",
            F.lit(method).alias("method"),
            "cents",
            (F.col("cents") - F.col(col)).alias("err"),
        )
        scored = part if scored is None else scored.unionByName(part)
    return (
        scored.groupBy("event_type", "method")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.sum(F.abs("err")).alias("sum_abs_err_cents"),
            F.sum("err").alias("bias_cents"),
            F.sum("cents").alias("actual_cents"),
        )
        .select(
            "event_type",
            "method",
            "n_days_scored",
            "sum_abs_err_cents",
            "bias_cents",
            "actual_cents",
            F.expr("sum_abs_err_cents * 10000 div actual_cents").alias(
                "wape_bp"
            ),
            F.expr("bias_cents * 10000 div actual_cents").alias("bias_bp"),
        )
        .orderBy("event_type", "method")
    )


WAPE_BACKTEST_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, cents,
         LAG(cents, 1) OVER w AS f_naive,
         LAG(cents, 7) OVER w AS f_snaive
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
scored AS (
  SELECT event_type, 'naive' AS method, cents, cents - f_naive AS err
  FROM lagged WHERE f_naive IS NOT NULL
  UNION ALL
  SELECT event_type, 'seasonal_naive' AS method, cents, cents - f_snaive
  FROM lagged WHERE f_snaive IS NOT NULL
)
SELECT event_type, method,
       CAST(COUNT(*) AS BIGINT) AS n_days_scored,
       CAST(SUM(ABS(err)) AS BIGINT) AS sum_abs_err_cents,
       CAST(SUM(err) AS BIGINT) AS bias_cents,
       CAST(SUM(cents) AS BIGINT) AS actual_cents,
       CAST(SUM(ABS(err)) * 10000 // SUM(cents) AS BIGINT) AS wape_bp,
       CAST(SUM(err) * 10000 // SUM(cents) AS BIGINT) AS bias_bp
FROM scored
GROUP BY event_type, method
ORDER BY event_type, method
"""


# B137: first-order Markov removal-effect attribution.
# Stated state indices: 0 = start, then the touch channels in sorted
# order (1 = click, 2 = error, 3 = signup, 4 = view); 5 = conversion
# (purchase), 6 = null (journey ends unconverted). Probabilities in
# integer ppb; _MK_ITERS fixed-point steps (geometric convergence —
# spectral radius < 1 for any chain with an exit path).
_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_ITERS = 60
_MK_SCALE = 1_000_000_000


def _mk_fold(drop: int | None) -> str:
    """SQL fold: fixed-point p-vector over the collapsed 5x7 count
    matrix `mm` with per-from totals `tt`; contributions into channel
    `drop` are redirected to null (the removal-effect chain)."""
    drop_clause = f" AND e.ti != {drop}" if drop is not None else ""
    chan = (
        f"aggregate(filter(mm, e -> e.fi = s AND e.ti <= 4{drop_clause}),"
        " CAST(0 AS BIGINT), (a, e) -> a + e.cnt * element_at(p, e.ti + 1))"
    )
    conv = (
        "aggregate(filter(mm, e -> e.fi = s AND e.ti = 5),"
        f" CAST(0 AS BIGINT), (a, e) -> a + e.cnt * CAST({_MK_SCALE} AS BIGINT))"
    )
    return (
        f"aggregate(sequence(1, {_MK_ITERS}),"
        " array_repeat(CAST(0 AS BIGINT), 5),"
        " (p, it) -> transform(sequence(0, 4), s ->"
        " CASE WHEN element_at(tt, s + 1) = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE ({chan} + {conv}) div element_at(tt, s + 1) END))"
    )


def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B137 (round-8 addition): Markov removal-effect attribution
    (Anderl et al. 2014) — the data-driven multi-touch model that
    replaced last-touch in every serious marketing stack, and the one
    B48's rule-based attribution_model explicitly is not: build the
    first-order journey chain (start -> touch channels -> purchase /
    null, journeys truncated at the FIRST purchase, stated), then for
    each channel ask what fraction of conversions DIES if the channel
    is removed (transitions into it redirected to null). Channel
    credit = its removal effect normalized over all channels — a
    causal-flavored answer no positional rule gives.

    Exactness: transition counts are exact BIGINTs; conversion
    probabilities are integer ppb via a {it}-step fixed-point fold
    p(s) = (sum cnt[s,t]*p(t) + cnt[s,conv]*SCALE) div total[s] —
    floor each step, geometric convergence, the SAME recurrence
    stated in both engines (Spark: ONE aggregate lambda over the
    collapsed 5x7 count matrix — the B129/B118 bounded-codebook
    idiom; DuckDB: a RECURSIVE CTE over iterations carrying the
    p-list). No doubles anywhere.

    Plan: one user-partitioned sort window builds transitions
    (lag + first-purchase truncation + terminal-null rows — O(1)/row),
    one bounded (from, to) rollup (<= 35 cells at ANY corpus size),
    then five folds (full chain + one per removal) on the 1-row
    matrix. Output |channels| rows.
    """.format(it=_MK_ITERS)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "seq")
    wp = Window.partitionBy("user_id")
    seqd = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "fp",
            F.min(F.when(F.col("t") == "purchase", F.col("rn"))).over(wp),
        )
        .withColumn("mx", F.max("rn").over(wp))
        .filter(F.col("rn") <= F.coalesce("fp", "mx"))
        .withColumn("prev", F.coalesce(F.lag("t").over(w), F.lit("start")))
    )
    chan_idx = "CASE {c} WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END"
    steps = seqd.select(
        F.expr(
            "CASE WHEN prev = 'start' THEN 0 ELSE "
            + chan_idx.format(c="prev")
            + " END"
        ).alias("fi"),
        F.expr(
            "CASE WHEN t = 'purchase' THEN 5 ELSE "
            + chan_idx.format(c="t")
            + " END"
        ).alias("ti"),
    )
    terminal = seqd.filter(
        (F.col("rn") == F.col("mx")) & F.col("fp").isNull()
    ).select(
        F.expr(chan_idx.format(c="t")).alias("fi"),
        F.lit(6).alias("ti"),
    )
    counts = (
        steps.unionByName(terminal)
        .groupBy("fi", "ti")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    folded = counts.agg(
        F.expr(
            "collect_list(named_struct('fi', fi, 'ti', ti, 'cnt', cnt))"
        ).alias("mm")
    ).withColumn(
        "tt",
        F.expr(
            "transform(sequence(0, 4), s -> aggregate("
            "filter(mm, e -> e.fi = s), CAST(0 AS BIGINT),"
            " (a, e) -> a + e.cnt))"
        ),
    ).withColumn("p_full", F.expr(_mk_fold(None)))
    for c in range(1, 5):
        folded = folded.withColumn(f"p_rm{c}", F.expr(_mk_fold(c)))
    out_rows = ", ".join(
        f"named_struct('channel', '{name}', 'p_removed_ppb',"
        f" element_at(p_rm{i}, 1))"
        for i, name in enumerate(_MK_CHANNELS, start=1)
    )
    effects = folded.select(
        F.element_at("p_full", 1).alias("p_full_ppb"),
        F.explode(F.expr(f"array({out_rows})")).alias("r"),
    ).select(
        F.col("r.channel").alias("channel"),
        "p_full_ppb",
        F.col("r.p_removed_ppb").alias("p_removed_ppb"),
        (F.col("p_full_ppb") - F.col("r.p_removed_ppb")).alias(
            "removal_effect_ppb"
        ),
    )
    total = effects.agg(
        F.sum("removal_effect_ppb").alias("sum_eff")
    )
    return (
        effects.crossJoin(F.broadcast(total))
        .select(
            "channel",
            "p_full_ppb",
            "p_removed_ppb",
            "removal_effect_ppb",
            F.expr(
                "CASE WHEN sum_eff > 0 THEN removal_effect_ppb * 10000"
                " div sum_eff END"
            ).alias("attribution_bp"),
        )
        .orderBy("channel")
    )


def _mk_fold_sql(drop: int | None) -> str:
    drop_clause = f" AND e.ti != {drop}" if drop is not None else ""
    return f"""
  SELECT k + 1 AS k,
    list_transform(range(5), s ->
      CASE WHEN tt[s + 1] = 0 THEN CAST(0 AS BIGINT) ELSE
        (COALESCE(list_sum(list_transform(
            list_filter(mm, e -> e.fi = s AND e.ti <= 4{drop_clause}),
            e -> e.cnt * p[e.ti + 1])), 0)
         + COALESCE(list_sum(list_transform(
            list_filter(mm, e -> e.fi = s AND e.ti = 5),
            e -> e.cnt * CAST({_MK_SCALE} AS BIGINT))), 0)) // tt[s + 1]
      END) AS p"""


def _markov_attribution_sql() -> str:
    chan_idx = ("CASE {c} WHEN 'click' THEN 1 WHEN 'error' THEN 2"
                " WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END")
    variants = []
    for v, drop in (("full", None), ("rm1", 1), ("rm2", 2), ("rm3", 3),
                    ("rm4", 4)):
        variants.append(f"""
it_{v} AS (
  SELECT 0 AS k, [CAST(0 AS BIGINT), 0, 0, 0, 0] AS p FROM m
  UNION ALL
  {_mk_fold_sql(drop).strip()}
  FROM it_{v}, m, tot WHERE k < {_MK_ITERS}
),
p_{v} AS (SELECT p[1] AS p0 FROM it_{v} WHERE k = {_MK_ITERS})""")
    chans = ", ".join(
        f"({i}, '{name}')" for i, name in enumerate(_MK_CHANNELS, start=1)
    )
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS seq, event_type AS t
  FROM events
),
rnd AS (
  SELECT *, ROW_NUMBER() OVER w AS rn,
         COALESCE(LAG(t) OVER w, 'start') AS prev
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, seq)
),
seqd AS (
  SELECT *,
         MIN(CASE WHEN t = 'purchase' THEN rn END)
           OVER (PARTITION BY user_id) AS fp,
         MAX(rn) OVER (PARTITION BY user_id) AS mx
  FROM rnd
),
kept AS (SELECT * FROM seqd WHERE rn <= COALESCE(fp, mx)),
steps AS (
  SELECT CASE WHEN prev = 'start' THEN 0
              ELSE {chan_idx.format(c='prev')} END AS fi,
         CASE WHEN t = 'purchase' THEN 5
              ELSE {chan_idx.format(c='t')} END AS ti
  FROM kept
  UNION ALL
  SELECT {chan_idx.format(c='t')} AS fi, 6 AS ti
  FROM kept WHERE rn = mx AND fp IS NULL
),
counts AS (
  SELECT fi, ti, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM steps GROUP BY fi, ti
),
m AS (
  SELECT list(struct_pack(fi := fi, ti := ti, cnt := cnt)) AS mm
  FROM counts
),
tot AS (
  SELECT list_transform(range(5), s ->
      COALESCE(list_sum(list_transform(
        list_filter(mm, e -> e.fi = s), e -> e.cnt)), 0)) AS tt
  FROM m
),{",".join(variants)},
chans(ci, channel) AS (VALUES {chans}),
eff AS (
  SELECT c.channel,
         CAST((SELECT p0 FROM p_full) AS BIGINT) AS p_full_ppb,
         CAST(CASE c.ci WHEN 1 THEN (SELECT p0 FROM p_rm1)
                        WHEN 2 THEN (SELECT p0 FROM p_rm2)
                        WHEN 3 THEN (SELECT p0 FROM p_rm3)
                        ELSE (SELECT p0 FROM p_rm4) END AS BIGINT)
           AS p_removed_ppb
  FROM chans c
)
SELECT channel, p_full_ppb, p_removed_ppb,
       CAST(p_full_ppb - p_removed_ppb AS BIGINT) AS removal_effect_ppb,
       CAST(CASE WHEN (SELECT SUM(p_full_ppb - p_removed_ppb) FROM eff) > 0
            THEN (p_full_ppb - p_removed_ppb) * 10000
                 // (SELECT SUM(p_full_ppb - p_removed_ppb) FROM eff)
            END AS BIGINT) AS attribution_bp
FROM eff
ORDER BY channel
"""


MARKOV_ATTRIBUTION_SQL = _markov_attribution_sql()


def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B138 (round-8 addition): maximum drawdown of the cumulative
    per-type daily revenue series — the risk metric (finance: the
    worst peak-to-trough loss; ops: the deepest cumulative shortfall
    vs the best day's running position) that no pointwise anomaly
    screen (B21/B61/B128) reports because it is a property of the
    RUNNING series: dd(t) = peak(t) - cum(t), where peak is the
    running maximum of the cumulative sum. Emits per type the peak
    day, the trough day realizing the maximum drawdown, its exact
    depth in cents and in bp of the peak, plus the recovery day (the
    first later day the series regains the old peak, NULL if never —
    the "underwater period" every drawdown report shows).

    Exactness: cents are exact BIGINTs; cum/peak are running frames
    over the per-type CALENDAR-BOUNDED daily rollup (the B123
    argument: the series stays 10^3-10^4 rows at any corpus size and
    is partitioned by type — the allowed running-frame class); the
    max-drawdown row is a ceil-rank-free argmax with the stated
    unique tiebreak (earliest trough); recovery via the SAME sorted
    partition re-scanned with one more running max from the trough
    side — three windows total, one sort shuffle. Floor-div bp.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    run = (
        daily.withColumn(
            "cum",
            F.sum("cents").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "peak",
            F.max("cum").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("dd", F.col("peak") - F.col("cum"))
    )
    # the trough realizing the max drawdown (earliest on ties), and
    # the peak day that preceded it (last day where cum == peak at or
    # before the trough)
    wt = Window.partitionBy("event_type").orderBy(
        F.desc("dd"), F.asc("day")
    )
    trough = run.withColumn("rn", F.row_number().over(wt)).filter(
        F.col("rn") == 1
    ).select(
        "event_type",
        F.col("day").alias("trough_day"),
        F.col("peak").alias("peak_cum_cents"),
        F.col("cum").alias("trough_cum_cents"),
        F.col("dd").alias("max_drawdown_cents"),
    )
    joined = run.join(trough, "event_type")
    peak_day = (
        joined.filter(
            (F.col("day") <= F.col("trough_day"))
            & (F.col("cum") == F.col("peak_cum_cents"))
        )
        .groupBy("event_type")
        .agg(F.max("day").alias("peak_day"))
    )
    recovery = (
        joined.filter(
            (F.col("day") > F.col("trough_day"))
            & (F.col("cum") >= F.col("peak_cum_cents"))
        )
        .groupBy("event_type")
        .agg(F.min("day").alias("recovery_day"))
    )
    return (
        trough.join(peak_day, "event_type", "left")
        .join(recovery, "event_type", "left")
        .select(
            "event_type",
            "peak_day",
            "trough_day",
            "recovery_day",
            "peak_cum_cents",
            "trough_cum_cents",
            "max_drawdown_cents",
            F.expr(
                "CASE WHEN peak_cum_cents > 0 THEN max_drawdown_cents"
                " * 10000 div peak_cum_cents END"
            ).alias("drawdown_bp"),
        )
        .orderBy("event_type")
    )


MAX_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
cums AS (
  SELECT event_type, day, cents,
         SUM(cents) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily
),
run AS (
  SELECT *, MAX(cum) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM cums
),
dded AS (SELECT *, peak - cum AS dd FROM run),
trough AS (
  SELECT * FROM (
    SELECT event_type, day AS trough_day, peak AS peak_cum_cents,
           cum AS trough_cum_cents, dd AS max_drawdown_cents,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY dd DESC, day ASC) AS rn
    FROM dded) t WHERE rn = 1
),
peak_day AS (
  SELECT d.event_type, MAX(d.day) AS peak_day
  FROM dded d JOIN trough t ON t.event_type = d.event_type
  WHERE d.day <= t.trough_day AND d.cum = t.peak_cum_cents
  GROUP BY d.event_type
),
recovery AS (
  SELECT d.event_type, MIN(d.day) AS recovery_day
  FROM dded d JOIN trough t ON t.event_type = d.event_type
  WHERE d.day > t.trough_day AND d.cum >= t.peak_cum_cents
  GROUP BY d.event_type
)
SELECT t.event_type, p.peak_day, t.trough_day, r.recovery_day,
       CAST(t.peak_cum_cents AS BIGINT) AS peak_cum_cents,
       CAST(t.trough_cum_cents AS BIGINT) AS trough_cum_cents,
       CAST(t.max_drawdown_cents AS BIGINT) AS max_drawdown_cents,
       CAST(CASE WHEN t.peak_cum_cents > 0
            THEN t.max_drawdown_cents * 10000 // t.peak_cum_cents END
            AS BIGINT) AS drawdown_bp
FROM trough t
LEFT JOIN peak_day p ON p.event_type = t.event_type
LEFT JOIN recovery r ON r.event_type = t.event_type
ORDER BY t.event_type
"""


# B139: Google-SRE multiwindow, multi-burn-rate alert policy
# (SRE Workbook ch.5): page when the error-budget burn exceeds the
# threshold in BOTH the long and the short window. SLO = 99% of
# events non-error; burn 1x = consuming exactly the budget.
_SLO_ERR_BUDGET_BP = 100  # 1% error budget
_SLO_POLICIES = (  # (name, long_h, short_h, burn_threshold_x)
    ("page_fast", 1, 1, 14),  # SRE-workbook 1h@14x (5m short folded: 1h)
    ("page_slow", 6, 1, 6),  # 6h@6x with 1h short window
    ("ticket", 24, 6, 3),  # 24h@3x with 6h short window
)


def slo_burn_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B139 (round-8 addition): SLO error-budget burn-rate alerting —
    the Google SRE Workbook multiwindow multi-burn-rate policy
    evaluated over the event feed's error share: burn rate = (error
    share) / (budget share); an alert fires for an hour when the
    burn exceeds the policy threshold in BOTH its long and short
    trailing windows (the two-window AND is what kills flappy
    alerts — a single-window policy pages on every blip). B128's
    EWMA flags revenue anomalies; this is the RELIABILITY pane: per
    policy the hours evaluated, hours in alert, the worst observed
    long-window burn (in centi-x), and the total error budget
    consumed over the feed in bp of budget.

    Exactness: hourly (errors, events) rollup; trailing-window sums
    are bounded ROWS frames over the calendar-bounded hourly spine
    (1/6/24 observations — O(1)/row, per-policy, never a growing
    frame); burn comparisons are integer cross-multiplications
    (err * 10000 * thr_den vs budget * events * thr_num form —
    here: err_long * 10000 > thr * {bp} * ev_long), and reported
    burns are floor-div centi-x. No doubles anywhere.

    Plan: one (hour) rollup of the feed (map-side) — the spine is
    calendar-bounded forever after — then per-policy lag frames on
    ONE sort of that spine and a |policies|-row rollup.
    """.format(bp=_SLO_ERR_BUDGET_BP)
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.count("*").alias("ev"),
            F.sum((F.col("event_type") == "error").cast("long")).alias(
                "err"
            ),
        )
    )
    w = Window.orderBy("h")
    out = None
    for name, long_h, short_h, thr in _SLO_POLICIES:
        wl = w.rowsBetween(-(long_h - 1), 0)
        ws = w.rowsBetween(-(short_h - 1), 0)
        scored = hourly.select(
            F.lit(name).alias("policy"),
            "h",
            F.sum("ev").over(wl).alias("ev_l"),
            F.sum("err").over(wl).alias("err_l"),
            F.sum("ev").over(ws).alias("ev_s"),
            F.sum("err").over(ws).alias("err_s"),
            F.count("*").over(wl).alias("n_l"),
        ).filter(F.col("n_l") == long_h)
        alerted = scored.select(
            "policy",
            "h",
            (
                (F.col("err_l") * 10000 > F.lit(thr * _SLO_ERR_BUDGET_BP)
                 * F.col("ev_l"))
                & (F.col("err_s") * 10000 > F.lit(thr * _SLO_ERR_BUDGET_BP)
                   * F.col("ev_s"))
            ).cast("long").alias("alert"),
            F.expr(
                f"err_l * 10000 * 100 div (ev_l * {_SLO_ERR_BUDGET_BP})"
            ).alias("burn_centi"),
        )
        agg = alerted.groupBy("policy").agg(
            F.count("*").alias("hours_evaluated"),
            F.sum("alert").alias("hours_in_alert"),
            F.max("burn_centi").alias("max_burn_centi"),
        )
        out = agg if out is None else out.unionByName(agg)
    totals = (
        hourly.agg(
            F.sum("ev").alias("tev"), F.sum("err").alias("terr")
        )
    )
    return (
        out.crossJoin(F.broadcast(totals))
        .select(
            "policy",
            "hours_evaluated",
            "hours_in_alert",
            "max_burn_centi",
            F.expr(
                f"terr * 10000 * 10000 div (tev * {_SLO_ERR_BUDGET_BP})"
            ).alias("budget_consumed_bp"),
        )
        .orderBy("policy")
    )


def _slo_sql() -> str:
    parts = []
    for name, long_h, short_h, thr in _SLO_POLICIES:
        parts.append(f"""
  SELECT '{name}' AS policy, h,
         SUM(ev) OVER (ORDER BY h ROWS BETWEEN {long_h - 1} PRECEDING
                       AND CURRENT ROW) AS ev_l,
         SUM(err) OVER (ORDER BY h ROWS BETWEEN {long_h - 1} PRECEDING
                        AND CURRENT ROW) AS err_l,
         SUM(ev) OVER (ORDER BY h ROWS BETWEEN {short_h - 1} PRECEDING
                       AND CURRENT ROW) AS ev_s,
         SUM(err) OVER (ORDER BY h ROWS BETWEEN {short_h - 1} PRECEDING
                        AND CURRENT ROW) AS err_s,
         COUNT(*) OVER (ORDER BY h ROWS BETWEEN {long_h - 1} PRECEDING
                        AND CURRENT ROW) AS n_l,
         {long_h} AS long_h,
         {thr} AS thr
  FROM hourly""")
    un = "\n  UNION ALL".join(parts)
    return f"""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         COUNT(*) AS ev,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
  FROM events GROUP BY 1
),
scored AS ({un}
),
alerted AS (
  SELECT policy, h,
         CASE WHEN err_l * 10000 > thr * {_SLO_ERR_BUDGET_BP} * ev_l
               AND err_s * 10000 > thr * {_SLO_ERR_BUDGET_BP} * ev_s
              THEN 1 ELSE 0 END AS alert,
         err_l * 10000 * 100 // (ev_l * {_SLO_ERR_BUDGET_BP}) AS burn_centi
  FROM scored s
  WHERE n_l = long_h
),
totals AS (SELECT SUM(ev) AS tev, SUM(err) AS terr FROM hourly)
SELECT a.policy,
       CAST(COUNT(*) AS BIGINT) AS hours_evaluated,
       CAST(SUM(a.alert) AS BIGINT) AS hours_in_alert,
       CAST(MAX(a.burn_centi) AS BIGINT) AS max_burn_centi,
       CAST((SELECT terr * 10000 * 10000 // (tev * {_SLO_ERR_BUDGET_BP})
             FROM totals) AS BIGINT) AS budget_consumed_bp
FROM alerted a
GROUP BY a.policy
ORDER BY a.policy
"""


SLO_BURN_SQL = _slo_sql()
