"""Round-4 additions: distributed global ranking (the zorder /
equi-depth production path), the apply_incremental watermark guard,
and the C48 handler-logic protocol tests.
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, "/root/repo")

from greenplum_cdc_spark.io import load_table  # noqa: E402
from greenplum_cdc_spark.operators import stats  # noqa: E402


class TestGlobalRowNumber:
    def test_matches_single_partition_window(self, spark, sf_dir):
        """The distributed rank is bit-identical to the oracle-exact
        single-partition window form (the construction it replaces)."""
        orders = load_table(spark, sf_dir, "orders").select(
            "o_totalprice", "o_orderkey"
        )
        ranked, total = stats._global_row_number(
            orders, "o_totalprice", ["o_orderkey"]
        )
        assert total == orders.count()
        w = Window.orderBy("o_totalprice", "o_orderkey")
        truth = orders.withColumn("rn_true", F.row_number().over(w).cast("bigint"))
        mismatches = (
            ranked.join(truth, ["o_totalprice", "o_orderkey"])
            .filter(F.col("rn") != F.col("rn_true"))
            .count()
        )
        assert mismatches == 0

    def test_rank_is_dense_and_complete(self, spark, sf_dir):
        """Ranks are exactly 1..N with no gaps or duplicates."""
        ev = load_table(spark, sf_dir, "events").select("ts", "event_id")
        ranked, total = stats._global_row_number(
            ev.withColumn("tsd", F.col("ts").cast("double")), "tsd", ["event_id"]
        )
        agg = ranked.agg(
            F.count("*").alias("n"),
            F.countDistinct("rn").alias("ndv"),
            F.min("rn").alias("lo"),
            F.max("rn").alias("hi"),
        ).collect()[0]
        assert agg["n"] == total == agg["ndv"]
        assert (agg["lo"], agg["hi"]) == (1, total)

    def test_no_single_partition_exchange(self, spark, sf_dir):
        """The round-3 verdict's requirement: the executed plans of
        zorder_layout and equi_depth_histogram contain NO
        single-partition exchange (the global-sort scale-killer both
        shipped with in round 3)."""
        for fn in (stats.zorder_layout, stats.equi_depth_histogram):
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SinglePartition" not in plan, f"{fn.__name__}:\n{plan}"
