"""Round-4 second batch: hierarchy rollup, decile lift, attribution,
theta sketch set ops, sampled NDV estimation."""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from greenplum_cdc_spark.io import load_table  # noqa: E402
from greenplum_cdc_spark.operators import sketches, stats, timeseries  # noqa: E402
from greenplum_cdc_spark.plans import tpch  # noqa: E402


class TestHierarchyRollup:
    def test_root_covers_everything(self, spark, sf_dir):
        """Node 0 is every customer's ancestor: its subtree totals must
        equal the whole-table totals."""
        out = tpch.hierarchy_rollup(spark, sf_dir)
        root = out.filter(F.col("node") == 0).collect()[0]
        orders = load_table(spark, sf_dir, "orders")
        truth = orders.agg(
            F.countDistinct("o_custkey").alias("nc"),
            F.count("*").alias("no"),
            F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).alias("rc"),
        ).collect()[0]
        assert root["n_customers"] == truth["nc"]
        assert root["n_orders"] == truth["no"]
        assert root["rev_cents"] == truth["rc"]

    def test_parent_contains_child(self, spark, sf_dir):
        """Every node's subtree totals are >= each of its children's
        (monotone containment up the tree)."""
        out = tpch.hierarchy_rollup(spark, sf_dir).select(
            "node", "n_orders", "rev_cents"
        )
        child = out.select(
            F.col("node").alias("c_node"),
            F.col("n_orders").alias("c_orders"),
            F.col("rev_cents").alias("c_rev"),
        ).filter(F.col("c_node") > 0)
        joined = child.join(
            out, F.col("node") == F.expr("c_node div 10"), "inner"
        )
        bad = joined.filter(
            (F.col("c_orders") > F.col("n_orders"))
            | (F.col("c_rev") > F.col("rev_cents"))
        ).count()
        assert bad == 0


class TestDecileLift:
    def test_partition_and_cumulative(self, spark, sf_dir):
        rows = stats.decile_lift_table(spark, sf_dir).collect()
        assert [r["decile"] for r in rows] == list(range(1, 11))
        n_cust = (
            load_table(spark, sf_dir, "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert sum(r["n_customers"] for r in rows) == n_cust
        # deciles are ranked by spend DESC: per-decile revenue never increases
        revs = [r["rev_cents"] for r in rows]
        assert revs == sorted(revs, reverse=True)
        # cumulative share is monotone and lands within floor-division
        # slack of 10000 bp
        cums = [r["cum_share_bp"] for r in rows]
        assert cums == sorted(cums)
        assert 10000 - 10 <= cums[-1] <= 10000


class TestAttribution:
    def test_total_purchases_conserved(self, spark, sf_dir):
        out = timeseries.attribution_model(spark, sf_dir).collect()
        total = sum(r["n_purchases"] for r in out)
        truth = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert total == truth
        channels = {r["touch_channel"] for r in out}
        assert channels <= {"view", "click", "none"}


class TestThetaSketch:
    def test_estimates_bracket_truth(self, spark, sf_dir):
        r = sketches.theta_sketch_setops(spark, sf_dir).collect()[0]
        # KMV k=64 has rsd ~ 1/sqrt(k-2) ~ 13%; allow 4 sigma
        for est, exact in [
            (r["est_a_x10k"], r["exact_a"]),
            (r["est_b_x10k"], r["exact_b"]),
            (r["est_union_x10k"], r["exact_union"]),
        ]:
            assert abs(est / 10000.0 - exact) <= 0.52 * exact
        # set algebra sanity on the exact side
        assert r["exact_union"] <= r["exact_a"] + r["exact_b"]
        assert (
            r["exact_inter"] == r["exact_a"] + r["exact_b"] - r["exact_union"]
        )

    def test_intersection_estimate_reasonable(self, spark, sf_dir):
        r = sketches.theta_sketch_setops(spark, sf_dir).collect()[0]
        if r["exact_inter"]:
            assert abs(r["est_inter_x10k"] / 10000.0 - r["exact_inter"]) <= (
                0.75 * r["exact_inter"]
            )


class TestNdvEstimate:
    def test_gee_formula_and_bounds(self, spark, sf_dir):
        r = sketches.ndv_estimate_sample(spark, sf_dir).collect()[0]
        assert r["gee_estimate"] == r["d_sample"] + 3 * r["f1_sample"]
        assert 0 < r["n_sampled"] < r["n_total"]
        assert r["d_sample"] <= r["exact_ndv"]
        assert (
            r["abs_err_bp"]
            == abs(r["gee_estimate"] - r["exact_ndv"]) * 10000 // r["exact_ndv"]
        )
