"""Capture `.explain("formatted")` output for named queries() entries.

Usage: python tools/capture_plans.py <suffix> <query> [<query> ...]
Writes plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt (suffix =
before|after; plan dir defaults to r11).

Optimization-round evidence tool (guide §1.2/§7.2): the judge checks
plan-shape claims in OPTIMIZATION_r<N>.md against these committed files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from greenplum_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
