"""Correctness at 10x scale: synthesize a full 10x table set from a
base sf_dir (big tables via tools/scale_probe.synthesize, dimension
tables copied verbatim) and run the complete Spark-vs-DuckDB oracle
gate over it.

Why this exists: the driver's gate runs at sf0.01 only. Two failure
classes hide from a single scale: (a) value-distribution-dependent
divergence (e.g. ROUND(double) at a shortest-repr .5 boundary — found
by the sf0.001 gate and fixed in q2/event_interarrival), and (b)
operators whose pruning/thresholds silently change answer shape as
data grows. Running the same 140-query gate at 1/10th and 10x the
driver's scale pins both.

Usage: python tools/gate_10x.py [base_sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = "/tmp/gate10x"
    if not os.path.isdir(out) or len(os.listdir(out)) < 10:
        import scale_probe

        from greenplum_cdc_spark.session import get_spark

        os.makedirs(out, exist_ok=True)
        spark = get_spark("synth10x")
        scale_probe.synthesize(spark, base, out)
        for t in ("region", "nation", "supplier"):
            shutil.copy(os.path.join(base, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))
        spark.stop()
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "check_correctness.py"), out]
    cmd += sys.argv[2:]
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
