"""Round-11 pins (optimization round 2 of 2).

Each test pins a round-11 change: the cdc_out_of_order_audit
hash-stability fix (VERDICT r10 item 1) and the optimizations that
changed operator internals this round.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.types import DecimalType, StringType

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from greenplum_cdc_spark.session import get_spark

    return get_spark("test-round11")


def test_out_of_order_sum_is_hash_stable(spark):
    """A49 (VERDICT r10 item 1): the lateness sum keeps decimal-38
    exactness internally but DECLARES a digit string — wide decimals
    (precision > 18) do not survive either engine's pandas conversion
    with a common dtype, so the driver's pandas-based hash failed on
    representation while the values matched. The declared schema must
    contain no DECIMAL(p>18) column, and the string must round-trip to
    the exact integer the oracle computes."""
    from greenplum_cdc_spark.plans.cdc_queries import cdc_out_of_order_audit

    df = cdc_out_of_order_audit(spark, SF_DIR)
    wide = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18
    ]
    assert wide == [], f"hash-unstable wide decimals in output: {wide}"
    fld = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(fld["sum_lateness_us"], StringType)
    r = df.collect()[0]
    s = r["sum_lateness_us"]
    # plain digits, no sign/point/exponent — identical rendering in
    # Spark, DuckDB, and pandas on both sides
    assert s.isdigit()
    assert int(s) > 0


def test_ivf_cell_dists_np_matches_literal_folds(spark):
    """r11 optimization pin (VERDICT r10 item 3): `_ivf_cell_dists_np`
    — the numpy replacement for the probe ranking's `_cell_dists` fold
    columns — reproduces the fold formulation's exact int64 micro-unit
    distance for EVERY (vector, cell) pair."""
    import pyspark.sql.functions as F

    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.operators.similarity import (
        _cell_dists,
        _ivf_cell_dists_np,
        _ivf_train_cached,
    )

    vecs = load_table(spark, SF_DIR, "embeddings")
    by_cell = _ivf_train_cached(spark, SF_DIR)
    got = {
        (r["vec_id"], r["cell"]): r["dist2_u"]
        for r in _ivf_cell_dists_np(vecs, by_cell).collect()
    }
    rv_arr, cells_sorted, dist_cols = _cell_dists(by_cell)
    folded = vecs.withColumn("rv", rv_arr).select(
        "vec_id", *[d.alias(f"d_{c}") for c, d in zip(cells_sorted, dist_cols)]
    )
    want = {}
    for r in folded.collect():
        for c in cells_sorted:
            want[(r["vec_id"], c)] = r[f"d_{c}"]
    assert got == want


def test_ivf_own_cell_dist_np_matches_fold_map(spark):
    """r11 optimization pin: `_ivf_own_cell_dist_np` (embedding_outliers'
    own-label distance) equals the former create_map(fold columns)[label]
    lookup on every row."""
    import pyspark.sql.functions as F

    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.operators.similarity import (
        _cell_dists,
        _ivf_own_cell_dist_np,
        _ivf_train_cached,
    )

    vecs = load_table(spark, SF_DIR, "embeddings")
    by_cell = _ivf_train_cached(spark, SF_DIR)
    got = {
        (r["vec_id"], r["label"]): r["dist2_u"]
        for r in _ivf_own_cell_dist_np(vecs, by_cell).collect()
    }
    rv_arr, cells_sorted, dist_cols = _cell_dists(by_cell)
    map_args = []
    for c, dist in zip(cells_sorted, dist_cols):
        map_args.extend([F.lit(c), dist])
    dist_own = F.create_map(*map_args)[F.col("label")]
    want = {
        (r["vec_id"], r["label"]): r["dist2_u"]
        for r in vecs.withColumn("rv", rv_arr)
        .select("vec_id", "label", dist_own.alias("dist2_u"))
        .collect()
    }
    assert got == want
