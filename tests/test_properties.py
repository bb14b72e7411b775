"""Property-based tests (hypothesis) for the invariants the CDC apply
path depends on: order-insensitivity, idempotence of the dialect
translation, and replay safety (SURVEY §5.3)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from greenplum_cdc_spark.functions.ddl import add_schema_name, translate_sql
from greenplum_cdc_spark.operators.cdc import snapshot_latest

_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_TYPES = st.sampled_from(
    ["BIGINT", "INT", "DOUBLE", "DATETIME", "LONGBLOB", "LONGTEXT", "TINYINT(1)", "TEXT"]
)


@given(
    table=_IDENT,
    cols=st.lists(st.tuples(_IDENT, _TYPES), min_size=1, max_size=5),
    backticks=st.booleans(),
    engine=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_translate_sql_is_idempotent_and_clean(table, cols, backticks, engine):
    q = "`" if backticks else ""
    col_sql = ", ".join(f"{q}{c}{q} {t}" for c, t in cols)
    sql = f"CREATE TABLE {q}{table}{q} ({col_sql})"
    if engine:
        sql += " ENGINE=InnoDB"
    out = translate_sql(sql)
    # translation is idempotent and never leaves MySQL-isms behind
    assert translate_sql(out) == out
    assert "`" not in out and "ENGINE" not in out
    for mysql_t in ("DATETIME", "LONGBLOB", "LONGTEXT", "TINYINT(1)"):
        assert mysql_t not in out


@given(schema=_IDENT, table=_IDENT)
@settings(max_examples=100, deadline=None)
def test_add_schema_name_qualifies_exactly_once(schema, table):
    sql = f"CREATE TABLE {table} (id BIGINT)"
    out = add_schema_name(schema, sql)
    assert out.startswith(f"CREATE TABLE {schema}.{table}")
    # re-qualifying with the same schema must not double-qualify the
    # table part (the reference applies it once per event; ours must be
    # safe under replay of an already-translated statement)
    assert add_schema_name(schema, out).count(f"{schema}.{schema}.") == 0


@st.composite
def _cdc_feed(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for seq in range(n):
        pk = draw(st.integers(min_value=0, max_value=4))
        ts_off = draw(st.integers(min_value=0, max_value=9))
        op = draw(st.sampled_from(["insert", "insert", "insert", "delete"]))
        rows.append((pk, ts_off, seq, op))
    return rows


@given(feed=_cdc_feed(), seed=st.integers(min_value=0, max_value=2**16))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_is_input_order_invariant(spark, feed, seed):
    """Shuffling the arrival order of a CDC batch never changes the
    snapshot — the latest-wins window depends only on (ts, seq)."""

    def to_df(rows):
        return spark.createDataFrame(
            [
                (pk, f"2024-01-01 00:00:0{t}", seq, op, float(seq), "t")
                for pk, t, seq, op in rows
            ],
            "pk long, ts string, seq long, op string, value double, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    shuffled = feed[:]
    random.Random(seed).shuffle(shuffled)
    a = sorted(snapshot_latest(to_df(feed)).select("pk", "seq").collect())
    b = sorted(snapshot_latest(to_df(shuffled)).select("pk", "seq").collect())
    assert a == b


@given(feed=_cdc_feed())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_never_surfaces_deleted_latest(spark, feed):
    """A pk whose max-(ts,seq) event is a delete must be absent."""
    df = spark.createDataFrame(
        [
            (pk, f"2024-01-01 00:00:0{t}", seq, op, float(seq), "t")
            for pk, t, seq, op in feed
        ],
        "pk long, ts string, seq long, op string, value double, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    snap = {r["pk"] for r in snapshot_latest(df).collect()}
    last_op = {}
    for pk, t, seq, op in sorted(feed, key=lambda r: (r[0], r[1], r[2])):
        last_op[pk] = op
    for pk, op in last_op.items():
        assert (pk in snap) == (op != "delete")


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_round3_ops_partition_count_invariant(spark):
    """The distributed-correctness property: results must not depend on
    how the data is partitioned. Run each round-3 aggregate under 1, 3
    and 13 shuffle partitions and require identical row sets."""
    from greenplum_cdc_spark.io import shuffle_partitions
    from greenplum_cdc_spark.operators import similarity, sketches, timeseries
    from greenplum_cdc_spark.plans import cdc_queries

    sf = "/root/testdata/sf0.001"
    ops = [
        cdc_queries.cdc_snapshot_diff,
        cdc_queries.cdc_incremental_view,
        timeseries.skew_diagnostics,
        sketches.bloom_filter_probe,
        similarity.kmeans_embeddings,
    ]
    for op in ops:
        results = []
        for n in (1, 3, 13):
            with shuffle_partitions(spark, n):
                results.append(_collect_sorted(op(spark, sf)))
        assert results[0] == results[1] == results[2], op.__name__


def test_debounce_replay_stable(spark):
    """Debounce verdicts are a pure function of the event set — two
    independent evaluations (fresh plans) must agree row-for-row."""
    from greenplum_cdc_spark.operators import timeseries

    sf = "/root/testdata/sf0.001"
    a = _collect_sorted(timeseries.event_debounce(spark, sf))
    b = _collect_sorted(timeseries.event_debounce(spark, sf))
    assert a == b


@given(n=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_sqrt_cell_count_matches_duckdb(n):
    """semantic_dedup derives its cell count as max(8, floor(sqrt(N)))
    INDEPENDENTLY on each engine — Python math here, SQL there. The two
    IEEE sqrt chains must agree for every corpus size or the cells (and
    the whole dedup output) silently diverge."""
    import math

    import duckdb

    py = max(8, int(math.floor(math.sqrt(float(n)))))
    sql = duckdb.sql(
        f"SELECT GREATEST(8, CAST(FLOOR(SQRT(CAST({n} AS BIGINT))) AS BIGINT))"
    ).fetchone()[0]
    assert py == sql


@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=400),
    n_parts=st.integers(min_value=1, max_value=8),
    pct=st.sampled_from([100, 50, 10]),
)
@settings(max_examples=200, deadline=None)
def test_local_topk_prune_is_superset(vals, n_parts, pct):
    """The two-phase top-K argument (top_percent_per_group /
    quantile_normalize): pruning each partition to its local top-K
    keeps a superset of the global top-K, for ANY partition assignment.
    Simulated exactly in Python over random data and random splits."""
    k = (len(vals) + pct - 1) // pct
    order = sorted(range(len(vals)), key=lambda i: (-vals[i], i))
    global_top = set(order[:k])
    rng = random.Random(42)
    parts: dict[int, list[int]] = {}
    for i in range(len(vals)):
        parts.setdefault(rng.randrange(n_parts), []).append(i)
    survivors = set()
    for rows in parts.values():
        rows.sort(key=lambda i: (-vals[i], i))
        survivors.update(rows[:k])
    assert global_top <= survivors


@given(
    toks=st.lists(st.integers(min_value=1, max_value=600), min_size=1, max_size=300),
    budget=st.sampled_from([128, 512]),
)
@settings(max_examples=200, deadline=None)
def test_pack_sequences_binning_invariants(toks, budget):
    """pack_sequences' closed-form bin assignment over the cumulative
    sum: bins are contiguous, tile the token mass, and every bin except
    the last crosses its budget boundary by at most one document."""
    order = sorted(range(len(toks)), key=lambda i: (-toks[i], i))
    cum = 0
    bins: dict[int, int] = {}
    for i in order:
        cum += toks[i]
        b = (cum - 1) // budget
        bins[b] = bins.get(b, 0) + toks[i]
    ids = sorted(bins)
    assert ids[-1] == (sum(toks) - 1) // budget
    # bins tile the mass exactly
    assert sum(bins.values()) == sum(toks)
    # a bin's tokens never exceed budget + one doc's length
    assert all(v <= budget + max(toks) for v in bins.values())
