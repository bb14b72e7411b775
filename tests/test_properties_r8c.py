"""Round-8 closing-slice property tests: randomized inputs against
independent models for the Kaplan-Meier fold, the k-core peel, the MMR
greedy, and the chunked-snapshot merge — beyond the fixed sf corpora
the gated entries use."""

import datetime
import math
import random

import pytest


@pytest.mark.parametrize("seed", [5, 23, 77])
def test_survival_km_random_order_histories(spark, tmp_path, seed):
    """B129 on RANDOM per-customer order histories: the risk set must
    drain to exactly zero, survival must be non-increasing, and the
    whole table must match an independent python product-limit."""
    from greenplum_cdc_spark.operators.stats import (
        _KM_CENSOR_W,
        _KM_S0,
        survival_curve_km,
    )

    rng = random.Random(seed)
    rows, ok = [], 0
    for cust in range(1, 41):
        start = rng.randrange(0, 60)
        n_orders = rng.randrange(1, 6)
        months = sorted(
            rng.sample(range(start, min(start + 30, 84)),
                       min(n_orders, min(start + 30, 84) - start))
        ) or [start]
        for m in months:
            ok += 1
            rows.append(
                (ok, cust, "O", 10.0,
                 datetime.datetime(2018 + m // 12, m % 12 + 1, 1),
                 "1-URGENT")
            )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    span = {}
    for _, cust, _, _, d, _ in rows:
        m = d.year * 12 + d.month - 1
        lo, hi = span.get(cust, (m, m))
        span[cust] = (min(lo, m), max(hi, m))
    big_m = max(h for _, h in span.values())
    events = {}
    for m0, m1 in span.values():
        churn = m1 < big_m - _KM_CENSOR_W
        t = (m1 - m0) if churn else (big_m - m0)
        d, c = events.get(t, (0, 0))
        events[t] = (d + churn, c + (not churn))

    got = survival_curve_km(spark, str(tmp_path)).collect()
    assert [r["tenure_months"] for r in got] == sorted(events)
    n, s = len(span), _KM_S0
    prev_s = _KM_S0
    for row in got:
        d, c = events[row["tenure_months"]]
        assert row["n_at_risk"] == n
        assert (row["n_churned"], row["n_censored"]) == (d, c)
        s = s * (n - d) // n
        assert row["survival_ppm"] == s
        assert row["survival_ppm"] <= prev_s  # monotone non-increasing
        prev_s = row["survival_ppm"]
        n -= d + c
    assert n == 0


@pytest.mark.parametrize("seed", [11, 42])
def test_kcore_random_graphs_equal_python_peel(spark, tmp_path, seed):
    """C126 on RANDOM co-purchase graphs (each edge materialized as
    two shared orders): the fixpoint, both degree columns, and k all
    match an independent peel; every member's core degree >= k."""
    from greenplum_cdc_spark.plans.tpch import kcore_decomposition

    rng = random.Random(seed)
    nodes = list(range(1, 31))
    edges = set()
    while len(edges) < 50:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    rows, ok = [], 0
    for a, b in sorted(edges):
        for _ in range(2):  # support 2 -> passes the min-sup filter
            ok += 1
            rows.append((ok, a, 1, 1.0))
            rows.append((ok, b, 2, 1.0))
    spark.createDataFrame(
        [(o, p, ln, q, 100.0, 0.0, 0.0, "N", "O",
          datetime.datetime(2024, 1, 1)) for o, p, ln, q in rows],
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    degs = sorted(len(v) for v in adj.values())
    n = len(degs)
    k = max(2, degs[(n + 1) // 2 - 1] // 2)
    alive = set(adj)
    while True:
        nxt = {u for u in alive
               if sum(1 for v in adj[u] if v in alive) >= k}
        if nxt == alive:
            break
        alive = nxt

    got = {r["part_id"]: r
           for r in kcore_decomposition(spark, str(tmp_path)).collect()}
    assert set(got) == alive
    for u in alive:
        assert got[u]["k"] == k
        assert got[u]["initial_degree"] == len(adj[u])
        core_deg = sum(1 for v in adj[u] if v in alive)
        assert got[u]["core_degree"] == core_deg
        assert core_deg >= k


@pytest.mark.parametrize("seed", [7, 31])
def test_mmr_random_embeddings_equal_python_greedy(spark, tmp_path, seed):
    """C123 on RANDOM embeddings: the full selection sequence equals an
    independent integer greedy, and the greedy invariant (scores
    non-increasing) holds."""
    from greenplum_cdc_spark.operators.similarity import (
        _MMR_K,
        _MMR_POOL,
        _MMR_QUERIES,
        mmr_diverse_topk,
    )

    rng = random.Random(seed)
    dim = 16
    vecs = {}
    for vid in range(120):
        vecs[vid] = [rng.uniform(-1, 1) for _ in range(dim)]
    spark.createDataFrame(
        [(vid, [float(x) for x in v], 0) for vid, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    # python twin quantizes the FLOAT32 values the parquet stores
    import numpy as np

    q = {vid: [int(math.floor(float(np.float32(x)) * 1000)) for x in v]
         for vid, v in vecs.items()}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    got = mmr_diverse_topk(spark, str(tmp_path)).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(_MMR_QUERIES))
    for qid, rows in by_q.items():
        rel = {v: dot(q[qid], q[v]) for v in q if v != qid}
        pool = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_POOL]
        ms = {v: 0 for v in pool}
        picked = []
        for step in range(1, _MMR_K + 1):
            rem = [v for v in pool if v not in {p[0] for p in picked}]
            if not rem:
                break
            best = min(rem, key=lambda v: (-(7 * rel[v] - 3 * ms[v]), v))
            picked.append((best, 7 * rel[best] - 3 * ms[best]))
            for v in rem:
                if v != best:
                    ms[v] = max(ms[v], dot(q[v], q[best]))
        rows.sort(key=lambda r: r["rank"])
        assert [(r["vec_id"], r["mmr_score_x10"]) for r in rows] == picked
        scores = [r["mmr_score_x10"] for r in rows]
        assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("seed", [13, 59])
def test_chunked_snapshot_random_interleavings(spark, tmp_path, seed):
    """A52 on RANDOM feeds (random keys, ops, timestamps): the DBLog
    convergence theorem — chunk-image-then-tail == plain latest-wins
    — holds for any interleaving, and provenance is consistent with
    each key's winning seq vs its chunk watermark."""
    from greenplum_cdc_spark.plans.cdc_queries import (
        _CHUNK_KEYS,
        cdc_snapshot_chunked,
    )

    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for seq in range(1, 301):
        pk = rng.randrange(0, 35)
        et = rng.choice(["view", "click", "signup", "error"])
        rows.append(
            (seq, base + datetime.timedelta(seconds=seq), pk, et,
             float(rng.randrange(1, 500)), "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    latest = {}
    for seq, ts, pk, et, v, _ in rows:
        latest[pk] = (ts, seq, et, v)
    mx_seq = 300
    mx_chunk = max(pk // _CHUNK_KEYS for _, _, pk, _, _, _ in rows)
    live = {pk: t for pk, t in latest.items() if t[2] != "error"}
    got = {r["pk"]: r
           for r in cdc_snapshot_chunked(spark, str(tmp_path)).collect()}
    assert set(got) == set(live)
    for pk, (ts, seq, et, v) in live.items():
        row = got[pk]
        assert (row["last_ts"], row["last_seq"]) == (ts, seq)
        assert row["last_value"] == v
        wm = ((pk // _CHUNK_KEYS + 1) * mx_seq) // (mx_chunk + 1)
        assert row["watermark_seq"] == wm
        assert row["src"] == ("wal" if seq > wm else "chunk")
