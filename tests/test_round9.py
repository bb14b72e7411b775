"""Round-9 operator tests: exact python re-derivations for the six
new SURVEY entries (A55 before-image audit, B141 assortativity, B142
repeat-purchase cadence, C128 char entropy, C129 OOV rate, C130 kNN
mutuality) plus crafted-corpus semantics pins."""

import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def test_degree_assortativity_rederived(spark):
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.plans.tpch import (
        _KCORE_MIN_SUP,
        degree_assortativity,
    )

    li = {
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    by_order = defaultdict(set)
    for o, p in li:
        by_order[o].add(p)
    sup = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                sup[(a, b)] += 1
    edges = []
    for (a, b), s in sup.items():
        if s >= _KCORE_MIN_SUP:
            edges += [(a, b), (b, a)]
    deg = Counter(src for src, _ in edges)
    n = len(edges)
    sx = sum(deg[s] for s, _ in edges)
    sp = sum(deg[s] * deg[d] for s, d in edges)
    sq = sum(deg[s] * deg[s] for s, _ in edges)
    r = round((n * sp - sx * sx) / (n * sq - sx * sx), 6)
    row = degree_assortativity(spark, SF).collect()[0]
    assert (
        row.n_edges_directed,
        row.sum_deg,
        row.sum_prod,
        row.sum_sq,
    ) == (n, sx, sp, sq)
    assert row.assortativity == r


def test_repeat_purchase_interval_rederived(spark):
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.plans.tpch import repeat_purchase_interval

    orders = (
        load_table(spark, SF, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    )
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, SF, "customer")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r.o_custkey].append((r.o_orderdate, r.o_orderkey))
    gaps = defaultdict(list)
    for c, ds in by_cust.items():
        ds.sort()
        for (d0, _), (d1, _) in zip(ds, ds[1:]):
            gaps[seg[c]].append((d1 - d0).days)
    want = {}
    for s, g in gaps.items():
        g.sort()
        n = len(g)

        def ceil_rank(mul_num, mul_den):
            # smallest value with cum * mul_den >= n * mul_num
            cum = 0
            for i, v in enumerate(sorted(g)):
                cum += 1
                if cum * mul_den >= n * mul_num:
                    return v
            raise AssertionError

        want[s] = (
            n,
            sum(g) * 1000 // n,
            ceil_rank(1, 2),
            ceil_rank(9, 10),
        )
    got = {
        r.c_mktsegment: (
            r.n_gaps,
            r.mean_gap_millidays,
            r.median_gap_days,
            r.p90_gap_days,
        )
        for r in repeat_purchase_interval(spark, SF).collect()
    }
    assert got == want


def test_char_entropy_rederived_and_flag(spark, tmp_path):
    from greenplum_cdc_spark.operators.text import (
        _ENTROPY_LOW_NATS,
        char_entropy_filter,
    )

    docs = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),        # H = 0: spam
        (2, "abcdefghijklmnopqrstuvwxyz012345"),        # H = ln 32: blob
        (3, "the quick brown fox jumps over the lazy dog"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r for r in char_entropy_filter(spark, str(tmp_path)).collect()
    }
    for i, t in docs:
        counts = Counter(t)
        n = len(t)
        s = sum(round(c * math.log(c), 6) for c in counts.values())
        h = round(math.log(n) - s / n, 4)
        r = got[i]
        assert r.n_chars == n and r.n_distinct_chars == len(counts)
        assert abs(r.entropy_nats - h) < 1e-9, (i, r.entropy_nats, h)
        assert r.low_entropy_flag == int(h < _ENTROPY_LOW_NATS)
    assert got[1].low_entropy_flag == 1      # constant char
    assert got[2].entropy_nats == round(math.log(32), 4)
    assert got[3].low_entropy_flag == 0      # natural text


def test_tokenizer_oov_rederived(spark):
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.operators.text import (
        _OOV_VOCAB_SIZE,
        tokenizer_oov_rate,
    )

    rows = load_table(spark, SF, "documents").select("lang", "text").collect()
    tf = Counter()
    per_lang = defaultdict(list)
    for r in rows:
        toks = [w for w in r.text.split(" ") if w]
        tf.update(toks)
        per_lang[r.lang].extend(toks)
    vocab = {
        w for w, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_OOV_VOCAB_SIZE
        ]
    }
    want = {}
    for lang, toks in per_lang.items():
        oov = sum(1 for w in toks if w not in vocab)
        want[lang] = (len(toks), oov, oov * 10000 // len(toks))
    got = {
        r.lang: (r.n_tokens, r.n_oov, r.oov_bp)
        for r in tokenizer_oov_rate(spark, SF).collect()
    }
    assert got == want


def test_cdc_before_image_audit_rederived(spark):
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.plans.cdc_queries import cdc_before_image_audit

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_pk = defaultdict(list)
    for r in ev:
        op = "delete" if r.event_type == "error" else "insert"
        by_pk[r.user_id].append((r.ts, r.event_id, op, r.value, r.event_type))
    agg = defaultdict(lambda: [0, 0, 0, 0])  # events, upd, cons, incons
    for pk, rows in by_pk.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        prev_op = prev_val = None
        for ts, seq, op, val, etype in rows:
            a = agg[etype]
            a[0] += 1
            if op != "delete" and prev_op is not None and prev_op != "delete":
                a[1] += 1
                old_claimed = prev_val + 0.01 if seq % 7 == 0 else prev_val
                if old_claimed == prev_val:
                    a[2] += 1
                else:
                    a[3] += 1
            prev_op, prev_val = op, val
    got = {
        r.event_type: (
            r.n_events, r.n_updates, r.n_consistent, r.n_inconsistent,
            r.inconsistent_bp,
        )
        for r in cdc_before_image_audit(spark, SF).collect()
    }
    want = {
        t: (a[0], a[1], a[2], a[3], (a[3] * 10000 // a[1]) if a[1] else 0)
        for t, a in agg.items()
    }
    assert got == want
    # the planted corruption is actually found somewhere
    assert sum(v[3] for v in want.values()) > 0


def test_knn_mutuality_rederived(spark):
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.operators.similarity import (
        _HUB_MAX_POP,
        _MUTUAL_KS,
        TOPK,
        knn_mutuality_audit,
    )

    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF, "embeddings").collect()
    }
    n = len(vecs)
    stride = (n + _HUB_MAX_POP - 1) // _HUB_MAX_POP
    pop = {i: v for i, v in vecs.items() if i % stride == 0}

    def cos(a, b):
        # left-assoc fold like the engine's _dot
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return num / (na * nb)

    topk = {}
    for q, qe in pop.items():
        scored = sorted(
            ((cos(qe, ve), -i) for i, ve in pop.items() if i != q),
            reverse=True,
        )
        topk[q] = [-mi for _, mi in scored[:TOPK]]
    want = {}
    for k in _MUTUAL_KS:
        edges = {(q, d) for q, ds in topk.items() for d in ds[:k]}
        mutual = sum(1 for (a, b) in edges if (b, a) in edges)
        want[k] = (len(edges), mutual, mutual * 10000 // len(edges))
    got = {
        r.k: (r.n_edges, r.n_mutual, r.mutual_bp)
        for r in knn_mutuality_audit(spark, SF).collect()
    }
    assert got == want


def test_kcore_empty_edge_set_returns_empty(spark, tmp_path):
    """ADVICE r8: when the support threshold leaves NO co-purchase
    edges (every pair occurs once), kcore must return the typed empty
    frame — not IndexError on the empty degree histogram — matching
    the oracle's empty unrolled-CTE result."""
    from greenplum_cdc_spark.plans.tpch import kcore_decomposition

    # 3 orders, disjoint part pairs -> every pair support 1 < MIN_SUP 2
    rows = [
        (1, 101), (1, 102),
        (2, 201), (2, 202),
        (3, 301), (3, 302),
    ]
    spark.createDataFrame(
        [(o, p, 1.0, 1) for o, p in rows],
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_linenumber int",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = kcore_decomposition(spark, str(tmp_path))
    assert out.columns == ["part_id", "initial_degree", "core_degree", "k"]
    assert out.count() == 0


def test_nrr_no_phantom_trailing_month(spark):
    """ADVICE r8: net_revenue_retention must not report a month past
    the feed's last observed order month (prev rows shifted to m+1
    used to fabricate an all-churned final row)."""
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.plans.tpch import net_revenue_retention
    import pyspark.sql.functions as F

    o = load_table(spark, SF, "orders")
    last = o.agg(
        F.max(
            F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
        ).alias("m")
    ).collect()[0].m
    rows = net_revenue_retention(spark, SF).collect()
    months = [r.year * 12 + r.month - 1 for r in rows]
    assert max(months) <= last
    # and every reported month is an OBSERVED order month
    observed = {
        r.m
        for r in o.select(
            F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").alias(
                "m"
            )
        ).distinct().collect()
    }
    assert set(months) <= observed


def test_semantic_dedup_two_level_rederived(spark):
    """C131: exact python replay of both assignment levels and the
    leaf-scoped drop policy, plus the stated recall bracket vs C58
    (finer leaves can only find a subset of the dup pairs)."""
    from greenplum_cdc_spark.io import load_table
    from greenplum_cdc_spark.operators.similarity import (
        _SD2_MIN_K,
        SEM_TAU,
        _icbrt,
        semantic_dedup,
        semantic_dedup_two_level,
    )

    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF, "embeddings").collect()
    }
    n = len(vecs)
    k = max(_SD2_MIN_K, _icbrt(n))
    assert k ** 3 >= n > (k - 1) ** 3 or k == _SD2_MIN_K

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    norm = {i: math.sqrt(dot(v, v)) for i, v in vecs.items()}
    seeds1 = {i: vecs[i] for i in vecs if i < k}
    c1 = {}
    for i, v in vecs.items():
        best = max(
            seeds1,
            key=lambda s: (dot(v, seeds1[s]) / (norm[i] * norm[s]), -s),
        )
        c1[i] = best
    # L2 seeds: first k members of each L1 cell by vec_id
    members = defaultdict(list)
    for i in sorted(vecs):
        members[c1[i]].append(i)
    leaf = {}
    for cell, ms in members.items():
        s2 = ms[:k]
        for i in ms:
            best = max(
                s2,
                key=lambda s: (
                    dot(vecs[i], vecs[s]) / (norm[i] * norm[s]),
                    -s,
                ),
            )
            leaf[i] = (cell, best)
    by_leaf = defaultdict(list)
    for i, lf in leaf.items():
        by_leaf[lf].append(i)
    want = {}
    total_dropped = 0
    for lf, ms in by_leaf.items():
        dropped = set()
        ms = sorted(ms)
        for ai, a in enumerate(ms):
            for b in ms[ai + 1:]:
                if dot(vecs[a], vecs[b]) / (norm[a] * norm[b]) >= SEM_TAU:
                    dropped.add(b)
        want[lf] = (len(ms), len(dropped), len(ms) - len(dropped))
        total_dropped += len(dropped)
    got = {
        (r.cell_l1, r.cell_l2): (r.n_vecs, r.n_dropped, r.n_kept)
        for r in semantic_dedup_two_level(spark, SF).collect()
    }
    assert got == want
    # recall bracket: finer leaves find at most what sqrt-cells find
    c58_dropped = sum(
        r.n_dropped for r in semantic_dedup(spark, SF).collect()
    )
    assert total_dropped <= c58_dropped
