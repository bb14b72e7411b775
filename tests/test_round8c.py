"""Round-8 continuation session (part 3): new-operator semantics tests.

Each operator added in this session slice gets an exact python
re-derivation on the real sf0.001 corpus, plus crafted inputs where
the corpus cannot exercise a branch (degenerate variance, spike
flags, burn-in).
"""

from __future__ import annotations

import math

import pytest


class TestDiscountElasticity:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B126: slope/intercept/r2 match an IEEE-twin python OLS over
        exact integer sufficient statistics."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import discount_elasticity

        li = (
            load_table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_discount", "l_quantity")
            .collect()
        )
        part = {
            r["p_partkey"]: r["p_brand"]
            for r in load_table(spark, sf_dir, "part")
            .select("p_partkey", "p_brand")
            .collect()
        }
        stats = {}
        for r in li:
            brand = part[r["l_partkey"]]
            # DECIMAL(6,4) cast of the double then *10000: round the
            # double to 4 places half-up — for the discrete 0.00-0.10
            # grid this is exactly round(d * 10000).
            x = int(round(r["l_discount"] * 10000))
            y = int(math.floor(r["l_quantity"]))
            n, sx, sy, sxy, sxx, syy = stats.get(brand, (0, 0, 0, 0, 0, 0))
            stats[brand] = (
                n + 1, sx + x, sy + y, sxy + x * y, sxx + x * x, syy + y * y
            )
        got = {r["p_brand"]: r for r in discount_elasticity(spark, sf_dir).collect()}
        assert set(got) == set(stats)
        for brand, (n, sx, sy, sxy, sxx, syy) in stats.items():
            row = got[brand]
            assert row["n_lines"] == n
            assert row["mean_qty_ppm"] == sy * 1000000 // n
            assert row["mean_disc_bp_ppm"] == sx * 1000000 // n
            cov = float(n) * float(sxy) - float(sx) * float(sy)
            varx = float(n) * float(sxx) - float(sx) * float(sx)
            vary = float(n) * float(syy) - float(sy) * float(sy)
            if varx > 0:
                slope = cov / varx
                intercept = (float(sy) - slope * float(sx)) / float(n)
                assert row["slope_qty_per_bp_ppm"] == math.floor(1e6 * slope)
                assert row["intercept_qty_ppm"] == math.floor(1e6 * intercept)
            else:
                assert row["slope_qty_per_bp_ppm"] is None
            if varx > 0 and vary > 0:
                r2 = (cov * cov) / (varx * vary)
                assert row["r2_ppm"] == math.floor(1e6 * r2)
                assert 0 <= row["r2_ppm"] <= 1000000

    def test_degenerate_variance_reports_null(self, spark, tmp_path):
        """A brand discounted at exactly one depth has var(x)=0 and
        must report NULL slope/intercept/r2, not a crash or a 0."""
        import pyspark.sql.functions as F  # noqa: F401
        from greenplum_cdc_spark.plans.tpch import discount_elasticity

        li = spark.createDataFrame(
            [(1, 0.05, 10.0), (1, 0.05, 20.0), (2, 0.02, 5.0), (2, 0.08, 9.0)],
            "l_partkey long, l_discount double, l_quantity double",
        )
        part = spark.createDataFrame(
            [(1, "B#1"), (2, "B#2")], "p_partkey long, p_brand string"
        )
        li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        part.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
        rows = {r["p_brand"]: r for r in
                discount_elasticity(spark, str(tmp_path)).collect()}
        assert rows["B#1"]["slope_qty_per_bp_ppm"] is None
        assert rows["B#1"]["intercept_qty_ppm"] is None
        assert rows["B#1"]["r2_ppm"] is None
        # B#2: two points define the line exactly; r2 == 1
        assert rows["B#2"]["r2_ppm"] == 1000000
        # slope = (9-5)/(800-200) qty per bp
        assert rows["B#2"]["slope_qty_per_bp_ppm"] == math.floor(
            1e6 * (9 - 5) / (800 - 200)
        )


class TestSegmentOverlapMatrix:
    def test_exact_set_rederivation(self, spark, sf_dir):
        """B127: every pair row equals python set algebra over the
        (user, type) distinct sets."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import segment_overlap_matrix

        ev = (
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .distinct()
            .collect()
        )
        aud = {}
        for r in ev:
            aud.setdefault(r["event_type"], set()).add(r["user_id"])
        types = sorted(aud)
        got = {(r["type_a"], r["type_b"]): r
               for r in segment_overlap_matrix(spark, sf_dir).collect()}
        expected_pairs = {
            (a, b) for i, a in enumerate(types) for b in types[i + 1:]
            if aud[a] & aud[b]
        }
        assert set(got) == expected_pairs
        for (a, b), row in got.items():
            inter = len(aud[a] & aud[b])
            union = len(aud[a] | aud[b])
            assert row["n_a"] == len(aud[a])
            assert row["n_b"] == len(aud[b])
            assert row["n_both"] == inter
            assert row["jaccard_bp"] == inter * 10000 // union
            assert row["containment_a_bp"] == inter * 10000 // len(aud[a])
            assert row["containment_b_bp"] == inter * 10000 // len(aud[b])

    def test_disjoint_pair_absent(self, spark, tmp_path):
        """Pairs with an empty intersection produce NO row (the join
        is the intersection); jaccard of a full overlap reads 10000."""
        from greenplum_cdc_spark.operators.stats import segment_overlap_matrix

        ev = spark.createDataFrame(
            [(1, 1, "a"), (2, 1, "b"), (3, 2, "a"), (4, 3, "c")],
            "event_id long, user_id long, event_type string",
        ).selectExpr(
            "event_id", "timestamp'2024-01-01' as ts", "user_id",
            "event_type", "cast(1.0 as double) as value",
            "'{}' as props",
        )
        ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        got = {(r["type_a"], r["type_b"]): r
               for r in segment_overlap_matrix(spark, str(tmp_path)).collect()}
        assert set(got) == {("a", "b")}  # a∩c and b∩c are empty
        assert got[("a", "b")]["jaccard_bp"] == 5000  # {1} over {1,2}


class TestEwmaControlChart:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B128: the 16-term dyadic numerator, deviation, and flags
        match a literal python replay of the daily series."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import (
            _EWMA_K,
            _EWMA_WSUM,
            ewma_control_chart,
        )
        import pyspark.sql.functions as F

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
            .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"))
            .collect()
        )
        series = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["day"], r["c"]))
        got = {(r["event_type"], r["day"]): r
               for r in ewma_control_chart(spark, sf_dir).collect()}
        n_flagged = 0
        for et, pts in series.items():
            pts.sort()
            for t, (day, cents) in enumerate(pts):
                row = got[(et, day)]
                assert row["cents"] == cents
                if t < _EWMA_K:  # burn-in: rn = t+1 <= K
                    assert row["ewma_cents_milli"] is None
                    assert row["spike_flag"] is None
                    continue
                num = sum(
                    pts[t - i][1] * 2 ** (_EWMA_K - i)
                    for i in range(1, _EWMA_K + 1)
                )
                def tdiv(a, b):  # Spark `div` / DuckDB `//`: truncate to zero
                    q = abs(a) // abs(b)
                    return q if (a >= 0) == (b >= 0) else -q

                assert row["ewma_cents_milli"] == num * 1000 // _EWMA_WSUM
                assert row["deviation_bp"] == (
                    tdiv((cents * _EWMA_WSUM - num) * 10000, num)
                    if num > 0 else None
                )
                assert row["spike_flag"] == int(cents * _EWMA_WSUM > 2 * num)
                assert row["dip_flag"] == int(2 * cents * _EWMA_WSUM < num)
                n_flagged += row["spike_flag"] + row["dip_flag"]
        assert got  # non-empty

    def test_crafted_spike_fires(self, spark, tmp_path):
        """A flat series with one 2.5x day flags exactly that day as a
        spike, and the next day does NOT dip (baseline rises to ~175,
        and 2*100 = 200 > 175; a 3x spike WOULD dip the next day
        because alpha = 1/2 puts half the weight on yesterday)."""
        import datetime

        from greenplum_cdc_spark.operators.timeseries import (
            _EWMA_K,
            ewma_control_chart,
        )

        base = datetime.datetime(2024, 1, 1)
        rows = []
        for d in range(2 * _EWMA_K):
            v = 250.0 if d == 24 else 100.0
            rows.append((d, base + datetime.timedelta(days=d), 7, "t", v, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        out = ewma_control_chart(spark, str(tmp_path)).collect()
        flagged = [r for r in out if r["spike_flag"] == 1]
        assert [r["day"].day for r in flagged] == [25]  # Jan 25 = day idx 24
        assert not [r for r in out if r["dip_flag"] == 1]


class TestReadabilityScore:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """C121: all counts and both scores match a literal python
        replay of the stated counting rules."""
        import re

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.quality import readability_score

        docs = load_table(spark, sf_dir, "documents").select(
            "source", "text"
        ).collect()
        agg = {}
        for r in docs:
            words = [w for w in r["text"].split(" ") if w]
            sents = max(1, len(re.findall(r"[.!?]+", r["text"])))
            syls = [max(1, len(re.findall(r"[aeiouy]+", w))) for w in words]
            d, wn, sn, yn, cn = agg.get(r["source"], (0, 0, 0, 0, 0))
            agg[r["source"]] = (
                d + 1, wn + len(words), sn + sents, yn + sum(syls),
                cn + sum(1 for s in syls if s >= 3),
            )
        got = {r["source"]: r
               for r in readability_score(spark, sf_dir).collect()}
        assert set(got) == set(agg)
        for src, (d, wn, sn, yn, cn) in agg.items():
            row = got[src]
            assert (row["n_docs"], row["n_words"], row["n_sentences"],
                    row["n_syllables"], row["n_complex"]) == (d, wn, sn, yn, cn)
            assert row["words_per_sentence_ppm"] == wn * 1000000 // sn
            assert row["syllables_per_word_ppm"] == yn * 1000000 // wn
            assert row["complex_bp"] == cn * 10000 // wn
            wps, spw, cwr = wn / sn, yn / wn, cn / wn
            assert row["flesch_x1000"] == math.floor(
                1000 * (206.835 - 1.015 * wps - 84.6 * spw)
            )
            assert row["fog_x1000"] == math.floor(
                1000 * 0.4 * (wps + 100 * cwr)
            )

    def test_crafted_sentences_and_syllables(self, spark, tmp_path):
        """The corpus has no sentence punctuation, so a crafted doc
        carries the [.!?]+ run semantics: '...' is ONE boundary run,
        vowel-less tokens floor at 1 syllable, 'beautiful' has 4
        vowel groups (eau-i-u + trailing? -> e,a,u,i,u runs: eau,i,u
        = 3) — pinned literally below."""
        from greenplum_cdc_spark.operators.quality import readability_score

        spark.createDataFrame(
            [(1, "beautiful xyz stop. twice!! and... done", "en", "s", 5)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        row = readability_score(spark, str(tmp_path)).collect()[0]
        # runs: '.', '!!', '...' -> 3 sentences
        assert row["n_sentences"] == 3
        assert row["n_words"] == 6
        # syllable groups: beautiful eau|i|u = 3, xyz -> y = 1,
        # stop = 1, twice = 2 (i, e), and = 1, done = 2 (o, e)
        assert row["n_syllables"] == 3 + 1 + 1 + 2 + 1 + 2
        assert row["n_complex"] == 1  # only 'beautiful'


class TestHeapsLawCurve:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """C122: every checkpoint row equals a python first-occurrence
        sweep in doc_id order."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.text import (
            _HEAPS_CHECKPOINTS,
            heaps_law_curve,
        )

        docs = sorted(
            (r["doc_id"], [w for w in r["text"].split(" ") if w])
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()
        )
        mn, mx = docs[0][0], docs[-1][0]
        got = {r["k"]: r for r in heaps_law_curve(spark, sf_dir).collect()}
        assert set(got) == set(range(1, _HEAPS_CHECKPOINTS + 1))
        for k in range(1, _HEAPS_CHECKPOINTS + 1):
            cp = mn - 1 + ((mx - mn + 1) * k) // _HEAPS_CHECKPOINTS
            seen = set()
            n_docs = n_toks = 0
            for did, toks in docs:
                if did <= cp:
                    n_docs += 1
                    n_toks += len(toks)
                    seen.update(toks)
            row = got[k]
            assert row["cp_doc_id"] == cp
            assert row["docs_cum"] == n_docs
            assert row["tokens_cum"] == n_toks
            assert row["vocab_cum"] == len(seen)
            assert row["ttr_ppm"] == len(seen) * 1000000 // n_toks
        # the curve is monotone and the last checkpoint covers all docs
        assert got[_HEAPS_CHECKPOINTS]["docs_cum"] == len(docs)
        for k in range(2, _HEAPS_CHECKPOINTS + 1):
            assert got[k]["vocab_cum"] >= got[k - 1]["vocab_cum"]


class TestSurvivalCurveKm:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B129: the full KM table (risk set, events, censors, floor
        product-limit) matches an independent python replay."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import (
            _KM_CENSOR_W,
            _KM_S0,
            survival_curve_km,
        )

        orders = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderdate"
        ).collect()
        span = {}
        for r in orders:
            m = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
            lo, hi = span.get(r["o_custkey"], (m, m))
            span[r["o_custkey"]] = (min(lo, m), max(hi, m))
        big_m = max(h for _, h in span.values())
        events = {}
        for m0, m1 in span.values():
            churn = m1 < big_m - _KM_CENSOR_W
            t = (m1 - m0) if churn else (big_m - m0)
            d, c = events.get(t, (0, 0))
            events[t] = (d + churn, c + (not churn))
        got = survival_curve_km(spark, sf_dir).collect()
        assert [r["tenure_months"] for r in got] == sorted(events)
        n, s = len(span), _KM_S0
        for row in got:
            d, c = events[row["tenure_months"]]
            assert row["n_at_risk"] == n
            assert (row["n_churned"], row["n_censored"]) == (d, c)
            s = s * (n - d) // n
            assert row["survival_ppm"] == s
            n -= d + c
        assert n == 0  # every customer leaves the risk set exactly once

    def test_crafted_censoring_semantics(self, spark, tmp_path):
        """A customer active near the feed end is censored (leaves the
        risk set without a death), and survival only drops on churn
        months."""
        import datetime

        from greenplum_cdc_spark.operators.stats import survival_curve_km

        def o(key, cust, y, m):
            return (key, cust, "O", 10.0,
                    datetime.datetime(y, m, 1), "1-URGENT")

        rows = [
            # cust 1: one order long ago -> churned at tenure 0
            o(1, 1, 2020, 1),
            # cust 2: 2020-01 .. 2020-06 -> churned at tenure 5
            o(2, 2, 2020, 1), o(3, 2, 2020, 6),
            # cust 3: active at the end -> censored at big_m - m0
            o(4, 3, 2020, 1), o(5, 3, 2021, 12),
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        got = {r["tenure_months"]: r
               for r in survival_curve_km(spark, str(tmp_path)).collect()}
        # big_m = 2021-12; censor window 6 months
        assert got[0]["n_churned"] == 1 and got[0]["n_at_risk"] == 3
        assert got[0]["survival_ppm"] == 1_000_000 * 2 // 3
        assert got[5]["n_churned"] == 1 and got[5]["n_at_risk"] == 2
        # floor(666666 * 1/2) after the tenure-5 churn
        assert got[5]["survival_ppm"] == got[0]["survival_ppm"] * 1 // 2
        assert got[23]["n_censored"] == 1 and got[23]["n_churned"] == 0
        # censoring does not move the estimate
        assert got[23]["survival_ppm"] == got[5]["survival_ppm"]


class TestDebeziumSource:
    def _mk(self, spark, lines):
        return spark.createDataFrame([(ln,) for ln in lines], "line string")

    def test_parse_envelope_branches(self, spark):
        """A50: all four op letters parse; images route per spec
        (delete -> before into data, update -> both, create/read ->
        after); source metadata lands typed."""
        from greenplum_cdc_spark.sources.debezium import parse_debezium

        lines = [
            '{"before": null, "after": {"user_id": 7, "value": 1.5,'
            ' "event_type": "view"}, "source": {"version": "2.5",'
            ' "connector": "postgresql", "name": "app", "ts_ms": 1700000000123,'
            ' "db": "appdb", "schema": "public", "table": "events",'
            ' "lsn": 11, "txId": 3}, "op": "c", "ts_ms": 1700000000123}',
            '{"before": {"user_id": 7, "value": 0.5, "event_type": "view"},'
            ' "after": {"user_id": 7, "value": 1.5, "event_type": "view"},'
            ' "source": {"version": "2.5", "connector": "postgresql",'
            ' "name": "app", "ts_ms": 1700000001000, "db": "appdb",'
            ' "schema": "public", "table": "events", "lsn": 12, "txId": 3},'
            ' "op": "u", "ts_ms": 1700000001000}',
            '{"before": {"user_id": 7, "value": 1.5, "event_type": "view"},'
            ' "after": null, "source": {"version": "2.5", "connector":'
            ' "postgresql", "name": "app", "ts_ms": 1700000002000,'
            ' "db": "appdb", "schema": "public", "table": "events",'
            ' "lsn": 13, "txId": 4}, "op": "d", "ts_ms": 1700000002000}',
            '{"before": null, "after": {"user_id": 9, "value": 2.0,'
            ' "event_type": "signup"}, "source": {"version": "2.5",'
            ' "connector": "postgresql", "name": "app", "ts_ms": 1700000003000,'
            ' "db": "appdb", "schema": "public", "table": "events",'
            ' "lsn": 14, "txId": 5}, "op": "r", "ts_ms": 1700000003000}',
            "not json at all",
        ]
        rows = {r["lsn"]: r
                for r in parse_debezium(self._mk(spark, lines)).collect()}
        assert rows[11]["op"] == "insert" and rows[11]["op_code"] == "c"
        assert rows[11]["data"]["user_id"] == "7"
        assert rows[11]["old"] is None
        assert rows[12]["op"] == "update"
        assert rows[12]["data"]["value"] == "1.5"
        assert rows[12]["old"]["value"] == "0.5"
        assert rows[13]["op"] == "delete"
        # delete: the row image survives in data (Maxwell convention)
        assert rows[13]["data"]["user_id"] == "7"
        assert rows[14]["op"] == "insert" and rows[14]["op_code"] == "r"
        assert rows[11]["xid"] == 3 and rows[13]["xid"] == 4
        assert rows[11]["ts"].isoformat().startswith("2023-11-1")
        # malformed line quarantines as NULL op
        bad = [r for r in rows.values() if r["op"] is None]
        assert len(bad) == 1 and bad[0]["event_json"] == "not json at all"

    def test_feed_roundtrip_counts(self, spark, sf_dir):
        """A50 gate row: op mix matches the stated synthesis rule and
        the typed payload round-trips exactly."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.cdc_queries import debezium_parse_events

        ev = load_table(spark, sf_dir, "events").collect()
        want = {}
        for r in ev:
            if r["event_type"] == "error":
                code = "d"
            elif r["event_type"] == "click":
                code = "u"
            elif r["event_id"] % 7 == 3:
                code = "r"
            else:
                code = "c"
            want[r["event_id"]] = (code, r["user_id"], r["value"])
        got = debezium_parse_events(spark, sf_dir).collect()
        assert len(got) == len(want)
        for r in got:
            code, uid, val = want[r["lsn"]]
            assert r["op_code"] == code
            assert r["user_id"] == uid
            assert r["value"] == val
            assert (r["old_value"] == val - 1.0) == (code == "u")
            assert r["xid"] == r["lsn"] // 25


class TestMmrDiverseTopk:
    def test_greedy_python_rederivation(self, spark, sf_dir):
        """C123: the selection sequence equals an independent python
        greedy over exact quantized-integer dot products."""
        import math as _math

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.similarity import (
            _MMR_K,
            _MMR_POOL,
            _MMR_QUERIES,
            mmr_diverse_topk,
        )

        vecs = {
            r["vec_id"]: [int(_math.floor(float(x) * 1000))
                          for x in r["embedding"]]
            for r in load_table(spark, sf_dir, "embeddings").collect()
        }

        def dot(a, b):
            return sum(x * y for x, y in zip(a, b))

        got = mmr_diverse_topk(spark, sf_dir).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == set(range(_MMR_QUERIES))
        for qid, rows in by_q.items():
            qq = vecs[qid]
            rel = {vid: dot(qq, v) for vid, v in vecs.items() if vid != qid}
            pool = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_POOL]
            ms = {v: 0 for v in pool}
            picked = []
            for step in range(1, _MMR_K + 1):
                remaining = [v for v in pool if v not in {p[0] for p in picked}]
                if not remaining:
                    break
                best = min(
                    remaining,
                    key=lambda v: (-(7 * rel[v] - 3 * ms[v]), v),
                )
                picked.append((best, rel[best], ms[best],
                               7 * rel[best] - 3 * ms[best]))
                for v in remaining:
                    if v != best:
                        ms[v] = max(ms[v], dot(vecs[v], vecs[best]))
            assert [(r["vec_id"], r["rel"], r["max_sim"], r["mmr_score_x10"])
                    for r in sorted(rows, key=lambda r: r["rank"])] == picked

    def test_diversity_property(self, spark, sf_dir):
        """MMR's point: the selected set is NOT the plain relevance
        top-k (on this corpus the pools contain near-dup directions),
        and every pick's max_sim is below its own relevance."""
        from greenplum_cdc_spark.operators.similarity import (
            _MMR_K,
            mmr_diverse_topk,
        )

        rows = mmr_diverse_topk(spark, sf_dir).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        diverged = 0
        for qid, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            assert len(rs) == _MMR_K
            rels = [r["rel"] for r in rs]
            # relevance order within the picked set is NOT monotone
            # unless MMR degenerated to plain top-k
            if rels != sorted(rels, reverse=True):
                diverged += 1
            # scores are non-increasing (greedy invariant)
            scores = [r["mmr_score_x10"] for r in rs]
            assert scores == sorted(scores, reverse=True)
        assert diverged > 0


class TestPriceIndexLaspeyres:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B131: both indexes match a python replay of the stated
        matched-model floor-unit-price rule."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import price_index_laspeyres

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
        ).collect()
        pm = {}
        for r in li:
            m = r["l_shipdate"].year * 12 + r["l_shipdate"].month - 1
            cents = int(math.floor(r["l_extendedprice"] * 100))
            qty = int(math.floor(r["l_quantity"]))
            c, q = pm.get((r["l_partkey"], m), (0, 0))
            pm[(r["l_partkey"], m)] = (c + cents, q + qty)
        up = {k: c // q for k, (c, q) in pm.items()}
        mb = min(m for _, m in pm)
        base = {p: (up[(p, m)], pm[(p, m)][1])
                for (p, m) in pm if m == mb}
        got = {(r["year"], r["month"]): r
               for r in price_index_laspeyres(spark, sf_dir).collect()}
        months = sorted({m for _, m in pm})
        for m in months:
            matched = [p for (p, mm) in pm if mm == m and p in base]
            if not matched:
                assert (m // 12, m % 12 + 1) not in got
                continue
            lx = sum(up[(p, m)] * base[p][1] for p in matched)
            lb = sum(base[p][0] * base[p][1] for p in matched)
            px = sum(up[(p, m)] * pm[(p, m)][1] for p in matched)
            pb = sum(base[p][0] * pm[(p, m)][1] for p in matched)
            row = got[(m // 12, m % 12 + 1)]
            assert row["parts_matched"] == len(matched)
            assert row["laspeyres_bp"] == lx * 10000 // lb
            assert row["paasche_bp"] == px * 10000 // pb
        # base month reads 10000 by construction
        assert got[(mb // 12, mb % 12 + 1)]["laspeyres_bp"] == 10000
        assert got[(mb // 12, mb % 12 + 1)]["paasche_bp"] == 10000


class TestTheilSenTrend:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B133: the ceil-rank median of scaled pair slopes and the
        OLS slope both match a python replay."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import theil_sen_trend

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy(
                "event_type",
                F.expr("CAST(unix_micros(date_trunc('day', ts))"
                       " div 86400000000 AS BIGINT)").alias("d"),
            )
            .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"))
            .collect()
        )
        series = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["d"], r["c"]))

        def tdiv(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        got = {r["event_type"]: r
               for r in theil_sen_trend(spark, sf_dir).collect()}
        for et, pts in series.items():
            pts.sort()
            slopes = []
            for i in range(len(pts)):
                for j in range(i + 1, len(pts)):
                    (d1, c1), (d2, c2) = pts[i], pts[j]
                    slopes.append((tdiv((c2 - c1) * 1000, d2 - d1), d1, d2))
            slopes.sort()
            n = len(slopes)
            med = slopes[(n + 1) // 2 - 1][0]
            row = got[et]
            assert row["n_days"] == len(pts)
            assert row["n_pairs"] == n
            assert row["theil_sen_slope_milli"] == med
            sx = sum(d for d, _ in pts)
            sy = sum(c for _, c in pts)
            sxy = sum(d * c for d, c in pts)
            sxx = sum(d * d for d, _ in pts)
            k = len(pts)
            ols = (float(k) * float(sxy) - float(sx) * float(sy)) / (
                float(k) * float(sxx) - float(sx) * float(sx)
            )
            assert row["ols_slope_milli"] == math.floor(1000 * ols)

    def test_robustness_property(self, spark, tmp_path):
        """One corrupted day swings OLS but leaves the Theil-Sen
        median unchanged — the estimator's reason to exist."""
        import datetime

        from greenplum_cdc_spark.operators.timeseries import theil_sen_trend

        base = datetime.datetime(2024, 1, 1)

        def mk(tag, corrupt):
            rows = []
            for d in range(21):
                v = 100.0 + 10.0 * d
                if corrupt and d == 20:
                    v = 1e6
                rows.append(
                    (d, base + datetime.timedelta(days=d), 1, tag, v, "{}")
                )
            return rows

        spark.createDataFrame(
            mk("clean", False) + mk("dirty", True),
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        got = {r["event_type"]: r
               for r in theil_sen_trend(spark, str(tmp_path)).collect()}
        # clean: exact 1000 cents/day -> 1,000,000 milli
        assert got["clean"]["theil_sen_slope_milli"] == 1000 * 1000
        assert got["dirty"]["theil_sen_slope_milli"] == 1000 * 1000
        assert abs(got["dirty"]["ols_slope_milli"]
                   - got["clean"]["ols_slope_milli"]) > 10 ** 6


class TestLateDataImpactAudit:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B132: every knob row matches a sequential python replay of
        the per-event watermark rule over the stated arrival order."""
        import hashlib

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.cdc_queries import (
            _LATE_ALLOWED_S,
            _LATE_WINDOW_US,
            _OOO_JITTER_MOD,
            late_data_impact_audit,
        )

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts"
        ).collect()
        rows = []
        for r in ev:
            seq = r["event_id"]
            h = hashlib.md5(f"ooo-v1|{seq}".encode()).hexdigest()  # noqa: F841
            h2 = hashlib.md5(f"late-v1|{seq}".encode()).hexdigest()
            jitter = int(h2[:15], 16) % _OOO_JITTER_MOD
            us = int(r["ts"].timestamp() * 1_000_000)
            # exact micros: datetime holds microsecond precision
            us = (int(r["ts"].replace(tzinfo=None).timestamp()) * 1_000_000
                  + r["ts"].microsecond) if False else us
            rows.append((seq + jitter, seq, us))
        rows.sort()
        expect = {w: [0, 0, set(), None] for w in _LATE_ALLOWED_S}
        wm = None
        for _, seq, us in rows:
            we = (us // _LATE_WINDOW_US + 1) * _LATE_WINDOW_US
            for w in _LATE_ALLOWED_S:
                expect[w][0] += 1
                if wm is not None and wm > we + w * 1_000_000:
                    expect[w][1] += 1
                    expect[w][2].add(we)
                    over = wm - we - w * 1_000_000
                    if expect[w][3] is None or over > expect[w][3]:
                        expect[w][3] = over
            wm = us if wm is None else max(wm, us)
        got = {r["allowed_lateness_s"]: r
               for r in late_data_impact_audit(spark, sf_dir).collect()}
        assert set(got) == set(_LATE_ALLOWED_S)
        for w, (n, nd, wins, worst) in expect.items():
            row = got[w]
            assert row["n_events"] == n
            assert row["n_dropped"] == nd
            assert row["dropped_bp"] == nd * 10000 // n
            assert row["n_windows_affected"] == len(wins)
            assert row["worst_overshoot_us"] == worst
        # monotone: a larger allowance never drops more
        ws = sorted(_LATE_ALLOWED_S)
        for a, b in zip(ws, ws[1:]):
            assert got[b]["n_dropped"] <= got[a]["n_dropped"]


class TestCdcSnapshotChunked:
    def test_dblog_consistency_theorem(self, spark, sf_dir):
        """A52: image-then-tail merge == plain latest-wins snapshot
        over the full feed (the DBLog convergence property), and the
        provenance column is exact."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.cdc_queries import (
            _CHUNK_KEYS,
            cdc_snapshot_chunked,
        )

        ev = load_table(spark, sf_dir, "events").collect()
        feed = sorted(
            (
                (r["ts"], r["event_id"], r["user_id"],
                 "delete" if r["event_type"] == "error" else "insert",
                 r["value"], r["event_type"])
            )
            for r in ev
        )
        mx_seq = max(seq for _, seq, *_ in feed)
        mx_chunk = max(pk // _CHUNK_KEYS for _, _, pk, *_ in feed)

        def wm(pk):
            return ((pk // _CHUNK_KEYS + 1) * mx_seq) // (mx_chunk + 1)

        latest = {}
        tails = {}
        for ts, seq, pk, op, value, et in feed:
            latest[pk] = (ts, seq, op, value, et)
            if seq > wm(pk):
                tails[pk] = tails.get(pk, 0) + 1
        got = {r["pk"]: r for r in cdc_snapshot_chunked(spark, sf_dir).collect()}
        live = {pk: v for pk, v in latest.items() if v[2] != "delete"}
        assert set(got) == set(live)
        for pk, (ts, seq, op, value, et) in live.items():
            row = got[pk]
            assert (row["last_ts"], row["last_seq"]) == (ts, seq)
            assert (row["last_value"], row["last_event_type"]) == (value, et)
            assert row["chunk"] == pk // _CHUNK_KEYS
            assert row["watermark_seq"] == wm(pk)
            assert row["n_tail_events"] == tails.get(pk, 0)
            assert row["src"] == (
                "wal" if seq > row["watermark_seq"] else "chunk"
            )
        # the simulation must actually exercise BOTH provenances
        srcs = {r["src"] for r in got.values()}
        assert srcs == {"chunk", "wal"}

    def test_crafted_stale_image_superseded(self, spark, tmp_path):
        """A key updated AFTER its chunk's select must surface the WAL
        value, and a key deleted after its select must be absent —
        the two hazards the watermark protocol exists for."""
        import datetime

        from greenplum_cdc_spark.plans.cdc_queries import cdc_snapshot_chunked

        base = datetime.datetime(2024, 1, 1)

        def e(seq, pk, et, v):
            return (seq, base + datetime.timedelta(seconds=seq), pk, et, v, "{}")

        rows = [
            # two chunks: mx_seq = 160, so chunk 0 selects at s_0 = 80
            # and chunk 1 at s_1 = 160 (the paced schedule)
            e(1, 3, "view", 1.0),      # chunk 0: in image
            e(150, 3, "view", 2.0),    # after s_0 = 80: supersedes
            e(2, 4, "view", 5.0),      # in image
            e(160, 4, "error", 0.0),   # deleted after select: absent
            e(3, 5, "view", 7.0),      # image only, survives untouched
            e(80, 15, "view", 9.0),    # chunk 1: within its late select
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        got = {r["pk"]: r
               for r in cdc_snapshot_chunked(spark, str(tmp_path)).collect()}
        assert set(got) == {3, 5, 15}
        assert got[3]["last_value"] == 2.0 and got[3]["src"] == "wal"
        assert got[5]["last_value"] == 7.0 and got[5]["src"] == "chunk"
        assert got[15]["last_value"] == 9.0 and got[15]["src"] == "chunk"


class TestStreamDebeziumPipeline:
    def test_multibatch_merge_equals_closed_form(self, spark, sf_dir):
        """A53: the drained streaming replica equals the closed-form
        latest-wins snapshot (A51's truth) — through real micro-batches
        and the versioned store."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.streaming.pipeline import (
            stream_debezium_pipeline,
        )

        ev = load_table(spark, sf_dir, "events").collect()
        latest = {}
        for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
            op = "delete" if r["event_type"] == "error" else (
                "update" if r["event_type"] == "click" else "insert")
            latest[r["user_id"]] = (op, r["value"], r["event_type"],
                                    r["event_id"])
        live = {k: v for k, v in latest.items() if v[0] != "delete"}
        got = {r["pk"]: r
               for r in stream_debezium_pipeline(spark, sf_dir).collect()}
        assert set(got) == set(live)
        for pk, (op, value, et, lsn) in live.items():
            assert got[pk]["last_value"] == value
            assert got[pk]["last_event_type"] == et
            assert got[pk]["last_lsn"] == lsn


class TestTextWidthAudit:
    def test_ascii_corpus_degenerate(self, spark, sf_dir):
        """C124: the sf corpus is ASCII — all three widths coincide
        and the ratios read exactly 1e6 (the audit PROVES the corpus
        property instead of assuming it)."""
        from greenplum_cdc_spark.operators.quality import text_width_audit

        rows = text_width_audit(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["utf8_bytes"] == r["codepoints"] == r["utf16_units"]
            assert r["astral_codepoints"] == 0
            assert r["combining_marks"] == 0
            assert r["bytes_per_cp_ppm"] == 1000000
            assert r["utf16_per_cp_ppm"] == 1000000

    def test_crafted_multibyte_semantics(self, spark, tmp_path):
        """Emoji cost 4 bytes / 2 UTF-16 units, combining marks are
        counted, and the stated utf16 = codepoints + astral identity
        holds — pinned against python's own encoders."""
        from greenplum_cdc_spark.operators.quality import text_width_audit

        texts = ["añ\U0001F600x\U0001F680", "éclair", "plain"]
        spark.createDataFrame(
            [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        r = text_width_audit(spark, str(tmp_path)).collect()[0]
        assert r["utf8_bytes"] == sum(len(t.encode("utf-8")) for t in texts)
        assert r["codepoints"] == sum(len(t) for t in texts)
        assert r["utf16_units"] == sum(
            len(t.encode("utf-16-le")) // 2 for t in texts
        )
        assert r["astral_codepoints"] == 2
        assert r["combining_marks"] == 1


class TestWapeBacktest:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B134: both baselines' WAPE/bias match a python replay."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import wape_backtest

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
            .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"))
            .collect()
        )
        series = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["day"], r["c"]))
        got = {(r["event_type"], r["method"]): r
               for r in wape_backtest(spark, sf_dir).collect()}

        def tdiv(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        for et, pts in series.items():
            pts.sort()
            vals = [c for _, c in pts]
            for method, lag in (("naive", 1), ("seasonal_naive", 7)):
                errs = [
                    (vals[i] - vals[i - lag], vals[i])
                    for i in range(lag, len(vals))
                ]
                row = got[(et, method)]
                assert row["n_days_scored"] == len(errs)
                sae = sum(abs(e) for e, _ in errs)
                bias = sum(e for e, _ in errs)
                tot = sum(a for _, a in errs)
                assert row["sum_abs_err_cents"] == sae
                assert row["bias_cents"] == bias
                assert row["actual_cents"] == tot
                assert row["wape_bp"] == sae * 10000 // tot
                assert row["bias_bp"] == tdiv(bias * 10000, tot)


class TestNetRevenueRetention:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B135: every month row matches python set/sum algebra over
        per-(customer, month) revenue, and the NRR identity
        nrr = grr + expansion share holds exactly in bp numerators."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import net_revenue_retention

        om = {}
        for r in load_table(spark, sf_dir, "orders").collect():
            m = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
            cents = int(math.floor(r["o_totalprice"] * 100))
            om[(r["o_custkey"], m)] = om.get((r["o_custkey"], m), 0) + cents
        got = {(r["year"], r["month"]): r
               for r in net_revenue_retention(spark, sf_dir).collect()}
        months = sorted({m for _, m in om})
        for m in months:
            prior = {c: v for (c, mm), v in om.items() if mm == m}
            if not prior:
                continue
            key = ((m + 1) // 12, (m + 1) % 12 + 1)
            cur = {c: om.get((c, m + 1), 0) for c in prior}
            if key not in got:
                continue
            row = got[key]
            assert row["prior_customers"] == len(prior)
            assert row["retained_customers"] == sum(
                1 for c in prior if cur[c] > 0
            )
            pc = sum(prior.values())
            assert row["prior_cents"] == pc
            exp = sum(max(cur[c] - prior[c], 0) for c in prior)
            chn = sum(prior[c] for c in prior if cur[c] == 0)
            ctr = sum(prior[c] - cur[c] for c in prior
                      if 0 < cur[c] < prior[c])
            ret = sum(cur.values())
            assert row["expansion_cents"] == exp
            assert row["churned_cents"] == chn
            assert row["contraction_cents"] == ctr
            assert row["retained_rev_cents"] == ret
            assert row["nrr_bp"] == ret * 10000 // pc
            assert row["grr_bp"] == (pc - chn - ctr) * 10000 // pc
            # revenue conservation: retained = prior - churn - contraction
            # + expansion
            assert ret == pc - chn - ctr + exp


class TestShufflePartitionAdvisor:
    def test_exact_byte_accounting(self, spark, sf_dir):
        """B136: est_bytes matches a python replay of the stated
        per-column width table, and the ceil-division settings
        follow."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import (
            _SPA_BROADCAST,
            _SPA_TARGET,
            shuffle_partition_advisor,
        )

        got = {r["table_name"]: r
               for r in shuffle_partition_advisor(spark, sf_dir).collect()}
        assert set(got) == {
            "lineitem", "orders", "events", "documents", "embeddings"
        }
        docs = load_table(spark, sf_dir, "documents").collect()
        want_docs = sum(
            8 + len(r["text"].encode()) + 4 + len(r["lang"].encode()) + 4
            + len(r["source"].encode()) + 4 + 8
            for r in docs
        )
        row = got["documents"]
        assert row["rows"] == len(docs)
        assert row["est_bytes"] == want_docs
        parts = max(1, (want_docs + _SPA_TARGET - 1) // _SPA_TARGET)
        assert row["recommended_partitions"] == parts
        assert row["rows_per_partition"] == len(docs) // parts
        assert row["broadcast_ok"] == int(want_docs <= _SPA_BROADCAST)
        emb = load_table(spark, sf_dir, "embeddings").collect()
        want_emb = sum(8 + 4 * len(r["embedding"]) + 4 + 4 for r in emb)
        assert got["embeddings"]["est_bytes"] == want_emb


class TestCaseFoldCollisionAudit:
    def test_clean_corpus_zero(self, spark, sf_dir):
        """C125: the sf corpus is already normalized — no collisions
        (the audit proves the property)."""
        from greenplum_cdc_spark.operators.dedup import (
            case_fold_collision_audit,
        )

        assert case_fold_collision_audit(spark, sf_dir).collect() == []

    def test_crafted_fold_semantics(self, spark, tmp_path):
        """Case, punctuation runs, and whitespace fold together;
        exact raw duplicates do NOT count (they are C1's territory);
        the shortest (then lowest-id) doc is the kept canonical."""
        from greenplum_cdc_spark.operators.dedup import (
            case_fold_collision_audit,
        )

        docs = [
            (1, "Hello, World!", "en", "a"),
            (2, "hello world", "en", "a"),      # folds with 1 (canonical)
            (3, "HELLO -- WORLD", "en", "b"),   # folds with 1, 2
            (4, "same text", "en", "b"),
            (5, "same text", "en", "b"),        # exact dup: excluded
            (6, "unique here", "en", "b"),
        ]
        spark.createDataFrame(
            [(i, t, lg, src, len(t)) for i, t, lg, src in docs],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {r["source"]: r
               for r in case_fold_collision_audit(spark, str(tmp_path)).collect()}
        # group {1,2,3}: canonical = doc 2 (11 chars, shortest)
        assert got["a"]["docs_involved"] == 2
        assert got["a"]["docs_reclaimable"] == 1  # doc 1
        assert got["a"]["chars_reclaimable"] == 13
        assert got["b"]["docs_involved"] == 1  # doc 3 only
        assert got["b"]["docs_reclaimable"] == 1
        assert got["b"]["chars_reclaimable"] == 14


class TestMarkovAttribution:
    @staticmethod
    def _replay(journeys, iters=60, scale=10**9):
        """Independent python model: journeys are lists of channel
        indices ending implicitly in conv (True) or null (False)."""
        counts = {}
        for path, conv in journeys:
            prev = 0
            for c in path:
                counts[(prev, c)] = counts.get((prev, c), 0) + 1
                prev = c
            end = 5 if conv else 6
            counts[(prev, end)] = counts.get((prev, end), 0) + 1
        tot = {}
        for (f, t), c in counts.items():
            tot[f] = tot.get(f, 0) + c

        def solve(drop=None):
            p = [0] * 5
            for _ in range(iters):
                p = [
                    (
                        sum(
                            counts.get((s, t), 0) * p[t]
                            for t in range(1, 5)
                            if t != drop
                        )
                        + counts.get((s, 5), 0) * scale
                    ) // tot[s]
                    if tot.get(s, 0)
                    else 0
                    for s in range(5)
                ]
            return p

        return counts, solve

    def test_exact_python_rederivation(self, spark, sf_dir):
        """B137: chain counts, fixed point, removal effects, and
        shares all match an independent python replay of the stated
        journey model."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import (
            _MK_CHANNELS,
            markov_attribution,
        )

        ev = load_table(spark, sf_dir, "events").collect()
        by_user = {}
        for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
            by_user.setdefault(r["user_id"], []).append(r["event_type"])
        idx = {n: i for i, n in enumerate(_MK_CHANNELS, start=1)}
        journeys = []
        for types in by_user.values():
            path, conv = [], False
            for t in types:
                if t == "purchase":
                    conv = True
                    break
                path.append(idx[t])
            journeys.append((path, conv))
        _, solve = self._replay(journeys)
        p_full = solve()
        got = {r["channel"]: r
               for r in markov_attribution(spark, sf_dir).collect()}
        assert set(got) == set(_MK_CHANNELS)
        effects = {}
        for name, i in idx.items():
            p_rm = solve(drop=i)
            row = got[name]
            assert row["p_full_ppb"] == p_full[0]
            assert row["p_removed_ppb"] == p_rm[0]
            effects[name] = p_full[0] - p_rm[0]
        s_eff = sum(effects.values())
        for name, eff in effects.items():
            assert got[name]["removal_effect_ppb"] == eff
            if s_eff > 0:
                assert got[name]["attribution_bp"] == eff * 10000 // s_eff
        # every conversion is reachable only through channels: shares
        # sum to ~10000 (floor slack < n_channels)
        if s_eff > 0:
            tot_bp = sum(got[n]["attribution_bp"] for n in _MK_CHANNELS)
            assert 10000 - len(_MK_CHANNELS) < tot_bp <= 10000

    def test_crafted_closed_form(self, spark, tmp_path):
        """A hand-built chain with a closed-form answer: all paths run
        start -> click -> (60% purchase / 40% view -> null). Removing
        click kills ALL conversions; removing view kills none."""
        import datetime

        from greenplum_cdc_spark.operators.timeseries import (
            markov_attribution,
        )

        base = datetime.datetime(2024, 1, 1)
        rows, eid = [], 0

        def add(user, *types):
            nonlocal eid
            for i, t in enumerate(types):
                rows.append(
                    (eid, base + datetime.timedelta(minutes=eid), user, t,
                     1.0, "{}")
                )
                eid += 1

        for u in range(6):
            add(u, "click", "purchase")
        for u in range(6, 10):
            add(u, "click", "view")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        got = {r["channel"]: r
               for r in markov_attribution(spark, str(tmp_path)).collect()}
        assert got["click"]["p_full_ppb"] == 600_000_000
        assert got["click"]["p_removed_ppb"] == 0
        assert got["view"]["p_removed_ppb"] == 600_000_000
        assert got["click"]["attribution_bp"] == 10000
        assert got["view"]["attribution_bp"] == 0


class TestMaxDrawdown:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B138: peak/trough/recovery and depth match a sequential
        python replay of the running series."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import max_drawdown

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
            .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"))
            .collect()
        )
        series = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["day"], r["c"]))
        got = {r["event_type"]: r for r in max_drawdown(spark, sf_dir).collect()}
        for et, pts in series.items():
            pts.sort()
            cum = peak = 0
            best = (-1, None)  # (dd, trough_day) earliest-trough argmax
            hist = []
            for day, c in pts:
                cum += c
                peak = max(peak, cum)
                hist.append((day, cum, peak))
                dd = peak - cum
                if dd > best[0]:
                    best = (dd, day)
            dd, trough_day = best
            row = got[et]
            assert row["trough_day"] == trough_day
            assert row["max_drawdown_cents"] == dd
            t_peak = next(p for d, c, p in hist if d == trough_day)
            assert row["peak_cum_cents"] == t_peak
            pk_day = max(d for d, c, p in hist if d <= trough_day and c == t_peak)
            assert row["peak_day"] == pk_day
            rec = [d for d, c, p in hist if d > trough_day and c >= t_peak]
            assert row["recovery_day"] == (min(rec) if rec else None)
            assert row["drawdown_bp"] == (
                dd * 10000 // t_peak if t_peak > 0 else None
            )

    def test_crafted_underwater_period(self, spark, tmp_path):
        """A series that dips 30% then recovers: exact depth, peak,
        trough and recovery days; a never-recovering series reports
        NULL recovery."""
        import datetime

        from greenplum_cdc_spark.operators.timeseries import max_drawdown

        base = datetime.datetime(2024, 1, 1)
        rows, eid = [], 0

        def add(tag, vals):
            nonlocal eid
            for d, v in enumerate(vals):
                rows.append(
                    (eid, base + datetime.timedelta(days=d), 1, tag,
                     float(v), "{}")
                )
                eid += 1

        # cumulative: 100, 200, 170, 140, 210 -> dd 60 at day 4 (idx 3)
        add("recovers", [100, 100, -30, -30, 70])
        # cumulative: 100, 40 -> dd 60, never back
        add("sinks", [100, -60])
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        got = {r["event_type"]: r
               for r in max_drawdown(spark, str(tmp_path)).collect()}
        r1 = got["recovers"]
        assert r1["max_drawdown_cents"] == 6000
        assert r1["peak_day"].day == 2 and r1["trough_day"].day == 4
        assert r1["recovery_day"].day == 5
        assert r1["drawdown_bp"] == 6000 * 10000 // 20000
        r2 = got["sinks"]
        assert r2["max_drawdown_cents"] == 6000
        assert r2["recovery_day"] is None


class TestCdcMaskingTransform:
    def test_policy_theorems(self, spark, sf_dir):
        """A54: joinability (pseudonym count == raw live-key count,
        merge counts preserved), non-triviality (no raw id appears in
        any pseudonym), and band recoverability (true cents inside
        [band_lo, band_hi])."""
        import hashlib

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.cdc_queries import (
            _MASK_BANDS,
            _MASK_SEED,
            cdc_masking_transform,
        )

        ev = load_table(spark, sf_dir, "events").collect()
        latest, counts = {}, {}
        for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
            pk = r["user_id"]
            counts[pk] = counts.get(pk, 0) + 1
            latest[pk] = r
        cents = [int(math.floor(r["value"] * 100)) for r in ev]
        lo, hi = min(cents), max(cents)
        live = {pk: r for pk, r in latest.items()
                if r["event_type"] != "error"}
        got = {r["pseudonym"]: r
               for r in cdc_masking_transform(spark, sf_dir).collect()}
        assert len(got) == len(live)  # no pseudonym collisions
        for pk, r in live.items():
            pseud = hashlib.md5(
                f"{_MASK_SEED}|{pk}".encode()
            ).hexdigest()[:16]
            row = got[pseud]
            assert row["n_events"] == counts[pk]
            c = int(math.floor(r["value"] * 100))
            band = min(_MASK_BANDS - 1,
                       (c - lo) * _MASK_BANDS // (hi - lo + 1))
            assert row["value_band"] == band
            assert row["band_lo_cents"] <= c <= row["band_hi_cents"]
            assert row["last_event_type"] == r["event_type"]

    def test_seed_rotation_rekeys(self, spark, sf_dir, monkeypatch):
        """Rotating the seed yields a disjoint pseudonym space — the
        documented re-key path."""
        from greenplum_cdc_spark.plans import cdc_queries

        a = {r["pseudonym"]
             for r in cdc_queries.cdc_masking_transform(spark, sf_dir).collect()}
        monkeypatch.setattr(cdc_queries, "_MASK_SEED", "mask-v2")
        # the SQL constant is baked at import; the Spark op reads the
        # module attr at call time — compare Spark-side only
        b = {r["pseudonym"]
             for r in cdc_queries.cdc_masking_transform(spark, sf_dir).collect()}
        assert a and b and not (a & b)


class TestKcoreDecomposition:
    def test_exact_python_fixpoint(self, spark, sf_dir):
        """C126: the core set, both degree columns, and the adaptive k
        match an independent python peeling to fixpoint."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import (
            _KCORE_MIN_SUP,
            kcore_decomposition,
        )

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ).distinct().collect()
        baskets = {}
        for r in li:
            baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
        sup = {}
        for parts in baskets.values():
            ps = sorted(parts)
            for i, a in enumerate(ps):
                for b in ps[i + 1:]:
                    sup[(a, b)] = sup.get((a, b), 0) + 1
        adj = {}
        for (a, b), c in sup.items():
            if c >= _KCORE_MIN_SUP:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        degs = sorted(len(v) for v in adj.values())
        n = len(degs)
        med = degs[(n + 1) // 2 - 1]
        k = max(2, med // 2)
        alive = set(adj)
        while True:
            nxt = {u for u in alive
                   if sum(1 for v in adj[u] if v in alive) >= k}
            if nxt == alive:
                break
            alive = nxt
        got = {r["part_id"]: r
               for r in kcore_decomposition(spark, sf_dir).collect()}
        assert set(got) == alive
        for u in alive:
            assert got[u]["k"] == k
            assert got[u]["initial_degree"] == len(adj[u])
            assert got[u]["core_degree"] == sum(
                1 for v in adj[u] if v in alive
            )
            assert got[u]["core_degree"] >= k  # the defining property
        # non-vacuity on this corpus: peeling removed SOMETHING
        assert alive and len(alive) < n

    def test_crafted_pendant_peeling(self, spark, tmp_path):
        """A triangle with a pendant chain: the 2-core is exactly the
        triangle; the chain peels over multiple rounds (the
        synchronous-peeling semantics, not a single degree filter)."""
        from greenplum_cdc_spark.plans.tpch import kcore_decomposition

        # baskets encode edges with support 2 (each edge = 2 orders)
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        rows = []
        ok = 0
        for a, b in edges:
            for _ in range(2):
                ok += 1
                rows.append((ok, a, 1, 1.0))
                rows.append((ok, b, 2, 1.0))
        spark.createDataFrame(
            [(o, p, ln, q, 100.0, 0.0, 0.0, "N", "O",
              __import__("datetime").datetime(2024, 1, 1))
             for o, p, ln, q in rows],
            "l_orderkey long, l_partkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string,"
            " l_shipdate timestamp",
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        got = {r["part_id"]: r
               for r in kcore_decomposition(spark, str(tmp_path)).collect()}
        # degrees: 1:2, 2:2, 3:3, 4:2, 5:2, 6:1 -> median 2, k = max(2,1) = 2
        # 2-core: chain 6-5-4 peels end-in (3 rounds); triangle survives
        assert set(got) == {1, 2, 3}
        assert all(r["core_degree"] == 2 for r in got.values())
        assert got[3]["initial_degree"] == 3


class TestHapaxTailAudit:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """C127: all tail statistics match a python counter replay."""
        from collections import Counter

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.text import hapax_tail_audit

        by_lang = {}
        for r in load_table(spark, sf_dir, "documents").collect():
            c = by_lang.setdefault(r["lang"], Counter())
            c.update(w for w in r["text"].split(" ") if w)
        got = {r["lang"]: r for r in hapax_tail_audit(spark, sf_dir).collect()}
        assert set(got) == set(by_lang)
        for lang, c in by_lang.items():
            row = got[lang]
            n_tok = sum(c.values())
            vocab = len(c)
            hapax = sum(1 for v in c.values() if v == 1)
            dis = sum(1 for v in c.values() if v == 2)
            tail = sum(v for v in c.values() if v <= 2)
            assert row["n_tokens"] == n_tok
            assert row["vocab"] == vocab
            assert row["hapax_types"] == hapax
            assert row["dis_types"] == dis
            assert row["hapax_share_bp"] == hapax * 10000 // vocab
            assert row["tail_mass_bp"] == tail * 10000 // n_tok
            assert row["mean_freq_ppm"] == n_tok * 1000000 // vocab
        # accounting with C20: hapax + dis + rest == vocab
        for lang, c in by_lang.items():
            rest = sum(1 for v in c.values() if v > 2)
            assert (got[lang]["hapax_types"] + got[lang]["dis_types"]
                    + rest) == got[lang]["vocab"]


class TestSloBurnRateAlert:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B139: every policy row matches a python replay of the
        two-window AND rule over the hourly spine."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import (
            _SLO_ERR_BUDGET_BP,
            _SLO_POLICIES,
            slo_burn_rate_alert,
        )

        hourly = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.date_trunc("hour", "ts").alias("h"))
            .agg(
                F.count("*").alias("ev"),
                F.sum((F.col("event_type") == "error").cast("long")).alias(
                    "err"
                ),
            )
            .collect()
        )
        spine = sorted((r["h"], r["ev"], r["err"]) for r in hourly)
        evs = [e for _, e, _ in spine]
        errs = [x for _, _, x in spine]
        tev, terr = sum(evs), sum(errs)
        got = {r["policy"]: r
               for r in slo_burn_rate_alert(spark, sf_dir).collect()}
        for name, long_h, short_h, thr in _SLO_POLICIES:
            n_eval = alerts = 0
            max_burn = None
            for i in range(len(spine)):
                if i + 1 < long_h:
                    continue
                n_eval += 1
                ev_l = sum(evs[i - long_h + 1:i + 1])
                err_l = sum(errs[i - long_h + 1:i + 1])
                ev_s = sum(evs[i - short_h + 1:i + 1])
                err_s = sum(errs[i - short_h + 1:i + 1])
                burn = err_l * 10000 * 100 // (ev_l * _SLO_ERR_BUDGET_BP)
                max_burn = burn if max_burn is None else max(max_burn, burn)
                if (err_l * 10000 > thr * _SLO_ERR_BUDGET_BP * ev_l
                        and err_s * 10000 > thr * _SLO_ERR_BUDGET_BP * ev_s):
                    alerts += 1
            row = got[name]
            assert row["hours_evaluated"] == n_eval
            assert row["hours_in_alert"] == alerts
            assert row["max_burn_centi"] == max_burn
            assert row["budget_consumed_bp"] == (
                terr * 10000 * 10000 // (tev * _SLO_ERR_BUDGET_BP)
            )

    def test_crafted_two_window_and(self, spark, tmp_path):
        """The short window is what stops a page for an incident that
        ENDED: a burst 7 hours ago still trips the 24h ticket window
        but not page_slow's 1h short window."""
        import datetime

        from greenplum_cdc_spark.operators.timeseries import (
            slo_burn_rate_alert,
        )

        base = datetime.datetime(2024, 1, 1)
        rows, eid = [], 0
        # 40 hours; hour 25 is a full outage (100% errors), rest clean
        # (late enough that every policy's long window is already full)
        for h in range(40):
            for j in range(100):
                eid += 1
                et = "error" if h == 25 else "view"
                rows.append(
                    (eid, base + datetime.timedelta(hours=h, minutes=j % 60),
                     1, et, 1.0, "{}")
                )
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        got = {r["policy"]: r
               for r in slo_burn_rate_alert(spark, str(tmp_path)).collect()}
        # page_fast (1h/1h): fires exactly during the outage hour
        assert got["page_fast"]["hours_in_alert"] == 1
        # page_slow (6h long, 1h short): long window stays hot for 6
        # hours but the short window is clean after the outage -> 1
        assert got["page_slow"]["hours_in_alert"] == 1
        # ticket (24h long, 6h short): short window stays hot 6 hours
        assert got["ticket"]["hours_in_alert"] == 6


class TestServiceLevelStock:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B140: stock level (ceil-rank p95 order statistic) and both
        consequence columns match a python replay."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import (
            _SLS_SERVICE_PCT,
            service_level_stock,
        )

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", F.date_trunc("day", "l_shipdate").alias("day"),
            F.floor("l_quantity").cast("long").alias("qty"),
        ).collect()
        brand = {r["p_partkey"]: r["p_brand"]
                 for r in load_table(spark, sf_dir, "part").collect()}
        daily = {}
        for r in li:
            k = (brand[r["l_partkey"]], r["day"])
            daily[k] = daily.get(k, 0) + r["qty"]
        series = {}
        for (b, d), v in daily.items():
            series.setdefault(b, []).append((v, d))
        got = {r["p_brand"]: r
               for r in service_level_stock(spark, sf_dir).collect()}
        assert set(got) == set(series)
        for b, pts in series.items():
            pts.sort()
            n = len(pts)
            stock = pts[(n * _SLS_SERVICE_PCT + 99) // 100 - 1][0]
            short = [v for v, _ in pts if v > stock]
            total = sum(v for v, _ in pts)
            row = got[b]
            assert row["n_days"] == n
            assert row["stock_level"] == stock
            assert row["total_demand"] == total
            assert row["days_short"] == len(short)
            assert row["days_short_bp"] == len(short) * 10000 // n
            unmet = sum(v - stock for v in short)
            assert row["unmet_units"] == unmet
            assert row["unmet_demand_bp"] == unmet * 10000 // total
            # cycle-service guarantee: at most 5% of days short
            assert row["days_short_bp"] <= (100 - _SLS_SERVICE_PCT) * 100
