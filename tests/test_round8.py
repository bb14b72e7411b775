"""Round-8 hardening tests: ReplicaStore segment compaction, vacuum
sidecar GC, and the SCD2 legacy-base loud guard (VERDICT r7 items 2,
ADVICE items 1 and 4)."""

import os

import pytest


def _df(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def _fingerprint(root):
    """(relpath, size, mtime_ns) of every data file under root."""
    out = {}
    for r, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


class TestReplicaStoreCompaction:
    def test_manifest_bounded_across_3k_batches(self, spark, tmp_path):
        """K=4: across 3K append-mode commits the manifest length never
        exceeds K, every version's time-travel read stays exact, and
        compaction writes NEW segment files only — segments linked by
        older versions are never mutated (file-fingerprint check)."""
        from greenplum_cdc_spark.streaming.pipeline import ReplicaStore

        K = 4
        store = ReplicaStore(spark, str(tmp_path / "rep"), compact_after=K)
        seg_root = os.path.join(store.path, "seg")
        expected = {}  # version -> sorted logical contents
        appended = []
        fps = {}  # segment dir -> fingerprint at creation
        for i in range(3 * K):
            base = [1000 + i]  # rewritable open slice
            appended.append(2000 + i)  # this batch's write-once rows
            v = store.commit(
                _df(spark, *base), append=_df(spark, 2000 + i)
            )
            expected[v] = sorted(base + appended)
            assert len(store._manifest(v)) <= K, (v, store._manifest(v))
            # fingerprints: previously recorded segment dirs unchanged
            for d in os.listdir(seg_root):
                fp = _fingerprint(os.path.join(seg_root, d))
                if d in fps:
                    assert fps[d] == fp, f"segment {d} mutated at v{v}"
                else:
                    fps[d] = fp
        # compaction actually fired (c-segments exist) and every
        # version's read — including pre-compaction ones — is exact
        assert any(d.startswith("c") for d in os.listdir(seg_root))
        for v, want in expected.items():
            got = sorted(r["x"] for r in store.read(version=v).collect())
            assert got == want, (v, got, want)

    def test_vacuum_gc_after_compaction(self, spark, tmp_path):
        """After vacuuming pre-compaction versions, the original
        b-segments they linked are GC'd while the compacted segment
        (linked by retained versions) survives; reads stay exact."""
        from greenplum_cdc_spark.streaming.pipeline import ReplicaStore

        K = 3
        store = ReplicaStore(spark, str(tmp_path / "rep"), compact_after=K)
        for i in range(2 * K):
            store.commit(_df(spark, 0), append=_df(spark, 100 + i))
        seg_root = os.path.join(store.path, "seg")
        assert any(d.startswith("c") for d in os.listdir(seg_root))
        store.vacuum(keep_last=1)
        cur = store.current_version()
        linked = set(store._manifest(cur))
        on_disk = {os.path.join("seg", d) for d in os.listdir(seg_root)}
        assert on_disk == linked  # nothing unreferenced survives
        got = sorted(r["x"] for r in store.read().collect())
        assert got == [0] + [100 + i for i in range(2 * K)]


class TestVacuumSidecarGC:
    def test_wm_sidecars_of_dropped_versions_removed(self, spark, tmp_path):
        """ADVICE r7: vacuum() must drop the `_wm/v=N` per-key state
        sidecars of GC'd versions — they are one O(keys) parquet copy
        per commit and previously accumulated forever."""
        from greenplum_cdc_spark.streaming.pipeline import ReplicaStore

        store = ReplicaStore(spark, str(tmp_path / "rep"))
        for i in range(1, 6):
            v = store.commit(_df(spark, i))
            _df(spark, i).write.parquet(
                os.path.join(store.path, "_wm", f"v={v}")
            )
        store.vacuum(keep_last=2)
        left = sorted(os.listdir(os.path.join(store.path, "_wm")))
        assert left == ["v=4", "v=5"]
        # retained sidecars still readable
        assert spark.read.parquet(
            os.path.join(store.path, "_wm", "v=5")
        ).count() == 1


class TestScd2LegacyBaseGuard:
    def test_full_snapshot_base_fails_loud(self, spark, tmp_path):
        """ADVICE r7: a store whose base holds CLOSED rows (legacy full
        snapshot) must raise with the migration path, not mis-merge
        closed rows back through the window."""
        from greenplum_cdc_spark.streaming.pipeline import (
            ReplicaStore,
            scd2_merge_fn,
        )

        store = ReplicaStore(spark, str(tmp_path / "rep"))
        legacy = spark.createDataFrame(
            [
                (1, 10, 100, 200, False, 1.0, "a"),   # closed row in base
                (1, 20, 200, None, True, 2.0, "a"),
            ],
            "pk long, version_seq long, valid_from long, valid_to long,"
            " is_current boolean, value double, event_type string",
        )
        store.commit(legacy)
        batch = spark.createDataFrame(
            [(1, 300, 30, "update", 3.0, "a")],
            "pk long, ts long, seq long, op string, value double,"
            " event_type string",
        )
        with pytest.raises(ValueError, match="CLOSED version rows"):
            scd2_merge_fn(store)(batch, 0)

    def test_open_only_base_still_merges(self, spark, tmp_path):
        """The guard must not fire on a healthy append-mode store."""
        from greenplum_cdc_spark.streaming.pipeline import (
            ReplicaStore,
            scd2_merge_fn,
        )

        store = ReplicaStore(spark, str(tmp_path / "rep"))
        merge = scd2_merge_fn(store)
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows,
            "pk long, ts long, seq long, op string, value double,"
            " event_type string",
        )
        merge(mk([(1, 100, 10, "insert", 1.0, "a")]), 0)
        merge(mk([(1, 200, 20, "update", 2.0, "a")]), 1)
        rows = {
            (r["pk"], r["valid_from"]): (r["valid_to"], r["is_current"])
            for r in store.read().collect()
        }
        assert rows[(1, 100)] == (200, False)
        assert rows[(1, 200)] == (None, True)


class TestFastCdcChunking:
    def test_bounds_invariant_and_python_twin(self, spark):
        """C98: every NON-final chunk length lies in [MIN, MAX] (the
        normalization contract basic CDC cannot give), bytes are
        conserved per source, and the operator's chunk count matches
        the independent python twin on a sampled source."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.text import (
            _FCDC_MAX,
            _FCDC_MIN,
            _fastcdc_bounds_py,
            fastcdc_chunking,
        )

        sf = "/root/testdata/sf0.001"
        out = {r["source"]: r for r in fastcdc_chunking(spark, sf).collect()}
        docs = load_table(spark, sf, "documents")
        truth = {
            r["source"]: r["total"]
            for r in docs.groupBy("source")
            .agg(F.sum(F.length("text")).alias("total"))
            .collect()
        }
        assert set(out) == set(truth)
        for src, r in out.items():
            assert r["total_chars"] == truth[src]
            if r["min_body_len"] is not None:
                assert _FCDC_MIN <= r["min_body_len"]
                assert r["max_body_len"] <= _FCDC_MAX
        src0 = sorted(out)[0]
        texts = [
            r["text"] for r in docs.filter(F.col("source") == src0).collect()
        ]
        n_chunks = 0
        for t in texts:
            bs = _fastcdc_bounds_py(t)
            ends = bs if (bs and bs[-1] == len(t)) else bs + [len(t)]
            n_chunks += len(ends)
            s = 1
            for e in bs:  # non-final cuts obey the bound per doc too
                assert _FCDC_MIN <= e - s + 1 <= _FCDC_MAX
                s = e + 1
        assert out[src0]["n_chunks"] == n_chunks

    def test_normalization_tightens_the_tail(self):
        """The point of FastCDC over basic CDC: on the same text the
        normalized chunker has NO chunk shorter than MIN or longer
        than MAX (basic CDC's exponential tail produces both)."""
        import random

        from greenplum_cdc_spark.operators.text import (
            _FCDC_MAX,
            _FCDC_MIN,
            _fastcdc_bounds_py,
            _gear_bounds_py,
        )

        rng = random.Random(42)
        words = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
        text = " ".join(rng.choice(words) for _ in range(3000))

        def lens(bounds):
            ends = bounds if (bounds and bounds[-1] == len(text)) else (
                bounds + [len(text)]
            )
            s, out = 1, []
            for e in ends:
                out.append(e - s + 1)
                s = e + 1
            return out

        basic = lens(_gear_bounds_py(text))
        fast = lens(_fastcdc_bounds_py(text))
        # basic CDC's geometric tail: shorts below MIN and longs above
        # MAX both occur on a corpus this size
        assert min(basic) < _FCDC_MIN
        assert max(basic) > _FCDC_MAX
        # normalized: every non-final chunk in [MIN, MAX]
        assert min(fast[:-1]) >= _FCDC_MIN
        assert max(fast) <= _FCDC_MAX


class TestConnectedComponents:
    def test_log_rounds_and_union_find_truth(self, spark):
        """B99: star contraction must converge in far fewer rounds than
        the chain diameter (the property that makes it the 100 TB path
        over per-hop label propagation), and the labels must equal an
        independent union-find ground truth."""
        import math

        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.dedup import (
            _CC_CHAIN,
            connected_components,
        )

        sf = "/root/testdata/sf0.001"
        out = connected_components(spark, sf)
        rows = {r["doc_id"]: r for r in out.collect()}
        rounds = connected_components.last_rounds
        # label propagation would need diameter rounds (= chain length
        # - 1 = 63); star contraction stays in the log regime
        assert rounds <= 2 * math.ceil(math.log2(_CC_CHAIN)) + 2, rounds
        # independent union-find over the same chain construction
        docs = sorted(
            (r["source"], r["doc_id"])
            for r in load_table(spark, sf, "documents")
            .select("doc_id", "source")
            .collect()
        )
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        by_src = {}
        for src, d in docs:
            by_src.setdefault(src, []).append(d)
        for src, ids in by_src.items():
            ids.sort()
            for i, d in enumerate(ids):
                parent[d] = d
                if i % _CC_CHAIN != 0:
                    ra, rb = find(d), find(ids[i - 1])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        want = {d: find(d) for _, d in docs}
        sizes = {}
        for d, c in want.items():
            sizes[c] = sizes.get(c, 0) + 1
        assert set(rows) == set(want)
        for d, r in rows.items():
            assert r["component_id"] == want[d], d
            assert r["component_size"] == sizes[want[d]]
            assert r["is_root"] == int(d == want[d])


class TestParetoFrontier:
    def test_matches_brute_force_dominance(self, spark):
        """C99: the running-frame skyline equals the O(n^2) dominance
        definition computed independently in python; frontier rows are
        mutually non-dominated and every non-frontier row has a
        dominator."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.quality import pareto_frontier

        sf = "/root/testdata/sf0.001"
        got = {
            (r["source"], r["doc_id"])
            for r in pareto_frontier(spark, sf).collect()
        }
        docs = (
            load_table(spark, sf, "documents")
            .select(
                "source",
                "doc_id",
                F.col("n_chars").cast("long").alias("x"),
                F.expr(
                    "size(array_distinct(filter(split(text, ' '),"
                    " t -> t != '')))"
                ).cast("long").alias("y"),
            )
            .collect()
        )
        by_src = {}
        for r in docs:
            by_src.setdefault(r["source"], []).append(
                (r["doc_id"], r["x"], r["y"])
            )
        want = set()
        for src, rows in by_src.items():
            for d, x, y in rows:
                dominated = any(
                    (x2 >= x and y2 >= y and (x2 > x or y2 > y))
                    for _d2, x2, y2 in rows
                )
                if not dominated:
                    want.add((src, d))
        assert got == want and want


class TestEmbeddingCovariance:
    def test_exact_vs_numpy_and_psd(self, spark):
        """C100: the distributed partial-Gram aggregation equals a
        single-shot numpy computation exactly (integer identity, no
        tolerance), and the resulting covariance matrix is symmetric
        PSD (eigmin >= -tiny numerical slack after de-quantization)."""
        import numpy as np

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.similarity import (
            _COV_DIM,
            _COV_SCALE,
            embedding_covariance,
        )

        sf = "/root/testdata/sf0.001"
        rows = embedding_covariance(spark, sf).collect()
        assert len(rows) == _COV_DIM * (_COV_DIM + 1) // 2
        X = np.stack(
            [
                r["embedding"]
                for r in load_table(spark, sf, "embeddings")
                .select("embedding")
                .collect()
            ]
        )
        Q = np.floor(X.astype(np.float64) * _COV_SCALE).astype(np.int64)
        n = len(Q)
        G = Q.T @ Q
        s = Q.sum(axis=0)
        C = np.zeros((_COV_DIM, _COV_DIM), dtype=np.int64)
        for r in rows:
            i, j = r["i"] - 1, r["j"] - 1
            assert r["n"] == n
            assert r["sum_ij"] == G[i, j], (i, j)
            want = n * G[i, j] - s[i] * s[j]
            assert r["cov_num"] == want, (i, j)
            C[i, j] = C[j, i] = r["cov_num"]
        # n^2 * covariance must be (numerically) PSD
        eig = np.linalg.eigvalsh(C.astype(np.float64))
        assert eig.min() >= -1e-6 * max(eig.max(), 1.0)


class TestReciprocalRankFusion:
    def test_fusion_semantics(self, spark):
        """C101: RRF brings up documents strong in EITHER ranking —
        per source, every fused top-1 is top-3 in at least one input
        ranking; scores are the exact integer floor-division sums; no
        source emits more than TOP rows; ranks carry the doc_id tie
        discipline (strictly increasing over the emitted order)."""
        from greenplum_cdc_spark.operators.quality import (
            _RRF_K,
            _RRF_SCALE,
            _RRF_TOP,
            reciprocal_rank_fusion,
        )

        rows = reciprocal_rank_fusion(
            spark, "/root/testdata/sf0.001"
        ).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        assert by_src
        for src, rs in by_src.items():
            assert len(rs) <= _RRF_TOP
            assert [r["fused_rank"] for r in rs] == list(
                range(1, len(rs) + 1)
            )
            for r in rs:
                want = _RRF_SCALE // (_RRF_K + r["rank_vocab"]) + (
                    _RRF_SCALE // (_RRF_K + r["rank_len"])
                )
                assert r["rrf_score"] == want
            # fused winner is strong in at least one input ranking
            top = rs[0]
            assert min(top["rank_vocab"], top["rank_len"]) <= 3, top
            # emitted order is score-desc with doc_id tiebreak
            scores = [(-(r["rrf_score"]), r["doc_id"]) for r in rs]
            assert scores == sorted(scores)


class TestUnicodeAnomalyScan:
    def test_crafted_anomalies_counted_exactly(self, spark, tmp_path):
        """C102: a crafted corpus with KNOWN zero-width / bidi /
        replacement / C0 injections — counts must match the python
        ground truth exactly (the sf corpora are clean, so this test
        is where the regex semantics are actually exercised)."""
        from greenplum_cdc_spark.operators.quality import (
            _UNICODE_ANOMALIES,
            unicode_anomaly_scan,
        )

        docs = [
            (1, "clean text here", "en", "web", 15),
            (2, "hid​den zero​width⁠", "en", "web", 0),
            (3, "bidi ‮evil‬ attack", "en", "web", 0),
            (4, "moji�bake��", "en", "books", 0),
            (5, "ctrl\x07bell\x1bescape", "en", "books", 0),
            (6, "‍‍‍", "en", "books", 3),
        ]
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = {
            (r["source"], r["anomaly"]): (
                r["docs_affected"], r["occurrences"]
            )
            for r in unicode_anomaly_scan(spark, str(tmp_path)).collect()
        }
        # python ground truth over the same explicit code-point lists
        want = {}
        for src in ("web", "books"):
            texts = [t for _i, t, _l, s, _n in docs if s == src]
            for name, points in _UNICODE_ANOMALIES:
                chars = {chr(p) for p in points}
                hits = [sum(1 for c in t if c in chars) for t in texts]
                want[(src, name)] = (
                    sum(1 for h in hits if h > 0), sum(hits)
                )
        assert out == want
        assert out[("web", "zero_width")] == (1, 3)
        assert out[("web", "bidi_control")] == (1, 2)
        assert out[("books", "replacement")] == (1, 3)
        assert out[("books", "c0_control")] == (1, 2)
        assert out[("books", "zero_width")] == (1, 3)


class TestBitemporalBeliefAudit:
    def test_prefix_maxima_semantics(self, spark):
        """B100: per key the emitted rows are exactly the prefix
        maxima of (ts, event_id) over arrival order among events at or
        before the valid cut — verified against an independent python
        replay; belief_idx is dense from 1; valid_ts never decreases
        along the belief sequence."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.cdc_queries import (
            _BT_DEN,
            _BT_NUM,
            bitemporal_belief_audit,
        )

        sf = "/root/testdata/sf0.001"
        got = {}
        for r in bitemporal_belief_audit(spark, sf).collect():
            got.setdefault(r["user_id"], []).append(
                (r["belief_idx"], r["event_id"])
            )
        ev = (
            load_table(spark, sf, "events")
            .select("user_id", "event_id", F.unix_micros("ts").alias("t"))
            .collect()
        )
        import hashlib

        def arr_key(eid: int) -> int:
            return int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16)

        lo = min(r["t"] for r in ev)
        hi = max(r["t"] for r in ev)
        cut = lo + (hi - lo) * _BT_NUM // _BT_DEN
        by_user = {}
        for r in ev:
            if r["t"] <= cut:
                by_user.setdefault(r["user_id"], []).append(
                    (arr_key(r["event_id"]), r["event_id"], r["t"])
                )
        want = {}
        for u, rows in by_user.items():
            rows.sort()  # hash-permuted arrival order
            best = None
            for _ak, eid, t in rows:
                if best is None or t >= best:
                    want.setdefault(u, []).append(eid)
                    best = t
        assert set(got) == set(want)
        for u, seq in got.items():
            assert [i for i, _e in seq] == list(range(1, len(seq) + 1))
            assert [e for _i, e in seq] == want[u]
        # out-of-orderness is real in this corpus: some key must have
        # suppressed (non-belief) arrivals, else the op is vacuous
        assert any(
            len(want[u]) < len(by_user[u]) for u in want
        )


class TestPaddingWasteAudit:
    def test_sorted_batching_never_worse_and_exact(self, spark):
        """C103: per source, length-sorted batching's waste is <= the
        arrival-order waste (the theorem the op exists to quantify);
        totals conserve (total_tokens identical across disciplines);
        one source's numbers re-derived exactly in python."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.text import (
            _PAD_B,
            padding_waste_audit,
        )

        sf = "/root/testdata/sf0.001"
        rows = padding_waste_audit(spark, sf).collect()
        by = {(r["source"], r["discipline"]): r for r in rows}
        sources = {s for s, _d in by}
        assert sources and len(by) == 2 * len(sources)
        for src in sources:
            a, s_ = by[(src, "arrival")], by[(src, "sorted")]
            assert a["total_tokens"] == s_["total_tokens"]
            assert s_["waste"] <= a["waste"], src
            assert a["waste"] == a["padded_tokens"] - a["total_tokens"]
        # exact python re-derivation for one source
        src0 = sorted(sources)[0]
        docs = sorted(
            (r["doc_id"], len([t for t in r["text"].split(" ") if t]))
            for r in load_table(spark, sf, "documents")
            .filter(F.col("source") == src0)
            .select("doc_id", "text")
            .collect()
        )

        def waste(ordered):
            w = tot = pad = 0
            for i in range(0, len(ordered), _PAD_B):
                b = ordered[i : i + _PAD_B]
                mx = max(t for _d, t in b)
                pad += len(b) * mx
                tot += sum(t for _d, t in b)
            return pad - tot, tot, pad

        wa, ta, pa = waste(docs)  # arrival = doc_id order
        ws, ts_, ps = waste(sorted(docs, key=lambda dt: (dt[1], dt[0])))
        assert by[(src0, "arrival")]["waste"] == wa
        assert by[(src0, "arrival")]["padded_tokens"] == pa
        assert by[(src0, "sorted")]["waste"] == ws
        assert by[(src0, "sorted")]["padded_tokens"] == ps


class TestSeasonalDecompose:
    def test_exact_python_rederivation(self, spark):
        """B101: the centered-MA weekly decomposition re-derived
        exactly in python (integer identity at 7x scale): same daily
        rollup, same 7-observation centered window with edge drops,
        same weekday slots; seasonal indices of a weekday-balanced
        series must roughly cancel (sum of slot means near zero
        relative to the series magnitude)."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import (
            _SEAS_P,
            seasonal_decompose,
        )

        sf = "/root/testdata/sf0.001"
        rows = seasonal_decompose(spark, sf).collect()
        got = {
            (r["event_type"], r["weekday"]): (
                r["n_days"], r["sum_detrended_x7"], r["seasonal_x7_cents"]
            )
            for r in rows
        }
        daily = (
            load_table(spark, sf, "events")
            .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
            .agg(
                F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c")
            )
            .collect()
        )
        series = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["day"], r["c"]))
        want = {}
        half = _SEAS_P // 2
        for et, pts in series.items():
            pts.sort()
            for i in range(half, len(pts) - half):
                window = pts[i - half : i + half + 1]
                d7 = pts[i][1] * _SEAS_P - sum(c for _d, c in window)
                # Sunday = 0, matching dayofweek-1 / duckdb dayofweek
                wd = (pts[i][0].weekday() + 1) % 7
                n, s_ = want.get((et, wd), (0, 0))
                want[(et, wd)] = (n + 1, s_ + d7)
        assert set(got) == set(want)
        for k, (n, s_) in want.items():
            # python // floors; both engines truncate toward zero
            trunc = s_ // n if s_ >= 0 else -((-s_) // n)
            assert got[k] == (n, s_, trunc), k


class TestHistogramDriftTvd:
    def test_exact_python_rederivation_and_tvd_bounds(self, spark):
        """B102: the drift table re-derived exactly in python (same
        time cut, same integer bucketing, same floor-div shares);
        TVD is consistent with the per-bucket shifts and bounded by
        2*10000 bp; bucket ids stay within [0, NB)."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import (
            _DRIFT_DEN,
            _DRIFT_NB,
            _DRIFT_NUM,
            histogram_drift_tvd,
        )

        sf = "/root/testdata/sf0.001"
        rows = histogram_drift_tvd(spark, sf).collect()
        ev = (
            load_table(spark, sf, "events")
            .select(
                "event_type",
                F.unix_micros("ts").alias("t"),
                F.floor(F.col("value") * 100).cast("long").alias("v"),
            )
            .collect()
        )
        lo = min(r["t"] for r in ev)
        hi = max(r["t"] for r in ev)
        cut = lo + (hi - lo) * _DRIFT_NUM // _DRIFT_DEN
        vmin = min(r["v"] for r in ev)
        vmax = max(r["v"] for r in ev)
        cnt = {}
        for r in ev:
            b = (r["v"] - vmin) * _DRIFT_NB // (vmax - vmin + 1)
            assert 0 <= b < _DRIFT_NB
            k = (r["event_type"], b)
            e, l_ = cnt.get(k, (0, 0))
            if r["t"] <= cut:
                cnt[k] = (e + 1, l_)
            else:
                cnt[k] = (e, l_ + 1)
        te, tl = {}, {}
        for (et, _b), (e, l_) in cnt.items():
            te[et] = te.get(et, 0) + e
            tl[et] = tl.get(et, 0) + l_
        got = {(r["event_type"], r["bucket"]): r for r in rows}
        assert set(got) == set(cnt)
        tvd_want = {}
        for (et, b), (e, l_) in cnt.items():
            ebp = e * 10000 // te[et]
            lbp = l_ * 10000 // tl[et]
            r = got[(et, b)]
            assert (r["early_n"], r["late_n"]) == (e, l_)
            assert (r["early_bp"], r["late_bp"]) == (ebp, lbp)
            assert r["shift_bp"] == lbp - ebp
            tvd_want[et] = tvd_want.get(et, 0) + abs(lbp - ebp)
        for r in rows:
            assert r["tvd_bp"] == tvd_want[r["event_type"]]
            assert 0 <= r["tvd_bp"] <= 20000


class TestPrefixDupScan:
    def test_crafted_truncations_detected(self, spark, tmp_path):
        """C104: a crafted corpus with known truncation chains — A is a
        prefix of B is a prefix of C — plus decoys (shared block but
        diverging tail; identical twins; short-doc out of scope).
        Counts and reclaimable chars must match the brute-force python
        dominance exactly."""
        from greenplum_cdc_spark.operators.dedup import (
            _PREFIX_BLOCK,
            prefix_dup_scan,
        )

        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = [
            (1, base[:30], "web"),        # prefix of 2 and 3
            (2, base[:45], "web"),        # prefix of 3
            (3, base, "web"),
            (4, base[:16] + "ZZZ diverges", "web"),  # same block, no prefix
            (5, "tiny", "web"),           # below the detection floor
            (6, "identical twin text here", "books"),
            (7, "identical twin text here", "books"),  # equal != prefix
            (8, "completely different start", "books"),
        ]
        rows = [(i, t, "en", s, len(t)) for i, t, s in docs]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = {r["source"]: r for r in prefix_dup_scan(spark, str(tmp_path)).collect()}
        # brute force
        want = {}
        for s in ("web", "books"):
            members = [(i, t) for i, t, src in docs if src == s]
            pairs = [
                (ai, len(at))
                for ai, at in members
                for bi, bt in members
                if ai != bi
                and len(at) >= _PREFIX_BLOCK
                and len(at) < len(bt)
                and bt.startswith(at)
            ]
            want[s] = (
                len(pairs),
                len({i for i, _n in pairs}),
                sum(n for _i, n in pairs),
            )
        for s, (np_, nd, rc) in want.items():
            r = out[s]
            assert (r["n_pairs"], r["n_truncated_docs"],
                    r["reclaimable_chars"]) == (np_, nd, rc), s
        assert out["web"]["n_pairs"] == 3      # (1,2) (1,3) (2,3)
        assert out["web"]["n_truncated_docs"] == 2
        assert out["books"]["n_pairs"] == 0    # twins are equal, not proper


class TestDedupContainment:
    def test_crafted_containment_vs_brute_force(self, spark, tmp_path):
        """C105: a crafted corpus with a known embedded document (whole
        short doc inside a long page), a partial-overlap decoy below
        threshold, identical twins (containment 1 in BOTH directions),
        and a doc below the shingle floor that is fully contained but
        out of scope. Output must equal the brute-force ordered-pair
        containment over distinct word-3-gram sets."""
        from greenplum_cdc_spark.operators.dedup import (
            CONTAINMENT_DEN,
            CONTAINMENT_MIN_SHINGLES,
            CONTAINMENT_NUM,
            SHINGLE_WORDS,
            dedup_containment,
        )

        a = "alpha bravo charlie delta echo foxtrot golf"
        docs = [
            (1, a, "web"),  # embedded in 2; floor-eligible (5 shingles)
            (2, "intro words here " + a + " trailing content words beyond", "web"),
            # decoy: shares only 2 of doc 1's shingles -> 0.4 < 0.8
            (3, "alpha bravo charlie delta junkone junktwo", "web"),
            (4, "same twin text repeated enough words here", "books"),
            (5, "same twin text repeated enough words here", "books"),
            # below the floor (2 shingles) though fully inside doc 1
            (6, "alpha bravo charlie delta", "web"),
            (7, "completely unrelated content with different words", "books"),
        ]
        rows = [(i, t, "en", s, len(t)) for i, t, s in docs]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        got = {
            (r["contained_id"], r["container_id"]): r
            for r in dedup_containment(spark, str(tmp_path)).collect()
        }
        # brute force over distinct word-3-gram sets
        def sh(t):
            w = [x for x in t.split(" ") if x]
            return {
                " ".join(w[i : i + SHINGLE_WORDS])
                for i in range(len(w) - SHINGLE_WORDS + 1)
            }

        sets = {i: sh(t) for i, t, _s in docs}
        want = {}
        for ai, sa in sets.items():
            if len(sa) < CONTAINMENT_MIN_SHINGLES:
                continue
            for bi, sb in sets.items():
                if ai == bi:
                    continue
                inter = len(sa & sb)
                if inter * CONTAINMENT_DEN >= len(sa) * CONTAINMENT_NUM:
                    want[(ai, bi)] = (
                        inter,
                        len(sa),
                        inter * 1000000 // len(sa),
                    )
        assert set(got) == set(want)
        for k, (ni, na, ppm) in want.items():
            r = got[k]
            assert (r["n_inter"], r["n_contained_sh"], r["containment_ppm"]) == (
                ni, na, ppm,
            ), k
        # the semantics the op exists for, pinned explicitly:
        assert (1, 2) in got and got[(1, 2)]["containment_ppm"] == 1000000
        assert (2, 1) not in got            # asymmetric: the page is not in the doc
        assert (3, 1) not in got            # below threshold decoy
        assert (6, 1) not in got            # below the shingle floor
        assert (4, 5) in got and (5, 4) in got  # twins, both directions

    def test_heavy_tier_vs_brute_force(self, spark, tmp_path):
        """C105 tier 2 (round 9 df-ceiling split): a corpus where the
        qualifying pair's ENTIRE intersection is heavy shingles
        (df > DF_CEIL, planted via DF_CEIL+6 boilerplate docs all
        carrying the shared block), so tier 1's rare-prefix join can
        never surface it — only the heavy-universe prefix pass can.
        Output must still equal brute force exactly."""
        from greenplum_cdc_spark.operators.dedup import (
            CONTAINMENT_DEN,
            CONTAINMENT_MIN_SHINGLES,
            CONTAINMENT_NUM,
            DF_CEIL,
            SHINGLE_WORDS,
            dedup_containment,
        )

        block = "omega sigma tau upsilon phi chi psi"  # 5 shingles
        docs = [(1, block, "web")]  # contained: ALL its shingles heavy
        # container: block + per-doc-unique tail (rare shingles exist,
        # but the PAIR's intersection is exactly the heavy block)
        docs.append((2, block + " unique container tail words two", "web"))
        # boilerplate drivers: every block shingle appears in DF_CEIL+6
        # docs total -> df > DF_CEIL -> heavy
        for i in range(3, DF_CEIL + 7):
            docs.append((i, block + f" filler{i} fillmore{i} fin{i}", "web"))
        rows = [(i, t, "en", s, len(t)) for i, t, s in docs]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        got = {
            (r["contained_id"], r["container_id"]): (
                r["n_inter"], r["n_contained_sh"], r["containment_ppm"],
            )
            for r in dedup_containment(spark, str(tmp_path)).collect()
        }

        def sh(t):
            w = [x for x in t.split(" ") if x]
            return {
                " ".join(w[i : i + SHINGLE_WORDS])
                for i in range(len(w) - SHINGLE_WORDS + 1)
            }

        sets = {i: sh(t) for i, t, _s in docs}
        want = {}
        for ai, sa in sets.items():
            if len(sa) < CONTAINMENT_MIN_SHINGLES:
                continue
            for bi, sb in sets.items():
                if ai == bi:
                    continue
                inter = len(sa & sb)
                if inter * CONTAINMENT_DEN >= len(sa) * CONTAINMENT_NUM:
                    want[(ai, bi)] = (
                        inter, len(sa), inter * 1000000 // len(sa),
                    )
        assert got == want
        # doc 1 is wholly inside doc 2 through heavy shingles only
        assert got[(1, 2)] == (5, 5, 1000000)


class TestBenfordDigitAudit:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B103: every cell re-derived in python from the raw parquet —
        counts, floor-div shares, stated Benford table, deviations, and
        the per-priority TVD; zero cells present as rows."""
        from greenplum_cdc_spark.operators.stats import (
            BENFORD_BP,
            benford_digit_audit,
        )

        rows = benford_digit_audit(spark, sf_dir).collect()
        raw = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderpriority", "o_totalprice")
            .collect()
        )
        import math

        cnt, tot = {}, {}
        pris = set()
        for r in raw:
            pris.add(r["o_orderpriority"])
            cents = math.floor(r["o_totalprice"] * 100)
            if cents <= 0:
                continue
            d = int(str(cents)[0])
            k = (r["o_orderpriority"], d)
            cnt[k] = cnt.get(k, 0) + 1
            tot[r["o_orderpriority"]] = tot.get(r["o_orderpriority"], 0) + 1
        assert len(rows) == 9 * len(pris)
        tvd_want = {}
        for p in pris:
            tvd_want[p] = sum(
                abs(cnt.get((p, d), 0) * 10000 // tot[p] - BENFORD_BP[d - 1])
                for d in range(1, 10)
            )
        for r in rows:
            p, d = r["o_orderpriority"], r["digit"]
            n = cnt.get((p, d), 0)
            obs = n * 10000 // tot[p]
            assert r["n"] == n, (p, d)
            assert r["observed_bp"] == obs
            assert r["benford_bp"] == BENFORD_BP[d - 1]
            assert r["dev_bp"] == obs - BENFORD_BP[d - 1]
            assert r["tvd_bp"] == tvd_want[p]

    def test_fabricated_feed_flags(self, spark, tmp_path):
        """A constant-amount (fabricated) feed concentrates all mass on
        one digit: its TVD must be near the 2*(10000-benford_bp(d))
        ceiling, far above a Benford-ish organic feed's."""
        import datetime

        rows = [
            (i, i, "1-URGENT", 555.0, datetime.datetime(2024, 1, 1), "x")
            for i in range(100)
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        ).write.parquet(str(tmp_path / "orders.parquet"))
        from greenplum_cdc_spark.operators.stats import benford_digit_audit

        out = benford_digit_audit(spark, str(tmp_path)).collect()
        assert len(out) == 9
        by_d = {r["digit"]: r for r in out}
        assert by_d[5]["n"] == 100 and by_d[5]["observed_bp"] == 10000
        assert all(by_d[d]["n"] == 0 for d in range(1, 10) if d != 5)
        # TVD = (10000-791) + sum of the other digits' benford_bp
        assert by_d[1]["tvd_bp"] == (10000 - 791) + (9995 - 791)


class TestDpHistogramRelease:
    def test_mechanism_exact_and_domain_complete(self, spark, tmp_path):
        """C106: released = clamp(n + k(md5 u), 0) re-derived exactly in
        python from the stated threshold table; empty public-domain
        cells (source x lang present in the corpus but not jointly)
        appear as pure-noise rows."""
        import hashlib

        from greenplum_cdc_spark.operators.quality import (
            DP_NOISE_BOUNDS,
            dp_histogram_release,
        )

        docs = [
            (1, "aaa", "en", "web"),
            (2, "bbb", "en", "web"),
            (3, "ccc", "de", "books"),
            (4, "ddd", "en", "books"),
            (5, "eee", "de", "books"),
        ]  # (web, de) is an EMPTY public-domain cell
        spark.createDataFrame(
            [(i, t, l, s, len(t)) for i, t, l, s in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        rows = {
            (r["source"], r["lang"]): r
            for r in dp_histogram_release(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {
            ("web", "en"), ("web", "de"), ("books", "en"), ("books", "de"),
        }

        def noise(source, lang):
            h = hashlib.md5(f"dp-release-v1|{source}|{lang}".encode()).hexdigest()
            u = int(h[:15], 16)
            for k, b in DP_NOISE_BOUNDS:
                if u < b:
                    return k
            raise AssertionError("u out of range")

        true_n = {("web", "en"): 2, ("books", "de"): 2, ("books", "en"): 1,
                  ("web", "de"): 0}
        for cell, n in true_n.items():
            k = noise(*cell)
            r = rows[cell]
            assert r["noise"] == k, cell
            assert r["released_n"] == max(n + k, 0), cell

    def test_noise_distribution_matches_stated_pmf(self):
        """The threshold table itself: bin widths over [0, 2^60) must
        equal the truncated two-sided geometric pmf within 1 ulp of the
        exact rational (floor rounding), and the hash-driven empirical
        distribution over 20k labels must be close to it."""
        import hashlib
        from fractions import Fraction

        from greenplum_cdc_spark.operators.quality import DP_NOISE_BOUNDS

        T = 1 << 60
        pmf = {}
        for j in range(-8, 9):
            pmf[j] = Fraction(1, 3) / (2 ** abs(j)) if j else Fraction(1, 3)
        tail = Fraction(1, 3) / (2 ** 8)
        pmf[-8] += tail
        pmf[8] += tail
        lo = 0
        for k, hi in DP_NOISE_BOUNDS:
            width = hi - lo
            exact = pmf[k] * T
            assert abs(width - exact) < 2, k
            lo = hi
        assert lo == T
        # empirical check over hash-uniform labels
        cnt = {}
        for i in range(20000):
            u = int(hashlib.md5(f"lbl{i}".encode()).hexdigest()[:15], 16)
            k = next(k for k, b in DP_NOISE_BOUNDS if u < b)
            cnt[k] = cnt.get(k, 0) + 1
        assert abs(cnt[0] / 20000 - 1 / 3) < 0.02
        assert abs(cnt[1] / 20000 - 1 / 6) < 0.02
        assert abs(cnt[-1] / 20000 - 1 / 6) < 0.02


class TestStratifiedKfold:
    def test_balance_and_determinism(self, spark, sf_dir):
        """C107: per-stratum fold sizes differ by at most 1, fold sizes
        sum to the stratum size, the spread column equals max-min, and
        assignment is deterministic across invocations."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.text import _KFOLD_K, stratified_kfold

        rows = stratified_kfold(spark, sf_dir).collect()
        sizes = {
            r["source"]: r["n"]
            for r in load_table(spark, sf_dir, "documents")
            .groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        per_src = {}
        for r in rows:
            per_src.setdefault(r["source"], []).append(r)
        assert set(per_src) == set(sizes)
        for src, cells in per_src.items():
            assert sorted(c["fold"] for c in cells) == list(range(_KFOLD_K))
            ns = [c["n_docs"] for c in cells]
            assert sum(ns) == sizes[src]
            assert max(ns) - min(ns) <= 1
            assert all(c["spread"] == max(ns) - min(ns) for c in cells)
        again = stratified_kfold(spark, sf_dir).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    def test_tiny_stratum_leaves_empty_folds(self, spark, tmp_path):
        """A 3-doc stratum under K=5 shows two visible zero folds."""
        from greenplum_cdc_spark.operators.text import stratified_kfold

        spark.createDataFrame(
            [(i, f"doc {i}", "en", "tiny", 5) for i in range(3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = stratified_kfold(spark, str(tmp_path)).collect()
        assert len(out) == 5
        ns = sorted(r["n_docs"] for r in out)
        assert ns == [0, 0, 1, 1, 1]
        assert all(r["spread"] == 1 for r in out)


class TestLangidCalibration:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """C108: buckets, accuracies, mean confidences, and the ECE
        re-derived in python from the C8 classifier's own per-doc
        output (lang_id is already oracle-gated, so it is a valid
        truth source for the calibration layer)."""
        from greenplum_cdc_spark.operators.text import (
            _CALIB_NB,
            lang_id,
            langid_calibration,
        )

        per_doc = lang_id(spark, sf_dir).collect()
        cells = {}
        for r in per_doc:
            total = r["de_hits"] + r["en_hits"] + r["es_hits"] + r["fr_hits"]
            if total == 0:
                continue
            conf = max(r["de_hits"], r["en_hits"], r["es_hits"], r["fr_hits"]) * 10000 // total
            b = min(conf // (10000 // _CALIB_NB), _CALIB_NB - 1)
            n, ok, sc = cells.get(b, (0, 0, 0))
            cells[b] = (n + 1, ok + r["is_correct"], sc + conf)
        rows = {r["bucket"]: r for r in langid_calibration(spark, sf_dir).collect()}
        assert set(rows) == set(range(_CALIB_NB))
        num = den = 0
        for b in range(_CALIB_NB):
            r = rows[b]
            if b not in cells:
                assert r["n"] == 0
                assert r["acc_bp"] is None and r["avg_conf_bp"] is None
                assert r["gap_bp"] is None
                continue
            n, ok, sc = cells[b]
            acc, avg = ok * 10000 // n, sc // n
            assert (r["n"], r["acc_bp"], r["avg_conf_bp"]) == (n, acc, avg)
            assert r["gap_bp"] == acc - avg
            num += n * abs(acc - avg)
            den += n
        ece = num // den if den else 0
        assert all(r["ece_bp"] == ece for r in rows.values())
        assert 0 <= ece <= 10000


class TestTokenizerFertility:
    def test_rederived_from_gated_token_counts(self, spark, sf_dir):
        """C109: per-lang totals and all three ppm ratios re-derived
        from C10's already-gated per-doc token counts joined to the
        raw lang column."""
        import pyspark.sql.functions as F

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.text import (
            token_count,
            tokenizer_fertility,
        )

        langs = {
            r["doc_id"]: (r["lang"], r["n_chars_txt"])
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", F.length("text").alias("n_chars_txt"))
            .collect()
        }
        agg = {}
        t_ws = t_bpe = 0
        for r in token_count(spark, sf_dir).collect():
            lang, nch = langs[r["doc_id"]]
            d = agg.setdefault(lang, [0, 0, 0, 0])  # docs, ws, bpe, chars
            d[0] += 1
            d[1] += r["n_ws_tokens"]
            d[2] += r["n_bpe_tokens"]
            d[3] += nch
            t_ws += r["n_ws_tokens"]
            t_bpe += r["n_bpe_tokens"]
        rows = {r["lang"]: r for r in tokenizer_fertility(spark, sf_dir).collect()}
        assert set(rows) == set(agg)
        base = t_bpe * 1000000 // t_ws
        for lang, (nd, ws, bpe, ch) in agg.items():
            r = rows[lang]
            assert (r["n_docs"], r["ws_tokens"], r["bpe_tokens"], r["chars"]) == (
                nd, ws, bpe, ch,
            )
            fert = bpe * 1000000 // ws
            assert r["fertility_ppm"] == fert
            assert r["chars_per_bpe_ppm"] == ch * 1000000 // bpe
            assert r["premium_ppm"] == fert * 1000000 // base


class TestFdDiscovery:
    def test_exact_python_rederivation_and_known_verdicts(self, spark, sf_dir):
        """B104: every candidate's stats re-derived in python from the
        raw parquet; the key-based candidates must hold, and any
        lineitem.l_orderkey->l_suppkey violation must be visible."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import FD_CANDIDATES, fd_discovery

        rows = {r["fd"]: r for r in fd_discovery(spark, sf_dir).collect()}
        assert set(rows) == {c[0] for c in FD_CANDIDATES}
        for label, table, lhs, rhs in FD_CANDIDATES:
            data = load_table(spark, sf_dir, table).select(lhs, rhs).collect()
            groups = {}
            for r in data:
                groups.setdefault(r[lhs], set()).add(r[rhs])
            n_groups = len(groups)
            n_viol = sum(1 for v in groups.values() if len(v) > 1)
            r = rows[label]
            assert r["n_groups"] == n_groups, label
            assert r["n_violating"] == n_viol, label
            assert r["violation_bp"] == n_viol * 10000 // n_groups, label
            assert r["max_distinct_rhs"] == max(len(v) for v in groups.values())
            assert r["holds"] == (n_viol == 0), label
        # structural truths of the schema
        assert rows["orders.o_orderkey->o_custkey"]["holds"]
        assert rows["customer.c_custkey->c_nationkey"]["holds"]
        assert rows["nation.n_nationkey->n_regionkey"]["holds"]


class TestWinsorizedStats:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B105: cutoffs (nearest-rank), clamp counts, and all three
        means re-derived exactly in python from the raw parquet."""
        import math

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import (
            _WINSOR_HI_PCT,
            _WINSOR_LO_PCT,
            winsorized_stats,
        )

        raw = load_table(spark, sf_dir, "events").select(
            "event_type", "value"
        ).collect()
        by_type = {}
        for r in raw:
            by_type.setdefault(r["event_type"], []).append(
                math.floor(r["value"] * 100)
            )
        rows = {r["event_type"]: r for r in winsorized_stats(spark, sf_dir).collect()}
        assert set(rows) == set(by_type)
        for et, vals in by_type.items():
            vals.sort()
            n = len(vals)
            lo = vals[(n * _WINSOR_LO_PCT + 99) // 100 - 1]
            hi = vals[(n * _WINSOR_HI_PCT + 99) // 100 - 1]
            r = rows[et]
            assert (r["n"], r["lo_cents"], r["hi_cents"]) == (n, lo, hi), et
            assert r["n_clamped_low"] == sum(1 for v in vals if v < lo)
            assert r["n_clamped_high"] == sum(1 for v in vals if v > hi)
            q = sum(v for v in vals)
            assert r["raw_mean_cents"] == q // n
            wsum = sum(max(min(v, hi), lo) for v in vals)
            assert r["winsor_mean_cents"] == wsum // n
            kept = [v for v in vals if lo <= v <= hi]
            assert r["trimmed_mean_cents"] == sum(kept) // len(kept)
            # robustness direction: winsorized/trimmed between cutoffs
            assert lo <= r["winsor_mean_cents"] <= hi
            assert lo <= r["trimmed_mean_cents"] <= hi


class TestCollocationLift:
    def test_crafted_corpus_exact(self, spark, tmp_path):
        """C110: a corpus with one planted strong collocation ('new
        york' always adjacent), a frequent-but-independent pair, and
        below-support pairs; output re-derived exactly in python."""
        from greenplum_cdc_spark.operators.text import (
            _COLLOC_MIN_N,
            collocation_lift,
        )

        # 'new york' x6 (always together), 'the cat' scattered, filler
        docs = [
            (1, "new york is big and the cat sat here", "en", "web"),
            (2, "i love new york and new york loves me", "en", "web"),
            (3, "the dog saw the cat near new york today", "en", "web"),
            (4, "new york winters are cold the cat agrees", "en", "web"),
            (5, "the cat naps while the dog runs around", "en", "web"),
            (6, "rare pair rare pair rare pair only thrice", "en", "web"),
        ]
        spark.createDataFrame(
            [(i, t, l, s, len(t)) for i, t, l, s in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        out = collocation_lift(spark, str(tmp_path)).collect()
        # python truth
        import math

        uni, bg = {}, {}
        n_tok = n_bg = 0
        for _i, t, _l, _s in docs:
            ws = [w for w in t.split(" ") if w]
            n_tok += len(ws)
            n_bg += max(len(ws) - 1, 0)
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                bg[(a, b)] = bg.get((a, b), 0) + 1
        want = []
        for (a, b), nxy in bg.items():
            if nxy < _COLLOC_MIN_N:
                continue
            lift = math.floor(nxy * n_tok * n_tok * 1e6 / (n_bg * uni[a] * uni[b]))
            want.append((a, b, nxy, uni[a], uni[b], lift))
        want.sort(key=lambda x: (-x[5], x[0], x[1]))
        got = [
            (r["w1"], r["w2"], r["n_xy"], r["n_w1"], r["n_w2"], r["lift_ppm"])
            for r in out
        ]
        assert got == want[:50]
        # the planted collocation is found and leads
        assert got[0][:2] == ("new", "york")
        # below-support pair excluded despite perfect adhesion
        assert all((w1, w2) != ("rare", "pair") for w1, w2, *_ in got)

    def test_topk_and_support_on_sf(self, spark, sf_dir):
        """On real sf data: at most K rows, all above min support, and
        sorted by (lift desc, pair asc)."""
        from greenplum_cdc_spark.operators.text import (
            _COLLOC_MIN_N,
            _COLLOC_TOPK,
            collocation_lift,
        )

        rows = collocation_lift(spark, sf_dir).collect()
        assert 0 < len(rows) <= _COLLOC_TOPK
        assert all(r["n_xy"] >= _COLLOC_MIN_N for r in rows)
        keys = [(-r["lift_ppm"], r["w1"], r["w2"]) for r in rows]
        assert keys == sorted(keys)


class TestCountAutocorr:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B106: the gap-filled grid, all five sufficient statistics,
        and the floored ppm correlation re-derived in python."""
        import math

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import (
            _ACF_MAX_LAG,
            count_autocorr,
        )

        ev = (
            load_table(spark, sf_dir, "events")
            .selectExpr("event_type", "unix_micros(ts) div 86400000000 as day")
            .collect()
        )
        daily = {}
        for r in ev:
            k = (r["event_type"], r["day"])
            daily[k] = daily.get(k, 0) + 1
        types = {et for et, _d in daily}
        grids = {}
        for et in types:
            days = [d for t, d in daily if t == et]
            grids[et] = [
                daily.get((et, d), 0) for d in range(min(days), max(days) + 1)
            ]
        rows = {
            (r["event_type"], r["lag"]): r
            for r in count_autocorr(spark, sf_dir).collect()
        }
        for et, g in grids.items():
            for lag in range(1, _ACF_MAX_LAG + 1):
                xs, ys = g[:-lag] if lag else g, g[lag:]
                xs = g[: len(g) - lag]
                n = len(xs)
                r = rows[(et, lag)]
                assert r["n_pairs"] == n, (et, lag)
                sx, sy = sum(xs), sum(ys)
                sxy = sum(a * b for a, b in zip(xs, ys))
                sxx = sum(a * a for a in xs)
                syy = sum(b * b for b in ys)
                vx, vy = n * sxx - sx * sx, n * syy - sy * sy
                if vx > 0 and vy > 0:
                    want = math.floor(
                        (n * sxy - sx * sy) * 1000000.0
                        / (math.sqrt(vx) * math.sqrt(vy))
                    )
                    assert r["r_ppm"] == want, (et, lag)
                else:
                    assert r["r_ppm"] is None

    def test_planted_weekly_cycle_peaks_at_lag7(self, spark, tmp_path):
        """A planted 7-day cycle must produce r(7) ~ 1e6 and r(1) far
        below it; a silent day inside the span must be treated as a
        zero observation (gap-fill), which the cycle relies on."""
        import datetime

        rows = []
        eid = 0
        base = datetime.datetime(2024, 1, 1)
        for day in range(56):
            # weekly burst: 9 events on day%7==0, 1 otherwise; day 10 silent
            n = 9 if day % 7 == 0 else (0 if day == 10 else 1)
            for _ in range(n):
                eid += 1
                rows.append(
                    (eid, base + datetime.timedelta(days=day, hours=1),
                     1, "burst", 1.0, "{}")
                )
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        from greenplum_cdc_spark.operators.timeseries import count_autocorr

        out = {r["lag"]: r for r in count_autocorr(spark, str(tmp_path)).collect()}
        assert out[7]["r_ppm"] > 900000
        assert out[1]["r_ppm"] < out[7]["r_ppm"] - 500000


class TestAbTestReadout:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B107: assignment, means, and the Welch z re-derived in
        python with the same double-expression order."""
        import hashlib
        import math

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import ab_test_readout

        raw = load_table(spark, sf_dir, "events").select(
            "event_type", "user_id", "value"
        ).collect()
        stats = {}
        for r in raw:
            u = int(
                hashlib.md5(f"ab-v1|{r['user_id']}".encode()).hexdigest()[:15], 16
            )
            arm = u % 2
            v = math.floor(r["value"] * 100)
            k = (r["event_type"], arm)
            n, sx, sxx = stats.get(k, (0, 0, 0))
            stats[k] = (n + 1, sx + v, sxx + v * v)
        rows = {r["event_type"]: r for r in ab_test_readout(spark, sf_dir).collect()}
        types = {et for et, _a in stats}
        assert set(rows) == types
        for et in types:
            na, sxa, sxxa = stats[(et, 0)]
            nb, sxb, sxxb = stats[(et, 1)]
            r = rows[et]
            assert (r["n_a"], r["n_b"]) == (na, nb)
            assert r["mean_a_cents"] == sxa // na
            assert r["mean_b_cents"] == sxb // nb
            assert r["diff_cents"] == sxa // na - sxb // nb
            va = (sxxa - float(sxa) * float(sxa) / na) / (na - 1.0)
            vb = (sxxb - float(sxb) * float(sxb) / nb) / (nb - 1.0)
            want = math.floor(
                (sxa / na - sxb / nb) * 1000000.0 / math.sqrt(va / na + vb / nb)
            )
            assert r["z_ppm"] == want, et
            assert r["significant"] == (abs(want) >= 1960000)

    def test_planted_effect_detected(self, spark, tmp_path):
        """A corpus where arm membership shifts the value by a large
        offset must read out significant with the right sign."""
        import datetime
        import hashlib

        rows = []
        base = datetime.datetime(2024, 3, 1)
        eid = 0
        for uid in range(200):
            u = int(hashlib.md5(f"ab-v1|{uid}".encode()).hexdigest()[:15], 16)
            arm = u % 2
            for j in range(3):
                eid += 1
                # arm 0 pays 10.00 + jitter, arm 1 pays 5.00 + jitter
                val = (10.0 if arm == 0 else 5.0) + (eid % 7) * 0.01
                rows.append((eid, base, uid, "purchase", val, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        from greenplum_cdc_spark.operators.stats import ab_test_readout

        out = ab_test_readout(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["diff_cents"] > 400
        assert r["z_ppm"] > 1960000 and r["significant"]


class TestCompressionAdvisor:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B108: every audited column's byte accounting re-derived in
        python; enums must recommend dictionary, the high-entropy
        props payload must not."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import (
            COMPRESSION_COLUMNS,
            compression_advisor,
        )

        rows = {r["column_ref"]: r for r in compression_advisor(spark, sf_dir).collect()}
        assert set(rows) == {f"{t}.{c}" for t, c in COMPRESSION_COLUMNS}
        for table, col in COMPRESSION_COLUMNS:
            vals = [
                r[col]
                for r in load_table(spark, sf_dir, table).select(col).collect()
            ]
            n = len(vals)
            uniq = set(vals)
            ndv = len(uniq)
            raw = sum(len(v.encode()) for v in vals)
            dict_table = sum(len(v.encode()) for v in uniq)
            width = 1 if ndv <= 256 else (2 if ndv <= 65536 else 4)
            dict_bytes = dict_table + n * width
            r = rows[f"{table}.{col}"]
            assert (r["n"], r["ndv"], r["raw_bytes"], r["dict_bytes"]) == (
                n, ndv, raw, dict_bytes,
            ), (table, col)
            assert r["savings_bp"] == (raw - dict_bytes) * 10000 // raw
            assert r["use_dictionary"] == (dict_bytes < raw)
        assert rows["events.event_type"]["use_dictionary"]
        assert rows["orders.o_orderpriority"]["use_dictionary"]

    def test_high_entropy_column_loses(self, spark, tmp_path):
        """A column of unique payloads must read 'do not dictionary':
        the dict table repeats every byte and adds n index bytes."""
        from greenplum_cdc_spark.operators.stats import compression_advisor

        import datetime

        spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, 1), i, "purchase-completed",
                 1.0, f"unique-payload-{i:08d}")
                for i in range(500)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        for t in ("orders", "customer", "part", "lineitem"):
            src = f"/root/testdata/sf0.001/{t}.parquet"
            spark.read.parquet(src).write.parquet(str(tmp_path / f"{t}.parquet"))
        rows = {
            r["column_ref"]: r
            for r in compression_advisor(spark, str(tmp_path)).collect()
        }
        assert not rows["events.props"]["use_dictionary"]
        assert rows["events.props"]["savings_bp"] < 0
        assert rows["events.event_type"]["use_dictionary"]  # constant col


class TestActivityGini:
    def test_exact_python_rederivation_and_bounds(self, spark, sf_dir):
        """B109: Gini and top-decile share re-derived in python via the
        same sorted-rank identity; 0 <= G < 1e6 and the decile share
        bounds respected."""
        import math

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.stats import activity_gini

        raw = load_table(spark, sf_dir, "events").select(
            "event_type", "user_id"
        ).collect()
        cnt = {}
        for r in raw:
            k = (r["event_type"], r["user_id"])
            cnt[k] = cnt.get(k, 0) + 1
        per_type = {}
        for (et, uid), c in cnt.items():
            per_type.setdefault(et, []).append((c, uid))
        rows = {r["event_type"]: r for r in activity_gini(spark, sf_dir).collect()}
        assert set(rows) == set(per_type)
        for et, pairs in per_type.items():
            pairs.sort()  # ascending (c, user_id) = the stated rank order
            n = len(pairs)
            s = sum(c for c, _u in pairs)
            sic = sum((i + 1) * c for i, (c, _u) in enumerate(pairs))
            gini = math.floor((2 * sic - (n + 1) * s) * 1000000.0 / (n * s))
            k = (n + 9) // 10
            top = sum(c for c, _u in pairs[n - k:])
            r = rows[et]
            assert (r["n_users"], r["total_events"]) == (n, s), et
            assert r["gini_ppm"] == gini, et
            assert r["top_decile_bp"] == top * 10000 // s, et
            assert 0 <= r["gini_ppm"] < 1000000
            # top decile holds at least its uniform share
            assert r["top_decile_bp"] >= k * 10000 // n - 1

    def test_extreme_concentration(self, spark, tmp_path):
        """One user generating everything plus 9 one-event users must
        push Gini near its n-point maximum and the decile share high."""
        import datetime

        rows = []
        eid = 0
        for _ in range(991):
            eid += 1
            rows.append((eid, datetime.datetime(2024, 1, 1), 1, "hot", 1.0, "{}"))
        for uid in range(2, 11):
            eid += 1
            rows.append((eid, datetime.datetime(2024, 1, 1), uid, "hot", 1.0, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        from greenplum_cdc_spark.operators.stats import activity_gini

        out = activity_gini(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_users"] == 10 and r["total_events"] == 1000
        assert r["gini_ppm"] > 850000
        assert r["top_decile_bp"] == 9910  # the one hot user IS the decile


class TestFunnelTimeToConvert:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B110: converter sets, nearest-rank p50/p90, and means
        re-derived in python from B36's exact earliest-stage rule."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.timeseries import (
            funnel_time_to_convert,
        )

        raw = load_table(spark, sf_dir, "events").selectExpr(
            "user_id", "event_type", "unix_micros(ts) AS t"
        ).collect()
        first = {}
        for r in raw:
            if r["event_type"] in ("view", "click", "purchase"):
                k = (r["user_id"], r["event_type"])
                first[k] = min(first.get(k, r["t"]), r["t"])
        users = {u for u, _s in first}
        d1, d2 = [], []
        for u in users:
            tv = first.get((u, "view"))
            tc = first.get((u, "click"))
            tp = first.get((u, "purchase"))
            if tv is not None and tc is not None and tc > tv:
                d1.append(tc - tv)
                if tp is not None and tp > tc:
                    d2.append(tp - tc)
        rows = {
            r["transition"]: r
            for r in funnel_time_to_convert(spark, sf_dir).collect()
        }
        for label, ds in (("view->click", d1), ("click->purchase", d2)):
            ds.sort()
            n = len(ds)
            r = rows[label]
            assert r["n_converters"] == n, label
            assert r["p50_s"] == ds[(n + 1) // 2 - 1] // 1000000
            assert r["p90_s"] == ds[(n * 9 + 9) // 10 - 1] // 1000000
            assert r["mean_s"] == sum(ds) // n // 1000000
            assert r["p50_s"] <= r["p90_s"]


class TestMediaAudioFeatures:
    def test_real_wav_vs_generative_truth(self, spark):
        """C111: features computed from DECODED RIFF/WAVE bytes must
        equal the closed-form generative signal's python-derived
        integers — zero crossings, energy, frames, loudness."""
        import numpy as np

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.operators.multimodal import (
            _AF_FRAME,
            _AF_LOUD_T,
            media_audio_features,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r["doc_id"]: r for r in media_audio_features(spark, sf).collect()}
        docs = {
            r["doc_id"]: r["n_chars"]
            for r in load_table(spark, sf, "documents")
            .select("doc_id", "n_chars").collect()
            if r["doc_id"] % 3 == 1
        }
        assert set(rows) == set(docs)
        for doc_id in list(docs)[:20]:  # spot-verify a prefix; all decoded
            n = docs[doc_id] * 16
            s = (doc_id * 7 + np.arange(n, dtype=np.int64) * 13) % 4096 - 2048
            neg = s < 0
            zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
            r = rows[doc_id]
            assert r["n_samples"] == n
            assert r["zero_crossings"] == zc
            assert r["total_energy"] == int(np.sum(s * s))
            assert r["mean_abs"] == int(np.sum(np.abs(s)) // n)
            n_frames = (n + _AF_FRAME - 1) // _AF_FRAME
            assert r["n_frames"] == n_frames
            loud = sum(
                1
                for f in range(n_frames)
                if int(
                    np.sum(s[f * _AF_FRAME:(f + 1) * _AF_FRAME] ** 2)
                ) >= _AF_LOUD_T
            )
            assert r["loud_frames"] == loud

    def test_corrupt_payload_fails_loud(self, spark):
        """A payload that is not RIFF/WAVE must raise, not return junk
        statistics (silent decode corruption poisons a whole corpus)."""
        import pandas as pd
        import pytest

        from greenplum_cdc_spark.operators import codecs

        with pytest.raises(ValueError, match="RIFF"):
            codecs.decode_wav(b"not a wave file at all........")
        del pd


class TestCdcWriteConflicts:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B111: conflict pairs, write counts, and the final-race
        winner re-derived by brute force (no banding) — proving the
        banded join is lossless."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.cdc_queries import (
            _CONFLICT_W_US,
            cdc_write_conflicts,
        )

        ev = load_table(spark, sf_dir, "events").selectExpr(
            "user_id AS pk", "unix_micros(ts) AS t", "event_id AS seq"
        ).collect()
        a, b = {}, {}
        for r in ev:
            (a if r["seq"] % 2 == 0 else b).setdefault(r["pk"], []).append(
                (r["t"], r["seq"])
            )
        want = {}
        for pk in set(a) & set(b):
            pairs = [
                (ta, sa, tb, sb)
                for ta, sa in a[pk]
                for tb, sb in b[pk]
                if abs(ta - tb) <= _CONFLICT_W_US
            ]
            if not pairs:
                continue
            winners = [
                (ta, sa, "a") if (ta, sa) > (tb, sb) else (tb, sb, "b")
                for ta, sa, tb, sb in pairs
            ]
            w_ts, w_seq, w_src = max(winners)
            want[pk] = (
                len(pairs),
                len({sa for _t, sa, _t2, _s2 in pairs}),
                len({sb for _t, _s, _t2, sb in pairs}),
                max(max(ta, tb) for ta, _s, tb, _s2 in pairs),
                w_src, w_seq,
            )
        rows = {r["pk"]: r for r in cdc_write_conflicts(spark, sf_dir).collect()}
        assert set(rows) == set(want)
        for pk, (np_, na, nb, last, src, seq) in want.items():
            r = rows[pk]
            assert (r["n_pairs"], r["n_a_writes"], r["n_b_writes"]) == (
                np_, na, nb,
            ), pk
            assert r["last_conflict_us"] == last
            assert (r["winner_source"], r["winner_seq"]) == (src, seq), pk

    def test_band_edges_exact(self, spark, tmp_path):
        """Pairs exactly at |delta| = W are IN; one microsecond past is
        OUT; a cross-bucket pair (delta < W but straddling a bucket
        boundary) must still be found — the adjacency fan-out's job."""
        import datetime

        from greenplum_cdc_spark.plans.cdc_queries import (
            _CONFLICT_W_US,
            cdc_write_conflicts,
        )

        base = datetime.datetime(2024, 1, 1)

        def at(us):
            return base + datetime.timedelta(microseconds=us)

        W = _CONFLICT_W_US
        rows = [
            # pk 1: exactly W apart (in), straddles buckets
            (2, at(W - 1), 1, "click", 1.0, "{}"),      # a (seq even)
            (3, at(2 * W - 1), 1, "click", 1.0, "{}"),  # b (seq odd)
            # pk 2: W + 1 apart (out)
            (4, at(0), 2, "click", 1.0, "{}"),
            (5, at(W + 1), 2, "click", 1.0, "{}"),
            # pk 3: same bucket, 10us apart (in); b is later -> b wins
            (6, at(100), 3, "click", 1.0, "{}"),
            (7, at(110), 3, "click", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        out = {r["pk"]: r for r in cdc_write_conflicts(spark, str(tmp_path)).collect()}
        assert set(out) == {1, 3}
        assert out[1]["n_pairs"] == 1
        assert out[1]["winner_source"] == "b"  # 2W-1 > W-1
        assert out[3]["n_pairs"] == 1 and out[3]["winner_source"] == "b"


class TestAbTestScopeContract:
    def test_one_armed_type_absent(self, spark, tmp_path):
        """B107 scope: a type whose users all hash to one arm has no
        comparison and must be ABSENT, not a NULL-z row."""
        import datetime
        import hashlib

        # find a user id for each arm
        def arm(uid):
            return int(
                hashlib.md5(f"ab-v1|{uid}".encode()).hexdigest()[:15], 16
            ) % 2

        a_user = next(u for u in range(100) if arm(u) == 0)
        b_user = next(u for u in range(100) if arm(u) == 1)
        rows = []
        for i in range(4):
            rows.append((i, datetime.datetime(2024, 1, 1), a_user,
                         "one_armed", 1.0 + i, "{}"))
        for i in range(4, 8):
            rows.append((i, datetime.datetime(2024, 1, 1),
                         a_user if i % 2 else b_user, "balanced",
                         2.0 + i, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))
        from greenplum_cdc_spark.operators.stats import ab_test_readout

        out = {r["event_type"] for r in ab_test_readout(spark, str(tmp_path)).collect()}
        assert out == {"balanced"}


class TestRevenueWaterfall:
    def test_waterfall_identities_and_python_truth(self, spark, sf_dir):
        """B112: the decimal identities gross - discount = net and
        net + tax = charge hold to the cent at scale 4, and every cell
        matches an exact-Fraction python re-derivation."""
        from fractions import Fraction

        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import revenue_waterfall

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
        ).collect()
        years = {
            r["o_orderkey"]: r["year"]
            for r in load_table(spark, sf_dir, "orders")
            .selectExpr("o_orderkey", "year(o_orderdate) AS year").collect()
        }

        def dec4(x):
            # CAST(double AS DECIMAL(12,4)): round half-up at scale 4
            q = Fraction(x).limit_denominator(10**12) * 10000
            from decimal import Decimal, ROUND_HALF_UP

            return Fraction(
                int(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                              ROUND_HALF_UP) * 10000), 10000
            )

        agg = {}
        for r in li:
            y = years[r["l_orderkey"]]
            px = dec4(r["l_extendedprice"])
            d = dec4(r["l_discount"])
            t = dec4(r["l_tax"])
            g, da, net, ta, ch = agg.get(y, (0, 0, 0, 0, 0))
            agg[y] = (
                g + px, da + px * d, net + px * (1 - d),
                ta + px * (1 - d) * t, ch + px * (1 - d) * (1 + t),
            )
        rows = {r["order_year"]: r for r in revenue_waterfall(spark, sf_dir).collect()}
        assert set(rows) == set(agg)

        def r4(f):
            # ROUND(decimal, 4) half-up, exact
            from decimal import Decimal, ROUND_HALF_UP

            return float(
                (Decimal(f.numerator) / Decimal(f.denominator)).quantize(
                    Decimal("0.0001"), ROUND_HALF_UP
                )
            )

        import math

        for y, (g, da, net, ta, ch) in agg.items():
            r = rows[y]
            assert r["gross"] == r4(g), y
            assert r["discount_amount"] == r4(da), y
            assert r["net_after_discount"] == r4(net), y
            assert r["tax_amount"] == r4(ta), y
            assert r["final_charge"] == r4(ch), y
            # exact identities in the rational domain
            assert g - da == net
            assert net + ta == ch
            assert r["discount_load_bp"] == math.floor(r4(da) * 10000 / r4(g))
            assert r["tax_load_bp"] == math.floor(r4(ta) * 10000 / r4(g))


class TestShippingDelaySla:
    def test_exact_python_rederivation(self, spark, sf_dir):
        """B113: delays, nearest-rank percentiles, mean, and breach
        share re-derived in python from the raw parquet."""
        from greenplum_cdc_spark.io import load_table
        from greenplum_cdc_spark.plans.tpch import (
            _SLA_BREACH_DAYS,
            shipping_delay_sla,
        )

        orders = {
            r["o_orderkey"]: (r["o_orderpriority"], r["t"])
            for r in load_table(spark, sf_dir, "orders")
            .selectExpr("o_orderkey", "o_orderpriority",
                        "unix_micros(o_orderdate) AS t").collect()
        }
        delays = {}
        for r in load_table(spark, sf_dir, "lineitem").selectExpr(
            "l_orderkey", "unix_micros(l_shipdate) AS t"
        ).collect():
            pri, ot = orders[r["l_orderkey"]]
            d = (r["t"] - ot) // 86400000000
            delays.setdefault(pri, []).append(d)
        rows = {r["o_orderpriority"]: r for r in shipping_delay_sla(spark, sf_dir).collect()}
        assert set(rows) == set(delays)
        for pri, ds in delays.items():
            ds.sort()
            n = len(ds)
            r = rows[pri]
            assert r["n_lineitems"] == n
            assert r["p50_days"] == ds[(n + 1) // 2 - 1]
            assert r["p90_days"] == ds[(n * 9 + 9) // 10 - 1]
            assert r["max_days"] == ds[-1]
            assert r["mean_days"] == sum(ds) // n
            breach = sum(1 for d in ds if d > _SLA_BREACH_DAYS)
            assert r["breach_bp"] == breach * 10000 // n
            assert r["p50_days"] <= r["p90_days"] <= r["max_days"]
