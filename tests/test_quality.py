from __future__ import annotations

import pyspark.sql.functions as F

from greenplum_cdc_spark.operators import quality, similarity
from greenplum_cdc_spark.plans import cdc_queries, tpch

SF = "/root/testdata/sf0.001"


def test_repetition_bounds(spark):
    rows = quality.doc_repetition(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_word_frac"] < 1.0
        assert 0.0 < r["top_bigram_frac"] <= 1.0
        assert r["n_distinct"] <= r["n_words"]
        assert r["is_repetitive"] in (0, 1)


def test_repetition_flags_constructed_doc(spark):
    df = spark.createDataFrame(
        [(1, "spam ham " * 40 + "end"), (2, " ".join(f"w{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("tmp_docs")
    # run the same signal expressions directly on a controlled corpus
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            (1 - F.size(F.array_distinct(toks)) / F.size(toks)).alias("dup"),
        ).collect()
    }
    assert out[1]["dup"] > quality.REP_DUP_WORD  # 81 words, 3 distinct
    assert out[2]["dup"] == 0.0


def test_pii_scrub_redacts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b@example.com or call 5551234567 now")],
        "doc_id long, text string",
    )
    scrubbed = df.select(
        F.regexp_replace(
            F.regexp_replace("text", F.lit(quality.EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(quality.LONGNUM_RE),
            F.lit("<NUM>"),
        ).alias("t")
    ).collect()[0]["t"]
    assert scrubbed == "mail me at <EMAIL> or call <NUM> now"
    # corpus surface: counts are non-negative, hash present
    rows = quality.pii_scrub(spark, SF).collect()
    assert all(r["scrub_hash"] and r["n_emails"] >= 0 for r in rows)


def test_bm25_scores_ranked(spark):
    rows = quality.bm25_rank(spark, SF).collect()
    assert rows
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms_hit"] <= len(quality.BM25_TERMS) for r in rows)


def test_contamination_partitions_corpus(spark):
    rows = quality.contamination_check(spark, SF).collect()
    for r in rows:
        assert r["doc_id"] % quality.CONTAM_MOD != 0  # benchmark docs excluded
        assert 0 < r["n_contaminated"] <= r["n_ngrams"]
        assert (r["contaminated_frac"] >= quality.CONTAM_FRAC) == bool(
            r["flag_remove"]
        )


def test_knn_ivf_within_cell(spark):
    rows = similarity.knn_ivf(spark, SF).collect()
    assert rows
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r)
    for q, rs in per_query.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len({r["cell"] for r in rs}) == 1  # nprobe=1: one cell per query


def test_knn_ivf_recall_vs_bruteforce(spark):
    """IVF (nprobe=1) should recover a decent share of true top-k."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_cosine_bruteforce(spark, SF).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_ivf(spark, SF).collect()
    }
    assert len(truth & ivf) / len(truth) >= 0.2


def test_active_users_window_superset(spark):
    rows = timeseries_rows = None
    from greenplum_cdc_spark.operators import timeseries

    rows = timeseries.active_users_rolling(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau_7d"]
        assert 0 < r["stickiness_ppm"] <= 1_000_000


def test_basket_pairs_ordered_support(spark):
    rows = tpch.basket_part_pairs(spark, SF).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_orders"] >= tpch.BASKET_MIN_SUP


def test_cdc_dlq_routes_corrupted(spark):
    rows = cdc_queries.cdc_dlq(spark, SF).collect()
    assert rows
    for r in rows:
        expect = "dlq" if r["offset"] % cdc_queries._DLQ_MOD == 0 else "ok"
        assert r["route"] == expect
    assert any(r["route"] == "dlq" for r in rows)


def test_gopher_filter_rules_consistent(spark, sf_dir):
    from greenplum_cdc_spark.operators.quality import (
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        gopher_filter,
    )

    rows = gopher_filter(spark, sf_dir).collect()
    assert rows, "corpus should produce signal rows"
    for r in rows:
        if r["keep"]:
            assert r["drop_reason"] == "pass"
            assert r["n_words"] >= GOPHER_MIN_WORDS
            assert r["n_stopwords"] >= GOPHER_MIN_STOPWORDS
            # mean word length within [2,10] via cross-multiplication
            assert 2 * r["n_words"] <= r["total_chars"] <= 10 * r["n_words"]
        else:
            assert r["drop_reason"] != "pass"


def test_embedding_quantize_bounds(spark, sf_dir):
    from greenplum_cdc_spark.operators.similarity import embedding_quantize

    rows = embedding_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["q_min"] <= r["q_max"] <= 255
        assert r["sq_err"] >= 0
