from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from greenplum_cdc_spark.operators import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


def test_dedup_exact_covers_all_docs(spark):
    out = dedup.dedup_exact(spark, SF)
    from greenplum_cdc_spark.io import load_table

    assert out.agg(F.sum("n_copies")).collect()[0][0] == load_table(
        spark, SF, "documents"
    ).count()


def test_minhash_pairs_valid(spark):
    rows = dedup.dedup_minhash_lsh(spark, SF).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 1 <= r["n_bands"] <= dedup.N_BANDS


def test_minhash_finds_jaccard_pairs(spark):
    """High-Jaccard pairs should mostly surface as LSH candidates."""
    jac = {(r["doc_a"], r["doc_b"]) for r in dedup.dedup_ngram_jaccard(spark, SF).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in dedup.dedup_minhash_lsh(spark, SF).collect()}
    strong = {p for p in jac}
    if strong:
        assert len(strong & lsh) / len(strong) >= 0.5


def test_simhash_shape_and_similarity(spark):
    rows = dedup.dedup_simhash(spark, SF).collect()
    assert all(len(r["simhash"]) == 64 and set(r["simhash"]) <= {"0", "1"} for r in rows)


def test_jaccard_threshold(spark):
    rows = dedup.dedup_ngram_jaccard(spark, SF).collect()
    assert all(r["jaccard"] >= dedup.JACCARD_THRESHOLD for r in rows)


def test_knn_topk(spark):
    rows = similarity.knn_cosine_bruteforce(spark, SF).collect()
    from collections import Counter

    per = Counter(r["query_id"] for r in rows)
    assert all(v <= similarity.TOPK for v in per.values())
    for r in rows:
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        assert r["neighbor_id"] != r["query_id"]


def test_knn_lsh_buckets(spark):
    rows = similarity.knn_lsh(spark, SF).collect()
    assert all(len(r["bucket"]) == similarity.N_PLANES for r in rows)
    from collections import Counter

    sizes = Counter(r["bucket"] for r in rows)
    for r in rows:
        assert r["n_in_bucket"] == sizes[r["bucket"]]


def test_lang_id_deterministic_argmax(spark):
    rows = text.lang_id(spark, SF).collect()
    assert all(r["pred_lang"] in ("de", "en", "es", "fr", "und") for r in rows)


def test_quality_score_bounds(spark):
    rows = text.quality_score(spark, SF).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert all(0.0 <= r["stop_ratio"] <= 1.0 for r in rows)


def test_token_count_consistency(spark):
    rows = text.token_count(spark, SF).collect()
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"] > 0


def test_multimodal_features_via_arrow(spark):
    media = multimodal.media_table(spark, SF)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == media.count()
    for f in feats[:10]:
        assert f["byte_len"] > 0
        assert len(f["checksum"]) == 32
        assert 0 < f["mean_byte"] < 256


def test_multimodal_real_decode_round_trip(spark):
    """Real tier: encoded BMP/WAV/RVID payloads decode back to the
    generative formula's exact statistics."""
    media = multimodal.media_table_encoded(spark, SF)
    feats = {r["doc_id"]: r for r in multimodal.decode_features(media).collect()}
    assert len(feats) == 500
    for doc_id, r in list(feats.items())[:30]:
        if r["media_type"] == "image":
            n = r["width"] * r["height"] * 3
            assert r["n_values"] == n
            assert r["sum_value"] == sum((doc_id + i) % 256 for i in range(n))
        elif r["media_type"] == "audio":
            assert r["sample_rate"] == 8000
            assert r["payload_bytes"] == 44 + 2 * r["n_values"]
        else:
            assert r["n_sampled"] == -(-r["n_frames"] // 4)
            assert r["n_values"] == r["n_sampled"] * 144


def test_multimodal_resize_images_real(spark):
    """Real pixel resize: decode -> nearest-neighbor -> re-encode -> decode."""
    media = multimodal.media_table_encoded(spark, SF)
    rows = multimodal.resize_images(media, max_w=32, max_h=32).collect()
    assert rows
    for r in rows[:20]:
        assert r["out_width"] <= 32 and r["out_height"] <= 32
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        # never upscale; aspect preserved within integer truncation
        if r["width"] <= 32 and r["height"] <= 32:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        assert r["resized_bytes"] > 54


def test_codecs_round_trip_and_errors():
    import numpy as np

    from greenplum_cdc_spark.operators import codecs

    rng = np.random.default_rng(7)
    for w, h in [(5, 3), (8, 6), (64, 48), (1, 1)]:  # w=5 exercises row padding
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(pix)), pix)
    s = rng.integers(-2048, 2048, 1000).astype(np.int16)
    rate, out = codecs.decode_wav(codecs.encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(out, s)
    frames = [
        codecs.encode_bmp(rng.integers(0, 256, (6, 8, 3), dtype=np.uint8))
        for _ in range(9)
    ]
    data = codecs.encode_rawvideo(frames)
    sampled = codecs.sample_rawvideo(data, 4)
    assert [i for i, _ in sampled] == [0, 4, 8]
    assert all(fb == frames[i] for i, fb in sampled)
    with pytest.raises(ValueError):
        codecs.decode_bmp(codecs.encode_bmp(pix)[:-10])
    with pytest.raises(ValueError):
        codecs.sample_rawvideo(data[:-3], 4)
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"XX" + b"\x00" * 100)


def test_frame_sample_counts(spark):
    media = multimodal.media_table(spark, SF)
    out = multimodal.frame_sample(media, every_k=4)
    joined = (
        out.groupBy("doc_id", "n_frames").agg(F.count("*").alias("n"))
        .withColumn("expected", F.ceil(F.col("n_frames") / 4))
        .collect()
    )
    assert joined and all(r["n"] == r["expected"] for r in joined)


def test_running_total_monotone_per_user(spark, sf_dir):
    from greenplum_cdc_spark.operators import timeseries

    rows = timeseries.running_total_by_user(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        prev = by_user.get(r["user_id"], 0)
        assert r["running_n"] == prev + 1
        by_user[r["user_id"]] = r["running_n"]


def test_moving_avg_window_bounds(spark, sf_dir):
    from greenplum_cdc_spark.operators import timeseries

    rows = timeseries.moving_avg_daily(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r["day"])
    # first day's moving avg (x10k scaled integer) == its own day value
    if rows:
        assert rows[0]["moving_avg_7d_x10k"] == round(
            rows[0]["day_value"] * 10000
        )


def test_minhash_est_bounds_and_symmetry_inputs(spark):
    from greenplum_cdc_spark.operators import dedup

    rows = dedup.minhash_jaccard_est(spark, "/root/testdata/sf0.001").collect()
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_minhash_lsh(spark, "/root/testdata/sf0.001").collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == cand
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        # sharing a band implies >= rows-per-band matching hashes
        assert 2 / 8 <= r["jaccard_est"] <= 1.0


def test_stratified_sample_quota(spark):
    from greenplum_cdc_spark.operators import text as text_ops

    rows = text_ops.stratified_sample(spark, "/root/testdata/sf0.001").collect()
    per_lang = {}
    for r in rows:
        per_lang[r["lang"]] = max(per_lang.get(r["lang"], 0), r["rk"])
    assert all(k <= 50 for k in per_lang.values())


def test_embedding_stats_dims_complete(spark):
    from greenplum_cdc_spark.operators import similarity

    rows = similarity.embedding_stats(spark, "/root/testdata/sf0.001").collect()
    dims = {(r["label"], r["dim"]) for r in rows}
    labels = {r["label"] for r in rows}
    assert len(dims) == 64 * len(labels)


def test_replica_time_travel_and_vacuum(spark, tmp_path):
    from greenplum_cdc_spark.streaming.pipeline import ReplicaStore

    store = ReplicaStore(spark, str(tmp_path / "rep"))
    for i in range(3):
        store.commit(spark.range(i + 1).withColumnRenamed("id", "pk"))
    assert store.read().count() == 3
    assert store.read(version=1).count() == 1  # time travel == undo
    assert [h["version"] for h in store.history()] == [1, 2, 3]
    removed = store.vacuum(keep_last=2)
    assert removed == [1]
    assert store.read(version=1) is None  # vacuumed
    assert store.read().count() == 3  # current untouched


def test_resize_media_geometry(spark):
    from greenplum_cdc_spark.operators import multimodal

    media = multimodal.media_table(spark, "/root/testdata/sf0.001")
    rows = multimodal.resize_media(media, max_w=100, max_h=100).collect()
    assert len(rows) == media.count()
    for r in rows:
        assert 1 <= r["out_width"] <= 100 and 1 <= r["out_height"] <= 100
        assert r["scale"] <= 1.0
        # aspect preserved within integer truncation
        if r["scale"] < 1.0:
            assert max(r["out_width"], r["out_height"]) >= 99 or min(r["width"], r["height"]) < 100


def test_resize_nearest_identity_and_downscale():
    import numpy as np

    from greenplum_cdc_spark.operators import codecs

    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    assert np.array_equal(codecs.resize_nearest(pix, 16, 12), pix)
    small = codecs.resize_nearest(pix, 4, 3)
    assert small.shape == (3, 4, 3)
    # nearest-neighbor: every output pixel is some input pixel
    assert np.array_equal(small[0, 0], pix[0, 0])


def test_dedup_clusters_invariants(spark):
    """Every LSH pair lands in one cluster; cluster_id is the cluster min."""
    out = dedup.dedup_clusters(spark, SF).collect()
    label = {r["doc_id"]: r["cluster_id"] for r in out}
    sizes = {}
    for r in out:
        assert r["cluster_id"] <= r["doc_id"]
        assert r["is_keeper"] == int(r["doc_id"] == r["cluster_id"])
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    for r in out:
        assert r["cluster_size"] == sizes[r["cluster_id"]]
    for p in dedup.dedup_minhash_lsh(spark, SF).collect():
        assert label[p["doc_a"]] == label[p["doc_b"]]
    # each cluster's label is attained by a member (it IS the min member)
    assert all(cid in label and label[cid] == cid for cid in sizes)


def test_passage_dup_symmetric_and_bounded(spark):
    from greenplum_cdc_spark.operators import quality

    out = quality.passage_dup_13gram(spark, SF)
    rows = out.collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= 1
        assert 0.0 < r["small_doc_coverage"] <= 1.0


def test_unigram_logprob_favors_common_tokens(spark):
    from greenplum_cdc_spark.operators import quality

    out = quality.unigram_logprob(spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["avg_nll"] > 0 for r in rows)
    # sum consistency: avg * n_tok ~ sum (within rounding)
    for r in rows[:20]:
        assert abs(r["avg_nll"] * r["n_tok"] - r["sum_nll"]) < 0.01 * r["n_tok"]


def test_domain_mix_downsamples_majority_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = text.domain_mix_sample(spark, SF)
    after = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, rate in text.MIX_RATES.items():
        if lang not in before:
            continue
        if rate == 1.0:
            assert after.get(lang, 0) == before[lang]  # kept whole
        else:
            assert after.get(lang, 0) < before[lang]  # downsampled
    # rerun is identical (deterministic)
    again = {r["lang"]: r["n"] for r in text.domain_mix_sample(spark, SF).groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert again == after


def test_dedup_canonical_keeps_longest_per_cluster(spark):
    out = dedup.dedup_canonical(spark, SF).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(r["is_kept"] for r in out) == len(by_cluster)  # exactly one per cluster
    for members in by_cluster.values():
        kept = [r for r in members if r["is_kept"]][0]
        assert kept["n_chars"] == max(r["n_chars"] for r in members)


def test_kmv_distinct_sane(spark):
    from greenplum_cdc_spark.operators import sketches

    rows = sketches.kmv_distinct(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["k"] == 64
        # KMV with k=64 lands within ~3 std errors (1/sqrt(k-1) ~ 12.6%)
        assert abs(r["kmv_estimate"] - r["exact_distinct"]) < 0.5 * r["exact_distinct"]


def test_heavy_hitters_ordered_and_shares(spark):
    from greenplum_cdc_spark.operators import sketches

    rows = sketches.heavy_hitters(spark, SF).collect()
    assert len(rows) == sketches.HH_TOPN
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(0 < r["share"] < 1 for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, sketches.HH_TOPN + 1))


def test_tfidf_cosine_pairs_bounded_and_symmetric_free(spark):
    from greenplum_cdc_spark.operators import similarity

    rows = similarity.tfidf_cosine_pairs(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]  # each unordered pair exactly once
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert similarity.TFIDF_TAU <= r["cos_sim"] <= 1.000001


def test_range_frame_context_no_join(spark):
    """The interval lookback must be a window, not a self-join."""
    from greenplum_cdc_spark.operators import timeseries as ts

    df = ts.range_frame_context(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    rows = df.collect()
    assert rows and all(r["n_prior_10m"] >= 0 for r in rows)


def test_time_gap_fill_locf(spark):
    from greenplum_cdc_spark.operators import timeseries as ts

    rows = ts.time_gap_fill(spark, "/root/testdata/sf0.001").collect()
    assert any(r["filled"] for r in rows), "sparse series must have gaps"
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        days = [r["day"] for r in series]
        assert days == sorted(days)
        # contiguous daily calendar
        assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
        # LOCF: filled rows repeat the last observed value
        last = None
        for r in series:
            if r["filled"]:
                assert r["day_value"] == last
            else:
                last = r["day_value"]


def test_event_interarrival_positive_gaps(spark):
    from greenplum_cdc_spark.operators import timeseries as ts

    rows = ts.event_interarrival(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["min_gap_us"] <= r["avg_gap_us"] <= r["max_gap_us"]


def test_zscore_anomaly_threshold(spark):
    from greenplum_cdc_spark.operators import timeseries as ts

    rows = ts.zscore_anomaly(spark, "/root/testdata/sf0.01").collect()
    assert all(abs(r["z"]) >= ts.ZSCORE_CUT for r in rows)


def test_cms_never_underestimates(spark, sf_dir):
    from greenplum_cdc_spark.operators.sketches import cms_estimate

    rows = cms_estimate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["inflation"] == r["cms_est"] - r["exact_cnt"]


def test_hll_error_within_bound(spark, sf_dir):
    from greenplum_cdc_spark.operators.sketches import (
        HLL_RSD,
        _hll_frame,
        approx_distinct_hll,
    )

    rows = _hll_frame(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r["approx_users"] - r["exact_users"]) / max(1, r["exact_users"])
        assert rel <= 3 * HLL_RSD, (r["event_type"], rel)
    # the gated projection's verdict agrees (and is all-green here)
    gated = approx_distinct_hll(spark, sf_dir).collect()
    assert len(gated) == len(rows)
    assert all(g["within_3rsd"] == 1 for g in gated)
