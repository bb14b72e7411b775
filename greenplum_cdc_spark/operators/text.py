"""Text-analysis operators for corpus curation (SURVEY §2 C8-C11).

All pure built-in expressions (split / regexp_extract_all / conditional
aggregation) — whole-stage codegen end to end, no Python in the hot
path. Each op has an exact DuckDB oracle twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table

# Tiny deterministic stopword lists per language for the heuristic
# classifier. With the synthetic corpus these mostly exercise the
# machinery (scores, argmax, tie-breaks), which is the point.
STOPWORDS = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "de", "y", "es", "no"),
    "fr": ("le", "la", "de", "et", "est", "ne"),
}

EN_STOP = STOPWORDS["en"]


def _tok(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")


_TOK_SQL = """
tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM documents
),
tok2 AS (SELECT * FROM tok WHERE w <> '')
"""


def _inlist(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: stopword-hit language identification with deterministic
    argmax (score desc, language code asc; all-zero → 'und')."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _tok(docs)
    hits = tok.groupBy("doc_id", "lang").agg(
        *[
            F.sum(F.when(F.col("w").isin(*words), 1).otherwise(0)).alias(f"{code}_hits")
            for code, words in STOPWORDS.items()
        ]
    )
    # argmax with ties broken by language-code order (de < en < es < fr)
    pred = F.expr(
        "CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und' "
        "WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de' "
        "WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en' "
        "WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END"
    )
    return (
        hits.withColumn("pred_lang", pred)
        .withColumn(
            "is_correct", (F.col("pred_lang") == F.col("lang")).cast("int")
        )
        .select(
            "doc_id", "lang", "pred_lang", "is_correct",
            "de_hits", "en_hits", "es_hits", "fr_hits",
        )
        .orderBy("doc_id")
    )


LANG_ID_SQL = f"""
WITH {_TOK_SQL.strip()},
hits AS (
  SELECT doc_id, lang,
         CAST(SUM(CASE WHEN w IN ({_inlist(STOPWORDS["de"])}) THEN 1 ELSE 0 END) AS BIGINT) AS de_hits,
         CAST(SUM(CASE WHEN w IN ({_inlist(STOPWORDS["en"])}) THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
         CAST(SUM(CASE WHEN w IN ({_inlist(STOPWORDS["es"])}) THEN 1 ELSE 0 END) AS BIGINT) AS es_hits,
         CAST(SUM(CASE WHEN w IN ({_inlist(STOPWORDS["fr"])}) THEN 1 ELSE 0 END) AS BIGINT) AS fr_hits
  FROM tok2
  GROUP BY doc_id, lang
)
SELECT doc_id, lang,
       CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
            WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
            WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
            WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END AS pred_lang,
       CAST(CASE WHEN lang = CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
            WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
            WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
            WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END THEN 1 ELSE 0 END AS INT) AS is_correct,
       de_hits, en_hits, es_hits, fr_hits
FROM hits
ORDER BY doc_id
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: heuristic quality scoring — length band, stopword ratio,
    non-alpha ratio combined into [0,1]."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _tok(docs)
    stats = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("w").isin(*EN_STOP), 1).otherwise(0)).alias("n_stop"),
    )
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)")).alias("n_nonalpha"),
    )
    joined = base.join(stats, "doc_id")
    stop_ratio = F.round(F.col("n_stop") / F.col("n_tokens"), 6)
    nonalpha_ratio = F.round(F.col("n_nonalpha") / F.col("n_chars_raw"), 6)
    length_score = F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
    score = F.round(length_score * (1.0 - stop_ratio * 0.5) * (1.0 - nonalpha_ratio), 6)
    return (
        joined.withColumn("stop_ratio", stop_ratio)
        .withColumn("nonalpha_ratio", nonalpha_ratio)
        .withColumn("quality", score)
        .withColumn("is_quality", (F.col("quality") >= 0.5).cast("int"))
        .select(
            "doc_id", "n_tokens", "n_stop", "stop_ratio", "nonalpha_ratio",
            "quality", "is_quality",
        )
        .orderBy("doc_id")
    )


QUALITY_SQL = f"""
WITH {_TOK_SQL.strip()},
stats AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN w IN ({_inlist(EN_STOP)}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
  FROM tok2 GROUP BY doc_id
),
base AS (
  SELECT doc_id, length(text) AS n_chars_raw,
         len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_nonalpha
  FROM documents
)
SELECT b.doc_id, n_tokens, n_stop,
       ROUND(n_stop / n_tokens, 6) AS stop_ratio,
       ROUND(n_nonalpha / n_chars_raw, 6) AS nonalpha_ratio,
       ROUND(least(1.0, n_tokens / 100.0)
             * (1.0 - ROUND(n_stop / n_tokens, 6) * 0.5)
             * (1.0 - ROUND(n_nonalpha / n_chars_raw, 6)), 6) AS quality,
       CAST(ROUND(least(1.0, n_tokens / 100.0)
             * (1.0 - ROUND(n_stop / n_tokens, 6) * 0.5)
             * (1.0 - ROUND(n_nonalpha / n_chars_raw, 6)), 6) >= 0.5 AS INT) AS is_quality
FROM base b JOIN stats s ON b.doc_id = s.doc_id
ORDER BY b.doc_id
"""

# BPE-ish pretokenizer: letter runs, digit runs, single non-space symbols.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: whitespace + BPE-ish regex token counting."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)"))
    return (
        docs.select(
            "doc_id",
            ws.alias("n_ws_tokens"),
            bpe.alias("n_bpe_tokens"),
            F.length("text").alias("n_chars_raw"),
        )
        .withColumn(
            "chars_per_token",
            F.round(F.col("n_chars_raw") / F.col("n_ws_tokens"), 6),
        )
        .orderBy("doc_id")
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       length(text) AS n_chars_raw,
       ROUND(length(text) / len(list_filter(string_split(text, ' '), x -> x <> '')), 6)
         AS chars_per_token
FROM documents
ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: content-defined document fingerprinting.

    md5 over word 4-gram rolling windows; the fingerprint keeps the
    min/max digest plus a winnowed digest (min over the ~1/16 sample of
    digests starting with '0') — robust to small edits, stable across
    engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    # 4-grams built array-side (transform over the token array) — pure
    # map stage, no posexplode+window shuffle per doc.
    gram_arr = F.expr(
        "CASE WHEN size(toks) >= 4 THEN "
        "transform(sequence(0, size(toks) - 4), "
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3])) "
        "ELSE array() END"
    )
    grams = (
        docs.withColumn("toks", F.filter(F.split("text", " "), lambda x: x != ""))
        .select("doc_id", F.explode(gram_arr).alias("g"))
        .withColumn("h", F.md5("g"))
    )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.min("h").alias("fp_min"),
            F.max("h").alias("fp_max"),
            F.countDistinct("h").alias("n_grams"),
            F.min(F.when(F.col("h").startswith("0"), F.col("h"))).alias("fp_winnow"),
        )
        .orderBy("doc_id")
    )


DOC_FINGERPRINT_SQL = """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         md5(unnest([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]
                     FOR i IN range(1, len(toks) - 2)])) AS h
  FROM tok
)
SELECT doc_id,
       MIN(h) AS fp_min,
       MAX(h) AS fp_max,
       COUNT(DISTINCT h) AS n_grams,
       MIN(CASE WHEN h LIKE '0%' THEN h END) AS fp_winnow
FROM grams
GROUP BY doc_id
ORDER BY doc_id
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: canonical text normalization — lowercase, strip non-alnum to
    space, collapse whitespace, trim. The standard pre-dedup transform;
    pure JVM expressions, fully codegen."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return (
        docs.select(
            "doc_id",
            norm.alias("norm_text"),
            F.length(norm).alias("norm_len"),
            F.md5(norm).alias("norm_hash"),
        )
        .orderBy("doc_id")
    )


TEXT_NORMALIZE_SQL = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_len,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash
FROM documents
ORDER BY doc_id
"""

# Deterministic sample: md5 is a uniform hash, and fixed-width lowercase
# hex orders lexicographically == numerically, so thresholding the first
# 8 hex chars keeps ~rate of rows — same rows on EVERY engine and every
# cluster size, unlike rand()-based sampling.
_SAMPLE_RATE = 0.2
_SAMPLE_THRESHOLD_HEX = f"{int(_SAMPLE_RATE * 0xFFFFFFFF):08x}"


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: content-hash Bernoulli sample (reproducible corpus subsets).

    At 100 TB, sampling must be deterministic (re-runs and retries see
    the same subset) and embarrassingly parallel — a pure map filter on
    a content hash gives both; rand()-based sampling gives neither.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.concat(F.lit("sample:"), "text")), 1, 8)
    return (
        docs.withColumn("hash_bucket", bucket)
        .filter(F.col("hash_bucket") <= _SAMPLE_THRESHOLD_HEX)
        .select("doc_id", "hash_bucket", F.col("n_chars").alias("doc_len"))
        .orderBy("doc_id")
    )


DETERMINISTIC_SAMPLE_SQL = f"""
SELECT doc_id,
       substr(md5('sample:' || text), 1, 8) AS hash_bucket,
       n_chars AS doc_len
FROM documents
WHERE substr(md5('sample:' || text), 1, 8) <= '{_SAMPLE_THRESHOLD_HEX}'
ORDER BY doc_id
"""


_STRATA_K = 50


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: per-language stratified sample (top-K per stratum by content
    hash). Quota sampling keeps class balance in the curated corpus;
    rank-by-hash makes it deterministic and engine-independent, and one
    window shuffle on the stratum key is the whole cost at 100 TB.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("strat:"), "text"))
    w = Window.partitionBy("lang").orderBy(F.col("h"), F.col("doc_id"))
    return (
        docs.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _STRATA_K)
        .select("lang", "rk", "doc_id", F.col("h").alias("sample_hash"))
        .orderBy("lang", "rk")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, rk, doc_id, h AS sample_hash
FROM (
  SELECT lang, doc_id, md5('strat:' || text) AS h,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5('strat:' || text), doc_id) AS rk
  FROM documents
) t
WHERE rk <= {_STRATA_K}
ORDER BY lang, rk
"""


# Target mixture for domain/language rebalancing: majority 'en' is
# downsampled, minority languages kept whole. Rates are the knob a real
# pipeline tunes per data source (The Pile / Dolma style mixing).
MIX_RATES = {"de": 1.0, "en": 0.4, "es": 1.0, "fr": 1.0, "zh": 1.0}
_MIX_DEFAULT_HEX = "ffffffff"  # unknown domain -> keep (rate 1.0)


def _mix_hex(rate: float) -> str:
    return f"{int(rate * 0xFFFFFFFF):08x}"


def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30: deterministic mixture sampling across domains (languages).

    The corpus-mixing step of a training-data pipeline: each domain is
    Bernoulli-downsampled to its target rate via a content-hash
    threshold, so the mixture is reproducible across runs, engines, and
    cluster sizes (rand() is none of those). Pure map-side filter — the
    scan IS the operator, no shuffle at 100 TB; per-domain thresholds
    ride a tiny CASE expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.concat(F.lit("mix:"), "text")), 1, 8)
    threshold = F.lit(_MIX_DEFAULT_HEX)
    for code, rate in sorted(MIX_RATES.items()):
        threshold = F.when(F.col("lang") == code, F.lit(_mix_hex(rate))).otherwise(
            threshold
        )
    return (
        docs.withColumn("mix_bucket", bucket)
        .filter(F.col("mix_bucket") <= threshold)
        .select("doc_id", "lang", "mix_bucket")
        .orderBy("doc_id")
    )


_MIX_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{code}' THEN '{_mix_hex(rate)}'"
        for code, rate in sorted(MIX_RATES.items())
    )
    + f" ELSE '{_MIX_DEFAULT_HEX}' END"
)

DOMAIN_MIX_SQL = f"""
SELECT doc_id, lang, substr(md5('mix:' || text), 1, 8) AS mix_bucket
FROM documents
WHERE substr(md5('mix:' || text), 1, 8) <= {_MIX_CASE_SQL}
ORDER BY doc_id
"""


_VOCAB_MIN_DF = 5


def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20: corpus vocabulary statistics — per-term document frequency,
    collection term frequency, and IDF (the inputs to any tf-idf /
    quality-filter stage). One explode + one agg; min-df pruning bounds
    the output the way a real vocab build does.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = _tok(docs)
    return (
        tok.groupBy(F.col("w").alias("term"))
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("tf"),
        )
        .filter(F.col("df") >= _VOCAB_MIN_DF)
        .withColumn("idf", F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6))
        .orderBy("term")
    )


VOCAB_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
  FROM documents
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT w AS term,
       COUNT(DISTINCT doc_id) AS df,
       COUNT(*) AS tf,
       ROUND(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / COUNT(DISTINCT doc_id)), 6) AS idf
FROM tok
GROUP BY w
HAVING COUNT(DISTINCT doc_id) >= {_VOCAB_MIN_DF}
ORDER BY term
"""


FUZZY_MAX_DIST = 3


def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C44: blocked fuzzy entity matching — edit-distance pairs of part
    names that share a blocking key (their last word).

    The canonical entity-resolution shape at scale: NEVER all-pairs —
    first collapse rows to distinct entities (100 names for 2000 parts
    here; the dedup that makes the quadratic term tractable), then
    block on a cheap key so the self-join is an equi-join whose
    candidate sets are per-block, then verify candidates with the
    expensive measure (levenshtein, JVM built-in — no UDF). Blocking
    on the head noun mirrors production blocking on zip/soundex/sorted
    tokens; a pair in different blocks is never compared, which is the
    documented recall trade (raise recall with a second blocking pass
    on another key, union the candidates).
    """
    part = load_table(spark, sf_dir, "part")
    names = (
        part.groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "edit_dist",
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .orderBy("name_a", "name_b")
    )


FUZZY_MATCH_SQL = f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts,
         string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a
JOIN names b ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47: deterministic importance sampling — keep probability
    proportional to document weight (n_chars here; quality score in a
    curation run), with acceptance p_i = n_chars / (2 * max_chars).

    The mixing primitive for training-data recipes that up/down-weight
    sources by a per-document score rather than a per-group quota
    (domain_mix_sample C30 is the per-group form). The accept test is
    pure integer math — 28-bit content hash h accepts iff
    h * 2 * max_chars < n_chars * 2^28 — so re-runs, retries, and both
    engines agree exactly; the corpus-max weight is one scalar
    aggregate broadcast into the map-side filter. No rand(), no
    shuffle beyond the scalar.
    """
    docs = load_table(spark, sf_dir, "documents")
    maxc = docs.agg(F.max("n_chars").alias("maxc"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("wsample:"), "text")), 1, 7), 16, 10
    ).cast("bigint")
    return (
        docs.crossJoin(F.broadcast(maxc))
        .withColumn("h", h)
        .filter(F.col("h") * 2 * F.col("maxc") < F.col("n_chars") * F.lit(1 << 28))
        .select("doc_id", "n_chars", "h")
        .orderBy("doc_id")
    )


_WS_HEX7 = "+".join(
    f"(strpos('0123456789abcdef', substr(md5('wsample:' || text), {i + 1}, 1)) - 1) * {16 ** (6 - i)}"
    for i in range(7)
)

WEIGHTED_SAMPLE_SQL = f"""
WITH m AS (SELECT MAX(n_chars) AS maxc FROM documents),
hashed AS (
  SELECT doc_id, n_chars, CAST({_WS_HEX7} AS BIGINT) AS h
  FROM documents
)
SELECT doc_id, n_chars, h
FROM hashed, m
WHERE h * 2 * maxc < n_chars * {1 << 28}
ORDER BY doc_id
"""


NGRAM_TOPK = 25


def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C57: corpus-level top-K word bigrams — the n-gram LM / tokenizer
    -training count table (the first pass of every BPE/WordPiece trainer
    and of n-gram contamination indexes).

    Bigrams are built array-side with one `transform` over the token
    array (pure map stage, same shape as doc_fingerprint's 4-grams), so
    the only shuffle is the map-side-combined count; the global top-K is
    TakeOrdered (per-partition heaps + driver merge of K rows), never a
    full sort. At 100 TB the count table is the big object, not the
    rows: partial aggregation bounds each task's state to its distinct
    bigrams, and K rows cross to the driver.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(0, size(toks) - 2), "
        "i -> concat_ws(' ', toks[i], toks[i+1])) "
        "ELSE array() END"
    )
    return (
        docs.withColumn("toks", F.filter(F.split("text", " "), lambda x: x != ""))
        .select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(NGRAM_TOPK)
    )


NGRAM_TOPK_SQL = f"""
WITH t AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
)
SELECT bigram, COUNT(*) AS cnt
FROM g GROUP BY bigram
ORDER BY cnt DESC, bigram ASC
LIMIT {NGRAM_TOPK}
"""


# fixed char-length curriculum boundaries (chars; half-open buckets)
LEN_BUCKET_BOUNDS = (100, 200, 300, 400)


def length_bucket_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C62: curriculum mixing table — document-length buckets x language,
    with each language's share of its bucket in integer basis points.

    The planning table behind length-bucketed batch packing and
    curriculum schedules (short->long). Buckets are fixed literal
    boundaries so assignment is a map-side CASE; the per-bucket share
    uses integer floor division (cnt * 10000 div bucket_total) — the
    engine-divergence-proof idiom (ADVICE r3) — over a window keyed by
    the 5-row bucket id on the already-aggregated frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    arms = " ".join(
        f"WHEN n_chars < {b} THEN {i}" for i, b in enumerate(LEN_BUCKET_BOUNDS)
    )
    bucket = F.expr(f"CASE {arms} ELSE {len(LEN_BUCKET_BOUNDS)} END")
    agg = (
        docs.withColumn("len_bucket", bucket)
        .groupBy("len_bucket", "lang")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("len_bucket")
    return (
        agg.withColumn("bucket_total", F.sum("cnt").over(w))
        .withColumn("share_bp", F.expr("(cnt * 10000) div bucket_total"))
        .select("len_bucket", "lang", "cnt", "bucket_total", "share_bp")
        .orderBy("len_bucket", "lang")
    )


_LEN_BUCKET_CASE = " ".join(
    f"WHEN n_chars < {b} THEN {i}" for i, b in enumerate(LEN_BUCKET_BOUNDS)
)

LENGTH_BUCKET_MIX_SQL = f"""
WITH b AS (
  SELECT CASE {_LEN_BUCKET_CASE} ELSE {len(LEN_BUCKET_BOUNDS)} END AS len_bucket, lang
  FROM documents
),
agg AS (
  SELECT len_bucket, lang, COUNT(*) AS cnt FROM b GROUP BY len_bucket, lang
)
SELECT len_bucket, lang, cnt,
       CAST(SUM(cnt) OVER (PARTITION BY len_bucket) AS BIGINT) AS bucket_total,
       CAST((cnt * 10000) // SUM(cnt) OVER (PARTITION BY len_bucket) AS BIGINT)
         AS share_bp
FROM agg
ORDER BY len_bucket, lang
"""


HASH_FEAT_BUCKETS = 32


def _hex7_sql(inner: str) -> str:
    """DuckDB twin of conv(substr(md5(x),1,7),16,10): first 7 hex chars
    of the md5 as a BIGINT (the weighted_sample idiom, generalized)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({inner}), {i + 1}, 1)) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    ) + ")"


def hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C66: hashing-trick featurization audit — the collision-load
    profile of a {HASH_FEAT_BUCKETS}-bucket feature hasher
    (Weinberger et al.; sklearn HashingVectorizer / fastText's bucket
    trick), the fixed-width vectorizer a training pipeline uses when
    the vocabulary cannot be held or shipped.

    Every token routes to bucket md5(token) mod {HASH_FEAT_BUCKETS}
    (content-addressed — no fitted vocabulary object, identical on any
    engine or re-run); the output is the per-bucket load: how many docs
    touch it, total token mass, and the heaviest single-doc count. A
    skewed profile means collided hot tokens — the signal to widen the
    table. One explode + two map-side-combined aggregates; the feature
    table is {HASH_FEAT_BUCKETS} rows regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 7), 16, 10).cast("bigint")
        % HASH_FEAT_BUCKETS
    )
    per_doc = (
        docs.withColumn("toks", F.filter(F.split("text", " "), lambda x: x != ""))
        .select("doc_id", F.explode("toks").alias("token"))
        .withColumn("bucket", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_doc.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("cnt").alias("total_cnt"),
            F.max("cnt").alias("max_doc_cnt"),
        )
        .orderBy("bucket")
    )


HASH_FEATURES_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
per_doc AS (
  SELECT doc_id, {_hex7_sql('token')} % {HASH_FEAT_BUCKETS} AS bucket,
         COUNT(*) AS cnt
  FROM tok GROUP BY doc_id, bucket
)
SELECT bucket, COUNT(*) AS n_docs,
       CAST(SUM(cnt) AS BIGINT) AS total_cnt,
       MAX(cnt) AS max_doc_cnt
FROM per_doc
GROUP BY bucket
ORDER BY bucket
"""


PACK_BUDGET = 512  # tokens per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C67: sequence-packing plan — assign documents to fixed-budget
    training bins ({PACK_BUDGET} tokens) by contiguous next-fit over the
    (n_tokens DESC, doc_id) order, the batch-construction step between a
    curated corpus and a dataloader (padding waste -> ~0).

    The packing order's EXACT global running sum is computed
    distributed, never through a single-partition window (the
    `_global_row_number` construction, operators/stats.py, extended to
    a running SUM): approxQuantile boundaries on the order key become
    literal bucket bounds, per-bucket token totals give each bucket's
    starting offset (one |buckets|-row collect), and a within-bucket
    window adds the local prefix — offset + local prefix is the exact
    global cumulative, bit-equal to the oracle's window SUM at any
    partition count. bin = (cum-1) div budget. Output is the per-bin
    manifest (docs, tokens, fill basis points).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tokens"),
    )
    spark_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 2)
    probs = [i / spark_parts for i in range(1, spark_parts)]
    bounds = sorted(set(toks.stat.approxQuantile("n_tokens", probs, 0.01)))
    if bounds:
        # DESC order: bucket 0 holds the LARGEST values. pid = count of
        # boundaries at/above the value, via a strict > chain reversed.
        arms = " ".join(
            f"WHEN n_tokens > {int(b)} THEN {len(bounds) - 1 - i}"
            for i, b in reversed(list(enumerate(bounds)))
        )
        pid = F.expr(f"CASE {arms} ELSE {len(bounds)} END")
    else:
        pid = F.lit(0)
    part = toks.withColumn("_pid", pid)
    stats_rows = (
        part.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    sums = {r["_pid"]: r["s"] for r in stats_rows}
    offsets, acc = [], 0
    for b in sorted(sums):
        offsets.extend([F.lit(b), F.lit(acc)])
        acc += sums[b]
    off = F.create_map(*offsets)[F.col("_pid")]
    w = Window.partitionBy("_pid").orderBy(F.desc("n_tokens"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = (
        part.withColumn("cum", (F.sum("n_tokens").over(w) + off).cast("bigint"))
        .withColumn("bin_id", F.expr(f"(cum - 1) div {PACK_BUDGET}"))
        .drop("_pid")
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .withColumn("fill_bp", F.expr(f"(n_tokens * 10000) div {PACK_BUDGET}"))
        .orderBy("bin_id")
    )


PACK_SEQUENCES_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
cums AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM toks
),
binned AS (
  SELECT *, (cum - 1) // {PACK_BUDGET} AS bin_id FROM cums
)
SELECT bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       CAST((SUM(n_tokens) * 10000) // {PACK_BUDGET} AS BIGINT) AS fill_bp
FROM binned
GROUP BY bin_id
ORDER BY bin_id
"""


CHUNK_LEN = 16    # tokens per context window
CHUNK_STRIDE = 12 # tokens advanced per window (CHUNK_LEN - overlap)


def context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C68: context-window chunking plan — the doc -> fixed-window
    slicing every pretraining/RAG ingest does ({CHUNK_LEN}-token windows
    advancing {CHUNK_STRIDE}, i.e. {CHUNK_LEN - CHUNK_STRIDE}-token
    overlap), emitted as the per-document manifest.

    n_chunks has the closed form 1 + ceil(max(0, n - L) / S) (one window
    always; each stride adds one while tokens remain), so the whole
    operator is a single map-side projection — integer arithmetic only,
    no explode, nothing to shuffle but the final sort. The chunk TEXT
    materialization is a transform/slice over the token array when a
    consumer wants rows (same array-side idiom as doc_fingerprint); the
    manifest is what the planner needs.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    n_chunks = F.expr(
        f"1 + (CASE WHEN n_tokens > {CHUNK_LEN} "
        f"THEN (n_tokens - {CHUNK_LEN} + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE} "
        "ELSE 0 END)"
    )
    return (
        docs.select("doc_id", n.alias("n_tokens"))
        .withColumn("n_chunks", n_chunks.cast("bigint"))
        .withColumn(
            "last_chunk_len",
            F.expr(
                f"CASE WHEN n_tokens <= {CHUNK_LEN} THEN n_tokens "
                f"ELSE n_tokens - (n_chunks - 1) * {CHUNK_STRIDE} END"
            ).cast("bigint"),
        )
        .orderBy("doc_id")
    )


CONTEXT_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(1 + (CASE WHEN n_tokens > {CHUNK_LEN}
                        THEN (n_tokens - {CHUNK_LEN} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
                        ELSE 0 END) AS BIGINT) AS n_chunks
  FROM toks
)
SELECT doc_id, n_tokens, n_chunks,
       CAST(CASE WHEN n_tokens <= {CHUNK_LEN} THEN n_tokens
                 ELSE n_tokens - (n_chunks - 1) * {CHUNK_STRIDE} END AS BIGINT)
         AS last_chunk_len
FROM c
ORDER BY doc_id
"""


SPAN_MASK_RATE_MOD = 10  # a span starts where md5(doc:pos) % 10 == 0
SPAN_MASK_LEN = 3


def span_mask_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C69: deterministic span-corruption plan (the T5/UL2 denoising
    objective's data half): mask spans of {SPAN_MASK_LEN} tokens
    starting wherever md5(doc_id:pos) lands in 1/{SPAN_MASK_RATE_MOD}
    of hash space — content-addressed, so every re-run, engine, and
    shard boundary produces the same corruption pattern (no rand(), the
    weighted_sample contract applied to pretraining masks).

    A position is masked if ANY span covering it starts in the previous
    {SPAN_MASK_LEN} positions; span starts are independent hashes, so
    the plan is one posexplode + map-side hash + per-doc aggregate.
    Output: per doc, span starts, masked-token count (overlaps counted
    once), and the corruption rate in basis points.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("toks"),
    ).select("doc_id", F.size("toks").alias("n_tokens"))
    # positions 0..n-1 explode map-side; is_start = hash(doc:pos) % MOD == 0
    pos = toks.select(
        "doc_id",
        "n_tokens",
        F.explode(F.expr("sequence(0, n_tokens - 1)")).alias("p"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", "doc_id", "p")), 1, 7), 16, 10
    ).cast("bigint")
    flagged = pos.withColumn("is_start", (h % SPAN_MASK_RATE_MOD == 0).cast("int"))
    # masked(p) = any start in (p - LEN, p]: window sum over the last LEN
    # positions within the doc (positions are dense, so ROWS == RANGE)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("p").rowsBetween(1 - SPAN_MASK_LEN, 0)
    masked = flagged.withColumn(
        "is_masked", (F.sum("is_start").over(w) > 0).cast("int")
    )
    return (
        masked.groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.sum("is_start").cast("bigint").alias("n_spans"),
            F.sum("is_masked").cast("bigint").alias("n_masked"),
        )
        .withColumn("mask_rate_bp", F.expr("(n_masked * 10000) div n_tokens"))
        .orderBy("doc_id")
    )


SPAN_MASK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
pos AS (
  SELECT doc_id, n_tokens, unnest(range(0, n_tokens)) AS p FROM toks
),
flagged AS (
  SELECT doc_id, n_tokens, p,
         CASE WHEN {_hex7_sql("doc_id || ':' || p")} % {SPAN_MASK_RATE_MOD} = 0
              THEN 1 ELSE 0 END AS is_start
  FROM pos
),
masked AS (
  SELECT doc_id, n_tokens, is_start,
         CASE WHEN SUM(is_start) OVER (PARTITION BY doc_id ORDER BY p
                                       ROWS BETWEEN {SPAN_MASK_LEN - 1} PRECEDING
                                       AND CURRENT ROW) > 0
              THEN 1 ELSE 0 END AS is_masked
  FROM flagged
)
SELECT doc_id, MAX(n_tokens) AS n_tokens,
       CAST(SUM(is_start) AS BIGINT) AS n_spans,
       CAST(SUM(is_masked) AS BIGINT) AS n_masked,
       CAST((SUM(is_masked) * 10000) // MAX(n_tokens) AS BIGINT) AS mask_rate_bp
FROM masked
GROUP BY doc_id
ORDER BY doc_id
"""


# --- C73: one BPE merge iteration --------------------------------------

BPE_TOPN = 5
# sentinel for the merged token inside rewritten words; the corpus is
# lowercase [a-z ]+ so '#' can never collide with a real symbol
_BPE_SENTINEL = "#"


def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C73: one iteration of byte-pair-encoding tokenizer training —
    the top adjacent symbol pair before the merge, and the top pairs
    after applying that merge to the vocabulary.

    Classic BPE (Sennrich et al.) trains on the WORD-FREQUENCY table,
    not the raw corpus: the corpus collapses to (word, freq) first (one
    vocab-sized shuffle), every later pass touches only the vocabulary.
    Pair counting is array-side (transform over the char sequence,
    weighted by word freq); the winning pair is a 1-row broadcast; the
    merge itself is a left-to-right non-overlapping string replace —
    both engines agree replace('aaa','aa','#') = '#a', which IS the BPE
    greedy-scan semantic. Post-merge pairs are re-counted on the
    rewritten words with the sentinel mapped back to the merged token.

    At 100 TB the per-iteration cost is O(|vocab|), not O(corpus) —
    exactly why real BPE trainers work from the word histogram; the
    expensive corpus pass happens once (the same shape as vocab_stats).

    Output: the 5 heaviest pairs before and after the merge
    (stage='pre'/'post'), deterministic tie-break on the pair.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    from .dedup import _swap_persist

    words = _swap_persist("bpe_words", words)

    def pair_counts(df: DataFrame, word_col: str) -> DataFrame:
        grams = F.expr(
            f"CASE WHEN length({word_col}) >= 2 THEN "
            f"transform(sequence(0, length({word_col}) - 2), "
            f"i -> substring({word_col}, i + 1, 2)) "
            "ELSE array() END"
        )
        return (
            df.select(F.explode(grams).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )

    pre = pair_counts(words, "word")
    top1 = pre.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).select(
        F.col("pair").alias("merge_pair")
    )
    merged = words.crossJoin(F.broadcast(top1)).select(
        F.expr(f"replace(word, merge_pair, '{_BPE_SENTINEL}')").alias("word2"),
        "freq",
        "merge_pair",
    )
    post = (
        pair_counts(merged.select(F.col("word2"), "freq"), "word2")
        .crossJoin(F.broadcast(top1))
        .select(
            F.expr(
                f"replace(substring(pair, 1, 1), '{_BPE_SENTINEL}', merge_pair)"
            ).alias("token_a"),
            F.expr(
                f"replace(substring(pair, 2, 1), '{_BPE_SENTINEL}', merge_pair)"
            ).alias("token_b"),
            "cnt",
        )
        .groupBy("token_a", "token_b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    pre_top = (
        pre.select(
            F.lit("pre").alias("stage"),
            F.substring("pair", 1, 1).alias("token_a"),
            F.substring("pair", 2, 1).alias("token_b"),
            "cnt",
        )
        .orderBy(F.desc("cnt"), "token_a", "token_b")
        .limit(BPE_TOPN)
    )
    post_top = (
        post.select(F.lit("post").alias("stage"), "token_a", "token_b", "cnt")
        .orderBy(F.desc("cnt"), "token_a", "token_b")
        .limit(BPE_TOPN)
    )
    return pre_top.unionAll(post_top).orderBy(
        "stage", F.desc("cnt"), "token_a", "token_b"
    )


BPE_MERGE_SQL = f"""
WITH words AS (
  SELECT word, COUNT(*) AS freq
  FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM documents
  )
  GROUP BY word
),
pre AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT substr(word, i, 2) AS pair, freq
    FROM (SELECT word, freq, unnest(range(1, length(word))) AS i FROM words
          WHERE length(word) >= 2)
  )
  GROUP BY pair
),
top1 AS (
  SELECT pair AS merge_pair FROM pre ORDER BY cnt DESC, pair ASC LIMIT 1
),
merged AS (
  SELECT replace(word, merge_pair, '{_BPE_SENTINEL}') AS word2, freq, merge_pair
  FROM words, top1
),
post AS (
  SELECT replace(substr(pair, 1, 1), '{_BPE_SENTINEL}', merge_pair) AS token_a,
         replace(substr(pair, 2, 1), '{_BPE_SENTINEL}', merge_pair) AS token_b,
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT substr(word2, i, 2) AS pair, freq, merge_pair
    FROM (SELECT word2, freq, merge_pair, unnest(range(1, length(word2))) AS i
          FROM merged WHERE length(word2) >= 2)
  )
  GROUP BY token_a, token_b
),
pre_top AS (
  SELECT 'pre' AS stage, substr(pair, 1, 1) AS token_a, substr(pair, 2, 1) AS token_b, cnt
  FROM pre ORDER BY cnt DESC, token_a, token_b LIMIT {BPE_TOPN}
),
post_top AS (
  SELECT 'post' AS stage, token_a, token_b, cnt
  FROM post ORDER BY cnt DESC, token_a, token_b LIMIT {BPE_TOPN}
)
SELECT * FROM pre_top
UNION ALL
SELECT * FROM post_top
ORDER BY stage, cnt DESC, token_a, token_b
"""


# --- C74: token-budget mixture planning --------------------------------

# target training-mixture shares in basis points (sum = 10000)
_MIX_TARGET_BP = {"en": 4000, "de": 1500, "es": 1500, "fr": 1500, "zh": 1500}


def data_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C74: token-budget planning for a target language mixture — the
    table a training run reads before any sampling happens.

    Given per-language available tokens and literal target shares, the
    largest total budget that oversamples NO language is B_max =
    min over langs of (available * 10000) div share_bp; each language
    then contributes (B_max * share_bp) div 10000 tokens at sampling
    rate (wanted * 10000) div available. Pure integer floor division
    end to end — the plan is reproducible to the token across engines
    and re-runs, which is what makes the downstream content-hash
    samplers (C14/C30/C47) deterministic consumers of it.

    One corpus scan (map-side token count), a 5-row rollup, and a
    1-row broadcast minimum. At 100 TB the scan is the whole cost and
    is shared with any other per-doc profiling pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    arms = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in _MIX_TARGET_BP.items()
    )
    share = F.expr(f"CASE {arms} ELSE 0 END")
    avail = (
        docs.withColumn(
            "n_tokens", F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        )
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("available_tokens"))
        .withColumn("target_share_bp", share)
        .filter(F.col("target_share_bp") > 0)
    )
    bmax = avail.agg(
        F.min(F.expr("(available_tokens * 10000) div target_share_bp")).alias(
            "b_max"
        )
    )
    return (
        avail.crossJoin(F.broadcast(bmax))
        .select(
            "lang",
            "available_tokens",
            "target_share_bp",
            F.expr("(b_max * target_share_bp) div 10000").alias("tokens_wanted"),
            F.expr(
                "((b_max * target_share_bp) div 10000 * 10000) div available_tokens"
            ).alias("sample_rate_bp"),
            (
                F.expr("(available_tokens * 10000) div target_share_bp")
                == F.col("b_max")
            )
            .cast("int")
            .alias("is_limiting"),
        )
        .orderBy("lang")
    )


_MIX_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in _MIX_TARGET_BP.items()
)

DATA_TOKEN_BUDGET_SQL = f"""
WITH avail AS (
  SELECT lang,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
           AS available_tokens,
         CASE {_MIX_CASE} ELSE 0 END AS target_share_bp
  FROM documents
  GROUP BY lang
  HAVING target_share_bp > 0
),
bmax AS (
  SELECT MIN((available_tokens * 10000) // target_share_bp) AS b_max FROM avail
)
SELECT lang, available_tokens, target_share_bp,
       CAST((b_max * target_share_bp) // 10000 AS BIGINT) AS tokens_wanted,
       CAST(((b_max * target_share_bp) // 10000 * 10000) // available_tokens AS BIGINT)
         AS sample_rate_bp,
       CAST((available_tokens * 10000) // target_share_bp = b_max AS INT) AS is_limiting
FROM avail, bmax
ORDER BY lang
"""


# --- C76: deterministic train/validation/test split --------------------

# content-hash percent thresholds: [0,80) train, [80,90) val, [90,100) test
_SPLIT_BOUNDS = (("train", 0, 80), ("val", 80, 90), ("test", 90, 100))


def train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C76: deterministic train/val/test split manifest with per-split,
    per-language stratification audit.

    Split assignment is content-hash mod 100 (md5('split:'||doc_id)) —
    reproducible across engines, re-runs and shards, never rand(): a
    document's split NEVER changes when the corpus grows, which is the
    property that prevents silent eval contamination across dataset
    versions (the same reason C14/C30 hash instead of sampling). The
    audit rolls up docs and exact token counts per (split, lang) with
    integer-bp shares of each split.

    One corpus scan, one |splits x langs|-row rollup. The leakage
    check is structural (a hash lands in exactly one band) and pinned
    by the pytest partition test.
    """
    docs = load_table(spark, sf_dir, "documents")
    h7 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("bigint")
    arms = " ".join(
        f"WHEN pct < {hi} THEN '{name}'" for name, _lo, hi in _SPLIT_BOUNDS
    )
    from pyspark.sql import Window

    agg = (
        docs.withColumn("pct", h7 % 100)
        .withColumn("split", F.expr(f"CASE {arms} END"))
        .withColumn(
            "n_tokens", F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("split")
    return (
        agg.withColumn("split_docs", F.sum("n_docs").over(w))
        .withColumn("lang_share_bp", F.expr("(n_docs * 10000) div split_docs"))
        .select("split", "lang", "n_docs", "n_tokens", "split_docs", "lang_share_bp")
        .orderBy("split", "lang")
    )


_SPLIT_CASE = " ".join(
    f"WHEN pct < {hi} THEN '{name}'" for name, _lo, hi in _SPLIT_BOUNDS
)

_split_hex7 = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (6 - i)}"
    for i in range(7)
) + ")"

TRAIN_EVAL_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT lang,
         CASE {_SPLIT_CASE} END AS split,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM (
    SELECT *,
           {_split_hex7} % 100
             AS pct
    FROM documents
  )
),
agg AS (
  SELECT split, lang, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY split, lang
)
SELECT split, lang, n_docs, n_tokens,
       CAST(SUM(n_docs) OVER (PARTITION BY split) AS BIGINT) AS split_docs,
       CAST((n_docs * 10000) // SUM(n_docs) OVER (PARTITION BY split) AS BIGINT)
         AS lang_share_bp
FROM agg
ORDER BY split, lang
"""


# --- C79: vocabulary coverage curve ------------------------------------

COVERAGE_KS = (10, 100, 1000, 10000)


def ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C79: vocabulary coverage curve — what fraction of corpus tokens
    does a top-K vocabulary cover, for K in {10, 100, 1000, 10000}?

    The tokenizer-sizing question (vocab size vs OOV rate) answered
    from one term-frequency table: words ranked by (tf desc, word) via
    the DISTRIBUTED global rank (`_global_row_number` — no
    single-partition window even over the vocab), then ONE aggregate
    computes all four cumulative coverages as conditional sums and
    stack() unpivots them to rows. Coverage is integer bp (floor
    division). At 100 TB the vocab table is the only shuffled object —
    the same artifact vocab_stats/bpe_merge_step already build.
    """
    from .stats import _global_row_number

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("tf"))
    )
    ranked, vocab_size = _global_row_number(
        tf.withColumn("neg_tf", -F.col("tf")), "neg_tf", ["w"]
    )
    covered = [
        F.sum(F.when(F.col("rn") <= k, F.col("tf")).otherwise(0)).alias(f"c{k}")
        for k in COVERAGE_KS
    ]
    agg = ranked.agg(F.sum("tf").alias("total_tokens"), *covered)
    stack_args = ", ".join(f"{k}, c{k}" for k in COVERAGE_KS)
    return (
        agg.select(
            F.expr(
                f"stack({len(COVERAGE_KS)}, {stack_args}) AS (k, tokens_covered)"
            ),
            "total_tokens",
        )
        .select(
            F.col("k").cast("int").alias("k"),
            F.lit(vocab_size).cast("bigint").alias("vocab_size"),
            "total_tokens",
            "tokens_covered",
            F.expr("(tokens_covered * 10000) div total_tokens").alias(
                "coverage_bp"
            ),
        )
        .orderBy("k")
    )


NGRAM_COVERAGE_SQL = f"""
WITH tf AS (
  SELECT w, COUNT(*) AS tf
  FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents
  )
  GROUP BY w
),
ranked AS (
  SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, w ASC) AS rn FROM tf
),
agg AS (
  SELECT CAST(SUM(tf) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab_size,
         {", ".join(f"CAST(SUM(CASE WHEN rn <= {k} THEN tf ELSE 0 END) AS BIGINT) AS c{k}" for k in COVERAGE_KS)}
  FROM ranked
)
SELECT k, vocab_size, total_tokens, tokens_covered,
       CAST((tokens_covered * 10000) // total_tokens AS BIGINT) AS coverage_bp
FROM (
  {" UNION ALL ".join(f"SELECT {k} AS k, vocab_size, total_tokens, c{k} AS tokens_covered FROM agg" for k in COVERAGE_KS)}
)
ORDER BY k
"""


# --- C83: deterministic shard shuffle ----------------------------------

SHARD_N = 16


def _shard_hex8_sql(col: str) -> str:
    """8-hex-digit md5 prefix as a positional polynomial (DuckDB has no
    base-16 conv; 16^7..16^0 are exact BIGINTs) — the shared shard/order
    key both engines compute identically."""
    terms = [
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C83: the training-data GLOBAL SHUFFLE, the way it actually runs
    at 100 TB — no global sort, no rand(). Each document hashes to one
    of {SHARD_N} shards (content-hash, reproducible across runs and
    engines), and its position WITHIN the shard is a second independent
    hash order. Training jobs then read shards in parallel and stream
    each shard in position order: every permutation property a global
    `ORDER BY rand()` gives, at the cost of ONE hash-partition shuffle
    + shard-local sorts — the only shuffle shape that survives 10^10
    documents. Emits the shuffle plan itself (doc_id → shard, pos) plus
    the per-shard token budget the trainer's data loader needs for
    balanced epoch planning.

    Both hashes are md5-prefix polynomials (exact integer arithmetic,
    the repo's cross-engine idiom): shard = h('shard:'||id) % N, order
    key = h('order:'||id) with doc_id tiebreak (hash collisions must
    not make peer order engine-dependent — SURVEY §5).

    The in-shard position is a TWO-PHASE exact rank, not a per-shard
    window (which would funnel each shard — 10^8+ docs at 100 TB —
    through ONE task, the stats._global_row_number scale-killer).
    Because ord_key is a uniform hash with a KNOWN range [0, 2^32),
    the range boundaries need no sampling: sub-bucket = ord_key div
    (2^32/B) is monotone in ord_key, so offset-by-sub-bucket + the
    sub-bucket-local row_number reproduces the per-shard global order
    exactly, with N·B parallel rank tasks and a |N·B|-row broadcast
    offset table. (The oracle states the plain per-shard window — the
    semantics the two-phase plan provably equals.)
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    h_shard = F.expr(
        "conv(substring(md5(concat('shard:', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10)"
    ).cast("bigint")
    h_order = F.expr(
        "conv(substring(md5(concat('order:', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10)"
    ).cast("bigint")
    n_tok = F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
    sub_b = 8  # sub-buckets per shard: SHARD_N * 8 parallel rank tasks
    step = (1 << 32) // sub_b
    keyed = docs.select(
        "doc_id",
        (h_shard % SHARD_N).cast("int").alias("shard"),
        h_order.alias("ord_key"),
        n_tok.cast("bigint").alias("n_tokens"),
    ).withColumn(
        # integer `div`, not double-divide-then-truncate: exact by
        # construction whatever the hash width / bucket count (ADVICE r5)
        "sub",
        F.expr(f"ord_key div {step}").cast("int"),
    )
    # per-(shard, sub) counts -> cumulative offsets + per-shard totals,
    # all over the tiny |N*B|-row table, broadcast back
    counts = keyed.groupBy("shard", "sub").agg(
        F.count("*").alias("c"), F.sum("n_tokens").alias("t")
    )
    w_off = (
        Window.partitionBy("shard")
        .orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("shard")
    offsets = counts.select(
        "shard",
        "sub",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
        F.sum("c").over(w_tot).alias("shard_docs"),
        F.sum("t").over(w_tot).alias("shard_tokens"),
    )
    w_local = Window.partitionBy("shard", "sub").orderBy("ord_key", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["shard", "sub"])
        .select(
            "shard",
            (F.col("off") + F.col("rk")).cast("bigint").alias("pos"),
            "doc_id",
            "n_tokens",
            "shard_docs",
            "shard_tokens",
        )
        .orderBy("shard", "pos")
    )


SHARD_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         CAST({_shard_hex8_sql("md5('shard:' || CAST(doc_id AS VARCHAR))")}
              % {SHARD_N} AS INT) AS shard,
         {_shard_hex8_sql("md5('order:' || CAST(doc_id AS VARCHAR))")}
           AS ord_key,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
)
SELECT shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_key, doc_id)
            AS BIGINT) AS pos,
       doc_id,
       n_tokens,
       COUNT(*) OVER (PARTITION BY shard) AS shard_docs,
       CAST(SUM(n_tokens) OVER (PARTITION BY shard) AS BIGINT)
         AS shard_tokens
FROM keyed
ORDER BY shard, pos
"""


# --- C88: dataset card -------------------------------------------------


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C88: the one-row dataset card — the summary block a dataset
    release ships (docs, exact token budget, language breadth, exact
    duplicate mass, length distribution), every number integer-exact
    so the card is reproducible to the digit across engines and runs.

    The median is the deterministic LOWER median (the ((n+1) div 2)-th
    order statistic with doc_id tiebreak) — an exact rank selection,
    not percentile interpolation, so no double arithmetic enters the
    card — computed with the DISTRIBUTED exact rank (B56/B59's
    _global_row_number: literal range buckets + per-bucket offsets),
    never a single-partition window over the corpus. Plan: one corpus
    scan feeding the scalar aggregate, plus the three bounded rank
    passes; everything shuffle-light.
    """
    from .stats import _global_row_number
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    agg = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("h").alias("distinct_texts"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )
    ranked, total = _global_row_number(docs, "n_tokens", ["doc_id"])
    med = ranked.filter(F.col("rn") == (total + 1) // 2).select(
        F.col("n_tokens").alias("median_tokens")
    )
    return agg.crossJoin(med).select(
        "n_docs",
        "total_tokens",
        "n_langs",
        "distinct_texts",
        (F.col("n_docs") - F.col("distinct_texts")).alias("exact_dup_docs"),
        F.expr(
            "((n_docs - distinct_texts) * 10000) div n_docs"
        ).alias("dup_rate_bp"),
        F.expr("(total_tokens * 100) div n_docs").alias("mean_tokens_x100"),
        "median_tokens",
        "min_tokens",
        "max_tokens",
    )


DATASET_CARD_SQL = """
WITH d AS (
  SELECT doc_id, lang, md5(text) AS h,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
agg AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT h) AS distinct_texts,
         MIN(n_tokens) AS min_tokens,
         MAX(n_tokens) AS max_tokens
  FROM d
),
med AS (
  SELECT n_tokens AS median_tokens FROM (
    SELECT n_tokens,
           ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rn,
           COUNT(*) OVER () AS cnt
    FROM d
  ) WHERE rn = (cnt + 1) // 2
)
SELECT n_docs, total_tokens, n_langs, distinct_texts,
       CAST(n_docs - distinct_texts AS BIGINT) AS exact_dup_docs,
       CAST(((n_docs - distinct_texts) * 10000) // n_docs AS BIGINT)
         AS dup_rate_bp,
       CAST((total_tokens * 100) // n_docs AS BIGINT) AS mean_tokens_x100,
       median_tokens, min_tokens, max_tokens
FROM agg CROSS JOIN med
"""


# --- C89: dataset version diff -----------------------------------------

_VDIFF_MOD = 9  # deterministic "edited in v2" subset


def dataset_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C89: the diff between two dataset VERSIONS — the data-versioning
    audit (what `dvc diff` / a lakehouse table diff reports) that gates
    a training-set refresh: per change class, how many documents and
    how many tokens moved. Version 1 is docs with doc_id % 3 != 2;
    version 2 drops doc_id % 3 == 0, keeps the rest, and "edits" every
    (doc_id % {_VDIFF_MOD} == 1) survivor (a deterministic text rewrite
    — token count changes, identity doesn't). Classes: added, removed,
    changed (same id, different content hash), unchanged.

    One scan builds both version frames map-side (no second copy of
    the corpus anywhere); the diff is a full-outer join on doc_id with
    hash comparison — at 100 TB this is the manifest-join every table
    format runs for snapshot diffs, keyed by the id. Token deltas are
    exact BIGINTs.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_tok = F.size(F.expr("filter(split(text, ' '), x -> x <> '')")).cast(
        "bigint"
    )
    v1 = docs.filter(F.col("doc_id") % 3 != 2).select(
        "doc_id", F.md5("text").alias("h1"), n_tok.alias("t1")
    )
    edited = F.concat(F.lit("v2 "), F.col("text"))
    v2_text = F.when(
        F.col("doc_id") % _VDIFF_MOD == 1, edited
    ).otherwise(F.col("text"))
    v2 = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select("doc_id", v2_text.alias("text"))
        .select(
            "doc_id",
            F.md5("text").alias("h2"),
            n_tok.alias("t2"),
        )
    )
    joined = v1.join(v2, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("h1").isNull(), "added")
        .when(F.col("h2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
        .alias("change"),
        F.coalesce("t1", F.lit(0)).alias("t1"),
        F.coalesce("t2", F.lit(0)).alias("t2"),
    )
    return (
        joined.groupBy("change")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("t1").alias("tokens_v1"),
            F.sum("t2").alias("tokens_v2"),
            F.sum(F.expr("t2 - t1")).alias("token_delta"),
        )
        .orderBy("change")
    )


DATASET_VERSION_DIFF_SQL = f"""
WITH d AS (
  SELECT doc_id, text,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS t
  FROM documents
),
v1 AS (
  SELECT doc_id, md5(text) AS h1, t AS t1 FROM d WHERE doc_id % 3 <> 2
),
v2 AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {_VDIFF_MOD} = 1
                  THEN 'v2 ' || text ELSE text END) AS h2,
         CAST(len(list_filter(string_split(
             CASE WHEN doc_id % {_VDIFF_MOD} = 1
                  THEN 'v2 ' || text ELSE text END, ' '), x -> x <> ''))
              AS BIGINT) AS t2
  FROM d WHERE doc_id % 3 <> 0
),
joined AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         CASE WHEN v1.h1 IS NULL THEN 'added'
              WHEN v2.h2 IS NULL THEN 'removed'
              WHEN v1.h1 <> v2.h2 THEN 'changed'
              ELSE 'unchanged' END AS change,
         COALESCE(v1.t1, 0) AS t1, COALESCE(v2.t2, 0) AS t2
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT change, COUNT(*) AS n_docs,
       CAST(SUM(t1) AS BIGINT) AS tokens_v1,
       CAST(SUM(t2) AS BIGINT) AS tokens_v2,
       CAST(SUM(t2 - t1) AS BIGINT) AS token_delta
FROM joined
GROUP BY change
ORDER BY change
"""


# --- C90: document novelty ---------------------------------------------

NOVELTY_K = 5  # shorter grams than C28: novelty wants phrase-level reuse


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C90: temporal novelty score per document — the fraction of a
    doc's {NOVELTY_K}-gram phrases never seen in any EARLIER document
    (doc_id as arrival order). Novelty-weighted sampling upranks
    documents that add new content and downranks recombinations of
    already-seen text; unlike dedup (C2/C28) this scores every doc on
    a continuum instead of flagging near-copies.

    Plan: distinct (doc_id, gram) postings, one groupBy(gram) for the
    FIRST-carrier id (min doc_id — the same posting-list shape as C28),
    one equi-join back, one groupBy(doc_id). novelty_bp is a
    scaled-integer floor division. Corpus-linear: every step is keyed
    by gram or doc.
    """
    from .quality import _gram_md5_expr, _toks_col

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", _toks_col()
    )
    grams = docs.select(
        "doc_id", F.explode(F.expr(_gram_md5_expr(NOVELTY_K))).alias("g")
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    scored = (
        grams.join(first.hint("shuffle_hash"), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("bigint")
            ).alias("novel_grams"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        "novel_grams",
        F.expr("(novel_grams * 10000) div n_grams").alias("novelty_bp"),
    ).orderBy("doc_id")


DOC_NOVELTY_SQL = f"""
WITH tok AS (
  SELECT doc_id, {{toks}} AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(toks) - {NOVELTY_K - 2}, 1)),
      i -> md5(array_to_string(toks[i:i+{NOVELTY_K - 1}], ' '))))) AS g
  FROM tok WHERE len(toks) >= {NOVELTY_K}
),
first AS (
  SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
),
scored AS (
  SELECT grams.doc_id, COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN first.first_doc = grams.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS novel_grams
  FROM grams JOIN first ON grams.g = first.g
  GROUP BY grams.doc_id
)
SELECT doc_id, n_grams, novel_grams,
       CAST((novel_grams * 10000) // n_grams AS BIGINT) AS novelty_bp
FROM scored
ORDER BY doc_id
"""


def _doc_novelty_sql() -> str:
    from .quality import _TOKS_SQL

    return DOC_NOVELTY_SQL.format(toks=_TOKS_SQL)


# --- C92: language-ID confusion matrix ---------------------------------


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C92: the classifier-evaluation artifact for C8 — the confusion
    matrix of the stopword language identifier against the labeled
    `lang` column, with per-true-language recall in basis points. This
    is how a curation pipeline decides whether its lang filter is
    dropping the wrong documents (the per-cell counts localize WHICH
    confusion loses data, which the single accuracy number hides).

    One groupBy over C8's per-doc verdicts (reusing the exact argmax
    expression — any drift between the classifier and its eval would
    break the shared oracle), plus a broadcast of the per-true-lang
    totals for the recall division (scaled-integer, never
    ROUND(double)).
    """
    preds = lang_id(spark, sf_dir).select("lang", "pred_lang")
    cells = preds.groupBy("lang", "pred_lang").agg(
        F.count("*").alias("n")
    )
    totals = preds.groupBy("lang").agg(F.count("*").alias("lang_total"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            "lang_total",
            F.expr("(n * 10000) div lang_total").alias("share_bp"),
            (F.col("lang") == F.col("pred_lang")).cast("int").alias(
                "is_diagonal"
            ),
        )
        .orderBy("lang", "pred_lang")
    )


def _langid_confusion_sql() -> str:
    return f"""
WITH verdicts AS ({LANG_ID_SQL.replace('ORDER BY doc_id', '')}),
cells AS (
  SELECT lang, pred_lang, COUNT(*) AS n
  FROM verdicts GROUP BY lang, pred_lang
),
totals AS (
  SELECT lang, COUNT(*) AS lang_total FROM verdicts GROUP BY lang
)
SELECT c.lang, c.pred_lang, c.n, t.lang_total,
       CAST((c.n * 10000) // t.lang_total AS BIGINT) AS share_bp,
       CAST(c.lang = c.pred_lang AS INT) AS is_diagonal
FROM cells c JOIN totals t ON c.lang = t.lang
ORDER BY c.lang, c.pred_lang
"""


def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C96 (round-7 addition): temperature-scaled domain-mixture
    weights — the upstream math of every multi-source pretraining mix
    (GPT-3 / The Pile style): per-domain sampling weight
    w_i = c_i^alpha / sum_j c_j^alpha for temperatures
    alpha in {1, 1/2, 1/4}, plus the implied epochs-per-domain
    (budget * w_i / c_i — how many times each domain's tokens are seen
    when the mix replaces natural sampling). alpha = 1 is natural
    frequency; cooler temperatures upweight small domains. C11's
    domain_mix_sample consumes FIXED proportions; this is the operator
    that PRODUCES them.

    Bit-identical across engines by construction:
    - alphas are restricted to sqrt chains (x, sqrt(x), sqrt(sqrt(x)))
      — IEEE-754 sqrt is correctly rounded in both engines, unlike
      pow(x, 0.3), which is only ~1 ulp and hash-diverges;
    - the per-alpha normalizer folds the per-domain scores IN SOURCE
      ORDER (F.aggregate over a sorted struct array here, list_reduce
      over list(... ORDER BY source) in DuckDB) — double addition is
      order-sensitive, so both engines must add in the same order;
      0.0 + x == x exactly, so Spark's 0-seeded fold equals DuckDB's
      first-element-seeded reduce;
    - every later step is a single correctly-rounded double op on
      already-identical operands (one divide for weight, one
      multiply + divide for epochs).

    Plan: one map-side-combined groupBy(source) over the corpus scan
    (|domains| rows out), a 3-row alpha stack, a |alphas|-row fold
    frame, and two broadcast joins — nothing downstream of the scan is
    data-proportional. At 100 TB the token count is the only pass.
    """
    from .dedup import _swap_persist

    docs = load_table(spark, sf_dir, "documents")
    # persist the |domains|-row rollup: three consumers (scores, the
    # ordered-fold normalizer, the budget scalar) would otherwise each
    # re-run the corpus token scan — the ONE data-proportional pass.
    # Routed through the _swap_persist slot convention so repeat
    # invocations in a long session swap (not stack) the cached copy.
    counts = _swap_persist(
        "mixture_temp_counts",
        docs.select(
            "source",
            F.expr(
                "size(filter(split(text, ' '), x -> x != ''))"
            ).alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("tokens")),
    )
    scored = counts.select(
        "source",
        "tokens",
        F.expr(
            "stack(3,"
            " '1.0',  CAST(tokens AS DOUBLE),"
            " '0.5',  sqrt(CAST(tokens AS DOUBLE)),"
            " '0.25', sqrt(sqrt(CAST(tokens AS DOUBLE)))"
            ") AS (alpha, score)"
        ),
    )
    totals = scored.groupBy("alpha").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "score"))),
            F.lit(0.0),
            lambda acc, x: acc + x["score"],
        ).alias("total")
    )
    budget = counts.agg(
        F.sum("tokens").cast("double").alias("budget")
    )
    return (
        scored.join(F.broadcast(totals), "alpha")
        .crossJoin(F.broadcast(budget))
        .select(
            "source",
            "alpha",
            "tokens",
            "score",
            (F.col("score") / F.col("total")).alias("weight"),
            (
                (F.col("budget") * (F.col("score") / F.col("total")))
                / F.col("tokens").cast("double")
            ).alias("epochs"),
        )
        .orderBy("alpha", "source")
    )


MIXTURE_TEMPERATURE_SQL = """
WITH counts AS (
  SELECT source,
         SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
           AS tokens
  FROM documents
  GROUP BY source
),
scored AS (
  SELECT source, tokens, alpha,
         CASE alpha
           WHEN '1.0' THEN CAST(tokens AS DOUBLE)
           WHEN '0.5' THEN sqrt(CAST(tokens AS DOUBLE))
           ELSE sqrt(sqrt(CAST(tokens AS DOUBLE)))
         END AS score
  FROM counts, (VALUES ('1.0'), ('0.5'), ('0.25')) alphas(alpha)
),
tot AS (
  SELECT alpha,
         list_reduce(list(score ORDER BY source), (a, b) -> a + b)
           AS total
  FROM scored GROUP BY alpha
),
b AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS budget FROM counts)
SELECT s.source,
       s.alpha,
       CAST(s.tokens AS BIGINT) AS tokens,
       s.score,
       s.score / t.total AS weight,
       (b.budget * (s.score / t.total)) / CAST(s.tokens AS DOUBLE)
         AS epochs
FROM scored s JOIN tot t USING (alpha), b
ORDER BY s.alpha, s.source
"""


_CDC_W = 24  # Gear window width (chars) == hash bits: mod 2^24 forgets lag-24+
_CDC_G_MULT = 2654435761  # Knuth multiplicative constant: the "Gear table"
_CDC_MOD = 1 << 24  # hash modulus (shift-1 recurrence -> 24-char window)
_CDC_THRESH = 1 << 18  # boundary iff hash < 2^18: top 6 bits zero, ~64-char chunks


def _gear_bounds_py(text: str) -> list[int]:
    """Gear boundary positions (1-indexed chunk-end chars) of `text`.

    h(p) = sum_{j=0..W-1} 2^j * G(c[p-j])  mod 2^W,  W = 24,
    G(c)  = (codepoint(c) * 2654435761) mod 2^W,
    boundary at p (p >= W) iff h(p) < 2^18 (top 6 bits zero, so every
    window char — not just the newest 6 — votes; ~1/64 positions).

    This is the closed form of the Gear recurrence
    h = (2*h + G(c)) mod 2^W: mod 2^W forgets chars older than W, so
    the hash IS a trailing-window hash and insertion stability holds
    (an edit reshapes at most the chunks within W chars past it). A
    byte-table Gear keeps G as 256 random constants; the multiplicative
    form is the same algebraic object, covers full Unicode (code
    points, not bytes), and — the oracle discipline — both engines can
    state it VERBATIM as integer multiply-add-mod, no opaque table.
    Vectorized: code points via utf-32 view, per-lag coefficients via
    a sliding-window matvec (int64-safe: 24 terms < 2^47 each).
    """
    import numpy as np

    n = len(text)
    if n < _CDC_W:
        return []
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    g = (cps.astype(np.int64) * _CDC_G_MULT) % _CDC_MOD
    win = np.lib.stride_tricks.sliding_window_view(g, _CDC_W)
    coeffs = (1 << np.arange(_CDC_W - 1, -1, -1, dtype=np.int64))
    h = (win @ coeffs) % _CDC_MOD
    return (np.nonzero(h < _CDC_THRESH)[0] + _CDC_W).tolist()


def content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C97 (round-7 addition; round-8 Gear rewrite): content-defined
    chunking — the Rabin-style variable-size chunker every
    dedup-friendly blob store runs (LBFS/restic/borg lineage): a chunk
    boundary falls wherever the Gear hash of the trailing {W}-char
    window lands below the threshold (see _gear_bounds_py), so an
    insertion early in a document only reshapes the chunks it
    touches — fixed-size chunking (C29 context_chunks) re-aligns
    EVERYTHING after the edit and defeats dedup. Per source: chunk
    count, unique-chunk count (by chunk hash), exact byte totals, and
    the dedup storage ratio in basis points — the report that sizes a
    chunk store before building it.

    Textbook basic CDC (no FastCDC min/max normalization — noted as
    the production variant; the boundary rule is the pure
    content-defined one both engines state verbatim). All exact:
    integer Gear hashes, md5 chunk digests, integer-div ratios.

    Plan: boundary positions computed WITHIN each row — round 8 swaps
    the r7 md5-per-position higher-order filter (a full md5 of the
    trailing window at EVERY position, the VERDICT r7 watch item) for
    the O(1)-per-position-equivalent Gear closed form, Arrow-batched
    and numpy-vectorized in a scalar pandas UDF (the interpreted-HOF
    inner fold would be the r5 knn_ivfpq trap). Spans explode from the
    per-doc boundary array; two map-side-combined groupBys
    (per-(source, hash), per source) are the only shuffles. Linear in
    corpus bytes by design — a chunker cannot read less than the
    data — but never shuffles the corpus.
    """
    import pandas as pd

    def _bounds_batch(texts: "pd.Series") -> "pd.Series":
        return texts.map(_gear_bounds_py)

    _bounds_batch.__annotations__ = {
        "texts": pd.Series, "return": pd.Series
    }
    gear_bounds = F.pandas_udf(_bounds_batch, "array<int>")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("n")
    )
    spans = (
        docs.withColumn("bs", gear_bounds("text"))
        .withColumn(
            "ends",
            F.expr(
                "CASE WHEN size(bs) > 0 AND element_at(bs, -1) = n"
                " THEN bs ELSE concat(bs, array(n)) END"
            ),
        )
        .withColumn(
            "span",
            F.explode(
                F.expr(
                    "transform(ends, (e, i) -> struct("
                    " CASE WHEN i = 0 THEN 1"
                    "      ELSE element_at(ends, i) + 1 END AS s,"
                    " e AS e))"
                )
            ),
        )
    )
    chunks = spans.select(
        "doc_id",
        "source",
        (F.col("span.e") - F.col("span.s") + 1).alias("chunk_len"),
        F.md5(
            F.expr("substring(text, span.s, span.e - span.s + 1)")
        ).alias("chunk_hash"),
    )
    per_chunk = chunks.groupBy("source", "chunk_hash").agg(
        F.count("*").alias("cnt"), F.max("chunk_len").alias("chunk_len")
    )
    return (
        per_chunk.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_chunks"),
            F.count("*").alias("n_unique_chunks"),
            F.sum(F.col("cnt") * F.col("chunk_len")).alias("total_chars"),
            F.sum("chunk_len").alias("unique_chars"),
        )
        .select(
            "source",
            "n_chunks",
            "n_unique_chunks",
            "total_chars",
            "unique_chars",
            F.expr("(unique_chars * 10000) div total_chars").alias(
                "dedup_ratio_bp"
            ),
            F.expr("total_chars div n_chunks").alias("avg_chunk_len"),
        )
        .orderBy("source")
    )


CONTENT_DEFINED_CHUNKING_SQL = f"""
WITH docs AS (
  SELECT doc_id, source, text, len(text) AS n,
         list_transform(string_split(text, ''),
                        c -> (ascii(c) * {_CDC_G_MULT}) % {_CDC_MOD}) AS g
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(range({_CDC_W}, n + 1)) AS p, g
  FROM docs
),
bounds AS (
  SELECT doc_id, p
  FROM pos
  WHERE list_sum(list_transform(range(0, {_CDC_W}),
                                j -> g[p - j] * (1 << j))) % {_CDC_MOD}
        < {_CDC_THRESH}
),
ends AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT doc_id, p FROM bounds
    UNION ALL
    SELECT doc_id, n AS p FROM docs
  )
),
spans AS (
  SELECT doc_id,
         p,
         COALESCE(LAG(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS s
  FROM ends
),
chunks AS (
  SELECT sp.doc_id, d.source,
         sp.p - sp.s + 1 AS chunk_len,
         md5(substr(d.text, sp.s, sp.p - sp.s + 1)) AS chunk_hash
  FROM spans sp JOIN docs d USING (doc_id)
),
per_chunk AS (
  SELECT source, chunk_hash, COUNT(*) AS cnt, MAX(chunk_len) AS chunk_len
  FROM chunks GROUP BY source, chunk_hash
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       COUNT(*) AS n_unique_chunks,
       CAST(SUM(cnt * chunk_len) AS BIGINT) AS total_chars,
       CAST(SUM(chunk_len) AS BIGINT) AS unique_chars,
       CAST((SUM(chunk_len) * 10000) // SUM(cnt * chunk_len) AS BIGINT)
         AS dedup_ratio_bp,
       CAST(SUM(cnt * chunk_len) // SUM(cnt) AS BIGINT) AS avg_chunk_len
FROM per_chunk
GROUP BY source
ORDER BY source
"""


# --- C98 (round-8 addition): FastCDC normalized chunking ---------------

_FCDC_MIN = 16    # minimum chunk length (chars): skip-zone after a cut
_FCDC_AVG = 64    # normalization point: mask switches hard -> easy here
_FCDC_MAX = 256   # forced cut — bounds every chunk for the blob store
_FCDC_T_HARD = 1 << 16  # near-region threshold (1/256): suppresses shorts
_FCDC_T_EASY = 1 << 20  # far-region threshold (1/16): rescues longs


def _gear_hashes_py(text: str):
    """Gear hash h(p) for every end position p in [W, n] — the C97
    closed form, shared verbatim by both chunkers (numpy-vectorized;
    see _gear_bounds_py for the math and the overflow bounds)."""
    import numpy as np

    n = len(text)
    if n < _CDC_W:
        return np.zeros(0, dtype=np.int64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    g = (cps.astype(np.int64) * _CDC_G_MULT) % _CDC_MOD
    win = np.lib.stride_tricks.sliding_window_view(g, _CDC_W)
    coeffs = (1 << np.arange(_CDC_W - 1, -1, -1, dtype=np.int64))
    return (win @ coeffs) % _CDC_MOD


def _fastcdc_bounds_py(text: str) -> list[int]:
    """FastCDC (Xia et al., USENIX ATC'16) boundary positions with
    min/avg/max normalization over the C97 Gear hash:

    from chunk start s (1-indexed), the next cut e is the SMALLEST
    end position p with
      - len = p-s+1 in [MIN, AVG] and h(p) < T_HARD   (near: strict), or
      - len in (AVG, MAX)        and h(p) < T_EASY    (far: lenient),
    else the forced cut at len = MAX (or the doc end). The skip-zone
    below MIN kills the exponential tail of tiny chunks, the two-mask
    normalization pulls lengths toward AVG, and the MAX cut bounds
    every chunk — the three production fixes over basic CDC (C97),
    at the cost of WEAKER insertion stability around forced cuts
    (boundaries below MIN after an edit are suppressed, so resync
    happens at the next surviving content boundary).

    Sequential by nature (each cut depends on the previous), but the
    scan state is one integer: the hash vector is the vectorized C97
    closed form, candidate positions per mask are precomputed arrays,
    and each step is two np.searchsorted probes — O(chunks) python
    steps per doc, not O(chars).
    """
    import numpy as np

    n = len(text)
    h = _gear_hashes_py(text)
    # end positions (1-indexed) carrying each h value: W, W+1, .., n
    pos = np.arange(_CDC_W, n + 1, dtype=np.int64)
    hard_pos = pos[h < _FCDC_T_HARD]
    easy_pos = pos[h < _FCDC_T_EASY]
    bounds: list[int] = []
    s = 1
    while s + _FCDC_MAX - 1 < n:
        near_lo, near_hi = s + _FCDC_MIN - 1, s + _FCDC_AVG - 1
        far_hi = s + _FCDC_MAX - 1
        i = np.searchsorted(hard_pos, near_lo)
        if i < len(hard_pos) and hard_pos[i] <= near_hi:
            e = int(hard_pos[i])
        else:
            j = np.searchsorted(easy_pos, near_hi + 1)
            if j < len(easy_pos) and easy_pos[j] < far_hi:
                e = int(easy_pos[j])
            else:
                e = far_hi  # forced cut at MAX
        bounds.append(e)
        s = e + 1
    return bounds  # the final [s, n] remainder chunk is implicit


def fastcdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C98 (round-8 addition): FastCDC normalized content-defined
    chunking — the PRODUCTION variant C97's docstring names: basic CDC
    (C97) has an exponential chunk-length tail (tiny chunks bloat the
    chunk index, giant chunks kill dedup granularity); FastCDC's
    min-skip / two-mask normalization / max-cut bounds every chunk in
    [MIN, MAX] and concentrates mass near AVG. Per source: chunk
    count, unique-chunk count, exact byte totals, dedup ratio in basis
    points, and the min/max NON-FINAL chunk lengths — the [MIN, MAX]
    bound the normalization exists to enforce (final chunks are the
    remainder and may run short).

    Plan: identical shape to C97 — boundaries WITHIN the row (pandas
    UDF; the sequential cut recurrence costs O(chunks) numpy probes
    per doc on top of the vectorized Gear hash), spans exploded from
    the boundary array, two map-side-combined groupBys the only
    shuffles. The oracle states the SAME recurrence as a DuckDB
    recursive CTE over the per-position Gear hashes (each step picks
    the minimal qualifying cut via a correlated aggregate — sequential
    semantics, declaratively stated).
    """
    import pandas as pd

    def _bounds_batch(texts: "pd.Series") -> "pd.Series":
        return texts.map(_fastcdc_bounds_py)

    _bounds_batch.__annotations__ = {
        "texts": pd.Series, "return": pd.Series
    }
    fc_bounds = F.pandas_udf(_bounds_batch, "array<int>")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("n")
    )
    spans = (
        docs.withColumn("bs", fc_bounds("text"))
        .withColumn(
            "ends",
            F.expr(
                "CASE WHEN size(bs) > 0 AND element_at(bs, -1) = n"
                " THEN bs ELSE concat(bs, array(n)) END"
            ),
        )
        .withColumn(
            "span",
            F.explode(
                F.expr(
                    "transform(ends, (e, i) -> struct("
                    " CASE WHEN i = 0 THEN 1"
                    "      ELSE element_at(ends, i) + 1 END AS s,"
                    " e AS e,"
                    " i = size(ends) - 1 AS is_final))"
                )
            ),
        )
    )
    chunks = spans.select(
        "source",
        (F.col("span.e") - F.col("span.s") + 1).alias("chunk_len"),
        F.col("span.is_final").alias("is_final"),
        F.md5(
            F.expr("substring(text, span.s, span.e - span.s + 1)")
        ).alias("chunk_hash"),
    )
    per_chunk = chunks.groupBy("source", "chunk_hash").agg(
        F.count("*").alias("cnt"),
        F.max("chunk_len").alias("chunk_len"),
        # a hash observed only as a final-remainder chunk is exempt
        # from the [MIN, MAX] bound report
        F.min(F.col("is_final").cast("int")).alias("all_final"),
    )
    return (
        per_chunk.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_chunks"),
            F.count("*").alias("n_unique_chunks"),
            F.sum(F.col("cnt") * F.col("chunk_len")).alias("total_chars"),
            F.sum("chunk_len").alias("unique_chars"),
            F.min(
                F.when(F.col("all_final") == 0, F.col("chunk_len"))
            ).alias("min_body_len"),
            F.max(
                F.when(F.col("all_final") == 0, F.col("chunk_len"))
            ).alias("max_body_len"),
        )
        .select(
            "source",
            "n_chunks",
            "n_unique_chunks",
            "total_chars",
            "unique_chars",
            F.expr("(unique_chars * 10000) div total_chars").alias(
                "dedup_ratio_bp"
            ),
            "min_body_len",
            "max_body_len",
        )
        .orderBy("source")
    )


FASTCDC_CHUNKING_SQL = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, source, text, len(text) AS n,
         list_transform(string_split(text, ''),
                        c -> (ascii(c) * {_CDC_G_MULT}) % {_CDC_MOD}) AS g
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(range({_CDC_W}, n + 1)) AS p, g
  FROM docs
),
hashes AS (
  SELECT doc_id, p,
         list_sum(list_transform(range(0, {_CDC_W}),
                                 j -> g[p - j] * (1 << j))) % {_CDC_MOD}
           AS h
  FROM pos
),
cuts AS (
  SELECT doc_id, 0 AS e, 0 AS i FROM docs
  UNION ALL
  SELECT c.doc_id,
         COALESCE(
           (SELECT MIN(k.p) FROM hashes k
             WHERE k.doc_id = c.doc_id
               AND k.p >= c.e + {_FCDC_MIN}
               AND k.p < c.e + {_FCDC_MAX}
               AND ((k.p <= c.e + {_FCDC_AVG} AND k.h < {_FCDC_T_HARD})
                 OR (k.p > c.e + {_FCDC_AVG} AND k.h < {_FCDC_T_EASY}))),
           c.e + {_FCDC_MAX}) AS e,
         c.i + 1
  FROM cuts c JOIN docs d USING (doc_id)
  WHERE c.e + {_FCDC_MAX} < d.n
),
ends AS (
  SELECT doc_id, e, i FROM cuts WHERE i > 0
  UNION ALL
  SELECT doc_id, n AS e,
         (SELECT COALESCE(MAX(i), 0) + 1 FROM cuts c
           WHERE c.doc_id = docs.doc_id) AS i
  FROM docs
),
spans AS (
  SELECT doc_id, e, i,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s,
         i = (SELECT MAX(i) FROM ends e2 WHERE e2.doc_id = ends.doc_id)
           AS is_final
  FROM ends
),
chunks AS (
  SELECT sp.doc_id, d.source,
         sp.e - sp.s + 1 AS chunk_len,
         sp.is_final,
         md5(substr(d.text, sp.s, sp.e - sp.s + 1)) AS chunk_hash
  FROM spans sp JOIN docs d USING (doc_id)
),
per_chunk AS (
  SELECT source, chunk_hash, COUNT(*) AS cnt, MAX(chunk_len) AS chunk_len,
         MIN(CASE WHEN is_final THEN 1 ELSE 0 END) AS all_final
  FROM chunks GROUP BY source, chunk_hash
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       COUNT(*) AS n_unique_chunks,
       CAST(SUM(cnt * chunk_len) AS BIGINT) AS total_chars,
       CAST(SUM(chunk_len) AS BIGINT) AS unique_chars,
       CAST((SUM(chunk_len) * 10000) // SUM(cnt * chunk_len) AS BIGINT)
         AS dedup_ratio_bp,
       CAST(MIN(CASE WHEN all_final = 0 THEN chunk_len END) AS BIGINT)
         AS min_body_len,
       CAST(MAX(CASE WHEN all_final = 0 THEN chunk_len END) AS BIGINT)
         AS max_body_len
FROM per_chunk
GROUP BY source
ORDER BY source
"""


# --- C103 (round-8 addition): padding waste audit ------------------------

_PAD_B = 32  # micro-batch size for the padding audit


def padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C103 (round-8 addition): padding-waste audit — the number that
    justifies length-sorted (bucketed) batching in every training
    loader: batches pad to their longest member, so the cost of a
    batch is B * max(len) and the waste is that minus the real
    tokens. Computed for BOTH disciplines over the same corpus:
    'arrival' (doc_id order — the naive loader) and 'sorted'
    (token-count order — bucketed batching), per source, batch size
    {b}. All integer-exact: whitespace token counts, integer division
    batch assignment, waste basis points by floor division.

    Plan: one scan computes token counts; each discipline is a
    per-source row_number (sort shuffle — never a global order), an
    integer div into batch ids, one (source, batch) rollup, one
    source rollup. The oracle states the identical windows; the final
    row set is 2 rows per source.
    """.format(b=_PAD_B)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            "size(filter(split(text, ' '), t -> t != ''))"
        ).cast("long").alias("tok"),
    )

    def discipline(name: str, order_cols) -> DataFrame:
        w = Window.partitionBy("source").orderBy(*order_cols)
        batches = (
            docs.withColumn(
                "batch", ((F.row_number().over(w) - 1) / _PAD_B).cast("long")
            )
            .groupBy("source", "batch")
            .agg(
                F.count("*").alias("rows"),
                F.max("tok").alias("max_tok"),
                F.sum("tok").alias("sum_tok"),
            )
        )
        return batches.groupBy("source").agg(
            F.lit(name).alias("discipline"),
            F.count("*").alias("n_batches"),
            F.sum("sum_tok").alias("total_tokens"),
            F.sum(F.col("rows") * F.col("max_tok")).alias("padded_tokens"),
        )
    arrival = discipline("arrival", [F.asc("doc_id")])
    by_len = discipline("sorted", [F.asc("tok"), F.asc("doc_id")])
    return (
        arrival.unionByName(by_len)
        .select(
            "source",
            "discipline",
            "n_batches",
            "total_tokens",
            "padded_tokens",
            (F.col("padded_tokens") - F.col("total_tokens")).alias("waste"),
            F.expr(
                "(padded_tokens - total_tokens) * 10000 div padded_tokens"
            ).alias("waste_bp"),
        )
        .orderBy("source", "discipline")
    )


PADDING_WASTE_AUDIT_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
),
assigned AS (
  SELECT source, tok, 'arrival' AS discipline,
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
           // {_PAD_B} AS batch
  FROM toks
  UNION ALL
  SELECT source, tok, 'sorted',
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY tok, doc_id) - 1)
           // {_PAD_B}
  FROM toks
),
batches AS (
  SELECT source, discipline, batch,
         COUNT(*) AS rows_, MAX(tok) AS max_tok, SUM(tok) AS sum_tok
  FROM assigned
  GROUP BY source, discipline, batch
)
SELECT source, discipline,
       COUNT(*) AS n_batches,
       CAST(SUM(sum_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(rows_ * max_tok) AS BIGINT) AS padded_tokens,
       CAST(SUM(rows_ * max_tok) - SUM(sum_tok) AS BIGINT) AS waste,
       CAST((SUM(rows_ * max_tok) - SUM(sum_tok)) * 10000
            // SUM(rows_ * max_tok) AS BIGINT) AS waste_bp
FROM batches
GROUP BY source, discipline
ORDER BY source, discipline
"""


_KFOLD_K = 5


def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C107 (round-8 addition): deterministic stratified k-fold
    assignment audit — the split plan behind cross-validated eval:
    within each stratum (source), docs are ordered by a keyed content
    hash (a deterministic shuffle) and dealt round-robin into {k}
    folds, so per-stratum fold sizes differ by AT MOST ONE — the
    balance guarantee plain hash-mod assignment cannot give (binomial
    spread grows with the stratum). Emits every (source, fold) cell
    (zeros included via the fold spine: a stratum smaller than {k}
    leaves visible empty folds) with the per-stratum max-min spread
    repeated per row so the audit threshold (spread <= 1) is a column
    scan, not a join.

    Plan: one per-stratum sort shuffle (row_number over source — never
    a global window), modulo deal, one rollup, broadcast fold spine,
    constant full-partition window min/max. The oracle states the
    identical window with the unique doc_id tiebreak (engine-portable
    peer order).
    """.format(k=_KFOLD_K)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat_ws("|", F.lit("kfold-v1"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    assigned = docs.select(
        "source",
        ((F.row_number().over(w) - 1) % _KFOLD_K).alias("fold"),
    )
    counts = assigned.groupBy("source", "fold").agg(F.count("*").alias("n_docs"))
    spine = (
        docs.select("source").distinct()
        .select("source", F.explode(F.expr(f"sequence(0, {_KFOLD_K - 1})")).alias("fold"))
    )
    w_src = Window.partitionBy("source")
    return (
        spine.join(counts, ["source", "fold"], "left")
        .select("source", "fold", F.coalesce("n_docs", F.lit(0)).alias("n_docs"))
        .withColumn(
            "spread",
            F.max("n_docs").over(w_src) - F.min("n_docs").over(w_src),
        )
        .orderBy("source", "fold")
    )


STRATIFIED_KFOLD_SQL = f"""
WITH hashed AS (
  SELECT doc_id, source,
         md5('kfold-v1' || '|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
assigned AS (
  SELECT source,
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) - 1)
           % {_KFOLD_K} AS fold
  FROM hashed
),
counts AS (
  SELECT source, fold, COUNT(*) AS n_docs FROM assigned GROUP BY source, fold
),
spine AS (
  SELECT s.source, f.fold
  FROM (SELECT DISTINCT source FROM documents) s,
       (SELECT unnest(range(0, {_KFOLD_K})) AS fold) f
),
filled AS (
  SELECT sp.source, sp.fold, COALESCE(c.n_docs, 0) AS n_docs
  FROM spine sp LEFT JOIN counts c
    ON c.source = sp.source AND c.fold = sp.fold
)
SELECT source, CAST(fold AS BIGINT) AS fold, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(MAX(n_docs) OVER (PARTITION BY source)
              - MIN(n_docs) OVER (PARTITION BY source) AS BIGINT) AS spread
FROM filled
ORDER BY source, fold
"""


_CALIB_NB = 10


def langid_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C108 (round-8 addition): calibration report (reliability table +
    ECE) for the C8 stopword language classifier — the eval every
    score-thresholded curation filter needs before its confidences are
    trusted: per confidence bucket, how often is the classifier
    actually right? Confidence = max stopword-hit share in bp
    (integer), bucketed into {nb} equal bins; per bucket the doc
    count, accuracy (bp), mean confidence (bp), and gap; the expected
    calibration error ECE = sum(n_b * |gap_b|) div N repeated per row.
    Docs with zero stopword hits ('und' — the classifier abstains) are
    out of scope by statement. Every bucket reports; empty buckets
    carry NULL accuracy/confidence (no docs to average), not zeros.

    Plan: one token explode + (doc, lang) rollup (C8's exact hit
    logic), map-side confidence/pred, one bucket rollup, broadcast
    bucket spine, and the ECE as a 1-row aggregate broadcast back
    (the B32/C34 scalar idiom — never a global window). Integer bp
    arithmetic end-to-end: no ROUND, no float shares.
    """.format(nb=_CALIB_NB)
    docs = load_table(spark, sf_dir, "documents")
    tok = _tok(docs)
    hits = tok.groupBy("doc_id", "lang").agg(
        *[
            F.sum(F.when(F.col("w").isin(*words), 1).otherwise(0)).alias(f"{code}_hits")
            for code, words in STOPWORDS.items()
        ]
    )
    pred = F.expr(
        "CASE WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und' "
        "WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de' "
        "WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en' "
        "WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END"
    )
    scored = (
        hits.withColumn("total", F.expr("de_hits + en_hits + es_hits + fr_hits"))
        .filter(F.col("total") > 0)
        .withColumn(
            "conf_bp",
            F.expr("greatest(de_hits, en_hits, es_hits, fr_hits) * 10000 div total"),
        )
        .withColumn("ok", (pred == F.col("lang")).cast("long"))
        .select(
            F.least(F.expr(f"conf_bp div {10000 // _CALIB_NB}"), F.lit(_CALIB_NB - 1)).alias("bucket"),
            "conf_bp",
            "ok",
        )
    )
    buckets = scored.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("ok").alias("n_ok"),
        F.sum("conf_bp").alias("sum_conf"),
    )
    spine = spark.range(_CALIB_NB).select(F.col("id").cast("int").alias("bucket"))
    filled = (
        spine.join(buckets, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.expr("n_ok * 10000 div n").alias("acc_bp"),
            F.expr("sum_conf div n").alias("avg_conf_bp"),
        )
        .withColumn("gap_bp", F.col("acc_bp") - F.col("avg_conf_bp"))
    )
    ece = filled.agg(
        F.expr(
            "CASE WHEN sum(n) > 0 THEN "
            "sum(coalesce(n * abs(gap_bp), 0)) div sum(n) ELSE 0 END"
        ).alias("ece_bp")
    )
    return (
        filled.crossJoin(F.broadcast(ece))
        .select("bucket", "n", "acc_bp", "avg_conf_bp", "gap_bp", "ece_bp")
        .orderBy("bucket")
    )


LANGID_CALIBRATION_SQL = f"""
WITH {_TOK_SQL.strip()},
hits AS (
  SELECT doc_id, lang,
         CAST(SUM(CASE WHEN w IN ({{de}}) THEN 1 ELSE 0 END) AS BIGINT) AS de_hits,
         CAST(SUM(CASE WHEN w IN ({{en}}) THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
         CAST(SUM(CASE WHEN w IN ({{es}}) THEN 1 ELSE 0 END) AS BIGINT) AS es_hits,
         CAST(SUM(CASE WHEN w IN ({{fr}}) THEN 1 ELSE 0 END) AS BIGINT) AS fr_hits
  FROM tok2
  GROUP BY doc_id, lang
),
scored AS (
  SELECT LEAST(greatest(de_hits, en_hits, es_hits, fr_hits) * 10000
                 // (de_hits + en_hits + es_hits + fr_hits)
                 // {10000 // _CALIB_NB}, {_CALIB_NB - 1}) AS bucket,
         greatest(de_hits, en_hits, es_hits, fr_hits) * 10000
           // (de_hits + en_hits + es_hits + fr_hits) AS conf_bp,
         CASE WHEN lang = CASE
             WHEN greatest(de_hits, en_hits, es_hits, fr_hits) = 0 THEN 'und'
             WHEN de_hits >= en_hits AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
             WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
             WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END
           THEN 1 ELSE 0 END AS ok
  FROM hits
  WHERE de_hits + en_hits + es_hits + fr_hits > 0
),
buckets AS (
  SELECT bucket, COUNT(*) AS n, SUM(ok) AS n_ok, SUM(conf_bp) AS sum_conf
  FROM scored GROUP BY bucket
),
filled AS (
  SELECT s.bucket,
         COALESCE(b.n, 0) AS n,
         b.n_ok * 10000 // b.n AS acc_bp,
         b.sum_conf // b.n AS avg_conf_bp
  FROM (SELECT unnest(range(0, {_CALIB_NB})) AS bucket) s
  LEFT JOIN buckets b ON b.bucket = s.bucket
),
ece AS (
  SELECT CASE WHEN SUM(n) > 0 THEN
           SUM(COALESCE(n * ABS(acc_bp - avg_conf_bp), 0)) // SUM(n)
         ELSE 0 END AS ece_bp
  FROM filled
)
SELECT CAST(f.bucket AS INTEGER) AS bucket, CAST(f.n AS BIGINT) AS n,
       CAST(f.acc_bp AS BIGINT) AS acc_bp,
       CAST(f.avg_conf_bp AS BIGINT) AS avg_conf_bp,
       CAST(f.acc_bp - f.avg_conf_bp AS BIGINT) AS gap_bp,
       CAST(e.ece_bp AS BIGINT) AS ece_bp
FROM filled f, ece e
ORDER BY f.bucket
"""
LANGID_CALIBRATION_SQL = LANGID_CALIBRATION_SQL.format(
    de=_inlist(STOPWORDS["de"]),
    en=_inlist(STOPWORDS["en"]),
    es=_inlist(STOPWORDS["es"]),
    fr=_inlist(STOPWORDS["fr"]),
)


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C109 (round-8 addition): tokenizer fertility audit per language
    — the multilingual-cost-skew number every tokenizer choice is
    judged on: how many subword (BPE-ish regex) tokens the tokenizer
    spends per whitespace word and per character in each language, and
    each language's premium over the corpus-wide rate (a language
    whose fertility_ppm is 2x the baseline pays 2x the context budget
    for the same text). Integer ppm end-to-end (floor division; C10's
    exact token definitions), corpus totals via a 1-row aggregate
    broadcast back — never a global window.

    Plan: one scan computes per-doc ws/bpe/char counts map-side (the
    C10 expressions), one per-lang rollup, one scalar rollup broadcast
    back. Fertility of the whole corpus at 100 TB is two shuffles of
    |langs| and 1 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)"))
    per_doc = docs.select(
        "lang",
        ws.alias("n_ws"),
        bpe.alias("n_bpe"),
        F.length("text").alias("n_chars"),
    )
    per_lang = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws").alias("ws_tokens"),
        F.sum("n_bpe").alias("bpe_tokens"),
        F.sum("n_chars").alias("chars"),
    )
    totals = per_doc.agg(
        F.sum("n_ws").alias("t_ws"), F.sum("n_bpe").alias("t_bpe")
    )
    return (
        per_lang.crossJoin(F.broadcast(totals))
        .select(
            "lang", "n_docs", "ws_tokens", "bpe_tokens", "chars",
            F.expr("bpe_tokens * 1000000 div ws_tokens").alias("fertility_ppm"),
            F.expr("chars * 1000000 div bpe_tokens").alias("chars_per_bpe_ppm"),
            F.expr(
                "(bpe_tokens * 1000000 div ws_tokens) * 1000000"
                " div (t_bpe * 1000000 div t_ws)"
            ).alias("premium_ppm"),
        )
        .orderBy("lang")
    )


TOKENIZER_FERTILITY_SQL = f"""
WITH per_doc AS (
  SELECT lang,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws,
         len(regexp_extract_all(text, '{{bpe}}')) AS n_bpe,
         length(text) AS n_chars
  FROM documents
),
per_lang AS (
  SELECT lang, COUNT(*) AS n_docs, SUM(n_ws) AS ws_tokens,
         SUM(n_bpe) AS bpe_tokens, SUM(n_chars) AS chars
  FROM per_doc GROUP BY lang
),
totals AS (
  SELECT SUM(n_ws) AS t_ws, SUM(n_bpe) AS t_bpe FROM per_doc
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(ws_tokens AS BIGINT) AS ws_tokens,
       CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
       CAST(chars AS BIGINT) AS chars,
       CAST(bpe_tokens * 1000000 // ws_tokens AS BIGINT) AS fertility_ppm,
       CAST(chars * 1000000 // bpe_tokens AS BIGINT) AS chars_per_bpe_ppm,
       CAST((bpe_tokens * 1000000 // ws_tokens) * 1000000
              // (t_bpe * 1000000 // t_ws) AS BIGINT) AS premium_ppm
FROM per_lang, totals
ORDER BY lang
"""
TOKENIZER_FERTILITY_SQL = TOKENIZER_FERTILITY_SQL.format(bpe=BPE_PATTERN)


_COLLOC_MIN_N, _COLLOC_TOPK = 5, 50


def collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C110 (round-8 addition): collocation extraction — the corpus-
    linguistics pass behind phrase vocabularies and tokenizer merge
    seeding: adjacent word pairs whose co-occurrence beats the
    independence expectation, ranked by LIFT = P(w1w2)/(P(w1)P(w2)).
    Lift instead of PMI because lift's ratio is computed in one
    deterministic double expression with a FLOOR to ppm (identical
    IEEE evaluation in both engines), while PMI's log is not
    bit-portable; the RANKING is identical (log is monotone). Min
    support {minn} occurrences, top {k} with a full deterministic
    tiebreak (lift desc, pair asc).

    Plan: bigrams built ARRAY-side per doc (transform over the token
    array — no window, no shuffle), one bigram rollup + one unigram
    rollup (both map-side combined), corpus totals as a 1-row
    aggregate broadcast back, two broadcast-able unigram joins (the
    unigram table is vocabulary-sized, exploding feed-size is never
    joined to itself), then a global TakeOrdered top-{k} — never a
    full sort of the pair space.
    """.format(minn=_COLLOC_MIN_N, k=_COLLOC_TOPK)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "toks", F.filter(F.split("text", " "), lambda w: w != "")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(0, size(toks) - 2), "
                "i -> struct(toks[i] AS w1, toks[i + 1] AS w2)) "
                "ELSE array() END"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_xy"))
    totals = toks.select(
        F.sum(F.size("toks")).alias("n_tokens"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("n_bigrams"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (
        bg_counts.filter(F.col("n_xy") >= _COLLOC_MIN_N)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "n_xy", "n_w1", "n_w2",
            F.floor(
                F.expr(
                    "CAST(n_xy AS DOUBLE) * CAST(n_tokens AS DOUBLE)"
                    " * CAST(n_tokens AS DOUBLE) * 1e6"
                    " / (CAST(n_bigrams AS DOUBLE) * CAST(n_w1 AS DOUBLE)"
                    " * CAST(n_w2 AS DOUBLE))"
                )
            ).cast("long").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(_COLLOC_TOPK)
    )


COLLOCATION_LIFT_SQL = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
bigrams AS (
  SELECT unnest([{{'w1': toks[i], 'w2': toks[i + 1]}}
                 FOR i IN range(1, len(toks))], recursive := true)
  FROM tok
),
uni AS (
  SELECT w, COUNT(*) AS n_w
  FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w
),
bg_counts AS (
  SELECT w1, w2, COUNT(*) AS n_xy FROM bigrams GROUP BY w1, w2
),
totals AS (
  SELECT SUM(len(toks)) AS n_tokens,
         SUM(GREATEST(len(toks) - 1, 0)) AS n_bigrams
  FROM tok
)
SELECT b.w1, b.w2, CAST(b.n_xy AS BIGINT) AS n_xy,
       CAST(u1.n_w AS BIGINT) AS n_w1, CAST(u2.n_w AS BIGINT) AS n_w2,
       CAST(FLOOR(CAST(b.n_xy AS DOUBLE) * CAST(t.n_tokens AS DOUBLE)
                  * CAST(t.n_tokens AS DOUBLE) * 1e6
                  / (CAST(t.n_bigrams AS DOUBLE) * CAST(u1.n_w AS DOUBLE)
                     * CAST(u2.n_w AS DOUBLE))) AS BIGINT) AS lift_ppm
FROM bg_counts b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN totals t
WHERE b.n_xy >= {_COLLOC_MIN_N}
ORDER BY lift_ppm DESC, b.w1, b.w2
LIMIT {_COLLOC_TOPK}
"""


_BOILER_SEG_W = 8       # tokens per disjoint segment (the pseudo-line)
_BOILER_DF_PCT = 25     # boilerplate iff df >= max(2, ceil(pct% of source docs))


def boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C112 (round-8 addition): repeated-segment boilerplate screen —
    the CCNet/RefinedWeb curation pass that exact and near dedup both
    miss (they compare whole documents; boilerplate is a SHORT unit
    repeated across MANY documents of one source: nav bars, cookie
    banners, footers). The unit here is the deterministic pseudo-line
    both engines can state — disjoint {w}-token segments in document
    order (final partial segment included) — and a segment is
    boilerplate within its source iff its document frequency reaches
    max(2, ceil({p}% of the source's docs)). Per source: doc/char
    totals, segment instance and distinct counts, boilerplate distinct
    segments, their instance count, the documents affected, the exact
    removable chars (sum of segment string length over boilerplate
    instances), and the removal share in basis points. All integers.

    The sf corpora draw tokens ~uniformly, so cross-document segment
    collisions are essentially absent and every source reports zero
    boilerplate — the semantics are carried by the crafted planted-
    boilerplate pytest (the C102/C104 discipline).

    Plan: segmentation is array-side per row (split -> slice windows —
    no explode until segments exist); one (source, doc, segment)
    rollup, one (source, segment) rollup on the SAME key prefix, the
    per-source doc totals broadcast back (|sources| rows), the flag
    map-side, affected-docs via one more rollup of the doc-level rows
    against flagged segments. Shuffle keys are always (source,
    segment[, doc]) — never a global window; at 100 TB the heavy
    relation is the segment-instance table, linear in corpus tokens.
    """.format(w=_BOILER_SEG_W, p=_BOILER_DF_PCT)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    seg_expr = (
        "CASE WHEN size(toks) = 0 THEN array() ELSE "
        "transform(sequence(0, (size(toks) + {w} - 1) div {w} - 1), "
        "i -> array_join(slice(toks, i * {w} + 1, {w}), ' ')) END"
    ).format(w=_BOILER_SEG_W)
    inst = (
        docs.withColumn(
            "toks", F.filter(F.split("text", " "), lambda x: x != "")
        )
        .withColumn("seg", F.explode_outer(F.expr(seg_expr)))
        .select("source", "doc_id", "seg")
    )
    per_doc_seg = (
        inst.filter(F.col("seg").isNotNull())
        .groupBy("source", "doc_id", "seg")
        .agg(F.count("*").alias("n_inst"))
    )
    src_totals = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    per_seg = (
        per_doc_seg.groupBy("source", "seg")
        .agg(F.count("*").alias("df"), F.sum("n_inst").alias("inst"))
        .join(F.broadcast(src_totals.select("source", "n_docs")), "source")
        .withColumn(
            "is_boiler",
            F.col("df")
            >= F.greatest(
                F.lit(2),
                F.expr(f"(n_docs * {_BOILER_DF_PCT} + 99) div 100"),
            ),
        )
    )
    seg_stats = per_seg.groupBy("source").agg(
        F.sum("inst").alias("n_segments"),
        F.count("*").alias("n_distinct_segments"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_boilerplate_segments"),
        F.sum(F.when(F.col("is_boiler"), F.col("inst")).otherwise(0)).alias(
            "boiler_instances"
        ),
        F.sum(
            F.when(F.col("is_boiler"), F.col("inst") * F.length("seg")).otherwise(0)
        ).alias("removable_chars"),
    )
    affected = (
        per_doc_seg.join(
            per_seg.filter("is_boiler").select("source", "seg"),
            ["source", "seg"],
            "left_semi",
        )
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("affected_docs"))
    )
    return (
        src_totals.join(seg_stats, "source", "left")
        .join(affected, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_distinct_segments", F.lit(0)).alias(
                "n_distinct_segments"
            ),
            F.coalesce("n_boilerplate_segments", F.lit(0)).alias(
                "n_boilerplate_segments"
            ),
            F.coalesce("boiler_instances", F.lit(0)).alias("boiler_instances"),
            F.coalesce("affected_docs", F.lit(0)).alias("affected_docs"),
            F.coalesce("removable_chars", F.lit(0)).alias("removable_chars"),
            F.expr(
                "coalesce(removable_chars, 0) * 10000 div total_chars"
            ).alias("removable_bp"),
        )
        .orderBy("source")
    )


BOILERPLATE_SEGMENTS_SQL = f"""
WITH d AS (
  SELECT doc_id, source, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
inst AS (
  SELECT source, doc_id,
         array_to_string(
           list_slice(toks, i * {_BOILER_SEG_W} + 1,
                      i * {_BOILER_SEG_W} + {_BOILER_SEG_W}), ' ') AS seg
  FROM d, UNNEST(range((len(toks) + {_BOILER_SEG_W} - 1) // {_BOILER_SEG_W}))
         AS t(i)
),
per_doc_seg AS (
  SELECT source, doc_id, seg, COUNT(*) AS n_inst
  FROM inst GROUP BY source, doc_id, seg
),
src_totals AS (
  SELECT source, COUNT(*) AS n_docs, SUM(length(text)) AS total_chars
  FROM d GROUP BY source
),
per_seg AS (
  SELECT p.source, p.seg, COUNT(*) AS df, SUM(p.n_inst) AS inst,
         COUNT(*) >= GREATEST(2, (s.n_docs * {_BOILER_DF_PCT} + 99) // 100)
           AS is_boiler
  FROM per_doc_seg p JOIN src_totals s ON s.source = p.source
  GROUP BY p.source, p.seg, s.n_docs
),
seg_stats AS (
  SELECT source,
         SUM(inst) AS n_segments,
         COUNT(*) AS n_distinct_segments,
         SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END)
           AS n_boilerplate_segments,
         SUM(CASE WHEN is_boiler THEN inst ELSE 0 END) AS boiler_instances,
         SUM(CASE WHEN is_boiler THEN inst * length(seg) ELSE 0 END)
           AS removable_chars
  FROM per_seg GROUP BY source
),
affected AS (
  SELECT p.source, COUNT(DISTINCT p.doc_id) AS affected_docs
  FROM per_doc_seg p
  WHERE EXISTS (SELECT 1 FROM per_seg f
                WHERE f.source = p.source AND f.seg = p.seg AND f.is_boiler)
  GROUP BY p.source
)
SELECT t.source,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.total_chars AS BIGINT) AS total_chars,
       CAST(COALESCE(g.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(g.n_distinct_segments, 0) AS BIGINT)
         AS n_distinct_segments,
       CAST(COALESCE(g.n_boilerplate_segments, 0) AS BIGINT)
         AS n_boilerplate_segments,
       CAST(COALESCE(g.boiler_instances, 0) AS BIGINT) AS boiler_instances,
       CAST(COALESCE(a.affected_docs, 0) AS BIGINT) AS affected_docs,
       CAST(COALESCE(g.removable_chars, 0) AS BIGINT) AS removable_chars,
       CAST(COALESCE(g.removable_chars, 0) * 10000 // t.total_chars AS BIGINT)
         AS removable_bp
FROM src_totals t
LEFT JOIN seg_stats g ON g.source = t.source
LEFT JOIN affected a ON a.source = t.source
ORDER BY t.source
"""


# Stated topic lexicons (the classifier IS this table — auditable, exact).
TOPIC_LEXICONS = (
    ("execution", ("join", "hash", "scan", "merge", "sort", "filter",
                   "agg", "group", "query")),
    ("storage", ("row", "column", "table", "key", "value", "data",
                 "part", "line", "batch")),
    ("streaming", ("stream", "window", "vector", "spark", "order",
                   "fast", "slow")),
)


def topic_lexicon_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C114 (round-8 addition): lexicon topic classification and the
    corpus-composition report it feeds — the domain-tagging pass a
    mixture design (C95 consumes proportions; this PRODUCES the
    per-source topic mix) runs before sampling: each document is
    assigned the topic whose STATED lexicon matches the most token
    occurrences (ties break to the lexicographically first topic —
    stated; zero hits abstain to 'und', the C8 discipline — the
    non-English docs land there, which is a visible finding, not
    noise). Per (source, topic) cell of the FULL public domain
    (every source x the 3 lexicons + 'und', zeros included — the C106
    empty-cell discipline): doc count, share of the source's docs in
    basis points, and total matched occurrences. All integers.

    Plan: one token explode -> conditional per-lexicon sums per doc
    (map-side; the lexicons are literals, no join), argmax expression,
    one (source, topic) rollup, broadcast domain spine. At 100 TB this
    is a linear scan plus a |sources x 4| rollup.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tok = docs.select(
        "doc_id", "source",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
    )
    hit_aggs = [
        F.sum(
            F.col("w").isin(*words).cast("long")
        ).alias(f"h_{name}")
        for name, words in TOPIC_LEXICONS
    ]
    per_doc = tok.groupBy("doc_id", "source").agg(*hit_aggs)
    names = [name for name, _ in TOPIC_LEXICONS]
    best = "greatest({})".format(", ".join(f"h_{n}" for n in names))
    topic_case = "CASE WHEN {best} = 0 THEN 'und' {arms} END".format(
        best=best,
        arms=" ".join(
            f"WHEN h_{n} = {best} THEN '{n}'"
            for n in sorted(names)  # lexicographic tie rule
        ),
    )
    hits_case = "CASE {} ELSE 0 END".format(
        " ".join(f"WHEN topic = '{n}' THEN h_{n}" for n in names)
    )
    classified = per_doc.withColumn("topic", F.expr(topic_case)).withColumn(
        "hits", F.expr(hits_case)
    )
    cells = classified.groupBy("source", "topic").agg(
        F.count("*").alias("n_docs"),
        F.sum("hits").alias("matched_occurrences"),
    )
    spine = (
        docs.groupBy("source")
        .agg(F.count("*").alias("src_docs"))
        .crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(n,) for n in sorted(names) + ["und"]], "topic string"
                )
            )
        )
    )
    return (
        spine.join(cells, ["source", "topic"], "left")
        .select(
            "source",
            "topic",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.expr("coalesce(n_docs, 0) * 10000 div src_docs").alias(
                "share_bp"
            ),
            F.coalesce("matched_occurrences", F.lit(0)).alias(
                "matched_occurrences"
            ),
        )
        .orderBy("source", "topic")
    )


def _topic_mix_sql() -> str:
    names = sorted(n for n, _ in TOPIC_LEXICONS)
    in_lists = {
        n: ", ".join(f"'{w}'" for w in dict(TOPIC_LEXICONS)[n]) for n in names
    }
    hit_cols = ",\n         ".join(
        f"SUM(CASE WHEN w IN ({in_lists[n]}) THEN 1 ELSE 0 END) AS h_{n}"
        for n in names
    )
    best = "GREATEST({})".format(", ".join(f"h_{n}" for n in names))
    arms = " ".join(f"WHEN h_{n} = {best} THEN '{n}'" for n in names)
    hits = " ".join(f"WHEN topic = '{n}' THEN h_{n}" for n in names)
    return f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
per_doc AS (
  SELECT doc_id, source,
         {hit_cols}
  FROM tok GROUP BY doc_id, source
),
classified AS (
  SELECT source,
         CASE WHEN {best} = 0 THEN 'und' {arms} END AS topic,
         CASE {hits} ELSE 0 END AS hits
  FROM per_doc
),
cells AS (
  SELECT source, topic, COUNT(*) AS n_docs, SUM(hits) AS occ
  FROM classified GROUP BY source, topic
),
spine AS (
  SELECT s.source, s.src_docs, t.topic
  FROM (SELECT source, COUNT(*) AS src_docs FROM documents GROUP BY source) s
  CROSS JOIN (SELECT unnest(ARRAY[{", ".join(f"'{n}'" for n in names)},
                                  'und']) AS topic) t
)
SELECT sp.source, sp.topic,
       CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(c.n_docs, 0) * 10000 // sp.src_docs AS BIGINT)
         AS share_bp,
       CAST(COALESCE(c.occ, 0) AS BIGINT) AS matched_occurrences
FROM spine sp
LEFT JOIN cells c ON c.source = sp.source AND c.topic = sp.topic
ORDER BY sp.source, sp.topic
"""


TOPIC_LEXICON_MIX_SQL = _topic_mix_sql()


_CSW_W = 16  # tokens per classification window


def code_switch_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C115 (round-8 addition): code-switching scan — the multilingual
    pathology document-level langid (C8) averages away: a document
    that alternates languages mid-stream poisons monolingual training
    shards and tokenizer statistics, and its DOCUMENT-level stopword
    vote can even land confidently on one language. The unit is the
    disjoint {w}-token window (the C112 pseudo-line discipline at
    classification granularity); each window is classified by C8's
    exact stopword tables (max hits, alphabetical tie rule, zero hits
    abstain to 'und'). Per source: docs, windows, classified windows,
    documents whose classified windows span >= 2 languages
    (code-switched), total adjacent classified-window transitions that
    switch language, and the switch rate per 10k classified-window
    adjacencies. All integers.

    The sf corpora are strictly monolingual per document, so every
    source reports zero switched docs — exact totals still pinned
    vs python; detection semantics are carried by the crafted
    interleaved-document pytest (the C102/C104/C112 discipline).

    Plan: windows built array-side (slice over sequence — no explode
    until windows exist), window classification via literal IN-list
    conditional sums inside ONE aggregate over (doc, window), adjacent
    transitions via a lag over (doc ORDER BY window index) — a per-doc
    sort window, never global; one source rollup. Linear scan at
    100 TB.
    """.format(w=_CSW_W)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    seg_expr = (
        "CASE WHEN size(toks) = 0 THEN array() ELSE "
        "transform(sequence(0, (size(toks) + {w} - 1) div {w} - 1), "
        "i -> slice(toks, i * {w} + 1, {w})) END"
    ).format(w=_CSW_W)
    win = (
        docs.withColumn(
            "toks", F.filter(F.split("text", " "), lambda x: x != "")
        )
        .select(
            "doc_id",
            "source",
            F.posexplode(F.expr(seg_expr)).alias("win_idx", "wtoks"),
        )
    )
    hit_cols = [
        F.size(F.filter("wtoks", lambda x: x.isin(*words))).alias(f"h_{code}")
        for code, words in sorted(STOPWORDS.items())
    ]
    classified = win.select("doc_id", "source", "win_idx", *hit_cols)
    codes = sorted(STOPWORDS)
    best = "greatest({})".format(", ".join(f"h_{c}" for c in codes))
    lang_case = "CASE WHEN {best} = 0 THEN 'und' {arms} END".format(
        best=best,
        arms=" ".join(f"WHEN h_{c} = {best} THEN '{c}'" for c in codes),
    )
    lab = classified.withColumn("wlang", F.expr(lang_case))
    w_lag = Window.partitionBy("doc_id").orderBy("win_idx")
    flagged = lab.withColumn(
        "prev_lang",
        F.last(F.when(F.col("wlang") != "und", F.col("wlang")), True).over(
            w_lag.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn(
        "is_switch",
        (
            (F.col("wlang") != "und")
            & F.col("prev_lang").isNotNull()
            & (F.col("wlang") != F.col("prev_lang"))
        ).cast("long"),
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_windows"),
        F.sum((F.col("wlang") != "und").cast("long")).alias("n_classified"),
        F.countDistinct(
            F.when(F.col("wlang") != "und", F.col("wlang"))
        ).alias("n_langs"),
        F.sum("is_switch").alias("n_switches"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_windows").alias("n_windows"),
            F.sum("n_classified").alias("n_classified"),
            F.sum((F.col("n_langs") >= 2).cast("long")).alias(
                "code_switched_docs"
            ),
            F.sum("n_switches").alias("n_switches"),
            F.expr(
                "CASE WHEN sum(greatest(n_classified - 1, 0)) > 0 "
                "THEN sum(n_switches) * 10000 div "
                "sum(greatest(n_classified - 1, 0)) ELSE 0 END"
            ).alias("switch_rate_bp"),
        )
        .orderBy("source")
    )


def _code_switch_sql() -> str:
    codes = sorted(STOPWORDS)
    hit_cols = ",\n         ".join(
        "len(list_filter(wtoks, x -> x IN ({lst}))) AS h_{c}".format(
            lst=", ".join(f"'{w}'" for w in STOPWORDS[c]), c=c
        )
        for c in codes
    )
    best = "GREATEST({})".format(", ".join(f"h_{c}" for c in codes))
    arms = " ".join(f"WHEN h_{c} = {best} THEN '{c}'" for c in codes)
    return f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
win AS (
  SELECT doc_id, source, i AS win_idx,
         list_slice(toks, i * {_CSW_W} + 1, i * {_CSW_W} + {_CSW_W}) AS wtoks
  FROM d, UNNEST(range((len(toks) + {_CSW_W} - 1) // {_CSW_W})) AS t(i)
),
hits AS (
  SELECT doc_id, source, win_idx,
         {hit_cols}
  FROM win
),
lab AS (
  SELECT doc_id, source, win_idx,
         CASE WHEN {best} = 0 THEN 'und' {arms} END AS wlang
  FROM hits
),
flagged AS (
  SELECT doc_id, source, wlang,
         LAST_VALUE(CASE WHEN wlang <> 'und' THEN wlang END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY win_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_lang
  FROM lab
),
per_doc AS (
  SELECT doc_id, source,
         COUNT(*) AS n_windows,
         SUM(CASE WHEN wlang <> 'und' THEN 1 ELSE 0 END) AS n_classified,
         COUNT(DISTINCT CASE WHEN wlang <> 'und' THEN wlang END) AS n_langs,
         SUM(CASE WHEN wlang <> 'und' AND prev_lang IS NOT NULL
                   AND wlang <> prev_lang THEN 1 ELSE 0 END) AS n_switches
  FROM flagged GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_windows) AS BIGINT) AS n_windows,
       CAST(SUM(n_classified) AS BIGINT) AS n_classified,
       CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS code_switched_docs,
       CAST(SUM(n_switches) AS BIGINT) AS n_switches,
       CAST(CASE WHEN SUM(GREATEST(n_classified - 1, 0)) > 0
            THEN SUM(n_switches) * 10000 // SUM(GREATEST(n_classified - 1, 0))
            ELSE 0 END AS BIGINT) AS switch_rate_bp
FROM per_doc
GROUP BY source
ORDER BY source
"""


CODE_SWITCH_SCAN_SQL = _code_switch_sql()


_KN_TOPK = 50  # words reported (by frequency, full tiebreak)


def ngram_continuation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C117 (round-8 addition): Kneser-Ney continuation statistics —
    the quantity that made KN the standard n-gram smoother (Kneser &
    Ney, ICASSP'95) and that frequency alone provably gets wrong: a
    word's continuation count N1+(.w) = how many DISTINCT left
    contexts it follows (the classic example: 'Francisco' is frequent
    but almost always follows 'San', so its continuation probability
    must be tiny). Per top-{k} word (by occurrence count, full
    tiebreak): occurrences, distinct left contexts, distinct right
    continuations (the forward branching factor tokenizer merge
    seeding reads), and the KN continuation probability
    N1+(.w) / |distinct bigram types| in ppm — every number an exact
    integer or a floor-div ppm.

    Plan: bigrams built array-side per doc (the C110 discipline — no
    window shuffle), ONE distinct over bigram types (the only
    vocabulary-squared-bounded relation), two rollups of it (by right
    word, by left word), a unigram rollup, vocabulary-sized joins, a
    1-row type-total broadcast, bounded top-k sort. At 100 TB the
    heavy relation is the bigram-type table — vocabulary-bounded, not
    corpus-bounded.
    """.format(k=_KN_TOPK)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.withColumn(
        "toks", F.filter(F.split("text", " "), lambda x: x != "")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() ELSE "
                "transform(sequence(0, size(toks) - 2), "
                "i -> struct(toks[i] AS l, toks[i + 1] AS r)) END"
            )
        ).alias("bg")
    ).select("bg.l", "bg.r")
    types = bigrams.distinct()
    from .dedup import _swap_persist

    types = _swap_persist("kn_bigram_types", types)
    n_types = types.agg(F.count("*").alias("n_types"))
    cont = types.groupBy("r").agg(F.count("*").alias("distinct_left"))
    branch = types.groupBy("l").agg(F.count("*").alias("distinct_right"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        uni.join(cont, uni["w"] == cont["r"], "left")
        .join(branch, uni["w"] == branch["l"], "left")
        .crossJoin(F.broadcast(n_types))
        .select(
            "w",
            "n_occurrences",
            F.coalesce("distinct_left", F.lit(0)).alias("distinct_left"),
            F.coalesce("distinct_right", F.lit(0)).alias("distinct_right"),
            F.expr(
                "coalesce(distinct_left, 0) * 1000000 div n_types"
            ).alias("continuation_ppm"),
        )
        .orderBy(F.desc("n_occurrences"), "w")
        .limit(_KN_TOPK)
    )


NGRAM_CONTINUATION_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
bigrams AS (
  SELECT t[i] AS l, t[i + 1] AS r
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
types AS (SELECT DISTINCT l, r FROM bigrams),
cont AS (SELECT r, COUNT(*) AS distinct_left FROM types GROUP BY r),
branch AS (SELECT l, COUNT(*) AS distinct_right FROM types GROUP BY l),
uni AS (
  SELECT w, COUNT(*) AS n_occurrences
  FROM (SELECT unnest(t) AS w FROM toks)
  GROUP BY w
)
SELECT u.w,
       CAST(u.n_occurrences AS BIGINT) AS n_occurrences,
       CAST(COALESCE(c.distinct_left, 0) AS BIGINT) AS distinct_left,
       CAST(COALESCE(b.distinct_right, 0) AS BIGINT) AS distinct_right,
       CAST(COALESCE(c.distinct_left, 0) * 1000000
            // (SELECT COUNT(*) FROM types) AS BIGINT) AS continuation_ppm
FROM uni u
LEFT JOIN cont c ON c.r = u.w
LEFT JOIN branch b ON b.l = u.w
ORDER BY n_occurrences DESC, w
LIMIT {_KN_TOPK}
"""


_BPE_SWEEP_ITERS = 5
_BPE_SWEEP_SENTINELS = "#$%&@"  # one per merge; never appear in corpus tokens


def bpe_merge_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C118 (round-8 addition): multi-step BPE tokenizer training —
    the ITERATIVE algorithm C73 does one step of: {k} successive
    merges, each round counting adjacent symbol pairs over the word-
    frequency table (never the corpus — the Sennrich discipline),
    promoting the heaviest pair (deterministic tiebreak), and
    rewriting the vocabulary with a per-round sentinel symbol. Each
    round emits the DECODED merge (token_a, token_b, the merged token,
    and its weighted count): sentinels expand back through the merge
    history in descending order, which fully decodes because round
    j's winner can only contain sentinels from rounds < j.

    This is the repo's canonical bounded driver-loop shape (kmeans'
    Lloyd rounds): per round one vocabulary-sized aggregate and ONE
    1-row collect (the winner — the scalar idiom), then a map-side
    rewrite; at 100 TB every round is O(|vocab|), the corpus is
    touched once. The oracle states the SAME {k} rounds as chained
    CTEs with scalar-subquery winners — the iteration is expressible,
    just not pretty, in SQL.
    """.format(k=_BPE_SWEEP_ITERS)
    from .dedup import _swap_persist

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    words = _swap_persist("bpe_sweep_words", words)

    def pair_counts(df: DataFrame) -> DataFrame:
        grams = F.expr(
            "CASE WHEN length(word) >= 2 THEN "
            "transform(sequence(0, length(word) - 2), "
            "i -> substring(word, i + 1, 2)) ELSE array() END"
        )
        return (
            df.select(F.explode(grams).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )

    cur = words
    merges: list[tuple[str, str]] = []  # (sentinel, raw winner pair)
    rows = []
    for it in range(1, _BPE_SWEEP_ITERS + 1):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()[0]
        )
        raw, cnt = top["pair"], top["cnt"]

        def decode(s: str) -> str:
            for sent, rp in reversed(merges):
                s = s.replace(sent, rp)
            return s

        token_a, token_b = decode(raw[0]), decode(raw[1])
        rows.append((it, token_a, token_b, token_a + token_b, int(cnt)))
        sent = _BPE_SWEEP_SENTINELS[it - 1]
        cur = cur.select(
            F.expr(f"replace(word, '{raw}', '{sent}')").alias("word"), "freq"
        )
        merges.append((sent, raw))
    return spark.createDataFrame(
        rows,
        "iter int, token_a string, token_b string, merged string, cnt bigint",
    ).orderBy("iter")


def _bpe_sweep_sql() -> str:
    pair_sub = """
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT substr(word, i, 2) AS pair, freq
    FROM (SELECT word, freq, unnest(range(1, length(word))) AS i FROM {src}
          WHERE length(word) >= 2)
  )
  GROUP BY pair"""
    ctes = ["""w0 AS (
  SELECT word, COUNT(*) AS freq
  FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
    FROM documents
  )
  GROUP BY word
)"""]
    for i in range(1, _BPE_SWEEP_ITERS + 1):
        ctes.append(f"p{i} AS ({pair_sub.format(src=f'w{i - 1}')}\n)")
        ctes.append(
            f"m{i} AS (SELECT pair, cnt FROM p{i} "
            "ORDER BY cnt DESC, pair ASC LIMIT 1)"
        )
        if i < _BPE_SWEEP_ITERS:
            sent = _BPE_SWEEP_SENTINELS[i - 1]
            ctes.append(
                f"w{i} AS (SELECT replace(word, (SELECT pair FROM m{i}), "
                f"'{sent}') AS word, freq FROM w{i - 1})"
            )

    def decode(expr: str, upto: int) -> str:
        # expand sentinels in DESCENDING round order; round j's winner can
        # only contain sentinels < j, so one descending pass fully decodes
        out = expr
        for j in range(upto, 0, -1):
            sent = _BPE_SWEEP_SENTINELS[j - 1]
            out = f"replace({out}, '{sent}', (SELECT pair FROM m{j}))"
        return out

    arms = []
    for i in range(1, _BPE_SWEEP_ITERS + 1):
        ta = decode(f"substr((SELECT pair FROM m{i}), 1, 1)", i - 1)
        tb = decode(f"substr((SELECT pair FROM m{i}), 2, 1)", i - 1)
        arms.append(
            f"SELECT {i} AS iter, {ta} AS token_a, {tb} AS token_b,\n"
            f"       {ta} || {tb} AS merged,\n"
            f"       (SELECT cnt FROM m{i}) AS cnt"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(arms)
        + "\nORDER BY iter\n"
    )


BPE_MERGE_SWEEP_SQL = _bpe_sweep_sql()


_WF_BUDGET_PCT = 60  # budget = this % of total corpus tokens (stated)


def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C119 (round-8 addition): water-filling token allocation — the
    OTHER budget shape a mixture designer needs (C74 maximizes a
    budget under target shares; this takes the budget as GIVEN and
    caps the big domains): allocate a fixed token budget B across
    source domains as allocated_d = min(available_d, C) where the
    integer water level C is the largest cap whose total allocation
    fits B — the classical water-filling that equalizes domain caps
    without starving small domains (small domains keep everything,
    oversized domains are clipped to C). B = {p}% of total corpus
    tokens, stated.

    The water level is computed by the closed-form prefix
    construction, all integer: domains sorted by availability
    (source tiebreak), running prefix sums, per-rank candidate
    C_i = (B - prefix_below_i) div (domains_from_i); the first rank
    whose candidate is below its own availability is where the water
    line crosses, and its candidate IS the level (no caps when the
    whole corpus fits). The defining property — sum(min(a_d, C)) <= B
    < sum(min(a_d, C+1)) when any domain is capped — is pinned by the
    pytest, not assumed.

    Plan: one corpus scan for token counts, a |sources|-row rollup;
    the sort window runs over that constant-size rollup (whitelisted
    class), the level is a 1-row broadcast. At 100 TB the scan is the
    entire cost.
    """.format(p=_WF_BUDGET_PCT)
    docs = load_table(spark, sf_dir, "documents")
    avail = (
        docs.withColumn(
            "n_tokens",
            F.size(F.filter(F.split("text", " "), lambda x: x != "")),
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("available_tokens"))
    )
    from .dedup import _swap_persist

    avail = _swap_persist("waterfill_avail", avail)
    totals = avail.agg(
        F.sum("available_tokens").alias("total_tokens"),
        F.count("*").alias("n_domains"),
        F.max("available_tokens").alias("max_avail"),
    ).select(
        "*", F.expr(f"total_tokens * {_WF_BUDGET_PCT} div 100").alias("budget")
    )
    w = Window.orderBy("available_tokens", "source")
    ranked = (
        avail.crossJoin(F.broadcast(totals))
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "prefix_below",
            F.coalesce(
                F.sum("available_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "cand",
            F.expr("(budget - prefix_below) div (n_domains - rn + 1)"),
        )
    )
    # min_by over the empty filtered set yields NULL -> the no-caps case
    # falls back to max availability; a 1-row aggregate either way (a
    # union+limit(1) here would be partition-order nondeterministic)
    level = ranked.filter(F.col("cand") < F.col("available_tokens")).agg(
        F.expr("min_by(cand, rn)").alias("wl")
    )
    level_or_max = level.crossJoin(
        F.broadcast(totals.select("max_avail"))
    ).select(F.coalesce("wl", "max_avail").alias("water_level"))
    return (
        avail.crossJoin(F.broadcast(level_or_max))
        .crossJoin(F.broadcast(totals.select("budget")))
        .select(
            "source",
            "available_tokens",
            F.least("available_tokens", F.col("water_level")).alias(
                "allocated_tokens"
            ),
            (F.col("available_tokens") > F.col("water_level"))
            .cast("int")
            .alias("capped"),
            "water_level",
            "budget",
        )
        .orderBy("source")
    )


TOKEN_BUDGET_WATERFILL_SQL = f"""
WITH avail AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS available_tokens
  FROM documents GROUP BY source
),
totals AS (
  SELECT SUM(available_tokens) AS total_tokens,
         COUNT(*) AS n_domains,
         MAX(available_tokens) AS max_avail,
         SUM(available_tokens) * {_WF_BUDGET_PCT} // 100 AS budget
  FROM avail
),
ranked AS (
  SELECT a.*, t.budget, t.n_domains, t.max_avail,
         ROW_NUMBER() OVER (ORDER BY available_tokens, source) AS rn,
         COALESCE(SUM(available_tokens) OVER (
           ORDER BY available_tokens, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prefix_below
  FROM avail a CROSS JOIN totals t
),
cands AS (
  SELECT rn, (budget - prefix_below) // (n_domains - rn + 1) AS cand,
         available_tokens, max_avail
  FROM ranked
),
level AS (
  SELECT COALESCE(
           (SELECT cand FROM cands WHERE cand < available_tokens
            ORDER BY rn LIMIT 1),
           (SELECT max_avail FROM totals)) AS water_level
)
SELECT a.source,
       a.available_tokens,
       CAST(LEAST(a.available_tokens, l.water_level) AS BIGINT)
         AS allocated_tokens,
       CAST(CASE WHEN a.available_tokens > l.water_level THEN 1 ELSE 0 END
            AS INT) AS capped,
       CAST(l.water_level AS BIGINT) AS water_level,
       CAST(t.budget AS BIGINT) AS budget
FROM avail a CROSS JOIN level l CROSS JOIN totals t
ORDER BY a.source
"""


_HEAPS_CHECKPOINTS = 10


def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C122 (round-8 addition): vocabulary-growth (Heaps-law) curve —
    the curve that sizes every tokenizer/vocab build: how many
    DISTINCT tokens the corpus has yielded after each tenth of it,
    and the marginal type/token ratio, the number that says whether
    more data still buys vocabulary. C21's coverage curve ranks an
    EXISTING vocab by frequency; this measures discovery order over
    the corpus itself.

    Ingestion order is the doc_id axis (the corpus's stable id — the
    same discipline as C49's version diff), cut at 10 equal-width id
    checkpoints cp_k = mn - 1 + (span * k) div 10 from one min/max
    scalar (1-row broadcast, the whitelisted idiom). The curve needs
    CUMULATIVE counts, which the plan gets WITHOUT any running-sum
    window: each per-token first-occurrence row (groupBy token ->
    min(doc_id), the only corpus-wide shuffle) joins the 10-row
    checkpoint spine on fd <= cp_k — a broadcast nested-loop against
    a CONSTANT 10-row side (<= 10 integer compares per row,
    map-side), so each token lands in every checkpoint that has seen
    it and one |checkpoints|-row rollup IS the cumulative curve. Doc
    and token totals take the same join over the per-doc rollup. All
    counts exact BIGINTs; type/token ratio is floor-div ppm.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "n_tok"
        ),
    )
    span = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    spine = (
        spark.range(1, _HEAPS_CHECKPOINTS + 1)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(span))
        .select(
            "k",
            F.expr(
                f"mn - 1 + ((mx - mn + 1) * k) div {_HEAPS_CHECKPOINTS}"
            ).alias("cp"),
        )
    )
    first = (
        _tok(load_table(spark, sf_dir, "documents"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    vocab = (
        first.join(F.broadcast(spine), F.col("fd") <= F.col("cp"))
        .groupBy("k", "cp")
        .agg(F.count("*").alias("vocab_cum"))
    )
    sizes = (
        docs.join(F.broadcast(spine), F.col("doc_id") <= F.col("cp"))
        .groupBy("k", "cp")
        .agg(
            F.count("*").alias("docs_cum"),
            F.sum("n_tok").alias("tokens_cum"),
        )
    )
    return (
        sizes.join(vocab, ["k", "cp"])
        .select(
            "k",
            F.col("cp").alias("cp_doc_id"),
            "docs_cum",
            "tokens_cum",
            "vocab_cum",
            F.expr("vocab_cum * 1000000 div tokens_cum").alias("ttr_ppm"),
        )
        .orderBy("k")
    )


HEAPS_LAW_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tok
  FROM documents
),
span AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM docs),
spine AS (
  SELECT k, mn - 1 + ((mx - mn + 1) * k) // {_HEAPS_CHECKPOINTS} AS cp
  FROM span, unnest(generate_series(1, {_HEAPS_CHECKPOINTS})) AS t(k)
),
first AS (
  SELECT w, MIN(doc_id) AS fd
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
    FROM documents
  )
  GROUP BY w
),
vocab AS (
  SELECT s.k, s.cp, COUNT(*) AS vocab_cum
  FROM first f JOIN spine s ON f.fd <= s.cp
  GROUP BY s.k, s.cp
),
sizes AS (
  SELECT s.k, s.cp, COUNT(*) AS docs_cum, SUM(d.n_tok) AS tokens_cum
  FROM docs d JOIN spine s ON d.doc_id <= s.cp
  GROUP BY s.k, s.cp
)
SELECT z.k AS k,
       CAST(z.cp AS BIGINT) AS cp_doc_id,
       CAST(z.docs_cum AS BIGINT) AS docs_cum,
       CAST(z.tokens_cum AS BIGINT) AS tokens_cum,
       CAST(v.vocab_cum AS BIGINT) AS vocab_cum,
       CAST(v.vocab_cum * 1000000 // z.tokens_cum AS BIGINT) AS ttr_ppm
FROM sizes z JOIN vocab v ON v.k = z.k AND v.cp = z.cp
ORDER BY z.k
"""


def hapax_tail_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C127 (round-8 addition): rare-token tail audit — hapax/dis
    legomena shares per language, the vocabulary-health signal every
    corpus-linguistics pipeline reads before trusting frequency
    statistics: a healthy natural-language corpus runs ~40-60% hapax
    types (Zipf's tail); OCR garbage and boilerplate push it to the
    extremes in opposite directions. C20's vocab_stats PRUNES below
    min-df; this measures exactly what the pruning throws away, so
    the two together account for the whole vocabulary (stated).

    Per lang: token instances, vocabulary size, hapax types (freq 1),
    dis types (freq 2), the hapax share of the vocabulary in bp, the
    share of token INSTANCES carried by hapax+dis types in bp (the
    mass the min-df cut discards), and the mean frequency in ppm.

    Plan: one explode + ONE (lang, token) rollup (map-side combined,
    the only corpus-wide shuffle), then a |langs|-bounded conditional
    rollup — frequencies never leave the executor unaggregated. All
    integers, floor division.
    """
    counts = (
        _tok(load_table(spark, sf_dir, "documents"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("freq"))
    )
    return (
        counts.groupBy("lang")
        .agg(
            F.sum("freq").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum((F.col("freq") == 1).cast("long")).alias("hapax_types"),
            F.sum((F.col("freq") == 2).cast("long")).alias("dis_types"),
            F.sum(
                F.when(F.col("freq") <= 2, F.col("freq")).otherwise(0)
            ).alias("tail_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "vocab",
            "hapax_types",
            "dis_types",
            F.expr("hapax_types * 10000 div vocab").alias("hapax_share_bp"),
            F.expr("tail_tokens * 10000 div n_tokens").alias(
                "tail_mass_bp"
            ),
            F.expr("n_tokens * 1000000 div vocab").alias("mean_freq_ppm"),
        )
        .orderBy("lang")
    )


HAPAX_TAIL_SQL = """
WITH counts AS (
  SELECT lang, w, COUNT(*) AS freq
  FROM (
    SELECT lang,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents
  )
  GROUP BY lang, w
)
SELECT lang,
       CAST(SUM(freq) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS hapax_types,
       CAST(SUM(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dis_types,
       CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
            AS BIGINT) AS hapax_share_bp,
       CAST(SUM(CASE WHEN freq <= 2 THEN freq ELSE 0 END) * 10000
            // SUM(freq) AS BIGINT) AS tail_mass_bp,
       CAST(SUM(freq) * 1000000 // COUNT(*) AS BIGINT) AS mean_freq_ppm
FROM counts
GROUP BY lang
ORDER BY lang
"""


_ENTROPY_LOW_NATS = 2.5  # flag threshold: natural text sits ~2.9-3.3


def char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C128 (round-9 addition): per-document CHARACTER-level Shannon
    entropy — the curation screen that catches what the word-level
    battery misses: base64/hex blobs and key dumps score HIGH
    (near-uniform bytes), while run-length garbage, padding floods,
    and single-char spam score LOW; natural language sits in a narrow
    ~2.9-3.3 nat band. C9/C37 filter on word shapes, C102 on unicode
    classes, B85 on column value distributions; none sees byte-level
    randomness. The flag marks docs below {th} nats (the spam/padding
    side; the high side is a reader's percentile cut over the same
    column).

    Exactness: per-(doc, char) counts are exact integers; entropy
    H = ln(n) − (Σ c·ln c)/n uses the C29 discipline — each c·ln(c)
    term is rounded to 6 dp and summed as DECIMAL (order-insensitive,
    bit-identical across engines and partitionings), the final H
    rounded to 4 dp. The flag is derived from the ROUNDED H both
    engines agree on, so no boundary divergence exists.

    Plan: one explode + (doc, char) rollup (map-side combined — the
    per-doc alphabet caps combiner output at |alphabet| rows/doc),
    one per-doc rollup. Output |docs| rows.

    Stated boundary: "character" = what split(text, '') yields. For
    BMP text (this corpus) Spark and DuckDB agree code point by code
    point; astral-plane input (emoji, rare CJK) splits into UTF-16
    surrogate halves on the JVM but code points in DuckDB — a corpus
    with astral text needs a code-point normalizer in front (the
    entropy SIGNAL is insensitive to which convention, the oracle
    hash is not).
    """.format(th=_ENTROPY_LOW_NATS)
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.explode(F.split("text", "")).alias("c"),
    ).filter(F.col("c") != "")
    counts = ch.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    term = F.round(
        F.col("cnt") * F.log(F.col("cnt").cast("double")), 6
    ).cast("decimal(24,6)")
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars"),
        F.count("*").alias("n_distinct_chars"),
        F.sum(term).alias("sum_clnc"),
    )
    h = F.round(
        F.log(F.col("n_chars").cast("double"))
        - F.col("sum_clnc").cast("double") / F.col("n_chars"),
        4,
    )
    return per_doc.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        h.alias("entropy_nats"),
        (h < _ENTROPY_LOW_NATS).cast("int").alias("low_entropy_flag"),
    ).orderBy("doc_id")


CHAR_ENTROPY_SQL = f"""
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
counts AS (
  SELECT doc_id, c, COUNT(*) AS cnt FROM ch WHERE c <> '' GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         SUM(cnt) AS n_chars,
         COUNT(*) AS n_distinct_chars,
         SUM(CAST(ROUND(cnt * ln(CAST(cnt AS DOUBLE)), 6)
                  AS DECIMAL(24,6))) AS sum_clnc
  FROM counts GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
       ROUND(ln(CAST(n_chars AS DOUBLE))
             - CAST(sum_clnc AS DOUBLE) / n_chars, 4) AS entropy_nats,
       CAST(CASE WHEN ROUND(ln(CAST(n_chars AS DOUBLE))
                            - CAST(sum_clnc AS DOUBLE) / n_chars, 4)
                      < {_ENTROPY_LOW_NATS}
                 THEN 1 ELSE 0 END AS INT) AS low_entropy_flag
FROM per_doc
ORDER BY doc_id
"""


_OOV_VOCAB_SIZE = 256


def tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C129 (round-9 addition): out-of-vocabulary rate per language
    against the corpus's own top-{v} token vocabulary — the
    fixed-vocab coverage question C109 (fertility: subword pieces per
    word) and C20 (vocab_stats: global frequency shape) don't answer:
    if a tokenizer froze THIS vocab, what fraction of each language's
    tokens fall outside it? The classic imbalanced-multilingual
    failure (a vocab fit on the majority language starves the rest)
    shows up as a per-language oov_bp spread.

    Exactness: the vocabulary is the top {v} tokens by (tf DESC,
    token) — a deterministic total order, taken via orderBy+limit
    (TakeOrdered: per-partition top-k then a k-row merge; NEVER a
    global sort or an unpartitioned rank window). OOV counts are
    exact integers; the rate is floor-div basis points.

    Plan: one token-frequency rollup, a {v}-row broadcast, one
    left-anti-free conditional rollup per (lang). Output |langs| rows.
    """.format(v=_OOV_VOCAB_SIZE)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.expr(_toks_expr())).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("w"))
        .limit(_OOV_VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            F.expr("n_oov * 10000 div n_tokens").alias("oov_bp"),
        )
        .orderBy("lang")
    )


def _toks_expr() -> str:
    return "filter(split(text, ' '), w -> w != '')"


TOKENIZER_OOV_SQL = f"""
WITH tok AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
           AS w
  FROM documents
),
vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS tf FROM tok GROUP BY w
  ) ORDER BY tf DESC, w LIMIT {_OOV_VOCAB_SIZE}
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 10000
            // COUNT(*) AS BIGINT) AS oov_bp
FROM tok t LEFT JOIN vocab v ON v.w = t.w
GROUP BY t.lang
ORDER BY t.lang
"""
