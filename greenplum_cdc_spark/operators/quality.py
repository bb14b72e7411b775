"""Corpus-quality / decontamination operators (SURVEY §2 C21-C24).

The filtering half of a training-data pipeline: repetition signals
(Gopher-style), PII scrubbing, BM25 relevance ranking, and benchmark
decontamination via n-gram overlap. All pure built-in expressions
(array HOFs / regexp / conditional aggregation) so every op stays in
whole-stage codegen; each has an exact DuckDB oracle twin.

Scale notes:
- repetition signals are computed from per-doc arrays map-side; the only
  shuffle is the (doc_id, bigram) count, keyed by doc so it distributes
  with the corpus;
- the contamination join broadcasts the benchmark n-gram set (benchmarks
  are tiny vs a 100 TB corpus), so the corpus is scanned once with no
  corpus-side shuffle before the per-doc count;
- BM25's df/avgdl aggregates are a handful of scalars, broadcast back
  onto the per-doc term frequencies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table

REP_TOP_BIGRAM = 0.2  # most-common-bigram share above which a doc is repetitive
REP_DUP_WORD = 0.7  # duplicate-word share above which a doc is repetitive

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONGNUM_RE = "[0-9]{4,}"

BM25_TERMS = ("table", "scan", "window", "value")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPN = 50

CONTAM_K = 3  # n-gram width (real pipelines use 8-13; 3 exercises the machinery)
CONTAM_MOD = 19  # doc_id % CONTAM_MOD == 0 -> benchmark split
CONTAM_FRAC = 0.1  # contaminated-ngram share that flags a doc


def _toks_col():
    return F.filter(F.split("text", " "), lambda w: w != "")


_TOKS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21: Gopher-style repetition signals per document.

    dup_word_frac = 1 - |distinct words| / |words|; top_bigram_frac =
    count of the most frequent word-bigram / |bigrams|. Docs exceeding
    either threshold are flagged repetitive (the Gopher rep-removal
    rules, Rae et al. 2021, applied to word/2-gram level).

    Two separate map-side scans (sizes vs bigram explode) — emitting
    size() and explode() of the same array expression in one projection
    trips Catalyst into recomputing the array per exploded row.
    """
    docs = load_table(spark, sf_dir, "documents")
    sizes = docs.select(
        "doc_id",
        F.size(_toks_col()).alias("n_words"),
        F.size(F.array_distinct(_toks_col())).alias("n_distinct"),
    )
    bigram_arr = F.expr(
        "CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i + 1])) "
        "ELSE array() END"
    )
    top_bigram = (
        docs.withColumn("toks", _toks_col())
        .select("doc_id", F.explode(bigram_arr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_bigram_cnt"))
    )
    dup_frac = F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6)
    top_frac = F.round(F.col("max_bigram_cnt") / (F.col("n_words") - 1), 6)
    return (
        sizes.join(top_bigram, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            dup_frac.alias("dup_word_frac"),
            "max_bigram_cnt",
            top_frac.alias("top_bigram_frac"),
            (
                (dup_frac > REP_DUP_WORD) | (top_frac > REP_TOP_BIGRAM)
            ).cast("int").alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


DOC_REPETITION_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
sizes AS (
  SELECT doc_id, len(toks) AS n_words, len(list_distinct(toks)) AS n_distinct
  FROM tok
),
bg AS (
  SELECT doc_id, unnest([toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))]) AS bg
  FROM tok
),
bgc AS (
  SELECT doc_id, bg, COUNT(*) AS cnt FROM bg GROUP BY doc_id, bg
),
topbg AS (
  SELECT doc_id, MAX(cnt) AS max_bigram_cnt FROM bgc GROUP BY doc_id
)
SELECT s.doc_id, s.n_words, s.n_distinct,
       ROUND(1.0 - s.n_distinct / CAST(s.n_words AS DOUBLE), 6) AS dup_word_frac,
       t.max_bigram_cnt,
       ROUND(t.max_bigram_cnt / CAST(s.n_words - 1 AS DOUBLE), 6) AS top_bigram_frac,
       CAST(ROUND(1.0 - s.n_distinct / CAST(s.n_words AS DOUBLE), 6) > {REP_DUP_WORD}
            OR ROUND(t.max_bigram_cnt / CAST(s.n_words - 1 AS DOUBLE), 6) > {REP_TOP_BIGRAM}
            AS INT) AS is_repetitive
FROM sizes s JOIN topbg t ON s.doc_id = t.doc_id
ORDER BY s.doc_id
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C22: PII redaction — emails and long digit runs replaced by typed
    placeholders; per-doc match counts plus an md5 of the scrubbed text
    so the oracle checks the REDACTION, not just the counts.

    Pure regexp_replace/regexp_extract_all — map-side, no shuffle at all
    (the scan IS the operator), which is the right shape for a 100 TB
    single-pass scrub. Patterns are RE2-and-Java-compatible.
    """
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(LONGNUM_RE),
        F.lit("<NUM>"),
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias(
                "n_emails"
            ),
            F.size(F.regexp_extract_all("text", F.lit(LONGNUM_RE), F.lit(0))).alias(
                "n_longnums"
            ),
            F.md5(scrubbed).alias("scrub_hash"),
            (scrubbed != F.col("text")).cast("int").alias("changed"),
        )
        .orderBy("doc_id")
    )


PII_SCRUB_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{LONGNUM_RE}')) AS n_longnums,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{LONGNUM_RE}', '<NUM>', 'g')) AS scrub_hash,
       CAST(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                           '{LONGNUM_RE}', '<NUM>', 'g') <> text AS INT) AS changed
FROM documents
ORDER BY doc_id
"""


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23: BM25 relevance ranking of the corpus for a fixed term set.

    Classic Robertson/Sparck-Jones BM25 (k1=1.2, b=0.75): df and avgdl
    are corpus scalars (crossJoin of a 1-row aggregate — broadcast);
    tf comes from one explode+count keyed by doc. Per-term score
    contributions are rounded to 6 dp and summed as DECIMAL so the
    across-term accumulation is order-insensitive and engine-exact
    (idf's ln() is rounded before use for the same reason).
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    toks = docs.withColumn("toks", _toks_col())
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("w"))
        .filter(F.expr(f"w IN ({terms})"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 6
    )
    contrib = F.round(
        F.col("idf")
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn("avgdl", avgdl)
        .withColumn("idf", idf)
        .withColumn("contrib", contrib.cast("decimal(18,6)"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).cast("double").alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPN)
        .select("doc_id", "score", "n_terms_hit")
    )


BM25_RANK_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS w FROM tok)
  WHERE w IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
  GROUP BY doc_id, w
),
df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ROUND(ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0), 6)
           * (tf.tf * ({BM25_K1} + 1.0))
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl
                                   / (CAST(corpus.sum_dl AS DOUBLE) / corpus.n_docs))),
         6) AS DECIMAL(18,6)) AS contrib
  FROM tf
  JOIN df ON tf.w = df.w
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
)
SELECT doc_id, CAST(ROUND(SUM(contrib), 6) AS DOUBLE) AS score,
       COUNT(*) AS n_terms_hit
FROM scored
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOPN}
"""


def _ngram_expr(k: int) -> str:
    joined = ", ".join(f"toks[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN size(toks) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size(toks) - {k}), "
        f"i -> concat_ws(' ', {joined}))) ELSE array() END"
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: benchmark decontamination via word n-gram overlap.

    The benchmark split (doc_id % CONTAM_MOD == 0 — a stand-in for a
    held-out eval set) contributes a distinct n-gram set; every corpus
    doc is scored by how many of its n-grams appear in that set, and
    docs whose contaminated share >= CONTAM_FRAC are flagged for
    removal. This is the standard eval-decontamination pass (GPT-3
    appendix C / PaLM style), at k=3 so the synthetic word-salad corpus
    actually overlaps.

    The benchmark n-gram set is broadcast (eval sets are tiny vs a
    100 TB corpus): the corpus-side scan has NO shuffle before the
    per-doc count, and the per-doc n-gram sets are built array-side.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks_col())
    grams = docs.select("doc_id", F.explode(F.expr(_ngram_expr(CONTAM_K))).alias("ng"))
    bench = (
        grams.filter(F.col("doc_id") % CONTAM_MOD == 0).select("ng").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % CONTAM_MOD != 0)
    sizes = docs.filter(F.col("doc_id") % CONTAM_MOD != 0).select(
        "doc_id", F.size(F.expr(_ngram_expr(CONTAM_K))).alias("n_ngrams")
    )
    hits = (
        corpus.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    frac = F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6)
    return (
        sizes.join(hits, "doc_id")
        .select(
            "doc_id",
            "n_ngrams",
            "n_contaminated",
            frac.alias("contaminated_frac"),
            (frac >= CONTAM_FRAC).cast("int").alias("flag_remove"),
        )
        .orderBy("doc_id")
    )


def _ngram_sql_k(k: int) -> str:
    """DuckDB twin of ``_ngram_expr(k)`` — the ONE n-gram
    list-comprehension template shared by C24's oracle (k=CONTAM_K)
    and C95's width sweep, so the two can't desynchronize."""
    return (
        "list_distinct(["
        + " || ' ' || ".join(
            f"toks[i + {j}]" if j else "toks[i]" for j in range(k)
        )
        + f" FOR i IN range(1, len(toks) - {k - 2})])"
    )


_NGRAM_SQL = _ngram_sql_k(CONTAM_K)

CONTAMINATION_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest({_NGRAM_SQL}) AS ng FROM tok
),
bench AS (SELECT DISTINCT ng FROM grams WHERE doc_id % {CONTAM_MOD} = 0),
sizes AS (
  SELECT doc_id, len({_NGRAM_SQL}) AS n_ngrams
  FROM tok WHERE doc_id % {CONTAM_MOD} <> 0
),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_contaminated
  FROM grams g JOIN bench b ON g.ng = b.ng
  WHERE g.doc_id % {CONTAM_MOD} <> 0
  GROUP BY g.doc_id
)
SELECT s.doc_id, s.n_ngrams, h.n_contaminated,
       ROUND(h.n_contaminated / CAST(s.n_ngrams AS DOUBLE), 6) AS contaminated_frac,
       CAST(ROUND(h.n_contaminated / CAST(s.n_ngrams AS DOUBLE), 6) >= {CONTAM_FRAC}
            AS INT) AS flag_remove
FROM sizes s JOIN hits h ON s.doc_id = h.doc_id
ORDER BY s.doc_id
"""


PASSAGE_K = 13  # the GPT-3/PaLM decontamination window, here doc-vs-doc


def _gram_md5_expr(k: int) -> str:
    """Distinct word-k-grams as md5 digests — 32-byte join keys instead
    of ~8x-wider raw gram strings, so the candidate join shuffles a
    fraction of the text volume."""
    joined = ", ".join(f"toks[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN size(toks) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size(toks) - {k}), "
        f"i -> md5(concat_ws(' ', {joined})))) ELSE array() END"
    )


def passage_dup_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28: cross-document duplicated-passage detection.

    Exact-substring dedup at the passage level (Lee et al. "Deduplicating
    Training Data Makes Language Models Better" target the same
    phenomenon with suffix arrays): any 13 consecutive words shared
    verbatim between two documents marks a copied passage. Each doc
    contributes its DISTINCT 13-gram digests; the candidate join is an
    equi-join on the digest — bucketed by gram, never all-pairs, so cost
    is sum(bucket^2) over grams that actually repeat, linear in corpus
    size for natural text. Output per overlapping pair: shared-gram
    count and the coverage fraction of the smaller doc (1.0 = fully
    contained passage-wise).
    """
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks_col())
    sized = docs.select(
        "doc_id", F.size(F.expr(_gram_md5_expr(PASSAGE_K))).alias("n_grams")
    )
    grams = docs.select(
        "doc_id", F.explode(F.expr(_gram_md5_expr(PASSAGE_K))).alias("g")
    )
    # explode-derived relations inherit the source's tiny size estimate;
    # without the hint Spark happily "broadcasts" a corpus-scale gram set
    pairs = (
        grams.alias("a")
        .join(grams.alias("b").hint("shuffle_hash"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sized.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("ga"))
    sb = sized.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("gb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("ga", "gb"), 6
            ).alias("small_doc_coverage"),
        )
        .orderBy("doc_a", "doc_b")
    )


_PASSAGE_GRAMS_SQL = f"""
tok AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(toks) - {PASSAGE_K - 2}, 1)),
      i -> md5(array_to_string(toks[i:i+{PASSAGE_K - 1}], ' '))))) AS g
  FROM tok WHERE len(toks) >= {PASSAGE_K}
),
sizes AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {PASSAGE_K}
              THEN len(list_distinct(list_transform(
                  range(1, greatest(len(toks) - {PASSAGE_K - 2}, 1)),
                  i -> md5(array_to_string(toks[i:i+{PASSAGE_K - 1}], ' ')))))
              ELSE 0 END AS n_grams
  FROM tok
)
"""

PASSAGE_DUP_SQL = f"""
WITH {_PASSAGE_GRAMS_SQL.strip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared,
       ROUND(COUNT(*) / CAST(least(sa.n_grams, sb.n_grams) AS DOUBLE), 6)
         AS small_doc_coverage
FROM grams a
JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
JOIN sizes sa ON sa.doc_id = a.doc_id
JOIN sizes sb ON sb.doc_id = b.doc_id
GROUP BY a.doc_id, b.doc_id, sa.n_grams, sb.n_grams
ORDER BY doc_a, doc_b
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29: unigram-LM negative log-likelihood per document.

    The CCNet/Wenzek-style LM quality signal with the honest
    no-external-model reduction: the LM is the corpus's own unigram
    distribution p(w) = tf_w / N, and each doc is scored by its mean
    -ln p(w) — word-salad scores high, stopword-heavy boilerplate low.
    Two shuffles total (term-frequency agg keyed by term; per-doc agg
    keyed by doc), both map-side combined. Per-token surprisals are
    rounded to 6 dp and summed as DECIMAL so the per-doc sum is
    order-insensitive and bit-identical across engines and partitionings.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_toks_col()).alias("w"))
    total = tok.count()  # corpus token count: one scalar, computed once
    tf = tok.groupBy("w").agg(F.count("*").alias("tf"))
    nll = F.round(F.log(F.lit(float(total)) / F.col("tf")), 6).cast("decimal(16,6)")
    return (
        tok.join(tf, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(F.sum(nll), 6).cast("double").alias("sum_nll"),
            F.round(
                F.round(F.sum(nll), 6).cast("double") / F.count("*"), 6
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
),
n AS (SELECT COUNT(*) AS total FROM tok),
tf AS (SELECT w, COUNT(*) AS tf FROM tok GROUP BY w)
SELECT doc_id, COUNT(*) AS n_tok,
       CAST(ROUND(SUM(CAST(ROUND(ln(CAST((SELECT total FROM n) AS DOUBLE) / tf), 6)
                           AS DECIMAL(16,6))), 6) AS DOUBLE) AS sum_nll,
       ROUND(CAST(ROUND(SUM(CAST(ROUND(ln(CAST((SELECT total FROM n) AS DOUBLE) / tf), 6)
                                 AS DECIMAL(16,6))), 6) AS DOUBLE) / COUNT(*), 6)
         AS avg_nll
FROM tok JOIN tf USING (w)
GROUP BY doc_id
ORDER BY doc_id
"""


# Gopher-rule thresholds (Rae et al. 2021 §A1.1, adapted to the synthetic
# corpus's scale — the RULE SET is the deliverable, the constants are
# tunable knobs).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37: the Gopher document-quality rule battery as one map-side pass.

    Each document gets the full signal vector (word count, mean word
    length in integer char units, alphabetic-word fraction, distinct
    stopword hits) plus the keep/drop verdict and the FIRST failed rule
    — the triage layout a curation run wants (count drops per reason,
    sample each bucket). Everything is array HOFs over one split — no
    explode, no shuffle except the final orderBy; at 100 TB this is a
    pure map stage that pipelines with the parquet scan.

    Mean word length stays an exact rational (total_chars, n_words kept
    separately; the comparison cross-multiplies) so the rule boundary
    is engine-exact — no float division on the filter path.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(text, ' '), w -> w <> '')"
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in ("the", "a", "of", "and", "is", "to")) + ")"
    d = (
        docs.withColumn("n_words", F.expr(f"size({toks})").cast("bigint"))
        .withColumn(
            "total_chars",
            F.expr(f"aggregate({toks}, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))"),
        )
        .withColumn(
            "n_alpha_words",
            F.expr(f"size(filter({toks}, w -> w rlike '[a-zA-Z]'))").cast("bigint"),
        )
        .withColumn(
            "n_stopwords",
            F.expr(f"size(array_intersect(array_distinct({toks}), {stop_arr}))").cast("bigint"),
        )
    )
    r_word_count = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    # mean word len in [2.0, 10.0]: cross-multiplied integer comparison
    r_mean_len = (
        F.col("total_chars") * 10 >= F.col("n_words") * int(GOPHER_MIN_MEAN_WORD_LEN * 10)
    ) & (F.col("total_chars") * 10 <= F.col("n_words") * int(GOPHER_MAX_MEAN_WORD_LEN * 10))
    r_alpha = F.col("n_alpha_words") * 10 >= F.col("n_words") * 8
    r_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    reason = (
        F.when(~r_word_count, F.lit("word_count"))
        .when(~r_mean_len, F.lit("mean_word_len"))
        .when(~r_alpha, F.lit("alpha_frac"))
        .when(~r_stop, F.lit("stopwords"))
        .otherwise(F.lit("pass"))
    )
    return d.select(
        "doc_id",
        "n_words",
        "total_chars",
        "n_alpha_words",
        "n_stopwords",
        reason.alias("drop_reason"),
        (reason == "pass").alias("keep"),
    ).orderBy("doc_id")


_GOPHER_TOKS = "list_filter(string_split(text, ' '), w -> w <> '')"

GOPHER_FILTER_SQL = f"""
WITH sig AS (
  SELECT doc_id,
         CAST(len({_GOPHER_TOKS}) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform({_GOPHER_TOKS}, w -> length(w))) AS BIGINT)
           AS total_chars,
         CAST(len(list_filter({_GOPHER_TOKS}, w -> regexp_matches(w, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_intersect(list_distinct({_GOPHER_TOKS}),
                                 ['the', 'a', 'of', 'and', 'is', 'to'])) AS BIGINT)
           AS n_stopwords
  FROM documents
),
verdict AS (
  SELECT *,
         CASE
           WHEN NOT (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
             THEN 'word_count'
           WHEN NOT (total_chars * 10 >= n_words * {int(GOPHER_MIN_MEAN_WORD_LEN * 10)}
                     AND total_chars * 10 <= n_words * {int(GOPHER_MAX_MEAN_WORD_LEN * 10)})
             THEN 'mean_word_len'
           WHEN NOT (n_alpha_words * 10 >= n_words * 8) THEN 'alpha_frac'
           WHEN NOT (n_stopwords >= {GOPHER_MIN_STOPWORDS}) THEN 'stopwords'
           ELSE 'pass'
         END AS drop_reason
  FROM sig
)
SELECT doc_id, n_words, total_chars, n_alpha_words, n_stopwords,
       drop_reason, drop_reason = 'pass' AS keep
FROM verdict
ORDER BY doc_id
"""


KEYWORDS_TOPN = 3
KEYWORDS_SCALE = 1_000_000_000


def doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C65: per-document keyword extraction — the top-{KEYWORDS_TOPN}
    rarest-weighted terms per doc, the tagging/routing signal a curation
    pipeline attaches before mixing.

    Scoring is rational TF-IDF with idf as inverse document frequency:
    rank by tf/df, computed as the exact scaled integer
    (tf * 1e9) div df — monotone in the ratio, no ln() (whose last-ulp
    libm differences between the JVM and DuckDB are exactly the
    engine-divergence class ADVICE r3 flags; bm25_rank C23 carries the
    6-dp-rounded ln variant). No df floor: the synthetic vocabulary is
    ~31 near-ubiquitous terms, so a web-style df cap would zero the
    output — relative rarity still orders them (add a df cap for real
    corpora). Shapes: one explode+count keyed by doc (tf), one
    |vocab|-row aggregate (df, broadcast), one window per doc over its
    own distinct terms — every stage map-side-combined, parallel in
    doc_id.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.withColumn("toks", _toks_col())
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_u"), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("score_u", F.expr(f"(tf * {KEYWORDS_SCALE}) div df"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KEYWORDS_TOPN)
        .select("doc_id", "rk", "term", "tf", "df", "score_u")
        .orderBy("doc_id", "rk")
    )


DOC_KEYWORDS_SQL = f"""
WITH tf AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
),
tfc AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
),
dfc AS (
  SELECT term, COUNT(*) AS df FROM tfc GROUP BY term
),
scored AS (
  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
         CAST((tfc.tf * {KEYWORDS_SCALE}) // dfc.df AS BIGINT) AS score_u
  FROM tfc JOIN dfc USING (term)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score_u DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, rk, term, tf, df, score_u
FROM ranked WHERE rk <= {KEYWORDS_TOPN}
ORDER BY doc_id, rk
"""


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C70: the end-to-end curation funnel — quality filter -> exact
    dedup -> deterministic sample, composed in ONE declarative plan with
    per-language stage counts (the run report every dataset release
    ships; proves the individual operators COMPOSE, which is how a user
    actually runs them).

    Stages reuse the graded operators' exact semantics: the Gopher rule
    battery (C37's integer-rational conditions), min-doc_id-per-md5
    exact dedup (C1's keep rule), and the content-hash Bernoulli sample
    (C14's 'sample:' threshold). Every stage is a FLAG on one frame —
    keep_q map-side, the dedup keeper from a single window over
    md5(text) (quality rows sort first, so rn=1 & keep_q IS C1's
    min-id-among-quality rule), the sample another map-side predicate —
    and the funnel report is ONE conditional aggregate + a 4-way stack:
    one corpus scan, one window shuffle, one groupBy. The oracle states
    the staged-CTE form; the flag form must (and does) hash-match it.
    """
    from .text import _SAMPLE_THRESHOLD_HEX

    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(text, ' '), w -> w <> '')"
    stop_arr = "array('the', 'a', 'of', 'and', 'is', 'to')"
    sig = (
        docs.withColumn("n_words", F.expr(f"size({toks})").cast("bigint"))
        .withColumn(
            "total_chars",
            F.expr(f"aggregate({toks}, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))"),
        )
        .withColumn(
            "n_alpha_words",
            F.expr(f"size(filter({toks}, w -> w rlike '[a-zA-Z]'))").cast("bigint"),
        )
        .withColumn(
            "n_stopwords",
            F.expr(f"size(array_intersect(array_distinct({toks}), {stop_arr}))").cast(
                "bigint"
            ),
        )
    )
    keep_q = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("total_chars") * 10 >= F.col("n_words") * int(GOPHER_MIN_MEAN_WORD_LEN * 10))
        & (F.col("total_chars") * 10 <= F.col("n_words") * int(GOPHER_MAX_MEAN_WORD_LEN * 10))
        & (F.col("n_alpha_words") * 10 >= F.col("n_words") * 8)
        & (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
    )
    from pyspark.sql import Window

    # quality rows sort FIRST within each identical-text group, so the
    # rn=1 row is the minimum-doc_id quality copy whenever one exists
    w = Window.partitionBy(F.md5("text")).orderBy(
        keep_q.cast("int").desc(), F.col("doc_id").asc()
    )
    flags = (
        sig.withColumn("keep_q", keep_q)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("is_keeper", F.col("keep_q") & (F.col("_rn") == 1))
        .withColumn(
            "is_sampled",
            F.col("is_keeper")
            & (
                F.substring(F.md5(F.concat(F.lit("sample:"), "text")), 1, 8)
                <= F.lit(_SAMPLE_THRESHOLD_HEX)
            ),
        )
    )
    agg = flags.groupBy("lang").agg(
        F.count("*").alias("n1"),
        F.sum(F.col("keep_q").cast("long")).alias("n2"),
        F.sum(F.col("is_keeper").cast("long")).alias("n3"),
        F.sum(F.col("is_sampled").cast("long")).alias("n4"),
    )
    out = agg.select(
        "lang",
        F.expr(
            "stack(4, '1_input', n1, '2_quality', n2, "
            "'3_deduped', n3, '4_sampled', n4) as (stage, n_docs)"
        ),
    )
    # the staged-CTE oracle emits a (stage, lang) row only when the
    # stage's subset is non-empty
    return (
        out.filter(F.col("n_docs") > 0)
        .select("stage", "lang", "n_docs")
        .orderBy("stage", "lang")
    )


CURATION_FUNNEL_SQL = f"""
WITH sig AS (
  SELECT *,
         CAST(len({_GOPHER_TOKS}) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform({_GOPHER_TOKS}, w -> length(w))) AS BIGINT)
           AS total_chars,
         CAST(len(list_filter({_GOPHER_TOKS}, w -> regexp_matches(w, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_intersect(list_distinct({_GOPHER_TOKS}),
                                 ['the', 'a', 'of', 'and', 'is', 'to'])) AS BIGINT)
           AS n_stopwords
  FROM documents
),
quality AS (
  SELECT * FROM sig
  WHERE n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
    AND total_chars * 10 >= n_words * {int(GOPHER_MIN_MEAN_WORD_LEN * 10)}
    AND total_chars * 10 <= n_words * {int(GOPHER_MAX_MEAN_WORD_LEN * 10)}
    AND n_alpha_words * 10 >= n_words * 8
    AND n_stopwords >= {GOPHER_MIN_STOPWORDS}
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
),
sampled AS (
  SELECT * FROM deduped
  WHERE substr(md5('sample:' || text), 1, 8) <= '{{thresh}}'
)
SELECT stage, lang, n_docs FROM (
  SELECT '1_input' AS stage, lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
  UNION ALL
  SELECT '2_quality', lang, COUNT(*) FROM quality GROUP BY lang
  UNION ALL
  SELECT '3_deduped', lang, COUNT(*) FROM deduped GROUP BY lang
  UNION ALL
  SELECT '4_sampled', lang, COUNT(*) FROM sampled GROUP BY lang
)
ORDER BY stage, lang
"""


def _curation_sql() -> str:
    from .text import _SAMPLE_THRESHOLD_HEX

    return CURATION_FUNNEL_SQL.replace("{thresh}", _SAMPLE_THRESHOLD_HEX)


# --- B89: boolean + phrase full-text search ----------------------------

_FTS_AND = ("spark", "table")
_FTS_PHRASE = ("fast", "key")


def full_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B89: boolean full-text search with phrase support — the
    tsquery/tsvector surface Greenplum ships (`'spark' & 'table' |
    "fast key"`), expressed as posting-list joins.

    The positional index (doc_id, pos, term) is ONE posexplode of the
    token array — the same inverted-index artifact BM25 (C23) and
    passage dedup (C28) build. AND is a grouped term-coverage filter
    (count distinct matched terms == |query|), the phrase is a
    self-equi-join on (doc_id, pos+1) — adjacency as an equi-condition,
    not a regex scan. Hit counts ride along so ranking (C23) can
    consume the same frame. At 100 TB the index is term-partitioned;
    both match modes are shuffles on doc_id — no full-text scan of
    documents happens anywhere (the scan builds the index once).

    Output: matching docs with which predicate matched ('and',
    'phrase', 'both') and per-mode hit counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "pos", "w"
        ),
    )
    and_hits = (
        pos.filter(F.col("w").isin(*_FTS_AND))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("w").alias("n_terms"),
            F.count("*").alias("and_hits"),
        )
        .filter(F.col("n_terms") == len(_FTS_AND))
        .select("doc_id", "and_hits")
    )
    p1 = pos.filter(F.col("w") == _FTS_PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    p2 = pos.filter(F.col("w") == _FTS_PHRASE[1]).select(
        "doc_id", F.col("pos").alias("p2")
    )
    phrase_hits = (
        p1.join(p2, (p1["doc_id"] == p2["doc_id"]) & (p2["p2"] == p1["p1"] + 1))
        .groupBy(p1["doc_id"].alias("doc_id"))
        .agg(F.count("*").alias("phrase_hits"))
    )
    return (
        and_hits.join(phrase_hits, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(
                F.col("and_hits").isNotNull() & F.col("phrase_hits").isNotNull(),
                "both",
            )
            .when(F.col("and_hits").isNotNull(), "and")
            .otherwise("phrase")
            .alias("matched_via"),
            F.coalesce("and_hits", F.lit(0)).alias("and_hits"),
            F.coalesce("phrase_hits", F.lit(0)).alias("phrase_hits"),
        )
        .orderBy("doc_id")
    )


FULL_TEXT_SEARCH_SQL = f"""
WITH pos AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS w
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
    FROM (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
  )
),
and_hits AS (
  SELECT doc_id, COUNT(*) AS and_hits
  FROM pos WHERE w IN ('{_FTS_AND[0]}', '{_FTS_AND[1]}')
  GROUP BY doc_id
  HAVING COUNT(DISTINCT w) = {len(_FTS_AND)}
),
phrase_hits AS (
  SELECT a.doc_id, COUNT(*) AS phrase_hits
  FROM pos a JOIN pos b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.w = '{_FTS_PHRASE[0]}' AND b.w = '{_FTS_PHRASE[1]}'
  GROUP BY a.doc_id
)
SELECT COALESCE(a.doc_id, p.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NOT NULL AND p.doc_id IS NOT NULL THEN 'both'
            WHEN a.doc_id IS NOT NULL THEN 'and'
            ELSE 'phrase' END AS matched_via,
       COALESCE(a.and_hits, 0) AS and_hits,
       COALESCE(p.phrase_hits, 0) AS phrase_hits
FROM and_hits a FULL OUTER JOIN phrase_hits p ON a.doc_id = p.doc_id
ORDER BY doc_id
"""


# --- C84: duplicated-passage REMOVAL plan ------------------------------


def _gram_pos_expr(k: int) -> str:
    """POSITIONED word-k-grams as md5 digests (C28 keeps only the
    distinct set; removal needs every occurrence's position)."""
    joined = ", ".join(f"toks[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN size(toks) >= {k} THEN "
        f"transform(sequence(0, size(toks) - {k}), "
        f"i -> md5(concat_ws(' ', {joined}))) ELSE array() END"
    )


def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C84: from detection (C28) to the REMOVAL PLAN — per document,
    the merged token spans covered by any {PASSAGE_K}-gram that appears
    in MORE THAN ONE document, i.e. exactly what Lee et al.'s
    suffix-array dedup cuts out of the training corpus, as an
    executable span list (doc_id, span_start..span_end) a curation job
    applies with one substring pass.

    Plan: positioned grams (ONE posexplode — the same inverted-index
    artifact as C23/C28/B89), cross-document gram set via a
    count-distinct-docs filter, an equi-join back to positions (never
    all-pairs), then B69's island merge over token positions: a new
    span starts when pos > lag(pos) + K (ranges [p, p+K-1] overlap or
    touch otherwise; pos is unique per doc so the window order is
    total — SURVEY §5). Output one row per removal span with the
    per-doc removed-token budget windowed alongside. At 100 TB every
    step is keyed by gram or doc_id; the join output is |dup
    positions|, corpus-linear at a fixed duplication rate.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", _toks_col()
    )
    pg = docs.select(
        "doc_id",
        F.posexplode(F.expr(_gram_pos_expr(PASSAGE_K))).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "g")
    dup_g = (
        pg.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    marks = pg.join(dup_g.hint("shuffle_hash"), "g").select("doc_id", "pos")
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    flagged = marks.withColumn(
        "is_new",
        F.when(
            F.lag("pos").over(w_lag).isNull()
            | (F.col("pos") > F.lag("pos").over(w_lag) + PASSAGE_K),
            1,
        ).otherwise(0),
    )
    spans = (
        flagged.withColumn(
            "span_idx",
            F.sum("is_new").over(
                w_lag.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "span_idx")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + PASSAGE_K - 1).alias("span_end"),
        )
    )
    w_doc = Window.partitionBy("doc_id")
    return (
        spans.select(
            "doc_id",
            F.col("span_idx").cast("bigint").alias("span_idx"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
        .withColumn("doc_spans", F.count("*").over(w_doc))
        .withColumn("doc_tokens_removed", F.sum("span_tokens").over(w_doc))
        .orderBy("doc_id", "span_idx")
    )


DUP_SPAN_REMOVAL_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
pg AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[i:i+{PASSAGE_K - 1}], ' ')) AS g
  FROM (
    SELECT doc_id, toks,
           unnest(range(1, greatest(len(toks) - {PASSAGE_K - 2}, 1))) AS i
    FROM tok WHERE len(toks) >= {PASSAGE_K}
  )
),
dup_g AS (
  SELECT g FROM pg GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
marks AS (
  SELECT pg.doc_id, pg.pos FROM pg JOIN dup_g ON pg.g = dup_g.g
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN LAG(pos) OVER w IS NULL
                OR pos > LAG(pos) OVER w + {PASSAGE_K}
              THEN 1 ELSE 0 END AS is_new
  FROM marks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
         CAST(SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS span_idx
  FROM flagged
),
spans AS (
  SELECT doc_id, span_idx,
         MIN(pos) AS span_start,
         MAX(pos) + {PASSAGE_K - 1} AS span_end
  FROM isl GROUP BY doc_id, span_idx
)
SELECT doc_id, span_idx, span_start, span_end,
       span_end - span_start + 1 AS span_tokens,
       COUNT(*) OVER (PARTITION BY doc_id) AS doc_spans,
       CAST(SUM(span_end - span_start + 1) OVER (PARTITION BY doc_id)
            AS BIGINT) AS doc_tokens_removed
FROM spans
ORDER BY doc_id, span_idx
"""


# --- C85: k-anonymity audit --------------------------------------------

K_ANON = 5
_KA_BAND = 100  # value generalized to 100-unit bands


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C85: k-anonymity audit over the event log's quasi-identifiers —
    the privacy gate a curation pipeline runs BEFORE releasing
    behavioral data. A row is re-identifiable when its quasi-identifier
    combination (event type, hour-of-day, generalized value band) is
    shared by fewer than k={K_ANON} rows; the audit emits every
    equivalence class with its size, the violation flag, and the
    released-vs-suppressed row budget (suppression = drop the violating
    classes, the baseline k-anonymization).

    One groupBy over the generalized keys — the generalization is
    map-side integer arithmetic (value div {_KA_BAND}: a band, never a
    ROUND), so at 100 TB this is the same plan as any rollup. The
    choice of generalization hierarchy (wider bands, coarser hours)
    is policy, not engine; this operator is the measurement both sides
    of that policy loop share.
    """
    ev = load_table(spark, sf_dir, "events")
    classes = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hour_of_day"),
            F.expr(f"CAST(floor(value / {_KA_BAND}) AS INT)").alias("value_band"),
        )
        .groupBy("event_type", "hour_of_day", "value_band")
        .agg(F.count("*").alias("n"))
    )
    return classes.select(
        "event_type",
        "hour_of_day",
        "value_band",
        "n",
        (F.col("n") < K_ANON).cast("int").alias("violates_k"),
        F.when(F.col("n") < K_ANON, 0)
        .otherwise(F.col("n"))
        .alias("released_rows"),
    ).orderBy("event_type", "hour_of_day", "value_band")


K_ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT event_type,
         CAST(hour(ts) AS INT) AS hour_of_day,
         CAST(floor(value / {_KA_BAND}) AS INT) AS value_band,
         COUNT(*) AS n
  FROM events
  GROUP BY event_type, hour(ts), CAST(floor(value / {_KA_BAND}) AS INT)
)
SELECT event_type, hour_of_day, value_band, n,
       CAST(n < {K_ANON} AS INT) AS violates_k,
       CAST(CASE WHEN n < {K_ANON} THEN 0 ELSE n END AS BIGINT)
         AS released_rows
FROM classes
ORDER BY event_type, hour_of_day, value_band
"""


# --- C87: cross-split contamination matrix -----------------------------


def split_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C87: pairwise {PASSAGE_K}-gram overlap between the train/val/test
    splits — the eval-hygiene artifact C24 (corpus-vs-benchmark) and
    C76 (the split manifest) compose into: for every split pair, how
    many verbatim passages cross the boundary, and the containment of
    the smaller side in basis points. A non-trivial number here means
    the eval loss is partly memorization — the first table any dataset
    release review asks for.

    Split assignment is C76's content-hash band (md5('split:'||id) mod
    100 — reproducible, never rand()); grams are C28's distinct
    13-gram digests. Plan: per-split DISTINCT gram sets (one shuffle
    keyed by gram), pairwise equi-joins on the digest — never
    all-pairs; overlap cardinality is bounded by the smaller side.
    """
    from .text import _SPLIT_BOUNDS

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", _toks_col()
    )
    h7 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")
    arms = " ".join(
        f"WHEN pct < {hi} THEN '{name}'" for name, _lo, hi in _SPLIT_BOUNDS
    )
    grams = (
        docs.withColumn("pct", h7 % 100)
        .withColumn("split", F.expr(f"CASE {arms} END"))
        .select("split", F.explode(F.expr(_gram_md5_expr(PASSAGE_K))).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("split").agg(F.count("*").alias("n_grams"))
    pairs = (
        grams.alias("a")
        .join(grams.alias("b").hint("shuffle_hash"), "g")
        .filter(F.col("a.split") < F.col("b.split"))
        .groupBy(
            F.col("a.split").alias("split_a"),
            F.col("b.split").alias("split_b"),
        )
        .agg(F.count("*").alias("shared_grams"))
    )
    sa = sizes.select(
        F.col("split").alias("split_a"), F.col("n_grams").alias("grams_a")
    )
    sb = sizes.select(
        F.col("split").alias("split_b"), F.col("n_grams").alias("grams_b")
    )
    return (
        pairs.join(sa, "split_a")
        .join(sb, "split_b")
        .select(
            "split_a",
            "split_b",
            "grams_a",
            "grams_b",
            "shared_grams",
            F.expr(
                "(shared_grams * 10000) div least(grams_a, grams_b)"
            ).alias("containment_bp"),
        )
        .orderBy("split_a", "split_b")
    )


SPLIT_CONTAMINATION_SQL = f"""
WITH assigned AS (
  SELECT doc_id, text,
         CASE {{split_case}} END AS split
  FROM (
    SELECT *, {{split_hex}} % 100 AS pct FROM documents
  )
),
tok AS (
  SELECT split, {_TOKS_SQL} AS toks FROM assigned
),
grams AS (
  SELECT DISTINCT split,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - {PASSAGE_K - 2}, 1)),
             i -> md5(array_to_string(toks[i:i+{PASSAGE_K - 1}], ' '))))) AS g
  FROM tok WHERE len(toks) >= {PASSAGE_K}
),
sizes AS (
  SELECT split, COUNT(*) AS n_grams FROM grams GROUP BY split
),
pairs AS (
  SELECT a.split AS split_a, b.split AS split_b, COUNT(*) AS shared_grams
  FROM grams a JOIN grams b ON a.g = b.g AND a.split < b.split
  GROUP BY a.split, b.split
)
SELECT p.split_a, p.split_b,
       sa.n_grams AS grams_a, sb.n_grams AS grams_b, p.shared_grams,
       CAST((p.shared_grams * 10000) // least(sa.n_grams, sb.n_grams)
            AS BIGINT) AS containment_bp
FROM pairs p
JOIN sizes sa ON sa.split = p.split_a
JOIN sizes sb ON sb.split = p.split_b
ORDER BY split_a, split_b
"""


def _split_contamination_sql() -> str:
    from .text import _SPLIT_CASE, _split_hex7

    return SPLIT_CONTAMINATION_SQL.format(
        split_case=_SPLIT_CASE, split_hex=_split_hex7
    )


# --- C95 (round 6): decontamination sensitivity to n-gram width ---------

SWEEP_KS = (2, 3, 5)  # gram widths swept (C24 fixes k=3)


def contamination_ngram_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C95: the decontamination calibration table — how flag rates move
    with the n-gram width k. Small k over-flags (common phrases look
    like leaks); large k under-flags (paraphrases slip through); this
    sweep is the table an operator reads before fixing C24's k.

    Per k in {SWEEP_KS}: the SAME benchmark-split overlap pass as C24
    (bench grams broadcast, corpus scan shuffle-free before the per-doc
    count), aggregated to one row: corpus docs, docs with ANY overlap,
    docs over the removal threshold, flag rate in basis points, and
    total contaminated-gram mass. The flag threshold is the EXACT
    integer form of C24's CONTAM_FRAC=0.1 (n_contaminated * 10 >=
    n_ngrams) — no float division anywhere, so both engines agree
    bit-for-bit at every k.

    Scale shape: one corpus scan per k (gram widths cannot share an
    explode), each map-side until the per-doc count; output is |ks|
    rows. At 100 TB the bench set stays broadcast-sized by definition
    (eval sets are small) and the sweep is k scans of the same
    pushed-down projection.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", _toks_col()
    )
    parts = []
    for k in SWEEP_KS:
        grams = docs.select(
            "doc_id", F.explode(F.expr(_ngram_expr(k))).alias("ng")
        )
        bench = (
            grams.filter(F.col("doc_id") % CONTAM_MOD == 0)
            .select("ng")
            .distinct()
        )
        sizes = docs.filter(F.col("doc_id") % CONTAM_MOD != 0).select(
            "doc_id", F.size(F.expr(_ngram_expr(k))).alias("n_ngrams")
        )
        hits = (
            grams.filter(F.col("doc_id") % CONTAM_MOD != 0)
            .join(F.broadcast(bench), "ng")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_contaminated"))
        )
        per_doc = sizes.join(hits, "doc_id", "left").select(
            "n_ngrams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_cont"),
        )
        parts.append(
            per_doc.agg(
                F.lit(k).alias("ngram_k"),
                F.count("*").alias("n_docs"),
                F.sum((F.col("n_cont") > 0).cast("long")).alias("n_docs_hit"),
                F.sum(
                    (
                        (F.col("n_ngrams") > 0)
                        & (F.col("n_cont") * 10 >= F.col("n_ngrams"))
                    ).cast("long")
                ).alias("n_flagged"),
                F.sum("n_cont").alias("hit_grams_total"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "flag_rate_bp", F.expr("(n_flagged * 10000) div n_docs")
    ).orderBy("ngram_k")


def _contam_sweep_block(k: int) -> str:
    return f"""
  SELECT {k} AS ngram_k, COUNT(*) AS n_docs,
         CAST(SUM(CAST(n_cont > 0 AS BIGINT)) AS BIGINT) AS n_docs_hit,
         CAST(SUM(CAST(n_ngrams > 0 AND n_cont * 10 >= n_ngrams AS BIGINT))
              AS BIGINT) AS n_flagged,
         CAST(SUM(n_cont) AS BIGINT) AS hit_grams_total
  FROM (
    SELECT s.n_ngrams, COALESCE(h.n_contaminated, 0) AS n_cont
    FROM (
      SELECT doc_id, len({_ngram_sql_k(k)}) AS n_ngrams
      FROM tok WHERE doc_id % {CONTAM_MOD} <> 0
    ) s
    LEFT JOIN (
      SELECT g.doc_id, COUNT(*) AS n_contaminated
      FROM (SELECT doc_id, unnest({_ngram_sql_k(k)}) AS ng FROM tok) g
      JOIN (SELECT DISTINCT ng
            FROM (SELECT doc_id, unnest({_ngram_sql_k(k)}) AS ng FROM tok)
            WHERE doc_id % {CONTAM_MOD} = 0) b ON g.ng = b.ng
      WHERE g.doc_id % {CONTAM_MOD} <> 0
      GROUP BY g.doc_id
    ) h ON s.doc_id = h.doc_id
  )"""


CONTAMINATION_SWEEP_SQL = (
    f"WITH tok AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)\n"
    + "SELECT *, CAST((n_flagged * 10000) // n_docs AS BIGINT)"
    + " AS flag_rate_bp FROM (\n"
    + "\n  UNION ALL\n".join(_contam_sweep_block(k) for k in SWEEP_KS)
    + "\n) ORDER BY ngram_k"
)


# --- C99 (round-8 addition): Pareto curation frontier -------------------


def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C99 (round-8 addition): the per-source Pareto frontier of
    documents under (maximize length, maximize vocabulary richness) —
    the skyline every quality-vs-cost curation sweep reads: a document
    is ON the frontier iff no other document of its source is at least
    as long AND at least as rich with one strict improvement. Both
    axes integer-exact (n_chars; distinct-token count), so the oracle
    hashes bit-for-bit.

    Plan — the 2D skyline WITHOUT the O(n^2) dominance join: per
    source, a row is dominated iff
      max(rich | longer docs)        >= its richness, or
      max(rich | equal-length docs)  >  its richness.
    The first max is a RUNNING frame over descending length — ordered
    by -n_chars with RANGE (unboundedPreceding, -1), i.e. strictly
    longer docs only — never the quadratic currentRow→unboundedFollowing
    frame the plan-smell sweep bans (the r7 asof lesson: O(1)/row vs a
    206x rescan); the second is a plain same-length partition max. One
    sort shuffle per source group, O(n log n) total, skyline selected
    by two window columns. The oracle states dominance directly as
    NOT EXISTS — the O(n^2) sequential truth for the O(n log n)
    distributed plan.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr(
            "size(array_distinct(filter(split(text, ' '), t -> t != '')))"
        ).cast("long").alias("vocab"),
    )
    w_longer = (
        Window.partitionBy("source")
        .orderBy((-F.col("n_chars")).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy("source", "n_chars")
    return (
        docs.withColumn("m_longer", F.max("vocab").over(w_longer))
        .withColumn("m_equal", F.max("vocab").over(w_equal))
        .filter(
            (F.col("m_longer").isNull() | (F.col("m_longer") < F.col("vocab")))
            & (F.col("m_equal") <= F.col("vocab"))
        )
        .select("source", "doc_id", "n_chars", "vocab")
        .orderBy("source", "doc_id")
    )


PARETO_FRONTIER_SQL = """
WITH m AS (
  SELECT doc_id, source, n_chars,
         len(list_distinct(list_filter(string_split(text, ' '),
                                       t -> t <> ''))) AS vocab
  FROM documents
)
SELECT a.source, a.doc_id, a.n_chars, a.vocab
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.source = a.source
    AND b.n_chars >= a.n_chars AND b.vocab >= a.vocab
    AND (b.n_chars > a.n_chars OR b.vocab > a.vocab)
)
ORDER BY a.source, a.doc_id
"""


# --- C101 (round-8 addition): reciprocal rank fusion --------------------

_RRF_K = 60            # the standard RRF damping constant
_RRF_SCALE = 10 ** 9   # fixed-point: each term = floor(1e9 / (k + rank))
_RRF_TOP = 5           # fused results kept per source


def reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C101 (round-8 addition): reciprocal rank fusion (Cormack et
    al., SIGIR'09) — the rank-combination every hybrid-retrieval data
    pipeline runs to merge a lexical and a semantic ranking before
    dedup/curation. Here the two per-source rankings are vocabulary
    richness (distinct tokens) and document length — deterministic,
    integer-exact stand-ins with full tie discipline (doc_id
    tiebreak), fused as

        rrf = sum_r floor(1e9 / (k + rank_r)),   k = 60

    floor division keeps every term INTEGER (the float 1/(k+r) sum
    would be engine-order-dependent); top 5 per source kept.

    Plan: two per-source row_number windows over the same scan (one
    sort shuffle each, never a global/empty partitionBy — the
    single-task smell the sweep bans), an integer map, one more
    window for the final top-k. All exact; oracle is the same three
    windows in SQL.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr(
            "size(array_distinct(filter(split(text, ' '), t -> t != '')))"
        ).cast("long").alias("vocab"),
    )
    w_vocab = Window.partitionBy("source").orderBy(
        F.desc("vocab"), F.asc("doc_id")
    )
    w_len = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number().over(w_vocab).alias("rank_vocab"),
        F.row_number().over(w_len).alias("rank_len"),
    ).withColumn(
        "rrf_score",
        F.expr(
            f"{_RRF_SCALE} div ({_RRF_K} + rank_vocab)"
            f" + {_RRF_SCALE} div ({_RRF_K} + rank_len)"
        ),
    )
    w_top = Window.partitionBy("source").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        ranked.withColumn("fused_rank", F.row_number().over(w_top))
        .filter(F.col("fused_rank") <= _RRF_TOP)
        .select(
            "source", "fused_rank", "doc_id",
            "rank_vocab", "rank_len", "rrf_score",
        )
        .orderBy("source", "fused_rank")
    )


RECIPROCAL_RANK_FUSION_SQL = f"""
WITH m AS (
  SELECT doc_id, source, n_chars,
         len(list_distinct(list_filter(string_split(text, ' '),
                                       t -> t <> ''))) AS vocab
  FROM documents
),
ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY vocab DESC, doc_id) AS rank_vocab,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rank_len
  FROM m
),
scored AS (
  SELECT source, doc_id, rank_vocab, rank_len,
         {_RRF_SCALE} // ({_RRF_K} + rank_vocab)
           + {_RRF_SCALE} // ({_RRF_K} + rank_len) AS rrf_score
  FROM ranked
),
fused AS (
  SELECT source, doc_id, rank_vocab, rank_len, rrf_score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY rrf_score DESC, doc_id) AS fused_rank
  FROM scored
)
SELECT source, CAST(fused_rank AS INT) AS fused_rank, doc_id,
       CAST(rank_vocab AS INT) AS rank_vocab,
       CAST(rank_len AS INT) AS rank_len,
       CAST(rrf_score AS BIGINT) AS rrf_score
FROM fused
WHERE fused_rank <= {_RRF_TOP}
ORDER BY source, fused_rank
"""


# --- C102 (round-8 addition): unicode anomaly scan ----------------------

# The character classes a curation pipeline screens before training:
# invisible joiners/spaces that hide spans from dedup, bidi controls
# that reorder rendered text (CVE-2021-42574 "Trojan Source"), and the
# replacement char that marks upstream mojibake. Stated as explicit
# code-point lists so both engines scan for EXACTLY the same set.
_UNICODE_ANOMALIES = (
    ("zero_width", (0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF)),
    ("bidi_control", (0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
                      0x2066, 0x2067, 0x2068, 0x2069)),
    ("replacement", (0xFFFD,)),
    ("c0_control", tuple(range(0x00, 0x09)) + (0x0B, 0x0C)
     + tuple(range(0x0E, 0x20))),
)


def unicode_anomaly_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C102 (round-8 addition): per-source unicode anomaly audit — the
    screen a corpus passes before training: zero-width characters
    (invisible to the eye, poison to exact dedup), bidi control
    characters (the "Trojan Source" reordering class), replacement
    chars (upstream decode damage), and stray C0 controls. Per
    (source, class): documents affected and total occurrences — all
    integer-exact counts over explicit shared code-point lists.

    Plan: one corpus scan; per class a regexp_count with a verbatim
    code-point character class (JVM regex, codegen'd — no Python in
    the hot path), then one map-side-combined groupBy(source). The
    oracle states the same counts via length-difference over
    regexp_replace with the identical pattern.
    """
    def _cls(points: tuple) -> str:
        return "[" + "".join(f"\\x{{{p:04X}}}" for p in points) + "]"

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_class = []
    for name, points in _UNICODE_ANOMALIES:
        pat = _cls(points)
        per_class.append(
            docs.select(
                "source",
                F.lit(name).alias("anomaly"),
                F.regexp_count("text", F.lit(pat)).alias("hits"),
            )
        )
    union = per_class[0]
    for df in per_class[1:]:
        union = union.unionByName(df)
    return (
        union.groupBy("source", "anomaly")
        .agg(
            F.sum((F.col("hits") > 0).cast("long")).alias("docs_affected"),
            F.sum("hits").alias("occurrences"),
        )
        .orderBy("source", "anomaly")
    )


def _unicode_sql() -> str:
    classes = []
    for name, points in _UNICODE_ANOMALIES:
        pat = "[" + "".join(f"\\x{{{p:04X}}}" for p in points) + "]"
        classes.append(
            f"SELECT source, '{name}' AS anomaly,\n"
            f"       len(text) - len(regexp_replace(text, '{pat}', '', 'g'))\n"
            f"         AS hits\n"
            f"FROM documents"
        )
    body = "\nUNION ALL\n".join(classes)
    return f"""
WITH hits AS (
{body}
)
SELECT source, anomaly,
       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       CAST(SUM(hits) AS BIGINT) AS occurrences
FROM hits
GROUP BY source, anomaly
ORDER BY source, anomaly
"""


UNICODE_ANOMALY_SCAN_SQL = _unicode_sql()


# Truncated two-sided geometric noise (alpha = 1/2, i.e. epsilon = ln 2
# per released cell), STATED as exclusive upper thresholds over a
# uniform 60-bit hash u in [0, 2^60): k(u) = first j with u < bound(j).
# P(0) = 1/3, P(+-j) = (1/3)*2^-j, tails beyond +-8 folded into the end
# bins (the standard truncated-geometric release mechanism). Both
# engines consume the same 17 literals, so the mechanism is
# deterministic and engine-exact — no RNG, no float CDF inversion.
DP_NOISE_BOUNDS = (
    (-8, 3002399751580330),
    (-7, 6004799503160661),
    (-6, 12009599006321322),
    (-5, 24019198012642645),
    (-4, 48038396025285290),
    (-3, 96076792050570581),
    (-2, 192153584101141162),
    (-1, 384307168202282325),
    (0, 768614336404564650),
    (1, 960767920505705813),
    (2, 1056844712556276394),
    (3, 1104883108581561685),
    (4, 1128902306594204330),
    (5, 1140911905600525653),
    (6, 1146916705103686314),
    (7, 1149919104855266645),
    (8, 1152921504606846976),
)


def _dp_noise_case(u_col: str) -> str:
    """CASE cascade mapping the uniform 60-bit integer to the noise k."""
    arms = " ".join(
        f"WHEN {u_col} < {b} THEN {k}" for k, b in DP_NOISE_BOUNDS[:-1]
    )
    return f"CASE {arms} ELSE {DP_NOISE_BOUNDS[-1][0]} END"


def dp_histogram_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C106 (round-8 addition): differentially-private histogram
    release of the (source, lang) document counts — the mechanism a
    data owner runs before publishing corpus composition stats. Every
    cell of the PUBLIC domain (distinct sources x distinct langs)
    reports, INCLUDING empty cells: releasing only non-empty cells
    leaks exact absence, the textbook stability-histogram mistake.
    Noise is the truncated two-sided geometric (alpha=1/2, eps=ln 2)
    derived from a keyed md5 of the cell label via the stated
    DP_NOISE_BOUNDS table — deterministic, integer-exact, auditable;
    released counts clamp at 0 (counts are non-negative by contract).

    Plan: one (source, lang) rollup; the domain spine is the broadcast
    product of the two small distinct sets; noise is pure map-side
    expression work (md5 -> 60-bit int -> 16-comparison CASE). At
    100 TB the rollup is the only shuffle and its width is the
    released histogram's, not the corpus's.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    spine = (
        docs.select("source").distinct()
        .crossJoin(F.broadcast(docs.select("lang").distinct()))
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("dp-release-v1"), "source", "lang")),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return (
        spine.join(counts, ["source", "lang"], "left")
        .select(
            "source", "lang",
            F.coalesce("n", F.lit(0)).alias("n"),
            u.alias("u"),
        )
        .withColumn("noise", F.expr(_dp_noise_case("u")).cast("long"))
        .select(
            "source", "lang",
            F.greatest(F.col("n") + F.col("noise"), F.lit(0)).alias("released_n"),
            "noise",
        )
        .orderBy("source", "lang")
    )


DP_HISTOGRAM_RELEASE_SQL = f"""
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
spine AS (
  SELECT s.source, l.lang
  FROM (SELECT DISTINCT source FROM documents) s,
       (SELECT DISTINCT lang FROM documents) l
),
cells AS (
  SELECT sp.source, sp.lang, COALESCE(c.n, 0) AS n,
         CAST(('0x' || substr(md5('dp-release-v1' || '|' || sp.source
                || '|' || sp.lang), 1, 15)) AS BIGINT) AS u
  FROM spine sp LEFT JOIN counts c
    ON c.source = sp.source AND c.lang = sp.lang
),
noised AS (
  SELECT source, lang, n, {_dp_noise_case("u")} AS noise FROM cells
)
SELECT source, lang,
       CAST(GREATEST(n + noise, 0) AS BIGINT) AS released_n,
       CAST(noise AS BIGINT) AS noise
FROM noised
ORDER BY source, lang
"""


L_DIVERSITY = 3  # distinct sensitive values required per equivalence class


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B120 (round-8 addition): l-diversity audit — the attack model
    k-anonymity (C85) cannot see: a class of k rows that all belong to
    the SAME user is k-anonymous yet discloses everything (homogeneity
    attack, Machanavajjhala et al., ICDE'06). Over C85's exact
    equivalence classes (event type, hour-of-day, value band) the
    sensitive attribute is the user identity: each class reports its
    size, the count of DISTINCT users, the l={l} violation flag, and
    the dominant user's share of the class in basis points (the
    probabilistic-disclosure number a stricter t-closeness policy
    reads). A class can pass k and fail l — the audit exists to show
    exactly those rows.

    Plan: one (class, user) rollup then one class rollup (map-side
    combined, the max_by dominant count rides the same pass); at
    100 TB this is two rollups on the same key prefix — no wider
    shuffle than C85 itself.
    """.format(l=L_DIVERSITY)
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hour_of_day"),
            F.expr(f"CAST(floor(value / {_KA_BAND}) AS INT)").alias(
                "value_band"
            ),
            "user_id",
        )
        .groupBy("event_type", "hour_of_day", "value_band", "user_id")
        .agg(F.count("*").alias("n_user"))
    )
    return (
        per_user.groupBy("event_type", "hour_of_day", "value_band")
        .agg(
            F.sum("n_user").alias("n"),
            F.count("*").alias("distinct_users"),
            F.max("n_user").alias("dominant_user_rows"),
        )
        .select(
            "event_type",
            "hour_of_day",
            "value_band",
            "n",
            "distinct_users",
            (F.col("distinct_users") < L_DIVERSITY).cast("int").alias(
                "violates_l"
            ),
            F.expr("dominant_user_rows * 10000 div n").alias(
                "dominant_share_bp"
            ),
        )
        .orderBy("event_type", "hour_of_day", "value_band")
    )


L_DIVERSITY_SQL = f"""
WITH per_user AS (
  SELECT event_type,
         CAST(hour(ts) AS INT) AS hour_of_day,
         CAST(floor(value / {_KA_BAND}) AS INT) AS value_band,
         user_id, COUNT(*) AS n_user
  FROM events
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, hour_of_day, value_band,
       CAST(SUM(n_user) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS distinct_users,
       CAST(CASE WHEN COUNT(*) < {L_DIVERSITY} THEN 1 ELSE 0 END AS INT)
         AS violates_l,
       CAST(MAX(n_user) * 10000 // SUM(n_user) AS BIGINT)
         AS dominant_share_bp
FROM per_user
GROUP BY event_type, hour_of_day, value_band
ORDER BY event_type, hour_of_day, value_band
"""


# Flesch reading-ease coefficients (Flesch 1948; DoD MIL-M-38784 usage)
# and the Gunning-fog complex-word threshold (>= 3 syllable groups).
_READ_SENT_RE = "[.!?]+"
_READ_VOWEL_RE = "[aeiouy]+"


def readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C121 (round-8 addition): per-source readability audit — the
    Flesch reading-ease / Gunning-fog pair every text-curation
    pipeline uses to bucket corpora by difficulty (and to screen
    degenerate sources: boilerplate reads implausibly uniform,
    keyword-stuffed spam reads implausibly "hard"). Counting rules
    are the classic latin-script heuristics, STATED identically in
    both engines: words = whitespace tokens, sentences =
    ``[.!?]+`` runs floored at 1 per document, syllables = ``max(1,
    vowel-group runs)`` per word (the no-vowel token — an id, a
    number — counts 1), complex words = tokens with >= 3 vowel
    groups. Scripts without latin vowels (zh) legitimately floor at
    1 syllable/word — the audit is per SOURCE and the heuristic's
    scope is stated, not hidden.

    Exactness: all five corpus statistics are exact BIGINT sums;
    ratios are integer floor divisions (ppm / bp); the two headline
    scores are doubles ONLY in the final stated expressions over
    exact integer ratios (the B117 discipline), floored at x1000
    scale: flesch_x1000 = floor(1000 * (206.835 - 1.015*wps -
    84.6*spw)), fog_x1000 = floor(1000 * 0.4 * (wps + 100*cwr)).

    Plan: sentences ride the un-exploded scan (one regexp_count);
    the token explode feeds ONE (source) rollup — map-side combined,
    the only shuffle; output |sources| rows. The explode is the
    linear must-touch-every-token cost every tokenizer op pays.
    """
    docs = load_table(spark, sf_dir, "documents")
    sent = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.greatest(
                F.lit(1), F.regexp_count("text", F.lit(_READ_SENT_RE))
            ).cast("long")
        ).alias("n_sentences"),
    )
    toks = docs.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).alias("w"),
    ).select(
        "source",
        F.greatest(
            F.lit(1), F.regexp_count("w", F.lit(_READ_VOWEL_RE))
        ).cast("long").alias("syl"),
    )
    words = toks.groupBy("source").agg(
        F.count("*").alias("n_words"),
        F.sum("syl").alias("n_syllables"),
        F.sum((F.col("syl") >= 3).cast("long")).alias("n_complex"),
    )
    wps = "(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
    spw = "(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
    cwr = "(CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE))"
    return (
        sent.join(words, "source")
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_sentences",
            "n_syllables",
            "n_complex",
            F.expr("n_words * 1000000 div n_sentences").alias(
                "words_per_sentence_ppm"
            ),
            F.expr("n_syllables * 1000000 div n_words").alias(
                "syllables_per_word_ppm"
            ),
            F.expr("n_complex * 10000 div n_words").alias("complex_bp"),
            F.expr(
                f"CAST(floor(1000 * (206.835 - 1.015 * {wps}"
                f" - 84.6 * {spw})) AS BIGINT)"
            ).alias("flesch_x1000"),
            F.expr(
                f"CAST(floor(1000 * 0.4 * ({wps} + 100 * {cwr}))"
                " AS BIGINT)"
            ).alias("fog_x1000"),
        )
        .orderBy("source")
    )


def _readability_sql() -> str:
    wps = "(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
    spw = "(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
    cwr = "(CAST(n_complex AS DOUBLE) / CAST(n_words AS DOUBLE))"
    return f"""
WITH sent AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(GREATEST(1, len(regexp_extract_all(text, '{_READ_SENT_RE}'))))
           AS n_sentences
  FROM documents GROUP BY source
),
toks AS (
  SELECT source,
         GREATEST(1, len(regexp_extract_all(w, '{_READ_VOWEL_RE}'))) AS syl
  FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
    FROM documents
  )
),
words AS (
  SELECT source, COUNT(*) AS n_words, SUM(syl) AS n_syllables,
         SUM(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS n_complex
  FROM toks GROUP BY source
)
SELECT s.source,
       CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(w.n_words AS BIGINT) AS n_words,
       CAST(s.n_sentences AS BIGINT) AS n_sentences,
       CAST(w.n_syllables AS BIGINT) AS n_syllables,
       CAST(w.n_complex AS BIGINT) AS n_complex,
       CAST(w.n_words * 1000000 // s.n_sentences AS BIGINT)
         AS words_per_sentence_ppm,
       CAST(w.n_syllables * 1000000 // w.n_words AS BIGINT)
         AS syllables_per_word_ppm,
       CAST(w.n_complex * 10000 // w.n_words AS BIGINT) AS complex_bp,
       CAST(floor(1000 * (206.835 - 1.015 * {wps} - 84.6 * {spw}))
            AS BIGINT) AS flesch_x1000,
       CAST(floor(1000 * 0.4 * ({wps} + 100 * {cwr})) AS BIGINT)
         AS fog_x1000
FROM sent s JOIN words w ON w.source = s.source
ORDER BY s.source
"""


READABILITY_SQL = _readability_sql()


_SUPP_RE = "[\\x{10000}-\\x{10FFFF}]"  # astral plane (2 UTF-16 units)
_COMBINING_RE = "[\\x{0300}-\\x{036F}]"  # combining diacritical marks


def text_width_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C124 (round-8 addition): text-width accounting audit — the
    three lengths every pipeline conflates until one of them bills
    wrong: UTF-8 BYTES (storage, shuffle sizing, byte-budget APIs),
    CODEPOINTS (most tokenizer pre-processing), and UTF-16 CODE UNITS
    (the JVM/JS `length`, and what several embedding/LLM APIs meter).
    ASCII corpora make them equal and the bug invisible; one emoji
    page makes byte budgets overrun 4x. Per source: exact sums of all
    three, astral-plane codepoints (each costs 2 UTF-16 units — the
    stated identity utf16 = codepoints + astral is how the audit
    computes it), combining marks (the grapheme-vs-codepoint gap for
    the Mn 0300-036F block, stated), and floor-div ratios in ppm.

    Both engines state the same primitives: octet_length/strlen,
    length (codepoints in both — verified against decomposed
    accents), and the two verbatim codepoint-class regexes. One
    corpus scan, one map-side source rollup — no other shuffle. The
    sf corpora are ASCII (the audit proves it: ratios exactly 1e6),
    so a crafted multibyte/emoji/combining pytest carries the
    discrepancy semantics, the C102 discipline.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Spark SQL string literals consume one backslash level; DuckDB's
    # do not — escape here so BOTH engines run the identical regex
    supp = _SUPP_RE.replace("\\", "\\\\")
    comb = _COMBINING_RE.replace("\\", "\\\\")
    per = docs.select(
        "source",
        F.expr("octet_length(text)").cast("long").alias("b"),
        F.length("text").cast("long").alias("cp"),
        F.size(F.expr(f"regexp_extract_all(text, '{supp}', 0)"))
        .cast("long")
        .alias("astral"),
        F.size(F.expr(f"regexp_extract_all(text, '{comb}', 0)"))
        .cast("long")
        .alias("comb"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("b").alias("utf8_bytes"),
            F.sum("cp").alias("codepoints"),
            F.sum(F.col("cp") + F.col("astral")).alias("utf16_units"),
            F.sum("astral").alias("astral_codepoints"),
            F.sum("comb").alias("combining_marks"),
        )
        .select(
            "source",
            "n_docs",
            "utf8_bytes",
            "codepoints",
            "utf16_units",
            "astral_codepoints",
            "combining_marks",
            F.expr("utf8_bytes * 1000000 div codepoints").alias(
                "bytes_per_cp_ppm"
            ),
            F.expr("utf16_units * 1000000 div codepoints").alias(
                "utf16_per_cp_ppm"
            ),
        )
        .orderBy("source")
    )


TEXT_WIDTH_SQL = f"""
WITH per AS (
  SELECT source,
         strlen(text) AS b,
         length(text) AS cp,
         len(regexp_extract_all(text, '{_SUPP_RE}')) AS astral,
         len(regexp_extract_all(text, '{_COMBINING_RE}')) AS comb
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b) AS BIGINT) AS utf8_bytes,
       CAST(SUM(cp) AS BIGINT) AS codepoints,
       CAST(SUM(cp + astral) AS BIGINT) AS utf16_units,
       CAST(SUM(astral) AS BIGINT) AS astral_codepoints,
       CAST(SUM(comb) AS BIGINT) AS combining_marks,
       CAST(SUM(b) * 1000000 // SUM(cp) AS BIGINT) AS bytes_per_cp_ppm,
       CAST(SUM(cp + astral) * 1000000 // SUM(cp) AS BIGINT)
         AS utf16_per_cp_ppm
FROM per
GROUP BY source
ORDER BY source
"""
