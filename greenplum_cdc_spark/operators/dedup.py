"""Deduplication operators for training-data curation (SURVEY §2 C1-C4).

These are the ops a 100 TB text-curation pipeline runs on the replicated
corpus. All hashing uses md5 (identical lowercase-hex output in Spark and
DuckDB) so every op is oracle-checkable bit-for-bit.

Scale design:
- exact dedup: one hash-shuffle on the digest — the optimal plan at any
  scale;
- MinHash/LSH: candidate generation is a band-bucket equi-join (linear in
  corpus size + collision pairs), never an all-pairs product; banding
  (4 bands x 2 rows) tunes the similarity threshold per Broder;
- shingling / signatures stay in whole-stage codegen (split + lead +
  md5 + conditional agg) — no Python in the hot path;
- n-gram Jaccard joins on rare shingles, so pair cost ~ sum of squared
  bucket sizes, bounded by shingle selectivity rather than |corpus|².
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table

N_HASHES = 8
N_BANDS = 4  # rows-per-band = N_HASHES // N_BANDS = 2
SHINGLE_WORDS = 3
JACCARD_THRESHOLD = 0.35


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: exact dedup — md5(text) hash-groupBy, keep min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keeper_doc_id
"""


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).filter(F.col("w") != "")


def _shingles(docs: DataFrame) -> DataFrame:
    """Word 3-gram shingles via lead windows — one shuffle on doc_id."""
    tok = _tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = F.concat_ws(" ", "w", F.lead("w", 1).over(w), F.lead("w", 2).over(w))
    n_lead = SHINGLE_WORDS - 1
    return (
        tok.withColumn("w2", F.lead("w", n_lead).over(w))
        .withColumn("sh", sh)
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "sh")
    )


# DuckDB twin of _tokens/_shingles (zipped unnest gives posexplode).
_SHINGLES_SQL = """
tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
tok2 AS (SELECT * FROM tok WHERE w <> ''),
sh AS (
  SELECT doc_id,
         w || ' ' || LEAD(w, 1) OVER win || ' ' || LEAD(w, 2) OVER win AS sh,
         LEAD(w, 2) OVER win AS w2
  FROM tok2
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
shingles AS (SELECT doc_id, sh FROM sh WHERE w2 IS NOT NULL)
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: MinHash signatures + banded LSH candidate pairs.

    shingle → md5(seed:shingle) per seed → per-doc min (the MinHash) →
    band digests → equi-join on (band_idx, digest) → candidate pairs
    with the number of agreeing bands.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(N_HASHES)])).alias("seed")
    hashed = sh.select("doc_id", seeds, "sh").withColumn(
        "h", F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("sh")))
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.when(F.col("seed") == i, F.col("h"))).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )
    rows_per_band = N_HASHES // N_BANDS
    band_cols = []
    for b in range(N_BANDS):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat(*parts)).alias(f"b{b}"))
    banded = sig.select("doc_id", *band_cols)
    stack_expr = "stack({n}, {args}) as (band_idx, digest)".format(
        n=N_BANDS, args=", ".join(f"{b}, b{b}" for b in range(N_BANDS))
    )
    unpivoted = banded.select("doc_id", F.expr(stack_expr))
    a = unpivoted.alias("a")
    b = unpivoted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
        .orderBy("doc_a", "doc_b")
    )


def _minhash_sql() -> str:
    mins = ",\n         ".join(
        f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(N_HASHES)
    )
    rows_per_band = N_HASHES // N_BANDS
    bands = ",\n         ".join(
        "md5({parts}) AS b{b}".format(
            parts=" || ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band)),
            b=b,
        )
        for b in range(N_BANDS)
    )
    unpivot = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_idx, b{b} AS digest FROM banded"
        for b in range(N_BANDS)
    )
    return f"""
WITH {_SHINGLES_SQL.strip().lstrip()},
hashed AS (
  SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
  FROM shingles, unnest(range(0, {N_HASHES})) AS t(seed)
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM hashed
  GROUP BY doc_id
),
banded AS (
  SELECT doc_id,
         {bands}
  FROM sig
),
unpivoted AS (
{unpivot}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
FROM unpivoted a
JOIN unpivoted b
  ON a.band_idx = b.band_idx AND a.digest = b.digest AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
"""


DEDUP_MINHASH_SQL = _minhash_sql()


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: 64-bit SimHash fingerprints (Charikar) from token md5s.

    Each token votes ±1 on each of 64 bits (bit b = bit b%4 of hex
    nibble b//4 of md5(token)); fingerprint bit is 1 when the vote sum
    is positive. Emitted as a 64-char bitstring, deterministic in both
    engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = _tokens(docs).withColumn("h", F.md5("w"))
    bits = F.explode(F.array(*[F.lit(b) for b in range(64)])).alias("b")
    tb = tok.select("doc_id", "h", bits)
    # Pure integer ops only: DuckDB CAST(double AS INT) rounds while
    # Spark truncates, so float division here would skew bits.
    nib = "(instr('0123456789abcdef', substr(h, CAST(b div 4 AS INT) + 1, 1)) - 1)"
    bitval = F.expr(
        f"CASE b % 4 WHEN 0 THEN {nib} % 2"
        f" WHEN 1 THEN ({nib} div 2) % 2"
        f" WHEN 2 THEN ({nib} div 4) % 2"
        f" ELSE ({nib} div 8) % 2 END"
    )
    votes = (
        tb.withColumn("vote", F.when(bitval == 1, F.lit(1)).otherwise(F.lit(-1)))
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
        .withColumn("fbit", F.when(F.col("v") > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "fbit"))),
                    lambda x: x["fbit"],
                ),
                "",
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


DEDUP_SIMHASH_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w
  FROM documents
),
tokh AS (SELECT doc_id, md5(w) AS h FROM tok WHERE w <> ''),
tb AS (
  SELECT doc_id, h, unnest(range(0, 64)) AS b FROM tokh
),
votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN
           CASE b % 4
             WHEN 0 THEN (instr('0123456789abcdef', substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1) % 2
             WHEN 1 THEN ((instr('0123456789abcdef', substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1) // 2) % 2
             WHEN 2 THEN ((instr('0123456789abcdef', substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1) // 4) % 2
             ELSE ((instr('0123456789abcdef', substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1) // 8) % 2
           END = 1 THEN 1 ELSE -1 END) AS v
  FROM tb
  GROUP BY doc_id, b
)
SELECT doc_id,
       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
FROM votes
GROUP BY doc_id
ORDER BY doc_id
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: word-3-gram Jaccard similarity pairs above threshold.

    Join on distinct shingles (pair cost bounded by shingle bucket
    sizes), then |A∩B| / (|A|+|B|-|A∩B|).
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL.strip().lstrip()},
dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_inter,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""
