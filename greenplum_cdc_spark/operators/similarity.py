"""Embedding similarity operators (SURVEY §2 C5-C7).

Cosine math is written so Spark and DuckDB produce bit-identical
doubles: every term is float32→double (exact), products are doubles
(exact per IEEE), and the 64-term accumulation is strictly
left-associative in BOTH engines (Spark's `aggregate` left-fold; an
explicit left-assoc `+` chain in the oracle SQL). No rounding fudge
needed.

Scale design:
- brute-force top-k broadcasts the (small) query set and streams the
  corpus once — the right baseline at any scale when |queries| is small;
- all-pairs near-dup is the sf-small oracle baseline; the 100 TB path is
  the sign-LSH bucketing (knn_lsh): 8 md5-derived hyperplanes bucket
  vectors so candidate generation is an equi-join on the 8-bit
  signature, linear in corpus size;
- everything stays in whole-stage codegen via higher-order array
  functions — no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table

DIM = 64
N_PLANES = 8
NEARDUP_COS = 0.5
TOPK = 5
N_QUERIES = 20


def _dot(a: str, b: str):
    """Strict left-fold dot product over float arrays, double math."""
    prod = F.zip_with(
        F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _dot_sql(a: str, b: str) -> str:
    """The DuckDB twin: explicit left-assoc chain (same fold order)."""
    terms = [
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, DIM + 1)
    ]
    return "(0.0 + " + " + ".join(terms) + ")"


def _with_norm(vecs: DataFrame) -> DataFrame:
    return vecs.withColumn("norm", F.sqrt(_dot("embedding", "embedding")))


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: embedding-cosine near-duplicate pairs (all-pairs baseline)."""
    vecs = _with_norm(load_table(spark, sf_dir, "embeddings"))
    a = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= NEARDUP_COS)
        .select("vec_a", "vec_b", "cos_sim")
        .orderBy("vec_a", "vec_b")
    )


DEDUP_EMBEDDING_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_dot_sql('a.embedding', 'b.embedding')} / (a.norm * b.norm) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_dot_sql('a.embedding', 'b.embedding')} / (a.norm * b.norm) >= {NEARDUP_COS}
ORDER BY vec_a, vec_b
"""


def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: brute-force cosine top-k — broadcast queries, one corpus scan."""
    vecs = _with_norm(load_table(spark, sf_dir, "embeddings"))
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
    )
    pairs = vecs.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    cos = _dot("qe", "embedding") / (F.col("qn") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos_sim")
        .orderBy("query_id", "rank")
    )


KNN_BRUTEFORCE_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, norm AS qn FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_dot_sql('q.qe', 'v.embedding')} / (q.qn * v.norm) AS cos_sim
  FROM v JOIN q ON v.vec_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim
FROM ranked WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""


def _plane_weight_sql(p: str, d: int) -> str:
    """Deterministic pseudo-random hyperplane weight from md5 — identical
    construction in both engines (ascii of the first two hex chars)."""
    h = f"md5(CAST({p} AS STRING) || ':' || '{d}')"  # STRING parses in both engines
    return f"(ascii(substr({h}, 1, 1)) * 257 + ascii(substr({h}, 2, 1)) - 20432)"


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: sign-LSH bucketing (random-hyperplane) — the ANN scale path.

    Each vector gets an 8-bit signature (sign of dot with 8 md5-derived
    hyperplanes); near neighbors land in the same bucket with high
    probability, so candidate search is an equi-join on the signature.
    Output: per-vector bucket + occupancy (the candidate-set size).
    """
    vecs = load_table(spark, sf_dir, "embeddings")
    planes = F.explode(F.array(*[F.lit(p) for p in range(N_PLANES)])).alias("p")
    vp = vecs.select("vec_id", "embedding", planes)
    dot_terms = " + ".join(
        f"({_plane_weight_sql('p', d)}) * CAST(embedding[{d - 1}] AS DOUBLE)"
        for d in range(1, DIM + 1)
    )
    vp = vp.withColumn("dot", F.expr(f"0.0 + {dot_terms}"))
    sig = (
        vp.withColumn("bit", F.when(F.col("dot") > 0, F.lit("1")).otherwise(F.lit("0")))
        .groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "bit"))),
                    lambda x: x["bit"],
                ),
                "",
            ).alias("bucket")
        )
    )
    w = Window.partitionBy("bucket")
    return (
        sig.withColumn("n_in_bucket", F.count("*").over(w))
        .select("vec_id", "bucket", "n_in_bucket")
        .orderBy("vec_id")
    )


def _knn_lsh_sql() -> str:
    dot_terms = " + ".join(
        f"({_plane_weight_sql('p', d)}) * CAST(embedding[{d}] AS DOUBLE)"
        for d in range(1, DIM + 1)
    )
    return f"""
WITH vp AS (
  SELECT vec_id, embedding, unnest(range(0, {N_PLANES})) AS p
  FROM embeddings
),
dots AS (
  SELECT vec_id, p, 0.0 + {dot_terms} AS dot
  FROM vp
),
sig AS (
  SELECT vec_id,
         string_agg(CASE WHEN dot > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM dots
  GROUP BY vec_id
)
SELECT vec_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS n_in_bucket
FROM sig
ORDER BY vec_id
"""


KNN_LSH_SQL = _knn_lsh_sql()
