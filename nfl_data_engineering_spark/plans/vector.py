"""Vector-similarity query catalog (LLM-pipeline extension).

Brute-force cosine top-k is the correctness baseline; IVF (label-cell
partitioned) is the scale path — it prunes the scan to the probed cell.
Determinism: dot products run in double on both engines; centroids go
through exact decimal sums + round(6) so Spark's partial-aggregation order
can't leak into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.similarity import brute_force_topk, cosine
from .base import QueryDef, load

TOPK = 5
N_QUERIES = 10          # vec_id < 10 are the query vectors
COSINE_PAIR_THRESHOLD = 0.45

SQL_COS = ("list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
           " / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
           " * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))")


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query set, linear corpus scan,
    per-query rank window with (score desc, vec_id) tie-break."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = brute_force_topk(emb, queries, k=TOPK)
    return out.select("q_id", "vec_id", "rank", F.round("score", 6).alias("score"))


ORACLE_EMBEDDING_TOPK = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.q_id, e.vec_id,
         {SQL_COS.format(a='e.embedding', b='q.q_vec')} AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.q_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM s)
SELECT q_id, vec_id, rank, ROUND(score, 6) AS score FROM r WHERE rank <= {TOPK}
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: label cells as the coarse quantizer. Centroid = per-dim
    exact-decimal mean rounded to 6 (deterministic across engines AND across
    Spark partitionings); each query probes its best cell only (nprobe=1),
    ranks within the cell. At 100 TB the corpus is bucketed by cell, so a
    probe reads one bucket, not the table."""
    emb = load(spark, sf_dir, "embeddings").cache()
    cents = (emb.select("label", F.posexplode("embedding").alias("d", "v"))
             .groupBy("label", "d")
             .agg(F.round(F.sum(F.col("v").cast("double").cast("decimal(18,8)"))
                          .cast("double") / F.count("*"), 6).alias("c"))
             .groupBy("label")
             .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
             .select(F.col("label").alias("cell"),
                     F.col("dc.c").alias("centroid")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    routed_scores = queries.crossJoin(F.broadcast(cents)).select(
        "q_id", "q_vec", "cell",
        cosine(F.col("q_vec"), F.col("centroid")).alias("cscore"))
    wq = Window.partitionBy("q_id").orderBy(F.col("cscore").desc(), F.col("cell"))
    routed = (routed_scores.withColumn("crank", F.row_number().over(wq))
              .filter(F.col("crank") == 1).select("q_id", "q_vec", "cell"))
    pairs = load(spark, sf_dir, "embeddings").join(
        F.broadcast(routed),
        (F.col("label") == F.col("cell")) & (F.col("vec_id") != F.col("q_id")))
    scored = pairs.select(
        "q_id", "vec_id", "cell",
        cosine(F.col("embedding"), F.col("q_vec")).alias("score"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOPK)
            .select("q_id", "cell", "vec_id", "rank",
                    F.round("score", 6).alias("score")))


ORACLE_ANN_IVF = f"""
WITH u AS (
  SELECT label, vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings),
cent AS (
  SELECT label AS cell, d,
         ROUND(CAST(SUM(CAST(v::DOUBLE AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM u GROUP BY label, d),
cvec AS (SELECT cell, list(c ORDER BY d) AS centroid FROM cent GROUP BY cell),
q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < {N_QUERIES}),
routed AS (
  SELECT q_id, q_vec, cell,
         row_number() OVER (PARTITION BY q_id ORDER BY
           {SQL_COS.format(a='q_vec', b='centroid')} DESC, cell) AS crank
  FROM q CROSS JOIN cvec),
probe AS (SELECT q_id, q_vec, cell FROM routed WHERE crank = 1),
scored AS (
  SELECT p.q_id, p.cell, e.vec_id,
         {SQL_COS.format(a='e.embedding', b='p.q_vec')} AS score
  FROM probe p JOIN embeddings e ON e.label = p.cell AND e.vec_id != p.q_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank FROM scored)
SELECT q_id, cell, vec_id, rank, ROUND(score, 6) AS score FROM r WHERE rank <= {TOPK}
"""


def q_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= {thr}). All-pairs at testdata
    scale; at 100 TB route through IVF cells / LSH buckets first (the
    candidate-generation pattern of q_dedup_minhash_lsh)."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"))
    b = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"))
    pairs = a.join(b, F.col("v1") < F.col("v2"))
    score = cosine(F.col("e1"), F.col("e2"))
    return (pairs.select("v1", "v2", score.alias("score"))
            .filter(F.col("score") >= COSINE_PAIR_THRESHOLD)
            .select("v1", "v2", F.round("score", 6).alias("cosine")))


ORACLE_COSINE_NEARDUP = f"""
SELECT a.vec_id AS v1, b.vec_id AS v2,
       ROUND({SQL_COS.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {SQL_COS.format(a='a.embedding', b='b.embedding')} >= {COSINE_PAIR_THRESHOLD}
"""


VECTOR_QUERIES = [
    QueryDef("embedding_topk", q_embedding_topk, ORACLE_EMBEDDING_TOPK, "LLM-sim-bruteforce", bench=True),
    QueryDef("ann_ivf_topk", q_ann_ivf_topk, ORACLE_ANN_IVF, "LLM-sim-ivf"),
    QueryDef("cosine_neardup_pairs", q_cosine_neardup_pairs, ORACLE_COSINE_NEARDUP, "LLM-dedup-cosine"),
]
