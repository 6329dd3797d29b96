"""Similarity-search queries over ``embeddings`` with index-fold cosine on
both engines (identical summation order -> exact parity after rounding)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_inference_spark.operators.similarity import (
    cosine_expr,
    cosine_sql,
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    sign_lsh_bucket_sql,
    sign_lsh_buckets,
)
from schema_inference_spark.queries import QuerySpec
from schema_inference_spark.sources.tables import load_table


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return list(row["embedding"])


def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {cosine_sql('embedding', 'qv')} AS cosine_sim
FROM embeddings, q
ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
"""


def embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, _query_vec(spark, sf_dir), k=10)


TOPK_LSH_SQL = f"""
WITH q AS (SELECT embedding AS qv, {sign_lsh_bucket_sql('embedding')} AS qb
           FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {cosine_sql('embedding', 'qv')} AS cosine_sim
FROM embeddings, q
WHERE {sign_lsh_bucket_sql('embedding')} = qb
ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
"""


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35).orderBy("id_a", "id_b")


NEAR_DUP_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {cosine_sql('a.embedding', 'b.embedding')} AS cosine_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.35
ORDER BY id_a, id_b
"""


def ann_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        sign_lsh_buckets(emb)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


BUCKET_HIST_SQL = f"""
SELECT {sign_lsh_bucket_sql('embedding')} AS bucket, count(*) AS n
FROM embeddings GROUP BY 1 ORDER BY bucket
"""


def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    self_norm = cosine_expr(F.col("embedding"), F.col("embedding"))
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias("avg_dim1"),
            F.round(F.min(F.element_at("embedding", 1).cast("double")), 6).alias("min_dim1"),
            F.min(self_norm).alias("min_self_cosine"),  # sanity: 1.0 everywhere
        )
        .orderBy("label")
    )


LABEL_STATS_SQL = f"""
SELECT label, count(*) AS n,
       round(avg(embedding[1]::DOUBLE), 6) AS avg_dim1,
       round(min(embedding[1]::DOUBLE), 6) AS min_dim1,
       min({cosine_sql('embedding', 'embedding')}) AS min_self_cosine
FROM embeddings GROUP BY label ORDER BY label
"""


SPECS = [
    QuerySpec("embedding_topk_cosine", embedding_topk_cosine, TOPK_SQL, "brute-force ANN baseline"),
    QuerySpec("embedding_topk_lsh", embedding_topk_lsh, TOPK_LSH_SQL, "LSH-bucketed ANN"),
    QuerySpec("embedding_near_dups", embedding_near_dups, NEAR_DUP_SQL, "cosine near-dup pairs"),
    QuerySpec("ann_bucket_histogram", ann_bucket_histogram, BUCKET_HIST_SQL, "LSH bucket stats"),
    QuerySpec("embedding_label_stats", embedding_label_stats, LABEL_STATS_SQL, "vector profile"),
]
