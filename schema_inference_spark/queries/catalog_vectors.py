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
    srp_band_bucket_sqls,
    srp_bucket_sql,
    srp_buckets,
    srp_hyperplanes,
)

_SRP_SQL = srp_bucket_sql("embedding", srp_hyperplanes())
_SRP_BAND_SQLS = srp_band_bucket_sqls("embedding")
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


# multi-band probe (r4): candidate iff the row shares the query's bucket
# in >= 1 band — the OR mirrors cosine_topk_lsh's banded filter exactly
_Q_BANDS = ", ".join(f"{s} AS qb{i}" for i, s in enumerate(_SRP_BAND_SQLS))
_BAND_MATCH = " OR ".join(f"({s}) = qb{i}" for i, s in enumerate(_SRP_BAND_SQLS))

TOPK_LSH_SQL = f"""
WITH q AS (SELECT embedding AS qv, {_Q_BANDS}
           FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {cosine_sql('embedding', 'qv')} AS cosine_sim
FROM embeddings, q
WHERE {_BAND_MATCH}
ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
"""


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # block='label' is the oracle/test variant; the scale default (SRP
    # blocking) is driver-checked as embedding_near_dups_lsh in catalog_extra
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35, block="label").orderBy(
        "id_a", "id_b"
    )


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
        srp_buckets(emb)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


BUCKET_HIST_SQL = f"""
SELECT {_SRP_SQL} AS bucket, count(*) AS n
FROM embeddings GROUP BY 1 ORDER BY bucket
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long format (label, pos, centroid) — one
    k-means assignment-step aggregation via posexplode (codegen'd, partial
    aggregation; the IVF 'training' path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid"))
        .where(F.col("pos") < 4)  # first dims are enough for the oracle check
        .orderBy("label", "pos")
    )


CENTROIDS_SQL = """
SELECT label, pos::INT AS pos, round(avg(val), 6) AS centroid
FROM (
  SELECT label, unnest(embedding)::DOUBLE AS val,
         generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings
)
WHERE pos < 4
GROUP BY label, pos ORDER BY label, pos
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


def _centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in sorted(rows, key=lambda r: r["vec_id"])]


def embedding_ivf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.operators.similarity import ivf_assignments

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        ivf_assignments(emb, _centroids(spark, sf_dir))
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("centroid_id")
    )


_IVF_BASE = f"""
c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
sims AS (SELECT e.vec_id, c.cid, {cosine_sql('e.embedding', 'c.cvec', None)} AS s
         FROM embeddings e CROSS JOIN c),
best AS (SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
         FROM sims)
"""

IVF_HIST_SQL = f"""
WITH {_IVF_BASE}
SELECT cid::INT AS centroid_id, count(*) AS n FROM best WHERE rn = 1
GROUP BY 1 ORDER BY centroid_id
"""


def embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.operators.similarity import cosine_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        emb, _query_vec(spark, sf_dir), _centroids(spark, sf_dir), k=10, n_probe=2
    ).select("vec_id", "cosine_sim")


IVF_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
{_IVF_BASE},
probe AS (SELECT cid FROM c, q ORDER BY {cosine_sql('cvec', 'qv', None)} DESC, cid ASC LIMIT 2),
cand AS (SELECT vec_id FROM best WHERE rn = 1 AND cid IN (SELECT cid FROM probe))
SELECT e.vec_id, {cosine_sql('e.embedding', 'qv', 6)} AS cosine_sim
FROM embeddings e JOIN cand USING (vec_id), q
ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
"""


SPECS = [
    QuerySpec("embedding_topk_cosine", embedding_topk_cosine, TOPK_SQL, "brute-force ANN baseline"),
    QuerySpec("embedding_ivf_histogram", embedding_ivf_histogram, IVF_HIST_SQL, "IVF coarse quantization"),
    QuerySpec("embedding_topk_ivf", embedding_topk_ivf, IVF_TOPK_SQL, "IVF n_probe ANN"),
    QuerySpec("embedding_topk_lsh", embedding_topk_lsh, TOPK_LSH_SQL, "LSH-bucketed ANN"),
    QuerySpec("embedding_near_dups", embedding_near_dups, NEAR_DUP_SQL, "cosine near-dup pairs"),
    QuerySpec("ann_bucket_histogram", ann_bucket_histogram, BUCKET_HIST_SQL, "LSH bucket stats"),
    QuerySpec("embedding_label_stats", embedding_label_stats, LABEL_STATS_SQL, "vector profile"),
    QuerySpec("embedding_label_centroids", embedding_label_centroids, CENTROIDS_SQL,
              "k-means assignment-step centroids"),
]
