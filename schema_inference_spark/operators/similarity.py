"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force scan: one projection computing the cosine
  against a (broadcast-literal) query vector + TakeOrderedAndProject. The
  correctness baseline; O(n·d) with zero shuffle.
* ``sign_lsh_buckets`` / ``cosine_topk_lsh`` — random-hyperplane-style LSH
  using coordinate-sign bits as the hash (deterministic and SQL-parity-
  friendly; swap ``_bucket_expr`` for md5-seeded hyperplane dots for true
  SRP-LSH). The scale path: candidates come from the query's bucket only.
* ``embedding_near_dup_pairs`` — all-pairs cosine within a blocking key
  (label/bucket), the embedding analog of LSH-verified dedup.

The fold order of every dot product is the array order in BOTH engines
(index-fold, not hash-agg), so Spark and DuckDB sums agree bit-for-bit
before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.transform(
        F.sequence(F.lit(1), F.size(a)),
        lambda i: F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_expr(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE), 'sum')"
    )


def cosine_sql(a: str, b: str, decimals: int = 6) -> str:
    return (
        f"round({dot_sql(a, b)} / "
        f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})), {decimals})"
    )


def query_vector_literal(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine similarity to the query vector."""
    q = query_vector_literal(query_vec)
    return (
        df.select(id_col, cosine_expr(F.col(vec_col), q).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def sign_lsh_bucket_expr(vec_col: Column, dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41)) -> Column:
    """LSH bucket id from the sign bits of fixed coordinates (1-indexed)."""
    acc = F.lit(0)
    for j, d in enumerate(dims):
        acc = acc + F.when(F.element_at(vec_col, d) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def sign_lsh_bucket_sql(vec: str, dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41)) -> str:
    terms = " + ".join(
        f"(CASE WHEN ({vec})[{d}] >= 0 THEN {1 << j} ELSE 0 END)" for j, d in enumerate(dims)
    )
    return f"({terms})"


def sign_lsh_buckets(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", sign_lsh_bucket_expr(F.col(vec_col)))


def cosine_topk_lsh(
    df: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: brute-force restricted to the query's LSH bucket.

    At scale the bucket column is a partition/cluster key, so the scan
    prunes to ~1/2^bits of the data before any distance math."""
    q_bucket = 0
    for j, d in enumerate((1, 9, 17, 25, 33, 41)):
        if query_vec[d - 1] >= 0:
            q_bucket |= 1 << j
    bucketed = sign_lsh_buckets(df, vec_col).where(F.col("bucket") == q_bucket)
    return cosine_topk(bucketed, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs (id_a < id_b) within a blocking key with cosine >= threshold."""
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
