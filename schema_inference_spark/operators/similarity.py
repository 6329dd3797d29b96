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


def ivf_assignments(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its max-cosine centroid.

    ``centroids`` is a small driver-side list (k-means output in production;
    any deterministic seed set works for the index structure) baked into the
    plan as literals — the assignment pass is a single projection, no join,
    no shuffle. At scale the assignment becomes the table's cluster/partition
    key, so a query probes 1/k of the data (see ``cosine_topk_ivf``).
    """
    # sims materialized as ONE array column: a chained when()-argmax would
    # nest each (interpreted) cosine fold exponentially many times.
    # array_position of the max = FIRST max index = lowest centroid id on
    # ties (centroids are cid-ordered) — same tie semantics as a strict >.
    sims = F.array(
        *[cosine_expr(F.col(vec_col), query_vector_literal(vec), decimals=9) for _, vec in centroids]
    )
    cids = F.array(*[F.lit(cid) for cid, _ in centroids])
    with_sims = df.withColumn("_sims", sims)
    pos = F.array_position(F.col("_sims"), F.array_max(F.col("_sims")))
    return with_sims.withColumn("centroid_id", F.element_at(cids, pos.cast("int"))).drop("_sims")


def ivf_assignment_sql(
    centroids: list[tuple[int, list[float]]], vec: str = "embedding"
) -> str:
    """DuckDB expression computing the identical argmax-centroid assignment."""

    def lit(v: list[float]) -> str:
        return "[" + ", ".join(f"{x!r}::DOUBLE" for x in v) + "]"

    best_id, best_sim = str(centroids[0][0]), cosine_sql(vec, lit(centroids[0][1]), 9)
    for cid, cvec in centroids[1:]:
        s = cosine_sql(vec, lit(cvec), 9)
        best_id = f"(CASE WHEN {s} > {best_sim} THEN {cid} ELSE {best_id} END)"
        best_sim = f"(CASE WHEN {s} > {best_sim} THEN {s} ELSE {best_sim} END)"
    return best_id


def cosine_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing the ``n_probe`` centroids closest to the query."""
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    probe = sorted(centroids, key=lambda c: -cos(query_vec, c[1]))[:n_probe]
    probe_ids = [cid for cid, _ in probe]
    assigned = ivf_assignments(df, centroids, id_col, vec_col)
    return cosine_topk(
        assigned.where(F.col("centroid_id").isin(probe_ids)), query_vec, k, id_col, vec_col
    )


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
