"""Explicit key-salting for hot-key-safe NON-reducible aggregations.

Plain counts never need salting (partial aggregation combines hot keys
map-side — see operators/uniqueness.py). Salting earns its keep when the
per-key state does NOT reduce: collect_list / collect_set exemplar
gathering, where a 34%-hot phash would funnel a third of the table into one
task. Two phases:

  1. groupBy(key, salt = pmod(hash(id), n_salts)) — hot key splits into
     n_salts bounded groups; per-group state capped by ``per_salt_cap``;
  2. groupBy(key) over the n_salts partial lists — tiny second shuffle.

The cap makes the operator's output (k exemplars per key) deterministic:
each phase keeps the sorted-first elements, so the final slice equals the
global sorted-first-k regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_exemplars(
    df: DataFrame,
    key: str,
    exemplar_col: str,
    k: int = 5,
    n_salts: int = 16,
) -> DataFrame:
    """DataFrame[key, n_rows, exemplars array] with at most k exemplars per
    key (the k smallest DISTINCT values — deterministic), hot-key safe."""
    salt = F.pmod(F.xxhash64(F.col(exemplar_col)), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(key, F.col(exemplar_col).alias("_ex"), salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.slice(F.array_sort(F.collect_set("_ex")), 1, k).alias("_partial"),
        )
    )
    return (
        phase1.groupBy(key)
        .agg(
            F.sum("_n").alias("n_rows"),
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial")))), 1, k
            ).alias("exemplars"),
        )
    )
