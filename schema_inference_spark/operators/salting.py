"""Hot-key-safe bounded exemplar gathering (k smallest distinct values).

Plain counts never need special handling (partial aggregation combines hot
keys map-side — see operators/uniqueness.py). Exemplar gathering is the
operator where naive ``collect_set`` per key is dangerous: per-group state
grows with the number of DISTINCT values, and a 34%-hot key funnels a third
of the table into one aggregation buffer.

Round 1 salted the collect_set into ``n_salts`` sub-groups, but each
sub-group's set was still unbounded (ADVICE r1). This version has NO
unbounded aggregation state at all:

  1. ``groupBy(key, value)`` — fully REDUCIBLE (count), so map-side partial
     aggregation absorbs hot keys and the shuffle carries one row per
     distinct (key, value);
  2. ranked window ``row_number() over (partition by key order by value)``
     filtered to ``rn <= k`` — Spark's window operator sort-spills to disk,
     so even a key with millions of distinct values is memory-safe;
  3. one final ``groupBy(key)`` whose ``collect_list`` stores only the rows
     the rank filter marked (nulls are skipped) — state bounded at k per
     key, and NULL keys / NULL exemplar values keep their groups (no join
     on the key, which would drop null==null).

Output is deterministic (the globally smallest k distinct non-null values)
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_exemplars(
    df: DataFrame,
    key: str,
    exemplar_col: str,
    k: int = 5,
    n_salts: int = 16,  # kept for API compat; the reducible form needs no salt
) -> DataFrame:
    """DataFrame[key, n_rows, exemplars array] with at most k exemplars per
    key (the k smallest DISTINCT values — deterministic), hot-key safe with
    bounded aggregation state (see module docstring)."""
    del n_salts
    base = df.select(key, F.col(exemplar_col).alias("_ex"))
    per_value = base.groupBy(key, "_ex").agg(F.count(F.lit(1)).alias("_n"))
    # nulls_last so null exemplar values never consume top-k slots; ONE final
    # groupBy (not counts-join-exemplars) so a NULL key keeps its group —
    # null==null is not a join match (ADVICE r2)
    w = Window.partitionBy(key).orderBy(F.asc_nulls_last("_ex"))
    ranked = per_value.withColumn("_rn", F.row_number().over(w))
    keep = F.when((F.col("_rn") <= k) & F.col("_ex").isNotNull(), F.col("_ex"))
    return ranked.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        F.sort_array(F.collect_list(keep)).alias("exemplars"),  # collect_list skips nulls
    )
