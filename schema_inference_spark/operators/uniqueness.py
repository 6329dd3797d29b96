"""Uniqueness / duplicate-key checks.

The scale-critical check: at 10^12 rows a hot phash (the corpus has a
34%-class hot key, mirroring the reference's hot schema) must not melt a
reducer.

Design:
  * the duplicate-key *detection* is ``groupBy(key).count()`` — Catalyst's
    partial+final hash agg combines the hot key map-side, so each upstream
    task ships exactly one (key, partial_count) row per key: a hot key
    costs one row per task, never a skewed reducer. This is why NO manual
    salting is needed for counting (salting would add a shuffle for
    something partial aggregation already fixes).
  * recovering the violating *rows* joins the (small) duplicate-key set
    back to the table. With `broadcast_keys=True` (default) that is a
    broadcast hash join: zero shuffle of the big side, hot keys irrelevant.
    If the dup-key set is too big to broadcast, the fallback shuffle join
    is protected by AQE skew-join splitting (enabled in session.py).

Reference analog: the A1 distinct-count aggregation (SeqFilesScan.java:
297-316) with the predicate inverted (count > 1 instead of all counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """DataFrame[key, dup_count] of keys appearing more than once."""
    return (
        df.where(F.col(key).isNotNull())
        .groupBy(key)
        .count()
        .where(F.col("count") > 1)
        .withColumnRenamed("count", "dup_count")
    )


def duplicate_row_violations(
    df: DataFrame,
    key: str,
    check_name: str,
    id_col: str = "image_id",
    part_col: str = "part",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Violation rows (part, check_name, image_id, detail) for duplicated keys."""
    dups = duplicate_keys(df, key)
    if broadcast_keys:
        dups = F.broadcast(dups)
    return (
        df.join(dups, key, "inner")
        .select(
            F.col(part_col).alias("part"),
            F.lit(check_name).alias("check_name"),
            F.col(id_col).alias("image_id"),
            F.to_json(F.struct(F.col(key).alias("key"), F.col("dup_count"))).alias("detail"),
        )
    )
