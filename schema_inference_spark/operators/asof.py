"""As-of (time-travel) join — a training-pipeline staple Spark lacks natively.

Strategy (pure DataFrame, no per-group pandas): tag both sides, union by
name, sort within a single window per key by (ts, side-priority), and carry
the last seen right-side payload forward with ``last(ignorenulls=True)``.
One shuffle on the join key; no skew beyond the key's own distribution —
the same plan DuckDB executes for ``ASOF JOIN`` (its oracle here).

For the rare case where the right side is huge and dense while the left is
sparse, the alternative is bucketized range-join + filter; this union-window
form is the general-purpose default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (right.ts <= left.ts)
    per key. Left rows with no prior right row get nulls."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(key, ts, *right_value_cols).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_value_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(r_tag.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    # right rows sort BEFORE left rows at equal ts (side 0 < 1): ties are
    # inclusive, matching ASOF JOIN's <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(f"{c}{suffix}")
        for c in right_value_cols
    ]
    return (
        unioned.select("*", *carried)
        .where(F.col("_side") == 1)
        .drop("_side", *right_value_cols)
    )
