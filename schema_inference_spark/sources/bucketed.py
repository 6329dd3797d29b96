"""Bucketed (co-located) table layout — the shuffle-free join path.

SCALE.md's layout plan: images and captions bucketed by ``image_id`` with
the same bucket count, so the referential / caption-equality joins read
matching buckets directly instead of exchanging 100 TB. This module makes
that concrete with Spark's native bucketing (``bucketBy().sortBy()``
+ ``saveAsTable`` — the open-source equivalent of the Iceberg
``bucket(N, image_id)`` partition transform named in the north rule).

Plan property (asserted in tests/test_plan_shapes.py): joining two tables
bucketed by the join key with equal bucket counts produces a SortMergeJoin
with NO Exchange on either side — the only reads are bucket-aligned scans.
At 10^12 rows that removes the single largest shuffle in the suite.

The bucket count is a layout-time decision: pick ``n_buckets`` so one
bucket of the FACT table fits an executor's scan budget (e.g. 100 TB /
4096 buckets ≈ 25 GB per bucket, split further by row groups). Dimension
tables reuse the same count to stay co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted managed table (parquet)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With equal bucket
    counts Spark plans a zero-exchange SortMergeJoin; otherwise it degrades
    gracefully to a shuffled join (still correct)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
