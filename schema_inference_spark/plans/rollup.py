"""Incremental materialized rollup maintenance (continuous-aggregate style).

A 100 TB event stream is consumed through PRE-AGGREGATED rollup tables
(hourly counts/sums per key), refreshed incrementally as new partitions
land — recomputing the whole aggregate per batch is the anti-pattern this
module replaces. The pattern (TimescaleDB continuous aggregates / Druid
rollups, re-expressed Spark-first):

1. aggregate ONLY the delta (one partial+final hash agg over new rows);
2. MERGE the delta aggregate into the stored rollup by adding counts/sums
   per bucket key — a full-outer union-agg keyed by bucket, touching only
   the stored buckets (tiny: hours x event types), never the raw history;
3. rewrite via sources/iceberg.replace_table (``createOrReplace`` on
   Iceberg, the safe-tmp parquet protocol otherwise).

Because count/sum are commutative monoids, refresh(delta1) then
refresh(delta2) equals one refresh(delta1 ∪ delta2) equals a full
recompute — asserted in tests. (avg and friends derive from sum/count at
read time; non-decomposable stats belong in the profile pass, not a
rollup.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ("hour_epoch", "event_type")


def hourly_delta_aggregate(events: DataFrame) -> DataFrame:
    """Aggregate a delta of raw events to the rollup grain."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
                "hour_epoch"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # stored as DECIMAL: decimal addition is associative, so
            # incremental merges are EXACTLY equal to a full recompute
            # (double sums would drift by merge order); cast to double only
            # at read time (read_rollup)
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(28,2)").alias("sum_value"),
        )
    )


def refresh_hourly_rollup(
    spark: SparkSession, path: str, events_delta: DataFrame
) -> DataFrame:
    """Merge the delta's hourly aggregate into the stored rollup table."""
    delta = hourly_delta_aggregate(events_delta)
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = (
            current.unionByName(delta)
            .groupBy(*ROLLUP_KEYS)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").cast("decimal(28,2)").alias("sum_value"),
            )
        )
    else:
        merged = delta
    from schema_inference_spark.sources.iceberg import replace_table

    return replace_table(spark, merged, path)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Consumer view: hash-stable output types (the round-1 lesson)."""
    return spark.read.parquet(path).select(
        "hour_epoch",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )
