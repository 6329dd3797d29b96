"""Reference-profile snapshot lifecycle: MERGE-style upsert without Delta.

The drift baseline (FIXTURES.md §3) is a persisted profile table keyed by
(snapshot_id, part). Without Delta/Iceberg MERGE INTO in this sandbox, the
upsert is emulated the idiomatic Spark way (anti-join + union + rewrite):
rows of the target whose key appears in the source are replaced, others
kept. On Iceberg this function body becomes a single ``MERGE INTO``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_snapshot(
    spark: SparkSession,
    path: str,
    new_profile: DataFrame,
    snapshot_id: str,
    key_cols: tuple[str, ...] = ("snapshot_id", "part"),
) -> DataFrame:
    """Upsert ``new_profile`` (tagged with snapshot_id) into the snapshot
    table at ``path``; returns the resulting table."""
    tagged = new_profile.withColumn("snapshot_id", F.lit(snapshot_id))
    if os.path.exists(path):
        current = spark.read.parquet(path)
        keys = tagged.select(*key_cols).distinct()
        kept = current.join(F.broadcast(keys), list(key_cols), "left_anti")
        merged = kept.unionByName(tagged, allowMissingColumns=True)
    else:
        merged = tagged
    # rewrite via a temp dir: parquet cannot be overwritten in place while read
    tmp = f"{path}.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def load_snapshot(spark: SparkSession, path: str, snapshot_id: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    df = spark.read.parquet(path).where(F.col("snapshot_id") == snapshot_id)
    return df.drop("snapshot_id")
