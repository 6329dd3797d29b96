"""Reference-profile snapshot lifecycle: MERGE-style upsert.

The drift baseline (FIXTURES.md §3) is a persisted profile table keyed by
(snapshot_id, part). The upsert is sources/iceberg.merge_upsert — a real
``MERGE INTO`` when the Iceberg runtime is present, the idiomatic anti-join
+ union + safe-rewrite emulation otherwise. Snapshot time travel maps to
the explicit snapshot_id column (SCALE.md §Iceberg).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_inference_spark.sources.iceberg import merge_upsert


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
    return merge_upsert(spark, path, tagged, key_cols)


def load_snapshot(spark: SparkSession, path: str, snapshot_id: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    df = spark.read.parquet(path).where(F.col("snapshot_id") == snapshot_id)
    return df.drop("snapshot_id")
