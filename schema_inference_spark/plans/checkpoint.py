"""Checkpoint / resume: per-partition lineage + metrics.

North-rule requirement: "resumable from an Iceberg checkpoint table
carrying per-partition lineage + metrics ... re-runs skip validated
partitions". The sandbox has no Iceberg jars, so the checkpoint is a
parquet table with the identical relational contract (append-only rows
keyed by (run_id, part)); the write routes through
sources/iceberg.append_table, which becomes
``df.writeTo(catalog.table).append()`` when the runtime is present.

Resume is an ANTI JOIN of the input against completed partitions — the
same pattern the reference hints at by re-reading its persisted profile
(SeqScanAsJson.java:66-77), made first-class. The completed-parts set is
tiny (one row per partition), so the anti join broadcasts and prunes
before any heavy work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = (
    "part int, status string, run_id string, n_rows long, n_violations long, "
    "n_checks_failed int, wall_sec double"
)


def write_checkpoint(
    verdicts: DataFrame, path: str, run_id: str, wall_sec: float = 0.0
) -> DataFrame:
    """Aggregate verdicts to one lineage row per partition and append.
    ``wall_sec`` records the partition's validation wall time (metrics per
    north_rule lineage)."""
    ckpt = (
        verdicts.groupBy("part")
        .agg(
            F.when(F.sum(F.when(F.col("passed"), 0).otherwise(1)) == 0, F.lit("validated"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            F.max("n_rows").alias("n_rows"),
            F.sum("n_violations").alias("n_violations"),
            F.sum(F.when(F.col("passed"), 0).otherwise(1)).cast("int").alias("n_checks_failed"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_sec", F.lit(float(wall_sec)))
    )
    from schema_inference_spark.sources.iceberg import append_table

    append_table(ckpt, path)
    return ckpt


def completed_parts(spark: SparkSession, path: str) -> DataFrame | None:
    """Partitions with a ``status='validated'`` checkpoint row in ANY run.
    None if no checkpoint exists yet.

    Filtering on status (ADVICE r1) is what makes resume retry-correct: a
    partition whose only lineage rows say 'failed' is NOT complete and must
    be re-validated on the next run."""
    if not os.path.exists(path):
        return None
    return (
        spark.read.parquet(path)
        .where(F.col("status") == "validated")
        .select("part")
        .distinct()
    )


def unvalidated_parts(spark: SparkSession, path: str) -> DataFrame | None:
    """Partitions that appear in the checkpoint but have NO 'validated' row
    in any run — the set that must gate an orchestrator's exit code."""
    if not os.path.exists(path):
        return None
    ckpt = spark.read.parquet(path)
    done = ckpt.where(F.col("status") == "validated").select("part").distinct()
    return ckpt.select("part").distinct().join(done, "part", "left_anti")


def filter_for_resume(
    spark: SparkSession, df: DataFrame, path: str, part_col: str = "part"
) -> DataFrame:
    """Drop partitions already validated (broadcast anti join); failed
    partitions fall through and re-run."""
    done = completed_parts(spark, path)
    if done is None:
        return df
    return df.join(F.broadcast(done.withColumnRenamed("part", part_col)), part_col, "left_anti")
