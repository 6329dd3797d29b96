"""Partition-at-a-time validation with resumable lineage."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df
from schema_inference_spark.plans.incremental import run_partitioned_validation


def test_partitioned_run_and_resume(spark):
    corpus = generate_image_corpus(600, n_parts=3, with_violations=False)
    images, captions = images_spark_df(spark, corpus)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ckpt"
        summaries = run_partitioned_validation(spark, images, captions, path, run_id="r1")
        assert [s["part"] for s in summaries] == [0, 1, 2]
        assert all(s["wall_sec"] > 0 and s["rows_per_sec"] > 0 for s in summaries)
        assert all(s["status"] == "validated" for s in summaries)

        lineage = spark.read.parquet(path)
        assert lineage.count() == 3
        assert lineage.where(F.col("wall_sec") <= 0).count() == 0

        # resume: nothing left to do (every part has a validated row)
        again = run_partitioned_validation(spark, images, captions, path, run_id="r2")
        assert again == []

        # partial wipe: re-run exactly the missing partition
        kept = lineage.where(F.col("part") != 1)
        kept.write.mode("overwrite").parquet(f"{d}/ckpt2")
        redo = run_partitioned_validation(spark, images, captions, f"{d}/ckpt2", run_id="r3")
        assert [s["part"] for s in redo] == [1]


def test_partitioned_resume_retries_failed_parts(spark):
    """ADVICE r1: status='failed' lineage must NOT mark a partition complete —
    the next run re-validates exactly the failed partitions."""
    corpus = generate_image_corpus(600, n_parts=3, with_violations=True)
    images, captions = images_spark_df(spark, corpus)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ckpt"
        first = run_partitioned_validation(spark, images, captions, path, run_id="r1")
        assert all(s["status"] == "failed" for s in first)  # planted violations
        # failed parts are retried (not skipped, not masked)
        again = run_partitioned_validation(spark, images, captions, path, run_id="r2")
        assert [s["part"] for s in again] == [0, 1, 2]
