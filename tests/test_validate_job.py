"""End-to-end drive of the production entry point (jobs/validate_job.py):
exit codes, resume, append-not-overwrite outputs, and the full-lineage gate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from jobs.validate_job import main
from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df


def _write_corpus(spark, d, with_violations):
    corpus = generate_image_corpus(400, n_parts=2, with_violations=with_violations)
    images, captions = images_spark_df(spark, corpus)
    images.write.mode("overwrite").parquet(f"{d}/images")
    captions.write.mode("overwrite").parquet(f"{d}/captions")


def _args(d, run_id):
    return [
        "--images", f"{d}/images",
        "--captions", f"{d}/captions",
        "--output", f"{d}/out",
        "--checkpoint", f"{d}/ckpt",
        "--run-id", run_id,
    ]


def test_clean_corpus_validates_resumes_and_appends(spark):
    with tempfile.TemporaryDirectory() as d:
        _write_corpus(spark, d, with_violations=False)
        assert main(_args(d, "r1")) == 0

        verdicts = spark.read.parquet(f"{d}/out/verdicts")
        assert {r["run_id"] for r in verdicts.select("run_id").distinct().collect()} == {"r1"}
        assert "part" in verdicts.columns  # partitioned output

        # rerun: everything validated -> nothing to do, gate still 0,
        # and prior outputs are NOT clobbered
        n_before = verdicts.count()
        assert main(_args(d, "r2")) == 0
        assert spark.read.parquet(f"{d}/out/verdicts").count() == n_before


def test_failing_corpus_gates_and_retries(spark):
    with tempfile.TemporaryDirectory() as d:
        _write_corpus(spark, d, with_violations=True)
        assert main(_args(d, "r1")) == 1

        # failed partitions retry on rerun (still failing -> still 1),
        # and the retried run APPENDS its outputs under the new run_id
        assert main(_args(d, "r2")) == 1
        runs = {
            r["run_id"]
            for r in spark.read.parquet(f"{d}/out/verdicts").select("run_id").distinct().collect()
        }
        assert runs == {"r1", "r2"}
        ckpt = spark.read.parquet(f"{d}/ckpt")
        assert ckpt.where(F.col("status") == "validated").count() == 0
