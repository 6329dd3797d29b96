"""Drift (KS/PSI) and checkpoint/resume semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df
from schema_inference_spark.operators.drift import drift_scores, drift_verdicts
from schema_inference_spark.operators.profile import profile_images
from schema_inference_spark.plans.checkpoint import (
    completed_parts,
    filter_for_resume,
    write_checkpoint,
)
from schema_inference_spark.plans.validation import run_validation


def _profiles(spark, scale):
    corpus = generate_image_corpus(600, n_parts=2, with_violations=False, drift_scale=scale)
    images, _ = images_spark_df(spark, corpus)
    return profile_images(images)


def test_identical_distribution_no_drift(spark):
    cur, snap = _profiles(spark, 1.0), _profiles(spark, 1.0)
    rows = drift_verdicts(cur, snap).collect()
    assert rows and all(r["passed"] for r in rows)
    scores = drift_scores(cur, snap).collect()
    assert all(abs(r["psi"]) < 1e-9 and r["ks"] < 1e-9 for r in scores)


def test_shifted_distribution_trips_drift(spark):
    cur, snap = _profiles(spark, 1.75), _profiles(spark, 1.0)
    rows = drift_verdicts(cur, snap).collect()
    by_check = {(r["part"], r["check_name"]): r for r in rows}
    # w/h distributions shifted by 1.75x must fail in every partition
    for part in (0, 1):
        assert not by_check[(part, "drift_w_hist")]["passed"]
        assert not by_check[(part, "drift_h_hist")]["passed"]
        # phash buckets are md5-uniform in both corpora -> must not trip
        assert by_check[(part, "drift_phash_hist")]["passed"]


def test_checkpoint_resume_skips_validated_parts(spark):
    corpus = generate_image_corpus(800, n_parts=4)
    images, captions = images_spark_df(spark, corpus)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ckpt"
        assert completed_parts(spark, path) is None
        assert filter_for_resume(spark, images, path).count() == images.count()

        # validate only parts 0/1 in "run-1", checkpoint them
        first = images.where(F.col("part") < 2)
        res = run_validation(spark, first, captions.where(F.col("part") < 2))
        ckpt = write_checkpoint(res.verdicts, path, "run-1").collect()
        assert {r["part"] for r in ckpt} == {0, 1}
        assert all(r["status"] == "failed" for r in ckpt)  # planted violations

        # resume: only parts 2/3 remain
        remaining = filter_for_resume(spark, images, path)
        assert {r["part"] for r in remaining.select("part").distinct().collect()} == {2, 3}

        # second run checkpoints the rest; nothing remains afterwards
        res2 = run_validation(
            spark, remaining, filter_for_resume(spark, captions, path)
        )
        write_checkpoint(res2.verdicts, path, "run-2")
        assert filter_for_resume(spark, images, path).count() == 0

        # lineage metrics present for all 4 parts
        all_ckpt = spark.read.parquet(path)
        assert all_ckpt.count() == 4
        assert all_ckpt.where(F.col("n_rows") <= 0).count() == 0


def test_clean_partition_checkpointed_as_validated(spark):
    corpus = generate_image_corpus(300, n_parts=2, with_violations=False)
    images, captions = images_spark_df(spark, corpus)
    with tempfile.TemporaryDirectory() as d:
        res = run_validation(spark, images, captions)
        ckpt = write_checkpoint(res.verdicts, f"{d}/ckpt", "run-1").collect()
        assert all(r["status"] == "validated" for r in ckpt)
        assert all(r["n_violations"] == 0 for r in ckpt)
