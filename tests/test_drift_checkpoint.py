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
    """Resume semantics (ADVICE r1): only status='validated' partitions are
    skipped; failed partitions retry; the gate derives from the full
    lineage table."""
    from schema_inference_spark.plans.checkpoint import unvalidated_parts

    corpus = generate_image_corpus(800, n_parts=4, with_violations=False)
    images, captions = images_spark_df(spark, corpus)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ckpt"
        assert completed_parts(spark, path) is None
        assert filter_for_resume(spark, images, path).count() == images.count()

        # validate only parts 0/1 in "run-1" (clean corpus -> validated)
        first = images.where(F.col("part") < 2)
        res = run_validation(spark, first, captions.where(F.col("part") < 2))
        ckpt = write_checkpoint(res.verdicts, path, "run-1").collect()
        assert {r["part"] for r in ckpt} == {0, 1}
        assert all(r["status"] == "validated" for r in ckpt)

        # a FAILED attempt on part 2 must NOT mark it complete
        fake_failed = spark.createDataFrame(
            [(2, False, 100, 5)], "part int, passed boolean, n_rows long, n_violations long"
        )
        write_checkpoint(fake_failed, path, "run-1-failed")

        # resume: parts 2 (failed -> retry) and 3 (never run) remain
        remaining = filter_for_resume(spark, images, path)
        assert {r["part"] for r in remaining.select("part").distinct().collect()} == {2, 3}
        bad = unvalidated_parts(spark, path)
        assert {r["part"] for r in bad.collect()} == {2}

        # second run validates the rest; nothing remains, gate is clean
        res2 = run_validation(
            spark, remaining, filter_for_resume(spark, captions, path)
        )
        write_checkpoint(res2.verdicts, path, "run-2")
        assert filter_for_resume(spark, images, path).count() == 0
        assert unvalidated_parts(spark, path).count() == 0

        # lineage metrics present for all rows (4 real runs + 1 failed stub)
        all_ckpt = spark.read.parquet(path)
        assert all_ckpt.count() == 5
        assert all_ckpt.where(F.col("n_rows") <= 0).count() == 0
