"""End-to-end drive of the curation production job (jobs/curate_job.py):
dedup -> groups -> leakage-safe split -> PII redaction -> packing, plus
stage-level resume semantics."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from jobs.curate_job import main


def _corpus(spark, n=400):
    """Deterministic corpus: every 50th doc is a near-copy of its
    predecessor; every 40th carries an email."""
    expr = (
        "concat_ws(' ', transform(sequence(0, 24), "
        "j -> substr(md5(concat(cast(CASE WHEN id % 50 = 49 AND j > 0 "
        "THEN id - 1 ELSE id END AS string), '-', cast(j AS string))), 1, 8)))"
    )
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"CASE WHEN id % 40 = 0 THEN concat({expr}, ' mail u', cast(id AS string), "
        f"'@example.com') ELSE {expr} END AS text",
    )


def test_curate_job_end_to_end_and_resume(spark):
    with tempfile.TemporaryDirectory() as d:
        docs = _corpus(spark)
        docs.write.mode("overwrite").parquet(f"{d}/in")
        rc = main([
            "--input", f"{d}/in", "--output", f"{d}/out",
            "--threshold", "0.6", "--max-tokens", "256",
            "--pack-groups", "4", "--redact-pii",
        ])
        assert rc == 0
        m = json.load(open(f"{d}/out/metrics.json"))
        assert m["input_docs"] == 400
        # 8 planted near-dup pairs (every 50th); LSH at n_perm=4/band_size=2
        # is probabilistic, so require most found — and every found pair
        # (they are disjoint) drops exactly one doc
        assert 6 <= m["near_dup_pairs"] <= 8
        assert m["docs_dropped"] == m["near_dup_pairs"]
        assert sum(m["splits"].values()) == 400 - m["docs_dropped"]

        corpus = spark.read.parquet(f"{d}/out/corpus")
        # PII redacted in the output table, token counts match redacted text
        assert corpus.where(F.col("text").contains("@example.com")).count() == 0
        assert corpus.where(F.col("text").contains("<EMAIL>")).count() > 0

        # leakage safety: both members of any surviving pair share a split
        pairs = spark.read.parquet(f"{d}/out/pairs")
        sp = corpus.select("doc_id", "split")
        joined = (
            pairs.join(sp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
            .join(sp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
        )
        assert joined.where(F.col("sa") != F.col("sb")).count() == 0

        # packing invariants on the train split
        packed = spark.read.parquet(f"{d}/out/packed")
        assert packed.count() == m["splits"]["train"]
        over = (
            packed.where(~F.col("truncated"))
            .groupBy("bin_id").agg(F.sum("n_tokens").alias("t"))
            .where(F.col("t") > 256).count()
        )
        assert over == 0

        # RESUME: drop the packed stage only; earlier stages must be read
        # back, not recomputed (their parquet mtimes cannot change)
        packed_rows = {(r["doc_id"], r["bin_id"]) for r in packed.collect()}
        pairs_mtime = os.path.getmtime(f"{d}/out/pairs/_SUCCESS")
        for f in os.listdir(f"{d}/out/packed"):
            os.remove(os.path.join(f"{d}/out/packed", f))
        os.rmdir(f"{d}/out/packed")
        rc = main([
            "--input", f"{d}/in", "--output", f"{d}/out",
            "--threshold", "0.6", "--max-tokens", "256",
            "--pack-groups", "4", "--redact-pii", "--resume",
        ])
        assert rc == 0
        m2 = json.load(open(f"{d}/out/metrics.json"))
        assert m2["stages"]["pairs"] == {"resumed": True}
        assert m2["stages"]["corpus"] == {"resumed": True}
        assert "rows" in m2["stages"]["packed"]  # recomputed
        assert os.path.getmtime(f"{d}/out/pairs/_SUCCESS") == pairs_mtime
        # identical result after resume
        repacked = {
            (r["doc_id"], r["bin_id"])
            for r in spark.read.parquet(f"{d}/out/packed").collect()
        }
        assert repacked == packed_rows
