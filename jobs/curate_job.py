#!/usr/bin/env python
"""Corpus curation as one resumable spark-submit job: near-dup dedup ->
dedup groups -> leakage-safe split (-> optional PII redaction) ->
sequence packing. The production shape of tests/test_curation_pipeline.py
and the fifth scaling axis (bench_curation_scaling.py, 0.96 N-vs-4N).

    spark-submit --py-files /tmp/schema_inference_spark.zip \
        jobs/curate_job.py \
        --input <documents parquet> --output <dir> \
        [--id-col doc_id] [--text-col text] \
        [--n-perm 4] [--band-size 2] [--threshold 0.6] \
        [--max-tokens 2048] [--pack-groups 0 (0 = shuffle.partitions)] \
        [--redact-pii] [--resume]

Outputs under --output (each stage is a parquet table + _SUCCESS marker):
  pairs/       verified near-dup pairs (id_a, id_b, jaccard)
  components/  (id, component) dedup groups over the pairs
  corpus/      deduped docs + 'split' column (+ PII-redacted text if
               --redact-pii), the training-ready table
  packed/      (id, n_tokens, bin_id, truncated) token-budget bins
  metrics.json per-stage row counts + wall seconds

Resume: --resume skips any stage whose _SUCCESS marker exists and reads
its table back — stage-level checkpointing (each stage boundary IS the
checkpoint, the same materialization the scaling bench showed is also
the right performance shape). Partition-level lineage/resume belongs to
the validation suite (jobs/validate_job.py --checkpoint), whose check
results are independent per partition; curation stages are global
(components and splits must see all pairs), so the honest resume unit
here is the stage.

Exit 0 on success; 1 if the input has no rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-perm", type=int, default=4)
    ap.add_argument("--band-size", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--pack-groups", type=int, default=0)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from schema_inference_spark.functions import text as TX
    from schema_inference_spark.operators.dedup import (
        duplicate_components,
        jaccard_verified_pairs,
        lsh_candidate_pairs,
    )
    from schema_inference_spark.operators.packing import pack_documents
    from schema_inference_spark.operators.sampling import leakage_safe_split
    from schema_inference_spark.sources.iceberg import write_table
    from schema_inference_spark.sources.tables import ensure_utc

    spark = SparkSession.builder.getOrCreate()
    ensure_utc(spark)
    id_col, text_col, out = args.id_col, args.text_col, args.output
    docs = spark.read.parquet(args.input)
    if docs.limit(1).count() == 0:
        print("curate: input has no rows")
        return 1

    metrics: dict[str, dict] = {}

    def stage(name: str, build):
        """Run (or resume) one stage; returns the stage's DataFrame."""
        path = f"{out}/{name}"
        if args.resume and _done(path):
            metrics[name] = {"resumed": True}
            return spark.read.parquet(path)
        t0 = time.perf_counter()
        df = build()
        write_table(df, path, mode="overwrite")
        back = spark.read.parquet(path)
        metrics[name] = {
            "rows": back.count(),
            "sec": round(time.perf_counter() - t0, 2),
        }
        return back

    # 1. near-dup pairs: LSH candidates, exact-Jaccard verified. The
    # candidate frame is rebuilt from the pairs table on resume via the
    # pair endpoints (anything already verified is what split routing
    # needs — see leakage note below).
    pairs = stage(
        "pairs",
        lambda: jaccard_verified_pairs(
            docs,
            lsh_candidate_pairs(
                docs, id_col, text_col, n_perm=args.n_perm, band_size=args.band_size
            ),
            id_col,
            text_col,
            threshold=args.threshold,
        ),
    )

    # 2. dedup groups; representative = smallest id in the component
    comps = stage("components", lambda: duplicate_components(pairs, id_col))

    # 3. deduped, split, training-ready corpus. Split routing uses the
    # VERIFIED pairs (a near-dup of a test doc must never reach train);
    # candidates that failed verification are not near-dups and may split.
    def build_corpus():
        drop = comps.where(F.col(id_col) != F.col("component")).select(id_col)
        kept = docs.join(drop, id_col, "left_anti")
        split_docs = leakage_safe_split(kept, pairs, id_col)
        if args.redact_pii:
            from schema_inference_spark.functions.pii import redact_expr

            split_docs = split_docs.withColumn(text_col, redact_expr(F.col(text_col)))
        return split_docs.withColumn(
            "n_tokens", TX.token_count_expr(F.col(text_col)).cast("long")
        )

    corpus = stage("corpus", build_corpus)

    # 4. pack the train split into token-budget bins
    packed = stage(
        "packed",
        lambda: pack_documents(
            corpus.where(F.col("split") == "train").select(id_col, "n_tokens"),
            id_col=id_col,
            token_col="n_tokens",
            max_tokens=args.max_tokens,
            n_partitions=args.pack_groups or None,
        ),
    )

    splits = {
        r["split"]: r["n"]
        for r in corpus.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_input = docs.count()
    summary = {
        "input_docs": n_input,
        "near_dup_pairs": pairs.count(),
        "docs_dropped": n_input - corpus.count(),
        "splits": splits,
        "packed_docs": packed.count(),
        "bins": packed.select("bin_id").distinct().count(),
        "stages": metrics,
    }
    with open(f"{out}/metrics.json", "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
    print(
        f"curate: {summary['input_docs']} docs -> {summary['docs_dropped']} dropped, "
        f"splits {splits}, {summary['packed_docs']} train docs in "
        f"{summary['bins']} bins"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
