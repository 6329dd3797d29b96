#!/usr/bin/env python
"""Scaling evidence for CROSS-SNAPSHOT INCREMENTAL DEDUP (r5, the sixth
axis — the round's new capability carries its own evidence): a new batch
deduped against a PERSISTED prior-corpus signature table — new-batch
signatures + content hashes, band-bucket join against the prior table,
exact-Jaccard verification of candidates — run at two parallelism levels
in separate JVMs. Reports new-batch docs/sec at both, efficiency =
(thr@4N / thr@N) / 4, and REQUIRES the dedup outputs (exact count + id
checksum, verified-near count + id checksum) to be identical at both
widths.

The prior corpus' signatures are generated ONCE and read from parquet in
the timed section — that is the production shape: the rolling crawl never
recomputes the curated corpus' signatures, it reads the table batch A's
curation already wrote (jobs/curate_job.py signatures/ stage).

Usage: python bench_incremental_scaling.py [n_prior] [n_base] [rounds]
New batch is n_prior/2 docs: ~0.5% exact copies of prior docs, ~1% near
copies (last of 30 words changed), rest fresh. All /tmp-cached.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, "{repo}")
from pyspark.sql import functions as F
from schema_inference_spark.session import get_spark
from schema_inference_spark.operators.dedup import (
    cross_batch_candidates, cross_batch_exact_dups,
    cross_batch_verified_pairs, dedup_signatures,
)

cpus, n = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name=f"incr-scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=16)
path = f"/tmp/spark_graft_incr_corpus_{{n}}"
if not os.path.exists(f"{{path}}/_done"):
    # prior corpus: 30 md5-derived words per doc, ids 0..n-1
    prior_expr = ("concat_ws(' ', transform(sequence(0, 29), "
                  "j -> substr(md5(concat(cast(id AS string), "
                  "'-', cast(j AS string))), 1, 8))) AS text")
    prior = spark.range(n).selectExpr("id AS doc_id", prior_expr)
    prior.repartition(16).write.mode("overwrite").parquet(path + "/prior")
    # the persisted signature table (what curate_job's signatures/ stage
    # ships) — built once, NOT part of the timed incremental pipeline
    dedup_signatures(spark.read.parquet(path + "/prior"), n_perm=4) \
        .repartition(16).write.mode("overwrite").parquet(path + "/prior_sigs")
    # new batch: ids offset by 10^7; word seed reuses the small id, so
    # id%200==0 -> exact copy of prior doc id, id%100==50 -> near copy
    # (word 29 salted differently), rest fresh (all words salted)
    new_expr = ("concat_ws(' ', transform(sequence(0, 29), "
                "j -> substr(md5(concat(cast(CASE "
                "WHEN id % 200 = 0 THEN id "
                "WHEN id % 100 = 50 AND j < 29 THEN id "
                "ELSE id + 50000000 END AS string), "
                "'-', cast(j AS string))), 1, 8))) AS text")
    new = spark.range(n // 2).selectExpr("id + 10000000 AS doc_id", new_expr)
    new.repartition(16).write.mode("overwrite").parquet(path + "/new")
    open(path + "/_done", "w").write("ok")

prior = spark.read.parquet(path + "/prior")
prior_sigs = spark.read.parquet(path + "/prior_sigs")
new = spark.read.parquet(path + "/new")
n_new = n // 2

def run_once():
    exact = cross_batch_exact_dups(new, prior_sigs).persist()
    ex = exact.agg(
        F.count(F.lit(1)).alias("n"), F.sum("id_new").alias("chk")
    ).collect()[0]
    cands = cross_batch_candidates(
        dedup_signatures(new, n_perm=4), prior_sigs, n_perm=4, band_size=2
    )
    near = cross_batch_verified_pairs(new, prior, cands, threshold=0.6).join(
        exact.select("id_new"), "id_new", "left_anti"
    )
    nr = near.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id_new") + F.col("id_prior")).alias("chk"),
    ).collect()[0]
    exact.unpersist()
    return {{"n_exact": ex["n"], "exact_chk": ex["chk"],
             "n_near": nr["n"], "near_chk": nr["chk"]}}

outputs = run_once()  # warmup (JIT + shuffle services)
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    got = run_once()
    best = min(best, time.perf_counter() - t0)
    assert got == outputs, f"nondeterministic outputs: {{got}} vs {{outputs}}"
print(json.dumps({{"cpus": int(cpus), "sec": round(best, 3),
                   "new_docs_per_sec": round(n_new / best, 1),
                   "outputs": outputs}}))
"""


def run_at(cpus: int, n: int) -> dict:
    code = RUNNER.format(repo=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    per_round, best = [], {}
    outputs = None
    for _ in range(rounds):
        r_n = run_at(n_base, n)
        r_4n = run_at(4 * n_base, n)
        if r_n["outputs"] != r_4n["outputs"]:
            raise SystemExit(
                f"outputs differ across widths: {r_n['outputs']} vs {r_4n['outputs']}"
            )
        outputs = r_n["outputs"]
        per_round.append(
            round((r_4n["new_docs_per_sec"] / r_n["new_docs_per_sec"]) / 4.0, 3)
        )
        for r in (r_n, r_4n):
            cur = best.get(r["cpus"])
            if cur is None or r["new_docs_per_sec"] > cur["new_docs_per_sec"]:
                best[r["cpus"]] = r
    eff = round(
        (best[4 * n_base]["new_docs_per_sec"] / best[n_base]["new_docs_per_sec"]) / 4.0,
        3,
    )
    print(json.dumps({
        "pipeline": "cross_snapshot_incremental_dedup",
        "n_prior": n,
        "n_new": n // 2,
        f"local{n_base}": best[n_base],
        f"local{4 * n_base}": best[4 * n_base],
        "scaling_efficiency": eff,
        "per_round_efficiency": per_round,
        "outputs_identical_at_both_widths": True,
        "outputs": outputs,
        "criterion": "efficiency >= 0.8 between N and 4N parallelism",
        "passed": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
