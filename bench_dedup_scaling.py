#!/usr/bin/env python
"""Scaling evidence for the TEXT-DEDUP pipeline (the suite evidence's
sibling): MinHash signatures + LSH banding + candidate pairs over a
deterministic synthetic corpus, run at two parallelism levels in separate
JVMs; reports docs/sec at both and efficiency = (thr@4N / thr@N) / 4.

Usage: python bench_dedup_scaling.py [n_docs] [n_base] [rounds]
Corpus is generated once and cached in /tmp (md5-derived words, ~1% planted
near-dups), so the measurement is the dedup pipeline, not the generator.
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

cpus, n = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name=f"dedup-scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=16)
path = f"/tmp/spark_graft_dedup_corpus_{{n}}"
if not os.path.exists(f"{{path}}/_done"):
    # deterministic corpus: 30 md5-derived words per doc; every 100th doc is
    # a near-dup of its predecessor (one word changed)
    expr = ("concat_ws(' ', transform(sequence(0, 29), "
            "j -> substr(md5(concat(cast(CASE WHEN id % 100 = 99 AND j > 0 "
            "THEN id - 1 ELSE id END AS string), "
            "'-', cast(j AS string))), 1, 8))) AS text")
    docs = spark.range(n).selectExpr("id AS doc_id", expr)
    # 16 files so both parallelism levels get real input splits
    docs.repartition(16).write.mode("overwrite").parquet(path + "/docs")
    open(path + "/_done", "w").write("ok")
docs = spark.read.parquet(path + "/docs")

from schema_inference_spark.operators.dedup import lsh_candidate_pairs

def run_once():
    return lsh_candidate_pairs(docs, "doc_id", "text", n_perm=4, band_size=2).count()

n_pairs = run_once()  # warmup (JIT + shuffle services)
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    run_once()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"cpus": int(cpus), "sec": round(best, 3),
                   "docs_per_sec": round(n / best, 1), "n_pairs": n_pairs}}))
"""


def run_at(cpus: int, n: int) -> dict:
    code = RUNNER.format(repo=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    per_round, best = [], {}
    for _ in range(rounds):
        r_n = run_at(n_base, n)
        r_4n = run_at(4 * n_base, n)
        per_round.append(round((r_4n["docs_per_sec"] / r_n["docs_per_sec"]) / 4.0, 3))
        for r in (r_n, r_4n):
            cur = best.get(r["cpus"])
            if cur is None or r["docs_per_sec"] > cur["docs_per_sec"]:
                best[r["cpus"]] = r
    eff = round((best[4 * n_base]["docs_per_sec"] / best[n_base]["docs_per_sec"]) / 4.0, 3)
    print(json.dumps({
        "pipeline": "minhash_lsh_candidates",
        "n_docs": n,
        f"local{n_base}": best[n_base],
        f"local{4 * n_base}": best[4 * n_base],
        "scaling_efficiency": eff,
        "per_round_efficiency": per_round,
        "criterion": "efficiency >= 0.8 between N and 4N parallelism",
        "passed": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
