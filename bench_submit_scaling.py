#!/usr/bin/env python
"""North-rule LAUNCH-MODE scaling evidence: the production job, launched
exactly as BASELINE.json specifies — ``spark-submit --py-files <zip>
jobs/validate_job.py`` — at two parallelism levels in separate JVMs.

This is the same criterion bench_scaling.py measures (suite throughput at
N vs 4N cores on the same input, efficiency = (thr@4N / thr@N) / 4), but
through the real cluster entry point: the engine ships as a --py-files
zip (jobs/package_pyfiles.py), the job builds its session from
spark-submit's --master/--conf flags, and the timed section is the
validation phase reported by the job's own ``--bench-rounds``
instrumentation (JVM startup and result writes are launch overhead a
long-running cluster job amortizes; the criterion is about engine
throughput).

Usage: python bench_submit_scaling.py [n_images] [n_base] [rounds]
Defaults 400000 1 2 with BENCH_DIMS_SCALE=8 (the corpus regime the image
axis uses: decode+PSNR dominates, as at production scale; see BASELINE.md
for why N=1 vs 4N=4 is this host's honest pair). The corpus and the
snapshot profile are generated once and cached in /tmp, so both widths
read identical parquet input.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

# corpus generation runs in its own JVM (not spark-submit — it is test
# fixture setup, not the measured job) and caches under bench.py's key so
# the two benches share one corpus
GEN = r"""
import os, sys
sys.path.insert(0, "{repo}")
from schema_inference_spark.session import get_spark
from schema_inference_spark.operators.profile import profile_images
from bench import ensure_images_parquet

n = int(sys.argv[1])
spark = get_spark(app_name="submit-bench-gen", master="local[8]",
                  shuffle_partitions=16)
ensure_images_parquet(spark, n)
scale = float(os.environ.get("BENCH_DIMS_SCALE", "4.0"))
path = f"/tmp/spark_graft_bench_cache/images_n{{n}}_s{{scale:g}}"
if not os.path.exists(f"{{path}}/_profile_done"):
    snap = spark.read.parquet(f"{{path}}/snapshot_images")
    profile_images(snap).write.mode("overwrite").parquet(
        f"{{path}}/snapshot_profile")
    open(f"{{path}}/_profile_done", "w").write("ok")
print(path)
"""


def ensure_corpus(n: int) -> str:
    out = subprocess.run(
        [sys.executable, "-c", GEN.format(repo=REPO), str(n)],
        capture_output=True, text=True, check=True,
    )
    return out.stdout.strip().splitlines()[-1]


def submit_at(cpus: int, zip_path: str, corpus: str, out_dir: str,
              bench_rounds: int) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cpus}]",
        # identical session config at both sizes (get_spark's defaults,
        # expressed the way a cluster launcher would)
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=16g",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "validate_job.py"),
        "--images", f"{corpus}/images",
        "--captions", f"{corpus}/captions",
        "--snapshot", f"{corpus}/snapshot_profile",
        "--output", out_dir,
        "--run-id", f"submit-bench-{cpus}",
        "--bench-rounds", str(bench_rounds),
    ]
    # the synthetic corpus has planted violations, so the job's gate exits
    # 1 by design — the BENCH line is the measurement, not the exit code
    out = subprocess.run(cmd, capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("BENCH "):
            return json.loads(line[len("BENCH "):])
    raise RuntimeError(
        f"no BENCH line from spark-submit at local[{cpus}]:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ.setdefault("BENCH_DIMS_SCALE", "8")

    corpus = ensure_corpus(n)
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    from package_pyfiles import build

    zip_path = build()

    import tempfile

    per_round, best = [], {}
    with tempfile.TemporaryDirectory() as td:
        for i in range(rounds):
            r_n = submit_at(n_base, zip_path, corpus, f"{td}/out_n_{i}", 2)
            r_4n = submit_at(4 * n_base, zip_path, corpus, f"{td}/out_4n_{i}", 2)
            per_round.append(
                round((r_4n["images_per_sec"] / r_n["images_per_sec"]) / 4.0, 3)
            )
            for r in (r_n, r_4n):
                cur = best.get(r["cpus"])
                if cur is None or r["images_per_sec"] > cur["images_per_sec"]:
                    best[r["cpus"]] = r

    eff = round(
        (best[4 * n_base]["images_per_sec"] / best[n_base]["images_per_sec"]) / 4.0, 3
    )
    print(json.dumps({
        "pipeline": "spark_submit_pyfiles_validate_job",
        "n_images": n,
        f"local{n_base}": best[n_base],
        f"local{4 * n_base}": best[4 * n_base],
        "scaling_efficiency": eff,
        "per_round_efficiency": per_round,
        "criterion": "efficiency >= 0.8 between N and 4N parallelism, "
                     "launched via spark-submit --py-files",
        "passed": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
