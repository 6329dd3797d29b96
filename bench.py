#!/usr/bin/env python
"""Benchmark harness: headline queries + the full image constraint suite.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Env knobs:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_IMAGES        override synthetic image count (default 500000*sf)

The image corpus is generated deterministically once per size and cached as
parquet in /tmp so the benchmark measures the engine (scan -> validate),
not the generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_topk_revenue",
    "customers_without_orders",
    "top_orders_per_segment",
    "distinct_parts_by_flag",
    "quantity_drift_psi",
    "hourly_event_windows",
    "user_session_counts",
    "shape_counts",
    "value_type_histogram",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_images_parquet(spark, n: int, cache_root: str = "/tmp/spark_graft_bench_cache"):
    """Generate-once, read-from-parquet corpus (plus clean snapshot profile)."""
    from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df

    path = f"{cache_root}/images_n{n}"
    if not os.path.exists(f"{path}/_done"):
        corpus = generate_image_corpus(n, n_parts=32)
        images, captions = images_spark_df(spark, corpus)
        images.write.mode("overwrite").parquet(f"{path}/images")
        captions.write.mode("overwrite").parquet(f"{path}/captions")
        snap = generate_image_corpus(max(2000, n // 10), n_parts=32, with_violations=False)
        snap_images, _ = images_spark_df(spark, snap)
        snap_images.write.mode("overwrite").parquet(f"{path}/snapshot_images")
        open(f"{path}/_done", "w").write("ok")
    return (
        spark.read.parquet(f"{path}/images"),
        spark.read.parquet(f"{path}/captions"),
        spark.read.parquet(f"{path}/snapshot_images"),
    )


def run_validation_suite(spark, images, captions, snapshot_images) -> dict:
    from schema_inference_spark.operators.profile import profile_images
    from schema_inference_spark.plans.validation import run_validation

    res = run_validation(
        spark, images, captions, snapshot_profile=profile_images(snapshot_images)
    )
    n_violations = res.violations.count()
    verdicts = res.verdicts.count()
    return {"n_violations": n_violations, "n_verdicts": verdicts}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_of(sf_dir)
    n_images = int(os.environ.get("BENCH_IMAGES", str(int(500_000 * sf))))

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(8, int(cpus) if cpus.isdigit() else 32)))
    from schema_inference_spark.session import get_spark
    from schema_inference_spark.queries import registry

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    specs = registry()
    timings: dict[str, float] = {}

    # headline relational/profiling queries on the driver's tables
    for name in HEADLINE:
        spec = specs[name]
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # the flagship: full constraint suite over the synthetic image corpus
    images, captions, snapshot = ensure_images_parquet(spark, n_images)
    t0 = time.perf_counter()
    stats = run_validation_suite(spark, images, captions, snapshot)
    suite_sec = time.perf_counter() - t0
    timings["validation_suite"] = round(suite_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_plus_validation_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_images": n_images,
        "images_per_sec": round(n_images / suite_sec, 1),
        "cpus": cpus,
        **stats,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
