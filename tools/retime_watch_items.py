#!/usr/bin/env python
"""Re-time the BENCH_r03 watch items (VERDICT r3 #6): shape_counts and
value_type_histogram doubled/tripled vs r2 with unchanged plans. Runs each
query N rounds on a quiet host at the driver's bench configuration
(sf0.1, local[32]) with a cold CacheManager per round, and prints
per-round + best timings so BASELINE.md can record either "back at r2
levels" or a root-caused regression.

Usage: python tools/retime_watch_items.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from schema_inference_spark.queries import registry
from schema_inference_spark.session import get_spark

WATCH = ["shape_counts", "value_type_histogram", "shape_topk", "shape_exemplars"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="retime-watch", master=f"local[{cpus}]")
    specs = registry()

    out = {}
    for name in WATCH:
        fn = specs[name].fn
        fn(spark, sf_dir).collect()  # warmup: Catalyst + scan + JIT
        times = []
        for _ in range(rounds):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"rounds": times, "best": min(times)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "results": out}))


if __name__ == "__main__":
    main()
