#!/usr/bin/env python
"""Driver-grade strict sweep of the EXTRA catalog (queries outside the
capped 50-entry registry) at an arbitrary scale factor — the sibling of
tools/strict_compare.py, which covers the registry. test_extra_parity
runs these at sf0.001; this tool re-runs them at the driver's sf0.01
(or any sf dir) with the same type-linted hash comparison.

Usage: PYTHONPATH=. python tools/extra_strict_compare.py [sf_dir]
Exit 0 iff every extra query matches its oracle strictly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from oracle_harness import compare_query  # noqa: E402

from schema_inference_spark.queries.catalog_extra import extra_specs  # noqa: E402
from schema_inference_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="extra-strict", master="local[4]", shuffle_partitions=8)
    failures = 0
    for spec in extra_specs():
        problems = compare_query(spark, spec, sf_dir)
        if problems:
            failures += 1
            print(f"{spec.name}: {problems}")
        else:
            print(f"{spec.name}: OK")
    print(f"\n{failures} strict failures over {len(extra_specs())} extra queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
