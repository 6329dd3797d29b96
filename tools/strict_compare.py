"""Run the driver-grade strict oracle comparison (tests/oracle_harness.py)
at an arbitrary SF — use sf0.01 to mirror the driver's correctness run.

Usage: PYTHONPATH=. python tools/strict_compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

from schema_inference_spark.queries import registry
from schema_inference_spark.session import get_spark
from tests.oracle_harness import compare_query


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    reg = registry()
    if not names:
        names = list(reg)
    spark = get_spark()
    bad = 0
    for n in names:
        spec = reg[n]
        if spec.sql is None:
            print(f"{n}: no oracle, skipped")
            continue
        try:
            msgs = compare_query(spark, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            msgs = [f"ERROR {type(e).__name__}: {e}"]
        if not msgs:
            print(f"{n}: OK")
        else:
            bad += 1
            print(f"{n}: STRICT-FAIL")
            for m in msgs[:8]:
                print(f"    {m}")
    print(f"\n{bad} strict failures")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
