"""Dump Spark result dtypes vs DuckDB result types per oracle query and flag
mismatches. Hypothesis: the driver's value hash is type-sensitive (e.g. via
pandas/arrow conversion), so any query whose two sides produce different
result types hash-fails even when values are identical.

Usage: python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

from schema_inference_spark.queries import registry
from schema_inference_spark.session import get_spark
from tests.oracle_harness import duck_con

FAILED_R1 = {
    "q1_pricing_summary", "q3_topk_revenue", "priority_share",
    "hourly_event_windows", "user_session_counts", "event_sample_sorted",
    "event_profile", "error_asof_last_click", "order_rollup",
    "user_bucket_event_pivot", "shape_counts", "shape_topk",
    "doc_token_stats", "streaming_hourly_windows", "orders_rule_checks",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duck_con(sf_dir)
    out = {}
    for name, spec in registry().items():
        if spec.sql is None:
            continue
        sdf = spec.fn(spark, sf_dir)
        s_types = dict(sdf.dtypes)
        res = con.execute(spec.sql)
        arrow = res.arrow()
        d_types = {f.name: str(f.type) for f in arrow.schema}
        diff = {
            c: (s_types.get(c), d_types.get(c))
            for c in set(s_types) | set(d_types)
            if s_types.get(c) != _norm(d_types.get(c))
        }
        out[name] = diff
    mism = {n for n, d in out.items() if d}
    print("queries with type mismatch:", sorted(mism))
    print("r1 failures:", sorted(FAILED_R1))
    print("mismatch but passed r1:", sorted(mism - FAILED_R1))
    print("failed r1 but no mismatch:", sorted(FAILED_R1 - mism))
    print()
    for n, d in out.items():
        if d:
            print(n, json.dumps({k: list(v) for k, v in d.items()}))


def _norm(t):
    """Map an Arrow type string to Spark dtype vocabulary."""
    if t is None:
        return None
    m = {
        "int64": "bigint", "int32": "int", "int16": "smallint",
        "int8": "tinyint", "large_string": "string", "string": "string",
        "double": "double", "float": "float", "bool": "boolean",
        "date32[day]": "date",
    }
    if t in m:
        return m[t]
    if t.startswith("decimal128("):
        p, s = t[len("decimal128("):-1].split(", ")
        return f"decimal({p},{s})"
    if t.startswith("decimal256("):
        p, s = t[len("decimal256("):-1].split(", ")
        return f"decimal({p},{s})"
    if t.startswith("timestamp"):
        return "timestamp"
    return t


if __name__ == "__main__":
    main()
