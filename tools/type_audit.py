"""Dump Spark result dtypes vs DuckDB result types per oracle query and flag
mismatches. (Round-1 postmortem tool: the driver's value hash proved
type-sensitive — this audit found the exact decimal/HUGEINT widenings that
caused all 15 r1 hash-fails. Kept as a diagnostic; the enforced gate now
lives in tests/oracle_harness.py's type lint.)

Usage: PYTHONPATH=. python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

from schema_inference_spark.queries import registry
from schema_inference_spark.session import get_spark
from tests.oracle_harness import duck_con



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
    print("queries with type mismatch:", sorted(mism) or "none")
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
