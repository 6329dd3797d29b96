"""Type-lattice semantics parity with the reference's DataTypesTest
(src/test/java/.../DataTypesTest.java:14-65) plus the merge lattice
(MergeBiFunction.java:19-48, exercised by MapMergeTest.java:11-36)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from schema_inference_spark.functions.type_inference import (
    infer_type_expr,
    infer_type_sql,
    merge_schemas,
    merge_type,
)

# (value, expected inferred type) — reference rule chain incl. quirks.
CASES = [
    ("true", "boolean"),
    ("False", "boolean"),
    ("sss121", "string"),  # DataTypesTest letter rule
    ("13", "integer"),  # isNumeric
    ("13.64", "float"),  # 2 chars after '.', parseable  (DataTypesTest:34-50)
    ("20.44567567", "double"),  # >3 chars after '.'
    ("1.2345", "double"),
    ("1.234", "float"),  # exactly 3 after '.' -> not double
    ("-12", "float"),  # minus sign: not isNumeric; no dot, len<=3 -> float
    ("-1234", "double"),  # quirk: no dot -> whole string len>3 + parseable
    ("12.3.4", "null"),  # unparseable, no letters
    ("", "null"),
]


def test_merge_type_lattice():
    assert merge_type("null", "integer") == "integer"
    assert merge_type("integer", "null") == "integer"
    assert merge_type("integer", "string") == "string"
    assert merge_type("string", "boolean") == "string"
    assert merge_type("float", "double") == "double"
    assert merge_type("double", "float") == "double"
    assert merge_type("integer", "number") == "number"
    # last-write-wins quirk (MergeBiFunction.java:47)
    assert merge_type("boolean", "integer") == "integer"
    assert merge_type("integer", "boolean") == "boolean"


def test_merge_schemas_nested():
    a = {"type": "object", "properties": {"x1Pos": {"type": "integer"}}}
    b = {"type": "object", "properties": {"x1Pos": {"type": "string"}, "y": {"type": "null"}}}
    m = merge_schemas(a, b)
    assert m == {
        "type": "object",
        "properties": {"x1Pos": {"type": "string"}, "y": {"type": "null"}},
    }
    arr_a = {"type": "array", "items": {"type": "integer"}}
    arr_b = {"type": "array", "items": {"type": "number"}}
    assert merge_schemas(arr_a, arr_b) == {"type": "array", "items": {"type": "number"}}


@pytest.mark.parametrize("value,expected", CASES)
def test_infer_type_spark(spark, value, expected):
    df = spark.createDataFrame([(value,)], "v string")
    got = df.select(infer_type_expr(F.col("v")).alias("t")).collect()[0]["t"]
    assert got == expected, value


def test_infer_type_sql_matches_spark(spark):
    values = [v for v, _ in CASES]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    spark_out = {
        r["v"]: r["t"]
        for r in df.select("v", infer_type_expr(F.col("v")).alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ",".join(f"('{v}')" for v in values) + ") AS x(v)")
    sql_out = dict(con.execute(f"SELECT v, {infer_type_sql('v')} FROM t").fetchall())
    assert spark_out == sql_out
