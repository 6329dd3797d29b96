"""As-of join semantics, salted non-reducible aggregation, snapshot upsert,
HLL accuracy."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from schema_inference_spark.operators.asof import asof_join
from schema_inference_spark.operators.salting import salted_exemplars
from schema_inference_spark.plans.snapshot import load_snapshot, upsert_snapshot


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 11, _ts(7)), (4, 12, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(3), 1.0), (10, _ts(15), 2.0), (11, _ts(7), 3.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out[1] == 1.0  # most recent at ts=3
    assert out[2] == 2.0  # picks 15 over 3
    assert out[3] == 3.0  # equal ts -> inclusive (<=)
    assert out[4] is None  # no right rows for user 12


def test_salted_exemplars_hot_key(spark):
    rows = [(0, f"v{i:04d}") for i in range(500)] + [(k, f"w{k}-{i}") for k in (1, 2) for i in range(3)]
    df = spark.createDataFrame(rows, "key int, val string")
    out = {r["key"]: r for r in salted_exemplars(df, "key", "val", k=3, n_salts=8).collect()}
    assert out[0]["n_rows"] == 500
    # deterministic: globally smallest 3 values regardless of salting
    assert out[0]["exemplars"] == ["v0000", "v0001", "v0002"]
    assert out[1]["n_rows"] == 3 and len(out[1]["exemplars"]) == 3


def test_salted_exemplars_null_key_and_null_values(spark):
    """ADVICE r2: the NULL-key group must survive (no key equi-join), and
    null exemplar values must neither consume top-k slots nor appear in the
    output — but they DO count toward n_rows."""
    rows = (
        [(None, f"n{i}") for i in range(4)]        # null key, real values
        + [(7, None)] * 5                          # nulls would fill k slots
        + [(7, "b"), (7, "a"), (7, "c"), (7, "d")]
        + [(8, None), (8, None)]                   # group with ONLY null values
    )
    df = spark.createDataFrame(rows, "key int, val string")
    out = {r["key"]: r for r in salted_exemplars(df, "key", "val", k=3).collect()}
    assert out[None]["n_rows"] == 4 and out[None]["exemplars"] == ["n0", "n1", "n2"]
    assert out[7]["n_rows"] == 9 and out[7]["exemplars"] == ["a", "b", "c"]
    assert out[8]["n_rows"] == 2 and out[8]["exemplars"] == []


def test_snapshot_upsert_lifecycle(spark):
    p1 = spark.createDataFrame([(0, 10), (1, 20)], "part int, n_rows long")
    p2 = spark.createDataFrame([(1, 25), (2, 30)], "part int, n_rows long")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/snap"
        assert load_snapshot(spark, path, "s1") is None
        upsert_snapshot(spark, path, p1, "s1")
        first = {r["part"]: r["n_rows"] for r in load_snapshot(spark, path, "s1").collect()}
        assert first == {0: 10, 1: 20}
        upsert_snapshot(spark, path, p2, "s1")  # part 1 replaced, part 2 added
        second = {r["part"]: r["n_rows"] for r in load_snapshot(spark, path, "s1").collect()}
        assert second == {0: 10, 1: 25, 2: 30}
        upsert_snapshot(spark, path, p1, "s2")  # other snapshot untouched
        assert {r["part"]: r["n_rows"] for r in load_snapshot(spark, path, "s1").collect()} == second


def test_merge_upsert_column_contract(spark):
    """Both merge branches share one column contract (ADVICE r3): extra
    source columns raise (what Iceberg `UPDATE SET *` would do), missing
    non-key columns become typed nulls in target column order."""
    import pytest

    from schema_inference_spark.sources.iceberg import merge_upsert

    base = spark.createDataFrame([(0, 10, "a"), (1, 20, "b")], "part int, n_rows long, tag string")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/tbl"
        merge_upsert(spark, path, base, ("part",))
        # missing non-key column -> typed null, target column order kept
        missing = spark.createDataFrame([(1, 99)], "part int, n_rows long")
        merged = merge_upsert(spark, path, missing, ("part",))
        assert merged.columns == ["part", "n_rows", "tag"]
        rows = {r["part"]: (r["n_rows"], r["tag"]) for r in merged.collect()}
        assert rows == {0: (10, "a"), 1: (99, None)}
        # extra source column -> loud failure, not a silent schema widen
        extra = spark.createDataFrame([(2, 5, "c", True)], "part int, n_rows long, tag string, odd boolean")
        with pytest.raises(ValueError, match="absent from the target"):
            merge_upsert(spark, path, extra, ("part",))
        # source without the key column -> loud failure
        with pytest.raises(ValueError, match="key columns"):
            merge_upsert(spark, path, base.drop("part"), ("part",))


def test_hll_within_tolerance(spark, sf_dir):
    from schema_inference_spark.queries.catalog_core import partkey_cardinality_hll

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_suppkey").alias("s"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: (r["approx_parts"], r["approx_supps"])
        for r in partkey_cardinality_hll(spark, sf_dir).collect()
    }
    for flag, (p, s) in exact.items():
        ap, asup = approx[flag]
        assert abs(ap - p) / p < 0.1 and abs(asup - s) / s < 0.1
