"""Local replica of the driver's DuckDB correctness gate, run at sf0.001
(the driver runs sf0.01). Exact value equality, stricter than the driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_inference_spark.queries import registry
from tests.oracle_harness import compare_query

SPECS = [s for s in registry().values() if s.sql is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, sf_dir, spec):
    problems = compare_query(spark, spec, sf_dir)
    assert problems == [], problems


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"schema", "count", "percent"}
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 18


def test_epoch_queries_survive_non_utc_caller_session(spark, sf_dir):
    """The driver supplies its own SparkSession; if its timezone isn't UTC,
    epoch arithmetic over NTZ timestamps would shift by the offset. The
    query entry points must pin UTC themselves."""
    from schema_inference_spark.queries import registry

    spec = registry()["hourly_event_windows"]
    baseline = sorted(tuple(r) for r in spec.fn(spark, sf_dir).collect())
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        shifted_session = sorted(tuple(r) for r in spec.fn(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert shifted_session == baseline


def test_harness_rejects_decimal_outputs(spark, sf_dir):
    """Negative control for the gate itself: a query pair that is
    value-identical but emits DECIMAL (the exact r1 failure mode) must be
    REJECTED by the harness's type lint."""
    from schema_inference_spark.queries import QuerySpec
    from schema_inference_spark.sources.tables import load_table
    from tests.oracle_harness import compare_query

    def bad_query(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        return li.groupBy("l_returnflag").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty")
        )

    bad_sql = (
        "SELECT l_returnflag, sum(l_quantity::DECIMAL(18,2)) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    )
    spec = QuerySpec("bad_decimal", bad_query, bad_sql, "negative control")
    problems = compare_query(spark, spec, sf_dir)
    assert any("decimal" in p.lower() for p in problems), problems


def test_harness_catches_value_differences(spark, sf_dir):
    """Negative control #2: a genuinely wrong oracle must fail the value
    comparison, not slip through canonicalization."""
    from schema_inference_spark.queries import QuerySpec
    from schema_inference_spark.sources.tables import load_table
    from tests.oracle_harness import compare_query

    def q(spark, sf_dir):
        return load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )

    wrong_sql = (
        "SELECT o_orderstatus, count(*) + 1 AS n FROM orders GROUP BY o_orderstatus"
    )
    spec = QuerySpec("off_by_one", q, wrong_sql, "negative control")
    problems = compare_query(spark, spec, sf_dir)
    assert any("values differ" in p for p in problems), problems
