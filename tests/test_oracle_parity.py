"""Local replica of the driver's DuckDB correctness gate, run at sf0.001
(the driver runs sf0.01). Exact value equality, stricter than the driver."""

from __future__ import annotations

import pytest

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
