"""Rule-DSL + generic-profiler queries with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_inference_spark.queries import QuerySpec
from schema_inference_spark.sources.tables import load_table


def orders_rule_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rules over orders: domain + range (firing on ~5% of rows)
    + uniqueness, compiled to one scan + one agg."""
    from schema_inference_spark.plans.rules import (
        apply_rules,
        in_domain,
        in_range,
        not_null,
        rule_verdicts,
        unique,
    )

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        not_null("o_orderpriority"),
        in_domain("o_orderstatus", ("O", "F", "P")),
        in_range("o_totalprice", 0.0, 400000.0),
        unique("o_orderkey"),
    ]
    violations = apply_rules(orders, rules, id_cols=("o_orderkey",))
    return rule_verdicts(orders, violations, rules).orderBy("rule_name")


ORDERS_RULES_SQL = """
WITH n AS (SELECT count(*) AS n_rows FROM orders),
v AS (
  SELECT 'not_null_o_orderpriority' AS rule_name, count(*) FILTER (o_orderpriority IS NULL) AS n_violations FROM orders
  UNION ALL
  SELECT 'domain_o_orderstatus', count(*) FILTER (o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P')) FROM orders
  UNION ALL
  SELECT 'range_o_totalprice', count(*) FILTER (o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 400000.0) FROM orders
  UNION ALL
  SELECT 'unique_o_orderkey', coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
)
SELECT rule_name, n.n_rows::BIGINT AS n_rows, v.n_violations::BIGINT AS n_violations,
       v.n_violations = 0 AS passed
FROM v, n ORDER BY rule_name
"""


PROFILE_COLS = ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
PROFILE_NUMERIC = ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


def lineitem_generic_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.operators.profile import profile_table

    li = load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    # exact distinct ONLY here: the DuckDB oracle compares exact counts.
    # Production default is HLL (lineitem_profile_hll below).
    return profile_table(
        li, numeric_cols=list(PROFILE_NUMERIC), exact_distinct=True
    ).orderBy("column", "metric")


def lineitem_profile_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiler's production (HLL) mode: one scan, one aggregate, no
    per-column input expansion — rows-only driver check (estimates are
    implementation-defined; accuracy asserted in pytest)."""
    from schema_inference_spark.operators.profile import profile_table

    li = load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    return profile_table(li, numeric_cols=list(PROFILE_NUMERIC)).orderBy("column", "metric")


_PARTS = []
for c in PROFILE_COLS:
    _PARTS.append(
        f"SELECT '{c}' AS \"column\", 'n_null' AS metric, "
        f"(count(*) FILTER ({c} IS NULL))::DOUBLE AS value FROM lineitem"
    )
    _PARTS.append(
        f"SELECT '{c}', 'n_distinct', count(DISTINCT {c})::DOUBLE FROM lineitem"
    )
for c in PROFILE_NUMERIC:
    _PARTS.append(f"SELECT '{c}', 'min', min({c})::DOUBLE FROM lineitem")
    _PARTS.append(f"SELECT '{c}', 'max', max({c})::DOUBLE FROM lineitem")
_PARTS.append("SELECT '*', 'n_rows', count(*)::DOUBLE FROM lineitem")

GENERIC_PROFILE_SQL = "\nUNION ALL\n".join(_PARTS) + '\nORDER BY "column", metric'


SPECS = [
    QuerySpec("orders_rule_checks", orders_rule_checks, ORDERS_RULES_SQL, "declarative rule DSL"),
    QuerySpec(
        "lineitem_generic_profile", lineitem_generic_profile, GENERIC_PROFILE_SQL,
        "generic single-pass table profile",
    ),
    QuerySpec(
        "lineitem_profile_hll", lineitem_profile_hll, None,
        "profiler HLL mode: single scan, no distinct-expand",
    ),
]
