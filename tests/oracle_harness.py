"""Local replica of the driver's correctness gate: run a QuerySpec's Spark
side and its DuckDB oracle on the same sf dir and compare row count, schema
(column names), and order-insensitive values.

Round-1 lesson (VERDICT.md #1): the driver's value hash is REPRESENTATION
sensitive — DuckDB's widened DECIMAL(38,x) and HUGEINT results render
differently from Spark's decimal/bigint (both become float64 through
pandas), so value-identical results can still hash-mismatch. This harness
therefore:

* compares cells strictly as ``(type_name, str(value))`` with NO
  canonicalization (no Decimal.normalize, no float rounding), and
* LINTS the output types — any DECIMAL on either side, or any DuckDB
  HUGEINT, is itself a failure, because those types hash unstably in the
  driver even when the values agree. Final outputs must be
  string/bigint/int/double/boolean/date/timestamp/arrays thereof; exact
  decimal math belongs INSIDE the query with a final ::DOUBLE cast on both
  engines.
"""

from __future__ import annotations

import duckdb

from schema_inference_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Type-sensitive cell canonicalization: Decimal('5.00'), 5.0 and 5 are
    three DIFFERENT values here, exactly as in the driver's hash."""
    if isinstance(v, list):
        return ("list", tuple(_canon(x) for x in v))
    return (type(v).__name__, str(v))


_BANNED_SPARK = ("decimal",)


def _type_problems(sdf, duck_res) -> list[str]:
    problems = []
    for name, dtype in sdf.dtypes:
        if any(b in dtype for b in _BANNED_SPARK):
            problems.append(
                f"spark output column {name} is {dtype}: decimal outputs hash "
                "unstably vs DuckDB's widened decimals — finish with .cast('double')"
            )
    arrow = duck_res.arrow()
    for field in arrow.schema:
        t = str(field.type)
        if t.startswith("decimal"):
            problems.append(
                f"duckdb output column {field.name} is {t} (DECIMAL/HUGEINT): "
                "pin with ::DOUBLE or ::BIGINT in the oracle SQL"
            )
    return problems


def compare_query(spark, spec, sf_dir: str) -> list[str]:
    """Returns a list of problem strings; empty means driver-grade parity."""
    problems: list[str] = []
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = sdf.collect()

    con = duck_con(sf_dir)
    problems += _type_problems(sdf, con.execute(spec.sql))
    res = con.execute(spec.sql)
    duck_cols = sorted(d[0] for d in res.description)
    duck_names = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if spark_cols != duck_cols:
        problems.append(f"columns: spark={spark_cols} duck={duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")

    s_set = sorted(
        tuple(_canon(r[c]) for c in spark_cols) for r in spark_rows
    )
    idx = {n: i for i, n in enumerate(duck_names)}
    d_set = sorted(
        tuple(_canon(row[idx[c]]) for c in spark_cols) for row in duck_rows
    )
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
        only_s = [r for r in s_set if r not in d_set][:2]
        only_d = [r for r in d_set if r not in s_set][:2]
        problems.append(f"values differ; first diffs={diffs} only_spark={only_s} only_duck={only_d}")
    return problems
