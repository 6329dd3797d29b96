"""Local replica of the driver's correctness gate: run a QuerySpec's Spark
side and its DuckDB oracle on the same sf dir and compare row count, schema
(column names), and order-insensitive values. Stricter than the driver
(exact value equality after canonicalization) so mismatches surface here
first."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from schema_inference_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return ("none",)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(round(v, 9)))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return v


def compare_query(spark, spec, sf_dir: str) -> list[str]:
    """Returns a list of problem strings; empty means parity."""
    problems: list[str] = []
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = sdf.collect()

    con = duck_con(sf_dir)
    res = con.execute(spec.sql)
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = res.fetchall()
    duck_names = [d[0] for d in res.description]

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
