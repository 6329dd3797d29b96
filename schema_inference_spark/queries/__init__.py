"""Query catalog: every driver-checkable operator as a (Spark, oracle-SQL) pair.

Each :class:`QuerySpec` carries a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, when the operator is SQL-expressible, the equivalent ANSI
SQL for the DuckDB oracle. Column names and value formats are aligned on
both sides (aggregates aliased identically; money in DECIMAL(18,2); ratios
rounded; percent via integer division) so the driver's order-insensitive
value-hash comparison is exact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> non-SQL-expressible; driver does rows-only check
    doc: str = ""


def registry() -> dict[str, QuerySpec]:
    from schema_inference_spark.queries import (
        catalog_core,
        catalog_images,
        catalog_rules,
        catalog_shapes,
        catalog_text,
        catalog_vectors,
    )

    specs: dict[str, QuerySpec] = {}
    for mod in (
        catalog_core,
        catalog_shapes,
        catalog_text,
        catalog_vectors,
        catalog_images,
        catalog_rules,
    ):
        for spec in mod.SPECS:
            assert spec.name not in specs, f"duplicate query name {spec.name}"
            specs[spec.name] = spec
    return specs
