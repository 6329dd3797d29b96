"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference-parity query (distinct-shape
profiling of ``events.props``, the analog of SeqFilesScan.java:282-331) at
sf0.001. ``queries()``/``oracle_sql()`` expose the full catalog from
``schema_inference_spark.queries`` — each SQL-expressible operator carries a
DuckDB oracle with identically-aliased columns; non-SQL-expressible ops
(image constraint suite, streaming) are registered without oracle for the
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from schema_inference_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = registry()["shape_topk"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    # The image-suite oracles read datagen side tables from /tmp; make sure
    # they exist even if the driver runs the SQL before the Spark query
    # (memoized — free after the first call).
    from schema_inference_spark.datagen.images import write_image_oracle_tables

    write_image_oracle_tables()
    return {name: spec.sql for name, spec in registry().items() if spec.sql is not None}
