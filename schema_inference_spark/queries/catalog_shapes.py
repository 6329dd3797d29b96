"""Reference-parity queries: shape profiling lifecycle on ``events.props``.

These are the direct analogs of the reference's production pipeline
(SeqFilesScan.java:282-373) with the DuckDB oracle reproducing the identical
canonical shape strings and integer-division percents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_inference_spark.functions.json_shape import (
    flat_json_shape_expr,
    flat_json_shape_sql,
)
from schema_inference_spark.functions.type_inference import infer_type_sql, infer_type_expr
from schema_inference_spark.operators.shapes import shape_counts, shape_exemplars, top_shapes
from schema_inference_spark.queries import QuerySpec
from schema_inference_spark.sources.tables import load_table


def _shape_col():
    return flat_json_shape_expr(F.col("props"))


def shape_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return shape_counts(ev, _shape_col()).orderBy("schema")


SHAPE_COUNTS_SQL = f"""
WITH shaped AS (
  SELECT {flat_json_shape_sql('props')} AS schema
  FROM events WHERE props IS NOT NULL AND json_valid(props)
),
counts AS (SELECT schema, count(*) AS count FROM shaped GROUP BY schema)
SELECT schema, count, ((count * 100) // (SELECT sum(count) FROM counts))::BIGINT AS percent
FROM counts ORDER BY schema
"""


def shape_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return top_shapes(ev, _shape_col(), k=10)


SHAPE_TOPK_SQL = f"""
WITH shaped AS (
  SELECT {flat_json_shape_sql('props')} AS schema
  FROM events WHERE props IS NOT NULL AND json_valid(props)
),
counts AS (SELECT schema, count(*) AS count FROM shaped GROUP BY schema)
SELECT schema, count, ((count * 100) // (SELECT sum(count) FROM counts))::BIGINT AS percent
FROM counts ORDER BY count DESC, schema ASC LIMIT 10
"""


def shape_exemplars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return shape_exemplars(ev, _shape_col(), F.col("props")).orderBy("schema")


SHAPE_EXEMPLARS_SQL = f"""
SELECT {flat_json_shape_sql('props')} AS schema, min(props) AS colvalue
FROM events WHERE props IS NOT NULL AND json_valid(props)
GROUP BY 1 ORDER BY schema
"""


def value_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference type-lattice rules (InferJsonDatatype.java:11-27) applied to
    every JSON value extracted from props, counted by inferred type."""
    ev = load_table(spark, sf_dir, "events")
    val = F.get_json_object(F.col("props"), "$.k")
    return (
        ev.select(infer_type_expr(val).alias("inferred_type"))
        .groupBy("inferred_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("inferred_type")
    )


TYPE_HIST_SQL = f"""
SELECT {infer_type_sql("json_extract_string(props, '$.k')")} AS inferred_type, count(*) AS n
FROM events GROUP BY 1 ORDER BY inferred_type
"""


SPECS = [
    QuerySpec("shape_counts", shape_counts_q, SHAPE_COUNTS_SQL, "A1+A3: distinct shapes w/ percent"),
    QuerySpec("shape_topk", shape_topk_q, SHAPE_TOPK_SQL, "A4: top-k shapes"),
    QuerySpec("shape_exemplars", shape_exemplars_q, SHAPE_EXEMPLARS_SQL, "A5: exemplar per shape"),
    QuerySpec("value_type_histogram", value_type_histogram, TYPE_HIST_SQL, "P7 lattice over values"),
]
