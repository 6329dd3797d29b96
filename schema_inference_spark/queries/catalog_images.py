"""Image-engine + streaming + artifact queries.

The image constraint suite runs over the deterministic synthetic corpus
(no images in the driver's testdata), so those entries are rows-only
checks — their exact oracle is the generator's plain-Python simulation,
asserted in tests/test_validation.py. The streaming window query DOES carry
a SQL oracle: its memory-sink result must equal the batch/DuckDB answer.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schema_inference_spark.queries import QuerySpec
from schema_inference_spark.queries.catalog_core import HOURLY_SQL
from schema_inference_spark.sources.tables import load_table

_CORPUS_N = 2000


def _corpus_dfs(spark: SparkSession):
    from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df

    corpus = generate_image_corpus(_CORPUS_N, n_parts=8)
    return images_spark_df(spark, corpus)


def images_validation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.plans.validation import run_validation

    images, captions = _corpus_dfs(spark)
    res = run_validation(spark, images, captions)
    return res.verdicts.orderBy("part", "check_name")


def images_violations_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.plans.validation import run_validation

    images, captions = _corpus_dfs(spark)
    res = run_validation(spark, images, captions)
    return (
        res.violations.groupBy("check_name")
        .agg(
            F.countDistinct("image_id").alias("n_images"),
            F.count(F.lit(1)).alias("n_violations"),
        )
        .orderBy("check_name")
    )


def images_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.operators.profile import profile_images

    images, _ = _corpus_dfs(spark)
    prof = profile_images(images)
    # arrays stringified so the rows-only check sees a stable scalar schema
    return prof.select(
        "part",
        "n_rows",
        "null_fmt",
        "null_caption",
        "min_w",
        "max_w",
        "min_h",
        "max_h",
        "distinct_fmt_est",
        F.to_json(F.col("w_hist")).alias("w_hist_json"),
        F.to_json(F.col("phash_hist")).alias("phash_hist_json"),
    ).orderBy("part")


def merged_event_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side top-N schema merge (reference A8) as a one-row table."""
    from schema_inference_spark.functions.json_shape import flat_json_shape_expr
    from schema_inference_spark.operators.shapes import merged_top_schema

    ev = load_table(spark, sf_dir, "events")
    merged = merged_top_schema(ev, flat_json_shape_expr(F.col("props")), merge_n=10)
    return spark.createDataFrame(
        [(json.dumps(merged, sort_keys=True, separators=(",", ":")),)], "merged_schema string"
    )


def proto_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged schema -> proto hierarchy -> order-safe whole-file assembly
    (reference GenerateProtobufHierarchy + A6/S4 lifecycle)."""
    from schema_inference_spark.functions.json_shape import flat_json_shape_expr
    from schema_inference_spark.operators.proto import (
        concat_proto_files,
        proto_hierarchy,
        proto_lines_df,
        with_metadata_message,
    )
    from schema_inference_spark.operators.shapes import merged_top_schema

    ev = load_table(spark, sf_dir, "events")
    merged = merged_top_schema(ev, flat_json_shape_expr(F.col("props")), merge_n=10)
    lines = proto_lines_df(spark, with_metadata_message(proto_hierarchy(merged)))
    return concat_proto_files(lines).orderBy("file_name")


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch hourly-window query executed as a Structured Streaming job
    (file source -> watermark -> tumbling window -> memory sink). Its oracle
    is the SAME SQL as the batch query — streaming/batch equivalence is the
    correctness claim."""
    from schema_inference_spark.streaming.validate_stream import (
        run_stream_to_memory,
        windowed_event_counts,
    )

    # The file-stream source requires a directory; stage one with a symlink
    # to the (read-only) events parquet.
    import hashlib
    import os

    stage = f"/tmp/spark_graft_stream/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    if not os.path.exists(link):
        os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), link)
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(stage)
    out = run_stream_to_memory(
        spark, windowed_event_counts(stream), "streaming_hourly_windows_sink"
    )
    return out.orderBy("hour_epoch", "event_type")


SPECS = [
    QuerySpec("images_validation_verdicts", images_validation_verdicts, None, "full suite verdicts"),
    QuerySpec("images_violations_summary", images_violations_summary, None, "violation rollup"),
    QuerySpec("images_profile", images_profile, None, "single-pass image profile"),
    QuerySpec("merged_event_schema", merged_event_schema, None, "A8 top-N schema merge"),
    QuerySpec("proto_files", proto_files, None, "proto hierarchy emission"),
    QuerySpec("streaming_hourly_windows", streaming_hourly_windows, HOURLY_SQL, "streaming==batch"),
]
