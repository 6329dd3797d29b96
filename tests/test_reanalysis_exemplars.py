"""Persisted-profile re-analysis (reference SeqScanAsJson path) and
violation exemplars (A5 generalized)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from schema_inference_spark.datagen.images import generate_image_corpus, images_spark_df
from schema_inference_spark.functions.json_shape import flat_json_shape_expr
from schema_inference_spark.operators.shapes import (
    merged_top_schema,
    persist_shape_profile,
    reanalyze_persisted_shapes,
)
from schema_inference_spark.plans.validation import run_validation


def test_reanalysis_equals_direct_merge(spark):
    rows = (
        [('{"a": 1}',)] * 5 + [('{"a": 1, "b": "x"}',)] * 3 + [('{"a": "s"}',)] * 2
    )
    df = spark.createDataFrame(rows, "doc string")
    shape = flat_json_shape_expr(F.col("doc"))
    direct = merged_top_schema(df, shape, merge_n=3)
    with tempfile.TemporaryDirectory() as d:
        persist_shape_profile(df, shape, f"{d}/distinct")
        # the corpus is NOT read again — only the persisted profile
        reanalyzed = reanalyze_persisted_shapes(spark, f"{d}/distinct", merge_n=3)
    assert reanalyzed == direct
    assert reanalyzed["properties"]["a"] == {"type": "string"}


def test_validation_exemplars(spark):
    corpus = generate_image_corpus(800, n_parts=2)
    images, captions = images_spark_df(spark, corpus)
    res = run_validation(spark, images, captions)
    ex = {r["check_name"]: r for r in res.exemplars(k=3).collect()}
    # the hot-phash check has hundreds of violations but exactly 3 exemplars,
    # and they are the globally smallest ids (deterministic under salting)
    hot = ex["unique_phash"]
    assert hot["n_rows"] > 100 and len(hot["exemplars"]) == 3
    expected_first = sorted(corpus.expected["unique_phash"])[:3]
    assert hot["exemplars"] == expected_first
    # every failing check appears
    assert set(ex) == {c for c in corpus.expected if corpus.expected[c]}
