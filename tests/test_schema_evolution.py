"""Schema-evolution compatibility + built-in streaming dedup equivalence."""

from __future__ import annotations

import tempfile

from pyspark.sql import types as T

from schema_inference_spark.operators.domain import schema_evolution_problems


def _schema(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_schema_evolution_compatible():
    old = _schema(("id", T.StringType(), False), ("w", T.IntegerType(), True))
    new = _schema(
        ("id", T.StringType(), False),
        ("w", T.LongType(), True),  # widening ok
        ("score", T.DoubleType(), True),  # additive nullable ok
    )
    assert schema_evolution_problems(old, new) == []


def test_schema_evolution_incompatible():
    old = _schema(
        ("id", T.StringType(), False),
        ("w", T.LongType(), True),
        ("fmt", T.StringType(), True),
    )
    new = _schema(
        ("id", T.StringType(), True),
        ("w", T.IntegerType(), True),  # narrowing
        ("req", T.IntegerType(), False),  # new non-null
    )
    problems = schema_evolution_problems(old, new)
    assert any("dropped column fmt" in p for p in problems)
    assert any("incompatible type change w" in p for p in problems)
    assert any("new non-nullable column req" in p for p in problems)


def test_builtin_streaming_dropduplicates_matches_custom(spark):
    """The built-in streaming dropDuplicates must agree with the custom
    stateful operator on which ids survive — the 'prefer built-ins' check.
    (The custom op additionally guarantees WHICH duplicate row wins; the
    built-in keeps an arbitrary one, so only id-sets are compared.)"""
    from schema_inference_spark.streaming.stateful_dedup import dedup_stream

    schema = "image_id string, payload string"
    rows = [("a", "p1"), ("b", "p2"), ("a", "p1-dup"), ("c", "p3"), ("b", "p2-dup")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/src")

        def run(df_builder, out, ck):
            stream = spark.readStream.schema(schema).parquet(f"{d}/src")
            q = (
                df_builder(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120) and q.exception() is None
            return {r["image_id"] for r in spark.read.parquet(out).collect()}

        builtin = run(lambda s: s.dropDuplicates(["image_id"]), f"{d}/o1", f"{d}/c1")
        custom = run(lambda s: dedup_stream(s, n_buckets=4), f"{d}/o2", f"{d}/c2")
        assert builtin == custom == {"a", "b", "c"}
