"""Cross-micro-batch stateful dedup (applyInPandasWithState).

Note: the memory sink deadlocks with applyInPandasWithState in Spark 4.1.2
local mode (console/file sinks are fine), so this test uses a parquet sink
and drives batches by restarting an availableNow stream against the same
checkpoint — which also exercises state recovery across restarts.
"""

from __future__ import annotations

import tempfile

from schema_inference_spark.streaming.stateful_dedup import dedup_stream

SCHEMA = "image_id string, payload string"


def _run_once(spark, src, out, ck):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        dedup_stream(stream, n_buckets=4)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not terminate"
    assert q.exception() is None


def test_dedup_across_restarts_with_state(spark):
    with tempfile.TemporaryDirectory() as d:
        src, out, ck = f"{d}/src", f"{d}/out", f"{d}/ck"

        # batch 1: a, b (with an in-batch duplicate of a)
        spark.createDataFrame(
            [("a", "p1"), ("b", "p2"), ("a", "p1-dup")], SCHEMA
        ).write.mode("overwrite").parquet(src)
        _run_once(spark, src, out, ck)
        got1 = {(r["image_id"], r["payload"]) for r in spark.read.parquet(out).collect()}
        assert {i for i, _ in got1} == {"a", "b"}
        assert ("a", "p1") in got1  # first occurrence (ascending sort) won

        # batch 2 (new files, restarted stream, state recovered from ck):
        # re-delivery of 'a' is suppressed by recovered state; 'c' passes
        spark.createDataFrame([("a", "p1-again"), ("c", "p3")], SCHEMA).write.mode(
            "append"
        ).parquet(src)
        _run_once(spark, src, out, ck)
        rows = spark.read.parquet(out).collect()
        ids = sorted(r["image_id"] for r in rows)
        assert ids == ["a", "b", "c"]
        assert {r["payload"] for r in rows if r["image_id"] == "a"} == {"p1"}
