"""Incremental rollup maintenance: merge-of-deltas == full recompute, exactly."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from schema_inference_spark.plans.rollup import (
    hourly_delta_aggregate,
    read_rollup,
    refresh_hourly_rollup,
)
from schema_inference_spark.sources.tables import load_table


def test_incremental_refresh_equals_full_recompute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # three deltas split by event_id hash — overlapping hours across deltas
    deltas = [ev.where(F.pmod(F.col("event_id"), 3) == i) for i in range(3)]
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/rollup"
        for delta in deltas:
            refresh_hourly_rollup(spark, path, delta)
        incremental = {
            (r["hour_epoch"], r["event_type"]): (r["n"], r["sum_value"])
            for r in read_rollup(spark, path).collect()
        }
    full = {
        (r["hour_epoch"], r["event_type"]): (
            r["n"],
            float(r["sum_value"]) if r["sum_value"] is not None else None,
        )
        for r in hourly_delta_aggregate(ev).collect()
    }
    assert set(incremental) == set(full)
    for k, (n, s) in full.items():
        ni, si = incremental[k]
        assert ni == n, k
        assert si == s, k  # decimal-exact: no float drift across merge order


def test_refresh_touches_only_rollup_grain(spark, sf_dir):
    """The merge reads the STORED ROLLUP (hours x types), never the raw
    history: its plan scans the rollup parquet + the delta, nothing else."""
    ev = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/rollup"
        refresh_hourly_rollup(spark, path, ev.where(F.col("event_id") % 2 == 0))
        before = spark.read.parquet(path).count()
        second = ev.where(F.col("event_id") % 2 == 1)
        out = refresh_hourly_rollup(spark, path, second)
        # grain = union of bucket keys across deltas, nothing more
        expected_buckets = (
            hourly_delta_aggregate(ev).select("hour_epoch", "event_type").distinct().count()
        )
        assert before <= out.count() == expected_buckets


def test_streaming_ingest_refreshes_rollup(spark, sf_dir):
    """§2.9 composition: a micro-batched stream drives refresh_hourly_rollup
    through foreachBatch; the final rollup equals the batch aggregate of
    everything ingested (decimal-exact, any batch boundaries)."""
    import tempfile

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events", parallelize=False)
    with tempfile.TemporaryDirectory() as d:
        ev.repartition(5).write.parquet(f"{d}/in")  # several files = several batches
        stream = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", 2
        ).parquet(f"{d}/in")

        def _refresh(batch_df, _epoch):
            if not batch_df.isEmpty():
                refresh_hourly_rollup(spark, f"{d}/rollup", batch_df)

        q = (
            stream.writeStream.foreachBatch(_refresh)
            .option("checkpointLocation", f"{d}/ck")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180) and q.exception() is None

        got = {
            (r["hour_epoch"], r["event_type"]): (r["n"], r["sum_value"])
            for r in read_rollup(spark, f"{d}/rollup").collect()
        }
    want = {
        (r["hour_epoch"], r["event_type"]): (
            r["n"],
            float(r["sum_value"]) if r["sum_value"] is not None else None,
        )
        for r in hourly_delta_aggregate(ev).collect()
    }
    assert got == want
