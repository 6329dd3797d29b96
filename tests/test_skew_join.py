"""AQE skew-join activation: the engine's skew story isn't just config —
this test proves a hot-key sort-merge join actually gets split at runtime
('skew=true' in the final adaptive plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    # thresholds lowered so a local-scale hot partition qualifies as skewed
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_hot_key_join(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        # left: hot key 0 carries 50k wide rows (mirrors the 34% hot phash)
        left = spark.range(60000).select(
            F.when(F.col("id") < 50000, 0).otherwise(F.col("id") % 97).alias("key"),
            F.concat(F.lit("payload-"), F.col("id"), F.lit("x" * 64)).alias("payload"),
        )
        right = spark.range(97).select(
            F.col("id").alias("key"), F.concat(F.lit("dim-"), F.col("id")).alias("dim")
        )
        joined = left.join(right, "key")
        # execute THIS plan (count() builds a different tree and would leave
        # the join's adaptive plan unfinalized)
        assert len(joined.collect()) == 60000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
