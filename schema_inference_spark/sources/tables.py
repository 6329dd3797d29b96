"""Columnar table sources.

The reference scanned schemaless SequenceFiles + text files
(SeqFilesScan.java:202-233); this engine's sources are columnar parquet
(Iceberg-shaped: fixed schema, partition-prunable). Catalyst gives predicate
pushdown + column pruning for free — the profiling pass must never read the
``bytes`` payload column unless pixel checks run, which the parquet reader
guarantees via ReadSchema pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table from a scale-factor directory."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load tables and (optionally) register them as temp views for SQL."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
