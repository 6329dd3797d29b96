"""Iceberg source/sink adapter (jar-gated).

Production target per north_rule: the image table, results, and the
checkpoint/lineage tables live in Iceberg. The sandbox image carries no
Iceberg runtime jar, so every call degrades explicitly:

* ``iceberg_available(spark)`` — feature-detects the catalog classes;
* ``read_table`` / ``write_table`` — Iceberg when available, parquet-dir
  fallback otherwise (identical relational contract; the rest of the
  engine is storage-agnostic by construction).

The ONLY behavioral deltas at the storage layer, and where they land here:
  - MERGE INTO            -> plans/snapshot.py upsert emulation
  - snapshot time travel  -> snapshot_id column filtering
  - hidden partitioning   -> explicit ``part`` column
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """identifier: an Iceberg table name (catalog.db.tbl) or a parquet path."""
    if "/" not in identifier and iceberg_available(spark):
        return spark.read.format("iceberg").load(identifier)
    return spark.read.parquet(identifier)


def write_table(df: DataFrame, identifier: str, mode: str = "append") -> None:
    if "/" not in identifier and iceberg_available(df.sparkSession):
        writer = df.writeTo(identifier)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(identifier)
