"""Declarative schema + value-domain checks.

The inversion of the reference's schema *inference*: the table schema is
declared (BASELINE.json input_hint), so the engine validates (a) the
DataFrame schema structurally against the declared StructType and (b) row
values against domain rules — all as pure filter expressions (codegen'd,
pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_mismatches(df: DataFrame, declared: T.StructType) -> list[str]:
    """Structural diff vs the declared schema: human-readable mismatch list
    (driver-side, metadata only — no data read)."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = {f.name: f.dataType.simpleString() for f in declared.fields}
    problems = []
    for name, dtype in expected.items():
        if name not in actual:
            problems.append(f"missing column {name}:{dtype}")
        elif actual[name] != dtype:
            problems.append(f"type mismatch {name}: declared {dtype}, actual {actual[name]}")
    for name in actual:
        if name not in expected:
            problems.append(f"unexpected column {name}:{actual[name]}")
    return problems


def domain_violations(
    images: DataFrame,
    fmt_domain: tuple[str, ...] = ("png", "jpeg", "webp"),
    part_col: str = "part",
) -> DataFrame:
    """fmt-domain + dimension-positivity + null-caption violations."""
    fmt_bad = images.where(
        F.col("fmt").isNull() | ~F.col("fmt").isin(*fmt_domain)
    ).select(
        F.col(part_col).alias("part"),
        F.lit("domain_fmt").alias("check_name"),
        "image_id",
        F.to_json(F.struct("fmt")).alias("detail"),
    )
    dims_bad = images.where(
        F.col("w").isNull() | F.col("h").isNull() | (F.col("w") <= 0) | (F.col("h") <= 0)
    ).select(
        F.col(part_col).alias("part"),
        F.lit("domain_dims").alias("check_name"),
        "image_id",
        F.to_json(F.struct("w", "h")).alias("detail"),
    )
    caption_null = images.where(F.col("caption").isNull()).select(
        F.col(part_col).alias("part"),
        F.lit("null_caption").alias("check_name"),
        "image_id",
        F.to_json(F.struct(F.lit("caption is null").alias("reason"))).alias("detail"),
    )
    return fmt_bad.unionByName(dims_bad).unionByName(caption_null)
