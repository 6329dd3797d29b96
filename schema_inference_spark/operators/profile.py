"""Single-pass per-partition column profiling.

The reference needed three full passes (count at SeqFilesScan.java:284,
reduceByKey at :297-316, plus debug counts) because RDD lineage recomputes.
Here the whole profile — row counts, per-column null counts, min/max,
approx distinct (HLL), and fixed-edge histograms for w/h/phash — is ONE
``groupBy(part).agg(...)`` with partial+final hash aggregation: every
statistic is a commutative partial aggregate, so the pass is
treeAggregate-shaped and never materializes per-row state.

Histogram edges are fixed and deterministic (FIXTURES.md §3) so drift
comparisons are stable across partitionings and scale factors.

Crucially, the profile never touches ``bytes`` — parquet column pruning
keeps the scan to the narrow columns (verified in tests via the physical
plan's ReadSchema).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class HistogramSpec:
    """Fixed-width histogram: ``n_buckets`` buckets over [lo, hi); values
    outside clamp to the edge buckets so counts always total n_rows."""

    column: str
    lo: float
    hi: float
    n_buckets: int = 16

    def bucket_expr(self) -> Column:
        width = (self.hi - self.lo) / self.n_buckets
        raw = F.floor((F.col(self.column) - F.lit(self.lo)) / F.lit(width))
        return F.least(F.lit(self.n_buckets - 1), F.greatest(F.lit(0), raw)).cast("int")

    def hist_agg(self) -> Column:
        bucket = self.bucket_expr()
        counts = [
            F.sum(F.when(bucket == b, F.lit(1)).otherwise(F.lit(0))).cast("long")
            for b in range(self.n_buckets)
        ]
        return F.array(*counts).alias(f"{self.column}_hist")


# default specs for the north-rule table; phash bucketed by its top 4 bits
DEFAULT_HISTOGRAMS = (
    HistogramSpec("w", 0.0, 128.0, 16),
    HistogramSpec("h", 0.0, 128.0, 16),
)
PHASH_BUCKETS = 16


def phash_hist_agg(n_buckets: int = PHASH_BUCKETS) -> Column:
    # 60-bit phash -> top-4-bit bucket (deterministic, order-free)
    bucket = F.shiftrightunsigned(F.col("phash"), 56).cast("int")
    counts = [
        F.sum(F.when(bucket == b, F.lit(1)).otherwise(F.lit(0))).cast("long")
        for b in range(n_buckets)
    ]
    return F.array(*counts).alias("phash_hist")


def profile_table(
    df: DataFrame, numeric_cols: list[str] | None = None, exact_distinct: bool = False
) -> DataFrame:
    """Generic long-format single-pass profile for ANY table:
    one row per (column, metric): n_rows / n_null / n_distinct for every
    column, min / max for numeric columns. All metrics are commutative
    partials -> one aggregation; values are DOUBLE (exact for counts <2^53
    and for double/int source columns) so the DuckDB oracle produces the
    bit-identical float64 — DECIMAL outputs hash differently per engine.
    (The image-specific ``profile_images`` keeps its wide,
    histogram-bearing shape; this is the open API for arbitrary tables.)

    HLL (approx_count_distinct) is the DEFAULT for n_distinct — the scale
    path: exact multi-column distinct plans EXPAND the input once per
    distinct column, HLL keeps the pass at one sketch per column with no
    expansion (plan-asserted in test_plan_shapes). ``exact_distinct=True``
    is the opt-in for oracle-exact comparisons at test scale.
    """
    if numeric_cols is None:
        numeric_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("int", "bigint", "double", "float", "decimal")
        ]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in df.columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__null__{c}")
        )
        dist = (
            F.countDistinct(F.col(c)) if exact_distinct else F.approx_count_distinct(F.col(c))
        )
        aggs.append(dist.alias(f"__dist__{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__min__{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__max__{c}"))
    wide = df.agg(*aggs)

    entries = [
        F.struct(F.lit(c).alias("column"), F.lit(m).alias("metric"),
                 F.col(f"__{tag}__{c}").cast("double").alias("value"))
        for c in df.columns
        for m, tag in (("n_null", "null"), ("n_distinct", "dist"))
    ]
    entries += [
        F.struct(F.lit(c).alias("column"), F.lit(m).alias("metric"),
                 F.col(f"__{tag}__{c}").cast("double").alias("value"))
        for c in numeric_cols
        for m, tag in (("min", "min"), ("max", "max"))
    ]
    entries.append(
        F.struct(F.lit("*").alias("column"), F.lit("n_rows").alias("metric"),
                 F.col("__n_rows").cast("double").alias("value"))
    )
    return wide.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.column", "e.metric", "e.value"
    )


def profile_images(
    images: DataFrame,
    part_col: str = "part",
    histograms: tuple[HistogramSpec, ...] = DEFAULT_HISTOGRAMS,
) -> DataFrame:
    """Per-partition profile DataFrame — one row per partition, one pass.

    Columns: n_rows, null_<col> for every non-part column, min/max/avg of
    w+h, approx-distinct fmt & phash (HLL, per north_rule), histograms.
    """
    stat_cols = [c for c in images.columns if c != part_col]
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"null_{c}")
        for c in stat_cols
        if c != "bytes"  # bytes nullness via IS NULL would force reading the blob column
    ]
    for c in ("w", "h"):
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    aggs += [
        F.approx_count_distinct("fmt").alias("distinct_fmt_est"),
        F.approx_count_distinct("phash").alias("distinct_phash_est"),
        F.approx_count_distinct("image_id").alias("distinct_image_id_est"),
    ]
    aggs += [spec.hist_agg() for spec in histograms]
    aggs.append(phash_hist_agg())
    return images.groupBy(part_col).agg(*aggs)
