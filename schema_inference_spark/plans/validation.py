"""The full constraint-suite plan: the engine's flagship pipeline.

Generalizes the reference lifecycle (SeqFilesScan.java:282-373 — one
distributed aggregation, one evidence table, driver-side artifact emission)
into a constraint suite over the image+caption table:

  stats profile (1 pass, blob-free)  ─┐
  domain checks (filters)             ├─> violations (unionByName)
  uniqueness (agg + broadcast join)   │      + per-partition verdicts
  referential (anti joins)            │      + profile table
  caption equality (inner join)       │
  pixel invariants (Arrow UDF scan)  ─┘
  drift vs snapshot profile (tiny histogram join)

Everything stays distributed; the driver only sees verdict aggregates
(vs the reference's collectAsMap of every distinct schema,
SeqFilesScan.java:315). Violation rows generalize the reference's
schema+exemplar evidence table (SeqFilesScan.java:239-255) by keeping ALL
offending rows with the check name and a JSON detail payload.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_inference_spark.datagen.images import FMT_DOMAIN, IMAGES_SCHEMA
from schema_inference_spark.operators.domain import domain_violations, schema_mismatches
from schema_inference_spark.operators.drift import drift_verdicts
from schema_inference_spark.operators.pixels import pixel_violations
from schema_inference_spark.operators.profile import profile_images
from schema_inference_spark.operators.referential import (
    caption_equality_violations,
    orphan_violations,
)
from schema_inference_spark.operators.uniqueness import duplicate_row_violations

ROW_CHECKS = (
    "domain_fmt",
    "domain_dims",
    "null_caption",
    "unique_image_id",
    "unique_phash",
    "ref_orphan_image",
    "ref_orphan_caption",
    "caption_equality",
    "pixel_decode",
    "pixel_dims",
    "pixel_psnr",
)


@dataclass
class ValidationConfig:
    fmt_domain: tuple[str, ...] = FMT_DOMAIN
    psnr_min_db: float = 40.0
    psi_threshold: float = 0.25
    ks_threshold: float = 0.25
    check_pixels: bool = True
    broadcast_dup_keys: bool = True
    declared_schema = IMAGES_SCHEMA


@dataclass
class ValidationResult:
    verdicts: DataFrame  # (part, check_name, n_rows, n_violations, passed)
    violations: DataFrame  # (part, check_name, image_id, detail)
    profile: DataFrame  # per-partition stats/histograms
    schema_problems: list[str] = field(default_factory=list)

    def exemplars(self, k: int = 5) -> DataFrame:
        """Up to k deterministic exemplar image_ids per failing check — the
        reference's schema+sample evidence table (A5, SeqFilesScan.java:241)
        generalized, built hot-key-safe via salted two-phase collection
        (a check like unique_phash can flag 1/3 of the corpus)."""
        from schema_inference_spark.operators.salting import salted_exemplars

        return salted_exemplars(self.violations, "check_name", "image_id", k=k)


def collect_violations(
    images: DataFrame, captions: DataFrame, config: ValidationConfig
) -> DataFrame:
    """Union of all row-level violation tables (lazy)."""
    v = domain_violations(images, config.fmt_domain)
    v = v.unionByName(
        duplicate_row_violations(
            images, "image_id", "unique_image_id", broadcast_keys=config.broadcast_dup_keys
        )
    )
    v = v.unionByName(
        duplicate_row_violations(
            images, "phash", "unique_phash", broadcast_keys=config.broadcast_dup_keys
        )
    )
    v = v.unionByName(orphan_violations(images, captions, "ref_orphan_image"))
    v = v.unionByName(orphan_violations(captions, images, "ref_orphan_caption"))
    v = v.unionByName(caption_equality_violations(images, captions))
    if config.check_pixels:
        v = v.unionByName(pixel_violations(images, config.psnr_min_db))
    return v


def run_validation(
    spark: SparkSession,
    images: DataFrame,
    captions: DataFrame,
    config: ValidationConfig | None = None,
    snapshot_profile: DataFrame | None = None,
    materialize: bool = False,
) -> ValidationResult:
    """Build the suite. With ``materialize=True`` the violations table is
    persisted before the verdict aggregation, so consumers that trigger
    both (count violations AND read verdicts) pay for the scan pipeline
    once — the DataFrame analog of the reference's missing ``.persist()``
    (its count + reduceByKey recomputed the whole parse lineage twice,
    SeqFilesScan.java:284,297)."""
    config = config or ValidationConfig()
    schema_problems = []
    if config.declared_schema is not None:
        import pyspark.sql.types as T

        declared_data_cols = T.StructType(
            [f for f in config.declared_schema.fields if f.name != "part"]
        )
        schema_problems = schema_mismatches(images.drop("part"), declared_data_cols)

    profile = profile_images(images)
    violations = collect_violations(images, captions, config)
    if materialize:
        violations = violations.persist()
        if snapshot_profile is not None:
            # the profile feeds both the result and the drift comparison;
            # it is tiny (one row per partition) — cache it
            profile = profile.persist()

    # per-partition verdicts: parts x checks grid left-joined to violation
    # counts; the grid derives from the SAME part_rows aggregate (one scan,
    # not a distinct + a groupBy)
    checks = spark.createDataFrame([(c,) for c in ROW_CHECKS], "check_name string")
    part_rows = images.groupBy("part").agg(F.count(F.lit(1)).alias("n_rows"))
    grid = part_rows.select("part").crossJoin(F.broadcast(checks))
    counts = violations.groupBy("part", "check_name").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    verdicts = (
        grid.join(counts, ["part", "check_name"], "left")
        .join(part_rows, "part", "left")
        .select(
            "part",
            "check_name",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
            (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
        )
    )

    if snapshot_profile is not None:
        dv = drift_verdicts(
            profile,
            snapshot_profile,
            psi_threshold=config.psi_threshold,
            ks_threshold=config.ks_threshold,
        ).join(part_rows, "part", "left")
        verdicts = verdicts.unionByName(
            dv.select(
                "part",
                "check_name",
                F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                F.when(F.col("passed"), F.lit(0)).otherwise(F.lit(1)).alias("n_violations"),
                "passed",
            )
        )

    return ValidationResult(
        verdicts=verdicts,
        violations=violations,
        profile=profile,
        schema_problems=schema_problems,
    )
