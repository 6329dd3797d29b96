"""Pixel-level invariants: decode, dimension agreement, PSNR vs reference.

The only Python on the engine's hot path, and it is Arrow-batched: one
``mapInPandas`` over (image_id, bytes, w, h, part) yields a compact
per-row result frame (no pixels leave the UDF). Batches arrive as pandas
DataFrames via Arrow; the per-image numpy work (inflate + PSNR) is the
irreducible payload cost a real codec would also pay.

At cluster scale this stage is the only one that reads the ``bytes``
column, so it is planned as its own scan (column pruning keeps the
stats/uniqueness passes blob-free) and parallelism follows bytes size via
``spark.sql.files.maxPartitionBytes``, not row count.

Reference analog: P3 — the per-row payload-specific scalar function
(SchemaGenerator.java:46-54) — re-targeted from JSON-schema trees to
pixel invariants per BASELINE.json input_hint.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schema_inference_spark.datagen import codec

PIXEL_RESULT_SCHEMA = (
    "image_id string, part int, w int, h int, "
    "decode_ok boolean, actual_w int, actual_h int, psnr_db double"
)


def _check_batch(batch: pd.DataFrame) -> pd.DataFrame:
    n = len(batch)
    decode_ok = np.zeros(n, dtype=bool)
    actual_w = np.full(n, -1, dtype=np.int32)
    actual_h = np.full(n, -1, dtype=np.int32)
    psnr_db = np.full(n, np.nan, dtype=np.float64)
    for i, (image_id, buf) in enumerate(zip(batch["image_id"].values, batch["bytes"].values)):
        try:
            w, h, px = codec.decode_image(buf)
        except (ValueError, struct.error, zlib.error):
            continue
        decode_ok[i] = True
        actual_w[i], actual_h[i] = w, h
        ref = codec.reference_pixels(image_id, w, h)
        psnr_db[i] = codec.psnr(px, ref)
    return pd.DataFrame(
        {
            "image_id": batch["image_id"].values,
            "part": batch["part"].values,
            "w": batch["w"].values,
            "h": batch["h"].values,
            "decode_ok": decode_ok,
            "actual_w": actual_w,
            "actual_h": actual_h,
            "psnr_db": psnr_db,
        }
    )


def pixel_check_results(images: DataFrame, part_col: str = "part") -> DataFrame:
    """Per-row pixel check results (compact, no pixel data).

    Declared (w, h) are echoed through the UDF so no join back to the table
    is needed — the blob column is read exactly once and the comparison
    columns ride along in the same Arrow batches.
    """
    narrow = images.select("image_id", "bytes", "w", "h", F.col(part_col).alias("part"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _check_batch(batch)

    return narrow.mapInPandas(run, schema=PIXEL_RESULT_SCHEMA)


def pixel_violations(
    images: DataFrame, psnr_min_db: float = 40.0, part_col: str = "part"
) -> DataFrame:
    """Violation rows for the three pixel invariants in ONE pass.

    The three checks are emitted as an array of optional structs and
    exploded — one UDF scan (one decode per image), no union of branches
    that would each re-run the decode.
    """
    r = pixel_check_results(images, part_col)
    decode_v = F.when(
        ~F.col("decode_ok"),
        F.struct(
            F.lit("pixel_decode").alias("check_name"),
            F.to_json(F.struct(F.lit("decode failed").alias("reason"))).alias("detail"),
        ),
    )
    dims_v = F.when(
        F.col("decode_ok")
        & ((F.col("actual_w") != F.col("w")) | (F.col("actual_h") != F.col("h"))),
        F.struct(
            F.lit("pixel_dims").alias("check_name"),
            F.to_json(F.struct("w", "h", "actual_w", "actual_h")).alias("detail"),
        ),
    )
    psnr_v = F.when(
        F.col("decode_ok") & (F.col("psnr_db") < psnr_min_db),
        F.struct(
            F.lit("pixel_psnr").alias("check_name"),
            F.to_json(F.struct(F.round("psnr_db", 2).alias("psnr_db"))).alias("detail"),
        ),
    )
    # explode + codegen WHERE, not an interpreted filter() lambda (hot path)
    viols = F.array(decode_v, dims_v, psnr_v)
    return r.select("part", "image_id", F.explode(viols).alias("v")).where(
        F.col("v").isNotNull()
    ).select(
        "part", F.col("v.check_name").alias("check_name"), "image_id", F.col("v.detail").alias("detail")
    )
