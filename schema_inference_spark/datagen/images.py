"""Deterministic image+caption corpus generator with planted violations.

The analog of the reference repo's golden fixtures (fvalues.txt +
data/distinct/part-*.json): the generator is itself the oracle — it plants
violations at deterministic indices AND simulates every check in plain
Python over the rows it produced, so the expected verdict/violation tables
are exact, not hand-maintained.

Planted defect classes (FIXTURES.md §1):
  * duplicate image_id rows (uniqueness)
  * one HOT phash covering ~1/3 of rows (skew, mirroring the reference's
    34% hot schema, data/distinct/part-00000…json:1) + natural phash dups
  * null / out-of-domain fmt, nonpositive + mismatched declared w/h
  * truncated payloads (decode failure), low-quality lossy encodes
    (PSNR < 40 dB), caption nulls / mismatches / orphans on both sides
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from schema_inference_spark.datagen import codec

FMT_DOMAIN = ("png", "jpeg", "webp")
HOT_PHASH = 0x0DEADBEEFCAFE000  # planted hot key (~34% of rows)

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("part", T.IntegerType(), False),
    ]
)

CAPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("part", T.IntegerType(), False),
    ]
)

_WORDS = ("amber", "bridge", "copper", "dawn", "ember", "forest", "gale", "harbor")


@dataclass
class ImageCorpus:
    images: pd.DataFrame
    captions: pd.DataFrame
    n_parts: int
    # check_name -> sorted list of violating image_ids (per the generator's
    # own plain-Python simulation of each check)
    expected: dict[str, list[str]] = field(default_factory=dict)


def _caption_for(image_id: str, i: int) -> str:
    return f"{_WORDS[i % 8]} {_WORDS[(i // 8) % 8]} scene of {image_id}"


def generate_image_corpus(
    n: int = 2000, n_parts: int = 8, with_violations: bool = True, drift_scale: float = 1.0
) -> ImageCorpus:
    """Generate the corpus. ``drift_scale`` scales w/h (for drift fixtures:
    a scale of ~1.5 must trip the KS/PSI drift check; 1.0 must not)."""
    rows = []
    caption_rows = []
    for i in range(n):
        image_id = f"img-{i:012d}"
        dup_of_prev = with_violations and i % 101 == 100
        if dup_of_prev:
            prev = rows[-1]
            rows.append({**prev, "part": i % n_parts})
            # the duplicated id keeps its original caption row (emitted for prev)
            continue

        w = int((8 + (i % 4) * 8) * drift_scale)
        h = int((8 + ((i + 1) % 4) * 8) * drift_scale)
        fmt = FMT_DOMAIN[i % 3]
        quality = codec.GOOD_QUALITY_STEP
        if with_violations:
            if i % 89 == 7:
                fmt = None
            elif i % 89 == 21:
                fmt = "tiff"
            if i % 79 == 37:
                fmt, quality = "jpeg", codec.BAD_QUALITY_STEP

        px = codec.reference_pixels(image_id, w, h)
        enc_fmt = fmt if fmt in ("png", "jpeg", "webp") else "png"
        buf = codec.encode_image(px, enc_fmt, quality)
        phash = codec.phash_of(px)
        declared_w, declared_h = w, h
        caption = _caption_for(image_id, i)
        img_caption = caption

        if with_violations:
            if i % 3 == 0:
                phash = HOT_PHASH
            if i % 83 == 11:
                declared_w = w + 3
            elif i % 83 == 47:
                declared_w = 0
            if i % 79 == 13:
                buf = buf[:7]
            if i % 73 == 5:
                img_caption = caption + " (edited)"
            elif i % 73 == 29:
                img_caption = None

        rows.append(
            {
                "image_id": image_id,
                "bytes": buf,
                "w": declared_w,
                "h": declared_h,
                "fmt": fmt,
                "caption": img_caption,
                "phash": phash,
                "part": i % n_parts,
            }
        )
        if not (with_violations and i % 71 == 9):  # orphan image: no caption row
            caption_rows.append({"image_id": image_id, "caption": caption, "part": i % n_parts})

    if with_violations:  # orphan captions: rows with no image
        for j in range(max(1, n // 71)):
            caption_rows.append(
                {"image_id": f"img-extra-{j:06d}", "caption": f"orphan caption {j}", "part": j % n_parts}
            )

    images = pd.DataFrame(rows)
    captions = pd.DataFrame(caption_rows)
    corpus = ImageCorpus(images=images, captions=captions, n_parts=n_parts)
    corpus.expected = _simulate_checks(images, captions)
    return corpus


def _simulate_checks(images: pd.DataFrame, captions: pd.DataFrame) -> dict[str, list[str]]:
    """Plain-Python oracle: run every check over the generated rows."""
    exp: dict[str, list[str]] = {}
    exp["domain_fmt"] = sorted(images.loc[~images.fmt.isin(FMT_DOMAIN), "image_id"])
    exp["domain_dims"] = sorted(images.loc[(images.w <= 0) | (images.h <= 0), "image_id"])
    exp["null_caption"] = sorted(images.loc[images.caption.isna(), "image_id"])

    id_counts = images.image_id.value_counts()
    exp["unique_image_id"] = sorted(id_counts[id_counts > 1].index)
    ph_counts = images.phash.value_counts()
    dup_ph = set(ph_counts[ph_counts > 1].index)
    exp["unique_phash"] = sorted(images.loc[images.phash.isin(dup_ph), "image_id"].unique())

    cap_ids = set(captions.image_id)
    img_ids = set(images.image_id)
    exp["ref_orphan_image"] = sorted(img_ids - cap_ids)
    exp["ref_orphan_caption"] = sorted(cap_ids - img_ids)

    merged = images.merge(captions, on="image_id", suffixes=("", "_ref"))
    mism = merged[merged.caption.isna() | (merged.caption != merged.caption_ref)]
    exp["caption_equality"] = sorted(mism.image_id.unique())

    decode_fail, dims_mismatch, low_psnr = [], [], []
    for row in images.itertuples():
        try:
            aw, ah, px = codec.decode_image(row.bytes)
        except ValueError:
            decode_fail.append(row.image_id)
            continue
        if (aw, ah) != (row.w, row.h):
            dims_mismatch.append(row.image_id)
        ref = codec.reference_pixels(row.image_id, aw, ah)
        if codec.psnr(px, ref) < 40.0:
            low_psnr.append(row.image_id)
    exp["pixel_decode"] = sorted(set(decode_fail))
    exp["pixel_dims"] = sorted(set(dims_mismatch))
    exp["pixel_psnr"] = sorted(set(low_psnr))
    return exp


def simulate_violation_rows(
    images: pd.DataFrame, captions: pd.DataFrame, psnr_min_db: float = 40.0
) -> pd.DataFrame:
    """Plain-pandas simulation of the engine's violation TABLE — one row per
    violation row plans/validation.py emits, with matching row multiplicity
    and part attribution (a duplicated image_id yields one row per physical
    row; orphan captions carry the caption row's part). This is the
    independent recomputation behind the image suite's DuckDB oracle
    (VERDICT r2 #2): the engine's distributed joins/aggregations are
    hash-compared against it by the driver."""
    import struct
    import zlib

    out: list[tuple[int, str, str]] = []

    def add(sel: pd.DataFrame, check: str) -> None:
        out.extend((int(p), check, i) for p, i in zip(sel["part"], sel["image_id"]))

    add(images[~images.fmt.isin(FMT_DOMAIN)], "domain_fmt")  # isin(None) is False
    add(images[images.w.isna() | images.h.isna() | (images.w <= 0) | (images.h <= 0)],
        "domain_dims")
    add(images[images.caption.isna()], "null_caption")

    id_counts = images.image_id.value_counts()
    add(images[images.image_id.map(id_counts) > 1], "unique_image_id")
    ph_counts = images.phash.value_counts()
    add(images[images.phash.map(ph_counts) > 1], "unique_phash")

    add(images[~images.image_id.isin(set(captions.image_id))], "ref_orphan_image")
    add(captions[~captions.image_id.isin(set(images.image_id))], "ref_orphan_caption")

    merged = images[["image_id", "caption", "part"]].merge(
        captions[["image_id", "caption"]].rename(columns={"caption": "ref_caption"}),
        on="image_id",
    )
    null_safe_eq = (merged.caption == merged.ref_caption) | (
        merged.caption.isna() & merged.ref_caption.isna()
    )
    add(merged[~null_safe_eq], "caption_equality")

    for row in images.itertuples():
        try:
            aw, ah, px = codec.decode_image(row.bytes)
        except (ValueError, struct.error, zlib.error):
            out.append((int(row.part), "pixel_decode", row.image_id))
            continue
        if (aw, ah) != (row.w, row.h):
            out.append((int(row.part), "pixel_dims", row.image_id))
        if codec.psnr(px, codec.reference_pixels(row.image_id, aw, ah)) < psnr_min_db:
            out.append((int(row.part), "pixel_psnr", row.image_id))

    return pd.DataFrame(out, columns=["part", "check_name", "image_id"]).astype(
        {"part": "int32"}
    )


def _datagen_version() -> str:
    """Content hash of the generator sources (this module + the codec it
    delegates to): any edit to the corpus recipe or the violation
    simulation invalidates the cached oracle side tables automatically —
    a fixed 'v1' token silently served round-old expectations after a
    datagen change, producing unexplainable driver hash failures."""
    import hashlib
    import os

    h = hashlib.md5()
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        for fname in ("images.py", "codec.py"):
            with open(os.path.join(here, fname), "rb") as f:
                h.update(f.read())
    except OSError:
        # zipimport (--py-files) deploys have no readable source path; the
        # oracle cache is a driver/test-side concern, so a stable token is
        # fine there
        return "zipdeploy"
    return h.hexdigest()[:10]


def image_oracle_dir(n: int, n_parts: int) -> str:
    return f"/tmp/spark_graft_image_oracle/{_datagen_version()}_n{n}_p{n_parts}"


def write_image_oracle_tables(n: int = 2000, n_parts: int = 8) -> str:
    """Materialize the generator's expectations as parquet for the DuckDB
    oracle: ``images_meta.parquet`` / ``captions_meta.parquet`` (the corpus
    minus the bytes blob — DuckDB recomputes every SQL-expressible check
    from these) and ``expected_violations.parquet`` (one row per expected
    violation row; the oracle takes only the pixel_* rows, which SQL cannot
    recompute, from here). Memoized on file existence; atomic (tmp +
    rename) so concurrent callers never read a partial file. Returns the
    directory."""
    import os

    d = image_oracle_dir(n, n_parts)
    paths = {
        "images_meta": f"{d}/images_meta.parquet",
        "captions_meta": f"{d}/captions_meta.parquet",
        "expected_violations": f"{d}/expected_violations.parquet",
    }
    if all(os.path.exists(p) for p in paths.values()):
        return d
    os.makedirs(d, exist_ok=True)
    corpus = generate_image_corpus(n, n_parts=n_parts)
    frames = {
        "images_meta": corpus.images.drop(columns=["bytes"]).astype(
            {"w": "int32", "h": "int32", "part": "int32", "phash": "int64"}
        ),
        "captions_meta": corpus.captions.astype({"part": "int32"}),
        "expected_violations": simulate_violation_rows(corpus.images, corpus.captions),
    }
    pid = os.getpid()
    for key, path in paths.items():
        frames[key].to_parquet(f"{path}.tmp{pid}", index=False)
        os.replace(f"{path}.tmp{pid}", path)
    return d


def images_spark_df(spark: SparkSession, corpus: ImageCorpus) -> tuple[DataFrame, DataFrame]:
    """Materialize the corpus as Spark DataFrames with the fixed input_hint
    schema (plus the ``part`` partition column)."""
    images = spark.createDataFrame(corpus.images, schema=IMAGES_SCHEMA)
    captions = spark.createDataFrame(corpus.captions, schema=CAPTIONS_SCHEMA)
    return images, captions
