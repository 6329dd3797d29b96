"""Distribution-drift tests (PSI + KS) over fixed-edge histograms.

The analog of the reference's profile-vs-snapshot comparison
(SeqScanAsJson.java:66-77 re-reads the persisted distinct-schema profile;
CompareMaps diffs two profiles). Here the persisted artifact is the
per-partition histogram profile (operators/profile.py) and the comparison
is fully relational:

  explode both histogram arrays -> join on (part, column, bucket) ->
  normalize -> PSI = sum((p-q)*ln(p/q)) and KS = max |cdf_p - cdf_q|
  (running sums via a bucket-ordered window *within* each tiny
  (part, column) group — never a global window).

Histogram tables are tiny (parts x columns x buckets), so this stage costs
nothing at any scale; the expensive part (the histogram build) already
happened inside the single-pass profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6

DEFAULT_DRIFT_COLS = ("w_hist", "h_hist", "phash_hist")


def _explode_hists(profile: DataFrame, hist_cols: tuple[str, ...], side: str) -> DataFrame:
    # ONE pass over the profile: every histogram column becomes an array of
    # (column, bucket, cnt) structs, concatenated and exploded together.
    # (A union of per-column explodes would re-execute the upstream profile
    # aggregation once per histogram column.)
    def entries(hc: str):
        return F.transform(
            F.sequence(F.lit(0), F.size(hc) - 1),
            lambda i: F.struct(
                F.lit(hc).alias("column"),
                i.alias("bucket"),
                F.element_at(F.col(hc), i + 1).alias("cnt"),
            ),
        )

    per_col = [entries(hc) for hc in hist_cols]
    return profile.select("part", F.explode(F.concat(*per_col)).alias("e")).select(
        "part",
        F.col("e.column").alias("column"),
        F.col("e.bucket").alias("bucket"),
        F.col("e.cnt").alias(f"cnt_{side}"),
    )


def drift_scores(
    current: DataFrame,
    snapshot: DataFrame,
    hist_cols: tuple[str, ...] = DEFAULT_DRIFT_COLS,
) -> DataFrame:
    """DataFrame[part, column, psi, ks] comparing current vs snapshot."""
    cur = _explode_hists(current, hist_cols, "p")
    snap = _explode_hists(snapshot, hist_cols, "q")
    j = cur.join(snap, ["part", "column", "bucket"], "inner")

    grp = Window.partitionBy("part", "column")
    ordered = grp.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    j = (
        j.withColumn("p", (F.col("cnt_p") + EPS) / (F.sum("cnt_p").over(grp) + EPS * 16))
        .withColumn("q", (F.col("cnt_q") + EPS) / (F.sum("cnt_q").over(grp) + EPS * 16))
        .withColumn("cdf_p", F.sum("p").over(ordered))
        .withColumn("cdf_q", F.sum("q").over(ordered))
    )
    return j.groupBy("part", "column").agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi"),
        F.max(F.abs(F.col("cdf_p") - F.col("cdf_q"))).alias("ks"),
    )


def drift_verdicts(
    current: DataFrame,
    snapshot: DataFrame,
    psi_threshold: float = 0.25,
    ks_threshold: float = 0.25,
    hist_cols: tuple[str, ...] = DEFAULT_DRIFT_COLS,
) -> DataFrame:
    """Per (part, column) drift verdict rows:
    (part, check_name, passed, psi, ks)."""
    scores = drift_scores(current, snapshot, hist_cols)
    return scores.select(
        "part",
        F.concat(F.lit("drift_"), F.col("column")).alias("check_name"),
        ((F.col("psi") <= psi_threshold) & (F.col("ks") <= ks_threshold)).alias("passed"),
        F.round("psi", 6).alias("psi"),
        F.round("ks", 6).alias("ks"),
    )
