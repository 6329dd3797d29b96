"""Two-level IVF — the nlist-at-10^12 shape from SCALE.md ("sqrt(n)=10^6
centroids is beyond one k-means job's comfort; train two-level (coarse
10^3 x fine 10^3)"). Until r5 that was a design note; this module is the
kernel.

Structure: a driver-side coarse k-means (kmeans_train — k_coarse stays
small by construction) assigns every vector a ``coarse_id``; fine
centroids are then trained PER COARSE PARTITION in one
``groupBy(coarse_id).applyInPandas`` pass (the same distributed-training
shape as the PQ codebooks: deterministic hash-ordered sample, rows
sorted before any float fold, so fine centroids are bit-identical under
any physical layout). The persisted table is partitioned by
``(coarse_id, fine_id)`` — nlist = k_coarse x k_fine partitions while no
single k-means ever sees more than one partition's sample, and the
two-key layout bounds per-file row counts for the Iceberg spec exactly
as SCALE.md prescribes.

Query: pick ``n_probe_coarse`` coarse centroids driver-side, read ONLY
their fine-centroid rows (a k_coarse x k_fine table at most — tiny),
pick the best ``n_probe`` (coarse, fine) cells globally by cosine, and
scan just those cells (an OR-of-equalities predicate Spark turns into
partition pruning on both keys), exact brute-force within. Assignment
ties break to the lowest fine_id (np.argmax first-max), mirroring
ivf_assignments' rule.

Public provenance: hierarchical (two-level) coarse quantization is the
standard answer to nlist >> one k-means job — cf. the residual/2-level
coarse quantizers in the IVF literature (Jegou et al. TPAMI 2011 §V;
FAISS's IVF-on-IVF composite indexes). Reference provenance: the
reference engine has no ANN surface; the
persisted build-once/query-many lifecycle extends build_ivf_index
(operators/similarity.py), seeded by the reference's persisted-output
re-analysis pattern (SeqScanAsJson.java:66-77).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from schema_inference_spark.operators.pq import _kmeans_1sub
from schema_inference_spark.operators.similarity import (
    _stack_rows,
    cosine_topk,
    ivf_assignments,
    kmeans_train,
)

FINE_SCHEMA = "coarse_id int, fine_id int, centroid array<double>"


def train_fine_centroids(
    assigned: DataFrame,
    k_fine: int = 8,
    max_iter: int = 6,
    train_sample: int = 200_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-coarse-partition fine k-means in one grouped Arrow pass.

    Output rows: (coarse_id, fine_id, centroid). Each group samples up to
    ``train_sample`` rows by md5(id) order and runs the deterministic
    Lloyd's kernel over FULL vectors (``_kmeans_1sub`` is
    dimension-generic); a group with fewer distinct vectors than k_fine
    repeats its last distinct point in the tail centroids (those cells
    simply stay empty at assignment)."""

    def _train(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        cid = int(pdf["coarse_id"].iloc[0])
        keys = pdf[id_col].map(
            lambda x: hashlib.md5(str(x).encode()).hexdigest()
        )
        order = np.lexsort((pdf[id_col].values, keys.values))
        pts = _stack_rows(pdf[vec_col].values[order[:train_sample]]).astype(
            np.float64
        )
        cb = _kmeans_1sub(pts, k_fine, max_iter)
        return pd.DataFrame(
            [(cid, f, cb[f].astype(np.float64).tolist()) for f in range(k_fine)],
            columns=["coarse_id", "fine_id", "centroid"],
        )

    return (
        assigned.select("coarse_id", id_col, vec_col)
        .groupBy("coarse_id")
        .applyInPandas(_train, FINE_SCHEMA)
    )


def _fine_to_dict(rows) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """{coarse_id: (fine_id array, unit-row centroid matrix)} — tie rule
    is argmax-first over the fine_id-sorted rows (lowest fine_id wins)."""
    by_cid: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        by_cid.setdefault(r["coarse_id"], []).append(
            (r["fine_id"], list(r["centroid"]))
        )
    out = {}
    for cid, pairs in by_cid.items():
        pairs.sort()
        fids = np.asarray([f for f, _ in pairs], dtype=np.int32)
        mat = np.asarray([v for _, v in pairs], dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        out[cid] = (fids, mat / norms[:, None])
    return out


def fine_assignments(
    assigned: DataFrame,
    fine: dict[int, tuple[np.ndarray, np.ndarray]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each coarse-assigned vector its max-cosine fine centroid —
    one Arrow projection (per-row norms cancel in the argmax, same
    argument as ivf_assignments' GEMM path)."""

    @pandas_udf("int")
    def _assign(cid_s: pd.Series, vec_s: pd.Series) -> pd.Series:
        n = len(vec_s)
        if n == 0:
            return pd.Series([], dtype="int32")
        mat = _stack_rows(vec_s.values).astype(np.float64)
        out = np.empty(n, dtype=np.int32)
        for cid in pd.unique(cid_s):
            idx = np.nonzero((cid_s == cid).values)[0]
            fids, cmat = fine[int(cid)]
            out[idx] = fids[np.argmax(mat[idx] @ cmat.T, axis=1)]
        return pd.Series(out)

    return assigned.withColumn(
        "fine_id", _assign(F.col("coarse_id"), F.col(vec_col))
    )


def build_ivf2_index(
    df: DataFrame,
    path: str,
    k_coarse: int = 4,
    k_fine: int = 4,
    max_iter: int = 6,
    fine_max_iter: int = 6,
    train_sample: int = 200_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the two-level index: vectors/ partitioned by
    (coarse_id, fine_id), coarse centroids/, fine_centroids/."""
    from schema_inference_spark.sources.iceberg import write_table

    spark = df.sparkSession
    coarse = kmeans_train(df, k=k_coarse, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assignments(df, coarse, id_col, vec_col).withColumnRenamed(
        "centroid_id", "coarse_id"
    )
    fine_df = train_fine_centroids(
        assigned, k_fine=k_fine, max_iter=fine_max_iter,
        train_sample=train_sample, id_col=id_col, vec_col=vec_col,
    )
    write_table(fine_df, f"{path}/fine_centroids", mode="overwrite")
    fine = _fine_to_dict(spark.read.parquet(f"{path}/fine_centroids").collect())
    full = fine_assignments(assigned, fine, vec_col)
    write_table(
        full.select(id_col, vec_col, "coarse_id", "fine_id"),
        f"{path}/vectors", mode="overwrite",
        partition_by=("coarse_id", "fine_id"),
    )
    coarse_df = spark.createDataFrame(
        [(cid, vec) for cid, vec in coarse],
        "coarse_id int, centroid array<double>",
    )
    write_table(coarse_df, f"{path}/centroids", mode="overwrite")


def query_ivf2_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe_coarse: int = 2,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the best n_probe (coarse, fine) cells within the
    n_probe_coarse closest coarse centroids; scan only those partitions."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = math.sqrt(float((q * q).sum()))
    q_unit = q / qn if qn else q

    coarse = [
        (r["coarse_id"], np.asarray(r["centroid"], dtype=np.float64))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    ]

    def cos(c):
        n = math.sqrt(float((c * c).sum()))
        return float(q_unit @ c) / n if n else 0.0

    coarse_ids = [
        cid for cid, _ in sorted(coarse, key=lambda c: (-cos(c[1]), c[0]))[:n_probe_coarse]
    ]
    fine_rows = (
        spark.read.parquet(f"{path}/fine_centroids")
        .where(F.col("coarse_id").isin(coarse_ids))
        .collect()
    )
    cells = sorted(
        (
            (
                -cos(np.asarray(r["centroid"], dtype=np.float64)),
                r["coarse_id"],
                r["fine_id"],
            )
            for r in fine_rows
        ),
    )[:n_probe]
    pred = None
    for _, c, f_ in cells:
        clause = (F.col("coarse_id") == c) & (F.col("fine_id") == f_)
        pred = clause if pred is None else (pred | clause)
    vectors = spark.read.parquet(f"{path}/vectors").where(pred)
    return cosine_topk(vectors, query_vec, k, id_col, vec_col)
