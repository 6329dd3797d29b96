"""Dedup + similarity behavior on planted near-duplicates (the driver's
documents table has no dups, so recall is exercised here)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from schema_inference_spark.operators.dedup import (
    exact_duplicate_groups,
    jaccard_verified_pairs,
    lsh_candidate_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from schema_inference_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _doc(rng: random.Random, n: int = 40) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def doc_df(spark):
    rng = random.Random(42)
    rows = []
    for i in range(60):
        rows.append((f"d{i:03d}", _doc(rng)))
    # exact dup pair
    rows.append(("d900", rows[0][1]))
    # near dup: change 2 words out of 40 of doc d001
    base = rows[1][1].split()
    base[5], base[20] = "zulu", "yankee"
    rows.append(("d901", " ".join(base)))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_duplicates(doc_df):
    groups = exact_duplicate_groups(doc_df, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["ids"] == ["d000", "d900"]


def test_lsh_finds_planted_near_dups(doc_df):
    cands = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(doc_df, "doc_id", "text", n_perm=8, band_size=2).collect()
    }
    assert ("d000", "d900") in cands  # exact dup always collides
    assert ("d001", "d901") in cands  # 95%-similar docs collide in >=1 band


def test_jaccard_verification_scores(spark, doc_df):
    cands = lsh_candidate_pairs(doc_df, "doc_id", "text", n_perm=8, band_size=2)
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verified_pairs(doc_df, cands, "doc_id", "text", threshold=0.5).collect()
    }
    assert verified[("d000", "d900")] == 1.0
    assert 0.5 <= verified[("d001", "d901")] < 1.0
    # random-doc pairs must not be verified at 0.5
    assert all(a in ("d000", "d001") for a, _ in verified)


def test_simhash_near_pairs(doc_df):
    fps = simhash_fingerprints(doc_df, "doc_id", "text")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(fps, "doc_id", max_hamming=3).collect()
    }
    assert pairs[("d000", "d900")] == 0  # identical docs -> identical fingerprints


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = random.Random(7)
    rows = []
    for i in range(50):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in v], i % 3))
    # planted near-dup of vec 5 (tiny perturbation), same label
    v5 = list(rows[5][1])
    v5[0] += 0.01
    rows.append((500, v5, 5 % 3))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_self_and_near(emb_df):
    q = [float(x) for x in emb_df.where(F.col("vec_id") == 5).collect()[0]["embedding"]]
    top = cosine_topk(emb_df, q, k=3).collect()
    assert top[0]["vec_id"] == 5 and abs(top[0]["cosine_sim"] - 1.0) < 1e-9
    assert top[1]["vec_id"] == 500 and top[1]["cosine_sim"] > 0.999


def test_lsh_topk_contains_near_dup(emb_df):
    """SRP-LSH ANN: the planted near-dup shares the query's hyperplane
    bucket (near-identical vectors collide by construction), so the
    bucket-pruned search still returns it first."""
    from schema_inference_spark.operators import similarity as S

    q = [float(x) for x in emb_df.where(F.col("vec_id") == 5).collect()[0]["embedding"]]
    top = S.cosine_topk_lsh(emb_df, q, k=2).collect()
    assert [r["vec_id"] for r in top] == [5, 500]


def test_embedding_near_dup_pairs(emb_df):
    # default = SRP-LSH blocking (the scale path)
    pairs = embedding_near_dup_pairs(emb_df, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(5, 500)}
    # labeled blocking (the oracle variant) agrees here
    labeled = embedding_near_dup_pairs(emb_df, threshold=0.99, block="label").collect()
    assert {(r["id_a"], r["id_b"]) for r in labeled} == {(5, 500)}


def test_banded_srp_recall_moderate_similarity(spark):
    """The r3 recall gap, measured (VERDICT r3 #1): pairs planted at cosine
    0.92-0.95 — NOT the 0.99 near-identical pairs every earlier test used.
    A single 6-plane SRP bucket catches one with probability p(c)^6 ~ 0.44-
    0.53, so the pre-r4 default silently dropped about half of them. The
    banded default must reach recall(c) = 1-(1-p(c)^6)^6 >= 0.95 against
    the exact all-pairs ground truth, and the single-band form must stay
    measurably worse (proves this test can actually see the difference)."""
    import numpy as np

    from schema_inference_spark.operators import similarity as S

    rng = np.random.default_rng(1234)
    dim, n_pairs = 64, 200
    targets = [0.92, 0.935, 0.95]
    rows = []
    for i in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        c = targets[i % len(targets)]
        v = c * u + math.sqrt(1.0 - c * c) * w
        rows.append((i, [float(x) for x in u]))
        rows.append((10000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    truth = {(i, 10000 + i) for i in range(n_pairs)}
    # unplanted cosines concentrate at ~N(0, 1/64); threshold 0.9 keeps the
    # ground truth exactly the planted pairs (checked, not assumed):
    found = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    assert found <= truth, f"false positives: {sorted(found - truth)[:5]}"
    recall = len(found & truth) / n_pairs
    assert recall >= 0.95, f"banded SRP recall {recall:.3f} < 0.95"

    single = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=0.9, n_bands=1).collect()
    }
    single_recall = len(single & truth) / n_pairs
    assert single_recall < 0.80, (
        f"single-band recall {single_recall:.3f} — planted pairs too easy, "
        "test can no longer measure the banding win"
    )
    assert recall > single_recall


def test_srp_balances_where_fixed_coords_skew(spark):
    """The r3 SRP motivation, measured: on positive-mean correlated
    embeddings (the common shape of learned embeddings) every coordinate
    sign bit is 1, so the fixed-coordinate hash collapses ALL rows into one
    bucket; seeded random hyperplanes keep the buckets usable."""
    import math

    from schema_inference_spark.operators import similarity as S

    rows = [
        (i, [0.9 + 0.8 * math.sin(i * 0.7 + j * 1.3) for j in range(64)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    fixed = (
        df.select(S.sign_lsh_bucket_expr(F.col("embedding")).alias("b"))
        .groupBy("b").count().collect()
    )
    srp = S.srp_buckets(df).groupBy("bucket").count().collect()

    assert max(r["count"] for r in fixed) == 400  # total collapse
    assert len(srp) >= 4
    assert max(r["count"] for r in srp) <= 0.6 * 400


def test_srp_bucket_spark_duckdb_parity(spark):
    """The Spark Arrow kernel and the DuckDB SQL literal form must assign
    identical buckets (same seeded hyperplanes, same sequential fold)."""
    import duckdb

    from schema_inference_spark.operators import similarity as S

    rows = [
        (i, [((i * 31 + j * 17) % 19 - 9) / 7.0 for j in range(64)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["bucket"] for r in S.srp_buckets(df).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {list(map(float, v))}::FLOAT[])" for i, v in rows)
        + ") AS v(vec_id, embedding)"
    )
    sql = S.srp_bucket_sql("embedding", S.srp_hyperplanes())
    want = dict(con.execute(f"SELECT vec_id, {sql} FROM t").fetchall())
    assert got == want


def test_simhash_packed_no_overflow_on_huge_doc(spark):
    """ADVICE r2: the 4x16 SWAR packing crashed (ANSI ARITHMETIC_OVERFLOW)
    at ~32k same-bit tokens per doc. The 2x32 packing is overflow-proof for
    any Spark-representable document; verify bit-exactness against the
    independent per-bit balance formulation on a 40k-token doc (past the
    old crash threshold)."""
    from schema_inference_spark.functions.hashing import (
        md5_long_expr,
        simhash_bit_balance_aggs,
        simhash_from_balances,
    )

    rows = [
        ("big", " ".join(["boilerplate"] * 40_000)),
        ("mixed", " ".join(["alpha", "beta"] * 20_000)),
        ("small", "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    packed = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(df, "doc_id", "text").collect()
    }
    tokens = df.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    balances = tokens.select(
        "doc_id", md5_long_expr(F.col("token")).alias("token_hash")
    ).groupBy("doc_id").agg(*simhash_bit_balance_aggs())
    unpacked = {
        r["doc_id"]: r["simhash"]
        for r in balances.select(
            "doc_id", simhash_from_balances().alias("simhash")
        ).collect()
    }
    assert packed == unpacked


def test_simhash_pigeonhole_recall_across_blocks(spark):
    """ADVICE r1: pairs whose differing bits span MULTIPLE blocks must still
    be found — pigeonhole (max_hamming+1 blocks) guarantees one agreeing
    block. Plant fingerprints differing in bits from different 15-bit
    blocks (60-bit space, max_hamming=3 -> 4 blocks)."""
    from schema_inference_spark.operators.dedup import simhash_near_pairs

    base = 0x0AB54A98CEB1F0A  # arbitrary 60-bit value
    rows = [
        (1, base),
        (2, base ^ (1 << 3) ^ (1 << 17)),          # blocks 0 and 1 -> d=2
        (3, base ^ (1 << 16) ^ (1 << 31) ^ (1 << 46)),  # blocks 1,2,3 -> d=3
        (4, base ^ (1 << 0) ^ (1 << 15) ^ (1 << 30) ^ (1 << 45)),  # d=4: every block differs from row 1
        (5, 0x3FFFFFFFFFFFFFF ^ base),             # far away
    ]
    fps = spark.createDataFrame(rows, "doc_id int, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(fps, "doc_id", max_hamming=3).collect()
    }
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 3
    assert (1, 4) not in got  # distance 4 > max_hamming: correctly excluded
    assert (1, 5) not in got
    # rows 2 and 3 differ in bits {3,16,17,31,46} -> d=5, excluded
    assert (2, 3) not in got


def test_kmeans_train_recovers_planted_clusters(spark):
    """Distributed spherical k-means: three well-separated planted clusters
    must be recovered (every member assigned with its cluster-mates), and
    training must be deterministic across partitionings."""
    import numpy as np

    from schema_inference_spark.operators.similarity import (
        ivf_assignments,
        kmeans_train,
    )

    rng_free_base = {
        0: [10.0, 0.0, 0.0, 0.0],
        1: [0.0, 10.0, 0.0, 0.0],
        2: [0.0, 0.0, 10.0, 0.0],
    }
    rows = []
    for cid, base in rng_free_base.items():
        for j in range(20):
            # deterministic jitter, small relative to separation
            vec = [b + ((i * 7 + j * 13 + cid * 3) % 5) * 0.1 for i, b in enumerate(base)]
            rows.append((cid * 100 + j, vec))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    cents = kmeans_train(df, k=3, max_iter=8)
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assignments(df, cents).select("vec_id", "centroid_id").collect()
    }
    # all members of a planted cluster share one learned centroid,
    # and different planted clusters get different centroids
    learned_by_planted = {
        cid: {assigned[cid * 100 + j] for j in range(20)} for cid in rng_free_base
    }
    assert all(len(s) == 1 for s in learned_by_planted.values())
    assert len(set().union(*learned_by_planted.values())) == 3

    cents2 = kmeans_train(df.repartition(7), k=3, max_iter=8)
    flat = lambda cs: [round(x, 9) for _, v in cs for x in v]  # noqa: E731
    assert flat(cents) == flat(cents2)


def test_blas_assignment_matches_exact_fold(spark):
    """The production index-build path (ivf_assignments(exact_fold=False):
    blocked float32 GEMM, norm-free argmax) must bucket vectors exactly like
    the oracle-grade sequential-fold path whenever margins are not at the
    float32 ulp (always true for real clusters); zero vectors must land in
    the first centroid on both paths, and empty input must not crash."""
    from schema_inference_spark.operators.similarity import ivf_assignments

    cents = [
        (3, [10.0, 0.0, 0.0, 0.0]),
        (7, [0.0, 10.0, 0.0, 0.0]),
        (9, [0.0, 0.0, 10.0, 0.0]),
    ]
    rows = []
    for ci, (_, base) in enumerate(cents):
        for j in range(40):
            vec = [b + ((i * 7 + j * 13 + ci * 3) % 5) * 0.1 for i, b in enumerate(base)]
            rows.append((ci * 100 + j, vec))
    rows.append((999, [0.0, 0.0, 0.0, 0.0]))  # zero vector: first centroid
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    grab = lambda fold: {  # noqa: E731
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assignments(df, cents, exact_fold=fold).collect()
    }
    exact, blas = grab(True), grab(False)
    assert blas == exact
    assert blas[999] == 3

    empty = df.limit(0)
    assert ivf_assignments(empty, cents, exact_fold=False).count() == 0


def test_stack_rows_rejects_ragged_batches():
    """The one-concatenate Arrow ingest must raise on ragged vectors — the
    dangerous case is COMPENSATING lengths (total divisible by n), which a
    bare reshape would silently mis-align into a plausible matrix."""
    import numpy as np
    import pytest

    from schema_inference_spark.operators.similarity import _stack_rows

    with pytest.raises(ValueError, match="ragged"):
        _stack_rows([np.array([1.0, 2.0]), np.array([3.0, 4.0, 5.0, 6.0])])
    ok = _stack_rows([np.array([1.0, 2.0]), np.array([3.0, 4.0])])
    assert ok.shape == (2, 2)
    assert _stack_rows([]).shape == (0, 0)


def test_kmeans_init_survives_near_dup_low_ids(spark):
    """VERDICT r2 #5: the old smallest-k-ids init collapsed when the first k
    rows were near-duplicates (all seeds in one planted cluster). The
    hash-ordered init must still recover all three planted clusters when
    ids 0..2 are near-identical members of cluster 0."""
    from schema_inference_spark.operators.similarity import (
        ivf_assignments,
        kmeans_train,
    )

    bases = {0: [10.0, 0.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0, 0.0], 2: [0.0, 0.0, 10.0, 0.0]}
    rows = []
    # ids 0..2: near-identical vectors, ALL in planted cluster 0 — the k=3
    # smallest ids, exactly the degenerate seed set for the old init
    for i in range(3):
        rows.append((i, [10.0 + i * 0.001, 0.0, 0.0, 0.0]))
    for cid, base in bases.items():
        for j in range(20):
            vec = [b + ((i * 7 + j * 13 + cid * 3) % 5) * 0.1 for i, b in enumerate(base)]
            rows.append((100 + cid * 100 + j, vec))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")

    cents = kmeans_train(df, k=3, max_iter=10)
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assignments(df, cents).select("vec_id", "centroid_id").collect()
    }
    learned_by_planted = {
        cid: {assigned[100 + cid * 100 + j] for j in range(20)} for cid in bases
    }
    assert all(len(s) == 1 for s in learned_by_planted.values())
    assert len(set().union(*learned_by_planted.values())) == 3


def test_ivf_with_trained_centroids_recall(spark, sf_dir):
    """End-to-end learned-index path: k-means-trained centroids + n_probe
    search must recover most of the brute-force top-10 (measured 0.9 at
    this corpus; gate at >= 0.6 to absorb corpus drift)."""
    from pyspark.sql import functions as F

    from schema_inference_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        kmeans_train,
    )
    from schema_inference_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = kmeans_train(emb, k=8, max_iter=6)
    ivf = {r["vec_id"] for r in cosine_topk_ivf(emb, q, cents, k=10, n_probe=2).collect()}
    brute = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    assert len(ivf & brute) / 10 >= 0.6


def test_ivf_index_build_query_lifecycle(spark, sf_dir):
    """Build-once/query-many ANN: the persisted, centroid-partitioned index
    answers queries reading ONLY the probed partitions (PartitionFilters in
    the scan), with the same results as the in-memory IVF path."""
    import tempfile

    from schema_inference_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf,
        query_ivf_index,
    )
    from schema_inference_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    with tempfile.TemporaryDirectory() as d:
        cents = build_ivf_index(emb, f"{d}/idx", k=8, max_iter=4)
        got = query_ivf_index(spark, f"{d}/idx", q, k=10, n_probe=2)
        got_rows = [(r["vec_id"], r["cosine_sim"]) for r in got.collect()]

        mem = cosine_topk_ivf(emb, q, cents, k=10, n_probe=2)
        mem_rows = [(r["vec_id"], r["cosine_sim"]) for r in mem.select("vec_id", "cosine_sim").collect()]
        assert got_rows == mem_rows

        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [centroid_id" in plan or "centroid_id#" in plan.split("PartitionFilters")[1][:80], plan


def test_duplicated_spans_planted(spark):
    """Exact substring dedup (VERDICT r3 #7): a 15-word run shared across
    two docs and a 12-word phrase repeated WITHIN one doc must both surface
    as maximal spans with exact 1-based word boundaries; unique docs and
    sub-k docs must not."""
    from schema_inference_spark.operators.dedup import duplicated_spans

    shared = [f"s{i}" for i in range(15)]
    rep = [f"r{i}" for i in range(12)]
    # gapped-overlap case (ADVICE r4): d6's shingles at pos 1 and pos 3 are
    # each duplicated elsewhere (in d7 / d8 respectively) while pos 2's is
    # unique — their k-word windows overlap (gap 2 <= k-1), so they must
    # merge into ONE disjoint span 1..12, not two overlapping spans
    ov = [f"x{i}" for i in range(12)]
    rows = [
        ("d1", " ".join([f"a{i}" for i in range(5)] + shared + [f"b{i}" for i in range(10)])),
        ("d2", " ".join([f"c{i}" for i in range(10)] + shared + [f"d{i}" for i in range(5)])),
        ("d3", " ".join(f"e{i}" for i in range(25))),
        ("d4", " ".join(rep + [f"f{i}" for i in range(6)] + rep)),
        ("d5", "too short"),
        ("d6", " ".join(ov)),
        ("d7", " ".join(ov[:10])),
        ("d8", " ".join(ov[2:])),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_words"], r["n_shingles"])
        for r in duplicated_spans(df, "text", "doc_id", k=10).collect()
    )
    assert got == [
        ("d1", 6, 20, 15, 6),   # shared run at words 6..20: 6 k=10 shingles
        ("d2", 11, 25, 15, 6),
        ("d4", 1, 12, 12, 3),   # within-doc repeat, both occurrences
        ("d4", 19, 30, 12, 3),
        ("d6", 1, 12, 12, 2),   # merged gapped overlap: one disjoint span
        ("d7", 1, 10, 10, 1),
        ("d8", 1, 10, 10, 1),
    ]
    # disjoint-coverage guarantee: per doc, spans never overlap
    by_doc: dict = {}
    for doc, s, e, _, _ in got:
        by_doc.setdefault(doc, []).append((s, e))
    for doc, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1, f"overlapping spans in {doc}: {spans}"


def test_cross_batch_incremental_dedup(spark):
    """Cross-snapshot incremental dedup (VERDICT r4 #1): a new batch deduped
    against the prior batch's persisted signature table must find exactly
    the planted cross-batch exact + near dups — never new x new (that is
    within-batch dedup's job) nor prior x prior (already deduped)."""
    from schema_inference_spark.operators.dedup import (
        cross_batch_candidates,
        cross_batch_exact_dups,
        cross_batch_verified_pairs,
        dedup_signatures,
    )

    base = [f"w{i}" for i in range(20)]
    near = base[:-1] + ["zz"]  # only the last k=3 shingle differs: 17/19 shared
    prior_rows = [
        ("a1", " ".join(base)),
        ("a2", " ".join(f"p{i}" for i in range(20))),
        ("a3", " ".join(f"q{i}" for i in range(20))),
    ]
    new_rows = [
        ("b_exact", " ".join(base)),            # byte-identical to a1
        ("b_near", " ".join(near)),             # near-dup of a1
        ("b_fresh", " ".join(f"n{i}" for i in range(20))),
        # near-dup pair WITHIN the new batch only — must never surface here
        ("b_pair1", " ".join(f"m{i}" for i in range(20))),
        ("b_pair2", " ".join([f"m{i}" for i in range(19)] + ["yy"])),
    ]
    prior = spark.createDataFrame(prior_rows, "doc_id string, text string")
    new = spark.createDataFrame(new_rows, "doc_id string, text string")

    prior_sigs = dedup_signatures(prior, n_perm=8)
    new_sigs = dedup_signatures(new, n_perm=8)
    assert set(prior_sigs.columns) == {"doc_id", "content_hash"} | {
        f"mh{i}" for i in range(8)
    }

    exact = cross_batch_exact_dups(new, prior_sigs).collect()
    assert [r["id_new"] for r in exact] == ["b_exact"]

    cands = cross_batch_candidates(new_sigs, prior_sigs, n_perm=8, band_size=2)
    got_cands = {(r["id_new"], r["id_prior"]) for r in cands.collect()}
    assert ("b_exact", "a1") in got_cands and ("b_near", "a1") in got_cands
    # strictly cross-batch: every pair is (new, prior)
    assert all(n.startswith("b_") and p.startswith("a") for n, p in got_cands)

    verified = {
        (r["id_new"], r["id_prior"]): r["jaccard"]
        for r in cross_batch_verified_pairs(new, prior, cands, threshold=0.6).collect()
    }
    assert verified[("b_exact", "a1")] == 1.0
    assert abs(verified[("b_near", "a1")] - round(17 / 19, 6)) < 1e-6
    assert all(n != "b_pair1" and n != "b_pair2" for n, _ in verified)


def test_cross_batch_exact_dups_verifies_hash_collisions(spark):
    """The exact cross-batch path keeps 60 of md5's 128 bits, so at 10^12
    docs hash equality alone would falsely drop ~n_prior/2^60 unique docs
    per new doc. With prior_docs passed, every hash match is text-verified
    (on the tiny matched frame only): a forged collision — same
    content_hash, different text — must NOT be reported."""
    from schema_inference_spark.operators.dedup import (
        cross_batch_exact_dups,
        dedup_signatures,
    )

    prior = spark.createDataFrame(
        [("p1", "the quick brown fox jumps")], "doc_id string, text string"
    )
    new = spark.createDataFrame(
        [("n_dup", "the quick brown fox jumps"), ("n_fresh", "totally different words")],
        "doc_id string, text string",
    )
    prior_sigs = dedup_signatures(prior, n_perm=4)
    # forge a collision: a second prior signature row whose content_hash
    # equals n_fresh's but whose corpus text differs
    from pyspark.sql import functions as F

    fresh_hash = (
        dedup_signatures(new.where("doc_id = 'n_fresh'"), n_perm=4)
        .select("content_hash").collect()[0][0]
    )
    forged = prior_sigs.limit(1).select(
        F.lit("p_collide").alias("doc_id"),
        F.lit(fresh_hash).alias("content_hash"),
        *[F.col(f"mh{i}") for i in range(4)],
    )
    sigs = prior_sigs.unionByName(forged)
    prior_docs = prior.unionByName(
        spark.createDataFrame(
            [("p_collide", "not the fresh doc at all")], "doc_id string, text string"
        )
    )

    # hash-only mode reports the forged collision (documented analytic mode)
    unverified = {
        (r["id_new"], r["id_prior"])
        for r in cross_batch_exact_dups(new, sigs).collect()
    }
    assert unverified == {("n_dup", "p1"), ("n_fresh", "p_collide")}
    # verified mode (the curate_job drop path) rejects it
    verified = {
        (r["id_new"], r["id_prior"])
        for r in cross_batch_exact_dups(new, sigs, prior_docs=prior_docs).collect()
    }
    assert verified == {("n_dup", "p1")}


def test_cross_batch_verify_safe_with_overlapping_id_spaces(spark):
    """The cross-batch verifier builds shingles PER SIDE: an id reused
    across batches with different text must score the TEXTS, not a mixed
    shingle bag (the within-batch verifier's single-frame shape would)."""
    from schema_inference_spark.operators.dedup import cross_batch_verified_pairs

    prior = spark.createDataFrame(
        [("x", " ".join(f"p{i}" for i in range(10)))], "doc_id string, text string"
    )
    new = spark.createDataFrame(
        [("x", " ".join([f"p{i}" for i in range(9)] + ["zz"]))],
        "doc_id string, text string",
    )
    cands = spark.createDataFrame([("x", "x")], "id_new string, id_prior string")
    got = cross_batch_verified_pairs(new, prior, cands, threshold=0.0).collect()
    # 8 shingles/side, only the last differs: jaccard = 7/9 (a mixed shingle
    # bag would score the union against itself and return 1.0)
    assert len(got) == 1 and abs(got[0]["jaccard"] - round(7 / 9, 6)) < 1e-6
