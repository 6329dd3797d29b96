"""Deduplication operators for training-data pipelines.

Four families, each chosen for a different scale/recall tradeoff:

* **exact** — md5-of-content groupBy. One shuffle of (hash, id); partial
  agg makes hot content cheap.
* **MinHash + LSH** — per-row signature (pure array exprs over shingles),
  banded bucketing, candidate pairs from bucket self-joins, optional exact
  Jaccard verification of candidates. The standard near-dup pipeline at
  web scale: O(n) signature pass + bucket-local joins instead of O(n^2).
* **SimHash** — per-token hashed bit votes aggregated into a fingerprint;
  near-pairs by Hamming distance within blocking buckets.
* **n-gram Jaccard** — the exact verifier used on LSH candidates (never run
  all-pairs at scale).

Everything is expressed with built-in exprs + hash aggregations; the DuckDB
oracles in catalog_text.py compute identical signatures (shared md5-based
hashing in functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schema_inference_spark.functions.hashing import (
    SIMHASH_BITS,
    hamming_distance_expr,
    md5_long_expr,
)


def exact_duplicate_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(content_hash, n_dups, ids) for content appearing more than once."""
    hashed = df.select(md5_long_expr(F.col(content_col)).alias("content_hash"), id_col)
    return (
        hashed.groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.col("n_dups") > 1)
    )


def _minhash_aggregated(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seeds_and_names: list[tuple[int, str]],
    k: int,
    restore_to: DataFrame | None = None,
) -> DataFrame:
    # Fully whole-stage-codegen formulation (measured 20x faster than any
    # higher-order-function variant, which Spark evaluates interpreted):
    # exploded_shingles generates each shingle via sequence+slice codegen,
    # md5 hashes it once, and the per-permutation affine maps run as
    # partial-aggregated min()s — one shuffle row per doc/partition.
    from schema_inference_spark.functions.hashing import (
        MINHASH_P,
        exploded_shingles,
        md5_long_expr,
        minhash_perm_consts,
    )

    hashed = exploded_shingles(df, id_col, F.col(text_col), k).select(
        id_col, md5_long_expr(F.col("shingle")).alias("_h")
    )

    def mh(seed: int, name: str):
        a, b = minhash_perm_consts(seed)
        return F.min(
            (F.lit(a) * (F.col("_h") % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)
        ).alias(name)

    sigs = hashed.groupBy(id_col).agg(*[mh(s, n) for s, n in seeds_and_names])
    # docs with fewer than k words have no shingles -> NULL signature row,
    # restored via left join so callers see the same contract as before.
    # restore_to lets a caller ride extra per-doc columns (e.g. the content
    # hash in dedup_signatures) through the SAME restore join instead of
    # paying a second id-keyed shuffle.
    base = restore_to if restore_to is not None else df.select(id_col)
    return base.join(sigs, id_col, "left")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_perm: int = 8, k: int = 3
) -> DataFrame:
    return _minhash_aggregated(
        df, id_col, text_col, [(seed, f"mh{seed}") for seed in range(n_perm)], k
    )


def document_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, seed: int = 997
) -> DataFrame:
    """(id, fingerprint): the 1-permutation MinHash content fingerprint on
    the same explode+codegen aggregation path as minhash_signatures (the
    per-row ``_fingerprint_expr`` routes through an interpreted array fold —
    never use it corpus-wide). NULL for docs with fewer than k words."""
    return _minhash_aggregated(df, id_col, text_col, [(seed, "fingerprint")], k)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded MinHash buckets.

    One signature projection, one explode to (band_id, band_sig, id), one
    self-join per bucket. Bucket sizes are bounded in practice; a hot
    bucket (e.g. boilerplate docs) is exactly a skew join — AQE splits it.
    """
    sig = minhash_signatures(df, id_col, text_col, n_perm, k)
    buckets = _band_buckets(sig, id_col, n_perm, band_size)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def _band_buckets(
    sig: DataFrame, id_col: str, n_perm: int, band_size: int
) -> DataFrame:
    """(id, band_id, band_sig) rows from a mh0..mh{n_perm-1} signature frame
    — one explode, NULL/empty bands dropped (sub-k-word docs)."""
    n_bands = n_perm // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    ",", *[F.col(f"mh{b * band_size + i}") for i in range(band_size)]
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        sig.select(id_col, F.explode(bands).alias("band"))
        .select(id_col, "band.band_id", "band.band_sig")
        .where(F.col("band_sig").isNotNull() & (F.col("band_sig") != ""))
    )


def jaccard_verified_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact k-shingle Jaccard for candidate pairs; keeps pairs >= threshold.

    Shingle sets are exploded once and joined twice (ids are pre-filtered to
    candidate members, so the explode touches only candidate docs)."""
    from schema_inference_spark.functions.hashing import exploded_shingles

    member_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    shingles = exploded_shingles(
        df.join(F.broadcast(member_ids), id_col, "left_semi"), id_col, F.col(text_col), k
    ).distinct()
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    s1 = shingles.withColumnRenamed(id_col, "id_a")
    s2 = shingles.withColumnRenamed(id_col, "id_b")
    inter = (
        candidates.join(s1, "id_a")
        .join(s2, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a")
    nb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-document SimHash fingerprint via exploded token votes.

    The explode -> groupBy(id) shape partial-aggregates SWAR-packed bit
    counters map-side (30 packed sums instead of 60 conditional sums for
    the 60-bit fingerprint, overflow-proof for any Spark-representable
    document — functions/hashing.py); the DuckDB oracle uses
    the independent per-bit balance formulation, so the packing is
    cross-checked bit-for-bit."""
    from schema_inference_spark.functions.hashing import (
        simhash_from_packed,
        simhash_packed_aggs,
    )

    tokens = df.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    hashed = tokens.select(id_col, md5_long_expr(F.col("token")).alias("token_hash"))
    packed = hashed.groupBy(id_col).agg(*simhash_packed_aggs(n_bits))
    return packed.select(id_col, simhash_from_packed(n_bits).alias("simhash"))


def duplicate_components(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, component) where
    component = the smallest id in the cluster. This is the step that turns
    pairwise near-dups into dedup GROUPS (keep one row per component).

    Two-phase star contraction (large-star / small-star, Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each round is
    two key-partial aggregations + joins, and the edge set converges in
    O(log n) rounds regardless of graph shape — the r2 min-label
    propagation needed O(diameter) rounds, so a pathological chain could
    exhaust ``max_iter`` and SILENTLY split a component, quietly defeating
    leakage_safe_split's contamination guarantee (ADVICE r2). Now
    non-convergence RAISES instead. Spark-idiomatic iteration: a driver
    loop over DataFrames with localCheckpoint() per round to cut lineage
    (no RDDs, no recursive SQL).
    """
    verts = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
        .localCheckpoint()
    )
    # canonical undirected edges (lo < hi)
    edges = (
        pairs.select(
            F.least("id_a", "id_b").alias("lo"), F.greatest("id_a", "id_b").alias("hi")
        )
        .where(F.col("lo") < F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    converged = edges.limit(1).count() == 0
    for _ in range(max_iter):
        if converged:
            break
        # LARGE-STAR: every node u connects its LARGER neighbors to
        # m = min(neighborhood(u) + u)
        sym = edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
            edges.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least("u", "_mn").alias("m"))
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .where(F.col("lo") < F.col("hi"))
            .distinct()
        )
        # SMALL-STAR: direct edges hi -> lo; every hub connects its smaller
        # neighbors (and itself) to their min
        smins = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        attach = (
            ls.join(smins, "hi")
            .select(F.col("m").alias("lo"), ls["lo"].alias("hi"))
            .where(F.col("lo") < F.col("hi"))
        )
        root = smins.select(F.col("m").alias("lo"), "hi")
        new_edges = attach.unionByName(root).distinct().localCheckpoint()
        # exact set-equality in ONE job (both frames are distinct, so the
        # two-sided exceptAll union is empty iff the sets are equal);
        # every convergence probe is driver-serial latency in an
        # iterative operator, so probes are the thing to minimize
        converged = (
            new_edges.exceptAll(edges)
            .unionAll(edges.exceptAll(new_edges))
            .limit(1)
            .count()
            == 0
        )
        edges = new_edges
    if not converged:
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iter} rounds "
            "(star contraction needs ~log2(n) — raise max_iter); refusing to "
            "return split components, which would leak near-dups across splits"
        )
    parents = edges.groupBy("hi").agg(F.min("lo").alias("component"))
    return verts.join(
        parents.withColumnRenamed("hi", id_col), id_col, "left"
    ).select(id_col, F.coalesce("component", F.col(id_col)).alias("component"))


def simhash_block_bounds(n_bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """(shift, width) per block, covering all n_bits contiguously."""
    base, extra = divmod(n_bits, n_blocks)
    bounds, shift = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        bounds.append((shift, width))
        shift += width
    return bounds


def simhash_near_pairs(
    fingerprints: DataFrame,
    id_col: str,
    max_hamming: int = 2,
    n_bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Pigeonhole blocking (ADVICE r1): the fingerprint splits into
    ``max_hamming + 1`` contiguous blocks, so any pair within distance
    max_hamming agrees EXACTLY on at least one block — recall is guaranteed,
    not probabilistic. One exploded (block_id, block_value, id) frame,
    one equi-self-join on (block_id, block_value): at 60 bits each block
    spans >= 60/(h+1) bits, so bucket counts grow with corpus size and the
    join stays bucket-local; hot buckets (boilerplate) are ordinary skew
    joins that AQE splits."""
    n_blocks = max_hamming + 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright("simhash", shift)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("block_val"),
            )
            for i, (shift, width) in enumerate(simhash_block_bounds(n_bits, n_blocks))
        ]
    )
    keyed = fingerprints.select(
        F.col(id_col), F.col("simhash"), F.explode(blocks).alias("blk")
    ).select(id_col, "simhash", "blk.block_id", "blk.block_val")
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        hamming_distance_expr(F.col("sh_a"), F.col("sh_b"), n_bits).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def duplicated_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 50
) -> DataFrame:
    """Exact substring dedup at k-token granularity — the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" pass
    re-expressed relationally (the reference engine has no analog; this is
    a training-pipeline requirement). A suffix array is the single-node
    tool; the Spark-native equivalent marks every k-word shingle whose hash
    occurs MORE THAN ONCE in the corpus (across or within documents — Lee
    et al. remove within-doc repeats too) and merges duplicated positions
    whose k-word windows OVERLAP (position gap <= k-1, which subsumes
    consecutive runs) into maximal word spans per document — so emitted
    spans are DISJOINT and summing n_words per doc is an exact duplicated-
    coverage measure (ADVICE r4: the consecutive-only merge could emit
    overlapping spans for gapped duplicated shingles, double-counting).

    Returns (id_col, span_start, span_end, n_words, n_shingles) with
    1-based inclusive word indices; a span covers words
    [span_start, span_end] = [first dup pos, last dup pos + k - 1];
    n_shingles counts the duplicated shingle positions inside the span.

    Scale shape: one codegen explode (positions + 60-bit md5 shingle
    hashes), one partial-agg groupBy(h) for global occurrence counts, one
    left-semi shuffle join back on h (AQE handles boilerplate-shingle
    skew), and one per-document window for the gaps-and-islands merge —
    every stage is a standard shuffle on a high-cardinality key. No
    driver-side state; output is strictly smaller than the shingle set."""
    from pyspark.sql import Window

    from schema_inference_spark.functions.hashing import exploded_shingle_positions

    sh = exploded_shingle_positions(df, id_col, F.col(text_col), k)
    dup = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ")).where(F.col("n_occ") > 1)
    pos = sh.join(dup.select("h"), "h", "left_semi")
    # gaps-and-islands with overlap-aware boundaries: a new island starts
    # when the gap to the previous duplicated position exceeds k-1 (the
    # windows no longer share words); cumulative-sum of boundary flags is
    # the island id (lag is NULL on the first row -> no boundary)
    w = Window.partitionBy(id_col).orderBy("pos")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boundary = F.when(F.col("pos") - F.lag("pos", 1).over(w) > k - 1, 1).otherwise(0)
    island = F.sum(boundary).over(wc).alias("_g")
    return (
        pos.select(id_col, "pos", island)
        .groupBy(id_col, "_g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("bigint").alias("n_words"),
            "n_shingles",
        )
    )


def duplicated_spans_sql(
    table: str = "documents", text_expr: str = "text", id_col: str = "doc_id", k: int = 50
) -> str:
    """DuckDB mirror of :func:`duplicated_spans` (same hash, same islands)."""
    from schema_inference_spark.functions.hashing import shingle_positions_sql

    sh = shingle_positions_sql(table, id_col, text_expr, k)
    return f"""
WITH sh AS (SELECT * FROM {sh}),
dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) > 1),
pos AS (SELECT s.{id_col}, s.pos FROM sh s JOIN dup USING (h)),
bnd AS (SELECT {id_col}, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY {id_col} ORDER BY pos)
                         > {k - 1} THEN 1 ELSE 0 END AS b
        FROM pos),
isl AS (SELECT {id_col}, pos,
               sum(b) OVER (PARTITION BY {id_col} ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM bnd)
SELECT {id_col}, min(pos)::BIGINT AS span_start,
       (max(pos) + {k - 1})::BIGINT AS span_end,
       (max(pos) + {k - 1} - min(pos) + 1)::BIGINT AS n_words,
       count(*)::BIGINT AS n_shingles
FROM isl GROUP BY {id_col}, g
"""


# --- cross-snapshot incremental dedup (r5) ----------------------------------
#
# Production crawls are rolling: a new batch must dedup against the
# ALREADY-CURATED corpus, not just within itself — without re-reading the
# prior corpus' text for the bulk of the work. The curated corpus therefore
# persists a SIGNATURE table (dedup_signatures: content hash + MinHash
# signature per kept doc); a later batch (1) anti-joins its content hashes
# against it for exact dups and (2) band-bucket-joins its MinHash signatures
# against it for near-dup candidates, touching prior TEXT only for the
# candidate members during Jaccard verification. The reference's own
# re-analysis entry point — resuming schema inference from its persisted
# distinct output rather than the raw scan (SeqScanAsJson.java:66-77) — is
# the seed of exactly this persisted-derived-state pattern.
#
# Scale shape: the signature table is ~100 bytes/doc (10^12 docs = 100 TB
# corpus -> ~100 GB of signatures), the band join is bucket-local with AQE
# skew splitting, and nothing ever joins prior x prior or new x new.


def dedup_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_perm: int = 8, k: int = 3,
) -> DataFrame:
    """(id, content_hash, mh0..mh{n_perm-1}) — the persisted signature table
    a curated corpus carries so future batches can dedup against it. One
    shingle explode + one restore join (the content hash rides the same
    join that restores sub-k-word docs); sub-k-word docs get NULL minhashes
    but still carry their content_hash for the exact path."""
    base = df.select(
        F.col(id_col), md5_long_expr(F.col(text_col)).alias("content_hash")
    )
    return _minhash_aggregated(
        df, id_col, text_col, [(s, f"mh{s}") for s in range(n_perm)], k,
        restore_to=base,
    )


def cross_batch_exact_dups(
    new_docs: DataFrame, prior_sigs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    prior_docs: DataFrame | None = None,
) -> DataFrame:
    """(id_new, id_prior, content_hash): new-batch docs whose exact content
    already exists in the prior corpus — ONE inner join of md5-derived
    60-bit content hashes against the signature table (which also recovers
    id_prior, so callers need no second signature-table join).

    The hash keeps 60 of md5's 128 bits, so at the 10^12-doc design point a
    unique new doc collides with SOME prior hash with p ~ n_prior/2^60 —
    ~10^5 false drops per 10^11-doc batch if hash equality alone deletes
    data. Pass prior_docs (the prior corpus table) to verify each hash
    match by comparing the actual texts; only the already-matched ids are
    joined back to either text column, so at scale the verification frame
    is collisions + true dups, never the corpus. Without prior_docs the
    prior text is never read and results are hash-exact only (fine for
    analytics; not for an irreversible drop path)."""
    hashed = new_docs.select(
        F.col(id_col).alias("id_new"),
        md5_long_expr(F.col(text_col)).alias("content_hash"),
    )
    matched = hashed.join(
        prior_sigs.select("content_hash", F.col(id_col).alias("id_prior")),
        "content_hash",
    )
    if prior_docs is None:
        return matched.select("id_new", "id_prior", "content_hash")
    new_texts = new_docs.select(
        F.col(id_col).alias("id_new"), F.col(text_col).alias("_text_new")
    )
    prior_texts = prior_docs.select(
        F.col(id_col).alias("id_prior"), F.col(text_col).alias("_text_prior")
    )
    return (
        matched.join(new_texts, "id_new")
        .join(prior_texts, "id_prior")
        .where(F.col("_text_new") == F.col("_text_prior"))
        .select("id_new", "id_prior", "content_hash")
    )


def cross_batch_candidates(
    new_sigs: DataFrame, prior_sigs: DataFrame,
    id_col: str = "doc_id", n_perm: int = 8, band_size: int = 2,
) -> DataFrame:
    """(id_new, id_prior) near-dup candidates: banded buckets of the NEW
    batch's signatures equi-joined against the PERSISTED prior signature
    table. Strictly cross-batch — new x new is within-batch dedup's job and
    prior x prior is already deduped — so there is no id ordering
    constraint and overlapping id spaces across batches are safe."""
    a = _band_buckets(new_sigs, id_col, n_perm, band_size).withColumnRenamed(
        id_col, "id_new"
    )
    b = _band_buckets(prior_sigs, id_col, n_perm, band_size).withColumnRenamed(
        id_col, "id_prior"
    )
    return (
        a.join(b, ["band_id", "band_sig"]).select("id_new", "id_prior").distinct()
    )


def cross_batch_verified_pairs(
    new_docs: DataFrame,
    prior_docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact k-shingle Jaccard over cross-batch candidates; keeps
    (id_new, id_prior, jaccard) pairs >= threshold. Shingle sets are built
    PER SIDE (unlike the within-batch verifier, whose single shingle frame
    would mix texts if an id appeared in both batches), and each side's
    explode touches only candidate members via a semi-join."""
    from schema_inference_spark.functions.hashing import exploded_shingles

    def side_shingles(docs: DataFrame, cand_col: str, out_id: str) -> DataFrame:
        members = candidates.select(F.col(cand_col).alias(id_col)).distinct()
        return (
            exploded_shingles(
                docs.join(F.broadcast(members), id_col, "left_semi"),
                id_col, F.col(text_col), k,
            )
            .distinct()
            .withColumnRenamed(id_col, out_id)
        )

    s_new = side_shingles(new_docs, "id_new", "id_new")
    s_prior = side_shingles(prior_docs, "id_prior", "id_prior")
    n_new = s_new.groupBy("id_new").agg(F.count(F.lit(1)).alias("n_a"))
    n_prior = s_prior.groupBy("id_prior").agg(F.count(F.lit(1)).alias("n_b"))
    inter = (
        candidates.join(s_new, "id_new")
        .join(s_prior, ["id_prior", "shingle"])
        .groupBy("id_new", "id_prior")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(n_new, "id_new")
        .join(n_prior, "id_prior")
        .select(
            "id_new",
            "id_prior",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
