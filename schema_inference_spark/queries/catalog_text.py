"""Text-analysis + dedup queries over ``documents``, each with a DuckDB
oracle computing the identical md5-derived signatures (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schema_inference_spark.functions import text as TX
from schema_inference_spark.functions.hashing import (
    md5_long_sql,
    minhash_sql,
    simhash_sql,
)
from schema_inference_spark.operators.dedup import (
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_fingerprints,
)
from schema_inference_spark.queries import QuerySpec
from schema_inference_spark.sources.tables import load_table


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count_expr(F.col("text"))).alias("total_tokens"),
            F.sum(TX.bpe_ish_token_count_expr(F.col("text"))).alias("total_subword_tokens"),
            F.round(F.avg(TX.token_count_expr(F.col("text"))), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


TOKEN_STATS_SQL = f"""
SELECT lang, count(*) AS n_docs,
       sum({TX.token_count_sql('text')})::BIGINT AS total_tokens,
       sum({TX.bpe_ish_token_count_sql('text')})::BIGINT AS total_subword_tokens,
       round(avg({TX.token_count_sql('text')}), 4) AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(TX.quality_score_expr(F.col("text"))), 4).alias("avg_quality"),
            F.round(F.min(TX.quality_score_expr(F.col("text"))), 4).alias("min_quality"),
        )
        .orderBy("source")
    )


QUALITY_SQL = f"""
SELECT source, count(*) AS n_docs,
       round(avg({TX.quality_score_sql('text')}), 4) AS avg_quality,
       round(min({TX.quality_score_sql('text')}), 4) AS min_quality
FROM documents GROUP BY source ORDER BY source
"""


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(TX.lang_id_expr(F.col("text")).alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("predicted_lang")
    )


LANG_ID_SQL = f"""
SELECT {TX.lang_id_sql('text')} AS predicted_lang, count(*) AS n
FROM documents GROUP BY 1 ORDER BY predicted_lang
"""


def doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        exact_duplicate_groups(docs, "text", "doc_id")
        .select("content_hash", "n_dups")
        .orderBy("content_hash")
    )


EXACT_DUPS_SQL = f"""
SELECT {md5_long_sql('text')} AS content_hash, count(*) AS n_dups
FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY content_hash
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from schema_inference_spark.operators.dedup import document_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return document_fingerprints(docs, "doc_id", "text", k=4, seed=997).orderBy("doc_id")


FINGERPRINT_SQL = f"""
SELECT doc_id, {TX.fingerprint_sql('text')} AS fingerprint
FROM documents ORDER BY doc_id
"""


def doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", n_perm=4).orderBy("doc_id")


MINHASH_SQL = f"""
SELECT doc_id,
       {minhash_sql('text', 0)} AS mh0, {minhash_sql('text', 1)} AS mh1,
       {minhash_sql('text', 2)} AS mh2, {minhash_sql('text', 3)} AS mh3
FROM documents ORDER BY doc_id
"""


def doc_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs, "doc_id", "text", n_perm=4, band_size=2).orderBy(
        "id_a", "id_b"
    )


LSH_CAND_SQL = f"""
WITH sig AS (
  SELECT doc_id,
         {minhash_sql('text', 0)} AS mh0, {minhash_sql('text', 1)} AS mh1,
         {minhash_sql('text', 2)} AS mh2, {minhash_sql('text', 3)} AS mh3
  FROM documents
), buckets AS (
  SELECT doc_id, 0 AS band_id, mh0::VARCHAR || ',' || mh1::VARCHAR AS band_sig FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id, mh2::VARCHAR || ',' || mh3::VARCHAR AS band_sig FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM buckets a JOIN buckets b
  ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
WHERE a.band_sig IS NOT NULL AND a.band_sig != ''
ORDER BY id_a, id_b
"""


def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, "doc_id", "text").orderBy("doc_id")


_BALANCES, _FP = simhash_sql()
SIMHASH_Q_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents
), hashed AS (
  SELECT doc_id, {md5_long_sql('token')} AS token_hash FROM tokens WHERE token != ''
), balances AS (
  SELECT doc_id, {_BALANCES} FROM hashed GROUP BY doc_id
)
SELECT doc_id, {_FP} AS simhash FROM balances ORDER BY doc_id
"""


def doc_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole-blocked SimHash near-pairs (60-bit, 4 blocks, Hamming<=3).

    The oracle computes ALL-pairs Hamming over the bit-identical DuckDB
    fingerprints — matching it proves the blocked join loses zero recall
    (pigeonhole guarantee), not just that both engines agree."""
    from schema_inference_spark.operators.dedup import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents")
    fps = simhash_fingerprints(docs, "doc_id", "text")
    return simhash_near_pairs(fps, "doc_id", max_hamming=3).orderBy("id_a", "id_b")


SIMHASH_PAIRS_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents
), hashed AS (
  SELECT doc_id, {md5_long_sql('token')} AS token_hash FROM tokens WHERE token != ''
), balances AS (
  SELECT doc_id, {simhash_sql()[0]} FROM hashed GROUP BY doc_id
), fps AS (
  SELECT doc_id, {simhash_sql()[1]} AS simhash FROM balances
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def doc_verified_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup pipeline: MinHash-LSH candidates -> exact k-shingle
    Jaccard verification (threshold 0 keeps all candidates with scores)."""
    from schema_inference_spark.operators.dedup import jaccard_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(docs, "doc_id", "text", n_perm=4, band_size=2)
    return jaccard_verified_pairs(docs, cands, "doc_id", "text", k=3, threshold=0.0).orderBy(
        "id_a", "id_b"
    )


from schema_inference_spark.functions.hashing import shingles_sql  # noqa: E402

VERIFIED_DUPS_SQL = f"""
WITH sig AS (
  SELECT doc_id,
         {minhash_sql('text', 0)} AS mh0, {minhash_sql('text', 1)} AS mh1,
         {minhash_sql('text', 2)} AS mh2, {minhash_sql('text', 3)} AS mh3
  FROM documents
), buckets AS (
  SELECT doc_id, 0 AS band_id, mh0::VARCHAR || ',' || mh1::VARCHAR AS band_sig FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id, mh2::VARCHAR || ',' || mh3::VARCHAR AS band_sig FROM sig
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
  WHERE a.band_sig IS NOT NULL AND a.band_sig != ''
), members AS (
  SELECT DISTINCT id FROM (SELECT id_a AS id FROM cand UNION SELECT id_b FROM cand)
), shingle_rows AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql('text', 3)}) AS shingle
  FROM documents JOIN members ON doc_id = id
), sizes AS (SELECT doc_id, count(*) AS n FROM shingle_rows GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN shingle_rows s1 ON s1.doc_id = c.id_a
  JOIN shingle_rows s2 ON s2.doc_id = c.id_b AND s2.shingle = s1.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(n_inter / (na.n + nb.n - n_inter), 6) AS jaccard
FROM inter i JOIN sizes na ON na.doc_id = i.id_a JOIN sizes nb ON nb.doc_id = i.id_b
WHERE round(n_inter / (na.n + nb.n - n_inter), 6) >= 0.0
ORDER BY id_a, id_b
"""


def doc_cross_batch_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup (r5): a rolling crawl's NEW batch
    deduped against the ALREADY-CURATED corpus via its persisted signature
    table — exactly the reference's persisted-derived-state pattern of
    resuming analysis from prior output instead of the raw scan
    (SeqScanAsJson.java:66-77). The deterministic cross-engine split plays
    both roles from one table: even doc_ids are the prior corpus, odd the
    new batch (TESTDATA's planted near-dups are consecutive ids, so most
    planted pairs cross the batch boundary). New-batch signatures
    band-bucket-join against the prior signature table (never new x new or
    prior x prior), candidates verify with exact k-shingle Jaccard built
    PER SIDE."""
    from schema_inference_spark.operators.dedup import (
        cross_batch_candidates,
        cross_batch_verified_pairs,
        dedup_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    prior = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    cands = cross_batch_candidates(
        dedup_signatures(new, n_perm=4),
        dedup_signatures(prior, n_perm=4),
        n_perm=4,
        band_size=2,
    )
    return cross_batch_verified_pairs(new, prior, cands, threshold=0.0).orderBy(
        "id_new", "id_prior"
    )


CROSS_BATCH_SQL = f"""
WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
priord AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
sig_new AS (
  SELECT doc_id,
         {minhash_sql('text', 0)} AS mh0, {minhash_sql('text', 1)} AS mh1,
         {minhash_sql('text', 2)} AS mh2, {minhash_sql('text', 3)} AS mh3
  FROM newd
), sig_prior AS (
  SELECT doc_id,
         {minhash_sql('text', 0)} AS mh0, {minhash_sql('text', 1)} AS mh1,
         {minhash_sql('text', 2)} AS mh2, {minhash_sql('text', 3)} AS mh3
  FROM priord
), bk_new AS (
  SELECT * FROM (
    SELECT doc_id, 0 AS band_id, mh0::VARCHAR || ',' || mh1::VARCHAR AS band_sig FROM sig_new
    UNION ALL
    SELECT doc_id, 1 AS band_id, mh2::VARCHAR || ',' || mh3::VARCHAR AS band_sig FROM sig_new
  ) WHERE band_sig IS NOT NULL AND band_sig != ''
), bk_prior AS (
  SELECT * FROM (
    SELECT doc_id, 0 AS band_id, mh0::VARCHAR || ',' || mh1::VARCHAR AS band_sig FROM sig_prior
    UNION ALL
    SELECT doc_id, 1 AS band_id, mh2::VARCHAR || ',' || mh3::VARCHAR AS band_sig FROM sig_prior
  ) WHERE band_sig IS NOT NULL AND band_sig != ''
), cand AS (
  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_prior
  FROM bk_new a JOIN bk_prior b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
), sh_new AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql('text', 3)}) AS shingle
  FROM newd JOIN (SELECT DISTINCT id_new FROM cand) m ON doc_id = m.id_new
), sh_prior AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql('text', 3)}) AS shingle
  FROM priord JOIN (SELECT DISTINCT id_prior FROM cand) m ON doc_id = m.id_prior
), sz_new AS (SELECT doc_id, count(*) AS n FROM sh_new GROUP BY doc_id),
sz_prior AS (SELECT doc_id, count(*) AS n FROM sh_prior GROUP BY doc_id),
inter AS (
  SELECT c.id_new, c.id_prior, count(*) AS n_inter
  FROM cand c
  JOIN sh_new s1 ON s1.doc_id = c.id_new
  JOIN sh_prior s2 ON s2.doc_id = c.id_prior AND s2.shingle = s1.shingle
  GROUP BY c.id_new, c.id_prior
)
SELECT i.id_new, i.id_prior,
       round(n_inter / (na.n + nb.n - n_inter), 6) AS jaccard
FROM inter i
JOIN sz_new na ON na.doc_id = i.id_new
JOIN sz_prior nb ON nb.doc_id = i.id_prior
WHERE round(n_inter / (na.n + nb.n - n_inter), 6) >= 0.0
ORDER BY id_new, id_prior
"""


def token_document_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top tokens by document frequency (the DF side of TF-IDF): exploded
    distinct (doc, token) pairs -> hash-agg count -> top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .where(F.col("token") != "")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(20)
    )


TOKEN_DF_SQL = """
SELECT token, count(*) AS df
FROM (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents
)
WHERE token != ''
GROUP BY token ORDER BY df DESC, token ASC LIMIT 20
"""


SPECS = [
    QuerySpec("doc_token_stats", doc_token_stats, TOKEN_STATS_SQL, "token counting"),
    QuerySpec("token_document_frequency", token_document_frequency, TOKEN_DF_SQL,
              "document frequency (TF-IDF building block)"),
    QuerySpec("doc_verified_near_dups", doc_verified_near_dups, VERIFIED_DUPS_SQL,
              "LSH candidates + exact Jaccard verification"),
    QuerySpec("doc_quality_by_source", doc_quality_by_source, QUALITY_SQL, "quality scoring"),
    QuerySpec("doc_lang_id", doc_lang_id, LANG_ID_SQL, "language-ID heuristic"),
    QuerySpec("doc_exact_dups", doc_exact_dups, EXACT_DUPS_SQL, "exact dedup"),
    QuerySpec("doc_fingerprints", doc_fingerprints, FINGERPRINT_SQL, "doc fingerprinting"),
    # doc_minhash_signatures lives in catalog_extra since round 3: it is the
    # chain intermediate of doc_lsh_candidates/doc_verified_near_dups (both
    # here), and the driver registry is capped at 50 entries.
    QuerySpec("doc_lsh_candidates", doc_lsh_candidates, LSH_CAND_SQL, "MinHash-LSH pairs"),
    QuerySpec("doc_cross_batch_near_dups", doc_cross_batch_near_dups, CROSS_BATCH_SQL,
              "cross-snapshot incremental dedup: new batch vs persisted "
              "signature table (r5 registry slot via rotation policy)"),
    QuerySpec("doc_simhash", doc_simhash, SIMHASH_Q_SQL, "SimHash fingerprints"),
    QuerySpec("doc_simhash_near_pairs", doc_simhash_near_pairs, SIMHASH_PAIRS_SQL,
              "pigeonhole-blocked SimHash near-pairs vs all-pairs oracle"),
]
