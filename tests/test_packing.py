"""Sequence packing: budget invariants, completeness, determinism, density."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_inference_spark.functions import text as TX
from schema_inference_spark.operators.packing import pack_documents
from schema_inference_spark.sources.tables import load_table


def _packed(spark, sf_dir, max_tokens=512):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count_expr(F.col("text")).cast("long").alias("n_tokens")
    )
    return docs, pack_documents(docs, max_tokens=max_tokens, n_partitions=4)


def test_packing_budget_and_completeness(spark, sf_dir):
    docs, packed = _packed(spark, sf_dir)
    packed_rows = packed.collect()
    n_docs = docs.count()
    assert len(packed_rows) == n_docs  # every doc packed exactly once
    assert len({r["doc_id"] for r in packed_rows}) == n_docs

    # no non-truncated bin exceeds the budget
    over = (
        packed.where(~F.col("truncated"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("total"))
        .where(F.col("total") > 512)
        .count()
    )
    assert over == 0
    # oversized docs are alone in their bin and flagged
    trunc_bins = packed.where(F.col("truncated")).select("bin_id")
    assert (
        packed.join(trunc_bins, "bin_id", "left_semi")
        .groupBy("bin_id")
        .count()
        .where(F.col("count") > 1)
        .count()
        == 0
    )


def test_packing_is_deterministic_and_dense(spark, sf_dir):
    docs, packed = _packed(spark, sf_dir)
    a = sorted((r["doc_id"], r["bin_id"]) for r in packed.collect())
    b = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(
            docs.repartition(13), max_tokens=512, n_partitions=4
        ).collect()
    )
    assert a == b  # layout-independent assignment

    # the r4 failure shape: input ALREADY hash-partitioned on the id (any
    # upstream join/agg on it does this). The old physical-partition packer
    # let Catalyst elide its repartition exchange and AQE then coalesced the
    # surviving shuffle reads to a parallelism-dependent count — bins
    # changed between local[1] and local[4]. Group membership must be a
    # pure function of the id, whatever the incoming partitioning.
    c = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(
            docs.repartition(3, "doc_id"), max_tokens=512, n_partitions=4
        ).collect()
    )
    assert a == c  # immune to pre-existing hash partitioning on the id

    # density: used bins should be mostly full (first-fit over desc sizes).
    stats = (
        packed.where(~F.col("truncated"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("total"))
        .agg(F.avg("total").alias("avg_fill"), F.count(F.lit(1)).alias("n_bins"))
        .collect()[0]
    )
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    lower_bound_bins = total_tokens / 512
    assert stats["n_bins"] <= 1.3 * lower_bound_bins + 4  # near-optimal bin count


def test_ffd_kernel_matches_per_doc_reference():
    """The vectorized run-based FFD kernel must be BIT-identical to the
    textbook per-doc first-fit loop (independent implementation here) on
    adversarial size mixes: long equal-size runs, oversized docs, zeros,
    sizes that exactly fill bins, and random mixes."""
    import numpy as np

    from schema_inference_spark.operators.packing import _ffd_assign

    def reference(toks, max_tokens):
        bins, assignment, truncated = [], [], []
        for t in toks:
            if t > max_tokens:
                bins.append(0)
                assignment.append(len(bins) - 1)
                truncated.append(True)
                continue
            for i, cap in enumerate(bins):
                if cap >= t:
                    bins[i] = cap - t
                    assignment.append(i)
                    break
            else:
                bins.append(max_tokens - t)
                assignment.append(len(bins) - 1)
            truncated.append(False)
        return assignment, truncated

    rng = np.random.RandomState(7)
    cases = [
        np.full(500, 30),                          # the all-equal curation shape
        np.array([700, 600, 512, 512, 30, 30, 0, 0]),  # oversized + exact + zeros
        np.zeros(5, dtype=int),                    # zeros only, no open bin
        np.sort(rng.randint(0, 600, size=2000))[::-1],  # random with oversized
        np.sort(rng.choice([512, 256, 171, 128, 1], size=3000))[::-1],  # divisor sizes
    ]
    for toks in cases:
        toks = np.ascontiguousarray(np.sort(np.asarray(toks, dtype=np.int64))[::-1])
        got_a, got_t = _ffd_assign(toks, 512)
        exp_a, exp_t = reference(toks.tolist(), 512)
        assert got_a.tolist() == exp_a, toks[:20]
        assert got_t.tolist() == exp_t, toks[:20]

    # negative token counts are invalid input and must fail LOUDLY (a
    # negative size would grow bin capacity under first-fit arithmetic)
    import pytest

    with pytest.raises(ValueError, match="negative token counts"):
        _ffd_assign(np.array([30, 10, -1], dtype=np.int64), 512)


def test_ffd_kernel_fuzz_vs_reference():
    """Property fuzz of the vectorized FFD kernel against the independent
    per-doc loop: arbitrary size mixes (incl. zeros, oversized, heavy
    ties) and budgets must agree EXACTLY."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from schema_inference_spark.operators.packing import _ffd_assign

    def reference(toks, max_tokens):
        bins, assignment, truncated = [], [], []
        for t in toks:
            if t > max_tokens:
                bins.append(0)
                assignment.append(len(bins) - 1)
                truncated.append(True)
                continue
            for i, cap in enumerate(bins):
                if cap >= t:
                    bins[i] = cap - t
                    assignment.append(i)
                    break
            else:
                bins.append(max_tokens - t)
                assignment.append(len(bins) - 1)
            truncated.append(False)
        return assignment, truncated

    @settings(max_examples=150, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=0, max_value=80), max_size=200),
        budget=st.integers(min_value=1, max_value=64),
    )
    def check(toks, budget):
        arr = np.ascontiguousarray(np.sort(np.asarray(toks, dtype=np.int64))[::-1])
        got_a, got_t = _ffd_assign(arr, budget)
        exp_a, exp_t = reference(arr.tolist(), budget)
        assert got_a.tolist() == exp_a
        assert got_t.tolist() == exp_t

    check()


def test_packing_keeps_string_ids(spark):
    """ADVICE r2: a non-numeric string doc_id must pack fine under ANSI
    (the old cast('long') threw CAST_INVALID_INPUT) and come back verbatim."""
    df = spark.createDataFrame(
        [("doc-a", 100), ("doc-b", 300), ("doc-c", 450)], "doc_id string, n_tokens int"
    )
    rows = pack_documents(df, max_tokens=512, n_partitions=2).collect()
    assert {r["doc_id"] for r in rows} == {"doc-a", "doc-b", "doc-c"}
    assert all(isinstance(r["doc_id"], str) for r in rows)
    assert not any(r["truncated"] for r in rows)


def test_chunking_reconstructs_documents(spark):
    """Invariant: stripping the overlap from every chunk after the first and
    concatenating reconstructs the original token sequence exactly — no
    token lost or duplicated, for documents of many lengths around the
    chunk/step boundaries."""
    from schema_inference_spark.operators.packing import chunk_documents

    chunk, overlap = 16, 4
    step = chunk - overlap
    lengths = [1, 2, step, step + 1, chunk - 1, chunk, chunk + 1,
               2 * step, 2 * step + overlap, 5 * chunk, 97]
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, n in enumerate(lengths):
        chunks = [t for _, t in sorted(by_doc[i])]
        rebuilt = chunks[0].split(" ")
        for c in chunks[1:]:
            rebuilt += c.split(" ")[overlap:]
        assert rebuilt == rows[i][1].split(" "), (i, n)


def test_tokenizer_override_flows_through_packing_and_chunking(spark):
    """Tokenizer swap point (VERDICT r4 #4): a custom token counter passed
    as ``token_count_expr`` must drive pack_documents' bin budgets (derived
    from text, not a precomputed column) and chunk_documents' reported
    n_tokens. The custom counter here is chars-per-text — deliberately NOT
    the word count, so any fallback to the default is visible."""
    from schema_inference_spark.functions.text import get_token_counter
    from schema_inference_spark.operators.packing import chunk_documents

    rows = [(f"d{i:02d}", " ".join(["word"] * (i + 1))) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    char_counter = lambda c: F.length(c).cast("long")  # noqa: E731

    packed = pack_documents(
        df, max_tokens=40, n_partitions=2, token_count_expr=char_counter
    ).collect()
    by_id = {r["doc_id"]: r for r in packed}
    for doc_id, text in rows:
        assert by_id[doc_id]["n_tokens"] == len(text)  # derived, not word count
        assert by_id[doc_id]["truncated"] == (len(text) > 40)
    # budgets hold under the CUSTOM metric
    bins: dict = {}
    for r in packed:
        if not r["truncated"]:
            bins[r["bin_id"]] = bins.get(r["bin_id"], 0) + r["n_tokens"]
    assert bins and all(total <= 40 for total in bins.values())

    chunks = chunk_documents(
        df, chunk_tokens=4, overlap=1, token_count_expr=char_counter
    ).collect()
    assert chunks
    for r in chunks:
        assert r["n_tokens"] == len(r["chunk_text"])

    # the registry resolves built-ins and rejects unknown names
    expr_fn, sql_fn = get_token_counter("bpe_ish")
    got = df.select(expr_fn(F.col("text")).alias("n")).collect()
    assert all(r["n"] >= 1 for r in got)
    try:
        get_token_counter("nope")
        raise AssertionError("unknown counter must raise")
    except KeyError as e:
        assert "bpe_ish" in str(e) and "ws" in str(e)
