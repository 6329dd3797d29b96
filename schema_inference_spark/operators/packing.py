"""Sequence packing: assign documents to fixed-token-budget bins.

LLM pretraining consumes fixed-length context windows; feeding one short
document per window wastes most of the tokens. Packing groups documents
into bins whose token totals stay under ``max_tokens`` (greedy first-fit
over size-sorted docs — the standard practical packer).

Scale shape: global first-fit is inherently sequential, so the operator
runs PARTITION-LOCAL first-fit (the industry-standard compromise):

1. docs are range-partitioned by token count (so each partition sees a
   similar size mix and long docs cluster together),
2. each partition packs its own docs with an Arrow-batched
   ``mapInPandas`` (pure numpy/python over one partition, no state
   across partitions),
3. bin ids are globally unique by construction:
   ``bin_id = partition_id * 2^40 + local_bin``.

Per-partition packing loses a little density vs a global packer (bounded
by one underfull bin per partition) but is embarrassingly parallel and
deterministic: the range partitioning + in-partition (tokens desc, id)
sort fixes the order regardless of input layout.

Oversized docs (token_count > max_tokens) get a bin of their own and
``truncated=true`` — the caller decides whether to split or drop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PART_SHIFT = 1 << 40


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    embedding-ingestion precursor (RAG/embedding pipelines consume fixed
    windows, not whole documents).

    Pure whole-stage-codegen: split -> explode(sequence of chunk starts) ->
    slice + array_join. One generator per row, no Python, no shuffle; the
    chunk step is (chunk_tokens - overlap) so consecutive chunks share
    ``overlap`` tokens. Output: (id, chunk_id, chunk_text, n_tokens),
    chunk_id 0-based in document order.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    words = F.split(F.col(text_col), r"\s+")
    # chunk start indices (1-based): 1, 1+step, ... while start <= n
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("_n"), F.lit(1)), F.lit(step)
    )
    chunked = (
        df.select(F.col(id_col), words.alias("_w"), F.size(words).alias("_n"))
        .where(F.col("_n") > 0)
        .select(
            id_col,
            "_w",
            "_n",
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        # drop a trailing start that only re-covers overlap already emitted
        .where((F.col("_start") == 1) | (F.col("_start") + F.lit(overlap) <= F.col("_n") + 1))
        .select(
            id_col,
            "chunk_id",
            F.array_join(F.slice(F.col("_w"), F.col("_start"), chunk_tokens), " ").alias(
                "chunk_text"
            ),
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("_start") + 1
            ).cast("int").alias("n_tokens"),
        )
    )
    return chunked


def chunk_documents_sql(
    id_sql: str = "doc_id",
    text_sql: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
    table: str = "documents",
) -> str:
    """DuckDB oracle computing identical chunks."""
    step = chunk_tokens - overlap
    return f"""
WITH base AS (
  SELECT {id_sql} AS doc_id, regexp_split_to_array({text_sql}, '\\s+') AS w,
         len(regexp_split_to_array({text_sql}, '\\s+')) AS n
  FROM {table}
), starts AS (
  SELECT doc_id, w, n, unnest(range(1, greatest(n, 1) + 1, {step})) AS start,
         generate_subscripts(range(1, greatest(n, 1) + 1, {step}), 1) - 1 AS chunk_id
  FROM base WHERE n > 0
)
SELECT doc_id, chunk_id::INT AS chunk_id,
       array_to_string(list_slice(w, start, start + {chunk_tokens} - 1), ' ') AS chunk_text,
       least({chunk_tokens}, n - start + 1)::INT AS n_tokens
FROM starts
WHERE start = 1 OR start + {overlap} <= n + 1
"""


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_tokens: int = 2048,
    n_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, bin_id, truncated) — every doc assigned to a bin whose
    total token count is <= max_tokens (except single oversized docs)."""
    # keep the caller's id type verbatim: a plain cast('long') on a string
    # doc_id would throw CAST_INVALID_INPUT under ANSI (ADVICE r2); the id
    # only rides along and string ids sort/partition fine
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, {token_col} long, bin_id long, truncated boolean"
    )
    narrow = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
    )
    if n_partitions is not None:
        narrow = narrow.repartitionByRange(n_partitions, token_col, id_col)
    else:
        narrow = narrow.repartitionByRange(token_col, id_col)

    def pack_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = list(pdfs)
        if not chunks:
            return
        rows = pd.concat(chunks)
        if rows.empty:
            return
        rows = rows.sort_values([token_col, id_col], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per local bin
        assignment, truncated = [], []
        for t in rows[token_col].tolist():
            if t > max_tokens:
                bins.append(0)
                assignment.append(len(bins) - 1)
                truncated.append(True)
                continue
            # first-fit over open bins
            for i, cap in enumerate(bins):
                if cap >= t:
                    bins[i] = cap - t
                    assignment.append(i)
                    break
            else:
                bins.append(max_tokens - t)
                assignment.append(len(bins) - 1)
            truncated.append(False)
        rows = rows.assign(
            bin_id=[pid * _PART_SHIFT + b for b in assignment], truncated=truncated
        )
        yield rows[[id_col, token_col, "bin_id", "truncated"]]

    return narrow.mapInPandas(pack_partition, schema=out_schema)
