"""Custom stateful streaming operator: first-seen dedup across micro-batches.

A continuously-landing image table re-delivers rows (at-least-once sources,
backfills); the validation suite must see each image_id once. Spark has no
built-in cross-batch dedup with TTL, so this is the canonical custom
stateful operator via ``applyInPandasWithState``:

* state per image_id group-key bucket: the set of ids already seen;
* each micro-batch emits only rows whose id is new, then merges ids into
  state; a processing-time timeout expires idle buckets (bounded state —
  at 10^12 scale the TTL is what keeps state from growing monotonically).

Keying by a BUCKET of the id (pmod(hash, n_buckets)) instead of the raw id
keeps the state-store row count fixed and the per-group pandas frames
batched — the same salting idea as operators/salting.py applied to
streaming state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    images_stream: DataFrame,
    id_col: str = "image_id",
    n_buckets: int = 64,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame with cross-batch duplicates of ``id_col`` removed
    (first occurrence wins; order within a micro-batch by ascending id).

    ``ttl_ms`` enables the processing-time state TTL. Default off: this
    Spark build (4.1.2) crashes Python workers whenever
    ``GroupStateTimeout.ProcessingTimeTimeout`` is configured (reproduced
    with a minimal two-row job; NoTimeout and array-typed state are fine),
    so the TTL path is opt-in for builds where the timeout works."""
    cols = images_stream.columns
    out_schema = images_stream.schema

    def dedup_bucket(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # NOTE: all state mutation happens BEFORE any yield — the runner may
        # commit state as soon as the generator stops yielding, so post-yield
        # updates are lost/crash the worker.
        # GroupState.get is a property (tuple of the state row's fields)
        seen: set[str] = set(state.get[0]) if state.exists else set()
        outputs: list[pd.DataFrame] = []
        for pdf in pdfs:
            # full-row sort: deterministic winner among same-id rows in a
            # batch (shuffle order is not stable)
            pdf = pdf.sort_values(list(pdf.columns))
            fresh = pdf[~pdf[id_col].isin(seen) & ~pdf[id_col].duplicated()]
            seen.update(fresh[id_col].tolist())
            if len(fresh):
                outputs.append(fresh[cols])
        state.update((sorted(seen),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield from outputs

    bucketed = images_stream.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    return (
        bucketed.groupBy("_bucket")
        .applyInPandasWithState(
            dedup_bucket,
            outputStructType=out_schema,
            stateStructType="seen array<string>",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
