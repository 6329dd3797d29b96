"""Per-row JSON shape (JSON-Schema) extraction.

The reference's core scalar function (SchemaGenerator.java:46-147) turns each
row's JSON document into a JSON-Schema tree; shapes are then counted across
the corpus. Here:

* ``flat_json_shape_expr`` — for flat JSON objects (string->scalar maps, the
  overwhelmingly common case and the shape of the driver's ``events.props``),
  the shape is built entirely from Catalyst built-ins: ``from_json`` to a
  string map, key sort, per-value type lattice, canonical-string assembly.
  JVM-side, codegen'd, no Python.
* ``json_shape_of`` / ``make_shape_udf`` — the fully recursive version
  (nested objects, arrays with element-schema merging, reference
  SchemaGenerator.java:56-89) as an Arrow-batched pandas UDF for payloads the
  flat path can't express. Python, but vectorized per Arrow batch.

Canonical form (sorted keys, no whitespace) so that equal shapes compare
equal as strings — the distributed groupBy key is this string, exactly like
the reference's ObjectNode value-equality groupBy (SeqFilesScan.java:297-316).
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schema_inference_spark.functions.type_inference import (
    JSON_TYPE_FOR,
    infer_json_type_expr,
    infer_json_type_sql,
    merge_schemas,
)


def flat_json_shape_expr(col: Column) -> Column:
    """Canonical JSON-Schema string for a flat JSON-object column.

    ``{"type":"object","properties":{"k":{"type":"integer"},...}}`` with keys
    sorted; null for unparseable rows (filtered like reference P4).
    """
    # One transform over sorted (key, value) entries. Higher-order functions
    # evaluate interpreted (outside whole-stage codegen), so the hot loop is
    # kept to a single lambda over map_entries — no per-key element_at
    # lookups, no repeated from_json evaluation.
    m = F.from_json(col, "map<string,string>")
    entries = F.transform(
        F.array_sort(F.map_entries(m)),
        lambda e: F.concat(
            F.lit('"'),
            e["key"],
            F.lit('":{"type":"'),
            infer_json_type_expr(e["value"]),
            F.lit('"}'),
        ),
    )
    return F.when(
        m.isNotNull(),
        F.concat(
            F.lit('{"type":"object","properties":{'),
            F.array_join(entries, ","),
            F.lit("}}"),
        ),
    )


def flat_json_shape_sql(col_sql: str) -> str:
    """DuckDB-compatible SQL computing the identical canonical shape string."""
    val = f"json_extract_string({col_sql}, '$.' || k)"
    type_case = infer_json_type_sql(val)
    # coalesce: DuckDB's array_to_string([]) is NULL (Spark's array_join is '')
    return (
        '\'{"type":"object","properties":{\' || coalesce(array_to_string('
        f"list_transform(list_sort(json_keys({col_sql})), "
        f"k -> '\"' || k || '\":{{\"type\":\"' || ({type_case}) || '\"}}'"
        "), ','), '') || '}}'"
    )


# ---------------------------------------------------------------------------
# Recursive shape (pandas UDF path) — mirrors SchemaGenerator.java:46-119.
# ---------------------------------------------------------------------------


def json_shape_of(value: Any) -> dict:
    """JSON-Schema dict of a parsed JSON value (recursive).

    Objects recurse per key (SchemaGenerator.java:56-66); arrays merge the
    schemas of their items (SchemaGenerator.java:68-89, via the same widening
    lattice used for cross-row merging); scalars map bool->boolean,
    int->integer, float->number, str->string, None->null
    (SchemaGenerator.java:121-147, Long coerced to integer at :138-141).
    """
    if isinstance(value, dict):
        return {
            "type": "object",
            "properties": {k: json_shape_of(v) for k, v in value.items()},
        }
    if isinstance(value, list):
        items: dict | None = None
        for item in value:
            items = merge_schemas(items, json_shape_of(item))
        out = {"type": "array"}
        if items is not None:
            out["items"] = items
        return out
    if isinstance(value, bool):
        return {"type": "boolean"}
    if isinstance(value, int):
        return {"type": "integer"}
    if isinstance(value, float):
        return {"type": "number"}
    if isinstance(value, str):
        return {"type": "string"}
    return {"type": "null"}


def canonical_shape_string(value: Any) -> str:
    """Canonical (sorted-key, compact) serialization of ``json_shape_of``."""
    return json.dumps(json_shape_of(value), sort_keys=True, separators=(",", ":"))


def make_shape_udf():
    """Arrow-batched pandas UDF: JSON document string -> canonical shape string."""

    @F.pandas_udf(T.StringType())
    def shape_udf(docs: pd.Series) -> pd.Series:
        def one(doc):
            if doc is None:
                return None
            try:
                return canonical_shape_string(json.loads(doc))
            except (ValueError, TypeError):
                return None  # malformed rows -> null, filtered like reference P4

        return docs.map(one)

    return shape_udf


__all__ = [
    "JSON_TYPE_FOR",
    "flat_json_shape_expr",
    "flat_json_shape_sql",
    "json_shape_of",
    "canonical_shape_string",
    "make_shape_udf",
]
