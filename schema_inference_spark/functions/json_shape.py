"""Per-row JSON shape (JSON-Schema) extraction.

The reference's core scalar function (SchemaGenerator.java:46-147) turns each
row's JSON document into a JSON-Schema tree; shapes are then counted across
the corpus. Here:

* ``flat_json_shape_expr`` — for flat JSON objects (string->scalar maps, the
  overwhelmingly common case and the shape of the driver's ``events.props``),
  ``from_json`` (JVM, codegen) extracts the string map and an Arrow-batched
  pandas UDF assembles the canonical shape string with a Python port of the
  type lattice. The previous all-Catalyst form used transform/array_sort
  lambdas, which Spark 4.1.2 evaluates INTERPRETED per row (the 20x MinHash
  lesson); the map hop + compiled-regex lattice measured ~1.7x faster per
  core and adds no shuffle. Extraction semantics are unchanged (same
  from_json), so oracle parity is preserved.
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
import re
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schema_inference_spark.functions.type_inference import (  # noqa: F401
    JSON_TYPE_FOR,
    infer_json_type_sql,
    merge_schemas,
)


_LETTER_PAT = re.compile(r"[a-zA-Z]")
_DIGITS_PAT = re.compile(r"^[0-9]+$")


def _infer_json_type_py(v: str | None) -> str:
    """Python port of ``infer_json_type_expr`` over an extracted string value
    (InferJsonDatatype.java:11-27 rule chain; float/double collapse to
    'number' in JSON-Schema so the after-last-dot quirk is moot here).
    Guards keep Python's float() aligned with SQL try_cast semantics:
    underscores ('1_0') and non-ASCII digits parse in Python but are NULL in
    both engines' casts."""
    if v is None:
        return "null"
    if v.lower() in ("true", "false"):
        return "boolean"
    if _LETTER_PAT.search(v):
        return "string"
    if _DIGITS_PAT.search(v):
        return "integer"
    if "_" not in v and v.isascii():
        try:
            float(v)
            return "number"
        except ValueError:
            pass
    return "null"


_FLAT_PREFIX = '{"type":"object","properties":{'


def _shape_of_map(m) -> str | None:
    if m is None:
        return None
    if not isinstance(m, dict):  # arrow map batches may arrive as [(k, v)]
        m = dict(m)
    pieces = (
        f'"{k}":{{"type":"{_infer_json_type_py(m[k])}"}}' for k in sorted(m)
    )
    return _FLAT_PREFIX + ",".join(pieces) + "}}"


def flat_json_shape_expr(col: Column) -> Column:
    """Canonical JSON-Schema string for a flat JSON-object column.

    ``{"type":"object","properties":{"k":{"type":"integer"},...}}`` with keys
    sorted; null for unparseable rows (filtered like reference P4).
    """
    m = F.from_json(col, "map<string,string>")

    @F.pandas_udf(T.StringType())
    def _assemble(maps: pd.Series) -> pd.Series:
        return maps.map(_shape_of_map)

    return _assemble(m)


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


def _type_first(schema: dict) -> dict:
    """Fixed serialization order: 'type' first, then 'items'/'properties'
    (property NAMES sorted). Matches ``flat_json_shape_expr``'s literal
    assembly so flat and recursive paths produce byte-identical canonical
    strings for the same flat document (they are groupBy keys)."""
    out: dict = {"type": schema["type"]}
    if "items" in schema:
        out["items"] = _type_first(schema["items"])
    if "properties" in schema:
        out["properties"] = {
            k: _type_first(v) for k, v in sorted(schema["properties"].items())
        }
    return out


def canonical_shape_string(value: Any) -> str:
    """Canonical (type-first, sorted-property, compact) serialization of
    ``json_shape_of``."""
    return json.dumps(
        _type_first(json_shape_of(value)), separators=(",", ":"), ensure_ascii=True
    )


def kv_value_schema(v: str | None) -> dict:
    """Schema of one delimited-KV value (reference ProcessColumn.java:62-92 +
    SchemaGenerator): empty/'null' -> null; values that are themselves JSON
    objects/arrays recurse; scalars go through the type lattice (the
    reference assembles a JSON doc embedding raw values, so Jackson's node
    types and the lattice coincide)."""
    if v is None:
        return {"type": "null"}
    v = v.strip()
    if v == "" or v.lower() == "null":
        return {"type": "null"}
    if v[0] in "[{":
        try:
            return json_shape_of(json.loads(v))
        except ValueError:
            pass
    return {"type": _infer_json_type_py(v)}


def kv_schema_of(kv: dict) -> dict:
    """Recursive JSON-Schema of a parsed ^C/^B KV payload — the analog of
    the reference's per-row ObjectNode (ProcessStringColumnAsObjectNode.java
    :24-41). Nested JSON values recurse, unlike the flat path."""
    return {"type": "object", "properties": {k: kv_value_schema(v) for k, v in kv.items()}}


def make_kv_shape_udf():
    """Arrow-batched pandas UDF: map<string,string> KV column -> canonical
    recursive shape string (handles nested-JSON values)."""

    @F.pandas_udf(T.StringType())
    def kv_shape_udf(kvs: pd.Series) -> pd.Series:
        def one(kv):
            if kv is None:
                return None
            if not isinstance(kv, dict):
                kv = dict(kv)
            return json.dumps(
                _type_first(kv_schema_of(kv)), separators=(",", ":"), ensure_ascii=True
            )

        return kvs.map(one)

    return kv_shape_udf


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
