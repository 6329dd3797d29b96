"""Value-type inference + type-widening lattice.

Reproduces the reference's scalar type rules as a single Catalyst CASE
cascade (JVM-side, codegen'd — zero Python on the hot path):

rule chain (reference InferJsonDatatype.java:11-27, CommonUtils.java:64-109):
  1. "true"/"false" (case-insensitive)                       -> boolean
  2. contains any letter  (regex .*[a-zA-Z]+.*)              -> string
  3. all digits (commons-lang3 isNumeric: digits only)       -> integer
  4. >3 chars after the LAST '.' and parseable as double     -> double
     (quirk preserved: with no '.' the WHOLE string counts,
      InferJsonDatatype.java:47-49 substring(lastIndexOf+1))
  5. parseable as float                                      -> float
  6. otherwise                                               -> null

Type-widening lattice for merging two schemas that disagree on a field
(reference MergeBiFunction.java:19-48):
  null < anything;  anything v string = string;  float v double = double;
  otherwise the RIGHT-hand side wins (last-write, MergeBiFunction.java:47).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# inferred scalar type -> JSON-Schema type (reference SchemaGenerator.java:121-147;
# Long coerced to "integer" at :138-141, Float/Double both -> "number")
JSON_TYPE_FOR = {
    "boolean": "boolean",
    "string": "string",
    "integer": "integer",
    "double": "number",
    "float": "number",
    "null": "null",
}

_LETTER_RE = "[a-zA-Z]"
_ALL_DIGITS_RE = "^[0-9]+$"


def infer_type_expr(col: Column) -> Column:
    """Inferred-type name ('boolean'|'string'|'integer'|'double'|'float'|'null')
    for a string column, as a pure built-in expression."""
    # chars after the last '.'; when there is no '.', the whole string
    # (reference quirk: substring(lastIndexOf('.')+1) with lastIndexOf == -1).
    after_dot = F.when(
        F.instr(col, ".") > 0, F.regexp_extract(col, r"\.([^.]*)$", 1)
    ).otherwise(col)
    return (
        F.when(F.lower(col).isin("true", "false"), F.lit("boolean"))
        .when(col.rlike(_LETTER_RE), F.lit("string"))
        .when(col.rlike(_ALL_DIGITS_RE), F.lit("integer"))
        .when(
            (F.length(after_dot) > 3) & col.try_cast("double").isNotNull(), F.lit("double")
        )
        .when(col.try_cast("float").isNotNull(), F.lit("float"))
        .otherwise(F.lit("null"))
    )


def infer_type_sql(col_sql: str) -> str:
    """The same rule chain as ANSI SQL (DuckDB-compatible), for oracle parity."""
    after_dot = (
        f"CASE WHEN strpos({col_sql}, '.') > 0 "
        f"THEN regexp_extract({col_sql}, '\\.([^.]*)$', 1) ELSE {col_sql} END"
    )
    return (
        "CASE "
        f"WHEN lower({col_sql}) IN ('true','false') THEN 'boolean' "
        f"WHEN regexp_matches({col_sql}, '[a-zA-Z]') THEN 'string' "
        f"WHEN regexp_matches({col_sql}, '^[0-9]+$') THEN 'integer' "
        f"WHEN length({after_dot}) > 3 AND try_cast({col_sql} AS DOUBLE) IS NOT NULL THEN 'double' "
        f"WHEN try_cast({col_sql} AS FLOAT) IS NOT NULL THEN 'float' "
        "ELSE 'null' END"
    )


def infer_json_type_expr(col: Column) -> Column:
    """JSON-Schema type name for a string column (float/double -> 'number')."""
    t = infer_type_expr(col)
    return F.when(t.isin("double", "float"), F.lit("number")).otherwise(t)


def infer_json_type_sql(col_sql: str) -> str:
    t = infer_type_sql(col_sql)
    return f"CASE WHEN ({t}) IN ('double','float') THEN 'number' ELSE ({t}) END"


# ---------------------------------------------------------------------------
# Driver-side merge lattice (runs only over the tiny top-k collected set).
# ---------------------------------------------------------------------------


def merge_type(left: str, right: str) -> str:
    """Widen two JSON-Schema type names (reference MergeBiFunction.java:19-48).

    null < anything; anything v string = string; float v double = double;
    integer v number = number (numeric widening); otherwise right wins.
    """
    if left == right:
        return left
    if left == "null":
        return right
    if right == "null":
        return left
    if "string" in (left, right):
        return "string"
    if {left, right} == {"float", "double"}:
        return "double"
    if {left, right} == {"integer", "number"}:
        return "number"
    return right  # reference last-write-wins quirk (MergeBiFunction.java:47)


def merge_schemas(left: dict, right: dict) -> dict:
    """Recursively merge two JSON-Schema dicts into a superset schema.

    Mirrors the reference's map-difference merge (CompareMaps.java:35-132 +
    CompareSchemas.java:18-42): union of fields; common fields widen via
    the lattice; nested objects recurse; arrays merge their item schemas.
    Runs on the driver over <= top-k schemas only — never distributed.
    """
    if left is None:
        return right
    if right is None:
        return left
    lt, rt = left.get("type"), right.get("type")
    if lt == "object" and rt == "object":
        props = dict(left.get("properties", {}))
        for key, rschema in right.get("properties", {}).items():
            props[key] = merge_schemas(props.get(key), rschema)
        return {"type": "object", "properties": props}
    if lt == "array" and rt == "array":
        return {"type": "array", "items": merge_schemas(left.get("items"), right.get("items"))}
    if isinstance(lt, str) and isinstance(rt, str):
        if lt in ("object", "array") or rt in ("object", "array"):
            # structural vs scalar conflict: right wins (reference last-write).
            return right
        return {"type": merge_type(lt, rt)}
    return right
