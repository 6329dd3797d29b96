"""PII detection + redaction for training-data curation.

Every serious pretraining pipeline runs a PII scrub (emails, IPs, phone
numbers) before release — the C4/Gopher/FineWeb-style pass. Here it is
pure column expressions (JVM regexp_count / regexp_replace, whole-stage
codegen) with DuckDB SQL twins, so detection counts AND the redacted
text itself are oracle-checkable bit-for-bit.

Pattern rules (cross-engine discipline): the regexes use only syntax
with identical semantics in Java regex (Spark) and RE2 (DuckDB) — no
lookbehind (RE2 has none), no backreferences, ASCII word boundaries,
non-capturing groups. Heuristic by design: an email-shaped token is
redacted whether or not it is deliverable; that is the curation norm
(favor recall, the replacement token is cheap).

Redaction order is FIXED (email -> ipv4 -> phone) and identical in both
engines: the email pattern would otherwise match the user-part of
nothing once '<EMAIL>' is in place, and the phone pattern requires a
leading '+' so it can never eat a redaction marker or an IP.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: redaction applies in this sequence on both engines
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def pii_count_expr(col: Column, kind: str) -> Column:
    """Number of matches of one PII kind (codegen regexp_count)."""
    return F.regexp_count(col, F.lit(_pattern(kind)))


def pii_count_sql(expr: str, kind: str) -> str:
    return f"len(regexp_extract_all({expr}, '{_pattern(kind)}'))"


def redact_expr(col: Column) -> Column:
    """Replace every PII match with its marker, in the fixed kind order."""
    out = col
    for _, pattern, marker in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, marker)
    return out


def redact_sql(expr: str) -> str:
    out = expr
    for _, pattern, marker in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{marker}', 'g')"
    return out


def _pattern(kind: str) -> str:
    for name, pattern, _ in PII_PATTERNS:
        if name == kind:
            return pattern
    raise KeyError(f"unknown PII kind {kind!r}; have {[n for n, _, _ in PII_PATTERNS]}")
