"""PII detection + redaction — native regexp expressions (JVM-side).

Training-data pipelines scrub personally identifiable information before
anything reaches a training set. Detection and redaction here are pure
``regexp_count`` / ``regexp_replace`` chains — whole-stage-codegen'd,
no Python in the hot path, linear map-only work that scales with
executors and never shuffles.

Patterns deliberately stay in the Java-regex ∩ RE2 common dialect
(character classes, bounded repeats, \\b — no lookaround, no
backreferences) so the DuckDB oracle twin matches bit-for-bit and the
same spec could compile into any engine. Counting happens on the
ORIGINAL text per type (independent of redaction order); redaction
applies types in a fixed order. The patterns are intentionally
high-recall/simple — a production scrubber would add checksums
(Luhn), context windows, and locale formats on top of the same plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — patterns are mutually non-overlapping on
# well-formed inputs: SSN (3-2-4 digits) vs phone (3-3-4) differ in group
# shape; IPs are dotted digits; emails require an alphanumeric local part.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts on the raw text (pre-redaction)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("bigint")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII span with its type token, in PII_PATTERNS order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def sql_pii_counts(text_expr: str) -> dict[str, str]:
    """DuckDB twins (len(regexp_extract_all) ≡ regexp_count)."""
    return {
        f"n_{name}": f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        for name, pat, _ in PII_PATTERNS
    }


def sql_redact_pii(text_expr: str) -> str:
    out = text_expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out
