"""Deterministic row-identity hashing (reference parity: U1).

The reference computes the staging primary key as
``md5(lower(ws_norm(company)) || '|' || lower(ws_norm(title)) || '|' ||
lower(ws_norm(location)))`` where ws_norm = trim + collapse runs of
whitespace to a single space. It implements this identically three times
(Python ``services/normalizer/hash_generator.py:53-108``, plpgsql
``scripts/bootstrap_db.sql:167-180``, dbt macro
``dbt/job_dbt/macros/normalize_whitespace.sql:13``). Here it is one native
expression — hash-stable with the reference, Catalyst-optimizable, and
embarrassingly parallel at 100 TB (no shuffle, pure map).

Company identity (``services/enricher/db_operations.py:298``):
``md5(lower(ws_norm(coalesce(company,'unknown'))))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_ws(col: Column | str) -> Column:
    """Strip ALL leading/trailing whitespace — Python ``str.strip()``
    semantics. Spark's ``trim`` strips only spaces (0x20), but the
    reference's authoritative hash path is Python ``.strip()``
    (``hash_generator.py``), which strips tabs/newlines too; a
    hypothesis counterexample ('\\n' location) caught the difference.
    ``(?U)`` makes Java's ``\\s`` match Unicode White_Space (NBSP, thin
    space, …) like Python's — a bare ``\\s`` is ASCII-only in Java and
    would give NBSP-padded names a different hash than the reference.
    (Python alone also strips \\x1c-\\x1f, which are not Unicode
    White_Space; that corner is accepted.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(?U)(^\s+)|(\s+$)", "")


def ws_normalize(col: Column | str) -> Column:
    """Strip + collapse internal whitespace runs to a single space."""
    return F.regexp_replace(strip_ws(col), r"(?U)\s+", " ")


def hash_key_expr(company: Column | str, title: Column | str, location: Column | str) -> Column:
    """32-hex-char MD5 identity of (company, title, location), case- and
    whitespace-insensitive. Inputs are required non-null upstream
    (normalize validation); a NULL part coalesces to '' EXPLICITLY —
    bare ``concat_ws`` would drop the NULL part's separator too
    ('b|c', not '|b|c'), silently colliding ('', b, c) with (b, c, '')."""
    parts = [
        F.lower(ws_normalize(F.coalesce(F.col(c) if isinstance(c, str) else c, F.lit(""))))
        for c in (company, title, location)
    ]
    return F.md5(F.concat_ws("|", *parts))


def company_id_expr(company: Column | str) -> Column:
    """MD5 of the normalized, lowercased company name; NULL → 'unknown'."""
    c = F.col(company) if isinstance(company, str) else company
    return F.md5(F.lower(ws_normalize(F.coalesce(c, F.lit("unknown")))))
