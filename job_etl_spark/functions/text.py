"""Text semantics from the reference, as native column expressions.

Seniority extraction (reference parity: U4, ``services/common/
seniority_extractor.py:18-151``): an ORDER-SENSITIVE cascade — roman
numerals III→II→I (substring checks, not word boundaries), L-levels
(L5+ senior, L4 intermediate, L1-3 fall through), executive keywords,
intern, then senior/intermediate/junior keyword tiers, else 'unknown'.

The cascade is declared ONCE as a data spec and rendered to BOTH a Spark
Column and a DuckDB SQL string, so the engine and the correctness oracle
cannot drift apart.

Enum validation (U2, ``services/normalizer/normalize.py:186-230``):
NULL/empty/non-member → default; members are matched after lower+strip.

Company-name cleanup (J7, ``services/enricher/company_matcher.py:23-42``):
strip 18 legal-suffix regexes, trailing punctuation, collapse whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Seniority cascade spec. Each entry: (level, [condition...]) where condition
# is ('contains'|'startswith'|'endswith'|'regex', pattern). Conditions within
# an entry are OR'd; entries are evaluated in order on lower(title).
# Mirrors services/common/seniority_extractor.py:44-148 exactly, including
# its substring (non-word-boundary) roman-numeral checks.
# ---------------------------------------------------------------------------
_SENIORITY_CASCADE: list[tuple[str, list[tuple[str, str]]]] = [
    # " iii" substring subsumes "level iii"/"engineer iii"/endswith/comma variants
    ("senior", [("contains", " iii"), ("startswith", "iii")]),
    (
        "intermediate",
        [
            ("contains", " ii "),
            ("contains", "level ii"),
            ("startswith", "ii "),
            ("endswith", " ii"),
            ("contains", " ii,"),
            ("contains", " ii)"),
            ("contains", " ii/"),
            ("contains", "engineer ii"),
        ],
    ),
    (
        "junior",
        [
            ("contains", "level i"),
            ("contains", " i "),
            ("startswith", "i "),
            ("endswith", " i"),
            ("contains", " i,"),
            ("contains", " i)"),
            ("contains", " i/"),
            ("contains", "engineer i "),
            ("contains", "engineer i)"),
        ],
    ),
    # L-levels handled specially between these entries (see renderers)
    (
        "senior",
        [
            ("regex", r"\bchief\b"),
            ("regex", r"\bvp\b"),
            ("regex", r"\bvice president\b"),
            ("regex", r"\bhead of\b"),
            ("regex", r"\bdirector\b"),
            ("regex", r"\bmanager\b"),
            ("regex", r"\badvanced\b"),
        ],
    ),
    ("junior", [("regex", r"\bintern\b")]),
    (
        "senior",
        [
            ("regex", r"\bsenior\b"),
            ("regex", r"\bsr\.?\b"),
            ("regex", r"\blead\b"),
            ("regex", r"\bprincipal\b"),
            ("regex", r"\bstaff\b"),
            ("regex", r"\barchitect\b"),
        ],
    ),
    (
        "intermediate",
        [
            ("regex", r"\bintermediate\b"),
            ("regex", r"\bmid-level\b"),
            ("regex", r"\bmid level\b"),
            ("regex", r"\bmid\b"),
        ],
    ),
    (
        "junior",
        [
            ("regex", r"\bjunior\b"),
            ("regex", r"\bjr\.?\b"),
            ("regex", r"\bassociate\b"),
            ("regex", r"\bentry-level\b"),
            ("regex", r"\bentry level\b"),
            ("regex", r"\bentry\b"),
        ],
    ),
]

# The roman-numeral entries precede the L-level check; the keyword entries
# follow it. Index where the L-level check is inserted:
_LLEVEL_AT = 3
_LLEVEL_RE = r"\bl([4-9]|[1-9][0-9]+)\b"  # applied to lowered title


def _ascii_word_boundaries(pat: str) -> str:
    """Rewrite edge ``\\b`` to explicit ASCII character classes.

    The three render targets disagree on ``\\b``: Java (Spark rlike) is
    Unicode-aware — a CJK char counts as a word char, so ``\\bjunior``
    does NOT match '日本語junior' — while RE2 (DuckDB) is ASCII-only and
    DOES match (found by fuzz_parity family #7). Explicit classes pin one
    semantics in every engine. Input is lower()ed upstream, so the ASCII
    word class is [a-z0-9_]. Non-capturing groups keep ``regexp_extract``
    group numbering stable."""
    import re as _re

    if pat.startswith(r"\b"):
        pat = r"(?:^|[^a-z0-9_])" + pat[2:]
    # an edge \b token must not itself be an escaped backslash + literal b
    if _re.search(r"(?<!\\)(?:\\\\)*\\b$", pat):
        pat = _re.sub(r"\\b$", r"(?:[^a-z0-9_]|$)", pat)
    # a \b TOKEN is a backslash preceded by an even number of backslashes
    # followed by 'b' — a literal \\b (escaped backslash, then 'b') is fine.
    # ValueError, not assert: the guard must survive python -O.
    if _re.search(r"(?<!\\)(?:\\\\)*\\b", pat):
        raise ValueError(f"interior \\b unsupported: {pat}")
    return pat


def _cond_column(t: Column, kind: str, pat: str) -> Column:
    if kind == "contains":
        return t.contains(pat)
    if kind == "startswith":
        return t.startswith(pat)
    if kind == "endswith":
        return t.endswith(pat)
    if kind == "regex":
        return t.rlike(_ascii_word_boundaries(pat))
    raise ValueError(kind)


def seniority_level_expr(title: Column | str) -> Column:
    """Native when/otherwise cascade; order-sensitive per the reference."""
    c = F.col(title) if isinstance(title, str) else title
    t = F.lower(c)
    branches: list[tuple[Column, Column]] = []
    for i, (level, conds) in enumerate(_SENIORITY_CASCADE):
        if i == _LLEVEL_AT:
            # the capture is a single digit 4-9 or a multi-digit number
            # >= 10, so ">= 5" reduces to "not '4'" — deliberately
            # cast-free: under ANSI mode CAST('2147483648' AS INT) THROWS,
            # so one adversarial title ("l99999999999…") would kill a
            # whole 100 TB job (found by fuzz_parity family #7)
            lvl_num = F.regexp_extract(t, _ascii_word_boundaries(_LLEVEL_RE), 1)
            branches.append(((lvl_num != "") & (lvl_num != "4"), F.lit("senior")))
            branches.append((lvl_num == "4", F.lit("intermediate")))
        acc = _cond_column(t, *conds[0])
        for kind, pat in conds[1:]:
            acc = acc | _cond_column(t, kind, pat)
        branches.append((acc, F.lit(level)))
    out = F.lit("unknown")
    for cond, val in reversed(branches):
        out = F.when(cond, val).otherwise(out)
    return F.when(c.isNull() | (c == ""), F.lit("unknown")).otherwise(out)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _cond_sql(t: str, kind: str, pat: str, dialect: str) -> str:
    if kind == "contains":
        return f"position({_sql_quote(pat)} in {t}) > 0"
    if kind == "startswith":
        like = pat.replace("%", r"\%").replace("_", r"\_")
        return f"{t} LIKE {_sql_quote(like + '%')}"
    if kind == "endswith":
        like = pat.replace("%", r"\%").replace("_", r"\_")
        return f"{t} LIKE {_sql_quote('%' + like)}"
    if kind == "regex":
        pat = _ascii_word_boundaries(pat)
        if dialect == "spark":
            # Spark SQL single-quoted literals process backslash escapes
            return f"{t} rlike {_sql_quote(pat.replace(chr(92), chr(92) * 2))}"
        return f"regexp_matches({t}, {_sql_quote(pat)})"
    raise ValueError(kind)


def seniority_case_sql(title_expr: str, dialect: str = "duckdb") -> str:
    """The same cascade as ``seniority_level_expr`` rendered as one SQL CASE
    expression (dialect 'duckdb' or 'spark') — used as the oracle twin."""
    t = f"lower({title_expr})"
    ll = _ascii_word_boundaries(_LLEVEL_RE)
    if dialect == "spark":
        ll = ll.replace("\\", "\\\\")
    lvl = f"regexp_extract({t}, {_sql_quote(ll)}, 1)"
    whens: list[str] = []
    for i, (level, conds) in enumerate(_SENIORITY_CASCADE):
        if i == _LLEVEL_AT:
            # cast-free on purpose — see seniority_level_expr: the capture
            # is a single digit 4-9 or >= 10, and ANSI CAST overflow throws
            whens.append(f"WHEN {lvl} <> '' AND {lvl} <> '4' THEN 'senior'")
            whens.append(f"WHEN {lvl} = '4' THEN 'intermediate'")
        ors = " OR ".join(_cond_sql(t, k, p, dialect) for k, p in conds)
        whens.append(f"WHEN {ors} THEN '{level}'")
    body = " ".join(whens)
    return (
        f"CASE WHEN {title_expr} IS NULL OR {title_expr} = '' THEN 'unknown' "
        f"{body} ELSE 'unknown' END"
    )


# ---------------------------------------------------------------------------
# Enum validation (normalize.py:186-230)
# ---------------------------------------------------------------------------


def validate_enum_expr(col: Column | str, valid: list[str], default: str) -> Column:
    """lower+strip the value; keep it if in ``valid``, else ``default``.
    NULL/'' → default. (Reference logs-and-defaults; the engine exposes the
    reject stream separately via operators.dq.)"""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(c))
    return F.when(c.isNull() | (c == ""), F.lit(default)).otherwise(
        F.when(norm.isin(valid), norm).otherwise(F.lit(default))
    )


# ---------------------------------------------------------------------------
# Company-name cleanup for fuzzy matching (company_matcher.py:23-42,68-94)
# ---------------------------------------------------------------------------

_COMPANY_SUFFIXES = [
    r"\bInc\.?\b",
    r"\bLLC\.?\b",
    r"\bLtd\.?\b",
    r"\bCorp\.?\b",
    r"\bCorporation\b",
    r"\bCo\.?\b",
    r"\bLP\.?\b",
    r"\bLLP\.?\b",
    r"\bPC\.?\b",
    r"\bP\.C\.\b",
    r"\bPLLC\.?\b",
    r"\bPLC\.?\b",
    r"\bGmbH\b",
    r"\bAG\b",
    r"\bSA\b",
    r"\bS\.A\.\b",
    r"\bS\.L\.\b",
    r"\bS\.R\.L\.\b",
]


def clean_company_name_expr(col: Column | str) -> Column:
    """Strip legal suffixes (case-insensitive), trailing punctuation, collapse
    whitespace, lowercase — the normalization both sides of the fuzzy join get."""
    from job_etl_spark.functions.identity import ws_normalize

    c = F.col(col) if isinstance(col, str) else col
    out = c
    for suf in _COMPANY_SUFFIXES:
        out = F.regexp_replace(out, "(?i)" + suf, "")
    out = F.regexp_replace(out, r"[\s,.\-]+$", "")
    return F.lower(ws_normalize(out))
