"""Timestamp parsing (reference parity: U2 pieces,
``services/normalizer/normalize.py:233-285``).

The reference accepts ISO-8601 strings (with ``Z`` → ``+00:00``), Unix
epoch numbers, and datetimes; anything else → NULL. In Spark this is a
coalesce fallback chain of native parsers — NULL on failure matches the
reference's warn-and-return-None behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_timestamp_expr(col: Column | str) -> Column:
    """Parse a STRING column that may hold ISO-8601 (optionally with Z or
    offset), or an integer/float Unix epoch in seconds; invalid → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c)
    # try_* variants: NULL on malformed input (reference warns-and-returns-
    # None); required under Spark 4's default ANSI mode, where plain
    # to_timestamp/cast raise on bad input
    iso = F.try_to_timestamp(F.regexp_replace(s, "Z$", "+00:00"))
    # pure number → epoch seconds (fractional allowed)
    is_num = s.rlike(r"^-?[0-9]+(\.[0-9]+)?$")
    epoch = F.timestamp_seconds(s.try_cast("double"))
    return F.when(is_num, epoch).otherwise(iso)
