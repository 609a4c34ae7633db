"""Shared query-name resolution for the scripts/ tools.

Exact registry names win; otherwise a UNIQUE prefix resolves. An
ambiguous prefix (e.g. 'q1' matches q101…q162, 'q12' matches q120…q129)
raises instead of silently running the first match — these tools gate
correctness claims (oracle_check) and perf evidence (profile_*), so a
wrong-query run must be loud (ADVICE r11)."""

from __future__ import annotations

from collections.abc import Iterable


def resolve_query(names: Iterable[str], prefix: str) -> str:
    names = list(names)
    if prefix in names:
        return prefix
    matches = [n for n in names if n.startswith(prefix)]
    if not matches:
        raise SystemExit(f"{prefix}: no query matches")
    if len(matches) > 1:
        raise SystemExit(
            f"{prefix}: ambiguous prefix, matches {', '.join(sorted(matches)[:8])}"
            + (" …" if len(matches) > 8 else "")
        )
    return matches[0]
