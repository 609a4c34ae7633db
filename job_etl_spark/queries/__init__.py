"""Declared query inventory — the engine's correctness surface.

Each entry pairs a PySpark implementation with a DuckDB oracle SQL twin
(ANSI SQL over the same parquet tables). The driver runs both at sf0.01
and compares row count + schema + order-insensitive value hash, so every
query here follows the parity rules in ``queries._util``:

- aggregates of doubles go through exact DECIMAL arithmetic, then a final
  cast to double (bit-exact across engines; raw double SUM is
  order-dependent and raw ``round(double)`` differs between engines);
- instant timestamps (events.ts) are emitted as epoch-microsecond BIGINTs;
  TIMESTAMP_NTZ columns (TPC-H dates) are emitted raw;
- every LIMIT is preceded by a total order (unique tie-break column);
- arrays are sorted + de-duplicated before output.
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import os
import re
import sys
import types
from pathlib import Path

from job_etl_spark.queries._util import Query
from job_etl_spark.queries import (
    relational,
    domain,
    lifedata,
    scaleops,
    sketches,
    curation,
    modelprep,
    observability,
    graphs,
    timeseries,
    evaluation,
)


def _last_verified_round() -> dict[str, int]:
    """Map query name -> rotation key from the CORRECTNESS_r*.json history.

    The driver verifies only the first 50 registry entries per round, so
    the registry is ordered: queries whose LATEST check was not green
    FIRST (key −2 — a failing query must re-enter the window immediately
    so its fix lands in the next CORRECTNESS file, even when a backlog of
    never-verified queries exists), then never-verified (key −1), then
    green queries stalest-first (key = round of last green row). Every
    query cycles through the window within a few rounds without manual
    reordering.
    """
    root = Path(__file__).resolve().parents[2]
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            green = isinstance(row, dict) and (
                row.get("hash_match") is True
                or (row.get("hash_match") is None and row.get("rows_match") is True)
            )
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, green)
    return {
        name: (rnd if green else -2) for name, (rnd, green) in latest.items()
    }


def _code_names(code: types.CodeType) -> set[str]:
    """All global/attribute names a code object references, including
    names inside nested lambdas/comprehensions (walked via co_consts)."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


_FILE_HASH_CACHE: dict[tuple[str, int, int], str] = {}
_CLOSURE_CACHE: dict = {}
_SRC_CACHE: dict = {}


def _fn_source(fn) -> str:
    """inspect.getsource memoized per fn — it re-tokenizes the whole
    defining block on every call, and registry() hashes all 162 query
    fns each time it runs. Stable within a process (module sources don't
    change under a running interpreter)."""
    src = _SRC_CACHE.get(fn)
    if src is None:
        src = inspect.getsource(fn)
        _SRC_CACHE[fn] = src
    return src


def _file_hash(path: str) -> str:
    """Memoized on (path, mtime, size) — not path alone — so an on-disk
    helper edit inside a long-lived process moves source_hash immediately
    (path-only memoization would pin the stale hash until restart)."""
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return "unreadable"
    h = _FILE_HASH_CACHE.get(key)
    if h is None:
        try:
            h = hashlib.sha256(Path(path).read_bytes()).hexdigest()[:16]
        except OSError:
            h = "unreadable"
        _FILE_HASH_CACHE[key] = h
    return h


def _const_repr(name: str, obj) -> str | None:
    """Deterministic repr for module-level data constants a query fn
    references, or None for anything else. Sets are deliberately
    EXCLUDED: their iteration order varies with PYTHONHASHSEED across
    processes, which would make every stored hash look changed each
    round. Containers go through json (sort_keys) so dict ordering is
    canonical; unserializable values are skipped rather than guessed."""
    if isinstance(obj, (bool, int, float, complex, str, bytes)) or obj is None:
        return f"{name}={obj!r}"
    if isinstance(obj, re.Pattern):
        return f"{name}=re({obj.pattern!r},{obj.flags})"
    if isinstance(obj, (tuple, list, dict)):
        try:
            # no default=: a nested set/object must SKIP the constant (via
            # TypeError), not sneak a hash-order-unstable repr in
            return f"{name}={json.dumps(obj, sort_keys=True)}"
        except (TypeError, ValueError):
            return None
    return None


def _dependency_closure(fn) -> tuple[list[str], set[str]]:
    """(same-module helper sources, cross-module job_etl_spark module
    names) that a query fn depends on.

    Granularity is deliberately two-tier:

    - a SAME-module helper (private fn in the query's own ``queries/*.py``
      file) contributes its own source text only — taking the whole file
      would couple every query in the file to every neighbour's edit and
      flood the changed-since-green rank;
    - a CROSS-module dependency (``ml/*``, ``operators/*``, ``functions/*``
      …) contributes its defining module, expanded to a fixpoint over
      module-level imports within ``job_etl_spark`` (coarse transitive
      closure: an edit to a helper-of-a-helper still registers).

    Name resolution is via ``co_names`` against the fn's globals (plus
    sys.modules for function-local dotted imports), so attribute names
    that coincide with unused module globals can over-include — safe:
    false positives only make the surface more sensitive, never less.
    Shared by ``_helper_surface`` (rotation hashing) and
    ``tests/test_tz_independence.py`` (auto-enrollment scanning).

    Memoized per fn (registry() hashes all 162 queries on every call and
    the vars() fixpoint walk dominates): the traversal result is stable
    within a process; the FILE hashes are deliberately NOT folded in
    here so ``_file_hash`` stays the live (test-patchable) seam.
    """
    memo = _CLOSURE_CACHE.get(fn)
    if memo is not None:
        return memo
    own_mod = getattr(fn, "__module__", "") or ""

    def _module_of(obj) -> types.ModuleType | None:
        if isinstance(obj, types.ModuleType):
            return obj
        mname = getattr(obj, "__module__", None)
        if isinstance(mname, str) and mname.startswith("job_etl_spark"):
            return sys.modules.get(mname)
        return None

    mods: set[str] = set()
    frontier: list[types.ModuleType] = []
    local_srcs: list[str] = []
    for name in sorted(_code_names(fn.__code__)):
        obj = fn.__globals__.get(name)
        if obj is None and name.startswith("job_etl_spark"):
            # function-local `from job_etl_spark.x import y` / `import
            # job_etl_spark.x` leaves the dotted module name in co_names
            # with no globals binding — IMPORT it (not sys.modules.get:
            # before the query's first call the module may be absent, and
            # the memoized closure would then be missing the dependency
            # for the process lifetime — q95's operators.cms path, r11)
            try:
                obj = importlib.import_module(name)
            except ImportError:
                obj = None
        if obj is None:
            continue
        const = _const_repr(name, obj)
        if const is not None:
            # module-level data constants (lookback windows, thresholds,
            # rendered SQL fragments, compiled regex patterns) change a
            # query's behavior without touching any function source —
            # fold a deterministic repr in
            local_srcs.append(const)
            continue
        mname = getattr(obj, "__module__", None)
        if not isinstance(obj, types.ModuleType) and mname == own_mod:
            try:
                local_srcs.append(_fn_source(obj))
            except (OSError, TypeError):
                pass
            continue
        mod = _module_of(obj)
        if mod is not None and mod.__name__.startswith("job_etl_spark"):
            if mod.__name__ not in mods:
                mods.add(mod.__name__)
                frontier.append(mod)
    while frontier:
        for obj in list(vars(frontier.pop()).values()):
            dep = _module_of(obj)
            if (
                dep is not None
                and dep.__name__.startswith("job_etl_spark")
                and dep.__name__ not in mods
            ):
                mods.add(dep.__name__)
                frontier.append(dep)
    _CLOSURE_CACHE[fn] = (local_srcs, mods)
    return local_srcs, mods


def _helper_surface(fn) -> str:
    """Hash surface of the helper code a query fn depends on, so a rewrite
    of e.g. ``ml/dedup.py`` promotes its ~31 dependent queries in the
    rotation exactly like an edit to the query fn itself (r7 verdict #5).
    See ``_dependency_closure`` for the traversal rules."""
    local_srcs, mods = _dependency_closure(fn)
    parts = ["".join(local_srcs)]
    for mname in sorted(mods):
        f = getattr(sys.modules.get(mname), "__file__", None)
        parts.append(f"{mname}:{_file_hash(f) if f else 'builtin'}")
    return "\x00".join(parts)


def source_hash(q: Query) -> str:
    """Content hash of a query's verifiable surface: the Spark fn's source
    text + the oracle SQL + the helper surface (same-module helper sources
    and the transitive closure of cross-module ``job_etl_spark``
    dependency files — see ``_helper_surface``). A helper rewrite
    therefore ranks its dependents as changed-since-green instead of
    hiding behind an unchanged fn body. Still a rotation-priority
    heuristic, not a correctness proof; the driver rotation cycles every
    query regardless. After editing this scheme run
    ``python scripts/green_hashes.py --rehash-all`` (only valid when no
    query/helper code changed since the last greens)."""
    src = _fn_source(q.fn)
    return hashlib.sha256(
        (src + "\x00" + (q.oracle or "") + "\x01" + _helper_surface(q.fn)).encode()
    ).hexdigest()[:16]


def _green_hashes() -> dict[str, str]:
    """name -> source_hash as of the query's last driver-green round,
    maintained by ``scripts/green_hashes.py --update`` (run at round start,
    before any code changes, so the stored hash reflects the verified
    code). Missing file → no change detection (scripts running outside the
    repo tree)."""
    path = Path(__file__).resolve().parents[2] / "tests" / "query_green_hashes.json"
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def registry() -> dict[str, Query]:
    reg: dict[str, Query] = {}
    for mod in (
        relational,
        domain,
        lifedata,
        scaleops,
        sketches,
        curation,
        modelprep,
        observability,
        graphs,
        timeseries,
        evaluation,
    ):
        for name, q in mod.QUERIES.items():
            if name in reg:
                raise ValueError(f"duplicate query name {name}")
            reg[name] = q
    last = _last_verified_round()
    # Rewritten-since-green queries jump ahead of merely-stale greens
    # (r6 verdict: q49 was rewritten in r6 but its driver green was r4 —
    # a rewrite must never wait behind the stalest-green backlog for
    # driver confirmation). Order: failing (-2), never-verified (-1),
    # changed-since-green (-0.5), then greens stalest-first. WITHIN the
    # changed bucket, stalest-green-first (r12): an edit to a widely
    # shared helper (tables.py, session.py) marks ~every query changed at
    # once, and a definition-order tie-break would then fill the 50-entry
    # window with q01..q50 while the queries whose driver green is
    # OLDEST — exactly the ones a structural rewrite left unconfirmed
    # longest — wait outside it.
    green_hash = _green_hashes()
    changed = {
        n
        for n, q in reg.items()
        if n in green_hash and green_hash[n] != source_hash(q)
    }
    # explicit 'pending-driver-green' sentinels (non-hex sidecar values,
    # stamped by green_hashes.py --mark-pending on a structural rewrite)
    # outrank hash-detected changes: the hash cannot tell a semantic
    # rewrite from a shared-helper ripple, the sentinel is the builder
    # saying "this one MUST be re-confirmed". --update clears it at the
    # query's next driver green.
    pending = {
        n
        for n in changed
        if not re.fullmatch(r"[0-9a-f]+", str(green_hash.get(n, "")))
    }

    def key(n: str) -> tuple[float, float]:
        k = last.get(n, -1)
        if k >= 0 and n in pending:
            return (-0.75, k)
        if k >= 0 and n in changed:
            return (-0.5, k)
        return (k, 0.0)

    base = {name: i for i, name in enumerate(reg)}
    order = sorted(reg, key=lambda n: (key(n), base[n]))
    return {n: reg[n] for n in order}
