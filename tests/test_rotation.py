"""Driver-window self-rotation guarantees (queries/__init__.py).

The driver verifies only the first 50 registry entries per round, so the
ordering IS the verification schedule. Round 6's verdict found the one
gap: a query rewritten after its last green ranked by staleness only and
could wait rounds for driver re-confirmation. These tests pin the full
priority ladder: failing < never-verified < changed-since-green <
greens stalest-first.
"""

from __future__ import annotations

import json
from pathlib import Path

from job_etl_spark import queries as qmod
from job_etl_spark.queries import registry, source_hash
from job_etl_spark.queries._util import Query

ROOT = Path(__file__).resolve().parents[1]
SIDECAR = ROOT / "tests" / "query_green_hashes.json"


def test_source_hash_tracks_fn_and_oracle():
    def fn_a(spark, sf):
        return None

    def fn_b(spark, sf):
        return 1

    qa = Query(fn_a, "SELECT 1 AS x")
    assert source_hash(qa) == source_hash(Query(fn_a, "SELECT 1 AS x"))
    assert source_hash(qa) != source_hash(Query(fn_b, "SELECT 1 AS x"))
    assert source_hash(qa) != source_hash(Query(fn_a, "SELECT 2 AS x"))
    assert source_hash(Query(fn_a, None)) != source_hash(qa)


def test_sidecar_covers_entire_registry():
    """Every registry entry must have a stored green-hash entry, else a
    future rewrite of that query is invisible to the rotation. Run
    `python scripts/green_hashes.py --update` after adding queries."""
    stored = json.loads(SIDECAR.read_text())
    missing = sorted(set(registry()) - set(stored))
    assert not missing, f"queries without a green hash: {missing}"
    orphans = sorted(set(stored) - set(registry()))
    assert not orphans, f"green hashes for deleted queries: {orphans}"


def test_changed_since_green_outranks_stale_greens(monkeypatch):
    """Poisoning one green query's stored hash must pull it ahead of every
    merely-stale green — but never ahead of failing/never-verified."""
    reg_names = list(registry())
    rounds = qmod._last_verified_round()
    greens = [n for n in reg_names if rounds.get(n, -1) >= 0]
    assert len(greens) >= 2, "test needs at least two green queries"
    victim = greens[-1]  # the FRESHEST green: worst-case staleness rank

    real = qmod._green_hashes()
    poisoned = dict(real)
    poisoned[victim] = "deadbeef-not-a-real-hash"
    monkeypatch.setattr(qmod, "_green_hashes", lambda: poisoned)
    order = list(registry())

    reg = registry()  # dict lookup by name; ordering irrelevant here
    already_changed = {
        n for n in reg_names if poisoned.get(n) not in (None, source_hash(reg[n]))
    }
    first_unchanged_green = next(
        n for n in order if rounds.get(n, -1) >= 0 and n not in already_changed
    )
    assert order.index(victim) < order.index(first_unchanged_green)
    # ... and failing / never-verified still outrank the changed query
    fake_rounds = dict(rounds)
    fake_rounds[greens[0]] = -2  # simulate a red
    monkeypatch.setattr(qmod, "_last_verified_round", lambda: fake_rounds)
    order2 = list(registry())
    assert order2.index(greens[0]) < order2.index(victim)


def test_pending_sentinel_outranks_hash_changed(monkeypatch):
    """r12 ladder extension: an explicit 'pending-driver-green' sentinel
    (structural rewrite awaiting driver confirmation) must outrank every
    hash-detected changed green — a shared-helper edit marks ~all
    dependents changed at once, and the sentinel is what keeps the
    genuinely-rewritten query inside the 50-entry window — while failing
    and never-verified still come first."""
    reg_names = list(registry())
    rounds = qmod._last_verified_round()
    greens = [n for n in reg_names if rounds.get(n, -1) >= 0]
    assert len(greens) >= 3
    sentinel_q = greens[-1]  # freshest green: worst-case staleness rank
    hash_changed_q = greens[-2]

    poisoned = dict(qmod._green_hashes())
    poisoned[sentinel_q] = "pending-driver-green"
    poisoned[hash_changed_q] = "0000000000000000"  # hex: plain changed, not sentinel
    monkeypatch.setattr(qmod, "_green_hashes", lambda: poisoned)
    order = list(registry())
    assert order.index(sentinel_q) < order.index(hash_changed_q)
    # failing outranks the sentinel
    fake_rounds = dict(rounds)
    fake_rounds[greens[0]] = -2
    monkeypatch.setattr(qmod, "_last_verified_round", lambda: fake_rounds)
    order2 = list(registry())
    assert order2.index(greens[0]) < order2.index(sentinel_q)


def test_changed_bucket_orders_stalest_first(monkeypatch):
    """r12: WITHIN the changed-since-green bucket, stalest green first —
    so when a shared-helper edit floods the bucket, the queries whose
    driver confirmation is oldest (the longest-unverified rewrites) fill
    the window instead of whatever happens to be defined first."""
    reg_names = list(registry())
    rounds = qmod._last_verified_round()
    greens = sorted(
        (n for n in reg_names if rounds.get(n, -1) >= 0),
        key=lambda n: rounds[n],
    )
    assert len(greens) >= 2
    stale_q, fresh_q = greens[0], greens[-1]
    assert rounds[stale_q] < rounds[fresh_q], "test needs distinct green rounds"
    poisoned = dict(qmod._green_hashes())
    poisoned[stale_q] = "0000000000000000"
    poisoned[fresh_q] = "0000000000000000"
    monkeypatch.setattr(qmod, "_green_hashes", lambda: poisoned)
    order = list(registry())
    assert order.index(stale_q) < order.index(fresh_q)


_CONST_FOR_HASH_TEST = 7 * 86_400


def test_source_hash_tracks_module_constants(monkeypatch):
    """A module-level data constant a query references (lookback window,
    threshold, rendered SQL fragment) changes behavior without touching
    any function source — the hash must move with it. The closure memo
    captures constant VALUES, so simulate the fresh-process-per-round
    reality by clearing it around the edit."""
    import sys

    def fn(spark, sf):
        return _CONST_FOR_HASH_TEST

    q = Query(fn, "SELECT 1 AS x")
    before = source_hash(q)
    monkeypatch.setattr(
        sys.modules[__name__], "_CONST_FOR_HASH_TEST", 3 * 86_400
    )
    monkeypatch.setattr(qmod, "_CLOSURE_CACHE", {})
    assert source_hash(q) != before


def test_helper_edit_promotes_dependents(monkeypatch):
    """r7 verdict #5: an edit to a cross-module helper (ml/dedup.py here)
    must change the source_hash of every query that depends on it — so the
    rotation ranks them changed-since-green — while leaving helper-free
    queries' hashes untouched."""
    import job_etl_spark.ml.dedup as dedup_mod

    reg = registry()
    before = {n: source_hash(q) for n, q in reg.items()}

    real_file_hash = qmod._file_hash

    def poisoned(path: str) -> str:
        if path == dedup_mod.__file__:
            return "poisoned-helper-edit"
        return real_file_hash(path)

    monkeypatch.setattr(qmod, "_file_hash", poisoned)
    after = {n: source_hash(q) for n, q in reg.items()}

    moved = {n for n in reg if before[n] != after[n]}
    assert "q29_minhash_lsh" in moved, "direct ml.dedup dependent missed"
    # transitive: q95 reaches ml.dedup only through operators/cms.py's
    # module-level `from job_etl_spark.ml.dedup import hexint`
    assert "q95_heavy_hitters_cms" in moved, "transitive dependent missed"
    # a pure-relational query has no ml.* surface and must NOT move
    assert "q01_pricing_summary" not in moved, "helper poisoning over-broad"

    # and the rotation actually promotes a moved green ahead of unchanged
    # stale greens: with real stored hashes, the poisoned file makes the
    # dependents' current hash mismatch the sidecar
    rounds = qmod._last_verified_round()
    moved_greens = [n for n in moved if rounds.get(n, -1) >= 0]
    assert moved_greens, "test needs a green ml.dedup dependent"
    order = list(registry())
    stored = qmod._green_hashes()
    first_unchanged_stale = next(
        n
        for n in order
        if rounds.get(n, -1) >= 0 and stored.get(n) == after.get(n)
    )
    for n in moved_greens:
        assert order.index(n) < order.index(first_unchanged_stale)


def test_r7_window_contains_verdict_targets():
    """Round-7 specific pin (r6 verdict item 1): the 50-entry driver
    window must contain the 12 stalest queries (q130-q141, last green r3)
    AND the r6-rewritten q49. Delete this test when CORRECTNESS_r07
    lands — the generic ladder tests above are the permanent guard."""
    if any(ROOT.glob("CORRECTNESS_r0[7-9].json")):
        return  # r7 verification landed; the pin served its purpose
    window = list(registry())[:50]
    assert "q49_variant_extract" in window
    for i in range(130, 142):
        assert any(n.startswith(f"q{i}_") for n in window), f"q{i} not in window"


def test_rehash_all_preserves_sentinels_and_drops_removed(tmp_path, monkeypatch):
    """`green_hashes.py --rehash-all` is a hash-SCHEME migration: it must
    NOT re-stamp a non-hex '*-pending-driver-green' sentinel (that would
    erase the rewritten-but-unverified marker — the q49/r6 hole), and a
    sidecar entry for a query removed from the registry must be dropped,
    not crash the `changed` computation (r8 ADVICE)."""
    import importlib
    import sys

    spec = importlib.util.spec_from_file_location(
        "green_hashes", ROOT / "scripts" / "green_hashes.py"
    )
    gh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gh)

    from job_etl_spark.queries import registry, source_hash

    reg = registry()
    names = sorted(reg)[:3]
    current = {n: source_hash(reg[n]) for n in names}
    sidecar = tmp_path / "green.json"
    stored = {
        names[0]: "deadbeef00000000",            # stale hex -> re-encoded
        names[1]: "pending-driver-green",        # sentinel -> preserved
        "q999_removed_query": "cafebabe",        # gone -> dropped, no KeyError
        names[2]: current[names[2]],             # up-to-date -> unchanged
    }
    sidecar.write_text(json.dumps(stored))

    monkeypatch.setattr(gh, "SIDECAR", sidecar)
    monkeypatch.setattr(sys, "argv", ["green_hashes.py", "--rehash-all"])
    assert gh.main() == 0

    out = json.loads(sidecar.read_text())
    assert out[names[0]] == current[names[0]]
    assert out[names[1]] == "pending-driver-green"
    assert "q999_removed_query" not in out
    assert out[names[2]] == current[names[2]]
