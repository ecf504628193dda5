"""Registry-rotation invariant (VERDICT r8 item #6).

The correctness driver hashes only the FIRST 50 registered queries each
round, so the head of ``_DRIVER_PRIORITY`` is a verification budget.
These tests fail the suite whenever that budget would be wasted on ops
that already carry a full driver hash pass (rows+schema+hash all true
in some CORRECTNESS_r*.json), converting the per-round re-pin ritual
into an enforced invariant.

Reference parity note: the reference archiver (main.go:88-223) has no
driver-evidence concept; this is harness bookkeeping for OUR gate.
"""

from __future__ import annotations

import glob
import json
import os

from pg_archiver_spark.registry import (
    ORACLES,
    QUERIES,
    _PIN_ROUND,
    load_all_operators,
)

load_all_operators()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _full_passes() -> dict[str, int]:
    """Op -> latest round in which the driver recorded a FULL pass
    (rows_match, schema_match and hash_match all true). ``no_oracle``
    rows and error rows do not count -- those ops still need a hash
    verdict.

    Rounds >= _PIN_ROUND are EXCLUDED (ADVICE r9 #1): the driver writes
    CORRECTNESS_r{_PIN_ROUND} during the pinned round itself, so those
    fresh passes are the pin succeeding -- only evidence from rounds
    BEFORE the pin makes the window stale. The forcing function for the
    next round is the re-pin instruction in registry.py's comment plus
    the judge's own coverage recount; bumping _PIN_ROUND without
    re-pinning the window re-arms this test against the new evidence."""
    passes: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= _PIN_ROUND:
            continue
        with open(path) as f:
            records = json.load(f)
        for name, rec in records.items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            ):
                passes[name] = max(passes.get(name, 0), rnd)
    return passes


def test_driver_window_holds_no_already_green_op():
    """Slots 1-50 (the next driver window) must spend the budget on ops
    that have never received a full driver hash pass. A green op in the
    window is only legitimate once EVERY never-verified sql-checked op
    is already inside it (round 11 is the first time the backlog
    dropped under 50, so top-up greens are expected from here on). A
    failure means _DRIVER_PRIORITY is stale from last round and the
    driver would burn budget re-verifying greens while unverified ops
    wait -- re-pin it."""
    window = list(QUERIES)[:50]
    greens = set(_full_passes())
    already_green = sorted(set(window) & greens)
    backlog = [n for n in QUERIES if n not in greens and n in ORACLES]
    displaced = sorted(set(backlog) - set(window))
    assert not (already_green and displaced), (
        "stale driver window: green ops occupy slots while never-"
        f"verified ops wait outside -- re-pin _DRIVER_PRIORITY. "
        f"greens in window: {already_green}; displaced: {displaced}"
    )


def test_driver_window_is_sql_checked():
    """Every op spent on the 50-slot window must yield a HASH verdict,
    not a weaker rows-only record: all 50 need a DuckDB oracle."""
    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"driver window contains rows-only ops: {missing}"


def test_pin_round_matches_evidence_horizon():
    """ADVICE r10 #4: bumping _PIN_ROUND past the evidence horizon
    would blind test_driver_window_holds_no_already_green_op to real
    evidence without any re-pin having happened. The pin must sit at
    exactly 1 + the newest CORRECTNESS round on disk: the driver
    writes CORRECTNESS_r{_PIN_ROUND} during the pinned round itself,
    after which the NEXT session bumps the pin as its first commit."""
    rounds = [
        int(p.rsplit("_r", 1)[1].split(".")[0])
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "no CORRECTNESS files found -- wrong repo root?"
    expected = 1 + max(rounds)
    assert _PIN_ROUND in (expected, expected - 1), (
        f"_PIN_ROUND={_PIN_ROUND} but CORRECTNESS evidence reaches "
        f"round {max(rounds)}; a fresh pin must set it to {expected} "
        f"({expected - 1} is only valid mid-round, before the driver "
        "writes this round's file)"
    )


def test_priority_names_are_registered():
    """A typo'd or since-renamed name in _DRIVER_PRIORITY silently
    shrinks the window (load_all_operators drops unknown names)."""
    from pg_archiver_spark.registry import _DRIVER_PRIORITY

    unknown = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not unknown, f"_DRIVER_PRIORITY names not in registry: {unknown}"
