"""Documentation-drift guards: the gate surface and its docs must move
together — every driver-gate query needs an oracle twin and a COVERAGE.md
mention, and the correctness window must stay exactly driver-sized."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(qs) == set(os_), (
        f"queries without oracle: {sorted(set(qs) - set(os_))}; "
        f"oracles without query: {sorted(set(os_) - set(qs))}"
    )


def test_every_query_is_documented_in_coverage():
    with open(os.path.join(ROOT, "COVERAGE.md")) as fh:
        cov = fh.read()
    missing = [q for q in entrymod.queries() if q not in cov]
    assert not missing, f"gates absent from COVERAGE.md: {missing}"


def test_check_window_is_exactly_driver_sized_and_resolvable():
    qs = entrymod.queries()
    assert len(entrymod._CHECK_FIRST) == 50
    unresolved = [q for q in entrymod._CHECK_FIRST if q not in qs]
    assert not unresolved, f"window names unknown queries: {unresolved}"
    # _ordered must put the window first, verbatim
    assert list(qs)[:50] == entrymod._CHECK_FIRST


def test_rotation_debt_cannot_drift():
    """Every registered query with no driver CORRECTNESS row in ANY past
    round must sit inside the current 50-entry window — otherwise a gate
    could accumulate rounds of "green locally" with zero driver
    evidence. Computed from the artifacts, not a hand-kept list."""
    import glob
    import json

    seen: set[str] = set()
    for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            seen |= set(json.load(fh))
    never = [q for q in entrymod.queries() if q not in seen]
    outside = [q for q in never if q not in entrymod._CHECK_FIRST]
    assert not outside, (
        f"{len(outside)} never-driver-checked queries outside the check "
        f"window: {outside}"
    )


def test_no_gate_evidence_older_than_five_rounds():
    """Max-staleness guard for the rotation (r8 verdict #5): with 203
    registered gates and a 50-row driver window the revisit period is
    ~4 rounds; this pins it — for every registered gate, its NEWEST
    driver CORRECTNESS row must be no older than 5 rounds by the time
    the upcoming round's report lands. Gates sitting in the current
    window count as refreshed this round (the driver will row them)."""
    import glob
    import json
    import re

    newest: dict[str, int] = {}
    rounds: list[int] = []
    for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", f).group(1))
        rounds.append(rnd)
        with open(f) as fh:
            for q in json.load(fh):
                newest[q] = max(newest.get(q, 0), rnd)
    current_round = max(rounds) + 1
    # Missing gates default to round 0 (never evidenced = maximally
    # stale), NOT current_round — defaulting to current_round exempted
    # exactly the gates most in need of the bound (r9 ADVICE).
    stale = [
        q
        for q in entrymod.queries()
        if q not in entrymod._CHECK_FIRST
        and newest.get(q, 0) < current_round - 5
    ]
    assert not stale, (
        f"gates whose newest driver evidence predates round "
        f"{current_round - 5} and are not in this round's window: {stale}"
    )


def test_no_oracle_enumerates_positions_with_a_fixed_bound():
    """r11 VERDICT: oracles used to enumerate token/char positions with
    a fixed generate_series bound (2000/600/200); a regenerated fixture
    with a doc longer than the bound would silently truncate the
    oracle's n-gram sets while Spark's stayed complete. All such sites
    now derive positions from the row's own length
    (unnest(generate_series(1, len(t) - k + 1))), which is correct at
    ANY document length. Pin the retirement repo-wide — REGISTERED and
    STAGED oracles both (via tools/check.py's single staged-module
    pointer), so the class cannot re-enter through a staged cohort and
    ship at registration: the only literal generate_series upper bounds
    left are small STRUCTURAL constants (embedding dim 64, PQ
    subspaces, seed/band/bucket counts) — any literal bound above 64
    is the truncation class reappearing."""
    import importlib.util
    import re

    spec = importlib.util.spec_from_file_location(
        "check", os.path.join(ROOT, "tools", "check.py")
    )
    check = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(check)
    swept = {**entrymod.oracle_sql(), **check.staged_oracles()}
    for name, sql in swept.items():
        for lo, hi in re.findall(
            r"generate_series\(\s*(-?\d+)\s*,\s*(\d+)\s*\)", sql
        ):
            assert int(hi) <= 64, (
                f"{name}: generate_series({lo}, {hi}) — a fixed position "
                "bound silently truncates on long documents; derive the "
                "bound from the row (len(t)-based) instead"
            )


def test_staged_cohorts_never_shadow_registered_gates():
    """check.py's --staged merge applies the staged dicts AFTER the
    registered surface, so a staged gate reusing a registered name
    would silently REPLACE the registered gate in every staged
    differential run — the registered oracle comparison would stop
    executing while still reporting green (review finding: the r13
    cohort's pre-registration shadow check used to pin this class;
    this is its cohort-agnostic, always-live replacement, importing
    the ONE staged-module pointer so new cohorts are covered the
    moment they stage)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check", os.path.join(ROOT, "tools", "check.py")
    )
    check = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(check)
    staged = set(check.staged_queries())
    overlap = staged & set(entrymod.queries())
    assert not overlap, f"staged names shadow registered gates: {overlap}"
    # and the staged surface itself must stay 1:1 with its oracles
    assert staged == set(check.staged_oracles())
