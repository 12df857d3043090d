"""Rotation-ledger consistency — fails on README/CORRECTNESS drift.

Round-6 verdict item #4: the hand-maintained README ledger drifted
(13 entries listed as never-gated that had green r1/r2 rows). The
ledger is now derived programmatically from ``CORRECTNESS_r*.json``
by ``tools/ledger_check.py``; this test pins README.md to that
derivation and sanity-checks the evidence record itself.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import ledger_check  # noqa: E402


def test_readme_ledger_in_sync():
    problems = ledger_check.check_readme(str(REPO))
    assert problems == [], "\n".join(problems)


def test_no_orphan_correctness_entries():
    led = ledger_check.ledger(str(REPO))
    assert led["orphans"] == [], (
        "CORRECTNESS files record queries missing from the registry: "
        f"{led['orphans']}"
    )


def test_every_registry_query_reachable_by_rotation():
    # The never-gated backlog must fit in at most one more 50-slot
    # window after the current one — i.e. rotation is actually
    # converging, not accumulating debt.
    led = ledger_check.ledger(str(REPO))
    out_of_window = [n for n in led["never_gated"] if n not in led["window"]]
    assert len(out_of_window) <= 50, (
        f"{len(out_of_window)} never-gated queries are outside the current "
        "window — rotation debt is growing"
    )


def test_driver_evidence_is_green_definition():
    # Guard the green criterion: a query green in some round must have
    # rows+schema+hash all true in that round's file.
    import json

    evidence = ledger_check.driver_evidence(str(REPO))
    # spot-check one known-green and one known-red record
    r1 = json.loads((REPO / "CORRECTNESS_r01.json").read_text())
    assert 1 in evidence.get("pricing_summary", [])
    assert r1["simhash"]["hash_match"] is False or r1["simhash"]["rows_match"] is False
    assert 1 not in evidence.get("simhash", [])
