"""The correctness-window rotation is mechanical: least-recently-
driver-verified first, and EDITED queries (fingerprint mismatch) jump
to the front regardless of their old green results."""

from __future__ import annotations

import json


def test_fingerprints_current():
    """contract_fingerprints.json must match the present source — a
    stale entry means someone edited a query without re-running the
    full local verification + tools/update_fingerprints.py."""
    from hope_graph_builder_spark import contract

    recorded = contract._recorded_fingerprints()
    assert recorded, "contract_fingerprints.json missing"
    stale = [
        n for n in contract._QUERIES
        if recorded.get(n) != contract._fingerprint(n)
    ]
    assert stale == [], f"stale fingerprints (re-verify + update): {stale}"


def test_edited_query_floats_to_window_front(monkeypatch):
    from hope_graph_builder_spark import contract

    names = list(contract._QUERIES)
    target = list(contract.queries())[-1]  # currently least prioritized
    recorded = dict(contract._recorded_fingerprints())
    recorded[target] = "0000000000000000"  # simulate an edit
    monkeypatch.setattr(contract, "_recorded_fingerprints", lambda: recorded)
    order = list(contract.queries())
    assert order.index(target) < 50  # re-enters the externally-graded window
    # and it sorts with the never-verified group, i.e. ahead of every
    # query whose last green round is newer
    seen = contract._last_green_round()
    first_verified = next(i for i, n in enumerate(order) if seen.get(n, 0) > 0 and n != target)
    assert order.index(target) < max(first_verified + 1, 1) or seen.get(target, 0) == 0
