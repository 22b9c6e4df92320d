"""Driver-contract invariants for __spark_entry__ — pure-Python checks
that prevent the round-4 class of proof-routing drift (queries registered
outside the driver's 50-entry correctness window without anyone noticing,
or a _CHECK_FIRST name that silently stopped matching a registered
query)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_check_first_window_is_valid():
    names = list(entry.queries())
    assert len(entry._CHECK_FIRST) == 50
    assert len(set(entry._CHECK_FIRST)) == 50, "duplicate names in window"
    # priority list must actually be the first 50 in dict order
    assert names[:50] == entry._CHECK_FIRST
    missing = [n for n in entry._CHECK_FIRST if n not in entry.queries()]
    assert not missing, f"window names not registered: {missing}"


def test_every_query_has_oracle():
    names = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert names <= oracles, f"rows-only queries: {sorted(names - oracles)}"
    assert oracles <= names, f"orphan oracles: {sorted(oracles - names)}"


def test_union_of_round_windows_covers_registry():
    """Every registered query must have a driver row from SOME round:
    present in a past CORRECTNESS_r*.json or in the current window.
    Registering a query without rotating it in = a claim with no proof
    path — fail fast here instead of in the judge's report."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.abspath(entry.__file__))
    checked: set[str] = set(entry._CHECK_FIRST)
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        try:
            checked |= set(json.load(open(path)))
        except Exception:
            pass
    unrouted = sorted(set(entry.queries()) - checked)
    assert not unrouted, (
        f"queries with no driver correctness row and not in the current "
        f"window — rotate them into _CHECK_FIRST: {unrouted}"
    )
