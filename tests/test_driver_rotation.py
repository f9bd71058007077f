"""The driver checks only the first 50 entries of queries() per round;
the rotation that decides those 50 is derived from the driver's own
CORRECTNESS_r*.json artifacts (hand-maintaining the list was forgotten
once, in round 3). These tests pin the derivation's invariants against
the real artifacts in the repo root."""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry
from etl_developstoday_test_spark.plans.queries import ORACLE_SQL, QUERIES

HERE = os.path.dirname(os.path.abspath(entry.__file__))


def _rows():
    seen = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                seen.setdefault(name, []).append(row)
    return seen


def test_rotation_covers_registry_exactly_once():
    ordered = list(entry.queries())
    assert len(ordered) == len(QUERIES)
    assert set(ordered) == set(QUERIES)


def test_never_checked_queries_lead_the_window():
    seen = _rows()
    ordered = list(entry.queries())
    live_changed = set(_live_changed())
    never = [
        n for n in ordered if n not in seen and n not in live_changed
    ]
    # outside the live-changed head, every never-checked query sorts
    # before every checked query
    if never:
        last_never = max(ordered.index(n) for n in never)
        first_checked = min(
            ordered.index(n)
            for n in ordered
            if n in seen and n not in live_changed
        )
        assert last_never < first_checked


def test_changed_dict_has_no_duplicate_keys():
    """A duplicate key in the _CHANGED_THIS_ROUND literal is silently
    later-wins — a future edit to the shadowed first occurrence would be
    ignored, which is dangerous given the self-expiry discipline (a
    stale earlier round could expire a change it never saw). Parse the
    source literal: Python's runtime dict can't show the duplicates."""
    import ast
    import collections

    tree = ast.parse(open(entry.__file__).read())
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.AnnAssign)
            and getattr(node.target, "id", "") == "_CHANGED_THIS_ROUND"
        ):
            keys = [k.value for k in node.value.keys]
            dups = [
                k for k, c in collections.Counter(keys).items() if c > 1
            ]
            assert not dups, f"duplicate _CHANGED_THIS_ROUND keys: {dups}"
            return
    raise AssertionError("_CHANGED_THIS_ROUND literal not found")


def _live_changed():
    checked, green = entry._driver_history()
    return [
        n
        for n, rnd in entry._CHANGED_THIS_ROUND.items()
        if green.get(n, -1) < rnd
    ]


def test_live_changed_entries_lead_everything():
    # a changed-code entry that misses the 50-slot window stays
    # unverified a whole round, so live changed entries outrank even
    # never-checked registrations
    ordered = list(entry.queries())
    live = _live_changed()
    if live:
        assert ordered[: len(live)] == live


def test_changed_queries_precede_recertification_tail():
    seen = _rows()
    ordered = list(entry.queries())
    changed_with_rows = [
        n for n in entry._CHANGED_THIS_ROUND if n in seen and n in ordered
    ]
    stable_green = [
        n
        for n in ordered
        if n in seen
        and n not in entry._CHANGED_THIS_ROUND
        and seen[n][-1].get("hash_match")
    ]
    if changed_with_rows and stable_green:
        assert max(ordered.index(n) for n in changed_with_rows) < max(
            ordered.index(n) for n in stable_green
        )


def test_oracle_order_mirrors_query_order():
    q = [n for n in entry.queries() if n in ORACLE_SQL]
    assert q == list(entry.oracle_sql())


def test_rotation_is_deterministic():
    assert list(entry.queries()) == list(entry.queries())


def _order_with(monkeypatch, registry, checked, green, changed):
    """Run _driver_order against a synthetic driver history."""
    monkeypatch.setattr(entry, "_driver_history", lambda: (checked, green))
    monkeypatch.setattr(entry, "_CHANGED_THIS_ROUND", changed)
    return list(entry._driver_order(dict.fromkeys(registry, None)))


def test_changed_outranks_never_checked(monkeypatch):
    # "fix" changed in round 6 with an old red row; "new" has no row at
    # all. The fix must lead: it is the one that can stay red a round.
    order = _order_with(
        monkeypatch,
        ["new", "fix"],
        checked={"fix": 5},
        green={"fix": 4},
        changed={"fix": 6},
    )
    assert order == ["fix", "new"]


def test_changed_entry_expires_once_green_at_or_after_change_round(
    monkeypatch,
):
    # "a" changed in round 4 and went green in round 4 -> expired, so it
    # must sort by its (old) green round in the re-certification tail,
    # behind "b" whose green row is older.
    order = _order_with(
        monkeypatch,
        ["a", "b"],
        checked={"a": 4, "b": 2},
        green={"a": 4, "b": 2},
        changed={"a": 4},
    )
    assert order == ["b", "a"]


def test_changed_entry_stays_live_until_recertified(monkeypatch):
    # "a" changed in round 5; its last green is round 4 -> still live,
    # so it leads even though "b" has an older green round.
    order = _order_with(
        monkeypatch,
        ["a", "b"],
        checked={"a": 4, "b": 2},
        green={"a": 4, "b": 2},
        changed={"a": 5},
    )
    assert order == ["a", "b"]


def test_never_checked_sorts_newest_registration_first(monkeypatch):
    # Neither has a driver row; the later registration ("new2") must
    # lead so fresh additions always make the 50-slot window.
    order = _order_with(
        monkeypatch,
        ["new1", "new2"],
        checked={},
        green={},
        changed={},
    )
    assert order == ["new2", "new1"]
