"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2
(plus the training-data-pipeline extensions); ``oracle_sql()`` holds the
DuckDB twin for each SQL-expressible query. The implementations live in
``etl_developstoday_test_spark/plans/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_developstoday_test_spark.plans.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 registered queries
# per round, so the registry is ordered so successive rounds jointly
# cover everything. The order is DERIVED from the CORRECTNESS_r*.json
# files the driver leaves in the repo root (rotation was a hand-
# maintained list through round 3 and was forgotten once — this makes
# it structural):
#   1. queries whose implementation changed since their last green row
#      (dict below; entries SELF-EXPIRE once a green driver row from
#      the change round or later lands, so the list can never go stale
#      the way round 4's did) — changed code outranks everything: a
#      regression fix that misses the window stays red a whole round,
#   2. queries with no driver row in any round (newest registrations
#      first, so fresh additions lead the remaining slots),
#   3. queries whose LATEST driver row is not hash-green (regressions),
#   4. everything else, oldest-green-round first — so flagship rows
#      naturally rotate back through the window for re-certification.
# The per-round coverage map lives in README.md ("Driver verification
# rotation").

# name -> round in which the implementation (or plan shape) changed
# after its last green driver row. An entry is IGNORED once the driver
# has a hash-green row for it from that round or later — no manual
# cleanup needed; just add (name, current_round) when touching code.
# DISCIPLINE NOTE: the self-expiry is sound only because the driver
# certifies AFTER the round's last commit — if code ever changes after
# a round's CORRECTNESS artifact already exists, record round N+1 for
# it (a green row from round N must not expire a change it never saw).
# HYGIENE: expired entries are PRUNED each round (the full r5-r9
# change history lives in git — see this dict in any pre-r10 revision);
# only live entries appear below, so the rotation's load-bearing
# artifact never drowns in history.
_CHANGED_THIS_ROUND: dict[str, int] = {
    # (All TWENTY-EIGHT r11 registrations — six staged in r10,
    # twelve staged-and-registered within r11, plus the ten
    # originally r13-staged operators the window had room for — got
    # green first rows in CORRECTNESS_r11.json; count corrected per
    # r11 ADVICE. The r12 entries below are the round's ADVICE /
    # VERDICT fixes to already-certified queries.)
    # r11 ADVICE: scale-invariant first-significant-digit extraction
    # (the cents heuristic mis-read 0.999->1 and dropped (0,0.005));
    # oracle updated in lockstep, re-locked at both scales.
    "drift_benford_first_digit": 12,
    # r11 ADVICE: key kept in native type (string keys must not be
    # numerically coerced); long cast moved to the call site, values
    # and schema unchanged.
    "skew_topk_key_share": 12,
    # r11 ADVICE: n_null_keys coalesced to 0 on an empty child table
    # (was NULL); registered values unchanged.
    "dq_fk_orphans": 12,
    # r11 VERDICT item 3 (decimal sweep): integer-second gaps now sum
    # as longs (bit-identical — the summands are exact integers), so
    # the corpus-sized decimal accumulation is gone; oracle untouched,
    # re-locked at both scales.
    "events_interarrival_burstiness": 12,
    # r11 VERDICT item 4 (NB shared-base constant): the scoring join
    # now carries per-(doc, token) COUNTS (Σ m·llq == Σ llq exactly —
    # integer arithmetic) and the vocabulary derives from the
    # materialized model-sized counts table instead of a corpus-wide
    # distinct per consumer. Scores bit-identical, oracles untouched,
    # all four locks re-run green; calibration 3.8s warm at sf0.1
    # (was ~5.1s warm under load, r11 target <= 4s).
    "ml_naive_bayes_quality": 12,
    "ml_nb_confusion_matrix": 12,
    "ml_nb_margin_calibration": 12,
    "ml_nb_margin_auc": 12,
}


def _driver_history() -> tuple[dict[str, int], dict[str, int]]:
    """(last_round_checked, last_round_green) per query, read from the
    driver's own CORRECTNESS_r*.json artifacts; empty if none exist."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    checked: dict[str, int] = {}
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            checked[name] = max(checked.get(name, 0), rnd)
            if isinstance(row, dict) and row.get("hash_match"):
                green[name] = max(green.get(name, 0), rnd)
    return checked, green


def _driver_order(d: dict) -> dict:
    checked, green = _driver_history()
    # A "changed" entry is live only until the driver re-certifies it:
    # green at or after the change round expires it automatically.
    changed = {
        n: i
        for i, (n, rnd) in enumerate(_CHANGED_THIS_ROUND.items())
        if green.get(n, -1) < rnd
    }
    names = list(d)
    reg_idx = {n: i for i, n in enumerate(names)}

    def key(n: str):
        if n in changed:
            return (0, changed[n])  # changed code re-certifies first
        if n not in checked:
            return (1, -reg_idx[n])  # newest additions next
        if checked[n] > green.get(n, 0):
            return (2, reg_idx[n])  # latest row red and never re-greened
        return (3, green[n], reg_idx[n])  # oldest-green rotates in first

    return {n: d[n] for n in sorted(names, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _driver_order(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _driver_order(ORACLE_SQL)
