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
    # (All three r13 entries self-expired on green r13/r14 rows and are
    # pruned per the HYGIENE note above. The r14 VERDICT/ADVICE fixes
    # landed in STAGED operators BEFORE their first registration, so
    # each rides its r15 first row — the Cohen-κ precedent.)
    #
    # Round 15 OPTIMIZATION pass: every registered query whose
    # implementation/plan changed this round (materialization points,
    # scale-gated narrow shuffle/state width). Values are oracle-parity
    # re-verified in-round (scripts/check_parity.py + the full parity
    # suite), but changed code re-certifies first per the discipline.
    "stream_events_hourly": 15,
    "stream_events_sessionized": 15,
    "stream_watermark_close_out": 15,
    "dedup_cc_alternating_star": 15,
    "sample_leakage_safe_split": 15,
    "embed_kmeans_clusters": 15,
    "graph_pagerank_authority": 15,
    "text_bpe_merge_rounds": 15,
    "text_bpe_encode_stats": 15,
    "text_bpe_fertility_by_lang": 15,
    "graph_triangle_count": 15,
    "graph_clustering_sampled": 15,
    "graph_clustering_coefficient": 15,
    "graph_degree_assortativity": 15,
    "graph_two_hop_reach": 15,
    "graph_two_hop_reach_sampled": 15,
    "graph_jaccard_linkpred": 15,
    "graph_jaccard_linkpred_sampled": 15,
    "graph_adamic_adar": 15,
    "graph_adamic_adar_sampled": 15,
    "graph_local_bridges": 15,
    "graph_local_bridges_sampled": 15,
    "graph_degree_powerlaw": 15,
    "graph_rich_club": 15,
    "graph_degree_gini": 15,
    "ml_naive_bayes_quality": 15,
    "ml_nb_confusion_matrix": 15,
    "ml_nb_margin_auc": 15,
    "ml_nb_margin_calibration": 15,
    # (dedup_containment_pairs moved to the r16 block below — its r15
    # entry expired on the green r15 row and the query changed again)
    "sample_waterfill_execute": 15,
    # r15 optimization, second batch: the _coactivity_edges /
    # _sampled_coactivity_edges per-phase width split (one explicit
    # wide exchange for the CPU-bound build) changes the plan of every
    # consumer — the three not already listed above:
    "graph_kcore_decomposition": 15,
    "graph_kcore_capped": 15,
    "graph_lpa_communities": 15,
    # r15 optimization, second batch: scale-gated narrow shuffles for
    # the vocabulary-bounded text-LM rankers (measured interleaved
    # wins recorded in each docstring):
    "text_kneser_ney_bottomk": 15,
    "text_hybrid_rrf_topk": 15,
    "text_bigram_lm_bottomk": 15,
    "text_bm25_topk": 15,
    #
    # Round 16 OPTIMIZATION pass (all r15 entries above expired on
    # green r15 rows; kept for the round's history, pruned next round).
    # Batch 1: materialize-once in the MinHash family (signature/set
    # tables checkpointed — plan scans 6->2 / 4->2), the containment
    # pair join materialized before its two-direction union (2 pair
    # SMJs -> 1), and the estimate query narrow-gated. Oracle parity
    # re-proven in-round (scripts/check_parity.py); changed code
    # re-certifies first per the discipline.
    "dedup_minhash_lsh": 16,
    "dedup_minhash_estimate_error": 16,
    "dedup_containment_pairs": 16,
    # Batch 2: the deferred tfidf narrow gate (r15 measured win), the
    # HLL-over-deduped-level rewrite (413-col exchange -> 3-col), and
    # the cube-over-leaf-aggregate rewrite (Expand above the partial
    # agg instead of below):
    "text_tfidf_top_terms": 16,
    "agg_approx_distinct": 16,
    "agg_cube_lineitem": 16,
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
