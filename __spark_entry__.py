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
_CHANGED_THIS_ROUND: dict[str, int] = {
    # r6: ngram pair join restructured (window-carried sizes); every
    # consumer below re-certifies
    "dedup_ngram_jaccard": 6,
    "dedup_threshold_sensitivity": 6,
    "dedup_cc_alternating_star": 6,
    "sample_leakage_safe_split": 6,
    # r6: q17 rewritten one-pass (window threshold over the broadcast-
    # filtered fact instead of a second full scan + agg)
    "tpch_q17_small_quantity_revenue": 6,
    # r6: digest now travels as exact decimal TEXT on both sides and
    # n_chunks comes from file metadata (clears the r5 hash-false row)
    "scan_python_datasource_chunks": 6,
    # r6: zero-yield sources now survive the mixture aggregation
    "sample_mixture_upsample": 6,
    # r6: autoBroadcastJoinThreshold override moved to a cloned session
    "join_bucketed_colocated": 6,
    # (dedup_connected_components / dedup_cluster_canonicals /
    # text_winnow_match_pairs also changed in r6/r5 — their entries live
    # at their LATEST change round below; one key per query, no shadowed
    # duplicates)
    # r5: as-of joins now carry the matched right row as one struct
    # payload (whole-row ASOF semantics; no cross-row null stitching)
    "join_asof_attribution": 5,
    "join_asof_nearest_attribution": 5,
    # r5: isolated-session stream start; truthful state-bound docs
    "stream_events_dedup_counts": 5,
    "stream_user_running_totals": 5,
    # r5: CSV source widens few-block inputs before the parse
    "etl_golden_pipeline_stats": 5,
    # r5: rollup + localCheckpoint — fact scanned once, not three times
    "agg_hll_mergeable_rollup": 5,
    # r5: B2 counters fused to one aggregation pass / one scan
    "etl_stats_counters": 5,
    # r7: oracle-typing fix — bare SUM() over integer expressions made
    # DuckDB return HUGEINT (int128), which the driver's pandas fetch
    # coerces to float64 while Spark stays int64, hash-diverging on
    # exactly-equal values (all 14 r6 red rows + 1 latent never-checked
    # case; judge-verified value-equal). Every such aggregate is now
    # CAST(... AS BIGINT); tests/test_oracle_parity.py carries a
    # result-type tripwire so the class can't ship again.
    # (curation_corpus_card was in this batch too — entry at its r8
    # change below)
    "stream_left_outer_attribution": 7,
    "dq_k_anonymity_audit": 7,
    "sample_shard_shuffle": 7,
    "text_char_entropy_filter": 7,
    "scan_csv_multiline_quoted": 7,
    "events_merged_busy_intervals": 7,
    "text_cdc_chunk_dedup": 7,
    "curation_dsir_importance": 7,
    "embed_jl_projection_distortion": 7,
    "sample_temperature_mixture": 7,
    "scan_csv_permissive_corrupt": 7,
    "events_arrow_grouped_stats": 7,
    "text_exact_substring_coverage": 7,
    "text_arrow_batch_stats": 7,
    # (graph_kcore_decomposition's r7 h-step rewrite is superseded by
    # its r8 entry below)
    # r7 checkpointed the gram table / exact-baseline top-k (shared
    # subtrees ran twice); r8 switched that materialization from
    # localCheckpoint to tracked persist()+count() so the pre-return
    # release is real (unpersist() is a cacheManager no-op on
    # checkpoint RDDs); values unchanged, plan shape re-certifies
    "dedup_cross_source_matrix": 8,
    "embed_ann_ivf_recall": 8,
    # (graph_kcore_decomposition's r8 _coactivity_edges refactor is
    # superseded by its r9 scale-gate entry below)
    # r8: the four exact-ntile sites swapped from a partitionless
    # window (single-task global sort — the r7 verdict's one remaining
    # scale-killer class) to functions.exact_ntile (range-partitioned
    # rank + broadcast cumulative offsets); tile values are unchanged
    # by construction (property-tested == ntile), oracles untouched
    # (events_rfm_segments / text_unigram_logprob_quality were in this
    # batch too — their entries live at their r9 change below)
    "window_ntile_order_quartiles": 8,
    "sample_quality_epochs": 8,
    # r8: word_shingles now let-binds its token array internally (a raw
    # split() argument was re-evaluated per reference per element —
    # ~10x on shingling). Values are unchanged everywhere (pure
    # expression binding; full local parity suite re-verified), so only
    # the sites whose argument WAS a raw split — where the expression
    # tree materially changed — are listed; _doc_shingles consumers
    # were already bound and merely gained a no-op wrapper.
    "text_winnow_match_pairs": 8,
    # r8: the global-scalar step swapped from an unpartitioned window
    # over the dimension-sized aggregate (per-part / per-supplier rows
    # scale with SF — a single-task exchange at 100 TB) to a 1-row
    # aggregate crossJoin-broadcast; AQE reuses the aggregation
    # exchange at runtime, so the fact is still scanned once. Values
    # unchanged (same expressions, different physical op).
    "tpch_q11_important_parts": 8,
    # (tpch_q15_top_supplier's r8 global-scalar swap is superseded by
    # its r9 helper-extraction entry below)
    # r9: the eleven unconditional narrow-shuffle session overrides
    # (the r8 verdict's one weak class — shuffle.partitions seeds AQE's
    # initial partition count, so the bench tune also capped the
    # corpus-sized leaf shuffles at 8 tasks) are now routed through
    # plans/queries._narrow_session_if_small, which applies the narrow
    # clone ONLY when the measured on-disk input is small and returns
    # the original session untouched otherwise; a plan-sweep test bans
    # direct width sets outside the gate. Values unchanged everywhere
    # (conf-only change at bench scale); re-certify per the touch-code
    # rule. agg_quantile_sketch_rollup additionally gained the
    # KMV-style hash pre-filter on its leaf rank (verdict ask #4).
    "dedup_connected_components": 9,
    "dedup_cluster_canonicals": 9,
    "dedup_prefix_filter_jaccard": 9,
    "text_unigram_logprob_quality": 9,
    "join_cbo_reordered_star": 9,
    "curation_corpus_card": 9,
    "graph_kcore_decomposition": 9,
    "events_rfm_segments": 9,
    "graph_lpa_communities": 9,
    "graph_degree_assortativity": 9,
    "agg_quantile_sketch_rollup": 9,
    # r9: bpe_encode_stats gained the broadcast_model escape hatch the
    # NB classifier got in r8 (default True — registered plan/values
    # unchanged); re-certify per the touch-code rule
    "text_bpe_encode_stats": 9,
    # r9: q15's revenue view extracted to module-level _q15_revenue so
    # the plan test exercises the real subtree (ADVICE ask); values and
    # plan unchanged, re-certify per the touch-code rule
    "tpch_q15_top_supplier": 9,
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
