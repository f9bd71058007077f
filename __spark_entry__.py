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
# per round. Order the registry so rounds jointly cover everything:
# queries with no driver row in ANY round come first, then queries whose
# code changed this round, then a flagship re-certification set; the
# remainder (driver-green in earlier rounds) fill the tail. The
# per-round coverage map lives in README.md ("Driver verification
# rotation").
_DRIVER_PRIORITY = [
    # --- never driver-checked in r1-r3 (21 queries) ---
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q11_important_parts", "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier", "tpch_q16_supplier_count",
    "tpch_q17_small_quantity_revenue", "tpch_q20_excess_stock_suppliers",
    "text_benchmark_contamination", "text_bpe_token_stats",
    "text_chunk_overlap", "text_repetition_ratio", "text_token_rarity",
    "text_word_positions_udtf", "events_mad_outliers",
    "stream_watermark_close_out", "join_bucketed_colocated",
    "scan_orc_roundtrip", "scan_partition_pruned",
    "agg_hll_mergeable_rollup", "mm_resize_plan",
    # --- repaired this round (events.ts TIMESTAMP_NTZ regression) ---
    "etl_normalize", "etl_time_since_prev", "events_sessionize",
    "stream_events_hourly", "stream_events_sessionized",
    # --- plan changed in r3 (broadcast hint removed), re-verify ---
    "dedup_embedding_cosine",
    # --- flagship re-certification: reference ETL core + declared
    #     queries Q1-Q4 + TPC-H anchors + one per operator family ---
    "etl_golden_pipeline_stats", "etl_stats_counters",
    "etl_dedup_first_wins", "etl_valid_rows", "etl_invalid_rows",
    "etl_dedup_losers", "q1_argmax_group_avg", "q2_topk_by_measure",
    "q3_topk_by_derived", "q4_selective_filter",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue", "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items", "tpch_q14_promo_share",
    "tpch_q18_large_volume", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "embed_cosine_topk",
    "join_asof_attribution",
]


def _driver_order(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _driver_order(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _driver_order(ORACLE_SQL)
