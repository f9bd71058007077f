"""Physical-plan regression tests: the scale posture, asserted.

Correct results with a wrong plan don't survive a 100× scale-up. These
tests pin the plan properties each query's performance depends on:
filter pushdown into the parquet scan, column pruning, broadcast joins
for dimension tables, TakeOrderedAndProject for top-K (no global sort),
partial aggregation, and whole-stage codegen on the hot paths.
"""

from __future__ import annotations

import pytest

from etl_developstoday_test_spark.plans.queries import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_filters_pushed_to_scan(spark):
    plan = plan_of(spark, "q4_selective_filter")
    assert "PushedFilters:" in plan
    assert "EqualTo(l_suppkey,7)" in plan
    # PushedFilters is truncated in toString(); the DataFilters line
    # shows the same pushed predicate in full
    assert ">= 30.0)" in plan


def test_q2_uses_topk_not_global_sort(spark):
    plan = plan_of(spark, "q2_topk_by_measure")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
    # column pruning: scan reads only the three projected columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_q3_derived_topk_no_global_sort(spark):
    plan = plan_of(spark, "q3_topk_by_derived")
    assert "TakeOrderedAndProject" in plan


def test_tpch_q3_broadcasts_dimensions(spark):
    plan = plan_of(spark, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    # selective dim predicate is pushed into the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_tpch_q5_broadcasts_all_dims(spark):
    plan = plan_of(spark, "tpch_q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_tpch_q1_partial_aggregation(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    # two-phase hash aggregate: partial_* on the map side
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan
    # shipdate predicate pushed to the scan
    assert "LessThanOrEqual(l_shipdate," in plan


def test_dedup_single_shuffle(spark):
    plan = plan_of(spark, "etl_dedup_first_wins")
    # one hash exchange on the dedup key; no extra repartitions
    assert plan.count("Exchange hashpartitioning") == 1


def test_scans_stay_in_wholestage_codegen(spark):
    # compact plan strings mark codegen stages with "*(n)"; AQE plans
    # only finalize after execution, so run the query first
    for name in ["tpch_q1_pricing_summary", "etl_normalize", "q4_selective_filter"]:
        df = QUERIES[name](spark, SF_DIR)
        df.collect()  # count() would build a different query execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "*(" in plan, name


def test_winnow_fingerprints_no_key_shuffle(spark):
    """Winnowing is a narrow map after the fan_out width repartition:
    no hash-partitioned exchange anywhere (the round-robin fan_out is
    a no-op at real scan width)."""
    plan = plan_of(spark, "text_winnow_fingerprints")
    assert "Exchange hashpartitioning" not in plan


@pytest.mark.parametrize("name", ["etl_valid_rows", "text_quality_score"])
def test_narrow_ops_have_no_shuffle(spark, name):
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, f"{name} shuffles but is a narrow map"


def test_tpch_q10_q18_broadcast_small_sides(spark):
    for name in ["tpch_q10_returned_items", "tpch_q18_large_volume"]:
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "TakeOrderedAndProject" in plan, name


def test_band_join_broadcasts_dim(spark):
    plan = plan_of(spark, "join_range_price_bands")
    # non-equi join against the tiny band dim must broadcast, never
    # shuffle the fact side for the join
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_attribution_no_join(spark):
    plan = plan_of(spark, "join_asof_attribution")
    assert "Join" not in plan  # union + running-last, not a range join


def test_asof_nearest_no_join_single_main_window(spark):
    """The nearest variant must stay join-free too: both directional
    frames ride ONE sorted partition (the only extra exchange is the
    right-side tie dedup)."""
    plan = plan_of(spark, "join_asof_nearest_attribution")
    assert "Join" not in plan
    # right-side tie dedup + the one (user_id) window partitioning that
    # serves BOTH directional frames
    assert plan.count("Exchange hashpartitioning") <= 2


def test_shuffle_hash_hint_takes_effect(spark):
    plan = plan_of(spark, "join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q19_pushes_derived_conjuncts(spark):
    plan = plan_of(spark, "tpch_q19_disjunctive")
    # the OR-of-ANDs must not block pushdown entirely: quantity bounds
    # reach the lineitem scan, size/type bounds reach the part scan
    scans = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in scans), scans
    assert any("p_size" in l or "p_type" in l for l in scans), scans


def test_percentile_banding_avoids_global_window(spark):
    """The documented ntile replacement must not contain a window at
    all — cutoffs broadcast onto a stateless CASE."""
    plan = plan_of(spark, "agg_percentile_banding")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_cohort_retention_broadcasts_cohorts(spark):
    plan = plan_of(spark, "events_cohort_retention")
    assert "BroadcastHashJoin" in plan


def test_salted_join_replicates_small_side(spark):
    plan = plan_of(spark, "join_salted_skew_enrich")
    # the small side explodes one copy per salt (Generate) and the join
    # key includes the salt
    assert "Generate explode" in plan
    assert "_salt" in plan


def test_salted_join_salt_varies_per_row_not_per_partition(spark):
    """Regression for the r1 salt flaw: the salt expression must derive
    from a per-row id, never from spark_partition_id (which collapses a
    single-partition hot key onto one reducer)."""
    plan = plan_of(spark, "join_salted_skew_enrich")
    assert "spark_partition_id" not in plan
    assert "monotonically_increasing_id" in plan


def test_aqe_skew_join_split_fires(spark):
    """At 100 TB the FIRST answer to join skew is the built-in:
    session.py enables spark.sql.adaptive.skewJoin, and this pins that
    it actually splits a hot partition at runtime (manual salting in
    operators/skew.py is the documented fallback for skew AQE can't
    reach: mid-pipeline skew behind cached subplans, streaming joins,
    deterministic test plans).

    An isolated newSession() carries test-sized skew thresholds so the
    split triggers on MBs instead of the production 256MB default; the
    hot key holds 50k of 60k rows with a high-entropy payload (so
    shuffle compression can't hide the skew from the byte threshold).
    AQE finalizes the plan only on execution of the SAME Dataset, so
    collect() precedes the plan read."""
    from pyspark.sql import functions as F

    s = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }.items():
        s.conf.set(k, v)

    big = s.range(0, 60000).select(
        F.when(F.col("id") < 50000, F.lit(0))
        .otherwise(F.pmod("id", F.lit(50)))
        .alias("k"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5(F.sha1(F.col("id").cast("string"))),
        ).alias("payload"),
    )
    small = s.range(0, 50).select(
        F.col("id").alias("k"), F.lit("dim").alias("name")
    )
    j = big.join(small, "k")
    assert len(j.collect()) == 60000  # value-identical to the plain join
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan
    assert "skewed" in plan  # AQEShuffleRead … skewed on the hot side


def test_approx_percentiles_broadcasts_sketch_back(spark):
    """The per-group sketch (3 rows) must broadcast onto the fact scan
    for the exact-rank verification pass — never a shuffle join."""
    plan = plan_of(spark, "agg_approx_percentiles")
    assert "BroadcastHashJoin" in plan
    assert "approx_percentile" in plan


def test_media_features_hashes_jvm_side(spark):
    """n_bytes/content_sha256 must be codegen expressions; only the
    decoder crosses into Python (single ArrowEvalPython stage)."""
    plan = plan_of(spark, "mm_media_features")
    assert "sha2" in plan and "length" in plan
    assert plan.count("ArrowEvalPython") == 1


def _fact_exchanges(plan: str) -> int:
    """Non-broadcast hash-partitioning exchanges in a plan string."""
    return sum(
        1
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "Broadcast" not in l
    )


def test_tpch_q2_single_fact_shuffle(spark):
    """Pre-partitioning on l_partkey alone serves the (partkey, suppkey)
    aggregate AND the min-price window — one lineitem shuffle total."""
    plan = plan_of(spark, "tpch_q2_min_price_supplier")
    assert _fact_exchanges(plan) == 1
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") == 4  # part/supplier/nation/region


def test_tpch_q21_no_expand_single_fact_shuffle(spark):
    """The two COUNT(DISTINCT)s are a two-level agg over a fact
    pre-partitioned on l_orderkey: no Expand, and the only other
    exchange is the tiny per-supplier-name final aggregate."""
    plan = plan_of(spark, "tpch_q21_waiting_suppliers")
    assert "Expand" not in plan
    assert _fact_exchanges(plan) == 2  # repartition(l_orderkey) + s_name agg


def test_tpch_q17_one_pass_single_fact_shuffle(spark):
    """One-pass shape: the brand/type part filter broadcasts onto the
    fact, and the ONLY hash exchange is the window partitioning of the
    filtered survivor set that computes the per-part threshold —
    lineitem is scanned once, not twice (r6 rewrite: threshold as a
    window over the broadcast-filtered fact instead of a second full
    scan + broadcast agg)."""
    plan = plan_of(spark, "tpch_q17_small_quantity_revenue")
    lines = plan.splitlines()
    probe_exchanges = [
        l for l in lines if "Exchange hashpartitioning" in l and "Broadcast" not in l
    ]
    assert len(probe_exchanges) == 1  # window partitioning on l_partkey
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Scan parquet") == 2  # lineitem once + part once
    assert "Window" in plan


def test_tpch_q8_only_fact_join_shuffles(spark):
    """Every dimension broadcasts; lineitem⋈orders is the lone wide
    join, then one aggregation by year."""
    plan = plan_of(spark, "tpch_q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4
    # pushed dim predicates reach their scans
    assert "EqualTo(r_name,EUROPE)" in plan
    assert "EqualTo(p_type,STANDARD)" in plan


def _plan_without_auto_broadcast(spark, name: str) -> str:
    """Plan with size-based broadcasting off: at toy SF every table fits
    under the threshold, so only EXPLICIT broadcast hints surviving here
    prove the 100-TB join strategy."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        return plan_of(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tpch_q9_broadcasts_dims_single_fact_join(spark):
    """part (LIKE-pruned), nation, and supplier⋈nation broadcast onto
    lineitem (3 explicit hints); lineitem⋈orders is the lone shuffle
    join, then one (nation, yr) aggregate. The LIKE predicate must
    prune part BEFORE its broadcast (pushed into the part scan), and
    lineitem must be scanned exactly once."""
    plan = _plan_without_auto_broadcast(spark, "tpch_q9_product_profit")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan  # li⋈orders
    assert "StringContains(p_name,gear)" in plan
    assert plan.count("lineitem.parquet") == 1


def test_tpch_q11_single_fact_scan_and_shuffle(spark):
    """The HAVING-vs-global-scalar pattern: the scalar total is a 1-row
    aggregate of the per-part table crossJoin-broadcast back onto it.
    The STATIC plan prints the per-part subtree under both consumers,
    but AQE's stage cache must dedupe it at runtime (ReusedExchange in
    the final plan — the fact is scanned/shuffled once) and NO
    single-partition exchange may ever carry the per-part rows (they
    scale with the part count). Top-100 must avoid a global sort."""
    from tests.conftest import SF_DIR_ORACLE

    static = _plan_without_auto_broadcast(spark, "tpch_q11_important_parts")
    assert "EqualTo(n_name,NATION_7)" in static  # dim predicate pushed
    assert "TakeOrderedAndProject" in static
    assert _global_window_hits(static) == 0
    # sf0.01: at sf0.001 the NATION_7 slice is empty and AQE collapses
    # the whole plan to EmptyRelation, leaving nothing to reuse
    df = QUERIES["tpch_q11_important_parts"](spark, SF_DIR_ORACLE)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final  # fact aggregated once at runtime


def test_tpch_q15_single_fact_scan_pushed_dates(spark):
    """The per-supplier revenue view is persisted and read by both the
    1-row max aggregate and the equality filter, so the fact subtree
    (with the quarterly shipdate range pushed into its scan) executes
    exactly once and no single-partition exchange ever carries the
    per-supplier rows. The query is eager (the persist), so the plan
    assertions run on _q15_revenue — the SAME module-level subtree the
    registered query persists (not a test-local lookalike that could
    drift) — and the registered query itself is then executed
    end-to-end: its winner must be the true argmax of that subtree."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.plans.queries import _q15_revenue
    from etl_developstoday_test_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_ORACLE

    revenue = _q15_revenue(load_table(spark, SF_DIR, "lineitem"))
    plan = revenue._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(l_shipdate," in plan
    assert "LessThan(l_shipdate," in plan
    assert plan.count("lineitem.parquet") == 1
    assert _global_window_hits(plan) == 0
    # run the REAL registered query (sf0.01: non-degenerate slice) and
    # cross-check the crossJoin-max wiring against the view's argmax
    out = QUERIES["tpch_q15_top_supplier"](spark, SF_DIR_ORACLE).collect()
    view = _q15_revenue(load_table(spark, SF_DIR_ORACLE, "lineitem"))
    mx = view.agg(F.max("total_revenue")).collect()[0][0]
    assert out and all(r["total_revenue"] == mx for r in out)
    winners = {
        r["supplier_no"]
        for r in view.filter(F.col("total_revenue") == mx).collect()
    }
    assert {r["s_suppkey"] for r in out} == winners


def test_tpch_q13_outer_join_keeps_orderless_customers(spark):
    """The priority exclusion must sit inside the join, not filter
    customer rows; plan keeps a LeftOuter join with the pushed
    order-side predicate."""
    plan = plan_of(spark, "tpch_q13_customer_distribution")
    assert "LeftOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan


def test_tpch_q16_anti_join_broadcasts(spark):
    plan = plan_of(spark, "tpch_q16_supplier_count")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_tpch_q20_semi_join_chain_pushes_dates(spark):
    plan = plan_of(spark, "tpch_q20_excess_stock_suppliers")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(l_shipdate," in plan



# Queries whose construction EXECUTES work (streaming runs, iterative
# algorithms, table materialization) — excluded from the cheap global
# plan sweep; their Python usage is covered by their own tests.
_EAGER_QUERIES = {
    "stream_events_hourly",
    "stream_events_sessionized",
    "stream_user_running_totals",
    "stream_watermark_close_out",
    "stream_events_dedup_counts",
    "dedup_connected_components",
    "join_bucketed_colocated",
    "scan_orc_roundtrip",
    "scan_json_roundtrip",
    "scan_partition_pruned",
    "etl_golden_pipeline_stats",
    "graph_kcore_decomposition",   # h-index fixpoint iteration
    "graph_kcore_capped",          # capped h-index chain, checkpointed card
    "graph_local_bridges_sampled",  # sym edge table checkpointed
    "graph_jaccard_linkpred_sampled",  # sym edge table checkpointed
    "graph_adamic_adar_sampled",   # sym edge table checkpointed
    "scan_binaryfile_manifest",    # lands fixture blobs, checkpointed read
    "text_bpe_merge_rounds",       # per-round top-pair driver actions
    "stream_left_outer_attribution",  # runs a streaming query
    "scan_parquet_bloom_skipping",  # writes the bloom-filtered copy
    "dedup_cross_source_matrix",   # gram table checkpointed pre-self-join
    "embed_ann_ivf_recall",        # exact-baseline top-k checkpointed
    "ml_naive_bayes_quality",      # token explode persisted + released
    "text_bigram_lm_bottomk",      # bigram explode persisted + released
    "text_bpe_encode_stats",       # trains the merge table (driver top-1s)
    "agg_quantile_sketch_rollup",  # leaf sketch + month partials persisted
    "tpch_q15_top_supplier",       # per-supplier revenue view persisted
    "graph_lpa_communities",       # label-propagation iteration
    "graph_degree_assortativity",  # sym edge table persisted + released
    "sample_waterfill_allocation",  # source rollup checkpointed + w>0 guard
    "ml_nb_margin_calibration",    # token explode persisted, output checkpointed
    "text_kneser_ney_bottomk",     # bigram explode persisted + released
    "text_bpe_fertility_by_lang",  # trains the merge table (driver top-1s)
    "graph_two_hop_reach",         # sym edge table persisted (3 consumers)
    "dedup_ngram_novelty",         # (source, gram) table checkpointed
    "drift_js_divergence",         # bins checkpointed + totals collected
    "graph_jaccard_linkpred",      # sym edge table checkpointed
    "sample_neyman_allocation",    # moment rollup checkpointed + collected
    "drift_benford_first_digit",   # 9-row spine checkpointed + collected
    "skew_topk_key_share",         # top-k table checkpointed
    "events_top_paths",            # path-counts table checkpointed
    "graph_adamic_adar",           # sym edge table checkpointed
    "text_source_vocab_js",        # (source, token) model checkpointed
    "ml_nb_margin_auc",            # token explode persisted + collected
    "sample_hash_balance",         # 100-row spine checkpointed + collected
    "dedup_cluster_size_hist",     # histogram checkpointed
    "skew_pareto_revenue",         # per-tile rollup checkpointed
    "drift_chi2_event_mix",        # category table checkpointed + collected
}

# The declared Python surface: the ONLY queries allowed to carry
# Arrow-batched Python nodes (pandas_udf / mapInPandas /
# applyInPandas). Everything else must be 100% JVM.
_DECLARED_PYTHON_QUERIES = {
    "text_vectorized_udf_len",
    "text_word_positions_udtf",
    "mm_media_features",
    "mm_frame_sample_plan",
    "events_mad_outliers",
    # Python DataSource scan (BatchScan chunktext (Python)) — the
    # declared connector plug-point, not an expression-level UDF
    "scan_python_datasource_chunks",
    # cogrouped-map pandas UDF (FlatMapCoGroupsInPandas)
    "events_cogroup_order_alignment",
    # Arrow-native mapInArrow batch pass (MapInArrow)
    "text_arrow_batch_stats",
    # GROUPED_AGG pandas UDF (AggregateInPandas) — exact median
    "agg_pandas_udaf_median",
    # per-frame pHash pandas UDF (ArrowEvalPython) — the declared
    # decode/hash crossing of the multimodal dedup path
    "mm_frame_phash_dedup",
    # grouped-map Arrow UDF (FlatMapGroupsInArrow)
    "events_arrow_grouped_stats",
    # per-batch integer partial-Gram reduction (MapInPandas) — the
    # declared O(batches·d²) covariance path of the anisotropy metric
    "embed_anisotropy_rankme",
}


# Queries whose plans legitimately scan one table more than the default
# allowance — every entry carries its reason. Anything NOT listed that
# exceeds the allowance is a duplicated-subtree regression (the audit
# that produced this list caught triangle counting re-deriving its edge
# lineage 42× and prefix-filter re-shingling 10× before their working
# sets were materialized).
_SCAN_ALLOWANCE = 4
_SCAN_EXCEPTIONS = {
    "embed_ann_ivf_recall": 10,   # ANN pipeline + brute-force recall baseline
    "embed_ann_ivf_topk": 6,      # centroid derivation + assign both sides + probe
    "dedup_minhash_estimate_error": 6,  # signature estimate + exact-Jaccard twin
    # three chained exact_ntile cuts: the STATIC plan prints each cut's
    # shared range exchange once per branch (2^3 copies of the per-user
    # subtree, itself 2 events scans: rollup + max-ts spine), but AQE's
    # stage cache reuses every one at runtime (final plan shows
    # ReusedExchange; events is shuffled once per cut, scanned twice)
    "events_rfm_segments": 16,
    # three chained min-aggregates (steps 2 and 3 each embed the prior
    # step's subtree in the STATIC plan: 1+2+3 scans); AQE's stage
    # cache reuses the shared exchanges at runtime
    "events_funnel_conversion": 6,
    # four relations: lineitem/orders appear as child (keys agg +
    # anti-join side each) and orders also as a parent — the static
    # plan prints orders 5x; each is a key-column-only scan
    "dq_fk_orphans": 6,
}

# Queries whose plans legitimately contain a PARTITIONLESS window
# (Exchange SinglePartition feeding a Window): allowed ONLY when the
# window's input is bounded by construction, never corpus-sized — the
# r7 verdict's one scale-killer class. Every entry carries the bound.
_GLOBAL_WINDOW_OK = {
    # exact_ntile's cumulative-offset window runs over the per-range-
    # partition COUNTS table: <= spark.sql.shuffle.partitions rows
    "window_ntile_order_quartiles",
    "events_rfm_segments",
    "text_unigram_logprob_quality",
    "sample_quality_epochs",
    # bounded hour spine (calendar-sized)
    "events_max_concurrent_sessions",
    # per-source mixture table / n_buckets hash profile (config-sized)
    "sample_temperature_mixture",
    "curation_dsir_importance",
    # KS cumulative-CDF window runs over the merged DISTINCT-value
    # table: bounded by |value domain| * quantum (a property of the
    # column, not the corpus — <= 20k rows for a [0,200] metric at
    # centi-precision, at any SF)
    "drift_ks_two_sample",
    # Zipf rank window runs over the top-100 pick: constant-sized
    "text_zipf_slope",
    # Gini's one window runs over the (count, multiplicity) table:
    # bounded by the count DOMAIN (max events per user), not the
    # user count — the closed-form rank-block construction
    "events_user_gini",
    # same rank-block construction over the DEGREE-domain histogram
    # (checkpointed, degree-domain-bounded — never vertex-sized)
    "graph_degree_gini",
    # Page–Hinkley's running-mean/prefix/min windows run over the
    # calendar-days table (bounded by the time span, not the corpus;
    # the corpus collapses map-side before any window)
    "drift_page_hinkley",
    # same calendar-days class: the trailing-7-day moment window runs
    # over the checkpointed daily-means table (the corpus collapses
    # map-side in ONE aggregation before the window ever runs)
    "drift_rolling_zscore",
    # the cumulative-share window runs AFTER TakeOrdered+limit over
    # exactly k=100 checkpointed rows (constant-sized, the
    # text_zipf_slope class)
    "text_ngram_coverage",
}


def _global_window_hits(plan: str) -> int:
    """Count Window nodes fed by an Exchange SinglePartition (directly
    or through the Sort a windowspec ordering requires)."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            back = "\n".join(lines[max(0, i - 3):i])
            if "Window" in back:
                hits += 1
    return hits


def test_no_undeclared_python_in_any_plan(spark):
    """Global scale guard, one sweep over every lazily-planned query:
    (a) no row-at-a-time Python anywhere, (b) Arrow-batched Python only
    in the declared UDF-surface queries, (c) no CartesianProduct —
    every pair enumeration must be an equi-join, a broadcast, or a
    banded/blocked candidate join, never an unbounded cross product —
    and (d) no table scanned more times than its allowance: repeated
    scans of one table mean a subtree is being re-derived per consumer,
    the regression class the scan audit kept finding (fix = one
    localCheckpoint of the working set, or a legitimate entry in
    _SCAN_EXCEPTIONS with its reason) — and (e) no PARTITIONLESS window
    outside _GLOBAL_WINDOW_OK: a Window over Exchange SinglePartition
    is one task holding its whole input, the OOM/straggler class the
    round-7 verdict flagged; exact quantile cuts must go through
    functions.exact_ntile instead."""
    import re

    offenders, undeclared, cartesian, rescans, gwindows = [], [], [], [], []
    for name, fn in QUERIES.items():
        if name in _EAGER_QUERIES:
            continue
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        if _global_window_hits(plan) and name not in _GLOBAL_WINDOW_OK:
            gwindows.append(name)
        if "BatchEvalPython" in plan and name not in _DECLARED_PYTHON_QUERIES:
            offenders.append(name)
        has_arrow_python = any(
            marker in plan
            for marker in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                           "BatchEvalPythonUDTF", "FlatMapCoGroupsInPandas",
                           "MapInArrow", "FlatMapGroupsInArrow",
                           "AggregateInPandas",
                           "] (Python)")  # Python DataSource scans
        )
        if has_arrow_python and name not in _DECLARED_PYTHON_QUERIES:
            undeclared.append(name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        counts: dict = {}
        for t in re.findall(r"(\w+)\.parquet", plan):
            counts[t] = counts.get(t, 0) + 1
        cap = _SCAN_EXCEPTIONS.get(name, _SCAN_ALLOWANCE)
        over = {t: c for t, c in counts.items() if c > cap}
        if over:
            rescans.append((name, over))
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"
    assert not undeclared, f"undeclared Arrow-Python nodes in: {undeclared}"
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not rescans, f"tables scanned beyond allowance: {rescans}"
    assert not gwindows, (
        "partitionless windows (single-task global sort) outside the "
        f"bounded-input allowlist: {gwindows}"
    )


def test_narrow_shuffle_width_only_via_scale_gate():
    """No registered query may set a global shuffle width directly:
    spark.sql.shuffle.partitions seeds AQE's INITIAL partition count
    (AQE can only coalesce down, never widen), so an unconditional
    narrow override also caps corpus-sized leaf shuffles at a
    bench-tuned width — at 100 TB an 8-way shuffle of the whole
    corpus, the round-8 verdict's one weak class. EVERY site — batch
    and streaming alike — must route through _narrow_session_if_small
    (streams via _stream_session, which composes it), which returns
    the original session untouched when the measured input is big or
    unmeasurable. The r9 name-prefix exemption for stream_* sites is
    gone: it silently granted any future stream_* query an
    unconditional state-store-width cap."""
    import ast
    import inspect

    import etl_developstoday_test_spark.plans.queries as q

    tree = ast.parse(inspect.getsource(q))
    offenders = []
    for fn in tree.body:
        if not isinstance(fn, ast.FunctionDef):
            continue
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "set"
                and node.args
                and isinstance(node.args[0], ast.Constant)
                and node.args[0].value == "spark.sql.shuffle.partitions"
                and fn.name != "_narrow_session_if_small"
            ):
                offenders.append(fn.name)
    assert not offenders, (
        "direct shuffle-width overrides outside the scale gate: "
        f"{offenders}"
    )


def test_narrow_session_gate_behavior(spark):
    """The scale gate itself: small measured inputs get a narrow clone
    (original session untouched); inputs over the bound or unmeasurable
    (object-store URIs, missing files — every real cluster) return the
    ORIGINAL session with no conf mutated, so leaf shuffles keep
    cluster width. extra_conf rides only with the clone."""
    from etl_developstoday_test_spark.plans.queries import (
        _narrow_session_if_small,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    s2 = _narrow_session_if_small(
        spark,
        SF_DIR,
        ["documents"],
        width=5,
        extra_conf={"spark.sql.codegen.wholeStage": "false"},
    )
    assert s2 is not spark
    assert s2.conf.get("spark.sql.shuffle.partitions") == "5"
    assert s2.conf.get("spark.sql.codegen.wholeStage") == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.conf.get("spark.sql.codegen.wholeStage") == "true"
    # over the bound: original, untouched
    assert (
        _narrow_session_if_small(spark, SF_DIR, ["documents"], max_bytes=1)
        is spark
    )
    # unmeasurable input (missing path / object store): original
    assert (
        _narrow_session_if_small(spark, "/nonexistent", ["documents"])
        is spark
    )
    assert (
        _narrow_session_if_small(spark, "s3://bucket/prefix", ["documents"])
        is spark
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_session_gate_behavior(spark):
    """_stream_session always hands back a CLONE (stream conf pins are
    isolated from concurrent queries) but carries the narrow
    state-store width only when the measured input is small; over the
    bound or unmeasurable (every real cluster) the clone keeps the
    session default, so a corpus-scale stateful shuffle is never
    capped at the bench width."""
    from etl_developstoday_test_spark.plans.queries import _stream_session

    before = spark.conf.get("spark.sql.shuffle.partitions")
    small = _stream_session(spark, SF_DIR, ["events"], width=8)
    assert small is not spark
    assert small.conf.get("spark.sql.shuffle.partitions") == "8"
    # r16 (r15 ADVICE #1): a STREAMING clone narrows only its
    # state-store count — it must NOT carry the batch narrow-clone
    # marker, or a shared batch derivation invoked on it would insert
    # the width-split repartition meant for batch coactivity builds
    assert small.conf.get("spark.graft.narrowClone", "false") == "false"
    big = _stream_session(spark, "s3://bucket/prefix", ["events"])
    assert big is not spark
    assert big.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_narrow_clone_marker_width_split(spark):
    """r15 opt: the narrow clone carries the spark.graft.narrowClone
    marker (the original session never does), and the coactivity
    builders re-widen their bounded build stage to defaultParallelism
    ONLY under the marker — one REPARTITION_BY_NUM exchange on
    (h, et) inside a narrow clone, byte-identical pre-change plan
    (no such exchange) in the original session, so cluster-scale
    plans carry no extra exchange and the window keeps its map-side
    partial WindowGroupLimit in both modes."""
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
        _narrow_session_if_small,
    )

    s2 = _narrow_session_if_small(spark, SF_DIR, ["events"], width=6)
    assert s2.conf.get("spark.graft.narrowClone", "false") == "true"
    assert spark.conf.get("spark.graft.narrowClone", "false") == "false"
    _, e_narrow = _coactivity_edges(s2, SF_DIR, checkpoint=False)
    plan_n = _staged_plan(e_narrow)
    _, e_wide = _coactivity_edges(spark, SF_DIR, checkpoint=False)
    plan_w = _staged_plan(e_wide)
    assert "REPARTITION_BY_NUM" in plan_n
    assert "REPARTITION_BY_NUM" not in plan_w
    # the map-side partial window-group-limit (the 100-TB shuffle-bytes
    # bound) survives in BOTH modes: the explicit exchange sits above
    # the capped window, not below it
    assert plan_n.count("WindowGroupLimit") >= 2
    assert plan_w.count("WindowGroupLimit") >= 2


def test_substring_coverage_single_gram_pass(spark):
    """r16: the ExactSubstr dup test is one window over the fingerprint
    partition (min(doc) != max(doc)), not a groupBy + self-join — the
    positional-gram explode (the heaviest map work) must appear ONCE in
    the plan, and no sort-merge join may reappear for dup detection."""
    plan = plan_of(spark, "text_exact_substring_coverage")
    assert plan.count("Generate") == 1  # one posexplode of the grams
    assert "SortMergeJoin" not in plan


def test_top_tokens_partial_agg_topk(spark):
    """Heavy hitters must collapse map-side (partial count before the
    vocabulary shuffle) and take the top-50 without a global sort."""
    plan = plan_of(spark, "text_top_tokens")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_keep_best_dedup_single_shuffle(spark):
    """Best-copy dedup: one hash exchange on content_hash serves both
    the row_number and the per-group count — same one-shuffle posture
    as first-wins dedup."""
    plan = plan_of(spark, "dedup_keep_best_quality")
    assert plan.count("Exchange hashpartitioning") == 1


def test_cdc_last_writer_wins_single_shuffle(spark):
    """Union + sequence-ordered window must shuffle ONCE on the key —
    not once per changelog branch."""
    plan = plan_of(spark, "etl_cdc_last_writer_wins")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" in plan


def test_sliding_windows_explode_plus_one_shuffle(spark):
    """Hopping-window assignment expands inside the plan (Explode/
    Expand, no Python) with a single aggregation exchange."""
    plan = plan_of(spark, "events_sliding_windows")
    assert ("Explode" in plan) or ("Expand" in plan) or ("Generate" in plan)
    assert plan.count("Exchange hashpartitioning") == 1


def test_rolling_active_users_shape(spark):
    """Rolling-distinct must collapse the fact to (day, user) pairs
    before the 7x explode (Generate in-plan, no Python) and broadcast
    the observed-day dimension."""
    plan = plan_of(spark, "events_rolling_active_users")
    assert "Generate" in plan
    assert "BroadcastHashJoin" in plan
    assert _fact_exchanges(plan) <= 4


def test_range_frame_single_window_shuffle(spark):
    plan = plan_of(spark, "window_range_interval_frame")
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_unpivot_is_narrow_expand(spark):
    """Melt must be an in-plan Expand over the pivoted aggregate; the
    only shuffles are the pivot's two-level aggregation ((priority,
    status) partial, then priority) — the unpivot itself adds none."""
    plan = plan_of(spark, "pivot_unpivot_roundtrip")
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_token_rarity_broadcasts_vocabulary(spark):
    """Pass 2 must stream the corpus against the broadcast vocabulary —
    the per-doc aggregate is the only non-broadcast exchange chain."""
    plan = plan_of(spark, "text_token_rarity")
    assert "BroadcastHashJoin" in plan


def test_contamination_broadcasts_benchmark_index(spark):
    """Only the benchmark slice's inverted index builds/broadcasts; the
    corpus side joins by shingle without shuffling for the join."""
    plan = plan_of(spark, "text_benchmark_contamination")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_cosine_pair_join_carries_no_broadcast_hint(spark):
    """Regression for the r2 scale flaw: cosine_near_pairs must NOT
    broadcast the corpus side of the block-pair join. With the size-
    based broadcast threshold disabled, an explicit F.broadcast hint
    would STILL produce a BroadcastHashJoin — so a shuffle join here
    proves the hint is gone and the join hash-partitions on the block
    key as the operator's docstring claims."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "dedup_embedding_cosine")
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_embedding_lsh_candidates_from_band_equijoin(spark):
    """Candidate pairs must come from the (band_id, band_val) equi-join
    — a hash join, never a nested-loop/cartesian enumeration."""
    plan = plan_of(spark, "dedup_embedding_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_winnow_match_pairs_df_cap_before_join_and_scan_reused(spark):
    """The df_max hot-fingerprint guard must sit BELOW the self-join
    (filter candidates, then join), and the expensive hashing lineage
    must be materialized by ONE shuffle stage that the join's second
    side reuses at runtime — not recomputed per side."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["text_winnow_match_pairs"](spark, SF_DIR)
        static = df._jdf.queryExecution().executedPlan().toString()
        # the frequency window + df filter guard both join inputs
        assert static.count("_df") >= 2
        assert "<= 4" in static
        df.collect()
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in final, (
            "fingerprint hashing lineage computed twice: the self-join "
            "sides did not share the fingerprint shuffle stage"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pack_sequences_single_shuffle(spark):
    """Packing must shuffle ONCE: the per-sequence rollup reuses the
    running-sum window's shard hash-partitioning (hash(shard)
    co-locates every (shard, seq_id) group)."""
    plan = plan_of(spark, "sample_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1


def test_quality_route_is_narrow_scan_bound(spark):
    """Routing is a narrow codegen map: the only exchange is the final
    5-row verdict rollup, and the scan reads only the columns the
    rules need (no text-adjacent payload like source/n_chars)."""
    plan = plan_of(spark, "text_quality_route_counts")
    assert plan.count("Exchange hashpartitioning") == 1
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read_schema and "lang" in read_schema
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_quantize_int8_is_narrow(spark):
    """Quantization is a pure per-row array map: zero exchanges, and
    the scan reads only (vec_id, embedding)."""
    plan = plan_of(spark, "embed_quantize_int8")
    assert "Exchange" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "embedding" in read_schema and "label" not in read_schema


def test_countmin_sketch_joins_broadcast(spark):
    """The 4096-cell sketch must broadcast onto the top-k rows — never
    shuffle the (tiny) cell table against a shuffled top-k."""
    plan = plan_of(spark, "agg_countmin_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # exact top-k, no global sort


def test_kmeans_assignment_is_joinless_projection(spark):
    """kmeans_lloyd's returned plan must be scan → literal-centroid
    argmax projection → one hash aggregate: the centroids travel as
    plan literals (bounded driver state, the MLlib shape), so there is
    NO join and no corpus-sized shuffle anywhere — at 100 TB the
    per-iteration cost is one scan plus a (k×dim)-row aggregate."""
    plan = plan_of(spark, "embed_kmeans_clusters")
    assert "Join" not in plan
    assert "HashAggregate" in plan
    assert "array_position" in plan  # literal-centroid argmax, in codegen


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime filtering, the third leg of scan reduction after static
    pushdown and partition pruning: a selective predicate on the
    dimension side should materialize a Bloom filter that pre-filters
    the fact side BEFORE its shuffle (Spark's InjectRuntimeFilter).
    At 100 TB this turns a full fact shuffle into a shuffle of only the
    rows that can possibly join — the dynamic analogue of the pushed
    p_size predicate itself.

    An isolated newSession() lowers the application-side size threshold
    (production default 10GB — sized so tiny local scans don't pay the
    filter's cost) so the injection fires on testdata; SMJ is forced so
    there is a shuffle worth protecting."""
    from pyspark.sql import functions as F

    s = spark.newSession()
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    }.items():
        s.conf.set(k, v)

    li = s.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pa = s.read.parquet(f"{SF_DIR}/part.parquet").filter(F.col("p_size") == 1)
    j = li.join(pa, li.l_partkey == pa.p_partkey).groupBy("p_type").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    # fact side: bloom membership probe sits on the l_partkey scan…
    assert "might_contain" in plan
    # …built by a two-phase (partial + final) bloom_filter_agg over the
    # filtered dimension keys
    assert "bloom_filter_agg" in plan
    assert "partial_bloom_filter_agg" in plan


def test_grouping_sets_single_scan_expand(spark):
    """Arbitrary grouping sets must compile to ONE scan + Expand, not a
    union of per-set aggregates (which would re-scan per set)."""
    plan = plan_of(spark, "agg_grouping_sets_custom")
    assert "Expand" in plan
    assert plan.count("orders.parquet") == 1
    assert "Union" not in plan


def test_null_safe_join_stays_hash_join(spark):
    """EqualNullSafe must ride inside the hash-join key — a nested-loop
    fallback would turn the null bucket into an O(n·m) scan."""
    plan = plan_of(spark, "join_null_safe_eq")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_funnel_single_scan_no_join(spark):
    """The five funnel stages must all ride ONE documents scan as
    per-row flags (winner = passes AND rn=1 from the passes-first
    digest window) — a second filtered subtree would re-scan and
    re-join the corpus."""
    plan = plan_of(spark, "curation_funnel_counts")
    assert plan.count("documents.parquet") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_dq_rules_share_scans_and_broadcast_fks(spark):
    """All same-table null/range rules must ride one multi-aggregate
    scan (lineitem appears exactly twice: once for its three rules,
    once for the FK orphan join), and referential checks broadcast the
    key side instead of shuffling the fact table."""
    plan = plan_of(spark, "dq_constraint_violations")
    assert plan.count("lineitem.parquet") == 2
    assert "BroadcastHashJoin" in plan


def test_max_concurrent_single_scan_no_join(spark):
    """The sweep must be one lineage: explode-built deltas (not a
    union that doubles the sessionize subtree), carry folded into the
    same per-hour aggregate — one events scan, zero joins."""
    plan = plan_of(spark, "events_max_concurrent_sessions")
    assert plan.count(".parquet") == 1
    assert "Join" not in plan


def test_hll_rollup_fact_scanned_once(spark):
    """The mergeable-sketch rollup builds ALL levels in one rollup
    aggregate over one orders scan, localCheckpoints the tiny result,
    and serves both consumers (per-status rows + hll_union_agg merge)
    from the checkpointed rows: the final plan must contain NO parquet
    scan at all. Earlier revisions re-derived the aggregate per
    consumer and scanned orders three times."""
    plan = plan_of(spark, "agg_hll_mergeable_rollup")
    assert ".parquet" not in plan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_pq_topk_broadcast_only_no_embedding_shuffle(spark):
    """PQ ANN: codebook and ADC tables join by broadcast only — no
    sort-merge join, no cartesian; the only full corpus scan is the
    encode pass (the other scans carry pushed vec_id filters selecting
    the 16 codebook / 5 probe vectors)."""
    plan = plan_of(spark, "embed_ann_pq_topk")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "LessThan(vec_id,16)" in plan and "LessThan(vec_id,5)" in plan


def test_zorder_metric_no_global_sort(spark):
    """The layout comparison assigns file ids by pure key-range
    arithmetic — the plan must contain NO range partitioning (global
    sort) and exactly the two documented orders scans (bounds pass +
    interleave pass)."""
    plan = plan_of(spark, "scan_zorder_clustering")
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("orders.parquet") == 2
    assert "CartesianProduct" not in plan  # bounds ride a broadcast


def test_agg_pushdown_reaches_parquet_scan(spark):
    """COUNT/MIN/MAX must be answered by the scan itself (footer
    statistics): the DSv2 ParquetScan carries PushedAggregation and its
    output schema is already the aggregate columns — no data pages."""
    plan = plan_of(spark, "scan_agg_pushdown_stats")
    assert "PushedAggregation" in plan
    scan_line = [l for l in plan.splitlines() if "BatchScan" in l][0]
    assert "min(l_orderkey)" in scan_line and "count(*)" in scan_line


def test_dynamic_partition_pruning_subquery_reaches_scan(spark, tmp_path):
    """The runtime-only dim filter (decimal-exact avg > 50) must inject
    a dynamicpruningexpression into the partitioned fact scan's
    PartitionFilters — join-driven directory pruning, not a static IN
    list. Builds the query's exact join shape pre-checkpoint (the
    registered query materializes before deleting its temp dir, hiding
    the scan from its final plan)."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import davg
    from etl_developstoday_test_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(
        str(tmp_path / "ev")
    )
    fact = spark.read.parquet(str(tmp_path / "ev"))
    dim = (
        ev.groupBy("event_type")
        .agg(davg("value").alias("avg_value"))
        .filter(F.col("avg_value") > 50.0)
    )
    out = fact.join(dim, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "dynamicpruningexpression" in l
    ]
    assert pf, "fact scan lost its dynamic pruning subquery"


def test_bloom_runtime_filter_pushed_to_probe_side(spark):
    """The selective orders predicate must materialize as a bloom
    filter probed on the lineitem side BEFORE the join shuffle — the
    runtime row-level pruning the query exists to demonstrate."""
    plan = plan_of(spark, "join_bloom_runtime_filter")
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    # the filter must sit on the fact (lineitem) scan side
    probe = plan[plan.index("might_contain"):]
    assert "l_orderkey" in probe[:200]


def test_bitmap_distinct_partial_aggregates_no_expand(spark):
    """Both bitmap levels must partial-combine map-side, and the plan
    must NOT fall back to count-distinct's Expand-based rewrite — the
    whole point is shuffling one long per 64-id bucket."""
    plan = plan_of(spark, "agg_bitmap_exact_distinct")
    assert "partial_bit_or" in plan
    assert "Expand" not in plan


def test_arrow_batch_stats_is_arrow_native(spark):
    """The Python pass must be MapInArrow (columnar Arrow batches, no
    pandas materialization), and the per-lang rollup must still
    partial-aggregate before its shuffle."""
    plan = plan_of(spark, "text_arrow_batch_stats")
    assert "MapInArrow" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_recursive_cte_hierarchy_depths(spark):
    """The heap hierarchy over suppkeys 1..N has exactly
    floor(log2(N))+1 depths with 2^d nodes per full level — pin the
    structural invariant independent of the oracle."""
    import math

    from tests.conftest import SF_DIR as _SF

    from etl_developstoday_test_spark.sources.tables import load_table

    n = load_table(spark, _SF, "supplier").count()
    rows = {
        r["depth"]: r["n_suppliers"]
        for r in QUERIES["sql_recursive_cte_hierarchy"](spark, _SF).collect()
    }
    # 0-based heap over keys 0..n-1: depth(k) = floor(log2(k+1))
    max_depth = int(math.floor(math.log2(n)))
    assert set(rows) == set(range(max_depth + 1))
    for d in range(max_depth + 1):
        assert rows[d] == min(2**d, n - (2**d - 1))
    assert sum(rows.values()) == n


def test_bm25_topk_is_take_ordered_not_global_window(spark):
    """BM25's top-k must compile to TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge) — a corpus-wide single-partition rank
    window here would funnel every scored doc through one task at
    100 TB. The rank window is allowed only AFTER the limit, over the k
    survivors."""
    plan = plan_of(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan


def test_semdedup_centroids_broadcast_pairs_equijoined(spark):
    """SemDeDup's within-cluster pair stage must be an equi-join
    hash-partitioned on centroid_id — never a cartesian pair
    enumeration — fed from the ONE materialized assignment pass (the
    broadcast-centroid assign runs inside the eager checkpoint, so the
    visible plan starts at its Scan ExistingRDD)."""
    plan = plan_of(spark, "dedup_semdedup_prune")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(centroid_id" in plan
    assert "Scan ExistingRDD" in plan  # checkpointed working set, built once


def test_leakage_safe_split_has_zero_leaky_pairs(spark):
    """The component-keyed split's defining invariant, checked from the
    executed result: no near-dup pair straddles train/test."""
    rows = QUERIES["sample_leakage_safe_split"](spark, SF_DIR).collect()
    assert rows and all(r["n_leaky_pairs"] == 0 for r in rows)
    assert {r["split"] for r in rows} <= {"train", "test"}


def test_cbo_stats_reorder_joins_selective_dim_first(spark):
    """With ANALYZE'd catalog stats and spark.sql.cbo.joinReorder on,
    the deliberately bad written order (orders ⋈ customer first, the
    filtered 1-row nation last) must be REWRITTEN so the selective
    nation join executes before the fact join — the optimized plan
    lists the nation relation inside the inner join subtree, above the
    orders relation. Without stats-driven reorder the written order
    survives and this assertion fails."""
    import uuid

    from etl_developstoday_test_spark.sources.tables import load_table

    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.cbo.enabled", "true")
    s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    suff = uuid.uuid4().hex[:8]
    names = {t: f"cbo_{t}_{suff}" for t in ("orders", "customer", "nation")}
    try:
        for t, name in names.items():
            load_table(s2, SF_DIR, t).write.mode("overwrite").saveAsTable(name)
            s2.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
        q = s2.sql(f"""
            SELECT n_name, COUNT(*) AS n_orders
            FROM {names['orders']} o
            JOIN {names['customer']} c ON o.o_custkey = c.c_custkey
            JOIN {names['nation']} n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_7'
            GROUP BY n_name
        """)
        opt = q._jdf.queryExecution().optimizedPlan().toString()
        assert opt.index(names["nation"]) < opt.index(names["orders"]), opt
    finally:
        for name in names.values():
            s2.sql(f"DROP TABLE IF EXISTS {name}")


def test_nested_schema_pruning_reads_only_subfield(spark, tmp_path):
    """Nested-column pruning (spark.sql.optimizer.nestedSchemaPruning,
    on by default): selecting one subfield of a struct column from
    parquet must push a PRUNED ReadSchema — only the selected leaf, not
    the whole struct — to the scan. At 100 TB of media/metadata structs
    this is the difference between reading one int column and
    deserializing every nested field of every row."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "nested")
    spark.range(100).select(
        "id",
        F.struct(
            F.col("id").alias("w"),
            (F.col("id") * 2).alias("h"),
            F.repeat(F.lit("x"), 100).alias("blob"),
        ).alias("meta"),
    ).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src).select("id", F.col("meta.w").alias("w"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "w" in read_schema
    assert "blob" not in read_schema and "h:" not in read_schema, read_schema


def test_span_corruption_plan_is_shuffle_free(spark):
    """text_t5_span_corruption's scale claim pinned at the plan level:
    the whole denoising plan (span selection + sequence accounting) is
    one narrow codegen map — zero Exchange, zero Python."""
    plan = (
        QUERIES["text_t5_span_corruption"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan
    # codegen spans print as "*(n)" in executedPlan().toString()
    assert "*(1)" in plan


def test_embed_dimension_drift_single_scan_one_exchange(spark):
    """The per-dimension drift table must be ONE corpus scan feeding
    ONE map-side-combined groupBy on the dimension id — posexplode is
    a narrow in-row expansion, and the top-10 is TakeOrdered, never a
    single-partition global sort."""
    import re

    plan = plan_of(spark, "embed_dimension_drift")
    assert len(re.findall(r"Scan parquet|FileScan", plan)) == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan


def test_snapshot_delta_one_diff_join_one_rollup(spark):
    """The CDC diff is ONE full-outer equi-join on the doc id (both
    snapshot projections co-shuffle on the same key) plus ONE
    map-side-combined source rollup — nothing corpus-sized broadcasts
    and nothing runs single-partition."""
    plan = plan_of(spark, "dedup_snapshot_delta")
    assert "FullOuter" in plan
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastExchange" not in plan


def _staged_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_burstiness_window_partitioned_topk_not_global_sort(spark):
    """interarrival_burstiness (staged r12): the gap window must be
    PARTITIONED by user_id (never a global sort of the corpus), and
    the worst-k card must compile to TakeOrderedAndProject."""
    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_burstiness,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    import re

    plan = _staged_plan(
        interarrival_burstiness(load_table(spark, SF_DIR, "events"))
    )
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s == "user_id" for s in specs)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_gini_window_only_over_bounded_multiplicity_table(spark):
    """user_gini_concentration (staged r12): the ONLY partitionless
    window runs AFTER the two groupBys, over the count-multiplicity
    table (bounded by the count domain) — the corpus itself is never
    globally sorted, and nothing broadcasts."""
    from etl_developstoday_test_spark.operators.events_etl import (
        user_gini_concentration,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        user_gini_concentration(load_table(spark, SF_DIR, "events"))
    )
    # two hash aggregations precede the single-partition stage: the
    # SinglePartition exchange is fed by the (c, m) aggregate, not a scan
    idx_win = plan.index("Window")
    idx_aggs = [
        i
        for i in range(len(plan))
        if plan.startswith("HashAggregate", i)
    ]
    assert sum(1 for i in idx_aggs if i > idx_win) >= 2, (
        "the multiplicity groupBys must run below (before) the window"
    )
    assert "BroadcastExchange" not in plan


def test_decile_thresholds_window_partitioned_by_group(spark):
    """quality_decile_thresholds (staged r12): the cumulative window is
    partitioned by the group column over the value-multiplicity
    aggregate — never over raw documents — and the doc scan reads only
    the two needed columns."""
    from etl_developstoday_test_spark.operators.sampling import (
        quality_decile_thresholds,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(quality_decile_thresholds(docs))
    assert "windowspecdefinition(g" in plan
    assert "Exchange SinglePartition" not in plan
    # column pruning: text never leaves the scan
    scan_line = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "text" not in scan_line


def test_topk_key_share_takeordered_then_bounded_window(spark):
    """topk_key_share (staged r12): the top-k branch is the
    checkpointed k-row RDD (its corpus scan already ran, as
    TakeOrdered, at checkpoint time); the ONLY FileScan left in the
    returned plan is the total pass, reading just the key column
    through one hash exchange. The SinglePartition stages are the
    1-row total and the k-row window input — both bounded."""
    import re

    from etl_developstoday_test_spark.operators.skew import topk_key_share

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = topk_key_share(li, "l_suppkey", k=10)
    plan = _staged_plan(out)
    assert "Scan ExistingRDD" in plan  # the k-row checkpoint
    scans = re.findall(r"FileScan parquet \[(\w+)", plan)
    assert scans == ["l_suppkey"]  # total pass, key column only
    assert plan.count("Exchange hashpartitioning") == 1
    assert out.count() == 10


def test_benford_after_checkpoint_is_nine_row_only(spark):
    """benford_first_digit (staged r12): everything after the one
    corpus aggregate runs on the checkpointed 9-row spine — the
    returned plan has no parquet scan, and the audit's heavy stage
    (verified by the oracle locks) is a single map-side-combined
    groupBy upstream."""
    from etl_developstoday_test_spark.operators.drift import (
        benford_first_digit,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = benford_first_digit(orders, "o_totalprice")
    plan = _staged_plan(out)
    assert "FileScan" not in plan and "Scan parquet" not in plan
    assert out.count() == 9


def test_fk_orphan_audit_antijoin_no_single_partition_data_stage(spark):
    """fk_orphan_audit (staged r13): each relation resolves its
    orphans through a LEFT ANTI equi-join (never a NOT IN subquery
    rewrite into a cartesian shape); the only single-partition stages
    are the 1-row count aggregates."""
    from etl_developstoday_test_spark.operators.dq import fk_orphan_audit

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = _staged_plan(
        fk_orphan_audit(
            [("li->o", li, "l_orderkey", orders, "o_orderkey")]
        )
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_top_event_paths_window_partitioned_topk(spark):
    """top_event_paths (staged r13): both leads live in ONE window
    spec keyed on user_id, and the card compiles to
    TakeOrderedAndProject — no global sort, no partitionless window."""
    import re

    from etl_developstoday_test_spark.operators.events_etl import (
        top_event_paths,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    out = top_event_paths(load_table(spark, SF_DIR, "events"))
    plan = _staged_plan(out)
    # the path-counts table is checkpointed (bounded: |types|³ rows),
    # so the returned plan has NO corpus stage left at all — the one
    # user-partitioned window ran exactly once, at checkpoint time
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan
    checkpoint_plan = out._jdf.queryExecution().analyzed().toString()
    assert re.search(r"windowspecdefinition", checkpoint_plan) is None
    assert out.count() > 0


def test_adamic_adar_no_degree_broadcast_hint(spark):
    """adamic_adar_link_prediction (staged r13): the vertex-sized
    degree/weight table attaches by equi-join with NO broadcast hint
    in the analyzed plan (AQE may still choose one at runtime on
    bench-scale data — the hint is what would pin the OOM at 100 TB),
    and the existing-edge exclusion is LEFT ANTI."""
    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    _, edges = _coactivity_edges(spark, SF_DIR, checkpoint=False)
    out = adamic_adar_link_prediction(edges)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "LeftAnti" in _staged_plan(out)


def test_source_vocab_js_single_corpus_scan(spark):
    """source_vocab_js (staged r13): the (source, token) counts table
    is checkpointed, so the returned plan reads the corpus ZERO times
    (the one tokenize pass ran at checkpoint time) — without it the
    six downstream branches re-tokenize six times."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        source_vocab_js,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(source_vocab_js(docs))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_norm_profile_two_aggregates_no_windows(spark):
    """norm_profile (staged r13): one narrow fold into a
    map-side-combined groupBy(label), one label-keyed join back for
    the tails — no window operator anywhere and nothing
    single-partition."""
    from etl_developstoday_test_spark.operators.similarity import (
        norm_profile,
    )

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _staged_plan(norm_profile(embs))
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_hash_split_balance_after_checkpoint_is_bounded(spark):
    """hash_split_balance_audit (staged r13 batch 2): everything after
    the one md5 aggregate runs on the checkpointed 100-row spine — no
    parquet stage left in the returned plan."""
    from etl_developstoday_test_spark.operators.sampling import (
        hash_split_balance_audit,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(hash_split_balance_audit(docs, "doc_id"))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_cluster_size_histogram_single_digest_pass(spark):
    """cluster_size_histogram (staged r13 batch 2): the histogram is
    checkpointed (bounded by the size domain), so the returned plan —
    shares, savings, total — reads it alone; the digest groupBy ran
    exactly once, at checkpoint time."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        cluster_size_histogram,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(cluster_size_histogram(docs))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_pareto_curve_no_single_task_ranking(spark):
    """pareto_revenue_curve (staged r13 batch 2): the tile cut is
    exact_ntile (range exchange, no Exchange SinglePartition over
    data); the per-tile table is checkpointed, so the returned plan is
    n_tiles-row-bounded."""
    from etl_developstoday_test_spark.operators.skew import (
        pareto_revenue_curve,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = pareto_revenue_curve(orders, "o_custkey", "o_totalprice")
    plan = _staged_plan(out)
    assert "FileScan parquet" not in plan  # bounded tail only
    assert "Scan ExistingRDD" in plan
    assert out.count() == 10


def test_chi2_categorical_bounded_tail(spark):
    """chi2_categorical (staged r13 batch 2): after the two leaf
    aggregates merge into the checkpointed category table, the
    returned plan carries no corpus stage and no partitionless window.
    """
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.drift import (
        chi2_categorical,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    out = chi2_categorical(
        ev.filter(F.dayofmonth("ts") <= 15),
        ev.filter(F.dayofmonth("ts") > 15),
        "event_type",
    )
    plan = _staged_plan(out)
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan


def test_uniqueness_audit_single_exchange_per_relation(spark):
    """uniqueness_audit (staged r12): one map-side-combined groupBy on
    the key columns per relation, no cartesian shapes, and the card is
    1-row aggregates only."""
    from etl_developstoday_test_spark.operators.dq import uniqueness_audit

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _staged_plan(
        uniqueness_audit(
            [("li", li, ["l_orderkey", "l_linenumber"])]
        )
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_daily_autocorr_bounded_tail(spark):
    """daily_autocorr_lag1 (staged r12): the daily table is
    checkpointed (calendar-bounded) and the moments collapse to a
    checkpointed 1-row frame — no corpus stage in the returned plan."""
    from etl_developstoday_test_spark.operators.drift import (
        daily_autocorr_lag1,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    out = daily_autocorr_lag1(load_table(spark, SF_DIR, "events"), "value")
    plan = _staged_plan(out)
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_heaps_fit_bounded_tail_single_shingle_pass(spark):
    """heaps_law_fit (staged r12): the shingle explode is checkpointed
    (one corpus pass feeds both the first-seen and per-bucket
    consumers) and the curve is a checkpointed <= n_buckets table —
    the returned plan has no parquet stage."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        heaps_law_fit,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(heaps_law_fit(docs))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_local_bridges_antijoin_no_degree_broadcast(spark):
    """local_bridges (registered r12): the bridge set is materialized
    (edge-bounded — the r12 rescan fix: every post-sym reference to
    the input lineage re-derived the events scan, 6 scans), so the
    RETURNED plan runs entirely on checkpointed tables and the LEFT
    ANTI lives in the bridge stage's own plan; degrees attach by
    equi-join with no broadcast hint in the analyzed plan."""
    import io
    from contextlib import redirect_stdout

    from etl_developstoday_test_spark.operators.graph import local_bridges
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    _, edges = _coactivity_edges(spark, SF_DIR, checkpoint=False)
    # capture the bridge stage's plan AS IT EXECUTES: localCheckpoint
    # materializes eagerly, so the LeftAnti shows in the lazy copy
    sym = (
        edges.selectExpr("ua AS u", "ub AS w")
        .unionAll(edges.selectExpr("ub AS u", "ua AS w"))
    )
    left = sym.selectExpr("w AS _m", "u AS ua")
    right = sym.selectExpr("w AS ub", "u AS _m")
    closed = (
        left.join(right, "_m")
        .filter("ua < ub")
        .select("ua", "ub")
        .distinct()  # mirrors the operator's map-side-combined dedup
    )
    epairs = sym.filter("u < w").selectExpr("u AS ua", "w AS ub")
    bridge_stage = epairs.join(closed, ["ua", "ub"], "left_anti")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bridge_stage.explain()
    assert "LeftAnti" in buf.getvalue()

    out = local_bridges(edges)
    plan = _staged_plan(out)
    # the returned tail runs on the checkpointed bridge/sym tables
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # the two 1-row count frames broadcast by hint; the vertex-sized
    # degree table must not
    assert analyzed.count("ResolvedHint") <= 2
    assert "TakeOrderedAndProject" in plan


def test_interval_bucket_join_is_equi_join_not_nested_loop(spark):
    """interval_bucket_join (staged r13): the range condition must ride
    as a RESIDUAL on a hash equi-join over (key, bucket) — never a
    BroadcastNestedLoop/CartesianProduct (the naive theta-join plan
    this operator exists to replace)."""
    from datetime import datetime, timedelta

    from etl_developstoday_test_spark.operators.asof import (
        interval_bucket_join,
    )

    t0 = datetime(2024, 6, 1)
    pdf = spark.createDataFrame(
        [(i % 3, t0 + timedelta(seconds=i)) for i in range(50)],
        "k long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j % 3, t0 + timedelta(seconds=j), t0 + timedelta(seconds=j + 20))
            for j in range(20)
        ],
        "k long, lo timestamp, hi timestamp",
    )
    plan = _staged_plan(
        interval_bucket_join(pdf, idf, "k", "ts", "lo", "hi")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" in plan  # a genuine equi-join node


def test_dow_anova_bounded_tail(spark):
    """dow_seasonality_anova (staged r13): the daily table is
    checkpointed (calendar-bounded) — no parquet stage in the returned
    plan."""
    from etl_developstoday_test_spark.operators.drift import (
        dow_seasonality_anova,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    out = dow_seasonality_anova(load_table(spark, SF_DIR, "events"), "value")
    plan = _staged_plan(out)
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_cohen_kappa_bounded_tail(spark):
    """cohen_kappa_agreement (staged r13): everything after the one
    confusion-matrix groupBy runs on the checkpointed label-domain
    table — no corpus stage in the returned plan."""
    from etl_developstoday_test_spark.operators.ml import (
        cohen_kappa_agreement,
    )
    from etl_developstoday_test_spark.operators.text_analysis import lang_id
    from etl_developstoday_test_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = cohen_kappa_agreement(lang_id(docs), "lang", "predicted_lang")
    plan = _staged_plan(out)
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_interval_zero_match_no_nested_loop(spark):
    """join_interval_zero_match (registered r13): the negative path
    must run the SAME equi-join plan as the positive one — a lossy
    rewrite that dropped the bucket equality (falling back to a
    nested-loop theta join) would still return the right answer here,
    so the plan shape is the thing to pin."""
    from etl_developstoday_test_spark.plans.queries import QUERIES

    plan = _staged_plan(QUERIES["join_interval_zero_match"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the INTERVAL join itself is a hash equi-join on (key, bucket)
    # with the range residual riding it
    assert any(
        "Join" in ln and "_ib" in ln and "NestedLoop" not in ln
        for ln in plan.splitlines()
    )
    # the only nested-loop nodes are the 1-row audit crossJoins
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert ", Cross" in ln


def test_rich_club_returned_plan_is_histogram_bound(spark):
    """graph_rich_club (registered r13): the returned plan runs
    entirely on the two checkpointed degree-domain histograms joined
    to the constant k spine — the corpus-sized co-activity derivation
    must be materialized behind the checkpoints, never re-derived by
    the card (the r13 rescan finding: 5.2s -> 2.9s)."""
    from etl_developstoday_test_spark.operators.graph import (
        rich_club_coefficient,
    )
    from etl_developstoday_test_spark.plans.queries import _coactivity_edges

    _, edges = _coactivity_edges(spark, SF_DIR, checkpoint=False)
    plan = _staged_plan(rich_club_coefficient(edges))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_kcore_capped_card_is_checkpoint_bound(spark):
    """graph_kcore_capped (registered r13): the returned card reads the
    checkpointed (n, est, prev) table only — the 8-sub-step h-index
    chain is materialized behind it, so the histogram + certificate
    never replay the iteration."""
    from etl_developstoday_test_spark.plans.queries import QUERIES

    plan = _staged_plan(QUERIES["graph_kcore_capped"](spark, SF_DIR))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_page_hinkley_bounded_tail(spark):
    """page_hinkley_daily (staged r14): the sequential-looking
    recurrences are frame windows over the CHECKPOINTED ≤366-row days
    table — no parquet stage, no corpus-sized window input in the
    returned plan."""
    from etl_developstoday_test_spark.operators.drift import (
        page_hinkley_daily,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        page_hinkley_daily(load_table(spark, SF_DIR, "events"), "value")
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_conversion_lag_co_keyed_no_broadcast_of_users(spark):
    """conversion_lag_card (staged r14): the starts table joins the
    purchase stream by a user_id equi-join (co-shuffled, no hint); the
    only broadcasts are the two 1-row audit aggregates."""
    from etl_developstoday_test_spark.operators.events_etl import (
        conversion_lag_card,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        conversion_lag_card(load_table(spark, SF_DIR, "events"))
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop nodes are the 1-row audit crossJoins; the
    # purchases -> starts attach stays an equi-join
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert ", Cross" in ln


def test_partition_balance_bounded_spine(spark):
    """partition_balance_profile (staged r14): the returned card runs
    on the checkpointed n_buckets-bounded histogram (audit moments
    broadcast from it) — one corpus-sized groupBy happens behind the
    checkpoint, never in the card's plan."""
    from etl_developstoday_test_spark.operators.skew import (
        partition_balance_profile,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        partition_balance_profile(
            load_table(spark, SF_DIR, "documents"), "source", 32
        )
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


# --- Round-14 registrations: per-query plan pins ------------------------------


def test_cusum_twosided_one_sort_no_union(spark):
    """drift_cusum_twosided: up+down recurrences ride the SAME
    (grp)-partitioned sort (frame windows, no second shuffle of the
    series) and the side emission is an array explode — never a Union
    re-reading the series."""
    plan = plan_of(spark, "drift_cusum_twosided")
    assert "Generate explode" in plan
    assert "Union" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan  # windows keyed by grp


def test_term_burstiness_takeordered_single_explode(spark):
    """text_term_burstiness: ONE tokenize explode, map-side-combined
    incidence counts, and the top-20 compiles to
    TakeOrderedAndProject — never a global sort."""
    plan = plan_of(spark, "text_term_burstiness")
    assert plan.count("Generate explode") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Sort [burstiness" not in plan


def test_degree_gini_returned_plan_is_histogram_bound(spark):
    """graph_degree_gini: the returned plan runs entirely on the
    CHECKPOINTED degree-domain histogram — no parquet stage; the one
    partitionless window is the rank-block cumulation over that
    bounded table (allowlisted class)."""
    plan = plan_of(spark, "graph_degree_gini")
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_fk_fanout_card_reads_checkpointed_histogram(spark):
    """dq_fk_fanout: the children-per-parent groupBys (corpus-sized)
    happen behind the eager checkpoint; the returned card reads the
    fanout-domain-bounded histogram, and its only nested-loop node is
    the 1-row audit cross."""
    plan = plan_of(spark, "dq_fk_fanout")
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert ", Cross" in ln


def test_wilson_ci_card_is_one_row(spark):
    """sample_wilson_ci: the corpus collapses behind the checkpoint to
    the exact (n, k) pair; the returned plan is the 1-row interval
    arithmetic — no join, no window, no shuffle."""
    plan = plan_of(spark, "sample_wilson_ci")
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_dau_wau_explode_rewrite_no_window(spark):
    """events_dau_wau_stickiness: the trailing COUNT(DISTINCT) is
    rewritten as the bounded ×7 pair explode — NO window anywhere
    (a range-frame distinct would be partial-aggregation-hostile),
    and the day join is an equi-join."""
    plan = plan_of(spark, "events_dau_wau_stickiness")
    assert "Generate explode" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_length_percentiles_single_scan_no_global_window(spark):
    """text_length_percentiles: one parquet scan of the projected
    length column, per-source interpolation — never a partitionless
    window over the corpus."""
    plan = plan_of(spark, "text_length_percentiles")
    assert plan.count("FileScan parquet") == 1
    assert "Exchange SinglePartition" not in plan
    assert "ReadSchema: struct<n_chars:bigint,source:string>" in plan or (
        "n_chars" in plan and "text" not in plan.split("ReadSchema")[-1]
    )


def test_pair_cosine_registered_plan_is_bucket_bound(spark):
    """embed_pair_cosine: the md5-bucket window and pair join run
    behind the checkpoint (bucket-partitioned — the registered plan
    shows no corpus-sized single-partition window); the returned
    histogram assembly reads the bounded table with a 1-row audit
    cross."""
    plan = plan_of(spark, "embed_pair_cosine")
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert ", Cross" in ln


# --- Round-15 registrations (staged r14): per-operator plan pins.
# These were written BEFORE registration; now that the twelve are in
# QUERIES the global sweep covers the registered rows too, and these
# keep pinning each operator's scale shape directly at the module
# boundary (the pins survive registration-name changes).


def test_markov_entropy_matrix_bound_card(spark):
    """markov_transition_entropy (staged r15): the user-partitioned
    lead() window runs behind the checkpoint; the returned plan reads
    the ≤k² transition matrix with a 1-row audit cross."""
    from etl_developstoday_test_spark.operators.events_etl import (
        markov_transition_entropy,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        markov_transition_entropy(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan  # the lead() window is checkpointed away


def test_key_candidate_profile_no_expand_single_scan(spark):
    """key_candidate_profile (staged r15): ONE scan through the
    stacked unpivot and a single-distinct aggregation — Spark must
    NOT plan an Expand (the multi-distinct row multiplier)."""
    from etl_developstoday_test_spark.operators.dq import (
        key_candidate_profile,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        key_candidate_profile(
            load_table(spark, SF_DIR, "events"),
            ["event_id", "event_type", "props", "ts", "user_id", "value"],
        )
    )
    assert plan.count("FileScan parquet") == 1
    assert "Expand" not in plan
    assert "Join" not in plan


def test_hourly_seasonality_bounded_card(spark):
    """hourly_seasonality (staged r15): the corpus groupBy happens
    behind the checkpoint; the returned plan is 24-row spine
    arithmetic (audit crosses + the 1-row peak TakeOrdered)."""
    from etl_developstoday_test_spark.operators.drift import (
        hourly_seasonality,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        hourly_seasonality(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "TakeOrderedAndProject" in plan  # the peak pick, 1 row
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert ", Cross" in ln


def test_value_moments_single_aggregate(spark):
    """value_moments (staged r15): ONE map-side-combined aggregate —
    a single scan, a single SinglePartition exchange for the 1-row
    card, no join, no window."""
    from etl_developstoday_test_spark.operators.drift import value_moments
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        value_moments(load_table(spark, SF_DIR, "events"), "value")
    )
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Window" not in plan


def test_rolling_zscore_windows_over_checkpointed_days(spark):
    """rolling_zscore_daily (staged r15): the frame windows run over
    the CHECKPOINTED calendar-days table — no parquet stage feeds a
    window."""
    from etl_developstoday_test_spark.operators.drift import (
        rolling_zscore_daily,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        rolling_zscore_daily(load_table(spark, SF_DIR, "events"), "value")
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan


def test_ngram_coverage_window_after_checkpointed_topk(spark):
    """ngram_coverage (staged r15): the cumulative window's input is
    the CHECKPOINTED k-row top table (the one FileScan in the plan is
    the audit rollup branch, never the window's input)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        ngram_coverage,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(ngram_coverage(docs))
    assert plan.count("Window") == 1
    lines = plan.splitlines()
    widx = next(i for i, ln in enumerate(lines) if "Window" in ln)
    # everything beneath the Window node until the next join branch
    # must be bounded (ExistingRDD), not a parquet scan
    below = "\n".join(lines[widx:widx + 6])
    assert "FileScan parquet" not in below
    assert "CartesianProduct" not in plan


def test_char_class_profile_single_pass(spark):
    """char_class_profile (staged r15): one narrow scan, one
    map-side-combined groupBy — no join, no window, no explode."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        char_class_profile,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(char_class_profile(docs))
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "Window" not in plan
    assert "Generate" not in plan


def test_ngram_containment_takeordered_partitioned_window(spark):
    """ngram_containment_topk (staged r15): the top-k compiles to
    TakeOrderedAndProject; the set-size windows are PARTITIONED by
    doc_id (never a single-partition corpus window); candidates come
    from the shingle equi-join (no cartesian)."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_containment_topk,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(ngram_containment_topk(docs))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_semi_join_single_scan_per_side(spark):
    """contamination_overlap (staged r15): the eval side is
    checkpointed once and read by both rollups; the train side scans
    parquet exactly once, straight into the distinct-type LeftSemi
    join."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long
    from etl_developstoday_test_spark.operators.text_dedup import (
        contamination_overlap,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    is_eval = (
        md5_long(F.concat(F.lit("ct#"), F.col("doc_id").cast("string")))
        % 13
        == 0
    )
    plan = _staged_plan(
        contamination_overlap(docs.filter(~is_eval), docs.filter(is_eval))
    )
    assert plan.count("FileScan parquet") == 1  # train side only
    assert "LeftSemi" in plan
    assert plan.count("Scan ExistingRDD") >= 2  # eval checkpoint, both rollups


def test_user_lifespan_card_is_histogram_bound(spark):
    """user_lifespan_histogram (staged r15): the per-user min/max
    aggregation runs behind the checkpoint; the returned plan is
    day-domain histogram arithmetic with the 1-row audit cross."""
    from etl_developstoday_test_spark.operators.events_etl import (
        user_lifespan_histogram,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        user_lifespan_histogram(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert ", Cross" in ln


def test_centroid_shift_bounded_dim_join_no_window(spark):
    """centroid_shift_profile (staged r15): the posexplode collapses
    behind the checkpoint to the (groups × dims) sums table; the
    returned plan joins that bounded table to its own rollup by dim —
    no parquet stage, no window, no second corpus scan."""
    from etl_developstoday_test_spark.operators.similarity import (
        centroid_shift_profile,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _staged_plan(centroid_shift_profile(emb))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan


def test_split_psi_single_scan_behind_checkpoint(spark):
    """split_psi_audit (staged r15): ONE corpus scan (split bit and
    bin in the same projection, conditional partial sums) behind the
    checkpoint; the returned plan is bin-bounded term assembly."""
    from etl_developstoday_test_spark.operators.sampling import (
        split_psi_audit,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        split_psi_audit(
            load_table(spark, SF_DIR, "events"),
            "value",
            "event_id",
            lo=0.0,
            hi=500.0,
        )
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan


# --- Round-16 staged operators: plan pins (written BEFORE
# registration — the global sweep covers them once they join QUERIES;
# these pin each operator's scale shape at the module boundary)


def test_new_vs_returning_checkpointed_days_window(spark):
    """new_vs_returning_daily (staged r16): the user-partitioned
    first-day window collapses BEFORE the checkpoint; the returned
    plan's only window (the cumulative sum) runs over the bounded
    days table."""
    from etl_developstoday_test_spark.operators.events_etl import (
        new_vs_returning_daily,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        new_vs_returning_daily(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan  # days table checkpointed
    assert plan.count("Window") <= 2  # cum-sum window only (+ sort)


def test_session_gaps_user_partitioned_window(spark):
    """session_gap_histogram (staged r16): the lag window is
    PARTITIONED by user_id (the sessionize shuffle shape); the
    returned plan reads the checkpointed hour histogram."""
    from etl_developstoday_test_spark.operators.events_etl import (
        session_gap_histogram,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        session_gap_histogram(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan  # the lag window is checkpointed away
    assert "BroadcastExchange" in plan  # the 1-row audit


def test_interarrival_survival_bounded_suffix_window(spark):
    """interarrival_survival (staged r16): the corpus collapses to
    the <= 9-row edge histogram behind the checkpoint; the suffix-sum
    window runs over that bounded table only."""
    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_survival,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        interarrival_survival(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_weekday_hour_heatmap_bounded_card(spark):
    """weekday_hour_heatmap (staged r16): the corpus groupBy happens
    BEFORE the checkpoint; the returned plan reads the 168-row spine
    with 1-row broadcast audits, no window at all."""
    from etl_developstoday_test_spark.operators.drift import (
        weekday_hour_heatmap,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    plan = _staged_plan(
        weekday_hour_heatmap(load_table(spark, SF_DIR, "events"))
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_dup_multiplicity_two_level_groupby(spark):
    """dup_multiplicity_profile (staged r16): per-key counts collapse
    map-side, then the bounded histogram is checkpointed — the
    returned plan never rescans the corpus."""
    from etl_developstoday_test_spark.operators.dq import (
        dup_multiplicity_profile,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _staged_plan(
        dup_multiplicity_profile(li, ["l_orderkey", "l_linenumber"])
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan


def test_order_reconciliation_presum_before_join(spark):
    """order_reconciliation (staged r16): lineitem collapses to
    per-order sums BEFORE the join (the join reads two aggregates,
    never a row-level fan-out), and the bucket card is bounded."""
    from etl_developstoday_test_spark.operators.dq import (
        order_reconciliation,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _staged_plan(order_reconciliation(orders, li))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_cluster_purity_no_self_join(spark):
    """cluster_source_purity (staged r16): clustering is ONE
    fingerprint groupBy — no pair join anywhere in the lineage (the
    operator exists to AVOID the all-pairs shape)."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        cluster_source_purity,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(cluster_source_purity(docs))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_ttr_hapax_two_scans_pruned(spark):
    """ttr_hapax_by_source (staged r16): the token rollup and the
    source spine are the only two corpus reads, and the spine scan
    prunes to the source column."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        ttr_hapax_by_source,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _staged_plan(ttr_hapax_by_source(docs))
    assert plan.count("FileScan parquet") <= 2
    assert "Window" not in plan


def test_dim_variance_bounded_rank_window(spark):
    """dim_variance_profile (staged r16): the corpus collapses to the
    dim-bounded moments table behind the checkpoint; the rank window
    runs over that bounded table only."""
    from etl_developstoday_test_spark.operators.similarity import (
        dim_variance_profile,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _staged_plan(dim_variance_profile(emb))
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "BroadcastExchange" in plan


def test_intra_cluster_tightness_broadcast_centroids(spark):
    """intra_cluster_tightness (staged r16): the centroid table joins
    by BROADCAST (label-bounded) — the vector side is never shuffled
    beyond its scan — and the rollup is one hash aggregate."""
    from etl_developstoday_test_spark.operators.similarity import (
        intra_cluster_tightness,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _staged_plan(intra_cluster_tightness(emb))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_regressogram_single_aggregate(spark):
    """regressogram (staged r16): ONE map-side-combined groupBy to
    the x-domain table behind the checkpoint, 1-row audit broadcast
    back."""
    from etl_developstoday_test_spark.operators.ml import regressogram

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _staged_plan(
        regressogram(li, "l_quantity", ["l_discount", "l_extendedprice"])
    )
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_poisson_bootstrap_bounded_explode_shape(spark):
    """poisson_bootstrap_mean_ci (staged r16): the n_reps explode
    collapses map-side to the R-row replicate table (checkpointed);
    the returned plan reads bounded tables with 1-row broadcasts and
    no corpus-sized window (the rank window ran over R rows behind
    the checkpoint)."""
    from etl_developstoday_test_spark.operators.sampling import (
        poisson_bootstrap_mean_ci,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    plan = _staged_plan(poisson_bootstrap_mean_ci(ev, "value", "event_id"))
    assert "Scan ExistingRDD" in plan  # replicate tables checkpointed
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
