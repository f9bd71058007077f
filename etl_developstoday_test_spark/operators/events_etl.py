"""Reference ETL operator classes expressed over the generic ``events``
table (event_id, ts, user_id, event_type, value, props).

The taxi pipeline in ``pipeline.py`` is the faithful reproduction; these
functions re-express the *same operator classes* — P9 validity routing,
D1 first-wins dedup, T2/T3 normalization, B2 counter aggregation, the
derived-time-measure T4 — over a schema the correctness oracle can see,
plus the streaming-adjacent shapes (sessionization, tumbling windows)
the reference's pipeline would need under Structured Streaming.

Reference parity anchors: validity routing ← TripEtlPipelineService.cs:
83-126; first-wins dedup ← TripDuplicateDetectorService.cs:36-49;
UTC conversion ← TripRowNormalizerService.cs:174-191; counters ←
TripImportStatisticsDto.cs:10-46.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import dsum

KNOWN_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
MAX_VALID_VALUE = 300.0
SESSION_GAP_MICROS = 30 * 60 * 1_000_000  # 30 minutes

# First-wins dedup key for events (D1 analogue): one winner per
# (user_id, event_type); file order ≈ (ts, event_id).
DEDUP_KEYS = ["user_id", "event_type"]
DEDUP_ORDER = ["ts", "event_id"]


def with_error(events: DataFrame) -> DataFrame:
    """P9 analogue: first-failure-wins error attribution, null = valid."""
    error = (
        F.when(F.col("ts").isNull(), "invalid ts")
        .when(F.col("value").isNull() | (F.col("value") < 0), "invalid value")
        .when(F.col("value") > MAX_VALID_VALUE, "value out of range")
        .when(
            F.col("event_type").isNull() | (F.trim("event_type") == ""),
            "empty event_type",
        )
        .when(~F.col("event_type").isin(KNOWN_EVENT_TYPES), "unknown event_type")
    )
    return events.withColumn("error", error)


def split_valid(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    flagged = with_error(events)
    return (
        flagged.filter(F.col("error").isNull()).drop("error"),
        flagged.filter(F.col("error").isNotNull()),
    )


def _ranked(valid: DataFrame) -> DataFrame:
    w = Window.partitionBy(*DEDUP_KEYS).orderBy(*DEDUP_ORDER)
    return valid.withColumn("rn", F.row_number().over(w).cast("long"))


def dedup_winners(valid: DataFrame) -> DataFrame:
    return _ranked(valid).filter(F.col("rn") == 1).drop("rn")


def dedup_losers(valid: DataFrame) -> DataFrame:
    return _ranked(valid).filter(F.col("rn") > 1)


def normalize(events: DataFrame, timezone: str = "America/New_York") -> DataFrame:
    """T2/T3/T4 analogue: local→UTC stamp, code normalization, exact
    epoch-micros derived column."""
    return events.select(
        "event_id",
        F.to_utc_timestamp("ts", timezone).alias("ts_utc"),
        "user_id",
        F.upper(F.trim("event_type")).alias("event_type_norm"),
        "value",
        F.unix_micros("ts").alias("ts_micros"),
    )


def import_stats(events: DataFrame) -> DataFrame:
    """B2 analogue: the reference's six counters as a 1-row DataFrame —
    ONE aggregation pass, one scan (no driver-side loops, no cache).
    The conditional ``count_distinct(CASE WHEN valid AND keys non-null
    THEN struct(keys) END)`` replicates COUNT(DISTINCT keys)-over-valid
    exactly (both skip NULLs), fusing what used to be two aggregates —
    the same single-pass shape as pipeline.run_stats_only."""
    flagged = with_error(events)
    valid = F.col("error").isNull()
    keys_nonnull = F.lit(True)
    for k in DEDUP_KEYS:
        keys_nonnull = keys_nonnull & F.col(k).isNotNull()
    key_struct = F.when(valid & keys_nonnull, F.struct(*DEDUP_KEYS))
    return flagged.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count(F.when(valid, 1)).alias("parsed_rows"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("invalid_rows"),
        (F.count(F.when(valid, 1)) - F.count_distinct(key_struct)).alias(
            "duplicate_rows"
        ),
        F.count_distinct(key_struct).alias("inserted_rows"),
        (F.count(F.when(valid, 1)) - F.count_distinct(key_struct)).alias(
            "duplicates_file_rows"
        ),
    )


def time_since_previous(events: DataFrame) -> DataFrame:
    """T4 analogue as a window op: exact microseconds since the user's
    previous event (null for the first)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("micros_since_prev"),
    )


def sessionize(events: DataFrame, gap_micros: int = SESSION_GAP_MICROS) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user was
    idle longer than ``gap_micros``. Batch twin of Structured Streaming's
    ``session_window`` (streaming/pipeline.py uses the native one)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_micros), 1).otherwise(0)
    sess = events.select(
        "user_id", "event_id", "ts", "value", is_new.alias("is_new")
    ).withColumn("session_id", F.sum("is_new").over(w).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("total_value"),
    )


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1h event-time window aggregation (batch twin of the
    streaming windowed agg)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


def mad_outliers_per_type(events) -> "DataFrame":
    """Per-group robust outlier stats via ``applyInPandas`` (group-map
    Pandas UDF): median, MAD (median absolute deviation), and the count
    of |value − median| > 3·MAD outliers, per event_type.

    This is the batch escape hatch for per-group logic Spark
    expressions can't comfortably express (the stats here CAN be done
    with exact percentiles — the point is the contract: whole-group
    pandas DataFrame in, DataFrame out, Arrow both ways). Determinism
    holds because median/MAD are SELECTIONS (sort + midpoint average,
    one IEEE addition and halving), not order-dependent accumulations —
    so a SQL oracle using quantile_cont(0.5) matches bit-for-bit.

    Scale posture: one shuffle on the grouping key; each group must fit
    one executor's memory (the applyInPandas contract) — fine for
    bounded group counts like event types; use the expression-based
    percentile path for high-cardinality keys.
    """
    import numpy as np
    import pandas as pd

    def median_cont(values: np.ndarray) -> float:
        # quantile_cont(0.5) interpolation — lo + (hi-lo)*0.5, NOT
        # numpy's (lo+hi)/2: the two differ in the last ulp for some
        # doubles, and the oracle contract is bitwise
        v = np.sort(values[~np.isnan(values)])
        mid = (len(v) - 1) // 2
        if len(v) % 2 == 1:
            return float(v[mid])
        lo, hi = float(v[mid]), float(v[mid + 1])
        return lo + (hi - lo) * 0.5

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype="float64", na_value=np.nan)
        med = median_cont(v)
        dev = np.abs(v - med)
        mad = median_cont(dev)
        with np.errstate(invalid="ignore"):
            n_out = int(np.nansum(dev > 3 * mad))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [float(med)],
                "mad_value": [float(mad)],
                "n_outliers": [n_out],
            }
        )

    return events.groupBy("event_type").applyInPandas(
        stats,
        schema=(
            "event_type string, n_events long, median_value double,"
            " mad_value double, n_outliers long"
        ),
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered FUNNEL conversion over the event stream: how many users
    performed step 1, then step 2 STRICTLY AFTER their first step 1,
    then step 3 strictly after that — the canonical product-analytics
    rollup (view → click → purchase), and the ordered-sequence shape
    the per-pair ``events_type_transitions`` matrix cannot express
    (a user who purchases BEFORE ever viewing does not convert).
    Per user the funnel anchors greedily on FIRST qualifying
    timestamps (min ts of step k among events after the user's step
    k−1 anchor) — the standard unordered-window funnel semantics.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Exact semantics on integer-microsecond timestamps (strict ``>``
    comparisons, min aggregates — no floats until the two
    6-dp-rounded rate divisions of exact counts), so the 3-row card is
    a cross-engine total order by construction.

    Scale shape: one filtered map-side-combined min-aggregate per step,
    chained by equi-joins that ALL co-shuffle on user_id (with AQE
    free to broadcast the shrinking step frames at runtime — step k's
    table only loses users as k grows); counts are 1-row aggregates
    joined by 1-row broadcasts. Nothing corpus-sized is windowed,
    broadcast by hint, or collected. Returns one row per step:
    (step_idx, step, n_users, rate_vs_prev, rate_vs_first).
    """
    if len(steps) != 3:
        raise ValueError("funnel_conversion: exactly 3 steps supported")

    s1 = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == steps[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == steps[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    c2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n3"))

    def rate(num, den):
        return F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).otherwise(F.lit(0.0))

    n1, n2, n3 = F.col("n1"), F.col("n2"), F.col("n3")
    card = (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("step_idx"),
                        F.lit(steps[0]).alias("step"),
                        n1.alias("n_users"),
                        F.when(n1 > 0, F.lit(1.0))
                        .otherwise(F.lit(0.0))
                        .alias("rate_vs_prev"),
                        F.when(n1 > 0, F.lit(1.0))
                        .otherwise(F.lit(0.0))
                        .alias("rate_vs_first"),
                    ),
                    F.struct(
                        F.lit(2).alias("step_idx"),
                        F.lit(steps[1]).alias("step"),
                        n2.alias("n_users"),
                        rate(n2, n1).alias("rate_vs_prev"),
                        rate(n2, n1).alias("rate_vs_first"),
                    ),
                    F.struct(
                        F.lit(3).alias("step_idx"),
                        F.lit(steps[2]).alias("step"),
                        n3.alias("n_users"),
                        rate(n3, n2).alias("rate_vs_prev"),
                        rate(n3, n1).alias("rate_vs_first"),
                    ),
                )
            ).alias("s")
        )
        .select("s.*")
    )
    return card.orderBy("step_idx")


def interarrival_burstiness(
    events: DataFrame, min_gaps: int = 5, k: int = 20
) -> DataFrame:
    """Per-user inter-arrival BURSTINESS: the Goh-Barabási (2008)
    coefficient B = (σ−μ)/(σ+μ) over the gaps between a user's
    consecutive events — B→−1 for a metronome, 0 for a Poisson
    process, →+1 for extreme burst-silence alternation. The single
    most-used temporal-pattern probe a behavioral corpus card needs
    and one ``etl_time_since_prev`` (which returns the raw gaps)
    deliberately stops short of.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Determinism contract: gaps are exact integer SECONDS
    (``unix_micros div 1_000_000`` — floor division on integer
    microseconds, never a double truncation); per-user Σg sums as an
    exact LONG on the codegen fast path (r12, the adamic-adar lesson:
    decimal accumulation over a corpus-sized stream measured 2.3x
    slower than long sums), while Σg² squares and sums IN
    decimal(38,0) (r12 ADVICE: a single epoch-zero junk timestamp
    puts one gap ≥ ~3.04e9 s whose square wraps a long silently under
    non-ANSI Spark — the squared term's headroom is the binding one,
    so only it pays the decimal toll; both paths are bit-identical on
    integer inputs and the oracle is untouched). Mean/variance come
    out of identical doubles in an identical expression tree;
    σ = sqrt(max(var, 0)) clamps the −ulp case. Ties in the per-user
    ordering break on event_id.

    Scale shape: ONE window partitioned by user_id (a user's own
    history — the same bounded-partition contract as sessionize),
    one map-side-combined groupBy, then TakeOrderedAndProject for the
    top-k card. Nothing corpus-sized is windowed without a partition
    key, broadcast, or collected. Returns
    (user_id, n_gaps, mean_gap_s, burstiness), worst-k by B.
    """
    if min_gaps < 2:
        raise ValueError("interarrival_burstiness: min_gaps must be >= 2")
    sec = F.expr("unix_micros(ts) div 1000000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "ts", "event_id")
        .withColumn("_s", sec)
        .withColumn("gap", F.col("_s") - F.lag("_s").over(w))
        .filter(F.col("gap").isNotNull())
    )
    g = F.col("gap")
    # Σg stays a long sum (gaps are bounded by the corpus time span —
    # a per-user Σg overflow needs 10¹⁰ users' worth of seconds); Σg²
    # goes back through decimal (r12 ADVICE): ONE epoch-zero junk
    # timestamp makes a gap ≥ ~3.04e9 s whose square wraps a long
    # silently under non-ANSI Spark, where decimal is exact — and the
    # square is computed IN decimal ((19,0)·(19,0) → (38,0)) so the
    # product itself can't wrap pre-cast. The 2.3× decimal-sum lesson
    # applied to Σg (the common term) and paid only for the squared
    # term whose headroom is genuinely tighter.
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(g.cast("long")).alias("_s1"),
        F.sum(g.cast("decimal(19,0)") * g.cast("decimal(19,0)")).alias(
            "_s2"
        ),
    )
    n = F.col("n_gaps").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mu = s1 / n
    var = F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))
    sig = F.sqrt(var)
    return (
        agg.filter(
            (F.col("n_gaps") >= min_gaps) & (F.col("_s1") > 0)
        )
        .select(
            "user_id",
            "n_gaps",
            F.round(mu, 6).alias("mean_gap_s"),
            F.round((sig - mu) / (sig + mu), 6).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), F.asc("user_id"))
        .limit(k)
    )


def user_type_entropy(
    events: DataFrame, min_events: int = 10, k: int = 20
) -> DataFrame:
    """Per-user Shannon ENTROPY of the event-type mix — the behavioral
    diversity score (H = −Σ p·ln p over the user's type shares): 0 for
    a single-type user, ln(n_types) for a perfectly mixed one. The
    per-user complement of the global ``events_type_transitions``
    matrix, and the standard panel feature for engagement breadth.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Determinism contract: p = c/n is one double division of exact
    integers; each ln is nano-quantized (the drift-kit contract);
    per-user terms accumulate through the exact decimal summator, so
    the 6-dp entropy is bit-identical cross-engine. Top-k ties break
    on user_id.

    Scale shape: two map-side-combined groupBys — (user, type) then
    user — and a TakeOrderedAndProject for the card. No windows, no
    broadcasts, no collects. Returns
    (user_id, n_events, n_types, entropy), most-diverse-k.
    """
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = per_type.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p = F.col("c").cast("double") / F.col("n_events").cast("double")
    lnq_p = F.round(F.log(p) * 1e9).cast("long").cast("double") / 1e9
    terms = per_type.join(totals, "user_id").select(
        "user_id",
        "n_events",
        "n_types",
        (p * lnq_p).cast("decimal(30,10)").alias("_t"),
    )
    return (
        terms.groupBy("user_id", "n_events", "n_types")
        .agg(F.round(-F.sum("_t").cast("double"), 6).alias("entropy"))
        .filter(F.col("n_events") >= min_events)
        .orderBy(F.desc("entropy"), F.asc("user_id"))
        .limit(k)
    )


def user_gini_concentration(events: DataFrame) -> DataFrame:
    """EXACT Gini coefficient of the events-per-user distribution —
    the one-number answer to "how concentrated is this corpus on its
    heaviest users": 0 when every user contributes equally, →1 when a
    handful dominate. The whole-distribution complement of a top-k
    share card, and the number a 100-TB curation run checks before
    trusting any per-user cap.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Scale-safety is the point of the construction: the textbook
    G = 2·Σᵢ i·xᵢ/(n·Σx) − (n+1)/n needs a GLOBAL rank over users —
    a partitionless window over a corpus-sized table. Instead the
    per-user counts collapse to a (count, multiplicity) table first —
    bounded by the count DOMAIN (≤ max events per user), not the user
    count — and each equal-value block of m users spanning ranks
    (s, s+m] contributes c·(m·s + m(m+1)/2) in closed form. The only
    window runs over that bounded multiplicity table (same class as
    the drift kit's bins tables; bounded-window allowlist on
    registration).

    Determinism contract: block terms are products of exact integers
    evaluated once in double (identical cross-engine), accumulated
    through a decimal summator wide enough for 10²⁶; the final
    expression is a fixed-order double tree over exact totals,
    rounded to 6 dp. Returns one row: (n_users, n_events, gini).
    """
    counts = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mult = counts.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("m"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    blocks = mult.withColumn(
        "s", F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long")
    )
    term = (
        F.col("c").cast("double")
        * (
            F.col("m") * F.col("s")
            + F.expr("m * (m + 1) div 2")
        ).cast("double")
    ).cast("decimal(38,6)")
    agg = blocks.agg(
        F.sum("m").cast("long").alias("n_users"),
        F.sum(F.col("c") * F.col("m")).cast("long").alias("n_events"),
        F.sum(term).alias("_srank"),
    )
    n = F.col("n_users").cast("double")
    t = F.col("n_events").cast("double")
    srank = F.col("_srank").cast("double")
    return agg.select(
        "n_users",
        "n_events",
        F.round(
            F.lit(2.0) * srank / (n * t) - (n + F.lit(1.0)) / n, 6
        ).alias("gini"),
    )


def top_event_paths(
    events: DataFrame, path_len: int = 3, k: int = 20
) -> DataFrame:
    """Most-frequent ordered event-type PATHS of length ``path_len``
    across all user streams — the sequence-mining card between the
    pair-transition matrix (length 2, all pairs) and the fixed funnel
    (one hand-picked sequence): which 3-step behaviors actually
    dominate the corpus, with their share of all observed paths.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    A path is ``path_len`` CONSECUTIVE events of one user in
    (ts, event_id) order, joined with '>' — overlapping windows count
    every occurrence (the standard n-gram-over-sessions convention).
    Exact counts; one 6-dp share division; (count DESC, path ASC)
    total order.

    Scale shape: ONE window partitioned by user_id (lead × 2 — a
    user's own history, the sessionize partition contract), one
    map-side-combined groupBy on the path string, a 1-row total, and
    TakeOrderedAndProject for the card. Returns top-k rows:
    (path, n_occurrences, share).
    """
    if path_len != 3:
        raise ValueError("top_event_paths: path_len=3 is the supported shape")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("_t2", F.lead("event_type", 1).over(w))
        .withColumn("_t3", F.lead("event_type", 2).over(w))
        # all three legs non-null: a NULL type is a parse failure, not
        # a step (and '||' vs concat_ws must agree cross-engine)
        .filter(
            F.col("event_type").isNotNull()
            & F.col("_t2").isNotNull()
            & F.col("_t3").isNotNull()
        )
        .select(
            F.concat_ws(">", "event_type", "_t2", "_t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        # bounded: |event types|³ rows — and the total branch would
        # otherwise replay the whole window+groupBy pipeline
        .localCheckpoint(eager=True)
    )
    total = paths.agg(
        F.coalesce(F.sum("n_occurrences"), F.lit(0))
        .cast("long")
        .alias("_t")
    )
    return (
        paths.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n_occurrences",
            F.round(
                F.col("n_occurrences").cast("double")
                / F.col("_t").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(k)
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly COHORT-RETENTION triangle: bucket every user by the ISO
    week of their FIRST event (the cohort), then count how many of
    each cohort's users are active in each subsequent week — the
    canonical "are newer users stickier?" panel, and for a behavioral
    training corpus the user-lifetime mix card (a corpus whose later
    cohorts churn immediately over-represents one-session behavior).
    The longitudinal leg the events kit lacked: sessionize/funnel are
    within-stream, RFM is as-of-now, this is week-over-week.

    Registered round 12 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: weeks are ``date_trunc('week', ts)``
    Monday-start dates — identical semantics in Spark and DuckDB —
    and every number is an exact integer count; retention is ONE
    6-dp division by the cohort's own week-0 size. Week offsets are
    exact day-difference div 7 (both endpoints are Mondays, so the
    division is always exact).

    Scale shape: ONE map-side-combined min-aggregate per user (first
    event), ONE (user, week) distinct — both corpus-sized shuffles
    co-keyed on user_id, so the cohort join is co-shuffled (AQE free
    to pick the strategy); the final rollup lands on the
    weeks×weeks-bounded cohort table, checkpointed before the
    cohort-size self-join. Returns one row per (cohort_week,
    week_offset) with activity: (cohort_week, week_offset, n_active,
    cohort_size, retention), ordered by (cohort_week, week_offset).
    """
    firsts = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("_first"))
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", F.col("_first"))).alias(
                "cohort_week"
            ),
        )
    )
    active = events.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("_w")
    ).distinct()
    cells = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("_w"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .localCheckpoint(eager=True)  # bounded: weeks x weeks
    )
    sizes = cells.filter(F.col("week_offset") == 0).select(
        F.col("cohort_week").alias("_cw"),
        F.col("n_active").alias("cohort_size"),
    )
    return (
        cells.join(sizes, cells["cohort_week"] == sizes["_cw"])
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def conversion_lag_card(
    events: DataFrame,
    from_types: tuple[str, ...] = ("view", "click"),
    to_type: str = "purchase",
    bucket_hours: int = 6,
) -> DataFrame:
    """TIME-TO-CONVERT distribution card: per user, the lag from the
    FIRST qualifying exposure (any of ``from_types``) to the FIRST
    ``to_type`` event AT OR AFTER it, bucketed into fixed
    ``bucket_hours`` bins — the longitudinal companion to the ordered
    funnel (which counts WHO converts; this says HOW LONG conversion
    takes, the number a training-data freshness window or an
    attribution-window choice must be calibrated against: a 30-minute
    attribution pad is indefensible if the median lag is 2 days).

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: first-exposure and first-conversion
    timestamps are exact MIN/microsecond longs; the lag is integer
    seconds by floor division; bucket ids are exact integer `div`
    (never a double floor); the card's one double is the 6-dp
    conversion rate. Users whose first ``to_type`` precedes any
    exposure never convert BY THIS DEFINITION (the event can't be
    attributed to an exposure that hadn't happened) — they count in
    n_started only if exposed at all, the standard funnel convention.

    Scale shape: two map-side-combined groupBys and one equi-join,
    ALL co-keyed on user_id (one shuffle partitioning reused
    end-to-end); the histogram is bounded by the corpus time span
    over ``bucket_hours``; the audit totals are a 1-row broadcast.
    Returns one row per occupied lag bucket:
    (lag_bucket, lag_lo_hours, n_users, n_started, n_converted,
    conversion_rate), bucket-ordered.
    """
    if bucket_hours < 1:
        raise ValueError("conversion_lag_card: bucket_hours must be >= 1")
    us = F.unix_micros(F.col("ts"))
    starts = (
        events.filter(F.col("event_type").isin(*from_types))
        .groupBy("user_id")
        .agg(F.min(us).alias("_t0"))
        .localCheckpoint(eager=True)  # join + audit share it
    )
    conv = (
        events.filter(F.col("event_type") == to_type)
        .select("user_id", us.alias("_tp"))
        .join(starts, "user_id")
        .filter(F.col("_tp") >= F.col("_t0"))
        .groupBy("user_id")
        .agg(F.min(F.col("_tp") - F.col("_t0")).alias("_lag_us"))
        .localCheckpoint(eager=True)  # histogram + audit share it
    )
    bucket_s = int(bucket_hours) * 3600
    hist = (
        conv.select(
            F.expr(f"(_lag_us div 1000000) div {bucket_s}L").alias(
                "lag_bucket"
            )
        )
        .groupBy("lag_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    audit = (
        starts.agg(F.count(F.lit(1)).cast("long").alias("n_started"))
        .crossJoin(
            F.broadcast(
                conv.agg(
                    F.count(F.lit(1)).cast("long").alias("n_converted")
                )
            )
        )
        .select(
            "n_started",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_started").cast("double"),
                6,
            ).alias("conversion_rate"),
        )
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "lag_bucket",
            (F.col("lag_bucket") * F.lit(int(bucket_hours)))
            .cast("long")
            .alias("lag_lo_hours"),
            "n_users",
            "n_started",
            "n_converted",
            "conversion_rate",
        )
        .orderBy("lag_bucket")
    )


def dau_wau_stickiness(events: DataFrame) -> DataFrame:
    """DAU / trailing-7-day-WAU STICKINESS series — the standard
    engagement-depth card (how much of the weekly audience shows up
    on a given day; 1/7 ≈ once-a-week visitors, →1 daily habit):
    the rolling-audience companion to the cohort-retention triangle
    (cohorts say who COMES BACK; stickiness says how DENSE the habit
    is) and the series a volume-anomaly reviewer reads next (a volume
    spike with flat stickiness = new users or a double-fire; rising
    stickiness = genuine habit shift).

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: pure exact integers (distinct (user, day) activity
    pairs; WAU(d) = distinct users active in [d−6, d]) until one 6-dp
    division per day. Only OBSERVED days report (the trailing window
    covers calendar gaps correctly — a user active on d supports WAU
    for d..d+6 whether or not the corpus has rows there, but a day
    with no activity at all has no DAU row to report).

    Scale shape: ONE corpus-sized distinct collapses the stream to
    (user, day) pairs; each pair explodes onto the ≤7 future days it
    supports (bounded ×7 fan-out — the standard rolling-distinct
    rewrite, because count(DISTINCT) over a RANGE frame is not
    partial-aggregable); one distinct + map-side-combined count per
    day; the DAU/WAU join is day-keyed and days-bounded. Returns one
    row per observed day: (d, dau, wau, stickiness), day-ordered.
    """
    pairs = (
        events.select("user_id", F.to_date("ts").alias("d"))
        .filter(F.col("d").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)  # dau + wau cover share it
    )
    dau = pairs.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    cover = pairs.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("d"),
    ).distinct()
    wau = cover.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return (
        dau.join(wau, "d")  # inner: only observed days report
        .select(
            "d",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("d")
    )


def markov_transition_entropy(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order MARKOV TRANSITION card over per-user event-type
    sequences: the full transition matrix (from_type, to_type,
    n_transitions, conditional probability) plus the chain's
    plug-in ENTROPY RATE H(X_t | X_{t-1}) = Σ_a π(a)·H(row_a) — the
    sequence-predictability number a funnel/paths review reads next
    to events_top_paths (WHICH paths dominate; this says how
    DETERMINISTIC the type process is overall: rate near 0 = users
    follow one script, near ln(k) = types fire independently).

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: sequences are ordered by (ts, id) WITHIN user — a
    total order, so both engines form the identical adjacency pairs;
    transition counts are exact longs; the entropy rate uses the
    count identity Σ_ab c_ab·(lnq(c_a·) − lnq(c_ab)) / C with ln
    NANO-QUANTIZED per count (the PSI/PMI/bigram-entropy idiom) and
    the sum accumulated through decimal(38,0) over the
    type-domain-bounded matrix (c·lnq exceeds 2⁶³ at web-scale
    counts); conditional probabilities and the assembled rate are
    single double divisions, 6-dp rounded.

    Scale shape: ONE user-co-keyed window (partitioned by user — the
    sessionize shuffle shape, never a global sort) feeds lead(); the
    corpus then collapses map-side to the ≤ k² transition matrix;
    marginals, the entropy accumulation, and the 1-row audit all ride
    that bounded table (localCheckpointed); the audit joins back by
    broadcast. Returns one row per observed transition: (from_type,
    to_type, n_transitions, p_cond, n_total, entropy_rate), ordered.
    """
    lnq = lambda c: F.round(  # noqa: E731 — nano-quantized ln
        F.log(c.cast("double")) * 1e9
    ).cast("long")

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    seq = events.select(
        F.col(type_col).alias("a"),
        F.lead(type_col).over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    tc = (
        seq.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # bounded: |type domain|²
    )
    fm = tc.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    joined = tc.join(fm, "a")
    ent = joined.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.sum(
            (
                F.col("c").cast("decimal(38,0)")
                * (lnq(F.col("ca")) - lnq(F.col("c"))).cast("decimal(38,0)")
            ).cast("decimal(38,0)")
        ).alias("_s"),
    )
    audit = ent.select(
        "n_total",
        F.round(
            F.col("_s").cast("double")
            / F.lit(1e9)
            / F.col("n_total").cast("double"),
            6,
        ).alias("entropy_rate"),
    )
    return (
        joined.crossJoin(F.broadcast(audit))
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("to_type"),
            F.col("c").alias("n_transitions"),
            F.round(
                F.col("c").cast("double") / F.col("ca").cast("double"), 6
            ).alias("p_cond"),
            "n_total",
            "entropy_rate",
        )
        .orderBy("from_type", "to_type")
    )


def user_lifespan_histogram(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """USER-LIFESPAN histogram: days between each user's first and
    last event, bucketed by whole days, with the population audit
    (user count, mean lifespan) on every row. The tenure card beside
    the retention triangle (cohort decay over calendar time) and
    DAU/WAU (instantaneous density): a corpus whose lifespans pile at
    0 days is drive-by traffic no retention matrix will save, and the
    lifespan tail is the denominator for any LTV-style cut.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: spans are exact integer microseconds (max − min per
    user) floor-divided into whole days; the mean is an exact
    decimal(38,0) sum of day counts over the user table divided once
    (6-dp). Same-timestamp-only users land in bucket 0.

    Scale shape: ONE user-co-keyed map-side-combined min/max
    aggregation, collapsed to the day-domain-bounded histogram by a
    second map-side-combined groupBy; the 1-row audit rides the
    bounded table and broadcasts back. Returns one row per occupied
    span bucket: (span_days, n_users, n_users_total, mean_span_days),
    span-ordered.
    """
    per = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.min(F.unix_micros(F.col(ts_col))).alias("_a"),
            F.max(F.unix_micros(F.col(ts_col))).alias("_b"),
        )
        .select(
            F.expr("(_b - _a) div 86400000000")
            .cast("long")
            .alias("span_days")
        )
    )
    hist = per.groupBy("span_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).localCheckpoint(eager=True)  # bounded: day domain
    audit = hist.agg(
        F.sum("n_users").cast("long").alias("n_users_total"),
        F.round(
            F.sum(
                (
                    F.col("span_days").cast("decimal(38,0)")
                    * F.col("n_users").cast("decimal(38,0)")
                ).cast("decimal(38,0)")
            ).cast("double")
            / F.sum("n_users").cast("double"),
            6,
        ).alias("mean_span_days"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select("span_days", "n_users", "n_users_total", "mean_span_days")
        .orderBy("span_days")
    )


def new_vs_returning_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """NEW-vs-RETURNING daily mix: for each calendar day, the count
    of active users seen for the FIRST time that day vs returning
    users, plus the exact cumulative distinct-user curve. The
    acquisition/engagement decomposition under every growth chart —
    a flat DAU built from churn-and-replace (high new share) and a
    flat DAU built from a loyal base (low new share) are opposite
    businesses, and the cumulative curve is the exact audience-size
    denominator cohort analyses divide by.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: activity collapses to DISTINCT (user, day) pairs; a
    user's first day is a min over that exact pair set, so "new" is
    well-defined even with multiple same-day events; counts are
    exact longs; the cumulative distinct-user curve is the exact
    integer prefix sum of n_new over days (no second distinct pass —
    each user is new exactly once); the share is the only double,
    6-dp.

    Scale shape: ONE map-side-combined groupBy to the (user, day)
    pair table; the first-day min is a user-co-keyed window over
    those pairs (same hash partitioning — no extra shuffle class);
    ONE more map-side groupBy collapses to the calendar-days table
    (localCheckpointed — bounded), and the prefix sum runs over that
    bounded table (the Page-Hinkley allowlist class). Returns one
    row per active day: (d, n_active, n_new, n_returning, new_share,
    cum_users), day-ordered.
    """
    pairs = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(user_col).alias("u"),
            F.to_date(ts_col).alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("u", "d")
    )
    w = Window.partitionBy("u")
    marked = pairs.select(
        "d",
        (F.col("d") == F.min("d").over(w)).alias("_is_new"),
    )
    daily = (
        marked.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("_is_new"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .localCheckpoint(eager=True)  # bounded: calendar days
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).cast("long").alias(
            "n_returning"
        ),
        F.round(
            F.col("n_new").cast("double") / F.col("n_active").cast("double"),
            6,
        ).alias("new_share"),
        F.sum("n_new").over(wd).cast("long").alias("cum_users"),
    ).orderBy("d")


def session_gap_histogram(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_micros: int = SESSION_GAP_MICROS,
) -> DataFrame:
    """BETWEEN-SESSION gap histogram: the distribution of idle time
    between a user's consecutive sessions (gaps above the sessionize
    timeout), bucketed by whole hours, with the gap-count and exact
    mean-gap audit on every row. The return-rhythm card the session
    kit needs beside sessionize itself: WITHIN-session behavior says
    what users do, the between-session gap distribution says when
    they come back — and its mass near the timeout is the direct
    evidence for whether the 30-minute convention splits real visits
    (calibrating exactly the knob sessionize exposes).

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: per-user deltas order by (ts, id) — a total order,
    so both engines form identical gaps; a gap is between-session
    iff strictly greater than ``gap_micros`` (the sessionize
    boundary predicate, reused verbatim); bucket ids are integer
    division of exact micro gaps; the mean is an exact long micro
    sum divided once (6-dp hours).

    Scale shape: ONE user-co-keyed lag window (the sessionize
    shuffle shape) collapsed map-side to the hour-domain-bounded
    histogram; the 1-row audit rides the bounded table and
    broadcasts back. Returns one row per occupied hour bucket:
    (gap_hours, n_gaps, n_gaps_total, mean_gap_hours),
    bucket-ordered.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gaps = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            user_col,
            ts_col,
            id_col,
            (
                F.unix_micros(F.col(ts_col))
                - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            ).alias("_gap"),
        )
        .filter(F.col("_gap") > F.lit(gap_micros))
    )
    hist = (
        gaps.select(
            F.expr("_gap div 3600000000").cast("long").alias("gap_hours"),
            "_gap",
        )
        .groupBy("gap_hours")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("_gap").cast("long").alias("_s"),
        )
        .localCheckpoint(eager=True)  # bounded: hour domain
    )
    audit = hist.agg(
        F.sum("n_gaps").cast("long").alias("n_gaps_total"),
        F.round(
            F.sum("_s").cast("double")
            / F.lit(3.6e9)
            / F.sum("n_gaps").cast("double"),
            6,
        ).alias("mean_gap_hours"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select("gap_hours", "n_gaps", "n_gaps_total", "mean_gap_hours")
        .orderBy("gap_hours")
    )


# fixed left edges (seconds) for the inter-arrival survival buckets:
# sub-second, second, 10s, minute, 5min, the 30-min session timeout,
# hour, 6h, day — the decades operational latency/return questions ask
SURVIVAL_EDGES_SECONDS = (0, 1, 10, 60, 300, 1800, 3600, 21600, 86400)


def interarrival_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """INTER-ARRIVAL survival curve: per-user consecutive-event gaps
    binned at fixed operational edges (1s, 10s, 1min, 5min, 30min,
    1h, 6h, 1d) with each bucket's mass and the exact survival share
    S(edge) = P(gap >= edge). The distributional companion to
    events_interarrival_burstiness (one CV number): burstiness says
    the process is not Poisson, the survival curve says WHERE the
    mass sits — S(1800s) is precisely the probability a random gap
    crosses the sessionize timeout, read directly off the card.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: gaps order by (ts, id) within user (total order);
    bucket assignment is a fixed literal edge chain on exact micro
    gaps (identical CASE chain in the oracle); counts and the
    cumulative tail sums are exact longs; survival and share divide
    once each, 6-dp.

    Scale shape: ONE user-co-keyed lag window collapsed map-side to
    the <= 9-row edge-bounded histogram (localCheckpointed); the
    survival column is an exact integer suffix sum over that bounded
    table, the audit a 1-row broadcast. Returns one row per edge
    bucket with any mass: (bucket, gap_lo_seconds, n_gaps, share,
    survival, n_gaps_total), bucket-ordered.
    """
    edges = SURVIVAL_EDGES_SECONDS
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = (
        F.unix_micros(F.col(ts_col))
        - F.lag(F.unix_micros(F.col(ts_col))).over(w)
    )
    bucket = F.lit(0)
    for i, e in enumerate(edges):
        bucket = F.when(F.col("_gap") >= F.lit(e * 1_000_000), F.lit(i)).otherwise(
            bucket
        )
    hist = (
        events.filter(F.col(ts_col).isNotNull())
        .select(user_col, ts_col, id_col, gap.alias("_gap"))
        .filter(F.col("_gap").isNotNull())
        .select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
        .localCheckpoint(eager=True)  # bounded: <= len(edges) rows
    )
    wt = Window.orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    edge_map = F.array(*[F.lit(e) for e in edges])
    cum = hist.select(
        "bucket",
        "n_gaps",
        F.sum("n_gaps").over(wt).cast("long").alias("_tail"),
    )
    audit = hist.agg(F.sum("n_gaps").cast("long").alias("n_gaps_total"))
    return (
        cum.crossJoin(F.broadcast(audit))
        .select(
            "bucket",
            F.get(edge_map, F.col("bucket")).cast("long").alias(
                "gap_lo_seconds"
            ),
            "n_gaps",
            F.round(
                F.col("n_gaps").cast("double")
                / F.col("n_gaps_total").cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.col("_tail").cast("double")
                / F.col("n_gaps_total").cast("double"),
                6,
            ).alias("survival"),
            "n_gaps_total",
        )
        .orderBy("bucket")
    )
