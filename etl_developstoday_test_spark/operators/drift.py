"""Distribution-drift and change-point monitoring operators.

The data-quality layer a long-running ingest needs BETWEEN snapshots:
"did this column's distribution move?" (PSI) and "did this metric's
level shift, and when?" (CUSUM). Both are pure window/aggregate
DataFrame code — no Python, no iteration — and both follow the repo's
cross-engine determinism contract (fixed bin edges; per-row doubles in
a fixed operation order; exact decimal accumulation for every sum).

Staged in round 7 (implemented + unit-tested while the driver window
cleared certification debt), registered as ``queries()``/
``oracle_sql()`` entries in round 8 (``drift_psi_value_shift``,
``drift_cusum_daily_level``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import ACC_DECIMAL


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    group_col: str | None = None,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    snapshot of one numeric column, optionally per group.

    PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b), with the standard 1e-4
    floor on empty-bin proportions so the log stays finite. Bin edges
    are FIXED from caller-supplied [lo, hi] (derive them once from the
    baseline and pin them — edges re-derived per run would make drift
    scores incomparable across runs, and a min/max scan per snapshot
    would double the I/O). Values outside [lo, hi] clamp into the edge
    bins, so the index is total over all rows.

    Shape: each side is one narrow binning map + one groupBy on
    (group, bin) — two map-side-combined shuffles total, merged by a
    single outer join on the tiny (groups × bins) key space; the final
    per-group PSI is an exact-decimal sum over ≤ n_bins per-bin doubles
    (partition-order independent). Interpretation thresholds follow
    industry convention: <0.1 stable, 0.1–0.25 moderate, >0.25 major.

    Cross-engine exactness: p and q are exact ratios of identical
    integers (correctly-rounded double division — bit-identical on any
    engine), but ln(p/q) is NOT correctly-rounded-guaranteed across
    libm implementations, so the log factor is quantized to integer
    nanos (round(ln·1e9) as BIGINT) before the per-bin term
    (p−q)·(lq/1e9) is formed — the ``unigram_logprob_deciles``
    contract, applied to the one transcendental in the formula.

    Returns one row per group: (group, psi, n_base, n_current) —
    ``group`` is '<all>' when ``group_col`` is None.
    """
    if lo is None or hi is None:
        raise ValueError("psi_drift: pin lo/hi from the baseline once")
    if hi <= lo:
        # hi == lo would make the bin width 0: the bin expression
        # divides by zero (NULL under non-ANSI Spark), greatest() skips
        # the NULL, every row lands in bin 0 on both sides, and PSI
        # silently reports 0 (stable) for ANY drift
        raise ValueError("psi_drift: hi must be > lo")
    if n_bins < 1:
        raise ValueError("psi_drift: n_bins must be >= 1")

    width = (hi - lo) / n_bins

    def binned(df: DataFrame, side: str) -> DataFrame:
        g = (
            F.col(group_col).cast("string")
            if group_col
            else F.lit("<all>")
        )
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(value_col).cast("double") - lo) / width
                ).cast("int"),
            ),
        )
        return (
            df.select(g.alias("grp"), b.alias("bin"))
            .groupBy("grp", "bin")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    bb = binned(base, "base")
    cc = binned(current, "current")
    merged = bb.join(cc, ["grp", "bin"], "full_outer").select(
        "grp",
        "bin",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_current", F.lit(0)).alias("n_current"),
    )
    w = Window.partitionBy("grp")
    tot_b = F.sum("n_base").over(w)
    tot_c = F.sum("n_current").over(w)
    p = F.greatest(F.col("n_base").cast("double") / tot_b, F.lit(1e-4))
    q = F.greatest(
        F.col("n_current").cast("double") / tot_c, F.lit(1e-4)
    )
    lq = F.round(F.log(p / q) * 1e9).cast("long")
    term = (p - q) * (lq.cast("double") / 1e9)
    return (
        merged.select(
            "grp",
            "n_base",
            "n_current",
            term.cast(ACC_DECIMAL).alias("_term"),
        )
        .groupBy("grp")
        .agg(
            F.sum("_term").cast("double").alias("psi"),
            F.sum("n_base").alias("n_base"),
            F.sum("n_current").alias("n_current"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """One-sided (upward) CUSUM change-point detection per group,
    expressed WITHOUT the sequential recurrence.

    Textbook CUSUM is S_i = max(0, S_{i−1} + (x_i − target − slack)) —
    a left fold no window aggregate computes directly. But with prefix
    sums P_i = Σ_{j≤i} (x_j − target − slack), the recurrence has the
    closed form **S_i = P_i − min(0, min_{j≤i} P_j)** (the running
    max-drawdown identity; the 0 is the empty-prefix restart option),
    so the whole detector is two frame windows over ONE
    shuffle/sort on (group, order): a running sum and a running min.
    Exact decimal accumulation makes both prefix series — and therefore
    the alarm positions — bit-identical across engines and partition
    layouts. Caveat for cross-ENGINE replays: the initial double→
    decimal cast of ``value_col`` is only engine-stable when the value
    is quantized (e.g. rounded to ≤6 dp) — Spark rounds the shortest
    decimal repr while other engines may round the binary expansion,
    and full-precision doubles can disagree at the 10th decimal.

    Returns alarm rows only: (group, order, value, cusum) where
    cusum > threshold — at 100 TB the output is the (tiny) alarm set,
    never the full series.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # literals cast to decimal too: decimal-minus-double coerces the
    # whole expression back to double, silently discarding exactness
    dev = (
        F.col(value_col).cast(ACC_DECIMAL)
        - F.lit(target).cast(ACC_DECIMAL)
    ) - F.lit(slack).cast(ACC_DECIMAL)
    prefix = F.sum(dev).over(w)
    with_s = df.select(
        F.col(group_col).alias("grp"),
        F.col(order_col).alias("ord"),
        F.col(value_col).alias("value"),
        prefix.alias("_p"),
    ).select(
        "grp",
        "ord",
        "value",
        (
            F.col("_p")
            - F.least(
                F.lit(0).cast(ACC_DECIMAL),
                F.min("_p").over(
                    Window.partitionBy("grp")
                    .orderBy("ord")
                    .rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
        )
        .cast("double")
        .alias("cusum"),
    )
    return with_s.filter(F.col("cusum") > threshold)


def psi_drift_series(
    df: DataFrame,
    value_col: str,
    period_col,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """PSI monitoring SERIES: one Population Stability Index per time
    period against the EARLIEST period as the fixed baseline — the
    continuous form of ``psi_drift`` (one-shot PSI answers "did the
    distribution move between these two snapshots"; a long-running
    ingest needs "when did it start moving and how fast", which is
    this per-period series with conventional stable/moderate/major
    levels attached).

    Registered in round 10 as ``drift_psi_series`` (two-scale
    oracle lock in tests/test_staged_oracles.py).

    Same determinism contract as ``psi_drift``: fixed caller-pinned
    [lo, hi] bin edges (values beyond clamp into the edge bins), exact
    integer bin counts, correctly-rounded double proportions with the
    standard 1e-4 empty-bin floor, ln(p/q) nano-quantized before the
    per-bin term, exact-decimal term sum. The baseline period's own
    PSI is exactly 0.0 (p == q bin-for-bin), which doubles as a
    built-in self-check.

    NULL values are EXCLUDED from the distribution and surfaced as a
    per-period ``n_nulls`` column instead of being silently clamped
    into bin 0 (in a long-running monitor a NULL influx is itself a
    drift signal — upstream schema/parse breakage — and folding it
    into the lowest bin would both hide it and corrupt the PSI). They
    ride the same single pass via a sentinel bin. Periods are defined
    by non-NULL rows: a period whose values are ALL NULL has no
    distribution to score and is absent from the series.

    Shape: ONE corpus pass (narrow binning map + map-side-combined
    groupBy on (period, bin)), materialized once at (periods x bins)
    rows; everything downstream — baseline slice, dense period x bin
    grid, proportion windows, level casing — runs on that bounded
    table. The level thresholds compare the exact-decimal PSI double,
    so the labels are engine-stable too.

    Returns one row per period: (period, psi, n_rows, n_nulls,
    drift_level) with drift_level in {stable (<0.1), moderate
    (<=0.25), major}.
    """
    if lo is None or hi is None:
        raise ValueError("psi_drift_series: pin lo/hi once")
    if hi <= lo:
        raise ValueError("psi_drift_series: hi must be > lo")
    if n_bins < 1:
        raise ValueError("psi_drift_series: n_bins must be >= 1")

    width = (hi - lo) / n_bins
    per = F.col(period_col) if isinstance(period_col, str) else period_col
    v = F.col(value_col).cast("double")
    # NULL values take the -1 sentinel bin in the SAME single pass
    # (no second corpus scan for the null accounting)
    b = F.when(v.isNull(), F.lit(-1)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.greatest(F.lit(0), F.floor((v - lo) / width).cast("int")),
        )
    )
    all_counts = (
        df.select(per.alias("period"), b.alias("bin"))
        .groupBy("period", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()  # (periods x (bins+1)) rows; five consumers below
    )
    all_counts.count()
    nulls = all_counts.filter(F.col("bin") == -1).select(
        "period", F.col("n").alias("_n_nulls")
    )
    counts = all_counts.filter(F.col("bin") >= 0)
    bp = counts.agg(F.min("period").alias("_bp"))
    bc = (
        counts.crossJoin(F.broadcast(bp))
        .filter(F.col("period") == F.col("_bp"))
        .select("bin", F.col("n").alias("n_base"))
    )
    btot = bc.agg(F.sum("n_base").alias("_tb"))
    grid = (
        counts.select("period")
        .distinct()
        .select(
            "period",
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
    )
    merged = (
        grid.join(counts, ["period", "bin"], "left")
        .select(
            "period", "bin", F.coalesce("n", F.lit(0)).alias("n_cur")
        )
        .join(F.broadcast(bc), "bin", "left")
        .crossJoin(F.broadcast(btot))
        .select(
            "period",
            "n_cur",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            "_tb",
        )
    )
    w = Window.partitionBy("period")
    p = F.greatest(
        F.col("n_base").cast("double") / F.col("_tb"), F.lit(1e-4)
    )
    q = F.greatest(
        F.col("n_cur").cast("double") / F.sum("n_cur").over(w), F.lit(1e-4)
    )
    lq = F.round(F.log(p / q) * 1e9).cast("long")
    term = (p - q) * (lq.cast("double") / 1e9)
    out = (
        merged.select(
            "period", "n_cur", term.cast(ACC_DECIMAL).alias("_term")
        )
        .groupBy("period")
        .agg(
            F.sum("_term").cast("double").alias("psi"),
            F.sum("n_cur").alias("n_rows"),
        )
        .join(F.broadcast(nulls), "period", "left")  # periods-sized
        .select(
            "period",
            "psi",
            "n_rows",
            F.coalesce(F.col("_n_nulls"), F.lit(0))
            .cast("long")
            .alias("n_nulls"),
            F.when(F.col("psi") < 0.1, F.lit("stable"))
            .when(F.col("psi") <= 0.25, F.lit("moderate"))
            .otherwise(F.lit("major"))
            .alias("drift_level"),
        )
        .localCheckpoint(eager=True)  # periods rows
    )
    all_counts.unpersist()  # real release: went through persist()
    return out


def ks_two_sample(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    quantum: int = 100,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between a baseline
    and a current snapshot of one numeric column — the third leg of the
    drift kit: PSI sees binned mass movement (and is blind inside a
    bin), CUSUM sees level shifts over time, KS is the classic
    distribution-free whole-CDF test whose statistic
    D = max_v |F_base(v) − F_cur(v)| catches shape changes PSI's ten
    fixed bins smear out, with a standard significance threshold
    (c(0.05) = 1.358) that needs no distributional assumptions.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: values are quantized up front to
    ``1/quantum`` units (round(v·quantum) as BIGINT — the drift kit's
    micro-quantize idiom), so every per-value count is an exact
    integer and each CDF point is ONE correctly-rounded double
    division of identical integers; the difference and its 6-dp
    rounding are fixed-order, and the argmax value carries a (D DESC,
    vq ASC) total tiebreak — the row hash-matches a SQL replay.

    Scale shape: ONE map-side-combined groupBy per side on the
    quantized value, then everything runs on the merged DISTINCT-value
    table, whose size is bounded by the value DOMAIN times ``quantum``
    — a property of the column, not the corpus (a [0, 200] metric at
    centi-precision is ≤ 20k rows at any SF). The cumulative-count
    window over that bounded table is partitionless BY CONSTRUCTION —
    the same bounded-input allowlist class as the merge levels of the
    quantile rollup. Returns ONE row: (n_base, n_current, ks_stat,
    ks_at_value, critical_005, drifted).
    """
    if quantum < 1:
        raise ValueError("ks_two_sample: quantum must be >= 1")

    def side(df: DataFrame, name: str) -> DataFrame:
        # NULL *and* NaN are excluded BEFORE quantization: Spark's
        # non-ANSI cast folds round(NaN·quantum) to 0, which would
        # silently bin NaN at vq=0 while the SQL twin diverges — the
        # documented exclusion contract covers both non-values.
        v = F.col(value_col).cast("double")
        return (
            df.select(v.alias("_v"))
            .filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
            .select(
                F.round(F.col("_v") * quantum).cast("long").alias("vq")
            )
            .groupBy("vq")
            .agg(F.count(F.lit(1)).alias(name))
        )

    a, b = side(base, "n_a"), side(current, "n_b")
    merged = (
        a.join(b, "vq", "full_outer")
        .select(
            "vq",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
        .localCheckpoint(eager=True)  # bounded: |value domain| * quantum
    )
    # Loud failure on a degenerate side: with n_base or n_current = 0
    # every CDF ratio is NULL and the row would carry NULL
    # ks_stat/drifted — raise instead, matching the operator's
    # degenerate-input convention. The totals read is one cheap action
    # over the already-materialized bounded checkpoint.
    trow = merged.agg(
        F.coalesce(F.sum("n_a"), F.lit(0)).cast("long").alias("_ta"),
        F.coalesce(F.sum("n_b"), F.lit(0)).cast("long").alias("_tb"),
    ).collect()[0]
    if trow["_ta"] == 0 or trow["_tb"] == 0:
        raise ValueError(
            "ks_two_sample: empty side after NULL/NaN exclusion "
            f"(n_base={trow['_ta']}, n_current={trow['_tb']})"
        )
    ta = F.lit(trow["_ta"]).cast("long")
    tb = F.lit(trow["_tb"]).cast("long")
    w = Window.orderBy("vq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = merged.withColumn("_ca", F.sum("n_a").over(w)).withColumn(
        "_cb", F.sum("n_b").over(w)
    )
    # each CDF point: one exact-integer ratio; D rounded to 6 dp BEFORE
    # the (D DESC, vq ASC) argmax so the pick is a total order. The
    # totals travel as literals (collected above) — no crossJoin stage.
    d = F.round(
        F.abs(
            F.col("_ca").cast("double") / ta.cast("double")
            - F.col("_cb").cast("double") / tb.cast("double")
        ),
        6,
    )
    crit = F.lit(1.358) * F.sqrt(
        (ta + tb).cast("double") / (ta.cast("double") * tb.cast("double"))
    )
    return (
        cum.select(
            ta.alias("n_base"),
            tb.alias("n_current"),
            d.alias("ks_stat"),
            (F.col("vq").cast("double") / quantum).alias("ks_at_value"),
            F.round(crit, 6).alias("critical_005"),
            (d > crit).alias("drifted"),
        )
        .orderBy(F.desc("ks_stat"), F.asc("ks_at_value"))
        .limit(1)
    )


def js_divergence(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Jensen–Shannon divergence between a baseline and a current
    snapshot of one numeric column over the same FIXED bins as
    ``psi_drift`` — the drift kit's fourth leg and the one with the
    properties the others lack: symmetric, always finite (no empty-bin
    floor needed — a bin one side never hits contributes p·ln2, not
    ±∞), bounded in [0, ln 2], and √JS is a true metric, so JS scores
    are comparable across columns and across time in a way PSI's
    unbounded index is not. Lin 1991: JS(p,q) = ½KL(p‖m) + ½KL(q‖m),
    m = (p+q)/2.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Determinism contract: bin counts are exact integers; p and q are
    correctly-rounded double divisions of identical integers; m and
    the p/m, q/m ratios are fixed-order double arithmetic; each ln is
    nano-quantized (the ``psi_drift`` contract, applied to the two
    transcendentals per bin); the per-bin term
    (p·lnq(p/m) + q·lnq(q/m))/2 accumulates through the exact decimal
    summator, so the 6-dp result is bit-identical cross-engine.
    Zero-count bins contribute exactly their surviving half (0·ln is
    skipped by construction, never evaluated as NaN). NULL and NaN are
    excluded on both sides (the ``ks_two_sample`` contract); an empty
    side raises rather than returning a NULL score.

    Scale shape: one narrow binning map + ONE map-side-combined
    groupBy per side, merged by an outer join on the ≤ n_bins key
    space — everything after the two leaf aggregates runs on a bounded
    bins table. Returns one row:
    (n_base, n_current, js_divergence, js_distance).
    """
    if lo is None or hi is None:
        raise ValueError("js_divergence: pin lo/hi from the baseline once")
    if hi <= lo:
        raise ValueError("js_divergence: hi must be > lo")
    if n_bins < 1:
        raise ValueError("js_divergence: n_bins must be >= 1")

    width = (hi - lo) / n_bins

    def binned(df: DataFrame, side: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("_v") - lo) / width).cast("int"),
            ),
        )
        return (
            df.select(v.alias("_v"))
            .filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(side))
        )

    merged = (
        binned(base, "n_b")
        .join(binned(current, "n_c"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            F.coalesce("n_c", F.lit(0)).alias("n_c"),
        )
        .localCheckpoint(eager=True)  # bounded: <= n_bins rows
    )
    trow = merged.agg(
        F.coalesce(F.sum("n_b"), F.lit(0)).cast("long").alias("_tb"),
        F.coalesce(F.sum("n_c"), F.lit(0)).cast("long").alias("_tc"),
    ).collect()[0]
    if trow["_tb"] == 0 or trow["_tc"] == 0:
        raise ValueError(
            "js_divergence: empty side after NULL/NaN exclusion "
            f"(n_base={trow['_tb']}, n_current={trow['_tc']})"
        )
    p = F.col("n_b").cast("double") / F.lit(float(trow["_tb"]))
    q = F.col("n_c").cast("double") / F.lit(float(trow["_tc"]))

    def lnq(c):
        return F.round(F.log(c) * 1e9).cast("long").cast("double")

    def half_kl(r, m):  # r·ln(r/m), 0 when r = 0 (limit, never NaN)
        return F.when(r > 0, r * (lnq(r / m) / 1e9)).otherwise(F.lit(0.0))

    m = (p + q) / 2
    term = (half_kl(p, m) + half_kl(q, m)) / 2
    out = merged.select(term.cast(ACC_DECIMAL).alias("_t")).agg(
        F.round(F.sum("_t").cast("double"), 6).alias("js_divergence")
    )
    return out.select(
        F.lit(trow["_tb"]).cast("long").alias("n_base"),
        F.lit(trow["_tc"]).cast("long").alias("n_current"),
        "js_divergence",
        F.round(F.sqrt(F.col("js_divergence")), 6).alias("js_distance"),
    )


# Nano-quantized log10(1 + 1/d), d = 1..9 — round(log10(1+1/d)·1e9)/1e9,
# baked as decimal text so the Spark plan and the SQL twin share the
# EXACT constants (no runtime libm anywhere).
BENFORD_EXPECTED = (
    0.301029996,
    0.176091259,
    0.124938737,
    0.096910013,
    0.079181246,
    0.06694679,
    0.057991947,
    0.051152522,
    0.045757491,
)


def benford_first_digit(
    df: DataFrame, value_col: str
) -> DataFrame:
    """Benford first-digit conformance audit of one positive numeric
    column — the classic fabricated-or-truncated-data tripwire
    (Benford 1938, Nigrini 2012): natural multi-scale magnitudes put
    digit d first with probability log₁₀(1 + 1/d); synthetic caps,
    copy-paste rows, or unit bugs bend the curve. One 9-row card per
    audit: observed vs expected share per leading digit plus the
    Pearson χ² over the whole fit, the number a dq dashboard trends.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Determinism contract: the leading digit is the first [1-9] match
    in the DECIMAL(38,18) rendering of the value — scale-invariant
    (0.0019, 1.9 and 19000 all read digit 1), and deterministic
    because both engines render a decimal's digits in order (plain or
    scientific, the mantissa leads with the first significant digit)
    and both round the same exact binary value at scale 18, far below
    any first digit in the supported domain. The r11 cents heuristic
    (first char of round(v·100)) mis-assigned every value whose cents
    rounding crossed a power of ten (0.999 → cents 100 → digit 1, true
    9) and silently dropped (0, 0.005) — this rendering has neither
    failure mode ABOVE the safe floor. Domain (r12 ADVICE, carry
    audit): the digit contract holds for positive values in
    [1e-14, 1e20). Below that floor the scale-18 rounding can itself
    cross a power of ten: a double within half a scale-18 ulp under a
    power of ten (e.g. 9.99951e-15) rounds UP and reads digit 1, true
    9, and every value in [5e-19, 1e-18) rounds to exactly 1e-18 and
    silently reads digit 1 — at or above 1e-14 no double sits inside
    that carry window, so the first rendered [1-9] is always the true
    first significant digit. Values < 5e-19 render as all zeros and
    values ≥ 1e20 have no DECIMAL(38,18) representation — both RAISE
    loudly with a count (infinity included) instead of silently
    skewing the shares. Sub-floor values in [5e-19, 1e-14) are
    accepted ENGINE-CONSISTENTLY (Spark and DuckDB round the same
    exact binary value, so the twin plans agree even where the digit
    is wrong) but sit outside the audit contract — rescale such
    columns before auditing.
    Expected shares are
    nano-quantized log₁₀(1+1/d) literals BAKED into both plans as the
    same decimal text (mathematical constants, like π — baking them
    removes even the libm-last-ulp dependency a runtime ``math.log10``
    would reintroduce). Observed shares and χ² terms
    are fixed-order double expressions over exact integers; the χ²
    sum runs through the decimal accumulator. All 9 digits always
    appear (zero-observation digits via the spine join).

    Scale shape: one narrow map + ONE map-side-combined 9-group
    aggregate; everything after runs on a checkpointed 9-row table
    (the total collects from it — 9 rows, not data — and an empty
    audit raises instead of returning a NULL card). Returns
    (digit, n_obs, obs_share, exp_share, abs_dev, chi2) — chi2 is the
    audit-level statistic, repeated per row like the LPA modularity.
    """
    v = F.col(value_col).cast("double")
    # First significant digit, scale-invariantly: render the value as
    # DECIMAL(38,18) and take the first [1-9]. try_cast NULLs values
    # >= 1e20 (and infinity); values < 5e-19 round to all zeros at
    # scale 18 and nullif the empty match — both land in the NULL
    # sentinel group, which is bounded-counted below and raises.
    # Contract floor 1e-14 (see docstring): below it the scale-18
    # rounding can carry across a power of ten and mis-read the digit
    # (engine-consistently — both twins agree on the rendered text).
    sig = F.nullif(
        F.regexp_extract(
            F.expr("CAST(try_cast(_v AS DECIMAL(38,18)) AS STRING)"),
            "[1-9]",
            0,
        ),
        F.lit(""),
    ).cast("int")
    grouped = (
        df.filter(v.isNotNull() & ~F.isnan(v) & (v > 0))
        .select(v.alias("_v"))
        .select(sig.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
        .localCheckpoint(eager=True)  # bounded: <= 10 digit groups
    )
    bad = (
        grouped.filter(F.col("digit").isNull())
        .agg(F.coalesce(F.sum("n_obs"), F.lit(0)).alias("b"))
        .collect()[0]["b"]
    )
    if bad:
        raise ValueError(
            f"benford_first_digit: {bad} positive values outside the "
            "representable domain [1e-15, 1e20) (or infinite) — refusing "
            "to silently drop them from the digit shares"
        )
    digits = grouped.filter(F.col("digit").isNotNull())
    spine = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    exp_share = F.element_at(
        F.array(*[F.lit(e) for e in BENFORD_EXPECTED]), F.col("digit")
    )
    full = (
        df.sparkSession.range(1)
        .select(spine)
        .join(digits, "digit", "left")
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            exp_share.alias("_e"),
        )
    )
    full = full.localCheckpoint(eager=True)  # bounded: exactly 9 rows
    total = full.agg(F.sum("n_obs").cast("long").alias("t")).collect()[0]["t"]
    if total == 0:
        raise ValueError(
            "benford_first_digit: no positive values to audit "
            "(loud-failure convention — a silent NULL card hides the bug)"
        )
    j = full.withColumn("t", F.lit(total).cast("long"))
    n_d = F.col("n_obs").cast("double")
    t = F.col("t").cast("double")
    e = F.col("_e")
    obs = n_d / t
    chi_term = ((n_d - t * e) * (n_d - t * e) / (t * e)).cast(ACC_DECIMAL)
    chi2 = j.select(chi_term.alias("_c")).agg(
        F.round(F.sum("_c").cast("double"), 6).alias("chi2")
    )
    return (
        j.crossJoin(F.broadcast(chi2))
        .select(
            "digit",
            "n_obs",
            F.round(obs, 6).alias("obs_share"),
            F.round(e, 6).alias("exp_share"),
            F.round(F.abs(obs - e), 6).alias("abs_dev"),
            "chi2",
        )
        .orderBy("digit")
    )


def chi2_categorical(
    base: DataFrame, current: DataFrame, cat_col: str
) -> DataFrame:
    """Chi-square HOMOGENEITY test between two snapshots of one
    CATEGORICAL column — the drift-kit leg PSI/KS/JS (numeric bins)
    don't cover: did the event-type / language / source MIX shift?
    Standard two-sample contingency chi²: expected cell =
    row_total·side_total/grand_total; the per-category contribution
    shows WHICH category moved, the audit-level χ² (df = k−1) is the
    number a monitor thresholds.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: observed counts are exact longs; expected cells and
    χ² terms are a fixed-order double tree over exact integers,
    accumulated through the exact decimal summator, 6-dp rounded.
    NULL categories are EXCLUDED on both sides (the ks_two_sample
    NULL-exclusion contract — a NULL category is a parse failure for
    dq, not a category); an empty side raises. Categories absent from
    one side still contribute (zero-filled via the full outer merge).

    Scale shape: one map-side-combined groupBy per side, merged by an
    outer join on the category-DOMAIN-sized key space — everything
    after the two leaf aggregates runs on the checkpointed bounded
    table. Returns one row per category:
    (category, n_base, n_current, chi2_contrib, chi2, dof), chi2/dof
    repeated per row like the LPA modularity.
    """

    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(cat_col).alias("category"))
            .filter(F.col("category").isNotNull())
            .groupBy("category")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    merged = (
        side(base, "n_base")
        .join(side(current, "n_current"), "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_current", F.lit(0)).cast("long").alias("n_current"),
        )
        .localCheckpoint(eager=True)  # bounded: category domain
    )
    trow = merged.agg(
        F.coalesce(F.sum("n_base"), F.lit(0)).cast("long").alias("_tb"),
        F.coalesce(F.sum("n_current"), F.lit(0)).cast("long").alias("_tc"),
        F.count(F.lit(1)).cast("long").alias("_k"),
    ).collect()[0]
    if trow["_tb"] == 0 or trow["_tc"] == 0:
        raise ValueError(
            "chi2_categorical: empty side after NULL exclusion "
            f"(n_base={trow['_tb']}, n_current={trow['_tc']})"
        )
    grand = float(trow["_tb"] + trow["_tc"])
    row_tot = (F.col("n_base") + F.col("n_current")).cast("double")
    e_b = row_tot * F.lit(float(trow["_tb"])) / F.lit(grand)
    e_c = row_tot * F.lit(float(trow["_tc"])) / F.lit(grand)
    o_b = F.col("n_base").cast("double")
    o_c = F.col("n_current").cast("double")
    contrib = (o_b - e_b) * (o_b - e_b) / e_b + (o_c - e_c) * (
        o_c - e_c
    ) / e_c
    terms = merged.withColumn("_contrib", contrib)
    chi2 = terms.select(
        F.col("_contrib").cast("decimal(30,10)").alias("_t")
    ).agg(F.round(F.sum("_t").cast("double"), 6).alias("chi2"))
    return (
        terms.crossJoin(F.broadcast(chi2))
        .select(
            "category",
            "n_base",
            "n_current",
            F.round(F.col("_contrib"), 6).alias("chi2_contrib"),
            "chi2",
            F.lit(int(trow["_k"]) - 1).cast("long").alias("dof"),
        )
        .orderBy("category")
    )


def daily_autocorr_lag1(
    df: DataFrame, value_col: str, ts_col: str = "ts", lag_days: int = 1
) -> DataFrame:
    """Lag-1 Pearson autocorrelation of the DAILY-MEAN series of one
    numeric column — the time-structure probe the drift kit's
    between-snapshot tests (PSI/KS/JS/χ²) and level-shift detector
    (CUSUM) both miss: r₁ ≈ 0 says days are independent (healthy
    event flow), r₁ → 1 says strong day-over-day momentum (backfill
    waves, quota ramps), r₁ < 0 says alternation (retry storms,
    batch-everything-on-even-days). The first number a
    forecasting/anomaly layer checks before trusting a daily model.

    Registered round 12 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: daily means are MICRO-QUANTIZED integer
    sums over exact day counts — per row floor(v·1e6 + 0.5), an
    IEEE-exact expression with no libm, rendering, or rounding-mode
    dependence (unlike round(double), whose half-way behavior routes
    through decimal rendering on the JVM and raw-double rounding in
    C engines), summed as longs on the codegen fast path (the
    adamic-adar lesson: decimal(30,10) accumulation over a
    corpus-sized stream measured 2.3x slower than long sums).
    Headroom: |v| ≤ 1e6 at 9.2e12 rows/day before long overflow —
    document a larger quantum for wider-magnitude columns. Pairs are
    TRUE CALENDAR lag-1 — daily self-joined on d+1 day — so calendar
    gaps DROP the spanning pair instead of silently correlating
    non-adjacent days (r11 ADVICE: lead() over observed days measured
    an observed-sequence autocorrelation, not a calendar lag-1). The
    Pearson moments (Σa, Σb, Σab, Σa², Σb²) accumulate identical
    doubles through the decimal summator over the BOUNDED days table
    (bounded decimal sums are free — only corpus-sized ones are the
    slow path); the final r is a fixed-order double tree, 6-dp
    rounded. NULL/NaN values are excluded; fewer than 2 pairs raises
    — a correlation of one pair is ±1 by construction and would read
    as extreme drift.

    Scale shape: one narrow map + ONE map-side-combined daily groupBy;
    everything after runs on the checkpointed days table (the d+1
    self-join is days × days key-matched — calendar-bounded). Returns
    one row: (n_days, n_pairs, autocorr_lag1).

    ``lag_days`` generalizes the lag (default 1 — the registered
    drift_daily_autocorr contract, plan-identical to the r12 lock):
    lag_days=7 measures WEEK-over-week persistence, the STRENGTH
    companion to ``dow_seasonality_anova``'s existence test for the
    weekly cycle (staged r13 as ``drift_weekly_autocorr``). Pairs are
    calendar-exact at any lag: (d, d+lag_days) must both be observed.
    """
    if lag_days < 1:
        raise ValueError("daily_autocorr_lag1: lag_days must be >= 1")
    v = F.col(value_col).cast("double")
    daily = (
        df.select(F.to_date(F.col(ts_col)).alias("d"), v.alias("_v"))
        .filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(
                F.floor(F.col("_v") * F.lit(1e6) + F.lit(0.5)).cast("long")
            ).alias("_s"),
        )
        .select(
            "d",
            (
                F.col("_s").cast("double")
                / F.lit(1e6)
                / F.col("_n").cast("double")
            ).alias("x"),
        )
        .localCheckpoint(eager=True)  # bounded: calendar days
    )
    n_days = daily.count()
    pairs = (
        daily.select(F.col("d").alias("_da"), F.col("x").alias("x"))
        .join(
            daily.select(F.col("d").alias("_db"), F.col("x").alias("y")),
            F.date_add(F.col("_da"), lag_days) == F.col("_db"),
        )
        .select("x", "y")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(ACC_DECIMAL)).alias("sa"),
        F.sum(F.col("y").cast(ACC_DECIMAL)).alias("sb"),
        F.sum((F.col("x") * F.col("y")).cast(ACC_DECIMAL)).alias("sab"),
        F.sum((F.col("x") * F.col("x")).cast(ACC_DECIMAL)).alias("saa"),
        F.sum((F.col("y") * F.col("y")).cast(ACC_DECIMAL)).alias("sbb"),
    ).localCheckpoint(eager=True)  # 1 row; guard + result share it
    g = mom.collect()[0]
    if g["n"] < 2:
        raise ValueError(
            f"daily_autocorr_lag1: need >= 2 consecutive-calendar "
            f"lag-{lag_days} "
            f"pairs, got {g['n']} (n_days={n_days}) — a single-pair "
            "correlation is ±1 by construction"
        )
    da = float(g["n"]) * float(g["saa"]) - float(g["sa"]) * float(g["sa"])
    db = float(g["n"]) * float(g["sbb"]) - float(g["sb"]) * float(g["sb"])
    if da <= 0.0 or db <= 0.0:
        raise ValueError(
            "daily_autocorr_lag1: a constant daily series has no "
            "defined autocorrelation (zero variance on one side)"
        )
    n = F.col("n").cast("double")
    sa = F.col("sa").cast("double")
    sb = F.col("sb").cast("double")
    sab = F.col("sab").cast("double")
    saa = F.col("saa").cast("double")
    sbb = F.col("sbb").cast("double")
    r = (n * sab - sa * sb) / F.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    return mom.select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round(r, 6).alias("autocorr_lag1"),
    )


def dow_seasonality_anova(
    df: DataFrame, value_col: str, ts_col: str = "ts"
) -> DataFrame:
    """DAY-OF-WEEK seasonality audit of the daily-mean series: one-way
    ANOVA of the daily means grouped by ISO weekday — F large means
    the weekday explains the daily level (weekend dips, Monday
    backfill spikes), the calendar-period structure the drift kit's
    other time legs miss (CUSUM finds one level SHIFT,
    daily_autocorr_lag1 finds momentum; this finds the weekly cycle).
    A drift monitor that ignores a real weekly cycle false-alarms
    every weekend; one that knows it can deseasonalize first.

    Registered round 13 (staged r12; oracle value-locked at both
    scales in tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: daily means are the MICRO-QUANTIZED long
    sums over exact day counts shared with ``daily_autocorr_lag1``
    (floor(v·1e6 + 0.5) — IEEE-exact, no corpus-sized decimal
    accumulation); weekdays are ISO (1 = Monday … 7 = Sunday —
    Spark ``weekday()+1`` ≡ DuckDB ``isodow``); the per-weekday
    moments (n, Σx, Σx²) and the final cross-group reductions
    accumulate through the decimal summator over the BOUNDED
    days/weekday tables; F is a fixed-order double tree
    (SSB/(k−1))/(SSW/(N−k)), 6-dp rounded. NULL/NaN excluded; fewer
    than 2 distinct weekdays, N ≤ k (no within degrees of freedom),
    or an exactly-zero SSW (constant within every weekday —
    F undefined) raise loudly.

    Scale shape: one narrow map + ONE map-side-combined daily groupBy
    (the only corpus-sized stage); everything after runs on the
    checkpointed ≤366-row days table. Returns one row per observed
    weekday: (isodow, n_days, mean_daily, f_stat, df_between,
    df_within) — f/dfs are the audit-level numbers repeated per row
    (the LPA-modularity convention), weekday-ordered.
    """
    v = F.col(value_col).cast("double")
    daily = (
        df.select(F.to_date(F.col(ts_col)).alias("d"), v.alias("_v"))
        .filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(
                F.floor(F.col("_v") * F.lit(1e6) + F.lit(0.5)).cast("long")
            ).alias("_s"),
        )
        .select(
            (F.weekday("d") + F.lit(1)).cast("int").alias("isodow"),
            (
                F.col("_s").cast("double")
                / F.lit(1e6)
                / F.col("_n").cast("double")
            ).alias("x"),
        )
        .localCheckpoint(eager=True)  # bounded: calendar days
    )
    groups = (
        daily.groupBy("isodow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.col("x").cast(ACC_DECIMAL)).alias("_sx"),
            F.sum((F.col("x") * F.col("x")).cast(ACC_DECIMAL)).alias("_sxx"),
        )
        .localCheckpoint(eager=True)  # bounded: <= 7 rows
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    terms = groups.select(
        "n_days",
        F.col("_sx"),
        # clamp the per-group within-term at zero (r12 ADVICE): the
        # double-precision sxx − sx²/n can land a tiny NEGATIVE for a
        # (near-)constant weekday group, spuriously pushing SSW ≤ 0
        # (false "zero within-weekday variance" raise) or deflating F
        # — the sqrt(max(var, 0)) −ulp clamp idiom, applied here; the
        # oracle applies the identical greatest(·, 0)
        F.greatest(sxx - sx * sx / nd, F.lit(0.0))
        .cast(ACC_DECIMAL)
        .alias("_w"),
        ((sx * sx / nd)).cast(ACC_DECIMAL).alias("_b"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.coalesce(F.sum("n_days"), F.lit(0)).cast("long").alias("n"),
        F.sum(F.col("_sx")).alias("sx_all"),
        F.sum("_w").alias("ssw"),
        F.sum("_b").alias("ssb_raw"),
    ).localCheckpoint(eager=True)  # 1 row; guard + result share it
    g = tot.collect()[0]
    k, n = int(g["k"]), int(g["n"])
    if k < 2:
        raise ValueError(
            f"dow_seasonality_anova: need >= 2 observed weekdays, got {k}"
        )
    if n <= k:
        raise ValueError(
            f"dow_seasonality_anova: {n} days over {k} weekdays leaves no "
            "within-group degrees of freedom"
        )
    ssw = float(g["ssw"])
    if ssw <= 0.0:
        raise ValueError(
            "dow_seasonality_anova: zero within-weekday variance — every "
            "weekday's daily means are constant, F is undefined"
        )
    kk = F.col("k").cast("double")
    nn = F.col("n").cast("double")
    ssb = F.col("ssb_raw").cast("double") - (
        F.col("sx_all").cast("double") * F.col("sx_all").cast("double") / nn
    )
    fstat = tot.select(
        F.round(
            (ssb / (kk - F.lit(1.0)))
            / (F.col("ssw").cast("double") / (nn - kk)),
            6,
        ).alias("f_stat"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n") - F.col("k")).cast("long").alias("df_within"),
    )
    return (
        groups.crossJoin(F.broadcast(fstat))
        .select(
            "isodow",
            "n_days",
            F.round(
                F.col("_sx").cast("double") / F.col("n_days").cast("double"),
                6,
            ).alias("mean_daily"),
            "f_stat",
            "df_between",
            "df_within",
        )
        .orderBy("isodow")
    )


def daily_volume_mad_anomalies(
    df: DataFrame, ts_col: str = "ts", threshold: float = 3.5
) -> DataFrame:
    """Daily INGEST-VOLUME anomaly card via the modified z-score
    (Iglewicz & Hoaglin 1993: M = 0.6745·(x − median)/MAD) — the
    robust are-we-missing-a-partition / did-a-producer-double-fire
    tripwire an ops review reads FIRST, before any value-level drift
    test: volume anomalies are upstream failures, and both the mean
    and σ are exactly the statistics a lost day corrupts (the reason
    the estimator is median/MAD, which one bad day cannot move).

    Registered round 13 (staged r12; oracle value-locked at both
    scales in tests/test_staged_oracles.py BEFORE registration).

    Determinism: daily counts are exact longs; median and MAD use the
    SQL-standard interpolated quantile (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: lo + (hi − lo)·0.5 — exact .5/.25 steps on
    integer counts, no libm); the modified z is a fixed-order double
    tree, 6-dp rounded. The card returns EVERY day with its score and
    an ``is_anomaly`` flag (|M| > threshold) rather than anomalies
    only — an empty anomaly set and a missing day are different
    facts, and the calendar-bounded card costs nothing. A zero MAD
    (half the days share one exact count) raises — the modified
    z-score is undefined and a constant-volume corpus needs the exact
    uniqueness audit, not a robust outlier test.

    Scale shape: one narrow map + ONE map-side-combined daily groupBy
    (the only corpus-sized stage); the quantiles and the card run on
    the checkpointed ≤366-row days table. Returns one row per day:
    (d, n_events, med, mad, mod_z, is_anomaly), ordered by day.
    """
    daily = (
        df.select(F.to_date(F.col(ts_col)).alias("d"))
        .filter(F.col("d").isNotNull())
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .localCheckpoint(eager=True)  # bounded: calendar days
    )
    med_row = daily.agg(
        F.expr("percentile(n_events, 0.5)").alias("med")
    ).collect()[0]
    if med_row["med"] is None:
        raise ValueError("daily_volume_mad_anomalies: no days to audit")
    med = float(med_row["med"])
    mad = float(
        daily.agg(
            F.expr(f"percentile(abs(n_events - {med!r}D), 0.5)").alias("m")
        ).collect()[0]["m"]
    )
    if mad == 0.0:
        raise ValueError(
            "daily_volume_mad_anomalies: MAD is zero (half the days share "
            "one exact count) — the modified z-score is undefined"
        )
    mz = (
        F.lit(0.6745)
        * (F.col("n_events").cast("double") - F.lit(med))
        / F.lit(mad)
    )
    return daily.select(
        "d",
        "n_events",
        F.lit(med).alias("med"),
        F.lit(mad).alias("mad"),
        F.round(mz, 6).alias("mod_z"),
        (F.abs(mz) > F.lit(threshold)).alias("is_anomaly"),
    ).orderBy("d")


def page_hinkley_daily(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    delta: float = 0.005,
    lambda_: float = 0.05,
) -> DataFrame:
    """PAGE–HINKLEY level-shift detector over the daily-mean series
    (Page 1954; Hinkley 1971; the streaming-drift formulation of
    Gama et al. 2014): m_t = Σ_{i≤t} (x_i − x̄_{1..i} − δ) with alarm
    when m_t − min_{s≤t} m_s > λ. The drift kit's SELF-REFERENCING
    change detector: CUSUM tests against a PINNED target level (you
    must know the in-control mean), PH tests each day against the
    RUNNING mean of everything seen so far — the right tripwire when
    no baseline period was ever blessed. Complements the existing
    legs: CUSUM (known-target shift), autocorrelation (momentum),
    DOW ANOVA (weekly cycle), MAD card (volume, not value).

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: daily means are the shared micro-quantized
    long sums (floor(v·1e6 + 0.5) over exact day counts); each day's
    deviation term x_i − x̄_i − δ is ONE fixed-order double tree over
    exact integers, then NANO-QUANTIZED to a long
    (round(term·1e9) — the drift-kit transcendental contract applied
    to the one engine-sensitive double per row), so the running sum
    m_t and running min are PURE LONG prefix arithmetic — exact,
    order-free, bit-identical cross-engine. The report divides back
    to 6-dp doubles. NULL/NaN values excluded; an empty day table
    raises.

    Scale shape: one narrow map + ONE map-side-combined daily groupBy
    (the only corpus-sized stage); the sequential-looking recurrences
    are two frame windows (running sum, running min) over the
    checkpointed ≤366-row days table — the bounded-window class, same
    as CUSUM's closed form. Returns one row per observed day:
    (d, mean_daily, m_t, ph_stat, is_alarm), day-ordered.
    """
    v = F.col(value_col).cast("double")
    daily = (
        df.select(F.to_date(F.col(ts_col)).alias("d"), v.alias("_v"))
        .filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(
                F.floor(F.col("_v") * F.lit(1e6) + F.lit(0.5)).cast("long")
            ).alias("_s"),
        )
        .localCheckpoint(eager=True)  # bounded: calendar days
    )
    if daily.isEmpty():
        raise ValueError("page_hinkley_daily: no days to monitor")
    w_seq = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    x = F.col("_s").cast("double") / F.lit(1e6) / F.col("_n").cast("double")
    # running mean of the DAILY MEANS: prefix sums of exact longs
    run_mean = (
        F.sum("_s").over(w_seq).cast("double")
        / F.lit(1e6)
        / F.sum("_n").over(w_seq).cast("double")
    )
    term_q = F.round((x - run_mean - F.lit(float(delta))) * F.lit(1e9)).cast(
        "long"
    )
    with_m = daily.select(
        "d", x.alias("_x"), term_q.alias("_tq")
    ).select(
        "d",
        "_x",
        F.sum("_tq").over(w_seq).alias("_m"),
    )
    ph = F.col("_m") - F.least(F.min("_m").over(w_seq), F.lit(0).cast("long"))
    # min over s <= t INCLUDES m_t itself (ph >= 0 always); the lit(0)
    # floor matches the textbook m_0 = 0 empty-prefix restart
    return with_m.select(
        "d",
        F.round(F.col("_x"), 6).alias("mean_daily"),
        F.round(F.col("_m").cast("double") / F.lit(1e9), 6).alias("m_t"),
        F.round(ph.cast("double") / F.lit(1e9), 6).alias("ph_stat"),
        (ph.cast("double") / F.lit(1e9) > F.lit(float(lambda_))).alias(
            "is_alarm"
        ),
    ).orderBy("d")


def cusum_changepoints_twosided(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """TWO-SIDED CUSUM: the registered upward detector
    (``cusum_changepoints``) catches level INCREASES only — a metric
    that silently halves (a producer dying is the common failure) is
    invisible to it. This runs the upward and downward one-sided
    recurrences simultaneously: S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − target −
    slack)) and S⁻ᵢ = max(0, S⁻ᵢ₋₁ + (target − xᵢ − slack)), each via
    the same prefix-sum/running-min closed form (S = P − min(0,
    min_{j≤i} P_j)), and reports alarms from EITHER side with a
    ``side`` column.

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: identical to the one-sided operator — exact decimal
    prefix accumulation for both deviation series (the downward series
    is the exact decimal negation, so no new rounding surface), alarm
    positions bit-identical cross-engine under the same quantized-
    input caveat. BOTH sides come out of ONE shuffle/sort on
    (group, order): the two prefix sums and two running mins are four
    frame aggregates over the same window, and the per-row side
    emission is a codegen array filter+explode — no union, no second
    scan, no driver loop.

    Returns alarm rows only: (group, order, value, side, cusum) where
    the side's statistic exceeds ``threshold`` — a row can emit both
    sides only in the degenerate threshold ≤ 0 case.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x_dec = F.col(value_col).cast(ACC_DECIMAL)
    t_dec = F.lit(target).cast(ACC_DECIMAL)
    s_dec = F.lit(slack).cast(ACC_DECIMAL)
    dev_up = (x_dec - t_dec) - s_dec
    dev_dn = (t_dec - x_dec) - s_dec
    p_up = F.sum(dev_up).over(w)
    p_dn = F.sum(dev_dn).over(w)
    zero = F.lit(0).cast(ACC_DECIMAL)

    with_s = df.select(
        F.col(group_col).alias("grp"),
        F.col(order_col).alias("ord"),
        F.col(value_col).alias("value"),
        p_up.alias("_pu"),
        p_dn.alias("_pd"),
    ).select(
        "grp",
        "ord",
        "value",
        (F.col("_pu") - F.least(zero, F.min("_pu").over(
            Window.partitionBy("grp").orderBy("ord").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ))).cast("double").alias("_su"),
        (F.col("_pd") - F.least(zero, F.min("_pd").over(
            Window.partitionBy("grp").orderBy("ord").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ))).cast("double").alias("_sd"),
    )
    sides = F.array(
        F.struct(F.lit("up").alias("side"), F.col("_su").alias("cusum")),
        F.struct(F.lit("down").alias("side"), F.col("_sd").alias("cusum")),
    )
    hits = F.filter(sides, lambda s: s["cusum"] > F.lit(float(threshold)))
    return (
        with_s.select(
            "grp", "ord", "value", F.explode(hits).alias("_h")
        )
        .select(
            "grp",
            "ord",
            "value",
            F.col("_h.side").alias("side"),
            F.col("_h.cusum").alias("cusum"),
        )
    )


def hourly_seasonality(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """HOUR-OF-DAY seasonality card: the 24-bucket event-count
    histogram over the full hour spine (empty hours count — a feed
    that goes dark for 6 hours a day should say so) with the χ²
    uniformity statistic, the peak hour, and the peak share riding
    every row. The DAILY-cycle companion to drift_dow_anova's weekly
    cycle: a drift monitor that alerts on raw hourly volume without
    this card false-alarms every midnight, and a χ² far above the
    df=23 scale says hourly baselines are mandatory.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: hour extraction is calendar arithmetic on the UTC
    session timezone (both engines agree on parquet TIMESTAMP_NTZ);
    counts are exact longs; χ² = Σ_h (24·O_h − C)² / (24·C) keeps the
    numerator in EXACT decimal(38,0) over the 24-row table ((24·O−C)²
    reaches ~5.8e28 at a 10^13-row corpus — far past 2⁶³) and divides
    once in double; peak share is a single double division; the peak
    hour breaks count ties on the SMALLEST hour (md5-free: the domain
    is already totally ordered). 6-dp rounding on the doubles. An
    empty (or all-null-ts) feed emits the full 24-row spine with NULL
    share/chi2/peak_share instead of an ANSI DIVIDE_BY_ZERO — the
    repo's degenerate-card convention (r14 ADVICE item 1).

    Scale shape: ONE map-side-combined groupBy collapses the corpus
    to ≤24 occupied hours, outer-joined onto the literal 0..23 spine
    (localCheckpointed — bounded); χ², peak, and total ride that
    bounded table as a 1-row broadcast audit. Returns 24 rows:
    (hour, n_events, share, chi2_uniform, df, peak_hour, peak_share),
    hour-ordered.
    """
    occupied = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.hour(ts_col).cast("long").alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    spine = (
        events.sparkSession.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(23))).alias("_h"))
        .select(F.col("_h").cast("long").alias("hour"))
    )
    hist = (
        spine.join(occupied, "hour", "left")
        .select(
            "hour",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        )
        .localCheckpoint(eager=True)  # bounded: 24 rows
    )
    dev = (
        F.lit(24).cast("decimal(38,0)")
        * F.col("n_events").cast("decimal(38,0)")
        - F.col("_c").cast("decimal(38,0)")
    )
    tot = hist.agg(F.sum("n_events").cast("long").alias("_c"))
    # peak hour straight off the bounded table: count DESC, hour ASC
    peak = (
        hist.orderBy(F.desc("n_events"), F.asc("hour"))
        .limit(1)
        .select(
            F.col("hour").alias("peak_hour"),
            F.col("n_events").alias("_peak_n"),
        )
    )
    chi = (
        hist.crossJoin(F.broadcast(tot))
        .agg(
            F.first("_c").cast("long").alias("_c"),
            F.sum((dev * dev).cast("decimal(38,0)")).alias("_ssq"),
        )
        .crossJoin(F.broadcast(peak))
        .select(
            "_c",
            # empty / all-null-ts feed: NULL statistics instead of an
            # ANSI DIVIDE_BY_ZERO — the degenerate contract ("a feed
            # that goes dark should say so"), char_class precedent
            F.when(
                F.col("_c") > 0,
                F.round(
                    F.col("_ssq").cast("double")
                    / (F.lit(24.0) * F.col("_c").cast("double")),
                    6,
                ),
            ).alias("chi2_uniform"),
            F.lit(23).cast("long").alias("df"),
            "peak_hour",
            F.when(
                F.col("_c") > 0,
                F.round(
                    F.col("_peak_n").cast("double")
                    / F.col("_c").cast("double"),
                    6,
                ),
            ).alias("peak_share"),
        )
    )
    return (
        hist.crossJoin(F.broadcast(chi))
        .select(
            "hour",
            "n_events",
            F.when(
                F.col("_c") > 0,
                F.round(
                    F.col("n_events").cast("double")
                    / F.col("_c").cast("double"),
                    6,
                ),
            ).alias("share"),
            "chi2_uniform",
            "df",
            "peak_hour",
            "peak_share",
        )
        .orderBy("hour")
    )


def value_moments(
    df: DataFrame, value_col: str, quantum: float = 100.0
) -> DataFrame:
    """Exact MOMENT card for a numeric column: n, mean, standard
    deviation, skewness g₁ = m₃/m₂^1.5, and excess kurtosis
    g₂ = m₄/m₂² − 3, computed from exact integer power sums of the
    QUANTIZED values (round(v·quantum) as long). The distribution-
    SHAPE leg of the drift kit: PSI/KS say the distribution MOVED,
    the Benford/χ² legs test specific laws — this says what the shape
    IS (heavy right tail ⇒ mean-based alarms lag; kurtosis spikes ⇒
    a fat-finger subpopulation arrived), and shape deltas across
    snapshots are the cheapest drift fingerprint to store.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism & the quantization CONTRACT: moments are computed ON
    the centi-quantized values (quantum=100: exactly the KS/Benford
    centi-precision convention) — Σx, Σx², Σx³, Σx⁴ are EXACT
    decimal(38,0) sums of long powers, so the card is bit-identical
    cross-engine and rerun-stable at any partitioning. Σx⁴ bounds the
    contract: |v| ≤ 10⁴ at quantum 100 keeps the fourth power ≤ 10²⁴
    per row and the sum inside decimal(38) to 10¹³ rows; wider-ranged
    columns LOWER the quantum (the documented dial — same audit class
    as the Gini rank-block term). Central moments assemble from the
    raw sums in ONE fixed-order double tree (mᵢ from Σxʲ/n and mean
    powers), 6-dp rounded; the skew/kurtosis of the quantized series
    differs from the unquantized one by O(1/(quantum·σ)) — negligible
    at σ ≫ 0.01 and documented, never silent.

    Scale shape: ONE map-side-combined aggregate over a narrow
    projection; the output is a 1-row card. Returns (n_rows, mean,
    std, skewness, kurtosis_excess).
    """
    v = F.col(value_col).cast("double")
    # floor(v·q + 0.5), not round(): the repo's quantization idiom —
    # floor is exact on every engine, round() half-cases differ for
    # negatives between HALF_UP and away-from-zero implementations
    xq = F.floor(v * F.lit(float(quantum)) + F.lit(0.5)).cast("long")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    sums = df.filter(v.isNotNull() & ~F.isnan(v)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(xq)).alias("s1"),
        F.sum(d(xq * xq)).alias("s2"),
        F.sum((d(xq * xq) * d(xq)).cast("decimal(38,0)")).alias("s3"),
        F.sum((d(xq * xq) * d(xq * xq)).cast("decimal(38,0)")).alias("s4"),
    )
    q = F.lit(float(quantum))
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double") / q
    s2 = F.col("s2").cast("double") / (q * q)
    s3 = F.col("s3").cast("double") / (q * q * q)
    s4 = F.col("s4").cast("double") / (q * q * q * q)
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m
    m4 = (
        s4 / n
        - F.lit(4.0) * m * (s3 / n)
        + F.lit(6.0) * m * m * (s2 / n)
        - F.lit(3.0) * m * m * m * m
    )
    m2p = F.greatest(m2, F.lit(0.0))
    # degenerate (constant) columns have m2 = 0: emit NULL for the
    # shape moments rather than an engine-dependent 0/0 (Spark double
    # division yields NaN, DuckDB yields NULL — NULL is the portable
    # "undefined", the Freeman-centralization precedent)
    return sums.select(
        F.col("n").alias("n_rows"),
        F.round(m, 6).alias("mean"),
        F.round(F.sqrt(m2p), 6).alias("std"),
        # m₂^1.5 spelled m₂·√m₂: sqrt is IEEE correctly-rounded on
        # every engine, pow(x, 1.5) is not (libm-dependent)
        F.when(
            m2p > 0, F.round(m3 / (m2p * F.sqrt(m2p)), 6)
        ).alias("skewness"),
        F.when(
            m2p > 0, F.round(m4 / (m2p * m2p) - F.lit(3.0), 6)
        ).alias("kurtosis_excess"),
    )


def rolling_zscore_daily(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window_days: int = 7,
    z_thresh: float = 3.0,
) -> DataFrame:
    """TRAILING-WINDOW z-score anomaly card for the daily-mean series:
    each day scored against the mean/std of the PRECEDING
    ``window_days`` days (current day excluded — a same-day baseline
    would dilute the very anomaly being tested). The LOCAL-anomaly
    leg of the drift kit: CUSUM/Page-Hinkley accumulate persistent
    level shifts, the MAD card flags volume outliers globally — this
    flags single anomalous days against their own recent regime, the
    on-call "is today weird" number.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: daily means come from the micro-quantized long sums
    (the shared Page-Hinkley/autocorr daily CTE) and are re-quantized
    to exact micro longs mq = floor(s/n + 0.5), computed as the
    INTEGER floor division (2s + n − pmod(2s + n, 2n)) / 2n entirely
    in decimal(38,0) — no double round-trip, so the half-rounding is
    exact even once a day's micro-sum passes 2⁵³ (the r14 VERDICT
    item-2 seam; the degree-Gini precedent), and pmod keeps true
    floor semantics for negative daily sums. The window moments are
    INTEGER window sums (Σmq, Σmq² through decimal(38,0) — mq²
    overflows 2⁶³ once daily means pass ~10³ at micro scale);
    baseline mean/var/z assemble in one fixed-order double tree
    (sqrt IEEE-rounded), 6-dp. Days with fewer than ``window_days``
    preceding days report NULL z (warm-up, documented); a
    zero-variance baseline also reports NULL z (degenerate contract,
    the value_moments precedent).

    Scale shape: corpus → bounded days table in ONE map-side-combined
    aggregate; every window runs over that bounded table (ordered by
    day — calendar-sized, the Page-Hinkley allowlist class). Returns
    one row per day: (d, mean_daily, baseline_mean, baseline_std, z,
    is_anomaly), day-ordered.
    """
    if window_days < 2:
        raise ValueError("rolling_zscore_daily: window_days must be >= 2")
    v = F.col(value_col).cast("double")
    daily = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(F.to_date(ts_col).alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(v * 1e6 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("s"),
        )
        .localCheckpoint(eager=True)  # bounded: calendar days
    )
    # mq = floor(s/n + 0.5) = floor((2s+n)/(2n)), exact: (2s+n) can
    # overflow a long at the 100-TB posture, so the numerator lives in
    # decimal(38,0); a − pmod(a, b) is exactly divisible by b, so the
    # decimal division is exact and the cast back to long is lossless.
    _a = F.col("s").cast("decimal(38,0)") * F.lit(2) + F.col(
        "n"
    ).cast("decimal(38,0)")
    _b = F.col("n").cast("decimal(38,0)") * F.lit(2)
    mq = ((_a - F.pmod(_a, _b)) / _b).cast("long")
    seq = daily.select("d", mq.alias("mq"))
    w = Window.orderBy("d").rowsBetween(-window_days, -1)
    seq = seq.select(
        "d",
        "mq",
        F.count(F.lit(1)).over(w).cast("long").alias("_k"),
        F.sum(F.col("mq").cast("decimal(38,0)")).over(w).alias("_s1"),
        F.sum(
            (F.col("mq").cast("decimal(38,0)") * F.col("mq").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
        )
        .over(w)
        .alias("_s2"),
    )
    kk = F.col("_k").cast("double")
    bm = F.col("_s1").cast("double") / F.lit(1e6) / kk
    var = F.greatest(
        F.col("_s2").cast("double") / F.lit(1e12) / kk - bm * bm,
        F.lit(0.0),
    )
    x = F.col("mq").cast("double") / F.lit(1e6)
    std = F.sqrt(var)
    full = F.col("_k") == window_days
    z = F.when(full & (std > 0), F.round((x - bm) / std, 6))
    return seq.select(
        "d",
        F.round(x, 6).alias("mean_daily"),
        F.when(full, F.round(bm, 6)).alias("baseline_mean"),
        F.when(full, F.round(std, 6)).alias("baseline_std"),
        z.alias("z"),
        F.when(full & (std > 0), F.abs(z) > F.lit(float(z_thresh))).alias(
            "is_anomaly"
        ),
    ).orderBy("d")


def weekday_hour_heatmap(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """WEEKDAY x HOUR traffic heatmap over the full 7x24 = 168-cell
    spine, with each cell's share, the peak cell, and the Herfindahl
    concentration (x168 the uniform level) riding every row. The
    JOINT-cycle card completing the drift kit's seasonality pair —
    drift_dow_anova tests the weekly cycle, hourly_seasonality the
    daily one; this card is where "Monday 9am" phenomena live that
    neither marginal can see, and the concentration ratio is the one
    number saying how far from flat the week really is (the baseline
    table any volume alert should normalize against).

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: weekday is ISO (1 = Monday ... 7 = Sunday — Spark
    ``weekday()+1`` == DuckDB ``isodow``, the dow_anova convention);
    counts are exact longs; the Herfindahl numerator Σ n_c² stays in
    exact decimal(38,0) over the 168-row table and divides once by
    C² in double; the peak cell breaks count ties on smallest
    (isodow, hour) — the domain's total order. Shares are single
    6-dp divisions; an empty feed emits the full 168-row spine with
    NULL share/peak_share/hhi_x_uniform (the hourly_seasonality
    degenerate contract).

    Scale shape: ONE map-side-combined groupBy collapses the corpus
    to <= 168 occupied cells, outer-joined onto the literal spine
    (localCheckpointed — bounded); concentration, peak, and total
    ride as 1-row broadcast audits. Returns 168 rows: (isodow, hour,
    n_events, share, peak_isodow, peak_hour, peak_share,
    hhi_x_uniform), (isodow, hour)-ordered.
    """
    occupied = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            (F.weekday(ts_col) + F.lit(1)).cast("long").alias("isodow"),
            F.hour(ts_col).cast("long").alias("hour"),
        )
        .groupBy("isodow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    spine = (
        events.sparkSession.range(1)
        .select(
            F.explode(F.sequence(F.lit(1), F.lit(7))).alias("isodow")
        )
        .select(
            F.col("isodow").cast("long").alias("isodow"),
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("_h"),
        )
        .select("isodow", F.col("_h").cast("long").alias("hour"))
    )
    hist = (
        spine.join(occupied, ["isodow", "hour"], "left")
        .select(
            "isodow",
            "hour",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        )
        .localCheckpoint(eager=True)  # bounded: 168 rows
    )
    peak = (
        hist.orderBy(F.desc("n_events"), F.asc("isodow"), F.asc("hour"))
        .limit(1)
        .select(
            F.col("isodow").alias("peak_isodow"),
            F.col("hour").alias("peak_hour"),
            F.col("n_events").alias("_peak_n"),
        )
    )
    tot = hist.agg(
        F.sum("n_events").cast("long").alias("_c"),
        F.sum(
            (
                F.col("n_events").cast("decimal(38,0)")
                * F.col("n_events").cast("decimal(38,0)")
            ).cast("decimal(38,0)")
        ).alias("_ssq"),
    )
    audit = (
        tot.crossJoin(F.broadcast(peak)).select(
            "_c",
            "peak_isodow",
            "peak_hour",
            F.when(
                F.col("_c") > 0,
                F.round(
                    F.col("_peak_n").cast("double")
                    / F.col("_c").cast("double"),
                    6,
                ),
            ).alias("peak_share"),
            # HHI = Σ share² = Σn² / C²; ×168 so uniform reads 1.0
            F.when(
                F.col("_c") > 0,
                F.round(
                    F.col("_ssq").cast("double")
                    * F.lit(168.0)
                    / (
                        F.col("_c").cast("double")
                        * F.col("_c").cast("double")
                    ),
                    6,
                ),
            ).alias("hhi_x_uniform"),
        )
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "isodow",
            "hour",
            "n_events",
            F.when(
                F.col("_c") > 0,
                F.round(
                    F.col("n_events").cast("double")
                    / F.col("_c").cast("double"),
                    6,
                ),
            ).alias("share"),
            "peak_isodow",
            "peak_hour",
            "peak_share",
            "hhi_x_uniform",
        )
        .orderBy("isodow", "hour")
    )
