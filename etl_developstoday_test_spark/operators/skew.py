"""Skew-resilient aggregation: salted two-phase groupBy.

When one group key carries a disproportionate share of rows (hot
PULocationID, celebrity user_id, empty-string key), a plain groupBy
sends that entire key to one reducer. Salting splits each key into
``n_salts`` sub-keys for the first (heavy) aggregation, then combines
the partials in a second (tiny) aggregation — the hot key's work is
spread across ``n_salts`` reducers at the cost of one extra small
shuffle.

Spark's AQE skew handling (``spark.sql.adaptive.skewJoin``) covers skewed
*joins* automatically; aggregation skew still benefits from explicit
salting when partial aggregation can't compress (e.g. high-cardinality
sub-expressions or collect-style aggregates). For plain SUM/COUNT the
map-side combine usually suffices — this helper exists for the cases it
doesn't, and as the documented pattern for 100 TB runs.

Decimal accumulators keep the result bit-identical to the unsalted
aggregation: sums of exact partials equal the exact total regardless of
grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import ACC_DECIMAL


def _row_salt(n_salts: int):
    """Per-ROW salt in [0, n_salts): deterministic for a given plan, and
    varying within every partition.

    ``monotonically_increasing_id`` is (partition_id << 33) + row offset,
    so consecutive rows of the same hot key get different salts even when
    the key's rows all sit in ONE input partition — the exact case
    salting exists for (post-shuffle concentration, single-file scans).
    A partition-id-based salt degenerates there: every row of the
    partition lands on the same reducer.
    """
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key SUM(value) (as double) and COUNT(*) computed via a
    salted two-phase aggregation. Output: keys + sum_value + n_rows."""
    v = F.col(value) if isinstance(value, str) else value
    # the salt must vary WITHIN a key — per row, not per input partition
    salted = df.withColumn("_salt", _row_salt(n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(v.cast(ACC_DECIMAL)).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join: salt the big side into ``n_salts``
    sub-keys and replicate the small side once per salt, so a hot join
    key's rows spread over ``n_salts`` reducers instead of one.

    This is the manual form of AQE's skew-join split — needed when AQE
    can't help: the skew only materializes after upstream operators, the
    join is part of a cached/reused subplan, or the engine runs with AQE
    off. Cost: small side × n_salts (keep it broadcast-small), one
    shuffle of each side on (key, salt). Result set is value-identical
    to the plain join — the salt never leaves the join.
    """
    salted_big = big.withColumn("_salt", _row_salt(n_salts))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    replicated_small = small.select("*", salts)
    return salted_big.join(
        replicated_small,
        (F.col(big_key) == F.col(small_key)) & (salted_big["_salt"] == replicated_small["_salt"]),
    ).drop("_salt")


def topk_key_share(
    df: DataFrame, key_col: str, k: int = 20
) -> DataFrame:
    """Hot-key SKEW PROFILE of a join/group key: the k heaviest keys
    with their row share and cumulative head share — the audit that
    decides whether a 100-TB join needs salting, AQE skew splits, or
    nothing (a top key at 0.1% is noise; at 10% it is one straggler
    task). The measurement companion to ``salted_sum_count`` /
    ``salted_join`` above: those are the cure, this is the diagnosis.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Scale shape: ONE map-side-combined groupBy count, a 1-row total,
    then orderBy+limit — which Spark compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge of k·P
    rows, never a global sort). The cumulative window runs AFTER the
    limit, over exactly k rows (bounded-window allowlist class).
    Shares are single double divisions of exact longs, cumulative
    share from the exact integer running sum — deterministic
    cross-engine; ties break on the key value.

    Key-type contract: the key is grouped and returned in its NATIVE
    type (string join keys — a common hot-key case — must not be
    coerced: a numeric cast would NULL-collapse every string key into
    one fake mega-key under non-ANSI casts, or throw under ANSI).
    Callers wanting a specific output type cast the column BEFORE
    calling. Ties break on the key's native ordering.

    Returns (rank, key, n_rows, share, cum_share), heaviest first.
    """
    counts = (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    total = counts.agg(F.sum("n_rows").cast("long").alias("t"))
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(k)
        .localCheckpoint(eager=True)  # bounded: exactly k rows
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    t = F.col("t").cast("double")
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "cum_rows",
            F.sum("n_rows")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .select(
            "rank",
            "key",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / t, 6).alias("share"),
            F.round(F.col("cum_rows").cast("double") / t, 6).alias(
                "cum_share"
            ),
        )
        .orderBy("rank")
    )


def pareto_revenue_curve(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Pareto CONCENTRATION CURVE of a value measure over its keys —
    "the top decile of customers carries X% of revenue", the 80/20
    card: rank keys by their exact total value, cut into ``n_tiles``
    ntile buckets (tile 1 = heaviest), and report each tile's value
    share and the cumulative head share. The distribution-shaped
    complement to ``topk_key_share`` (named heavy keys) and the
    events-side Gini (one number): this is the curve a revenue /
    token-budget / storage-attribution review reads.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: per-key value totals are EXACT INTEGER
    CENTS (round(v·100) per row, long sums — no decimal/double sums
    to order by); the tile cut is ``exact_ntile`` over the total
    order (cents DESC, key ASC), whose quotient/remainder semantics
    equal SQL ntile on any engine; shares are single double divisions
    of exact longs. NULL keys/values are excluded (documented — a
    NULL key is unattributable revenue, flagged by dq, not ranked).

    Scale shape: one map-side-combined groupBy(key), the exact_ntile
    range exchange (NO single-task ranking stage — that is the point
    of exact_ntile), one n_tiles-group rollup, then a window over the
    checkpointed n_tiles-row table. Returns one row per tile:
    (tile, n_keys, value_cents, value_share, cum_share).
    """
    from etl_developstoday_test_spark.functions import exact_ntile

    v = F.col(value_col).cast("double")
    rev = (
        df.filter(F.col(key_col).isNotNull() & v.isNotNull() & ~F.isnan(v))
        .select(
            F.col(key_col).alias("k"),
            F.round(v * 100).cast("long").alias("_cents"),
        )
        .groupBy("k")
        .agg(F.sum("_cents").cast("long").alias("cents"))
    )
    tiled = exact_ntile(
        rev, n_tiles, [F.col("cents").desc(), F.col("k").asc()]
    )
    per = (
        tiled.groupBy("tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .localCheckpoint(eager=True)  # bounded: exactly n_tiles rows
    )
    total = per.agg(F.sum("value_cents").cast("long").alias("t"))
    w = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    t = F.col("t").cast("double")
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn(
            "_cum", F.sum("value_cents").over(w).cast("long")
        )
        .select(
            "tile",
            "n_keys",
            "value_cents",
            F.round(F.col("value_cents").cast("double") / t, 6).alias(
                "value_share"
            ),
            F.round(F.col("_cum").cast("double") / t, 6).alias("cum_share"),
        )
        .orderBy("tile")
    )


def partition_balance_profile(
    df: DataFrame, key_col: str, n_buckets: int = 32
) -> DataFrame:
    """SHUFFLE-BALANCE forecast for a prospective partitioning key:
    hash every row's key into ``n_buckets`` deterministic buckets and
    report the per-bucket row counts with the two balance numbers a
    capacity review reads — max/mean (the straggler factor: the
    slowest reducer's load relative to ideal) and the coefficient of
    variation. The PHYSICAL-layout complement of topk_key_share
    (logical key concentration): a key column can look tame by top-k
    share yet hash badly (few distinct keys), and this card is the
    direct answer to "can I repartition/bucket BY this column".

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: the bucket is salted-md5 % n_buckets (the repo's
    engine-portable hash — Spark's own `hash()` is
    implementation-specific and would make the oracle unportable,
    which is also why this is a FORECAST of balance, not a replay of
    Spark's exact partitioner: md5 and Murmur3 are both uniform, so
    the balance statistics transfer); counts are exact longs; NULL
    keys get their own bucket id −1 (Spark shuffles NULLs to one
    partition — hiding them would hide exactly the classic skew
    cause); max/mean and CoV are fixed-order double trees over the
    bounded bucket table, variance through the decimal summator,
    6-dp rounded.

    CONTRACT NOTE (r13 ADVICE): when NULL keys exist, the −1 row
    participates in the balance moments as an EXTRA reducer — the
    statistics then describe ``n_buckets``+1 loads, a deliberately
    conservative forecast. Real Spark folds NULLs into one of the
    ``n_buckets`` hash partitions, so the true straggler factor on a
    NULL-bearing key is ≥ the figure reported here only when the
    NULL mass would have landed on the already-max bucket; the −1
    row's own n_rows quantifies the NULL mass so a capacity review
    can re-add it to any bucket by hand. On NULL-free keys (the
    registered documents.source card) the statistics are exactly the
    ``n_buckets``-reducer forecast.

    Scale shape: one narrow map + ONE map-side-combined groupBy into
    an ``n_buckets``-bounded table, joined onto the full 0..n−1 bucket
    spine so EMPTY buckets count as zero-load reducers (the straggler
    factor is meaningless over occupied buckets only — a 5-key column
    hashed into 32 buckets leaves 27 idle reducers, which IS the
    finding); the audit moments ride the same spine table. Returns one
    row per spine bucket plus the NULL bucket if occupied:
    (bucket, n_rows, max_over_mean, cov), bucket-ordered.
    """
    from etl_developstoday_test_spark.functions import md5_long

    if n_buckets < 2:
        raise ValueError("partition_balance_profile: n_buckets must be >= 2")
    b = F.when(F.col(key_col).isNull(), F.lit(-1).cast("long")).otherwise(
        md5_long(F.concat(F.lit("pb#"), F.col(key_col).cast("string")))
        % n_buckets
    )
    occupied = (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    spine = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(int(n_buckets) - 1))
            ).alias("_b")
        )
        .select(F.col("_b").cast("long").alias("bucket"))
    )
    # the NULL bucket joins the spine only when occupied (no phantom
    # -1 row on NULL-free columns); spine buckets zero-fill
    hist = (
        spine.join(occupied, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_rows"),
        )
        .localCheckpoint(eager=True)  # bounded: n_buckets (+1) rows
    )
    mom = hist.agg(
        F.count(F.lit(1)).cast("long").alias("_k"),
        F.sum("n_rows").cast("long").alias("_t"),
        F.max("n_rows").cast("long").alias("_mx"),
        F.sum(
            (F.col("n_rows").cast("double") * F.col("n_rows").cast("double"))
            .cast(ACC_DECIMAL)
        ).alias("_s2"),
    )
    kk = F.col("_k").cast("double")
    tt = F.col("_t").cast("double")
    mean = tt / kk
    var = F.greatest(
        F.col("_s2").cast("double") / kk - mean * mean, F.lit(0.0)
    )
    audit = mom.select(
        F.round(F.col("_mx").cast("double") / mean, 6).alias(
            "max_over_mean"
        ),
        F.round(F.sqrt(var) / mean, 6).alias("cov"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select("bucket", "n_rows", "max_over_mean", "cov")
        .orderBy("bucket")
    )
