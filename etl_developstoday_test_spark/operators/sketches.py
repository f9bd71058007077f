"""Mergeable cardinality sketches beyond HLL: K-Minimum-Values.

KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") keeps the k smallest hash values seen; the k-th smallest
order statistic h_k estimates distinct count as (k-1) * H / h_k for a
hash space of size H. Like the HLL rollup in plans/queries.py, the
sketch is MERGEABLE — union of two KMV sets, re-truncated to k, is the
sketch of the union — which is what makes it a partial aggregate at
100 TB: each partition keeps its k minima, the merge is a k-way
min-heap, and the final state is k 8-byte values regardless of corpus
size.

Unlike probabilistic-register sketches, KMV is exactly reproducible in
any engine with the same hash (``functions.md5_long``), so the DuckDB
oracle verifies the ESTIMATES hash-exactly, not within a tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import md5_long

# md5_long yields 15 hex chars = 60 bits
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
    prefilter_frac: int = 8,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Plan shape: one distinct on (group, key) — the only corpus-sized
    shuffle, shared by the exact count — then a static hash pre-filter
    ``h < H / prefilter_frac`` shrinks the window input to ~1/frac of
    the distinct keys before the per-group rank that selects the k
    minima. The pre-filter is what keeps this scalable: the ordered
    window never sees more than distinct/frac rows per group, and at a
    known corpus scale you tighten frac ∝ distinct/k so the window
    input stays ~O(k) (the sketch is valid as long as ≥ k survivors
    remain, which the ``n_kept`` column certifies).

    Returns one row per group: exact distinct, k-th minimum hash, the
    KMV estimate, and how many minima were kept.
    """
    dk = (
        df.select(F.col(group_col).alias("grp"), F.col(key_col).alias("key"))
        .distinct()
        .withColumn("h", md5_long(F.col("key").cast("string")))
    )
    exact = dk.groupBy("grp").agg(F.count(F.lit(1)).alias("exact_distinct"))
    bound = int(HASH_SPACE) // prefilter_frac
    ranked = (
        dk.filter(F.col("h") < F.lit(bound))
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("grp").orderBy("h")),
        )
        .filter(F.col("rnk") <= k)
        .groupBy("grp")
        .agg(
            F.max("h").alias("kth_min_hash"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(HASH_SPACE))
        / F.col("kth_min_hash").cast("double")
    )
    return (
        exact.join(ranked, "grp")
        .select(
            F.col("grp"),
            "exact_distinct",
            "kth_min_hash",
            "n_kept",
            est.alias("kmv_estimate"),
        )
    )


def bottomk_quantile_rollup(
    df: DataFrame,
    value_col: str,
    hash_key,
    year_col,
    month_col,
    k: int = 256,
    bound: float = 0.1,
    oversample: int = 4,
) -> DataFrame:
    """MERGEABLE quantile sketch rollup — the quantile sibling of the
    HLL/KMV rollups: a deterministic bottom-k-by-hash row sample per
    (year, month) leaf, merged UPWARD to year and grand-total levels by
    union + re-truncate (bottom-k of a union of bottom-k sets is the
    bottom-k of the union — the same mergeability that makes KMV a
    partial aggregate), with the level median estimated from each
    level's sketch and certified by an EXPLICIT DISTRIBUTION-FREE
    ERROR BOUND: the exact rank fraction of the estimate within its
    level (count(v <= est)/n) must sit within ``bound`` of 0.5. The
    rank-space check is the right oracle for a sample quantile — it
    needs no assumptions about the value distribution, and a uniform
    k-sample's median concentrates as O(1/sqrt(k)) in rank space
    (k=256 → ~3σ at 0.094).

    Determinism: the "random" sample is the k smallest md5 hashes of
    the row key — exactly reproducible in any engine — and the median
    pick is the lower-median order statistic of the sketch (index
    (k_eff+1) div 2 by (value, hash) total order), a raw data value,
    so estimates hash-match a SQL replay exactly.

    Scale shape — the data is scanned exactly THREE times, each pass
    map-side-combined or hash-bounded, and NO window task ever holds a
    month's full slice: (0) one count per (year, month) — a combined
    groupBy whose output is months-sized — sets a per-month KMV-style
    hash bound ``h < H div greatest(1, n_month div (oversample*k))``;
    (1) the leaf sketch ranks only the rows UNDER the bound (expected
    ~oversample*k per month, materialized via persist at months x
    ~oversample*k rows) instead of the month's entire slice — the fix
    for the single-task month sort the unfiltered rank implied at
    100 TB (1 TB in one window task). The filter is EXACT, not
    approximate: months smaller than oversample*k keep frac=1 (no
    filtering — which also means small-SF results are bit-identical to
    the unfiltered form), and larger months keep the true bottom-k as
    long as >= k rows survive, which the operator CERTIFIES per month
    (survivors >= min(k, n_month)) and RAISES otherwise — lower
    ``oversample``'s implied frac rather than silently sketching from
    a short sample (survivor count concentrates at oversample*k with
    O(1/sqrt(oversample*k)) relative noise, so the certificate only
    fires on adversarial hash distributions). The year merge ranks
    only its months' k-row sketches, the total merge the years'
    (<= n_years*k rows — bounded by CONSTRUCTION, so its partitionless
    window is safe at any corpus size). (2) the rank-fraction
    certification is ONE fused pass: each
    row broadcast-joins its month/year/total estimates and a single
    (year, month) aggregation produces month-level partials
    (n, count(v<=est) per level) from which the year and total rows
    are exact rollups — no per-level re-scan, no 3-way union of the
    fact table. The month-partial table (months rows) is also
    materialized so its three consumers don't re-run the fused pass.

    Returns one row per (level, grp): n_rows, est_p50, rank_frac_le,
    within_bound.
    """
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    m = F.col(month_col) if isinstance(month_col, str) else month_col
    base = df.select(
        y.alias("y"),
        m.alias("m"),
        F.col(value_col).cast("double").alias("v"),
        md5_long(hash_key).alias("h"),
    )

    def bottom_k(sdf: DataFrame, keys: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*keys).orderBy("h")
            if keys
            else Window.orderBy("h")  # input bounded: n_years * k rows
        )
        return (
            sdf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )

    # per-month adaptive hash bound (pass 0): months under oversample*k
    # rows keep everything (frac=1 — exactness and small-SF parity by
    # construction); larger months keep an expected oversample*k-row
    # superset of their true bottom-k
    hs = 1 << 60  # md5_long hash space (HASH_SPACE, as an exact int)
    cnts = base.groupBy("y", "m").agg(F.count(F.lit(1)).alias("_n_m"))
    bounds = cnts.select(
        "y",
        "m",
        "_n_m",
        F.expr(
            f"{hs} div greatest(1, _n_m div {int(oversample) * k})"
        ).alias("_hmax"),
    )
    survivors = (
        base.join(F.broadcast(bounds), ["y", "m"])
        .filter(F.col("h") < F.col("_hmax"))
        .persist()  # months x ~oversample*k rows
    )
    # exactness certificate: the filtered rank equals the unfiltered
    # bottom-k iff >= min(k, n_month) rows survived per month —
    # anchored on the COUNTS table (a month whose survivors were ALL
    # filtered out has no survivor row at all and must still be
    # flagged, not silently skipped). The certificate's count() is
    # ALSO what materializes the persist — whichever action touches a
    # persisted frame first populates the cache, so a separate eager
    # count here would be a redundant job (r9 verdict #3)
    n_bad = (
        cnts.join(
            survivors.groupBy("y", "m").agg(
                F.count(F.lit(1)).alias("_kept")
            ),
            ["y", "m"],
            "left",
        )
        .filter(
            F.coalesce(F.col("_kept"), F.lit(0))
            < F.least(F.lit(k), F.col("_n_m"))
        )
        .count()
    )
    if n_bad:
        survivors.unpersist()
        raise ValueError(
            f"bottomk_quantile_rollup: {n_bad} (year, month) group(s) "
            f"kept fewer than min(k={k}, group size) rows under the "
            f"oversample={oversample} hash bound — raise oversample "
            "(widens the pre-filter) instead of sketching from a "
            "short sample"
        )
    # materialize the leaf sketch: <= months*k rows, consumed by the
    # year merge AND the month medians (persist is cacheManager-tracked
    # so the release before return is real)
    msk = bottom_k(survivors.drop("_n_m", "_hmax"), ["y", "m"]).persist()
    msk.count()
    survivors.unpersist()  # msk is materialized; the superset can go
    ysk = bottom_k(msk, ["y"])
    tsk = bottom_k(ysk, [])

    def lower_median(sdf: DataFrame, keys: list[str]) -> DataFrame:
        # order statistic (k_eff+1) div 2 of the sketch by (v, h) —
        # sketch-sized windows (<= k rows per group by construction)
        w = (
            Window.partitionBy(*keys).orderBy("v", "h")
            if keys
            else Window.orderBy("v", "h")
        )
        wc = Window.partitionBy(*keys) if keys else Window.partitionBy()
        return (
            sdf.withColumn("_r", F.row_number().over(w))
            .withColumn("_c", F.count(F.lit(1)).over(wc))
            .filter(F.expr("_r = (_c + 1) div 2"))
            .select(*keys, F.col("v").alias("est"))
        )

    mest = lower_median(msk, ["y", "m"]).withColumnRenamed("est", "est_m")
    yest = lower_median(ysk, ["y"]).withColumnRenamed("est", "est_y")
    test = lower_median(tsk, []).withColumnRenamed("est", "est_t")

    # fused certification: ONE scan of the data, each row carrying its
    # three level estimates via broadcast joins, aggregated once to
    # month-level partials (every coarser level is an exact rollup of
    # these — count and count(v<=est) are both self-mergeable)
    cert = (
        base.join(F.broadcast(mest), ["y", "m"])
        .join(F.broadcast(yest), ["y"])
        .crossJoin(F.broadcast(test))
    )
    mp = (
        cert.groupBy("y", "m")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("v") <= F.col("est_m"), 1).otherwise(0)
            ).alias("c_m"),
            F.sum(
                F.when(F.col("v") <= F.col("est_y"), 1).otherwise(0)
            ).alias("c_y"),
            F.sum(
                F.when(F.col("v") <= F.col("est_t"), 1).otherwise(0)
            ).alias("c_t"),
            F.any_value("est_m").alias("est_m"),
            F.any_value("est_y").alias("est_y"),
            F.any_value("est_t").alias("est_t"),
        )
        .persist()  # months rows; month/year/total outputs all read it
    )
    mp.count()

    def frac(c, n):
        return F.round(c.cast("double") / n, 6)

    grp_month = F.concat_ws(
        "-", F.col("y"), F.lpad(F.col("m").cast("string"), 2, "0")
    )
    month_rows = mp.select(
        F.lit("month").alias("level"),
        grp_month.alias("grp"),
        F.col("n").alias("n_rows"),
        F.col("est_m").alias("est_p50"),
        frac(F.col("c_m"), F.col("n")).alias("rank_frac_le"),
    )
    year_rows = (
        mp.groupBy("y")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum("c_y").alias("c"),
            F.any_value("est_y").alias("est_p50"),
        )
        .select(
            F.lit("year").alias("level"),
            F.col("y").cast("string").alias("grp"),
            "n_rows",
            "est_p50",
            frac(F.col("c"), F.col("n_rows")).alias("rank_frac_le"),
        )
    )
    total_rows = (
        mp.agg(
            F.sum("n").alias("n_rows"),
            F.sum("c_t").alias("c"),
            F.any_value("est_t").alias("est_p50"),
        )
        .select(
            F.lit("total").alias("level"),
            F.lit("ALL").alias("grp"),
            "n_rows",
            "est_p50",
            frac(F.col("c"), F.col("n_rows")).alias("rank_frac_le"),
        )
    )
    out = (
        month_rows.unionByName(year_rows)
        .unionByName(total_rows)
        .select(
            "level",
            "grp",
            "n_rows",
            "est_p50",
            "rank_frac_le",
            (F.abs(F.col("rank_frac_le") - 0.5) <= bound).alias(
                "within_bound"
            ),
        )
        .localCheckpoint(eager=True)  # levels+groups rows
    )
    msk.unpersist()  # real releases: both went through persist()
    mp.unpersist()
    return out
