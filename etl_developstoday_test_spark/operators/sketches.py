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

    Scale shape: the leaf sketch is one shuffle+rank per (year, month)
    partition (distributed); the year merge ranks only its months'
    k-row sketches (<= 12k rows per year); the total merge ranks the
    years' sketches (<= n_years*k rows — bounded by CONSTRUCTION, so
    its partitionless window is safe at any corpus size). The
    rank-fraction certification is ONE extra pass: each row fans out
    to its three level keys and joins the broadcast (levels x groups)
    estimate table.

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

    msk = bottom_k(base, ["y", "m"])
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

    grp_month = F.concat_ws(
        "-", F.col("y"), F.lpad(F.col("m").cast("string"), 2, "0")
    )
    ests = (
        lower_median(msk, ["y", "m"])
        .select(F.lit("month").alias("level"), grp_month.alias("grp"), "est")
        .unionByName(
            lower_median(ysk, ["y"]).select(
                F.lit("year").alias("level"),
                F.col("y").cast("string").alias("grp"),
                "est",
            )
        )
        .unionByName(
            lower_median(tsk, []).select(
                F.lit("total").alias("level"),
                F.lit("ALL").alias("grp"),
                "est",
            )
        )
    )
    keys3 = (
        base.select(F.lit("month").alias("level"), grp_month.alias("grp"), "v")
        .unionByName(
            base.select(
                F.lit("year").alias("level"),
                F.col("y").cast("string").alias("grp"),
                "v",
            )
        )
        .unionByName(
            base.select(
                F.lit("total").alias("level"), F.lit("ALL").alias("grp"), "v"
            )
        )
    )
    certified = (
        keys3.join(F.broadcast(ests), ["level", "grp"])
        .groupBy("level", "grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.any_value("est").alias("est_p50"),
            F.round(
                F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("rank_frac_le"),
        )
    )
    return certified.select(
        "level",
        "grp",
        "n_rows",
        "est_p50",
        "rank_frac_le",
        (F.abs(F.col("rank_frac_le") - 0.5) <= bound).alias("within_bound"),
    )
