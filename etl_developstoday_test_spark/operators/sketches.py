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
