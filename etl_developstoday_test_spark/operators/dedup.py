"""First-wins deduplication (SURVEY.md §2.4 D1).

Reference semantics (``TripDuplicateDetectorService.cs:36-49``): key =
(pickup_utc, dropoff_utc, passenger_count) computed *after* UTC
conversion; the first occurrence in file order wins; every later
occurrence is a duplicate routed to the side output with its raw strings.

Spark design: ``row_number() OVER (PARTITION BY key ORDER BY order_col)``
then split on rn==1 / rn>1. ``dropDuplicates`` is wrong here twice over —
it keeps an arbitrary row and cannot emit the losers. This windowed
design is exactly what the reference itself prescribes for beyond-RAM
inputs (``README.md:84-87``), and it scales: the shuffle is by the dedup
key, state spills, and AQE splits skewed key groups.

Scale note (100 TB): a single hot key (many rows with the same
(pickup,dropoff,pax)) would make one window partition huge. True data
has tiny per-key multiplicity; if a pathological key appears, pre-reduce
with a map-side ``min(order_col) GROUP BY key`` (an aggregate, which
gets partial aggregation for free) and semi-join winners back — provided
as ``first_wins_dedup(strategy="agg")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def first_wins_dedup(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    strategy: str = "window",
) -> tuple[DataFrame, DataFrame]:
    """Return (winners, losers); both keep all input columns.

    strategy="window": row_number over (keys, order) — one shuffle.
    strategy="agg": min(order) per key + join back — two shuffles on the
    same key (co-partitioned, so the join does not re-shuffle the big
    side), but gets map-side partial aggregation; prefer under heavy key
    skew.
    """
    if strategy == "agg":
        winners_keys = df.groupBy(*keys).agg(F.min(order_col).alias(order_col))
        winners = df.join(winners_keys, on=[*keys, order_col], how="leftsemi")
        losers = df.join(winners_keys, on=[*keys, order_col], how="leftanti")
        return winners, losers

    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    ranked = df.withColumn("__rn", F.row_number().over(w))
    winners = ranked.filter(F.col("__rn") == 1).drop("__rn")
    losers = ranked.filter(F.col("__rn") > 1).drop("__rn")
    return winners, losers
