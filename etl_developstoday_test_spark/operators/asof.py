"""As-of (point-in-time) join: for each left row, the most recent right
row with the same key and ``right_ts <= left_ts``.

Spark has no native ASOF JOIN (DuckDB/Pandas do), and the naive
formulation — range join + per-left-row ``row_number`` — explodes to
O(|L| × matches) intermediate rows before pruning. This implements the
scalable plan instead:

1. tag and union both sides on (key, ts) — no join at all;
2. one shuffle partitions by key, one sort orders by (ts, side);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding running
   frame carries the latest right-side values forward onto left rows.

Cost is a single hash shuffle + sort of |L| + |R| rows — the same bound
as a sort-merge join, with bounded memory per partition and no
intermediate blowup, so it survives 100 TB where the range-join
formulation dies. Right rows sort *before* left rows at equal
timestamps, making the match inclusive (``right_ts <= left_ts``),
matching DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts``.

Ties inside the right side at the same (key, ts) are resolved before the
union (greatest ``right_id`` wins) so the carried values are
deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"  # 0 = right (emitter), 1 = left (receiver)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    right_id: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Enrich each ``left`` row with the latest ``right`` row at or
    before its timestamp (same ``key``); unmatched left rows keep nulls.

    Output = all ``left`` columns + ``{prefix}{right_ts}`` +
    ``{prefix}{col}`` for each of ``right_values``.
    """
    carried = [right_ts, *right_values]

    r = right
    if right_id is not None:
        w_dedup = Window.partitionBy(key, right_ts).orderBy(F.desc(right_id))
        r = (
            r.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    r_tagged = r.select(
        F.col(key).alias(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{prefix}{c}") for c in carried],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != key],
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in carried
        ],
        *[F.col(c) for c in left.columns if c != key],
    )

    w = (
        Window.partitionBy(key)
        .orderBy("_asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in carried
        ],
    )
    return enriched.filter(F.col(_SIDE) == 1).select(
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        *[F.col(f"_c_{c}").alias(f"{prefix}{c}") for c in carried],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    right_id: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Nearest-neighbor as-of join: enrich each ``left`` row with the
    right row whose timestamp is CLOSEST (either direction, same key);
    exact ties and equal timestamps resolve backward — deterministic.

    Same single-shuffle union plan as ``asof_join``, with TWO running
    frames over the one sorted partition: ``last(..., ignorenulls)``
    unbounded-preceding carries the latest earlier right row forward,
    ``first(..., ignorenulls)`` unbounded-following carries the earliest
    later right row backward, and a per-row comparison of the two time
    gaps picks the winner. Still one hash shuffle + one sort of
    |L| + |R| rows — the second frame reuses the same sorted partition,
    so the nearest variant costs no extra data movement.
    """
    carried = [right_ts, *right_values]

    r = right
    if right_id is not None:
        w_dedup = Window.partitionBy(key, right_ts).orderBy(F.desc(right_id))
        r = (
            r.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    r_tagged = r.select(
        F.col(key).alias(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{prefix}{c}") for c in carried],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != key],
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in carried
        ],
        *[F.col(c) for c in left.columns if c != key],
    )

    base = Window.partitionBy(key).orderBy("_asof_ts", _SIDE)
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    enriched = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w_back).alias(f"_b_{c}")
            for c in carried
        ],
        *[
            F.first(f"{prefix}{c}", ignorenulls=True).over(w_fwd).alias(f"_f_{c}")
            for c in carried
        ],
    )
    lts = F.col("_asof_ts")
    bts, fts = F.col(f"_b_{right_ts}"), F.col(f"_f_{right_ts}")
    # gaps in exact epoch micros; backward wins ties (<=)
    take_back = fts.isNull() | (
        bts.isNotNull()
        & (
            (F.unix_micros(lts) - F.unix_micros(bts))
            <= (F.unix_micros(fts) - F.unix_micros(lts))
        )
    )
    return enriched.filter(F.col(_SIDE) == 1).select(
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        *[
            F.when(take_back, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"{prefix}{c}")
            for c in carried
        ],
    )
