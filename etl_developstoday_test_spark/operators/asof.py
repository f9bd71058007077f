"""As-of (point-in-time) join: for each left row, the most recent right
row with the same key and ``right_ts <= left_ts``.

Spark has no native ASOF JOIN (DuckDB/Pandas do), and the naive
formulation — range join + per-left-row ``row_number`` — explodes to
O(|L| × matches) intermediate rows before pruning. This implements the
scalable plan instead:

1. tag and union both sides on (key, ts) — no join at all;
2. one shuffle partitions by key, one sort orders by (ts, side);
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   running frame carries the latest right-side row forward onto left
   rows — as ONE ``struct(right_ts, *right_values)`` payload, so the
   matched row's columns travel atomically: a NULL inside a right
   value column stays NULL on the matched output instead of being
   stitched from a different (older) right row, the whole-row
   semantics of SQL ASOF JOIN.

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

from pyspark.sql import DataFrame, Window, functions as F, types as T

_SIDE = "_asof_side"  # 0 = right (emitter), 1 = left (receiver)


def _tag_sides(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carried: Sequence[str],
    right_id: str | None,
) -> DataFrame:
    """Union both sides on (key, _asof_ts, side, _asof_payload): right
    rows carry ``struct(*carried)`` as the payload, left rows carry a
    typed NULL payload (so ``last/first(..., ignorenulls=True)`` skips
    them) plus their own columns."""
    r = right
    if right_id is not None:
        w_dedup = Window.partitionBy(key, right_ts).orderBy(F.desc(right_id))
        r = (
            r.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in carried]
    )
    r_tagged = r.select(
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in carried]).alias("_asof_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != key],
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias("_asof_payload"),
        *[F.col(c) for c in left.columns if c != key],
    )
    return l_tagged.unionByName(r_tagged)


def _epoch_fn(dtype):
    """Exact integer comparison basis for a ts column: epoch micros for
    timestamps, the raw value for numeric ordering columns."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros
    return lambda c: c


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    right_id: str | None = None,
    prefix: str = "asof_",
    tolerance: int | None = None,
) -> DataFrame:
    """Enrich each ``left`` row with the latest ``right`` row at or
    before its timestamp (same ``key``); unmatched left rows keep nulls.

    ``tolerance`` (pandas ``merge_asof(tolerance=...)`` semantics): a
    match staler than this is discarded — the whole carried payload
    nulls out atomically, exactly as if no right row existed. Units are
    epoch MICROSECONDS for timestamp columns, raw units for numeric
    ordering columns. Applied as a per-row null-out AFTER the carry, so
    the plan cost is unchanged: still one shuffle + one sort.

    Output = all ``left`` columns + ``{prefix}{right_ts}`` +
    ``{prefix}{col}`` for each of ``right_values``.
    """
    carried = [right_ts, *right_values]
    tagged = _tag_sides(left, right, key, left_ts, right_ts, carried, right_id)

    w = (
        Window.partitionBy(key)
        .orderBy("_asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.select(
        "*",
        F.last("_asof_payload", ignorenulls=True).over(w).alias("_c"),
    )
    matched = F.col("_c")
    if tolerance is not None:
        ep = _epoch_fn(tagged.schema["_asof_ts"].dataType)
        fresh = (
            ep(F.col("_asof_ts")) - ep(F.col("_c")[right_ts])
        ) <= tolerance
        matched = F.when(F.col("_c").isNotNull() & fresh, F.col("_c"))
    return enriched.filter(F.col(_SIDE) == 1).select(
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        *[matched[c].alias(f"{prefix}{c}") for c in carried],
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
    gaps picks the winner. Each direction carries ONE whole-row struct
    payload (atomic — see module docstring), so the winning row's
    timestamp and values can never mix with the other direction's or an
    adjacent row's. Still one hash shuffle + one sort of |L| + |R| rows
    — the second frame reuses the same sorted partition, so the nearest
    variant costs no extra data movement.
    """
    carried = [right_ts, *right_values]
    tagged = _tag_sides(left, right, key, left_ts, right_ts, carried, right_id)

    base = Window.partitionBy(key).orderBy("_asof_ts", _SIDE)
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    enriched = tagged.select(
        "*",
        F.last("_asof_payload", ignorenulls=True).over(w_back).alias("_b"),
        F.first("_asof_payload", ignorenulls=True).over(w_fwd).alias("_f"),
    )
    # gaps in exact epoch micros for timestamp keys, raw difference for
    # numeric ones; backward wins ties (<=)
    _epoch = _epoch_fn(tagged.schema["_asof_ts"].dataType)
    lts = F.col("_asof_ts")
    bts, fts = F.col("_b")[right_ts], F.col("_f")[right_ts]
    take_back = F.col("_f").isNull() | (
        F.col("_b").isNotNull()
        & ((_epoch(lts) - _epoch(bts)) <= (_epoch(fts) - _epoch(lts)))
    )
    chosen = F.when(take_back, F.col("_b")).otherwise(F.col("_f"))
    return enriched.filter(F.col(_SIDE) == 1).select(
        F.col(key),
        *[F.col(c) for c in left.columns if c != key],
        *[chosen[c].alias(f"{prefix}{c}") for c in carried],
    )


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_micros: int = 3_600_000_000,
) -> DataFrame:
    """INTERVAL (range) JOIN: every (points row, intervals row) pair
    with the same ``key`` and ``start_ts <= point_ts <= end_ts`` — the
    "which events fall inside which window" primitive (session
    attribution, maintenance-window exclusion, promo-period tagging)
    that Spark has no native operator for. The naive theta join
    compiles to a per-key NESTED LOOP (BroadcastNestedLoop or a
    key-equi join whose range residual runs as a post-join filter over
    the full |points_k| × |intervals_k| pair stream per key — the
    skewed-key blowup class).

    Registered round 13 (staged r12; oracle value-locked at both
    scales in tests/test_staged_oracles.py BEFORE registration).

    This is the standard BUCKET-BLOCKING plan instead: explode each
    interval onto the fixed-width time buckets it covers, bucket each
    point once, and equi-join on (key, bucket) with the exact range
    test as the join residual. Each point lives in exactly ONE bucket,
    so every qualifying pair is emitted exactly once — no dedup pass.
    Fan-out is Σ ceil(len/W) interval replicas instead of a per-key
    cross product: W (``bucket_micros``, default 1 hour) trades
    replication (long intervals) against candidate density (busy
    buckets) and is the single knob to retune at 100 TB. All bucket
    arithmetic is exact integer microseconds (``unix_micros`` +
    floor-div — no double truncation); intervals with end < start are
    dropped (empty range), NULL endpoints/timestamps fall out of the
    bucket arithmetic like any SQL comparison.

    Scale shape: one narrow map per side (the explode is
    ``sequence()`` over bucket ids — JVM codegen, no Python), ONE
    equi-join co-shuffled on (key, bucket); nothing is broadcast by
    hint, windowed, or collected. Returns points columns + the
    interval's columns (caller projects); one output row per
    qualifying (point, interval) pair.
    """
    if bucket_micros < 1:
        raise ValueError("interval_bucket_join: bucket_micros must be >= 1")
    p_us = F.unix_micros(F.col(point_ts))
    s_us = F.unix_micros(F.col(start_ts))
    e_us = F.unix_micros(F.col(end_ts))
    # EXACT integer bucket ids (`div`, not double division + floor: at
    # 2^50-scale micros a correctly-rounded double quotient can cross
    # an integer boundary and strand a point one bucket away from its
    # covering interval). `div` truncates toward zero == floor on the
    # non-negative post-1970 epoch domain this operator documents.
    wlit = int(bucket_micros)
    p = points.withColumn(
        "_pb", F.expr(f"unix_micros({point_ts}) div {wlit}L")
    )
    # The interval side's key and bucket get PRIVATE names before the
    # join: points and intervals are routinely derived from the SAME
    # scan (events -> purchases / events -> sessions), where a
    # two-sided df[key] == df[key] condition resolves ambiguously (the
    # "trivially true equals predicate" trap — the key equality would
    # silently vanish and cross-key pairs would survive the residual).
    i = (
        intervals.filter(e_us >= s_us)
        .withColumn(
            "_ib",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start_ts}) div {wlit}L"),
                    F.expr(f"unix_micros({end_ts}) div {wlit}L"),
                )
            ),
        )
        .withColumnRenamed(key, "_ikey")
    )
    joined = p.join(
        i,
        (F.col(key) == F.col("_ikey"))
        & (F.col("_pb") == F.col("_ib"))
        & (p_us >= s_us)
        & (p_us <= e_us),
    )
    return joined.drop("_ikey", "_pb", "_ib")
