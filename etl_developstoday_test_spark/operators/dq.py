"""Relational data-quality audits over the star schema.

The referential-integrity layer the inline dq queries
(``dq_constraint_violations`` — column-domain checks,
``dq_k_anonymity_audit`` — re-identification risk) don't cover:
cross-TABLE consistency. A 100-TB ingest that loses a parent partition
produces orphaned children that every downstream join silently drops —
this card is how that loss is seen before the join shrinkage is
misread as a filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_developstoday_test_spark.functions import dsum


def fk_orphan_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key ORPHAN audit: for each (name, child, child_key,
    parent, parent_key) relation, count child rows whose key has no
    parent row — the referential-integrity card a warehouse checks
    after every load (orphans mean a lost/partial parent load, and
    every inner join downstream silently drops them).

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    NULL child keys are counted separately (``n_null_keys``): a NULL
    FK is "no reference" (legal in SQL semantics), not a broken one —
    conflating them hides which failure mode fired.

    Determinism: all counts are exact longs; the single rate is one
    6-dp division. Scale shape: per relation, ONE left-anti equi-join
    co-shuffled on the key (AQE free to broadcast small parents) into
    1-row count aggregates; the returned card is a union of
    relation-count-many 1-row frames — nothing corpus-sized is
    windowed, broadcast by hint, or collected. Returns one row per
    relation: (relation, n_child, n_null_keys, n_orphans, orphan_rate).
    """
    if not relations:
        raise ValueError("fk_orphan_audit: at least one relation required")
    cards = []
    for name, child, ckey, parent, pkey in relations:
        keys = child.select(F.col(ckey).alias("_k"))
        nonnull = keys.filter(F.col("_k").isNotNull())
        orphans = nonnull.join(
            parent.select(F.col(pkey).alias("_k")).distinct(), "_k", "left_anti"
        )
        card = (
            keys.agg(
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.coalesce(
                    F.sum(F.col("_k").isNull().cast("long")), F.lit(0)
                )
                .cast("long")
                .alias("n_null_keys"),
            )
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count(F.lit(1)).cast("long").alias("n_orphans")
                    )
                )
            )
            .select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_null_keys",
                "n_orphans",
                F.when(
                    F.col("n_child") > 0,
                    F.round(
                        F.col("n_orphans").cast("double")
                        / F.col("n_child").cast("double"),
                        6,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("orphan_rate"),
            )
        )
        cards.append(card)
    out = cards[0]
    for c in cards[1:]:
        out = out.unionAll(c)
    return out.orderBy("relation")


def uniqueness_audit(
    relations: list[tuple[str, DataFrame, list[str]]],
) -> DataFrame:
    """Candidate-KEY uniqueness audit: for each (name, table,
    key_columns), how many rows exist, how many distinct non-NULL
    keys, how many keys are violated (appear more than once) and by
    how many excess rows — the dq card that certifies primary-key /
    natural-key assumptions BEFORE a merge/upsert or a dedup pass
    silently relies on them (a violated merge key = lost updates; a
    violated dedup key = over-deletion). Keys with any NULL component
    are counted separately (``n_null_keys``) — a NULL key is a
    different defect than a duplicate one.

    Registered round 12 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: pure exact integer counts (one groupBy per key +
    bounded rollups); ``is_unique`` is a boolean of those counts.
    Scale shape: per relation, ONE map-side-combined groupBy on the
    key columns into a 1-row rollup — the same single-exchange
    posture as exact dedup; the card is a union of 1-row frames.
    Returns one row per relation: (candidate_key, n_rows,
    n_null_keys, n_distinct_keys, n_violating_keys, n_excess_rows,
    is_unique), ordered by candidate_key.
    """
    if not relations:
        raise ValueError("uniqueness_audit: at least one relation required")
    cards = []
    for name, df, keys in relations:
        nonnull = F.lit(True)
        for k in keys:
            nonnull = nonnull & F.col(k).isNotNull()
        per_key = (
            df.select(
                *[F.col(k) for k in keys], nonnull.alias("_ok")
            )
            .filter(F.col("_ok"))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        key_stats = per_key.agg(
            F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("_nn"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_keys"),
            F.coalesce(F.sum((F.col("_c") > 1).cast("long")), F.lit(0))
            .cast("long")
            .alias("n_violating_keys"),
            F.coalesce(
                F.sum(F.when(F.col("_c") > 1, F.col("_c") - 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_excess_rows"),
        )
        totals = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        card = (
            totals.crossJoin(F.broadcast(key_stats))
            .select(
                F.lit(name).alias("candidate_key"),
                "n_rows",
                (F.col("n_rows") - F.col("_nn")).cast("long").alias(
                    "n_null_keys"
                ),
                "n_distinct_keys",
                "n_violating_keys",
                "n_excess_rows",
                (F.col("n_violating_keys") == 0).alias("is_unique"),
            )
        )
        cards.append(card)
    out = cards[0]
    for c in cards[1:]:
        out = out.unionAll(c)
    return out.orderBy("candidate_key")


def functional_dependency_audit(
    relations: list[tuple[str, DataFrame, str, str]],
) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY audit: for each (name, table,
    determinant_col, dependent_col), does A → B hold — i.e. does every
    determinant value map to exactly ONE dependent value? The dq card
    that certifies the derivation/denormalization assumptions a
    pipeline silently relies on (a violated "code → description"
    means a stale dimension merge; a violated "entity → category"
    means the column is NOT safe to group by as a proxy key), and the
    schema-inference probe a 100-TB ingest runs before collapsing a
    wide table. Completes the relational-dq trio: fk_orphan_audit
    (cross-table reference), uniqueness_audit (key identity), this
    (intra-table determination).

    Registered round 12 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Rows with a NULL determinant OR dependent are counted separately
    (``n_null_rows``) and excluded from the determination test — SQL
    NULL is "unknown", and an unknown on either side can neither
    prove nor violate a dependency.

    Determinism: pure exact integer counts; ``fd_holds`` is a boolean
    of those counts. Scale shape: per relation, ONE map-side-combined
    groupBy on the determinant (count + count-distinct of the
    dependent — the classic two-phase distinct aggregate) into a
    1-row rollup; the card is a union of 1-row frames. Returns one
    row per relation: (dependency, n_rows, n_null_rows,
    n_determinants, n_violating_determinants, n_violating_rows,
    fd_holds), ordered by dependency.
    """
    if not relations:
        raise ValueError(
            "functional_dependency_audit: at least one relation required"
        )
    cards = []
    for name, df, det, dep in relations:
        ok = F.col(det).isNotNull() & F.col(dep).isNotNull()
        per_det = (
            df.select(F.col(det).alias("_a"), F.col(dep).alias("_b"), ok.alias("_ok"))
            .filter(F.col("_ok"))
            .groupBy("_a")
            .agg(
                F.count(F.lit(1)).cast("long").alias("_rows"),
                F.countDistinct("_b").cast("long").alias("_nd"),
            )
        )
        det_stats = per_det.agg(
            F.coalesce(F.sum("_rows"), F.lit(0)).cast("long").alias("_nn"),
            F.count(F.lit(1)).cast("long").alias("n_determinants"),
            F.coalesce(F.sum((F.col("_nd") > 1).cast("long")), F.lit(0))
            .cast("long")
            .alias("n_violating_determinants"),
            F.coalesce(
                F.sum(F.when(F.col("_nd") > 1, F.col("_rows"))), F.lit(0)
            )
            .cast("long")
            .alias("n_violating_rows"),
        )
        totals = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        card = totals.crossJoin(F.broadcast(det_stats)).select(
            F.lit(name).alias("dependency"),
            "n_rows",
            (F.col("n_rows") - F.col("_nn")).cast("long").alias(
                "n_null_rows"
            ),
            "n_determinants",
            "n_violating_determinants",
            "n_violating_rows",
            (F.col("n_violating_determinants") == 0).alias("fd_holds"),
        )
        cards.append(card)
    out = cards[0]
    for c in cards[1:]:
        out = out.unionAll(c)
    return out.orderBy("dependency")


def fk_fanout_profile(
    parent: DataFrame,
    child: DataFrame,
    pk: str,
    fk: str,
) -> DataFrame:
    """REFERENTIAL FAN-OUT profile: the distribution of children per
    parent across a 1:N relationship — the dq card that sizes every
    downstream join BEFORE it runs (a p99 fan-out of 10⁵ means the
    equi-join on this key needs salting; a fat zero-children bucket
    means the "inner join loses nothing" assumption is false). The
    quantitative complement of the trio's yes/no audits: fk_orphan
    (do children point at real parents), uniqueness (is the parent
    key a key), THIS (how hard does the relationship fan).

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: pure exact integers (per-parent counts via ONE
    map-side-combined child groupBy, LEFT-joined onto parents so
    zero-child parents are COUNTED, then a fan-out-domain-bounded
    histogram) until one 6-dp mean division. NULL-FK child rows are
    excluded from counts (they reference nothing — the orphan audit's
    jurisdiction) and NULL-PK parents raise nothing here (uniqueness
    audit's jurisdiction); both conventions documented so the three
    audits partition the defect space.

    Scale shape: one child groupBy + one pk-co-shuffled LEFT join +
    one bounded histogram groupBy; audit totals broadcast from the
    histogram itself (no second pass over data). Returns one row per
    occupied fan-out value: (fanout, n_parents, n_parents_total,
    n_children_total, mean_fanout), fan-out-ordered.
    """
    counts = (
        child.filter(F.col(fk).isNotNull())
        .groupBy(F.col(fk).alias("_k"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    per_parent = (
        parent.select(F.col(pk).alias("_k"))
        .join(counts, "_k", "left")
        .select(F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("_c"))
    )
    hist = (
        per_parent.groupBy(F.col("_c").alias("fanout"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parents"))
        .localCheckpoint(eager=True)  # bounded: fan-out domain
    )
    audit = hist.agg(
        F.sum("n_parents").cast("long").alias("n_parents_total"),
        F.sum(F.col("fanout") * F.col("n_parents"))
        .cast("long")
        .alias("n_children_total"),
    ).select(
        "n_parents_total",
        "n_children_total",
        F.round(
            F.col("n_children_total").cast("double")
            / F.col("n_parents_total").cast("double"),
            6,
        ).alias("mean_fanout"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "fanout",
            "n_parents",
            "n_parents_total",
            "n_children_total",
            "mean_fanout",
        )
        .orderBy("fanout")
    )


def key_candidate_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """KEY-CANDIDATE / completeness profile of a table: for each named
    column, the exact null count, exact distinct count, distinct
    ratio, and whether the column is a lossless single-column key
    (distinct == non-null == rows). The table-level entrance exam the
    relational-dq kit runs BEFORE its targeted legs (uniqueness audit
    = verify a CHOSEN key; this SURVEYS all candidates), and the card
    a partitioning/bucketing review reads first — a 0.99-distinct
    column is a key with dirt, a 5-distinct column is a broadcast
    dimension in disguise.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: every column is cast to STRING and unpivoted via
    stack() into (column, value) pairs, so ONE pass + one
    (column, value)-keyed distinct aggregation serves every column;
    string casts of distinct native values are distinct in both
    engines (shortest-repr doubles, ISO timestamps), so the counts
    equal the native COUNT(DISTINCT col) the oracle runs. CONTRACT:
    IEEE −0.0 and +0.0 render as distinct strings while native
    equality merges them — a column carrying BOTH would read one
    higher here (none of the profiled tables can produce −0.0;
    documented rather than special-cased). Counts are exact longs;
    the ratio is the only double, 6-dp.

    Scale shape: the stack() multiplies rows by |cols| but stays a
    narrow map; the distinct aggregation is ONE map-side-combined
    two-level groupBy on (column, value) — Spark plans a single
    distinct column without an Expand — into the |cols|-bounded
    profile. Nothing windowed, nothing collected. Returns one row per
    profiled column: (column, n_rows, n_null, n_distinct,
    distinct_ratio, is_unique_key), column-ordered.
    """
    if not cols:
        raise ValueError("key_candidate_profile: cols must be non-empty")
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    stacked = df.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (col_name, v)"
    )
    prof = stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("v")).cast("long").alias("n_null"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
    )
    return prof.select(
        F.col("col_name").alias("column"),
        "n_rows",
        "n_null",
        "n_distinct",
        F.round(
            F.col("n_distinct").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("distinct_ratio"),
        (
            (F.col("n_null") == 0)
            & (F.col("n_distinct") == F.col("n_rows"))
        ).alias("is_unique_key"),
    ).orderBy("column")


def dup_multiplicity_profile(
    df: DataFrame, key_cols: list[str]
) -> DataFrame:
    """DUPLICATE-MULTIPLICITY profile of a declared key: the
    histogram of how many key values occur exactly m times, with the
    affected-row share riding every row. The SHAPE companion to
    uniqueness_audit — that card says a key IS violated and by how
    many rows in total; this says HOW (ten thousand keys doubled is
    an idempotency bug in a replayed loader, one key times ten
    thousand is a sentinel/default value) — the difference decides
    whether the fix is dedup-first-wins or a quarantine rule.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: both aggregations are exact long counts; the three
    audit numbers (total rows, duplicated keys, rows carrying a
    duplicated key value) are exact integer rollups of the bounded
    histogram; the share is the only double, 6-dp. NULL key
    components group as NULL (Spark groupBy == SQL GROUP BY null
    handling — documented, matches the oracle).

    Scale shape: ONE map-side-combined groupBy on the key collapses
    the corpus to per-key counts, a second map-side groupBy to the
    multiplicity-domain-bounded histogram (localCheckpointed); the
    1-row audit rides the bounded table and broadcasts back. Returns
    one row per occupied multiplicity: (multiplicity, n_keys,
    n_rows_total, n_dup_keys, dup_row_share), multiplicity-ordered.
    """
    per_key = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_m")
    )
    hist = (
        per_key.groupBy(F.col("_m").alias("multiplicity"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .localCheckpoint(eager=True)  # bounded: multiplicity domain
    )
    audit = hist.agg(
        F.sum(
            (
                F.col("multiplicity").cast("decimal(38,0)")
                * F.col("n_keys").cast("decimal(38,0)")
            ).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("n_rows_total"),
        F.sum(F.when(F.col("multiplicity") > 1, F.col("n_keys")))
        .cast("long")
        .alias("_dk"),
        F.sum(
            F.when(
                F.col("multiplicity") > 1,
                (
                    F.col("multiplicity").cast("decimal(38,0)")
                    * F.col("n_keys").cast("decimal(38,0)")
                ).cast("decimal(38,0)"),
            )
        )
        .cast("long")
        .alias("_dr"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "multiplicity",
            "n_keys",
            "n_rows_total",
            F.coalesce(F.col("_dk"), F.lit(0)).cast("long").alias(
                "n_dup_keys"
            ),
            F.round(
                F.coalesce(F.col("_dr"), F.lit(0)).cast("double")
                / F.col("n_rows_total").cast("double"),
                6,
            ).alias("dup_row_share"),
        )
        .orderBy("multiplicity")
    )


def order_reconciliation(
    orders: DataFrame,
    lineitem: DataFrame,
    tolerance: float = 0.01,
) -> DataFrame:
    """ORDER-header vs LINE-sum reconciliation: per order, the delta
    between ``o_totalprice`` and the recomputed
    Σ extendedprice·(1−discount)·(1+tax), bucketed by signed relative
    size, with the match-rate audit riding every row. THE
    cross-table consistency number for any money pipeline — FK
    audits say the rows line up, this says the AMOUNTS do, and the
    signed buckets separate a fee/rounding convention (small,
    one-sided) from data corruption (large, both-sided).

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: each line's term extendedprice·(1−discount)·(1+tax)
    is a fixed-order IEEE double product (the parquet money columns
    are doubles); per-order sums accumulate through the
    decimal(30,10) summator (order-independent — the dsum/_dsum twin
    idiom), the delta subtracts in double, and the relative delta
    divides once against the header total; bucket edges are fixed
    literals (|rel| <= 1e-4 matched, then small/over-tolerance each
    side — an identical CASE chain in the oracle); counts exact
    longs, shares 6-dp. Headers with no lines reconcile against 0
    (full-delta bucket) — the LEFT join keeps them (documented);
    NULL/zero header totals route to the ``invalid_header`` bucket
    instead of an ANSI DIVIDE_BY_ZERO (the repo's guard convention).

    Scale shape: lineitem collapses map-side to per-order sums
    BEFORE the join (never row-level join fan-out); ONE
    order-co-keyed equi-join, one narrow bucket projection, one
    map-side groupBy to the <= 9-row bucket histogram
    (localCheckpointed); the 1-row audit broadcasts back. Returns
    one row per occupied bucket: (bucket, bucket_label, n_orders,
    share, n_orders_total, match_rate), bucket-ordered.
    """
    line_sums = lineitem.groupBy(
        F.col("l_orderkey").alias("_ok")
    ).agg(
        dsum(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("_ls")
    )
    j = orders.select(
        F.col("o_orderkey").alias("_ok2"), "o_totalprice"
    ).join(line_sums, F.col("_ok2") == F.col("_ok"), "left")
    # a NULL/zero header total cannot anchor a relative delta: routed
    # to its own triage bucket instead of an ANSI DIVIDE_BY_ZERO (the
    # repo's guard convention — the seam IS the finding on such rows)
    _bad = F.col("o_totalprice").isNull() | (F.col("o_totalprice") == 0)
    rel = F.when(
        ~_bad,
        (F.col("o_totalprice") - F.coalesce(F.col("_ls"), F.lit(0.0)))
        / F.col("o_totalprice"),
    )
    tol = float(tolerance)
    bucket = (
        F.when(_bad, F.lit(-5))
        .when(F.abs(rel) <= F.lit(1e-4), F.lit(0))
        .when(rel > F.lit(tol), F.lit(4))
        .when(rel > F.lit(0.0), F.lit(3))
        .when(rel < -F.lit(tol), F.lit(-4))
        .otherwise(F.lit(-3))
    )
    labels = F.create_map(
        F.lit(-5), F.lit("invalid_header"),
        F.lit(-4), F.lit("under_gt_tol"),
        F.lit(-3), F.lit("under_small"),
        F.lit(0), F.lit("matched"),
        F.lit(3), F.lit("over_small"),
        F.lit(4), F.lit("over_gt_tol"),
    )
    hist = (
        j.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .localCheckpoint(eager=True)  # bounded: 5 buckets
    )
    audit = hist.agg(
        F.sum("n_orders").cast("long").alias("n_orders_total"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("bucket") == 0, F.col("n_orders"))),
                F.lit(0),
            ).cast("double")
            / F.sum("n_orders").cast("double"),
            6,
        ).alias("match_rate"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "bucket",
            F.element_at(labels, F.col("bucket")).alias("bucket_label"),
            "n_orders",
            F.round(
                F.col("n_orders").cast("double")
                / F.col("n_orders_total").cast("double"),
                6,
            ).alias("share"),
            "n_orders_total",
            "match_rate",
        )
        .orderBy("bucket")
    )
