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
                F.sum(F.col("_k").isNull().cast("long"))
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
