"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection (text_dedup, similarity) emits PAIRS; a training
pipeline needs CLUSTERS — "keep one doc per connected component of the
similarity graph". Spark has no native fixpoint operator, so this is the
canonical driver-controlled iteration:

- min-label propagation: every node starts labeled with itself; each
  round a node takes the min of its own and its neighbors' labels;
  converged when no label changes. Rounds ≤ graph diameter (dedup
  similarity graphs are small-diameter clique-ish clusters, so typically
  2-4 rounds).
- each round is ONE shuffle (groupBy node after an edge join);
- ``localCheckpoint`` after every round truncates lineage — without it
  round N's plan contains all N-1 previous joins and the job DAG grows
  quadratically (the classic iterative-Spark failure mode);
- edges are cached for the duration: every round re-reads them.

The result is deterministic (min over a set), so even this iterative
operator is verifiable against a DuckDB ``WITH RECURSIVE`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id reachable from
    ``node`` over undirected ``edges``. ``vertices`` supplies isolated
    nodes (they become singleton components)."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = vertices.select(
        F.col(node).alias("n"), F.col(node).alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        neighbor_labels = sym.join(
            labels, sym["d"] == labels["n"]
        ).select(F.col("s").alias("n"), "component")
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("n")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "n")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        # free the superseded round's checkpoint blocks NOW — leaving
        # them to GC-driven cleanup accumulates cached partitions across
        # rounds (and across later queries in the same session)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("n").alias(node), "component")
