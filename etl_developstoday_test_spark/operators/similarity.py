"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) probe set, stream once over the corpus computing cosine inside
codegen (array lambdas — no Python), take per-probe top-k. Cost is
O(|corpus| × |probes| × dim) FLOPs with zero shuffles on the corpus
side and a tiny top-k shuffle — at 100 TB this is scan-bound, which is
the right bound for an exact method.

The IVF variant is the scale path: partition the corpus once by
nearest-centroid, then probe only ``nprobe`` inverted lists —
corpus-side work drops by ~n_centroids/nprobe. Centroids here are
derived deterministically from the data (k-means is a separate offline
concern); the operator contract is the two-stage assign/search plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import (
    ACC_DECIMAL,
    as_double_array,
    cosine,
    dot_fold,
    dsum,
    fan_out,
    let,
    md5_long,
)


def _with_unit_info(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_vec", as_double_array(vec_col))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe (self excluded).

    Returns (query_id, neighbor_id, rank, cos_sim). The probe side is
    broadcast — Catalyst turns the pair enumeration into
    BroadcastNestedLoopJoin, so the corpus is scanned exactly once.
    """
    p = _with_unit_info(probes, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_vec").alias("_qvec")
    )
    c = _with_unit_info(fan_out(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_vec").alias("_cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def cosine_near_pairs(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking groups.

    The all-pairs formulation is O(n²) and unusable at corpus scale, so
    the operator takes a blocking column (here a cluster/label id; in a
    real pipeline the output of IVF assignment or LSH bucketing) and
    enumerates pairs only *inside* each block — the standard blocked
    near-dup design: candidate count drops from n²/2 to Σ|block|²/2.
    The pair join hash-partitions by the block key (one shuffle); the
    cosine runs in codegen (array lambdas, no Python).

    Returns (vec_a, vec_b, block, cos_sim) for pairs with
    ``cos_sim >= threshold`` (vec_a < vec_b).
    """
    # Pre-fold each vector's self-dot once (O(n·d)) so the pair stage
    # does ONE fold per pair instead of three — the exact same FP ops
    # the oracle's dot/sqrt(dot_aa*dot_bb) performs, just not repeated.
    e = _with_unit_info(fan_out(embeddings), vec_col).select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        "_vec",
        dot_fold(F.col("_vec"), F.col("_vec")).alias("_norm2"),
    )
    # No broadcast hint: b is the FULL corpus — at 100 TB it cannot be
    # broadcast. Both sides shuffle on the block key (SMJ/SHJ), which is
    # exactly the hash-partitioned design the docstring describes.
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.block") == F.col(f"b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col("a.block").alias("block"),
            (
                dot_fold(F.col("a._vec"), F.col("b._vec"))
                / F.sqrt(F.col("a._norm2") * F.col("b._norm2"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


CENTROID_QUANTUM = 1e8  # component quantization for exact accumulation


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid as (label, dim, centroid_val): a vector
    aggregate via posexplode + exact integer mean — the building block
    for IVF training / cluster quality checks. One shuffle on
    (label, dim); dim fan-out keeps partitions balanced.

    Components are quantized to 1e-8 with round-half-away-from-zero and
    accumulated as exact BIGINTs: float32 values can be exact decimal
    midpoints (j/2^11 ends ...5 at the 11th decimal digit), where
    engines disagree on decimal rounding — integer accumulation with an
    explicit round() keeps the mean bit-reproducible everywhere.
    """
    exploded = embeddings.select(
        "label",
        F.posexplode(as_double_array("embedding")).alias("dim", "component"),
    )
    q = F.round(F.col("component") * CENTROID_QUANTUM).cast("long")
    return exploded.groupBy("label", F.col("dim").cast("long").alias("dim")).agg(
        (
            F.sum(q).cast("double") / F.count(F.lit(1)) / CENTROID_QUANTUM
        ).alias("centroid_val")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: assign corpus vectors to their
    nearest centroid (one broadcast pass), search each probe only in its
    ``nprobe`` nearest lists. ``centroids`` must have (centroid_id,
    centroid_vec array<double>).

    Approximate by construction (recall < 1 when the true neighbor lives
    in an unprobed list) — verified in tests against cosine_topk recall,
    not against a SQL oracle.
    """
    cent = centroids.select(
        F.col("centroid_id"), as_double_array("centroid_vec").alias("_cent")
    )

    def assign(df: DataFrame, id_alias: str, n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).select(
            F.col(id_alias),
            "centroid_id",
            cosine(F.col("_vec"), F.col("_cent")).alias("_cs"),
        )
        w = Window.partitionBy(id_alias).orderBy(F.desc("_cs"), F.asc("centroid_id"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n)
            .select(id_alias, "centroid_id")
        )

    c = _with_unit_info(fan_out(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_vec")
    )
    p = _with_unit_info(probes, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_vec")
    )
    corpus_lists = assign(c, "neighbor_id", 1)
    probe_lists = assign(p, "query_id", nprobe)

    # co-partitioned by centroid_id: the join shuffles both sides once
    pairs = (
        c.join(corpus_lists, "neighbor_id")
        .join(
            p.select("query_id", F.col("_vec").alias("_qvec")).join(
                probe_lists, "query_id"
            ),
            "centroid_id",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qvec"), F.col("_vec")).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))  # dedupe multi-list hits
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def semdedup_prune(
    embeddings: DataFrame,
    centroids: DataFrame,
    eps: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the corpus
    by nearest centroid, then WITHIN each cluster prune every vector
    whose cosine to a lower-id cluster-mate is ≥ ``eps`` — semantic
    (not lexical) near-duplicates collapse to one representative per
    ε-ball, the paper's greedy keep-lowest rule.

    The clustering is what makes this scale: pair enumeration happens
    only inside a cluster (Σ|cluster|² work, never n²), and the
    assignment is one broadcast-centroid pass — exactly the IVF
    corpus-assign stage (``ivf_topk``), so a pipeline that already
    built an ANN index gets SemDeDup's candidate structure for free.
    One shuffle for the within-cluster pair join (hash-partitioned on
    centroid_id), one for the per-cluster rollup.

    Deterministic throughout (argmax assignment with id tiebreaks, fold
    cosine) — the full pipeline, including the prune decisions, has an
    exact SQL twin. Returns per-cluster (centroid_id, n_vectors,
    n_pruned, prune_rate).
    """
    cent = centroids.select(
        F.col("centroid_id"), as_double_array("centroid_vec").alias("_cent")
    )
    e = _with_unit_info(fan_out(embeddings), vec_col).select(
        F.col(id_col).alias("vec_id"),
        "_vec",
        dot_fold(F.col("_vec"), F.col("_vec")).alias("_norm2"),
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "_vec",
        "_norm2",
        "centroid_id",
        cosine(F.col("_vec"), F.col("_cent")).alias("_cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_cs"), F.asc("centroid_id"))
    # assigned feeds three consumers (both pair-join sides + the rollup)
    # — checkpoint so the broadcast-assign pass runs once
    assigned = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", "centroid_id", "_vec", "_norm2")
        .localCheckpoint(eager=True)
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pruned = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            (
                dot_fold(F.col("a._vec"), F.col("b._vec"))
                / F.sqrt(F.col("a._norm2") * F.col("b._norm2"))
            ).alias("_cos"),
        )
        .filter(F.col("_cos") >= eps)
        .select("vec_id")
        .distinct()
    )
    return (
        assigned.join(pruned.withColumn("_p", F.lit(1)), "vec_id", "left")
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count("_p").alias("n_pruned"),
        )
        .select(
            "centroid_id",
            "n_vectors",
            "n_pruned",
            F.round(F.col("n_pruned") / F.col("n_vectors"), 6).alias(
                "prune_rate"
            ),
        )
    )


def kmeans_par_init(
    corpus: DataFrame,
    k: int,
    oversample: int | None = None,
    rounds: int = 2,
) -> list[tuple[int, list[float]]]:
    """k-means|| initialization (Bahmani et al. 2012, VLDB — "Scalable
    K-Means++"), fully deterministic so a fixed-seed run reproduces the
    same centroids on any engine.

    ``corpus`` is the (vec_id, _vec double array) working set
    kmeans_lloyd builds. The distributed phases are exactly the paper's:

    1. seed with one center (here: the lowest vec_id — the paper's
       uniform pick, made deterministic);
    2. for O(1) rounds, compute every point's squared distance d²(x, C)
       to the current center set as a LITERAL-centroid projection (no
       join — same plan shape as the Lloyd assignment), total cost
       φ = Σd² via one aggregate, then sample each point independently
       with probability min(1, l·d²/φ). The coin flip is a salted
       md5 of (round, vec_id) scaled to [0,1) — deterministic, yet
       distributionally uniform, so the d²-biased oversampling the
       paper proves its O(log φ)-round guarantee on is preserved;
    3. weight every candidate by the number of corpus points nearest to
       it (one more literal projection + groupBy);
    4. recluster the ~l·rounds weighted candidates down to k ON THE
       DRIVER — the paper's final step (the candidate set is tiny by
       construction). Here: deterministic greedy weighted k-means++
       (farthest-first by weight·d², ties to lowest vec_id).

    Driver state is O(l·rounds·dim) — never the corpus. Each round is
    one corpus scan + a scalar aggregate; sampling collects an expected
    ``l`` rows. Returns [(vec_id, vector)] sorted by vec_id, the same
    shape as the every-Nth init, so the Lloyd iteration body is
    unchanged (the swap the kmeans_lloyd docstring promises).
    """
    l = oversample if oversample is not None else 2 * k

    first = (
        corpus.orderBy("vec_id").select("vec_id", "_vec").limit(1).collect()
    )
    if not first:
        raise ValueError("kmeans_par_init: empty corpus")
    centers: list[tuple[int, list[float]]] = [
        (first[0]["vec_id"], list(first[0]["_vec"]))
    ]

    def _sq_norm(vec: list[float]) -> float:
        acc = 0.0
        for x in vec:
            acc = acc + x * x
        return acc

    def d2_col() -> "F.Column":
        """min over current centers of ||x - c||² = x·x - 2 x·c + c·c,
        with the center vectors and their norms as plan literals — one
        dot fold per center per row."""
        vecs_lit = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(x) + "D" for x in vec) + ")"
                for _, vec in centers
            )
            + ")"
        )
        norms_lit = F.expr(
            "array("
            + ",".join(repr(_sq_norm(vec)) + "D" for _, vec in centers)
            + ")"
        )
        return let(
            dot_fold(F.col("_vec"), F.col("_vec")),
            lambda nx: F.greatest(
                F.lit(0.0),
                F.array_min(
                    F.zip_with(
                        vecs_lit,
                        norms_lit,
                        lambda c, nc: nx
                        - 2.0 * dot_fold(F.col("_vec"), c)
                        + nc,
                    )
                ),
            ),
        )

    for r in range(rounds):
        scored = corpus.select("vec_id", "_vec", d2_col().alias("_d2"))
        phi = scored.agg(F.sum("_d2").alias("s")).collect()[0]["s"]
        if not phi or phi <= 0.0:  # all points coincide with a center
            break
        # salted md5 → uniform in [0,1): 60-bit hash / 2^60
        u = md5_long(F.concat(F.lit(f"kmpp#{r}#"), F.col("vec_id"))) / F.lit(
            float(1 << 60)
        )
        picked = (
            scored.filter(u < F.lit(float(l)) * F.col("_d2") / F.lit(phi))
            .select("vec_id", "_vec")
            .collect()
        )
        have = {cid for cid, _ in centers}
        centers.extend(
            (row["vec_id"], list(row["_vec"]))
            for row in sorted(picked, key=lambda x: x["vec_id"])
            if row["vec_id"] not in have
        )

    # weight candidates by their nearest-assignment counts (argmin d²,
    # ties to the lowest candidate index = lowest vec_id after the sort)
    centers.sort()
    ids_lit = F.expr(
        "array(" + ",".join(f"{cid}L" for cid, _ in centers) + ")"
    )
    vecs_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(x) + "D" for x in vec) + ")"
            for _, vec in centers
        )
        + ")"
    )
    norms_lit = F.expr(
        "array("
        + ",".join(repr(_sq_norm(vec)) + "D" for _, vec in centers)
        + ")"
    )
    nearest = let(
        dot_fold(F.col("_vec"), F.col("_vec")),
        lambda nx: let(
            F.zip_with(
                vecs_lit,
                norms_lit,
                lambda c, nc: nx - 2.0 * dot_fold(F.col("_vec"), c) + nc,
            ),
            lambda d2s: F.get(
                ids_lit, F.array_position(d2s, F.array_min(d2s)) - 1
            ),
        ),
    )
    weights = {
        row["_cand"]: row["_w"]
        for row in corpus.select(nearest.alias("_cand"))
        .groupBy("_cand")
        .agg(F.count(F.lit(1)).alias("_w"))
        .collect()
    }

    # driver-side reduction: greedy weighted k-means++ over the tiny
    # candidate set — start at the heaviest candidate, then repeatedly
    # take argmax weight·d²(cand, chosen); deterministic ties to lowest id
    cands = [(cid, vec, weights.get(cid, 0)) for cid, vec in centers]
    chosen = [
        max(cands, key=lambda c: (c[2], -c[0]))
    ]
    chosen_ids = {chosen[0][0]}
    while len(chosen) < min(k, len(cands)):
        def score(c):
            best = min(
                sum((a - b) ** 2 for a, b in zip(c[1], ch[1]))
                for ch in chosen
            )
            return (c[2] * best, -c[0])

        nxt = max((c for c in cands if c[0] not in chosen_ids), key=score)
        chosen.append(nxt)
        chosen_ids.add(nxt[0])
    return sorted((cid, vec) for cid, vec, _ in chosen)


def kmeans_lloyd(
    embeddings: DataFrame,
    iters: int = 2,
    init_every: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "every_nth",
    k: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over the embedding column — the offline centroid
    trainer ivf_topk's docstring defers to, pure DataFrame ops.

    Architecture (the MLlib shape): the model state is k centroids —
    bounded, driver-sized — so each iteration COLLECTS the k×dim means
    and embeds them as plan literals for the next assignment pass.
    Assignment is then a narrow map (cosine argmax over literal arrays
    inside codegen): no join, no corpus shuffle, one scan per
    iteration. The only shuffle is the centroid recompute — posexplode
    to (cluster, dim) rows + partial-aggregated groupBy. At 100 TB:
    iteration cost = 1 scan + 1 (k×dim)-row shuffle; k and dim bound
    the driver state, never the corpus. (Contrast connected components
    in operators/graph.py, whose per-node state must stay distributed.)

    Determinism, so a single-node oracle reproduces every value
    bit-for-bit: init = every ``init_every``-th vec_id by default, or
    ``init="kmeans_par"`` for the k-means|| oversampling init
    (``kmeans_par_init`` above — the corpus-scale path; the iteration
    body is unchanged either way);
    similarities rounded to 9 dp before the argmax with ties to the
    lowest centroid_id; centroid means and the final per-cluster
    mean_cos_sim use the exact integer-quantized accumulator
    (CENTROID_QUANTUM, as label_centroids). Clusters that lose all
    members drop out (standard Lloyd simplification).

    Returns (centroid_id, n_members, mean_cos_sim): the final
    assignment evaluated against the final (post-``iters``) centroids.
    """
    corpus = _with_unit_info(fan_out(embeddings), vec_col).select(
        F.col(id_col).alias("vec_id"), "_vec"
    )
    # every Lloyd job (per-iteration assign+recompute, final stats) would
    # otherwise replay scan + fan_out + double-cast; checkpoint the
    # working set once — the standard cache for iterative algorithms
    # (same reasoning as graph.py's label propagation)
    corpus = corpus.localCheckpoint(eager=True)

    if init == "kmeans_par":
        cents: list[tuple[int, list[float]]] = kmeans_par_init(
            corpus, k if k is not None else 8
        )
    elif init == "every_nth":
        cents = [
            (r["vec_id"], list(r["_vec"]))
            for r in corpus.filter(F.col("vec_id") % init_every == 0)
            .select("vec_id", "_vec")
            .collect()
        ]
    else:
        raise ValueError(f"kmeans_lloyd: unknown init mode {init!r}")
    cents.sort()
    if not cents:
        # the every-Nth deterministic init selected nothing (empty
        # corpus, or no vec_id divisible by init_every) — fall back to
        # the k lowest ids rather than building an unparseable empty
        # array literal / crashing on cents[0][1] below
        cents = [
            (r["vec_id"], list(r["_vec"]))
            for r in corpus.select("vec_id", "_vec")
            .orderBy("vec_id")
            .limit(max(2, init_every // 10))
            .collect()
        ]
    if not cents:
        raise ValueError(
            "kmeans_lloyd: empty corpus — no vectors to initialize "
            "centroids from"
        )

    def _fold_norm(vec: list[float]) -> float:
        # the same sequential fold dot_fold compiles to, in Python —
        # IEEE doubles in identical order, so the precomputed constant
        # is bit-identical to an in-plan dot_fold(c, c)
        acc = 0.0
        for x in vec:
            acc = acc + x * x
        return acc

    def assigned() -> DataFrame:
        """(vec_id, centroid_id, _cs, _vec) via literal-centroid argmax —
        projection only, no join anywhere in the iteration.

        Per-centroid work is ONE dot fold: centroid norms ride along as
        precomputed literals and the row norm is bound once per row, so
        cosine costs k+1 folds per row instead of 3k (the naive
        cosine-per-centroid form re-folds the row norm k times)."""
        # literals go in as ONE parsed SQL expression: building them
        # element-wise (F.lit / nested-list lit) costs a py4j round-trip
        # per component — measured ~4s per assignment pass at k×dim =
        # 40×64, vs ~6ms for the parse. Python float repr round-trips
        # exactly through the parser's correctly-rounded Double parse,
        # so the plan carries the same bits either way.
        ids_lit = F.expr(
            "array(" + ",".join(f"{cid}L" for cid, _ in cents) + ")"
        )
        vecs_lit = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(repr(x) + "D" for x in vec) + ")"
                for _, vec in cents
            )
            + ")"
        )
        norms_lit = F.expr(
            "array("
            + ",".join(repr(_fold_norm(vec)) + "D" for _, vec in cents)
            + ")"
        )

        def with_row_norm(nv):
            scores = F.zip_with(
                vecs_lit,
                norms_lit,
                lambda c, nc: F.round(
                    dot_fold(F.col("_vec"), c) / F.sqrt(nv * nc), 9
                ),
            )
            return let(
                scores,
                # first position of the max score = lowest centroid index
                lambda s: F.struct(
                    F.get(ids_lit, F.array_position(s, F.array_max(s)) - 1)
                    .cast("long")
                    .alias("cid"),
                    F.array_max(s).alias("cs"),
                ),
            )

        return corpus.select(
            "vec_id",
            "_vec",
            let(dot_fold(F.col("_vec"), F.col("_vec")), with_row_norm).alias(
                "_best"
            ),
        ).select(
            "vec_id",
            "_vec",
            F.col("_best.cid").alias("centroid_id"),
            F.col("_best.cs").alias("_cs"),
        )

    q = CENTROID_QUANTUM
    dim = len(cents[0][1])
    for _ in range(iters):
        # columnar recompute: one sum aggregate per dimension over the
        # assigned rows — no explode (would multiply the row count by
        # dim), no second shuffle; partial aggregation means the
        # exchange carries k rows × (dim+1) longs, nothing more. Each
        # sum is one parsed expression (same py4j-chatter reasoning as
        # the centroid literals).
        sums = [
            F.expr(
                f"sum(cast(round(_vec[{d}] * {q!r}D) as bigint)) as _s{d}"
            )
            for d in range(dim)
        ]
        means = (
            assigned()
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("_n"), *sums)
            .collect()
        )
        cents = sorted(
            (
                r["centroid_id"],
                [r[f"_s{d}"] / r["_n"] / q for d in range(dim)],
            )
            for r in means
        )

    return (
        assigned()
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.round(F.col("_cs") * q).cast("long")).cast("double")
                / F.count(F.lit(1))
                / q,
                6,
            ).alias("mean_cos_sim"),
        )
    )


# --- random-hyperplane LSH (SimHash in embedding space) --------------------

# 4 bands x 8 bits: 256 band values spread the bucket join (cost is
# Σ|bucket|² per band — at 16 bits / 4-bit bands the testbed produced
# ~250x-corpus-size candidate pairs; 8-bit bands cut that ~16x while a
# 0.99-cosine pair still collides in some band with P ≈ 1-(1-p^8)^4 ≈
# 0.99 for p = 1-θ/π ≈ 0.955). At corpus scale raise to 64-128 bits.
N_HYPERPLANES = 32
LSH_BANDS = 4


def hyperplane_signs(n_planes: int = N_HYPERPLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplane components, derived from md5 of the
    (plane, dim) coordinates — no RNG state, so any engine (or the
    DuckDB oracle) regenerates the identical planes. Random-±1
    hyperplanes satisfy the SimHash collision bound P(bit match) =
    1 − θ/π the same way Gaussian ones do."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"hp#{p}#{d}".encode()).digest()[0] % 2 == 0 else -1
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_band_signatures(
    embeddings: DataFrame,
    n_planes: int = N_HYPERPLANES,
    bands: int = LSH_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-vector banded LSH signatures: one (id, vec, band_id,
    band_val) row per band — the shared stage-1 of both the near-dup
    pair join (hyperplane_lsh_pairs) and LSH ANN search
    (lsh_ann_topk). Narrow codegen: each of n_planes sign bits is the
    sign of a dot fold against a literal ±1 hyperplane, packed into
    ``bands`` integer band values and posexploded."""
    planes = hyperplane_signs(n_planes, dim)
    # ONE parsed SQL literal for the whole ±1 plane matrix: building
    # n_planes×dim literals as individual Column objects costs thousands
    # of py4j round-trips (measured ~6s of pure DataFrame-construction
    # time at 32×64); a single F.expr costs one. The bits array and the
    # vector cast are let-bound so each is evaluated once per row
    # (CollapseProject would otherwise re-inline them per use).
    planes_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(s)}D" for s in row) + ")"
            for row in planes
        )
        + ")"
    )
    bits_per_band = n_planes // bands
    bits = let(
        as_double_array(vec_col),
        lambda vv: F.transform(
            planes_lit, lambda row: (dot_fold(vv, row) >= 0).cast("int")
        ),
    )
    band_arr = let(
        bits,
        lambda bs: F.array(
            *[
                sum(
                    (F.get(bs, b * bits_per_band + i) * F.lit(2**i))
                    for i in range(bits_per_band)
                )
                for b in range(bands)
            ]
        ),
    )
    return fan_out(embeddings).select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(band_arr).alias("band_id", "band_val"),
    )


def hyperplane_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    n_planes: int = N_HYPERPLANES,
    bands: int = LSH_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by random-hyperplane LSH + exact verify.

    Stage 1 (narrow, codegen): per row, n_planes sign bits — each the
    sign of a dot product against a literal ±1 hyperplane (array fold,
    no Python) — packed into ``bands`` band values.
    Stage 2: posexplode to (band_id, band_value) and self-join on the
    band bucket — candidates are pairs agreeing on ALL bits of some
    band, an equi-join, never O(n²).
    Stage 3: exact cosine ≥ threshold on the (few) candidates.

    n_planes/bands set the recall/bucket-size trade-off: 16 bits / 4
    bands is sized for this testbed; at 100 TB use 64–128 bits so band
    values spread buckets (bucket join cost is Σ|bucket|²), and raise
    bits-per-band to keep per-band collision probability ~p^bits.

    Returns (vec_id_a, vec_id_b, cos_sim), exact-verified.
    """
    sigs = lsh_band_signatures(
        embeddings, n_planes, bands, id_col, vec_col, dim
    )
    left = sigs.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        "band_id",
        "band_val",
    )
    right = sigs.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        "band_id",
        "band_val",
    )
    candidates = left.join(right, ["band_id", "band_val"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    # Cosine runs map-side BEFORE the pair dedup: a pair colliding in k
    # bands computes the (cheap, deterministic — so bit-identical every
    # time) fold up to k times, but the dedup shuffle then carries three
    # scalars per row instead of two 64-double vectors, and the
    # threshold filter discards non-near pairs pre-shuffle. At 100 TB
    # the shuffle is the bottleneck, not the fold.
    return (
        candidates.select(
            F.col("id_a").alias("vec_id_a"),
            F.col("id_b").alias("vec_id_b"),
            cosine(as_double_array("vec_a"), as_double_array("vec_b")).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_id_a", "vec_id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .distinct()
    )


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column — the
    standard 4× vector-compression step before ANN serving at scale:
    per-vector scale = 127 / max|x|, q_i = clamp(round(x_i·scale)).

    All codegen array lambdas (zero shuffles, scan-bound at any corpus
    size). Returns per-vector audit columns chosen for cross-engine
    exactness: the quantized-value checksum and saturation count are
    pure integer arithmetic (bit-identical in any engine), and the
    squared reconstruction error is summed as femto-scaled INTEGERS
    (floor(err·10¹⁵ + 0.5) per dimension) — an exact, order-independent
    sum with no per-step decimal rounding to diverge between engines.
    Rounding uses floor(x+0.5) throughout, identical in Spark and
    DuckDB (double `round` half-away ties differ between engines;
    floor does not).
    """
    x = let(
        F.col(vec_col),
        lambda raw: F.transform(raw, lambda v: v.cast("double")),
    )

    def _body(xs):
        max_abs = F.array_max(F.transform(xs, F.abs))
        scale = F.lit(127.0) / max_abs
        q = F.transform(
            xs,
            lambda v: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(v * scale + F.lit(0.5)).cast("int")),
            ),
        )
        err_femto = F.zip_with(
            xs,
            q,
            lambda v, qi: F.floor(
                (v - qi.cast("double") / scale)
                * (v - qi.cast("double") / scale)
                * F.lit(1e15)
                + F.lit(0.5)
            ).cast("long"),
        )
        return F.struct(
            max_abs.alias("max_abs"),
            F.aggregate(
                q, F.lit(0).cast("long"), lambda a, b: a + b
            ).alias("q_checksum"),
            F.size(F.filter(q, lambda v: F.abs(v) == 127)).alias(
                "n_saturated"
            ),
            F.aggregate(
                err_femto, F.lit(0).cast("long"), lambda a, e: a + e
            ).alias("sq_err_femto"),
        )

    out = let(x, _body)
    return emb.select(
        F.col(id_col),
        F.size(vec_col).cast("long").alias("n_dims"),
        out["max_abs"].alias("max_abs"),
        out["q_checksum"].cast("long").alias("q_checksum"),
        out["n_saturated"].cast("long").alias("n_saturated"),
        out["sq_err_femto"].cast("long").alias("sq_err_femto"),
    )


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    m: int = 4,
    sublen: int = 16,
    n_codes: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN top-k (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") — the memory-side scale
    path that completes the family next to IVF (compute-side pruning)
    and LSH (candidate pruning): each vector is compressed to ``m``
    codebook indices (here 4 × 1 byte ≈ 64× smaller than 64 raw
    floats), and queries rank neighbors by Asymmetric Distance
    Computation — sum over subspaces of the precomputed
    dot(query_subvector, codeword) table — never touching raw corpus
    vectors at query time.

    Deterministic contract (the ivf_topk convention): codebooks are the
    first ``n_codes`` corpus vectors' subvectors (k-means training is
    the separate offline concern kmeans_lloyd covers), assignment is
    argmax inner product with ties to the smallest code, and the ADC
    score is an exact-decimal sum of per-subspace fold dots — so a SQL
    oracle reproduces the ranking bit-for-bit.

    Plan shape: codebook and query tables are broadcast (m·n_codes and
    |probes|·m·n_codes rows); encoding is a broadcast join + one slim
    groupBy (m rows per vector: id, subspace, dot, code); scoring joins
    codes to the broadcast ADC table and aggregates m·|probes| slim
    rows per vector. No shuffle ever carries an embedding — after
    encoding, only codes move."""
    emb = _with_unit_info(fan_out(corpus), vec_col)

    def subspaces(df: DataFrame, out_id: str) -> DataFrame:
        parts = F.array(
            *[
                F.struct(
                    F.lit(j).alias("subspace"),
                    F.slice("_vec", j * sublen + 1, sublen).alias("sub"),
                )
                for j in range(m)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id), F.explode(parts).alias("s")
        ).select(out_id, "s.subspace", "s.sub")

    cb = subspaces(
        emb.filter(F.col(id_col) < n_codes), "code"
    ).select("subspace", "code", F.col("sub").alias("cvec"))

    corp = subspaces(emb, "neighbor_id")
    enc = (
        corp.join(F.broadcast(cb), "subspace")
        .select(
            "neighbor_id",
            "subspace",
            "code",
            dot_fold(F.col("sub"), F.col("cvec")).alias("d"),
        )
        .groupBy("neighbor_id", "subspace")
        .agg(
            F.max(
                F.struct(F.col("d"), (-F.col("code")).alias("nc"))
            ).alias("best")
        )
        .select("neighbor_id", "subspace", (-F.col("best.nc")).alias("code"))
    )

    qtab = (
        subspaces(
            _with_unit_info(probes, vec_col), "query_id"
        )
        .join(F.broadcast(cb), "subspace")
        .select(
            "query_id",
            "subspace",
            "code",
            dot_fold(F.col("sub"), F.col("cvec")).alias("qdot"),
        )
    )

    scores = (
        enc.join(F.broadcast(qtab), ["subspace", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(dsum("qdot").alias("adc_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_score")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    probe_every: int = 97,
    k: int = 5,
    n_planes: int = N_HYPERPLANES,
    bands: int = LSH_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors with built-in recall
    evaluation — the third ANN strategy next to IVF (ivf_topk) and PQ
    (pq_ann_topk): no training pass at all, just the hyperplane
    signatures both it and the near-dup join share
    (lsh_band_signatures).

    Search: a probe's candidates are exactly the vectors agreeing with
    it on ALL bits of at least one band — an equi-join on
    (band_id, band_val), never a corpus scan per probe. Exact cosine
    re-ranks the candidates; top-k by (rounded cosine desc, id). The
    returned frame scores each probe: candidate-set size (the cost
    knob — E[|candidates|] ≈ n·(1-(1-p^bits)^bands)) and recall@k
    against the brute-force exact top-k, which a 100-TB deployment
    computes on a sampled probe set exactly like this (the brute-force
    side broadcasts the probes, never the corpus).

    Returns (probe_id, n_candidates, recall_at_k)."""
    sigs = lsh_band_signatures(
        embeddings, n_planes, bands, id_col, vec_col, dim
    ).localCheckpoint(eager=True)  # probes + corpus side read it once

    probes = sigs.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_vp"),
        "band_id",
        "band_val",
    ).filter(F.col("probe_id") % probe_every == 0)
    cand = (
        probes.join(
            sigs.select(
                F.col(id_col).alias("cand_id"),
                F.col(vec_col).alias("_vc"),
                "band_id",
                "band_val",
            ),
            ["band_id", "band_val"],
        )
        .filter(F.col("cand_id") != F.col("probe_id"))
        # cosine BEFORE the pair dedup: the distinct shuffle then
        # carries 3 scalars, not two dim-double vectors (same reasoning
        # as hyperplane_lsh_pairs)
        .select(
            "probe_id",
            "cand_id",
            F.round(
                cosine(as_double_array("_vp"), as_double_array("_vc")), 6
            ).alias("cs"),
        )
        .distinct()
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cs").desc(), F.col("cand_id")
    )
    lsh_top = cand.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    ncand = cand.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )

    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("_v")
    )
    probe_vecs = vecs.filter(F.col("vec_id") % probe_every == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("_v").alias("_vp")
    )
    exact_top = (
        F.broadcast(probe_vecs)
        .join(vecs, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("_vp"), F.col("_v")), 6).alias("cs"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    hits = (
        lsh_top.select("probe_id", "cand_id")
        .join(exact_top.select("probe_id", "cand_id"), ["probe_id", "cand_id"])
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("_n_hit"))
    )
    return (
        ncand.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            "n_candidates",
            (
                F.coalesce(F.col("_n_hit"), F.lit(0)).cast("double") / k
            ).alias(f"recall_at_{k}"),
        )
    )


def jl_distortion_pairs(
    embeddings: DataFrame,
    m: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss sign (Rademacher) random projection
    (Achlioptas 2003: entries ±1 preserve inner products in
    expectation) from the native dimension down to ``m``, audited by
    comparing original vs projected cosine on consecutive-id pairs —
    the dimensionality-reduction step that shrinks ANN index footprint
    4× before banding/bucketing.

    Determinism contract: inputs are micro-quantized to BIGINTs
    (floor(x · 2^20)) before ANY arithmetic, the sign matrix is the
    portable md5 hash of (out_dim, in_dim), and every dot product /
    squared norm is an exact integer SUM — so both cosines, and the
    distortion, are bit-identical in a DuckDB oracle. Norm products
    are cast to double BEFORE multiplying (na·nb overflows int64).

    Scale shape: the projection is explode(dim) ⋈ broadcast(sign
    matrix, m·dim rows) → partial-aggregated groupBy(id, out_dim) —
    one shuffle of m rows per vector, no corpus pairing; the audit
    pairs join on adjacent ids (equi-join, 1:1). Returns one audit row:
    (n_pairs, sum_abs_err_nano, max_abs_err_nano).
    """
    x = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(vec_col).alias("i", "xf"),
        )
        .select(
            "vec_id",
            "i",
            F.floor(F.col("xf").cast("double") * F.lit(1048576.0))
            .cast("bigint")
            .alias("xq"),
        )
    )
    dim = len(embeddings.select(vec_col).first()[0])
    signs = (
        embeddings.sparkSession.range(m * dim)
        .select(
            (F.col("id") / dim).cast("bigint").alias("j"),
            (F.col("id") % dim).cast("bigint").alias("i"),
        )
        .select(
            "j",
            "i",
            F.when(
                md5_long(
                    F.concat_ws(
                        "_",
                        F.lit("jl#"),
                        F.col("j").cast("string"),
                        F.col("i").cast("string"),
                    )
                )
                % 2
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sign"),
        )
    )
    proj = (
        x.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("sign") * F.col("xq")).alias("yq"))
    )

    def _pair_cos(df: DataFrame, dim_key: str, val: str) -> DataFrame:
        a = df.filter(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("pair_id"),
            F.col(dim_key).alias("d"),
            F.col(val).alias("va"),
        )
        b = df.filter(F.col("vec_id") % 2 == 1).select(
            (F.col("vec_id") - 1).alias("pair_id"),
            F.col(dim_key).alias("d"),
            F.col(val).alias("vb"),
        )
        return (
            a.join(b, ["pair_id", "d"])
            .groupBy("pair_id")
            .agg(
                F.sum(F.col("va") * F.col("vb")).alias("dot"),
                F.sum(F.col("va") * F.col("va")).alias("na"),
                F.sum(F.col("vb") * F.col("vb")).alias("nb"),
            )
            .select(
                "pair_id",
                (
                    F.col("dot").cast("double")
                    / F.sqrt(
                        F.col("na").cast("double") * F.col("nb").cast("double")
                    )
                ).alias("cos"),
            )
        )

    orig = _pair_cos(x, "i", "xq").withColumnRenamed("cos", "cos_orig")
    pj = _pair_cos(proj, "j", "yq").withColumnRenamed("cos", "cos_proj")
    err_nano = F.floor(
        F.abs(F.col("cos_orig") - F.col("cos_proj")) * F.lit(1e9)
    ).cast("bigint")
    return (
        orig.join(pj, "pair_id")
        .select(err_nano.alias("e"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("e").alias("sum_abs_err_nano"),
            F.max("e").alias("max_abs_err_nano"),
        )
    )


def anisotropy_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> DataFrame:
    """One-row embedding-space collapse diagnostics from the exact
    (scaled-integer) covariance second-moment matrix: participation
    ratio trace(C)²/‖C‖²_F — the effective number of dimensions the
    representation actually uses (RankMe-family metric, Garrido et al.
    2023; PR = d for isotropic embeddings, → 1 under dimensional
    collapse) — plus the dominant-variance dimension and the
    off-diagonal Frobenius share (0 for axis-aligned/whitened spaces).
    A training pipeline watches these to catch embedding collapse and
    un-whitened drift before ANN recall quietly degrades.

    Scale shape — the reason this is mapInPandas and not a d²-explode:
    each Arrow batch is reduced IN PLACE to one d×d partial Gram
    (Qᵀ Q, int64 matmul), a column-sum vector, and a row count — so
    the shuffle carries O(batches · d²) tiny integer rows instead of
    O(n · d²) exploded pairs; the only wide operation is a groupBy
    over ≤ d(d+1)/2 + d + 1 keys. Everything after the partial-sum
    merge is driver-bounded metadata (d² values).

    Determinism contract: components quantize to floor(x·scale + 0.5)
    BIGINTs before any arithmetic (floor, not round — double
    round-half ties differ between engines), all Gram/covariance
    entries are exact integer sums (DECIMAL(38,0) here, HUGEINT in the
    DuckDB oracle — both exact), and the three reported ratios are
    single double divisions of identical integers, rounded to 6 dp.
    With E = n·C_scaled, PR and the shares are scale-invariant, so no
    de-scaling division ever happens: E_ij = n·G_ij − s_i·s_j stays
    integer end-to-end.

    Exactness bound (and loud failure beyond it): |E_ij| ≤ 2n²s²X²
    for component bound X (≈1 for normalized embeddings), so the
    Frobenius accumulator Σ(2−δ)·E² ≤ 4d²n⁴s⁴X⁴ must fit in
    DECIMAL(38,0). At the default scale s=10⁴ that caps n around 10⁵
    vectors (d=16, X=1); past it Spark's non-ANSI decimal overflow
    would return NULL *silently*, so the plan carries an
    ``assert_true`` guard that fails the job instead of emitting a
    null-poisoned ratio. Remedy at larger n: pass a smaller ``scale``
    — PR and both shares are scale-invariant, and s=10² admits n
    up to ~10⁷ at the cost of quantization (not summation) precision.
    The DuckDB twin needs no guard: HUGEINT overflow errors loudly.
    """
    import pandas as pd

    spark = embeddings.sparkSession

    def _partial_gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["_vec"].to_numpy()).astype("float64")
            q = np.floor(x * float(scale) + 0.5).astype("int64")
            g = q.T @ q
            s = q.sum(axis=0)
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            out = pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu, np.arange(d), np.array([-1])]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [ju, np.full(d, -1), np.array([-1])]
                    ).astype("int32"),
                    "v": np.concatenate(
                        [g[iu, ju], s, np.array([len(pdf)])]
                    ).astype("int64"),
                }
            )
            yield out

    partials = (
        embeddings.select(as_double_array(vec_col).alias("_vec"))
        .mapInPandas(_partial_gram, schema="i int, j int, v long")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=True)  # ≤ d(d+1)/2 + d + 1 rows
    )
    n_row = partials.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    s_rows = partials.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("v").alias("s")
    )
    g_rows = partials.filter(F.col("j") >= 0)

    dec = "decimal(38,0)"
    si = s_rows.select(F.col("d").alias("i"), F.col("s").alias("s_i"))
    sj = s_rows.select(F.col("d").alias("j"), F.col("s").alias("s_j"))
    e = (
        g_rows.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            "i",
            "j",
            (
                F.col("n").cast(dec) * F.col("v").cast(dec)
                - F.col("s_i").cast(dec) * F.col("s_j").cast(dec)
            ).alias("e"),
        )
    )
    diag = F.when(F.col("i") == F.col("j"), F.lit(1)).otherwise(F.lit(0))
    agg = e.agg(
        F.sum(F.when(F.col("i") == F.col("j"), F.col("e"))).alias("trace"),
        F.sum(
            (F.lit(2) - diag).cast(dec) * F.col("e") * F.col("e")
        ).alias("frob2"),
        F.sum(
            F.when(F.col("i") == F.col("j"), F.col("e") * F.col("e"))
        ).alias("diag2"),
        F.max(F.when(F.col("i") == F.col("j"), F.col("e"))).alias("max_var"),
        F.min(
            F.when(
                F.col("i") == F.col("j"), F.struct(F.negate(F.col("e")), "i")
            )
        )["i"].alias("top_var_dim"),
        (F.max(F.greatest("i", "j")) + 1).alias("dim"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    # Loud overflow guard (see docstring): a NULL frob2 with data
    # present means the DECIMAL(38,0) accumulator overflowed — fail
    # the job rather than ship null-poisoned ratios. assert_true
    # returns NULL on success, so the filter keeps every valid row.
    # (dim IS NULL ⇔ no input rows at all — the empty-corpus agg row is
    # legitimately all-null and is dropped by the n_row crossJoin below)
    agg = agg.filter(
        F.assert_true(
            F.col("frob2").isNotNull() | F.col("dim").isNull(),
            F.lit(
                "anisotropy_stats: DECIMAL(38,0) overflow in the "
                "Frobenius accumulator — n too large for the chosen "
                "scale; rerun with a smaller scale (PR is "
                "scale-invariant)"
            ),
        ).isNull()
    )
    return agg.crossJoin(F.broadcast(n_row)).select(
        F.col("n").cast("long").alias("n_vectors"),
        F.col("dim").cast("int").alias("dim"),
        F.round(dbl("trace") * dbl("trace") / dbl("frob2"), 6).alias(
            "participation_ratio"
        ),
        F.col("top_var_dim").cast("long").alias("top_var_dim"),
        F.round(dbl("max_var") / dbl("trace"), 6).alias("top_var_share"),
        F.round(
            (dbl("frob2") - dbl("diag2")) / dbl("frob2"), 6
        ).alias("offdiag_frob_share"),
    )


def hard_negative_mining(
    embeddings: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Triplet mining for contrastive training (FaceNet, Schroff et al.
    2015): for every anchor, the hardest positive (lowest-similarity
    same-label vector — the pull that's hardest to satisfy) and the
    hardest negative (highest-similarity different-label vector — the
    push that's hardest to satisfy), plus the triplet margin between
    them. Batches mined where margin ≤ 0 are the ones worth training
    on; a curation pipeline runs this to build triplet manifests.

    Scale shape: identical to the exact-ANN baseline — anchors are
    broadcast, the corpus streams once, and the per-anchor argmax/argmin
    fold happens in ONE partial-aggregated groupBy (no top-k window, no
    second scan). Cosines are rounded to 6 dp BEFORE the arg-extremum
    so the (cos, id) tie order is engine-independent.
    """
    a = _with_unit_info(anchors, vec_col).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col("_vec").alias("_avec"),
    )
    c = _with_unit_info(fan_out(embeddings), vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col("_vec").alias("_cvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            F.round(
                cosine(F.col("_avec"), F.col("_cvec")), 6
            ).alias("c6"),
        )
    )
    same = F.col("cand_label") == F.col("anchor_label")
    # arg-extremum as struct extrema: ties break toward the smaller
    # cand_id on both sides (negated id under max)
    pos = F.min(
        F.when(same, F.struct(F.col("c6").alias("c"), F.col("cand_id").alias("i")))
    )
    neg = F.max(
        F.when(
            ~same,
            F.struct(F.col("c6").alias("c"), F.negate(F.col("cand_id")).alias("ni")),
        )
    )
    return (
        scored.groupBy("anchor_id", "anchor_label")
        .agg(pos.alias("p"), neg.alias("n"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("p.i").alias("hard_pos_id"),
            F.col("p.c").alias("hard_pos_cos"),
            F.negate(F.col("n.ni")).alias("hard_neg_id"),
            F.col("n.c").alias("hard_neg_cos"),
            F.round(F.col("p.c") - F.col("n.c"), 6).alias("triplet_margin"),
        )
    )


def embedding_dimension_drift(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_k: int = 10,
) -> DataFrame:
    """Per-DIMENSION drift between two deterministic halves of an
    embedding corpus — the embedding-space sibling of ``drift.psi``:
    when the upstream encoder, preprocessing, or data mix shifts, the
    first detectable symptom is a handful of dimensions whose means
    move, and a per-dimension Welch z-score table localizes WHICH
    dimensions moved before any downstream ANN-recall or
    cluster-assignment metric degrades. The halves are the even/odd
    id split (a stand-in for the before/after snapshot columns a real
    monitor would feed; on an undrifted corpus the z-scores certify
    the null).

    Registered in round 10 as ``embed_dimension_drift`` (two-scale
    oracle lock in tests/test_staged_oracles.py).

    Determinism contract: each component is MICRO-QUANTIZED up front —
    xq = round(x*1e6) as BIGINT — so the per-dimension sums and sums
    of squares are pure integer arithmetic (order-independent and
    bit-identical on any engine; a DECIMAL(30,10) accumulation of raw
    doubles would hit the engine-divergent double→decimal rounding the
    CUSUM work documented). The z-score

        z_d = (mB - mA) / sqrt(vA/nA + vB/nB),  v = ss/n - (s/n)^2

    is ONE fixed-order double expression over those exact integer sums
    computed entirely in micro-units (z is scale-invariant), so the
    table — and the (|z| DESC, dim ASC) top-k order, taken on the
    6-dp-rounded score — hash-matches a SQL replay exactly. Integer
    headroom: |xq| <= 1e6·max|x|, so an int64 Σ xq² would wrap
    SILENTLY (non-ANSI Spark) past ~10⁷ unit-norm rows per half —
    the two square-sums therefore accumulate as DECIMAL(38,0) (each
    per-element product still fits int64 up to |x| ~ 3e3; the SUM is
    where the headroom dies), pushing the limit past 10²⁵ rows with
    no runtime guard needed. The decimal→double cast at the end is
    value-identical to the int64 path wherever both are exact.

    Scale shape: posexplode is a narrow in-row expansion (dim x rows,
    no Python); ONE map-side-combined groupBy on the dimension id (2d
    partial aggregates of 6 BIGINTs each); everything after is
    d-row-sized. Returns top_k rows: (dim, n_a, n_b, mean_a, mean_b,
    z_score) ordered by |z| descending.
    """
    is_a = (F.col(id_col) % 2 == 0).alias("_is_a")
    exploded = emb.select(
        is_a, F.posexplode(as_double_array(vec_col)).alias("dim", "_x")
    ).select(
        "_is_a",
        "dim",
        F.round(F.col("_x") * 1e6).cast("long").alias("_xq"),
    )
    per_dim = exploded.groupBy("dim").agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_is_a"), F.col("_xq"))).alias("s_a"),
        F.sum(F.when(~F.col("_is_a"), F.col("_xq"))).alias("s_b"),
        F.sum(
            F.when(
                F.col("_is_a"),
                (F.col("_xq") * F.col("_xq")).cast("decimal(38,0)"),
            )
        ).alias("ss_a"),
        F.sum(
            F.when(
                ~F.col("_is_a"),
                (F.col("_xq") * F.col("_xq")).cast("decimal(38,0)"),
            )
        ).alias("ss_b"),
    )
    # all in micro-units, one fixed operation order (z is invariant)
    mean_a = F.col("s_a").cast("double") / F.col("n_a").cast("double")
    mean_b = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    var_a = (
        F.col("ss_a").cast("double") / F.col("n_a").cast("double")
        - mean_a * mean_a
    )
    var_b = (
        F.col("ss_b").cast("double") / F.col("n_b").cast("double")
        - mean_b * mean_b
    )
    denom = F.sqrt(
        var_a / F.col("n_a").cast("double")
        + var_b / F.col("n_b").cast("double")
    )
    z = F.when(denom > 0, F.round((mean_b - mean_a) / denom, 6)).otherwise(
        F.lit(0.0)
    )
    return (
        per_dim.select(
            "dim",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(mean_a / F.lit(1e6), 6).alias("mean_a"),
            F.round(mean_b / F.lit(1e6), 6).alias("mean_b"),
            z.alias("z_score"),
        )
        .orderBy(F.abs(F.col("z_score")).desc(), F.col("dim").asc())
        .limit(top_k)
    )


def centroid_outliers(
    emb: DataFrame,
    k: int = 10,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space OUTLIER shortlist: each vector's cosine to its
    OWN label's centroid, bottom-k — the quality filter the embedding
    family was missing: a vector far from its label centroid is a
    mislabel, a garbage/degenerate embedding, or genuinely novel
    content, and the bottom-of-the-list is what a curation pass sends
    to review or prunes before centroid-seeded training (the same
    signal SemDeDup uses at the top of the list to prune redundancy,
    read from the other end).

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: centroids come from ``label_centroids``'s exact
    integer mean (micro-quantized components, one fixed-order double
    finish per dimension); the centroid array is assembled in
    dimension order (array_sort on (dim, val) structs — collect order
    can't leak); the cosine is the shared sequential-fold form
    (``functions.cosine``), rounded to 6 dp BEFORE the
    (cos ASC, id ASC) bottom-k — a cross-engine total order.

    Scale shape: the centroid table is labels × dims (a true
    dimension — broadcast unconditionally), the corpus is scanned once
    for the centroid aggregate and once for the scoring pass, and the
    bottom-k is TakeOrderedAndProject. Returns k rows:
    (vec_id, label, cos_to_centroid) most-anomalous first.
    """
    cent = label_centroids(emb)
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "centroid_val"))),
            lambda s: s["centroid_val"],
        ).alias("_cvec")
    )
    scored = (
        _with_unit_info(fan_out(emb), vec_col)
        .select(
            F.col(id_col), F.col(label_col).alias("label"), F.col("_vec")
        )
        .join(F.broadcast(carr), "label")
        .select(
            F.col(id_col),
            "label",
            F.round(cosine(F.col("_vec"), F.col("_cvec")), 6).alias(
                "cos_to_centroid"
            ),
        )
    )
    return scored.orderBy(
        F.asc("cos_to_centroid"), F.asc(id_col)
    ).limit(k)


def norm_profile(emb: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-label NORM profile of the embedding column — the
    norm-collapse / norm-explosion tripwire an embedding pipeline
    checks before any cosine-based stage: RMS norm and the spread of
    the SQUARED norm per label, plus the count of vectors beyond
    ``z`` standard deviations on each side. A label whose norms
    collapse toward 0 (dead encoder), blow up (missing
    normalization), or bimodalize (mixed encoder versions — the
    n_low/n_high tails light up together) will poison every
    downstream dot product while passing row-count checks; the
    per-DIMENSION view (``embedding_dimension_drift``) cannot see it
    because norms live across dimensions.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract — and why the profile lives on the SQUARED
    norm: ‖x‖² accumulates per element as pico-quantized integers
    (floor(x²·1e12 + 0.5), exact long sum in array order), so every
    per-label moment is a sum of EXACT INTEGERS (Σpico as decimal;
    Σpico² via exact decimal(19,0)² products) and the mean/std tree
    is fixed-order doubles over exact operands — no double→decimal
    quantization anywhere, which matters because a unit-normalized
    corpus has std(‖x‖) ~1e-6: any 10-dp decimal waypoint floors the
    signal and the two engines' cast-rounding modes diverge in the
    last digit. Tail thresholds compare the exact pico integers
    against that identical double tree. 6-dp rounding on the reported
    moments only.

    Scale shape: one narrow per-row fold, ONE map-side-combined
    groupBy(label) for the moments, and one label-co-shuffled
    equi-join back (label-count-sized stats table — AQE broadcasts it
    on its own) for the tail counts. No windows, no hint broadcasts,
    no collects. Returns one row per label:
    (label, n_vecs, rms_norm, std_norm2, n_low, n_high), ordered —
    rms_norm = sqrt(E[‖x‖²]), std_norm2 = std(‖x‖²) in norm² units.
    """
    xs = as_double_array(F.col("embedding"))
    norm2_pico = F.aggregate(
        F.transform(
            xs,
            lambda x: F.floor(x * x * F.lit(1e12) + F.lit(0.5)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    rows = emb.select("label", norm2_pico.alias("_pico"))
    pd = F.col("_pico").cast("decimal(19,0)")
    stats = rows.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(pd).alias("_s1"),
        F.sum(pd * pd).alias("_s2"),
    )
    n = F.col("n_vecs").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mu = s1 / n
    sig = F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0)))
    stats = stats.select(
        "label", "n_vecs", mu.alias("_mu"), sig.alias("_sig")
    )
    tails = (
        rows.join(stats, "label")
        .groupBy("label")
        .agg(
            F.sum(
                (
                    F.col("_pico").cast("double")
                    < F.col("_mu") - F.lit(z) * F.col("_sig")
                ).cast("long")
            )
            .cast("long")
            .alias("n_low"),
            F.sum(
                (
                    F.col("_pico").cast("double")
                    > F.col("_mu") + F.lit(z) * F.col("_sig")
                ).cast("long")
            )
            .cast("long")
            .alias("n_high"),
        )
    )
    return (
        stats.join(tails, "label")
        .select(
            "label",
            "n_vecs",
            F.round(F.sqrt(F.col("_mu") / F.lit(1e12)), 6).alias("rms_norm"),
            F.round(F.col("_sig") / F.lit(1e12), 6).alias("std_norm2"),
            "n_low",
            "n_high",
        )
        .orderBy("label")
    )


def pair_cosine_profile(
    embeddings: DataFrame,
    n_buckets: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """RANDOM-PAIR cosine profile of an embedding space: pair vectors
    deterministically (salted-md5 bucket, md5-ranked within bucket,
    consecutive ranks pair up — every vector used at most once, no
    all-pairs anything) and report the exact cosine histogram in 0.1
    bins plus the mean. This is the direct EVIDENCE card for the
    anisotropy the RankMe/Gram metrics summarize spectrally
    (Ethayarajh 2019: contextual embedding spaces are anisotropic —
    random-pair cosine far above 0): a mean-cosine near 0 says the
    space is usable as-is for cosine thresholds; a high floor says
    every similarity threshold downstream (SemDeDup, near-dup cosine)
    is sitting on a biased scale and needs centering first.

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: the pairing is pure salted md5 (bucket AND in-bucket
    rank order), so both engines form the IDENTICAL pair set; each
    pair's cosine is the deterministic fold (functions.cosine ≡ the
    oracle's list_reduce twin — the dedup_embedding_cosine contract);
    bins are floor(cos·10) clamped to [−10, 9] on bit-identical
    doubles; the mean accumulates micro-quantized longs. Odd vectors
    out (the last rank in an odd-sized bucket) simply don't pair.

    Scale shape: ONE hash-partitioned window (partitioned by the
    md5 bucket — ``n_buckets`` is the explicit partition-size knob:
    raise it with corpus size so a bucket stays executor-sized, the
    documented contract), one co-keyed self-join on (bucket, pair),
    one map-side-combined 20-bin histogram (bins floor(cos·10)
    clamped to [−10, 9]: cos = 1.0 folds into the top bin 9 — r13
    ADVICE, the docstring previously said 21). Nothing all-pairs,
    nothing broadcast, nothing collected. Returns one row per
    occupied bin: (bin, bin_lo, n_pairs, n_pairs_total, mean_cosine),
    bin-ordered.
    """
    from etl_developstoday_test_spark.functions import cosine, md5_long

    if n_buckets < 1:
        raise ValueError("pair_cosine_profile: n_buckets must be >= 1")
    h = md5_long(F.concat(F.lit("pc#"), F.col(id_col).cast("string")))
    ranked = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        (h % n_buckets).alias("_b"),
        h.alias("_h"),
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_b").orderBy("_h", "_id")
        ),
    ).select(
        "_b",
        F.expr("(_rn - 1) div 2").alias("_pid"),
        (F.col("_rn") % 2).alias("_side"),
        "_v",
    )
    left = ranked.filter(F.col("_side") == 1).select(
        "_b", "_pid", F.col("_v").alias("_va")
    )
    right = ranked.filter(F.col("_side") == 0).select(
        "_b", "_pid", F.col("_v").alias("_vb")
    )
    cos = cosine(F.col("_va"), F.col("_vb"))
    scored = (
        left.join(right, ["_b", "_pid"])
        .select(
            F.least(
                F.lit(9), F.greatest(F.lit(-10), F.floor(cos * 10))
            )
            .cast("long")
            .alias("bin"),
            F.floor(cos * F.lit(1e6) + F.lit(0.5)).cast("long").alias("_cq"),
        )
    )
    hist = (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("_cq").alias("_s"),
        )
        .localCheckpoint(eager=True)  # bounded: 21 bins
    )
    audit = hist.agg(
        F.sum("n_pairs").cast("long").alias("n_pairs_total"),
        F.round(
            F.sum("_s").cast("double")
            / F.lit(1e6)
            / F.sum("n_pairs").cast("double"),
            6,
        ).alias("mean_cosine"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "bin",
            F.round(F.col("bin").cast("double") / 10.0, 6).alias("bin_lo"),
            "n_pairs",
            "n_pairs_total",
            "mean_cosine",
        )
        .orderBy("bin")
    )


def centroid_shift_profile(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group CENTROID SHIFT card: each group's mean vector
    compared to the global mean vector — L2 distance and cosine — the
    embedding-space analogue of PSI: "did THIS source/label/day drift
    away from the corpus center", the between-group companion to
    embed_dimension_drift (per-dimension two-sample z) and the
    cluster-level complement of the anisotropy cards. A group whose
    centroid walks off-center is exactly the one whose cosine
    thresholds (SemDeDup, ANN recall) silently degrade first.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: components are NANO-QUANTIZED (round(v·1e9) as long —
    unit-normalized embeddings make 1e9 the natural scale) and summed
    through decimal(38,0), so per-(group, dim) sums are exact and
    partitioning-independent; the GLOBAL centroid derives from the
    per-group sums table (one corpus pass total — never a second
    scan); centroid components are then fixed-expression doubles, and
    the cross-dimension reductions (dot, norms, squared distance)
    accumulate each per-dim double term through the decimal summator
    (order-independent); sqrt is IEEE-correctly-rounded; 6-dp
    rounding. NaN components are excluded row-wise (documented).

    Scale shape: ONE posexplode collapsed map-side to the
    (groups × dims)-bounded sums table (localCheckpointed — it feeds
    the global rollup AND the per-group reductions); everything after
    is bounded-table arithmetic with 1-row/byte-sized broadcasts.
    Returns one row per group: (group, n_vecs, l2_shift,
    cosine_to_global), group-ordered.
    """
    # floor(v·1e9 + 0.5): components are signed — floor is exact on
    # every engine where round() half-cases are not
    vq = F.floor(F.col("_v") * F.lit(1e9) + F.lit(0.5)).cast("long")
    exploded = embeddings.select(
        F.col(group_col).alias("g"),
        F.posexplode(as_double_array(F.col(vec_col))).alias("dim", "_v"),
    ).filter(~F.isnan(F.col("_v")))
    per = (
        exploded.groupBy("g", "dim")
        .agg(
            F.sum(vq.cast("decimal(38,0)")).alias("_sq"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
        .localCheckpoint(eager=True)  # bounded: groups × dims
    )
    glob = per.groupBy("dim").agg(
        F.sum("_sq").cast("decimal(38,0)").alias("_gsq"),
        F.sum("_n").cast("long").alias("_gn"),
    )
    j = per.join(glob, "dim")
    cg = F.col("_sq").cast("double") / F.lit(1e9) / F.col("_n").cast("double")
    cd = (
        F.col("_gsq").cast("double") / F.lit(1e9) / F.col("_gn").cast("double")
    )
    acc = lambda e: F.sum(e.cast(ACC_DECIMAL))  # noqa: E731
    red = j.groupBy("g").agg(
        F.max("_n").cast("long").alias("n_vecs"),
        acc(cg * cd).alias("_dot"),
        acc(cg * cg).alias("_na"),
        acc(cd * cd).alias("_nb"),
        acc((cg - cd) * (cg - cd)).alias("_l2"),
    )
    return red.select(
        F.col("g").alias("group"),
        "n_vecs",
        F.round(F.sqrt(F.col("_l2").cast("double")), 6).alias("l2_shift"),
        F.round(
            F.col("_dot").cast("double")
            / (
                F.sqrt(F.col("_na").cast("double"))
                * F.sqrt(F.col("_nb").cast("double"))
            ),
            6,
        ).alias("cosine_to_global"),
    ).orderBy("group")


def dim_variance_profile(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dead_eps: float = 1e-6,
) -> DataFrame:
    """Per-DIMENSION variance card: each embedding dimension's exact
    mean and variance, its share of the total variance, its variance
    rank, and the corpus-wide dead-dimension count riding every row.
    The DIMENSION-COLLAPSE detector beside the spectral summary —
    embed_anisotropy_rankme compresses the Gram spectrum to one
    effective-rank number, this names WHICH dimensions carry the
    mass and which are dead (variance below ``dead_eps``): an
    encoder whose variance piles into a few dims wastes index bytes
    and breaks the isotropy assumption every cosine threshold in the
    ANN/SemDeDup stack sits on.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: components are nano-quantized (floor(v·1e9 + 0.5)
    as long — the centroid_shift idiom) with Σq and Σq² in exact
    decimal(38,0), so per-dim moments are partitioning-independent;
    variance assembles in a fixed-order double expression
    (greatest(0) clamp); the total-variance denominator accumulates
    the per-dim variance doubles through the decimal summator
    (order-independent); the rank breaks variance ties on the
    SMALLEST dim (total order). NaN components are excluded row-wise
    (documented). var_share reports NULL when total variance is 0
    (all-constant corpus — the ANSI degenerate contract).

    Scale shape: ONE posexplode collapsed map-side to the
    dim-bounded moments table (localCheckpointed — it feeds the
    rank window, the total rollup, and the output); the rank window
    and 1-row audit run over that bounded table. Returns one row per
    dimension: (dim, n, mean, variance, var_share, var_rank,
    n_dead_dims, total_variance), dim-ordered.
    """
    from etl_developstoday_test_spark.functions import as_double_array

    vq = F.floor(F.col("_v") * F.lit(1e9) + F.lit(0.5)).cast("long")
    per = (
        embeddings.select(
            F.posexplode(as_double_array(F.col(vec_col))).alias(
                "dim", "_v"
            )
        )
        .filter(~F.isnan(F.col("_v")))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(vq.cast("decimal(38,0)")).alias("_s1"),
            F.sum(
                (vq.cast("decimal(38,0)") * vq.cast("decimal(38,0)"))
                .cast("decimal(38,0)")
            ).alias("_s2"),
        )
    )
    mean = F.col("_s1").cast("double") / F.lit(1e9) / F.col("n").cast("double")
    var = F.greatest(
        F.col("_s2").cast("double")
        / F.lit(1e18)
        / F.col("n").cast("double")
        - mean * mean,
        F.lit(0.0),
    )
    moments = per.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.round(mean, 6).alias("mean"),
        var.alias("_var"),
    ).localCheckpoint(eager=True)  # bounded: dim domain
    wr = Window.orderBy(F.desc("_var"), F.asc("dim"))
    ranked = moments.select(
        "dim",
        "n",
        "mean",
        "_var",
        F.row_number().over(wr).cast("long").alias("var_rank"),
    )
    audit = moments.agg(
        F.sum(F.col("_var").cast(ACC_DECIMAL)).cast("double").alias("_tv"),
        F.sum(F.when(F.col("_var") < F.lit(float(dead_eps)), 1).otherwise(0))
        .cast("long")
        .alias("n_dead_dims"),
    )
    return (
        ranked.crossJoin(F.broadcast(audit))
        .select(
            "dim",
            "n",
            "mean",
            F.round(F.col("_var"), 6).alias("variance"),
            F.when(
                F.col("_tv") > 0,
                F.round(F.col("_var") / F.col("_tv"), 6),
            ).alias("var_share"),
            "var_rank",
            "n_dead_dims",
            F.round(F.col("_tv"), 6).alias("total_variance"),
        )
        .orderBy("dim")
    )


def intra_cluster_tightness(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    loose_threshold: float = 0.5,
) -> DataFrame:
    """Per-group INTRA-CLUSTER tightness: each vector's cosine to its
    OWN group centroid, rolled up per group to the exact mean cosine,
    the minimum, and the share of members below ``loose_threshold``.
    The WITHIN-group companion to centroid_shift_profile's
    between-group drift: a label can sit perfectly centered (shift
    ~0) while its members scatter so loosely the label carries no
    geometric meaning — this card is the direct evidence for whether
    label-conditioned operations (label centroids as ANN routing
    points, per-label hard-negative mining) have a cluster to stand
    on at all.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: centroids derive from the same nano-quantized
    per-(group, dim) decimal sums as centroid_shift_profile (exact,
    partitioning-independent), assembled into a dim-ordered double
    array; per-vector cosine is the deterministic fold form (the
    shared ``cosine`` helper — identical operation order to the
    oracle's list_reduce); the mean accumulates micro-quantized
    cosine longs; min takes the exact micro minimum. Zero-norm
    vectors or zero-norm centroids yield NULL cosine and are
    excluded from the rollup (documented — the fold's 0/0 guard).

    Scale shape: ONE posexplode pass builds the (groups x dims)
    bounded sums table; centroid arrays assemble group-locally
    (sort_array over the bounded dim list) and BROADCAST onto the
    corpus for the second pass (group-bounded — never a shuffle of
    the vector side beyond its scan); the rollup is ONE
    map-side-combined groupBy(group). Returns one row per group:
    (group, n_vecs, mean_cosine, min_cosine, n_loose, loose_share),
    group-ordered.
    """
    from etl_developstoday_test_spark.functions import as_double_array, cosine

    vq = F.floor(F.col("_v") * F.lit(1e9) + F.lit(0.5)).cast("long")
    per = (
        embeddings.select(
            F.col(group_col).alias("_g"),
            F.posexplode(as_double_array(F.col(vec_col))).alias(
                "dim", "_v"
            ),
        )
        .filter(~F.isnan(F.col("_v")))
        .groupBy("_g", "dim")
        .agg(
            F.sum(vq.cast("decimal(38,0)")).alias("_sq"),
            F.count(F.lit(1)).cast("long").alias("_n"),
        )
    )
    cent = per.groupBy("_g").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("dim").alias("d"),
                        (
                            F.col("_sq").cast("double")
                            / F.lit(1e9)
                            / F.col("_n").cast("double")
                        ).alias("c"),
                    )
                )
            ),
            lambda s: s.getField("c"),
        ).alias("_cent")
    )
    cos = cosine(
        as_double_array(F.col(vec_col)), F.col("_cent")
    )
    # NaN components / zero-norm vectors make the fold cosine NaN —
    # guard BEFORE the long cast (ANSI would raise on NaN->long) so
    # such vectors drop from the rollup, per the documented contract
    scored = (
        embeddings.join(
            F.broadcast(cent),
            embeddings[group_col] == cent["_g"],
        )
        .select(
            F.col("_g"),
            F.when(
                ~F.isnan(cos),
                F.floor(cos * F.lit(1e6) + F.lit(0.5)).cast("long"),
            ).alias("_cq"),
        )
        .filter(F.col("_cq").isNotNull())
    )
    card = scored.groupBy(F.col("_g").alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("_cq").cast("long").alias("_s"),
        F.min("_cq").cast("long").alias("_m"),
        F.sum(
            F.when(
                F.col("_cq")
                < F.floor(
                    F.lit(float(loose_threshold)) * F.lit(1e6) + F.lit(0.5)
                ).cast("long"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_loose"),
    )
    return card.select(
        "group",
        "n_vecs",
        F.round(
            F.col("_s").cast("double")
            / F.lit(1e6)
            / F.col("n_vecs").cast("double"),
            6,
        ).alias("mean_cosine"),
        F.round(F.col("_m").cast("double") / F.lit(1e6), 6).alias(
            "min_cosine"
        ),
        "n_loose",
        F.round(
            F.col("n_loose").cast("double") / F.col("n_vecs").cast("double"),
            6,
        ).alias("loose_share"),
    ).orderBy("group")
