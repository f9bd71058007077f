"""Deterministic hash-based sampling for training-data pipelines.

RNG-based sampling (``df.sample``) is partition-order dependent and
unrepeatable across engines or incremental re-ingests. These operators
assign every row a stable bucket from an md5 hash of its key, so the
sample is a pure function of the data: stable across runs, engines,
partitionings and re-ingests, and verifiable by any engine with md5
(which is how the DuckDB oracles check them exactly). Narrow maps —
zero shuffles until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import ACC_DECIMAL, md5_long

N_BUCKETS = 100


def hash_bucket(key: Column, salt: str = "sample") -> Column:
    """Stable bucket in [0, 100) from an md5 of ``salt # key``."""
    return md5_long(F.concat(F.lit(f"{salt}#"), key.cast("string"))) % N_BUCKETS


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rate_pct: Column,
    salt: str = "strat",
) -> DataFrame:
    """Keep ``rate_pct``% of each stratum, chosen by key hash.

    ``rate_pct`` is a Column so rates can vary per stratum (undersample
    dominant classes, oversample rare ones — the usual class-balancing
    pass before training). Filter is a narrow map; at 100 TB this is
    scan-bound with zero shuffles.
    """
    return df.withColumn("_bucket", hash_bucket(F.col(key_col), salt)).filter(
        F.col("_bucket") < rate_pct
    ).drop("_bucket")


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the standard pretraining
    batch-assembly step: documents are laid out in a deterministic
    order and cut into fixed ``budget``-token training sequences, each
    document assigned to the sequence containing its first token
    (documents may straddle a boundary, exactly like GPT-style packing
    of a concatenated token stream).

    Distribution: a global concatenation order would serialize into one
    partition, so the stream is sharded by a stable md5 hash of doc_id
    into ``n_shards`` independent streams packed in parallel — the
    layout stays a pure function of the data (stable across runs,
    engines, partitionings), and ``n_shards`` scales the parallelism at
    100 TB. ONE shuffle total: the running token sum partitions by
    shard, and the per-sequence rollup reuses that partitioning
    (hash(shard) co-locates every (shard, seq_id) group, so Catalyst
    adds no second exchange).

    Returns one row per packed sequence: (shard, seq_id, n_docs,
    seq_tokens, first_doc_id, last_doc_id).
    """
    from pyspark.sql import Window

    from etl_developstoday_test_spark.functions import let, tokens

    t = docs.select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string")) % n_shards).alias("shard"),
        let(tokens(F.col("text")), lambda x: F.size(x).cast("long")).alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("_cum", F.sum("n_tokens").over(w))
        .withColumn(
            "seq_id",
            F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget)),
        )
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


def mixture_upsample(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "up",
) -> DataFrame:
    """Replicate rows to a per-row target ``weight`` — the epoch-style
    mixture step rate-only sampling can't express: weight 2.3 means
    every row appears twice and 30% of rows (chosen by the stable hash
    uniform, not an RNG) a third time; weight 0.4 downsamples as usual.
    Emits a ``replica`` column (1..n) so downstream shuffles spread the
    copies instead of co-locating them.

    Copies = floor(w) + [u < frac(w)] with u the salted-md5 uniform of
    the id — deterministic across runs, engines, and partitionings.
    Rows with zero copies drop out in the explode. Narrow map: the
    fan-out is an in-row sequence, no shuffle, no join; expected output
    volume is exactly sum(w) rows.

    Spark's ``sequence(a, b)`` counts DOWN when a > b, so the zero-copy
    case must guard to an empty array explicitly (same pitfall as
    word_shingles)."""
    u = (
        md5_long(F.concat(F.lit(f"{salt}#"), F.col(id_col).cast("string")))
        % 10000
    ) / F.lit(10000.0)
    n_copies = (
        F.floor(weight) + F.when(u < weight - F.floor(weight), 1).otherwise(0)
    ).cast("int")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("replica", F.explode(copies))


def fixed_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "fk",
) -> DataFrame:
    """Exactly-k-per-stratum sampling (distributed reservoir): rank
    each stratum's rows by the salted md5 uniform of their id and keep
    the k smallest — the same uniform marginal as reservoir sampling
    but deterministic across runs, engines, and partitionings (an RNG
    reservoir is arrival-order-dependent; a hash rank is not). Strata
    with fewer than k rows keep everything.

    One window shuffle on the stratum key; at 100 TB with heavy strata
    pre-filter with an approximate per-stratum hash-quantile cutoff so
    the window only ranks ~k·ε candidates (the standard top-k-by-key
    reduction). Returns the sampled rows plus their ``sample_rank``.
    """
    from pyspark.sql import Window

    rank_key = md5_long(
        F.concat(F.lit(f"{salt}#"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(
        rank_key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_reservoir_per_stratum(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "res",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per stratum, via the
    Efraimidis–Spirakis exponential-key reservoir (2006): each row
    draws u ∈ (0,1] and ranks by u^(1/w) — equivalently ln(u)/w, the
    monotone form used here — and the top-k keys per stratum are
    EXACTLY a weighted sample without replacement (inclusion ∝ weight,
    sequentially renormalized). The u here is the salted-md5 uniform of
    the row id, so the "random" sample is deterministic across runs,
    engines, and partitionings — same trade as fixed_k_per_stratum,
    which is this operator's unweighted special case.

    One window shuffle on the stratum key; same top-k-by-key reduction
    applies at scale (pre-filter by an approximate per-stratum key
    cutoff so the window ranks ~k·ε candidates). Keys are rounded to
    9 dp BEFORE ranking (cross-engine ln stability) with an id
    tiebreak. Returns the sampled rows plus (es_key, sample_rank).
    """
    from pyspark.sql import Window

    u = (
        md5_long(F.concat(F.lit(f"{salt}#"), F.col(id_col).cast("string")))
        + 1
    ) / F.lit(float(1 << 60))
    w_col = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    es_key = F.round(F.log(u) / w_col, 9)
    win = Window.partitionBy(strata_col).orderBy(
        F.desc("es_key"), F.col(id_col).asc()
    )
    return (
        df.withColumn("es_key", es_key)
        .withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
    )


def temperature_mixture(
    docs: DataFrame,
    group_col: str = "lang",
    alpha_sqrt: bool = True,
    budget_tokens: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture weights over corpus groups — the
    multilingual rebalancing step (Conneau & Lample 2019, XLM eq. 1;
    alpha-smoothed sampling in mT5/XLM-R): a group's sampling weight is
    p_i^alpha / sum_j p_j^alpha, which flattens the head and boosts the
    tail relative to raw token share. alpha = 0.5 here, so the power is
    ``sqrt`` — IEEE-correctly-rounded in every engine, unlike ``pow``,
    which keeps the whole computation bit-reproducible for the oracle.

    Determinism shape: per-group token totals are exact BIGINTs; the
    cross-group normalizer sums pico-quantized weights
    (floor(sqrt(p) * 1e12)) as integers, so no float accumulation
    order leaks in. Outputs are integers (expected tokens under the
    budget, micro-scaled sampling rate) plus the raw token count.

    Scale: one groupBy over the corpus (partial-agg, group cardinality
    = #languages, driver-sized), then scalar math over that tiny frame
    — the single-partition window over groups is bounded by the number
    of languages, never the corpus.
    """
    from etl_developstoday_test_spark.functions import tokens

    per = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all).cast(
        "double"
    )
    per = per.withColumn(
        "w_pico", F.floor(F.sqrt(p) * F.lit(1e12)).cast("bigint")
    )
    share = F.col("w_pico").cast("double") / F.sum("w_pico").over(w_all).cast(
        "double"
    )
    expected = F.floor(share * F.lit(float(budget_tokens))).cast("bigint")
    return per.select(
        "grp",
        "n_docs",
        "n_tokens",
        "w_pico",
        expected.alias("expected_tokens"),
        F.floor(
            expected.cast("double") / F.col("n_tokens").cast("double")
            * F.lit(1e6)
        ).cast("bigint").alias("sample_rate_micro"),
    )


def shard_shuffle_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """WebDataset-style deterministic corpus shuffle: every document is
    assigned a shard by keyed hash and a pseudorandom position WITHIN
    its shard by a second, independent hash — the global shuffle a
    training loader needs, computed without any true randomness so
    every rerun (and every engine) lands every doc in the same place.
    Returns one manifest row per shard: size, payload bytes, the head
    document, and an order-sensitive checksum Σ position·(doc-hash mod
    1000003) that certifies the intra-shard ORDER, not just membership
    (any swap of two docs changes it).

    Scale shape: shard assignment is a narrow map; the only shuffle is
    the window partitioned BY SHARD — exactly the partitioning the
    subsequent shard-file write needs, so the sort is the write's sort
    and nothing moves twice. Shard count bounds skew: hash balance
    makes sizes concentrate at n/n_shards (the manifest's min/max
    exposes any imbalance).
    """
    pos_key = md5_long(
        F.concat(F.lit("ord#"), F.col(id_col).cast("string"))
    )
    sharded = docs.select(
        F.col(id_col),
        F.col("n_chars"),
        (
            md5_long(F.concat(F.lit(f"{salt}#"), F.col(id_col).cast("string")))
            % n_shards
        ).alias("shard"),
        pos_key.alias("pos_key"),
        (md5_long(F.col(id_col).cast("string")) % 1000003).alias("ord_hash"),
    )
    w = Window.partitionBy("shard").orderBy("pos_key", id_col)
    positioned = sharded.withColumn("pos", F.row_number().over(w))
    return (
        positioned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min(F.struct("pos", id_col))[id_col].alias("head_doc"),
            F.sum(F.col("pos").cast("bigint") * F.col("ord_hash")).alias(
                "order_digest"
            ),
        )
        .select(
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "total_chars",
            F.col("head_doc").cast("bigint").alias("head_doc"),
            "order_digest",
        )
    )


def quality_epoch_schedule(
    docs: DataFrame,
    score: Column,
    n_tokens: Column,
    repeats: dict[int, int] | None = None,
    n_tiles: int = 4,
) -> DataFrame:
    """Quality-weighted epoch scheduling (the LLaMA-style data recipe):
    rank documents by a quality ``score``, cut them into ``n_tiles``
    quality tiles, and give each tile a per-epoch repeat factor —
    highest-quality data is seen several times per epoch, lowest is
    dropped — then account for the token budget each tile contributes.

    ``repeats`` maps tile number (1 = lowest score .. n_tiles =
    highest) to its repeat factor; default {1:0, 2:1, 3:2, 4:4}.
    The ntile ranking orders by (score, doc_id) — the total tiebreak
    that makes tile assignment deterministic across engines.

    Shape: the exact quantile cut runs through ``functions.exact_ntile``
    (range-partitioned rank + per-partition counts + broadcast
    cumulative offsets) — one distributed range exchange, NO
    single-task global sort, exact SQL-standard tile edges; the
    per-tile accounting is a 4-group aggregate. Returns one row per
    tile: (tile, repeat_factor, n_docs, n_tokens_raw,
    n_tokens_per_epoch).
    """
    from etl_developstoday_test_spark.functions import exact_ntile

    if repeats is None:
        repeats = {1: 0, 2: 1, 3: 2, 4: 4}
    tiled = exact_ntile(
        docs.select(
            "doc_id",
            n_tokens.cast("bigint").alias("_nt"),
            score.alias("_score"),
        ),
        n_tiles,
        ["_score", "doc_id"],
        "tile",
    )
    rf = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in sorted(repeats)]),
            F.array(*[F.lit(repeats[k]) for k in sorted(repeats)]),
        ),
        F.col("tile"),
    ).cast("bigint")
    return (
        tiled.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens_raw"),
        )
        .select(
            "tile",
            rf.alias("repeat_factor"),
            "n_docs",
            "n_tokens_raw",
            (F.col("n_tokens_raw") * rf).alias("n_tokens_per_epoch"),
        )
    )


def waterfill_allocation(
    sources: DataFrame,
    budget_pct: int = 60,
    source_col: str = "source",
    avail_col: str = "avail_tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Token-budget allocation under per-source caps — WATER-FILLING
    (the capacity-constrained proportional-fairness allocation): give
    each source budget ∝ its weight, except a source can never give
    more than it has; the excess redistributes to the unconstrained
    sources, proportionally, until nothing moves. This is the budget
    planner a mixture recipe runs BEFORE sampling: "60% of the corpus,
    weighted by preference, but source X only has so many tokens".

    Registered round 9; the oracle was value-locked at two scales
    before registration (tests/test_staged_oracles.py).

    Closed form, no iteration: sort sources by r_s = avail/weight
    ascending — the saturated set is always a PREFIX of that order —
    and source i saturates iff the water level computed after
    saturating sources 1..i-1 already covers its cap:

        a_i · (W_tot − W_{i-1})  <=  (B − A_{i-1}) · w_i

    which is PURE INTEGER arithmetic (budget B = floor(total·pct/100),
    prefix sums A/W of BIGINT avail/weights), so the saturation
    frontier i* — and therefore the allocation — is bit-identical on
    any engine with no float comparisons anywhere near the decision.
    Only the final level λ = (B − A_{i*})/(W_tot − W_{i*}) and the
    per-source floor(λ·w) are doubles, both single fixed-order
    expressions over exact integers. (Products reach a·W ≈ 10^18 at
    10^12 tokens × 10^6 weight-sum — inside int64; past that, swap the
    two products to DECIMAL(38,0), same contract.)

    Shape: everything after the per-source rollup runs on the
    SOURCE-count-sized table — the prefix windows are bounded by the
    number of sources, never by data — and the rollup is checkpointed
    EAGERLY, so whatever corpus scan feeds ``sources`` runs exactly
    once no matter how many downstream branches (tot / ranked / sat /
    cut / final) the closed form fans into. Weights must be positive:
    w <= 0 (or NULL) would make the a/w ordering key NULL, the row
    would sort first and never saturate, and its full avail would be
    wrongly counted into the saturated prefix — so the operator
    REJECTS such rows up front (cheap: one job over the checkpointed
    source-count-sized table) rather than silently skewing the level.

    Returns one row per source:
    (source, avail_tokens, weight, allocated_tokens, saturated).
    Allocations are floored, so Σ allocated <= B exactly; when
    B >= Σ avail every source saturates and the leftover budget is
    simply unfilled (the corpus is the binding constraint).
    """
    src = sources.select(
        F.col(source_col).alias("source"),
        F.col(avail_col).cast("long").alias("a"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    n_bad = src.filter(
        F.col("w").isNull()
        | (F.col("w") <= 0)
        | F.col("a").isNull()
        | (F.col("a") < 0)
    ).count()
    if n_bad:
        raise ValueError(
            f"waterfill_allocation: {n_bad} source(s) with NULL/"
            "non-positive weight or NULL/negative avail — the "
            "saturated-prefix invariant needs w > 0 and a >= 0; "
            "filter or re-weight these sources explicitly"
        )
    tot = src.agg(
        F.sum("a").alias("atot"), F.sum("w").alias("wtot")
    ).select(
        "atot",
        "wtot",
        F.expr(f"(atot * {int(budget_pct)}) div 100").alias("budget"),
    )
    # bounded window: one row per SOURCE, never per data row
    w_ord = Window.orderBy(
        F.col("a").cast("double") / F.col("w"), F.col("source")
    )
    ranked = (
        src.withColumn("rn", F.row_number().over(w_ord))
        .withColumn(
            "aprev",
            F.coalesce(
                F.sum("a").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "wprev",
            F.coalesce(
                F.sum("w").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .crossJoin(F.broadcast(tot))
    )
    sat = ranked.withColumn(
        "is_sat",
        F.col("a") * (F.col("wtot") - F.col("wprev"))
        <= (F.col("budget") - F.col("aprev")) * F.col("w"),
    )
    istar = sat.agg(
        F.coalesce(
            F.max(F.when(F.col("is_sat"), F.col("rn"))), F.lit(0)
        ).alias("i")
    )
    cut = (
        sat.crossJoin(F.broadcast(istar))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("rn") <= F.col("i"), F.col("a"))),
                F.lit(0),
            ).alias("asat"),
            F.coalesce(
                F.sum(F.when(F.col("rn") <= F.col("i"), F.col("w"))),
                F.lit(0),
            ).alias("wsat"),
            F.any_value("i").alias("i"),
        )
    )
    lam = (
        cut.crossJoin(F.broadcast(tot))
        .select(
            "i",
            F.when(
                F.col("wtot") - F.col("wsat") > 0,
                (F.col("budget") - F.col("asat")).cast("double")
                / (F.col("wtot") - F.col("wsat")).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("lam"),
        )
    )
    return (
        sat.crossJoin(F.broadcast(lam))
        .select(
            "source",
            F.col("a").alias("avail_tokens"),
            F.col("w").alias("weight"),
            F.when(F.col("rn") <= F.col("i"), F.col("a"))
            .otherwise(
                F.floor(F.col("lam") * F.col("w").cast("double")).cast(
                    "long"
                )
            )
            .alias("allocated_tokens"),
            (F.col("rn") <= F.col("i")).alias("saturated"),
        )
    )


def packing_efficiency_audit(
    docs: DataFrame,
    budget: int = 128,
    n_shards: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Packing-efficiency audit: how many fixed-``budget`` training
    sequences the corpus costs UNPACKED (one document per sequence run,
    ceil(t/B) sequences each, the tail one padded) versus PACKED
    (concatenate-and-chunk per shard — the layout ``pack_sequences``
    materializes), and how much padding each regime burns. This is the
    batch-assembly planning number: padding is compute spent on
    nothing, and the saved fraction is the direct speedup packing buys
    a training run.

    Registered round 9; the oracle was value-locked at two scales
    before registration (tests/test_staged_oracles.py).

    Everything is EXACT integer arithmetic — token counts, ceil
    divisions ((t + B − 1) div B), per-shard totals — so the audit is
    bit-identical cross-engine. One narrow token-count map + one
    shard-level rollup (n_shards rows); nothing scales past the scan.

    Returns ONE row: (n_docs, total_tokens, unpacked_seqs,
    unpacked_pad_tokens, packed_seqs, packed_pad_tokens,
    pad_saved_pct = round(100·(unpacked_pad − packed_pad)/unpacked_pad,
    6); 0.0 when there is no unpacked padding to save).
    """
    from etl_developstoday_test_spark.functions import let, md5_long, tokens

    t = docs.select(
        "doc_id",
        (md5_long(F.col("doc_id").cast("string")) % n_shards).alias(
            "shard"
        ),
        let(tokens(F.col(text_col)), lambda x: F.size(x).cast("long")).alias(
            "n_tokens"
        ),
    )
    b = int(budget)
    per_shard = t.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok"),
        F.sum(F.expr(f"(n_tokens + {b} - 1) div {b}")).alias("useq"),
    )
    # packed: each shard is one concatenated stream -> ceil(tok/B)
    # sequences, padding only in the shard's final sequence
    out = per_shard.agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
        F.sum("useq").alias("unpacked_seqs"),
        (F.sum("useq") * b - F.sum("tok")).alias("unpacked_pad_tokens"),
        F.sum(F.expr(f"(tok + {b} - 1) div {b}")).alias("packed_seqs"),
        (
            F.sum(F.expr(f"(tok + {b} - 1) div {b}")) * b - F.sum("tok")
        ).alias("packed_pad_tokens"),
    )
    saved = F.when(
        F.col("unpacked_pad_tokens") > 0,
        F.round(
            F.lit(100.0)
            * (
                F.col("unpacked_pad_tokens") - F.col("packed_pad_tokens")
            ).cast("double")
            / F.col("unpacked_pad_tokens").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("pad_saved_pct", saved)


def waterfill_execute(
    doc_tokens: DataFrame,
    allocation: DataFrame,
    salt: str = "wfx",
    oversample: int = 4,
) -> DataFrame:
    """EXECUTE a water-filling allocation: deterministically select,
    per source, the hash-ordered prefix of documents whose running
    token total fits the source's allocated budget — the sampling pass
    that turns ``waterfill_allocation``'s plan into an actual kept-set.
    Selection is the md5-prefix rule every sampler here uses (a pure
    function of the data: stable across runs, engines, partitionings),
    and the budget is enforced exactly: kept tokens never exceed the
    allocation (the boundary document that would overflow is dropped,
    not truncated).

    Registered in round 10 as ``sample_waterfill_execute`` (two-scale
    oracle lock in tests/test_staged_oracles.py).

    Scale shape — the same certified pre-filter contract as
    ``sketches.bottomk_quantile_rollup``: ranking a source's WHOLE
    document set per prefix-sum window would put a source's entire
    slice in one task at corpus scale, so each source's window input
    is pre-shrunk by a static hash bound sized from its allocation
    (``h < H div max(1, avail div max(1, alloc*oversample))`` —
    expected survivor mass ~oversample x the budget; sources whose
    allocation equals their avail — saturated — skip the filter and
    keep everything, and a ZERO allocation keeps nothing by contract).
    Survivors are a PREFIX of the (hash, id) order, so the filtered
    cut is EXACT whenever the budget boundary is provably inside that
    prefix — surviving mass STRICTLY above the allocation, or the
    whole source surviving — which is CERTIFIED per source and RAISES
    otherwise (raise ``oversample`` rather than under-fill silently;
    a source holding its mass in a handful of huge documents can trip
    this legitimately — the bound is sized in tokens, granularity is
    a document). Survivors (~oversample x budget tokens per source)
    are materialized once; the prefix window runs on that bounded
    superset.

    ``doc_tokens``: (source, doc_id, n_tokens); ``allocation``: the
    waterfill_allocation output. Returns one row per source: (source,
    allocated_tokens, n_docs_kept, tokens_kept, utilization =
    round(kept/allocated, 6); 0.0 for zero allocations).
    """
    hs = 1 << 60  # md5_long hash space
    alloc = allocation.select(
        "source",
        F.col("avail_tokens").cast("long").alias("_avail"),
        F.col("allocated_tokens").cast("long").alias("_alloc"),
    )
    h = md5_long(
        F.concat(F.lit(f"{salt}#"), F.col("doc_id").cast("string"))
    )
    hmax = F.expr(
        f"{hs} div greatest(1, _avail div greatest(1, _alloc * {int(oversample)}))"
    )
    survivors = (
        doc_tokens.select(
            "source", "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
        )
        .join(F.broadcast(alloc), "source")
        .withColumn("_h", h)
        .filter(
            (F.col("_alloc") > 0)
            & ((F.col("_alloc") == F.col("_avail")) | (F.col("_h") < hmax))
        )
        .persist()  # ~oversample x budget tokens per source
    )
    # exactness certificate: survivors are a PREFIX of the (h, doc_id)
    # order, so the filtered cut equals the unfiltered cut iff the
    # budget boundary is provably inside the prefix — surviving mass
    # STRICTLY exceeds the allocation (the crossing row is visible;
    # mass == alloc is NOT enough: a zero-token doc beyond the bound
    # would still belong to the true cut) — or the prefix is the whole
    # source (mass == avail). Zero allocations keep nothing by
    # contract and are exempt. ALLOC must be the preserved side, so it
    # sits on the LEFT of a left join with the broadcast hint on the
    # per-source mass rollup (a hint on the preserved side of an outer
    # join is ignored with a warning — the r9 ADVICE seam); this
    # count() is also what materializes the survivors persist.
    short = (
        alloc.join(
            F.broadcast(
                survivors.groupBy("source").agg(
                    F.sum("n_tokens").alias("_stok")
                )
            ),
            "source",
            "left",
        )
        .filter(
            (F.col("_alloc") > 0)
            & ~(
                (F.coalesce(F.col("_stok"), F.lit(0)) > F.col("_alloc"))
                | (F.coalesce(F.col("_stok"), F.lit(0)) == F.col("_avail"))
            )
        )
        .count()
    )
    if short:
        survivors.unpersist()
        raise ValueError(
            f"waterfill_execute: {short} source(s) kept less token "
            f"mass than their allocation under the oversample="
            f"{oversample} hash bound — raise oversample (widens the "
            "pre-filter) instead of under-filling silently"
        )
    w = (
        Window.partitionBy("source")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        survivors.withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") <= F.col("_alloc"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
        )
    )
    out = (
        alloc.join(kept, "source", "left")
        .select(
            "source",
            F.col("_alloc").alias("allocated_tokens"),
            F.coalesce(F.col("n_docs_kept"), F.lit(0))
            .cast("long")
            .alias("n_docs_kept"),
            F.coalesce(F.col("tokens_kept"), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
            F.when(
                F.col("_alloc") > 0,
                F.round(
                    F.coalesce(F.col("tokens_kept"), F.lit(0)).cast("double")
                    / F.col("_alloc").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("utilization"),
        )
        .localCheckpoint(eager=True)  # source-count rows
    )
    survivors.unpersist()
    return out


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    quantum: int = 1_000_000,
) -> DataFrame:
    """NEYMAN-OPTIMAL stratified sample allocation (Neyman 1934): split
    a sampling budget of ``total_n`` rows across strata proportional to
    N_h·S_h (stratum size × stratum std) — the allocation that
    minimizes the variance of the stratified mean estimator at fixed
    budget. Proportional allocation oversamples big uniform strata and
    starves small noisy ones; this is the fix, and in a curation
    pipeline it is how an eval/audit sample gets drawn from a corpus
    whose sources differ wildly in both volume and variance (the
    actual draw then reuses ``hash_split``'s per-stratum prefix).

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Determinism contract: values micro-quantize to integers (NULL/NaN
    excluded), so each stratum's count / sum / square-sum are EXACT
    integers (square-sums as DECIMAL(38,0) — no silent int64 wrap);
    the population variance numerator n·Σx² − (Σx)² is exact integer
    arithmetic on the driver; S_h is one correctly-rounded sqrt of
    that exact integer, scaled and 6-dp-rounded BEFORE the weight
    forms, and the weight micro-quantizes to integer micros — so the
    largest-remainder split of ``total_n`` runs in PURE INTEGER
    arithmetic (floor shares from exact rationals; the deficit goes to
    the largest remainders with a (rem DESC, stratum ASC) total
    tiebreak) and Σ n_alloc == total_n exactly, on any engine.
    All-constant strata (ΣN_h·S_h = 0) fall back to proportional-to-
    size weights rather than dividing by zero; an empty input raises.

    Scale shape: ONE map-side-combined groupBy on the stratum builds
    the moment table; everything after runs on the driver over the
    strata list — strata are a true dimension (sources, languages,
    event types: config-sized, NOT corpus-sized), which is what makes
    the driver-side largest-remainder pass legitimate (same bounded-
    collect class as the BPE trainer's top-1s). Returns one row per
    stratum: (stratum, n_rows, std, n_alloc), ordered by stratum.
    """
    if total_n < 0:
        raise ValueError("neyman_allocation: total_n must be >= 0")
    if quantum < 1:
        raise ValueError("neyman_allocation: quantum must be >= 1")

    v = F.col(value_col).cast("double")
    xq = F.round(F.col("_v") * quantum).cast("long")
    moments = (
        df.select(F.col(stratum_col).cast("string").alias("stratum"), v.alias("_v"))
        .filter(F.col("_v").isNotNull() & ~F.isnan("_v"))
        .select("stratum", xq.alias("_xq"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_xq").cast("decimal(38,0)")).alias("s1"),
            F.sum(
                (
                    F.col("_xq").cast("decimal(38,0)")
                    * F.col("_xq").cast("decimal(38,0)")
                ).cast("decimal(38,0)")
            ).alias("s2"),
        )
        .collect()
    )
    if not moments:
        raise ValueError("neyman_allocation: no rows after NULL/NaN exclusion")

    import math

    def round_half_up6(x: float) -> float:
        # Python round() is banker's; SQL round is half-away-from-zero.
        # For the non-negative values here, HALF_UP = floor(x·1e6 + .5)
        # on the same double both engines hold — bit-identical.
        return math.floor(x * 1e6 + 0.5) / 1e6

    strata = []
    for r in sorted(moments, key=lambda r: r["stratum"]):
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        var_num = n * s2 - s1 * s1  # exact integer, >= 0
        std = round_half_up6(math.sqrt(var_num) / (n * quantum))
        strata.append(
            (r["stratum"], n, std, math.floor(n * std * 1e6 + 0.5))
        )

    sumw = sum(wq for _, _, _, wq in strata)
    if sumw == 0:  # all strata constant: proportional-to-size fallback
        strata = [(s, n, std, n) for s, n, std, _ in strata]
        sumw = sum(n for _, n, _, _ in strata)

    base = {s: total_n * wq // sumw for s, _, _, wq in strata}
    rems = sorted(
        ((total_n * wq - base[s] * sumw, s) for s, _, _, wq in strata),
        key=lambda t: (-t[0], t[1]),
    )
    deficit = total_n - sum(base.values())
    for _, s in rems[:deficit]:
        base[s] += 1

    out = [(s, n, std, base[s]) for s, n, std, _ in strata]
    return df.sparkSession.createDataFrame(
        out, "stratum string, n_rows long, std double, n_alloc long"
    )


def quality_decile_thresholds(
    docs: DataFrame, score_col: str = "n_chars", group_col: str = "lang"
) -> DataFrame:
    """Per-GROUP exact decile thresholds of an integer quality score —
    the normalization table that makes one keep-top-X% policy mean
    the same thing in every language. Raw quality scores are not
    comparable across languages (English always outscores low-resource
    text on absolute heuristics); the standard fix (CCNet, Wenzek
    2020) is per-language quantile thresholds, applied as a lookup.
    This emits that lookup: for each group and decile d, the smallest
    score whose within-group empirical CDF reaches d/10.

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Scale-safety is the construction: no per-document window (a
    per-lang partition is corpus-sized — a handful of giant
    partitions at 100 TB). Scores collapse to a (group, score,
    multiplicity) table first — bounded by the score DOMAIN — and the
    cumulative window runs over THAT (bounded-window allowlist class).
    The threshold test is pure integers (10·cum ≥ d·n — no double CDF
    anywhere), so the table is exact and cross-engine by construction.

    Returns (lang, decile, threshold, n_docs), ordered.
    """
    vals = (
        docs.select(
            F.col(group_col).alias("g"),
            F.col(score_col).cast("long").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    w = Window.partitionBy("g").orderBy("v")
    cum = vals.withColumn("cum", F.sum("m").over(w).cast("long"))
    totals = vals.groupBy("g").agg(F.sum("m").cast("long").alias("n_docs"))
    deciles = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile")
    return (
        cum.join(totals, "g")
        .select("g", "v", "cum", "n_docs", deciles)
        .filter(
            F.col("cum") * 10 >= F.col("decile") * F.col("n_docs")
        )
        .groupBy(
            F.col("g").alias("lang"), F.col("decile"), F.col("n_docs")
        )
        .agg(F.min("v").alias("threshold"))
        .select("lang", "decile", "threshold", "n_docs")
        .orderBy("lang", "decile")
    )


def hash_split_balance_audit(
    df: DataFrame, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Uniformity audit of the deterministic md5 HASH SPLIT every
    sampler in this module rides on: chi-square goodness-of-fit of the
    100-bucket assignment against uniform, plus the worst bucket's
    share deviation. A skewed split means the "random" holdout isn't
    (correlated keys, truncated id domains, a salt collision with the
    key format) — and every downstream train/eval split inherits the
    bias. This is the audit a pipeline runs ONCE per new key scheme
    before trusting ``hash_split`` / ``stratified_sample``.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: bucket counts are exact longs over the md5 bucket
    (cross-engine by construction); expected = n/100 is one double;
    χ² terms are a fixed double tree through the exact decimal
    summator; the max share deviation compares identical doubles. All
    100 buckets participate (zero-count buckets via the spine join —
    missing buckets are exactly the failure the audit looks for).
    Empty input raises.

    Scale shape: one narrow md5 map + ONE map-side-combined 100-group
    aggregate; everything after runs on the checkpointed 100-row
    table. Returns one row:
    (n_rows, n_buckets, chi2, max_abs_dev_share).
    """
    b = hash_bucket(F.col(key_col), salt)
    counts = (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = df.sparkSession.range(N_BUCKETS).select(
        F.col("id").cast("long").alias("bucket")
    )
    full = (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
        .localCheckpoint(eager=True)  # bounded: exactly 100 rows
    )
    total = full.agg(F.sum("c").cast("long").alias("t")).collect()[0]["t"]
    if total == 0:
        raise ValueError(
            "hash_split_balance_audit: empty input — nothing to audit"
        )
    e = F.lit(float(total)) / F.lit(float(N_BUCKETS))
    c = F.col("c").cast("double")
    chi_term = ((c - e) * (c - e) / e).cast("decimal(30,10)")
    dev = F.abs(
        c / F.lit(float(total)) - F.lit(1.0) / F.lit(float(N_BUCKETS))
    )
    return full.agg(
        F.lit(total).cast("long").alias("n_rows"),
        F.lit(N_BUCKETS).cast("long").alias("n_buckets"),
        F.round(F.sum(chi_term).cast("double"), 6).alias("chi2"),
        F.round(F.max(dev), 6).alias("max_abs_dev_share"),
    )


def half_sample_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicas: int = 32,
    seed: str = "hs",
    z: float = 1.959964,
) -> DataFrame:
    """Half-sample REPLICATION confidence interval for a corpus mean
    (McCarthy 1969 repeated half-sampling, the replication-variance
    family survey statistics ships instead of closed-form σ/√n): B
    deterministic half-samples each re-estimate the mean, and the
    spread of the replica estimates IS the sampling variance — the
    honest error bar for a quality-score / value average reported off
    a pipeline, valid under weighting and post-filtering where the
    textbook formula silently isn't.

    Registered round 13 (staged r12; oracle value-locked at both
    scales in tests/test_staged_oracles.py BEFORE registration).

    The B replicas cost ZERO fan-out: one salted md5 per row supplies
    ``n_replicas`` independent inclusion BITS (bit b of the 60-bit
    hash — replica b keeps the rows whose bit is 0, an expected half
    each), and all B (sum, count) pairs accumulate in ONE
    map-side-combined aggregate pass as conditional sums — no explode,
    no corpus×B intermediate (the naive replication join). Replica
    means then unpivot to a B-row bounded table for the variance.

    Determinism: sums are MICRO-QUANTIZED longs (floor(v·1e6 + 0.5) —
    the r12 integer-quantum contract; headroom |v| ≤ 1e6 at 9.2e12
    rows); the hash is the repo's salted-md5 idiom, bit-identical in
    DuckDB; the replica-variance moments accumulate through the
    decimal summator over the B-row table; mean/se/CI are a
    fixed-order double tree, 6-dp rounded. Var = (1/B)·Σ(θ_b − θ̂)²
    with θ̂ the FULL-sample mean (the McCarthy estimator). NULL/NaN
    excluded; an empty corpus or a replica with zero rows raises
    (a degenerate half-sample means the corpus is too small for B
    bits of replication — shrink n_replicas).

    Returns ONE row: (n_rows, mean, se, ci_lo, ci_hi, n_replicas).
    """
    if not 1 <= n_replicas <= 60:
        raise ValueError(
            "half_sample_mean_ci: n_replicas must be in [1, 60] "
            "(one md5 supplies 60 bits)"
        )
    from etl_developstoday_test_spark.functions import ACC_DECIMAL, md5_long

    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.floor(v * F.lit(1e6) + F.lit(0.5)).cast("long").alias("_q"),
        md5_long(
            F.concat(F.lit(f"{seed}#"), F.col(id_col).cast("string"))
        ).alias("_h"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("_q").alias("s_all"),
    ]
    for b in range(n_replicas):
        keep = F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 0
        aggs.append(
            F.coalesce(F.sum(F.when(keep, F.col("_q"))), F.lit(0))
            .cast("long")
            .alias(f"s_{b}")
        )
        aggs.append(
            F.coalesce(F.sum(keep.cast("long")), F.lit(0))
            .cast("long")
            .alias(f"n_{b}")
        )
    tot = base.agg(*aggs).localCheckpoint(eager=True)  # 1 row
    g = tot.collect()[0]
    if g["n_rows"] == 0:
        raise ValueError("half_sample_mean_ci: no usable rows")
    empty = [b for b in range(n_replicas) if g[f"n_{b}"] == 0]
    if empty:
        raise ValueError(
            f"half_sample_mean_ci: replicas {empty[:5]} kept zero rows — "
            "the corpus is too small for this many replication bits"
        )
    # replica means as a bounded B-row table via stack (unpivot)
    pairs = ", ".join(
        f"{b}L, s_{b}, n_{b}" for b in range(n_replicas)
    )
    reps = tot.selectExpr(
        "n_rows",
        "s_all",
        f"stack({n_replicas}, {pairs}) AS (b, s_b, n_b)",
    ).select(
        "n_rows",
        "s_all",
        (
            (F.col("s_b").cast("double") / F.lit(1e6))
            / F.col("n_b").cast("double")
        ).alias("theta_b"),
        (
            (F.col("s_all").cast("double") / F.lit(1e6))
            / F.col("n_rows").cast("double")
        ).alias("theta"),
    )
    dev = (F.col("theta_b") - F.col("theta"))
    mom = reps.agg(
        F.first("n_rows").alias("n_rows"),
        F.first("theta").alias("theta"),
        F.sum((dev * dev).cast(ACC_DECIMAL)).alias("_ss"),
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
    )
    se = F.sqrt(
        F.col("_ss").cast("double") / F.col("n_replicas").cast("double")
    )
    return mom.select(
        "n_rows",
        F.round(F.col("theta"), 6).alias("mean"),
        F.round(se, 6).alias("se"),
        F.round(F.col("theta") - F.lit(z) * se, 6).alias("ci_lo"),
        F.round(F.col("theta") + F.lit(z) * se, 6).alias("ci_hi"),
        "n_replicas",
    )


def proportion_wilson_ci(
    df: DataFrame, flag_col: str, z: float = 1.959964
) -> DataFrame:
    """Wilson score interval for a corpus proportion (Wilson 1927;
    Brown–Cai–DasGupta 2001 recommend it over the Wald interval,
    whose coverage collapses near 0/1 — exactly where data-quality
    shares live): estimate the share of rows satisfying a boolean
    column with a CI that is valid at extreme p̂ and never leaves
    [0, 1]. The categorical companion to half_sample_mean_ci's
    continuous-mean CI — together they put honest error bars on both
    card types a corpus review quotes.

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: n and k are exact counts (NULL flags excluded — an
    unknown can neither satisfy nor fail the predicate); p̂, the
    Wilson center (p̂ + z²/2n)/(1 + z²/n) and half-width
    z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n) are one fixed-order double
    tree over the two integers with the z literal baked into both
    plans (the BENFORD constant convention), 6-dp rounded. n = 0
    raises.

    Scale shape: ONE map-side-combined aggregate — nothing else.
    Returns one row: (n_rows, n_true, p_hat, ci_lo, ci_hi).
    """
    card = df.filter(F.col(flag_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.when(F.col(flag_col), 1)), F.lit(0))
        .cast("long")
        .alias("n_true"),
    ).localCheckpoint(eager=True)  # 1 row; guard + result share it
    if card.collect()[0]["n_rows"] == 0:
        raise ValueError("proportion_wilson_ci: no non-NULL flag rows")
    n = F.col("n_rows").cast("double")
    p = F.col("n_true").cast("double") / n
    zz = F.lit(float(z)) * F.lit(float(z))
    denom = F.lit(1.0) + zz / n
    center = (p + zz / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + zz / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return card.select(
        "n_rows",
        "n_true",
        F.round(p, 6).alias("p_hat"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


def split_psi_audit(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """SPLIT-EXCHANGEABILITY audit: PSI of a numeric column between
    the two halves of the repo's deterministic md5 hash split — the
    certificate that a train/validation split is distributionally
    exchangeable BEFORE anyone trusts validation metrics (hash splits
    are unbiased by construction, but a split keyed on a
    value-correlated id — sequential ids under value drift, the
    classic silent failure — is not, and this card is the direct
    test). PSI ≈ 0 certifies the split; PSI above the 0.1 convention
    says the id carries signal and the split key must change. The
    same 1e-4-floored, nano-quantized-log PSI arithmetic as
    drift_psi_daily, so thresholds transfer.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: the split is the 'sp#'-salted md5 PARITY of the id —
    an independent 50/50 split built on the same engine-portable,
    seed-stable md5 idiom as hash_split, NOT hash_split's own
    caller-salted 100-bucket threshold assignment (r14 ADVICE item 4:
    this card certifies the exchangeability of the id-hash split
    MECHANISM; to audit a specific hash_split output, materialize
    that split and diff the halves with drift_psi_daily's binning);
    bin edges are caller-pinned [lo, hi] (the psi_drift rule: derived
    edges would make audits incomparable across runs); counts are
    exact longs; each bin's (p−q)·lnq(p/q) term quantizes the one
    transcendental to integer nanos and accumulates through the
    decimal summator (order-independent).

    Scale shape: ONE corpus scan — split bit and bin computed in the
    same narrow projection, ONE map-side-combined groupBy(bin) with
    conditional partial sums for the two sides (never two scans, never
    a self-join), then bounded-table term assembly. Returns one row:
    (psi, n_base, n_current, split_balance).
    """
    if lo is None or hi is None:
        raise ValueError("split_psi_audit: pin lo/hi explicitly")
    if hi <= lo:
        raise ValueError("split_psi_audit: hi must be > lo")
    if n_bins < 1:
        raise ValueError("split_psi_audit: n_bins must be >= 1")
    width = (hi - lo) / n_bins
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col).cast("double") - lo) / width).cast(
                "int"
            ),
        ),
    )
    side = (
        md5_long(F.concat(F.lit("sp#"), F.col(id_col).cast("string"))) % 2
    )
    vv = F.col(value_col).cast("double")
    binned = (
        df.filter(vv.isNotNull() & ~F.isnan(vv))
        .select(b.alias("bin"), side.alias("_s"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("_s") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(F.when(F.col("_s") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_current"),
        )
        .localCheckpoint(eager=True)  # bounded: <= n_bins rows
    )
    tot = binned.agg(
        F.sum("n_base").cast("long").alias("_tb"),
        F.sum("n_current").cast("long").alias("_tc"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    # one-sided degenerate input (an empty md5-parity half): NULL PSI
    # instead of an ANSI DIVIDE_BY_ZERO — every term goes NULL and the
    # NULL-skipping sum over all-NULL terms reports NULL (r14 ADVICE)
    # (the when wraps the WHOLE greatest: Spark's greatest skips NULL
    # arguments, so greatest(NULL, 1e-4) would resurrect 1e-4)
    p = F.when(
        F.col("_tb") > 0,
        F.greatest(
            F.col("n_base").cast("double") / F.col("_tb").cast("double"),
            F.lit(1e-4),
        ),
    )
    q = F.when(
        F.col("_tc") > 0,
        F.greatest(
            F.col("n_current").cast("double") / F.col("_tc").cast("double"),
            F.lit(1e-4),
        ),
    )
    lq = F.round(F.log(p / q) * 1e9).cast("long")
    term = (p - q) * (lq.cast("double") / 1e9)
    return (
        j.select(
            term.cast(ACC_DECIMAL).alias("_term"),
            "n_base",
            "n_current",
        )
        .agg(
            F.round(F.sum("_term").cast("double"), 6).alias("psi"),
            F.sum("n_base").cast("long").alias("n_base"),
            F.sum("n_current").cast("long").alias("n_current"),
        )
        .select(
            "psi",
            "n_base",
            "n_current",
            F.when(
                (F.col("n_base") + F.col("n_current")) > 0,
                F.round(
                    F.col("n_base").cast("double")
                    / (F.col("n_base") + F.col("n_current")).cast("double"),
                    6,
                ),
            ).alias("split_balance"),
        )
    )


# Poisson(1) CDF thresholds scaled to the md5_long 60-bit range
# [0, 2^60): T[k] = floor(P(X <= k) * 2^60). A 60-bit uniform hash u
# maps to weight w = #{k : u >= T[k]} — the inverse-CDF draw both
# engines compute with INTEGER comparisons only (no float thresholds
# to round differently). Mass beyond w = 9 is < 1.1e-7 and truncates.
POISSON1_THRESHOLDS = (
    424136118829305344,     # P(X<=0) = e^-1
    848272237658610688,     # P(X<=1)
    1060340297073263360,    # P(X<=2)
    1131029650211480960,    # P(X<=3)
    1148701988496035328,    # P(X<=4)
    1152236456152946176,    # P(X<=5)
    1152825534095764608,    # P(X<=6)
    1152909688087595776,    # P(X<=7)
    1152920207336574720,    # P(X<=8)
)


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_reps: int = 48,
    salt: str = "bs",
) -> DataFrame:
    """Deterministic POISSON-BOOTSTRAP confidence interval for the
    mean of a column: ``n_reps`` resampled replicate means built from
    per-row Poisson(1) weights drawn by inverse-CDF on a salted md5
    hash, summarized to the 2.5%/97.5% nearest-rank interval. THE
    missing uncertainty number under every 1-row metric card this
    engine publishes — a mean that moved 2% means nothing without
    the resampling width, and the Poisson(1) approximation to the
    multinomial bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", Google 2012) is the ONLY bootstrap
    that streams: each row draws its weight independently, so no
    replicate ever needs the corpus in one place.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: the weight draw is pure integer comparison of the
    60-bit md5 hash against precomputed integer CDF thresholds
    (``POISSON1_THRESHOLDS`` — byte-identical literals in the
    oracle; no float thresholds to round differently); replicate
    sums are exact longs of micro-quantized values and exact weight
    counts; each replicate mean divides once; the interval is exact
    nearest-rank (ceil(q·R)) order statistics over the R-row
    replicate table, tie-broken by construction (row_number over
    (mean, rep)); the headline mean is the exact unweighted micro
    mean. A replicate whose total weight is 0 reports a NULL mean
    and is excluded from the rank (documented — vanishing
    probability beyond toy inputs).

    Scale shape: ONE scan with a bounded ``n_reps``-way explode (the
    DAU/WAU bounded-explode class — n_reps is the documented
    cost/precision knob), collapsed map-side to the R-row replicate
    table (partial aggregation leaves <= R rows per task); the rank
    and interval run over that bounded table; the headline mean
    rides the same scan's unweighted partials. Returns one row:
    (n_rows, mean_value, n_replicates, ci_lo, ci_hi), the 95%
    interval.
    """
    from etl_developstoday_test_spark.functions import md5_long

    if n_reps < 2:
        raise ValueError("poisson_bootstrap_mean_ci: n_reps must be >= 2")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(id_col).cast("string").alias("_id"),
        F.floor(v * F.lit(1e6) + F.lit(0.5)).cast("long").alias("_x"),
    )
    exploded = base.select(
        "_id",
        "_x",
        F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("_r"),
    )
    h = md5_long(
        F.concat(
            F.lit(salt + "#"),
            F.col("_r").cast("string"),
            F.lit("#"),
            F.col("_id"),
        )
    )
    w = F.lit(0)
    for t in POISSON1_THRESHOLDS:
        w = w + F.when(h >= F.lit(t), 1).otherwise(0)
    # each replicate sums the WHOLE corpus, so Σw·x goes through
    # decimal(38,0) (a long micro-sum wraps past ~10^12 rows at the
    # 100-TB posture); Σw stays a long count-like sum
    reps = (
        exploded.select(
            "_r",
            (w.cast("long") * F.col("_x"))
            .cast("decimal(38,0)")
            .alias("_wx"),
            w.cast("long").alias("_w"),
        )
        .groupBy("_r")
        .agg(
            F.sum("_wx").alias("_swx"),
            F.sum("_w").cast("long").alias("_sw"),
        )
        .localCheckpoint(eager=True)  # bounded: n_reps rows
    )
    rep_mean = F.when(
        F.col("_sw") > 0,
        F.col("_swx").cast("double")
        / F.lit(1e6)
        / F.col("_sw").cast("double"),
    )
    ranked = reps.select(
        "_r", rep_mean.alias("_m")
    ).filter(F.col("_m").isNotNull())
    wr = Window.orderBy("_m", "_r")
    ranked = ranked.select(
        "_m", F.row_number().over(wr).cast("long").alias("_rk")
    ).localCheckpoint(eager=True)  # bounded: n_reps rows
    nr = ranked.agg(F.count(F.lit(1)).cast("long").alias("_nr"))
    lo_rk = F.ceil(F.lit(0.025) * F.col("_nr").cast("double")).cast("long")
    hi_rk = F.ceil(F.lit(0.975) * F.col("_nr").cast("double")).cast("long")
    iv = (
        ranked.crossJoin(F.broadcast(nr))
        .agg(
            F.round(
                F.min(F.when(F.col("_rk") == lo_rk, F.col("_m"))), 6
            ).alias("ci_lo"),
            F.round(
                F.min(F.when(F.col("_rk") == hi_rk, F.col("_m"))), 6
            ).alias("ci_hi"),
            F.first(F.col("_nr")).cast("long").alias("n_replicates"),
        )
    )
    head = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum("_x").cast("double")
            / F.lit(1e6)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_value"),
    )
    return head.crossJoin(F.broadcast(iv)).select(
        "n_rows", "mean_value", "n_replicates", "ci_lo", "ci_hi"
    )
