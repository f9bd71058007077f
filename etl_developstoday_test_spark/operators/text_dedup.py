"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

These generalize the reference's single dedup operator (first-wins
hash-set, ``TripDuplicateDetectorService.cs:36-49``) to the fuzzy
regimes a training-data pipeline needs. Scale posture:

- **exact**: hash-groupBy — one shuffle on a 128-bit digest; key
  cardinality ≈ row count, no skew.
- **n-gram Jaccard**: candidate generation via an equi-join on shared
  shingles (never the O(n²) cross join); at 100 TB add a document-
  frequency cap on shingles (drop shingles appearing in > df_max docs)
  to bound join fan-out — exposed as ``df_max``.
- **MinHash+LSH**: the scale path — signature is fixed-width (16×8 B),
  candidates come from equality on band keys (hash-partitionable),
  verification joins only candidate pairs.
- **SimHash**: fixed 32-bit sketch per doc; Hamming-ball lookup via
  4-chunk pigeonhole index.

All hashing is md5-based (``functions.md5_long``) so every stage is
reproducible in any engine with md5 — which is how the DuckDB oracles
verify these end-to-end.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import fan_out, let, md5_long, tokens, word_shingles


def _shingle_set(n: int):
    """Distinct n-word shingles of the ``text`` column, with the token
    array let-bound so the regex split runs once per row."""
    return let(
        tokens(F.col("text")),
        lambda toks: F.array_distinct(word_shingles(toks, n)),
    )

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with
    the canonical (minimum) doc_id and the copy count."""
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def keep_best_duplicates(docs: DataFrame) -> DataFrame:
    """Exact-duplicate resolution keeping the BEST copy, not the first:
    among rows with identical content, keep the one with the highest
    quality score, tie-broken deterministically on doc_id — the
    training-pipeline shape for "merge recrawls, keep the cleanest
    copy" (vs the reference's first-wins rule,
    TripDuplicateDetectorService.cs:36-49, exposed as dedup_exact).

    Scale posture: one narrow scoring map over the scan, then a single
    hash-partitioned window on content_hash (row_number + count share
    the one shuffle) — identical one-shuffle posture to exact dedup.
    Returns (content_hash, doc_id, quality_score, n_copies) winners.
    """
    from pyspark.sql import Window

    from etl_developstoday_test_spark.operators.text_analysis import quality_score

    scored = quality_score(
        docs.withColumn("content_hash", F.md5("text")), carry=("content_hash",)
    ).select("doc_id", "content_hash", "quality_score")
    by_hash = Window.partitionBy("content_hash")
    w = by_hash.orderBy(F.desc("quality_score"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(by_hash).cast("long"))
        .filter(F.col("rn") == 1)
        .select("content_hash", "doc_id", "quality_score", "n_copies")
    )


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS local-fingerprinting
    scheme, Schleimer et al. 2003): hash every k-gram with a rolling
    window of the token stream, then keep the MINIMUM hash of each
    w-length window of consecutive k-gram hashes — guaranteeing any
    sufficiently long match between two documents shares a fingerprint,
    at ~2/(w+1) selection density.

    Entirely codegen array lambdas over the scan (shingle → md5_long →
    per-window array_min → distinct → explode): a narrow map, zero
    shuffles — the fingerprint rows feed an equi-join for match
    detection exactly like _doc_shingles feeds Jaccard. Documents with
    fewer than k+w-1 tokens yield no fingerprints (below the winnowing
    guarantee threshold), matching the SQL oracle's length guard.
    Returns (doc_id, fingerprint) distinct rows.
    """
    docs = fan_out(docs)  # per-row-heavy hashing: parallelize first
    hashes = let(
        word_shingles(tokens(F.col("text")), k),
        lambda sh: F.transform(sh, md5_long),
    )
    fps = let(
        hashes,
        lambda hs: F.when(
            F.size(hs) >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(hs) - w),
                    lambda i: F.array_min(F.slice(hs, i + 1, w)),
                )
            ),
        ).otherwise(F.array().cast("array<long>")),
    )
    return docs.select("doc_id", F.explode(fps).alias("fingerprint"))


def winnow_match_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 5,
    df_max: int | None = None,
) -> DataFrame:
    """Partial-overlap pairs from winnowing fingerprints: the
    fingerprint equi-join (never O(n²) — candidates only where a local
    fingerprint collides) counts shared fingerprints per document pair;
    ``min_shared`` shared windows flag substantial copied passages.

    ``df_max`` is the hot-key guard: a fingerprint present in d
    documents contributes d² candidate pairs to one join bucket, so
    boilerplate shared corpus-wide (license headers, templates) turns
    the join quadratic on a skewed key. Dropping fingerprints with
    document frequency > df_max bounds every bucket at df_max² — the
    same guard ngram_jaccard_pairs applies to shingles. MOSS itself
    discards over-frequent fingerprints as non-discriminative.

    The frequency is computed with a window over the fingerprint
    partition rather than a groupBy+join so the fingerprint lineage
    (the expensive hashing scan) is materialized by ONE exchange that
    the self-join then reuses on both sides.
    """
    fp = winnow_fingerprints(docs, k, w)
    if df_max is not None:
        from pyspark.sql import Window

        fp = (
            fp.withColumn(
                "_df",
                F.count(F.lit(1)).over(Window.partitionBy("fingerprint")),
            )
            .filter(F.col("_df") <= df_max)
            .drop("_df")
        )
    a = fp.select(F.col("doc_id").alias("doc_id_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fingerprints"))
        .filter(F.col("n_shared_fingerprints") >= min_shared)
    )


def _doc_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    docs = fan_out(docs)  # shingling is per-row-heavy: parallelize first
    return docs.select(
        "doc_id",
        F.explode(_shingle_set(n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    df_max: int | None = None,
) -> DataFrame:
    """All pairs (doc_a < doc_b) whose n-word-shingle Jaccard similarity
    ≥ threshold. Candidates come from the shared-shingle equi-join;
    ``df_max`` drops ubiquitous shingles to bound fan-out at scale.

    With ``df_max`` set, the similarity is the exact Jaccard of the
    FILTERED shingle space: sizes are computed after the rarity filter,
    so intersections and set sizes live in the same space (mixing
    filtered intersections with unfiltered sizes would systematically
    underestimate similarity near the threshold)."""
    sh = _doc_shingles(docs, n)
    if df_max is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_max)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    # Carry each doc's shingle-set size THROUGH the self-join as a
    # window column instead of aggregating sizes separately and joining
    # them back twice: same values, three fewer exchanges (one window
    # shuffle replaces groupBy + two size joins), and the b-side of the
    # self-join becomes a ReusedExchange of the a-side.
    sh = sh.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("_n").alias("_na")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("_n").alias("_nb")
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("intersection_size"),
            F.min("_na").alias("_na"),
            F.min("_nb").alias("_nb"),
        )
    )
    jac = F.col("intersection_size").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("intersection_size")
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "intersection_size", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, m0..m{15}): MinHash signature over n-word shingles.

    Permutation i is simulated by hashing ``shingle || '#i'`` — the
    standard salted-hash construction; min over the doc's shingle set.
    One shuffle (groupBy doc_id) with 16 parallel min aggregates —
    partial aggregation makes the map side do almost all the work.
    """
    sh = _doc_shingles(docs, n)
    mins = [
        F.min(md5_long(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"m{i}")
        for i in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def _bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — the LSH band explode of a MinHash
    signature table: band key = md5 of the band's signature rows. This
    IS the stored index of the incremental path (one row per doc per
    band, keyed for the bucket equi-join)."""
    rows_per_band = N_MINHASH // N_BANDS
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )


def _band_candidates(sig: DataFrame, bucket_max: int | None = None) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band key
    of the MinHash signature — the bucket equi-join that replaces the
    all-pairs comparison.

    ``bucket_max`` is the hot-bucket guard of the family (the LSH
    sibling of ``df_max`` on shingles/fingerprints): a band bucket
    holding d documents emits d² candidate pairs from ONE join key, so
    a corpus-wide boilerplate cluster turns the bucket join quadratic
    on a skewed key. Buckets larger than ``bucket_max`` are skipped
    entirely — at web scale a giant bucket is degenerate boilerplate,
    and its members still pair through exact-hash dedup upstream.
    Computed with a window over the bucket partition so the signature
    lineage is materialized by one exchange the self-join reuses.
    """
    bands = _bands(sig)
    if bucket_max is not None:
        from pyspark.sql import Window

        bands = (
            bands.withColumn(
                "_bucket_n",
                F.count(F.lit(1)).over(Window.partitionBy("band", "band_key")),
            )
            .filter(F.col("_bucket_n") <= bucket_max)
            .drop("_bucket_n")
        )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_estimate_vs_exact(docs: DataFrame, n: int = 3) -> DataFrame:
    """Sketch-accuracy evaluation for the MinHash signature: on every
    LSH candidate pair, the signature-estimated Jaccard (fraction of
    matching positions, the unbiased MinHash estimator) next to the
    EXACT shingle Jaccard and their absolute error — the measurement
    that justifies (or rejects) a sketch configuration before trusting
    it corpus-wide, the same eval rigor embed_ann_ivf_recall applies
    to ANN.

    Cost shape is identical to minhash_lsh_pairs: signature groupBy +
    band bucket join + per-candidate verify — never all-pairs; the
    estimator adds only a signature re-join on the (small) candidate
    list. Returns (doc_a, doc_b, est_jaccard, exact_jaccard,
    abs_error).
    """
    # materialize the signature table ONCE (doc_count x 17 longs): it
    # feeds THREE consumers — both band self-join sides inside
    # _band_candidates and the sa/sb estimate re-joins — so an
    # unmaterialized signature re-runs the corpus shingle explode +
    # 16-way salted-md5 min aggregation three times (the
    # _coactivity_edges rescan lesson; the r16 plan sweep counted 6
    # source scans for this operator, 4 of them signature
    # re-derivations, and the executed plan shows NO runtime exchange
    # reuse across the branches). Interleaved A/B at sf0.1 is flat
    # (min 2.15s vs 2.31s — the corpus passes are sub-100ms there);
    # the win is the scan count at scale, not the bench second.
    sig = minhash_signatures(docs, n).localCheckpoint(eager=True)
    candidates = _band_candidates(sig)

    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"_a{i}") for i in range(N_MINHASH)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"_b{i}") for i in range(N_MINHASH)],
    )
    n_match = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (n_match.cast("double") / N_MINHASH).alias("est_jaccard"),
        )
    )

    # same materialize-once for the exact shingle-set side: xa and xb
    # both read it (two more source scans otherwise)
    sets = fan_out(docs).select(
        "doc_id", _shingle_set(n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles")).localCheckpoint(
        eager=True
    )
    xa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("_sh_a"),
        F.col("n_shingles").alias("_na"),
    )
    xb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("_sh_b"),
        F.col("n_shingles").alias("_nb"),
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    jac = inter.cast("double") / (F.col("_na") + F.col("_nb") - inter)
    return (
        est.join(xa, "doc_a")
        .join(xb, "doc_b")
        .withColumn("exact_jaccard", jac)
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            "exact_jaccard",
            F.abs(F.col("est_jaccard") - F.col("exact_jaccard")).alias(
                "abs_error"
            ),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    bucket_max: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: band the 16-value signature into
    4 bands of 4, bucket-join docs sharing any band key, then verify
    candidates with the *exact* shingle Jaccard ≥ threshold.

    With 4 bands × 4 rows the candidate-recall curve is
    P(candidate) = 1 − (1 − j⁴)⁴ (≈97% at j=0.8, ≈26% at j=0.4), and
    verification removes false positives, so output ⊆ ngram_jaccard_pairs.

    ``bucket_max`` (optional) skips band buckets holding more than that
    many documents before the bucket join — the family-wide hot-key
    guard (see ``_band_candidates``); default None preserves exact
    recall on bounded corpora.
    """
    # materialize the signature ONCE (r16): without bucket_max the band
    # self-join inside _band_candidates reads the _bands explode twice,
    # re-running the corpus shingle explode + 16-way salted-md5 min
    # aggregation on both sides (the _coactivity_edges rescan lesson;
    # with bucket_max the window exchange already materializes the
    # lineage, and re-deriving a checkpointed frame's explode is a
    # per-doc projection). Interleaved A/B at sf0.1 is flat (the corpus
    # passes are sub-100ms there); the win is one corpus pass instead
    # of two at scale.
    sig = minhash_signatures(docs, n).localCheckpoint(eager=True)
    candidates = _band_candidates(sig, bucket_max=bucket_max)

    # Verify ONLY the candidate pairs (this is the whole point of LSH):
    # join the per-doc shingle sets back and intersect arrays in-place —
    # O(|candidates| × shingles-per-doc), never the all-pairs join.
    # The set side is materialized once too: sa and sb both read it
    # (two source scans + two in-row shingling passes otherwise).
    sets = fan_out(docs).select(
        "doc_id", _shingle_set(n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles")).localCheckpoint(
        eager=True
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("_sh_a"),
        F.col("n_shingles").alias("_na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("_sh_b"),
        F.col("n_shingles").alias("_nb"),
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    jac = inter.cast("double") / (F.col("_na") + F.col("_nb") - inter)
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash per document over whitespace tokens (with
    multiplicity): each bit of each token hash votes ±1; the sketch sets
    bit b iff the vote sum is positive. Single shuffle; the 32 vote sums
    are parallel partial aggregates."""
    tok = fan_out(docs).select(
        "doc_id",
        F.explode(tokens(F.col("text"))).alias("token"),
    ).withColumn("h", md5_long(F.col("token")))

    votes = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sketch = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long")),
        range(bits),
        F.lit(0).cast("long"),
    )
    return agg.select("doc_id", sketch.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = 32) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, using
    the pigeonhole trick: split the sketch into 4 byte-chunks — any pair
    within distance 3 shares at least one exact chunk, so candidates
    come from an equi-join on (chunk_index, chunk_value), never a cross
    join."""
    sk = simhash(docs, bits)
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    chunks = sk.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * chunk_bits).bitwiseAND(F.lit(mask))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def benchmark_contamination(
    docs: DataFrame,
    bench_modulus: int = 97,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, its
    n-gram overlap with any document of a (small) benchmark set —
    here the deterministic slice doc_id % bench_modulus == 0.

    overlap(c, b) = |shingles(c) ∩ shingles(b)| / |shingles(c)| — the
    asymmetric containment ratio (a corpus doc that embeds a whole
    benchmark question scores high even if it is much longer).

    Plan shape: ONLY the benchmark side's inverted index (shingle →
    bench_id) is built and broadcast — at 100 TB the corpus is streamed
    once through a broadcast hash join on shingle, no corpus-side
    shuffle of the index. Returns the top_k most-contaminated
    (doc_id, bench_id) pairs with a total tiebreak order.
    """
    shingles = _doc_shingles(docs, n)
    bench = shingles.filter(F.col("doc_id") % bench_modulus == 0).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    corpus = shingles.filter(F.col("doc_id") % bench_modulus != 0)
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        overlap.join(sizes, "doc_id")
        .select(
            "doc_id",
            "bench_id",
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("n_common").cast("double") / F.col("n_shingles")).alias(
                "overlap_ratio"
            ),
        )
        .orderBy(F.desc("overlap_ratio"), "doc_id", "bench_id")
        .limit(top_k)
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (Chaudhuri, Ganti &
    Kaushik, ICDE 2006; the candidate-generation core of PPJoin): for
    Jaccard ≥ t, any qualifying pair must overlap in at least
    ⌈t·|d|⌉ shingles of EITHER document, so under one global canonical
    token order it suffices to index only each document's first
    p = |d| − ⌈t·|d|⌉ + 1 tokens — the pigeonhole guarantees every
    qualifying pair collides on some prefix token.

    The canonical order is (document frequency ASC, shingle) — rarest
    first — which is what makes this superior to the plain
    shared-shingle join at corpus scale: candidate buckets form ONLY on
    each document's rarest shingles, so hot boilerplate shingles never
    generate candidates at all. Where ngram_jaccard_pairs needs the
    lossy ``df_max`` cap to bound fan-out (changing the similarity
    space), prefix filtering is LOSSLESS: the verify step computes
    exact full-space Jaccard, and the result is provably identical to
    the all-pairs join — which is exactly how the oracle checks it.

    Shuffle budget: df count (shingle), per-doc rank window (doc_id),
    prefix equi-join (shingle — rare keys only), and the verify join of
    candidate pairs against per-doc shingle arrays; every exchange is
    an equi-key hash, no cartesian anywhere. The (doc_id, shingle)
    index is localCheckpoint-ed once: it feeds four consumers (df
    counts, ranking, the verify arrays) and is exactly the inverted
    index a production set-similarity system materializes — without it
    every consumer re-runs the shingling scan (the audit counted 10).
    """
    sh = _doc_shingles(docs, n).localCheckpoint(eager=True)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc_id").orderBy("_df", "shingle")
    ranked = sh.join(dfreq, "shingle").select(
        "doc_id", "shingle", F.row_number().over(w).alias("_pos")
    )
    # NOT materialized (r16 measured negative result): `ranked` feeds
    # the size aggregate and both prefix self-join sides, but its
    # re-runs read the CHECKPOINTED sh — no source rescan — and an
    # eager checkpoint here serializes the window into its own job,
    # measured 2x slower interleaved at sf0.1 (min 2.45s -> 4.72s);
    # the parallel subtrees overlap instead, and at cluster scale the
    # replay cost is bounded by the already-materialized index.
    sizes = ranked.groupBy("doc_id").agg(F.max("_pos").alias("_n"))
    prefix = (
        ranked.join(sizes, "doc_id")
        .filter(
            F.col("_pos")
            <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
        )
        .select("doc_id", "shingle")
    )
    a = prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrs = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("_set")
    )
    sa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("_set").alias("_sa"))
    sb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("_set").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    jac = inter.cast("double") / (
        F.size("_sa") + F.size("_sb") - inter
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("intersection_size"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def exact_substring_coverage(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document coverage by CROSS-DOC duplicated n-token spans —
    the ExactSubstr statistic of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), which removes the
    duplicated SUBSTRINGS rather than whole near-dup documents (the
    suffix-array step of the paper, re-expressed as shingle
    equi-joins):

    1. every positional n-gram hashes to a 60-bit fingerprint
       (md5_long of the space-joined tokens — narrow codegen);
    2. fingerprints held by ≥2 distinct docs are the duplicated spans
       (one groupBy — the only corpus-wide shuffle, partial-combined);
    3. each doc's duplicated [pos, pos+n) spans merge into disjoint
       islands with the classic running-max sweep (one window per
       doc), giving exact covered-token counts.

    Pure integer arithmetic end-to-end, so the statistic is
    bit-reproducible in any engine. At 100 TB this is the scalable
    reformulation of the paper's suffix array: the dup-fingerprint
    table is tiny relative to the corpus and the sweep state is one
    integer per doc — no global sort, no suffix structure.

    Returns (id, n_tokens, covered_tokens) — one row per doc, zero
    coverage included.
    """
    tok = fan_out(docs).select(
        F.col(id_col), tokens(text_col).alias("_arr")
    ).localCheckpoint(eager=True)  # grams + per-doc sizes both read it
    grams = tok.select(
        id_col,
        F.posexplode(word_shingles(F.col("_arr"), n)).alias("_pos", "_g"),
    ).select(id_col, "_pos", md5_long("_g").alias("_h"))
    # cross-doc duplication test as ONE window over the fingerprint
    # partition (r16, guide §2.4): min(id) != max(id) over the _h
    # partition <=> the fingerprint is held by >= 2 distinct docs —
    # exactly the old count_distinct(id) >= 2 groupBy, but the groupBy
    # + self-join it fed re-derived the positional-gram explode (the
    # operator's heaviest map work) a second time. One exchange on _h
    # now materializes the gram lineage once and both extrema ride it.
    w_h = Window.partitionBy("_h")
    spans = (
        grams.withColumn("_mn", F.min(id_col).over(w_h))
        .withColumn("_mx", F.max(id_col).over(w_h))
        .filter(F.col("_mn") != F.col("_mx"))
        .select(
            id_col,
            F.col("_pos").alias("_s"),
            (F.col("_pos") + n).alias("_e"),
        )
    )
    w_order = Window.partitionBy(id_col).orderBy("_s")
    prev_max_e = F.max("_e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = spans.select(
        id_col,
        "_s",
        "_e",
        F.when(
            prev_max_e.isNull() | (F.col("_s") > prev_max_e), 1
        ).otherwise(0).alias("_new"),
    ).select(
        id_col,
        "_s",
        "_e",
        F.sum("_new").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_island"),
    )
    covered = (
        islands.groupBy(id_col, "_island")
        .agg((F.max("_e") - F.min("_s")).alias("_cov"))
        .groupBy(id_col)
        .agg(F.sum("_cov").alias("covered_tokens"))
    )
    return (
        tok.select(id_col, F.size("_arr").cast("long").alias("n_tokens"))
        .join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    min_shingles: int = 5,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: ordered pairs where doc_inner's
    shingle set is mostly inside doc_outer's — containment
    C(A→B) = |A∩B| / |A| ≥ threshold. Jaccard misses exactly these
    (a short quote inside a long page scores near-zero Jaccard but
    containment 1.0); it is the right statistic for boilerplate
    extraction, quote detection, and subset-document dedup (Broder's
    original resemblance/containment pair).

    Same scale shape as ngram_jaccard_pairs: candidates from the
    shared-shingle equi-join (never all-pairs), ONE intersection
    aggregation per unordered pair, then both ordered directions emit
    from that single row by dividing by the respective set size. Docs
    under ``min_shingles`` are excluded — a 1-shingle doc is trivially
    contained everywhere and says nothing.

    Returns (doc_inner, doc_outer, intersection_size, containment).
    """
    # materialize the shingle working set ONCE: it feeds five consumers
    # (both pair-join sides, the size aggregate, and both per-direction
    # size lookups) — without the checkpoint every consumer re-derives
    # scan + explode + distinct, which the plan sweep measured as 12
    # scans of the source table for this operator
    sh = _doc_shingles(docs, n).localCheckpoint(eager=True)
    sizes = (
        sh.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
        .filter(F.col("n_shingles") >= min_shingles)
        .localCheckpoint(eager=True)
    )
    sh = sh.join(sizes.select("doc_id"), "doc_id")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("intersection_size"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("_nb"))
    # materialize the per-pair intersection table ONCE before the
    # two-direction union reads it twice (r16): without this the
    # shared-shingle pair join + intersection aggregate (the operator's
    # whole cost) executes once PER UNION BRANCH — the r16 plan sweep
    # shows the full SortMergeJoin+HashAggregate subtree duplicated
    # under Union, and the EXECUTED plan confirms no runtime exchange
    # reuse across the branches. Candidate-pair-sized (bounded by the
    # equi-join fan-out, orders of magnitude below the shingle stream),
    # so the checkpoint is cheap at any scale. Interleaved A/B at sf0.1
    # is flat (the pair join is ~100ms there); the win is running the
    # join once instead of twice at scale.
    both = (
        inter.join(sa, "doc_a").join(sb, "doc_b").localCheckpoint(eager=True)
    )
    directed = both.select(
        F.col("doc_a").alias("doc_inner"),
        F.col("doc_b").alias("doc_outer"),
        "intersection_size",
        (F.col("intersection_size").cast("double") / F.col("_na")).alias(
            "containment"
        ),
    ).unionAll(
        both.select(
            F.col("doc_b").alias("doc_inner"),
            F.col("doc_a").alias("doc_outer"),
            "intersection_size",
            (
                F.col("intersection_size").cast("double") / F.col("_nb")
            ).alias("containment"),
        )
    )
    return directed.filter(F.col("containment") >= threshold)


def incremental_minhash_lsh(
    old_docs: DataFrame,
    new_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: probe a NEW document batch
    against the EXISTING corpus's MinHash-LSH index without re-pairing
    the corpus — the production shape of dedup at 100 TB, where the
    corpus index (the ``_bands`` table: doc_id × band × band_key) is a
    stored artifact and each ingest batch only (a) signs its own docs,
    (b) bucket-joins its bands against the index, (c) exact-verifies
    the candidates. Cost per batch is O(|batch|) signing + a join whose
    small side is the batch's bands (broadcast at real batch sizes) —
    the corpus is touched only at its index and only for candidate
    rows; contrast ``minhash_lsh_pairs``, which re-pairs everything.

    Here both indexes are derived in-query from the split (no stored
    tables in the harness); the lexical incremental sibling is
    ``incremental_new_docs`` (exact content-hash anti-join). Returns
    (new_doc, old_doc, jaccard ≥ threshold) with the exact verified
    Jaccard — symmetric, so values match the batch operator's on the
    same pair.
    """
    bn = _bands(minhash_signatures(new_docs, n))
    bo = _bands(minhash_signatures(old_docs, n))
    candidates = (
        bn.alias("a")
        .join(
            bo.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col("a.doc_id").alias("new_doc"),
            F.col("b.doc_id").alias("old_doc"),
        )
        .distinct()
    )
    sa = fan_out(new_docs).select(
        F.col("doc_id").alias("new_doc"),
        _shingle_set(n).alias("_sh_a"),
    ).withColumn("_na", F.size("_sh_a"))
    sb = fan_out(old_docs).select(
        F.col("doc_id").alias("old_doc"),
        _shingle_set(n).alias("_sh_b"),
    ).withColumn("_nb", F.size("_sh_b"))
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    jac = inter.cast("double") / (F.col("_na") + F.col("_nb") - inter)
    return (
        candidates.join(sa, "new_doc")
        .join(sb, "old_doc")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("new_doc", "old_doc", "jaccard")
    )


def fastss_edit1_pairs(strings: DataFrame, col: str = "name") -> DataFrame:
    """Exact edit-distance-1 pair join via the FastSS deletion
    neighborhood (Bocek et al. 2007): each distinct string emits itself
    plus its |s| single-character-deletion variants; two strings within
    edit distance 1 ALWAYS share a variant (substitution at i →
    del_i(a) = del_i(b); insertion/deletion → one string IS a variant
    of the other), so an equi-join on the variant key generates a
    candidate superset and a final ``levenshtein() <= 1`` verify makes
    it exact — the filter-verify shape, never the O(n²) cross join.

    Scale posture: candidate generation is a narrow explode (|s|+1
    variants per string, so fan-out is bounded by string length, not
    corpus size); the join key is a short string — hash-partitionable,
    and variant-key collisions beyond true matches are rare for natural
    keys (worst case: very short strings over a tiny alphabet — cap
    with a df-style filter as in ngram_jaccard_pairs if that regime
    appears). Verification is per-candidate-pair integer Levenshtein in
    codegen. Mirrors the reference's exact-dup detector
    (TripDuplicateDetectorService.cs:36-49) upgraded to fuzzy keys.

    Returns (name_a, name_b, dist) with name_a < name_b, dist == 1
    (equal strings are not pairs).
    """
    variants = F.concat(
        F.array(F.col("name")),
        F.expr(
            "transform(sequence(1, length(name)), i ->"
            " concat(substring(name, 1, i - 1),"
            " substring(name, i + 1, 1000000)))"
        ),
    )
    exploded = (
        strings.select(F.col(col).alias("name")).distinct()
        .select("name", F.explode(variants).alias("variant"))
        .distinct()  # a string can yield the same deletion twice ("aa")
    )
    right = exploded.select(
        F.col("name").alias("name_b"), F.col("variant").alias("variant")
    )
    return (
        exploded.withColumnRenamed("name", "name_a")
        .join(right, "variant")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
    )


def boilerplate_line_removal(
    docs: DataFrame,
    lines,
    min_docs: int = 2,
    min_doc_frac: float = 0.0,
) -> DataFrame:
    """Line-level boilerplate dedup (the RefinedWeb / CCNet pass that
    doc-level dedup cannot express): a LINE that recurs across many
    DISTINCT documents is boilerplate (headers, footers, nav chrome,
    cookie banners) and is stripped from every document that carries
    it, while the surrounding document survives.

    ``lines`` is a Column producing ``array<string>`` line units from a
    document row — ``split(text, '\\n')`` for real corpora; callers on
    unstructured text pass a deterministic chunker. A line is flagged
    when its document frequency reaches
    ``max(min_docs, ceil(min_doc_frac * n_docs))`` — the corpus-size-
    relative threshold CCNet uses (it dedups lines by hash over shards).

    Scale shape: explode to (doc, line) is a narrow map bounded by
    corpus text size; document frequency is ONE groupBy on the line
    hash (md5 — 16 bytes travels, never the line text); the flagged
    set re-joins the exploded lines on the same hash key, so the two
    shuffles share a partitioning. The corpus-count scalar rides in as
    a broadcast 1-row aggregate, never a driver collect. Returns one
    row per document: (doc_id, n_lines, n_boilerplate_lines,
    chars_kept, chars_removed) — all exact integers.
    """
    per_line = fan_out(docs).select(
        "doc_id", F.explode(lines).alias("line")
    ).select("doc_id", "line", F.md5("line").alias("lh"))
    ndocs_row = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = (
        per_line.select("doc_id", "lh").distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    boiler = (
        dfreq.crossJoin(F.broadcast(ndocs_row))
        .filter(
            F.col("line_df")
            >= F.greatest(
                F.lit(min_docs),
                F.ceil(F.lit(min_doc_frac) * F.col("n_docs")),
            )
        )
        .select("lh", F.lit(True).alias("is_boiler"))
    )
    flagged = per_line.join(boiler, "lh", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("is_boiler"), 1).otherwise(0)
        ).cast("bigint").alias("n_boilerplate_lines"),
        F.sum(
            F.when(F.col("is_boiler").isNull(), F.length("line")).otherwise(0)
        ).cast("bigint").alias("chars_kept"),
        F.sum(
            F.when(F.col("is_boiler"), F.length("line")).otherwise(0)
        ).cast("bigint").alias("chars_removed"),
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Snapshot-to-snapshot corpus DELTA card — the continuous-ingestion
    counterpart of ``incremental_new_docs``: instead of only surfacing
    never-seen content, diff two full crawl snapshots into the four CDC
    classes (added / removed / changed / unchanged, change detected by
    content hash) and account the per-source token movement. This is
    the freshness/churn table a recurring pretraining refresh reads
    before deciding what to re-tokenize, what dedup state to invalidate,
    and whether a source's churn rate makes its snapshots worth the
    re-crawl.

    Registered in round 10 as ``dedup_snapshot_delta`` (two-scale
    oracle lock in tests/test_staged_oracles.py).

    Scale shape: ONE full-outer equi-join on the document id (both
    sides co-shuffle on the same key — the standard CDC diff plan) and
    ONE map-side-combined per-source rollup; the classification is a
    codegen when-chain over the joined row. All outputs are exact
    BIGINTs (counts and a token delta), so the card hash-matches a SQL
    replay.

    Returns one row per source: (source, n_added, n_removed,
    n_changed, n_unchanged, token_delta = Σ new tokens − Σ old
    tokens over that source's rows, attributed as below).

    Source ATTRIBUTION rule: each doc is accounted to
    ``coalesce(new_source, old_source)`` — a doc whose source field
    moved between snapshots belongs entirely to its NEW source (its
    old tokens are subtracted from the new source's token_delta, so
    per-source deltas still sum to the corpus-wide token movement),
    and a source-only move with identical text classes as
    'unchanged': change is detected by CONTENT hash alone, which is
    the signal a re-tokenization decision needs (the bytes are the
    cost; the label is free). Callers who treat a source move as
    churn should fold the source into the id or the hashed text.
    """
    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_o_src"),
        F.md5(F.col(text_col)).alias("_o_hash"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_o_tok"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_n_src"),
        F.md5(F.col(text_col)).alias("_n_hash"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_n_tok"),
    )
    j = o.join(n, "_id", "full_outer")
    cls = (
        F.when(F.col("_o_hash").isNull(), F.lit("added"))
        .when(F.col("_n_hash").isNull(), F.lit("removed"))
        .when(F.col("_o_hash") != F.col("_n_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("_n_src"), F.col("_o_src")).alias("source"),
            cls.alias("_cls"),
            (
                F.coalesce(F.col("_n_tok"), F.lit(0))
                - F.coalesce(F.col("_o_tok"), F.lit(0))
            ).alias("_dtok"),
        )
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("_cls") == "added", 1).otherwise(0))
            .cast("long")
            .alias("n_added"),
            F.sum(F.when(F.col("_cls") == "removed", 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("_cls") == "changed", 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.sum(F.when(F.col("_cls") == "unchanged", 1).otherwise(0))
            .cast("long")
            .alias("n_unchanged"),
            F.sum("_dtok").cast("long").alias("token_delta"),
        )
    )


def ngram_novelty(
    old: DataFrame,
    new: DataFrame,
    n: int = 3,
    source_col: str = "source",
) -> DataFrame:
    """Per-source N-GRAM NOVELTY of a new snapshot against a reference
    corpus: the fraction of each source's distinct word n-grams never
    seen in the reference — the companion number to
    ``snapshot_delta``'s row-level churn: a source can churn many rows
    while contributing near-zero novel text (template rotation,
    re-crawls) or ship few rows carrying genuinely new language, and
    novelty-per-token is what decides whether a snapshot is worth
    re-tokenizing. The same statistic run against a benchmark corpus
    is the contamination complement (LOW novelty = overlap alert).

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Pure integer counts (distinct grams per source, LEFT ANTI join
    against the reference gram set) with one final rounded division —
    hash-exact cross-engine.

    Scale shape: each side shingles once (narrow in-row expansion,
    the let-bound ``word_shingles``); the reference gram set and the
    (source, gram) table are both gram-keyed, so the anti join
    co-shuffles on the gram — one wide exchange each side, no
    broadcast of anything corpus-sized; the rollup is
    map-side-combined and sources-sized. Returns one row per source:
    (source, n_grams, n_novel, novelty_rate = round(novel/grams, 6)).
    """
    ref = (
        old.select(F.explode(_shingle_set(n)).alias("g"))
        .distinct()
    )
    sg = (
        new.select(
            F.col(source_col).alias("source"),
            F.explode(_shingle_set(n)).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # totals + anti join both read it
    )
    totals = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    novel = (
        sg.join(ref, "g", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return totals.join(novel, "source", "left").select(
        "source",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.coalesce("n_novel", F.lit(0)).cast("double")
            / F.col("n_grams").cast("double"),
            6,
        ).alias("novelty_rate"),
    )


def cluster_size_histogram(docs: DataFrame) -> DataFrame:
    """Histogram of EXACT-DUPLICATE cluster sizes — the structural
    companion to ``exact_duplicates`` (which picks winners): how much
    of the corpus sits in 2-copies, 10-copies, 1000-copies clusters.
    The shape decides the dedup strategy (a fat head of mega-clusters
    is boilerplate → one canonical survives; a long tail of pairs is
    mirrors → URL-canonicalization first), and doc_share is the exact
    fraction of the corpus each cluster size holds.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Exact integers end to end (md5 content digest → cluster sizes →
    size multiplicities); the only doubles are the two 6-dp share
    divisions. Scale shape: one digest groupBy (the exact-dedup
    shuffle), one map-side-combined size rollup — the histogram table
    is bounded by the size DOMAIN (max copies of one text), never by
    corpus size; shares attach via one 1-row broadcast. Returns one
    row per occupied cluster size:
    (cluster_size, n_clusters, n_docs, doc_share, dedup_savings_share)
    — savings = fraction of the corpus removable keeping one canonical
    per cluster, repeated per row like the LPA modularity.
    """
    sizes = (
        docs.select(F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    )
    hist = (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        # bounded by the size domain — and the totals branch would
        # otherwise replay the whole digest groupBy (2 corpus scans)
        .localCheckpoint(eager=True)
    )
    totals = hist.agg(
        F.coalesce(F.sum(F.col("cluster_size") * F.col("n_clusters")), F.lit(0))
        .cast("long")
        .alias("_docs"),
        F.coalesce(F.sum("n_clusters"), F.lit(0)).cast("long").alias("_clusters"),
    )
    return (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            F.round(
                (F.col("cluster_size") * F.col("n_clusters")).cast("double")
                / F.col("_docs").cast("double"),
                6,
            ).alias("doc_share"),
            F.round(
                (F.col("_docs") - F.col("_clusters")).cast("double")
                / F.col("_docs").cast("double"),
                6,
            ).alias("dedup_savings_share"),
        )
        .orderBy("cluster_size")
    )


def contamination_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """TRAIN/EVAL CONTAMINATION card: the share of the eval set's word
    n-grams that also occur anywhere in the training corpus — by
    distinct TYPE and by OCCURRENCE mass. The decontamination number
    an LLM-data pipeline must publish before any benchmark claim
    (n-gram overlap is the standard contamination screen — the
    GPT-3/PaLM 8-gram methodology, here on the repo's shared
    word-shingle tokenization): type_rate says how much of the eval
    SURFACE is compromised, occurrence_rate weights it by how often
    eval actually exercises those n-grams.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: both sides shingle identically; the intersection is
    an exact distinct-key semi-join; all five counts are exact longs,
    the two rates the only doubles (6-dp). An empty eval side (or all
    eval docs shorter than ``n`` tokens) reports NULL rates instead
    of an ANSI DIVIDE_BY_ZERO (degenerate contract, r14 ADVICE).

    Scale shape: one shingle explode per side, collapsed map-side —
    the train side straight to its DISTINCT type set (never carrying
    occurrence counts it doesn't need), the eval side to (type,
    occurrences); ONE shingle-keyed left-semi join marks contaminated
    eval types; two bounded rollups assemble the 1-row card. Nothing
    broadcast (both type sets are corpus-scaled), nothing collected.
    Returns (n_eval_types, n_contaminated_types, type_rate,
    n_eval_occurrences, n_contaminated_occurrences, occurrence_rate).
    """
    def shingles(df: DataFrame):
        return df.select(
            F.explode(
                let(tokens(F.col(text_col)), lambda t: word_shingles(t, n))
            ).alias("s")
        )

    train_types = shingles(train).distinct()
    eval_counts = (
        shingles(eval_docs)
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # read by both rollups below
    )
    hit = eval_counts.join(train_types, "s", "left_semi")
    tot = eval_counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_types"),
        F.sum("c").cast("long").alias("n_eval_occurrences"),
    )
    con = hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_contaminated_types"),
        F.coalesce(F.sum("c"), F.lit(0))
        .cast("long")
        .alias("n_contaminated_occurrences"),
    )
    # empty eval side (or all eval docs shorter than n tokens): NULL
    # rates instead of an ANSI DIVIDE_BY_ZERO — the repo's degenerate
    # contract (r14 ADVICE item 2)
    return tot.crossJoin(F.broadcast(con)).select(
        "n_eval_types",
        "n_contaminated_types",
        F.when(
            F.col("n_eval_types") > 0,
            F.round(
                F.col("n_contaminated_types").cast("double")
                / F.col("n_eval_types").cast("double"),
                6,
            ),
        ).alias("type_rate"),
        "n_eval_occurrences",
        "n_contaminated_occurrences",
        F.when(
            F.col("n_eval_occurrences") > 0,
            F.round(
                F.col("n_contaminated_occurrences").cast("double")
                / F.col("n_eval_occurrences").cast("double"),
                6,
            ),
        ).alias("occurrence_rate"),
    )


def ngram_containment_topk(
    docs: DataFrame,
    n: int = 3,
    k: int = 25,
    df_max: int | None = None,
) -> DataFrame:
    """Top-k document pairs by n-gram CONTAINMENT (overlap
    coefficient |A∩B| / min(|A|,|B|)) — the SUBSET-duplicate detector
    Jaccard structurally misses: a doc pasted whole into a 10× longer
    one scores Jaccard ≈ 0.1 (union-dominated) but containment 1.0.
    The expansion/quote/boilerplate-wrapper dedup leg beside
    ngram_jaccard (symmetric near-dup) and FastSS (edit-distance),
    on the same shingle space.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: candidate pairs from the shared-shingle equi-join
    (doc_a < doc_b); intersection and both set sizes are exact longs
    in the SAME (optionally df_max-filtered) shingle space — the
    ngram_jaccard_pairs contract; containment is one correctly-
    rounded double division; the top-k order is (containment DESC,
    doc_a ASC, doc_b ASC) — a total order.

    Scale shape: identical to ngram_jaccard_pairs (set sizes ride the
    self-join as a doc-partitioned window column, the b side is a
    ReusedExchange of the a side, one pair-keyed map-side-combined
    groupBy); ``df_max`` is the fan-out knob at 100 TB (drop
    ubiquitous shingles before pairing — mandatory on boilerplate-
    heavy corpora, where exactly this operator fires most). The
    top-k is orderBy+limit = TakeOrderedAndProject. Returns k rows:
    (doc_a, doc_b, intersection_size, n_a, n_b, containment).
    """
    sh = _doc_shingles(docs, n)
    if df_max is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_max)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sh = sh.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("_n").alias("_na")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("_n").alias("_nb")
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("intersection_size"),
            F.min("_na").cast("long").alias("n_a"),
            F.min("_nb").cast("long").alias("n_b"),
        )
    )
    cont = F.col("intersection_size").cast("double") / F.least(
        "n_a", "n_b"
    ).cast("double")
    return (
        inter.withColumn("containment", F.round(cont, 6))
        .orderBy(
            F.desc("containment"), F.asc("doc_a"), F.asc("doc_b")
        )
        .limit(k)
    )


def cluster_source_purity(
    docs: DataFrame,
    prefix_tokens: int = 8,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """DUPLICATE-CLUSTER source purity: cluster documents by their
    first-``prefix_tokens``-words fingerprint, keep clusters of two
    or more, and report the size histogram split into PURE (one
    source) vs MIXED (several sources) with the doc-mass audit. The
    provenance question under every dedup decision: pure clusters
    are a re-crawled/mirrored source (fix the ingest), mixed
    clusters are genuine cross-source syndication (first-wins dedup
    silently picks a winner SOURCE — this card says how often, the
    number a licensing/attribution review needs BEFORE the dedup
    pass deletes the evidence).

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: the fingerprint is the literal first-k-token join
    (both engines slice the same whitespace token array — exact
    string equality, no hashing); all counts are exact longs; the
    mixed-doc share divides once, 6-dp. Docs shorter than
    ``prefix_tokens`` cluster on their full text prefix (documented
    — a short boilerplate line is exactly what should cluster).

    Scale shape: ONE tokenize + slice projection, ONE
    map-side-combined groupBy(fingerprint) carrying (count, distinct
    sources) — never an all-pairs join; the >= 2 filter drops the
    singleton mass BEFORE the histogram rollup; the size histogram
    and 1-row audit are bounded-table arithmetic. Returns one row
    per (cluster_size, is_mixed) cell: (cluster_size, is_mixed,
    n_clusters, n_docs, n_clustered_docs_total, mixed_doc_share),
    ordered.
    """
    fp = F.array_join(
        F.slice(tokens(F.col(text_col)), 1, prefix_tokens), " "
    )
    clusters = (
        docs.select(fp.alias("_fp"), F.col(source_col).alias("_s"))
        .groupBy("_fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_c"),
            F.countDistinct("_s").cast("long").alias("_ns"),
        )
        .filter(F.col("_c") >= 2)
    )
    hist = (
        clusters.groupBy(
            F.col("_c").alias("cluster_size"),
            (F.col("_ns") > 1).alias("is_mixed"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("_c").cast("long").alias("n_docs"),
        )
        .localCheckpoint(eager=True)  # bounded: size domain x 2
    )
    audit = hist.agg(
        F.sum("n_docs").cast("long").alias("n_clustered_docs_total"),
        F.when(
            F.sum("n_docs") > 0,
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("is_mixed"), F.col("n_docs"))),
                    F.lit(0),
                ).cast("double")
                / F.sum("n_docs").cast("double"),
                6,
            ),
        ).alias("mixed_doc_share"),
    )
    return (
        hist.crossJoin(F.broadcast(audit))
        .select(
            "cluster_size",
            "is_mixed",
            "n_clusters",
            "n_docs",
            "n_clustered_docs_total",
            "mixed_doc_share",
        )
        .orderBy("cluster_size", "is_mixed")
    )
