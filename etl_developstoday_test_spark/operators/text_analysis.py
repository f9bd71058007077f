"""Text-analysis operators for training-data pipelines, over the
``documents`` table (doc_id, text, lang, source, n_chars).

All pure Spark built-ins (array lambdas run inside codegen) — no Python
UDFs — so they scale linearly with input and survive a 100 TB corpus:
every operator is a narrow map over the scan (zero shuffles) except
where noted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from etl_developstoday_test_spark.functions import (
    let,
    md5_long,
    tokens,
    word_shingles,
)

# Tiny per-language function-word lists for the n-gram/stopword language
# heuristic. Deliberately small and embedded: the operator shape (token
# match counting + argmax) is what matters; swap in real wordlists for
# production use.
LANG_WORDLISTS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "es": ["el", "los", "las", "y", "es", "que", "un"],
    "fr": ["le", "les", "et", "est", "que", "une", "dans"],
}

STOPWORDS = sorted({w for ws in LANG_WORDLISTS.values() for w in ws})


def _count_in(tok: Column, words: list[str]) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(words))).cast("long")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, unique tokens, non-space chars.
    The token array is let-bound so the split runs once per row."""
    return docs.select(
        "doc_id",
        let(tokens(F.col("text")), lambda t: F.size(t).cast("long")).alias("n_tokens"),
        let(
            tokens(F.col("text")),
            lambda t: F.size(F.array_distinct(t)).cast("long"),
        ).alias("n_unique_tokens"),
        F.length(F.regexp_replace(F.trim("text"), r"\s+", "")).cast("long").alias("n_token_chars"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Heuristic document-quality scoring from length / alphabetic-ratio
    / stopword-ratio / type-token-ratio signals. All ratios are
    int/int double divisions (deterministic); the score combines them
    with fixed-order double arithmetic. ``carry`` names extra input
    columns to pass through unchanged (the map stays narrow)."""
    n_chars = F.length("text").cast("long")
    alpha_chars = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long")

    base = docs.select(
        "doc_id",
        *carry,
        n_chars.alias("n_chars"),
        let(tokens(F.col("text")), lambda t: F.size(t).cast("long")).alias("n_tokens"),
        (alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        let(
            tokens(F.col("text")),
            lambda t: _count_in(t, STOPWORDS).cast("double") / F.size(t),
        ).alias("stopword_ratio"),
        let(
            tokens(F.col("text")),
            lambda t: F.size(F.array_distinct(t)).cast("double") / F.size(t),
        ).alias("type_token_ratio"),
    )
    score = (
        F.col("alpha_ratio") * 0.4
        + F.col("stopword_ratio") * 0.3
        + F.col("type_token_ratio") * 0.3
    )
    return base.withColumn("quality_score", score)


def lang_id(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Wordlist-vote language identification: count function-word hits
    per language, argmax with alphabetical tie-break ('und' = unknown
    when nothing matches). ``carry`` names extra input columns passed
    through unchanged (the map stays narrow)."""
    def _hits(words: list[str]):
        # single-arg lambda required: PySpark uses lambda arity to pick
        # the (element) vs (element, index) HOF signature
        return lambda t: _count_in(t, words)

    scored = docs.select(
        "doc_id",
        "lang",
        *carry,
        *[
            let(tokens(F.lower(F.col("text"))), _hits(ws)).alias(f"hits_{lang}")
            for lang, ws in sorted(LANG_WORDLISTS.items())
        ],
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_WORDLISTS)])
    pred = F.lit("und")
    # reverse alphabetical chain so the earliest language wins ties
    for lang in sorted(LANG_WORDLISTS, reverse=True):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), lang
        ).otherwise(pred)
    return scored.withColumn("predicted_lang", pred)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercase
    text + a 60-bit integer bucket of it (shard key for distributed
    near-dup grouping)."""
    normalized = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        (md5_long(normalized) % 1024).alias("fingerprint_bucket"),
    )


# PII scrubbing: pattern → redaction token, applied in list order. The
# patterns use only RE2-safe syntax (\b, classes, bounded repeats) so
# the DuckDB oracle's regexp engine matches Java's byte-for-byte on
# them. Counts are defined over the ORIGINAL text per pattern;
# replacement is sequential in list order on both engines.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact common PII shapes (emails, phone numbers, SSNs) from a
    text column — the standard pre-training scrub pass. Pure codegen
    ``regexp_replace`` chain (no Python), a narrow map over the scan:
    scales with bytes read at any corpus size.

    Returns the input columns with ``text`` replaced by the scrubbed
    value plus one ``n_<kind>`` match count per pattern (counted on the
    original text, so counts are independent of replacement order).
    """
    scrubbed = F.col(text_col)
    counts = []
    for kind, pattern, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    others = [c for c in docs.columns if c != text_col]
    return docs.select(*others, scrubbed.alias(text_col), *counts)


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_overlap(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into fixed-size overlapping token chunks —
    the context-window packing step of a training pipeline.

    Chunk starts are 0, stride, 2·stride, … while start < n_tokens; the
    last chunk may be short; an empty/short doc yields one chunk. Pure
    codegen (split + sequence + slice under posexplode) — a narrow map,
    zero shuffles, so it scales with the scan. Returns
    (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    tok = tokens(F.col("text"))
    starts = let(
        tok,
        lambda t: F.sequence(
            F.lit(0),
            F.greatest(F.size(t) - 1, F.lit(0)),
            F.lit(stride),
        ),
    )
    out = docs.select(
        "doc_id",
        let(tok, lambda t: t).alias("_tok"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    chunk = F.slice(F.col("_tok"), F.col("start_token") + 1, chunk_tokens)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_token").cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def repetition_ratio(docs: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document repetition signal (Gopher/RefinedWeb-style): the
    fraction of n-gram occurrences that are repeats of an earlier
    n-gram in the same document, plus the duplicate-token fraction.
    High values flag boilerplate/spam for corpus filtering.

    All-codegen narrow map: shingles WITH duplicates kept vs their
    distinct set; zero shuffles. Ratios are int/int double divisions
    (deterministic). Returns (doc_id, n_ngrams, n_unique_ngrams,
    dup_ngram_ratio, dup_token_ratio).
    """
    from etl_developstoday_test_spark.functions import word_shingles

    tok = tokens(F.col("text"))
    all_sh = let(tok, lambda t: word_shingles(t, n))
    base = docs.select(
        "doc_id",
        let(tok, lambda t: F.size(t).cast("long")).alias("n_tokens"),
        let(tok, lambda t: F.size(F.array_distinct(t)).cast("long")).alias(
            "n_unique_tokens"
        ),
        F.size(all_sh).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(all_sh)).cast("long").alias("n_unique_ngrams"),
    )
    return base.select(
        "doc_id",
        "n_ngrams",
        "n_unique_ngrams",
        F.when(
            F.col("n_ngrams") > 0,
            (F.col("n_ngrams") - F.col("n_unique_ngrams")).cast("double")
            / F.col("n_ngrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_ratio"),
        F.when(
            F.col("n_tokens") > 0,
            (F.col("n_tokens") - F.col("n_unique_tokens")).cast("double")
            / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_ratio"),
    )


def token_rarity(docs: DataFrame, broadcast_model: bool = True) -> DataFrame:
    """Corpus-frequency rarity score per document: the mean document
    frequency of its distinct tokens — a cheap, fully deterministic
    stand-in for LM-perplexity corpus filtering (rare-vocabulary docs
    score low, boilerplate scores high).

    Two-pass shape: pass 1 aggregates the vocabulary (token → doc
    frequency; vocabulary-sized, shuffles once), pass 2 streams the
    corpus once against the vocabulary — broadcast by DEFAULT (a
    curated corpus's vocabulary is dimension-sized), but a noisy
    web-scale crawl's open vocabulary outgrows driver memory, so
    ``broadcast_model=False`` drops the hint and the join becomes a
    shuffle equi-join on the token (AQE still broadcasts when it
    measures small) — values identical, the ``bpe_encode_stats``
    hatch contract. Mean-df stays in exact integer arithmetic until
    one final double division.
    Returns (doc_id, n_distinct_tokens, total_df, mean_token_df).
    """
    tok_rows = docs.select(
        "doc_id",
        F.explode(
            let(tokens(F.col("text")), lambda t: F.array_distinct(t))
        ).alias("token"),
    )
    vocab = tok_rows.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    if broadcast_model:
        vocab = F.broadcast(vocab)
    per_doc = (
        tok_rows.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            F.sum("df").cast("long").alias("total_df"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_distinct_tokens",
        "total_df",
        (F.col("total_df").cast("double") / F.col("n_distinct_tokens")).alias(
            "mean_token_df"
        ),
    )


# GPT-2-style pre-tokenizer pattern, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookaheads, disjoint branches (contractions / space+letters /
# space+digits / space+punct / whitespace runs)
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
)


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pre-tokenizer regex applied as
    a codegen `regexp_extract_all` — the standard training-cost
    estimator (LLM token count ≈ BPE pieces, not whitespace words).
    Whitespace-run matches are excluded from the token count but
    returned separately. Narrow map, zero shuffles.
    Returns (doc_id, n_bpe_tokens, n_ws_runs, bpe_per_word)."""
    pieces = F.regexp_extract_all("text", F.lit(BPE_TOKEN_PATTERN), 0)
    base = docs.select(
        "doc_id",
        let(
            F.col("text"),
            lambda t: F.size(
                F.filter(
                    F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), 0),
                    lambda p: ~p.rlike(r"^\s+$"),
                )
            ).cast("long"),
        ).alias("n_bpe_tokens"),
        let(
            F.col("text"),
            lambda t: F.size(
                F.filter(
                    F.regexp_extract_all(t, F.lit(BPE_TOKEN_PATTERN), 0),
                    lambda p: p.rlike(r"^\s+$"),
                )
            ).cast("long"),
        ).alias("n_ws_runs"),
        let(tokens(F.col("text")), lambda t: F.size(t).cast("long")).alias(
            "n_words"
        ),
    )
    return base.select(
        "doc_id",
        "n_bpe_tokens",
        "n_ws_runs",
        (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias(
            "bpe_per_word"
        ),
    )


# First-failure quality routing rules: (verdict, threshold description).
# Order is the contract — a document gets the FIRST rule it violates,
# exactly the reference parser's error-routing semantics
# (TripRowParserService.cs:33-92: first invalid field wins) applied to
# corpus filtering instead of row parsing.
QUALITY_ROUTE_LANGS = ("en", "de", "fr", "es")


def quality_route(
    docs: DataFrame,
    min_tokens: int = 20,
    min_alpha: float = 0.815,
    max_dup: float = 0.65,
    allowed_langs: tuple[str, ...] = QUALITY_ROUTE_LANGS,
) -> DataFrame:
    """Route every document to ``ok`` or its FIRST failing quality rule
    (Gopher/RefinedWeb-style corpus filtering with quarantine
    accounting): too_short → low_alpha → too_repetitive →
    lang_not_allowed. Filtering without the routed reasons loses the
    operational signal (what fraction died, and why) that corpus
    curation needs; the reference routes parse failures the same way
    (first-failure wins, TripRowParserService.cs:33-92).

    All-codegen narrow map (ratios are int/int double divisions,
    deterministic cross-engine); zero shuffles — at 100 TB this is
    scan-bound. Returns (doc_id, lang, n_tokens, alpha_ratio,
    dup_token_ratio, verdict).
    """
    n_chars = F.length("text").cast("long")
    alpha_chars = F.length(
        F.regexp_replace("text", "[^a-zA-Z]", "")
    ).cast("long")
    base = docs.select(
        "doc_id",
        "lang",
        let(tokens(F.col("text")), lambda t: F.size(t).cast("long")).alias(
            "n_tokens"
        ),
        (alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        let(
            tokens(F.col("text")),
            lambda t: 1.0
            - F.size(F.array_distinct(t)).cast("double") / F.size(t),
        ).alias("dup_token_ratio"),
    )
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("alpha_ratio") < min_alpha, F.lit("low_alpha"))
        .when(F.col("dup_token_ratio") > max_dup, F.lit("too_repetitive"))
        .when(~F.col("lang").isin(*allowed_langs), F.lit("lang_not_allowed"))
        .otherwise(F.lit("ok"))
    )
    return base.withColumn("verdict", verdict)


def count_min_heavy_hitters(
    tok: DataFrame, d: int = 4, w: int = 1024, k: int = 20
) -> DataFrame:
    """Count-Min sketch heavy hitters over a ``token`` column (Cormode
    & Muthukrishnan 2005): d salted-hash rows × w counters, estimate =
    min over rows — bounded-memory, mergeable (cells sum across
    partitions/streams). Estimates are one-sided: est ≥ exact always;
    collisions only overestimate. Returns the exact top-k with their
    sketch estimates and overestimate, all integer/md5 arithmetic so
    any engine reproduces the values bit-for-bit."""
    buckets = F.array(
        *[
            md5_long(F.concat(F.lit(f"cms{i}#"), F.col("token"))) % w
            for i in range(d)
        ]
    )
    hashed = tok.select(
        "token", F.posexplode(buckets).alias("row_id", "bucket")
    )
    sketch = hashed.groupBy("row_id", "bucket").agg(
        F.count(F.lit(1)).alias("cell")
    )
    exact = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(k)
    )
    top_hashed = exact.select(
        "token",
        "exact_count",
        F.posexplode(buckets).alias("row_id", "bucket"),
    )
    return (
        top_hashed.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cell").alias("est_count"))
        .select(
            "token",
            "exact_count",
            F.col("est_count").cast("long").alias("est_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("over_count"),
        )
    )


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a fixed term query —
    the retrieval scorer a dedup/curation pipeline uses for
    benchmark-decontamination lookups and nearest-text retrieval when
    no embeddings exist.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the standard Robertson idf ln((N − df + ½)/(df + ½) + 1),
    k1 = 1.2, b = 0.75.

    Distributed shape: ONE corpus scan produces both per-doc length and
    the query-term postings (the term filter prunes the explode before
    any shuffle — postings volume is |terms| docs' worth, not the
    corpus); df is a |terms|-row broadcast; global N/avgdl are two
    driver scalars from one aggregate. Per-term contributions are
    quantized to 1e-9 and summed as exact BIGINTs so the per-doc score
    is independent of partition/summation order (the same
    exact-accumulator idiom as similarity.CENTROID_QUANTUM), then
    rounded to 6 dp before the rank tiebreak (doc_id asc).

    Returns the top ``k`` rows (doc_id, n_terms_matched, bm25, rank).
    """
    K1, B = 1.2, 0.75
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).localCheckpoint(eager=True)
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("doc_id").alias("n_docs"),
    ).collect()[0]
    n_docs = stats["n_docs"]
    avgdl = stats["n_tokens"] / n_docs

    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    hits = tok.filter(F.col("term").isin(terms))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = hits.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + 1.0
    )
    contrib = (
        idf
        * (F.col("tf") * (K1 + 1))
        / (
            F.col("tf")
            + K1 * (1 - B + B * F.col("dl") / F.lit(float(avgdl)))
        )
    )
    # df_ is NOT vocabulary-sized: `hits` is pre-filtered to the
    # caller's fixed query-term list, so this table is <= |terms| rows
    # by construction — a bounded broadcast at any corpus size (unlike
    # the token_rarity / unigram model tables, which carry a hatch)
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(
                F.sum(F.round(contrib * 1e9).cast("long")).cast("double")
                / 1e9,
                6,
            ).alias("bm25"),
        )
    )
    from pyspark.sql import Window

    # top-k via sort+limit (TakeOrderedAndProject: per-partition heaps,
    # driver merge of k rows) — NOT a corpus-wide single-partition rank
    # window; only the k survivors pay the row_number
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "n_terms_matched", "bm25", "rank"
    )


def unigram_logprob_deciles(
    docs: DataFrame, broadcast_model: bool = True
) -> DataFrame:
    """Unigram language-model quality score, bucketed into deciles —
    the CCNet-style corpus filter: score each document by the mean
    log-probability of its tokens under the corpus's own unigram model
    (boilerplate of common tokens scores high, noise/rare-vocab scores
    low), then cut the corpus into ntile(10) quality buckets.

    Two-pass shape like token_rarity: pass 1 builds the unigram model
    (token → count; vocabulary-sized shuffle), pass 2 streams the
    corpus against the model — broadcast by DEFAULT; for a web-scale
    open vocabulary pass ``broadcast_model=False`` and the join
    shuffles on the token instead (values identical — the
    ``token_rarity``/``bpe_encode_stats`` hatch). Per-token
    ln(freq/total) is
    quantized to 1e-9 and summed in exact BIGINTs (order-independent),
    the per-doc mean rounds to 6 dp, and the decile assignment orders
    by (score, doc_id) so it is reproducible on any engine. The exact
    decile cut runs through ``functions.exact_ntile``
    (range-partitioned rank + broadcast cumulative offsets): identical
    decile edges to a global ntile window with NO single-task stage,
    so the one-row-per-document series is safe past ~10^9 docs.

    Returns (decile, n_docs, min_logprob, max_logprob).
    """
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).localCheckpoint(eager=True)
    total = tok.count()
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    if broadcast_model:
        freq = F.broadcast(freq)
    lp = F.log(F.col("f").cast("double") / F.lit(float(total)))
    doc_lp = (
        tok.join(freq, "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.round(lp * 1e9).cast("long")).cast("double")
                / 1e9
                / F.count(F.lit(1)),
                6,
            ).alias("mean_logprob")
        )
    )
    from etl_developstoday_test_spark.functions import exact_ntile

    tiled = exact_ntile(doc_lp, 10, ["mean_logprob", "doc_id"], "decile")
    return (
        tiled.groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("mean_logprob").alias("min_logprob"),
            F.max("mean_logprob").alias("max_logprob"),
        )
    )


def hashed_importance_scores(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style data-selection scoring (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how target-like its hashed unigram profile is,
    using the ratio of add-one-smoothed bucket probabilities between a
    TARGET slice (here: lang = ``target_lang``) and the RAW corpus.

    Deviation from the paper, for cross-engine verifiability: the
    per-token score is the QUANTIZED LIKELIHOOD RATIO (floor of
    1e6 · p_target(b)/p_raw(b)) summed per document, not the log-ratio
    sum — ln() is not correctly-rounded-guaranteed across engines,
    while this form is two exact-integer-derived products, one
    division, one multiply, one floor: bit-identical everywhere. Rank
    order is preserved for single-bucket differences and the monotone
    intent (target-like docs score high) is the same.

    Scale shape: two partial-agg passes over the token stream build the
    bucket tables (n_buckets rows — driver-sized, window-over-() safe),
    the score table broadcasts back onto the stream, and per-doc
    weights are one groupBy(doc_id). No joins scale with vocabulary:
    the hash folds it to n_buckets.

    Returns per-lang: n_docs, sum_score, max_score (all BIGINT).
    """
    from pyspark.sql import Window

    from etl_developstoday_test_spark.functions import md5_long, tokens

    tb = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    ).select("doc_id", "lang", (md5_long("token") % n_buckets).alias("b"))
    raw = tb.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = tb.filter(F.col("lang") == target_lang).groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    w_all = Window.partitionBy()
    joined = raw.join(tgt, "b", "left").select(
        "b",
        "cr",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.sum("cr").over(w_all).alias("tr"),
        F.sum(F.coalesce(F.col("ct"), F.lit(0))).over(w_all).alias("tt"),
    )
    s = F.floor(
        (
            (F.col("ct") + F.lit(1.0))
            * (F.col("tr") + F.lit(float(n_buckets)))
        )
        / (
            (F.col("cr") + F.lit(1.0))
            * (F.col("tt") + F.lit(float(n_buckets)))
        )
        * F.lit(1e6)
    ).cast("bigint")
    sc = joined.select("b", s.alias("s"))
    dw = (
        tb.join(F.broadcast(sc), "b")
        .groupBy("doc_id", "lang")
        .agg(F.sum("s").alias("w"))
    )
    return dw.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("sum_score"),
        F.max("w").alias("max_score"),
    )


def char_entropy_profile(docs: DataFrame, low_bits: float = 3.0) -> DataFrame:
    """Per-source character-entropy quality profile: Shannon entropy
    H = -Σ p(ch)·log2 p(ch) over each document's characters — the
    cheap compression-ratio proxy quality filters use to drop
    low-entropy boilerplate / repeated-key spam (H collapses toward 0
    for 'aaaa…' and sits near log2(alphabet) for organic prose) —
    with the count of docs under ``low_bits``.

    Scale shape: the explode is narrow (one row per character, no
    join), the (doc, char) groupBy partial-aggregates map-side down to
    ≤ alphabet rows per doc, and everything after is per-doc metadata.
    Determinism: each per-char term quantizes ln to NANO-INTEGERS
    before summation (the unigram-LM pattern), so per-doc H_nano is an
    exact integer in any engine and the low-entropy CLASSIFICATION is
    an integer comparison — no float boundary can flip a doc between
    engines. Total chars per doc comes from length(text), constant per
    exploded row, so no totals join is needed.
    """
    low_nano = int(low_bits * 1_000_000_000)
    base = docs.select(
        "doc_id",
        "source",
        F.length("text").alias("n"),
        F.explode(F.split("text", "")).alias("ch"),
    )
    counts = base.groupBy("doc_id", "source", "n", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    term = F.round(
        F.col("c").cast("double")
        / F.col("n")
        * F.log(F.col("n").cast("double") / F.col("c"))
        / F.log(F.lit(2.0))
        * F.lit(1e9)
    ).cast("long")
    doc_h = counts.groupBy("doc_id", "source").agg(
        F.sum(term).alias("h_nano")
    )
    return doc_h.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("h_nano").cast("double") / F.count(F.lit(1)) / 1e9, 6
        ).alias("avg_entropy_bits"),
        F.sum(
            F.when(F.col("h_nano") < low_nano, 1).otherwise(0)
        ).alias("n_low_entropy"),
    )


def _bpe_train(
    docs: DataFrame, rounds: int, text_col: str
) -> tuple[DataFrame, list[tuple]]:
    """Shared BPE training loop: returns (final per-word segmentation
    table (word, freq, syms), per-round stats list). See
    ``bpe_merge_rounds`` for the algorithm and scale shape."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("word", "freq", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=True)
    )

    def pair_arr(syms):
        idx = F.sequence(F.lit(0), F.size(syms) - 1)
        return F.transform(
            idx,
            lambda i: F.struct(
                F.get(syms, i).alias("s"), F.get(syms, i + 1).alias("n")
            ),
        )

    stats = []
    for rnd in range(1, rounds + 1):
        pairs = (
            words.select("freq", F.explode(pair_arr(F.col("syms"))).alias("pr"))
            .filter(F.col("pr.n").isNotNull())
            .groupBy(F.col("pr.s").alias("a"), F.col("pr.n").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).first()
        if top is None:  # fully merged (or single-char corpus): done
            break
        a, b, cnt = top["a"], top["b"], int(top["cnt"])

        init = F.struct(
            F.expr("cast(array() as array<string>)").alias("out"),
            F.lit(False).alias("skip"),
        )

        def make_step(a, b):
            def step(acc, x):
                keep = F.struct(
                    F.concat(acc["out"], F.array(x["s"])).alias("out"),
                    F.lit(False).alias("skip"),
                )
                merged = F.struct(
                    F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                    F.lit(True).alias("skip"),
                )
                return (
                    F.when(
                        acc["skip"],
                        F.struct(
                            acc["out"].alias("out"), F.lit(False).alias("skip")
                        ),
                    )
                    .when((x["s"] == F.lit(a)) & (x["n"] == F.lit(b)), merged)
                    .otherwise(keep)
                )

            return step

        words = words.select(
            "word",
            "freq",
            F.aggregate(
                pair_arr(F.col("syms")),
                init,
                make_step(a, b),
                lambda acc: acc["out"],
            ).alias("syms"),
        ).localCheckpoint(eager=True)
        # superseded rounds' checkpoint blocks free on GC (checkpoint
        # RDDs are invisible to the cacheManager)

        # one fused pass over the exploded segmentation: every symbol
        # occurrence counts freq times, so total_tokens is just
        # SUM(freq) over exploded rows — no second aggregation
        vs, tt = (
            words.select("freq", F.explode("syms").alias("s"))
            .agg(F.count_distinct("s"), F.sum("freq"))
            .first()
        )
        stats.append((rnd, a, b, cnt, int(vs), int(tt)))

    return words, stats


def bpe_merge_rounds(
    docs: DataFrame, rounds: int = 5, text_col: str = "text"
) -> DataFrame:
    """Distributed BPE tokenizer training, the first ``rounds`` merges
    (Sennrich et al. 2016): start from characters, repeatedly (1) count
    adjacent symbol pairs corpus-wide weighted by word frequency,
    (2) pick the most frequent pair (ties: lexicographic), (3) merge it
    greedily leftmost-first in every word. Returns one audit row per
    round: the chosen pair, its count, and the vocab size / total token
    count after applying the merge.

    Scale shape — why this distributes: the corpus collapses to
    (distinct word, freq) once, so all later rounds run on the word
    VOCABULARY, not the corpus; pair counting is a map-side-combined
    groupBy over short per-word pair lists; and the merge application
    is a per-row codegen array fold (F.aggregate) — zero shuffles, no
    Python, no alignment joins. Per round: one vocabulary-sized
    shuffle (pair count) + one driver-bounded top-1 action, exactly
    the k-bounded iteration pattern of kmeans_lloyd. The greedy
    leftmost fold is equivalent to the run-parity rule (occurrences
    can only overlap when a == b, in runs; survivors sit at even
    offsets from the run start) — which is how the SQL oracle replays
    it with windows instead of a fold.
    """
    spark = docs.sparkSession
    _, stats = _bpe_train(docs, rounds, text_col)
    # stats are collected; the last round's checkpoint blocks (word-
    # vocabulary sized) free on GC
    return spark.createDataFrame(
        stats,
        "round bigint, pair_a string, pair_b string, "
        "pair_count bigint, vocab_size bigint, total_tokens bigint",
    )


def bpe_encode_stats(
    docs: DataFrame,
    rounds: int = 5,
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """BPE APPLICATION — encode the corpus with the merges
    ``bpe_merge_rounds`` trains, reporting per-document BPE token
    counts against the whitespace baseline. Training a tokenizer
    without applying it is half the operator: a token-budget pipeline
    tokenizes EVERYTHING, and the budget math (sequences packed,
    epochs scheduled, mixture weights) runs on encoded counts, not
    whitespace counts.

    The key economy: the trainer's final state IS the encoder. After
    ``rounds`` merges, the (word, freq, syms) vocabulary table already
    holds every distinct word's greedy segmentation, so encoding the
    corpus is ONE join of the exploded token stream against the
    (vocabulary-sized) segmentation table — no per-document re-fold,
    no Python. By default the segmentation table broadcasts (the
    unigram-model contract); pass ``broadcast_model=False`` for a
    web-scale open vocabulary that outgrows driver memory — the join
    becomes a shuffle equi-join on the word (the ``bigram_lm_bottomk``
    posture), values identical. Documents with no non-empty tokens
    have nothing to encode and are out of scope (the length filter's
    job).

    Returns (doc_id, n_ws_tokens, n_bpe_tokens, tokens_per_word) —
    tokens_per_word = round(bpe/ws, 6), the per-doc compression the
    merge table achieves (1.0 = every word fully merged back to one
    token ... long words of rare characters stay near their character
    counts).
    """
    words, _ = _bpe_train(docs, rounds, text_col)
    enc = words.select("word", F.size("syms").alias("_bpe"))
    if broadcast_model:
        enc = F.broadcast(enc)
    doc_tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    return (
        doc_tok.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ws_tokens"),
            F.sum("_bpe").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_ws_tokens"),
                6,
            ).alias("tokens_per_word"),
        )
    )


def span_corruption_stats(
    docs: DataFrame, span_len: int = 3, noise_pct: int = 15
) -> DataFrame:
    """T5-style span-corruption planning: deterministically select
    ~``noise_pct``% of each document's fixed-length token spans for
    masking and account for the resulting encoder/decoder sequence
    sizes — the example-generation accounting a denoising-objective
    training pipeline runs over the whole corpus to budget sequence
    lengths BEFORE materializing examples.

    Span s of doc d is masked iff ``md5(d#s) % 100 < noise_pct`` — a
    per-(doc,span) keyed hash, so the plan is reproducible across runs,
    engines, and partitionings (no RNG state). Masked-span accounting
    follows the T5 construction: each masked span collapses to one
    sentinel token on the encoder side and emits its tokens plus its
    sentinel (plus one EOS per example) on the decoder side.

    Shape: one narrow codegen map (sequence → filter → fold over at
    most n_tokens/span_len span ids per row), zero shuffles, zero
    Python. Returns (doc_id, n_tokens, n_spans_masked, n_masked_tokens,
    n_input_tokens, n_target_tokens), all exact integers.
    """
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_spans = F.ceil(n_tok.cast("double") / span_len).cast("int")
    masked = F.filter(
        F.sequence(F.lit(0), n_spans - 1),
        lambda s: md5_long(
            F.concat(
                F.col("doc_id").cast("string"), F.lit("#"), s.cast("string")
            )
        )
        % 100
        < noise_pct,
    )
    base = docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        masked.alias("_masked"),
    )
    n_masked_tok = F.aggregate(
        "_masked",
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.least(F.lit(span_len), F.col("n_tokens") - s * span_len),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        F.size("_masked").cast("bigint").alias("n_spans_masked"),
        n_masked_tok.alias("n_masked_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans_masked",
        "n_masked_tokens",
        (
            F.col("n_tokens") - F.col("n_masked_tokens") + F.col("n_spans_masked")
        ).alias("n_input_tokens"),
        (F.col("n_masked_tokens") + F.col("n_spans_masked") + 1).alias(
            "n_target_tokens"
        ),
    )


def blocklist_hits(
    docs: DataFrame, blocklist: dict[str, list[str]], max_hits: int = 0
) -> DataFrame:
    """Wordlist-based content filtering (the NSFW/profanity/spam pass of
    a web-corpus curation stack): per document, count token hits per
    blocklist CATEGORY and flag documents whose total crosses
    ``max_hits``. Word-granular containment — ``F.filter`` + ``isin``
    over the let-bound token array, one codegen map per category, no
    explode, no join, zero shuffles (the category lists ride into the
    task as literals; at a real 10⁴-term list swap the literal for a
    broadcast join on exploded tokens, same output contract).

    Returns (doc_id, <cat>_hits... per category, n_hits, blocked).
    """
    tok = tokens(F.col("text"))
    cats = sorted(blocklist)

    def counter(words: list[str]):
        # one-arg lambda: F.transform treats a 2-arg callable (even via
        # default args) as an (element, index) lambda
        return lambda t: _count_in(t, words)

    hit_cols = [
        let(tok, counter(blocklist[c])).alias(f"{c}_hits") for c in cats
    ]
    out = docs.select("doc_id", *hit_cols)
    total = sum((F.col(f"{c}_hits") for c in cats), F.lit(0).cast("long"))
    return out.select(
        "*",
        total.alias("n_hits"),
    ).withColumn("blocked", F.col("n_hits") > max_hits)


def bigram_lm_bottomk(
    docs: DataFrame, k: int = 20, alpha: int = 1
) -> DataFrame:
    """Bigram language-model quality scoring — the KenLM-perplexity
    step of a CCNet-style curation stack, one order up from
    ``unigram_logprob_deciles``: a document whose TOKENS are all common
    but whose token SEQUENCE is shuffled word soup scores high under a
    unigram model and low under a bigram one, so the bigram filter
    catches scrambled/generated boilerplate the unigram filter cannot.

    Model and scoring, all deterministic:
    - bigrams via the 2-shingle helper; context count c(w1·) = number
      of bigrams starting with w1 (so p(·|w1) sums to 1 exactly);
    - Laplace-smoothed p(w2|w1) = (c(w1w2)+α)/(c(w1·)+α·V) with V the
      corpus unigram vocabulary; ln quantized to integer nanos (the
      ``unigram_logprob_deciles`` contract — ln is not correctly-
      rounded-guaranteed across engines, so scores leave double-land
      before summing/ranking);
    - per-doc mean over its bigrams, rounded to 6 dp; bottom-k by
      (mean asc, doc_id) — a TakeOrderedAndProject, never a full sort;
      docs with < 2 tokens have no bigrams and are out of scope (they
      are the length filter's job, not the LM's).

    Scale shape: the bigram model is corpus-bigram-vocabulary sized, so
    the score join is a plain shuffle equi-join on the bigram string —
    NOT a broadcast (unlike the unigram model, bigram vocabularies
    outgrow driver memory at web scale). Two map-side-combined
    groupBys + one equi-join + one top-k.

    Returns (doc_id, n_bigrams, mean_logprob), k lowest-quality rows.
    """
    # persist()+count() rather than localCheckpoint: the cacheManager
    # tracks persist, so the unpersist() before return actually
    # releases the corpus-sized exploded-bigram blocks (localCheckpoint
    # blocks are invisible to the cacheManager and would only free on
    # GC); no lineage truncation is needed — nothing iterates
    big = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bg"),
    ).persist()
    big.count()  # eager: all three consumers below read the cache

    bcounts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    ctx = F.substring_index(F.col("bg"), " ", 1)
    ccounts = (
        big.select(ctx.alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("ctx_c"))
    )
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    model = (
        bcounts.withColumn("w1", ctx)
        .join(ccounts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.round(
                F.log(
                    (F.col("c") + alpha).cast("double")
                    / (F.col("ctx_c") + alpha * F.col("v")).cast("double")
                )
                * 1e9
            )
            .cast("long")
            .alias("llq"),
        )
    )
    per_doc = (
        big.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("llq").cast("double") / 1e9 / F.count(F.lit(1)), 6
            ).alias("mean_logprob"),
        )
    )
    # materialize the k output rows, then RELEASE the corpus-sized
    # exploded-bigram cache — returning a lazy plan would pin it in
    # executor storage for the session lifetime
    out = (
        per_doc.orderBy(F.col("mean_logprob").asc(), F.col("doc_id").asc())
        .limit(k)
        .localCheckpoint(eager=True)
    )
    big.unpersist()  # real release: big went through persist()
    return out


def kneser_ney_bigram_bottomk(
    docs: DataFrame, k: int = 20, discount: float = 0.75
) -> DataFrame:
    """Interpolated Kneser–Ney bigram language model (Kneser & Ney
    1995; the Chen & Goodman 1999 interpolated form with absolute
    discounting), bottom-k quality scoring — the model class KenLM
    actually ships, one real step up from the Laplace bigram
    (``bigram_lm_bottomk``): instead of smearing probability uniformly
    over the vocabulary, KN discounts every observed bigram by a fixed
    ``discount`` and backs off to the CONTINUATION unigram — how many
    distinct contexts a word follows — which is what stops
    high-frequency-but-context-locked tokens ("Francisco") from
    inflating scores of unseen combinations.

    Registered round 9; the oracle was value-locked at two scales
    before registration (tests/test_staged_oracles.py).

        p(w2|w1) = (c(w1w2) − d)/c(w1·)
                 + (d·N1+(w1·)/c(w1·)) · (N1+(·w2)/T)

    with N1+(w1·)/N1+(·w2) the distinct-successor/-predecessor counts
    and T the distinct bigram types. Every count is an exact integer,
    ``d`` = 0.75 is exactly binary-representable, and the probability
    is ONE fixed-order double expression over them — so only ln() is
    engine-unstable, and it is nano-quantized (the repo contract).
    Scored on the corpus the model was built from, every scored bigram
    has c ≥ 1, so c − d > 0 and the interpolated p is always positive.

    Scale shape: identical to ``bigram_lm_bottomk`` — the three count
    tables derive from ONE bigram-type aggregation (successor stats
    are a groupBy over the TYPE table, not the corpus), the model
    deliberately shuffle-joins on the bigram string (bigram
    vocabularies outgrow broadcast at web scale), and the output is a
    TakeOrderedAndProject of k rows.

    Returns (doc_id, n_bigrams, mean_logprob), k lowest-quality rows.
    """
    # persist()+count(): cacheManager-tracked so the release is real
    big = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bg"),
    ).persist()
    big.count()  # eager: both consumers below read the cache

    bcounts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    w1 = F.substring_index(F.col("bg"), " ", 1)
    w2 = F.substring_index(F.col("bg"), " ", -1)
    typed = bcounts.select("bg", "c", w1.alias("w1"), w2.alias("w2"))
    ctx = typed.groupBy("w1").agg(
        F.sum("c").alias("ctot"), F.count(F.lit(1)).alias("n1p")
    )
    pred = typed.groupBy("w2").agg(F.count(F.lit(1)).alias("npred"))
    tt = bcounts.agg(F.count(F.lit(1)).alias("t"))
    d = float(discount)
    p = (F.col("c").cast("double") - F.lit(d)) / F.col("ctot").cast(
        "double"
    ) + (
        (F.lit(d) * F.col("n1p").cast("double"))
        / F.col("ctot").cast("double")
    ) * (
        F.col("npred").cast("double") / F.col("t").cast("double")
    )
    model = (
        typed.join(ctx, "w1")
        .join(pred, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "bg",
            F.round(F.log(p) * 1e9).cast("long").alias("llq"),
        )
    )
    per_doc = (
        big.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("llq").cast("double") / 1e9 / F.count(F.lit(1)), 6
            ).alias("mean_logprob"),
        )
    )
    out = (
        per_doc.orderBy(F.col("mean_logprob").asc(), F.col("doc_id").asc())
        .limit(k)
        .localCheckpoint(eager=True)
    )
    big.unpersist()  # real release: big went through persist()
    return out


def bpe_fertility_by_lang(
    docs: DataFrame,
    rounds: int = 5,
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Tokenizer FERTILITY by language — the standard multilingual
    tokenizer-evaluation metric (mean encoded tokens per word): a
    tokenizer trained on a mixed corpus systematically over-segments
    the languages it under-saw, inflating their effective sequence
    lengths and training cost, and the per-language fertility table is
    how that bias is detected BEFORE committing a vocabulary. Built on
    the same trained-merge segmentation ``bpe_encode_stats`` applies:
    the trainer's final (word, syms) table joins the exploded token
    stream once, then one (lang) rollup. ``broadcast_model=False``
    swaps the vocabulary broadcast for a shuffle equi-join on the word
    (the open-vocabulary escape hatch, same as ``bpe_encode_stats``),
    values identical.

    Registered round 9; the oracle was value-locked at two scales
    before registration (tests/test_staged_oracles.py).

    Returns one row per language: (lang, n_docs, n_ws_tokens,
    n_bpe_tokens, fertility = round(bpe/ws, 6)).
    """
    words, _ = _bpe_train(docs, rounds, text_col)
    enc = words.select("word", F.size("syms").alias("_bpe"))
    if broadcast_model:
        enc = F.broadcast(enc)
    doc_tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    per_doc = (
        doc_tok.join(enc, "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("_ws"),
            F.sum("_bpe").cast("long").alias("_bpe"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ws").alias("n_ws_tokens"),
            F.sum("_bpe").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_ws_tokens"),
                6,
            ).alias("fertility"),
        )
    )


def kn_heldout_bottomk(
    docs: DataFrame,
    k: int = 20,
    discount: float = 0.75,
    test_mod: int = 5,
) -> DataFrame:
    """HELD-OUT Kneser–Ney scoring — the production form of the
    perplexity filter: train the interpolated-KN bigram model on the
    ``doc_id % test_mod != 0`` split and score the held-out docs, which
    forces the two code paths in-corpus scoring
    (``kneser_ney_bigram_bottomk``) structurally never hits: bigrams
    UNSEEN in training (the discounted term clamps to zero and only the
    continuation backoff speaks) and contexts/words outside the
    training vocabulary entirely (scored by a Laplace-floored
    continuation unigram — proper probability mass is reserved for OOV
    successors, so ln() is always finite). CCNet-style curation scores
    the crawl under a model trained on a CLEAN reference corpus; a
    same-corpus score can't see distribution shift, a held-out score
    can.

    Registered in round 10 as ``text_kn_heldout_bottomk`` (two-scale
    oracle lock in tests/test_staged_oracles.py).

        pcont(w2)   = (N1+(·w2) + 1) / (T + V2 + 1)      -- Laplace floor
        p(w2|w1)    = max(c − d, 0)/c(w1·)
                      + (d · N1+(w1·)/c(w1·)) · pcont(w2)  -- w1 known
        p(w2|w1)    = pcont(w2)                            -- w1 unseen

    with T = distinct training bigram types, V2 = distinct training
    successors (Σ_seen pcont < 1, the remainder is the OOV mass). All
    counts exact integers, d = 0.75 binary-exact, p is ONE fixed-order
    double expression, ln nano-quantized — hash-exact cross-engine.

    Scale shape: ONE persisted bigram explode feeds the train counts
    and the test scoring (the ``bigram_lm_bottomk`` posture); the model
    travels as shuffle equi-joins on bg/w1/w2 (never broadcast — open
    vocabularies); output is a TakeOrderedAndProject of k rows.
    Returns (doc_id, n_bigrams, mean_logprob), k lowest held-out docs.
    """
    big_all = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bg"),
    ).persist()
    big_all.count()  # eager: train counts AND test scoring read it

    is_test = F.col("doc_id") % test_mod == 0
    bcounts = (
        big_all.filter(~is_test).groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    )
    w1 = F.substring_index(F.col("bg"), " ", 1)
    w2 = F.substring_index(F.col("bg"), " ", -1)
    typed = bcounts.select("bg", "c", w1.alias("w1"), w2.alias("w2"))
    ctx = typed.groupBy("w1").agg(
        F.sum("c").alias("ctot"), F.count(F.lit(1)).alias("n1p")
    )
    pred = typed.groupBy("w2").agg(F.count(F.lit(1)).alias("npred"))
    stats = typed.agg(
        F.count(F.lit(1)).alias("t"),
        F.count_distinct(F.col("w2")).alias("v2"),
    )

    tb = big_all.filter(is_test).select(
        "doc_id", "bg", w1.alias("w1"), w2.alias("w2")
    )
    joined = (
        tb.join(typed.select("bg", "c"), "bg", "left")
        .join(ctx, "w1", "left")
        .join(pred, "w2", "left")
        .crossJoin(F.broadcast(stats))
    )
    d = float(discount)
    pcont = (F.coalesce(F.col("npred"), F.lit(0)) + 1).cast("double") / (
        F.col("t") + F.col("v2") + 1
    ).cast("double")
    inner = F.greatest(
        F.coalesce(F.col("c"), F.lit(0)).cast("double") - F.lit(d),
        F.lit(0.0),
    ) / F.col("ctot").cast("double") + (
        (F.lit(d) * F.col("n1p").cast("double"))
        / F.col("ctot").cast("double")
    ) * pcont
    p = F.when(F.col("ctot").isNull(), pcont).otherwise(inner)
    llq = F.round(F.log(p) * 1e9).cast("long")
    per_doc = (
        joined.select("doc_id", llq.alias("llq"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("llq").cast("double") / 1e9 / F.count(F.lit(1)), 6
            ).alias("mean_logprob"),
        )
    )
    out = (
        per_doc.orderBy(F.col("mean_logprob").asc(), F.col("doc_id").asc())
        .limit(k)
        .localCheckpoint(eager=True)
    )
    big_all.unpersist()  # real release: went through persist()
    return out


def zipf_slope(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """Zipf-law fit of the corpus's token frequency distribution: OLS
    of ln(freq) on ln(rank) over the top ``top_n`` tokens — a natural
    corpus scores a slope near −1, and deviation is one of the
    cheapest whole-corpus health signals a curation pipeline owns
    (machine-generated or templated text flattens the head, heavy
    boilerplate steepens it; the slope moving between snapshots means
    the MIX moved even when volume didn't).

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: the top-n pick is a (freq DESC, token ASC)
    total order; rank and freq are exact integers; BOTH logs are
    nano-quantized (round(ln·1e9)/1e9 — ln is the only
    non-correctly-rounded op in the formula) before the five OLS
    sufficient statistics accumulate through the exact decimal
    summator (``ml.linreg_closed_form``, reused verbatim), so slope /
    intercept / R² are bit-identical cross-engine.

    Scale shape: ONE map-side-combined vocabulary aggregate; the top-n
    pick is TakeOrderedAndProject (per-partition heaps, no global
    sort); the rank window and the regression run on ``top_n`` rows —
    a constant. Returns one row: (n_rows, slope, intercept, r2).
    """
    from pyspark.sql import Window

    from etl_developstoday_test_spark.operators.ml import (
        linreg_closed_form,
    )

    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = freq.orderBy(F.desc("f"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("f"), F.asc("term"))  # top_n rows only

    def lnq(c):
        return (
            F.round(F.log(c.cast("double")) * 1e9)
            .cast("long")
            .cast("double")
            / 1e9
        )

    pts = top.withColumn("rank", F.row_number().over(w)).select(
        lnq(F.col("rank")).alias("lx"), lnq(F.col("f")).alias("ly")
    )
    return linreg_closed_form(pts, "lx", "ly")


def repetition_profile(docs: DataFrame, k: int = 10) -> DataFrame:
    """Intra-document REPETITION profile, worst-k shortlist — the
    Gopher-class (Rae et al. 2021, §A1.1) repetition filters a
    curation pipeline runs before any cross-document dedup: a document
    whose own 3-grams repeat heavily, or whose single most frequent
    2-gram carries a large share of the text, is boilerplate / a
    scraper loop / degenerate generation, and no BETWEEN-document
    signal catches it (the doc can be globally unique and still be
    90% the same line).

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Per document over order-preserving word shingles (duplicates
    KEPT): ``dup3_frac`` = fraction of 3-gram INSTANCES whose gram
    occurs ≥ 2× in the same doc; ``top2_frac`` = the most frequent
    2-gram's share of all 2-gram instances (max-count tie needs no
    break — only the count enters). Pure integer counts until two
    6-dp-rounded divisions, so the (dup3 DESC, top2 DESC, doc_id ASC)
    worst-k is a cross-engine total order. Documents shorter than 2
    tokens have no 2-grams and drop out (nothing to repeat); docs with
    2 tokens but no 3-grams report dup3 over 0 grams as 0.0.

    Scale shape: each n-gram table is one explode + ONE
    map-side-combined groupBy on (doc_id, gram) — the heavy key is the
    doc, so the per-doc rollup that follows co-shuffles on doc_id;
    nothing corpus-sized is ever broadcast or windowed; the worst-k is
    TakeOrderedAndProject. Returns k rows:
    (doc_id, n_grams3, dup3_frac, top2_frac).
    """

    def gram_counts(n: int) -> DataFrame:
        return (
            docs.select(
                "doc_id",
                F.explode(word_shingles(tokens(F.col("text")), n)).alias(
                    "g"
                ),
            )
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    g3 = (
        gram_counts(3)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams3"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias(
                "n_dup3"
            ),
        )
    )
    g2 = (
        gram_counts(2)
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_grams2"), F.max("c").alias("top2"))
    )
    joined = g2.join(g3, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams3", F.lit(0)).cast("long").alias("n_grams3"),
        F.coalesce("n_dup3", F.lit(0)).cast("long").alias("_dup3"),
        F.col("n_grams2").cast("long").alias("_n2"),
        F.col("top2").cast("long").alias("_top2"),
    )
    dup3_frac = F.when(
        F.col("n_grams3") > 0,
        F.round(
            F.col("_dup3").cast("double")
            / F.col("n_grams3").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    top2_frac = F.round(
        F.col("_top2").cast("double") / F.col("_n2").cast("double"), 6
    )
    return (
        joined.select(
            "doc_id",
            "n_grams3",
            dup3_frac.alias("dup3_frac"),
            top2_frac.alias("top2_frac"),
        )
        .orderBy(
            F.desc("dup3_frac"), F.desc("top2_frac"), F.asc("doc_id")
        )
        .limit(k)
    )


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, k: int = 15
) -> DataFrame:
    """Top-k PMI COLLOCATIONS (Church & Hanks 1990): adjacent word
    pairs whose co-occurrence beats chance by the widest margin —
    PMI(x,y) = ln(c_xy·T / (c_x·c_y)) over the corpus bigram table
    with margin counts c_x = Σ_y c_xy, c_y = Σ_x c_xy and T = total
    bigram instances. The collocation head is a corpus fingerprint the
    curation kit reads two ways: genuine multiword units (natural
    text) vs template seams (the same wrapper phrase everywhere —
    machine-generated mass shows up as absurdly high-PMI fixed pairs).
    ``min_count`` is the standard low-frequency guard (PMI explodes on
    hapax pairs).

    Registered round 11 (the window had room for all staged work;
    oracle value-locked at two scales in tests/test_staged_oracles.py
    BEFORE registration).

    Determinism contract: all four factors are exact integers; each ln
    is nano-quantized INDIVIDUALLY (round(ln·1e9) as BIGINT — the one
    non-correctly-rounded op in the formula), the PMI assembles in
    exact integer nanos (lq_xy + lq_T − lq_x − lq_y) and divides by
    1e9 once, then rounds to 6 dp before the (pmi DESC, x ASC, y ASC)
    top-k — a cross-engine total order.

    Scale shape: ONE bigram explode + map-side-combined groupBy builds
    the pair table; the margins are two more groupBys OF THE PAIR
    TABLE (vocabulary-sized, not corpus-sized) equi-joined back on
    their key — co-shuffles, no vocabulary broadcast (the
    text_token_rarity lesson); T is a 1-row aggregate broadcast; the
    min_count filter prunes the pair table BEFORE both joins; the
    top-k is TakeOrderedAndProject. Returns k rows:
    (term_x, term_y, n_pair, pmi).
    """
    if min_count < 1:
        raise ValueError("pmi_collocations: min_count must be >= 1")

    pairs = (
        docs.select(
            F.explode(word_shingles(tokens(F.col("text")), 2)).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .select(
            F.substring_index("g", " ", 1).alias("x"),
            F.substring_index("g", " ", -1).alias("y"),
            "c_xy",
        )
    )
    cx = pairs.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    cy = pairs.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    tot = pairs.agg(F.sum("c_xy").cast("long").alias("t_all"))

    def lnq(c: Column) -> Column:
        return F.round(F.log(c.cast("double")) * 1e9).cast("long")

    pmi = F.round(
        (
            lnq(F.col("c_xy"))
            + lnq(F.col("t_all"))
            - lnq(F.col("c_x"))
            - lnq(F.col("c_y"))
        ).cast("double")
        / 1e9,
        6,
    )
    return (
        pairs.filter(F.col("c_xy") >= min_count)
        .join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("x").alias("term_x"),
            F.col("y").alias("term_y"),
            F.col("c_xy").cast("long").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("term_x"), F.asc("term_y"))
        .limit(k)
    )


def source_vocab_js(docs: DataFrame) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the per-SOURCE
    unigram distributions — the corpus-mixture distance matrix: how
    lexically different each ingest source is from each other source,
    on the one scale (√JS is a metric, JS ≤ ln 2) that makes the
    numbers comparable across corpus versions. Near-zero off-diagonal
    means a duplicated feed; a source far from all others is either
    the valuable diversity a mixture recipe wants upweighted or a
    scraper gone wrong — this card is how you tell before training.

    Registered round 11 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: the ``js_divergence`` drift-kit contract
    applied per source pair — p, q are double divisions of exact token
    counts, each ln nano-quantized, per-token terms through the exact
    decimal summator, 6-dp results. A token absent from one side
    contributes its surviving half exactly (0·ln never evaluates).

    Scale shape: one tokenize + ONE map-side-combined (source, token)
    count; the (sources × vocabulary) grid is built by one broadcast
    of the SOURCE-COUNT-sized totals table onto the distinct-token
    stream (never the vocabulary side); pair terms form by ONE
    vocabulary-co-shuffled self-equi-join on the token with
    source_a < source_b (|S|²/2 × |V| rows — |S| is the handful of
    ingest feeds, the explicitly bounded factor); everything after is
    a pair-count-sized rollup. Returns one row per unordered source
    pair: (source_a, source_b, n_tokens_a, n_tokens_b, js_divergence,
    js_distance), ordered.
    """
    counts = (
        docs.select(
            F.col("source").alias("s"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
        .groupBy("s", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # model-sized (|S|×|V|), read by totals/vocab/grid and BOTH
        # self-join sides — without this the corpus tokenizes six
        # times (the NB trainer's persisted-explode lesson)
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("s").agg(F.sum("c").cast("long").alias("t"))
    vocab = counts.select("tok").distinct()
    # full grid so both "present in a, absent in b" directions surface
    grid = (
        vocab.crossJoin(F.broadcast(totals))
        .join(counts, ["s", "tok"], "left")
        .select(
            "tok",
            "s",
            "t",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    a = grid.select(
        F.col("tok"),
        F.col("s").alias("source_a"),
        F.col("t").alias("_ta"),
        F.col("c").alias("_ca"),
    )
    b = grid.select(
        F.col("tok"),
        F.col("s").alias("source_b"),
        F.col("t").alias("_tb"),
        F.col("c").alias("_cb"),
    )
    p = F.col("_ca").cast("double") / F.col("_ta").cast("double")
    q = F.col("_cb").cast("double") / F.col("_tb").cast("double")

    def lnq(c: Column) -> Column:
        return F.round(F.log(c) * 1e9).cast("long").cast("double") / 1e9

    def half_kl(r: Column, m: Column) -> Column:
        return F.when(r > 0, r * lnq(r / m)).otherwise(F.lit(0.0))

    m = (p + q) / 2
    term = ((half_kl(p, m) + half_kl(q, m)) / 2).cast("decimal(30,10)")
    pairs = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b", "_ta", "_tb")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("js_divergence"))
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.col("_ta").alias("n_tokens_a"),
        F.col("_tb").alias("n_tokens_b"),
        "js_divergence",
        F.round(F.sqrt(F.col("js_divergence")), 6).alias("js_distance"),
    ).orderBy("source_a", "source_b")


def heaps_law_fit(
    docs: DataFrame, n_buckets: int = 10, shingle_n: int = 3
) -> DataFrame:
    """Heaps'-law TYPE-INVENTORY GROWTH curve + log-log slope: distinct
    type count V(N) at 10 nested corpus prefixes (deterministic md5
    doc buckets), with the fitted exponent β of V = K·N^β — the
    corpus-diversity number a scaling review reads: β drifting toward
    0 as the corpus grows means new data is re-treading old material
    (a dedup/diversity problem the per-pair dedup metrics can't
    summarize), β near 1 means noise (every doc invents strings). The
    type unit is the ``shingle_n``-word shingle: Heaps holds for any
    type inventory, and the n-gram inventory keeps discriminating
    long after a small closed word vocabulary saturates (the word
    curve on a template-generated corpus is a flat line — measured:
    31 types, β = 0).

    Registered round 12 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Scale-safety is the construction: V(N) at k prefixes is NOT k
    distinct-counts over k sub-corpora — each token keeps its MINIMUM
    doc-bucket (one groupBy over the token explode), so the whole
    curve falls out of a FIRST-SEEN-bucket histogram of ≤ n_buckets
    rows, cumulated by a bounded window; prefix token totals come from
    the per-bucket token counts the same way. One tokenize pass total.

    Determinism: exact integer counts; lnq-quantized logs; the
    least-squares slope β = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) accumulates over
    the ≤ n_buckets points through the decimal summator into a
    fixed-order double tree, 6-dp rounded. Returns one row per prefix:
    (prefix_bucket, n_ngrams, vocab_size, heaps_beta) — β repeated per
    row like the LPA modularity.
    """
    base = docs.select(
        (
            md5_long(
                F.concat(F.lit("heaps#"), F.col("doc_id").cast("string"))
            )
            % n_buckets
        ).alias("bucket"),
        F.explode(
            word_shingles(tokens(F.col("text")), shingle_n)
        ).alias("tok"),
    ).localCheckpoint(eager=True)  # ONE shingling pass, two consumers
    first_seen = (
        base.groupBy("tok")
        .agg(F.min("bucket").alias("fb"))
        .groupBy("fb")
        .agg(F.count(F.lit(1)).cast("long").alias("new_vocab"))
    )
    per_bucket = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("toks")
    )
    spine = docs.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        spine.join(first_seen, spine["bucket"] == first_seen["fb"], "left")
        .join(per_bucket, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("new_vocab", F.lit(0)).alias("_nv"),
            F.coalesce("toks", F.lit(0)).alias("_tk"),
        )
        .withColumn("vocab_size", F.sum("_nv").over(w).cast("long"))
        .withColumn("n_ngrams", F.sum("_tk").over(w).cast("long"))
        .filter((F.col("n_ngrams") > 0) & (F.col("vocab_size") > 0))
        .select("bucket", "n_ngrams", "vocab_size")
        .localCheckpoint(eager=True)  # bounded: <= n_buckets rows
    )
    # a slope needs >= 2 DISTINCT x points: a one-doc corpus fills the
    # cumulative spine with identical rows, and a constant x makes the
    # least-squares denominator exactly 0 (ANSI division error)
    if curve.select("n_ngrams").distinct().count() < 2:
        raise ValueError(
            "heaps_law_fit: need >= 2 non-empty prefixes to fit a slope"
        )

    def lnq(c: Column) -> Column:
        return F.round(F.log(c) * 1e9).cast("long").cast("double") / 1e9

    pts = curve.select(
        lnq(F.col("n_ngrams").cast("double")).alias("x"),
        lnq(F.col("vocab_size").cast("double")).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(30,10)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(30,10)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,10)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,10)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    beta = mom.select(
        F.round(
            (n * sxy - sx * sy) / (n * sxx - sx * sx), 6
        ).alias("heaps_beta")
    )
    return (
        curve.crossJoin(F.broadcast(beta))
        .select(
            F.col("bucket").alias("prefix_bucket"),
            "n_ngrams",
            "vocab_size",
            "heaps_beta",
        )
        .orderBy("prefix_bucket")
    )


def simpson_diversity(
    docs: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Per-group SIMPSON DIVERSITY of the token distribution — λ =
    Σ cᵢ(cᵢ−1) / (C(C−1)), the probability two tokens drawn WITHOUT
    replacement are the same type (Simpson 1949), with the
    Gini–Simpson complement 1−λ and the inverse-Simpson effective
    type count 1/λ (Hill number of order 2). The concentration-shaped
    diversity card beside the entropy/Zipf/Heaps legs: λ is dominated
    by the HEAD of the distribution (a boilerplate-flooded corpus
    shows a collapsing 1/λ long before the tail-sensitive vocabulary
    metrics move), and unlike entropy it is exactly computable in
    pure integers until one final division.

    Registered round 12 (oracle value-locked at two scales in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: per-(group, token) counts are exact longs;
    Σ cᵢ(cᵢ−1) accumulates through decimal(38,0) over the
    VOCABULARY-sized count table (the decimal-audit class-3 case: the
    squared summand exceeds 2⁶³ at web-scale head-token counts, so
    decimal is the only exact container; the table is an aggregate,
    never the corpus stream); λ and 1/λ are fixed-order double
    expressions of exact integers, 6-dp rounded. Groups with fewer
    than 2 tokens are EXCLUDED (λ is undefined without a pair —
    documented, not NULL-carded).

    Scale shape: one tokenize explode, ONE map-side-combined
    (group, token) groupBy, ONE group rollup — the same two-exchange
    posture as the entropy card; nothing is windowed, broadcast, or
    collected. Returns one row per group: (lang, n_tokens, n_types,
    simpson_lambda, gini_simpson, inv_simpson), ordered by group.
    """
    from etl_developstoday_test_spark.functions import tokens

    counts = (
        docs.select(
            F.col(group_col).alias("lang"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_group = (
        counts.groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(
                (
                    F.col("c").cast("decimal(38,0)")
                    * (F.col("c") - 1).cast("decimal(38,0)")
                ).cast("decimal(38,0)")
            ).alias("_pairs"),
        )
        .filter(F.col("n_tokens") >= 2)
    )
    lam = F.col("_pairs").cast("double") / (
        F.col("n_tokens").cast("double")
        * (F.col("n_tokens") - 1).cast("double")
    )
    return per_group.select(
        "lang",
        "n_tokens",
        "n_types",
        F.round(lam, 6).alias("simpson_lambda"),
        F.round(F.lit(1.0) - lam, 6).alias("gini_simpson"),
        F.round(F.lit(1.0) / lam, 6).alias("inv_simpson"),
    ).orderBy("lang")


def bigram_entropy_rate(
    docs: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Per-group BIGRAM ENTROPY RATE — the plug-in estimate of
    H(w₂|w₁) = H(bigrams) − H(unigrams) (chain rule), the
    predictability-per-token number a corpus card reads next to raw
    unigram entropy: low rate with high unigram entropy = rich
    vocabulary but formulaic sequencing (templates, boilerplate,
    degenerate generation loops), both high = genuinely diverse prose.
    The SEQUENCE-structure complement to simpson_diversity (marginal
    concentration) and heaps_law_fit (inventory growth), all three on
    the same tokenization.

    Registered round 13 (staged r12; oracle value-locked at both
    scales in tests/test_staged_oracles.py BEFORE registration).

    Determinism contract: both entropies use the count identity
    H = ln C − (Σ c·ln c)/C with ln(c) NANO-QUANTIZED per distinct
    count value (round(ln·1e9) as BIGINT — the PSI/PMI idiom) and the
    Σ c·lnq(c) term accumulated through decimal(38,0) over the
    vocabulary-sized count tables (c·lnq exceeds 2⁶³ at web-scale
    head counts — decimal-audit class 3); the assembled entropies and
    the rate are a fixed-order double tree, 6-dp rounded. Bigrams are
    within-document adjacent word pairs (word_shingles n=2 — no
    cross-document seams). Groups with < 2 tokens per doc contribute
    no bigrams; groups with no bigrams at all are excluded
    (documented — the rate needs a pair).

    Scale shape: one tokenize/shingle explode per unit (two corpus
    passes over the same narrow projection), TWO map-side-combined
    (group, type) groupBys, two group rollups joined on the group key
    — nothing windowed, broadcast by hint, or collected. Returns one
    row per group: (lang, n_tokens, n_bigrams, h_unigram, h_bigram,
    entropy_rate), ordered by group.
    """
    from etl_developstoday_test_spark.functions import (
        let,
        tokens,
        word_shingles,
    )

    lnq = lambda c: F.round(  # noqa: E731 — shared nano-quantized ln
        F.log(c.cast("double")) * 1e9
    ).cast("long")

    def side(unit_col, name: str) -> DataFrame:
        counts = (
            docs.select(
                F.col(group_col).alias("lang"),
                F.explode(unit_col).alias("u"),
            )
            .groupBy("lang", "u")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        return counts.groupBy("lang").agg(
            F.sum("c").cast("long").alias(f"n_{name}"),
            F.sum(
                (
                    F.col("c").cast("decimal(38,0)")
                    * lnq(F.col("c")).cast("decimal(38,0)")
                ).cast("decimal(38,0)")
            ).alias(f"_s_{name}"),
        )
    uni = side(tokens(F.col(text_col)), "uni")
    bi = side(
        let(tokens(F.col(text_col)), lambda t: word_shingles(t, 2)), "bi"
    )

    def h(name: str):
        c = F.col(f"n_{name}").cast("double")
        return (
            lnq(F.col(f"n_{name}")).cast("double") / F.lit(1e9)
            - (F.col(f"_s_{name}").cast("double") / F.lit(1e9)) / c
        )

    out = (
        uni.join(bi, "lang")
        .filter(F.col("n_bi") >= 1)
        .select(
            "lang",
            F.col("n_uni").alias("n_tokens"),
            F.col("n_bi").alias("n_bigrams"),
            F.round(h("uni"), 6).alias("h_unigram"),
            F.round(h("bi"), 6).alias("h_bigram"),
            F.round(h("bi") - h("uni"), 6).alias("entropy_rate"),
        )
    )
    return out.orderBy("lang")


def term_burstiness(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
    k: int = 20,
) -> DataFrame:
    """TERM BURSTINESS card (Church & Gale 1995, "Poisson mixtures";
    Katz 1996): per token, the ratio of collection frequency to
    document frequency — cf/df = mean occurrences PER DOCUMENT THAT
    CONTAINS IT. Under an independence (Poisson) model cf/df stays
    near 1; content-bearing and boilerplate terms alike REPEAT within
    the documents they touch, so high cf/df flags template floods and
    keyword-stuffed spam at the TERM level (the token-level complement
    of the doc-level repetition ratio: that says WHICH DOCS repeat,
    this says WHICH TERMS drive it — the dedup shingle salt and
    stopword lists are tuned off exactly this table).

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: cf is an exact count, df an exact COUNT(DISTINCT
    doc) (two-phase partial aggregation — never a global window);
    burstiness is ONE 6-dp division of exact longs, so
    (burstiness DESC, cf DESC, token ASC) is a cross-engine total
    order. ``min_df`` floors out hapax noise (a df=1 token's ratio is
    its raw in-doc count — high variance, no corpus signal).

    Scale shape: one explode + ONE map-side-combined (token, doc)
    groupBy collapses the corpus stream to the bounded (token, doc)
    incidence table, then a vocabulary-sized groupBy and
    TakeOrderedAndProject. Returns top-k rows:
    (token, cf, df, burstiness).
    """
    if min_df < 1:
        raise ValueError("term_burstiness: min_df must be >= 1")
    per_doc = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", "_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    per_tok = per_doc.groupBy("token").agg(
        F.sum("_c").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    return (
        per_tok.filter(F.col("df") >= min_df)
        .select(
            "token",
            "cf",
            "df",
            F.round(
                F.col("cf").cast("double") / F.col("df").cast("double"), 6
            ).alias("burstiness"),
        )
        .orderBy(F.desc("burstiness"), F.desc("cf"), F.asc("token"))
        .limit(k)
    )


def length_percentiles_by_source(
    docs: DataFrame, len_col: str = "n_chars", group_col: str = "source"
) -> DataFrame:
    """Per-source document-LENGTH tail card: p50 / p90 / p99 / max of
    the length column — the number every context-window, packing, and
    chunking decision is budgeted against (mean length is useless for
    that: one 1 MB page in a tweet feed moves the mean and not the
    p50, and it is exactly the p99/max that OOMs a fixed-size batch).
    The per-SOURCE split matters because length regimes differ by
    origin — a global percentile hides the one feed that ships books.

    Registered round 14 (staged r13; oracle two-scale-locked in
    tests/test_staged_oracles.py BEFORE registration).

    Determinism: the SQL-standard interpolated percentile over exact
    integers (Spark ``percentile`` ≡ DuckDB ``quantile_cont``:
    lo + (hi − lo)·q — the MAD-card precedent), 6-dp rounded; counts
    and max are exact longs; NULL/NaN lengths excluded.

    Scale shape: ONE map-side-combined groupBy per source — Spark's
    percentile aggregate buffers per (group, distinct value), bounded
    by the length DOMAIN per source, not the row count. Returns one
    row per source: (source, n_docs, p50, p90, p99, max_len),
    source-ordered.
    """
    v = F.col(len_col).cast("double")
    return (
        docs.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.expr(f"percentile({len_col}, 0.5)"), 6).alias("p50"),
            F.round(F.expr(f"percentile({len_col}, 0.9)"), 6).alias("p90"),
            F.round(F.expr(f"percentile({len_col}, 0.99)"), 6).alias("p99"),
            F.max(F.col(len_col)).cast("long").alias("max_len"),
        )
        .orderBy("source")
    )


def ngram_coverage(
    docs: DataFrame, n: int = 3, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Top-k N-GRAM COVERAGE curve: the k most frequent word n-grams
    with each one's occurrence share and the cumulative head share,
    plus the corpus-level type/occurrence audit on every row — the
    TEMPLATEDNESS card: "the top 100 trigrams cover X% of all trigram
    occurrences" is the single number that says whether a corpus is
    boilerplate-dominated (dedup/shingle pass mandatory) or diverse,
    and WHICH n-grams to blocklist. The corpus-level complement to
    term_burstiness (per-term cf/df) and repetition_profile (per-doc),
    on the same shingling as the MinHash/novelty family.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: counts are exact longs; ranking breaks count ties on
    the n-gram string ASC (total order); shares are single double
    divisions of exact longs, the cumulative share from the exact
    integer running sum — the topk_key_share contract on the shingle
    table.

    Scale shape: ONE tokenize/shingle explode collapsed immediately by
    a map-side-combined groupBy to the type table; the type/occurrence
    audit is one more rollup of that table; the top-k is
    orderBy+limit — TakeOrderedAndProject (per-partition top-k +
    driver merge of k·P rows, never a global sort); the cumulative
    window runs AFTER the limit over exactly k checkpointed rows
    (bounded-window allowlist class). Returns k rows: (rank, ngram,
    n_occurrences, share, cum_share, n_types_total,
    n_occurrences_total), rank-ordered.
    """
    shingled = docs.select(
        F.explode(
            let(tokens(F.col(text_col)), lambda t: word_shingles(t, n))
        ).alias("ngram")
    )
    counts = shingled.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    audit = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_types_total"),
        F.sum("n_occurrences").cast("long").alias("n_occurrences_total"),
    )
    top = (
        counts.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
        .localCheckpoint(eager=True)  # bounded: exactly k rows
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    t = F.col("n_occurrences_total").cast("double")
    return (
        top.crossJoin(F.broadcast(audit))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "_cum",
            F.sum("n_occurrences")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .select(
            "rank",
            "ngram",
            "n_occurrences",
            F.round(F.col("n_occurrences").cast("double") / t, 6).alias(
                "share"
            ),
            F.round(F.col("_cum").cast("double") / t, 6).alias("cum_share"),
            "n_types_total",
            "n_occurrences_total",
        )
        .orderBy("rank")
    )


def char_class_profile(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group CHARACTER-CLASS mix: exact counts of alphabetic,
    digit, space, and other characters with their shares — the
    cheapest corpus-quality fingerprint there is (a source whose
    digit+other share jumps is shipping tables/markup/minified junk;
    a space share far off ~1/6 breaks every whitespace tokenizer
    downstream, including this repo's). The CHARACTER-level leg under
    text_quality_score's document-level heuristics, and the drift
    fingerprint to store per ingest batch.

    Registered in round 15 (two-scale value locks pre-dated
    registration; the oracle twin lives in plans/queries.py and the
    locks import it).

    Determinism: class counts are string lengths after regex class
    deletion — pure exact integers on both engines (the character
    classes are spelled as explicit ASCII ranges, no locale-dependent
    \\w/\\s); shares are single double divisions, 6-dp. NULL texts
    count as zero-length (documented).

    Scale shape: one narrow map (four regexp_replace + lengths per
    row) collapsed by ONE map-side-combined groupBy to the
    group-bounded table. Returns one row per group: (group, n_docs,
    n_chars, alpha_share, digit_share, space_share, other_share),
    group-ordered.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(t).cast("long")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("long")
    space = F.length(
        F.regexp_replace(t, "[^ \\t\\n\\r]", "")
    ).cast("long")
    agg = (
        docs.select(
            F.col(group_col).alias("group"),
            ln.alias("_l"),
            alpha.alias("_a"),
            digit.alias("_d"),
            space.alias("_s"),
        )
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_l").cast("long").alias("n_chars"),
            F.sum("_a").cast("long").alias("_alpha"),
            F.sum("_d").cast("long").alias("_digit"),
            F.sum("_s").cast("long").alias("_space"),
        )
    )
    c = F.col("n_chars").cast("double")
    # a zero-character group has no class mix: NULL shares (portable —
    # 0/0 is ANSI-fatal on Spark and NaN on DuckDB; NULL on both)
    nz = F.col("n_chars") > 0
    share = lambda col: F.when(  # noqa: E731
        nz, F.round(F.col(col).cast("double") / c, 6)
    )
    return agg.select(
        "group",
        "n_docs",
        "n_chars",
        share("_alpha").alias("alpha_share"),
        share("_digit").alias("digit_share"),
        share("_space").alias("space_share"),
        F.when(
            nz,
            F.round(
                (
                    F.col("n_chars")
                    - F.col("_alpha")
                    - F.col("_digit")
                    - F.col("_space")
                )
                .cast("double")
                / c,
                6,
            ),
        ).alias("other_share"),
    ).orderBy("group")


def ttr_hapax_by_source(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source LEXICAL-RICHNESS card: token count, distinct type
    count, type-token ratio, and the hapax-legomena count and share
    (types occurring exactly once WITHIN the source). The
    per-source twin the corpus-level vocabulary cards need:
    text_heaps_law_fit says how the GLOBAL vocabulary grows,
    text_simpson_diversity how concentrated it is — this says which
    SOURCE is template spam (TTR collapsing, hapax share near zero)
    vs open text, per ingest feed, the cheapest routing signal a
    curation pass gets before any model runs.

    STAGED for round-16 registration (oracle pre-validated in
    tests/test_staged_oracles.py at both scales).

    Determinism: tokenization is the repo's shared whitespace split;
    all four counts are exact longs off ONE (source, token) rollup;
    the two ratios divide once each, 6-dp. Sources whose docs are
    all empty/NULL still appear — with zero counts and NULL ratios
    (the ANSI degenerate-card convention), via the source spine.

    Scale shape: one tokenize explode collapsed immediately by a
    map-side-combined groupBy(source, token) to per-type counts
    (vocabulary-bounded per source), then ONE more map-side groupBy
    to the source-bounded card — never a distinct pass separate from
    the counting pass; the source spine is a second, SOURCE-column-
    pruned scan collapsed map-side (bounded — the explicit scan
    allowance), outer-joining the card so dark sources still report.
    Returns one row per source: (source, n_tokens, n_types, ttr,
    n_hapax, hapax_share), source-ordered.
    """
    toks = (
        docs.select(
            F.col(source_col).alias("_s"),
            F.explode(tokens(F.col(text_col))).alias("_t"),
        )
        .filter(F.col("_t") != "")
        .groupBy("_s", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    card = toks.groupBy(F.col("_s").alias("source")).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    spine = docs.select(F.col(source_col).alias("source")).distinct()
    card = spine.join(card, "source", "left").select(
        "source",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
            "n_tokens"
        ),
        F.coalesce(F.col("n_types"), F.lit(0)).cast("long").alias(
            "n_types"
        ),
        F.coalesce(F.col("n_hapax"), F.lit(0)).cast("long").alias(
            "n_hapax"
        ),
    )
    return card.select(
        "source",
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("ttr"),
        "n_hapax",
        F.when(
            F.col("n_types") > 0,
            F.round(
                F.col("n_hapax").cast("double")
                / F.col("n_types").cast("double"),
                6,
            ),
        ).alias("hapax_share"),
    ).orderBy("source")
