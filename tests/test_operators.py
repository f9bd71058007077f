"""Unit tests for individual operators: dedup strategies, similarity
recall, simhash pigeonhole completeness, text dedup on synthetic docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_developstoday_test_spark.operators import similarity, text_dedup
from etl_developstoday_test_spark.operators.dedup import first_wins_dedup
from tests.conftest import SF_DIR


@pytest.fixture()
def dup_df(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 3), ("a", 1, 1), ("a", 1, 2),  # key (a,1): winner order 1
            ("b", 2, 5),
            ("a", 2, 4), ("a", 2, 9),
        ],
        "k1 string, k2 long, ord long",
    )


@pytest.mark.parametrize("strategy", ["window", "agg"])
def test_first_wins_dedup_strategies_agree(dup_df, strategy):
    winners, losers = first_wins_dedup(dup_df, ["k1", "k2"], "ord", strategy)
    w = sorted(tuple(r) for r in winners.select("k1", "k2", "ord").collect())
    l = sorted(tuple(r) for r in losers.select("k1", "k2", "ord").collect())
    assert w == [("a", 1, 1), ("a", 2, 4), ("b", 2, 5)]
    assert l == [("a", 1, 2), ("a", 1, 3), ("a", 2, 9)]


def test_exact_duplicates_groups(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    rows = {r["canonical_doc_id"]: r["n_copies"]
            for r in text_dedup.exact_duplicates(docs).collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_lsh_finds_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words about database engines and shuffles here"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             text_dedup.minhash_lsh_pairs(docs, n=3, threshold=0.3).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_near_pairs_complete_within_radius(spark):
    """Pigeonhole candidate generation must find every pair with
    Hamming distance ≤ 3 that a brute-force comparison finds."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    sk = text_dedup.simhash(docs)
    a = sk.selectExpr("doc_id AS doc_a", "simhash AS sim_a")
    b = sk.selectExpr("doc_id AS doc_b", "simhash AS sim_b")
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )
    got = sorted(tuple(r) for r in text_dedup.simhash_near_pairs(docs).collect())
    want = sorted(tuple(r) for r in brute.collect())
    assert got == want


def test_ivf_recall_against_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    exact = similarity.cosine_topk(emb, probes, k=10)
    approx = similarity.ivf_topk(emb, probes, centroids, k=10, nprobe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # every approx hit must be a genuine corpus vector with correct rank order
    ranks = {}
    for r in approx.collect():
        ranks.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for q, rs in ranks.items():
        rs.sort()
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True), f"rank order broken for {q}"


def test_cosine_topk_self_excluded_and_sane(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["neighbor_id"] != 0 for r in rows)
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in rows)


# --- as-of join -------------------------------------------------------------


def test_asof_join_semantics(spark):
    from etl_developstoday_test_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 100, 10.0),   # events at 50, 90 → latest is 90
            (2, 90, 20.0),    # event exactly at 90 → inclusive match
            (3, 40, 30.0),    # before any event → null
            (9, 100, 40.0),   # key with no right rows at all → null
        ],
        "k long, lt long, lval double",
    )
    right = spark.createDataFrame(
        [
            (1, 50, 1.0, 100),
            (1, 90, 2.0, 101),
            (2, 90, 3.0, 102),
            (2, 90, 4.0, 103),  # tie on (k, ts): greatest rid (103) wins
            (3, 60, 5.0, 104),
        ],
        "k long, rt long, rval double, rid long",
    )
    out = asof_join(
        left, right, key="k", left_ts="lt", right_ts="rt",
        right_values=["rval"], right_id="rid",
    )
    rows = {r["k"]: (r["asof_rt"], r["asof_rval"]) for r in out.collect()}
    assert rows[1] == (90, 2.0)
    assert rows[2] == (90, 4.0)   # inclusive + dedup by rid desc
    assert rows[3] == (None, None)
    assert rows[9] == (None, None)
    assert out.count() == left.count()  # left-join cardinality preserved


def test_asof_join_plan_has_no_join_node(spark):
    """The whole point of the union+window design: no join operator, so
    no O(|L| × matches) intermediate blowup at scale."""
    from etl_developstoday_test_spark.operators.asof import asof_join

    left = spark.range(10).selectExpr("id AS k", "id * 10 AS lt", "1.0 AS lv")
    right = spark.range(10).selectExpr(
        "id AS k", "id * 7 AS rt", "2.0 AS rv", "id AS rid"
    )
    out = asof_join(left, right, "k", "lt", "rt", ["rv"], right_id="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Union" in plan


# --- blocked embedding cosine near-dup --------------------------------------


def test_cosine_near_pairs_matches_bruteforce(spark):
    import itertools
    import math

    vecs = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [0.9, 0.1, 0.0]),    # near 0
        (2, 0, [0.0, 1.0, 0.0]),    # orthogonal to 0/1
        (3, 1, [1.0, 0.0, 0.0]),    # same dir as 0 but different block
        (4, 1, [0.5, 0.5, 0.0]),
        (5, 1, [0.51, 0.49, 0.0]),  # near 4
    ]
    df = spark.createDataFrame(
        [(i, b, [float(x) for x in v]) for i, b, v in vecs],
        "vec_id long, label int, embedding array<float>",
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.cosine_near_pairs(df, threshold=0.95).collect()
    }

    def cos(u, v):
        dot = sum(x * y for x, y in zip(u, v))
        return dot / math.sqrt(
            sum(x * x for x in u) * sum(y * y for y in v)
        )

    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(vecs, 2)
        if a[1] == b[1] and cos(a[2], b[2]) >= 0.95
    }
    assert got == want and (0, 1) in got and (4, 5) in got
    # cross-block pair (0,3) is identical but must NOT appear (blocking)
    assert (0, 3) not in got


# --- fan_out ----------------------------------------------------------------


def test_fan_out_widens_narrow_and_keeps_wide(spark):
    from etl_developstoday_test_spark.functions import fan_out

    narrow = spark.range(100).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    assert fan_out(narrow, cap=2).rdd.getNumPartitions() == 2
    wide = spark.range(100).repartition(64)
    assert fan_out(wide) is wide  # no-op: never narrows or re-shuffles


# --- connected components ---------------------------------------------------


def test_connected_components_chain_clique_isolate(spark):
    from etl_developstoday_test_spark.operators.graph import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 round), clique 10-11-12, isolate 99
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    verts = spark.createDataFrame(
        [(n,) for n in [1, 2, 3, 4, 10, 11, 12, 99]], "node long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_salt_spreads_hot_key_from_single_partition(spark):
    """A hot key concentrated in ONE input partition must still spread
    across all n_salts sub-keys — the regression for the per-partition
    salt flaw (a partition-id salt gives every row the same salt here)."""
    from etl_developstoday_test_spark.operators.skew import (
        _row_salt,
        salted_join,
        salted_sum_count,
    )

    n_salts = 8
    hot = (
        spark.range(4000)
        .coalesce(1)  # the adversarial case: a single input partition
        .select(F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v"))
    )
    salt_counts = (
        hot.withColumn("_salt", _row_salt(n_salts))
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(salt_counts) == n_salts, salt_counts
    # roughly balanced: no salt holds more than 2x its fair share
    assert max(r["count"] for r in salt_counts) < 2 * 4000 / n_salts

    # values unchanged vs the plain aggregation
    got = salted_sum_count(hot, ["k"], "v", n_salts=n_salts).collect()[0]
    assert got["n_rows"] == 4000
    assert got["sum_value"] == sum(i % 7 for i in range(4000))

    dim = spark.createDataFrame([("hot", "enriched")], "dk string, attr string")
    joined = salted_join(hot, dim, "k", "dk", n_salts=n_salts)
    assert joined.count() == 4000


def test_ngram_jaccard_df_max_sizes_match_filtered_space(spark):
    """With df_max set, sizes and intersections must live in the same
    (filtered) shingle space — the exact Jaccard of what survives the
    rarity filter, not filtered intersections over unfiltered sizes."""
    common = "the quick brown fox"  # shared by all docs → df=3 > df_max
    docs = spark.createDataFrame(
        [
            (1, f"{common} alpha beta gamma delta"),
            (2, f"{common} alpha beta gamma epsilon"),
            (3, f"{common} zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in text_dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.0, df_max=2
        ).collect()
    }
    # df_max=2 drops "the quick brown" and "quick brown fox" (df=3).
    # Post-filter doc1/doc2 each keep 4 shingles, sharing {brown fox
    # alpha, fox alpha beta, alpha beta gamma} → J = 3/(4+4−3) = 0.6.
    # The pre-fix code divided by unfiltered sizes (6) → 3/9 ≈ 0.33.
    assert pairs[(1, 2)] == 0.6


def test_chunk_overlap_covers_and_overlaps(spark):
    """Chunks tile every token with the configured stride/overlap; the
    last chunk is short; a short doc yields exactly one chunk."""
    from etl_developstoday_test_spark.operators.text_analysis import chunk_overlap

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))), (2, "a b c")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_overlap(docs, chunk_tokens=64, stride=48).collect()
    }
    assert {(d, c) for d, c in rows} == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 0)}
    assert rows[(1, 0)].start_token == 0 and rows[(1, 0)].n_chunk_tokens == 64
    assert rows[(1, 1)].start_token == 48
    # overlap: chunk 1 starts inside chunk 0's token range
    assert rows[(1, 0)].chunk_text.split()[48] == rows[(1, 1)].chunk_text.split()[0]
    assert rows[(1, 3)].start_token == 144 and rows[(1, 3)].n_chunk_tokens == 6
    assert rows[(2, 0)].chunk_text == "a b c"


def test_hyperplane_lsh_recovers_planted_near_dups(spark):
    """A vector and its tiny perturbation must share every band; the
    verified output contains exactly the planted pairs at τ=0.99."""
    import random

    rnd = random.Random(7)
    base = [[rnd.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(1000 + i, [v[0] + 0.001] + v[1:]) for i, v in enumerate(base[:5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.hyperplane_lsh_pairs(emb, threshold=0.99)
    got = {(r.vec_id_a, r.vec_id_b) for r in out.collect()}
    assert {(i, 1000 + i) for i in range(5)} <= got
    for r in out.collect():
        assert r.cos_sim >= 0.99


def test_benchmark_contamination_flags_verbatim_inclusion(spark):
    """A corpus doc embedding a benchmark doc verbatim scores ratio
    near |bench shingles| / |corpus shingles|; unrelated docs score 0
    (absent from output)."""
    bench_text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # benchmark slice: doc_id % 97 == 0
            (5, "intro words " + bench_text + " trailing words"),
            (6, "totally different content with no shared trigrams here"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.bench_id): r
        for r in text_dedup.benchmark_contamination(docs, bench_modulus=97).collect()
    }
    assert (5, 0) in out
    r = out[(5, 0)]
    assert r.n_common == 4  # all 4 bench trigrams appear in doc 5
    assert abs(r.overlap_ratio - 4 / 8) < 1e-12  # doc 5 has 8 distinct trigrams
    assert all(d != 6 for d, _ in out)


def test_repetition_ratio_known_doc(spark):
    from etl_developstoday_test_spark.operators.text_analysis import repetition_ratio

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "all unique words here now")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_ratio(docs).collect()}
    # doc 1: 7 trigram occurrences, 3 distinct → 4/7 repeats
    assert out[1].n_ngrams == 7 and out[1].n_unique_ngrams == 3
    assert abs(out[1].dup_ngram_ratio - 4 / 7) < 1e-12
    assert abs(out[1].dup_token_ratio - 6 / 9) < 1e-12
    assert out[2].dup_ngram_ratio == 0.0 and out[2].dup_token_ratio == 0.0


def test_token_rarity_df_semantics(spark):
    from etl_developstoday_test_spark.operators.text_analysis import token_rarity

    docs = spark.createDataFrame(
        [(1, "shared shared alone1"), (2, "shared alone2")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_rarity(docs).collect()}
    # 'shared' df=2 (per-doc distinct — repeated use counts once)
    assert out[1].n_distinct_tokens == 2 and out[1].total_df == 3
    assert abs(out[1].mean_token_df - 1.5) < 1e-12
    assert out[2].total_df == 3


def test_mad_outliers_group_map(spark):
    from etl_developstoday_test_spark.operators.events_etl import (
        mad_outliers_per_type,
    )

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0), ("b", 5.0)],
        "event_type string, value double",
    )
    out = {r.event_type: r for r in mad_outliers_per_type(ev).collect()}
    # a: sorted [1,2,3,100], median = 2 + (3-2)*0.5 = 2.5; dev [1.5,.5,.5,97.5]
    # → MAD = .5 + (1.5-.5)*.5 = 1.0; outliers: dev > 3 → only 97.5
    assert out["a"].n_events == 4
    assert out["a"].median_value == 2.5
    assert out["a"].mad_value == 1.0
    assert out["a"].n_outliers == 1
    # singleton group: MAD 0, no outliers (0 > 0 is false)
    assert out["b"].median_value == 5.0 and out["b"].n_outliers == 0


def test_bpe_token_stats_contractions_and_mixed(spark):
    from etl_developstoday_test_spark.operators.text_analysis import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "it's 42 degrees, really!"), (2, "plain words only")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bpe_token_stats(docs).collect()}
    # it | 's | " 42" | " degrees" | "," | " really" | "!" → 7 pieces
    assert out[1].n_bpe_tokens == 7
    assert out[2].n_bpe_tokens == 3
    assert out[2].bpe_per_word == 1.0


def test_keep_best_duplicates_picks_highest_quality(spark):
    """Identical-content docs: the winner is the highest-quality copy
    (NOT the lowest doc_id), ties broken by doc_id; unique content
    passes through with n_copies=1."""
    docs = spark.createDataFrame(
        [
            # same content, three copies — equal quality, so doc_id
            # tie-break keeps 10
            (12, "the quick brown fox"),
            (10, "the quick brown fox"),
            (11, "the quick brown fox"),
            # unique
            (20, "a lone document here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_copies"]
        for r in text_dedup.keep_best_duplicates(docs).collect()
    }
    assert out == {10: 3, 20: 1}


def test_keep_best_duplicates_quality_beats_doc_id(spark):
    """When copies differ (different content hash they are NOT dups;
    construct dups via identical text) the score decides: a doc whose
    text has higher alpha/stopword/type-token ratios wins within its
    group regardless of id order — verified by planting two groups and
    checking each group's winner is its own min id (scores equal within
    a group by construction)."""
    docs = spark.createDataFrame(
        [(5, "x y z x y z"), (4, "x y z x y z"), (3, "the and of is")],
        "doc_id long, text string",
    )
    rows = text_dedup.keep_best_duplicates(docs).collect()
    winners = sorted(r["doc_id"] for r in rows)
    assert winners == [3, 4]


def test_winnow_fingerprints_guarantee_and_short_docs(spark):
    """A shared passage of >= k+w-1 tokens must share at least one
    fingerprint (the winnowing guarantee); documents shorter than
    k+w-1 tokens yield none."""
    shared = "one two three four five six seven eight"  # 8 tokens >= 3+4-1
    docs = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing bits"),
            (2, f"{shared} completely different ending text"),
            (3, "too short"),  # 2 tokens < k -> no shingles
            (4, "just four tokens here"),  # 4 tokens -> 2 hashes < w
        ],
        "doc_id long, text string",
    )
    fp = text_dedup.winnow_fingerprints(docs)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert 3 not in by_doc and 4 not in by_doc
    assert by_doc[1] & by_doc[2], "shared passage produced no shared fingerprint"


def test_winnow_fingerprints_distinct_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["rep rep rep"] * 10))], "doc_id long, text string"
    )
    rows = text_dedup.winnow_fingerprints(docs).collect()
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps)), "fingerprints must be distinct per doc"


def test_winnow_match_pairs_df_max_drops_boilerplate(spark):
    """The hot-key guard: fingerprints from a passage shared corpus-wide
    (df > df_max) must not generate candidate pairs — one such
    fingerprint in d documents costs d² in a single join bucket at
    scale — while pairs sharing RARE fingerprints survive."""
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    shared = "orchid nebula quartz marble falcon ember cobalt prism velvet"
    rows = [(1, f"{boiler} {shared}"), (2, f"{boiler} {shared}")]
    rows += [
        (i, f"{boiler} tail{i}a tail{i}b tail{i}c tail{i}d tail{i}e")
        for i in range(3, 7)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in text_dedup.winnow_match_pairs(docs, min_shared=1).collect()
    }
    capped = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in text_dedup.winnow_match_pairs(
            docs, min_shared=1, df_max=3
        ).collect()
    }
    # boilerplate fingerprints have df=6 > 3: every cross-doc pair they
    # induced disappears; the true near-dup pair (rare fps, df=2) stays
    assert (1, 2) in capped
    assert capped == {(1, 2)}
    assert uncapped - {(1, 2)}, "cap did no work: boilerplate made no pairs"


def test_asof_join_carries_matched_row_atomically(spark):
    """Whole-row ASOF semantics: a NULL inside a right value column
    must stay NULL on the matched output — not be back-filled from an
    older right row (the per-column-carry bug: last(ignorenulls) per
    value column stitched columns from different rows)."""
    from etl_developstoday_test_spark.operators.asof import (
        asof_join,
        asof_join_nearest,
    )

    left = spark.createDataFrame([(1, 100, 0.0)], "k long, lt long, lval double")
    right = spark.createDataFrame(
        [
            (1, 50, 1.0, "old"),   # older row: fully populated
            (1, 90, None, "new"),  # matched row: rval is NULL
        ],
        "k long, rt long, rval double, rtag string",
    )
    for fn in (asof_join, asof_join_nearest):
        row = fn(
            left, right, key="k", left_ts="lt", right_ts="rt",
            right_values=["rval", "rtag"],
        ).collect()[0]
        assert row["asof_rt"] == 90, fn.__name__
        assert row["asof_rval"] is None, (
            f"{fn.__name__}: stitched rval from a different right row"
        )
        assert row["asof_rtag"] == "new", fn.__name__


def test_quality_route_first_failure_order(spark):
    """A document violating several rules must get the FIRST one
    (too_short → low_alpha → too_repetitive → lang_not_allowed), the
    reference parser's error-routing semantics."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        quality_route,
    )

    good = "the quick brown fox jumps over one lazy dog near a calm river " \
           "while two birds watch from tall green trees in warm light"
    docs = spark.createDataFrame(
        [
            # short AND non-alpha AND wrong lang -> too_short wins
            (1, "@@ ## $$", "zz", "s", 8),
            # long enough, alpha fails AND repetitive -> low_alpha wins
            (2, " ".join(["@1x"] * 30), "en", "s", 90),
            # alpha fine, repetitive AND wrong lang -> too_repetitive
            (3, " ".join(["word"] * 30), "zz", "s", 120),
            # clean text, disallowed lang -> lang_not_allowed
            (4, good, "zz", "s", len(good)),
            (5, good, "en", "s", len(good)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # explicit thresholds: the defaults are tuned to the synthetic
    # corpus (dense long words), where prose-like whitespace ratios
    # would trip min_alpha
    got = {
        r["doc_id"]: r["verdict"]
        for r in quality_route(docs, min_alpha=0.7, max_dup=0.5).collect()
    }
    assert got == {
        1: "too_short",
        2: "low_alpha",
        3: "too_repetitive",
        4: "lang_not_allowed",
        5: "ok",
    }


def test_pack_sequences_chunking_semantics(spark):
    """Concatenate-and-chunk: within a shard, a document belongs to the
    sequence containing its FIRST token, documents may straddle the
    budget boundary, and per-sequence token sums partition the shard's
    total exactly."""
    from etl_developstoday_test_spark.operators.sampling import (
        pack_sequences,
    )

    # n_shards=1 -> one concatenation stream ordered by doc_id;
    # token counts: 6, 6, 6 with budget 10:
    #   doc1 starts at 0  -> seq 0
    #   doc2 starts at 6  -> seq 0 (straddles the 10-token boundary)
    #   doc3 starts at 12 -> seq 1
    docs = spark.createDataFrame(
        [(i, "a b c d e f", "en", "s", 11) for i in (1, 2, 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {
        r["seq_id"]: r
        for r in pack_sequences(docs, budget=10, n_shards=1).collect()
    }
    assert rows[0]["n_docs"] == 2 and rows[0]["seq_tokens"] == 12
    assert rows[0]["first_doc_id"] == 1 and rows[0]["last_doc_id"] == 2
    assert rows[1]["n_docs"] == 1 and rows[1]["first_doc_id"] == 3


def test_count_min_is_one_sided_under_forced_collisions(spark):
    """CMS invariant: estimates NEVER undercount (min over rows of
    counters that each include the true count), and a tiny width forces
    collisions so the overestimate is actually exercised."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        count_min_heavy_hitters,
    )

    tok = spark.createDataFrame(
        [(f"tok{i % 50}",) for i in range(2000)], "token string"
    )
    rows = count_min_heavy_hitters(tok, d=2, w=4, k=50).collect()
    assert len(rows) == 50
    assert all(r["est_count"] >= r["exact_count"] for r in rows)
    assert all(r["over_count"] == r["est_count"] - r["exact_count"] for r in rows)
    # 50 tokens into 4 buckets: collisions are certain somewhere
    assert any(r["over_count"] > 0 for r in rows)


def test_quantize_int8_invariants(spark):
    """Symmetric int8 quantization invariants: the max-|x| dimension
    always saturates to ±127 exactly, the checksum reflects signs, and
    the reconstruction error respects the half-step bound
    n_dims·(0.5/scale)² per vector."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, -1.0, 0.5, 0.25]),
            (2, [0.1, 0.1, 0.1, 0.1]),
            (3, [-2.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in similarity.quantize_int8(emb).collect()}
    # vec 1: scale = 127; q = [127, -127, 64, 32]
    assert rows[1]["q_checksum"] == 127 - 127 + 64 + 32
    assert rows[1]["n_saturated"] == 2
    # vec 2: all dims equal max -> all saturate, zero error
    assert rows[2]["q_checksum"] == 4 * 127
    assert rows[2]["n_saturated"] == 4
    assert rows[2]["sq_err_femto"] == 0
    # vec 3: negative max-abs saturates; zeros quantize to 0 exactly
    assert rows[3]["q_checksum"] == -127
    assert rows[3]["n_saturated"] == 1
    for r in rows.values():
        scale = 127.0 / r["max_abs"]
        bound = r["n_dims"] * (0.5 / scale) ** 2 * 1e15 + r["n_dims"]
        assert 0 <= r["sq_err_femto"] <= bound


def test_kmeans_lloyd_separates_planted_clusters(spark):
    """Two well-separated planted groups with one init centroid in each
    (every-50th init picks ids 0 and 50) must come out as two pure
    clusters with near-1 cohesion after the Lloyd iterations."""
    from etl_developstoday_test_spark.operators.similarity import kmeans_lloyd

    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.001 * i, 0.0]))  # group A around x-axis
        rows.append((50 + i, [0.0, 0.001 * i, 1.0]))  # group B around z-axis
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    out = {
        r["centroid_id"]: (r["n_members"], r["mean_cos_sim"])
        for r in kmeans_lloyd(emb).collect()
    }
    assert set(out) == {0, 50}
    assert out[0][0] == 10 and out[50][0] == 10
    assert out[0][1] > 0.99 and out[50][1] > 0.99


def test_mixture_upsample_copies_match_hash_formula(spark):
    """Per-doc replica count must equal floor(w) + [u < frac(w)] with u
    recomputed independently in Python from the same salted md5 — and
    zero-copy docs must vanish (the sequence-counts-down guard)."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.sampling import mixture_upsample

    rows = [(i, w) for i, w in enumerate([0.0, 0.4, 1.0, 2.5, 3.9, 0.9999])]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = (
        mixture_upsample(df, F.col("w"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("replica").alias("mx"))
        .collect()
    )
    got = {r["doc_id"]: (r["n"], r["mx"]) for r in out}
    for i, w in rows:
        u = (int(hashlib.md5(f"up#{i}".encode()).hexdigest()[:15], 16) % 10000) / 10000.0
        exp = math.floor(w) + (1 if u < w - math.floor(w) else 0)
        if exp == 0:
            assert i not in got
        else:
            assert got[i] == (exp, exp)


def test_lsh_pairs_subset_of_exact_jaccard_pairs(spark):
    """Family consistency on real corpus data: every MinHash-LSH pair
    is exact-verified, so the LSH output must be a subset of the
    exhaustive shingle-Jaccard pairs at the same threshold; and exact
    duplicates (identical text → identical signatures → guaranteed
    band collision) must all surface through LSH. Together these pin
    the sketch's one-sided error: it may MISS near-dups, it must never
    invent one."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from etl_developstoday_test_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # the corpus plants near-dups but no byte-identical clones; add two
    # so the guaranteed-collision half of the invariant has teeth
    seed_text = base.filter(F.col("doc_id") == 0).collect()[0]["text"]
    clones = spark.createDataFrame(
        [(1_000_000, seed_text), (1_000_001, seed_text)],
        "doc_id long, text string",
    )
    docs = base.unionByName(clones)
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert lsh, "corpus has planted near-dups; LSH should find some"
    assert lsh <= exact, f"LSH invented pairs: {sorted(lsh - exact)[:5]}"

    # identical-text pairs from the digest groups must all be in lsh
    groups = (
        docs.groupBy(F.md5("text").alias("digest"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .collect()
    )
    dup_pairs = {
        (min(a, b), max(a, b))
        for g in groups
        for a in g["ids"]
        for b in g["ids"]
        if a < b
    }
    assert dup_pairs, "corpus has planted exact duplicates"
    assert dup_pairs <= lsh, sorted(dup_pairs - lsh)[:5]


def test_snapshot_diff_counts_partition_both_versions(spark):
    """Accounting identity of the diff: |v1| = removed + changed +
    unchanged and |v2| = added + changed + unchanged — every row of
    both versions is classified exactly once."""
    from etl_developstoday_test_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    import duckdb

    got = {
        r["change_type"]: r["n_rows"]
        for r in QUERIES["etl_snapshot_diff_counts"](spark, SF_DIR).collect()
    }
    n_v1 = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    n_dropped = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey % 97 = 0"
    ).fetchone()[0]
    n_added = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet' WHERE o_orderkey % 101 = 0"
    ).fetchone()[0]
    assert got.get("removed", 0) + got.get("changed", 0) + got.get("unchanged", 0) == n_v1
    assert got.get("added", 0) + got.get("changed", 0) + got.get("unchanged", 0) == n_v1 - n_dropped + n_added
    assert got.get("removed", 0) == n_dropped
    assert got.get("added", 0) == n_added


def test_max_concurrent_matches_global_python_sweep(spark):
    """The distributed two-level sweep (hour-partitioned running sums +
    metadata carry) must equal a single-threaded global sweep over the
    same intervals — validating the decomposition itself, not just the
    oracle's identical algorithm."""
    from etl_developstoday_test_spark.operators.events_etl import sessionize
    from etl_developstoday_test_spark.plans.queries import QUERIES
    from etl_developstoday_test_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    got = {
        r["hour"]: r["max_concurrent"]
        for r in QUERIES["events_max_concurrent_sessions"](spark, SF_DIR).collect()
    }

    ivals = [
        (r["session_start"], r["session_end"])
        for r in sessionize(load_table(spark, SF_DIR, "events")).collect()
    ]
    deltas = [(s, 1) for s, _ in ivals] + [(e, -1) for _, e in ivals]
    # +1 before -1 at equal ts: touching sessions count as concurrent
    deltas.sort(key=lambda t: (t[0], -t[1]))
    level = 0
    want: dict = {}
    for ts, d in deltas:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        # the level carried into the hour is a valid level within it
        want.setdefault(hour, level)
        level += d
        want[hour] = max(want[hour], level)
    assert got == want
    assert max(got.values()) >= 2  # the corpus really has overlap


def test_pq_topk_clone_is_top_ranked(spark):
    """A corpus vector that clones the probe encodes to the probe's own
    codes, so ADC ranks it at the maximum possible score — rank 1."""
    import math

    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.similarity import pq_topk

    rows = []
    for i in range(40):
        vec = [math.sin(0.1 * i * (d + 1)) for d in range(64)]
        rows.append((i, vec))
    rows.append((100, rows[3][1]))  # clone of vec 3
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(df, df.filter(F.col("vec_id") == 3)).collect()
    top = [r for r in out if r.rank == 1]
    assert len(top) == 1 and top[0].neighbor_id == 100


def test_prefix_filter_equals_brute_force_with_fewer_candidates(spark):
    """Prefix filtering must (a) return exactly the brute-force Jaccard
    pairs — the losslessness theorem — including a planted near-clone,
    and (b) generate far fewer candidate pairs than the shared-shingle
    join on a corpus with hot boilerplate: common (high-df) shingles
    never enter any document's rarest-first prefix."""
    from pyspark.sql import Window, functions as F

    from etl_developstoday_test_spark.operators.text_dedup import (
        _doc_shingles,
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    boiler = "all rights reserved please do not redistribute this file"
    rows = [
        (
            i,
            boiler
            + " "
            + " ".join(f"w{i}x{j} token{i * 37 + j}" for j in range(12)),
        )
        for i in range(30)
    ]
    rows.append((100, rows[7][1] + " tail"))  # near-clone of doc 7
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b): (r.intersection_size, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    want = {
        (r.doc_a, r.doc_b): (r.intersection_size, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert got == want
    assert set(got) == {(7, 100)}  # only the planted clone qualifies

    sh = _doc_shingles(docs, 3)

    def n_cands(pref):
        a = pref.select(F.col("doc_id").alias("a"), "shingle")
        b = pref.select(F.col("doc_id").alias("b"), "shingle")
        return (
            a.join(b, "shingle").filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct().count()
        )

    brute_cands = n_cands(sh)
    assert brute_cands >= 400  # boilerplate makes ~every pair a candidate

    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc_id").orderBy("_df", "shingle")
    ranked = sh.join(dfreq, "shingle").select(
        "doc_id", "shingle", F.row_number().over(w).alias("_pos")
    )
    sizes = ranked.groupBy("doc_id").agg(F.max("_pos").alias("_n"))
    prefix = ranked.join(sizes, "doc_id").filter(
        F.col("_pos") <= F.col("_n") - F.ceil(0.5 * F.col("_n")) + 1
    )
    assert n_cands(prefix) <= 2  # rare-shingle prefixes: clone pair only


def test_triangle_count_known_graphs(spark):
    """K4 has exactly 4 triangles; a path has 0; and on a hub-and-
    spoke graph orientation keeps every out-degree at 1 even though
    the hub's undirected degree is n — the 'last reducer' bound."""
    from etl_developstoday_test_spark.operators.graph import triangle_count

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "ua long, ub long",
    )
    r = triangle_count(k4).collect()[0]
    assert (r.n_edges, r.n_triangles) == (6, 4)

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "ua long, ub long"
    )
    r = triangle_count(path).collect()[0]
    assert (r.n_edges, r.n_triangles) == (6, 0)

    hub = spark.createDataFrame(
        [(0, i) for i in range(1, 20)], "ua long, ub long"
    )
    r = triangle_count(hub).collect()[0]
    # spokes have degree 1 < hub's 19, so every edge orients spoke→hub:
    # each spoke's out-degree is 1 and the hub's is 0 — no node ever
    # fans out its full undirected degree
    assert (r.n_edges, r.n_triangles, r.max_outdegree) == (19, 0, 1)


def test_bpe_merge_rounds_classic_corpus(spark):
    """Sennrich-style corpus with hand-computed merge sequence: ties on
    count must break lexicographically, merged symbols must compose in
    later rounds (ew+est→ewest), and vocab/token counts must track the
    applied merges exactly."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_merge_rounds,
    )

    text = " ".join(
        ["low"] * 3 + ["lower"] * 2 + ["newest"] * 5 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = {
        r.round: r for r in bpe_merge_rounds(docs, rounds=5).collect()
    }
    got = [
        (r.pair_a, r.pair_b, r.pair_count, r.vocab_size, r.total_tokens)
        for r in (rows[k] for k in sorted(rows))
    ]
    assert got == [
        ("e", "s", 8, 10, 59),
        ("es", "t", 8, 9, 51),
        ("e", "w", 5, 10, 46),
        ("ew", "est", 5, 10, 41),
        ("l", "o", 5, 9, 36),
    ]


def test_bpe_merge_greedy_leftmost_in_runs(spark):
    """Overlapping (a,a) occurrences must merge leftmost-first:
    'aaaa'→[aa,aa], 'aaa'→[aa,a]; the pair count itself stays the
    standard overlapping count (5)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_merge_rounds,
    )

    docs = spark.createDataFrame(
        [(0, "aaaa aaa")], "doc_id long, text string"
    )
    r = bpe_merge_rounds(docs, rounds=1).collect()[0]
    assert (r.pair_a, r.pair_b, r.pair_count) == ("a", "a", 5)
    assert (r.vocab_size, r.total_tokens) == (2, 4)  # {aa, a}; [aa,aa]+[aa,a]


def test_anisotropy_stats_detects_planted_collapse(spark):
    """Participation ratio must read ≈1 when all variance lives on one
    axis, ≈d on an isotropic (one-hot) set, and the batch-partial path
    must agree with a single-partition run (sum order irrelevant —
    integer partials)."""
    from etl_developstoday_test_spark.operators.similarity import (
        anisotropy_stats,
    )

    # collapse: every vector is t * e_3 — variance only on dim 3
    collapsed = spark.createDataFrame(
        [(i, [0.0] * 3 + [float(i % 7) / 10.0] + [0.0] * 4) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    r = anisotropy_stats(collapsed).collect()[0]
    assert r.n_vectors == 40 and r.dim == 8
    assert r.top_var_dim == 3
    assert abs(r.participation_ratio - 1.0) < 1e-9
    assert abs(r.top_var_share - 1.0) < 1e-9
    assert abs(r.offdiag_frob_share) < 1e-9

    # isotropic: each basis vector of R^4 ten times → PR == 4 exactly
    # (covariance is a scaled identity minus a rank-1 mean term with
    # equal entries — still PR-symmetric across dims)
    iso = spark.createDataFrame(
        [(i, [1.0 if d == i % 4 else 0.0 for d in range(4)])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    r = anisotropy_stats(iso).collect()[0]
    assert r.dim == 4
    # centering removes the ones-direction: PR = d - 1 exactly
    assert abs(r.participation_ratio - 3.0) < 1e-9

    # partition invariance: 8 partitions vs 1 give identical rows
    one = anisotropy_stats(collapsed.coalesce(1)).collect()[0]
    many = anisotropy_stats(collapsed.repartition(8)).collect()[0]
    assert one == many


def test_kcore_decomposition_known_graphs(spark):
    """Coreness on graphs where peeling is computable by hand: a K4
    with a pendant path (clique nodes 3-core, path tail degrades to
    1-core), an isolated vertex (0-core), and a 6-cycle (every node
    exactly 2-core — h-index iteration must NOT stop at degree)."""
    from etl_developstoday_test_spark.operators.graph import (
        kcore_decomposition,
    )

    # K4 on {0,1,2,3} + path 3-4-5 + isolated 6
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(3, 4), (4, 5)],
        "src long, dst long",
    )
    verts = spark.createDataFrame([(i,) for i in range(7)], "node long")
    got = {
        r.node: r.coreness
        for r in kcore_decomposition(edges, verts).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 0}

    # 6-cycle: degree==2 everywhere and coreness==2 — but the h-index
    # start (degree) already equals the fixpoint, so also check a
    # cycle with one chord where estimates must strictly DECREASE:
    # pendant chain off the cycle starts at degree 2 yet ends 1-core.
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [(0, 7), (7, 8)],
        "src long, dst long",
    )
    cverts = spark.createDataFrame(
        [(i,) for i in list(range(6)) + [7, 8]], "node long"
    )
    got = {
        r.node: r.coreness
        for r in kcore_decomposition(cyc, cverts).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 7: 1, 8: 1}


def test_kcore_raises_when_rounds_exhausted(spark):
    """An un-converged estimate is NOT the coreness: a long pendant
    chain needs ~len(chain) h-index rounds to degrade to 1-core, so a
    too-small max_rounds must raise instead of silently returning the
    intermediate estimate (which a fixed-round oracle replay would
    then diverge from)."""
    import pytest as _pytest

    from etl_developstoday_test_spark.operators.graph import (
        kcore_decomposition,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(13)], "node long")
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        kcore_decomposition(chain, verts, max_rounds=2)
    # and the same graph converges fine with enough rounds
    got = {
        r.node: r.coreness
        for r in kcore_decomposition(chain, verts, max_rounds=40).collect()
    }
    assert set(got.values()) == {1}


# --- logistic-regression GD trainer (operators/ml.py) ----------------------


def test_logreg_learns_separable_direction(spark):
    """On perfectly separable 1-feature data (y = [x > 0]) the trained
    weight must point the right way and classify the training set
    perfectly within a few iterations."""
    from etl_developstoday_test_spark.operators.ml import logreg_gd_train

    rows = [(float(v), 1.0 if v > 0 else 0.0) for v in range(-50, 50) if v != 0]
    df = spark.createDataFrame(rows, "x1 double, y double")
    w, eval_df = logreg_gd_train(df, ["x1"], "y", lr=0.5, iters=10)
    assert w[1] > 0  # positive slope on the separating feature
    r = eval_df.collect()[0]
    assert r["accuracy"] == 1.0
    assert r["n_rows"] == len(rows)


def test_logreg_partitioning_invariant(spark):
    """The decimal gradient accumulator makes training order-independent:
    identical weights from 1-partition and 32-partition runs."""
    from etl_developstoday_test_spark.operators.ml import logreg_gd_train

    rows = [
        (float(v % 7) - 3.0, float(v % 5) - 2.0, float(v % 2))
        for v in range(200)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    w1, _ = logreg_gd_train(df.coalesce(1), ["x1", "x2"], "y", iters=3)
    w32, _ = logreg_gd_train(df.repartition(32), ["x1", "x2"], "y", iters=3)
    assert w1 == w32  # bit-identical, not approximately equal


def test_logreg_empty_raises(spark):
    from etl_developstoday_test_spark.operators.ml import logreg_gd_train

    df = spark.createDataFrame([], "x1 double, y double")
    with pytest.raises(ValueError, match="empty"):
        logreg_gd_train(df, ["x1"], "y")


def test_kmeans_init_fallback_when_every_nth_selects_nothing(spark):
    """No vec_id divisible by init_every -> deterministic lowest-id
    fallback instead of an IndexError / empty array literal (r5
    advice)."""
    rows = [(i, [float(i), 1.0]) for i in (1, 3, 7, 9, 11)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_lloyd(df, iters=1, init_every=50)
    assert out.count() >= 1  # trains instead of crashing


def test_kmeans_par_init_separates_planted_clusters(spark):
    """k-means|| init (VERDICT r5 #8): on two well-separated planted
    groups the d²-biased oversampling must land centers in BOTH groups
    (the every-Nth init can't promise that on adversarial id layouts),
    the reduction must return exactly k centroids drawn from the
    corpus, and the whole path must be deterministic run-to-run."""
    rows = []
    for i in range(12):
        rows.append((i, [1.0, 0.001 * i, 0.0]))  # group A around x-axis
        rows.append((100 + i, [0.0, 0.001 * i, 1.0]))  # group B, z-axis
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    from etl_developstoday_test_spark.operators.similarity import (
        _with_unit_info,
        fan_out,
        kmeans_lloyd,
        kmeans_par_init,
    )

    corpus = (
        _with_unit_info(fan_out(emb), "embedding")
        .select("vec_id", "_vec")
        .localCheckpoint(eager=True)
    )
    cents = kmeans_par_init(corpus, k=2)
    assert len(cents) == 2
    ids = {cid for cid, _ in cents}
    assert ids <= set(r[0] for r in rows)  # centers are corpus points
    assert any(cid < 100 for cid in ids) and any(cid >= 100 for cid in ids)
    # deterministic: a second run returns the identical centers
    assert cents == kmeans_par_init(corpus, k=2)

    # end-to-end through the unchanged Lloyd body: two pure clusters
    out = {
        r["centroid_id"]: (r["n_members"], r["mean_cos_sim"])
        for r in kmeans_lloyd(emb, init="kmeans_par", k=2).collect()
    }
    assert sorted(n for n, _ in out.values()) == [12, 12]
    assert all(cos > 0.99 for _, cos in out.values())


def test_connected_components_converges_and_labels_min(spark):
    """Post-refactor (fused convergence check): two chains + an isolate
    still resolve to min-label components in bounded rounds."""
    from etl_developstoday_test_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], "src long, dst long"
    )
    verts = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 10, 11, 12, 99)], "node long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_boilerplate_line_removal_flags_shared_lines(spark):
    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "totally unique text\nno chrome here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text_dedup.boilerplate_line_removal(
            docs, F.split(F.col("text"), "\n"), min_docs=2
        ).collect()
    }
    assert out[1]["n_lines"] == 3 and out[1]["n_boilerplate_lines"] == 2
    assert out[1]["chars_removed"] == len("COOKIE BANNER") + len("FOOTER")
    assert out[1]["chars_kept"] == len("real content one")
    assert out[3]["n_boilerplate_lines"] == 0
    assert out[3]["chars_removed"] == 0


def test_boilerplate_line_removal_frac_threshold(spark):
    # 10 docs share a line; min_doc_frac=0.5 → threshold 5 → flagged;
    # a line in only 2 docs stays below ceil(0.5*10)=5 → kept
    rows = [(i, "SHARED\nuniq%d" % i) for i in range(10)]
    rows[0] = (0, "SHARED\npairline")
    rows[1] = (1, "SHARED\npairline")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_dedup.boilerplate_line_removal(
        docs, F.split(F.col("text"), "\n"), min_docs=2, min_doc_frac=0.5
    )
    flagged = {
        r["doc_id"]: r["n_boilerplate_lines"] for r in out.collect()
    }
    assert all(v == 1 for v in flagged.values()), flagged


def test_span_corruption_stats_accounting(spark):
    from etl_developstoday_test_spark.operators.text_analysis import (
        span_corruption_stats,
    )

    docs = spark.createDataFrame(
        [(7, " ".join("tok%d" % i for i in range(10)))],
        "doc_id long, text string",
    )
    r = span_corruption_stats(docs, span_len=3, noise_pct=100).collect()[0]
    # noise 100%: every span masked; 10 tokens → spans of 3,3,3,1
    assert r["n_tokens"] == 10
    assert r["n_spans_masked"] == 4
    assert r["n_masked_tokens"] == 10
    assert r["n_input_tokens"] == 4  # only sentinels remain
    assert r["n_target_tokens"] == 10 + 4 + 1
    r0 = span_corruption_stats(docs, span_len=3, noise_pct=0).collect()[0]
    assert r0["n_spans_masked"] == 0 and r0["n_input_tokens"] == 10


def test_quality_epoch_schedule_tiles_and_budget(spark):
    from etl_developstoday_test_spark.operators.sampling import (
        quality_epoch_schedule,
    )

    docs = spark.createDataFrame(
        [(i, float(i), 100) for i in range(8)],
        "doc_id long, score double, nt int",
    )
    out = {
        r["tile"]: r
        for r in quality_epoch_schedule(
            docs, score=F.col("score"), n_tokens=F.col("nt")
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert [out[t]["n_docs"] for t in (1, 2, 3, 4)] == [2, 2, 2, 2]
    assert [out[t]["repeat_factor"] for t in (1, 2, 3, 4)] == [0, 1, 2, 4]
    assert out[4]["n_tokens_per_epoch"] == 800
    assert out[1]["n_tokens_per_epoch"] == 0


@pytest.mark.parametrize(
    ("raw", "canon"),
    [
        ("https://www.Ex.COM/a/b/", "ex.com/a/b"),
        ("http://ex.com/a?utm_source=x&id=3&sessionid=abc", "ex.com/a?id=3"),
        ("https://ex.com/a?utm_campaign=c#frag", "ex.com/a"),
        ("ex.com/a/?id=1&ref=tw", "ex.com/a?id=1"),
        ("ex.com/?utm_medium=m", "ex.com"),
        ("ex.com/p?id=2", "ex.com/p?id=2"),
        # names that merely END in a tracking name must NOT be eaten
        ("ex.com/p?href=x&id=1", "ex.com/p?href=x&id=1"),
        ("ex.com/p?xref=7&utm_a=1", "ex.com/p?xref=7"),
        ("ex.com/p?xutm_a=1&id=2", "ex.com/p?xutm_a=1&id=2"),
        ("ex.com/p?utm_a=1&utm_b=2&id=3", "ex.com/p?id=3"),
        ("ex.com/p?utm_a=1&utm_b=2", "ex.com/p"),
        ("ex.com/p?ref=x&id=1", "ex.com/p?id=1"),
    ],
)
def test_canonicalize_url_cases(spark, raw, canon):
    from etl_developstoday_test_spark.functions import canonicalize_url

    got = (
        spark.range(1)
        .select(canonicalize_url(F.lit(raw)).alias("c"))
        .collect()[0]["c"]
    )
    assert got == canon, (raw, got, canon)


# --- staged round-8 operators (drift / blocklist) --------------------------


def test_blocklist_hits_counts_and_flags(spark):
    from etl_developstoday_test_spark.operators.text_analysis import (
        blocklist_hits,
    )

    docs = spark.createDataFrame(
        [
            (1, "buy cheap pills now cheap pills"),
            (2, "a perfectly clean document"),
            (3, "spam and gamble words gamble"),
        ],
        "doc_id long, text string",
    )
    bl = {"pharma": ["pills", "cheap"], "gambling": ["gamble", "casino"]}
    out = {
        r["doc_id"]: r
        for r in blocklist_hits(docs, bl, max_hits=1).collect()
    }
    assert out[1]["pharma_hits"] == 4 and out[1]["gambling_hits"] == 0
    assert out[1]["n_hits"] == 4 and out[1]["blocked"]
    assert out[2]["n_hits"] == 0 and not out[2]["blocked"]
    assert out[3]["gambling_hits"] == 2 and out[3]["blocked"]


def test_cusum_matches_sequential_reference(spark):
    from etl_developstoday_test_spark.operators.drift import (
        cusum_changepoints,
    )

    # mean shifts from ~10 to ~14 at i=10
    vals = [10.0, 9.0, 11.0, 10.0, 9.5, 10.5, 10.0, 11.0, 9.0, 10.0] + [
        14.0, 13.5, 14.5, 15.0, 13.0, 14.0
    ]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp int, i int, value double")
    target, slack, threshold = 10.0, 0.5, 5.0
    # sequential reference
    s, alarms = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - target - slack))
        if s > threshold:
            alarms[i] = s
    got = {
        r["ord"]: r["cusum"]
        for r in cusum_changepoints(
            df, "value", "i", "grp", target, slack, threshold
        ).collect()
    }
    assert got.keys() == alarms.keys()
    for i in got:
        assert abs(got[i] - alarms[i]) < 1e-9
    assert min(got) >= 10  # no alarm before the true shift


def test_psi_drift_detects_shift_and_stability(spark):
    from etl_developstoday_test_spark.operators.drift import psi_drift

    base = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], "v double"
    )
    same = spark.createDataFrame(
        [(float((i * 7) % 100),) for i in range(1000)], "v double"
    )
    shifted = spark.createDataFrame(
        [(float(50 + (i % 50)),) for i in range(1000)], "v double"
    )
    stable = psi_drift(base, same, "v", lo=0.0, hi=100.0).collect()[0]
    moved = psi_drift(base, shifted, "v", lo=0.0, hi=100.0).collect()[0]
    assert stable["psi"] < 0.01, stable["psi"]
    assert moved["psi"] > 0.25, moved["psi"]
    assert stable["n_base"] == 1000 and stable["n_current"] == 1000
    # outside-range values clamp into edge bins, never dropped
    clamped = spark.createDataFrame(
        [(-5.0,), (500.0,)], "v double"
    )
    r = psi_drift(base, clamped, "v", lo=0.0, hi=100.0).collect()[0]
    assert r["n_current"] == 2


def test_psi_drift_rejects_degenerate_range(spark):
    import pytest

    from etl_developstoday_test_spark.operators.drift import psi_drift

    base = spark.createDataFrame([(1.0,)], "v double")
    # hi == lo would make every row land in bin 0 on both sides and
    # silently report PSI 0 (stable) for ANY drift
    with pytest.raises(ValueError, match="hi must be > lo"):
        psi_drift(base, base, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="hi must be > lo"):
        psi_drift(base, base, "v", lo=5.0, hi=1.0)
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(base, base, "v", lo=0.0, hi=1.0, n_bins=0)


def test_psi_drift_series_excludes_nulls_and_reports_them(spark):
    """NULL values must be EXCLUDED from the binned distribution and
    surfaced per-period as n_nulls — not silently clamped into bin 0
    (which would both hide an upstream parse breakage and corrupt the
    PSI). A period whose values are ALL NULL has no distribution and
    is absent from the series."""
    from etl_developstoday_test_spark.operators.drift import (
        psi_drift_series,
    )

    rows = (
        # period 1: clean uniform baseline
        [(1, float(i % 10) * 10.0) for i in range(100)]
        # period 2: same distribution + 30 NULLs — PSI must stay ~0
        + [(2, float(i % 10) * 10.0) for i in range(100)]
        + [(2, None)] * 30
        # period 3: all NULL — no distribution, absent from the series
        + [(3, None)] * 5
    )
    df = spark.createDataFrame(rows, "p int, v double")
    out = {
        r["period"]: r
        for r in psi_drift_series(
            df, "v", "p", n_bins=10, lo=0.0, hi=100.0
        ).collect()
    }
    assert sorted(out) == [1, 2]  # period 3 has no non-NULL rows
    assert out[1]["n_nulls"] == 0 and out[1]["psi"] == 0.0
    assert out[2]["n_nulls"] == 30
    assert out[2]["n_rows"] == 100  # NULLs not counted as rows
    # identical non-NULL distribution: the NULLs must not move the PSI
    assert out[2]["psi"] == 0.0 and out[2]["drift_level"] == "stable"


# --- staged round-8 operators (ml / bigram LM) ------------------------------


def test_naive_bayes_separates_disjoint_vocabularies(spark):
    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
    )

    # two labels with disjoint vocabularies; doc_id % 5 == 0 is the
    # held-out split, so docs 0,5 (label a) and 10,15 (label b) are test
    rows = []
    for i in range(10):
        rows.append((i, "apple banana cherry apple", "a"))
    for i in range(10, 20):
        rows.append((i, "xylo zonk wumpus zonk", "b"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = {
        r["label"]: r
        for r in naive_bayes_quality(docs, test_mod=5).collect()
    }
    assert out["a"]["n_docs"] == 2 and out["a"]["n_correct"] == 2
    assert out["b"]["n_docs"] == 2 and out["b"]["n_correct"] == 2


def test_naive_bayes_unseen_label_scores_zero_correct(spark):
    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
    )

    # label 'c' appears ONLY in the test split (doc_id 0): no model, no
    # prior -> no candidates -> left join leaves cand null -> incorrect
    rows = [(0, "apple banana", "c")] + [
        (i, "apple banana", "a") for i in range(1, 8)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = {
        r["label"]: r
        for r in naive_bayes_quality(docs, test_mod=5).collect()
    }
    assert out["c"]["n_docs"] == 1 and out["c"]["n_correct"] == 0
    assert out["a"]["n_docs"] == 1 and out["a"]["n_correct"] == 1


def test_naive_bayes_laplace_default_penalizes_sparse_labels(spark):
    """A candidate label with NO observation of a test token must pay
    the Laplace penalty ln(α/(tot+α·V)) for it — not silently skip the
    term (which would advantage labels with less token overlap)."""
    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
    )

    # label 'a' trains on both tokens; label 'b' never sees 'apple'.
    # Test doc 0 (truth 'a') is 'apple apple banana': under full-grid
    # scoring, 'b' pays two Laplace defaults for 'apple' and loses;
    # under skip-semantics 'b' would collect only its strong 'banana'
    # term and could win.
    rows = [
        (0, "apple apple banana", "a"),
        (1, "apple banana", "a"),
        (2, "apple banana", "a"),
        (3, "banana banana banana banana", "b"),
        (4, "banana banana banana banana", "b"),
        (6, "banana banana banana banana", "b"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = {
        r["label"]: r
        for r in naive_bayes_quality(docs, test_mod=5).collect()
    }
    assert out["a"]["n_docs"] == 1 and out["a"]["n_correct"] == 1


def test_naive_bayes_shuffle_join_path_matches_broadcast(spark):
    """broadcast_model=False (the web-scale-vocabulary escape hatch:
    shuffle equi-join on the token) returns row-identical results."""
    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
    )

    rows = [
        (i, t, l)
        for i, (t, l) in enumerate(
            [
                ("apple banana cherry", "a"),
                ("apple apple banana", "a"),
                ("xylo zonk banana", "b"),
                ("xylo xylo zonk", "b"),
                ("apple zonk", "a"),
                ("banana xylo", "b"),
                ("cherry cherry zonk", "a"),
                ("zonk zonk zonk", "b"),
            ]
        )
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    bc = sorted(
        tuple(r) for r in naive_bayes_quality(docs, test_mod=4).collect()
    )
    sj = sorted(
        tuple(r)
        for r in naive_bayes_quality(
            docs, test_mod=4, broadcast_model=False
        ).collect()
    )
    assert bc == sj


def test_bpe_encode_shuffle_join_path_matches_broadcast(spark):
    """broadcast_model=False on the BPE encoder and the fertility
    rollup (the open-vocabulary escape hatch: the trained segmentation
    table shuffle-equi-joins on the word instead of broadcasting)
    returns row-identical results — the knob the NB classifier already
    carries, now on both vocabulary-join consumers of the trainer."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_encode_stats,
        bpe_fertility_by_lang,
    )

    rows = [
        (1, "low lower lowest", "en"),
        (2, "newer newest new", "en"),
        (3, "low new lower newer", "de"),
        (4, "wide wider widest low", "de"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    for fn in (bpe_encode_stats, bpe_fertility_by_lang):
        bc = sorted(tuple(r) for r in fn(docs, rounds=3).collect())
        sj = sorted(
            tuple(r)
            for r in fn(docs, rounds=3, broadcast_model=False).collect()
        )
        assert bc == sj and bc


def test_vocab_model_shuffle_join_path_matches_broadcast(spark):
    """broadcast_model=False on the two remaining vocabulary-sized
    model joins (token_rarity's df table, the unigram LM's frequency
    table — the r9 verdict's term-table seam) returns row-identical
    results: the hint is plan-only, the open-vocabulary hatch is
    value-neutral."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        token_rarity,
        unigram_logprob_deciles,
    )

    rows = [
        (1, "apple banana cherry apple"),
        (2, "apple apple apple"),
        (3, "xylo zonk quux"),
        (4, "banana cherry banana cherry"),
        (5, "apple xylo banana zonk cherry quux"),
        (6, "zonk zonk"),
        (7, "cherry"),
        (8, "quux apple quux"),
        (9, "banana"),
        (10, "apple banana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (token_rarity, unigram_logprob_deciles):
        bc = sorted(tuple(r) for r in fn(docs).collect())
        sj = sorted(
            tuple(r) for r in fn(docs, broadcast_model=False).collect()
        )
        assert bc == sj and bc


def test_graph_degree_shuffle_join_path_matches_broadcast(spark):
    """broadcast_degrees=False on the triangle family (the r9
    verdict's vertex-degree-broadcast seam: a web-scale graph's
    one-row-per-vertex degree table cannot broadcast) returns
    row-identical results on an irregular fixture — the hint is
    plan-only, the co-shuffle hatch is value-neutral."""
    import itertools

    from etl_developstoday_test_spark.operators.graph import (
        local_clustering_coefficient,
        triangle_count,
    )

    e = list(itertools.combinations(range(4), 2))
    e += list(itertools.combinations(range(10, 14), 2))
    e += [(3, 10), (13, 20), (20, 21), (30, 31), (31, 32), (30, 32)]
    edges = spark.createDataFrame(e, "ua long, ub long")
    for fn in (triangle_count, local_clustering_coefficient):
        bc = [tuple(r) for r in fn(edges).collect()]
        sj = [tuple(r) for r in fn(edges, broadcast_degrees=False).collect()]
        assert bc == sj and bc


def test_bigram_lm_ranks_scrambled_text_lowest(spark):
    from etl_developstoday_test_spark.operators.text_analysis import (
        bigram_lm_bottomk,
    )

    # 9 docs share the same fluent sentence (high bigram probability);
    # doc 99 uses the SAME tokens in a never-seen order — a unigram
    # model cannot tell them apart, the bigram model must
    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    rows = [(i, fluent) for i in range(9)] + [(99, scrambled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lm_bottomk(docs, k=3).collect()
    assert out[0]["doc_id"] == 99
    assert out[0]["mean_logprob"] < out[1]["mean_logprob"]
    # one-token docs have no bigrams and are out of scope
    docs2 = docs.union(
        spark.createDataFrame([(100, "single")], "doc_id long, text string")
    )
    ids = {r["doc_id"] for r in bigram_lm_bottomk(docs2, k=20).collect()}
    assert 100 not in ids


def test_best_stump_split_matches_bruteforce(spark):
    from etl_developstoday_test_spark.operators.ml import best_stump_split

    # y depends on x1 with a clean step at x1 <= 3; x2 is noise
    rows = [
        (1.0, 9.0, 10.0), (2.0, 1.0, 11.0), (3.0, 5.0, 9.0),
        (4.0, 2.0, 30.0), (5.0, 8.0, 31.0), (6.0, 3.0, 29.0),
        (2.5, 7.0, 10.5), (4.5, 4.0, 30.5),
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = best_stump_split(df, ["x1", "x2"], "y").collect()[0]

    # brute-force reference over every (feature, observed threshold)
    best = None
    data = rows
    for fi, fname in ((0, "x1"), (1, "x2")):
        vals = sorted({r[fi] for r in data})
        for v in vals[:-1]:
            left = [r[2] for r in data if r[fi] <= v]
            right = [r[2] for r in data if r[fi] > v]
            gain = (sum(left) ** 2) / len(left) + (sum(right) ** 2) / len(
                right
            )
            key = (-gain, fname, v)
            if best is None or key < best:
                best = key
    assert got["feature"] == best[1] and got["threshold"] == best[2]
    assert abs(got["gain"] - (-best[0])) < 1e-6
    assert got["n_left"] + got["n_right"] == len(rows)


def test_label_propagation_bridged_cliques(spark):
    from etl_developstoday_test_spark.operators.graph import (
        label_propagation_communities,
    )
    import itertools

    # two 4-cliques joined by one bridge edge: LPA must split them into
    # exactly the two cliques; modularity checked against a brute-force
    # python replay of the same deterministic update rule
    e = list(itertools.combinations(range(4), 2))
    e += list(itertools.combinations(range(10, 14), 2))
    e += [(3, 10)]
    edges = spark.createDataFrame(e, "src long, dst long")
    verts = spark.createDataFrame(
        [(i,) for i in list(range(4)) + list(range(10, 14))], "node long"
    )
    out = sorted(
        tuple(r)
        for r in label_propagation_communities(edges, verts, rounds=5).collect()
    )
    assert [r[:4] for r in out] == [(0, 4, 6, 13), (10, 4, 6, 13)]
    # Q = Σ_c (4m·e_c − d_c²) / 4m² with m=13, e_c=6, d_c=13 per clique
    expected_q = (2 * (4 * 13 * 6 - 13 * 13)) / (4.0 * 13 * 13)
    assert out[0][4] == expected_q and out[1][4] == expected_q


def test_label_propagation_tiebreak_is_min_label(spark):
    from etl_developstoday_test_spark.operators.graph import (
        label_propagation_communities,
    )

    # node 2 sees neighbor labels {1, 3} with equal counts after round
    # 0 -> must adopt 1 (smallest among most frequent), never 3
    edges = spark.createDataFrame(
        [(1, 2), (3, 2)], "src long, dst long"
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    out = label_propagation_communities(edges, verts, rounds=1, top_k=10)
    rows = sorted(tuple(r) for r in out.collect())
    # after one round: 1 keeps... 1's only neighbor is 2 (label 2) -> 1
    # adopts 2; 3 adopts 2; 2 adopts min(1,3)=1. Communities by label.
    labels = {}
    for community, n_nodes, *_ in rows:
        labels[community] = n_nodes
    assert labels == {1: 1, 2: 2}


def test_degree_assortativity_known_graphs(spark):
    from etl_developstoday_test_spark.operators.graph import (
        degree_assortativity,
    )

    # star S3: hubs-to-leaves only -> exactly -1
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 3 and r["assortativity"] == -1.0
    # path P4 (degrees 1,2,2,1): textbook r = -0.5
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    r = degree_assortativity(path).collect()[0]
    assert r["n_edges"] == 3 and r["assortativity"] == -0.5


def test_kcore_converging_inside_final_cycle_does_not_raise(spark):
    """Regression (r7 review): convergence is only observable at cycle
    granularity, so a fixpoint reached INSIDE the last unrolled cycle
    used to raise 'no fixpoint within max_rounds' despite being
    genuinely converged. A 14-node path needs ~7 h-index sub-steps
    (changes happen all the way), so with max_rounds=8 (one cycle) the
    cycle-boundary check alone sees est8 != est0 — only the exact
    final fixpoint check accepts it."""
    from etl_developstoday_test_spark.operators.graph import (
        kcore_decomposition,
    )

    n = 14
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(n)], "node long")
    out = {
        r["node"]: r["coreness"]
        for r in kcore_decomposition(chain, verts, max_rounds=8).collect()
    }
    assert out == {i: 1 for i in range(n)}


def test_assortativity_null_on_regular_graph(spark):
    from etl_developstoday_test_spark.operators.graph import (
        degree_assortativity,
    )
    import itertools

    # 4-clique: zero degree variance -> coefficient undefined -> NULL
    # (NOT NaN: DuckDB's double 0/0 is NULL, and the twin must match)
    clique = spark.createDataFrame(
        list(itertools.combinations(range(4), 2)), "src long, dst long"
    )
    r = degree_assortativity(clique).collect()[0]
    assert r["n_edges"] == 6 and r["assortativity"] is None


def test_lpa_isolated_vertices_become_singletons(spark):
    from etl_developstoday_test_spark.operators.graph import (
        label_propagation_communities,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (99,)], "node long")
    rows = {
        r["community"]: tuple(r)
        for r in label_propagation_communities(
            edges, verts, rounds=2
        ).collect()
    }
    # isolated 99 keeps its own label: singleton, degree 0, 0 edges
    assert rows[99][1:4] == (1, 0, 0)
    # the pair 2-cycles under synchronous LPA (1<->2 swap labels every
    # round), so after 2 rounds each node holds its own label again:
    # exactly three singleton communities
    assert set(rows) == {1, 2, 99}


def test_bottomk_quantile_rollup_bounds_and_mergeability(spark):
    """The sketch median's rank fraction stays within the bound at
    every level, the estimate is an actual data value, and the total
    level's sketch equals the bottom-k of the FULL data (mergeability:
    re-truncating merged child sketches loses nothing)."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long
    from etl_developstoday_test_spark.operators.sketches import (
        bottomk_quantile_rollup,
    )

    rows = [
        (i, 2000 + (i // 2000), 1 + (i % 12), float((i * 37) % 1000))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, yy int, mm int, val double")
    out = bottomk_quantile_rollup(
        df, "val", F.col("id").cast("string"), "yy", "mm", k=128
    ).collect()
    vals = {v for _, _, _, v in rows}
    assert len(out) == 24 + 2 + 1  # months + years + total
    for r in out:
        assert r["within_bound"], r
        assert r["est_p50"] in vals
    # mergeability: total-level estimate == estimate from the bottom-k
    # of the raw data directly (union+retruncate == global bottom-k)
    hashed = df.select(
        "val", md5_long(F.col("id").cast("string")).alias("h")
    ).orderBy("h").limit(128).orderBy("val", "h").collect()
    k_eff = len(hashed)
    direct = hashed[(k_eff + 1) // 2 - 1]["val"]
    total = [r for r in out if r["level"] == "total"][0]
    assert total["est_p50"] == direct


# --- staged round-9 operators ------------------------------------------------


def test_kneser_ney_penalizes_context_locked_tokens(spark):
    """The continuation-count backoff is what distinguishes KN from
    Laplace: a token frequent ONLY after one fixed context ("francisco"
    after "san") must carry a LOWER continuation weight than an
    equally-frequent token seen after many contexts — so a document
    pairing the context-locked token with a NOVEL context scores lower
    under KN even when raw unigram frequencies are identical."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        kneser_ney_bigram_bottomk,
    )

    rows = [
        # 'francisco' always follows 'san'; 'deal' follows many contexts
        (i, "san francisco is a big city with a big deal") for i in range(4)
    ] + [
        (10, "new deal old deal good deal bad deal"),
        # both docs pair a NOVEL context with the probe token — one
        # probes the context-locked word, one the promiscuous word
        (20, "the francisco"),
        (21, "the deal"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["mean_logprob"]
        for r in kneser_ney_bigram_bottomk(docs, k=20).collect()
    }
    assert out[20] < out[21], (out[20], out[21])


def test_nb_margin_calibration_bins_and_counts(spark):
    """Margin bins are exact integer cuts of the nanos score gap; the
    per-bin doc counts partition the predicted test split, and each
    accuracy equals n_correct/n_docs."""
    from etl_developstoday_test_spark.operators.ml import (
        nb_margin_calibration,
        naive_bayes_quality,
    )

    rows = []
    for i in range(20):
        rows.append((i, "apple banana cherry apple", "a"))
    for i in range(20, 40):
        rows.append((i, "xylo zonk wumpus zonk", "b"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cal = nb_margin_calibration(docs, test_mod=5).collect()
    # disjoint vocabularies: every margin is large and every doc correct
    assert all(r["accuracy"] == 1.0 for r in cal)
    assert sum(r["n_docs"] for r in cal) == 8  # the test split
    for r in cal:
        assert 0 <= r["margin_bin"] <= 9
        assert abs(r["accuracy"] - r["n_correct"] / r["n_docs"]) < 1e-9
    # sanity: the accuracy operator agrees on the same corpus
    acc = {r["label"]: r for r in naive_bayes_quality(docs, test_mod=5).collect()}
    assert sum(a["n_correct"] for a in acc.values()) == 8


def test_bpe_fertility_consistency_with_encode_stats(spark):
    """Per-language fertility must be the lang-rollup of the per-doc
    encoder output (same trained merges, same join), and >= 1 only
    when merges can't cover every word — single-char vocabularies
    merge fully."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_encode_stats,
        bpe_fertility_by_lang,
    )

    rows = [
        (0, "aa ab aa ab", "x"),
        (1, "aa aa ba", "x"),
        (2, "cc cd cc", "y"),
        (3, "dd dd", "y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    per_doc = bpe_encode_stats(docs, rounds=3).collect()
    by_lang = {}
    lang_of = {i: l for i, _, l in rows}
    for r in per_doc:
        l = lang_of[r["doc_id"]]
        d = by_lang.setdefault(l, [0, 0, 0])
        d[0] += 1
        d[1] += r["n_ws_tokens"]
        d[2] += r["n_bpe_tokens"]
    got = {
        r["lang"]: (r["n_docs"], r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in bpe_fertility_by_lang(docs, rounds=3).collect()
    }
    assert got == {l: tuple(v) for l, v in by_lang.items()}


def test_packing_efficiency_matches_python_reference(spark):
    """The audit's sequence/padding counts equal a direct python fold
    over the same shard assignment and budget."""
    from etl_developstoday_test_spark.functions import md5_long
    from etl_developstoday_test_spark.operators.sampling import (
        packing_efficiency_audit,
    )
    from pyspark.sql import functions as F

    rows = [(i, " ".join("t" for _ in range((i * 7) % 40 + 1))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    B, S = 16, 4
    shards = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", (md5_long(F.col("doc_id").cast("string")) % S).alias("s")
        ).collect()
    }
    per_shard_tok = {}
    useq = 0
    total = 0
    for i, text in rows:
        t = len(text.split())
        total += t
        useq += -(-t // B)
        per_shard_tok[shards[i]] = per_shard_tok.get(shards[i], 0) + t
    pseq = sum(-(-tok // B) for tok in per_shard_tok.values())
    r = packing_efficiency_audit(docs, budget=B, n_shards=S).collect()[0]
    assert (r["n_docs"], r["total_tokens"]) == (60, total)
    assert (r["unpacked_seqs"], r["packed_seqs"]) == (useq, pseq)
    assert r["unpacked_pad_tokens"] == useq * B - total
    assert r["packed_pad_tokens"] == pseq * B - total


def test_nb_confusion_diagonal_equals_quality_correct_counts(spark):
    """The confusion matrix's diagonal must equal naive_bayes_quality's
    per-label n_correct on the same corpus (same model, same argmax),
    and each truth row's predicted total can only be <= the quality
    row's n_docs (unpredicted docs have no confusion cell)."""
    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
        nb_confusion_matrix,
    )

    rows = [
        (i, t, l)
        for i, (t, l) in enumerate(
            [
                ("apple banana cherry", "a"),
                ("apple apple banana", "a"),
                ("xylo zonk banana", "b"),
                ("xylo xylo zonk", "b"),
                ("apple zonk apple", "a"),
                ("banana xylo zonk", "b"),
                ("cherry apple banana", "a"),
                ("zonk zonk xylo", "b"),
                ("apple cherry", "a"),
                ("xylo zonk", "b"),
            ]
        )
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    quality = {
        r["label"]: r for r in naive_bayes_quality(docs, test_mod=3).collect()
    }
    cm = nb_confusion_matrix(docs, test_mod=3).collect()
    diag = {r["truth"]: r["n_docs"] for r in cm if r["truth"] == r["predicted"]}
    row_tot = {}
    for r in cm:
        row_tot[r["truth"]] = row_tot.get(r["truth"], 0) + r["n_docs"]
    for label, q in quality.items():
        assert diag.get(label, 0) == q["n_correct"], label
        assert row_tot.get(label, 0) <= q["n_docs"], label
    # row_frac sums to 1 within each truth row
    from collections import defaultdict

    fr = defaultdict(float)
    for r in cm:
        fr[r["truth"]] += r["row_frac"]
    assert all(abs(v - 1.0) < 1e-4 for v in fr.values())


def test_snapshot_delta_classifies_all_four_cdc_classes(spark):
    """Hand-built snapshots: one added, one removed, one changed, two
    unchanged, split across two sources; token_delta counts the moved
    whitespace tokens exactly."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        snapshot_delta,
    )

    old = spark.createDataFrame(
        [
            (1, "s1", "alpha beta"),          # unchanged
            (2, "s1", "gamma delta epsilon"),  # changed -> 2 tokens
            (3, "s2", "zeta eta"),             # removed (-2 tokens)
            (5, "s2", "iota kappa"),           # unchanged
        ],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "s1", "alpha beta"),
            (2, "s1", "theta mu"),             # changed (3 -> 2 tokens)
            (4, "s2", "nu xi omicron pi"),     # added (+4 tokens)
            (5, "s2", "iota kappa"),
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in snapshot_delta(old, new).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n_added"], s1["n_removed"], s1["n_changed"], s1["n_unchanged"]) == (0, 0, 1, 1)
    assert s1["token_delta"] == -1  # 3-token doc replaced by 2 tokens
    assert (s2["n_added"], s2["n_removed"], s2["n_changed"], s2["n_unchanged"]) == (1, 1, 0, 1)
    assert s2["token_delta"] == 2  # +4 added, -2 removed


def test_waterfill_execute_certificate_raises_on_short_mass(spark):
    """A source whose surviving hash mass cannot cover its allocation
    must RAISE (the exactness certificate), not silently under-fill:
    doc ids are chosen so every hash falls ABOVE the oversample=4
    pre-filter bound for a 2-doc source with a small allocation."""
    import hashlib

    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        waterfill_execute,
    )

    hs = 1 << 60

    def h(i):
        return int(hashlib.md5(f"wfx#{i}".encode()).hexdigest()[:15], 16)

    # allocation 100 of avail 2000 -> frac = 2000 div 400 = 5,
    # bound = H div 5; find two ids hashing above it
    bound = hs // 5
    ids = [i for i in range(1000) if h(i) >= bound][:2]
    assert len(ids) == 2
    dt = spark.createDataFrame(
        [("s", ids[0], 1000), ("s", ids[1], 1000)],
        "source string, doc_id long, n_tokens long",
    )
    alloc = spark.createDataFrame(
        [("s", 2000, 1, 100, False)],
        "source string, avail_tokens long, weight long, "
        "allocated_tokens long, saturated boolean",
    )
    with pytest.raises(ValueError, match="under-filling"):
        waterfill_execute(dt, alloc)


def _md5l(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bottomk_quantile_leaf_prefilter_active_and_exact(spark):
    """The per-month KMV-style leaf pre-filter ENGAGES on months larger
    than oversample*k (the parity suites run at scales where frac = 1,
    so this locks the filtered path): with the filter provably active,
    every month estimate must still equal the unfiltered bottom-k
    reference — the certificate guarantees the k smallest hashes all
    survive the bound."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.sketches import (
        bottomk_quantile_rollup,
    )

    k = 16
    rows = [
        (i, 2001, 1 + (i % 4), float((i * 131) % 997))
        for i in range(2400)  # 600 rows/month -> frac = 600 div 64 = 9
    ]
    df = spark.createDataFrame(rows, "id long, yy int, mm int, val double")
    out = {
        r["grp"]: r
        for r in bottomk_quantile_rollup(
            df, "val", F.col("id").cast("string"), "yy", "mm", k=k
        ).collect()
        if r["level"] == "month"
    }
    hs = 1 << 60
    by_month: dict = {}
    for i, yy, mm, v in rows:
        by_month.setdefault(mm, []).append((v, _md5l(str(i))))
    for mm, vh in by_month.items():
        frac = max(1, len(vh) // (4 * k))
        assert frac > 1  # the filter is genuinely active
        sketch = sorted(vh, key=lambda p: p[1])[:k]
        # certificate precondition holds: all k minima under the bound
        assert all(h < hs // frac for _, h in sketch)
        ref = sorted(sketch)[(k + 1) // 2 - 1][0]
        assert out[f"2001-{mm:02d}"]["est_p50"] == ref, mm


def test_bottomk_quantile_prefilter_certificate_raises(spark):
    """Adversarial hash distribution: every row of a month hashes ABOVE
    the pre-filter bound, so fewer than min(k, n) rows survive — the
    operator must RAISE (exactness certificate), not silently sketch
    from a short sample."""
    import pytest
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.sketches import (
        bottomk_quantile_rollup,
    )

    k, n = 16, 640  # oversample=1 -> frac = 640 div 16 = 40
    hs = 1 << 60
    bound = hs // 40
    ids = [i for i in range(20000) if _md5l(str(i)) >= bound][:n]
    assert len(ids) == n
    rows = [(i, 2001, 1, float(i % 100)) for i in ids]
    df = spark.createDataFrame(rows, "id long, yy int, mm int, val double")
    with pytest.raises(ValueError, match="oversample"):
        bottomk_quantile_rollup(
            df, "val", F.col("id").cast("string"), "yy", "mm",
            k=k, oversample=1,
        )


def test_kn_heldout_oov_doc_scores_exactly_the_laplace_floor(spark):
    """A held-out document made ENTIRELY of never-seen words must score
    exactly ln(1/(T + V2 + 1)) per bigram (unseen context -> pure
    Laplace-floored continuation, npred = 0), and any held-out doc of
    training-seen text must score strictly higher."""
    import math

    from etl_developstoday_test_spark.operators.text_analysis import (
        kn_heldout_bottomk,
    )

    train_text = "the cat sat on the mat"
    rows = [(i, train_text) for i in range(1, 9) if i % 5 != 0]
    rows += [(5, "qqq www eee rrr"), (10, train_text)]  # held-out docs
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in kn_heldout_bottomk(docs, k=20).collect()
    }
    # train bigram types from the repeated sentence: the-cat, cat-sat,
    # sat-on, on-the, the-mat -> T = 5; successors {cat,sat,on,the,mat}
    # -> V2 = 5; floor = 1/11
    floor = round(round(math.log(1.0 / 11.0) * 1e9) / 1e9 / 1.0, 6)
    oov = out[5]
    assert oov["n_bigrams"] == 3
    assert oov["mean_logprob"] == round(
        round(math.log(1.0 / 11.0) * 1e9) * 3 / 1e9 / 3, 6
    ) == floor
    assert out[10]["mean_logprob"] > oov["mean_logprob"]


def test_psi_drift_series_levels_and_baseline_zero(spark):
    """Synthetic three-period series: the baseline scores exactly 0.0,
    an identical period scores 0.0/stable, and a period whose mass
    moved to the opposite edge bin scores major."""
    from etl_developstoday_test_spark.operators.drift import (
        psi_drift_series,
    )

    rows = [(1, float(v % 10)) for v in range(200)]          # baseline
    rows += [(2, float(v % 10)) for v in range(200)]          # identical
    rows += [(3, 90.0 + float(v % 10)) for v in range(200)]   # shifted
    df = spark.createDataFrame(rows, "p int, value double")
    out = {
        r["period"]: r
        for r in psi_drift_series(
            df, "value", "p", n_bins=10, lo=0.0, hi=100.0
        ).collect()
    }
    assert out[1]["psi"] == 0.0 and out[1]["drift_level"] == "stable"
    assert out[2]["psi"] == 0.0 and out[2]["drift_level"] == "stable"
    assert out[3]["drift_level"] == "major" and out[3]["psi"] > 0.25
    assert all(r["n_rows"] == 200 for r in out.values())


# --- staged round-11 operators ----------------------------------------------


def test_ks_two_sample_identical_and_disjoint(spark):
    """KS = 0 on identical distributions, 1 on disjoint supports, and
    the significance call follows the 1.358 critical line."""
    from etl_developstoday_test_spark.operators.drift import ks_two_sample

    a = spark.createDataFrame(
        [(float(i % 50),) for i in range(500)], "v double"
    )
    same = spark.createDataFrame(
        [(float((i * 7) % 50),) for i in range(500)], "v double"
    )
    far = spark.createDataFrame(
        [(float(100 + i % 50),) for i in range(500)], "v double"
    )
    r0 = ks_two_sample(a, same, "v").collect()[0]
    assert r0["ks_stat"] == 0.0 and not r0["drifted"]
    r1 = ks_two_sample(a, far, "v").collect()[0]
    assert r1["ks_stat"] == 1.0 and r1["drifted"]
    # NULLs are excluded from both sides, not binned
    with_null = spark.createDataFrame(
        [(float(i % 50),) for i in range(500)] + [(None,)] * 20, "v double"
    )
    r2 = ks_two_sample(a, with_null, "v").collect()[0]
    assert r2["n_current"] == 500 and r2["ks_stat"] == 0.0
    # NaN is excluded like NULL (non-ANSI cast would otherwise silently
    # bin it at vq=0), and an empty-after-exclusion side fails loudly
    # instead of returning a NULL-statistic row
    with_nan = spark.createDataFrame(
        [(float(i % 50),) for i in range(500)] + [(float("nan"),)] * 20,
        "v double",
    )
    r3 = ks_two_sample(a, with_nan, "v").collect()[0]
    assert r3["n_current"] == 500 and r3["ks_stat"] == 0.0
    import pytest

    only_nonvalues = spark.createDataFrame(
        [(None,), (float("nan"),)], "v double"
    )
    with pytest.raises(ValueError, match="empty side"):
        ks_two_sample(a, only_nonvalues, "v")
    with pytest.raises(ValueError, match="quantum"):
        ks_two_sample(a, same, "v", quantum=0)


def test_zipf_slope_recovers_power_law(spark):
    """On a constructed exact power law (freq_r = floor(10000/r)) the
    OLS fit must recover slope ~ -1 with a near-perfect fit — the
    behavior the flat synthetic corpus can't exercise."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        zipf_slope,
    )

    rows = []
    doc_id = 0
    for r in range(1, 51):
        freq = 10000 // r
        # one doc per token repeating it freq times keeps tokenization
        # trivial and the counts exact
        rows.append((doc_id, " ".join([f"tok{r:03d}"] * freq)))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = zipf_slope(docs, top_n=50).collect()[0]
    assert out["n_rows"] == 50
    assert -1.05 < out["slope"] < -0.95
    assert out["r2"] > 0.999


def test_chi2_token_label_flags_perfect_separator(spark):
    """A token present in every doc of one label and absent elsewhere
    is a perfect separator: its chi2 must equal N (the 2x2 maximum)
    and rank first; a token present in EVERY doc has a zero margin and
    scores 0.0 by convention."""
    from etl_developstoday_test_spark.operators.ml import chi2_token_label

    rows = []
    for i in range(10):
        rows.append((i, f"common leak{'A' if i < 5 else 'B'} filler{i % 3}",
                     "a" if i < 5 else "b"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_token_label(docs, top_m=10, k=30).collect()
    by = {(r["token"], r["label"]): r for r in out}
    assert by[("leakA", "a")]["chi2"] == 10.0  # == N, perfect separator
    assert by[("leakB", "b")]["chi2"] == 10.0
    assert by[("common", "a")]["chi2"] == 0.0  # df == N margin -> 0
    assert out[0]["chi2"] == 10.0  # separators rank first


def test_ngram_novelty_bounds(spark):
    """Novelty is 0 when B's grams are a subset of A's, 1 for an
    all-new source, and sources absent from B produce no row."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_novelty,
    )

    a = spark.createDataFrame(
        [
            (1, "s1", "the quick brown fox jumps"),
            (2, "s2", "pack my box with five dozen jugs"),
        ],
        "doc_id long, source string, text string",
    )
    b = spark.createDataFrame(
        [
            (3, "s1", "the quick brown fox"),          # all grams seen
            (4, "s3", "entirely novel trigram content here"),  # all new
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in ngram_novelty(a, b, n=3).collect()}
    assert set(out) == {"s1", "s3"}
    assert out["s1"]["n_novel"] == 0 and out["s1"]["novelty_rate"] == 0.0
    assert out["s3"]["n_novel"] == out["s3"]["n_grams"] > 0
    assert out["s3"]["novelty_rate"] == 1.0


def test_centroid_outliers_flags_planted_mislabel(spark):
    """A vector pointing opposite its label's tight cluster must rank
    first (lowest cosine-to-centroid); in-cluster vectors score ~1."""
    from etl_developstoday_test_spark.operators.similarity import (
        centroid_outliers,
    )

    rows = (
        [(i, "a", [1.0, 0.02 * i, 0.0]) for i in range(8)]
        + [(99, "a", [-1.0, 0.0, 0.0])]  # planted: opposite direction
        + [(i, "b", [0.0, 1.0, 0.01 * i]) for i in range(200, 208)]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    out = centroid_outliers(emb, k=3).collect()
    assert out[0]["vec_id"] == 99 and out[0]["cos_to_centroid"] < 0
    assert all(r["cos_to_centroid"] > 0.9 for r in out[1:])


# --- staged round-12 operators ----------------------------------------------


def test_repetition_profile_constructed(spark):
    """A fully-alternating doc scores dup3_frac=1.0 and a known top2
    share; a no-repeat doc scores 0.0 on both; a 2-token doc has no
    3-grams and reports dup3 as 0.0 over 0 grams."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        repetition_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # 2-grams: ab,ba,ab,ba,ab -> top2 3/5
            (2, "u v w x y z"),     # all unique
            (3, "p q"),             # no 3-grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_profile(docs, k=3).collect()}
    assert rows[1]["dup3_frac"] == 1.0 and rows[1]["top2_frac"] == 0.6
    assert rows[2]["dup3_frac"] == 0.0 and rows[2]["top2_frac"] == 0.2
    assert rows[3]["n_grams3"] == 0 and rows[3]["dup3_frac"] == 0.0
    assert rows[3]["top2_frac"] == 1.0
    # worst-first ordering
    ordered = [r["doc_id"] for r in repetition_profile(docs, k=3).collect()]
    assert ordered[0] == 1


def test_pmi_collocations_constructed(spark):
    """A pair that always co-occurs scores the maximum PMI and ranks
    first; the min_count guard drops rarer pairs; min_count=0 raises."""
    import math

    import pytest

    from etl_developstoday_test_spark.operators.text_analysis import (
        pmi_collocations,
    )

    # "alpha beta" appears 6x and alpha/beta appear nowhere else;
    # filler pairs are frequent but independent-ish
    rows = [(i, "alpha beta") for i in range(6)]
    rows += [(100 + i, "x y x z y z") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_collocations(docs, min_count=5, k=3).collect()
    assert got[0]["term_x"] == "alpha" and got[0]["term_y"] == "beta"
    # exact expectation through the operator's own quantization:
    # pmi = ln(c_xy) + ln(T) - ln(c_x) - ln(c_y), each ln nano-rounded
    t_all = 6 + 5 * 10

    def lnq(v):
        return round(math.log(v) * 1e9)

    want = round((lnq(6) + lnq(t_all) - lnq(6) - lnq(6)) / 1e9, 6)
    assert abs(got[0]["pmi"] - want) < 1e-9
    assert all(r["n_pair"] >= 5 for r in got)
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(docs, min_count=0)


def test_js_divergence_bounds_and_exclusions(spark):
    """JS = 0 on identical distributions, = ln 2 on disjoint bin
    supports; NULL and NaN are excluded; an empty side and bad
    parameters raise."""
    import pytest

    from etl_developstoday_test_spark.operators.drift import js_divergence

    a = spark.createDataFrame(
        [(float(i % 100),) for i in range(400)], "v double"
    )
    same = spark.createDataFrame(
        [(float((i * 7) % 100),) for i in range(400)], "v double"
    )
    r0 = js_divergence(a, same, "v", n_bins=10, lo=0.0, hi=200.0).collect()[0]
    assert r0["js_divergence"] == 0.0 and r0["js_distance"] == 0.0
    far = spark.createDataFrame(
        [(float(100 + i % 100),) for i in range(400)], "v double"
    )
    r1 = js_divergence(a, far, "v", n_bins=10, lo=0.0, hi=200.0).collect()[0]
    assert abs(r1["js_divergence"] - 0.693147) < 1e-6  # ln 2
    messy = spark.createDataFrame(
        [(float(i % 100),) for i in range(400)]
        + [(None,)] * 7
        + [(float("nan"),)] * 3,
        "v double",
    )
    r2 = js_divergence(a, messy, "v", n_bins=10, lo=0.0, hi=200.0).collect()[0]
    assert r2["n_current"] == 400 and r2["js_divergence"] == 0.0
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="empty side"):
        js_divergence(a, empty, "v", n_bins=10, lo=0.0, hi=200.0)
    with pytest.raises(ValueError, match="lo/hi"):
        js_divergence(a, same, "v")
    with pytest.raises(ValueError, match="hi must be"):
        js_divergence(a, same, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="n_bins"):
        js_divergence(a, same, "v", n_bins=0, lo=0.0, hi=1.0)


def test_jaccard_link_prediction_fixture(spark):
    """Hand-checkable fixture: a path 1-2-3 predicts (1,3) at J=1;
    existing edges are excluded; a triangle with a pendant predicts
    the pendant's wedge partners."""
    from etl_developstoday_test_spark.operators.graph import (
        jaccard_link_prediction,
    )

    # path 1-2-3 plus triangle 10-11-12 with pendant 13 on 12
    e = [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (12, 13)]
    edges = spark.createDataFrame(e, "ua long, ub long")
    got = [tuple(r) for r in jaccard_link_prediction(edges, top_k=10).collect()]
    # (1,3): common={2}, d1=1, d3=1 -> 1/(1+1-1)=1.0
    # (10,13): common={12}, d10=2, d13=1 -> 1/2; (11,13) same
    assert got[0] == (1, 3, 1, 1.0)
    assert (10, 13, 1, 0.5) in got and (11, 13, 1, 0.5) in got
    # no existing edge appears as a prediction
    eset = set(e)
    assert all((r[0], r[1]) not in eset for r in got)


def test_neyman_allocation_constructed(spark):
    """Known two-strata case: the high-variance stratum takes the
    lion's share; budget sums exactly; constant strata fall back to
    proportional; empty input and bad params raise."""
    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        neyman_allocation,
    )

    # stratum A: 100 rows alternating 0/10 (std 5); B: 100 rows all 7
    rows = [("A", float(10 * (i % 2))) for i in range(100)]
    rows += [("B", 7.0)] * 100
    df = spark.createDataFrame(rows, "s string, v double")
    got = {
        r["stratum"]: r
        for r in neyman_allocation(df, "s", "v", total_n=60).collect()
    }
    assert got["A"]["std"] == 5.0 and got["B"]["std"] == 0.0
    # all weight sits on A: A gets the whole budget
    assert got["A"]["n_alloc"] == 60 and got["B"]["n_alloc"] == 0
    assert sum(r["n_alloc"] for r in got.values()) == 60
    # all-constant strata: proportional-to-size fallback
    flat = spark.createDataFrame(
        [("A", 1.0)] * 30 + [("B", 2.0)] * 10, "s string, v double"
    )
    got2 = {
        r["stratum"]: r["n_alloc"]
        for r in neyman_allocation(flat, "s", "v", total_n=20).collect()
    }
    assert got2 == {"A": 15, "B": 5}
    empty = spark.createDataFrame([(None, None)], "s string, v double")
    with pytest.raises(ValueError, match="no rows"):
        neyman_allocation(empty, "s", "v", total_n=5)
    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, "s", "v", total_n=-1)
    with pytest.raises(ValueError, match="quantum"):
        neyman_allocation(df, "s", "v", total_n=5, quantum=0)


def test_funnel_conversion_ordering_semantics(spark):
    """The funnel is ORDERED: a user who purchases before ever viewing
    does not convert; anchors are first-qualifying timestamps."""
    import datetime as dt

    import pytest

    from etl_developstoday_test_spark.operators.events_etl import (
        funnel_conversion,
    )

    def t(m):
        return dt.datetime(2026, 1, 1, 0, m)

    rows = [
        # u1 converts fully in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2 purchases BEFORE viewing: no conversion past step 1
        (2, t(5), "purchase"), (2, t(6), "view"),
        # u3 clicks at the same instant as the view: strict > excludes
        (3, t(0), "view"), (3, t(0), "click"),
        # u4 views only
        (4, t(0), "view"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, ty) for u, ts, ty in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = [tuple(r) for r in funnel_conversion(ev).collect()]
    assert got == [
        (1, "view", 4, 1.0, 1.0),
        (2, "click", 1, 0.25, 0.25),
        (3, "purchase", 1, 1.0, 0.25),
    ]
    with pytest.raises(ValueError, match="exactly 3"):
        funnel_conversion(ev, steps=("a", "b"))


def test_interarrival_burstiness_constructed(spark):
    """A metronome user scores exactly B = −1 (σ = 0); a bursty user
    scores higher; users under min_gaps and all-zero-gap users are
    excluded; min_gaps < 2 raises."""
    from datetime import datetime, timedelta

    import pytest

    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_burstiness,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: metronome — 6 events, constant 10s gaps
    rows += [(1, t0 + timedelta(seconds=10 * i), 100 + i) for i in range(6)]
    # user 2: bursty — gaps 1,1,1,1,996 (mean 200)
    offs = [0, 1, 2, 3, 4, 1000]
    rows += [(2, t0 + timedelta(seconds=o), 200 + i) for i, o in enumerate(offs)]
    # user 3: only 3 gaps — excluded by min_gaps=5
    rows += [(3, t0 + timedelta(seconds=7 * i), 300 + i) for i in range(4)]
    # user 4: 6 events all at the SAME second — s1 = 0, excluded
    rows += [(4, t0, 400 + i) for i in range(6)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {r["user_id"]: r for r in interarrival_burstiness(ev).collect()}
    assert set(got) == {1, 2}
    assert got[1]["burstiness"] == -1.0
    assert got[1]["mean_gap_s"] == 10.0
    assert -1.0 < got[2]["burstiness"] < 1.0
    assert got[2]["burstiness"] > got[1]["burstiness"]
    assert got[2]["mean_gap_s"] == 200.0
    with pytest.raises(ValueError, match="min_gaps"):
        interarrival_burstiness(ev, min_gaps=1)


def test_user_type_entropy_constructed(spark):
    """A single-type user scores exactly 0; a perfectly mixed k-type
    user scores ln k; users under min_events are excluded."""
    rows = []
    rows += [(1, "click")] * 10  # one type -> H = 0
    for t in ["a", "b", "c", "d", "e"]:  # 5 types x 2 -> H = ln 5
        rows += [(2, t)] * 2
    rows += [(3, "click")] * 9  # under min_events=10
    from etl_developstoday_test_spark.operators.events_etl import (
        user_type_entropy,
    )

    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["user_id"]: r for r in user_type_entropy(ev).collect()}
    assert set(got) == {1, 2}
    assert got[1]["entropy"] == 0.0 and got[1]["n_types"] == 1
    assert got[2]["entropy"] == 1.609438  # round(ln 5, 6)
    assert got[2]["n_types"] == 5 and got[2]["n_events"] == 10


def test_user_gini_constructed(spark):
    """Equal contribution gives exactly 0; a hand-computed skewed split
    ([1,1,1,97] → 0.72) comes out exactly; totals are exact."""
    from etl_developstoday_test_spark.operators.events_etl import (
        user_gini_concentration,
    )

    equal = spark.createDataFrame(
        [(u,) for u in range(1, 6) for _ in range(4)], "user_id long"
    )
    r = user_gini_concentration(equal).collect()[0]
    assert tuple(r) == (5, 20, 0.0)
    skew = spark.createDataFrame(
        [(1,), (2,), (3,)] + [(4,)] * 97, "user_id long"
    )
    r2 = user_gini_concentration(skew).collect()[0]
    # sorted x = [1,1,1,97]: G = 2*394/(4*100) - 5/4 = 0.72
    assert tuple(r2) == (4, 100, 0.72)


def test_benford_first_digit_constructed(spark):
    """All-digit-1 values put the whole mass on digit 1 (others emit
    zero rows via the spine); the digit is the first SIGNIFICANT digit
    at ANY scale — including the r11 ADVICE counterexamples 0.019
    (digit 1, NOT cents-rounded 2) and 0.999 (digit 9, NOT
    carry-bumped 1); non-positive/NULL/NaN are excluded; an empty
    audit raises; out-of-domain magnitudes raise."""
    import pytest

    from etl_developstoday_test_spark.operators.drift import (
        benford_first_digit,
    )

    vals = [
        (10.0,), (12.34,), (199.99,), (0.15,), (0.019,), (0.004,),
        (0.999,), (1.9e8,), (-5.0,), (None,), (0.0,),
    ]
    df = spark.createDataFrame(vals, "v double")
    rows = benford_first_digit(df, "v").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    by_d = {r["digit"]: r for r in rows}
    # digit 1: 10, 12.34, 199.99, 0.15, 0.019, 1.9e8
    assert by_d[1]["n_obs"] == 6
    assert by_d[4]["n_obs"] == 1  # 0.004 — dropped by the r11 cents path
    assert by_d[9]["n_obs"] == 1  # 0.999 — digit 9, not the carry's 1
    assert all(by_d[d]["n_obs"] == 0 for d in (2, 3, 5, 6, 7, 8))
    assert rows[0]["chi2"] > 2.0  # far from Benford
    empty = spark.createDataFrame([(-1.0,), (None,)], "v double")
    with pytest.raises(ValueError, match="no positive values"):
        benford_first_digit(empty, "v")
    tiny = spark.createDataFrame([(1e-20,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="outside the representable"):
        benford_first_digit(tiny, "v")
    huge = spark.createDataFrame([(1e21,), (float("inf"),)], "v double")
    with pytest.raises(ValueError, match="outside the representable"):
        benford_first_digit(huge, "v")


def test_quality_decile_thresholds_constructed(spark):
    """Uniform 1..10 scores give thresholds exactly 1..9; a
    constant-score group emits the same threshold at every decile."""
    from etl_developstoday_test_spark.operators.sampling import (
        quality_decile_thresholds,
    )

    rows = [("en", "x", i) for i in range(1, 11)] + [
        ("fr", "x", 7)
    ] * 5
    docs = spark.createDataFrame(rows, "lang string, text string, n_chars long")
    got = [tuple(r) for r in quality_decile_thresholds(docs).collect()]
    en = [r for r in got if r[0] == "en"]
    fr = [r for r in got if r[0] == "fr"]
    assert [(r[1], r[2]) for r in en] == [(d, d) for d in range(1, 10)]
    assert all(r[2] == 7 and r[3] == 5 for r in fr)
    assert len(fr) == 9


def test_topk_key_share_constructed(spark):
    """Hand-computed counts [5,3,3,1] at k=3: tie on 3 breaks by key,
    shares and cumulative shares are the exact 6-dp divisions."""
    from etl_developstoday_test_spark.operators.skew import topk_key_share

    rows = [(10,)] * 5 + [(7,)] * 3 + [(2,)] * 3 + [(99,)]
    df = spark.createDataFrame(rows, "k long")
    got = [tuple(r) for r in topk_key_share(df, "k", k=3).collect()]
    assert got == [
        (1, 10, 5, round(5 / 12, 6), round(5 / 12, 6)),
        (2, 2, 3, 0.25, round(8 / 12, 6)),
        (3, 7, 3, 0.25, round(11 / 12, 6)),
    ]


def test_fk_orphan_audit_constructed(spark):
    """NULL FKs count separately from orphans; a clean relation audits
    0; an empty relations list raises."""
    import pytest

    from etl_developstoday_test_spark.operators.dq import fk_orphan_audit

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    got = [
        tuple(r)
        for r in fk_orphan_audit(
            [("c->p", child, "fk", parent, "pk")]
        ).collect()
    ]
    assert got == [("c->p", 6, 2, 1, round(1 / 6, 6))]
    clean = fk_orphan_audit(
        [("ok", parent, "pk", parent, "pk")]
    ).collect()[0]
    assert clean["n_orphans"] == 0 and clean["orphan_rate"] == 0.0
    with pytest.raises(ValueError, match="at least one relation"):
        fk_orphan_audit([])


def test_top_event_paths_constructed(spark):
    """Overlapping 3-windows each count; users with < 3 events emit
    nothing; ties break on the path string; path_len != 3 raises."""
    from datetime import datetime, timedelta

    import pytest

    from etl_developstoday_test_spark.operators.events_etl import (
        top_event_paths,
    )

    t0 = datetime(2024, 1, 1)
    seq = ["a", "b", "a", "b"]  # paths: a>b>a, b>a>b
    rows = [
        (1, t0 + timedelta(seconds=i), i, s) for i, s in enumerate(seq)
    ]
    rows += [(2, t0, 100, "x"), (2, t0 + timedelta(seconds=1), 101, "y")]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = [tuple(r) for r in top_event_paths(ev).collect()]
    assert got == [("a>b>a", 1, 0.5), ("b>a>b", 1, 0.5)]
    with pytest.raises(ValueError, match="path_len"):
        top_event_paths(ev, path_len=2)


def test_adamic_adar_fixture(spark):
    """Path 1-2-3 predicts (1,3) at exactly 1/lnq(2); shared rare
    neighbors outrank shared hubs; existing edges are excluded."""
    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction,
    )

    # pair (10,11) shares hub 0 (degree 6); pair (20,21) shares rare
    # middle 30 (degree 2): AA must rank (20,21) above (10,11)
    e = [(0, 10), (0, 11), (0, 12), (0, 13), (0, 14), (0, 15),
         (20, 30), (21, 30), (1, 2), (2, 3)]
    edges = spark.createDataFrame(e, "ua long, ub long")
    got = [
        tuple(r)
        for r in adamic_adar_link_prediction(edges, top_k=100).collect()
    ]
    by_pair = {(r[0], r[1]): r[3] for r in got}
    # 1/round6(1/0.693147181) and existing-edge exclusion
    assert by_pair[(1, 3)] == round(1 / 0.693147181, 6)
    assert by_pair[(20, 21)] == by_pair[(1, 3)]
    assert by_pair[(10, 11)] == round(1 / 1.791759469, 6)  # lnq(6)
    assert by_pair[(20, 21)] > by_pair[(10, 11)]
    eset = set(e)
    assert all((r[0], r[1]) not in eset for r in got)


def test_source_vocab_js_identical_and_disjoint(spark):
    """Identical per-source token distributions give exactly 0;
    disjoint vocabularies give exactly ln 2."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        source_vocab_js,
    )

    same = spark.createDataFrame(
        [("s1", "a b c"), ("s2", "a b c")], "source string, text string"
    )
    r = source_vocab_js(same).collect()[0]
    assert r["js_divergence"] == 0.0 and r["js_distance"] == 0.0
    far = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "x y z")], "source string, text string"
    )
    r2 = source_vocab_js(far).collect()[0]
    assert abs(r2["js_divergence"] - 0.693147) < 1e-6


def test_nb_margin_auc_symmetric_ties_and_one_class_raise(spark):
    """A corpus where every text appears once correctly and once
    mislabeled produces exact margin ties between the classes —
    tie-aware AUC is exactly 0.5; a perfectly-separable corpus (no
    misclassifications) raises."""
    import pytest

    from etl_developstoday_test_spark.operators.ml import nb_margin_auc

    texts = {"en": "the quick brown fox", "fr": "le chat noir dort"}
    rows = []
    # train docs: ids not divisible by 5
    for i in range(1, 30):
        if i % 5 == 0:
            continue
        lang = "en" if i % 2 == 0 else "fr"
        rows.append((i, texts[lang], lang))
    # test docs (id % 5 == 0): each text once with true and once with
    # wrong label -> margins tie exactly across pos/neg
    rows += [
        (5, texts["en"], "en"),
        (10, texts["en"], "fr"),
        (15, texts["fr"], "fr"),
        (20, texts["fr"], "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = nb_margin_auc(docs).collect()[0]
    assert tuple(r) == (2, 2, 0.5)
    clean = spark.createDataFrame(
        [t for t in rows if t[0] not in (10, 20)]
        + [(10, texts["en"], "en"), (20, texts["fr"], "fr")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="one class"):
        nb_margin_auc(clean)


def test_norm_profile_constructed(spark):
    """Unit vectors profile at RMS exactly 1.0 with zero spread; a
    planted 10x-norm vector trips n_high and only n_high."""
    from etl_developstoday_test_spark.operators.similarity import (
        norm_profile,
    )

    rows = [(i, [1.0, 0.0], 0) for i in range(10)]
    rows += [(100 + i, [0.0, 1.0], 1) for i in range(12)]
    rows += [(200, [10.0, 0.0], 1)]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in norm_profile(embs).collect()}
    assert tuple(got[0]) == (0, 10, 1.0, 0.0, 0, 0)
    assert got[1]["n_vecs"] == 13
    assert got[1]["n_high"] == 1 and got[1]["n_low"] == 0


def test_hash_split_balance_audit_constructed(spark):
    """A constant key concentrates everything in one bucket: chi2 is
    exactly 99·n and the worst share deviation exactly 0.99; empty
    input raises."""
    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        hash_split_balance_audit,
    )

    df = spark.createDataFrame([(42,)] * 50, "k long")
    r = hash_split_balance_audit(df, "k").collect()[0]
    assert tuple(r) == (50, 100, 4950.0, 0.99)
    empty = spark.createDataFrame([], "k long")
    with pytest.raises(ValueError, match="empty input"):
        hash_split_balance_audit(empty, "k")


def test_cluster_size_histogram_constructed(spark):
    """Hand-checkable corpus [a,a,a,b,b,c]: one 3-cluster, one
    2-cluster, one singleton; savings exactly 0.5."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        cluster_size_histogram,
    )

    docs = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)], "text string"
    )
    got = [tuple(r) for r in cluster_size_histogram(docs).collect()]
    assert got == [
        (1, 1, 1, round(1 / 6, 6), 0.5),
        (2, 1, 2, round(2 / 6, 6), 0.5),
        (3, 1, 3, 0.5, 0.5),
    ]


def test_pareto_revenue_curve_constructed(spark):
    """Ten keys with values 1..10 at n_tiles=5: tiles pair (10,9),
    (8,7)... with exact cent totals and shares; NULL keys/values are
    excluded."""
    from etl_developstoday_test_spark.operators.skew import (
        pareto_revenue_curve,
    )

    rows = [(k, float(k)) for k in range(1, 11)]
    rows += [(None, 99.0), (77, None)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = [
        tuple(r)
        for r in pareto_revenue_curve(df, "k", "v", n_tiles=5).collect()
    ]
    cents = {k: k * 100 for k in range(1, 11)}
    tiles = [(10, 9), (8, 7), (6, 5), (4, 3), (2, 1)]
    total = sum(cents.values())
    cum = 0
    want = []
    for i, (a, b) in enumerate(tiles, start=1):
        vc = cents[a] + cents[b]
        cum += vc
        want.append(
            (i, 2, vc, round(vc / total, 6), round(cum / total, 6))
        )
    assert got == want


def test_chi2_categorical_identical_disjoint_and_raises(spark):
    """Identical mixes score exactly 0; disjoint category supports
    score the theoretical maximum n_b + n_c; NULL categories are
    excluded; an empty side raises."""
    import pytest

    from etl_developstoday_test_spark.operators.drift import (
        chi2_categorical,
    )

    a = spark.createDataFrame(
        [("x",)] * 30 + [("y",)] * 10, "c string"
    )
    same = spark.createDataFrame(
        [("x",)] * 60 + [("y",)] * 20 + [(None,)] * 5, "c string"
    )
    rows = chi2_categorical(a, same, "c").collect()
    assert all(r["chi2"] == 0.0 and r["chi2_contrib"] == 0.0 for r in rows)
    assert {r["category"] for r in rows} == {"x", "y"}
    assert rows[0]["dof"] == 1
    far = spark.createDataFrame([("z",)] * 40, "c string")
    r2 = chi2_categorical(a, far, "c").collect()
    # disjoint supports: chi2 = grand total (40 + 40)
    assert all(r["chi2"] == 80.0 for r in r2)
    empty = spark.createDataFrame([(None,)], "c string")
    with pytest.raises(ValueError, match="empty side"):
        chi2_categorical(a, empty, "c")


def test_uniqueness_audit_constructed(spark):
    """Hand-computed card: 6 rows, one NULL-component key, one doubled
    key -> n_distinct 3, one violating key, one excess row; empty
    relation list raises."""
    import pytest

    from etl_developstoday_test_spark.operators.dq import uniqueness_audit

    rows = [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (None, "d"), (4, None)]
    df = spark.createDataFrame(rows, "k1 long, k2 string")
    got = tuple(
        uniqueness_audit([("t.(k1,k2)", df, ["k1", "k2"])]).collect()[0]
    )
    assert got == ("t.(k1,k2)", 6, 2, 3, 1, 1, False)
    clean = spark.createDataFrame([(1,), (2,)], "k long")
    r = uniqueness_audit([("c.k", clean, ["k"])]).collect()[0]
    assert r["is_unique"] is True and r["n_excess_rows"] == 0
    with pytest.raises(ValueError, match="at least one relation"):
        uniqueness_audit([])


def test_daily_autocorr_constructed(spark):
    """A linear daily ramp pins r = +1 exactly; a two-level alternator
    pins r = -1; a CALENDAR GAP drops the spanning pair instead of
    correlating non-adjacent days (r11 ADVICE); constant series and
    < 2 pairs raise."""
    from datetime import datetime, timedelta

    import pytest

    from etl_developstoday_test_spark.operators.drift import (
        daily_autocorr_lag1,
    )

    t0 = datetime(2024, 1, 1)

    def series(vals, day_offsets=None):
        offs = day_offsets or range(len(vals))
        return spark.createDataFrame(
            [(t0 + timedelta(days=o), float(v)) for o, v in zip(offs, vals)],
            "ts timestamp, value double",
        )

    up = daily_autocorr_lag1(series([1, 2, 3, 4, 5, 6]), "value").collect()[0]
    assert tuple(up) == (6, 5, 1.0)
    alt = daily_autocorr_lag1(
        series([1, 9, 1, 9, 1, 9]), "value"
    ).collect()[0]
    assert alt["autocorr_lag1"] == -1.0
    # gap between day 2 and day 10: pairs are (1,2),(2,3),(7,9) — the
    # 3->7 jump across the gap is NOT a pair; an observed-sequence
    # lead() would have correlated it
    gap = daily_autocorr_lag1(
        series([1, 2, 3, 7, 9], day_offsets=[0, 1, 2, 10, 11]), "value"
    ).collect()[0]
    assert (gap["n_days"], gap["n_pairs"]) == (5, 3)
    with pytest.raises(ValueError, match="constant daily series"):
        daily_autocorr_lag1(series([5, 5, 5, 5]), "value")
    with pytest.raises(ValueError, match=">= 2 consecutive-calendar"):
        daily_autocorr_lag1(series([1, 2]), "value")
    # 4 observed days but only ONE consecutive pair -> raises
    with pytest.raises(ValueError, match=">= 2 consecutive-calendar"):
        daily_autocorr_lag1(
            series([1, 2, 5, 6], day_offsets=[0, 1, 5, 9]), "value"
        )


def test_heaps_law_fit_diverse_vs_duplicated(spark):
    """An all-unique-trigram corpus fits beta near 1 (every n-gram is
    new); a corpus of one repeated text saturates immediately (beta
    near 0); the curve is monotone; a single-prefix corpus raises."""
    import pytest

    from etl_developstoday_test_spark.operators.text_analysis import (
        heaps_law_fit,
    )

    diverse = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(200)],
        "doc_id long, text string",
    )
    dv = heaps_law_fit(diverse).collect()
    assert dv[0]["heaps_beta"] > 0.9
    dup = spark.createDataFrame(
        [(i, "same old text again and again") for i in range(200)],
        "doc_id long, text string",
    )
    dp = heaps_law_fit(dup).collect()
    assert dp[0]["heaps_beta"] < 0.1
    for rows in (dv, dp):
        nt = [r["n_ngrams"] for r in rows]
        vs = [r["vocab_size"] for r in rows]
        assert nt == sorted(nt) and vs == sorted(vs)
    one = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty prefixes"):
        heaps_law_fit(one)


def test_local_bridges_fixture(spark):
    """Triangle edges are never local bridges; a pendant on the
    triangle and an isolated path are; degree sums and the share are
    exact."""
    from etl_developstoday_test_spark.operators.graph import local_bridges

    # triangle 1-2-3, pendant 3-4, path 10-11
    e = [(1, 2), (1, 3), (2, 3), (3, 4), (10, 11)]
    edges = spark.createDataFrame(e, "ua long, ub long")
    got = [tuple(r) for r in local_bridges(edges, top_k=10).collect()]
    # bridges: (3,4) deg 3+1=4; (10,11) deg 1+1=2; share 2/5
    assert got == [(3, 4, 4, 2, 0.4), (10, 11, 2, 2, 0.4)]


def test_functional_dependency_audit_constructed(spark):
    """A holds-FD, a violated FD with exact violating-row counts, NULL
    rows counted separately and excluded from the test; an empty
    relations list raises."""
    import pytest

    from etl_developstoday_test_spark.operators.dq import (
        functional_dependency_audit,
    )

    rows = [
        ("a", "x"), ("a", "x"), ("b", "y"),          # holds so far
        ("c", "x"), ("c", "y"), ("c", "y"),          # c violates (3 rows)
        (None, "z"), ("d", None),                    # 2 null rows
    ]
    df = spark.createDataFrame(rows, "det string, dep string")
    got = [
        tuple(r)
        for r in functional_dependency_audit(
            [("t.det->dep", df, "det", "dep")]
        ).collect()
    ]
    assert got == [("t.det->dep", 8, 2, 3, 1, 3, False)]
    clean = spark.createDataFrame(rows[:3], "det string, dep string")
    got2 = [
        tuple(r)
        for r in functional_dependency_audit(
            [("t2", clean, "det", "dep")]
        ).collect()
    ]
    assert got2 == [("t2", 3, 0, 2, 0, 0, True)]
    with pytest.raises(ValueError, match="at least one relation"):
        functional_dependency_audit([])


def test_degree_powerlaw_fit_constructed(spark):
    """A 5-leaf star: hub degree 5, five degree-1 leaves — histogram
    {1: 5, 5: 1}; the tail at dmin=2 is the hub alone, so alpha =
    1 + 1/ln(5/1.5) exactly (nano-quantized); dmin=1 includes the
    leaves; no-tail and bad dmin raise."""
    import math

    import pytest

    from etl_developstoday_test_spark.operators.graph import (
        degree_powerlaw_fit,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "ua long, ub long"
    )
    got = [tuple(r) for r in degree_powerlaw_fit(star, dmin=2).collect()]
    lnq = round(math.log(5 / 1.5) * 1e9)
    alpha = round(1.0 + 1.0 / (lnq / 1e9), 6)
    assert got == [(1, 5, alpha, 1, 2), (5, 1, alpha, 1, 2)]
    # dmin=1: ln(1/0.5) from the leaves joins the sum
    got1 = [tuple(r) for r in degree_powerlaw_fit(star, dmin=1).collect()]
    s = 5 * round(math.log(1 / 0.5) * 1e9) + round(math.log(5 / 0.5) * 1e9)
    alpha1 = round(1.0 + 6.0 / (s / 1e9), 6)
    assert [r[2] for r in got1] == [alpha1, alpha1]
    with pytest.raises(ValueError, match="no vertex has degree"):
        degree_powerlaw_fit(star, dmin=6)
    with pytest.raises(ValueError, match="dmin"):
        degree_powerlaw_fit(star, dmin=0)


def test_retention_cohorts_constructed(spark):
    """Two cohorts with hand-tracked weekly activity: week-0 rows pin
    retention 1.0; a user active in a later week counts once no matter
    how many events; gaps produce no row (no zero-fill — absence IS
    the signal a triangle reader expects)."""
    from datetime import datetime, timedelta

    from etl_developstoday_test_spark.operators.events_etl import (
        retention_cohorts,
    )

    mon = datetime(2024, 1, 1)  # a Monday
    rows = []
    # cohort A (week 0): users 1, 2. user 1 active weeks 0,1,3 (twice
    # in week 1); user 2 only week 0.
    rows += [(1, mon), (1, mon + timedelta(days=7)),
             (1, mon + timedelta(days=8)), (1, mon + timedelta(days=21))]
    rows += [(2, mon + timedelta(days=2))]
    # cohort B (week 1): user 3 active weeks 1 and 2
    rows += [(3, mon + timedelta(days=9)), (3, mon + timedelta(days=15))]
    ev = spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, ts timestamp"
    )
    got = [tuple(r) for r in retention_cohorts(ev).collect()]
    wk = mon.date()
    wk1 = (mon + timedelta(days=7)).date()
    assert got == [
        (wk, 0, 2, 2, 1.0),
        (wk, 1, 1, 2, 0.5),
        (wk, 3, 1, 2, 0.5),
        (wk1, 0, 1, 1, 1.0),
        (wk1, 1, 1, 1, 1.0),
    ]


def test_simpson_diversity_constructed(spark):
    """Hand values: 'a a b' gives lambda = 2/(3*2) = 1/3, inverse 3;
    a single-type corpus pins lambda = 1; a 1-token group is excluded."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        simpson_diversity,
    )

    docs = spark.createDataFrame(
        [("en", "a a b"), ("fr", "x x x"), ("zh", "solo")],
        "lang string, text string",
    )
    got = [tuple(r) for r in simpson_diversity(docs).collect()]
    assert got == [
        ("en", 3, 2, round(1 / 3, 6), round(2 / 3, 6), 3.0),
        ("fr", 3, 1, 1.0, 0.0, 1.0),
    ]


def test_interval_bucket_join_rejects_bad_width(spark):
    import pytest

    from etl_developstoday_test_spark.operators.asof import (
        interval_bucket_join,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "k long, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    iv = df.selectExpr("k", "ts AS lo", "ts AS hi")
    with pytest.raises(ValueError, match="bucket_micros"):
        interval_bucket_join(df, iv, "k", "ts", "lo", "hi", bucket_micros=0)


def test_cohen_kappa_constructed(spark):
    """Textbook 2x2: conf = [[20, 5], [10, 15]] -> po = 0.7,
    pe = (30*25 + 20*25)/2500 = 0.5, kappa = 0.4 exactly; NULLs
    excluded; all-agree-constant raises; empty raises."""
    import pytest

    from etl_developstoday_test_spark.operators.ml import (
        cohen_kappa_agreement,
    )

    rows = (
        [("a", "a")] * 20 + [("a", "b")] * 5
        + [("b", "a")] * 10 + [("b", "b")] * 15
        + [(None, "a"), ("a", None)]
    )
    df = spark.createDataFrame(rows, "t string, p string")
    got = [tuple(r) for r in cohen_kappa_agreement(df, "t", "p").collect()]
    assert got == [(50, 35, 0.7, 0.5, 0.4)]
    const = spark.createDataFrame([("x", "x")] * 3, "t string, p string")
    with pytest.raises(ValueError, match="constant"):
        cohen_kappa_agreement(const, "t", "p")
    empty = spark.createDataFrame([(None, "x")], "t string, p string")
    with pytest.raises(ValueError, match="no rows"):
        cohen_kappa_agreement(empty, "t", "p")


def test_dow_seasonality_anova_constructed(spark):
    """Two weeks where Mondays run hot: hand-computable F; a
    no-within-df series and a constant-within series raise."""
    from datetime import datetime, timedelta

    import pytest

    from etl_developstoday_test_spark.operators.drift import (
        dow_seasonality_anova,
    )

    mon = datetime(2024, 1, 1)  # Monday

    def series(vals_by_day):
        return spark.createDataFrame(
            [
                (mon + timedelta(days=d), float(v))
                for d, v in vals_by_day.items()
            ],
            "ts timestamp, value double",
        )

    # Mondays 10/12, Tuesdays 1/3 over two weeks: group means 11 and 2,
    # grand 6.5; SSB = 2*(4.5^2)*2 = 81; SSW = 2+2 = 4; F = (81/1)/(4/2)
    ev = series({0: 10, 1: 1, 7: 12, 8: 3})
    got = [tuple(r) for r in dow_seasonality_anova(ev, "value").collect()]
    assert [(r[0], r[1], r[2]) for r in got] == [(1, 2, 11.0), (2, 2, 2.0)]
    assert got[0][3] == round((81.0 / 1.0) / (4.0 / 2.0), 6)  # F = 40.5
    assert (got[0][4], got[0][5]) == (1, 2)
    with pytest.raises(ValueError, match="degrees of freedom"):
        dow_seasonality_anova(series({0: 1, 1: 2}), "value")
    with pytest.raises(ValueError, match="zero within-weekday"):
        dow_seasonality_anova(
            series({0: 5, 7: 5, 1: 2, 8: 2}), "value"
        )
    with pytest.raises(ValueError, match=">= 2 observed weekdays"):
        dow_seasonality_anova(series({0: 1, 7: 2, 14: 3}), "value")


def test_bigram_entropy_rate_constructed(spark):
    """'a b a b': unigrams {a:2, b:2} -> H1 = ln 2 (nano-quantized);
    bigrams {a b:2, b a:1} -> H2 hand-assembled from the same
    quantization; a deterministic text pins rate = H2 - H1; a
    one-token group is excluded (no bigrams)."""
    import math

    from etl_developstoday_test_spark.operators.text_analysis import (
        bigram_entropy_rate,
    )

    docs = spark.createDataFrame(
        [("en", "a b a b"), ("zh", "solo")], "lang string, text string"
    )
    got = [tuple(r) for r in bigram_entropy_rate(docs).collect()]

    def lnq(c):
        return round(math.log(c) * 1e9)

    h1 = round(lnq(4) / 1e9 - (2 * lnq(2) + 2 * lnq(2)) / 1e9 / 4.0, 6)
    h2 = round(lnq(3) / 1e9 - (2 * lnq(2) + 1 * lnq(1)) / 1e9 / 3.0, 6)
    assert got == [("en", 4, 3, h1, h2, round(h2 - h1, 6))]


def test_rich_club_coefficient_constructed(spark):
    """K4 plus a pendant: degrees {4:1 node, 3:3 nodes, 1:1 node}.
    k=1 keeps the 4 clique nodes with all 6 internal edges -> phi = 1;
    k=2 identical; k=3 keeps only the hub -> excluded (n < 2); bad k
    raises."""
    import pytest

    from etl_developstoday_test_spark.operators.graph import (
        rich_club_coefficient,
    )

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(0, 9)], "ua long, ub long")
    got = [
        tuple(r)
        for r in rich_club_coefficient(edges, k_values=[1, 2, 3]).collect()
    ]
    assert got == [(1, 4, 6, 1.0), (2, 4, 6, 1.0)]
    with pytest.raises(ValueError, match="k values"):
        rich_club_coefficient(edges, k_values=[-1])


def test_half_sample_ci_constructed(spark):
    """A constant column pins mean exactly with se = 0 (every replica
    mean equals the grand mean); out-of-range replica counts raise;
    a corpus too small for the bit split raises loudly."""
    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        half_sample_mean_ci,
    )

    df = spark.createDataFrame(
        [(i, 7.5) for i in range(400)], "event_id long, value double"
    )
    got = tuple(half_sample_mean_ci(df, "value", "event_id").collect()[0])
    assert got == (400, 7.5, 0.0, 7.5, 7.5, 32)
    with pytest.raises(ValueError, match="n_replicas"):
        half_sample_mean_ci(df, "value", "event_id", n_replicas=61)
    tiny = spark.createDataFrame(
        [(1, 1.0)], "event_id long, value double"
    )
    with pytest.raises(ValueError, match="zero rows"):
        half_sample_mean_ci(tiny, "value", "event_id")


def test_daily_volume_mad_constructed(spark):
    """Hand counts [10, 10, 12, 12, 13] plus one 40-count spike day:
    median/MAD are hand-checkable and ONLY the spike flags; an
    all-equal-count series raises (MAD = 0)."""
    from datetime import datetime, timedelta

    import pytest

    from etl_developstoday_test_spark.operators.drift import (
        daily_volume_mad_anomalies,
    )

    t0 = datetime(2024, 5, 1)

    def series(counts):
        rows = [
            (t0 + timedelta(days=d, seconds=i),)
            for d, c in enumerate(counts)
            for i in range(c)
        ]
        return spark.createDataFrame(rows, "ts timestamp")

    got = [
        tuple(r)
        for r in daily_volume_mad_anomalies(
            series([10, 10, 12, 12, 13, 40])
        ).collect()
    ]
    # sorted counts [10,10,12,12,13,40]: med = 12, |dev| sorted
    # [0,0,1,2,2,28] -> mad = 1.5
    assert [(r[1], r[2], r[3]) for r in got] == [
        (c, 12.0, 1.5) for c in [10, 10, 12, 12, 13, 40]
    ]
    flags = [r[5] for r in got]
    assert flags == [False] * 5 + [True]
    assert got[5][4] == round(0.6745 * 28 / 1.5, 6)
    with pytest.raises(ValueError, match="MAD is zero"):
        daily_volume_mad_anomalies(series([5, 5, 5, 5]))


def test_daily_autocorr_lag_days_constructed(spark):
    """lag_days=2 on a period-2 alternator pins r = +1 (each day
    correlates with its same-phase day), where lag 1 pins -1; lag
    pairs are calendar-exact (gap days drop); lag_days < 1 raises."""
    from datetime import datetime, timedelta

    import pytest

    from etl_developstoday_test_spark.operators.drift import (
        daily_autocorr_lag1,
    )

    t0 = datetime(2024, 1, 1)

    def series(vals):
        return spark.createDataFrame(
            [(t0 + timedelta(days=i), float(v)) for i, v in enumerate(vals)],
            "ts timestamp, value double",
        )

    alt = series([1, 9, 2, 8, 1, 9, 2, 8])
    assert daily_autocorr_lag1(alt, "value").collect()[0][
        "autocorr_lag1"
    ] < 0
    r2 = daily_autocorr_lag1(alt, "value", lag_days=2).collect()[0]
    assert (r2["n_days"], r2["n_pairs"]) == (8, 6)
    assert r2["autocorr_lag1"] > 0.9
    with pytest.raises(ValueError, match="lag_days"):
        daily_autocorr_lag1(alt, "value", lag_days=0)
