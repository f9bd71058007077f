"""Property-based tests (hypothesis): operator invariants that must hold
on ANY input, not just fixtures — the randomized layer the reference's
test suite lacks (SURVEY.md §5)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from etl_developstoday_test_spark.operators.asof import asof_join
from etl_developstoday_test_spark.operators.dedup import first_wins_dedup

KEYS = st.integers(min_value=0, max_value=3)
ORDS = st.integers(min_value=0, max_value=50)

rows_strategy = st.lists(
    st.tuples(KEYS, KEYS, ORDS), min_size=1, max_size=40, unique=True
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_first_wins_dedup_invariants(spark, rows):
    df = spark.createDataFrame(rows, "k1 long, k2 long, ord long")
    winners, losers = first_wins_dedup(df, ["k1", "k2"], "ord")
    w = [tuple(r) for r in winners.select("k1", "k2", "ord").collect()]
    l = [tuple(r) for r in losers.select("k1", "k2", "ord").collect()]
    # partition: winners ∪ losers == input, disjoint
    assert sorted(w + l) == sorted(set(rows))
    # one winner per key, and it carries the minimal order value
    by_key = {}
    for k1, k2, o in rows:
        by_key.setdefault((k1, k2), []).append(o)
    assert sorted((k1, k2) for k1, k2, _ in w) == sorted(by_key)
    for k1, k2, o in w:
        assert o == min(by_key[(k1, k2)])


asof_left = st.lists(
    st.tuples(KEYS, st.integers(0, 100)), min_size=1, max_size=25, unique=True
)
asof_right = st.lists(
    st.tuples(KEYS, st.integers(0, 100), st.integers(0, 1000)),
    min_size=1, max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left, right=asof_right)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(left, "k long, lt long")
    rdf = spark.createDataFrame(right, "k long, rt long, rv long")
    out = asof_join(ldf, rdf, "k", "lt", "rt", ["rv"]).toPandas()

    lp = pd.DataFrame(left, columns=["k", "lt"]).sort_values("lt")
    rp = pd.DataFrame(right, columns=["k", "rt", "rv"]).sort_values("rt")
    want = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k", direction="backward"
    )
    def norm(v):
        return None if pd.isna(v) else int(v)

    got = {
        (r.k, r.lt): (norm(r.asof_rt), norm(r.asof_rv)) for r in out.itertuples()
    }
    for r in want.itertuples():
        assert got[(r.k, r.lt)] == (norm(r.rt), norm(r.rv)), (r.k, r.lt)


_words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=40
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=_words)
def test_chunk_overlap_reconstruction_invariants(spark, words):
    """Non-overlapping chunks (stride == size) partition the token
    stream exactly; overlapping chunks tile every token and agree with
    the doc on every chunk's content."""
    from etl_developstoday_test_spark.operators.text_analysis import chunk_overlap

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = text.split() if text.strip() else [""]

    flat = chunk_overlap(docs, chunk_tokens=8, stride=8).orderBy("chunk_id").collect()
    rebuilt = [t for r in flat for t in r.chunk_text.split(" ") if r.chunk_text != ""]
    if text.strip():
        assert rebuilt == toks
    assert [r.start_token for r in flat] == [i * 8 for i in range(len(flat))]

    if not text.strip():
        # blank doc: exactly one empty chunk
        assert len(flat) == 1 and flat[0].chunk_text == ""
        return

    over = chunk_overlap(docs, chunk_tokens=8, stride=5).orderBy("chunk_id").collect()
    for r in over:
        expect = toks[r.start_token : r.start_token + 8]
        assert r.chunk_text.split(" ") == expect
        assert r.n_chunk_tokens == len(expect)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=_words)
def test_repetition_ratio_bounds(spark, words):
    from etl_developstoday_test_spark.operators.text_analysis import repetition_ratio

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = repetition_ratio(docs).collect()[0]
    assert 0.0 <= r.dup_ngram_ratio < 1.0 or r.n_ngrams == 0
    assert 0.0 <= r.dup_token_ratio < 1.0
    assert r.n_unique_ngrams <= r.n_ngrams


pack_docs = st.lists(
    st.integers(min_value=1, max_value=30),  # token counts per doc
    min_size=1,
    max_size=30,
)
pack_budget = st.integers(min_value=2, max_value=40)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(counts=pack_docs, budget=pack_budget)
def test_pack_sequences_matches_python_reference(spark, counts, budget):
    """Concatenate-and-chunk packing must equal the sequential fold: in
    doc_id order, each doc's sequence = its start offset // budget.
    One shard so the reference is a single stream."""
    from etl_developstoday_test_spark.operators.sampling import pack_sequences

    rows = [
        (i, " ".join(f"t{j}" for j in range(c)), "en", "s", c)
        for i, c in enumerate(counts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["seq_id"]: (r["n_docs"], r["seq_tokens"])
        for r in pack_sequences(df, budget=budget, n_shards=1).collect()
    }

    want: dict[int, list[int]] = {}
    offset = 0
    for c in counts:
        want.setdefault(offset // budget, []).append(c)
        offset += c
    assert got == {
        sid: (len(cs), sum(cs)) for sid, cs in want.items()
    }
    # token partition: every token lands in exactly one sequence
    assert sum(t for _, t in got.values()) == sum(counts)


# ---------------------------------------------------------------------------
# Hot-key guard: the family invariant for every pair-join dedup operator.
# A pathological hot key (a boilerplate passage shared by d ≫ cap docs)
# must NOT produce the d² clone pairs, while a genuinely-duplicated pair
# with rare content must still be found. This lifts the per-operator
# df_max/bucket_max guards (text_dedup.py) into one parametrized
# invariant, the same way the no-Python/no-cartesian sweeps work.
# ---------------------------------------------------------------------------

_N_CLONES = 12
_HOT_CAP = 4  # df_max / bucket_max — well under _N_CLONES


def _hot_key_corpus(spark):
    """12 clones of one boilerplate passage (the hot key), one genuine
    duplicated pair (100, 101) with rare content, and two singletons.
    Word alphabets are disjoint so clone shingles never touch the pair's."""
    boiler = " ".join(f"boiler{i}" for i in range(12))
    rare = " ".join(f"rareword{i}" for i in range(12))
    rows = [(i, boiler) for i in range(_N_CLONES)]
    rows += [(100, rare), (101, rare)]
    rows += [(200, " ".join(f"solo_a{i}" for i in range(12)))]
    rows += [(201, " ".join(f"solo_b{i}" for i in range(12)))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


@pytest.mark.parametrize("op", ["winnow", "jaccard", "lsh_bands"])
def test_hot_key_guard_bounds_pair_join_family(spark, op):
    from etl_developstoday_test_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        winnow_match_pairs,
    )

    docs = _hot_key_corpus(spark)
    if op == "winnow":
        unguarded = winnow_match_pairs(docs, min_shared=1)
        guarded = winnow_match_pairs(docs, min_shared=1, df_max=_HOT_CAP)
        cols = ("doc_id_a", "doc_id_b")
    elif op == "jaccard":
        unguarded = ngram_jaccard_pairs(docs, threshold=0.5)
        guarded = ngram_jaccard_pairs(docs, threshold=0.5, df_max=_HOT_CAP)
        cols = ("doc_a", "doc_b")
    else:
        unguarded = minhash_lsh_pairs(docs, threshold=0.5)
        guarded = minhash_lsh_pairs(docs, threshold=0.5, bucket_max=_HOT_CAP)
        cols = ("doc_a", "doc_b")

    clone_ids = set(range(_N_CLONES))
    n_clone_pairs = _N_CLONES * (_N_CLONES - 1) // 2

    # Without the guard the hot key really is quadratic: all 66 clone
    # pairs come out of one bucket (this is the blowup being guarded).
    un = _pairs(unguarded, *cols)
    assert {(a, b) for a, b in un if a in clone_ids and b in clone_ids} == {
        (a, b) for a in clone_ids for b in clone_ids if a < b
    }
    assert len(un) == n_clone_pairs + 1

    # With the guard: zero pairs from the hot key — fan-out is bounded
    # by the cap, not by the clone-cluster size…
    g = _pairs(guarded, *cols)
    assert not {(a, b) for a, b in g if a in clone_ids and b in clone_ids}
    # …and the genuine rare-content duplicate pair still surfaces
    # (document frequency 2 ≤ cap), so the guard cuts only the blowup.
    assert g == {(100, 101)}


up_weights = st.lists(
    st.floats(min_value=0.0, max_value=4.0, allow_nan=False, width=32),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(weights=up_weights)
def test_mixture_upsample_total_matches_per_doc_formula(spark, weights):
    """For ANY weight vector: emitted rows = Σ(floor(w) + [u < frac(w)])
    with u recomputed independently — the expected-volume contract
    (output ≈ sum of weights) holds exactly, not just in expectation."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.sampling import mixture_upsample

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = mixture_upsample(df, F.col("w")).count()

    want = 0
    for i, w in rows:
        u = (int(hashlib.md5(f"up#{i}".encode()).hexdigest()[:15], 16) % 10000) / 10000.0
        want += math.floor(w) + (1 if u < w - math.floor(w) else 0)
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left, right=asof_right, tol=st.integers(min_value=0, max_value=30))
def test_asof_join_tolerance_matches_pandas_merge_asof(spark, left, right, tol):
    """The staleness bound must agree with pandas merge_asof(tolerance=)
    on ANY input: matches older than the bound null out entirely."""
    ldf = spark.createDataFrame(left, "k long, lt long")
    rdf = spark.createDataFrame(right, "k long, rt long, rv long")
    out = asof_join(
        ldf, rdf, "k", "lt", "rt", ["rv"], tolerance=tol
    ).toPandas()

    lp = pd.DataFrame(left, columns=["k", "lt"]).sort_values("lt")
    rp = pd.DataFrame(right, columns=["k", "rt", "rv"]).sort_values("rt")
    want = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction="backward", tolerance=tol,
    )

    def norm(v):
        return None if pd.isna(v) else int(v)

    got = {
        (r.k, r.lt): (norm(r.asof_rt), norm(r.asof_rv)) for r in out.itertuples()
    }
    for r in want.itertuples():
        assert got[(r.k, r.lt)] == (norm(r.rt), norm(r.rv)), (r.k, r.lt, tol)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lines=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\n", max_codepoint=0x2FF),
            max_size=20,
        ),
        max_size=30,
    ),
    trailing_newline=st.booleans(),
    chunk_bytes=st.integers(min_value=1, max_value=64),
)
def test_chunktext_split_protocol_lossless_on_any_input(
    tmp_path_factory, lines, trailing_newline, chunk_bytes
):
    """The Hadoop boundary protocol, adversarially: for ANY file content
    (including empty lines, multi-byte UTF-8, no trailing newline) and
    ANY chunk size, the union of all chunk reads is exactly the file's
    lines — each produced exactly once, by exactly one chunk. Drives
    the reader class directly (no Spark session), which is the same
    code path the executors run."""
    from etl_developstoday_test_spark.sources.python_datasource import (
        ChunkedTextReader,
    )

    content = "\n".join(lines) + ("\n" if trailing_newline and lines else "")
    p = tmp_path_factory.mktemp("chunktext") / "f.txt"
    p.write_bytes(content.encode("utf-8"))

    reader = ChunkedTextReader(
        {"path": str(p), "chunk_bytes": str(chunk_bytes)}
    )
    got = []
    for part in reader.partitions():
        rows = list(reader.lines(part))
        # line_in_chunk must be 1..n within each chunk, in order
        assert [r[1] for r in rows] == list(range(1, len(rows) + 1))
        got.extend(r[2] for r in rows)

    want = content.split("\n")
    if want and want[-1] == "" and content.endswith("\n"):
        want = want[:-1]  # final newline terminates the last line
    if content == "":
        want = []
    assert sorted(got) == sorted(want), (chunk_bytes, content)


def test_partition_count_invariance_on_float_heavy_queries(spark):
    """Engine determinism contract, asserted end-to-end: the queries
    whose results pass through floating-point accumulation must return
    the EXACT same value multiset regardless of parallelism — that is
    what the decimal-quantized sum/moment discipline buys. Runs each
    query under 3-way and 17-way shuffle partitioning (different
    partial-aggregation trees, different merge orders) in cloned
    sessions and compares full sorted row sets bit-for-bit."""
    from etl_developstoday_test_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    names = [
        "tpch_q1_pricing_summary",     # decimal sums/avgs over doubles
        "agg_corr_price_quantity",     # five cross-moment decimal sums
        "agg_stats_moments",           # exact moment statistics
        "events_hourly_twap",          # integer-quantized time weights
        "embed_ann_pq_topk",           # decimal ADC sums drive ranking
        "agg_histogram_totalprice",    # integer-cent buckets
        "events_variant_navigate",     # JSON round-trip + decimal sum
        "stream_user_running_totals",  # stateful quanta accumulation
    ]
    for name in names:
        results = []
        for parts in (3, 17):
            s = spark.newSession()
            s.conf.set("spark.sql.shuffle.partitions", str(parts))
            rows = QUERIES[name](s, SF_DIR).collect()
            results.append(sorted(tuple(r) for r in rows))
        assert results[0] == results[1], f"{name} varies with partitioning"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        max_size=30,
    )
)
def test_triangle_count_matches_brute_force(spark, edges):
    """The degree-oriented wedge join must count EXACTLY the triangles
    an O(n³) enumeration finds, on any graph — orientation must never
    double-count (each triangle is a chain in the total order) nor drop
    (the closing edge's direction is implied by the wedge's)."""
    import itertools

    from etl_developstoday_test_spark.operators.graph import triangle_count

    und = {(min(a, b), max(a, b)) for a, b in edges}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    got = triangle_count(df).collect()[0]

    nodes = sorted({v for e in und for v in e})
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    assert (got.n_edges, got.n_triangles) == (len(und), want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "gold", "iron", "wolf",
                             "moon", "star", "rain", "leaf"]),
            min_size=5,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.5, 0.7, 0.8]),
)
def test_prefix_filter_lossless_on_any_corpus(spark, texts, threshold):
    """The pigeonhole guarantee, adversarially: on ANY corpus and any
    threshold, prefix-filtered pairs must equal the all-pairs
    shared-shingle join exactly — same pairs, same intersection sizes,
    same Jaccard values. Small word alphabet forces heavy shingle
    sharing, the regime where a broken prefix rule would drop pairs."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        tuple(r)
        for r in prefix_filter_jaccard_pairs(docs, n=3, threshold=threshold).collect()
    )
    want = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=threshold).collect()
    )
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_pq_clone_always_achieves_max_adc_score(spark, seed):
    """PQ compression is lossy, but a vector IDENTICAL to the probe
    must encode to the probe's own codes and therefore achieve the
    maximum possible ADC score among all corpus vectors — on any
    corpus. (Rank-1 is not asserted: another vector may tie by landing
    on the same codes, which is legitimate PQ behavior.)"""
    import math

    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.similarity import pq_topk

    rows = [
        (
            i,
            [
                math.sin(0.01 * ((seed + i) * 131 + d * 17) % 3.1)
                for d in range(64)
            ],
        )
        for i in range(30)
    ]
    rows.append((200, rows[5][1]))  # exact clone of vec 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(df, df.filter(F.col("vec_id") == 5)).collect()
    best = max(r.adc_score for r in out)
    clone = [r for r in out if r.neighbor_id == 200]
    assert clone and clone[0].adc_score == best, (seed, out[:3])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ).filter(lambda e: e[0] != e[1]),
        max_size=25,
    )
)
def test_alternating_star_cc_matches_label_propagation(spark, edges):
    """Large-star/small-star (VERDICT r5 #6) must produce EXACTLY the
    same (node, min-id component) labeling as min-label propagation on
    any graph — including chains (the high-diameter regime the
    alternating algorithm exists for), hubs, and isolated vertices."""
    from etl_developstoday_test_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    nodes = sorted({v for e in und for v in e} | {0, 14})  # force isolates
    e_df = spark.createDataFrame(
        und or [(None, None)], "src long, dst long"
    ).dropna()
    v_df = spark.createDataFrame([(n,) for n in nodes], "node long")

    lp = {
        r["node"]: r["component"]
        for r in connected_components(e_df, v_df).collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(e_df, v_df).collect()
    }
    assert star == lp

    # and both agree with a union-find ground truth
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        parent[find(a)] = find(b)
    comps = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comps.values() for n in members}
    assert lp == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "gold", "iron", "wolf",
                             "moon", "star", "rain", "leaf"]),
            min_size=5,
            max_size=12,
        ).map(" ".join),
        min_size=3,
        max_size=12,
    )
)
def test_incremental_lsh_equals_batch_cross_pairs(spark, texts):
    """The incremental index probe must find EXACTLY the cross-split
    subset of what the batch LSH finds on the union — same pairs, same
    verified Jaccard values — on any corpus and any even/odd split.
    (Within-batch and within-corpus pairs are out of contract: the
    index probe's job is only new-vs-existing.)"""
    from etl_developstoday_test_spark.operators.text_dedup import (
        incremental_minhash_lsh,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    new = docs.filter("doc_id % 2 = 0")
    old = docs.filter("doc_id % 2 = 1")
    got = sorted(
        (min(r["new_doc"], r["old_doc"]), max(r["new_doc"], r["old_doc"]),
         r["jaccard"])
        for r in incremental_minhash_lsh(old, new, n=3, threshold=0.5).collect()
    )
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
        if r["doc_a"] % 2 != r["doc_b"] % 2
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # doc_id
            st.integers(min_value=0, max_value=2),    # stratum
            st.integers(min_value=0, max_value=900),  # weight
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_weighted_reservoir_matches_python_replay(spark, rows, k):
    """The Efraimidis–Spirakis selection must be exactly reproducible
    from the definition: top-k per stratum by round(ln(u)/max(w,1), 9)
    with u the salted-md5 uniform — a pure-Python replay using hashlib
    must pick the identical ids with the identical keys and ranks, on
    any weights (including 0, where the floor-at-1 guard applies)."""
    import hashlib
    import math

    from etl_developstoday_test_spark.operators.sampling import (
        weighted_reservoir_per_stratum,
    )

    df = spark.createDataFrame(rows, "doc_id long, stratum long, w long")
    got = {
        (r["stratum"], r["doc_id"]): (r["es_key"], r["sample_rank"])
        for r in weighted_reservoir_per_stratum(
            df, "stratum", "w", k=k
        ).collect()
    }

    def u(doc_id: int) -> float:
        h = int(hashlib.md5(f"res#{doc_id}".encode()).hexdigest()[:15], 16)
        return (h + 1) / float(1 << 60)

    want = {}
    by_stratum: dict = {}
    for doc_id, stratum, w in rows:
        key = round(math.log(u(doc_id)) / max(float(w), 1.0), 9)
        by_stratum.setdefault(stratum, []).append((key, doc_id))
    for stratum, cands in by_stratum.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (key, doc_id) in enumerate(cands[:k], start=1):
            want[(stratum, doc_id)] = (key, rank)
    assert got == want


# --- BPE merge rounds vs a pure-Python reference trainer -------------------

_bpe_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1,
    max_size=25,
)


def _ref_bpe(words: list[str], rounds: int):
    """Reference BPE (Sennrich get_stats/merge_vocab semantics):
    overlapping pair counts, lexicographic tie-break, greedy leftmost
    non-overlapping merge."""
    from collections import Counter

    freq = Counter(words)
    segs = {w: list(w) for w in freq}
    out = []
    for rnd in range(1, rounds + 1):
        counts = Counter()
        for w, f in freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w in segs:
            s, new, i = segs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            segs[w] = new
        vocab = {sym for s in segs.values() for sym in s}
        total = sum(f * len(segs[w]) for w, f in freq.items())
        out.append((rnd, a, b, cnt, len(vocab), total))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=_bpe_words)
def test_bpe_merge_rounds_matches_reference_trainer(spark, words):
    """On ANY corpus over {a,b,c} (adversarial for overlap handling:
    runs like 'aaaa' are common), the distributed fold must reproduce
    the sequential reference trainer's merges, counts, vocab sizes,
    and token totals for 3 rounds."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_merge_rounds,
    )

    expected = _ref_bpe(words, rounds=3)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = [
        (r.round, r.pair_a, r.pair_b, r.pair_count, r.vocab_size,
         r.total_tokens)
        for r in sorted(
            bpe_merge_rounds(docs, rounds=3).collect(), key=lambda r: r.round
        )
    ]
    assert got == expected


def _ref_bpe_segs(words: list[str], rounds: int) -> dict[str, list[str]]:
    """The reference trainer's final per-word segmentation — its
    encoder. Same merge loop as _ref_bpe, returning segs instead of
    the audit rows."""
    from collections import Counter

    freq = Counter(words)
    segs = {w: list(w) for w in freq}
    for _ in range(rounds):
        counts = Counter()
        for w, f in freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), _cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w in segs:
            s, new, i = segs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            segs[w] = new
    return segs


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs_words=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_bpe_encode_stats_matches_reference_encoder(spark, docs_words):
    """Per-document BPE token counts from bpe_encode_stats must equal
    encoding each document with the sequential reference trainer's
    final segmentation (the merges are corpus-global, the counts
    per-doc)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_encode_stats,
    )

    all_words = [w for ws in docs_words for w in ws]
    segs = _ref_bpe_segs(all_words, rounds=3)
    want = {
        i: (len(ws), sum(len(segs[w]) for w in ws))
        for i, ws in enumerate(docs_words)
    }
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
        for r in bpe_encode_stats(docs, rounds=3).collect()
    }
    assert got == want


# --- round-7 operators -----------------------------------------------------

_url_piece = st.text(
    alphabet="abcdefgh0123456789", min_size=1, max_size=6
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    scheme=st.sampled_from(["http://", "https://", ""]),
    www=st.sampled_from(["www.", "WWW.", ""]),
    host=_url_piece,
    path=st.lists(_url_piece, max_size=3),
    slash=st.booleans(),
    params=st.lists(
        st.tuples(
            st.sampled_from(
                ["id", "q", "href", "xref", "xutm_a", "utm_source",
                 "utm_campaign", "sessionid", "ref"]
            ),
            _url_piece,
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "#x", "#frag/2"]),
)
def test_canonicalize_url_idempotent_and_variant_invariant(
    spark, scheme, www, host, path, slash, params, frag
):
    """canonicalize is (a) idempotent and (b) invariant under the
    variation axes it claims to collapse: any two raw spellings built
    from the same (host, path, non-tracking params) canonicalize to the
    same string."""
    from etl_developstoday_test_spark.functions import canonicalize_url
    from pyspark.sql import functions as F

    base = host + ".com" + "".join("/" + p for p in path)
    q = "&".join(f"{k}={v}" for k, v in params)
    raw = scheme + www + base + ("/" if slash and path else "") + (
        "?" + q if q else ""
    ) + frag
    alt = "https://WWW." + base.upper() + ("?" + q if q else "")
    rows = (
        spark.createDataFrame([(raw,), (alt,)], "u string")
        .select(
            canonicalize_url("u").alias("c1"),
            canonicalize_url(canonicalize_url("u")).alias("c2"),
        )
        .collect()
    )
    for r in rows:
        assert r["c1"] == r["c2"], (raw, r["c1"], r["c2"])
    # same (host, path, query) under different scheme/www/case/slash/
    # fragment spellings must collapse to one canonical key
    assert rows[0]["c1"] == rows[1]["c1"], (raw, alt, rows)


_bp_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=5),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_bp_docs)
def test_boilerplate_conservation_and_threshold(spark, docs):
    """chars_kept + chars_removed == total line chars per doc, and a
    line is flagged iff its distinct-doc frequency >= 2 (checked against
    a python reference)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.text_dedup import (
        boilerplate_line_removal,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_line_removal(
            sdf, F.split(F.col("text"), "\n"), min_docs=2
        ).collect()
    }
    dfreq = Counter()
    for lines in docs:
        for line in set(lines):
            dfreq[line] += 1
    for i, lines in enumerate(docs):
        r = out[i]
        assert r["n_lines"] == len(lines)
        assert r["chars_kept"] + r["chars_removed"] == sum(
            len(x) for x in lines
        )
        want_flagged = sum(1 for x in lines if dfreq[x] >= 2)
        assert r["n_boilerplate_lines"] == want_flagged, (i, lines, dict(r.asDict()))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(min_value=1, max_value=40),
    noise=st.integers(min_value=0, max_value=100),
)
def test_span_corruption_conservation(spark, n_tokens, noise):
    """input + target tokens = n_tokens + 2·sentinels + EOS, masked
    bounded by n_tokens, and noise=0/100 are exact."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        span_corruption_stats,
    )

    docs = spark.createDataFrame(
        [(1, " ".join("t%d" % i for i in range(n_tokens)))],
        "doc_id long, text string",
    )
    r = span_corruption_stats(docs, span_len=3, noise_pct=noise).collect()[0]
    assert 0 <= r["n_masked_tokens"] <= n_tokens
    assert (
        r["n_input_tokens"] + r["n_target_tokens"]
        == r["n_tokens"] + 2 * r["n_spans_masked"] + 1
    )
    if noise == 0:
        assert r["n_spans_masked"] == 0
    if noise == 100:
        assert r["n_masked_tokens"] == n_tokens


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-20, max_value=20, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    target=st.floats(min_value=-5, max_value=5, allow_nan=False),
)
def test_cusum_closed_form_equals_recurrence(spark, vals, target):
    """The prefix-sum/running-min closed form must equal the textbook
    sequential CUSUM recurrence on arbitrary series."""
    from etl_developstoday_test_spark.operators.drift import (
        cusum_changepoints,
    )

    slack, threshold = 0.5, -1.0  # threshold<0 → every row emitted
    rows = [(1, i, round(v, 3)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp int, i int, value double")
    got = {
        r["ord"]: r["cusum"]
        for r in cusum_changepoints(
            df, "value", "i", "grp", target, slack, threshold
        ).collect()
    }
    s = 0.0
    for i, (_, _, v) in enumerate(rows):
        s = max(0.0, s + (v - target - slack))
        assert abs(got[i] - s) < 1e-6, (i, got[i], s)


# --- staged round-8 operators ------------------------------------------------

_stump_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # x1 (small value grid:
        st.integers(min_value=0, max_value=6),   # x2  forces threshold ties)
        st.integers(min_value=-50, max_value=50),  # y
    ),
    min_size=3,
    max_size=25,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_stump_rows)
def test_best_stump_matches_bruteforce_random(spark, rows):
    """best_stump_split == exhaustive search over every (feature,
    observed-threshold) candidate, with the same (gain desc, feature,
    threshold) tie-break — on random integer-grid data where gain ties
    and constant features are common."""
    from etl_developstoday_test_spark.operators.ml import best_stump_split

    data = [(float(a), float(b), float(y)) for a, b, y in rows]
    # exhaustive reference
    best = None
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
    if best is None:
        return  # both features constant: no candidate splits exist
    df = spark.createDataFrame(data, "x1 double, x2 double, y double")
    got = best_stump_split(df, ["x1", "x2"], "y").collect()
    assert len(got) == 1
    assert (got[0]["feature"], got[0]["threshold"]) == (best[1], best[2])
    assert abs(got[0]["gain"] - (-best[0])) < 1e-6


_lpa_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_lpa_edges)
def test_lpa_partition_invariance_and_python_replay(spark, edges):
    """label_propagation_communities is bit-identical across partition
    layouts AND equal to a sequential python replay of the same
    deterministic update rule — the two halves of the determinism
    claim (no partition-order dependence, no hidden randomness)."""
    import collections

    from etl_developstoday_test_spark.operators.graph import (
        label_propagation_communities,
    )

    e = [(a, b) for a, b in edges if a != b]
    if not e:
        return
    nodes = sorted({x for p in e for x in p})
    rounds = 3

    # sequential reference
    sym = collections.defaultdict(set)
    for a, b in e:
        sym[a].add(b)
        sym[b].add(a)
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            cnt = collections.Counter(labels[v] for v in sym[n])
            if cnt:
                new[n] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                new[n] = labels[n]
        labels = new
    m = len({tuple(sorted(p)) for p in e})
    comms = collections.defaultdict(list)
    for n, l in labels.items():
        comms[l].append(n)
    expected = []
    for l, ns in comms.items():
        dc = sum(len(sym[n]) for n in ns)
        ec = sum(
            1
            for a, b in {tuple(sorted(p)) for p in e}
            if labels[a] == l and labels[b] == l
        )
        expected.append((l, len(ns), ec, dc))
    qnum = sum(4 * m * ec - dc * dc for (_, _, ec, dc) in expected)
    q = qnum / (4.0 * m * m)
    expected = sorted(
        [(l, n, ec, dc, q) for (l, n, ec, dc) in expected],
        key=lambda r: (-r[1], r[0]),
    )[:10]

    verts = spark.createDataFrame([(n,) for n in nodes], "node long")
    for nparts in (1, 7):
        edf = spark.createDataFrame(e, "src long, dst long").repartition(
            nparts
        )
        got = [
            tuple(r)
            for r in label_propagation_communities(
                edf, verts, rounds=rounds
            ).collect()
        ]
        assert got == expected, (nparts, got, expected)


_nb_docs = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),  # label
        st.lists(
            st.sampled_from(["x", "y", "z", "w", "q"]),
            min_size=1,
            max_size=6,
        ),
    ),
    min_size=4,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_nb_docs)
def test_naive_bayes_matches_python_replay(spark, docs):
    """naive_bayes_quality == a sequential python replay of the same
    quantized-nanos scoring rule (full vocabulary×label grid with the
    Laplace default for unseen (label, token) cells, OOV-token skip,
    (score, label) argmax, labels unseen in training unmatched) on
    random tiny corpora."""
    import collections
    import math

    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
    )

    rows = [
        (i, " ".join(toks), lab) for i, (lab, toks) in enumerate(docs)
    ]
    test_mod = 3
    train = [(i, t, l) for i, t, l in rows if i % test_mod != 0]
    test = [(i, t, l) for i, t, l in rows if i % test_mod == 0]
    if not train or not test:
        return

    counts: dict = collections.Counter()
    totals: dict = collections.Counter()
    vocab = set()
    for _, t, l in train:
        for tok in t.split():
            counts[(l, tok)] += 1
            totals[l] += 1
            vocab.add(tok)
    prior_counts = collections.Counter(l for _, _, l in train)
    n_train = sum(prior_counts.values())
    priorq = {
        l: round(math.log(c / n_train) * 1e9)
        for l, c in prior_counts.items()
    }
    # full (vocabulary x label) grid: unseen (label, token) cells take
    # the Laplace default ln(1/(tot+V)) — same token multiset for every
    # candidate label
    llq = {
        (l, tok): round(
            math.log(
                (counts.get((l, tok), 0) + 1) / (totals[l] + len(vocab))
            )
            * 1e9
        )
        for l in totals
        for tok in vocab
    }
    expect = collections.Counter()
    correct = collections.Counter()
    for i, t, truth in test:
        expect[truth] += 1
        scores: dict = {}
        for tok in t.split():
            if tok not in vocab:
                continue  # OOV: skipped for ALL labels equally
            for lab in totals:
                scores[lab] = scores.get(lab, 0) + llq[(lab, tok)]
        if not scores:
            continue  # no in-vocabulary token: unpredicted, incorrect
        best = max(
            ((s + priorq[lab], lab) for lab, s in scores.items()),
            key=lambda p: (p[0], [-ord(c) for c in p[1]]),
        )[1]
        if best == truth:
            correct[truth] += 1

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["label"]: (r["n_docs"], r["n_correct"])
        for r in naive_bayes_quality(df, test_mod=test_mod).collect()
    }
    want = {l: (expect[l], correct[l]) for l in expect}
    assert got == want


_ntile_rows = st.lists(
    st.integers(min_value=-1000, max_value=1000),
    min_size=1,
    max_size=120,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_ntile_rows, n_tiles=st.integers(min_value=1, max_value=13))
def test_exact_ntile_equals_global_window_ntile(spark, vals, n_tiles):
    """functions.exact_ntile (range-partitioned rank + broadcast
    cumulative offsets — no single-task stage) assigns the EXACT tile
    SQL-standard ntile assigns, on any input size / tile count /
    physical layout, including N < n_tiles, duplicate values (broken
    by the id tiebreak), and descending orders."""
    from pyspark.sql import Window, functions as F

    from etl_developstoday_test_spark.functions import exact_ntile

    rows = [(i, v) for i, v in enumerate(vals)]
    for nparts in (1, 7):
        df = spark.createDataFrame(rows, "id long, v long").repartition(
            nparts
        )
        got = {
            r["id"]: r["t"]
            for r in exact_ntile(df, n_tiles, ["v", "id"], "t").collect()
        }
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id",
                F.ntile(n_tiles)
                .over(Window.orderBy("v", "id"))
                .alias("t"),
            ).collect()
        }
        assert got == want
        # descending order variant
        got_d = {
            r["id"]: r["t"]
            for r in exact_ntile(
                df, n_tiles, [F.desc("v"), F.col("id")], "t"
            ).collect()
        }
        want_d = {
            r["id"]: r["t"]
            for r in df.select(
                "id",
                F.ntile(n_tiles)
                .over(Window.orderBy(F.desc("v"), "id"))
                .alias("t"),
            ).collect()
        }
        assert got_d == want_d


def test_exact_ntile_rejects_reserved_column_collisions(spark):
    """withColumn silently REPLACES same-named columns, so an input
    already carrying one of exact_ntile's working names (_mid/_pid/
    _lrn/_off/_n, or the requested tile_col) would be corrupted — the
    operator must refuse instead."""
    import pytest

    from etl_developstoday_test_spark.functions import exact_ntile

    df = spark.createDataFrame([(1, 2)], "id long, _pid long")
    with pytest.raises(ValueError, match="_pid"):
        exact_ntile(df, 4, ["id"], "t")
    df2 = spark.createDataFrame([(1, 2)], "id long, t long")
    with pytest.raises(ValueError, match="reserved"):
        exact_ntile(df2, 4, ["id"], "t")


def test_exact_ntile_survives_non_numeric_partition_conf(spark, monkeypatch):
    """Managed platforms may report spark.sql.shuffle.partitions as
    'auto' (OSS Spark validates the conf at set-time, so the read is
    simulated here) — int() must fall back to defaultParallelism
    instead of crashing, and the tiles must still be exact."""
    from pyspark.sql.conf import RuntimeConfig

    from etl_developstoday_test_spark.functions import exact_ntile

    real_get = RuntimeConfig.get

    def fake_get(self, key, *a, **kw):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(self, key, *a, **kw)

    monkeypatch.setattr(RuntimeConfig, "get", fake_get)
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(23)], "id long, v long"
    )
    got = sorted(
        (r["id"], r["t"])
        for r in exact_ntile(df, 4, ["v", "id"], "t").collect()
    )
    # 23 rows into 4 tiles: first 3 tiles get 6 rows, last gets 5
    from collections import Counter

    sizes = Counter(t for _, t in got)
    assert sizes == {1: 6, 2: 6, 3: 6, 4: 5}


_wf_sources = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # avail tokens
        st.integers(min_value=1, max_value=9),       # weight
    ),
    min_size=1,
    max_size=12,
)


def _ref_waterfill(sources, budget):
    """Iterative reference water-filling: repeatedly allocate the
    remaining budget proportionally over unsaturated sources, cap any
    that exceed their avail, repeat until stable. Returns the exact
    rational water level as a float plus the saturated set."""
    remaining = budget
    unsat = dict(enumerate(sources))
    saturated = {}
    while True:
        wsum = sum(w for _, w in unsat.values())
        if wsum == 0:
            lam = 0.0
            break
        lam = remaining / wsum
        newly = {
            i: (a, w) for i, (a, w) in unsat.items() if a <= lam * w
        }
        if not newly:
            break
        for i, (a, w) in newly.items():
            saturated[i] = (a, w)
            remaining -= a
            del unsat[i]
    return lam, set(saturated)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(sources=_wf_sources, pct=st.integers(min_value=1, max_value=100))
def test_waterfill_matches_iterative_reference(spark, sources, pct):
    """waterfill_allocation's closed-form prefix rule == the iterative
    fixed-point reference on any (avail, weight) profile: the same
    saturated set, capped sources get exactly their avail, unsaturated
    sources get floor(lambda*w), and the budget is never exceeded."""
    from etl_developstoday_test_spark.operators.sampling import (
        waterfill_allocation,
    )

    rows = [(f"s{i}", a, w) for i, (a, w) in enumerate(sources)]
    budget = sum(a for a, _ in sources) * pct // 100
    lam, sat_ref = _ref_waterfill(sources, budget)
    df = spark.createDataFrame(
        rows, "source string, avail_tokens long, weight long"
    )
    out = {
        r["source"]: r
        for r in waterfill_allocation(df, budget_pct=pct).collect()
    }
    total_alloc = 0
    for i, (a, w) in enumerate(sources):
        r = out[f"s{i}"]
        assert r["allocated_tokens"] <= a
        if r["saturated"]:
            assert r["allocated_tokens"] == a
        else:
            assert r["allocated_tokens"] == int(lam * w // 1) or (
                # float-order differences between the reference's
                # iterative lambda and the closed form are possible at
                # the last ulp; the INTEGER saturation sets must agree
                abs(r["allocated_tokens"] - lam * w) < 1
            )
        total_alloc += r["allocated_tokens"]
    assert {i for i, (a, w) in enumerate(sources)
            if out[f"s{i}"]["saturated"]} == sat_ref
    assert total_alloc <= budget or all(
        out[f"s{i}"]["saturated"] for i in range(len(sources))
    )


def test_waterfill_rejects_nonpositive_or_null_weights(spark):
    """w <= 0 (or NULL) makes the a/w ordering key NULL under non-ANSI
    division: the row sorts first, never saturates, and its full avail
    silently skews the water level — the operator must raise instead
    (the property suite only generates w in 1..9, so this is the
    explicit guard lock)."""
    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        waterfill_allocation,
    )

    for bad_w in (0, -3, None):
        df = spark.createDataFrame(
            [("a", 100, 2), ("b", 50, bad_w)],
            "source string, avail_tokens long, weight long",
        )
        with pytest.raises(ValueError, match="non-positive weight"):
            waterfill_allocation(df, budget_pct=60)
    # NULL avail is the same invariant breakage
    df = spark.createDataFrame(
        [("a", None, 2)], "source string, avail_tokens long, weight long"
    )
    with pytest.raises(ValueError, match="negative avail"):
        waterfill_allocation(df, budget_pct=60)


def _md5_long_py(s: str) -> int:
    """Python replica of functions.md5_long (15 hex chars = 60 bits)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_wfx_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # source index
        st.integers(min_value=0, max_value=400),   # doc tokens
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_wfx_docs, pct=st.integers(min_value=1, max_value=100))
def test_waterfill_execute_matches_sequential_reference(spark, docs, pct):
    """waterfill_execute NEVER returns a wrong answer: when it returns,
    every source equals the sequential hash-prefix reference (walk docs
    by (md5('wfx#'+id), id), keep while the running token total fits
    the allocation; zero allocations keep nothing by contract) and the
    budget is never exceeded; when it raises, the python replica of
    the certificate confirms some source's pre-filter prefix was
    genuinely unable to prove its boundary (mass <= alloc and < avail
    — e.g. a source holding its tokens in one huge document)."""
    from etl_developstoday_test_spark.operators.sampling import (
        waterfill_allocation,
        waterfill_execute,
    )

    rows = [
        (f"s{src}", i, int(tok)) for i, (src, tok) in enumerate(docs)
    ]
    dt = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    )
    src_rows = {}
    for s, i, t in rows:
        src_rows.setdefault(s, []).append((i, t))
    alloc_in = spark.createDataFrame(
        [
            (s, sum(t for _, t in v), (_md5_long_py(f"wf#{s}") % 9) + 1)
            for s, v in src_rows.items()
        ],
        "source string, avail_tokens long, weight long",
    )
    alloc = waterfill_allocation(alloc_in, budget_pct=pct)
    alloc_map = {
        r["source"]: (r["allocated_tokens"], r["avail_tokens"])
        for r in alloc.collect()
    }

    def surviving_mass(s, v):
        budget, avail = alloc_map[s]
        if budget == avail:
            return avail
        if budget == 0:
            return 0
        hmax = (1 << 60) // max(1, avail // max(1, budget * 4))
        return sum(
            t for i, t in v if _md5_long_py(f"wfx#{i}") < hmax
        )

    ambiguous = [
        s
        for s, v in src_rows.items()
        if alloc_map[s][0] > 0
        and not (
            surviving_mass(s, v) > alloc_map[s][0]
            or surviving_mass(s, v) == alloc_map[s][1]
        )
    ]
    try:
        out = {
            r["source"]: r for r in waterfill_execute(dt, alloc).collect()
        }
    except ValueError:
        assert ambiguous, "raised with no genuinely ambiguous source"
        return
    assert not ambiguous, "returned although the certificate should fire"
    for s, v in src_rows.items():
        budget = alloc_map[s][0]
        cum, nd, tk = 0, 0, 0
        if budget > 0:
            for i, t in sorted(
                v, key=lambda p: (_md5_long_py(f"wfx#{p[0]}"), p[0])
            ):
                if cum + t <= budget:
                    cum += t
                    nd += 1
                    tk += t
                else:
                    break
        r = out[s]
        assert (r["n_docs_kept"], r["tokens_kept"]) == (nd, tk), s
        assert r["tokens_kept"] <= budget


_cc_graph = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=_cc_graph)
def test_clustering_coefficient_matches_bruteforce(spark, pairs):
    """local_clustering_coefficient == the adjacency-set brute force on
    any small graph: per node, triangles = closed neighbor pairs,
    coefficient = 2T/(d(d-1)), degree-<2 nodes excluded."""
    from etl_developstoday_test_spark.operators.graph import (
        local_clustering_coefficient,
    )

    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    if not edges:
        return
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for u, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(
            1
            for v in nb
            for w in nb
            if v < w and w in adj.get(v, set())
        )
        expect[u] = (d, t, round(2 * t / (d * (d - 1)), 6))
    df = spark.createDataFrame(edges, "ua long, ub long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in local_clustering_coefficient(df, top_k=100).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    )
)
def test_two_hop_reach_matches_brute_force(spark, edges):
    """2-hop reach must equal the adjacency-set closure |N(u) ∪
    N(N(u))| \\ {u} on ANY graph — the wedge join must neither
    double-count shared middles nor leak the self node back in."""
    from etl_developstoday_test_spark.operators.graph import two_hop_reach

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    got = [tuple(r) for r in two_hop_reach(df, top_k=100).collect()]

    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = []
    for u in adj:
        reach = set(adj[u])
        for v in adj[u]:
            reach |= adj[v]
        reach.discard(u)
        want.append((u, len(adj[u]), len(reach)))
    want.sort(key=lambda r: (-r[2], r[0]))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    sample_mod=st.integers(min_value=1, max_value=4),
)
def test_two_hop_reach_sampled_matches_filtered_exact(
    spark, edges, sample_mod
):
    """The seeded source-sampled twin must equal the EXACT twin's
    output restricted to md5-sampled sources on ANY graph and any
    sampling factor — source sampling changes WHICH nodes are
    profiled, never a profiled node's value — and sample_mod=1 must
    reproduce the exact twin verbatim."""
    import hashlib

    from etl_developstoday_test_spark.operators.graph import (
        two_hop_reach,
        two_hop_reach_sampled,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    got = [
        tuple(r)
        for r in two_hop_reach_sampled(df, sample_mod, top_k=100).collect()
    ]
    exact = [tuple(r) for r in two_hop_reach(df, top_k=100).collect()]

    def sampled(u: int) -> bool:
        h = int(hashlib.md5(f"r2s#{u}".encode()).hexdigest()[:15], 16)
        return h % sample_mod == 0

    want = [r for r in exact if sampled(r[0])]
    assert got == want
    if sample_mod == 1:
        assert got == exact


def test_two_hop_reach_sampled_rejects_bad_mod(spark):
    import pytest

    from etl_developstoday_test_spark.operators.graph import (
        two_hop_reach_sampled,
    )

    df = spark.createDataFrame([(1, 2)], "ua long, ub long")
    with pytest.raises(ValueError, match="sample_mod"):
        two_hop_reach_sampled(df, 0)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a_vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    b_vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
)
def test_ks_two_sample_matches_python_reference(spark, a_vals, b_vals):
    """The distributed KS row must equal a sequential CDF walk on ANY
    two samples — counts, statistic, argmax value (with the smallest-
    value tiebreak), critical line, and the drift verdict. Integer
    values keep the quantization exact so the reference shares the
    operator's arithmetic precisely."""
    import math

    from etl_developstoday_test_spark.operators.drift import ks_two_sample

    a = spark.createDataFrame([(float(v),) for v in a_vals], "v double")
    b = spark.createDataFrame([(float(v),) for v in b_vals], "v double")
    got = tuple(ks_two_sample(a, b, "v", quantum=100).collect()[0])

    from collections import Counter

    qa, qb = Counter(v * 100 for v in a_vals), Counter(v * 100 for v in b_vals)
    na, nb = len(a_vals), len(b_vals)
    ca = cb = 0
    best_d, best_v = -1.0, None
    for v in sorted(set(qa) | set(qb)):
        ca += qa.get(v, 0)
        cb += qb.get(v, 0)
        d = round(abs(ca / na - cb / nb), 6)
        if d > best_d:
            best_d, best_v = d, v
    crit = 1.358 * math.sqrt((na + nb) / (na * nb))
    want = (na, nb, best_d, best_v / 100, round(crit, 6), best_d > crit)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    old_texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "gold", "iron", "wolf"]),
            min_size=3,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    new_texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "gold", "iron", "wolf"]),
            min_size=3,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
)
def test_ngram_novelty_matches_python_reference(spark, old_texts, new_texts):
    """Per-source novelty must equal the set-algebra reference on ANY
    corpus pair: distinct grams per source, minus the reference gram
    set, one division. Small word alphabet forces heavy overlap — the
    regime where a broken anti join would over- or under-count."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_novelty,
    )

    def grams(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    old = spark.createDataFrame(
        [(i, f"s{i % 2}", t) for i, t in enumerate(old_texts)],
        "doc_id long, source string, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, f"s{i % 3}", t) for i, t in enumerate(new_texts)],
        "doc_id long, source string, text string",
    )
    got = sorted(tuple(r) for r in ngram_novelty(old, new, n=3).collect())

    ref: set[str] = set()
    for t in old_texts:
        ref |= grams(t)
    per_src: dict[str, set[str]] = {}
    for i, t in enumerate(new_texts):
        per_src.setdefault(f"s{i % 3}", set()).update(grams(t))
    want = sorted(
        (
            s,
            len(g),
            len(g - ref),
            round(len(g - ref) / len(g), 6),
        )
        for s, g in per_src.items()
        if g
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a_vals=st.lists(
        st.integers(min_value=0, max_value=99), min_size=1, max_size=80
    ),
    b_vals=st.lists(
        st.integers(min_value=0, max_value=99), min_size=1, max_size=80
    ),
)
def test_js_divergence_matches_python_reference(spark, a_vals, b_vals):
    """The distributed JS row must equal a sequential reference sharing
    the operator's exact quantization (nano-rounded logs, decimal term
    sum) on ANY two integer samples, and respect the [0, ln 2] bound."""
    import math
    from collections import Counter
    from decimal import Decimal

    from etl_developstoday_test_spark.operators.drift import js_divergence

    a = spark.createDataFrame([(float(v),) for v in a_vals], "v double")
    b = spark.createDataFrame([(float(v),) for v in b_vals], "v double")
    got = tuple(
        js_divergence(a, b, "v", n_bins=10, lo=0.0, hi=100.0).collect()[0]
    )

    def bins(vals):
        return Counter(min(9, max(0, math.floor((v - 0.0) / 10.0))) for v in vals)

    ca, cb = bins(a_vals), bins(b_vals)
    na, nb = len(a_vals), len(b_vals)
    total = Decimal(0)
    for k in sorted(set(ca) | set(cb)):
        p, q = ca.get(k, 0) / na, cb.get(k, 0) / nb
        m = (p + q) / 2
        tp = p * (round(math.log(p / m) * 1e9) / 1e9) if p > 0 else 0.0
        tq = q * (round(math.log(q / m) * 1e9) / 1e9) if q > 0 else 0.0
        total += Decimal((tp + tq) / 2).quantize(Decimal("1.0000000000"))
    want = (na, nb, round(float(total), 6))
    assert got[:3] == want
    assert 0.0 <= got[2] <= 0.693148
    assert got[3] == round(math.sqrt(got[2]), 6)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_jaccard_link_prediction_matches_brute_force(spark, pairs):
    """Top-k neighborhood-Jaccard predictions on ANY small graph must
    equal an adjacency-set brute force over non-adjacent distance-2
    pairs (same rounding, same total order)."""
    from etl_developstoday_test_spark.operators.graph import (
        jaccard_link_prediction,
    )

    edges = spark.createDataFrame(pairs, "ua long, ub long")
    got = [tuple(r) for r in jaccard_link_prediction(edges, top_k=100).collect()]

    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    eset = set(pairs)
    want = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in eset:
                continue
            common = len(adj[u] & adj[v])
            if common == 0:
                continue
            want.append(
                (u, v, common, round(common / len(adj[u] | adj[v]), 6))
            )
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want[:100]


_EVT = st.tuples(
    st.integers(min_value=0, max_value=5),           # user
    st.integers(min_value=0, max_value=30),          # minute
    st.sampled_from(["view", "click", "purchase"]),  # type
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(evts=st.lists(_EVT, min_size=1, max_size=60))
def test_funnel_conversion_matches_python_reference(spark, evts):
    """The funnel card on ANY event set must equal a sequential
    first-anchor walk (strict-after semantics), and can only narrow."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        funnel_conversion,
    )

    rows = [
        (u, dt.datetime(2026, 1, 1, 0, m), ty) for u, m, ty in evts
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = [tuple(r) for r in funnel_conversion(ev).collect()]

    by_user: dict[int, list] = {}
    for u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    n1 = n2 = n3 = 0
    for u, es in by_user.items():
        t1 = min((ts for ts, ty in es if ty == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min(
            (ts for ts, ty in es if ty == "click" and ts > t1), default=None
        )
        if t2 is None:
            continue
        n2 += 1
        if any(ty == "purchase" and ts > t2 for ts, ty in es):
            n3 += 1
    want = [
        (1, "view", n1, 1.0 if n1 else 0.0, 1.0 if n1 else 0.0),
        (2, "click", n2,
         round(n2 / n1, 6) if n1 else 0.0,
         round(n2 / n1, 6) if n1 else 0.0),
        (3, "purchase", n3,
         round(n3 / n2, 6) if n2 else 0.0,
         round(n3 / n1, 6) if n1 else 0.0),
    ]
    assert got == want
    assert got[0][2] >= got[1][2] >= got[2][2]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=30
    )
)
def test_user_gini_matches_sequential_reference(spark, counts):
    """The closed-form (count, multiplicity) block Gini must equal the
    textbook sorted-rank formula (shared quantization: per-block double
    terms, decimal sum, fixed-order final tree) on ANY count multiset,
    and stay inside [0, 1)."""
    from collections import Counter
    from decimal import Decimal

    from etl_developstoday_test_spark.operators.events_etl import (
        user_gini_concentration,
    )

    rows = [(u,) for u, c in enumerate(counts) for _ in range(c)]
    ev = spark.createDataFrame(rows, "user_id long")
    got = tuple(user_gini_concentration(ev).collect()[0])

    mult = Counter(counts)
    s, total = 0, Decimal(0)
    for c in sorted(mult):
        m = mult[c]
        total += Decimal(
            float(c) * float(m * s + m * (m + 1) // 2)
        ).quantize(Decimal("1.000000"))
        s += m
    n, t = len(counts), sum(counts)
    raw = (2.0 * float(total) / (float(n) * float(t))
           - (float(n) + 1.0) / float(n))
    # HALF_UP on the double's shortest decimal repr — Spark's F.round
    # semantics (BigDecimal.valueOf + setScale HALF_UP). Python's
    # round() is HALF_EVEN and diverges on exact half-ulp ties
    # (hypothesis found counts=[1,1,26,36]: gini = 0.5078125 exactly,
    # where the engine and its DuckDB oracle both say 0.507813 and
    # banker's rounding says 0.507812 — the reference was wrong, not
    # the engine).
    from decimal import ROUND_HALF_UP

    want = float(
        Decimal(repr(raw)).quantize(
            Decimal("1.000000"), rounding=ROUND_HALF_UP
        )
    )
    assert got == (n, t, want)
    assert 0.0 <= got[2] < 1.0


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    evts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_user_type_entropy_matches_sequential_reference(spark, evts):
    """Per-user entropy must equal a sequential reference sharing the
    operator's quantization (nano-rounded ln, decimal term sum) on ANY
    event multiset, bounded by ln(n_types)."""
    import math
    from collections import Counter
    from decimal import Decimal

    from etl_developstoday_test_spark.operators.events_etl import (
        user_type_entropy,
    )

    ev = spark.createDataFrame(evts, "user_id long, event_type string")
    got = [
        tuple(r)
        for r in user_type_entropy(ev, min_events=1, k=10_000).collect()
    ]

    per_user: dict[int, Counter] = {}
    for u, t in evts:
        per_user.setdefault(u, Counter())[t] += 1
    want = []
    for u, cnt in per_user.items():
        n = sum(cnt.values())
        total = Decimal(0)
        for c in cnt.values():
            p = c / n
            total += Decimal(
                p * (round(math.log(p) * 1e9) / 1e9)
            ).quantize(Decimal("1.0000000000"))
        want.append((u, n, len(cnt), round(-float(total), 6)))
    want.sort(key=lambda r: (-r[3], r[0]))
    assert got == want
    assert all(r[3] <= math.log(r[2]) + 1e-6 for r in got)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    offsets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=3,
        max_size=60,
        unique=True,
    )
)
def test_burstiness_matches_sequential_reference(spark, offsets):
    """Per-user burstiness must equal a sequential reference sharing
    the operator's arithmetic (exact integer gaps, decimal sums,
    fixed-order double tree) on ANY event-offset multiset, and stay in
    [−1, 1)."""
    import math
    from datetime import datetime, timedelta
    from decimal import Decimal

    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_burstiness,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (u, t0 + timedelta(seconds=o), i)
        for i, (u, o) in enumerate(offsets)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    got = [
        tuple(r)
        for r in interarrival_burstiness(ev, min_gaps=2, k=10_000).collect()
    ]

    per_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, o) in enumerate(offsets):
        per_user.setdefault(u, []).append((o, i))
    want = []
    for u, evs in per_user.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if len(gaps) < 2 or sum(gaps) == 0:
            continue
        n = len(gaps)
        s1 = Decimal(0)
        s2 = Decimal(0)
        for g in gaps:
            s1 += Decimal(g).quantize(Decimal("1.0000000000"))
            s2 += Decimal(float(g) * float(g)).quantize(
                Decimal("1.0000000000")
            )
        fn, f1, f2 = float(n), float(s1), float(s2)
        mu = f1 / fn
        var = max(f2 / fn - (f1 / fn) * (f1 / fn), 0.0)
        sig = math.sqrt(var)
        want.append((u, n, round(mu, 6), round((sig - mu) / (sig + mu), 6)))
    want.sort(key=lambda r: (-r[3], r[0]))
    assert got == want
    assert all(-1.0 <= r[3] < 1.0 for r in got)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=120
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_topk_key_share_matches_sequential_reference(spark, keys, k):
    """The skew profile must equal a sequential count/sort/prefix
    reference on ANY key multiset: exact counts, 6-dp shares, monotone
    cumulative share ending at the true head mass."""
    from collections import Counter

    from etl_developstoday_test_spark.operators.skew import topk_key_share

    df = spark.createDataFrame([(v,) for v in keys], "k long")
    got = [tuple(r) for r in topk_key_share(df, "k", k=k).collect()]

    cnt = Counter(keys)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    t, cum, want = float(len(keys)), 0, []
    for i, (key, c) in enumerate(top, start=1):
        cum += c
        want.append(
            (i, key, c, round(float(c) / t, 6), round(float(cum) / t, 6))
        )
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr"]),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_decile_thresholds_match_sequential_reference(spark, docs):
    """Per-group decile thresholds must equal the integer-CDF
    definition (smallest v with 10·|{x ≤ v}| ≥ d·n) on ANY score
    multiset; 9 monotone thresholds per group."""
    from etl_developstoday_test_spark.operators.sampling import (
        quality_decile_thresholds,
    )

    df = spark.createDataFrame(
        [(g, "t", v) for g, v in docs], "lang string, text string, n_chars long"
    )
    got = [tuple(r) for r in quality_decile_thresholds(df).collect()]

    want = []
    per_g: dict[str, list[int]] = {}
    for g, v in docs:
        per_g.setdefault(g, []).append(v)
    for g in sorted(per_g):
        vals = sorted(per_g[g])
        n = len(vals)
        for d in range(1, 10):
            thr = next(
                v
                for v in vals
                if 10 * sum(1 for x in vals if x <= v) >= d * n
            )
            want.append((g, d, thr, n))
    assert got == want
    for g in per_g:
        ts = [r[2] for r in got if r[0] == g]
        assert ts == sorted(ts) and len(ts) == 9


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    child=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
        min_size=1,
        max_size=60,
    ),
    parent=st.lists(
        st.integers(min_value=0, max_value=20), max_size=20, unique=True
    ),
)
def test_fk_orphan_audit_matches_sequential_reference(spark, child, parent):
    """The orphan card must equal a set-membership reference on ANY
    child/parent key multiset: NULLs apart from orphans, exact counts,
    one 6-dp rate."""
    from etl_developstoday_test_spark.operators.dq import fk_orphan_audit

    cdf = spark.createDataFrame([(v,) for v in child], "fk long")
    pdf = spark.createDataFrame(
        [(v,) for v in parent] or [(None,)], "pk long"
    )
    got = tuple(
        fk_orphan_audit([("r", cdf, "fk", pdf, "pk")]).collect()[0]
    )
    pset = set(parent)
    n_null = sum(1 for v in child if v is None)
    n_orph = sum(1 for v in child if v is not None and v not in pset)
    want = ("r", len(child), n_null, n_orph,
            round(n_orph / len(child), 6))
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    evts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_top_event_paths_matches_sequential_reference(spark, evts):
    """Top paths must equal a per-user sliding-window reference on ANY
    event stream (overlap counted, (count DESC, path ASC) order)."""
    from collections import Counter
    from datetime import datetime, timedelta

    from etl_developstoday_test_spark.operators.events_etl import (
        top_event_paths,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (u, t0 + timedelta(seconds=i), i, t)
        for i, (u, t) in enumerate(evts)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = [tuple(r) for r in top_event_paths(ev, k=10_000).collect()]

    per_user: dict[int, list[str]] = {}
    for u, t in evts:
        per_user.setdefault(u, []).append(t)
    cnt = Counter(
        ">".join(seq[i : i + 3])
        for seq in per_user.values()
        for i in range(len(seq) - 2)
    )
    tot = sum(cnt.values())
    want = sorted(
        ((p, c, round(c / tot, 6)) for p, c in cnt.items()),
        key=lambda r: (-r[1], r[0]),
    )
    assert got == want


def _round_half_up(x: float) -> float:
    import math

    f = math.floor(x)
    return f + 1.0 if x - f >= 0.5 else f


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_adamic_adar_matches_brute_force(spark, pairs):
    """Top-k Adamic-Adar on ANY small graph must equal an
    adjacency-set brute force sharing the operator's quantization
    (nano-rounded ln, decimal term sum)."""
    import math

    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction,
    )

    edges = spark.createDataFrame(pairs, "ua long, ub long")
    got = [
        tuple(r)
        for r in adamic_adar_link_prediction(edges, top_k=1000).collect()
    ]

    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    eset = set(pairs)
    want = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in eset:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            total = 0  # exact integer pico sum — the operator's contract
            for w in sorted(common):
                lnq = round(math.log(len(adj[w])) * 1e9) / 1e9
                total += int(_round_half_up((1.0 / lnq) * 1e12))
            want.append((u, v, len(common), round(total / 1e12, 6)))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=1,
                max_size=8,
            ),
        ),
        min_size=2,
        max_size=30,
    ).filter(lambda d: len({g for g, _ in d}) >= 2)
)
def test_source_vocab_js_matches_sequential_reference(spark, docs):
    """Pairwise source JS must equal a sequential reference sharing
    the operator's quantization on ANY corpus, bounded by ln 2."""
    import math
    from collections import Counter
    from decimal import Decimal

    from etl_developstoday_test_spark.operators.text_analysis import (
        source_vocab_js,
    )

    df = spark.createDataFrame(
        [(g, " ".join(toks)) for g, toks in docs],
        "source string, text string",
    )
    got = [tuple(r) for r in source_vocab_js(df).collect()]

    per_s: dict[str, Counter] = {}
    for g, toks in docs:
        per_s.setdefault(g, Counter()).update(toks)
    vocab = sorted({t for c in per_s.values() for t in c})
    want = []
    for sa in sorted(per_s):
        for sb in sorted(per_s):
            if not sa < sb:
                continue
            ta = sum(per_s[sa].values())
            tb = sum(per_s[sb].values())
            total = Decimal(0)
            for t in vocab:
                p, q = per_s[sa].get(t, 0) / ta, per_s[sb].get(t, 0) / tb
                m = (p + q) / 2
                tp = (
                    p * (round(math.log(p / m) * 1e9) / 1e9)
                    if p > 0
                    else 0.0
                )
                tq = (
                    q * (round(math.log(q / m) * 1e9) / 1e9)
                    if q > 0
                    else 0.0
                )
                total += Decimal((tp + tq) / 2).quantize(
                    Decimal("1.0000000000")
                )
            js = round(float(total), 6)
            want.append((sa, sb, ta, tb, js, round(math.sqrt(js), 6)))
    assert got == want
    assert all(0.0 <= r[4] <= 0.693148 for r in got)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.lists(
                st.floats(
                    min_value=-3.0,
                    max_value=3.0,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_norm_profile_matches_sequential_reference(spark, vecs):
    """The pico-scale norm profile must equal a sequential reference
    sharing the exact integer construction on ANY float vectors."""
    import math

    from etl_developstoday_test_spark.operators.similarity import (
        norm_profile,
    )

    embs = spark.createDataFrame(
        [(i, v, lbl) for i, (lbl, v) in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = [tuple(r) for r in norm_profile(embs).collect()]

    import struct

    def f32(x):  # the parquet/createDataFrame float32 round-trip
        return struct.unpack("f", struct.pack("f", x))[0]

    per_l: dict[int, list[int]] = {}
    for lbl, v in vecs:
        pico = sum(
            math.floor(f32(x) * f32(x) * 1e12 + 0.5) for x in v
        )
        per_l.setdefault(lbl, []).append(pico)
    want = []
    for lbl in sorted(per_l):
        ps = per_l[lbl]
        n = len(ps)
        s1, s2 = sum(ps), sum(p * p for p in ps)
        mu = float(s1) / float(n)
        sig = math.sqrt(
            max(float(s2) / float(n) - (float(s1) / float(n)) ** 2, 0.0)
        )
        want.append(
            (
                lbl,
                n,
                round(math.sqrt(mu / 1e12), 6),
                round(sig / 1e12, 6),
                sum(1 for p in ps if float(p) < mu - 3.0 * sig),
                sum(1 for p in ps if float(p) > mu + 3.0 * sig),
            )
        )
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_uniqueness_audit_matches_sequential_reference(spark, rows):
    """The uniqueness card must equal a Counter reference on ANY key
    multiset: NULL-component keys apart, exact distinct/violation/
    excess counts."""
    from collections import Counter

    from etl_developstoday_test_spark.operators.dq import uniqueness_audit

    df = spark.createDataFrame(rows, "k1 long, k2 long")
    got = tuple(
        uniqueness_audit([("r", df, ["k1", "k2"])]).collect()[0]
    )
    nonnull = [r for r in rows if r[0] is not None and r[1] is not None]
    cnt = Counter(nonnull)
    viol = [c for c in cnt.values() if c > 1]
    want = (
        "r",
        len(rows),
        len(rows) - len(nonnull),
        len(cnt),
        len(viol),
        sum(c - 1 for c in viol),
        len(viol) == 0,
    )
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=100),
            min_size=1,
            max_size=5,
        ),
        min_size=3,
        max_size=25,
    ).filter(
        # at least two distinct daily means on both pair sides
        lambda days: len({sum(d) / len(d) for d in days[:-1]}) > 1
        and len({sum(d) / len(d) for d in days[1:]}) > 1
    )
)
def test_daily_autocorr_matches_sequential_reference(spark, vals):
    """The lag-1 autocorrelation must equal a sequential reference
    sharing the operator's arithmetic (micro-quantized long daily
    sums, decimal moments over the bounded days table, fixed-order
    Pearson tree) on ANY gap-free daily series, and sit in [-1, 1]."""
    import math
    from datetime import datetime, timedelta
    from decimal import Decimal

    from etl_developstoday_test_spark.operators.drift import (
        daily_autocorr_lag1,
    )

    t0 = datetime(2024, 3, 1)
    rows = [
        (t0 + timedelta(days=i), float(v))
        for i, day in enumerate(vals)
        for v in day
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    got = tuple(daily_autocorr_lag1(ev, "value").collect()[0])

    means = []
    for day in vals:
        s = sum(int(math.floor(float(v) * 1e6 + 0.5)) for v in day)
        means.append(float(s) / 1e6 / float(len(day)))
    pairs = list(zip(means, means[1:]))

    def dsum10(xs):
        return float(
            sum(
                (Decimal(x).quantize(Decimal("1.0000000000")) for x in xs),
                Decimal(0),
            )
        )

    n = float(len(pairs))
    sa = dsum10([a for a, _ in pairs])
    sb = dsum10([b for _, b in pairs])
    sab = dsum10([a * b for a, b in pairs])
    saa = dsum10([a * a for a, _ in pairs])
    sbb = dsum10([b * b for _, b in pairs])
    r = (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    assert got == (len(vals), len(pairs), round(r, 6))
    assert -1.0 <= got[2] <= 1.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=9), min_size=3, max_size=10
        ),
        min_size=4,
        max_size=40,
    )
)
def test_heaps_fit_matches_sequential_reference(spark, docs):
    """The Heaps curve must equal a hashlib-md5 sequential reference
    (first-seen buckets, cumulative counts, quantized-log least
    squares) on ANY corpus — or raise identically when fewer than two
    distinct prefix points exist."""
    import hashlib
    import math
    from decimal import Decimal

    import pytest

    from etl_developstoday_test_spark.operators.text_analysis import (
        heaps_law_fit,
    )

    df = spark.createDataFrame(
        [(i, " ".join(f"t{w}" for w in ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )

    def bucket(doc_id):
        h = hashlib.md5(f"heaps#{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) % 10

    first_seen: dict[str, int] = {}
    per_bucket = [0] * 10
    for i, ws in enumerate(docs):
        toks = [f"t{w}" for w in ws]
        b = bucket(i)
        for j in range(len(toks) - 2):
            g = " ".join(toks[j : j + 3])
            per_bucket[b] += 1
            if g not in first_seen or first_seen[g] > b:
                first_seen[g] = b
    new_vocab = [0] * 10
    for fb in first_seen.values():
        new_vocab[fb] += 1
    curve = []
    nt = vs = 0
    for b in range(10):
        nt += per_bucket[b]
        vs += new_vocab[b]
        if nt > 0 and vs > 0:
            curve.append((b, nt, vs))

    if len({c[1] for c in curve}) < 2:
        with pytest.raises(ValueError, match="non-empty prefixes"):
            heaps_law_fit(df)
        return
    got = [tuple(r) for r in heaps_law_fit(df).collect()]

    def lnq(x):
        return round(math.log(x) * 1e9) / 1e9

    pts = [(lnq(float(c[1])), lnq(float(c[2]))) for c in curve]

    def dsum10(xs):
        return float(
            sum(
                (Decimal(x).quantize(Decimal("1.0000000000")) for x in xs),
                Decimal(0),
            )
        )

    n = float(len(pts))
    sx = dsum10([x for x, _ in pts])
    sy = dsum10([y for _, y in pts])
    sxy = dsum10([x * y for x, y in pts])
    sxx = dsum10([x * x for x, _ in pts])
    beta = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert got == [(b, t, v, beta) for b, t, v in curve]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=40,
    ),
    intervals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(-20, 520)),
        min_size=1, max_size=25,
    ),
    bucket_s=st.integers(min_value=1, max_value=600),
)
def test_interval_bucket_join_matches_brute_force(
    spark, points, intervals, bucket_s
):
    """Bucket blocking must be LOSSLESS at ANY bucket width: the pair
    multiset equals the brute-force theta join (same key, start <= ts
    <= end), with empty intervals (end < start) contributing nothing
    and each qualifying pair emitted exactly once."""
    from datetime import datetime, timedelta

    from etl_developstoday_test_spark.operators.asof import (
        interval_bucket_join,
    )

    t0 = datetime(2024, 6, 1)

    def ts(s):
        return t0 + timedelta(seconds=s)

    pdf = spark.createDataFrame(
        [(k, ts(s), i) for i, (k, s) in enumerate(points)],
        "k long, ts timestamp, pid long",
    )
    idf = spark.createDataFrame(
        [(k, ts(a), ts(b), j) for j, (k, a, b) in enumerate(intervals)],
        "k long, lo timestamp, hi timestamp, iid long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_bucket_join(
            pdf, idf, "k", "ts", "lo", "hi",
            bucket_micros=bucket_s * 1_000_000,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (pk, s) in enumerate(points)
        for j, (ik, a, b) in enumerate(intervals)
        if pk == ik and a <= s <= b
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
def test_rich_club_matches_brute_force(spark, edges):
    """phi(k) must equal the brute-force definition — edges among
    degree->k nodes over n_k-choose-2 — on ANY graph, for every k with
    at least two rich nodes."""
    from etl_developstoday_test_spark.operators.graph import (
        rich_club_coefficient,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    ks = [0, 1, 2, 3, 4]
    got = [
        tuple(r) for r in rich_club_coefficient(df, k_values=ks).collect()
    ]

    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = []
    for k in ks:
        rich = {u for u, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        e_k = sum(1 for a, b in und if a in rich and b in rich)
        phi = round(2.0 * e_k / (len(rich) * (len(rich) - 1)), 6)
        want.append((k, len(rich), e_k, phi))
    assert got == want


def _md5_sampled(salt: str, u: int, mod: int) -> bool:
    import hashlib

    h = int(hashlib.md5(f"{salt}{u}".encode()).hexdigest()[:15], 16)
    return h % mod == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    sample_mod=st.integers(min_value=1, max_value=4),
)
def test_local_bridges_sampled_matches_filtered_exact(
    spark, edges, sample_mod
):
    """The lower-endpoint-sampled bridge audit must report EXACTLY the
    full graph's local bridges restricted to md5-sampled lower
    endpoints on ANY graph (no false bridges: the closed-pair evidence
    for a sampled pair is complete), with n_bridges/bridge_share
    recomputed over the sampled edge subset; sample_mod=1 reproduces
    the exact twin verbatim."""
    from etl_developstoday_test_spark.operators.graph import (
        local_bridges,
        local_bridges_sampled,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    got = [
        tuple(r)
        for r in local_bridges_sampled(df, sample_mod, top_k=1000).collect()
    ]
    exact = [tuple(r) for r in local_bridges(df, top_k=1000).collect()]
    if sample_mod == 1:
        assert got == exact
        return
    want_pairs = [
        r[:3] for r in exact if _md5_sampled("lbs#", r[0], sample_mod)
    ]
    assert [r[:3] for r in got] == want_pairs
    n_sampled_edges = sum(
        1 for a, _b in und if _md5_sampled("lbs#", a, sample_mod)
    )
    for r in got:
        assert r[3] == len(want_pairs)
        assert r[4] == round(len(want_pairs) / n_sampled_edges, 6)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    sample_mod=st.integers(min_value=1, max_value=4),
)
def test_jaccard_sampled_matches_filtered_exact(spark, edges, sample_mod):
    """The candidate-sampled Jaccard ranking must equal the exact
    twin's output restricted to md5-sampled lower endpoints on ANY
    graph — sampling changes WHICH candidate pairs are ranked, never a
    ranked pair's common count or Jaccard; sample_mod=1 reproduces the
    exact twin verbatim."""
    from etl_developstoday_test_spark.operators.graph import (
        jaccard_link_prediction,
        jaccard_link_prediction_sampled,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    got = [
        tuple(r)
        for r in jaccard_link_prediction_sampled(
            df, sample_mod, top_k=1000
        ).collect()
    ]
    exact = [
        tuple(r) for r in jaccard_link_prediction(df, top_k=1000).collect()
    ]
    want = [r for r in exact if _md5_sampled("jls#", r[0], sample_mod)]
    assert got == want
    if sample_mod == 1:
        assert got == exact


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    sample_mod=st.integers(min_value=1, max_value=4),
)
def test_adamic_adar_sampled_matches_filtered_exact(
    spark, edges, sample_mod
):
    """The candidate-sampled Adamic-Adar ranking must equal the exact
    twin's output restricted to md5-sampled lower endpoints on ANY
    graph; sample_mod=1 reproduces the exact twin verbatim."""
    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction,
        adamic_adar_link_prediction_sampled,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    got = [
        tuple(r)
        for r in adamic_adar_link_prediction_sampled(
            df, sample_mod, top_k=1000
        ).collect()
    ]
    exact = [
        tuple(r)
        for r in adamic_adar_link_prediction(df, top_k=1000).collect()
    ]
    want = [r for r in exact if _md5_sampled("aas#", r[0], sample_mod)]
    assert got == want
    if sample_mod == 1:
        assert got == exact


def test_sampled_wedge_twins_reject_bad_mod(spark):
    import pytest

    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction_sampled,
        jaccard_link_prediction_sampled,
        local_bridges_sampled,
    )

    df = spark.createDataFrame([(1, 2)], "ua long, ub long")
    for fn in (
        local_bridges_sampled,
        jaccard_link_prediction_sampled,
        adamic_adar_link_prediction_sampled,
    ):
        with pytest.raises(ValueError, match="sample_mod"):
            fn(df, 0)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
def test_kcore_capped_card_upper_bounds_and_certifies(spark, edges, rounds):
    """The capped-round card must (a) equal the EXACT coreness
    histogram with converged=True when given enough rounds (40 —
    far past any 12-vertex fixpoint), and (b) at ANY round budget
    dominate the exact histogram in the upper-tail sense (estimates
    are monotone non-increasing toward the coreness, so for every k
    the capped count of nodes with est >= k can never undershoot the
    exact count with coreness >= k) while partitioning all vertices."""
    from collections import Counter

    from etl_developstoday_test_spark.operators.graph import (
        kcore_decomposition,
        kcore_upper_bound_card,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    nodes = sorted({v for e in und for v in e})
    vdf = spark.createDataFrame([(n,) for n in nodes], "node long")

    exact = Counter(
        r["coreness"]
        for r in kcore_decomposition(
            df, vdf, src="ua", dst="ub", node="node"
        ).collect()
    )

    full = [
        tuple(r)
        for r in kcore_upper_bound_card(
            df, vdf, src="ua", dst="ub", node="node", rounds=40
        ).collect()
    ]
    assert all(r[3] is True and r[2] == 0 for r in full)
    assert {(r[0], r[1]) for r in full} == set(exact.items())

    capped = [
        tuple(r)
        for r in kcore_upper_bound_card(
            df, vdf, src="ua", dst="ub", node="node", rounds=rounds
        ).collect()
    ]
    got = Counter()
    for ub, n_nodes, _chg, _conv in capped:
        got[ub] = n_nodes
    assert sum(got.values()) == len(nodes)
    ks = set(got) | set(exact)
    for k in ks:
        cap_tail = sum(v for u, v in got.items() if u >= k)
        exact_tail = sum(v for u, v in exact.items() if u >= k)
        assert cap_tail >= exact_tail


def test_kcore_capped_card_rejects_bad_rounds(spark):
    import pytest

    from etl_developstoday_test_spark.operators.graph import (
        kcore_upper_bound_card,
    )

    df = spark.createDataFrame([(1, 2)], "ua long, ub long")
    vdf = spark.createDataFrame([(1,), (2,)], "node long")
    with pytest.raises(ValueError, match="rounds"):
        kcore_upper_bound_card(df, vdf, src="ua", dst="ub", rounds=0)


# --- STAGED r14 operator properties -----------------------------------------


def test_conversion_lag_card_fixture(spark):
    """Hand fixture: a clean converter lands in its lag bucket; a user
    whose only purchase PRECEDES first exposure starts but never
    converts; a purchase-only user is in neither count."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        conversion_lag_card,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", "view", t0),
        ("u1", "purchase", t0 + dt.timedelta(hours=7)),
        ("u2", "purchase", t0),
        ("u2", "view", t0 + dt.timedelta(hours=1)),
        ("u3", "click", t0),
        ("u4", "purchase", t0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp"
    )
    out = [tuple(r) for r in conversion_lag_card(ev).collect()]
    assert out == [(1, 6, 1, 3, 1, round(1 / 3, 6))]
    import pytest

    with pytest.raises(ValueError, match="bucket_hours"):
        conversion_lag_card(ev, bucket_hours=0)


def test_page_hinkley_constant_and_jump(spark):
    """A constant daily series never alarms (every deviation term is
    exactly -delta, so m_t is its own running min and ph = 0); a clean
    level jump alarms after the jump and never before it."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.drift import (
        page_hinkley_daily,
    )

    t0 = dt.datetime(2024, 1, 1)
    const = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), 10.0) for i in range(12)],
        "ts timestamp, value double",
    )
    rows = [tuple(r) for r in page_hinkley_daily(const, "value").collect()]
    assert all(r[3] == 0.0 and r[4] is False for r in rows)
    jump = spark.createDataFrame(
        [
            (t0 + dt.timedelta(days=i), 10.0 if i < 10 else 20.0)
            for i in range(20)
        ],
        "ts timestamp, value double",
    )
    rows = [tuple(r) for r in page_hinkley_daily(jump, "value").collect()]
    assert not any(r[4] for r in rows[:10])
    assert any(r[4] for r in rows[10:])
    import pytest

    empty = spark.createDataFrame([], "ts timestamp, value double")
    with pytest.raises(ValueError, match="no days"):
        page_hinkley_daily(empty, "value")


def test_cusum_twosided_directions_and_mirror(spark):
    """A series strictly below target alarms only DOWN; negating both
    the series and the target mirrors every alarm to the other side
    with the identical statistic (the two recurrences are exact
    decimal negations of each other)."""
    from etl_developstoday_test_spark.operators.drift import (
        cusum_changepoints_twosided,
    )

    vals = [1.0, 2.0, 1.5, 2.5, 1.0, 2.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, ord long, value double",
    )
    down = sorted(
        tuple(r)
        for r in cusum_changepoints_twosided(
            df, "value", "ord", "grp", target=10.0, slack=0.5, threshold=20.0
        ).collect()
    )
    assert down and all(r[3] == "down" for r in down)
    mirrored_df = spark.createDataFrame(
        [("g", i, -v) for i, v in enumerate(vals)],
        "grp string, ord long, value double",
    )
    up = sorted(
        tuple(r)
        for r in cusum_changepoints_twosided(
            mirrored_df, "value", "ord", "grp",
            target=-10.0, slack=0.5, threshold=20.0,
        ).collect()
    )
    assert [(r[0], r[1], r[4]) for r in up] == [
        (r[0], r[1], r[4]) for r in down
    ]
    assert all(r[3] == "up" for r in up)


def test_term_burstiness_fixture(spark):
    """Hand fixture: cf/df exact; hapax-heavy tokens fall to min_df;
    ordering (burstiness DESC, cf DESC, token ASC)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        term_burstiness,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "b c"), (3, "b c c")],
        "doc_id long, text string",
    )
    out = [tuple(r) for r in term_burstiness(docs, min_df=2).collect()]
    assert out == [("c", 3, 2, 1.5), ("b", 3, 3, 1.0)]
    import pytest

    with pytest.raises(ValueError, match="min_df"):
        term_burstiness(docs, min_df=0)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    )
)
def test_degree_gini_matches_brute_force(spark, edges):
    """The rank-block Gini and Freeman centralization must equal the
    textbook sorted-degree formulas on ANY graph."""
    from etl_developstoday_test_spark.operators.graph import (
        degree_gini_centralization,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges}
    df = spark.createDataFrame(sorted(und), "ua long, ub long")
    row = degree_gini_centralization(df).collect()[0]

    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = sorted(deg.values())
    n, t = len(xs), sum(xs)
    srank = sum((i + 1) * x for i, x in enumerate(xs))
    gini = round(2.0 * srank / (n * t) - (n + 1.0) / n, 6)
    assert row["n_nodes"] == n
    assert row["n_edges"] == len(und)
    assert row["max_degree"] == max(xs)
    assert row["degree_gini"] == gini
    if n >= 3:
        centr = round(
            (n * max(xs) - t) / ((n - 1.0) * (n - 2.0)), 6
        )
        assert row["centralization"] == centr
    else:
        assert row["centralization"] is None


def test_degree_gini_star_is_maximally_centralized(spark):
    from etl_developstoday_test_spark.operators.graph import (
        degree_gini_centralization,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "ua long, ub long"
    )
    row = degree_gini_centralization(star).collect()[0]
    assert row["centralization"] == 1.0
    assert row["degree_gini"] == 0.3


def test_fk_fanout_profile_fixture(spark):
    """Zero-child parents counted; NULL-FK children excluded; orphan
    children (no parent row) never create a parent bucket."""
    from etl_developstoday_test_spark.operators.dq import fk_fanout_profile

    parents = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    children = spark.createDataFrame(
        [(1,), (1,), (3,), (None,), (9,)], "fk long"
    )
    out = [
        tuple(r)
        for r in fk_fanout_profile(parents, children, "pk", "fk").collect()
    ]
    # p1 -> 2 children, p2 -> 0, p3 -> 1; NULL and orphan fk=9 excluded
    assert out == [
        (0, 1, 3, 3, 1.0),
        (1, 1, 3, 3, 1.0),
        (2, 1, 3, 3, 1.0),
    ]


def test_wilson_ci_matches_reference_and_raises_empty(spark):
    import math

    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        proportion_wilson_ci,
    )

    df = spark.createDataFrame(
        [(True,), (False,), (False,), (False,)], "f boolean"
    )
    row = proportion_wilson_ci(df, "f").collect()[0]
    z, n, k = 1.959964, 4.0, 1.0
    p = k / n
    zz = z * z
    denom = 1.0 + zz / n
    center = (p + zz / (2.0 * n)) / denom
    half = z * math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n)) / denom
    assert (row["n_rows"], row["n_true"]) == (4, 1)
    assert row["p_hat"] == 0.25
    assert row["ci_lo"] == round(center - half, 6)
    assert row["ci_hi"] == round(center + half, 6)
    assert 0.0 < row["ci_lo"] < 0.25 < row["ci_hi"] < 1.0
    nulls = spark.createDataFrame([(None,)], "f boolean")
    with pytest.raises(ValueError, match="no non-NULL"):
        proportion_wilson_ci(nulls, "f")


def test_partition_balance_profile_spine_and_null_bucket(spark):
    """The full bucket spine appears (empty reducers count), NULL keys
    land in bucket -1, counts partition the input, and the balance
    stats match a python recomputation over the same buckets."""
    import hashlib

    from etl_developstoday_test_spark.operators.skew import (
        partition_balance_profile,
    )

    keys = ["a", "b", "c", None, "a", "a", None]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = [tuple(r) for r in partition_balance_profile(df, "k", 8).collect()]
    assert [r[0] for r in out] == sorted(r[0] for r in out)
    assert sum(r[1] for r in out) == len(keys)
    assert out[0][0] == -1 and out[0][1] == 2  # the two NULL keys
    assert len(out) == 9  # 8-bucket spine + the NULL bucket

    counts: dict[int, int] = {b: 0 for b in range(8)}
    counts[-1] = 0
    for k in keys:
        if k is None:
            counts[-1] += 1
        else:
            h = int(hashlib.md5(f"pb#{k}".encode()).hexdigest()[:15], 16)
            counts[h % 8] += 1
    assert {r[0]: r[1] for r in out} == counts
    vals = list(counts.values())
    mean = sum(vals) / len(vals)
    assert out[0][2] == round(max(vals) / mean, 6)
    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        partition_balance_profile(df, "k", 1)


def test_dau_wau_window_semantics(spark):
    """Hand fixture: a user active only on day 0 supports WAU for days
    0..6 and nothing after; only observed days report."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        dau_wau_stickiness,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0),
        ("u2", t0),
        ("u2", t0 + dt.timedelta(days=8)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = [tuple(r) for r in dau_wau_stickiness(ev).collect()]
    d0, d8 = t0.date(), (t0 + dt.timedelta(days=8)).date()
    # day 0: both active; day 8: only u2, and u1's day-0 activity has
    # aged out of the trailing window (covers days 0..6 only)
    assert out == [(d0, 2, 2, 1.0), (d8, 1, 1, 1.0)]


def test_length_percentiles_interpolation(spark):
    """Hand fixture: SQL-standard interpolated percentiles on 1..5
    (p50 = 3 exactly, p90 = 4.6, p99 = 4.96); NULL lengths excluded."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        length_percentiles_by_source,
    )

    docs = spark.createDataFrame(
        [("s", 1), ("s", 2), ("s", 3), ("s", 4), ("s", 5), ("s", None)],
        "source string, n_chars long",
    )
    out = [tuple(r) for r in length_percentiles_by_source(docs).collect()]
    assert out == [("s", 5, 3.0, 4.6, 4.96, 5)]


def test_pair_cosine_profile_identical_vectors(spark):
    """On a corpus where every vector is identical, every formed pair
    has cosine exactly 1.0 regardless of the md5 pairing: one bin (9),
    mean 1.0, and the pair count is n//2 minus at most one
    odd-one-out per occupied bucket."""
    import pytest

    from etl_developstoday_test_spark.operators.similarity import (
        pair_cosine_profile,
    )

    n = 40
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    out = [tuple(r) for r in pair_cosine_profile(emb, n_buckets=4).collect()]
    assert len(out) == 1
    bin_, bin_lo, n_pairs, tot, mean = out[0]
    assert (bin_, bin_lo, mean) == (9, 0.9, 1.0)
    assert n_pairs == tot
    assert n // 2 - 4 <= tot <= n // 2
    with pytest.raises(ValueError, match="n_buckets"):
        pair_cosine_profile(emb, n_buckets=0)


# --- STAGED r15 operator pins ------------------------------------------------


def test_markov_transition_entropy_deterministic_script(spark):
    """Users all following one script (view→click→purchase) pin every
    conditional probability at 1 and the entropy rate at exactly 0;
    ties in ts order by event_id (total order)."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        markov_transition_entropy,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(4):
        for i, et in enumerate(["view", "click", "purchase"]):
            # identical ts everywhere: ORDER is carried by event_id
            rows.append((u * 10 + i, u, et, t0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = [tuple(r) for r in markov_transition_entropy(ev).collect()]
    assert out == [
        ("click", "purchase", 4, 1.0, 8, 0.0),
        ("view", "click", 4, 1.0, 8, 0.0),
    ]


def test_key_candidate_profile_fixture_and_validation(spark):
    """Null/dup/unique columns report exact counts and the unique-key
    flag only when distinct == non-null == rows."""
    import pytest

    from etl_developstoday_test_spark.operators.dq import (
        key_candidate_profile,
    )

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", None), (3, "b", "x"), (4, "b", None)],
        "id long, dup string, holey string",
    )
    out = [
        tuple(r)
        for r in key_candidate_profile(df, ["id", "dup", "holey"]).collect()
    ]
    assert out == [
        ("dup", 4, 0, 2, 0.5, False),
        ("holey", 4, 2, 1, 0.25, False),
        ("id", 4, 0, 4, 1.0, True),
    ]
    with pytest.raises(ValueError, match="cols"):
        key_candidate_profile(df, [])


def test_hourly_seasonality_single_hour_pins_chi2(spark):
    """All mass in one hour: 24 spine rows always, peak share exactly
    1, and χ² = Σ(24·O−C)²/(24C) = 23·C in closed form."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.drift import (
        hourly_seasonality,
    )

    rows = [(dt.datetime(2024, 1, 1 + i, 5, 30),) for i in range(8)]
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = [tuple(r) for r in hourly_seasonality(ev).collect()]
    assert len(out) == 24
    assert [r[0] for r in out] == list(range(24))
    assert all(r[3] == float(23 * 8) and r[4] == 23 for r in out)
    assert out[5][1] == 8 and out[5][2] == 1.0
    assert all(r[5] == 5 and r[6] == 1.0 for r in out)
    assert sum(r[1] for r in out) == 8


def test_ngram_coverage_tiny_fixture(spark):
    """'a b c a b c' has trigram counts {a b c: 2, b c a: 1, c a b: 1}
    — ranks, shares, cumulative shares, and the audit pin exactly."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        ngram_coverage,
    )

    docs = spark.createDataFrame([("a b c a b c",)], "text string")
    out = [tuple(r) for r in ngram_coverage(docs, n=3, k=100).collect()]
    assert out == [
        (1, "a b c", 2, 0.5, 0.5, 3, 4),
        (2, "b c a", 1, 0.25, 0.75, 3, 4),
        (3, "c a b", 1, 0.25, 1.0, 3, 4),
    ]


def test_centroid_shift_orthogonal_labels(spark):
    """Two orthogonal single-vector labels around a 45° global
    centroid pin l2 = cos = 1/√2; identical labels pin l2 = 0,
    cos = 1."""
    from etl_developstoday_test_spark.operators.similarity import (
        centroid_shift_profile,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 0.0]), (1, [0.0, 1.0]), (1, [0.0, 1.0])],
        "label int, embedding array<double>",
    )
    out = [tuple(r) for r in centroid_shift_profile(emb).collect()]
    assert out == [
        (0, 2, 0.707107, 0.707107),
        (1, 2, 0.707107, 0.707107),
    ]
    same = spark.createDataFrame(
        [(0, [0.5, 0.5]), (1, [0.5, 0.5])],
        "label int, embedding array<double>",
    )
    out = [tuple(r) for r in centroid_shift_profile(same).collect()]
    assert out == [(0, 1, 0.0, 1.0), (1, 1, 0.0, 1.0)]


def test_contamination_overlap_fixture(spark):
    """One eval doc copies a train trigram, one is disjoint: exactly
    1 of 3 eval types (and 1 of 3 occurrences) is contaminated."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        contamination_overlap,
    )

    train = spark.createDataFrame([("a b c d",)], "text string")
    eva = spark.createDataFrame(
        [("a b c",), ("x y z w",)], "text string"
    )
    out = [tuple(r) for r in contamination_overlap(train, eva).collect()]
    assert out == [(3, 1, 0.333333, 3, 1, 0.333333)]


def test_value_moments_symmetric_and_constant(spark):
    """{1,2,3} pins skew = 0 and excess kurtosis = −1.5 exactly; a
    constant column pins std = 0 with NULL shape moments (the
    portable degenerate contract — never an engine-dependent 0/0)."""
    from etl_developstoday_test_spark.operators.drift import value_moments

    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    out = [tuple(r) for r in value_moments(df, "v").collect()]
    assert out == [(3, 2.0, 0.816497, 0.0, -1.5)]
    const = spark.createDataFrame([(7.0,)] * 5, "v double")
    out = [tuple(r) for r in value_moments(const, "v").collect()]
    assert out == [(5, 7.0, 0.0, None, None)]


def test_split_psi_flags_value_correlated_split(spark):
    """A value that encodes the split side itself blows PSI far past
    the 0.25 'major shift' convention — the exact failure mode the
    audit exists to catch; an exchangeable constant column reads 0."""
    import pytest
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long
    from etl_developstoday_test_spark.operators.sampling import (
        split_psi_audit,
    )

    base = spark.range(2000).select(F.col("id").alias("event_id"))
    side = (
        md5_long(F.concat(F.lit("sp#"), F.col("event_id").cast("string")))
        % 2
    )
    rigged = base.select(
        "event_id",
        F.when(side == 0, F.lit(10.0)).otherwise(F.lit(400.0)).alias("v"),
    )
    out = [
        tuple(r)
        for r in split_psi_audit(
            rigged, "v", "event_id", n_bins=10, lo=0.0, hi=500.0
        ).collect()
    ]
    assert len(out) == 1 and out[0][0] > 0.25
    fair = base.select("event_id", F.lit(50.0).alias("v"))
    out = [
        tuple(r)
        for r in split_psi_audit(
            fair, "v", "event_id", n_bins=10, lo=0.0, hi=500.0
        ).collect()
    ]
    assert out[0][0] == 0.0
    assert out[0][1] + out[0][2] == 2000
    with pytest.raises(ValueError, match="lo/hi"):
        split_psi_audit(rigged, "v", "event_id")
    with pytest.raises(ValueError, match="hi must be"):
        split_psi_audit(rigged, "v", "event_id", lo=1.0, hi=1.0)


def test_ngram_containment_subset_doc_pins_one(spark):
    """A doc fully contained in a longer doc scores containment
    exactly 1.0 while its Jaccard stays well below 1 — the case the
    operator exists for."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_containment_topk,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    out = [tuple(r) for r in ngram_containment_topk(docs).collect()]
    assert out == [(1, 2, 3, 3, 8, 1.0)]
    jac = [tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()]
    assert jac[0][3] == 0.375  # 3 / (3 + 8 - 3): jaccard misses it


def test_rolling_zscore_spike_and_warmup(spark):
    """A spike day against a varying baseline alarms; warm-up days and
    zero-variance baselines report NULL z (documented contract)."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.drift import (
        rolling_zscore_daily,
    )
    import pytest

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 8 alternating-baseline days, then a spike on day 8 (index 0-based)
    for i, v in enumerate([10.0, 11.0, 10.0, 11.0, 10.0, 11.0, 10.0, 11.0]):
        rows.append((t0 + dt.timedelta(days=i), v))
    rows.append((t0 + dt.timedelta(days=8), 100.0))
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = [tuple(r) for r in rolling_zscore_daily(ev, "value").collect()]
    assert len(out) == 9
    assert all(r[4] is None for r in out[:7])  # warm-up
    assert out[7][4] is not None and out[7][5] is False  # normal day
    assert out[8][4] > 3.0 and out[8][5] is True  # the spike alarms
    # zero-variance baseline: NULL z even when the day moves
    const = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), 5.0) for i in range(8)]
        + [(t0 + dt.timedelta(days=8), 50.0)],
        "ts timestamp, value double",
    )
    out = [tuple(r) for r in rolling_zscore_daily(const, "value").collect()]
    assert out[8][2] == 5.0 and out[8][3] == 0.0 and out[8][4] is None
    with pytest.raises(ValueError, match="window_days"):
        rolling_zscore_daily(ev, "value", window_days=1)


def test_user_lifespan_fixture(spark):
    """Single-moment users land in bucket 0; spans floor into whole
    days; the audit mean is exact."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        user_lifespan_histogram,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0),                                # span 0
        (2, t0), (2, t0 + dt.timedelta(days=3)),         # span 3
        (3, t0), (3, t0 + dt.timedelta(days=3, hours=23)),  # floors to 3
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = [tuple(r) for r in user_lifespan_histogram(ev).collect()]
    assert out == [(0, 1, 3, 2.0), (3, 2, 3, 2.0)]


def test_char_class_profile_fixture(spark):
    """'ab 12 !' partitions into 2 alpha + 2 digit + 2 space + 1 other
    of 7 chars; NULL text counts as empty."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        char_class_profile,
    )

    docs = spark.createDataFrame(
        [("s1", "ab 12 !"), ("s2", None)], "source string, text string"
    )
    out = [tuple(r) for r in char_class_profile(docs).collect()]
    assert out[0] == (
        "s1", 1, 7, 0.285714, 0.285714, 0.285714, 0.142857,
    )
    assert out[1] == ("s2", 1, 0, None, None, None, None)  # NULL text


def test_hourly_seasonality_empty_feed_nulls(spark):
    """r14 ADVICE item 1: an empty (or all-null-ts) feed emits the
    full 24-row spine with NULL share/chi2/peak_share instead of an
    ANSI DIVIDE_BY_ZERO — the degenerate 'feed went dark' card."""
    from etl_developstoday_test_spark.operators.drift import (
        hourly_seasonality,
    )

    ev = spark.createDataFrame([], "ts timestamp")
    out = [tuple(r) for r in hourly_seasonality(ev).collect()]
    assert len(out) == 24
    assert [r[0] for r in out] == list(range(24))
    assert all(r[1] == 0 for r in out)  # n_events
    assert all(r[2] is None for r in out)  # share
    assert all(r[3] is None for r in out)  # chi2_uniform
    assert all(r[6] is None for r in out)  # peak_share
    allnull = spark.createDataFrame([(None,)], "ts timestamp")
    out2 = [tuple(r) for r in hourly_seasonality(allnull).collect()]
    assert out2 == out


def test_contamination_overlap_empty_eval_nulls(spark):
    """r14 ADVICE item 2: an eval side with no n-grams (all docs
    shorter than n tokens) reports NULL rates, not DIVIDE_BY_ZERO."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        contamination_overlap,
    )

    train = spark.createDataFrame([("a b c d",)], "text string")
    eva = spark.createDataFrame([("a b",)], "text string")  # < 3 tokens
    out = [tuple(r) for r in contamination_overlap(train, eva).collect()]
    assert out == [(0, 0, None, None, 0, None)]


def test_split_psi_one_sided_input_null_psi(spark):
    """r14 ADVICE item 3: an input whose md5-parity halves are
    one-sided (every row hashes to side 0) reports NULL psi — every
    q-term goes NULL and the NULL-skipping sum follows — with the
    exact counts and split_balance 1.0 still published."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long
    from etl_developstoday_test_spark.operators.sampling import (
        split_psi_audit,
    )

    base = spark.range(400).select(F.col("id").alias("event_id"))
    side = (
        md5_long(F.concat(F.lit("sp#"), F.col("event_id").cast("string")))
        % 2
    )
    one_sided = base.filter(side == 0).select(
        "event_id", F.lit(50.0).alias("v")
    )
    out = [
        tuple(r)
        for r in split_psi_audit(
            one_sided, "v", "event_id", n_bins=10, lo=0.0, hi=500.0
        ).collect()
    ]
    assert len(out) == 1
    psi, n_base, n_current, balance = out[0]
    assert psi is None and n_current == 0 and n_base > 0
    assert balance == 1.0
    # fully empty input: the card itself goes all-NULL, no error
    empty = spark.createDataFrame([], "event_id long, v double")
    out = [
        tuple(r)
        for r in split_psi_audit(
            empty, "v", "event_id", n_bins=10, lo=0.0, hi=500.0
        ).collect()
    ]
    assert out == [(None, None, None, None)]


# --- Round-16 staged operators: fixtures / properties


def test_new_vs_returning_fixture(spark):
    """u1 active day1+day2, u2 only day2: day1 = 1 new, day2 = 1 new +
    1 returning; the cumulative curve counts each user once."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        new_vs_returning_daily,
    )

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(hours=1)),
        (1, t0 + dt.timedelta(days=1)), (2, t0 + dt.timedelta(days=1)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = [tuple(r) for r in new_vs_returning_daily(ev).collect()]
    assert out == [
        (dt.date(2024, 1, 1), 1, 1, 0, 1.0, 1),
        (dt.date(2024, 1, 2), 2, 1, 1, 0.5, 2),
    ]


def test_session_gap_histogram_fixture(spark):
    """Only the 110-minute gap crosses the 30-minute session timeout:
    one between-session gap in the 1-hour bucket, mean 110/60 h."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        session_gap_histogram,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, t0),
        (1, 11, t0 + dt.timedelta(minutes=10)),
        (1, 12, t0 + dt.timedelta(minutes=120)),
        (1, 13, t0 + dt.timedelta(minutes=121)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )
    out = [tuple(r) for r in session_gap_histogram(ev).collect()]
    assert out == [(1, 1, 1, 1.833333)]


def test_interarrival_survival_fixture(spark):
    """Gaps 0.5s / 29.5s / 70s land in buckets 0 / 2 / 3; survival is
    the exact tail share at each occupied edge."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_survival,
    )

    t0 = dt.datetime(2024, 1, 1)
    ts = [0.0, 0.5, 30.0, 100.0]
    rows = [(1, i, t0 + dt.timedelta(seconds=s)) for i, s in enumerate(ts)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )
    out = [tuple(r) for r in interarrival_survival(ev).collect()]
    assert out == [
        (0, 0, 1, 0.333333, 1.0, 3),
        (2, 10, 1, 0.333333, 0.666667, 3),
        (3, 60, 1, 0.333333, 0.333333, 3),
    ]


def test_weekday_hour_heatmap_fixture_and_empty(spark):
    """3 events Monday 9h + 1 Sunday 23h: peak cell (1, 9) at share
    0.75, HHI x uniform = (10/16)*168 = 105; an empty feed emits the
    full 168-row NULL degenerate spine."""
    import datetime as dt

    from etl_developstoday_test_spark.operators.drift import (
        weekday_hour_heatmap,
    )

    rows = [
        (dt.datetime(2024, 1, 1, 9, 0),),  # Monday
        (dt.datetime(2024, 1, 1, 9, 30),),
        (dt.datetime(2024, 1, 1, 9, 59),),
        (dt.datetime(2024, 1, 7, 23, 5),),  # Sunday
    ]
    ev = spark.createDataFrame(rows, "ts timestamp")
    out = [tuple(r) for r in weekday_hour_heatmap(ev).collect()]
    assert len(out) == 168
    cells = {(r[0], r[1]): r for r in out}
    assert cells[(1, 9)][2] == 3 and cells[(1, 9)][3] == 0.75
    assert cells[(7, 23)][2] == 1
    assert out[0][4] == 1 and out[0][5] == 9  # peak cell
    assert out[0][6] == 0.75 and out[0][7] == 105.0
    empty = spark.createDataFrame([], "ts timestamp")
    oute = [tuple(r) for r in weekday_hour_heatmap(empty).collect()]
    assert len(oute) == 168
    assert all(
        r[2] == 0 and r[3] is None and r[6] is None and r[7] is None
        for r in oute
    )


def test_dup_multiplicity_fixture(spark):
    """Keys {a, a, b}: one key at multiplicity 2, one at 1; the dup
    row share is 2/3."""
    from etl_developstoday_test_spark.operators.dq import (
        dup_multiplicity_profile,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    out = [tuple(r) for r in dup_multiplicity_profile(df, ["k"]).collect()]
    assert out == [(1, 1, 3, 1, 0.666667), (2, 1, 3, 1, 0.666667)]


def test_order_reconciliation_fixture(spark):
    """Exact match / +10% / headerless-lines / -0.5% / zero-total all
    land in their named buckets; match rate counts only the exact
    bucket."""
    from etl_developstoday_test_spark.operators.dq import (
        order_reconciliation,
    )

    orders = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 100.0), (4, 100.0), (5, 0.0)],
        "o_orderkey long, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.0),
            (2, 90.0, 0.0, 0.0),
            (4, 100.5, 0.0, 0.0),
            (5, 10.0, 0.0, 0.0),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    out = [
        tuple(r) for r in order_reconciliation(orders, lineitem).collect()
    ]
    assert out == [
        (-5, "invalid_header", 1, 0.2, 5, 0.2),
        (-3, "under_small", 1, 0.2, 5, 0.2),
        (0, "matched", 1, 0.2, 5, 0.2),
        (4, "over_gt_tol", 2, 0.4, 5, 0.2),
    ]


def test_cluster_source_purity_fixture(spark):
    """Two same-source copies = a pure cluster, two cross-source
    copies = a mixed one, singletons drop; mixed doc share is 0.5."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        cluster_source_purity,
    )

    docs = spark.createDataFrame(
        [
            (1, "p q r s t u v w tail-one", "A"),
            (2, "p q r s t u v w tail-two", "A"),
            (3, "x y z a b c d e foo", "A"),
            (4, "x y z a b c d e bar", "B"),
            (5, "totally unique text here now ok yes no", "A"),
        ],
        "doc_id long, text string, source string",
    )
    out = [tuple(r) for r in cluster_source_purity(docs).collect()]
    assert out == [
        (2, False, 1, 2, 4, 0.5),
        (2, True, 1, 2, 4, 0.5),
    ]


def test_ttr_hapax_fixture(spark):
    """'a b a' reads 3 tokens / 2 types / 1 hapax; an all-empty
    source still appears with zero counts and NULL ratios."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        ttr_hapax_by_source,
    )

    docs = spark.createDataFrame(
        [("A", "a b a"), ("B", ""), ("B", None)],
        "source string, text string",
    )
    out = [tuple(r) for r in ttr_hapax_by_source(docs).collect()]
    assert out == [
        ("A", 3, 2, 0.666667, 1, 0.5),
        ("B", 0, 0, None, 0, None),
    ]


def test_dim_variance_fixture(spark):
    """Vectors [1,0] and [0,0]: dim 0 carries all the variance
    (share 1.0, rank 1), dim 1 is dead; the dead count rides every
    row."""
    from etl_developstoday_test_spark.operators.similarity import (
        dim_variance_profile,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = [tuple(r) for r in dim_variance_profile(emb).collect()]
    assert out == [
        (0, 2, 0.5, 0.25, 1.0, 1, 1, 0.25),
        (1, 2, 0.0, 0.0, 0.0, 2, 1, 0.25),
    ]


def test_intra_cluster_tightness_fixture(spark):
    """Identical members pin cosine exactly 1; an orthogonal pair
    reads cos 45 degrees = 0.707107 to its own centroid."""
    from etl_developstoday_test_spark.operators.similarity import (
        intra_cluster_tightness,
    )

    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [1.0, 0.0]),
            (3, 1, [1.0, 0.0]),
            (4, 1, [0.0, 1.0]),
        ],
        "vec_id long, label int, embedding array<double>",
    )
    out = [tuple(r) for r in intra_cluster_tightness(emb).collect()]
    assert out == [
        (0, 2, 1.0, 1.0, 0, 0.0),
        (1, 2, 0.707107, 0.707107, 0, 0.0),
    ]


def test_regressogram_fixture(spark):
    """x=1 -> mean 2.0 over two rows, x=2 -> mean 5.0; shares are
    exact; empty y_cols raises."""
    import pytest

    from etl_developstoday_test_spark.operators.ml import regressogram

    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 3.0), (2.0, 5.0)], "x double, y double"
    )
    out = [tuple(r) for r in regressogram(df, "x", ["y"]).collect()]
    assert out == [(1, 2, 0.666667, 2.0, 3), (2, 1, 0.333333, 5.0, 3)]
    with pytest.raises(ValueError, match="y_cols"):
        regressogram(df, "x", [])


def test_poisson_bootstrap_constant_column(spark):
    """A constant column pins every replicate mean (and so the whole
    interval) to the constant; the headline mean is exact."""
    import pytest

    from etl_developstoday_test_spark.operators.sampling import (
        poisson_bootstrap_mean_ci,
    )
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        F.col("id").alias("event_id"), F.lit(7.25).alias("v")
    )
    out = [
        tuple(r)
        for r in poisson_bootstrap_mean_ci(
            df, "v", "event_id", n_reps=16
        ).collect()
    ]
    assert out == [(500, 7.25, 16, 7.25, 7.25)]
    with pytest.raises(ValueError, match="n_reps"):
        poisson_bootstrap_mean_ci(df, "v", "event_id", n_reps=1)
