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
