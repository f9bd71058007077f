"""DuckDB-twin parity for the staged-then-registered operator pipeline.

The staging ground: every operator lands here FIRST, with its oracle
SQL verified value-for-value at sf0.001 AND sf0.01 before any
registration — so each one's first driver row can only be green. For
the already-registered rounds (8 and 9) this file keeps (a) the
second-scale value locks over the SAME oracle strings the registration
uses — imported from plans/queries.py, single source of truth — and
(b) the adversarial FIXTURE-GRAPH locks for LPA and assortativity,
whose registered oracles run over the co-activity graph instead. The round-10
batch is registered too; its locks below import the registration
oracles the same way. Same comparison discipline as
tests/test_oracle_parity.py (full multiset, exact equality, no
epsilon): the determinism contract (nano-quantized ln, exact decimal /
integer accumulation, total-order argmax) is what's being locked in.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_developstoday_test_spark.plans.queries import (
    _cosine as _cosine_sql,
    BIGRAM_ORACLE_SQL as BIGRAM_ORACLE,
    BPE_FERTILITY_ORACLE_SQL as FERTILITY_ORACLE,
    KN_BIGRAM_ORACLE_SQL as KN_BIGRAM_ORACLE,
    NB_CALIBRATION_ORACLE_SQL as NB_CALIBRATION_ORACLE,
    NB_ORACLE_SQL as NB_ORACLE,
    PACKING_ORACLE_SQL as PACKING_ORACLE,
    STUMP_ORACLE_SQL as STUMP_ORACLE,
    WATERFILL_ORACLE_SQL as WATERFILL_ORACLE,
)
from tests.conftest import SF_DIR, SF_DIR_ORACLE

LPA_ORACLE = """
WITH RECURSIVE sym AS (
  -- mirror the operator's normalization exactly (distinct symmetric
  -- edges, self-loops dropped) so parity holds on ANY fixture, not
  -- just loop-free duplicate-free ones
  SELECT DISTINCT s, d FROM (
    SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges
  ) WHERE s <> d
),
verts AS (SELECT DISTINCT s AS n FROM sym),
lab(iter, n, lbl) AS (
  SELECT 0, n, CAST(n AS BIGINT) FROM verts
  UNION ALL
  SELECT l.iter + 1, l.n, COALESCE(b.new_lbl, l.lbl)
  FROM lab l
  LEFT JOIN (
    SELECT g.s AS nn, -(max(row(cnt, neg))[2]) AS new_lbl
    FROM (
      SELECT s.s, l2.lbl, COUNT(*) AS cnt, -l2.lbl AS neg
      FROM sym s JOIN lab l2 ON l2.n = s.d
      GROUP BY s.s, l2.lbl
    ) g
    GROUP BY g.s
  ) b ON b.nn = l.n
  WHERE l.iter < 5
),
final AS (SELECT n, lbl FROM lab WHERE iter = 5),
deg AS (SELECT s, COUNT(*) AS deg FROM sym GROUP BY s),
m AS (SELECT COUNT(*) / 2 AS m FROM sym),
intra AS (
  SELECT ls.lbl, COUNT(*) AS intra_directed
  FROM sym JOIN final ls ON ls.n = sym.s JOIN final ld ON ld.n = sym.d
  WHERE ls.lbl = ld.lbl GROUP BY ls.lbl
),
per_c AS (
  SELECT f.lbl, COUNT(*) AS n_nodes, SUM(deg.deg) AS degree_sum,
         COALESCE(ANY_VALUE(i.intra_directed), 0) AS intra_directed
  FROM final f JOIN deg ON deg.s = f.n LEFT JOIN intra i ON i.lbl = f.lbl
  GROUP BY f.lbl
),
q AS (
  SELECT CAST(SUM(CAST(2 AS BIGINT) * m.m * intra_directed
              - degree_sum * degree_sum) AS DOUBLE)
         / (4.0 * CAST(ANY_VALUE(m.m) AS DOUBLE)
                * CAST(ANY_VALUE(m.m) AS DOUBLE)) AS modularity
  FROM per_c CROSS JOIN m
)
SELECT lbl AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(intra_directed / 2 AS BIGINT) AS intra_edges,
       CAST(degree_sum AS BIGINT) AS degree_sum, q.modularity
FROM per_c CROSS JOIN q
ORDER BY n_nodes DESC, community ASC LIMIT 10
"""


# Both scale factors: data-derived model tables (vocabularies, bigram
# contexts, split histograms) must track the corpus, not bake in one
# scale's shape — the same discipline as the registered queries'
# second-scale checks in tests/test_oracle_parity.py.
@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def sf_con(request):
    c = duckdb.connect()
    for t in ["documents", "lineitem"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{request.param}/{t}.parquet'"
        )
    yield request.param, c
    c.close()


def test_naive_bayes_matches_oracle(spark, sf_con):
    from etl_developstoday_test_spark.operators.ml import (
        naive_bayes_quality,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = sorted(tuple(r) for r in naive_bayes_quality(docs).collect())
    drows = sorted(tuple(r) for r in con.execute(NB_ORACLE).fetchall())
    assert srows == drows


def test_bigram_lm_matches_oracle(spark, sf_con):
    from etl_developstoday_test_spark.operators.text_analysis import (
        bigram_lm_bottomk,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in bigram_lm_bottomk(docs, k=20).collect()]
    drows = con.execute(BIGRAM_ORACLE).fetchall()
    assert srows == drows


def test_best_stump_matches_oracle(spark, sf_con):
    from etl_developstoday_test_spark.operators.ml import best_stump_split

    sf_dir, con = sf_con
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    srows = [
        tuple(r)
        for r in best_stump_split(
            li, ["l_quantity", "l_discount"], "l_extendedprice"
        ).collect()
    ]
    drows = con.execute(STUMP_ORACLE).fetchall()
    assert srows == drows


def test_lpa_matches_recursive_replay(spark):
    from etl_developstoday_test_spark.operators.graph import (
        label_propagation_communities,
    )
    import itertools

    e = list(itertools.combinations(range(4), 2))
    e += list(itertools.combinations(range(10, 14), 2))
    e += [(3, 10), (20, 21)]  # plus a detached pair
    edges = spark.createDataFrame(e, "src long, dst long")
    verts = spark.createDataFrame(
        [(i,) for i in sorted({x for p in e for x in p})], "node long"
    )
    srows = [
        tuple(r)
        for r in label_propagation_communities(
            edges, verts, rounds=5
        ).collect()
    ]
    c = duckdb.connect()
    c.execute("CREATE TABLE edges(a BIGINT, b BIGINT)")
    c.executemany("INSERT INTO edges VALUES (?, ?)", e)
    drows = c.execute(LPA_ORACLE).fetchall()
    c.close()
    assert srows == drows


ASSORT_ORACLE = """
WITH sym AS (
  -- distinct symmetric edges, self-loops dropped — the operator's
  -- normalization, mirrored so parity holds on any fixture
  SELECT DISTINCT s, d FROM (
    SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges
  ) WHERE s <> d
),
deg AS (SELECT s, COUNT(*) AS deg FROM sym GROUP BY s),
pairs AS (
  SELECT ds.deg AS du, dd.deg AS dv
  FROM sym JOIN deg ds ON ds.s = sym.s JOIN deg dd ON dd.s = sym.d
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2, CAST(SUM(du) AS BIGINT) AS sx,
         CAST(SUM(du * dv) AS BIGINT) AS sxy,
         CAST(SUM(du * du) AS BIGINT) AS sxx
  FROM pairs
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS assortativity
FROM stats
"""


def test_assortativity_matches_oracle(spark):
    from etl_developstoday_test_spark.operators.graph import (
        degree_assortativity,
    )
    import itertools

    # irregular graph: two bridged cliques + a pendant chain
    e = list(itertools.combinations(range(4), 2))
    e += list(itertools.combinations(range(10, 14), 2))
    e += [(3, 10), (13, 20), (20, 21)]
    edges = spark.createDataFrame(e, "src long, dst long")
    srow = tuple(degree_assortativity(edges).collect()[0])
    c = duckdb.connect()
    c.execute("CREATE TABLE edges(a BIGINT, b BIGINT)")
    c.executemany("INSERT INTO edges VALUES (?, ?)", e)
    drow = c.execute(ASSORT_ORACLE).fetchall()[0]
    c.close()
    assert srow == drow


# --- registered round 9 (second-scale locks + invariant checks) -------------


def test_waterfill_matches_oracle(spark, sf_con):
    """Registered r9 (sample_waterfill_allocation): roll documents up
    to (source, avail tokens, salted-md5 weight) and water-fill 60% of
    the total — value-locked at both scales, plus the cap/saturation
    invariants the oracle cannot express."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long, tokens
    from etl_developstoday_test_spark.operators.sampling import (
        waterfill_allocation,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).alias("avail_tokens"),
    ).select(
        "source",
        "avail_tokens",
        (
            md5_long(F.concat(F.lit("wf#"), F.col("source"))) % 9 + 1
        ).alias("weight"),
    )
    srows = sorted(
        tuple(r) for r in waterfill_allocation(src, budget_pct=60).collect()
    )
    drows = sorted(tuple(r) for r in con.execute(WATERFILL_ORACLE).fetchall())
    assert srows == drows
    assert all(r[3] <= r[1] for r in srows)  # never exceeds a cap
    assert any(r[4] for r in srows)  # the saturation branch IS exercised




def test_nb_margin_calibration_matches_oracle(spark, sf_con):
    """Registered r9 (ml_nb_margin_calibration): per-margin-bin
    reliability table of the naive-Bayes classifier, value-locked at
    both scales."""
    from etl_developstoday_test_spark.operators.ml import (
        nb_margin_calibration,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = sorted(
        tuple(r) for r in nb_margin_calibration(docs).collect()
    )
    drows = sorted(
        tuple(r) for r in con.execute(NB_CALIBRATION_ORACLE).fetchall()
    )
    assert srows == drows




def test_kneser_ney_bigram_matches_oracle(spark, sf_con):
    """Registered r9 (text_kneser_ney_bottomk): interpolated Kneser-Ney
    bigram LM bottom-k, value-locked at both scales (counts exact,
    discount 0.75 binary-exact, probability one fixed-order double
    expression, ln nano-quantized)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        kneser_ney_bigram_bottomk,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [
        tuple(r) for r in kneser_ney_bigram_bottomk(docs, k=20).collect()
    ]
    drows = con.execute(KN_BIGRAM_ORACLE).fetchall()
    assert srows == drows




def test_bpe_fertility_matches_oracle(spark, sf_con):
    """Registered r9 (text_bpe_fertility_by_lang): per-language
    tokenizer fertility over the trained 5-merge segmentation,
    value-locked at both scales."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bpe_fertility_by_lang,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = sorted(
        tuple(r) for r in bpe_fertility_by_lang(docs, rounds=5).collect()
    )
    drows = sorted(tuple(r) for r in con.execute(FERTILITY_ORACLE).fetchall())
    assert srows == drows




def test_packing_efficiency_matches_oracle(spark, sf_con):
    """Registered r9 (sample_packing_efficiency): unpacked-vs-packed
    sequence/padding audit at budget 128 x 32 shards — exact integer
    arithmetic end to end, value-locked at both scales."""
    from etl_developstoday_test_spark.operators.sampling import (
        packing_efficiency_audit,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srow = tuple(packing_efficiency_audit(docs, budget=128).collect()[0])
    drow = con.execute(PACKING_ORACLE).fetchall()[0]
    assert srow == drow
    # padding saved must be nonnegative and the packed layout never
    # needs more sequences than the unpacked one
    assert srow[4] <= srow[2] and srow[5] <= srow[3]


# --- registered round 10 (second-scale locks) --------------------------------
#
# Staged here through round 9 with the same discipline as the
# round-8/round-9 batches (implemented + unit-tested + value-locked at
# sf0.001 AND sf0.01 BEFORE registration), registered in round 10. The
# oracle strings now live in plans/queries.py next to their
# registrations — imported here so the second-scale locks always run
# against the exact SQL the driver executes.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CLUSTERING_SAMPLED_ORACLE_SQL as CLUSTERING_SAMPLED_ORACLE,
    EMBED_DRIFT_ORACLE_SQL as EMBED_DRIFT_ORACLE,
    KN_HELDOUT_ORACLE_SQL as KN_HELDOUT_ORACLE,
    NB_CONFUSION_ORACLE_SQL as NB_CONFUSION_ORACLE,
    PSI_SERIES_ORACLE_SQL as PSI_SERIES_ORACLE,
    SNAPSHOT_DELTA_ORACLE_SQL as SNAPSHOT_DELTA_ORACLE,
    WATERFILL_EXECUTE_ORACLE_SQL as WATERFILL_EXECUTE_ORACLE,
)


def _wf_inputs(spark, sf_dir):
    """The registered waterfill construction: per-source token rollup
    with the salted-md5 1..9 weight, plus the doc-level token table."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long, tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = (
        docs.groupBy("source")
        .agg(F.sum(F.size(tokens(F.col("text")))).alias("avail_tokens"))
        .select(
            "source",
            "avail_tokens",
            (
                md5_long(F.concat(F.lit("wf#"), F.col("source"))) % 9 + 1
            ).alias("weight"),
        )
    )
    doc_tokens = docs.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return src, doc_tokens


def test_waterfill_execute_matches_oracle(spark, sf_con):
    """Registered r10 (sample_waterfill_execute): execute the waterfill plan — per-source
    hash-prefix selection under the exact token budget, with the
    certified KMV-style pre-filter bounding each source's window
    input. Value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.sampling import (
        waterfill_allocation,
        waterfill_execute,
    )

    sf_dir, con = sf_con
    src, doc_tokens = _wf_inputs(spark, sf_dir)
    alloc = waterfill_allocation(src, budget_pct=60)
    srows = sorted(
        tuple(r) for r in waterfill_execute(doc_tokens, alloc).collect()
    )
    drows = sorted(
        tuple(r) for r in con.execute(WATERFILL_EXECUTE_ORACLE).fetchall()
    )
    assert srows == drows
    # the budget is enforced exactly and the kept mass is nontrivial
    assert all(r[3] <= r[1] for r in srows)
    assert any(r[3] > 0 for r in srows)


def test_nb_confusion_matrix_matches_oracle(spark, sf_con):
    """Registered r10 (ml_nb_confusion_matrix): which-label-leaks-where confusion matrix of the NB
    classifier, sharing the registered model CTEs verbatim.
    Value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.ml import (
        nb_confusion_matrix,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = sorted(tuple(r) for r in nb_confusion_matrix(docs).collect())
    drows = sorted(
        tuple(r) for r in con.execute(NB_CONFUSION_ORACLE).fetchall()
    )
    assert srows == drows


CLUSTERING_ORACLE = """
WITH e AS (SELECT a AS ua, b AS ub FROM edges),
deg AS (
  SELECT u, COUNT(*) AS d FROM (
    SELECT ua AS u FROM e UNION ALL SELECT ub FROM e) GROUP BY u
),
tri AS (
  SELECT e1.ua AS x, e1.ub AS y, e2.ub AS z
  FROM e e1
  JOIN e e2 ON e2.ua = e1.ub
  JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
),
cred AS (
  SELECT x AS u FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tc AS (SELECT u, COUNT(*) AS t FROM cred GROUP BY u)
SELECT deg.u AS node, CAST(d AS BIGINT) AS degree,
       CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles,
       round(CAST(2 * COALESCE(t, 0) AS DOUBLE)
             / CAST(d * (d - 1) AS DOUBLE), 6) AS clustering_coeff
FROM deg LEFT JOIN tc ON tc.u = deg.u
WHERE d >= 2
ORDER BY clustering_coeff DESC, node ASC LIMIT 10
"""


def test_clustering_coefficient_matches_oracle(spark):
    """Fixture-graph algorithm lock for the r10 clustering
    registrations: per-node local clustering coefficient on an
    irregular fixture (two bridged cliques + a pendant chain + a
    square) — the degree-ordered oriented enumeration must credit
    exactly the triangles the naive ordered SQL join finds."""
    import itertools

    from etl_developstoday_test_spark.operators.graph import (
        local_clustering_coefficient,
    )

    e = list(itertools.combinations(range(4), 2))
    e += list(itertools.combinations(range(10, 14), 2))
    e += [(3, 10), (13, 20), (20, 21)]
    e += [(30, 31), (31, 32), (32, 33), (30, 33)]  # triangle-free square
    edges = spark.createDataFrame(e, "ua long, ub long")
    srows = [
        tuple(r) for r in local_clustering_coefficient(edges).collect()
    ]
    c = duckdb.connect()
    c.execute("CREATE TABLE edges(a BIGINT, b BIGINT)")
    c.executemany("INSERT INTO edges VALUES (?, ?)", e)
    drows = c.execute(CLUSTERING_ORACLE).fetchall()
    c.close()
    assert srows == drows
    # the square's nodes have degree 2 and no triangles: coefficient 0
    by_node = {r[0]: r for r in srows}
    assert 30 in by_node and by_node[30][3] == 0.0


@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def emb_con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{request.param}/embeddings.parquet'"
    )
    yield request.param, c
    c.close()


def test_embedding_dimension_drift_matches_oracle(spark, emb_con):
    """Registered r10 (embed_dimension_drift): per-dimension Welch z between the even/odd vec_id
    halves — micro-quantized BIGINT moments, one fixed-order double
    expression, value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.similarity import (
        embedding_dimension_drift,
    )

    sf_dir, con = emb_con
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [
        tuple(r) for r in embedding_dimension_drift(emb).collect()
    ]
    drows = con.execute(EMBED_DRIFT_ORACLE).fetchall()
    assert srows == drows
    # undrifted corpus: an even/odd split should certify the null
    # loosely (no |z| explosion) — sanity, not a lock
    assert all(abs(r[5]) < 10 for r in srows)


def test_snapshot_delta_matches_oracle(spark, sf_con):
    """Registered r10 (dedup_snapshot_delta): CDC-class snapshot diff card (added / removed /
    changed / unchanged + per-source token movement) over two
    deterministic snapshot views of the corpus. Value-locked at both
    scales BEFORE registration; every class must be non-empty so the
    lock exercises all four branches."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.text_dedup import (
        snapshot_delta,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    snap_a = docs.filter(F.col("doc_id") % 20 != 19).select(
        "doc_id", "source", "text"
    )
    snap_b = docs.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    srows = sorted(
        tuple(r) for r in snapshot_delta(snap_a, snap_b).collect()
    )
    drows = sorted(
        tuple(r) for r in con.execute(SNAPSHOT_DELTA_ORACLE).fetchall()
    )
    assert srows == drows
    tot = [sum(r[i] for r in srows) for i in range(1, 5)]
    assert all(t > 0 for t in tot), f"a CDC class is unexercised: {tot}"


def test_kn_heldout_matches_oracle(spark, sf_con):
    """Registered r10 (text_kn_heldout_bottomk): held-out interpolated-KN scoring (train on
    doc_id % 5 != 0, score the rest) — the unseen-bigram clamp and the
    Laplace-floored continuation are live code paths here, unlike the
    in-corpus scorer. Value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        kn_heldout_bottomk,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in kn_heldout_bottomk(docs, k=20).collect()]
    drows = con.execute(KN_HELDOUT_ORACLE).fetchall()
    assert srows == drows


def test_staged_oracle_result_types_survive_pandas_fetch():
    """The round-6 incident gate, applied at STAGING time: every oracle
    string in this module (staged or registered-and-locked) must bind
    to DuckDB result types that pandas fetches losslessly — an un-cast
    SUM(BIGINT) is HUGEINT, which the driver's pandas fetch coerces to
    float64 while Spark stays int64, hash-diverging on equal values.
    Catching it here means a staged operator can't carry the bug into
    its registration round."""
    con = duckdb.connect()
    for t in [
        "documents", "lineitem", "embeddings", "events",
        "orders", "customer", "part", "nation", "supplier", "region",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR}/{t}.parquet'"
        )
    con.execute("CREATE TABLE edges(a BIGINT, b BIGINT)")
    con.execute("INSERT INTO edges VALUES (1,2),(2,3),(1,3),(3,4)")
    offenders = []
    for name, val in sorted(globals().items()):
        # "SELECT" filter: SF_DIR_ORACLE (a conftest path) also ends
        # in _ORACLE
        if (
            name.endswith("_ORACLE")
            and isinstance(val, str)
            and "SELECT" in val
        ):
            rel = con.sql(val)
            for c, ty in zip(rel.columns, [str(t) for t in rel.types]):
                if "HUGEINT" in ty or "DECIMAL" in ty:
                    offenders.append((name, c, ty))
    con.close()
    assert not offenders, (
        "staged oracle columns with driver-hash-unsafe types "
        f"(CAST(... AS BIGINT) / finish the _dsum path): {offenders}"
    )


@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def ev_con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{request.param}/events.parquet'"
    )
    yield request.param, c
    c.close()


def test_psi_drift_series_matches_oracle(spark, ev_con):
    """Registered r10 (drift_psi_series): per-week PSI series of the event value distribution
    against the earliest week (pinned [0,200) x 10 bins) — the
    continuous-monitoring form of the registered one-shot PSI.
    Value-locked at both scales BEFORE registration; the baseline
    week's own PSI must be exactly 0.0."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.drift import (
        psi_drift_series,
    )

    sf_dir, con = ev_con
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = psi_drift_series(
        ev,
        "value",
        F.date_trunc("week", F.col("ts")).cast("date"),
        n_bins=10,
        lo=0.0,
        hi=200.0,
    )
    srows = sorted(tuple(r) for r in out.collect())
    drows = sorted(
        tuple(r) for r in con.execute(PSI_SERIES_ORACLE).fetchall()
    )
    assert srows == drows
    base = min(srows, key=lambda r: r[0])
    assert base[1] == 0.0 and base[4] == "stable"
    # the fixture has no NULL values: every period reports n_nulls=0
    # (the NULL-bearing path is locked by the unit test in
    # tests/test_operators.py)
    assert all(r[3] == 0 for r in srows)


# Second locks for the two clustering-coefficient registrations: the
# fixture-graph lock above proves the algorithm; these prove the exact
# query+oracle pairs the registrations ship — the full co-activity
# graph (the k-core / LPA / assortativity construction) and the
# DOULION 5%-sampled graph (the triangle-count construction).
from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CLUSTERING_COACT_ORACLE_SQL as CLUSTERING_COACT_ORACLE,
)


def test_clustering_coefficient_coactivity_matches_oracle(spark, ev_con):
    """Registered r10 (graph_clustering_coefficient): the clustering
    coefficient over the SHARED co-activity graph — the exact
    construction the registration runs — value-locked at both
    scales."""
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )
    from etl_developstoday_test_spark.operators.graph import (
        local_clustering_coefficient,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [
        tuple(r) for r in local_clustering_coefficient(edges).collect()
    ]
    drows = con.execute(CLUSTERING_COACT_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both scales


def test_clustering_coefficient_sampled_matches_oracle(spark, ev_con):
    """Registered r10 (graph_clustering_sampled): the clustering
    coefficient over the DOULION 5%-sampled co-activity graph
    graph_triangle_count reads — the sparse-regime variant —
    value-locked at both scales."""
    from etl_developstoday_test_spark.plans.queries import (
        _sampled_coactivity_edges,
    )
    from etl_developstoday_test_spark.operators.graph import (
        local_clustering_coefficient,
    )

    sf_dir, con = ev_con
    edges = _sampled_coactivity_edges(spark, sf_dir)
    srows = [
        tuple(r) for r in local_clustering_coefficient(edges).collect()
    ]
    drows = con.execute(CLUSTERING_SAMPLED_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both scales


# --- Round 11 registrations (locked here BEFORE registration) ----------------
#
# Same discipline as rounds 8-10: each operator below was implemented
# and unit-tested a round early, its DuckDB twin value-locked at
# sf0.001 AND sf0.01 here, and registration waited for the round-11
# driver window — so the first driver row can only be green. The
# oracle strings now live in plans/queries.py next to their
# registrations; these locks import and re-verify THE SAME strings.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CENTROID_OUTLIERS_ORACLE_SQL as CENTROID_OUTLIERS_ORACLE,
    CHI2_ORACLE_SQL as CHI2_ORACLE,
    KS_ORACLE_SQL as KS_ORACLE,
    NGRAM_NOVELTY_ORACLE_SQL as NOVELTY_ORACLE,
    TWO_HOP_ORACLE_SQL as TWO_HOP_COACT_ORACLE,
    ZIPF_ORACLE_SQL as ZIPF_ORACLE,
)


def test_ks_two_sample_matches_oracle(spark, ev_con):
    """Registered r11 (drift_ks_two_sample): exact two-sample KS between the first- and
    second-half-of-month value distributions (the psi_value_shift
    split), centi-quantized — value-locked at both scales BEFORE
    registration (r13)."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.drift import ks_two_sample

    sf_dir, con = ev_con
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = ks_two_sample(
        ev.filter(F.dayofmonth("ts") <= 15),
        ev.filter(F.dayofmonth("ts") > 15),
        "value",
        quantum=100,
    )
    srow = [tuple(r) for r in out.collect()]
    drow = con.execute(KS_ORACLE).fetchall()
    assert srow == drow
    # an undrifted synthetic corpus: D is small but strictly positive
    assert 0.0 < srow[0][2] < 0.5


def test_zipf_slope_matches_oracle(spark, sf_con):
    """Registered r11 (text_zipf_slope): Zipf-law OLS fit (ln freq on ln rank, top-100
    tokens, nano-quantized logs through the exact decimal summator) —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        zipf_slope,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srow = [tuple(r) for r in zipf_slope(docs, top_n=100).collect()]
    drow = con.execute(ZIPF_ORACLE).fetchall()
    assert srow == drow
    n_rows, slope, intercept, r2 = srow[0]
    # the SYNTHETIC corpus's head is nearly flat (uniform-ish token
    # draw), which is exactly the machine-generated signature the
    # operator exists to flag: slope barely negative, fit poor. The
    # true-power-law behavior (slope ~ -1, r2 ~ 1) is locked by the
    # constructed-corpus unit test in tests/test_operators.py.
    # n_rows tracks min(top_n, vocabulary): sf0.001's vocab is < 100.
    assert slope < 0 and 2 <= n_rows <= 100


def test_chi2_token_label_matches_oracle(spark, sf_con):
    """Registered r11 (ml_chi2_token_label): chi-squared token-label association over the top-20
    df tokens (feature-selection / label-leak probe) — value-locked at
    both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.ml import (
        chi2_token_label,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [
        tuple(r) for r in chi2_token_label(docs, top_m=20, k=15).collect()
    ]
    drows = con.execute(CHI2_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 15 and srows[0][3] >= srows[-1][3]


def test_two_hop_reach_matches_brute_force(spark):
    """Unit lock (graph_two_hop_reach): per-node 2-hop reach on an irregular fixture must
    equal an independent adjacency-set brute force."""
    import itertools

    from etl_developstoday_test_spark.operators.graph import two_hop_reach

    e = list(itertools.combinations(range(4), 2))
    e += list(itertools.combinations(range(10, 14), 2))
    e += [(3, 10), (13, 20), (20, 21), (30, 31)]
    edges = spark.createDataFrame(e, "ua long, ub long")
    srows = [tuple(r) for r in two_hop_reach(edges, top_k=50).collect()]

    adj: dict[int, set[int]] = {}
    for u, v in e:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = []
    for u in adj:
        reach = set(adj[u])
        for v in adj[u]:
            reach |= adj[v]
        reach.discard(u)
        expect.append((u, len(adj[u]), len(reach)))
    expect.sort(key=lambda r: (-r[2], r[0]))
    assert srows == expect


def test_two_hop_reach_coactivity_matches_oracle(spark, ev_con):
    """Registered r11 (graph_two_hop_reach): 2-hop reach over the SHARED co-activity graph — the
    exact construction the registration will use — value-locked at
    both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.graph import two_hop_reach
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in two_hop_reach(edges).collect()]
    drows = con.execute(TWO_HOP_COACT_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both scales


def test_ngram_novelty_matches_oracle(spark, sf_con):
    """Registered r11 (dedup_ngram_novelty): per-source 3-gram novelty of snapshot B against
    snapshot A (the dedup_snapshot_delta derivation, so the two cards
    read together) — value-locked at both scales BEFORE
    registration (r13)."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_novelty,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    snap_a = docs.filter(F.col("doc_id") % 20 != 19).select(
        "doc_id", "source", "text"
    )
    snap_b = docs.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    srows = sorted(
        tuple(r) for r in ngram_novelty(snap_a, snap_b, n=3).collect()
    )
    drows = sorted(tuple(r) for r in con.execute(NOVELTY_ORACLE).fetchall())
    assert srows == drows
    # the ' v2' re-versioned docs guarantee genuinely novel grams, and
    # the shared majority guarantees non-novel ones — both branches live
    assert any(r[2] > 0 for r in srows)
    assert all(r[2] < r[1] for r in srows)


def test_centroid_outliers_matches_oracle(spark, emb_con):
    """Registered r11 (embed_centroid_outliers): bottom-k cosine-to-own-label-centroid (the
    embedding-space mislabel/garbage shortlist) — value-locked at both
    scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.similarity import (
        centroid_outliers,
    )

    sf_dir, con = emb_con
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [tuple(r) for r in centroid_outliers(emb, k=10).collect()]
    drows = con.execute(CENTROID_OUTLIERS_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 10
    # bottom-k is ordered most-anomalous first
    assert srows[0][2] <= srows[-1][2]


# --- Round 11 registrations, second wave (originally staged for r12) ---------
#
# Same discipline as rounds 8-11: each operator below was implemented
# and unit-tested first, its DuckDB twin value-locked at sf0.001 AND
# sf0.01 here, and THEN registered (the r11 window had room for all
# staged work) — so the first driver row can only be green. The
# oracle strings live in plans/queries.py next to their registrations;
# these locks import and re-verify THE SAME strings.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    BENFORD_ORACLE_SQL as BENFORD_ORACLE,
    BURSTINESS_ORACLE_SQL as BURSTINESS_ORACLE,
    DECILES_ORACLE_SQL as DECILES_ORACLE,
    ENTROPY_ORACLE_SQL as ENTROPY_ORACLE,
    FUNNEL_ORACLE_SQL as FUNNEL_ORACLE,
    GINI_ORACLE_SQL as GINI_ORACLE,
    JACCARD_LINK_ORACLE_SQL as JACCARD_LINK_ORACLE,
    JS_ORACLE_SQL as JS_ORACLE,
    NEYMAN_ORACLE_SQL as NEYMAN_ORACLE,
    PMI_ORACLE_SQL as PMI_ORACLE,
    REPETITION_ORACLE_SQL as REPETITION_ORACLE,
    TOPK_KEY_ORACLE_SQL as TOPK_KEY_ORACLE,
)



def test_repetition_profile_matches_oracle(spark, sf_con):
    """Registered r11 (second wave): Gopher-class intra-doc repetition worst-10
    (duplicated-3-gram instance fraction + top-2-gram mass share) —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        repetition_profile,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in repetition_profile(docs, k=10).collect()]
    drows = con.execute(REPETITION_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 10
    # the synthetic corpus has SOME in-doc repetition but is nowhere
    # near degenerate: the worst doc repeats, but far below half
    assert 0.0 < srows[0][2] < 0.5




def test_pmi_collocations_matches_oracle(spark, sf_con):
    """Registered r11 (second wave): top-15 PMI collocations (nano-quantized per-factor
    logs, min_count=5 hapax guard) — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        pmi_collocations,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [
        tuple(r) for r in pmi_collocations(docs, min_count=5, k=15).collect()
    ]
    drows = con.execute(PMI_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 15
    # every surviving pair beat the frequency guard and PMI is ordered
    assert all(r[2] >= 5 for r in srows)
    assert srows[0][3] >= srows[-1][3]




def test_js_divergence_matches_oracle(spark, ev_con):
    """Registered r11 (second wave): Jensen-Shannon divergence between the first- and
    second-half-of-month value distributions over the PSI bins —
    value-locked at both scales BEFORE registration."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.drift import js_divergence

    sf_dir, con = ev_con
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = js_divergence(
        ev.filter(F.dayofmonth("ts") <= 15),
        ev.filter(F.dayofmonth("ts") > 15),
        "value",
        n_bins=10,
        lo=0.0,
        hi=200.0,
    )
    srow = [tuple(r) for r in out.collect()]
    drow = con.execute(JS_ORACLE).fetchall()
    assert srow == drow
    # an undrifted synthetic corpus: JS is small, positive, < ln 2
    assert 0.0 < srow[0][2] < 0.693147




def test_jaccard_link_prediction_matches_oracle(spark, ev_con):
    """Registered r11 (second wave): neighborhood-Jaccard link prediction over the
    SHARED co-activity graph — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.graph import (
        jaccard_link_prediction,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in jaccard_link_prediction(edges).collect()]
    drows = con.execute(JACCARD_LINK_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both scales




def test_neyman_allocation_matches_oracle(spark, sf_con):
    """Registered r11 (second wave): Neyman-optimal stratified allocation of a
    1000-row budget across document sources by n_chars dispersion —
    value-locked at both scales BEFORE registration, plus the exact
    budget invariant the oracle can't see failing."""
    from etl_developstoday_test_spark.operators.sampling import (
        neyman_allocation,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [
        tuple(r)
        for r in neyman_allocation(
            docs, "source", "n_chars", total_n=1000
        ).collect()
    ]
    drows = con.execute(NEYMAN_ORACLE).fetchall()
    assert srows == drows
    assert sum(r[3] for r in srows) == 1000  # exact budget, always
    assert all(r[2] > 0 for r in srows)  # real dispersion per stratum




def test_funnel_conversion_matches_oracle(spark, ev_con):
    """Registered r11 (second wave): ordered view→click→purchase funnel (strictly-after
    first-anchor semantics) — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.events_etl import (
        funnel_conversion,
    )

    sf_dir, con = ev_con
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    srows = [tuple(r) for r in funnel_conversion(ev).collect()]
    drows = con.execute(FUNNEL_ORACLE).fetchall()
    assert srows == drows
    # the funnel can only narrow
    assert srows[0][2] >= srows[1][2] >= srows[2][2]


# --- Round 11 registrations, third wave (corpus-health probes) ----------------
#
# Same discipline: implemented + unit-tested first, DuckDB twins
# value-locked at sf0.001 AND sf0.01 here, then registered in the
# same round (the r11 window had room). These six close the
# corpus-card gaps the first wave left: temporal pattern (burstiness), behavioral
# diversity (type entropy), whole-distribution concentration (exact
# Gini), numeric-integrity (Benford), cross-language score
# normalization (decile thresholds), and hot-key skew diagnosis.



def test_interarrival_burstiness_matches_oracle(spark, ev_con):
    """Registered r11 (third wave): per-user Goh-Barabási burstiness of
    inter-arrival gaps, worst-20 — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_burstiness,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in interarrival_burstiness(ev).collect()]
    drows = con.execute(BURSTINESS_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both scales
    # B is bounded in (-1, 1) by construction and the card is ordered
    assert all(-1.0 < r[3] < 1.0 for r in srows)
    assert srows[0][3] >= srows[-1][3]




def test_user_type_entropy_matches_oracle(spark, ev_con):
    """Registered r11 (third wave): per-user Shannon entropy of the
    event-type mix, most-diverse-20 — value-locked at both scales
    BEFORE registration."""
    import math

    from etl_developstoday_test_spark.operators.events_etl import (
        user_type_entropy,
    )

    sf_dir, con = ev_con
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    srows = [tuple(r) for r in user_type_entropy(ev).collect()]
    drows = con.execute(ENTROPY_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # H is bounded by ln(n_types) per row (allow the 6-dp round up)
    assert all(r[3] <= math.log(r[2]) + 1e-6 for r in srows)




def test_user_gini_matches_oracle(spark, ev_con):
    """Registered r11 (third wave): exact Gini coefficient of events-per-user
    concentration via the closed-form (count, multiplicity) blocks —
    no corpus-sized window anywhere — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        user_gini_concentration,
    )

    sf_dir, con = ev_con
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    srows = [tuple(r) for r in user_gini_concentration(ev).collect()]
    drows = con.execute(GINI_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 1
    assert 0.0 <= srows[0][2] < 1.0




@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def ord_con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{request.param}/orders.parquet'"
    )
    yield request.param, c
    c.close()


def test_benford_first_digit_matches_oracle(spark, ord_con):
    """Registered r11 (third wave): Benford first-digit conformance audit of
    o_totalprice (integer-cents leading digit, baked nano-quantized
    expected shares, Pearson chi-square) — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import (
        benford_first_digit,
    )

    sf_dir, con = ord_con
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    srows = [
        tuple(r) for r in benford_first_digit(orders, "o_totalprice").collect()
    ]
    drows = con.execute(BENFORD_ORACLE).fetchall()
    assert srows == drows
    assert [r[0] for r in srows] == list(range(1, 10))
    # shares are a distribution; the uniform-ish synthetic price column
    # should NOT fit Benford (that's the audit working: chi2 >> 0)
    assert abs(sum(r[2] for r in srows) - 1.0) < 1e-4
    assert srows[0][5] > 100.0




def test_quality_decile_thresholds_matches_oracle(spark, sf_con):
    """Registered r11 (third wave): per-language exact decile thresholds of
    the doc-length score (CCNet-style cross-language normalization
    lookup; pure-integer CDF test over the value-multiplicity table) —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.sampling import (
        quality_decile_thresholds,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in quality_decile_thresholds(docs).collect()]
    drows = con.execute(DECILES_ORACLE).fetchall()
    assert srows == drows
    # every language emits exactly 9 deciles, monotone in threshold
    langs = {r[0] for r in srows}
    assert all(
        sum(1 for r in srows if r[0] == g) == 9 for g in langs
    )
    for g in langs:
        ts = [r[2] for r in srows if r[0] == g]
        assert ts == sorted(ts)




def test_topk_key_share_matches_oracle(spark, sf_con):
    """Registered r11 (third wave): hot-key skew profile of l_suppkey (top-20
    keys, share + cumulative head share; TakeOrderedAndProject then a
    k-row window) — value-locked at both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.skew import topk_key_share

    sf_dir, con = sf_con
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    srows = [tuple(r) for r in topk_key_share(li, "l_suppkey").collect()]
    drows = con.execute(TOPK_KEY_ORACLE).fetchall()
    assert srows == drows
    assert [r[0] for r in srows] == list(range(1, len(srows) + 1))
    # cumulative share is monotone and ends at the head's true share
    cs = [r[4] for r in srows]
    assert cs == sorted(cs)


# --- Round 11 registrations, fourth wave (originally staged for r13) ----------
#
# Same discipline: six operators rounding out the relational-dq /
# sequence-mining / link-prediction / corpus-mixture /
# model-evaluation / embedding-health families, each value-locked at
# sf0.001 AND sf0.01 BEFORE registration; the oracle strings live in
# plans/queries.py next to their registrations.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    ADAMIC_ORACLE_SQL as ADAMIC_ORACLE,
    CHI2_CAT_ORACLE_SQL as CHI2_CAT_ORACLE,
    CLUSTER_HIST_ORACLE_SQL as CLUSTER_HIST_ORACLE,
    FK_ORPHANS_ORACLE_SQL as FK_ORPHANS_ORACLE,
    HASH_BALANCE_ORACLE_SQL as HASH_BALANCE_ORACLE,
    NB_AUC_ORACLE_SQL as NB_AUC_ORACLE,
    NORM_PROFILE_ORACLE_SQL as NORM_PROFILE_ORACLE,
    PARETO_ORACLE_SQL as PARETO_ORACLE,
    SOURCE_JS_ORACLE_SQL as SOURCE_JS_ORACLE,
    TOP_PATHS_ORACLE_SQL as TOP_PATHS_ORACLE,
)



@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def star_con(request):
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "part", "documents"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{request.param}/{t}.parquet'"
        )
    yield request.param, c
    c.close()


def test_fk_orphan_audit_matches_oracle(spark, star_con):
    """Registered r11 (fourth wave): referential-integrity orphan card over three real
    star-schema relations plus one simulated 10%-parent-loss relation
    (so the non-zero path is exercised at corpus scale) — value-locked
    at both scales BEFORE registration."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.dq import fk_orphan_audit

    sf_dir, con = star_con
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = fk_orphan_audit(
        [
            ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
            ("lineitem->part", li, "l_partkey", part, "p_partkey"),
            ("orders->customer", orders, "o_custkey", cust, "c_custkey"),
            (
                "orders->customer(sim_lost_10pct)",
                orders,
                "o_custkey",
                cust.filter(F.col("c_custkey") % 10 != 7),
                "c_custkey",
            ),
        ]
    )
    srows = [tuple(r) for r in out.collect()]
    drows = con.execute(FK_ORPHANS_ORACLE).fetchall()
    assert srows == drows
    by_rel = {r[0]: r for r in srows}
    # the intact relations audit clean; the simulated loss does not
    assert by_rel["lineitem->orders"][3] == 0
    assert by_rel["orders->customer"][3] == 0
    assert by_rel["orders->customer(sim_lost_10pct)"][3] > 0




def test_top_event_paths_matches_oracle(spark, ev_con):
    """Registered r11 (fourth wave): most-frequent 3-step event-type paths across user
    streams with their share of all paths — value-locked at both
    scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        top_event_paths,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in top_event_paths(ev).collect()]
    drows = con.execute(TOP_PATHS_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 20
    assert all(r[0].count(">") == 2 for r in srows)
    assert srows[0][1] >= srows[-1][1]




def test_adamic_adar_matches_oracle(spark, ev_con):
    """Registered r11 (fourth wave): Adamic-Adar link prediction over the SHARED
    co-activity graph (rarity-weighted shared neighbors) —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [
        tuple(r) for r in adamic_adar_link_prediction(edges).collect()
    ]
    drows = con.execute(ADAMIC_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both scales
    assert all(r[3] > 0 for r in srows)




def test_source_vocab_js_matches_oracle(spark, sf_con):
    """Registered r11 (fourth wave): pairwise Jensen-Shannon divergence between
    per-source unigram distributions (the corpus-mixture distance
    matrix) — value-locked at both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        source_vocab_js,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in source_vocab_js(docs).collect()]
    drows = con.execute(SOURCE_JS_ORACLE).fetchall()
    assert srows == drows
    # every unordered pair appears once; JS bounded in (0, ln 2]
    n_src = len({r[0] for r in srows} | {r[1] for r in srows})
    assert len(srows) == n_src * (n_src - 1) // 2
    assert all(0.0 < r[4] <= 0.693148 for r in srows)


def test_nb_margin_auc_matches_oracle(spark, sf_con):
    """Registered r11 (fourth wave): tie-aware Mann-Whitney AUC of the NB decision
    margin as a confidence signal, computed scale-safe over the
    centi-quantized margin multiplicity table (shares the registered
    NB model CTEs verbatim) — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.ml import nb_margin_auc

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srow = [tuple(r) for r in nb_margin_auc(docs).collect()]
    drow = con.execute(NB_AUC_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    assert 0.0 <= srow[0][2] <= 1.0
    # at the larger scale the margin carries real signal; at sf0.001
    # the handful of held-out docs genuinely anti-correlate (~0.39) —
    # which is exactly the situation the gate exists to catch
    if sf_dir == SF_DIR_ORACLE:
        assert srow[0][2] > 0.5




def test_norm_profile_matches_oracle(spark, emb_con):
    """Registered r11 (fourth wave): per-label embedding norm profile on the exact
    integer pico scale (RMS norm, std of the squared norm, z-tail
    counts) — value-locked at both scales BEFORE registration (r13). The
    pico construction is the point: a unit-normalized corpus has
    std(norm) ~1e-6, below any 10-dp decimal waypoint."""
    from etl_developstoday_test_spark.operators.similarity import (
        norm_profile,
    )

    sf_dir, con = emb_con
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [tuple(r) for r in norm_profile(embs).collect()]
    drows = con.execute(NORM_PROFILE_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # the synthetic embeddings are unit-normalized: RMS ~ 1
    assert all(abs(r[2] - 1.0) < 0.01 for r in srows)


# --- Round 11 registrations, fifth wave ----------------------------------------
#
# Four more: sampler-integrity (hash-split uniformity), dedup structure
# (cluster-size histogram over a constructed duplicated corpus),
# value concentration (Pareto ntile curve), and the drift kit's
# categorical leg (chi-square homogeneity). Same two-scale locks,
# applied BEFORE registration.



def test_hash_split_balance_matches_oracle(spark, sf_con):
    """Registered r11 (fifth wave): chi-square uniformity audit of the
    100-bucket md5 hash split over doc_id — value-locked at both
    scales BEFORE registration. The synthetic corpus's keys must
    audit as uniform (chi2 far below the ~149 p=0.001 cut for 99 df).
    """
    from etl_developstoday_test_spark.operators.sampling import (
        hash_split_balance_audit,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srow = [tuple(r) for r in hash_split_balance_audit(docs, "doc_id").collect()]
    drow = con.execute(HASH_BALANCE_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    assert srow[0][1] == 100
    assert srow[0][2] < 149.0  # uniform split passes its own audit




def test_cluster_size_histogram_matches_oracle(spark, sf_con):
    """Registered r11 (fifth wave): exact-duplicate cluster-size histogram
    over a CONSTRUCTED duplicated corpus (docs ∪ every-7th doc — the
    synthetic corpus alone has no exact dupes, and a histogram of all
    1s locks nothing) — value-locked at both scales BEFORE
    registration (r13)."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.text_dedup import (
        cluster_size_histogram,
    )

    sf_dir, con = sf_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.select("text").unionAll(
        docs.filter(F.col("doc_id") % 7 == 0).select("text")
    )
    srows = [tuple(r) for r in cluster_size_histogram(corpus).collect()]
    drows = con.execute(CLUSTER_HIST_ORACLE).fetchall()
    assert srows == drows
    by_size = {r[0]: r for r in srows}
    assert 1 in by_size and 2 in by_size  # both classes exercised
    assert 0.0 < srows[0][4] < 1.0  # real savings, not degenerate




def test_pareto_revenue_curve_matches_oracle(spark, ord_con):
    """Registered r11 (fifth wave): customer-revenue Pareto decile curve
    (exact integer cents, exact_ntile cut = SQL ntile) — value-locked
    at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.skew import (
        pareto_revenue_curve,
    )

    sf_dir, con = ord_con
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    srows = [
        tuple(r)
        for r in pareto_revenue_curve(
            orders, "o_custkey", "o_totalprice"
        ).collect()
    ]
    drows = con.execute(PARETO_ORACLE).fetchall()
    assert srows == drows
    assert [r[0] for r in srows] == list(range(1, 11))
    # tile 1 = heaviest: shares strictly dominate the bottom tile and
    # cumulative share is monotone to 1.0
    assert srows[0][3] > srows[-1][3]
    assert srows[-1][4] == 1.0




def test_chi2_categorical_matches_oracle(spark, ev_con):
    """Registered r11 (fifth wave): chi-square homogeneity of the event-type
    mix between the first- and second-half-of-month (the drift kit's
    categorical leg) — value-locked at both scales BEFORE
    registration (r13)."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.drift import (
        chi2_categorical,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    out = chi2_categorical(
        ev.filter(F.dayofmonth("ts") <= 15),
        ev.filter(F.dayofmonth("ts") > 15),
        "event_type",
    )
    srows = [tuple(r) for r in out.collect()]
    drows = con.execute(CHI2_CAT_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) >= 2
    # contributions are non-negative and dof = k-1 on every row
    assert all(r[3] >= 0.0 and r[5] == len(srows) - 1 for r in srows)


# --- Registered in round 12 (staged here in round 11) ------------------------
#
# Staged while the r11 window was full (28 first-rows + 22 rotation
# slots), registered in r12; the oracle strings now live in
# plans/queries.py and these locks import them (single source of
# truth).

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    UNIQUENESS_ORACLE_SQL as UNIQUENESS_ORACLE,
)


def test_uniqueness_audit_matches_oracle(spark, star_con):
    """Registered r12: candidate-key uniqueness card over two real keys
    plus one deliberately non-unique control (orders.o_custkey) so the
    violation path is exercised at corpus scale — value-locked at both
    scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.dq import uniqueness_audit

    sf_dir, con = star_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = uniqueness_audit(
        [
            ("documents.doc_id", docs, ["doc_id"]),
            (
                "lineitem.(l_orderkey,l_linenumber)",
                li,
                ["l_orderkey", "l_linenumber"],
            ),
            ("orders.o_custkey(non-key control)", orders, ["o_custkey"]),
        ]
    )
    srows = [tuple(r) for r in out.collect()]
    drows = con.execute(UNIQUENESS_ORACLE).fetchall()
    assert srows == drows
    by_k = {r[0]: r for r in srows}
    assert by_k["documents.doc_id"][6] is True
    # a real finding, locked: the SYNTHETIC lineitem does NOT enforce
    # the TPC-H (l_orderkey, l_linenumber) composite key — exactly the
    # assumption-check this audit exists for
    li_row = by_k["lineitem.(l_orderkey,l_linenumber)"]
    assert li_row[6] is False and li_row[5] > 0
    ck = by_k["orders.o_custkey(non-key control)"]
    assert ck[6] is False and ck[4] > 0


@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def docstar_con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{request.param}/documents.parquet'"
    )
    yield request.param, c
    c.close()


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    AUTOCORR_ORACLE_SQL as AUTOCORR_ORACLE,
)


def test_daily_autocorr_matches_oracle(spark, ev_con):
    """Registered r12: lag-1 Pearson autocorrelation of the daily-mean
    value series — the drift kit's time-structure leg — value-locked
    at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import (
        daily_autocorr_lag1,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [tuple(r) for r in daily_autocorr_lag1(ev, "value").collect()]
    drow = con.execute(AUTOCORR_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    assert -1.0 <= srow[0][2] <= 1.0
    assert srow[0][1] == srow[0][0] - 1  # consecutive calendar days


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    HEAPS_ORACLE_SQL as HEAPS_ORACLE,
)


def test_heaps_law_fit_matches_oracle(spark, docstar_con):
    """Registered r12: Heaps'-law vocabulary growth curve over 10 nested
    md5 doc prefixes with the log-log least-squares exponent —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        heaps_law_fit,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in heaps_law_fit(docs).collect()]
    drows = con.execute(HEAPS_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 10
    # growth curve is monotone and the exponent is a real sublinear fit
    nt = [r[1] for r in srows]
    vs = [r[2] for r in srows]
    assert nt == sorted(nt) and vs == sorted(vs)
    assert 0.0 < srows[0][3] < 1.0


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    LOCAL_BRIDGES_ORACLE_SQL as LOCAL_BRIDGES_ORACLE,
)


def test_local_bridges_matches_oracle(spark, ev_con):
    """Registered r12: local bridges (edges with zero common neighbors —
    the weak-tie/cross-community conduit audit) over the SHARED
    co-activity graph, highest-traffic first — value-locked at both
    scales BEFORE registration. The sf0.001 co-activity graph is
    triangle-free (share = 1.0); sf0.01 exercises both classes."""
    from etl_developstoday_test_spark.operators.graph import local_bridges
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in local_bridges(edges).collect()]
    drows = con.execute(LOCAL_BRIDGES_ORACLE).fetchall()
    assert srows == drows
    assert srows
    assert all(0.0 < r[4] <= 1.0 for r in srows)


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    TWO_HOP_SAMPLED_ORACLE_SQL as TWO_HOP_SAMPLED_ORACLE,
)


def test_two_hop_reach_sampled_matches_oracle(spark, ev_con):
    """Registered r12: seeded source-sampled twin of two_hop_reach —
    deterministic md5 1/4 source subset, exact per-node reach, so the
    output hash-matches the oracle at both scales (no estimator
    tolerance needed). Every returned node must satisfy the sample
    predicate, and its reach must equal the EXACT twin's reach for the
    same node (source sampling never changes a sampled node's value)."""
    from etl_developstoday_test_spark.operators.graph import (
        two_hop_reach,
        two_hop_reach_sampled,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in two_hop_reach_sampled(edges, 4).collect()]
    drows = con.execute(TWO_HOP_SAMPLED_ORACLE).fetchall()
    assert srows == drows
    assert srows
    import hashlib

    for node, _deg, _reach in srows:
        h = int(hashlib.md5(f"r2s#{node}".encode()).hexdigest()[:15], 16)
        assert h % 4 == 0
    n_nodes = (
        edges.selectExpr("ua AS u")
        .unionAll(edges.selectExpr("ub AS u"))
        .distinct()
        .count()
    )
    exact = {
        r["node"]: r["reach_2hop"]
        for r in two_hop_reach(edges, top_k=n_nodes).collect()
    }
    assert all(exact[n] == reach for n, _d, reach in srows)


# --- Round-12 net-new operators (locked at both scales, registered in
# the same round once the window arithmetic cleared the r5 bucket) ----------

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    FD_AUDIT_ORACLE_SQL as FD_AUDIT_ORACLE,
    POWERLAW_ORACLE_SQL as POWERLAW_ORACLE,
    RETENTION_ORACLE_SQL as RETENTION_ORACLE,
    SIMPSON_ORACLE_SQL as SIMPSON_ORACLE,
)


@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def fd_con(request):
    c = duckdb.connect()
    for t in ["documents", "nation", "orders"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{request.param}/{t}.parquet'"
        )
    yield request.param, c
    c.close()


def test_functional_dependency_matches_oracle(spark, fd_con):
    """Registered r12: FD audit over one dependency that HOLDS
    (nation.n_name -> n_regionkey) and two genuinely violated ones —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.dq import (
        functional_dependency_audit,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = fd_con
    out = functional_dependency_audit(
        [
            (
                "documents.source->lang",
                load_table(spark, sf_dir, "documents"),
                "source",
                "lang",
            ),
            (
                "nation.n_name->n_regionkey",
                load_table(spark, sf_dir, "nation"),
                "n_name",
                "n_regionkey",
            ),
            (
                "orders.o_custkey->o_orderpriority",
                load_table(spark, sf_dir, "orders"),
                "o_custkey",
                "o_orderpriority",
            ),
        ]
    )
    srows = [tuple(r) for r in out.collect()]
    drows = con.execute(FD_AUDIT_ORACLE).fetchall()
    assert srows == drows
    by = {r[0]: r for r in srows}
    assert by["nation.n_name->n_regionkey"][6] is True
    assert by["documents.source->lang"][6] is False
    assert by["documents.source->lang"][4] > 0
    assert by["orders.o_custkey->o_orderpriority"][6] is False


def test_degree_powerlaw_matches_oracle(spark, ev_con):
    """Registered r12: degree histogram + CSN discrete MLE over the
    SHARED co-activity graph — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.graph import (
        degree_powerlaw_fit,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in degree_powerlaw_fit(edges).collect()]
    drows = con.execute(POWERLAW_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # histogram covers every vertex once: sum of n_nodes = vertex count
    n_vertices = (
        edges.selectExpr("ua AS u")
        .unionAll(edges.selectExpr("ub AS u"))
        .distinct()
        .count()
    )
    assert sum(r[1] for r in srows) == n_vertices
    assert all(r[2] > 1.0 for r in srows)  # MLE alpha is always > 1


def test_retention_cohorts_matches_oracle(spark, ev_con):
    """Registered r12: weekly cohort-retention triangle — value-locked
    at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        retention_cohorts,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in retention_cohorts(ev).collect()]
    drows = con.execute(RETENTION_ORACLE).fetchall()
    assert srows == drows
    # every cohort has a week-0 row with retention exactly 1.0, and no
    # cell exceeds its cohort size
    week0 = {r[0] for r in srows if r[1] == 0}
    assert week0 == {r[0] for r in srows}
    assert all(r[4] == 1.0 for r in srows if r[1] == 0)
    assert all(r[2] <= r[3] for r in srows)


def test_simpson_diversity_matches_oracle(spark, docstar_con):
    """Registered r12: per-language Simpson diversity — value-locked
    at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        simpson_diversity,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in simpson_diversity(docs).collect()]
    drows = con.execute(SIMPSON_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for _lang, n_tokens, n_types, lam, gini, inv in srows:
        assert 0.0 < lam <= 1.0
        assert abs((lam + gini) - 1.0) < 2e-6
        # effective types can't exceed the actual type count (+rounding)
        assert 1.0 <= inv <= n_types + 1e-6


# --- Registered round 13 (staged in r12; the oracle strings now live
# in plans/queries.py and these locks import them — lock and
# registration are one artifact, the single-source-of-truth
# discipline).

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    IVJ_ATTRIBUTION_ORACLE_SQL as IVJ_ORACLE,
)


def _session_attribution(spark, sf_dir):
    """The staged registration shape: purchases interval-joined into
    view/click sessions padded by a 30-minute attribution window."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators import events_etl
    from etl_developstoday_test_spark.operators.asof import (
        interval_bucket_join,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    sessions = events_etl.sessionize(
        ev.filter(F.col("event_type").isin("view", "click"))
    ).select(
        "user_id",
        "session_id",
        "session_start",
        F.timestamp_micros(
            F.unix_micros("session_end") + F.lit(1_800_000_000)
        ).alias("attr_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    hits = interval_bucket_join(
        purchases, sessions, "user_id", "ts", "session_start", "attr_end"
    )
    return (
        hits.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_attributed"),
            F.countDistinct("session_id")
            .cast("long")
            .alias("n_sessions_hit"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("attributed_cents"),
        )
        .orderBy(F.desc("attributed_cents"), F.asc("user_id"))
        .limit(20)
    )


def test_interval_bucket_join_matches_oracle(spark, ev_con):
    """Registered r13: bucket-blocked interval join (purchase → padded
    view/click session attribution) — the oracle is the plain theta
    join, result-identical because bucket blocking is lossless (every
    point lives in exactly one bucket and every covering interval has
    a replica there) — value-locked at both scales BEFORE
    registration (r13)."""
    sf_dir, con = ev_con
    srows = [tuple(r) for r in _session_attribution(spark, sf_dir).collect()]
    drows = con.execute(IVJ_ORACLE).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both lock scales (4 / 43 pairs)
    assert all(r[1] >= r[2] for r in srows)  # pairs >= distinct sessions


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    IVJ_ZERO_MATCH_ORACLE_SQL,
)


def test_interval_zero_match_matches_oracle(spark, ev_con):
    """Registered r13 (r12 VERDICT item 8): the interval join's
    NEGATIVE path — every attribution window shifted 31 days past the
    session, strictly beyond the 30-day corpus span, so the range
    residual must reject every same-(key, bucket) candidate and the
    empty-result path must still produce a well-formed 0-hit card —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.plans.queries import QUERIES

    sf_dir, con = ev_con
    srow = [
        tuple(r)
        for r in QUERIES["join_interval_zero_match"](spark, sf_dir).collect()
    ]
    drow = con.execute(IVJ_ZERO_MATCH_ORACLE_SQL).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n_purchases, n_intervals, n_hits = srow[0]
    # non-degenerate negative test: both sides populated, zero matches
    assert n_purchases > 0 and n_intervals > 0
    assert n_hits == 0


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    KAPPA_ORACLE_SQL as KAPPA_ORACLE,
)


def test_cohen_kappa_matches_oracle(spark, docstar_con):
    """Registered r13: Cohen's kappa between the wordlist language-ID
    heuristic and the reference labels — chance-corrected agreement,
    reusing the registered lang-id oracle as the prediction CTE —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.ml import (
        cohen_kappa_agreement,
    )
    from etl_developstoday_test_spark.operators.text_analysis import lang_id

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cohen_kappa_agreement(lang_id(docs), "lang", "predicted_lang")
    srow = [tuple(r) for r in out.collect()]
    drow = con.execute(KAPPA_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n, agree, po, pe, kappa = srow[0]
    assert 0 < agree <= n
    assert kappa <= 1.0 and kappa > -1.0
    assert abs((po - pe) / (1 - pe) - kappa) < 2e-6


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    DOW_ANOVA_ORACLE_SQL as ANOVA_ORACLE,
)


def test_dow_seasonality_anova_matches_oracle(spark, ev_con):
    """Registered r13: day-of-week one-way ANOVA of the daily-mean value
    series (ISO weekdays, micro-quantized daily means shared with the
    autocorrelation leg) — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.drift import (
        dow_seasonality_anova,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in dow_seasonality_anova(ev, "value").collect()]
    drows = con.execute(ANOVA_ORACLE).fetchall()
    assert srows == drows
    assert [r[0] for r in srows] == sorted(r[0] for r in srows)
    assert len(srows) == 7  # a month of events covers every weekday
    assert all(r[3] >= 0.0 for r in srows)
    assert srows[0][4] == len(srows) - 1  # df_between = k - 1


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    BIGRAM_ENTROPY_ORACLE_SQL as ENTROPY_RATE_ORACLE,
)


def test_bigram_entropy_rate_matches_oracle(spark, docstar_con):
    """Registered r13: per-language bigram entropy rate H(w2|w1) = H2 - H1
    (chain-rule plug-in, nano-quantized ln, decimal(38,0) vocab-table
    sums) — value-locked at both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        bigram_entropy_rate,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in bigram_entropy_rate(docs).collect()]
    drows = con.execute(ENTROPY_RATE_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for _lang, n_t, n_b, h1, h2, rate in srows:
        assert n_b < n_t  # one bigram fewer than tokens per doc
        assert h1 >= 0.0 and h2 >= 0.0
        # conditioning can only reduce entropy per token: rate <= h1
        # on a template corpus; allow rounding slack
        assert rate <= h1 + 2e-6


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    RICH_CLUB_ORACLE_SQL as RICH_CLUB_ORACLE,
)


def test_rich_club_matches_oracle(spark, ev_con):
    """Registered r13: rich-club coefficient curve over the SHARED
    co-activity graph (two bounded histograms, never a pass per k) —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.graph import (
        rich_club_coefficient,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in rich_club_coefficient(edges).collect()]
    drows = con.execute(RICH_CLUB_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # rich nodes/edges shrink monotonically as k rises
    nn = [r[1] for r in srows]
    ne = [r[2] for r in srows]
    assert nn == sorted(nn, reverse=True)
    assert ne == sorted(ne, reverse=True)
    assert all(0.0 <= r[3] <= 1.0 for r in srows)


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    HALF_SAMPLE_ORACLE_SQL,
)


def test_half_sample_ci_matches_oracle(spark, ev_con):
    """Registered r13: half-sample replication CI for the events value
    mean — 32 replicas from one md5's bits, one aggregate pass, zero
    fan-out — value-locked at both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.sampling import (
        half_sample_mean_ci,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [
        tuple(r) for r in half_sample_mean_ci(ev, "value", "event_id").collect()
    ]
    drow = con.execute(HALF_SAMPLE_ORACLE_SQL).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n, mean, se, lo, hi, B = srow[0]
    assert lo < mean < hi and se > 0 and B == 32
    # the replication se lands in the right decade: against the
    # textbook sigma/sqrt(n) it may differ by small factors, never
    # orders of magnitude on ~uniform data
    assert se < (hi - lo)


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    MAD_VOLUME_ORACLE_SQL as MAD_VOLUME_ORACLE,
)


def test_daily_volume_mad_matches_oracle(spark, ev_con):
    """Registered r13: daily ingest-volume modified-z card (median/MAD,
    every day scored, |M| > 3.5 flags) — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import (
        daily_volume_mad_anomalies,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in daily_volume_mad_anomalies(ev).collect()]
    drows = con.execute(MAD_VOLUME_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 30  # the synthetic corpus spans 30 days
    # exactly half the days sit at or below the median by construction
    assert sum(1 for r in srows if r[1] <= r[2]) >= 15


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    WEEKLY_AUTOCORR_ORACLE_SQL as WEEKLY_AUTOCORR_ORACLE,
)


def test_weekly_autocorr_matches_oracle(spark, ev_con):
    """Registered r13: lag-7 (week-over-week) daily-mean autocorrelation —
    the STRENGTH companion to the day-of-week ANOVA's existence test,
    via the lag-generalized daily_autocorr_lag1 (lag_days=7;
    calendar-exact pairs at any lag) — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import (
        daily_autocorr_lag1,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [
        tuple(r)
        for r in daily_autocorr_lag1(ev, "value", lag_days=7).collect()
    ]
    drow = con.execute(WEEKLY_AUTOCORR_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    assert -1.0 <= srow[0][2] <= 1.0
    # 30 observed days -> exactly 23 calendar lag-7 pairs
    assert srow[0][1] == srow[0][0] - 7


# --- Round-13 net-new: the sampled wedge-family twins (r12 VERDICT
# item 3) — locked at both scales BEFORE registration; sample_mod=1 ==
# exact is property-pinned in tests/test_properties.py.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    ADAMIC_SAMPLED_ORACLE_SQL,
    JACCARD_SAMPLED_ORACLE_SQL,
    LOCAL_BRIDGES_SAMPLED_ORACLE_SQL,
)


def test_local_bridges_sampled_matches_oracle(spark, ev_con):
    """Registered r13: lower-endpoint-sampled local bridges — every
    reported bridge is a TRUE bridge of the full graph (the sampled
    pair's closing evidence is complete), counts over the sampled
    edge subset, hash-matchable at both scales (no estimator
    tolerance)."""
    import hashlib

    from etl_developstoday_test_spark.operators.graph import (
        local_bridges,
        local_bridges_sampled,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [tuple(r) for r in local_bridges_sampled(edges, 4).collect()]
    drows = con.execute(LOCAL_BRIDGES_SAMPLED_ORACLE_SQL).fetchall()
    assert srows == drows
    assert srows  # non-degenerate at both lock scales
    for ua, _ub, _ds, _nb, _share in srows:
        h = int(hashlib.md5(f"lbs#{ua}".encode()).hexdigest()[:15], 16)
        assert h % 4 == 0
    # every reported bridge is a bridge of the FULL graph: it appears
    # in the exact twin's (unlimited) bridge audit
    n_edges = edges.count()
    exact_pairs = {
        (r["ua"], r["ub"]) for r in local_bridges(edges, top_k=n_edges).collect()
    }
    assert all((r[0], r[1]) in exact_pairs for r in srows)


def test_jaccard_sampled_matches_oracle(spark, ev_con):
    """Registered r13: candidate-sampled Jaccard link prediction —
    every ranked pair's common count and Jaccard equal the exact
    twin's for the same pair; hash-matchable at both scales."""
    import hashlib

    from etl_developstoday_test_spark.operators.graph import (
        jaccard_link_prediction_sampled,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [
        tuple(r) for r in jaccard_link_prediction_sampled(edges, 4).collect()
    ]
    drows = con.execute(JACCARD_SAMPLED_ORACLE_SQL).fetchall()
    assert srows == drows
    assert srows
    for ua, _ub, c, j in srows:
        h = int(hashlib.md5(f"jls#{ua}".encode()).hexdigest()[:15], 16)
        assert h % 4 == 0
        assert c >= 1 and 0.0 < j <= 1.0


def test_adamic_adar_sampled_matches_oracle(spark, ev_con):
    """Registered r13: candidate-sampled Adamic-Adar link prediction —
    exact rarity-weighted sums for every surviving pair;
    hash-matchable at both scales."""
    import hashlib

    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction_sampled,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [
        tuple(r)
        for r in adamic_adar_link_prediction_sampled(edges, 2).collect()
    ]
    drows = con.execute(ADAMIC_SAMPLED_ORACLE_SQL).fetchall()
    assert srows == drows
    assert srows
    for ua, _ub, c, aa in srows:
        h = int(hashlib.md5(f"aas#{ua}".encode()).hexdigest()[:15], 16)
        assert h % 2 == 0
        assert c >= 1 and aa > 0.0


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    KCORE_CAPPED_ORACLE_SQL,
)


def test_kcore_capped_matches_oracle(spark, ev_con):
    """Registered r13 (r12 VERDICT item 4): the capped-round k-core
    card — exactly 8 h-index sub-steps + the iter-7 vs iter-8
    convergence certificate — hash-matches the fixed-depth
    recursive-CTE replay at both scales, partitions every vertex, and
    upper-bounds the exact decomposition's histogram tail-wise."""
    from collections import Counter

    from etl_developstoday_test_spark.plans.queries import QUERIES

    sf_dir, con = ev_con
    srows = [
        tuple(r) for r in QUERIES["graph_kcore_capped"](spark, sf_dir).collect()
    ]
    drows = con.execute(KCORE_CAPPED_ORACLE_SQL).fetchall()
    assert srows == drows
    assert srows
    # audit-level columns constant across rows; histogram ordered
    assert len({(r[2], r[3]) for r in srows}) == 1
    assert [r[0] for r in srows] == sorted(r[0] for r in srows)
    # the capped histogram tail-dominates the exact coreness histogram
    exact_rows = QUERIES["graph_kcore_decomposition"](spark, sf_dir).collect()
    exact = Counter(r["coreness"] for r in exact_rows)
    got = {r[0]: r[1] for r in srows}
    assert sum(got.values()) == sum(exact.values())
    for k in set(got) | set(exact):
        assert sum(v for u, v in got.items() if u >= k) >= sum(
            v for u, v in exact.items() if u >= k
        )


# --- Registered round 14 (staged + two-scale value-locked in round 13
# while the r13 window was exactly full: 3 changed + 13 first-rows +
# 19 r6 + 15 oldest-r7 = 50). The oracle strings now live in
# plans/queries.py and these locks import them — lock and registration
# are one artifact, the single-source-of-truth discipline.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CONVERSION_LAG_ORACLE_SQL as CONVERSION_LAG_ORACLE,
)


def test_conversion_lag_matches_oracle(spark, ev_con):
    """Registered r14: first-exposure → first-purchase lag distribution
    (6-hour buckets) with the conversion-rate audit — value-locked at
    both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.events_etl import (
        conversion_lag_card,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in conversion_lag_card(ev).collect()]
    drows = con.execute(CONVERSION_LAG_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # histogram partitions the converted users; lag buckets ascend
    assert sum(r[2] for r in srows) == srows[0][4]
    assert [r[0] for r in srows] == sorted(r[0] for r in srows)
    assert all(r[4] <= r[3] for r in srows)  # converted <= started


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    PAGE_HINKLEY_ORACLE_SQL as PAGE_HINKLEY_ORACLE,
)


def test_page_hinkley_matches_oracle(spark, ev_con):
    """Registered r14: Page-Hinkley running-mean level-shift detector over
    the daily-mean series (delta 0.005, lambda 0.05; nano-quantized
    deviation terms -> pure long prefix arithmetic) — value-locked at
    both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.drift import (
        page_hinkley_daily,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in page_hinkley_daily(ev, "value").collect()]
    drows = con.execute(PAGE_HINKLEY_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 30  # the synthetic corpus spans 30 days
    assert all(r[3] >= 0.0 for r in srows)  # ph = m - min(m) >= 0
    # day 1's deviation term is x1 - x1 - delta = -delta exactly
    assert srows[0][2] == -0.005


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CUSUM_TWOSIDED_ORACLE_SQL as CUSUM2_ORACLE,
)


def test_cusum_twosided_matches_oracle(spark, ev_con):
    """Registered r14: two-sided CUSUM (up + down recurrences from ONE
    shuffle/sort, side-labeled alarms) on the daily mean per
    event_type, target 50 / slack 1 / threshold 15 — value-locked at
    both scales BEFORE registration (r13). The up side must equal the
    registered one-sided detector exactly."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import davg
    from etl_developstoday_test_spark.operators.drift import (
        cusum_changepoints,
        cusum_changepoints_twosided,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.round(davg("value"), 6).alias("daily_mean"))
    out = cusum_changepoints_twosided(
        daily, "daily_mean", "day", "event_type",
        target=50.0, slack=1.0, threshold=15.0,
    )
    srows = sorted(tuple(r) for r in out.collect())
    drows = sorted(
        tuple(r) for r in con.execute(CUSUM2_ORACLE).fetchall()
    )
    assert srows == drows
    assert srows
    sides = {r[3] for r in srows}
    assert sides == {"up", "down"}  # both directions alarm on this data
    up_only = sorted(
        (r[0], r[1], r[2], r[4]) for r in srows if r[3] == "up"
    )
    one_sided = sorted(
        tuple(r)
        for r in cusum_changepoints(
            daily, "daily_mean", "day", "event_type",
            target=50.0, slack=1.0, threshold=15.0,
        ).collect()
    )
    assert up_only == one_sided


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    TERM_BURSTINESS_ORACLE_SQL as TERM_BURSTINESS_ORACLE,
)


def test_term_burstiness_matches_oracle(spark, docstar_con):
    """Registered r14: Church-Gale term burstiness cf/df (mean occurrences
    per containing document) — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        term_burstiness,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in term_burstiness(docs).collect()]
    drows = con.execute(TERM_BURSTINESS_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for _tok, cf, df, b in srows:
        assert cf >= df >= 5
        assert b >= 1.0  # cf/df >= 1 by definition


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    DEGREE_GINI_ORACLE_SQL as DEGREE_GINI_ORACLE,
)


def test_degree_gini_matches_oracle(spark, ev_con):
    """Registered r14: exact degree Gini (rank-block closed form over the
    degree-domain histogram) + Freeman centralization over the SHARED
    co-activity graph — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.graph import (
        degree_gini_centralization,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _coactivity_edges,
    )

    sf_dir, con = ev_con
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srow = [tuple(r) for r in degree_gini_centralization(edges).collect()]
    drow = con.execute(DEGREE_GINI_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n_nodes, n_edges, dmax, gini, centr = srow[0]
    assert 0.0 <= gini < 1.0
    assert 0.0 <= centr <= 1.0
    assert dmax <= n_nodes - 1


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    FK_FANOUT_ORACLE_SQL as FANOUT_ORACLE,
)


def test_fanout_profile_matches_oracle(spark, star_con):
    """Registered r14: orders -> lineitem referential fan-out profile
    (children-per-parent histogram including zero-child parents) —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.dq import fk_fanout_profile
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = star_con
    srows = [
        tuple(r)
        for r in fk_fanout_profile(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            "o_orderkey",
            "l_orderkey",
        ).collect()
    ]
    drows = con.execute(FANOUT_ORACLE).fetchall()
    assert srows == drows
    assert srows
    assert sum(r[1] for r in srows) == srows[0][2]  # partitions parents
    assert sum(r[0] * r[1] for r in srows) == srows[0][3]  # sums children
    assert srows[0][0] == 0  # the zero-child bucket exists in TPC-H-ish data


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    WILSON_CI_ORACLE_SQL as WILSON_ORACLE,
)


def test_wilson_ci_matches_oracle(spark, ev_con):
    """Registered r14: Wilson score interval for the purchase share —
    value-locked at both scales BEFORE registration."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.sampling import (
        proportion_wilson_ci,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [
        tuple(r)
        for r in proportion_wilson_ci(
            ev.select((F.col("event_type") == "purchase").alias("f")), "f"
        ).collect()
    ]
    drow = con.execute(WILSON_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n, k, p, lo, hi = srow[0]
    assert 0.0 <= lo < p < hi <= 1.0
    assert 0 < k < n


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    PARTITION_BALANCE_ORACLE_SQL as PARTITION_BALANCE_ORACLE,
)


def test_partition_balance_matches_oracle(spark, docstar_con):
    """Registered r14: 32-bucket hash-balance forecast for documents.source
    (a low-cardinality key — most reducers idle, which IS the finding)
    — value-locked at both scales BEFORE registration (r13)."""
    from etl_developstoday_test_spark.operators.skew import (
        partition_balance_profile,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [
        tuple(r) for r in partition_balance_profile(docs, "source", 32).collect()
    ]
    drows = con.execute(PARTITION_BALANCE_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 32  # full spine, no NULL sources in testdata
    assert sum(r[1] for r in srows) == docs.count()
    assert srows[0][2] > 1.0  # a low-cardinality key cannot be balanced


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    DAU_WAU_ORACLE_SQL as DAU_WAU_ORACLE,
)


def test_dau_wau_stickiness_matches_oracle(spark, ev_con):
    """Registered r14: DAU / trailing-7-day-WAU stickiness series —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        dau_wau_stickiness,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in dau_wau_stickiness(ev).collect()]
    drows = con.execute(DAU_WAU_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 30  # one row per observed day
    assert all(0.0 < r[3] <= 1.0 and r[1] <= r[2] for r in srows)


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    LENGTH_PCT_ORACLE_SQL as LENGTH_PCT_ORACLE,
)


def test_length_percentiles_matches_oracle(spark, docstar_con):
    """Registered r14: per-source document-length tail card (interpolated
    p50/p90/p99 + max) — value-locked at both scales BEFORE
    registration (r13)."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        length_percentiles_by_source,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [
        tuple(r) for r in length_percentiles_by_source(docs).collect()
    ]
    drows = con.execute(LENGTH_PCT_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for _s, n, p50, p90, p99, mx in srows:
        assert n > 0 and p50 <= p90 <= p99 <= mx




@pytest.fixture(
    scope="module",
    params=[SF_DIR, SF_DIR_ORACLE],
    ids=["sf0.001", "sf0.01"],
)
def emb_con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{request.param}/embeddings.parquet'"
    )
    yield request.param, c
    c.close()


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    PAIR_COSINE_ORACLE_SQL as PAIR_COSINE_ORACLE,
)


def test_pair_cosine_profile_matches_oracle(spark, emb_con):
    """Registered r14: deterministic random-pair cosine histogram + mean
    (the anisotropy EVIDENCE card) — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.similarity import (
        pair_cosine_profile,
    )

    sf_dir, con = emb_con
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [
        tuple(r) for r in pair_cosine_profile(emb, n_buckets=64).collect()
    ]
    drows = con.execute(PAIR_COSINE_ORACLE).fetchall()
    assert srows == drows
    assert srows
    n = emb.count()
    tot = srows[0][3]
    # every vector pairs at most once; at most one odd-one-out per bucket
    assert n // 2 - 64 <= tot <= n // 2
    assert all(-10 <= r[0] <= 9 for r in srows)
    # the synthetic embeddings are ~isotropic: the mean sits near 0
    assert abs(srows[0][4]) < 0.2


def test_adamic_adar_sampled_mod4_at_sf001(spark):
    """r13 VERDICT item 5 (knob-schedule demonstration): at sf0.01 —
    where the candidate pool is deep enough — sample_mod=4 is
    NON-DEGENERATE and hash-matches the mod-4 DuckDB replay, so the
    registered mod-2 row is a lock-scale floor of a documented
    per-scale dial, not the operator's ceiling."""
    from etl_developstoday_test_spark.operators.graph import (
        adamic_adar_link_prediction_sampled,
    )
    from etl_developstoday_test_spark.plans.queries import (
        _adamic_sampled_oracle_sql,
        _coactivity_edges,
    )

    sf_dir = SF_DIR_ORACLE  # sf0.01 only: mod 4 empties the sf0.001 pool
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    _, edges = _coactivity_edges(spark, sf_dir, checkpoint=False)
    srows = [
        tuple(r)
        for r in adamic_adar_link_prediction_sampled(
            edges, sample_mod=4
        ).collect()
    ]
    drows = con.execute(_adamic_sampled_oracle_sql(4)).fetchall()
    con.close()
    assert srows == drows
    assert len(srows) == 10  # non-degenerate: a full top-k survives mod 4
    # mod-4 candidates are a subset of the mod-2 pool by construction
    # (md5 % 4 == 0 implies md5 % 2 == 0), so every returned pair's
    # lower endpoint passes the registered row's filter too
    from etl_developstoday_test_spark.plans.queries import QUERIES

    mod2_pairs = {
        (r["ua"], r["ub"])
        for r in QUERIES["graph_adamic_adar_sampled"](spark, sf_dir)
        .collect()
    }
    assert mod2_pairs  # the registered row is non-degenerate here too


# --- STAGED for round 15 (the r14 window is exactly full: 11
# first-rows + 28 r7-stale + 11 oldest-r8 = 50, zero changed entries —
# clearing the r7 bucket per the r13 VERDICT outranks same-round
# registration here) — implemented, unit/property-tested, and
# value-locked at sf0.001 AND sf0.01 below; registration next round
# (the oracle strings move into plans/queries.py then and these locks
# import them — the single-source-of-truth discipline).

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    MARKOV_ENTROPY_ORACLE_SQL as MARKOV_ENTROPY_ORACLE,
)


def test_markov_transition_entropy_matches_oracle(spark, ev_con):
    """STAGED r15: first-order Markov transition matrix + plug-in
    entropy rate over per-user event-type sequences — value-locked at
    both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        markov_transition_entropy,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in markov_transition_entropy(ev).collect()]
    drows = con.execute(MARKOV_ENTROPY_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # conditional rows per from_type sum to ~1; matrix covers all
    # observed transitions; entropy rate is bounded by ln(k)
    import math
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in srows:
        by_from[r[0]] += r[3]
    assert all(abs(v - 1.0) < 1e-4 for v in by_from.values())
    k = len({r[0] for r in srows} | {r[1] for r in srows})
    assert 0.0 <= srows[0][5] <= math.log(k) + 1e-9
    assert sum(r[2] for r in srows) == srows[0][4]


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    KEY_CANDIDATE_ORACLE_SQL as KEY_CANDIDATE_ORACLE,
)


def test_key_candidate_profile_matches_oracle(spark, ev_con):
    """STAGED r15: per-column null/distinct key-candidate survey of
    the events table — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.dq import (
        key_candidate_profile,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "event_type", "props", "ts", "user_id", "value"]
    srows = [tuple(r) for r in key_candidate_profile(ev, cols).collect()]
    drows = con.execute(KEY_CANDIDATE_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 6
    prof = {r[0]: r for r in srows}
    assert prof["event_id"][5] is True  # the synthetic PK really is one
    assert prof["event_type"][3] == 5  # five event types
    assert all(r[3] <= r[1] - r[2] for r in srows)  # distinct <= non-null


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    HOURLY_SEASONALITY_ORACLE_SQL as HOURLY_SEASONALITY_ORACLE,
)


def test_hourly_seasonality_matches_oracle(spark, ev_con):
    """STAGED r15: hour-of-day histogram over the full 24-hour spine
    with χ² uniformity + peak share — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import (
        hourly_seasonality,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in hourly_seasonality(ev).collect()]
    drows = con.execute(HOURLY_SEASONALITY_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 24  # the full spine, always
    assert sum(r[1] for r in srows) == ev.count()
    assert all(r[3] >= 0.0 and r[4] == 23 for r in srows)
    peak_hour, peak_share = srows[0][5], srows[0][6]
    assert peak_share == max(r[2] for r in srows)
    assert any(r[0] == peak_hour and r[2] == peak_share for r in srows)


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    NGRAM_COVERAGE_ORACLE_SQL as NGRAM_COVERAGE_ORACLE,
)


def test_ngram_coverage_matches_oracle(spark, docstar_con):
    """STAGED r15: top-100 trigram coverage curve (templatedness card)
    — value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        ngram_coverage,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in ngram_coverage(docs).collect()]
    drows = con.execute(NGRAM_COVERAGE_ORACLE).fetchall()
    assert srows == drows
    assert srows
    assert [r[0] for r in srows] == list(range(1, len(srows) + 1))
    # cum_share is nondecreasing and ends at the head coverage figure
    cums = [r[4] for r in srows]
    assert cums == sorted(cums)
    assert 0.0 < cums[-1] <= 1.0
    # counts are rank-ordered (ties broken by ngram string)
    ns = [r[2] for r in srows]
    assert ns == sorted(ns, reverse=True)


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CENTROID_SHIFT_ORACLE_SQL as CENTROID_SHIFT_ORACLE,
)


def test_centroid_shift_matches_oracle(spark, emb_con):
    """STAGED r15: per-label centroid L2 shift + cosine vs the global
    centroid — value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.similarity import (
        centroid_shift_profile,
    )

    sf_dir, con = emb_con
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [tuple(r) for r in centroid_shift_profile(emb).collect()]
    drows = con.execute(CENTROID_SHIFT_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 10  # ten synthetic labels
    for _g, n, l2, cos in srows:
        assert n > 0 and l2 >= 0.0
        assert -1.0 - 1e-9 <= cos <= 1.0 + 1e-9


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    _md5long as _md5long_sql,
)

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CONTAMINATION_ORACLE_SQL as CONTAMINATION_ORACLE,
)


def test_contamination_overlap_matches_oracle(spark, docstar_con):
    """STAGED r15: train/eval n-gram contamination card over the
    deterministic 1-in-13 eval split — value-locked at both scales
    BEFORE registration."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.functions import md5_long
    from etl_developstoday_test_spark.operators.text_dedup import (
        contamination_overlap,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_eval = (
        md5_long(F.concat(F.lit("ct#"), F.col("doc_id").cast("string")))
        % 13
        == 0
    )
    srow = [
        tuple(r)
        for r in contamination_overlap(
            docs.filter(~is_eval), docs.filter(is_eval)
        ).collect()
    ]
    drow = con.execute(CONTAMINATION_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    net, nct, tr, neo, nco, orate = srow[0]
    assert 0 < nct <= net and 0 < nco <= neo
    assert 0.0 < tr <= 1.0 and 0.0 < orate <= 1.0
    # the 31-word template vocabulary makes heavy overlap certain —
    # the card exists to MEASURE it, and occurrence rate must be at
    # least the type rate only when hits skew common (not asserted);
    # assert instead the exact audit identities
    assert round(nct / net, 6) == tr
    assert round(nco / neo, 6) == orate


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    VALUE_MOMENTS_ORACLE_SQL as VALUE_MOMENTS_ORACLE,
)


def test_value_moments_matches_oracle(spark, ev_con):
    """STAGED r15: exact centi-quantized moment card (mean/std/skew/
    kurtosis from decimal power sums) — value-locked at both scales
    BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import value_moments
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [tuple(r) for r in value_moments(ev, "value").collect()]
    drow = con.execute(VALUE_MOMENTS_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n, mean, std, skew, kurt = srow[0]
    assert n > 0 and std > 0.0
    # the synthetic value column is right-skewed fare-like data
    assert skew > 0.0
    assert kurt > -2.0  # bounded below for any distribution


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    SPLIT_PSI_ORACLE_SQL as SPLIT_PSI_ORACLE,
)


def test_split_psi_matches_oracle(spark, ev_con):
    """STAGED r15: split-exchangeability PSI between the md5 hash-split
    halves of events.value — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.sampling import (
        split_psi_audit,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [
        tuple(r)
        for r in split_psi_audit(
            ev, "value", "event_id", n_bins=10, lo=0.0, hi=500.0
        ).collect()
    ]
    drow = con.execute(SPLIT_PSI_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    psi, nb, nc, bal = srow[0]
    # a hash split of exchangeable rows certifies stable
    assert 0.0 <= psi < 0.1
    assert abs(bal - 0.5) < 0.1
    assert nb + nc == ev.filter("value IS NOT NULL AND NOT isnan(value)").count()


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    NGRAM_CONTAINMENT_ORACLE_SQL as NGRAM_CONTAINMENT_ORACLE,
)


def test_ngram_containment_matches_oracle(spark, docstar_con):
    """STAGED r15: top-25 pairs by n-gram overlap coefficient (the
    subset-duplicate detector) — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        ngram_containment_topk,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in ngram_containment_topk(docs).collect()]
    drows = con.execute(NGRAM_CONTAINMENT_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for da, db, i, na, nb, c in srows:
        assert da < db
        assert 0 < i <= min(na, nb)
        assert 0.0 < c <= 1.0
    # containment >= jaccard on every pair, by definition
    for da, db, i, na, nb, c in srows:
        assert c >= round(i / (na + nb - i), 6) - 1e-12


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    ROLLING_ZSCORE_ORACLE_SQL as ROLLING_ZSCORE_ORACLE,
)


def test_rolling_zscore_matches_oracle(spark, ev_con):
    """STAGED r15: trailing-7-day z-score anomaly card over the daily
    mean — value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.drift import (
        rolling_zscore_daily,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in rolling_zscore_daily(ev, "value").collect()]
    drows = con.execute(ROLLING_ZSCORE_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 30  # the corpus spans 30 days
    # exactly the first 7 days are warm-up (no full trailing window)
    assert all(r[2] is None for r in srows[:7])
    assert all(r[2] is not None for r in srows[7:])


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    USER_LIFESPAN_ORACLE_SQL as USER_LIFESPAN_ORACLE,
)


def test_user_lifespan_matches_oracle(spark, ev_con):
    """STAGED r15: first-to-last-event lifespan histogram with the
    population audit — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        user_lifespan_histogram,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in user_lifespan_histogram(ev).collect()]
    drows = con.execute(USER_LIFESPAN_ORACLE).fetchall()
    assert srows == drows
    assert srows
    assert sum(r[1] for r in srows) == srows[0][2]  # partitions users
    assert [r[0] for r in srows] == sorted(r[0] for r in srows)
    assert all(0 <= r[0] <= 30 for r in srows)  # 30-day corpus bound


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    CHAR_CLASS_ORACLE_SQL as CHAR_CLASS_ORACLE,
)


def test_char_class_profile_matches_oracle(spark, docstar_con):
    """STAGED r15: per-source character-class mix — value-locked at
    both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        char_class_profile,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in char_class_profile(docs).collect()]
    drows = con.execute(CHAR_CLASS_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for _g, nd, nc, a, d, s, o in srows:
        assert nd > 0 and nc > 0
        # shares partition the character mass (up to 6-dp rounding)
        assert abs(a + d + s + o - 1.0) < 5e-6
        assert d == 0.0  # the synthetic vocabulary is letters+spaces


# --- STAGED for round 16 (the r15 window is exactly full: 12
# first-rows + 26 r8-stale + 12 oldest-r9 = 50, zero changed entries;
# clearing the r8 bucket per the r14 VERDICT outranks same-round
# registration) — implemented, unit/property-tested, and value-locked
# at sf0.001 AND sf0.01 below; registration next round (the oracle
# strings move into plans/queries.py then and these locks import
# them — the single-source-of-truth discipline).

NEW_VS_RETURNING_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
  FROM events WHERE ts IS NOT NULL
),
marked AS (
  SELECT d, d = MIN(d) OVER (PARTITION BY u) AS is_new FROM pairs
),
daily AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(COALESCE(SUM(CASE WHEN is_new THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_new
  FROM marked GROUP BY d
)
SELECT d, n_active, n_new,
       CAST(n_active - n_new AS BIGINT) AS n_returning,
       round(CAST(n_new AS DOUBLE) / CAST(n_active AS DOUBLE), 6)
         AS new_share,
       CAST(SUM(n_new) OVER (ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily ORDER BY d
"""


def test_new_vs_returning_matches_oracle(spark, ev_con):
    """STAGED r16: daily new/returning user mix + exact cumulative
    distinct-user curve — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        new_vs_returning_daily,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in new_vs_returning_daily(ev).collect()]
    drows = con.execute(NEW_VS_RETURNING_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # every active user is new exactly once: the final cum equals the
    # distinct-user count, and new+returning partitions each day
    assert srows[-1][5] == ev.select("user_id").distinct().count()
    assert all(r[1] == r[2] + r[3] for r in srows)
    assert srows[0][1] == srows[0][2]  # day one: all new


SESSION_GAPS_ORACLE = """
WITH gaps AS (
  SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events WHERE ts IS NOT NULL
),
big AS (SELECT g FROM gaps WHERE g > 1800000000),
hist AS (
  SELECT CAST(g // 3600000000 AS BIGINT) AS gap_hours,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(g) AS BIGINT) AS s
  FROM big GROUP BY 1
),
audit AS (
  SELECT CAST(SUM(n_gaps) AS BIGINT) AS n_gaps_total,
         round(CAST(SUM(s) AS DOUBLE) / 3.6e9
               / CAST(SUM(n_gaps) AS DOUBLE), 6) AS mean_gap_hours
  FROM hist
)
SELECT gap_hours, n_gaps, n_gaps_total, mean_gap_hours
FROM hist CROSS JOIN audit ORDER BY gap_hours
"""


def test_session_gaps_matches_oracle(spark, ev_con):
    """STAGED r16: between-session gap histogram above the 30-minute
    sessionize timeout — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        session_gap_histogram,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in session_gap_histogram(ev).collect()]
    drows = con.execute(SESSION_GAPS_ORACLE).fetchall()
    assert srows == drows
    assert srows
    assert all(r[0] >= 0 for r in srows)
    assert sum(r[1] for r in srows) == srows[0][2]


SURVIVAL_ORACLE = """
WITH gaps AS (
  SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events WHERE ts IS NOT NULL
),
nn AS (SELECT g FROM gaps WHERE g IS NOT NULL),
b AS (
  SELECT CASE WHEN g >= 86400000000 THEN 8
              WHEN g >= 21600000000 THEN 7
              WHEN g >= 3600000000 THEN 6
              WHEN g >= 1800000000 THEN 5
              WHEN g >= 300000000 THEN 4
              WHEN g >= 60000000 THEN 3
              WHEN g >= 10000000 THEN 2
              WHEN g >= 1000000 THEN 1
              ELSE 0 END AS bucket
  FROM nn
),
hist AS (
  SELECT CAST(bucket AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM b GROUP BY 1
),
cum AS (
  SELECT bucket, n_gaps,
         CAST(SUM(n_gaps) OVER (ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS tail
  FROM hist
),
audit AS (SELECT CAST(SUM(n_gaps) AS BIGINT) AS tot FROM hist)
SELECT bucket,
       CAST(CASE bucket WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 10
            WHEN 3 THEN 60 WHEN 4 THEN 300 WHEN 5 THEN 1800
            WHEN 6 THEN 3600 WHEN 7 THEN 21600 WHEN 8 THEN 86400 END
         AS BIGINT) AS gap_lo_seconds,
       n_gaps,
       round(CAST(n_gaps AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
       round(CAST(tail AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS survival,
       tot AS n_gaps_total
FROM cum CROSS JOIN audit ORDER BY bucket
"""


def test_interarrival_survival_matches_oracle(spark, ev_con):
    """STAGED r16: inter-arrival survival curve at the fixed
    operational edges — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.events_etl import (
        interarrival_survival,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in interarrival_survival(ev).collect()]
    drows = con.execute(SURVIVAL_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # survival is nonincreasing in the bucket order and starts at 1
    # only if bucket 0 is occupied; shares sum to ~1
    survs = [r[4] for r in srows]
    assert survs == sorted(survs, reverse=True)
    assert abs(sum(r[3] for r in srows) - 1.0) < 5e-6
    assert sum(r[2] for r in srows) == srows[0][5]


HEATMAP_ORACLE = """
WITH occupied AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
         CAST(hour(ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
spine AS (
  SELECT CAST(d AS BIGINT) AS isodow, CAST(h AS BIGINT) AS hour
  FROM (SELECT unnest(generate_series(1, 7)) AS d)
  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h)
),
hist AS (
  SELECT spine.isodow, spine.hour,
         CAST(COALESCE(n, 0) AS BIGINT) AS n_events
  FROM spine LEFT JOIN occupied
    ON occupied.isodow = spine.isodow AND occupied.hour = spine.hour
),
tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS c,
         SUM(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT))
           AS ssq
  FROM hist
),
peak AS (
  SELECT isodow AS peak_isodow, hour AS peak_hour, n_events AS pn
  FROM hist ORDER BY n_events DESC, isodow ASC, hour ASC LIMIT 1
)
SELECT hist.isodow, hist.hour, hist.n_events,
       CASE WHEN c > 0 THEN
         round(CAST(n_events AS DOUBLE) / CAST(c AS DOUBLE), 6)
       END AS share,
       peak_isodow, peak_hour,
       CASE WHEN c > 0 THEN
         round(CAST(pn AS DOUBLE) / CAST(c AS DOUBLE), 6)
       END AS peak_share,
       CASE WHEN c > 0 THEN
         round(CAST(ssq AS DOUBLE) * 168.0
               / (CAST(c AS DOUBLE) * CAST(c AS DOUBLE)), 6)
       END AS hhi_x_uniform
FROM hist CROSS JOIN tot CROSS JOIN peak
ORDER BY isodow, hour
"""


def test_weekday_hour_heatmap_matches_oracle(spark, ev_con):
    """STAGED r16: 7x24 weekday-hour heatmap with Herfindahl
    concentration — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.drift import (
        weekday_hour_heatmap,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srows = [tuple(r) for r in weekday_hour_heatmap(ev).collect()]
    drows = con.execute(HEATMAP_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 168
    assert sum(r[2] for r in srows) == ev.filter("ts IS NOT NULL").count()
    assert srows[0][7] >= 1.0 - 1e-9  # HHI x uniform is >= 1 always


DUP_MULTIPLICITY_ORACLE = """
WITH per_key AS (
  SELECT l_orderkey, l_linenumber, CAST(COUNT(*) AS BIGINT) AS m
  FROM lineitem GROUP BY 1, 2
),
hist AS (
  SELECT m AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM per_key GROUP BY 1
),
audit AS (
  SELECT CAST(SUM(CAST(multiplicity AS HUGEINT)
                  * CAST(n_keys AS HUGEINT)) AS BIGINT) AS n_rows_total,
         CAST(COALESCE(SUM(CASE WHEN multiplicity > 1 THEN n_keys END),
                       0) AS BIGINT) AS dk,
         CAST(COALESCE(SUM(CASE WHEN multiplicity > 1 THEN
                CAST(multiplicity AS HUGEINT) * CAST(n_keys AS HUGEINT)
              END), 0) AS BIGINT) AS dr
  FROM hist
)
SELECT multiplicity, n_keys, n_rows_total,
       dk AS n_dup_keys,
       round(CAST(dr AS DOUBLE) / CAST(n_rows_total AS DOUBLE), 6)
         AS dup_row_share
FROM hist CROSS JOIN audit ORDER BY multiplicity
"""


def test_dup_multiplicity_matches_oracle(spark, star_con):
    """STAGED r16: duplicate-multiplicity profile of the (planted)
    lineitem PK violation — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.dq import (
        dup_multiplicity_profile,
    )

    sf_dir, con = star_con
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    srows = [
        tuple(r)
        for r in dup_multiplicity_profile(
            li, ["l_orderkey", "l_linenumber"]
        ).collect()
    ]
    drows = con.execute(DUP_MULTIPLICITY_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # the planted lineitem PK violation is visible: some multiplicity
    # above 1 exists and the audit identities hold
    assert any(r[0] > 1 for r in srows)
    assert srows[0][2] == li.count()
    mult_rows = sum(r[0] * r[1] for r in srows)
    assert mult_rows == srows[0][2]


from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    _dsum as _dsum_sql,
)

RECONCILIATION_ORACLE = f"""
WITH ls AS (
  SELECT l_orderkey AS ok,
         {_dsum_sql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}
           AS lsum
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_totalprice AS tp, COALESCE(lsum, 0.0) AS lsum
  FROM orders LEFT JOIN ls ON ls.ok = orders.o_orderkey
),
b AS (
  SELECT CASE
           WHEN tp IS NULL OR tp = 0 THEN -5
           WHEN abs((tp - lsum) / tp) <= 1e-4 THEN 0
           WHEN (tp - lsum) / tp > 0.01 THEN 4
           WHEN (tp - lsum) / tp > 0.0 THEN 3
           WHEN (tp - lsum) / tp < -0.01 THEN -4
           ELSE -3
         END AS bucket
  FROM j
),
hist AS (
  SELECT CAST(bucket AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM b GROUP BY 1
),
audit AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS n_orders_total,
         round(CAST(COALESCE(SUM(CASE WHEN bucket = 0 THEN n_orders END),
                             0) AS DOUBLE)
               / CAST(SUM(n_orders) AS DOUBLE), 6) AS match_rate
  FROM hist
)
SELECT bucket,
       CASE bucket WHEN -5 THEN 'invalid_header'
            WHEN -4 THEN 'under_gt_tol' WHEN -3 THEN 'under_small'
            WHEN 0 THEN 'matched' WHEN 3 THEN 'over_small'
            WHEN 4 THEN 'over_gt_tol' END AS bucket_label,
       n_orders,
       round(CAST(n_orders AS DOUBLE) / CAST(n_orders_total AS DOUBLE), 6)
         AS share,
       n_orders_total, match_rate
FROM hist CROSS JOIN audit ORDER BY bucket
"""


def test_order_reconciliation_matches_oracle(spark, star_con):
    """STAGED r16: order-header vs line-sum reconciliation card —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.dq import (
        order_reconciliation,
    )

    sf_dir, con = star_con
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    srows = [tuple(r) for r in order_reconciliation(orders, li).collect()]
    drows = con.execute(RECONCILIATION_ORACLE).fetchall()
    assert srows == drows
    assert srows
    # the synthetic o_totalprice is unrelated to the lines: the card's
    # whole point here is that it SAYS so (match rate ~ 0)
    assert srows[0][4] == orders.count()
    assert sum(r[2] for r in srows) == srows[0][4]


PURITY_ORACLE = r"""
WITH p AS (
  SELECT array_to_string(
           regexp_split_to_array(trim(text), '\s+')[1:8], ' ') AS fp,
         source AS s
  FROM documents
),
clusters AS (
  SELECT fp, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS ns
  FROM p GROUP BY fp HAVING COUNT(*) >= 2
),
hist AS (
  SELECT c AS cluster_size, ns > 1 AS is_mixed,
         CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(SUM(c) AS BIGINT) AS n_docs
  FROM clusters GROUP BY 1, 2
),
audit AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_clustered_docs_total,
         CASE WHEN SUM(n_docs) > 0 THEN
           round(CAST(COALESCE(SUM(CASE WHEN is_mixed THEN n_docs END),
                               0) AS DOUBLE)
                 / CAST(SUM(n_docs) AS DOUBLE), 6)
         END AS mixed_doc_share
  FROM hist
)
SELECT cluster_size, is_mixed, n_clusters, n_docs,
       n_clustered_docs_total, mixed_doc_share
FROM hist CROSS JOIN audit ORDER BY cluster_size, is_mixed
"""


def test_cluster_source_purity_matches_oracle(spark, docstar_con):
    """STAGED r16: prefix-fingerprint duplicate-cluster source purity
    — value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_dedup import (
        cluster_source_purity,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in cluster_source_purity(docs).collect()]
    drows = con.execute(PURITY_ORACLE).fetchall()
    assert srows == drows
    assert srows  # the 31-word template vocabulary guarantees clusters
    assert all(r[0] >= 2 for r in srows)
    assert sum(r[3] for r in srows) == srows[0][4]


TTR_HAPAX_ORACLE = r"""
WITH toks AS (
  SELECT source AS s,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
),
per AS (
  SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE t <> '' GROUP BY s, t
),
card AS (
  SELECT s, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT)
           AS n_hapax
  FROM per GROUP BY s
),
spine AS (SELECT DISTINCT source AS s FROM documents)
SELECT spine.s AS source,
       CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_types, 0) AS BIGINT) AS n_types,
       CASE WHEN COALESCE(n_tokens, 0) > 0 THEN
         round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
       END AS ttr,
       CAST(COALESCE(n_hapax, 0) AS BIGINT) AS n_hapax,
       CASE WHEN COALESCE(n_types, 0) > 0 THEN
         round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
       END AS hapax_share
FROM spine LEFT JOIN card ON card.s = spine.s
ORDER BY source
"""


def test_ttr_hapax_matches_oracle(spark, docstar_con):
    """STAGED r16: per-source TTR / hapax lexical-richness card —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.text_analysis import (
        ttr_hapax_by_source,
    )

    sf_dir, con = docstar_con
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srows = [tuple(r) for r in ttr_hapax_by_source(docs).collect()]
    drows = con.execute(TTR_HAPAX_ORACLE).fetchall()
    assert srows == drows
    assert srows
    for _s, ntok, ntyp, ttr, nhap, hs in srows:
        assert 0 < ntyp <= ntok
        assert nhap <= ntyp
        assert ttr is not None and 0.0 < ttr <= 1.0


DIM_VARIANCE_ORACLE = """
WITH e AS (
  SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
f AS (
  SELECT dim, CAST(floor(v * 1e9 + 0.5) AS BIGINT) AS vq
  FROM e WHERE NOT isnan(v)
),
per AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(vq AS HUGEINT)) AS s1,
         SUM(CAST(vq AS HUGEINT) * CAST(vq AS HUGEINT)) AS s2
  FROM f GROUP BY dim
),
m AS (
  SELECT CAST(dim AS BIGINT) AS dim, n,
         CAST(s1 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) AS mean,
         greatest(CAST(s2 AS DOUBLE) / 1e18 / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)),
                  0.0) AS var
  FROM per
),
ranked AS (
  SELECT dim, n, mean, var,
         CAST(ROW_NUMBER() OVER (ORDER BY var DESC, dim ASC) AS BIGINT)
           AS var_rank
  FROM m
),
audit AS (
  SELECT CAST(CAST(SUM(CAST(var AS DECIMAL(30,10))) AS VARCHAR)
           AS DOUBLE) AS tv,
         CAST(COALESCE(SUM(CASE WHEN var < 1e-6 THEN 1 END), 0)
           AS BIGINT) AS n_dead_dims
  FROM m
)
SELECT dim, n, round(mean, 6) AS mean, round(var, 6) AS variance,
       CASE WHEN tv > 0 THEN round(var / tv, 6) END AS var_share,
       var_rank, n_dead_dims, round(tv, 6) AS total_variance
FROM ranked CROSS JOIN audit ORDER BY dim
"""


def test_dim_variance_matches_oracle(spark, emb_con):
    """STAGED r16: per-dimension variance / dimension-collapse card —
    value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.similarity import (
        dim_variance_profile,
    )

    sf_dir, con = emb_con
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [tuple(r) for r in dim_variance_profile(emb).collect()]
    drows = con.execute(DIM_VARIANCE_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 64  # the synthetic embedding width
    shares = sorted(r[4] for r in srows)
    assert abs(sum(shares) - 1.0) < 5e-5
    assert sorted(r[5] for r in srows) == list(range(1, 65))


TIGHTNESS_ORACLE = """
WITH e AS (
  SELECT vec_id, label AS g, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
x AS (
  SELECT g, unnest(generate_series(1, len(v))) - 1 AS dim,
         unnest(v) AS c
  FROM e
),
per AS (
  SELECT g, dim,
         SUM(CAST(CAST(floor(c * 1e9 + 0.5) AS BIGINT) AS HUGEINT))
           AS sq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM x WHERE NOT isnan(c) GROUP BY g, dim
),
cent AS (
  SELECT g,
         list(CAST(sq AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)
              ORDER BY dim) AS cent
  FROM per GROUP BY g
),
scored AS (
  SELECT e.g AS g,
         CASE WHEN NOT isnan({COS}) THEN
           CAST(floor({COS} * 1e6 + 0.5) AS BIGINT)
         END AS cq
  FROM e JOIN cent ON cent.g = e.g
),
card AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(cq) AS BIGINT) AS s,
         CAST(MIN(cq) AS BIGINT) AS mn,
         CAST(COALESCE(SUM(CASE WHEN cq < 500000 THEN 1 END), 0)
           AS BIGINT) AS n_loose
  FROM scored WHERE cq IS NOT NULL GROUP BY g
)
SELECT g AS "group", n_vecs,
       round(CAST(s AS DOUBLE) / 1e6 / CAST(n_vecs AS DOUBLE), 6)
         AS mean_cosine,
       round(CAST(mn AS DOUBLE) / 1e6, 6) AS min_cosine,
       n_loose,
       round(CAST(n_loose AS DOUBLE) / CAST(n_vecs AS DOUBLE), 6)
         AS loose_share
FROM card ORDER BY "group"
""".replace("{COS}", _cosine_sql("v", "cent"))
# rendered at module scope: the *_ORACLE hygiene sweep below runs every
# oracle global raw, so none may carry unrendered placeholders (the
# interrupted r15 build left {COS} in — caught by that sweep)


def test_intra_cluster_tightness_matches_oracle(spark, emb_con):
    """STAGED r16: per-label intra-cluster tightness (cosine to own
    centroid) — value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.similarity import (
        intra_cluster_tightness,
    )

    sf_dir, con = emb_con
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srows = [tuple(r) for r in intra_cluster_tightness(emb).collect()]
    drows = con.execute(TIGHTNESS_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 10  # ten synthetic labels
    for _g, n, mc, mn, nl, ls in srows:
        assert n > 0 and -1.0 - 1e-9 <= mn <= mc <= 1.0 + 1e-9


REGRESSOGRAM_ORACLE = f"""
WITH binned AS (
  SELECT CAST(CAST(l_quantity AS DOUBLE) AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         {_dsum_sql("l_discount")} AS s_disc,
         {_dsum_sql("l_extendedprice")} AS s_price
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND NOT isnan(CAST(l_quantity AS DOUBLE))
  GROUP BY 1
),
audit AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS tot FROM binned)
SELECT x, n_rows,
       round(CAST(n_rows AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         AS row_share,
       round(s_disc / CAST(n_rows AS DOUBLE), 6) AS mean_l_discount,
       round(s_price / CAST(n_rows AS DOUBLE), 6)
         AS mean_l_extendedprice,
       tot AS n_rows_total
FROM binned CROSS JOIN audit ORDER BY x
"""


def test_regressogram_matches_oracle(spark, star_con):
    """STAGED r16: regressogram of discount/extendedprice over the
    integer quantity domain — value-locked at both scales BEFORE
    registration."""
    from etl_developstoday_test_spark.operators.ml import regressogram

    sf_dir, con = star_con
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    srows = [
        tuple(r)
        for r in regressogram(
            li, "l_quantity", ["l_discount", "l_extendedprice"]
        ).collect()
    ]
    drows = con.execute(REGRESSOGRAM_ORACLE).fetchall()
    assert srows == drows
    assert len(srows) == 50  # TPC-H quantity domain 1..50
    assert sum(r[1] for r in srows) == srows[0][5]
    assert abs(sum(r[2] for r in srows) - 1.0) < 5e-5  # shares partition
    assert all(r[4] > 0 for r in srows)  # prices are positive per bin


BOOTSTRAP_ORACLE = """
WITH base AS (
  SELECT CAST(event_id AS VARCHAR) AS id,
         CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
ex AS (
  SELECT id, x, unnest(generate_series(0, 47)) AS r FROM base
),
h AS (
  SELECT r, x,
         CAST(concat('0x', substr(md5('bs#' || CAST(r AS VARCHAR)
           || '#' || id), 1, 15)) AS BIGINT) AS hv
  FROM ex
),
w AS (
  SELECT r, x,
         (CASE WHEN hv >= 424136118829305344 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 848272237658610688 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1060340297073263360 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1131029650211480960 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1148701988496035328 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1152236456152946176 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1152825534095764608 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1152909688087595776 THEN 1 ELSE 0 END
          + CASE WHEN hv >= 1152920207336574720 THEN 1 ELSE 0 END)
           AS wt
  FROM h
),
reps AS (
  SELECT r, SUM(CAST(wt AS HUGEINT) * x) AS swx,
         CAST(SUM(wt) AS BIGINT) AS sw
  FROM w GROUP BY r
),
mm AS (
  SELECT r, CASE WHEN sw > 0 THEN
    CAST(swx AS DOUBLE) / 1e6 / CAST(sw AS DOUBLE) END AS m
  FROM reps
),
rk AS (
  SELECT m, CAST(ROW_NUMBER() OVER (ORDER BY m, r) AS BIGINT) AS rk
  FROM mm WHERE m IS NOT NULL
),
nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS nrep FROM rk),
iv AS (
  SELECT round(MIN(CASE WHEN rk =
           CAST(ceil(0.025 * CAST(nrep AS DOUBLE)) AS BIGINT)
           THEN m END), 6) AS ci_lo,
         round(MIN(CASE WHEN rk =
           CAST(ceil(0.975 * CAST(nrep AS DOUBLE)) AS BIGINT)
           THEN m END), 6) AS ci_hi,
         CAST(MIN(nrep) AS BIGINT) AS n_replicates
  FROM rk CROSS JOIN nr
),
head AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         round(CAST(SUM(x) AS DOUBLE) / 1e6
               / CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
  FROM base
)
SELECT n_rows, mean_value, n_replicates, ci_lo, ci_hi
FROM head CROSS JOIN iv
"""


def test_poisson_bootstrap_matches_oracle(spark, ev_con):
    """STAGED r16: deterministic Poisson(1) bootstrap mean CI for
    events.value — value-locked at both scales BEFORE registration."""
    from etl_developstoday_test_spark.operators.sampling import (
        poisson_bootstrap_mean_ci,
    )
    from etl_developstoday_test_spark.sources.tables import load_table

    sf_dir, con = ev_con
    ev = load_table(spark, sf_dir, "events")
    srow = [
        tuple(r)
        for r in poisson_bootstrap_mean_ci(
            ev, "value", "event_id"
        ).collect()
    ]
    drow = con.execute(BOOTSTRAP_ORACLE).fetchall()
    assert srow == drow
    assert len(srow) == 1
    n, mean, nrep, lo, hi = srow[0]
    assert nrep == 48
    assert lo <= mean <= hi  # the interval brackets the point mean
    assert hi - lo < 0.2 * mean + 1.0  # sane width at lock scales
