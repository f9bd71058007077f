"""DuckDB-twin parity for the staged-then-registered operator pipeline.

The staging ground: every operator lands here FIRST, with its oracle
SQL verified value-for-value at sf0.001 AND sf0.01 before any
registration — so each one's first driver row can only be green. For
the already-registered rounds (8 and 9) this file keeps (a) the
second-scale value locks over the SAME oracle strings the registration
uses — imported from plans/queries.py, single source of truth — and
(b) the adversarial FIXTURE-GRAPH locks for LPA and assortativity,
whose registered oracles run over the co-activity graph instead. The
"STAGED for round 10" section below holds the next registration
batch's locks. Same comparison discipline as
tests/test_oracle_parity.py (full multiset, exact equality, no
epsilon): the determinism contract (nano-quantized ln, exact decimal /
integer accumulation, total-order argmax) is what's being locked in.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_developstoday_test_spark.plans.queries import (
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


# --- STAGED for round 10 -----------------------------------------------------
#
# Same discipline as the round-8/round-9 staging: each operator below is
# implemented and unit-tested NOW, its DuckDB twin is value-locked at
# sf0.001 AND sf0.01 here, and registration waits for the round-10
# driver window — so the first driver row can only be green.

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    WATERFILL_ORACLE_SQL as _WF_ORACLE,
)

WATERFILL_EXECUTE_ORACLE = (
    "WITH alloc AS (\n"
    + _WF_ORACLE
    + r"""),
dt AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens,
         CAST(concat('0x', substr(md5('wfx#' || CAST(doc_id AS VARCHAR)),
           1, 15)) AS BIGINT) AS h
  FROM documents
),
surv AS (
  SELECT dt.source, dt.doc_id, dt.n_tokens, dt.h, a.allocated_tokens
  FROM dt JOIN alloc a USING (source)
  WHERE a.allocated_tokens > 0
    AND (a.allocated_tokens = a.avail_tokens
         OR dt.h <
            CAST(1152921504606846976 AS BIGINT)
            // greatest(CAST(1 AS BIGINT),
                 a.avail_tokens // greatest(CAST(1 AS BIGINT),
                                            a.allocated_tokens * 4)))
),
kept AS (
  SELECT source, n_tokens FROM (
    SELECT source, n_tokens, allocated_tokens,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM surv) WHERE cum <= allocated_tokens
)
SELECT a.source, a.allocated_tokens,
       CAST(COALESCE(k.nd, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(k.tk, 0) AS BIGINT) AS tokens_kept,
       CASE WHEN a.allocated_tokens > 0
            THEN round(CAST(COALESCE(k.tk, 0) AS DOUBLE)
                       / CAST(a.allocated_tokens AS DOUBLE), 6)
            ELSE 0.0 END AS utilization
FROM alloc a LEFT JOIN (
  SELECT source, COUNT(*) AS nd, CAST(SUM(n_tokens) AS BIGINT) AS tk
  FROM kept GROUP BY source) k USING (source)
"""
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
    """STAGED r10: execute the registered waterfill plan — per-source
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


NB_CONFUSION_ORACLE = (
    NB_ORACLE.split("SELECT truth.truth")[0]
    + """, picks AS (
  SELECT t.truth, b.cand AS predicted
  FROM truth t JOIN (SELECT doc_id, cand FROM best WHERE rk = 1) b
    USING (doc_id)
),
cells AS (
  SELECT truth, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM picks GROUP BY truth, predicted
)
SELECT truth, predicted, n_docs,
       round(CAST(n_docs AS DOUBLE) /
             CAST(SUM(n_docs) OVER (PARTITION BY truth) AS DOUBLE), 6)
         AS row_frac
FROM cells
"""
)


def test_nb_confusion_matrix_matches_oracle(spark, sf_con):
    """STAGED r10: which-label-leaks-where confusion matrix of the NB
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
    """STAGED r10: per-node local clustering coefficient on an
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


EMBED_DRIFT_ORACLE = """
WITH ex AS (
  SELECT vec_id % 2 = 0 AS is_a, i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
pd AS (
  SELECT dim,
         CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE NOT is_a) AS BIGINT) AS n_b,
         CAST(SUM(xq) FILTER (WHERE is_a) AS BIGINT) AS s_a,
         CAST(SUM(xq) FILTER (WHERE NOT is_a) AS BIGINT) AS s_b,
         CAST(SUM(xq * xq) FILTER (WHERE is_a) AS BIGINT) AS ss_a,
         CAST(SUM(xq * xq) FILTER (WHERE NOT is_a) AS BIGINT) AS ss_b
  FROM ex GROUP BY dim
),
calc AS (
  SELECT dim, n_a, n_b,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
             * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS va,
         CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
           - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS vb
  FROM pd
)
SELECT CAST(dim AS INTEGER) AS dim, n_a, n_b,
       round(ma / 1e6, 6) AS mean_a, round(mb / 1e6, 6) AS mean_b,
       CASE WHEN sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) > 0
            THEN round((mb - ma)
                 / sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)), 6)
            ELSE 0.0 END AS z_score
FROM calc
ORDER BY abs(z_score) DESC, dim ASC LIMIT 10
"""


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
    """STAGED r10: per-dimension Welch z between the even/odd vec_id
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


SNAPSHOT_DELTA_ORACLE = r"""
WITH snap_a AS (
  SELECT doc_id, source, text FROM documents WHERE doc_id % 20 <> 19
),
snap_b AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 20 <> 0
),
o AS (SELECT doc_id, source, md5(text) AS h,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS tok
      FROM snap_a),
n AS (SELECT doc_id, source, md5(text) AS h,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS tok
      FROM snap_b),
j AS (SELECT COALESCE(n.source, o.source) AS source,
             CASE WHEN o.h IS NULL THEN 'added'
                  WHEN n.h IS NULL THEN 'removed'
                  WHEN o.h <> n.h THEN 'changed'
                  ELSE 'unchanged' END AS cls,
             COALESCE(n.tok, 0) - COALESCE(o.tok, 0) AS dtok
      FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id)
SELECT source,
       CAST(COUNT(*) FILTER (WHERE cls = 'added') AS BIGINT) AS n_added,
       CAST(COUNT(*) FILTER (WHERE cls = 'removed') AS BIGINT) AS n_removed,
       CAST(COUNT(*) FILTER (WHERE cls = 'changed') AS BIGINT) AS n_changed,
       CAST(COUNT(*) FILTER (WHERE cls = 'unchanged') AS BIGINT)
         AS n_unchanged,
       CAST(SUM(dtok) AS BIGINT) AS token_delta
FROM j GROUP BY source
"""


def test_snapshot_delta_matches_oracle(spark, sf_con):
    """STAGED r10: CDC-class snapshot diff card (added / removed /
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


KN_HELDOUT_ORACLE = r"""
WITH arrs AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
  FROM documents
),
big AS (
  SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bg
  FROM arrs, unnest(range(1, len(arr))) AS t(i)
  WHERE len(arr) >= 2
),
bcounts AS (
  SELECT bg, COUNT(*) AS c FROM big WHERE doc_id % 5 <> 0 GROUP BY bg
),
typed AS (
  SELECT bg, c, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM bcounts
),
ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot, COUNT(*) AS n1p
  FROM typed GROUP BY w1
),
pred AS (SELECT w2, COUNT(*) AS npred FROM typed GROUP BY w2),
stats AS (SELECT COUNT(*) AS t, COUNT(DISTINCT w2) AS v2 FROM typed),
tb AS (
  SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
         split_part(bg, ' ', 2) AS w2
  FROM big WHERE doc_id % 5 = 0
),
scored AS (
  SELECT tb.doc_id,
    CAST(round(ln(
      CASE WHEN ctx.ctot IS NULL
        THEN CAST(COALESCE(pred.npred, 0) + 1 AS DOUBLE)
             / CAST(stats.t + stats.v2 + 1 AS DOUBLE)
        ELSE greatest(CAST(COALESCE(tc.c, 0) AS DOUBLE) - 0.75, 0.0)
               / CAST(ctx.ctot AS DOUBLE)
             + ((0.75 * CAST(ctx.n1p AS DOUBLE)) / CAST(ctx.ctot AS DOUBLE))
               * (CAST(COALESCE(pred.npred, 0) + 1 AS DOUBLE)
                  / CAST(stats.t + stats.v2 + 1 AS DOUBLE))
      END
    ) * 1e9) AS BIGINT) AS llq
  FROM tb
  LEFT JOIN (SELECT bg, c FROM typed) tc USING (bg)
  LEFT JOIN ctx ON ctx.w1 = tb.w1
  LEFT JOIN pred ON pred.w2 = tb.w2
  CROSS JOIN stats
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         round(CAST(SUM(llq) AS DOUBLE) / 1e9 / COUNT(*), 6)
           AS mean_logprob
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, mean_logprob FROM per_doc
ORDER BY mean_logprob ASC, doc_id ASC LIMIT 20
"""


def test_kn_heldout_matches_oracle(spark, sf_con):
    """STAGED r10: held-out interpolated-KN scoring (train on
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
    for t in ["documents", "lineitem", "embeddings", "events"]:
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


PSI_SERIES_ORACLE = r"""
WITH base AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS period,
         CAST(value AS DOUBLE) AS v
  FROM events
),
nn AS (
  SELECT period, CAST(COUNT(*) AS BIGINT) AS n_nulls
  FROM base WHERE v IS NULL GROUP BY period
),
binned AS (
  SELECT period,
         LEAST(9, GREATEST(0,
           CAST(floor((v - 0.0) / 20.0) AS INTEGER)
         )) AS bin
  FROM base WHERE v IS NOT NULL
),
counts AS (SELECT period, bin, COUNT(*) AS n FROM binned GROUP BY period, bin),
bp AS (SELECT MIN(period) AS bp FROM counts),
bc AS (SELECT bin, n AS n_base FROM counts, bp WHERE period = bp),
btot AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb FROM bc),
grid AS (SELECT period, i AS bin
         FROM (SELECT DISTINCT period FROM counts), range(0, 10) t(i)),
m AS (
  SELECT g.period, g.bin,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cur,
         CAST(COALESCE(bc.n_base, 0) AS BIGINT) AS n_base, btot.tb
  FROM grid g
  LEFT JOIN counts c ON c.period = g.period AND c.bin = g.bin
  LEFT JOIN bc ON bc.bin = g.bin
  CROSS JOIN btot
),
props AS (
  SELECT period, n_cur,
         GREATEST(CAST(n_base AS DOUBLE) / tb, 1e-4) AS p,
         GREATEST(CAST(n_cur AS DOUBLE)
           / SUM(n_cur) OVER (PARTITION BY period), 1e-4) AS q
  FROM m
),
terms AS (
  SELECT period, n_cur,
         (p - q) * (CAST(CAST(round(ln(p / q) * 1e9) AS BIGINT)
                         AS DOUBLE) / 1e9) AS term
  FROM props
),
psis AS (
  SELECT period,
         CAST(CAST(SUM(CAST((term) AS DECIMAL(30,10))) AS VARCHAR)
           AS DOUBLE) AS psi,
         CAST(SUM(n_cur) AS BIGINT) AS n_rows
  FROM terms GROUP BY period
)
SELECT period, psi, n_rows,
       CAST(COALESCE(nn.n_nulls, 0) AS BIGINT) AS n_nulls,
       CASE WHEN psi < 0.1 THEN 'stable'
            WHEN psi <= 0.25 THEN 'moderate'
            ELSE 'major' END AS drift_level
FROM psis LEFT JOIN nn USING (period)
"""


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
    """STAGED r10: per-week PSI series of the event value distribution
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


# Registration-ready second lock for the clustering coefficient: the
# round-10 registration will run it over the shared co-activity graph
# (like k-core / LPA / assortativity), so lock THAT construction too —
# the fixture-graph lock above proves the algorithm, this one proves
# the exact query+oracle pair the registration will ship.
from etl_developstoday_test_spark.plans.queries import _COACT_SQL  # noqa: E402

CLUSTERING_COACT_ORACLE = f"""
WITH {_COACT_SQL},
deg AS (
  SELECT u, COUNT(*) AS d FROM (
    SELECT ua AS u FROM edges UNION ALL SELECT ub FROM edges) GROUP BY u
),
tri AS (
  SELECT e1.ua AS x, e1.ub AS y, e2.ub AS z
  FROM edges e1
  JOIN edges e2 ON e2.ua = e1.ub
  JOIN edges e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
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


def test_clustering_coefficient_coactivity_matches_oracle(spark, ev_con):
    """STAGED r10: the clustering coefficient over the SHARED
    co-activity graph — the exact construction the registration will
    use — value-locked at both scales BEFORE registration."""
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
