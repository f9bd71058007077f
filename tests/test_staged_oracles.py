"""DuckDB-twin parity for the round-8/9 classifier/LM/planner operators.

Originally the staging ground for these operators' oracle SQL (verified
value-for-value at sf0.001 AND sf0.01 BEFORE registration, so the
driver's first row for each could only be green). Now that all of them
are registered, this file keeps (a) the SECOND-SCALE (sf0.001 and sf0.01) value locks over
the SAME oracle strings the registration uses — imported from
plans/queries.py, single source of truth — and (b) the adversarial
FIXTURE-GRAPH locks for LPA and assortativity, whose registered
oracles run over the co-activity graph instead. Same comparison
discipline as tests/test_oracle_parity.py (full multiset, exact
equality, no epsilon): the determinism contract (nano-quantized ln,
exact decimal / integer accumulation, total-order argmax) is what's
being locked in.
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
