"""DuckDB-twin parity for the round-8 classifier/LM/graph operators.

Originally the staging ground for these operators' oracle SQL (verified
value-for-value at sf0.001 BEFORE registration, so the driver's first
row for each could only be green). Now that they are registered, this
file keeps (a) the SECOND-SCALE (sf0.001 and sf0.01) value locks over
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
    NB_ORACLE_SQL as NB_ORACLE,
    STUMP_ORACLE_SQL as STUMP_ORACLE,
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


# --- STAGED for round 9 -----------------------------------------------------

WATERFILL_ORACLE = r"""
WITH src AS (
  -- weight = salted-md5 of the source, 1..9: a stand-in for a caller
  -- preference table that is deterministic AND skewed enough to
  -- exercise the saturation branch on this corpus (uniform weights
  -- never saturate anything at 60% of a uniform corpus)
  SELECT source,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
           AS BIGINT) AS a,
         CAST(CAST(concat('0x', substr(md5('wf#' || source), 1, 15))
           AS BIGINT) % 9 + 1 AS BIGINT) AS w
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS atot, CAST(SUM(w) AS BIGINT) AS wtot,
         CAST((SUM(a) * 60) // 100 AS BIGINT) AS budget
  FROM src
),
ranked AS (
  SELECT source, a, w,
         ROW_NUMBER() OVER (ORDER BY CAST(a AS DOUBLE) / w, source) AS rn,
         CAST(COALESCE(SUM(a) OVER (ORDER BY CAST(a AS DOUBLE) / w, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS aprev,
         CAST(COALESCE(SUM(w) OVER (ORDER BY CAST(a AS DOUBLE) / w, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS wprev
  FROM src
),
sat AS (
  SELECT ranked.*, tot.budget, tot.wtot,
         (a * (tot.wtot - wprev)) <= ((tot.budget - aprev) * w) AS is_sat
  FROM ranked CROSS JOIN tot
),
istar AS (
  SELECT COALESCE(MAX(CASE WHEN is_sat THEN rn END), 0) AS i FROM sat
),
cut AS (
  SELECT CAST(COALESCE(SUM(a) FILTER (WHERE rn <= i), 0) AS BIGINT) AS asat,
         CAST(COALESCE(SUM(w) FILTER (WHERE rn <= i), 0) AS BIGINT) AS wsat,
         ANY_VALUE(i) AS i
  FROM sat CROSS JOIN istar
),
lam AS (
  SELECT cut.i,
         CASE WHEN tot.wtot - cut.wsat > 0
              THEN CAST(tot.budget - cut.asat AS DOUBLE)
                   / CAST(tot.wtot - cut.wsat AS DOUBLE)
              ELSE 0.0 END AS lam
  FROM cut CROSS JOIN tot
)
SELECT source, a AS avail_tokens, w AS weight,
       CASE WHEN rn <= lam.i THEN a
            ELSE CAST(floor(lam.lam * CAST(w AS DOUBLE)) AS BIGINT)
       END AS allocated_tokens,
       rn <= lam.i AS saturated
FROM sat CROSS JOIN lam
"""


def test_waterfill_matches_oracle(spark, sf_con):
    """STAGED r9: the registered query will roll documents up to
    (source, avail tokens, distinct-lang weight) and water-fill 60% of
    the total — verified value-for-value at both scales BEFORE
    registration, same discipline as the round-8 staging."""
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


# The calibration oracle shares the NB model CTEs verbatim (imported
# string, single source of truth) and extends the scoring with ranks 1
# and 2 per doc — the margin is pure BIGINT nanos, so the bucketing is
# exact cross-engine.
NB_CALIBRATION_ORACLE = (
    NB_ORACLE.split("best AS (")[0]
    + """ranked AS (
  SELECT doc_id, cand, score, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rk
  FROM per_doc
),
truth AS (
  SELECT doc_id, lang AS truth FROM documents WHERE doc_id % 5 = 0
),
margins AS (
  SELECT LEAST(9, (b.score - s.score) // 200000000) AS margin_bin,
         CASE WHEN b.cand = t.truth THEN 1 ELSE 0 END AS ok
  FROM ranked b
  JOIN ranked s ON s.doc_id = b.doc_id AND s.rk = 2
  JOIN truth t ON t.doc_id = b.doc_id
  WHERE b.rk = 1
)
SELECT CAST(margin_bin AS BIGINT) AS margin_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(ok) AS BIGINT) AS n_correct,
       round(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM margins GROUP BY margin_bin
"""
)


def test_nb_margin_calibration_matches_oracle(spark, sf_con):
    """STAGED r9: per-margin-bin reliability table of the naive-Bayes
    classifier — verified value-for-value at both scales BEFORE
    registration."""
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


KN_BIGRAM_ORACLE = r"""
WITH arrs AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
  FROM documents
),
big AS (
  SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bg
  FROM arrs, unnest(range(1, len(arr))) AS t(i)
  WHERE len(arr) >= 2
),
bcounts AS (SELECT bg, COUNT(*) AS c FROM big GROUP BY bg),
typed AS (
  SELECT bg, c, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM bcounts
),
ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot, COUNT(*) AS n1p
  FROM typed GROUP BY w1
),
pred AS (SELECT w2, COUNT(*) AS npred FROM typed GROUP BY w2),
tt AS (SELECT COUNT(*) AS t FROM bcounts),
model AS (
  SELECT typed.bg,
         CAST(round(ln(
           (CAST(c AS DOUBLE) - 0.75) / CAST(ctot AS DOUBLE)
           + ((0.75 * CAST(n1p AS DOUBLE)) / CAST(ctot AS DOUBLE))
             * (CAST(npred AS DOUBLE) / CAST(t AS DOUBLE))
         ) * 1e9) AS BIGINT) AS llq
  FROM typed
  JOIN ctx ON ctx.w1 = typed.w1
  JOIN pred ON pred.w2 = typed.w2
  CROSS JOIN tt
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         round(CAST(SUM(llq) AS DOUBLE) / 1e9 / COUNT(*), 6)
           AS mean_logprob
  FROM big JOIN model USING (bg) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, mean_logprob FROM per_doc
ORDER BY mean_logprob ASC, doc_id ASC LIMIT 20
"""


def test_kneser_ney_bigram_matches_oracle(spark, sf_con):
    """STAGED r9: interpolated Kneser-Ney bigram LM bottom-k — verified
    value-for-value at both scales BEFORE registration (counts exact,
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


# Fertility shares the BPE trainer replay CTEs (imported builder,
# single source of truth) and rolls the encoded counts up by language.
from etl_developstoday_test_spark.plans.queries import _bpe_ctes

FERTILITY_ORACLE = (
    _bpe_ctes(5)
    + r""", encoded AS (SELECT word, len(syms) AS bpe FROM w5),
    doc_tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      FROM documents
    ),
    per_doc AS (
      SELECT d.doc_id, d.lang,
             CAST(COUNT(*) AS BIGINT) AS ws,
             CAST(SUM(e.bpe) AS BIGINT) AS bpe
      FROM doc_tok d JOIN encoded e USING (word)
      WHERE d.word <> ''
      GROUP BY d.doc_id, d.lang
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
           round(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 6) AS fertility
    FROM per_doc GROUP BY lang"""
)


def test_bpe_fertility_matches_oracle(spark, sf_con):
    """STAGED r9: per-language tokenizer fertility over the trained
    5-merge segmentation — verified value-for-value at both scales
    BEFORE registration."""
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


PACKING_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         {md5} % 32 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
per_shard AS (
  SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tok,
         CAST(SUM((n_tokens + 127) // 128) AS BIGINT) AS useq
  FROM t GROUP BY shard
),
agg AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS total_tokens,
         CAST(SUM(useq) AS BIGINT) AS unpacked_seqs,
         CAST(SUM(useq) * 128 - SUM(tok) AS BIGINT) AS unpacked_pad_tokens,
         CAST(SUM((tok + 127) // 128) AS BIGINT) AS packed_seqs,
         CAST(SUM((tok + 127) // 128) * 128 - SUM(tok) AS BIGINT)
           AS packed_pad_tokens
  FROM per_shard
)
SELECT *, CASE WHEN unpacked_pad_tokens > 0
           THEN round(100.0 * CAST(unpacked_pad_tokens - packed_pad_tokens
                AS DOUBLE) / CAST(unpacked_pad_tokens AS DOUBLE), 6)
           ELSE 0.0 END AS pad_saved_pct
FROM agg
""".format(
    md5="CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)


def test_packing_efficiency_matches_oracle(spark, sf_con):
    """STAGED r9: unpacked-vs-packed sequence/padding audit at budget
    128 x 32 shards — exact integer arithmetic end to end, verified at
    both scales BEFORE registration."""
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
