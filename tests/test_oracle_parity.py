"""DuckDB-oracle parity for every SQL-expressible query.

Mimics the driver's correctness gate: for each ``queries()`` entry with
an ``oracle_sql()`` twin, run both at sf0.01 and compare row count,
column names, and the full multiset of values (columns sorted by name,
rows sorted by all columns) — *exact* equality, no epsilon: the engine's
determinism contract (functions/__init__.py) promises bit-identical
floats across engines.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_developstoday_test_spark.plans.queries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, oracle, name):
    sdf = QUERIES[name](spark, SF_DIR_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = oracle.execute(ORACLE_SQL[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    a = _canonical(spark_rows, spark_cols)
    b = _canonical(duck_rows, duck_cols)
    mismatches = [
        (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_every_query_runs(spark):
    """Entries without an oracle still must run and return a schema."""
    for name, fn in QUERIES.items():
        if name in ORACLE_SQL:
            continue
        df = fn(spark, SF_DIR_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name


# Queries whose semantics hinge on data-derived thresholds, bounds, or
# structural knobs that COULD degenerate at a different corpus size
# (empty partition sets, sub-n_codes codebooks, one-bucket histograms).
_SF_SENSITIVE = [
    "scan_dynamic_partition_pruning",  # avg>50 partition set
    "scan_zorder_clustering",          # min/max-scaled grid
    "agg_histogram_totalprice",        # min/max-derived buckets
    "embed_ann_pq_topk",               # needs >= 16 codebook vectors
    "agg_hll_mergeable_rollup",        # 5% bound at small n
    "agg_approx_percentiles",          # rank-slack bound at small n
    "sample_mixture_weighted",         # per-source hash thresholds
    "text_winnow_match_pairs",         # min_shared/df_max at small corpus
    "dedup_line_boilerplate",          # >=2-doc line-df threshold
    "sample_quality_epochs",           # ntile(4) needs >= 4 docs
    "drift_cusum_daily_level",         # alarm threshold at smaller days
    "drift_psi_value_shift",           # 1e-4 floor at small bin counts
    "text_blocklist_filter",           # max_hits threshold vs doc length
    "graph_lpa_communities",           # community structure at small graph
    "graph_degree_assortativity",      # degree variance at small graph
    "agg_quantile_sketch_rollup",      # k=256 vs leaf sizes at small sf
]


@pytest.fixture(scope="module")
def oracle_small():
    from tests.conftest import SF_DIR

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _SF_SENSITIVE)
def test_threshold_queries_hold_at_second_scale(spark, oracle_small, name):
    """Same full value comparison as the main parity gate, at sf0.001:
    data-derived thresholds must track the corpus, not bake in one
    scale factor's shape. Non-degeneracy is asserted too — a query that
    'passes' by returning nothing at a new scale is a broken contract."""
    from tests.conftest import SF_DIR

    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = oracle_small.execute(ORACLE_SQL[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert spark_rows, f"{name}: degenerate (empty) at sf0.001"
    assert len(spark_rows) == len(duck_rows), name
    assert _canonical(spark_rows, sdf.columns) == _canonical(
        duck_rows, duck_cols
    ), name


def test_oracle_result_types_survive_pandas_fetch(oracle_small):
    """Tripwire for the round-6 driver incident: every ORACLE_SQL result
    column must have a DuckDB type that pandas fetches losslessly into
    the same dtype Spark produces. An un-cast ``SUM(BIGINT)`` is typed
    HUGEINT (int128) by DuckDB; the driver's pandas fetch coerces that
    to float64 while Spark stays int64, so the value hashes diverge on
    EXACTLY EQUAL values — 14 hash-red rows in CORRECTNESS_r06.json,
    all value-verified correct. The value-comparing parity tests above
    are structurally blind to this (int128 == int64 in Python), so the
    gate has to be on the *types*. DECIMAL is banned from result
    columns too: the determinism contract routes every decimal
    accumulator through the VARCHAR→DOUBLE conversion (``_dsum``)
    before it reaches the result schema.
    """
    offenders = []
    for name in sorted(ORACLE_SQL):
        rel = oracle_small.sql(ORACLE_SQL[name])
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if "HUGEINT" in typ or "DECIMAL" in typ:
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle result columns with driver-hash-unsafe types "
        f"(wrap in CAST(... AS BIGINT) / finish the _dsum path): {offenders}"
    )


def test_spark_and_oracle_result_types_agree(spark, oracle_small):
    """General form of the round-6 incident gate: the driver hashes
    PANDAS frames, so a column whose Spark dtype and oracle dtype fetch
    into different pandas dtypes (int64 vs float64, int32 vs int64)
    hash-diverges on equal values. Compare every non-eager query's
    Spark schema (plan-only) against its oracle's bound DuckDB types
    under the lossless-fetch mapping."""
    from tests.test_plans import _EAGER_QUERIES

    # pandas hash_array hashes every INTEGER width by value (uint64
    # view), so int32-vs-int64 mismatches are hash-safe — the driver's
    # own green rows for dedup_prefix_filter_jaccard (int vs BIGINT)
    # and scan_compaction_roundtrip (bigint vs INTEGER) prove it.
    # Float-vs-int diverges on the BIT PATTERN (the r6 incident), and
    # float32-vs-float64 is not provably safe — those stay strict.
    INTS = {"SMALLINT", "INTEGER", "BIGINT", "TINYINT", "UTINYINT",
            "USMALLINT", "UINTEGER"}
    MAP = {
        "bigint": INTS,
        "int": INTS,
        "smallint": INTS,
        "tinyint": INTS,
        "double": {"DOUBLE"},
        "float": {"FLOAT"},
        "string": {"VARCHAR"},
        "boolean": {"BOOLEAN"},
        "date": {"DATE"},
        "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    }
    offenders = []
    for name in sorted(ORACLE_SQL):
        if name in _EAGER_QUERIES:
            continue  # constructing these runs real jobs; their value
            # parity (incl. dtypes at the python level) runs above
        sdf = QUERIES[name](spark, SF_DIR_ORACLE)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema}
        rel = oracle_small.sql(ORACLE_SQL[name])
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            st = stypes.get(col)
            if st is None:
                continue  # column-name parity is asserted elsewhere
            allowed = MAP.get(st)
            if allowed is None:
                continue  # arrays/structs: not hashed flat by driver
            if typ not in allowed:
                offenders.append((name, col, st, typ))
    assert not offenders, (
        "Spark/oracle result dtype mismatches (driver pandas hash "
        f"diverges on equal values): {offenders}"
    )


def test_eager_query_result_types_agree(spark, oracle_small):
    """The dtype-agreement gate above skips eager queries (constructing
    them runs real jobs), which left the round-6 incident class a blind
    spot exactly where round 8 registered most of its new surface
    (classifier training, LPA, sketch rollups are all eager). Run the
    ORACLE-BEARING eager queries once at sf0.001 and hold their Spark
    schemas to the same lossless-pandas-fetch mapping."""
    from tests.conftest import SF_DIR
    from tests.test_plans import _EAGER_QUERIES

    INTS = {"SMALLINT", "INTEGER", "BIGINT", "TINYINT", "UTINYINT",
            "USMALLINT", "UINTEGER"}
    MAP = {
        "bigint": INTS,
        "int": INTS,
        "smallint": INTS,
        "tinyint": INTS,
        "double": {"DOUBLE"},
        "float": {"FLOAT"},
        "string": {"VARCHAR"},
        "boolean": {"BOOLEAN"},
        "date": {"DATE"},
        "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    }
    offenders = []
    for name in sorted(set(_EAGER_QUERIES) & set(ORACLE_SQL)):
        sdf = QUERIES[name](spark, SF_DIR)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema}
        rel = oracle_small.sql(ORACLE_SQL[name])
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            st = stypes.get(col)
            allowed = MAP.get(st) if st is not None else None
            if allowed is not None and typ not in allowed:
                offenders.append((name, col, st, typ))
    assert not offenders, (
        "eager-query Spark/oracle result dtype mismatches (driver "
        f"pandas hash diverges on equal values): {offenders}"
    )
