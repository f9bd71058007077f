"""Fast single-query DuckDB-parity check (mirrors tests/test_oracle_parity).

Usage: python scripts/check_parity.py [--sf DIR] name [name ...]

Runs each named query on Spark and its ORACLE_SQL twin on DuckDB over the
same parquet directory (default sf0.01, the parity gate's scale) and
compares the full multiset of values exactly — the same canonicalization
the test suite uses. Exit code 0 iff every named query matches.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etl_developstoday_test_spark.plans.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)
from etl_developstoday_test_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        [tuple(_norm(r[i]) for i in order) for r in rows], key=repr
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(app_name="check-parity", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in args:
        sdf = QUERIES[name](spark, sf_dir)
        spark_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(ORACLE_SQL[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        ok = (
            sorted(sdf.columns) == sorted(duck_cols)
            and len(spark_rows) == len(duck_rows)
            and _canonical(spark_rows, sdf.columns)
            == _canonical(duck_rows, duck_cols)
        )
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"(spark {len(spark_rows)} rows, duck {len(duck_rows)} rows)")
        if not ok:
            rc = 1
            a = _canonical(spark_rows, sdf.columns)
            b = _canonical(duck_rows, duck_cols)
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}:\n   spark {x}\n   duck  {y}")
                    break
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
