"""Quiet-host isolated repetitions for named queries (r13 VERDICT item 3).

Runs the named queries N times each inside ONE warmed session at
$SPARK_GRAFT_SF_DIR (default sf0.1) and writes min/all timings to the
JSON path given as argv[1]. Lives OUTSIDE the bench ratchet's hashed
runtime surface on purpose: this is adjudication evidence, not the
ratchet itself.

Usage: python scripts/isolate_reps.py OUT.json QUERY [QUERY ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_developstoday_test_spark.plans.queries import QUERIES  # noqa: E402
from etl_developstoday_test_spark.session import get_spark  # noqa: E402
from etl_developstoday_test_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args
    os.environ.setdefault("SPARK_GRAFT_BENCH_LITE", "1")
    load0 = os.getloadavg()[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="isolate-reps")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr(
        "sum(id)",
        "max(conv(substring(md5(string(id)), 1, 15), 16, 10))",
    ).collect()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    result: dict = {"sf_dir": sf_dir, "load_1m_baseline": round(load0, 2),
                    "reps": {}}
    for name in names:
        times = []
        for _ in range(reps):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.perf_counter() - start, 3))
        result["reps"][name] = {
            "all": times,
            "min": min(times),
            "median": sorted(times)[len(times) // 2],
        }
        print(name, times, flush=True)
    result["load_1m_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
