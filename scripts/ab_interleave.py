"""Interleaved same-session A/B timing for a single query under an
env-var toggle (r15/r16 optimization methodology: on a noisy host the
only controlled comparison is alternating variants inside one warmed
session and comparing mins/medians).

Usage:
    python scripts/ab_interleave.py QUERY TOGGLE_ENV [--reps N]

Runs QUERY 2*N times alternating TOGGLE_ENV unset ("A", the new code
path) and TOGGLE_ENV=1 ("B", the old path the toggle re-enables), and
prints min/median per arm. The toggle envs are TEMPORARY development
hooks read at query-construction time; they are removed before commit
(the committed code keeps only the winning arm).
"""

from __future__ import annotations

import json
import os
import statistics
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
    name = sys.argv[1]
    toggle = sys.argv[2]
    reps = 5
    args = sys.argv[3:]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    os.environ.setdefault("SPARK_GRAFT_BENCH_LITE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr(
        "sum(id)",
        "max(conv(substring(md5(string(id)), 1, 15), 16, 10))",
    ).collect()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    a_times, b_times = [], []
    # one untimed warm rep per arm so neither pays first-compile codegen
    for arm in ("A", "B"):
        os.environ.pop(toggle, None)
        if arm == "B":
            os.environ[toggle] = "1"
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    import gc as _gc

    for _ in range(reps):
        # untimed full GC per round (the bench's steady-state emulation):
        # superseded localCheckpoint blocks otherwise accumulate across
        # reps and the later reps pay growing storage/GC pressure,
        # drowning the A/B signal
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        for arm, sink in (("A", a_times), ("B", b_times)):
            os.environ.pop(toggle, None)
            if arm == "B":
                os.environ[toggle] = "1"
            spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            sink.append(round(time.perf_counter() - t0, 3))
    os.environ.pop(toggle, None)
    out = {
        "query": name,
        "toggle": toggle,
        "load_1m_end": round(os.getloadavg()[0], 2),
        "A_new": {"all": a_times, "min": min(a_times),
                  "median": statistics.median(a_times)},
        "B_old": {"all": b_times, "min": min(b_times),
                  "median": statistics.median(b_times)},
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
