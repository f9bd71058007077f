"""Capture .explain("formatted") output for named queries into
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (optimization-round
evidence artifacts; the round dir defaults to r16).

Usage:
    python scripts/capture_plans.py before graph_kcore_decomposition ...
    python scripts/capture_plans.py after  graph_kcore_decomposition ...

Notes:
- Plans are captured with the SAME session defaults the bench uses
  (get_spark + SPARK_GRAFT_SF_DIR), so the committed files reflect what
  the bench actually runs.
- Queries whose construction materializes checkpoints (iterative graph
  ops) execute real jobs during capture; that is fine — the artifact is
  the plan text, not a timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_developstoday_test_spark.plans.queries import QUERIES  # noqa: E402
from etl_developstoday_test_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
