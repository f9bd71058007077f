"""Bucketed-table co-located join: the write-once/shuffle-never design
asserted at the plan level (SURVEY.md §4 — the reference's index design
mapped to Spark physical layout)."""

from __future__ import annotations

import uuid

from etl_developstoday_test_spark.sinks import write_bucketed_table
from etl_developstoday_test_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_items = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    write_bucketed_table(
        load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice"),
        t_orders, "o_orderkey", n_buckets=8, path=str(tmp_path / "o"),
    )
    write_bucketed_table(
        load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity"),
        t_items, "l_orderkey", n_buckets=8, path=str(tmp_path / "l"),
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(t_items).join(
            spark.table(t_orders),
            spark.table(t_items)["l_orderkey"] == spark.table(t_orders)["o_orderkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == load_table(spark, SF_DIR, "lineitem").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_items}")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned layout: a year-filtered query must read only the
    matching partition directories (PartitionFilters), the physical
    design behind agg_revenue_by_year_month at 100 TB."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_by_year")
    (
        load_table(spark, SF_DIR, "orders")
        .withColumn("yr", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("yr")
        .parquet(out)
    )
    q = spark.read.parquet(out).filter(F.col("yr") == 1996)
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines, "scan must carry PartitionFilters"
    assert "= 1996)" in pf_lines[0], pf_lines[0]
    got_years = {r["yr"] for r in q.select("yr").distinct().collect()}
    assert got_years == {1996}
