from etl_developstoday_test_spark.plans.queries import QUERIES, ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
