from etl_developstoday_test_spark.sources.csv_source import read_trips_csv
from etl_developstoday_test_spark.sources.tables import load_table, load_tables

__all__ = ["read_trips_csv", "load_table", "load_tables"]
