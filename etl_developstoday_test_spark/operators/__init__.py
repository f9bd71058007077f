from etl_developstoday_test_spark.operators.parse import parse_trips, ERROR_COL
from etl_developstoday_test_spark.operators.normalize import normalize_trips
from etl_developstoday_test_spark.operators.dedup import first_wins_dedup

__all__ = ["parse_trips", "normalize_trips", "first_wins_dedup", "ERROR_COL"]
