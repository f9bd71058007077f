"""etl_developstoday_test_spark — a PySpark-native analytics/ETL engine.

Re-implements, Spark-first, the data-processing semantics of the reference
repo ``MikKut/etl-developstoday-test`` (a C#/.NET CSV→SQL-Server taxi-trip
ETL pipeline; see SURVEY.md), plus the analytical-query surface its schema
declares (README.md:21-25 / script.sql:55-98 in the reference), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB deployment needs.

Everything is expressed with the DataFrame API / Spark SQL built-ins so
Catalyst + AQE own the physical plan; Python UDFs appear only where the
built-ins genuinely cannot express the semantics (none on the hot path).
"""

from etl_developstoday_test_spark.config import EtlSettings
from etl_developstoday_test_spark.session import get_spark

__all__ = ["EtlSettings", "get_spark"]
__version__ = "0.1.0"
