from etl_developstoday_test_spark.streaming.pipeline import (
    read_trips_stream,
    run_stream,
    stream_sessionized,
    stream_tumbling_hourly,
)

__all__ = [
    "read_trips_stream",
    "run_stream",
    "stream_sessionized",
    "stream_tumbling_hourly",
]
