from query_planner_optimizer_spark.streaming.windows import (  # noqa: F401
    hourly_rollup,
    read_events_stream,
    sessionize,
    streaming_hourly_rollup,
)
