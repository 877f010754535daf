from query_planner_optimizer_spark.sources.events_csv import (  # noqa: F401
    EVENTS_CSV_SCHEMA,
    read_events_csv,
)
