from query_planner_optimizer_spark.sources.docs_jsonl import (  # noqa: F401
    DOCS_JSONL_SCHEMA,
    corrupt_docs_jsonl,
    jsonl_to_parquet,
    read_docs_jsonl,
)
from query_planner_optimizer_spark.sources.events_csv import (  # noqa: F401
    EVENTS_CSV_SCHEMA,
    read_events_csv,
)
