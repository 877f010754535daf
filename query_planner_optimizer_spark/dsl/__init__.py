from query_planner_optimizer_spark.dsl.compiler import QueryError, compile_query  # noqa: F401
from query_planner_optimizer_spark.dsl.assembler import assemble_sql  # noqa: F401
