from query_planner_optimizer_spark.plans.cache import ResultCache  # noqa: F401
from query_planner_optimizer_spark.plans.router import RollupRouter  # noqa: F401
