from query_planner_optimizer_spark.functions.textexpr import (  # noqa: F401
    shingles_from_tokens,
    tokens,
    word_shingles,
)
from query_planner_optimizer_spark.functions.vector import (  # noqa: F401
    as_double_array,
    cosine_similarity,
    dot,
    l2_norm,
)
from query_planner_optimizer_spark.functions.skew import (  # noqa: F401
    salted_groupby_agg,
)
