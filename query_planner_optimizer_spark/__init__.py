"""query_planner_optimizer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference engine
``liviaellen/query-planner-optimizer`` (a single-node Polars/DuckDB query
planner for a JSON query DSL over ad-event data), re-expressed Spark-first:

- The JSON DSL compiles to **DataFrame operations** (``dsl.compiler``) so
  Catalyst performs the partition pruning / column pruning / predicate
  pushdown the reference hand-rolled (reference ``query_engine.py:329-425``).
- A twin DSL→SQL assembler (``dsl.assembler``) mirrors the reference's
  DuckDB baseline (``baseline/assembler.py``) and doubles as the
  correctness oracle generator.
- Prepare-phase ETL (``prepare``) replaces the reference's three
  multiprocessing prepare scripts with one distributed Spark job.
- ``operators/`` adds the large-scale training-data-pipeline operators the
  reference lacks: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search over embeddings, text analysis, multimodal plumbing.

Designed for a 1000-executor cluster at ~100 TB; tested on ``local[*]``.
"""

__version__ = "0.1.0"

from query_planner_optimizer_spark.session import get_spark  # noqa: F401
from query_planner_optimizer_spark.catalog import Catalog  # noqa: F401
from query_planner_optimizer_spark.dsl.compiler import compile_query  # noqa: F401
from query_planner_optimizer_spark.dsl.assembler import assemble_sql  # noqa: F401
