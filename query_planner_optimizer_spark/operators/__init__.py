"""Beyond-DSL operators: dedup, similarity search, text analysis,
multimodal plumbing — the large-scale training-data-pipeline surface.

``entry_queries()`` / ``entry_oracles()`` aggregate each module's driver
entries for ``__spark_entry__.py``. Ops without a SQL-expressible oracle
simply have no ``entry_oracles`` entry (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable


def entry_queries() -> dict[str, Callable]:
    out: dict[str, Callable] = {}
    from query_planner_optimizer_spark.operators import dedup, similarity, text

    out.update(dedup.entry_queries())
    out.update(similarity.entry_queries())
    out.update(text.entry_queries())
    return out


def entry_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    from query_planner_optimizer_spark.operators import dedup, similarity, text

    out.update(dedup.entry_oracles())
    out.update(similarity.entry_oracles())
    out.update(text.entry_oracles())
    return out
