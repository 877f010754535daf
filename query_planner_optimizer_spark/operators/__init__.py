"""Beyond-DSL operators: dedup, similarity search, text analysis,
multimodal plumbing — the large-scale training-data-pipeline surface.

``entry_queries()`` / ``entry_oracles()`` aggregate each module's driver
entries for ``__spark_entry__.py``. Ops without a SQL-expressible oracle
simply have no ``entry_oracles`` entry (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable


def _modules():
    from query_planner_optimizer_spark.operators import (
        analytics,
        dedup,
        docpipe,
        incremental,
        multimodal,
        quality,
        relevance,
        sampling,
        similarity,
        temporal,
        text,
        textindex,
    )
    from query_planner_optimizer_spark.streaming import stateful, windows

    return (
        dedup, similarity, text, relevance, multimodal, windows, stateful,
        analytics, temporal, docpipe, sampling, incremental, textindex,
        quality,
    )


def entry_queries() -> dict[str, Callable]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        out.update(mod.entry_queries())
    return out


def entry_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.entry_oracles())
    return out
