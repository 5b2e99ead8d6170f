"""Central query registry: name -> (spark, sf_dir) -> DataFrame, plus the
matching DuckDB oracle SQL (None for non-SQL-expressible ops, which the
driver checks rows-only)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    from . import domain

    out.update(domain.domain_queries())
    try:
        from . import relational

        out.update(relational.queries())
    except ImportError:
        pass
    try:
        from . import llm

        out.update(llm.queries())
    except ImportError:
        pass
    try:
        from . import streaming_plans

        out.update(streaming_plans.queries())
    except ImportError:
        pass
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    from . import domain

    out.update(domain.domain_oracles())
    try:
        from . import relational

        out.update(relational.oracles())
    except ImportError:
        pass
    try:
        from . import llm

        out.update(llm.oracles())
    except ImportError:
        pass
    try:
        from . import streaming_plans

        out.update(streaming_plans.oracles())
    except ImportError:
        pass
    return {k: v for k, v in out.items() if v is not None}
