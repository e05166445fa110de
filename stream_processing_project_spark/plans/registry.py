"""Named-query registry — the engine's public query surface.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a builder (spark, sf_dir) -> DataFrame plus, where SQL-expressible, the
equivalent DuckDB oracle SQL. __spark_entry__.py re-exports this registry
to the driver; bench.py runs the `bench`-tagged subset.

Column-name contract: every computed column is aliased identically in
the Spark builder and the oracle SQL (the driver sorts columns by name
before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        _REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def queries() -> dict[str, Builder]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {n: q.builder for n, q in all_queries().items()}


def oracles() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (only SQL-expressible ops)."""
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import all modules that register queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imported for their registration side effects
    from stream_processing_project_spark.plans import (  # noqa: F401
        analytics,
        extensions,
        governance,
        olap,
        scalar_surface,
        streaming_queries,
    )

    _LOADED = True
