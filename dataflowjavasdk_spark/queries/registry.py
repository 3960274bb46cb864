"""Registry binding each named query to its Spark implementation and its
DuckDB-runnable oracle SQL twin (SURVEY.md §5.2 — sqllogictest-in-spirit
differential testing; the DataflowAssert/PAssert analog at scale).

Conventions (driver contract, __spark_entry__.py):
- Spark fn signature: (spark, sf_dir) -> DataFrame.
- Column names must match the oracle exactly (driver sorts columns by name
  before value-hashing).
- Double aggregates are computed over exact DECIMAL casts and emitted as
  DOUBLE in BOTH engines, so results are bit-identical regardless of
  summation order (floating-point sums are otherwise order-dependent and a
  PCollection is an unordered bag — SURVEY.md §1.1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with an optional oracle SQL twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle}


def get(name: str) -> RegisteredQuery:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (import = registration)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in (
        "relational",
        "relational2",
        "relational3",
        "examples",
        "windowing",
        "text",
        "similarity",
        "dedup",
        "sketches",
        "curation",
    ):
        try:
            importlib.import_module(f"dataflowjavasdk_spark.queries.{mod}")
        except ModuleNotFoundError as exc:
            # Allow partially built trees during development, but only for
            # our own missing submodules.
            if f"queries.{mod}" not in str(exc):
                raise
    _LOADED = True
