"""Declared query inventory (SURVEY.md §2 Part B) — the t2 contract.

Each query is a :class:`QuerySpec`: a name, a builder ``(spark, sf_dir) ->
DataFrame``, and (when SQL-expressible) an equivalent ANSI-SQL oracle string
that DuckDB runs over the same parquet tables. The driver hash-compares the
two result sets (column names sorted, order-insensitive), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are computed in DECIMAL and rounded to 2 decimals
  (see :mod:`fs2_kafka_streams_spark.canonical`);
- queries with LIMIT order by a unique tie-break so the selected rows are
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a builder function as a declared query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from fs2_kafka_streams_spark.queries import (  # noqa: F401
        relational,
        windows,
        stateful,
        streaming_ext,
        llm,
    )

    return REGISTRY
