"""Query/operator registry.

Every public operator in the engine registers here via the :func:`query`
decorator, pairing a PySpark implementation with (where SQL-expressible)
an ANSI-SQL oracle that DuckDB can run over the same parquet tables. The
driver contract (``__spark_entry__.py``) is a thin projection of this
registry; local tests replay the same Spark-vs-DuckDB comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle`` is DuckDB-runnable ANSI SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings); omit it only for genuinely
    non-SQL-expressible operators (the driver then records a weaker
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
