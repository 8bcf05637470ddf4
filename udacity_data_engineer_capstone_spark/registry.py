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
    oracle: str | Callable[[], str] | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""

    def oracle_text(self) -> str | None:
        """The oracle SQL, resolving a LAZY (callable) oracle at read
        time.  Lazy oracles exist for queries whose shared constants
        are environment-derived (e.g. the Bloom probe width from
        ``SPARK_GRAFT_CORPUS_DOCS``): resolving at read time keeps the
        oracle text in lockstep with the engine expressions, which
        also read the environment per call — an import-time snapshot
        could diverge if the environment changes between import and
        run."""
        return self.oracle() if callable(self.oracle) else self.oracle


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle`` is DuckDB-runnable ANSI SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings) — either the SQL string or a
    zero-arg callable returning it (for environment-derived shared
    constants; see :meth:`QuerySpec.oracle_text`); omit it only for
    genuinely non-SQL-expressible operators (the driver then records a
    weaker rows-only check)."""

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
        name: spec.oracle_text()
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
